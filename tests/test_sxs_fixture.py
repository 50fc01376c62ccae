"""End-to-end fits on the checked-in realistic waveform fixture.

The SXS:BBH:0305 golden numbers of the reference tutorial cannot be
reproduced in this environment (no network, no seeded ~/.cache/sxs --
recorded in BASELINE.md).  This is the recorded-fixture stand-in the
round-1 review asked for: tests/data/fixture_bbh_waveform.npz is a
PN-flavoured inspiral + ringdown whose QNM frequencies come from the
Berti-Cardoso-Will fit formulae (~1-2% detuned from the true Kerr
spectrum) plus noise -- NOT from this package's tables -- so the fits
below exercise genuine model/data disagreement through the full
SXS-loader + fitting path, with regression-pinned outputs.
"""

import json
from pathlib import Path

import h5py
import numpy as np
import pytest

FIXTURE = Path(__file__).parent / "data" / "fixture_bbh_waveform.npz"


@pytest.fixture(scope="module")
def fix():
    z = np.load(FIXTURE)
    return z


@pytest.fixture(scope="module")
def sxs_cache(fix, tmp_path_factory):
    """Wrap the fixture in an SXS catalog-format cache entry."""
    root = tmp_path_factory.mktemp("sxs_cache_fix")
    sim = root / "SXS_BBH_8888" / "Lev3"
    sim.mkdir(parents=True)
    Mf, chif = float(fix["Mf"]), float(fix["chif"])
    md = {
        "simulation_name": "SXS:BBH:8888/Lev3",
        "reference_time": 100.0,
        "reference_mass1": 0.54,
        "reference_mass2": 0.46,
        "reference_dimensionless_spin1": [0.0, 0.0, 0.1],
        "reference_dimensionless_spin2": [0.0, 0.0, -0.2],
        "reference_position1": [5.0, 0.0, 0.0],
        "reference_position2": [-5.8, 0.0, 0.0],
        "reference_orbital_frequency": [0.0, 0.0, 0.016],
        "common_horizon_time": float(fix["t_peak"]),
        "number_of_orbits": 8.0,
        "remnant_mass": Mf,
        "remnant_dimensionless_spin": [0.0, 0.0, chif],
        "remnant_velocity": [1e-4, 0.0, 0.0],
    }
    (sim / "metadata.json").write_text(json.dumps(md))
    times = fix["times"]
    with h5py.File(sim / "rhOverM_Asymptotic_GeometricUnits_CoM.h5",
                   "w") as f:
        grp = f.create_group("Extrapolated_N2.dir")
        for l in (2, 3):
            for m in range(-l, l + 1):
                key = f"h_{l}_{m}"
                h = fix[key] if key in fix.files \
                    else np.zeros(len(times), complex)
                grp.create_dataset(
                    f"Y_l{l}_m{m}.dat",
                    data=np.stack([times, h.real, h.imag], axis=1))
    return root


@pytest.fixture(scope="module")
def wf(sxs_cache):
    import os
    os.environ["SXS_CACHE_DIR"] = str(sxs_cache)
    try:
        from qnmfits_tpu.waveforms import SXS
        return SXS(8888, zero_time=(2, 2))
    finally:
        del os.environ["SXS_CACHE_DIR"]


def test_loader_metadata_and_alignment(wf, fix):
    assert wf.Mf == float(fix["Mf"])
    assert abs(wf.chif_mag - float(fix["chif"])) < 1e-12
    peak_idx = int(np.argmax(np.abs(wf.h[2, 2])))
    assert abs(wf.times[peak_idx]) < 0.5


def test_single_mode_fit_realistic_mismatch(wf):
    """n<=7 ladder fit at t0=0: data frequencies are ~1-2% off the Kerr
    spectrum (BCW fits), so the mismatch is small but decidedly nonzero
    -- unlike the self-referential synthetic examples."""
    from qnmfits_tpu import ringdown_fit
    out = ringdown_fit(wf.times, wf.h[2, 2],
                       [(2, 2, n, 1) for n in range(8)],
                       wf.Mf, wf.chif_mag, t0=0.0, T=90.0)
    assert 1e-4 < out["mismatch"] < 0.05
    out10 = ringdown_fit(wf.times, wf.h[2, 2],
                         [(2, 2, n, 1) for n in range(8)],
                         wf.Mf, wf.chif_mag, t0=10.0, T=90.0)
    assert out10["mismatch"] < out["mismatch"] * 1e-2


def test_epsilon_detects_detuning(wf):
    """The fixture's ringdown frequencies correspond to a slightly
    different remnant than the labelled (Mf, chif); calculate_epsilon
    must find a small-but-nonzero epsilon in that direction."""
    from qnmfits_tpu import calculate_epsilon
    eps, Mf_b, chif_b = calculate_epsilon(
        wf.times, wf.h[2, 2], [(2, 2, 0, 1), (2, 2, 1, 1)],
        wf.Mf, wf.chif_mag, t0=10.0)
    assert 1e-3 < eps < 0.05
    assert abs(Mf_b - wf.Mf) < 0.02
    assert abs(chif_b - wf.chif_mag) < 0.03
    # Regression pin (fixture + optimiser are deterministic).
    assert eps == pytest.approx(0.0122058, rel=1e-3)


def test_multimode_fit_through_loader(wf):
    from qnmfits_tpu import multimode_ringdown_fit
    out = multimode_ringdown_fit(
        wf.times, {(2, 2): wf.h[2, 2], (3, 2): wf.h[3, 2]},
        [(2, 2, n, 1) for n in range(8)], wf.Mf, wf.chif_mag, t0=10.0,
        spherical_modes=[(2, 2), (3, 2)])
    # The (3,2) series carries a (2,2,0) mixing line at ~7% amplitude;
    # the shared-C multimode fit must capture both series at the 1e-3
    # level (limited by the intrinsic detuned (3,2) mode).
    assert out["mismatch"] < 5e-3
    assert out["mismatch"] == pytest.approx(0.00110481, rel=1e-2)


def test_dynamic_fit_with_fixture_tracks(wf):
    """Dynamic-spectrum fit driven by the fixture's own Moft/chioft
    tracks (the notebook route the air gap otherwise leaves untested):
    M(t) from backward-integrated Edot, chi(t) from Jdot."""
    from qnmfits_tpu import dynamic_ringdown_fit, ringdown_fit
    wf.calculate_Moft()
    wf.calculate_chioft()
    # Clamp the junk early-inspiral samples into the table domain; the
    # fit window only sees the ringdown tail where the tracks are
    # physical (PARITY.md "Known deltas" documents array-chif samples
    # outside the window being unvalidated).
    chit = np.clip(wf.chioft_mag, 0.0, 0.99)
    out = dynamic_ringdown_fit(
        wf.times, wf.h[2, 2], [(2, 2, n, 1) for n in range(8)],
        wf.Moft, chit, t0=10.0, T=80.0)
    assert np.isfinite(out["mismatch"])
    # Near the ringdown the tracks approach (Mf, chif), so the dynamic
    # fit must land in the same quality band as the static one.
    static = ringdown_fit(
        wf.times, wf.h[2, 2], [(2, 2, n, 1) for n in range(8)],
        wf.Mf, wf.chif_mag, t0=10.0, T=80.0)
    assert out["mismatch"] < 10 * static["mismatch"] + 1e-6
    # Regression pin (deterministic fixture + deterministic pipeline).
    assert out["mismatch"] == pytest.approx(2.79778014e-06, rel=1e-3)


def test_rational_filter_on_fixture(wf):
    """Rational filter on the fixture strain: removing the (2,2,0)
    fundamental + first overtone must suppress the post-peak ringdown
    even though the data frequencies are BCW-detuned; jax and numpy
    engines agree on real data."""
    from qnmfits_tpu import rational_filter
    modes = [(2, 2, 0, 1), (2, 2, 1, 1)]
    tf, hf = rational_filter(wf.times, wf.h[2, 2], modes, wf.Mf,
                             wf.chif_mag, t_start=-300.0)
    sel_data = (wf.times > 20.0) & (wf.times < 60.0)
    sel_filt = (tf > 20.0) & (tf < 60.0)
    before = float(np.max(np.abs(wf.h[2, 2][sel_data])))
    after = float(np.max(np.abs(hf[sel_filt])))
    assert after < 0.05 * before          # strong post-peak suppression
    tf2, hf2 = rational_filter(wf.times, wf.h[2, 2], modes, wf.Mf,
                               wf.chif_mag, t_start=-300.0,
                               engine="numpy")
    np.testing.assert_allclose(hf, hf2, rtol=0, atol=1e-10)
    # Regression pin on the suppression factor.
    assert before / after == pytest.approx(72.7998, rel=1e-2)
