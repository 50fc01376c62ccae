"""SXS loader test against a synthetic local cache in catalog format."""

import json

import h5py
import numpy as np
import pytest


@pytest.fixture(scope="module")
def fake_catalog(tmp_path_factory):
    """Build an SXS-format cache entry: metadata.json + rhOverM h5 with
    Extrapolated_N2.dir/Y_l{l}_m{m}.dat datasets."""
    from qnmfits_tpu.ref_impl import get_qnm

    root = tmp_path_factory.mktemp("sxs_cache")
    sim = root / "SXS_BBH_9999" / "Lev4"
    sim.mkdir(parents=True)

    Mf, chif_mag = 0.952, 0.692
    md = {
        "simulation_name": "SXS:BBH:9999/Lev4",
        "reference_time": 200.0,
        "reference_mass1": 0.5556,
        "reference_mass2": 0.4444,
        "reference_dimensionless_spin1": [0.0, 0.0, 0.33],
        "reference_dimensionless_spin2": [0.0, 0.0, -0.44],
        "reference_position1": [5.0, 0.1, 0.0],
        "reference_position2": [-6.0, -0.1, 0.0],
        "reference_orbital_frequency": [0.0, 0.0, 0.017],
        "common_horizon_time": 3812.0,
        "number_of_orbits": 5.2,
        "remnant_mass": Mf,
        "remnant_dimensionless_spin": [0.0, 0.0, chif_mag],
        "remnant_velocity": [1e-4, -2e-4, 3e-5],
    }
    (sim / "metadata.json").write_text(json.dumps(md))

    # Inspiral-like chirp smoothly joined to a table-accurate ringdown.
    times = np.arange(0.0, 500.0, 0.2)
    t_peak = 380.0
    q = get_qnm()
    rng = np.random.default_rng(99)
    with h5py.File(sim / "rhOverM_Asymptotic_GeometricUnits_CoM.h5",
                   "w") as f:
        grp = f.create_group("Extrapolated_N2.dir")
        for l in (2, 3):
            for m in range(-l, l + 1):
                if (l, abs(m)) in ((2, 2), (3, 2)) and m != 0:
                    w = q.omega(l, abs(m), 0, 1 if m > 0 else -1,
                                chif_mag, Mf)
                    amp = 0.3 * np.exp(-((times - t_peak) / 60.0) ** 2)
                    phase = 0.2 * (times - t_peak)
                    h = amp * np.exp(-1j * np.sign(m) * 2 * phase)
                    late = times >= t_peak
                    h[late] = h[late.argmax()] \
                        * np.exp(-1j * w * (times[late] - t_peak))
                else:
                    h = np.zeros(len(times), complex)
                grp.create_dataset(
                    f"Y_l{l}_m{m}.dat",
                    data=np.stack([times, h.real, h.imag], axis=1))
    return root


def test_sxs_load_from_cache(fake_catalog, monkeypatch):
    monkeypatch.setenv("SXS_CACHE_DIR", str(fake_catalog))
    from qnmfits_tpu.waveforms import SXS

    wf = SXS(9999, zero_time=(2, 2))
    assert wf.Mf == 0.952
    assert abs(wf.chif_mag - 0.692) < 1e-12
    assert wf.ellMax == 3
    assert wf.q == pytest.approx(0.5556 / 0.4444)
    # zero_time=(2,2): the mode peak sits at t=0 after the shift.
    peak_idx = np.argmax(np.abs(wf.h[2, 2]))
    assert abs(wf.times[peak_idx]) < 0.5
    # Fluxes and remnant evolution computed.
    assert wf.Moft[-1] == pytest.approx(wf.Mf, abs=1e-12)
    assert np.isfinite(wf.chioft_mag).all()
    # Derived metadata present.
    assert np.isfinite(wf.chi_eff)
    assert np.isfinite(wf.chip)


def test_sxs_ringdown_fit_roundtrip(fake_catalog, monkeypatch):
    """End-to-end: load from cache, fit the post-peak (2,2) ringdown."""
    monkeypatch.setenv("SXS_CACHE_DIR", str(fake_catalog))
    from qnmfits_tpu import ringdown_fit
    from qnmfits_tpu.waveforms import SXS

    wf = SXS(9999, zero_time=(2, 2))
    out = ringdown_fit(wf.times, wf.h[2, 2], [(2, 2, 0, 1)],
                       wf.Mf, wf.chif_mag, t0=5.0, T=80)
    # Post-peak data is a pure (2,2,0) damped sinusoid by construction.
    assert out["mismatch"] < 1e-8


@pytest.fixture()
def multi_lev_catalog(tmp_path):
    """Cache entry with Lev2 and Lev5 (distinguishable metadata)."""
    root = tmp_path / "cache"
    for lev, mf in ((2, 0.90), (5, 0.95)):
        sim = root / "SXS_BBH_8888" / f"Lev{lev}"
        sim.mkdir(parents=True)
        md = {
            "simulation_name": f"SXS:BBH:8888/Lev{lev}",
            "reference_time": 200.0,
            "reference_mass1": 0.5556, "reference_mass2": 0.4444,
            "reference_dimensionless_spin1": [0.0, 0.0, 0.33],
            "reference_dimensionless_spin2": [0.0, 0.0, -0.44],
            "reference_position1": [5.0, 0.1, 0.0],
            "reference_position2": [-6.0, -0.1, 0.0],
            "reference_orbital_frequency": [0.0, 0.0, 0.017],
            "common_horizon_time": 3812.0, "number_of_orbits": 5.2,
            "remnant_mass": mf,
            "remnant_dimensionless_spin": [0.0, 0.0, 0.69],
            "remnant_velocity": [1e-4, -2e-4, 3e-5],
        }
        (sim / "metadata.json").write_text(json.dumps(md))
        times = np.arange(0.0, 400.0, 0.2)
        h = 0.3 * np.exp(-((times - 300.0) / 60.0) ** 2) \
            * np.exp(-2j * 0.2 * (times - 300.0))
        with h5py.File(sim / "rhOverM_Asymptotic_GeometricUnits_CoM.h5",
                       "w") as f:
            grp = f.create_group("Extrapolated_N2.dir")
            for m in range(-2, 3):
                hm = h if abs(m) == 2 else np.zeros(len(times), complex)
                grp.create_dataset(
                    f"Y_l2_m{m}.dat",
                    data=np.stack([times, hm.real, hm.imag], axis=1))
    return root


def test_highest_level_selected(multi_lev_catalog, monkeypatch):
    """The local-cache path must pick the HIGHEST Lev, not the
    lexicographically first (regression)."""
    from qnmfits_tpu.waveforms import sxs as sxs_mod
    monkeypatch.setattr(sxs_mod, "_cache_dirs",
                        lambda: [multi_lev_catalog])
    wf = sxs_mod.SXS(8888, zero_time=(2, 2), ellMax=2)
    assert wf.Mf == 0.95              # Lev5's remnant mass
    assert wf.level == 5


def test_lev_minus_highest(multi_lev_catalog, monkeypatch):
    from qnmfits_tpu.waveforms import sxs as sxs_mod
    monkeypatch.setattr(sxs_mod, "_cache_dirs",
                        lambda: [multi_lev_catalog])
    wf = sxs_mod.SXS(8888, zero_time=(2, 2), ellMax=2,
                     lev_minus_highest=-3)
    assert wf.Mf == 0.90              # Lev2
    assert wf.level == 2
    with pytest.raises(FileNotFoundError, match="Lev4"):
        sxs_mod.SXS(8888, zero_time=(2, 2), ellMax=2,
                    lev_minus_highest=-1)


def test_missing_extrapolation_group_raises(multi_lev_catalog,
                                            monkeypatch):
    """Requesting an extrapolation order the file lacks must fail
    loudly, not silently load nothing (regression)."""
    from qnmfits_tpu.waveforms import sxs as sxs_mod
    monkeypatch.setattr(sxs_mod, "_cache_dirs",
                        lambda: [multi_lev_catalog])
    with pytest.raises(KeyError, match="Extrapolated_N4"):
        sxs_mod.SXS(8888, zero_time=(2, 2), ellMax=2,
                    extrapolation_order=4)


def test_zero_time_int_default_sets_method(fake_catalog, monkeypatch):
    """The int default zero_time=0 must set zero_time_method
    (regression: the reference's `type(...) is float` quirk)."""
    from qnmfits_tpu.waveforms import sxs as sxs_mod
    monkeypatch.setattr(sxs_mod, "_cache_dirs", lambda: [fake_catalog])
    wf = sxs_mod.SXS(9999, ellMax=3)
    assert wf.zero_time_method == "Simulation default"


def test_zero_spin_remnant_loads(tmp_path, monkeypatch):
    """A non-spinning remnant (chif=[0,0,0]) must load with thetaf=0
    and run the full pipeline (regression: the reference divides 0/0
    at Simulation.py:178-181 and NaNs thetaf/phif)."""
    from qnmfits_tpu.waveforms import sxs as sxs_mod

    root = tmp_path / "cache"
    sim = root / "SXS_BBH_7777" / "Lev3"
    sim.mkdir(parents=True)
    md = {
        "simulation_name": "SXS:BBH:7777/Lev3",
        "reference_time": 200.0,
        "reference_mass1": 0.5, "reference_mass2": 0.5,
        "reference_dimensionless_spin1": [0.0, 0.0, 0.6],
        "reference_dimensionless_spin2": [0.0, 0.0, -0.6],
        "reference_position1": [5.0, 0.1, 0.0],
        "reference_position2": [-5.0, -0.1, 0.0],
        "reference_orbital_frequency": [0.0, 0.0, 0.017],
        "common_horizon_time": 300.0, "number_of_orbits": 5.2,
        "remnant_mass": 0.95,
        "remnant_dimensionless_spin": [0.0, 0.0, 0.0],
        "remnant_velocity": [0.0, 0.0, 0.0],
    }
    (sim / "metadata.json").write_text(json.dumps(md))
    times = np.arange(0.0, 400.0, 0.2)
    h = 0.3 * np.exp(-((times - 300.0) / 60.0) ** 2) \
        * np.exp(-2j * 0.2 * (times - 300.0))
    with h5py.File(sim / "rhOverM_Asymptotic_GeometricUnits_CoM.h5",
                   "w") as f:
        grp = f.create_group("Extrapolated_N2.dir")
        for m in range(-2, 3):
            hm = h if abs(m) == 2 else np.zeros(len(times), complex)
            grp.create_dataset(
                f"Y_l2_m{m}.dat",
                data=np.stack([times, hm.real, hm.imag], axis=1))

    monkeypatch.setattr(sxs_mod, "_cache_dirs", lambda: [root])
    wf = sxs_mod.SXS(7777, zero_time=(2, 2), ellMax=2,
                     transform="rotation")
    assert wf.chif_mag == 0.0
    assert wf.thetaf == 0.0 and wf.phif == 0.0
    assert np.all(np.isfinite(wf.h[2, 2]))
    assert np.isfinite(wf.Moft).all()
    assert np.isfinite(wf.chioft_mag).all()
    # Downstream fit at chif=0 (Schwarzschild spectrum) completes.
    from qnmfits_tpu import ringdown_fit
    out = ringdown_fit(wf.times, wf.h[2, 2], [(2, 2, 0, 1)],
                       wf.Mf, wf.chif_mag, t0=5.0, T=60)
    assert np.isfinite(out["mismatch"])


def test_rotate_modes_aligned_spin_no_nan():
    """Exactly z-aligned remnant spin: rotation is a no-op, not NaN
    (regression: 0/0 in the rotation axis)."""
    from qnmfits_tpu.waveforms import Custom
    times = np.arange(0.0, 60.0, 0.1)
    d = {(2, m): np.zeros(len(times), complex) for m in range(-2, 3)}
    d[(2, 2)] = np.exp(-0.09 * times) * np.exp(-1j * 0.55 * times)
    wf = Custom(times, d, {"remnant_mass": 0.95,
                           "remnant_dimensionless_spin": [0, 0, 0.7]},
                transform="rotation")
    assert np.all(np.isfinite(wf.h[2, 2]))
    np.testing.assert_allclose(wf.chif, [0, 0, 0.7], atol=1e-15)
    # anti-aligned: rotation by pi, still finite
    wf2 = Custom(times, dict(d), {"remnant_mass": 0.95,
                                  "remnant_dimensionless_spin":
                                  [0, 0, -0.7]},
                 transform="rotation")
    assert np.all(np.isfinite(wf2.h[2, 2]))
    np.testing.assert_allclose(wf2.chif[2], 0.7, atol=1e-12)
