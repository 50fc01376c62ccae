"""Amplitude-stability diagnostics (qnmfits_tpu.stability).

The identity under test: for data that IS a sum of QNMs anchored at
t_ref, the per-window fit amplitudes rephased by exp(i w (t0 - t_ref))
are constant in t0 -- exactly.  A mode absent from the data has no
such invariant and wanders under the same rephasing.
"""

import numpy as np
import pytest

from qnmfits_tpu import amplitude_stability
from qnmfits_tpu.testing import synthetic_multimode, synthetic_single


@pytest.fixture(scope="module")
def syn():
    # Three-overtone injection anchored at t = 0 (testing.synthetic_single
    # calls ringdown(times, 0.0, ...)).
    return synthetic_single(modes=[(2, 2, n, 1) for n in range(3)],
                            noise=0.0, seed=7)


def test_injected_modes_are_flat(syn):
    t0s = np.linspace(0.0, 15.0, 31)
    out = amplitude_stability(syn["times"], syn["data"], syn["modes"],
                              syn["Mf"], syn["chif"], t0s, t_ref=0.0,
                              T_array=100.0)
    assert out["A"].shape == (31, 3)
    # Rephased amplitudes recover the injection at every start time.
    np.testing.assert_allclose(
        out["A"], np.broadcast_to(syn["amplitudes"], out["A"].shape),
        rtol=0, atol=1e-6)
    assert np.all(out["rel_std"] < 1e-7)
    assert np.all(out["scatter"] < 1e-6)
    assert np.all(out["phase_std"] < 1e-6)
    assert np.all(out["mm"] < 1e-12)


def test_raw_amplitudes_anchor_at_their_own_t0(syn):
    """With t_ref equal to a sweep point that lies ON a sample, the
    rephased row at that point equals the raw fit amplitudes."""
    t0s = np.array([0.0, 5.0, 10.0])
    out = amplitude_stability(syn["times"], syn["data"], syn["modes"],
                              syn["Mf"], syn["chif"], t0s, t_ref=5.0,
                              T_array=100.0)
    np.testing.assert_allclose(out["A"][1], out["C"][1], rtol=0, atol=0)
    # And the rephasing formula itself.
    expect = out["C"] * np.exp(
        1j * out["omega"][None, :] * (t0s[:, None] - 5.0))
    np.testing.assert_allclose(out["A"], expect, rtol=0, atol=0)


def test_absent_mode_is_unstable(syn):
    """Appending an overtone not present in (noisy) data: the injected
    modes stay stable, the spurious one scatters by orders more."""
    noisy = synthetic_single(modes=syn["modes"], noise=1e-7, seed=7)
    t0s = np.linspace(0.0, 15.0, 31)
    out = amplitude_stability(noisy["times"], noisy["data"],
                              list(syn["modes"]) + [(2, 2, 5, 1)],
                              syn["Mf"], syn["chif"], t0s, t_ref=0.0,
                              T_array=100.0)
    assert np.all(out["rel_std"][:3] < 1e-3)
    assert out["rel_std"][3] > 10 * out["rel_std"][:3].max()
    assert out["scatter"][3] > 10 * out["scatter"][:3].max()


def test_dedup_matches_direct(syn):
    """The dedup path (t0 grid finer than the sampling) returns the
    same rephased amplitudes as per-t0 solving."""
    from qnmfits_tpu import batched

    t0s = np.linspace(0.0, 10.0, 201)       # step 0.05 over 0.1 samples
    assert batched._window_dedup(
        np.asarray(syn["times"], float), t0s,
        np.full_like(t0s, 80.0)) is not None   # dedup genuinely active
    kw = dict(t_ref=0.0, T_array=80.0)
    a = amplitude_stability(syn["times"], syn["data"], syn["modes"],
                            syn["Mf"], syn["chif"], t0s, dedup=True, **kw)
    b = amplitude_stability(syn["times"], syn["data"], syn["modes"],
                            syn["Mf"], syn["chif"], t0s, dedup=False, **kw)
    # The rephase to t_ref multiplies rounding noise by e^{|Im w| dt0}
    # (~16x for the n=2 overtone at dt0=10), so the two solve paths
    # agree to ~1e-11 here rather than the raw-amplitude 1e-13.
    np.testing.assert_allclose(a["A"], b["A"], rtol=0, atol=1e-9)
    np.testing.assert_allclose(a["mm"], b["mm"], rtol=0, atol=1e-14)


def test_multimode_dict_data():
    syn = synthetic_multimode(seed=3)
    t0s = np.linspace(0.0, 12.0, 13)
    out = amplitude_stability(syn["times"], syn["data_dict"],
                              syn["modes"], syn["Mf"], syn["chif"], t0s,
                              t_ref=0.0,
                              spherical_modes=syn["spherical_modes"])
    np.testing.assert_allclose(
        out["A"], np.broadcast_to(syn["amplitudes"], out["A"].shape),
        rtol=0, atol=1e-6)
    assert np.all(out["rel_std"] < 1e-7)


def test_closest_window_method(syn):
    """t0_method='closest' sweeps rephase just as exactly."""
    t0s = np.linspace(0.03, 9.03, 16)       # off-sample starts
    out = amplitude_stability(syn["times"], syn["data"], syn["modes"],
                              syn["Mf"], syn["chif"], t0s, t_ref=0.0,
                              t0_method="closest")
    np.testing.assert_allclose(
        out["A"], np.broadcast_to(syn["amplitudes"], out["A"].shape),
        rtol=0, atol=1e-6)


def test_dynamic_spectrum_rejected(syn):
    with pytest.raises(ValueError, match="static"):
        amplitude_stability(
            syn["times"], syn["data"], syn["modes"],
            np.full(len(syn["times"]), syn["Mf"]), syn["chif"],
            np.array([0.0, 5.0]))


def test_plot_smoke(syn, tmp_path):
    import matplotlib
    matplotlib.use("Agg")
    from qnmfits_tpu import plot_amplitude_stability

    t0s = np.linspace(0.0, 10.0, 11)
    out = amplitude_stability(syn["times"], syn["data"], syn["modes"],
                              syn["Mf"], syn["chif"], t0s, t_ref=0.0)
    path = tmp_path / "stab.png"
    plot_amplitude_stability(out, truth=syn["amplitudes"],
                             outfile=str(path))
    assert path.exists()
