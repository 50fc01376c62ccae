"""Orthonormal-mode decomposition (qnmfits_tpu.orthonormal).

The Gram-Cholesky identity under test: with G = L L^H over the
tau-weighted window product, e = phi L^{-H} is an orthonormal family,
b = L^{-1} r are the data's projection coefficients, and |b_j|^2 adds
up to the power explained in the span.
"""

import numpy as np
import pytest

from qnmfits_tpu import orthonormal_decomposition
from qnmfits_tpu.testing import synthetic_multimode, synthetic_single


@pytest.fixture(scope="module")
def syn():
    return synthetic_single(modes=[(2, 2, n, 1) for n in range(4)],
                            noise=0.0, seed=5)


def test_exact_data_fully_explained(syn):
    out = orthonormal_decomposition(
        syn["times"], syn["data"], syn["modes"], syn["Mf"], syn["chif"],
        t0=0.0, T=100.0)
    assert abs(out["explained_fraction"] - 1.0) < 1e-10
    assert out["mismatch"] < 1e-10
    # Physical-basis coordinates of the projection recover the
    # injection (noise-free, representable data).
    np.testing.assert_allclose(out["C"], syn["amplitudes"],
                               rtol=0, atol=1e-7)
    # Per-mode powers are additive and sum to the data norm.
    assert abs(np.sum(out["power"]) / out["data_norm"] - 1.0) < 1e-10


def test_orthonormality_identity(syn):
    """e = phi L^{-H} really is orthonormal: L^{-1} G L^{-H} == I."""
    from scipy.linalg import solve_triangular

    from qnmfits_tpu.engine import SpectrumEvaluator
    from qnmfits_tpu.ops.windows import trapz_weights, window_geq

    times = np.asarray(syn["times"], float)
    ev = SpectrumEvaluator([tuple(m) for m in syn["modes"]])
    omega = np.asarray(ev.omega(syn["chif"], syn["Mf"]))
    w = np.asarray(window_geq(times, 0.0, 100.0))
    tau = np.asarray(trapz_weights(times, w))
    dt = (times[:, None] - 0.0) * w[:, None]
    phi = np.exp(-1j * omega[None, :] * dt)
    G = (phi * tau[:, None]).conj().T @ phi
    L = np.linalg.cholesky(G)
    X = solve_triangular(L, G, lower=True)
    I_hat = solve_triangular(L, X.conj().T, lower=True).conj().T
    np.testing.assert_allclose(I_hat, np.eye(len(omega)),
                               rtol=0, atol=1e-11)


def test_first_mode_power_is_direct_projection(syn):
    """Order dependence is exact: |b_0|^2 == |<phi_0, d>|^2 / <phi_0,
    phi_0> (the power along the first, un-orthogonalized mode)."""
    from qnmfits_tpu.ops.windows import trapz_weights, window_geq

    out = orthonormal_decomposition(
        syn["times"], syn["data"], syn["modes"], syn["Mf"], syn["chif"],
        t0=0.0, T=100.0)
    times = np.asarray(syn["times"], float)
    w = np.asarray(window_geq(times, 0.0, 100.0))
    tau = np.asarray(trapz_weights(times, w))
    phi0 = np.exp(-1j * out["omega"][0] * times * w)
    num = np.sum(tau * np.conj(phi0) * np.asarray(syn["data"]))
    den = np.sum(tau * np.abs(phi0) ** 2)
    assert abs(out["power"][0] - np.abs(num) ** 2 / den.real) < 1e-8


def test_absent_mode_contributes_nothing(syn):
    """Appending a mode that is not in the data adds ~zero power."""
    out = orthonormal_decomposition(
        syn["times"], syn["data"], syn["modes"] + [(3, 3, 0, 1)],
        syn["Mf"], syn["chif"], t0=0.0, T=100.0)
    assert out["power"][-1] / out["data_norm"] < 1e-12
    assert abs(out["explained_fraction"] - 1.0) < 1e-10


def test_truncated_set_partially_explains(syn):
    """Dropping the overtones leaves real unexplained power, and the
    cumulative curve is monotone."""
    out = orthonormal_decomposition(
        syn["times"], syn["data"], syn["modes"][:1], syn["Mf"],
        syn["chif"], t0=0.0, T=100.0)
    assert out["explained_fraction"] < 1.0 - 1e-6
    full = orthonormal_decomposition(
        syn["times"], syn["data"], syn["modes"], syn["Mf"],
        syn["chif"], t0=0.0, T=100.0)
    cum = full["cumulative_explained"]
    assert np.all(np.diff(cum) >= -1e-15)
    assert abs(cum[0] - out["explained_fraction"]) < 1e-10


def test_multimode_dict_data():
    syn = synthetic_multimode(seed=12)
    out = orthonormal_decomposition(
        syn["times"], syn["data_dict"], syn["modes"], syn["Mf"],
        syn["chif"], t0=0.0, T=100.0,
        spherical_modes=syn["spherical_modes"])
    assert abs(out["explained_fraction"] - 1.0) < 1e-10
    np.testing.assert_allclose(out["C"], syn["amplitudes"],
                               rtol=0, atol=1e-7)


def test_t0_sweep_matches_single_shot(syn):
    """orthonormal_t0_sweep == a loop of orthonormal_decomposition."""
    from qnmfits_tpu import orthonormal_t0_sweep

    t0s = np.linspace(0.0, 12.0, 7)
    out = orthonormal_t0_sweep(syn["times"], syn["data"], syn["modes"],
                               syn["Mf"], syn["chif"], t0s, T_array=80.0)
    assert out["power"].shape == (7, len(syn["modes"]))
    assert np.all(out["ok"])
    for i, t0 in enumerate(t0s):
        ref = orthonormal_decomposition(
            syn["times"], syn["data"], syn["modes"], syn["Mf"],
            syn["chif"], t0=float(t0), T=80.0)
        np.testing.assert_allclose(out["power"][i], ref["power"],
                                   rtol=0, atol=1e-11)
        assert abs(out["mismatch"][i] - ref["mismatch"]) < 1e-11


def test_t0_sweep_flags_degenerate_windows(syn):
    """A duplicated mode makes every window degenerate: in-jit Cholesky
    yields NaN and the ok mask is False (no exception inside jit)."""
    from qnmfits_tpu import orthonormal_t0_sweep

    out = orthonormal_t0_sweep(
        syn["times"], syn["data"], [syn["modes"][0], syn["modes"][0]],
        syn["Mf"], syn["chif"], np.array([0.0, 5.0]), T_array=80.0)
    assert not np.any(out["ok"])


def test_degenerate_set_raises(syn):
    with pytest.raises(ValueError, match="degenerate"):
        orthonormal_decomposition(
            syn["times"], syn["data"],
            [syn["modes"][0], syn["modes"][0]],    # duplicated mode
            syn["Mf"], syn["chif"], t0=0.0, T=100.0)


def test_empty_window_raises(syn):
    with pytest.raises(ValueError, match="empty fit window"):
        orthonormal_decomposition(
            syn["times"], syn["data"], syn["modes"], syn["Mf"],
            syn["chif"], t0=1e4, T=10.0)
