"""Smoke tests for the plotting helpers (Agg backend, no display)."""

import matplotlib

matplotlib.use("Agg")

import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="module")
def fit():
    from qnmfits_tpu import fitting
    from qnmfits_tpu.testing import synthetic_single

    syn = synthetic_single(modes=[(2, 2, n, 1) for n in range(3)],
                           noise=1e-3, seed=12)
    r = fitting.ringdown_fit(syn["times"], syn["data"], syn["modes"],
                             syn["Mf"], syn["chif"], t0=5.0)
    return syn, r


def test_plot_ringdown(fit):
    from qnmfits_tpu.plotting import plot_ringdown
    syn, r = fit
    fig = plot_ringdown(syn["times"], syn["data"], best_fit=r)
    assert fig is not None
    plt.close("all")


def test_plot_ringdown_log(fit):
    from qnmfits_tpu.plotting import plot_ringdown
    syn, r = fit
    fig = plot_ringdown(syn["times"], syn["data"], best_fit=r, log=True)
    assert fig is not None
    plt.close("all")


def test_plot_ringdown_modes(fit):
    from qnmfits_tpu.plotting import plot_ringdown_modes
    _, r = fit
    fig = plot_ringdown_modes(r)
    assert fig is not None
    plt.close("all")


def test_plot_mode_amplitudes(fit):
    from qnmfits_tpu.plotting import plot_mode_amplitudes
    _, r = fit
    fig = plot_mode_amplitudes(r["C"], r["mode_labels"], log=True)
    assert fig is not None
    plt.close("all")


def test_plot_mismatch_M_chi_grid(fit):
    from qnmfits_tpu import fitting
    from qnmfits_tpu.plotting import plot_mismatch_M_chi_grid
    syn, _ = fit
    mm = fitting.mismatch_M_chi_grid(
        syn["times"], syn["data"], syn["modes"], (0.9, 1.0), (0.6, 0.8),
        t0=5.0, res=4)
    fig = plot_mismatch_M_chi_grid(mm, (0.9, 1.0), (0.6, 0.8),
                                   truth=(syn["Mf"], syn["chif"]))
    assert fig is not None
    plt.close("all")


def test_plot_mismatch_omega_grid(fit):
    from qnmfits_tpu import fitting
    from qnmfits_tpu.plotting import plot_mismatch_omega_grid
    syn, _ = fit
    mm = fitting.mismatch_omega_grid(
        syn["times"], syn["data"], syn["modes"][:1], syn["Mf"],
        syn["chif"], (0.3, 0.8), (-0.4, -0.05), t0=5.0, res=4)
    fig = plot_mismatch_omega_grid(mm, (0.3, 0.8), (-0.4, -0.05))
    assert fig is not None
    plt.close("all")
