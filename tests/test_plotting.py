"""Plotting-helper tests (Agg backend, no display).

Beyond smoke: each test asserts the rendered artists carry the data the
helper was given (line ydata, heatmap arrays, scales, tick labels), so a
regression in the plotting layer fails on content, not just on raising.
"""

import os

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


def test_plot_ringdown(fit, tmp_path):
    from qnmfits_tpu.plotting import plot_ringdown
    syn, r = fit
    out = tmp_path / "ringdown.png"
    ax = plot_ringdown(syn["times"], syn["data"], best_fit=r,
                       outfile=str(out))
    assert ax is not None
    # data + model overlay, with the exact series that were passed in
    assert len(ax.lines) == 2
    np.testing.assert_allclose(ax.lines[0].get_ydata(),
                               np.real(syn["data"]))
    np.testing.assert_allclose(ax.lines[1].get_xdata(), r["model_times"])
    np.testing.assert_allclose(ax.lines[1].get_ydata(),
                               np.real(r["model"]))
    labels = [t.get_text() for t in ax.get_legend().get_texts()]
    assert labels == ["Re[data]", "Re[model]"]
    assert ax.get_xlabel() == r"$t\ [M]$"
    # outfile= saved a real image
    assert out.exists() and os.path.getsize(out) > 0
    plt.close("all")


def test_plot_ringdown_log(fit):
    from qnmfits_tpu.plotting import plot_ringdown
    syn, r = fit
    ax = plot_ringdown(syn["times"], syn["data"], best_fit=r, log=True)
    assert ax.get_yscale() == "log"
    np.testing.assert_allclose(ax.lines[0].get_ydata(),
                               np.abs(np.real(syn["data"])))
    plt.close("all")


def test_plot_ringdown_modes(fit):
    from qnmfits_tpu.plotting import plot_ringdown_modes
    _, r = fit
    ax = plot_ringdown_modes(r)
    # one line per QNM plus the dashed sum
    assert len(ax.lines) == len(r["modes"]) + 1
    total = np.sum([ln.get_ydata() for ln in ax.lines[:-1]], axis=0)
    np.testing.assert_allclose(ax.lines[-1].get_ydata(), total,
                               rtol=0, atol=1e-12)
    assert ax.lines[-1].get_linestyle() == "--"
    # per-mode legend labels plus "Sum"
    labels = [t.get_text() for t in ax.get_legend().get_texts()]
    assert labels == r["mode_labels"] + ["Sum"]
    plt.close("all")


def test_plot_mode_amplitudes(fit):
    from qnmfits_tpu.plotting import plot_mode_amplitudes
    _, r = fit
    ax = plot_mode_amplitudes(r["C"], r["mode_labels"], log=True)
    # one stem per mode, rising from 0 to |C_i|
    assert len(ax.lines) == len(r["C"])
    for i, ln in enumerate(ax.lines):
        np.testing.assert_allclose(ln.get_ydata(),
                                   [0.0, np.abs(r["C"][i])])
    assert [t.get_text() for t in ax.get_xticklabels()] == r["mode_labels"]
    assert ax.get_yscale() == "log"
    plt.close("all")


def test_plot_mismatch_M_chi_grid(fit):
    from qnmfits_tpu import fitting
    from qnmfits_tpu.plotting import plot_mismatch_M_chi_grid
    syn, _ = fit
    mm = fitting.mismatch_M_chi_grid(
        syn["times"], syn["data"], syn["modes"], (0.9, 1.0), (0.6, 0.8),
        t0=5.0, res=4)
    ax = plot_mismatch_M_chi_grid(mm, (0.9, 1.0), (0.6, 0.8),
                                  truth=(syn["Mf"], syn["chif"]))
    # the heatmap is log10 of the grid that was passed in
    assert len(ax.images) == 1
    np.testing.assert_allclose(np.asarray(ax.images[0].get_array()),
                               np.log10(mm))
    assert list(ax.images[0].get_extent()) == [0.6, 0.8, 0.9, 1.0]
    # truth is inside both ranges -> one axhline (Mf) + one axvline (chif)
    truth_lines = [ln for ln in ax.lines if len(ln.get_xdata()) == 2]
    assert len(truth_lines) == 2
    assert ax.get_xlabel() == r"$\chi_f$"
    plt.close("all")


def test_plot_mismatch_M_chi_grid_truth_outside(fit):
    from qnmfits_tpu import fitting
    from qnmfits_tpu.plotting import plot_mismatch_M_chi_grid
    syn, _ = fit
    mm = fitting.mismatch_M_chi_grid(
        syn["times"], syn["data"], syn["modes"], (0.9, 1.0), (0.6, 0.8),
        t0=5.0, res=4)
    # truth outside both ranges -> no guide lines drawn
    ax = plot_mismatch_M_chi_grid(mm, (0.9, 1.0), (0.6, 0.8),
                                  truth=(1.5, 0.99))
    assert len(ax.lines) == 0
    plt.close("all")


def test_plot_mismatch_omega_grid(fit):
    from qnmfits_tpu import fitting
    from qnmfits_tpu.plotting import plot_mismatch_omega_grid
    syn, _ = fit
    mm = fitting.mismatch_omega_grid(
        syn["times"], syn["data"], syn["modes"][:1], syn["Mf"],
        syn["chif"], (0.3, 0.8), (-0.4, -0.05), t0=5.0, res=4)
    ax = plot_mismatch_omega_grid(mm, (0.3, 0.8), (-0.4, -0.05))
    np.testing.assert_allclose(np.asarray(ax.images[0].get_array()),
                               np.log10(mm))
    assert list(ax.images[0].get_extent()) == [0.3, 0.8, -0.4, -0.05]
    assert ax.get_xlabel() == r"$\mathrm{Re}[\omega]$"
    plt.close("all")
