"""Gradient-optimiser tests: remnant recovery and free-frequency fits."""

import numpy as np
import pytest

from qnmfits_tpu import fitting
from qnmfits_tpu.testing import synthetic_multimode, synthetic_single


class TestCalculateEpsilon:
    def test_recovers_true_remnant_single(self):
        syn = synthetic_single(modes=[(2, 2, n, 1) for n in range(3)],
                               seed=12)
        eps, Mf_bf, chif_bf = fitting.calculate_epsilon(
            syn["times"], syn["data"], syn["modes"],
            syn["Mf"], syn["chif"], t0=0.0,
            x0=[syn["Mf"] + 0.02, syn["chif"] - 0.03])
        # Noiseless synthetic: the true remnant minimises the mismatch.
        assert eps < 1e-4
        assert abs(Mf_bf - syn["Mf"]) < 1e-4
        assert abs(chif_bf - syn["chif"]) < 1e-4

    def test_recovers_true_remnant_multimode(self):
        syn = synthetic_multimode(seed=13)
        eps, Mf_bf, chif_bf = fitting.calculate_epsilon(
            syn["times"], syn["data_dict"], syn["modes"],
            syn["Mf"], syn["chif"], t0=0.0,
            spherical_modes=syn["spherical_modes"],
            x0=[syn["Mf"] - 0.015, syn["chif"] + 0.02])
        assert eps < 1e-4

    def test_gradient_vs_nelder_mead(self):
        syn = synthetic_single(modes=[(2, 2, n, 1) for n in range(2)],
                               noise=1e-4, seed=14)
        kw = dict(t0=0.0, x0=[0.97, 0.66])
        eps_g, Mf_g, chif_g = fitting.calculate_epsilon(
            syn["times"], syn["data"], syn["modes"], syn["Mf"],
            syn["chif"], min_method="gradient", **kw)
        eps_n, Mf_n, chif_n = fitting.calculate_epsilon(
            syn["times"], syn["data"], syn["modes"], syn["Mf"],
            syn["chif"], min_method="Nelder-Mead", **kw)
        # Both should find the same (noise-shifted) minimum.
        assert abs(Mf_g - Mf_n) < 1e-3
        assert abs(chif_g - chif_n) < 1e-3


class TestFreeFrequency:
    def test_recovers_fundamental(self):
        syn = synthetic_single(modes=[(2, 2, 0, 1)], seed=15)
        w_true = syn["frequencies"][0]
        w_fit = fitting.free_frequency_fit(
            syn["times"], syn["data"], t0=0.0)
        assert abs(w_fit - w_true) < 1e-6

    def test_recovers_overtone_on_top_of_fixed(self):
        syn = synthetic_single(modes=[(2, 2, 0, 1), (2, 2, 1, 1)], seed=16)
        w_true = syn["frequencies"][1]
        w_fit = fitting.free_frequency_fit(
            syn["times"], syn["data"], t0=0.0,
            modes=[(2, 2, 0, 1)], Mf=syn["Mf"], chif=syn["chif"])
        assert abs(w_fit - w_true) < 1e-5


def test_epsilon_gradient_ignores_delta_for_dict_data():
    """Reference semantics: delta only applies to single-series fits;
    the gradient and Nelder-Mead paths must agree for dict data
    (regression: the gradient path applied delta and shifted the
    recovered remnant by ~50%)."""
    from qnmfits_tpu.optimize import calculate_epsilon_gradient
    from qnmfits_tpu.testing import synthetic_multimode

    syn = synthetic_multimode(seed=31)
    kw = dict(t0=5.0, T=80.0, spherical_modes=syn["spherical_modes"])
    eps0, Mf0, chif0 = calculate_epsilon_gradient(
        syn["times"], syn["data_dict"], syn["modes"], syn["Mf"],
        syn["chif"], **kw)
    eps1, Mf1, chif1 = calculate_epsilon_gradient(
        syn["times"], syn["data_dict"], syn["modes"], syn["Mf"],
        syn["chif"], delta=0.5, **kw)
    assert abs(Mf1 - Mf0) < 1e-9 and abs(chif1 - chif0) < 1e-9


def test_free_frequency_requires_remnant_with_fixed_modes():
    from qnmfits_tpu.optimize import free_frequency_fit_gradient
    from qnmfits_tpu.testing import synthetic_single

    syn = synthetic_single(modes=[(2, 2, 0, 1)], noise=1e-3, seed=32)
    with pytest.raises(ValueError, match="Mf and"):
        free_frequency_fit_gradient(syn["times"], syn["data"], 5.0,
                                    modes=[(2, 2, 0, 1)])


class TestBatchedOptimizerSweeps:
    """free_frequency_fit_array / calculate_epsilon_array: the vmapped
    (seed grid + damped Newton) sweeps must match the per-item scipy
    gradient paths (VERDICT r2 item 3: <= 1e-6 in omega)."""

    @pytest.fixture(scope="class")
    def syn(self):
        from qnmfits_tpu.testing import synthetic_single
        return synthetic_single(modes=[(2, 2, n, 1) for n in range(4)],
                                noise=0.0, seed=5)

    def test_free_frequency_array_matches_scipy(self, syn):
        from qnmfits_tpu.optimize import (free_frequency_fit_array,
                                          free_frequency_fit_gradient)
        t0s = np.linspace(0.0, 25.0, 9)
        wb = free_frequency_fit_array(syn["times"], syn["data"], t0s)
        ws = np.array([free_frequency_fit_gradient(
            syn["times"], syn["data"], float(t0)) for t0 in t0s])
        np.testing.assert_allclose(wb, ws, rtol=0, atol=1e-6)

    def test_free_frequency_array_with_fixed_modes(self, syn):
        from qnmfits_tpu.optimize import (free_frequency_fit_array,
                                          free_frequency_fit_gradient)
        t0s = np.linspace(0.0, 10.0, 4)
        kw = dict(modes=[(2, 2, 0, 1)], Mf=syn["Mf"], chif=syn["chif"])
        wb = free_frequency_fit_array(syn["times"], syn["data"], t0s, **kw)
        ws = np.array([free_frequency_fit_gradient(
            syn["times"], syn["data"], float(t0), **kw) for t0 in t0s])
        np.testing.assert_allclose(wb, ws, rtol=0, atol=1e-5)

    def test_free_frequency_array_requires_remnant_with_modes(self, syn):
        from qnmfits_tpu.optimize import free_frequency_fit_array
        with pytest.raises(ValueError, match="Mf and chif"):
            free_frequency_fit_array(syn["times"], syn["data"],
                                     [5.0], modes=[(2, 2, 0, 1)])

    def test_epsilon_array_matches_scipy(self, syn):
        from qnmfits_tpu.optimize import (calculate_epsilon_array,
                                          calculate_epsilon_gradient)
        t0s = np.linspace(0.0, 12.0, 5)
        eps_b, Mf_b, chif_b = calculate_epsilon_array(
            syn["times"], syn["data"], syn["modes"], syn["Mf"],
            syn["chif"], t0s)
        for i, t0 in enumerate(t0s):
            e, m, c = calculate_epsilon_gradient(
                syn["times"], syn["data"], syn["modes"], syn["Mf"],
                syn["chif"], float(t0))
            assert abs(Mf_b[i] - m) < 1e-6
            assert abs(chif_b[i] - c) < 1e-6

    def test_epsilon_array_multimode_dict(self):
        from qnmfits_tpu.optimize import (calculate_epsilon_array,
                                          calculate_epsilon_gradient)
        from qnmfits_tpu.testing import synthetic_multimode
        syn = synthetic_multimode(seed=31)
        kw = dict(spherical_modes=syn["spherical_modes"])
        t0s = np.array([5.0, 10.0])
        eps_b, Mf_b, chif_b = calculate_epsilon_array(
            syn["times"], syn["data_dict"], syn["modes"], syn["Mf"],
            syn["chif"], t0s, T_array=80.0, **kw)
        e, m, c = calculate_epsilon_gradient(
            syn["times"], syn["data_dict"], syn["modes"], syn["Mf"],
            syn["chif"], 5.0, T=80.0, **kw)
        assert abs(Mf_b[0] - m) < 1e-6 and abs(chif_b[0] - c) < 1e-6

    def test_epsilon_array_cold_start(self, syn):
        """A deliberately wrong x0 still recovers the remnant: the seed
        union includes a coarse bounded global grid (VERDICT r3 item 6;
        reference qnmfits.py:1519-1537 bounded global behaviour)."""
        from qnmfits_tpu.optimize import calculate_epsilon_array

        eps, Mf_b, chif_b = calculate_epsilon_array(
            syn["times"], syn["data"], syn["modes"], syn["Mf"],
            syn["chif"], np.array([5.0, 10.0]), x0=[1.8, 0.05])
        np.testing.assert_allclose(Mf_b, syn["Mf"], rtol=0, atol=1e-4)
        np.testing.assert_allclose(chif_b, syn["chif"], rtol=0,
                                   atol=1e-4)


class TestOptimizerDedup:
    """dedup=True on the array optimisers (PERF.md section 25): on a t0
    grid finer than the data sampling each DISTINCT window is optimised
    once and the result scattered back; the objective is invariant
    under the basis t0-shift, so the recovered quantities must match
    the direct (dedup=False) sweep."""

    @pytest.fixture(scope="class")
    def syn(self):
        from qnmfits_tpu.testing import synthetic_single
        return synthetic_single(modes=[(2, 2, n, 1) for n in range(3)],
                                noise=0.0, seed=7)

    # dt=0.1 in the fixture; spacing 0.0625 gives duplicate windows.
    T0S = np.linspace(0.0, 2.0, 33)

    def test_dedup_fires_on_fine_grid(self, syn):
        from qnmfits_tpu.optimize import _optimizer_dedup
        Ts = np.full_like(self.T0S, 100.0)
        dd = _optimizer_dedup(syn["times"], self.T0S, Ts, "geq")
        assert dd is not None
        rep, inverse = dd
        assert len(rep) < len(self.T0S)
        assert inverse.shape == self.T0S.shape
        # Each t0 maps to a representative holding the SAME samples.
        t = syn["times"]
        key = (np.searchsorted(t, self.T0S) * (len(t) + 1)
               + np.searchsorted(t, self.T0S + Ts))
        np.testing.assert_array_equal(key[rep][inverse], key)

    def test_free_frequency_dedup_matches_direct(self, syn):
        from qnmfits_tpu.optimize import free_frequency_fit_array
        w_d, mm_d, ok_d = free_frequency_fit_array(
            syn["times"], syn["data"], self.T0S, dedup=True,
            return_mismatch=True)
        w_0, mm_0, ok_0 = free_frequency_fit_array(
            syn["times"], syn["data"], self.T0S, dedup=False,
            return_mismatch=True)
        np.testing.assert_allclose(w_d, w_0, rtol=0, atol=1e-6)
        np.testing.assert_allclose(mm_d, mm_0, rtol=0, atol=1e-10)
        np.testing.assert_array_equal(ok_d, ok_0)

    def test_epsilon_dedup_matches_direct(self, syn):
        from qnmfits_tpu.optimize import calculate_epsilon_array
        kw = dict(t0_method="closest")
        eps_d, Mf_d, chif_d = calculate_epsilon_array(
            syn["times"], syn["data"], syn["modes"], syn["Mf"],
            syn["chif"], self.T0S, dedup=True, **kw)
        eps_0, Mf_0, chif_0 = calculate_epsilon_array(
            syn["times"], syn["data"], syn["modes"], syn["Mf"],
            syn["chif"], self.T0S, dedup=False, **kw)
        np.testing.assert_allclose(Mf_d, Mf_0, rtol=0, atol=1e-9)
        np.testing.assert_allclose(chif_d, chif_0, rtol=0, atol=1e-9)
        np.testing.assert_allclose(eps_d, eps_0, rtol=0, atol=1e-9)


def test_free_frequency_array_closest_method():
    from qnmfits_tpu.optimize import (free_frequency_fit_array,
                                      free_frequency_fit_gradient)
    from qnmfits_tpu.testing import synthetic_single

    syn = synthetic_single(modes=[(2, 2, 0, 1)], noise=0.0, seed=6)
    t0s = np.array([5.3, 10.7])
    wb = free_frequency_fit_array(syn["times"], syn["data"], t0s,
                                  t0_method="closest")
    ws = np.array([free_frequency_fit_gradient(
        syn["times"], syn["data"], float(t0), t0_method="closest")
        for t0 in t0s])
    np.testing.assert_allclose(wb, ws, rtol=0, atol=1e-6)
