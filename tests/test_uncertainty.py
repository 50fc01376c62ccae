"""Amplitude-covariance diagnostics (qnmfits_tpu.uncertainty).

The statistical claims are validated by construction AND by Monte
Carlo: under the white-complex-noise model the predicted covariance
must match the empirical scatter of the lstsq amplitudes over repeated
noise draws.
"""

import numpy as np
import pytest

from qnmfits_tpu import amplitude_uncertainty
from qnmfits_tpu.testing import synthetic_multimode, synthetic_single


@pytest.fixture(scope="module")
def syn():
    return synthetic_single(modes=[(2, 2, n, 1) for n in range(3)],
                            seed=2)


class TestAmplitudeUncertainty:

    def test_amplitudes_match_the_fit(self, syn):
        """C is the SAME lstsq solution ringdown_fit ships."""
        from qnmfits_tpu import ringdown_fit

        out = amplitude_uncertainty(
            syn["times"], syn["data"], syn["modes"], syn["Mf"],
            syn["chif"], t0=0.0, T=80.0)
        fit = ringdown_fit(syn["times"], syn["data"], syn["modes"],
                           syn["Mf"], syn["chif"], t0=0.0, T=80.0)
        np.testing.assert_allclose(out["C"], fit["C"], rtol=0, atol=1e-12)
        np.testing.assert_allclose(out["omega"], fit["frequencies"],
                                   rtol=0, atol=0)
        assert out["cov"].shape == (3, 3)
        # Hermitian, PSD diagonal.
        np.testing.assert_allclose(out["cov"], out["cov"].conj().T,
                                   rtol=0, atol=1e-20)
        assert np.all(out["sigma_C"] >= 0)

    def test_covariance_matches_monte_carlo(self, syn):
        """Predicted per-mode variances match the empirical scatter of
        the lstsq amplitudes over 600 known-sigma noise draws, and the
        fully standardized errors are unit-variance (exercises the
        off-diagonal structure, not just the diagonal)."""
        noise = 1e-3                      # per quadrature component
        sigma = noise * np.sqrt(2.0)      # E|n_k|^2 = 2 noise^2
        out = amplitude_uncertainty(
            syn["times"], syn["data"], syn["modes"], syn["Mf"],
            syn["chif"], t0=0.0, T=80.0, sigma=sigma)

        # Rebuild the same masked design to draw the MC ensemble.
        mask = (syn["times"] >= 0.0) & (syn["times"] - 0.0 < 80.0)
        tm = syn["times"][mask]
        a = np.exp(-1j * out["omega"][None, :] * tm[:, None])
        pinv = np.linalg.pinv(a)
        rng = np.random.default_rng(7)
        R = 600
        n = noise * (rng.standard_normal((R, tm.size))
                     + 1j * rng.standard_normal((R, tm.size)))
        dC = n @ pinv.T                               # (R, J) Chat - C
        emp = (dC.conj().T @ dC) / R                  # empirical cov

        np.testing.assert_allclose(np.real(np.diag(emp)),
                                   np.real(np.diag(out["cov"])),
                                   rtol=0.2)
        # Whitened errors: z = L^{-1} dC has E|z_j|^2 = 1 per mode.
        L = np.linalg.cholesky(out["cov"])
        z = np.linalg.solve(L, dC.T)
        np.testing.assert_allclose(np.mean(np.abs(z) ** 2, axis=1),
                                   np.ones(3), rtol=0.2)

    def test_sigma_estimated_from_residual(self):
        """With sigma omitted, sigma2 is recovered from the residual to
        the 1/sqrt(dof) statistical floor."""
        noise = 5e-4
        s = synthetic_single(modes=[(2, 2, 0, 1), (2, 2, 1, 1)],
                             noise=noise, seed=9)
        out = amplitude_uncertainty(
            s["times"], s["data"], s["modes"], s["Mf"], s["chif"],
            t0=0.0, T=100.0)
        sigma2_true = 2.0 * noise ** 2
        assert abs(out["sigma2"] - sigma2_true) < 0.1 * sigma2_true
        assert out["dof"] == out["n_obs"] - 2

    def test_snr_separates_present_from_absent_modes(self):
        """A loud injected mode gets snr >> 1; a model mode absent from
        the data stays within a few sigma of zero."""
        modes = [(2, 2, 0, 1), (2, 2, 1, 1), (3, 2, 0, 1)]
        s = synthetic_single(modes=modes[:2], amplitudes=[1.0, 0.5],
                             noise=1e-4, seed=4)
        out = amplitude_uncertainty(
            s["times"], s["data"], modes, s["Mf"], s["chif"],
            t0=0.0, T=100.0)
        assert out["snr"][0] > 100 and out["snr"][1] > 100
        assert np.abs(out["C"][2]) < 5.0 * out["sigma_C"][2]

    def test_multimode_dict_data(self):
        """Dict data + mixing-stacked design: same amplitudes as the
        multimode fit, covariance over the stacked samples."""
        from qnmfits_tpu import multimode_ringdown_fit

        s = synthetic_multimode(seed=3)
        out = amplitude_uncertainty(
            s["times"], s["data_dict"], s["modes"], s["Mf"], s["chif"],
            t0=0.0, T=80.0, spherical_modes=s["spherical_modes"])
        fit = multimode_ringdown_fit(
            s["times"], s["data_dict"], s["modes"], s["Mf"], s["chif"],
            t0=0.0, T=80.0, spherical_modes=s["spherical_modes"])
        np.testing.assert_allclose(out["C"], fit["C"], rtol=0, atol=1e-12)
        assert out["n_obs"] == 2 * np.count_nonzero(
            (s["times"] >= 0.0) & (s["times"] < 80.0))

    def test_degenerate_modes_raise(self, syn):
        with pytest.raises(ValueError, match="degenerate"):
            amplitude_uncertainty(
                syn["times"], syn["data"],
                [(2, 2, 0, 1), (2, 2, 0, 1)], syn["Mf"], syn["chif"],
                t0=0.0, T=80.0)

    def test_empty_window_raises(self, syn):
        with pytest.raises(ValueError, match="empty"):
            amplitude_uncertainty(
                syn["times"], syn["data"], syn["modes"], syn["Mf"],
                syn["chif"], t0=1e6, T=10.0)


class TestModeSelection:
    """Model-order selection over an overtone ladder (mode_selection)."""

    @pytest.fixture(scope="class")
    def ladder(self):
        inj = [(2, 2, n, 1) for n in range(3)]
        s = synthetic_single(modes=inj, amplitudes=[1.0, 2.0, 4.0],
                             noise=1e-3, seed=11)
        models = [[(2, 2, n, 1) for n in range(j + 1)] for j in range(6)]
        return s, models

    def test_bic_picks_the_injected_order(self, ladder):
        from qnmfits_tpu import mode_selection

        s, models = ladder
        out = mode_selection(s["times"], s["data"], models, s["Mf"],
                             s["chif"], t0=0.0, T=100.0)
        assert out["best_bic"] == 2          # the 3-overtone truth
        # RSS is monotone non-increasing along a nested ladder.
        assert np.all(np.diff(out["rss"]) <= 1e-12)
        # delta columns are anchored at their minima.
        assert out["delta_bic"][out["best_bic"]] == 0.0
        assert out["delta_aic"][out["best_aic"]] == 0.0
        # AIC penalizes less: it never picks a SMALLER model than BIC.
        assert out["best_aic"] >= out["best_bic"]

    def test_f_test_flags_real_overtones_only(self, ladder):
        from qnmfits_tpu import mode_selection

        s, models = ladder
        out = mode_selection(s["times"], s["data"], models, s["Mf"],
                             s["chif"], t0=0.0, T=100.0)
        # Adding injected overtones: decisive (p ~ 0).
        assert out["pvalue"][0] < 1e-10 and out["pvalue"][1] < 1e-10
        # Adding absent overtones: not significant.
        assert out["pvalue"][2] > 1e-3

    def test_non_nested_pair_gets_nan(self, ladder):
        from qnmfits_tpu import mode_selection

        s, _ = ladder
        models = [[(2, 2, 0, 1)], [(2, 2, 1, 1), (2, 2, 2, 1)]]
        out = mode_selection(s["times"], s["data"], models, s["Mf"],
                             s["chif"], t0=0.0, T=100.0)
        assert np.isnan(out["fstat"][0]) and np.isnan(out["pvalue"][0])

    def test_requires_two_candidates(self, ladder):
        from qnmfits_tpu import mode_selection

        s, _ = ladder
        with pytest.raises(ValueError, match="at least two"):
            mode_selection(s["times"], s["data"], [[(2, 2, 0, 1)]],
                           s["Mf"], s["chif"], t0=0.0)

    def test_matches_fit_rss(self, ladder):
        """Per-candidate RSS equals the shipped fit's residual power."""
        from qnmfits_tpu import mode_selection, ringdown_fit

        s, models = ladder
        out = mode_selection(s["times"], s["data"], models, s["Mf"],
                             s["chif"], t0=0.0, T=100.0)
        fit = ringdown_fit(s["times"], s["data"], models[2], s["Mf"],
                           s["chif"], t0=0.0, T=100.0)
        r = fit["data"] - fit["model"]
        np.testing.assert_allclose(out["rss"][2],
                                   float(np.real(np.vdot(r, r))),
                                   rtol=1e-10)

    def test_degenerate_candidate_raises(self, ladder):
        """A rank-deficient candidate (duplicated mode) must raise, not
        silently mis-count parameters (lstsq rank is checked)."""
        from qnmfits_tpu import mode_selection

        s, _ = ladder
        models = [[(2, 2, 0, 1)], [(2, 2, 0, 1), (2, 2, 0, 1)]]
        with pytest.raises(ValueError, match="degenerate"):
            mode_selection(s["times"], s["data"], models, s["Mf"],
                           s["chif"], t0=0.0, T=100.0)


class TestExtendedFitFamilies:
    """VERDICT r4 item 9: the diagnostics span the dynamic-spectrum and
    mapping fit families with the same routing conventions as the fits
    (array Mf/chif -> dynamic; mapping_modes= -> mapping)."""

    def test_dynamic_constant_tracks_match_static(self, syn):
        K = len(syn["times"])
        Mf_t = np.full(K, syn["Mf"])
        chif_t = np.full(K, syn["chif"])
        # Known sigma: on noiseless data the residual-estimated sigma2
        # is rounding noise and differs between construction paths.
        stat = amplitude_uncertainty(
            syn["times"], syn["data"], syn["modes"], syn["Mf"],
            syn["chif"], t0=0.0, T=80.0, sigma=1e-3)
        dyn = amplitude_uncertainty(
            syn["times"], syn["data"], syn["modes"], Mf_t, chif_t,
            t0=0.0, T=80.0, sigma=1e-3)
        np.testing.assert_allclose(dyn["C"], stat["C"], rtol=0,
                                   atol=1e-12)
        np.testing.assert_allclose(np.real(np.diag(dyn["cov"])),
                                   np.real(np.diag(stat["cov"])),
                                   rtol=1e-9)
        # Dynamic omega is the (Km, J) track; constant tracks give
        # constant rows equal to the static frequencies.
        assert dyn["omega"].ndim == 2
        np.testing.assert_allclose(dyn["omega"][0], stat["omega"],
                                   rtol=0, atol=1e-12)

    def test_dynamic_matches_shipped_fit(self, syn):
        """C is the SAME lstsq solution dynamic_ringdown_fit ships, on
        a genuinely varying remnant track."""
        from qnmfits_tpu import dynamic_ringdown_fit

        K = len(syn["times"])
        Mf_t = syn["Mf"] * (1.0 + 0.02 * np.tanh(syn["times"] / 25.0))
        chif_t = np.clip(
            syn["chif"] * (1.0 - 0.03 * np.exp(-(syn["times"] + 10.0)
                                               / 30.0)), 0.0, 0.99)
        assert Mf_t.shape == (K,)
        out = amplitude_uncertainty(
            syn["times"], syn["data"], syn["modes"], Mf_t, chif_t,
            t0=0.0, T=80.0)
        fit = dynamic_ringdown_fit(syn["times"], syn["data"],
                                   syn["modes"], Mf_t, chif_t,
                                   t0=0.0, T=80.0)
        np.testing.assert_allclose(out["C"], fit["C"], rtol=0,
                                   atol=1e-12)

    def test_dynamic_covariance_monte_carlo(self, syn):
        """The predicted covariance matches the empirical lstsq scatter
        under the dynamic design (the verdict's required MC case)."""
        from qnmfits_tpu.uncertainty import _masked_design

        K = len(syn["times"])
        Mf_t = syn["Mf"] * (1.0 + 0.02 * np.tanh(syn["times"] / 25.0))
        chif_t = np.full(K, syn["chif"])
        noise = 1e-3
        sigma = noise * np.sqrt(2.0)
        out = amplitude_uncertainty(
            syn["times"], syn["data"], syn["modes"], Mf_t, chif_t,
            t0=0.0, T=80.0, sigma=sigma)
        a, d, _ = _masked_design(
            syn["times"], syn["data"], syn["modes"], Mf_t, chif_t,
            0.0, "geq", 80.0, None)
        pinv = np.linalg.pinv(a)
        rng = np.random.default_rng(11)
        R = 600
        n = noise * (rng.standard_normal((R, a.shape[0]))
                     + 1j * rng.standard_normal((R, a.shape[0])))
        dC = n @ pinv.T
        emp = (dC.conj().T @ dC) / R
        np.testing.assert_allclose(np.real(np.diag(emp)),
                                   np.real(np.diag(out["cov"])),
                                   rtol=0.2)

    def test_mapping_matches_shipped_fit(self):
        """C is the SAME lstsq solution the mapping fit ships; the
        identity-block columns get per-spherical-mode error bars."""
        from qnmfits_tpu import spatial
        from qnmfits_tpu.ref_impl import get_qnm, ringdown

        Mf, chif = 0.952, 0.692
        times = np.arange(-10.0, 120.0, 0.1)
        q = get_qnm()
        spherical_modes = [(4, 4), (5, 4)]
        lin_modes = [(4, 4, 0, 1)]
        quad_mode = (2, 2, 0, 1, 2, 2, 0, 1)
        rng = np.random.default_rng(3)
        amps_lin = rng.standard_normal(1) + 1j * rng.standard_normal(1)
        amp_quad = rng.standard_normal(2) + 1j * rng.standard_normal(2)
        w_lin = np.array(q.omega_list(lin_modes, chif, Mf))
        [w_quad] = q.omega_list([quad_mode], chif, Mf)
        data = {}
        for i, lm in enumerate(spherical_modes):
            mu = np.array(q.mu_list([lm + m for m in lin_modes], chif))
            h = ringdown(times, 0.0, mu * amps_lin, w_lin)
            h = h + ringdown(times, 0.0, [amp_quad[i]], [w_quad])
            data[lm] = h + 1e-5 * (rng.standard_normal(len(times))
                                   + 1j * rng.standard_normal(len(times)))

        modes = list(lin_modes) + [quad_mode]
        out = amplitude_uncertainty(
            times, data, modes, Mf, chif, t0=0.0, T=100,
            spherical_modes=spherical_modes, mapping_modes=[quad_mode])
        fit = spatial.mapping_multimode_ringdown_fit(
            times, data, modes, Mf, chif, t0=0.0,
            mapping_modes=[quad_mode], T=100,
            spherical_modes=spherical_modes)
        np.testing.assert_allclose(out["C"], fit["C"], rtol=0, atol=1e-10)
        # One column per (mapped mode, spherical mode) pair + linear.
        assert out["C"].shape[0] == len(lin_modes) \
            + len(spherical_modes) * 1
        assert np.all(out["snr"][:1] > 100)      # injected linear mode

    def test_mode_selection_dynamic(self, syn):
        from qnmfits_tpu import mode_selection

        K = len(syn["times"])
        Mf_t = syn["Mf"] * (1.0 + 0.02 * np.tanh(syn["times"] / 25.0))
        chif_t = np.full(K, syn["chif"])
        rng = np.random.default_rng(5)
        noisy = syn["data"] + 2e-4 * (
            rng.standard_normal(K) + 1j * rng.standard_normal(K))
        models = [[(2, 2, n, 1) for n in range(j)] for j in (1, 2, 3, 4)]
        out = mode_selection(syn["times"], noisy, models, Mf_t, chif_t,
                             t0=0.0, T=80.0)
        assert np.isfinite(out["bic"]).all()
        assert out["n_modes"].tolist() == [1, 2, 3, 4]

    def test_mapping_requires_dict_and_static(self, syn):
        with pytest.raises(ValueError, match="dict data"):
            amplitude_uncertainty(
                syn["times"], syn["data"], syn["modes"], syn["Mf"],
                syn["chif"], t0=0.0, T=80.0,
                mapping_modes=[(2, 2, 0, 1, 2, 2, 0, 1)])
        K = len(syn["times"])
        with pytest.raises(ValueError, match="static"):
            amplitude_uncertainty(
                syn["times"], {(2, 2): syn["data"]}, syn["modes"],
                np.full(K, syn["Mf"]), syn["chif"], t0=0.0, T=80.0,
                mapping_modes=[(2, 2, 0, 1, 2, 2, 0, 1)])
