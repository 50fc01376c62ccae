"""Fitting-engine tests: round trips, NumPy<->JAX parity, reference
semantics (delta, t0 methods, dynamic spectra)."""

import numpy as np
import pytest

from qnmfits_tpu import ref_impl
from qnmfits_tpu import fitting
from qnmfits_tpu.testing import synthetic_multimode, synthetic_single


# ---------------------------------------------------------------------------
# Round trips (analogue of examples/correcting_measured_amplitude.ipynb:
# a model-built waveform must be recovered exactly)
# ---------------------------------------------------------------------------

class TestRoundTrip:
    def test_numpy_single(self):
        syn = synthetic_single()
        out = ref_impl.ringdown_fit(
            syn["times"], syn["data"], syn["modes"], syn["Mf"], syn["chif"],
            t0=0.0, T=100)
        assert out["mismatch"] < 1e-12
        np.testing.assert_allclose(out["C"], syn["amplitudes"], atol=1e-9)

    def test_jax_single(self):
        syn = synthetic_single()
        out = fitting.ringdown_fit(
            syn["times"], syn["data"], syn["modes"], syn["Mf"], syn["chif"],
            t0=0.0, T=100)
        assert out["mismatch"] < 1e-12
        np.testing.assert_allclose(out["C"], syn["amplitudes"], atol=1e-9)

    def test_numpy_multimode(self):
        syn = synthetic_multimode()
        out = ref_impl.multimode_ringdown_fit(
            syn["times"], syn["data_dict"], syn["modes"], syn["Mf"],
            syn["chif"], t0=0.0, T=100,
            spherical_modes=syn["spherical_modes"])
        assert out["mismatch"] < 1e-12
        np.testing.assert_allclose(out["C"], syn["amplitudes"], atol=1e-8)

    def test_jax_multimode(self):
        syn = synthetic_multimode()
        out = fitting.multimode_ringdown_fit(
            syn["times"], syn["data_dict"], syn["modes"], syn["Mf"],
            syn["chif"], t0=0.0, T=100,
            spherical_modes=syn["spherical_modes"])
        assert out["mismatch"] < 1e-12
        np.testing.assert_allclose(out["C"], syn["amplitudes"], atol=1e-8)


# ---------------------------------------------------------------------------
# JAX vs NumPy parity on non-trivial data (the 1e-10 gate)
# ---------------------------------------------------------------------------

def _noisy_single():
    return synthetic_single(
        modes=[(2, 2, n, 1) for n in range(4)] + [(2, 2, 0, -1)],
        noise=1e-3, seed=3)


class TestParity:
    def test_single_fit_parity(self):
        syn = _noisy_single()
        kw = dict(t0=7.3, T=83.0)
        a = ref_impl.ringdown_fit(syn["times"], syn["data"], syn["modes"],
                                  syn["Mf"], syn["chif"], **kw)
        b = fitting.ringdown_fit(syn["times"], syn["data"], syn["modes"],
                                 syn["Mf"], syn["chif"], **kw)
        np.testing.assert_allclose(b["C"], a["C"], rtol=0, atol=1e-10)
        assert abs(b["mismatch"] - a["mismatch"]) < 1e-12
        np.testing.assert_allclose(b["frequencies"], a["frequencies"],
                                   atol=1e-12)

    def test_single_fit_parity_closest(self):
        syn = _noisy_single()
        kw = dict(t0=7.3, T=83.0, t0_method="closest")
        a = ref_impl.ringdown_fit(syn["times"], syn["data"], syn["modes"],
                                  syn["Mf"], syn["chif"], **kw)
        b = fitting.ringdown_fit(syn["times"], syn["data"], syn["modes"],
                                 syn["Mf"], syn["chif"], **kw)
        np.testing.assert_allclose(b["C"], a["C"], rtol=0, atol=1e-10)
        assert abs(b["mismatch"] - a["mismatch"]) < 1e-12

    def test_delta_perturbation_parity(self):
        syn = _noisy_single()
        delta = [0.01, -0.02, 0.0, 0.005, 0.0]
        a = ref_impl.ringdown_fit(syn["times"], syn["data"], syn["modes"],
                                  syn["Mf"], syn["chif"], t0=0.0,
                                  delta=delta)
        b = fitting.ringdown_fit(syn["times"], syn["data"], syn["modes"],
                                 syn["Mf"], syn["chif"], t0=0.0,
                                 delta=delta)
        np.testing.assert_allclose(b["C"], a["C"], rtol=0, atol=1e-10)
        np.testing.assert_allclose(b["frequencies"], a["frequencies"],
                                   atol=1e-12)

    def test_multimode_parity(self):
        syn = synthetic_multimode(seed=4)
        # perturb so the fit is non-trivial
        dd = {k: v + 1e-3 * np.exp(-0.05 * np.abs(syn["times"]))
              for k, v in syn["data_dict"].items()}
        kw = dict(t0=3.0, T=90.0, spherical_modes=syn["spherical_modes"])
        a = ref_impl.multimode_ringdown_fit(
            syn["times"], dd, syn["modes"], syn["Mf"], syn["chif"], **kw)
        b = fitting.multimode_ringdown_fit(
            syn["times"], dd, syn["modes"], syn["Mf"], syn["chif"], **kw)
        np.testing.assert_allclose(b["C"], a["C"], rtol=0, atol=1e-10)
        assert abs(b["mismatch"] - a["mismatch"]) < 1e-12
        for lm in syn["spherical_modes"]:
            np.testing.assert_allclose(
                b["weighted_C"][lm], a["weighted_C"][lm], atol=1e-10)

    def test_dynamic_fit_parity(self):
        syn = _noisy_single()
        K = len(syn["times"])
        Mf_t = np.linspace(0.97, 0.952, K)
        chif_t = np.linspace(0.65, 0.692, K)
        kw = dict(t0=5.0, T=80.0)
        a = ref_impl.dynamic_ringdown_fit(
            syn["times"], syn["data"], syn["modes"], Mf_t, chif_t, **kw)
        b = fitting.dynamic_ringdown_fit(
            syn["times"], syn["data"], syn["modes"], Mf_t, chif_t, **kw)
        np.testing.assert_allclose(b["C"], a["C"], rtol=0, atol=1e-10)
        assert abs(b["mismatch"] - a["mismatch"]) < 1e-12

    def test_dynamic_multimode_parity(self):
        syn = synthetic_multimode(seed=5)
        K = len(syn["times"])
        Mf_t = np.linspace(0.97, 0.952, K)
        chif_t = np.linspace(0.65, 0.692, K)
        kw = dict(t0=2.0, T=70.0, spherical_modes=syn["spherical_modes"])
        a = ref_impl.dynamic_multimode_ringdown_fit(
            syn["times"], syn["data_dict"], syn["modes"], Mf_t, chif_t, **kw)
        b = fitting.dynamic_multimode_ringdown_fit(
            syn["times"], syn["data_dict"], syn["modes"], Mf_t, chif_t, **kw)
        np.testing.assert_allclose(b["C"], a["C"], rtol=0, atol=1e-10)
        assert abs(b["mismatch"] - a["mismatch"]) < 1e-12


# ---------------------------------------------------------------------------
# Primitives
# ---------------------------------------------------------------------------

def test_ringdown_zero_padding():
    syn = synthetic_single()
    h = fitting.ringdown(syn["times"], 10.0, syn["amplitudes"],
                         syn["frequencies"])
    assert np.all(h[syn["times"] < 10.0] == 0)
    assert np.any(h[syn["times"] >= 10.0] != 0)


def test_mismatch_identical_is_zero():
    syn = synthetic_single()
    assert abs(fitting.mismatch(syn["times"], syn["data"],
                                syn["data"])) < 1e-14


def test_mismatch_scale_invariant():
    syn = synthetic_single()
    mm = fitting.mismatch(syn["times"], syn["data"], 3.7 * syn["data"])
    assert abs(mm) < 1e-13


def test_masked_trapz_matches_subarray():
    import jax.numpy as jnp
    from qnmfits_tpu.ops.windows import trapz_weights, window_geq
    rng = np.random.default_rng(0)
    t = np.sort(rng.uniform(0, 10, 200))
    y = rng.standard_normal(200)
    w = np.asarray(window_geq(jnp.asarray(t), 2.37, 5.0))
    tau = np.asarray(trapz_weights(jnp.asarray(t), jnp.asarray(w)))
    sel = w.astype(bool)
    assert abs(np.sum(tau * y) - np.trapezoid(y[sel], x=t[sel])) < 1e-12


class TestRandomizedParity:
    """Property-style sweeps: random mode sets / windows / spherical
    subsets, batched engines vs the NumPy oracle (seeded)."""

    @pytest.mark.parametrize("seed", [101, 102, 103, 104, 105])
    def test_random_config_t0_sweep(self, seed):
        from qnmfits_tpu import batched, ref_impl
        from qnmfits_tpu.testing import synthetic_multimode

        rng = np.random.default_rng(seed)
        pool = ([(2, 2, n, 1) for n in range(5)]
                + [(3, 2, n, 1) for n in range(3)]
                + [(2, 2, 0, -1), (2, 2, 1, -1)]
                + [(2, 2, 0, 1, 2, 2, 0, 1)])          # quadratic
        k = int(rng.integers(1, 6))
        idx = rng.choice(len(pool), size=k, replace=False)
        modes = [pool[i] for i in sorted(idx)]
        # quadratic modes are only valid for plain (non-mixing) fits
        has_quad = any(len(m) > 4 for m in modes)
        sph = None if (has_quad or rng.random() < 0.4) \
            else [(2, 2), (3, 2)]

        syn = synthetic_multimode(seed=seed)
        data = syn["data_dict"] if sph else syn["data_dict"][(2, 2)]
        t0_lo = float(rng.uniform(-3.0, 5.0))
        t0s = np.sort(rng.uniform(t0_lo, t0_lo + 25.0, size=6))
        T = float(rng.uniform(40.0, 90.0))

        mm_b = batched.batch_mismatch_t0(
            syn["times"], data, modes, syn["Mf"], syn["chif"], t0s,
            T_array=T, spherical_modes=sph)
        mm_l = ref_impl.mismatch_t0_array(
            syn["times"], data, modes, syn["Mf"], syn["chif"], t0s,
            T_array=T, spherical_modes=sph)
        np.testing.assert_allclose(mm_b, mm_l, rtol=0, atol=1e-11)

        # fast factored path (geq only, linear or quadratic alike)
        mm_f = batched.batch_mismatch_t0_fast(
            syn["times"], data, modes, syn["Mf"], syn["chif"], t0s,
            T_array=T, spherical_modes=sph)
        np.testing.assert_allclose(mm_f, mm_l, rtol=0, atol=1e-11)


class TestEdgeBehavior:
    """Pinned boundary behavior (documented, not crashes)."""

    @pytest.mark.filterwarnings(
        "ignore:invalid value encountered:RuntimeWarning")
    def test_empty_window_nan_mismatch(self):
        # The 0/0 RuntimeWarning is the oracle's deliberate
        # NaN-on-empty-window semantics (ref_impl.mismatch), not a bug.
        from qnmfits_tpu import fitting
        from qnmfits_tpu.testing import synthetic_single
        syn = synthetic_single(modes=[(2, 2, 0, 1)], noise=1e-3, seed=2)
        r = fitting.ringdown_fit(syn["times"], syn["data"],
                                 [(2, 2, 0, 1)], syn["Mf"], syn["chif"],
                                 t0=float(syn["times"][-1]) + 50.0)
        assert np.isnan(r["mismatch"])          # no crash; NaN result
        np.testing.assert_allclose(r["C"], 0.0)

    def test_offgrid_spin_raises(self):
        from qnmfits_tpu.qnm_api import qnm
        q = qnm()
        with pytest.raises(ValueError, match="chif must be"):
            q.omega(2, 2, 0, 1, 1.05)
        with pytest.raises(ValueError, match="chif must be"):
            q.omega(2, 2, 0, 1, -0.2)
        with pytest.raises(ValueError, match="chif must be"):
            q.mu(3, 2, 2, 2, 0, 1, 1.2)
        # the grid edge itself works
        assert np.isfinite(complex(q.omega(2, 2, 0, 1, 0.9995)))

    def test_sweep_offgrid_spin_raises_every_engine(self):
        """Accept/reject must not depend on the engine choice."""
        from qnmfits_tpu import batched, fitting
        from qnmfits_tpu.testing import synthetic_single
        syn = synthetic_single(modes=[(2, 2, 0, 1)], noise=1e-3, seed=3)
        t0s = np.linspace(0.0, 10.0, 4)
        for bad in (1.3, -0.2, float("nan")):
            with pytest.raises(ValueError, match="chif must be"):
                batched.batch_mismatch_t0_fast(
                    syn["times"], syn["data"], syn["modes"], syn["Mf"],
                    bad, t0s)
            with pytest.raises(ValueError, match="chif must be"):
                batched.batch_mismatch_t0(
                    syn["times"], syn["data"], syn["modes"], syn["Mf"],
                    bad, t0s)
            with pytest.raises(ValueError, match="chif must be"):
                fitting.ringdown_fit(syn["times"], syn["data"],
                                     syn["modes"], syn["Mf"], bad,
                                     t0=5.0)
            with pytest.raises(ValueError, match="chif must be"):
                batched.batch_mismatch_t0_modesets(
                    syn["times"], syn["data"], [syn["modes"]],
                    syn["Mf"], bad, t0s)
        with pytest.raises(ValueError, match="chif must be"):
            fitting.mismatch_M_chi_grid(
                syn["times"], syn["data"], syn["modes"], (0.9, 1.0),
                (0.5, 1.2), t0=5.0, res=3)

    def test_dynamic_spin_array_junk_samples_ok(self):
        """chif(t) arrays with junk outside the window must fit on BOTH
        engines (measured NR spin tracks are noisy pre-ringdown)."""
        from qnmfits_tpu import batched
        from qnmfits_tpu.testing import synthetic_single
        syn = synthetic_single(modes=[(2, 2, 0, 1)], noise=1e-3, seed=4)
        K = len(syn["times"])
        chif_t = np.full(K, syn["chif"])
        chif_t[:10] = -1e-3                     # junk before the window
        t0s = np.linspace(5.0, 12.0, 3)
        mm_b = batched.batch_mismatch_t0(
            syn["times"], syn["data"], syn["modes"], syn["Mf"], chif_t,
            t0s, T_array=60.0)
        mm_f = batched.batch_mismatch_t0_dynamic(
            syn["times"], syn["data"], syn["modes"], syn["Mf"], chif_t,
            t0s, T_array=60.0, engine="fast")
        assert np.all(np.isfinite(mm_b)) and np.all(np.isfinite(mm_f))
        np.testing.assert_allclose(mm_f, mm_b, rtol=0, atol=1e-11)


class TestMirrorQuadratic:
    """The modeling_memory mode content: the (2,2,0,+1)x(2,-2,0,-1)
    MIRROR quadratic (reference modeling_memory.ipynb cells 4-10)."""

    def test_mirror_sum_frequency_is_pure_imaginary(self):
        """omega(2,-2,0,-1) = -conj(omega_220), so the mirror-quadratic
        sum is 2i Im(omega_220): zero real part (the -conj mirror
        symmetry, reference qnm.py:232-233 + nonlinear sum :272-291)."""
        import qnmfits_tpu as qf
        chif, Mf = 0.692, 0.952
        w220 = qf.qnm.omega(2, 2, 0, 1, chif, Mf)
        w_mirror = qf.qnm.omega(2, -2, 0, -1, chif, Mf)
        assert abs(w_mirror - (-np.conj(w220))) < 1e-14
        [w_quad] = qf.qnm.omega_list([(2, 2, 0, 1, 2, -2, 0, -1)],
                                     chif, Mf)
        assert abs(w_quad - 2j * w220.imag) < 1e-14
        assert abs(w_quad.real) < 1e-14

    def test_free_frequency_recovers_mirror_quadratic(self):
        """End-to-end: fit h20-like data containing the mirror pair +
        mirror quadratic, recover the quadratic's (purely imaginary)
        frequency as the free mode on top of the fixed pair."""
        import qnmfits_tpu as qf
        chif, Mf = 0.692, 0.952
        times = np.arange(-10.0, 120.0, 0.1)
        pair = [(2, 0, 0, 1), (2, 0, 0, -1)]
        quad = (2, 2, 0, 1, 2, -2, 0, -1)
        content = pair + [quad]
        freqs = np.array(qf.qnm.omega_list(content, chif, Mf))
        amps = np.array([0.8 + 0.1j, 0.75 - 0.12j, 0.35 + 0.0j])
        h20 = qf.ringdown(times, 0.0, amps, freqs)
        w_fit = qf.free_frequency_fit_array(
            times, h20, np.array([5.0, 10.0]), modes=pair, Mf=Mf,
            chif=chif)
        target = freqs[2]
        assert np.min(np.abs(w_fit - target)) < 1e-4
        # Pure-imaginary recovery: the real part must be ~zero.
        assert np.min(np.abs(w_fit.real)) < 1e-4
