"""Batched-sweep tests: vmapped results must equal per-item loop results."""

import numpy as np
import pytest

from qnmfits_tpu import batched, ref_impl
from qnmfits_tpu.testing import synthetic_multimode, synthetic_single


@pytest.fixture(scope="module")
def syn():
    return synthetic_single(
        modes=[(2, 2, n, 1) for n in range(3)], noise=1e-3, seed=7)


@pytest.fixture(scope="module")
def syn_mm():
    return synthetic_multimode(seed=8)


class TestT0Sweep:
    def test_matches_loop(self, syn):
        t0s = np.linspace(-5.0, 40.0, 12)
        mm_b = batched.batch_mismatch_t0(
            syn["times"], syn["data"], syn["modes"], syn["Mf"], syn["chif"],
            t0s, T_array=60.0)
        mm_l = ref_impl.mismatch_t0_array(
            syn["times"], syn["data"], syn["modes"], syn["Mf"], syn["chif"],
            t0s, T_array=60.0)
        np.testing.assert_allclose(mm_b, mm_l, rtol=0, atol=1e-11)

    def test_multimode_matches_loop(self, syn_mm):
        t0s = np.linspace(0.0, 30.0, 7)
        mm_b = batched.batch_mismatch_t0(
            syn_mm["times"], syn_mm["data_dict"], syn_mm["modes"],
            syn_mm["Mf"], syn_mm["chif"], t0s,
            spherical_modes=syn_mm["spherical_modes"])
        mm_l = ref_impl.mismatch_t0_array(
            syn_mm["times"], syn_mm["data_dict"], syn_mm["modes"],
            syn_mm["Mf"], syn_mm["chif"], t0s,
            spherical_modes=syn_mm["spherical_modes"])
        np.testing.assert_allclose(mm_b, mm_l, rtol=0, atol=1e-11)

    def test_per_t0_T_array(self, syn):
        t0s = np.linspace(0.0, 10.0, 5)
        Ts = np.linspace(40.0, 80.0, 5)
        mm_b = batched.batch_mismatch_t0(
            syn["times"], syn["data"], syn["modes"], syn["Mf"], syn["chif"],
            t0s, T_array=Ts)
        mm_l = ref_impl.mismatch_t0_array(
            syn["times"], syn["data"], syn["modes"], syn["Mf"], syn["chif"],
            t0s, T_array=Ts)
        np.testing.assert_allclose(mm_b, mm_l, rtol=0, atol=1e-11)

    def test_closest_method(self, syn):
        t0s = np.linspace(0.0, 10.0, 5) + 0.013
        mm_b = batched.batch_mismatch_t0(
            syn["times"], syn["data"], syn["modes"], syn["Mf"], syn["chif"],
            t0s, t0_method="closest")
        mm_l = ref_impl.mismatch_t0_array(
            syn["times"], syn["data"], syn["modes"], syn["Mf"], syn["chif"],
            t0s, t0_method="closest")
        np.testing.assert_allclose(mm_b, mm_l, rtol=0, atol=1e-11)

    def test_delta(self, syn):
        t0s = np.linspace(0.0, 10.0, 4)
        delta = [0.01, -0.01, 0.0]
        mm_b = batched.batch_mismatch_t0(
            syn["times"], syn["data"], syn["modes"], syn["Mf"], syn["chif"],
            t0s, delta=delta)
        mm_l = ref_impl.mismatch_t0_array(
            syn["times"], syn["data"], syn["modes"], syn["Mf"], syn["chif"],
            t0s, delta=delta)
        np.testing.assert_allclose(mm_b, mm_l, rtol=0, atol=1e-11)


class TestGrids:
    def test_M_chi_grid_matches_loop(self, syn):
        mm_b = batched.batch_mismatch_M_chi(
            syn["times"], syn["data"], syn["modes"], (0.9, 1.0),
            (0.6, 0.8), t0=0.0, res=4)
        mm_l = ref_impl.mismatch_M_chi_grid(
            syn["times"], syn["data"], syn["modes"], (0.9, 1.0),
            (0.6, 0.8), t0=0.0, res=4)
        np.testing.assert_allclose(mm_b, mm_l, rtol=0, atol=1e-11)

    def test_M_chi_grid_multimode(self, syn_mm):
        mm_b = batched.batch_mismatch_M_chi(
            syn_mm["times"], syn_mm["data_dict"], syn_mm["modes"],
            (0.9, 1.0), (0.6, 0.8), t0=0.0, res=3,
            spherical_modes=syn_mm["spherical_modes"])
        mm_l = ref_impl.mismatch_M_chi_grid(
            syn_mm["times"], syn_mm["data_dict"], syn_mm["modes"],
            (0.9, 1.0), (0.6, 0.8), t0=0.0, res=3,
            spherical_modes=syn_mm["spherical_modes"])
        np.testing.assert_allclose(mm_b, mm_l, rtol=0, atol=1e-11)

    def test_omega_grid_matches_loop(self, syn):
        kw = dict(re_minmax=(0.4, 0.6), im_minmax=(-0.2, -0.05),
                  t0=0.0, res=4)
        mm_b = batched.batch_mismatch_omega(
            syn["times"], syn["data"], syn["modes"][:1], syn["Mf"],
            syn["chif"], **kw)
        mm_l = ref_impl.mismatch_omega_grid(
            syn["times"], syn["data"], syn["modes"][:1], syn["Mf"],
            syn["chif"], **kw)
        np.testing.assert_allclose(mm_b, mm_l, rtol=0, atol=1e-11)


def test_padded_mode_set_amplitudes_zero(syn):
    """col_mask padding: padded slots return exactly zero amplitude and do
    not perturb the real ones."""
    import jax.numpy as jnp
    from qnmfits_tpu.engine import SpectrumEvaluator, fit_core
    from qnmfits_tpu.ops.windows import window_geq

    ev = SpectrumEvaluator(syn["modes"])
    times = jnp.asarray(syn["times"])
    data = jnp.asarray(syn["data"])[None, :]
    omega = ev.omega(syn["chif"], syn["Mf"])
    mu = jnp.ones((1, omega.shape[0]))
    w = window_geq(times, 0.0, 100.0)
    C_ref, mm_ref = fit_core(times, data, omega, mu, 0.0, w)

    omega_p = jnp.concatenate([omega, jnp.zeros(2, omega.dtype)])
    mu_p = jnp.ones((1, omega_p.shape[0]))
    mask = jnp.array([True] * omega.shape[0] + [False] * 2)
    C_p, mm_p = fit_core(times, data, omega_p, mu_p, 0.0, w, col_mask=mask)
    np.testing.assert_allclose(C_p[:3], C_ref, atol=1e-12)
    assert np.all(np.asarray(C_p[3:]) == 0)
    assert abs(mm_p - mm_ref) < 1e-13


def test_dynamic_t0_sweep_matches_loop():
    from qnmfits_tpu.batched import batch_mismatch_t0_dynamic
    syn = synthetic_single(modes=[(2, 2, n, 1) for n in range(3)],
                           noise=1e-3, seed=31)
    K = len(syn["times"])
    Mf_t = np.linspace(0.97, 0.952, K)
    chif_t = np.linspace(0.65, 0.692, K)
    t0s = np.linspace(0.0, 15.0, 5)
    mm_b = batch_mismatch_t0_dynamic(
        syn["times"], syn["data"], syn["modes"], Mf_t, chif_t, t0s,
        T_array=70.0)
    mm_l = ref_impl.mismatch_t0_array(
        syn["times"], syn["data"], syn["modes"], Mf_t, chif_t, t0s,
        T_array=70.0)
    np.testing.assert_allclose(mm_b, mm_l, rtol=0, atol=1e-11)


def test_dynamic_multimode_t0_sweep_matches_loop():
    from qnmfits_tpu.batched import batch_mismatch_t0_dynamic
    syn = synthetic_multimode(seed=32)
    K = len(syn["times"])
    Mf_t = np.linspace(0.97, 0.952, K)
    chif_t = np.linspace(0.65, 0.692, K)
    t0s = np.linspace(0.0, 12.0, 4)
    mm_b = batch_mismatch_t0_dynamic(
        syn["times"], syn["data_dict"], syn["modes"], Mf_t, chif_t, t0s,
        spherical_modes=syn["spherical_modes"])
    mm_l = ref_impl.mismatch_t0_array(
        syn["times"], syn["data_dict"], syn["modes"], Mf_t, chif_t, t0s,
        spherical_modes=syn["spherical_modes"])
    np.testing.assert_allclose(mm_b, mm_l, rtol=0, atol=1e-11)


def test_fast_t0_sweep_matches_loop(syn):
    from qnmfits_tpu.batched import batch_mismatch_t0_fast
    t0s = np.linspace(-5.0, 40.0, 12)
    mm_f, C_f = batch_mismatch_t0_fast(
        syn["times"], syn["data"], syn["modes"], syn["Mf"], syn["chif"],
        t0s, T_array=60.0, return_amplitudes=True)
    mm_l = ref_impl.mismatch_t0_array(
        syn["times"], syn["data"], syn["modes"], syn["Mf"], syn["chif"],
        t0s, T_array=60.0)
    np.testing.assert_allclose(mm_f, mm_l, rtol=0, atol=1e-11)
    # amplitudes too
    out = ref_impl.ringdown_fit(syn["times"], syn["data"], syn["modes"],
                                syn["Mf"], syn["chif"], t0=t0s[3], T=60.0)
    np.testing.assert_allclose(C_f[3], out["C"], atol=1e-9)


def test_fast_t0_sweep_multimode(syn_mm):
    from qnmfits_tpu.batched import batch_mismatch_t0_fast
    t0s = np.linspace(0.0, 30.0, 7)
    mm_f = batch_mismatch_t0_fast(
        syn_mm["times"], syn_mm["data_dict"], syn_mm["modes"],
        syn_mm["Mf"], syn_mm["chif"], t0s,
        spherical_modes=syn_mm["spherical_modes"])
    mm_l = ref_impl.mismatch_t0_array(
        syn_mm["times"], syn_mm["data_dict"], syn_mm["modes"],
        syn_mm["Mf"], syn_mm["chif"], t0s,
        spherical_modes=syn_mm["spherical_modes"])
    np.testing.assert_allclose(mm_f, mm_l, rtol=0, atol=1e-11)


def test_batch_mismatch_t0_routes_dynamic():
    """batch_mismatch_t0 with array Mf/chif must route to the dynamic
    kernel instead of raising (the former documented API hole)."""
    from qnmfits_tpu.batched import batch_mismatch_t0
    syn = synthetic_single(modes=[(2, 2, n, 1) for n in range(3)],
                           noise=1e-3, seed=33)
    K = len(syn["times"])
    Mf_t = np.linspace(0.97, 0.952, K)
    chif_t = np.linspace(0.65, 0.692, K)
    t0s = np.linspace(0.0, 15.0, 4)
    mm_b = batch_mismatch_t0(
        syn["times"], syn["data"], syn["modes"], Mf_t, chif_t, t0s,
        T_array=70.0)
    mm_l = ref_impl.mismatch_t0_array(
        syn["times"], syn["data"], syn["modes"], Mf_t, chif_t, t0s,
        T_array=70.0)
    np.testing.assert_allclose(mm_b, mm_l, rtol=0, atol=1e-11)
    with pytest.raises(ValueError, match="delta"):
        batch_mismatch_t0(
            syn["times"], syn["data"], syn["modes"], Mf_t, chif_t, t0s,
            T_array=70.0, delta=0.01)


class TestModesetSweep:
    """The t0 x mode-set sweep (batch_mismatch_t0_modesets)."""

    def test_mesh_rejects_non_x64_precision(self, syn_mm):
        """The sharded kernels run split-complex f64 unconditionally;
        a non-default precision combined with mesh= must fail loudly
        instead of being silently ignored."""
        import pytest
        mode_sets = [[(2, 2, 0, 1)]]
        t0s = np.linspace(0.0, 10.0, 4)
        for fn in (batched.batch_mismatch_t0_modesets,
                   batched.batch_mismatch_t0_modesets_dynamic):
            with pytest.raises(ValueError, match="split-complex"):
                fn(syn_mm["times"], syn_mm["data_dict"], mode_sets,
                   syn_mm["Mf"], syn_mm["chif"], t0s,
                   spherical_modes=syn_mm["spherical_modes"],
                   precision="f32", mesh="auto")
        with pytest.raises(ValueError, match="split-complex"):
            batched.batch_fit_events(
                syn_mm["times"],
                np.stack([syn_mm["data_dict"][(2, 2)]] * 2),
                mode_sets[0], np.full(2, syn_mm["Mf"]),
                np.full(2, syn_mm["chif"]), np.zeros(2),
                precision="f32", mesh="auto")

    def test_matches_per_set_loop(self, syn_mm):
        mode_sets = [
            [(2, 2, n, 1) for n in range(nmax)] for nmax in (1, 2, 4)
        ] + [[(2, 2, 0, 1), (2, 2, 0, -1)]]
        t0s = np.linspace(0.0, 30.0, 9)
        mm = batched.batch_mismatch_t0_modesets(
            syn_mm["times"], syn_mm["data_dict"], mode_sets,
            syn_mm["Mf"], syn_mm["chif"], t0s, T_array=80.0,
            spherical_modes=syn_mm["spherical_modes"])
        assert mm.shape == (4, 9)
        for si, ms in enumerate(mode_sets):
            mm_l = ref_impl.mismatch_t0_array(
                syn_mm["times"], syn_mm["data_dict"], ms,
                syn_mm["Mf"], syn_mm["chif"], t0s, T_array=80.0,
                spherical_modes=syn_mm["spherical_modes"])
            np.testing.assert_allclose(mm[si], mm_l, rtol=0, atol=1e-11)

    def test_amplitudes_trimmed_to_set_length(self, syn_mm):
        mode_sets = [[(2, 2, 0, 1)],
                     [(2, 2, n, 1) for n in range(3)]]
        t0s = np.linspace(0.0, 10.0, 4)
        mm, Cs = batched.batch_mismatch_t0_modesets(
            syn_mm["times"], syn_mm["data_dict"], mode_sets,
            syn_mm["Mf"], syn_mm["chif"], t0s,
            spherical_modes=syn_mm["spherical_modes"],
            return_amplitudes=True)
        assert Cs[0].shape == (4, 1) and Cs[1].shape == (4, 3)
        _, C_ref = batched.batch_mismatch_t0(
            syn_mm["times"], syn_mm["data_dict"], mode_sets[1],
            syn_mm["Mf"], syn_mm["chif"], t0s,
            spherical_modes=syn_mm["spherical_modes"],
            return_amplitudes=True)
        np.testing.assert_allclose(Cs[1], C_ref, rtol=0, atol=1e-9)


    def test_remnant_axis_folds_into_set_axis(self, syn_mm):
        """chif (and Mf) arrays fold per-spin spectra into the vmapped
        set axis: (S, R, B) output equal to per-spin scalar calls."""
        mode_sets = [[(2, 2, n, 1) for n in range(nmax)]
                     for nmax in (1, 3)]
        t0s = np.linspace(0.0, 12.0, 5)
        chifs = np.array([0.60, syn_mm["chif"], 0.75])
        kw = dict(T_array=80.0, spherical_modes=syn_mm["spherical_modes"],
                  return_amplitudes=True)
        mm_arr, C_arr = batched.batch_mismatch_t0_modesets(
            syn_mm["times"], syn_mm["data_dict"], mode_sets,
            syn_mm["Mf"], chifs, t0s, **kw)
        assert mm_arr.shape == (2, 3, 5)
        assert C_arr[0].shape == (3, 5, 1) and C_arr[1].shape == (3, 5, 3)
        for r, c in enumerate(chifs):
            mm_s, C_s = batched.batch_mismatch_t0_modesets(
                syn_mm["times"], syn_mm["data_dict"], mode_sets,
                syn_mm["Mf"], float(c), t0s, **kw)
            np.testing.assert_allclose(mm_arr[:, r], mm_s, rtol=0,
                                       atol=1e-12)
            for s in range(len(mode_sets)):
                np.testing.assert_allclose(C_arr[s][r], C_s[s], rtol=0,
                                           atol=1e-10)

    def test_remnant_axis_bad_spin_raises(self, syn_mm):
        with pytest.raises(ValueError, match="chif"):
            batched.batch_mismatch_t0_modesets(
                syn_mm["times"], syn_mm["data_dict"], [syn_mm["modes"]],
                syn_mm["Mf"], np.array([0.5, 1.2]),
                np.linspace(0.0, 5.0, 3))


    def test_closest_method_matches_per_set_loop(self, syn_mm):
        """t0_method='closest' mode-set sweep == per-set reference loop
        (closes VERDICT r2 weak 7: the set axis previously existed for
        'geq' only)."""
        mode_sets = [[(2, 2, n, 1) for n in range(nmax)]
                     for nmax in (1, 3)]
        t0s = np.linspace(0.3, 12.0, 5)
        mm = batched.batch_mismatch_t0_modesets(
            syn_mm["times"], syn_mm["data_dict"], mode_sets,
            syn_mm["Mf"], syn_mm["chif"], t0s, T_array=80.0,
            spherical_modes=syn_mm["spherical_modes"],
            t0_method="closest")
        for si, ms in enumerate(mode_sets):
            mm_l = ref_impl.mismatch_t0_array(
                syn_mm["times"], syn_mm["data_dict"], ms,
                syn_mm["Mf"], syn_mm["chif"], t0s, t0_method="closest",
                T_array=80.0,
                spherical_modes=syn_mm["spherical_modes"])
            np.testing.assert_allclose(mm[si], mm_l, rtol=0, atol=1e-11)

    def test_dynamic_modesets_matches_per_set(self, syn_mm):
        """dynamic=True mode-set sweep (time-dependent Mf(t)/chif(t))
        == per-set batch_mismatch_t0_dynamic."""
        from qnmfits_tpu import fitting
        K = len(syn_mm["times"])
        Mf_t = np.linspace(1.02 * syn_mm["Mf"], syn_mm["Mf"], K)
        chif_t = np.linspace(0.6, syn_mm["chif"], K)
        mode_sets = [[(2, 2, n, 1) for n in range(nmax)]
                     for nmax in (1, 3)]
        t0s = np.linspace(0.0, 10.0, 4)
        mm, Cs = fitting.mismatch_t0_mode_sets(
            syn_mm["times"], syn_mm["data_dict"], mode_sets, Mf_t,
            chif_t, t0s, T_array=80.0,
            spherical_modes=syn_mm["spherical_modes"], dynamic=True,
            return_amplitudes=True)
        assert mm.shape == (2, 4)
        for si, ms in enumerate(mode_sets):
            mm_l, C_l = batched.batch_mismatch_t0_dynamic(
                syn_mm["times"], syn_mm["data_dict"], ms, Mf_t, chif_t,
                t0s, T_array=80.0,
                spherical_modes=syn_mm["spherical_modes"],
                return_amplitudes=True)
            np.testing.assert_allclose(mm[si], mm_l, rtol=0, atol=1e-11)
            np.testing.assert_allclose(Cs[si], C_l, rtol=0, atol=1e-9)


    def test_positional_contract(self, syn_mm):
        """The public signature keeps T_array at positional slot 7
        (the original contract); everything newer is keyword-only and
        a positional mis-binding fails loudly (PARITY.md)."""
        from qnmfits_tpu import fitting
        mode_sets = [[(2, 2, 0, 1)]]
        t0s = np.linspace(0.0, 10.0, 3)
        mm_pos = fitting.mismatch_t0_mode_sets(
            syn_mm["times"], syn_mm["data_dict"], mode_sets,
            syn_mm["Mf"], syn_mm["chif"], t0s, 80.0,
            spherical_modes=syn_mm["spherical_modes"])
        mm_kw = fitting.mismatch_t0_mode_sets(
            syn_mm["times"], syn_mm["data_dict"], mode_sets,
            syn_mm["Mf"], syn_mm["chif"], t0s, T_array=80.0,
            spherical_modes=syn_mm["spherical_modes"])
        np.testing.assert_array_equal(mm_pos, mm_kw)
        with pytest.raises(TypeError):
            fitting.mismatch_t0_mode_sets(
                syn_mm["times"], syn_mm["data_dict"], mode_sets,
                syn_mm["Mf"], syn_mm["chif"], t0s, 80.0, "closest")

    def test_bucketed_matches_flat(self, syn_mm):
        """bucket=True (per-width kernels) == the flat padded sweep,
        including the remnant axis and trimmed amplitudes."""
        mode_sets = [[(2, 2, n, 1) for n in range(nmax)]
                     for nmax in (1, 2, 3, 4)]
        t0s = np.linspace(0.0, 12.0, 5)
        kw = dict(T_array=80.0, spherical_modes=syn_mm["spherical_modes"],
                  return_amplitudes=True)
        mm0, C0 = batched.batch_mismatch_t0_modesets(
            syn_mm["times"], syn_mm["data_dict"], mode_sets,
            syn_mm["Mf"], syn_mm["chif"], t0s, **kw)
        mm1, C1 = batched.batch_mismatch_t0_modesets(
            syn_mm["times"], syn_mm["data_dict"], mode_sets,
            syn_mm["Mf"], syn_mm["chif"], t0s, bucket=True, **kw)
        np.testing.assert_allclose(mm1, mm0, rtol=0, atol=1e-12)
        for a, b in zip(C0, C1):
            np.testing.assert_allclose(b, a, rtol=0, atol=1e-9)
        chifs = np.array([0.6, syn_mm["chif"]])
        mm2 = batched.batch_mismatch_t0_modesets(
            syn_mm["times"], syn_mm["data_dict"], mode_sets,
            syn_mm["Mf"], chifs, t0s, T_array=80.0,
            spherical_modes=syn_mm["spherical_modes"])
        mm3 = batched.batch_mismatch_t0_modesets(
            syn_mm["times"], syn_mm["data_dict"], mode_sets,
            syn_mm["Mf"], chifs, t0s, T_array=80.0,
            spherical_modes=syn_mm["spherical_modes"], bucket=True)
        np.testing.assert_allclose(mm3, mm2, rtol=0, atol=1e-12)


    def test_dynamic_modesets_bad_t0_method_raises(self, syn_mm):
        """Regression: a t0_method typo on the dynamic mode-set sweep
        must raise, not silently run 'closest' windows."""
        K = len(syn_mm["times"])
        chif_t = np.linspace(0.6, syn_mm["chif"], K)
        with pytest.raises(ValueError, match="t0_method"):
            batched.batch_mismatch_t0_modesets_dynamic(
                syn_mm["times"], syn_mm["data_dict"],
                [syn_mm["modes"]], syn_mm["Mf"], chif_t,
                np.linspace(0.0, 5.0, 3), t0_method="GEQ")


    def test_bucket_with_mesh(self, syn_mm):
        """bucket=True composes with mesh sharding (each width class
        runs its own sharded kernel)."""
        import jax
        devs = jax.devices("cpu")
        if len(devs) < 8:
            pytest.skip("needs 8 virtual CPU devices")
        from qnmfits_tpu.parallel.mesh import sweep_mesh
        mode_sets = [[(2, 2, n, 1) for n in range(nmax)]
                     for nmax in (1, 4)]
        t0s = np.linspace(0.0, 12.0, 8)
        kw = dict(T_array=80.0, spherical_modes=syn_mm["spherical_modes"])
        mm0 = batched.batch_mismatch_t0_modesets(
            syn_mm["times"], syn_mm["data_dict"], mode_sets,
            syn_mm["Mf"], syn_mm["chif"], t0s, **kw)
        mm1 = batched.batch_mismatch_t0_modesets(
            syn_mm["times"], syn_mm["data_dict"], mode_sets,
            syn_mm["Mf"], syn_mm["chif"], t0s, bucket=True,
            mesh=sweep_mesh(n_sweep=8, n_time=1, devices=devs), **kw)
        np.testing.assert_allclose(mm1, mm0, rtol=0, atol=1e-12)

    def test_unsorted_t0_raises(self, syn_mm):
        with pytest.raises(ValueError, match="sorted"):
            batched.batch_mismatch_t0_modesets(
                syn_mm["times"], syn_mm["data_dict"], [syn_mm["modes"]],
                syn_mm["Mf"], syn_mm["chif"], np.array([5.0, 0.0]))

    def test_vmap_equals_serial_modesets(self, syn_mm):
        """vmapped mode-set axis == per-set serialized kernel."""
        import jax.numpy as jnp
        from qnmfits_tpu.engine import SpectrumEvaluator
        from qnmfits_tpu.engine_real import (
            sweep_t0_modesets_factored_real)

        sph = syn_mm["spherical_modes"]
        sets = [[(2, 2, n, 1) for n in range(nmax)] for nmax in (2, 4)]
        J = max(len(ms) for ms in sets)
        S, I = len(sets), len(sph)
        omegas = np.zeros((S, J), complex)
        mus = np.zeros((S, I, J), complex)
        masks = np.zeros((S, J), bool)
        for si, ms in enumerate(sets):
            ev = SpectrumEvaluator(ms, sph)
            omegas[si, :len(ms)] = np.asarray(
                ev.omega(syn_mm["chif"], syn_mm["Mf"]))
            mus[si, :, :len(ms)] = np.asarray(ev.mu(syn_mm["chif"]))
            masks[si, :len(ms)] = True
        data = np.stack([syn_mm["data_dict"][lm] for lm in sph])
        t0s = np.linspace(0.0, 12.0, 8)
        Ts = np.full_like(t0s, 60.0)
        args = (jnp.asarray(syn_mm["times"]),
                jnp.asarray(data.real), jnp.asarray(data.imag),
                jnp.asarray(omegas.real), jnp.asarray(omegas.imag),
                jnp.asarray(mus.real), jnp.asarray(mus.imag),
                jnp.asarray(t0s), jnp.asarray(Ts), jnp.asarray(masks))
        Cre_v, Cim_v, mm_v = sweep_t0_modesets_factored_real(
            *args, chunk=4)
        Cre_s, Cim_s, mm_s = sweep_t0_modesets_factored_real(
            *args, chunk=4, set_chunk=1)
        np.testing.assert_allclose(np.asarray(mm_v), np.asarray(mm_s),
                                   rtol=0, atol=1e-13)
        np.testing.assert_allclose(np.asarray(Cre_v), np.asarray(Cre_s),
                                   rtol=0, atol=1e-10)


class TestFastGrids:
    """Split-complex TPU grid kernels == x64 batched grids."""

    def test_M_chi_fast_matches_batched(self, syn):
        kw = dict(t0=5.0, T=80.0, res=6)
        mm_f = batched.batch_mismatch_M_chi_fast(
            syn["times"], syn["data"], syn["modes"],
            (0.9, 1.0), (0.6, 0.8), **kw)
        mm_b = batched.batch_mismatch_M_chi(
            syn["times"], syn["data"], syn["modes"],
            (0.9, 1.0), (0.6, 0.8), **kw)
        np.testing.assert_allclose(mm_f, mm_b, rtol=0, atol=1e-11)

    def test_M_chi_fast_multimode_with_delta(self, syn_mm):
        kw = dict(t0=5.0, T=80.0, res=5,
                  spherical_modes=syn_mm["spherical_modes"], delta=0.01)
        mm_f = batched.batch_mismatch_M_chi_fast(
            syn_mm["times"], syn_mm["data_dict"], syn_mm["modes"],
            (0.9, 1.0), (0.6, 0.8), **kw)
        mm_b = batched.batch_mismatch_M_chi(
            syn_mm["times"], syn_mm["data_dict"], syn_mm["modes"],
            (0.9, 1.0), (0.6, 0.8), **kw)
        np.testing.assert_allclose(mm_f, mm_b, rtol=0, atol=1e-11)

    def test_M_chi_fast_closest_method(self, syn):
        kw = dict(t0=5.03, T=80.0, res=4, t0_method="closest")
        mm_f = batched.batch_mismatch_M_chi_fast(
            syn["times"], syn["data"], syn["modes"],
            (0.9, 1.0), (0.6, 0.8), **kw)
        mm_b = batched.batch_mismatch_M_chi(
            syn["times"], syn["data"], syn["modes"],
            (0.9, 1.0), (0.6, 0.8), **kw)
        np.testing.assert_allclose(mm_f, mm_b, rtol=0, atol=1e-11)

    def test_omega_fast_matches_batched(self, syn):
        kw = dict(t0=5.0, T=80.0, res=6)
        mm_f = batched.batch_mismatch_omega_fast(
            syn["times"], syn["data"], syn["modes"][:2],
            syn["Mf"], syn["chif"], (0.3, 0.8), (-0.4, -0.05), **kw)
        mm_b = batched.batch_mismatch_omega(
            syn["times"], syn["data"], syn["modes"][:2],
            syn["Mf"], syn["chif"], (0.3, 0.8), (-0.4, -0.05), **kw)
        np.testing.assert_allclose(mm_f, mm_b, rtol=0, atol=1e-11)

    def test_omega_fast_no_fixed_modes(self, syn):
        mm_f = batched.batch_mismatch_omega_fast(
            syn["times"], syn["data"], [], None, None,
            (0.3, 0.8), (-0.4, -0.05), t0=5.0, T=80.0, res=5)
        mm_b = batched.batch_mismatch_omega(
            syn["times"], syn["data"], [], None, None,
            (0.3, 0.8), (-0.4, -0.05), t0=5.0, T=80.0, res=5)
        np.testing.assert_allclose(mm_f, mm_b, rtol=0, atol=1e-11)

    def test_public_engine_fast_dispatch(self, syn):
        from qnmfits_tpu import fitting
        mm_f = fitting.mismatch_M_chi_grid(
            syn["times"], syn["data"], syn["modes"], (0.9, 1.0),
            (0.6, 0.8), t0=5.0, T=80.0, res=4, engine="fast")
        mm_b = fitting.mismatch_M_chi_grid(
            syn["times"], syn["data"], syn["modes"], (0.9, 1.0),
            (0.6, 0.8), t0=5.0, T=80.0, res=4)
        np.testing.assert_allclose(mm_f, mm_b, rtol=0, atol=1e-11)
        om_f = fitting.mismatch_omega_grid(
            syn["times"], syn["data"], syn["modes"][:1], syn["Mf"],
            syn["chif"], (0.3, 0.8), (-0.4, -0.05), t0=5.0, T=80.0,
            res=4, engine="fast")
        om_b = fitting.mismatch_omega_grid(
            syn["times"], syn["data"], syn["modes"][:1], syn["Mf"],
            syn["chif"], (0.3, 0.8), (-0.4, -0.05), t0=5.0, T=80.0,
            res=4)
        np.testing.assert_allclose(om_f, om_b, rtol=0, atol=1e-11)


def test_dynamic_fast_matches_batched():
    """Split-complex dynamic sweep == complex x64 dynamic sweep."""
    syn = synthetic_multimode(seed=21)
    K = len(syn["times"])
    Mf_t = np.linspace(0.98, syn["Mf"], K)
    chif_t = np.linspace(0.6, syn["chif"], K)
    t0s = np.linspace(0.0, 15.0, 6)
    kw = dict(T_array=70.0, spherical_modes=syn["spherical_modes"])
    mm_f, C_f = batched.batch_mismatch_t0_dynamic(
        syn["times"], syn["data_dict"], syn["modes"], Mf_t, chif_t, t0s,
        engine="fast", return_amplitudes=True, **kw)
    mm_b, C_b = batched.batch_mismatch_t0_dynamic(
        syn["times"], syn["data_dict"], syn["modes"], Mf_t, chif_t, t0s,
        return_amplitudes=True, **kw)
    np.testing.assert_allclose(mm_f, mm_b, rtol=0, atol=1e-11)
    np.testing.assert_allclose(C_f, C_b, rtol=0, atol=1e-9)


def test_dynamic_fast_closest_method():
    syn = synthetic_multimode(seed=22)
    K = len(syn["times"])
    chif_t = np.linspace(0.6, syn["chif"], K)
    t0s = np.linspace(0.03, 12.0, 4)
    mm_f = batched.batch_mismatch_t0_dynamic(
        syn["times"], syn["data_dict"], syn["modes"], syn["Mf"], chif_t,
        t0s, t0_method="closest", T_array=70.0,
        spherical_modes=syn["spherical_modes"], engine="fast")
    mm_b = batched.batch_mismatch_t0_dynamic(
        syn["times"], syn["data_dict"], syn["modes"], syn["Mf"], chif_t,
        t0s, t0_method="closest", T_array=70.0,
        spherical_modes=syn["spherical_modes"])
    np.testing.assert_allclose(mm_f, mm_b, rtol=0, atol=1e-11)


def test_public_dynamic_fast_dispatch():
    """mismatch_t0_array(engine='fast') with array Mf/chif routes to the
    fast dynamic kernel (formerly raised)."""
    from qnmfits_tpu import fitting
    syn = synthetic_single(modes=[(2, 2, n, 1) for n in range(3)],
                           noise=1e-3, seed=23)
    K = len(syn["times"])
    chif_t = np.linspace(0.6, syn["chif"], K)
    t0s = np.linspace(0.0, 10.0, 4)
    mm_f = fitting.mismatch_t0_array(
        syn["times"], syn["data"], syn["modes"], syn["Mf"], chif_t, t0s,
        T_array=70.0, engine="fast")
    mm_b = fitting.mismatch_t0_array(
        syn["times"], syn["data"], syn["modes"], syn["Mf"], chif_t, t0s,
        T_array=70.0)
    np.testing.assert_allclose(mm_f, mm_b, rtol=0, atol=1e-11)


def test_omega_fast_none_Mf_chif_with_fixed_modes(syn):
    """None Mf/chif must behave like the batched engine (Mf=1, chif=0),
    not crash (regression: float(None) TypeError)."""
    kw = dict(t0=5.0, T=80.0, res=4)
    mm_f = batched.batch_mismatch_omega_fast(
        syn["times"], syn["data"], syn["modes"][:1], None, None,
        (0.3, 0.8), (-0.4, -0.05), **kw)
    mm_b = batched.batch_mismatch_omega(
        syn["times"], syn["data"], syn["modes"][:1], None, None,
        (0.3, 0.8), (-0.4, -0.05), **kw)
    np.testing.assert_allclose(mm_f, mm_b, rtol=0, atol=1e-11)


def test_mismatch_t0_array_dynamic_delta_raises():
    """The public dispatcher rejects delta with a dynamic spectrum like
    the batched layer does (regression: it silently dropped delta)."""
    from qnmfits_tpu import fitting
    syn = synthetic_single(modes=[(2, 2, 0, 1)], noise=1e-3, seed=44)
    K = len(syn["times"])
    chif_t = np.linspace(0.6, syn["chif"], K)
    with pytest.raises(ValueError, match="delta"):
        fitting.mismatch_t0_array(
            syn["times"], syn["data"], syn["modes"], syn["Mf"], chif_t,
            np.linspace(0.0, 10.0, 3), delta=0.01)


class TestEventBatch:
    """batch_fit_events: the per-event catalog batch (each event its own
    remnant + window) == per-event ringdown_fit loop."""

    def test_matches_per_event_fits(self):
        import qnmfits_tpu as qf
        from qnmfits_tpu.testing import synthetic_single

        rng = np.random.default_rng(9)
        times = np.arange(-5.0, 90.0, 0.1)
        modes = [(2, 2, n, 1) for n in range(3)]
        E = 5
        Mfs = rng.uniform(0.9, 1.0, E)
        chifs = rng.uniform(0.5, 0.8, E)
        t0s = rng.uniform(0.0, 8.0, E)
        rows = np.empty((E, len(times)), complex)
        for e in range(E):
            syn = synthetic_single(modes=modes, Mf=Mfs[e], chif=chifs[e],
                                   times=times, noise=1e-4, seed=100 + e)
            rows[e] = syn["data"]
        mm, C = batched.batch_fit_events(times, rows, modes, Mfs, chifs,
                                         t0s, T=80.0)
        assert mm.shape == (E,) and C.shape == (E, 3)
        for e in range(E):
            ref = qf.ringdown_fit(times, rows[e], modes, Mfs[e],
                                  chifs[e], t0=float(t0s[e]), T=80.0)
            assert abs(mm[e] - ref["mismatch"]) < 1e-11
            np.testing.assert_allclose(C[e], ref["C"], rtol=0, atol=1e-8)

    def test_bad_spin_raises(self):
        times = np.linspace(0, 10, 101)
        rows = np.zeros((2, 101), complex)
        with pytest.raises(ValueError, match="chif"):
            batched.batch_fit_events(times, rows, [(2, 2, 0, 1)],
                                     0.95, np.array([0.5, 1.3]), 0.0)

    def test_sharded_event_batch_matches(self):
        import jax
        devs = jax.devices("cpu")
        if len(devs) < 8:
            pytest.skip("needs 8 virtual CPU devices")
        from qnmfits_tpu.parallel.mesh import sweep_mesh
        from qnmfits_tpu.testing import synthetic_single

        rng = np.random.default_rng(10)
        times = np.arange(-5.0, 60.0, 0.1)
        modes = [(2, 2, 0, 1)]
        E = 6                                   # not divisible by 8
        Mfs = rng.uniform(0.9, 1.0, E)
        chifs = rng.uniform(0.5, 0.8, E)
        t0s = rng.uniform(0.0, 5.0, E)
        rows = np.stack([synthetic_single(
            modes=modes, Mf=Mfs[e], chif=chifs[e], times=times,
            noise=1e-4, seed=200 + e)["data"] for e in range(E)])
        mm0, C0 = batched.batch_fit_events(times, rows, modes, Mfs,
                                           chifs, t0s, T=50.0)
        mm1, C1 = batched.batch_fit_events(
            times, rows, modes, Mfs, chifs, t0s, T=50.0,
            mesh=sweep_mesh(n_sweep=8, n_time=1, devices=devs))
        np.testing.assert_allclose(mm1, mm0, rtol=0, atol=1e-12)
        np.testing.assert_allclose(C1, C0, rtol=0, atol=1e-10)

    def test_fast_engine_matches_batched(self):
        from qnmfits_tpu.testing import synthetic_single

        rng = np.random.default_rng(11)
        times = np.arange(-5.0, 70.0, 0.1)
        modes = [(2, 2, n, 1) for n in range(3)]
        E = 4
        Mfs = rng.uniform(0.9, 1.0, E)
        chifs = rng.uniform(0.5, 0.8, E)
        t0s = rng.uniform(0.0, 6.0, E)
        rows = np.stack([synthetic_single(
            modes=modes, Mf=Mfs[e], chif=chifs[e], times=times,
            noise=1e-4, seed=300 + e)["data"] for e in range(E)])
        mm0, C0 = batched.batch_fit_events(times, rows, modes, Mfs,
                                           chifs, t0s, T=60.0)
        mm1, C1 = batched.batch_fit_events(times, rows, modes, Mfs,
                                           chifs, t0s, T=60.0,
                                           engine="fast")
        np.testing.assert_allclose(mm1, mm0, rtol=0, atol=1e-11)
        np.testing.assert_allclose(C1, C0, rtol=0, atol=1e-8)


class TestOmegaSingleRowValidation:
    """The free-frequency grid fits ONE data series (the reference's
    mismatch_omega_grid has no spherical_modes parameter,
    qnmfits.py:1679); multi-row dict data must fail loudly instead of
    silently fitting only the first row (bordered) or broadcasting
    mismatched I dimensions into garbage (spectrum-batched)."""

    def _two_row_data(self, syn):
        return {(2, 2): syn["data"], (3, 3): 0.5 * syn["data"]}

    @pytest.mark.parametrize("fn", ["batch_mismatch_omega",
                                    "batch_mismatch_omega_fast",
                                    "batch_mismatch_omega_bordered"])
    def test_multi_row_dict_raises(self, syn, fn):
        with pytest.raises(ValueError, match="single data series"):
            getattr(batched, fn)(
                syn["times"], self._two_row_data(syn), syn["modes"][:2],
                syn["Mf"], syn["chif"], (0.3, 0.8), (-0.4, -0.05),
                t0=5.0, T=80.0, res=4)

    def test_one_entry_dict_still_works(self, syn):
        mm_d = batched.batch_mismatch_omega_bordered(
            syn["times"], {(2, 2): syn["data"]}, syn["modes"][:2],
            syn["Mf"], syn["chif"], (0.3, 0.8), (-0.4, -0.05),
            t0=5.0, T=80.0, res=4)
        mm_a = batched.batch_mismatch_omega_bordered(
            syn["times"], syn["data"], syn["modes"][:2],
            syn["Mf"], syn["chif"], (0.3, 0.8), (-0.4, -0.05),
            t0=5.0, T=80.0, res=4)
        np.testing.assert_allclose(mm_d, mm_a, rtol=0, atol=0)


class TestOmegaBordered:
    """Bordered fixed-block free-frequency kernel (hot loop #3): the
    shared fixed-QNM Gram is factorised once per window; every grid
    point is a bordered block-elimination solve."""

    def test_matches_batched(self, syn):
        kw = dict(t0=5.0, T=80.0, res=6)
        mm_f = batched.batch_mismatch_omega_bordered(
            syn["times"], syn["data"], syn["modes"][:2],
            syn["Mf"], syn["chif"], (0.3, 0.8), (-0.4, -0.05), **kw)
        mm_b = batched.batch_mismatch_omega(
            syn["times"], syn["data"], syn["modes"][:2],
            syn["Mf"], syn["chif"], (0.3, 0.8), (-0.4, -0.05), **kw)
        np.testing.assert_allclose(mm_f, mm_b, rtol=0, atol=1e-11)

    def test_no_fixed_modes(self, syn):
        mm_f = batched.batch_mismatch_omega_bordered(
            syn["times"], syn["data"], [], None, None,
            (0.3, 0.8), (-0.4, -0.05), t0=5.0, T=80.0, res=5)
        mm_l = ref_impl.mismatch_omega_grid(
            syn["times"], syn["data"], [], None, None,
            (0.3, 0.8), (-0.4, -0.05), t0=5.0, T=80.0, res=5)
        np.testing.assert_allclose(mm_f, mm_l, rtol=0, atol=1e-11)

    def test_deep_ladder_conditioning(self):
        """The triangular-factor route survives a 7-overtone fixed block
        whose Gram is severely ill-conditioned (an explicit
        Hermitian-inverse Schur solve loses ~cond(A) eps and was
        measured 0.91 wrong here)."""
        from qnmfits_tpu.testing import synthetic_single

        syn = synthetic_single(
            modes=[(2, 2, n, 1) for n in range(7)], noise=1e-8, seed=3)
        kw = dict(t0=10.0, T=100.0, res=5)
        box = ((0.1, 1.2), (-0.45, -0.01))
        mm_f = batched.batch_mismatch_omega_bordered(
            syn["times"], syn["data"], syn["modes"], syn["Mf"],
            syn["chif"], *box, **kw)
        mm_b = batched.batch_mismatch_omega(
            syn["times"], syn["data"], syn["modes"], syn["Mf"],
            syn["chif"], *box, **kw)
        np.testing.assert_allclose(mm_f, mm_b, rtol=0, atol=1e-11)

    def test_closest_method_and_ragged_chunk(self, syn):
        """t0_method='closest' plus a grid that does not divide the
        a_chunk (padding trimmed exactly)."""
        kw = dict(t0=5.03, T=80.0, res=5, t0_method="closest")
        mm_f = batched.batch_mismatch_omega_bordered(
            syn["times"], syn["data"], syn["modes"][:1],
            syn["Mf"], syn["chif"], (0.3, 0.8), (-0.4, -0.05),
            a_chunk=3, **kw)
        mm_b = batched.batch_mismatch_omega(
            syn["times"], syn["data"], syn["modes"][:1],
            syn["Mf"], syn["chif"], (0.3, 0.8), (-0.4, -0.05), **kw)
        np.testing.assert_allclose(mm_f, mm_b, rtol=0, atol=1e-11)

    def test_amplitudes_match_lstsq(self, syn):
        """return_amplitudes: the bordered coefficients equal the
        normal-equation solution of the full design (lstsq oracle)."""
        res = 3
        re_minmax, im_minmax = (0.35, 0.75), (-0.3, -0.08)
        t0, T = 5.0, 80.0
        mm, C = batched.batch_mismatch_omega_bordered(
            syn["times"], syn["data"], syn["modes"][:2], syn["Mf"],
            syn["chif"], re_minmax, im_minmax, t0=t0, T=T, res=res,
            return_amplitudes=True)
        from qnmfits_tpu.ref_impl import get_qnm, mask_times
        fixed = np.array(get_qnm().omega_list(syn["modes"][:2],
                                              syn["chif"], syn["Mf"]))
        idx = mask_times(syn["times"], t0, T, "geq")
        tm = syn["times"][idx]
        dm = syn["data"][idx]
        re_axis = np.linspace(*re_minmax, res)
        im_axis = np.linspace(*im_minmax, res)
        assert C.shape == (res, res, len(fixed) + 1)
        for i_im in range(res):
            for i_re in range(res):
                # C is aligned with mm's transposed [im, re] layout.
                wf = re_axis[i_re] + 1j * im_axis[i_im]
                a = np.exp(-1j * np.concatenate([fixed, [wf]])[None, :]
                           * (tm - t0)[:, None])
                C_ref, *_ = np.linalg.lstsq(a, dm, rcond=None)
                np.testing.assert_allclose(C[i_im, i_re], C_ref,
                                           rtol=0, atol=1e-8)


class TestAnalyticGram:
    """The closed-form (geometric-series) window Grams of the factored
    t0 kernels (engine_real._analytic_grams): uniform-grid gate, exact
    agreement with the summation kernel, and oracle parity through the
    public sweeps."""

    def test_uniform_gate(self):
        from qnmfits_tpu.batched import _uniform_spacing
        assert _uniform_spacing(np.arange(-20.0, 120.0, 0.1))
        assert _uniform_spacing(np.linspace(-50.0, 150.0, 2001))
        rng = np.random.default_rng(0)
        t = np.arange(-20.0, 120.0, 0.1)
        assert not _uniform_spacing(t + rng.normal(0, 1e-3, t.size))
        assert not _uniform_spacing(t[::-1])
        assert not _uniform_spacing(np.array([1.0]))
        # f32 storage: a rounded true linspace passes, but jitter a few
        # f32 ulps above the storage floor must NOT ride the analytic
        # path (it previously slipped under a 16-ulp blanket tolerance).
        t64 = np.linspace(0.0, 150.0, 2001)
        assert _uniform_spacing(t64.astype(np.float32))
        jit = t64 + rng.normal(0.0, 1e-4, t64.size)
        assert not _uniform_spacing(jit.astype(np.float32))

    def test_kernel_matches_summation(self, syn):
        """analytic=True == analytic=False on the factored kernel,
        including a padded column mask and per-window T."""
        import jax.numpy as jnp
        from qnmfits_tpu.engine_real import sweep_t0_factored_real
        from qnmfits_tpu.ref_impl import get_qnm

        w = np.array(get_qnm().omega_list(syn["modes"], syn["chif"],
                                          syn["Mf"]))
        w = np.concatenate([w, [0.0 + 0.0j]])      # padded slot
        mask = np.array([True] * (len(w) - 1) + [False])
        d = np.asarray(syn["data"])
        t0s = np.linspace(0.0, 20.0, 9)
        Ts = np.concatenate([np.full(5, 70.0), np.full(4, 25.0)])
        args = (jnp.asarray(np.asarray(syn["times"], float)),
                d.real[None, :], d.imag[None, :],
                jnp.asarray(w.real), jnp.asarray(w.imag),
                jnp.ones((1, w.size)), jnp.zeros((1, w.size)),
                jnp.asarray(t0s), jnp.asarray(Ts))
        out_m = sweep_t0_factored_real(*args, col_mask=mask, chunk=4,
                                       analytic=False)
        out_a = sweep_t0_factored_real(*args, col_mask=mask, chunk=4,
                                       analytic=True)
        for x_m, x_a in zip(out_m, out_a):
            np.testing.assert_allclose(np.asarray(x_a), np.asarray(x_m),
                                       rtol=0, atol=1e-12)

    def test_bordered_kernel_matches_summation(self, syn):
        """analytic=True == analytic=False on the bordered free-omega
        kernel (closed-form cross Grams + separable data projections),
        physical fixed block, 'geq' and 'closest' windows, ragged
        a_chunk."""
        import jax.numpy as jnp
        from qnmfits_tpu.engine_real import sweep_omega_grid_bordered_real
        from qnmfits_tpu.ops.windows import window_closest, window_geq
        from qnmfits_tpu.ref_impl import get_qnm

        wf = np.array(get_qnm().omega_list(syn["modes"][:2], syn["chif"],
                                           syn["Mf"]))
        t = np.asarray(syn["times"], float)
        d = np.asarray(syn["data"])
        re_axis = jnp.asarray(np.linspace(0.3, 0.8, 7))
        im_axis = jnp.asarray(np.linspace(-0.4, -0.05, 5))
        for window, t0 in ((window_geq, 5.0), (window_closest, 5.03)):
            w = jnp.asarray(np.asarray(window(t, t0, 80.0), float))
            args = (t, d.real, d.imag, wf.real.copy(), wf.imag.copy(),
                    re_axis, im_axis, t0, w)
            out_m = sweep_omega_grid_bordered_real(*args, a_chunk=3,
                                                   analytic=False)
            out_a = sweep_omega_grid_bordered_real(*args, a_chunk=3,
                                                   analytic=True)
            for x_m, x_a in zip(out_m, out_a):
                np.testing.assert_allclose(
                    np.asarray(x_a), np.asarray(x_m), rtol=0, atol=1e-11)

    def test_bordered_kernel_no_fixed_modes(self, syn):
        """Jf=0: the analytic bordered path degenerates to the pure
        free-column fit and still matches the summation path."""
        import jax.numpy as jnp
        from qnmfits_tpu.engine_real import sweep_omega_grid_bordered_real

        t = np.asarray(syn["times"], float)
        d = np.asarray(syn["data"])
        t0 = 5.0
        w = jnp.asarray(((t >= t0) & (t < t0 + 80.0)).astype(float))
        args = (t, d.real, d.imag, np.zeros(0), np.zeros(0),
                jnp.asarray(np.linspace(0.3, 0.8, 5)),
                jnp.asarray(np.linspace(-0.4, -0.05, 4)), t0, w)
        out_m = sweep_omega_grid_bordered_real(*args, a_chunk=2,
                                               analytic=False)
        out_a = sweep_omega_grid_bordered_real(*args, a_chunk=2,
                                               analytic=True)
        for x_m, x_a in zip(out_m, out_a):
            np.testing.assert_allclose(np.asarray(x_a), np.asarray(x_m),
                                       rtol=0, atol=1e-11)

    def test_grid_kernel_matches_summation(self, syn):
        """analytic=True == analytic=False on the spectrum-batched grid
        kernel, for 'geq' AND 'closest' windows (the window start is
        derived from the indicator) and a padded column."""
        import jax.numpy as jnp
        from qnmfits_tpu.engine_real import sweep_spectra_real
        from qnmfits_tpu.ops.windows import window_closest, window_geq

        rng = np.random.default_rng(11)
        t = np.asarray(syn["times"], float)
        J, Q, I = 5, 7, 2
        wr = rng.uniform(0.3, 1.2, (Q, J))
        wi = -rng.uniform(0.02, 0.6, (Q, J))
        wr[:, -1] = 0.0
        wi[:, -1] = 0.0                                   # padded slot
        mask = np.array([True] * (J - 1) + [False])
        mre = rng.normal(size=(Q, I, J))
        mim = rng.normal(size=(Q, I, J))
        dre = rng.normal(size=(I, t.size))
        dim = rng.normal(size=(I, t.size))
        for window, t0 in ((window_geq, 3.03), (window_closest, 3.03),
                           (window_geq, 0.0)):
            w = jnp.asarray(np.asarray(window(t, t0, 80.0), float))
            args = (t, dre, dim, wr, wi, mre, mim, t0, w)
            out_m = sweep_spectra_real(*args, col_mask=mask, chunk=3,
                                       analytic=False)
            out_a = sweep_spectra_real(*args, col_mask=mask, chunk=3,
                                       analytic=True)
            for x_m, x_a in zip(out_m, out_a):
                np.testing.assert_allclose(
                    np.asarray(x_a), np.asarray(x_m), rtol=0, atol=1e-12)

    def test_barely_uniform_grid_stays_in_budget(self, syn):
        """A grid that JUST passes the _uniform_spacing gate (first
        step perturbed by 0.9x the tolerance) must still meet the
        1e-11 bar: the analytic kernels gather window starts from the
        actual grid and use the fitted step, so the reconstruction
        error stays at the gate tolerance instead of K times it."""
        import jax.numpy as jnp
        from qnmfits_tpu.batched import _uniform_spacing
        from qnmfits_tpu.engine_real import sweep_t0_factored_real
        from qnmfits_tpu.ref_impl import get_qnm

        t = np.linspace(-20.0, 180.0, 2001)
        tol = 16 * np.finfo(float).eps * 180.0
        t[1] += 0.9 * tol
        assert _uniform_spacing(t)

        w = np.array(get_qnm().omega_list(syn["modes"], syn["chif"],
                                          syn["Mf"]))
        rng = np.random.default_rng(5)
        d = (rng.normal(size=t.size) + 1j * rng.normal(size=t.size))
        t0s = np.linspace(0.0, 150.0, 9)          # far end included
        args = (jnp.asarray(t), d.real[None, :], d.imag[None, :],
                jnp.asarray(w.real), jnp.asarray(w.imag),
                jnp.ones((1, w.size)), jnp.zeros((1, w.size)),
                jnp.asarray(t0s), jnp.full(9, 40.0))
        out_m = sweep_t0_factored_real(*args, chunk=4, analytic=False)
        out_a = sweep_t0_factored_real(*args, chunk=4, analytic=True)
        np.testing.assert_allclose(np.asarray(out_a[2]),
                                   np.asarray(out_m[2]),
                                   rtol=0, atol=1e-11)

    def test_growing_mode_grid_stays_finite(self, syn):
        """A free-frequency grid crossing Im omega = 0 into growing
        modes: ladder levels above the window's top bit can overflow,
        and the where-guarded bit recursion must keep the consumed
        result finite and equal to the summation path."""
        import jax.numpy as jnp
        from qnmfits_tpu.engine_real import sweep_omega_grid_bordered_real
        from qnmfits_tpu.ref_impl import get_qnm

        wf = np.array(get_qnm().omega_list(syn["modes"][:1], syn["chif"],
                                           syn["Mf"]))
        t = np.asarray(syn["times"], float)
        d = np.asarray(syn["data"])
        t0 = 5.0
        w = jnp.asarray(((t >= t0) & (t < t0 + 8.0)).astype(float))
        # im up to +3.6: consumed terms stay ~e^{58}, but the unused
        # top ladder level would reach ~e^{1440} without the guard.
        re_axis = jnp.asarray(np.linspace(0.3, 0.7, 4))
        im_axis = jnp.asarray(np.linspace(-0.2, 3.6, 6))
        args = (t, d.real, d.imag, wf.real.copy(), wf.imag.copy(),
                re_axis, im_axis, t0, w)
        out_m = sweep_omega_grid_bordered_real(*args, a_chunk=2,
                                               analytic=False)
        out_a = sweep_omega_grid_bordered_real(*args, a_chunk=2,
                                               analytic=True)
        assert np.all(np.isfinite(np.asarray(out_a[2])))
        np.testing.assert_allclose(np.asarray(out_a[2]),
                                   np.asarray(out_m[2]),
                                   rtol=0, atol=1e-10)

    def test_event_kernel_matches_summation(self, syn):
        """analytic=True == analytic=False on the per-event fit batch
        (each event with its own data, spectrum and window)."""
        from qnmfits_tpu.engine_real import sweep_events_real
        from qnmfits_tpu.ref_impl import get_qnm

        t = np.asarray(syn["times"], float)
        rng = np.random.default_rng(23)
        E, J = 5, 3
        base = np.array(get_qnm().omega_list(syn["modes"][:J],
                                             syn["chif"], syn["Mf"]))
        wrs = np.stack([base.real * s for s in
                        np.linspace(0.9, 1.1, E)])
        wis = np.stack([base.imag * s for s in
                        np.linspace(0.9, 1.1, E)])
        dres = rng.normal(size=(E, t.size))
        dims = rng.normal(size=(E, t.size))
        t0s = np.linspace(0.0, 12.0, E)
        Ts = np.linspace(50.0, 90.0, E)
        args = (t, dres, dims, wrs, wis, t0s, Ts)
        out_m = sweep_events_real(*args, chunk=2, analytic=False)
        out_a = sweep_events_real(*args, chunk=2, analytic=True)
        for x_m, x_a in zip(out_m, out_a):
            np.testing.assert_allclose(np.asarray(x_a), np.asarray(x_m),
                                       rtol=0, atol=1e-12)

    def test_nonuniform_grid_falls_back_M_chi(self, syn):
        """A non-uniform grid keeps the summation path on the M-chi
        grid engine and still matches the x64 batched engine.  (The
        M-chi analytic route is ALSO backend-gated -- off under this
        CPU suite -- so the uniformity gate is asserted directly to
        keep a mis-fire detectable here.)"""
        from qnmfits_tpu import ref_impl
        from qnmfits_tpu.batched import _uniform_spacing

        rng = np.random.default_rng(3)
        t = np.asarray(syn["times"], float).copy()
        t[1:-1] += rng.uniform(-0.02, 0.02, t.size - 2)
        assert not _uniform_spacing(t)
        freqs = syn["frequencies"]
        data = ref_impl.ringdown(t, 0.0, syn["amplitudes"], freqs)
        kw = dict(t0=5.0, T=80.0, res=4)
        mm_f = batched.batch_mismatch_M_chi_fast(
            t, data, syn["modes"], (0.9, 1.0), (0.6, 0.8), **kw)
        mm_b = batched.batch_mismatch_M_chi(
            t, data, syn["modes"], (0.9, 1.0), (0.6, 0.8), **kw)
        np.testing.assert_allclose(mm_f, mm_b, rtol=0, atol=1e-11)

    def test_nonuniform_times_fall_back(self, syn):
        """A genuinely non-uniform grid routes to the summation kernel
        and still matches the oracle (the gate must not mis-fire)."""
        from qnmfits_tpu import ref_impl
        from qnmfits_tpu.batched import batch_mismatch_t0_fast

        rng = np.random.default_rng(3)
        t = np.asarray(syn["times"], float).copy()
        t[1:-1] += rng.uniform(-0.02, 0.02, t.size - 2)
        freqs = syn["frequencies"]
        data = ref_impl.ringdown(t, 0.0, syn["amplitudes"], freqs)
        t0s = np.linspace(0.0, 15.0, 5)
        mm = batch_mismatch_t0_fast(t, data, syn["modes"], syn["Mf"],
                                    syn["chif"], t0s, T_array=60.0)
        mm_l = ref_impl.mismatch_t0_array(t, data, syn["modes"],
                                          syn["Mf"], syn["chif"], t0s,
                                          T_array=60.0)
        np.testing.assert_allclose(mm, mm_l, rtol=0, atol=1e-11)


class TestWindowDedup:
    """Unique-window compression of the static t0 sweeps (PERF.md
    section 25): on a t0 grid finer than the data sampling, dedup=True
    must reproduce the per-t0 kernel exactly (mismatch identical, the
    amplitudes related by the analytic rephase) -- including the
    NumPy-oracle parity bar."""

    def test_detects_duplicates_and_groups(self, syn):
        from qnmfits_tpu.batched import (_window_dedup,
                                         _window_dedup_closest)
        times = syn["times"]
        dt = times[1] - times[0]
        t0s = np.linspace(0.0, 10.0, 201)     # ~2x finer than sampling
        Ts = np.full_like(t0s, 60.0)
        dd = _window_dedup(times, t0s, Ts)
        assert dd is not None
        rep, inverse = dd
        assert len(rep) < len(t0s)
        # Representatives are the first t0 of each group (delta >= 0).
        assert np.all(t0s[rep][inverse] <= t0s + 1e-15)
        dd_c = _window_dedup_closest(times, t0s, Ts)
        assert dd_c is not None
        # Coarser-than-sampling grids have no duplicates: no-op.
        t0c = np.arange(0.0, 10.0, 4 * dt)
        assert _window_dedup(times, t0c, np.full_like(t0c, 60.0)) is None

    def test_closest_keys_match_kernel_argmin_bitexact(self, syn):
        """The 'closest' dedup keys must reproduce the KERNEL's window
        indices bit-exactly: ops.windows.window_closest scores sample j
        by fl((fl(t_j - t0) - T)^2), which near a midpoint between
        samples can disagree with the distance to fl(t0 + T).  A key
        built from the latter could GROUP two windows the kernel
        windows differently -- scattering a wrong mismatch.  Sweep
        adversarial t0s (exact midpoints and +-ulp neighbours) and
        check the grouping equals brute-force argmin grouping (numpy
        f64 is the same IEEE arithmetic as the x64 jnp kernel)."""
        from qnmfits_tpu.batched import _window_dedup_closest
        times = np.asarray(syn["times"], float)
        dt = times[1] - times[0]
        rng = np.random.default_rng(7)
        mids = 0.5 * (times[40:200:3] + times[41:201:3])
        t0s = np.concatenate([
            mids,
            np.nextafter(mids, np.inf),
            np.nextafter(mids, -np.inf),
            times[40] + dt * rng.uniform(0.49, 0.51, 100),
        ])
        t0s.sort()
        # T landing t0+T near midpoints too (60.05 = 600.5 samples).
        for T in (60.0 + 0.5 * dt, 60.0):
            Ts = np.full_like(t0s, T)
            # Brute-force kernel indices: same expression, all samples.
            d0 = times[None, :] - t0s[:, None]
            k0 = np.argmin(d0 * d0, axis=1)
            d1 = (times[None, :] - t0s[:, None]) - Ts[:, None]
            k1 = np.argmin(d1 * d1, axis=1)
            keys = k0 * (len(times) + 1) + k1
            dd = _window_dedup_closest(times, t0s, Ts)
            assert dd is not None       # midpoint duplicates exist
            rep, inverse = dd
            # Exact grouping: every member shares its rep's kernel key,
            # and distinct groups have distinct keys.
            assert np.all(keys[rep][inverse] == keys)
            assert len(np.unique(keys[rep])) == len(rep)

    def test_closest_keys_at_ulp_equidistance(self):
        """Constructed knife-edges: t0 + T within a few ulps of the
        exact midpoint of two samples.  There the distance-to-fl(t0+T)
        key DISAGREES with the kernel's fl((fl(t-t0)-T)^2) argmin in
        ~40% of draws (measured), which is exactly the regime the old
        key got wrong.  The bracket key must match the kernel on every
        such case."""
        from qnmfits_tpu.batched import _window_dedup_closest
        rng = np.random.default_rng(1)
        cases = []
        while len(cases) < 25:
            dt = 10 ** rng.uniform(-3, 0)
            ta = rng.uniform(0.0, 200.0)
            tb = ta + dt
            T = rng.uniform(10.0, 100.0)
            t0c = (ta + 0.5 * dt) - T
            for j in range(-4, 5):
                t0 = t0c
                for _ in range(abs(j)):
                    t0 = np.nextafter(t0, np.inf if j > 0 else -np.inf)
                cases.append((t0, T, ta, tb))
        for t0, T, ta, tb in cases:
            times = np.unique(np.concatenate([
                np.linspace(t0 - 5.0, ta - 1e-3, 300), [ta, tb],
                np.linspace(tb + 1e-3, tb + 5.0, 50)]))
            t0s = np.array([t0, t0])    # duplicate -> dd is not None
            Ts = np.full(2, T)
            d0 = times[None, :] - t0s[:, None]
            k0 = np.argmin(d0 * d0, axis=1)
            d1 = (times[None, :] - t0s[:, None]) - Ts[:, None]
            k1 = np.argmin(d1 * d1, axis=1)
            keys = k0 * (len(times) + 1) + k1
            rep, inverse = _window_dedup_closest(times, t0s, Ts)
            assert np.all(keys[rep][inverse] == keys), (t0, T, ta, tb)

    def test_varying_T_reps_stay_ascending(self, syn):
        """Per-t0 T_array: np.unique orders the groups by (start, end)
        window KEY, so a T that drops as t0 advances used to emit
        t0-DESCENDING representatives -- feeding non-ascending t0s to
        the chunk-anchored factored kernels (which REQUIRE ascending).
        _ascending_reps reorders the groups; membership is unchanged."""
        from qnmfits_tpu.batched import (_window_dedup,
                                         batch_mismatch_t0_fast)
        times = np.asarray(syn["times"], float)
        t0s = np.linspace(0.0, 10.0, 201)     # 0.05 over 0.1 sampling
        Ts = np.where(t0s < 5.0, 80.0, 40.0)  # T drops mid-sweep
        dd = _window_dedup(times, t0s, Ts)
        assert dd is not None
        rep, inverse = dd
        assert np.all(np.diff(t0s[rep]) > 0)          # sweep order
        a = np.searchsorted(times, t0s, side="left")  # same keys as
        e = np.searchsorted(times, t0s + Ts, side="left")   # the impl
        keys = a * (len(times) + 1) + e
        assert np.all(keys[rep][inverse] == keys)     # exact groups
        # Public fast sweep (the strict-ascending kernel) stays exact.
        kw = dict(T_array=Ts, return_amplitudes=True)
        mm_d, C_d = batch_mismatch_t0_fast(
            times, syn["data"], syn["modes"], syn["Mf"], syn["chif"],
            t0s, dedup=True, **kw)
        mm_0, C_0 = batch_mismatch_t0_fast(
            times, syn["data"], syn["modes"], syn["Mf"], syn["chif"],
            t0s, dedup=False, **kw)
        np.testing.assert_allclose(mm_d, mm_0, rtol=0, atol=1e-13)
        np.testing.assert_allclose(C_d, C_0, rtol=0, atol=1e-11)

    def test_modesets_dense_grid_matches_direct_and_oracle(self, syn_mm):
        mode_sets = [[(2, 2, 0, 1), (2, 2, 1, 1)], [(2, 2, 0, 1)],
                     [(2, 2, 0, 1), (2, 2, 1, 1), (3, 2, 0, 1)]]
        t0s = np.linspace(-3.0, 25.0, 563)    # ~2x finer than sampling
        kw = dict(T_array=60.0, spherical_modes=syn_mm["spherical_modes"],
                  return_amplitudes=True)
        mm_d, C_d = batched.batch_mismatch_t0_modesets(
            syn_mm["times"], syn_mm["data_dict"], mode_sets,
            syn_mm["Mf"], syn_mm["chif"], t0s, dedup=True, **kw)
        mm_0, C_0 = batched.batch_mismatch_t0_modesets(
            syn_mm["times"], syn_mm["data_dict"], mode_sets,
            syn_mm["Mf"], syn_mm["chif"], t0s, dedup=False, **kw)
        np.testing.assert_allclose(mm_d, mm_0, rtol=0, atol=1e-13)
        for a, b in zip(C_d, C_0):            # ragged sets incl. padding
            assert a.shape == b.shape
            np.testing.assert_allclose(a, b, rtol=0, atol=1e-12)
        # Oracle parity on a stratified subset (the standing 1e-11 bar).
        for si, ms in enumerate(mode_sets):
            sub = slice(0, None, 97)
            mm_l = ref_impl.mismatch_t0_array(
                syn_mm["times"], syn_mm["data_dict"], ms,
                syn_mm["Mf"], syn_mm["chif"], t0s[sub], T_array=60.0,
                spherical_modes=syn_mm["spherical_modes"])
            np.testing.assert_allclose(mm_d[si][sub], mm_l,
                                       rtol=0, atol=1e-11)

    def test_fast_and_generic_paths(self, syn_mm):
        t0s = np.linspace(0.0, 12.0, 247)
        modes = [(2, 2, 0, 1), (2, 2, 1, 1)]
        kw = dict(T_array=60.0, spherical_modes=syn_mm["spherical_modes"],
                  return_amplitudes=True)
        for fn in (batched.batch_mismatch_t0_fast,
                   batched.batch_mismatch_t0):
            mm_d, C_d = fn(syn_mm["times"], syn_mm["data_dict"], modes,
                           syn_mm["Mf"], syn_mm["chif"], t0s,
                           dedup=True, **kw)
            mm_0, C_0 = fn(syn_mm["times"], syn_mm["data_dict"], modes,
                           syn_mm["Mf"], syn_mm["chif"], t0s,
                           dedup=False, **kw)
            np.testing.assert_allclose(mm_d, mm_0, rtol=0, atol=1e-13)
            np.testing.assert_allclose(C_d, C_0, rtol=0, atol=1e-12)

    def test_closest_windows(self, syn_mm):
        t0s = np.linspace(0.0, 12.0, 247)
        modes = [(2, 2, 0, 1), (2, 2, 1, 1)]
        kw = dict(T_array=60.0, spherical_modes=syn_mm["spherical_modes"],
                  t0_method="closest", return_amplitudes=True)
        mm_d, C_d = batched.batch_mismatch_t0(
            syn_mm["times"], syn_mm["data_dict"], modes,
            syn_mm["Mf"], syn_mm["chif"], t0s, dedup=True, **kw)
        mm_0, C_0 = batched.batch_mismatch_t0(
            syn_mm["times"], syn_mm["data_dict"], modes,
            syn_mm["Mf"], syn_mm["chif"], t0s, dedup=False, **kw)
        np.testing.assert_allclose(mm_d, mm_0, rtol=0, atol=1e-13)
        np.testing.assert_allclose(C_d, C_0, rtol=0, atol=1e-12)

    def test_remnant_axis_dense_grid(self, syn_mm):
        mode_sets = [[(2, 2, 0, 1)], [(2, 2, 0, 1), (2, 2, 1, 1)]]
        t0s = np.linspace(0.0, 12.0, 247)
        kw = dict(T_array=60.0, spherical_modes=syn_mm["spherical_modes"])
        args = (syn_mm["times"], syn_mm["data_dict"], mode_sets,
                np.array([syn_mm["Mf"], 0.9]),
                np.array([syn_mm["chif"], 0.6]), t0s)
        mm_d = batched.batch_mismatch_t0_modesets(*args, dedup=True, **kw)
        mm_0 = batched.batch_mismatch_t0_modesets(*args, dedup=False, **kw)
        assert mm_d.shape == (2, 2, len(t0s))
        np.testing.assert_allclose(mm_d, mm_0, rtol=0, atol=1e-13)


class TestStackedGridKernel:
    """engine_real.sweep_spectra_stacked_real (PERF.md section 26): the
    pre-sliced whole-grid kernel must equal the per-item kernels on the
    same window.  The public grids route it on every backend for
    uniform grids + contiguous windows, so TestGrids/TestFastGrids
    already cover the routing; this pins the kernel itself, incl. a
    'closest'-style window whose first sample precedes t0."""

    def _problem(self, Q=37, J=5, I=2):
        rng = np.random.default_rng(3)
        times = np.arange(-10.0, 40.05, 0.1)
        K = len(times)
        dre = rng.standard_normal((I, K))
        dim = rng.standard_normal((I, K))
        wrs = 0.5 + rng.random((Q, J))
        wis = -0.05 - 0.3 * rng.random((Q, J))
        mres = rng.standard_normal((Q, I, J))
        mims = rng.standard_normal((Q, I, J))
        return times, dre, dim, wrs, wis, mres, mims

    def _compare(self, t0, w):
        import jax
        from qnmfits_tpu import engine_real as er
        times, dre, dim, wrs, wis, mres, mims = self._problem()
        summ = jax.jit(lambda *x: er.sweep_spectra_real(
            *x, chunk=8, analytic=False))
        _, _, mm0 = summ(times, dre, dim, wrs, wis, mres, mims, t0, w)
        idx = np.nonzero(w > 0.5)[0]
        sl = slice(int(idx[0]), int(idx[-1]) + 1)
        stacked = jax.jit(lambda *x: er.sweep_spectra_stacked_real(
            *x, chunk=8))
        _, _, mm1 = stacked(times[sl], dre[:, sl], dim[:, sl],
                            wrs, wis, mres, mims, t0)
        np.testing.assert_allclose(np.asarray(mm1), np.asarray(mm0),
                                   rtol=0, atol=1e-12)

    def test_geq_window(self):
        times = np.arange(-10.0, 40.05, 0.1)
        t0 = 0.7
        w = ((times >= t0) & (times < t0 + 25.0)).astype(float)
        self._compare(t0, w)

    def test_closest_window_first_sample_before_t0(self):
        times = np.arange(-10.0, 40.05, 0.1)
        t0 = 0.74                               # closest sample is 0.7
        w = ((times >= 0.7) & (times < 25.7)).astype(float)
        self._compare(t0, w)
