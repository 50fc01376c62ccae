"""Spatial-mapping tests: Qmu predictions, spheroidal harmonics, mapping
fit round trip."""

import numpy as np
import pytest

from qnmfits_tpu import spatial
from qnmfits_tpu.harmonics import sYlm


class TestSpheroidal:
    def test_reduces_to_spherical_at_zero(self):
        S = spatial.spheroidal_harmonic(-2, 2, 2, 0.0)
        th, ph = 0.8, 1.1
        assert abs(S(th, ph) - sYlm(-2, 2, 2, th, ph)) < 1e-12

    def test_unit_norm(self):
        gamma = 0.45 - 0.06j
        l0, C = spatial.spheroidal_coefficients(-2, 2, 2, gamma)
        assert abs(np.sum(np.abs(C) ** 2) - 1.0) < 1e-12

    def test_qmu_C_coefficient_vs_quadrature(self):
        """Orthonormality shortcut == sky-grid quadrature."""
        idx = [(2, 4, 2, 2, 0, 1, 2, 2, 0, 1)]
        a = spatial.Qmu_C(idx, 0.68, method="coefficients")[0]
        b = spatial.Qmu_C(idx, 0.68, method="quadrature", n_quad=48)[0]
        assert abs(a - b) < 1e-6
        idx2 = [(4, 4, 2, 2, 0, 1, 2, 2, 0, 1)]
        a2 = spatial.Qmu_C(idx2, 0.68, method="coefficients")[0]
        b2 = spatial.Qmu_C(idx2, 0.68, method="quadrature", n_quad=48)[0]
        assert abs(a2 - b2) < 1e-6
        # The dominant component is the diagonal one.
        assert abs(a2) > abs(a)


class TestQmu:
    def test_qmu_A_at_zero_spin(self):
        """At chi=0 the mixing is diagonal, so Qmu_A reduces to a single
        kappa product."""
        idx = [(4, 4, 2, 2, 0, 1, 2, 2, 0, 1)]
        got = spatial.Qmu_A(idx, 0.0, l_max=8)[0]
        expect = spatial.kappa(4, 4, 2, 2, 2, 2, -2, -2)
        assert abs(got - expect) < 1e-10

    def test_qmu_D_extra_factor(self):
        idx = [(4, 4, 2, 2, 0, 1, 2, 2, 0, 1)]
        a = spatial.Qmu_A(idx, 0.0, l_max=8)[0]
        d = spatial.Qmu_D(idx, 0.0, l_max=8)[0]
        i = 4
        assert abs(d - a * np.sqrt((i + 4) * (i - 3) * (i + 3) * (i - 2))) \
            < 1e-10


@pytest.fixture(scope="module")
def mapping_setup():
    """Synthetic data containing a linear ladder + a quadratic mode."""
    from qnmfits_tpu.ref_impl import get_qnm, ringdown

    Mf, chif = 0.952, 0.692
    times = np.arange(-10.0, 120.0, 0.1)
    q = get_qnm()
    spherical_modes = [(4, 4), (5, 4)]
    lin_modes = [(4, 4, 0, 1)]
    quad_mode = (2, 2, 0, 1, 2, 2, 0, 1)

    rng = np.random.default_rng(3)
    amps_lin = rng.standard_normal(1) + 1j * rng.standard_normal(1)
    amp_quad_per_sph = (rng.standard_normal(2)
                        + 1j * rng.standard_normal(2))

    w_lin = np.array(q.omega_list(lin_modes, chif, Mf))
    [w_quad] = q.omega_list([quad_mode], chif, Mf)

    data = {}
    for i, lm in enumerate(spherical_modes):
        mu = np.array(q.mu_list([lm + m for m in lin_modes], chif))
        h = ringdown(times, 0.0, mu * amps_lin, w_lin)
        h = h + ringdown(times, 0.0, [amp_quad_per_sph[i]], [w_quad])
        data[lm] = h
    return dict(times=times, data=data, Mf=Mf, chif=chif,
                spherical_modes=spherical_modes, lin_modes=lin_modes,
                quad_mode=quad_mode, amps_lin=amps_lin,
                amp_quad=amp_quad_per_sph)


class TestMappingFit:
    def test_recovers_per_sphere_amplitudes(self, mapping_setup):
        s = mapping_setup
        out = spatial.mapping_multimode_ringdown_fit(
            s["times"], s["data"], list(s["lin_modes"]) + [s["quad_mode"]],
            s["Mf"], s["chif"], t0=0.0, mapping_modes=[s["quad_mode"]],
            T=100, spherical_modes=s["spherical_modes"])
        assert out["mismatch"] < 1e-12
        # The mapped quadratic mode gets one amplitude per spherical mode.
        mask = np.array([m == s["quad_mode"] for m in out["modes"]])
        np.testing.assert_allclose(out["C"][mask], s["amp_quad"],
                                   atol=1e-8)
        # Linear amplitudes recovered too.
        mask_lin = np.array([m == s["lin_modes"][0] for m in out["modes"]])
        np.testing.assert_allclose(out["C"][mask_lin], s["amps_lin"],
                                   atol=1e-8)

    def test_spatial_reconstruction_normalised(self, mapping_setup):
        s = mapping_setup
        out = spatial.mapping_multimode_ringdown_fit(
            s["times"], s["data"], list(s["lin_modes"]) + [s["quad_mode"]],
            s["Mf"], s["chif"], t0=0.0, mapping_modes=[s["quad_mode"]],
            T=100, spherical_modes=s["spherical_modes"])
        th = np.linspace(0.1, np.pi - 0.1, 12)
        ph = np.linspace(0, 2 * np.pi, 13)
        TH, PH = np.meshgrid(th, ph, indexing="ij")
        rec = spatial.spatial_reconstruction(TH, PH, out, s["quad_mode"],
                                             l_max=8)
        assert np.max(np.abs(rec)) == pytest.approx(1.0)

    def test_spatial_data_mismatch_self_is_zero(self, mapping_setup):
        s = mapping_setup
        out = spatial.mapping_multimode_ringdown_fit(
            s["times"], s["data"], list(s["lin_modes"]) + [s["quad_mode"]],
            s["Mf"], s["chif"], t0=0.0, mapping_modes=[s["quad_mode"]],
            T=100, spherical_modes=s["spherical_modes"])
        assert spatial.spatial_data_mismatch(out, out, s["quad_mode"]) \
            < 1e-14


def test_spatial_prediction_linear_peak_normalised():
    th = np.linspace(0.1, np.pi - 0.1, 16)
    ph = np.linspace(0, 2 * np.pi, 17)
    TH, PH = np.meshgrid(th, ph, indexing="ij")
    pat = spatial.spatial_prediction_linear(TH, PH, (2, 2, 0, 1), 8, 0.68)
    assert np.max(np.abs(pat)) == pytest.approx(1.0)


def test_spatial_prediction_C_close_to_linear_limit():
    """For a quadratic mode, prediction C evaluated on the sky is the
    combined-frequency spheroidal; its dominant sYlm content is (L, M)."""
    quad = (2, 2, 0, 1, 2, 2, 0, 1)
    th = np.linspace(0.1, np.pi - 0.1, 24)
    ph = np.zeros_like(th)
    pat = spatial.spatial_prediction_C(th, ph, quad, 0.68)
    # Dominated by sY_{-2,4,4}: peak location should be close.
    y44 = sYlm(-2, 4, 4, th, 0.0)
    assert abs(np.argmax(np.abs(pat)) - np.argmax(np.abs(y44))) <= 2


def test_qmu_B_with_scalar_tables():
    """Qmu_B uses s=0 (scalar) mixing for its second factor
    (reference spatial_mapping_functions.py:787-799)."""
    idx = [(4, 4, 2, 2, 0, 1, 2, 2, 0, 1)]
    val = spatial.Qmu_B(idx, 0.68, l_max=8)[0]
    assert np.isfinite(val) and abs(val) > 1e-3
    # At chi=0 both mixings are diagonal: B reduces to a single kappa.
    val0 = spatial.Qmu_B(idx, 0.0, l_max=8)[0]
    expect0 = spatial.kappa(4, 4, 2, 2, 2, 2, -2, 0)
    assert abs(val0 - expect0) < 1e-10


def test_mapping_fit_with_unmapped_quadratic(mapping_setup):
    """A quadratic mode NOT being mapped is fit through the Qmu_B
    mixing prediction (reference :202-210)."""
    s = mapping_setup
    extra_quad = (3, 3, 0, 1, 2, 2, 0, 1)
    out = spatial.mapping_multimode_ringdown_fit(
        s["times"], s["data"],
        list(s["lin_modes"]) + [s["quad_mode"], extra_quad],
        s["Mf"], s["chif"], t0=0.0, mapping_modes=[s["quad_mode"]],
        T=100, spherical_modes=s["spherical_modes"])
    # The data contains no (3,3,0)x(2,2,0) content: its amplitude should
    # be tiny and the fit still near-perfect.
    assert out["mismatch"] < 1e-10


# ---------------------------------------------------------------------------
# Compiled spatial engine (spatial_engine): Qmu einsums, mapping sweeps
# ---------------------------------------------------------------------------

class TestCompiledQmu:
    """The einsum Qmu engine must reproduce the reference-shaped
    double-loop oracle exactly (spatial._Qmu_sum_loop)."""

    IDX = [(4, 4, 2, 2, 0, 1, 2, 2, 0, 1),
           (5, 4, 2, 2, 0, 1, 2, 2, 1, 1),
           (6, 4, 3, 2, 0, 1, 3, 2, 0, 1),
           (4, 4, 2, 2, 0, -1, 2, 2, 0, 1),
           (2, 0, 2, 2, 0, 1, 2, -2, 0, -1)]

    @pytest.mark.parametrize("chif", [0.0, 0.68, 0.95])
    def test_qmu_A_matches_loop(self, chif):
        loop = spatial._Qmu_sum_loop(self.IDX, chif, 8, -2, -2)
        vec = spatial.Qmu_A(self.IDX, chif, l_max=8)
        np.testing.assert_allclose(vec, loop, rtol=0, atol=1e-13)

    @pytest.mark.parametrize("chif", [0.0, 0.68, 0.95])
    def test_qmu_B_matches_loop(self, chif):
        loop = spatial._Qmu_sum_loop(self.IDX, chif, 8, -2, 0)
        vec = spatial.Qmu_B(self.IDX, chif, l_max=8)
        np.testing.assert_allclose(vec, loop, rtol=0, atol=1e-13)

    def test_qmu_D_matches_loop(self):
        extra = lambda i: np.sqrt((i + 4) * (i - 3) * (i + 3) * (i - 2))
        loop = spatial._Qmu_sum_loop(self.IDX, 0.68, 8, -2, -2, extra=extra)
        vec = spatial.Qmu_D(self.IDX, 0.68, l_max=8)
        np.testing.assert_allclose(vec, loop, rtol=0, atol=1e-13)

    def test_array_chif_consistent_with_scalars(self):
        """The compiled engine supports array chif (beyond the loop
        oracle, which cannot); columns must equal per-scalar calls."""
        chifs = np.array([0.1, 0.5, 0.9])
        arr = np.array(spatial.Qmu_B(self.IDX, chifs, l_max=8))
        assert arr.shape == (len(self.IDX), 3)
        for qi, c in enumerate(chifs):
            col = np.array(spatial.Qmu_B(self.IDX, float(c), l_max=8))
            np.testing.assert_allclose(arr[:, qi], col, rtol=0, atol=1e-15)


@pytest.fixture(scope="module")
def mapping_sweep_setup(mapping_setup):
    """Noisy variant of the mapping data so sweep mismatches are O(1e-8),
    a meaningful equality target (not epsilon-level zeros)."""
    s = dict(mapping_setup)
    rng = np.random.default_rng(11)
    data = {}
    for lm, h in s["data"].items():
        scale = 1e-4 * np.max(np.abs(h))
        data[lm] = h + scale * (rng.standard_normal(len(h))
                                + 1j * rng.standard_normal(len(h)))
    s["data"] = data
    s["modes"] = list(s["lin_modes"]) + [s["quad_mode"]]
    s["t0s"] = np.linspace(0.0, 20.0, 9)
    return s


class TestMappingSweep:
    """mapping_mismatch_t0_array: the jitted-engine mapping sweep must
    match a serial loop of mapping_multimode_ringdown_fit <= 1e-11."""

    def test_batched_matches_loop(self, mapping_sweep_setup):
        s = mapping_sweep_setup
        kw = dict(T_array=60, spherical_modes=s["spherical_modes"])
        mm_loop = spatial.mapping_mismatch_t0_array(
            s["times"], s["data"], s["modes"], s["Mf"], s["chif"],
            s["t0s"], [s["quad_mode"]], engine="loop", **kw)
        mm_bat, C = spatial.mapping_mismatch_t0_array(
            s["times"], s["data"], s["modes"], s["Mf"], s["chif"],
            s["t0s"], [s["quad_mode"]], engine="batched",
            return_amplitudes=True, **kw)
        np.testing.assert_allclose(mm_bat, mm_loop, rtol=0, atol=1e-11)
        # Amplitude recovery: the mapped mode's per-sphere amplitudes at
        # t0=0 match the injected ones to noise level.
        mm0, C0 = spatial.mapping_mismatch_t0_array(
            s["times"], s["data"], s["modes"], s["Mf"], s["chif"],
            np.array([0.0]), [s["quad_mode"]], engine="batched",
            return_amplitudes=True, **kw)
        np.testing.assert_allclose(C0[0, -2:], s["amp_quad"], atol=1e-2)

    def test_f32_batched_never_dedups(self, mapping_sweep_setup,
                                      monkeypatch):
        """batched+f32 windows in f32 ON DEVICE, so host-f64 dedup keys
        can disagree at a window boundary -- the gate must skip dedup
        (the same rule as batch_mismatch_t0, batched.py)."""
        from qnmfits_tpu import batched

        def boom(*a, **k):                     # pragma: no cover
            raise AssertionError("dedup keys computed on the f32 path")

        monkeypatch.setattr(batched, "_window_dedup", boom)
        monkeypatch.setattr(batched, "_window_dedup_closest", boom)
        s = mapping_sweep_setup
        t0s = np.linspace(0.0, 2.0, 41)        # finer than dt: would dedup
        mm = spatial.mapping_mismatch_t0_array(
            s["times"], s["data"], s["modes"], s["Mf"], s["chif"],
            t0s, [s["quad_mode"]], engine="batched", precision="f32",
            T_array=60, spherical_modes=s["spherical_modes"])
        assert np.all(np.isfinite(mm))

    def test_fast_matches_loop(self, mapping_sweep_setup):
        s = mapping_sweep_setup
        kw = dict(T_array=60, spherical_modes=s["spherical_modes"])
        mm_loop = spatial.mapping_mismatch_t0_array(
            s["times"], s["data"], s["modes"], s["Mf"], s["chif"],
            s["t0s"], [s["quad_mode"]], engine="loop", **kw)
        mm_fast = spatial.mapping_mismatch_t0_array(
            s["times"], s["data"], s["modes"], s["Mf"], s["chif"],
            s["t0s"], [s["quad_mode"]], engine="fast", **kw)
        np.testing.assert_allclose(mm_fast, mm_loop, rtol=0, atol=1e-11)

    def test_sharded_matches_batched(self, mapping_sweep_setup):
        import jax
        devs = jax.devices("cpu")
        if len(devs) < 8:
            pytest.skip("needs 8 virtual CPU devices")
        from qnmfits_tpu.parallel.mesh import sweep_mesh
        s = mapping_sweep_setup
        kw = dict(T_array=60, spherical_modes=s["spherical_modes"])
        mm_bat = spatial.mapping_mismatch_t0_array(
            s["times"], s["data"], s["modes"], s["Mf"], s["chif"],
            s["t0s"], [s["quad_mode"]], engine="batched", **kw)
        mm_sh = spatial.mapping_mismatch_t0_array(
            s["times"], s["data"], s["modes"], s["Mf"], s["chif"],
            s["t0s"], [s["quad_mode"]], engine="sharded",
            mesh=sweep_mesh(n_sweep=8, n_time=1, devices=devs),
            chunk=2, **kw)
        np.testing.assert_allclose(mm_sh, mm_bat, rtol=0, atol=1e-11)

    def test_fast_unsorted_t0_raises_even_when_dedupable(
            self, mapping_sweep_setup):
        """Input validation must run on the USER's t0_array, before
        dedup: dedup representatives are always ascending, so an
        unsorted grid that happens to dedup-compress (duplicates here)
        used to slip past the fast-engine sorted-ascending contract."""
        s = mapping_sweep_setup
        t0_bad = np.array([5.0, 5.0, 0.0, 0.0])   # dedupable, unsorted
        with pytest.raises(ValueError, match="sorted ascending"):
            spatial.mapping_mismatch_t0_array(
                s["times"], s["data"], s["modes"], s["Mf"], s["chif"],
                t0_bad, [s["quad_mode"]], engine="fast", T_array=60,
                spherical_modes=s["spherical_modes"])


class TestSpatialMismatchRoundTrip:
    """Self-consistency: fitting data built FROM a mixing prediction and
    comparing against that same prediction must give ~zero spatial
    mismatch (catches conjugation/normalisation slips)."""

    def test_linear_round_trip(self, mapping_setup):
        from qnmfits_tpu.ref_impl import get_qnm, ringdown
        s = mapping_setup
        q = get_qnm()
        Mf, chif = s["Mf"], s["chif"]
        lin = (2, 2, 0, 1)
        [w] = q.omega_list([lin], chif, Mf)
        A = 0.7 - 0.4j
        sph = [(2, 2), (3, 2), (4, 2), (5, 2)]
        times = s["times"]
        data = {}
        for lm in sph:
            [mu] = q.mu_list([lm + lin], chif)
            data[lm] = ringdown(times, 0.0, [A * mu], [w])
        out = spatial.mapping_multimode_ringdown_fit(
            times, data, [lin], Mf, chif, t0=0.0, mapping_modes=[lin],
            T=100, spherical_modes=sph)
        sm, phase, z = spatial.spatial_mismatch_linear(out, lin, chif,
                                                       l_max=8)
        assert sm < 1e-8
        # The overlap phase recovers the injected amplitude's phase.
        assert abs(np.angle(z * np.exp(-1j * np.angle(A)))) < 1e-6

    def test_quadratic_round_trip(self, mapping_setup):
        from qnmfits_tpu.ref_impl import get_qnm, ringdown
        s = mapping_setup
        q = get_qnm()
        Mf, chif = s["Mf"], s["chif"]
        quad = s["quad_mode"]
        [w] = q.omega_list([quad], chif, Mf)
        A = -0.3 + 0.9j
        # Span the full l' range of the prediction (max(2,|j|)..l_max):
        # the overlap denominator sums over it, so any uncovered row
        # leaves a definitional (not numerical) residual.
        sph = [(4, 4), (5, 4), (6, 4), (7, 4), (8, 4)]
        times = s["times"]
        alphas = np.array(spatial.Qmu_B([lm + quad for lm in sph], chif,
                                        l_max=8))
        data = {lm: ringdown(times, 0.0, [A * alphas[i]], [w])
                for i, lm in enumerate(sph)}
        out = spatial.mapping_multimode_ringdown_fit(
            times, data, [quad], Mf, chif, t0=0.0, mapping_modes=[quad],
            T=100, spherical_modes=sph)
        sm, phase, z = spatial.spatial_mismatch_quadratic(
            out, quad, 8, chif, spatial.Qmu_B)
        assert sm < 1e-8


def test_spatial_prediction_quadratic_with_Qmu_D():
    """The D-predictor (extra sqrt factor) flows through the sky
    prediction API (with_extra path of the compiled engine)."""
    th = np.linspace(0.1, np.pi - 0.1, 8)
    ph = np.zeros_like(th)
    quad = (2, 2, 0, 1, 2, 2, 0, 1)
    pat_a = spatial.spatial_prediction_quadratic(th, ph, quad, 8, 0.68,
                                                 spatial.Qmu_A, s2=-2)
    pat_d = spatial.spatial_prediction_quadratic(th, ph, quad, 8, 0.68,
                                                 spatial.Qmu_D, s2=-2)
    assert np.all(np.isfinite(pat_a)) and np.all(np.isfinite(pat_d))
    # D reweights rows by sqrt((i+4)(i-3)(i+3)(i-2)): the normalised
    # patterns must differ.
    assert np.max(np.abs(pat_a - pat_d)) > 1e-3


class TestQmuCBatched:
    """Compiled Qmu_C engine (spatial_engine.eval_qmu_c): one stacked
    eigensolve, array-chif support matching A/B/D."""

    IDX = [(2, 4, 2, 2, 0, 1, 2, 2, 0, 1),
           (4, 4, 2, 2, 0, 1, 2, 2, 0, 1),
           (5, 4, 2, 2, 0, 1, 2, 2, 0, 1),
           (4, 3, 2, 2, 0, 1, 2, 2, 0, 1)]   # j != b+f -> exact zero

    def test_array_chif_matches_scalar(self):
        chifs = np.array([0.1, 0.45, 0.7])
        rows = spatial.Qmu_C(self.IDX, chifs)
        assert rows[0].shape == (3,)
        for q, c in enumerate(chifs):
            sc = spatial.Qmu_C(self.IDX, float(c))
            np.testing.assert_allclose([row[q] for row in rows], sc,
                                       rtol=0, atol=1e-13)

    def test_j_mismatch_row_is_zero(self):
        out = spatial.Qmu_C(self.IDX, 0.68)
        assert out[3] == 0.0
        rows = spatial.Qmu_C(self.IDX, np.array([0.2, 0.68]))
        np.testing.assert_array_equal(rows[3], 0.0)

    def test_matches_per_index_eigensolve(self):
        """Batched selection == the scalar mode_eigensystem read that
        backed the pre-round-4 loop."""
        from qnmfits_tpu.spatial import spheroidal_coefficients
        from qnmfits_tpu.ref_impl import get_qnm

        chif = 0.68
        for (i, j, a, b, c, p1, e, f, g, p2) in self.IDX[:3]:
            L, M = a + e, b + f
            [omega] = get_qnm().omega_list([(a, b, c, p1, e, f, g, p2)],
                                           chif, 1)
            l0, C = spheroidal_coefficients(-2, L, M, chif * omega)
            expect = C[i - l0] if 0 <= i - l0 < len(C) else 0.0
            got = spatial.Qmu_C([(i, j, a, b, c, p1, e, f, g, p2)],
                                chif)[0]
            np.testing.assert_allclose(got, expect, rtol=0, atol=1e-13)


def test_spatial_prediction_C_matches_pointwise_closure():
    """sky_sum contraction == the spheroidal_harmonic pointwise sum."""
    from qnmfits_tpu.spatial import spheroidal_harmonic
    from qnmfits_tpu.ref_impl import get_qnm

    mp = (2, 2, 0, 1, 2, 2, 0, 1)
    chif = 0.68
    theta, phi = np.meshgrid(np.linspace(0.1, np.pi - 0.1, 7),
                             np.linspace(0.0, 2 * np.pi, 9),
                             indexing="ij")
    got = spatial.spatial_prediction_C(theta, phi, mp, chif)
    [omega] = get_qnm().omega_list([mp], chif, 1)
    S = spheroidal_harmonic(-2, 4, 4, chif * omega)
    ans = S(theta, phi)
    expect = ans / np.max(np.abs(ans))
    np.testing.assert_allclose(got, expect, rtol=0, atol=1e-12)


def test_mapping_sweep_dense_grid_dedup(mapping_sweep_setup):
    """Window dedup on the mapping sweep (PERF.md section 25): a t0
    grid finer than the sampling must give identical mismatches and
    rephase-exact amplitudes vs the per-t0 kernel, on both engines."""
    s = mapping_sweep_setup
    t0s = np.linspace(0.0, 12.0, 247)          # ~2x finer than dt=0.1
    kw = dict(T_array=60, spherical_modes=s["spherical_modes"],
              return_amplitudes=True)
    for eng in ("batched", "fast"):
        mm_0, C_0 = spatial.mapping_mismatch_t0_array(
            s["times"], s["data"], s["modes"], s["Mf"], s["chif"],
            t0s, [s["quad_mode"]], engine=eng, dedup=False, **kw)
        mm_d, C_d = spatial.mapping_mismatch_t0_array(
            s["times"], s["data"], s["modes"], s["Mf"], s["chif"],
            t0s, [s["quad_mode"]], engine=eng, dedup=True, **kw)
        np.testing.assert_allclose(mm_d, mm_0, rtol=0, atol=1e-13)
        np.testing.assert_allclose(C_d, C_0, rtol=0, atol=1e-11)
