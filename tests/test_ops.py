"""Unit tests for the low-level op kernels (ops/)."""

import numpy as np
import pytest

import jax.numpy as jnp


@pytest.fixture(scope="module")
def hermitian_systems():
    rng = np.random.default_rng(5)
    B, J = 32, 6
    M = rng.standard_normal((B, J, 2 * J)) \
        + 1j * rng.standard_normal((B, J, 2 * J))
    G = M @ np.conj(np.swapaxes(M, -1, -2)) + 2 * np.eye(J)[None]
    b = rng.standard_normal((B, J)) + 1j * rng.standard_normal((B, J))
    x = np.stack([np.linalg.solve(G[i], b[i]) for i in range(B)])
    return G, b, x


class TestCholeskyOps:
    def test_real_embedded(self, hermitian_systems):
        from qnmfits_tpu.ops.chol import cholesky_solve_unrolled
        G, b, x = hermitian_systems
        B, J = b.shape
        top = np.concatenate([G.real, -G.imag], axis=-1)
        bot = np.concatenate([G.imag, G.real], axis=-1)
        E = np.concatenate([top, bot], axis=-2)
        rhs = np.concatenate([b.real, b.imag], axis=-1)
        xe = np.asarray(cholesky_solve_unrolled(jnp.asarray(E),
                                                jnp.asarray(rhs)))
        np.testing.assert_allclose(xe[:, :J] + 1j * xe[:, J:], x,
                                   rtol=0, atol=1e-10)

    def test_complex_split(self, hermitian_systems):
        from qnmfits_tpu.ops.chol import complex_cholesky_solve_unrolled
        G, b, x = hermitian_systems
        xre, xim = complex_cholesky_solve_unrolled(
            jnp.asarray(G.real), jnp.asarray(G.imag),
            jnp.asarray(b.real), jnp.asarray(b.imag))
        np.testing.assert_allclose(np.asarray(xre) + 1j * np.asarray(xim),
                                   x, rtol=0, atol=1e-10)

    def test_complex_split_matches_embedded_on_ill_conditioned(self):
        """The two formulations agree through the shared equilibration
        even for near-singular Grams (the regime that used to NaN)."""
        from qnmfits_tpu.engine_real import (_regularised_embed,
                                             _regularised_solve)
        from qnmfits_tpu.ops.chol import cholesky_solve_unrolled
        rng = np.random.default_rng(6)
        B, J = 8, 5
        M = rng.standard_normal((B, J, 2 * J))
        G = M @ np.swapaxes(M, -1, -2) + np.eye(J)[None]
        # one column nearly dead, one moderately sick
        scale = np.ones(J)
        scale[2] = 1e-30
        scale[4] = 1e-9
        G = G * scale[None, :, None] * scale[None, None, :]
        Gim = np.zeros_like(G)
        rhs = rng.standard_normal((B, J)) * scale[None, :]

        E, bb, Di = _regularised_embed(jnp.asarray(G), jnp.asarray(Gim),
                                       jnp.asarray(rhs), jnp.asarray(rhs))
        xe = np.asarray(cholesky_solve_unrolled(E, bb))
        xre_e, xim_e = xe[:, :J] * np.asarray(Di), xe[:, J:] * np.asarray(Di)
        xre, xim = _regularised_solve(jnp.asarray(G), jnp.asarray(Gim),
                                      jnp.asarray(rhs), jnp.asarray(rhs))
        assert np.all(np.isfinite(np.asarray(xre)))
        np.testing.assert_allclose(np.asarray(xre), xre_e, rtol=1e-12,
                                   atol=1e-10)
        # dead column's amplitude is exactly zero in both
        np.testing.assert_allclose(np.asarray(xre)[:, 2], 0.0)
        np.testing.assert_allclose(xre_e[:, 2], 0.0)


class TestSafeChunk:
    def test_dense_grid_allows_large_chunks(self):
        from qnmfits_tpu.batched import _safe_chunk
        t0s = np.linspace(0.0, 51.2, 2048)
        assert _safe_chunk(t0s, 1.36, 512) == 512

    def test_sparse_grid_limits_chunk(self):
        from qnmfits_tpu.batched import _safe_chunk
        t0s = np.linspace(0.0, 51.2, 512)
        assert _safe_chunk(t0s, 1.36, 512) == 128

    def test_deep_ladder_small_chunks(self):
        from qnmfits_tpu.batched import _safe_chunk
        t0s = np.linspace(-20.0, 40.0, 200)
        c = _safe_chunk(t0s, 4.4, 512)
        assert c <= 16 and c >= 1

    def test_no_damping_no_limit(self):
        from qnmfits_tpu.batched import _safe_chunk
        assert _safe_chunk(np.linspace(0, 100, 64), 0.0, 256) == 256


class TestDoubleSingle:
    """ops/ds.py primitives vs native float64 (eager execution -- jitted
    whole-graph XLA:CPU applies excess-precision rewrites that break
    error-free transformations; Mosaic on real TPU does not, see
    ops/chol_pallas.py)."""

    def test_primitives_match_f64(self):
        import jax.numpy as jnp
        from qnmfits_tpu.ops import ds
        rng = np.random.default_rng(0)
        a64 = rng.standard_normal(2000) * 10.0 ** rng.integers(-3, 4, 2000)
        b64 = rng.standard_normal(2000) * 10.0 ** rng.integers(-3, 4, 2000)
        a = ds.ds_from_f64(jnp.asarray(a64))
        b = ds.ds_from_f64(jnp.asarray(b64))
        # exact values of the ds-rounded inputs (ds carries ~48 bits)
        ae = np.asarray(a[0], np.float64) + np.asarray(a[1], np.float64)
        be = np.asarray(b[0], np.float64) + np.asarray(b[1], np.float64)

        def relerr(got, want):
            got = np.asarray(ds.ds_to_f64(got))
            return np.max(np.abs((got - want)
                                 / np.maximum(np.abs(want), 1e-300)))

        assert relerr(ds.ds_add(a, b), ae + be) < 3e-14
        assert relerr(ds.ds_mul(a, b), ae * be) < 3e-14
        pos = ds.ds_from_f64(jnp.asarray(np.abs(a64) + 0.1))
        pe = np.asarray(pos[0], np.float64) + np.asarray(pos[1], np.float64)
        assert relerr(ds.ds_rsqrt(pos), 1 / np.sqrt(pe)) < 3e-14

    def test_ds_cholesky_math_vs_numpy(self):
        """_solve_values (the kernel's math) eagerly on CPU vs
        numpy.linalg.solve: full ds accuracy."""
        import jax.numpy as jnp
        from qnmfits_tpu.ops.chol_pallas import _solve_values
        from qnmfits_tpu.ops.ds import ds_from_f64
        rng = np.random.default_rng(2)
        B, n = 32, 6
        M = rng.standard_normal((B, n, 2 * n)) \
            + 1j * rng.standard_normal((B, n, 2 * n))
        G = M @ np.conj(np.swapaxes(M, -1, -2)) + 2 * np.eye(n)[None]
        b = rng.standard_normal((B, n)) + 1j * rng.standard_normal((B, n))
        xref = np.stack([np.linalg.solve(G[i], b[i]) for i in range(B)])
        args = []
        for Mx in (jnp.transpose(jnp.asarray(G.real), (1, 2, 0)),
                   jnp.transpose(jnp.asarray(G.imag), (1, 2, 0))):
            args.extend(ds_from_f64(Mx))
        for v in (jnp.asarray(b.real).T, jnp.asarray(b.imag).T):
            args.extend(ds_from_f64(v))
        rh, rl, ih, il = _solve_values(n, *args)
        x = (np.asarray(rh, np.float64) + np.asarray(rl, np.float64)
             + 1j * (np.asarray(ih, np.float64)
                     + np.asarray(il, np.float64))).T
        rel = np.max(np.abs(x - xref) / np.maximum(np.abs(xref), 1e-10))
        assert rel < 1e-12

    def test_pallas_plumbing_interpret_mode(self):
        """Jitted interpret-mode run checks the pallas_call layout,
        padding, and grid plumbing.  Tolerance is loose because jitted
        XLA:CPU applies excess-precision rewrites that degrade the ds
        arithmetic to ~f32 (Mosaic on real TPU does not: 7e-14 measured
        on hardware, PERF.md)."""
        import jax.numpy as jnp
        from qnmfits_tpu.ops.chol_pallas import complex_cholesky_solve_ds
        rng = np.random.default_rng(3)
        B, n = 37, 3                     # B not a multiple of tile
        M = rng.standard_normal((B, n, 2 * n))
        G = M @ np.swapaxes(M, -1, -2) + 2 * np.eye(n)[None]
        b = rng.standard_normal((B, n))
        xref = np.stack([np.linalg.solve(G[i], b[i]) for i in range(B)])
        xre, xim = complex_cholesky_solve_ds(
            jnp.asarray(G), jnp.asarray(np.zeros_like(G)),
            jnp.asarray(b), jnp.asarray(np.zeros_like(b)),
            tile=16, interpret=True)
        assert xre.shape == (B, n)
        np.testing.assert_allclose(np.asarray(xre), xref, rtol=2e-4,
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(xim), 0.0, atol=1e-5)


class TestResumableSweep:
    def test_runs_and_resumes(self, tmp_path):
        from qnmfits_tpu.utils.checkpoint import resumable_sweep
        items = np.arange(10.0)
        calls = []

        def fn(block):
            calls.append(len(block))
            return block * 2, block + 1

        out = resumable_sweep(fn, items, str(tmp_path / "ck"), block=4)
        np.testing.assert_allclose(out[0], items * 2)
        np.testing.assert_allclose(out[1], items + 1)
        assert calls == [4, 4, 2]

        # resume: nothing recomputed
        calls.clear()
        out2 = resumable_sweep(fn, items, str(tmp_path / "ck"), block=4)
        assert calls == []
        np.testing.assert_allclose(out2[0], items * 2)

    def test_partial_resume(self, tmp_path):
        from qnmfits_tpu.utils.checkpoint import resumable_sweep
        items = np.arange(8.0)
        state = {"fail": True}

        def fn(block):
            if state["fail"] and block[0] >= 4:
                raise RuntimeError("preempted")
            return block ** 2

        with pytest.raises(RuntimeError):
            resumable_sweep(fn, items, str(tmp_path / "ck"), block=4)
        state["fail"] = False
        calls = []

        def fn2(block):
            calls.append(int(block[0]))
            return block ** 2

        out = resumable_sweep(fn2, items, str(tmp_path / "ck"), block=4)
        np.testing.assert_allclose(out, items ** 2)
        assert calls == [4]              # only the missing block reran

    def test_config_change_raises(self, tmp_path):
        from qnmfits_tpu.utils.checkpoint import resumable_sweep
        items = np.arange(6.0)
        resumable_sweep(lambda b: b, items, str(tmp_path / "ck"), block=3)
        with pytest.raises(ValueError, match="different"):
            resumable_sweep(lambda b: b, items, str(tmp_path / "ck"),
                            block=2)
        with pytest.raises(ValueError, match="different"):
            resumable_sweep(lambda b: b, items + 1.0,
                            str(tmp_path / "ck"), block=3)

    def test_real_sweep_through_checkpoint(self, tmp_path):
        """End-to-end: a t0 sweep through the checkpoint wrapper equals
        the direct sweep."""
        from qnmfits_tpu import fitting
        from qnmfits_tpu.testing import synthetic_single
        from qnmfits_tpu.utils.checkpoint import resumable_sweep

        syn = synthetic_single(modes=[(2, 2, n, 1) for n in range(3)],
                               noise=1e-3, seed=17)
        t0s = np.linspace(0.0, 20.0, 10)

        def fn(block):
            return fitting.mismatch_t0_array(
                syn["times"], syn["data"], syn["modes"], syn["Mf"],
                syn["chif"], block, T_array=70.0)

        mm = resumable_sweep(fn, t0s, str(tmp_path / "ck"), block=4)
        mm_direct = fn(t0s)
        np.testing.assert_allclose(mm, mm_direct, rtol=0, atol=1e-13)


class TestResumableSweepEdgeCases:
    def test_many_outputs_resume_order(self, tmp_path):
        """11+ outputs must keep their slots on resume (regression:
        lexicographic key sort put out10 before out2)."""
        from qnmfits_tpu.utils.checkpoint import resumable_sweep
        items = np.arange(6.0)

        def fn(block):
            return tuple(block + k for k in range(12))

        out1 = resumable_sweep(fn, items, str(tmp_path / "ck"), block=3)
        out2 = resumable_sweep(fn, items, str(tmp_path / "ck"), block=3)
        for k in range(12):
            np.testing.assert_allclose(out2[k], items + k)
            np.testing.assert_allclose(out1[k], out2[k])

    def test_empty_items_raises(self, tmp_path):
        from qnmfits_tpu.utils.checkpoint import resumable_sweep
        with pytest.raises(ValueError, match="empty"):
            resumable_sweep(lambda b: b, np.array([]),
                            str(tmp_path / "ck"))

    def test_one_tuple_stays_tuple(self, tmp_path):
        """(arr,) in -> (arr,) out, including on a pure-resume run."""
        from qnmfits_tpu.utils.checkpoint import resumable_sweep
        items = np.arange(4.0)
        out = resumable_sweep(lambda b: (b * 3,), items,
                              str(tmp_path / "ck"), block=2)
        assert isinstance(out, tuple) and len(out) == 1
        np.testing.assert_allclose(out[0], items * 3)
        out2 = resumable_sweep(lambda b: (b * 3,), items,
                               str(tmp_path / "ck"), block=2)
        assert isinstance(out2, tuple) and len(out2) == 1
