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
