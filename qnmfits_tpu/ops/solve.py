"""Complex least-squares solvers for ringdown design matrices.

Three paths, trading accuracy for speed:

* ``gram_cholesky`` -- normal equations with column equilibration and a
  tiny Tikhonov floor.  The Gram matrices are assembled by the *caller*
  as (K,J)^H (K,J) matmuls (MXU work); the J x J solve here is cheap.
  Fast path for batched sweeps; conditioning is kappa(A)^2, mitigated by
  equilibration.
* ``qr_solve`` -- Householder QR of the tall design matrix
  (kappa(A), not squared).  Used when the matrix is materialised anyway.
* ``svd_lstsq`` -- jnp.linalg.lstsq (SVD, rcond=None semantics), the exact
  analogue of the reference's np.linalg.lstsq call
  (/root/reference/qnmfits/qnmfits.py:287); parity path.

All paths are batched over leading axes and dtype-polymorphic
(complex64/complex128).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["gram_cholesky", "qr_solve", "svd_lstsq"]


def _solve_real_embedded(Gs, bs):
    """Solve the equilibrated Hermitian system via the 2x2 real embedding.

    complex G = A + iB (Hermitian PD) maps to the real symmetric PD
    [[A, -B], [B, A]]; complex rhs maps to [Re b; Im b].  The TPU backend
    lacks complex Cholesky/LU lowering, so the J x J solve runs as a real
    2J x 2J Cholesky (this is also the BASELINE.json north-star embedding
    for MXU work).
    """
    A = jnp.real(Gs)
    B = jnp.imag(Gs)
    top = jnp.concatenate([A, -B], axis=-1)
    bot = jnp.concatenate([B, A], axis=-1)
    E = jnp.concatenate([top, bot], axis=-2)          # (..., 2J, 2J)
    b = jnp.concatenate([jnp.real(bs), jnp.imag(bs)], axis=-1)

    from jax.scipy.linalg import solve_triangular

    L = jnp.linalg.cholesky(E)
    y = solve_triangular(L, b[..., None], lower=True)
    x = solve_triangular(L.swapaxes(-1, -2), y, lower=False)[..., 0]
    J = Gs.shape[-1]
    return jax.lax.complex(x[..., :J], x[..., J:])


def gram_cholesky(G, rhs, jitter_scale: float = 0.0):
    """Solve G C = rhs for Hermitian positive (semi)definite G.

    G: (..., J, J); rhs: (..., J).  Column equilibration: D G D with
    D = diag(1/sqrt(diag G)) keeps the Cholesky well scaled across the
    wildly different column norms of overtone ladders.

    complex64 (the TPU path) is solved through the 2x2 real embedding;
    complex128 (CPU parity path) uses the native complex Cholesky.
    """
    J = G.shape[-1]
    diag = jnp.real(jnp.diagonal(G, axis1=-2, axis2=-1))
    # Auto-mask numerically dead columns (underflowed heavily-damped
    # modes) and floor the equilibrated spectrum -- the Gram-domain
    # analogue of lstsq's rcond truncation (see engine_real).
    # (1e3 eps)^2 threshold, same rationale as engine_real._equilibrated:
    # a finfo-tiny cut never fires before the equilibrated Gram turns to
    # rounding noise (non-PSD -> NaN Cholesky), on any hardware.
    dead = diag <= (jnp.max(diag, axis=-1, keepdims=True)
                    * (1e3 * jnp.finfo(rhs.real.dtype).eps) ** 2)
    kk = dead[..., :, None] | dead[..., None, :]
    eye = jnp.eye(J, dtype=G.dtype)
    G = jnp.where(kk, eye, G)
    rhs = jnp.where(dead, 0.0, rhs)
    diag = jnp.real(jnp.diagonal(G, axis1=-2, axis2=-1))

    d = jnp.sqrt(jnp.maximum(diag, jnp.finfo(rhs.real.dtype).tiny))
    Dinv = 1.0 / d
    Gs = G * Dinv[..., :, None] * Dinv[..., None, :]
    floor = jitter_scale if jitter_scale \
        else 500.0 * J * jnp.finfo(rhs.real.dtype).eps
    Gs = Gs + floor * eye
    bs = rhs * Dinv

    if G.dtype == jnp.complex64:
        return _solve_real_embedded(Gs, bs) * Dinv

    from jax.scipy.linalg import solve_triangular

    L = jnp.linalg.cholesky(Gs)
    y = solve_triangular(L, bs[..., None], lower=True)
    z = solve_triangular(L.conj().swapaxes(-1, -2), y,
                         lower=False)[..., 0]
    return z * Dinv


def qr_solve(a, d):
    """Least squares via reduced QR: a (..., K, J), d (..., K)."""
    Q, R = jnp.linalg.qr(a, mode="reduced")
    rhs = jnp.einsum("...kj,...k->...j", Q.conj(), d)
    return jnp.vectorize(
        lambda Rm, b: jnp.linalg.solve(Rm, b),
        signature="(j,j),(j)->(j)")(R, rhs)


def svd_lstsq(a, d):
    """Minimum-norm least squares via SVD (np.linalg.lstsq rcond=None
    analogue).  a (K, J), d (K,) -- unbatched (parity/debug path)."""
    return jnp.linalg.lstsq(a, d, rcond=None)[0]
