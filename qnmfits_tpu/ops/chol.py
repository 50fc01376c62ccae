"""Batch-vectorised small-matrix Cholesky solve, statically unrolled.

XLA's stock batched Cholesky/triangular-solve lowering dominates the
sweep runtime on the axon TPU backend (80% of the t0-sweep wall time for
(B, 32, 32) f64 batches).  For the small fixed sizes used here (2J <= 64)
a column-unrolled factorisation is far faster: every step is an
elementwise/matvec op over the whole batch (VPU work, no per-matrix
control flow), and the unroll is static so XLA fuses the lot.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["cholesky_solve_unrolled", "complex_cholesky_solve_unrolled",
           "complex_cholesky_factor", "complex_lower_inverse"]


def complex_cholesky_factor(Are, Aim):
    """Unbatched split-complex Cholesky factor: A + i Aim = L L^H.

    Are/Aim (n, n) with static small n; returns (Lre, Lim) lower
    triangular, real positive diagonal (Lim diagonal exactly zero).
    Scalar-unrolled (n^3/6 jaxpr ops) -- a one-time prep cost for hosts
    like the bordered free-omega sweep that factor a fixed block once
    and then apply it to many right-hand sides as matmuls.
    """
    n = Are.shape[0]
    zero = jnp.zeros((), Are.dtype)
    Lre = [[zero] * n for _ in range(n)]
    Lim = [[zero] * n for _ in range(n)]
    for j in range(n):
        s = Are[j, j]
        for k in range(j):
            s = s - (Lre[j][k] * Lre[j][k] + Lim[j][k] * Lim[j][k])
        d = jnp.sqrt(s)
        Lre[j][j] = d
        inv = 1.0 / d
        for i in range(j + 1, n):
            ar = Are[i, j]
            ai = Aim[i, j]
            for k in range(j):
                # L[i,k] * conj(L[j,k]).
                ar = ar - (Lre[i][k] * Lre[j][k] + Lim[i][k] * Lim[j][k])
                ai = ai - (Lim[i][k] * Lre[j][k] - Lre[i][k] * Lim[j][k])
            Lre[i][j] = ar * inv
            Lim[i][j] = ai * inv
    if n == 0:
        return (jnp.zeros((0, 0), Are.dtype), jnp.zeros((0, 0), Are.dtype))
    return (jnp.stack([jnp.stack(r) for r in Lre]),
            jnp.stack([jnp.stack(r) for r in Lim]))


def complex_lower_inverse(Lre, Lim):
    """Explicit inverse of an unbatched lower-triangular complex matrix
    (split form, real diagonal).  Forward substitution against the
    identity, scalar-unrolled; returns (Xre, Xim) lower triangular.

    Applying L^-1 (and L^-H) as matmuls to batched right-hand sides
    keeps the per-item error at ~cond(L) * eps = sqrt(cond(A)) * eps --
    the reason the bordered sweep stores triangular inverses rather
    than the Hermitian inverse (whose single-matmul application costs
    cond(A) * eps and loses the Schur-complement cancellation).
    """
    n = Lre.shape[0]
    zero = jnp.zeros((), Lre.dtype)
    Xre = [[zero] * n for _ in range(n)]
    Xim = [[zero] * n for _ in range(n)]
    for i in range(n):
        inv = 1.0 / Lre[i, i]
        for j in range(i + 1):
            ar = jnp.ones((), Lre.dtype) if i == j else zero
            ai = zero
            for k in range(j, i):
                # L[i,k] * X[k,j] (plain complex product).
                ar = ar - (Lre[i, k] * Xre[k][j] - Lim[i, k] * Xim[k][j])
                ai = ai - (Lre[i, k] * Xim[k][j] + Lim[i, k] * Xre[k][j])
            Xre[i][j] = ar * inv
            Xim[i][j] = ai * inv
    if n == 0:
        return (jnp.zeros((0, 0), Lre.dtype), jnp.zeros((0, 0), Lre.dtype))
    return (jnp.stack([jnp.stack(r) for r in Xre]),
            jnp.stack([jnp.stack(r) for r in Xim]))


def cholesky_solve_unrolled(E, b):
    """Solve E x = b for symmetric positive-definite E.

    E: (B, n, n) with static (small) n; b: (B, n).  Returns x (B, n).

    Left-looking Cholesky with static column unroll, then forward/back
    substitution, all vectorised over the batch axis.
    """
    B, n, _ = E.shape
    cols = []                       # L columns: cols[j] is (B, n-j)
    for j in range(n):
        s = E[:, j:, j]
        if j:
            # Subtract sum_{k<j} L[j:, k] * L[j, k].
            Lk = jnp.stack([cols[k][:, j - k:] for k in range(j)],
                           axis=-1)          # (B, n-j, j)
            ljk = jnp.stack([cols[k][:, j - k] for k in range(j)],
                            axis=-1)         # (B, j)
            s = s - jnp.einsum("bik,bk->bi", Lk, ljk)
        d = jnp.sqrt(s[:, 0])
        cols.append(s / d[:, None])

    # Forward substitution: L y = b.
    y = []
    for j in range(n):
        acc = b[:, j]
        if j:
            lj = jnp.stack([cols[k][:, j - k] for k in range(j)], axis=-1)
            acc = acc - jnp.einsum("bk,bk->b", lj,
                                   jnp.stack(y, axis=-1))
        y.append(acc / cols[j][:, 0])

    # Back substitution: L^T x = y.
    x = [None] * n
    for j in range(n - 1, -1, -1):
        acc = y[j]
        if j < n - 1:
            # L[i, j] for i > j is cols[j][:, i-j].
            lcol = cols[j][:, 1:]            # (B, n-1-j)
            xs = jnp.stack(x[j + 1:], axis=-1)
            acc = acc - jnp.einsum("bk,bk->b", lcol, xs)
        x[j] = acc / cols[j][:, 0]

    return jnp.stack(x, axis=-1)


def complex_cholesky_solve_unrolled(Gre, Gim, bre, bim):
    """Solve the Hermitian positive-definite system G x = b in
    split-complex form: G = Gre + i Gim (B, n, n), b = bre + i bim
    (B, n); returns (xre, xim) each (B, n).

    Complex LL^H Cholesky with static column unroll.  Versus embedding
    into the real 2n x 2n form this is 2x fewer flops and half the
    unrolled columns (4x less stacked-temporary HBM traffic) -- the
    batched solve is the dominant stage of the factored t0 sweep
    (scripts/perf_decompose.py; PERF.md).  The diagonal of L is real
    (Hermitian G), so every division/scale is by a real scalar.
    """
    B, n, _ = Gre.shape
    cre, cim = [], []               # L columns: cre[j]/cim[j] are (B, n-j)
    for j in range(n):
        sre = Gre[:, j:, j]
        sim = Gim[:, j:, j]
        if j:
            # Subtract sum_{k<j} L[j:, k] * conj(L[j, k]).
            Lre = jnp.stack([cre[k][:, j - k:] for k in range(j)], axis=-1)
            Lim = jnp.stack([cim[k][:, j - k:] for k in range(j)], axis=-1)
            lre = jnp.stack([cre[k][:, j - k] for k in range(j)], axis=-1)
            lim = jnp.stack([cim[k][:, j - k] for k in range(j)], axis=-1)
            # (a+ib)(c-id) = ac+bd + i(bc-ad), summed over k.
            sre = sre - jnp.einsum("bik,bk->bi", Lre, lre) \
                - jnp.einsum("bik,bk->bi", Lim, lim)
            sim = sim - jnp.einsum("bik,bk->bi", Lim, lre) \
                + jnp.einsum("bik,bk->bi", Lre, lim)
        d = jnp.sqrt(sre[:, 0])                       # L[j,j] real > 0
        inv = 1.0 / d
        cre.append(sre * inv[:, None])
        # L[j,j] imag is exactly 0 for Hermitian G; the [:, 0] slot of
        # cim[j] carries rounding noise but is never read below (every
        # consumer indexes at offset >= 1 or stacks over k < j).
        cim.append(sim * inv[:, None])

    # Forward substitution: L y = b.
    yre, yim = [], []
    for j in range(n):
        are = bre[:, j]
        aim = bim[:, j]
        if j:
            lre = jnp.stack([cre[k][:, j - k] for k in range(j)], axis=-1)
            lim = jnp.stack([cim[k][:, j - k] for k in range(j)], axis=-1)
            Yre = jnp.stack(yre, axis=-1)
            Yim = jnp.stack(yim, axis=-1)
            # L[j,k] * y_k (plain complex product).
            are = are - jnp.einsum("bk,bk->b", lre, Yre) \
                + jnp.einsum("bk,bk->b", lim, Yim)
            aim = aim - jnp.einsum("bk,bk->b", lre, Yim) \
                - jnp.einsum("bk,bk->b", lim, Yre)
        inv = 1.0 / cre[j][:, 0]
        yre.append(are * inv)
        yim.append(aim * inv)

    # Back substitution: L^H x = y, i.e. x_j uses conj(L[i,j]) for i>j.
    xre = [None] * n
    xim = [None] * n
    for j in range(n - 1, -1, -1):
        are = yre[j]
        aim = yim[j]
        if j < n - 1:
            lre = cre[j][:, 1:]                       # L[i,j], i>j
            lim = cim[j][:, 1:]
            Xre = jnp.stack(xre[j + 1:], axis=-1)
            Xim = jnp.stack(xim[j + 1:], axis=-1)
            # conj(L[i,j]) * x_i = (a-ib)(c+id) = ac+bd + i(ad-bc).
            are = are - jnp.einsum("bk,bk->b", lre, Xre) \
                - jnp.einsum("bk,bk->b", lim, Xim)
            aim = aim - jnp.einsum("bk,bk->b", lre, Xim) \
                + jnp.einsum("bk,bk->b", lim, Xre)
        inv = 1.0 / cre[j][:, 0]
        xre[j] = are * inv
        xim[j] = aim * inv

    return jnp.stack(xre, axis=-1), jnp.stack(xim, axis=-1)
