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

__all__ = ["cholesky_solve_unrolled"]


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
