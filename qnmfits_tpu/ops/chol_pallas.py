"""Pallas TPU kernel: batched split-complex Hermitian Cholesky solve in
double-single (two-float32) arithmetic.

Why this exists: the batched J x J solve is the factored t0 sweep's
dominant stage, and under XLA's emulated f64 the unrolled Cholesky is
bound by stacked temporaries bouncing through HBM (PERF.md section
4c).  This kernel holds one batch tile entirely in VMEM and performs
the same left-looking complex Cholesky with explicit double-single
arithmetic (ops/ds.py) on f32 hardware -- one HBM read of the Gram
batch, one write of the solution, nothing in between.

Layout: the batch axis is the TPU *lane* dimension.  Arrays arrive as
(n, n, B) / (n, B) so every in-kernel slice is a well-tiled
(sublane, lane) 2D block; a (B, n, n) layout would put n (= 8-ish) in
the lane dimension and waste ~94% of every vector register.

Precision: double-single carries ~2^-48 unit roundoff -- the same as
XLA's own f64 emulation on TPU (both are hi+lo f32 pairs), verified
against native f64 in tests/test_ops.py.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ds import (ds_add, ds_from_f64, ds_mul, ds_rsqrt, ds_sub,
                 ds_to_f64)

__all__ = ["complex_cholesky_solve_ds", "pallas_solve_supported"]


def _solve_values(n, Arh, Arl, Aih, Ail, brh, brl, bih, bil):
    """The ds complex-Cholesky math on plain arrays ((n, n, B) / (n, B)
    float32 pairs).  Pure function: the Pallas kernel wraps it over VMEM
    refs, and the CPU tests call it eagerly (per-op execution keeps the
    error-free transformations intact -- see the note in _solver_fn)."""

    def A_re(sl, j):
        return (Arh[sl, j, :], Arl[sl, j, :])

    def A_im(sl, j):
        return (Aih[sl, j, :], Ail[sl, j, :])

    # -- factorization: left-looking, column j vectorized over (n-j, B)
    col_re = [None] * n          # col_re[j]: ds (n-j, B) = L[j:, j]
    col_im = [None] * n
    inv = [None] * n             # ds (1, B) = 1/L[j,j]
    for j in range(n):
        s_re = A_re(slice(j, n), j)
        s_im = A_im(slice(j, n), j)
        for k in range(j):
            off = j - k
            Lk_re = (col_re[k][0][off:, :], col_re[k][1][off:, :])
            Lk_im = (col_im[k][0][off:, :], col_im[k][1][off:, :])
            l_re = (col_re[k][0][off:off + 1, :],
                    col_re[k][1][off:off + 1, :])
            l_im = (col_im[k][0][off:off + 1, :],
                    col_im[k][1][off:off + 1, :])
            # s -= Lk * conj(l):  re += -(Lk_re l_re + Lk_im l_im)
            #                     im += -(Lk_im l_re - Lk_re l_im)
            s_re = ds_sub(s_re, ds_add(ds_mul(Lk_re, l_re),
                                       ds_mul(Lk_im, l_im)))
            s_im = ds_sub(s_im, ds_sub(ds_mul(Lk_im, l_re),
                                       ds_mul(Lk_re, l_im)))
        d = (s_re[0][0:1, :], s_re[1][0:1, :])
        r = ds_rsqrt(d)                        # 1/sqrt(diag), ds (1, B)
        inv[j] = r
        col_re[j] = ds_mul(s_re, r)
        col_im[j] = ds_mul(s_im, r)

    # -- forward substitution: L y = b
    y_re = [None] * n            # ds (1, B)
    y_im = [None] * n
    for j in range(n):
        a_re = (brh[j:j + 1, :], brl[j:j + 1, :])
        a_im = (bih[j:j + 1, :], bil[j:j + 1, :])
        for k in range(j):
            off = j - k
            l_re = (col_re[k][0][off:off + 1, :],
                    col_re[k][1][off:off + 1, :])
            l_im = (col_im[k][0][off:off + 1, :],
                    col_im[k][1][off:off + 1, :])
            # a -= L[j,k] * y_k
            a_re = ds_sub(a_re, ds_sub(ds_mul(l_re, y_re[k]),
                                       ds_mul(l_im, y_im[k])))
            a_im = ds_sub(a_im, ds_add(ds_mul(l_re, y_im[k]),
                                       ds_mul(l_im, y_re[k])))
        y_re[j] = ds_mul(a_re, inv[j])
        y_im[j] = ds_mul(a_im, inv[j])

    # -- back substitution: L^H x = y
    x_re = [None] * n
    x_im = [None] * n
    for j in range(n - 1, -1, -1):
        a_re, a_im = y_re[j], y_im[j]
        for i in range(j + 1, n):
            off = i - j
            l_re = (col_re[j][0][off:off + 1, :],
                    col_re[j][1][off:off + 1, :])
            l_im = (col_im[j][0][off:off + 1, :],
                    col_im[j][1][off:off + 1, :])
            # a -= conj(L[i,j]) * x_i
            a_re = ds_sub(a_re, ds_add(ds_mul(l_re, x_re[i]),
                                       ds_mul(l_im, x_im[i])))
            a_im = ds_sub(a_im, ds_sub(ds_mul(l_re, x_im[i]),
                                       ds_mul(l_im, x_re[i])))
        x_re[j] = ds_mul(a_re, inv[j])
        x_im[j] = ds_mul(a_im, inv[j])

    return (jnp.concatenate([x[0] for x in x_re], axis=0),
            jnp.concatenate([x[1] for x in x_re], axis=0),
            jnp.concatenate([x[0] for x in x_im], axis=0),
            jnp.concatenate([x[1] for x in x_im], axis=0))


def _kernel_body(n, refs):
    (Arh, Arl, Aih, Ail, brh, brl, bih, bil,
     xrh, xrl, xih, xil) = refs
    # Refs are passed through un-loaded: _solve_values slices lazily
    # (refs and arrays share the indexing syntax), so only the column
    # being worked on is materialized -- whole-block loads here blew
    # the VMEM scoped-allocation limit at tile=2048.
    rh, rl, ih, il = _solve_values(
        n, Arh, Arl, Aih, Ail, brh, brl, bih, bil)
    xrh[:, :] = rh
    xrl[:, :] = rl
    xih[:, :] = ih
    xil[:, :] = il


@lru_cache(maxsize=32)
def _solver_fn(n, tile, interpret, use_jit=True):
    def kernel(*refs):
        _kernel_body(n, refs)

    # Index maps must stay int32: with jax_enable_x64 the grid index
    # arrives as i64 and Mosaic fails to legalize the resulting
    # func.return (observed on the v5e plugin).
    def _i32(i):
        return jnp.asarray(i, jnp.int32)

    mat_spec = pl.BlockSpec((n, n, tile),
                            lambda i: (_i32(0), _i32(0), _i32(i)),
                            memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((n, tile), lambda i: (_i32(0), _i32(i)),
                            memory_space=pltpu.VMEM)

    def run(Arh, Arl, Aih, Ail, brh, brl, bih, bil):
        Bp = Arh.shape[-1]
        out_shape = [jax.ShapeDtypeStruct((n, Bp), jnp.float32)] * 4
        return pl.pallas_call(
            kernel,
            grid=(Bp // tile,),
            in_specs=[mat_spec] * 4 + [vec_spec] * 4,
            out_specs=[vec_spec] * 4,
            out_shape=out_shape,
            interpret=interpret,
        )(Arh, Arl, Aih, Ail, brh, brl, bih, bil)

    # Caveat for interpret mode: under jit, XLA:CPU's algebraic
    # simplifier (excess-precision rewrites) DESTROYS the error-free
    # transformations in ops/ds.py, degrading results to ~f32 accuracy.
    # Mosaic (the real TPU compile) performs no such rewrites -- full
    # ds accuracy measured on hardware (PERF.md).  Tests therefore run
    # interpret mode UNJITTED (eager per-op execution is EFT-safe).
    return jax.jit(run) if use_jit else run


def pallas_solve_supported(n: int) -> bool:
    """The unrolled ds kernel is compiled per (n, tile); very large n
    blows up Mosaic compile time, and tiny solves don't pay for the
    layout transposes.  The factored-sweep J range (<= 16) is the
    target."""
    return 2 <= n <= 16


def complex_cholesky_solve_ds(Gre, Gim, bre, bim, tile: int = 2048,
                              interpret: bool = False,
                              use_jit: bool = True):
    """Batched Hermitian solve on the Pallas double-single kernel.

    Gre/Gim (B, n, n) f64, bre/bim (B, n) f64 -> (xre, xim) (B, n) f64.
    The f64 <-> double-single conversion and the batch-to-lane
    transpose happen in XLA around the kernel (cheap elementwise).

    Signature-compatible with ops.chol.complex_cholesky_solve_unrolled,
    but deliberately NOT wired into the factored sweep: at the sweep's
    chunked batch sizes the fused XLA solve measures a tie (PERF.md
    section 4d), so this ships as a standalone component for workloads
    where the batched solve stands alone (standalone it is ~2x the XLA
    formulation).
    """
    B, n, _ = Gre.shape
    dtype = Gre.dtype
    pad = (-B) % tile
    if pad:
        eye = jnp.broadcast_to(jnp.eye(n, dtype=dtype), (pad, n, n))
        Gre = jnp.concatenate([Gre, eye], axis=0)
        Gim = jnp.concatenate([Gim, jnp.zeros((pad, n, n), dtype)], axis=0)
        bre = jnp.concatenate([bre, jnp.zeros((pad, n), dtype)], axis=0)
        bim = jnp.concatenate([bim, jnp.zeros((pad, n), dtype)], axis=0)

    args = []
    for M in (jnp.transpose(Gre, (1, 2, 0)), jnp.transpose(Gim, (1, 2, 0))):
        args.extend(ds_from_f64(M))
    for v in (bre.T, bim.T):
        args.extend(ds_from_f64(v))

    xrh, xrl, xih, xil = _solver_fn(n, tile, interpret, use_jit)(*args)
    xre = ds_to_f64((xrh, xrl), dtype).T
    xim = ds_to_f64((xih, xil), dtype).T
    return xre[:B], xim[:B]
