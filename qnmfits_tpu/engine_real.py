"""Split-complex TPU fit engine: the real-arithmetic fast path.

The axon TPU backend supports real f32 compute and linear algebra fully,
but complex construction ops (lax.complex, f32->c64 converts) and several
complex elementwise/reduce lowerings are UNIMPLEMENTED.  This module
therefore expresses the entire ringdown fit in split-complex form: every
complex quantity z is carried as (Re z, Im z) pairs of real arrays, the
design-matrix Gram assembly becomes four real matmuls (pure MXU work),
and the J x J solve is a split-complex Hermitian Cholesky (real/imag
pairs, real diagonal).  No complex dtype ever touches the device.

This is also the honest "speed-of-light" formulation: XLA's own complex
arithmetic decomposes into exactly these real ops, minus the unsupported
conversion lowerings.

Numerics are identical to qnmfits_tpu.engine.fit_core (the complex-typed
CPU path); tests assert equality on CPU.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .ops.chol import (cholesky_solve_unrolled,
                       complex_cholesky_solve_unrolled)

__all__ = ["fit_core_real", "sweep_t0_real", "sweep_spectra_real",
           "split", "merge"]


def split(z):
    """Host-side complex -> (re, im) float arrays."""
    z = np.asarray(z)
    return np.ascontiguousarray(z.real), np.ascontiguousarray(z.imag)


def merge(re, im):
    """Host-side (re, im) -> complex numpy array."""
    return np.asarray(re) + 1j * np.asarray(im)


def _trapz_weights(times, w):
    dt = times[1:] - times[:-1]
    seg = w[:-1] * w[1:] * dt * 0.5
    zero = jnp.zeros((1,), dtype=seg.dtype)
    return jnp.concatenate([seg, zero]) + jnp.concatenate([zero, seg])


def _equilibrated(Gre, Gim, bre, bim):
    """Equilibrate, auto-mask numerically dead columns, floor.

    Batched: Gre/Gim (..., J, J), bre/bim (..., J).  Columns whose Gram
    diagonal underflows (heavily damped modes invisible in the window)
    are replaced by identity rows (amplitude exactly zero), and a
    machine-epsilon Tikhonov floor bounds the equilibrated condition
    number -- the Gram-domain analogue of np.linalg.lstsq's rcond
    truncation for kappa(A)^2 beyond Cholesky range.

    Returns (A, B, bre', bim', Di): the unit-diagonal complex Hermitian
    system A + iB with scaled rhs, and the diagonal unscaling Di.
    """
    J = Gre.shape[-1]
    diag = jnp.diagonal(Gre, axis1=-2, axis2=-1)
    eps = jnp.finfo(Gre.dtype).eps
    # Dead threshold: a column with diagonal ratio eta contributes
    # singular-value ratio sqrt(eta); below (1e3 eps)^2 it is beyond any
    # solver's resolution at this precision (np.linalg.lstsq rcond=None
    # truncates at (eps K)^2 ~ 2e-25, slightly above this).  A
    # finfo-tiny-based threshold would never fire on TPU, where "f64" is
    # double-single emulation whose effective epsilon (2^-49) and
    # exponent range are those of float32 -- leaving columns alive whose
    # equilibrated Gram is pure rounding noise (non-PSD -> NaN Cholesky,
    # measured at diag ratios < ~1e-30 on a v5e, scripts/perf_kernels.py
    # aftermath in PERF.md section 2).
    dead = diag <= (jnp.max(diag, axis=-1, keepdims=True)
                    * (1e3 * eps) ** 2)
    kk = dead[..., :, None] | dead[..., None, :]
    eye = jnp.eye(J, dtype=Gre.dtype)
    Gre = jnp.where(kk, eye, Gre)
    Gim = jnp.where(kk, 0.0, Gim)
    bre = jnp.where(dead, 0.0, bre)
    bim = jnp.where(dead, 0.0, bim)

    d = jnp.sqrt(jnp.maximum(jnp.diagonal(Gre, axis1=-2, axis2=-1),
                             jnp.finfo(Gre.dtype).tiny))
    Di = 1.0 / d
    A = Gre * Di[..., :, None] * Di[..., None, :]
    B = Gim * Di[..., :, None] * Di[..., None, :]
    floor = 500.0 * J * eps
    A = A + floor * eye
    return A, B, bre * Di, bim * Di, Di


def _regularised_embed(Gre, Gim, bre, bim):
    """Equilibrated system in the real 2x2 embedding (kept for the
    perf scripts and as the reference formulation; the shipped solve
    path is _regularised_solve)."""
    A, B, br, bi, Di = _equilibrated(Gre, Gim, bre, bim)
    top = jnp.concatenate([A, -B], axis=-1)
    bot = jnp.concatenate([B, A], axis=-1)
    E = jnp.concatenate([top, bot], axis=-2)
    b = jnp.concatenate([br, bi], axis=-1)
    return E, b, Di


def _regularised_solve(Gre, Gim, bre, bim):
    """Equilibrated Hermitian solve via split-complex Cholesky.

    Batched: Gre/Gim (B, J, J), bre/bim (B, J).  Returns (xre, xim).
    Identical regularisation semantics to the former 2Jx2J real
    embedding (the embedding duplicates the complex eigenvalues, so the
    diagonal floor acts identically), at 2x fewer flops and half the
    unrolled columns -- the batched solve is the factored sweep's
    dominant stage (PERF.md, scripts/perf_decompose.py).
    """
    A, B, br, bi, Di = _equilibrated(Gre, Gim, bre, bim)
    xre, xim = complex_cholesky_solve_unrolled(A, B, br, bi)
    return xre * Di, xim * Di


def _embedded_solve(Gre, Gim, bre, bim):
    """Unbatched (J,)-system wrapper around _regularised_solve."""
    xre, xim = _regularised_solve(Gre[None], Gim[None],
                                  bre[None], bim[None])
    return xre[0], xim[0]


def fit_core_real(times, dre, dim, wr, wi, mre, mim, t0, w,
                  col_mask=None, analytic: bool = False):
    """Weighted multimode least-squares fit, all-real arithmetic.

    times (K,); data = dre + i dim (I, K); omega = wr + i wi (J,);
    mu = mre + i mim (I, J); w (K,) {0,1} window weights.  Dtypes follow
    the inputs (float32 on TPU).

    analytic=True (uniform time grids only; callers gate on measured
    spacing) replaces both (K,J)^T(K,J) Gram assemblies with the
    closed-form geometric-series Grams (_analytic_gram_window) -- the
    data projections, solve and mismatch path are identical.

    Returns (Cre (J,), Cim (J,), mm scalar) -- same numerics as
    engine.fit_core.
    """
    tau = _trapz_weights(times, w)

    # phi = P + iQ = exp(-i omega (t - t0)).  The phase argument is
    # clamped by the window weight (exact for binary w): outside the
    # window the damped exponential grows backward in time and overflows
    # -- notably on TPU, where f64 is double-single emulation with
    # float32 exponent range.
    dt = (times[:, None] - t0) * w[:, None]
    E = jnp.exp(wi[None, :] * dt)
    ph = wr[None, :] * dt
    P = E * jnp.cos(ph)
    Q = -E * jnp.sin(ph)
    Pw = P * w[:, None]
    Qw = Q * w[:, None]

    if analytic:
        Gt_re, Gt_im, Gtau_re, Gtau_im = _analytic_gram_window(
            times, wr, wi, t0, w)
    else:
        # Gt = phi^H W phi  (w binary: w^2 = w).
        Gt_re = Pw.T @ Pw + Qw.T @ Qw
        Gt_im = Pw.T @ Qw - Qw.T @ Pw

    # Mmu = mu^H mu.
    M_re = mre.T @ mre + mim.T @ mim
    M_im = mre.T @ mim - mim.T @ mre

    # G = Mmu * Gt (elementwise complex product).
    G_re = M_re * Gt_re - M_im * Gt_im
    G_im = M_re * Gt_im + M_im * Gt_re

    # pd_ij = sum_k w_k conj(phi)_kj d_ik ; conj(phi) = P - iQ.
    dwre = dre * w[None, :]
    dwim = dim * w[None, :]
    pd_re = dwre @ Pw + dwim @ Qw          # (I, J)
    pd_im = dwim @ Pw - dwre @ Qw

    # rhs_j = sum_i conj(mu)_ij pd_ij.
    rhs_re = jnp.sum(mre * pd_re + mim * pd_im, axis=0)
    rhs_im = jnp.sum(mre * pd_im - mim * pd_re, axis=0)

    if col_mask is not None:
        keep = jnp.asarray(col_mask)
        kk = keep[:, None] & keep[None, :]
        eye = jnp.eye(G_re.shape[-1], dtype=G_re.dtype)
        G_re = jnp.where(kk, G_re, eye)
        G_im = jnp.where(kk, G_im, 0.0)
        rhs_re = jnp.where(keep, rhs_re, 0.0)
        rhs_im = jnp.where(keep, rhs_im, 0.0)

    Cre, Cim = _embedded_solve(G_re, G_im, rhs_re, rhs_im)

    # Mismatch pieces with trapezoid weights (tau-weighted data
    # projections always summed; the tau Gram is analytic when gated).
    Pt = P * tau[:, None]
    Qt = Q * tau[:, None]
    if not analytic:
        Gtau_re = Pt.T @ P + Qt.T @ Q
        Gtau_im = Pt.T @ Q - Qt.T @ P
    Gt2_re = M_re * Gtau_re - M_im * Gtau_im
    Gt2_im = M_re * Gtau_im + M_im * Gtau_re

    pdt_re = dre @ Pt + dim @ Qt
    pdt_im = dim @ Pt - dre @ Qt
    rt_re = jnp.sum(mre * pdt_re + mim * pdt_im, axis=0)
    rt_im = jnp.sum(mre * pdt_im - mim * pdt_re, axis=0)

    # num = Re sum_j C_j conj(rt_j).
    num = jnp.sum(Cre * rt_re + Cim * rt_im)
    # model_norm = Re C^H (Gtau C).
    GC_re = Gt2_re @ Cre - Gt2_im @ Cim
    GC_im = Gt2_re @ Cim + Gt2_im @ Cre
    model_norm = jnp.sum(Cre * GC_re + Cim * GC_im)
    data_norm = jnp.sum(tau[None, :] * (dre * dre + dim * dim))
    mm = 1.0 - num / jnp.sqrt(model_norm * data_norm)
    return Cre, Cim, mm


def sweep_t0_real(times, dre, dim, wr, wi, mre, mim, t0s, Ts,
                  col_mask=None, chunk: int = 64):
    """Batch of (t0, T) windows over the real fit core (t0_method='geq').

    Returns (Cre (B, J), Cim (B, J), mm (B,)).
    """
    def one(args):
        t0, T = args
        w = ((times >= t0) & (times < t0 + T)).astype(times.dtype)
        return fit_core_real(times, dre, dim, wr, wi, mre, mim, t0, w,
                             col_mask=col_mask)

    return jax.lax.map(one, (t0s, Ts), batch_size=chunk)


def sweep_t0_modesets_real(times, dre, dim, wrs, wis, mres, mims, t0s, Ts,
                           col_masks, chunk: int = 64):
    """t0 x mode-set sweep, all-real: the TPU benchmark kernel.

    wrs/wis (S, J); mres/mims (S, I, J); col_masks (S, J).
    Returns (Cre (S, B, J), Cim (S, B, J), mm (S, B)).
    """
    def per_set(args):
        wr, wi, mre, mim, mask = args
        return sweep_t0_real(times, dre, dim, wr, wi, mre, mim, t0s, Ts,
                             col_mask=mask, chunk=chunk)

    return jax.lax.map(per_set, (wrs, wis, mres, mims, col_masks),
                       batch_size=1)


def dynamic_fit_core_real(times, dre, dim, wr_t, wi_t, mre_t, mim_t, t0, w,
                          col_mask=None):
    """Time-dependent-spectrum fit, all-real arithmetic.

    Split-complex mirror of engine.dynamic_fit_core (reference design
    entries a^i_{kj} = mu^i_{kj}(t_k) exp(-i omega_{kj}(t_k) (t_k - t0)),
    qnmfits.py:438-444, 863-864): wr_t/wi_t (K, J), mre_t/mim_t (I, K, J),
    data (I, K), w (K,) {0,1}.  The per-sample mixing cannot be factored
    out of the design matrix, so the Gram contracts over the flattened
    (I*K) axis.  col_mask (J,) bool marks live columns for padded
    mode-set batching (dead columns become identity Gram rows with
    exactly-zero amplitudes, as in fit_core_real).  Returns
    (Cre (J,), Cim (J,), mm).
    """
    tau = _trapz_weights(times, w)
    dt = (times - t0) * w                                   # (K,)
    Ee = jnp.exp(wi_t * dt[:, None])                        # (K, J)
    ph = wr_t * dt[:, None]
    P = Ee * jnp.cos(ph)
    Q = -Ee * jnp.sin(ph)
    Ere = mre_t * P[None] - mim_t * Q[None]                 # (I, K, J)
    Eim = mre_t * Q[None] + mim_t * P[None]

    K, J = wr_t.shape
    I = dre.shape[0]
    wcol = w[None, :, None]
    Ewre = (Ere * wcol).reshape(I * K, J)
    Ewim = (Eim * wcol).reshape(I * K, J)
    G_re = Ewre.T @ Ewre + Ewim.T @ Ewim
    G_im = Ewre.T @ Ewim - Ewim.T @ Ewre
    dw_re = (dre * w[None, :]).reshape(I * K)
    dw_im = (dim * w[None, :]).reshape(I * K)
    rhs_re = Ewre.T @ dw_re + Ewim.T @ dw_im
    rhs_im = Ewre.T @ dw_im - Ewim.T @ dw_re

    if col_mask is not None:
        keep = jnp.asarray(col_mask)
        kk = keep[:, None] & keep[None, :]
        eye = jnp.eye(G_re.shape[-1], dtype=G_re.dtype)
        G_re = jnp.where(kk, G_re, eye)
        G_im = jnp.where(kk, G_im, 0.0)
        rhs_re = jnp.where(keep, rhs_re, 0.0)
        rhs_im = jnp.where(keep, rhs_im, 0.0)

    Cre, Cim = _embedded_solve(G_re, G_im, rhs_re, rhs_im)

    tcol = tau[None, :, None]
    Etre = (Ere * tcol).reshape(I * K, J)
    Etim = (Eim * tcol).reshape(I * K, J)
    Efre = Ere.reshape(I * K, J)
    Efim = Eim.reshape(I * K, J)
    Gt_re = Etre.T @ Efre + Etim.T @ Efim
    Gt_im = Etre.T @ Efim - Etim.T @ Efre
    d_re = dre.reshape(I * K)
    d_im = dim.reshape(I * K)
    rt_re = Etre.T @ d_re + Etim.T @ d_im
    rt_im = Etre.T @ d_im - Etim.T @ d_re

    num = jnp.sum(Cre * rt_re + Cim * rt_im)
    GC_re = Gt_re @ Cre - Gt_im @ Cim
    GC_im = Gt_re @ Cim + Gt_im @ Cre
    model_norm = jnp.sum(Cre * GC_re + Cim * GC_im)
    data_norm = jnp.sum(tau[None, :] * (dre * dre + dim * dim))
    mm = 1.0 - num / jnp.sqrt(model_norm * data_norm)
    return Cre, Cim, mm


def sweep_t0_dynamic_real(times, dre, dim, wr_t, wi_t, mre_t, mim_t,
                          t0s, Ts, t0_method: str = "geq",
                          chunk: int = 32):
    """Start-time sweep with a time-dependent spectrum, all-real (the
    TPU fast path for dynamic fits; reference loop qnmfits.py:1286-1299).

    Returns (Cre (B, J), Cim (B, J), mm (B,)).
    """
    from .ops.windows import window_closest, window_geq

    window = window_geq if t0_method == "geq" else window_closest

    def one(args):
        t0, T = args
        w = window(times, t0, T).astype(times.dtype)
        return dynamic_fit_core_real(times, dre, dim, wr_t, wi_t,
                                     mre_t, mim_t, t0, w)

    return jax.lax.map(one, (t0s, Ts), batch_size=chunk)


def sweep_t0_modesets_dynamic_real(times, dre, dim, wr_ts, wi_ts, mre_ts,
                                   mim_ts, t0s, Ts, col_masks,
                                   t0_method: str = "geq",
                                   chunk: int = 32):
    """t0 x mode-set sweep with TIME-DEPENDENT spectra, all-real: the
    split-complex mirror of batched._t0_sweep_modesets_dynamic_fn (the
    reference loop qnmfits.py:1286-1299 x sets with (Mf(t), chif(t))
    tracks) -- TPU-safe, so it can shard over a device mesh.

    wr_ts/wi_ts (S, K, J); mre_ts/mim_ts (S, I, K, J); col_masks (S, J).
    Returns (Cre (S, B, J), Cim (S, B, J), mm (S, B)).
    """
    from .ops.windows import window_closest, window_geq

    window = window_geq if t0_method == "geq" else window_closest

    def per_set(args):
        wr_t, wi_t, mre_t, mim_t, mask = args

        def one(targs):
            t0, T = targs
            w = window(times, t0, T).astype(times.dtype)
            return dynamic_fit_core_real(times, dre, dim, wr_t, wi_t,
                                         mre_t, mim_t, t0, w,
                                         col_mask=mask)

        return jax.lax.map(one, (t0s, Ts), batch_size=chunk)

    return jax.lax.map(per_set, (wr_ts, wi_ts, mre_ts, mim_ts, col_masks),
                       batch_size=1)


def sweep_spectra_real(times, dre, dim, wrs, wis, mres, mims, t0, w,
                       col_mask=None, chunk: int = 64,
                       analytic: bool = False):
    """Spectrum-batched fit sweep with a FIXED window: the TPU kernel
    behind the (Mf, chif) and free-frequency grid hot loops (reference
    qnmfits.py:1304-1415, 1679-1827 -- one lstsq per grid point there).

    wrs/wis (Q, J), mres/mims (Q, I, J): one spectrum per grid point;
    times (K,), data (I, K), t0 scalar, w (K,) {0,1} shared.  The t0
    factoring does not apply (omega varies per item), so each item is a
    full Gram assembly -- batched into MXU matmuls by vmap, chunked with
    lax.map to bound the (chunk, K, J) phase arrays in HBM.

    analytic=True (uniform time grids only; the batched layer gates on
    measured spacing) swaps each item's Gram assemblies -- the dominant
    per-item cost, PERF.md section 10 -- for the closed-form
    geometric-series Grams; 'geq' AND 'closest' windows are exact
    (_analytic_gram_window derives the start from the indicator).

    Returns (Cre (Q, J), Cim (Q, J), mm (Q,)).
    """
    def one(args):
        wr, wi, mre, mim = args
        return fit_core_real(times, dre, dim, wr, wi, mre, mim, t0, w,
                             col_mask=col_mask, analytic=analytic)

    return jax.lax.map(one, (wrs, wis, mres, mims), batch_size=chunk)


def sweep_spectra_stacked_real(times, dre, dim, wrs, wis, mres, mims,
                               t0, chunk: int = 64):
    """Stacked spectrum-batched sweep on a PRE-SLICED contiguous window
    (uniform grid): the round-5 analytic grid kernel (PERF.md 26).

    The caller slices times/data to the in-window samples (every
    quantity below is a window sum, so the slice is exact) and this
    kernel restructures sweep_spectra_real around the window being
    SHARED by all Q items (reference hot loops qnmfits.py:1304-1415,
    1679-1827 share one window too):

      * window constants hoisted out of the item loop: trapezoid
        weights, weighted data rows, the data norm, the (s, m) window
        scalars -- the shipped kernel recomputed each per item;
      * the data rows are pre-windowed, so the projections need no
        Pw/Qw copies of the phase arrays (w^2 = w) and the 8 per-item
        projection matmuls fuse into TWO (4I, K) @ (K, J) products;
      * closed-form Grams for the WHOLE grid in one vectorized
        geometric-series evaluation over (Q, J, J) -- K-independent;
      * ONE whole-grid equilibrated solve + mismatch epilogue (the
        64-lane per-chunk solves underfilled the VPU, PERF.md 24).

    Amplitudes are anchored at t0 (phi = exp(-i w (t - t0))), same as
    fit_core_real.  Returns (Cre (Q, J), Cim (Q, J), mm (Q,)).
    """
    K = times.shape[0]
    tau = _trapz_weights(times, jnp.ones((K,), times.dtype))
    dwre = dre                                  # pre-windowed by slice
    dwim = dim
    dtr = dre * tau[None, :]
    dti = dim * tau[None, :]
    Dstack = jnp.concatenate([dwre, dwim, dtr, dti], axis=0)  # (4I, K)
    dnorm = jnp.sum(tau[None, :] * (dre * dre + dim * dim))
    dt = times - t0                                           # (K,)
    I = dre.shape[0]

    # Whole-grid closed-form Grams.
    s_w = times[0] - t0
    nu_re = wis[:, :, None] + wis[:, None, :]                 # (Q, J, J)
    nu_im = wrs[:, :, None] - wrs[:, None, :]
    Gt_re, Gt_im, Gtau_re, Gtau_im = _geom_series_eval(
        _fitted_step(times), K, nu_re, nu_im, s_w,
        jnp.asarray(K, jnp.int32))

    # Chunked phases + fused projections (the only K-sized stage).
    def proj_chunk(x):
        wr, wi = x
        E = jnp.exp(wi[None, :] * dt[:, None])
        ph = wr[None, :] * dt[:, None]
        P = E * jnp.cos(ph)                                   # (K, J)
        Qm = -E * jnp.sin(ph)
        DP = Dstack @ P                                       # (4I, J)
        DQ = Dstack @ Qm
        pd_re = DP[:I] + DQ[I:2 * I]
        pd_im = DP[I:2 * I] - DQ[:I]
        pdt_re = DP[2 * I:3 * I] + DQ[3 * I:]
        pdt_im = DP[3 * I:] - DQ[2 * I:3 * I]
        return pd_re, pd_im, pdt_re, pdt_im

    pd_re, pd_im, pdt_re, pdt_im = jax.lax.map(
        proj_chunk, (wrs, wis), batch_size=chunk)             # (Q, I, J)

    # Mixing contraction, whole-grid solve, mismatch.
    M_re = jnp.einsum("qij,qik->qjk", mres, mres) \
        + jnp.einsum("qij,qik->qjk", mims, mims)
    M_im = jnp.einsum("qij,qik->qjk", mres, mims) \
        - jnp.einsum("qij,qik->qjk", mims, mres)
    G_re = M_re * Gt_re - M_im * Gt_im
    G_im = M_re * Gt_im + M_im * Gt_re
    G2_re = M_re * Gtau_re - M_im * Gtau_im
    G2_im = M_re * Gtau_im + M_im * Gtau_re
    rhs_re = jnp.einsum("qij,qij->qj", mres, pd_re) \
        + jnp.einsum("qij,qij->qj", mims, pd_im)
    rhs_im = jnp.einsum("qij,qij->qj", mres, pd_im) \
        - jnp.einsum("qij,qij->qj", mims, pd_re)
    rt_re = jnp.einsum("qij,qij->qj", mres, pdt_re) \
        + jnp.einsum("qij,qij->qj", mims, pdt_im)
    rt_im = jnp.einsum("qij,qij->qj", mres, pdt_im) \
        - jnp.einsum("qij,qij->qj", mims, pdt_re)

    Cre, Cim = _regularised_solve(G_re, G_im, rhs_re, rhs_im)
    num = jnp.sum(Cre * rt_re + Cim * rt_im, axis=-1)
    GC_re = jnp.einsum("qjl,ql->qj", G2_re, Cre) \
        - jnp.einsum("qjl,ql->qj", G2_im, Cim)
    GC_im = jnp.einsum("qjl,ql->qj", G2_re, Cim) \
        + jnp.einsum("qjl,ql->qj", G2_im, Cre)
    model_norm = jnp.sum(Cre * GC_re + Cim * GC_im, axis=-1)
    mm = 1.0 - num / jnp.sqrt(model_norm * dnorm)
    return Cre, Cim, mm


# ---------------------------------------------------------------------------
# Factored t0 sweep: the throughput kernel
# ---------------------------------------------------------------------------
#
# For a start-time sweep the design matrix factorises:
#     phi_b = phi0 . diag(f_b),   phi0 = exp(-i omega (t - tref)),
#     f_b   = exp(i omega (t0_b - tref)),
# so the least-squares solution in the phi0 basis is C0_b, and the
# reported amplitudes are C_b = C0_b * exp(-i omega delta_b) -- the model
# and the mismatch are invariant under the diagonal phase.  Per chunk of
# start times the transcendentals are computed ONCE (K*J instead of
# B*K*J), and the per-window Gram assembly becomes one
# (B, K) @ (K, J^2) real matmul -- large MXU tiles instead of B tiny
# (K,J)^T(K,J) products.
#
# Overflow discipline (TPU f64 is double-single with float32 exponent
# range): rows with t < tref are clamped to dt=0; they are outside every
# window in the chunk (t0_b >= tref), so their weights are zero and the
# clamp is exact.

def _analytic_grams(times, wr, wi, t0c, a, m):
    """Closed-form window Grams on a UNIFORM time grid (geq windows).

    Each Gram entry sums a geometric series: with
    nu_jl = i(conj(w_j) - w_l) and z = e^{nu dlt},

        Gt[b,j,l] = e^{nu (t_a(b) - tref)} (z^{m_b} - 1)/(z - 1),

    where t_a(b) is the first in-window sample and m_b the sample
    count; the trapezoid Gram subtracts half the two edge terms.  The
    caller guarantees uniform spacing.  z^{m_b} - 1 uses the expm1-form
    u(z^p) = z^p - 1 with u(z^{2p}) = u^2 + 2u and
    u(z^{p+q}) = u_p u_q + u_p + u_q (bit decomposition of the sample
    count) -- no absolute-1 cancellation; the leading factor is a
    direct complex exp (it needs relative precision at tiny
    magnitudes).  The whole Gram stage is O(Bc J^2 log K) multiplies
    plus 3 transcendental (Bc, J, J) arrays, instead of the
    (Bc, K) @ (K, J^2) matmuls of the summation path.  Every
    intermediate magnitude is <= 1 (damped modes, t_a >= tref), inside
    the float32 exponent range of the TPU's double-single f64.
    Validated to ~3e-16 relative vs direct summation
    (scripts/proto_analytic_gram2.py).

    Returns (Gt_re, Gt_im, Gtau_re, Gtau_im), each (Bc, J, J).
    """
    K = times.shape[0]
    tref = t0c[0]

    # a: (Bc,) first in-window index; m: (Bc,) sample count.  The sole
    # caller (_chunk_sweep_factored) derives both from its geq window
    # weights -- a 'closest'-style a combined with a mismatched m would
    # be silently wrong, so they are required together.
    # Window starts GATHERED from the actual grid (reconstructing them
    # as times[0] + a*dlt would drift by a * (step error): a grid that
    # just passes the _uniform_spacing gate could then exceed the
    # 1e-11 parity bar at the far end).  s >= 0 whenever tref lies
    # inside the grid; the clamp only guards pathological all-empty
    # chunks (t0 beyond the last sample), where m = 0 zeroes the Gram
    # anyway -- without it exp could overflow to inf and poison that
    # zero with NaN.
    s_b = jnp.maximum(
        jnp.take(jnp.asarray(times), jnp.clip(a, 0, K - 1)) - tref, 0.0)
    return _geom_grams_core(_fitted_step(times), K, wr, wi, s_b, m)


def _fitted_step(times):
    """The least-drift uniform step (t[-1] - t[0])/(K - 1): the step of
    the ideal grid `_uniform_spacing` certified, so the geometric
    factor's per-sample error stays at the gate tolerance instead of
    K times the first-step error."""
    return (times[-1] - times[0]) / (times.shape[0] - 1)


def _window_scalars(times, w, t0):
    """(s, m) for ONE window from its indicator: offset of the first
    in-window sample from t0 (gathered from the actual grid) and the
    sample count.  Exact for 'geq' AND 'closest' windows (the first
    sample may precede t0 by up to dlt/2)."""
    K = times.shape[0]
    wint = (w > 0.5).astype(jnp.int32)
    m = jnp.sum(wint)
    a = jnp.sum(jnp.cumsum(wint) == 0)                    # leading zeros
    t_first = jnp.take(jnp.asarray(times), jnp.clip(a, 0, K - 1))
    s = jnp.where(m > 0, t_first - t0, 0.0)
    return s, m


def _geom_grams_core(dlt, K, wr, wi, s_b, m,
                     edge_first=None, edge_last=None):
    """Pairwise-mode closed-form Grams: windows of m[b] consecutive
    samples on a uniform grid (spacing dlt) whose first sample sits at
    offset s_b[b] from the basis reference time.  This is the ONE site
    that fixes the Gram orientation convention (nu from the
    conj(phi_j) phi_l inner product); time-sharded callers pass
    edge_first/edge_last (see _geom_series_eval) for partial-window
    shards.  Returns (Gt_re, Gt_im, Gtau_re, Gtau_im), each (Bc, J, J).
    """
    nu_re = wi[:, None] + wi[None, :]                     # (J, J)
    nu_im = wr[:, None] - wr[None, :]
    return _geom_series_eval(dlt, K, nu_re[None], nu_im[None],
                             s_b[:, None, None], m[:, None, None],
                             edge_first=edge_first, edge_last=edge_last)


def _geom_series_eval(dlt, K, nu_re, nu_im, s, m,
                      edge_first=None, edge_last=None):
    """Closed-form windowed exponential sums for ARBITRARY nu arrays.

    With z = e^{nu dlt},

        Gt = e^{nu s} (z^m - 1)/(z - 1)

    (the sum of m consecutive samples of e^{nu t} starting at offset s
    from the basis reference), and Gtau the trapezoid-weighted sum
    dlt*(Gt - (first + last terms)/2).  nu_re/nu_im are arrays of any
    shape; s (float) and m (integer) broadcast against them.  K bounds
    the admissible m (sets the bit count of the power decomposition).

    edge_first/edge_last (broadcastable, default 1) multiply the two
    half-weight edge subtractions of Gtau: a TIME-SHARDED caller whose
    local range covers only part of a window passes 0 for an edge that
    is a shard boundary (full trapezoid weight there; the psum over
    shards then reproduces the global trapezoid sum exactly).

    Returns (Gt_re, Gt_im, Gtau_re, Gtau_im), each of the broadcast
    shape.
    """
    dtype = nu_re.dtype
    nbits = max(1, int(np.ceil(np.log2(K + 1))))

    # u(z) = e^{nu dlt} - 1 via complex expm1 (small argument).
    ex = jnp.exp(nu_re * dlt)
    den_re = (jnp.expm1(nu_re * dlt)
              - 2.0 * ex * jnp.sin(nu_im * dlt * 0.5) ** 2)
    den_im = ex * jnp.sin(nu_im * dlt)

    # Leading factor F = e^{nu s} multiplies EVERY term of its Gram
    # entry, so it needs full RELATIVE precision even when tiny (fast
    # modes deep into a chunk: |F| ~ e^{-2|Im w| chunk-span}); a u-form
    # reconstruction z^n = u + 1 would bottom out at absolute eps.
    # Direct exp keeps eps-relative accuracy at any magnitude.
    arg_re = nu_re * s
    arg_im = nu_im * s
    e0 = jnp.exp(arg_re)
    F_re = e0 * jnp.cos(arg_im)
    F_im = e0 * jnp.sin(arg_im)

    # u(z^m) by bit decomposition of the sample count m; here u ~ -1
    # (decayed windows) only ever feeds z^m - 1 itself, where absolute
    # eps IS relative eps.
    shape = jnp.broadcast_shapes(nu_re.shape, nu_im.shape,
                                 np.shape(s), np.shape(m))
    usq_re, usq_im = (jnp.broadcast_to(den_re, shape),
                      jnp.broadcast_to(den_im, shape))    # u(z^{2^i})
    um_re = jnp.zeros(shape, dtype)
    um_im = jnp.zeros(shape, dtype)
    for i in range(nbits):
        # where (not bm-multiply): for GROWING modes (nu_re > 0, e.g. a
        # free-frequency scan crossing Im omega = 0) a ladder level
        # above m's top bit can overflow to inf, and 0*inf would poison
        # um with NaN even though the consumed levels are all finite
        # (z^m itself is bounded by the summation path's largest term).
        bit = ((m >> i) & 1) > 0
        cm_re = um_re * usq_re - um_im * usq_im + usq_re
        cm_im = um_re * usq_im + um_im * usq_re + usq_im
        um_re = um_re + jnp.where(bit, cm_re, 0.0)
        um_im = um_im + jnp.where(bit, cm_im, 0.0)
        if i < nbits - 1:                        # last level never squared
            usq_re, usq_im = (
                usq_re * usq_re - usq_im * usq_im + 2.0 * usq_re,
                2.0 * usq_re * usq_im + 2.0 * usq_im)

    # Geometric sum S_m = u(z^m)/u(z); nu == 0 (padded columns and their
    # diagonal) has the exact limit S_m = m.
    den2 = den_re * den_re + den_im * den_im
    safe = den2 > 0
    dsr = jnp.where(safe, den_re, 1.0)
    dsi = jnp.where(safe, den_im, 0.0)
    d2s = dsr * dsr + dsi * dsi
    S_re = (um_re * dsr + um_im * dsi) / d2s
    S_im = (um_im * dsr - um_re * dsi) / d2s
    mf = (m * jnp.ones(shape, jnp.int32)).astype(dtype)
    S_re = jnp.where(safe, S_re, mf)
    S_im = jnp.where(safe, S_im, 0.0)

    Gt_re = F_re * S_re - F_im * S_im
    Gt_im = F_re * S_im + F_im * S_re

    # Trapezoid Gram: dlt * (Gt - (term_first + term_last)/2), the last
    # term being F z^{m-1} = F (u(z^m)+1)/z.
    zm_re, zm_im = um_re + 1.0, um_im
    z_re, z_im = den_re + 1.0, den_im
    z2 = z_re * z_re + z_im * z_im
    zb_re = (zm_re * z_re + zm_im * z_im) / z2
    zb_im = (zm_im * z_re - zm_re * z_im) / z2
    tb_re = F_re * zb_re - F_im * zb_im
    tb_im = F_re * zb_im + F_im * zb_re
    nonempty = (m > 0).astype(dtype) * jnp.ones(shape, dtype)
    ef = 1.0 if edge_first is None else edge_first
    el = 1.0 if edge_last is None else edge_last
    Gtau_re = dlt * (Gt_re - 0.5 * (ef * F_re + el * tb_re)) * nonempty
    Gtau_im = dlt * (Gt_im - 0.5 * (ef * F_im + el * tb_im)) * nonempty
    return Gt_re, Gt_im, Gtau_re, Gtau_im


def _analytic_gram_window(times, wr, wi, t0, w):
    """Closed-form Grams for ONE window on a uniform grid in the
    t0-referenced basis of fit_core_real (phi = exp(-i w (t - t0))).

    Unlike _analytic_grams (factored t0 sweep, geq windows sorted by
    start time), the window start is derived from the indicator `w`
    itself, so 'closest' windows whose first sample precedes t0 by up
    to dlt/2 are exact too (|F| <= e^{|nu| dlt/2} ~ 1 there -- no
    overflow risk).  Returns (Gt_re, Gt_im, Gtau_re, Gtau_im), (J, J).
    """
    s, m = _window_scalars(times, w, t0)
    Gt_re, Gt_im, Gtau_re, Gtau_im = _geom_grams_core(
        _fitted_step(times), times.shape[0], wr, wi, s[None], m[None])
    return Gt_re[0], Gt_im[0], Gtau_re[0], Gtau_im[0]


def _chunk_sweep_factored(times, dre, dim, wr, wi, mre, mim, t0c, Tc,
                          col_mask, analytic: bool = False):
    """One chunk of start times, factored form.  t0c/Tc (Bc,).

    analytic=True (uniform time grids only; the batched layer gates on
    measured spacing) replaces the Gram-stage matmuls with the
    closed-form geometric-series Grams of _analytic_grams -- the data
    projections, solve and mismatch path are identical.
    """
    K = times.shape[0]
    J = wr.shape[0]
    I = dre.shape[0]
    tref = t0c[0]

    dt0 = jnp.maximum(times - tref, 0.0)                 # (K,)
    E = jnp.exp(wi[None, :] * dt0[:, None])
    ph = wr[None, :] * dt0[:, None]
    P0 = E * jnp.cos(ph)                                  # (K, J)
    Q0 = -E * jnp.sin(ph)

    # Data projections R = conj(phi0)^T d pieces, flattened (K, I*J).
    R1 = (P0[:, None, :] * dre.T[:, :, None]
          + Q0[:, None, :] * dim.T[:, :, None]).reshape(K, I * J)
    R2 = (P0[:, None, :] * dim.T[:, :, None]
          - Q0[:, None, :] * dre.T[:, :, None]).reshape(K, I * J)

    # Window indicators for every start time in the chunk (the
    # trapezoid weight matrix is only materialised on the summation
    # path; the analytic path replaces every Tau contraction).
    W = ((times[None, :] >= t0c[:, None])
         & (times[None, :] < (t0c + Tc)[:, None])).astype(times.dtype)
    if not analytic:
        dts = times[1:] - times[:-1]
        seg = W[:, :-1] * W[:, 1:] * dts[None, :] * 0.5
        zero = jnp.zeros((W.shape[0], 1), dtype=W.dtype)
        Tau = (jnp.concatenate([seg, zero], axis=1)
               + jnp.concatenate([zero, seg], axis=1))   # (Bc, K)

    if analytic:
        a_w = jnp.sum((times[None, :] < t0c[:, None]).astype(jnp.int32),
                      axis=1)
        m_w = jnp.sum(W.astype(jnp.int32), axis=1)
        Gt_re, Gt_im, Gtau_re, Gtau_im = _analytic_grams(
            times, wr, wi, t0c, a_w, m_w)
        # Trapezoid projections from the window-sum projections: on a
        # uniform grid with contiguous windows, Tau = dlt*W minus
        # (dlt/2) at the two window-edge samples, so Tau @ R =
        # dlt*(W @ R) - (dlt/2)*(R[first] + R[last]) -- two row gathers
        # instead of a second (Bc, K) @ (K, .) matmul.
        S2 = jnp.sum(dre * dre + dim * dim, axis=0)       # (K,)
        R = jnp.concatenate([R1, R2, S2[:, None]], axis=1)
        WR = W @ R                                        # (Bc, 2IJ+1)
        e_w = jnp.clip(a_w + m_w - 1, 0, K - 1)
        a_w = jnp.clip(a_w, 0, K - 1)
        dlt = _fitted_step(times)
        nonempty = (m_w > 0).astype(W.dtype)[:, None]
        TR = (dlt * WR - 0.5 * dlt * (R[a_w] + R[e_w])) * nonempty
        pd_re = WR[:, :I * J].reshape(-1, I, J)
        pd_im = WR[:, I * J:2 * I * J].reshape(-1, I, J)
        pdt_re = TR[:, :I * J].reshape(-1, I, J)
        pdt_im = TR[:, I * J:2 * I * J].reshape(-1, I, J)
        dnorm = TR[:, -1]
    else:
        # Pairwise products conj(phi0)_j phi0_l: A1 + i A2, (K, J*J).
        A1 = (P0[:, :, None] * P0[:, None, :]
              + Q0[:, :, None] * Q0[:, None, :]).reshape(K, J * J)
        A2 = (P0[:, :, None] * Q0[:, None, :]
              - Q0[:, :, None] * P0[:, None, :]).reshape(K, J * J)
        # Gram sums for all windows at once: (Bc, K) @ (K, .).
        Gt_re = (W @ A1).reshape(-1, J, J)
        Gt_im = (W @ A2).reshape(-1, J, J)
        Gtau_re = (Tau @ A1).reshape(-1, J, J)
        Gtau_im = (Tau @ A2).reshape(-1, J, J)

        pd_re = (W @ R1).reshape(-1, I, J)
        pd_im = (W @ R2).reshape(-1, I, J)
        pdt_re = (Tau @ R1).reshape(-1, I, J)
        pdt_im = (Tau @ R2).reshape(-1, I, J)
        dnorm = Tau @ jnp.sum(dre * dre + dim * dim, axis=0)   # (Bc,)

    # Mixing factor (shared).
    M_re = mre.T @ mre + mim.T @ mim
    M_im = mre.T @ mim - mim.T @ mre
    G_re = M_re[None] * Gt_re - M_im[None] * Gt_im
    G_im = M_re[None] * Gt_im + M_im[None] * Gt_re
    G2_re = M_re[None] * Gtau_re - M_im[None] * Gtau_im
    G2_im = M_re[None] * Gtau_im + M_im[None] * Gtau_re

    rhs_re = jnp.einsum("ij,bij->bj", mre, pd_re) \
        + jnp.einsum("ij,bij->bj", mim, pd_im)
    rhs_im = jnp.einsum("ij,bij->bj", mre, pd_im) \
        - jnp.einsum("ij,bij->bj", mim, pd_re)
    rt_re = jnp.einsum("ij,bij->bj", mre, pdt_re) \
        + jnp.einsum("ij,bij->bj", mim, pdt_im)
    rt_im = jnp.einsum("ij,bij->bj", mre, pdt_im) \
        - jnp.einsum("ij,bij->bj", mim, pdt_re)

    if col_mask is not None:
        keep = jnp.asarray(col_mask)
        kk = (keep[:, None] & keep[None, :])[None]
        eye = jnp.eye(J, dtype=G_re.dtype)[None]
        G_re = jnp.where(kk, G_re, eye)
        G_im = jnp.where(kk, G_im, 0.0)
        rhs_re = jnp.where(keep[None], rhs_re, 0.0)
        rhs_im = jnp.where(keep[None], rhs_im, 0.0)

    # Batched equilibrated real-embedded solve.
    C0re, C0im = _regularised_solve(G_re, G_im, rhs_re, rhs_im)

    # Mismatch (phase-invariant; uses the phi0-basis quantities).
    num = jnp.sum(C0re * rt_re + C0im * rt_im, axis=-1)
    GC_re = jnp.einsum("bjl,bl->bj", G2_re, C0re) \
        - jnp.einsum("bjl,bl->bj", G2_im, C0im)
    GC_im = jnp.einsum("bjl,bl->bj", G2_re, C0im) \
        + jnp.einsum("bjl,bl->bj", G2_im, C0re)
    model_norm = jnp.sum(C0re * GC_re + C0im * GC_im, axis=-1)
    mm = 1.0 - num / jnp.sqrt(model_norm * dnorm)

    # Report amplitudes w.r.t. t0: C_b = C0_b * exp(-i omega delta_b),
    # magnitude e^{wi delta} <= 1 (no overflow).
    delta = (t0c - tref)[:, None]
    g = jnp.exp(wi[None, :] * delta)
    cph = jnp.cos(wr[None, :] * delta)
    sph = jnp.sin(wr[None, :] * delta)
    Cre = g * (C0re * cph + C0im * sph)
    Cim = g * (C0im * cph - C0re * sph)
    return Cre, Cim, mm


def sweep_t0_factored_real(times, dre, dim, wr, wi, mre, mim, t0s, Ts,
                           col_mask=None, chunk: int = 64,
                           analytic: bool = False):
    """Factored t0 sweep (geq windows); t0s must be sorted ascending.

    analytic=True: closed-form Grams (uniform time grids only -- see
    _analytic_grams; callers gate on measured spacing).

    Returns (Cre (B, J), Cim (B, J), mm (B,)).
    """
    def one_chunk(args):
        t0c, Tc = args
        return _chunk_sweep_factored(times, dre, dim, wr, wi, mre, mim,
                                     t0c, Tc, col_mask, analytic=analytic)

    B = t0s.shape[0]
    pad = (-B) % chunk
    if pad:
        t0s = jnp.concatenate([t0s, jnp.full(pad, t0s[-1], t0s.dtype)])
        Ts = jnp.concatenate([Ts, jnp.full(pad, Ts[-1], Ts.dtype)])
    nc = t0s.shape[0] // chunk
    Cre, Cim, mm = jax.lax.map(
        one_chunk, (t0s.reshape(nc, chunk), Ts.reshape(nc, chunk)))
    J = wr.shape[0]
    return (Cre.reshape(-1, J)[:B], Cim.reshape(-1, J)[:B],
            mm.reshape(-1)[:B])


def sweep_t0_modesets_factored_real(times, dre, dim, wrs, wis, mres, mims,
                                    t0s, Ts, col_masks, chunk: int = 64,
                                    set_chunk: int | None = None,
                                    analytic: bool = False):
    """t0 x mode-set sweep on the factored kernel, mode sets VMAPPED.

    Serialising the mode-set axis (lax.map batch_size=1) leaves the MXU
    idle between the small per-set programs; vmapping it batches the
    (Bc, K) @ (K, J^2) Gram matmuls across sets into one large
    contraction (measured ~1.9x on a v5e, scripts/perf_kernels.py).
    ``set_chunk`` bounds the vmapped working set for very large S
    (default: all sets at once).
    """
    def per_set(wr, wi, mre, mim, mask):
        return sweep_t0_factored_real(times, dre, dim, wr, wi, mre, mim,
                                      t0s, Ts, col_mask=mask, chunk=chunk,
                                      analytic=analytic)

    if set_chunk is None:
        return jax.vmap(per_set)(wrs, wis, mres, mims, col_masks)
    return jax.lax.map(lambda a: per_set(*a),
                       (wrs, wis, mres, mims, col_masks),
                       batch_size=set_chunk)


# ---------------------------------------------------------------------------
# Suffix-sum t0 sweep: O(J^2) per window instead of O(K J^2)
# ---------------------------------------------------------------------------
#
# For 'geq' windows the masked sums are differences of suffix cumulative
# sums: sum_{k0 <= k < k1} x_k = S(k0) - S(k1), S(k) = sum_{k' >= k} x_k'.
# Suffix (not prefix) sums because every integrand decays in time (damped
# modes, ringdown data): a suffix sum is dominated by its first retained
# terms, so the subtraction loses no relative precision.  The trapezoid
# (tau-weighted) sums reduce to suffix sums over segment contributions
# 0.5 dt_k (x_k + x_{k+1}), exactly.
#
# Per chunk the cost drops from a (B,K)@(K,J^2) matmul to one cumsum over
# K plus B gathers -- the sweep becomes solve-bound (batched 2Jx2J
# Cholesky), not assembly-bound.

def _suffix(x, axis=0):
    """S[k] = sum_{k' >= k} x[k'], padded with a trailing zero row."""
    rev = jnp.flip(jnp.cumsum(jnp.flip(x, axis), axis=axis), axis)
    pad_shape = list(x.shape)
    pad_shape[axis] = 1
    return jnp.concatenate([rev, jnp.zeros(pad_shape, x.dtype)], axis=axis)


def _chunk_sweep_suffix(times, dre, dim, wr, wi, mre, mim, t0c, Tc,
                        col_mask):
    """One chunk of start times, suffix-sum form (geq windows)."""
    K = times.shape[0]
    J = wr.shape[0]
    I = dre.shape[0]
    tref = t0c[0]

    dt0 = jnp.maximum(times - tref, 0.0)
    E = jnp.exp(wi[None, :] * dt0[:, None])
    ph = wr[None, :] * dt0[:, None]
    P0 = E * jnp.cos(ph)
    Q0 = -E * jnp.sin(ph)

    A1 = (P0[:, :, None] * P0[:, None, :]
          + Q0[:, :, None] * Q0[:, None, :]).reshape(K, J * J)
    A2 = (P0[:, :, None] * Q0[:, None, :]
          - Q0[:, :, None] * P0[:, None, :]).reshape(K, J * J)
    R1 = (P0[:, None, :] * dre.T[:, :, None]
          + Q0[:, None, :] * dim.T[:, :, None]).reshape(K, I * J)
    R2 = (P0[:, None, :] * dim.T[:, :, None]
          - Q0[:, None, :] * dre.T[:, :, None]).reshape(K, I * J)
    dd = jnp.sum(dre * dre + dim * dim, axis=0)[:, None]   # (K, 1)

    # Plain-sum suffixes (K+1 rows, last zero).
    X = jnp.concatenate([A1, A2, R1, R2, dd], axis=1)
    S = _suffix(X)

    # Segment (trapezoid) suffixes: seg_k = 0.5 dt_k (x_k + x_{k+1}).
    dts = (times[1:] - times[:-1])[:, None]
    seg = 0.5 * dts * (X[:-1] + X[1:])
    Sseg = _suffix(seg)                                    # (K, cols)

    # Window index bounds: [k0, k1) with t in [t0, t0+T).
    k0 = jnp.searchsorted(times, t0c, side="left")
    k1 = jnp.searchsorted(times, t0c + Tc, side="left")
    k1s = jnp.maximum(k1 - 1, k0)      # last segment index + 1, clamped

    W_sum = S[k0] - S[k1]                                  # (Bc, cols)
    T_sum = Sseg[k0] - Sseg[k1s]

    nJJ = J * J
    nIJ = I * J
    Gt_re = W_sum[:, :nJJ].reshape(-1, J, J)
    Gt_im = W_sum[:, nJJ:2 * nJJ].reshape(-1, J, J)
    pd_re = W_sum[:, 2 * nJJ:2 * nJJ + nIJ].reshape(-1, I, J)
    pd_im = W_sum[:, 2 * nJJ + nIJ:2 * nJJ + 2 * nIJ].reshape(-1, I, J)
    Gtau_re = T_sum[:, :nJJ].reshape(-1, J, J)
    Gtau_im = T_sum[:, nJJ:2 * nJJ].reshape(-1, J, J)
    pdt_re = T_sum[:, 2 * nJJ:2 * nJJ + nIJ].reshape(-1, I, J)
    pdt_im = T_sum[:, 2 * nJJ + nIJ:2 * nJJ + 2 * nIJ].reshape(-1, I, J)
    dnorm = T_sum[:, -1]

    M_re = mre.T @ mre + mim.T @ mim
    M_im = mre.T @ mim - mim.T @ mre
    G_re = M_re[None] * Gt_re - M_im[None] * Gt_im
    G_im = M_re[None] * Gt_im + M_im[None] * Gt_re
    G2_re = M_re[None] * Gtau_re - M_im[None] * Gtau_im
    G2_im = M_re[None] * Gtau_im + M_im[None] * Gtau_re

    rhs_re = jnp.einsum("ij,bij->bj", mre, pd_re) \
        + jnp.einsum("ij,bij->bj", mim, pd_im)
    rhs_im = jnp.einsum("ij,bij->bj", mre, pd_im) \
        - jnp.einsum("ij,bij->bj", mim, pd_re)
    rt_re = jnp.einsum("ij,bij->bj", mre, pdt_re) \
        + jnp.einsum("ij,bij->bj", mim, pdt_im)
    rt_im = jnp.einsum("ij,bij->bj", mre, pdt_im) \
        - jnp.einsum("ij,bij->bj", mim, pdt_re)

    if col_mask is not None:
        keep = jnp.asarray(col_mask)
        kk = (keep[:, None] & keep[None, :])[None]
        eye = jnp.eye(J, dtype=G_re.dtype)[None]
        G_re = jnp.where(kk, G_re, eye)
        G_im = jnp.where(kk, G_im, 0.0)
        rhs_re = jnp.where(keep[None], rhs_re, 0.0)
        rhs_im = jnp.where(keep[None], rhs_im, 0.0)

    C0re, C0im = _regularised_solve(G_re, G_im, rhs_re, rhs_im)

    num = jnp.sum(C0re * rt_re + C0im * rt_im, axis=-1)
    GC_re = jnp.einsum("bjl,bl->bj", G2_re, C0re) \
        - jnp.einsum("bjl,bl->bj", G2_im, C0im)
    GC_im = jnp.einsum("bjl,bl->bj", G2_re, C0im) \
        + jnp.einsum("bjl,bl->bj", G2_im, C0re)
    model_norm = jnp.sum(C0re * GC_re + C0im * GC_im, axis=-1)
    mm = 1.0 - num / jnp.sqrt(model_norm * dnorm)

    delta = (t0c - tref)[:, None]
    g = jnp.exp(wi[None, :] * delta)
    cph = jnp.cos(wr[None, :] * delta)
    sph = jnp.sin(wr[None, :] * delta)
    Cre = g * (C0re * cph + C0im * sph)
    Cim = g * (C0im * cph - C0re * sph)
    return Cre, Cim, mm


def sweep_t0_suffix_real(times, dre, dim, wr, wi, mre, mim, t0s, Ts,
                         col_mask=None, chunk: int = 64):
    """Suffix-sum t0 sweep (geq windows); t0s sorted ascending."""
    def one_chunk(args):
        t0c, Tc = args
        return _chunk_sweep_suffix(times, dre, dim, wr, wi, mre, mim,
                                   t0c, Tc, col_mask)

    B = t0s.shape[0]
    pad = (-B) % chunk
    if pad:
        t0s = jnp.concatenate([t0s, jnp.full(pad, t0s[-1], t0s.dtype)])
        Ts = jnp.concatenate([Ts, jnp.full(pad, Ts[-1], Ts.dtype)])
    nc = t0s.shape[0] // chunk
    Cre, Cim, mm = jax.lax.map(
        one_chunk, (t0s.reshape(nc, chunk), Ts.reshape(nc, chunk)))
    J = wr.shape[0]
    return (Cre.reshape(-1, J)[:B], Cim.reshape(-1, J)[:B],
            mm.reshape(-1)[:B])


def sweep_t0_modesets_suffix_real(times, dre, dim, wrs, wis, mres, mims,
                                  t0s, Ts, col_masks, chunk: int = 64):
    """t0 x mode-set sweep on the suffix-sum kernel."""
    def per_set(args):
        wr, wi, mre, mim, mask = args
        return sweep_t0_suffix_real(times, dre, dim, wr, wi, mre, mim,
                                    t0s, Ts, col_mask=mask, chunk=chunk)

    return jax.lax.map(per_set, (wrs, wis, mres, mims, col_masks),
                       batch_size=1)


# ---------------------------------------------------------------------------
# Blocked-contraction grid sweep (PERF.md section 10)
# ---------------------------------------------------------------------------
#
# The per-item grid kernel (sweep_spectra_real) pays one (K, J)^T (K, J)
# Gram product per grid point: at J = 8 the batched matmuls use a sliver
# of the 128x128 MXU tile.  Here a BLOCK of Qb grid points is flattened
# into one (Qb*J, K) @ (K, Qb*J) contraction -- full MXU tiles at
# Qb*J = 128 -- and the per-item (J, J) Grams are the diagonal blocks of
# the result.  The off-diagonal (cross-item) blocks are wasted work
# (factor Qb more FLOPs), so this wins only if the utilisation gain
# exceeds Qb; both outcomes are recorded in PERF.md.

def _diag_blocks(X, Qb, J):
    """Diagonal (J, J) blocks of a (Qb*J, Qb*J) matrix -> (Qb, J, J)."""
    X4 = X.reshape(Qb, J, Qb, J)
    return jnp.moveaxis(jnp.diagonal(X4, axis1=0, axis2=2), -1, 0)


def sweep_spectra_blocked_real(times, dre, dim, wrs, wis, mres, mims, t0,
                               w, col_mask=None, block: int = 16):
    """Spectrum-batched grid sweep via blocked Gram contractions.

    Same contract as sweep_spectra_real (wrs/wis (Q, J), mres/mims
    (Q, I, J), shared window w); Q is padded to a multiple of ``block``
    internally.  Returns (Cre (Q, J), Cim (Q, J), mm (Q,)).
    """
    Q, J = wrs.shape
    I = dre.shape[0]
    tau = _trapz_weights(times, w)
    dnorm = jnp.sum(tau[None, :] * (dre * dre + dim * dim))

    pad = (-Q) % block
    if pad:
        wrs = jnp.concatenate([wrs, jnp.tile(wrs[-1:], (pad, 1))])
        wis = jnp.concatenate([wis, jnp.tile(wis[-1:], (pad, 1))])
        mres = jnp.concatenate([mres, jnp.tile(mres[-1:], (pad, 1, 1))])
        mims = jnp.concatenate([mims, jnp.tile(mims[-1:], (pad, 1, 1))])
    nb = wrs.shape[0] // block

    dwre = dre * w[None, :]
    dwim = dim * w[None, :]

    def one_block(args):
        wr, wi, mre, mim = args                    # (Qb, J), (Qb, I, J)
        Qb = wr.shape[0]
        dt = (times[:, None] - t0) * w[:, None]    # (K, 1)
        wrf = wr.reshape(-1)
        wif = wi.reshape(-1)
        E = jnp.exp(wif[None, :] * dt)
        ph = wrf[None, :] * dt
        P = E * jnp.cos(ph)                        # (K, Qb*J)
        Qm = -E * jnp.sin(ph)
        Pw = P * w[:, None]
        Qw = Qm * w[:, None]

        Gt_re = _diag_blocks(Pw.T @ Pw + Qw.T @ Qw, Qb, J)
        Gt_im = _diag_blocks(Pw.T @ Qw - Qw.T @ Pw, Qb, J)
        Pt = P * tau[:, None]
        Qt = Qm * tau[:, None]
        Gtau_re = _diag_blocks(Pt.T @ P + Qt.T @ Qm, Qb, J)
        Gtau_im = _diag_blocks(Pt.T @ Qm - Qt.T @ P, Qb, J)

        M_re = jnp.einsum("qij,qil->qjl", mre, mre) \
            + jnp.einsum("qij,qil->qjl", mim, mim)
        M_im = jnp.einsum("qij,qil->qjl", mre, mim) \
            - jnp.einsum("qij,qil->qjl", mim, mre)
        G_re = M_re * Gt_re - M_im * Gt_im
        G_im = M_re * Gt_im + M_im * Gt_re
        G2_re = M_re * Gtau_re - M_im * Gtau_im
        G2_im = M_re * Gtau_im + M_im * Gtau_re

        # Projections: (I, Qb*J) -> (Qb, I, J).
        pd_re = jnp.moveaxis((dwre @ Pw + dwim @ Qw).reshape(I, Qb, J),
                             0, 1)                 # (Qb, I, J)
        pd_im = jnp.moveaxis((dwim @ Pw - dwre @ Qw).reshape(I, Qb, J),
                             0, 1)
        rhs_re = jnp.sum(mre * pd_re + mim * pd_im, axis=1)   # (Qb, J)
        rhs_im = jnp.sum(mre * pd_im - mim * pd_re, axis=1)
        pdt_re = jnp.moveaxis((dre @ Pt + dim @ Qt).reshape(I, Qb, J),
                              0, 1)
        pdt_im = jnp.moveaxis((dim @ Pt - dre @ Qt).reshape(I, Qb, J),
                              0, 1)
        rt_re = jnp.sum(mre * pdt_re + mim * pdt_im, axis=1)
        rt_im = jnp.sum(mre * pdt_im - mim * pdt_re, axis=1)

        if col_mask is not None:
            keep = jnp.asarray(col_mask)
            kk = (keep[:, None] & keep[None, :])[None]
            eye = jnp.eye(J, dtype=G_re.dtype)[None]
            G_re = jnp.where(kk, G_re, eye)
            G_im = jnp.where(kk, G_im, 0.0)
            rhs_re = jnp.where(keep[None], rhs_re, 0.0)
            rhs_im = jnp.where(keep[None], rhs_im, 0.0)

        Cre, Cim = _regularised_solve(G_re, G_im, rhs_re, rhs_im)

        num = jnp.sum(Cre * rt_re + Cim * rt_im, axis=-1)
        GC_re = jnp.einsum("bjl,bl->bj", G2_re, Cre) \
            - jnp.einsum("bjl,bl->bj", G2_im, Cim)
        GC_im = jnp.einsum("bjl,bl->bj", G2_re, Cim) \
            + jnp.einsum("bjl,bl->bj", G2_im, Cre)
        model_norm = jnp.sum(Cre * GC_re + Cim * GC_im, axis=-1)
        mm = 1.0 - num / jnp.sqrt(model_norm * dnorm)
        return Cre, Cim, mm

    Cre, Cim, mm = jax.lax.map(
        one_block,
        (wrs.reshape(nb, block, J), wis.reshape(nb, block, J),
         mres.reshape(nb, block, I, J), mims.reshape(nb, block, I, J)))
    return (Cre.reshape(-1, J)[:Q], Cim.reshape(-1, J)[:Q],
            mm.reshape(-1)[:Q])


def sweep_events_real(times, dres, dims, wrs, wis, t0s, Ts,
                      chunk: int = 64, analytic: bool = False):
    """Per-EVENT fit batch, all-real: each event has its own data row,
    spectrum, and window (the catalog-serving kernel behind
    batched.batch_fit_events(engine='fast')).

    analytic=True (uniform time grids only; callers gate on measured
    spacing and backend, as for sweep_spectra_real): each event's Gram
    assemblies become closed-form geometric series.

    times (K,); dres/dims (E, K); wrs/wis (E, J); t0s/Ts (E,).
    Returns (Cre (E, J), Cim (E, J), mm (E,)).
    """
    from .ops.windows import window_geq

    J = wrs.shape[1]
    ones = jnp.ones((1, J))
    zeros = jnp.zeros((1, J))

    def one(args):
        dre, dim, wr, wi, t0, T = args
        w = window_geq(times, t0, T).astype(times.dtype)
        return fit_core_real(times, dre[None, :], dim[None, :], wr, wi,
                             ones, zeros, t0, w, analytic=analytic)

    return jax.lax.map(one, (dres, dims, wrs, wis, t0s, Ts),
                       batch_size=chunk)


# ---------------------------------------------------------------------------
# Bordered free-frequency sweep: hot loop #3's shared-fixed-block structure
# ---------------------------------------------------------------------------
#
# mismatch_omega_grid (reference qnmfits.py:1679-1827) appends ONE free
# complex frequency to a fixed QNM model and scans it over a res^2 grid:
# Jf of the Jf+1 design columns are IDENTICAL at every grid point.  The
# spectrum-batched kernel (sweep_spectra_real) rebuilds the full Gram
# and refactorises per point -- O(K J^2) assembly, K*J transcendentals,
# and a J x J Cholesky each.  Here the fixed block is assembled,
# equilibrated, floored, and inverted ONCE; each grid point then needs
# only its free column's phases (O(K) transcendentals), one row of a
# (Q, K) @ (K, 4Jf+4) cross-Gram matmul, and an O(Jf) bordered
# block-elimination solve -- all batched MXU matmuls.
#
# Regularisation semantics mirror _equilibrated/_regularised_solve: the
# bordered equilibrated system [[A_ff + floor*I, g~], [g~^H, 1+floor]]
# is exactly the matrix the full path factorises (diagonal sqrt(diag)
# scaling, machine-eps Tikhonov floor, dead-column identity rows); only
# the solve algorithm differs (Schur complement through the explicit
# fixed-block inverse vs one full Cholesky per point).  Two documented
# deviations, both far below the 1e-11 parity bar on any workload the
# tests cover: (a) the dead-column threshold uses the fixed-block max
# diagonal rather than the per-point max including the free column (a
# bounded factor on a ~1e-26 threshold), and (b) the Schur complement
# is clamped at `floor` when the free column is numerically inside the
# fixed-column span (the full path's floored Cholesky breaks the same
# degeneracy with the same energy scale).

def _omega_border_prep(times, d_re, d_im, wr, wi, t0, w):
    """Shared fixed-block quantities for the bordered free-omega sweep.

    times (K,), d (K,) single data series, wr/wi (Jf,), w (K,) binary.
    Returns the tuple consumed by _omega_border_apply.
    """
    dtype = times.dtype
    Jf = wr.shape[0]
    tau = _trapz_weights(times, w)
    dt = (times - t0) * w                                  # clamped: w=0 rows
    eps = jnp.finfo(dtype).eps
    tiny = jnp.finfo(dtype).tiny
    floor = 500.0 * (Jf + 1) * eps

    E = jnp.exp(wi[None, :] * dt[:, None])
    ph = wr[None, :] * dt[:, None]
    P = E * jnp.cos(ph)                                    # (K, Jf)
    Qm = -E * jnp.sin(ph)
    Pw = P * w[:, None]
    Qw = Qm * w[:, None]
    Pt = P * tau[:, None]
    Qt = Qm * tau[:, None]

    Gw_re = Pw.T @ Pw + Qw.T @ Qw                          # (Jf, Jf)
    Gw_im = Pw.T @ Qw - Qw.T @ Pw
    Gt_re = Pt.T @ P + Qt.T @ Qm
    Gt_im = Pt.T @ Qm - Qt.T @ P

    dw_re = d_re * w
    dw_im = d_im * w
    rhs_re = dw_re @ Pw + dw_im @ Qw                       # (Jf,)
    rhs_im = dw_im @ Pw - dw_re @ Qw
    rt_re = d_re @ Pt + d_im @ Qt
    rt_im = d_im @ Pt - d_re @ Qt
    data_norm = jnp.sum(tau * (d_re * d_re + d_im * d_im))

    # Equilibrate + dead-mask + floor the fixed block once
    # (_equilibrated semantics).
    eye = jnp.eye(Jf, dtype=dtype)
    diag = jnp.diagonal(Gw_re)
    maxdiag = jnp.max(diag) if Jf else jnp.zeros((), dtype)
    dead = diag <= maxdiag * (1e3 * eps) ** 2
    kk = dead[:, None] | dead[None, :]
    Gw_re = jnp.where(kk, eye, Gw_re)
    Gw_im = jnp.where(kk, 0.0, Gw_im)
    rhs_re = jnp.where(dead, 0.0, rhs_re)
    rhs_im = jnp.where(dead, 0.0, rhs_im)
    d_s = jnp.sqrt(jnp.maximum(jnp.diagonal(Gw_re), tiny))
    Di = 1.0 / d_s
    A = Gw_re * Di[:, None] * Di[None, :] + floor * eye
    B = Gw_im * Di[:, None] * Di[None, :]

    # Triangular factor + its explicit inverse.  The bordered solve
    # must go THROUGH the factor: the last elimination pivot
    # s = (1+floor) - ||L^-1 g~||^2 cancels catastrophically when the
    # free column nears the fixed span, and the error in the subtrahend
    # is ~cond(L) eps = sqrt(cond(A)) eps via the triangular route vs
    # ~cond(A) eps via a Hermitian-inverse matmul -- the overtone
    # ladder's conditioning makes that difference observable at 1e-3.
    from .ops.chol import complex_cholesky_factor, complex_lower_inverse

    Lre, Lim = complex_cholesky_factor(A, B)
    Linv_re, Linv_im = complex_lower_inverse(Lre, Lim)

    # Forward-substituted rhs e = L^-1 (Di*rhs) and the fixed-only
    # equilibrated solution y = L^-H e, both once.
    rre = rhs_re * Di
    rim = rhs_im * Di
    e_re = Linv_re @ rre - Linv_im @ rim
    e_im = Linv_re @ rim + Linv_im @ rre
    y_re = Linv_re.T @ e_re + Linv_im.T @ e_im
    y_im = Linv_re.T @ e_im - Linv_im.T @ e_re

    # Cross-matmul right factor: [Pw | Qw | Pt | Qt | wd | taud].
    Mcross = jnp.concatenate(
        [Pw, Qw, Pt, Qt, dw_re[:, None], dw_im[:, None],
         (d_re * tau)[:, None], (d_im * tau)[:, None]], axis=1)
    WT = jnp.stack([w, tau], axis=1)                       # (K, 2)

    return (dt, tau, w, Mcross, WT, Di, dead, maxdiag, floor,
            Linv_re, Linv_im, e_re, e_im, y_re, y_im, rt_re, rt_im,
            Gt_re, Gt_im, data_norm)


def _omega_border_apply(prep, Pf, Qf, Ef2):
    """Bordered solves + mismatch for one block of free columns.

    Pf/Qf/Ef2 (Qc, K): split-complex free-column phases and their
    squared magnitude.  Returns (Cf_re, Cf_im (Qc, Jf), c_re, c_im,
    mm (Qc,)).
    """
    (dt, tau, w, Mcross, WT, Di, dead, maxdiag, floor,
     Linv_re, Linv_im, e_re, e_im, y_re, y_im, rt_re, rt_im,
     Gt_re, Gt_im, data_norm) = prep
    Jf = Di.shape[0]
    Qc = Pf.shape[0]

    # One (2Qc, K) @ (K, 4Jf+4) matmul for every cross quantity.
    Z = jnp.concatenate([Pf, Qf], axis=0) @ Mcross
    zp, zq = Z[:Qc], Z[Qc:]
    g_re = zp[:, :Jf] + zq[:, Jf:2 * Jf]
    g_im = zq[:, :Jf] - zp[:, Jf:2 * Jf]
    gt_re_c = zp[:, 2 * Jf:3 * Jf] + zq[:, 3 * Jf:4 * Jf]   # tau cross
    gt_im_c = zq[:, 2 * Jf:3 * Jf] - zp[:, 3 * Jf:4 * Jf]
    c0 = 4 * Jf
    bet_re = zp[:, c0] + zq[:, c0 + 1]
    bet_im = zp[:, c0 + 1] - zq[:, c0]
    btau_re = zp[:, c0 + 2] + zq[:, c0 + 3]
    btau_im = zp[:, c0 + 3] - zq[:, c0 + 2]

    GamT = Ef2 @ WT                                        # (Qc, 2)
    gam = GamT[:, 0]
    gamt = GamT[:, 1]

    return _omega_border_solve(prep, g_re, g_im, gt_re_c, gt_im_c,
                               bet_re, bet_im, btau_re, btau_im,
                               gam, gamt)


def _omega_border_solve(prep, g_re, g_im, gt_re_c, gt_im_c, bet_re,
                        bet_im, btau_re, btau_im, gam, gamt):
    """Bordered block-elimination solve + mismatch from the per-point
    cross pieces: fixed-free cross Grams g/gt (Qc, Jf), free-column
    data projections bet/btau (Qc,), and free-column norms gam/gamt
    (Qc,).  Shared by the summation (_omega_border_apply) and analytic
    (sweep analytic=True) cross-piece paths."""
    (dt, tau, w, Mcross, WT, Di, dead, maxdiag, floor,
     Linv_re, Linv_im, e_re, e_im, y_re, y_im, rt_re, rt_im,
     Gt_re, Gt_im, data_norm) = prep
    dtype = g_re.dtype
    eps = jnp.finfo(dtype).eps
    tiny = jnp.finfo(dtype).tiny

    # Border equilibration + dead handling.
    sf = 1.0 / jnp.sqrt(jnp.maximum(gam, tiny))
    dead_f = gam <= maxdiag * (1e3 * eps) ** 2
    scale = Di[None, :] * sf[:, None]
    gte_re = jnp.where(dead[None, :], 0.0, g_re * scale)
    gte_im = jnp.where(dead[None, :], 0.0, g_im * scale)

    # u = L^-1 g~ per point (one batched matmul against the stored
    # triangular inverse).  ||u||^2 and u^H e reproduce g~^H A^-1 g~
    # and g~^H A^-1 r~ with ~sqrt(cond(A)) eps error instead of the
    # cond(A) eps of a Hermitian-inverse matmul -- the difference that
    # keeps the Schur pivot s accurate near the fixed-column span.
    u_re = gte_re @ Linv_re.T - gte_im @ Linv_im.T
    u_im = gte_re @ Linv_im.T + gte_im @ Linv_re.T
    uu = jnp.sum(u_re * u_re + u_im * u_im, axis=-1)
    s = jnp.maximum((1.0 + floor) - uu, floor)

    ue_re = jnp.sum(u_re * e_re[None] + u_im * e_im[None], axis=-1)
    ue_im = jnp.sum(u_re * e_im[None] - u_im * e_re[None], axis=-1)
    ct_re = jnp.where(dead_f, 0.0, (bet_re * sf - ue_re) / s)
    ct_im = jnp.where(dead_f, 0.0, (bet_im * sf - ue_im) / s)

    # v = L^-H u, then C_f = (y - v c~) Di  (back substitution as a
    # second batched matmul).
    v_re = u_re @ Linv_re + u_im @ Linv_im
    v_im = u_im @ Linv_re - u_re @ Linv_im
    Cf_re = (y_re[None] - (v_re * ct_re[:, None] - v_im * ct_im[:, None])
             ) * Di[None]
    Cf_im = (y_im[None] - (v_re * ct_im[:, None] + v_im * ct_re[:, None])
             ) * Di[None]
    c_re = ct_re * sf
    c_im = ct_im * sf

    # Mismatch from the blockwise tau-weighted pieces.
    num = (Cf_re @ rt_re + Cf_im @ rt_im
           + c_re * btau_re + c_im * btau_im)
    GC_re = Cf_re @ Gt_re.T - Cf_im @ Gt_im.T
    GC_im = Cf_im @ Gt_re.T + Cf_re @ Gt_im.T
    t_ff = jnp.sum(Cf_re * GC_re + Cf_im * GC_im, axis=-1)
    cross_re = jnp.sum(Cf_re * gt_re_c + Cf_im * gt_im_c, axis=-1)
    cross_im = jnp.sum(Cf_re * gt_im_c - Cf_im * gt_re_c, axis=-1)
    cross = 2.0 * (cross_re * c_re - cross_im * c_im)
    t_bb = (c_re * c_re + c_im * c_im) * gamt
    model_norm = t_ff + cross + t_bb
    mm = 1.0 - num / jnp.sqrt(model_norm * data_norm)
    return Cf_re, Cf_im, c_re, c_im, mm


def sweep_omega_grid_bordered_real(times, d_re, d_im, wr, wi, re_axis,
                                   im_axis, t0, w, a_chunk: int = 8,
                                   analytic: bool = False):
    """The bordered sweep on a SEPARABLE (Re omega) x (Im omega) grid.

    The free column factorises: exp(-i w_q (t-t0)) =
    e^{Im_b dt} (cos(Re_a dt) - i sin(Re_a dt)), so the per-point
    transcendentals collapse from Q*K to (A+B)*K -- the dominant cost
    of the general kernel on the f64-emulating TPU backend.  Grid order
    matches meshgrid(re, im, indexing='ij').ravel(): q = a*B + b.

    analytic=True (uniform time grids only; callers gate on measured
    spacing): the fixed-free cross Grams g/gt and the free-column norms
    gam/gamt become closed-form geometric series (PERF.md section 20) --
    nu = i(conj(w_fixed,j) - w_q) separates over the grid, so the
    transcendentals stay (A+B)-sized -- and the remaining summations
    (the 4 data projections) run as separable (ac, K) @ (K, 4B)
    matmuls, eliminating the (2Qc, K) @ (K, 4Jf+4) cross matmul and the
    (Qc, K) free-column phase materialisation entirely.

    Returns (Cre (A*B, Jf+1), Cim, mm (A*B,)).
    """
    prep = _omega_border_prep(times, d_re, d_im, wr, wi, t0, w)
    dt = prep[0]
    tau = prep[1]
    Jf = wr.shape[0]
    A = re_axis.shape[0]
    Bn = im_axis.shape[0]
    K = times.shape[0]

    Ef = jnp.exp(im_axis[:, None] * dt[None, :])           # (B, K)
    Ef2 = Ef * Ef

    if analytic:
        # Window scalars from the indicator (exact for 'geq' AND
        # 'closest' windows, as in _analytic_gram_window).
        s, m = _window_scalars(times, w, t0)
        dlt = _fitted_step(times)

        # Free-column norms: nu = 2 Im w_q is real and a-independent.
        gam_b, _, gamt_b, _ = _geom_series_eval(
            dlt, K, 2.0 * im_axis, jnp.zeros_like(im_axis), s, m)  # (B,)

        # Data projections as separable matmuls: rows of Ydata are
        # Ef_b * v for v in {w d_re, w d_im, tau d_re, tau d_im}.
        V = jnp.stack([d_re * w, d_im * w, d_re * tau, d_im * tau])
        Ydata = (Ef[None] * V[:, None, :]).reshape(4 * Bn, K)

    def one_a_chunk(ra):
        ac = ra.shape[0]
        ph = ra[:, None] * dt[None, :]                     # (ac, K)
        Ca = jnp.cos(ph)
        Sa = jnp.sin(ph)
        if analytic:
            # Cross Grams: nu_re (1, B, Jf) x nu_im (ac, 1, Jf) keeps
            # every transcendental separable inside _geom_series_eval.
            nu_re = (wi[None, :] + im_axis[:, None])[None]
            nu_im = (wr[None, None, :] - ra[:, None, None])
            g3_re, g3_im, gt3_re, gt3_im = _geom_series_eval(
                dlt, K, nu_re, nu_im, s, m)
            g_re = g3_re.reshape(ac * Bn, Jf)              # Jf may be 0
            g_im = g3_im.reshape(ac * Bn, Jf)
            gt_re_c = gt3_re.reshape(ac * Bn, Jf)
            gt_im_c = gt3_im.reshape(ac * Bn, Jf)

            Zc = Ca @ Ydata.T                              # (ac, 4B)
            Zs = Sa @ Ydata.T
            bet_re = (Zc[:, :Bn] - Zs[:, Bn:2 * Bn]).reshape(-1)
            bet_im = (Zc[:, Bn:2 * Bn] + Zs[:, :Bn]).reshape(-1)
            btau_re = (Zc[:, 2 * Bn:3 * Bn] - Zs[:, 3 * Bn:]).reshape(-1)
            btau_im = (Zc[:, 3 * Bn:] + Zs[:, 2 * Bn:3 * Bn]).reshape(-1)

            gam = jnp.broadcast_to(gam_b[None], (ac, Bn)).reshape(-1)
            gamt = jnp.broadcast_to(gamt_b[None], (ac, Bn)).reshape(-1)
            return _omega_border_solve(prep, g_re, g_im, gt_re_c,
                                       gt_im_c, bet_re, bet_im,
                                       btau_re, btau_im, gam, gamt)
        Pf = (Ca[:, None, :] * Ef[None, :, :]).reshape(-1, K)
        Qf = (-Sa[:, None, :] * Ef[None, :, :]).reshape(-1, K)
        Ef2b = jnp.broadcast_to(Ef2[None], (ac, Bn, K)).reshape(-1, K)
        return _omega_border_apply(prep, Pf, Qf, Ef2b)

    pad = (-A) % a_chunk
    if pad:
        re_axis = jnp.concatenate(
            [re_axis, jnp.broadcast_to(re_axis[-1], (pad,))])
    na = re_axis.shape[0] // a_chunk
    Cf_re, Cf_im, c_re, c_im, mm = jax.lax.map(
        one_a_chunk, re_axis.reshape(na, a_chunk))
    Q = A * Bn
    Qp = na * a_chunk * Bn
    Cre = jnp.concatenate([Cf_re.reshape(Qp, Jf), c_re.reshape(Qp, 1)],
                          axis=1)
    Cim = jnp.concatenate([Cf_im.reshape(Qp, Jf), c_im.reshape(Qp, 1)],
                          axis=1)
    return Cre[:Q], Cim[:Q], mm.reshape(-1)[:Q]
