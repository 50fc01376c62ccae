"""Multi-chip sweep sharding over a JAX device mesh.

The reference scales its sweeps by doing nothing (serial Python loops,
SURVEY.md section 2.6).  The workload's natural parallel axes are:

* ``sweep`` -- data parallelism over fit configurations (t0 / grid
  points).  Zero cross-device communication except the result gather.
* ``time`` -- the time-sample axis K of the Gram contractions.  Sharding
  K turns each fit's Gram assembly into partial sums + a psum over ICI:
  the analogue of sequence parallelism for this workload, useful when a
  single fit's K is large or when fits-per-device are few.

Both are expressed with shard_map over a 2D Mesh('sweep', 'time'); the
J x J solves happen replicated per device (J <= ~32, negligible).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..engine import fit_core
from ..ops.cmath import damped_phase
from ..ops.solve import gram_cholesky
from ..ops.windows import window_closest, window_geq

__all__ = ["sweep_mesh", "sharded_t0_sweep", "sharded_fit_core",
           "sharded_t0_sweep_real", "sharded_fit_core_real",
           "sharded_t0_sweep_factored",
           "sharded_t0_sweep_modesets_factored", "sharded_spectra_sweep",
           "sharded_event_batch", "sharded_t0_sweep_factored_2d"]


def _host_trapz(times, w):
    """Trapezoid weights on the GLOBAL time grid (host-side numpy):
    segment weights straddle shard boundaries, so they must be computed
    before sharding.  Mirrors ops.windows.trapz_weights exactly."""
    t = np.asarray(times)
    wv = np.asarray(w, t.dtype)
    seg = wv[:-1] * wv[1:] * (t[1:] - t[:-1]) * 0.5
    tau = np.zeros_like(t)
    tau[:-1] += seg
    tau[1:] += seg
    return tau


def sweep_mesh(n_sweep: int | None = None, n_time: int = 1,
               devices=None) -> Mesh:
    """Build a ('sweep', 'time') mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_sweep is None:
        n_sweep = len(devices) // n_time
    devs = np.asarray(devices[: n_sweep * n_time]).reshape(n_sweep, n_time)
    return Mesh(devs, ("sweep", "time"))


def _pad_to(x, mult, axis=0):
    n = x.shape[axis]
    pad = (-n) % mult
    if pad == 0:
        return x, n
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return np.pad(x, widths, mode="edge"), n


def sharded_t0_sweep(times, data, omega, mu, t0s, Ts, mesh: Mesh,
                     cdtype=jnp.complex64, t0_method: str = "geq"):
    """t0 sweep sharded over mesh axis 'sweep' (pure DP over windows).

    times (K,), data (I, K), omega (J,), mu (I, J) are replicated;
    t0s/Ts (B,) are sharded.  Returns (C (B, J), mm (B,)) gathered.
    """
    n_sweep = mesh.shape["sweep"]
    t0s = np.asarray(t0s)
    Ts = np.broadcast_to(np.asarray(Ts), t0s.shape)
    t0s_p, B = _pad_to(t0s, n_sweep)
    Ts_p, _ = _pad_to(Ts, n_sweep)

    window = window_geq if t0_method == "geq" else window_closest

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P("sweep"), P("sweep")),
        out_specs=(P("sweep"), P("sweep")),
    )
    def run(times_, data_, omega_, mu_, t0_loc, T_loc):
        def one(args):
            t0, T = args
            w = window(times_, t0, T)
            return fit_core(times_, data_, omega_, mu_, t0, w, cdtype)
        return jax.lax.map(one, (t0_loc, T_loc), batch_size=64)

    C, mm = jax.jit(run)(np.asarray(times), np.asarray(data),
                         np.asarray(omega), np.asarray(mu), t0s_p, Ts_p)
    return C[:B], mm[:B]


def sharded_fit_core(times, data, omega, mu, t0, w, mesh: Mesh,
                     cdtype=jnp.complex64):
    """One fit with the TIME axis sharded across mesh axis 'time'.

    Each device holds a K/n_time slice of (times, data, w), computes
    partial Gram/projection/quadrature sums, and psums them over ICI --
    the sequence-parallel analogue for ringdown fitting.  The J x J solve
    runs replicated.

    Note: trapezoid weights are computed on the *global* time axis before
    sharding (segment weights straddle shard boundaries).
    """
    # Host-side: segment weights straddle shard boundaries, so compute on
    # the global grid before sharding.
    rdt = np.float32 if cdtype == jnp.complex64 else np.float64
    t_np = np.asarray(times, rdt)
    w_np = np.asarray(w, rdt)
    tau = _host_trapz(t_np, w_np)

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P("time"), P(None, "time"), P(), P(), P("time"),
                  P("time")),
        out_specs=(P(), P()),
    )
    def run(t_loc, d_loc, omega_, mu_, w_loc, tau_loc):
        rdtype = jnp.zeros((), cdtype).real.dtype
        t_loc = t_loc.astype(rdtype)
        w_loc = w_loc.astype(rdtype)
        tau_loc = tau_loc.astype(rdtype)
        d_loc = d_loc.astype(cdtype)
        omega_ = omega_.astype(cdtype)
        mu_ = mu_.astype(cdtype)

        phi = damped_phase(omega_[None, :],
                           (t_loc[:, None] - t0) * w_loc[:, None])
        phiw = phi * w_loc[:, None]
        Mmu = mu_.conj().T @ mu_

        # Partial sums over the local time shard -> psum over 'time'.
        Gt = jax.lax.psum(phiw.conj().T @ phiw, "time")
        pd = jax.lax.psum(
            jnp.einsum("kj,ik->ij", phiw.conj(), d_loc * w_loc[None, :]),
            "time")
        phit = phi * tau_loc[:, None]
        Gt_tau = jax.lax.psum(phit.conj().T @ phi, "time")
        r_tau = jax.lax.psum(
            jnp.einsum("ij,ij->j", mu_.conj(),
                       jnp.einsum("kj,ik->ij", phit.conj(), d_loc)),
            "time")
        dnorm = jax.lax.psum(
            jnp.real(jnp.sum(tau_loc[None, :] * d_loc * jnp.conj(d_loc))),
            "time")

        G = Mmu * Gt
        rhs = jnp.einsum("ij,ij->j", mu_.conj(), pd)
        C = gram_cholesky(G, rhs)

        G_tau = Mmu * Gt_tau
        num = jnp.real(jnp.sum(C * jnp.conj(r_tau)))
        model_norm = jnp.real(jnp.vdot(C, G_tau @ C))
        mm = 1.0 - num / jnp.sqrt(model_norm * dnorm)
        return C, mm

    n_time = mesh.shape["time"]
    K = np.asarray(times).shape[0]
    if K % n_time:
        raise ValueError(f"time axis {K} not divisible by mesh time={n_time}")
    return jax.jit(run)(t_np, np.asarray(data), np.asarray(omega),
                        np.asarray(mu), w_np, tau)


# ---------------------------------------------------------------------------
# Split-complex (real-arithmetic) sharded cores -- the TPU-safe path
# (the axon backend lacks complex-construction lowerings; see engine_real).
# ---------------------------------------------------------------------------

def sharded_t0_sweep_real(times, dre, dim, wr, wi, mre, mim, t0s, Ts,
                          mesh: Mesh):
    """t0 sweep sharded over mesh axis 'sweep', all-real arrays.

    Returns (Cre (B, J), Cim (B, J), mm (B,)) gathered.
    """
    from ..engine_real import fit_core_real

    n_sweep = mesh.shape["sweep"]
    t0s = np.asarray(t0s)
    Ts = np.broadcast_to(np.asarray(Ts), t0s.shape)
    t0s_p, B = _pad_to(t0s, n_sweep)
    Ts_p, _ = _pad_to(Ts, n_sweep)

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(), P(), P("sweep"),
                  P("sweep")),
        out_specs=(P("sweep"), P("sweep"), P("sweep")),
    )
    def run(times_, dre_, dim_, wr_, wi_, mre_, mim_, t0_loc, T_loc):
        def one(args):
            t0, T = args
            w = ((times_ >= t0) & (times_ < t0 + T)).astype(times_.dtype)
            return fit_core_real(times_, dre_, dim_, wr_, wi_, mre_, mim_,
                                 t0, w)
        return jax.lax.map(one, (t0_loc, T_loc), batch_size=64)

    Cre, Cim, mm = jax.jit(run)(
        np.asarray(times), np.asarray(dre), np.asarray(dim),
        np.asarray(wr), np.asarray(wi), np.asarray(mre), np.asarray(mim),
        t0s_p, Ts_p)
    return Cre[:B], Cim[:B], mm[:B]


def _clamped_chunk(t0s, wi, chunk):
    """Apply batched._safe_chunk's |Im w|*chunk-span accuracy budget.

    The public batched.* wrappers clamp before calling in here, but the
    mesh-level kernels are also direct entry points (dryrun, tests,
    power users); without the clamp a wide t0 span with the default
    chunk silently loses precision in the chunk-start-referenced exp
    factorisation.  Clamping twice is idempotent."""
    from ..batched import _safe_chunk

    t0s = np.asarray(t0s, float)
    wi = np.asarray(wi)
    if t0s.size == 0 or wi.size == 0:
        return chunk
    return _safe_chunk(t0s, float(np.max(np.abs(wi))), chunk)


def _analytic_ok(times, analytic):
    """Gate closed-form geometric-series Grams on a uniform time grid.

    The public batched.* wrappers gate on measured spacing before
    calling in here, but the mesh-level kernels are also direct entry
    points (dryrun, tests, power users); analytic=True on a
    genuinely non-uniform grid (raw SXS sampling) must fall back to
    the exact summation kernels rather than return silently wrong
    numbers.  Same contract as sharded_t0_sweep_factored_2d's guard."""
    if not analytic:
        return False
    from ..batched import _uniform_spacing
    return bool(_uniform_spacing(np.asarray(times)))


def sharded_t0_sweep_factored(times, dre, dim, wr, wi, mre, mim, t0s, Ts,
                              mesh: Mesh, col_mask=None, chunk: int = 64,
                              analytic: bool = False):
    """The FAST multi-chip sweep: factored t0 kernel sharded over 'sweep'.

    Each device runs engine_real.sweep_t0_factored_real on a contiguous
    block of (sorted) start times -- the same factored Gram kernel the
    single-chip benchmark uses (one (Bc,K)@(K,J^2) MXU matmul per chunk
    instead of per-window Gram assembly), so per-chip throughput matches
    the bench and scaling over ICI is pure data parallelism with one
    result all-gather.

    times (K,), dre/dim (I, K), wr/wi (J,), mre/mim (I, J) replicated;
    t0s/Ts (B,) sharded (t0s sorted ascending).  Returns
    (Cre (B, J), Cim (B, J), mm (B,)).
    """
    analytic = _analytic_ok(times, analytic)
    from ..engine_real import sweep_t0_factored_real

    n_sweep = mesh.shape["sweep"]
    t0s = np.asarray(t0s)
    if np.any(np.diff(t0s) < 0):
        raise ValueError("t0_array must be sorted ascending")
    Ts = np.broadcast_to(np.asarray(Ts), t0s.shape)
    chunk = _clamped_chunk(t0s, wi, chunk)
    t0s_p, B = _pad_to(t0s, n_sweep * chunk)
    Ts_p, _ = _pad_to(Ts, n_sweep * chunk)

    spec_rep = (P(),) * 7
    @partial(
        shard_map, mesh=mesh,
        in_specs=spec_rep + (P("sweep"), P("sweep")),
        out_specs=(P("sweep"), P("sweep"), P("sweep")),
    )
    def run(times_, dre_, dim_, wr_, wi_, mre_, mim_, t0_loc, T_loc):
        return sweep_t0_factored_real(times_, dre_, dim_, wr_, wi_,
                                      mre_, mim_, t0_loc, T_loc,
                                      col_mask=col_mask, chunk=chunk,
                                      analytic=analytic)

    Cre, Cim, mm = jax.jit(run)(
        np.asarray(times), np.asarray(dre), np.asarray(dim),
        np.asarray(wr), np.asarray(wi), np.asarray(mre), np.asarray(mim),
        t0s_p, Ts_p)
    return Cre[:B], Cim[:B], mm[:B]


def sharded_t0_sweep_modesets_factored(times, dre, dim, wrs, wis, mres,
                                       mims, t0s, Ts, col_masks,
                                       mesh: Mesh, chunk: int = 64,
                                       analytic: bool = False):
    """Multi-chip t0 x mode-set sweep: start times sharded over the
    'sweep' mesh axis, the mode-set axis vmapped on every device (the
    full single-chip throughput kernel, scaled by pure data parallelism
    with one result all-gather).

    wrs/wis (S, J), mres/mims (S, I, J), col_masks (S, J) replicated;
    t0s/Ts (B,) sharded (sorted ascending).  Returns
    (Cre (S, B, J), Cim (S, B, J), mm (S, B)).
    """
    analytic = _analytic_ok(times, analytic)
    from ..engine_real import sweep_t0_modesets_factored_real

    n_sweep = mesh.shape["sweep"]
    t0s = np.asarray(t0s)
    if np.any(np.diff(t0s) < 0):
        raise ValueError("t0_array must be sorted ascending")
    Ts = np.broadcast_to(np.asarray(Ts), t0s.shape)
    chunk = _clamped_chunk(t0s, wis, chunk)
    t0s_p, B = _pad_to(t0s, n_sweep * chunk)
    Ts_p, _ = _pad_to(Ts, n_sweep * chunk)

    spec_rep = (P(),) * 7
    @partial(
        shard_map, mesh=mesh,
        in_specs=spec_rep + (P("sweep"), P("sweep"), P()),
        out_specs=(P(None, "sweep"), P(None, "sweep"), P(None, "sweep")),
    )
    def run(times_, dre_, dim_, wrs_, wis_, mres_, mims_, t0_loc, T_loc,
            masks_):
        return sweep_t0_modesets_factored_real(
            times_, dre_, dim_, wrs_, wis_, mres_, mims_, t0_loc, T_loc,
            masks_, chunk=chunk, analytic=analytic)

    Cre, Cim, mm = jax.jit(run)(
        np.asarray(times), np.asarray(dre), np.asarray(dim),
        np.asarray(wrs), np.asarray(wis), np.asarray(mres),
        np.asarray(mims), t0s_p, Ts_p, np.asarray(col_masks))
    return Cre[:, :B], Cim[:, :B], mm[:, :B]


def sharded_fit_core_real(times, dre, dim, wr, wi, mre, mim, t0, w,
                          mesh: Mesh):
    """One fit with the TIME axis sharded (psum'd Gram sums), all-real.

    The split-complex analogue of sharded_fit_core: each device computes
    the four real partial Gram matmuls on its K/n_time slice and psums
    over the 'time' axis; the 2x2 real-embedded solve runs replicated.
    """
    from ..engine_real import _embedded_solve

    t_np = np.asarray(times)
    w_np = np.asarray(w, t_np.dtype)
    tau = _host_trapz(t_np, w_np)

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P("time"), P(None, "time"), P(None, "time"), P(), P(),
                  P(), P(), P("time"), P("time")),
        out_specs=(P(), P(), P()),
    )
    def run(t_loc, dre_, dim_, wr_, wi_, mre_, mim_, w_loc, tau_loc):
        dt = (t_loc[:, None] - t0) * w_loc[:, None]
        E = jnp.exp(wi_[None, :] * dt)
        ph = wr_[None, :] * dt
        Pm = E * jnp.cos(ph)
        Qm = -E * jnp.sin(ph)
        Pw = Pm * w_loc[:, None]
        Qw = Qm * w_loc[:, None]

        Gt_re = jax.lax.psum(Pw.T @ Pw + Qw.T @ Qw, "time")
        Gt_im = jax.lax.psum(Pw.T @ Qw - Qw.T @ Pw, "time")
        M_re = mre_.T @ mre_ + mim_.T @ mim_
        M_im = mre_.T @ mim_ - mim_.T @ mre_
        G_re = M_re * Gt_re - M_im * Gt_im
        G_im = M_re * Gt_im + M_im * Gt_re

        dwre = dre_ * w_loc[None, :]
        dwim = dim_ * w_loc[None, :]
        pd_re = jax.lax.psum(dwre @ Pw + dwim @ Qw, "time")
        pd_im = jax.lax.psum(dwim @ Pw - dwre @ Qw, "time")
        rhs_re = jnp.sum(mre_ * pd_re + mim_ * pd_im, axis=0)
        rhs_im = jnp.sum(mre_ * pd_im - mim_ * pd_re, axis=0)

        Cre, Cim = _embedded_solve(G_re, G_im, rhs_re, rhs_im)

        Pt = Pm * tau_loc[:, None]
        Qt = Qm * tau_loc[:, None]
        Gtau_re = jax.lax.psum(Pt.T @ Pm + Qt.T @ Qm, "time")
        Gtau_im = jax.lax.psum(Pt.T @ Qm - Qt.T @ Pm, "time")
        G2_re = M_re * Gtau_re - M_im * Gtau_im
        G2_im = M_re * Gtau_im + M_im * Gtau_re
        pdt_re = jax.lax.psum(dre_ @ Pt + dim_ @ Qt, "time")
        pdt_im = jax.lax.psum(dim_ @ Pt - dre_ @ Qt, "time")
        rt_re = jnp.sum(mre_ * pdt_re + mim_ * pdt_im, axis=0)
        rt_im = jnp.sum(mre_ * pdt_im - mim_ * pdt_re, axis=0)

        num = jnp.sum(Cre * rt_re + Cim * rt_im)
        GC_re = G2_re @ Cre - G2_im @ Cim
        GC_im = G2_re @ Cim + G2_im @ Cre
        model_norm = jnp.sum(Cre * GC_re + Cim * GC_im)
        data_norm = jax.lax.psum(
            jnp.sum(tau_loc[None, :] * (dre_ * dre_ + dim_ * dim_)),
            "time")
        mm = 1.0 - num / jnp.sqrt(model_norm * data_norm)
        return Cre, Cim, mm

    n_time = mesh.shape["time"]
    K = t_np.shape[0]
    if K % n_time:
        raise ValueError(f"time axis {K} not divisible by mesh time={n_time}")
    return jax.jit(run)(t_np, np.asarray(dre), np.asarray(dim),
                        np.asarray(wr), np.asarray(wi), np.asarray(mre),
                        np.asarray(mim), w_np, tau)


def sharded_spectra_sweep(times, dre, dim, wrs, wis, mres, mims, t0, w,
                          mesh: Mesh, col_mask=None, chunk: int = 64,
                          analytic: bool = False):
    """Grid sweep sharded over 'sweep': pure data parallelism over the
    Q spectrum-batched grid points (the (Mf, chif) and free-frequency
    hot loops at multi-chip scale; reference qnmfits.py:1304-1415,
    1679-1827 are serial loops).

    times (K,), dre/dim (I, K), t0 scalar, w (K,) replicated;
    wrs/wis (Q, J), mres/mims (Q, I, J) sharded on Q.  Returns
    (Cre (Q, J), Cim (Q, J), mm (Q,)) gathered.
    """
    analytic = _analytic_ok(times, analytic)
    from ..engine_real import sweep_spectra_real

    n_sweep = mesh.shape["sweep"]
    wrs = np.asarray(wrs)
    Q = wrs.shape[0]
    wrs_p, _ = _pad_to(wrs, n_sweep)
    wis_p, _ = _pad_to(np.asarray(wis), n_sweep)
    mres_p, _ = _pad_to(np.asarray(mres), n_sweep)
    mims_p, _ = _pad_to(np.asarray(mims), n_sweep)

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(), P(), P("sweep"), P("sweep"), P("sweep"),
                  P("sweep"), P()),
        out_specs=(P("sweep"), P("sweep"), P("sweep")),
    )
    def run(times_, dre_, dim_, wrs_, wis_, mres_, mims_, w_):
        return sweep_spectra_real(times_, dre_, dim_, wrs_, wis_,
                                  mres_, mims_, t0, w_,
                                  col_mask=col_mask, chunk=chunk,
                                  analytic=analytic)

    Cre, Cim, mm = jax.jit(run)(
        np.asarray(times), np.asarray(dre), np.asarray(dim),
        wrs_p, wis_p, mres_p, mims_p, np.asarray(w))
    return Cre[:Q], Cim[:Q], mm[:Q]


def sharded_omega_grid_bordered(times, d_re, d_im, wr, wi, re_axis,
                                im_axis, t0, w, mesh: Mesh,
                                a_chunk: int = 8,
                                analytic: bool = False):
    """Bordered free-frequency grid sharded over 'sweep': the Re axis is
    data-parallel across devices; the shared fixed-block prep (one small
    factorisation) is recomputed per device -- far cheaper than
    broadcasting it (reference qnmfits.py:1679-1827 at multi-chip
    scale).

    times/w (K,), d_re/d_im (K,), wr/wi (Jf,) replicated; re_axis (A,)
    sharded, im_axis (B,) replicated.  Returns (Cre (A*B, Jf+1),
    Cim, mm (A*B,)) in q = a*B + b order, a-major like the unsharded
    kernel.
    """
    analytic = _analytic_ok(times, analytic)
    from ..engine_real import sweep_omega_grid_bordered_real

    n_sweep = mesh.shape["sweep"]
    re_p, A = _pad_to(np.asarray(re_axis), n_sweep)
    Bn = np.asarray(im_axis).shape[0]

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P("sweep"), P(), P()),
        out_specs=(P("sweep"), P("sweep"), P("sweep")),
    )
    def run(times_, dre_, dim_, wr_, wi_, re_loc, im_, w_):
        return sweep_omega_grid_bordered_real(times_, dre_, dim_, wr_,
                                              wi_, re_loc, im_, t0, w_,
                                              a_chunk=a_chunk,
                                              analytic=analytic)

    Cre, Cim, mm = jax.jit(run)(
        np.asarray(times), np.asarray(d_re), np.asarray(d_im),
        np.asarray(wr), np.asarray(wi), re_p, np.asarray(im_axis),
        np.asarray(w))
    Q = A * Bn
    return Cre[:Q], Cim[:Q], mm[:Q]


def sharded_t0_sweep_modesets_dynamic(times, dre, dim, wr_ts, wi_ts,
                                      mre_ts, mim_ts, t0s, Ts, col_masks,
                                      mesh: Mesh, t0_method: str = "geq",
                                      chunk: int = 16):
    """Dynamic-spectrum (set x t0) sweep sharded over 'sweep': the
    start-time axis is pure DP over windows (the spectrum TRACKS are
    host-evaluated and replicated -- omega(t)/mu(t) do not depend on
    t0), so the multi-chip layout is identical to the static mode-set
    sweep's; only the per-window kernel differs (dynamic_fit_core_real,
    whose per-sample mixing cannot be factored).  Reference loop:
    qnmfits.py:1286-1299 x sets with (Mf(t), chif(t)) tracks.

    wr_ts/wi_ts (S, K, J), mre_ts/mim_ts (S, I, K, J) replicated;
    t0s/Ts (B,) sharded.  Returns (Cre (S, B, J), Cim, mm (S, B)).
    """
    from ..engine_real import sweep_t0_modesets_dynamic_real

    n_sweep = mesh.shape["sweep"]
    t0s = np.asarray(t0s)
    Ts = np.broadcast_to(np.asarray(Ts), t0s.shape)
    t0s_p, B = _pad_to(t0s, n_sweep)
    Ts_p, _ = _pad_to(Ts, n_sweep)

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(), P(), P("sweep"),
                  P("sweep"), P()),
        out_specs=(P(None, "sweep"), P(None, "sweep"), P(None, "sweep")),
    )
    def run(times_, dre_, dim_, wrt_, wit_, mret_, mimt_, t0_loc, T_loc,
            masks_):
        return sweep_t0_modesets_dynamic_real(
            times_, dre_, dim_, wrt_, wit_, mret_, mimt_, t0_loc, T_loc,
            masks_, t0_method=t0_method, chunk=chunk)

    Cre, Cim, mm = jax.jit(run)(
        np.asarray(times), np.asarray(dre), np.asarray(dim),
        np.asarray(wr_ts), np.asarray(wi_ts), np.asarray(mre_ts),
        np.asarray(mim_ts), t0s_p, Ts_p, np.asarray(col_masks))
    return Cre[:, :B], Cim[:, :B], mm[:, :B]


def sharded_event_batch(times, dres, dims, wrs, wis, t0s, Ts,
                        mesh: Mesh, chunk: int = 64,
                        analytic: bool = False):
    """Per-event fit batch sharded over 'sweep': catalog-population DP
    on the SPLIT-COMPLEX kernel (TPU-mesh safe -- per-event spectra are
    spline-evaluated host-side by the caller; no complex dtype or x64
    spline work ever enters the device program).

    times (K,) replicated; dres/dims (E, K), wrs/wis (E, J),
    t0s/Ts (E,) sharded.  Returns (Cre (E, J), Cim (E, J), mm (E,)).
    """
    analytic = _analytic_ok(times, analytic)
    from ..engine_real import sweep_events_real

    n_sweep = mesh.shape["sweep"]
    dres_p, E = _pad_to(np.asarray(dres), n_sweep)
    dims_p, _ = _pad_to(np.asarray(dims), n_sweep)
    wrs_p, _ = _pad_to(np.asarray(wrs), n_sweep)
    wis_p, _ = _pad_to(np.asarray(wis), n_sweep)
    t0s_p, _ = _pad_to(np.asarray(t0s), n_sweep)
    Ts_p, _ = _pad_to(np.asarray(Ts), n_sweep)

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P("sweep"), P("sweep"), P("sweep"), P("sweep"),
                  P("sweep"), P("sweep")),
        out_specs=(P("sweep"), P("sweep"), P("sweep")),
    )
    def run(times_, dres_, dims_, wrs_, wis_, t0_loc, T_loc):
        return sweep_events_real(times_, dres_, dims_, wrs_, wis_,
                                 t0_loc, T_loc, chunk=chunk,
                                 analytic=analytic)

    Cre, Cim, mm = jax.jit(run)(np.asarray(times), dres_p, dims_p,
                                wrs_p, wis_p, t0s_p, Ts_p)
    return Cre[:E], Cim[:E], mm[:E]


def sharded_t0_sweep_factored_2d(times, dre, dim, wr, wi, mre, mim, t0s,
                                 Ts, mesh: Mesh, col_mask=None,
                                 chunk: int = 64,
                                 analytic: bool = False):
    """The factored t0 sweep with BOTH mesh axes live: windows sharded
    over 'sweep' AND the time-sample axis K sharded over 'time' with
    psum'd Gram contributions -- sequence parallelism for the
    production kernel (long-waveform fits where K dominates HBM).

    The factored chunk body needs two globally-coupled quantities per
    sample: the window indicator of the NEXT sample (trapezoid segment
    seg_k = W_k W_{k+1} dt_k / 2) and the segment of the PREVIOUS
    sample (tau_k = seg_{k-1} + seg_k).  Both become locally computable
    by shipping shifted copies of the time grid (times_prev/times_next,
    sharded identically to times): W at a neighbour sample is a pure
    function of its time value and the replicated window parameters,
    so no halo exchange is needed.

    times (K,), dre/dim (I, K) sharded on 'time'; wr/wi (J,),
    mre/mim (I, J) replicated; t0s/Ts (B,) sharded on 'sweep'
    (sorted ascending).  K must divide by the 'time' axis size.
    Returns (Cre (B, J), Cim (B, J), mm (B,)).
    """
    from ..engine_real import _geom_grams_core, _regularised_solve

    n_sweep = mesh.shape["sweep"]
    n_time = mesh.shape["time"]
    times = np.asarray(times)
    K = times.shape[0]
    if K % n_time:
        raise ValueError(
            f"time axis {K} not divisible by mesh time={n_time}")
    if analytic:
        from ..batched import _uniform_spacing
        if K // n_time < 2 or not _uniform_spacing(times):
            # Closed-form geometric-series Grams need a uniform grid
            # (and each shard needs >= 2 samples to carry a local
            # step); the summation path is exact on any grid, so a
            # direct caller passing analytic=True never gets silently
            # wrong numbers -- it gets the summation kernel instead,
            # matching the batched layer's _uniform_spacing gate.
            analytic = False
    t0s = np.asarray(t0s)
    if np.any(np.diff(t0s) < 0):
        raise ValueError("t0_array must be sorted ascending")
    Ts = np.broadcast_to(np.asarray(Ts), t0s.shape)
    chunk = _clamped_chunk(t0s, wi, chunk)
    t0s_p, B = _pad_to(t0s, n_sweep * chunk)
    Ts_p, _ = _pad_to(Ts, n_sweep * chunk)

    # Shifted time grids (edge-replicated): dt at the global edges is 0,
    # so the edge segments vanish exactly like the single-device kernel's
    # zero padding.
    t_prev = np.concatenate([times[:1], times[:-1]])
    t_next = np.concatenate([times[1:], times[-1:]])

    spec_rep = (P(),) * 4

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P("time"), P("time"), P("time"), P(None, "time"),
                  P(None, "time")) + spec_rep + (P("sweep"), P("sweep")),
        out_specs=(P("sweep"), P("sweep"), P("sweep")),
    )
    def run(t_loc, tp_loc, tn_loc, dre_, dim_, wr_, wi_, mre_, mim_,
            t0_loc, T_loc):
        nc = t0_loc.shape[0] // chunk

        def one_chunk(args):
            t0c, Tc = args
            tref = t0c[0]
            dt0 = jnp.maximum(t_loc - tref, 0.0)
            E = jnp.exp(wi_[None, :] * dt0[:, None])
            ph = wr_[None, :] * dt0[:, None]
            P0 = E * jnp.cos(ph)
            Q0 = -E * jnp.sin(ph)
            J = wr_.shape[0]
            I = dre_.shape[0]
            Kl = t_loc.shape[0]
            if not analytic:
                A1 = (P0[:, :, None] * P0[:, None, :]
                      + Q0[:, :, None] * Q0[:, None, :]).reshape(Kl, J * J)
                A2 = (P0[:, :, None] * Q0[:, None, :]
                      - Q0[:, :, None] * P0[:, None, :]).reshape(Kl, J * J)
            R1 = (P0[:, None, :] * dre_.T[:, :, None]
                  + Q0[:, None, :] * dim_.T[:, :, None]).reshape(Kl, I * J)
            R2 = (P0[:, None, :] * dim_.T[:, :, None]
                  - Q0[:, None, :] * dre_.T[:, :, None]).reshape(Kl, I * J)

            def win(t):
                return ((t[None, :] >= t0c[:, None])
                        & (t[None, :] < (t0c + Tc)[:, None])) \
                    .astype(t_loc.dtype)

            W = win(t_loc)                         # (Bc, Kl)
            Wp = win(tp_loc)
            Wn = win(tn_loc)
            # Trapezoid weights from locally-computable neighbour
            # segments: tau_k = seg(k-1, k) + seg(k, k+1).
            seg_next = W * Wn * (tn_loc - t_loc)[None, :] * 0.5
            seg_prev = Wp * W * (t_loc - tp_loc)[None, :] * 0.5
            Tau = seg_prev + seg_next

            if analytic:
                # Per-shard closed-form Gram partials: the local
                # in-window range is contiguous, so each shard's
                # contribution is its own geometric series; the
                # trapezoid half-weights are subtracted only at edges
                # this shard OWNS globally (previous/next GLOBAL
                # sample out-of-window, or a replicated grid edge
                # where dt=0), so the psum reassembles the global
                # trapezoid sum exactly.
                a_loc = jnp.sum(
                    (t_loc[None, :] < t0c[:, None]).astype(jnp.int32),
                    axis=1)
                m_loc = jnp.sum(W.astype(jnp.int32), axis=1)
                ai = jnp.clip(a_loc, 0, Kl - 1)
                ei = jnp.clip(a_loc + m_loc - 1, 0, Kl - 1)
                s_loc = jnp.maximum(jnp.take(t_loc, ai) - tref, 0.0)
                prev_in = jnp.take_along_axis(Wp, ai[:, None], 1)[:, 0]
                next_in = jnp.take_along_axis(Wn, ei[:, None], 1)[:, 0]
                dprev = jnp.take(t_loc - tp_loc, ai)
                dnext = jnp.take(tn_loc - t_loc, ei)
                own_s = ((prev_in == 0) | (dprev == 0.0)) \
                    .astype(t_loc.dtype)[:, None, None]
                own_e = ((next_in == 0) | (dnext == 0.0)) \
                    .astype(t_loc.dtype)[:, None, None]
                dlt = (t_loc[-1] - t_loc[0]) / (Kl - 1)
                g_re, g_im, gt_re, gt_im = _geom_grams_core(
                    dlt, Kl, wr_, wi_, s_loc, m_loc,
                    edge_first=own_s, edge_last=own_e)
                Gt_re = jax.lax.psum(g_re, "time")
                Gt_im = jax.lax.psum(g_im, "time")
                Gtau_re = jax.lax.psum(gt_re, "time")
                Gtau_im = jax.lax.psum(gt_im, "time")
            else:
                Gt_re = jax.lax.psum(W @ A1, "time").reshape(-1, J, J)
                Gt_im = jax.lax.psum(W @ A2, "time").reshape(-1, J, J)
                Gtau_re = jax.lax.psum(Tau @ A1, "time").reshape(-1, J, J)
                Gtau_im = jax.lax.psum(Tau @ A2, "time").reshape(-1, J, J)
            pd_re = jax.lax.psum(W @ R1, "time").reshape(-1, I, J)
            pd_im = jax.lax.psum(W @ R2, "time").reshape(-1, I, J)
            pdt_re = jax.lax.psum(Tau @ R1, "time").reshape(-1, I, J)
            pdt_im = jax.lax.psum(Tau @ R2, "time").reshape(-1, I, J)
            dnorm = jax.lax.psum(
                Tau @ jnp.sum(dre_ * dre_ + dim_ * dim_, axis=0), "time")

            M_re = mre_.T @ mre_ + mim_.T @ mim_
            M_im = mre_.T @ mim_ - mim_.T @ mre_
            G_re = M_re[None] * Gt_re - M_im[None] * Gt_im
            G_im = M_re[None] * Gt_im + M_im[None] * Gt_re
            G2_re = M_re[None] * Gtau_re - M_im[None] * Gtau_im
            G2_im = M_re[None] * Gtau_im + M_im[None] * Gtau_re

            rhs_re = jnp.einsum("ij,bij->bj", mre_, pd_re) \
                + jnp.einsum("ij,bij->bj", mim_, pd_im)
            rhs_im = jnp.einsum("ij,bij->bj", mre_, pd_im) \
                - jnp.einsum("ij,bij->bj", mim_, pd_re)
            rt_re = jnp.einsum("ij,bij->bj", mre_, pdt_re) \
                + jnp.einsum("ij,bij->bj", mim_, pdt_im)
            rt_im = jnp.einsum("ij,bij->bj", mre_, pdt_im) \
                - jnp.einsum("ij,bij->bj", mim_, pdt_re)

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
            g = jnp.exp(wi_[None, :] * delta)
            cph = jnp.cos(wr_[None, :] * delta)
            sph = jnp.sin(wr_[None, :] * delta)
            Cre = g * (C0re * cph + C0im * sph)
            Cim = g * (C0im * cph - C0re * sph)
            return Cre, Cim, mm

        Cre, Cim, mm = jax.lax.map(
            one_chunk, (t0_loc.reshape(nc, chunk),
                        T_loc.reshape(nc, chunk)))
        J = wr_.shape[0]
        return (Cre.reshape(-1, J), Cim.reshape(-1, J), mm.reshape(-1))

    Cre, Cim, mm = jax.jit(run)(
        times, t_prev, t_next, np.asarray(dre), np.asarray(dim),
        np.asarray(wr), np.asarray(wi), np.asarray(mre), np.asarray(mim),
        t0s_p, Ts_p)
    return Cre[:B], Cim[:B], mm[:B]
