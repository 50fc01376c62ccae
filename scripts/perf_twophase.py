"""Two-phase factored sweep prototype: chunked assembly, ONE global solve.

The stage decomposition (scripts/perf_stage_analytic.py, VERDICT r4
item 1) shows the batched J x J solve standalone at 148 ms of the
265 ms analytic bench kernel -- and the solve runs INSIDE the lax.map
over 16 chunks, so its ~300 unrolled ds ops are dispatched 16 times
sequentially.  Here the kernel is split:

  phase 1 (chunked, as shipped): phi0 basis, data projections,
          closed-form Grams -- everything K-sized stays bounded by the
          chunk; only the small per-item outputs (G, Gtau, rhs, rt,
          dnorm, delta) accumulate across chunks.
  phase 2 (monolithic): ONE equilibrated split-complex Cholesky over
          all S x B systems + the mismatch/rephase epilogue.

The same restructure is prototyped for the (Mf, chif) grid kernel
(sweep_spectra_real), whose chunk=64 solves use 64 VPU lanes each.

Usage:  PYTHONPATH=.:/root/.axon_site python scripts/perf_twophase.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def bench_fn(fn, args, reps=5):
    import jax
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[-1])
    ts = []
    for _ in range(reps):
        t = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[-1])
        ts.append(time.perf_counter() - t)
    return min(ts), out


def main():
    import jax
    import jax.numpy as jnp
    import bench
    from qnmfits_tpu import engine_real as er

    dev = jax.devices()[0]
    times, data, omegas, mus, masks, t0s, Ts, syn = bench.build_problem()
    S, B = omegas.shape[0], t0s.shape[0]
    J = omegas.shape[1]
    I = data.shape[0]
    K = times.shape[0]
    n = S * B
    chunk = 512
    nc = B // chunk
    f64 = np.float64
    a = [jax.device_put(np.asarray(x, f64), dev) for x in (
        times, data.real, data.imag, omegas.real, omegas.imag,
        mus.real, mus.imag, t0s, Ts)]
    a.append(jax.device_put(masks, dev))
    print(f"# device={dev} S={S} B={B} J={J} I={I} K={K} chunk={chunk}",
          file=sys.stderr)

    # ---- baseline: shipped analytic kernel ---------------------------
    full = jax.jit(lambda *x: er.sweep_t0_modesets_factored_real(
        *x, chunk=chunk, analytic=True))
    el0, out0 = bench_fn(full, a)
    mm0 = np.asarray(out0[2])
    print(f"shipped analytic     : {el0*1e3:7.1f} ms  {n/el0:9.0f} fits/s")

    # ---- two-phase variant -------------------------------------------
    def assemble_chunk(times, dre, dim, wr, wi, mre, mim, t0c, Tc, mask):
        """Per-chunk assembly: everything of _chunk_sweep_factored up to
        (but not including) the solve.  Returns per-item smalls."""
        tref = t0c[0]
        dt0 = jnp.maximum(times - tref, 0.0)
        E = jnp.exp(wi[None, :] * dt0[:, None])
        ph = wr[None, :] * dt0[:, None]
        P0 = E * jnp.cos(ph)
        Q0 = -E * jnp.sin(ph)
        R1 = (P0[:, None, :] * dre.T[:, :, None]
              + Q0[:, None, :] * dim.T[:, :, None]).reshape(K, I * J)
        R2 = (P0[:, None, :] * dim.T[:, :, None]
              - Q0[:, None, :] * dre.T[:, :, None]).reshape(K, I * J)
        W = ((times[None, :] >= t0c[:, None])
             & (times[None, :] < (t0c + Tc)[:, None])).astype(times.dtype)
        a_w = jnp.sum((times[None, :] < t0c[:, None]).astype(jnp.int32),
                      axis=1)
        m_w = jnp.sum(W.astype(jnp.int32), axis=1)
        Gt_re, Gt_im, Gtau_re, Gtau_im = er._analytic_grams(
            times, wr, wi, t0c, a_w, m_w)
        S2 = jnp.sum(dre * dre + dim * dim, axis=0)
        R = jnp.concatenate([R1, R2, S2[:, None]], axis=1)
        WR = W @ R
        e_w = jnp.clip(a_w + m_w - 1, 0, K - 1)
        a_wc = jnp.clip(a_w, 0, K - 1)
        dlt = er._fitted_step(times)
        nonempty = (m_w > 0).astype(W.dtype)[:, None]
        TR = (dlt * WR - 0.5 * dlt * (R[a_wc] + R[e_w])) * nonempty
        pd_re = WR[:, :I * J].reshape(-1, I, J)
        pd_im = WR[:, I * J:2 * I * J].reshape(-1, I, J)
        pdt_re = TR[:, :I * J].reshape(-1, I, J)
        pdt_im = TR[:, I * J:2 * I * J].reshape(-1, I, J)
        dnorm = TR[:, -1]

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

        keep = mask
        kk = (keep[:, None] & keep[None, :])[None]
        eye = jnp.eye(J, dtype=G_re.dtype)[None]
        G_re = jnp.where(kk, G_re, eye)
        G_im = jnp.where(kk, G_im, 0.0)
        rhs_re = jnp.where(keep[None], rhs_re, 0.0)
        rhs_im = jnp.where(keep[None], rhs_im, 0.0)
        delta = t0c - tref
        return (G_re, G_im, G2_re, G2_im, rhs_re, rhs_im, rt_re, rt_im,
                dnorm, delta)

    def twophase(times, dre, dim, wrs, wis, mres, mims, t0s, Ts, masks):
        t0r = t0s.reshape(nc, chunk)
        Tr = Ts.reshape(nc, chunk)

        def per_chunk(args):
            t0c, Tc = args
            return jax.vmap(
                lambda wr, wi, mre, mim, mask: assemble_chunk(
                    times, dre, dim, wr, wi, mre, mim, t0c, Tc, mask)
            )(wrs, wis, mres, mims, masks)

        smalls = jax.lax.map(per_chunk, (t0r, Tr))
        # Shapes: (nc, S, chunk, ...) -> (S*B, ...)
        def flat(x):
            x = jnp.moveaxis(x, 0, 1)            # (S, nc, chunk, ...)
            return x.reshape((S * B,) + x.shape[3:])
        (G_re, G_im, G2_re, G2_im, rhs_re, rhs_im, rt_re, rt_im, dnorm,
         delta) = [flat(x) for x in smalls]

        C0re, C0im = er._regularised_solve(G_re, G_im, rhs_re, rhs_im)

        num = jnp.sum(C0re * rt_re + C0im * rt_im, axis=-1)
        GC_re = jnp.einsum("bjl,bl->bj", G2_re, C0re) \
            - jnp.einsum("bjl,bl->bj", G2_im, C0im)
        GC_im = jnp.einsum("bjl,bl->bj", G2_re, C0im) \
            + jnp.einsum("bjl,bl->bj", G2_im, C0re)
        model_norm = jnp.sum(C0re * GC_re + C0im * GC_im, axis=-1)
        mm = 1.0 - num / jnp.sqrt(model_norm * dnorm)

        wi_b = jnp.repeat(wis, B, axis=0)        # (S*B, J)
        wr_b = jnp.repeat(wrs, B, axis=0)
        g = jnp.exp(wi_b * delta[:, None])
        cph = jnp.cos(wr_b * delta[:, None])
        sph = jnp.sin(wr_b * delta[:, None])
        Cre = g * (C0re * cph + C0im * sph)
        Cim = g * (C0im * cph - C0re * sph)
        return (Cre.reshape(S, B, J), Cim.reshape(S, B, J),
                mm.reshape(S, B))

    tp = jax.jit(twophase)
    el1, out1 = bench_fn(tp, a)
    mm1 = np.asarray(out1[2])
    print(f"two-phase            : {el1*1e3:7.1f} ms  {n/el1:9.0f} fits/s "
          f"({el0/el1:.2f}x)")
    print(f"max |mm diff| vs shipped: {np.max(np.abs(mm1 - mm0)):.2e}")
    print(f"max |C diff|  vs shipped: "
          f"{np.max(np.abs(np.asarray(out1[0]) - np.asarray(out0[0]))):.2e}")

    # ---- grid kernel: two-phase --------------------------------------
    # res=50-equivalent workload: Q=2500 spectra, J=7, I=1.
    rng = np.random.default_rng(5)
    Q, Jg = 2500, 7
    base_w = omegas[7, :Jg]
    scale = np.linspace(0.9, 1.1, Q)
    wrs_g = np.asarray(np.real(base_w)[None, :] / scale[:, None], f64)
    wis_g = np.asarray(np.imag(base_w)[None, :] / scale[:, None], f64)
    mres_g = np.ones((Q, 1, Jg), f64)
    mims_g = np.zeros((Q, 1, Jg), f64)
    t0g = np.float64(2.5)
    wg = ((np.asarray(times) >= 2.5)
          & (np.asarray(times) < 102.5)).astype(f64)
    ag = [jax.device_put(np.asarray(x), dev) for x in (
        times, data.real[:1], data.imag[:1], wrs_g, wis_g, mres_g,
        mims_g)] + [t0g, jax.device_put(wg, dev)]

    for gchunk in (64,):
        grid0 = jax.jit(lambda t, dr, di, w1, w2, m1, m2, t0_, w_:
                        er.sweep_spectra_real(t, dr, di, w1, w2, m1, m2,
                                              t0_, w_, chunk=gchunk,
                                              analytic=True))
        elg0, outg0 = bench_fn(grid0, ag)
        mmg0 = np.asarray(outg0[2])
        print(f"grid shipped (chunk={gchunk}): {elg0*1e3:7.1f} ms  "
              f"{Q/elg0:9.0f} fits/s")

    def grid_twophase(times, dre, dim, wrs_, wis_, mres_, mims_, t0_, w_):
        tau_s, m_s = er._window_scalars(times, w_, t0_)

        def one_assemble(wr, wi, mre, mim):
            dt = (times[:, None] - t0_) * w_[:, None]
            E = jnp.exp(wi[None, :] * dt)
            ph = wr[None, :] * dt
            P = E * jnp.cos(ph)
            Qm = -E * jnp.sin(ph)
            Pw = P * w_[:, None]
            Qw = Qm * w_[:, None]
            Gt_re, Gt_im, Gtau_re, Gtau_im = er._analytic_gram_window(
                times, wr, wi, t0_, w_)
            M_re = mre.T @ mre + mim.T @ mim
            M_im = mre.T @ mim - mim.T @ mre
            G_re = M_re * Gt_re - M_im * Gt_im
            G_im = M_re * Gt_im + M_im * Gt_re
            G2_re = M_re * Gtau_re - M_im * Gtau_im
            G2_im = M_re * Gtau_im + M_im * Gtau_re
            dwre = dre * w_[None, :]
            dwim = dim * w_[None, :]
            pd_re = dwre @ Pw + dwim @ Qw
            pd_im = dwim @ Pw - dwre @ Qw
            rhs_re = jnp.sum(mre * pd_re + mim * pd_im, axis=0)
            rhs_im = jnp.sum(mre * pd_im - mim * pd_re, axis=0)
            tau = er._trapz_weights(times, w_)
            Pt = P * tau[:, None]
            Qt = Qm * tau[:, None]
            pdt_re = dre @ Pt + dim @ Qt
            pdt_im = dim @ Pt - dre @ Qt
            rt_re = jnp.sum(mre * pdt_re + mim * pdt_im, axis=0)
            rt_im = jnp.sum(mre * pdt_im - mim * pdt_re, axis=0)
            dnorm = jnp.sum(tau[None, :] * (dre * dre + dim * dim))
            return (G_re, G_im, G2_re, G2_im, rhs_re, rhs_im, rt_re,
                    rt_im, dnorm)

        smalls = jax.lax.map(lambda x: one_assemble(*x),
                             (wrs_, wis_, mres_, mims_), batch_size=64)
        (G_re, G_im, G2_re, G2_im, rhs_re, rhs_im, rt_re, rt_im,
         dnorm) = smalls
        C0re, C0im = er._regularised_solve(G_re, G_im, rhs_re, rhs_im)
        num = jnp.sum(C0re * rt_re + C0im * rt_im, axis=-1)
        GC_re = jnp.einsum("bjl,bl->bj", G2_re, C0re) \
            - jnp.einsum("bjl,bl->bj", G2_im, C0im)
        GC_im = jnp.einsum("bjl,bl->bj", G2_re, C0im) \
            + jnp.einsum("bjl,bl->bj", G2_im, C0re)
        model_norm = jnp.sum(C0re * GC_re + C0im * GC_im, axis=-1)
        mm = 1.0 - num / jnp.sqrt(model_norm * dnorm)
        return C0re, C0im, mm

    gridtp = jax.jit(grid_twophase)
    elg1, outg1 = bench_fn(gridtp, ag)
    mmg1 = np.asarray(outg1[2])
    print(f"grid two-phase       : {elg1*1e3:7.1f} ms  {Q/elg1:9.0f} "
          f"fits/s ({elg0/elg1:.2f}x)")
    print(f"grid max |mm diff|: {np.max(np.abs(mmg1 - mmg0)):.2e}")


if __name__ == "__main__":
    main()
