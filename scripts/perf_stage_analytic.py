"""Stage decomposition of the ANALYTIC factored mode-set sweep.

VERDICT r4 item 1: PERF.md section 22 claims the post-analytic bench
kernel's wall time splits across the geometric-series recursion, the
(Bc, J, J) transcendentals, the batched J x J Cholesky and the data
projections "none individually dominant" -- measure it (section-10
style table).  Each stage is timed standalone at the exact bench shape
(S=16, B=8192, chunk=512, K=2001, J=8, I=2), with the same
lax.map-over-chunks x vmap-over-sets structure as the shipped kernel.

Stages:
  full        the shipped analytic kernel
  win         window indicators W + (a, m) scalars
  phase       + phi0 basis P0/Q0 and data integrands R1/R2
  proj        + the (Bc,K)@(K,2IJ+1) data projections and TR gathers
  gram        window scalars + closed-form geometric-series Grams
  gram-trans  the (Bc,J,J) transcendental subset of `gram` (F factor)
  solve       standalone batched equilibrated Cholesky at (S,Bc,J,J)
  epilogue    Mmu/rhs/mismatch/rephase on precomputed Grams+projections

Usage:  PYTHONPATH=.:/root/.axon_site python scripts/perf_stage_analytic.py
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
    return min(ts)


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

    rows = []

    def record(label, el, extra=""):
        rows.append((label, el))
        print(f"{label:12s}: {el*1e3:7.1f} ms  {n/el:9.0f} fits/s {extra}")

    # ---- full analytic kernel ----------------------------------------
    full = jax.jit(lambda *x: er.sweep_t0_modesets_factored_real(
        *x, chunk=chunk, analytic=True))
    record("full", bench_fn(full, a))

    # ---- stage helpers: replicate the kernel's loop structure --------
    def chunked_per_set(body):
        """lax.map over chunks; body(t0c, Tc, wr, wi, mre, mim) vmapped
        over sets inside, reduced to a scalar to defeat DCE."""
        def fn(times, dre, dim, wrs, wis, mres, mims, t0s, Ts, masks):
            t0r = t0s.reshape(nc, chunk)
            Tr = Ts.reshape(nc, chunk)

            def one_chunk(args):
                t0c, Tc = args
                return jax.vmap(
                    lambda wr, wi, mre, mim: body(
                        times, dre, dim, t0c, Tc, wr, wi, mre, mim)
                )(wrs, wis, mres, mims)
            return jnp.sum(jax.lax.map(one_chunk, (t0r, Tr)))
        return jax.jit(fn)

    # ---- win: indicators + window scalars ----------------------------
    def win_body(times, dre, dim, t0c, Tc, wr, wi, mre, mim):
        W = ((times[None, :] >= t0c[:, None])
             & (times[None, :] < (t0c + Tc)[:, None])).astype(times.dtype)
        a_w = jnp.sum((times[None, :] < t0c[:, None]).astype(jnp.int32),
                      axis=1)
        m_w = jnp.sum(W.astype(jnp.int32), axis=1)
        return jnp.sum(W) + jnp.sum(a_w) + jnp.sum(m_w)
    record("win", bench_fn(chunked_per_set(win_body), a))

    # ---- phase: P0/Q0 + R integrands ---------------------------------
    def phase_body(times, dre, dim, t0c, Tc, wr, wi, mre, mim):
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
        return jnp.sum(R1) + jnp.sum(R2)
    record("phase", bench_fn(chunked_per_set(phase_body), a))

    # ---- proj: + W@R matmuls and TR gathers --------------------------
    def proj_body(times, dre, dim, t0c, Tc, wr, wi, mre, mim):
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
        S2 = jnp.sum(dre * dre + dim * dim, axis=0)
        R = jnp.concatenate([R1, R2, S2[:, None]], axis=1)
        WR = W @ R
        e_w = jnp.clip(a_w + m_w - 1, 0, K - 1)
        a_wc = jnp.clip(a_w, 0, K - 1)
        dlt = er._fitted_step(times)
        nonempty = (m_w > 0).astype(W.dtype)[:, None]
        TR = (dlt * WR - 0.5 * dlt * (R[a_wc] + R[e_w])) * nonempty
        return jnp.sum(WR) + jnp.sum(TR)
    record("proj", bench_fn(chunked_per_set(proj_body), a))

    # ---- gram: window scalars + closed-form Grams --------------------
    def gram_body(times, dre, dim, t0c, Tc, wr, wi, mre, mim):
        W = ((times[None, :] >= t0c[:, None])
             & (times[None, :] < (t0c + Tc)[:, None])).astype(times.dtype)
        a_w = jnp.sum((times[None, :] < t0c[:, None]).astype(jnp.int32),
                      axis=1)
        m_w = jnp.sum(W.astype(jnp.int32), axis=1)
        Gt_re, Gt_im, Gtau_re, Gtau_im = er._analytic_grams(
            times, wr, wi, t0c, a_w, m_w)
        return (jnp.sum(Gt_re) + jnp.sum(Gt_im) + jnp.sum(Gtau_re)
                + jnp.sum(Gtau_im))
    record("gram", bench_fn(chunked_per_set(gram_body), a))

    # ---- gram-trans: only the (Bc,J,J) F-factor transcendentals ------
    def gtrans_body(times, dre, dim, t0c, Tc, wr, wi, mre, mim):
        a_w = jnp.sum((times[None, :] < t0c[:, None]).astype(jnp.int32),
                      axis=1)
        tref = t0c[0]
        s_b = jnp.maximum(
            jnp.take(times, jnp.clip(a_w, 0, K - 1)) - tref, 0.0)
        nu_re = (wi[:, None] + wi[None, :])[None]
        nu_im = (wr[:, None] - wr[None, :])[None]
        arg_re = nu_re * s_b[:, None, None]
        arg_im = nu_im * s_b[:, None, None]
        e0 = jnp.exp(arg_re)
        return jnp.sum(e0 * jnp.cos(arg_im)) + jnp.sum(e0 * jnp.sin(arg_im))
    record("gram-trans", bench_fn(chunked_per_set(gtrans_body), a))

    # ---- solve: standalone batched equilibrated Cholesky -------------
    rng = np.random.default_rng(0)
    Ar = rng.standard_normal((S, chunk, J, J))
    Ai = rng.standard_normal((S, chunk, J, J))
    Gre = np.einsum("sbkj,sbkl->sbjl", Ar, Ar) \
        + np.einsum("sbkj,sbkl->sbjl", Ai, Ai) + 3 * np.eye(J)
    Gim = np.einsum("sbkj,sbkl->sbjl", Ar, Ai) \
        - np.einsum("sbkj,sbkl->sbjl", Ai, Ar)
    bre = rng.standard_normal((S, chunk, J))
    bim = rng.standard_normal((S, chunk, J))
    solve_args = [jax.device_put(np.asarray(x, f64), dev)
                  for x in (Gre, Gim, bre, bim)]

    def solve_fn(Gre, Gim, bre, bim):
        def one_chunk(_):
            xre, xim = jax.vmap(er._regularised_solve)(Gre, Gim, bre, bim)
            return jnp.sum(xre) + jnp.sum(xim)
        return jnp.sum(jax.lax.map(one_chunk, jnp.arange(nc)))
    record("solve", bench_fn(jax.jit(solve_fn), solve_args),
           "(same G reused per chunk)")

    # ---- epilogue: Mmu/rhs/mismatch/rephase on precomputed pieces ----
    pd = rng.standard_normal((S, chunk, I, J))
    pdt = rng.standard_normal((S, chunk, I, J))
    dn = np.abs(rng.standard_normal((S, chunk))) + 1.0
    epi_args = solve_args + [
        jax.device_put(np.asarray(x, f64), dev)
        for x in (pd, pd, pdt, pdt, dn)] + [a[5], a[6], a[7]]

    def epi_fn(Gre, Gim, bre, bim, pd_re, pd_im, pdt_re, pdt_im, dn,
               mres, mims, t0s):
        t0r = t0s.reshape(nc, chunk)

        def one_chunk(t0c):
            def per_set(G_re, G_im, rhs_re0, rhs_im0, pd_re, pd_im,
                        pdt_re, pdt_im, dnorm, mre, mim):
                rhs_re = jnp.einsum("ij,bij->bj", mre, pd_re) \
                    + jnp.einsum("ij,bij->bj", mim, pd_im)
                rhs_im = jnp.einsum("ij,bij->bj", mre, pd_im) \
                    - jnp.einsum("ij,bij->bj", mim, pd_re)
                rt_re = jnp.einsum("ij,bij->bj", mre, pdt_re) \
                    + jnp.einsum("ij,bij->bj", mim, pdt_im)
                rt_im = jnp.einsum("ij,bij->bj", mre, pdt_im) \
                    - jnp.einsum("ij,bij->bj", mim, pdt_re)
                C0re, C0im = rhs_re, rhs_im          # stand-in amplitudes
                num = jnp.sum(C0re * rt_re + C0im * rt_im, axis=-1)
                GC_re = jnp.einsum("bjl,bl->bj", G_re, C0re) \
                    - jnp.einsum("bjl,bl->bj", G_im, C0im)
                GC_im = jnp.einsum("bjl,bl->bj", G_re, C0im) \
                    + jnp.einsum("bjl,bl->bj", G_im, C0re)
                model_norm = jnp.sum(C0re * GC_re + C0im * GC_im, axis=-1)
                mm = 1.0 - num / jnp.sqrt(jnp.abs(model_norm) * dnorm)
                delta = (t0c - t0c[0])[:, None]
                g = jnp.exp(-jnp.abs(delta) * 0.1)
                Cre = g * C0re
                Cim = g * C0im
                return jnp.sum(Cre) + jnp.sum(Cim) + jnp.sum(mm)
            return jnp.sum(jax.vmap(per_set)(
                Gre, Gim, bre, bim, pd_re, pd_im, pdt_re, pdt_im, dn,
                mres, mims))
        return jnp.sum(jax.lax.map(one_chunk, t0r))
    record("epilogue", bench_fn(jax.jit(epi_fn), epi_args),
           "(approx: einsums+mm+rephase)")

    print("\n# stage table (standalone; stages overlap, sums exceed full)")
    for label, el in rows:
        print(f"# {label:12s} {el*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
