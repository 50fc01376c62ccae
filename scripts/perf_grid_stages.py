"""(Mf, chif) grid kernel: stage decomposition + restructuring attack.

VERDICT r4 item 2: the analytic grid kernel (PERF.md section 19,
18.3k fits/s at res=50) is 26x off the t0 sweep per fit and its last
stage analysis (section 10) predates the analytic Grams.  Here:

1. stage table at the shipped shape (Q=2500, J=7, I=1, K=2001,
   chunk=64): transcendental phases, projections, analytic Grams,
   solve, epilogue -- each standalone with the shipped lax.map
   structure;
2. chunk-size scan of the shipped kernel (64 was tuned in the
   summation-Gram era, section 4b; the analytic kernel's per-chunk
   working set is far smaller);
3. a restructured "stacked" kernel: window scalars + tau hoisted out
   of the item loop (they are window-constants, recomputed per item in
   the shipped path), analytic Grams for the WHOLE grid in one
   vectorized call (K-independent), chunked phases+projections, and
   one whole-grid solve + epilogue (the two-phase layout that measured
   1.13x, now with the hoists and larger chunks).

Usage:  PYTHONPATH=.:/root/.axon_site python -u scripts/perf_grid_stages.py
(PERF_GRID_PART=scan|stages|stacked runs one part; default all --
first compiles are ~30 s per program on this backend, so parts keep
each run inside a driver timeout.)
"""

import os
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
    K = times.shape[0]
    f64 = np.float64

    # res=50-equivalent workload (matches scripts/perf_twophase.py).
    Q, J, I = 2500, 7, 1
    base_w = omegas[7, :J]
    scale = np.linspace(0.9, 1.1, Q)
    wrs = np.asarray(np.real(base_w)[None, :] / scale[:, None], f64)
    wis = np.asarray(np.imag(base_w)[None, :] / scale[:, None], f64)
    mres = np.ones((Q, I, J), f64)
    mims = np.zeros((Q, I, J), f64)
    t0 = np.float64(2.5)
    w = ((np.asarray(times) >= 2.5)
         & (np.asarray(times) < 102.5)).astype(f64)
    a = [jax.device_put(np.asarray(x), dev) for x in (
        times, data.real[:1], data.imag[:1], wrs, wis, mres, mims)] \
        + [t0, jax.device_put(w, dev)]
    print(f"# device={dev} Q={Q} J={J} I={I} K={K}", file=sys.stderr)

    rows = []
    part = os.environ.get("PERF_GRID_PART", "all")

    def record(label, el, extra=""):
        rows.append((label, el))
        print(f"{label:22s}: {el*1e3:7.1f} ms  {Q/el:9.0f} fits/s {extra}",
              flush=True)

    # ---- shipped kernel, chunk scan -----------------------------------
    chunks = (64, 256, 512, 1024) if part in ("all", "scan") else (64,)
    for chunk in chunks:
        fn = jax.jit(lambda *x, c=chunk: er.sweep_spectra_real(
            *x, chunk=c, analytic=True))
        el, out = bench_fn(fn, a)
        record(f"shipped chunk={chunk}", el)
        if chunk == 64:
            mm0 = np.asarray(out[2])

    if part == "scan":
        return

    # ---- stages (shipped structure: lax.map batch 64) -----------------
    skip_stages = part == "stacked"

    def chunked(body, batch=64):
        def fn(times, dre, dim, wrs, wis, mres, mims, t0_, w_):
            return jax.lax.map(
                lambda x: body(times, dre, dim, *x, t0_, w_),
                (wrs, wis, mres, mims), batch_size=batch)
        return jax.jit(fn)

    def phase_body(times, dre, dim, wr, wi, mre, mim, t0_, w_):
        dt = (times[:, None] - t0_) * w_[:, None]
        E = jnp.exp(wi[None, :] * dt)
        ph = wr[None, :] * dt
        P = E * jnp.cos(ph)
        Qm = -E * jnp.sin(ph)
        return jnp.sum(P) + jnp.sum(Qm)
    if not skip_stages:
        el, _ = bench_fn(chunked(phase_body), a)
        record("phase (transcend.)", el)

    def proj_body(times, dre, dim, wr, wi, mre, mim, t0_, w_):
        dt = (times[:, None] - t0_) * w_[:, None]
        E = jnp.exp(wi[None, :] * dt)
        ph = wr[None, :] * dt
        P = E * jnp.cos(ph)
        Qm = -E * jnp.sin(ph)
        Pw = P * w_[:, None]
        Qw = Qm * w_[:, None]
        dwre = dre * w_[None, :]
        dwim = dim * w_[None, :]
        pd_re = dwre @ Pw + dwim @ Qw
        pd_im = dwim @ Pw - dwre @ Qw
        tau = er._trapz_weights(times, w_)
        Pt = P * tau[:, None]
        Qt = Qm * tau[:, None]
        pdt_re = dre @ Pt + dim @ Qt
        pdt_im = dim @ Pt - dre @ Qt
        return (jnp.sum(pd_re) + jnp.sum(pd_im) + jnp.sum(pdt_re)
                + jnp.sum(pdt_im))
    if not skip_stages:
        el, _ = bench_fn(chunked(proj_body), a)
        record("proj (+phases)", el)

    def gram_body(times, dre, dim, wr, wi, mre, mim, t0_, w_):
        Gt_re, Gt_im, Gtau_re, Gtau_im = er._analytic_gram_window(
            times, wr, wi, t0_, w_)
        return (jnp.sum(Gt_re) + jnp.sum(Gt_im) + jnp.sum(Gtau_re)
                + jnp.sum(Gtau_im))
    if not skip_stages:
        el, _ = bench_fn(chunked(gram_body), a)
        record("gram (analytic)", el)

    # solve standalone: whole-grid batch vs 64-chunks
    rng = np.random.default_rng(0)
    Ar = rng.standard_normal((Q, J, J))
    Ai = rng.standard_normal((Q, J, J))
    Gre = np.einsum("bkj,bkl->bjl", Ar, Ar) \
        + np.einsum("bkj,bkl->bjl", Ai, Ai) + 3 * np.eye(J)
    Gim = np.einsum("bkj,bkl->bjl", Ar, Ai) \
        - np.einsum("bkj,bkl->bjl", Ai, Ar)
    bre = rng.standard_normal((Q, J))
    bim = rng.standard_normal((Q, J))
    sa = [jax.device_put(np.asarray(x, f64), dev)
          for x in (Gre, Gim, bre, bim)]

    def solve_chunked(Gre, Gim, bre, bim):
        return jax.lax.map(lambda x: er._regularised_solve(
            x[0][None], x[1][None], x[2][None], x[3][None]),
            (Gre, Gim, bre, bim), batch_size=64)
    if not skip_stages:
        el, _ = bench_fn(jax.jit(solve_chunked), sa)
        record("solve (64-chunks)", el)

    def solve_whole(Gre, Gim, bre, bim):
        return er._regularised_solve(Gre, Gim, bre, bim)
    if not skip_stages:
        el, _ = bench_fn(jax.jit(solve_whole), sa)
        record("solve (whole grid)", el)

    if part == "stages":
        return

    # ---- restructured kernel ------------------------------------------
    def stacked(chunk):
        def fn(times, dre, dim, wrs_, wis_, mres_, mims_, t0_, w_):
            # Window constants hoisted: identical for every grid point.
            tau = er._trapz_weights(times, w_)
            dwre = dre * w_[None, :]
            dwim = dim * w_[None, :]
            dnorm = jnp.sum(tau[None, :] * (dre * dre + dim * dim))

            # Whole-grid analytic Grams (K-independent; one vectorized
            # geometric-series evaluation over (Q, J, J)).
            s_w, m_w = er._window_scalars(times, w_, t0_)
            nu_re = wis_[:, :, None] + wis_[:, None, :]     # (Q, J, J)
            nu_im = wrs_[:, :, None] - wrs_[:, None, :]
            Gt_re, Gt_im, Gtau_re, Gtau_im = er._geom_series_eval(
                er._fitted_step(times), K, nu_re, nu_im, s_w, m_w)

            # Chunked phases + projections (the only K-sized stage).
            def proj_chunk(x):
                wr, wi = x
                dt = (times[:, None] - t0_) * w_[:, None]
                E = jnp.exp(wi[None, :] * dt)
                ph = wr[None, :] * dt
                P = E * jnp.cos(ph)
                Qm = -E * jnp.sin(ph)
                Pw = P * w_[:, None]
                Qw = Qm * w_[:, None]
                pd_re = dwre @ Pw + dwim @ Qw               # (I, J)
                pd_im = dwim @ Pw - dwre @ Qw
                Pt = P * tau[:, None]
                Qt = Qm * tau[:, None]
                pdt_re = dre @ Pt + dim @ Qt
                pdt_im = dim @ Pt - dre @ Qt
                return pd_re, pd_im, pdt_re, pdt_im

            pd_re, pd_im, pdt_re, pdt_im = jax.lax.map(
                proj_chunk, (wrs_, wis_), batch_size=chunk)

            # Mixing contraction + whole-grid solve + epilogue.
            M_re = jnp.einsum("qij,qik->qjk", mres_, mres_) \
                + jnp.einsum("qij,qik->qjk", mims_, mims_)
            M_im = jnp.einsum("qij,qik->qjk", mres_, mims_) \
                - jnp.einsum("qij,qik->qjk", mims_, mres_)
            G_re = M_re * Gt_re - M_im * Gt_im
            G_im = M_re * Gt_im + M_im * Gt_re
            G2_re = M_re * Gtau_re - M_im * Gtau_im
            G2_im = M_re * Gtau_im + M_im * Gtau_re
            rhs_re = jnp.einsum("qij,qij->qj", mres_, pd_re) \
                + jnp.einsum("qij,qij->qj", mims_, pd_im)
            rhs_im = jnp.einsum("qij,qij->qj", mres_, pd_im) \
                - jnp.einsum("qij,qij->qj", mims_, pd_re)
            rt_re = jnp.einsum("qij,qij->qj", mres_, pdt_re) \
                + jnp.einsum("qij,qij->qj", mims_, pdt_im)
            rt_im = jnp.einsum("qij,qij->qj", mres_, pdt_im) \
                - jnp.einsum("qij,qij->qj", mims_, pdt_re)

            Cre, Cim = er._regularised_solve(G_re, G_im, rhs_re, rhs_im)
            num = jnp.sum(Cre * rt_re + Cim * rt_im, axis=-1)
            GC_re = jnp.einsum("qjl,ql->qj", G2_re, Cre) \
                - jnp.einsum("qjl,ql->qj", G2_im, Cim)
            GC_im = jnp.einsum("qjl,ql->qj", G2_re, Cim) \
                + jnp.einsum("qjl,ql->qj", G2_im, Cre)
            model_norm = jnp.sum(Cre * GC_re + Cim * GC_im, axis=-1)
            mm = 1.0 - num / jnp.sqrt(model_norm * dnorm)
            return Cre, Cim, mm
        return jax.jit(fn)

    # full-K stacked: measured NEUTRAL (148.8 ms vs shipped 139.3 at
    # chunk=64) and chunk>=128 falls off the same cliff as the shipped
    # scan -- re-measure with PERF_GRID_FULLK=1 (each program's first
    # execution pays a ~minutes device load on this backend, so the
    # default run skips it to fit the timeout).
    if os.environ.get("PERF_GRID_FULLK"):
        el, out = bench_fn(stacked(64), a)
        mm1 = np.asarray(out[2])
        record("stacked full-K c=64", el,
               f"max|mm diff|={np.max(np.abs(mm1 - mm0)):.1e}")

    # The SHIPPED configuration: host pre-slice to the contiguous
    # window (exact -- every fit quantity is a window sum), then the
    # stacked kernel (engine_real.sweep_spectra_stacked_real).
    w_np = np.asarray(w)
    idx = np.nonzero(w_np > 0.5)[0]
    sl = slice(int(idx[0]), int(idx[-1]) + 1)
    a_sl = [jax.device_put(np.asarray(x), dev) for x in (
        np.asarray(times)[sl], data.real[:1][:, sl],
        data.imag[:1][:, sl], wrs, wis, mres, mims)] + [t0]
    ship = jax.jit(lambda *x: er.sweep_spectra_stacked_real(*x, chunk=64))
    el, out = bench_fn(ship, a_sl)
    mm2 = np.asarray(out[2])
    record("stacked SLICED c=64", el,
           f"max|mm diff|={np.max(np.abs(mm2 - mm0)):.1e}")

    # Pallas double-single solve for the whole-grid stage (PERF.md 4d:
    # standalone it beats the XLA solve; the 2500-system whole-grid
    # solve IS the standalone case).
    from qnmfits_tpu.ops.chol_pallas import complex_cholesky_solve_ds

    def ship_pallas(times_, dre, dim, wrs_, wis_, mres_, mims_, t0_):
        K_ = times_.shape[0]
        tau = er._trapz_weights(times_, jnp.ones((K_,), times_.dtype))
        dtr = dre * tau[None, :]
        dti = dim * tau[None, :]
        Dstack = jnp.concatenate([dre, dim, dtr, dti], axis=0)
        dnorm = jnp.sum(tau[None, :] * (dre * dre + dim * dim))
        dt = times_ - t0_
        I_ = dre.shape[0]
        s_w = times_[0] - t0_
        nu_re = wis_[:, :, None] + wis_[:, None, :]
        nu_im = wrs_[:, :, None] - wrs_[:, None, :]
        Gt_re, Gt_im, Gtau_re, Gtau_im = er._geom_series_eval(
            er._fitted_step(times_), K_, nu_re, nu_im, s_w,
            jnp.asarray(K_, jnp.int32))

        def proj_chunk(x):
            wr, wi = x
            E = jnp.exp(wi[None, :] * dt[:, None])
            ph = wr[None, :] * dt[:, None]
            P = E * jnp.cos(ph)
            Qm = -E * jnp.sin(ph)
            DP = Dstack @ P
            DQ = Dstack @ Qm
            pd_re = DP[:I_] + DQ[I_:2 * I_]
            pd_im = DP[I_:2 * I_] - DQ[:I_]
            pdt_re = DP[2 * I_:3 * I_] + DQ[3 * I_:]
            pdt_im = DP[3 * I_:] - DQ[2 * I_:3 * I_]
            return pd_re, pd_im, pdt_re, pdt_im

        pd_re, pd_im, pdt_re, pdt_im = jax.lax.map(
            proj_chunk, (wrs_, wis_), batch_size=64)
        M_re = jnp.einsum("qij,qik->qjk", mres_, mres_)             + jnp.einsum("qij,qik->qjk", mims_, mims_)
        M_im = jnp.einsum("qij,qik->qjk", mres_, mims_)             - jnp.einsum("qij,qik->qjk", mims_, mres_)
        G_re = M_re * Gt_re - M_im * Gt_im
        G_im = M_re * Gt_im + M_im * Gt_re
        G2_re = M_re * Gtau_re - M_im * Gtau_im
        G2_im = M_re * Gtau_im + M_im * Gtau_re
        rhs_re = jnp.einsum("qij,qij->qj", mres_, pd_re)             + jnp.einsum("qij,qij->qj", mims_, pd_im)
        rhs_im = jnp.einsum("qij,qij->qj", mres_, pd_im)             - jnp.einsum("qij,qij->qj", mims_, pd_re)
        rt_re = jnp.einsum("qij,qij->qj", mres_, pdt_re)             + jnp.einsum("qij,qij->qj", mims_, pdt_im)
        rt_im = jnp.einsum("qij,qij->qj", mres_, pdt_im)             - jnp.einsum("qij,qij->qj", mims_, pdt_re)

        # Equilibrate in XLA (dead-column masking etc.), Pallas for the
        # Cholesky solve itself, unscale after.
        A, Bm, br, bi, Di = er._equilibrated(G_re, G_im, rhs_re, rhs_im)
        xre, xim = complex_cholesky_solve_ds(A, Bm, br, bi, tile=2048)
        Cre = xre * Di
        Cim = xim * Di
        num = jnp.sum(Cre * rt_re + Cim * rt_im, axis=-1)
        GC_re = jnp.einsum("qjl,ql->qj", G2_re, Cre)             - jnp.einsum("qjl,ql->qj", G2_im, Cim)
        GC_im = jnp.einsum("qjl,ql->qj", G2_re, Cim)             + jnp.einsum("qjl,ql->qj", G2_im, Cre)
        model_norm = jnp.sum(Cre * GC_re + Cim * GC_im, axis=-1)
        mm = 1.0 - num / jnp.sqrt(model_norm * dnorm)
        return Cre, Cim, mm

    el, out = bench_fn(jax.jit(ship_pallas), a_sl)
    mm3 = np.asarray(out[2])
    record("stacked SLICED+pallas", el,
           f"max|mm diff|={np.max(np.abs(mm3 - mm0)):.1e}")

    print("\n# stage table (standalone; stages overlap)")
    for label, el in rows:
        print(f"# {label:22s} {el*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
