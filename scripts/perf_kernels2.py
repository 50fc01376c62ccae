"""Round 2 of the kernel shoot-out: overhead floor, merged matmuls,
sweep-size scaling, f32 feasibility.

Usage: python scripts/perf_kernels2.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def bench_fn(fn, args, reps=5):
    import jax
    out = fn(*args)
    jax.block_until_ready(out[-1] if isinstance(out, tuple) else out)
    first = np.asarray(out[-1] if isinstance(out, tuple) else out)
    ts = []
    for _ in range(reps):
        t = time.perf_counter()
        out = fn(*args)
        np.asarray(out[-1] if isinstance(out, tuple) else out)
        ts.append(time.perf_counter() - t)
    return min(ts), first


def main():
    import jax
    import jax.numpy as jnp
    import bench
    from qnmfits_tpu import engine_real as er

    dev = jax.devices()[0]
    print(f"device={dev}")

    # --- 0. dispatch overhead floor: trivial program, tiny transfer -----
    x = jax.device_put(np.ones((8,), np.float32), dev)
    f_triv = jax.jit(lambda x: x + 1.0)
    el, _ = bench_fn(f_triv, (x,), reps=10)
    print(f"overhead floor (trivial jit + 32B fetch): {el*1e3:8.2f} ms")

    # --- problem ---------------------------------------------------------
    times, data, omegas, mus, masks, t0s, Ts, syn = bench.build_problem()
    S, B = omegas.shape[0], t0s.shape[0]

    f64 = np.float64
    def put(B_rep=1, dtype=f64):
        t0r = np.linspace(-5.0, 46.2, B * B_rep)
        Tr = np.full_like(t0r, 100.0)
        host = (times, data.real, data.imag, omegas.real, omegas.imag,
                mus.real, mus.imag, t0r, Tr)
        out = [jax.device_put(np.asarray(h, dtype), dev) for h in host]
        out.append(jax.device_put(masks, dev))
        return out

    a64 = put()

    def vmapped(kernel, chunk, extra=()):
        def f(times, dre, dim, wrs, wis, mres, mims, t0s, Ts, masks):
            return jax.vmap(
                lambda wr, wi, mre, mim, mask: kernel(
                    times, dre, dim, wr, wi, mre, mim, t0s, Ts,
                    col_mask=mask, chunk=chunk)
            )(wrs, wis, mres, mims, masks)
        return jax.jit(f)

    el, ref_mm = bench_fn(vmapped(er.sweep_t0_factored_real, 512), a64)
    n = S * B
    print(f"factored c512 vmap(S) B=512 : {n/el:10.0f} fits/s  "
          f"{el*1e3:7.1f} ms")

    # --- 1. larger sweeps: amortize dispatch -----------------------------
    for B_rep in (4, 16):
        aa = put(B_rep)
        nn = S * B * B_rep
        el, _ = bench_fn(vmapped(er.sweep_t0_factored_real, 512), aa)
        print(f"factored c512 vmap(S) B={B*B_rep:<5d}: {nn/el:10.0f} fits/s"
              f"  {el*1e3:7.1f} ms")

    # --- 2. merged-matmul variant ----------------------------------------
    from qnmfits_tpu.engine_real import _regularised_embed
    from qnmfits_tpu.ops.chol import cholesky_solve_unrolled

    def chunk_merged(times, dre, dim, wr, wi, mre, mim, t0c, Tc, col_mask):
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
        dd = jnp.sum(dre * dre + dim * dim, axis=0)[:, None]
        X = jnp.concatenate([A1, A2, R1, R2, dd], axis=1)  # (K, 2J^2+2IJ+1)

        W = ((times[None, :] >= t0c[:, None])
             & (times[None, :] < (t0c + Tc)[:, None])).astype(times.dtype)
        dts = times[1:] - times[:-1]
        seg = W[:, :-1] * W[:, 1:] * dts[None, :] * 0.5
        zero = jnp.zeros((W.shape[0], 1), dtype=W.dtype)
        Tau = (jnp.concatenate([seg, zero], axis=1)
               + jnp.concatenate([zero, seg], axis=1))
        V = jnp.concatenate([W, Tau], axis=0)               # (2Bc, K)
        Y = V @ X                                           # ONE matmul
        Bc = t0c.shape[0]
        nJJ, nIJ = J * J, I * J
        Wp, Tp = Y[:Bc], Y[Bc:]
        Gt_re = Wp[:, :nJJ].reshape(-1, J, J)
        Gt_im = Wp[:, nJJ:2 * nJJ].reshape(-1, J, J)
        pd_re = Wp[:, 2 * nJJ:2 * nJJ + nIJ].reshape(-1, I, J)
        pd_im = Wp[:, 2 * nJJ + nIJ:2 * nJJ + 2 * nIJ].reshape(-1, I, J)
        Gtau_re = Tp[:, :nJJ].reshape(-1, J, J)
        Gtau_im = Tp[:, nJJ:2 * nJJ].reshape(-1, J, J)
        pdt_re = Tp[:, 2 * nJJ:2 * nJJ + nIJ].reshape(-1, I, J)
        pdt_im = Tp[:, 2 * nJJ + nIJ:2 * nJJ + 2 * nIJ].reshape(-1, I, J)
        dnorm = Tp[:, -1]

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

        Emb, bvec, Di = _regularised_embed(G_re, G_im, rhs_re, rhs_im)
        xs = cholesky_solve_unrolled(Emb, bvec)
        C0re = xs[:, :J] * Di
        C0im = xs[:, J:] * Di
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

    def sweep_merged(times, dre, dim, wr, wi, mre, mim, t0s, Ts,
                     col_mask=None, chunk=512):
        def one_chunk(args):
            t0c, Tc = args
            return chunk_merged(times, dre, dim, wr, wi, mre, mim,
                                t0c, Tc, col_mask)
        Bn = t0s.shape[0]
        pad = (-Bn) % chunk
        if pad:
            t0s = jnp.concatenate([t0s, jnp.full(pad, t0s[-1], t0s.dtype)])
            Ts = jnp.concatenate([Ts, jnp.full(pad, Ts[-1], Ts.dtype)])
        nc = t0s.shape[0] // chunk
        Cre, Cim, mm = jax.lax.map(
            one_chunk, (t0s.reshape(nc, chunk), Ts.reshape(nc, chunk)))
        J = wr.shape[0]
        return (Cre.reshape(-1, J)[:Bn], Cim.reshape(-1, J)[:Bn],
                mm.reshape(-1)[:Bn])

    el, mm = bench_fn(vmapped(sweep_merged, 512), a64)
    print(f"merged   c512 vmap(S) B=512 : {n/el:10.0f} fits/s  "
          f"{el*1e3:7.1f} ms  max|mm-ref|="
          f"{np.nanmax(np.abs(mm - ref_mm)):.2e}")

    for B_rep in (4, 16):
        aa = put(B_rep)
        nn = S * B * B_rep
        el, _ = bench_fn(vmapped(sweep_merged, 512), aa)
        print(f"merged   c512 vmap(S) B={B*B_rep:<5d}: {nn/el:10.0f} fits/s"
              f"  {el*1e3:7.1f} ms")

    # --- 3. f32 feasibility ----------------------------------------------
    a32 = put(1, np.float32)
    try:
        el, mm32 = bench_fn(vmapped(er.sweep_t0_factored_real, 512), a32)
        print(f"factored c512 vmap(S) f32   : {n/el:10.0f} fits/s  "
              f"{el*1e3:7.1f} ms  max|mm-ref|="
              f"{np.nanmax(np.abs(mm32.astype(f64) - ref_mm)):.2e}")
    except Exception as e:  # noqa: BLE001
        print(f"f32 run FAILED: {e}")


if __name__ == "__main__":
    main()
