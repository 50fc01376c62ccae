"""Decompose the factored mode-set sweep's device time by stage.

Times, on the exact bench.py problem (S=16, B=2048, chunk=512):
  full kernel / assembly only (integrand build + window matmuls) /
  transcendental build only / batched embedded-Cholesky solve only.

Usage: python scripts/perf_decompose.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def bench_fn(fn, args, reps=5):
    import jax
    out = fn(*args)
    out = jax.tree.leaves(out)[-1]
    np.asarray(out)
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
    from qnmfits_tpu.ops.chol import cholesky_solve_unrolled

    dev = jax.devices()[0]
    times, data, omegas, mus, masks, t0s, Ts, syn = bench.build_problem()
    S, B = omegas.shape[0], t0s.shape[0]
    J = omegas.shape[1]
    n = S * B
    chunk = 512
    f64 = np.float64
    a = [jax.device_put(np.asarray(x, f64), dev) for x in (
        times, data.real, data.imag, omegas.real, omegas.imag,
        mus.real, mus.imag, t0s, Ts)]
    a.append(jax.device_put(masks, dev))
    print(f"device={dev} S={S} B={B} J={J} chunk={chunk}", file=sys.stderr)

    # 1. full kernel
    full = jax.jit(lambda *x: er.sweep_t0_modesets_factored_real(
        *x, chunk=chunk))
    el = bench_fn(full, a)
    print(f"full kernel        : {el*1e3:7.1f} ms  {n/el:9.0f} fits/s")

    # 2. transcendentals only (P0/Q0 per set)
    def trans_only(times, dre, dim, wrs, wis, mres, mims, t0s, Ts, masks):
        def per_set(wr, wi):
            dt0 = jnp.maximum(times - t0s[0], 0.0)
            E = jnp.exp(wi[None, :] * dt0[:, None])
            ph = wr[None, :] * dt0[:, None]
            return jnp.sum(E * jnp.cos(ph)) + jnp.sum(-E * jnp.sin(ph))
        return jnp.sum(jax.vmap(per_set)(wrs, wis))
    el = bench_fn(jax.jit(trans_only), a)
    print(f"transcendentals    : {el*1e3:7.1f} ms  (x{B//chunk} chunks in full)")

    # 3. assembly only: integrands + (W,Tau) matmuls, all chunks
    def assembly(times, dre, dim, wrs, wis, mres, mims, t0s, Ts, masks):
        K = times.shape[0]
        I = dre.shape[0]
        nc = B // chunk
        t0r = t0s.reshape(nc, chunk)
        Tr = Ts.reshape(nc, chunk)

        def per_set(wr, wi):
            def one_chunk(args):
                t0c, Tc = args
                dt0 = jnp.maximum(times - t0c[0], 0.0)
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
                X = jnp.concatenate([A1, A2, R1, R2], axis=1)
                W = ((times[None, :] >= t0c[:, None])
                     & (times[None, :] < (t0c + Tc)[:, None])
                     ).astype(times.dtype)
                dts = times[1:] - times[:-1]
                seg = W[:, :-1] * W[:, 1:] * dts[None, :] * 0.5
                zero = jnp.zeros((W.shape[0], 1), dtype=W.dtype)
                Tau = (jnp.concatenate([seg, zero], axis=1)
                       + jnp.concatenate([zero, seg], axis=1))
                return jnp.sum(W @ X) + jnp.sum(Tau @ X)
            return jnp.sum(jax.lax.map(one_chunk, (t0r, Tr)))
        return jnp.sum(jax.vmap(per_set)(wrs, wis))
    el = bench_fn(jax.jit(assembly), a)
    print(f"assembly (int+mm)  : {el*1e3:7.1f} ms")

    # 4. solve only: batched embedded Cholesky on synthetic PD systems
    rng = np.random.default_rng(0)
    M = rng.standard_normal((n, J, 2 * J))
    G = M @ np.swapaxes(M, -1, -2) + 3 * np.eye(J)[None]
    Gim = np.zeros_like(G)
    rhs = rng.standard_normal((n, J))
    Gd = jax.device_put(G, dev)
    Gimd = jax.device_put(Gim, dev)
    rd = jax.device_put(rhs, dev)

    def solve_only(G, Gim, rhs):
        E, b, Di = er._regularised_embed(G, Gim, rhs, rhs)
        x = cholesky_solve_unrolled(E, b)
        return jnp.sum(x)
    el = bench_fn(jax.jit(solve_only), (Gd, Gimd, rd))
    print(f"solve ({n}x{2*J}x{2*J}): {el*1e3:7.1f} ms")

    # 5. window matmuls only (materialized X), to separate integrand
    #    build from the MXU matmul
    X = rng.standard_normal((S, 2001, 2 * J * J + 2 * 2 * J)).astype(f64)
    Wm = rng.standard_normal((chunk, 2001)).astype(f64)
    Xd = jax.device_put(X, dev)
    Wd = jax.device_put(Wm, dev)

    def mm_only(W, X):
        nc = B // chunk
        def per_set(Xs):
            return sum(jnp.sum(W @ Xs) for _ in range(nc * 2))  # W and Tau
        return jnp.sum(jax.vmap(per_set)(X))
    el = bench_fn(jax.jit(mm_only), (Wd, Xd))
    flops = 2 * chunk * 2001 * X.shape[-1] * S * (B // chunk) * 2
    print(f"window matmuls only: {el*1e3:7.1f} ms  "
          f"({flops/el/1e12:.2f} TFLOP/s f64)")


if __name__ == "__main__":
    main()
