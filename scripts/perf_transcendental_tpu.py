"""Micro-bench: f64(double-single) transcendental throughput on the
TPU vs the Gram matmul they would replace (analytic-Gram feasibility,
PERF.md section 18).

Times, at the bench kernel's chunk shape (Bc=512, K=2001, J=8):
  * the Gram-stage matmuls  (Bc,K)@(K,J*J) x4  + A1/A2 construction;
  * the closed-form stage: ~7 transcendentals on (Bc, J*J) arrays;
and checks jnp.expm1/sin/cos accuracy in emulated f64 against CPU x64.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_transcendental_tpu.py
"""

import time

import numpy as np


def timeit(fn, args, n=5):
    out = fn(*args)
    np.asarray(jax_tree_leaf(out))
    reps = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax_tree_leaf(out))
        reps.append(time.perf_counter() - t0)
    return min(reps)


def jax_tree_leaf(x):
    import jax
    return jax.tree_util.tree_leaves(x)[0]


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print("device:", dev)
    Bc, K, J = 512, 2001, 8
    LOOPS = 64    # amortize the ~29 ms tunnel dispatch floor
    rng = np.random.default_rng(0)

    # --- Gram matmul stage (what the closed form would replace) ------
    W = jax.device_put(rng.random((Bc, K)), dev)
    P0 = jax.device_put(rng.random((K, J)), dev)
    Q0 = jax.device_put(rng.random((K, J)), dev)

    @jax.jit
    def gram_stage(W, P0, Q0):
        def body(i, acc):
            P = P0 + 1e-16 * i
            A1 = (P[:, :, None] * P[:, None, :]
                  + Q0[:, :, None] * Q0[:, None, :]).reshape(K, J * J)
            A2 = (P[:, :, None] * Q0[:, None, :]
                  - Q0[:, :, None] * P[:, None, :]).reshape(K, J * J)
            return acc + W @ A1 + W @ A2
        return jax.lax.fori_loop(0, LOOPS, body,
                                 jnp.zeros((Bc, J * J)))

    t = timeit(gram_stage, (W, P0, Q0)) / LOOPS
    print(f"gram matmul stage  (Bc,K)@(K,J^2)x2 + A-build: {t*1e3:8.3f} ms")

    # --- closed-form stage at the same shape -------------------------
    X = jax.device_put(-np.abs(rng.random((Bc, J * J))), dev)
    Y = jax.device_put(rng.random((Bc, J * J)) * 100.0, dev)

    @jax.jit
    def closed_stage(x, y):
        def body(i, acc):
            xx = x + 1e-16 * i
            ea = jnp.exp(xx)
            s, c = jnp.sin(y), jnp.cos(y)
            re = jnp.expm1(xx) - 2.0 * ea * jnp.sin(y / 2) ** 2
            im = ea * s
            re2 = jnp.expm1(2 * xx) - 2.0 * jnp.exp(2 * xx) * jnp.sin(y) ** 2
            im2 = jnp.exp(2 * xx) * jnp.sin(2 * y)
            den = re * re + im * im
            return acc + (re2 * re + im2 * im) / den + ea * c
        return jax.lax.fori_loop(0, LOOPS, body,
                                 jnp.zeros((Bc, J * J)))

    t2 = timeit(closed_stage, (X, Y)) / LOOPS
    print(f"closed-form stage  ~9 transc (Bc,J^2):        {t2*1e3:8.3f} ms")

    # --- accuracy of emulated-f64 transcendentals ---------------------
    x = -np.abs(rng.random(4096)) * np.logspace(-6, 1, 4096)
    y = rng.random(4096) * 200.0
    xg, yg = jax.device_put(x, dev), jax.device_put(y, dev)
    for name, fn, xs, ref in [
        ("exp", jnp.exp, xg, np.exp(x)),
        ("expm1", jnp.expm1, xg, np.expm1(x)),
        ("sin", jnp.sin, yg, np.sin(y)),
        ("cos", jnp.cos, yg, np.cos(y)),
    ]:
        got = np.asarray(jax.jit(fn)(xs))
        rel = np.max(np.abs(got - ref) / np.maximum(np.abs(ref), 1e-300))
        print(f"{name:6s} max rel err vs CPU x64: {rel:.3e}")


if __name__ == "__main__":
    main()
