"""Grid-kernel shoot-out + MFU accounting (PERF.md section 10).

Compares the per-item grid kernel (sweep_spectra_real) against the
blocked-contraction variant (sweep_spectra_blocked_real) on the res=50
grid workload, measures the f64-emulation matmul ceiling, and prints an
MFU table for the shipped kernels.

Run on the TPU:  PYTHONPATH=/root/repo:/root/.axon_site python
scripts/perf_grid_blocked.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from qnmfits_tpu.engine_real import (sweep_spectra_blocked_real,
                                     sweep_spectra_real)

REPS = 5


def timed(fn, *args):
    out = fn(*args)
    np.asarray(out[-1])                     # force
    ts = []
    for _ in range(REPS):
        t = time.perf_counter()
        out = fn(*args)
        np.asarray(out[-1])
        ts.append(time.perf_counter() - t)
    return min(ts)


def main():
    dev = jax.devices()[0]
    print("device:", dev)

    # -- ceiling: large square f64 matmul ------------------------------
    n = 4096
    a = jnp.asarray(np.random.default_rng(0).standard_normal((n, n)))
    mm_fn = jax.jit(lambda x: x @ x)
    t = timed(mm_fn, a)
    ceiling = 2 * n**3 / t
    print(f"f64-emulation matmul ceiling: {ceiling/1e12:.2f} TFLOP/s "
          f"({n}x{n}, min of {REPS})")

    # -- grid workload (res=50 shapes) ---------------------------------
    rng = np.random.default_rng(1)
    K, Q, J, I = 2001, 2500, 8, 1
    times = np.linspace(-20.0, 180.0, K)
    omega = (0.4 + 0.4 * rng.random((Q, J))) \
        - 1j * (0.05 + 0.35 * rng.random((Q, J)))
    mu = np.ones((Q, I, J), complex)
    data = rng.standard_normal((I, K)) + 1j * rng.standard_normal((I, K))
    w = ((times >= 0.0) & (times < 100.0)).astype(float)
    args = (times, data.real.copy(), data.imag.copy(),
            omega.real.copy(), omega.imag.copy(),
            mu.real.copy(), mu.imag.copy(), 0.0, w)

    # FLOPs per item for the per-item kernel: 8 Gram products of
    # K*J^2 MACs (4 for W, 4 for tau) x 2 flops.
    flops_item = Q * 8 * K * J * J * 2

    for label, fn in (
        ("per-item chunk=64",
         jax.jit(lambda *a: sweep_spectra_real(*a, chunk=64))),
        ("blocked Qb=8",
         jax.jit(lambda *a: sweep_spectra_blocked_real(*a, block=8))),
        ("blocked Qb=16",
         jax.jit(lambda *a: sweep_spectra_blocked_real(*a, block=16))),
        ("blocked Qb=32",
         jax.jit(lambda *a: sweep_spectra_blocked_real(*a, block=32))),
    ):
        t0 = time.perf_counter()
        t = timed(fn, *args)
        t_first = time.perf_counter() - t0 - REPS * t
        rate = Q / t
        mfu = flops_item / t / ceiling
        print(f"{label:20s}: {t*1e3:8.1f} ms  {rate:8.0f} fits/s  "
              f"useful-FLOP MFU {100*mfu:5.2f}%  "
              f"(first-call overhead ~{t_first:.0f}s)")


if __name__ == "__main__":
    main()
