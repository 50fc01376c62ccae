"""Analytic-Gram kernel timing (PERF.md section 18): the factored
t0 x mode-set sweep at the BENCH shape, summation Grams vs closed-form
geometric-series Grams, on the real TPU.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_analytic_gram.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402  (the bench problem builder)


def main():
    import jax
    from qnmfits_tpu.batched import _safe_chunk
    from qnmfits_tpu.engine_real import sweep_t0_modesets_factored_real

    times, data, omegas, mus, masks, t0s, Ts, syn = bench.build_problem()
    dev = jax.devices()[0]
    print("device:", dev)
    f64 = np.float64
    args_np = (times.astype(f64), data.real.astype(f64),
               data.imag.astype(f64), omegas.real.astype(f64),
               omegas.imag.astype(f64), mus.real.astype(f64),
               mus.imag.astype(f64), t0s.astype(f64), Ts.astype(f64),
               masks)
    chunk = _safe_chunk(t0s, float(np.max(np.abs(omegas.imag))), 512)
    args = [jax.device_put(x, dev) for x in args_np]
    n_fits = omegas.shape[0] * t0s.shape[0]

    for analytic in (False, True):
        fn = jax.jit(lambda *a, _an=analytic: sweep_t0_modesets_factored_real(
            *a, chunk=chunk, analytic=_an))
        Cre, Cim, mm = fn(*args)
        mm0 = np.asarray(mm)                       # warmup + program load
        reps = []
        for _ in range(5):
            t0_ = time.perf_counter()
            _, _, mm = fn(*args)
            np.asarray(mm)
            reps.append(time.perf_counter() - t0_)
        el = min(reps)
        label = "analytic" if analytic else "summation"
        print(f"{label:9s}: {el*1e3:7.1f} ms  {n_fits/el:,.0f} fits/s")
        if analytic:
            dev_mm = np.max(np.abs(mm0 - mm_ref))
        else:
            mm_ref = mm0
    print(f"max |mm_analytic - mm_summation| = {dev_mm:.3e}")

    # Chunk retune for the analytic path.  The Gram stage no longer
    # consumes the chunk-span budget (its leading factor is a direct
    # exp), but the PROJECTIONS still run in the chunk-referenced phi0
    # basis, so _safe_chunk's |Im w|*span clamp still applies to them
    # -- the dev column makes any overrun visible.
    import os
    if os.environ.get("CHUNK_SWEEP"):
        for ck in (256, 512, 1024, 2048):
            fn = jax.jit(
                lambda *a, _c=ck: sweep_t0_modesets_factored_real(
                    *a, chunk=_c, analytic=True))
            _, _, mm = fn(*args)
            np.asarray(mm)
            reps = []
            for _ in range(5):
                t0_ = time.perf_counter()
                _, _, mm = fn(*args)
                np.asarray(mm)
                reps.append(time.perf_counter() - t0_)
            el = min(reps)
            print(f"analytic chunk={ck:5d}: {el*1e3:7.1f} ms  "
                  f"{n_fits/el:,.0f} fits/s  "
                  f"dev={np.max(np.abs(np.asarray(mm) - mm_ref)):.2e}")


if __name__ == "__main__":
    main()
