"""Window dedup on the array optimisers (PERF.md section 27).

Measures free_frequency_fit_array / calculate_epsilon_array with
dedup=True vs dedup=False on a t0 grid finer than the data sampling
(the PERF.md section 25 workload pattern), and records the max
deviation between the two paths.  The objective is invariant under the
basis t0-shift (a per-column rescale of the design), so duplicate
windows pose the SAME optimisation problem; endpoint differences come
only from trajectory rounding (the rescale changes conditioning, not
the minimiser).

Run CPU:  JAX_PLATFORMS=cpu python scripts/perf_optimizer_dedup.py
Run TPU:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/...
"""

import time

import numpy as np

from qnmfits_tpu.optimize import (calculate_epsilon_array,
                                  free_frequency_fit_array)
from qnmfits_tpu.testing import synthetic_single


def best_of(fn, n=5):
    ts = []
    for _ in range(n):
        t = time.perf_counter()
        out = fn()
        ts.append(time.perf_counter() - t)
    return out, min(ts)


def main():
    syn = synthetic_single(modes=[(2, 2, n, 1) for n in range(4)],
                           noise=0.0, seed=5)
    # dt=0.1; 0.025 spacing = 4x finer -> ~4 duplicates per window.
    t0s = np.arange(0.0, 10.0, 0.025)
    print(f"B={len(t0s)} t0s over dt=0.1 samples")

    for name, call in [
        ("free_frequency_fit_array",
         lambda dd: free_frequency_fit_array(
             syn["times"], syn["data"], t0s, return_mismatch=True,
             dedup=dd)),
        ("calculate_epsilon_array",
         lambda dd: calculate_epsilon_array(
             syn["times"], syn["data"], syn["modes"], syn["Mf"],
             syn["chif"], t0s, dedup=dd)),
    ]:
        out_d, _ = best_of(lambda: call(True), 1)    # compile
        out_0, _ = best_of(lambda: call(False), 1)
        out_d, t_d = best_of(lambda: call(True))
        out_0, t_0 = best_of(lambda: call(False))
        dev = max(float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
                  for a, b in zip(out_d, out_0))
        rate_d, rate_0 = len(t0s) / t_d, len(t0s) / t_0
        print(f"{name}: direct {t_0*1e3:.1f} ms ({rate_0:,.0f}/s)  "
              f"dedup {t_d*1e3:.1f} ms ({rate_d:,.0f}/s)  "
              f"{t_0/t_d:.2f}x  maxdev {dev:.3e}")


if __name__ == "__main__":
    main()
