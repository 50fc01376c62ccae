"""Measure the compiled Qmu engine vs the reference-shaped loop oracle.

VERDICT r2 item 1 asked for a >=100x speedup on a full-l_max Qmu index
set, recorded in PERF.md.  Run: PYTHONPATH=. JAX_PLATFORMS=cpu python
scripts/bench_qmu.py
"""

import time

import numpy as np

from qnmfits_tpu import spatial
from qnmfits_tpu.spatial_engine import compile_qmu, eval_qmu

# A full sky-prediction workload: every output row i for three quadratic
# maps, plus a mirror-pair map -- 4 maps x (l_max - 3) rows.
L_MAX = 8
MAPS = [
    (2, 2, 0, 1, 2, 2, 0, 1),
    (3, 3, 0, 1, 2, 2, 0, 1),
    (2, 2, 1, 1, 2, 2, 0, 1),
    (2, 2, 0, 1, 2, -2, 0, -1),
]
IDX = []
for mp in MAPS:
    j = mp[1] + mp[5]
    for i in range(max(abs(j), 2), L_MAX + 1):
        IDX.append((i, j) + mp)

CHIF = 0.68


def main():
    extra = None
    # warm both paths (table load, lru caches)
    loop0 = spatial._Qmu_sum_loop(IDX, CHIF, L_MAX, -2, 0, extra)
    vec0 = eval_qmu(IDX, CHIF, L_MAX, s1=-2, s2=0)
    np.testing.assert_allclose(vec0, loop0, rtol=0, atol=1e-13)

    t = time.perf_counter()
    for _ in range(3):
        spatial._Qmu_sum_loop(IDX, CHIF, L_MAX, -2, 0, extra)
    t_loop = (time.perf_counter() - t) / 3

    # compile cost (one-time per index list)
    compile_qmu.cache_clear()
    t = time.perf_counter()
    eval_qmu(IDX, CHIF, L_MAX, s1=-2, s2=0)
    t_compile = time.perf_counter() - t

    t = time.perf_counter()
    for _ in range(50):
        eval_qmu(IDX, CHIF, L_MAX, s1=-2, s2=0)
    t_vec = (time.perf_counter() - t) / 50

    # array-chif evaluation (new capability: amortised spline gathers)
    chifs = np.linspace(0.0, 0.99, 64)
    t = time.perf_counter()
    for _ in range(10):
        eval_qmu(IDX, chifs, L_MAX, s1=-2, s2=0)
    t_vec_arr = (time.perf_counter() - t) / 10

    n = len(IDX)
    print(f"indices: {n} (l_max={L_MAX}, 4 quadratic maps)")
    print(f"loop oracle:          {t_loop*1e3:9.2f} ms  "
          f"({t_loop/n*1e6:.0f} us/index)")
    print(f"compiled (first+fit): {t_compile*1e3:9.2f} ms")
    print(f"compiled (repeat):    {t_vec*1e3:9.3f} ms  "
          f"-> {t_loop/t_vec:.0f}x vs loop")
    print(f"compiled, 64 spins:   {t_vec_arr*1e3:9.3f} ms  "
          f"({t_vec_arr/64*1e6:.1f} us/spin, "
          f"{t_loop*64/t_vec_arr:.0f}x vs 64 loop calls)")


if __name__ == "__main__":
    main()
