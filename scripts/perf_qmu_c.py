"""Qmu_C engine timing (PERF.md section 17; VERDICT r3 item 4): the
batched stacked-eigensolve path vs the per-index-per-chif
mode_eigensystem loop it replaced.

CPU only (LAPACK eig; nothing here touches a device).  Run:
JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python scripts/perf_qmu_c.py
"""

import time

import numpy as np

from qnmfits_tpu.ref_impl import get_qnm
from qnmfits_tpu.spatial import spheroidal_coefficients
from qnmfits_tpu.spatial_engine import eval_qmu_c

REPS = 3


def loop_qmu_c(indices, chifs):
    """The pre-round-4 evaluation order: one mode_eigensystem per
    (index, chif)."""
    q = get_qnm()
    out = np.zeros((len(indices), len(chifs)), complex)
    for qi, chif in enumerate(chifs):
        for n, (i, j, a, b, c, p1, e, f, g, p2) in enumerate(indices):
            L, M = a + e, b + f
            if j != M:
                continue
            [omega] = q.omega_list([(a, b, c, p1, e, f, g, p2)], chif, 1)
            l0, C = spheroidal_coefficients(-2, L, M, chif * omega)
            k = i - l0
            out[n, qi] = C[k] if 0 <= k < len(C) else 0.0
    return out


def main():
    # a representative QQNM index list: all i for the (2,2,0)x(2,2,0)
    # quadratic, plus a few off-j zeros
    indices = [(i, 4, 2, 2, 0, 1, 2, 2, 0, 1) for i in range(4, 11)] \
        + [(i, 3, 2, 2, 0, 1, 2, 2, 0, 1) for i in range(4, 7)]
    chifs = np.linspace(0.05, 0.9, 50)

    t0 = time.perf_counter()
    ref = loop_qmu_c(indices, chifs)
    t_loop = time.perf_counter() - t0
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        got = eval_qmu_c(indices, chifs)
        ts.append(time.perf_counter() - t0)
    t_bat = min(ts)
    n = len(indices) * len(chifs)
    print(f"loop    : {t_loop*1e3:8.1f} ms ({n/t_loop:,.0f} evals/s)")
    print(f"batched : {t_bat*1e3:8.1f} ms ({n/t_bat:,.0f} evals/s, "
          f"{t_loop/t_bat:.1f}x)")
    print("max |batched - loop| =", np.max(np.abs(got - ref)))


if __name__ == "__main__":
    main()
