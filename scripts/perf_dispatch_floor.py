"""Tunnel dispatch floor vs the dedup sweep's device time (PERF #27).

The bench's steady-state rep is ONE jitted dispatch + host gather; on
the tunneled axon backend every dispatch pays a fixed RPC round-trip
(~29 ms measured in round 1, PERF #2).  Post-dedup the whole sweep rep
is ~64 ms, so the floor is no longer noise -- this script separates
them: min-of-N round-trip of a trivial jitted program (the floor), the
bench rep (floor + kernel), and their difference (the kernel's actual
device+host time, i.e. what untunneled production hardware would see).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_dispatch_floor.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def main():
    dev = jax.devices()[0]
    print(f"device: {dev}")

    # --- dispatch floor: trivial program, 1-element round trip
    @jax.jit
    def trivial(x):
        return x + 1.0

    x = jnp.zeros((), jnp.float32)
    np.asarray(trivial(x))                       # compile
    reps = []
    for _ in range(20):
        t = time.perf_counter()
        np.asarray(trivial(x))
        reps.append(time.perf_counter() - t)
    floor = min(reps)
    print(f"dispatch floor (min of 20): {floor*1e3:.1f} ms")

    # --- the bench rep, exactly as bench.py measures it
    import bench
    from qnmfits_tpu import batched

    times, data, omegas, mus, masks, t0s, Ts, syn = bench.build_problem()
    mode_sets = bench._mode_sets()
    data_dict = {(2, 2): data[0].astype(complex),
                 (3, 2): data[1].astype(complex)}

    def run():
        return batched.batch_mismatch_t0_modesets(
            times, data_dict, mode_sets, 0.952, 0.692, t0s,
            T_array=100.0, spherical_modes=[(2, 2), (3, 2)], chunk=512,
            dedup=True)

    run()                                        # warmup / compile / load
    reps = []
    for _ in range(7):
        t = time.perf_counter()
        run()
        reps.append(time.perf_counter() - t)
    rep = min(reps)
    n_fits = len(mode_sets) * len(t0s)
    print(f"bench rep (min of 7): {rep*1e3:.1f} ms "
          f"= {n_fits/rep:,.0f} fits/s")
    kern = rep - floor
    print(f"kernel time ex-floor: {kern*1e3:.1f} ms "
          f"= {n_fits/kern:,.0f} fits/s (untunneled-hardware estimate)")


if __name__ == "__main__":
    main()
