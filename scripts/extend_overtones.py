"""Extend the baked s=-2 spectrum artifact with deeper overtone ladders.

The reference ships Cook data with n <= 7 for every (l, m) (SURVEY
section 2.1); the baked tables already walk the l=2 ladders to n <= 20
(multiplet extension).  This script deepens the REGULAR ladders of one
l to an arbitrary n_top: for l >= 3 the s=-2 algebraically special
frequency (-i (l-1) l (l+1) (l+2) / 12, i.e. -10i at l=3, -30i at l=4)
sits far below any n reached here, so plain Leaver continuation in n is
safe -- no multiplet machinery needed (contrast build_tables.py:56-62,
where the l=2 ladder must stop at n=7).

Per-mode solves cache to data/track_cache; the artifact append is
atomic and re-runnable (already-present keys are skipped).  The
.spl.npz spline sidecar auto-invalidates on the mode-count change.

Usage: python scripts/extend_overtones.py [l] [n_top]   (default 3 14)
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, ".")

from qnmfits_tpu.spectrum.solver import (  # noqa: E402
    schwarzschild_seeds, track_mode)

DATA = Path("qnmfits_tpu/data")
ART = DATA / "qnm_tables_s-2.npz"
L = int(sys.argv[1]) if len(sys.argv) > 1 else 3
N_TOP = int(sys.argv[2]) if len(sys.argv) > 2 else 14
S = -2


def main():
    z = dict(np.load(ART))
    chi = z["chi"]
    have = {tuple(k) for k in z["keys"]}
    n_mu = int(z["n_mu"])

    # n_max_low_l=0: lower-l ladders are only the n=0 extrapolation
    # chain; never walk l=2 into the algebraically special point.
    seeds = schwarzschild_seeds(l_max=L, n_max=N_TOP, s=S,
                                n_max_low_l=0)
    cache_dir = DATA / "track_cache"
    cache_dir.mkdir(parents=True, exist_ok=True)

    new_keys, new_w, new_A, new_mu = [], [], [], []
    failures = []
    t_start = time.time()
    for m in range(-L, L + 1):
        for n in range(N_TOP + 1):
            if (L, m, n) in have:
                continue
            t0 = time.time()
            cache = cache_dir / f"s{S}_l{L}_m{m}_n{n}_P{len(chi)}.npz"
            try:
                if cache.exists():
                    zc = np.load(cache)
                    w, A, C = zc["w"], zc["A"], zc["C"]
                else:
                    w, A, C = track_mode(L, m, n, seeds[(L, n)],
                                         chi, s=S)
                    np.savez(cache, w=w, A=A, C=C)
            except Exception as e:  # report, don't poison the artifact
                failures.append(((L, m, n), repr(e)))
                print(f"  ({L},{m},{n}) FAILED: {e!r}", flush=True)
                continue
            if not (np.all(np.isfinite(w)) and np.all(w.imag < 0)):
                failures.append(((L, m, n), "non-finite/unstable track"))
                print(f"  ({L},{m},{n}) REJECTED: non-finite or "
                      f"Im >= 0 samples in track", flush=True)
                continue
            mu = np.zeros((len(chi), n_mu), complex)
            K = min(n_mu, C.shape[1])
            mu[:, :K] = C[:, :K]
            new_keys.append((L, m, n))
            new_w.append(w)
            new_A.append(A)
            new_mu.append(mu)
            print(f"  ({L},{m},{n}) {time.time()-t0:.1f}s "
                  f"[total {time.time()-t_start:.0f}s]", flush=True)

    if not new_keys:
        print("nothing to add")
        return
    z["keys"] = np.concatenate(
        [z["keys"], np.asarray(new_keys, np.int32)], axis=0)
    z["omega"] = np.concatenate([z["omega"], np.asarray(new_w)], axis=0)
    z["A"] = np.concatenate([z["A"], np.asarray(new_A)], axis=0)
    z["mu"] = np.concatenate([z["mu"], np.asarray(new_mu)], axis=0)
    tmp = ART.with_suffix(".tmp.npz")
    np.savez_compressed(tmp, **z)
    tmp.replace(ART)
    print(f"wrote {ART} ({ART.stat().st_size/1e6:.1f} MB, "
          f"{len(z['keys'])} modes, +{len(new_keys)})")
    if failures:
        print(f"{len(failures)} modes failed/rejected: "
              f"{[k for k, _ in failures]}")


if __name__ == "__main__":
    main()
