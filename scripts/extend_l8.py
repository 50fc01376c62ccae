"""Extend the baked s=-2 spectrum artifact by one more l.

Solves the (2l+1) x 8 new (l, m, n<=7) modes with the standard tracker
(per-mode cache in data/track_cache) and appends them to the existing
qnm_tables_s-2.npz -- everything already baked is reused untouched.

Usage: python scripts/extend_l8.py [l]     (default 8)
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
L_NEW = int(sys.argv[1]) if len(sys.argv) > 1 else 8
N_MAX = 7
S = -2


def main():
    z = dict(np.load(ART))
    chi = z["chi"]
    keys = [tuple(k) for k in z["keys"]]
    assert not any(k[0] == L_NEW for k in keys), "already extended"
    n_mu = int(z["n_mu"])

    seeds = schwarzschild_seeds(l_max=L_NEW, n_max=N_MAX, s=S,
                                n_max_low_l=0)
    cache_dir = DATA / "track_cache"
    cache_dir.mkdir(parents=True, exist_ok=True)

    new_keys, new_w, new_A, new_mu = [], [], [], []
    t_start = time.time()
    for m in range(-L_NEW, L_NEW + 1):
        for n in range(N_MAX + 1):
            t0 = time.time()
            cache = cache_dir / f"s{S}_l{L_NEW}_m{m}_n{n}_P{len(chi)}.npz"
            if cache.exists():
                zc = np.load(cache)
                w, A, C = zc["w"], zc["A"], zc["C"]
            else:
                w, A, C = track_mode(L_NEW, m, n, seeds[(L_NEW, n)],
                                     chi, s=S)
                np.savez(cache, w=w, A=A, C=C)
            mu = np.zeros((len(chi), n_mu), complex)
            K = min(n_mu, C.shape[1])
            mu[:, :K] = C[:, :K]
            new_keys.append((L_NEW, m, n))
            new_w.append(w)
            new_A.append(A)
            new_mu.append(mu)
            print(f"  ({L_NEW},{m},{n}) {time.time()-t0:.1f}s "
                  f"[total {time.time()-t_start:.0f}s]", flush=True)

    z["keys"] = np.concatenate(
        [z["keys"], np.asarray(new_keys, np.int32)], axis=0)
    z["omega"] = np.concatenate([z["omega"], np.asarray(new_w)], axis=0)
    z["A"] = np.concatenate([z["A"], np.asarray(new_A)], axis=0)
    z["mu"] = np.concatenate([z["mu"], np.asarray(new_mu)], axis=0)
    tmp = ART.with_suffix(".tmp.npz")
    np.savez_compressed(tmp, **z)
    tmp.replace(ART)
    print(f"wrote {ART} ({ART.stat().st_size/1e6:.1f} MB, "
          f"{len(z['keys'])} modes)")


if __name__ == "__main__":
    main()
