"""Offline builder for the Kerr QNM spectrum tables.

Runs the from-scratch Leaver/spectral solver (solver.py) for every mode and
bakes the results into a single .npz artifact consumed by the TPU runtime
(tables.py).  This replaces the reference's runtime dependency on the
external `qnm` package's cached tables and the Cook & Zalutskiy HDF5
downloads (/root/reference/qnmfits/qnm.py:11-33, 124-160) with a
self-contained build step.

Artifact layout (qnm_tables_s{s}.npz):
    chi          : (P,) float64, shared spin grid
    keys         : (M, 3) int32, rows (l, m, n) -- all m in [-l, l]
    omega        : (M, P) complex128, M=1 units (Re > 0 convention;
                   mirror modes are lookup-time transforms)
    A            : (M, P) complex128, angular separation constants
    mu           : (M, P, K) complex128, spherical-spheroidal mixing
                   C_{l'} for l' = max(|s|,|m|) .. max(|s|,|m|)+K-1
    s, n_mu      : scalars

Usage:  python -m qnmfits_tpu.spectrum.build_tables [--lmax 5 --nmax 7]
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path

import numpy as np

from .solver import default_chi_grid, schwarzschild_seeds, track_mode

DATA_DIR = Path(__file__).parent.parent / "data"


def build(l_max: int = 5, n_max: int = 7, s: int = -2,
          n_chi: int = 400, n_mu: int = 12,
          out: Path | None = None, verbose: bool = True,
          l2_extension: bool = True) -> Path:
    chi = default_chi_grid(n_chi)
    seeds = schwarzschild_seeds(l_max=l_max, n_max=n_max, s=s)

    keys = []
    omegas = []
    As = []
    mus = []

    t_start = time.time()
    cache_dir = DATA_DIR / "track_cache"
    cache_dir.mkdir(parents=True, exist_ok=True)

    # All m in [-l, l] are solved directly: m < 0 is the retrograde
    # branch (Re > 0), not a symmetry image of m > 0.  The ladder starts
    # at l = |s| (l >= 0 for scalar s=0, l >= 2 gravitational).
    for l in range(abs(s), l_max + 1):
        # The regular l=2 s=-2 ladder must stop at n=7: Leaver's
        # continuation walks into the algebraically special omega=-2i
        # at n=8 and fails (or lands on a spurious root that would
        # collide with the multiplet-extension keys); n>=8 is handled
        # by the l2_extension below.
        n_top = min(n_max, 7) if (s == -2 and l == 2 and l2_extension) \
            else n_max
        for m in range(-l, l + 1):
            for n in range(0, n_top + 1):
                t0 = time.time()
                cache = cache_dir / f"s{s}_l{l}_m{m}_n{n}_P{n_chi}.npz"
                if cache.exists():
                    zc = np.load(cache)
                    w, A, C = zc["w"], zc["A"], zc["C"]
                else:
                    w, A, C = track_mode(l, m, n, seeds[(l, n)], chi, s=s)
                    np.savez(cache, w=w, A=A, C=C)
                K = min(n_mu, C.shape[1])
                mu = np.zeros((len(chi), n_mu), complex)
                mu[:, :K] = C[:, :K]

                keys.append((l, m, n))
                omegas.append(w)
                As.append(A)
                mus.append(mu)

                if verbose:
                    print(f"  ({l},{m},{n}) done in {time.time()-t0:.1f}s "
                          f"[total {time.time()-t_start:.0f}s]", flush=True)

    # l=2 multiplets (n=8,9) and extended ladder (n=10,11): the modes
    # where the reference needs Cook & Zalutskiy data (qnm.py:56-87).
    if l2_extension and s == -2:
        from .multiplets import multiplet_tracks
        for m in range(-2, 3):
            t0 = time.time()
            # v2: ladder walked to n<=20 (reference even_more_overtones
            # envelope); the v1 cache (n<=16) is superseded.
            cache = cache_dir / f"s{s}_l2ext_m{m}_n20_P{n_chi}.npz"
            if cache.exists():
                zc = np.load(cache)
                tracks = {int(n): (zc[f"w{n}"], zc[f"A{n}"], zc[f"C{n}"])
                          for n in zc["labels"]}
            else:
                tracks = multiplet_tracks(m, chi, s=s, verbose=verbose)
                save = {"labels": np.array(sorted(tracks), np.int32)}
                for n, (w, A, C) in tracks.items():
                    save[f"w{n}"] = w
                    save[f"A{n}"] = A
                    save[f"C{n}"] = C
                np.savez(cache, **save)
            for n, (w, A, C) in sorted(tracks.items()):
                K = min(n_mu, C.shape[1])
                mu = np.zeros((len(chi), n_mu), complex)
                mu[:, :K] = C[:, :K]
                keys.append((2, m, n))
                omegas.append(w)
                As.append(A)
                mus.append(mu)
            if verbose:
                print(f"  l=2 extension m={m} done in {time.time()-t0:.1f}s",
                      flush=True)

    DATA_DIR.mkdir(parents=True, exist_ok=True)
    if out is None:
        out = DATA_DIR / f"qnm_tables_s{s}.npz"
    np.savez_compressed(
        out,
        chi=chi,
        keys=np.array(keys, dtype=np.int32),
        omega=np.array(omegas),
        A=np.array(As),
        mu=np.array(mus),
        s=np.int32(s),
        n_mu=np.int32(n_mu),
    )
    if verbose:
        print(f"wrote {out} ({out.stat().st_size/1e6:.1f} MB, "
              f"{len(keys)} modes)")
    return out


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--lmax", type=int, default=5)
    p.add_argument("--nmax", type=int, default=7)
    p.add_argument("--nchi", type=int, default=400)
    p.add_argument("--nmu", type=int, default=12)
    p.add_argument("--s", type=int, default=-2)
    p.add_argument("--no-l2ext", action="store_true",
                   help="skip the l=2 n>=8 multiplet/extension tracks")
    args = p.parse_args()
    build(l_max=args.lmax, n_max=args.nmax, s=args.s,
          n_chi=args.nchi, n_mu=args.nmu,
          l2_extension=not args.no_l2ext)


if __name__ == "__main__":
    main()
