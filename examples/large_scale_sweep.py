"""Production-scale sweep: every round-2 piece in one workflow.

A remnant-spin study: for each candidate chif on a grid, sweep 21
overtone ladders x 512 start times (the reference would run this as
THREE nested Python loops -- ~170k serial lstsq calls).  Here each
spin's ladder sweep is ONE jitted mode-set program on the factored
split-complex kernel, the spin axis is checkpointed block-by-block
(kill and re-run: completed spins are not recomputed), and passing
QNMFITS_TPU_MESH=auto shards each sweep over every available chip.

Run:  PYTHONPATH="/root/repo:$PYTHONPATH" python examples/large_scale_sweep.py
"""

import os
import tempfile
import time

import numpy as np

import qnmfits_tpu as qf
from qnmfits_tpu.utils import resumable_sweep

Mf_true, chif_true = 0.952, 0.692
times = np.arange(-50.0, 150.0, 0.1)

# Synthetic two-spherical-mode ringdown from the true remnant.
from qnmfits_tpu.testing import synthetic_multimode  # noqa: E402

syn = synthetic_multimode(
    modes=[(2, 2, n, 1) for n in range(8)],
    spherical_modes=[(2, 2), (3, 2)],
    Mf=Mf_true, chif=chif_true, times=times, seed=3)
data = syn["data_dict"]

mode_sets = [[(2, 2, n, 1) for n in range(N)] for N in range(1, 22)]
t0s = np.linspace(-5.0, 40.0, 512)
chif_grid = np.linspace(0.60, 0.78, 16)
mesh = "auto" if os.environ.get("QNMFITS_TPU_MESH") == "auto" else None

ckpt = os.path.join(tempfile.gettempdir(), "qnmfits_sweep_ckpt")
print(f"checkpoint dir: {ckpt} (re-run resumes; delete to restart)")


_block_times = []


def sweep_block(chifs):
    """One block of candidate spins -> min-mismatch (n_spin, S).

    The remnant axis folds into the vmapped mode-set axis, so the whole
    (set x spin x t0) block is ONE jitted device program (round 2 ran a
    serial Python loop over spins here)."""
    t_blk = time.time()
    mm = qf.mismatch_t0_mode_sets(
        times, data, mode_sets, Mf_true, np.asarray(chifs, float), t0s,
        T_array=100.0, spherical_modes=[(2, 2), (3, 2)], mesh=mesh)
    _block_times.append(time.time() - t_blk)
    return mm.min(axis=2).T                    # (S, R, B) -> (R, S)


t_start = time.time()
best = resumable_sweep(sweep_block, chif_grid, ckpt, block=4,
                                progress=True)
n_fits = len(chif_grid) * len(mode_sets) * len(t0s)
elapsed = time.time() - t_start
print(f"\n{n_fits} multimode fits in {elapsed:.1f}s "
      f"({n_fits/max(elapsed, 1e-9):.0f} fits/s incl. host prep)")
if len(_block_times) > 1:
    # The tunneled axon device pays a one-time program load/compile on
    # the first invocation of a jitted program (minutes for this deep
    # J=21 kernel -- an infra artifact, see PERF.md section 9); the
    # per-block steady state is the honest device rate.
    per_blk = n_fits / len(_block_times)
    steady = min(_block_times)
    print(f"steady-state: {per_blk/steady:.0f} fits/s per block "
          f"({steady:.1f}s/block; first block {max(_block_times):.1f}s "
          f"incl. one-time program load)")

# Best ladder depth per spin, and the recovered spin.
best_N = 1 + np.argmin(best, axis=1)
i_best = int(np.argmin(best.min(axis=1)))
print(f"recovered chif ~ {chif_grid[i_best]:.3f} "
      f"(true {chif_true}); best ladder N={best_N[i_best]}")
print("min-mismatch per spin:")
for c, m, N in zip(chif_grid, best.min(axis=1), best_N):
    marker = "  <-- best" if c == chif_grid[i_best] else ""
    print(f"  chif={c:.3f}: {m:.3e} (N={N}){marker}")
