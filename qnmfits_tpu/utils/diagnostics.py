"""Lightweight observability: timing, progress, NaN checking.

The reference's only observability is tqdm progress bars on its serial
grid loops (/root/reference/qnmfits/qnmfits.py:1391, 1402, 1757) and
print-based error reporting.  Batched sweeps complete in one device
dispatch, so the equivalents here are: a timing context, a chunked
progress wrapper for very large host-chunked sweeps, and a debug-NaN
toggle wrapping JAX's checker.
"""

from __future__ import annotations

import contextlib
import time

import jax

__all__ = ["timed", "debug_nans", "sweep_progress"]


@contextlib.contextmanager
def timed(label: str = "", printer=print):
    """Wall-time a block, synchronising device work on exit.

    JAX dispatches pure computations asynchronously, so a naive timer
    would report only dispatch time.  Per-device execution is in-order,
    so enqueueing a trivial jitted op on every device and blocking on it
    fences everything enqueued inside the block (effects_barrier alone
    only waits for EFFECTFUL computations and misses pure compute)."""
    import jax.numpy as jnp

    t0 = time.perf_counter()
    try:
        yield
    finally:
        if hasattr(jax, "effects_barrier"):
            jax.effects_barrier()
        for dev in jax.devices():
            try:
                jax.block_until_ready(
                    jax.device_put(jnp.zeros(()), dev) + 0)
            except Exception:       # uninitialised backend: nothing queued
                pass
        printer(f"[{label or 'timed'}] {time.perf_counter() - t0:.3f}s")


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    """Toggle jax.debug_nans within a scope (SURVEY.md section 5:
    NaN-checking debug mode)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", bool(enable))
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def sweep_progress(items, desc: str = "", use_tqdm: bool = True):
    """Progress iterator for host-level chunk loops (falls back to a
    plain iterator when tqdm is unavailable or disabled)."""
    if use_tqdm:
        try:
            from tqdm import tqdm
            return tqdm(items, desc=desc)
        except ImportError:
            pass
    return items
