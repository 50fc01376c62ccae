"""Analysis-window machinery under fixed shapes.

The reference masks its data arrays to the window [t0, t0+T) and runs
LAPACK on the shrunk arrays (/root/reference/qnmfits/qnmfits.py:230-248).
Under jit/vmap shapes must be static, so windows become {0,1} row weights
``w`` plus trapezoid quadrature weights ``tau`` on the full time grid:

* zeroing rows of the design matrix and data reproduces the masked
  least-squares solution exactly (same normal equations, full column rank);
* ``tau`` reproduces np.trapezoid over the masked subarray exactly,
  including the endpoint halving, because the mask is contiguous.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["window_geq", "window_closest", "trapz_weights"]


def window_geq(times, t0, T):
    """{0,1} weights for t0_method='geq': t0 <= t < t0 + T
    (reference qnmfits.py:233)."""
    return ((times >= t0) & (times < t0 + T)).astype(times.dtype)


def window_closest(times, t0, T):
    """{0,1} weights for t0_method='closest': sample index closest to t0
    up to (exclusive) the index closest to t0+T (reference
    qnmfits.py:240-243)."""
    k0 = jnp.argmin((times - t0) ** 2)
    k1 = jnp.argmin((times - t0 - T) ** 2)
    idx = jnp.arange(times.shape[0])
    return ((idx >= k0) & (idx < k1)).astype(times.dtype)


def trapz_weights(times, w):
    """Trapezoid quadrature weights of the *masked contiguous subarray*.

    For segment k (between samples k and k+1), the segment contributes
    dt_k/2 to both endpoints iff both samples are inside the window.
    Summing segment contributions reproduces np.trapezoid(y[sel], x[sel])
    as sum_k tau_k * y_k for any contiguous {0,1} mask w.
    """
    dt = times[1:] - times[:-1]
    seg = w[:-1] * w[1:] * dt * 0.5
    zero = jnp.zeros((1,), dtype=seg.dtype)
    return jnp.concatenate([seg, zero]) + jnp.concatenate([zero, seg])
