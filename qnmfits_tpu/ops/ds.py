"""Double-single (two-float32) arithmetic primitives.

TPU hardware has no float64: XLA emulates it with double-single pairs,
and Pallas kernels cannot take f64 refs at all.  These primitives
implement the same error-free-transformation arithmetic explicitly on
(hi, lo) float32 pairs, so a Pallas kernel can compute at ~f64
precision (unit roundoff 2^-48) on f32 hardware.

All functions are pure jnp elementwise ops on arrays, usable both
inside Pallas kernels and in plain XLA (the CPU tests check them
against native float64).  No fused-multiply-add is assumed: products
use Dekker/Veltkamp splitting, which is exact in pure IEEE f32
multiply/add.

References: Dekker (1971); Hida, Li & Bailey, "Library for
double-double and quad-double arithmetic" (the double-single subset).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "two_sum", "quick_two_sum", "two_prod", "ds_add", "ds_sub", "ds_neg",
    "ds_mul", "ds_mul_f32", "ds_rsqrt", "ds_from_f64", "ds_to_f64",
]

_SPLITTER = 4097.0          # 2^12 + 1 for float32 (24-bit mantissa)


def two_sum(a, b):
    """Error-free a + b: returns (s, e) with s + e == a + b exactly."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def quick_two_sum(a, b):
    """Error-free a + b assuming |a| >= |b|."""
    s = a + b
    e = b - (s - a)
    return s, e


def _veltkamp_split(a):
    """a = hi + lo with hi carrying the top 12 mantissa bits (exact)."""
    c = a * _SPLITTER
    hi = c - (c - a)
    return hi, a - hi


def two_prod(a, b):
    """Error-free a * b: returns (p, e) with p + e == a * b exactly."""
    p = a * b
    ah, al = _veltkamp_split(a)
    bh, bl = _veltkamp_split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def ds_add(a, b):
    """(hi, lo) + (hi, lo), accurate (IEEE-style) variant.

    The cheap variant (e += alo + blo in one step) loses relative
    accuracy under cancellation -- measured 7.6e-13 worst-case vs
    3e-15 for this one -- and Gram-matrix Cholesky is exactly a chain
    of cancelling subtractions, so the extra four flops matter."""
    ahi, alo = a
    bhi, blo = b
    s1, s2 = two_sum(ahi, bhi)
    t1, t2 = two_sum(alo, blo)
    s2 = s2 + t1
    s1, s2 = quick_two_sum(s1, s2)
    s2 = s2 + t2
    return quick_two_sum(s1, s2)


def ds_neg(a):
    return -a[0], -a[1]


def ds_sub(a, b):
    return ds_add(a, ds_neg(b))


def ds_mul(a, b):
    """(hi, lo) * (hi, lo)."""
    ahi, alo = a
    bhi, blo = b
    p, e = two_prod(ahi, bhi)
    e = e + (ahi * blo + alo * bhi)
    return quick_two_sum(p, e)


def ds_mul_f32(a, s):
    """(hi, lo) * plain-f32 s."""
    ahi, alo = a
    p, e = two_prod(ahi, s)
    e = e + alo * s
    return quick_two_sum(p, e)


def ds_rsqrt(a):
    """1/sqrt(a) for a > 0, to double-single accuracy.

    f32 rsqrt seed + two Newton steps y <- y (3 - a y^2) / 2 in ds
    arithmetic (each step squares the relative error: 1e-7 -> 1e-14 ->
    below the 2^-48 ds roundoff)."""
    ahi, alo = a
    y = jnp.float32(1.0) / jnp.sqrt(ahi)
    yds = (y, jnp.zeros_like(y))
    three = (jnp.full_like(y, 3.0), jnp.zeros_like(y))
    for _ in range(2):
        y2 = ds_mul(yds, yds)
        ay2 = ds_mul(a, y2)
        t = ds_sub(three, ay2)
        half = ds_mul_f32(yds, jnp.float32(0.5))
        yds = ds_mul(half, t)
    return yds


def ds_from_f64(x):
    """float64 array -> (hi, lo) float32 pair (outside Pallas)."""
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(x.dtype)).astype(jnp.float32)
    return hi, lo


def ds_to_f64(a, dtype=jnp.float64):
    """(hi, lo) float32 pair -> float64 array (outside Pallas)."""
    return a[0].astype(dtype) + a[1].astype(dtype)
