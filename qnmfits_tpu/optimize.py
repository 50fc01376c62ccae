"""Gradient-based ringdown optimisers.

The reference runs derivative-free Nelder-Mead with a full Python
design-matrix rebuild per simplex step (calculate_epsilon,
free_frequency_fit; /root/reference/qnmfits/qnmfits.py:1418-1594,
1905-2043).  Here the spectrum tables are differentiable splines and the
fit core is a pure JAX function, so the mismatch is differentiable in
(Mf, chif) and in a free complex frequency; one jit-compiled
value-and-gradient powers scipy L-BFGS-B (bounded, superlinear).

Both optimisers keep the reference's Nelder-Mead behaviour available via
``min_method`` for parity checks (qnmfits_tpu.fitting delegates there).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp

from .engine import SpectrumEvaluator, _device_for, _window, fit_core

__all__ = ["calculate_epsilon_gradient", "free_frequency_fit_gradient"]


def _canon(modes):
    return tuple(tuple(int(x) for x in m) for m in modes)


@lru_cache(maxsize=128)
def _epsilon_objective(modes, sph, t0_method, delta):
    """jitted (mismatch, grad) as a function of (Mf, chif)."""
    ev = SpectrumEvaluator(list(modes), list(sph) if sph else None)

    def mm_fn(x, times, data, t0, T, delta_factor):
        Mf, chif = x[0], jnp.clip(x[1], 0.0, 0.99)
        omega = ev.omega(chif, Mf, delta_factor)
        mu = jnp.ones((1, omega.shape[0])) if sph is None else ev.mu(chif)
        w = _window(times, t0, T, t0_method)
        _, mm = fit_core(times, data, omega, mu, t0, w, jnp.complex128)
        return mm

    return jax.jit(jax.value_and_grad(mm_fn))


def calculate_epsilon_gradient(times, data, modes, Mf, chif, t0,
                               t0_method="geq", T=100,
                               spherical_modes=None, delta=0.0, x0=None):
    """L-BFGS-B remnant recovery on the differentiable mismatch.

    Same contract as the reference's calculate_epsilon
    (qnmfits.py:1418-1594): returns (epsilon, Mf_bestfit, chif_bestfit)
    with bounds Mf in [0, 2], chif in [0, 0.99].
    """
    from scipy.optimize import minimize
    from .ref_impl import _delta_factor

    if isinstance(data, dict):
        if spherical_modes is None:
            spherical_modes = list(data.keys())
        rows = np.stack([np.asarray(data[lm]) for lm in spherical_modes])
        sph = tuple(tuple(lm) for lm in spherical_modes)
    else:
        rows = np.asarray(data)[None, :]
        sph = None

    vg = _epsilon_objective(_canon(modes), sph, t0_method, None)
    # Reference semantics: delta applies to single-series fits only
    # ('Only used if using ringdown_fit' -- the multimode fit routes,
    # qnmfits.py:1418-1594, ignore it).  The Nelder-Mead parity path
    # does the same; applying it here gave a wildly different remnant
    # for dict data depending on min_method.
    df = np.asarray(_delta_factor(0.0 if sph is not None else delta,
                                  len(modes)))
    dev = _device_for("x64")
    args = [jax.device_put(np.asarray(a), dev)
            for a in (np.asarray(times, float), rows, float(t0), float(T),
                      df)]

    def obj(x):
        v, g = vg(jax.device_put(np.asarray(x, float), dev), *args)
        return float(v), np.asarray(g, float)

    res = minimize(obj, x0 if x0 is not None else [Mf, chif],
                   jac=True, method="L-BFGS-B",
                   bounds=[(0.0, 2.0), (0.0, 0.99)],
                   options={"ftol": 1e-15, "gtol": 1e-12})
    Mf_bf, chif_bf = res.x
    eps = float(np.sqrt((Mf_bf - Mf) ** 2 + (chif_bf - chif) ** 2))
    return eps, float(Mf_bf), float(chif_bf)


@lru_cache(maxsize=128)
def _free_freq_objective(modes, t0_method):
    """jitted (mismatch, grad) in the free complex frequency (re, im)."""
    ev = SpectrumEvaluator(list(modes)) if modes else None

    def mm_fn(x, times, data, Mf, chif, t0, T):
        if ev is not None:
            fixed = ev.omega(chif, Mf)
        else:
            fixed = jnp.zeros((0,), jnp.complex128)
        omega = jnp.concatenate(
            [fixed, (x[0] + 1j * x[1])[None].astype(jnp.complex128)])
        mu = jnp.ones((1, omega.shape[0]))
        w = _window(times, t0, T, t0_method)
        _, mm = fit_core(times, data, omega, mu, t0, w, jnp.complex128)
        return mm

    return jax.jit(jax.value_and_grad(mm_fn))


def free_frequency_fit_gradient(times, data, t0, modes=[], Mf=None,
                                chif=None, t0_method="geq", T=100,
                                x0=(1.0, -0.5)):
    """L-BFGS-B free complex-frequency fit (reference
    free_frequency_fit, qnmfits.py:1905-2043).  Returns omega_bestfit."""
    from scipy.optimize import minimize

    vg = _free_freq_objective(_canon(modes), t0_method)
    dev = _device_for("x64")
    if modes and (Mf is None or chif is None):
        # The reference fails loudly here (omega/None TypeError); a
        # silent Mf=1/chif=0 default would bias the fixed frequencies
        # and therefore the recovered free frequency.
        raise ValueError(
            "free_frequency_fit with fixed QNM modes requires Mf and "
            "chif")
    Mf_v = 1.0 if Mf is None else float(Mf)
    chif_v = 0.0 if chif is None else float(chif)
    args = [jax.device_put(np.asarray(a), dev)
            for a in (np.asarray(times, float),
                      np.asarray(data, complex)[None, :],
                      Mf_v, chif_v, float(t0), float(T))]

    def obj(x):
        v, g = vg(jax.device_put(np.asarray(x, float), dev), *args)
        return float(v), np.asarray(g, float)

    res = minimize(obj, list(x0), jac=True, method="L-BFGS-B",
                   bounds=[(0.0, 2.0), (-1.0, 0.0)],
                   options={"ftol": 1e-15, "gtol": 1e-14})
    return res.x[0] + 1j * res.x[1]
