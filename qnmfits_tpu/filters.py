"""Rational QNM filter: jitted jnp.fft path.

Frequency-domain removal of QNM content (Ma, Giesler, Varma, Scheel &
Mitman, arXiv:2207.10870), with the exact semantics of the reference
implementation (/root/reference/qnmfits/qnmfits.py:2046-2152): cubic
interpolation onto a uniform grid, early-time cosine taper, per-mode
rational filter Pi (2 pi f + w) / (2 pi f + conj w) with accumulated
phase/time realignment of the inspiral.

The interpolation runs host-side (scipy, bit-identical to the reference
prep); the taper + FFT + filter + IFFT pipeline is one jitted program.
Complex FFTs are unsupported on the axon TPU backend, so the jitted path
targets the CPU/GPU backends; numerics are float64.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["rational_filter_jax"]


@lru_cache(maxsize=64)
def _filter_fn(n_modes: int, n_taper: int, n_samples: int, align: bool):
    def run(d_u, dt, omegas):
        # Early-time cosine taper (reference qnmfits.py:2118-2127).
        arg = jnp.pi * jnp.arange(n_taper)[::-1] / max(n_taper, 1)
        taper = (jnp.cos(arg) + 1.0) / 2.0
        d = d_u.at[:n_taper].multiply(taper) if n_taper else d_u

        freqs = jnp.fft.fftfreq(n_samples) / dt
        spec = jnp.fft.fft(d)
        tpf = 2.0 * jnp.pi * freqs

        # Pi_j (2 pi f + w_j) / (2 pi f + conj w_j)  (qnmfits.py:2133-2140).
        filt = jnp.prod(
            (tpf[None, :] + omegas[:, None])
            / (tpf[None, :] + jnp.conj(omegas)[:, None]), axis=0)
        spec = spec * filt

        if align:
            phase_shift = jnp.sum(jnp.angle(omegas / jnp.conj(omegas)))
            time_shift = jnp.sum(jnp.abs(
                2.0 * jnp.imag(omegas) / jnp.conj(omegas) ** 2))
            spec = spec * jnp.exp(-1j * (tpf * time_shift + phase_shift))
        return jnp.fft.ifft(spec)

    return jax.jit(run)


def rational_filter_jax(times, data, modes, Mf, chif, t_start=-300,
                        t_end=None, dt=None, t_taper=100,
                        align_inspiral=True):
    """Rational filter with the FFT pipeline as one jitted program.

    Same signature and numerics as ref_impl.rational_filter (<= 1e-12);
    returns (uniform_times, filtered_data).
    """
    from scipy.interpolate import interp1d

    from .engine import cpu_device
    from .ref_impl import get_qnm

    times = np.asarray(times)
    data = np.asarray(data)
    if t_end is None:
        t_end = times[-1]
    if dt is None:
        dt = float(np.min(np.diff(times)))

    t_u = np.arange(t_start, t_end, dt)
    d_u = interp1d(times, data.real, kind="cubic")(t_u) \
        + 1j * interp1d(times, data.imag, kind="cubic")(t_u)

    q = get_qnm()
    omegas = np.array([q.omega(l, m, n, sign, chif, Mf)
                       for (l, m, n, sign) in modes])

    n_taper = int(np.sum(t_u < (t_start + t_taper)))
    fn = _filter_fn(len(modes), n_taper, len(t_u), bool(align_inspiral))
    dev = cpu_device()          # complex FFT: CPU backend (x64)
    out = fn(jax.device_put(d_u, dev), jax.device_put(np.float64(dt), dev),
             jax.device_put(omegas, dev))
    return t_u, np.asarray(out)
