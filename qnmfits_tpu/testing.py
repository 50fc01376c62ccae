"""Synthetic waveform generators for tests and benchmarks.

The reference has no test suite; its de-facto integration tests are SXS
waveforms in example notebooks (SURVEY.md section 4).  With no network
access, round-trip synthetics built from the spectrum tables play that
role: a waveform constructed from known QNM amplitudes must be recovered
with mismatch ~ 0 and exact amplitudes (the same check as the reference's
examples/correcting_measured_amplitude.ipynb).
"""

from __future__ import annotations

import numpy as np


def default_time_grid(t_min=-50.0, t_max=150.0, dt=0.1):
    return np.arange(t_min, t_max, dt)


def synthetic_single(modes=None, amplitudes=None, Mf=0.952, chif=0.692,
                     times=None, noise=0.0, seed=0):
    """Single-series synthetic ringdown h(t) = sum C_j exp(-i w_j t).

    Returns dict(times, data, modes, amplitudes, Mf, chif).
    """
    from .ref_impl import get_qnm, ringdown

    if modes is None:
        modes = [(2, 2, n, 1) for n in range(3)]
    if amplitudes is None:
        rng = np.random.default_rng(seed)
        amplitudes = (rng.standard_normal(len(modes))
                      + 1j * rng.standard_normal(len(modes)))
    if times is None:
        times = default_time_grid()

    freqs = np.array(get_qnm().omega_list(modes, chif, Mf))
    data = ringdown(times, 0.0, amplitudes, freqs)
    if noise:
        rng = np.random.default_rng(seed + 1)
        data = data + noise * (rng.standard_normal(len(times))
                               + 1j * rng.standard_normal(len(times)))
    return dict(times=times, data=data, modes=modes,
                amplitudes=np.asarray(amplitudes, complex),
                frequencies=freqs, Mf=Mf, chif=chif)


def synthetic_multimode(modes=None, spherical_modes=None, amplitudes=None,
                        Mf=0.952, chif=0.692, times=None, seed=0):
    """Spherical-harmonic-decomposed synthetic ringdown with mixing.

    Builds h_{lm}(t) = sum_j mu_{lm,j}(chif) C_j exp(-i w_j t), i.e. data
    exactly representable by the multimode model (reference design matrix,
    qnmfits.py:628-631).
    """
    from .ref_impl import get_qnm

    if modes is None:
        modes = [(2, 2, n, 1) for n in range(2)] + [(3, 2, 0, 1)]
    if spherical_modes is None:
        spherical_modes = [(2, 2), (3, 2)]
    if amplitudes is None:
        rng = np.random.default_rng(seed)
        amplitudes = (rng.standard_normal(len(modes))
                      + 1j * rng.standard_normal(len(modes)))
    amplitudes = np.asarray(amplitudes, complex)
    if times is None:
        times = default_time_grid()

    q = get_qnm()
    freqs = np.array(q.omega_list(modes, chif, Mf))
    data_dict = {}
    for lm in spherical_modes:
        mu = np.array(q.mu_list([lm + tuple(mode) for mode in modes], chif))
        tpos = np.where(times >= 0, times, 0.0)
        h = (mu[None, :] * amplitudes[None, :]
             * np.exp(-1j * freqs[None, :] * tpos[:, None])).sum(1)
        h = np.where(times >= 0, h, 0.0)
        data_dict[lm] = h
    return dict(times=times, data_dict=data_dict, modes=modes,
                spherical_modes=spherical_modes, amplitudes=amplitudes,
                frequencies=freqs, Mf=Mf, chif=chif)
