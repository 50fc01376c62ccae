"""NumPy reference path: exact-semantics ringdown fitting.

This module is the correctness anchor of the framework.  It reproduces the
numerics of the reference fitting engine (/root/reference/qnmfits/
qnmfits.py): masked design matrices a[k,j] = exp(-i w_j (t_k - t0)), LAPACK
SVD least squares (np.linalg.lstsq, rcond=None), and trapezoid-rule
mismatches.  The TPU engine (qnmfits_tpu.fitting / qnmfits_tpu.batched) is
validated against this path to <= 1e-10 (BASELINE.json parity gate).

It is deliberately small, eager and NumPy-only: one helper per concept,
shared by all fit flavours, rather than the reference's per-function
duplication.
"""

from __future__ import annotations

import numpy as np

from .qnm_api import qnm as _QnmClass

_qnm = None


def get_qnm() -> "_QnmClass":
    global _qnm
    if _qnm is None:
        _qnm = _QnmClass()
    return _qnm


# ---------------------------------------------------------------------------
# Waveform primitives (reference qnmfits.py:15-139)
# ---------------------------------------------------------------------------

def ringdown(time, start_time, complex_amplitudes, frequencies):
    """Damped-sinusoid sum, zero before start_time
    (reference qnmfits.py:15-70)."""
    time = np.asarray(time)
    h = np.zeros(len(time), dtype=complex)
    sel = time >= start_time
    ts = time[sel] - start_time
    amps = np.asarray(complex_amplitudes, dtype=complex)
    freqs = np.asarray(frequencies, dtype=complex)
    h[sel] = (amps[:, None] * np.exp(-1j * freqs[:, None] * ts[None, :])).sum(0)
    return h


def _trapz(y, x):
    return np.trapezoid(y, x=x)


def mismatch(times, wf_1, wf_2):
    """1 - Re<w1,w2>/sqrt(<w1,w1><w2,w2>), trapezoid inner products
    (reference qnmfits.py:73-97)."""
    num = np.real(_trapz(wf_1 * np.conj(wf_2), times))
    den = np.sqrt(_trapz(np.real(wf_1 * np.conj(wf_1)), times)
                  * _trapz(np.real(wf_2 * np.conj(wf_2)), times))
    return 1 - num / den


def multimode_mismatch(times, wf_dict_1, wf_dict_2):
    """Sky-averaged mismatch over the keys of wf_dict_1
    (reference qnmfits.py:100-139)."""
    keys = list(wf_dict_1.keys())
    num = np.real(sum(_trapz(wf_dict_1[k] * np.conj(wf_dict_2[k]), times)
                      for k in keys))
    n1 = sum(_trapz(np.real(wf_dict_1[k] * np.conj(wf_dict_1[k])), times)
             for k in keys)
    n2 = sum(_trapz(np.real(wf_dict_2[k] * np.conj(wf_dict_2[k])), times)
             for k in keys)
    return 1 - num / np.sqrt(n1 * n2)


# ---------------------------------------------------------------------------
# Shared helpers
# ---------------------------------------------------------------------------

def mask_times(times, t0, T, t0_method):
    """Start/end index selection for the analysis window
    (reference qnmfits.py:230-248).  Returns an index array."""
    times = np.asarray(times)
    if t0_method == "geq":
        return np.where((times >= t0) & (times < t0 + T))[0]
    if t0_method == "closest":
        start = int(np.argmin((times - t0) ** 2))
        end = int(np.argmin((times - t0 - T) ** 2))
        return np.arange(start, end)
    raise ValueError(
        "t0_method must be 'geq' or 'closest', got " + repr(t0_method))


def _delta_factor(delta, n_modes):
    """Frequency perturbation factor 1 + delta
    (reference qnmfits.py:253-274)."""
    if isinstance(delta, (list, np.ndarray)):
        delta = np.asarray(delta, dtype=float)
        if len(delta) != n_modes:
            raise ValueError("delta array must have length len(modes)")
        return delta + 1.0
    return float(delta) + 1.0


def _design_matrix(times, t0, frequencies):
    """a[k, j] = exp(-i w_j (t_k - t0)) (reference qnmfits.py:280-283)."""
    dt = np.asarray(times)[:, None] - t0
    return np.exp(-1j * np.asarray(frequencies)[None, :] * dt)


def _lstsq(a, d):
    C, res, rank, sv = np.linalg.lstsq(a, d, rcond=None)
    return C, res, rank, sv


# ---------------------------------------------------------------------------
# Fits (reference qnmfits.py:142-911)
# ---------------------------------------------------------------------------

def ringdown_fit(times, data, modes, Mf, chif, t0, t0_method="geq", T=100,
                 delta=0.0):
    """Single-series least-squares ringdown fit
    (reference qnmfits.py:142-315)."""
    idx = mask_times(times, t0, T, t0_method)
    tm, dm = np.asarray(times)[idx], np.asarray(data)[idx]

    factor = _delta_factor(delta, len(modes))
    frequencies = factor * np.array(get_qnm().omega_list(modes, chif, Mf))

    a = _design_matrix(tm, t0, frequencies)
    C, res, rank, sv = _lstsq(a, dm)
    model = a @ C
    return {
        "residual": res, "rank": rank, "s": sv,
        "mismatch": mismatch(tm, model, dm),
        "C": C, "data": dm, "model": model, "model_times": tm,
        "t0": t0, "modes": modes,
        "mode_labels": [str(m) for m in modes],
        "frequencies": frequencies,
    }


def dynamic_ringdown_fit(times, data, modes, Mf, chif, t0, t0_method="geq",
                         T=100):
    """Fit with time-dependent (Mf(t), chif(t)) spectrum
    (reference qnmfits.py:318-475)."""
    idx = mask_times(times, t0, T, t0_method)
    tm, dm = np.asarray(times)[idx], np.asarray(data)[idx]
    Mf_t = np.full(len(tm), Mf) if np.ndim(Mf) == 0 else np.asarray(Mf)[idx]
    chif_t = np.full(len(tm), chif) if np.ndim(chif) == 0 \
        else np.asarray(chif)[idx]

    frequencies = np.array(get_qnm().omega_list(modes, chif_t, Mf_t))  # (J,K)
    a = np.exp(-1j * frequencies * (tm - t0)).T
    C, res, rank, sv = _lstsq(a, dm)
    model = a @ C
    return {
        "residual": res,
        "mismatch": mismatch(tm, model, dm),
        "C": C, "data": dm, "model": model, "model_times": tm,
        "t0": t0, "modes": modes,
        "mode_labels": [str(m) for m in modes],
        "frequencies": frequencies,
    }


def multimode_ringdown_fit(times, data_dict, modes, Mf, chif, t0,
                           t0_method="geq", T=100, spherical_modes=None):
    """Joint fit across spherical-harmonic modes with shared amplitudes
    weighted by mixing coefficients (reference qnmfits.py:478-673)."""
    if spherical_modes is None:
        spherical_modes = list(data_dict.keys())
    idx = mask_times(times, t0, T, t0_method)
    tm = np.asarray(times)[idx]
    masked = {lm: np.asarray(data_dict[lm])[idx] for lm in spherical_modes}
    d = np.concatenate([masked[lm] for lm in spherical_modes])

    q = get_qnm()
    frequencies = np.array(q.omega_list(modes, chif, Mf))
    mu_rows = [np.array(q.mu_list([lm + mode for mode in modes], chif))
               for lm in spherical_modes]

    decay = _design_matrix(tm, t0, frequencies)       # (K, J)
    a = np.concatenate([mu[None, :] * decay for mu in mu_rows])  # (I*K, J)

    C, res, rank, sv = _lstsq(a, d)
    model = a @ C

    K = len(tm)
    model_dict = {lm: model[i * K:(i + 1) * K]
                  for i, lm in enumerate(spherical_modes)}
    weighted_C = {lm: mu_rows[i] * C
                  for i, lm in enumerate(spherical_modes)}
    return {
        "residual": res,
        "mismatch": multimode_mismatch(tm, model_dict, masked),
        "C": C, "weighted_C": weighted_C,
        "data": masked, "model": model_dict, "model_times": tm,
        "t0": t0, "modes": modes,
        "mode_labels": [str(m) for m in modes],
        "frequencies": frequencies,
    }


def dynamic_multimode_ringdown_fit(times, data_dict, modes, Mf, chif, t0,
                                   t0_method="geq", T=100,
                                   spherical_modes=None):
    """Multimode fit with time-dependent spectrum
    (reference qnmfits.py:676-911)."""
    if spherical_modes is None:
        spherical_modes = list(data_dict.keys())
    idx = mask_times(times, t0, T, t0_method)
    tm = np.asarray(times)[idx]
    masked = {lm: np.asarray(data_dict[lm])[idx] for lm in spherical_modes}
    d = np.concatenate([masked[lm] for lm in spherical_modes])

    Mf_t = np.asarray(Mf)[idx] if np.ndim(Mf) else np.full(len(tm), Mf)
    chif_t = np.asarray(chif)[idx] if np.ndim(chif) \
        else np.full(len(tm), chif)

    q = get_qnm()
    freqs = np.array(q.omega_list(modes, chif_t, Mf_t)).T  # (K, J)
    mu_blocks = [np.array(q.mu_list([lm + mode for mode in modes], chif_t)).T
                 for lm in spherical_modes]                # each (K, J)

    decay = np.exp(-1j * freqs * (tm[:, None] - t0))       # (K, J)
    a = np.concatenate([mu * decay for mu in mu_blocks])   # (I*K, J)

    C, res, rank, sv = _lstsq(a, d)
    model = a @ C
    weighted = np.concatenate(mu_blocks) * C

    K = len(tm)
    model_dict = {lm: model[i * K:(i + 1) * K]
                  for i, lm in enumerate(spherical_modes)}
    weighted_C = {lm: weighted[i * K:(i + 1) * K]
                  for i, lm in enumerate(spherical_modes)}
    return {
        "residual": res,
        "mismatch": multimode_mismatch(tm, model_dict, masked),
        "C": C, "weighted_C": weighted_C,
        "data": masked, "model": model_dict, "model_times": tm,
        "t0": t0, "modes": modes,
        "mode_labels": [str(m) for m in modes],
        "frequencies": np.vstack(len(spherical_modes) * [freqs]),
    }


# ---------------------------------------------------------------------------
# Sweeps and optimizers (reference qnmfits.py:1183-2043) -- serial loops;
# the TPU engine replaces these with batched solves (qnmfits_tpu.batched).
# ---------------------------------------------------------------------------

def _is_static(x):
    return np.ndim(x) == 0


def fit_dispatch(times, data, modes, Mf, chif, t0, t0_method, T,
                 spherical_modes=None, delta=0.0):
    """Pick the fit flavour from (dict?, static spectrum?) like the
    reference's sweep loops (qnmfits.py:1268-1299)."""
    if isinstance(data, dict):
        if _is_static(Mf) and _is_static(chif):
            return multimode_ringdown_fit(
                times, data, modes, Mf, chif, t0, t0_method, T,
                spherical_modes)
        return dynamic_multimode_ringdown_fit(
            times, data, modes, Mf, chif, t0, t0_method, T, spherical_modes)
    if _is_static(Mf) and _is_static(chif):
        return ringdown_fit(times, data, modes, Mf, chif, t0, t0_method, T,
                            delta)
    return dynamic_ringdown_fit(times, data, modes, Mf, chif, t0,
                                t0_method, T)


def mismatch_t0_array(times, data, modes, Mf, chif, t0_array,
                      t0_method="geq", T_array=100, spherical_modes=None,
                      delta=0.0):
    """Mismatch vs ringdown start time (reference qnmfits.py:1183-1301)."""
    t0_array = np.asarray(t0_array)
    if np.ndim(T_array) == 0:
        T_array = np.full(len(t0_array), T_array)
    return [fit_dispatch(times, data, modes, Mf, chif, t0, t0_method, T,
                         spherical_modes, delta)["mismatch"]
            for t0, T in zip(t0_array, T_array)]


def mismatch_M_chi_grid(times, data, modes, Mf_minmax, chif_minmax, t0,
                        t0_method="geq", T=100, res=50,
                        spherical_modes=None, delta=0.0):
    """Mismatch over an (Mf, chif) grid (reference qnmfits.py:1304-1415).

    Row-major over Mf (rows) x chif (cols), matching the reference's
    reshape (qnmfits.py:1413).
    """
    Mf_array = np.linspace(*Mf_minmax, res)
    chif_array = np.linspace(*chif_minmax, res)
    mm = np.empty(res * res)
    for i in range(res * res):
        Mf = Mf_array[i // res]
        chif = chif_array[i % res]
        mm[i] = fit_dispatch(times, data, modes, Mf, chif, t0, t0_method, T,
                             spherical_modes, delta)["mismatch"]
    return mm.reshape(res, res)


def mismatch_omega_grid(times, data, modes, Mf, chif, re_minmax, im_minmax,
                        t0, t0_method="geq", T=100, res=50):
    """Mismatch over a complex-frequency grid for one extra free mode
    (reference qnmfits.py:1679-1827).

    Note: the reference re-masks `times`/`data` inside its loop
    (qnmfits.py:1762-1780), which shrinks the window each iteration for
    t0_method='closest'.  That is a bug we do not reproduce: the mask is
    applied once, which is identical behaviour for 'geq'.
    """
    idx = mask_times(times, t0, T, t0_method)
    tm, dm = np.asarray(times)[idx], np.asarray(data)[idx]
    fixed = np.array(get_qnm().omega_list(modes, chif, Mf))

    re_array = np.linspace(*re_minmax, res)
    im_array = np.linspace(*im_minmax, res)
    mm = np.empty(res * res)
    for i in range(res * res):
        w_free = re_array[i // res] + 1j * im_array[i % res]
        freqs = np.concatenate([fixed, [w_free]])
        a = _design_matrix(tm, t0, freqs)
        C, *_ = _lstsq(a, dm)
        mm[i] = mismatch(tm, a @ C, dm)
    # Reference transposes the reshaped grid (qnmfits.py:1825).
    return mm.reshape(res, res).T


def calculate_epsilon(times, data, modes, Mf, chif, t0, t0_method="geq",
                      T=100, spherical_modes=None, min_method="Nelder-Mead",
                      delta=0.0, x0=None):
    """Best-fit (Mf, chif) by mismatch minimisation; epsilon distance from
    the true remnant (reference qnmfits.py:1418-1594)."""
    from scipy.optimize import minimize

    def objective(x):
        chif_x = min(max(x[1], 0.0), 0.99)
        return fit_dispatch(times, data, modes, x[0], chif_x, t0, t0_method,
                            T, spherical_modes, delta)["mismatch"]

    res = minimize(objective, x0 if x0 is not None else [Mf, chif],
                   method=min_method, bounds=[(0, 2.0), (0, 0.99)],
                   options={"xatol": 1e-6, "disp": False})
    Mf_bf, chif_bf = res.x
    eps = np.sqrt((Mf_bf - Mf) ** 2 + (chif_bf - chif) ** 2)
    return eps, Mf_bf, chif_bf


def free_frequency_fit(times, data, t0, modes=[], Mf=None, chif=None,
                       t0_method="geq", T=100, min_method="Nelder-Mead"):
    """Best free complex frequency on top of fixed QNMs
    (reference qnmfits.py:1905-2043)."""
    from scipy.optimize import minimize

    idx = mask_times(times, t0, T, t0_method)
    tm, dm = np.asarray(times)[idx], np.asarray(data)[idx]
    fixed = np.array(get_qnm().omega_list(modes, chif, Mf))

    def objective(x):
        freqs = np.concatenate([fixed, [x[0] + 1j * x[1]]])
        a = _design_matrix(tm, t0, freqs)
        C, *_ = _lstsq(a, dm)
        return mismatch(tm, a @ C, dm)

    res = minimize(objective, [1, -0.5], method=min_method,
                   bounds=[(0, 2), (-1, 0)],
                   options={"xatol": 1e-8, "disp": False})
    return res.x[0] + 1j * res.x[1]


def rational_filter(times, data, modes, Mf, chif, t_start=-300, t_end=None,
                    dt=None, t_taper=100, align_inspiral=True):
    """Frequency-domain removal of QNM content, Ma et al. arXiv:2207.10870
    (reference qnmfits.py:2046-2152)."""
    from scipy.interpolate import interp1d

    times = np.asarray(times)
    data = np.asarray(data)
    if t_end is None:
        t_end = times[-1]
    if dt is None:
        dt = float(np.min(np.diff(times)))

    t_u = np.arange(t_start, t_end, dt)
    d_u = interp1d(times, data.real, kind="cubic")(t_u) \
        + 1j * interp1d(times, data.imag, kind="cubic")(t_u)

    # Cosine taper at early times.
    taper_sel = t_u < (t_start + t_taper)
    n_taper = int(taper_sel.sum())
    arg = np.pi * np.arange(n_taper)[::-1] / n_taper
    d_u[taper_sel] *= (np.cos(arg) + 1) / 2

    freqs = np.fft.fftfreq(len(d_u), d=dt)
    spec = np.fft.fft(d_u)

    q = get_qnm()
    filt = np.ones_like(spec)
    phase_shift = 0.0
    time_shift = 0.0
    for (l, m, n, sign) in modes:
        w = q.omega(l, m, n, sign, chif, Mf)
        filt *= (2 * np.pi * freqs + w) / (2 * np.pi * freqs + np.conj(w))
        phase_shift += np.angle(w / np.conj(w))
        time_shift += np.abs(2 * np.imag(w) / np.conj(w) ** 2)
    spec *= filt

    if align_inspiral:
        spec *= np.exp(-2j * np.pi * freqs * time_shift - 1j * phase_shift)

    return t_u, np.fft.ifft(spec)
