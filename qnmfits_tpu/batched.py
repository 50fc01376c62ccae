"""Batched ringdown sweeps: the TPU throughput surface.

The reference's sweep hot loops (mismatch vs t0, (Mf, chif) grids,
free-frequency grids -- /root/reference/qnmfits/qnmfits.py:1183-1301,
1304-1415, 1679-1827) rebuild a design matrix and call LAPACK once per
configuration.  Here each sweep is ONE jitted program: the configuration
axis is a vmapped batch dimension over the Gram-assembly fit core
(qnmfits_tpu.engine.fit_core), chunked with lax.map to bound the
(chunk, K, J) working set in HBM.

Mode sets of different sizes batch together by padding to a common J with
identity rows in the Gram matrix (padded amplitudes are exactly zero).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp

from .engine import SpectrumEvaluator, _device_for, fit_core
from .ops.windows import window_closest, window_geq
from .ref_impl import _delta_factor

__all__ = [
    "batch_mismatch_t0", "batch_mismatch_t0_fast",
    "batch_mismatch_t0_sharded", "batch_mismatch_t0_dynamic",
    "batch_mismatch_t0_modesets",
    "batch_mismatch_t0_modesets_dynamic",
    "batch_fit_events",
    "batch_mismatch_M_chi", "batch_mismatch_M_chi_fast",
    "batch_mismatch_omega", "batch_mismatch_omega_fast", "sweep_t0_core",
    "sweep_t0_modesets",
]

_CHUNK = 64


def _canon(modes):
    return tuple(tuple(int(x) for x in m) for m in modes)


def _on_host():
    """Context manager pinning eager evaluation to the CPU.

    Every fast path evaluates the complex-valued spectrum splines (and
    windows) eagerly before shipping split-real arrays to the device;
    those complex arrays must never land on the TPU default device
    (no complex128 there).  One shared guard keeps that invariant in
    one place.
    """
    from .engine import cpu_device
    return jax.default_device(cpu_device())


def sweep_t0_core(times, data, omega, mu, t0s, Ts, t0_method: str,
                  cdtype, col_mask=None, chunk: int = _CHUNK):
    """Mismatch + amplitudes for a batch of (t0, T) windows.

    times (K,), data (I, K), omega (J,), mu (I, J), t0s/Ts (B,).
    Returns (C (B, J), mm (B,)).
    """
    window = window_geq if t0_method == "geq" else window_closest

    def one(args):
        t0, T = args
        w = window(times, t0, T)
        return fit_core(times, data, omega, mu, t0, w, cdtype,
                        col_mask=col_mask)

    return jax.lax.map(one, (t0s, Ts), batch_size=chunk)


def sweep_t0_modesets(times, data, omegas, mus, t0s, Ts, col_masks=None,
                      t0_method: str = "geq", cdtype=jnp.complex64,
                      chunk: int = _CHUNK):
    """The t0 x mode-set sweep: every (mode set, start time) pair in one
    jitted program (the BASELINE.json throughput surface).

    omegas (S, J), mus (S, I, J) padded to a common J; col_masks (S, J)
    marks real vs padding slots.  Returns (C (S, B, J), mm (S, B)).
    """
    if col_masks is None:
        col_masks = jnp.ones(omegas.shape, bool)

    def per_set(args):
        omega, mu, mask = args
        window = window_geq if t0_method == "geq" else window_closest

        def one(targs):
            t0, T = targs
            w = window(times, t0, T)
            return fit_core(times, data, omega, mu, t0, w, cdtype,
                            col_mask=mask)

        return jax.lax.map(one, (t0s, Ts), batch_size=chunk)

    return jax.lax.map(per_set, (omegas, mus, col_masks), batch_size=1)


@lru_cache(maxsize=128)
def _t0_sweep_fn(modes, sph, t0_method, precision):
    ev = SpectrumEvaluator(list(modes), list(sph) if sph else None)
    cdtype = jnp.complex128 if precision == "x64" else jnp.complex64

    def run(times, data, Mf, chif, t0s, Ts, delta_factor):
        omega = ev.omega(chif, Mf, delta_factor)
        mu = jnp.ones((1, omega.shape[0])) if sph is None else ev.mu(chif)
        return sweep_t0_core(times, data, omega, mu, t0s, Ts, t0_method,
                             cdtype)

    return jax.jit(run)


@lru_cache(maxsize=128)
def _mchi_sweep_fn(modes, sph, t0_method, precision):
    ev = SpectrumEvaluator(list(modes), list(sph) if sph else None)
    cdtype = jnp.complex128 if precision == "x64" else jnp.complex64
    window = window_geq if t0_method == "geq" else window_closest

    def run(times, data, Mfs, chifs, t0, T, delta_factor):
        w = window(times, t0, T)

        def one(args):
            Mf, chif = args
            omega = ev.omega(chif, Mf, delta_factor)
            mu = jnp.ones((1, omega.shape[0])) if sph is None \
                else ev.mu(chif)
            return fit_core(times, data, omega, mu, t0, w, cdtype)

        return jax.lax.map(one, (Mfs, chifs), batch_size=_CHUNK)

    return jax.jit(run)


@lru_cache(maxsize=128)
def _omega_sweep_fn(modes, t0_method, precision):
    ev = SpectrumEvaluator(list(modes)) if modes else None
    cdtype = jnp.complex128 if precision == "x64" else jnp.complex64
    window = window_geq if t0_method == "geq" else window_closest

    def run(times, data, Mf, chif, omega_free, t0, T):
        w = window(times, t0, T)
        fixed = ev.omega(chif, Mf) if ev is not None \
            else jnp.zeros((0,), cdtype)

        def one(wf):
            omega = jnp.concatenate([fixed, wf[None]])
            mu = jnp.ones((1, omega.shape[0]))
            return fit_core(times, data, omega, mu, t0, w, cdtype)

        return jax.lax.map(one, omega_free, batch_size=_CHUNK)

    return jax.jit(run)


def _put(args, precision):
    dev = _device_for(precision)
    return [jax.device_put(np.asarray(a), dev) for a in args]


def _prep(times, data, spherical_modes):
    """Stack dict data to (I, K) rows; single series -> (1, K)."""
    if isinstance(data, dict):
        if spherical_modes is None:
            spherical_modes = list(data.keys())
        rows = np.stack([np.asarray(data[lm]) for lm in spherical_modes])
        sph = tuple(tuple(lm) for lm in spherical_modes)
    else:
        rows = np.asarray(data)[None, :]
        sph = None
    return np.asarray(times, float), rows, sph


def _single_row(rows, fn_name):
    """The free-frequency grid fits ONE data series (the reference's
    mismatch_omega_grid takes a bare waveform array, qnmfits.py:1679 --
    there is no spherical_modes parameter on that surface).  Dict data
    with several spherical modes must fail loudly: the bordered kernel
    would silently fit only the first row and the spectrum-batched ones
    would broadcast-contract mismatched I dimensions into garbage."""
    if rows.shape[0] != 1:
        raise ValueError(
            f"{fn_name} fits a single data series; got {rows.shape[0]} "
            "spherical-mode rows.  Pass one waveform array (or a dict "
            "with exactly one entry).")


def batch_mismatch_t0(times, data, modes, Mf, chif, t0_array,
                      t0_method="geq", T_array=100, spherical_modes=None,
                      delta=0.0, precision="x64", return_amplitudes=False,
                      dedup=True):
    """All start times in one vmapped solve
    (replaces reference qnmfits.py:1183-1301 loop).

    dedup=True (default) solves each distinct window once on t0 grids
    finer than the data sampling -- exact for static spectra
    (_window_dedup; PERF.md section 25); dynamic fits never dedup.
    """
    times, rows, sph = _prep(times, data, spherical_modes)
    t0s = np.asarray(t0_array, float)
    Ts = np.broadcast_to(np.asarray(T_array, float), t0s.shape)
    if np.ndim(Mf) != 0 or np.ndim(chif) != 0:
        # Time-dependent spectrum: route to the dynamic kernel (the
        # reference's dynamic fits take no delta, qnmfits.py:318-475).
        if np.any(np.asarray(delta)):
            raise ValueError("delta is not supported for dynamic-spectrum "
                             "fits (time-dependent Mf/chif)")
        return batch_mismatch_t0_dynamic(
            times, data, modes, Mf, chif, t0_array, t0_method=t0_method,
            T_array=T_array, spherical_modes=spherical_modes,
            precision=precision, return_amplitudes=return_amplitudes)
    from .engine import check_spin
    check_spin(chif)
    # The f32 path windows in f32 on device; host-f64 keys only match
    # the x64 kernel exactly.
    dd = None
    if dedup and precision == "x64":
        dd = (_window_dedup(times, t0s, Ts) if t0_method == "geq"
              else _window_dedup_closest(times, t0s, Ts))
    if dd is not None:
        t0s_full = t0s
        t0s, Ts = t0s[dd[0]], np.asarray(Ts)[dd[0]]
    fn = _t0_sweep_fn(_canon(modes), sph, t0_method, precision)
    df = np.asarray(_delta_factor(delta, len(modes)))
    C, mm = fn(*_put((times, rows, float(Mf), float(chif), t0s,
                      np.ascontiguousarray(Ts), df), precision))
    mm = np.asarray(mm)
    if dd is not None:
        if return_amplitudes:
            from .engine import cached_evaluator
            ev = cached_evaluator(_canon(modes), sph)
            with _on_host():
                omega = np.asarray(ev.omega(float(chif), float(Mf), df))
            C = np.asarray(C)
            mm, Cre, Cim = _dedup_scatter(dd, t0s_full, mm,
                                          C.real, C.imag, omega)
            C = Cre + 1j * Cim
        else:
            mm, _, _ = _dedup_scatter(dd, t0s_full, mm)
    return (mm, np.asarray(C)) if return_amplitudes else mm


def batch_mismatch_M_chi(times, data, modes, Mf_minmax, chif_minmax, t0,
                         t0_method="geq", T=100, res=50,
                         spherical_modes=None, delta=0.0, precision="x64"):
    """(Mf, chif) grid in one vmapped solve; row-major over Mf rows,
    chif columns like the reference (qnmfits.py:1413)."""
    times, rows, sph = _prep(times, data, spherical_modes)
    from .engine import check_spin
    check_spin(float(chif_minmax[0]))
    check_spin(float(chif_minmax[1]))
    Mf_array = np.linspace(*Mf_minmax, res)
    chif_array = np.linspace(*chif_minmax, res)
    MM, CC = np.meshgrid(Mf_array, chif_array, indexing="ij")
    fn = _mchi_sweep_fn(_canon(modes), sph, t0_method, precision)
    df = np.asarray(_delta_factor(delta, len(modes)))
    _, mm = fn(*_put((times, rows, MM.ravel(), CC.ravel(), float(t0),
                      float(T), df), precision))
    return np.asarray(mm).reshape(res, res)


def batch_mismatch_omega(times, data, modes, Mf, chif, re_minmax, im_minmax,
                         t0, t0_method="geq", T=100, res=50,
                         precision="x64"):
    """Complex-frequency grid in one vmapped solve; transposed layout like
    the reference (qnmfits.py:1825)."""
    times, rows, sph = _prep(times, data, None)
    _single_row(rows, "batch_mismatch_omega")
    re = np.linspace(*re_minmax, res)
    im = np.linspace(*im_minmax, res)
    RE, IM = np.meshgrid(re, im, indexing="ij")
    wf = (RE + 1j * IM).ravel()
    from .engine import check_spin
    check_spin(chif)
    fn = _omega_sweep_fn(_canon(modes), t0_method, precision)
    args = _put((times, rows, float(Mf) if Mf is not None else 1.0,
                 float(chif) if chif is not None else 0.0, wf,
                 float(t0), float(T)), precision)
    _, mm = fn(*args)
    return np.asarray(mm).reshape(res, res).T


@lru_cache(maxsize=64)
def _t0_sweep_dynamic_fn(modes, sph, t0_method, precision):
    """t0 sweep with a time-dependent Kerr spectrum: omega(t), mu(t) are
    evaluated once on the (Mf(t), chif(t)) arrays; each window is a
    vmapped dynamic fit (reference loop: qnmfits.py:1286-1299)."""
    from .engine import dynamic_fit_core

    ev = SpectrumEvaluator(list(modes), list(sph) if sph else None)
    cdtype = jnp.complex128 if precision == "x64" else jnp.complex64
    window = window_geq if t0_method == "geq" else window_closest

    def run(times, data, Mf_t, chif_t, t0s, Ts):
        omega_t = ev.omega(chif_t, Mf_t).T           # (K, J)
        if sph is None:
            mu_t = jnp.ones((1,) + omega_t.shape)
        else:
            mu_t = jnp.moveaxis(ev.mu(chif_t), -1, 1)  # (I, K, J)

        def one(args):
            t0, T = args
            w = window(times, t0, T)
            return dynamic_fit_core(times, data, omega_t, mu_t, t0, w,
                                    cdtype)

        return jax.lax.map(one, (t0s, Ts), batch_size=16)

    return jax.jit(run)


def batch_mismatch_t0_dynamic(times, data, modes, Mf, chif, t0_array,
                              t0_method="geq", T_array=100,
                              spherical_modes=None, precision="x64",
                              return_amplitudes=False, engine="batched"):
    """Dynamic-spectrum start-time sweep as one jitted program.

    engine='fast' runs the split-complex TPU kernel (the spectrum is
    spline-evaluated on the (Mf(t), chif(t)) arrays host-side once, the
    window sweep runs on device); 'batched' (default) is the complex
    x64 path."""
    from .engine import check_spin
    # Validate BEFORE the scalar->array expansion below: a concrete
    # out-of-range scalar chif must raise like every static path does
    # (arrays stay exempt -- junk samples outside the window are fine).
    check_spin(chif)
    times, rows, sph = _prep(times, data, spherical_modes)
    K = len(times)
    Mf_t = np.full(K, Mf) if np.ndim(Mf) == 0 else np.asarray(Mf, float)
    chif_t = np.full(K, chif) if np.ndim(chif) == 0 \
        else np.asarray(chif, float)
    t0s = np.asarray(t0_array, float)
    Ts = np.ascontiguousarray(
        np.broadcast_to(np.asarray(T_array, float), t0s.shape))
    if engine == "fast":
        ev = SpectrumEvaluator(list(_canon(modes)),
                               list(sph) if sph else None)
        with _on_host():
            omega_t = np.asarray(ev.omega(chif_t, Mf_t)).T      # (K, J)
            if sph is None:
                mu_t = np.ones((1,) + omega_t.shape, complex)
            else:
                mu_t = np.moveaxis(np.asarray(ev.mu(chif_t)), -1, 1)
        Cre, Cim, mm = _t0_sweep_dynamic_fast_fn(t0_method)(
            times, rows.real.copy(), rows.imag.copy(),
            omega_t.real.copy(), omega_t.imag.copy(),
            mu_t.real.copy(), mu_t.imag.copy(), t0s, Ts)
        mm = np.asarray(mm)
        if return_amplitudes:
            return mm, np.asarray(Cre) + 1j * np.asarray(Cim)
        return mm
    fn = _t0_sweep_dynamic_fn(_canon(modes), sph, t0_method, precision)
    C, mm = fn(*_put((times, rows, Mf_t, chif_t, t0s, Ts), precision))
    mm = np.asarray(mm)
    return (mm, np.asarray(C)) if return_amplitudes else mm


@lru_cache(maxsize=8)
def _t0_sweep_dynamic_fast_fn(t0_method):
    from .engine_real import sweep_t0_dynamic_real

    return jax.jit(lambda *a: sweep_t0_dynamic_real(
        *a, t0_method=t0_method))


# ---------------------------------------------------------------------------
# Fast (TPU) start-time sweep on the factored split-complex kernel
# ---------------------------------------------------------------------------

_SPAN_EXP_LIMIT = 18.0   # |Im w| * chunk-span accuracy budget (see below)


def _safe_chunk(t0s, wi_max, chunk):
    """Largest chunk <= `chunk` whose t0 span keeps the factored kernel
    accurate.

    The factored basis references every window in a chunk to the chunk
    start: a mode's Gram diagonal carries e^{-2 |Im w| delta}
    (delta <= chunk span) on top of its true within-window conditioning.
    Once that factor eats the working precision, a mode that IS
    resolvable in its own window becomes unresolvable in the chunk basis
    (dead-column masking then zeroes it -- graceful, but a real
    deviation).  |Im w|*span <= 18 keeps the factor above ~3e-16
    ~ f64 eps: measured max deviation vs the per-window oracle is
    1.6e-13 at span 17.4 and the round-1 bench ran proven-accurate at
    span 17.5 (PERF.md section 2)."""
    span = float(t0s[-1] - t0s[0]) if len(t0s) > 1 else 0.0
    if span <= 0 or wi_max <= 0:
        return chunk
    per_step = span / max(len(t0s) - 1, 1)
    max_span = _SPAN_EXP_LIMIT / wi_max
    max_chunk = max(int(max_span / max(per_step, 1e-30)), 1)
    c = min(chunk, max_chunk)
    # keep it a friendly size
    for size in (512, 256, 128, 64, 32, 16, 8, 4, 2, 1):
        if size <= c:
            return size
    return 1


def _uniform_spacing(times):
    """True when `times` is a uniform grid to a few ulps of ITS OWN
    dtype (np.arange / np.linspace outputs): the gate for the
    analytic-Gram fast path (engine_real._analytic_grams).  A float32
    linspace is uniform to f32 ulps -- and the kernels consuming it run
    in f32, so that is the relevant accuracy budget; judging it by f64
    ulps would silently demote f32 callers (the multichip dryrun) to
    the summation path.  For sub-f64 storage the grid must BE the
    storage-dtype rounding of a uniform grid (ideal grid re-rounded to
    the input dtype, compared at ~4 ulps): the storage rounding itself
    is unavoidable ~0.5-ulp jitter, but real jitter a few ulps above
    that floor (e.g. ~1e-4 absolute on an f32 grid reaching t~150,
    below the old 16-ulp blanket tolerance) must fall back to the
    summation kernels, which use the actual samples.  Genuinely
    non-uniform grids (raw SXS sampling, ~1e-2 relative jitter) fail at
    any float tolerance."""
    t_raw = np.asarray(times)
    floating = np.issubdtype(t_raw.dtype, np.floating)
    eps = np.finfo(t_raw.dtype).eps if floating else np.finfo(float).eps
    t = np.asarray(t_raw, float)
    K = t.shape[0]
    if K < 2 or not t[-1] > t[0]:
        return False
    step = (t[-1] - t[0]) / (K - 1)
    ideal = t[0] + step * np.arange(K)
    if floating and eps > np.finfo(float).eps:
        # Endpoint-rounding skew bounds |t - round(ideal)| at ~2 ulps
        # for a stored-uniform grid; 4 leaves margin without admitting
        # the 16-ulp jitter band.
        ideal = np.asarray(ideal.astype(t_raw.dtype), float)
        tol = 4 * eps * max(abs(t[0]), abs(t[-1]))
    else:
        tol = 16 * eps * max(abs(t[0]), abs(t[-1]))
    return bool(np.max(np.abs(t - ideal)) <= tol)


def _window_dedup(times, t0s, Ts):
    """Unique-window compression of a static-spectrum 'geq' t0 sweep.

    Two start times whose windows hold the SAME samples pose the SAME
    least-squares problem up to an invertible per-column rescale of the
    design (phi_j(t; t0') = phi_j(t; t0) e^{-i w_j (t0' - t0)}): the
    fitted subspace, residual and mismatch are identical, and the
    amplitudes differ by exactly that factor.  On a t0 grid finer than
    the data sampling (e.g. the reference tutorial's dense sweeps,
    qnmfits.py:1183-1301 run per-t0 regardless), most fits are such
    duplicates -- solving each distinct window ONCE and rephasing is
    exact, not an approximation.

    Keys are (first in-window index, first past-end index) computed with
    the kernels' own comparisons (times >= t0, times < t0 + T).  Returns
    (rep, inverse) index arrays with t0s[rep] the first start time of
    each distinct window (so every rephase delta = t0 - t0_rep is >= 0
    and the magnitude factor e^{Im w * delta} <= 1), or None when every
    window is distinct (the wrapper is then a no-op).

    Boundary note: a sample sitting within ~1 ulp of t0 + T is a
    knife-edge in ANY engine (host f64 vs on-device double-single
    rounding of the same comparison) -- dedup introduces no new failure
    class there, it groups by the host-f64 edge like the NumPy oracle.

    NOT valid for dynamic (time-tracked) spectra: there t0 enters the
    design per-ROW (exp(-i w(t_k)(t_k - t0))), which is not a column
    rescale -- the dynamic sweeps never route here.
    """
    t = np.asarray(times, float)
    t0v = np.asarray(t0s, float)
    a_w = np.searchsorted(t, t0v, side="left")         # first t >= t0
    e_w = np.searchsorted(t, t0v + np.asarray(Ts, float), side="left")
    keys = a_w * (len(t) + 1) + e_w
    uniq, rep, inverse = np.unique(keys, return_index=True,
                                   return_inverse=True)
    if len(uniq) == len(t0v):
        return None
    return _ascending_reps(t0v, rep, inverse)


def _ascending_reps(t0v, rep, inverse):
    """np.unique orders the window groups by KEY; with a per-t0
    T_array two groups can share a start index but differ in end, so
    t0v[rep] need not come out ascending.  The factored kernels anchor
    chunks at t0s[0] and size them by the t0 span (and the fast sweeps
    REQUIRE ascending t0s), so reorder the groups by representative
    start time -- group membership is unchanged, hence exact."""
    order = np.argsort(t0v[rep], kind="stable")
    ranks = np.empty(len(order), dtype=inverse.dtype)
    ranks[order] = np.arange(len(order), dtype=inverse.dtype)
    return rep[order], ranks[inverse]


def _window_dedup_closest(times, t0s, Ts):
    """_window_dedup for t0_method='closest' windows [k0, k1) with
    k0/k1 the argmin-closest sample indices (ops.windows.window_closest;
    reference qnmfits.py:240-243, first index wins ties).

    The keys reproduce the kernel's argmin BIT-EXACTLY: the kernel
    scores sample j by fl((fl(t_j - t0) - T)^2), which is NOT the
    distance to fl(t0 + T) -- the two roundings can disagree at a
    midpoint between samples, and a key that groups two windows the
    kernel windows differently would scatter a wrong mismatch.  So
    evaluate the kernel's own expression on a 5-sample bracket around
    searchsorted(t, t0 + T): fl(t_j - t0) is weakly monotone in j and
    subtracting T preserves that, so fl(d^2) is weakly unimodal and its
    FIRST global argmin lies in any bracket containing the sign change;
    +-2 covers the <=1-ulp skew between fl(t0+T) and the kernel's
    association (knife-edge ulp ties on the grid itself remain the
    documented dedup boundary, same as 'geq')."""
    t = np.asarray(times, float)
    n = len(t)
    off = np.arange(-2, 3)

    def kernel_argmin(t0v, Tv):
        # window_closest scores fl((fl(t_j - t0) - T)^2), first-min tie.
        j = np.clip(np.searchsorted(t, t0v + Tv)[:, None] + off, 0, n - 1)
        d = (t[j] - t0v[:, None]) - Tv[:, None]
        return j[np.arange(len(t0v)), np.argmin(d * d, axis=1)]

    t0v = np.asarray(t0s, float)
    Tv = np.broadcast_to(np.asarray(Ts, float), t0v.shape)
    keys = kernel_argmin(t0v, np.zeros_like(t0v)) * (len(t) + 1) \
        + kernel_argmin(t0v, Tv)
    uniq, rep, inverse = np.unique(keys, return_index=True,
                                   return_inverse=True)
    if len(uniq) == len(t0v):
        return None
    return _ascending_reps(t0v, rep, inverse)


def _dedup_rephase(Cre, Cim, omegas, delta):
    """Amplitude rephase from the representative start time to each
    duplicate: C(t0) = C(t0_rep) * exp(-i w (t0 - t0_rep)), the same
    anchoring convention as the factored kernel's epilogue
    (engine_real._chunk_sweep_factored).  Cre/Cim (..., B, J) gathered
    to the full sweep already; omegas (..., J) per set row; delta (B,)
    = t0 - t0_rep >= 0.  Host-side numpy (tiny next to the sweep)."""
    wr = omegas.real[..., None, :]                     # (..., 1, J)
    wi = omegas.imag[..., None, :]
    d = delta[:, None]                                 # (B, 1)
    g = np.exp(wi * d)
    c, s = np.cos(wr * d), np.sin(wr * d)
    return (g * (Cre * c + Cim * s), g * (Cim * c - Cre * s))


def _dedup_scatter(dd, t0s_full, mm, Cre=None, Cim=None, omegas=None):
    """Shared dedup epilogue (PERF.md section 25): scatter the
    distinct-window results back over the full t0 axis and rephase the
    amplitudes.  t0 must be the LAST axis of mm and the second-to-last
    of Cre/Cim (every sweep kernel's layout).  Pass Cre/Cim/omegas only
    when amplitudes were requested; returns (mm, Cre, Cim)."""
    rep, inverse = dd
    mm = np.asarray(mm)[..., inverse]
    if Cre is not None:
        delta = t0s_full - t0s_full[rep][inverse]
        Cre, Cim = _dedup_rephase(np.asarray(Cre)[..., inverse, :],
                                  np.asarray(Cim)[..., inverse, :],
                                  omegas, delta)
    return mm, Cre, Cim


@lru_cache(maxsize=64)
def _t0_sweep_fast_fn(chunk, analytic=False):
    # The spectrum is evaluated host-side (complex splines must never
    # enter a TPU program: the backend cannot lower f64->c128 converts);
    # the jitted kernel is pure split-complex real arithmetic.
    from .engine_real import sweep_t0_factored_real

    return jax.jit(lambda *a: sweep_t0_factored_real(
        *a, chunk=chunk, analytic=analytic))


def _prep_fast(times, data, modes, Mf, chif, t0_array, T_array,
               spherical_modes, delta, chunk):
    """Host-side prep shared by the fast and sharded factored sweeps:
    stacked data rows, split-complex spectrum (evaluated on CPU -- the
    complex splines must never enter a TPU program), overflow-safe
    chunk size."""
    times, rows, sph = _prep(times, data, spherical_modes)
    t0s = np.asarray(t0_array, float)
    if np.any(np.diff(t0s) < 0):
        raise ValueError("t0_array must be sorted ascending")
    Ts = np.ascontiguousarray(
        np.broadcast_to(np.asarray(T_array, float), t0s.shape))

    df = np.asarray(_delta_factor(delta, len(modes)))
    ev_full = SpectrumEvaluator(list(_canon(modes)),
                                list(sph) if sph else None)
    with _on_host():
        omega = np.asarray(ev_full.omega(float(chif), float(Mf), df))
        mu = (np.ones((1, omega.shape[0]), complex) if sph is None
              else np.asarray(ev_full.mu(float(chif))))

    chunk = _safe_chunk(t0s, float(np.max(np.abs(omega.imag))), chunk)
    return times, rows, omega, mu, t0s, Ts, chunk


def batch_mismatch_t0_fast(times, data, modes, Mf, chif, t0_array,
                           T_array=100, spherical_modes=None, delta=0.0,
                           return_amplitudes=False, chunk=128,
                           dedup=True):
    """TPU-speed start-time sweep on the factored split-complex kernel
    (t0_method='geq'; ~76k multimode fits/s per v5e chip at f64
    accuracy).  t0_array must be sorted ascending.

    Identical results to batch_mismatch_t0 (tested to 1e-11); use this
    for large sweeps.  dedup=True (default) solves each distinct window
    once on t0 grids finer than the data sampling -- exact for the
    static spectrum here (_window_dedup; PERF.md section 25).
    """
    times, rows, omega, mu, t0s, Ts, chunk = _prep_fast(
        times, data, modes, Mf, chif, t0_array, T_array, spherical_modes,
        delta, chunk)
    dd = _window_dedup(times, t0s, Ts) if dedup else None
    if dd is not None:
        t0s_full = t0s
        t0s, Ts = t0s[dd[0]], Ts[dd[0]]
        chunk = _safe_chunk(t0s, float(np.max(np.abs(omega.imag))), chunk)
    fn = _t0_sweep_fast_fn(chunk, _uniform_spacing(times))
    Cre, Cim, mm = fn(times, rows.real.copy(), rows.imag.copy(),
                      omega.real.copy(), omega.imag.copy(),
                      mu.real.copy(), mu.imag.copy(), t0s, Ts)
    if dd is not None:
        mm, Cre, Cim = _dedup_scatter(
            dd, t0s_full, mm,
            Cre if return_amplitudes else None,
            Cim if return_amplitudes else None, omega)
    mm = np.asarray(mm)
    if return_amplitudes:
        return mm, np.asarray(Cre) + 1j * np.asarray(Cim)
    return mm


@lru_cache(maxsize=64)
def _spectra_sweep_fn(chunk, analytic=False):
    from .engine_real import sweep_spectra_real

    return jax.jit(lambda *a: sweep_spectra_real(
        *a, chunk=chunk, analytic=analytic))


def _accel_backend(mesh=None):
    """True when the sweep dispatch target is an accelerator (not the
    x64 CPU backend).  Routing knob for trades that are measured
    opposite ways on the two backends (PERF.md section 19).  Pass the
    resolved Mesh when one will run the sweep -- its devices, not the
    process default backend, are what execute (the 8-device CPU-mesh
    suite runs on a TPU-default host and vice versa)."""
    try:
        dev = (mesh.devices.flat[0] if mesh is not None
               else jax.devices()[0])
        return dev.platform != "cpu"
    except RuntimeError:
        return False


@lru_cache(maxsize=64)
def _spectra_stacked_fn(chunk):
    from .engine_real import sweep_spectra_stacked_real

    return jax.jit(lambda *a: sweep_spectra_stacked_real(*a, chunk=chunk))


def _run_spectra_sweep(times, rows, omegas, mus, t0, w, chunk,
                       mesh=None):
    """Split-complex spectrum-batched sweep: omegas (Q, J), mus (Q, I, J)
    complex host arrays; returns (C (Q, J) complex, mm (Q,)).  Pass
    ``mesh`` to shard the grid axis over devices (DP, one gather).
    Uniform time grids route the STACKED analytic kernel on EVERY
    backend (engine_real.sweep_spectra_stacked_real, PERF.md section
    26): the data is pre-sliced host-side to the shared contiguous
    window -- exact, every fit quantity is a window sum -- and the
    Grams/solve/epilogue run whole-grid (measured 4.1x the summation
    kernel even on CPU, unlike the per-item analytic path which stays
    TPU-gated).  Non-uniform/non-contiguous falls back to the per-item
    kernels."""
    times = np.asarray(times, float)
    w_np = np.asarray(w, float)
    args = (times, rows.real.copy(), rows.imag.copy(),
            omegas.real.copy(), omegas.imag.copy(),
            mus.real.copy(), mus.imag.copy(),
            float(t0), w_np)
    if mesh is not None:
        from .parallel.mesh import sharded_spectra_sweep, sweep_mesh
        if mesh == "auto":
            mesh = sweep_mesh(n_time=1)
        analytic = _uniform_spacing(times) and _accel_backend(mesh)
        Cre, Cim, mm = sharded_spectra_sweep(*args, mesh=mesh,
                                             chunk=chunk,
                                             analytic=analytic)
    else:
        uniform = _uniform_spacing(times)
        idx = np.nonzero(w_np > 0.5)[0]
        contiguous = idx.size > 0 and idx[-1] - idx[0] + 1 == idx.size
        if uniform and contiguous:
            sl = slice(int(idx[0]), int(idx[-1]) + 1)
            Cre, Cim, mm = _spectra_stacked_fn(chunk)(
                times[sl], rows.real[:, sl].copy(),
                rows.imag[:, sl].copy(),
                omegas.real.copy(), omegas.imag.copy(),
                mus.real.copy(), mus.imag.copy(), float(t0))
        else:
            analytic = uniform and _accel_backend()
            Cre, Cim, mm = _spectra_sweep_fn(chunk, analytic)(*args)
    return np.asarray(Cre) + 1j * np.asarray(Cim), np.asarray(mm)


def batch_mismatch_M_chi_fast(times, data, modes, Mf_minmax, chif_minmax,
                              t0, t0_method="geq", T=100, res=50,
                              spherical_modes=None, delta=0.0, chunk=64,
                              mesh=None):
    """(Mf, chif) grid on the split-complex TPU kernel (hot loop #2,
    reference qnmfits.py:1304-1415): the spectrum is spline-evaluated
    host-side for every grid point at once, the res^2 Gram solves run
    as one jitted spectrum-batched sweep.  Identical layout to
    batch_mismatch_M_chi (row-major Mf rows / chif columns)."""
    times, rows, sph = _prep(times, data, spherical_modes)
    from .engine import check_spin
    check_spin(float(chif_minmax[0]))
    check_spin(float(chif_minmax[1]))
    Mf_array = np.linspace(*Mf_minmax, res)
    chif_array = np.linspace(*chif_minmax, res)
    MM, CC = np.meshgrid(Mf_array, chif_array, indexing="ij")

    ev = SpectrumEvaluator(list(_canon(modes)),
                           list(sph) if sph else None)
    df = np.asarray(_delta_factor(delta, len(modes)))
    with _on_host():
        # (J, Q) -> (Q, J); omega() divides by Mf with (J, Q)/(Q,)
        # broadcasting.
        omegas = np.asarray(ev.omega(CC.ravel(), MM.ravel(), df)).T
        if sph is None:
            mus = np.ones((omegas.shape[0], 1, omegas.shape[1]), complex)
        else:
            mus = np.moveaxis(np.asarray(ev.mu(CC.ravel())), -1, 0)

    window = window_geq if t0_method == "geq" else window_closest
    with _on_host():
        w = np.asarray(window(times, float(t0), float(T)), float)
    _, mm = _run_spectra_sweep(times, rows, omegas, mus, t0, w, chunk,
                               mesh=mesh)
    return mm.reshape(res, res)


def _omega_fixed_prep(modes, Mf, chif, times, t0, T, t0_method):
    """Fixed-QNM frequencies and {0,1} window shared by the
    free-frequency grid kernels.  None defaults mirror
    batch_mismatch_omega (Mf=1, chif=0)."""
    if modes:
        ev = SpectrumEvaluator(list(_canon(modes)))
        with _on_host():
            fixed = np.asarray(ev.omega(
                float(chif) if chif is not None else 0.0,
                float(Mf) if Mf is not None else 1.0))
    else:
        fixed = np.zeros((0,), complex)
    window = window_geq if t0_method == "geq" else window_closest
    with _on_host():
        w = np.asarray(window(times, float(t0), float(T)), float)
    return fixed, w


def batch_mismatch_omega_fast(times, data, modes, Mf, chif, re_minmax,
                              im_minmax, t0, t0_method="geq", T=100,
                              res=50, chunk=64, mesh=None):
    """Complex-frequency grid on the split-complex TPU kernel (hot loop
    #3, reference qnmfits.py:1679-1827): fixed QNM frequencies plus one
    free frequency per grid point, one jitted spectrum-batched sweep.
    Transposed output layout like the reference (qnmfits.py:1825)."""
    times, rows, sph = _prep(times, data, None)
    _single_row(rows, "batch_mismatch_omega_fast")
    re = np.linspace(*re_minmax, res)
    im = np.linspace(*im_minmax, res)
    RE, IM = np.meshgrid(re, im, indexing="ij")
    wf = (RE + 1j * IM).ravel()

    fixed, w = _omega_fixed_prep(modes, Mf, chif, times, t0, T, t0_method)
    Q = wf.shape[0]
    omegas = np.concatenate(
        [np.broadcast_to(fixed, (Q, fixed.shape[0])), wf[:, None]], axis=1)
    mus = np.ones((Q, 1, omegas.shape[1]), complex)

    _, mm = _run_spectra_sweep(times, rows, omegas, mus, t0, w, chunk,
                               mesh=mesh)
    return mm.reshape(res, res).T


@lru_cache(maxsize=16)
def _omega_bordered_fn(a_chunk, analytic=False):
    from .engine_real import sweep_omega_grid_bordered_real

    return jax.jit(
        lambda *a: sweep_omega_grid_bordered_real(
            *a, a_chunk=a_chunk, analytic=analytic))


def batch_mismatch_omega_bordered(times, data, modes, Mf, chif, re_minmax,
                                  im_minmax, t0, t0_method="geq", T=100,
                                  res=50, a_chunk=8, mesh=None,
                                  return_amplitudes=False):
    """Complex-frequency grid via the bordered fixed-block kernel (hot
    loop #3, reference qnmfits.py:1679-1827).

    The Jf fixed QNM columns are identical at every grid point, so the
    fixed Gram block is assembled, equilibrated, floored and factorised
    ONCE; each grid point costs only its free-column phases (separable
    over the (Re, Im) axes), one row of a batched cross-Gram matmul and
    an O(Jf) bordered block-elimination solve -- instead of the full
    per-point O(K J^2) assembly + J x J Cholesky of the spectrum-batched
    kernel.  Same regularised system, same <=1e-11 parity bar
    (tests/test_batched.py).  Transposed output layout like the
    reference (qnmfits.py:1825): mm is (res, res) indexed [im, re];
    with return_amplitudes=True, C is (res, res, Jf+1) in the SAME
    [im, re] layout, so C[i, j] are the amplitudes of the grid point
    whose mismatch is mm[i, j] (fixed modes first, free column last).
    """
    times, rows, sph = _prep(times, data, None)
    _single_row(rows, "batch_mismatch_omega_bordered")
    re_axis = np.linspace(*re_minmax, res)
    im_axis = np.linspace(*im_minmax, res)

    fixed, w = _omega_fixed_prep(modes, Mf, chif, times, t0, T, t0_method)

    # Closed-form cross Grams on uniform grids (PERF.md section 20):
    # measured faster on BOTH backends (unlike the per-item grid
    # kernel's trade), so uniformity is the only gate.
    analytic = _uniform_spacing(times)

    args = (np.asarray(times, float), rows[0].real.copy(),
            rows[0].imag.copy(), fixed.real.copy(), fixed.imag.copy(),
            re_axis, im_axis, float(t0), w)
    if mesh is not None:
        from .parallel.mesh import sharded_omega_grid_bordered, sweep_mesh
        if mesh == "auto":
            mesh = sweep_mesh(n_time=1)
        Cre, Cim, mm = sharded_omega_grid_bordered(*args, mesh=mesh,
                                                   a_chunk=a_chunk,
                                                   analytic=analytic)
    else:
        Cre, Cim, mm = _omega_bordered_fn(a_chunk, analytic)(*args)
    mm = np.asarray(mm).reshape(res, res).T
    if return_amplitudes:
        # Kernel order is q = re_idx*res + im_idx; realign to mm's
        # transposed [im, re] layout so mm[i, j] and C[i, j] describe
        # the same grid point.
        C = np.asarray(Cre) + 1j * np.asarray(Cim)
        C = C.reshape(res, res, -1).transpose(1, 0, 2)
        return mm, C
    return mm


@lru_cache(maxsize=32)
def _modesets_spectrum_fn(sets_key, sph):
    """One jitted CPU program evaluating the padded spectrum of a whole
    mode-set list at a (chif, Mf) point.

    Re-constructing S SpectrumEvaluators and eagerly dispatching
    hundreds of small spline gathers per call dominated multi-spin
    sweeps (~20 s/call for 21 ladders); compiled once per mode-set
    list, a repeat call is a single millisecond-scale dispatch.
    """
    import jax

    evs = [SpectrumEvaluator(list(ms), list(sph) if sph else None)
           for ms in sets_key]
    J = max(len(ms) for ms in sets_key)
    masks = np.zeros((len(sets_key), J), bool)
    for si, ms in enumerate(sets_key):
        masks[si, :len(ms)] = True

    def eval_all(chif, Mf):
        ws, mus_ = [], []
        for ev, ms in zip(evs, sets_key):
            w = ev.omega(chif, Mf)
            ws.append(jnp.pad(w, (0, J - w.shape[0])))
            if sph is None:
                mu = jnp.ones((1, w.shape[0]), w.dtype)
            else:
                mu = ev.mu(chif)
            mus_.append(jnp.pad(mu, ((0, 0), (0, J - w.shape[0]))))
        return jnp.stack(ws), jnp.stack(mus_)

    # Scalar-remnant entry plus a vmapped one over an (R,) remnant axis
    # (the per-spin spectra of a whole remnant study in one dispatch).
    return jax.jit(eval_all), jax.jit(jax.vmap(eval_all)), masks


@lru_cache(maxsize=64)
def _t0_sweep_modesets_fn(chunk, analytic=False):
    from .engine_real import sweep_t0_modesets_factored_real

    return jax.jit(
        lambda *a: sweep_t0_modesets_factored_real(
            *a, chunk=chunk, analytic=analytic))


@lru_cache(maxsize=16)
def _t0_sweep_modesets_complex_fn(t0_method, precision):
    """Complex-typed mode-set sweep (CPU x64): the generic-window path
    backing t0_method='closest' (the factored TPU kernel needs 'geq')."""
    cdtype = jnp.complex128 if precision == "x64" else jnp.complex64
    return jax.jit(lambda times, rows, omegas, mus, t0s, Ts, masks:
                   sweep_t0_modesets(times, rows, omegas, mus, t0s, Ts,
                                     col_masks=masks, t0_method=t0_method,
                                     cdtype=cdtype))


def batch_mismatch_t0_modesets(times, data, mode_sets, Mf, chif, t0_array,
                               T_array=100, spherical_modes=None,
                               return_amplitudes=False, chunk=256,
                               mesh=None, t0_method="geq",
                               precision="x64", bucket=False,
                               dedup=True):
    """The t0 x mode-set sweep: every (mode set, start time) pair in ONE
    jitted TPU program on the factored split-complex kernel (the
    single-chip benchmark surface; reference equivalent is a doubly
    nested Python loop over qnmfits.py:1183-1301).

    mode_sets is a list of mode lists (each a list of (l, m, n, sign)
    tuples, possibly of different lengths -- they are padded to a common
    J with identity Gram rows, padded amplitudes exactly zero).
    t0_method='geq' (default) runs the factored TPU kernel and needs
    t0_array sorted ascending; t0_method='closest' runs the complex
    x64 window sweep on CPU (reference window semantics,
    qnmfits.py:1240-1255).

    chif and/or Mf may also be 1-D arrays (the REMNANT axis R,
    broadcast together): the per-spin spectra are stacked into the
    vmapped set axis, so a whole (mode set x remnant x t0) study runs
    as ONE jitted program instead of a Python loop over spins (the
    reference's triple-nested loop, qnmfits.py:1271-1299 x 1391-1410
    x mode sets).  For TIME-DEPENDENT (Mf(t), chif(t)) tracks use
    batch_mismatch_t0_modesets_dynamic.

    Returns mm (S, B) for scalar remnant, (S, R, B) with a remnant
    axis; with return_amplitudes=True also a list of S complex
    (B, len(mode_sets[s])) (or (R, B, len)) amplitude arrays.  Pass
    ``mesh`` (or mesh='auto') to shard the start-time axis over a
    device mesh (t0_method='geq' only).  bucket=True groups sets by
    padded width (powers of two) and runs one kernel per width,
    halving the padded-Gram FLOPs for wide-ranging ladder studies --
    measured NEUTRAL on the tunneled v5e (the sweep is not FLOP-bound
    at these shapes and each width class pays its own one-time program
    load; PERF.md section 12), so it stays opt-in.

    dedup=True (default) solves each DISTINCT window once when the t0
    grid is finer than the data sampling and scatters the results --
    exact for static spectra (see _window_dedup; PERF.md section 25);
    dedup=False forces the per-t0 kernel.
    """
    if t0_method not in ("geq", "closest"):
        raise ValueError("t0_method must be 'geq' or 'closest'")
    if mesh is not None and precision != "x64":
        raise ValueError("mesh sweeps run the split-complex f64 sharded "
                         "kernel; precision applies to the single-device "
                         "path only (drop precision or mesh)")
    times, rows, sph = _prep(times, data, spherical_modes)
    t0s = np.asarray(t0_array, float)
    if t0_method == "geq" and np.any(np.diff(t0s) < 0):
        raise ValueError("t0_array must be sorted ascending")
    Ts = np.ascontiguousarray(
        np.broadcast_to(np.asarray(T_array, float), t0s.shape))

    from .engine import check_spin
    scalar_remnant = np.ndim(Mf) == 0 and np.ndim(chif) == 0
    if np.ndim(Mf) > 1 or np.ndim(chif) > 1:
        raise ValueError("Mf/chif must be scalars or 1-D remnant arrays")
    chif_arr, Mf_arr = np.broadcast_arrays(
        np.atleast_1d(np.asarray(chif, float)),
        np.atleast_1d(np.asarray(Mf, float)))
    for c in chif_arr:
        check_spin(float(c))
    R = len(chif_arr)

    sets = [list(_canon(ms)) for ms in mode_sets]
    sets_key = tuple(tuple(ms) for ms in sets)
    S = len(sets)
    fn, fn_vmap, masks = _modesets_spectrum_fn(sets_key, sph)
    with _on_host():
        if scalar_remnant:
            omegas_j, mus_j = fn(float(chif), float(Mf))
        else:
            omegas_j, mus_j = fn_vmap(chif_arr, Mf_arr)
        omegas = np.asarray(omegas_j)
        mus = np.asarray(mus_j)
    if not scalar_remnant:
        # Fold the remnant axis into the vmapped set axis: (R, S, ...)
        # -> (R*S, ...), row r*S + s.
        omegas = omegas.reshape(R * S, omegas.shape[-1])
        mus = mus.reshape((R * S,) + mus.shape[-2:])
    masks_run = masks if scalar_remnant else np.tile(masks, (R, 1))

    # Unique-window compression: exact for the static spectra used here
    # (see _window_dedup).  The 'closest' branch is host-f64 end to end
    # only at precision='x64', so the f32 path keeps the per-t0 kernel.
    dd = None
    if dedup and (t0_method == "geq" or precision == "x64"):
        dd = (_window_dedup(times, t0s, Ts) if t0_method == "geq"
              else _window_dedup_closest(times, t0s, Ts))
    if dd is not None:
        t0s_full = t0s
        t0s, Ts = t0s[dd[0]], Ts[dd[0]]

    if t0_method == "closest":
        if mesh is not None:
            raise ValueError("mesh sharding of the mode-set sweep needs "
                             "t0_method='geq'")
        if bucket:
            raise ValueError("bucket=True requires t0_method='geq' (the "
                             "width-bucketed factored kernel)")
        fn_c = _t0_sweep_modesets_complex_fn(t0_method, precision)
        dev = _device_for(precision)
        C, mm = fn_c(*[jax.device_put(np.asarray(a), dev) for a in
                       (times, rows, omegas, mus, t0s, Ts, masks_run)])
        Cre, Cim = np.asarray(C).real, np.asarray(C).imag
    else:
        if mesh is not None:
            from .parallel.mesh import sweep_mesh
            if mesh == "auto":
                mesh = sweep_mesh(n_time=1)

        analytic = _uniform_spacing(times)

        def run_group(o, m, mk):
            ck = _safe_chunk(t0s, float(np.max(np.abs(o.imag))), chunk)
            a = (times, rows.real.copy(), rows.imag.copy(),
                 o.real.copy(), o.imag.copy(),
                 m.real.copy(), m.imag.copy(), t0s, Ts, mk)
            if mesh is not None:
                from .parallel.mesh import (
                    sharded_t0_sweep_modesets_factored)
                return sharded_t0_sweep_modesets_factored(
                    *a, mesh=mesh, chunk=ck, analytic=analytic)
            return _t0_sweep_modesets_fn(ck, analytic)(*a)

        if bucket:
            # Group rows by padded width: the factored Gram matmul is
            # O(J^2) per fit, so padding a 1-mode ladder to the deepest
            # set's J wastes up to (J/len)^2.  Buckets (powers of two
            # capped at J) re-pad each group to its own width; shallow
            # buckets also get LARGER overflow-safe chunks (their
            # |Im w| is smaller).  NOTE: measured neutral on the
            # tunneled v5e (PERF.md section 12) -- kept for
            # FLOP-bound deployments, opt-in.
            Sf = omegas.shape[0]
            J = omegas.shape[1]
            lens = np.array([len(sets[i % S]) for i in range(Sf)])
            def _width(n):
                b = 4
                while b < n:
                    b *= 2
                return min(b, J)
            widths = np.array([_width(n) for n in lens])
            mm = np.empty((Sf, len(t0s)))
            Cre = np.zeros((Sf, len(t0s), J))
            Cim = np.zeros((Sf, len(t0s), J))
            for bw in sorted(set(widths)):
                idx = np.where(widths == bw)[0]
                Cre_b, Cim_b, mm_b = run_group(
                    np.ascontiguousarray(omegas[idx][:, :bw]),
                    np.ascontiguousarray(mus[idx][:, :, :bw]),
                    np.ascontiguousarray(masks_run[idx][:, :bw]))
                mm[idx] = np.asarray(mm_b)
                Cre[idx, :, :bw] = np.asarray(Cre_b)
                Cim[idx, :, :bw] = np.asarray(Cim_b)
        else:
            Cre, Cim, mm = run_group(omegas, mus, masks_run)
    if dd is not None:
        mm, Cre, Cim = _dedup_scatter(
            dd, t0s_full, mm,
            Cre if return_amplitudes else None,
            Cim if return_amplitudes else None, omegas)
    mm = np.asarray(mm)
    if scalar_remnant:
        if not return_amplitudes:
            return mm
        C = np.asarray(Cre) + 1j * np.asarray(Cim)
        return mm, [C[si, :, :len(ms)] for si, ms in enumerate(sets)]
    B = mm.shape[-1]
    mm = np.moveaxis(mm.reshape(R, S, B), 0, 1)          # (S, R, B)
    if not return_amplitudes:
        return mm
    C = (np.asarray(Cre) + 1j * np.asarray(Cim)).reshape(R, S, B, -1)
    return mm, [C[:, si, :, :len(ms)] for si, ms in enumerate(sets)]


def batch_mismatch_t0_sharded(times, data, modes, Mf, chif, t0_array,
                              T_array=100, spherical_modes=None, delta=0.0,
                              return_amplitudes=False, chunk=64, mesh=None,
                              dedup=True):
    """Multi-chip start-time sweep: the factored kernel sharded over a
    device mesh (pure data parallelism over windows, ICI all-gather of
    results).  t0_method='geq'; t0_array sorted ascending.

    mesh defaults to a 1D ('sweep',) mesh over all available devices of
    the default backend.  dedup as in batch_mismatch_t0_fast (the
    sharded kernel then sweeps only the distinct windows).
    """
    from .parallel.mesh import sharded_t0_sweep_factored, sweep_mesh

    times, rows, omega, mu, t0s, Ts, chunk = _prep_fast(
        times, data, modes, Mf, chif, t0_array, T_array, spherical_modes,
        delta, chunk)
    dd = _window_dedup(times, t0s, Ts) if dedup else None
    if dd is not None:
        t0s_full = t0s
        t0s, Ts = t0s[dd[0]], Ts[dd[0]]
        chunk = _safe_chunk(t0s, float(np.max(np.abs(omega.imag))), chunk)
    if mesh is None:
        mesh = sweep_mesh(n_time=1)
    Cre, Cim, mm = sharded_t0_sweep_factored(
        times, rows.real.copy(), rows.imag.copy(),
        omega.real.copy(), omega.imag.copy(),
        mu.real.copy(), mu.imag.copy(), t0s, Ts, mesh=mesh, chunk=chunk,
        analytic=_uniform_spacing(times))
    if dd is not None:
        mm, Cre, Cim = _dedup_scatter(
            dd, t0s_full, mm,
            Cre if return_amplitudes else None,
            Cim if return_amplitudes else None, omega)
    mm = np.asarray(mm)
    if return_amplitudes:
        return mm, np.asarray(Cre) + 1j * np.asarray(Cim)
    return mm


@lru_cache(maxsize=32)
def _modesets_spectrum_dynamic_fn(sets_key, sph):
    """One jitted CPU program evaluating the padded TIME-TRACK spectra
    (omega(t), mu(t)) of a whole mode-set list -- the dynamic analogue
    of _modesets_spectrum_fn (same rationale: re-building evaluators
    and eagerly dispatching per-set spline gathers per call dominated
    repeat sweeps)."""
    evs = [SpectrumEvaluator(list(ms), list(sph) if sph else None)
           for ms in sets_key]
    J = max(len(ms) for ms in sets_key)
    masks = np.zeros((len(sets_key), J), bool)
    for si, ms in enumerate(sets_key):
        masks[si, :len(ms)] = True

    def eval_all(chif_t, Mf_t):
        ws, mus_ = [], []
        for ev, ms in zip(evs, sets_key):
            w = ev.omega(chif_t, Mf_t).T                  # (K, J_s)
            ws.append(jnp.pad(w, ((0, 0), (0, J - w.shape[1]))))
            if sph is None:
                mu = jnp.ones((1,) + w.shape, w.dtype)
            else:
                mu = jnp.moveaxis(ev.mu(chif_t), -1, 1)   # (I, K, J_s)
            mus_.append(jnp.pad(
                mu, ((0, 0), (0, 0), (0, J - w.shape[1]))))
        return jnp.stack(ws), jnp.stack(mus_)

    return jax.jit(eval_all), masks


@lru_cache(maxsize=16)
def _t0_sweep_modesets_dynamic_fn(t0_method, precision):
    """Jitted (set x window) sweep with time-dependent spectra: lax.map
    over padded sets around the dynamic fit core."""
    from .engine import dynamic_fit_core

    cdtype = jnp.complex128 if precision == "x64" else jnp.complex64
    window = window_geq if t0_method == "geq" else window_closest

    def run(times, rows, omegas_t, mus_t, t0s, Ts, masks):
        def per_set(args):
            omega_t, mu_t, mask = args      # (K, J), (I, K, J), (J,)

            def one(targs):
                t0, T = targs
                w = window(times, t0, T)
                return dynamic_fit_core(times, rows, omega_t, mu_t, t0,
                                        w, cdtype, col_mask=mask)

            return jax.lax.map(one, (t0s, Ts), batch_size=16)

        return jax.lax.map(per_set, (omegas_t, mus_t, masks),
                           batch_size=1)

    return jax.jit(run)


def batch_mismatch_t0_modesets_dynamic(times, data, mode_sets, Mf, chif,
                                       t0_array, t0_method="geq",
                                       T_array=100, spherical_modes=None,
                                       return_amplitudes=False,
                                       precision="x64", mesh=None):
    """Mode-set t0 sweep with a TIME-DEPENDENT spectrum (Mf(t), chif(t)
    tracks of length K): every (mode set, start time) dynamic fit in one
    jitted program (previously only per-set batch_mismatch_t0_dynamic
    loops covered this; reference loop qnmfits.py:1286-1299 x sets).

    Mf/chif: scalars or (K,) arrays (time tracks -- NOT a remnant axis;
    that is batch_mismatch_t0_modesets).  Returns mm (S, B); with
    return_amplitudes=True also a list of S (B, len(set)) arrays.
    Pass ``mesh`` (or 'auto') to shard the start-time axis over a
    device mesh: the spectrum tracks are t0-independent and replicate,
    so the sweep is pure window-DP on the split-complex dynamic kernel
    (same layout as the static mode-set sweep).
    """
    if t0_method not in ("geq", "closest"):
        raise ValueError("t0_method must be 'geq' or 'closest'")
    if mesh is not None and precision != "x64":
        raise ValueError("mesh sweeps run the split-complex f64 sharded "
                         "kernel; precision applies to the single-device "
                         "path only (drop precision or mesh)")
    from .engine import check_spin
    check_spin(chif)
    times, rows, sph = _prep(times, data, spherical_modes)
    K = len(times)
    Mf_t = np.full(K, Mf) if np.ndim(Mf) == 0 else np.asarray(Mf, float)
    chif_t = np.full(K, chif) if np.ndim(chif) == 0 \
        else np.asarray(chif, float)
    if Mf_t.shape != (K,) or chif_t.shape != (K,):
        raise ValueError("dynamic Mf/chif must be scalars or (K,) tracks")
    t0s = np.asarray(t0_array, float)
    Ts = np.ascontiguousarray(
        np.broadcast_to(np.asarray(T_array, float), t0s.shape))

    sets = [list(_canon(ms)) for ms in mode_sets]
    sets_key = tuple(tuple(ms) for ms in sets)
    sfn, masks = _modesets_spectrum_dynamic_fn(sets_key, sph)
    with _on_host():
        omegas_j, mus_j = sfn(chif_t, Mf_t)
        omegas_t = np.asarray(omegas_j)
        mus_t = np.asarray(mus_j)

    if mesh is not None:
        from .parallel.mesh import (
            sharded_t0_sweep_modesets_dynamic, sweep_mesh)
        if mesh == "auto":
            mesh = sweep_mesh(n_time=1)
        Cre, Cim, mm = sharded_t0_sweep_modesets_dynamic(
            times, rows.real.copy(), rows.imag.copy(),
            omegas_t.real.copy(), omegas_t.imag.copy(),
            mus_t.real.copy(), mus_t.imag.copy(), t0s, Ts, masks,
            mesh=mesh, t0_method=t0_method)
        mm = np.asarray(mm)
        if not return_amplitudes:
            return mm
        C = np.asarray(Cre) + 1j * np.asarray(Cim)
        return mm, [C[si, :, :len(ms)] for si, ms in enumerate(sets)]

    fn = _t0_sweep_modesets_dynamic_fn(t0_method, precision)
    dev = _device_for(precision)
    C, mm = fn(*[jax.device_put(np.asarray(a), dev) for a in
                 (times, rows, omegas_t, mus_t, t0s, Ts, masks)])
    mm = np.asarray(mm)
    if not return_amplitudes:
        return mm
    C = np.asarray(C)
    return mm, [C[si, :, :len(ms)] for si, ms in enumerate(sets)]


@lru_cache(maxsize=64)
def _event_batch_fn(modes, t0_method, precision, chunk):
    """Jitted per-EVENT fit batch: every event has its own data row,
    remnant (Mf, chif), and window (t0, T); the event axis is chunked
    lax.map over the fit core with per-event spectrum evaluation (the
    catalog-serving shape -- nothing in the reference batches across
    events at all)."""
    ev = SpectrumEvaluator(list(modes))
    cdtype = jnp.complex128 if precision == "x64" else jnp.complex64
    window = window_geq if t0_method == "geq" else window_closest

    def run(times, rows, Mfs, chifs, t0s, Ts):
        def one(args):
            d, Mf, chif, t0, T = args
            omega = ev.omega(chif, Mf)
            mu = jnp.ones((1, omega.shape[0]))
            w = window(times, t0, T)
            return fit_core(times, d[None, :], omega, mu, t0, w, cdtype)

        return jax.lax.map(one, (rows, Mfs, chifs, t0s, Ts),
                           batch_size=chunk)

    return jax.jit(run)


@lru_cache(maxsize=16)
def _event_batch_fast_fn(chunk, analytic=False):
    from .engine_real import sweep_events_real

    return jax.jit(lambda *a: sweep_events_real(
        *a, chunk=chunk, analytic=analytic))


def batch_fit_events(times, data, modes, Mf, chif, t0, T=100,
                     t0_method="geq", precision="x64", mesh=None,
                     engine="batched", chunk=64):
    """Fit the SAME mode model to MANY events in one program.

    The catalog-population workload: E ringdown series on a shared time
    grid (resample host-side if needed), each with its own remnant
    (Mf_e, chif_e) and analysis start t0_e.  The reference fits events
    one Python call at a time (qnmfits.py:142-315 per event); here the
    event axis is one chunked device program with per-event spectrum
    spline evaluation.

    times (K,); data (E, K) complex; Mf/chif/t0/T scalars or (E,)
    arrays.  Returns (mm (E,), C (E, J) complex).  Pass ``mesh`` (or
    mesh='auto') to shard the event axis over a device mesh.
    engine='fast' runs the split-complex TPU kernel (t0_method='geq';
    per-event spectra spline-evaluated host-side, one device program)
    -- measured SLOWER than the default x64 CPU batch at single-chip
    catalog shapes (per-event Gram assembly is the grid engines'
    bottleneck class, PERF.md section 14); use it when the host CPU is
    the contended resource or with a device mesh.
    """
    if t0_method not in ("geq", "closest"):
        raise ValueError("t0_method must be 'geq' or 'closest'")
    if mesh is not None and precision != "x64":
        raise ValueError("mesh sweeps run the split-complex f64 sharded "
                         "kernel; precision applies to the single-device "
                         "path only (drop precision or mesh)")
    times = np.asarray(times, float)
    rows = np.asarray(data, complex)
    if rows.ndim != 2:
        raise ValueError("data must be (E, K): one series per event")
    E = rows.shape[0]

    def _e(x):
        arr = np.broadcast_to(np.asarray(x, float), (E,))
        return np.ascontiguousarray(arr)

    from .engine import check_spin
    chifs = _e(chif)
    for c in chifs:
        check_spin(float(c))

    if mesh is not None or engine == "fast":
        # Both the mesh and 'fast' paths run the split-complex kernel
        # with HOST-evaluated per-event spectra (TPU-mesh safe: no
        # complex dtype or spline work on the device).
        if t0_method != "geq":
            raise ValueError("engine='fast'/mesh event batches support "
                             "t0_method='geq' only")
        ev = SpectrumEvaluator(list(_canon(modes)))
        with _on_host():
            omegas = np.asarray(ev.omega(chifs, _e(Mf)).T)   # (E, J)
        # Per-item Gram trade (PERF.md section 19): closed-form Grams
        # on TPU-class backends, summation matmuls on CPU.
        args = (times, rows.real.copy(), rows.imag.copy(),
                omegas.real.copy(), omegas.imag.copy(), _e(t0), _e(T))
        if mesh is not None:
            from .parallel.mesh import sharded_event_batch, sweep_mesh
            if mesh == "auto":
                mesh = sweep_mesh(n_time=1)
            analytic = _uniform_spacing(times) and _accel_backend(mesh)
            Cre, Cim, mm = sharded_event_batch(*args, mesh=mesh,
                                               chunk=chunk,
                                               analytic=analytic)
        else:
            analytic = _uniform_spacing(times) and _accel_backend()
            Cre, Cim, mm = _event_batch_fast_fn(chunk, analytic)(*args)
        return np.asarray(mm), np.asarray(Cre) + 1j * np.asarray(Cim)
    fn = _event_batch_fn(_canon(modes), t0_method, precision, int(chunk))
    C, mm = fn(*_put((times, rows, _e(Mf), chifs, _e(t0), _e(T)),
                     precision))
    return np.asarray(mm), np.asarray(C)
