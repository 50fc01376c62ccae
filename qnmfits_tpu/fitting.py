"""Public fitting API: reference-compatible signatures on the JAX engine.

Mirrors the reference engine's functions and result dictionaries
(/root/reference/qnmfits/qnmfits.py) -- ringdown, mismatch,
ringdown_fit, dynamic/multimode variants, sweeps, optimisers, rational
filter -- with the compute expressed in JAX.

Eager single fits default to precision='x64' (CPU backend; TPU has no
complex128) and use an SVD least-squares solve so the result dict carries
'residual'/'rank'/'s' exactly like np.linalg.lstsq.  Sweep functions
accept engine='batched' to run the vmapped TPU path (qnmfits_tpu.batched)
and engine='loop' for the reference-style serial loop.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp

from . import ref_impl
from .engine import SpectrumEvaluator, _device_for, _window
from .ops.cmath import damped_phase
from .ref_impl import (  # noqa: F401  (re-exported reference primitives)
    get_qnm,
    mask_times,
    mismatch,
    multimode_mismatch,
    ringdown,
)

__all__ = [
    "ringdown", "mismatch", "multimode_mismatch",
    "ringdown_fit", "dynamic_ringdown_fit",
    "multimode_ringdown_fit", "dynamic_multimode_ringdown_fit",
    "mismatch_t0_array", "mismatch_t0_mode_sets",
    "mismatch_M_chi_grid", "mismatch_omega_grid",
    "calculate_epsilon", "free_frequency_fit", "rational_filter",
]


def _canon_modes(modes):
    return tuple(tuple(int(x) for x in m) for m in modes)


def _delta_factor(delta, n_modes):
    return ref_impl._delta_factor(delta, n_modes)


# ---------------------------------------------------------------------------
# Jitted eager fit kernels (SVD path, full result set)
# ---------------------------------------------------------------------------

@lru_cache(maxsize=256)
def _svd_fit_fn(modes, spherical_modes, t0_method, precision, dynamic):
    """Build + jit an SVD-lstsq fit for a static configuration.

    Returns the materialised design matrix solve with residual/rank/
    singular values, matching np.linalg.lstsq output (reference
    qnmfits.py:287).
    """
    ev = SpectrumEvaluator(list(modes),
                           list(spherical_modes) if spherical_modes else None)
    cdtype = jnp.complex128 if precision == "x64" else jnp.complex64

    def run(times, data, Mf, chif, t0, T, delta_factor):
        rdtype = jnp.zeros((), cdtype).real.dtype
        times = times.astype(rdtype)
        data = data.astype(cdtype)          # (I, K)
        w = _window(times, t0, T, t0_method)

        if dynamic:
            omega = ev.omega(chif, Mf).T           # (K, J)
            if spherical_modes is None:
                mu = jnp.ones((1,) + omega.shape, cdtype)
            else:
                mu = jnp.moveaxis(ev.mu(chif), -1, 1)  # (I, K, J)
            phi = damped_phase(omega, (times[:, None] - t0)
                               * w[:, None])
            blocks = (mu * phi[None]).astype(cdtype)   # (I, K, J)
        else:
            omega = ev.omega(chif, Mf, delta_factor)   # (J,)
            if spherical_modes is None:
                mu = jnp.ones((1, omega.shape[0]), cdtype)
            else:
                mu = ev.mu(chif).astype(cdtype)        # (I, J)
            phi = damped_phase(omega[None, :],
                               (times[:, None] - t0) * w[:, None])
            blocks = (mu[:, None, :] * phi[None]).astype(cdtype)  # (I,K,J)

        I, K, J = blocks.shape
        a = (blocks * w[None, :, None]).reshape(I * K, J)
        d = (data * w[None, :]).reshape(I * K)
        C, res, rank, sv = jnp.linalg.lstsq(a, d, rcond=None)

        model = (blocks.reshape(I * K, J) @ C).reshape(I, K)
        return C, res, rank, sv, model, omega, mu, w

    return ev, jax.jit(run)


def _masked_to_np(arr, w):
    sel = np.asarray(w).astype(bool)
    return np.asarray(arr)[..., sel]


def _run_fit(times, data_rows, modes, Mf, chif, t0, t0_method, T,
             spherical_modes, delta, precision, dynamic):
    """Shared eager-fit driver; returns the reference-style dict pieces."""
    from .engine import check_spin
    check_spin(chif)
    modes = _canon_modes(modes)
    sph = tuple(tuple(lm) for lm in spherical_modes) \
        if spherical_modes is not None else None
    ev, fn = _svd_fit_fn(modes, sph, t0_method, precision, dynamic)

    delta_factor = np.asarray(_delta_factor(delta, len(modes)))
    dev = _device_for(precision)
    # device_put from NumPy directly: an eager jnp.asarray would place
    # complex128 on the TPU, which does not support it.
    args = [jax.device_put(np.asarray(x), dev) for x in
            (times, data_rows, Mf, chif, t0, T, delta_factor)]
    C, res, rank, sv, model, omega, mu, w = fn(*args)

    tm = _masked_to_np(np.asarray(times, float), w)
    model_np = _masked_to_np(model, w)
    data_np = _masked_to_np(data_rows, w)

    # Residual semantics of np.linalg.lstsq: empty unless over-determined
    # full rank; jnp.linalg.lstsq returns the scalar; keep the array form.
    return dict(C=np.asarray(C), residual=np.asarray(res),
                rank=int(rank), s=np.asarray(sv),
                model=model_np, data=data_np, model_times=tm,
                omega=np.asarray(omega), mu=np.asarray(mu),
                w=np.asarray(w))


# ---------------------------------------------------------------------------
# Public fits (reference qnmfits.py:142-911)
# ---------------------------------------------------------------------------

def ringdown_fit(times, data, modes, Mf, chif, t0, t0_method="geq", T=100,
                 delta=0.0, precision="x64"):
    """Least-squares ringdown fit to a single complex series
    (reference qnmfits.py:142-315)."""
    r = _run_fit(times, np.asarray(data)[None, :], modes, Mf, chif, t0,
                 t0_method, T, None, delta, precision, dynamic=False)
    tm, model, dm = r["model_times"], r["model"][0], r["data"][0]
    return {
        "residual": r["residual"], "rank": r["rank"], "s": r["s"],
        "mismatch": mismatch(tm, model, dm),
        "C": r["C"], "data": dm, "model": model, "model_times": tm,
        "t0": t0, "modes": modes,
        "mode_labels": [str(tuple(m)) for m in modes],
        "frequencies": r["omega"],
    }


def dynamic_ringdown_fit(times, data, modes, Mf, chif, t0, t0_method="geq",
                         T=100, precision="x64"):
    """Single-series fit with time-dependent (Mf(t), chif(t))
    (reference qnmfits.py:318-475)."""
    times = np.asarray(times)
    Mf_t = np.full(len(times), Mf) if np.ndim(Mf) == 0 else np.asarray(Mf)
    chif_t = np.full(len(times), chif) if np.ndim(chif) == 0 \
        else np.asarray(chif)
    r = _run_fit(times, np.asarray(data)[None, :], modes, Mf_t, chif_t, t0,
                 t0_method, T, None, 0.0, precision, dynamic=True)
    tm, model, dm = r["model_times"], r["model"][0], r["data"][0]
    sel = r["w"].astype(bool)
    return {
        "residual": r["residual"],
        "mismatch": mismatch(tm, model, dm),
        "C": r["C"], "data": dm, "model": model, "model_times": tm,
        "t0": t0, "modes": modes,
        "mode_labels": [str(tuple(m)) for m in modes],
        "frequencies": r["omega"][sel].T,
    }


def multimode_ringdown_fit(times, data_dict, modes, Mf, chif, t0,
                           t0_method="geq", T=100, spherical_modes=None,
                           precision="x64"):
    """Joint fit across spherical-harmonic modes with mixing-weighted
    shared amplitudes (reference qnmfits.py:478-673)."""
    if spherical_modes is None:
        spherical_modes = list(data_dict.keys())
    rows = np.stack([np.asarray(data_dict[lm]) for lm in spherical_modes])
    r = _run_fit(times, rows, modes, Mf, chif, t0, t0_method, T,
                 spherical_modes, 0.0, precision, dynamic=False)
    tm = r["model_times"]
    model_dict = {lm: r["model"][i] for i, lm in enumerate(spherical_modes)}
    data_mask = {lm: r["data"][i] for i, lm in enumerate(spherical_modes)}
    weighted_C = {lm: r["mu"][i] * r["C"]
                  for i, lm in enumerate(spherical_modes)}
    return {
        "residual": r["residual"],
        "mismatch": multimode_mismatch(tm, model_dict, data_mask),
        "C": r["C"], "weighted_C": weighted_C,
        "data": data_mask, "model": model_dict, "model_times": tm,
        "t0": t0, "modes": modes,
        "mode_labels": [str(tuple(m)) for m in modes],
        "frequencies": r["omega"],
    }


def dynamic_multimode_ringdown_fit(times, data_dict, modes, Mf, chif, t0,
                                   t0_method="geq", T=100,
                                   spherical_modes=None, precision="x64"):
    """Multimode fit with time-dependent spectrum
    (reference qnmfits.py:676-911)."""
    if spherical_modes is None:
        spherical_modes = list(data_dict.keys())
    times = np.asarray(times)
    Mf_t = np.full(len(times), Mf) if np.ndim(Mf) == 0 else np.asarray(Mf)
    chif_t = np.full(len(times), chif) if np.ndim(chif) == 0 \
        else np.asarray(chif)
    rows = np.stack([np.asarray(data_dict[lm]) for lm in spherical_modes])
    r = _run_fit(times, rows, modes, Mf_t, chif_t, t0, t0_method, T,
                 spherical_modes, 0.0, precision, dynamic=True)
    tm = r["model_times"]
    sel = r["w"].astype(bool)
    model_dict = {lm: r["model"][i] for i, lm in enumerate(spherical_modes)}
    data_mask = {lm: r["data"][i] for i, lm in enumerate(spherical_modes)}
    mu_masked = r["mu"][:, sel, :]             # (I, Km, J)
    weighted_C = {lm: mu_masked[i] * r["C"][None, :]
                  for i, lm in enumerate(spherical_modes)}
    freqs = r["omega"][sel]                    # (Km, J)
    return {
        "residual": r["residual"],
        "mismatch": multimode_mismatch(tm, model_dict, data_mask),
        "C": r["C"], "weighted_C": weighted_C,
        "data": data_mask, "model": model_dict, "model_times": tm,
        "t0": t0, "modes": modes,
        "mode_labels": [str(tuple(m)) for m in modes],
        "frequencies": np.vstack(len(spherical_modes) * [freqs]),
    }


# ---------------------------------------------------------------------------
# Sweeps (batched TPU engine by default; reference-style loop optional)
# ---------------------------------------------------------------------------

def mismatch_t0_array(times, data, modes, Mf, chif, t0_array,
                      t0_method="geq", T_array=100, spherical_modes=None,
                      delta=0.0, engine="batched", precision="x64",
                      mesh=None, dedup=True):
    """Mismatch vs ringdown start time (reference qnmfits.py:1183-1301).

    engine:
      'batched' -- all start times as one vmapped solve (default);
      'fast'    -- the factored split-complex kernel (t0_method='geq',
                   sorted t0_array; the single-chip benchmark path).
                   With time-dependent Mf/chif this routes to the
                   split-complex dynamic kernel instead (any t0_method);
      'sharded' -- the factored kernel sharded over a device mesh
                   (multi-chip DP over windows; ``mesh`` defaults to all
                   devices of the default backend);
      'loop'    -- reference-style serial NumPy loop.

    dedup=True (default) solves each DISTINCT window once when the t0
    grid is finer than the data sampling -- exact for static spectra
    (batched._window_dedup, PERF.md section 25); 'loop' and the dynamic
    sweeps always run per-t0.
    """
    if engine == "loop":
        return ref_impl.mismatch_t0_array(
            times, data, modes, Mf, chif, t0_array, t0_method, T_array,
            spherical_modes, delta)
    if np.ndim(Mf) != 0 or np.ndim(chif) != 0:
        if engine == "sharded":
            raise ValueError(
                "engine='sharded' needs a static spectrum; use "
                "engine='batched' or 'fast' for time-dependent Mf/chif")
        if np.any(np.asarray(delta)):
            # Same rule as batched.batch_mismatch_t0: the reference's
            # dynamic fits take no delta (qnmfits.py:318-475).
            raise ValueError("delta is not supported for dynamic-spectrum "
                             "fits (time-dependent Mf/chif)")
        from .batched import batch_mismatch_t0_dynamic
        return batch_mismatch_t0_dynamic(
            times, data, modes, Mf, chif, t0_array, t0_method=t0_method,
            T_array=T_array, spherical_modes=spherical_modes,
            precision=precision,
            engine="fast" if engine == "fast" else "batched")
    if engine in ("fast", "sharded"):
        if t0_method != "geq":
            raise ValueError(
                f"engine='{engine}' supports t0_method='geq' only")
        from .batched import batch_mismatch_t0_fast, batch_mismatch_t0_sharded
        if engine == "fast":
            return batch_mismatch_t0_fast(
                times, data, modes, Mf, chif, t0_array, T_array=T_array,
                spherical_modes=spherical_modes, delta=delta, dedup=dedup)
        return batch_mismatch_t0_sharded(
            times, data, modes, Mf, chif, t0_array, T_array=T_array,
            spherical_modes=spherical_modes, delta=delta, mesh=mesh,
            dedup=dedup)
    from .batched import batch_mismatch_t0
    return batch_mismatch_t0(
        times, data, modes, Mf, chif, t0_array, t0_method=t0_method,
        T_array=T_array, spherical_modes=spherical_modes, delta=delta,
        precision=precision, dedup=dedup)


def mismatch_t0_mode_sets(times, data, mode_sets, Mf, chif, t0_array,
                          T_array=100, *, t0_method="geq",
                          spherical_modes=None, return_amplitudes=False,
                          mesh=None, dynamic=False, bucket=False,
                          dedup=True):
    """Mismatch vs start time for MANY mode sets in one TPU program.

    The workload the reference runs as a doubly nested Python loop
    (a mode-set loop around qnmfits.py:1183-1301, e.g.
    /root/reference/examples/even_more_overtones.ipynb cell 3); here it
    is a single jitted sweep on the factored split-complex kernel with
    the mode-set axis vmapped -- the benchmark surface (~245k fits/s
    per v5e chip, see PERF.md).

    mode_sets: list of mode lists (ragged lengths fine -- padded with
    exact-zero amplitude slots).  t0_method='geq' (default; t0_array
    sorted ascending, factored TPU kernel) or 'closest' (complex x64
    window sweep).  chif and/or Mf may be 1-D arrays (a remnant axis
    R): the per-spin spectra fold into the vmapped set axis and the
    whole (set x remnant x t0) study is one program.  With
    dynamic=True, Mf/chif are instead (K,) TIME tracks and every
    (set, t0) pair is a dynamic-spectrum fit in one program.  Returns
    mm (S, B), or (S, R, B) with a remnant axis; with
    return_amplitudes=True also a list of per-set complex
    (B, len(mode_set)) (or (R, B, len)) amplitude arrays.  Pass
    mesh='auto' (or an explicit Mesh) to shard the start-time axis over
    devices (static spectrum needs t0_method='geq'; dynamic=True shards
    with either window method -- the tracks replicate and the sweep is
    pure window-DP).  dedup=True (default) solves each distinct window
    once on t0 grids finer than the sampling -- exact for static
    spectra (PERF.md section 25); dynamic fits never dedup.
    """
    if dynamic:
        if bucket:
            raise ValueError("bucket=True is not supported for the "
                             "dynamic mode-set sweep")
        from .batched import batch_mismatch_t0_modesets_dynamic
        return batch_mismatch_t0_modesets_dynamic(
            times, data, mode_sets, Mf, chif, t0_array,
            t0_method=t0_method, T_array=T_array,
            spherical_modes=spherical_modes,
            return_amplitudes=return_amplitudes, mesh=mesh)
    from .batched import batch_mismatch_t0_modesets
    return batch_mismatch_t0_modesets(
        times, data, mode_sets, Mf, chif, t0_array, t0_method=t0_method,
        T_array=T_array, spherical_modes=spherical_modes,
        return_amplitudes=return_amplitudes, mesh=mesh, bucket=bucket,
        dedup=dedup)


def mismatch_M_chi_grid(times, data, modes, Mf_minmax, chif_minmax, t0,
                        t0_method="geq", T=100, res=50,
                        spherical_modes=None, delta=0.0, engine="batched",
                        precision="x64", mesh=None):
    """Mismatch over an (Mf, chif) grid (reference qnmfits.py:1304-1415).

    engine: 'batched' (one jitted x64 sweep, default), 'fast' (the
    split-complex TPU kernel -- host-side spectrum evaluation, one
    spectrum-batched device sweep), 'sharded' (the fast kernel with the
    grid axis data-parallel over a device mesh; ``mesh`` defaults to
    all devices), or 'loop' (reference-style NumPy).
    """
    if engine == "loop":
        return ref_impl.mismatch_M_chi_grid(
            times, data, modes, Mf_minmax, chif_minmax, t0, t0_method, T,
            res, spherical_modes, delta)
    if engine in ("fast", "sharded"):
        from .batched import batch_mismatch_M_chi_fast
        if engine == "sharded" and mesh is None:
            mesh = "auto"
        return batch_mismatch_M_chi_fast(
            times, data, modes, Mf_minmax, chif_minmax, t0,
            t0_method=t0_method, T=T, res=res,
            spherical_modes=spherical_modes, delta=delta, mesh=mesh)
    from .batched import batch_mismatch_M_chi
    return batch_mismatch_M_chi(
        times, data, modes, Mf_minmax, chif_minmax, t0, t0_method=t0_method,
        T=T, res=res, spherical_modes=spherical_modes, delta=delta,
        precision=precision)


def mismatch_omega_grid(times, data, modes, Mf, chif, re_minmax, im_minmax,
                        t0, t0_method="geq", T=100, res=50,
                        engine="batched", precision="x64", mesh=None):
    """Mismatch over a complex-frequency grid for one free mode
    (reference qnmfits.py:1679-1827).

    engine: 'batched' (default), 'fast' (the bordered fixed-block TPU
    kernel: the shared fixed-QNM Gram block is factorised once and each
    grid point is a cheap bordered solve), 'sharded' (the bordered
    kernel, Re-axis data-parallel over a device mesh), 'fast-full'
    (the per-point spectrum-batched split-complex kernel -- the
    pre-bordered path, kept for workloads that want one code path with
    the (Mf, chif) grid), or 'loop' (reference-style NumPy).
    """
    if engine == "loop":
        return ref_impl.mismatch_omega_grid(
            times, data, modes, Mf, chif, re_minmax, im_minmax, t0,
            t0_method, T, res)
    if engine in ("fast", "sharded"):
        from .batched import batch_mismatch_omega_bordered
        if engine == "sharded" and mesh is None:
            mesh = "auto"
        return batch_mismatch_omega_bordered(
            times, data, modes, Mf, chif, re_minmax, im_minmax, t0,
            t0_method=t0_method, T=T, res=res, mesh=mesh)
    if engine == "fast-full":
        from .batched import batch_mismatch_omega_fast
        return batch_mismatch_omega_fast(
            times, data, modes, Mf, chif, re_minmax, im_minmax, t0,
            t0_method=t0_method, T=T, res=res, mesh=mesh)
    from .batched import batch_mismatch_omega
    return batch_mismatch_omega(
        times, data, modes, Mf, chif, re_minmax, im_minmax, t0,
        t0_method=t0_method, T=T, res=res, precision=precision)


def calculate_epsilon(times, data, modes, Mf, chif, t0, t0_method="geq",
                      T=100, spherical_modes=None, min_method="gradient",
                      delta=0.0, x0=None):
    """Best-fit remnant (Mf, chif) and epsilon distance
    (reference qnmfits.py:1418-1594).

    min_method='gradient' (default) runs L-BFGS-B on the differentiable
    mismatch (qnmfits_tpu.optimize); any scipy method name (e.g.
    'Nelder-Mead') runs the reference-style derivative-free path.
    """
    if min_method == "gradient":
        from .optimize import calculate_epsilon_gradient
        return calculate_epsilon_gradient(
            times, data, modes, Mf, chif, t0, t0_method, T,
            spherical_modes, delta, x0)
    return ref_impl.calculate_epsilon(
        times, data, modes, Mf, chif, t0, t0_method, T, spherical_modes,
        min_method, delta, x0)


def rational_filter(times, data, modes, Mf, chif, t_start=-300, t_end=None,
                    dt=None, t_taper=100, align_inspiral=True,
                    engine="jax"):
    """Frequency-domain removal of QNM content, Ma et al. arXiv:2207.10870
    (reference qnmfits.py:2046-2152).

    engine='jax' (default) runs the taper+FFT+filter+IFFT pipeline as one
    jitted program; engine='numpy' is the NumPy parity path.  Both agree
    to <= 1e-12 (tests/test_filters.py).
    """
    if engine == "numpy":
        return ref_impl.rational_filter(
            times, data, modes, Mf, chif, t_start, t_end, dt, t_taper,
            align_inspiral)
    from .filters import rational_filter_jax
    return rational_filter_jax(
        times, data, modes, Mf, chif, t_start, t_end, dt, t_taper,
        align_inspiral)


def free_frequency_fit(times, data, t0, modes=[], Mf=None, chif=None,
                       t0_method="geq", T=100, min_method="gradient"):
    """Free complex-frequency fit on top of fixed QNMs
    (reference qnmfits.py:1905-2043).

    min_method='gradient' (default) runs L-BFGS-B on the differentiable
    mismatch; any scipy method name runs the reference-style path.
    """
    if min_method == "gradient":
        from .optimize import free_frequency_fit_gradient
        return free_frequency_fit_gradient(
            times, data, t0, modes, Mf, chif, t0_method, T)
    return ref_impl.free_frequency_fit(
        times, data, t0, modes, Mf, chif, t0_method, T, min_method)
