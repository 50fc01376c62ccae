"""qnmfits_tpu: TPU-native quasinormal-mode ringdown fitting.

A from-scratch JAX/XLA re-design of the capabilities of eliotfinch/qnmfits
(reference mounted at /root/reference):

* L1 spectrum layer: a built-in Leaver/spectral Kerr QNM solver bakes
  frequencies and spherical-spheroidal mixing coefficients into
  differentiable spin-interpolation tables (qnmfits_tpu.spectrum) --
  no external `qnm` package, no downloads.
* L3 fitting engine: design-matrix least squares as jitted Gram/Cholesky
  and SVD solves; sweeps over start times, (Mf, chif) grids and
  complex-frequency grids are single vmapped TPU programs
  (qnmfits_tpu.engine / qnmfits_tpu.batched).
* NumPy parity path (qnmfits_tpu.ref_impl) reproducing the reference's
  exact numerics for validation.

Public API mirrors the reference package: `qnm` (spectrum instance),
fitting/sweep functions, waveform classes.
"""

import os as _os

# Keep the CPU backend reachable even when JAX_PLATFORMS pins an
# accelerator plugin: the x64 parity path always runs on CPU (TPUs have
# no complex128), and with an explicit platform list jax registers ONLY
# the listed backends -- jax.devices("cpu") would fail even when the
# accelerator works.  The first-listed platform stays the default, so
# appending ",cpu" never changes where compute runs.  (A plugin that
# fails to initialise is additionally dropped from the list at device
# lookup -- see engine._drop_failed_platform.)  Effective only if no JAX
# backend has been initialised yet (jax reads the list lazily).
_platforms = _os.environ.get("JAX_PLATFORMS", "")
if _platforms and "cpu" not in _platforms.split(","):
    _os.environ["JAX_PLATFORMS"] = _platforms + ",cpu"

import jax as _jax

if _platforms and "cpu" not in _platforms.split(","):
    try:
        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:  # pragma: no cover - backends already initialised
        pass

# Reference numerics are float64 end-to-end; x64 mode is required for the
# parity path (runs on CPU -- TPUs have no complex128).  The TPU fast
# path requests complex64 explicitly.
_jax.config.update("jax_enable_x64", True)

# TPU matmuls default to bf16 passes; ringdown Gram matrices need full
# f32 accumulation (mismatches are 1 - overlap ~ 1e-7).
_jax.config.update("jax_default_matmul_precision", "highest")

# Persistent XLA compilation cache: axon TPU first-compiles are very slow
# (minutes); caching makes repeat runs (tests, benchmarks) fast.
_cache_dir = _os.environ.get(
    "QNMFITS_TPU_COMP_CACHE",
    _os.path.expanduser("~/.cache/qnmfits_tpu/xla"))
try:
    _os.makedirs(_cache_dir, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # pragma: no cover - cache is best-effort
    pass

from .fitting import (  # noqa: E402
    calculate_epsilon,
    dynamic_multimode_ringdown_fit,
    dynamic_ringdown_fit,
    free_frequency_fit,
    mismatch,
    mismatch_M_chi_grid,
    mismatch_omega_grid,
    mismatch_t0_array,
    mismatch_t0_mode_sets,
    multimode_mismatch,
    multimode_ringdown_fit,
    rational_filter,
    ringdown,
    ringdown_fit,
)
from .batched import batch_fit_events as fit_events  # noqa: E402
from .optimize import (  # noqa: E402
    calculate_epsilon_array,
    free_frequency_fit_array,
)
from .plotting import (  # noqa: E402
    plot_amplitude_stability,
    plot_mismatch_M_chi_grid,
    plot_mismatch_omega_grid,
    plot_mode_amplitudes,
    plot_ringdown,
    plot_ringdown_modes,
)
from .stability import amplitude_stability  # noqa: E402
from .orthonormal import (  # noqa: E402
    orthonormal_decomposition,
    orthonormal_t0_sweep,
)
from .uncertainty import amplitude_uncertainty, mode_selection  # noqa: E402
from .qnm_api import download_cook_data  # noqa: E402

__version__ = "0.3.0"

_lazy_singletons = {}


def __getattr__(name):
    # `qnm` mirrors the reference's module-level spectrum instance
    # (/root/reference/qnmfits/__init__.py:5-6) but is created lazily so
    # importing the package does not require the table artifact.
    if name == "qnm":
        if "qnm" not in _lazy_singletons:
            from .qnm_api import qnm as _qnm_class
            _lazy_singletons["qnm"] = _qnm_class()
        return _lazy_singletons["qnm"]
    if name in ("Custom", "SXS", "NRSur7dq4", "NRHybSur3dq8"):
        from . import waveforms
        return getattr(waveforms, name)
    raise AttributeError(f"module 'qnmfits_tpu' has no attribute {name!r}")
