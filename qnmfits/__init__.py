"""Drop-in compatibility alias for the reference package name.

Scripts written against eliotfinch/qnmfits (`import qnmfits`,
`import qnmfits.qnm as qnm`, `from qnmfits.spatial_mapping_functions
import ...`, `from qnmfits.Waveforms.Custom import Custom`) run
unchanged on top of qnmfits_tpu: every object here IS the qnmfits_tpu
implementation, re-exported under the reference's module layout
(/root/reference/qnmfits/__init__.py:1-7).

Like the reference, the package-level `qnm` attribute is the shared
spectrum INSTANCE (the reference binds it via `from .qnmfits import *`
after qnmfits.py's module-level `qnm = qnm()`, qnmfits.py:12-13); it is
resolved lazily here so importing the shim does not load the table
artifact.  The `qnm` SUBMODULE (class + download_cook_data) remains
importable as `qnmfits.qnm`, with the same order-dependent shadowing
semantics as the reference.
"""

from qnmfits_tpu.waveforms import (  # noqa: F401
    Custom, NRHybSur3dq8, NRSur7dq4, SXS)
from qnmfits_tpu.qnm_api import download_cook_data  # noqa: F401
from .qnmfits import *  # noqa: F401,F403

# With __all__ defined, `from qnmfits import *` resolves `qnm` through
# __getattr__ (PEP 562), matching the reference where the instance is a
# plain module global -- while a bare `import qnmfits` stays lazy.
__all__ = [
    "Custom", "SXS", "NRSur7dq4", "NRHybSur3dq8", "qnm",
    "download_cook_data",
    "ringdown", "mismatch", "multimode_mismatch", "ringdown_fit",
    "dynamic_ringdown_fit", "multimode_ringdown_fit",
    "dynamic_multimode_ringdown_fit", "mismatch_t0_array",
    "mismatch_t0_mode_sets", "mismatch_M_chi_grid",
    "mismatch_omega_grid", "calculate_epsilon", "free_frequency_fit",
    "rational_filter", "fit_events", "calculate_epsilon_array",
    "free_frequency_fit_array", "orthonormal_decomposition",
    "orthonormal_t0_sweep", "amplitude_uncertainty", "mode_selection",
    "plot_ringdown", "plot_ringdown_modes", "plot_mode_amplitudes",
    "plot_mismatch_M_chi_grid", "plot_mismatch_omega_grid",
]


def __getattr__(name):
    # `qnm` (the lazy spectrum instance) and anything else the
    # qnmfits_tpu package exposes at top level.
    import qnmfits_tpu
    return getattr(qnmfits_tpu, name)
