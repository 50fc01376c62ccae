from .diagnostics import debug_nans, sweep_progress, timed  # noqa: F401
from .checkpoint import resumable_sweep  # noqa: F401
