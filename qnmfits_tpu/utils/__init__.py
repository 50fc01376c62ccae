from .diagnostics import debug_nans, sweep_progress, timed  # noqa: F401
