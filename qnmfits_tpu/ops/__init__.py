from . import solve, windows  # noqa: F401
