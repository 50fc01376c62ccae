from .mesh import (  # noqa: F401
    sharded_fit_core,
    sharded_t0_sweep,
    sweep_mesh,
)
