"""Alias of the reference's spatial_mapping_functions.py surface
(/root/reference/qnmfits/spatial_mapping_functions.py) onto
qnmfits_tpu.spatial."""

from qnmfits_tpu.spatial import *  # noqa: F401,F403
from qnmfits_tpu.spatial import __all__  # noqa: F401
