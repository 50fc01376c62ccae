"""Alias of the reference's Waveforms/Surrogate.py."""

from qnmfits_tpu.waveforms.surrogate import (  # noqa: F401
    NRHybSur3dq8, NRSur7dq4)
