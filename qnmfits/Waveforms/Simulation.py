"""Alias of the reference's Waveforms/Simulation.py (the SXS loader)."""

from qnmfits_tpu.waveforms.sxs import SXS  # noqa: F401
