"""Alias of the reference's Waveforms/Custom.py."""

from qnmfits_tpu.waveforms.custom import Custom  # noqa: F401
