"""Alias of the reference's Waveforms/Base.py: `BaseClass`
(/root/reference/qnmfits/Waveforms/Base.py:6) is qnmfits_tpu's
BaseWaveform."""

from qnmfits_tpu.waveforms.base import BaseWaveform  # noqa: F401

BaseClass = BaseWaveform
