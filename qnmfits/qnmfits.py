"""Alias of the reference's qnmfits/qnmfits.py module surface.

Every fitting/plotting function the reference defines here
(/root/reference/qnmfits/qnmfits.py) resolves to the qnmfits_tpu
implementation, including the module-level `qnm` spectrum instance
(reference qnmfits.py:12-13) -- forwarded lazily via PEP 562 so the
table artifact loads on first use, not at import.
"""

from qnmfits_tpu import *  # noqa: F401,F403


def __getattr__(name):
    import qnmfits_tpu
    return getattr(qnmfits_tpu, name)
