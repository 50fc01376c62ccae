"""Alias of the reference's qnmfits/qnm.py module surface.

`import qnmfits.qnm as qnm; q = qnm.qnm()` works exactly as with the
reference (/root/reference/qnmfits/qnm.py:11-36): `qnm` is the class,
`download_cook_data` the (local, no-network) data check.
"""

from qnmfits_tpu.qnm_api import download_cook_data, qnm  # noqa: F401
