from .base import BaseWaveform  # noqa: F401
from .custom import Custom  # noqa: F401
from .sxs import SXS  # noqa: F401
from .surrogate import NRHybSur3dq8, NRSur7dq4  # noqa: F401
