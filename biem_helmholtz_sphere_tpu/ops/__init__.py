"""Low-level TPU-native ops: real-pair complex arithmetic, kernels."""

from . import cplx
from .cplx import C

__all__ = ["cplx", "C"]
