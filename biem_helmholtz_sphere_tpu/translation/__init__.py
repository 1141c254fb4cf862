"""Addition-theorem translation operators (reference layer 3 hot path)."""

from ._gumerov import gd_coaxial, sr_gumerov
from ._ops import translation_matrix
from ._rotation import coaxial_sr, rotation_matrix, sr_rotation

__all__ = [
    "translation_matrix",
    "gd_coaxial",
    "sr_gumerov",
    "coaxial_sr",
    "rotation_matrix",
    "sr_rotation",
]
