"""Addition-theorem translation operators (reference layer 3 hot path)."""

from ._ops import translation_matrix

__all__ = ["translation_matrix"]
