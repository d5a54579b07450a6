"""Batched TPU-native interpolation kernels (pure JAX / XLA).

These are the functional hot paths; the `raw` module wraps them with the
reference-compatible flat API, and `interpn_tpu.models` wraps them with the
persistent pydantic classes.
"""

from .bounds import check_bounds_rectilinear, check_bounds_regular
from .cubic import cubic_rectilinear, cubic_regular
from .linear import linear_rectilinear, linear_regular
from .nearest import nearest_rectilinear, nearest_regular

__all__ = [
    "check_bounds_rectilinear",
    "check_bounds_regular",
    "cubic_rectilinear",
    "cubic_regular",
    "linear_rectilinear",
    "linear_regular",
    "nearest_rectilinear",
    "nearest_regular",
]
