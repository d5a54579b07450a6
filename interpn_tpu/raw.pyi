"""Type stubs for the flat evaluation API.

The 16 monomorphized entry points mirror the reference library's raw binding
surface (same names, argument order, and in-place ``out`` contract) so
dependency-constrained callers can switch imports without code changes. All
functions additionally RETURN the result array (device array when the inputs
are device-resident), which the reference's ``None``-returning bindings do
not.
"""

from collections.abc import Sequence
from typing import TypeAlias

import numpy as np
from numpy.typing import NDArray

_F64: TypeAlias = NDArray[np.float64]
_F32: TypeAlias = NDArray[np.float32]
_Bools: TypeAlias = NDArray[np.bool_]
_Dims: TypeAlias = NDArray[np.intp] | Sequence[int]

def interpn_linear_regular_f64(
    dims: _Dims,
    starts: _F64,
    steps: _F64,
    vals: _F64,
    obs: Sequence[_F64],
    out: _F64,
) -> _F64:
    """Multilinear eval on a regular grid, float64, writing into ``out``."""

def interpn_linear_regular_f32(
    dims: _Dims,
    starts: _F32,
    steps: _F32,
    vals: _F32,
    obs: Sequence[_F32],
    out: _F32,
) -> _F32:
    """Multilinear eval on a regular grid, float32, writing into ``out``."""

def interpn_linear_rectilinear_f64(
    grids: Sequence[_F64],
    vals: _F64,
    obs: Sequence[_F64],
    out: _F64,
) -> _F64:
    """Multilinear eval on a monotonic rectilinear grid, float64."""

def interpn_linear_rectilinear_f32(
    grids: Sequence[_F32],
    vals: _F32,
    obs: Sequence[_F32],
    out: _F32,
) -> _F32:
    """Multilinear eval on a monotonic rectilinear grid, float32."""

def interpn_nearest_regular_f64(
    dims: _Dims,
    starts: _F64,
    steps: _F64,
    vals: _F64,
    obs: Sequence[_F64],
    out: _F64,
) -> _F64:
    """Nearest-neighbor eval on a regular grid (1-6 dims), float64."""

def interpn_nearest_regular_f32(
    dims: _Dims,
    starts: _F32,
    steps: _F32,
    vals: _F32,
    obs: Sequence[_F32],
    out: _F32,
) -> _F32:
    """Nearest-neighbor eval on a regular grid (1-6 dims), float32."""

def interpn_nearest_rectilinear_f64(
    grids: Sequence[_F64],
    vals: _F64,
    obs: Sequence[_F64],
    out: _F64,
) -> _F64:
    """Nearest-neighbor eval on a rectilinear grid (1-6 dims), float64."""

def interpn_nearest_rectilinear_f32(
    grids: Sequence[_F32],
    vals: _F32,
    obs: Sequence[_F32],
    out: _F32,
) -> _F32:
    """Nearest-neighbor eval on a rectilinear grid (1-6 dims), float32."""

def interpn_cubic_regular_f64(
    dims: _Dims,
    starts: _F64,
    steps: _F64,
    vals: _F64,
    linearize_extrapolation: bool,
    obs: Sequence[_F64],
    out: _F64,
) -> _F64:
    """Multicubic (Hermite) eval on a regular grid, float64."""

def interpn_cubic_regular_f32(
    dims: _Dims,
    starts: _F32,
    steps: _F32,
    vals: _F32,
    linearize_extrapolation: bool,
    obs: Sequence[_F32],
    out: _F32,
) -> _F32:
    """Multicubic (Hermite) eval on a regular grid, float32."""

def interpn_cubic_rectilinear_f64(
    grids: Sequence[_F64],
    vals: _F64,
    linearize_extrapolation: bool,
    obs: Sequence[_F64],
    out: _F64,
) -> _F64:
    """Multicubic (Hermite) eval on a rectilinear grid, float64."""

def interpn_cubic_rectilinear_f32(
    grids: Sequence[_F32],
    vals: _F32,
    linearize_extrapolation: bool,
    obs: Sequence[_F32],
    out: _F32,
) -> _F32:
    """Multicubic (Hermite) eval on a rectilinear grid, float32."""

def check_bounds_regular_f64(
    dims: _Dims,
    starts: _F64,
    steps: _F64,
    obs: Sequence[_F64],
    atol: float,
    out: _Bools,
) -> _Bools:
    """Per-dimension out-of-bounds flags on a regular grid, float64."""

def check_bounds_regular_f32(
    dims: _Dims,
    starts: _F32,
    steps: _F32,
    obs: Sequence[_F32],
    atol: float,
    out: _Bools,
) -> _Bools:
    """Per-dimension out-of-bounds flags on a regular grid, float32."""

def check_bounds_rectilinear_f64(
    grids: Sequence[_F64],
    obs: Sequence[_F64],
    atol: float,
    out: _Bools,
) -> _Bools:
    """Per-dimension out-of-bounds flags on a rectilinear grid, float64."""

def check_bounds_rectilinear_f32(
    grids: Sequence[_F32],
    obs: Sequence[_F32],
    atol: float,
    out: _Bools,
) -> _Bools:
    """Per-dimension out-of-bounds flags on a rectilinear grid, float32."""
