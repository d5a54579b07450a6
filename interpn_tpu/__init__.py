"""interpn-tpu: TPU-native N-dimensional grid interpolation.

A from-scratch JAX/XLA re-design of the capabilities of jlogan03/interpn
(multilinear / multicubic / nearest interpolation and extrapolation on regular
and rectilinear grids) with the same Python API surface:

* `interpn(...)` one-shot convenience function
  (reference: `src/interpn/__init__.py:48-203`)
* `interpn_tpu.raw` — the 16 flat monomorphized functions
* Six persistent pydantic interpolator classes with byte-identical JSON
  serialization
* `interpn_tpu.ops` — the batched functional kernels (jit/vmap/shard-able)
* `interpn_tpu.ops.one_dim` — the 1D fast-path interpolants
* `interpn_tpu.parallel` — device-mesh sharding over the observation axis
"""

from __future__ import annotations

from typing import Literal, Sequence

import numpy as np
from numpy.typing import NDArray

from importlib.util import find_spec as _find_spec

from . import config as _config  # noqa: F401  (enables x64 before any jax use)
from . import raw

# The persistent model classes need pydantic; like the reference
# (`src/interpn/__init__.py:19-27`), the functional API works without it.
_PYDANTIC_FOUND = _find_spec("pydantic") is not None

if _PYDANTIC_FOUND:
    from .models import (
        MulticubicRectilinear,
        MulticubicRegular,
        MultilinearRectilinear,
        MultilinearRegular,
        NearestRectilinear,
        NearestRegular,
    )

__version__ = "0.1.0"

__all__ = [
    "__version__",
    "raw",
    "interpn",
]

if _PYDANTIC_FOUND:
    __all__ += [
        "MultilinearRegular",
        "MultilinearRectilinear",
        "MulticubicRegular",
        "MulticubicRectilinear",
        "NearestRegular",
        "NearestRectilinear",
    ]


def interpn(
    obs: Sequence[NDArray],
    grids: Sequence[NDArray],
    vals: NDArray,
    *,
    method: Literal["linear", "cubic", "nearest"] = "linear",
    out: NDArray | None = None,
    linearize_extrapolation: bool = True,
    assume_regular: bool = False,
    check_bounds: bool = False,
    bounds_atol: float = 1e-8,
) -> NDArray:
    """Evaluate an N-dimensional grid at the supplied observation points.

    Behavioral parity with the reference one-shot helper
    (`src/interpn/__init__.py:48-203`): grid-regularity autodetection (exact
    spacing equality, `:197-203`), optional bounds checking that raises
    ValueError (`:114-132`), and dispatch on (dtype, regularity, method).

    Args:
        obs: Observation coordinates, one array per dimension.
        grids: Grid axis coordinates, one array per dimension.
        vals: Values defined on the full tensor-product grid (C order).
        method: "linear", "cubic", or "nearest".
        out: Optional preallocated output array.
        linearize_extrapolation: Cubic extrapolation falls back to linear.
        assume_regular: Skip the O(gridsize) regularity check.
        check_bounds: Raise ValueError if any observation is out of bounds.
        bounds_atol: Absolute tolerance for the bounds check.

    Returns:
        Interpolated values, shaped like `out` (or obs[0]).
    """
    user_out = out if out is not None else np.zeros_like(obs[0])
    outshape = user_out.shape
    out = user_out.ravel()
    # ravel() of a non-contiguous array returns a COPY; the reference
    # silently decouples from the caller's buffer in that case. Keep the
    # in-place contract instead: compute into the flat view/copy, then fold
    # results back into the caller's array before returning it.
    out_is_view = out.base is not None or out is user_out

    obs = [np.ascontiguousarray(np.asarray(x).ravel()) for x in obs]
    grids = [np.ascontiguousarray(np.asarray(x).ravel()) for x in grids]
    vals = np.ascontiguousarray(np.asarray(vals).ravel())

    dtype = vals.dtype
    assert dtype in [np.float64, np.float32], (
        "`interpn` defined only for float32 and float64 data"
    )

    is_regular = assume_regular or _check_regular(grids)

    if is_regular:
        dims = np.array([len(grid) for grid in grids], dtype=int)
        starts = np.array([grid[0] for grid in grids], dtype=dtype)
        steps = np.array([grid[1] - grid[0] for grid in grids], dtype=dtype)
    else:
        dims = np.empty((0,), dtype=int)
        starts = np.empty((0,), dtype=dtype)
        steps = starts

    if check_bounds:
        ndims = len(grids)
        outb = np.zeros((ndims,), dtype=bool)
        match (dtype, is_regular):
            case (np.float32, True):
                raw.check_bounds_regular_f32(dims, starts, steps, obs, bounds_atol, outb)
            case (np.float64, True):
                raw.check_bounds_regular_f64(dims, starts, steps, obs, bounds_atol, outb)
            case (np.float32, False):
                raw.check_bounds_rectilinear_f32(grids, obs, bounds_atol, outb)
            case (np.float64, False):
                raw.check_bounds_rectilinear_f64(grids, obs, bounds_atol, outb)
        if any(outb):
            raise ValueError("Observation points violate interpolator bounds")

    match (dtype, is_regular, method):
        case (np.float32, True, "linear"):
            raw.interpn_linear_regular_f32(dims, starts, steps, vals, obs, out)
        case (np.float64, True, "linear"):
            raw.interpn_linear_regular_f64(dims, starts, steps, vals, obs, out)
        case (np.float32, False, "linear"):
            raw.interpn_linear_rectilinear_f32(grids, vals, obs, out)
        case (np.float64, False, "linear"):
            raw.interpn_linear_rectilinear_f64(grids, vals, obs, out)
        case (np.float32, True, "nearest"):
            raw.interpn_nearest_regular_f32(dims, starts, steps, vals, obs, out)
        case (np.float64, True, "nearest"):
            raw.interpn_nearest_regular_f64(dims, starts, steps, vals, obs, out)
        case (np.float32, False, "nearest"):
            raw.interpn_nearest_rectilinear_f32(grids, vals, obs, out)
        case (np.float64, False, "nearest"):
            raw.interpn_nearest_rectilinear_f64(grids, vals, obs, out)
        case (np.float32, True, "cubic"):
            raw.interpn_cubic_regular_f32(
                dims, starts, steps, vals, linearize_extrapolation, obs, out
            )
        case (np.float64, True, "cubic"):
            raw.interpn_cubic_regular_f64(
                dims, starts, steps, vals, linearize_extrapolation, obs, out
            )
        case (np.float32, False, "cubic"):
            raw.interpn_cubic_rectilinear_f32(
                grids, vals, linearize_extrapolation, obs, out
            )
        case (np.float64, False, "cubic"):
            raw.interpn_cubic_rectilinear_f64(
                grids, vals, linearize_extrapolation, obs, out
            )
        case _:
            raise ValueError(
                "Unsupported interpolation configuration:"
                f" {dtype}, {is_regular}, {method}"
            )

    if not out_is_view:
        np.copyto(user_out, out.reshape(outshape))
        return user_out
    return out.reshape(outshape)


def _check_regular(grids: Sequence[NDArray]) -> bool:
    """Check if grids are all regularly spaced (exact equality of spacings,
    matching the reference `_check_regular`, `__init__.py:197-203`)."""
    is_regular = True
    for grid in grids:
        dgrid = np.diff(grid)
        is_regular = is_regular and bool(np.all(dgrid == dgrid[0]))
    return bool(is_regular)
