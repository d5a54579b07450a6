"""Implementation selection: gather-tree vs factorized-MXU evaluation.

Two complete implementations exist for every method x grid-kind family:

* `gather` (ops.linear / ops.cubic / ops.nearest): per-vertex flat gathers +
  tree reduction. Matches the reference's evaluation order; the only choice
  for f64 (TPU emulates f64 arithmetic as float-float, and emulated matmuls
  are ~400x slower than f32, so the factorized path is a loss there) and for
  very large grids (factorized FLOPs scale with grid size).
* `factorized` (ops.factorized): per-axis dense weight matrices contracted
  on the MXU. On TPU v5e this is ~14x (linear) to ~90x (cubic) faster than
  the gather path for f32 on the reference's benchmark-sized grids.

Selection happens at trace time from static information (dtype, grid size,
query count, backend). Override with env INTERPN_TPU_IMPL=gather|factorized.
"""

from __future__ import annotations

import math
import os

import jax
import jax.numpy as jnp

from . import factorized as _fz
from .cubic import cubic_rectilinear as _cubic_rect_gather
from .cubic import cubic_regular as _cubic_reg_gather
from .linear import linear_rectilinear as _linear_rect_gather
from .linear import linear_regular as _linear_reg_gather
from .nearest import nearest_rectilinear as _nearest_rect_gather
from .nearest import nearest_regular as _nearest_reg_gather

# Factorized pays 2*n*prod(dims) FLOPs; past this grid size the gather path
# wins even on TPU.
MAX_FACTORIZED_GRID = 1 << 18
# Below this query count the call is latency-bound either way.
MIN_FACTORIZED_QUERIES = 32_768


def _vals_finite(vals) -> bool:
    """Best-effort trace-time finiteness check of the grid values.

    The factorized path multiplies EVERY grid value by its (zero
    off-stencil) weight, so one inf/NaN sentinel anywhere in the grid
    poisons every query (0 * inf = nan) — unlike the gather path, which
    only touches the stencil. Concrete (non-traced) arrays are checked
    here; traced values cannot be inspected, so jit callers thread the
    flag in from the host (see raw.py / models) or accept the documented
    caveat."""
    if isinstance(vals, jax.core.Tracer):
        return True
    try:
        return bool(jnp.isfinite(vals).all())
    except (TypeError, jax.errors.TracerBoolConversionError):
        return True


def _impl(dtype, nvals: int, obs0, vals_finite: bool) -> str:
    mode = os.environ.get("INTERPN_TPU_IMPL", "auto")
    if mode in ("gather", "factorized"):
        return mode
    if (
        dtype == jnp.float32
        and vals_finite
        and getattr(obs0, "ndim", 1) == 1  # factorized kernels assume flat obs
        and nvals <= MAX_FACTORIZED_GRID
        and obs0.size >= MIN_FACTORIZED_QUERIES
        and jax.default_backend() == "tpu"
    ):
        return "factorized"
    return "gather"


def _resolve_finite(vals, vals_finite) -> bool:
    return _vals_finite(vals) if vals_finite is None else bool(vals_finite)


def nearest_regular(dims, starts, steps, vals, obs, *, vals_finite=None):
    vf = _resolve_finite(vals, vals_finite)
    if _impl(vals.dtype, math.prod(dims), obs[0], vf) == "factorized":
        return _fz.nearest_regular_factorized(dims, starts, steps, vals, obs)
    return _nearest_reg_gather(dims, starts, steps, vals, obs)


def nearest_rectilinear(grids, vals, obs, *, vals_finite=None):
    nvals = math.prod(int(g.shape[0]) for g in grids)
    vf = _resolve_finite(vals, vals_finite)
    if _impl(vals.dtype, nvals, obs[0], vf) == "factorized":
        return _fz.nearest_rectilinear_factorized(grids, vals, obs)
    return _nearest_rect_gather(grids, vals, obs)


def linear_regular(dims, starts, steps, vals, obs, *, vals_finite=None):
    vf = _resolve_finite(vals, vals_finite)
    if _impl(vals.dtype, math.prod(dims), obs[0], vf) == "factorized":
        return _fz.linear_regular_factorized(dims, starts, steps, vals, obs)
    return _linear_reg_gather(dims, starts, steps, vals, obs)


def linear_rectilinear(grids, vals, obs, *, vals_finite=None):
    nvals = math.prod(int(g.shape[0]) for g in grids)
    vf = _resolve_finite(vals, vals_finite)
    if _impl(vals.dtype, nvals, obs[0], vf) == "factorized":
        return _fz.linear_rectilinear_factorized(grids, vals, obs)
    return _linear_rect_gather(grids, vals, obs)


def cubic_regular(
    dims, starts, steps, vals, obs, linearize_extrapolation: bool, *, vals_finite=None
):
    vf = _resolve_finite(vals, vals_finite)
    if _impl(vals.dtype, math.prod(dims), obs[0], vf) == "factorized":
        return _fz.cubic_regular_factorized(
            dims, starts, steps, vals, obs, linearize_extrapolation
        )
    return _cubic_reg_gather(dims, starts, steps, vals, obs, linearize_extrapolation)


def cubic_rectilinear(grids, vals, obs, linearize_extrapolation: bool, *, vals_finite=None):
    nvals = math.prod(int(g.shape[0]) for g in grids)
    vf = _resolve_finite(vals, vals_finite)
    if _impl(vals.dtype, nvals, obs[0], vf) == "factorized":
        return _fz.cubic_rectilinear_factorized(
            grids, vals, obs, linearize_extrapolation
        )
    return _cubic_rect_gather(grids, vals, obs, linearize_extrapolation)
