"""Implementation selection: gather-tree vs factorized-MXU vs fused Pallas.

Three implementations cover every method x grid-kind family:

* `gather` (ops.linear / ops.cubic / ops.nearest): per-vertex flat gathers +
  tree reduction. Matches the reference's evaluation order; the only choice
  for f64 (TPU emulates f64 arithmetic as float-float, and emulated matmuls
  are ~400x slower than f32, so the contraction paths are a loss there) and
  for grids too large for the others.
* `factorized` (ops.factorized): per-axis dense weight matrices contracted
  on the MXU via XLA einsums. Covers regular AND rectilinear grids; bound by
  the HBM traffic of its inter-stage temporaries.
* `pallas` (ops.pallas_v3): the factorized math fused per query tile in
  VMEM (grouped MXU contraction + segment-sum tail, split-bf16 products).
  Regular AND rectilinear grids, f32, 2-8D, table <= VMEM. Fastest engine
  at every measured shape (docs/perf.md): 1.1-2x over `factorized`, up to
  9x over gather on large grids, 64x for rectilinear cubic.

Selection happens at trace time from static information (dtype, grid size,
query count, backend). Overrides: INTERPN_TPU_IMPL=gather|factorized|pallas,
INTERPN_TPU_PRECISION=exact (default: 6-pass f32-exact contraction) |
split (4 one-pass bf16 matmuls on row-centered tables) | fast (3) — see
ops/pallas_v3.py for the accuracy ladder.
"""

from __future__ import annotations

import math
import os

import jax
import jax.numpy as jnp

from . import factorized as _fz
from . import pallas_df64 as _pdf
from . import pallas_v3 as _pv3
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
# The fused Pallas engine pads to its query-tile size (>= 128), so it is
# already efficient at much smaller batches than the XLA factorized path
# (whose chunking/einsum overheads only amortize past ~32k); gather cubic
# at 2 Mq/s would cost 5 ms for a 10k-query device batch.
MIN_PALLAS_QUERIES = 1024
# Per-method grid-size ceilings for the fused Pallas engine on REGULAR
# grids, from measured crossovers vs the gather path on v5e (docs/perf.md):
# the contraction pays ~2 * prod(dims) MACs per query per pass, the gather
# path is roughly grid-size independent (cubic 1.8 Mq/s -> crossover far
# above the VMEM cap; linear 16 Mq/s -> ~768k cells; nearest fetches ONE
# element per query at 93 Mq/s, so only benchmark-sized grids win).
# RECTILINEAR gather pays a bisection per point on top (linear 3.4 / cubic
# 1.2 / nearest 4.3 Mq/s on a 100^3 grid), so pallas wins at every size it
# supports, for every method.
MAX_PALLAS_GRID = {
    "cubic": 1 << 21,  # effectively the VMEM cap in pallas_v3.supported
    "linear": 3 << 18,
    # nearest gather fetches ONE element/query at 93 Mq/s; the pallas
    # kernel runs 567 Mq/s on an 8k-cell grid but its cost grows with
    # prod(dims) — measured crossover ~50k cells, capped conservatively
    "nearest": 1 << 15,
}
MAX_PALLAS_GRID_RECT = 1 << 21


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


def _impl(
    dtype, nvals: int, obs0, vals_finite: bool, dims=None, method="",
    rect: bool = False,
) -> str:
    """Pick the engine for one trace. `dims` is the static grid shape
    (regular: from the dims argument; rectilinear: from the grid array
    shapes, equally static at trace time)."""
    mode = os.environ.get("INTERPN_TPU_IMPL", "auto")
    if mode == "pallas":
        # forced pallas still honors hard capability limits (dtype/ndims/
        # VMEM); ineligible f32 traces fall back to factorized, f64 to the
        # gather tree (an f64 einsum would hit emulated matmuls, ~400x slow)
        if dims is not None and _pv3.supported(tuple(dims), dtype, method):
            return "pallas"
        mode = "factorized" if dtype == jnp.float32 else "gather"
    if mode in ("gather", "factorized"):
        return mode
    if (
        dtype == jnp.float64
        and vals_finite
        and getattr(obs0, "ndim", 1) == 1
        and obs0.size >= MIN_PALLAS_QUERIES
        and jax.default_backend() == "tpu"
        and dims is not None
        and _pdf.supported(tuple(dims), method)
    ):
        # double-float contraction engine: ~1e-14 relative agreement with
        # the f64 gather tree at 2-15x its throughput (docs/perf.md)
        return "df64"
    if (
        dtype == jnp.float32
        and vals_finite
        and getattr(obs0, "ndim", 1) == 1  # contraction kernels assume flat obs
        and obs0.size >= MIN_PALLAS_QUERIES
        and jax.default_backend() == "tpu"
    ):
        cap = MAX_PALLAS_GRID_RECT if rect else MAX_PALLAS_GRID.get(method, 0)
        if (
            dims is not None
            and nvals <= cap
            and _pv3.supported(tuple(dims), dtype, method)
        ):
            return "pallas"
        if nvals <= MAX_FACTORIZED_GRID and obs0.size >= MIN_FACTORIZED_QUERIES:
            return "factorized"
    return "gather"


def _pallas_passes() -> int:
    """Contraction precision for the Pallas engine. Default is the f32-exact
    6-pass product; INTERPN_TPU_PRECISION=split (4 one-pass bf16 matmuls,
    row-centered, ~2^-17 of local data variation) or =fast (3) trade
    accuracy for throughput."""
    mode = os.environ.get("INTERPN_TPU_PRECISION", "exact")
    return {"split": 4, "fast": 3}.get(mode, 6)


def _resolve_finite(vals, vals_finite) -> bool:
    return _vals_finite(vals) if vals_finite is None else bool(vals_finite)


def nearest_regular(dims, starts, steps, vals, obs, *, vals_finite=None):
    vf = _resolve_finite(vals, vals_finite)
    impl = _impl(vals.dtype, math.prod(dims), obs[0], vf, dims, "nearest")
    if impl == "pallas":
        return _pv3.eval_regular(dims, starts, steps, vals, obs, "nearest", True)
    if impl == "factorized":
        return _fz.nearest_regular_factorized(dims, starts, steps, vals, obs)
    return _nearest_reg_gather(dims, starts, steps, vals, obs)


def nearest_rectilinear(grids, vals, obs, *, vals_finite=None):
    dims = tuple(int(g.shape[0]) for g in grids)
    vf = _resolve_finite(vals, vals_finite)
    impl = _impl(
        vals.dtype, math.prod(dims), obs[0], vf, dims, "nearest", rect=True
    )
    if impl == "pallas":
        return _pv3.eval_rectilinear(grids, vals, obs, "nearest", True)
    if impl == "factorized":
        return _fz.nearest_rectilinear_factorized(grids, vals, obs)
    return _nearest_rect_gather(grids, vals, obs)


def linear_regular(dims, starts, steps, vals, obs, *, vals_finite=None):
    vf = _resolve_finite(vals, vals_finite)
    impl = _impl(vals.dtype, math.prod(dims), obs[0], vf, dims, "linear")
    if impl == "df64":
        return _pdf.eval_regular(dims, starts, steps, vals, obs, "linear")
    if impl == "pallas":
        return _pv3.eval_regular(
            dims, starts, steps, vals, obs, "linear", True, _pallas_passes()
        )
    if impl == "factorized":
        return _fz.linear_regular_factorized(dims, starts, steps, vals, obs)
    return _linear_reg_gather(dims, starts, steps, vals, obs)


def linear_rectilinear(grids, vals, obs, *, vals_finite=None):
    dims = tuple(int(g.shape[0]) for g in grids)
    vf = _resolve_finite(vals, vals_finite)
    impl = _impl(
        vals.dtype, math.prod(dims), obs[0], vf, dims, "linear", rect=True
    )
    if impl == "df64":
        return _pdf.eval_rectilinear(grids, vals, obs, "linear")
    if impl == "pallas":
        # XLA-precomputed weights beat the in-kernel rectilinear locate
        # (counts + select-sums) — measured on v5e, docs/perf.md
        return _pv3.eval_rectilinear_pre(
            grids, vals, obs, "linear", True, _pallas_passes()
        )
    if impl == "factorized":
        return _fz.linear_rectilinear_factorized(grids, vals, obs)
    return _linear_rect_gather(grids, vals, obs)


def cubic_regular(
    dims, starts, steps, vals, obs, linearize_extrapolation: bool, *, vals_finite=None
):
    vf = _resolve_finite(vals, vals_finite)
    impl = _impl(vals.dtype, math.prod(dims), obs[0], vf, dims, "cubic")
    if impl == "df64":
        return _pdf.eval_regular(
            dims, starts, steps, vals, obs, "cubic",
            bool(linearize_extrapolation),
        )
    if impl == "pallas":
        return _pv3.eval_regular(
            dims, starts, steps, vals, obs, "cubic",
            bool(linearize_extrapolation), _pallas_passes(),
        )
    if impl == "factorized":
        return _fz.cubic_regular_factorized(
            dims, starts, steps, vals, obs, linearize_extrapolation
        )
    return _cubic_reg_gather(dims, starts, steps, vals, obs, linearize_extrapolation)


def cubic_rectilinear(grids, vals, obs, linearize_extrapolation: bool, *, vals_finite=None):
    dims = tuple(int(g.shape[0]) for g in grids)
    vf = _resolve_finite(vals, vals_finite)
    impl = _impl(
        vals.dtype, math.prod(dims), obs[0], vf, dims, "cubic", rect=True
    )
    if impl == "df64":
        return _pdf.eval_rectilinear(
            grids, vals, obs, "cubic", bool(linearize_extrapolation)
        )
    if impl == "pallas":
        return _pv3.eval_rectilinear_pre(
            grids, vals, obs, "cubic",
            bool(linearize_extrapolation), _pallas_passes(),
        )
    if impl == "factorized":
        return _fz.cubic_rectilinear_factorized(
            grids, vals, obs, linearize_extrapolation
        )
    return _cubic_rect_gather(grids, vals, obs, linearize_extrapolation)
