"""Batched 1D gathers with in-bounds promise.

All stencil indices in interpn-tpu are in range by construction (cell
locations are clamped to the grid interior before offsets are added), so the
gathers skip XLA's bounds clamping — `jnp.take` in current JAX does not expose
PROMISE_IN_BOUNDS, but the `.at[].get` API does.

Corner stencils are fetched as one flat (n,) gather per vertex rather than a
single (n, 2^N)-shaped gather: on the TPU backend, multi-dimensional gathers
compile in time proportional to the total index count (~0.5 ms/index — minutes
for 1M queries), while flat gathers with constant offsets compile in
milliseconds and fuse into the downstream elementwise tree.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..utils import corner_offsets


def take1(vals, idx):
    """vals[idx] for flat `vals` and integer `idx` of any shape, promising
    in-bounds indices."""
    return jnp.asarray(vals).at[idx].get(mode="promise_in_bounds")


# XLA:TPU lowers per-query dynamic takes at gather speed (~19 Mq/s for 1M
# queries) once the source array exceeds one 64-lane vreg row; at or below
# 64 entries they lower as fast vectorized selects. The one-hot select-sum
# below stays vectorized at every size (measured ~900 Mq/s at 104 entries,
# ~370 at 256, ~60 at 16384 — the compare_all-searchsorted scaling, same
# broadcast-reduce shape), overtaking the gather lowering everywhere in
# the grid-axis size range. Above _TAKE_ONEHOT_MAX the O(len) per-query
# compares would lose to the gather, so plain take resumes (value-table
# gathers also keep take1 directly: tables reach 1e6+ entries).
_TAKE_ONEHOT_MAX = 4096


def take_small(vals, idx):
    """vals[idx] for flat `vals` and 1-D in-bounds `idx`, routed around the
    TPU gather cliff: plain take at <= 64 entries (fast select regime) and
    above _TAKE_ONEHOT_MAX, a branch-free one-hot select-sum between."""
    vals = jnp.asarray(vals)
    n = int(vals.shape[0])
    if n <= 64 or n > _TAKE_ONEHOT_MAX or getattr(idx, "ndim", 1) != 1:
        return take1(vals, idx)
    iota = jnp.arange(n, dtype=jnp.int32)
    mask = idx[:, None].astype(jnp.int32) == iota[None, :]
    return jnp.sum(
        jnp.where(mask, vals[None, :], jnp.zeros((), vals.dtype)), axis=1
    )


# Above this stencil size, per-vertex gathers would bloat the traced program
# (4^N nodes); switch to one batched gather + a vectorized tree reduction.
LIST_MAX_VERTS = 256


def gather_corners(vals, base, dims, footprint: int):
    """Fetch the full 2^N (linear) or 4^N (cubic) corner stencil as a LIST of
    flat gathers, ordered by the reference's vertex counter (dim 0 in the
    lowest bit/digit, `src/multilinear/regular.rs:356-367`).

    Only for stencils up to LIST_MAX_VERTS vertices — every hot configuration
    (linear <= 8D, cubic <= 4D)."""
    offs = corner_offsets(dims, footprint)
    return [take1(vals, base if o == 0 else base + int(o)) for o in offs]


def gather_corners_matrix(vals, base, dims, footprint: int):
    """Fetch the corner stencil as one (n_verts, n) array, vertex-major.

    Used for the large-stencil tail (cubic 5-8D): a single batched gather
    keeps the traced program small at the cost of the TPU backend's slow
    compilation for multi-dimensional gathers — acceptable for these rare
    configurations, and free on CPU."""
    offs = jnp.asarray(corner_offsets(dims, footprint))
    idx = offs[:, None] + base[None, :]
    return take1(vals, idx)
