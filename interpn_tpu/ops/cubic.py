"""Multicubic (Hermite) interpolation/extrapolation, batched over queries.

TPU-native re-design of the reference's cubic kernels
(`src/multicubic/regular.rs:325-623`, `src/multicubic/rectilinear.rs:265-545`,
shared math `src/multicubic/mod.rs:68-117`):

* One batched gather fetches the full 4^N stencil per query (static digit-
  pattern offsets, like the linear path but base-4).
* The per-axis Hermite evaluation — the reference's 5-way `Saturation` match —
  is flattened into branchless `where`-selects. All five cases share the same
  `normalized_hermite_spline` shape; only (t, y0, dy, k0, k1) differ:
    None:        t'=t,   y0=v1, dy=v2-v1, k0=(v2-v0)/2,  k1=(v3-v1)/2
    Inside/OutsideLow (mirrored): t'=-t, y0=v1, dy=v0-v1,
                 k0=-(v2-v0)/2, k1=2*dy-k0 (natural-spline BC)
    Inside/OutsideHigh: t'=t-1, y0=v2, dy=v3-v2, k0=(v3-v1)/2, k1=2*dy-k0
  With `linearize_extrapolation`, the two Outside cases become
  y_edge + k1*(t'-1) instead of the spline (`regular.rs:553-561,609-617`).
* Reduction order matches the reference tree: dim 0 first, dim N-1 last.

The rectilinear variant additionally carries the 4 bracketing grid coordinates
per dimension and uses the distance-weighted nonuniform centered difference
(Veldman & Rinzema method B, `mod.rs:94-117`) with the same h-ratio
normalizations as `rectilinear.rs:446-452,467-473,512-517`.
"""

from __future__ import annotations

import jax.numpy as jnp

from ._gather import take1

from ..utils import c_strides, corner_offsets
from .locate import locate_regular_cubic, locate_rectilinear_cubic

_I32 = jnp.int32


def _hermite(t, y0, dy, k0, k1):
    """Normalized cubic Hermite spline via Horner (`mod.rs:72-91`)."""
    a = k0 - dy
    b = -k1 + dy
    c1 = dy + a
    c2 = b - (a + a)
    c3 = a - b
    return y0 + t * (c1 + t * (c2 + t * c3))


def _centered_diff_nonuniform(y0, y1, y2, h01, h12):
    """Distance-weighted central difference on a nonuniform grid
    (`mod.rs:103-117`)."""
    a = h01 / (h01 + h12)
    b = (y2 - y1) / h12
    c = h12 / (h12 + h01)
    d = (y1 - y0) / h01
    return a * b + c * d


def _axis_reduce_regular(c, t, low, high, outside, linearize: bool):
    """One level of the cubic dependency tree on a regular grid.

    c has shape (..., 4); t/low/high/outside broadcast against c[..., 0].
    Vectorized form of `interp_inner` (`src/multicubic/regular.rs:472-623`).
    """
    v0, v1, v2, v3 = c[..., 0], c[..., 1], c[..., 2], c[..., 3]
    tt = jnp.where(low, -t, jnp.where(high, t - 1.0, t))
    y0 = jnp.where(high, v2, v1)
    dy = jnp.where(low, v0 - v1, jnp.where(high, v3 - v2, v2 - v1))
    half02 = (v2 - v0) * 0.5
    half13 = (v3 - v1) * 0.5
    k0 = jnp.where(low, -half02, jnp.where(high, half13, half02))
    k1 = jnp.where(low | high, 2.0 * dy - k0, half13)
    spline = _hermite(tt, y0, dy, k0, k1)
    if not linearize:
        return spline
    y_edge = jnp.where(low, v0, v3)
    lin = y_edge + k1 * (tt - 1.0)
    return jnp.where(outside, lin, spline)


def _axis_reduce_rectilinear(c, x, gc, low, high, outside, linearize: bool):
    """One level of the cubic tree on a rectilinear grid.

    gc has shape x.shape + (4,): the bracketing grid coordinates. Vectorized
    form of the rectilinear `interp_inner`
    (`src/multicubic/rectilinear.rs:411-545`).
    """
    v0, v1, v2, v3 = c[..., 0], c[..., 1], c[..., 2], c[..., 3]
    g0, g1, g2, g3 = gc[..., 0], gc[..., 1], gc[..., 2], gc[..., 3]
    h01 = g1 - g0
    h12 = g2 - g1
    h23 = g3 - g2
    one = jnp.ones((), dtype=x.dtype)

    # Slopes per case (same operand normalizations as the reference).
    k0_none = _centered_diff_nonuniform(v0, v1, v2, h01 / h12, one)
    k1_none = _centered_diff_nonuniform(v1, v2, v3, one, h23 / h12)
    k0_low = -_centered_diff_nonuniform(v0, v1, v2, one, h12 / h01)
    k0_high = _centered_diff_nonuniform(v1, v2, v3, h12 / h23, one)

    dy = jnp.where(low, v0 - v1, jnp.where(high, v3 - v2, v2 - v1))
    y0 = jnp.where(high, v2, v1)
    k0 = jnp.where(low, k0_low, jnp.where(high, k0_high, k0_none))
    k1 = jnp.where(low | high, 2.0 * dy - k0, k1_none)

    # Normalized coordinate per case: None (x-g1)/h12; low -(x-g1)/h01
    # (mirrored); high (x-g2)/h23.
    tt = jnp.where(
        low,
        -(x - g1) / h01,
        jnp.where(high, (x - g2) / h23, (x - g1) / h12),
    )

    spline = _hermite(tt, y0, dy, k0, k1)
    if not linearize:
        return spline
    y_edge = jnp.where(low, v0, v3)
    lin = y_edge + k1 * (tt - 1.0)
    return jnp.where(outside, lin, spline)


def _bshape(arr, tail_axes: int):
    """Reshape a per-point array for broadcasting against a corner tensor
    that still carries `tail_axes` unreduced stencil axes after the current
    one is consumed."""
    return arr.reshape(arr.shape + (1,) * tail_axes)


def cubic_regular(
    dims: tuple[int, ...], starts, steps, vals, obs, linearize_extrapolation: bool
):
    """Multicubic eval on a regular grid (1..8 dims).

    Matches `multicubic::regular::interpn` (`src/multicubic/regular.rs:52-135`)
    including quadratic continuation / linearized extrapolation semantics.
    """
    ndims = len(dims)
    strides = c_strides(dims)
    base = jnp.zeros(obs[0].shape, dtype=_I32)
    per_dim = []
    for k in range(ndims):
        cl = locate_regular_cubic(obs[k], starts[k], steps[k], dims[k])
        base = base + cl.loc * strides[k]
        per_dim.append(cl)
    offs = jnp.asarray(corner_offsets(dims, 4))
    idx = base[..., None] + offs
    c = take1(vals, idx)
    c = c.reshape(base.shape + (4,) * ndims)
    for k in range(ndims):
        cl = per_dim[k]
        tail = ndims - 1 - k
        c = _axis_reduce_regular(
            c,
            _bshape(cl.t, tail),
            _bshape(cl.low, tail),
            _bshape(cl.high, tail),
            _bshape(cl.outside, tail),
            linearize_extrapolation,
        )
    return c


def cubic_rectilinear(grids, vals, obs, linearize_extrapolation: bool):
    """Multicubic eval on a rectilinear grid (1..8 dims).

    Matches `multicubic::rectilinear::interpn`
    (`src/multicubic/rectilinear.rs`), with slopes from distance-weighted
    nonuniform centered differences.
    """
    ndims = len(grids)
    dims = tuple(int(g.shape[0]) for g in grids)
    strides = c_strides(dims)
    base = jnp.zeros(obs[0].shape, dtype=_I32)
    per_dim = []
    for k in range(ndims):
        cl, gc = locate_rectilinear_cubic(obs[k], grids[k])
        base = base + cl.loc * strides[k]
        per_dim.append((cl, gc))
    offs = jnp.asarray(corner_offsets(dims, 4))
    idx = base[..., None] + offs
    c = take1(vals, idx)
    c = c.reshape(base.shape + (4,) * ndims)
    for k in range(ndims):
        cl, gc = per_dim[k]
        tail = ndims - 1 - k
        c = _axis_reduce_rectilinear(
            c,
            _bshape(obs[k], tail),
            gc.reshape(gc.shape[:-1] + (1,) * tail + (4,)),
            _bshape(cl.low, tail),
            _bshape(cl.high, tail),
            _bshape(cl.outside, tail),
            linearize_extrapolation,
        )
    return c
