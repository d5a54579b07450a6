"""Independent pure-numpy oracle of the reference semantics.

A deliberately slow, loop-based transliteration of the algorithms specified by
the reference (cell location, saturation regions, Hermite construction,
nonuniform differences), used as golden truth for the vectorized JAX kernels.
Mirrors the reference's own test style of comparing against an in-test oracle
(`src/nearest/regular.rs:324-337`).
"""

from __future__ import annotations

import numpy as np


def _hermite(t, y0, dy, k0, k1):
    a = k0 - dy
    b = -k1 + dy
    c1 = dy + a
    c2 = b - 2 * a
    c3 = a - b
    return y0 + t * (c1 + t * (c2 + t * c3))


def _cd_nonuniform(y0, y1, y2, h01, h12):
    return (h01 / (h01 + h12)) * ((y2 - y1) / h12) + (h12 / (h12 + h01)) * (
        (y1 - y0) / h01
    )


def linear_regular(dims, starts, steps, vals, point):
    """One-point multilinear eval on a regular grid (reference
    `src/multilinear/regular.rs:296-425` semantics)."""
    ndims = len(dims)
    grid = np.asarray(vals).reshape(dims)
    locs, ts = [], []
    for k in range(ndims):
        floc = np.floor((point[k] - starts[k]) / steps[k])
        loc = int(min(max(floc, 0), max(dims[k] - 2, 0)))
        t = (point[k] - (starts[k] + steps[k] * loc)) / steps[k]
        locs.append(loc)
        ts.append(t)
    sub = grid[tuple(slice(l, l + 2) for l in locs)]
    for k in range(ndims):
        sub = sub[0] + ts[k] * (sub[1] - sub[0])
    return sub


def linear_rectilinear(grids, vals, point):
    """One-point multilinear eval on a rectilinear grid
    (`src/multilinear/rectilinear.rs:244-370`)."""
    ndims = len(grids)
    dims = [len(g) for g in grids]
    grid = np.asarray(vals).reshape(dims)
    locs, ts = [], []
    for k in range(ndims):
        g = np.asarray(grids[k])
        iloc = int(np.searchsorted(g, point[k], side="left")) - 1
        loc = int(min(max(iloc, 0), max(dims[k] - 2, 0)))
        t = (point[k] - g[loc]) / (g[loc + 1] - g[loc])
        locs.append(loc)
        ts.append(t)
    sub = grid[tuple(slice(l, l + 2) for l in locs)]
    for k in range(ndims):
        sub = sub[0] + ts[k] * (sub[1] - sub[0])
    return sub


def _cubic_sat_regular(point_k, start, step, dim):
    floc = np.floor((point_k - start) / step)
    iloc = int(floc) - 1
    loc = int(min(max(iloc, 0), max(dim - 4, 0)))
    if iloc < -1:
        sat = "outside_low"
    elif iloc == -1:
        sat = "inside_low"
    elif iloc > dim - 3:
        sat = "outside_high"
    elif iloc == dim - 3:
        sat = "inside_high"
    else:
        sat = "none"
    t = (point_k - (start + step * (loc + 1))) / step
    return loc, sat, t


def _cubic_inner_regular(v, t, sat, linearize):
    """Reference `interp_inner` (`src/multicubic/regular.rs:472-623`)."""
    if sat == "none":
        y0, dy = v[1], v[2] - v[1]
        k0 = (v[2] - v[0]) / 2
        k1 = (v[3] - v[1]) / 2
        return _hermite(t, y0, dy, k0, k1)
    if sat in ("inside_low", "outside_low"):
        tt = -t
        y0, dy = v[1], v[0] - v[1]
        k0 = -(v[2] - v[0]) / 2
        k1 = 2 * dy - k0
        if sat == "outside_low" and linearize:
            return v[0] + k1 * (tt - 1)
        return _hermite(tt, y0, dy, k0, k1)
    tt = t - 1
    y0, dy = v[2], v[3] - v[2]
    k0 = (v[3] - v[1]) / 2
    k1 = 2 * dy - k0
    if sat == "outside_high" and linearize:
        return v[3] + k1 * (tt - 1)
    return _hermite(tt, y0, dy, k0, k1)


def cubic_regular(dims, starts, steps, vals, point, linearize):
    """One-point multicubic eval on a regular grid."""
    ndims = len(dims)
    grid = np.asarray(vals).reshape(dims)
    locs, sats, ts = [], [], []
    for k in range(ndims):
        loc, sat, t = _cubic_sat_regular(point[k], starts[k], steps[k], dims[k])
        locs.append(loc)
        sats.append(sat)
        ts.append(t)
    sub = grid[tuple(slice(l, l + 4) for l in locs)]
    for k in range(ndims):
        new = np.apply_along_axis(
            lambda v: _cubic_inner_regular(v, ts[k], sats[k], linearize), 0, sub
        )
        sub = new
    return sub


def _cubic_inner_rectilinear(v, gc, x, sat, linearize):
    """Reference rectilinear `interp_inner`
    (`src/multicubic/rectilinear.rs:411-545`)."""
    h01 = gc[1] - gc[0]
    h12 = gc[2] - gc[1]
    h23 = gc[3] - gc[2]
    if sat == "none":
        y0, dy = v[1], v[2] - v[1]
        k0 = _cd_nonuniform(v[0], v[1], v[2], h01 / h12, 1.0)
        k1 = _cd_nonuniform(v[1], v[2], v[3], 1.0, h23 / h12)
        t = (x - gc[1]) / h12
        return _hermite(t, y0, dy, k0, k1)
    if sat in ("inside_low", "outside_low"):
        y0, dy = v[1], v[0] - v[1]
        k0 = -_cd_nonuniform(v[0], v[1], v[2], 1.0, h12 / h01)
        k1 = 2 * dy - k0
        t = -(x - gc[1]) / h01
        if sat == "outside_low" and linearize:
            return v[0] + k1 * (t - 1)
        return _hermite(t, y0, dy, k0, k1)
    y0, dy = v[2], v[3] - v[2]
    k0 = _cd_nonuniform(v[1], v[2], v[3], h12 / h23, 1.0)
    k1 = 2 * dy - k0
    t = (x - gc[2]) / h23
    if sat == "outside_high" and linearize:
        return v[3] + k1 * (t - 1)
    return _hermite(t, y0, dy, k0, k1)


def cubic_rectilinear(grids, vals, point, linearize):
    """One-point multicubic eval on a rectilinear grid."""
    ndims = len(grids)
    dims = [len(g) for g in grids]
    grid = np.asarray(vals).reshape(dims)
    locs, sats = [], []
    for k in range(ndims):
        g = np.asarray(grids[k])
        iloc = int(np.searchsorted(g, point[k], side="left")) - 2
        loc = int(min(max(iloc, 0), max(dims[k] - 4, 0)))
        n = dims[k]
        if iloc == -2:
            sat = "outside_low"
        elif iloc == -1:
            sat = "inside_low"
        elif iloc == n - 2:
            sat = "outside_high"
        elif iloc == n - 3:
            sat = "inside_high"
        else:
            sat = "none"
        locs.append(loc)
        sats.append(sat)
    sub = grid[tuple(slice(l, l + 4) for l in locs)]
    for k in range(ndims):
        gc = np.asarray(grids[k])[locs[k] : locs[k] + 4]
        sub = np.apply_along_axis(
            lambda v: _cubic_inner_rectilinear(v, gc, point[k], sats[k], linearize),
            0,
            sub,
        )
    return sub


def nearest_regular(dims, starts, steps, vals, point):
    """One-point nearest eval (`src/nearest/regular.rs:234-316`)."""
    ndims = len(dims)
    grid = np.asarray(vals).reshape(dims)
    idx = []
    for k in range(ndims):
        floc = np.floor((point[k] - starts[k]) / steps[k])
        loc = int(min(max(floc, 0), max(dims[k] - 2, 0)))
        dt = (point[k] - (starts[k] + steps[k] * loc)) / steps[k]
        idx.append(loc if dt <= 0.5 else loc + 1)
    return grid[tuple(idx)]


def nearest_rectilinear(grids, vals, point):
    """One-point nearest eval (`src/nearest/rectilinear.rs:193-265`)."""
    ndims = len(grids)
    dims = [len(g) for g in grids]
    grid = np.asarray(vals).reshape(dims)
    idx = []
    for k in range(ndims):
        g = np.asarray(grids[k])
        iloc = int(np.searchsorted(g, point[k], side="left")) - 1
        loc = int(min(max(iloc, 0), max(dims[k] - 2, 0)))
        dt = (point[k] - g[loc]) / (g[loc + 1] - g[loc])
        idx.append(loc if dt <= 0.5 else loc + 1)
    return grid[tuple(idx)]
