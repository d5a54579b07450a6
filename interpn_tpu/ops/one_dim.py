"""1D fast-path interpolators.

TPU-native equivalent of the reference's `one_dim` module
(`src/one_dim/mod.rs:28-187`, `linear.rs:9-86`, `hold.rs:8-108`): lightweight
grids (regular / rectilinear) plus interpolants Linear1D, LinearHoldLast1D,
Left1D, Right1D, Nearest1D. All evaluation is batched and branchless; the
extrapolation flag of the reference becomes two boolean masks.

These are plain functional kernels wrapped in tiny classes so the call shape
mirrors the reference (`Linear1D::new(grid).eval(locs, out)`), but everything
is jit-able: `Linear1D(RegularGrid1D(start, step, vals)).eval(locs)`.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax.numpy as jnp

from ._gather import take1

_I32 = jnp.int32


@dataclass(frozen=True)
class GridSample1D:
    """Bracketing sample like the reference's `GridSample`
    (`src/one_dim/mod.rs:19-25`), with extrapolation masks instead of an
    enum."""

    x0: Any
    y0: Any
    x1: Any
    y1: Any
    outside_low: Any
    outside_high: Any


@dataclass(frozen=True)
class RegularGrid1D:
    """Uniformly spaced grid (`src/one_dim/mod.rs:78-138`)."""

    start: Any
    step: Any
    vals: Any

    def at(self, loc) -> GridSample1D:
        vals = jnp.asarray(self.vals)
        n = vals.shape[0]
        start = jnp.asarray(self.start, dtype=vals.dtype)
        step = jnp.asarray(self.step, dtype=vals.dtype)
        stop = start + step * (n - 1)
        outside_low = loc < start
        outside_high = loc > stop
        # The reference ERRORS on non-finite locations ("Unrepresentable
        # number", src/one_dim/mod.rs:99-115); a batched kernel cannot
        # raise per point, so the documented deviation is NaN out (the
        # sanitized index keeps the gather in bounds — floor(NaN) casts
        # to an implementation-defined int32).
        bad = ~jnp.isfinite(loc)
        fi = jnp.floor((jnp.where(bad, start, loc) - start) / step)
        i = jnp.clip(fi, 0.0, float(n - 2)).astype(_I32)
        x0 = start + step * i.astype(vals.dtype)
        x1 = x0 + step
        y0 = jnp.where(bad, jnp.nan, take1(vals, i))
        y1 = jnp.where(bad, jnp.nan, take1(vals, i + 1))
        return GridSample1D(x0, y0, x1, y1, outside_low, outside_high)


@dataclass(frozen=True)
class RectilinearGrid1D:
    """Monotonic non-uniform grid (`src/one_dim/mod.rs:142-187`)."""

    grid: Any
    vals: Any

    def at(self, loc) -> GridSample1D:
        grid = jnp.asarray(self.grid)
        vals = jnp.asarray(self.vals)
        n = grid.shape[0]
        sp = jnp.searchsorted(grid, loc, side="left").astype(_I32)
        # partition_point(< NaN) = 0 (reference + native bisection);
        # jnp.searchsorted sorts NaN last — see ops/locate.py
        sp = jnp.where(jnp.isnan(loc), 0, sp)
        i = jnp.clip(sp - 1, 0, n - 2)
        outside_low = loc < grid[0]
        outside_high = loc > grid[-1]
        # non-finite locations: NaN out (documented deviation — the
        # reference errors; see RegularGrid1D.at)
        bad = ~jnp.isfinite(loc)
        x0 = take1(grid, i)
        x1 = take1(grid, i + 1)
        y0 = jnp.where(bad, jnp.nan, take1(vals, i))
        y1 = jnp.where(bad, jnp.nan, take1(vals, i + 1))
        return GridSample1D(x0, y0, x1, y1, outside_low, outside_high)


class _Interp1D:
    """Base: batched eval over locations (`src/one_dim/mod.rs:41-74`)."""

    def __init__(self, grid):
        self.grid = grid

    def eval(self, locs):
        raise NotImplementedError

    # Alias matching the reference's allocating variant.
    def eval_alloc(self, locs):
        return self.eval(locs)


class Linear1D(_Interp1D):
    """Linear interpolation/extrapolation (`src/one_dim/linear.rs:9-38`)."""

    def eval(self, locs):
        s = self.grid.at(locs)
        slope = (s.y1 - s.y0) / (s.x1 - s.x0)
        return s.y0 + slope * (locs - s.x0)


class LinearHoldLast1D(_Interp1D):
    """Linear inside; holds edge values outside
    (`src/one_dim/linear.rs:43-86`)."""

    def eval(self, locs):
        s = self.grid.at(locs)
        slope = (s.y1 - s.y0) / (s.x1 - s.x0)
        inside = s.y0 + slope * (locs - s.x0)
        return jnp.where(s.outside_low, s.y0, jnp.where(s.outside_high, s.y1, inside))


class Left1D(_Interp1D):
    """Hold-last piecewise constant (`src/one_dim/hold.rs:8-40`)."""

    def eval(self, locs):
        s = self.grid.at(locs)
        return jnp.where(s.outside_high, s.y1, s.y0)


class Right1D(_Interp1D):
    """Hold-next piecewise constant (`src/one_dim/hold.rs:43-75`)."""

    def eval(self, locs):
        s = self.grid.at(locs)
        return jnp.where(s.outside_low, s.y0, s.y1)


class Nearest1D(_Interp1D):
    """Nearest value; ties take the left value (`src/one_dim/hold.rs:79-108`)."""

    def eval(self, locs):
        s = self.grid.at(locs)
        dx0 = jnp.abs(locs - s.x0)
        dx1 = jnp.abs(locs - s.x1)
        return jnp.where(dx1 >= dx0, s.y0, s.y1)
