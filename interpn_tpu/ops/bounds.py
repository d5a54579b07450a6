"""Bounds checking for observation points.

Vectorized equivalents of `multilinear::regular::check_bounds`
(`src/multilinear/regular.rs:145-182`) and
`multilinear::rectilinear::check_bounds`
(`src/multilinear/rectilinear.rs:109-134`): per-dimension flags, True when any
point on that axis violates the (atol-padded) grid bounds.
"""

from __future__ import annotations

import jax.numpy as jnp


def check_bounds_regular(dims: tuple[int, ...], starts, steps, obs, atol):
    """Per-dimension out-of-bounds flags on a regular grid.

    A point x violates dimension i when (x - lo) <= -atol or (x - hi) >= atol,
    with lo/hi = min/max of the first and last grid coordinates
    (`regular.rs:158-171`). Returns a (ndims,) bool array.
    """
    flags = []
    for i in range(len(dims)):
        first = starts[i]
        last = starts[i] + steps[i] * (dims[i] - 1)
        lo = jnp.minimum(first, last)
        hi = jnp.maximum(first, last)
        x = obs[i]
        bad = jnp.any(((x - lo) <= -atol) | ((x - hi) >= atol))
        flags.append(bad)
    return jnp.stack(flags)


def check_bounds_rectilinear(grids, obs, atol):
    """Per-dimension out-of-bounds flags on a rectilinear grid
    (`rectilinear.rs:119-132`). Returns a (ndims,) bool array."""
    flags = []
    for i in range(len(grids)):
        lo = grids[i][0]
        hi = grids[i][-1]
        x = obs[i]
        bad = jnp.any(((x - lo) <= -atol) | ((x - hi) >= atol))
        flags.append(bad)
    return jnp.stack(flags)
