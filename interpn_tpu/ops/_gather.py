"""Batched 1D gather with in-bounds promise.

All stencil indices in interpn-tpu are in range by construction (cell
locations are clamped to the grid interior before offsets are added), so the
gathers skip XLA's bounds clamping — `jnp.take` in current JAX does not expose
PROMISE_IN_BOUNDS, but the `.at[].get` API does.
"""

from __future__ import annotations

import jax.numpy as jnp


def take1(vals, idx):
    """vals[idx] for a flat `vals` and integer `idx` of any shape, promising
    in-bounds indices."""
    return jnp.asarray(vals).at[idx].get(mode="promise_in_bounds")
