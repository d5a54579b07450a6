"""Query-axis chunking for evaluation paths with wide per-query temporaries.

`lax.map` over query chunks is serial, so peak memory is one chunk's
temporary while each chunk stays large enough to keep the device busy. Used
by the factorized engine (the (n, rest) contraction temporary) and the
large-stencil cubic gather tail (the (4^N, n) corner matrix, which would be
8 GB for 5D f64 at 1M queries if materialized whole).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

# Bound per-chunk temporaries to ~this many bytes.
DEFAULT_CHUNK_BYTES = 2 * 1024 * 1024 * 1024


def chunk_queries(f, obs, row_elems: int, itemsize: int, chunk_bytes=None):
    """Evaluate ``f(obs_tuple) -> (n,)`` over query chunks sized so that the
    per-query temporary of ``row_elems`` elements stays under
    ``chunk_bytes`` (default DEFAULT_CHUNK_BYTES, resolved at call time so
    tests can shrink it). Flat obs only; pads the tail chunk edge-replicated."""
    if chunk_bytes is None:
        chunk_bytes = DEFAULT_CHUNK_BYTES
    n = obs[0].shape[0]
    chunk = max(8192, chunk_bytes // max(row_elems * itemsize, 1))
    chunk = 1 << (chunk.bit_length() - 1)  # round down to a power of two
    if n <= chunk:
        return f(obs)
    nc = math.ceil(n / chunk)
    pad = nc * chunk - n
    obs_p = [jnp.pad(o, (0, pad), mode="edge") for o in obs]
    stacked = jnp.stack([o.reshape(nc, chunk) for o in obs_p], axis=1)
    out = jax.lax.map(lambda ob: f(tuple(ob)), stacked)
    return out.reshape(-1)[:n]
