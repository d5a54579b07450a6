"""Fused Pallas kernel, v2: combined trailing-axes MXU contraction.

v1 (`pallas_kernels.py`) contracts only axis 0 on the MXU (K = dims[0] ~ 20,
a 6.5x padding waste against the 128-deep MXU) and builds the rest-axis
weight product elementwise over (tile, rest) — ~8000 VPU ops per query.

v2 contracts the TRAILING axes combined (K = prod of trailing dims, e.g. 400
for a 20^3 grid — no MXU padding waste) and builds the combined weight
matrix as an outer product of per-axis weight vectors laid out
sublane-major: `jnp.repeat` along the SUBLANE axis lowers to a
leading-dims broadcast+collapse (legal in Mosaic, unlike minormost
reshapes), and `pltpu.repeat` tiles. The one remaining leading axis reduces
with a short multiply-sum. Zero HBM intermediates.

Supported: 2-3D regular grids, f32 (the flagship benchmark family); other
configurations use the XLA paths. Same locate/saturation/basis-weight
semantics as every other path.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_kernels import _cubic_axis_weights, _linear_axis_weights

_I32 = jnp.int32

_MAX_K = 2048
_TILE_BYTES = 2 * 1024 * 1024
_MAX_TQ = 1024
_MIN_TQ = 256


def supported(dims, dtype, method: str) -> bool:
    if dtype != jnp.float32 or method not in ("linear", "cubic"):
        return False
    if len(dims) not in (2, 3):
        return False
    return math.prod(dims[1:] if len(dims) == 3 else dims) <= _MAX_K


def _tile_q(width: int) -> int:
    tq = _TILE_BYTES // max(width * 4, 1)
    tq = 1 << max(tq.bit_length() - 1, 0)
    return max(_MIN_TQ, min(_MAX_TQ, tq))


def _axis_weights(obs_row, start, step, dim, method, linearize):
    if method == "linear":
        return _linear_axis_weights(obs_row, start, step, dim)
    return _cubic_axis_weights(obs_row, start, step, dim, linearize)


def _weight_mat_sublane(tq, dim, loc, ws):
    """(dim, tq) stencil-weight matrix (queries on lanes)."""
    iota = jax.lax.broadcasted_iota(_I32, (dim, tq), 0)
    w = jnp.zeros((dim, tq), jnp.float32)
    for i, wi in enumerate(ws):
        w = w + jnp.where(iota == loc.reshape(1, tq) + i, wi.reshape(1, tq), 0.0)
    return w


def _weight_mat_lane(tq, dim, loc, ws):
    """(tq, dim) stencil-weight matrix (queries on sublanes)."""
    iota = jax.lax.broadcasted_iota(_I32, (tq, dim), 1)
    w = jnp.zeros((tq, dim), jnp.float32)
    for i, wi in enumerate(ws):
        w = w + jnp.where(iota == loc.reshape(tq, 1) + i, wi.reshape(tq, 1), 0.0)
    return w


def _make_kernel(dims, method: str, linearize: bool, tq: int):
    ndims = len(dims)
    # Trailing axes fold into the MXU contraction; one leading axis (3D) or
    # none (2D) remains for the final VPU reduction.
    k_axes = dims[1:] if ndims == 3 else dims
    k_size = math.prod(k_axes)
    lead_dim = dims[0] if ndims == 3 else 1

    def kernel(starts_ref, steps_ref, obs_ref, valsT_ref, out_ref):
        # obs_ref: (ndims, tq); valsT_ref: (k_size, lead_dim); out: (1, tq)
        per_axis = []
        for k in range(ndims):
            x = obs_ref[k, :].reshape(1, tq)
            per_axis.append(
                _axis_weights(
                    x, starts_ref[0, k], steps_ref[0, k], dims[k], method, linearize
                )
            )

        # Combined trailing-axes weights, sublane-major (k_size, tq), folded
        # right-to-left: j = a * width + j'.
        off = ndims - len(k_axes)
        loc, ws = per_axis[ndims - 1]
        wk = _weight_mat_sublane(tq, dims[ndims - 1], loc, ws)
        width = dims[ndims - 1]
        for k in range(ndims - 2, off - 1, -1):
            loc, ws = per_axis[k]
            wa = _weight_mat_sublane(tq, dims[k], loc, ws)
            rep = jnp.repeat(wa, width, axis=0)  # leading-dim expand: legal
            til = pltpu.repeat(wk, dims[k], axis=0)  # tiles along sublanes
            width *= dims[k]
            wk = rep * til

        # (tq, lead_dim) = contract K on the MXU (sublane-axis contraction).
        t = jax.lax.dot_general(
            wk,
            valsT_ref[:, :],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

        if ndims == 3:
            loc, ws = per_axis[0]
            w0 = _weight_mat_lane(tq, dims[0], loc, ws)
            out_ref[0, :] = jnp.sum(t * w0, axis=1)
        else:
            out_ref[0, :] = t.reshape(tq)

    return kernel


@partial(jax.jit, static_argnums=(0, 4, 5))
def _pallas_v2(dims, starts, steps, vals, method, linearize, obs_mat):
    ndims = len(dims)
    k_axes = dims[1:] if ndims == 3 else dims
    k_size = math.prod(k_axes)
    lead_dim = dims[0] if ndims == 3 else 1
    tq = _tile_q(k_size)
    n = obs_mat.shape[1]
    kernel = _make_kernel(dims, method, linearize, tq)
    # vals (lead, K) -> transposed (K, lead) once, outside the kernel.
    valsT = vals.reshape(lead_dim, k_size).T if ndims == 3 else vals.reshape(
        k_size, 1
    )
    starts2d = starts.reshape(1, ndims).astype(jnp.float32)
    steps2d = steps.reshape(1, ndims).astype(jnp.float32)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kernel,
            grid=(n // tq,),
            in_specs=[
                pl.BlockSpec((1, ndims), lambda i: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, ndims), lambda i: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((ndims, tq), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (k_size, lead_dim), lambda i: (0, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec((1, tq), lambda i: (0, i), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
        )(starts2d, steps2d, obs_mat, valsT)
    return out.reshape(n)


def eval_regular(dims, starts, steps, vals, obs, method: str, linearize: bool):
    """v2 fused Pallas evaluation on a regular grid (2-3D, f32)."""
    n = obs[0].shape[0]
    k_axes = dims[1:] if len(dims) == 3 else dims
    tq = _tile_q(math.prod(k_axes))
    n_pad = ((n + tq - 1) // tq) * tq
    obs_mat = jnp.stack(
        [jnp.pad(o.astype(jnp.float32), (0, n_pad - n), mode="edge") for o in obs]
    )
    out = _pallas_v2(
        tuple(dims), starts, steps, vals, method, bool(linearize), obs_mat
    )
    return out[:n]
