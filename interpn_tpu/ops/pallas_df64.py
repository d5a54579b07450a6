"""Double-float (compensated f32) contraction engine for f64 on TPU.

TPU has no native f64: XLA emulates it as float-float, and emulated
matmuls are ~400x slower than f32, so the f64 story was previously
gather-only (8.5 Mq/s linear / 1.1 Mq/s cubic on a 20^3 grid — bound by
the ~130M elem/s gather rate times the stencil size). This engine is the
SURVEY §7 "compensated f32 arithmetic" hard-part idea, realized:

* The cell locate and the per-axis stencil weights are computed OUTSIDE
  the kernel in XLA f64 (cheap: O(ndims * footprint) per query, exact,
  and shared with the factorized engine's basis-weight extraction). Both
  grid kinds reduce to the same kernel inputs: per-axis int32 locations
  plus per-axis weight vectors, split into exact f32 hi/lo pairs.
* The value table splits once into f32 hi/lo pairs (exact: lo = f64(v) -
  f64(hi) rounds to f32 with error ~2^-48 of v).
* The kernel evaluates the factorized contraction entirely in DOUBLE-FLOAT
  arithmetic on the VPU: Dekker/Veltkamp TwoProd (no FMA assumed) and
  Knuth TwoSum, accumulating (hi, lo) planes. The MXU is useless here —
  its accumulator is f32 (~2^-24), while double-float carries ~2^-48.
* The result returns as an (hi, lo) pair and is recombined in XLA f64.

Accuracy: ~2^-47 relative of the stencil-term magnitudes (measured ~1e-13
vs the f64 gather tree — the SURVEY target). Cost scales with prod(dims)
like every factorized engine, so this serves the reference's
benchmark-sized grids; huge grids stay on the f64 gather path.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .factorized import (
    _basis_weights_cubic_regular,
    _basis_weights_cubic_rectilinear,
)
from .locate import (
    locate_regular_cubic,
    locate_regular_linear,
    locate_rectilinear_cubic,
    locate_rectilinear_linear,
)

_I32 = jnp.int32
_F32 = jnp.float32

_MAX_TQ = 512
_MIN_TQ = 128
_TILE_BYTES = 2 * 1024 * 1024
# VMEM ceiling on the split value table (hi+lo f32 = 8 bytes/cell).
_MAX_VALS_BYTES = 2 * 1024 * 1024


def max_grid(method: str, ndims: int) -> int:
    """Grid-size crossover vs the f64 gather path, from v5e measurements:
    this engine runs at ~1.3e5/prod(dims) Mq/s (VPU double-float madds
    scale with the table), the gather path at roughly 60/2^N (linear) or
    60/4^N (cubic) Mq/s (stencil-count-bound). Equal at
    prod ~= 2048 * footprint^ndims, capped by the VMEM table budget."""
    footprint = 2 if method == "linear" else 4
    return min(2048 * footprint**ndims, _MAX_VALS_BYTES // 8)


def supported(dims, method: str) -> bool:
    if method not in ("linear", "cubic"):
        return False
    if len(dims) < 2 or len(dims) > 8:
        return False
    # The kernel statically unrolls d_last rank-1 double-float updates over
    # (lead, tile) planes; Mosaic compile time explodes past ~2k lead rows
    # (a 20^4 grid, lead 8000, did not compile within 9 minutes). Verified
    # shapes (3D 20^3, 2D) compile in seconds.
    if math.prod(dims[:-1]) > 2048:
        return False
    return math.prod(dims) <= max_grid(method, len(dims)) and dims[-1] >= 2


# ---------------------------------------------------------------------------
# double-float primitives (branchless, FMA-free, exact IEEE f32 ops)
# ---------------------------------------------------------------------------


def _two_sum(a, b):
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def _veltkamp(a):
    # f32 has 24 mantissa bits -> split factor 2^12 + 1
    c = _F32(4097.0) * a
    hi = c - (c - a)
    return hi, a - hi


def _two_prod(a, b):
    p = a * b
    ahi, alo = _veltkamp(a)
    bhi, blo = _veltkamp(b)
    err = ((ahi * bhi - p) + ahi * blo + alo * bhi) + alo * blo
    return p, err


def _df_norm(h, e):
    s = h + e
    return s, e - (s - h)


def _df_add(xh, xl, yh, yl):
    sh, se = _two_sum(xh, yh)
    return _df_norm(sh, se + (xl + yl))


def _df_mul(xh, xl, yh, yl):
    ph, pe = _two_prod(xh, yh)
    return _df_norm(ph, pe + (xh * yl + xl * yh))


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------


def _tile_q(lead: int) -> int:
    tq = _TILE_BYTES // max(lead * 8, 1)
    tq = 1 << max(tq.bit_length() - 1, 0)
    return max(_MIN_TQ, min(_MAX_TQ, tq))


def _sel_pair(wh_ref, wl_ref, row0: int, nb: int, loc, dim: int, tq: int):
    """Dense (dim, tq) hi/lo weight matrices from nb stencil rows; exact
    placement (selects move values, never round)."""
    iota = jax.lax.broadcasted_iota(_I32, (dim, tq), 0)
    h = jnp.zeros((dim, tq), _F32)
    low = jnp.zeros((dim, tq), _F32)
    for i in range(nb):
        mask = iota == (loc + i)
        h = jnp.where(mask, wh_ref[row0 + i, :].reshape(1, tq), h)
        low = jnp.where(mask, wl_ref[row0 + i, :].reshape(1, tq), low)
    return h, low


def _make_kernel(dims, footprint: int, tq: int):
    ndims = len(dims)
    lead = math.prod(dims[:-1])
    dlast = dims[-1]

    def kernel(locs_ref, wh_ref, wl_ref, vh_ref, vl_ref, oh_ref, ol_ref):
        # locs: (ndims, tq) i32; wh/wl: (ndims*footprint, tq) f32
        # vh/vl: (lead, dlast) f32; out hi/lo: (1, tq)
        wmats = []
        for k in range(ndims):
            loc = locs_ref[k, :].reshape(1, tq)
            wmats.append(
                _sel_pair(wh_ref, wl_ref, k * footprint, footprint, loc,
                          dims[k], tq)
            )

        # Last-axis contraction, double-float rank-1 updates on the VPU.
        wlh, wll = wmats[ndims - 1]
        th = jnp.zeros((lead, tq), _F32)
        tl = jnp.zeros((lead, tq), _F32)
        for k in range(dlast):
            vh = vh_ref[:, k].reshape(lead, 1)
            vl = vl_ref[:, k].reshape(lead, 1)
            ph, plo = _df_mul(vh, vl, wlh[k, :].reshape(1, tq),
                              wll[k, :].reshape(1, tq))
            th, tl = _df_add(th, tl, ph, plo)

        # Tail axes: double-float segment sums, innermost first.
        lead_k = lead
        for k in range(ndims - 2, -1, -1):
            lead_k //= dims[k]
            wh, wl = wmats[k]
            g_h = th.reshape(lead_k, dims[k], tq)
            g_l = tl.reshape(lead_k, dims[k], tq)
            sh = jnp.zeros((max(lead_k, 1), tq), _F32)
            sl = jnp.zeros((max(lead_k, 1), tq), _F32)
            for b in range(dims[k]):
                ph, plo = _df_mul(
                    g_h[:, b, :], g_l[:, b, :],
                    wh[b, :].reshape(1, tq), wl[b, :].reshape(1, tq),
                )
                sh, sl = _df_add(sh, sl, ph, plo)
            th, tl = sh, sl

        oh_ref[0, :] = th.reshape(1, tq)[0, :]
        ol_ref[0, :] = tl.reshape(1, tq)[0, :]

    return kernel


def _split_f64(a64):
    hi = a64.astype(_F32)
    lo = (a64 - hi.astype(a64.dtype)).astype(_F32)
    return hi, lo


@partial(jax.jit, static_argnums=(0, 1))
def _pallas_df64(dims, footprint, locs_mat, wh, wl, vh, vl):
    ndims = len(dims)
    lead = math.prod(dims[:-1])
    tq = _tile_q(lead)
    n = locs_mat.shape[1]
    kernel = _make_kernel(dims, footprint, tq)
    nw = ndims * footprint
    with jax.enable_x64(False):
        oh, ol = pl.pallas_call(
            kernel,
            grid=(n // tq,),
            in_specs=[
                pl.BlockSpec((ndims, tq), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((nw, tq), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((nw, tq), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (lead, dims[-1]), lambda i: (0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (lead, dims[-1]), lambda i: (0, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=(
                pl.BlockSpec((1, tq), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tq), lambda i: (0, i), memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((1, n), _F32),
                jax.ShapeDtypeStruct((1, n), _F32),
            ),
        )(locs_mat, wh, wl, vh, vl)
    return oh, ol


def _axis_weights_f64(dims, starts, steps, grids, obs, method, linearize):
    """Per-axis (loc_i32, [w_f64...]) via the shared locate/basis helpers."""
    ndims = len(dims)
    out = []
    for k in range(ndims):
        if grids is None:
            if method == "linear":
                loc, t = locate_regular_linear(obs[k], starts[k], steps[k], dims[k])
                out.append((loc, [1.0 - t, t]))
            else:
                cl = locate_regular_cubic(obs[k], starts[k], steps[k], dims[k])
                out.append((cl.loc, _basis_weights_cubic_regular(cl, linearize)))
        else:
            if method == "linear":
                loc, x0, x1 = locate_rectilinear_linear(obs[k], grids[k])
                t = (obs[k] - x0) / (x1 - x0)
                out.append((loc, [1.0 - t, t]))
            else:
                cl, gct = locate_rectilinear_cubic(obs[k], grids[k])
                out.append(
                    (cl.loc,
                     _basis_weights_cubic_rectilinear(cl, gct, obs[k], linearize))
                )
    return out


def _eval(dims, starts, steps, grids, vals, obs, method, linearize):
    ndims = len(dims)
    footprint = 2 if method == "linear" else 4
    lead = math.prod(dims[:-1])
    tq = _tile_q(lead)
    n = obs[0].shape[0]
    n_pad = ((n + tq - 1) // tq) * tq

    f64 = vals.dtype
    obs64 = tuple(o.astype(f64) for o in obs)
    per_axis = _axis_weights_f64(dims, starts, steps, grids, obs64,
                                 method, linearize)
    locs = jnp.concatenate(
        [pa[0].reshape(1, n).astype(_I32) for pa in per_axis], axis=0
    )
    w64 = jnp.concatenate(
        [w.reshape(1, n) for pa in per_axis for w in pa[1]], axis=0
    )
    wh, wl = _split_f64(w64)
    pad = n_pad - n
    locs = jnp.pad(locs, ((0, 0), (0, pad)))
    wh = jnp.pad(wh, ((0, 0), (0, pad)))
    wl = jnp.pad(wl, ((0, 0), (0, pad)))
    vh, vl = _split_f64(vals.reshape(lead, dims[-1]))
    oh, ol = _pallas_df64(tuple(dims), footprint, locs, wh, wl, vh, vl)
    return (oh.astype(f64) + ol.astype(f64)).reshape(-1)[:n]


def eval_regular(dims, starts, steps, vals, obs, method, linearize=True):
    """Double-float f64 evaluation on a regular grid."""
    return _eval(tuple(dims), starts, steps, None, vals, obs, method, linearize)


def eval_rectilinear(grids, vals, obs, method, linearize=True):
    """Double-float f64 evaluation on a rectilinear grid."""
    dims = tuple(int(g.shape[0]) for g in grids)
    return _eval(dims, None, None, grids, vals, obs, method, linearize)
