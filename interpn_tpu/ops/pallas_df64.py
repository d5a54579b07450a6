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

Two kernel layouts cover every supported shape (round 3): grids whose
leading block fits the static-unroll budget run the flat kernel; larger
4-8D grids run a fori_loop over flattened leading-axis slabs (the same
trailing-block idea as pallas_v3's axis grouping, restructured for VPU
double-float — see _make_kernel_looped). The kernel measures at ~VPU peak
(4 ALUs x 8x128 lanes), so the arithmetic is organized to minimize
(m, tq)-plane ops per table cell (_df_madd: 21 vs the naive 27).
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


_FOOTPRINT = {"linear": 2, "cubic": 4, "bspline3": 4, "bspline5": 6}


def max_grid(method: str, ndims: int) -> int:
    """Grid-size crossover vs the f64 gather path, from v5e measurements:
    this engine runs at ~1.3e5/prod(dims) Mq/s (VPU double-float madds
    scale with the table), the gather path at roughly 60/2^N (linear) or
    60/4^N (cubic) Mq/s (stencil-count-bound). Equal at
    prod ~= 2048 * footprint^ndims, capped by the VMEM table budget.
    The B-spline gather tree pays the same (k+1)^N stencil, so its
    crossover uses the same formula with footprint k+1."""
    footprint = _FOOTPRINT[method]
    return min(2048 * footprint**ndims, _MAX_VALS_BYTES // 8)


# Full-static-unroll ceiling: the flat kernel unrolls d_last rank-1
# double-float updates over (lead, tile) planes, and Mosaic compile time
# explodes past ~2k lead rows (a 20^4 grid, lead 8000, did not compile
# within 9 minutes). Verified shapes (3D 20^3, 2D) compile in seconds.
_MAX_UNROLL_LEAD = 2048
# Looped kernel (lead > _MAX_UNROLL_LEAD): a fori_loop walks flattened
# leading-axis slabs; each iteration statically contracts one slab of at
# most this many rows, so body code size stays in flat-3D territory.
_MAX_STATIC_LEAD = 512
# Loop-trip ceiling: pathological shapes (one huge axis over a tiny slab)
# would run thousands of near-empty iterations; refuse those to gather.
_MAX_SLABS = 1024


def _choose_suffix(dims) -> tuple[int, int, int]:
    """(s, lead_s, n_slabs): the largest trailing-axis count s whose middle
    axes dims[n-s:n-1] fit the per-iteration static budget. The remaining
    leading axes are walked by the fori_loop (VERDICT r2 #1: the grouping
    idea from pallas_v3 applied to the double-float engine — here the
    trailing block is contracted statically per slab and the leading block
    becomes loop trips instead of unrolled plane rows)."""
    ndims = len(dims)
    s = 1
    while s < ndims and math.prod(dims[ndims - (s + 1): ndims - 1]) <= _MAX_STATIC_LEAD:
        s += 1
    lead_s = math.prod(dims[ndims - s: ndims - 1])
    return s, lead_s, math.prod(dims[: ndims - s])


def supported(dims, method: str) -> bool:
    if method not in _FOOTPRINT:
        return False
    if len(dims) < 2 or len(dims) > 8:
        return False
    if dims[-1] > 1024:
        # the last-axis contraction is a static unroll of rank-1
        # double-float updates in BOTH kernels, so a long last axis
        # recreates the Mosaic compile blowup _MAX_UNROLL_LEAD exists to
        # prevent (e.g. (4, 4, 8192) passes every volume cap). Validated
        # shapes top out at dims[-1] = 100; gather serves the rest.
        return False
    if math.prod(dims[:-1]) > _MAX_UNROLL_LEAD:
        # looped kernel: bound the trip count (see _MAX_SLABS)
        if _choose_suffix(dims)[2] > _MAX_SLABS:
            return False
    return math.prod(dims) <= max_grid(method, len(dims)) and dims[-1] >= 2


# ---------------------------------------------------------------------------
# double-float primitives (branchless, FMA-free, exact IEEE f32 ops)
# ---------------------------------------------------------------------------


def _round_mul(a, b):
    """fl(a*b): the correctly-rounded product, robust to FMA contraction.

    XLA:CPU's jit compiles with fp-contract=fast at the LLVM TargetMachine
    level — invisible in every dump (HLO, MLIR, and LLVM IR all show plain
    mul/add with no fast-math flags); only instruction selection fuses a
    single-use fmul feeding an fadd/fsub into one vfmadd. HLO fusion
    duplicates cheap producers into each consumer kernel, making the
    product single-use there, so ``p + low`` compiles to fma(a, b, low) —
    a SINGLE rounding where Dekker/Knuth compensation requires the rounded
    p (fuzz seed 58123 round 0: a 1-D quintic with +/-871
    adjacent-cancelling coefficients lost the whole low channel, 2.2e-8
    relative vs the gather tree on CPU; the identical case on TPU hardware
    reads 2.6e-15 — Mosaic compiles these primitives faithfully).

    The fix adds a runtime ``a * 0`` term no pass can fold (a is not
    provably finite): unfused it adds +/-0 (exact identity for every p,
    including -0), and if ISel contracts either product into the add the
    result is fl(a*b +/- 0) = fl(a*b) — exact either way. Gated to the CPU
    backend at trace time so the TPU executable stays byte-identical to
    the hardware-validated one. `a` must be a runtime tensor (a literal
    would constant-fold the zero and reopen the pattern)."""
    p = a * b
    if jax.default_backend() == "cpu":
        p = p + a * _F32(0.0)
    return p


def _two_sum(a, b):
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def _veltkamp(a):
    # f32 has 24 mantissa bits -> split factor 2^12 + 1
    # (_round_mul: a lone fusion-duplicated c feeding c - a would contract
    # to fl(4096*a), degenerating the split to (a, 0) — see its docstring)
    c = _round_mul(a, _F32(4097.0))
    hi = c - (c - a)
    return hi, a - hi


def _two_prod(a, b):
    p = _round_mul(a, b)
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


def _df_madd(th, tl, ah, al, bh, bl):
    """(th, tl) += (ah, al) * (bh, bl), optimized for the contraction loops.

    Round-3 plane-op diet (the kernel measures at ~VPU peak, so throughput
    is exactly proportional to the per-cell op count): the Veltkamp splits
    run on the BROADCAST factors (columns/rows — sub-plane cost), the
    product error assembles in 9 plane ops, the cross terms in 3, the
    product pair normalizes once (3), and the accumulation is a deferred
    two_sum (the final f64 recombine outside the kernel makes per-step
    ACCUMULATOR renorm unnecessary). 24 (m, tq)-plane ops per call vs 27
    for _df_mul + _df_add.

    Two orderings here are load-bearing (both measured as parity breaks):
    * Dekker's left-to-right error association — each partial sum is
      exactly representable only in this order (regrouping: ~4e-9).
    * The PRODUCT normalization before accumulation — it funnels `low`
      into the hi channel, where the two_sum captures it exactly; feeding
      raw (p, low) into deferred accumulation loses the low mass under
      multi-axis extrapolation cancellation (~8e-7 at a fuzz-found
      dims=(2,3,4) deep-negative-t point; the round-2 fuzzer caught it)."""
    ahh, ahl = _veltkamp(ah)
    bhh, bhl = _veltkamp(bh)
    p = _round_mul(ah, bh)
    err = (((ahh * bhh - p) + ahh * bhl) + ahl * bhh) + ahl * bhl
    low = err + (ah * bl + al * bh)
    p, low = _df_norm(p, low)
    s, e = _two_sum(th, p)
    return s, tl + (e + low)


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


def _build_wmats(locs_ref, wh_ref, wl_ref, dims, footprint: int, tq: int):
    """Dense per-axis (d_k, tq) hi/lo stencil-weight matrices."""
    return [
        _sel_pair(
            wh_ref, wl_ref, k * footprint, footprint,
            locs_ref[k, :].reshape(1, tq), dims[k], tq,
        )
        for k in range(len(dims))
    ]


def _contract_slab(vh, vl, wmats, dims, m: int, tq: int):
    """Double-float contraction of one (prod(dims[m:-1]), d_last) slab over
    axes m..ndims-1: rank-1 last-axis updates on the VPU, then middle-axis
    segment sums, innermost first. Returns a (1, tq) hi/lo pair.

    `vh`/`vl` may be VMEM refs (flat kernel, m == 0) or loaded slab arrays
    (looped kernel) — both support the column indexing used here."""
    ndims = len(dims)
    lead_s = max(math.prod(dims[m: ndims - 1]), 1)
    dlast = dims[-1]
    wlh, wll = wmats[ndims - 1]
    th = jnp.zeros((lead_s, tq), _F32)
    tl = jnp.zeros((lead_s, tq), _F32)
    for k in range(dlast):
        vhc = vh[:, k].reshape(lead_s, 1)
        vlc = vl[:, k].reshape(lead_s, 1)
        th, tl = _df_madd(
            th, tl, vhc, vlc,
            wlh[k, :].reshape(1, tq), wll[k, :].reshape(1, tq),
        )
    # One renormalization per stage keeps later dropped lo*lo cross terms
    # below 2^-47 of the result (see _df_madd). It must be the EXACT
    # two_sum, not the Fast2Sum in _df_norm: deferred accumulation under
    # stencil cancellation can leave |tl| > |th|, where Fast2Sum loses
    # ~ulp(tl) (measured: a 4.7e-5 parity break at deep 5D extrapolation).
    th, tl = _two_sum(th, tl)

    lead_k = lead_s
    for k in range(ndims - 2, m - 1, -1):
        lead_k //= dims[k]
        wh, wl = wmats[k]
        g_h = th.reshape(lead_k, dims[k], tq)
        g_l = tl.reshape(lead_k, dims[k], tq)
        sh = jnp.zeros((max(lead_k, 1), tq), _F32)
        sl = jnp.zeros((max(lead_k, 1), tq), _F32)
        for b in range(dims[k]):
            # _df_madd is safe here BECAUSE it normalizes the product pair
            # before the deferred accumulation (see its docstring — the
            # raw-pair form lost ~5e-5 in exactly these amplified tail
            # stages).
            sh, sl = _df_madd(
                sh, sl, g_h[:, b, :], g_l[:, b, :],
                wh[b, :].reshape(1, tq), wl[b, :].reshape(1, tq),
            )
        th, tl = _two_sum(sh, sl)  # exact renorm for the next stage
    return th, tl


def _make_kernel(dims, footprint: int, tq: int):
    """Flat kernel: the whole leading block statically unrolled (lead <=
    _MAX_UNROLL_LEAD)."""

    def kernel(locs_ref, wh_ref, wl_ref, vh_ref, vl_ref, oh_ref, ol_ref):
        # locs: (ndims, tq) i32; wh/wl: (ndims*footprint, tq) f32
        # vh/vl: (lead, dlast) f32; out hi/lo: (1, tq)
        wmats = _build_wmats(locs_ref, wh_ref, wl_ref, dims, footprint, tq)
        th, tl = _contract_slab(vh_ref, vl_ref, wmats, dims, 0, tq)
        oh_ref[0, :] = th.reshape(1, tq)[0, :]
        ol_ref[0, :] = tl.reshape(1, tq)[0, :]

    return kernel


def _make_kernel_looped(dims, footprint: int, tq: int, s: int):
    """Looped kernel for lead > _MAX_UNROLL_LEAD (VERDICT r2 #1).

    The trailing s axes are contracted statically per slab (code size stays
    in flat-3D territory); the leading ndims-s axes become a fori_loop over
    flattened slabs of the (n_slabs, lead_s, d_last)-shaped value table.
    Each iteration contracts its slab, multiplies by the leading-axis
    stencil weights at the slab's decoded multi-index (one-hot select-sums
    from the dense weight matrices — no per-lane gather, CLAUDE.md), and
    double-float accumulates. Total per-query work stays ~prod(dims)
    multiply-adds, the same as the flat kernel; only the unroll structure
    changes. Reference capability matched: f64 cubic 4-8D on device
    (`src/multicubic/regular_recursive.rs:205-466`)."""
    ndims = len(dims)
    m = ndims - s
    n_slabs = math.prod(dims[:m])

    def kernel(locs_ref, wh_ref, wl_ref, vh_ref, vl_ref, oh_ref, ol_ref):
        # vh/vl: (n_slabs, lead_s, dlast) f32
        wmats = _build_wmats(locs_ref, wh_ref, wl_ref, dims, footprint, tq)

        def _sel_row(k, i_k):
            """This slab's stencil weight on leading axis k: a one-hot
            select-sum over the dense (d_k, tq) matrices (no per-lane
            gather — CLAUDE.md)."""
            w_h, w_l = wmats[k]
            iota = jax.lax.broadcasted_iota(_I32, (dims[k], tq), 0)
            mask = iota == i_k
            rh = jnp.sum(jnp.where(mask, w_h, 0.0), axis=0, keepdims=True)
            rl = jnp.sum(jnp.where(mask, w_l, 0.0), axis=0, keepdims=True)
            return rh, rl

        def body(j, carry):
            ah, al = carry
            vh = vh_ref[j]
            vl = vl_ref[j]
            ch, cl = _contract_slab(vh, vl, wmats, dims, m, tq)
            # leading-axis weights at this slab's multi-index, innermost
            # leading axis decoded first (C-order flattening); axes 1..m-1
            # fold into the slab value, axis 0 rides the fused accumulate —
            # the same op sequence as the flat kernel's axis-0 tail stage,
            # so m == 1 shapes match the flat kernel bitwise.
            idx = j
            for k in range(m - 1, 0, -1):
                i_k = jax.lax.rem(idx, dims[k])
                idx = jax.lax.div(idx, dims[k])
                ch, cl = _df_mul(ch, cl, *_sel_row(k, i_k))
            # normalized product + accumulate, like the flat kernel's tail
            # stages (slab results carry the same amplified-magnitude
            # hazard under extrapolation as tail partials — see the tail
            # loop's comment; m == 1 shapes match the flat kernel bitwise)
            ph, plo = _df_mul(ch, cl, *_sel_row(0, idx))
            return _df_add(ah, al, ph, plo)

        z = jnp.zeros((1, tq), _F32)
        ah, al = jax.lax.fori_loop(0, n_slabs, body, (z, z))
        oh_ref[0, :] = ah[0, :]
        ol_ref[0, :] = al[0, :]

    return kernel


def _split_f64(a64):
    hi = a64.astype(_F32)
    lo = (a64 - hi.astype(a64.dtype)).astype(_F32)
    return hi, lo


@partial(jax.jit, static_argnums=(1, 2))
def _split_jit(vals, lead: int, dlast: int):
    return _split_f64(vals.reshape(lead, dlast))


# cached per-table hi/lo split: the table never changes for persistent
# callers, and eager re-splitting cost ~4 device dispatches per eval
# (same pattern as pallas_i8's prep cache — content hash for host numpy,
# identity for device arrays, nothing cached under an active trace)
_SPLIT_CACHE: dict = {}
_SPLIT_ORDER: list = []
_SPLIT_MAX = 16


def _table_split(vals, lead: int, dlast: int):
    if isinstance(vals, jax.core.Tracer):
        return _split_f64(vals.reshape(lead, dlast))
    from .pallas_i8 import _cache_key, _trace_clean

    if not _trace_clean():
        return _split_f64(vals.reshape(lead, dlast))
    key, guard = _cache_key(vals, (lead, dlast))
    hit = _SPLIT_CACHE.get(key)
    if hit is not None and (guard is None or hit[0] is guard):
        return hit[1]
    pair = _split_jit(vals, lead, dlast)
    _SPLIT_CACHE[key] = (vals, pair)
    _SPLIT_ORDER.append(key)
    while len(_SPLIT_ORDER) > _SPLIT_MAX:
        _SPLIT_CACHE.pop(_SPLIT_ORDER.pop(0), None)
    return pair


def _tq_for(dims) -> int:
    """Query-tile width: sized from the largest per-iteration plane the
    kernel actually holds (the full lead for the flat kernel, one slab for
    the looped kernel). The looped path uses a halved byte budget: its
    3D table ref and loop temporaries ride on top of the planes, and a
    512x512 slab/tile combination faulted the device under a timing scan
    (VMEM pressure) while 512x256 runs clean. Per-query arithmetic cost is
    tq-independent (plane ops and weight builds both amortize per tile),
    so the smaller tile costs only grid-loop overhead."""
    lead = math.prod(dims[:-1])
    if lead <= _MAX_UNROLL_LEAD:
        return _tile_q(lead)
    lead_s = _choose_suffix(dims)[1]
    tq = (_TILE_BYTES // 2) // max(lead_s * 8, 1)
    tq = 1 << max(tq.bit_length() - 1, 0)
    return max(_MIN_TQ, min(_MAX_TQ, tq))


@partial(jax.jit, static_argnums=(0, 1))
def _pallas_df64(dims, footprint, locs_mat, wh, wl, vh, vl):
    ndims = len(dims)
    lead = math.prod(dims[:-1])
    tq = _tq_for(dims)
    n = locs_mat.shape[1]
    if lead <= _MAX_UNROLL_LEAD:
        kernel = _make_kernel(dims, footprint, tq)
        tshape = (lead, dims[-1])
        tmap = lambda i: (0, 0)
    else:
        s, lead_s, n_slabs = _choose_suffix(dims)
        kernel = _make_kernel_looped(dims, footprint, tq, s)
        tshape = (n_slabs, lead_s, dims[-1])
        tmap = lambda i: (0, 0, 0)
        vh = vh.reshape(tshape)
        vl = vl.reshape(tshape)
    nw = ndims * footprint
    # Scoped-VMEM headroom, unconditional: Mosaic's stack accounting for
    # the unrolled double-float chains keeps tens of (rows, tq) f32 planes
    # live (a 12^5 looped config measured 20.5 MB against the 16 MB
    # default — and a static estimate of "live" planes undercounts what
    # the compiler actually reserves). The limit is scoped accounting, not
    # an allocation; v5e has the physical VMEM.
    params = {
        "compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        )
    }
    with jax.enable_x64(False):
        oh, ol = pl.pallas_call(
            kernel,
            grid=(n // tq,),
            **params,
            in_specs=[
                pl.BlockSpec((ndims, tq), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((nw, tq), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((nw, tq), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec(tshape, tmap, memory_space=pltpu.VMEM),
                pl.BlockSpec(tshape, tmap, memory_space=pltpu.VMEM),
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


@partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _weights_jit(dims, method, linearize, n_pad, starts, steps, grids, obs):
    """One fused program for the per-axis locate + basis-weight extraction
    + concatenation + hi/lo split + padding. Previously these ran as ~10
    eager device ops — at this environment's ~25 ms relay dispatch that
    was 4x the whole warm eval (and real deployments still pay ~10
    dispatches of latency). `grids` is () for regular grids."""
    f64 = obs[0].dtype if obs[0].dtype == jnp.float64 else jnp.float64
    n = obs[0].shape[0]
    obs64 = tuple(o.astype(f64) for o in obs)
    per_axis = _axis_weights_f64(
        dims, starts, steps, grids if grids else None, obs64, method, linearize
    )
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
    # per-axis stencil-weight sums in f64 (the i8 engine's exact
    # global-center restoration; cheap to carry for both engines)
    wsum = None
    for pa in per_axis:
        s = sum(pa[1])
        wsum = s if wsum is None else wsum * s
    return locs, wh, wl, wsum


def _eval(dims, starts, steps, grids, vals, obs, method, linearize):
    footprint = 2 if method == "linear" else 4
    lead = math.prod(dims[:-1])
    tq = _tq_for(dims)
    n = obs[0].shape[0]
    n_pad = ((n + tq - 1) // tq) * tq

    f64 = vals.dtype
    ndims = len(dims)
    locs, wh, wl, _ = _weights_jit(
        tuple(dims), method, bool(linearize), n_pad,
        starts if starts is not None else jnp.zeros(ndims),
        steps if steps is not None else jnp.ones(ndims),
        tuple(grids) if grids is not None else (), obs,
    )
    vh, vl = _table_split(vals, lead, dims[-1])
    oh, ol = _pallas_df64(tuple(dims), footprint, locs, wh, wl, vh, vl)
    return (oh.astype(f64) + ol.astype(f64)).reshape(-1)[:n]


def eval_bspline(knots, coeffs, obs, k: int):
    """Double-float f64 evaluation of a degree-k tensor-product B-spline.

    Same engine as the cubic family: spans + the k+1 Cox-de Boor weights
    per axis compute in XLA f64 (`ops.bspline.spline_locs_weights`), split
    into exact f32 hi/lo pairs, and the generic (locs, weights, footprint)
    double-float kernel contracts them against the hi/lo-split coefficient
    table. Accuracy class ~2^-47 of the stencil-term magnitudes, like the
    linear/cubic routes."""
    from .bspline import spline_locs_weights

    dims = tuple(int(t.shape[0]) - k - 1 for t in knots)
    footprint = k + 1
    lead = math.prod(dims[:-1])
    tq = _tq_for(dims)
    n = obs[0].shape[0]
    n_pad = ((n + tq - 1) // tq) * tq
    f64 = coeffs.dtype

    per_axis = spline_locs_weights(
        [jnp.asarray(t, jnp.float64) for t in knots],
        [o.astype(jnp.float64) for o in obs],
        k,
    )
    locs = jnp.concatenate(
        [loc.reshape(1, n).astype(_I32) for loc, _ in per_axis], axis=0
    )
    w64 = jnp.concatenate(
        [w.reshape(1, n) for _, ws in per_axis for w in ws], axis=0
    )
    wh, wl = _split_f64(w64)
    pad = n_pad - n
    locs = jnp.pad(locs, ((0, 0), (0, pad)))
    wh = jnp.pad(wh, ((0, 0), (0, pad)))
    wl = jnp.pad(wl, ((0, 0), (0, pad)))
    vh, vl = _table_split(coeffs, lead, dims[-1])
    oh, ol = _pallas_df64(tuple(dims), footprint, locs, wh, wl, vh, vl)
    return (oh.astype(f64) + ol.astype(f64)).reshape(-1)[:n]


def eval_regular(dims, starts, steps, vals, obs, method, linearize=True):
    """Double-float f64 evaluation on a regular grid."""
    return _eval(tuple(dims), starts, steps, None, vals, obs, method, linearize)


def eval_rectilinear(grids, vals, obs, method, linearize=True):
    """Double-float f64 evaluation on a rectilinear grid."""
    dims = tuple(int(g.shape[0]) for g in grids)
    return _eval(dims, None, None, grids, vals, obs, method, linearize)
