"""Fused Pallas kernel, v3: last-axis MXU contraction + segment-sum tail.

Why v1/v2 lost to the XLA factorized path (measured, see docs/perf.md):
both built DENSE (tile, rest)-shaped weight matrices for the tail axes —
~rest VPU ops per query per axis just to place 2-4 stencil weights — and ran
the MXU stage as a 6-pass HIGHEST matmul with both operands rounded per
call. v3 removes both costs:

* The value table is reshaped to (rest, d_last) and contracts with the
  last-axis weight matrix W_last (d_last, tq) on the MXU. For f32 accuracy
  at one-pass speed the CONSTANT table is pre-split into bf16 hi/lo parts
  once outside the kernel, the per-call weights are split in-kernel (cheap
  VPU), and the product is assembled from one-pass bf16 matmuls:

      T = Vhi@Whi + (Vhi@Wlo + Vlo@Whi [+ Vlo@Wlo])

  3 passes reproduce jax's HIGH (~2^-16 relative), 4 passes give the full
  bf16x2 product (~2^-17, the split representation error); both beat the
  factorized path's HBM-bound HIGHEST einsum on wall clock.

* The remaining axes reduce by SEGMENT SUM: T (lead*d_k, tq) is multiplied
  by the (d_k, tq) weight matrix tiled along sublanes (pltpu.repeat) and
  reshaped (lead, d_k, tq) -> sum(axis=1) — leading-axis reshapes are legal
  in Mosaic, and the per-axis cost is O(lead*d_k) multiply-adds per query
  instead of O(rest) selects. Only the tiny per-axis (d_k, tq) matrices are
  ever built densely.

* AXIS GROUPING: for higher-dimensional grids the trailing `group` axes are
  folded into the MXU contraction (the combined weight matrix is built as a
  repeat x tile product of the per-axis matrices), sizing K toward the
  MXU's 128-deep sweet spot and shrinking the tail: a 20^4 grid contracts
  as (400, 400) x (400, tq) instead of (8000, 20) x (20, tq). The group is
  chosen at trace time by a padded-block cost model (_choose_group).

Everything per tile lives in VMEM: HBM traffic is obs in + out out
(4*(ndims+1) bytes/query). Cell location, saturation handling and the cubic
basis weights are the same branchless constructions as `ops/locate.py` /
`ops/cubic.py` (reference semantics: `src/multilinear/regular.rs:413-425`,
`src/multicubic/regular.rs:431-469,472-623`), so results match the other
engines modulo FP association order.

Supported: regular grids, f32, 2-8D, value table small enough for VMEM.
The dispatcher (ops/dispatch.py) routes eligible TPU traces here.
"""

from __future__ import annotations

import math
import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_I32 = jnp.int32

# VMEM budget for the (rest, tq) contraction tile; the value table (split
# into two bf16 copies) and the obs/out tiles ride on top.
_TILE_BYTES = 4 * 1024 * 1024
_MAX_TQ = 1024
# Floor of 256: a 128-lane tile gives each MXU pass a single N-block and
# pipelines poorly (measured +8% at 100^3 going 128 -> 256; 512 regresses
# by VMEM pressure there).
_MIN_TQ = 256
# Largest value table kept resident in VMEM (f32 bytes; the hi+lo bf16
# copies cost the same total). 100^3 f32 = 4 MB qualifies — verified on
# v5e hardware with the raised scoped-VMEM limit below; the whole
# large-grid story on TPU is keeping the table out of HBM.
_MAX_VALS_BYTES = 4 * 1024 * 1024 + 64 * 1024
# Widest combined trailing-axes weight matrix (K) worth building.
_MAX_GROUP_K = 2048

# Tuning knobs (module-level so benches/exp_tune.py can A/B them on
# hardware; clear the jit caches after changing one). Measured on v5e
# (benches/exp_tune.py, 2026-08): query tiles of 2048, dimension_semantics
# arbitrary/parallel, and bounds-check elision all move the 3D/4D/100^3
# configs by <= 2% — the MXU stage runs at ~89% of its padded-block roof
# already, so the defaults stay conservative.
_DIM_SEMANTICS: tuple | None = None
_DISABLE_BOUNDS = False


def _compiler_params(need: int):
    """CompilerParams for one pallas_call given its VMEM footprint estimate.

    Large tables + the (lead, tq) contraction tile can exceed the default
    16 MB scoped-VMEM budget (a 100^3 exact-mode table alone is 5 MB); v5e
    has more physical VMEM than the default scoped limit, so raise it when
    the configuration needs it."""
    kw = {}
    if need > 12 * 1024 * 1024:
        kw["vmem_limit_bytes"] = min(2 * need, 96 * 1024 * 1024)
    if _DIM_SEMANTICS is not None:
        kw["dimension_semantics"] = _DIM_SEMANTICS
    if _DISABLE_BOUNDS:
        kw["disable_bounds_checks"] = True
    if not kw:
        return {}
    return {"compiler_params": pltpu.CompilerParams(**kw)}


def _hermite(t, y0, dy, k0, k1):
    a = k0 - dy
    b = -k1 + dy
    c1 = dy + a
    c2 = b - (a + a)
    c3 = a - b
    return y0 + t * (c1 + t * (c2 + t * c3))


def _locate_linear(x, start, step, dim):
    floc = jnp.floor((x - start) / step)
    loc = jnp.clip(floc, 0.0, float(max(dim - 2, 0))).astype(_I32)
    t = (x - (start + step * loc.astype(x.dtype))) / step
    return loc, t


def _linear_axis_weights(x, start, step, dim):
    """(loc, [w0, w1]) stencil weights for one axis, linear method."""
    loc, t = _locate_linear(x, start, step, dim)
    return loc, [1.0 - t, t]


def _cubic_axis_weights(x, start, step, dim, linearize: bool):
    """(loc, [w0..w3]) stencil weights for one axis, cubic method.

    Basis extraction from the saturation-aware node function (linearity in
    the stencil values), identical math to `ops/cubic._axis_reduce_regular`.
    """
    dtype = x.dtype
    floc = jnp.floor((x - start) / step)
    iloc = floc - 1.0
    dimmax = float(max(dim - 4, 0))
    loc = jnp.clip(iloc, 0.0, dimmax).astype(_I32)
    low = iloc <= -1.0
    high = (~low) & (iloc >= float(dim - 3))
    outside = (iloc < -1.0) | ((~low) & (iloc > float(dim - 3)))
    t = (x - (start + step * (loc + 1).astype(dtype))) / step

    tt = jnp.where(low, -t, jnp.where(high, t - 1.0, t))
    ws = []
    for i in range(4):
        v = [jnp.float32(1.0) if j == i else jnp.float32(0.0) for j in range(4)]
        v0, v1, v2, v3 = v
        y0 = jnp.where(high, v2, v1)
        dy = jnp.where(low, v0 - v1, jnp.where(high, v3 - v2, v2 - v1))
        half02 = (v2 - v0) * 0.5
        half13 = (v3 - v1) * 0.5
        k0 = jnp.where(low, -half02, jnp.where(high, half13, half02))
        k1 = jnp.where(low | high, 2.0 * dy - k0, half13)
        w = _hermite(tt, y0, dy, k0, k1)
        if linearize:
            lin = jnp.where(low, v0, v3) + k1 * (tt - 1.0)
            w = jnp.where(outside, lin, w)
        # Exact node reproduction (same contract as every other engine,
        # ops/cubic._axis_reduce_regular): at tt == 0/1 the weight vector is
        # the unit basis of the corresponding stencil entry, so grid nodes
        # reproduce bit-for-bit regardless of rounding in the slope terms.
        # This is a DELIBERATE fork of the ops/cubic node math (the kernel
        # wants weight planes, not reduced values; deriving them via
        # basis-vector evaluation like ops/factorized costs 4x the node
        # evaluations per tile) — any drift between the copies trips the
        # cross-engine bit-exact node tests (tests/test_pallas_v3.py).
        w0_node = y0  # tt == 0: y0 = v1 (none/low) or v2 (high)
        w1_node = jnp.where(low, v0, jnp.where(high, v3, v2))  # tt == 1
        w = jnp.where(tt == 0.0, w0_node, jnp.where(tt == 1.0, w1_node, w))
        ws.append(w)
    return loc, ws


def supported(dims, dtype, method: str) -> bool:
    if dtype != jnp.float32 or method not in (
        "linear", "cubic", "nearest", "bspline3", "bspline5"
    ):
        return False
    if len(dims) < 2 or len(dims) > 8:
        return False
    if math.prod(dims) * 4 > _MAX_VALS_BYTES:
        return False
    if sum(dims) > 8192:
        # the kernel materializes dense (dim_k, tq) weight + iota planes
        # per axis in VMEM; a skewed grid that passes the table-bytes
        # check (e.g. (2, 393216): 3 MB table, ~400 MB of planes at the
        # _MIN_TQ floor) would fail to COMPILE instead of falling back.
        # Realistic grids sum to a few hundred; gather serves the rest.
        return False
    # the MXU stage needs a real lane axis on the table
    return dims[-1] >= 2


def _tile_q(lead: int) -> int:
    tq = _TILE_BYTES // max(lead * 4, 1)
    tq = 1 << max(tq.bit_length() - 1, 0)
    return max(_MIN_TQ, min(_MAX_TQ, tq))


def _pad(x: int, m: int = 128) -> int:
    return -(-x // m) * m


def _choose_group(dims, nch: int = 1) -> int:
    """Number of trailing axes folded into the MXU contraction.

    Cost model per query tile: MXU work is the PADDED block volume
    pad(lead) * pad(K) (the systolic array processes ceil(M/128) x
    ceil(K/128) x ceil(N/128) full blocks whatever the true sizes), VPU work
    is the combined-weight build (~K) plus the segment-sum tail (~lead).
    The padding term is what grouping fixes: 20^4 as (8000, 20) pads 8000 ->
    8064 and 20 -> 128 (13x waste); as (400, 400) it pads to (512, 512)
    (1.6x). With `nch` stacked value tables (channels) the table rows —
    and hence the padded M extent and the tail — scale by nch while the
    weight build is shared."""
    ndims = len(dims)
    best_g, best_cost = 1, None
    k = 1
    for g in range(1, ndims):
        k *= dims[ndims - g]
        if k > _MAX_GROUP_K and g > 1:
            break
        lead = math.prod(dims[: ndims - g])
        mxu = _pad(nch * lead) * _pad(k) // 64  # per 2 queries, one-pass rate
        vpu = 16 * (k + nch * lead)  # weight build + tail multiply-adds
        cost = mxu + vpu
        if best_cost is None or cost < best_cost:
            best_g, best_cost = g, cost
    return best_g


def _choose_split(dims, footprint: int, nch: int = 1):
    """Virtual split of the boundary (last lead) axis to cut MXU padding.

    pad(lead) * pad(K) is the real per-pass MXU volume whatever the true
    sizes; a 20^3 grid contracts as (400, 20) -> padded 512 x 128, an 8.2x
    waste. Splitting the boundary axis d_m = sa * ta moves `ta` into the
    trailing contraction: 20^3 becomes lead' = 20*5 = 100, K' = 4*20 = 80 —
    padded 128 x 128. The boundary axis's stencil run (footprint wide, ta >=
    footprint) spans at most TWO virtual outer rows, so its weight matrix is
    EXACTLY rank-2 over (outer, inner): the contraction runs as two passes
    (one per outer row of the run) and sums — rank-1 (one pass) for nearest.

    Returns (group, sa, ta) with sa/ta = None when no split pays >= 1.3x.
    """
    ndims = len(dims)
    group = _choose_group(dims, nch)
    m = ndims - group - 1
    if m < 0:
        return group, None, None
    lead = math.prod(dims[: ndims - group])
    k = math.prod(dims[ndims - group:])
    dm = dims[m]
    base = _pad(nch * lead) * _pad(k)
    npass = 1 if footprint == 1 else 2
    best = (None, None, None)
    for ta in range(max(footprint, 2), dm):
        if dm % ta:
            continue
        sa = dm // ta
        vol = npass * _pad(nch * (lead // dm * sa)) * _pad(ta * k)
        if base / vol >= 1.3 and (best[0] is None or vol < best[0]):
            best = (vol, sa, ta)
    return group, best[1], best[2]


def _nearest_axis_weights(x, start, step, dim):
    """(loc, [1.0]) one-hot selection for one axis (dt <= 0.5 -> lower)."""
    floc = jnp.floor((x - start) / step)
    loc = jnp.clip(floc, 0.0, float(max(dim - 2, 0))).astype(_I32)
    t = (x - (start + step * loc.astype(x.dtype))) / step
    sel = loc + jnp.where(t <= 0.5, 0, 1).astype(_I32)
    return sel, [jnp.ones_like(t)]


def _axis_weights(x, start, step, dim, method, linearize):
    if method == "linear":
        return _linear_axis_weights(x, start, step, dim)
    if method == "nearest":
        return _nearest_axis_weights(x, start, step, dim)
    return _cubic_axis_weights(x, start, step, dim, linearize)


def _split_hi_lo(w, bitcast):
    """Split f32 into bf16 hi + bf16 lo via mantissa masking.

    The obvious split `hi = bf16(w); lo = bf16(w - f32(hi))` is folded to
    lo == 0 by Mosaic (the f32->bf16->f32 round-trip is treated as identity
    on hardware — measured: 3- and 4-pass products collapsed to one-pass
    error). Masking the low 16 mantissa bits keeps every step an exact f32
    operation the compiler cannot elide: hi_f32 is exactly representable in
    bf16 (truncation), and w - hi_f32 is exact (low-bits subtraction).
    """
    u = bitcast(w, jnp.uint32)
    hi_f32 = bitcast(u & jnp.uint32(0xFFFF0000), jnp.float32)
    lo_f32 = w - hi_f32
    return hi_f32.astype(jnp.bfloat16), lo_f32.astype(jnp.bfloat16)


def _weight_mat(tq, dim, loc, ws):
    """(dim, tq) dense stencil weights (queries on lanes)."""
    iota = jax.lax.broadcasted_iota(_I32, (dim, tq), 0)
    w = jnp.zeros((dim, tq), jnp.float32)
    for i, wi in enumerate(ws):
        w = w + jnp.where(iota == loc.reshape(1, tq) + i, wi.reshape(1, tq), 0.0)
    return w


_FOOTPRINT = {
    "linear": 2, "nearest": 1, "cubic": 4,
    # global tensor-product B-splines (ops/bspline.py): k+1 Cox-de Boor
    # weights at the rebased de Boor span — consumed through the
    # precomputed-weights kernel, which is method-agnostic placement +
    # contraction
    "bspline3": 4, "bspline5": 6,
}


def _build_kernel(dims, method: str, linearize: bool, tq: int, passes: int,
                  rect: bool, nch: int = 1):
    """One kernel builder for both grid kinds and both contraction layouts.

    `nch` stacked value tables (channels) evaluate at the same observation
    points in one kernel: the channel axis rides as the OUTERMOST row block
    of the (nch*lead, ksize) table, so the MXU contraction and every tail
    stage see it as extra lead rows sharing one per-query weight build —
    the dominant cost for small grids — and the output is (nch, tq). With
    nch == 1 every expression below reduces to the single-channel kernel
    unchanged (validated on hardware; see scripts/hw_validate.py).

    passes: 3 = drop the lo*lo product, 4 = full bf16x2 product, 6 = single
    f32 dot at Precision.HIGHEST on the unsplit table (the default:
    f32-exact products; also required for `nearest`, whose one-hot weights
    must reproduce grid values bit-for-bit).

    The split modes (3/4) are ROW-CENTERED: every method reproduces
    constants exactly (the per-axis weights sum to 1), so the table rows are
    shifted by their means outside the kernel and the shift is restored as
    c_r * sum(W) in exact f32. The split-product error then scales with the
    LOCAL variation of the data along the grouped axes, not its absolute
    magnitude — a globally-offset table (temperatures ~300 K) costs nothing.

    When _choose_split elects a virtual boundary-axis split, the boundary
    axis's stencil run spans at most two virtual outer rows, so its weight
    matrix is exactly rank-2 over (outer, inner): the contraction runs one
    pass per outer row (rank-1 / one pass for nearest) with the inner
    weights folded into the MXU stage and a one-hot outer selection driving
    the first tail stage.
    """
    ndims = len(dims)
    footprint = _FOOTPRINT[method]
    group, sa, ta = _choose_split(dims, footprint, nch)
    m = ndims - group - 1  # boundary (last lead) axis
    split = sa is not None
    npass = (1 if footprint == 1 else 2) if split else 1
    k_old = math.prod(dims[ndims - group:])
    exact = passes >= 6

    def kernel(*args):
        if rect == "pre":
            # weights computed outside in XLA (see _pallas_v3_pre): the
            # kernel only places and contracts them
            locs_ref, w_ref, *refs = args

            def axw(k):
                loc = locs_ref[k, :].reshape(1, tq)
                ws = [
                    w_ref[k * footprint + j, :].reshape(1, tq)
                    for j in range(footprint)
                ]
                return loc, ws
        elif rect == "knots":
            # tensor-product B-spline: in-kernel span + Cox-de Boor from
            # the VMEM-resident knot columns (dims are coefficient counts;
            # knot column k has dims[k] + K + 1 entries)
            knotsT_ref, shifts_ref, obs_ref, *refs = args
            K = footprint - 1
            use_sel = os.environ.get("INTERPN_TPU_SPLINE_SEL", "0") == "1"

            def axw(k):
                x = obs_ref[k, :].reshape(1, tq)
                tlen = dims[k] + K + 1
                tcol = knotsT_ref[:tlen, k].reshape(tlen, 1)
                sh = None if use_sel else shifts_ref[2 * K * k : 2 * K * (k + 1), :tlen]
                return _bspline_axis_weights(x, tcol, sh, tlen, dims[k], K, tq)
        elif rect:
            gridsT_ref, obs_ref, *refs = args

            def axw(k):
                x = obs_ref[k, :].reshape(1, tq)
                gcol = gridsT_ref[: dims[k], k].reshape(dims[k], 1)
                return _rect_axis_weights(x, gcol, dims[k], method, linearize, tq)
        else:
            starts_ref, steps_ref, obs_ref, *refs = args

            def axw(k):
                x = obs_ref[k, :].reshape(1, tq)
                return _axis_weights(
                    x, starts_ref[0, k], steps_ref[0, k], dims[k], method, linearize
                )

        out_ref = refs[-1]
        per_axis = [axw(k) for k in range(ndims)]

        # Combined trailing-axes weight matrix (k_old, tq), right-to-left:
        # flat trailing index j = i_k * width + j'. The outer product is a
        # broadcast-multiply through a 3D view (leading-axis reshapes are
        # legal in Mosaic) — measured slightly cheaper than the
        # jnp.repeat x pltpu.repeat pair it replaces (benches/exp_ablate.py).
        loc, ws = per_axis[ndims - 1]
        wt = _weight_mat(tq, dims[ndims - 1], loc, ws)
        width = dims[ndims - 1]
        for k in range(ndims - 2, m, -1):
            loc, ws = per_axis[k]
            wa = _weight_mat(tq, dims[k], loc, ws)
            wt = (
                wa.reshape(dims[k], 1, tq) * wt.reshape(1, width, tq)
            ).reshape(dims[k] * width, tq)
            width *= dims[k]

        dot = partial(jnp.dot, preferred_element_type=jnp.float32)

        def mxu(wk):
            if exact:
                return dot(refs[0][:, :], wk, precision=jax.lax.Precision.HIGHEST)
            vhi_ref, vlo_ref, c_ref = refs[0], refs[1], refs[2]
            whi, wlo = _split_hi_lo(wk, pltpu.bitcast)
            t = dot(vhi_ref[:, :], whi)
            t = t + (dot(vhi_ref[:, :], wlo) + dot(vlo_ref[:, :], whi))
            if passes >= 4:
                t = t + dot(vlo_ref[:, :], wlo)
            # restore the row centers: c_r * sum_k W[k, q], exact f32
            return t + c_ref[:, :] * jnp.sum(wk, axis=0, keepdims=True)

        if split:
            # virtual split: run starts at loc_m = a0 * ta + shift
            loc_m, ws_m = per_axis[m]
            a0 = loc_m // ta
            shift = loc_m - a0 * ta
            iota_t = jax.lax.broadcasted_iota(_I32, (ta, tq), 0)
            iota_s = jax.lax.broadcasted_iota(_I32, (sa, tq), 0)
            lead = math.prod(dims[:m])
            # With at most one lead axis left (m <= 1: the 2D/3D shapes and
            # every grouped shape whose boundary axis is axis 1), the
            # virtual-axis one-hot and the axis-0 stencil weights fold into
            # ONE weighted full-sum u = w0 (x) ai per pass — dropping the
            # per-pass reshape-sum and the separate final stage. Adding
            # exact zeros never changes an f32 sum, and at grid nodes the
            # weights are a unit basis, so node bit-exactness is preserved.
            # Measured +5% on the 3D headline (benches/exp_ablate.py).
            merge_tail = m <= 1
            if merge_tail and m == 1:
                loc0, ws0 = per_axis[0]
                w0 = _weight_mat(tq, dims[0], loc0, ws0)
                w0rep = jnp.repeat(w0, sa, axis=0)  # (d0*sa, tq), built once
            acc = None
            for i in range(npass):
                ri = jnp.zeros((ta, tq), jnp.float32)
                for j, wj in enumerate(ws_m):
                    pos = shift + j - i * ta
                    ri = ri + jnp.where(iota_t == pos, wj.reshape(1, tq), 0.0)
                wk = (
                    ri.reshape(ta, 1, tq) * wt.reshape(1, k_old, tq)
                ).reshape(ta * k_old, tq)
                t = mxu(wk)
                # reduce the virtual outer axis with this pass's one-hot row
                ai = jnp.where(iota_s == a0 + i, 1.0, 0.0)
                if merge_tail:
                    u = w0rep * pltpu.repeat(ai, lead, axis=0) if m == 1 else ai
                    if nch > 1:
                        # channel = outermost row block: tile the merged
                        # weights per channel, reduce each block separately
                        ut = pltpu.repeat(u, nch, axis=0)
                        contrib = (t * ut).reshape(
                            nch, u.shape[0], tq
                        ).sum(axis=1)
                    else:
                        contrib = jnp.sum(t * u, axis=0)
                    acc = contrib if acc is None else acc + contrib
                else:
                    leadn = nch * max(lead, 1)
                    t = t * pltpu.repeat(ai, leadn, axis=0)
                    t = t.reshape(leadn, sa, tq).sum(axis=1)
                    acc = t if acc is None else acc + t
            if split and merge_tail:
                if nch > 1:
                    out_ref[:, :] = acc
                else:
                    out_ref[0, :] = acc.reshape(1, tq)[0, :]
                return
            t = acc
            # the loop below divides per-axis extents out of `lead`; fold
            # the channel count in so the repeat/reshape block counts stay
            # correct with channel as the outermost block
            lead = nch * max(lead, 1)
            next_axis = m - 1
        else:
            t = mxu(wt)
            lead = nch * math.prod(dims[: ndims - group])
            next_axis = m

        # Remaining lead axes, innermost first; axis 0 reduces to the output.
        if next_axis < 0:
            if nch > 1:
                out_ref[:, :] = t.reshape(nch, tq)
            else:
                out_ref[0, :] = t.reshape(1, tq)[0, :]
            return
        if next_axis == 1:
            # same merged-tail trick as the split branch: with exactly two
            # lead axes left, their weight outer product reduces t in ONE
            # weighted full-sum instead of a reshape-sum plus a final stage
            loc0, ws0 = per_axis[0]
            w0 = _weight_mat(tq, dims[0], loc0, ws0)
            loc1, ws1 = per_axis[1]
            w1 = _weight_mat(tq, dims[1], loc1, ws1)
            u = (
                w0.reshape(dims[0], 1, tq) * w1.reshape(1, dims[1], tq)
            ).reshape(dims[0] * dims[1], tq)
            if nch > 1:
                ut = pltpu.repeat(u, nch, axis=0)
                out_ref[:, :] = (t * ut).reshape(
                    nch, dims[0] * dims[1], tq
                ).sum(axis=1)
            else:
                out_ref[0, :] = jnp.sum(t * u, axis=0)
            return
        # `lead` includes the channel factor (outermost block), so the
        # per-stage block counts and reshapes below hold for any nch
        for k in range(next_axis, 0, -1):
            lead //= dims[k]
            loc, ws = per_axis[k]
            wm = _weight_mat(tq, dims[k], loc, ws)
            t = t * pltpu.repeat(wm, lead, axis=0)
            t = t.reshape(lead, dims[k], tq).sum(axis=1)
        loc, ws = per_axis[0]
        w0 = _weight_mat(tq, dims[0], loc, ws)
        if nch > 1:
            w0t = pltpu.repeat(w0, nch, axis=0)
            out_ref[:, :] = (t * w0t).reshape(nch, dims[0], tq).sum(axis=1)
        else:
            out_ref[0, :] = jnp.sum(t * w0, axis=0)

    return kernel


def _table_shape(dims, method: str, nch: int = 1):
    """(lead, ksize) ONE channel's table reshapes to, after grouping +
    split. `nch` informs the group/split cost model only; the stacked
    table has nch*lead rows."""
    ndims = len(dims)
    group, sa, ta = _choose_split(dims, _FOOTPRINT[method], nch)
    ksize = math.prod(dims[ndims - group:])
    lead = math.prod(dims[: ndims - group])
    if sa is not None:
        lead = lead // dims[ndims - group - 1] * sa
        ksize = ksize * ta
    return max(lead, 1), ksize


def _tables_and_specs(v2, lead: int, ksize: int, passes: int):
    """VMEM-resident value table(s): one f32 table in exact mode, else two
    bf16 mantissa-split copies of the ROW-CENTERED table plus the centers."""
    table_spec = pl.BlockSpec(
        (lead, ksize), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    if passes >= 6:
        return (v2,), [table_spec]
    c = jnp.mean(v2, axis=1, keepdims=True)
    v2c = v2 - c
    u = jax.lax.bitcast_convert_type(v2c, jnp.uint32)
    vhi_f32 = jax.lax.bitcast_convert_type(u & jnp.uint32(0xFFFF0000), jnp.float32)
    tables = (
        vhi_f32.astype(jnp.bfloat16),
        (v2c - vhi_f32).astype(jnp.bfloat16),
        c,
    )
    specs = [
        table_spec,
        table_spec,
        pl.BlockSpec((lead, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    return tables, specs


@partial(jax.jit, static_argnums=(0, 4, 5, 6))
def _pallas_v3(dims, starts, steps, vals, method, linearize, passes, obs_mat):
    ndims = len(dims)
    lead, ksize = _table_shape(dims, method)
    tq = _tile_q(max(lead, ksize))
    n = obs_mat.shape[1]
    kernel = _build_kernel(dims, method, linearize, tq, passes, rect=False)
    v2 = vals.reshape(lead, ksize).astype(jnp.float32)
    tables, specs = _tables_and_specs(v2, lead, ksize, passes)
    starts2d = starts.reshape(1, ndims).astype(jnp.float32)
    steps2d = steps.reshape(1, ndims).astype(jnp.float32)
    need = (
        lead * _pad(ksize) * 4  # table(s): one f32 or two bf16 copies
        + 3 * lead * tq * 4  # T plus accumulation temporaries
        + _pad(ksize) * tq * 8  # W and its hi/lo splits
    )
    params = _compiler_params(need)
    # x64 mode makes BlockSpec index maps emit i64, which Mosaic cannot
    # legalize; the kernel is pure f32/i32, so trace with x64 off.
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kernel,
            grid=(n // tq,),
            **params,
            in_specs=[
                pl.BlockSpec((1, ndims), lambda i: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, ndims), lambda i: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((ndims, tq), lambda i: (0, i), memory_space=pltpu.VMEM),
                *specs,
            ],
            out_specs=pl.BlockSpec((1, tq), lambda i: (0, i), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
        )(starts2d, steps2d, obs_mat, *tables)
    return out.reshape(n)


def eval_regular(
    dims, starts, steps, vals, obs, method: str, linearize: bool, passes: int = 6
):
    """v3 fused Pallas evaluation on a regular grid (f32, 2-8D).

    The default (passes=6) matches the gather tree to f32 association-order
    noise; passes=4/3 trade ~half the MXU passes for split-bf16 product
    error (see _make_kernel)."""
    if method == "nearest":
        passes = 6  # one-hot selection must reproduce grid values exactly
    n = obs[0].shape[0]
    lead, ksize = _table_shape(tuple(dims), method)
    tq = _tile_q(max(lead, ksize))
    n_pad = ((n + tq - 1) // tq) * tq
    obs_mat = jnp.stack(
        [jnp.pad(o.astype(jnp.float32), (0, n_pad - n), mode="edge") for o in obs]
    )
    out = _pallas_v3(
        tuple(dims), starts, steps, vals, method, bool(linearize), passes, obs_mat
    )
    return out[:n]


# ---------------------------------------------------------------------------
# Rectilinear grids
#
# Same engine; only the per-axis weight construction differs. The bisection
# locate becomes a branchless vectorized count (searchsorted(side='left') ==
# count of grid points < x, `src/multilinear/rectilinear.rs:352-370`), and
# the bracketing grid coordinates are extracted by one-hot select-sums over
# the (d, tile) plane — no per-lane gather needed. The cubic basis weights
# evaluate the SAME saturation-aware node function as the XLA engines
# (`ops.cubic._axis_reduce_rectilinear`) on the four unit basis vectors.
# Grid coordinate arrays ride in VMEM as one (dmax, ndims) f32 array, rows
# past each axis's length padded with +inf (never counted, never selected).
# ---------------------------------------------------------------------------


def _rect_sel(gcol, loc, i, dim: int, tq: int):
    """grid[loc + i] per query: one-hot select-sum over the (dim, tq) plane."""
    iota = jax.lax.broadcasted_iota(_I32, (dim, tq), 0)
    mask = iota == (loc + i)
    return jnp.sum(jnp.where(mask, gcol, 0.0), axis=0, keepdims=True)


def _shifted_knot_rows(knotsT, dims, K: int):
    """(ndims*2K, tmax) f32 operand for the one-hot MXU knot fetch: row
    k*2K + j holds knot column k shifted left by (j - K + 1), zero-filled
    at the ends. The span is clamped to [K, n-1], so span + off always
    lands inside the true knot vector — the zero fill is never selected."""
    rows = []
    for k in range(knotsT.shape[1]):
        col = knotsT[:, k]
        for off in range(-K + 1, K + 1):
            if off > 0:
                rows.append(jnp.pad(col[off:], (0, off)))
            elif off < 0:
                rows.append(jnp.pad(col[:off], (-off, 0)))
            else:
                rows.append(col)
    return jnp.stack(rows)


def _bspline_axis_weights(x, tcol, sh, tlen: int, n: int, K: int, tq: int):
    """(loc, [w_0..w_K]) for one spline axis, built IN-KERNEL.

    x (1, tq) queries, tcol (tlen, 1) the axis's knot column, sh the
    (2K, tlen) pre-shifted zero-padded knot rows (`_shifted_knot_rows`),
    or None to select each offset with a VPU select-sum plane instead
    (INTERPN_TPU_SPLINE_SEL=1, the measured A/B twin; read at TRACE time
    in the kernel builder — flipping it needs a fresh process or distinct
    shapes, see `eval_bspline`). The de Boor
    span is a branch-free count (`sum(t <= x) - 1`, == searchsorted
    side="right" - 1) clamped to [K, n-1] exactly like
    `ops.bspline.spline_locs_weights`; the 2K knot values the Cox-de Boor
    recurrence touches come from ONE MXU contraction of the shifted rows
    against the span one-hot — an exact selection at Precision.HIGHEST
    (each product is value*1.0 or value*0.0; the f32 sum of one value and
    exact zeros is order-independent) — and the recurrence itself runs in
    registers. This keeps the pre-weights route's HBM win (only the query
    streams per axis) while replacing its 2K per-offset (tlen, tq) select
    planes, which dominated for ~100-entry knot columns, with one matmul
    (docs/perf.md "Extension methods")."""
    cnt = jnp.sum((tcol <= x).astype(_I32), axis=0, keepdims=True)
    span = jnp.clip(cnt - 1, K, n - 1)
    if sh is None:
        tk = {
            off: _rect_sel(tcol, span, off, tlen, tq)
            for off in range(-K + 1, K + 1)
        }
    else:
        iota = jax.lax.broadcasted_iota(_I32, (tlen, tq), 0)
        onehot = (iota == span).astype(jnp.float32)
        tk_all = jnp.dot(
            sh,
            onehot,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        tk = {
            off: tk_all[off + K - 1, :].reshape(1, tq)
            for off in range(-K + 1, K + 1)
        }
    N = [jnp.ones_like(x)] + [jnp.zeros_like(x) for _ in range(K)]
    for j in range(1, K + 1):
        saved = jnp.zeros_like(x)
        for r in range(j):
            den = tk[r + 1] - tk[r + 1 - j]
            temp = N[r] / den
            N[r] = saved + (tk[r + 1] - x) * temp
            saved = (x - tk[r + 1 - j]) * temp
        N[j] = saved
    return span - K, N


def _rect_axis_weights(x, gcol, dim: int, method: str, linearize: bool, tq: int):
    """(loc, [w...]) for one rectilinear axis; x (1, tq), gcol (dim, 1)."""
    from .cubic import _axis_reduce_rectilinear

    cnt = jnp.sum((gcol < x).astype(_I32), axis=0, keepdims=True)
    if method in ("linear", "nearest"):
        loc = jnp.clip(cnt - 1, 0, max(dim - 2, 0))
        x0 = _rect_sel(gcol, loc, 0, dim, tq)
        x1 = _rect_sel(gcol, loc, 1, dim, tq)
        t = (x - x0) / (x1 - x0)
        if method == "linear":
            return loc, [1.0 - t, t]
        sel = loc + jnp.where(t <= 0.5, 0, 1).astype(_I32)
        return sel, [jnp.ones_like(t)]

    iloc = cnt - 2
    loc = jnp.clip(iloc, 0, max(dim - 4, 0))
    low = iloc <= -1
    high = (~low) & (iloc >= dim - 3)
    outside = (iloc < -1) | ((~low) & (iloc > dim - 3))
    gct = tuple(_rect_sel(gcol, loc, i, dim, tq) for i in range(4))
    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)
    ws = []
    for i in range(4):
        e = tuple(one if j == i else zero for j in range(4))
        ws.append(
            _axis_reduce_rectilinear(e, x, gct, low, high, outside, linearize)
        )
    return loc, ws


@partial(jax.jit, static_argnums=(0, 4, 5, 6))
def _pallas_v3_rect(dims, gridsT, vals, obs_mat, method, linearize, passes):
    ndims = len(dims)
    lead, ksize = _table_shape(dims, method)
    tq = _tile_q(max(lead, ksize))
    n = obs_mat.shape[1]
    kernel = _build_kernel(dims, method, linearize, tq, passes, rect=True)
    v2 = vals.reshape(lead, ksize).astype(jnp.float32)
    tables, specs = _tables_and_specs(v2, lead, ksize, passes)
    dmax = gridsT.shape[0]
    need = (
        lead * _pad(ksize) * 4
        + 3 * lead * tq * 4
        + _pad(ksize) * tq * 8
    )
    params = _compiler_params(need)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kernel,
            grid=(n // tq,),
            **params,
            in_specs=[
                pl.BlockSpec(
                    (dmax, ndims), lambda i: (0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec((ndims, tq), lambda i: (0, i), memory_space=pltpu.VMEM),
                *specs,
            ],
            out_specs=pl.BlockSpec((1, tq), lambda i: (0, i), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
        )(gridsT.astype(jnp.float32), obs_mat, *tables)
    return out.reshape(n)


def eval_rectilinear(
    grids, vals, obs, method: str, linearize: bool, passes: int = 6
):
    """v3 fused Pallas evaluation on a rectilinear grid (f32, 2-8D)."""
    if method == "nearest":
        passes = 6  # one-hot selection must reproduce grid values exactly
    dims = tuple(int(g.shape[0]) for g in grids)
    ndims = len(dims)
    dmax = max(dims)
    # pad rows past each axis's length with +inf: never < x, never selected
    cols = [
        jnp.pad(
            jnp.asarray(g, jnp.float32), (0, dmax - dims[k]),
            constant_values=jnp.inf,
        )
        for k, g in enumerate(grids)
    ]
    gridsT = jnp.stack(cols, axis=1)  # (dmax, ndims)
    lead, ksize = _table_shape(dims, method)
    tq = _tile_q(max(lead, ksize))
    n = obs[0].shape[0]
    n_pad = ((n + tq - 1) // tq) * tq
    obs_mat = jnp.stack(
        [jnp.pad(o.astype(jnp.float32), (0, n_pad - n), mode="edge") for o in obs]
    )
    out = _pallas_v3_rect(
        dims, gridsT, vals, obs_mat, method, bool(linearize), passes
    )
    return out[:n]


# ---------------------------------------------------------------------------
# Precomputed-weights entry (rectilinear fast path)
#
# The rectilinear in-kernel weight construction pays O(d) counts plus four
# O(d) select-sums per axis per tile; computing the locate + basis weights
# OUTSIDE in XLA (the same searchsorted/basis helpers the factorized and
# df64 engines use) turns that into a fused elementwise pass whose (loc, w)
# outputs stream through HBM — ~(4 + 4*footprint) bytes/query, negligible at
# these rates — and the kernel reduces to placement + contraction, identical
# to the regular-grid path's cost.
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnums=(0, 1, 4))
def _pallas_v3_pre(dims, method, locs_mat, w_mat, passes, vals):
    ndims = len(dims)
    footprint = _FOOTPRINT[method]
    lead, ksize = _table_shape(dims, method)
    tq = _tile_q(max(lead, ksize))
    n = locs_mat.shape[1]
    kernel = _build_kernel(dims, method, True, tq, passes, rect="pre")
    v2 = vals.reshape(lead, ksize).astype(jnp.float32)
    tables, specs = _tables_and_specs(v2, lead, ksize, passes)
    nw = ndims * footprint
    need = (
        lead * _pad(ksize) * 4
        + 3 * lead * tq * 4
        + _pad(ksize) * tq * 8
    )
    params = _compiler_params(need)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kernel,
            grid=(n // tq,),
            **params,
            in_specs=[
                pl.BlockSpec((ndims, tq), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((nw, tq), lambda i: (0, i), memory_space=pltpu.VMEM),
                *specs,
            ],
            out_specs=pl.BlockSpec((1, tq), lambda i: (0, i), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
        )(locs_mat, w_mat, *tables)
    return out.reshape(n)


@partial(jax.jit, static_argnums=(0, 4, 5))
def _pallas_v3_knots(dims, knotsT, coeffs, obs_mat, passes, method):
    """B-spline kernel launch with IN-KERNEL Cox-de Boor weights (the
    `rect="knots"` kernel mode): operands are the padded (tmax, ndims)
    knot matrix + the (ndims, tq) query tile, exactly mirroring the
    rectilinear kernel's gridsT layout."""
    ndims = len(dims)
    lead, ksize = _table_shape(dims, method)
    tq = _tile_q(max(lead, ksize))
    n = obs_mat.shape[1]
    kernel = _build_kernel(dims, method, True, tq, passes, rect="knots")
    v2 = coeffs.reshape(lead, ksize).astype(jnp.float32)
    tables, specs = _tables_and_specs(v2, lead, ksize, passes)
    tmax = knotsT.shape[0]
    K = _FOOTPRINT[method] - 1
    knots32 = knotsT.astype(jnp.float32)
    shifts = _shifted_knot_rows(knots32, dims, K)
    need = (
        lead * _pad(ksize) * 4
        + 3 * lead * tq * 4
        + _pad(ksize) * tq * 8
        + shifts.shape[0] * tmax * 4
    )
    params = _compiler_params(need)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kernel,
            grid=(n // tq,),
            **params,
            in_specs=[
                pl.BlockSpec(
                    (tmax, ndims), lambda i: (0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (2 * K * ndims, tmax),
                    lambda i: (0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec((ndims, tq), lambda i: (0, i), memory_space=pltpu.VMEM),
                *specs,
            ],
            out_specs=pl.BlockSpec((1, tq), lambda i: (0, i), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
        )(knots32, shifts, obs_mat, *tables)
    return out.reshape(n)


def _rect_locs_weights(grids, obs, method: str, linearize: bool):
    """Per-axis (loc, weights) in XLA f32 via the shared locate/basis
    helpers — exactly the same math the in-kernel construction evaluates."""
    from .cubic import _axis_reduce_rectilinear
    from .locate import locate_rectilinear_cubic, locate_rectilinear_linear

    locs, ws = [], []
    for k, g in enumerate(grids):
        x = obs[k].astype(jnp.float32)
        g = g.astype(jnp.float32)
        if method in ("linear", "nearest"):
            loc, x0, x1 = locate_rectilinear_linear(x, g)
            t = (x - x0) / (x1 - x0)
            if method == "linear":
                locs.append(loc)
                ws.extend([1.0 - t, t])
            else:
                locs.append(loc + jnp.where(t <= 0.5, 0, 1).astype(loc.dtype))
                ws.append(jnp.ones_like(t))
        else:
            cl, gct = locate_rectilinear_cubic(x, g)
            one = jnp.float32(1.0)
            zero = jnp.float32(0.0)
            locs.append(cl.loc)
            for i in range(4):
                e = tuple(one if j == i else zero for j in range(4))
                ws.append(
                    _axis_reduce_rectilinear(
                        e, x, gct, cl.low, cl.high, cl.outside, linearize
                    )
                )
    return locs, ws


def eval_rectilinear_pre(
    grids, vals, obs, method: str, linearize: bool, passes: int = 6
):
    """Rectilinear evaluation with XLA-precomputed weights (see above)."""
    if method == "nearest":
        passes = 6
    dims = tuple(int(g.shape[0]) for g in grids)
    n = obs[0].shape[0]
    lead, ksize = _table_shape(dims, method)
    tq = _tile_q(max(lead, ksize))
    n_pad = ((n + tq - 1) // tq) * tq
    locs, ws = _rect_locs_weights(grids, obs, method, bool(linearize))
    pad = n_pad - n
    locs_mat = jnp.stack([jnp.pad(loc.astype(jnp.int32), (0, pad)) for loc in locs])
    w_mat = jnp.stack([jnp.pad(w.astype(jnp.float32), (0, pad)) for w in ws])
    out = _pallas_v3_pre(dims, method, locs_mat, w_mat, passes, vals)
    return out[:n]


_SPLINE_PRE_TLEN = 48  # benches/exp_spline_knots.py --crossover (v5e)


def _spline_use_pre(dims, k: int) -> bool:
    """True when the XLA-precomputed-weights build should serve this
    spline shape: its per-query knot takes beat the in-kernel one-hot
    weight build only while every knot column stays small. Measured on
    v5e (benches/exp_spline_knots.py --crossover, 2026-08-21): pre is
    +4-11% at k=3 / +15-37% at k=5 through tlen<=46, a wash at 52-60,
    and COLLAPSES ~99x between tlen 60 and 68 (XLA's take lowering
    flips to gather speed: 534.5 -> 4.9 Mq/s). Threshold 48 captures
    the wins and sits a full step below the measured flip in case the
    XLA heuristic shifts. Static at trace time (knot lengths are shape
    information)."""
    return max(d + k + 1 for d in dims) <= _SPLINE_PRE_TLEN


def _bspline_pre_mats(knots, obs, k: int, tq: int):
    """Spans + Cox-de Boor basis values computed in XLA
    (`ops.bspline.spline_locs_weights`), padded and stacked for the
    placement/contraction kernels (shared by the single and stack pre
    routes)."""
    from .bspline import spline_locs_weights

    n = obs[0].shape[0]
    pad = ((n + tq - 1) // tq) * tq - n
    knots32 = [jnp.asarray(t, jnp.float32) for t in knots]
    obs32 = [o.astype(jnp.float32) for o in obs]
    locs, ws = [], []
    for loc, wlist in spline_locs_weights(knots32, obs32, k):
        locs.append(loc)
        ws.extend(wlist)
    locs_mat = jnp.stack([jnp.pad(l.astype(jnp.int32), (0, pad)) for l in locs])
    w_mat = jnp.stack([jnp.pad(w.astype(jnp.float32), (0, pad)) for w in ws])
    return locs_mat, w_mat


def _eval_bspline_knots(knots, coeffs, obs, k: int, passes: int = 6):
    """The in-kernel Cox-de Boor route (`rect="knots"`): branch-free span
    count + one-hot knot selects from the VMEM-resident knot columns; the
    12-byte query is all that streams per axis (like the Hermite kernel).

    The SPLINE_SEL env var is read at TRACE time in the kernel builder:
    flipping it between calls with identical shapes silently reuses the
    cached executable — use a fresh process or distinct shapes to A/B it
    (the repo-wide jit/env gotcha, CLAUDE.md)."""
    dims = tuple(int(t.shape[0]) - k - 1 for t in knots)
    method = f"bspline{k}"
    n = obs[0].shape[0]
    lead, ksize = _table_shape(dims, method)
    tq = _tile_q(max(lead, ksize))
    n_pad = ((n + tq - 1) // tq) * tq
    tmax = max(d + k + 1 for d in dims)
    knotsT = jnp.stack(
        [
            jnp.pad(jnp.asarray(t, jnp.float32), (0, tmax - t.shape[0]))
            for t in knots
        ],
        axis=1,
    )
    obs_mat = jnp.stack(
        [jnp.pad(o.astype(jnp.float32), (0, n_pad - n)) for o in obs]
    )
    out = _pallas_v3_knots(dims, knotsT, coeffs, obs_mat, passes, method)
    return out[:n]


def _eval_bspline_pre(knots, coeffs, obs, k: int, passes: int = 6):
    """The XLA-precomputed-weights route: spans + basis values compute in
    XLA and stream to the kernel ((k+1) weights + a loc per axis per
    query), which only places and contracts them. Faster than the
    in-kernel build on small knot columns (the dispatch regime,
    `_spline_use_pre`); collapses 75x on ~100-entry columns."""
    dims = tuple(int(t.shape[0]) - k - 1 for t in knots)
    method = f"bspline{k}"
    lead, ksize = _table_shape(dims, method)
    tq = _tile_q(max(lead, ksize))
    locs_mat, w_mat = _bspline_pre_mats(knots, obs, k, tq)
    out = _pallas_v3_pre(dims, method, locs_mat, w_mat, passes, coeffs)
    return out[: obs[0].shape[0]]


def eval_bspline(knots, coeffs, obs, k: int, passes: int = 6):
    """Fused evaluation of a degree-k tensor-product B-spline (f32).

    The spline is linear in the coefficient table with separable per-axis
    Cox-de Boor weights; two fused kernels differ only in WHERE the
    weights build. Round 5 replaced the INTERPN_TPU_SPLINE_PRE env knob
    with an automatic dispatch on the static knot-column length
    (`_spline_use_pre`, threshold measured on hardware by
    benches/exp_spline_knots.py --crossover): small knot columns take the
    XLA-precomputed-weights kernel (`_eval_bspline_pre`, measurably
    faster there), larger ones the in-kernel Cox-de Boor build
    (`_eval_bspline_knots`, no cliff — the pre route's per-query XLA knot
    takes collapse 75x at ~100 entries). Both routes stay under
    cross-parity tests and the fuzz A/B leg. `dims` are coefficient
    counts per axis (== grid dims for the interpolating spline)."""
    dims = tuple(int(t.shape[0]) - k - 1 for t in knots)
    if _spline_use_pre(dims, k):
        return _eval_bspline_pre(knots, coeffs, obs, k, passes)
    return _eval_bspline_knots(knots, coeffs, obs, k, passes)


def eval_bspline_stack(knots, coeffs_stack, obs, k: int, passes: int = 6):
    """Fused evaluation of an (nch, prod(dims)) B-spline coefficient stack
    sharing one knot set: ONE weight build serves every channel (cf.
    eval_regular_stack); (nch, n) f32 out. Dispatches between the
    in-kernel and XLA-precomputed weight builds on the static knot-column
    length like `eval_bspline` (round 5 replaced the
    INTERPN_TPU_SPLINE_PRE env knob with `_spline_use_pre`)."""
    dims = tuple(int(t.shape[0]) - k - 1 for t in knots)
    method = f"bspline{k}"
    nch = int(coeffs_stack.shape[0])
    n = obs[0].shape[0]
    lead, ksize = _table_shape(dims, method, nch)
    tq = _tile_q(max(nch * lead, ksize))
    n_pad = ((n + tq - 1) // tq) * tq
    pad = n_pad - n
    if _spline_use_pre(dims, k):
        locs_mat, w_mat = _bspline_pre_mats(knots, obs, k, tq)
        out = _pallas_v3_pre_stack(
            dims, nch, method, locs_mat, w_mat, passes,
            coeffs_stack.reshape(-1),
        )
        return out[:, :n]
    tmax = max(d + k + 1 for d in dims)
    knotsT = jnp.stack(
        [
            jnp.pad(jnp.asarray(t, jnp.float32), (0, tmax - t.shape[0]))
            for t in knots
        ],
        axis=1,
    )
    obs_mat = jnp.stack(
        [jnp.pad(o.astype(jnp.float32), (0, pad)) for o in obs]
    )
    out = _pallas_v3_knots_stack(
        dims, nch, knotsT, coeffs_stack.reshape(-1), obs_mat, passes, method
    )
    return out[:, :n]


def eval_regular_pre(
    dims, starts, steps, vals, obs, method: str, linearize: bool, passes: int = 6
):
    """Regular-grid evaluation with XLA-precomputed weights (experimental
    twin of eval_rectilinear_pre; see benches/exp notes in docs/perf.md)."""
    from .factorized import _basis_weights_cubic_regular
    from .locate import locate_regular_cubic, locate_regular_linear

    if method == "nearest":
        passes = 6
    dims = tuple(dims)
    n = obs[0].shape[0]
    lead, ksize = _table_shape(dims, method)
    tq = _tile_q(max(lead, ksize))
    n_pad = ((n + tq - 1) // tq) * tq
    locs, ws = [], []
    for k in range(len(dims)):
        x = obs[k].astype(jnp.float32)
        if method in ("linear", "nearest"):
            loc, t = locate_regular_linear(
                x, starts[k].astype(jnp.float32), steps[k].astype(jnp.float32),
                dims[k],
            )
            if method == "linear":
                locs.append(loc)
                ws.extend([1.0 - t, t])
            else:
                locs.append(loc + jnp.where(t <= 0.5, 0, 1).astype(loc.dtype))
                ws.append(jnp.ones_like(t))
        else:
            cl = locate_regular_cubic(
                x, starts[k].astype(jnp.float32), steps[k].astype(jnp.float32),
                dims[k],
            )
            locs.append(cl.loc)
            ws.extend(_basis_weights_cubic_regular(cl, bool(linearize)))
    pad = n_pad - n
    locs_mat = jnp.stack([jnp.pad(loc.astype(jnp.int32), (0, pad)) for loc in locs])
    w_mat = jnp.stack([jnp.pad(w.astype(jnp.float32), (0, pad)) for w in ws])
    out = _pallas_v3_pre(dims, method, locs_mat, w_mat, passes, vals)
    return out[:n]


# ---------------------------------------------------------------------------
# Stacked-table (multi-channel) evaluation
#
# Many value tables sharing one grid geometry evaluate at the same points in
# ONE kernel: the channel axis rides as the outermost row block of the
# (nch*lead, ksize) table, so the per-query weight build — the critical path
# for small grids (docs/perf.md roofline: the 3D configs are NOT MXU-bound)
# — is paid once for all channels, and the MXU contraction grows only by
# the padded row extent. The reference has no analogue (one table per
# interpolator, `src/multilinear/regular.rs:200-426`); this is TPU-native
# surplus capability, exposed as `interpn_tpu.interpn_stack`.
# ---------------------------------------------------------------------------


def supported_stack(dims, nch: int, dtype, method: str) -> bool:
    """Eligibility of the fused kernel for an `nch`-channel stack."""
    if nch < 1 or not supported(dims, dtype, method):
        return False
    if nch == 1:
        return True
    if nch * math.prod(dims) * 4 > _MAX_VALS_BYTES:
        return False
    # bound the (nch*lead, tq) contraction tile the same way _compiler_params
    # can still satisfy: 3 temporaries at the minimum query tile
    lead, ksize = _table_shape(dims, method, nch)
    rows = nch * lead
    need = rows * _pad(ksize) * 4 + 3 * rows * _MIN_TQ * 4
    return need <= 48 * 1024 * 1024


@partial(jax.jit, static_argnums=(0, 1, 5, 6, 7))
def _pallas_v3_stack(dims, nch, starts, steps, vals, method, linearize,
                     passes, obs_mat):
    ndims = len(dims)
    lead, ksize = _table_shape(dims, method, nch)
    rows = nch * lead
    tq = _tile_q(max(rows, ksize))
    n = obs_mat.shape[1]
    kernel = _build_kernel(dims, method, linearize, tq, passes, rect=False,
                           nch=nch)
    v2 = vals.reshape(rows, ksize).astype(jnp.float32)
    tables, specs = _tables_and_specs(v2, rows, ksize, passes)
    starts2d = starts.reshape(1, ndims).astype(jnp.float32)
    steps2d = steps.reshape(1, ndims).astype(jnp.float32)
    need = (
        rows * _pad(ksize) * 4
        + 3 * rows * tq * 4
        + _pad(ksize) * tq * 8
    )
    params = _compiler_params(need)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kernel,
            grid=(n // tq,),
            **params,
            in_specs=[
                pl.BlockSpec((1, ndims), lambda i: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, ndims), lambda i: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((ndims, tq), lambda i: (0, i), memory_space=pltpu.VMEM),
                *specs,
            ],
            out_specs=pl.BlockSpec((nch, tq), lambda i: (0, i), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nch, n), jnp.float32),
        )(starts2d, steps2d, obs_mat, *tables)
    return out


def eval_regular_stack(dims, starts, steps, vals_stack, obs, method: str,
                       linearize: bool, passes: int = 6):
    """Fused evaluation of an (nch, prod(dims)) table stack on a regular
    grid: (nch, n) out, one weight build shared across channels."""
    if method == "nearest":
        passes = 6  # one-hot selection must reproduce grid values exactly
    dims = tuple(dims)
    nch = int(vals_stack.shape[0])
    n = obs[0].shape[0]
    lead, ksize = _table_shape(dims, method, nch)
    tq = _tile_q(max(nch * lead, ksize))
    n_pad = ((n + tq - 1) // tq) * tq
    obs_mat = jnp.stack(
        [jnp.pad(o.astype(jnp.float32), (0, n_pad - n), mode="edge") for o in obs]
    )
    out = _pallas_v3_stack(
        dims, nch, starts, steps, vals_stack.reshape(-1), method,
        bool(linearize), passes, obs_mat,
    )
    return out[:, :n]


@partial(jax.jit, static_argnums=(0, 1, 2, 5))
def _pallas_v3_pre_stack(dims, nch, method, locs_mat, w_mat, passes, vals):
    ndims = len(dims)
    footprint = _FOOTPRINT[method]
    lead, ksize = _table_shape(dims, method, nch)
    rows = nch * lead
    tq = _tile_q(max(rows, ksize))
    n = locs_mat.shape[1]
    kernel = _build_kernel(dims, method, True, tq, passes, rect="pre",
                           nch=nch)
    v2 = vals.reshape(rows, ksize).astype(jnp.float32)
    tables, specs = _tables_and_specs(v2, rows, ksize, passes)
    nw = ndims * footprint
    need = (
        rows * _pad(ksize) * 4
        + 3 * rows * tq * 4
        + _pad(ksize) * tq * 8
    )
    params = _compiler_params(need)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kernel,
            grid=(n // tq,),
            **params,
            in_specs=[
                pl.BlockSpec((ndims, tq), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((nw, tq), lambda i: (0, i), memory_space=pltpu.VMEM),
                *specs,
            ],
            out_specs=pl.BlockSpec((nch, tq), lambda i: (0, i), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nch, n), jnp.float32),
        )(locs_mat, w_mat, *tables)
    return out


@partial(jax.jit, static_argnums=(0, 1, 5, 6))
def _pallas_v3_knots_stack(dims, nch, knotsT, coeffs_stack, obs_mat, passes,
                           method):
    """Stack twin of `_pallas_v3_knots`: one in-kernel Cox-de Boor weight
    build serves every channel (cf. `_pallas_v3_pre_stack`)."""
    ndims = len(dims)
    lead, ksize = _table_shape(dims, method, nch)
    rows = nch * lead
    tq = _tile_q(max(rows, ksize))
    n = obs_mat.shape[1]
    kernel = _build_kernel(dims, method, True, tq, passes, rect="knots",
                           nch=nch)
    v2 = coeffs_stack.reshape(rows, ksize).astype(jnp.float32)
    tables, specs = _tables_and_specs(v2, rows, ksize, passes)
    tmax = knotsT.shape[0]
    K = _FOOTPRINT[method] - 1
    knots32 = knotsT.astype(jnp.float32)
    shifts = _shifted_knot_rows(knots32, dims, K)
    need = (
        rows * _pad(ksize) * 4
        + 3 * rows * tq * 4
        + _pad(ksize) * tq * 8
        + shifts.shape[0] * tmax * 4
    )
    params = _compiler_params(need)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kernel,
            grid=(n // tq,),
            **params,
            in_specs=[
                pl.BlockSpec(
                    (tmax, ndims), lambda i: (0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (2 * K * ndims, tmax),
                    lambda i: (0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec((ndims, tq), lambda i: (0, i), memory_space=pltpu.VMEM),
                *specs,
            ],
            out_specs=pl.BlockSpec((nch, tq), lambda i: (0, i), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nch, n), jnp.float32),
        )(knots32, shifts, obs_mat, *tables)
    return out


def eval_rectilinear_stack(grids, vals_stack, obs, method: str,
                           linearize: bool, passes: int = 6):
    """Stacked-table twin of eval_rectilinear_pre: XLA-precomputed locate +
    basis weights (shared across channels), fused placement + contraction."""
    if method == "nearest":
        passes = 6
    dims = tuple(int(g.shape[0]) for g in grids)
    nch = int(vals_stack.shape[0])
    n = obs[0].shape[0]
    lead, ksize = _table_shape(dims, method, nch)
    tq = _tile_q(max(nch * lead, ksize))
    n_pad = ((n + tq - 1) // tq) * tq
    locs, ws = _rect_locs_weights(grids, obs, method, bool(linearize))
    pad = n_pad - n
    locs_mat = jnp.stack([jnp.pad(loc.astype(jnp.int32), (0, pad)) for loc in locs])
    w_mat = jnp.stack([jnp.pad(w.astype(jnp.float32), (0, pad)) for w in ws])
    out = _pallas_v3_pre_stack(
        dims, nch, method, locs_mat, w_mat, passes, vals_stack.reshape(-1)
    )
    return out[:, :n]
