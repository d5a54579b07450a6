"""Exact-int32 int8 multipass MXU contraction: f64 interpolation at MXU rate.

The double-float VPU engine (ops/pallas_df64.py) runs at VPU peak —
~21 plane-ops per table cell is its hard ceiling, 1.08 Mq/s on a 20^4
cubic grid. The MXU is ~40x faster but its f32 accumulator rounds at
2^-24, far from the 2^-47 double-float target... in FLOAT. In INTEGER the
MXU accumulates EXACTLY (int8 x int8 -> int32, measured on v5e in round 2
at ~1.16x the bf16 pass rate), which turns the f64 contraction into
fixed-point arithmetic:

    V[r, k] = c_r + 2^(e_r) * sum_i A_i[r, k] 2^-(6+7i)     (A_i int8)
    W[k, q] =       2^(f_q) * sum_j B_j[k, q] 2^-(6+7j)     (B_j int8)
    (V @ W)[r, q] = c_r * S_w[q]
                  + 2^(e_r + f_q) * sum_(i+j<=7) (A_i @ B_j)[r, q] 2^-(12+7(i+j))

Every piece product A_i @ B_j is an int8 MXU pass with exact int32
accumulation (overflow bound 64^2 * K < 2^31 for K <= 128k); the 35 kept
pairs carry ~2^-47 of the row scale. Load-bearing details:

* Scales are POWERS OF TWO (2^e_r per table row, 2^f_q per query), so
  every scale multiply is exact — scaling adds zero rounding.
* Rows are CENTERED (c_r = midrange) before scaling; the centers return
  as c_r * S_w[q] with S_w the double-float column sum of W. Like
  pallas_v3's split mode, the fixed-point error then rides on the LOCAL
  row variation, not the absolute magnitude.
* Pieces use 7-bit payloads with headroom (|piece| <= 64): the int8 clip
  never engages and each level removes a full 7 bits (a clipped 2^7
  radix loses a bit per level — measured 1.6e-12 vs 6.8e-15 in
  benches/exp_int8.py phase 2).
* Piece-pair sums group by total level s = i+j and accumulate in int32
  (exact); groups s <= 3 convert to f32 through an exact 12-bit split
  (int32 above 2^24 would round), higher groups convert directly (their
  level bound keeps the conversion error below 2^-50 of the row scale).
* The value-table decomposition happens ONCE outside the kernel in XLA
  f64 (trace-time, concrete tables only); the W decomposition runs
  per-tile in-kernel from the same dense double-float stencil-weight
  matrices the df64 engine builds (ops/pallas_df64._sel_pair).

Accuracy: ~2^-47 of (row variation x weight magnitude) — measured at the
df64 engine's level (<= 1e-13 vs the f64 gather tree) on the test
distributions. The one structural caveat vs df64: error scales with the
PER-ROW variation envelope, so a row mixing a huge spike with tiny values
degrades queries whose stencils read only the tiny part. `supported()`
therefore gates on a per-row midrange-ratio statistic and falls back to
the df64 engine when a table is spiky (INTERPN_TPU_F64=df64 forces the
fallback; =i8 skips the gate).

Reference capability matched: f64-first evaluation, 1-8D
(`src/multicubic/regular_recursive.rs:205-466`) — here at MXU rate.
"""

from __future__ import annotations

import math
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_df64 import (
    _build_wmats,
    _df_add,
    _df_mul,
    _df_norm,
    _two_sum,
    _axis_weights_f64,
    _split_f64,
)

_I32 = jnp.int32
_I8 = jnp.int8
_F32 = jnp.float32

NPIECE_V = 8
NPIECE_W = 7
SMAX = 7  # keep piece pairs with i + j <= SMAX (35 passes)
NPASSES = sum(
    1 for i in range(NPIECE_V) for j in range(NPIECE_W) if i + j <= SMAX
)

_MAX_TQ = 512
_MIN_TQ = 128
_TILE_BYTES = 1 << 20
_MAX_GROUP_K = 2048
# Hard VMEM ceilings (PADDED sizes are what actually resides): at
# tq = 128 the 8 int32 level-group planes cost 8 * 4 * pad(lead) * tq
# bytes (25 MB at lead 6144) and the piece tables NPIECE_V * pad(lead) *
# pad(k) (<= 24 MB); together with the df temporaries the worst admitted
# shape sits ~60 MB under the 96 MB scoped limit below.
_MAX_LEAD = 6144
_MAX_PIECES_BYTES = 24 * 1024 * 1024
# The regime validated on hardware through round 3 (benches/
# exp_i8_engine.py, 96-config sweep): inside it the engine won at every
# measured shape, so no cost model is consulted. Shapes beyond it (lead
# up to _MAX_LEAD, pieces up to _MAX_PIECES_BYTES) are admitted only when
# the padded-volume cost model predicts a clear win over the f64 gather
# tree (see _est_rates).
_LEGACY_LEAD = 2048
_LEGACY_VALS_BYTES = 8 * 1024 * 1024
# Cost-model constants, both from v5e measurement (docs/perf.md): the
# engine sustains ~45-48 T int8-MAC/s of PADDED block volume end-to-end
# (20^3 cubic: 21.1 Mq/s * 35 passes * 512x128 = 48.4 T), and the f64
# gather tree evaluates ~62 M stencil elements/s whatever the grid size
# (linear 3D 7.75, cubic 2D/3D/4D 3.9/0.97/0.21 Mq/s — all within 15% of
# 62e6 / footprint^ndims).
_I8_EFF_MAC_RATE = 45e12
_GATHER_ELEM_RATE = 62e6
_COST_MARGIN = 1.5
# per-row spike gate: rows whose |v - midrange| max exceeds this multiple
# of the row's mean absolute deviation push the table to the df64 engine
_ROW_SPIKE_RATIO = 1024.0
# Engine contract = its dispatch regime: below this the df64 VPU engine is
# preferable anyway (dispatch._prefer_i8), and the int8 error model (W
# quantization is ABSOLUTE per stencil entry at 2^-49 of the per-query
# weight peak, so deep multi-axis extrapolation on tiny grids amplifies it
# by the grouped stencil size — fuzz-measured 1.4e-8 on a 1600-cell 5D
# rectilinear cubic at 3-cell extrapolation, where df64 holds 1e-13).
_MIN_CELLS = 4096
# NON-LINEARIZED cubic extrapolation is gated per BATCH, admitted shapes
# included: its basis weights grow ~2t^3 per axis, and past a few cells
# the grouped weight dynamic range plus output cancellation surfaces the
# 2^-49-of-peak quantization floor even on >= _MIN_CELLS shapes
# (fuzz seed 300 round 375: 4.7e-8 on a 6400-cell 6D at 3.5-6.5-cell
# extrapolation; the earlier 20^3/20^4/12^5 validation only reached 3
# cells). Measured envelope (benches/exp_i8_extrap.py): <= 1.5e-14
# through 3 cells on every shape/ndims, 1e-7..1e-8 at 4+ cells on 4-6D.
# Linear and linearized-cubic weights grow only linearly and measure
# clean through 6 cells on 6D — they stay ungated (and keep their zero
# per-eval overhead). Cap at 2 cells = 2x margin under the cliff.
_EXTRAP_CELLS_CUBIC = 2.0


def _choose_group(dims) -> int:
    """Trailing-axis count contracted on the MXU — pallas_v3's padded-block
    cost model, biased toward deep K (the 35 passes amortize padding)."""
    ndims = len(dims)
    best_g, best_cost = 1, None
    k = 1
    for g in range(1, ndims):
        k *= dims[ndims - g]
        if k > _MAX_GROUP_K and g > 1:
            break
        lead = math.prod(dims[: ndims - g])
        if lead > _MAX_LEAD:
            continue
        pad = lambda x: -(-x // 128) * 128
        cost = pad(lead) * pad(k)
        if best_cost is None or cost <= best_cost:
            best_g, best_cost = g, cost
    return best_g


def _pad128(x: int) -> int:
    return -(-x // 128) * 128


def _shape(dims, _method=None):
    """(group, lead, k) — TRUE extents. The kernel zero-pads both matmul
    extents to multiples of 128: Mosaic runs misaligned int8 contractions
    5-7x slower than aligned ones (400x400 measured 11.4 TMAC/s vs 512x512
    at 80.7 — the padding costs only zero rows that contribute nothing)."""
    g = _choose_group(dims)
    return (
        g,
        max(math.prod(dims[: len(dims) - g]), 1),
        math.prod(dims[len(dims) - g:]),
    )


def _tile_q(lead: int, k: int) -> int:
    tq = _TILE_BYTES // max(max(lead, k) * 4, 1)
    tq = 1 << max(tq.bit_length() - 1, 0)
    return max(_MIN_TQ, min(_MAX_TQ, tq))


def _est_rates(dims, method: str):
    """(estimated i8 queries/s, estimated f64-gather queries/s) from the
    measured constants above. The i8 cost per query is the padded MXU
    block volume times the 35 passes; the gather tree touches
    footprint^ndims stencil elements per query."""
    g, lead, k = _shape(dims)
    i8 = _I8_EFF_MAC_RATE / (NPASSES * _pad128(lead) * _pad128(k))
    footprint = 2 if method == "linear" else 4
    gather = _GATHER_ELEM_RATE / footprint ** len(dims)
    return i8, gather


def supported(dims, method: str, vals=None) -> bool:
    """Shape + (when a concrete table is given) spikiness eligibility."""
    mode = os.environ.get("INTERPN_TPU_F64", "auto")
    if mode == "df64":
        return False
    if method not in ("linear", "cubic"):
        return False
    if len(dims) < 2 or len(dims) > 8:
        return False
    if dims[-1] < 2:
        return False
    if math.prod(dims) < _MIN_CELLS and mode != "i8":
        return False
    g, lead, k = _shape(dims)
    lead_pad, k_pad = _pad128(lead), _pad128(k)
    if lead_pad > _MAX_LEAD or NPIECE_V * lead_pad * k_pad > _MAX_PIECES_BYTES:
        return False
    legacy = (
        lead <= _LEGACY_LEAD
        and math.prod(dims) * NPIECE_V <= _LEGACY_VALS_BYTES
    )
    if not legacy and mode != "i8":
        # shapes beyond the hardware-validated regime route here only on
        # a predicted >= _COST_MARGIN win over the gather tree: e.g. 50^3
        # cubic (est 3.9 vs 0.97 Mq/s) is admitted, 100^3 (1.0 vs 0.97)
        # and every large-grid linear config stay on gather
        est_i8, est_gather = _est_rates(dims, method)
        if est_i8 < _COST_MARGIN * est_gather:
            return False
    if vals is not None:
        if isinstance(vals, jax.core.Tracer):
            # decomposition needs concrete values — even when forced:
            # prepare() would np.asarray() the tracer and crash mid-trace
            return False
        if mode != "i8":
            return _table_ok(vals, lead, k)
    return True


@jax.jit
def _obs_stats_regular(starts, steps, obs):
    """(ndims, 4) rows [min, max, start, step] — ONE device program/transfer
    (per-axis eager reductions would cost a relay round trip each)."""
    mm = jnp.stack([jnp.stack([jnp.min(o), jnp.max(o)]) for o in obs])
    extra = jnp.stack([starts, steps], axis=1).astype(mm.dtype)
    return jnp.concatenate([mm, extra], axis=1)


@jax.jit
def _obs_stats_rect(grids, obs):
    """(ndims, 6) rows [min, max, g[0], g[1], g[-2], g[-1]]."""
    mm = jnp.stack([jnp.stack([jnp.min(o), jnp.max(o)]) for o in obs])
    edges = jnp.stack(
        [jnp.stack([g[0], g[1], g[-2], g[-1]]) for g in grids]
    ).astype(mm.dtype)
    return jnp.concatenate([mm, edges], axis=1)


def _depth_ok(e) -> bool:
    # non-finite coordinates decline too: the reference-parity engines own
    # NaN/inf semantics (unrepresentable flag, NaN-out)
    return bool(np.all(np.isfinite(e)) and np.max(e) <= _EXTRAP_CELLS_CUBIC)


def extrap_ok_regular(dims, starts, steps, obs, method, linearize) -> bool:
    """Per-batch admission for non-linearized cubic: max extrapolation
    depth (in cells) on every axis must stay under _EXTRAP_CELLS_CUBIC.
    Linear / linearized-cubic batches return True with no device work.
    INTERPN_TPU_F64=i8 bypasses the gate like supported()'s other force
    escapes (engine-comparison benches must time the engine they ask for)."""
    if method != "cubic" or linearize:
        return True
    if os.environ.get("INTERPN_TPU_F64") == "i8":
        return True
    if any(isinstance(x, jax.core.Tracer) for x in (*obs, starts, steps)):
        return False  # traced inputs: depth unknowable; df64/gather serve
    s = np.asarray(
        _obs_stats_regular(jnp.asarray(starts), jnp.asarray(steps), tuple(obs))
    )
    mins, maxs, st, sp = s[:, 0], s[:, 1], s[:, 2], s[:, 3]
    hi = st + sp * (np.asarray(dims, dtype=s.dtype) - 1.0)
    return _depth_ok(np.maximum((st - mins) / sp, (maxs - hi) / sp))


def extrap_ok_rectilinear(grids, obs, method, linearize) -> bool:
    """Rectilinear twin of extrap_ok_regular (depth in edge-cell widths)."""
    if method != "cubic" or linearize:
        return True
    if os.environ.get("INTERPN_TPU_F64") == "i8":
        return True
    if any(isinstance(x, jax.core.Tracer) for x in (*obs, *grids)):
        return False
    s = np.asarray(
        _obs_stats_rect(tuple(jnp.asarray(g) for g in grids), tuple(obs))
    )
    mins, maxs, g0, g1, gm2, gm1 = (s[:, j] for j in range(6))
    return _depth_ok(np.maximum((g0 - mins) / (g1 - g0), (maxs - gm1) / (gm1 - gm2)))


# table-statistics cache (the spike gate medians cost ~ms per call on the
# host; persistent models query the same table every eval)
_STAT_CACHE: dict = {}
_STAT_ORDER: list = []


def _cache_key(vals, extra):
    """(key, guard) for the stat/prep caches. Host numpy tables key by
    CONTENT hash: the raw entry points see a fresh device conversion per
    call, so identity keying missed every time (paying full stats +
    decomposition + pieces upload per eval on 1M-cell tables), and
    identity alone is unsafe under in-place mutation anyway. Device/jax
    arrays (immutable; the model classes cache one per table) key by id
    with an identity guard — hashing those would force a device->host
    transfer per call."""
    if isinstance(vals, np.ndarray):
        import hashlib

        buf = vals if vals.flags.c_contiguous else np.ascontiguousarray(vals)
        h = hashlib.blake2b(buf, digest_size=16).digest()
        return ("h", h, buf.dtype.str, buf.shape) + extra, None
    return ("i", id(vals)) + extra, vals


def _table_ok(vals, lead: int, k: int) -> bool:
    key, guard = _cache_key(vals, (lead, k))
    hit = _STAT_CACHE.get(key)
    if hit is not None and (guard is None or hit[0] is guard):
        return hit[1]
    v = np.asarray(vals, dtype=np.float64).reshape(lead, k)
    span = float(v.max() - v.min()) if v.size else 0.0
    if not np.isfinite(v).all() or not np.isfinite(span) or span > 2.0**120:
        # non-finite tables break the decomposition outright; a value SPAN
        # beyond ~2^120 overflows the float32 row centers/scales (the
        # global-center extraction bounds |v - c0| by span/2, so absolute
        # magnitude alone is fine — only the spread matters)
        ok = False
    else:
        # Spike statistic around the MEDIAN: a single huge value inflates
        # midrange/mean deviations symmetrically (ratio ~1 or ~K —
        # fooled), while the median deviation stays at the quiet values'
        # scale. The peak * 2^-16 floor keeps constant rows (peak 0)
        # accepted and bounds the ratio so the threshold is meaningful.
        med = np.median(v, axis=1, keepdims=True)
        dev = np.abs(v - med)
        peak = dev.max(axis=1)
        meddev = np.median(dev, axis=1)
        floor = np.maximum(np.maximum(meddev, peak * 2.0**-16), 1e-300)
        ok = not np.any(peak > _ROW_SPIKE_RATIO * floor)
    _STAT_CACHE[key] = (vals, ok)
    _STAT_ORDER.append(key)
    while len(_STAT_ORDER) > _PREP_MAX:
        _STAT_CACHE.pop(_STAT_ORDER.pop(0), None)
    return ok


# ---------------------------------------------------------------------------
# trace-time table decomposition (XLA f64 -> int8 pieces + exact scales)
# ---------------------------------------------------------------------------


def _decompose_table(vals, lead: int, k: int):
    """(pieces (NPIECE_V, lead, k) i8, centers hi/lo (lead,1) f32,
    scales (lead, 1) f32 — exact powers of two).

    Runs in HOST numpy: the table is concrete by construction (supported()
    refuses tracers), and true-f64 host arithmetic keeps every step of the
    residual chain exact. On-device f64 is float-float EMULATED, whose
    rint/exp2 edge behavior broke the self-correcting piece expansion for
    a cluster of rows on v5e hardware (measured: 28/100k queries at
    ~1e-8 — one piece-unit at level s=2 — while the same math on host is
    clean)."""
    v = np.asarray(vals, dtype=np.float64).reshape(lead, k)
    mid = (v.max(axis=1, keepdims=True) + v.min(axis=1, keepdims=True)) * 0.5
    vc = v - mid
    peak = np.abs(vc).max(axis=1, keepdims=True)
    with np.errstate(divide="ignore"):
        e = np.ceil(np.log2(np.maximum(peak, 1e-300)))
    # zero rows (the 128-alignment padding) get scale 1, avoiding 0/0
    scale = np.where(peak > 0, np.exp2(e), 1.0)
    r = vc / scale  # exact (power-of-two divide), |r| <= 1
    pieces = np.empty((NPIECE_V, lead, k), dtype=np.int8)
    for i in range(NPIECE_V):
        q = np.rint(r * 2.0 ** (6 + 7 * i))
        pieces[i] = q.astype(np.int8)
        r = r - q * 2.0 ** (-(6 + 7 * i))
    ch = mid.astype(np.float32)
    cl = (mid - ch.astype(np.float64)).astype(np.float32)
    # NUMPY outputs, deliberately: converting to jax arrays here would
    # create TRACERS when a caller traces this path (e.g. jit with the
    # table closed over — scripts/warm_cache.py does), and cached tracers
    # leak across traces (UnexpectedTracerError, measured). prepare()
    # materializes device copies only outside traces.
    return pieces, ch, cl, scale.astype(np.float32)


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------


def _combined_weights_df(wmats, dims, g: int, tq: int):
    """Grouped trailing-axes weight matrix as a double-float (K, tq) pair,
    right-to-left outer products of the per-axis dense df matrices."""
    ndims = len(dims)
    wh, wl = wmats[ndims - 1]
    width = dims[ndims - 1]
    for a in range(ndims - 2, ndims - g - 1, -1):
        ah, al = wmats[a]
        da = dims[a]
        # outer product through 3D broadcast views, in full double-float
        # (a Dekker-free approximate product is NOT enough here)
        ph, plo = _df_mul(
            ah.reshape(da, 1, tq), al.reshape(da, 1, tq),
            wh.reshape(1, width, tq), wl.reshape(1, width, tq),
        )
        wh = ph.reshape(da * width, tq)
        wl = plo.reshape(da * width, tq)
        width *= da
    return wh, wl


def _quantize_weights(wh, wl, tq: int):
    """(B pieces list of (K, tq) i8, f_q scale (1, tq) f32 power of two).

    The residual is carried as a DOUBLE-FLOAT pair and renormalized with
    the exact two_sum after every extraction: a plain f32 residual with a
    one-time low-part absorption rounds at ~2^-45 of the scale (measured
    as the dominant error), while the df residual keeps every subtraction
    exact and folds the low component in as the residual shrinks."""
    peak = jnp.max(jnp.abs(wh), axis=0, keepdims=True)
    f = jnp.ceil(jnp.log2(jnp.maximum(peak, 1e-30)))
    scale = jnp.exp2(f)
    inv = jnp.exp2(-f)
    rh = wh * inv  # exact (power-of-two scale)
    rl = wl * inv
    pieces = []
    for j in range(NPIECE_W):
        q = jnp.rint(rh * _F32(2.0 ** (6 + 7 * j)))
        pieces.append(q.astype(_I8))
        rh = rh - q * _F32(2.0 ** (-(6 + 7 * j)))  # exact (Sterbenz)
        rh, rl = _two_sum(rh, rl)
    return pieces, scale


def _exact_i32_to_df(acc32):
    """int32 -> exact f32 hi/lo pair (values may exceed 2^24)."""
    lo_i = jax.lax.rem(acc32, _I32(4096))
    hi_i = jax.lax.div(acc32 - lo_i, _I32(4096))
    return hi_i.astype(_F32) * _F32(4096.0), lo_i.astype(_F32)


# Prepared-decomposition cache: the host-side table prep costs a few ms
# per call; persistent models and repeated raw calls on the same table
# reuse it. Strong refs to the table arrays keep id() stable while cached.
_PREP_CACHE: dict = {}
_PREP_ORDER: list = []
_PREP_MAX = 8


def _trace_clean() -> bool:
    try:
        from jax._src import core as _jcore  # not re-exported by jax.core

        return _jcore.trace_state_clean()
    except (ImportError, AttributeError):  # pragma: no cover - jax layout
        return False  # safe default: numpy constants always work


def prepare(dims, vals):
    """Host-side table decomposition (cached): (pieces, centers hi/lo,
    scales, global center c0). Requires concrete values — the whole point
    of the host prep is true-f64 arithmetic (see _decompose_table).

    Cache entries hold HOST numpy plus lazily-materialized device copies.
    Device copies are only created OUTSIDE traces: under an active trace
    (a caller jitting over this path with the table closed over), device
    conversion would yield tracers, and cached tracers leak across traces;
    the numpy arrays instead embed as constants in that caller's program."""
    key, guard = _cache_key(vals, tuple(dims))
    hit = _PREP_CACHE.get(key)
    if hit is None or (guard is not None and hit[0] is not guard):
        g, lead, ksize = _shape(dims)
        lead_pad, k_pad = _pad128(lead), _pad128(ksize)
        v_np = np.asarray(vals, dtype=np.float64)
        c0 = float((v_np.max() + v_np.min()) * 0.5)
        # decompose the TRUE extents, pad after: padding the rows first
        # would let the injected zeros enter every real row's midrange and
        # scale, inflating the fixed-point step from the row's LOCAL
        # variation to its offset whenever k % 128 != 0 (the kernel
        # zero-pads the weight side, so pad content never reaches the
        # contraction result)
        pieces, ch, cl, sv = _decompose_table(
            (v_np - c0).reshape(lead, ksize), lead, ksize
        )
        pad2 = ((0, lead_pad - lead), (0, 0))
        pieces = np.pad(
            pieces, ((0, 0), (0, lead_pad - lead), (0, k_pad - ksize))
        )
        ch = np.pad(ch, pad2)
        cl = np.pad(cl, pad2)
        sv = np.pad(sv, pad2, constant_values=1.0)  # avoid 0-scale rows
        hit = [vals, (pieces, ch, cl, sv, c0), None]
        _PREP_CACHE[key] = hit
        _PREP_ORDER.append(key)
        while len(_PREP_ORDER) > _PREP_MAX:
            _PREP_CACHE.pop(_PREP_ORDER.pop(0), None)
    if not _trace_clean():
        return hit[1]  # numpy: embeds as constants in the caller's trace
    if hit[2] is None:
        pieces, ch, cl, sv, c0 = hit[1]
        hit[2] = (
            jnp.asarray(pieces),
            jnp.asarray(ch),
            jnp.asarray(cl),
            jnp.asarray(sv),
            c0,
        )
    return hit[2]


def _make_kernel(dims, footprint: int, g: int, lead: int, ksize: int, tq: int):
    ndims = len(dims)
    m = ndims - g  # leading (tail) axes
    pairs = [
        (i, j)
        for i in range(NPIECE_V)
        for j in range(NPIECE_W)
        if i + j <= SMAX
    ]

    k_pad = _pad128(ksize)
    lead_pad = _pad128(lead)

    def kernel(locs_ref, wh_ref, wl_ref, a_ref, ch_ref, cl_ref, sv_ref,
               oh_ref, ol_ref):
        wmats = _build_wmats(locs_ref, wh_ref, wl_ref, dims, footprint, tq)
        cwh, cwl = _combined_weights_df(wmats, dims, g, tq)
        # zero-pad the contraction depth to the 128-aligned table (zero
        # rows multiply zero table columns: exact no-ops on the result)
        if k_pad > ksize:
            z = jnp.zeros((k_pad - ksize, tq), _F32)
            cwh_p = jnp.concatenate([cwh, z], axis=0)
            cwl_p = jnp.concatenate([cwl, z], axis=0)
        else:
            cwh_p, cwl_p = cwh, cwl
        bpieces, fq = _quantize_weights(cwh_p, cwl_p, tq)

        # 35 int8 MXU passes, int32 accumulation per total level s
        groups: dict = {}
        for i, j in pairs:
            t = jax.lax.dot_general(
                a_ref[i], bpieces[j], (((1,), (0,)), ((), ())),
                preferred_element_type=_I32,
            )
            s = i + j
            groups[s] = t if s not in groups else groups[s] + t

        # recombine: exact split conversion up to level 5 (a direct int32
        # -> f32 conversion above 2^24 rounds at 2^-24 of the group, which
        # at level 4 is ~2^-40 of the scale — measured as an error floor);
        # levels 6-7 sit below 2^-54 and convert directly
        th = jnp.zeros((lead_pad, tq), _F32)
        tl = jnp.zeros((lead_pad, tq), _F32)
        for s in sorted(groups):
            lvl = _F32(2.0 ** (-(12 + 7 * s)))
            if s <= 5:
                gh, gl = _exact_i32_to_df(groups[s])
                th, tl = _df_add(th, tl, gh * lvl, gl * lvl)
            else:
                th, tl = _df_add(
                    th, tl, groups[s].astype(_F32) * lvl, jnp.zeros_like(th)
                )

        # restore scales (exact powers of two) and row centers
        sv = sv_ref[:, :]  # (lead, 1)
        th = th * sv * fq
        tl = tl * sv * fq
        # centers: c_r * S_w[q]. S_w = column sum of the combined weight
        # matrix = product over grouped axes of each axis's stencil-weight
        # sum (identical values — densification only places them), computed
        # from the raw (nw, tq) weight rows: no reduction tree, no odd-row
        # slices (Mosaic rejects those).
        swh = swl = None
        for a in range(ndims - g, ndims):
            axh = wh_ref[a * footprint, :].reshape(1, tq)
            axl = wl_ref[a * footprint, :].reshape(1, tq)
            for fp in range(1, footprint):
                axh, axl = _df_add(
                    axh, axl,
                    wh_ref[a * footprint + fp, :].reshape(1, tq),
                    wl_ref[a * footprint + fp, :].reshape(1, tq),
                )
            if swh is None:
                swh, swl = axh, axl
            else:
                swh, swl = _df_mul(swh, swl, axh, axl)
        ph, plo = _df_mul(ch_ref[:, :], cl_ref[:, :], swh, swl)
        th, tl = _df_add(th, tl, ph, plo)
        th, tl = _two_sum(th, tl)
        if lead_pad > lead:
            th = th[:lead]
            tl = tl[:lead]

        # leading-axis tails: normalized double-float segment sums, exactly
        # the df64 engine's tail structure
        lead_k = lead
        for a in range(m - 1, -1, -1):
            lead_k //= dims[a]
            awh, awl = wmats[a]
            g_h = th.reshape(lead_k, dims[a], tq)
            g_l = tl.reshape(lead_k, dims[a], tq)
            sh = jnp.zeros((max(lead_k, 1), tq), _F32)
            sl = jnp.zeros((max(lead_k, 1), tq), _F32)
            for b in range(dims[a]):
                ph, plo = _df_mul(
                    g_h[:, b, :], g_l[:, b, :],
                    awh[b, :].reshape(1, tq), awl[b, :].reshape(1, tq),
                )
                sh, sl = _df_add(sh, sl, ph, plo)
            th, tl = sh, sl

        oh_ref[0, :] = th.reshape(1, tq)[0, :]
        ol_ref[0, :] = tl.reshape(1, tq)[0, :]

    return kernel


@partial(jax.jit, static_argnums=(0, 1))
def _pallas_i8(dims, footprint, locs_mat, wh, wl, pieces, ch, cl, sv):
    ndims = len(dims)
    g, lead, ksize = _shape(dims)
    lead_pad, k_pad = _pad128(lead), _pad128(ksize)
    tq = _tile_q(lead, ksize)
    n = locs_mat.shape[1]
    kernel = _make_kernel(dims, footprint, g, lead, ksize, tq)
    nw = ndims * footprint
    col = lambda i: (0, 0)
    # scoped-VMEM headroom (see pallas_df64): the int32 level groups alone
    # hold up to 8 (lead_pad, tq) i32 planes (8.4 MB at 512x512), plus the
    # piece tables and df temporaries
    params = {
        "compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024
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
                pl.BlockSpec(
                    (NPIECE_V, lead_pad, k_pad), lambda i: (0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec((lead_pad, 1), col, memory_space=pltpu.VMEM),
                pl.BlockSpec((lead_pad, 1), col, memory_space=pltpu.VMEM),
                pl.BlockSpec((lead_pad, 1), col, memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, tq), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tq), lambda i: (0, i), memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((1, n), _F32),
                jax.ShapeDtypeStruct((1, n), _F32),
            ),
        )(locs_mat, wh, wl, pieces, ch, cl, sv)
    return oh, ol


def _eval(dims, starts, steps, grids, vals, obs, method, linearize, prep=None):
    footprint = 2 if method == "linear" else 4
    g, lead, ksize = _shape(dims)
    tq = _tile_q(lead, ksize)
    n = obs[0].shape[0]
    n_pad = ((n + tq - 1) // tq) * tq

    f64 = vals.dtype
    # fused locate + weight extraction (one compiled program — see
    # pallas_df64._weights_jit); wsum = per-axis stencil-weight-sum
    # product in f64, used for the GLOBAL center restoration: the
    # in-kernel center path is double-float (~2^-47 of the center
    # magnitude, ~2e-12 on a ~300-offset table), so the global offset c0
    # is extracted on the host and its contribution c0 * wsum evaluates
    # in f64 (~2^-52); the kernel's df center path only carries the
    # row-to-row residuals.
    from .pallas_df64 import _weights_jit

    ndims = len(dims)
    locs, wh, wl, wsum = _weights_jit(
        tuple(dims), method, bool(linearize), n_pad,
        starts if starts is not None else jnp.zeros(ndims),
        steps if steps is not None else jnp.ones(ndims),
        tuple(grids) if grids is not None else (), obs,
    )
    pieces, ch, cl, sv, c0 = prep if prep is not None else prepare(dims, vals)
    oh, ol = _pallas_i8(
        tuple(dims), footprint, locs, wh, wl, pieces, ch, cl, sv
    )
    base = (oh.astype(f64) + ol.astype(f64)).reshape(-1)[:n]
    return base + c0 * wsum.reshape(-1)


def eval_regular(dims, starts, steps, vals, obs, method, linearize=True,
                 prep=None):
    """int8-multipass f64 evaluation on a regular grid.

    `prep` (from `prepare(dims, vals)`) lets callers that must trace this
    function (dispatch's custom_jvp wrapper) hoist the host-side table
    decomposition out of the trace; without it, `vals` must be concrete."""
    return _eval(
        tuple(dims), starts, steps, None, vals, obs, method, linearize, prep
    )


def eval_rectilinear(grids, vals, obs, method, linearize=True, prep=None):
    """int8-multipass f64 evaluation on a rectilinear grid (see
    eval_regular for `prep`)."""
    dims = tuple(int(g.shape[0]) for g in grids)
    return _eval(dims, None, None, grids, vals, obs, method, linearize, prep)
