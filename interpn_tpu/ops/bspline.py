"""Tensor-product B-spline interpolation (scipy's ``cubic`` / ``quintic``).

Beyond-reference capability: the reference library's cubic family is the
LOCAL Hermite scheme (centered differences, `src/multicubic/mod.rs:68-117`),
while scipy's `RegularGridInterpolator` methods ``cubic`` and ``quintic``
are GLOBAL tensor-product interpolating splines (degree-3/5, not-a-knot
boundary).  Migrating scipy users need the global splines for their C^2/C^4
smoothness; this module supplies them so the compat adapter is a complete
drop-in for every scipy RGI method.

Semantics match scipy 1.17 (probed, not copied):

* Per axis, coefficients solve the square not-a-knot collocation problem —
  knots ``[x0]*(k+1) + x[(k+1)//2 : -(k+1)//2] + [x_last]*(k+1)`` (de Boor
  XIII(12); the same vector scipy's ``make_interp_spline`` builds for its
  default ``bc_type=None``), basis evaluated at the data sites.  The spline
  fit is linear in the data, so solving axis-by-axis in any order yields the
  unique tensor-product interpolant — the function scipy's recursive 1-d
  fits evaluate pointwise.
* Out-of-bounds queries evaluate the end span's polynomial (scipy's
  ``extrapolate=True``): the de Boor span is clamped to ``[k, n-1]`` and the
  basis recursion extends the boundary polynomial naturally.
* Minimum points per axis: ``k + 1`` (scipy enforces 4 for cubic, 6 for
  quintic at the adapter layer).

The split mirrors the package's other engines: table preparation (the banded
collocation solves) runs ONCE on host numpy — tables are concrete by
contract, and a per-axis direct solve is sequential work the TPU is wrong
for — while evaluation is a batched JAX program: per-axis span location +
vectorized Cox-de Boor weights, then the ``(k+1)^N`` flat-gather stencil
tree of `ops/_gather.py` reduced with separable weights (the same shape as
the multicubic tree, so it vectorizes, jits, and shards identically).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..utils import c_strides
from . import locate
from ._chunk import chunk_queries
from ._gather import LIST_MAX_VERTS, gather_corners, gather_corners_matrix, take_small

_I32 = jnp.int32


# ---------------------------------------------------------------------------
# Host-side preparation: not-a-knot knot vectors + collocation solves
# ---------------------------------------------------------------------------


def not_a_knot_knots(x: np.ndarray, k: int) -> np.ndarray:
    """Not-a-knot knot vector for data sites `x` and odd degree `k`:
    full-multiplicity end knots, interior knots = the data sites with the
    (k-1)/2 sites adjacent to each boundary removed (de Boor XIII(12))."""
    if k % 2 != 1:
        raise ValueError("not-a-knot requires odd spline degree")
    x = np.asarray(x, dtype=np.float64)
    m = (k - 1) // 2
    interior = x[m + 1 : x.size - (m + 1)]
    return np.concatenate([np.full(k + 1, x[0]), interior, np.full(k + 1, x[-1])])


def _basis_row_np(t: np.ndarray, span: int, x: float, k: int) -> np.ndarray:
    """The k+1 nonzero B-spline basis values at `x` in `span` (Cox-de Boor
    triangular recursion, host scalar form for collocation-matrix rows)."""
    N = np.zeros(k + 1)
    N[0] = 1.0
    for j in range(1, k + 1):
        saved = 0.0
        for r in range(j):
            den = t[span + r + 1] - t[span + r + 1 - j]
            temp = N[r] / den
            N[r] = saved + (t[span + r + 1] - x) * temp
            saved = (x - t[span + r + 1 - j]) * temp
        N[j] = saved
    return N


def _solve_axis(x: np.ndarray, t: np.ndarray, k: int, rhs: np.ndarray) -> np.ndarray:
    """Solve the square collocation system B(x_i) c = rhs along axis 0.

    The matrix is banded — site x_i touches the k+1 consecutive
    coefficients [span_i - k, span_i] — so it is assembled and solved in
    banded form (scipy ``solve_banded`` LU): O(n*k^2) time and O(n*k)
    memory instead of the dense O(n^3)/O(n^2), which kept axes above a few
    thousand points out of reach on a 1-core host."""
    n = x.size
    spans = np.clip(np.searchsorted(t, x, side="right") - 1, k, n - 1)
    # band extents from the actual span pattern (not-a-knot end rows sit
    # off the main diagonal by up to k)
    idx = np.arange(n)
    l = int(np.max(idx - (spans - k)))
    u = int(np.max(spans - idx))
    ab = np.zeros((l + u + 1, n))
    for i in range(n):
        s = int(spans[i])
        row = _basis_row_np(t, s, float(x[i]), k)
        for r in range(k + 1):
            j = s - k + r
            ab[u + i - j, j] = row[r]
    from scipy.linalg import solve_banded

    return solve_banded((l, u), ab, rhs)


def prep_bspline(grids, vals, k: int):
    """Host preparation: per-axis not-a-knot knots + tensor-product
    coefficients.

    grids: list of strictly-ascending 1D float64 arrays; vals: flat C-order
    table (prod(dims),) or (prod(dims), nch) with a trailing channel axis.
    Returns (knots, coeffs) with coeffs flattened the same way."""
    grids = [np.asarray(g, dtype=np.float64) for g in grids]
    dims = tuple(int(g.size) for g in grids)
    vals = np.asarray(vals, dtype=np.float64)
    trailing = vals.shape[1:]  # () or (nch,)
    c = vals.reshape(dims + trailing)
    knots = []
    for ax, x in enumerate(grids):
        if x.size < k + 1:
            raise ValueError(
                f"degree-{k} spline needs at least {k + 1} points per axis"
            )
        t = not_a_knot_knots(x, k)
        knots.append(t)
        cm = np.moveaxis(c, ax, 0)
        sol = _solve_axis(x, t, k, cm.reshape(x.size, -1))
        c = np.moveaxis(sol.reshape(cm.shape), 0, ax)
    return knots, np.ascontiguousarray(c.reshape(vals.shape))


# Prepared-coefficient cache: one-shot callers (`interpn(method=...)`, the
# scipy adapter) re-present the same concrete table every call; keying the
# collocation solve by CONTENT (like ops.pallas_i8's prep caches) makes
# repeat evaluation pay only the device eval. Host arrays hash; keys also
# cover the grids, so reshaped/reused tables on different axes miss safely.
_PREP_CACHE: dict = {}
_PREP_ORDER: list = []
_PREP_MAX = 8


def _content_key(arrays, k: int):
    import hashlib

    h = hashlib.blake2b(digest_size=16)
    parts = []
    for a in arrays:
        buf = a if a.flags.c_contiguous else np.ascontiguousarray(a)
        h.update(buf)
        parts.append((buf.dtype.str, buf.shape))
    return (h.digest(), tuple(parts), k)


def prep_bspline_cached(grids, vals, k: int):
    """Content-cached :func:`prep_bspline` for host-resident inputs."""
    grids = [np.asarray(g, dtype=np.float64) for g in grids]
    vals = np.asarray(vals, dtype=np.float64)
    key = _content_key(grids + [vals], k)
    hit = _PREP_CACHE.get(key)
    if hit is not None:
        return hit
    prep = prep_bspline(grids, vals, k)
    _PREP_CACHE[key] = prep
    _PREP_ORDER.append(key)
    while len(_PREP_ORDER) > _PREP_MAX:
        _PREP_CACHE.pop(_PREP_ORDER.pop(0), None)
    return prep


# ---------------------------------------------------------------------------
# Device-side evaluation
# ---------------------------------------------------------------------------


def _basis_weights(t, span, x, k: int):
    """Vectorized Cox-de Boor: the k+1 nonzero basis values per query.

    `t` is the knot array, `span` int32 per query (clamped to [k, n-1]),
    `x` the query coordinates.  Knot accesses are flat 1-D takes of a tiny
    array (per-query span offsets -k+1..k), which the TPU backend compiles
    cheaply — never a multi-dimensional gather."""
    tk = {off: take_small(t, span + off) for off in range(-k + 1, k + 1)}
    N = [jnp.ones_like(x)] + [jnp.zeros_like(x) for _ in range(k)]
    for j in range(1, k + 1):
        saved = jnp.zeros_like(x)
        for r in range(j):
            den = tk[r + 1] - tk[r + 1 - j]
            temp = N[r] / den
            N[r] = saved + (tk[r + 1] - x) * temp
            saved = (x - tk[r + 1 - j]) * temp
        N[j] = saved
    return N


def spline_locs_weights(knots, obs, k: int):
    """Per-axis (loc, [w_0..w_k]) for the tensor-product spline: the de
    Boor span clamped to [k, n-1] (out-of-bounds queries extrapolate the
    end span's polynomial), rebased to the coefficient index `span - k`,
    and the k+1 nonzero Cox-de Boor basis values. This is the SAME
    located-stencil shape the linear/cubic engines consume, so every
    contraction engine (gather tree, fused Pallas, double-float) plugs in
    the same way."""
    out = []
    for ax, t in enumerate(knots):
        t = jnp.asarray(t)
        n = int(t.shape[0]) - k - 1
        x = obs[ax]
        span = jnp.clip(
            locate.searchsorted(t, x, side="right").astype(_I32) - 1, k, n - 1
        )
        out.append((span - k, _basis_weights(t, span, x, k)))
    return out


def bspline_eval(knots, coeffs, obs, k: int):
    """Tensor-product B-spline evaluation with engine dispatch.

    knots: per-axis not-a-knot knot arrays (length n_i + k + 1); coeffs:
    flat C-order coefficient table from :func:`prep_bspline`; obs: per-axis
    query arrays.  Extrapolates the end-span polynomial out of bounds.

    Engine selection mirrors ops.dispatch: the spline is LINEAR in the
    coefficients with separable per-axis weights — exactly the shape the
    fused engines exploit — so eligible f32 TPU traces run the fused
    Pallas contraction (pallas_v3's precomputed-weights kernel) and f64
    runs the double-float VPU engine (pallas_df64), both wrapped in
    custom_jvp with gather-tree tangents. Everything else (CPU, tracers
    under vmap/AD, over-cap grids, small batches) takes the flat-gather
    stencil tree below."""
    engine = _spline_engine(knots, coeffs, obs, k)
    if engine is not None:
        return engine(knots, coeffs, obs, k)
    ndims = len(knots)
    nverts = (k + 1) ** ndims
    if nverts > LIST_MAX_VERTS and getattr(obs[0], "ndim", 1) == 1:
        return chunk_queries(
            lambda ob: _bspline_impl(knots, coeffs, ob, k),
            obs, nverts, jnp.asarray(coeffs).dtype.itemsize,
        )
    return _bspline_impl(knots, coeffs, obs, k)


def bspline_eval_stack(knots, coeffs_stack, obs, k: int):
    """Evaluate an (nch, prod(dims)) STACK of coefficient tables sharing
    one knot set at the same points -> (nch, n).

    Eligible f32 TPU traces fuse all channels behind ONE Cox-de Boor
    weight build (`pallas_v3.eval_bspline_stack`, mirroring the core
    families' stack kernels); everything else vmaps the single-table
    evaluation, which itself dispatches (the f64 double-float engine has
    no stack kernel — its channel cost is the contraction, not the weight
    build, so vmap loses nothing structural there)."""
    import os

    import jax

    from . import dispatch as _dispatch

    obs0 = obs[0]
    mode = os.environ.get("INTERPN_TPU_IMPL", "auto")
    dims = tuple(int(t.shape[0]) - k - 1 for t in knots)
    nch = int(coeffs_stack.shape[0])
    if (
        mode in ("auto", "pallas")
        and getattr(obs0, "ndim", 1) == 1
        and jax.default_backend() == "tpu"
        and _dispatch._plain_trace(obs0)
        and _dispatch._plain_trace(coeffs_stack)
        and jnp.asarray(coeffs_stack).dtype == jnp.float32
        and (mode == "pallas" or obs0.size >= _dispatch.MIN_PALLAS_QUERIES)
        and (
            mode == "pallas"
            or np.prod(dims) <= _dispatch.MAX_PALLAS_GRID["cubic"]
        )
    ):
        from . import pallas_v3 as _pv3

        if _pv3.supported_stack(dims, nch, jnp.float32, f"bspline{k}"):
            ng = len(knots)

            def prim(*a):
                return _pv3.eval_bspline_stack(
                    a[:ng], a[ng], a[ng + 1:], k, _dispatch._pallas_passes()
                )

            def gat(*a):
                return jax.vmap(
                    lambda c: _bspline_gather(a[:ng], c, a[ng + 1:], k)
                )(a[ng])

            return _dispatch._with_gather_jvp(prim, gat)(
                *knots, coeffs_stack, *obs
            )
    return jax.vmap(lambda c: bspline_eval(knots, c, obs, k))(coeffs_stack)


def _spline_engine(knots, coeffs, obs, k: int):
    """The fused-engine route for this trace, or None for the gather tree."""
    import os

    import jax

    mode = os.environ.get("INTERPN_TPU_IMPL", "auto")
    if mode in ("gather", "factorized"):
        return None
    from . import dispatch as _dispatch

    obs0 = obs[0]
    if (
        getattr(obs0, "ndim", 1) != 1
        or jax.default_backend() != "tpu"
        or not _dispatch._plain_trace(obs0)
        or not _dispatch._plain_trace(coeffs)
    ):
        return None
    if mode != "pallas" and obs0.size < _dispatch.MIN_PALLAS_QUERIES:
        return None
    dims = tuple(int(t.shape[0]) - k - 1 for t in knots)
    dtype = jnp.asarray(coeffs).dtype
    if dtype == jnp.float32:
        from . import pallas_v3 as _pv3

        if not _pv3.supported(dims, jnp.float32, f"bspline{k}"):
            return None
        if mode != "pallas" and np.prod(dims) > _dispatch.MAX_PALLAS_GRID["cubic"]:
            return None

        def run(kn, cf, ob, kk):
            ng = len(kn)
            prim = lambda *a: _pv3.eval_bspline(
                a[:ng], a[ng], a[ng + 1:], kk, _dispatch._pallas_passes()
            )
            gat = lambda *a: _bspline_gather(a[:ng], a[ng], a[ng + 1:], kk)
            return _dispatch._with_gather_jvp(prim, gat)(*kn, cf, *ob)

        return run
    if dtype == jnp.float64 and mode != "pallas":
        from . import pallas_df64 as _pdf

        if not _pdf.supported(dims, f"bspline{k}"):
            return None

        def run(kn, cf, ob, kk):
            ng = len(kn)
            prim = lambda *a: _pdf.eval_bspline(a[:ng], a[ng], a[ng + 1:], kk)
            gat = lambda *a: _bspline_gather(a[:ng], a[ng], a[ng + 1:], kk)
            return _dispatch._with_gather_jvp(prim, gat)(*kn, cf, *ob)

        return run
    return None


def _bspline_gather(knots, coeffs, obs, k: int):
    """The gather-tree evaluation (chunked), used directly and as the
    differentiable tangent path for the fused engines."""
    ndims = len(knots)
    nverts = (k + 1) ** ndims
    if nverts > LIST_MAX_VERTS and getattr(obs[0], "ndim", 1) == 1:
        return chunk_queries(
            lambda ob: _bspline_impl(knots, coeffs, ob, k),
            obs, nverts, jnp.asarray(coeffs).dtype.itemsize,
        )
    return _bspline_impl(knots, coeffs, obs, k)


def _bspline_impl(knots, coeffs, obs, k: int):
    ndims = len(knots)
    dims = tuple(int(t.shape[0]) - k - 1 for t in knots)
    strides = c_strides(dims)
    base = jnp.zeros(obs[0].shape, dtype=_I32)
    wts = []
    for ax, (loc, ws) in enumerate(spline_locs_weights(knots, obs, k)):
        base = base + loc * strides[ax]
        wts.append(ws)

    width = k + 1
    if width**ndims <= LIST_MAX_VERTS:
        c = gather_corners(coeffs, base, dims, width)
        # vertex lists carry dim 0 in the lowest base-(k+1) digit; reduce by
        # grouping the TOP digit so each level contracts one axis's weights
        for w in reversed(wts):
            q = len(c) // width
            c = [
                sum(w[r] * c[j + r * q] for r in range(width))
                for j in range(q)
            ]
        return c[0]

    # Large-stencil tail (6^N or high-D): one batched gather + vectorized
    # reduction, as in the cubic/pchip trees.
    c = gather_corners_matrix(coeffs, base, dims, width)
    for w in reversed(wts):
        g = c.reshape(width, c.shape[0] // width, *c.shape[1:])
        c = sum(w[r] * g[r] for r in range(width))
    return c[0]


_JITTED = None


def jitted_eval():
    """The shared jitted evaluator (degree is a static argument; jax caches
    executables per degree and shape under the one traced function)."""
    global _JITTED
    if _JITTED is None:
        import jax

        _JITTED = jax.jit(bspline_eval, static_argnums=3)
    return _JITTED
