"""Pallas v3 kernel (last-axis MXU + segment-sum tail): parity with the
gather path in interpret mode on CPU; throughput is validated on real TPU
hardware (docs/perf.md)."""

import numpy as np
import pytest

import interpn_tpu  # noqa: F401
import jax.numpy as jnp
from jax.experimental import pallas as pl

from interpn_tpu import ops
from interpn_tpu.ops import pallas_v3 as v3


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    orig = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        return orig(*args, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", interp_call)


def _case(dims, seed=0):
    rng = np.random.default_rng(seed)
    starts = jnp.asarray(rng.uniform(-1, 1, len(dims)), jnp.float32)
    steps = jnp.asarray(rng.uniform(0.3, 1.0, len(dims)), jnp.float32)
    vals = jnp.asarray(rng.standard_normal(int(np.prod(dims))), jnp.float32)
    n = 700  # non-multiple of the tile size: exercises padding
    # interpolation plus up to ~2 cells of extrapolation per side (deep
    # extrapolation amplifies the split-bf16x2 term magnitudes by |t|^3 and
    # is equally ill-conditioned on every engine)
    obs = tuple(
        jnp.asarray(
            rng.uniform(
                float(starts[k]) - 2 * float(steps[k]),
                float(starts[k]) + float(steps[k]) * (dims[k] + 1),
                n,
            ),
            jnp.float32,
        )
        for k in range(len(dims))
    )
    return starts, steps, vals, obs


@pytest.mark.parametrize("dims", [(8, 12), (10, 10, 10), (6, 5, 4, 7)])
def test_v3_linear_matches_gather(dims):
    starts, steps, vals, obs = _case(dims)
    a = v3.eval_regular(dims, starts, steps, vals, obs, "linear", True)
    b = ops.linear.linear_regular(dims, starts, steps, vals, obs)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-3)


@pytest.mark.parametrize("linearize", [True, False])
def test_v3_cubic_matches_gather(linearize):
    dims = (8, 8, 8)
    starts, steps, vals, obs = _case(dims, seed=3)
    a = v3.eval_regular(dims, starts, steps, vals, obs, "cubic", linearize)
    b = ops.cubic.cubic_regular(dims, starts, steps, vals, obs, linearize)
    # non-linearized cubic extrapolation amplifies the split-product term
    # magnitudes by |t|^3, so the bf16x2 bound is ~1e-3 relative out there;
    # exact mode (passes=6) restores HIGHEST-level agreement
    tol = dict(rtol=5e-4, atol=2e-3) if linearize else dict(rtol=2e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), **tol)
    a6 = v3.eval_regular(dims, starts, steps, vals, obs, "cubic", linearize, 6)
    # remaining difference is pure f32 association order (contraction vs
    # gather tree) on cancellation-heavy extrapolated points
    np.testing.assert_allclose(np.asarray(a6), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_v3_cubic_5d():
    dims = (4, 5, 4, 5, 4)
    starts, steps, vals, obs = _case(dims, seed=5)
    a = v3.eval_regular(dims, starts, steps, vals, obs, "cubic", True)
    b = ops.cubic.cubic_regular(dims, starts, steps, vals, obs, True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=2e-3)


def test_v3_nearest_matches_gather():
    dims = (9, 11, 7)
    starts, steps, vals, obs = _case(dims, seed=7)
    a = v3.eval_regular(dims, starts, steps, vals, obs, "nearest", True)
    b = ops.nearest.nearest_regular(dims, starts, steps, vals, obs)
    # one-hot selection: results must agree exactly except where a query sits
    # within f32 noise of a tie midpoint (none in this random draw)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_v3_passes_accuracy_ordering():
    """4-pass (full bf16x2) must not be less accurate than 3-pass."""
    dims = (10, 10, 10)
    starts, steps, vals, obs = _case(dims, seed=9)
    b = np.asarray(ops.linear.linear_regular(dims, starts, steps, vals, obs))
    scale = np.max(np.abs(b))
    e3 = np.max(np.abs(np.asarray(
        v3.eval_regular(dims, starts, steps, vals, obs, "linear", True, 3)) - b))
    e4 = np.max(np.abs(np.asarray(
        v3.eval_regular(dims, starts, steps, vals, obs, "linear", True, 4)) - b))
    assert e4 <= e3 + 1e-7 * scale


def test_v3_supported_policy():
    assert v3.supported((20, 20, 20), jnp.float32, "linear")
    assert v3.supported((20, 20, 20), jnp.float32, "nearest")
    assert not v3.supported((20, 20, 20), jnp.float64, "linear")
    assert not v3.supported((20,), jnp.float32, "linear")  # 1D: XLA path
    assert not v3.supported((2048, 2048), jnp.float32, "linear")  # VMEM blowout
    # skewed grids under the table-bytes cap: the per-axis dense weight
    # planes, not the table, are what blows VMEM (compile failure, not a
    # fallback) — refused on sum(dims)
    assert not v3.supported((2, 393216), jnp.float32, "linear")
    assert not v3.supported((2, 16384), jnp.float32, "nearest")
    assert v3.supported((100, 100, 100), jnp.float32, "cubic")


def _rect_case(dims, seed=0):
    rng = np.random.default_rng(seed)
    grids = tuple(
        jnp.asarray(np.cumsum(0.2 + rng.random(d)).astype(np.float32))
        for d in dims
    )
    vals = jnp.asarray(rng.standard_normal(int(np.prod(dims))), jnp.float32)
    n = 700
    obs = tuple(
        jnp.asarray(
            rng.uniform(float(g[0]) - 1.0, float(g[-1]) + 1.0, n), jnp.float32
        )
        for g in grids
    )
    return grids, vals, obs


@pytest.mark.parametrize("dims", [(8, 12), (10, 10, 10), (6, 5, 4, 7)])
def test_v3_rect_linear_matches_gather(dims):
    grids, vals, obs = _rect_case(dims)
    a = v3.eval_rectilinear(grids, vals, obs, "linear", True)
    b = ops.linear.linear_rectilinear(grids, vals, obs)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-3)
    a6 = v3.eval_rectilinear(grids, vals, obs, "linear", True, 6)
    np.testing.assert_allclose(np.asarray(a6), np.asarray(b), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("linearize", [True, False])
def test_v3_rect_cubic_matches_gather(linearize):
    dims = (8, 9, 10)  # distinct axis lengths exercise the +inf row padding
    grids, vals, obs = _rect_case(dims, seed=3)
    a = v3.eval_rectilinear(grids, vals, obs, "cubic", linearize, 6)
    b = ops.cubic.cubic_rectilinear(grids, vals, obs, linearize)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_v3_rect_nearest_matches_gather():
    dims = (9, 11, 7)
    grids, vals, obs = _rect_case(dims, seed=7)
    a = v3.eval_rectilinear(grids, vals, obs, "nearest", True)
    b = ops.nearest.nearest_rectilinear(grids, vals, obs)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_v3_virtual_split_path():
    """20^3 triggers the virtual boundary-axis split (rank-2 two-pass
    contraction, see _choose_split); results must match the gather tree for
    all methods, including runs that wrap a virtual row boundary."""
    dims = (20, 20, 20)
    g, sa, ta = v3._choose_split(dims, 4)
    assert sa is not None and sa * ta == 20 and ta >= 4
    starts, steps, vals, obs = _case(dims, seed=11)
    for method, ref_fn, tol in [
        ("linear", lambda: ops.linear.linear_regular(dims, starts, steps, vals, obs),
         dict(rtol=1e-4, atol=1e-4)),
        ("cubic", lambda: ops.cubic.cubic_regular(dims, starts, steps, vals, obs, True),
         dict(rtol=1e-4, atol=1e-4)),
    ]:
        a = v3.eval_regular(dims, starts, steps, vals, obs, method, True, 6)
        np.testing.assert_allclose(np.asarray(a), np.asarray(ref_fn()), **tol)
        a4 = v3.eval_regular(dims, starts, steps, vals, obs, method, True, 4)
        np.testing.assert_allclose(
            np.asarray(a4), np.asarray(ref_fn()), rtol=2e-3, atol=5e-3
        )
    # nearest: rank-1 (single pass), must stay bit-exact
    a = v3.eval_regular(dims, starts, steps, vals, obs, "nearest", True)
    b = ops.nearest.nearest_regular(dims, starts, steps, vals, obs)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_v3_rect_virtual_split_path():
    """The rectilinear engine shares the unified kernel builder, so 20^3
    triggers the same virtual boundary-axis split; results must match the
    rectilinear gather tree."""
    dims = (20, 20, 20)
    assert v3._choose_split(dims, 4)[1] is not None
    grids, vals, obs = _rect_case(dims, seed=13)
    for method in ("linear", "cubic"):
        a = v3.eval_rectilinear(grids, vals, obs, method, True, 6)
        b = (
            ops.linear.linear_rectilinear(grids, vals, obs)
            if method == "linear"
            else ops.cubic.cubic_rectilinear(grids, vals, obs, True)
        )
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)
    a = v3.eval_rectilinear(grids, vals, obs, "nearest", True)
    b = ops.nearest.nearest_rectilinear(grids, vals, obs)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_v3_cubic_exact_at_grid_nodes():
    """Exact mode must reproduce grid values bit-for-bit at the nodes (the
    same contract the gather, factorized and native engines keep — the
    per-axis weight vector snaps to the unit basis at tt == 0/1)."""
    dims = (20, 20, 20)
    rng = np.random.default_rng(17)
    vals = jnp.asarray(rng.standard_normal(int(np.prod(dims))), jnp.float32)
    starts = jnp.zeros(3, jnp.float32)
    steps = jnp.full(3, 0.5, jnp.float32)
    idx = rng.integers(0, 20, (3, 700))
    obs = tuple(jnp.asarray(idx[k] * 0.5, jnp.float32) for k in range(3))
    flat = (idx[0] * 20 + idx[1]) * 20 + idx[2]
    expected = np.asarray(vals)[flat]
    out = v3.eval_regular(dims, starts, steps, vals, obs, "cubic", True, 6)
    np.testing.assert_array_equal(np.asarray(out), expected)


@pytest.mark.parametrize("method", ["linear", "cubic", "nearest"])
def test_v3_rect_precomputed_weights(method):
    """The XLA-precomputed-weights rectilinear entry must match the
    in-kernel construction (same locate/basis math, different placement)."""
    dims = (20, 20, 20)
    grids, vals, obs = _rect_case(dims, seed=19)
    a = v3.eval_rectilinear_pre(grids, vals, obs, method, True, 6)
    b = v3.eval_rectilinear(grids, vals, obs, method, True, 6)
    if method == "nearest":
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    else:
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-6, atol=2e-6)


def test_v3_regular_precomputed_weights_variant():
    """eval_regular_pre (experimental; in-kernel construction measured
    faster for regular grids and stays the dispatch choice) must agree with
    the main entry."""
    dims = (20, 20, 20)
    starts, steps, vals, obs = _case(dims, seed=23)
    for method in ("linear", "cubic"):
        a = v3.eval_regular_pre(dims, starts, steps, vals, obs, method, True, 6)
        b = v3.eval_regular(dims, starts, steps, vals, obs, method, True, 6)
        # same math, different compiler (XLA vs Mosaic FMA contraction):
        # ulp-level weight differences amplify under extrapolation
        # cancellation to ~1e-4 relative on near-zero results
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)


def test_v3_exact_mode_property_suite():
    """The reference's Rust property tests, applied to the fused engine in
    exact mode (interpret): linear reproduces sum(x_i) exactly over every
    interp/extrap combination; cubic reproduces a quadratic even under
    (non-linearized) extrapolation — the natural-BC property
    (`src/multicubic/regular.rs:680-730`)."""
    import itertools

    dims = (20, 20, 20)
    starts = jnp.zeros(3, jnp.float32)
    steps = jnp.full(3, 0.5, jnp.float32)
    axes = [np.arange(20, dtype=np.float32) * 0.5 for _ in range(3)]
    mesh = np.meshgrid(*axes, indexing="ij")

    # a 3^N observation mesh covering every interp/extrap-low/high combo
    pts = []
    for combo in itertools.product([-0.8, 4.6, 10.3], repeat=3):
        pts.append(combo)
    obs = tuple(
        jnp.asarray(np.array([p[k] for p in pts]), jnp.float32) for k in range(3)
    )

    vals_lin = jnp.asarray(sum(mesh).ravel(), jnp.float32)
    out = v3.eval_regular(dims, starts, steps, vals_lin, obs, "linear", True, 6)
    expected = np.sum(np.stack([np.asarray(o) for o in obs]), axis=0)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=2e-6, atol=2e-5)

    vals_quad = jnp.asarray(
        sum((m - 3.0) ** 2 for m in mesh).ravel(), jnp.float32
    )
    out = v3.eval_regular(dims, starts, steps, vals_quad, obs, "cubic", False, 6)
    expected = np.sum(
        np.stack([(np.asarray(o) - 3.0) ** 2 for o in obs]), axis=0
    )
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5, atol=2e-4)


def test_df64_quadratic_extrapolation_property():
    """Double-float engine: quadratic reproduced under extrapolation at
    ~f64-level accuracy (the reference asserts atol 1e-10 for true f64)."""
    from interpn_tpu.ops import pallas_df64 as df

    dims = (12, 12)
    starts = jnp.zeros(2)
    steps = jnp.ones(2)
    axes = [np.arange(12, dtype=np.float64) for _ in range(2)]
    mesh = np.meshgrid(*axes, indexing="ij")
    vals = jnp.asarray(sum((m - 4.0) ** 2 for m in mesh).ravel())
    rng = np.random.default_rng(3)
    obs = tuple(jnp.asarray(rng.uniform(-2.0, 13.0, 500)) for _ in range(2))
    out = df.eval_regular(dims, starts, steps, vals, obs, "cubic", False)
    expected = sum((np.asarray(o) - 4.0) ** 2 for o in obs)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-10, atol=1e-9)


def test_jvp_through_jit_selects_custom_rule(monkeypatch):
    """jax.jvp of an ALREADY-JITTED pallas-dispatched eval must work: trace-
    time tracer detection cannot see AD applied to a stored jaxpr, so the
    dispatch wraps fused calls in jax.custom_jvp whose tangent evaluates
    through the differentiable gather tree (running gradient_jax on real
    TPU raised NotImplementedError for pltpu.repeat before this)."""
    import jax

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    from interpn_tpu.ops import dispatch

    dims = (20, 20, 20)
    starts = jnp.zeros(3, jnp.float32)
    steps = jnp.full(3, 0.5, jnp.float32)
    rng = np.random.default_rng(5)
    vals = jnp.asarray(rng.standard_normal(8000), jnp.float32)
    rest = (jnp.full(2048, 3.3, jnp.float32), jnp.full(2048, 4.4, jnp.float32))

    @jax.jit
    def f(x):
        return dispatch.cubic_regular(
            dims, starts, steps, vals, (x, *rest), True
        )

    x0 = jnp.asarray(rng.uniform(0, 9.5, 2048), jnp.float32)
    y, dy = jax.jvp(f, (x0,), (jnp.ones_like(x0),))
    # tangent must match the gather tree's directional derivative
    gref = lambda x: ops.cubic.cubic_regular(dims, starts, steps, vals, (x, *rest), True)
    yr, dyr = jax.jvp(gref, (x0,), (jnp.ones_like(x0),))
    np.testing.assert_allclose(np.asarray(y), np.asarray(yr), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dy), np.asarray(dyr), rtol=1e-4, atol=1e-4)
    # and grad-of-sum through the jitted function works
    g = jax.grad(lambda x: jnp.sum(f(x)))(x0)
    assert np.isfinite(np.asarray(g)).all()


def test_v3_split_with_deep_lead_tail():
    """8^5 nearest splits with TWO lead axes remaining after the boundary
    reduction (split=True, m=2: _choose_split group=2, sa=4, ta=2) — the
    flavor that exercises the non-merged split tail followed by the
    next_axis==1 merged outer product. Review finding: this reachable
    layout combination had no parity coverage."""
    dims = (8, 8, 8, 8, 8)
    g, sa, ta = v3._choose_split(dims, 1)  # nearest footprint
    assert g == 2 and sa is not None and len(dims) - g - 1 == 2
    starts, steps, vals, obs = _case(dims, seed=23)
    a = v3.eval_regular(dims, starts, steps, vals, obs, "nearest", True)
    b = ops.nearest.nearest_regular(dims, starts, steps, vals, obs)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # linear/cubic at the same dims run unsplit with m=2 (next_axis==1
    # merged tail after a plain MXU stage)
    for method, ref in [
        ("linear", lambda: ops.linear.linear_regular(dims, starts, steps, vals, obs)),
        ("cubic", lambda: ops.cubic.cubic_regular(dims, starts, steps, vals, obs, True)),
    ]:
        out = v3.eval_regular(dims, starts, steps, vals, obs, method, True, 6)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref()), rtol=1e-4, atol=1e-4
        )
