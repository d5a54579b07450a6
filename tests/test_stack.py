"""Stacked-table (multi-channel) evaluation: the fused kernel in interpret
mode vs per-channel evaluation, the dispatch fallbacks, and the public
`interpn_stack` helper. Throughput scaling is validated on real TPU
hardware (benches/exp_stack.py, docs/perf.md)."""

import numpy as np
import pytest

import interpn_tpu
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from interpn_tpu import ops
from interpn_tpu.ops import pallas_v3 as v3
from interpn_tpu.ops import stack as st


@pytest.fixture()
def interpret_mode(monkeypatch):
    orig = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        return orig(*args, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", interp_call)


def _case(dims, nch, seed=0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    starts = jnp.asarray(rng.uniform(-1, 1, len(dims)), dtype)
    steps = jnp.asarray(rng.uniform(0.3, 1.0, len(dims)), dtype)
    vals = jnp.asarray(
        rng.standard_normal((nch, int(np.prod(dims)))), dtype
    )
    n = 700
    obs = tuple(
        jnp.asarray(
            rng.uniform(
                float(starts[k]) - 2 * float(steps[k]),
                float(starts[k]) + float(steps[k]) * (dims[k] + 1),
                n,
            ),
            dtype,
        )
        for k in range(len(dims))
    )
    return starts, steps, vals, obs


# ---------------------------------------------------------------------
# Fused kernel (interpret mode): stack output == per-channel kernel output
# ---------------------------------------------------------------------


@pytest.mark.parametrize("dims", [(8, 12), (10, 10, 10), (6, 5, 4, 7)])
@pytest.mark.parametrize("method", ["linear", "cubic", "nearest"])
def test_stack_kernel_matches_per_channel(interpret_mode, dims, method):
    starts, steps, vals, obs = _case(dims, nch=3, seed=1)
    got = v3.eval_regular_stack(dims, starts, steps, vals, obs, method, True)
    assert got.shape == (3, obs[0].shape[0])
    for c in range(3):
        ref = v3.eval_regular(dims, starts, steps, vals[c], obs, method, True)
        # identical arithmetic per row when the group/split choice agrees;
        # nch can legitimately change the chosen layout, so compare at f32
        # association-order tolerance
        np.testing.assert_allclose(
            np.asarray(got[c]), np.asarray(ref), rtol=2e-5, atol=2e-5,
            err_msg=f"channel {c} ({method}, {dims})",
        )


def test_stack_kernel_single_channel_identity(interpret_mode):
    """nch=1 must agree with the single-channel kernel bit-for-bit (the
    layout choice and every expression reduce to the validated path)."""
    dims = (10, 10, 10)
    starts, steps, vals, obs = _case(dims, nch=1, seed=2)
    got = v3.eval_regular_stack(dims, starts, steps, vals, obs, "cubic", True)
    ref = v3.eval_regular(dims, starts, steps, vals[0], obs, "cubic", True)
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(ref))


def test_stack_kernel_nearest_bit_exact(interpret_mode):
    """Nearest one-hot selection reproduces grid values exactly per channel."""
    dims = (9, 11)
    starts, steps, vals, obs = _case(dims, nch=4, seed=3)
    got = v3.eval_regular_stack(dims, starts, steps, vals, obs, "nearest", True)
    for c in range(4):
        ref = np.asarray(
            ops.nearest.nearest_regular(dims, starts, steps, vals[c], obs)
        )
        np.testing.assert_array_equal(np.asarray(got[c]), ref)


def test_stack_kernel_rectilinear(interpret_mode):
    dims = (9, 8, 7)
    rng = np.random.default_rng(5)
    grids = tuple(
        jnp.asarray(np.cumsum(rng.uniform(0.2, 1.0, d)), jnp.float32)
        for d in dims
    )
    vals = jnp.asarray(rng.standard_normal((3, int(np.prod(dims)))), jnp.float32)
    n = 500
    obs = tuple(
        jnp.asarray(
            rng.uniform(float(g[0]) - 0.5, float(g[-1]) + 0.5, n), jnp.float32
        )
        for g in grids
    )
    for method in ("linear", "cubic", "nearest"):
        got = v3.eval_rectilinear_stack(grids, vals, obs, method, True)
        for c in range(3):
            ref = v3.eval_rectilinear_pre(grids, vals[c], obs, method, True)
            np.testing.assert_allclose(
                np.asarray(got[c]), np.asarray(ref), rtol=2e-5, atol=2e-5,
                err_msg=f"{method} channel {c}",
            )


def test_supported_stack_limits():
    assert v3.supported_stack((20, 20, 20), 8, jnp.float32, "linear")
    assert not v3.supported_stack((20, 20, 20), 0, jnp.float32, "linear")
    assert not v3.supported_stack((20, 20, 20), 8, jnp.float64, "linear")
    # table cap: 100^3 f32 is already at the VMEM ceiling; 2 channels exceed
    assert not v3.supported_stack((100, 100, 100), 2, jnp.float32, "cubic")


# ---------------------------------------------------------------------
# Dispatch fallbacks (CPU: vmap / per-channel loop) vs single-channel
# ---------------------------------------------------------------------


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
@pytest.mark.parametrize("method", ["linear", "cubic", "nearest"])
def test_stack_dispatch_regular(method, dtype):
    dims = (8, 9, 7)
    starts, steps, vals, obs = _case(dims, nch=3, seed=7, dtype=dtype)
    fn = {
        "linear": ops.linear_regular_stack,
        "cubic": ops.cubic_regular_stack,
        "nearest": ops.nearest_regular_stack,
    }[method]
    got = fn(dims, starts, steps, vals, obs)
    assert got.shape == (3, obs[0].shape[0])
    single = {
        "linear": ops.linear_regular,
        "cubic": ops.cubic_regular,
        "nearest": ops.nearest_regular,
    }[method]
    for c in range(3):
        args = (dims, starts, steps, vals[c], obs)
        ref = single(*args) if method != "cubic" else single(*args, True)
        np.testing.assert_array_equal(np.asarray(got[c]), np.asarray(ref))


@pytest.mark.parametrize("method", ["linear", "cubic", "nearest"])
def test_stack_dispatch_rectilinear(method):
    dims = (8, 9, 7)
    rng = np.random.default_rng(11)
    grids = tuple(
        jnp.asarray(np.cumsum(rng.uniform(0.2, 1.0, d)), jnp.float64)
        for d in dims
    )
    vals = jnp.asarray(rng.standard_normal((2, int(np.prod(dims)))))
    n = 400
    obs = tuple(
        jnp.asarray(rng.uniform(float(g[0]) - 0.5, float(g[-1]) + 0.5, n))
        for g in grids
    )
    fn = {
        "linear": ops.linear_rectilinear_stack,
        "cubic": ops.cubic_rectilinear_stack,
        "nearest": ops.nearest_rectilinear_stack,
    }[method]
    single = {
        "linear": ops.linear_rectilinear,
        "cubic": ops.cubic_rectilinear,
        "nearest": ops.nearest_rectilinear,
    }[method]
    got = fn(grids, vals, obs)
    for c in range(2):
        args = (grids, vals[c], obs)
        ref = single(*args) if method != "cubic" else single(*args, True)
        np.testing.assert_array_equal(np.asarray(got[c]), np.asarray(ref))


def test_stack_dispatch_under_jit_and_grad():
    """The stack ops stay jittable and the vmap fallback differentiates."""
    dims = (6, 7)
    starts, steps, vals, obs = _case(dims, nch=2, seed=13, dtype=np.float64)

    f = jax.jit(
        lambda v: jnp.sum(ops.linear_regular_stack(dims, starts, steps, v, obs))
    )
    assert np.isfinite(float(f(vals)))
    g = jax.grad(lambda v: jnp.sum(
        ops.cubic_regular_stack(dims, starts, steps, v, obs, True)
    ))(vals)
    assert g.shape == vals.shape
    assert bool(jnp.isfinite(g).all())


# ---------------------------------------------------------------------
# Public helper
# ---------------------------------------------------------------------


def test_interpn_stack_matches_interpn():
    rng = np.random.default_rng(17)
    x = np.linspace(0.0, 1.0, 12)
    y = np.linspace(-1.0, 2.0, 9)
    grids = [x, y]
    vals = rng.standard_normal((4, 12, 9))
    obs = [rng.uniform(-0.2, 1.2, (25, 2))[:, 0], rng.uniform(-1.2, 2.2, 25)]
    for method in ("linear", "cubic", "nearest"):
        got = interpn_tpu.interpn_stack(obs, grids, vals, method=method)
        assert got.shape == (4, 25)
        for c in range(4):
            ref = interpn_tpu.interpn(obs, grids, vals[c].ravel(), method=method)
            if method == "nearest":
                # pure selection: identical values whatever the engine
                np.testing.assert_array_equal(got[c], ref)
            else:
                # interpn routes small batches to the native C++ kernels;
                # the stack evaluates on the JAX path — same math, different
                # association order
                np.testing.assert_allclose(got[c], ref, rtol=1e-13, atol=1e-14)


def test_interpn_stack_rectilinear_autodetect():
    rng = np.random.default_rng(19)
    gx = np.cumsum(rng.uniform(0.2, 1.0, 10))
    gy = np.cumsum(rng.uniform(0.2, 1.0, 8))
    vals = rng.standard_normal((3, 10, 8)).astype(np.float32)
    obs = [
        rng.uniform(gx[0], gx[-1], 30).astype(np.float32),
        rng.uniform(gy[0], gy[-1], 30).astype(np.float32),
    ]
    got = interpn_tpu.interpn_stack(
        obs, [gx.astype(np.float32), gy.astype(np.float32)], vals,
        method="linear",
    )
    for c in range(3):
        ref = interpn_tpu.interpn(
            obs, [gx.astype(np.float32), gy.astype(np.float32)],
            vals[c].ravel(), method="linear",
        )
        np.testing.assert_allclose(got[c], ref, rtol=2e-6, atol=2e-6)


def test_interpn_stack_obs_shape_round_trip():
    rng = np.random.default_rng(23)
    x = np.linspace(0.0, 1.0, 6)
    vals = rng.standard_normal((2, 6, 6))
    ox = rng.uniform(0, 1, (5, 4))
    oy = rng.uniform(0, 1, (5, 4))
    got = interpn_tpu.interpn_stack([ox, oy], [x, x], vals)
    assert got.shape == (2, 5, 4)


def test_interpn_stack_errors():
    x = np.linspace(0.0, 1.0, 6)
    vals = np.zeros((2, 36))
    obs = [np.full(4, 0.5), np.full(4, 0.5)]
    with pytest.raises(ValueError, match="violate interpolator bounds"):
        interpn_tpu.interpn_stack(
            [np.full(4, 2.0), np.full(4, 0.5)], [x, x], vals,
            check_bounds=True,
        )
    with pytest.raises(AssertionError, match="Size of value array"):
        interpn_tpu.interpn_stack(obs, [x, x], np.zeros((2, 35)))
    with pytest.raises(AssertionError, match="Dimension mismatch"):
        interpn_tpu.interpn_stack(obs, [x, x], np.zeros(36))
    with pytest.raises(TypeError, match="share one float dtype"):
        interpn_tpu.interpn_stack(
            [o.astype(np.float32) for o in obs], [x, x], vals
        )
    with pytest.raises(AssertionError, match="float32 and float64"):
        interpn_tpu.interpn_stack(obs, [x, x], vals.astype(np.int32))


# ---------------------------------------------------------------------
# Routing branches, CPU-covered (interpret mode + patched backend): the
# fused-stack route and the f64 concrete channel-loop (stack.py)
# ---------------------------------------------------------------------


def _routing_case(dims, nch, seed, dtype=np.float32, n=1536):
    rng = np.random.default_rng(seed)
    starts = jnp.asarray(rng.uniform(-1, 1, len(dims)), dtype)
    steps = jnp.asarray(rng.uniform(0.3, 1.0, len(dims)), dtype)
    vals = jnp.asarray(rng.standard_normal((nch, int(np.prod(dims)))), dtype)
    obs = tuple(
        jnp.asarray(
            rng.uniform(
                float(starts[k]) - 2 * float(steps[k]),
                float(starts[k]) + float(steps[k]) * (dims[k] + 1),
                n,
            ),
            dtype,
        )
        for k in range(len(dims))
    )
    return starts, steps, vals, obs


@pytest.mark.parametrize("method", ["linear", "cubic"])
def test_stack_routing_selects_fused_kernel(interpret_mode, monkeypatch, method):
    """With a TPU-shaped decision environment the stack dispatcher takes
    the fused pallas-stack route (asserted via spy), and the fused result
    matches the vmapped gather tree."""
    monkeypatch.setattr(st.jax, "default_backend", lambda: "tpu")
    dims = (8, 9, 7)
    starts, steps, vals, obs = _routing_case(dims, nch=3, seed=21)
    called = []
    real = v3.eval_regular_stack

    def spy(*a, **k):
        called.append(True)
        return real(*a, **k)

    monkeypatch.setattr(st._pv3, "eval_regular_stack", spy)
    fn = {
        "linear": ops.linear_regular_stack,
        "cubic": ops.cubic_regular_stack,
    }[method]
    got = np.asarray(fn(dims, starts, steps, vals, obs))
    assert called, "fused stack kernel was not selected"
    from interpn_tpu.ops.cubic import cubic_regular as cubic_gather
    from interpn_tpu.ops.linear import linear_regular as linear_gather

    for c in range(3):
        if method == "linear":
            ref = linear_gather(dims, starts, steps, vals[c], obs)
        else:
            ref = cubic_gather(dims, starts, steps, vals[c], obs, True)
        np.testing.assert_allclose(
            got[c], np.asarray(ref), rtol=2e-4, atol=2e-4
        )


def test_stack_routing_rectilinear_fused(interpret_mode, monkeypatch):
    monkeypatch.setattr(st.jax, "default_backend", lambda: "tpu")
    rng = np.random.default_rng(22)
    dims = (9, 8, 7)
    grids = tuple(
        jnp.asarray(np.cumsum(rng.uniform(0.2, 1.0, d)), jnp.float32)
        for d in dims
    )
    vals = jnp.asarray(rng.standard_normal((2, int(np.prod(dims)))), jnp.float32)
    obs = tuple(
        jnp.asarray(
            rng.uniform(float(g[0]) - 0.5, float(g[-1]) + 0.5, 1536),
            jnp.float32,
        )
        for g in grids
    )
    called = []
    real = v3.eval_rectilinear_stack

    def spy(*a, **k):
        called.append(True)
        return real(*a, **k)

    monkeypatch.setattr(st._pv3, "eval_rectilinear_stack", spy)
    got = np.asarray(ops.linear_rectilinear_stack(grids, vals, obs))
    assert called
    from interpn_tpu.ops.linear import linear_rectilinear as gather

    for c in range(2):
        np.testing.assert_allclose(
            got[c], np.asarray(gather(grids, vals[c], obs)), rtol=2e-6, atol=2e-6
        )


def test_stack_fused_route_jvp_uses_gather_tangents(interpret_mode, monkeypatch):
    """Differentiating through the fused stack route produces the vmapped
    gather tree's tangents (the custom_jvp wiring in _eval_stack)."""
    monkeypatch.setattr(st.jax, "default_backend", lambda: "tpu")
    dims = (8, 9, 7)
    starts, steps, vals, obs = _routing_case(dims, nch=2, seed=23)

    # jit FIRST: under direct jvp the JVPTracer demotes to the vmap
    # fallback (by design); differentiating the jitted jaxpr exercises
    # the custom_jvp wiring around the fused kernel
    f = jax.jit(lambda v: ops.linear_regular_stack(dims, starts, steps, v, obs))

    tangent = jnp.ones_like(vals)
    _, dout = jax.jvp(f, (vals,), (tangent,))

    from interpn_tpu.ops.linear import linear_regular as gather

    def g(v):
        return jnp.stack([gather(dims, starts, steps, v[c], obs) for c in range(2)])

    _, dref = jax.jvp(g, (vals,), (tangent,))
    np.testing.assert_allclose(np.asarray(dout), np.asarray(dref), rtol=2e-5, atol=2e-5)


def test_stack_f64_concrete_channel_loop(interpret_mode, monkeypatch):
    """A concrete f64 stack on a 'TPU' backend loops channels through the
    single-channel dispatcher (so each channel can take the i8/df64
    engines) instead of vmapping."""
    monkeypatch.setattr(st.jax, "default_backend", lambda: "tpu")
    dims = (6, 5)  # small: i8 declines on cell count, df64 may engage
    starts, steps, vals, obs = _routing_case(dims, nch=3, seed=24, dtype=np.float64)
    calls = []
    real = st._SINGLE[("linear", True)]

    def spy(*a, **k):
        calls.append(True)
        return real(*a, **k)

    monkeypatch.setitem(st._SINGLE, ("linear", True), spy)
    got = np.asarray(ops.linear_regular_stack(dims, starts, steps, vals, obs))
    assert len(calls) == 3, "expected one single-channel dispatch per channel"
    from interpn_tpu.ops.linear import linear_regular as gather

    for c in range(3):
        np.testing.assert_allclose(
            got[c], np.asarray(gather(dims, starts, steps, vals[c], obs)),
            rtol=1e-12, atol=1e-12,
        )


def test_use_pallas_stack_decline_branches(monkeypatch):
    """Each policy gate in _use_pallas_stack declines independently."""
    dims = (8, 9, 7)
    starts, steps, vals, obs = _routing_case(dims, nch=2, seed=25)
    args = lambda v=vals, o=obs[0]: (dims, 2, v, o, "linear", False, True)
    monkeypatch.setattr(st.jax, "default_backend", lambda: "tpu")
    assert st._use_pallas_stack(*args())
    # env override
    monkeypatch.setenv("INTERPN_TPU_IMPL", "gather")
    assert not st._use_pallas_stack(*args())
    monkeypatch.delenv("INTERPN_TPU_IMPL")
    # f64 / non-finite
    assert not st._use_pallas_stack(dims, 2, vals.astype(jnp.float64), obs[0],
                                    "linear", False, True)
    assert not st._use_pallas_stack(dims, 2, vals, obs[0], "linear", False, False)
    # non-flat obs
    assert not st._use_pallas_stack(dims, 2, vals, obs[0].reshape(2, -1),
                                    "linear", False, True)
    # batch floor (auto mode)
    assert not st._use_pallas_stack(dims, 2, vals, obs[0][:512], "linear",
                                    False, True)
    # forced pallas skips the batch floor
    monkeypatch.setenv("INTERPN_TPU_IMPL", "pallas")
    assert st._use_pallas_stack(dims, 2, vals, obs[0][:512], "linear", False, True)
    monkeypatch.delenv("INTERPN_TPU_IMPL")
    # grid cap (regular nearest is capped low)
    big = (40, 40, 40)
    vals_big = jnp.zeros((2, 64000), jnp.float32)
    assert not st._use_pallas_stack(big, 2, vals_big, obs[0], "nearest",
                                    False, True)
    # CPU backend declines
    monkeypatch.setattr(st.jax, "default_backend", lambda: "cpu")
    assert not st._use_pallas_stack(*args())


@pytest.mark.parametrize("method", ["nearest", "cubic"])
def test_stack_fused_rect_and_nearest_jvp(interpret_mode, monkeypatch, method):
    """JVP through the fused rectilinear stack route exercises the
    vmapped-gather tangent wiring for the remaining method lambdas."""
    monkeypatch.setattr(st.jax, "default_backend", lambda: "tpu")
    rng = np.random.default_rng(26)
    dims = (8, 7, 6)
    grids = tuple(
        jnp.asarray(np.cumsum(rng.uniform(0.2, 1.0, d)), jnp.float32)
        for d in dims
    )
    vals = jnp.asarray(rng.standard_normal((2, int(np.prod(dims)))), jnp.float32)
    obs = tuple(
        jnp.asarray(rng.uniform(float(g[0]), float(g[-1]), 1536), jnp.float32)
        for g in grids
    )
    fn = {
        "nearest": ops.nearest_rectilinear_stack,
        "cubic": ops.cubic_rectilinear_stack,
    }[method]
    tangent = jnp.ones_like(vals)
    _, dout = jax.jvp(jax.jit(lambda v: fn(grids, v, obs)), (vals,), (tangent,))
    assert dout.shape == (2, 1536)
    assert bool(jnp.isfinite(dout).all())
