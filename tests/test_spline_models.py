"""Lifecycle tests for the spline-family persistent models
(TensorSplineRegular / TensorSplineRectilinear): construction, evaluation
parity with the one-shot interpn() paths, out= contract, JSON round-trip
in the established wire format, pickling, bounds checks, AOT export, the
JaxInterpolator pytree lift, and interpn_stack channels — mirroring the
reference-method suites (tests/test_classes.py, tests/test_serialization.py)
as VERDICT r3 #1 requires."""

from __future__ import annotations

import pickle

import numpy as np
import pytest

import interpn_tpu as it
from interpn_tpu import aot
from interpn_tpu.functional import JaxInterpolator

METHODS = ["pchip", "cubic_spline", "quintic"]


def _rect_case(seed=0, dims=(8, 7), dtype=np.float64):
    rng = np.random.default_rng(seed)
    grids = [np.sort(rng.uniform(-2, 2, d)).astype(dtype) for d in dims]
    for g in grids:
        while np.any(np.diff(g) <= 1e-2):
            g[:] = np.sort(rng.uniform(-2, 2, g.size)).astype(dtype)
    vals = rng.standard_normal(dims).astype(dtype)
    obs = [
        rng.uniform(float(g[0]) - 0.3, float(g[-1]) + 0.3, 60).astype(dtype)
        for g in grids
    ]
    return grids, vals, obs


def _reg_case(seed=0, dims=(8, 7), dtype=np.float64):
    rng = np.random.default_rng(seed)
    starts = rng.uniform(-1, 1, len(dims)).astype(dtype)
    steps = rng.uniform(0.3, 1.0, len(dims)).astype(dtype)
    grids = [
        (starts[i] + steps[i] * np.arange(d)).astype(dtype)
        for i, d in enumerate(dims)
    ]
    vals = rng.standard_normal(dims).astype(dtype)
    obs = [
        rng.uniform(float(g[0]) - 0.2, float(g[-1]) + 0.2, 60).astype(dtype)
        for g in grids
    ]
    return starts, steps, grids, vals, obs


@pytest.mark.parametrize("method", METHODS)
def test_rectilinear_model_matches_interpn(method):
    grids, vals, obs = _rect_case(1)
    m = it.TensorSplineRectilinear.new(grids, vals.ravel(), method=method)
    got = m.eval(obs)
    ref = it.interpn(obs, grids=grids, vals=vals, method=method)
    np.testing.assert_allclose(got, ref, rtol=1e-13, atol=1e-13)
    # eval_jax stays on device and agrees
    np.testing.assert_allclose(
        np.asarray(m.eval_jax(obs)), ref, rtol=1e-13, atol=1e-13
    )


@pytest.mark.parametrize("method", METHODS)
def test_regular_model_matches_interpn(method):
    starts, steps, grids, vals, obs = _reg_case(2)
    dims = list(vals.shape)
    m = it.TensorSplineRegular.new(dims, starts, steps, vals.ravel(), method=method)
    got = m.eval(obs)
    ref = it.interpn(obs, grids=grids, vals=vals, method=method)
    np.testing.assert_allclose(got, ref, rtol=1e-12, atol=1e-12)


def test_out_buffer_contract():
    grids, vals, obs = _rect_case(3)
    m = it.TensorSplineRectilinear.new(grids, vals.ravel(), method="cubic_spline")
    buf = np.zeros(60)
    r = m.eval(obs, buf)
    assert r is buf
    assert np.all(buf != 0)


@pytest.mark.parametrize("method", METHODS)
@pytest.mark.parametrize("cls_kind", ["regular", "rectilinear"])
def test_json_round_trip_byte_identical(method, cls_kind):
    if cls_kind == "regular":
        starts, steps, grids, vals, obs = _reg_case(4)
        m = it.TensorSplineRegular.new(
            list(vals.shape), starts, steps, vals.ravel(), method=method
        )
        cls = it.TensorSplineRegular
    else:
        grids, vals, obs = _rect_case(4)
        m = it.TensorSplineRectilinear.new(grids, vals.ravel(), method=method)
        cls = it.TensorSplineRectilinear
    s = m.model_dump_json()
    m2 = cls.model_validate_json(s)
    assert m2.model_dump_json() == s
    np.testing.assert_array_equal(m2.eval(obs), m.eval(obs))
    # wire format: Array wrappers with data-as-string + trailing method
    assert '"dtype":"float64"' in s
    assert s.rstrip("}").endswith(f'"method":"{method}"')


def test_pickle_round_trip_scrubs_caches():
    grids, vals, obs = _rect_case(5)
    m = it.TensorSplineRectilinear.new(grids, vals.ravel(), method="quintic")
    before = m.eval(obs)  # builds the lazy device/prep caches
    m2 = pickle.loads(pickle.dumps(m))
    np.testing.assert_array_equal(m2.eval(obs), before)


def test_check_bounds_flags():
    grids, vals, _ = _rect_case(6)
    m = it.TensorSplineRectilinear.new(grids, vals.ravel(), method="cubic_spline")
    inside = [np.full(4, float(g[0]) + 1e-3) for g in grids]
    flags = m.check_bounds(inside, 1e-8)
    assert not flags.any()
    outside = [o.copy() for o in inside]
    outside[1][0] = float(grids[1][-1]) + 1.0
    flags = m.check_bounds(outside, 1e-8)
    assert list(flags) == [False, True]


def test_min_grid_floor_errors():
    rng = np.random.default_rng(7)
    short = [np.arange(5.0), np.sort(rng.uniform(-1, 1, 7))]
    vals = np.zeros((5, 7)).ravel()
    m = it.TensorSplineRectilinear.new(short, vals, method="quintic")
    with pytest.raises(AssertionError, match="at least six entries"):
        m.eval([np.zeros(3), np.zeros(3)])
    short3 = [np.arange(3.0), np.arange(3.0)]
    m3 = it.TensorSplineRectilinear.new(short3, np.zeros(9), method="pchip")
    with pytest.raises(AssertionError, match="at least four entries"):
        m3.eval([np.zeros(2), np.zeros(2)])


def test_validation_messages_match_house_style():
    with pytest.raises(Exception, match="monotonically increasing"):
        it.TensorSplineRectilinear.new(
            [np.array([0.0, 2.0, 1.0, 3.0]), np.arange(4.0)],
            np.zeros(16),
            method="pchip",
        )
    with pytest.raises(Exception, match="Size of value array"):
        it.TensorSplineRegular.new(
            [4, 4], np.zeros(2), np.ones(2), np.zeros(15), method="pchip"
        )
    with pytest.raises(Exception, match="steps must be positive"):
        it.TensorSplineRegular.new(
            [4, 4], np.zeros(2), np.array([1.0, 0.0]), np.zeros(16),
            method="pchip",
        )
    with pytest.raises(Exception):  # pydantic Literal rejects unknown method
        it.TensorSplineRegular.new(
            [4, 4], np.zeros(2), np.ones(2), np.zeros(16), method="nope"
        )


def test_eval_dtype_strictness():
    grids, vals, obs = _rect_case(8)
    m = it.TensorSplineRectilinear.new(grids, vals.ravel(), method="cubic_spline")
    with pytest.raises(TypeError, match="expected a float64 array"):
        m.eval([o.astype(np.float32) for o in obs])


def test_f32_model_evaluates_in_f32():
    """Coefficients solve in f64 on host; evaluation runs in the model
    dtype. f32 agreement with the f64 interpolant is at the f32
    error class (docs/api.md pins this story)."""
    grids64, vals64, obs64 = _rect_case(9)
    grids = [g.astype(np.float32) for g in grids64]
    vals = vals64.astype(np.float32)
    obs = [o.astype(np.float32) for o in obs64]
    m = it.TensorSplineRectilinear.new(grids, vals.ravel(), method="cubic_spline")
    got = m.eval(obs)
    assert got.dtype == np.float32
    ref = it.interpn(obs64, grids=grids64, vals=vals64, method="cubic_spline")
    scale = 1 + np.abs(ref)
    assert np.max(np.abs(got - ref) / scale) < 5e-4


def test_prep_cache_shared_across_model_rebuilds(monkeypatch):
    """Rebuilding a model from JSON reuses the content-keyed collocation
    solve (the expensive prep runs once per distinct table)."""
    from interpn_tpu.ops import bspline

    grids, vals, obs = _rect_case(10)
    calls = {"n": 0}
    real = bspline.prep_bspline

    def counting(g, v, k):
        calls["n"] += 1
        return real(g, v, k)

    monkeypatch.setattr(bspline, "prep_bspline", counting)
    bspline._PREP_CACHE.clear()
    bspline._PREP_ORDER.clear()
    m = it.TensorSplineRectilinear.new(grids, vals.ravel(), method="cubic_spline")
    m.eval(obs)
    m2 = it.TensorSplineRectilinear.model_validate_json(m.model_dump_json())
    m2.eval(obs)
    assert calls["n"] == 1


def test_aot_export_round_trip():
    grids, vals, obs = _rect_case(11)
    m = it.TensorSplineRectilinear.new(grids, vals.ravel(), method="cubic_spline")
    blob = aot.export_eval(m, [64], platforms=["cpu"])
    sm = aot.load(blob)
    np.testing.assert_allclose(
        np.asarray(sm.eval_jax(obs)), m.eval(obs), rtol=1e-13, atol=1e-13
    )


def test_gradient_jax():
    grids, vals, obs = _rect_case(12)
    m = it.TensorSplineRectilinear.new(grids, vals.ravel(), method="cubic_spline")
    grads = m.gradient_jax(obs)
    assert len(grads) == 2
    # finite-difference cross-check on the first axis
    h = 1e-6
    obs_p = [obs[0] + h, obs[1]]
    obs_m = [obs[0] - h, obs[1]]
    fd = (m.eval(obs_p) - m.eval(obs_m)) / (2 * h)
    np.testing.assert_allclose(np.asarray(grads[0]), fd, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------
# JaxInterpolator lift
# ---------------------------------------------------------------------


@pytest.mark.parametrize("method", ["cubic_spline", "quintic"])
def test_jax_interpolator_spline(method):
    import jax

    grids, vals, obs = _rect_case(13)
    itp = JaxInterpolator.rectilinear(grids, vals, method=method)
    ref = it.interpn(obs, grids=grids, vals=vals, method=method)
    np.testing.assert_allclose(np.asarray(itp(obs)), ref, rtol=1e-12, atol=1e-12)
    # pytree: rides through jit as an argument
    f = jax.jit(lambda p, o: p(o))
    np.testing.assert_allclose(np.asarray(f(itp, obs)), ref, rtol=1e-12, atol=1e-12)
    # grad w.r.t. the coefficient leaf is finite (linear in coefficients)
    aux = (itp.method, itp.kind, itp.dims, itp.linearize_extrapolation)
    g = jax.grad(
        lambda c: f(
            itp.tree_unflatten(aux, (*itp.grid_arrays, c)), obs
        ).sum()
    )(itp.vals)
    assert bool(np.isfinite(np.asarray(g)).all())


def test_jax_interpolator_spline_regular_and_from_model():
    starts, steps, grids, vals, obs = _reg_case(14)
    itp = JaxInterpolator.regular(
        vals.shape, starts, steps, vals, method="cubic_spline"
    )
    ref = it.interpn(obs, grids=grids, vals=vals, method="cubic_spline")
    np.testing.assert_allclose(np.asarray(itp(obs)), ref, rtol=1e-12, atol=1e-12)
    m = it.TensorSplineRegular.new(
        list(vals.shape), starts, steps, vals.ravel(), method="pchip"
    )
    itp2 = JaxInterpolator.from_model(m)
    ref2 = it.interpn(obs, grids=grids, vals=vals, method="pchip")
    np.testing.assert_allclose(np.asarray(itp2(obs)), ref2, rtol=1e-12, atol=1e-12)


def test_jax_interpolator_spline_refuses_traced_tables():
    import jax

    grids, vals, _ = _rect_case(15)

    def build(v):
        return JaxInterpolator.rectilinear(grids, v, method="cubic_spline")

    with pytest.raises(TypeError, match="concrete table values"):
        jax.jit(lambda v: build(v)(tuple(np.zeros(4) for _ in grids)))(
            vals
        )


# ---------------------------------------------------------------------
# interpn_stack channels
# ---------------------------------------------------------------------


@pytest.mark.parametrize("method", METHODS)
def test_interpn_stack_spline_channels(method):
    grids, _, obs = _rect_case(16)
    rng = np.random.default_rng(16)
    vstack = rng.standard_normal((3,) + tuple(len(g) for g in grids))
    got = it.interpn_stack(obs, grids, vstack.reshape(3, -1), method=method)
    assert got.shape == (3, 60)
    for c in range(3):
        ref = it.interpn(obs, grids=grids, vals=vstack[c], method=method)
        np.testing.assert_allclose(got[c], ref, rtol=1e-11, atol=1e-11)


def test_interpn_stack_spline_regular_grid():
    starts, steps, grids, vals, obs = _reg_case(17)
    rng = np.random.default_rng(17)
    vstack = rng.standard_normal((2,) + vals.shape)
    got = it.interpn_stack(obs, grids, vstack.reshape(2, -1), method="pchip")
    for c in range(2):
        ref = it.interpn(obs, grids=grids, vals=vstack[c], method="pchip")
        np.testing.assert_allclose(got[c], ref, rtol=1e-12, atol=1e-12)


def test_interpn_stack_spline_floor_errors():
    grids = [np.arange(5.0), np.arange(6.0)]
    with pytest.raises(AssertionError, match="at least 6 entries"):
        it.interpn_stack(
            [np.zeros(3), np.zeros(3)], grids, np.zeros((2, 30)),
            method="quintic",
        )
    grids3 = [np.arange(3.0), np.arange(4.0)]
    with pytest.raises(AssertionError, match="at least 4 entries"):
        it.interpn_stack(
            [np.zeros(3), np.zeros(3)], grids3, np.zeros((2, 12)),
            method="pchip",
        )
