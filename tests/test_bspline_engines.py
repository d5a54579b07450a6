"""Fused/MXU engines for the global B-splines (VERDICT r3 #2): the
pallas_v3 precomputed-weights contraction (f32) and the double-float VPU
engine (f64), in interpret mode on CPU, against the gather stencil tree.

Error normalization: the engines' error classes scale with the
COEFFICIENT magnitudes (f32 products ~2^-24, double-float ~2^-47), and
not-a-knot coefficients on short random axes can exceed the data scale by
orders of magnitude — so parity is asserted relative to max|coeffs|
(interior at the engine floor; extrapolated points carry the end-span
polynomial's term amplification, banded like the cubic df64 suite)."""

from __future__ import annotations

import numpy as np
import pytest

import interpn_tpu  # noqa: F401  (enables x64)
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from interpn_tpu.ops import bspline
from interpn_tpu.ops import dispatch
from interpn_tpu.ops import pallas_df64 as df
from interpn_tpu.ops import pallas_v3 as v3


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    orig = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        return orig(*args, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", interp_call)


def _case(k, dims, seed=0, n=512, ext=0.2):
    rng = np.random.default_rng(seed)
    grids = [np.sort(rng.uniform(-2, 2, d)) for d in dims]
    for g in grids:
        while np.any(np.diff(g) <= 5e-2):
            g[:] = np.sort(rng.uniform(-2, 2, g.size))
    vals = rng.standard_normal(dims)
    knots, coeffs = bspline.prep_bspline(grids, vals.ravel(), k)
    lo = np.array([g[0] for g in grids])
    hi = np.array([g[-1] for g in grids])
    xi = rng.uniform(lo - ext * (hi - lo), hi + ext * (hi - lo), (n, len(dims)))
    inside = np.all((xi >= lo) & (xi <= hi), axis=1)
    obs = tuple(jnp.asarray(np.ascontiguousarray(xi[:, i])) for i in range(len(dims)))
    kt = tuple(jnp.asarray(t) for t in knots)
    ref = np.asarray(bspline._bspline_gather(kt, jnp.asarray(coeffs), obs, k))
    return kt, coeffs, obs, ref, inside


@pytest.mark.parametrize("k,dims", [(3, (8, 7, 6)), (3, (6, 9)), (5, (7, 8)),
                                    (5, (7, 7, 7))])
def test_df64_engine_parity(k, dims):
    kt, coeffs, obs, ref, inside = _case(k, dims, seed=k)
    got = np.asarray(df.eval_bspline(kt, jnp.asarray(coeffs), obs, k))
    cs = max(float(np.abs(coeffs).max()), 1.0)
    assert np.abs(got - ref)[inside].max() <= 1e-13 * cs
    assert np.abs(got - ref).max() <= 1e-11 * cs  # extrapolated amplification


@pytest.mark.parametrize("k,dims", [(3, (8, 7, 6)), (5, (7, 8))])
def test_v3_engine_parity(k, dims):
    kt, coeffs, obs, ref, inside = _case(k, dims, seed=10 + k)
    kt32 = tuple(t.astype(jnp.float32) for t in kt)
    obs32 = tuple(o.astype(jnp.float32) for o in obs)
    got = np.asarray(
        v3.eval_bspline(kt32, jnp.asarray(coeffs, jnp.float32), obs32, k)
    )
    cs = max(float(np.abs(coeffs).max()), 1.0)
    # f32 weights (Cox-de Boor recursion) + exact-mode f32 contraction
    assert np.abs(got - ref)[inside].max() <= 2e-6 * cs
    assert np.isfinite(got).all()


def test_df64_looped_kernel_shape():
    """lead > _MAX_UNROLL_LEAD exercises the fori_loop slab kernel."""
    dims = (14, 14, 14, 6)
    assert np.prod(dims[:-1]) > df._MAX_UNROLL_LEAD
    assert df.supported(dims, "bspline3")
    kt, coeffs, obs, ref, inside = _case(3, dims, seed=3, n=256, ext=0.05)
    got = np.asarray(df.eval_bspline(kt, jnp.asarray(coeffs), obs, 3))
    cs = max(float(np.abs(coeffs).max()), 1.0)
    assert np.abs(got - ref)[inside].max() <= 1e-13 * cs
    assert np.abs(got - ref).max() <= 1e-11 * cs


def test_v3_select_sum_fallback(monkeypatch):
    """INTERPN_TPU_SPLINE_SEL=1 fetches the in-kernel Cox-de Boor knots
    with per-offset select-sum planes instead of the one-hot MXU
    contraction (the measured A/B twin; bit-identical selection, see
    pallas_v3._bspline_axis_weights). Distinct dims force a fresh trace —
    the env var is read at kernel-build time."""
    monkeypatch.setenv("INTERPN_TPU_SPLINE_SEL", "1")
    kt, coeffs, obs, ref, inside = _case(3, (9, 6, 7), seed=77)
    kt32 = tuple(t.astype(jnp.float32) for t in kt)
    obs32 = tuple(o.astype(jnp.float32) for o in obs)
    got = np.asarray(
        v3.eval_bspline(kt32, jnp.asarray(coeffs, jnp.float32), obs32, 3)
    )
    cs = max(float(np.abs(coeffs).max()), 1.0)
    assert np.abs(got - ref)[inside].max() <= 2e-6 * cs
    assert np.isfinite(got).all()


def test_supported_gates():
    assert v3.supported((8, 8, 8), jnp.float32, "bspline3")
    assert v3.supported((8, 8, 8), jnp.float32, "bspline5")
    assert not v3.supported((8, 8, 8), jnp.float64, "bspline3")
    assert not v3.supported((8,), jnp.float32, "bspline3")
    assert df.supported((8, 8, 8), "bspline3")
    assert df.supported((8, 8), "bspline5")
    assert not df.supported((8,), "bspline3")
    # crossover cost model uses the spline footprint
    assert df.max_grid("bspline5", 2) == min(2048 * 36, df._MAX_VALS_BYTES // 8)


def _routing_case(k=3, dims=(8, 7, 6), dtype=np.float64, n=2048, seed=1):
    rng = np.random.default_rng(seed)
    grids = [np.sort(rng.uniform(-2, 2, d)) for d in dims]
    vals = rng.standard_normal(dims)
    knots, coeffs = bspline.prep_bspline(grids, vals.ravel(), k)
    kt = tuple(jnp.asarray(t, dtype) for t in knots)
    cf = jnp.asarray(coeffs, dtype)
    obs = tuple(
        jnp.asarray(rng.uniform(g[0], g[-1], n), dtype) for g in grids
    )
    return kt, cf, obs


def test_routing_selects_engines(monkeypatch):
    """bspline_eval routes f32 -> v3, f64 -> df64 on a TPU-shaped trace,
    asserted via spies, and declines to the gather tree under vmap/AD
    tracers and env overrides."""
    monkeypatch.setattr(dispatch.jax, "default_backend", lambda: "tpu")
    calls = []
    monkeypatch.setattr(
        v3, "eval_bspline",
        lambda *a, **kw: calls.append("v3") or bspline._bspline_gather(a[0], a[1], a[2], a[3]),
    )
    monkeypatch.setattr(
        df, "eval_bspline",
        lambda *a, **kw: calls.append("df64") or bspline._bspline_gather(a[0], a[1], a[2], a[3]),
    )
    kt, cf, obs = _routing_case(dtype=np.float64)
    bspline.bspline_eval(kt, cf, obs, 3)
    assert calls == ["df64"]
    calls.clear()
    kt32, cf32, obs32 = _routing_case(dtype=np.float32)
    bspline.bspline_eval(kt32, cf32, obs32, 3)
    assert calls == ["v3"]
    calls.clear()
    # small batches decline in auto mode
    bspline.bspline_eval(kt, cf, tuple(o[:64] for o in obs), 3)
    assert calls == []
    # env override forces the gather tree
    monkeypatch.setenv("INTERPN_TPU_IMPL", "gather")
    bspline.bspline_eval(kt, cf, obs, 3)
    assert calls == []
    monkeypatch.delenv("INTERPN_TPU_IMPL")
    # vmap (BatchTracer coefficients) declines to the natively-batching tree
    got = jax.vmap(lambda c: bspline.bspline_eval(kt, c, obs, 3))(
        jnp.stack([cf, cf + 1.0])
    )
    assert calls == []
    assert got.shape == (2, obs[0].shape[0])


def test_fused_route_jvp_uses_gather_tangents(monkeypatch):
    """Differentiating the jitted fused route produces the gather tree's
    tangents through the custom_jvp wiring (real kernels, interpret mode)."""
    monkeypatch.setattr(dispatch.jax, "default_backend", lambda: "tpu")
    kt, cf, obs = _routing_case(dtype=np.float64, n=1536)

    f = jax.jit(lambda c: bspline.bspline_eval(kt, c, obs, 3))
    tangent = jnp.ones_like(cf)
    out, dout = jax.jvp(f, (cf,), (tangent,))

    def g(c):
        return bspline._bspline_gather(kt, c, obs, 3)

    ref, dref = jax.jvp(g, (cf,), (tangent,))
    cs = max(float(np.abs(np.asarray(cf)).max()), 1.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=1e-12 * cs)
    np.testing.assert_allclose(np.asarray(dout), np.asarray(dref),
                               rtol=1e-12, atol=1e-12)


def test_public_spline_path_uses_fused_engine(monkeypatch):
    """interpn(method='cubic_spline') reaches the fused engine when the
    trace qualifies (the whole dispatch chain, not just bspline_eval)."""
    import interpn_tpu as it

    monkeypatch.setattr(dispatch.jax, "default_backend", lambda: "tpu")
    calls = []
    real = df.eval_bspline
    monkeypatch.setattr(
        df, "eval_bspline", lambda *a, **kw: calls.append(1) or real(*a, **kw)
    )
    rng = np.random.default_rng(5)
    grids = [np.sort(rng.uniform(-2, 2, 8)) for _ in range(3)]
    vals = rng.standard_normal((8, 8, 8))
    obs = [rng.uniform(-2, 2, 2048) for _ in range(3)]
    got = it.interpn(obs, grids=grids, vals=vals, method="cubic_spline")
    assert calls, "fused f64 spline engine was not selected"
    assert np.isfinite(got).all()


def test_stack_engine_parity_and_routing(monkeypatch):
    """bspline_eval_stack fuses all channels behind one weight build on an
    eligible f32 TPU trace (spy-asserted, interpret mode) and matches the
    per-channel gather tree; f64 and tracer inputs fall back to vmap."""
    monkeypatch.setattr(dispatch.jax, "default_backend", lambda: "tpu")
    rng = np.random.default_rng(21)
    dims = (8, 7, 6)
    grids = [np.sort(rng.uniform(-2, 2, d)) for d in dims]
    nch, n = 3, 2048
    vstack = rng.standard_normal((nch, int(np.prod(dims))))
    knots, coeffs = bspline.prep_bspline(grids, np.ascontiguousarray(vstack.T), 3)
    kt32 = tuple(jnp.asarray(t, jnp.float32) for t in knots)
    ct32 = jnp.asarray(np.ascontiguousarray(coeffs.T), jnp.float32)
    obs32 = tuple(
        jnp.asarray(rng.uniform(g[0], g[-1], n), jnp.float32) for g in grids
    )

    calls = []
    orig = v3.eval_bspline_stack
    monkeypatch.setattr(
        v3, "eval_bspline_stack",
        lambda *a, **kw: calls.append(1) or orig(*a, **kw),
    )
    got = np.asarray(bspline.bspline_eval_stack(kt32, ct32, obs32, 3))
    assert calls, "fused stack kernel was not selected"
    assert got.shape == (nch, n)

    ref = np.stack([
        np.asarray(bspline._bspline_gather(kt32, ct32[c], obs32, 3))
        for c in range(nch)
    ])
    cs = max(float(np.abs(coeffs).max()), 1.0)
    assert np.abs(got - ref).max() <= 2e-5 * cs

    # f64 falls back to the vmapped dispatch (df64 has no stack kernel)
    calls.clear()
    kt64 = tuple(jnp.asarray(t) for t in knots)
    ct64 = jnp.asarray(np.ascontiguousarray(coeffs.T))
    obs64 = tuple(o.astype(jnp.float64) for o in obs32)
    out64 = bspline.bspline_eval_stack(kt64, ct64, obs64, 3)
    assert not calls and out64.shape == (nch, n)

    # grad through the jitted fused route uses the gather tangents
    f = jax.jit(lambda c: jnp.sum(bspline.bspline_eval_stack(kt32, c, obs32, 3)))
    g = jax.grad(f)(ct32)
    gref = jax.grad(
        lambda c: jnp.sum(
            jax.vmap(lambda cc: bspline._bspline_gather(kt32, cc, obs32, 3))(c)
        )
    )(ct32)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gref), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("k,dims", [(3, (8, 7, 6)), (5, (7, 8)), (3, (11,))])
def test_v3_knots_vs_pre_kernels(k, dims):
    """The two production spline weight builds — in-kernel Cox-de Boor
    (rect="knots") and XLA-precomputed (pre) — must agree to f32 rounding
    (same math, different build site) and match the gather tree. Round 5
    replaced the INTERPN_TPU_SPLINE_PRE env knob with a knot-length
    dispatch between them (`v3._spline_use_pre`)."""
    kt, coeffs, obs, ref, inside = _case(k, dims, seed=40 + k)
    kt32 = tuple(t.astype(jnp.float32) for t in kt)
    cf32 = jnp.asarray(coeffs, jnp.float32)
    obs32 = tuple(o.astype(jnp.float32) for o in obs)
    got_knots = np.asarray(v3._eval_bspline_knots(kt32, cf32, obs32, k))
    got_pre = np.asarray(v3._eval_bspline_pre(kt32, cf32, obs32, k))
    cs = max(float(np.abs(coeffs).max()), 1.0)
    # f32 rounding between build sites (XLA vs Mosaic fma/association),
    # amplified by the adversarial short-axis quintic coefficients
    assert np.abs(got_knots - got_pre).max() <= 4e-6 * cs
    assert np.abs(got_knots - ref)[inside].max() <= 4e-6 * cs


def test_v3_spline_dispatch_threshold(monkeypatch):
    """eval_bspline routes by the static knot-column length: at/below
    _SPLINE_PRE_TLEN the XLA-precomputed build serves (bit-identical to
    _eval_bspline_pre), above it the in-kernel build (bit-identical to
    _eval_bspline_knots)."""
    kt, coeffs, obs, _, _ = _case(3, (8, 7), seed=9)
    kt32 = tuple(t.astype(jnp.float32) for t in kt)
    cf32 = jnp.asarray(coeffs, jnp.float32)
    obs32 = tuple(o.astype(jnp.float32) for o in obs)
    tmax = max(t.shape[0] for t in kt32)
    assert v3._spline_use_pre((4, 3), 3) == (8 <= v3._SPLINE_PRE_TLEN)
    monkeypatch.setattr(v3, "_SPLINE_PRE_TLEN", tmax)
    got = np.asarray(v3.eval_bspline(kt32, cf32, obs32, 3))
    np.testing.assert_array_equal(
        got, np.asarray(v3._eval_bspline_pre(kt32, cf32, obs32, 3))
    )
    monkeypatch.setattr(v3, "_SPLINE_PRE_TLEN", tmax - 1)
    got = np.asarray(v3.eval_bspline(kt32, cf32, obs32, 3))
    np.testing.assert_array_equal(
        got, np.asarray(v3._eval_bspline_knots(kt32, cf32, obs32, 3))
    )


@pytest.mark.parametrize("force_pre", [False, True])
def test_v3_stack_knots_vs_pre(force_pre, monkeypatch):
    """Both branches of the stack kernel's weight-build dispatch agree
    with each other and with per-channel single evals."""
    k, dims, nch = 3, (8, 7), 4
    rng = np.random.default_rng(77)
    grids = [np.sort(rng.uniform(-2, 2, d)) for d in dims]
    vals = rng.standard_normal((nch,) + dims).reshape(nch, -1)
    knots, coeffs = bspline.prep_bspline(
        grids, np.ascontiguousarray(vals.T, dtype=np.float64), k
    )
    kt32 = tuple(jnp.asarray(t, jnp.float32) for t in knots)
    cf32 = jnp.asarray(np.ascontiguousarray(coeffs.T), jnp.float32)
    obs = tuple(
        jnp.asarray(rng.uniform(-2.2, 2.2, 512), jnp.float32) for _ in dims
    )
    tmax = max(t.shape[0] for t in kt32)
    monkeypatch.setattr(
        v3, "_SPLINE_PRE_TLEN", tmax if force_pre else tmax - 1
    )
    got = np.asarray(v3.eval_bspline_stack(kt32, cf32, obs, k))
    other = np.asarray(
        (v3._eval_bspline_knots if force_pre else v3._eval_bspline_pre)(
            kt32, cf32[0], obs, k
        )
    )
    cs = max(float(np.abs(coeffs).max()), 1.0)
    assert np.abs(got[0] - other).max() <= 4e-6 * cs
    for c in range(nch):
        single = np.asarray(
            (v3._eval_bspline_pre if force_pre else v3._eval_bspline_knots)(
                kt32, cf32[c], obs, k
            )
        )
        assert np.abs(got[c] - single).max() <= 4e-6 * cs


def test_df64_near_cancellation_quintic():
    """Fuzz seed 58123 round 0 pinned: a 1-D quintic whose not-a-knot
    coefficients carry +/-871 adjacent-cancelling terms. On CPU, XLA's
    LLVM backend compiles with fp-contract=fast at the TargetMachine
    level, and HLO fusion duplicates the product into each consumer
    kernel (single-use there), so ``p + low`` used to contract to
    fma(a, b, low) — one rounding instead of two — wiping the double-float
    low channel (2.2e-8 relative vs 2.6e-15 for the identical case on TPU
    hardware). _round_mul's runtime a*0 term keeps fl(a*b) exact under
    either contraction choice."""
    knots = np.array(
        [-1.31354049] * 6
        + [0.3537286, 0.4248704, 0.52182251]
        + [1.89405187] * 6
    )
    coeffs = np.array([
        4.36346804e-01, -8.71401680e+02, 8.68928869e+02, -1.59137663e+02,
        1.33095085e+02, -1.07417554e+02, 2.74165433e+02, -1.77141578e+02,
        -1.07698133e+00,
    ])
    k = 5
    rng = np.random.default_rng(7)
    lo, hi = knots[0], knots[-1]
    span = hi - lo
    x = rng.uniform(lo - 0.2 * span, hi + 0.2 * span, 110)
    obs = (jnp.asarray(x),)
    kt = (jnp.asarray(knots),)
    ref = np.asarray(bspline._bspline_gather(kt, jnp.asarray(coeffs), obs, k))
    got = np.asarray(df.eval_bspline(kt, jnp.asarray(coeffs), obs, k))
    cs = float(np.abs(coeffs).max())
    inside = (x >= lo) & (x <= hi)
    assert np.abs(got - ref)[inside].max() <= 1e-13 * cs
    assert np.abs(got - ref).max() <= 1e-12 * cs


def test_df64_madd_chain_survives_cpu_jit():
    """FMA-contraction canary: the 9-term _df_madd chain with cancelling
    column magnitudes must give the same answer under jit as eagerly
    (eager runs each op as its own kernel, so ISel never sees a fusable
    mul+add pair; jit fuses the whole chain). Without _round_mul this
    read 5.7e-5 absolute on a unit-scale result."""
    n = 256
    rng = np.random.default_rng(3)
    C = np.array([0.43, -871.4, 868.9, -159.1, 133.1, -107.4, 274.2,
                  -177.1, -1.08])
    vh, vl = df._table_split(jnp.asarray(C), 1, 9)
    W = rng.uniform(0, 1, (9, n))
    wh, wl = df._split_f64(jnp.asarray(W))
    manual = W.T @ C

    def chain(whm, wlm, vhm, vlm):
        th = jnp.zeros((1, n), jnp.float32)
        tl = jnp.zeros((1, n), jnp.float32)
        for j in range(9):
            th, tl = df._df_madd(
                th, tl,
                vhm[:, j].reshape(1, 1), vlm[:, j].reshape(1, 1),
                whm[j, :].reshape(1, n), wlm[j, :].reshape(1, n),
            )
        return df._two_sum(th, tl)

    with jax.enable_x64(False):
        e1, e2 = chain(wh, wl, vh, vl)
        j1, j2 = jax.jit(chain)(wh, wl, vh, vl)
    eager = (np.float64(np.asarray(e1)) + np.float64(np.asarray(e2)))[0]
    jitted = (np.float64(np.asarray(j1)) + np.float64(np.asarray(j2)))[0]
    assert np.abs(eager - manual).max() <= 1e-9
    assert np.abs(jitted - manual).max() <= 1e-9
