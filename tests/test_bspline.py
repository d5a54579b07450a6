"""Tensor-product B-spline engine (scipy's cubic/quintic RGI methods).

Ground truth is scipy's own DEFINITION of the N-d spline interpolant —
recursive 1-d ``make_interp_spline`` fits (linear in the data, so the
recursion equals the tensor-product interpolant) — asserted tightly.
scipy's RGI *implementation* solves the N-d collocation system with an
iterative solver (gcrotmk) and deviates from its own definition by up to
~1e-4 in 3D, so direct RGI comparisons use a loose tolerance and one test
pins the case where scipy fails to converge outright while this engine
returns the exact interpolant.
"""

from __future__ import annotations

import numpy as np
import pytest

import scipy.interpolate as si

from interpn_tpu import compat
from interpn_tpu.ops import bspline


def _grid(rng, n):
    g = np.sort(rng.uniform(-2.0, 2.0, n))
    while np.any(np.diff(g) <= 1e-2):
        g = np.sort(rng.uniform(-2.0, 2.0, n))
    return g


def _recursive_fit(grids, vals, xi, k):
    """scipy's definitional evaluation: 1-d not-a-knot fits, last axis
    first (order is irrelevant — the fit is linear in the data)."""
    out = np.empty(len(xi))
    nd = len(grids)
    for q, pt in enumerate(xi):
        data = vals
        for ax in range(nd - 1, -1, -1):
            flat = np.moveaxis(data, ax, -1).reshape(-1, data.shape[ax])
            red = np.array(
                [si.make_interp_spline(grids[ax], row, k=k)(pt[ax]) for row in flat]
            )
            data = red.reshape(data.shape[:ax] + data.shape[ax + 1 :])
        out[q] = data
    return out


@pytest.mark.parametrize("ndims", [1, 2, 3])
@pytest.mark.parametrize("k", [3, 5])
def test_matches_exact_interpolant_including_extrapolation(ndims, k):
    rng = np.random.default_rng(100 * k + ndims)
    dims = tuple(int(d) for d in rng.integers(k + 1, k + 4, ndims))
    grids = [_grid(rng, d) for d in dims]
    vals = rng.standard_normal(dims)
    knots, coeffs = bspline.prep_bspline(grids, vals.ravel(), k)
    lo = np.array([g[0] for g in grids])
    hi = np.array([g[-1] for g in grids])
    xi = rng.uniform(lo - 0.3 * (hi - lo), hi + 0.3 * (hi - lo), (40, ndims))
    obs = [np.ascontiguousarray(xi[:, i]) for i in range(ndims)]
    ours = np.asarray(bspline.bspline_eval(knots, coeffs, obs, k))
    exact = _recursive_fit(grids, vals, xi, k)
    np.testing.assert_allclose(ours, exact, rtol=1e-10, atol=1e-10)


@pytest.mark.parametrize("k,ndims", [(5, 4), (3, 5)])
def test_large_stencil_matrix_path(k, ndims):
    """(k+1)^N > 256 switches to the batched-gather matrix tree (and the
    chunked tail for flat query batches): 6^4 quintic and 4^5 cubic."""
    rng = np.random.default_rng(40 + k)
    dims = (k + 1,) * ndims
    grids = [np.sort(rng.uniform(-1, 1, d)) for d in dims]
    vals = rng.standard_normal(dims)
    knots, coeffs = bspline.prep_bspline(grids, vals.ravel(), k)
    lo = np.array([g[0] for g in grids])
    hi = np.array([g[-1] for g in grids])
    xi = rng.uniform(lo - 0.1 * (hi - lo), hi + 0.1 * (hi - lo), (4, ndims))
    obs = [np.ascontiguousarray(xi[:, i]) for i in range(ndims)]
    ours = np.asarray(bspline.bspline_eval(knots, coeffs, obs, k))
    exact = _recursive_fit(grids, vals, xi, k)
    np.testing.assert_allclose(ours, exact, rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize("k", [3, 5])
def test_exact_node_reproduction(k):
    rng = np.random.default_rng(7 + k)
    grids = [_grid(rng, k + 3), _grid(rng, k + 2)]
    vals = rng.standard_normal((k + 3, k + 2))
    knots, coeffs = bspline.prep_bspline(grids, vals.ravel(), k)
    nodes = np.stack(np.meshgrid(*grids, indexing="ij"), -1).reshape(-1, 2)
    obs = [np.ascontiguousarray(nodes[:, i]) for i in range(2)]
    got = np.asarray(bspline.bspline_eval(knots, coeffs, obs, k))
    np.testing.assert_allclose(got, vals.ravel(), rtol=1e-11, atol=1e-11)


def test_not_a_knot_knots_match_scipy():
    rng = np.random.default_rng(3)
    for n, k in ((4, 3), (7, 3), (6, 5), (11, 5)):
        x = _grid(rng, n)
        spl = si.make_interp_spline(x, rng.standard_normal(n), k=k)
        np.testing.assert_array_equal(bspline.not_a_knot_knots(x, k), spl.t)


def test_1d_coefficients_match_scipy():
    rng = np.random.default_rng(4)
    for n, k in ((5, 3), (9, 3), (6, 5), (10, 5)):
        x = _grid(rng, n)
        y = rng.standard_normal(n)
        spl = si.make_interp_spline(x, y, k=k)
        _, c = bspline.prep_bspline([x], y, k)
        np.testing.assert_allclose(c, spl.c, rtol=1e-9, atol=1e-12)


def test_polynomial_reproduction():
    """A degree-k not-a-knot spline interpolant reproduces degree-k
    polynomials exactly — incl. under extrapolation."""
    rng = np.random.default_rng(5)
    gx, gy = _grid(rng, 7), _grid(rng, 8)
    X, Y = np.meshgrid(gx, gy, indexing="ij")
    vals = X**3 - 2 * X * Y**2 + 0.5 * Y**3
    knots, coeffs = bspline.prep_bspline([gx, gy], vals.ravel(), 3)
    xi = rng.uniform(-3, 3, (60, 2))
    obs = [np.ascontiguousarray(xi[:, i]) for i in range(2)]
    got = np.asarray(bspline.bspline_eval(knots, coeffs, obs, 3))
    expect = xi[:, 0] ** 3 - 2 * xi[:, 0] * xi[:, 1] ** 2 + 0.5 * xi[:, 1] ** 3
    np.testing.assert_allclose(got, expect, rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize("method", ["cubic", "quintic"])
def test_compat_rgi_close_to_scipy_rgi(method):
    """Direct comparison with scipy RGI — loose tolerance, bounded by
    scipy's iterative collocation solver, not by this engine."""
    rng = np.random.default_rng(11)
    grids = (np.linspace(0, 4, 8), np.linspace(-1, 1, 7))
    vals = rng.standard_normal((8, 7, 2))  # trailing channel axis
    xi = rng.uniform([-0.5, -1.3], [4.5, 1.3], (50, 2))
    ours = compat.RegularGridInterpolator(
        grids, vals, method=method, bounds_error=False, fill_value=None
    )(xi)
    theirs = si.RegularGridInterpolator(
        grids, vals, method=method, bounds_error=False, fill_value=None
    )(xi)
    np.testing.assert_allclose(ours, theirs, rtol=5e-4, atol=5e-4)


def test_compat_fill_and_nan_semantics_match_scipy():
    rng = np.random.default_rng(12)
    grids = (np.linspace(0, 4, 8), np.linspace(-1, 1, 7))
    vals = rng.standard_normal((8, 7))
    xi = np.array([[5.0, 0.0], [np.nan, 0.5], [1.0, 0.0]])
    for fill in (np.nan, -9.0):
        ours = compat.RegularGridInterpolator(
            grids, vals, method="cubic", bounds_error=False, fill_value=fill
        )(xi)
        theirs = si.RegularGridInterpolator(
            grids, vals, method="cubic", bounds_error=False, fill_value=fill
        )(xi)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_succeeds_where_scipy_rgi_diverges():
    """3-D quintic on short random axes: scipy 1.17's gcrotmk collocation
    solve fails to converge (ValueError, info=1000) while the per-axis
    direct solves return the exact interpolant."""
    rng = np.random.default_rng(1)
    dims = tuple(int(d) for d in rng.integers(6, 9, 3))  # (7, 7, 8)
    grids = [np.sort(rng.uniform(-2, 2, d)) for d in dims]
    vals = rng.standard_normal(dims)
    with pytest.raises(ValueError, match="info"):
        si.RegularGridInterpolator(grids, vals, method="quintic")
    rgi = compat.RegularGridInterpolator(
        grids, vals, method="quintic", bounds_error=False, fill_value=None
    )
    xi = np.stack(np.meshgrid(*grids, indexing="ij"), -1).reshape(-1, 3)
    np.testing.assert_allclose(rgi(xi), vals.ravel(), rtol=1e-9, atol=1e-9)


def test_interpn_spline_extension():
    """Top-level interpn() accepts method='cubic_spline'/'quintic' with the
    raw layer's input contracts (grid floor, dtype strictness, out=)."""
    import interpn_tpu as it

    rng = np.random.default_rng(21)
    gr = [_grid(rng, 8), _grid(rng, 7)]
    v = rng.random((8, 7))
    obs = [rng.uniform(-2.2, 2.2, 60), rng.uniform(-2.2, 2.2, 60)]
    xi = np.stack(obs, -1)
    for method, k in (("cubic_spline", 3), ("quintic", 5)):
        buf = np.zeros(60)
        it.interpn(obs, grids=gr, vals=v, method=method, out=buf)
        exact = _recursive_fit(gr, v, xi, k)
        np.testing.assert_allclose(buf, exact, rtol=1e-10, atol=1e-10)

    # f32 tables evaluate in f32 (coefficients solved in f64 on host)
    got32 = it.interpn(
        [o.astype(np.float32) for o in obs],
        grids=[g.astype(np.float32) for g in gr],
        vals=v.astype(np.float32),
        method="cubic_spline",
    )
    assert got32.dtype == np.float32
    exact = _recursive_fit(gr, v, xi, 3)
    assert np.max(np.abs(got32 - exact) / (1 + np.abs(exact))) < 1e-3

    # contracts
    with pytest.raises(AssertionError, match="at least 6 entries"):
        it.interpn([np.zeros(3)], grids=[np.arange(5.0) ** 1.5],
                   vals=np.zeros(5), method="quintic")
    with pytest.raises(TypeError, match="expected a float64 array"):
        it.interpn([np.zeros(3, np.float32)], grids=[np.arange(6.0)],
                   vals=np.zeros(6), method="cubic_spline")


def test_min_points_and_degree_guards():
    with pytest.raises(ValueError, match="at least 6 points"):
        bspline.prep_bspline([np.arange(5.0)], np.arange(5.0), 5)
    with pytest.raises(ValueError, match="odd spline degree"):
        bspline.not_a_knot_knots(np.arange(5.0), 2)


def test_banded_solve_handles_long_axes():
    """The banded collocation solve is O(n*k^2): a 20k-point axis (beyond
    the old 4096 dense guard) fits in memory and matches scipy's 1-d fit."""
    rng = np.random.default_rng(31)
    n = 20_000
    x = np.cumsum(rng.uniform(0.5, 1.5, n))
    y = rng.standard_normal(n)
    _, c = bspline.prep_bspline([x], y, 3)
    spl = si.make_interp_spline(x, y, k=3)
    np.testing.assert_allclose(c, spl.c, rtol=1e-8, atol=1e-10)


def test_prep_cache_hits_on_repeated_content(monkeypatch):
    """Repeated one-shot calls with the same table pay the collocation
    solve once (content-keyed, like the i8 prep caches)."""
    rng = np.random.default_rng(32)
    grids = [_grid(rng, 8), _grid(rng, 7)]
    vals = rng.random((8, 7)).ravel()
    calls = {"n": 0}
    real = bspline.prep_bspline

    def counting(g, v, k):
        calls["n"] += 1
        return real(g, v, k)

    monkeypatch.setattr(bspline, "prep_bspline", counting)
    bspline._PREP_CACHE.clear()
    bspline._PREP_ORDER.clear()
    a = bspline.prep_bspline_cached(grids, vals, 3)
    b = bspline.prep_bspline_cached([g.copy() for g in grids], vals.copy(), 3)
    assert calls["n"] == 1
    assert a[1] is b[1]
    # different degree or content misses
    bspline.prep_bspline_cached(grids, vals + 1.0, 3)
    assert calls["n"] == 2
    # eviction keeps the cache bounded
    for i in range(bspline._PREP_MAX + 2):
        bspline.prep_bspline_cached(grids, vals + float(i), 3)
    assert len(bspline._PREP_CACHE) <= bspline._PREP_MAX


def test_interpn_spline_repeat_call_uses_cache(monkeypatch):
    import interpn_tpu as it

    rng = np.random.default_rng(33)
    gr = [_grid(rng, 8), _grid(rng, 7)]
    v = rng.random((8, 7))
    obs = [rng.uniform(-2, 2, 16), rng.uniform(-2, 2, 16)]
    calls = {"n": 0}
    real = bspline.prep_bspline

    def counting(g, vv, k):
        calls["n"] += 1
        return real(g, vv, k)

    monkeypatch.setattr(bspline, "prep_bspline", counting)
    bspline._PREP_CACHE.clear()
    bspline._PREP_ORDER.clear()
    r1 = it.interpn(obs, grids=gr, vals=v, method="cubic_spline")
    r2 = it.interpn(obs, grids=gr, vals=v, method="cubic_spline")
    assert calls["n"] == 1
    np.testing.assert_array_equal(r1, r2)


def test_f32_spline_accuracy_class():
    """Pins the documented f32 spline accuracy story (docs/api.md):
    coefficients solve in f64, evaluation runs in the table dtype, so the
    f32 error class is ~2e-6 x max|coefficients| — which is ~1e-6 relative
    to the DATA for smooth tables (coefficients at data scale) and larger
    only when short random axes amplify the not-a-knot coefficients."""
    import interpn_tpu

    rng = np.random.default_rng(123)
    # smooth table: coefficients stay at data scale
    x = np.linspace(0.0, 10.0, 20)
    xg, yg, zg = np.meshgrid(x, x, x, indexing="ij")
    vals = np.sin(xg) + yg * 0.37 + zg * 0.37
    obs = [rng.uniform(0.0, 10.0, 4096) for _ in range(3)]
    r64 = interpn_tpu.interpn(obs, grids=[x] * 3, vals=vals, method="cubic_spline")
    r32 = interpn_tpu.interpn(
        [o.astype(np.float32) for o in obs],
        grids=[x.astype(np.float32)] * 3,
        vals=vals.astype(np.float32),
        method="cubic_spline",
    )
    assert r32.dtype == np.float32
    rel = np.abs(r32.astype(np.float64) - r64).max() / np.abs(vals).max()
    assert rel < 5e-6, rel

    # adversarial short random axes: error tracks COEFFICIENT scale
    grids = [np.sort(rng.uniform(-2, 2, 7)) for _ in range(2)]
    v2 = rng.standard_normal((7, 7))
    _, coeffs = bspline.prep_bspline(grids, v2.ravel(), 3)
    obs2 = [rng.uniform(g[0], g[-1], 2048) for g in grids]
    s64 = interpn_tpu.interpn(obs2, grids=grids, vals=v2, method="cubic_spline")
    s32 = interpn_tpu.interpn(
        [o.astype(np.float32) for o in obs2],
        grids=[g.astype(np.float32) for g in grids],
        vals=v2.astype(np.float32), method="cubic_spline",
    )
    cs = max(float(np.abs(coeffs).max()), 1.0)
    assert np.abs(s32.astype(np.float64) - s64).max() <= 5e-6 * cs
