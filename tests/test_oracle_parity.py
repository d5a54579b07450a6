"""Golden parity: the vectorized JAX kernels against the independent pure-
numpy oracle (tests/oracle.py) on randomized grids and query points covering
every saturation region, for all six method x grid-kind families."""

import numpy as np
import pytest

import interpn_tpu as it

from . import oracle


def _random_case(ndims, min_pts, rng):
    dims = [int(rng.integers(min_pts, min_pts + 3)) for _ in range(ndims)]
    grids = []
    for d in dims:
        g = np.cumsum(0.2 + rng.random(d))
        g += rng.uniform(-5, 5)
        grids.append(g)
    vals = rng.standard_normal(int(np.prod(dims)))
    # queries spanning far-outside-low .. far-outside-high on every axis
    n = 64
    obs = []
    for g in grids:
        span = g[-1] - g[0]
        obs.append(rng.uniform(g[0] - 0.7 * span, g[-1] + 0.7 * span, n))
    return dims, grids, vals, obs


@pytest.mark.parametrize("ndims", [1, 2, 3, 4])
def test_linear_regular_matches_oracle(ndims):
    rng = np.random.default_rng(100 + ndims)
    dims, _, vals, obs = _random_case(ndims, 2, rng)
    starts = np.array([rng.uniform(-3, 3) for _ in range(ndims)])
    steps = np.array([rng.uniform(0.2, 2.0) for _ in range(ndims)])
    out = np.zeros_like(obs[0])
    it.raw.interpn_linear_regular_f64(dims, starts, steps, vals, obs, out)
    exp = np.array(
        [
            oracle.linear_regular(dims, starts, steps, vals, [o[i] for o in obs])
            for i in range(len(out))
        ]
    )
    np.testing.assert_allclose(out, exp, rtol=1e-13, atol=1e-13)


@pytest.mark.parametrize("ndims", [1, 2, 3, 4])
def test_linear_rectilinear_matches_oracle(ndims):
    rng = np.random.default_rng(200 + ndims)
    dims, grids, vals, obs = _random_case(ndims, 2, rng)
    out = np.zeros_like(obs[0])
    it.raw.interpn_linear_rectilinear_f64(grids, vals, obs, out)
    exp = np.array(
        [
            oracle.linear_rectilinear(grids, vals, [o[i] for o in obs])
            for i in range(len(out))
        ]
    )
    np.testing.assert_allclose(out, exp, rtol=1e-13, atol=1e-13)


@pytest.mark.parametrize("ndims", [1, 2, 3])
@pytest.mark.parametrize("linearize", [True, False])
def test_cubic_regular_matches_oracle(ndims, linearize):
    rng = np.random.default_rng(300 + ndims)
    dims, _, vals, obs = _random_case(ndims, 4, rng)
    starts = np.array([rng.uniform(-3, 3) for _ in range(ndims)])
    steps = np.array([rng.uniform(0.2, 2.0) for _ in range(ndims)])
    out = np.zeros_like(obs[0])
    it.raw.interpn_cubic_regular_f64(dims, starts, steps, vals, linearize, obs, out)
    exp = np.array(
        [
            oracle.cubic_regular(
                dims, starts, steps, vals, [o[i] for o in obs], linearize
            )
            for i in range(len(out))
        ]
    )
    np.testing.assert_allclose(out, exp, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("ndims", [1, 2, 3])
@pytest.mark.parametrize("linearize", [True, False])
def test_cubic_rectilinear_matches_oracle(ndims, linearize):
    rng = np.random.default_rng(400 + ndims)
    dims, grids, vals, obs = _random_case(ndims, 4, rng)
    out = np.zeros_like(obs[0])
    it.raw.interpn_cubic_rectilinear_f64(grids, vals, linearize, obs, out)
    exp = np.array(
        [
            oracle.cubic_rectilinear(grids, vals, [o[i] for o in obs], linearize)
            for i in range(len(out))
        ]
    )
    np.testing.assert_allclose(out, exp, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("ndims", [1, 2, 3])
def test_nearest_regular_matches_oracle(ndims):
    rng = np.random.default_rng(500 + ndims)
    dims, _, vals, obs = _random_case(ndims, 2, rng)
    starts = np.array([rng.uniform(-3, 3) for _ in range(ndims)])
    steps = np.array([rng.uniform(0.2, 2.0) for _ in range(ndims)])
    out = np.zeros_like(obs[0])
    it.raw.interpn_nearest_regular_f64(dims, starts, steps, vals, obs, out)
    exp = np.array(
        [
            oracle.nearest_regular(dims, starts, steps, vals, [o[i] for o in obs])
            for i in range(len(out))
        ]
    )
    assert np.array_equal(out, exp)


@pytest.mark.parametrize("ndims", [1, 2, 3])
def test_nearest_rectilinear_matches_oracle(ndims):
    rng = np.random.default_rng(600 + ndims)
    dims, grids, vals, obs = _random_case(ndims, 2, rng)
    out = np.zeros_like(obs[0])
    it.raw.interpn_nearest_rectilinear_f64(grids, vals, obs, out)
    exp = np.array(
        [
            oracle.nearest_rectilinear(grids, vals, [o[i] for o in obs])
            for i in range(len(out))
        ]
    )
    assert np.array_equal(out, exp)


def test_nearest_on_grid_points_and_midpoints():
    """Exhaustive oracle check at grid points and exact midpoints (tie →
    lower), mirroring `src/nearest/regular.rs:324-360`."""
    g = np.linspace(0.0, 4.0, 5)
    vals = np.arange(5.0) * 10 + 1
    pts = np.concatenate([g, g[:-1] + 0.5, g[:-1] + 0.50001, [-2.0, 9.0]])
    out = np.zeros_like(pts)
    it.raw.interpn_nearest_regular_f64(
        [5], np.array([0.0]), np.array([1.0]), vals, [pts], out
    )
    exp = np.array([oracle.nearest_regular([5], [0.0], [1.0], vals, [p]) for p in pts])
    assert np.array_equal(out, exp)


def test_nearest_tiebreak_f32():
    """The dt <= 0.5 midpoint rule must survive f32 rounding (SURVEY.md
    'hard parts'): exact midpoints representable in f32 pick the lower
    index through the f32 raw path."""
    g = np.linspace(0.0, 4.0, 5).astype(np.float32)
    vals = (np.arange(5.0) * 10 + 1).astype(np.float32)
    pts = np.array([0.5, 1.5, 2.5, 3.5], dtype=np.float32)
    out = np.zeros_like(pts)
    it.raw.interpn_nearest_regular_f32(
        [5], np.zeros(1, np.float32), np.ones(1, np.float32), vals, [pts], out
    )
    np.testing.assert_array_equal(out, vals[[0, 1, 2, 3]])
