"""Property tests ported from the reference's Rust unit-test strategy
(SURVEY.md §4.1): exactness on functions each method must reproduce, on
observation meshes that traverse every combination of interpolation /
extrapolation-low / extrapolation-high per axis."""

import numpy as np
import pytest

import interpn_tpu as it
from . import oracle
from interpn_tpu.utils import meshgrid


def _obs_mesh(ndims, n_per_axis=3, lo=-7.0, hi=7.0):
    """3^N observation mesh spanning inside and outside the grid, like
    `src/multilinear/regular.rs:452-459`."""
    axes = [
        np.linspace(lo * i, hi * (i + 1), n_per_axis) for i in range(ndims)
    ]
    pts = meshgrid(axes)
    return [np.ascontiguousarray(pts[:, k]) for k in range(ndims)]


@pytest.mark.parametrize("ndims", range(1, 7))
def test_linear_regular_exact_on_sum_1d_to_6d(ndims):
    """Linear reproduces sum(x_i) exactly under interp and extrap
    (`src/multilinear/regular.rs:437-477`, atol 1e-12)."""
    dims = [2] * ndims
    axes = [np.linspace(-5.0 * i, 5.0 * (i + 1), dims[i]) for i in range(ndims)]
    pts = meshgrid(axes)
    vals = pts.sum(axis=1)
    starts = np.array([a[0] for a in axes])
    steps = np.array([a[1] - a[0] for a in axes])

    obs = _obs_mesh(ndims)
    expected = np.sum(np.stack(obs, axis=-1), axis=-1)
    out = np.zeros_like(expected)
    it.raw.interpn_linear_regular_f64(dims, starts, steps, vals, obs, out)
    np.testing.assert_allclose(out, expected, atol=1e-12)


@pytest.mark.parametrize("ndims", range(1, 7))
def test_linear_rectilinear_exact_on_sum(ndims):
    """Same property on noise-perturbed monotonic grids
    (`src/multilinear/rectilinear.rs:413-456`)."""
    rng = np.random.default_rng(1234)
    dims = [max(2, 4 - ndims // 3)] * ndims
    axes = []
    for i in range(ndims):
        a = np.linspace(-5.0 * i, 5.0 * (i + 1), dims[i])
        a += (rng.random(dims[i]) - 0.5) / 10.0
        assert np.all(np.diff(a) > 0)
        axes.append(a)
    pts = meshgrid(axes)
    vals = pts.sum(axis=1)

    obs = _obs_mesh(ndims)
    expected = np.sum(np.stack(obs, axis=-1), axis=-1)
    out = np.zeros_like(expected)
    it.raw.interpn_linear_rectilinear_f64(axes, vals, obs, out)
    np.testing.assert_allclose(out, expected, atol=1e-12)


def test_linear_hat_function_alignment():
    """Hat-function cell-alignment regression, bitwise
    (`src/multilinear/regular.rs:480-495`)."""

    def hat(x):
        return np.where(x <= 1.0, x, 2.0 - x)

    y = hat(np.arange(3.0))
    obs = np.linspace(-2.0, 4.0, 100)
    out = np.zeros_like(obs)
    it.raw.interpn_linear_regular_f64(
        [3], np.array([0.0]), np.array([1.0]), y, [obs], out
    )
    assert np.array_equal(out, hat(obs))


@pytest.mark.parametrize("ndims", range(1, 5))
@pytest.mark.parametrize("linearize", [True, False])
def test_cubic_regular_reproduces_linear(ndims, linearize):
    """Cubic reproduces a linear function under both extrapolation modes
    (`src/multicubic/regular.rs:634-676`)."""
    dims = [4] * ndims
    axes = [np.linspace(-5.0 * i, 5.0 * (i + 1), dims[i]) for i in range(ndims)]
    pts = meshgrid(axes)
    vals = pts.sum(axis=1)
    starts = np.array([a[0] for a in axes])
    steps = np.array([a[1] - a[0] for a in axes])

    obs = _obs_mesh(ndims, n_per_axis=5)
    expected = np.sum(np.stack(obs, axis=-1), axis=-1)
    out = np.zeros_like(expected)
    it.raw.interpn_cubic_regular_f64(dims, starts, steps, vals, linearize, obs, out)
    np.testing.assert_allclose(out, expected, atol=1e-10)


@pytest.mark.parametrize("ndims", range(1, 4))
def test_cubic_regular_reproduces_quadratic_under_extrapolation(ndims):
    """Quadratic functions are reproduced exactly, including under
    (non-linearized) extrapolation — the natural-BC property
    (`src/multicubic/regular.rs:680-730`, atol 1e-10)."""
    dims = [4] * ndims
    axes = [np.linspace(-5.0 * i, 5.0 * (i + 1), dims[i]) for i in range(ndims)]
    pts = meshgrid(axes)
    vals = (pts**2).sum(axis=1)
    starts = np.array([a[0] for a in axes])
    steps = np.array([a[1] - a[0] for a in axes])

    obs = _obs_mesh(ndims, n_per_axis=5)
    expected = np.sum(np.stack(obs, axis=-1) ** 2, axis=-1)
    out = np.zeros_like(expected)
    it.raw.interpn_cubic_regular_f64(dims, starts, steps, vals, False, obs, out)
    np.testing.assert_allclose(out, expected, atol=1e-10)


@pytest.mark.parametrize("ndims", range(1, 4))
def test_cubic_regular_tracks_sine(ndims):
    """Interior sine-tracking sanity bound, as in
    `src/multicubic/regular.rs:736-792` (2e-2 * ndims)."""
    rng = np.random.default_rng(7)
    dims = [20] * ndims
    axes = [np.linspace(0.0, 2 * np.pi, dims[i]) for i in range(ndims)]
    pts = meshgrid(axes)
    vals = np.sin(pts.sum(axis=1))
    starts = np.array([a[0] for a in axes])
    steps = np.array([a[1] - a[0] for a in axes])

    obs = [rng.uniform(0.0, 2 * np.pi, 500) for _ in range(ndims)]
    expected = np.sin(np.sum(np.stack(obs, axis=-1), axis=-1))
    out = np.zeros_like(expected)
    it.raw.interpn_cubic_regular_f64(dims, starts, steps, vals, True, obs, out)
    assert np.max(np.abs(out - expected)) < 2e-2 * ndims


@pytest.mark.parametrize("ndims", range(1, 4))
@pytest.mark.parametrize("linearize", [True, False])
def test_cubic_rectilinear_reproduces_linear(ndims, linearize):
    """Cubic on noise-perturbed grids reproduces a linear function
    (`src/multicubic/rectilinear.rs:557-607`)."""
    rng = np.random.default_rng(1234)
    dims = [4] * ndims
    axes = []
    for i in range(ndims):
        a = np.linspace(-5.0 * i, 5.0 * (i + 1), dims[i])
        a += (rng.random(dims[i]) - 0.5) / 10.0
        assert np.all(np.diff(a) > 0)
        axes.append(a)
    pts = meshgrid(axes)
    vals = pts.sum(axis=1)

    obs = _obs_mesh(ndims, n_per_axis=5)
    expected = np.sum(np.stack(obs, axis=-1), axis=-1)
    out = np.zeros_like(expected)
    it.raw.interpn_cubic_rectilinear_f64(axes, vals, linearize, obs, out)
    np.testing.assert_allclose(out, expected, atol=1e-10)


def test_linear_rectilinear_minimum_size_dimension():
    """One minimum-size (2-point) dimension mixed with a larger one
    (`src/multilinear/rectilinear.rs:380-407`)."""
    x = np.array([0.0, 1.0])
    y = np.array([0.0, 0.7, 1.5, 2.0, 3.1])
    pts = meshgrid([x, y])
    vals = 2.0 * pts[:, 0] - pts[:, 1]
    rng = np.random.default_rng(5)
    obs = [rng.uniform(-1, 2, 100), rng.uniform(-1, 4, 100)]
    expected = 2.0 * obs[0] - obs[1]
    out = np.zeros_like(expected)
    it.raw.interpn_linear_rectilinear_f64([x, y], vals, obs, out)
    np.testing.assert_allclose(out, expected, atol=1e-12)


@pytest.mark.parametrize("ndims", [7, 8])
def test_linear_and_cubic_high_dims(ndims):
    """7-8D paths (the reference's recursive fallback range) remain exact on
    linear data (`src/multilinear/regular.rs:107-110`)."""
    dims = [2] * ndims if ndims else []
    axes = [np.linspace(0.0, 1.0, 2) for _ in range(ndims)]
    pts = meshgrid(axes)
    vals = pts.sum(axis=1)
    starts = np.zeros(ndims)
    steps = np.ones(ndims)
    rng = np.random.default_rng(3)
    obs = [rng.uniform(-0.5, 1.5, 50) for _ in range(ndims)]
    expected = np.sum(np.stack(obs, axis=-1), axis=-1)
    out = np.zeros_like(expected)
    it.raw.interpn_linear_regular_f64(dims, starts, steps, vals, obs, out)
    np.testing.assert_allclose(out, expected, atol=1e-12)

    # cubic needs >= 4 points/axis; 4^8 grid is 65536 vals — still fine
    dims_c = [4] * ndims
    axes_c = [np.linspace(0.0, 3.0, 4) for _ in range(ndims)]
    pts_c = meshgrid(axes_c)
    vals_c = pts_c.sum(axis=1)
    steps_c = np.ones(ndims)
    obs_c = [rng.uniform(-0.5, 3.5, 10) for _ in range(ndims)]
    expected_c = np.sum(np.stack(obs_c, axis=-1), axis=-1)
    out_c = np.zeros_like(expected_c)
    it.raw.interpn_cubic_regular_f64(dims_c, starts, steps_c, vals_c, True, obs_c, out_c)
    np.testing.assert_allclose(out_c, expected_c, atol=1e-9)


def test_cubic_5d_large_batch_is_chunked(monkeypatch):
    """The 5-8D cubic gather tail fetches a (4^N, n) corner matrix; flat
    batches must be evaluated in query chunks (5D f64 at 1M queries would
    otherwise materialize an 8 GB temporary — OOMs a real chip)."""
    import jax.numpy as jnp

    from interpn_tpu.ops import _chunk, cubic

    monkeypatch.setattr(_chunk, "DEFAULT_CHUNK_BYTES", 1)  # floor: 8192/chunk
    rng = np.random.default_rng(11)
    dims = (4, 4, 4, 4, 4)
    axes = [np.arange(4.0) for _ in range(5)]
    mesh = np.meshgrid(*axes, indexing="ij")
    vals = jnp.asarray(np.sum(np.stack(mesh), axis=0).ravel())
    n = 8192 + 777  # forces two chunks + tail padding
    obs = tuple(jnp.asarray(rng.uniform(-0.5, 3.5, n)) for _ in range(5))
    out = cubic.cubic_regular(dims, jnp.zeros(5), jnp.ones(5), vals, obs, True)
    expected = np.sum(np.stack([np.asarray(o) for o in obs]), axis=0)
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-9)
    # rectilinear flavor too
    grids = tuple(jnp.asarray(a) for a in axes)
    out_r = cubic.cubic_rectilinear(grids, vals, obs, True)
    np.testing.assert_allclose(np.asarray(out_r), expected, atol=1e-9)


class TestContinuity:
    """Mathematical smoothness properties across cell boundaries — these
    guard the branchless saturation/selection logic: a wrong mask at a cell
    edge shows up as a jump discontinuity. The reference's Hermite
    construction is C1 in the interior (slopes from shared centered
    differences, `src/multicubic/mod.rs:68-117`); linear is C0."""

    def _setup(self, method, seed=11):
        rng = np.random.default_rng(seed)
        dims = (9, 9)
        vals = rng.standard_normal(81)
        starts = np.zeros(2)
        steps = np.full(2, 0.5)
        return dims, starts, steps, vals

    def _eval(self, method, dims, starts, steps, vals, obs):
        obs = tuple(np.asarray(o) for o in obs)
        # the eps-straddles below assume f64 evaluation (ulp(4.0) ~ 9e-16
        # << eps); in f32 they would collapse onto the node and pass
        # vacuously
        assert obs[0].dtype == np.float64
        if method == "linear":
            return np.asarray(
                it.ops.linear_regular(dims, starts, steps, vals, obs)
            )
        return np.asarray(
            it.ops.cubic_regular(dims, starts, steps, vals, obs, True)
        )

    @pytest.mark.parametrize("method", ["linear", "cubic"])
    def test_value_continuity_across_interior_cell_edges(self, method):
        dims, starts, steps, vals = self._setup(method)
        eps = 1e-7
        # straddle every interior node on axis 0, random transverse coords
        rng = np.random.default_rng(3)
        nodes = starts[0] + steps[0] * np.arange(1, dims[0] - 1)
        y = rng.uniform(0.3, 3.7, nodes.size)
        lo = self._eval(method, dims, starts, steps, vals, [nodes - eps, y])
        hi = self._eval(method, dims, starts, steps, vals, [nodes + eps, y])
        # value jump across the edge is O(eps * local slope), slopes O(1)/step
        np.testing.assert_allclose(lo, hi, atol=1e-5)

    def test_cubic_first_derivative_continuity(self):
        """C1: one-sided difference quotients agree across interior nodes
        to O(eps) — a saturation-mask bug would leave an O(1) kink."""
        dims, starts, steps, vals = self._setup("cubic")
        eps = 1e-5
        nodes = starts[0] + steps[0] * np.arange(1, dims[0] - 1)
        y = np.full(nodes.size, 1.77)
        f = lambda x: self._eval("cubic", dims, starts, steps, vals, [x, y])
        d_lo = (f(nodes) - f(nodes - eps)) / eps
        d_hi = (f(nodes + eps) - f(nodes)) / eps
        np.testing.assert_allclose(d_lo, d_hi, atol=1e-3)

    @pytest.mark.parametrize("method", ["linear", "cubic"])
    def test_continuity_at_domain_boundary(self, method):
        """The interp->extrap transition is continuous (linearized cubic
        extrapolation matches value and slope at the edge,
        `src/multicubic/regular.rs:553-561`)."""
        dims, starts, steps, vals = self._setup(method)
        eps = 1e-7
        hi_edge = starts[0] + steps[0] * (dims[0] - 1)
        for edge in (starts[0], hi_edge):
            y = np.array([2.2])
            a = self._eval(method, dims, starts, steps, vals, [np.array([edge - eps]), y])
            b = self._eval(method, dims, starts, steps, vals, [np.array([edge + eps]), y])
            np.testing.assert_allclose(a, b, atol=1e-5)


def test_searchsorted_and_take_small_size_regimes():
    """The two cliff-fix helpers (round 5): `locate.searchsorted` flips
    from the default scan lowering to the vectorized compare-count above
    64 entries, and `_gather.take_small` routes 65..4096-entry arrays
    through the fused one-hot select-sum — both must be EXACTLY
    equivalent to their jnp references at every size, including repeated
    entries (not-a-knot end knots), both sides, and boundary queries."""
    import jax.numpy as jnp

    from interpn_tpu.ops import locate
    from interpn_tpu.ops._gather import _TAKE_ONEHOT_MAX, take1, take_small

    rng = np.random.default_rng(11)
    for n in (8, 64, 65, 104, 1024, _TAKE_ONEHOT_MAX, _TAKE_ONEHOT_MAX + 1):
        base = np.sort(rng.uniform(-5.0, 5.0, n))
        base[: min(4, n)] = base[0]  # repeated low knots
        g = jnp.asarray(base)
        x = jnp.asarray(
            np.concatenate(
                [rng.uniform(-6.0, 6.0, 257), base[:: max(1, n // 7)]]
            )
        )
        for side in ("left", "right"):
            got = np.asarray(locate.searchsorted(g, x, side=side))
            want = np.asarray(jnp.searchsorted(g, x, side=side))
            np.testing.assert_array_equal(got, want, err_msg=f"n={n} {side}")
        idx = jnp.asarray(rng.integers(0, n, 311), jnp.int32)
        vals = jnp.asarray(rng.standard_normal(n))
        np.testing.assert_array_equal(
            np.asarray(take_small(vals, idx)),
            np.asarray(take1(vals, idx)),
            err_msg=f"take n={n}",
        )
    # non-1D index falls back to the plain gather
    idx2 = jnp.asarray(rng.integers(0, 100, (5, 7)), jnp.int32)
    vals = jnp.asarray(rng.standard_normal(100))
    np.testing.assert_array_equal(
        np.asarray(take_small(vals, idx2)), np.asarray(take1(vals, idx2))
    )


@pytest.mark.parametrize("method", ["linear", "cubic", "nearest"])
def test_rectilinear_above_cliff_grid_matches_oracle(method):
    """Rectilinear evaluation on >64-point axes (the compare_all/one-hot
    regime) agrees with the loop oracle — pins the round-5 cliff-fix
    helpers inside the real locate/evaluate pipeline."""
    rng = np.random.default_rng(7)
    g0 = np.sort(rng.uniform(0.0, 10.0, 100))
    g1 = np.sort(rng.uniform(0.0, 10.0, 70))
    while np.any(np.diff(g0) <= 1e-3):
        g0 = np.sort(rng.uniform(0.0, 10.0, 100))
    while np.any(np.diff(g1) <= 1e-3):
        g1 = np.sort(rng.uniform(0.0, 10.0, 70))
    grids = [g0, g1]
    vals = rng.standard_normal((100, 70))
    obs = [rng.uniform(-0.5, 10.5, 200) for _ in range(2)]
    got = it.interpn(obs, grids, vals, method=method)
    fn = {
        "linear": oracle.linear_rectilinear,
        "cubic": lambda g, v, p: oracle.cubic_rectilinear(g, v, p, True),
        "nearest": oracle.nearest_rectilinear,
    }[method]
    want = np.array(
        [fn(grids, vals.ravel(), p) for p in np.stack(obs, -1)]
    )
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-10)
