"""Native CPU backend: availability, cross-path parity with the JAX kernels,
and dispatch-policy behavior."""

import numpy as np
import pytest

import interpn_tpu as it
from interpn_tpu import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native backend failed to build"
)


def test_native_builds_and_loads():
    assert native.available()


@pytest.mark.parametrize("ndims", [1, 2, 3, 4])
def test_native_matches_jax_linear_regular(ndims):
    rng = np.random.default_rng(11 + ndims)
    dims = [5] * ndims
    starts = rng.uniform(-2, 2, ndims)
    steps = rng.uniform(0.3, 1.5, ndims)
    vals = rng.standard_normal(5**ndims)
    n = 300
    obs = [rng.uniform(starts[k] - 3, starts[k] + steps[k] * 7, n) for k in range(ndims)]

    out_native = np.zeros(n)
    assert native.linear_regular(dims, starts, steps, vals, obs, out_native)

    # device path (bypass the native dispatch by using the jit core directly)
    import jax.numpy as jnp

    from interpn_tpu import raw

    res = raw._linear_regular(
        tuple(dims),
        jnp.asarray(starts),
        jnp.asarray(steps),
        jnp.asarray(vals),
        tuple(jnp.asarray(o) for o in obs),
    )[0]
    # ulp-level agreement (XLA's CPU codegen schedules the arithmetic
    # slightly differently; exact bitwise equality across backends is not a
    # contract the reference makes either)
    np.testing.assert_allclose(out_native, np.asarray(res), rtol=1e-12, atol=1e-13)


@pytest.mark.parametrize("linearize", [True, False])
def test_native_matches_jax_cubic_rectilinear(linearize):
    rng = np.random.default_rng(17)
    g = [np.cumsum(0.2 + rng.random(6)) for _ in range(2)]
    vals = rng.standard_normal(36)
    n = 257
    obs = [rng.uniform(g[k][0] - 2, g[k][-1] + 2, n) for k in range(2)]

    out_native = np.zeros(n)
    assert native.cubic_rectilinear(g, vals, linearize, obs, out_native)

    import jax.numpy as jnp

    from interpn_tpu import raw

    res = raw._cubic_rectilinear(
        tuple(jnp.asarray(x) for x in g),
        jnp.asarray(vals),
        tuple(jnp.asarray(o) for o in obs),
        linearize,
    )
    np.testing.assert_allclose(out_native, np.asarray(res), rtol=1e-13, atol=1e-13)


def test_raw_small_batch_routes_native(monkeypatch):
    """Small host batches must produce results without touching the device
    path (simulated by checking the native fast path alone satisfies the raw
    call)."""
    x = np.linspace(0.0, 4.0, 5)
    vals = 2.0 * x
    obs = [np.array([1.25, 3.5, -1.0, 9.0])]
    out = np.zeros(4)
    it.raw.interpn_linear_regular_f64(
        [5], np.array([0.0]), np.array([1.0]), vals, obs, out
    )
    np.testing.assert_allclose(out, 2.0 * obs[0], atol=1e-14)


def test_native_disabled_env(monkeypatch):
    monkeypatch.setenv("INTERPN_TPU_NATIVE", "0")
    assert not native.use_native(10)
    monkeypatch.setenv("INTERPN_TPU_NATIVE", "always")
    assert native.use_native(10**9)
    monkeypatch.delenv("INTERPN_TPU_NATIVE")
    # default: all host-data batches are native
    assert native.use_native(10)
    assert native.use_native(10**9)
    # explicit threshold restores the crossover
    monkeypatch.setattr(native, "NATIVE_THRESHOLD", 4096)
    assert native.use_native(10)
    assert not native.use_native(10**9)
    monkeypatch.setattr(native, "NATIVE_THRESHOLD", None)


def test_native_cubic_high_dims():
    """Cubic 7-8D runs natively (weight-product evaluation, O(N) stack) and
    reproduces linear data under extrapolation."""
    rng = np.random.default_rng(23)
    for ndims in (7, 8):
        dims = [4] * ndims
        axes = [np.arange(4.0) for _ in range(ndims)]
        mesh = np.meshgrid(*axes, indexing="ij")
        vals = np.sum(np.stack(mesh), axis=0).ravel()
        obs = [rng.uniform(-0.5, 3.5, 20) for _ in range(ndims)]
        out = np.zeros(20)
        assert native.cubic_regular(
            dims, np.zeros(ndims), np.ones(ndims), vals, True, obs, out
        )
        expected = np.sum(np.stack(obs), axis=0)
        np.testing.assert_allclose(out, expected, atol=1e-9)


def test_native_unsupported_ndims_falls_back():
    """>8D reports False so the raw layer uses the device path (the raw API
    itself rejects >8D with the reference error first)."""
    out = np.zeros(1)
    assert not native.linear_regular(
        [2] * 9, np.zeros(9), np.ones(9), np.zeros(2**9), [np.zeros(1)] * 9, out
    )


def test_fastcall_rejects_wrong_dtype_buffers():
    """Integer obs/out buffers must NOT be bit-reinterpreted as floats by the
    fast C call layer: the PreparedCall checks the buffer format ('d'/'f'),
    not just the itemsize, and mismatches fall through to the ctypes slow
    path, which converts dtypes correctly."""
    import pytest

    import interpn_tpu as it

    x = np.arange(4.0)
    m = it.MultilinearRegular.new([4], np.zeros(1), np.ones(1), 2.0 * x)
    # int64 obs allocate an int64 `out`: both native layers must refuse the
    # buffer, and the JAX fallback raises TypeError (np.copyto same-kind),
    # matching the reference's PyO3 TypeError — never silent garbage.
    with pytest.raises(TypeError):
        m.eval([np.array([1, 3])])
    with pytest.raises(TypeError):
        m.eval([np.array([1.0, 3.0])], np.zeros(2, dtype=np.int64))
    # float obs with float out still work through the fast path
    np.testing.assert_allclose(m.eval([np.array([1.0, 3.0])]), [2.0, 6.0])


def test_native_cubic_extreme_coordinates():
    """Coordinate-range edge semantics (reference parity,
    `src/multicubic/regular.rs:438`): queries whose cell location is
    representable as a signed 64-bit index saturate to the edge cell (never
    wrapping through an int cast — UB); past 2^63 (or NaN/inf) the kernel
    raises "Unrepresentable coordinate value" instead of returning garbage."""
    from interpn_tpu import ops

    dims = [8]
    vals = np.arange(8.0)  # linear ramp: cubic reproduces it exactly
    for q in (-3e18, 3e18):  # |floc| < 2^63: representable, clamps
        out = np.zeros(1)
        assert native.cubic_regular(
            dims, np.zeros(1), np.ones(1), vals, True, [np.array([q])], out
        )
        dev = ops.cubic_regular(
            (8,), np.zeros(1), np.ones(1), vals, (np.array([q]),), True
        )
        np.testing.assert_allclose(out, np.asarray(dev), rtol=1e-12)
    for q in (-1e300, 1e300, np.nan, np.inf):  # unrepresentable: raises
        out = np.zeros(1)
        with pytest.raises(
            AssertionError, match="Unrepresentable coordinate value"
        ):
            native.cubic_regular(
                dims, np.zeros(1), np.ones(1), vals, True, [np.array([q])], out
            )


def test_check_bounds_dtype_follows_entry_point():
    """The f32 entry point REFUSES f64 arrays (reference parity: PyO3's
    PyReadonlyArray1<f32> extraction raises TypeError, src/python.rs:58-80)
    — so the bound comparison always runs in the entry point's dtype. With
    matching f32 inputs, x = f32(1 - 1e-12) rounds onto the bound and is
    flagged at atol=0, while the f64 entry sees it strictly inside."""
    import pytest

    from interpn_tpu import raw

    x64 = np.array([1.0 - 1e-12])
    with pytest.raises(TypeError, match="expected a float32 array"):
        raw.check_bounds_regular_f32(
            [2], np.array([0.0]), np.array([1.0]), [x64], 0.0,
            np.zeros(1, dtype=bool),
        )
    out32 = np.zeros(1, dtype=bool)
    raw.check_bounds_regular_f32(
        [2], np.zeros(1, np.float32), np.ones(1, np.float32),
        [x64.astype(np.float32)], 0.0, out32,
    )
    out64 = np.zeros(1, dtype=bool)
    raw.check_bounds_regular_f64(
        [2], np.array([0.0]), np.array([1.0]), [x64], 0.0, out64
    )
    assert bool(out32[0])  # rounds onto the bound in f32 -> flagged
    assert not bool(out64[0])  # strictly inside in f64


def test_native_threading_bitwise_identical():
    """Obs-axis threading shards into contiguous ranges with identical
    per-point math: results must be bitwise equal to single-threaded runs
    (and the >n-threads / non-divisible-n edge cases must cover all points)."""
    rng = np.random.default_rng(31)
    dims = [12, 12, 12]
    vals = rng.standard_normal(12**3)
    n = 100_003  # prime-ish: uneven shard sizes
    obs = [rng.uniform(-1.0, 12.0, n) for _ in range(3)]
    out1 = np.zeros(n)
    assert native.set_threads(1)
    assert native.cubic_regular(dims, np.zeros(3), np.ones(3), vals, True, obs, out1)
    for nt in (2, 4, 16):
        outn = np.full(n, np.nan)
        native.set_threads(nt)
        assert native.cubic_regular(
            dims, np.zeros(3), np.ones(3), vals, True, obs, outn
        )
        np.testing.assert_array_equal(out1, outn)
    # rectilinear + linear flavors through the same sharded entry
    grids = [np.sort(rng.uniform(0, 12, 12)) for _ in range(3)]
    for g in grids:
        g[0], g[-1] = -0.5, 12.5
    ref = np.zeros(n)
    native.set_threads(1)
    assert native.linear_rectilinear(grids, vals, obs, ref)
    outn = np.zeros(n)
    native.set_threads(8)
    assert native.linear_rectilinear(grids, vals, obs, outn)
    np.testing.assert_array_equal(ref, outn)
    native.set_threads(None)  # restore auto
