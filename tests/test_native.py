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
    )
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
    it.raw.interpn_linear_regular_f64([5], [0.0], [1.0], vals, obs, out)
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
