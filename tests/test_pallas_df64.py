"""Double-float f64 engine: accuracy vs the f64 gather tree (interpret mode
on CPU; throughput is validated on real TPU hardware, docs/perf.md).

The bar is the SURVEY hard-part target: rtol <= 1e-13 against true-f64
evaluation — far beyond f32 (2^-24), close to the double-float limit
(~2^-47 of stencil-term magnitudes).
"""

import numpy as np
import pytest

import interpn_tpu  # noqa: F401  (enables x64)
import jax.numpy as jnp
from jax.experimental import pallas as pl

from interpn_tpu import ops
from interpn_tpu.ops import pallas_df64 as df


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    orig = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        return orig(*args, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", interp_call)


def _case(dims, seed=0):
    rng = np.random.default_rng(seed)
    starts = jnp.asarray(rng.uniform(-1, 1, len(dims)))
    steps = jnp.asarray(rng.uniform(0.3, 1.0, len(dims)))
    vals = jnp.asarray(rng.standard_normal(int(np.prod(dims))))
    n = 700
    obs = tuple(
        jnp.asarray(
            rng.uniform(
                float(starts[k]) - 2 * float(steps[k]),
                float(starts[k]) + float(steps[k]) * (dims[k] + 1),
                n,
            )
        )
        for k in range(len(dims))
    )
    return starts, steps, vals, obs


@pytest.mark.parametrize("dims", [(8, 12), (10, 10, 10)])
def test_df64_linear_regular(dims):
    starts, steps, vals, obs = _case(dims)
    a = np.asarray(df.eval_regular(dims, starts, steps, vals, obs, "linear"))
    b = np.asarray(ops.linear.linear_regular(dims, starts, steps, vals, obs))
    np.testing.assert_allclose(a, b, rtol=1e-13, atol=1e-13)


@pytest.mark.parametrize("linearize", [True, False])
def test_df64_cubic_regular(linearize):
    dims = (8, 8, 8)
    starts, steps, vals, obs = _case(dims, seed=3)
    a = np.asarray(
        df.eval_regular(dims, starts, steps, vals, obs, "cubic", linearize)
    )
    b = np.asarray(ops.cubic.cubic_regular(dims, starts, steps, vals, obs, linearize))
    np.testing.assert_allclose(a, b, rtol=1e-12, atol=1e-12)


def test_df64_rectilinear():
    rng = np.random.default_rng(7)
    dims = (9, 8, 10)
    grids = tuple(jnp.asarray(np.cumsum(0.2 + rng.random(d))) for d in dims)
    vals = jnp.asarray(rng.standard_normal(int(np.prod(dims))))
    n = 700
    obs = tuple(
        jnp.asarray(rng.uniform(float(g[0]) - 1, float(g[-1]) + 1, n))
        for g in grids
    )
    a = np.asarray(df.eval_rectilinear(grids, vals, obs, "linear"))
    b = np.asarray(ops.linear.linear_rectilinear(grids, vals, obs))
    np.testing.assert_allclose(a, b, rtol=1e-13, atol=1e-13)
    a = np.asarray(df.eval_rectilinear(grids, vals, obs, "cubic", True))
    b = np.asarray(ops.cubic.cubic_rectilinear(grids, vals, obs, True))
    np.testing.assert_allclose(a, b, rtol=1e-12, atol=1e-12)


def test_df64_supported_policy():
    assert df.supported((20, 20, 20), "linear")
    assert df.supported((20, 20, 20), "cubic")
    assert not df.supported((20, 20, 20), "nearest")  # gather is exact + fast
    assert not df.supported((20,), "linear")
    assert not df.supported((100, 100, 100), "cubic")  # VPU cost ~ prod(dims)
    # long LAST axis under the volume caps: the last-axis contraction is a
    # static unroll in both kernels (Mosaic compile blowup) — refused
    assert not df.supported((4, 4, 8192), "cubic")
    assert not df.supported((2, 2048), "linear")


# ---------------------------------------------------------------------------
# Looped slab kernel (round 3): lead > _MAX_UNROLL_LEAD shapes — f64 4D/5D
# on device (VERDICT r2 #1; reference capability
# `src/multicubic/regular_recursive.rs:205-466`).
# ---------------------------------------------------------------------------


def test_looped_kernel_matches_flat():
    """The fori_loop slab restructure performs the same double-float op
    sequence as the flat kernel; agreement is at the engine's own accuracy
    floor (compiler FP-contraction choices differ between the two plane
    shapes, so bitwise equality is not attainable — measured 3.5e-15
    interior): force the looped path on a flat-eligible shape."""
    dims = (4, 8, 8, 4, 4)
    starts, steps, vals, obs = _case(dims, seed=11)
    a_flat = np.asarray(df.eval_regular(dims, starts, steps, vals, obs, "cubic"))
    import unittest.mock

    with unittest.mock.patch.object(df, "_MAX_UNROLL_LEAD", 256):
        assert df._choose_suffix(dims)[2] > 1
        a_loop = np.asarray(
            df.eval_regular(dims, starts, steps, vals, obs, "cubic")
        )
    # interior at the double-float floor; extrapolated points scale with
    # the stencil-term amplification like every df64 parity bound
    np.testing.assert_allclose(a_flat, a_loop, rtol=5e-12, atol=5e-12)


@pytest.mark.parametrize("dims,method", [
    ((13, 13, 13, 4), "linear"),
    ((13, 13, 13, 4), "cubic"),
    ((6, 10, 10, 6, 4), "cubic"),
])
def test_df64_looped_high_dim(dims, method):
    """4D/5D shapes past the static-unroll ceiling. Interior points hold the
    flat engine's <= 1e-13 bar; extrapolated points are bounded by the
    double-float limit ~2^-47 of the stencil-TERM magnitudes, which deep
    cubic extrapolation amplifies (|t|^3 per axis) — checked at 1e-13
    relative to that amplification envelope."""
    assert np.prod(dims[:-1]) > df._MAX_UNROLL_LEAD
    assert df.supported(dims, method)
    starts, steps, vals, obs = _case(dims, seed=int(np.sum(dims)))
    if method == "linear":
        b = np.asarray(ops.linear.linear_regular(dims, starts, steps, vals, obs))
    else:
        b = np.asarray(ops.cubic.cubic_regular(dims, starts, steps, vals, obs, True))
    a = np.asarray(df.eval_regular(dims, starts, steps, vals, obs, method))

    inside = np.ones(obs[0].shape, bool)
    amp = np.ones(obs[0].shape)
    for k in range(len(dims)):
        t = (np.asarray(obs[k]) - float(starts[k])) / float(steps[k])
        dist = np.maximum(np.maximum(-t, t - (dims[k] - 1)), 0.0)
        inside &= dist == 0.0
        p = 1 if method == "linear" else 3
        amp *= np.maximum(1.0, (2.0 * (dist + 1.0)) ** p)
    scale = np.max(np.abs(vals))
    assert np.max(np.abs(a - b)[inside]) <= 1e-13 * max(scale, 1.0)
    np.testing.assert_array_less(np.abs(a - b), 1e-13 * (amp * scale + 1.0))


def test_df64_supported_policy_looped():
    # 4D/5D cubic now served by the looped kernel
    assert df.supported((20, 20, 20, 20), "cubic")
    assert df.supported((12,) * 5, "cubic")
    assert df._choose_suffix((20,) * 4) == (3, 400, 20)
    # pathological: one huge leading axis over a tiny slab -> refused
    assert not df.supported((3000, 5), "cubic")
    # 4D linear: max_grid crossover keeps 20^4 on the gather path
    assert not df.supported((20, 20, 20, 20), "linear")


def test_df64_table_split_cached():
    """The hi/lo table split caches per table (content hash for host
    numpy, identity for device arrays) and is never cached under an
    active trace — re-splitting an unchanged table cost ~4 eager device
    dispatches per eval."""
    import jax

    rng = np.random.default_rng(3)
    v = rng.standard_normal(400)
    a = df._table_split(v, 20, 20)
    b = df._table_split(v.copy(), 20, 20)  # same content, different object
    assert a[0] is b[0] and a[1] is b[1]
    v2 = v.copy()
    v2[7] += 1.0
    c = df._table_split(v2, 20, 20)
    assert c[0] is not a[0]
    np.testing.assert_allclose(
        np.asarray(c[0]).astype(np.float64) + np.asarray(c[1]),
        v2.reshape(20, 20),
    )
    # device arrays key by identity
    vj = jnp.asarray(v)
    d1 = df._table_split(vj, 20, 20)
    d2 = df._table_split(vj, 20, 20)
    assert d1[0] is d2[0]
    # under a trace: no caching, result is a tracer pair that lowers fine
    def f(t):
        h, lo = df._table_split(t, 20, 20)
        return h.astype(jnp.float64) + lo.astype(jnp.float64)
    out = jax.jit(f)(vj)
    np.testing.assert_allclose(np.asarray(out), v.reshape(20, 20))
