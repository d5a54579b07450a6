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
