"""Fused Pallas kernel: parity with the gather path (interpret mode on CPU;
the same kernel is validated on real TPU hardware at f32 level — see
docs/perf.md)."""

import numpy as np
import pytest

import interpn_tpu  # noqa: F401
import jax.numpy as jnp
from jax.experimental import pallas as pl

from interpn_tpu import ops
from interpn_tpu.ops import pallas_kernels as pk


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    orig = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        return orig(*args, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", interp_call)


def _case(dims, seed=0):
    rng = np.random.default_rng(seed)
    starts = jnp.asarray(rng.uniform(-1, 1, len(dims)), jnp.float32)
    steps = jnp.asarray(rng.uniform(0.3, 1.0, len(dims)), jnp.float32)
    vals = jnp.asarray(rng.standard_normal(int(np.prod(dims))), jnp.float32)
    n = 700  # non-multiple of the tile size: exercises padding
    obs = tuple(
        jnp.asarray(
            rng.uniform(float(starts[k]) - 2, float(starts[k]) + 12, n), jnp.float32
        )
        for k in range(len(dims))
    )
    return starts, steps, vals, obs


@pytest.mark.parametrize("dims", [(8, 12), (10, 10, 10)])
def test_pallas_linear_matches_gather(dims):
    starts, steps, vals, obs = _case(dims)
    a = pk.eval_regular(dims, starts, steps, vals, obs, "linear", True)
    b = ops.linear.linear_regular(dims, starts, steps, vals, obs)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-3)


@pytest.mark.parametrize("linearize", [True, False])
def test_pallas_cubic_matches_gather(linearize):
    dims = (8, 8, 8)
    starts, steps, vals, obs = _case(dims, seed=3)
    a = pk.eval_regular(dims, starts, steps, vals, obs, "cubic", linearize)
    b = ops.cubic.cubic_regular(dims, starts, steps, vals, obs, linearize)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=2e-3)


def test_supported_policy():
    assert pk.supported((20, 20, 20), jnp.float32, "linear")
    assert not pk.supported((20, 20, 20), jnp.float64, "linear")
    assert not pk.supported((2000, 2000), jnp.float32, "cubic")  # table too big
    assert not pk.supported((20,), jnp.float32, "linear")  # 1D: XLA is fine
    assert not pk.supported((20, 20), jnp.float32, "nearest")
