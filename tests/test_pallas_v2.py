"""Pallas v2 (trailing-axes MXU contraction): interpret-mode parity."""

import numpy as np
import pytest

import interpn_tpu  # noqa: F401
import jax.numpy as jnp
from jax.experimental import pallas as pl

from interpn_tpu import ops
from interpn_tpu.ops import pallas_v2 as pk2


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    orig = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        return orig(*args, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", interp_call)


@pytest.mark.parametrize("dims", [(8, 12), (10, 10, 10)])
@pytest.mark.parametrize("method", ["linear", "cubic"])
def test_v2_matches_gather(dims, method):
    if method == "cubic" and min(dims) < 4:
        pytest.skip("cubic needs 4 points per axis")
    rng = np.random.default_rng(1)
    nd = len(dims)
    starts = jnp.zeros(nd, jnp.float32)
    steps = jnp.full(nd, 0.5, jnp.float32)
    vals = jnp.asarray(rng.standard_normal(int(np.prod(dims))), jnp.float32)
    obs = tuple(
        jnp.asarray(rng.uniform(-1, 0.5 * max(dims) + 1, 700), jnp.float32)
        for _ in range(nd)
    )
    a = pk2.eval_regular(dims, starts, steps, vals, obs, method, True)
    if method == "linear":
        b = ops.linear.linear_regular(dims, starts, steps, vals, obs)
    else:
        b = ops.cubic.cubic_regular(dims, starts, steps, vals, obs, True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=2e-3)


def test_v2_supported_policy():
    assert pk2.supported((20, 20, 20), jnp.float32, "cubic")
    assert not pk2.supported((20, 20, 20, 20), jnp.float32, "cubic")
    assert not pk2.supported((20,), jnp.float32, "linear")
    assert not pk2.supported((20, 20), jnp.float64, "linear")
