"""AOT serving artifacts (interpn_tpu.aot): export -> load -> serve parity.

The artifact must reproduce `eval_jax` exactly (same engine, pinned at
export time), survive the bytes round trip, pad-and-slice odd batch sizes
through the compiled buckets, and be servable in a process that never
constructs the pydantic model (subprocess test).
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

import interpn_tpu as it
from interpn_tpu import aot

RNG = np.random.default_rng(42)


def _grid(ndims, n=6):
    x = np.linspace(0.0, 2.0, n)
    mesh = np.meshgrid(*([x] * ndims), indexing="ij")
    vals = np.cos(mesh[0])
    for m in mesh[1:]:
        vals = vals + 0.3 * m * m
    return x, vals


def _models(dtype):
    x, vals = _grid(3)
    dims = [len(x)] * 3
    starts = np.full(3, x[0], dtype)
    steps = np.full(3, x[1] - x[0], dtype)
    v = vals.ravel().astype(dtype)
    grids = [x.astype(dtype)] * 3
    return [
        it.MultilinearRegular.new(dims, starts, steps, v),
        it.MulticubicRegular.new(dims, starts, steps, v),
        it.NearestRegular.new(dims, starts, steps, v),
        it.MultilinearRectilinear.new(grids, v),
        it.MulticubicRectilinear.new(grids, v),
        it.NearestRectilinear.new(grids, v),
    ]


def _obs(n, dtype, ndims=3):
    return tuple(
        RNG.uniform(-0.3, 2.3, n).astype(dtype) for _ in range(ndims)
    )


@pytest.mark.parametrize("dtype", [np.float64, np.float32])
def test_round_trip_parity_all_families(dtype):
    for model in _models(dtype):
        blob = aot.export_eval(model, 64)
        served = aot.load(blob)
        obs = _obs(64, dtype)
        got = np.asarray(served.eval_jax(obs))
        want = np.asarray(model.eval_jax(obs))
        if "Nearest" in type(model).__name__:
            # pure gather: the artifact must reproduce grid values exactly
            np.testing.assert_array_equal(got, want)
        else:
            # XLA may fuse the deserialized StableHLO differently than the
            # in-process trace (measured 4e-16 association noise on f64)
            rtol = 2e-15 if dtype == np.float64 else 2e-6
            np.testing.assert_allclose(got, want, rtol=rtol, atol=rtol)


@pytest.mark.parametrize("method", ["pchip", "cubic_spline", "quintic"])
def test_round_trip_parity_spline_models(method):
    """The extension methods share the persistent-model AOT lifecycle:
    a TensorSpline artifact reproduces eval_jax without the model."""
    x, vals = _grid(2, n=7)
    dims = [len(x)] * 2
    reg = it.TensorSplineRegular.new(
        dims, np.full(2, x[0]), np.full(2, x[1] - x[0]), vals.ravel(),
        method=method,
    )
    rect = it.TensorSplineRectilinear.new([x] * 2, vals.ravel(), method=method)
    for model in (reg, rect):
        served = aot.load(aot.export_eval(model, 48))
        obs = _obs(48, np.float64, ndims=2)
        got = np.asarray(served.eval_jax(obs))
        want = np.asarray(model.eval_jax(obs))
        np.testing.assert_allclose(got, want, rtol=2e-15, atol=2e-15)


def test_padding_to_bucket_matches_exact_batch():
    model = _models(np.float64)[1]  # cubic regular
    blob = aot.export_eval(model, 64)
    served = aot.load(blob)
    obs = _obs(13, np.float64)
    got = np.asarray(served.eval_jax(obs))
    assert got.shape == (13,)
    np.testing.assert_allclose(got, np.asarray(model.eval_jax(obs)), rtol=1e-13)


def test_bucket_selection_and_overflow():
    model = _models(np.float64)[0]
    blob = aot.export_eval(model, [32, 128])
    served = aot.load(blob)
    assert served.batch_sizes == [32, 128]
    out = served.eval_jax(_obs(100, np.float64))  # -> 128 bucket
    assert out.shape == (100,)
    with pytest.raises(ValueError, match="largest compiled bucket"):
        served.eval_jax(_obs(200, np.float64))
    with pytest.raises(ValueError, match="positive"):
        aot.export_eval(model, [])


def test_empty_batch_and_dimension_mismatch():
    model = _models(np.float64)[0]
    served = aot.load(aot.export_eval(model, 8))
    assert served.eval_jax(_obs(0, np.float64)).shape == (0,)
    with pytest.raises(AssertionError, match="Dimension mismatch"):
        served.eval_jax(_obs(8, np.float64)[:2])
    with pytest.raises(AssertionError, match="Dimension mismatch"):
        ragged = (*_obs(8, np.float64)[:2], np.zeros(5))
        served.eval_jax(ragged)


def test_rejects_garbage_bytes():
    with pytest.raises(ValueError, match="artifact"):
        aot.load(b"definitely not an artifact")


def test_callable_alias_and_repr():
    model = _models(np.float32)[0]
    served = aot.load(aot.export_eval(model, 16))
    obs = _obs(16, np.float32)
    np.testing.assert_array_equal(
        np.asarray(served(obs)), np.asarray(served.eval_jax(obs))
    )
    assert "MultilinearRegular" in repr(served)


def test_serves_without_model_in_fresh_process(tmp_path: Path):
    """The deployment contract: a process that never imports the model
    classes (no pydantic construction, no dispatch) loads the artifact and
    reproduces this process's results."""
    model = _models(np.float64)[0]
    obs = _obs(32, np.float64)
    want = np.asarray(model.eval_jax(obs))
    art = tmp_path / "m.itaot"
    art.write_bytes(aot.export_eval(model, 32))
    np.save(tmp_path / "obs.npy", np.stack(obs))
    script = (
        "import jax; jax.config.update('jax_platforms','cpu')\n"
        "import numpy as np\n"
        "from interpn_tpu import aot\n"
        f"sm = aot.load(open(r'{art}','rb').read())\n"
        f"obs = np.load(r'{tmp_path / 'obs.npy'}')\n"
        "out = np.asarray(sm.eval_jax(tuple(obs)))\n"
        f"np.save(r'{tmp_path / 'out.npy'}', out)\n"
    )
    subprocess.run(
        [sys.executable, "-c", script],
        check=True,
        timeout=300,
        cwd="/root/repo",
    )
    got = np.load(tmp_path / "out.npy")
    np.testing.assert_allclose(got, want, rtol=2e-15, atol=2e-15)
