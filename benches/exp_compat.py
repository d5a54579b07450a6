"""Measure the scipy-adapter surface against scipy itself.

Times `interpn_tpu.compat.RegularGridInterpolator` vs
`scipy.interpolate.RegularGridInterpolator` on identical inputs — the
exact call a migrating scipy user makes, adapter marshalling included.
Host timing: run alone (one CPU core; see CLAUDE.md).

Configs follow the reference's own benchmark family
(/root/reference/benches/bench_cpu.py: 20-per-axis 3D/4D grids, prealloc
loop): f64, rectilinear coordinate tuples (what scipy users hold), batch
sizes 1 / 1k / 1M, methods linear + nearest + cubic.

Usage: python benches/exp_compat.py [--device]
  --device  also time with the default (TPU) backend instead of CPU
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

ap = argparse.ArgumentParser()
ap.add_argument("--device", action="store_true")
args = ap.parse_args()

import jax

if not args.device:
    jax.config.update("jax_platforms", "cpu")

from scipy.interpolate import RegularGridInterpolator as SciRGI

from interpn_tpu.compat import RegularGridInterpolator as TpuRGI


def best_time(fn, reps=3, min_t=0.05):
    # autorange then best-of like timeit
    n = 1
    while True:
        t0 = time.perf_counter()
        for _ in range(n):
            fn()
        dt = time.perf_counter() - t0
        if dt > min_t:
            break
        n *= 4
    best = dt / n
    for _ in range(reps - 1):
        t0 = time.perf_counter()
        for _ in range(n):
            fn()
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def run(ndims, nobs, method, rng):
    n = 20
    grids = tuple(np.sort(rng.uniform(0.0, 10.0, n)) for _ in range(ndims))
    for g in grids:
        g[0], g[-1] = 0.0, 10.0
    shape = (n,) * ndims
    vals = rng.standard_normal(shape)
    xi = rng.uniform(0.2, 9.8, (nobs, ndims))

    ours = TpuRGI(grids, vals, method=method, bounds_error=False, fill_value=None)
    if method == "hermite":
        # extension method (the reference's local cubic); scipy has no
        # equivalent to race — record our throughput only
        ours(xi)
        t = best_time(lambda: ours(xi))
        print(
            f"{ndims}D {method:7s} n={nobs:>8d}: compat {nobs / t / 1e6:9.3f} Mq/s"
            "  (extension; no scipy equivalent)"
        )
        return None
    try:
        theirs = SciRGI(grids, vals, method=method, bounds_error=False, fill_value=None)
    except ValueError as e:
        # scipy's cubic tensor-spline construction uses an iterative solver
        # (gcrotmk) that fails to converge on some rectilinear grids (seen:
        # 4D 20^4, info=1000); the Hermite scheme has no solve at all.
        t = best_time(lambda: ours(xi), reps=2)
        print(
            f"{ndims}D {method:7s} n={nobs:>8d}: compat {nobs / t / 1e6:9.3f} Mq/s"
            f"  scipy CONSTRUCTION FAILED ({e})"
        )
        return None
    ours(xi)  # warm (jit/native build)
    theirs(xi)
    if method in ("cubic", "quintic"):
        # agreement bounded by SCIPY's iterative collocation solve (~1e-4);
        # this adapter's spline coefficients are exact (tests/test_bspline)
        np.testing.assert_allclose(ours(xi), theirs(xi), rtol=1e-3, atol=1e-3)
    else:
        np.testing.assert_allclose(ours(xi), theirs(xi), rtol=1e-6, atol=1e-6)
    t_ours = best_time(lambda: ours(xi))
    t_sci = best_time(lambda: theirs(xi))
    print(
        f"{ndims}D {method:7s} n={nobs:>8d}: compat {nobs / t_ours / 1e6:9.3f} Mq/s"
        f"  scipy {nobs / t_sci / 1e6:9.3f} Mq/s  speedup {t_sci / t_ours:7.1f}x"
    )
    return t_sci / t_ours


rng = np.random.default_rng(0)
speedups = []
for ndims in (3, 4):
    for method in ("linear", "nearest", "cubic", "hermite", "pchip", "quintic"):
        for nobs in (1, 1000, 1_000_000):
            if method in ("hermite", "pchip", "quintic") and nobs == 1:
                continue  # latency already characterized via linear/cubic
            s = run(ndims, nobs, method, rng)
            if s is not None:
                speedups.append(s)
print(f"geomean speedup: {np.exp(np.mean(np.log(speedups))):.1f}x")
