"""Throughput sweeps vs scipy, mirroring the reference's benches/bench_cpu.py.

Produces the same two families of figures the reference publishes
(`docs/perf.md` artifacts):

* speedup vs dims: 4-points-per-axis grids, 1-6 dimensions, 1 and 1000
  observation points, linear + cubic + nearest against scipy
  RegularGridInterpolator (`bench_cpu.py:928-1010` configs).
* throughput vs nobs: 3D and 4D 20-points-per-axis grids, nobs from 1 to
  1e6, preallocated output (`bench_cpu.py:652-860` configs).

Results print as a table and render SVGs into docs/. The interpn-tpu side
automatically uses its dispatch policy (native CPU for small batches, TPU
factorized path for large f32 batches, gather for f64), which is exactly
what a user gets.

Set INTERPN_TPU_BENCH_ONLY=1 to skip the scipy baselines (the reference's
INTERPNPY_INTERPN_ONLY analogue for profile workloads).

Run: python benches/bench_sweep.py [--quick]
"""

from __future__ import annotations

import gc
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import interpn_tpu as it

RUN_INTERPN_ONLY = os.environ.get("INTERPN_TPU_BENCH_ONLY", "") in ("1", "true")
DOCS = Path(__file__).resolve().parent.parent / "docs"


def average_call_time(func, target_seconds: float = 1.0) -> float:
    """Average wall time of func() over ~target_seconds of samples."""
    func()  # warm (compile / cache)
    gc.collect()
    t0 = time.perf_counter()
    func()
    once = max(time.perf_counter() - t0, 1e-7)
    iters = max(1, min(100_000, int(target_seconds / once)))
    gc.collect()
    t0 = time.perf_counter()
    for _ in range(iters):
        func()
    return (time.perf_counter() - t0) / iters


def _grid_case(ndims, npts, dtype=np.float64, seed=0):
    rng = np.random.default_rng(seed)
    axes = [np.linspace(0.0, 1.0, npts) for _ in range(ndims)]
    mesh = np.meshgrid(*axes, indexing="ij")
    vals = np.sum(np.stack([np.sin(3 * m) for m in mesh]), axis=0).astype(dtype)
    return axes, vals


def _interpolators(axes, vals, dtype):
    dims = [len(a) for a in axes]
    starts = np.array([a[0] for a in axes], dtype=dtype)
    steps = np.array([a[1] - a[0] for a in axes], dtype=dtype)
    flat = vals.ravel().astype(dtype)
    out = {
        "linear": it.MultilinearRegular.new(dims, starts, steps, flat),
        "cubic": (
            it.MulticubicRegular.new(dims, starts, steps, flat)
            if min(dims) >= 4
            else None
        ),
        "nearest": (
            it.NearestRegular.new(dims, starts, steps, flat)
            if len(dims) <= 6
            else None
        ),
    }
    return out


def sweep_vs_dims(max_dims=6, nobs_list=(1, 1000)):
    print("== speedup vs dims (4-point axes) ==")
    rows = {}
    for nobs in nobs_list:
        for ndims in range(1, max_dims + 1):
            axes, vals = _grid_case(ndims, 4)
            interps = _interpolators(axes, vals, np.float64)
            rng = np.random.default_rng(1)
            obs = [rng.uniform(-0.2, 1.2, nobs) for _ in range(ndims)]
            out = np.zeros(nobs)

            scipy_t = None
            if not RUN_INTERPN_ONLY:
                from scipy.interpolate import RegularGridInterpolator

                pts = np.stack(obs, axis=-1)
                rgi = RegularGridInterpolator(
                    axes, vals, method="linear", bounds_error=False, fill_value=None
                )
                scipy_t = average_call_time(lambda: rgi(pts), 0.3)

            for method, interp in interps.items():
                if interp is None:
                    continue
                t = average_call_time(lambda: interp.eval(obs, out), 0.3)
                speedup = (scipy_t / t) if scipy_t else float("nan")
                rows[(method, nobs, ndims)] = (nobs / t, speedup)
                print(
                    f"  {method:8s} {ndims}D nobs={nobs:<6d}"
                    f" {nobs/t/1e6:9.3f} Mq/s   speedup vs scipy(linear): {speedup:6.1f}x"
                )
    return rows


def sweep_vs_nobs(ndims_list=(3, 4), ns=(1, 10, 100, 1000, 10_000, 100_000, 1_000_000)):
    print("== throughput vs nobs (20-point axes, prealloc out) ==")
    rows = {}
    for ndims in ndims_list:
        axes, vals = _grid_case(ndims, 20)
        interps = _interpolators(axes, vals, np.float64)
        rng = np.random.default_rng(2)
        for n in ns:
            obs = [rng.uniform(-0.2, 1.2, n) for _ in range(ndims)]
            out = np.zeros(n)
            for method in ("linear", "cubic"):
                interp = interps[method]
                t = average_call_time(lambda: interp.eval(obs, out), 0.5)
                rows[(method, ndims, n)] = n / t
                print(f"  {method:8s} {ndims}D nobs={n:<8d} {n/t/1e6:9.3f} Mq/s")
    return rows


def plot(rows_nobs, path: Path):
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return
    fig, axs = plt.subplots(1, 2, figsize=(11, 4), constrained_layout=True)
    for ax, ndims in zip(axs, (3, 4)):
        for method in ("linear", "cubic"):
            pts = sorted(
                (n, q) for (m, d, n), q in rows_nobs.items() if m == method and d == ndims
            )
            ax.loglog([p[0] for p in pts], [p[1] for p in pts], "o-", label=method)
        ax.set_xlabel("observation points")
        ax.set_ylabel("queries/sec")
        ax.set_title(f"{ndims}D, 20 pts/axis, prealloc out")
        ax.legend()
        ax.grid(True, which="both", alpha=0.3)
    path.parent.mkdir(exist_ok=True)
    fig.savefig(path)
    print(f"wrote {path}")


if __name__ == "__main__":
    quick = "--quick" in sys.argv
    sweep_vs_dims(max_dims=4 if quick else 6)
    rows = sweep_vs_nobs(ns=(1, 1000, 100_000) if quick else (1, 10, 100, 1000, 10_000, 100_000, 1_000_000))
    plot(rows, DOCS / "throughput_vs_nobs.svg")
