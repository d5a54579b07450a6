"""Benchmark harness: one JSON line for the driver.

Headline metric: 3D regular-grid multilinear f32 throughput (queries/sec) at
1e6 device-resident observation points on one chip — the configuration the
reference's own headline numbers target (BASELINE.md, 3D prealloc rows).

Methodology notes:
* Each timed run `lax.scan`s the kernel over R DISTINCT observation sets
  inside one jit — this amortizes host dispatch AND defeats the execution
  result cache in this image's TPU relay (calling the same executable twice
  with identical buffers returns memoized results, which otherwise reports
  physically impossible throughput).
* Baseline derivation: the reference publishes only speedups over scipy's
  RegularGridInterpolator measured on its author's CPU. We measure scipy RGI
  f64 on THIS machine for the same 20^3-grid workload and multiply by the
  reference's published 3D-linear prealloc speedup at its largest published
  size (11.2x @ 10k obs, BASELINE.md). vs_baseline = ours / that estimate,
  computed from the PINNED baseline (PINNED_SCIPY_QPS — the live 1-core
  measurement swings with contention); the live ratio is reported as
  vs_baseline_live and a >20% pinned/live divergence warns on stderr.

`python bench.py --full` prints a per-config table (method x dtype x size,
plus the native CPU small-batch path and accuracy cross-checks) to stderr
AND writes the whole table to a dated JSON artifact (default
`benches/full_r<INTERPN_TPU_BENCH_ROUND>.json`, `--out PATH` to override) so
per-engine regressions are diffable round over round — the headline JSON
line alone only guards the 3D linear f32 path (VERDICT r3 weak #4).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

GRID_N = 20
N_OBS = 1_000_000
# Evaluations per timed scan. Each scan runs R back-to-back evals on
# DISTINCT inputs inside one jit: this amortizes this environment's ~25 ms
# relay dispatch latency (real TPU deployments dispatch in tens of us; the
# profiler-measured kernel time for this config is 2.75 ms/eval = 382 Mq/s,
# see docs/perf.md "kernel-time" table).
# R history: host-generated stacks wedged the relay at R=192 (3 x 2.3 GB of
# tunnel transfers; probe timeout, 420 s watchdog kill). Round 3 moved
# generation ON DEVICE (jax.random, ONE stack live at a time — the 4.6 GB
# R=384 stack fits HBM alone, three at once do not): no tunnel traffic,
# measured 320.6/325.6/335.8 Mq/s at R=192/288/384 vs 306.6 at R=96
# (benches/exp_devgen.py). Fitting overhead = a + b/R gives a ~ 0.09 ms,
# so R=768 (9.2 GB stack) would buy only ~+2% — 384 is the knee.
R = int(os.environ.get("INTERPN_TPU_BENCH_R", "384"))
SCIPY_SPEEDUP_3D_LINEAR = 11.2  # BASELINE.md: 3D linear prealloc @ 10k obs
# Pinned scipy RGI baseline (VERDICT r4 #5): the live measurement on this
# 1-core host swings with contention (documented 0.5-3.8 Mq/s spread),
# which made vs_baseline drift 7.92 -> 7.38 round-over-round with an
# unchanged hot path. This is the best uncontended measurement recorded in
# a round artifact (benches/full_r04.json, 2026-08-19). vs_baseline in
# the driver JSON uses the PINNED number; the live measurement is reported
# alongside and a >20% divergence prints a warning.
PINNED_SCIPY_QPS = 3.71e6


def _grid_host(ndims, grid_n=GRID_N):
    x = np.linspace(0.0, 10.0, grid_n)
    mesh = np.meshgrid(*([x] * ndims), indexing="ij")
    vals_np = np.sin(mesh[0])
    for m in mesh[1:]:
        vals_np = vals_np + m * 0.37
    return x, vals_np


def _grid(ndims, dtype, grid_n=GRID_N):
    import jax.numpy as jnp

    x, vals_np = _grid_host(ndims, grid_n)
    starts = jnp.zeros(ndims, dtype=dtype)
    steps = jnp.full(ndims, x[1] - x[0], dtype=dtype)
    vals = jnp.asarray(vals_np.ravel(), dtype=dtype)
    return x, vals_np, starts, steps, vals


def _rect_grids_host(ndims, seed=5, grid_n=GRID_N):
    """Strictly-monotonic non-uniform axes over the same [0, 10] span (so
    the shared on-device obs generator covers interior + extrapolation)."""
    rng = np.random.default_rng(seed)
    grids = []
    for _ in range(ndims):
        g = np.linspace(0.0, 10.0, grid_n)
        g[1:-1] += rng.uniform(-0.3, 0.3, grid_n - 2) * (g[1] - g[0])
        grids.append(np.sort(g))
    x, vals_np = _grid_host(ndims, grid_n)
    return grids, vals_np


def _obs_stack(ndims, n, dtype, seed=0):
    """One (R, ndims, n) stack of query coordinates, generated ON DEVICE.

    Host-generated stacks had to ship through this image's relay tunnel
    (2.3 GB each at R=192), which wedged the device; jax.random generation
    moves only a key across the tunnel (benches/exp_devgen.py)."""
    import jax
    import jax.numpy as jnp

    gen = jax.jit(
        lambda key: jax.random.uniform(
            key, (R, ndims, n), dtype, minval=-0.5, maxval=10.5
        )
    )
    return jax.block_until_ready(gen(jax.random.PRNGKey(seed)))


def _scan_time(kernel, ndims, n, dtype, seeds=(0, 1, 2)):
    """Seconds per evaluation of `kernel` over one (ndims, n) obs set.

    Takes the best of several timed scans over DISTINCT input stacks: the
    relay-attached device in this image has minute-scale latency variance,
    and the best observed rate is the honest estimate of device throughput
    (each timed quantity is itself an R-evaluation average). Stacks are
    generated on device one at a time — holding several R=192+ stacks
    (2.3 GB each) at once exhausts HBM."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(obs_stack):
        def body(acc, ob):
            out = kernel(tuple(ob))
            # full reduction: a sliced reduction would let XLA dead-code
            # eliminate the work being timed on non-custom-call paths
            return acc + jnp.sum(out), None

        acc, _ = jax.lax.scan(body, jnp.zeros((), obs_stack.dtype), obs_stack)
        return acc

    best = float("inf")
    for i, seed in enumerate(seeds):
        t_gen = time.perf_counter()
        stack = _obs_stack(ndims, n, dtype, seed=seed)
        print(f"#   stack {seed}: gen {time.perf_counter() - t_gen:.1f}s",
              file=sys.stderr, flush=True)
        if i == 0:
            t_c = time.perf_counter()
            jax.block_until_ready(run(stack))  # compile + warm
            print(f"#   compile+warm {time.perf_counter() - t_c:.1f}s",
                  file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        r = run(stack)
        jax.block_until_ready(r)
        best = min(best, (time.perf_counter() - t0) / R)
        del stack, r
    return best


def bench_device(method: str, dtype_name: str, ndims: int = 3,
                 n_obs: int = N_OBS, grid_n: int = GRID_N):
    """Queries/sec for the device (TPU) path via the dispatching ops API."""
    import jax.numpy as jnp

    from interpn_tpu import ops

    dtype = {"f32": jnp.float32, "f64": jnp.float64}[dtype_name]
    _, _, starts, steps, vals = _grid(ndims, dtype, grid_n)
    dims = (grid_n,) * ndims

    kern = {
        "linear": lambda o: ops.linear_regular(dims, starts, steps, vals, o),
        "cubic": lambda o: ops.cubic_regular(dims, starts, steps, vals, o, True),
        "nearest": lambda o: ops.nearest_regular(dims, starts, steps, vals, o),
    }[method]
    dt = _scan_time(kern, ndims, n_obs, dtype)
    return n_obs / dt


def bench_spline_device(ndims: int = 3, n_obs: int = N_OBS, dtype_name="f32",
                        grid_n: int = GRID_N):
    """Queries/sec for the global cubic B-spline (fused v3 engine in f32;
    the double-float/i8 engines serve f64)."""
    import jax.numpy as jnp

    from interpn_tpu.ops import bspline

    dtype = {"f32": jnp.float32, "f64": jnp.float64}[dtype_name]
    x, vals_np = _grid_host(ndims, grid_n)
    knots, coeffs = bspline.prep_bspline([x] * ndims, vals_np.ravel(), 3)
    kt = tuple(jnp.asarray(t, dtype) for t in knots)
    cf = jnp.asarray(coeffs, dtype)
    dt = _scan_time(
        lambda o: bspline.bspline_eval(kt, cf, o, 3), ndims, n_obs, dtype
    )
    return n_obs / dt


def bench_device_rect(method: str, dtype_name: str, ndims: int = 3,
                      n_obs: int = N_OBS, grid_n: int = GRID_N):
    """Queries/sec for the rectilinear device path via the dispatching ops
    API (f32 -> fused pallas rect kernels, f64 -> i8/df64 per dispatch)."""
    import jax.numpy as jnp

    from interpn_tpu import ops

    dtype = {"f32": jnp.float32, "f64": jnp.float64}[dtype_name]
    grids_np, vals_np = _rect_grids_host(ndims, grid_n=grid_n)
    grids = tuple(jnp.asarray(g, dtype) for g in grids_np)
    vals = jnp.asarray(vals_np.ravel(), dtype)
    kern = {
        "linear": lambda o: ops.linear_rectilinear(grids, vals, o),
        "cubic": lambda o: ops.cubic_rectilinear(grids, vals, o, True),
    }[method]
    dt = _scan_time(kern, ndims, n_obs, dtype)
    return n_obs / dt


def bench_df64_rect(n_obs: int = N_OBS):
    """Queries/sec for the double-float engine's rectilinear cubic path,
    called at the engine level (dispatch auto-routes rect f64 to i8 when
    admitted, so the df64 rect kernel needs its own row to be diffable)."""
    import jax.numpy as jnp

    from interpn_tpu.ops import pallas_df64 as pdf

    grids_np, vals_np = _rect_grids_host(3)
    grids = tuple(jnp.asarray(g) for g in grids_np)
    vals = jnp.asarray(vals_np.ravel())
    dt = _scan_time(
        lambda o: pdf.eval_rectilinear(grids, vals, o, "cubic", True),
        3, n_obs, jnp.float64,
    )
    return n_obs / dt


def bench_pchip_device(ndims: int = 3, n_obs: int = N_OBS):
    """Queries/sec for the pchip extension method (f64)."""
    import jax.numpy as jnp

    from interpn_tpu import ops

    _, _, starts, steps, vals = _grid(ndims, jnp.float64)
    dims = (GRID_N,) * ndims
    dt = _scan_time(
        lambda o: ops.pchip_regular(dims, starts, steps, vals, o),
        ndims, n_obs, jnp.float64,
    )
    return n_obs / dt


def bench_one_dim_device(n_obs: int = N_OBS):
    """Queries/sec for the one_dim fast-path family (Linear1D, regular)."""
    import jax.numpy as jnp

    from interpn_tpu.ops import one_dim

    x = np.linspace(0.0, 10.0, 1000)
    itp = one_dim.Linear1D(
        one_dim.RegularGrid1D(
            jnp.float32(0.0), jnp.float32(x[1] - x[0]),
            jnp.asarray(np.sin(x), jnp.float32),
        )
    )
    dt = _scan_time(lambda o: itp._eval(o[0]), 1, n_obs, jnp.float32)
    return n_obs / dt


def bench_stack_device(nch: int = 8, ndims: int = 3, n_obs: int = N_OBS):
    """Channel-queries/sec for an nch-table stack sharing one weight build."""
    import jax.numpy as jnp

    from interpn_tpu import ops

    x, vals_np = _grid_host(ndims)
    vals = jnp.asarray(
        np.stack([vals_np.ravel() + i for i in range(nch)]), jnp.float32
    )
    dims = (GRID_N,) * ndims
    starts = jnp.zeros(ndims, jnp.float32)
    steps = jnp.full(ndims, x[1] - x[0], jnp.float32)
    dt = _scan_time(
        lambda o: ops.linear_regular_stack(dims, starts, steps, vals, o),
        ndims, n_obs, jnp.float32,
    )
    return n_obs * nch / dt


def bench_native(method: str, n_obs: int, ndims: int = 3):
    """Queries/sec for the native CPU path (f64, preallocated out)."""
    from interpn_tpu import native

    if not native.available():
        return None
    x, vals_np = _grid_host(ndims)
    rng = np.random.default_rng(1)
    obs = [rng.uniform(-0.5, 10.5, n_obs) for _ in range(ndims)]
    out = np.zeros(n_obs)
    dims = [GRID_N] * ndims
    starts = np.zeros(ndims)
    steps = np.full(ndims, x[1] - x[0])
    call = {
        "linear": lambda: native.linear_regular(dims, starts, steps, vals_np.ravel(), obs, out),
        "cubic": lambda: native.cubic_regular(dims, starts, steps, vals_np.ravel(), True, obs, out),
        "nearest": lambda: native.nearest_regular(dims, starts, steps, vals_np.ravel(), obs, out),
    }[method]
    call()
    iters = max(3, int(2e6 / max(n_obs, 1)))
    t0 = time.perf_counter()
    for _ in range(iters):
        call()
    return n_obs * iters / (time.perf_counter() - t0)


def scipy_baseline_qps() -> float:
    from scipy.interpolate import RegularGridInterpolator

    x, vals_np = _grid_host(3)
    rgi = RegularGridInterpolator(
        (x, x, x), vals_np, method="linear", bounds_error=False, fill_value=None
    )
    rng = np.random.default_rng(2)
    pts = rng.uniform(-0.5, 10.5, (N_OBS, 3))
    rgi(pts[:1000])  # warm
    best = float("inf")
    for _ in range(3):  # best-of-3: host timing is contention-noisy
        t0 = time.perf_counter()
        rgi(pts)
        best = min(best, time.perf_counter() - t0)
    return N_OBS / best


DEVICE_TIMEOUT_S = int(os.environ.get("INTERPN_TPU_BENCH_TIMEOUT", "420"))


def _device_headline_watchdog():
    """Run the device headline in a subprocess with a hard timeout.

    The relay-attached TPU in this image occasionally wedges for several
    minutes (typically after killed device processes); a benchmark that
    can hang is worse than a lower number. Wedges clear on their own, so
    one timed-out attempt gets a second chance after a cooldown before
    falling back to the native CPU path (the default engine for host data
    anyway)."""
    import subprocess

    # FAST PROBE first (round 3, VERDICT r2 #10): a wedged relay used to
    # burn the full 420 s budget before the watchdog noticed. One tiny
    # eval (1e5 queries, no scan) answers "is the device responsive" in
    # ~30-60 s; on timeout we skip straight to the cooldown so the real
    # attempt lands inside the driver's budget.
    try:
        subprocess.run(
            [sys.executable, __file__, "--device-probe"],
            capture_output=True,
            # measured: a healthy relay completes the tiny probe in ~130 s
            # (process init + 2 remote compiles); 240 s still fails ~2x
            # faster than the 420 s headline budget on a real wedge
            timeout=int(os.environ.get("INTERPN_TPU_PROBE_TIMEOUT", "240")),
            text=True,
        )
    except subprocess.TimeoutExpired:
        print("# device probe timed out (wedged relay); cooling down",
              file=sys.stderr)
        time.sleep(90)
    except Exception as e:  # noqa: BLE001
        print(f"# device probe failed: {type(e).__name__}", file=sys.stderr)

    # second attempt gets a longer budget: a degraded relay that misses the
    # first window usually completes given ~25% more time after the cooldown
    for attempt, budget in enumerate((DEVICE_TIMEOUT_S, DEVICE_TIMEOUT_S + 120)):
        try:
            res = subprocess.run(
                [sys.executable, __file__, "--device-child"],
                capture_output=True,
                timeout=budget,
                text=True,
            )
            for line in res.stdout.splitlines():
                if line.startswith("QPS "):
                    return (
                        float(line.split()[1]),
                        "3d_linear_regular_f32_qps_1e6_obs",
                    )
            print(
                f"# device bench attempt {attempt + 1} produced no result",
                file=sys.stderr,
            )
        except subprocess.TimeoutExpired as e:
            print(
                f"# device bench attempt {attempt + 1} exceeded {budget}s;"
                " killed",
                file=sys.stderr,
            )
            tail = (e.stderr or b"")
            if isinstance(tail, bytes):
                tail = tail.decode(errors="replace")
            if tail:
                print("# child stderr tail: " + tail[-400:].replace("\n", " | "),
                      file=sys.stderr)
        except Exception as e:  # noqa: BLE001
            print(f"# device bench failed: {type(e).__name__}", file=sys.stderr)
        if attempt == 0:
            time.sleep(90)  # wedge cooldown before the retry
    qps = bench_native("linear", N_OBS) or 0.0
    return qps, "3d_linear_regular_f64_qps_1e6_obs_native_cpu"


def main():
    full = "--full" in sys.argv
    if "--device-probe" in sys.argv:
        # liveness probe: the CHEAPEST possible compile (a tiny 2D linear
        # eval) — the question is "is the relay responsive", and a big
        # probe program's own compile time would false-alarm the watchdog
        # (measured: a 100k-point 3D probe took > 150 s to compile on a
        # healthy but busy relay)
        import jax
        import jax.numpy as jnp

        out = jax.block_until_ready(jnp.arange(64.0, dtype=jnp.float32) * 2)
        from interpn_tpu import ops

        o = tuple(
            jnp.linspace(0.0, 3.0, 256, dtype=jnp.float32) for _ in range(2)
        )
        r = ops.linear_regular(
            (4, 4), jnp.zeros(2), jnp.ones(2),
            jnp.arange(16.0, dtype=jnp.float32), o,
        )
        jax.block_until_ready(r)
        print("PROBE OK")
        return
    if "--device-child" in sys.argv:
        print("# child up; entering bench_device", file=sys.stderr, flush=True)
        print(f"QPS {bench_device('linear', 'f32')}")
        return
    qps, metric = _device_headline_watchdog()
    scipy_qps = scipy_baseline_qps()
    baseline = PINNED_SCIPY_QPS * SCIPY_SPEEDUP_3D_LINEAR
    baseline_live = scipy_qps * SCIPY_SPEEDUP_3D_LINEAR
    divergence = abs(scipy_qps - PINNED_SCIPY_QPS) / PINNED_SCIPY_QPS
    if divergence > 0.20:
        print(
            f"# WARNING: live scipy baseline {scipy_qps/1e6:.2f} Mq/s "
            f"diverges {divergence:.0%} from pinned "
            f"{PINNED_SCIPY_QPS/1e6:.2f} Mq/s (host contention or a real "
            "environment change — vs_baseline uses the pinned number)",
            file=sys.stderr,
        )

    if full:
        # Shorter scans for the survey table keep --full under the relay's
        # patience; the headline above used the full R.
        global R
        R = 4
        err = sys.stderr
        table: dict[str, object] = {}
        raw_qps: dict[str, float] = {}  # unrounded, for the *_kernel math

        def row(name: str, qps):
            if qps:
                table[name] = round(qps / 1e6, 2)
                raw_qps[name] = qps
                print(f"# {name}: {qps/1e6:9.2f} Mq/s", file=err, flush=True)

        for method in ("linear", "cubic", "nearest"):
            for dt in ("f32", "f64"):
                row(f"tpu_{method}_{dt}_3d@1M", bench_device(method, dt))
        for method in ("linear", "cubic"):
            row(f"tpu_{method}_f32_4d@1M", bench_device(method, "f32", ndims=4))
        # i8 MXU f64 flagship (20^4 cubic routes to pallas_i8 in auto mode)
        row("tpu_cubic_f64_4d@1M", bench_device("cubic", "f64", ndims=4))
        # >=5D i8 row (12^5 cubic f64 routes to pallas_i8; VERDICT r4 #3)
        row("tpu_cubic_f64_5d12@1M",
            bench_device("cubic", "f64", ndims=5, grid_n=12))
        # rectilinear rows: f32 -> fused pallas rect, f64 -> i8 (auto) and
        # the df64 rect kernel at engine level
        for method in ("linear", "cubic"):
            row(f"tpu_{method}_rect_f32_3d@1M", bench_device_rect(method, "f32"))
        row("tpu_cubic_rect_f64_3d@1M", bench_device_rect("cubic", "f64"))
        # >64-point axes: the regime unlocked by the round-5 locate/take
        # cliff fix (compare_all searchsorted + one-hot takes) — tracked
        # so a lowering regression reappears in the round diff
        row("tpu_cubic_rect_f32_3d100@1M",
            bench_device_rect("cubic", "f32", grid_n=100))
        row("tpu_cubic_rect_df64_3d@1M", bench_df64_rect())
        # fused B-spline engine (round 4) in both dtypes + pchip + one_dim
        row("tpu_cubic_spline_f32_3d@1M", bench_spline_device())
        row("tpu_cubic_spline_f64_3d@1M", bench_spline_device(dtype_name="f64"))
        row("tpu_cubic_spline_f64_2d100@1M",
            bench_spline_device(ndims=2, dtype_name="f64", grid_n=100))
        row("tpu_pchip_f64_3d@1M", bench_pchip_device())
        row("tpu_one_dim_linear_f32_1d@1M", bench_one_dim_device())
        # stacked-table evaluation: Mq/s counts queries x channels
        row("tpu_stack8_linear_f32_3d@1M", bench_stack_device())
        for method in ("linear", "cubic"):
            for n in (1, 1000):
                row(f"native_{method}_f64_3d@{n}", bench_native(method, n))
        row("scipy_rgi_linear_f64_3d@1M", scipy_qps)
        row("implied_reference_baseline", baseline)
        row("implied_reference_baseline_live", baseline_live)
        table["headline_qps"] = round(qps, 1)
        table["bench_R_full"] = R

        # At R=4 the relay's fixed dispatch cost (~25 ms/run, header note)
        # is amortized over only 4 evals, deflating fast rows ~3x against
        # kernel truth (a 3 ms kernel reads ~10 ms/eval). Time a no-work
        # kernel the same way to measure that fixed cost, then publish
        # overhead-corrected rows beside the raw ones: raw rows diff
        # round-over-round at fixed R; *_kernel rows are the engine rates
        # comparable with docs/perf.md. Rows where the kernel is not
        # clearly above the noise of the correction (<10% of the scan) are
        # left uncorrected.
        import jax.numpy as jnp

        o_dt = _scan_time(lambda o: o[0], 3, N_OBS, jnp.float32)
        table["overhead_ms_per_eval"] = round(o_dt * 1e3, 3)
        # correct from the UNROUNDED qps (the table entry is rounded to 2
        # decimals — back-computing from it injects up to ~0.5% and a row
        # that rounds to 0.00 would divide by zero)
        for name in [k for k in raw_qps if k.startswith("tpu_")]:
            mult = 8 if name.startswith("tpu_stack8") else 1
            dt = N_OBS * mult / raw_qps[name]
            dt_kernel = dt - o_dt
            if dt_kernel > 0.1 * dt:
                table[name + "_kernel"] = round(
                    N_OBS * mult / dt_kernel / 1e6, 2
                )
        table["note"] = (
            "raw tpu_* rows include overhead_ms_per_eval of fixed relay "
            "dispatch per eval (R=4); *_kernel rows subtract it"
        )

        out_path = None
        if "--out" in sys.argv:
            out_path = sys.argv[sys.argv.index("--out") + 1]
        else:
            rnd = os.environ.get("INTERPN_TPU_BENCH_ROUND")
            if rnd:
                out_path = os.path.join(
                    os.path.dirname(os.path.abspath(__file__)),
                    "benches", f"full_r{rnd}.json",
                )
        if out_path:
            table["timestamp"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
            with open(out_path, "w") as f:
                json.dump(table, f, indent=1, sort_keys=True)
            print(f"# wrote {out_path}", file=err)

    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(qps, 1),
                "unit": "queries/sec",
                # pinned-baseline ratio (stable round-over-round); the
                # live-host ratio rides along for the record
                "vs_baseline": round(qps / baseline, 3),
                "vs_baseline_live": round(qps / baseline_live, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
