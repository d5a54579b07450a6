"""Hardware study: the looped double-float f64 engine at 4D/5D (round 3).

Measures compile time and throughput of pallas_df64's fori_loop slab kernel
(lead > 2048) against the f64 gather tree on the real TPU, for the shapes
VERDICT r2 #1 calls out (a 20^4 grid was previously served by the gather
tree at ~1 Mq/s cubic — slower than the reference's CPU).

Usage: PYTHONPATH=/root/repo python benches/exp_df64.py [n_queries]
"""

import sys
import time

import numpy as np

import interpn_tpu  # noqa: F401  (x64 on)
import jax
import jax.numpy as jnp

from interpn_tpu import ops
from interpn_tpu.ops import pallas_df64 as df
from interpn_tpu.utils.profiling import device_timeit


def make_case(dims, n, seed=0):
    rng = np.random.default_rng(seed)
    starts = jnp.asarray(rng.uniform(-1, 1, len(dims)))
    steps = jnp.asarray(rng.uniform(0.3, 1.0, len(dims)))
    vals = jnp.asarray(rng.standard_normal(int(np.prod(dims))))
    R = 8
    obs_sets = jnp.asarray(
        rng.uniform(0.0, 1.0, (R, len(dims), n))
        * (steps * (jnp.asarray(dims, jnp.float64) - 1)).reshape(1, -1, 1)
        + starts.reshape(1, -1, 1)
    )
    return starts, steps, vals, obs_sets


def bench(dims, method, n):
    starts, steps, vals, obs_sets = make_case(dims, n)
    print(f"--- {dims} {method} n={n} suffix={df._choose_suffix(dims)} "
          f"supported={df.supported(dims, method)}", flush=True)

    # correctness spot-check vs gather first
    obs1 = tuple(obs_sets[0])
    t0 = time.perf_counter()
    a = np.asarray(df.eval_regular(dims, starts, steps, vals, obs1, method))
    t_compile = time.perf_counter() - t0
    if method == "linear":
        gat = lambda ob: ops.linear.linear_regular(dims, starts, steps, vals, ob)
    else:
        gat = lambda ob: ops.cubic.cubic_regular(dims, starts, steps, vals, ob, True)
    b = np.asarray(gat(obs1))
    err = float(np.max(np.abs(a - b)))
    print(f"  df64 first-call (incl compile): {t_compile:.1f}s  max|err| vs gather: {err:.3e}", flush=True)

    t_df = device_timeit(
        lambda ob: df.eval_regular(dims, starts, steps, vals, ob, method),
        obs_sets,
    )
    t_g = device_timeit(gat, obs_sets)
    print(f"  df64: {n / t_df / 1e6:8.2f} Mq/s   gather: {n / t_g / 1e6:8.2f} Mq/s   speedup: {t_g / t_df:.2f}x", flush=True)
    return n / t_df / 1e6, n / t_g / 1e6


if __name__ == "__main__":
    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else 200_000
    for dims, method in [
        ((20, 20, 20, 20), "cubic"),
        ((20, 20, 20, 20), "linear"),
        ((12, 12, 12, 12, 12), "cubic"),
        ((8, 8, 8, 8, 8, 8), "cubic"),
    ]:
        try:
            bench(dims, method, n)
        except Exception as e:  # noqa: BLE001 - survey run, report and move on
            print(f"  FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)
