"""Hardware measurement: the int8-multipass f64 engine vs df64 vs gather.

Usage: PYTHONPATH=/root/repo python benches/exp_i8_engine.py [n]
"""

import sys
import time

import numpy as np

import interpn_tpu  # noqa: F401
import jax.numpy as jnp

from interpn_tpu import ops
from interpn_tpu.ops import pallas_df64 as df
from interpn_tpu.ops import pallas_i8 as i8
from interpn_tpu.utils.profiling import device_timeit


def bench(dims, method, n, time_gather=True):
    rng = np.random.default_rng(0)
    starts = jnp.asarray(rng.uniform(-1, 1, len(dims)))
    steps = jnp.asarray(rng.uniform(0.3, 1.0, len(dims)))
    vals = jnp.asarray(rng.standard_normal(int(np.prod(dims))))
    R = 8
    obs_sets = jnp.asarray(
        rng.uniform(0.0, 1.0, (R, len(dims), n))
        * (steps * (jnp.asarray(dims, jnp.float64) - 1)).reshape(1, -1, 1)
        + starts.reshape(1, -1, 1)
    )
    print(f"--- {dims} {method} n={n} i8shape={i8._shape(dims)}", flush=True)
    obs1 = tuple(obs_sets[0])

    t0 = time.perf_counter()
    a = np.asarray(i8.eval_regular(dims, starts, steps, vals, obs1, method))
    t_c = time.perf_counter() - t0
    if method == "linear":
        gat = lambda ob: ops.linear.linear_regular(dims, starts, steps, vals, ob)
    else:
        gat = lambda ob: ops.cubic.cubic_regular(dims, starts, steps, vals, ob, True)
    b = np.asarray(gat(obs1))
    print(f"  i8 first call {t_c:.1f}s  err vs gather {np.max(np.abs(a - b)):.2e}", flush=True)

    t_i8 = device_timeit(
        lambda ob: i8.eval_regular(dims, starts, steps, vals, ob, method), obs_sets
    )
    line = f"  i8: {n / t_i8 / 1e6:7.2f} Mq/s"
    if df.supported(dims, method):
        t_df = device_timeit(
            lambda ob: df.eval_regular(dims, starts, steps, vals, ob, method),
            obs_sets,
        )
        line += f"   df64: {n / t_df / 1e6:7.2f} Mq/s"
    if time_gather:
        t_g = device_timeit(gat, obs_sets)
        line += f"   gather: {n / t_g / 1e6:7.2f} Mq/s"
    print(line, flush=True)


if __name__ == "__main__":
    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else 500_000
    for dims, method, tg in [
        ((20, 20, 20), "cubic", True),
        ((20, 20, 20), "linear", True),
        ((20, 20, 20, 20), "cubic", True),
        ((12, 12, 12, 12, 12), "cubic", False),  # 6D/5D gather scan faults the device
        ((40, 40, 40), "cubic", False),
    ]:
        try:
            bench(dims, method, n, time_gather=tg)
        except Exception as e:  # noqa: BLE001
            print(f"  FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)
