"""Hardware measurement: int8 engine on NEW-REGION shapes (lead > 2048 /
pieces > 8 MB), admitted in round 3 by the padded-volume cost model in
`ops.pallas_i8.supported`. Predictions to check (docs/perf.md constants):

    50^3 cubic: est 3.9 Mq/s vs gather 0.97
    64^3 cubic: est 2.5 Mq/s vs gather 0.97
    17^5 cubic: est 0.67 Mq/s vs gather ~0.06 (gather not timed: 5-8D
                gather scans fault the device; parity via one eager call)

Usage: PYTHONPATH=/root/repo python benches/exp_i8_large.py [n]
"""

import sys
import time

import numpy as np

import interpn_tpu  # noqa: F401
import jax.numpy as jnp

from interpn_tpu import ops
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
    est_i8, est_g = i8._est_rates(dims, method)
    print(
        f"--- {dims} {method} n={n} i8shape={i8._shape(dims)} "
        f"est i8/gather {est_i8 / 1e6:.2f}/{est_g / 1e6:.2f} Mq/s",
        flush=True,
    )
    assert i8.supported(dims, method, vals), "cost/VMEM gate refused"
    obs1 = tuple(obs_sets[0])

    t0 = time.perf_counter()
    a = np.asarray(i8.eval_regular(dims, starts, steps, vals, obs1, method))
    t_c = time.perf_counter() - t0
    if method == "linear":
        gat = lambda ob: ops.linear.linear_regular(dims, starts, steps, vals, ob)
    else:
        gat = lambda ob: ops.cubic.cubic_regular(dims, starts, steps, vals, ob, True)
    b = np.asarray(gat(obs1))
    scale = np.maximum(np.abs(b), 1.0)
    print(
        f"  i8 first call {t_c:.1f}s  rel err vs gather "
        f"{np.max(np.abs(a - b) / scale):.2e}",
        flush=True,
    )

    t_i8 = device_timeit(
        lambda ob: i8.eval_regular(dims, starts, steps, vals, ob, method), obs_sets
    )
    line = f"  i8: {n / t_i8 / 1e6:7.2f} Mq/s"
    if time_gather:
        t_g = device_timeit(gat, obs_sets)
        line += f"   gather: {n / t_g / 1e6:7.2f} Mq/s"
    print(line, flush=True)


if __name__ == "__main__":
    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else 500_000
    for dims, method, tg in [
        ((50, 50, 50), "cubic", True),
        ((64, 64, 64), "cubic", True),
        ((17, 17, 17, 17, 17), "cubic", False),  # gather scan faults >= 5D
    ]:
        try:
            bench(dims, method, n, time_gather=tg)
        except Exception as e:  # noqa: BLE001
            print(f"  FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)
