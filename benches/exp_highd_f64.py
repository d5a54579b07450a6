"""6-8D f64 device rates (VERDICT r3 weak #3): time 8^6 / 4^7 / 4^8 cubic
through the looped double-float VPU engine and the int8 MXU engine.

Fault-safety: the 5-8D GATHER tree's flat-gather program faults this
image's device when scanned (CLAUDE.md) — the pallas engines do not (12^5
and 17^5 already time fine in benches/bench_f64_engines.py); obs stacks
generate ON DEVICE, one alive at a time. Gather columns carry the cost
model's estimate, marked as such.

Run: PYTHONPATH=/root/repo python benches/exp_highd_f64.py
"""

from __future__ import annotations

import math

import numpy as np

import interpn_tpu  # noqa: F401  (x64 on)
import jax
import jax.numpy as jnp

from interpn_tpu.ops import pallas_df64 as pdf
from interpn_tpu.ops import pallas_i8 as pi8
from interpn_tpu.utils.profiling import device_timeit

N = 200_000
R = 4

CONFIGS = [
    ((8,) * 6, "cubic"),
    ((4,) * 7, "cubic"),
    ((4,) * 8, "cubic"),
]


def run():
    rng = np.random.default_rng(0)
    for dims, method in CONFIGS:
        nd = len(dims)
        starts = jnp.asarray(rng.uniform(-1, 1, nd))
        steps = jnp.asarray(rng.uniform(0.3, 1.0, nd))
        vals = jnp.asarray(rng.standard_normal(math.prod(dims)))
        span = (steps * (jnp.asarray(dims, jnp.float64) - 1)).reshape(1, -1, 1)
        gen = jax.jit(
            lambda key: jax.random.uniform(key, (R, nd, N), jnp.float64)
            * span + starts.reshape(1, -1, 1)
        )
        stack = jax.block_until_ready(gen(jax.random.PRNGKey(1)))
        name = "x".join(map(str, dims))
        est_gather = pi8._est_rates(dims, method)[1]
        print(f"{name} {method}: gather est {est_gather/1e6:6.3f} Mq/s", flush=True)
        for label, mod, sup in (
            ("df64", pdf, pdf.supported(dims, method)),
            ("i8  ", pi8, pi8.supported(dims, method, vals)),
        ):
            if not sup:
                print(f"  {label}: unsupported", flush=True)
                continue
            dt = device_timeit(
                lambda ob: mod.eval_regular(dims, starts, steps, vals, ob, method),
                stack,
            )
            print(f"  {label}: {N/dt/1e6:7.2f} Mq/s  ({dt*1e3:.1f} ms/eval)",
                  flush=True)
        del stack


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    run()
