"""Experiment: pallas v3 (grouped) throughput + accuracy on the real TPU.

PYTHONPATH=/root/repo python benches/exp_v3.py
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from interpn_tpu.ops import cubic as gc
from interpn_tpu.ops import factorized as fz
from interpn_tpu.ops import linear as gl
from interpn_tpu.ops import pallas_v3 as v3
from interpn_tpu.utils.profiling import device_timeit

N = 1 << 20
NREF = 1 << 16  # accuracy reference on a subset (gather @1M OOMs for 5D+)
R = 8


def run_config(dims, method, variants):
    rng = np.random.default_rng(0)
    nd = len(dims)
    starts = jnp.zeros(nd, jnp.float32)
    steps = jnp.full(nd, 0.5, jnp.float32)
    vals = jnp.asarray(rng.standard_normal(math.prod(dims)), jnp.float32)
    hi = 0.5 * (max(dims) - 1)
    obs_sets = jnp.asarray(rng.uniform(-1, hi + 1, (R, nd, N)).astype(np.float32))
    obs0 = tuple(obs_sets[0])
    obs_small = tuple(o[:NREF] for o in obs0)

    if method == "linear":
        ref = np.asarray(gl.linear_regular(dims, starts, steps, vals, obs_small))
    else:
        ref = np.asarray(
            gc.cubic_regular(dims, starts, steps, vals, obs_small, True)
        )
    scale = np.max(np.abs(ref))

    def report(name, fn):
        out = np.asarray(fn(obs_small))
        err = np.max(np.abs(out - ref)) / scale
        sec = device_timeit(fn, obs_sets)
        print(
            f"{'x'.join(map(str,dims))} {method:7s} {name:12s} "
            f"{N/sec/1e6:9.1f} Mq/s   relerr {err:.2e}",
            flush=True,
        )

    for v in variants:
        if v.startswith("p"):
            passes = int(v[1:])
            report(f"v3 {v}", lambda ob, p=passes: v3.eval_regular(
                dims, starts, steps, vals, ob, method, True, p))
        elif v == "fz":
            if method == "linear":
                report("fz HIGHEST", lambda ob: fz.linear_regular_factorized(
                    dims, starts, steps, vals, ob))
            else:
                report("fz HIGHEST", lambda ob: fz.cubic_regular_factorized(
                    dims, starts, steps, vals, ob, True))


if __name__ == "__main__":
    assert jax.default_backend() == "tpu"
    run_config((100, 100, 100), "linear", ["p6"])
    run_config((100, 100, 100), "cubic", ["p4", "p6", "fz"])
    run_config((50, 50, 50), "cubic", ["p4", "p6"])
