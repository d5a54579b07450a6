"""Stacked-table (multi-channel) kernel scaling on real TPU hardware.

Question: how much does a channel cost? The fused kernel shares one
per-query weight build across all channels (the critical path for small
grids, docs/perf.md roofline), so channels should ride far below linear
cost until the padded MXU row extent pad(nch*lead) starts growing.

Run: PYTHONPATH=/root/repo python benches/exp_stack.py
Prints per-(dims, method) rows: nch, s/eval, Mq/s (queries*channels / s),
and the cost ratio vs nch=1.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import interpn_tpu  # noqa: F401  (x64 config)
import jax.numpy as jnp

from interpn_tpu.ops import pallas_v3 as v3
from interpn_tpu.utils.profiling import device_timeit

N = 1_000_000
R = 24


def run(dims, method, channels=(1, 2, 4, 8, 16, 32)):
    rng = np.random.default_rng(0)
    ndims = len(dims)
    starts = jnp.zeros(ndims, jnp.float32)
    steps = jnp.full(ndims, 0.5, jnp.float32)
    obs_sets = jnp.asarray(
        rng.uniform(-0.5, 0.5 * (max(dims) + 1), (R, ndims, N)), jnp.float32
    )
    base = None
    for nch in channels:
        if not v3.supported_stack(dims, nch, jnp.float32, method):
            print(f"  nch={nch:3d}: unsupported (VMEM)")
            continue
        vals = jnp.asarray(
            rng.standard_normal((nch, int(np.prod(dims)))), jnp.float32
        )
        kern = lambda ob: v3.eval_regular_stack(
            dims, starts, steps, vals, ob, method, True
        )
        dt = device_timeit(kern, obs_sets)
        if base is None:
            base = dt
        print(
            f"  nch={nch:3d}: {dt*1e3:8.3f} ms/eval  "
            f"{N*nch/dt/1e6:9.1f} Mq/s(ch)  cost x{dt/base:5.2f}"
        )


if __name__ == "__main__":
    for dims, method in [
        ((20, 20, 20), "linear"),
        ((20, 20, 20), "cubic"),
        ((20, 20, 20, 20), "cubic"),
        ((50, 50, 50), "cubic"),
    ]:
        print(f"{dims} {method}:")
        run(tuple(dims), method)
