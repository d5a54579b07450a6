"""Experiment: Mosaic pipelining knobs for the v3 kernel on real TPU.

Sweeps query-tile width, grid dimension_semantics, and bounds-check
elision for the configs where the MXU stage is the bottleneck (4D cubic,
100^3 cubic) plus the 3D headline as a regression guard.

PYTHONPATH=/root/repo python benches/exp_tune.py
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from interpn_tpu.ops import pallas_v3 as v3
from interpn_tpu.utils.profiling import device_timeit

N = 1 << 20
R = 8


def clear():
    v3._pallas_v3.clear_cache()
    v3._pallas_v3_rect.clear_cache()
    v3._pallas_v3_pre.clear_cache()


def run_config(dims, method, passes, variants):
    rng = np.random.default_rng(0)
    nd = len(dims)
    starts = jnp.zeros(nd, jnp.float32)
    steps = jnp.full(nd, 0.5, jnp.float32)
    vals = jnp.asarray(rng.standard_normal(math.prod(dims)), jnp.float32)
    hi = 0.5 * (max(dims) - 1)
    obs_sets = jnp.asarray(rng.uniform(-1, hi + 1, (R, nd, N)).astype(np.float32))

    base = dict(
        max_tq=v3._MAX_TQ, min_tq=v3._MIN_TQ, sem=v3._DIM_SEMANTICS,
        nobounds=v3._DISABLE_BOUNDS,
    )
    for name, cfg in variants:
        v3._MAX_TQ = cfg.get("max_tq", base["max_tq"])
        v3._MIN_TQ = cfg.get("min_tq", base["min_tq"])
        v3._DIM_SEMANTICS = cfg.get("sem", base["sem"])
        v3._DISABLE_BOUNDS = cfg.get("nobounds", base["nobounds"])
        clear()
        fn = lambda ob: v3.eval_regular(
            dims, starts, steps, vals, ob, method, True, passes)
        try:
            sec = device_timeit(fn, obs_sets)
            print(
                f"{'x'.join(map(str,dims))} {method:7s} p{passes} {name:24s} "
                f"{N/sec/1e6:9.1f} Mq/s",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001
            print(f"{'x'.join(map(str,dims))} {method} p{passes} {name}: "
                  f"FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
    v3._MAX_TQ = base["max_tq"]
    v3._MIN_TQ = base["min_tq"]
    v3._DIM_SEMANTICS = base["sem"]
    v3._DISABLE_BOUNDS = base["nobounds"]
    clear()


VARIANTS = [
    ("baseline", {}),
    ("tq2048", {"max_tq": 2048, "min_tq": 2048}),
    ("sem=arbitrary", {"sem": ("arbitrary",)}),
    ("sem=parallel", {"sem": ("parallel",)}),
    ("nobounds", {"nobounds": True}),
    ("tq2048+arb", {"max_tq": 2048, "min_tq": 2048, "sem": ("arbitrary",)}),
    ("tq2048+arb+nb", {"max_tq": 2048, "min_tq": 2048, "sem": ("arbitrary",),
                       "nobounds": True}),
]

if __name__ == "__main__":
    assert jax.default_backend() == "tpu"
    run_config((20, 20, 20, 20), "cubic", 6, VARIANTS)
    run_config((20, 20, 20, 20), "cubic", 4, VARIANTS)
    run_config((20, 20, 20), "linear", 6, VARIANTS)
    run_config((100, 100, 100), "cubic", 4, VARIANTS[:5])
