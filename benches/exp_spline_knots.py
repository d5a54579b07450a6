"""A/B: in-kernel Cox-de Boor (rect="knots") vs XLA-precomputed weights
(pre) for the fused f32 B-spline kernel, on the real TPU.

The pre route streams (k+1) weights + a loc per axis per query (~5x the
obs bytes for 3D cubic, HBM-bound regime); the knots route streams only
the query and builds the weights in-kernel from VMEM-resident knot
columns. Run: python benches/exp_spline_knots.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from interpn_tpu.ops import bspline, pallas_v3 as v3

R = 64
N = 1_000_000


def timed(fn, ndims, seeds=(0, 1, 2)):
    @jax.jit
    def run(stack):
        def body(acc, ob):
            return acc + jnp.sum(fn(tuple(ob))), None

        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), stack)
        return acc

    best = float("inf")
    for i, seed in enumerate(seeds):
        key = jax.random.PRNGKey(seed)
        stack = jax.random.uniform(
            key, (R, ndims, N), jnp.float32, 0.0, 9.5
        ) * 1.9  # spread over [0, ~18]
        if i == 0:
            jax.block_until_ready(run(stack))
        t0 = time.perf_counter()
        jax.block_until_ready(run(stack))
        best = min(best, (time.perf_counter() - t0) / R)
        del stack
    return best


def main():
    for ndims, k, gn in ((3, 3, 20), (2, 3, 100), (4, 3, 12), (2, 5, 20)):
        x = np.linspace(0.0, 19.0, gn)
        mesh = np.meshgrid(*([x] * ndims), indexing="ij")
        vals = np.sin(mesh[0])
        for m in mesh[1:]:
            vals = vals + 0.37 * m
        knots, coeffs = bspline.prep_bspline([x] * ndims, vals.ravel(), k)
        kt = tuple(jnp.asarray(t, jnp.float32) for t in knots)
        cf = jnp.asarray(coeffs, jnp.float32)
        dt_k = timed(lambda o: v3.eval_bspline(kt, cf, o, k), ndims)
        dt_p = timed(lambda o: v3.eval_bspline_pre(kt, cf, o, k), ndims)
        print(
            f"{gn}^{ndims} k={k}: knots {N/dt_k/1e6:7.1f} Mq/s  "
            f"pre {N/dt_p/1e6:7.1f} Mq/s  speedup {dt_p/dt_k:5.2f}x",
            flush=True,
        )


if __name__ == "__main__":
    main()
