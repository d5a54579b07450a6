"""A/B: in-kernel Cox-de Boor (rect="knots") vs XLA-precomputed weights
(pre) for the fused f32 B-spline kernel, on the real TPU.

The pre route streams (k+1) weights + a loc per axis per query (~5x the
obs bytes for 3D cubic, HBM-bound regime); the knots route streams only
the query and builds the weights in-kernel from VMEM-resident knot
columns. Run: python benches/exp_spline_knots.py

Recorded result (v5e, 2026-08-19, docs/perf.md): pre is FASTER on small
knot arrays (20^3 k=3: 247.4 vs 230.3 Mq/s; 12^4: 224.6 vs 205.3;
20^2 k=5: 664.6 vs 499.8 — the weight recurrence is 2.5x deeper at k=5)
but CLIFFS 75x on ~100-entry knot arrays (100^2 k=3: 4.9 vs 372.3),
where XLA's per-query knot takes run at gather speed. Round 5 replaced
the INTERPN_TPU_SPLINE_PRE env knob with an automatic dispatch on the
static knot-column length (threshold measured by the --crossover sweep
below; see `pallas_v3._spline_use_pre`).

--crossover recorded result (v5e, 2026-08-21, PRE-cliff-fix code — the
basis for the tlen<=48 threshold; the collapse is one step at a vreg row):

    20^2 k=3 tlen= 24: knots 702.8  pre 792.2 Mq/s   (0.89x)
    40^2 k=3 tlen= 44: knots 597.8  pre 624.8        (0.96x)
    48^2 k=3 tlen= 52: knots 569.4  pre 566.7        (1.00x)
    56^2 k=3 tlen= 60: knots 537.2  pre 534.5        (1.01x)
    64^2 k=3 tlen= 68: knots 488.9  pre   4.9        (98.9x)
    100^2 k=3 tlen=104: knots 392.9 pre   4.9        (79.7x)
    20^2 k=5 tlen= 26: knots 488.6  pre 669.9        (0.73x)
    48^2 k=5 tlen= 54: knots 421.1  pre 486.6        (0.87x)
    20^3 k=3 tlen= 24: knots 220.9  pre 244.5        (0.90x)
    36^3 k=3 tlen= 40: knots  90.1  pre 100.4        (0.90x)

After the round-5 locate/take cliff fix (locate.searchsorted compare_all
+ _gather.take_small one-hot), the pre route no longer collapses: at
tlen 68/104 it measures 217.5/219.6 Mq/s vs knots 293.5/189.8 (R=16) —
a wash above the threshold, so the tlen<=48 dispatch stands on the
small-grid wins alone (docs/perf.md "The 64-entry locate/take cliff").
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


def crossover():
    """Locate the knot-array size where the pre route's XLA weight build
    collapses, to pin the automatic dispatch threshold
    (`pallas_v3._SPLINE_PRE_TLEN`). tlen = gn + k + 1."""
    cases = [(2, 3, gn) for gn in (20, 32, 40, 48, 56, 64, 80, 100)]
    cases += [(2, 5, gn) for gn in (20, 32, 40, 48)]
    cases += [(3, 3, gn) for gn in (20, 28, 36)]
    for ndims, k, gn in cases:
        x = np.linspace(0.0, 19.0, gn)
        mesh = np.meshgrid(*([x] * ndims), indexing="ij")
        vals = np.sin(mesh[0])
        for m in mesh[1:]:
            vals = vals + 0.37 * m
        knots, coeffs = bspline.prep_bspline([x] * ndims, vals.ravel(), k)
        kt = tuple(jnp.asarray(t, jnp.float32) for t in knots)
        cf = jnp.asarray(coeffs, jnp.float32)
        dt_k = timed(lambda o: v3._eval_bspline_knots(kt, cf, o, k), ndims)
        dt_p = timed(lambda o: v3._eval_bspline_pre(kt, cf, o, k), ndims)
        print(
            f"{gn}^{ndims} k={k} tlen={gn+k+1:3d}: "
            f"knots {N/dt_k/1e6:7.1f} Mq/s  pre {N/dt_p/1e6:7.1f} Mq/s  "
            f"knots/pre {dt_p/dt_k:5.2f}x",
            flush=True,
        )


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
        dt_k = timed(lambda o: v3._eval_bspline_knots(kt, cf, o, k), ndims)
        dt_p = timed(lambda o: v3._eval_bspline_pre(kt, cf, o, k), ndims)
        print(
            f"{gn}^{ndims} k={k}: knots {N/dt_k/1e6:7.1f} Mq/s  "
            f"pre {N/dt_p/1e6:7.1f} Mq/s  speedup {dt_p/dt_k:5.2f}x",
            flush=True,
        )


if __name__ == "__main__":
    if "--crossover" in sys.argv:
        crossover()
    else:
        main()
