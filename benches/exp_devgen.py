"""Device-generated obs stacks for the headline bench: can R rise?

bench.py generates the R x ndims x 1e6 observation stacks with host numpy
and ships them through the relay tunnel — that transfer (3 x 2.3 GB at
R=192) is what wedged the relay when R was doubled (CLAUDE.md). This
experiment generates the stacks ON DEVICE with jax.random (no tunnel
traffic beyond a key) and re-measures the 3D linear f32 headline at
R in {96, 192, 384}: if the wedge was transfer-born, higher R should now
be safe and shave the residual ~20%% dispatch amortization gap
(306.7 Mq/s end-to-end vs 382 kernel-time at R=96).

Run alone on the TPU: python benches/exp_devgen.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

GRID_N = 20
N_OBS = 1_000_000


def main() -> None:
    import jax
    import jax.numpy as jnp

    from interpn_tpu import ops

    x = np.linspace(0.0, 10.0, GRID_N)
    mesh = np.meshgrid(*([x] * 3), indexing="ij")
    vals_np = np.sin(mesh[0]) + (mesh[1] + mesh[2]) * 0.37
    starts = jnp.zeros(3, jnp.float32)
    steps = jnp.full(3, x[1] - x[0], jnp.float32)
    vals = jnp.asarray(vals_np.ravel(), jnp.float32)
    dims = (GRID_N,) * 3

    kern = lambda o: ops.linear_regular(dims, starts, steps, vals, o)

    for R in (192, 288, 384):
        def gen(seed):
            @jax.jit
            def g(key):
                return jax.random.uniform(
                    key, (R, 3, N_OBS), jnp.float32, minval=-0.5, maxval=10.5
                )
            return g(jax.random.PRNGKey(seed))

        @jax.jit
        def run(obs_stack):
            def body(acc, ob):
                return acc + jnp.sum(kern(tuple(ob))), None

            acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), obs_stack)
            return acc

        try:
            # ONE stack live at a time: holding all three R=384 stacks
            # (3 x 4.6 GB) is what exhausted HBM in the first sweep; the
            # generation between timed scans is untimed.
            best = float("inf")
            for seed in (0, 1, 2):
                st = jax.block_until_ready(gen(seed))
                if seed == 0:
                    jax.block_until_ready(run(st))  # warm/compile
                t0 = time.perf_counter()
                jax.block_until_ready(run(st))
                best = min(best, (time.perf_counter() - t0) / R)
                del st
            print(f"R={R:4d}: {N_OBS / best / 1e6:8.1f} Mq/s "
                  f"({best * 1e3:.3f} ms/eval)", flush=True)
        except Exception as e:  # OOM at big R is informative, not fatal
            print(f"R={R:4d}: failed ({type(e).__name__}: {str(e)[:120]})",
                  flush=True)


if __name__ == "__main__":
    main()
