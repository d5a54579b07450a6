"""Hardware smoke: 7D/8D fused-engine parity + throughput on real TPU."""
import math
import jax
import jax.numpy as jnp
import numpy as np
from interpn_tpu.ops import cubic as gc
from interpn_tpu.ops import linear as gl
from interpn_tpu.ops import pallas_v3 as v3
from interpn_tpu.utils.profiling import device_timeit

N = 1 << 18
R = 4

def run(dims, method):
    rng = np.random.default_rng(0)
    nd = len(dims)
    starts = jnp.zeros(nd, jnp.float32)
    steps = jnp.full(nd, 0.5, jnp.float32)
    vals = jnp.asarray(rng.standard_normal(math.prod(dims)), jnp.float32)
    hi = 0.5 * (max(dims) - 1)
    obs_sets = jnp.asarray(rng.uniform(-1, hi + 1, (R, nd, N)).astype(np.float32))
    obs_small = tuple(obs_sets[0, :, :4096])
    fn = lambda ob: v3.eval_regular(dims, starts, steps, vals, ob, method, True, 6)
    out = np.asarray(fn(obs_small))
    g = gl.linear_regular if method == "linear" else (
        lambda d, s, p, v, o: gc.cubic_regular(d, s, p, v, o, True))
    ref = np.asarray(g(dims, starts, steps, vals, obs_small))
    err = np.max(np.abs(out - ref)) / np.max(np.abs(ref))
    sec = device_timeit(fn, obs_sets)
    print(f"{'x'.join(map(str,dims))} {method}: {N/sec/1e6:8.1f} Mq/s  "
          f"relerr vs gather {err:.2e}", flush=True)

assert jax.default_backend() == "tpu"
run((4,)*7, "linear")
run((4,)*7, "cubic")
run((4,)*8, "linear")
run((4,)*8, "cubic")
run((6,)*7, "linear")
