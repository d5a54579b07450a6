import math
import jax
import jax.numpy as jnp
import numpy as np
from interpn_tpu.ops import pallas_v3 as v3
from interpn_tpu.utils.profiling import device_timeit

N = 1 << 20
R = 8

def run(dims, method, passes, pre):
    rng = np.random.default_rng(0)
    nd = len(dims)
    starts = jnp.zeros(nd, jnp.float32)
    steps = jnp.full(nd, 0.5, jnp.float32)
    vals = jnp.asarray(rng.standard_normal(math.prod(dims)), jnp.float32)
    hi = 0.5 * (max(dims) - 1)
    obs_sets = jnp.asarray(rng.uniform(-1, hi + 1, (R, nd, N)).astype(np.float32))
    f = v3.eval_regular_pre if pre else v3.eval_regular
    fn = lambda ob: f(dims, starts, steps, vals, ob, method, True, passes)
    sec = device_timeit(fn, obs_sets)
    print(f"{'x'.join(map(str,dims))} {method} p{passes} {'pre' if pre else 'ink'}: "
          f"{N/sec/1e6:9.1f} Mq/s", flush=True)

assert jax.default_backend() == "tpu"
for passes in (6, 4):
    for pre in (False, True):
        run((20, 20, 20, 20), "cubic", passes, pre)
for pre in (False, True):
    run((20, 20, 20, 20), "linear", 6, pre)
    run((100, 100, 100), "cubic", 4, pre)
