"""pchip engine decision study (VERDICT r3 #8): measure the gather-tree
rate and pin why no fused/MXU engine exists.

The verdict proposed precomputing slope tables to make pchip "separable
Hermite". That works only for the LAST-reduced axis: its slopes are a
fixed per-node function of the raw table, but scipy's recursion (which we
match exactly — ops/pchip.py module docstring) computes every OTHER axis's
slopes from already-reduced values, which depend on the query through the
previous reduction. Replacing those with precomputed per-axis slope tables
plus tensor-product Hermite needs mixed-partial tables to even be an
interpolant, and in any case changes the semantics (harmonic-mean slopes
are nonlinear: slope(reduce(data)) != reduce(slope tables)). The
conclusive form of the argument: pchip is NONLINEAR in the value table
(tests/test_pchip.py::test_pchip_value_nonlinearity), so no weights(x) @
table contraction — the shape every fused engine here exploits — can
represent it. Even the exact last-axis-only precomputation is a wash: the
first reduction then gathers 2 values + 2 slopes per stencil line instead
of 4 values — the same 4^N total gathers, and gathers are the bound.

Decision: the gather tree stays the engine on every backend (the module
docstring documents it); the rates below go to docs/perf.md.

Run on the real TPU: PYTHONPATH=. python benches/exp_pchip.py
"""

from __future__ import annotations

import numpy as np

import interpn_tpu  # noqa: F401  (x64 config)
import jax
import jax.numpy as jnp

from interpn_tpu.ops import pchip
from interpn_tpu.utils.profiling import device_timeit

N = 1_000_000
R = 8


def run(dims, dtype):
    rng = np.random.default_rng(0)
    ndims = len(dims)
    starts = jnp.zeros(ndims, dtype)
    steps = jnp.full(ndims, 0.5, dtype)
    vals = jnp.asarray(rng.standard_normal(int(np.prod(dims))), dtype)
    gen = jax.jit(
        lambda key: jax.random.uniform(
            key, (R, ndims, N), dtype, minval=-0.25, maxval=0.5 * max(dims) - 0.25
        )
    )
    stack = jax.block_until_ready(gen(jax.random.PRNGKey(1)))
    dt = device_timeit(
        lambda o: pchip.pchip_regular(tuple(dims), starts, steps, vals, o), stack
    )
    name = "x".join(str(d) for d in dims)
    print(f"pchip {name} {np.dtype(dtype).name}@1M: {N/dt/1e6:8.2f} Mq/s", flush=True)
    return N / dt


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    for dims in ((20, 20), (20, 20, 20), (12, 12, 12, 12)):
        run(dims, jnp.float32)
    run((20, 20, 20), jnp.float64)
