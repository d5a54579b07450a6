"""Experiment: precision/passes trade-off on the factorized contraction.

Measures throughput + error (vs the f32 gather tree, the test-suite anchor)
for the headline config (3D linear regular 20^3 f32, 1M queries) across:
  - factorized with HIGHEST / HIGH / DEFAULT einsum precision
  - explicit bf16x2-split contraction (3 one-pass matmuls)
  - gather path, and the two parked Pallas kernels
Run on the real TPU:  python benches/exp_precision.py
"""

from __future__ import annotations

import math
import sys

import jax
import jax.numpy as jnp
import numpy as np

from interpn_tpu.ops import factorized as fz
from interpn_tpu.ops import linear as gl
from interpn_tpu.ops import cubic as gc
from interpn_tpu.utils.profiling import device_timeit

DIMS = (20, 20, 20)
N = 1 << 20
R = 8


def _contract_prec(weight_mats, vals, dims, precision):
    dtype = vals.dtype
    n = weight_mats[0].shape[0]
    p = fz._split_point(dims)
    wlead = weight_mats[0]
    for k in range(1, p):
        wlead = (wlead[:, :, None] * weight_mats[k][:, None, :]).reshape(n, -1)
    ksize = math.prod(dims[:p])
    y = jnp.einsum(
        "qa,ar->qr", wlead, vals.reshape(ksize, -1),
        preferred_element_type=dtype, precision=precision,
    )
    for k in range(p, len(dims)):
        rest = y.shape[1] // dims[k]
        y = y.reshape(n, dims[k], rest)
        y = jnp.einsum("qbr,qb->qr", y, weight_mats[k], precision=precision)
    return y.reshape(n)


def _split_bf16(a):
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _contract_split2(weight_mats, vals, dims):
    """Explicit bf16x2 split: 3 one-pass matmuls for the MXU stage, and the
    same split for the per-query VPU stages."""
    n = weight_mats[0].shape[0]
    p = fz._split_point(dims)
    wlead = weight_mats[0]
    for k in range(1, p):
        wlead = (wlead[:, :, None] * weight_mats[k][:, None, :]).reshape(n, -1)
    ksize = math.prod(dims[:p])
    v2 = vals.reshape(ksize, -1)
    whi, wlo = _split_bf16(wlead)
    vhi, vlo = _split_bf16(v2)
    dot = lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)
    y = dot(whi, vhi) + (dot(whi, vlo) + dot(wlo, vhi))
    for k in range(p, len(dims)):
        rest = y.shape[1] // dims[k]
        y = y.reshape(n, dims[k], rest)
        y = jnp.einsum(
            "qbr,qb->qr", y, weight_mats[k], precision=jax.lax.Precision.HIGHEST
        )
    return y.reshape(n)


def _mats_linear(dims, starts, steps, obs):
    mats = []
    for k in range(len(dims)):
        loc, t = fz.locate_regular_linear(obs[k], starts[k], steps[k], dims[k])
        mats.append(fz._scatter_weights(loc, [1.0 - t, t], dims[k]))
    return mats


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    rng = np.random.default_rng(0)
    starts = jnp.zeros(3, jnp.float32)
    steps = jnp.full(3, 0.5, jnp.float32)
    vals = jnp.asarray(rng.standard_normal(math.prod(DIMS)), jnp.float32)
    obs_sets = jnp.asarray(
        rng.uniform(-1, 10, (R, 3, N)).astype(np.float32)
    )
    obs0 = tuple(obs_sets[0])

    ref = np.asarray(gl.linear_regular(DIMS, starts, steps, vals, obs0))
    scale = np.max(np.abs(ref))

    def report(name, fn):
        out = np.asarray(fn(obs0))
        err = np.max(np.abs(out - ref)) / scale
        sec = device_timeit(fn, obs_sets)
        print(f"{name:28s} {N/sec/1e6:9.1f} Mq/s   relerr {err:.2e}", flush=True)

    P = jax.lax.Precision
    for name, prec in [("fz HIGHEST (current)", P.HIGHEST), ("fz HIGH", P.HIGH),
                       ("fz DEFAULT", P.DEFAULT)]:
        report(name, lambda ob, prec=prec: _contract_prec(
            _mats_linear(DIMS, starts, steps, ob), vals, DIMS, prec))
    report("fz split-bf16x2", lambda ob: _contract_split2(
        _mats_linear(DIMS, starts, steps, ob), vals, DIMS))
    report("gather", lambda ob: gl.linear_regular(DIMS, starts, steps, vals, ob))


    # cubic for context
    refc = np.asarray(gc.cubic_regular(DIMS, starts, steps, vals, obs0, True))
    scalec = np.max(np.abs(refc))

    def reportc(name, fn):
        out = np.asarray(fn(obs0))
        err = np.max(np.abs(out - refc)) / scalec
        sec = device_timeit(fn, obs_sets)
        print(f"{name:28s} {N/sec/1e6:9.1f} Mq/s   relerr {err:.2e}", flush=True)

    def mats_cubic(ob):
        mats = []
        for k in range(3):
            cl = fz.locate_regular_cubic(ob[k], starts[k], steps[k], DIMS[k])
            ws = fz._basis_weights_cubic_regular(cl, True)
            mats.append(fz._scatter_weights(cl.loc, ws, DIMS[k]))
        return mats

    reportc("cubic fz HIGHEST", lambda ob: _contract_prec(
        mats_cubic(ob), vals, DIMS, P.HIGHEST))
    reportc("cubic fz HIGH", lambda ob: _contract_prec(
        mats_cubic(ob), vals, DIMS, P.HIGH))
    reportc("cubic fz split2", lambda ob: _contract_split2(mats_cubic(ob), vals, DIMS))
    reportc("cubic gather", lambda ob: gc.cubic_regular(
        DIMS, starts, steps, vals, ob, True))


if __name__ == "__main__":
    sys.exit(main())
