"""Stage ablation of the 3D-linear fused kernel (headline config).

Reproduces pallas_v3's 20^3 linear exact kernel locally with stages
individually disabled (results intentionally wrong for ablated variants)
to attribute kernel time between the MXU contraction, weight builds, and
the segment-sum tail. PYTHONPATH=/root/repo python benches/exp_ablate.py
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from interpn_tpu.ops.pallas_v3 import _linear_axis_weights, _weight_mat
from interpn_tpu.utils.profiling import device_timeit

N = 1 << 20
R = 16
DIMS = (20, 20, 20)
SA, TA = 5, 4          # virtual split of axis 1 (matches _choose_split)
LEAD, KP = 100, 80     # lead' = 20*SA, K' = TA*20
TQ = 1024
_I32 = jnp.int32


def build(ablate: str):
    opt_wk = ablate in ("optwk", "optall")
    opt_tail = ablate in ("opttail", "optall")
    opt_ri = ablate in ("optri", "optall")

    def kernel(starts_ref, steps_ref, obs_ref, v_ref, out_ref):
        per_axis = [
            _linear_axis_weights(
                obs_ref[k, :].reshape(1, TQ), starts_ref[0, k], steps_ref[0, k],
                DIMS[k],
            )
            for k in range(3)
        ]
        loc2, ws2 = per_axis[2]
        wt = _weight_mat(TQ, 20, loc2, ws2)

        prec = (
            jax.lax.Precision.DEFAULT
            if ablate == "mxu1pass"
            else jax.lax.Precision.HIGHEST
        )
        dot = partial(jnp.dot, preferred_element_type=jnp.float32, precision=prec)

        loc1, ws1 = per_axis[1]
        a0 = loc1 // TA
        shift = loc1 - a0 * TA
        iota_t = jax.lax.broadcasted_iota(_I32, (TA, TQ), 0)
        iota_s = jax.lax.broadcasted_iota(_I32, (SA, TQ), 0)
        npass = 1 if ablate == "onepass" else 2

        if opt_ri:
            # both passes' stencil rows in ONE (2*TA, TQ) build: pass i's
            # row (shift + j - i*TA) lands at combined row (shift + j)
            iota_2t = jax.lax.broadcasted_iota(_I32, (2 * TA, TQ), 0)
            ri8 = jnp.zeros((2 * TA, TQ), jnp.float32)
            for j, wj in enumerate(ws1):
                ri8 = ri8 + jnp.where(iota_2t == shift + j, wj.reshape(1, TQ), 0.0)

        if opt_tail:
            loc0, ws0 = per_axis[0]
            w0 = _weight_mat(TQ, 20, loc0, ws0)
            w0rep = jnp.repeat(w0, SA, axis=0)  # (100, TQ), built once

        acc = None
        for i in range(npass):
            if opt_ri:
                ri = ri8[i * TA:(i + 1) * TA, :]
            else:
                ri = jnp.zeros((TA, TQ), jnp.float32)
                for j, wj in enumerate(ws1):
                    pos = shift + j - i * TA
                    ri = ri + jnp.where(iota_t == pos, wj.reshape(1, TQ), 0.0)
            if opt_wk:
                wk = (
                    ri.reshape(TA, 1, TQ) * wt.reshape(1, 20, TQ)
                ).reshape(TA * 20, TQ)
            else:
                wk = jnp.repeat(ri, 20, axis=0) * pltpu.repeat(wt, TA, axis=0)
            t = dot(v_ref[:, :], wk)
            ai = jnp.where(iota_s == a0 + i, 1.0, 0.0)
            if opt_tail:
                # fold the virtual-axis selection AND the axis-0 weights
                # into one weighted full-sum: u = w0 (x) ai over (i0, s)
                u = w0rep * pltpu.repeat(ai, 20, axis=0)
                contrib = jnp.sum(t * u, axis=0)
                acc = contrib if acc is None else acc + contrib
            else:
                t = t * pltpu.repeat(ai, 20, axis=0)
                t = t.reshape(20, SA, TQ).sum(axis=1)
                acc = t if acc is None else acc + t
        if opt_tail:
            out_ref[0, :] = acc
        else:
            loc0, ws0 = per_axis[0]
            w0 = _weight_mat(TQ, 20, loc0, ws0)
            out_ref[0, :] = jnp.sum(acc * w0, axis=0)

    return kernel


@partial(jax.jit, static_argnums=(0,))
def run_variant(ablate, starts, steps, vals, obs_mat):
    n = obs_mat.shape[1]
    kernel = build(ablate)  # vals must already be reshaped to (LEAD, KP)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kernel,
            grid=(n // TQ,),
            in_specs=[
                pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((3, TQ), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((LEAD, KP), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, TQ), lambda i: (0, i), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
        )(starts, steps, obs_mat, vals)
    return out.reshape(n)


def main():
    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(0)
    starts = jnp.zeros((1, 3), jnp.float32)
    steps = jnp.full((1, 3), 0.5, jnp.float32)
    # vals laid out exactly as _table_shape would: (lead', K') from the
    # (20,20,20) table split as (20, 5, 4, 20) -> (100, 80)
    vals = jnp.asarray(rng.standard_normal((20, 20, 20)), jnp.float32)
    v2 = vals.reshape(20, 5, 4, 20).reshape(LEAD, KP)
    obs_sets = jnp.asarray(rng.uniform(-1, 10.5, (R, 3, N)).astype(np.float32))

    # sanity: baseline matches the gather tree
    from interpn_tpu.ops.linear import linear_regular

    obs0 = tuple(obs_sets[0, :, :65536])
    base = np.asarray(run_variant("none", starts, steps, v2, obs_sets[0][:, :65536]))
    ref = np.asarray(linear_regular(DIMS, starts.reshape(3), steps.reshape(3),
                                    vals.reshape(-1), obs0))
    err = np.max(np.abs(base - ref)) / np.max(np.abs(ref))
    print(f"baseline relerr vs gather: {err:.2e}")

    # exact-result optimization candidates: verify parity before timing
    for ablate in ("optwk", "opttail", "optri", "optall"):
        got = np.asarray(run_variant(ablate, starts, steps, v2,
                                     obs_sets[0][:, :65536]))
        e = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
        print(f"{ablate} relerr vs gather: {e:.2e}")
        assert e < 1e-5, (ablate, e)

    for ablate in ("none", "optwk", "opttail", "optri", "optall", "mxu1pass"):
        fn = lambda ob, a=ablate: run_variant(a, starts, steps, v2,
                                              jnp.stack(ob))
        sec = device_timeit(fn, obs_sets)
        print(f"{ablate:10s}: {N/sec/1e6:8.1f} Mq/s  ({sec*1e9/N:.2f} ns/q)",
              flush=True)


if __name__ == "__main__":
    main()
