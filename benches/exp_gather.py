"""Experiment: large-grid primitives on the real TPU.

The 100^3-grid hole (VERDICT item 2): the gather path does 64 single-element
random gathers per query (2 Mq/s cubic), the factorized path pays
2*prod(dims) FLOPs per query. Candidate building blocks measured here:

  g1  64x single-element flat gathers           (current gather path cost)
  g2  16x lax.gather slice_sizes=(...,4)        (contiguous last-axis slabs)
  g3   4x lax.gather slice_sizes=(...,4,4)
  g4   1x lax.gather slice_sizes=(4,4,4)
  s1  jnp.argsort / counting-sort primitives    (for query binning)
  p1  Mosaic in-kernel take_along_axis gather   (VMEM-resident table)

python benches/exp_gather.py  (PYTHONPATH=/root/repo)
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

N = 1 << 20
DIM = 100
NV = DIM**3


def timeit(fn, *args, reps=5):
    out = jax.block_until_ready(jax.jit(fn)(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.block_until_ready(jax.jit(fn)(*args))
    return (time.perf_counter() - t0) / reps, out


def main():
    rng = np.random.default_rng(0)
    vals = jnp.asarray(rng.standard_normal(NV), jnp.float32)
    v3d = vals.reshape(DIM, DIM, DIM)
    locs = jnp.asarray(rng.integers(0, DIM - 4, (N, 3)), jnp.int32)

    # g1: 64 single-element flat gathers
    def g1(locs):
        flat = (locs[:, 0] * DIM + locs[:, 1]) * DIM + locs[:, 2]
        acc = jnp.zeros(N, jnp.float32)
        for i in range(4):
            for j in range(4):
                for k in range(4):
                    acc = acc + jnp.take(vals, flat + (i * DIM + j) * DIM + k)
        return acc

    t, _ = timeit(g1, locs)
    print(f"g1 64x single-elem   {t*1e3:8.2f} ms  {N/t/1e6:8.1f} Mq/s", flush=True)

    # g2: 16 slab gathers (4 contiguous along last axis)
    def g2(locs):
        acc = jnp.zeros(N, jnp.float32)
        for i in range(4):
            for j in range(4):
                idx = jnp.stack(
                    [locs[:, 0] + i, locs[:, 1] + j, locs[:, 2]], axis=1
                )
                sl = jax.lax.gather(
                    v3d,
                    idx,
                    jax.lax.GatherDimensionNumbers(
                        offset_dims=(1,),
                        collapsed_slice_dims=(0, 1),
                        start_index_map=(0, 1, 2),
                    ),
                    slice_sizes=(1, 1, 4),
                )
                acc = acc + jnp.sum(sl, axis=1)
        return acc

    t, _ = timeit(g2, locs)
    print(f"g2 16x (1,1,4) slab  {t*1e3:8.2f} ms  {N/t/1e6:8.1f} Mq/s", flush=True)

    # g3: 4 gathers of (1,4,4)
    def g3(locs):
        acc = jnp.zeros(N, jnp.float32)
        for i in range(4):
            idx = jnp.stack([locs[:, 0] + i, locs[:, 1], locs[:, 2]], axis=1)
            sl = jax.lax.gather(
                v3d,
                idx,
                jax.lax.GatherDimensionNumbers(
                    offset_dims=(1, 2),
                    collapsed_slice_dims=(0,),
                    start_index_map=(0, 1, 2),
                ),
                slice_sizes=(1, 4, 4),
            )
            acc = acc + jnp.sum(sl, axis=(1, 2))
        return acc

    t, _ = timeit(g3, locs)
    print(f"g3  4x (1,4,4)       {t*1e3:8.2f} ms  {N/t/1e6:8.1f} Mq/s", flush=True)

    # g4: one gather of (4,4,4)
    def g4(locs):
        sl = jax.lax.gather(
            v3d,
            locs,
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1, 2, 3),
                collapsed_slice_dims=(),
                start_index_map=(0, 1, 2),
            ),
            slice_sizes=(4, 4, 4),
        )
        return jnp.sum(sl, axis=(1, 2, 3))

    t, _ = timeit(g4, locs)
    print(f"g4  1x (4,4,4)       {t*1e3:8.2f} ms  {N/t/1e6:8.1f} Mq/s", flush=True)

    # s1: sorting/binning primitives
    keys = jnp.asarray(rng.integers(0, 512, N), jnp.int32)
    t, _ = timeit(lambda k: jnp.sort(k), keys)
    print(f"s1 sort 1M i32       {t*1e3:8.2f} ms", flush=True)
    t, _ = timeit(lambda k: jnp.argsort(k), keys)
    print(f"s1 argsort 1M i32    {t*1e3:8.2f} ms", flush=True)
    f32v = jnp.asarray(rng.standard_normal(N), jnp.float32)
    t, _ = timeit(lambda k, v: jnp.take(v, jnp.argsort(k)), keys, f32v)
    print(f"s1 argsort+permute   {t*1e3:8.2f} ms", flush=True)
    t, _ = timeit(
        lambda k: jnp.zeros(512, jnp.int32).at[k].add(1), keys
    )
    print(f"s1 histogram 512     {t*1e3:8.2f} ms", flush=True)

    # p1: Mosaic in-kernel per-lane gather along sublanes
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def lut_kernel(tab_ref, idx_ref, out_ref):
        out_ref[:, :] = jnp.take_along_axis(tab_ref[:, :], idx_ref[:, :], axis=0)

    TAB, TQ = 1024, 512

    def p1(tab, idx):
        with jax.enable_x64(False):
            return pl.pallas_call(
                lut_kernel,
                grid=(idx.shape[1] // TQ,),
                in_specs=[
                    pl.BlockSpec((TAB, TQ), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((8, TQ), lambda i: (0, i), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(
                    (8, TQ), lambda i: (0, i), memory_space=pltpu.VMEM
                ),
                out_shape=jax.ShapeDtypeStruct((8, idx.shape[1]), jnp.float32),
            )(tab, idx)

    try:
        tab = jnp.asarray(rng.standard_normal((TAB, TQ)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, TAB, (8, N)), jnp.int32)
        t, out = timeit(p1, tab, idx)
        elems = 8 * N
        print(
            f"p1 take_along_axis   {t*1e3:8.2f} ms  {elems/t/1e6:8.1f} Melem/s",
            flush=True,
        )
    except Exception as e:  # noqa: BLE001
        print(f"p1 take_along_axis   UNSUPPORTED: {type(e).__name__}: {e}"[:200],
              flush=True)


if __name__ == "__main__":
    assert jax.default_backend() == "tpu"
    main()
