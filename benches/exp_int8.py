"""Feasibility probe: exact-int32 int8 multipass MXU contraction for f64.

Round-2 measured int8 MXU matmuls lowering correctly through Mosaic with
EXACT int32 accumulation at ~1.16x the bf16 pass rate — useless for f32
(6-pass HIGHEST already ties) but potentially transformative for f64: the
VPU double-float engine is at VPU peak (~27 plane-ops/cell), while a
fixed-point decomposition runs the same contraction on the MXU:

    V[row, k] = sigma_v(row) * sum_i a_i[row, k] 2^(-7i)   (int8 pieces)
    W[k, q]   = sigma_w(q)   * sum_j b_j[k, q]   2^(-7j)
    T[row, q] = sigma_v sigma_w * sum_(i+j<=7) (A_i @ B_j)[row, q] 2^(-7(i+j))

with every A_i @ B_j an int8 matmul accumulated exactly in int32
(overflow bound: 127^2 * K <= 2^31 for K <= 130k). 35 passes reach
~2^-50 of the per-row scale.

Phases:
  1. int8 dot correctness inside a pallas kernel (exactness vs numpy)
  2. precision prototype in plain XLA (no pallas): full decomposition and
     recombination vs f64 reference on cancellation/extrapolation-heavy data
  3. throughput: 35-pass int8 pallas kernel vs the measured df64 VPU rate

Usage: PYTHONPATH=/root/repo python benches/exp_int8.py [phase]
"""

import sys
import time

import numpy as np

import interpn_tpu  # noqa: F401
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NPIECE_V = 8
NPIECE_W = 7
SMAX = 7  # keep pairs with i + j <= SMAX


def phase1():
    """int8 @ int8 -> int32 inside pallas: exact?"""
    rng = np.random.default_rng(0)
    M, K, N = 256, 256, 256
    a = rng.integers(-127, 128, (M, K), dtype=np.int8)
    b = rng.integers(-127, 128, (K, N), dtype=np.int8)

    def kernel(a_ref, b_ref, o_ref):
        o_ref[:, :] = jax.lax.dot_general(
            a_ref[:, :], b_ref[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    with jax.enable_x64(False):
        out = pl.pallas_call(
            kernel,
            in_specs=[
                pl.BlockSpec((M, K), lambda: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((K, N), lambda: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((M, N), lambda: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.int32),
        )(jnp.asarray(a), jnp.asarray(b))
    ref = a.astype(np.int64) @ b.astype(np.int64)
    exact = np.array_equal(np.asarray(out, dtype=np.int64), ref)
    print(f"phase1: int8 pallas dot exact = {exact}", flush=True)
    return exact


def _decompose(x, npiece):
    """x in [-1, 1] -> int8 pieces: x ~= sum_i p_i * 2^(-(6+7i)).

    7-bit payload with headroom: |p_i| <= 64 always (rint of a residual
    bounded by 0.5 ulp of the previous level can reach exactly 64, never
    128), so the int8 clip never engages and each level removes a full 7
    bits. Residual after n pieces: 2^-(7n) of the scale."""
    pieces = []
    r = x.astype(np.float64)
    for i in range(npiece):
        q = np.rint(r * 2.0 ** (6 + 7 * i))
        pieces.append(q.astype(np.int8))
        r = r - q * 2.0 ** (-(6 + 7 * i))
    return pieces


def phase2():
    """Precision prototype (host numpy, exact int64 matmuls standing in for
    the int32 MXU): decomposition + recombination error vs f64."""
    rng = np.random.default_rng(1)
    lead, K, tq = 400, 400, 128
    V = rng.standard_normal((lead, K))
    V *= 10.0 ** rng.integers(-2, 3, (lead, 1))  # row dynamic range
    # weight-like W: mostly zero, stencil runs with extrapolation-sized rows
    W = np.zeros((K, tq))
    for q in range(tq):
        base = rng.integers(0, K - 16)
        W[base: base + 16, q] = rng.standard_normal(16) * 10.0 ** rng.integers(0, 3)

    sv = np.maximum(np.abs(V).max(axis=1, keepdims=True), 1e-300)
    sw = np.maximum(np.abs(W).max(axis=0, keepdims=True), 1e-300)
    A = _decompose(V / sv, NPIECE_V)
    B = _decompose(W / sw, NPIECE_W)

    T = np.zeros((lead, tq))
    npass = 0
    for i in range(NPIECE_V):
        for j in range(NPIECE_W):
            if i + j > SMAX:
                continue
            npass += 1
            acc = A[i].astype(np.int64) @ B[j].astype(np.int64)
            assert np.abs(acc).max() < 2**31, "int32 overflow"
            T += acc.astype(np.float64) * 2.0 ** (-(12 + 7 * (i + j)))
    T *= sv * sw
    ref = V @ W
    scale = np.abs(V) @ np.abs(W) + 1e-300  # term-magnitude envelope
    err = np.abs(T - ref) / scale
    print(
        f"phase2: {npass} passes, max err / term-envelope = {err.max():.3e} "
        f"(target <= ~1e-14); vs |ref|: {np.abs(T-ref).max() / np.abs(ref).max():.3e}",
        flush=True,
    )
    return err.max() < 1e-13


def phase3(n=200_000):
    """Throughput of the 35-pass int8 contraction at the 20^4 shape."""
    rng = np.random.default_rng(2)
    lead, K = 400, 400
    tq = 512
    npad = ((n + tq - 1) // tq) * tq
    pairs = [
        (i, j)
        for i in range(NPIECE_V)
        for j in range(NPIECE_W)
        if i + j <= SMAX
    ]

    A = jnp.asarray(
        rng.integers(-127, 128, (len(pairs), lead, K), dtype=np.int8)
    )
    B = jnp.asarray(rng.integers(-127, 128, (K, npad), dtype=np.int8))

    def kernel(b_ref, a_ref, o_ref):
        acc = jnp.zeros((lead, b_ref.shape[1]), jnp.float32)
        for p, (i, j) in enumerate(pairs):
            t = jax.lax.dot_general(
                a_ref[p], b_ref[:, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            acc = acc + t.astype(jnp.float32) * jnp.float32(2.0 ** (-7 * (i + j)))
        # fold to one output row so the out block stays small
        o_ref[0, :] = jnp.sum(acc, axis=0)

    grid = npad // tq
    with jax.enable_x64(False):
        f = jax.jit(
            lambda b: pl.pallas_call(
                kernel,
                grid=(grid,),
                in_specs=[
                    pl.BlockSpec((K, tq), lambda g: (0, g), memory_space=pltpu.VMEM),
                    pl.BlockSpec(
                        (len(pairs), lead, K), lambda g: (0, 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                out_specs=pl.BlockSpec((1, tq), lambda g: (0, g), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((1, npad), jnp.float32),
            )(b, A)
        )
        t0 = time.perf_counter()
        out = jax.block_until_ready(f(B))
        print(f"phase3: first call {time.perf_counter() - t0:.1f}s", flush=True)
        # distinct inputs per rep (relay memoizes identical buffers)
        reps = 8
        bs = [
            jnp.asarray(rng.integers(-127, 128, (K, npad), dtype=np.int8))
            for _ in range(reps)
        ]
        for b in bs:
            f(b)  # warm any per-shape paths
        t0 = time.perf_counter()
        outs = [f(b) for b in bs]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / reps
    qps = n / dt
    print(
        f"phase3: {len(pairs)} int8 passes over ({lead},{K})x({K},{tq}): "
        f"{dt*1e3:.2f} ms per {n} queries = {qps/1e6:.2f} Mq/s contraction-only "
        f"(df64 VPU measured 0.91 Mq/s whole-kernel at this shape)",
        flush=True,
    )


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("1", "all"):
        phase1()
    if which in ("2", "all"):
        phase2()
    if which in ("3", "all"):
        phase3()
