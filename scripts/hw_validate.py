"""Hardware validation sweep: every fused-engine configuration vs the
gather tree on the real TPU.

Compact end-of-round confidence check (the CPU test suite runs the same
parity in interpret mode; this verifies the Mosaic-compiled kernels on
hardware). Covers methods x grid kinds x 2-8D x precision modes, small
query batches for speed. Prints one PASS/FAIL line per configuration and
exits nonzero on any failure.

Run: PYTHONPATH=/root/repo python scripts/hw_validate.py
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from interpn_tpu.ops import cubic as gc
from interpn_tpu.ops import linear as gl
from interpn_tpu.ops import nearest as gn
from interpn_tpu.ops import pallas_df64 as pdf
from interpn_tpu.ops import pallas_v3 as v3

N = 1 << 14
SHAPES = [
    (8, 12),
    (20, 20, 20),
    (100, 100, 100),
    (12, 10, 14),
    (20, 20, 20, 20),
    (8, 8, 8, 8, 8),
    (6,) * 6,
    (4,) * 7,
    (4,) * 8,
]
# (method, gather_fn, tolerance for exact mode)
METHODS = [
    ("linear", lambda d, s, p, v, o, g: (
        gl.linear_regular(d, s, p, v, o) if g is None else gl.linear_rectilinear(g, v, o)
    ), 5e-5),
    ("cubic", lambda d, s, p, v, o, g: (
        gc.cubic_regular(d, s, p, v, o, True) if g is None
        else gc.cubic_rectilinear(g, v, o, True)
    ), 5e-5),
    ("nearest", lambda d, s, p, v, o, g: (
        gn.nearest_regular(d, s, p, v, o) if g is None else gn.nearest_rectilinear(g, v, o)
    ), 0.0),
]


def run() -> int:
    assert jax.default_backend() == "tpu", "run on the real TPU"
    rng = np.random.default_rng(0)
    failures = 0
    for dims in SHAPES:
        nd = len(dims)
        starts = jnp.asarray(rng.uniform(-1, 1, nd), jnp.float32)
        steps = jnp.asarray(rng.uniform(0.3, 1.0, nd), jnp.float32)
        vals = jnp.asarray(rng.standard_normal(math.prod(dims)), jnp.float32)
        grids = tuple(
            jnp.asarray(np.sort(rng.uniform(0, 10, d)) + np.arange(d) * 1e-3,
                        jnp.float32)
            for d in dims
        )
        obs_reg = tuple(
            jnp.asarray(
                rng.uniform(float(starts[k]) - 2 * float(steps[k]),
                            float(starts[k]) + float(steps[k]) * (dims[k] + 1), N)
                .astype(np.float32)
            )
            for k in range(nd)
        )
        obs_rect = tuple(
            jnp.asarray(rng.uniform(float(g[0]) - 1, float(g[-1]) + 1, N)
                        .astype(np.float32))
            for g in grids
        )
        for method, gfn, tol_exact in METHODS:
            if not v3.supported(dims, jnp.float32, method):
                continue
            if method == "nearest" and nd > 6:
                continue
            for kind in ("regular", "rectilinear"):
                obs = obs_reg if kind == "regular" else obs_rect
                ref = np.asarray(
                    gfn(dims, starts, steps, vals, obs,
                        None if kind == "regular" else grids)
                )
                scale = max(float(np.max(np.abs(ref))), 1e-30)
                for passes, tol in ((6, tol_exact), (4, 2e-3)):
                    if method == "nearest" and passes != 6:
                        continue
                    if kind == "regular":
                        out = v3.eval_regular(
                            dims, starts, steps, vals, obs, method, True, passes
                        )
                    else:
                        out = v3.eval_rectilinear_pre(
                            grids, vals, obs, method, True, passes
                        )
                    err = float(np.max(np.abs(np.asarray(out) - ref))) / scale
                    ok = (err == 0.0) if tol == 0.0 else (err <= tol)
                    status = "PASS" if ok else "FAIL"
                    failures += 0 if ok else 1
                    print(
                        f"{status} {'x'.join(map(str, dims)):>16s} {method:7s}"
                        f" {kind:11s} p{passes} relerr {err:.2e}",
                        flush=True,
                    )
    # df64 spot checks (f64 double-float engine vs f64 gather; x64 is
    # already on — importing interpn_tpu enables it)
    for dims, method in (((20, 20, 20), "linear"), ((12, 10, 14), "cubic")):
        nd = len(dims)
        starts = jnp.asarray(rng.uniform(-1, 1, nd))
        steps = jnp.asarray(rng.uniform(0.3, 1.0, nd))
        vals = jnp.asarray(rng.standard_normal(math.prod(dims)))
        obs = tuple(
            jnp.asarray(rng.uniform(float(starts[k]) - 1,
                                    float(starts[k]) + float(steps[k]) * dims[k], N))
            for k in range(nd)
        )
        out = np.asarray(pdf.eval_regular(dims, starts, steps, vals, obs, method))
        ref = np.asarray(
            gl.linear_regular(dims, starts, steps, vals, obs)
            if method == "linear"
            else gc.cubic_regular(dims, starts, steps, vals, obs, True)
        )
        err = float(np.max(np.abs(out - ref))) / max(float(np.max(np.abs(ref))), 1e-30)
        ok = err <= 1e-12
        failures += 0 if ok else 1
        print(f"{'PASS' if ok else 'FAIL'} {'x'.join(map(str, dims)):>16s} "
              f"{method:7s} df64        relerr {err:.2e}", flush=True)

    # round 3: looped df64 (lead > 2048) and the int8 MXU engine
    from interpn_tpu.ops import pallas_i8 as pi8

    for dims, method, engine in (
        ((20, 20, 20, 20), "cubic", "df64-looped"),
        ((12,) * 5, "cubic", "df64-looped"),
        ((20, 20, 20), "cubic", "i8"),
        ((20, 20, 20), "linear", "i8"),
        ((20, 20, 20, 20), "cubic", "i8"),
        ((12,) * 5, "cubic", "i8"),
        ((40, 40, 40), "cubic", "i8"),
        # new-region shapes (cost-model admission, lead > 2048 / big tables)
        ((50, 50, 50), "cubic", "i8"),
        ((64, 64, 64), "cubic", "i8"),
        ((17,) * 5, "cubic", "i8"),
    ):
        nd = len(dims)
        starts = jnp.asarray(rng.uniform(-1, 1, nd))
        steps = jnp.asarray(rng.uniform(0.3, 1.0, nd))
        vals = jnp.asarray(rng.standard_normal(math.prod(dims)))
        obs = tuple(
            jnp.asarray(rng.uniform(float(starts[k]) - 1,
                                    float(starts[k]) + float(steps[k]) * dims[k], N))
            for k in range(nd)
        )
        eng = pdf if engine.startswith("df64") else pi8
        out = np.asarray(eng.eval_regular(dims, starts, steps, vals, obs, method))
        ref = np.asarray(
            gl.linear_regular(dims, starts, steps, vals, obs)
            if method == "linear"
            else gc.cubic_regular(dims, starts, steps, vals, obs, True)
        )
        err = float(np.max(np.abs(out - ref))) / max(float(np.max(np.abs(ref))), 1e-30)
        ok = err <= 1e-12
        failures += 0 if ok else 1
        print(f"{'PASS' if ok else 'FAIL'} {'x'.join(map(str, dims)):>16s} "
              f"{method:7s} {engine:11s} relerr {err:.2e}", flush=True)

    # rectilinear arms of the f64 engines (CPU-fuzzed; verify Mosaic too)
    for dims, method, engine in (
        ((12, 10, 14), "cubic", "df64-rect"),
        ((20, 20, 20), "cubic", "i8-rect"),
        ((20, 20, 20, 20), "cubic", "i8-rect"),
    ):
        nd = len(dims)
        grids64 = tuple(
            jnp.asarray(np.sort(rng.uniform(0, 10, d)) + np.arange(d) * 1e-3)
            for d in dims
        )
        vals = jnp.asarray(rng.standard_normal(math.prod(dims)))
        obs = tuple(
            jnp.asarray(rng.uniform(float(g[0]) - 1, float(g[-1]) + 1, N))
            for g in grids64
        )
        eng = pdf if engine.startswith("df64") else pi8
        out = np.asarray(eng.eval_rectilinear(grids64, vals, obs, method))
        ref = np.asarray(gc.cubic_rectilinear(grids64, vals, obs, True))
        err = float(np.max(np.abs(out - ref))) / max(float(np.max(np.abs(ref))), 1e-30)
        ok = err <= 1e-12
        failures += 0 if ok else 1
        print(f"{'PASS' if ok else 'FAIL'} {'x'.join(map(str, dims)):>16s} "
              f"{method:7s} {engine:11s} relerr {err:.2e}", flush=True)
    # Global B-spline engine (scipy cubic/quintic): device evaluation vs
    # a host-side contraction of the same exact coefficients (truth for
    # the DEVICE path; the coefficients themselves are pinned against
    # scipy's definition in tests/test_bspline.py).
    from interpn_tpu.ops import bspline as bs
    from interpn_tpu.utils import c_strides, corner_offsets

    for k, dims in ((3, (9, 8, 10)), (3, (12, 11)), (5, (8, 9)), (5, (7, 7, 8))):
        nd = len(dims)
        grids_np = [np.sort(rng.uniform(0, 10, d)) + np.arange(d) * 1e-3
                    for d in dims]
        vals_np = rng.standard_normal(math.prod(dims))
        knots, coeffs = bs.prep_bspline(grids_np, vals_np, k)
        obs_np = [rng.uniform(g[0] - 1, g[-1] + 1, 4096) for g in grids_np]
        out = np.asarray(bs.jitted_eval()(knots, coeffs, obs_np, k))
        # host truth: numpy span/basis + dense stencil contraction
        strides = c_strides(dims)
        base = np.zeros(4096, dtype=np.int64)
        wts = []
        for ax in range(nd):
            t = knots[ax]
            span = np.clip(np.searchsorted(t, obs_np[ax], side="right") - 1,
                           k, dims[ax] - 1)
            base += (span - k) * strides[ax]
            wts.append(np.stack([
                bs._basis_row_np(t, int(s), float(x), k)
                for s, x in zip(span, obs_np[ax])
            ]))
        offs = corner_offsets(dims, k + 1)
        stencil = coeffs[base[:, None] + offs[None, :]]
        # vertex lists carry dim 0 in the LOWEST digit: make axis 0's
        # weights the fastest-varying factor of the Kronecker product
        w = wts[nd - 1]
        for ax in range(nd - 2, -1, -1):
            w = (w[:, :, None] * wts[ax][:, None, :]).reshape(4096, -1)
        ref = np.sum(stencil * w, axis=1)
        scale = max(float(np.max(np.abs(ref))), 1e-30)
        err = float(np.max(np.abs(out - ref))) / scale
        ok = err <= 1e-12
        failures += 0 if ok else 1
        print(f"{'PASS' if ok else 'FAIL'} {'x'.join(map(str, dims)):>16s} "
              f"bspline k={k}      relerr {err:.2e}", flush=True)

    # Fused spline STACK kernel (round 4): nch coefficient tables share one
    # Cox-de Boor weight build. Reference is the per-channel f32 GATHER
    # tree on the SAME f32 inputs — that isolates the kernel under test
    # (casting knots to f32 perturbs the basis itself on close knot
    # spacings, so an f64 reference would measure the cast, not the
    # kernel). Same 2e-5-of-coefficient-scale contract as
    # tests/test_bspline_engines.py::test_stack_engine_parity_and_routing.
    for k, dims, nch in ((3, (12, 11, 10), 4), (5, (8, 9), 3)):
        grids_np = [np.sort(rng.uniform(0, 10, d)) + np.arange(d) * 1e-3
                    for d in dims]
        vstack = rng.standard_normal((nch, math.prod(dims)))
        knots, coeffs = bs.prep_bspline(
            grids_np, np.ascontiguousarray(vstack.T), k
        )
        # mild extrapolation (10% of domain span): random grids can have
        # near-zero end spans, where the end-span polynomial at 1 unit out
        # amplifies by (1/span)^k and the relerr would measure that
        # amplification, not the kernel
        obs_np = [
            rng.uniform(g[0] - 0.1 * (g[-1] - g[0]),
                        g[-1] + 0.1 * (g[-1] - g[0]), 65536)
            for g in grids_np
        ]
        kt32 = tuple(jnp.asarray(t, jnp.float32) for t in knots)
        ct32 = jnp.asarray(np.ascontiguousarray(coeffs.T), jnp.float32)
        obs32 = tuple(jnp.asarray(o, jnp.float32) for o in obs_np)
        out = np.asarray(bs.bspline_eval_stack(kt32, ct32, obs32, k))
        gather = jax.jit(bs._bspline_gather, static_argnums=3)
        ref = np.stack([
            np.asarray(gather(kt32, ct32[c], obs32, k)) for c in range(nch)
        ])
        scale = max(float(np.max(np.abs(ref))), float(np.max(np.abs(coeffs))), 1e-30)
        err = float(np.max(np.abs(out - ref))) / scale
        ok = err <= 2e-5
        failures += 0 if ok else 1
        print(f"{'PASS' if ok else 'FAIL'} {'x'.join(map(str, dims)):>16s} "
              f"bspline-stack k={k} nch={nch} relerr {err:.2e}", flush=True)

    print("ALL PASS" if failures == 0 else f"{failures} FAILURES")
    return failures


if __name__ == "__main__":
    sys.exit(1 if run() else 0)
