"""Adversarial calibration of the i8 engine's error gates (VERDICT r4 #1).

The per-batch extrapolation cap (_EXTRAP_CELLS_CUBIC) and the per-row
spike gate (_ROW_SPIKE_RATIO) were calibrated on RANDOM tables; twice a
fresh fuzz seed then broke a "safe envelope" claim. This sweep targets
table families DESIGNED to hurt the engine's error model — all of them
admitted by the gates (that is the point: the worst error the gate lets
through is the published error model):

* alternating  — checkerboard (-1)^sum(idx): maximal output cancellation
  for interior smoothing weights; cubic overshoot excites the stencil.
* near_cancel  — alternating +/-A with an eps*noise signal riding on it:
  the interpolant's true value is ~eps-scale while quantization error
  scales with A (worst OUTPUT-relative case that still passes the spike
  gate, ratio ~2).
* spike_margin — quiet unit rows with one value at ~1000x the row's
  median deviation: just under _ROW_SPIKE_RATIO=1024, so the row scale
  is peak-set and the quiet values carry maximal quantization error.
* big_offset   — 1e9 + 1e-3*noise: exercises the global-center f64
  restoration and the hi/lo center split (span tiny, offset huge).
* scale_jitter — per-row magnitudes spanning 2^+/-40 with random signs:
  exercises the per-row power-of-two scale extraction.
* hf_sine      — sin at near-Nyquist frequency per axis: smooth but
  maximal cubic slope/overshoot structure.

Sweep axes: dims 3-8 spanning the admission range (4096 cells up to the
cost-model ceiling), methods linear / cubic-linearized / cubic, per-axis
extrapolation depth bracketing the 2-cell cubic cap (0..2) plus
beyond-gate depths (3, 4, 6) to characterize the margin — linear and
linearized cubic are UNGATED, so their 4-6-cell rows are in-envelope.
Mixed-depth batches (each axis at a random depth in [0, e]) mirror the
fuzz shape that produced the round-4 finding.

Error metric, both normalizations:
* rel_tab = max|i8 - gather_f64| / max|v|        (the engine's contract)
* rel_out = max|i8 - gather_f64| / max(1,|ref|)  (user-visible, can blow
  up under cancellation — reported, not gated)

Run on the real TPU (the Mosaic kernel is the shipped engine):
    PYTHONPATH=. python benches/exp_i8_adversarial.py [--quick]
Writes benches/i8_adversarial.json and prints the worst rows.

Results (2026-08-20, TPU v5e, full sweep, 612 admitted rows): see
benches/i8_adversarial.json and docs/perf.md "i8 worst-case error model".
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np

import interpn_tpu  # noqa: F401  (x64 on)
import jax
import jax.numpy as jnp

from interpn_tpu.ops import cubic as ops_cubic
from interpn_tpu.ops import linear as ops_linear
from interpn_tpu.ops import pallas_i8 as pi8

N_OBS = 256


def make_table(family: str, dims, rng) -> np.ndarray:
    n = int(np.prod(dims))
    idx = np.indices(dims).reshape(len(dims), n)
    parity = idx.sum(axis=0) % 2
    if family == "alternating":
        return np.where(parity == 0, 1.0, -1.0) * 100.0
    if family == "near_cancel":
        base = np.where(parity == 0, 1.0, -1.0) * 100.0
        return base + 1e-6 * rng.standard_normal(n)
    if family == "spike_margin":
        g, lead, k = pi8._shape(tuple(dims))
        v = rng.standard_normal((lead, k))
        if k >= 2:
            # place one value per row at ~1000x the row's median |dev|
            med = np.median(v, axis=1, keepdims=True)
            meddev = np.median(np.abs(v - med), axis=1)
            pos = rng.integers(0, k, lead)
            v[np.arange(lead), pos] = med[:, 0] + 1000.0 * np.maximum(
                meddev, 1e-3
            ) * np.where(rng.random(lead) < 0.5, 1.0, -1.0)
        return v.reshape(-1)
    if family == "big_offset":
        return 1e9 + 1e-3 * rng.standard_normal(n)
    if family == "scale_jitter":
        g, lead, k = pi8._shape(tuple(dims))
        rowmag = 2.0 ** rng.integers(-40, 41, (lead, 1)).astype(np.float64)
        v = rng.standard_normal((lead, k)) * rowmag
        return v.reshape(-1)
    if family == "hf_sine":
        x = [np.pi * (np.arange(d) * 0.9 + 0.13) for d in dims]
        acc = np.zeros(dims)
        for axis, xa in enumerate(x):
            shape = [1] * len(dims)
            shape[axis] = dims[axis]
            acc = acc + np.sin(xa).reshape(shape)
        return np.ascontiguousarray(acc).reshape(-1) * 10.0
    raise ValueError(family)


def run_config(dims, family, method, linearize, e, mixed, rng):
    ndims = len(dims)
    starts = rng.uniform(-3, 3, ndims)
    steps = rng.uniform(0.2, 2.0, ndims)
    vals = make_table(family, dims, rng)
    admitted = pi8.supported(tuple(dims), method, vals)
    if not admitted:
        return None
    depth = rng.uniform(0, e, ndims) if mixed else np.full(ndims, float(e))
    obs = tuple(
        jnp.asarray(
            rng.uniform(
                starts[k] - depth[k] * steps[k],
                starts[k] + steps[k] * (dims[k] - 1 + depth[k]),
                N_OBS,
            )
        )
        for k in range(ndims)
    )
    sj = jnp.asarray(starts)
    pj = jnp.asarray(steps)
    vj = jnp.asarray(vals)
    got = np.asarray(
        pi8.eval_regular(dims, sj, pj, vj, obs, method, linearize)
    )
    if method == "linear":
        ref = np.asarray(ops_linear.linear_regular(dims, sj, pj, vj, obs))
    else:
        ref = np.asarray(
            ops_cubic.cubic_regular(dims, sj, pj, vj, obs, linearize)
        )
    aerr = np.abs(got - ref).max()
    vmax = max(np.abs(vals).max(), 1.0)
    gate_ok = (
        method != "cubic"
        or linearize
        or float(np.max(depth)) <= pi8._EXTRAP_CELLS_CUBIC
    )
    return {
        "dims": list(dims),
        "family": family,
        "method": method,
        "linearize": bool(linearize),
        "e": float(e),
        "mixed": bool(mixed),
        "in_gate": bool(gate_ok),
        "rel_tab": float(aerr / vmax),
        "rel_out": float(aerr / max(1.0, np.abs(ref).max())),
        "abs": float(aerr),
    }


SHAPES = [
    (16, 16, 16),       # 3D at the 4096-cell admission floor
    (50, 50, 50),       # 3D cost-model-admitted large grid
    (8, 8, 8, 8),       # 4D floor
    (14, 14, 14, 14),   # 4D mid
    (6, 6, 6, 6, 6),    # 5D
    (4, 5, 4, 4, 5, 4), # 6D — the round-4 fuzz shape
    (6, 6, 6, 6, 6, 6), # 6D larger
    (4, 4, 4, 4, 4, 4, 4),      # 7D
    # 8D must keep every axis >= 4: cubic's 4-point stencil is a PUBLIC
    # precondition (the model layer validates it; engines assume it), and
    # a first sweep with 3-point axes produced O(1) nonsense on every
    # cubic row while linear stayed clean — an invalid-input artifact,
    # not an engine defect
    (4, 4, 4, 4, 4, 4, 4, 4),   # 8D
]
FAMILIES = [
    "alternating", "near_cancel", "spike_margin",
    "big_offset", "scale_jitter", "hf_sine",
]


def main():
    quick = "--quick" in sys.argv
    rng = np.random.default_rng(20260820)
    rows = []
    shapes = SHAPES[:3] if quick else SHAPES
    families = FAMILIES[:2] if quick else FAMILIES
    for dims in shapes:
        for family in families:
            for method, linearize in (
                ("linear", True), ("cubic", True), ("cubic", False),
            ):
                depths = (
                    (0.0, 2.0)
                    if quick
                    else (0.0, 1.0, 2.0, 3.0, 4.0, 6.0)
                )
                for e in depths:
                    for mixed in ((False,) if e == 0.0 else (False, True)):
                        r = run_config(
                            dims, family, method, linearize, e, mixed, rng
                        )
                        if r is None:
                            continue
                        rows.append(r)
                        flag = " " if r["in_gate"] else "*"
                        print(
                            f"{str(dims):>24} {family:>12} {method:>6} "
                            f"lin={int(r['linearize'])} e={e:3.1f} "
                            f"mix={int(mixed)}{flag} "
                            f"rel_tab={r['rel_tab']:9.2e} "
                            f"rel_out={r['rel_out']:9.2e}",
                            flush=True,
                        )
    out = Path(__file__).parent / "i8_adversarial.json"
    out.write_text(json.dumps(rows, indent=1))
    in_gate = [r for r in rows if r["in_gate"]]
    worst_tab = max(in_gate, key=lambda r: r["rel_tab"])
    worst_out = max(in_gate, key=lambda r: r["rel_out"])
    print(f"\n{len(rows)} rows ({len(in_gate)} inside the gate)")
    print("worst in-gate rel_tab:", json.dumps(worst_tab))
    print("worst in-gate rel_out:", json.dumps(worst_out))


if __name__ == "__main__":
    main()
