"""Measure the three f64 device engines per grid config and render the
docs figure (docs/tpu_f64_engines.svg).

Engines: the f64 gather tree (reference evaluation order, the accuracy
anchor), the double-float VPU engine (ops/pallas_df64), and the
int8-multipass MXU engine (ops/pallas_i8). The gather tree is not timed
above 4D (5-8D gather-tree timing scans fault this image's device —
CLAUDE.md); those bars carry the cost-model estimate, hatched.

Run: PYTHONPATH=/root/repo python benches/bench_f64_engines.py [n]
"""

from __future__ import annotations

import json
import math
import sys
from pathlib import Path

import numpy as np

import interpn_tpu  # noqa: F401  (x64 on)
import jax.numpy as jnp

from interpn_tpu import ops
from interpn_tpu.ops import pallas_df64 as pdf
from interpn_tpu.ops import pallas_i8 as pi8
from interpn_tpu.utils.profiling import device_timeit

HERE = Path(__file__).resolve().parent
DOCS = HERE.parent / "docs"

sys.path.insert(0, str(HERE))
from bench_sweep import SURFACE, TEXT_PRIMARY, TEXT_SECONDARY, _plt, _style_ax

CONFIGS = [
    ((20, 20, 20), "linear"),
    ((20, 20, 20), "cubic"),
    ((40, 40, 40), "cubic"),
    ((50, 50, 50), "cubic"),
    ((64, 64, 64), "cubic"),
    ((20, 20, 20, 20), "cubic"),
    ((12,) * 5, "cubic"),
    ((17,) * 5, "cubic"),
]
ENGINE_COLOR = {
    "gather": "#52514e",
    "df64": "#2a78d6",
    "i8": "#eb6834",
}


def measure(n: int):
    rng = np.random.default_rng(0)
    rows = {}
    for dims, method in CONFIGS:
        nd = len(dims)
        starts = jnp.asarray(rng.uniform(-1, 1, nd))
        steps = jnp.asarray(rng.uniform(0.3, 1.0, nd))
        vals = jnp.asarray(rng.standard_normal(math.prod(dims)))
        obs_sets = jnp.asarray(
            rng.uniform(0.0, 1.0, (6, nd, n))
            * (steps * (jnp.asarray(dims, jnp.float64) - 1)).reshape(1, -1, 1)
            + starts.reshape(1, -1, 1)
        )
        key = "x".join(map(str, dims)) + f" {method}"
        rows[key] = {}
        if method == "linear":
            gat = lambda ob: ops.linear.linear_regular(dims, starts, steps, vals, ob)
        else:
            gat = lambda ob: ops.cubic.cubic_regular(dims, starts, steps, vals, ob, True)
        if nd <= 4:
            rows[key]["gather"] = n / device_timeit(gat, obs_sets)
        else:
            # estimate only: timing the 5-8D gather tree faults the device
            rows[key]["gather"] = -pi8._est_rates(dims, method)[1]
        if pdf.supported(dims, method):
            rows[key]["df64"] = n / device_timeit(
                lambda ob: pdf.eval_regular(dims, starts, steps, vals, ob, method),
                obs_sets,
            )
        if pi8.supported(dims, method, vals):
            rows[key]["i8"] = n / device_timeit(
                lambda ob: pi8.eval_regular(dims, starts, steps, vals, ob, method),
                obs_sets,
            )
        print(
            f"{key:24s} "
            + "  ".join(
                f"{e}: {abs(v)/1e6:7.2f}{'(est)' if v < 0 else ''} Mq/s"
                for e, v in rows[key].items()
            ),
            flush=True,
        )
    return rows


def plot(rows, path: Path):
    plt = _plt()
    if plt is None or not rows:
        return
    fig, ax = plt.subplots(figsize=(7.5, 4.6), constrained_layout=True)
    fig.patch.set_facecolor(SURFACE)
    keys = list(rows)
    y = np.arange(len(keys), dtype=float)
    h = 0.26
    for off, engine in zip((-h, 0.0, h), ("gather", "df64", "i8")):
        vy, vx, hatch_y, hatch_x = [], [], [], []
        for i, k in enumerate(keys):
            v = rows[k].get(engine)
            if v is None:
                continue
            (hatch_y if v < 0 else vy).append(y[i] + off)
            (hatch_x if v < 0 else vx).append(abs(v) / 1e6)
        label = {
            "gather": "gather tree (reference order)",
            "df64": "double-float VPU",
            "i8": "int8-multipass MXU",
        }[engine]
        ax.barh(vy, vx, height=h, color=ENGINE_COLOR[engine], label=label)
        if hatch_x:
            ax.barh(
                hatch_y, hatch_x, height=h, color=ENGINE_COLOR[engine],
                alpha=0.45, hatch="///", edgecolor=SURFACE,
                label=f"{label} (cost-model est.)",
            )
    ax.set_xscale("log")
    ax.set_yticks(y, keys, fontsize=8)
    ax.invert_yaxis()
    ax.set_xlabel("Mqueries/sec (f64, 1 chip)")
    ax.set_title("f64 device engines by grid configuration (v5e)")
    _style_ax(ax)
    ax.legend(fontsize=8, framealpha=0.9, loc="lower right")
    path.parent.mkdir(exist_ok=True)
    fig.savefig(path)
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else 300_000
    rows = measure(n)
    (HERE / "f64_engine_results.json").write_text(json.dumps(rows, indent=1))
    plot(rows, DOCS / "tpu_f64_engines.svg")
