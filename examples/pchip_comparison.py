"""Monotone cubic (pchip) vs plain cubic: the overshoot story.

The reference library's cubic is a centered-difference Hermite spline
(`/root/reference/src/multicubic/mod.rs:1-46`); like every non-monotone
cubic it overshoots at steps and at the edges of flat runs. The
tensor-product PCHIP engine (`interpn_tpu.ops.pchip`, scipy-semantics
slopes) trades that third-order interior accuracy for a guarantee: the
interpolant never leaves the range of the local data. This figure shows
both behaviors on the classic step / monotone-staircase cases, on both
grid kinds, and writes docs/pchip_quality_of_fit.svg.

Run: python examples/pchip_comparison.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from interpn_tpu import ops

DOCS = Path(__file__).resolve().parent.parent / "docs"

# house palette (see cubic_comparison.py): method = hue, truth in ink
_C_PCHIP = "#2a78d6"
_C_CUBIC = "#eb6834"


def _eval(kind, xg, yg, xobs, method):
    if kind == "Regular":
        args = ((len(xg),), np.array([xg[0]]), np.array([xg[1] - xg[0]]), yg)
        fn = ops.pchip_regular if method == "pchip" else None
        if fn is None:
            return np.asarray(ops.cubic_regular(*args, [xobs], True))
        return np.asarray(fn(*args, [xobs]))
    if method == "pchip":
        return np.asarray(ops.pchip_rectilinear([xg], yg, [xobs]))
    return np.asarray(ops.cubic_rectilinear([xg], yg, [xobs], True))


def main() -> None:
    rng = np.random.default_rng(7)
    ngrid = 11
    xmin, xmax = -3.0, 3.0
    xobs = np.linspace(xmin - 0.8, xmax + 0.8, 600)

    cases = [
        ("Step", lambda x: np.where(x < 0.0, 0.0, 1.0), ngrid),
        # dense enough that each flat tread holds several grid points —
        # the regime where non-monotone cubics ring at every riser
        ("Monotone staircase", lambda x: np.round(x) + 0.08 * x, 25),
    ]

    fig, axes = plt.subplots(
        len(cases), 2, figsize=(11, 6.5), sharex=True, constrained_layout=True
    )
    for row, (name, fn, npts) in enumerate(cases):
        xg_reg = np.linspace(xmin, xmax, npts)
        xg_rect = np.sort(xg_reg + (rng.random(npts) - 0.5) * 0.5 * (xmax - xmin) / npts)
        for col, (kind, xg) in enumerate(
            [("Regular", xg_reg), ("Rectilinear", xg_rect)]
        ):
            yg = fn(xg)
            ax = axes[row][col]
            ax.axvspan(xg[0], xg[-1], color="0.93")
            ax.plot(xobs, fn(xobs), "k--", lw=1, label="truth")
            ax.plot(
                xobs, _eval(kind, xg, yg, xobs, "cubic"),
                lw=2, color=_C_CUBIC, alpha=0.85, label="cubic (Hermite)",
            )
            ax.plot(
                xobs, _eval(kind, xg, yg, xobs, "pchip"),
                lw=2, color=_C_PCHIP, label="pchip (monotone)",
            )
            ax.plot(xg, yg, "o", ms=3.5, color="k", label="grid points")
            ax.set_title(f"{name} — {kind} grid", fontsize=10)
            ax.grid(True, color="0.9", lw=0.5)
            ax.set_axisbelow(True)
            if row == 0 and col == 0:
                ax.legend(fontsize=8, loc="upper left")
    fig.suptitle(
        "pchip never leaves the local data range; cubic overshoots at steps",
        fontsize=11,
    )
    DOCS.mkdir(exist_ok=True)
    out = DOCS / "pchip_quality_of_fit.svg"
    fig.savefig(out)
    print(f"wrote {out}")
    plt.close(fig)


if __name__ == "__main__":
    main()
