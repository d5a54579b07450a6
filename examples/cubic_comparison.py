"""Quality-of-fit comparison: multicubic vs scipy cubic interpolation.

TPU-native analogue of the reference's `examples/cubic_comparison.py`:
evaluates MulticubicRegular / MulticubicRectilinear on quadratic, sine, and
step functions across interpolation and extrapolation regions, against
scipy's RegularGridInterpolator (cubic), and writes an SVG comparison figure
into docs/ (matplotlib — plotly is not available in this image).

Run: python examples/cubic_comparison.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
from scipy.interpolate import RegularGridInterpolator

from interpn_tpu import MulticubicRectilinear, MulticubicRegular

DOCS = Path(__file__).resolve().parent.parent / "docs"


def step_fn(x: np.ndarray) -> np.ndarray:
    return np.where(x < 0.0, 0.0, 1.0)


FN_DEFS = [
    ("Quadratic", lambda x: x**2),
    ("Sine", np.sin),
    ("Step", step_fn),
]


def main() -> None:
    rng = np.random.default_rng(42)
    ngrid = 9
    xmin, xmax = -3.0, 3.0
    xobs = np.linspace(xmin - 2.0, xmax + 2.0, 400)

    fig, axes = plt.subplots(
        len(FN_DEFS), 2, figsize=(11, 9), sharex=True, constrained_layout=True
    )
    for row, (name, fn) in enumerate(FN_DEFS):
        # Regular grid
        xg = np.linspace(xmin, xmax, ngrid)
        yg = fn(xg)
        interp_reg = MulticubicRegular.new(
            [ngrid],
            np.array([xg[0]]),
            np.array([xg[1] - xg[0]]),
            yg,
            linearize_extrapolation=True,
        )
        y_reg = interp_reg.eval([xobs])

        # Rectilinear grid: perturbed but monotonic
        xr = xg + (rng.random(ngrid) - 0.5) * 0.25
        yr = fn(xr)
        interp_rect = MulticubicRectilinear.new([xr], yr)
        y_rect = interp_rect.eval([xobs])

        sci = RegularGridInterpolator(
            (xg,), yg, method="cubic", bounds_error=False, fill_value=None
        )
        y_sci = sci(xobs[:, None])

        for col, (grid_name, xs, ys, yhat) in enumerate(
            [("Regular", xg, yg, y_reg), ("Rectilinear", xr, yr, y_rect)]
        ):
            ax = axes[row][col]
            ax.axvspan(xs[0], xs[-1], color="0.92", label="_grid span")
            ax.plot(xobs, fn(xobs), "k--", lw=1, label="truth")
            ax.plot(xobs, yhat, lw=1.5, label="interpn-tpu cubic")
            if col == 0:
                ax.plot(xobs, y_sci, lw=1, alpha=0.7, label="scipy cubic")
            ax.plot(xs, ys, "o", ms=3, color="k", label="grid points")
            ax.set_title(f"{name} — {grid_name} grid")
            if row == 0 and col == 0:
                ax.legend(fontsize=8)
    out = DOCS / "cubic_quality_of_fit.svg"
    out.parent.mkdir(exist_ok=True)
    fig.savefig(out)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
