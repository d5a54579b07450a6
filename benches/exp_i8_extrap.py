"""Calibration study for the i8 engine's extrapolation admission gate.

Sweeps per-axis extrapolation depth e (cells beyond both edges, all axes)
against the oracle in interpret mode and prints fuzz-style relative error.

Re-run 2026-08-20 after the pallas_df64._round_mul fix (the CPU FMA
contraction could have inflated every interpret-mode number here): the
envelope is UNCHANGED — clean (<= 2e-14) through e=3 on every shape,
cliff to 1.7e-9/4.0e-8 at e=4/6 on 4D and 1.6e-8/3.6e-8 on 6D. The cliff
is genuine weight quantization, not the compilation artifact; the 2-cell
cap keeps its 2x margin. Original findings (2026-08-17, this sweep + fuzz
seed 300 round 375):

* linear and LINEARIZED cubic: <= 1.5e-14 at every depth through e=6 on
  2-6D — weight dynamic range grows only linearly; ungated.
* NON-linearized cubic: <= 1.5e-14 through e=3 on every shape, then a
  cliff to 1e-7..1e-8 at e>=4 on 4-6D (weights grow ~2t^3 per axis; the
  per-query weight quantization keeps 49 bits below the PEAK, and output
  cancellation exposes the floor). Fuzz round 375 (6400-cell 6D, mixed
  3.5-6.5-cell depths) measured 4.7e-8 — on an ADMITTED shape.

=> pallas_i8._EXTRAP_CELLS_CUBIC = 2.0 (2x margin under the cliff);
   extrap_ok_regular/_rectilinear decline deeper non-linearized batches
   to the df64/gather engines.

Run: PYTHONPATH=. python benches/exp_i8_extrap.py  (CPU, ~10 min)
"""

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

import jax

jax.config.update("jax_platforms", "cpu")

import os

import numpy as np
import jax.numpy as jnp
from jax.experimental import pallas as pl

_orig = pl.pallas_call
pl.pallas_call = lambda *a, **k: _orig(*a, **{**k, "interpret": True})
os.environ["INTERPN_TPU_F64"] = "i8"  # force-admit every shape for the study

import oracle
from interpn_tpu.ops import pallas_i8 as pi8


def main():
    rng = np.random.default_rng(7)
    print(f"{'nd':>2} {'dims':>14} {'meth':>6} {'lin':>3} {'e':>4}  {'relerr':>9}")
    for ndims, dims in ((2, (8, 8)), (3, (6, 6, 6)), (4, (5, 5, 5, 5)),
                        (6, (4, 5, 4, 4, 5, 4))):
        starts = rng.uniform(-3, 3, ndims)
        steps = rng.uniform(0.2, 2.0, ndims)
        vals = rng.standard_normal(int(np.prod(dims)))
        for method in ("linear", "cubic"):
            for lin in ((True, False) if method == "cubic" else (True,)):
                for e in (0.0, 1.0, 2.0, 3.0, 4.0, 6.0):
                    n = 128
                    obs = [
                        rng.uniform(starts[k] - e * steps[k],
                                    starts[k] + steps[k] * (dims[k] - 1 + e), n)
                        for k in range(ndims)
                    ]
                    oj = tuple(jnp.asarray(o) for o in obs)
                    i8 = np.asarray(pi8.eval_regular(
                        dims, jnp.asarray(starts), jnp.asarray(steps),
                        jnp.asarray(vals), oj, method, lin))
                    of = {"linear": oracle.linear_regular,
                          "cubic": oracle.cubic_regular}[method]
                    args = [list(dims), starts, steps, vals]
                    if method == "cubic":
                        orc = np.array([of(*args, [o[i] for o in obs], lin)
                                        for i in range(n)])
                    else:
                        orc = np.array([of(*args, [o[i] for o in obs])
                                        for i in range(n)])
                    rel = np.abs(i8 - orc).max() / max(1.0, np.abs(orc).max())
                    print(f"{ndims:>2} {str(dims):>14} {method:>6} "
                          f"{int(lin):>3} {e:>4}  {rel:9.2e}")


if __name__ == "__main__":
    main()
