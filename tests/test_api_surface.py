"""Public-API stability snapshot gate (VERDICT r4 item 6).

The reference CI runs cargo-semver-checks on every PR
(/root/reference/.github/workflows/test-rust.yml:29-30) so an accidental
signature/surface change fails loudly. This is the equivalent here: one
snapshot (tests/data/api_surface.json) pins

  * the exported names of ``interpn_tpu`` and ``interpn_tpu.raw``,
  * the call signatures of every public entry point (top-level helpers,
    the 16 raw functions, the 8 model classes' new/eval/eval_unchecked/
    check_bounds, compat, aot, functional, parallel),
  * the reference-contract error strings, triggered live, and
  * golden JSON wire bytes for all eight model classes (f64 + one f32).

Any intentional change must regenerate the snapshot explicitly:

    python tests/test_api_surface.py --regen

and the diff reviews as part of the change.
"""

from __future__ import annotations

import inspect
import json
import re
import sys
from pathlib import Path

if __name__ == "__main__":
    # regen runs standalone (no conftest): force the CPU backend before the
    # package import initializes jax, and put the repo on sys.path
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import pytest

import interpn_tpu as it
from interpn_tpu import aot, compat, functional, parallel, raw

SNAPSHOT = Path(__file__).parent / "data" / "api_surface.json"

_MODEL_CLASSES = [
    "MultilinearRegular",
    "MultilinearRectilinear",
    "MulticubicRegular",
    "MulticubicRectilinear",
    "NearestRegular",
    "NearestRectilinear",
    "TensorSplineRegular",
    "TensorSplineRectilinear",
]


def _signatures() -> dict[str, str]:
    sigs: dict[str, str] = {}

    def sig(name, obj):
        sigs[name] = str(inspect.signature(obj))

    sig("interpn", it.interpn)
    sig("interpn_stack", it.interpn_stack)
    for n in raw.__all__:
        sig(f"raw.{n}", getattr(raw, n))
    for cls_name in _MODEL_CLASSES:
        c = getattr(it, cls_name)
        sig(f"{cls_name}.new", c.new)
        sig(f"{cls_name}.eval", c.eval)
        sig(f"{cls_name}.eval_unchecked", c.eval_unchecked)
        sig(f"{cls_name}.check_bounds", c.check_bounds)
    sig("compat.RegularGridInterpolator", compat.RegularGridInterpolator.__init__)
    sig(
        "compat.RegularGridInterpolator.__call__",
        compat.RegularGridInterpolator.__call__,
    )
    sig("compat.interpn", compat.interpn)
    sig("aot.export_eval", aot.export_eval)
    sig("aot.load", aot.load)
    sig("functional.JaxInterpolator.from_model", functional.JaxInterpolator.from_model)
    sig("parallel.make_mesh", parallel.make_mesh)
    sig("parallel.sharded_evaluator", parallel.sharded_evaluator)
    sig("parallel.prepared_evaluator", parallel.prepared_evaluator)
    sig("parallel.prepared_stack_evaluator", parallel.prepared_stack_evaluator)
    sig("parallel.shard_obs", parallel.shard_obs)
    sig("parallel.pad_to_multiple", parallel.pad_to_multiple)
    return sigs


def _golden_models() -> dict[str, str]:
    g2 = [np.array([0.0, 1.0, 2.5, 4.0]), np.array([-1.0, 0.0, 0.5, 2.0])]
    v6 = np.arange(6.0)
    v16 = np.arange(16.0)
    s = np.array([0.0, 1.0])
    st = np.array([0.5, 2.0])
    out = {
        "MultilinearRegular": it.MultilinearRegular.new([2, 3], s, st, v6),
        "MultilinearRectilinear": it.MultilinearRectilinear.new(g2, v16),
        "MulticubicRegular": it.MulticubicRegular.new(
            [4, 4], s, st, v16, linearize_extrapolation=False
        ),
        "MulticubicRectilinear": it.MulticubicRectilinear.new(g2, v16),
        "NearestRegular": it.NearestRegular.new([2, 3], s, st, v6),
        "NearestRectilinear": it.NearestRectilinear.new(g2, v16),
        "TensorSplineRegular": it.TensorSplineRegular.new(
            [4, 4], s, st, v16, method="pchip"
        ),
        "TensorSplineRectilinear": it.TensorSplineRectilinear.new(
            g2, v16, method="cubic_spline"
        ),
        "MultilinearRegular_f32": it.MultilinearRegular.new(
            [2, 3],
            s.astype(np.float32),
            st.astype(np.float32),
            v6.astype(np.float32),
        ),
    }
    return {k: m.model_dump_json() for k, m in out.items()}


def _msg(exc: BaseException) -> str:
    """The contract message: pydantic wraps validator AssertionErrors as
    'Assertion failed, <msg> [type=...' — extract <msg>; otherwise str."""
    s = str(exc)
    m = re.search(r"Assertion failed, (.*?) \[type=", s, re.DOTALL)
    return m.group(1).strip() if m else s


def _error_strings() -> dict[str, str]:
    errs: dict[str, str] = {}

    def trig(name, fn):
        try:
            fn()
        except Exception as e:  # noqa: BLE001 — snapshotting the message
            errs[name] = _msg(e)
        else:
            errs[name] = "<did not raise>"

    z2, o2 = np.zeros(2), np.ones(2)
    trig(
        "model.steps_nonpositive",
        lambda: it.MultilinearRegular.new(
            [4, 5], z2, np.array([0.0, 1.0]), np.zeros(20)
        ),
    )
    trig(
        "model.vals_size",
        lambda: it.MultilinearRegular.new([4, 5], z2, o2, np.zeros(7)),
    )
    trig(
        "model.ndims_9",
        lambda: it.MultilinearRegular.new(
            [2] * 9, np.zeros(9), np.ones(9), np.zeros(2**9)
        ),
    )
    trig(
        "model.nearest_ndims_7",
        lambda: it.NearestRegular.new(
            [2] * 7, np.zeros(7), np.ones(7), np.zeros(2**7)
        ),
    )
    # grid-size floors are enforced at eval time (reference parity:
    # construction allows any positive dims; evaluation requires them)
    trig(
        "model.linear_short_grid",
        lambda: it.MultilinearRegular.new([1, 4], z2, o2, np.zeros(4)).eval(
            [np.zeros(2), np.zeros(2)]
        ),
    )
    trig(
        "model.cubic_short_grid",
        lambda: it.MulticubicRegular.new([3, 4], z2, o2, np.zeros(12)).eval(
            [np.zeros(2), np.zeros(2)]
        ),
    )
    # the same-dtype assert sees pre-cast fields only via the wire format
    # (new() casts everything to vals' dtype first)
    trig(
        "model.dtype_mix",
        lambda: it.MultilinearRegular.model_validate_json(
            '{"dims":[2,2],'
            '"starts":{"data":"[0.0, 0.0]","dtype":"float64"},'
            '"steps":{"data":"[1.0, 1.0]","dtype":"float32"},'
            '"vals":{"data":"[0.0, 0.0, 0.0, 0.0]","dtype":"float64"}}'
        ),
    )
    trig(
        "model.eval_obs_count",
        lambda: it.MultilinearRegular.new([2, 2], z2, o2, np.zeros(4)).eval(
            [np.zeros(3)]
        ),
    )
    trig(
        "raw.max_dims",
        lambda: raw.interpn_linear_regular_f64(
            [2] * 9,
            np.zeros(9),
            np.ones(9),
            np.zeros(2**9),
            [np.zeros(1)] * 9,
            np.zeros(1),
        ),
    )
    trig(
        "raw.out_dtype",
        lambda: raw.interpn_linear_regular_f64(
            [2, 2],
            z2,
            o2,
            np.zeros(4),
            [np.zeros(3), np.zeros(3)],
            np.zeros(3, np.float32),
        ),
    )
    trig(
        "interpn.bounds",
        lambda: it.interpn(
            [np.array([5.0])],
            grids=[np.linspace(0, 1, 5)],
            vals=np.zeros(5),
            method="linear",
            check_bounds=True,
        ),
    )
    trig(
        "interpn.unknown_method",
        lambda: it.interpn(
            [np.zeros(1)],
            grids=[np.linspace(0, 1, 5)],
            vals=np.zeros(5),
            method="spline",
        ),
    )
    trig(
        "compat.point_dims",
        lambda: compat.RegularGridInterpolator(
            (np.zeros((2, 2)),), np.zeros((2, 2))
        ),
    )
    trig(
        "compat.bad_dtype",
        lambda: compat.RegularGridInterpolator(
            (np.linspace(0, 1, 4),), np.zeros(4), dtype=np.int32
        ),
    )
    trig(
        "aot.empty_buckets",
        lambda: aot.export_eval(
            it.MultilinearRegular.new([2, 2], z2, o2, np.zeros(4)), []
        ),
    )
    return errs


def build_surface() -> dict:
    return {
        "exports.interpn_tpu": sorted(it.__all__),
        "exports.raw": list(raw.__all__),
        "signatures": _signatures(),
        "golden_json": _golden_models(),
        "error_strings": _error_strings(),
    }


def test_api_surface_snapshot():
    assert SNAPSHOT.exists(), (
        "missing snapshot — run: python tests/test_api_surface.py --regen"
    )
    want = json.loads(SNAPSHOT.read_text())
    got = build_surface()
    # compare section by section for a readable failure
    assert got.keys() == want.keys()
    for section in want:
        if got[section] == want[section]:
            continue
        if isinstance(want[section], dict):
            for k in sorted(set(want[section]) | set(got[section])):
                assert k in got[section], f"{section}: '{k}' removed — regen if intentional"
                assert k in want[section], f"{section}: '{k}' added — regen if intentional"
                assert got[section][k] == want[section][k], (
                    f"{section}['{k}'] changed:\n"
                    f"  pinned: {want[section][k]!r}\n"
                    f"  now:    {got[section][k]!r}\n"
                    "regenerate with: python tests/test_api_surface.py --regen"
                )
        pytest.fail(f"{section} changed: {got[section]!r} != {want[section]!r}")


def test_golden_models_parse_back():
    """The pinned wire bytes must VALIDATE, not just compare: a schema
    change that also regenerated the snapshot still has to read the old
    format (the persistence contract is bidirectional)."""
    want = json.loads(SNAPSHOT.read_text())["golden_json"]
    for name, js in want.items():
        cls = getattr(it, name.removesuffix("_f32"))
        m = cls.model_validate_json(js)
        assert m.model_dump_json() == js


if __name__ == "__main__":
    import sys

    if "--regen" in sys.argv:
        SNAPSHOT.parent.mkdir(parents=True, exist_ok=True)
        SNAPSHOT.write_text(json.dumps(build_surface(), indent=1, sort_keys=True))
        print(f"wrote {SNAPSHOT}")
    else:
        print(__doc__)
