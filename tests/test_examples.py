"""Execute the example scripts end-to-end (reference:
`test/test_examples.py:19-25` runs examples via runpy)."""

import importlib.util
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent
EXAMPLES = sorted((ROOT / "examples").glob("*.py"))

matplotlib = pytest.importorskip("matplotlib")


@pytest.mark.parametrize("script", EXAMPLES, ids=lambda p: p.name)
def test_example_runs(script, tmp_path):
    spec = importlib.util.spec_from_file_location(script.stem, script)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    if hasattr(mod, "BATCH"):
        mod.BATCH = 4096  # keep the serving example quick under test
    writes_figures = hasattr(mod, "DOCS")
    if writes_figures:
        # Redirect the docs/ output dir so tests don't overwrite committed
        # artifacts.
        mod.DOCS = tmp_path / "docs"
    mod.main()
    if writes_figures:
        assert any(mod.DOCS.glob("*.svg"))
