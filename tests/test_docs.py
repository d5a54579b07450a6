"""Docs-as-tests: execute every python code block in README.md and
docs/index.md (the reference uses mktestdocs for the same purpose,
`test/test_docs.py:7-9`; this is a dependency-free equivalent)."""

import re
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent

_BLOCK = re.compile(r"```python\n(.*?)```", re.DOTALL)


def _blocks(path: Path):
    text = path.read_text()
    return [(i, m.group(1)) for i, m in enumerate(_BLOCK.finditer(text))]


_DOCS = [p for p in (ROOT / "README.md", ROOT / "docs" / "index.md") if p.exists()]


@pytest.mark.parametrize(
    "path,idx,code",
    [(p, i, c) for p in _DOCS for i, c in _blocks(p)],
    ids=lambda v: str(v) if not isinstance(v, Path) else v.name,
)
def test_doc_block_executes(path, idx, code):
    exec(compile(code, f"{path.name}:block{idx}", "exec"), {"__name__": "__doctest__"})
