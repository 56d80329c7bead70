"""Mechanical enforcement of the driver re-check rule (VERDICT-r5 #1).

Every query name listed in ``proglog_spark.queries._DRIVER_CHECKED``
claims "the driver verified THIS implementation against THIS oracle".
Until r6 that claim was policed by convention (comments + builder
discipline).  This tool makes it CI: at check-recording time we store
a digest of the query's full dependency closure —

  * the query function's own source (``inspect.getsource``),
  * its registered oracle SQL,
  * the source of every ``proglog_spark`` helper function / class the
    query source references (recursively), and
  * the FULL source of every ``proglog_spark`` module it references,
    transitively through those modules' own intra-package imports

— in ``driver_check_manifest.json`` at the repo root.  The test
``tests/test_entry_contract.py::test_driver_checked_digest_manifest``
fails if any checked name's current digest drifts from its recorded
one, or if the manifest and ``_DRIVER_CHECKED`` disagree about which
names are checked.  Editing an operator module therefore FORCES the
editor to either evict the affected names (rotate them back into the
driver window via ``_WINDOW_PRIORITY``) or consciously re-record —
forgetting is no longer possible.

The closure is deliberately conservative: a comment-only edit to a
shared module drifts every dependent query.  That over-evicts, never
under-evicts — the safe direction for a correctness ledger.

Digests depend only on repo source text (never on pyspark/duckdb
versions, timestamps, or hash seeds), so they are stable across
machines and sessions.

CLI:
  python tools/digest_manifest.py --check            # exit 1 on drift
  python tools/digest_manifest.py --record NAME...   # (re)record names
  python tools/digest_manifest.py --evict NAME...    # drop names
  python tools/digest_manifest.py --record-checked   # sync manifest to
                                                     # _DRIVER_CHECKED
"""

from __future__ import annotations

import ast
import hashlib
import inspect
import json
import sys
import textwrap
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
MANIFEST_PATH = REPO / "driver_check_manifest.json"
_PKG = "proglog_spark"


def _canon_repr(obj) -> str:
    """Deterministic repr for module-level constants (set/frozenset/dict
    iteration order is hash-seed dependent — sort before hashing)."""
    if isinstance(obj, (set, frozenset)):
        return "{" + ", ".join(sorted(_canon_repr(x) for x in obj)) + "}"
    if isinstance(obj, dict):
        items = sorted((_canon_repr(k), _canon_repr(v)) for k, v in obj.items())
        return "{" + ", ".join(f"{k}: {v}" for k, v in items) + "}"
    if isinstance(obj, (list, tuple)):
        inner = ", ".join(_canon_repr(x) for x in obj)
        return ("[%s]" if isinstance(obj, list) else "(%s)") % inner
    return repr(obj)


def _module_path(name: str) -> Path | None:
    """Resolve a proglog_spark module NAME to its source file WITHOUT
    importing it (several package modules need a live SparkSession at
    import time — the digest must never execute them)."""
    p = REPO.joinpath(*name.split("."))
    if (p / "__init__.py").exists():
        return p / "__init__.py"
    if p.with_suffix(".py").exists():
        return p.with_suffix(".py")
    return None


def _pkg_module_closure(name: str, mods: dict) -> None:
    """Collect module ``name`` and, transitively, every proglog_spark
    module its import statements reach (package-internal closure only;
    pure source-file analysis, no imports executed)."""
    if not name.startswith(_PKG) or name in mods:
        return
    path = _module_path(name)
    if path is None:
        return
    src = path.read_text()
    mods[name] = src
    try:
        tree = ast.parse(src)
    except SyntaxError:
        return
    is_pkg = path.name == "__init__.py"
    pkg = name if is_pkg else name.rpartition(".")[0]
    for node in ast.walk(tree):
        targets: list[str] = []
        if isinstance(node, ast.Import):
            targets = [a.name for a in node.names if a.name.startswith(_PKG)]
        elif isinstance(node, ast.ImportFrom):
            if node.level:
                base = pkg
                for _ in range(node.level - 1):
                    base = base.rpartition(".")[0]
                stem = f"{base}.{node.module}" if node.module else base
            else:
                stem = node.module or ""
            if stem.startswith(_PKG):
                targets = [stem] + [f"{stem}.{a.name}" for a in node.names]
        for t in targets:
            _pkg_module_closure(t, mods)


def _fn_closure(fn, fn_srcs: dict, mods: dict) -> None:
    """Collect fn's source plus every proglog_spark function/class/module
    its source references (by global name or import statement).

    CLOSURE CONVENTION (mirrored in queries.register's docstring):
    only bare ast.Name globals and explicit proglog_spark imports are
    walked. A helper reached purely through container/attribute
    indirection (a dict of callables, class-attribute dispatch with no
    module-level reference) is INVISIBLE to the digest — query authors
    must name dispatched functions (or their module) directly in the
    query body. This is a documented authoring requirement, not an
    attempted static analysis of arbitrary dispatch."""
    key = f"{getattr(fn, '__module__', '?')}.{getattr(fn, '__qualname__', '?')}"
    if key in fn_srcs:
        return
    try:
        src = inspect.getsource(fn)
    except (OSError, TypeError):
        return
    fn_srcs[key] = src
    try:
        tree = ast.parse(textwrap.dedent(src))
    except SyntaxError:
        return
    g = getattr(fn, "__globals__", {})
    names = sorted({n.id for n in ast.walk(tree) if isinstance(n, ast.Name)})
    for nm in names:
        obj = g.get(nm)
        if obj is None:
            continue
        if inspect.ismodule(obj):
            _pkg_module_closure(getattr(obj, "__name__", ""), mods)
        elif inspect.isfunction(obj) and getattr(obj, "__module__", "").startswith(_PKG):
            _fn_closure(obj, fn_srcs, mods)
        elif inspect.isclass(obj) and getattr(obj, "__module__", "").startswith(_PKG):
            try:
                fn_srcs[f"{obj.__module__}.{obj.__qualname__}"] = inspect.getsource(obj)
            except (OSError, TypeError):
                pass
            _pkg_module_closure(obj.__module__, mods)
        elif isinstance(obj, (str, bytes, int, float, bool, tuple, list, dict,
                              set, frozenset)):
            # *_MEMO names are session-scoped mutable runtime caches
            # (the plan-handle memos: queries._DF_MEMO,
            # sources.tables._HANDLE_MEMO) — their live CONTENTS vary
            # within a process (empty at import, populated after the
            # first Spark run), so value-hashing them makes digests
            # unstable mid-process. They are not query semantics; the
            # code that READS them is still source-captured. Documented
            # naming convention: any module-level mutable cache must
            # carry the _MEMO suffix.
            if nm.endswith("_MEMO"):
                continue
            r = _canon_repr(obj)
            # containers holding non-literal objects (e.g. the REGISTRY
            # dict of function objects) repr with per-process memory
            # addresses — those are covered by source capture, skip
            if " at 0x" not in r:
                fn_srcs[f"const:{fn.__module__}.{nm}"] = r
    # local `from proglog_spark.x import y` / `import proglog_spark.x`
    for node in ast.walk(tree):
        stems: list[str] = []
        if isinstance(node, ast.Import):
            stems = [a.name for a in node.names if a.name.startswith(_PKG)]
        elif isinstance(node, ast.ImportFrom) and not node.level:
            if (node.module or "").startswith(_PKG):
                stems = [node.module] + [f"{node.module}.{a.name}" for a in node.names]
        for t in stems:
            _pkg_module_closure(t, mods)


def query_digest(name: str, registry=None) -> str:
    """sha256 over the query's dependency closure (see module docstring)."""
    if registry is None:
        from proglog_spark.queries import REGISTRY as registry  # noqa: N811
    fn, sql = registry[name][0], registry[name][1]
    fn_srcs: dict = {}
    mods: dict = {}
    _fn_closure(fn, fn_srcs, mods)
    h = hashlib.sha256()
    h.update((sql or "<rows-only>").encode())
    for k in sorted(fn_srcs):
        h.update(b"\x00fn\x00" + k.encode() + b"\x00" + fn_srcs[k].encode())
    for k in sorted(mods):
        h.update(b"\x00mod\x00" + k.encode() + b"\x00" + mods[k].encode())
    return h.hexdigest()


def load_manifest() -> dict:
    if MANIFEST_PATH.exists():
        return json.loads(MANIFEST_PATH.read_text())
    return {}


def save_manifest(m: dict) -> None:
    MANIFEST_PATH.write_text(json.dumps(dict(sorted(m.items())), indent=0) + "\n")


def drift_report() -> tuple[list[str], list[str], list[str]]:
    """(drifted, missing_from_manifest, stale_in_manifest) vs
    _DRIVER_CHECKED — all three must be empty for the test to pass.
    A checked name no longer present in REGISTRY (renamed/deleted
    query with a stale green-list entry) is reported as drifted —
    with the actionable message — rather than KeyError-ing the
    report."""
    from proglog_spark.queries import REGISTRY, _DRIVER_CHECKED

    m = load_manifest()
    unknown = [n for n in sorted(_DRIVER_CHECKED) if n not in REGISTRY]
    drifted = unknown + [
        n
        for n in sorted(_DRIVER_CHECKED)
        if n in REGISTRY and n in m and query_digest(n) != m[n]
    ]
    missing = [
        n for n in sorted(_DRIVER_CHECKED) if n in REGISTRY and n not in m
    ]
    stale = [n for n in sorted(m) if n not in _DRIVER_CHECKED]
    return drifted, missing, stale


def main(argv: list[str]) -> int:
    sys.path.insert(0, str(REPO))
    if not argv or argv[0] == "--check":
        drifted, missing, stale = drift_report()
        for n in drifted:
            print(f"DRIFT   {n}  (evict from _DRIVER_CHECKED or --record)")
        for n in missing:
            print(f"MISSING {n}  (checked but never recorded)")
        for n in stale:
            print(f"STALE   {n}  (recorded but not in _DRIVER_CHECKED — --evict)")
        ok = not (drifted or missing or stale)
        print("manifest OK" if ok else "manifest INCONSISTENT")
        return 0 if ok else 1
    m = load_manifest()
    if argv[0] == "--record":
        for n in argv[1:]:
            m[n] = query_digest(n)
            print(f"recorded {n}")
    elif argv[0] == "--evict":
        for n in argv[1:]:
            m.pop(n, None)
            print(f"evicted {n}")
    elif argv[0] == "--record-checked":
        from proglog_spark.queries import _DRIVER_CHECKED

        m = {n: query_digest(n) for n in sorted(_DRIVER_CHECKED)}
        print(f"recorded {len(m)} checked names")
    else:
        print(__doc__)
        return 2
    save_manifest(m)
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
