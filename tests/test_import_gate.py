"""Import gate — the fast pre-commit tripwire for refactor breakage.

Round 2 shipped a refactor that deleted a module-level symbol
(EVENTS_RAW_SCHEMA) while a test module still imported it at collection
time and a registered query imported it inside its function body. The
first broke `pytest tests/` wholesale; the second was a runtime crash
invisible until that query ran. Both classes are catchable in seconds
without starting Spark:

  * import every query module and every test module (collection-time
    imports execute);
  * statically resolve every `import`/`from ... import ...` that appears
    INSIDE a registered query's function body — deferred imports never
    execute at module load, so they need this explicit check.

Run this file alone (`pytest tests/test_import_gate.py`) before any
snapshot commit; it needs no SparkSession and finishes in ~2 seconds.
"""

from __future__ import annotations

import ast
import importlib
import importlib.util
import inspect
import os
import sys

from iris_pyspark_spark.registry import load_all


def test_all_query_modules_import_and_register():
    reg = load_all()  # imports every module in _QUERY_MODULES
    assert len(reg) >= 200
    for name, q in reg.items():
        assert callable(q.fn), name


def test_all_test_modules_import():
    """Equivalent of pytest collection: every tests/*.py must import.
    A test module that dies at import hides EVERY test in the file."""
    tests_dir = os.path.dirname(os.path.abspath(__file__))
    for fname in sorted(os.listdir(tests_dir)):
        if not fname.endswith(".py") or fname == os.path.basename(__file__):
            continue
        mod_name = f"_import_gate_probe.{fname[:-3]}"
        spec = importlib.util.spec_from_file_location(
            mod_name, os.path.join(tests_dir, fname)
        )
        mod = importlib.util.module_from_spec(spec)
        # Register before exec so dataclass/typing lookups by module work.
        sys.modules[mod_name] = mod
        try:
            spec.loader.exec_module(mod)  # raises on broken import
        finally:
            sys.modules.pop(mod_name, None)


def _function_body_imports(fn) -> list[ast.stmt]:
    """All Import/ImportFrom nodes anywhere inside fn's body."""
    src = inspect.getsource(fn)
    # getsource of a decorated function keeps the decorators; dedent for ast.
    import textwrap

    tree = ast.parse(textwrap.dedent(src))
    return [
        node
        for node in ast.walk(tree)
        if isinstance(node, (ast.Import, ast.ImportFrom))
    ]


def test_registered_query_body_imports_resolve():
    """Deferred imports inside query bodies must resolve NOW: the module
    exists and, for `from m import x`, every name x exists on m. This is
    exactly the check that would have caught round 2's deleted
    EVENTS_RAW_SCHEMA before it shipped."""
    reg = load_all()
    problems: list[str] = []
    for qname, q in reg.items():
        pkg = sys.modules[q.fn.__module__].__package__
        for node in _function_body_imports(q.fn):
            if isinstance(node, ast.Import):
                for alias in node.names:
                    try:
                        importlib.import_module(alias.name)
                    except ImportError as e:
                        problems.append(f"{qname}: import {alias.name} → {e}")
            else:  # ImportFrom, possibly relative
                target = "." * node.level + (node.module or "")
                try:
                    resolved = importlib.util.resolve_name(target, pkg)
                    mod = importlib.import_module(resolved)
                except ImportError as e:
                    problems.append(f"{qname}: from {target} → {e}")
                    continue
                for alias in node.names:
                    if alias.name != "*" and not hasattr(mod, alias.name):
                        problems.append(
                            f"{qname}: from {resolved} import {alias.name} "
                            "→ name does not exist"
                        )
    assert not problems, "\n".join(problems)


def test_readme_coverage_table_in_sync():
    """The README operator-coverage table must match the registry at
    HEAD: registering a query without re-running
    tools/gen_readme_coverage.py fails here, which is what keeps the
    published counts honest."""
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(root, "tools"))
    try:
        from gen_readme_coverage import build_table
    finally:
        sys.path.pop(0)

    table, n_total, n_oracled = build_table()
    text = open(os.path.join(root, "README.md")).read()
    assert table in text, "README table differs from registry — run tools/gen_readme_coverage.py"
    counts = f"{n_total} registered queries, {n_oracled} with full DuckDB value-hash oracles"
    assert counts in text, f"README counts stale — expected '{counts}'"


def test_readme_proof_ledger_in_sync():
    """The README driver-proof ledger must match the CORRECTNESS_r*.json
    files at HEAD — a new round's record landing without a README regen
    fails here, keeping rotation progress auditable."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(root, "tools"))
    try:
        from gen_readme_coverage import build_ledger
    finally:
        sys.path.pop(0)

    ledger = build_ledger()
    text = open(os.path.join(root, "README.md")).read()
    assert ledger in text, (
        "README proof ledger differs from CORRECTNESS_r*.json — run "
        "tools/gen_readme_coverage.py"
    )
