"""Regenerate the README operator-coverage table from the registry.

Run after adding/removing queries:  python tools/gen_readme_coverage.py
Rewrites the block between the `| SURVEY §2 ID | queries |` header and
the next non-table line, and refreshes the query counts in the section
intro.
"""

from __future__ import annotations

import re
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from iris_pyspark_spark.registry import load_all  # noqa: E402

README = Path(__file__).resolve().parent.parent / "README.md"


def build_table() -> tuple[str, int, int]:
    registry = load_all()
    by_tag: dict[str, list[str]] = defaultdict(list)
    for q in registry.values():
        label = q.name + ("\\*" if q.oracle is None else "")
        for tag in q.tags:
            by_tag[tag].append(label)
    lines = ["| SURVEY §2 ID | queries |", "| --- | --- |"]
    for tag in sorted(by_tag):
        qs = ", ".join(f"`{n}`" for n in sorted(set(by_tag[tag])))
        lines.append(f"| {tag} | {qs} |")
    n_total = len(registry)
    n_oracled = sum(1 for q in registry.values() if q.oracle is not None)
    return "\n".join(lines) + "\n", n_total, n_oracled


def build_ledger() -> str:
    """Cumulative driver-proof ledger from CORRECTNESS_r*.json files:
    per round, how many of the driver's ~50 sweep rows succeeded, how
    many were first-time proofs, and the cumulative distinct-proven
    count — makes sweep-prefix rotation progress auditable at a glance."""
    import json

    root = README.parent
    lines = [
        "| round | driver rows | green | rows-only | new proofs | cumulative proven |",
        "| --- | --- | --- | --- | --- | --- |",
    ]
    seen: set[str] = set()
    rows_only_seen: set[str] = set()
    for path in sorted(root.glob("CORRECTNESS_r*.json")):
        rows = json.load(open(path))
        good = {
            n
            for n, r in rows.items()
            if r.get("err") is None or r.get("err") == "no_oracle"
        }
        # rows-only-by-design: green without a value-hash (oracle=None —
        # approx sketches, MLlib fits, streaming runtime metrics). Kept
        # as its own column so the hash-proof / rows-proof distinction
        # is auditable without reading the per-round JSON files.
        rows_only = {n for n, r in rows.items() if r.get("err") == "no_oracle"}
        new = good - seen
        seen |= good
        rows_only_seen |= rows_only
        rnd = path.stem.replace("CORRECTNESS_", "")
        lines.append(
            f"| {rnd} | {len(rows)} | {len(good)} | {len(rows_only)} "
            f"| {len(new)} | {len(seen)} |"
        )
    lines.append(
        f"\nCumulative rows-only-by-design: {len(rows_only_seen)} "
        f"(each returned rows and passed preflight's `*_ok` "
        f"self-validation; every other proven query is a full value-hash "
        f"match)."
    )
    # Never-checked count computed from the artifacts, not hand-counted
    # (VERDICT r08 task 6: round notes drifted from the real number).
    # st_transform_with_state is counted OUT: it is permanently
    # environment-gated here (transformWithStateInPandas needs
    # google.protobuf, absent in this container), so its slot can never
    # convert and must not inflate the convertible pool.
    registry = load_all()
    env_gated = {"st_transform_with_state"}
    proven_in_reg = seen & set(registry)
    never = set(registry) - proven_in_reg - env_gated
    lines.append(
        f"\nNever-driver-checked (convertible): {len(never)} of "
        f"{len(registry)} registered ({len(proven_in_reg)} proven, "
        f"{len(env_gated)} permanently env-gated and counted out)."
    )
    return "\n".join(lines) + "\n"


def main() -> None:
    table, n_total, n_oracled = build_table()
    text = README.read_text()
    text = re.sub(
        r"\| SURVEY §2 ID \| queries \|\n(?:\|[^\n]*\n)+",
        table,
        text,
        count=1,
    )
    text = re.sub(
        r"\d+ registered queries, \d+ with full DuckDB value-hash oracles",
        f"{n_total} registered queries, {n_oracled} with full DuckDB value-hash oracles",
        text,
        count=1,
    )
    ledger = build_ledger()
    if "| round | driver rows |" in text:
        text = re.sub(
            r"\| round \| driver rows \|[^\n]*\n(?:\|[^\n]*\n)+"
            r"(?:\nCumulative rows-only-by-design:[^\n]*\n)?"
            r"(?:\nNever-driver-checked \(convertible\):[^\n]*\n)?",
            ledger,
            text,
            count=1,
        )
    else:
        text = text.replace(
            "## Operator coverage map",
            "## Driver-proof ledger (generated from CORRECTNESS_r*.json)\n\n"
            "Distinct queries proven by the external driver's per-round\n"
            "correctness sweep. The sweep prefix (`registry._PRIORITY`) is\n"
            "rotated every round to never-checked queries, so `new proofs`\n"
            "tracks conversion of in-repo green into driver proof.\n\n"
            + ledger
            + "\n## Operator coverage map",
            1,
        )
    README.write_text(text)
    print(f"README updated: {n_total} queries, {n_oracled} oracled")


if __name__ == "__main__":
    main()
