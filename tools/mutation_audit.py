"""Oracle-mutation audit: prove the oracles DISCRIMINATE.

The in-repo gate (and the driver's t2) compares Spark output against a
DuckDB oracle — but a comparison only proves correctness if it would
FAIL for a wrong answer. This tool closes that meta-gap (the next
escalation after the round-4 empty-vs-empty and round-5
constant-vs-constant audits): for a sample of oracled queries it runs
the real comparison once to establish the green baseline, then injects
deliberate wrong-answer mutations into the SPARK result and asserts the
comparison fails for every one:

  cell_bump  — one cell changed by the smallest representable step
               (+1 int, 1-ulp float nextafter, +1s timestamp, flipped
               bool, suffixed string): catches value-hash tolerance
               that's coarser than the value domain.
  row_drop   — last row removed: catches row-count-blind compares.
  col_rename — one column renamed: catches schema-blind compares.

A mutation that still PASSES means that oracle cannot catch that class
of Spark-side bug — reported and exit 1. Zero-row outputs can't take
cell/row mutations; they are flagged as advisory (a 0-row oracled
result proves little and should justify itself).

Usage:
    python tools/mutation_audit.py [sf_dir] [n_sample|all] [name_substr]

Sampling is deterministic: registry order (the _PRIORITY sweep prefix
first — the queries the driver will check next — then the remainder),
every k-th name to spread across modules.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iris_pyspark_spark.registry import EnvironmentGated, load_all  # noqa: E402
from iris_pyspark_spark.testing import compare_frames, make_oracle_con  # noqa: E402

MUTATIONS = ("cell_bump", "row_drop", "col_rename")


def _bump_cell(pdf: pd.DataFrame) -> pd.DataFrame | None:
    """Smallest-step change to the first mutable NON-NULL cell anywhere
    in the frame, or None if no cell can take a real mutation.

    Scans every row, not just the first: a frame whose first row is all
    NaN/NaT would otherwise skip cell_bump silently — or worse, apply a
    no-op (NaT + Timedelta stays NaT) that then reads as an UNDETECTED
    mutation and falsely fails the query. NULL cells of every dtype are
    skipped; the caller emits an advisory when a non-empty frame yields
    no mutable cell so the gap is visible instead of silent."""
    if len(pdf) == 0:
        return None
    for c in sorted(pdf.columns):
        s = pdf[c]
        kind = s.dtype.kind
        for idx, v in s.items():
            if pd.isna(v):
                continue  # NaN, NaT, pd.NA, None — never a real bump
            out = None
            if kind in "iu" or (kind == "O" and isinstance(v, (int, np.integer))
                                and not isinstance(v, (bool, np.bool_))):
                out = v + 1
            elif kind == "f" or isinstance(v, (float, np.floating)):
                out = float(np.nextafter(v, np.inf))
            elif kind == "b" or isinstance(v, (bool, np.bool_)):
                out = not bool(v)
            elif kind == "M":
                out = v + pd.Timedelta(seconds=1)
            elif kind == "O" and isinstance(v, str):
                out = v + "\x01"
            else:
                break  # unmutable dtype: move to the next column
            res = pdf.copy(deep=True)
            res.loc[idx, c] = out
            return res
    return None


def mutants(pdf: pd.DataFrame):
    """Yield (mutation_name, mutated_frame) for every applicable class."""
    bumped = _bump_cell(pdf)
    if bumped is not None:
        yield "cell_bump", bumped
    if len(pdf) > 0:
        yield "row_drop", pdf.iloc[:-1].copy()
    first = sorted(pdf.columns)[0]
    yield "col_rename", pdf.rename(columns={first: first + "_mut"})


def audit(sf_dir: str, names: list[str]) -> int:
    from iris_pyspark_spark.session import get_spark

    reg = load_all()
    spark = get_spark(app_name="mutation-audit")
    con = make_oracle_con(sf_dir)
    bad: dict[str, list[str]] = {}
    advisories: list[str] = []
    baseline_fail: list[str] = []
    for i, name in enumerate(names):
        q = reg[name]
        try:
            sp = q.fn(spark, sf_dir).toPandas()
        except EnvironmentGated:
            continue
        du = con.execute(q.oracle).df()
        if not compare_frames(sp, du).ok:
            baseline_fail.append(name)
            continue
        if len(sp) == 0:
            advisories.append(f"{name}: 0-row output — only col_rename testable")
        elif _bump_cell(sp) is None:
            advisories.append(
                f"{name}: no mutable non-null cell — cell_bump not exercised"
            )
        undetected = [
            m for m, mutated in mutants(sp) if compare_frames(mutated, du).ok
        ]
        if undetected:
            bad[name] = undetected
        print(
            f"[{i + 1}/{len(names)}] {name}: "
            + ("NON-DISCRIMINATING " + ",".join(undetected) if undetected else "ok")
        )
    print()
    for a in advisories:
        print(f"ADVISORY {a}")
    for n in baseline_fail:
        print(f"BASELINE-FAIL {n} (fix the query/oracle first; not audited)")
    if bad:
        print(f"NON-DISCRIMINATING oracles ({len(bad)}):")
        for n, ms in bad.items():
            print(f"  {n}: passes despite {ms}")
        return 1
    print(
        f"mutation audit: {len(names)} queries x {len(MUTATIONS)} mutation "
        "classes — every mutation detected"
    )
    return 0 if not baseline_fail else 1


def pick_sample(n: int | None, substr: str) -> list[str]:
    reg = load_all()
    oracled = [m for m, q in reg.items() if q.oracle is not None and substr in m]
    if n is None or n >= len(oracled):
        return oracled
    step = max(1, len(oracled) // n)
    return oracled[::step][:n]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_arg = sys.argv[2] if len(sys.argv) > 2 else "50"
    substr = sys.argv[3] if len(sys.argv) > 3 else ""
    n = None if n_arg == "all" else int(n_arg)
    names = pick_sample(n, substr)
    return audit(sf_dir, names)


if __name__ == "__main__":
    raise SystemExit(main())
