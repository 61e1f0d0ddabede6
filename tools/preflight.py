"""Pre-flight replica of the external driver's full correctness sweep.

Drives the EXACT surface the driver drives — `__spark_entry__.queries()`
/ `oracle_sql()` on a VANILLA SparkSession (no engine session factory;
session-dependent fixes must activate inside `load_table`) — over every
registered query, not just the 50-entry sweep prefix, and applies
strictly MORE checking than the driver:

  * complex-typed checked columns (array/map/struct) are flagged — they
    crash the driver's canonicalizer;
  * oracled queries compare value-level against DuckDB
    (`testing.compare_frames`, stricter than the driver's hash);
  * rows-only queries must return rows and their `*_ok` self-validation
    columns must be all-true.

Usage:  python tools/preflight.py [sf_dir] [name_substr ...]
(default sf0.01, all queries; extra args filter by exact name or
substring so one query can be re-checked in seconds)
Exit code 0 = every query green; 1 = failures (listed).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

#: Degenerate-variance allowlist: {query: {column, ...}} of output columns
#: CONFIRMED to be constant by design at sf0.01 (e.g. a pinned parameter
#: echoed per row, a threshold column, a single-group slice). A constant
#: metric column NOT listed here is an advisory: the value compare passes
#: even if the formula is wrong for every varying input — the
#: constant-vs-constant sibling of the empty-vs-empty vacuity class.
_CONSTANT_OK: dict[str, set] = {}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filters = sys.argv[2:]

    import duckdb
    from pyspark.sql import SparkSession
    from pyspark.sql.types import ArrayType, MapType, StructType

    import __spark_entry__ as se
    from iris_pyspark_spark.registry import EnvironmentGated
    from iris_pyspark_spark.testing import compare_frames

    spark = SparkSession.builder.master("local[8]").getOrCreate()  # vanilla!
    spark.sparkContext.setLogLevel("ERROR")
    qs, osql = se.queries(), se.oracle_sql()
    if name_filters:
        qs = {
            n: fn
            for n, fn in qs.items()
            if any(f == n or f in n for f in name_filters)
        }
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    bad: list[tuple[str, str]] = []
    advisories: list[tuple[str, list]] = []
    skipped = 0
    per_q: dict[str, float] = {}
    t0 = time.time()
    for i, name in enumerate(qs, 1):
        tq = time.time()
        try:
            df = qs[name](spark, sf_dir)
            complex_cols = [
                f.name
                for f in df.schema.fields
                if isinstance(f.dataType, (ArrayType, MapType, StructType))
            ]
            if complex_cols:
                bad.append((name, f"complex checked columns {complex_cols}"))
                continue
            pdf = df.toPandas()
            # Vacuity gate (applies to ORACLED queries too): an empty
            # result trivially matches an empty oracle, and a 1-row
            # all-NULL aggregate over an empty input matches its oracle's
            # identical NULLs — both were observed when date windows
            # predated the data's range. Neither proves anything.
            if len(pdf) < 1:
                bad.append((name, "no rows (vacuous result)"))
                continue
            if len(pdf.columns) > 0 and bool(pdf.isna().all(axis=1).all()):
                bad.append((name, "all rows entirely NULL (vacuous result)"))
                continue
            if osql.get(name):
                res = compare_frames(pdf, con.execute(osql[name]).df())
                if not res.ok:
                    bad.append((name, res.detail[:200]))
                elif len(pdf) >= 3:
                    # Degenerate-variance advisory: a column identical on
                    # every row proves little even when the oracle agrees.
                    # ≥3-row results only — 1-row global aggregates and
                    # 2-row A/B splits are legitimately low-variance.
                    const_cols = [
                        c
                        for c in pdf.columns
                        if not c.endswith("_ok")
                        and c not in _CONSTANT_OK.get(name, set())
                        and pdf[c].nunique(dropna=False) <= 1
                    ]
                    if const_cols:
                        advisories.append((name, const_cols))
            else:
                if len(pdf) < 1:
                    bad.append((name, "no rows"))
                    continue
                ok_cols = [c for c in pdf.columns if c.endswith("_ok")]
                if not ok_cols:
                    bad.append((name, "rows-only query without *_ok columns"))
                elif not all(pdf[c].all() for c in ok_cols):
                    bad.append((name, f"false validation rows in {ok_cols}"))
        except EnvironmentGated:
            skipped += 1
        except Exception as e:  # noqa: BLE001 — report, don't abort the sweep
            bad.append((name, f"EXC {type(e).__name__}: {str(e)[:200]}"))
        per_q[name] = time.time() - tq
        if i % 50 == 0:
            print(
                f"  ...{i}/{len(qs)} ({time.time() - t0:.0f}s, {len(bad)} bad)",
                flush=True,
            )

    print(
        f"preflight: {len(qs)} queries at {sf_dir} in {time.time() - t0:.0f}s — "
        f"{len(qs) - len(bad) - skipped} green, {skipped} env-gated, {len(bad)} bad"
    )
    for name, detail in bad:
        print(f"  FAIL {name}: {detail}")
    if advisories:
        print(
            f"degenerate-variance advisories ({len(advisories)}) — confirm "
            "intent and allowlist in _CONSTANT_OK, or fix the query:"
        )
        for name, cols in advisories:
            print(f"  CONST {name}: {cols}")
    slowest = sorted(per_q.items(), key=lambda kv: -kv[1])[:10]
    print("slowest:", ", ".join(f"{n}={dt:.1f}s" for n, dt in slowest))
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
