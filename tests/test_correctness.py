"""Replica of the driver's t2 gate: every registered query vs its DuckDB
oracle at sf0.01 — row count, coarse schema, order-insensitive values.

Queries without an oracle get the driver's weaker check here too:
they must run and return a stable schema with >= 1 row.
"""

from __future__ import annotations

import pytest

from iris_pyspark_spark.registry import EnvironmentGated, load_all
from iris_pyspark_spark.testing import assert_driver_safe_schema, compare_frames

REGISTRY = load_all()
ORACLE_CHECKED = sorted(n for n, q in REGISTRY.items() if q.oracle is not None)
ROWS_ONLY = sorted(n for n, q in REGISTRY.items() if q.oracle is None)


@pytest.mark.parametrize("name", ORACLE_CHECKED)
def test_oracle_match(name, query_result, oracle):
    q = REGISTRY[name]
    try:
        df, spark_pdf = query_result(name)
    except EnvironmentGated as e:
        pytest.skip(str(e))
    assert_driver_safe_schema(df, name)
    # Vacuity gate: empty-vs-empty (or all-NULL aggregate over an empty
    # input vs its identical oracle NULLs) passes a value compare while
    # proving nothing — seen when date windows predate the data range.
    assert len(spark_pdf) >= 1, f"{name}: no rows (vacuous result)"
    assert not bool(spark_pdf.isna().all(axis=1).all()), (
        f"{name}: all rows entirely NULL (vacuous result)"
    )
    oracle_pdf = oracle.execute(q.oracle).df()
    res = compare_frames(spark_pdf, oracle_pdf)
    assert res.ok, f"{name}: {res.detail}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only(name, query_result):
    try:
        df, pdf = query_result(name)
    except EnvironmentGated as e:
        pytest.skip(str(e))
    assert_driver_safe_schema(df, name)
    assert len(df.columns) > 0
    assert len(pdf) >= 1, f"{name}: returned no rows"
    # Self-validation contract for rows-only queries: with no oracle,
    # the output must carry its own invariants — at least one `*_ok`
    # boolean column, and every `*_ok` column must be TRUE on every row
    # (planted-pair recall, sketch error bounds, range pins, ...).
    ok_cols = [c for c in pdf.columns if c.endswith("_ok")]
    assert ok_cols, f"{name}: rows-only query carries no *_ok validation column"
    for c in ok_cols:
        assert pdf[c].all(), f"{name}: validation column {c} has false rows"


def test_entry_smoke(spark):
    import __spark_entry__ as se

    df = se.entry(spark)
    assert df.count() > 0


def test_every_query_has_registry_consistency():
    import __spark_entry__ as se

    qs, oracles = se.queries(), se.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) == len(REGISTRY)
