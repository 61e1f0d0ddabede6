"""Pin the oracle-mutation audit (tools/mutation_audit.py): the
proof-of-proof that the Spark-vs-DuckDB comparison would actually FAIL
for a wrong Spark answer. Pure-pandas machinery tests plus one live
end-to-end audit of real queries."""

from __future__ import annotations

import pandas as pd
import pytest


def _tool():
    import importlib

    return importlib.import_module("tools.mutation_audit")


def test_every_mutation_class_breaks_an_identical_frame():
    """All three mutation classes applied to a frame equal to its oracle
    must each flip compare_frames to a failure — if any passes, the
    comparator has a blind spot."""
    from iris_pyspark_spark.testing import compare_frames

    ma = _tool()
    pdf = pd.DataFrame(
        {
            "k": ["a", "b", "c"],
            "n": pd.array([1, 2, 3], dtype="int64"),
            "v": [1.5, 2.5, 3.5],
        }
    )
    oracle = pdf.copy(deep=True)
    assert compare_frames(pdf, oracle).ok
    seen = set()
    for mname, mutated in ma.mutants(pdf):
        seen.add(mname)
        res = compare_frames(mutated, oracle)
        assert not res.ok, f"mutation {mname} was NOT detected"
    assert seen == set(ma.MUTATIONS)


def test_float_bump_is_one_ulp():
    """The float mutation must be the smallest representable step — it
    proves the canonicalizer compares full float64 precision, not a
    rounded form."""
    ma = _tool()
    pdf = pd.DataFrame({"v": [1.0]})
    bumped = ma._bump_cell(pdf)
    assert bumped is not None
    assert bumped["v"].iloc[0] != 1.0
    assert abs(bumped["v"].iloc[0] - 1.0) < 1e-12


def test_zero_row_frame_yields_only_col_rename():
    ma = _tool()
    pdf = pd.DataFrame({"a": pd.array([], dtype="int64")})
    names = [m for m, _ in ma.mutants(pdf)]
    assert names == ["col_rename"]


@pytest.mark.parametrize("qname", ["o_sort_limit", "a_cube_grand_share"])
def test_live_audit_detects_all_mutations(spark, sf_dir, oracle, qname):
    """End-to-end: run a real query and its oracle, then assert every
    applicable mutation of the Spark result is caught."""
    from iris_pyspark_spark.registry import load_all
    from iris_pyspark_spark.testing import compare_frames

    ma = _tool()
    q = load_all()[qname]
    sp = q.fn(spark, sf_dir).toPandas()
    du = oracle.execute(q.oracle).df()
    assert compare_frames(sp, du).ok
    for mname, mutated in ma.mutants(sp):
        assert not compare_frames(mutated, du).ok, f"{qname}: {mname} undetected"
