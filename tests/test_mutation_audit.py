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


def test_oracle_mutants_bump_literals_and_vacate_where():
    """The oracle-side mutator must (a) bump standalone numeric literals
    only — never digits inside quoted strings or identifiers — and (b)
    vacate WHERE clauses with a whole-clause `TRUE OR` (OR binds
    loosest, so the original predicate becomes unreachable)."""
    ma = _tool()
    sql = (
        "SELECT o_orderkey AS k17, COUNT(*) AS n FROM orders "
        "WHERE o_orderdate >= DATE '1995-01-01' AND o_totalprice > 100 "
        "GROUP BY o_orderkey HAVING COUNT(*) > 2 LIMIT 10"
    )
    muts = dict(ma.oracle_mutants(sql))
    consts = [v for k, v in muts.items() if k.startswith("const_bump")]
    wheres = [v for k, v in muts.items() if k.startswith("where_vacate")]
    assert len(wheres) == 1 and "WHERE TRUE OR o_orderdate" in wheres[0]
    # literals 100, 2, 10 are bumped; 17 (identifier) and 1995/01/01
    # (inside the date string) are NOT.
    joined = "\n".join(consts)
    assert "o_totalprice > 101" in joined
    assert "COUNT(*) > 3" in joined
    assert "LIMIT 11" in joined
    assert all("k18" not in v for v in consts)
    assert all("1996-01-01" not in v and "'1995" in v for v in consts)


def test_oracle_side_audit_flags_blind_and_inert(sf_dir, oracle):
    """Semantics pin via compare_frames directly: a mutation that CHANGES
    the oracle output must flip the comparison (else comparator-blind);
    a mutation that leaves output identical is the inert-token advisory
    class, not a failure."""
    from iris_pyspark_spark.testing import compare_frames

    ma = _tool()
    sql = (
        "SELECT n_regionkey, CAST(COUNT(*) AS BIGINT) AS n FROM nation "
        "WHERE n_nationkey >= 0 GROUP BY n_regionkey ORDER BY n_regionkey"
    )
    base = oracle.execute(sql).df()
    labels = dict(ma.oracle_mutants(sql))
    # the >= 0 guard is inert (keys start at 0 ... wait, bumping 0 -> 1
    # DROPS nationkey 0): assert the machinery classifies each mutant by
    # actually re-running it, whatever direction it lands.
    for label, msql in labels.items():
        dm = oracle.execute(msql).df()
        changed = not compare_frames(dm, base).ok
        detected = not compare_frames(base, dm).ok
        # compare is symmetric here: changed and detected must agree --
        # the comparator-blind case (changed and not detected) is the
        # hard failure the audit exists to catch.
        assert changed == detected, (label, msql)
