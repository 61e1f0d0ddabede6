"""Tolerance self-checks for the approximate (rows-only) aggregates.

`a_approx_count_distinct` and `a_hll_sketch_mergeable` have no DuckDB
oracle by design (HLL estimates are library-specific), so the driver
records only a rows-only check. These tests give them a real accuracy
gate: the estimate must sit within the sketch's probabilistic error
bound of the exact answer (3·rsd ≈ 3 standard deviations — a
deterministic pass for Spark's seed-fixed datasketches build).

Results come from the shared session-scoped `query_result` cache: the
same query executions test_correctness already ran, not re-runs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from iris_pyspark_spark.catalog import load_table

SF_DIR = "/root/testdata/sf0.01"


def test_approx_count_distinct_within_3_rsd(query_result):
    _, pdf = query_result("a_approx_count_distinct")
    assert len(pdf)
    for r in pdf.itertuples():
        rel_err = abs(r.approx_parts - r.exact_parts) / max(r.exact_parts, 1)
        assert rel_err <= 3 * 0.02, (  # 3·rsd, rsd=0.02 in the query
            f"{r.l_returnflag}: approx={r.approx_parts} exact={r.exact_parts} "
            f"rel_err={rel_err:.4f} > 3·rsd"
        )


def test_approx_percentile_within_accuracy(query_result):
    """percentile_approx's error bound is 1/accuracy in RANK space:
    the estimate must be an actual data value whose rank is within
    n/accuracy of the target rank. With accuracy=10000 and n << 10000
    at this SF the estimate should be exact; allow a tiny value slack."""
    _, pdf = query_result("a_approx_percentile")
    assert len(pdf)
    for r in pdf.itertuples():
        for approx, exact in [
            (r.p25_approx, r.p25_exact),
            (r.p50_approx, r.p50_exact),
            (r.p95_approx, r.p95_exact),
        ]:
            rel = abs(approx - exact) / max(abs(exact), 1.0)
            assert rel <= 0.01, (
                f"{r.l_returnflag}: approx={approx} exact={exact} rel={rel:.4f}"
            )


def test_hll_sketch_estimate_within_3pct(spark, query_result):
    _, pdf = query_result("a_hll_sketch_mergeable")
    got = pdf.iloc[0]
    exact = (
        load_table(spark, SF_DIR, "documents")
        .agg(F.countDistinct("text").alias("n"))
        .collect()[0]
        .n
    )
    # Default lgConfigK=12 → rsd ≈ 1.04/sqrt(2^12) ≈ 1.6%; 3σ ≈ 4.9%.
    rel_err = abs(got.approx_distinct_texts - exact) / max(exact, 1)
    assert rel_err <= 0.05, (
        f"HLL estimate {got.approx_distinct_texts} vs exact {exact}: "
        f"rel_err={rel_err:.4f}"
    )
    assert got.n_docs_total == load_table(spark, SF_DIR, "documents").count()
