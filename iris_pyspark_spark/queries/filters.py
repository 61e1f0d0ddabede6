"""Projection / filter / predicate queries (SURVEY.md §2.2, P1–P7).

All predicates here are Catalyst-pushable: `.explain()` shows them in
PushedFilters at the parquet scan, and column pruning trims ReadSchema
to only the referenced columns — both essential at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "p_project_compute",
    oracle="""
SELECT
  p_partkey,
  UPPER(p_name)              AS name_upper,
  p_retailprice * 0.9        AS discounted_price,
  p_size + 1                 AS size_plus_one
FROM part
""",
    tags=("P1",),
)
def p_project_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        (F.col("p_retailprice") * 0.9).alias("discounted_price"),
        (F.col("p_size") + 1).alias("size_plus_one"),
    )


@register(
    "p_filter_compare_bool",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity, l_discount
FROM lineitem
WHERE (l_quantity < 24 AND l_discount > 0.02)
   OR NOT (l_tax >= 0.01)
""",
    tags=("P2", "P3"),
)
def p_filter_compare_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pred = ((F.col("l_quantity") < 24) & (F.col("l_discount") > 0.02)) | ~(
        F.col("l_tax") >= 0.01
    )
    return li.filter(pred).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")


@register(
    "p_filter_in_between_like",
    oracle="""
SELECT p_partkey, p_name, p_type, p_size
FROM part
WHERE p_type IN ('PROMO', 'ECONOMY')
  AND p_size BETWEEN 10 AND 30
  AND p_name LIKE '%ol%'
""",
    tags=("P4",),
)
def p_filter_in_between_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.filter(
        F.col("p_type").isin("PROMO", "ECONOMY")
        & F.col("p_size").between(10, 30)
        & F.col("p_name").like("%ol%")
    ).select("p_partkey", "p_name", "p_type", "p_size")


@register(
    "p_null_handling",
    oracle="""
SELECT
  COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_norm,
  COUNT(*)                                        AS n,
  CAST(SUM(CASE WHEN NULLIF(o_orderstatus, 'P') IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_was_null
FROM orders
GROUP BY COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING')
""",
    tags=("P5",),
)
def p_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    nulled = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    return (
        orders.select(
            F.coalesce(nulled, F.lit("PENDING")).alias("status_norm"),
            F.when(nulled.isNull(), 1).otherwise(0).alias("was_null"),
        )
        .groupBy("status_norm")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("was_null").alias("n_was_null"))
    )


@register(
    "p_case_when",
    oracle="""
SELECT
  o_orderstatus,
  CASE WHEN o_totalprice > 300000 THEN 'big'
       WHEN o_totalprice > 100000 THEN 'mid'
       ELSE 'small' END AS price_band,
  COUNT(*) AS n
FROM orders
GROUP BY o_orderstatus,
  CASE WHEN o_totalprice > 300000 THEN 'big'
       WHEN o_totalprice > 100000 THEN 'mid'
       ELSE 'small' END
""",
    tags=("P6",),
)
def p_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    band = (
        F.when(F.col("o_totalprice") > 300000, "big")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("small")
        .alias("price_band")
    )
    return orders.groupBy("o_orderstatus", band).agg(F.count(F.lit(1)).alias("n"))


@register(
    "p_distinct",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
    tags=("P7",),
)
def p_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    return customer.select("c_mktsegment", "c_nationkey").distinct()


# --- P3, third wave: exclusive-or of business flags -------------------------

_XOR_ORACLE = """
SELECT o_orderpriority AS priority,
       CAST(SUM(CASE WHEN (o_totalprice > 150000.0) <> (o_orderstatus = 'F')
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_xor,
       CAST(SUM(CASE WHEN o_totalprice > 150000.0 AND o_orderstatus = 'F'
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
       CAST(SUM(CASE WHEN NOT (o_totalprice > 150000.0)
                      AND NOT (o_orderstatus = 'F')
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_neither,
       COUNT(*) AS n
FROM orders
GROUP BY o_orderpriority
ORDER BY priority
"""


@register(
    "p_xor_flag_census",
    oracle=_XOR_ORACLE,
    tags=("P3", "A7", "A1"),
)
def p_xor_flag_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3, third wave: EXCLUSIVE-or of two business predicates — SQL has
    no XOR keyword, so the idiom is boolean inequality (a <> b), which
    Catalyst evaluates branch-free in codegen. The census of XOR / AND /
    NOR cells per priority is the 2x2 contingency audit that precedes
    any flag-correlation analysis; writing all three from the SAME two
    predicates also guards against the classic drift bug where the
    'both' and 'either' reports silently use different thresholds.

    Scale: pure map-side conditional aggregation, one scan, combinable."""
    orders = load_table(spark, sf_dir, "orders")
    big = F.col("o_totalprice") > 150000.0
    fin = F.col("o_orderstatus") == "F"
    return (
        orders.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.sum(F.when(big != fin, 1).otherwise(0)).cast("long").alias(
                "n_xor"
            ),
            F.sum(F.when(big & fin, 1).otherwise(0)).cast("long").alias(
                "n_both"
            ),
            F.sum(F.when((~big) & (~fin), 1).otherwise(0))
            .cast("long")
            .alias("n_neither"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("priority")
    )
