"""Flagship query: TPC-H-Q1-shaped pricing summary (SURVEY.md §7 step 1).

Exercises S1 (parquet scan), P1/P2 (project/filter), A1 (grouped agg),
and is the driver's t1 smoke query via `entry()`.

Scale notes: the filter on `l_shipdate` pushes down to the parquet scan
(PushedFilters), only 9 of 11 columns are read (ReadSchema pruning), and
the aggregation is a partial(map-side)+final hash aggregate — one shuffle
of 6 groups regardless of input size, so the plan is flat-scalable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

_CUTOFF = "1998-09-02"

_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  SUM(l_quantity)                                        AS sum_qty,
  SUM(l_extendedprice)                                   AS sum_base_price,
  SUM(l_extendedprice * (1 - l_discount))                AS sum_disc_price,
  SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax))  AS sum_charge,
  AVG(l_quantity)                                        AS avg_qty,
  AVG(l_extendedprice)                                   AS avg_price,
  AVG(l_discount)                                        AS avg_disc,
  COUNT(*)                                               AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{_CUTOFF} 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("q1_pricing_summary", oracle=_ORACLE, tags=("A1", "P2", "S1"), headline=True)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit(_CUTOFF).cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price).alias("sum_disc_price"),
            F.sum(charge).alias("sum_charge"),
            F.avg("l_quantity").alias("avg_qty"),
            F.avg("l_extendedprice").alias("avg_price"),
            F.avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
