"""Scalable global row-id assignment (the zipWithIndex problem).

A naive `row_number() OVER (ORDER BY ...)` with no PARTITION BY is a
single-reducer total sort — every row funnels through one task, the
canonical scale-killer. The classic distributed rewrite is two-level:

  1. pick a bucket column that is MONOTONE in the target order (a date,
     a shard key, a range bucket — here the leading order column);
  2. count rows per bucket (tiny aggregate, one row per bucket);
  3. prefix-sum those counts into per-bucket offsets — the only
     single-reducer window runs over |buckets| rows, not |rows|;
  4. broadcast the offsets back and add a per-bucket row_number, which
     parallelizes across buckets.

Result: ids identical to the global row_number, but the big data only
ever shuffles on the bucket key. Same shape as RDD zipWithIndex's
count-then-offset two-pass, expressed declaratively so Catalyst keeps
pushdown/pruning around it.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def global_ids(
    df: DataFrame,
    bucket_col: str,
    order_cols: Sequence[str],
    id_col: str = "global_id",
) -> DataFrame:
    """Add `id_col` = 1-based rank of the row under the total order
    (bucket_col, *order_cols), without a global single-reducer sort.

    `bucket_col` is the leading sort key AND the parallelism unit: rows
    shuffle once on it, and each bucket numbers its rows independently
    on top of a precomputed offset. (bucket_col, *order_cols) must be
    unique per row for the ids to be deterministic, and `bucket_col`
    must be non-null: the offsets come back via an equi-join, and a
    NULL bucket would silently drop its rows there (null != null).
    """
    counts = df.groupBy(bucket_col).agg(F.count(F.lit(1)).alias("__n"))
    # Prefix-sum over one-row-per-bucket: |buckets| rows through a single
    # reducer is fine (20 sources / 365 dates / 4096 range buckets).
    w_off = (
        Window.orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        bucket_col,
        F.coalesce(F.sum("__n").over(w_off), F.lit(0)).alias("__offset"),
    )
    w_local = Window.partitionBy(bucket_col).orderBy(*order_cols)
    return (
        df.join(F.broadcast(offsets), bucket_col)
        .withColumn(id_col, F.col("__offset") + F.row_number().over(w_local))
        .drop("__offset")
    )
