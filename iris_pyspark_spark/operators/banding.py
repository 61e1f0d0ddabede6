"""Banded range self-join: |value_a - value_b| <= band as an EQUI join.

The naive theta self-join is O(n^2) comparisons and cannot be
hash-partitioned. Banding rewrites it: bucket = trunc(value / band),
each left row probes buckets {b-1, b, b+1}, the join becomes a pure
equi join on (group, bucket), and the exact band predicate filters the
~3x candidate set. Work is O(sum of bucket-pair populations), skew is
bounded by bucket occupancy, and every comparison within the band is
still found:

  CORRECTNESS ARGUMENT (incl. negative values): Spark's long cast
  truncates toward zero, not floor — but trunc is still a
  non-decreasing step function whose breakpoints are multiples of
  `band` (the zero bucket merges (-band, band) into one wide step;
  merging never splits). Consecutive breakpoints are >= band apart,
  so two values within `band` of each other straddle at most ONE
  breakpoint and their buckets differ by at most 1 — always inside
  the +/-1 probe set. Each qualifying pair is emitted exactly once
  because the right side has a single bucket per row and the probe
  list is distinct.

Pinned by tests/test_properties.py against the naive O(n^2) join on
randomized values (negatives and exact band-boundary diffs included).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def banded_abs_diff_pairs(
    df: DataFrame,
    id_col: str,
    group_col: str,
    val_col: str,
    band: int,
) -> DataFrame:
    """All (id_a < id_b) pairs within a group whose integer `val_col`
    values differ by at most `band`. Output: group_col, id_a, id_b,
    diff (= |val_a - val_b|)."""
    s = df.select(id_col, group_col, val_col)
    bucket = (F.col(val_col) / band).cast("long")
    left = s.withColumn(
        "__probe_bucket", F.explode(F.array(bucket - 1, bucket, bucket + 1))
    )
    right = s.withColumn("__bucket", bucket)
    pairs = left.alias("a").join(
        right.alias("b"),
        (F.col(f"a.{group_col}") == F.col(f"b.{group_col}"))
        & (F.col("a.__probe_bucket") == F.col("b.__bucket"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    )
    return (
        pairs.select(
            F.col(f"a.{group_col}").alias(group_col),
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.abs(F.col(f"a.{val_col}") - F.col(f"b.{val_col}")).alias("diff"),
        )
        .filter(F.col("diff") <= band)
    )
