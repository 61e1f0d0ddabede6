"""Gap-based sessionization (SURVEY.md §2.9 T4) as a reusable operator.

Classic two-window formulation, fully inside Catalyst:

    1. lag(ts) per key (ordered by time + tie-break) → gap to previous;
    2. session-start flag = gap IS NULL OR gap > threshold;
    3. running SUM of flags = session number.

One shuffle (partition by key, sort by time); identical to what
Structured Streaming's session windows compute incrementally, so batch
results are stream-parity (queries/streaming_parity.py runs the same query with
`session_window` + watermark).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(
    df: DataFrame,
    key: str,
    ts: str,
    gap_seconds: int,
    tie_break: str | None = None,
    session_col: str = "session_id",
) -> DataFrame:
    """Append `session_col`: 1-based session number per key."""
    order: list[Column] = [F.col(ts)]
    if tie_break:
        order.append(F.col(tie_break))
    w = Window.partitionBy(key).orderBy(*order)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    gap_us = F.unix_micros(F.col(ts).cast("timestamp")) - F.unix_micros(
        F.lag(ts).over(w).cast("timestamp")
    )
    is_start = F.when(
        gap_us.isNull() | (gap_us > gap_seconds * 1_000_000), 1
    ).otherwise(0)
    return df.withColumn(session_col, F.sum(is_start).over(run))
