"""As-of join (SURVEY.md §2.3 J8) — no native Spark primitive.

Implemented as the union-tag + running `last(ignorenulls)` rewrite:

    1. Tag left rows 1, right rows 0, align both on a common time col.
    2. Union by name (missing columns null-filled).
    3. Per key, order by (time, tag) — tag 0 first so a right row at
       exactly the left row's time is visible ("at-or-before").
    4. Carry right-side values forward with last(..., ignorenulls=True)
       over an unbounded-preceding row frame.
    5. Keep only left rows.

Scale rationale: this is ONE shuffle (partition by key, sort by time)
over |L|+|R| rows — the plan a dedicated as-of operator would produce —
instead of a per-row range probe (O(|L|·|R|) nested loop) or an
exploding range join. Skewed keys are handled by AQE like any other
sort/window.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_TIME = "__asof_t"
_TAG = "__asof_is_left"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_time: str,
    right_time: str,
) -> DataFrame:
    """For each left row, attach the right row's carried columns from the
    latest right event at-or-before the left row's time (backward as-of).

    Columns of `right` other than the keys become the carried values; if
    several right rows share one exact timestamp for a key, which of them
    is carried is unspecified (their `right_time` value is identical, so
    carrying only `right_time` is always deterministic).
    """
    on_cols = [on] if isinstance(on, str) else list(on)
    carry = [c for c in right.columns if c not in on_cols]
    overlap = (set(left.columns) - set(on_cols)) & set(carry)
    if overlap:
        # A shared non-key name would let LEFT rows' own values enter the
        # last(ignorenulls) carry chain — silently wrong results. Make the
        # caller rename instead.
        raise ValueError(
            f"asof_join: left and right share non-key column(s) {sorted(overlap)}; "
            "rename the right-side columns before joining"
        )

    lhs = left.withColumn(_TIME, F.col(left_time)).withColumn(_TAG, F.lit(1))
    rhs = right.withColumn(_TIME, F.col(right_time)).withColumn(_TAG, F.lit(0))
    unioned = lhs.unionByName(rhs, allowMissingColumns=True)

    w = (
        Window.partitionBy(*[F.col(c) for c in on_cols])
        .orderBy(F.col(_TIME).asc(), F.col(_TAG).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled: list[Column] = [
        F.last(F.col(c), ignorenulls=True).over(w).alias(c) if c in carry else F.col(c)
        for c in unioned.columns
    ]
    return unioned.select(*filled).filter(F.col(_TAG) == 1).drop(_TIME, _TAG)
