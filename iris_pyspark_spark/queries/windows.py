"""Window-function queries (SURVEY.md §2.5, W1–W4).

Every window has a total order (explicit tie-break keys) so ranking
output is deterministic; framed double sums run on integer cents so the
frame-accumulation order (incremental in Spark vs segment-tree in other
engines) cannot produce last-ulp drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table, load_tables
from ..registry import register
from .joins import CENTS_SQL, cents


@register(
    "w_topk_per_group",
    oracle="""
SELECT c_mktsegment, rnk, o_orderkey, o_totalprice
FROM (
  SELECT c_mktsegment, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
  FROM orders JOIN customer ON o_custkey = c_custkey
) t
WHERE rnk <= 3
""",
    tags=("W1", "W4"),
    headline=True,
)
def w_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders", "customer"))
    joined = t["orders"].join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        joined.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("c_mktsegment", "rnk", "o_orderkey", "o_totalprice")
    )


@register(
    "w_rank_dense_ntile",
    oracle="""
SELECT p_type, p_partkey, p_retailprice,
       RANK()       OVER (PARTITION BY p_type ORDER BY p_retailprice DESC, p_partkey) AS price_rank,
       DENSE_RANK() OVER (PARTITION BY p_type ORDER BY p_size) AS size_dense_rank,
       NTILE(4)     OVER (PARTITION BY p_type ORDER BY p_retailprice, p_partkey) AS price_quartile
FROM part
""",
    tags=("W1",),
)
def w_rank_dense_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    by_price_desc = Window.partitionBy("p_type").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey")
    )
    by_size = Window.partitionBy("p_type").orderBy("p_size")
    by_price = Window.partitionBy("p_type").orderBy("p_retailprice", "p_partkey")
    return part.select(
        "p_type",
        "p_partkey",
        "p_retailprice",
        F.rank().over(by_price_desc).alias("price_rank"),
        F.dense_rank().over(by_size).alias("size_dense_rank"),
        F.ntile(4).over(by_price).alias("price_quartile"),
    )


@register(
    "w_lag_lead_gap",
    oracle="""
SELECT event_id, user_id,
       EPOCH_US(ts) - EPOCH_US(LAG(ts)  OVER w) AS gap_us,
       LEAD(event_type) OVER w                  AS next_type,
       FIRST_VALUE(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_event
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
    tags=("W2",),
)
def w_lag_lead_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    prev_us = F.unix_micros(F.lag("ts").over(w).cast("timestamp"))
    return events.select(
        "event_id",
        "user_id",
        (us - prev_us).alias("gap_us"),
        F.lead("event_type").over(w).alias("next_type"),
        F.first("event_id").over(wf).alias("first_event"),
    )


@register(
    "w_running_sum",
    oracle=f"""
SELECT o_custkey, o_orderkey,
       SUM({CENTS_SQL.format(expr="o_totalprice")})
         OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0 AS running_total
FROM orders
""",
    tags=("W3",),
)
def w_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        (F.sum(cents(F.col("o_totalprice"))).over(w) / 100.0).alias("running_total"),
    )


@register(
    "w_moving_avg",
    oracle=f"""
SELECT event_id, user_id,
       SUM({CENTS_SQL.format(expr="value")})
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
       / 100.0
       / COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS moving_avg
FROM events
WHERE event_type = 'purchase'
""",
    tags=("W3",),
)
def w_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    return events.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        (
            F.sum(cents(F.col("value"))).over(w) / 100.0 / F.count(F.lit(1)).over(w)
        ).alias("moving_avg"),
    )


_DIST_ORACLE = """
SELECT o_orderkey,
       o_orderpriority,
       ROUND(PERCENT_RANK() OVER w, 9) AS pct_rank,
       ROUND(CUME_DIST()   OVER w, 9)  AS cume,
       NTILE(4)            OVER w      AS quartile
FROM orders
WHERE o_orderkey % 100 = 0
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
"""


@register("w_distribution_funcs", oracle=_DIST_ORACLE, tags=("W1",))
def w_distribution_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist / ntile — distribution window functions
    (rounded to 9 decimals: both engines compute k/n with identical
    integer inputs, rounding shields the division's last ulp)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.percent_rank().over(w), 9).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 9).alias("cume"),
        F.ntile(4).over(w).alias("quartile"),
    )


_RANGE_INTERVAL_ORACLE = """
SELECT o_orderkey, o_custkey,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate
         RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS trailing_30d_cents
FROM orders
WHERE o_custkey < 100
"""


@register("w_range_interval_frame", oracle=_RANGE_INTERVAL_ORACLE, tags=("W3",))
def w_range_interval_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over event time (trailing 30-day spend per customer):
    the frame is defined by VALUE distance, not row count — ties and
    gaps in order time are handled identically on both engines. Spark's
    rangeBetween needs a numeric ordering column, so the frame runs over
    epoch seconds with the same +-window."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    epoch = F.unix_seconds(F.col("o_orderdate").cast("timestamp"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(epoch)
        .rangeBetween(-30 * 86400, 0)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
        .over(w)
        .alias("trailing_30d_cents"),
    )


@register(
    "w_first_last_nth",
    oracle="""
SELECT o_orderkey, o_custkey,
       FIRST_VALUE(o_orderkey) OVER w AS first_order,
       LAST_VALUE(o_orderkey)  OVER w AS last_order,
       NTH_VALUE(o_orderkey, 2) OVER w AS second_order,
       COUNT(*) OVER w AS n_orders
FROM orders
WHERE o_custkey < 200
WINDOW w AS (
  PARTITION BY o_custkey
  ORDER BY o_orderdate, o_orderkey
  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
)
""",
    tags=("W1", "W3"),
)
def w_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value/nth_value over an explicit full-partition
    frame. The UNBOUNDED FOLLOWING frame is the point: the default frame
    stops at CURRENT ROW, which silently makes last_value ≡ current row —
    a classic cross-engine semantics trap, pinned here identically on
    both engines. Total order (date, key) makes nth deterministic."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 200)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w).alias("last_order"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_order"),
        F.count(F.lit(1)).over(w).alias("n_orders"),
    )


# --- SCD type-2 validity ranges ---------------------------------------------

_SCD2_ORACLE = """
SELECT o_custkey, o_orderkey,
       o_orderdate                             AS valid_from,
       LEAD(o_orderdate) OVER w                AS valid_to,
       LEAD(o_orderdate) OVER w IS NULL        AS is_current,
       o_orderstatus                           AS status
FROM orders
WHERE o_custkey <= 200
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


@register("w_scd2_ranges", oracle=_SCD2_ORACLE, tags=("W2", "F2"))
def w_scd2_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 build: each order event becomes
    a validity interval [valid_from, valid_to) via lead() over the
    per-customer event sequence; the open interval (lead is NULL) is
    the current row. One shuffle on the dimension key — the standard
    warehouse pattern for turning a change log into point-in-time
    joinable history, and the interval table then feeds range/as-of
    joins (J7/J8) downstream."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 200)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    nxt = F.lead("o_orderdate").over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
        F.col("o_orderstatus").alias("status"),
    )


# --- gaps & islands: activity streaks ---------------------------------------

_STREAK_ORACLE = """
WITH days AS (
  SELECT DISTINCT user_id,
         DATE_DIFF('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d
  FROM events
),
islands AS (
  SELECT user_id, d,
         d - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS island
  FROM days
),
streaks AS (
  SELECT user_id, island, COUNT(*) AS streak_len, MIN(d) AS start_d
  FROM islands GROUP BY user_id, island
)
SELECT user_id,
       COUNT(*)                   AS n_streaks,
       CAST(MAX(streak_len) AS BIGINT) AS longest_streak,
       CAST(MIN(start_d) AS BIGINT)    AS first_active_day
FROM streaks GROUP BY user_id
"""


@register("w_gaps_islands_streaks", oracle=_STREAK_ORACLE, tags=("W1", "W2", "A1"))
def w_gaps_islands_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: consecutive-day activity streaks per user via
    the classic `day - row_number()` trick — consecutive days share one
    island id, so streak detection becomes a plain groupBy instead of a
    sequential scan. Everything rides ONE hash(user_id) partitioning:
    distinct, window, and both aggregations — no re-shuffle, no
    stateful iteration, which is what makes streak analytics feasible
    on billions of users."""
    e = load_table(spark, sf_dir, "events").select("user_id", "ts")
    days = e.select(
        "user_id",
        F.datediff(
            F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
        ).alias("d"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    islands = days.withColumn("island", F.col("d") - F.row_number().over(w))
    streaks = islands.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("streak_len"), F.min("d").alias("start_d")
    )
    return streaks.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_streaks"),
        F.max("streak_len").cast("long").alias("longest_streak"),
        F.min("start_d").cast("long").alias("first_active_day"),
    )


# --- month-over-month change on an aggregated series ------------------------

_MOM_ORACLE = """
WITH monthly AS (
  SELECT o_orderpriority,
         STRFTIME(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS revenue_cents
  FROM orders
  GROUP BY o_orderpriority, month
)
SELECT o_orderpriority, month, revenue_cents,
       LAG(revenue_cents) OVER w AS prev_cents,
       ROUND((revenue_cents - LAG(revenue_cents) OVER w)
             / CAST(LAG(revenue_cents) OVER w AS DOUBLE), 6) AS mom_change
FROM monthly
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY month)
"""


@register("w_mom_change", oracle=_MOM_ORACLE, tags=("W2", "A1", "F2"))
def w_mom_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue change per priority tier: aggregate to
    the monthly series (integer cents — the series must be exact before
    ratios touch it), then lag() for the previous month and one rounded
    division. The window runs over the months-x-tiers series, not the
    fact table — aggregate first, window second is the order that
    scales."""
    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        "o_orderpriority",
        F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM").alias("month"),
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("revenue_cents")
    )
    w = Window.partitionBy("o_orderpriority").orderBy("month")
    prev = F.lag("revenue_cents").over(w)
    return monthly.select(
        "o_orderpriority",
        "month",
        "revenue_cents",
        prev.alias("prev_cents"),
        F.round((F.col("revenue_cents") - prev) / prev.cast("double"), 6).alias(
            "mom_change"
        ),
    )


_FFILL_ORACLE = """
WITH gappy AS (
  SELECT user_id, event_id, ts,
         CASE WHEN event_id % 3 = 0 THEN NULL ELSE value END AS v
  FROM events
)
SELECT user_id, event_id,
       v,
       LAST_VALUE(v IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS v_filled
FROM gappy
"""


@register("w_forward_fill", oracle=_FFILL_ORACLE, tags=("W2", "W3", "P5"))
def w_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward fill (last observation carried forward): nulls are
    planted in every third event's value, then each row takes the most
    recent non-null per user — `last(..., ignorenulls=True)` over a
    running frame, the standard gap-filling operator for sensor and
    telemetry streams. Values pass through untouched (no arithmetic),
    so floats compare bit-exactly; rows before a user's first non-null
    stay NULL on both engines. One shuffle on user_id, shared by the
    window sort."""
    e = load_table(spark, sf_dir, "events")
    gappy = e.select(
        "user_id",
        "event_id",
        "ts",
        F.when(F.col("event_id") % 3 == 0, F.lit(None)).otherwise(
            F.col("value")
        ).alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return gappy.select(
        "user_id",
        "event_id",
        "v",
        F.last("v", ignorenulls=True).over(w).alias("v_filled"),
    )


# ---------------------------------------------------------------------------
# Pareto frontier (2-D skyline) via a single running-min window
# ---------------------------------------------------------------------------

_SKYLINE_ORACLE = """
WITH pts AS (
  SELECT CAST(ROUND(p_retailprice * 100) AS BIGINT) AS price_cents,
         p_size AS size,
         COUNT(*) AS n_parts
  FROM part
  GROUP BY 1, 2
),
flagged AS (
  SELECT price_cents, size, n_parts,
         MIN(size) OVER (ORDER BY price_cents, size
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS min_size_before
  FROM pts
)
SELECT price_cents, size, n_parts
FROM flagged
WHERE min_size_before IS NULL OR size < min_size_before
ORDER BY price_cents, size
"""


@register(
    "w_pareto_skyline",
    oracle=_SKYLINE_ORACLE,
    tags=("W3", "O1", "P2", "A1"),
)
def w_pareto_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline / Pareto-frontier query: the parts not dominated on
    (price, size) — no other part is at-most-equal on both axes and
    strictly better on one. The classic multi-criteria operator
    (cheapest-and-smallest tradeoff set) that naive SQL writes as a
    NOT EXISTS self-join — O(n²). Here it is the sort-scan algorithm:
    after deduplicating to distinct points, sort by (price, size) and
    keep a point iff its size is STRICTLY below the running minimum of
    everything sorted before it — one window, provably equivalent to
    2-D dominance (earlier rows have price ≤ current; ties on price
    sort smaller-size first and eliminate larger; duplicates collapse
    in the dedup).

    Scale: the heavy pass is the combinable groupBy to distinct
    (price, size) points — bounded by the ATTRIBUTE grid, not row
    count; only that compact point set enters the ordered window.
    Exact integer cents/sizes throughout."""
    p = load_table(spark, sf_dir, "part")
    pts = p.groupBy(
        cents(F.col("p_retailprice")).alias("price_cents"),
        F.col("p_size").alias("size"),
    ).agg(F.count(F.lit(1)).alias("n_parts"))
    w = (
        Window.orderBy("price_cents", "size")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = pts.withColumn("min_size_before", F.min("size").over(w))
    return (
        flagged.filter(
            F.col("min_size_before").isNull()
            | (F.col("size") < F.col("min_size_before"))
        )
        .select("price_cents", "size", "n_parts")
        .orderBy("price_cents", "size")
    )
