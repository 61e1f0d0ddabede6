"""Event-time windowing over `events` (SURVEY.md §2.9, T1–T7).

Batch-first: each op is a batch DataFrame query whose window semantics
match Structured Streaming's exactly (same `window`/`session_window`
expressions), so the streaming re-run in queries/streaming_parity.py produces the
same frames. Correctness is oracle-checked here in batch.

Window boundaries are emitted as epoch seconds (BIGINT) — integer math
on both engines, immune to timestamp-representation drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from ..registry import register
from .joins import CENTS_SQL, cents


@register(
    "t_tumbling_window",
    oracle=f"""
SELECT
  (CAST(FLOOR(EPOCH(ts) / 3600) AS BIGINT)) * 3600 AS window_start_epoch,
  event_type,
  COUNT(*) AS n,
  SUM({CENTS_SQL.format(expr="value")}) / 100.0 AS total_value
FROM events
GROUP BY 1, 2
""",
    tags=("T1",),
    headline=True,
)
def t_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy(window(ts, '1 hour')) — the same expression Structured
    Streaming runs incrementally with a watermark."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(cents(F.col("value"))) / 100.0).alias("total_value"),
        )
        .select(
            F.unix_seconds(F.col("window.start").cast("timestamp")).alias(
                "window_start_epoch"
            ),
            "event_type",
            "n",
            "total_value",
        )
    )


@register(
    "t_sliding_window",
    oracle="""
WITH offsets AS (SELECT UNNEST([0, 1, 2, 3]) AS j)
SELECT
  CAST(FLOOR(EPOCH(ts) / 900) AS BIGINT) * 900 - j * 900 AS window_start_epoch,
  COUNT(*) AS n
FROM events, offsets
GROUP BY 1
""",
    tags=("T2",),
)
def t_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 15 min: each event lands in 4 windows.
    The oracle states the same assignment with integer epoch math."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "15 minutes"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.unix_seconds(F.col("window.start").cast("timestamp")).alias(
                "window_start_epoch"
            ),
            "n",
        )
    )


_SESSION_ORACLE = """
WITH flagged AS (
  SELECT
    user_id, ts, value,
    CASE WHEN LAG(ts) OVER w IS NULL
           OR EPOCH_US(ts) - EPOCH_US(LAG(ts) OVER w) > 1800 * 1000000
         THEN 1 ELSE 0 END AS is_start
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT
    user_id, ts, value,
    CAST(SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      AS session_id
  FROM flagged
)
SELECT
  user_id,
  session_id,
  COUNT(*) AS n_events,
  EPOCH_US(MIN(ts)) // 1000000 AS session_start_epoch,
  EPOCH_US(MAX(ts)) // 1000000 AS session_end_epoch
FROM sessions
GROUP BY user_id, session_id
"""


@register("t_sessionize_gap", oracle=_SESSION_ORACLE, tags=("T4",), headline=True)
def t_sessionize_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit gap-based sessionization (30-min gap) via the reusable
    operator; the oracle is the identical two-window SQL."""
    from ..operators.sessionize import sessionize

    e = load_table(spark, sf_dir, "events")
    s = sessionize(e, key="user_id", ts="ts", gap_seconds=1800, tie_break="event_id")
    return s.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.unix_seconds(F.min("ts").cast("timestamp")).alias("session_start_epoch"),
        F.unix_seconds(F.max("ts").cast("timestamp")).alias("session_end_epoch"),
    )


@register(
    "t_session_window_native",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts,
    CASE WHEN LAG(ts) OVER w IS NULL
           OR EPOCH_US(ts) - EPOCH_US(LAG(ts) OVER w) > 1800 * 1000000
         THEN 1 ELSE 0 END AS is_start
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, ts,
    SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged
)
SELECT
  user_id,
  EPOCH_US(MIN(ts)) // 1000000          AS session_start_epoch,
  EPOCH_US(MAX(ts)) // 1000000 + 1800   AS session_end_epoch,
  COUNT(*)                              AS n_events
FROM sessions
GROUP BY user_id, sid
""",
    tags=("T3",),
)
def t_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session_window(ts, '30 minutes'): window.end is last event
    + gap, which the oracle states explicitly (DuckDB has no session
    windows — SURVEY.md §7 'hard parts')."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_seconds(F.col("session_window.start").cast("timestamp")).alias(
                "session_start_epoch"
            ),
            F.unix_seconds(F.col("session_window.end").cast("timestamp")).alias(
                "session_end_epoch"
            ),
            "n_events",
        )
    )


@register(
    "t_dedup_by_key",
    oracle="""
SELECT event_id, user_id, event_type FROM (
  SELECT * FROM events UNION ALL SELECT * FROM events
) t
GROUP BY event_id, user_id, event_type
""",
    tags=("T7", "P7"),
)
def t_dedup_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch form of streaming dropDuplicates: duplicate the stream, then
    dedup by key. (Streaming parity: dropDuplicatesWithinWatermark in
    queries/streaming_parity.py.)"""
    e = load_table(spark, sf_dir, "events")
    doubled = e.unionByName(e)
    return doubled.dropDuplicates(["event_id"]).select(
        "event_id", "user_id", "event_type"
    )


@register(
    "t_stream_static_join",
    oracle=f"""
SELECT
  c_mktsegment,
  COUNT(*) AS n_events,
  SUM({CENTS_SQL.format(expr="value")}) / 100.0 AS total_value
FROM events JOIN customer ON user_id = c_custkey
WHERE event_type = 'purchase'
GROUP BY c_mktsegment
""",
    tags=("T6",),
)
def t_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch form of the stream-static enrichment join. No broadcast
    hint: customer grows with SF, so the join strategy is left to
    Catalyst/AQE (broadcasts under the threshold at test scale,
    shuffle-joins beyond it)."""
    e = load_table(spark, sf_dir, "events")
    c = load_table(spark, sf_dir, "customer")
    return (
        e.filter(F.col("event_type") == "purchase")
        .join(c, F.col("user_id") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(cents(F.col("value"))) / 100.0).alias("total_value"),
        )
    )


_ROLLUP_ORACLE = f"""
SELECT
  CAST(FLOOR(EPOCH(ts) / 86400) AS BIGINT) * 86400 AS day_epoch,
  event_type,
  COUNT(*) AS n,
  SUM({CENTS_SQL.format(expr="value")}) / 100.0 AS total_value
FROM events
GROUP BY 1, 2
"""


@register("t_rollup_from_materialized", oracle=_ROLLUP_ORACLE, tags=("T1", "A1"))
def t_rollup_from_materialized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate pattern: the hourly rollup is materialized
    once (parquet artifact), and the daily answer re-aggregates the
    rollup instead of the raw events — aggregate-of-aggregate, exact for
    the algebraic aggregates used (counts and integer-cents sums compose
    associatively; the oracle computes the same daily truth from raw).
    At 100 TB the rollup is what dashboards read; raw is scanned once
    per refresh, not once per query."""
    from ..sources import scratch_dir

    e = load_table(spark, sf_dir, "events")
    hourly_path = scratch_dir(sf_dir, "events_hourly_rollup")
    hourly = (
        e.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(cents(F.col("value"))).alias("value_cents"),
        )
        .select(
            F.unix_seconds(F.col("window.start").cast("timestamp")).alias("hour_epoch"),
            "event_type",
            "n",
            "value_cents",
        )
    )
    hourly.write.mode("overwrite").parquet(hourly_path)

    rolled = spark.read.parquet(hourly_path)
    return (
        rolled.groupBy(
            (F.floor(F.col("hour_epoch") / 86400) * 86400).alias("day_epoch"),
            "event_type",
        )
        .agg(
            F.sum("n").alias("n"),
            (F.sum("value_cents") / 100.0).alias("total_value"),
        )
    )


# --- OHLC bars (first/last/min/max per window) ------------------------------

_OHLC_ORACLE = f"""
WITH keyed AS (
  SELECT event_type,
         (CAST(FLOOR(EPOCH(ts) / 21600) AS BIGINT)) * 21600 AS bar_start,
         ts, event_id, value
  FROM events
)
SELECT event_type, bar_start,
       MIN_BY(value, (EPOCH(ts) * 1000000 + event_id)) AS open,
       MAX_BY(value, (EPOCH(ts) * 1000000 + event_id)) AS close,
       MIN(value)  AS low,
       MAX(value)  AS high,
       COUNT(*)    AS n_ticks
FROM keyed
GROUP BY event_type, bar_start
"""


@register("t_ohlc_bars", oracle=_OHLC_ORACLE, tags=("T1", "A1", "W1"))
def t_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC bars: open/high/low/close per 6-hour window per series — the
    canonical time-series downsampling. Open/close are min_by/max_by on
    a COMPOSITE (epoch-micros, event_id) key: ts alone can tie, and a
    tied min_by is engine-arbitrary — the tie-break is what makes the
    bars deterministic. Single aggregation, map-side partial combine;
    the bar table is windows x series sized."""
    e = load_table(spark, sf_dir, "events")
    bar = (F.floor(F.unix_timestamp("ts") / 21600) * 21600).cast("long")
    order_key = F.unix_timestamp("ts") * 1000000 + F.col("event_id")
    return e.groupBy("event_type", bar.alias("bar_start")).agg(
        F.min_by("value", order_key).alias("open"),
        F.max_by("value", order_key).alias("close"),
        F.min("value").alias("low"),
        F.max("value").alias("high"),
        F.count(F.lit(1)).alias("n_ticks"),
    )


# --- session metrics (composed on the sessionize operator) ------------------

_SESSION_METRICS_ORACLE = """
WITH flagged AS (
  SELECT user_id, ts, event_id,
    CASE WHEN LAG(ts) OVER w IS NULL
           OR EPOCH_US(ts) - EPOCH_US(LAG(ts) OVER w) > 1800 * 1000000
         THEN 1 ELSE 0 END AS is_start
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, ts,
    CAST(SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      AS session_id
  FROM flagged
),
per_session AS (
  SELECT user_id, session_id,
         COUNT(*) AS n_events,
         (EPOCH_US(MAX(ts)) - EPOCH_US(MIN(ts))) // 1000000 AS dur_s
  FROM sessions GROUP BY user_id, session_id
)
SELECT user_id,
       COUNT(*)                          AS n_sessions,
       CAST(SUM(n_events) AS BIGINT)     AS total_events,
       CAST(MAX(n_events) AS BIGINT)     AS max_session_events,
       CAST(MAX(dur_s) AS BIGINT)        AS max_session_dur_s,
       CAST(FLOOR(SUM(dur_s) / CAST(COUNT(*) AS DOUBLE)) AS BIGINT)
                                         AS avg_session_dur_s
FROM per_session
GROUP BY user_id
"""


@register("t_session_metrics", oracle=_SESSION_METRICS_ORACLE, tags=("T4", "A1", "W3"))
def t_session_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-level engagement metrics composed ON the sessionize
    operator (not re-derived): per user, session counts, size and
    duration extremes, and average duration — floor-divided because
    long-cast semantics differ between engines (Spark truncates, DuckDB
    rounds). The sessionize window, the per-session aggregate, and the
    per-user rollup all ride one hash(user_id) partitioning."""
    from ..operators.sessionize import sessionize

    e = load_table(spark, sf_dir, "events")
    sess = sessionize(
        e, key="user_id", ts="ts", gap_seconds=1800, tie_break="event_id"
    )
    per_session = sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.floor(
            (F.unix_micros(F.max("ts").cast("timestamp"))
             - F.unix_micros(F.min("ts").cast("timestamp"))) / 1000000
        ).alias("dur_s"),
    )
    return per_session.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_events").cast("long").alias("total_events"),
        F.max("n_events").cast("long").alias("max_session_events"),
        F.max("dur_s").cast("long").alias("max_session_dur_s"),
        F.floor(F.sum("dur_s") / F.count(F.lit(1)).cast("double"))
        .cast("long")
        .alias("avg_session_dur_s"),
    )


_TWAP_ORACLE = f"""
WITH spans AS (
  SELECT user_id,
         {CENTS_SQL.format(expr="value")} AS cents,
         EPOCH_US(LEAD(ts) OVER w) // 1000000 - EPOCH_US(ts) // 1000000 AS dur_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id,
       CAST(SUM(cents * dur_s) AS BIGINT)  AS weighted_cents_s,
       CAST(SUM(dur_s) AS BIGINT)          AS total_s,
       CAST(FLOOR(SUM(cents * dur_s) / CAST(SUM(dur_s) AS DOUBLE)) AS BIGINT)
         AS twap_cents
FROM spans
WHERE dur_s IS NOT NULL AND dur_s > 0
GROUP BY user_id
"""


@register("t_time_weighted_avg", oracle=_TWAP_ORACLE, tags=("T4", "W2", "F2"))
def t_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average (TWAP): each observation holds until the
    next one, so its weight is the span it was current — lead(ts) - ts
    per user. The financial/telemetry mean that a plain AVG gets wrong
    whenever sampling is irregular. Integer arithmetic throughout
    (cents x whole seconds, capped well under int64), single user_id
    shuffle shared by the window and the aggregate; zero-length spans
    (same-second ticks) drop on both engines."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    spans = e.select(
        "user_id",
        cents(F.col("value")).alias("cents"),
        (
            F.floor(F.unix_micros(F.lead("ts").over(w).cast("timestamp")) / 1000000)
            - F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 1000000)
        ).alias("dur_s"),
    )
    kept = spans.filter(F.col("dur_s").isNotNull() & (F.col("dur_s") > 0))
    return kept.groupBy("user_id").agg(
        F.sum(F.col("cents") * F.col("dur_s")).cast("long").alias("weighted_cents_s"),
        F.sum("dur_s").cast("long").alias("total_s"),
        F.floor(
            F.sum(F.col("cents") * F.col("dur_s"))
            / F.sum("dur_s").cast("double")
        )
        .cast("long")
        .alias("twap_cents"),
    )


# --- T2+T3: sliding windows vs session windows, per user --------------------

_SLIDING_SESSION_ORACLE = """
WITH offsets AS (SELECT UNNEST([0, 1]) AS j),
slide AS (
  SELECT user_id,
         COUNT(DISTINCT CAST(FLOOR(EPOCH(ts) / 1800) AS BIGINT) * 1800 - j * 1800)
           AS n_slide_windows
  FROM events CROSS JOIN offsets
  GROUP BY user_id
),
flagged AS (
  SELECT user_id, ts,
    CASE WHEN LAG(ts) OVER w IS NULL
           OR EPOCH_US(ts) - EPOCH_US(LAG(ts) OVER w) > 1800 * 1000000
         THEN 1 ELSE 0 END AS is_start
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, ts,
    SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged
),
sess AS (
  SELECT user_id,
         CAST(COUNT(DISTINCT sid) AS BIGINT) AS n_sessions,
         CAST(MAX(n_events) AS BIGINT)       AS max_session_events
  FROM (SELECT user_id, sid, COUNT(*) AS n_events
        FROM sessions GROUP BY user_id, sid)
  GROUP BY user_id
)
SELECT s.user_id, s.n_slide_windows, e.n_sessions, e.max_session_events
FROM slide s JOIN sess e ON s.user_id = e.user_id
"""


@register(
    "t_sliding_session_compare",
    oracle=_SLIDING_SESSION_ORACLE,
    tags=("T2", "T3"),
)
def t_sliding_session_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user activity seen two ways in one result: how many 1-hour
    windows sliding every 30 min the user touched (T2 — window() with a
    slide), and how many native 30-min-gap session windows their events
    form (T3 — session_window()), plus the largest session. The two
    aggregations share one scan and one (user, time) shuffle profile;
    the final join is per-user (one row each side). Both window
    operators are exactly what Structured Streaming runs incrementally
    with a watermark — this is their batch-parity pin. The oracle
    restates sliding assignment with integer epoch math and sessions
    with the lag/running-sum rewrite (DuckDB has neither operator)."""
    e = load_table(spark, sf_dir, "events")
    slide = (
        e.groupBy("user_id", F.window("ts", "1 hour", "30 minutes"))
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_slide_windows"))
    )
    sess = (
        e.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.max("n_events").alias("max_session_events"),
        )
    )
    return slide.join(sess, "user_id").select(
        "user_id", "n_slide_windows", "n_sessions", "max_session_events"
    )


@register(
    "t_session_window_dynamic_gap",
    oracle="""
WITH g AS (
  SELECT user_id, ts, event_id,
         CASE WHEN event_type = 'click' THEN 1800 ELSE 600 END AS gap_s
  FROM events
),
flagged AS (
  SELECT user_id, ts, gap_s,
    CASE WHEN MAX(EPOCH_US(ts) + gap_s * 1000000) OVER w_prev IS NULL
           OR EPOCH_US(ts) > MAX(EPOCH_US(ts) + gap_s * 1000000) OVER w_prev
         THEN 1 ELSE 0 END AS is_start
  FROM g
  WINDOW w_prev AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
sessions AS (
  SELECT user_id, ts, gap_s,
    SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged
)
SELECT user_id,
       EPOCH_US(MIN(ts)) // 1000000                         AS session_start_epoch,
       MAX(EPOCH_US(ts) + gap_s * 1000000) // 1000000       AS session_end_epoch,
       COUNT(*)                                             AS n_events
FROM sessions
GROUP BY user_id, sid
""",
    tags=("T3", "T4"),
)
def t_session_window_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """session_window with a PER-EVENT gap expression (clicks hold a
    session open 30 min, everything else 10) — the dynamic-gap form of
    T3 that models engagement-weighted sessionization. Spark merges the
    per-event intervals [ts, ts + gap); the oracle derives the same
    fixed point from first principles: an event starts a new session
    iff its ts exceeds the RUNNING MAX of previous (ts + gap) — a
    running max, not lag(ts)+gap, because with heterogeneous gaps an
    earlier long-gap event can outlast the immediately preceding one.
    Session end = max(ts + gap) within the session, per the same rule.
    One shuffle on user_id on both engines."""
    e = load_table(spark, sf_dir, "events")
    gap = (
        F.when(F.col("event_type") == "click", F.lit("30 minutes"))
        .otherwise(F.lit("10 minutes"))
    )
    return (
        e.groupBy("user_id", F.session_window("ts", gap))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_seconds(F.col("session_window.start").cast("timestamp")).alias(
                "session_start_epoch"
            ),
            F.unix_seconds(F.col("session_window.end").cast("timestamp")).alias(
                "session_end_epoch"
            ),
            "n_events",
        )
    )


@register(
    "e_decay_engagement_score",
    oracle=f"""
SELECT user_id,
       CAST(SUM({CENTS_SQL.format(expr="value")} * (CAST(1 AS BIGINT) << (20 - rn))) AS BIGINT) AS decay_score_scaled,
       COUNT(*) AS n_recent
FROM (
  SELECT user_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) - 1 AS rn
  FROM events
) t
WHERE rn <= 20
GROUP BY user_id
""",
    tags=("W1", "A1", "F3"),
)
def e_decay_engagement_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponential time-decay engagement score (recency
    weighting, half-life = one event): the freshest event counts full,
    each older event half as much, truncated after 21 events where the
    weight underflows anyway.

    Exactness trick: decay 1/2 makes every weight a power of two, so
    the score is sum(cents << (20 - rank)) in pure BIGINT shifts — no
    float pow(), no accumulation-order drift, bit-identical on any
    engine and any partitioning. Max term ~1e5 cents << 20 ≈ 1e11 and
    ≤ 21 terms per user: no overflow headroom issues. One window + one
    combinable aggregation (two shuffles on the same key — AQE merges
    them into one exchange reuse)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.withColumn("rn", F.row_number().over(w) - 1)
        .filter(F.col("rn") <= 20)
        .groupBy("user_id")
        .agg(
            F.sum(
                cents(F.col("value"))
                * F.expr("shiftleft(CAST(1 AS BIGINT), CAST(20 - rn AS INT))")
            ).alias("decay_score_scaled"),
            F.count(F.lit(1)).alias("n_recent"),
        )
    )


# --- gap interpolation over a daily series ----------------------------------

_INTERP_ORACLE = f"""
WITH daily AS (
  SELECT user_id,
         CAST(FLOOR(EPOCH(ts) / 86400) AS BIGINT) AS day,
         CAST(SUM({CENTS_SQL.format(expr="value")}) AS BIGINT) AS val
  FROM events WHERE event_type = 'purchase'
  GROUP BY 1, 2
),
spine AS (
  SELECT user_id, UNNEST(GENERATE_SERIES(MIN(day), MAX(day))) AS day
  FROM daily GROUP BY user_id
),
g AS (
  SELECT s.user_id, s.day, d.val
  FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
),
w AS (
  SELECT user_id, day, val,
    LAST_VALUE(val IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY day
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)  AS pv,
    LAST_VALUE(CASE WHEN val IS NOT NULL THEN day END IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY day
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)  AS pd,
    FIRST_VALUE(val IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY day
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)  AS nv,
    FIRST_VALUE(CASE WHEN val IS NOT NULL THEN day END IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY day
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)  AS nd
  FROM g
)
SELECT user_id, day,
  ROUND(CASE WHEN val IS NOT NULL THEN CAST(val AS DOUBLE)
             WHEN pv IS NULL  THEN CAST(nv AS DOUBLE)
             WHEN nv IS NULL  THEN CAST(pv AS DOUBLE)
             ELSE pv + (nv - pv) * (day - pd) / CAST(nd - pd AS DOUBLE)
        END, 6)        AS val_interp_cents,
  val IS NULL          AS is_gap
FROM w
"""


@register("w_linear_interpolate", oracle=_INTERP_ORACLE, tags=("W3", "W2", "P5", "F2"))
def w_linear_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Missing-point repair on a daily per-user series: densify each
    user's purchase history to a full day spine, then LINEARLY
    interpolate gap days between the surrounding observed values
    (leading/trailing gaps extend the nearest observation) — the
    time-series prep step between raw events and any forecasting or
    anomaly model. w_forward_fill carries values flat; this op slopes
    them, the other half of the standard gap-repair toolbox.

    Scale design: the spine explode is per-user (bounded by the user's
    own date extent); the daily rollup, spine join, and both IGNORE
    NULLS window passes all hash-partition on user_id, so the whole plan
    after the first shuffle is ONE exchange reused by every window (sort
    within partitions, no re-shuffle). Interpolation arithmetic is
    integer until the final division and written in the same operation
    order in both engines, then rounded to 6 — bit-stable."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    epoch_day = F.floor(
        F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(86_400_000_000)
    )
    daily = ev.groupBy("user_id", epoch_day.alias("day")).agg(
        F.sum(cents(F.col("value"))).alias("val")
    )
    spine = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select("user_id", F.explode(F.sequence("d0", "d1")).alias("day"))
    )
    g = spine.join(daily, ["user_id", "day"], "left")
    wp = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_day = F.when(F.col("val").isNotNull(), F.col("day"))
    pv = F.last("val", ignorenulls=True).over(wp)
    pd_ = F.last(obs_day, ignorenulls=True).over(wp)
    nv = F.first("val", ignorenulls=True).over(wn)
    nd = F.first(obs_day, ignorenulls=True).over(wn)
    interp = (
        F.when(F.col("val").isNotNull(), F.col("val").cast("double"))
        .when(pv.isNull(), nv.cast("double"))
        .when(nv.isNull(), pv.cast("double"))
        .otherwise(
            pv + (nv - pv) * (F.col("day") - pd_) / (nd - pd_).cast("double")
        )
    )
    return g.select(
        "user_id",
        "day",
        F.round(interp, 6).alias("val_interp_cents"),
        F.col("val").isNull().alias("is_gap"),
    )


_LTTB_ORACLE = f"""
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS d,
         SUM({CENTS_SQL.format(expr="value")}) AS y
  FROM events GROUP BY 1, 2
),
ser AS (
  SELECT user_id, d, CAST(y AS BIGINT) AS y,
         CAST(DATEDIFF('day', DATE '1970-01-01', d) AS BIGINT) AS x,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n
  FROM daily
),
pts AS (
  SELECT *, ((rn - 1) * 6) // n AS bucket FROM ser WHERE n >= 12
),
cent AS (
  SELECT user_id, bucket, CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy, COUNT(*) AS cnt
  FROM pts GROUP BY 1, 2
),
scored AS (
  SELECT p.user_id, p.bucket, p.d, p.y, p.x,
         ABS((l.sx * r.cnt - r.sx * l.cnt) * (p.y * l.cnt - l.sy)
           - (l.sx - p.x * l.cnt) * (r.sy * l.cnt - l.sy * r.cnt)) AS score
  FROM pts p
  JOIN cent l ON l.user_id = p.user_id AND l.bucket = p.bucket - 1
  JOIN cent r ON r.user_id = p.user_id AND r.bucket = p.bucket + 1
  WHERE p.bucket BETWEEN 1 AND 4
),
sel AS (
  SELECT user_id, bucket, d, y, x, score,
         ROW_NUMBER() OVER (PARTITION BY user_id, bucket
                            ORDER BY score DESC, x ASC) AS rk
  FROM scored
)
SELECT user_id, CAST(bucket AS BIGINT) AS bucket,
       STRFTIME(d, '%Y-%m-%d') AS day, y AS y_cents,
       'peak' AS kind, CAST(score AS BIGINT) AS score
FROM sel WHERE rk = 1
UNION ALL
SELECT user_id, CAST(bucket AS BIGINT), STRFTIME(d, '%Y-%m-%d'), y, 'first', CAST(0 AS BIGINT)
FROM pts WHERE rn = 1
UNION ALL
SELECT user_id, CAST(bucket AS BIGINT), STRFTIME(d, '%Y-%m-%d'), y, 'last', CAST(0 AS BIGINT)
FROM pts WHERE rn = n
"""


@register("t_lttb_downsample", oracle=_LTTB_ORACLE, tags=("W3", "W1", "A1", "F3"))
def t_lttb_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LTTB (largest-triangle-three-buckets) downsampling of each
    user's daily-revenue series to 6 visually-representative points:
    global first/last plus, per interior bucket, the point forming the
    largest triangle with the NEIGHBOR BUCKETS' centroids — the
    fixed-anchor LTTB variant (Steinarsson's thesis, §4.2), whose
    bucket selections are independent and therefore parallelize; the
    classic sequential variant anchors on the previously SELECTED
    point, a chain no engine can partition.

    Scale design: one combinable daily rollup, one window pass to
    number each series, one combinable centroid aggregation, then a
    per-bucket argmax — every join is key-equi on (user, bucket) and
    every series stays inside its hash partition (millions of series =
    embarrassing parallelism; no series is ever assembled on the
    driver). Exact-integer geometry: with x = epoch days and y = cents,
    the triangle area against the two bucket centroids is scaled by
    cnt_l^2 * cnt_r (a positive constant within each bucket), clearing
    the centroid divisions so the score is a BIGINT expression —
    bit-identical across engines and partitionings, ~1e14 worst case
    against the 9.2e18 long range. Argmax ties break on earliest day."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy("user_id", F.to_date("ts").alias("d")).agg(
        F.sum(cents(F.col("value"))).alias("y")
    )
    wn = Window.partitionBy("user_id")
    ser = daily.select(
        "user_id",
        "d",
        "y",
        F.datediff("d", F.lit("1970-01-01")).cast("long").alias("x"),
        F.row_number().over(wn.orderBy("d")).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    pts = ser.filter(F.col("n") >= 12).withColumn(
        "bucket", F.expr("((rn - 1) * 6) div n")
    )
    cent = pts.groupBy("user_id", "bucket").agg(
        F.sum("x").alias("sx"), F.sum("y").alias("sy"), F.count(F.lit(1)).alias("cnt")
    )
    left = cent.select(
        "user_id",
        (F.col("bucket") + 1).alias("bucket"),
        F.col("sx").alias("lsx"),
        F.col("sy").alias("lsy"),
        F.col("cnt").alias("lcnt"),
    )
    right = cent.select(
        "user_id",
        (F.col("bucket") - 1).alias("bucket"),
        F.col("sx").alias("rsx"),
        F.col("sy").alias("rsy"),
        F.col("cnt").alias("rcnt"),
    )
    scored = (
        pts.filter(F.col("bucket").between(1, 4))
        .join(left, ["user_id", "bucket"])
        .join(right, ["user_id", "bucket"])
        .withColumn(
            "score",
            F.abs(
                (F.col("lsx") * F.col("rcnt") - F.col("rsx") * F.col("lcnt"))
                * (F.col("y") * F.col("lcnt") - F.col("lsy"))
                - (F.col("lsx") - F.col("x") * F.col("lcnt"))
                * (F.col("rsy") * F.col("lcnt") - F.col("lsy") * F.col("rcnt"))
            ),
        )
    )
    wk = Window.partitionBy("user_id", "bucket").orderBy(
        F.col("score").desc(), F.col("x").asc()
    )
    peaks = (
        scored.withColumn("rk", F.row_number().over(wk))
        .filter(F.col("rk") == 1)
        .select(
            "user_id",
            F.col("bucket").cast("long").alias("bucket"),
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            F.col("y").alias("y_cents"),
            F.lit("peak").alias("kind"),
            F.col("score").cast("long").alias("score"),
        )
    )
    ends = lambda cond, kind: pts.filter(cond).select(  # noqa: E731
        "user_id",
        F.col("bucket").cast("long").alias("bucket"),
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.col("y").alias("y_cents"),
        F.lit(kind).alias("kind"),
        F.lit(0).cast("long").alias("score"),
    )
    return peaks.unionByName(ends(F.col("rn") == 1, "first")).unionByName(
        ends(F.col("rn") == F.col("n"), "last")
    )


_SEASONALITY_ORACLE = f"""
WITH daily AS (
  SELECT event_type,
         CAST(FLOOR(EPOCH(ts) / 86400) AS BIGINT) AS d,
         SUM({CENTS_SQL.format(expr="value")}) AS y
  FROM events GROUP BY 1, 2
),
base AS (
  SELECT event_type, d, ((d % 7) + 4) % 7 AS dow, CAST(y AS BIGINT) AS y
  FROM daily
),
tot AS (
  SELECT event_type, CAST(SUM(y) AS BIGINT) AS sum_all, COUNT(*) AS n_days
  FROM base GROUP BY 1
),
per AS (
  SELECT event_type, dow, CAST(SUM(y) AS BIGINT) AS sum_dow, COUNT(*) AS n_dow
  FROM base GROUP BY 1, 2
)
SELECT p.event_type, p.dow, p.n_dow, p.sum_dow, t.n_days, t.sum_all,
       ROUND(CAST(p.sum_dow * t.n_days AS DOUBLE) / (p.n_dow * t.sum_all), 6)
         AS seasonal_index
FROM per p JOIN tot t USING (event_type)
"""


@register("t_seasonality_dow_profile", oracle=_SEASONALITY_ORACLE, tags=("A1", "F2", "F3"))
def t_seasonality_dow_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality profile per event type: each weekday's
    share of daily revenue relative to the series' overall daily mean
    (index 1.0 = an average day) — the decomposition step behind
    weekly-seasonal anomaly detection and deseasonalized forecasting.

    Scale design: two combinable aggregations (daily rollup, then
    per-dow rollup) plus a per-event-type totals join — the totals side
    has one row per event type, so AQE broadcasts it. Engine-proof
    integer calendar math: dow is computed from the epoch day as
    ((d % 7) + 4) % 7 (1970-01-01 was a Thursday; Sunday = 0) instead
    of each engine's locale-flavored dayofweek(); revenue stays in
    exact integer cents and the index is ONE IEEE division of two
    integer products, rounded at 6 dp."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(86_400_000_000)
        ).alias("d"),
    ).agg(F.sum(cents(F.col("value"))).alias("y"))
    base = daily.select(
        "event_type",
        "y",
        ((F.col("d") % 7 + 4) % 7).alias("dow"),
    )
    tot = base.groupBy("event_type").agg(
        F.sum("y").alias("sum_all"), F.count(F.lit(1)).alias("n_days")
    )
    per = base.groupBy("event_type", "dow").agg(
        F.sum("y").alias("sum_dow"), F.count(F.lit(1)).alias("n_dow")
    )
    return per.join(tot, "event_type").select(
        "event_type",
        "dow",
        "n_dow",
        "sum_dow",
        "n_days",
        "sum_all",
        F.round(
            (F.col("sum_dow") * F.col("n_days")).cast("double")
            / (F.col("n_dow") * F.col("sum_all")),
            6,
        ).alias("seasonal_index"),
    )


# ---------------------------------------------------------------------------
# Regular-grid resample with last-observation-carried-forward
# ---------------------------------------------------------------------------

_RESAMPLE_LOCF_ORACLE = """
WITH obs AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         MAX({'t': ts, 'id': event_id,
              'v': CAST(ROUND(value * 100) AS BIGINT)}).v AS close_cents
  FROM events
  WHERE user_id % 3 = 0
  GROUP BY user_id, CAST(ts AS DATE)
),
bounds AS (
  SELECT user_id, MIN(day) AS dmin, MAX(day) AS dmax FROM obs GROUP BY user_id
),
grid AS (
  SELECT user_id,
         CAST(UNNEST(generate_series(CAST(dmin AS TIMESTAMP),
                                     CAST(dmax AS TIMESTAMP),
                                     INTERVAL 1 DAY)) AS DATE) AS day
  FROM bounds
)
SELECT g.user_id, CAST(g.day AS VARCHAR) AS day,
       o.close_cents IS NOT NULL AS observed,
       LAST_VALUE(o.close_cents IGNORE NULLS) OVER (
         PARTITION BY g.user_id ORDER BY g.day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS close_cents_locf
FROM grid g
LEFT JOIN obs o ON g.user_id = o.user_id AND g.day = o.day
"""


@register(
    "t_resample_grid_locf",
    oracle=_RESAMPLE_LOCF_ORACLE,
    tags=("T4", "W3", "F2", "F4"),
)
def t_resample_grid_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample an irregular event stream onto a regular daily grid and
    carry the last observation forward — the canonical feature-store /
    market-data densification (distinct from `w_forward_fill`, which
    fills nulls on EXISTING rows; this one GENERATES the missing grid
    rows first). Per user: daily close (deterministic argmax by
    (ts, event_id) via lexicographic struct MAX, integer cents), the
    per-user [min_day, max_day] span exploded through `sequence()`, a
    left join back to observations, then `last(..., ignorenulls)` over
    the grid.

    Scale: grid cardinality is users x days — bounded by the CALENDAR,
    not event volume; the heavy pass is one combinable groupBy(user,
    day). The grid explode, the join, and the LOCF window all hash on
    user_id, so AQE coalesces them onto one exchange. Values stay
    integer cents end-to-end — no float drift."""
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 3 == 0)
    obs = e.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.max(
            F.struct(
                F.col("ts").alias("t"),
                F.col("event_id").alias("id"),
                cents(F.col("value")).alias("v"),
            )
        )
        .getField("v")
        .alias("close_cents")
    )
    bounds = obs.groupBy("user_id").agg(
        F.min("day").alias("dmin"), F.max("day").alias("dmax")
    )
    grid = bounds.select(
        "user_id", F.explode(F.sequence("dmin", "dmax")).alias("day")
    )
    joined = grid.join(obs, ["user_id", "day"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        F.col("day").cast("string").alias("day"),
        F.col("close_cents").isNotNull().alias("observed"),
        F.last("close_cents", ignorenulls=True).over(w).alias("close_cents_locf"),
    )


# ---------------------------------------------------------------------------
# Event-time out-of-orderness profile (watermark sizing)
# ---------------------------------------------------------------------------

_ORDER_SKEW_ORACLE = """
WITH arr AS (
  SELECT user_id, event_id, event_type, ts,
         MAX(ts) OVER (PARTITION BY user_id ORDER BY event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS hwm
  FROM events
),
late AS (
  SELECT event_type,
         CASE WHEN hwm IS NOT NULL AND hwm > ts
              THEN DATE_DIFF('second', ts, hwm) ELSE 0 END AS late_s
  FROM arr
)
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CASE WHEN late_s > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_out_of_order,
       MAX(late_s) AS max_lateness_s,
       CAST(SUM(late_s) AS BIGINT) AS total_lateness_s,
       ROUND(CAST(SUM(late_s) AS DOUBLE) / COUNT(*), 6) AS avg_lateness_s
FROM late
GROUP BY event_type
ORDER BY event_type
"""


@register(
    "t_event_order_skew",
    oracle=_ORDER_SKEW_ORACLE,
    tags=("T5", "W3", "A1", "F2"),
)
def t_event_order_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-orderness audit: how late does each event arrive behind
    the high-water mark of event-time already seen on its key? This is
    the measurement you size `withWatermark` from — the streaming
    queries in this engine declare lateness bounds, and this batch
    profile is where those bounds come from. Arrival order is the
    monotone ingest id (event_id); the per-key high-water mark is a
    MAX(ts) window over arrival order ending 1 PRECEDING, and lateness
    is whole seconds behind it (integer on both engines; both
    DATE_DIFF and unix_timestamp truncate to the second boundary).

    Scale: the window partitions by user_id — per-key sequential scan,
    embarrassingly parallel across keys, never a global arrival sort;
    the rollup to event_type is one combinable groupBy."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    hwm = F.max("ts").over(w)
    arr = e.select(
        "event_type",
        F.when(
            hwm.isNotNull() & (hwm > F.col("ts")),
            F.unix_timestamp(hwm) - F.unix_timestamp(F.col("ts")),
        )
        .otherwise(F.lit(0))
        .alias("late_s"),
    )
    return (
        arr.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(F.col("late_s") > 0, 1).otherwise(0)).alias(
                "n_out_of_order"
            ),
            F.max("late_s").alias("max_lateness_s"),
            F.sum("late_s").cast("long").alias("total_lateness_s"),
            F.round(
                F.sum("late_s").cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_lateness_s"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Heartbeat downtime / availability SLA per service
# ---------------------------------------------------------------------------

_SLA_ORACLE = """
WITH gaps AS (
  SELECT event_type,
         epoch_us(ts) - epoch_us(LAG(ts) OVER (
           PARTITION BY event_type ORDER BY ts, event_id)) AS gap_us
  FROM events
),
agg AS (
  SELECT event_type,
         COUNT(*) AS n_beats,
         CAST(SUM(CASE WHEN gap_us > 600000000 THEN gap_us - 600000000
                       ELSE 0 END) AS BIGINT) AS downtime_us,
         CAST(SUM(CASE WHEN gap_us > 600000000 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_outages,
         CAST(MAX(gap_us) AS BIGINT) AS max_gap_us
  FROM gaps GROUP BY event_type
),
span AS (
  SELECT event_type,
         epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS span_us
  FROM events GROUP BY event_type
)
SELECT a.event_type, a.n_beats, a.n_outages,
       a.downtime_us // 1000000 AS downtime_s,
       a.max_gap_us // 1000000 AS max_gap_s,
       (s.span_us - a.downtime_us) * 1000000 // s.span_us
         AS availability_ppm
FROM agg a JOIN span s ON a.event_type = s.event_type
ORDER BY a.event_type
"""


@register(
    "t_downtime_sla",
    oracle=_SLA_ORACLE,
    tags=("T4", "W2", "F2", "A1"),
)
def t_downtime_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Availability SLA from heartbeats: treating each event_type as a
    service emitting irregular heartbeats, any inter-arrival gap over
    the 600s tolerance counts its excess as downtime; the service's
    availability over its observed span is reported in exact ppm.
    The lag-gap + conditional-sum pattern is the standard uptime
    calculation for monitoring pipelines.

    Determinism/scale: all arithmetic is integer microseconds (epoch
    diffs, floor division — no float until never); the lag window
    partitions by service so each service's timeline scans in
    parallel and the rollup is one combinable groupBy. Ordering ties
    on identical timestamps break by event_id on both engines."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    tsc = F.col("ts").cast("timestamp")
    gap_us = F.unix_micros(tsc) - F.unix_micros(F.lag(tsc).over(w))
    tol = 600_000_000
    gaps = e.select("event_type", gap_us.alias("gap_us"))
    agg = gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_beats"),
        F.sum(
            F.when(F.col("gap_us") > tol, F.col("gap_us") - tol).otherwise(0)
        )
        .cast("long")
        .alias("downtime_us"),
        F.sum(F.when(F.col("gap_us") > tol, 1).otherwise(0))
        .cast("long")
        .alias("n_outages"),
        F.max("gap_us").cast("long").alias("max_gap_us"),
    )
    span = e.groupBy("event_type").agg(
        (
            F.unix_micros(F.max(F.col("ts").cast("timestamp")))
            - F.unix_micros(F.min(F.col("ts").cast("timestamp")))
        ).alias("span_us")
    )
    return (
        agg.join(span, "event_type")
        .select(
            "event_type",
            "n_beats",
            "n_outages",
            F.expr("downtime_us DIV 1000000").alias("downtime_s"),
            F.expr("max_gap_us DIV 1000000").alias("max_gap_s"),
            F.expr(
                "(span_us - downtime_us) * 1000000 DIV span_us"
            ).alias("availability_ppm"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Maximum drawdown from the running peak (per series)
# ---------------------------------------------------------------------------

_DRAWDOWN_ORACLE = f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(SUM({CENTS_SQL.format(expr="value")}) AS BIGINT) AS rev_cents
  FROM events GROUP BY event_type, CAST(ts AS DATE)
),
tracked AS (
  SELECT event_type, day, rev_cents,
         MAX(rev_cents) OVER (PARTITION BY event_type ORDER BY day
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND CURRENT ROW) AS peak_cents
  FROM daily
)
SELECT event_type,
       COUNT(*) AS n_days,
       MAX(peak_cents) AS peak_cents,
       MAX(peak_cents - rev_cents) AS max_drawdown_cents,
       CAST(MIN({{'dd': -(peak_cents - rev_cents), 'd': day}}).d
            AS VARCHAR) AS max_drawdown_day,
       CAST(MAX((peak_cents - rev_cents) * 1000000 // peak_cents)
            AS BIGINT) AS max_drawdown_ppm
FROM tracked
GROUP BY event_type
ORDER BY event_type
"""


@register(
    "t_max_drawdown",
    oracle=_DRAWDOWN_ORACLE,
    tags=("W3", "F3", "A1", "F2"),
)
def t_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown: the deepest fall of each series below its
    running peak — the risk metric behind every trading/revenue
    monitoring dashboard, and the canonical running-max window
    composition (cummax → deviation → argmax with a deterministic
    earliest-day tie-break). Reported absolute (exact cents) and
    relative (exact integer ppm of the peak).

    Scale: the only pass over raw events is one combinable
    groupBy(event_type, day); the window runs on the calendar-bounded
    daily rollup, partitioned per series."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.sum(cents(F.col("value"))).cast("long").alias("rev_cents"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tracked = daily.withColumn("peak_cents", F.max("rev_cents").over(w))
    dd = F.col("peak_cents") - F.col("rev_cents")
    return (
        tracked.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.max("peak_cents").alias("peak_cents"),
            F.max(dd).alias("max_drawdown_cents"),
            F.min(
                F.struct((-dd).alias("dd"), F.col("day").alias("d"))
            )
            .getField("d")
            .cast("string")
            .alias("max_drawdown_day"),
            F.max(
                F.expr(
                    "(peak_cents - rev_cents) * 1000000 DIV peak_cents"
                )
            )
            .cast("long")
            .alias("max_drawdown_ppm"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Interval coalescing: merge overlapping padded activity intervals
# ---------------------------------------------------------------------------

_COALESCE_ORACLE = """
WITH iv AS (
  SELECT user_id,
         epoch_us(ts) // 1000000 - 300 AS s,
         epoch_us(ts) // 1000000 + 300 AS e
  FROM events
),
flagged AS (
  SELECT user_id, s, e,
         CASE WHEN MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND 1 PRECEDING) >= s
              THEN 0 ELSE 1 END AS is_new
  FROM iv
),
islands AS (
  SELECT user_id, s, e,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY s, e
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS island
  FROM flagged
),
merged AS (
  SELECT user_id, island,
         MIN(s) AS span_start, MAX(e) AS span_end, COUNT(*) AS n_events
  FROM islands GROUP BY user_id, island
)
SELECT user_id,
       COUNT(*) AS n_spans,
       CAST(SUM(span_end - span_start) AS BIGINT) AS covered_s,
       CAST(MAX(span_end - span_start) AS BIGINT) AS longest_span_s,
       CAST(SUM(n_events) AS BIGINT) AS n_events
FROM merged
GROUP BY user_id
ORDER BY user_id
"""


@register(
    "t_interval_coalesce",
    oracle=_COALESCE_ORACLE,
    tags=("T4", "W2", "W3", "F2"),
)
def t_interval_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval coalescing (merge overlapping intervals): every event
    contributes a ±5-minute activity interval; overlapping intervals
    union into maximal disjoint spans per user — the foundation of
    screen-time, machine-utilization, and SLA-coverage metrics, where
    double-counting overlap is the classic bug. A span breaks exactly
    where an interval's start clears the running max of all earlier
    ends (sort by start, one window) — the O(n log n) sweep instead of
    the O(n²) self-join reachability formulation.

    Determinism/scale: integer epoch seconds; the sweep partitions by
    user (parallel across keys, the one shuffle), and the two stacked
    windows plus the rollup share that partitioning so AQE reuses one
    exchange."""
    e = load_table(spark, sf_dir, "events")
    sec = F.expr("unix_micros(CAST(ts AS TIMESTAMP)) DIV 1000000")
    iv = e.select(
        "user_id", (sec - 300).alias("s"), (sec + 300).alias("e")
    )
    wprev = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = iv.withColumn(
        "is_new",
        F.when(F.max("e").over(wprev) >= F.col("s"), 0).otherwise(1),
    )
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    islands = flagged.withColumn("island", F.sum("is_new").over(wrun))
    merged = islands.groupBy("user_id", "island").agg(
        F.min("s").alias("span_start"),
        F.max("e").alias("span_end"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return (
        merged.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(F.col("span_end") - F.col("span_start"))
            .cast("long")
            .alias("covered_s"),
            F.max(F.col("span_end") - F.col("span_start"))
            .cast("long")
            .alias("longest_span_s"),
            F.sum("n_events").cast("long").alias("n_events"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Seasonal-naive forecast backtest (MAE / sMAPE over the holdout week)
# ---------------------------------------------------------------------------

_SNAIVE_ORACLE = f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(SUM({CENTS_SQL.format(expr="value")}) AS BIGINT) AS rev_cents
  FROM events GROUP BY event_type, CAST(ts AS DATE)
),
joined AS (
  SELECT d.event_type, d.day, d.rev_cents,
         LAG(d.rev_cents, 7) OVER (PARTITION BY d.event_type
                                   ORDER BY d.day) AS forecast_cents
  FROM daily d
),
holdout AS (
  SELECT * FROM joined
  WHERE forecast_cents IS NOT NULL
    AND day > (SELECT MAX(day) FROM daily) - INTERVAL 7 DAY
)
SELECT event_type,
       COUNT(*) AS n_days,
       CAST(SUM(ABS(rev_cents - forecast_cents)) // COUNT(*) AS BIGINT)
         AS mae_cents,
       CAST(SUM(ABS(rev_cents - forecast_cents) * 1000000
                // (rev_cents + forecast_cents)) // COUNT(*) AS BIGINT)
         AS smape_ppm_x2
FROM holdout
GROUP BY event_type
ORDER BY event_type
"""


@register(
    "e_snaive_forecast_backtest",
    oracle=_SNAIVE_ORACLE,
    tags=("W2", "A1", "F2", "P2"),
)
def e_snaive_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast backtesting with the seasonal-naive baseline: predict
    each day as the same weekday last week (lag 7 on the daily
    series) and score the final week holdout with MAE and sMAPE — the
    evaluation harness every forecasting system runs FIRST, because a
    model that can't beat seasonal-naive is noise. Exact integer
    scoring: floor-divided cents MAE and the doubled-sMAPE in ppm
    (numerator/denominator both integer, no float anywhere).

    Scale: one combinable groupBy(event_type, day) over raw events;
    lag-7 runs on the calendar-bounded rollup partitioned per series;
    the holdout bound is a 1-row MAX(day) broadcast."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.sum(cents(F.col("value"))).cast("long").alias("rev_cents"))
    w = Window.partitionBy("event_type").orderBy("day")
    joined = daily.withColumn(
        "forecast_cents", F.lag("rev_cents", 7).over(w)
    )
    maxday = daily.agg(F.max("day").alias("max_day"))
    holdout = (
        joined.crossJoin(F.broadcast(maxday))
        .filter(
            F.col("forecast_cents").isNotNull()
            & (F.col("day") > F.date_sub(F.col("max_day"), 7))
        )
    )
    abs_err = F.abs(F.col("rev_cents") - F.col("forecast_cents"))
    return (
        holdout.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.expr(
                "CAST(SUM(ABS(rev_cents - forecast_cents)) DIV COUNT(*) "
                "AS BIGINT)"
            ).alias("mae_cents"),
            F.expr(
                "CAST(SUM(ABS(rev_cents - forecast_cents) * 1000000 "
                "DIV (rev_cents + forecast_cents)) DIV COUNT(*) AS BIGINT)"
            ).alias("smape_ppm_x2"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# 4-4-5 fiscal calendar alignment (retail period-over-period comparability)
# ---------------------------------------------------------------------------

_FISCAL_445_ORACLE = f"""
WITH facts AS (
  SELECT DATEDIFF('day', DATE '1995-12-25', CAST(l_shipdate AS DATE)) AS d,
         {CENTS_SQL.format(expr="l_extendedprice * (1 - l_discount)")}
           AS rev_cents
  FROM lineitem
  WHERE l_shipdate >= DATE '1995-12-25' AND l_shipdate < DATE '1996-12-23'
),
labeled AS (
  SELECT d // 7 AS fiscal_week,
         (d // 7) // 13 AS fiscal_quarter,
         CASE WHEN ((d // 7) % 13) < 4 THEN 1
              WHEN ((d // 7) % 13) < 8 THEN 2
              ELSE 3 END AS period_in_quarter,
         CASE WHEN ((d // 7) % 13) < 4 THEN ((d // 7) % 13) * 7
              WHEN ((d // 7) % 13) < 8 THEN (((d // 7) % 13) - 4) * 7
              ELSE (((d // 7) % 13) - 8) * 7 END >= 0 AS _always,
         rev_cents
  FROM facts
)
SELECT fiscal_quarter,
       period_in_quarter,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(rev_cents) AS BIGINT) / 100.0 AS revenue,
       CAST(COUNT(DISTINCT fiscal_week) AS BIGINT) AS n_weeks
FROM labeled
GROUP BY fiscal_quarter, period_in_quarter
ORDER BY fiscal_quarter, period_in_quarter
"""


@register(
    "t_fiscal_445_calendar",
    oracle=_FISCAL_445_ORACLE,
    tags=("F2", "A1", "P6"),
)
def t_fiscal_445_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue on a 4-4-5 fiscal calendar (retail NRF convention): the
    fiscal year starts on a fixed Monday (1995-12-25), every quarter is
    exactly 13 weeks split 4+4+5, so each period contains a whole
    number of each weekday and period-over-period comparisons are free
    of the weekday-mix distortion that wrecks calendar-month compares.
    The n_weeks column pins the 4/4/5 pattern in the output (periods
    1,2 → 4 weeks; period 3 → 5 weeks).

    Determinism & scale — fiscal labeling is pure positive integer
    arithmetic on the day offset from the fiscal epoch (// 7 weeks,
    // 13 quarters, thresholds 4/8 within the quarter): no locale, no
    WEEKOFYEAR whose ISO rules differ per engine. One combinable
    rollup; calendar filter pushed to the scan."""
    li = load_table(spark, sf_dir, "lineitem")
    d = F.datediff(F.col("l_shipdate").cast("date"), F.lit("1995-12-25"))
    wk = F.expr(
        "datediff(CAST(l_shipdate AS DATE), DATE '1995-12-25') DIV 7"
    )
    facts = li.filter(
        (F.col("l_shipdate") >= "1995-12-25") & (F.col("l_shipdate") < "1996-12-23")
    ).select(
        wk.alias("fiscal_week"),
        F.expr(
            "(datediff(CAST(l_shipdate AS DATE), DATE '1995-12-25') DIV 7) DIV 13"
        ).alias("fiscal_quarter"),
        cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "rev_cents"
        ),
    ).withColumn(
        "period_in_quarter",
        F.when((F.col("fiscal_week") % 13) < 4, 1)
        .when((F.col("fiscal_week") % 13) < 8, 2)
        .otherwise(3),
    )
    return (
        facts.groupBy("fiscal_quarter", "period_in_quarter")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            (F.sum("rev_cents") / 100.0).alias("revenue"),
            F.count_distinct("fiscal_week").alias("n_weeks"),
        )
        .orderBy("fiscal_quarter", "period_in_quarter")
    )


# ---------------------------------------------------------------------------
# M4 time-series downsampling (min/max/first/last per pixel bucket)
# ---------------------------------------------------------------------------

_M4_ORACLE = f"""
WITH daily AS (
  SELECT CAST(l_shipdate AS DATE) AS day,
         DATEDIFF('day', DATE '1996-01-01', CAST(l_shipdate AS DATE)) AS d,
         CAST(SUM({CENTS_SQL.format(expr="l_extendedprice * (1 - l_discount)")})
              AS BIGINT) AS rev_cents
  FROM lineitem
  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
  GROUP BY 1, 2
),
bucketed AS (
  SELECT d // 8 AS pixel, d, rev_cents FROM daily
)
SELECT pixel,
       CAST(COUNT(*) AS BIGINT) AS n_points,
       CAST(MIN(rev_cents) AS BIGINT) AS y_min,
       CAST(MAX(rev_cents) AS BIGINT) AS y_max,
       CAST(MIN_BY(rev_cents, d) AS BIGINT) AS y_first,
       CAST(MAX_BY(rev_cents, d) AS BIGINT) AS y_last,
       CAST(MIN(d) AS BIGINT) AS d_first,
       CAST(MAX(d) AS BIGINT) AS d_last
FROM bucketed
GROUP BY pixel
ORDER BY pixel
"""


@register(
    "t_m4_downsample",
    oracle=_M4_ORACLE,
    tags=("A1", "W1", "F2", "O1"),
)
def t_m4_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 downsampling of the daily revenue series: per pixel-bucket
    (8 days → one screen column) keep min, max, first and last — the
    four points that make the downsampled polyline PIXEL-IDENTICAL to
    the full series at that resolution (Jugel et al.'s M4), unlike
    LTTB (`t_lttb_downsample`) which trades exactness for shape. M4 is
    what dashboards should run server-side before shipping points to a
    browser.

    Determinism & scale — one combinable rollup per pixel: min/max are
    plain aggregates; first/last are MIN_BY/MAX_BY on the day index
    (unique within the series, so no tie ambiguity on either engine).
    The day index is positive integer floor division into buckets. At
    100 TB the daily rollup below it is the only fact-sized shuffle;
    the M4 pass is calendar-bounded."""
    li = load_table(spark, sf_dir, "lineitem")
    daily = (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
        )
        .groupBy(
            F.datediff(F.col("l_shipdate").cast("date"), F.lit("1996-01-01")).alias(
                "d"
            )
        )
        .agg(
            F.sum(cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            .alias("rev_cents")
        )
    )
    return (
        daily.groupBy(F.expr("d DIV 8").alias("pixel"))
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.min("rev_cents").alias("y_min"),
            F.max("rev_cents").alias("y_max"),
            F.expr("MIN_BY(rev_cents, d)").alias("y_first"),
            F.expr("MAX_BY(rev_cents, d)").alias("y_last"),
            F.min("d").alias("d_first"),
            F.max("d").alias("d_last"),
        )
        .orderBy("pixel")
    )


# ---------------------------------------------------------------------------
# Pinball (quantile) loss evaluation of the seasonal-naive forecast
# ---------------------------------------------------------------------------

_PINBALL_ORACLE = f"""
WITH daily AS (
  SELECT CAST(l_shipdate AS DATE) AS day,
         DATEDIFF('day', DATE '1996-01-01', CAST(l_shipdate AS DATE)) AS d,
         CAST(SUM({CENTS_SQL.format(expr="l_extendedprice * (1 - l_discount)")})
              AS BIGINT) AS y
  FROM lineitem
  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
  GROUP BY 1, 2
),
paired AS (
  SELECT a.d, a.y, f.y AS yhat
  FROM daily a JOIN daily f ON f.d = a.d - 7
),
losses AS (
  SELECT d,
         CASE WHEN y >= yhat THEN (y - yhat) * 50
              ELSE (yhat - y) * 50 END            AS pin50_x100,
         CASE WHEN y >= yhat THEN (y - yhat) * 90
              ELSE (yhat - y) * 10 END            AS pin90_x100,
         ABS(y - yhat)                            AS abs_err
  FROM paired
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_scored_days,
       CAST(SUM(pin50_x100) AS BIGINT) / 100.0 / 100.0 / COUNT(*)
         AS mean_pinball_q50_dollars,
       CAST(SUM(pin90_x100) AS BIGINT) / 100.0 / 100.0 / COUNT(*)
         AS mean_pinball_q90_dollars,
       CAST(SUM(abs_err) AS BIGINT) / 100.0 / COUNT(*) AS mae_dollars
FROM losses
"""


@register(
    "t_pinball_loss_eval",
    oracle=_PINBALL_ORACLE,
    tags=("A1", "J10", "F2"),
)
def t_pinball_loss_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pinball (quantile) loss scoring of the lag-7 seasonal-naive
    forecast at q=0.5 and q=0.9, next to MAE — the scoring rule that
    makes QUANTILE forecasts comparable (a q90 forecast should lose
    10:90 asymmetrically; scoring it with MAE silently rewards
    median-chasing). Complements `e_snaive_forecast_backtest`'s point
    scores with the probabilistic-forecast vocabulary.

    Determinism & scale — the q-weighted losses are exact integer
    cents×100 (weights 50/50, 90/10 as integer factors; floor-free),
    summed combinably over the calendar rollup; the final per-day
    means are single float divisions. The forecast pairing is a lag-7
    equi-join on the day index within the bounded daily rollup."""
    li = load_table(spark, sf_dir, "lineitem")
    daily = (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1996-04-01")
        )
        .groupBy(
            F.datediff(F.col("l_shipdate").cast("date"), F.lit("1996-01-01")).alias(
                "d"
            )
        )
        .agg(
            F.sum(cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            .alias("y")
        )
    )
    a, f_ = daily.alias("a"), daily.alias("f")
    paired = a.join(f_, F.col("f.d") == F.col("a.d") - 7).select(
        F.col("a.d").alias("d"), F.col("a.y").alias("y"), F.col("f.y").alias("yhat")
    )
    err = F.col("y") - F.col("yhat")
    losses = paired.select(
        F.when(err >= 0, err * 50).otherwise(-err * 50).alias("pin50_x100"),
        F.when(err >= 0, err * 90).otherwise(-err * 10).alias("pin90_x100"),
        F.abs(err).alias("abs_err"),
    )
    return losses.agg(
        F.count(F.lit(1)).alias("n_scored_days"),
        (F.sum("pin50_x100").cast("long") / 100.0 / 100.0 / F.count(F.lit(1))).alias(
            "mean_pinball_q50_dollars"
        ),
        (F.sum("pin90_x100").cast("long") / 100.0 / 100.0 / F.count(F.lit(1))).alias(
            "mean_pinball_q90_dollars"
        ),
        (F.sum("abs_err").cast("long") / 100.0 / F.count(F.lit(1))).alias(
            "mae_dollars"
        ),
    )


# ---------------------------------------------------------------------------
# Weekly PSI drift monitor (distribution drift of a metric over time)
# ---------------------------------------------------------------------------

_PSI_WEEKLY_ORACLE = """
WITH binned AS (
  SELECT (DATEDIFF('day', TIMESTAMP '2024-01-01 00:00:00', ts)) // 7 AS wk,
         LEAST(CAST(FLOOR(value) AS BIGINT) // 100, 9) AS bin
  FROM events
),
counts AS (
  SELECT wk, bin, CAST(COUNT(*) AS BIGINT) AS c
  FROM binned GROUP BY wk, bin
),
ref AS (
  SELECT bin, c AS c_ref,
         (SELECT CAST(SUM(c) AS BIGINT) FROM counts WHERE wk = 0) AS n_ref
  FROM counts WHERE wk = 0
),
cur AS (
  SELECT wk, bin, c AS c_cur,
         CAST(SUM(c) OVER (PARTITION BY wk) AS BIGINT) AS n_cur
  FROM counts WHERE wk > 0
),
terms AS (
  SELECT cur.wk,
         CAST(ROUND((CAST(c_cur AS DOUBLE) / n_cur
                     - CAST(c_ref AS DOUBLE) / n_ref)
              * LN((CAST(c_cur AS DOUBLE) / n_cur)
                   / (CAST(c_ref AS DOUBLE) / n_ref)) * 1000000) AS BIGINT)
           AS psi_term_micro
  FROM cur JOIN ref USING (bin)
)
SELECT wk,
       CAST(SUM(psi_term_micro) AS BIGINT) AS psi_micro,
       CAST(COUNT(*) AS BIGINT) AS n_bins_compared
FROM terms
GROUP BY wk
ORDER BY wk
"""


@register(
    "t_drift_psi_weekly",
    oracle=_PSI_WEEKLY_ORACLE,
    tags=("A1", "F2", "J1"),
)
def t_drift_psi_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index drift monitor: each week's event-value
    distribution (capped $100 bins) scored against week 0 as the
    reference — the production alarm wiring for "the metric's
    DISTRIBUTION moved even though its mean didn't". PSI < 0.1 stable,
    0.1-0.25 drifting, > 0.25 action; complements the one-shot
    embedding-space PSI (`n_embedding_drift_psi`) with the
    time-series form every model monitor runs.

    Determinism — the n_char_entropy float recipe: each bin's
    (p_cur − p_ref)·ln(p_cur/p_ref) term is rounded to integer
    micro-units BEFORE the per-week sum, so aggregation order is
    irrelevant. Scale — one combinable (week, bin) histogram rollup
    over the fact; reference and per-week totals derive from the
    bounded histogram, and the term join is |weeks|×|bins|."""
    e = load_table(spark, sf_dir, "events")
    binned = e.select(
        F.expr(
            "datediff(ts, TIMESTAMP '2024-01-01 00:00:00') DIV 7"
        ).alias("wk"),
        F.expr("LEAST(CAST(FLOOR(value) AS BIGINT) DIV 100, 9)").alias("bin"),
    )
    counts = binned.groupBy("wk", "bin").agg(F.count(F.lit(1)).alias("c"))
    ref_counts = counts.filter(F.col("wk") == 0).select(
        "bin", F.col("c").alias("c_ref")
    )
    n_ref = ref_counts.agg(F.sum("c_ref").alias("n_ref"))
    ref = ref_counts.crossJoin(F.broadcast(n_ref))
    wcur = Window.partitionBy("wk")
    cur = (
        counts.filter(F.col("wk") > 0)
        .select(
            "wk",
            "bin",
            F.col("c").alias("c_cur"),
            F.sum("c").over(wcur).cast("long").alias("n_cur"),
        )
    )
    p_cur = F.col("c_cur").cast("double") / F.col("n_cur")
    p_ref = F.col("c_ref").cast("double") / F.col("n_ref")
    terms = cur.join(F.broadcast(ref), "bin").select(
        "wk",
        F.round((p_cur - p_ref) * F.log(p_cur / p_ref) * 1000000)
        .cast("long")
        .alias("psi_term_micro"),
    )
    return (
        terms.groupBy("wk")
        .agg(
            F.sum("psi_term_micro").cast("long").alias("psi_micro"),
            F.count(F.lit(1)).alias("n_bins_compared"),
        )
        .orderBy("wk")
    )


# ---------------------------------------------------------------------------
# Peak detection with prominence on the daily revenue series
# ---------------------------------------------------------------------------

_PEAKS_ORACLE = f"""
WITH daily AS (
  SELECT DATEDIFF('day', DATE '1996-01-01', CAST(l_shipdate AS DATE)) AS d,
         CAST(SUM({CENTS_SQL.format(expr="l_extendedprice * (1 - l_discount)")})
              AS BIGINT) AS y
  FROM lineitem
  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-07-01'
  GROUP BY 1
),
ctx AS (
  SELECT d, y,
         LAG(y, 1)  OVER w AS y_m1, LAG(y, 2)  OVER w AS y_m2,
         LEAD(y, 1) OVER w AS y_p1, LEAD(y, 2) OVER w AS y_p2,
         MIN(y) OVER (ORDER BY d ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
           AS valley_l,
         MIN(y) OVER (ORDER BY d ROWS BETWEEN 1 FOLLOWING AND 7 FOLLOWING)
           AS valley_r
  FROM daily
  WINDOW w AS (ORDER BY d)
),
peaks AS (
  SELECT d, y,
         y - GREATEST(valley_l, valley_r) AS prominence_cents
  FROM ctx
  WHERE y > y_m1 AND y > y_m2 AND y > y_p1 AND y > y_p2
    AND valley_l IS NOT NULL AND valley_r IS NOT NULL
)
SELECT d AS day_idx, CAST(y AS BIGINT) / 100.0 AS peak_dollars,
       CAST(prominence_cents AS BIGINT) / 100.0 AS prominence_dollars
FROM peaks
WHERE prominence_cents > 0
ORDER BY prominence_cents DESC, d
LIMIT 10
"""


@register(
    "t_peak_detection",
    oracle=_PEAKS_ORACLE,
    tags=("W2", "W3", "O2", "F2"),
)
def t_peak_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 most prominent peaks in the daily revenue series: a local
    maximum over a ±2-day neighborhood, scored by PROMINENCE (height
    above the deeper of the two flanking 7-day valleys) — the
    signal-processing definition that separates real demand spikes
    from ripple, and the labeling pass ahead of anomaly triage or
    event-correlation ("what launched that day?").

    Determinism & scale — one combinable groupBy(day) over the fact;
    neighborhood tests and both valley minima are frame-bounded windows
    over the ≤181-row calendar rollup; everything stays exact integer
    cents until the two display divisions. Edge days (incomplete
    valleys) are excluded rather than padded — a peak needs real
    flanks. Tie-break on (prominence desc, day) makes the top-10 total
    order deterministic."""
    li = load_table(spark, sf_dir, "lineitem")
    daily = (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1996-07-01")
        )
        .groupBy(
            F.datediff(F.col("l_shipdate").cast("date"), F.lit("1996-01-01")).alias(
                "d"
            )
        )
        .agg(
            F.sum(cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            .alias("y")
        )
    )
    w = Window.orderBy("d")
    wl = Window.orderBy("d").rowsBetween(-7, -1)
    wr = Window.orderBy("d").rowsBetween(1, 7)
    ctx = daily.select(
        "d",
        "y",
        F.lag("y", 1).over(w).alias("y_m1"),
        F.lag("y", 2).over(w).alias("y_m2"),
        F.lead("y", 1).over(w).alias("y_p1"),
        F.lead("y", 2).over(w).alias("y_p2"),
        F.min("y").over(wl).alias("valley_l"),
        F.min("y").over(wr).alias("valley_r"),
    )
    peaks = ctx.filter(
        (F.col("y") > F.col("y_m1"))
        & (F.col("y") > F.col("y_m2"))
        & (F.col("y") > F.col("y_p1"))
        & (F.col("y") > F.col("y_p2"))
        & F.col("valley_l").isNotNull()
        & F.col("valley_r").isNotNull()
    ).select(
        "d",
        "y",
        (F.col("y") - F.greatest(F.col("valley_l"), F.col("valley_r"))).alias(
            "prominence_cents"
        ),
    )
    return (
        peaks.filter(F.col("prominence_cents") > 0)
        .select(
            F.col("d").alias("day_idx"),
            (F.col("y") / 100.0).alias("peak_dollars"),
            (F.col("prominence_cents") / 100.0).alias("prominence_dollars"),
            "prominence_cents",
        )
        .orderBy(F.col("prominence_cents").desc(), F.col("day_idx"))
        .limit(10)
        .drop("prominence_cents")
    )


# ---------------------------------------------------------------------------
# Rolling-origin forecast backtest (4 expanding-window folds)
# ---------------------------------------------------------------------------

_ROLLING_ORIGIN_ORACLE = f"""
WITH daily AS (
  SELECT DATEDIFF('day', DATE '1996-01-01', CAST(l_shipdate AS DATE)) AS d,
         CAST(SUM({CENTS_SQL.format(expr="l_extendedprice * (1 - l_discount)")})
              AS BIGINT) AS y
  FROM lineitem
  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-05-26'
  GROUP BY 1
),
folds AS (
  SELECT f.fold, d, y
  FROM daily, UNNEST([1, 2, 3, 4]) AS f(fold)
),
scored AS (
  SELECT a.fold, a.d, a.y, b.y AS yhat
  FROM (SELECT * FROM folds
        WHERE d >= 70 + (fold - 1) * 21 AND d < 70 + fold * 21) a
  JOIN daily b ON b.d = a.d - 7
)
SELECT fold,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(SUM(ABS(y - yhat)) AS BIGINT) / 100.0 / COUNT(*) AS mae_dollars,
       CAST(SUM(CASE WHEN y >= yhat THEN y - yhat ELSE yhat - y END) * 1000000
            // CAST(SUM(y) AS BIGINT) AS BIGINT) AS wape_ppm
FROM scored
GROUP BY fold
ORDER BY fold
"""


@register(
    "t_rolling_origin_backtest",
    oracle=_ROLLING_ORIGIN_ORACLE,
    tags=("A1", "J10", "F2", "P4"),
)
def t_rolling_origin_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-origin (expanding-window) backtest of the lag-7
    seasonal-naive forecast: four consecutive 21-day test folds, each
    scored with MAE and WAPE — the forecast-evaluation protocol that
    respects time (no fold ever sees its future), and the difference
    between "the model scored well once" and "the model scores well
    EVERY month" (`e_snaive_forecast_backtest` is one fold of this).

    Determinism & scale — one combinable groupBy(day) over the fact;
    fold membership is pure integer arithmetic on the day index
    (explode over 4 fold literals, filter to each fold's window);
    scoring is the lag-7 equi-join within the bounded rollup; MAE/WAPE
    derive from exact cents (WAPE as integer ppm floor division)."""
    li = load_table(spark, sf_dir, "lineitem")
    daily = (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1996-05-26")
        )
        .groupBy(
            F.datediff(F.col("l_shipdate").cast("date"), F.lit("1996-01-01")).alias(
                "d"
            )
        )
        .agg(
            F.sum(cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            .alias("y")
        )
    )
    folds = daily.select(
        F.explode(F.array(*[F.lit(i) for i in (1, 2, 3, 4)])).alias("fold"),
        "d",
        "y",
    ).filter(
        (F.col("d") >= 70 + (F.col("fold") - 1) * 21)
        & (F.col("d") < 70 + F.col("fold") * 21)
    )
    b = daily.select(F.col("d").alias("bd"), F.col("y").alias("yhat"))
    scored = folds.join(b, F.col("bd") == F.col("d") - 7).select(
        "fold", "d", "y", "yhat"
    )
    return (
        scored.groupBy("fold")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            (
                F.sum(F.abs(F.col("y") - F.col("yhat"))).cast("long")
                / 100.0
                / F.count(F.lit(1))
            ).alias("mae_dollars"),
            F.expr(
                "SUM(CASE WHEN y >= yhat THEN y - yhat ELSE yhat - y END)"
                " * 1000000 DIV SUM(y)"
            ).alias("wape_ppm"),
        )
        .orderBy("fold")
    )


# ---------------------------------------------------------------------------
# Spike root-cause drilldown: which dimension drove the anomalous day
# ---------------------------------------------------------------------------

_SPIKE_DRILLDOWN_ORACLE = f"""
WITH daily AS (
  SELECT CAST(l_shipdate AS DATE) AS day,
         CAST(SUM({CENTS_SQL.format(expr="l_extendedprice * (1 - l_discount)")})
              AS BIGINT) AS y
  FROM lineitem
  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-07-01'
  GROUP BY 1
),
spike AS (
  SELECT day FROM daily ORDER BY y DESC, day LIMIT 1
),
base_days AS (
  SELECT d.day FROM daily d CROSS JOIN spike s
  WHERE d.day >= s.day - INTERVAL 7 DAY AND d.day < s.day
),
by_dim AS (
  SELECT l_returnflag AS dim_value,
         CAST(SUM(CASE WHEN CAST(l_shipdate AS DATE) = (SELECT day FROM spike)
                       THEN {CENTS_SQL.format(expr="l_extendedprice * (1 - l_discount)")}
                       ELSE 0 END) AS BIGINT) AS spike_cents,
         CAST(SUM(CASE WHEN CAST(l_shipdate AS DATE) IN (SELECT day FROM base_days)
                       THEN {CENTS_SQL.format(expr="l_extendedprice * (1 - l_discount)")}
                       ELSE 0 END) AS BIGINT) AS base_cents
  FROM lineitem
  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-07-01'
  GROUP BY l_returnflag
),
tot AS (
  SELECT CAST(SUM(spike_cents) AS BIGINT) AS spike_tot,
         CAST(SUM(base_cents) AS BIGINT) AS base_tot,
         CAST((SELECT COUNT(*) FROM base_days) AS BIGINT) AS n_base_days
  FROM by_dim
)
SELECT dim_value,
       spike_cents / 100.0 AS spike_dollars,
       ROUND(CAST(base_cents AS DOUBLE) / n_base_days / 100, 6)
         AS baseline_daily_dollars,
       ROUND((spike_cents - CAST(base_cents AS DOUBLE) / n_base_days) / 100, 6)
         AS delta_dollars,
       ROUND((spike_cents - CAST(base_cents AS DOUBLE) / n_base_days)
             / ((spike_tot - CAST(base_tot AS DOUBLE) / n_base_days) / 100)
             / 100, 6) AS share_of_spike
FROM by_dim CROSS JOIN tot
ORDER BY dim_value
"""


@register(
    "e_spike_root_cause_drilldown",
    oracle=_SPIKE_DRILLDOWN_ORACLE,
    tags=("A7", "A1", "O2", "F2"),
)
def e_spike_root_cause_drilldown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Root-cause drilldown for the biggest revenue day of H1 1996:
    each return-flag segment's spike-day revenue vs its trailing-7-day
    daily baseline, with the segment's SHARE of the total anomaly —
    the 'which dimension drove the spike?' decomposition an on-call
    analyst runs right after `t_peak_detection` fires. Shares sum to 1
    across segments by construction (each segment's delta over the
    total delta).

    Determinism & scale — the spike day is a deterministic argmax
    (revenue desc, day tie-break) over the calendar rollup; the
    drilldown is ONE conditional-aggregate pass over the fact per
    dimension (spike-day vs baseline-window sums side by side), so
    adding dimensions adds columns, not scans. All inputs exact cents;
    the share division is the one float step, round-6."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    half = li.filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-07-01")
    )
    daily = half.groupBy(F.col("l_shipdate").cast("date").alias("day")).agg(
        F.sum(rev).alias("y")
    )
    spike_day = (
        daily.orderBy(F.col("y").desc(), F.col("day")).limit(1).first().day
    )
    import datetime as _dt

    base_lo = spike_day - _dt.timedelta(days=7)
    by_dim = half.groupBy(F.col("l_returnflag").alias("dim_value")).agg(
        F.sum(
            F.when(F.col("l_shipdate").cast("date") == F.lit(spike_day), rev)
            .otherwise(0)
        ).alias("spike_cents"),
        F.sum(
            F.when(
                (F.col("l_shipdate").cast("date") >= F.lit(base_lo))
                & (F.col("l_shipdate").cast("date") < F.lit(spike_day)),
                rev,
            ).otherwise(0)
        ).alias("base_cents"),
    )
    n_base_days = daily.filter(
        (F.col("day") >= F.lit(base_lo)) & (F.col("day") < F.lit(spike_day))
    ).count()
    tot = by_dim.agg(
        F.sum("spike_cents").alias("spike_tot"),
        F.sum("base_cents").alias("base_tot"),
    )
    base_daily = F.col("base_cents").cast("double") / n_base_days
    tot_delta = (
        F.col("spike_tot") - F.col("base_tot").cast("double") / n_base_days
    ) / 100
    return (
        by_dim.crossJoin(F.broadcast(tot))
        .select(
            "dim_value",
            (F.col("spike_cents") / 100.0).alias("spike_dollars"),
            F.round(base_daily / 100, 6).alias("baseline_daily_dollars"),
            F.round((F.col("spike_cents") - base_daily) / 100, 6).alias(
                "delta_dollars"
            ),
            F.round(
                (F.col("spike_cents") - base_daily) / tot_delta / 100, 6
            ).alias("share_of_spike"),
        )
        .orderBy("dim_value")
    )


# --- T3/T4: native session_window + in-session ordered funnel ---------------

_SESSION_FUNNEL_ORACLE = """
WITH marked AS (
  SELECT user_id, ts, event_type,
         CASE WHEN EPOCH_US(ts) - EPOCH_US(LAG(ts) OVER (
                PARTITION BY user_id ORDER BY ts, event_id))
              > 1800 * 1000000 OR LAG(ts) OVER (
                PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events
),
sess AS (
  SELECT user_id, ts, event_type,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS sid
  FROM marked
),
per_session AS (
  SELECT user_id, sid,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         MIN(CASE WHEN event_type = 'view' THEN EPOCH_US(ts) END) AS v_us,
         MIN(CASE WHEN event_type = 'click' THEN EPOCH_US(ts) END) AS c_us,
         MIN(CASE WHEN event_type = 'purchase' THEN EPOCH_US(ts) END) AS p_us
  FROM sess GROUP BY user_id, sid
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(CASE WHEN v_us IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS sessions_with_view,
       CAST(SUM(CASE WHEN v_us IS NOT NULL AND c_us IS NOT NULL
                      AND v_us < c_us THEN 1 ELSE 0 END) AS BIGINT)
         AS view_then_click,
       CAST(SUM(CASE WHEN v_us IS NOT NULL AND c_us IS NOT NULL
                      AND p_us IS NOT NULL AND v_us < c_us AND c_us < p_us
                     THEN 1 ELSE 0 END) AS BIGINT) AS full_funnel,
       CAST(SUM(CASE WHEN v_us IS NOT NULL AND c_us IS NOT NULL
                      AND p_us IS NOT NULL AND v_us < c_us AND c_us < p_us
                     THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT)
         AS full_funnel_ppm,
       CAST(MAX(n_events) AS BIGINT) AS max_session_events
FROM per_session
"""


@register(
    "t_session_window_funnel",
    oracle=_SESSION_FUNNEL_ORACLE,
    tags=("T3", "T4", "A7", "W2", "F2"),
)
def t_session_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel INSIDE native session windows: per 30-minute-gap
    session, did the user view, then click, then purchase — strictly
    ordered by first occurrence — with the corpus-level completion
    rate. Combines the two things product analytics always wants
    together (sessionization + ordered funnel) on the engine's NATIVE
    session_window operator, while the oracle derives identical
    sessions from the running-gap-sum spelling — so the query also
    PROVES the native operator's merge semantics equal the textbook
    rewrite.

    Scale design: session_window is one user-keyed shuffle; per-session
    stage ordering uses MIN(epoch-µs) per stage (exact integers, total
    order (ts, event_id) in the oracle's LAG); the final rollup is one
    combinable pass to a 1-row summary with exact ppm."""
    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    per_session = (
        e.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.min(F.when(F.col("event_type") == "view", us)).alias("v_us"),
            F.min(F.when(F.col("event_type") == "click", us)).alias("c_us"),
            F.min(F.when(F.col("event_type") == "purchase", us)).alias(
                "p_us"
            ),
        )
    )
    v, c, p = F.col("v_us"), F.col("c_us"), F.col("p_us")
    full = (
        v.isNotNull()
        & c.isNotNull()
        & p.isNotNull()
        & (v < c)
        & (c < p)
    )
    return per_session.agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum(F.when(v.isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("sessions_with_view"),
        F.sum(
            F.when(v.isNotNull() & c.isNotNull() & (v < c), 1).otherwise(0)
        )
        .cast("long")
        .alias("view_then_click"),
        F.sum(F.when(full, 1).otherwise(0)).cast("long").alias(
            "full_funnel"
        ),
        F.expr(
            "SUM(CASE WHEN v_us IS NOT NULL AND c_us IS NOT NULL "
            "AND p_us IS NOT NULL AND v_us < c_us AND c_us < p_us "
            "THEN 1 ELSE 0 END) * 1000000 DIV COUNT(*)"
        )
        .cast("long")
        .alias("full_funnel_ppm"),
        F.max("n_events").cast("long").alias("max_session_events"),
    )


# --- T2: sliding 14d/7d window aggregation + overlap-aware WoW growth -------

_SLIDING_WOW_ORACLE = """
WITH days AS (
  SELECT DATEDIFF('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS d,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS pc
  FROM orders
  WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
),
assigned AS (
  SELECT u.s AS win_start_day, pc
  FROM days, UNNEST([ (d // 7) * 7, (d // 7) * 7 - 7 ]) AS u(s)
  WHERE d >= u.s AND d < u.s + 14
),
win AS (
  SELECT win_start_day,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(pc) AS BIGINT) AS rev_cents
  FROM assigned GROUP BY win_start_day
),
grown AS (
  SELECT win_start_day, n_orders, rev_cents,
         LAG(rev_cents, 1) OVER (ORDER BY win_start_day) AS prev_rev
  FROM win
)
SELECT CAST(win_start_day AS BIGINT) AS win_start_day,
       n_orders, rev_cents,
       CAST(prev_rev AS BIGINT) AS prev_window_rev_cents,
       CAST(CASE WHEN prev_rev > 0
            THEN (rev_cents - prev_rev) * 1000000 // prev_rev END AS BIGINT)
         AS wow_growth_ppm
FROM grown
ORDER BY win_start_day
"""


@register(
    "t_sliding_window_wow",
    oracle=_SLIDING_WOW_ORACLE,
    tags=("T2", "T1", "W2", "A1", "F2"),
)
def t_sliding_window_wow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 14-day windows advancing 7 days (every order lands in
    EXACTLY two windows) via the native F.window(slide) operator, plus
    window-over-window growth — the smoothed WoW readout that tumbling
    weeks cannot give (each comparison shares 7 days of data, halving
    variance). The oracle states the window-assignment arithmetic
    explicitly — start ∈ {⌊d/7⌋·7, ⌊d/7⌋·7 − 7} relative to the Unix
    epoch, which IS Spark's documented window origin — so a silent
    change in alignment or overlap fan-out fails the hash.

    Scale design: the 2× window fan-out happens map-side inside the
    window operator (bounded constant), one combinable groupBy per
    window; the LAG runs over the ≤54-row calendar-bounded window
    spine; growth is exact integer ppm."""
    orders = load_table(spark, sf_dir, "orders")
    win = (
        orders.filter(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1997-01-01")
        )
        .groupBy(F.window("o_orderdate", "14 days", "7 days").alias("w"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(cents(F.col("o_totalprice"))).cast("long").alias(
                "rev_cents"
            ),
        )
        .select(
            F.datediff(
                F.col("w.start").cast("date"), F.lit("1970-01-01")
            )
            .cast("long")
            .alias("win_start_day"),
            "n_orders",
            "rev_cents",
        )
    )
    grown = win.select(
        "*",
        F.lag("rev_cents", 1)
        .over(Window.orderBy("win_start_day"))
        .alias("prev_rev"),
    )
    return grown.select(
        "win_start_day",
        "n_orders",
        "rev_cents",
        F.col("prev_rev").cast("long").alias("prev_window_rev_cents"),
        F.when(
            F.col("prev_rev") > 0,
            F.expr("(rev_cents - prev_rev) * 1000000 DIV prev_rev"),
        )
        .cast("long")
        .alias("wow_growth_ppm"),
    ).orderBy("win_start_day")


# --- T2, third wave: 6-hour windows sliding hourly ---------------------------

_SLIDE_6H_ORACLE = f"""
WITH e AS (
  SELECT EPOCH_US(ts) // 1000000 AS es,
         {CENTS_SQL.format(expr="value")} AS v_cents
  FROM events WHERE event_type = 'purchase'
),
exploded AS (
  SELECT ((es // 3600) - t.k) * 3600 AS win_start_epoch, v_cents
  FROM e CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(0, 5)) AS k) t
)
SELECT CAST(win_start_epoch AS BIGINT) AS win_start_epoch,
       CAST(COUNT(*) AS BIGINT)        AS n_purchases,
       CAST(SUM(v_cents) AS BIGINT) / 100.0 AS total_value
FROM exploded
GROUP BY 1
ORDER BY win_start_epoch
"""


@register(
    "t_sliding_6h_hourly",
    oracle=_SLIDE_6H_ORACLE,
    tags=("T2", "T1", "A1", "F2"),
)
def t_sliding_6h_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2, third wave: 6-hour windows advancing every hour (fan-out 6 —
    the dashboard 'rolling 6h' readout) over purchase events, stated
    against an oracle that spells out Spark's window-assignment
    arithmetic explicitly: an event at epoch second `es` belongs to the
    six epoch-aligned starts (⌊es/3600⌋ − k)·3600, k ∈ 0..5. Any silent
    change in origin, overlap count, or boundary inclusivity
    hash-fails.

    Scale: the ×6 fan-out is map-side inside the window operator;
    aggregation stays combinable per (window) key."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.filter(F.col("event_type") == "purchase")
        .groupBy(F.window("ts", "6 hours", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_purchases"),
            (F.sum(cents(F.col("value"))).cast("long") / 100.0).alias(
                "total_value"
            ),
        )
        .select(
            F.unix_seconds(F.col("w.start").cast("timestamp")).alias(
                "win_start_epoch"
            ),
            "n_purchases",
            "total_value",
        )
        .orderBy("win_start_epoch")
    )


# --- T3, third wave: session_window keyed by (user, event type) -------------

_SESSION_TYPE_ORACLE = """
WITH flagged AS (
  SELECT user_id, event_type, ts,
    CASE WHEN LAG(ts) OVER w IS NULL
           OR EPOCH_US(ts) - EPOCH_US(LAG(ts) OVER w) > 900 * 1000000
         THEN 1 ELSE 0 END AS is_start
  FROM events
  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, event_type, ts,
    SUM(is_start) OVER (PARTITION BY user_id, event_type ORDER BY ts
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged
),
per_session AS (
  SELECT user_id, event_type, sid, COUNT(*) AS n_events
  FROM sessions GROUP BY user_id, event_type, sid
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT)            AS n_sessions,
       CAST(SUM(n_events) AS BIGINT)       AS n_events,
       CAST(SUM(n_events) * 1000000 // COUNT(*) AS BIGINT)
                                           AS events_per_session_ppm,
       CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
                                           AS n_solo_sessions
FROM per_session
GROUP BY event_type
ORDER BY event_type
"""


@register(
    "t_session_window_per_type",
    oracle=_SESSION_TYPE_ORACLE,
    tags=("T3", "T4", "A1", "A8"),
)
def t_session_window_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3, third wave: session_window keyed by a COMPOSITE (user, event
    type) — each activity type sessionizes independently (a purchase
    burst doesn't extend a browsing session), which is the
    per-surface-session model product analytics actually uses. 15-minute
    gap; the rollup compares session density across types in exact
    integer ppm.

    Scale: session_window is a native stateful operator — one shuffle on
    the composite key, interval merge inside the state store; the
    per-type rollup is combinable."""
    events = load_table(spark, sf_dir, "events")
    per_session = (
        events.groupBy(
            F.session_window("ts", "15 minutes").alias("sw"),
            "user_id",
            "event_type",
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    )
    return (
        per_session.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            F.sum("n_events").cast("long").alias("n_events"),
            F.expr(
                "CAST(SUM(n_events) * 1000000 DIV COUNT(*) AS BIGINT)"
            ).alias("events_per_session_ppm"),
            F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_solo_sessions"),
        )
        .orderBy("event_type")
    )


# --- T2, fourth wave: 4h/2h sliding windows with grand-total share ----------

_SLIDE_SHARE_ORACLE = f"""
WITH e AS (
  SELECT EPOCH_US(ts) // 1000000 AS es,
         {CENTS_SQL.format(expr="value")} AS v_cents
  FROM events WHERE event_type = 'view'
),
tot AS (SELECT SUM(v_cents) AS all_cents FROM e),
exploded AS (
  SELECT ((es // 7200) - t.k) * 7200 AS win_start_epoch, v_cents
  FROM e CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(0, 1)) AS k) t
)
SELECT CAST(win_start_epoch AS BIGINT) AS win_start_epoch,
       CAST(COUNT(*) AS BIGINT)        AS n_views,
       CAST(SUM(v_cents) AS BIGINT)    AS win_cents,
       CAST(SUM(v_cents) * 10000 // (2 * (SELECT all_cents FROM tot))
            AS BIGINT)                 AS share_bp
FROM exploded
GROUP BY 1
ORDER BY win_start_epoch
"""


@register(
    "t_sliding_share_4h",
    oracle=_SLIDE_SHARE_ORACLE,
    tags=("T2", "T1", "A1", "A2", "F2"),
)
def t_sliding_share_4h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2, fourth wave: 4-hour windows sliding every 2 hours (fan-out
    exactly 2) over view events, each window annotated with its exact
    basis-point share of the corpus total — the two-grain pattern
    (window rollup + global denominator) in one plan. The oracle spells
    out the assignment arithmetic (k in 0..1 back-shifts) and the
    doubled denominator (every event feeds 2 windows), so a fan-out bug
    on either side breaks the hash.

    Scale: the slide fan-out is a bounded 2x row multiplier BEFORE a
    combinable aggregate; the global total is a 1-row broadcast, not a
    window over all rows."""
    events = load_table(spark, sf_dir, "events")
    views = events.filter(F.col("event_type") == "view")
    total = views.agg(F.sum(cents(F.col("value"))).alias("all_cents"))
    win = (
        views.groupBy(F.window("ts", "4 hours", "2 hours").alias("w"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_views"),
            F.sum(cents(F.col("value"))).cast("long").alias("win_cents"),
        )
    )
    return (
        win.crossJoin(F.broadcast(total))
        .select(
            F.unix_seconds(F.col("w.start").cast("timestamp")).alias(
                "win_start_epoch"
            ),
            "n_views",
            "win_cents",
            F.expr("win_cents * 10000 DIV (2 * all_cents)").alias("share_bp"),
        )
        .orderBy("win_start_epoch")
    )


# --- T3, fourth wave: session duration distribution --------------------------

_SESSION_BUCKET_ORACLE = """
WITH flagged AS (
  SELECT user_id, ts,
    CASE WHEN LAG(ts) OVER w IS NULL
           OR EPOCH_US(ts) - EPOCH_US(LAG(ts) OVER w) > 1200 * 1000000
         THEN 1 ELSE 0 END AS is_start
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, ts,
    SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged
),
per_session AS (
  SELECT user_id, sid,
         EPOCH_US(MAX(ts)) // 1000000 - EPOCH_US(MIN(ts)) // 1000000 + 1200
           AS duration_sec,
         COUNT(*) AS n_events
  FROM sessions GROUP BY user_id, sid
)
SELECT CAST(LEAST(duration_sec // 600, 12) AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT)        AS n_sessions,
       CAST(SUM(n_events) AS BIGINT)   AS n_events,
       CAST(QUANTILE_CONT(n_events, 0.5) * 10 AS BIGINT) AS median_events_x10
FROM per_session
GROUP BY bucket
ORDER BY bucket
"""


@register(
    "t_session_duration_buckets",
    oracle=_SESSION_BUCKET_ORACLE,
    tags=("T3", "T4", "A8", "A1", "F3"),
)
def t_session_duration_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3, fourth wave: the session-LENGTH distribution — session_window
    (20-minute gap) per user, then sessions histogrammed into 10-minute
    duration buckets (capped at bucket 12) with an exact median of
    events-per-session in each bucket. Session end in Spark is
    last-event + gap; the oracle reconstructs the same duration from
    the gaps-and-islands form, so the two sessionizations must agree
    row-for-row before the histogram can hash-match.

    Scale: session state is per-user and watermark-evictable in the
    streaming twin; the histogram is a combinable second pass at
    session (not event) cardinality; F.percentile ≡ QUANTILE_CONT
    pinned at integer-x10 precision."""
    events = load_table(spark, sf_dir, "events")
    sessions = (
        events.groupBy("user_id", F.session_window("ts", "20 minutes").alias("sw"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            (
                F.unix_seconds(F.col("sw.end").cast("timestamp"))
                - F.unix_seconds(F.col("sw.start").cast("timestamp"))
            ).alias("duration_sec"),
            "n_events",
        )
    )
    return (
        sessions.groupBy(
            F.least(F.col("duration_sec") / 600, F.lit(12))
            .cast("long")
            .alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            F.sum("n_events").cast("long").alias("n_events"),
            (F.percentile("n_events", 0.5) * 10)
            .cast("long")
            .alias("median_events_x10"),
        )
        .orderBy("bucket")
    )


# --- T3+T2, fifth wave: session starts rolled into sliding windows -----------

_SESSION_SLIDE_ORACLE = """
WITH flagged AS (
  SELECT user_id, ts,
    CASE WHEN LAG(ts) OVER w IS NULL
           OR EPOCH_US(ts) - EPOCH_US(LAG(ts) OVER w) > 1800 * 1000000
         THEN 1 ELSE 0 END AS is_start
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, ts,
    SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged
),
per_session AS (
  SELECT user_id, sid,
         MIN(ts)  AS session_start,
         COUNT(*) AS n_events
  FROM sessions GROUP BY user_id, sid
),
exploded AS (
  SELECT ((EPOCH_US(session_start) // 1000000 // 10800) - t.k) * 10800
           AS win_start_epoch,
         n_events
  FROM per_session
  CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(0, 1)) AS k) t
)
SELECT CAST(win_start_epoch AS BIGINT) AS win_start_epoch,
       CAST(COUNT(*) AS BIGINT)        AS n_sessions,
       CAST(SUM(n_events) AS BIGINT)   AS n_events_sum
FROM exploded
GROUP BY 1
"""


@register(
    "t_session_sliding_density",
    oracle=_SESSION_SLIDE_ORACLE,
    tags=("T3", "T2"),
)
def t_session_sliding_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3+T2, fifth wave: TWO window operators stacked — per-user
    session_window (30-minute gap) produces sessions, then the session
    STARTS feed a 6h/3h SLIDING window (each start lands in exactly 2
    windows) counting concurrent session activity over time — the
    'how many sessions were being opened around hour X' density curve.

    Scale: session_window is one shuffle on user_id with interval merge
    in the state store; the sliding stage re-windows the already-tiny
    per-session frame (one row per session, not per event), so the
    second shuffle's input is orders of magnitude smaller than the
    fact table. The oracle states the same two stages with LAG-gap
    sessionization and integer epoch math."""
    events = load_table(spark, sf_dir, "events")
    per_session = (
        events.groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )
    )
    return (
        per_session.groupBy(
            F.window("session_start", "6 hours", "3 hours").alias("win")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            F.sum("n_events").cast("long").alias("n_events_sum"),
        )
        .select(
            F.unix_seconds(F.col("win.start").cast("timestamp")).alias(
                "win_start_epoch"
            ),
            "n_sessions",
            "n_events_sum",
        )
    )


# --- T4, sixth wave: time-to-first-purchase within session -------------------

_SESSION_LATENCY_ORACLE = """
WITH flagged AS (
  SELECT user_id, ts, event_type,
    CASE WHEN LAG(ts) OVER w IS NULL
           OR EPOCH_US(ts) - EPOCH_US(LAG(ts) OVER w) > 1800 * 1000000
         THEN 1 ELSE 0 END AS is_start
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, ts, event_type,
    SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged
),
per_session AS (
  SELECT user_id, sid,
    MIN(ts) AS session_start,
    MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
  FROM sessions GROUP BY user_id, sid
),
bucketed AS (
  SELECT CASE WHEN first_purchase IS NULL THEN -1
              ELSE (EPOCH_US(first_purchase) - EPOCH_US(session_start))
                     // 1000000 // 600 END AS latency_bucket
  FROM per_session
)
SELECT CAST(latency_bucket AS BIGINT) AS latency_bucket,
       CAST(COUNT(*) AS BIGINT)       AS n_sessions
FROM bucketed
GROUP BY 1
"""


@register(
    "t_session_purchase_latency",
    oracle=_SESSION_LATENCY_ORACLE,
    tags=("T4", "A7"),
)
def t_session_purchase_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4, sixth wave: gap-sessionize (30-min, the shared sessionize
    operator), then per session the latency from session start to the
    FIRST purchase, bucketed in 10-minute steps — purchase-free
    sessions land in bucket -1. The time-to-conversion-within-session
    histogram.

    Scale: one sort per user (the sessionize window), one combinable
    per-session agg (MIN and conditional MIN), one tiny histogram
    rollup; latency math is exact integer microseconds -> seconds ->
    bucket, floor semantics stated identically in the oracle."""
    from ..operators.sessionize import sessionize

    events = load_table(spark, sf_dir, "events")
    s = sessionize(
        events, key="user_id", ts="ts", gap_seconds=1800, tie_break="event_id"
    )
    per_session = s.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("first_purchase"),
    )
    bucketed = per_session.select(
        F.when(F.col("first_purchase").isNull(), F.lit(-1))
        .otherwise(
            F.expr(
                "(unix_micros(CAST(first_purchase AS TIMESTAMP))"
                " - unix_micros(CAST(session_start AS TIMESTAMP)))"
                " DIV 1000000 DIV 600"
            )
        )
        .cast("long")
        .alias("latency_bucket")
    )
    return bucketed.groupBy("latency_bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions")
    )


# --- T3+T6, seventh wave (depth): session stats enriched by segment -----------

_SESSION_SEGMENT_ORACLE = """
WITH flagged AS (
  SELECT user_id, ts,
    CASE WHEN LAG(ts) OVER w IS NULL
           OR EPOCH_US(ts) - EPOCH_US(LAG(ts) OVER w) > 1800 * 1000000
         THEN 1 ELSE 0 END AS is_start
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, ts,
    SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged
),
per_session AS (
  SELECT user_id, sid, CAST(COUNT(*) AS BIGINT) AS n
  FROM sessions GROUP BY user_id, sid
)
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT)  AS n_sessions,
       CAST(SUM(n) AS BIGINT)    AS n_events,
       CAST(COUNT(*) FILTER (WHERE n = 1) AS BIGINT) AS n_solo_sessions
FROM per_session JOIN customer ON user_id = c_custkey
GROUP BY c_mktsegment
"""


@register(
    "t_session_segment_enrich",
    oracle=_SESSION_SEGMENT_ORACLE,
    tags=("T3", "T6"),
)
def t_session_segment_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3+T6, seventh wave depth: native session_window sessions rolled
    up per customer SEGMENT — the dimension joins AFTER sessionization
    (the T6 enrich order at its batch twin: the join touches one row
    per session, not per event). Session identity comes from
    session_window(ts, 30 min) per user; the oracle reconstructs the
    identical sessions with the LAG-gap idiom.

    Scale: sessionize shuffles events once on user; the segment join
    then moves |sessions| rows against a broadcastable dim; the final
    rollup is a 5-key combinable agg."""
    e = load_table(spark, sf_dir, "events")
    sessions = (
        e.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select("user_id", "n")
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        sessions.join(c, sessions.user_id == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            F.sum("n").cast("long").alias("n_events"),
            F.count(F.when(F.col("n") == 1, 1))
            .cast("long")
            .alias("n_solo_sessions"),
        )
    )
