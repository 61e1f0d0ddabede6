"""Product-analytics shapes over `events`: conversion funnels and
cohort retention — the two queries every event warehouse runs daily.

Both are single-shuffle designs: everything is keyed by user_id, so the
heavy data moves once and all sequencing logic rides windows/aggregates
on that one partitioning. Week arithmetic is integer epoch-day math
(floor(days/7)) rather than engine week-truncation, so both engines
agree on boundaries by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from ..registry import register

# --- ordered conversion funnel ----------------------------------------------

_FUNNEL_ORACLE = """
WITH t1 AS (
  SELECT user_id, MIN(ts) FILTER (WHERE event_type = 'view') AS t_view
  FROM events GROUP BY user_id
),
t2 AS (
  SELECT e.user_id, t1.t_view, MIN(e.ts) AS t_click
  FROM events e JOIN t1 ON e.user_id = t1.user_id
  WHERE e.event_type = 'click' AND e.ts > t1.t_view
  GROUP BY e.user_id, t1.t_view
),
t3 AS (
  SELECT e.user_id, MIN(e.ts) AS t_purchase
  FROM events e JOIN t2 ON e.user_id = t2.user_id
  WHERE e.event_type = 'purchase' AND e.ts > t2.t_click
  GROUP BY e.user_id
)
SELECT COUNT(*) FILTER (WHERE t1.t_view IS NOT NULL)  AS n_view,
       COUNT(t2.user_id)                              AS n_click_after_view,
       COUNT(t3.user_id)                              AS n_purchase_after_click,
       ROUND(COUNT(t3.user_id) /
             CAST(COUNT(*) FILTER (WHERE t1.t_view IS NOT NULL) AS DOUBLE),
             6)                                       AS full_funnel_rate
FROM t1
LEFT JOIN t2 ON t1.user_id = t2.user_id
LEFT JOIN t3 ON t1.user_id = t3.user_id
"""


@register("e_funnel_ordered", oracle=_FUNNEL_ORACLE, tags=("T4", "A7", "W2"))
def e_funnel_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view → click → purchase: each step must happen
    strictly AFTER the user's first completion of the previous step
    (the ordering is what separates a funnel from three independent
    counts). Implemented as three stacked conditional-min windows over
    ONE hash(user_id) partitioning — the sequencing never re-shuffles,
    and at 100 TB the plan is scan + one exchange + window chain."""
    e = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    w = Window.partitionBy("user_id")
    staged = (
        e.withColumn(
            "t_view", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
        )
        .withColumn(
            "t_click",
            F.min(
                F.when(
                    (F.col("event_type") == "click") & (F.col("ts") > F.col("t_view")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "t_purchase",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") > F.col("t_click")),
                    F.col("ts"),
                )
            ).over(w),
        )
    )
    per_user = staged.groupBy("user_id").agg(
        F.first("t_view").alias("t_view"),
        F.first("t_click").alias("t_click"),
        F.first("t_purchase").alias("t_purchase"),
    )
    n_view = F.count(F.col("t_view"))
    n_purchase = F.count(F.col("t_purchase"))
    return per_user.agg(
        n_view.alias("n_view"),
        F.count(F.col("t_click")).alias("n_click_after_view"),
        n_purchase.alias("n_purchase_after_click"),
        F.round(n_purchase / n_view.cast("double"), 6).alias("full_funnel_rate"),
    )


# --- cohort retention matrix ------------------------------------------------

_RETENTION_ORACLE = """
WITH days AS (
  SELECT user_id,
         DATE_DIFF('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d
  FROM events
),
weeks AS (
  SELECT user_id, CAST(FLOOR(d / 7) AS BIGINT) AS w FROM days
),
cohorts AS (
  SELECT user_id, MIN(w) AS cohort_week FROM weeks GROUP BY user_id
)
SELECT c.cohort_week,
       CAST(w.w - c.cohort_week AS BIGINT) AS week_offset,
       COUNT(DISTINCT w.user_id)           AS n_active
FROM weeks w JOIN cohorts c ON w.user_id = c.user_id
GROUP BY c.cohort_week, week_offset
"""


@register("e_retention_cohorts", oracle=_RETENTION_ORACLE, tags=("T1", "A3", "W3"))
def e_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-seen epoch-week,
    counted distinct in each subsequent week. The cohort week is a min()
    window over the same hash(user_id) partitioning the activity rows
    already have — no second pass over the events, and the final
    (cohort, offset) aggregate is tiny. Weeks are floor(epoch_days/7):
    pure integer arithmetic, no engine week-start convention."""
    e = load_table(spark, sf_dir, "events").select("user_id", "ts")
    weeks = e.select(
        "user_id",
        F.floor(
            F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")) / 7
        ).alias("w"),
    )
    w_user = Window.partitionBy("user_id")
    with_cohort = weeks.withColumn("cohort_week", F.min("w").over(w_user))
    return with_cohort.groupBy(
        "cohort_week", (F.col("w") - F.col("cohort_week")).alias("week_offset")
    ).agg(F.count_distinct("user_id").alias("n_active"))


# --- event-sequence transition matrix ---------------------------------------

_MARKOV_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type,
         LEAD(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS next_type
  FROM events
),
trans AS (
  SELECT event_type AS from_type, next_type AS to_type, COUNT(*) AS n
  FROM seq WHERE next_type IS NOT NULL
  GROUP BY from_type, to_type
)
SELECT from_type, to_type, n,
       ROUND(n / CAST(SUM(n) OVER (PARTITION BY from_type) AS DOUBLE), 6) AS p
FROM trans
"""


@register("e_markov_transitions", oracle=_MARKOV_ORACLE, tags=("W2", "A1"))
def e_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: lead() pairs each event with its successor (ordered by
    ts with event_id as the total-order tie-break — without it two
    same-timestamp events would make the successor nondeterministic),
    then a global count + per-source-state normalization. The sequence
    pairing shuffles on user_id once; the transition matrix itself is
    |states|^2 rows — metadata-sized at any corpus scale."""
    e = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.withColumn("next_type", F.lead("event_type").over(w))
    trans = (
        seq.filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w_from = Window.partitionBy("from_type")
    return trans.select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(w_from).cast("double"), 6).alias("p"),
    )


# --- calendar densification (zero-filled daily activity) --------------------

_DENSE_ORACLE = """
WITH bounds AS (
  SELECT MIN(CAST(ts AS DATE)) AS d0, MAX(CAST(ts AS DATE)) AS d1 FROM events
),
calendar AS (
  SELECT CAST(UNNEST(GENERATE_SERIES(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
  FROM bounds
),
daily AS (
  SELECT CAST(ts AS DATE) AS day,
         COUNT(*)         AS n_events,
         COUNT(DISTINCT user_id) AS n_users
  FROM events WHERE event_type = 'purchase'
  GROUP BY day
)
SELECT CAST(c.day AS VARCHAR) AS day,
       COALESCE(d.n_events, 0) AS n_events,
       COALESCE(d.n_users, 0)  AS n_users,
       d.day IS NULL           AS zero_day
FROM calendar c LEFT JOIN daily d ON c.day = d.day
"""


@register("e_calendar_densify", oracle=_DENSE_ORACLE, tags=("F2", "F4", "J3"))
def e_calendar_densify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar densification: build the full day spine with
    sequence(min_date, max_date) + explode, left-join daily purchase
    aggregates onto it, and zero-fill the gaps — the step that makes
    time series chartable/joinable when some days have no rows. The
    spine is generated from a one-row bounds aggregate (never collected
    to the driver) and is days-sized; the events aggregate once on
    day. Zero-days are flagged so the oracle pins the gap positions,
    not just the totals."""
    e = load_table(spark, sf_dir, "events")
    bounds = e.agg(
        F.min(F.col("ts").cast("date")).alias("d0"),
        F.max(F.col("ts").cast("date")).alias("d1"),
    )
    calendar = bounds.select(
        F.explode(F.sequence("d0", "d1")).alias("day")
    )
    daily = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("user_id").alias("n_users"),
        )
    )
    return calendar.join(daily.withColumnRenamed("day", "dday"),
                         calendar.day == F.col("dday"), "left").select(
        F.col("day").cast("string").alias("day"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.coalesce("n_users", F.lit(0)).alias("n_users"),
        F.col("dday").isNull().alias("zero_day"),
    )


# --- A/B experiment lift ----------------------------------------------------

_AB_ORACLE = """
WITH assigned AS (
  SELECT user_id,
         CASE WHEN (user_id * 2654435761) % 100 < 50 THEN 'A' ELSE 'B' END AS arm,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
  FROM events GROUP BY user_id
),
arms AS (
  SELECT
    COUNT(*) FILTER (WHERE arm = 'A')                    AS n_a,
    COUNT(*) FILTER (WHERE arm = 'B')                    AS n_b,
    CAST(SUM(converted) FILTER (WHERE arm = 'A') AS BIGINT) AS conv_a,
    CAST(SUM(converted) FILTER (WHERE arm = 'B') AS BIGINT) AS conv_b
  FROM assigned
)
SELECT n_a, n_b, conv_a, conv_b,
       ROUND(conv_a / CAST(n_a AS DOUBLE), 6)  AS rate_a,
       ROUND(conv_b / CAST(n_b AS DOUBLE), 6)  AS rate_b,
       ROUND((conv_b / CAST(n_b AS DOUBLE)) /
             (conv_a / CAST(n_a AS DOUBLE)) - 1, 6) AS lift_b_over_a
FROM arms
"""


@register("e_ab_test_lift", oracle=_AB_ORACLE, tags=("A7", "P6", "A2"))
def e_ab_test_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: users are assigned to arms by
    multiplicative hash (deterministic — the assignment IS the
    randomization unit and must be identical on every rerun and
    engine), per-user conversion is a MAX over purchase events, and
    the arm summary pivots into one row with rates and relative lift.
    Two aggregations, both keyed small; at any scale the output is one
    row and the heavy pass is a single user-keyed combine."""
    e = load_table(spark, sf_dir, "events")
    assigned = e.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted")
    ).withColumn(
        "arm",
        F.when((F.col("user_id") * 2654435761) % 100 < 50, "A").otherwise("B"),
    )
    arms = assigned.agg(
        F.count_if(F.col("arm") == "A").alias("n_a"),
        F.count_if(F.col("arm") == "B").alias("n_b"),
        F.sum(F.when(F.col("arm") == "A", F.col("converted"))).cast("long").alias("conv_a"),
        F.sum(F.when(F.col("arm") == "B", F.col("converted"))).cast("long").alias("conv_b"),
    )
    rate_a = F.col("conv_a") / F.col("n_a").cast("double")
    rate_b = F.col("conv_b") / F.col("n_b").cast("double")
    return arms.select(
        "n_a", "n_b", "conv_a", "conv_b",
        F.round(rate_a, 6).alias("rate_a"),
        F.round(rate_b, 6).alias("rate_b"),
        F.round(rate_b / rate_a - 1, 6).alias("lift_b_over_a"),
    )


# --- rolling z-score anomaly detection --------------------------------------

_ZSCORE_W = 7  # trailing window (days), excluding the current day

_ANOMALY_ORACLE = f"""
WITH daily AS (
  SELECT DATE_DIFF('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
         COUNT(*) AS n
  FROM events WHERE event_type = 'error'
  GROUP BY d
),
rolled AS (
  SELECT d, n,
         COUNT(*)            OVER w AS w_cnt,
         CAST(SUM(n)  OVER w AS BIGINT) AS w_sum,
         CAST(SUM(n * n) OVER w AS BIGINT) AS w_sumsq
  FROM daily
  WINDOW w AS (ORDER BY d ROWS BETWEEN {_ZSCORE_W} PRECEDING AND 1 PRECEDING)
)
SELECT d, n, w_cnt,
       ROUND((n - w_sum / CAST(w_cnt AS DOUBLE)) /
             SQRT(GREATEST(w_sumsq / CAST(w_cnt AS DOUBLE)
                           - (w_sum / CAST(w_cnt AS DOUBLE))
                             * (w_sum / CAST(w_cnt AS DOUBLE)), 1e-9)),
             6) AS zscore
FROM rolled
WHERE w_cnt >= 3
"""


@register("e_anomaly_rolling_zscore", oracle=_ANOMALY_ORACLE, tags=("W3", "T1"))
def e_anomaly_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection on the daily error-count
    series: each day scored against the trailing 7-day window
    (excluding itself). Engine determinism: mean/variance are derived
    from INTEGER window sums (Σn, Σn²) — exact regardless of window
    evaluation order — with floats entering only in the final one-shot
    formula, then rounded. The daily series is tiny (one row per day),
    so the unpartitioned ORDER BY window is metadata-sized — the heavy
    pass is the per-day count, one shuffle of the raw events. A
    variance floor (1e-9) keeps the constant-window z finite in both
    engines."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "error")
    daily = e.groupBy(
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")).alias("d")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy("d").rowsBetween(-_ZSCORE_W, -1)
    rolled = daily.select(
        "d",
        "n",
        F.count(F.lit(1)).over(w).alias("w_cnt"),
        F.sum("n").over(w).cast("long").alias("w_sum"),
        F.sum(F.col("n") * F.col("n")).over(w).cast("long").alias("w_sumsq"),
    )
    mean = F.col("w_sum") / F.col("w_cnt").cast("double")
    var = F.greatest(
        F.col("w_sumsq") / F.col("w_cnt").cast("double") - mean * mean,
        F.lit(1e-9),
    )
    return rolled.filter(F.col("w_cnt") >= 3).select(
        "d",
        "n",
        "w_cnt",
        F.round((F.col("n") - mean) / F.sqrt(var), 6).alias("zscore"),
    )


# --- RFM customer segmentation ----------------------------------------------

_RFM_ORACLE = """
WITH per_user AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'purchase' THEN ts END)   AS last_purchase,
         COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)  AS frequency,
         CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
             THEN CAST(ROUND(value * 100) AS BIGINT) END), 0) AS BIGINT)
           AS monetary_cents
  FROM events GROUP BY user_id
),
buyers AS (SELECT * FROM per_user WHERE frequency > 0),
scored AS (
  SELECT user_id,
         NTILE(4) OVER (ORDER BY last_purchase DESC, user_id) AS r_quartile,
         NTILE(4) OVER (ORDER BY frequency DESC, user_id)     AS f_quartile,
         NTILE(4) OVER (ORDER BY monetary_cents DESC, user_id) AS m_quartile
  FROM buyers
)
SELECT r_quartile, f_quartile, m_quartile,
       COUNT(*)          AS n_users,
       MIN(user_id)      AS sample_user
FROM scored
GROUP BY r_quartile, f_quartile, m_quartile
"""


@register("e_rfm_segmentation", oracle=_RFM_ORACLE, tags=("W1", "A7", "A1"))
def e_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: purchasers quartiled on recency, frequency and
    monetary value (integer cents), bucketed into the 4x4x4 segment
    cube. Every NTILE rides a TOTAL order (metric + user_id tie-break)
    — without the tie-break, equal metrics straddle quartile borders
    arbitrarily per engine. The ntile windows are global-order but run
    over the per-user aggregate (one row per buyer), not the event
    stream — the aggregate-then-rank layering that keeps single-reducer
    windows metadata-sized."""
    e = load_table(spark, sf_dir, "events")
    is_p = F.col("event_type") == "purchase"
    per_user = e.groupBy("user_id").agg(
        F.max(F.when(is_p, F.col("ts"))).alias("last_purchase"),
        F.count(F.when(is_p, F.lit(1))).alias("frequency"),
        F.coalesce(
            F.sum(F.when(is_p, F.round(F.col("value") * 100).cast("long"))),
            F.lit(0),
        ).cast("long").alias("monetary_cents"),
    )
    buyers = per_user.filter(F.col("frequency") > 0)
    r_w = Window.orderBy(F.col("last_purchase").desc(), F.col("user_id"))
    f_w = Window.orderBy(F.col("frequency").desc(), F.col("user_id"))
    m_w = Window.orderBy(F.col("monetary_cents").desc(), F.col("user_id"))
    scored = buyers.select(
        "user_id",
        F.ntile(4).over(r_w).alias("r_quartile"),
        F.ntile(4).over(f_w).alias("f_quartile"),
        F.ntile(4).over(m_w).alias("m_quartile"),
    )
    return scored.groupBy("r_quartile", "f_quartile", "m_quartile").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.min("user_id").alias("sample_user"),
    )


# --- time-to-conversion distribution ----------------------------------------

_TTC_ORACLE = """
WITH firsts AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'signup' THEN ts END)   AS t_signup,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events GROUP BY user_id
),
latency AS (
  SELECT user_id,
         (EPOCH_US(t_purchase) - EPOCH_US(t_signup)) // 3600000000 AS hours
  FROM firsts
  WHERE t_signup IS NOT NULL AND t_purchase IS NOT NULL
    AND t_purchase >= t_signup
)
SELECT CAST(FLOOR(hours / 24) AS BIGINT) AS days_bucket,
       COUNT(*)                          AS n_users,
       CAST(MIN(hours) AS BIGINT)        AS min_hours,
       CAST(MAX(hours) AS BIGINT)        AS max_hours
FROM latency
GROUP BY days_bucket
"""


@register("e_time_to_conversion", oracle=_TTC_ORACLE, tags=("T4", "A1", "F2"))
def e_time_to_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-conversion distribution: hours from first signup to
    first purchase per user, bucketed into days — integer epoch math
    end to end (µs -> floor hours -> floor days), so bucket edges are
    identical on every engine. One user-keyed aggregate then a
    bucket-keyed rollup; users who purchased before signing up (data
    reality) are excluded explicitly rather than producing negative
    buckets."""
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("t_signup"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "t_purchase"
        ),
    )
    lat = firsts.filter(
        F.col("t_signup").isNotNull()
        & F.col("t_purchase").isNotNull()
        & (F.col("t_purchase") >= F.col("t_signup"))
    ).select(
        "user_id",
        F.floor(
            (
                F.unix_micros(F.col("t_purchase").cast("timestamp"))
                - F.unix_micros(F.col("t_signup").cast("timestamp"))
            )
            / 3600000000
        ).alias("hours"),
    )
    return lat.groupBy(
        F.floor(F.col("hours") / 24).cast("long").alias("days_bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_users"),
        F.min("hours").cast("long").alias("min_hours"),
        F.max("hours").cast("long").alias("max_hours"),
    )


# --- top user paths (first-3-event sequences) -------------------------------

_PATHS_ORACLE = """
WITH ranked AS (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
),
paths AS (
  SELECT user_id,
         STRING_AGG(event_type, '>' ORDER BY rn) AS path
  FROM ranked WHERE rn <= 3
  GROUP BY user_id
)
SELECT path, COUNT(*) AS n_users
FROM paths
GROUP BY path
ORDER BY n_users DESC, path
LIMIT 15
"""


@register("e_event_paths_topk", oracle=_PATHS_ORACLE, tags=("W1", "A9", "O2"))
def e_event_paths_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top onboarding paths: each user's first three events (total
    order: ts then event_id) concatenated into a path string, then the
    15 most common paths. The path build is rank-filter + ordered
    listagg on one user_id partitioning; the path-frequency table is at
    most |event_types|^3 rows, so the final top-k is metadata-sized.
    This is the sequence-mining query product teams run daily — and a
    5-state Markov chain (e_markov_transitions) summarizes what this
    query enumerates."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ranked = e.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 3)
    paths = ranked.groupBy("user_id").agg(
        F.expr("listagg(event_type, '>') WITHIN GROUP (ORDER BY rn)").alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy(F.col("n_users").desc(), F.col("path"))
        .limit(15)
    )


_REACH_ORACLE = """
WITH first_seen AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS d0
  FROM events GROUP BY user_id
),
new_per_day AS (
  SELECT d0 AS day, COUNT(*) AS n_new FROM first_seen GROUP BY d0
)
SELECT CAST(day AS VARCHAR) AS day, n_new,
       CAST(SUM(n_new) OVER (ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cumulative_users
FROM new_per_day
"""


@register("e_cumulative_reach", oracle=_REACH_ORACLE, tags=("A3", "T1", "W3"))
def e_cumulative_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users per day (the reach / growth curve).
    The naive form — COUNT(DISTINCT user) over an ever-growing window —
    re-deduplicates all history for every day and dies at scale. The
    scalable rewrite: distinct-over-time == each user counts exactly
    once, on their FIRST day — so min(date) per user, count per day,
    running sum. Two key-bounded aggregates plus a window over
    O(days) rows; no day ever re-reads another day's users."""
    e = load_table(spark, sf_dir, "events")
    first_seen = e.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("d0")
    )
    per_day = first_seen.groupBy(F.col("d0").alias("day")).agg(
        F.count(F.lit(1)).alias("n_new")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # ISO string on both engines: DuckDB DATE surfaces as a pandas
    # timestamp, Spark DATE as a date object — strings compare exactly.
    return per_day.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n_new",
        F.sum("n_new").over(w).cast("long").alias("cumulative_users"),
    )


_LINEAR_ATTR_ORACLE = """
WITH purch AS (
  SELECT event_id, user_id, ts,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
),
clicks AS (
  SELECT event_id AS click_id, user_id, ts AS c_ts
  FROM events WHERE event_type = 'click'
),
pairs AS (
  SELECT p.event_id, p.cents, c.click_id, c.c_ts
  FROM purch p JOIN clicks c
    ON p.user_id = c.user_id
   AND c.c_ts <= p.ts AND c.c_ts > p.ts - INTERVAL 1 HOUR
),
credits AS (
  SELECT click_id, c_ts,
         (cents * 1000000) // COUNT(*) OVER (PARTITION BY event_id)
           AS credit_micro
  FROM pairs
)
SELECT CAST(date_trunc('hour', c_ts) AS TIMESTAMP) AS click_hour,
       COUNT(*) AS n_credits,
       CAST(SUM(credit_micro) AS BIGINT) AS credit_micro_sum
FROM credits
GROUP BY 1
ORDER BY click_hour
"""


@register("e_linear_attribution", oracle=_LINEAR_ATTR_ORACLE, tags=("J7", "W3", "A1", "F2"))
def e_linear_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear (equal-split) marketing attribution — the third
    attribution model next to first-touch (e_cumulative_reach) and
    last-touch (j_asof_last_click): every click in the hour before a
    purchase gets an equal share of its value. Credit splits in
    integer MICRO-cents via exact long division (the remainder is
    deliberately dropped — deterministic on both engines, unlike a
    double divide whose sums would drift), with the per-purchase touch
    count from one window over the joined pairs. The join is
    user-equi + time-range — shuffles once on user_id; the per-user
    pair population is bounded by activity, never cross-user."""
    ev = load_table(spark, sf_dir, "events")
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        "ts",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("c_ts"),
    )
    pairs = purch.join(clicks, "user_id").filter(
        (F.col("c_ts") <= F.col("ts"))
        & (F.col("c_ts") > F.col("ts") - F.expr("INTERVAL 1 HOUR"))
    )
    wn = Window.partitionBy("event_id")
    credits = pairs.select(
        "click_id",
        "c_ts",
        F.expr("cents * 1000000").alias("scaled"),
        F.count(F.lit(1)).over(wn).alias("n_touch"),
    ).select("click_id", "c_ts", F.expr("scaled div n_touch").alias("credit_micro"))
    return (
        credits.groupBy(
            F.date_trunc("hour", "c_ts").cast("timestamp").alias("click_hour")
        )
        .agg(
            F.count(F.lit(1)).alias("n_credits"),
            F.sum("credit_micro").cast("long").alias("credit_micro_sum"),
        )
        .orderBy("click_hour")
    )


# --- sequence-pattern matching over per-user event journeys -----------------

_SEQPAT_ORACLE = """
WITH seq AS (
  SELECT user_id,
         STRING_AGG(event_type, '>' ORDER BY ts, event_id) AS path,
         COUNT(*) AS n_events
  FROM events GROUP BY user_id
)
SELECT user_id,
       CAST(n_events AS BIGINT) AS n_events,
       ARRAY_TO_STRING((STRING_SPLIT(path, '>'))[1:5], '>') AS path_head,
       REGEXP_MATCHES(path, 'signup.*purchase') AS signup_to_purchase,
       REGEXP_MATCHES(path, 'view.*click.*purchase') AS full_funnel,
       REGEXP_MATCHES(path, 'error>error') AS repeated_error
FROM seq ORDER BY user_id
"""


@register(
    "e_sequence_pattern_match",
    oracle=_SEQPAT_ORACLE,
    tags=("A9", "W2", "F1", "P6"),
)
def e_sequence_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-style sequence patterns without MATCH_RECOGNIZE:
    each user's journey becomes one ordered path string (event types
    joined by '>'), and row-pattern predicates become regexes over it —
    ordered conversion (signup...purchase), the full view→click→purchase
    funnel, and adjacent repeated errors.

    Scale design: ONE shuffle — the per-user groupBy; ordering comes
    from array_sort over (ts, event_id, type) structs inside the
    aggregated value, so no window/sort stage precedes the shuffle, and
    map-side partial aggregation batches rows before they move. The
    path string is bounded by a user's own event count (journey-sized,
    not corpus-sized); the checked output projects only the 5-step head
    plus booleans. The struct-sort + transform lambdas evaluate
    interpreted, but over journey-sized arrays — not the hot path."""
    ev = load_table(spark, sf_dir, "events")
    seq = (
        ev.groupBy("user_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "event_type"))
            ).alias("journey"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "user_id",
            F.col("n_events").cast("long").alias("n_events"),
            F.array_join(
                F.transform(F.col("journey"), lambda s: s["event_type"]), ">"
            ).alias("path"),
        )
    )
    return seq.select(
        "user_id",
        "n_events",
        F.array_join(
            F.slice(F.split(F.col("path"), ">"), 1, 5), ">"
        ).alias("path_head"),
        F.col("path").rlike("signup.*purchase").alias("signup_to_purchase"),
        F.col("path").rlike("view.*click.*purchase").alias("full_funnel"),
        F.col("path").rlike("error>error").alias("repeated_error"),
    ).orderBy("user_id")


# --- DAU/MAU stickiness -----------------------------------------------------

_STICKINESS_ORACLE = """
WITH ud AS (
  SELECT DISTINCT user_id, CAST(FLOOR(EPOCH(ts) / 86400) AS BIGINT) AS day
  FROM events
),
bounds AS (SELECT MIN(day) AS d0 FROM ud),
dau AS (SELECT day, COUNT(*) AS dau FROM ud GROUP BY day),
mau AS (
  SELECT m.day AS day, COUNT(DISTINCT u.user_id) AS mau
  FROM dau m JOIN ud u ON u.day BETWEEN m.day - 27 AND m.day
  GROUP BY m.day
)
SELECT d.day, d.dau, m.mau,
       ROUND(d.dau / CAST(m.mau AS DOUBLE), 6) AS stickiness
FROM dau d JOIN mau m ON d.day = m.day, bounds b
WHERE d.day >= b.d0 + 27
"""


@register("e_dau_mau_stickiness", oracle=_STICKINESS_ORACLE, tags=("A3", "A1", "W3"))
def e_dau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU stickiness per day (trailing 28-day MAU), reported for
    days with a complete window — the canonical engagement ratio.

    Scale design: COUNT(DISTINCT user) over a SLIDING window has no
    combinable form, so the scalable spelling is the contribution
    explode — each distinct (user, active-day) row contributes to the
    <=28 window-end days it is visible from, then ONE groupBy(day)
    count-distinct does the rest. Amplification is bounded at 28x the
    deduped activity table (already one row per user-day, far smaller
    than raw events); the alternative — a range join of days x activity
    — re-scans the activity table once per day. The oracle takes that
    quadratic-ish range-join form precisely because DuckDB can afford
    it at oracle scale."""
    ev = load_table(spark, sf_dir, "events")
    day = F.floor(
        F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(86_400_000_000)
    )
    ud = ev.select("user_id", day.alias("day")).distinct()
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    contrib = ud.select(
        "user_id",
        F.explode(F.sequence(F.col("day"), F.col("day") + 27)).alias("day"),
    )
    mau = contrib.groupBy("day").agg(F.count_distinct("user_id").alias("mau"))
    d0 = ud.agg(F.min("day").alias("d0"))
    return (
        dau.join(mau, "day")
        .crossJoin(F.broadcast(d0))
        .filter(F.col("day") >= F.col("d0") + 27)
        .select(
            "day",
            "dau",
            "mau",
            F.round(F.col("dau") / F.col("mau"), 6).alias("stickiness"),
        )
    )


# --- growth accounting (new / retained / resurrected / churn-adjacent) ------

_GROWTH_ORACLE = """
WITH ud AS (
  SELECT DISTINCT user_id, CAST(FLOOR(EPOCH(ts) / 86400) AS BIGINT) AS day
  FROM events
),
lagged AS (
  SELECT user_id, day,
         LAG(day) OVER (PARTITION BY user_id ORDER BY day) AS prev_day
  FROM ud
)
SELECT day,
       COUNT(*) FILTER (WHERE prev_day IS NULL)                 AS new_users,
       COUNT(*) FILTER (WHERE day - prev_day = 1)               AS retained,
       COUNT(*) FILTER (WHERE day - prev_day BETWEEN 2 AND 7)   AS returning,
       COUNT(*) FILTER (WHERE day - prev_day > 7)               AS resurrected,
       COUNT(*)                                                 AS active
FROM lagged
GROUP BY day
"""


@register("e_growth_accounting", oracle=_GROWTH_ORACLE, tags=("A1", "A7", "W2"))
def e_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily growth accounting: every active user-day is classified by
    the gap since that user's previous active day — new (no prior),
    retained (came back next day), returning (2-7 day gap), resurrected
    (>7 days) — the standard DAU-decomposition behind every growth
    dashboard.

    Scale design: one distinct over (user, day), one LAG window and the
    final day rollup all hash-partition by user_id / day with map-side
    combine on the counts — two shuffles total, no self-join of the
    activity table against itself (the naive spelling) and no per-day
    subqueries."""
    ev = load_table(spark, sf_dir, "events")
    day = F.floor(
        F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(86_400_000_000)
    )
    ud = ev.select("user_id", day.alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    lagged = ud.withColumn("prev_day", F.lag("day").over(w))
    gap = F.col("day") - F.col("prev_day")
    return lagged.groupBy("day").agg(
        F.count_if(F.col("prev_day").isNull()).alias("new_users"),
        F.count_if(gap == 1).alias("retained"),
        F.count_if((gap >= 2) & (gap <= 7)).alias("returning"),
        F.count_if(gap > 7).alias("resurrected"),
        F.count(F.lit(1)).alias("active"),
    )


# --- bounce rate ------------------------------------------------------------

_BOUNCE_ORACLE = """
WITH sessions AS (
  SELECT user_id, CAST(ts AS DATE) AS d, COUNT(*) AS n_events
  FROM events GROUP BY user_id, CAST(ts AS DATE)
)
SELECT COUNT(*) AS n_sessions,
       CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bounced,
       CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 1000000
            // COUNT(*) AS BIGINT) AS bounce_rate_ppm,
       CAST(SUM(n_events) AS BIGINT) AS tot_events
FROM sessions
"""


@register(
    "e_bounce_rate", oracle=_BOUNCE_ORACLE, tags=("A1", "A2", "A7")
)
def e_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounce rate: share of user-day sessions containing exactly one
    event — the single most-watched engagement-quality number in
    product analytics, and deliberately the SIMPLEST query in the
    registry's analytics family: one combinable (user, day) count,
    one global conditional rollup, exact integer ppm. Two shuffles
    total at any scale, the second over one row per session."""
    e = load_table(spark, sf_dir, "events")
    sessions = e.groupBy("user_id", F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    return sessions.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_bounced"),
        F.sum("n_events").cast("long").alias("tot_events"),
    ).select(
        "n_sessions",
        "n_bounced",
        F.expr("CAST(n_bounced * 1000000 DIV n_sessions AS BIGINT)").alias(
            "bounce_rate_ppm"
        ),
        "tot_events",
    )


# ---------------------------------------------------------------------------
# Exact Shapley-value channel attribution over coalition conversion rates
# ---------------------------------------------------------------------------

_SHAPLEY_ORACLE = """
WITH per_user AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS c,
         MAX(CASE WHEN event_type = 'view'     THEN 2 ELSE 0 END) AS v,
         MAX(CASE WHEN event_type = 'signup'   THEN 4 ELSE 0 END) AS s,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM events
  GROUP BY user_id
),
masked AS (
  SELECT c + v + s AS mask, conv FROM per_user WHERE c + v + s > 0
),
rates AS (
  SELECT mask,
         CAST(SUM(conv) AS BIGINT) * 1000000 // CAST(COUNT(*) AS BIGINT)
           AS conv_ppm,
         CAST(COUNT(*) AS BIGINT) AS n_users
  FROM masked GROUP BY mask
),
wide AS (
  SELECT
    CAST(COALESCE(MAX(CASE WHEN mask = 1 THEN conv_ppm END), 0) AS DOUBLE) AS v1,
    CAST(COALESCE(MAX(CASE WHEN mask = 2 THEN conv_ppm END), 0) AS DOUBLE) AS v2,
    CAST(COALESCE(MAX(CASE WHEN mask = 3 THEN conv_ppm END), 0) AS DOUBLE) AS v3,
    CAST(COALESCE(MAX(CASE WHEN mask = 4 THEN conv_ppm END), 0) AS DOUBLE) AS v4,
    CAST(COALESCE(MAX(CASE WHEN mask = 5 THEN conv_ppm END), 0) AS DOUBLE) AS v5,
    CAST(COALESCE(MAX(CASE WHEN mask = 6 THEN conv_ppm END), 0) AS DOUBLE) AS v6,
    CAST(COALESCE(MAX(CASE WHEN mask = 7 THEN conv_ppm END), 0) AS DOUBLE) AS v7,
    CAST(SUM(n_users) AS BIGINT) AS n_users
  FROM rates
)
SELECT channel, ROUND(shapley_ppm, 6) AS shapley_ppm, n_users,
       ROUND(v7_ppm, 6) AS grand_coalition_ppm,
       ROUND(efficiency_gap, 6) AS efficiency_gap
FROM (
  SELECT 'click' AS channel,
         (2 * (v1 - 0) + (v3 - v2) + (v5 - v4) + 2 * (v7 - v6)) / 6 AS shapley_ppm,
         n_users, v7 AS v7_ppm,
         ((2 * (v1 - 0) + (v3 - v2) + (v5 - v4) + 2 * (v7 - v6)) / 6
          + (2 * (v2 - 0) + (v3 - v1) + (v6 - v4) + 2 * (v7 - v5)) / 6
          + (2 * (v4 - 0) + (v5 - v1) + (v6 - v2) + 2 * (v7 - v3)) / 6) - v7
           AS efficiency_gap
  FROM wide
  UNION ALL
  SELECT 'view',
         (2 * (v2 - 0) + (v3 - v1) + (v6 - v4) + 2 * (v7 - v5)) / 6,
         n_users, v7,
         ((2 * (v1 - 0) + (v3 - v2) + (v5 - v4) + 2 * (v7 - v6)) / 6
          + (2 * (v2 - 0) + (v3 - v1) + (v6 - v4) + 2 * (v7 - v5)) / 6
          + (2 * (v4 - 0) + (v5 - v1) + (v6 - v2) + 2 * (v7 - v3)) / 6) - v7
  FROM wide
  UNION ALL
  SELECT 'signup',
         (2 * (v4 - 0) + (v5 - v1) + (v6 - v2) + 2 * (v7 - v3)) / 6,
         n_users, v7,
         ((2 * (v1 - 0) + (v3 - v2) + (v5 - v4) + 2 * (v7 - v6)) / 6
          + (2 * (v2 - 0) + (v3 - v1) + (v6 - v4) + 2 * (v7 - v5)) / 6
          + (2 * (v4 - 0) + (v5 - v1) + (v6 - v2) + 2 * (v7 - v3)) / 6) - v7
  FROM wide
) t
ORDER BY channel
"""


@register(
    "e_shapley_attribution",
    oracle=_SHAPLEY_ORACLE,
    tags=("A1", "A7", "P6", "O3"),
)
def e_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Shapley-value marketing attribution over three touch
    channels (click/view/signup): the characteristic function v(S) is
    the observed conversion rate of users whose exact contact set is S
    (v(∅)=0), and each channel's credit is the exact 3-player Shapley
    sum with weights (2,1,1,2)/6. The efficiency axiom — credits sum to
    v(grand coalition) — is emitted as `efficiency_gap` (0 up to float
    round-off), so the output proves its own bookkeeping.

    Scale design — Shapley attribution at 100 TB is NOT a per-user
    permutation walk: the coalition space is 2^channels (8 here),
    so the heavy work is one combinable per-user bitmask aggregation
    (the only shuffle of the fact) + one 7-row rate rollup; the
    factorial-weighted sums then run on a single pivoted row.
    Coalition rates are exact integer ppm (floor division on positive
    counts); the weighted sums are the only float step, identical
    expression trees both engines, round-6."""
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("c"),
        F.max(F.when(F.col("event_type") == "view", 2).otherwise(0)).alias("v"),
        F.max(F.when(F.col("event_type") == "signup", 4).otherwise(0)).alias("s"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "conv"
        ),
    )
    masked = per_user.select(
        (F.col("c") + F.col("v") + F.col("s")).alias("mask"), "conv"
    ).filter(F.col("mask") > 0)
    rates = masked.groupBy("mask").agg(
        F.expr("SUM(conv) * 1000000 DIV COUNT(*)").alias("conv_ppm"),
        F.count(F.lit(1)).alias("n_users"),
    )
    wide = rates.agg(
        *[
            F.coalesce(
                F.max(F.when(F.col("mask") == m, F.col("conv_ppm"))), F.lit(0)
            )
            .cast("double")
            .alias(f"v{m}")
            for m in range(1, 8)
        ],
        F.sum("n_users").alias("n_users"),
    )
    v = {m: F.col(f"v{m}") for m in range(1, 8)}
    shap = {
        "click": (2 * (v[1] - 0) + (v[3] - v[2]) + (v[5] - v[4]) + 2 * (v[7] - v[6])) / 6,
        "view": (2 * (v[2] - 0) + (v[3] - v[1]) + (v[6] - v[4]) + 2 * (v[7] - v[5])) / 6,
        "signup": (2 * (v[4] - 0) + (v[5] - v[1]) + (v[6] - v[2]) + 2 * (v[7] - v[3])) / 6,
    }
    total = shap["click"] + shap["view"] + shap["signup"]
    rows = [
        wide.select(
            F.lit(ch).alias("channel"),
            F.round(expr, 6).alias("shapley_ppm"),
            "n_users",
            F.round(v[7], 6).alias("grand_coalition_ppm"),
            F.round(total - v[7], 6).alias("efficiency_gap"),
        )
        for ch, expr in shap.items()
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out.orderBy("channel")


# ---------------------------------------------------------------------------
# Funnel with an exclusion step (signup -> purchase with no error between)
# ---------------------------------------------------------------------------

_EXCL_FUNNEL_ORACLE = """
WITH firsts AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup
  FROM events GROUP BY user_id
),
conv AS (
  SELECT f.user_id, f.t_signup,
         MIN(CASE WHEN e.event_type = 'purchase' AND e.ts > f.t_signup
                  THEN e.ts END) AS t_purchase
  FROM firsts f JOIN events e ON f.user_id = e.user_id
  WHERE f.t_signup IS NOT NULL
  GROUP BY f.user_id, f.t_signup
),
judged AS (
  SELECT c.user_id,
         c.t_purchase IS NOT NULL AS converted,
         CAST(COALESCE(SUM(CASE WHEN e.event_type = 'error'
                                 AND e.ts > c.t_signup
                                 AND e.ts < c.t_purchase
                                THEN 1 ELSE 0 END), 0) AS BIGINT)
           AS n_errors_between
  FROM conv c LEFT JOIN events e ON c.user_id = e.user_id
  GROUP BY c.user_id, c.t_purchase IS NOT NULL
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_entered,
       CAST(SUM(CASE WHEN converted THEN 1 ELSE 0 END) AS BIGINT)
         AS n_converted,
       CAST(SUM(CASE WHEN converted AND n_errors_between = 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_clean_converted,
       CAST(SUM(CASE WHEN converted AND n_errors_between > 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_excluded,
       CAST(SUM(CASE WHEN converted AND n_errors_between = 0
                     THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT)
         AS clean_conversion_ppm
FROM judged
"""


@register(
    "e_funnel_exclusion_steps",
    oracle=_EXCL_FUNNEL_ORACLE,
    tags=("A7", "J3", "W2", "A1"),
)
def e_funnel_exclusion_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel with an EXCLUSION step — signup → purchase counts as a
    clean conversion only if no error event fell strictly between the
    two — the funnel semantics plain step-matching
    (`e_funnel_ordered`) cannot express, and the first thing a product
    team asks once a checkout-error hypothesis appears. Reports
    entered/converted/clean/excluded and the clean-conversion ppm.

    Scale design — all three passes are keyed on user_id (one shuffle
    key end to end, no time-range self-join): first-signup reduction,
    first-subsequent-purchase reduction, and an exclusion-count
    reduction against the conversion interval; each is combinable.
    The exclusion interval uses strict bounds so an error at exactly
    the purchase timestamp doesn't disqualify."""
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias(
            "t_signup"
        )
    ).filter(F.col("t_signup").isNotNull())
    conv = (
        firsts.join(e, "user_id")
        .groupBy("user_id", "t_signup")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") > F.col("t_signup")),
                    F.col("ts"),
                )
            ).alias("t_purchase")
        )
    )
    judged = (
        conv.join(e, "user_id", "left")
        .groupBy("user_id", F.col("t_purchase").isNotNull().alias("converted"))
        .agg(
            F.coalesce(
                F.sum(
                    F.when(
                        (F.col("event_type") == "error")
                        & (F.col("ts") > F.col("t_signup"))
                        & (F.col("ts") < F.col("t_purchase")),
                        1,
                    ).otherwise(0)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("n_errors_between")
        )
    )
    clean = F.col("converted") & (F.col("n_errors_between") == 0)
    return judged.agg(
        F.count(F.lit(1)).alias("n_entered"),
        F.sum(F.when(F.col("converted"), 1).otherwise(0)).alias("n_converted"),
        F.sum(F.when(clean, 1).otherwise(0)).alias("n_clean_converted"),
        F.sum(
            F.when(F.col("converted") & (F.col("n_errors_between") > 0), 1).otherwise(
                0
            )
        ).alias("n_excluded"),
        F.expr(
            "SUM(CASE WHEN converted AND n_errors_between = 0 THEN 1 ELSE 0 END)"
            " * 1000000 DIV COUNT(*)"
        ).alias("clean_conversion_ppm"),
    )


# ---------------------------------------------------------------------------
# Markov next-event model backtested on a temporal holdout
# ---------------------------------------------------------------------------

_MARKOV_EVAL_ORACLE = """
WITH seq AS (
  SELECT user_id, ts, event_id, event_type,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS next_type,
         CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00' THEN 0 ELSE 1 END
           AS fold
  FROM events
),
train AS (
  SELECT event_type, next_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM seq WHERE fold = 0 AND next_type IS NOT NULL
  GROUP BY event_type, next_type
),
model AS (
  SELECT event_type, next_type AS pred_next
  FROM (
    SELECT event_type, next_type, n,
           ROW_NUMBER() OVER (PARTITION BY event_type
                              ORDER BY n DESC, next_type) AS rk
    FROM train
  ) WHERE rk = 1
),
test AS (
  SELECT s.event_type, s.next_type, m.pred_next
  FROM seq s JOIN model m ON s.event_type = m.event_type
  WHERE s.fold = 1 AND s.next_type IS NOT NULL
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_test_transitions,
       CAST(SUM(CASE WHEN next_type = pred_next THEN 1 ELSE 0 END) AS BIGINT)
         AS n_correct,
       CAST(SUM(CASE WHEN next_type = pred_next THEN 1 ELSE 0 END) * 1000000
            // COUNT(*) AS BIGINT) AS top1_accuracy_ppm,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM model) AS n_states_modeled
FROM test
"""


@register(
    "e_markov_next_event_eval",
    oracle=_MARKOV_EVAL_ORACLE,
    tags=("W2", "A1", "J1", "W4"),
)
def e_markov_next_event_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backtest of the first-order Markov next-event model on a TEMPORAL
    holdout: transitions from the first half of the month train a
    per-state argmax predictor, transitions from the second half score
    it — the "can last month's clickstream model predict this month"
    check that separates a real sequence model from an overfit
    transition table (`e_markov_transitions` describes; this one
    PREDICTS and is graded). Top-1 accuracy in exact ppm.

    Scale design — the sequence pass is one per-user lag window (the
    split flag rides each transition, so train/test need no second
    scan); the model is a bounded |states|² rollup with a deterministic
    argmax (count desc, label asc); scoring broadcasts the tiny model
    back onto held-out transitions. No leakage: fold is assigned by
    the TRANSITION's source-event time, strictly before the split for
    every training pair."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type",
        F.lead("event_type").over(w).alias("next_type"),
        F.when(F.col("ts") < "2024-01-16 00:00:00", 0).otherwise(1).alias("fold"),
    )
    train = (
        seq.filter((F.col("fold") == 0) & F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    model = (
        train.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("event_type").orderBy(
                    F.col("n").desc(), F.col("next_type")
                )
            ),
        )
        .filter(F.col("rk") == 1)
        .select("event_type", F.col("next_type").alias("pred_next"))
    )
    test = seq.filter((F.col("fold") == 1) & F.col("next_type").isNotNull()).join(
        F.broadcast(model), "event_type"
    )
    n_states = model.agg(F.count(F.lit(1)).alias("n_states_modeled"))
    return (
        test.agg(
            F.count(F.lit(1)).alias("n_test_transitions"),
            F.sum(
                F.when(F.col("next_type") == F.col("pred_next"), 1).otherwise(0)
            ).alias("n_correct"),
            F.expr(
                "SUM(CASE WHEN next_type = pred_next THEN 1 ELSE 0 END)"
                " * 1000000 DIV COUNT(*)"
            ).alias("top1_accuracy_ppm"),
        )
        .crossJoin(F.broadcast(n_states))
    )


# ---------------------------------------------------------------------------
# Net Promoter Score with a delta-method confidence interval
# ---------------------------------------------------------------------------

_NPS_ORACLE = """
WITH scored AS (
  SELECT CAST(FLOOR(value) AS BIGINT) % 11 AS score
  FROM events WHERE event_type = 'view'
),
counts AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN score >= 9 THEN 1 ELSE 0 END) AS BIGINT) AS n_pro,
         CAST(SUM(CASE WHEN score <= 6 THEN 1 ELSE 0 END) AS BIGINT) AS n_det
  FROM scored
)
SELECT n, n_pro, n_det,
       (n_pro - n_det) * 1000000 // n AS nps_ppm,
       ROUND(SQRT((CAST(n_pro AS DOUBLE) / n
                   + CAST(n_det AS DOUBLE) / n
                   - (CAST(n_pro AS DOUBLE) / n - CAST(n_det AS DOUBLE) / n)
                     * (CAST(n_pro AS DOUBLE) / n - CAST(n_det AS DOUBLE) / n))
                  / n) * 1000000, 6) AS se_ppm,
       ROUND((CAST(n_pro AS DOUBLE) / n - CAST(n_det AS DOUBLE) / n) * 1000000
             - 1.959964 * SQRT((CAST(n_pro AS DOUBLE) / n
                   + CAST(n_det AS DOUBLE) / n
                   - (CAST(n_pro AS DOUBLE) / n - CAST(n_det AS DOUBLE) / n)
                     * (CAST(n_pro AS DOUBLE) / n - CAST(n_det AS DOUBLE) / n))
                  / n) * 1000000, 6) AS ci_lo_ppm,
       ROUND((CAST(n_pro AS DOUBLE) / n - CAST(n_det AS DOUBLE) / n) * 1000000
             + 1.959964 * SQRT((CAST(n_pro AS DOUBLE) / n
                   + CAST(n_det AS DOUBLE) / n
                   - (CAST(n_pro AS DOUBLE) / n - CAST(n_det AS DOUBLE) / n)
                     * (CAST(n_pro AS DOUBLE) / n - CAST(n_det AS DOUBLE) / n))
                  / n) * 1000000, 6) AS ci_hi_ppm
FROM counts
"""


@register(
    "e_nps_score_ci",
    oracle=_NPS_ORACLE,
    tags=("A2", "A7", "P2"),
)
def e_nps_score_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Net Promoter Score with its correct standard error: NPS is a
    DIFFERENCE of two multinomial proportions (promoters 9-10 minus
    detractors 0-6), so Var = (p + d − (p−d)²)/n, NOT a binomial SE —
    the mistake that makes naive NPS dashboards overconfident by up to
    √2. Scores derive deterministically from the event value; the
    1.959964 z-multiplier is the repo's pre-rounded literal.

    Scale — one combinable conditional-count pass; the CI is one fixed
    float expression over three exact integers, round-6 micro units."""
    e = load_table(spark, sf_dir, "events")
    scored = e.filter(F.col("event_type") == "view").select(
        (F.expr("CAST(FLOOR(value) AS BIGINT)") % 11).alias("score")
    )
    counts = scored.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("score") >= 9, 1).otherwise(0)).alias("n_pro"),
        F.sum(F.when(F.col("score") <= 6, 1).otherwise(0)).alias("n_det"),
    )
    p = F.col("n_pro").cast("double") / F.col("n")
    d = F.col("n_det").cast("double") / F.col("n")
    se = F.sqrt((p + d - (p - d) * (p - d)) / F.col("n")) * 1000000
    return counts.select(
        "n",
        "n_pro",
        "n_det",
        F.expr("(n_pro - n_det) * 1000000 DIV n").alias("nps_ppm"),
        F.round(se, 6).alias("se_ppm"),
        F.round((p - d) * 1000000 - 1.959964 * se, 6).alias("ci_lo_ppm"),
        F.round((p - d) * 1000000 + 1.959964 * se, 6).alias("ci_hi_ppm"),
    )


# ---------------------------------------------------------------------------
# Gains / lift table (decile discrimination of a scoring model)
# ---------------------------------------------------------------------------

_GAINS_ORACLE = """
WITH scored AS (
  SELECT doc_id,
         LEAST(n_chars, 2000) AS score,
         CASE WHEN LEN(STRING_SPLIT(text, ' ')) >= 80 THEN 1 ELSE 0 END
           AS label
  FROM documents
),
ranked AS (
  SELECT label,
         NTILE(10) OVER (ORDER BY score DESC, doc_id) AS decile
  FROM scored
),
per_decile AS (
  SELECT decile,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(label) AS BIGINT) AS n_pos
  FROM ranked GROUP BY decile
),
tot AS (
  SELECT CAST(SUM(n) AS BIGINT) AS n_tot, CAST(SUM(n_pos) AS BIGINT) AS pos_tot
  FROM per_decile
)
SELECT decile, n, n_pos,
       n_pos * 1000000 // n AS rate_ppm,
       CAST(SUM(n_pos) OVER (ORDER BY decile
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         * 1000000 // pos_tot AS cum_capture_ppm,
       (n_pos * 1000000 // n) * 1000 / (pos_tot * 1000000 // n_tot)
         AS lift_x1000_approx,
       n_pos * n_tot * 1000 // (n * pos_tot) AS lift_x1000
FROM per_decile CROSS JOIN tot
ORDER BY decile
"""


@register(
    "e_gains_lift_table",
    oracle=_GAINS_ORACLE,
    tags=("W1", "A1", "W3"),
)
def e_gains_lift_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gains/lift table for a document-quality scoring model: score
    deciles (best first), per-decile positive rate, cumulative capture
    of all positives, and lift vs the base rate — the DISCRIMINATION
    readout that pairs with `n_calibration_ece`'s calibration readout
    (a model can be well-calibrated and useless, or sharp and
    miscalibrated; you need both tables). 'Decile 1 captures 18% of
    positives at 1.8x lift' is the sentence that sells a targeting
    model.

    Determinism & scale — NTILE over a total order (score desc, id) is
    deterministic on both engines; per-decile stats are a 10-row
    combinable rollup; capture and lift are positive integer
    floor-division ppm (lift in exact x1000 units via the
    cross-multiplied integer form). The only full shuffle is the
    NTILE sort."""
    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        F.least(F.col("n_chars"), F.lit(2000)).alias("score"),
        F.when(F.size(F.split(F.col("text"), " ")) >= 80, 1)
        .otherwise(0)
        .alias("label"),
    )
    ranked = scored.select(
        "label",
        F.ntile(10)
        .over(Window.orderBy(F.col("score").desc(), F.col("doc_id")))
        .alias("decile"),
    )
    per_decile = ranked.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n"), F.sum("label").alias("n_pos")
    )
    tot = per_decile.agg(
        F.sum("n").alias("n_tot"), F.sum("n_pos").alias("pos_tot")
    )
    wcum = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return (
        per_decile.crossJoin(F.broadcast(tot))
        .select(
            "decile",
            "n",
            "n_pos",
            F.expr("n_pos * 1000000 DIV n").alias("rate_ppm"),
            F.expr(
                "SUM(n_pos) OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED"
                " PRECEDING AND CURRENT ROW) * 1000000 DIV pos_tot"
            ).alias("cum_capture_ppm"),
            (
                F.expr("n_pos * 1000000 DIV n") * 1000
                / F.expr("pos_tot * 1000000 DIV n_tot")
            ).alias("lift_x1000_approx"),
            F.expr("n_pos * n_tot * 1000 DIV (n * pos_tot)").alias("lift_x1000"),
        )
        .orderBy("decile")
    )
