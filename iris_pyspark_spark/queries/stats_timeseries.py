"""Time-series statistics (split from stats_analytics.py, round 5):
autocorrelation, EWMA, seasonal decomposition, spectral power,
changepoints (CUSUM/SPC), trend tests, burstiness, queueing checks,
forecast intervals.

Shared scale discipline (SURVEY.md §2.12): every float statistic is
computed FROM exact-integer sufficient statistics (counts, cents sums,
cents sums-of-squares as BIGINT) aggregated with combinable SUM/COUNT —
map-side partial aggregation applies, partition layout cannot change a
bit. The float formula is then evaluated once per output row with an
identical expression tree in Spark and DuckDB (IEEE doubles: same
operands + same operation order = same bits; sqrt is correctly rounded
by spec), and rounded to 6 decimals on both sides.

Series-shaped queries (ACF, CUSUM, spectra) operate on the per-day
rollup whose cardinality is bounded by the CALENDAR, not by data
volume — the window over it is O(days), safe at 100 TB because the
heavy pass below it is one combinable groupBy(day).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast
from pyspark.sql.window import Window

from ..catalog import load_table
from ..registry import register
from .joins import CENTS_SQL, cents

# ---------------------------------------------------------------------------
# Autocorrelation function of the daily event-count series
# ---------------------------------------------------------------------------

_ACF_ORACLE = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, COUNT(*) AS cnt
  FROM events GROUP BY CAST(ts AS DATE)
),
lags AS (SELECT UNNEST(range(1, 8)) AS lag_k),
paired AS (
  SELECT l.lag_k, a.cnt AS x, b.cnt AS y
  FROM lags l
  JOIN daily a ON TRUE
  JOIN daily b ON b.d = a.d - CAST(l.lag_k AS INTEGER)
),
stats AS (
  SELECT lag_k, COUNT(*) AS n,
         SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
         SUM(x * x) AS sxx, SUM(y * y) AS syy
  FROM paired GROUP BY lag_k
)
SELECT lag_k, n,
       ROUND((n * sxy - sx * sy) /
             (SQRT(CAST(n * sxx - sx * sx AS DOUBLE)) *
              SQRT(CAST(n * syy - sy * sy AS DOUBLE))), 6) AS acf
FROM stats
ORDER BY lag_k
"""


@register("t_acf_lags", oracle=_ACF_ORACLE, tags=("A1", "W2", "F2", "J9"))
def t_acf_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the daily event-count series at lags 1..7 —
    the weekly-seasonality diagnostic (a spike at lag 7 = day-of-week
    structure; complements `t_seasonality_dow_profile`).

    The heavy pass is ONE combinable groupBy(day) count over the raw
    events; everything after runs on the per-day rollup whose size is
    bounded by the calendar (30 rows here, 36.5k rows for a century),
    so the lag self-join and the tiny 7-row lag grid are O(days·lags)
    regardless of data volume. Pearson r per lag comes from exact
    BIGINT sufficient statistics (counts and their products) through
    one fixed-shape double expression — sqrt is IEEE-correctly-rounded,
    so both engines produce identical bits before the shared round(6).
    """
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    lags = spark.range(1, 8).select(F.col("id").alias("lag_k"))
    a = daily.alias("a")
    b = daily.alias("b")
    paired = (
        F.broadcast(lags)
        .crossJoin(a)
        .join(
            b,
            F.col("b.d")
            == F.date_sub(F.col("a.d"), F.col("lag_k").cast("int")),
        )
        .select(
            "lag_k",
            F.col("a.cnt").alias("x"),
            F.col("b.cnt").alias("y"),
        )
    )
    stats = paired.groupBy("lag_k").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    num = n * F.col("sxy") - sx * sy
    den = F.sqrt((n * F.col("sxx") - sx * sx).cast("double")) * F.sqrt(
        (n * F.col("syy") - sy * sy).cast("double")
    )
    return stats.select(
        "lag_k", "n", F.round(num / den, 6).alias("acf")
    ).orderBy("lag_k")


# ---------------------------------------------------------------------------
# CUSUM changepoint detection over the daily revenue series
# ---------------------------------------------------------------------------

_CUSUM_ORACLE = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d,
         CAST(SUM({CENTS_SQL.format(expr="value")}) AS BIGINT) AS rev_cents
  FROM events GROUP BY CAST(ts AS DATE)
),
tot AS (
  SELECT COUNT(*) AS n_days, SUM(rev_cents) AS total_cents FROM daily
),
dev AS (
  SELECT d.d, d.rev_cents,
         d.rev_cents * t.n_days - t.total_cents AS dev_scaled,
         t.n_days
  FROM daily d CROSS JOIN tot t
),
pre AS (
  SELECT d, rev_cents, n_days,
         SUM(dev_scaled) OVER (ORDER BY d
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
  FROM dev
),
cusum AS (
  SELECT d, rev_cents, n_days, p,
         p - LEAST(0, MIN(p) OVER (ORDER BY d
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS s_scaled
  FROM pre
)
SELECT CAST(d AS VARCHAR) AS d, rev_cents,
       CAST(s_scaled AS BIGINT) AS cusum_scaled,
       CAST(s_scaled > 2 * CAST(n_days AS BIGINT) *
            (SELECT MAX(rev_cents) - MIN(rev_cents) FROM daily) / 4
            AS BOOLEAN) AS drift_flag
FROM cusum
ORDER BY d
"""


@register(
    "w_cusum_changepoint",
    oracle=_CUSUM_ORACLE,
    tags=("W3", "W2", "A2", "F2"),
)
def w_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM drift detector over daily revenue. The textbook
    recursion S_t = max(0, S_{t-1} + dev_t) is not window-expressible,
    but its closed form IS: S_t = P_t − min(0, min_{j≤t} P_j) where P is
    the running prefix sum of deviations — two stacked window passes
    over the day series replace the sequential scan (the same rewrite
    family as `e_cumulative_reach`'s first-touch trick).

    Exactness: deviations are scaled by n_days (dev = x·n − total) so
    the mean subtraction stays in BIGINT — no float enters the series
    math at all; the flag threshold is integer too. The windows order a
    calendar-bounded rollup; the single heavy pass below them is one
    combinable groupBy(day) over raw events.
    """
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("d")).agg(
        F.sum(cents(F.col("value"))).alias("rev_cents")
    )
    tot = daily.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("rev_cents").alias("total_cents"),
        (F.max("rev_cents") - F.min("rev_cents")).alias("spread_cents"),
    )
    dev = daily.crossJoin(F.broadcast(tot)).select(
        "d",
        "rev_cents",
        "n_days",
        "spread_cents",
        (F.col("rev_cents") * F.col("n_days") - F.col("total_cents")).alias(
            "dev_scaled"
        ),
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    pre = dev.withColumn("p", F.sum("dev_scaled").over(w))
    cusum = pre.withColumn(
        "s_scaled", F.col("p") - F.least(F.lit(0), F.min("p").over(w))
    )
    return cusum.select(
        F.col("d").cast("string").alias("d"),
        "rev_cents",
        F.col("s_scaled").cast("long").alias("cusum_scaled"),
        (
            F.col("s_scaled")
            > 2 * F.col("n_days").cast("long") * F.col("spread_cents") / 4
        ).alias("drift_flag"),
    ).orderBy("d")


# ---------------------------------------------------------------------------
# EWMA smoothing via exact power-of-two integer weights
# ---------------------------------------------------------------------------

_EWMA_ORACLE = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d,
         CAST(SUM({CENTS_SQL.format(expr="value")}) AS BIGINT) AS rev_cents
  FROM events GROUP BY CAST(ts AS DATE)
),
idx AS (
  SELECT d, rev_cents,
         ROW_NUMBER() OVER (ORDER BY d) AS j
  FROM daily
),
scaled AS (
  SELECT d, rev_cents, j,
         CAST(SUM(rev_cents * (CAST(1 AS BIGINT) << (j - 1)))
              OVER (ORDER BY j
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS v
  FROM idx
)
SELECT CAST(d AS VARCHAR) AS d, rev_cents,
       CAST(v // (CAST(1 AS BIGINT) << j) AS BIGINT) AS ewma_cents
FROM scaled
ORDER BY d
"""


@register("t_ewma_smoothing", oracle=_EWMA_ORACLE, tags=("W3", "W1", "F3"))
def t_ewma_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average (α = ½) of daily revenue
    — computed EXACTLY in integers. The recursion S_t = (x_t+S_{t-1})/2
    is not window-expressible, but its closed form 2^t·S_t = Σ x_j·2^(j-1)
    IS a prefix sum: weight each day by a BIGINT left-shift, window-sum,
    and floor-divide by 2^t. No float ever enters, so both engines agree
    to the last cent (floor-EWMA differs from real EWMA by < 1 cent).

    Range honesty: the shifted terms stay under 2^63 for series up to
    ~35 points at these cent magnitudes — fine for the calendar-month
    series here; an unbounded series would use the truncated-window
    variant (weights beyond ~40 days are < 2⁻⁴⁰ ≈ 0 anyway). Scale: the
    heavy pass is one combinable groupBy(day); the window runs on the
    calendar-bounded rollup.
    """
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("d")).agg(
        F.sum(cents(F.col("value"))).cast("long").alias("rev_cents")
    )
    w_idx = Window.orderBy("d")
    w_cum = Window.orderBy("j").rowsBetween(Window.unboundedPreceding, 0)
    idx = daily.withColumn("j", F.row_number().over(w_idx))
    scaled = idx.withColumn(
        "v",
        F.sum(F.col("rev_cents") * F.expr("shiftleft(1L, j - 1)"))
        .over(w_cum)
        .cast("long"),
    )
    return scaled.select(
        F.col("d").cast("string").alias("d"),
        "rev_cents",
        F.expr("CAST(v DIV shiftleft(1L, j) AS BIGINT)").alias("ewma_cents"),
    ).orderBy("d")


# ---------------------------------------------------------------------------
# Seasonal decomposition: trend (centered MA) + seasonal (dow) + residual
# ---------------------------------------------------------------------------

_DECOMP_ORACLE = f"""
WITH daily AS (
  SELECT DATE_DIFF('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
         CAST(SUM({CENTS_SQL.format(expr="value")}) AS BIGINT) AS rev_cents
  FROM events GROUP BY 1
),
trended AS (
  SELECT d, rev_cents,
         CASE WHEN COUNT(*) OVER (ORDER BY d
                ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) = 7
              THEN CAST(SUM(rev_cents) OVER (ORDER BY d
                ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT)
              ELSE NULL END AS trend_x7
  FROM daily
),
detr AS (
  SELECT d, rev_cents, trend_x7,
         ((d % 7) + 4) % 7 AS dow,
         7 * rev_cents - trend_x7 AS detrended_x7
  FROM trended
),
seas AS (
  SELECT dow,
         CAST(SUM(detrended_x7) AS BIGINT) AS s_sum,
         COUNT(detrended_x7) AS s_n
  FROM detr GROUP BY dow
)
SELECT de.d, de.rev_cents, de.dow, de.trend_x7,
       ROUND(s.s_sum / (7.0 * s.s_n), 6) AS seasonal_cents,
       ROUND(CASE WHEN de.trend_x7 IS NULL THEN NULL
             ELSE de.detrended_x7 / 7.0 - s.s_sum / (7.0 * s.s_n) END, 6)
         AS residual_cents
FROM detr de JOIN seas s ON de.dow = s.dow
ORDER BY de.d
"""


@register(
    "t_seasonal_decompose",
    oracle=_DECOMP_ORACLE,
    tags=("W3", "A1", "F2", "J2"),
)
def t_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition of daily revenue:
    trend = centered 7-day moving average (NULL at the edges where the
    window is incomplete), seasonal = day-of-week mean of the detrended
    series, residual = remainder — the moving-average STL precursor,
    which is exactly what a batch engine can do deterministically.

    Integer strategy: the centered MA is kept ×7 (a window SUM of
    cents, never divided) and the detrended series as 7·x − MA_x7, so
    everything through the dow aggregation is exact BIGINT; only the
    final display columns divide, each in ONE fixed-shape double
    expression (integer floor-division is avoided entirely because
    detrended values go negative, where Spark DIV truncates but DuckDB
    // floors). Scale: one combinable groupBy(day), windows and the
    7-row seasonal join on the calendar-bounded rollup.
    """
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).alias("d")
    ).agg(F.sum(cents(F.col("value"))).cast("long").alias("rev_cents"))
    w7 = Window.orderBy("d").rowsBetween(-3, 3)
    trended = daily.withColumn(
        "trend_x7",
        F.when(
            F.count(F.lit(1)).over(w7) == 7,
            F.sum("rev_cents").over(w7).cast("long"),
        ),
    )
    detr = trended.select(
        "d",
        "rev_cents",
        "trend_x7",
        ((F.col("d") % 7 + 4) % 7).alias("dow"),
        (7 * F.col("rev_cents") - F.col("trend_x7")).alias("detrended_x7"),
    )
    seas = detr.groupBy("dow").agg(
        F.sum("detrended_x7").cast("long").alias("s_sum"),
        F.count("detrended_x7").alias("s_n"),
    )
    return (
        detr.join(F.broadcast(seas), "dow")
        .select(
            "d",
            "rev_cents",
            "dow",
            "trend_x7",
            F.round(F.col("s_sum") / (7.0 * F.col("s_n")), 6).alias(
                "seasonal_cents"
            ),
            F.round(
                F.when(
                    F.col("trend_x7").isNotNull(),
                    F.col("detrended_x7") / 7.0
                    - F.col("s_sum") / (7.0 * F.col("s_n")),
                ),
                6,
            ).alias("residual_cents"),
        )
        .orderBy("d")
    )


# ---------------------------------------------------------------------------
# Sweep-line concurrency: peak simultaneous user sessions
# ---------------------------------------------------------------------------

_SWEEP_ORACLE = """
WITH sessions AS (
  SELECT user_id, CAST(ts AS DATE) AS d,
         CAST(FLOOR(EPOCH(MIN(ts))) AS BIGINT) AS s_start,
         CAST(FLOOR(EPOCH(MAX(ts))) AS BIGINT) + 1 AS s_end
  FROM events GROUP BY user_id, CAST(ts AS DATE)
),
points AS (
  SELECT s_start AS t, 1 AS delta FROM sessions
  UNION ALL
  SELECT s_end AS t, -1 AS delta FROM sessions
),
swept AS (
  SELECT t, delta,
         CAST(SUM(delta) OVER (ORDER BY t, delta
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS concurrency,
         ROW_NUMBER() OVER (ORDER BY t, delta) AS rn
  FROM points
)
SELECT t, concurrency
FROM swept
ORDER BY concurrency DESC, t, rn
LIMIT 20
"""


@register(
    "t_concurrency_sweepline",
    oracle=_SWEEP_ORACLE,
    tags=("W3", "O3", "O2", "F2"),
)
def t_concurrency_sweepline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency by sweep line: each user-day session (first to
    last event, end exclusive) emits a +1 at start and a −1 at end; a
    running sum over the merged, time-ordered point stream IS the
    concurrency curve, and the top-20 points are its peaks — the
    interval-stabbing problem solved without any interval join (the
    quadratic trap `j_interval_overlap_join` bounds differently).

    Ordering pins determinism twice: the sweep sorts (t, delta) so a
    −1 at time t applies before a +1 at the same instant (sessions
    touching end-to-start never double-count), and the running sum over
    that total order is exact integer arithmetic. The rn tie-break
    makes the LIMIT deterministic among equal (concurrency, t) rows.

    Scale: sessionization is one combinable user-day min/max; the
    sweep's global window is the documented calendar/event-boundary
    rollup exception — at true scale the sweep shards by day (each
    day's curve starts at the count of sessions spanning midnight,
    computable with one broadcast prefix table).
    """
    e = load_table(spark, sf_dir, "events")
    sessions = e.groupBy("user_id", F.to_date("ts").alias("d")).agg(
        F.unix_timestamp(F.min("ts")).cast("long").alias("s_start"),
        (F.unix_timestamp(F.max("ts")) + 1).cast("long").alias("s_end"),
    )
    points = sessions.select(
        F.col("s_start").alias("t"), F.lit(1).alias("delta")
    ).unionAll(
        sessions.select(F.col("s_end").alias("t"), F.lit(-1).alias("delta"))
    )
    w = Window.orderBy("t", "delta")
    swept = points.select(
        "t",
        "delta",
        F.sum("delta").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).cast("long").alias("concurrency"),
        F.row_number().over(w).alias("rn"),
    )
    return (
        swept.select("t", "concurrency", "rn")
        .orderBy(F.col("concurrency").desc(), "t", "rn")
        .limit(20)
        .select("t", "concurrency")
    )


# ---------------------------------------------------------------------------
# Rolling 7-day OLS trend slope
# ---------------------------------------------------------------------------

_ROLLSLOPE_ORACLE = f"""
WITH daily AS (
  SELECT DATE_DIFF('day', DATE '1970-01-01', CAST(ts AS DATE)) AS x,
         CAST(SUM({CENTS_SQL.format(expr="value")}) AS BIGINT) AS y
  FROM events GROUP BY 1
),
win AS (
  SELECT x, y,
         COUNT(*) OVER w AS n,
         CAST(SUM(x) OVER w AS BIGINT) AS sx,
         CAST(SUM(y) OVER w AS BIGINT) AS sy,
         CAST(SUM(x * y) OVER w AS BIGINT) AS sxy,
         CAST(SUM(x * x) OVER w AS BIGINT) AS sxx
  FROM daily
  WINDOW w AS (ORDER BY x ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
)
SELECT x AS day, y AS rev_cents,
       ROUND((n * sxy - sx * sy)
             / CAST(n * sxx - sx * sx AS DOUBLE), 6)
         AS slope_cents_per_day
FROM win WHERE n = 7
ORDER BY day
"""


@register(
    "w_rolling_regression_slope",
    oracle=_ROLLSLOPE_ORACLE,
    tags=("W3", "A1", "F3", "F2"),
)
def w_rolling_regression_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day OLS trend slope of daily revenue — the windowed
    regression behind "is this metric trending up?" alerts, reported
    only where the window is complete. The slope closed form
    (nΣxy − ΣxΣy)/(nΣxx − (Σx)²) runs on exact BIGINT window sums
    (x = epoch day, y = cents), so the only float is the final
    division — one fixed-shape expression per row, identical both
    engines. Scale: one combinable groupBy(day), then framed windows
    over the calendar-bounded rollup.
    """
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).alias("x")
    ).agg(F.sum(cents(F.col("value"))).cast("long").alias("y"))
    w = Window.orderBy("x").rowsBetween(-6, 0)
    win = daily.select(
        "x",
        "y",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("x").over(w).cast("long").alias("sx"),
        F.sum("y").over(w).cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(w).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(w).cast("long").alias("sxx"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    return (
        win.filter(n == 7)
        .select(
            F.col("x").alias("day"),
            F.col("y").alias("rev_cents"),
            F.round(
                (n * F.col("sxy") - sx * sy)
                / (n * F.col("sxx") - sx * sx).cast("double"),
                6,
            ).alias("slope_cents_per_day"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Sliding-window rate-limit violations
# ---------------------------------------------------------------------------

_RATELIMIT_ORACLE = """
WITH pts AS (
  SELECT user_id, event_id,
         CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS t
  FROM events
),
counted AS (
  SELECT user_id, event_id, t,
         COUNT(*) OVER (PARTITION BY user_id ORDER BY t
           RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW) AS n_in_hour
  FROM pts
)
SELECT user_id, event_id, t, n_in_hour
FROM counted
WHERE n_in_hour >= 3
ORDER BY user_id, t, event_id
LIMIT 50
"""


@register(
    "t_rate_limit_violations",
    oracle=_RATELIMIT_ORACLE,
    tags=("W3", "T2", "P2", "O2"),
)
def t_rate_limit_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window rate limiting: flag every event that is the 3rd+
    from its user within any trailing 3600-second window — the
    fraud/abuse detection shape ("N requests per rolling hour"), done
    with a RANGE frame over epoch seconds so the window slides per
    EVENT, not per fixed bucket (a tumbling count misses bursts that
    straddle bucket edges; `t_sliding_window`'s hop grid only
    approximates this).

    Determinism: RANGE frames include peer rows identically in both
    engines (ties at the same second all see the same count), so no
    tie-break ambiguity exists in `n_in_hour`; the LIMIT orders on the
    full (user, t, event_id) key. Scale: ONE user-keyed shuffle; the
    frame is bounded by the user's events-per-hour, and the filter is
    evaluated inside the window stage — no second pass.
    """
    e = load_table(spark, sf_dir, "events")
    pts = e.select(
        "user_id",
        "event_id",
        F.unix_timestamp("ts").cast("long").alias("t"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t")
        .rangeBetween(-3599, 0)
    )
    return (
        pts.withColumn("n_in_hour", F.count(F.lit(1)).over(w))
        .filter(F.col("n_in_hour") >= 3)
        .orderBy("user_id", "t", "event_id")
        .limit(50)
    )


# ---------------------------------------------------------------------------
# VWAP (volume-weighted average price) per shipping week
# ---------------------------------------------------------------------------

_VWAP_ORACLE = """
WITH lines AS (
  SELECT CAST(FLOOR(DATE_DIFF('day', DATE '1970-01-01',
                              CAST(l_shipdate AS DATE)) / 7) AS BIGINT)
           AS ship_week,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS price_cents,
         CAST(l_quantity AS BIGINT) AS qty
  FROM lineitem
)
SELECT ship_week,
       COUNT(*) AS n_lines,
       CAST(SUM(qty) AS BIGINT) AS tot_qty,
       CAST(SUM(price_cents * qty) AS BIGINT) AS weighted_cents,
       ROUND(CAST(SUM(price_cents * qty) AS DOUBLE)
             / SUM(qty) / 100, 6) AS vwap
FROM lines
GROUP BY ship_week
ORDER BY ship_week
"""


@register(
    "t_vwap_weekly", oracle=_VWAP_ORACLE, tags=("A1", "F2", "F3", "O1")
)
def t_vwap_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-weighted average price per shipping week — the finance
    benchmark aggregate (VWAP = Σp·q / Σq) that a plain AVG(price)
    silently gets wrong by ignoring lot sizes. Weighted numerator and
    volume denominator are exact BIGINTs (cents × integer quantity),
    accumulated in ONE combinable groupBy on the epoch-week integer
    (the repo's floor-division week convention — no engine
    week-truncation semantics); the single double division happens per
    output row. One shuffle at any scale.
    """
    li = load_table(spark, sf_dir, "lineitem")
    lines = li.select(
        F.floor(
            F.datediff(
                F.col("l_shipdate").cast("date"),
                F.lit("1970-01-01").cast("date"),
            )
            / 7
        )
        .cast("long")
        .alias("ship_week"),
        cents(F.col("l_extendedprice")).alias("price_cents"),
        F.col("l_quantity").cast("long").alias("qty"),
    )
    return (
        lines.groupBy("ship_week")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum("qty").cast("long").alias("tot_qty"),
            F.sum(F.col("price_cents") * F.col("qty"))
            .cast("long")
            .alias("weighted_cents"),
        )
        .select(
            "ship_week",
            "n_lines",
            "tot_qty",
            "weighted_cents",
            F.round(
                F.col("weighted_cents").cast("double") / F.col("tot_qty") / 100,
                6,
            ).alias("vwap"),
        )
        .orderBy("ship_week")
    )


# ---------------------------------------------------------------------------
# Weekly spectral power (single-bin DFT with pre-rounded weights)
# ---------------------------------------------------------------------------

#: cos/sin(2πt/7) for t = 0..6, pre-rounded to integer micro — the DFT
#: weights are LITERALS so no trig function runs at query time on
#: either engine (libm cos/sin are not cross-engine bit-stable).
_DFT_COS = (1000000, 623490, -222521, -900969, -900969, -222521, 623490)
_DFT_SIN = (0, 781831, 974928, 433884, -433884, -974928, -781831)

_SPECTRAL_ORACLE = f"""
WITH daily AS (
  SELECT DATE_DIFF('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS rev_cents
  FROM events GROUP BY 1
),
tot AS (
  SELECT COUNT(*) AS n, CAST(SUM(rev_cents) AS BIGINT) AS s FROM daily
),
dev AS (
  SELECT d.d % 7 AS phase,
         d.rev_cents * t.n - t.s AS dev_scaled,
         t.n
  FROM daily d CROSS JOIN tot t
),
proj AS (
  SELECT n,
         CAST(SUM(dev_scaled *
           [{", ".join(str(c) for c in _DFT_COS)}][phase + 1]) AS HUGEINT)
           AS re_part,
         CAST(SUM(dev_scaled *
           [{", ".join(str(s) for s in _DFT_SIN)}][phase + 1]) AS HUGEINT)
           AS im_part
  FROM dev GROUP BY n
)
SELECT n AS n_days,
       CAST(re_part AS DOUBLE) AS re_micro,
       CAST(im_part AS DOUBLE) AS im_micro,
       ROUND(SQRT(CAST(re_part AS DOUBLE) * re_part
                  + CAST(im_part AS DOUBLE) * im_part)
             / (CAST(n AS DOUBLE) * n * 1000000 * 100), 6)
         AS weekly_amplitude_dollars
FROM proj
"""


@register(
    "t_weekly_spectral_power",
    oracle=_SPECTRAL_ORACLE,
    tags=("A2", "F3", "F2"),
)
def t_weekly_spectral_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-bin DFT at the weekly frequency: project the
    mean-removed daily revenue series onto cos/sin(2πt/7) and report
    the amplitude — the frequency-domain confirmation of what
    `t_seasonality_dow_profile` and `t_acf_lags` show in the time
    domain (a large weekly amplitude = strong day-of-week cycle).

    Determinism: the trig weights are PRE-ROUNDED integer-micro
    literals indexed by t mod 7 (no libm trig at query time — the
    NDCG gain-ladder move applied to Fourier); deviations are
    mean-removed in scaled integers (x·n − Σx, the CUSUM trick), so
    both projections are exact integer sums (HUGEINT in DuckDB;
    Spark's re/im sums stay within long range at these scales and are
    cast to double only for the final amplitude). Scale: one
    combinable groupBy(day), then arithmetic on a 7-phase rollup.
    """
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).alias("d")
    ).agg(F.sum(cents(F.col("value"))).cast("long").alias("rev_cents"))
    tot = daily.agg(
        F.count(F.lit(1)).alias("n"), F.sum("rev_cents").cast("long").alias("s")
    )
    cos_arr = F.array(*[F.lit(c).cast("long") for c in _DFT_COS])
    sin_arr = F.array(*[F.lit(s).cast("long") for s in _DFT_SIN])
    dev = daily.crossJoin(F.broadcast(tot)).select(
        ((F.col("d") % 7) + 1).cast("int").alias("phase1"),
        (F.col("rev_cents") * F.col("n") - F.col("s")).alias("dev_scaled"),
        "n",
    )
    proj = dev.groupBy("n").agg(
        F.sum(F.col("dev_scaled") * F.element_at(cos_arr, F.col("phase1")))
        .cast("double")
        .alias("re_micro"),
        F.sum(F.col("dev_scaled") * F.element_at(sin_arr, F.col("phase1")))
        .cast("double")
        .alias("im_micro"),
    )
    return proj.select(
        F.col("n").alias("n_days"),
        "re_micro",
        "im_micro",
        F.round(
            F.sqrt(
                F.col("re_micro") * F.col("re_micro")
                + F.col("im_micro") * F.col("im_micro")
            )
            / (F.col("n").cast("double") * F.col("n") * 1000000 * 100),
            6,
        ).alias("weekly_amplitude_dollars"),
    )


# ---------------------------------------------------------------------------
# Theil-Sen robust trend estimator (median of pairwise slopes)
# ---------------------------------------------------------------------------

_THEIL_SEN_ORACLE = f"""
WITH weekly AS (
  SELECT (DATEDIFF('day', DATE '1996-01-01', CAST(l_shipdate AS DATE))) // 7
           AS wk,
         CAST(SUM({CENTS_SQL.format(expr="l_extendedprice * (1 - l_discount)")})
              AS BIGINT) AS rev_cents
  FROM lineitem
  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
  GROUP BY 1
),
pairs AS (
  SELECT a.wk AS w1, b.wk AS w2,
         CAST(b.rev_cents - a.rev_cents AS DOUBLE) / (b.wk - a.wk) AS slope
  FROM weekly a JOIN weekly b ON a.wk < b.wk
),
ordered AS (
  SELECT slope, ROW_NUMBER() OVER (ORDER BY slope, w1, w2) AS pos,
         COUNT(*) OVER () AS n_pairs
  FROM pairs
),
sen AS (
  SELECT MAX(n_pairs) AS n_pairs,
         SUM(CASE WHEN pos = (n_pairs + 1) // 2 THEN slope ELSE 0 END) AS s_lo,
         SUM(CASE WHEN pos = (n_pairs + 2) // 2 THEN slope ELSE 0 END) AS s_hi
  FROM ordered
),
ols AS (
  SELECT CAST(COUNT(*) AS BIGINT)            AS n,
         CAST(SUM(wk) AS BIGINT)             AS sx,
         CAST(SUM(rev_cents) AS BIGINT)      AS sy,
         CAST(SUM(wk * rev_cents) AS BIGINT) AS sxy,
         CAST(SUM(wk * wk) AS BIGINT)        AS sxx
  FROM weekly
)
SELECT ols.n AS n_weeks, sen.n_pairs,
       ROUND((s_lo + s_hi) / 2 / 100, 6) AS sen_slope_dollars_per_week,
       ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE) / 100, 6)
         AS ols_slope_dollars_per_week
FROM sen CROSS JOIN ols
"""


@register(
    "t_theil_sen_trend",
    oracle=_THEIL_SEN_ORACLE,
    tags=("A1", "J10", "W1", "F2"),
)
def t_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend of 1996 weekly revenue — the median of all
    pairwise slopes — next to the OLS slope from exact sufficient
    statistics, the robust-vs-classical pair every monitoring stack
    wants (one outlier week moves OLS but not Theil-Sen).

    Scale design — the O(n²) pair generation runs on the CALENDAR
    rollup, never the fact: one combinable groupBy(week) pass over
    lineitem (the only shuffle of the fact), then ≤52 weekly points →
    ≤1326 slope pairs, a bounded theta self-join. The median is picked
    by explicit middle positions ((n+1)//2, (n+2)//2 over a total order
    with (slope, w1, w2) tie-break), identical integer arithmetic on
    both engines — no engine median() whose interpolation rule could
    differ. Slopes are exact-BIGINT cent differences divided once as
    DOUBLE (same operands, same order → same bits). OLS sufficient
    stats are BIGINT (wk ≤ 52 keeps n*Σxy far from overflow; at larger
    calendars scale y to dollars first)."""
    li = load_table(spark, sf_dir, "lineitem")
    weekly = (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
        )
        .groupBy(
            F.floor(
                F.datediff(F.col("l_shipdate").cast("date"), F.lit("1996-01-01"))
                / 7
            ).alias("wk")
        )
        .agg(
            F.sum(cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            .alias("rev_cents")
        )
    )
    a, b = weekly.alias("a"), weekly.alias("b")
    pairs = a.join(b, F.col("a.wk") < F.col("b.wk")).select(
        F.col("a.wk").alias("w1"),
        F.col("b.wk").alias("w2"),
        (
            (F.col("b.rev_cents") - F.col("a.rev_cents")).cast("double")
            / (F.col("b.wk") - F.col("a.wk"))
        ).alias("slope"),
    )
    wpos = Window.orderBy("slope", "w1", "w2")
    ordered = pairs.select(
        "slope",
        F.row_number().over(wpos).alias("pos"),
        F.count(F.lit(1)).over(
            Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("n_pairs"),
    )
    sen = ordered.agg(
        F.max("n_pairs").alias("n_pairs"),
        F.sum(
            F.when(
                F.col("pos") == F.floor((F.col("n_pairs") + 1) / 2), F.col("slope")
            ).otherwise(0.0)
        ).alias("s_lo"),
        F.sum(
            F.when(
                F.col("pos") == F.floor((F.col("n_pairs") + 2) / 2), F.col("slope")
            ).otherwise(0.0)
        ).alias("s_hi"),
    )
    ols = weekly.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("wk").alias("sx"),
        F.sum("rev_cents").alias("sy"),
        F.sum(F.col("wk") * F.col("rev_cents")).alias("sxy"),
        F.sum(F.col("wk") * F.col("wk")).alias("sxx"),
    )
    return sen.crossJoin(F.broadcast(ols)).select(
        F.col("n").alias("n_weeks"),
        "n_pairs",
        F.round((F.col("s_lo") + F.col("s_hi")) / 2 / 100, 6).alias(
            "sen_slope_dollars_per_week"
        ),
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
            / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
            / 100,
            6,
        ).alias("ols_slope_dollars_per_week"),
    )


# ---------------------------------------------------------------------------
# Durbin-Watson residual autocorrelation of the weekly-trend OLS
# ---------------------------------------------------------------------------

_DW_ORACLE = f"""
WITH weekly AS (
  SELECT (DATEDIFF('day', DATE '1996-01-01', CAST(l_shipdate AS DATE))) // 7
           AS wk,
         CAST(SUM({CENTS_SQL.format(expr="l_extendedprice * (1 - l_discount)")})
              AS BIGINT) AS rev_cents
  FROM lineitem
  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
  GROUP BY 1
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT)            AS n,
         CAST(SUM(wk) AS BIGINT)             AS sx,
         CAST(SUM(rev_cents) AS BIGINT)      AS sy,
         CAST(SUM(wk * rev_cents) AS BIGINT) AS sxy,
         CAST(SUM(wk * wk) AS BIGINT)        AS sxx
  FROM weekly
),
resid AS (
  SELECT wk,
         rev_cents
         - (CAST(s.sy AS DOUBLE) / s.n
            - CAST(s.n * s.sxy - s.sx * s.sy AS DOUBLE)
              / CAST(s.n * s.sxx - s.sx * s.sx AS DOUBLE)
              * s.sx / s.n)
         - CAST(s.n * s.sxy - s.sx * s.sy AS DOUBLE)
           / CAST(s.n * s.sxx - s.sx * s.sx AS DOUBLE) * wk AS e
  FROM weekly CROSS JOIN s
),
lagged AS (
  SELECT e, e - LAG(e) OVER (ORDER BY wk) AS de FROM resid
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_weeks,
       ROUND(SUM(de * de) / SUM(e * e), 6) AS durbin_watson,
       ROUND(1 - SUM(de * de) / SUM(e * e) / 2, 6) AS rho_approx
FROM lagged
"""


@register(
    "t_durbin_watson_residuals",
    oracle=_DW_ORACLE,
    tags=("W2", "A1", "F2"),
)
def t_durbin_watson_residuals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin-Watson test on the residuals of the 1996 weekly-revenue
    trend fit — the standard "did OLS leave serial correlation on the
    table" diagnostic that decides whether a trend model's error bars
    can be trusted (DW ≈ 2 means independent residuals; ρ ≈ 1 − DW/2).
    Completes the trend toolkit: `t_theil_sen_trend` fits robustly,
    this audits the classical fit.

    Scale design — same as the Theil-Sen query: the fact is touched
    once by a combinable groupBy(week); residuals, the lag window and
    the DW ratio all run on the ≤52-row calendar rollup. Slope and
    intercept come from exact BIGINT sufficient statistics; residuals
    are one fixed double expression; Σ(Δe)² / Σe² divides two sums of
    ≤52 doubles accumulated in the same order both engines (ORDER BY wk
    lag), rounded to 6."""
    li = load_table(spark, sf_dir, "lineitem")
    weekly = (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
        )
        .groupBy(
            F.floor(
                F.datediff(F.col("l_shipdate").cast("date"), F.lit("1996-01-01"))
                / 7
            ).alias("wk")
        )
        .agg(
            F.sum(cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            .alias("rev_cents")
        )
    )
    s = weekly.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("wk").alias("sx"),
        F.sum("rev_cents").alias("sy"),
        F.sum(F.col("wk") * F.col("rev_cents")).alias("sxy"),
        F.sum(F.col("wk") * F.col("wk")).alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    ) / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    intercept = F.col("sy").cast("double") / F.col("n") - slope * F.col("sx") / F.col(
        "n"
    )
    resid = weekly.crossJoin(broadcast(s)).select(
        "wk", (F.col("rev_cents") - intercept - slope * F.col("wk")).alias("e")
    )
    lagged = resid.select(
        "e", (F.col("e") - F.lag("e").over(Window.orderBy("wk"))).alias("de")
    )
    return lagged.agg(
        F.count(F.lit(1)).alias("n_weeks"),
        F.round(
            F.sum(F.col("de") * F.col("de")) / F.sum(F.col("e") * F.col("e")), 6
        ).alias("durbin_watson"),
        F.round(
            1
            - F.sum(F.col("de") * F.col("de")) / F.sum(F.col("e") * F.col("e")) / 2,
            6,
        ).alias("rho_approx"),
    )


# ---------------------------------------------------------------------------
# SPC XmR (individuals / moving-range) control chart
# ---------------------------------------------------------------------------

_XMR_ORACLE = f"""
WITH daily AS (
  SELECT CAST(l_shipdate AS DATE) AS day,
         CAST(SUM({CENTS_SQL.format(expr="l_extendedprice * (1 - l_discount)")})
              AS BIGINT) AS rev_cents
  FROM lineitem
  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-07-01'
  GROUP BY 1
),
mr AS (
  SELECT day, rev_cents,
         ABS(rev_cents - LAG(rev_cents) OVER (ORDER BY day)) AS moving_range
  FROM daily
),
limits AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(SUM(rev_cents) AS BIGINT) AS s,
         CAST(SUM(moving_range) AS BIGINT) AS smr,
         CAST(COUNT(moving_range) AS BIGINT) AS nmr
  FROM mr
),
judged AS (
  SELECT m.day, m.rev_cents,
         CASE WHEN ABS(m.rev_cents - CAST(l.s AS DOUBLE) / l.n_days)
                   > 2.66 * (CAST(l.smr AS DOUBLE) / l.nmr)
              THEN 1 ELSE 0 END AS out_of_control,
         CASE WHEN m.rev_cents > CAST(l.s AS DOUBLE) / l.n_days
              THEN 1 ELSE 0 END AS above
  FROM mr m CROSS JOIN limits l
),
runs AS (
  SELECT above,
         ROW_NUMBER() OVER (ORDER BY day)
         - ROW_NUMBER() OVER (PARTITION BY above ORDER BY day) AS island
  FROM judged
),
longest AS (
  SELECT CAST(MAX(run_len) AS BIGINT) AS longest_run
  FROM (SELECT COUNT(*) AS run_len FROM runs GROUP BY above, island)
)
SELECT l.n_days,
       ROUND(CAST(l.s AS DOUBLE) / l.n_days / 100, 6) AS center_dollars,
       ROUND(2.66 * (CAST(l.smr AS DOUBLE) / l.nmr) / 100, 6)
         AS limit_halfwidth_dollars,
       (SELECT CAST(SUM(out_of_control) AS BIGINT) FROM judged)
         AS n_out_of_control,
       (SELECT longest_run FROM longest) AS longest_run
FROM limits l
"""


@register(
    "t_spc_xmr_chart",
    oracle=_XMR_ORACLE,
    tags=("W2", "A1", "W1"),
)
def t_spc_xmr_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XmR (individuals & moving-range) statistical process control on
    daily revenue: center line, ±2.66·mR̄ natural process limits, the
    out-of-control point count, and the longest same-side-of-center run
    (the Western-Electric runs signal) — the control chart every
    data-quality/SLO monitor reduces to.

    Scale design — the fact is touched once (combinable groupBy(day));
    the moving range, control limits, violation judging and
    gaps-islands runs detection all operate on the calendar-bounded
    rollup (~180 rows). The 2.66 anti-biasing constant is a pinned
    literal; limits derive from exact BIGINT sums, judged against
    integer cents, so the violation counts are exact integers and the
    two dollar outputs are single round-6 float expressions."""
    li = load_table(spark, sf_dir, "lineitem")
    daily = (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1996-07-01")
        )
        .groupBy(F.col("l_shipdate").cast("date").alias("day"))
        .agg(
            F.sum(cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            .alias("rev_cents")
        )
    )
    w = Window.orderBy("day")
    mr = daily.withColumn(
        "moving_range", F.abs(F.col("rev_cents") - F.lag("rev_cents").over(w))
    )
    limits = mr.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("rev_cents").alias("s"),
        F.sum("moving_range").alias("smr"),
        F.count("moving_range").alias("nmr"),
    )
    center = F.col("s").cast("double") / F.col("n_days")
    halfwidth = 2.66 * (F.col("smr").cast("double") / F.col("nmr"))
    judged = mr.crossJoin(broadcast(limits)).select(
        "day",
        "rev_cents",
        F.when(F.abs(F.col("rev_cents") - center) > halfwidth, 1)
        .otherwise(0)
        .alias("out_of_control"),
        F.when(F.col("rev_cents") > center, 1).otherwise(0).alias("above"),
    )
    runs = judged.select(
        "above",
        (
            F.row_number().over(Window.orderBy("day"))
            - F.row_number().over(Window.partitionBy("above").orderBy("day"))
        ).alias("island"),
    )
    longest = (
        runs.groupBy("above", "island")
        .agg(F.count(F.lit(1)).alias("run_len"))
        .agg(F.max("run_len").alias("longest_run"))
    )
    ooc = judged.agg(F.sum("out_of_control").cast("long").alias("n_out_of_control"))
    return (
        limits.crossJoin(broadcast(ooc))
        .crossJoin(broadcast(longest))
        .select(
            "n_days",
            F.round(center / 100, 6).alias("center_dollars"),
            F.round(halfwidth / 100, 6).alias("limit_halfwidth_dollars"),
            "n_out_of_control",
            "longest_run",
        )
    )


# ---------------------------------------------------------------------------
# Mann-Kendall trend test (the significance companion to Theil-Sen)
# ---------------------------------------------------------------------------

_MANN_KENDALL_ORACLE = f"""
WITH weekly AS (
  SELECT (DATEDIFF('day', DATE '1996-01-01', CAST(l_shipdate AS DATE))) // 7
           AS wk,
         CAST(SUM({CENTS_SQL.format(expr="l_extendedprice * (1 - l_discount)")})
              AS BIGINT) AS y
  FROM lineitem
  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
  GROUP BY 1
),
pairs AS (
  SELECT CASE WHEN b.y > a.y THEN 1 WHEN b.y < a.y THEN -1 ELSE 0 END AS sgn
  FROM weekly a JOIN weekly b ON a.wk < b.wk
),
s_stat AS (
  SELECT CAST(SUM(sgn) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS n_pairs
  FROM pairs
),
n_rows AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM weekly),
ties AS (
  SELECT CAST(COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT)
           AS tie_term
  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM weekly GROUP BY y
        HAVING COUNT(*) > 1)
)
SELECT n, n_pairs, s,
       ROUND((CAST(n AS DOUBLE) * (n - 1) * (2 * n + 5)
              - CAST(tie_term AS DOUBLE)) / 18, 6) AS var_s,
       ROUND(CASE WHEN s > 0 THEN (s - 1)
                  WHEN s < 0 THEN (s + 1)
                  ELSE 0 END
             / SQRT((CAST(n AS DOUBLE) * (n - 1) * (2 * n + 5)
                     - CAST(tie_term AS DOUBLE)) / 18), 6) AS z_stat
FROM s_stat CROSS JOIN n_rows CROSS JOIN ties
"""


@register(
    "t_mann_kendall_test",
    oracle=_MANN_KENDALL_ORACLE,
    tags=("J10", "A1", "A2", "F2"),
)
def t_mann_kendall_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall trend test on the 1996 weekly revenue series — the
    nonparametric "is there ANY monotone trend?" significance test that
    pairs with `t_theil_sen_trend`'s slope estimate (Sen estimates the
    magnitude, Mann-Kendall says whether to believe its sign at all):
    S = Σ sign(y_j − y_i) over ordered pairs, tie-corrected variance
    n(n−1)(2n+5)/18 − Σt(t−1)(2t+5)/18, continuity-corrected z.

    Determinism & scale — the pair pass is the SAME bounded
    calendar-rollup theta self-join as Theil-Sen (≤1378 pairs); S and
    the tie term are exact integers; the z is one fixed float
    expression, round-6. The fact is touched once."""
    li = load_table(spark, sf_dir, "lineitem")
    weekly = (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
        )
        .groupBy(
            F.expr(
                "datediff(CAST(l_shipdate AS DATE), DATE '1996-01-01') DIV 7"
            ).alias("wk")
        )
        .agg(
            F.sum(cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            .alias("y")
        )
    )
    a, b = weekly.alias("a"), weekly.alias("b")
    pairs = a.join(b, F.col("a.wk") < F.col("b.wk")).select(
        F.when(F.col("b.y") > F.col("a.y"), 1)
        .when(F.col("b.y") < F.col("a.y"), -1)
        .otherwise(0)
        .alias("sgn")
    )
    s_stat = pairs.agg(
        F.sum("sgn").cast("long").alias("s"),
        F.count(F.lit(1)).alias("n_pairs"),
    )
    n_rows = weekly.agg(F.count(F.lit(1)).alias("n"))
    ties = (
        weekly.groupBy("y")
        .agg(F.count(F.lit(1)).alias("t"))
        .filter(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)),
                F.lit(0),
            )
            .cast("long")
            .alias("tie_term")
        )
    )
    var_s = (
        F.col("n").cast("double") * (F.col("n") - 1) * (2 * F.col("n") + 5)
        - F.col("tie_term").cast("double")
    ) / 18
    z = (
        F.when(F.col("s") > 0, F.col("s") - 1)
        .when(F.col("s") < 0, F.col("s") + 1)
        .otherwise(0)
        / F.sqrt(var_s)
    )
    return (
        s_stat.crossJoin(broadcast(n_rows))
        .crossJoin(broadcast(ties))
        .select(
            "n",
            "n_pairs",
            "s",
            F.round(var_s, 6).alias("var_s"),
            F.round(z, 6).alias("z_stat"),
        )
    )


# ---------------------------------------------------------------------------
# Lagged cross-correlation: order revenue leads shipped quantity
# ---------------------------------------------------------------------------

_CCF_ORACLE = f"""
WITH x AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(SUM({CENTS_SQL.format(expr="o_totalprice")}) AS BIGINT) AS xr
  FROM orders
  WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
  GROUP BY 1
),
y AS (
  SELECT CAST(l_shipdate AS DATE) AS d,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)
           AS yq
  FROM lineitem
  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-06-01'
  GROUP BY 1
),
lags AS (SELECT UNNEST(GENERATE_SERIES(0, 14)) AS k),
paired AS (
  SELECT l.k, x.xr, y.yq
  FROM x CROSS JOIN lags l
  JOIN y ON y.d = x.d + CAST(l.k AS INTEGER)
),
stats AS (
  SELECT k, COUNT(*) AS n,
         CAST(SUM(xr) AS BIGINT) AS sx,
         CAST(SUM(yq) AS BIGINT) AS sy,
         CAST(SUM(CAST(xr AS HUGEINT) * yq) AS HUGEINT) AS sxy,
         CAST(SUM(CAST(xr AS HUGEINT) * xr) AS HUGEINT) AS sxx,
         CAST(SUM(CAST(yq AS HUGEINT) * yq) AS HUGEINT) AS syy
  FROM paired GROUP BY k
),
r AS (
  SELECT k, n,
         ROUND((n * sxy - CAST(sx AS HUGEINT) * sy)
               / SQRT(CAST(n * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE))
               / SQRT(CAST(n * syy - CAST(sy AS HUGEINT) * sy AS DOUBLE)), 6)
           AS ccf_r
  FROM stats
)
SELECT CAST(k AS BIGINT) AS lag_days, CAST(n AS BIGINT) AS n_days, ccf_r,
       ccf_r = MAX(ccf_r) OVER () AS is_peak_lag
FROM r ORDER BY lag_days
"""


@register(
    "t_cross_correlation_lags",
    oracle=_CCF_ORACLE,
    tags=("A1", "J7", "W3", "F2", "F3"),
)
def t_cross_correlation_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lagged cross-correlation function between daily order revenue
    and daily SHIPPED quantity at lags 0..14 — the lead-lag diagnostic
    that reads the order→fulfilment delay directly off the data (the
    peak lag is the typical shipping latency), the precursor to any
    transfer-function forecast.

    Scale design: both series are combinable one-pass day rollups
    bounded by the CALENDAR; the lag alignment is the 366-row x-series
    cross the 15-row lag dim joined to y on an exact shifted-date equi
    key (≤5.5k rows — never a data-sized shuffle). Pearson sufficient
    statistics per lag are exact BIGINT/decimal (products cast wide
    BEFORE multiply, the sf1-overflow posture); one float formula per
    lag row, identical trees both engines."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    x = (
        orders.filter(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1997-01-01")
        )
        .groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(F.sum(cents(F.col("o_totalprice"))).cast("long").alias("xr"))
    )
    y = (
        lineitem.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-06-01")
        )
        .groupBy(F.col("l_shipdate").cast("date").alias("yd"))
        .agg(F.sum(F.col("l_quantity").cast("long")).cast("long").alias("yq"))
    )
    lags = spark.range(0, 15).select(F.col("id").cast("int").alias("k"))
    paired = (
        x.crossJoin(F.broadcast(lags))
        .withColumn("yd", F.expr("date_add(d, k)"))
        .join(y, "yd")
    )

    def dec(c: F.Column) -> F.Column:
        return c.cast("decimal(38,0)")

    stats = paired.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xr").cast("long").alias("sx"),
        F.sum("yq").cast("long").alias("sy"),
        F.sum(dec(F.col("xr")) * F.col("yq")).alias("sxy"),
        F.sum(dec(F.col("xr")) * F.col("xr")).alias("sxx"),
        F.sum(dec(F.col("yq")) * F.col("yq")).alias("syy"),
    )
    nd = F.col("n").cast("decimal(38,0)")
    sxd = F.col("sx").cast("decimal(38,0)")
    syd = F.col("sy").cast("decimal(38,0)")
    r = stats.select(
        F.col("k").cast("long").alias("lag_days"),
        F.col("n").cast("long").alias("n_days"),
        F.round(
            (nd * F.col("sxy") - sxd * F.col("sy")).cast("double")
            / F.sqrt((nd * F.col("sxx") - sxd * F.col("sx")).cast("double"))
            / F.sqrt((nd * F.col("syy") - syd * F.col("sy")).cast("double")),
            6,
        ).alias("ccf_r"),
    )
    return r.select(
        "*",
        (F.col("ccf_r") == F.max("ccf_r").over(Window.partitionBy())).alias(
            "is_peak_lag"
        ),
    ).orderBy("lag_days")


# ---------------------------------------------------------------------------
# Hurst exponent via rescaled-range (R/S) analysis of the daily series
# ---------------------------------------------------------------------------

_HURST_ORACLE = f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(SUM({CENTS_SQL.format(expr="o_totalprice")}) AS BIGINT) AS x
  FROM orders
  WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
  GROUP BY 1
),
idx AS (
  SELECT x, ROW_NUMBER() OVER (ORDER BY d) AS i,
         COUNT(*) OVER () AS n_days
  FROM daily
),
sized AS (
  SELECT s.size, (i.i - 1) // s.size AS blk,
         i.i - ((i.i - 1) // s.size) * s.size AS k,
         i.x, i.i, i.n_days
  FROM idx i CROSS JOIN (
    SELECT UNNEST([8, 16, 32, 64]) AS size) s
  WHERE (i.i - 1) // s.size < i.n_days // s.size
),
win AS (
  SELECT size, blk, k, x,
         SUM(x) OVER (PARTITION BY size, blk ORDER BY k
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS pk,
         CAST(SUM(x) OVER (PARTITION BY size, blk) AS BIGINT) AS s,
         CAST(SUM(CAST(x AS HUGEINT) * x) OVER (PARTITION BY size, blk)
              AS HUGEINT) AS ss
  FROM sized
),
nz AS (
  SELECT size, blk, s, ss,
         size * pk - k * s AS nzk
  FROM win
),
blocks AS (
  SELECT size, blk,
         CAST(MAX(nzk) - MIN(nzk) AS BIGINT) AS rn,
         MAX(s) AS s, MAX(ss) AS ss
  FROM nz GROUP BY size, blk
),
lnrs AS (
  SELECT size,
         CAST(ROUND(LN(CAST(rn AS DOUBLE)
                       / SQRT(CAST(size * ss - CAST(s AS HUGEINT) * s
                                   AS DOUBLE))) * 1000000) AS BIGINT)
           AS ln_rs_micro
  FROM blocks
  WHERE rn > 0 AND size * ss - CAST(s AS HUGEINT) * s > 0
),
per_size AS (
  SELECT size, CAST(COUNT(*) AS BIGINT) AS n_blocks,
         CAST(SUM(ln_rs_micro) // COUNT(*) AS BIGINT) AS y_micro,
         CAST(ROUND(LN(CAST(size AS DOUBLE)) * 1000000) AS BIGINT)
           AS x_micro
  FROM lnrs GROUP BY size
),
ols AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(x_micro) AS BIGINT) AS sx,
         CAST(SUM(y_micro) AS BIGINT) AS sy,
         CAST(SUM(x_micro * y_micro) AS HUGEINT) AS sxy,
         CAST(SUM(x_micro * x_micro) AS HUGEINT) AS sxx
  FROM per_size
)
SELECT p.size AS block_size, p.n_blocks,
       ROUND(p.y_micro / 1000000.0, 6) AS mean_ln_rs,
       ROUND((o.n * o.sxy - o.sx * o.sy)
             / CAST(o.n * o.sxx - o.sx * o.sx AS DOUBLE), 6) AS hurst_h
FROM per_size p CROSS JOIN ols o
ORDER BY block_size
"""


@register(
    "t_hurst_exponent",
    oracle=_HURST_ORACLE,
    tags=("A1", "W3", "W1", "F3", "J9"),
)
def t_hurst_exponent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent of daily revenue via rescaled-range (R/S)
    analysis — H > 0.5 means long-range persistence (trends compound),
    H < 0.5 mean reversion, H ≈ 0.5 a random walk; the classic
    long-memory diagnostic that decides whether naive i.i.d. confidence
    intervals on time aggregates are lies.

    Determinism + scale design: within each block the cumulative
    deviation is kept exact by scaling — n·Z_k = n·P_k − k·Σx is pure
    BIGINT (no mean subtraction in floats), so the range R·n =
    max − min is exact, and R/S = rn / √(n·Σx² − (Σx)²) has
    exact-integer operands (the Welch/variance identity). ln(R/S) is
    micro-nat rounded per block, per-size means use integer floor
    division, and the final log-log OLS runs on 4 exact points. The
    heavy pass is ONE combinable day rollup; every window partitions by
    (size, block) over the ≤4×366-row calendar-bounded spine."""
    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.filter(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1997-01-01")
        )
        .groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(F.sum(cents(F.col("o_totalprice"))).cast("long").alias("x"))
    )
    idx = daily.select(
        "x",
        F.row_number().over(Window.orderBy("d")).alias("i"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n_days"),
    )
    sizes = spark.range(0, 4).select(
        F.expr("CAST(shiftleft(8, CAST(id AS INT)) AS INT)").alias("size")
    )
    sized = (
        idx.crossJoin(F.broadcast(sizes))
        .withColumn("blk", F.expr("(i - 1) DIV size"))
        .withColumn("k", F.expr("i - ((i - 1) DIV size) * size"))
        .filter(F.expr("(i - 1) DIV size < n_days DIV size"))
    )
    w_blk = Window.partitionBy("size", "blk")
    w_run = w_blk.orderBy("k").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    win = sized.select(
        "size",
        "blk",
        "k",
        F.sum("x").over(w_run).alias("pk"),
        F.sum("x").over(w_blk).cast("long").alias("s"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x"))
        .over(w_blk)
        .alias("ss"),
    )
    blocks = (
        win.withColumn("nzk", F.expr("size * pk - k * s"))
        .groupBy("size", "blk")
        .agg(
            (F.max("nzk") - F.min("nzk")).cast("long").alias("rn"),
            F.max("s").alias("s"),
            F.max("ss").alias("ss"),
        )
    )
    lnrs = blocks.filter(
        (F.col("rn") > 0)
        & (
            F.col("size") * F.col("ss")
            - F.col("s").cast("decimal(38,0)") * F.col("s")
            > 0
        )
    ).select(
        "size",
        F.expr(
            "CAST(ROUND(LN(CAST(rn AS DOUBLE) "
            "/ SQRT(CAST(size * ss - CAST(s AS DECIMAL(38,0)) * s "
            "AS DOUBLE))) * 1000000) AS BIGINT)"
        ).alias("ln_rs_micro"),
    )
    per_size = (
        lnrs.groupBy("size")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_blocks"),
            F.expr("SUM(ln_rs_micro) DIV COUNT(*)").alias("y_micro"),
        )
        .withColumn(
            "x_micro",
            F.expr(
                "CAST(ROUND(LN(CAST(size AS DOUBLE)) * 1000000) AS BIGINT)"
            ),
        )
    )

    def dec(c: F.Column) -> F.Column:
        return c.cast("decimal(38,0)")

    ols = per_size.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x_micro").cast("long").alias("sx"),
        F.sum("y_micro").cast("long").alias("sy"),
        F.sum(dec(F.col("x_micro") * F.col("y_micro"))).alias("sxy"),
        F.sum(dec(F.col("x_micro") * F.col("x_micro"))).alias("sxx"),
    )
    nd = F.col("n").cast("decimal(38,0)")
    sxd = F.col("sx").cast("decimal(38,0)")
    return (
        per_size.crossJoin(F.broadcast(ols))
        .select(
            F.col("size").cast("long").alias("block_size"),
            "n_blocks",
            F.round(F.col("y_micro") / 1000000.0, 6).alias("mean_ln_rs"),
            F.round(
                (nd * F.col("sxy") - sxd * F.col("sy")).cast("double")
                / (nd * F.col("sxx") - sxd * F.col("sx")).cast("double"),
                6,
            ).alias("hurst_h"),
        )
        .orderBy("block_size")
    )


# ---------------------------------------------------------------------------
# Segmented (hinge) regression: mid-year trend break via exact Cramer solve
# ---------------------------------------------------------------------------

_SEGREG_ORACLE = f"""
WITH daily AS (
  SELECT DATEDIFF('day', DATE '1996-01-01', CAST(o_orderdate AS DATE)) + 1
           AS t,
         CAST(SUM({CENTS_SQL.format(expr="o_totalprice")}) AS BIGINT) AS y
  FROM orders
  WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
  GROUP BY 1
),
feats AS (
  SELECT t, y, GREATEST(t - 183, 0) AS h FROM daily
),
sums AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(t) AS HUGEINT) AS st,
         CAST(SUM(h) AS HUGEINT) AS sh,
         CAST(SUM(CAST(t AS HUGEINT) * t) AS HUGEINT) AS stt,
         CAST(SUM(CAST(t AS HUGEINT) * h) AS HUGEINT) AS sth,
         CAST(SUM(CAST(h AS HUGEINT) * h) AS HUGEINT) AS shh,
         CAST(SUM(y) AS HUGEINT) AS sy,
         CAST(SUM(CAST(t AS HUGEINT) * y) AS HUGEINT) AS sty,
         CAST(SUM(CAST(h AS HUGEINT) * y) AS HUGEINT) AS shy
  FROM feats
),
dets AS (
  SELECT n,
         n * (stt * shh - sth * sth) - st * (st * shh - sth * sh)
           + sh * (st * sth - stt * sh) AS det,
         sy * (stt * shh - sth * sth) - st * (sty * shh - shy * sth)
           + sh * (sty * sth - stt * shy) AS det_a,
         n * (sty * shh - shy * sth) - sy * (st * shh - sth * sh)
           + sh * (st * shy - sty * sh) AS det_b,
         n * (stt * shy - sth * sty) - st * (st * shy - sty * sh)
           + sy * (st * sth - stt * sh) AS det_c
  FROM sums
)
SELECT CAST(n AS BIGINT) AS n_days,
       CAST(183 AS BIGINT) AS knot_day,
       ROUND(CAST(det_a AS DOUBLE) / CAST(det AS DOUBLE) / 100, 6)
         AS intercept_dollars,
       ROUND(CAST(det_b AS DOUBLE) / CAST(det AS DOUBLE) / 100, 6)
         AS slope_pre_dollars_per_day,
       ROUND((CAST(det_b AS DOUBLE) + CAST(det_c AS DOUBLE))
             / CAST(det AS DOUBLE) / 100, 6)
         AS slope_post_dollars_per_day,
       ROUND(CAST(det_c AS DOUBLE) / CAST(det AS DOUBLE) / 100, 6)
         AS slope_change_dollars_per_day
FROM dets
"""


@register(
    "t_segmented_regression",
    oracle=_SEGREG_ORACLE,
    tags=("A1", "F3", "F2", "A2"),
)
def t_segmented_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segmented (piecewise-linear) regression with a mid-year knot:
    y = a + b·t + c·max(0, t−183) fit by EXACT normal equations — the
    trend-break readout (did growth change slope after H1?) that a
    plain OLS line averages away; c is the slope change at the knot.

    Determinism + scale design: the 3×3 normal-equations system is
    solved by Cramer's rule on exact integer sufficient statistics —
    all four determinants are pure HUGEINT/decimal arithmetic (products
    cast wide BEFORE multiply), so the fit is bit-identical under any
    partitioning; the only floats are the four final determinant
    ratios. ONE combinable day rollup feeds nine sufficient sums; the
    hinge feature is plain integer math (no knot search — the knot is
    a declared literal, as in interrupted-time-series designs)."""
    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.filter(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1997-01-01")
        )
        .groupBy(
            (
                F.datediff(
                    F.col("o_orderdate").cast("date"), F.lit("1996-01-01")
                )
                + 1
            ).alias("t")
        )
        .agg(F.sum(cents(F.col("o_totalprice"))).cast("long").alias("y"))
    )
    feats = daily.select(
        "t", "y", F.greatest(F.col("t") - 183, F.lit(0)).alias("h")
    )

    def dec(c: F.Column) -> F.Column:
        return c.cast("decimal(38,0)")

    sums = feats.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("t").cast("decimal(38,0)").alias("st"),
        F.sum("h").cast("decimal(38,0)").alias("sh"),
        F.sum(dec(F.col("t")) * F.col("t")).alias("stt"),
        F.sum(dec(F.col("t")) * F.col("h")).alias("sth"),
        F.sum(dec(F.col("h")) * F.col("h")).alias("shh"),
        F.sum("y").cast("decimal(38,0)").alias("sy"),
        F.sum(dec(F.col("t")) * F.col("y")).alias("sty"),
        F.sum(dec(F.col("h")) * F.col("y")).alias("shy"),
    )
    dets = sums.select(
        "n",
        F.expr(
            "n * (stt * shh - sth * sth) - st * (st * shh - sth * sh) "
            "+ sh * (st * sth - stt * sh)"
        ).alias("det"),
        F.expr(
            "sy * (stt * shh - sth * sth) - st * (sty * shh - shy * sth) "
            "+ sh * (sty * sth - stt * shy)"
        ).alias("det_a"),
        F.expr(
            "n * (sty * shh - shy * sth) - sy * (st * shh - sth * sh) "
            "+ sh * (st * shy - sty * sh)"
        ).alias("det_b"),
        F.expr(
            "n * (stt * shy - sth * sty) - st * (st * shy - sty * sh) "
            "+ sy * (st * sth - stt * sh)"
        ).alias("det_c"),
    )
    return dets.select(
        F.col("n").cast("long").alias("n_days"),
        F.lit(183).cast("long").alias("knot_day"),
        F.round(
            F.col("det_a").cast("double") / F.col("det").cast("double") / 100,
            6,
        ).alias("intercept_dollars"),
        F.round(
            F.col("det_b").cast("double") / F.col("det").cast("double") / 100,
            6,
        ).alias("slope_pre_dollars_per_day"),
        F.round(
            (F.col("det_b").cast("double") + F.col("det_c").cast("double"))
            / F.col("det").cast("double")
            / 100,
            6,
        ).alias("slope_post_dollars_per_day"),
        F.round(
            F.col("det_c").cast("double") / F.col("det").cast("double") / 100,
            6,
        ).alias("slope_change_dollars_per_day"),
    )


# ---------------------------------------------------------------------------
# Little's law: L = λW proven EXACTLY on the order fulfilment pipeline
# ---------------------------------------------------------------------------

_LITTLES_ORACLE = """
WITH spans AS (
  SELECT o.o_orderkey,
         CAST(o.o_orderdate AS DATE) AS arrive,
         MAX(CAST(l.l_shipdate AS DATE)) AS depart
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  WHERE o.o_orderdate >= DATE '1996-01-01'
    AND o.o_orderdate < DATE '1997-01-01'
  GROUP BY 1, 2
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(DATEDIFF('day', arrive, depart) + 1) AS BIGINT)
           AS w_sum_days,
         CAST(DATEDIFF('day', MIN(arrive), MAX(depart)) + 1 AS BIGINT)
           AS t_days
  FROM spans
),
deltas AS (
  SELECT arrive AS d, CAST(COUNT(*) AS BIGINT) AS delta FROM spans GROUP BY 1
  UNION ALL
  SELECT depart + CAST(1 AS INTEGER) AS d, CAST(-COUNT(*) AS BIGINT)
  FROM spans GROUP BY 1
),
merged AS (
  SELECT d, CAST(SUM(delta) AS BIGINT) AS delta FROM deltas GROUP BY d
),
sweep AS (
  SELECT d,
         CAST(SUM(delta) OVER (ORDER BY d
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS in_system,
         LEAD(d) OVER (ORDER BY d) AS next_d
  FROM merged
),
area AS (
  SELECT CAST(SUM(in_system * DATEDIFF('day', d, next_d)) AS BIGINT)
           AS area_days
  FROM sweep WHERE next_d IS NOT NULL
)
SELECT t.n_orders, t.t_days, t.w_sum_days, a.area_days,
       ROUND(CAST(t.w_sum_days AS DOUBLE) / t.n_orders, 6)
         AS avg_lead_days,
       ROUND(CAST(t.n_orders AS DOUBLE) / t.t_days, 6)
         AS arrival_rate_per_day,
       ROUND(CAST(a.area_days AS DOUBLE) / t.t_days, 6)
         AS avg_in_system,
       a.area_days = t.w_sum_days AS littles_law_exact
FROM tot t CROSS JOIN area a
"""


@register(
    "t_littles_law_check",
    oracle=_LITTLES_ORACLE,
    tags=("A1", "J1", "W2", "W3", "F2"),
)
def t_littles_law_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Little's law on the order-fulfilment pipeline: average
    work-in-progress L must equal arrival rate λ × average lead time W.
    The query computes L two INDEPENDENT ways — Σ(lead days) from the
    per-order spans, and the time integral of the in-system count from
    a +1/−1 sweepline — and proves them EQUAL as exact integers
    (Fubini: summing durations row-wise or time-slice-wise is the same
    double-counting), so `littles_law_exact` is a built-in proof that
    the sweepline/run-length machinery drops nothing.

    Scale design: per-order spans are one combinable max-receipt
    groupBy; the sweepline is run-length compressed (one row per
    DISTINCT event day, gap width from LEAD) so the prefix sum runs
    over the calendar-bounded delta table, never per-order rows; all
    areas are exact BIGINT day units."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    spans = (
        orders.filter(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1997-01-01")
        )
        .join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .groupBy(
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("arrive"),
        )
        .agg(F.max(F.col("l_shipdate").cast("date")).alias("depart"))
    )
    tot = spans.agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.datediff("depart", "arrive") + 1).cast("long").alias(
            "w_sum_days"
        ),
        (F.datediff(F.max("depart"), F.min("arrive")) + 1)
        .cast("long")
        .alias("t_days"),
    )
    deltas = (
        spans.groupBy(F.col("arrive").alias("d"))
        .agg(F.count(F.lit(1)).cast("long").alias("delta"))
        .unionAll(
            spans.groupBy(F.date_add("depart", 1).alias("d")).agg(
                (-F.count(F.lit(1))).cast("long").alias("delta")
            )
        )
    )
    merged = deltas.groupBy("d").agg(
        F.sum("delta").cast("long").alias("delta")
    )
    w_ord = Window.orderBy("d")
    sweep = merged.select(
        "d",
        F.sum("delta")
        .over(w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long")
        .alias("in_system"),
        F.lead("d").over(w_ord).alias("next_d"),
    )
    area = sweep.filter(F.col("next_d").isNotNull()).agg(
        F.sum(F.col("in_system") * F.datediff("next_d", "d"))
        .cast("long")
        .alias("area_days")
    )
    return tot.crossJoin(F.broadcast(area)).select(
        "n_orders",
        "t_days",
        "w_sum_days",
        "area_days",
        F.round(F.col("w_sum_days").cast("double") / F.col("n_orders"), 6)
        .alias("avg_lead_days"),
        F.round(F.col("n_orders").cast("double") / F.col("t_days"), 6)
        .alias("arrival_rate_per_day"),
        F.round(F.col("area_days").cast("double") / F.col("t_days"), 6)
        .alias("avg_in_system"),
        (F.col("area_days") == F.col("w_sum_days")).alias(
            "littles_law_exact"
        ),
    )


# ---------------------------------------------------------------------------
# Fano factor burstiness per event type (overdispersion vs Poisson)
# ---------------------------------------------------------------------------

_FANO_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
spine AS (
  SELECT CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days
  FROM events
),
stats AS (
  SELECT event_type,
         CAST(SUM(c) AS BIGINT) AS s,
         CAST(SUM(c * c) AS BIGINT) AS ss,
         CAST(COUNT(*) AS BIGINT) AS n_active_days
  FROM daily GROUP BY event_type
)
SELECT t.event_type, p.n_days, t.n_active_days, t.s AS n_events,
       ROUND(CAST(t.s AS DOUBLE) / p.n_days, 6) AS mean_per_day,
       ROUND((CAST(t.ss AS DOUBLE) - CAST(t.s AS DOUBLE) * t.s / p.n_days)
             / p.n_days
             / (CAST(t.s AS DOUBLE) / p.n_days), 6) AS fano_factor,
       (CAST(t.ss AS DOUBLE) - CAST(t.s AS DOUBLE) * t.s / p.n_days)
         / p.n_days
         > CAST(t.s AS DOUBLE) / p.n_days AS is_overdispersed
FROM stats t CROSS JOIN spine p
ORDER BY t.event_type
"""


@register(
    "t_burstiness_fano",
    oracle=_FANO_ORACLE,
    tags=("A1", "A2", "F2", "F3"),
)
def t_burstiness_fano(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fano factor (variance-to-mean of daily counts, zero days
    included) per event type — the burstiness diagnostic: ≈1 is
    Poisson, >1 is bursty (campaign spikes, bot storms), <1 is
    pacemaker-regular; it decides whether rate alerts can assume
    Poisson thresholds.

    Determinism + scale design: population variance over ALL calendar
    days comes from the zero-inclusive identity — Σc and Σc² over the
    ACTIVE days plus the global day count N (absent days add zero to
    both sums), so no grid densify is needed: ONE combinable
    (type, day) rollup, one 1-row day-count broadcast, exact integer
    sufficient statistics, one fixed-shape double formula per type."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.col("ts").cast("date").alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    spine = events.agg(
        F.countDistinct(F.col("ts").cast("date")).cast("long").alias(
            "n_days"
        )
    )
    stats = daily.groupBy("event_type").agg(
        F.sum("c").cast("long").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("ss"),
        F.count(F.lit(1)).cast("long").alias("n_active_days"),
    )
    return (
        stats.crossJoin(F.broadcast(spine))
        .select(
            "event_type",
            "n_days",
            "n_active_days",
            F.col("s").alias("n_events"),
            F.round(F.col("s").cast("double") / F.col("n_days"), 6).alias(
                "mean_per_day"
            ),
            F.expr(
                "ROUND((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n_days)"
                " / n_days / (CAST(s AS DOUBLE) / n_days), 6)"
            ).alias("fano_factor"),
            F.expr(
                "(CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n_days) "
                "/ n_days > CAST(s AS DOUBLE) / n_days"
            ).alias("is_overdispersed"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Record-breaking days vs the harmonic-number i.i.d. expectation
# ---------------------------------------------------------------------------

_RECORDS_ORACLE = f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(SUM({CENTS_SQL.format(expr="o_totalprice")}) AS BIGINT) AS x
  FROM orders
  WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
  GROUP BY 1
),
idx AS (
  SELECT x, ROW_NUMBER() OVER (ORDER BY d) AS i,
         MAX(x) OVER (ORDER BY d
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
  FROM daily
),
rec AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(SUM(CASE WHEN prev_max IS NULL OR x > prev_max
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_records
  FROM idx
),
harmonic AS (
  SELECT CAST(SUM(1000000 // i) AS BIGINT) AS h_micro
  FROM idx
)
SELECT r.n_days, r.n_records,
       ROUND(h.h_micro / 1000000.0, 6) AS expected_records_iid,
       ROUND(r.n_records / (h.h_micro / 1000000.0), 6)
         AS record_excess_ratio,
       r.n_records > 2 * h.h_micro / 1000000.0 AS trending_flag
FROM rec r CROSS JOIN harmonic h
"""


@register(
    "t_record_days_check",
    oracle=_RECORDS_ORACLE,
    tags=("W3", "W1", "A2", "F3"),
)
def t_record_days_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record-breaking-day count vs the i.i.d. expectation: under
    exchangeability the number of running-maximum records in n days is
    the harmonic number H_n ≈ ln n + γ (~6.4 for a year) — observing
    far more records is a distribution-free trend detector that needs
    NO variance estimate (the classic records test; pairs with
    Mann-Kendall, which counts all pairs rather than records).

    Determinism + scale design: records come from ONE window pass
    (prefix MAX up to the previous row) over the calendar-bounded daily
    rollup; H_n is computed as the exact integer Σ 10⁶ DIV i over the
    same ≤366-row spine (floor-division micro units — no float sum),
    and the two meet in one fixed-shape ratio on a 1-row frame."""
    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.filter(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1997-01-01")
        )
        .groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(F.sum(cents(F.col("o_totalprice"))).cast("long").alias("x"))
    )
    w = Window.orderBy("d")
    idx = daily.select(
        "x",
        F.row_number().over(w).alias("i"),
        F.max("x")
        .over(w.rowsBetween(Window.unboundedPreceding, -1))
        .alias("prev_max"),
    )
    rec = idx.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum(
            F.when(
                F.col("prev_max").isNull()
                | (F.col("x") > F.col("prev_max")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_records"),
    )
    harmonic = idx.agg(
        F.sum(F.expr("1000000 DIV i")).cast("long").alias("h_micro")
    )
    return rec.crossJoin(F.broadcast(harmonic)).select(
        "n_days",
        "n_records",
        F.round(F.col("h_micro") / 1000000.0, 6).alias(
            "expected_records_iid"
        ),
        F.round(
            F.col("n_records") / (F.col("h_micro") / 1000000.0), 6
        ).alias("record_excess_ratio"),
        (
            F.col("n_records") > 2 * F.col("h_micro") / 1000000.0
        ).alias("trending_flag"),
    )


# ---------------------------------------------------------------------------
# Interarrival burstiness (CV² of per-user gaps) — point-process level
# ---------------------------------------------------------------------------

_INTERARRIVAL_ORACLE = """
WITH gaps AS (
  SELECT user_id,
         EPOCH_US(ts) - EPOCH_US(LAG(ts) OVER (PARTITION BY user_id
                                               ORDER BY ts, event_id))
           AS gap_s
  FROM events
),
per_user AS (
  SELECT user_id,
         CAST(COUNT(*) AS BIGINT) AS n_gaps,
         CAST(SUM(gap_s) AS BIGINT) AS s,
         CAST(SUM(CAST(gap_s AS HUGEINT) * gap_s) AS HUGEINT) AS ss
  FROM gaps WHERE gap_s IS NOT NULL
  GROUP BY user_id HAVING COUNT(*) >= 5
),
cv2 AS (
  SELECT user_id, n_gaps,
         CAST(ROUND(
           ((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n_gaps) / n_gaps)
           / ((CAST(s AS DOUBLE) / n_gaps) * (CAST(s AS DOUBLE) / n_gaps))
           * 1000000) AS BIGINT) AS cv2_micro
  FROM per_user
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY cv2_micro) AS rn,
         COUNT(*) OVER () AS n
  FROM cv2
)
SELECT CAST(MAX(n) AS BIGINT) AS n_users,
       CAST(SUM(n_gaps) AS BIGINT) AS n_gaps_total,
       ROUND(MAX(CASE WHEN rn = (n + 1) // 2 THEN cv2_micro END)
             / 1000000.0, 6) AS median_cv2,
       ROUND(MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN cv2_micro END)
             / 1000000.0, 6) AS p90_cv2,
       CAST(SUM(CASE WHEN cv2_micro > 1000000 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bursty_users,
       CAST(SUM(CASE WHEN cv2_micro > 1000000 THEN 1 ELSE 0 END) * 1000000
            // MAX(n) AS BIGINT) AS bursty_share_ppm
FROM ranked
"""


@register(
    "t_interarrival_burstiness",
    oracle=_INTERARRIVAL_ORACLE,
    tags=("W2", "A1", "A8", "F2", "F3"),
)
def t_interarrival_burstiness(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Interarrival burstiness: squared coefficient of variation of
    per-user event gaps (CV² = var/mean² of interarrival times, exact
    integer microseconds — CV² is scale-free so the unit cancels) —
    the POINT-PROCESS burstiness measure (Barabási): CV² ≈ 1 is
    Poisson, ≫ 1 is bursty sessions-then-silence. Complements the
    daily-binned Fano factor, which cannot see sub-day structure.

    Determinism + scale design: gaps are one per-user LAG window (one
    user-keyed shuffle, total order (ts, event_id) so equal timestamps
    cannot flip); per-user CV² comes from exact integer gap sums
    (Σgap² widened to decimal — microseconds² overflows INT64
    immediately) and is micro-rounded at the leaf; the population quantiles
    are DISCRETE rank selections ((n+1) DIV 2 and ceil(0.9n) as
    (9n+9) DIV 10) because interpolated percentiles mix floats in an
    engine-specific order. Users with < 5 gaps are
    excluded (CV² is noise there) — identically on both engines."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = events.select(
        "user_id",
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.unix_micros(F.lag("ts").over(w).cast("timestamp"))
        ).alias("gap_s"),
    )

    def dec(c: F.Column) -> F.Column:
        return c.cast("decimal(38,0)")

    per_user = (
        gaps.filter(F.col("gap_s").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_gaps"),
            F.sum("gap_s").cast("long").alias("s"),
            F.sum(dec(F.col("gap_s")) * F.col("gap_s")).alias("ss"),
        )
        .filter(F.col("n_gaps") >= 5)
    )
    cv2 = per_user.select(
        "n_gaps",
        F.expr(
            "CAST(ROUND(((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s "
            "/ n_gaps) / n_gaps) / ((CAST(s AS DOUBLE) / n_gaps) "
            "* (CAST(s AS DOUBLE) / n_gaps)) * 1000000) AS BIGINT)"
        ).alias("cv2_micro"),
    )
    ranked = cv2.select(
        "*",
        F.row_number().over(Window.orderBy("cv2_micro")).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    return ranked.agg(
        F.max("n").cast("long").alias("n_users"),
        F.sum("n_gaps").cast("long").alias("n_gaps_total"),
        F.round(
            F.max(
                F.when(
                    F.expr("rn = (n + 1) DIV 2"), F.col("cv2_micro")
                )
            )
            / 1000000.0,
            6,
        ).alias("median_cv2"),
        F.round(
            F.max(
                F.when(
                    F.expr("rn = (9 * n + 9) DIV 10"), F.col("cv2_micro")
                )
            )
            / 1000000.0,
            6,
        ).alias("p90_cv2"),
        F.sum(F.when(F.col("cv2_micro") > 1000000, 1).otherwise(0))
        .cast("long")
        .alias("n_bursty_users"),
        F.expr(
            "SUM(CASE WHEN cv2_micro > 1000000 THEN 1 ELSE 0 END) "
            "* 1000000 DIV MAX(n)"
        )
        .cast("long")
        .alias("bursty_share_ppm"),
    )


# ---------------------------------------------------------------------------
# Permutation entropy: ordinal-pattern complexity of the daily series
# ---------------------------------------------------------------------------

_PERM_ENTROPY_ORACLE = f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(SUM({CENTS_SQL.format(expr="o_totalprice")}) AS BIGINT) AS x
  FROM orders
  WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
  GROUP BY 1
),
trip AS (
  SELECT x AS a,
         LEAD(x, 1) OVER (ORDER BY d) AS b,
         LEAD(x, 2) OVER (ORDER BY d) AS c
  FROM daily
),
pats AS (
  SELECT (CASE WHEN a < b THEN 1 ELSE 0 END)
       + (CASE WHEN b < c THEN 2 ELSE 0 END)
       + (CASE WHEN a < c THEN 4 ELSE 0 END) AS pattern_id
  FROM trip WHERE b IS NOT NULL AND c IS NOT NULL
),
counts AS (
  SELECT pattern_id, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM pats GROUP BY pattern_id
),
tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM counts),
terms AS (
  SELECT c.pattern_id, c.cnt, t.n,
         CAST(c.cnt * 1000000 // t.n AS BIGINT) AS share_ppm,
         CAST(ROUND(-(CAST(c.cnt AS DOUBLE) / t.n)
                    * LN(CAST(c.cnt AS DOUBLE) / t.n)
                    * 1000000000) AS BIGINT) AS h_nano
  FROM counts c CROSS JOIN tot t
),
ent AS (
  SELECT *, CAST(SUM(h_nano) OVER () AS BIGINT) AS h_total_nano
  FROM terms
)
SELECT CAST(pattern_id AS BIGINT) AS pattern_id, cnt, n AS n_triplets,
       share_ppm,
       ROUND(h_total_nano / 1000000000.0, 6) AS perm_entropy_nats,
       ROUND(h_total_nano / 1000000000.0 / LN(6.0), 6)
         AS perm_entropy_normalized
FROM ent
ORDER BY pattern_id
"""


@register(
    "t_permutation_entropy",
    oracle=_PERM_ENTROPY_ORACLE,
    tags=("W2", "A1", "F3", "F2"),
)
def t_permutation_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Permutation entropy (Bandt-Pompe): the Shannon entropy of
    order-3 ordinal patterns (up-up, up-down, ...) in the daily revenue
    series — a distribution-free complexity measure: near 1 (normalized)
    the series is noise-like, well below 1 it has exploitable ordinal
    structure; robust to monotone transforms, unlike spectral measures.
    The per-pattern share table doubles as an up/down-motif census.

    Determinism + scale design: triplets come from two LEAD windows
    over the ≤366-row calendar-bounded series; the ordinal pattern is
    pure integer CASE encoding ((a<b) + 2·(b<c) + 4·(a<c) — strict
    comparisons so exact-cent ties encode identically on both
    engines); entropy terms are nano-nat rounded per pattern before
    the ≤6-term sum (the JSD/KM leaf convention)."""
    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.filter(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1997-01-01")
        )
        .groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(F.sum(cents(F.col("o_totalprice"))).cast("long").alias("x"))
    )
    w = Window.orderBy("d")
    trip = daily.select(
        F.col("x").alias("a"),
        F.lead("x", 1).over(w).alias("b"),
        F.lead("x", 2).over(w).alias("c"),
    )
    pats = trip.filter(
        F.col("b").isNotNull() & F.col("c").isNotNull()
    ).select(
        (
            F.when(F.col("a") < F.col("b"), 1).otherwise(0)
            + F.when(F.col("b") < F.col("c"), 2).otherwise(0)
            + F.when(F.col("a") < F.col("c"), 4).otherwise(0)
        ).alias("pattern_id")
    )
    counts = pats.groupBy("pattern_id").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    tot = counts.agg(F.sum("cnt").cast("long").alias("n"))
    terms = counts.crossJoin(F.broadcast(tot)).select(
        "pattern_id",
        "cnt",
        "n",
        F.expr("cnt * 1000000 DIV n").cast("long").alias("share_ppm"),
        F.expr(
            "CAST(ROUND(-(CAST(cnt AS DOUBLE) / n) "
            "* LN(CAST(cnt AS DOUBLE) / n) * 1000000000) AS BIGINT)"
        ).alias("h_nano"),
    )
    ent = terms.withColumn(
        "h_total_nano",
        F.sum("h_nano").over(Window.partitionBy()).cast("long"),
    )
    return ent.select(
        F.col("pattern_id").cast("long").alias("pattern_id"),
        "cnt",
        F.col("n").alias("n_triplets"),
        "share_ppm",
        F.round(F.col("h_total_nano") / 1000000000.0, 6).alias(
            "perm_entropy_nats"
        ),
        F.expr(
            "ROUND(h_total_nano / 1000000000.0 / LN(6.0), 6)"
        ).alias("perm_entropy_normalized"),
    ).orderBy("pattern_id")


# ---------------------------------------------------------------------------
# Newey-West (HAC) standard error of the daily-revenue mean
# ---------------------------------------------------------------------------

_NEWEY_WEST_ORACLE = f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(SUM({CENTS_SQL.format(expr="o_totalprice")}) AS BIGINT) AS x
  FROM orders
  WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
  GROUP BY 1
),
idx AS (
  SELECT x, ROW_NUMBER() OVER (ORDER BY d) AS i FROM daily
),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS s
  FROM idx
),
lags AS (SELECT UNNEST(GENERATE_SERIES(0, 7)) AS l),
pairsums AS (
  SELECT lg.l,
         CAST(COUNT(*) AS BIGINT) AS n_pairs,
         CAST(SUM(CAST(a.x AS HUGEINT) * b.x) AS HUGEINT) AS sab,
         CAST(SUM(a.x) AS BIGINT) AS sa,
         CAST(SUM(b.x) AS BIGINT) AS sb
  FROM idx a
  CROSS JOIN lags lg
  JOIN idx b ON b.i = a.i + lg.l
  GROUP BY lg.l
),
gammas AS (
  SELECT p.l,
         (CAST(p.sab AS DOUBLE)
          - (CAST(m.s AS DOUBLE) / m.n) * (p.sa + p.sb)
          + p.n_pairs * (CAST(m.s AS DOUBLE) / m.n)
            * (CAST(m.s AS DOUBLE) / m.n)) / m.n AS gamma_l
  FROM pairsums p CROSS JOIN m
),
hac AS (
  SELECT SUM(CASE WHEN l = 0 THEN gamma_l
                  ELSE 2.0 * (1.0 - l / 8.0) * gamma_l END) AS lrv,
         MAX(CASE WHEN l = 0 THEN gamma_l END) AS gamma0
  FROM gammas
)
SELECT m.n AS n_days,
       ROUND(CAST(m.s AS DOUBLE) / m.n / 100, 6) AS mean_dollars,
       ROUND(SQRT(h.gamma0 / m.n) / 100, 6) AS iid_se_dollars,
       ROUND(SQRT(h.lrv / m.n) / 100, 6) AS hac_se_dollars,
       ROUND(SQRT(h.lrv / h.gamma0), 6) AS se_inflation,
       h.lrv > h.gamma0 AS positive_autocorrelation
FROM m CROSS JOIN hac h
"""


@register(
    "t_newey_west_se",
    oracle=_NEWEY_WEST_ORACLE,
    tags=("A1", "A2", "J7", "F3"),
)
def t_newey_west_se(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newey-West (HAC) standard error of mean daily revenue with
    Bartlett weights over lags 1..7 — the serially-robust SE that
    replaces the i.i.d. formula when days are autocorrelated (weekly
    seasonality makes them so; `t_acf_lags` measures it, this query
    prices it): the se_inflation column is how many times too narrow a
    naive confidence interval is. Lag covariances are assembled from
    EXACT integer pair sums (Σxₐx_b widened to decimal, Σxₐ, Σx_b per
    lag — the mean-expansion identity), so no order-sensitive float
    sum exists anywhere.

    Scale design: one combinable day rollup; lag covariances come from
    the calendar-bounded (≤366 × 8) shifted-index equi-join — the
    Mann-Kendall/CCF bounded-pairs posture; Bartlett weighting and the
    two SEs are fixed-shape doubles on 1-row frames."""
    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.filter(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1997-01-01")
        )
        .groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(F.sum(cents(F.col("o_totalprice"))).cast("long").alias("x"))
    )
    idx = daily.select(
        "x", F.row_number().over(Window.orderBy("d")).alias("i")
    )
    m = idx.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
    )
    lags = spark.range(0, 8).select(F.col("id").cast("int").alias("l"))
    a = idx.select(F.col("i").alias("ia"), F.col("x").alias("xa"))
    b = idx.select(F.col("i").alias("ib"), F.col("x").alias("xb"))
    pairsums = (
        a.crossJoin(F.broadcast(lags))
        .withColumn("ib", F.col("ia") + F.col("l"))
        .join(b, "ib")
        .groupBy("l")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum(F.col("xa").cast("decimal(38,0)") * F.col("xb")).alias(
                "sab"
            ),
            F.sum("xa").cast("long").alias("sa"),
            F.sum("xb").cast("long").alias("sb"),
        )
    )
    gammas = pairsums.crossJoin(F.broadcast(m)).select(
        "l",
        F.expr(
            "(CAST(sab AS DOUBLE) "
            "- (CAST(s AS DOUBLE) / n) * (sa + sb) "
            "+ n_pairs * (CAST(s AS DOUBLE) / n) "
            "* (CAST(s AS DOUBLE) / n)) / n"
        ).alias("gamma_l"),
    )
    hac = gammas.agg(
        F.sum(
            F.when(F.col("l") == 0, F.col("gamma_l")).otherwise(
                2.0 * (1.0 - F.col("l") / 8.0) * F.col("gamma_l")
            )
        ).alias("lrv"),
        F.max(F.when(F.col("l") == 0, F.col("gamma_l"))).alias("gamma0"),
    )
    return m.crossJoin(F.broadcast(hac)).select(
        F.col("n").alias("n_days"),
        F.round(F.col("s").cast("double") / F.col("n") / 100, 6).alias(
            "mean_dollars"
        ),
        F.round(F.sqrt(F.col("gamma0") / F.col("n")) / 100, 6).alias(
            "iid_se_dollars"
        ),
        F.round(F.sqrt(F.col("lrv") / F.col("n")) / 100, 6).alias(
            "hac_se_dollars"
        ),
        F.round(F.sqrt(F.col("lrv") / F.col("gamma0")), 6).alias(
            "se_inflation"
        ),
        (F.col("lrv") > F.col("gamma0")).alias("positive_autocorrelation"),
    )


# ---------------------------------------------------------------------------
# Erlang C staffing grid from measured arrival rate and service time
# ---------------------------------------------------------------------------

_ERLANG_ORACLE = """
WITH spans AS (
  SELECT o.o_orderkey,
         CAST(o.o_orderdate AS DATE) AS arrive,
         MAX(CAST(l.l_shipdate AS DATE)) AS depart
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  WHERE o.o_orderdate >= DATE '1996-01-01'
    AND o.o_orderdate < DATE '1997-01-01'
  GROUP BY 1, 2
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(DATEDIFF('day', arrive, depart) + 1) AS BIGINT)
           AS w_sum_days,
         CAST(DATEDIFF('day', MIN(arrive), MAX(depart)) + 1 AS BIGINT)
           AS t_days
  FROM tot_src
), tot_src AS (SELECT * FROM spans),
load0 AS (
  SELECT n_orders, t_days,
         CAST(w_sum_days AS DOUBLE) / t_days AS a_total
  FROM tot
),
load AS (
  SELECT n_orders, t_days, a_total,
         CAST(CEIL(a_total / 20.0) AS BIGINT) AS n_pods,
         a_total / CEIL(a_total / 20.0) AS a
  FROM load0
),
ks AS (SELECT UNNEST(GENERATE_SERIES(0, 60)) AS k),
lnterms AS (
  SELECT k.k, l.a,
         CAST(ROUND((k.k * LN(l.a)
                     - SUM(CASE WHEN i.k2 = 0 THEN 0.0
                                ELSE LN(CAST(i.k2 AS DOUBLE)) END))
                    * 1000000) AS BIGINT) AS ln_term_micro
  FROM ks k
  CROSS JOIN load l
  JOIN (SELECT UNNEST(GENERATE_SERIES(0, 60)) AS k2) i ON i.k2 <= k.k
  GROUP BY k.k, l.a
),
terms AS (
  SELECT k, EXP(ln_term_micro / 1000000.0) AS term,
         SUM(EXP(ln_term_micro / 1000000.0))
           OVER (ORDER BY k
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS cum_below
  FROM lnterms
),
grid AS (
  SELECT t.k AS c, t.term, COALESCE(t.cum_below, 0.0) AS s_below,
         l.a, l.a_total, l.n_pods, l.n_orders
  FROM terms t CROSS JOIN load l
  WHERE t.k > l.a AND t.k <= l.a + 10
),
ec AS (
  SELECT c, a, a_total, n_pods, n_orders,
         (term * c / (c - a)) / (s_below + term * c / (c - a)) AS p_wait
  FROM grid
)
SELECT CAST(c AS BIGINT) AS n_servers_per_pod,
       n_orders, n_pods,
       ROUND(a_total, 6) AS offered_load_total_erlangs,
       ROUND(a, 6) AS offered_load_per_pod,
       CAST(ROUND(a / c * 1000000) AS BIGINT) AS utilization_ppm,
       ROUND(p_wait, 6) AS p_wait_erlang_c,
       ROUND(p_wait / (c - a), 6) AS avg_wait_days,
       p_wait < 0.2 AS meets_80pct_no_wait
FROM ec
ORDER BY n_servers_per_pod
"""


@register(
    "t_erlang_c_staffing",
    oracle=_ERLANG_ORACLE,
    tags=("A1", "J1", "W3", "F3", "J9"),
)
def t_erlang_c_staffing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Erlang C staffing grid: with the arrival rate and mean service
    time MEASURED from the fulfilment pipeline (the same spans behind
    `t_littles_law_check` — offered load a = λ·W erlangs), the
    probability an arriving order must queue, P_wait(c), for each
    per-pod server count c in (⌈a⌉ .. a+10] — the queueing capstone
    that turns
    Little's law bookkeeping into a staffing decision (first c with
    P_wait < 0.2 is the 80%-no-wait staffing level; avg_wait is
    Erlang C's Wq up to the service-time unit). The measured load is
    SHARDED into ≤20-erlang pods first (n_pods = ⌈a/20⌉) — capacity
    planning practice, and what keeps the k-spine a CONSTANT 61 rows
    at any data scale (the raw offered load grows with SF).

    Determinism + scale design: the only data-sized work is the span
    rollup; the Erlang terms aᵏ/k! are built in LOG space on a 61-row
    k-spine (ln term = k·ln a − Σ ln i, micro-nat rounded at the leaf)
    and summed with an ORDER BY k cumulative window — a fixed
    summation order on a bounded spine, so the float prefix sum is
    identical on both engines; the factorial join is the bounded
    triangle i ≤ k."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    spans = (
        orders.filter(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1997-01-01")
        )
        .join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .groupBy(
            "o_orderkey", F.col("o_orderdate").cast("date").alias("arrive")
        )
        .agg(F.max(F.col("l_shipdate").cast("date")).alias("depart"))
    )
    load = spans.agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        (
            F.sum(F.datediff("depart", "arrive") + 1).cast("double")
            / (F.datediff(F.max("depart"), F.min("arrive")) + 1)
        ).alias("a_total"),
        (F.datediff(F.max("depart"), F.min("arrive")) + 1)
        .cast("long")
        .alias("t_days"),
    ).select(
        "n_orders",
        "t_days",
        "a_total",
        F.expr("CAST(CEIL(a_total / 20.0) AS BIGINT)").alias("n_pods"),
        F.expr("a_total / CEIL(a_total / 20.0)").alias("a"),
    )
    ks = spark.range(0, 61).select(F.col("id").cast("int").alias("k"))
    i_spine = spark.range(0, 61).select(F.col("id").cast("int").alias("k2"))
    lnterms = (
        ks.crossJoin(F.broadcast(i_spine))
        .filter(F.col("k2") <= F.col("k"))
        .crossJoin(F.broadcast(load))
        .groupBy("k", "a")
        .agg(
            F.expr(
                "CAST(ROUND((k * LN(a) "
                "- SUM(CASE WHEN k2 = 0 THEN 0.0 "
                "ELSE LN(CAST(k2 AS DOUBLE)) END)) * 1000000) AS BIGINT)"
            ).alias("ln_term_micro")
        )
    )
    w_below = Window.orderBy("k").rowsBetween(
        Window.unboundedPreceding, -1
    )
    terms = lnterms.select(
        "k",
        F.expr("EXP(ln_term_micro / 1000000.0)").alias("term"),
        F.sum(F.expr("EXP(ln_term_micro / 1000000.0)"))
        .over(w_below)
        .alias("cum_below"),
    )
    grid = (
        terms.crossJoin(F.broadcast(load))
        .filter(
            (F.col("k") > F.col("a")) & (F.col("k") <= F.col("a") + 10)
        )
        .select(
            F.col("k").alias("c"),
            "term",
            F.coalesce("cum_below", F.lit(0.0)).alias("s_below"),
            "a",
            "a_total",
            "n_pods",
            "n_orders",
        )
    )
    ec = grid.select(
        "c",
        "a",
        "a_total",
        "n_pods",
        "n_orders",
        F.expr(
            "(term * c / (c - a)) / (s_below + term * c / (c - a))"
        ).alias("p_wait"),
    )
    return ec.select(
        F.col("c").cast("long").alias("n_servers_per_pod"),
        "n_orders",
        "n_pods",
        F.round(F.col("a_total"), 6).alias("offered_load_total_erlangs"),
        F.round(F.col("a"), 6).alias("offered_load_per_pod"),
        F.expr("CAST(ROUND(a / c * 1000000) AS BIGINT)").alias(
            "utilization_ppm"
        ),
        F.round(F.col("p_wait"), 6).alias("p_wait_erlang_c"),
        F.round(F.col("p_wait") / (F.col("c") - F.col("a")), 6).alias(
            "avg_wait_days"
        ),
        (F.col("p_wait") < 0.2).alias("meets_80pct_no_wait"),
    ).orderBy("n_servers_per_pod")


# ---------------------------------------------------------------------------
# Seasonal-naive prediction intervals with measured coverage
# ---------------------------------------------------------------------------

_FORECAST_PI_ORACLE = f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(SUM({CENTS_SQL.format(expr="o_totalprice")}) AS BIGINT) AS x
  FROM orders
  WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
  GROUP BY 1
),
idx AS (
  SELECT x, ROW_NUMBER() OVER (ORDER BY d) AS i,
         COUNT(*) OVER () AS n
  FROM daily
),
paired AS (
  SELECT a.i, a.x AS actual, b.x AS forecast,
         a.x - b.x AS resid, a.n
  FROM idx a JOIN idx b ON b.i = a.i - 7
),
train AS (SELECT * FROM paired WHERE i <= n - 56),
ranked AS (
  SELECT resid, ROW_NUMBER() OVER (ORDER BY resid) AS rn,
         COUNT(*) OVER () AS m
  FROM train
),
quants AS (
  SELECT MAX(CASE WHEN rn = (m + 9) // 10 THEN resid END) AS r10,
         MAX(CASE WHEN rn = (9 * m + 9) // 10 THEN resid END) AS r90
  FROM ranked
),
test AS (SELECT * FROM paired WHERE i > n - 56),
covered AS (
  SELECT t.actual, t.forecast, q.r10, q.r90,
         CASE WHEN t.actual >= t.forecast + q.r10
               AND t.actual <= t.forecast + q.r90
              THEN 1 ELSE 0 END AS hit
  FROM test t CROSS JOIN quants q
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_test_days,
       CAST(MAX(r10) AS BIGINT) AS resid_p10_cents,
       CAST(MAX(r90) AS BIGINT) AS resid_p90_cents,
       CAST(SUM(hit) AS BIGINT) AS n_within_interval,
       CAST(SUM(hit) * 1000000 // COUNT(*) AS BIGINT) AS coverage_ppm,
       ABS(CAST(SUM(hit) * 1000000 // COUNT(*) AS BIGINT) - 800000)
         < 200000 AS coverage_near_nominal
FROM covered
"""


@register(
    "t_forecast_prediction_intervals",
    oracle=_FORECAST_PI_ORACLE,
    tags=("W2", "W1", "A1", "A8", "J7"),
)
def t_forecast_prediction_intervals(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Prediction-interval CALIBRATION for the seasonal-naive
    forecaster: the 80% interval is forecast + [p10, p90] of TRAINING
    residuals, and the query measures its EMPIRICAL coverage on a held
    out 8-week tail — the check that separates a usable forecast band
    from a decorative one (`e_snaive_forecast_backtest` scores point
    accuracy; `t_pinball_loss_eval` scores quantile loss; this closes
    the loop by verifying the band contains reality at its nominal
    rate).

    Determinism + scale design: the seasonal-naive pairing is the
    bounded 7-day shifted-index self-join; residual quantiles are
    DISCRETE rank selections ((m+9) DIV 10, (9m+9) DIV 10 — the
    interarrival-CV² convention, no interpolation floats); coverage is
    exact integer ppm over the fixed 56-day holdout."""
    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.filter(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1997-01-01")
        )
        .groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(F.sum(cents(F.col("o_totalprice"))).cast("long").alias("x"))
    )
    idx = daily.select(
        "x",
        F.row_number().over(Window.orderBy("d")).alias("i"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    a = idx.select("i", F.col("x").alias("actual"), "n")
    b = idx.select(
        (F.col("i") + 7).alias("i"), F.col("x").alias("forecast")
    )
    paired = a.join(b, "i").select(
        "i",
        "actual",
        "forecast",
        (F.col("actual") - F.col("forecast")).alias("resid"),
        "n",
    )
    train = paired.filter(F.col("i") <= F.col("n") - 56)
    ranked = train.select(
        "resid",
        F.row_number().over(Window.orderBy("resid")).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("m"),
    )
    quants = ranked.agg(
        F.max(
            F.when(F.expr("rn = (m + 9) DIV 10"), F.col("resid"))
        ).alias("r10"),
        F.max(
            F.when(F.expr("rn = (9 * m + 9) DIV 10"), F.col("resid"))
        ).alias("r90"),
    )
    test = paired.filter(F.col("i") > F.col("n") - 56)
    covered = test.crossJoin(F.broadcast(quants)).select(
        "r10",
        "r90",
        F.when(
            (F.col("actual") >= F.col("forecast") + F.col("r10"))
            & (F.col("actual") <= F.col("forecast") + F.col("r90")),
            1,
        )
        .otherwise(0)
        .alias("hit"),
    )
    return covered.agg(
        F.count(F.lit(1)).cast("long").alias("n_test_days"),
        F.max("r10").cast("long").alias("resid_p10_cents"),
        F.max("r90").cast("long").alias("resid_p90_cents"),
        F.sum("hit").cast("long").alias("n_within_interval"),
        F.expr("SUM(hit) * 1000000 DIV COUNT(*)")
        .cast("long")
        .alias("coverage_ppm"),
        F.expr(
            "ABS(SUM(hit) * 1000000 DIV COUNT(*) - 800000) < 200000"
        ).alias("coverage_near_nominal"),
    )


# ---------------------------------------------------------------------------
# Lo-MacKinlay variance-ratio test: is the revenue path a random walk?
# ---------------------------------------------------------------------------

_VR_ORACLE = f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(SUM({CENTS_SQL.format(expr="o_totalprice")}) AS BIGINT) AS x
  FROM orders
  WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
  GROUP BY 1
),
idx AS (
  SELECT x, ROW_NUMBER() OVER (ORDER BY d) AS i FROM daily
),
qs AS (SELECT UNNEST([1, 2, 5, 10]) AS q),
diffs AS (
  SELECT qd.q, a.i,
         a.x - b.x AS dq
  FROM idx a
  CROSS JOIN qs qd
  JOIN idx b ON b.i = a.i - qd.q
),
stats AS (
  SELECT q,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(dq) AS BIGINT) AS s,
         CAST(SUM(CAST(dq AS HUGEINT) * dq) AS HUGEINT) AS ss
  FROM diffs GROUP BY q
),
vars AS (
  SELECT q, n,
         (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / n / q AS v_q
  FROM stats
),
base AS (SELECT v_q AS v1 FROM vars WHERE q = 1)
SELECT CAST(v.q AS BIGINT) AS period_q,
       v.n AS n_diffs,
       ROUND(v.v_q / 10000.0, 6) AS scaled_var_dollars2,
       ROUND(v.v_q / b.v1, 6) AS variance_ratio,
       v.v_q / b.v1 < 1.0 AS mean_reverting_at_q
FROM vars v CROSS JOIN base b
ORDER BY period_q
"""


@register(
    "t_variance_ratio_test",
    oracle=_VR_ORACLE,
    tags=("A1", "J7", "W1", "F3"),
)
def t_variance_ratio_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lo-MacKinlay variance ratio: under a random walk the variance of
    q-day changes grows LINEARLY in q, so VR(q) = Var(Δ_q)/(q·Var(Δ₁))
    is 1; VR < 1 is mean reversion (shocks die out — revenue snaps
    back after spikes), VR > 1 is momentum. Read with the Hurst
    exponent (VR ≈ q^(2H−1) asymptotically) — two independent
    diagnoses of the same long-memory question.

    Determinism + scale design: q-day differences come from the
    bounded shifted-index self-join against a 4-row q dim (the
    CCF/Newey-West posture); each variance derives from exact integer
    Σd, Σd² (widened before multiply — daily-cents differences square
    past INT64); the ratios are fixed-shape doubles over the 4-row
    frame."""
    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.filter(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1997-01-01")
        )
        .groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(F.sum(cents(F.col("o_totalprice"))).cast("long").alias("x"))
    )
    idx = daily.select(
        "x", F.row_number().over(Window.orderBy("d")).alias("i")
    )
    qs = spark.createDataFrame([(1,), (2,), (5,), (10,)], ["q"])
    a = idx.select("i", F.col("x").alias("xa"))
    b = idx.select(F.col("i").alias("ib"), F.col("x").alias("xb"))
    diffs = (
        a.crossJoin(F.broadcast(qs))
        .withColumn("ib", F.col("i") - F.col("q"))
        .join(b, "ib")
        .select("q", (F.col("xa") - F.col("xb")).alias("dq"))
    )
    stats = diffs.groupBy("q").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("dq").cast("long").alias("s"),
        F.sum(F.col("dq").cast("decimal(38,0)") * F.col("dq")).alias("ss"),
    )
    vars_ = stats.select(
        "q",
        "n",
        F.expr(
            "(CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / n / q"
        ).alias("v_q"),
    )
    base = vars_.filter(F.col("q") == 1).select(
        F.col("v_q").alias("v1")
    )
    return (
        vars_.crossJoin(F.broadcast(base))
        .select(
            F.col("q").cast("long").alias("period_q"),
            F.col("n").alias("n_diffs"),
            F.round(F.col("v_q") / 10000.0, 6).alias(
                "scaled_var_dollars2"
            ),
            F.round(F.col("v_q") / F.col("v1"), 6).alias(
                "variance_ratio"
            ),
            (F.col("v_q") / F.col("v1") < 1.0).alias(
                "mean_reverting_at_q"
            ),
        )
        .orderBy("period_q")
    )


