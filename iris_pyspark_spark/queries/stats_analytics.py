"""Statistical / scientific analytics operators (engine-added, round 4):
association rules, robust outliers, autocorrelation, Welch's t-test,
degree assortativity, CUSUM changepoint detection.

Shared scale discipline (SURVEY.md §2.12): every float statistic is
computed FROM exact-integer sufficient statistics (counts, cents sums,
cents sums-of-squares as BIGINT) aggregated with combinable SUM/COUNT —
map-side partial aggregation applies, partition layout cannot change a
bit. The float formula is then evaluated once per output row with an
identical expression tree in Spark and DuckDB (IEEE doubles: same
operands + same operation order = same bits; sqrt is correctly rounded
by spec), and rounded to 6 decimals on both sides.

Series-shaped queries (ACF, CUSUM) operate on the per-day rollup whose
cardinality is bounded by the CALENDAR, not by data volume — the window
over it is O(days), safe at 100 TB because the heavy pass below it is
one combinable groupBy(day).
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
# Association rules (market-basket lift) over order baskets
# ---------------------------------------------------------------------------

_BASKET_ORACLE = """
WITH item_orders AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
freq AS (
  SELECT l_partkey, COUNT(*) AS n_item
  FROM item_orders GROUP BY l_partkey HAVING COUNT(*) >= 8
),
n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM lineitem),
pairs AS (
  SELECT a.l_partkey AS item_a, b.l_partkey AS item_b, COUNT(*) AS n_ab
  FROM item_orders a JOIN item_orders b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_partkey < b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey HAVING COUNT(*) >= 2
)
SELECT item_a, item_b, n_ab, fa.n_item AS n_a, fb.n_item AS n_b,
       n.n_orders AS n_orders,
       CAST(n_ab * n.n_orders * 1000000 // (fa.n_item * fb.n_item) AS BIGINT)
         AS lift_ppm,
       CAST(n_ab * 1000000 // fa.n_item AS BIGINT) AS conf_a_to_b_ppm
FROM pairs
JOIN freq fa ON pairs.item_a = fa.l_partkey
JOIN freq fb ON pairs.item_b = fb.l_partkey
CROSS JOIN n
ORDER BY lift_ppm DESC, item_a, item_b
LIMIT 20
"""


@register(
    "a_market_basket_lift",
    oracle=_BASKET_ORACLE,
    tags=("J10", "J1", "A1", "O2", "A6"),
)
def a_market_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over order baskets: top-20 part pairs by lift,
    with support counts and A→B confidence in exact integer ppm.

    Scale design — the apriori pruning order matters more than the
    algebra: (1) project lineitem to DISTINCT (order, item) once;
    (2) filter to FREQUENT items (support >= 8 orders) BEFORE the pair
    join, the classic apriori downward-closure cut that removes the
    long tail of rare items; (3) the pair generation is an orderkey
    equi-join whose fan-out is bounded by lines-per-order (a data-model
    constant), never an item×item cross; (4) lift/confidence are exact
    BIGINT ppm (floor division), so no float leaves the engine and the
    oracle hash is bit-stable. The lift ordering ties break on the pair
    keys, making LIMIT deterministic.
    """
    li = load_table(spark, sf_dir, "lineitem")
    item_orders = li.select("l_orderkey", "l_partkey").dropDuplicates()
    freq = (
        item_orders.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n_item"))
        .filter(F.col("n_item") >= 8)
    )
    n_orders = li.agg(
        F.countDistinct("l_orderkey").alias("n_orders")
    )
    a = item_orders.alias("a")
    b = item_orders.alias("b")
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .groupBy(
            F.col("a.l_partkey").alias("item_a"),
            F.col("b.l_partkey").alias("item_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= 2)
    )
    fa = freq.select(
        F.col("l_partkey").alias("item_a"), F.col("n_item").alias("n_a")
    )
    fb = freq.select(
        F.col("l_partkey").alias("item_b"), F.col("n_item").alias("n_b")
    )
    return (
        pairs.join(fa, "item_a")
        .join(fb, "item_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "item_a",
            "item_b",
            "n_ab",
            "n_a",
            "n_b",
            "n_orders",
            F.expr(
                "CAST(n_ab * n_orders * 1000000 DIV (n_a * n_b) AS BIGINT)"
            ).alias("lift_ppm"),
            F.expr("CAST(n_ab * 1000000 DIV n_a AS BIGINT)").alias(
                "conf_a_to_b_ppm"
            ),
        )
        .orderBy(F.col("lift_ppm").desc(), "item_a", "item_b")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Robust outliers via median absolute deviation
# ---------------------------------------------------------------------------

_MAD_ORACLE = f"""
WITH bal AS (
  SELECT c_mktsegment, {CENTS_SQL.format(expr="c_acctbal")} AS bal_cents
  FROM customer
),
med AS (
  SELECT c_mktsegment, quantile_cont(bal_cents, 0.5) AS med_cents
  FROM bal GROUP BY c_mktsegment
),
dev AS (
  SELECT b.c_mktsegment, b.bal_cents, m.med_cents,
         ABS(b.bal_cents - m.med_cents) AS abs_dev
  FROM bal b JOIN med m ON b.c_mktsegment = m.c_mktsegment
),
mad AS (
  SELECT c_mktsegment, quantile_cont(abs_dev, 0.5) AS mad_cents
  FROM dev GROUP BY c_mktsegment
)
SELECT d.c_mktsegment,
       COUNT(*) AS n_customers,
       ROUND(MAX(d.med_cents) / 100.0, 6) AS median_bal,
       ROUND(MAX(a.mad_cents) / 100.0, 6) AS mad_bal,
       CAST(SUM(CASE WHEN d.abs_dev > 3 * 1.4826 * a.mad_cents
                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       ROUND(MAX(d.abs_dev / (1.4826 * a.mad_cents)), 6) AS max_robust_z
FROM dev d JOIN mad a ON d.c_mktsegment = a.c_mktsegment
GROUP BY d.c_mktsegment
ORDER BY d.c_mktsegment
"""


@register("a_mad_outliers", oracle=_MAD_ORACLE, tags=("A8", "A1", "J2", "P6"))
def a_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier report per market segment: median balance, median
    absolute deviation, and the count of |x − med| > 3·1.4826·MAD
    outliers (the classic robust-z rule that, unlike mean/stddev, is not
    dragged by the outliers it hunts).

    Determinism: balances become exact integer cents first; `percentile`
    (Spark) and `quantile_cont` (DuckDB) both compute the exact
    linear-interpolated order statistic, which on integers yields exact
    .0/.5 doubles — bit-equal across engines. The robust-z constant
    multiplies exact values with one fixed expression shape.

    Scale: two grouped EXACT medians means two sorts of the fact — the
    honest cost of an exact answer (the sketch path for 100 TB is
    `a_approx_percentile`). The per-segment median/MAD tables are 5 rows
    and broadcast back onto the fact, so the joins add no shuffle.
    """
    c = load_table(spark, sf_dir, "customer")
    bal = c.select(
        "c_mktsegment", cents(F.col("c_acctbal")).alias("bal_cents")
    )
    med = bal.groupBy("c_mktsegment").agg(
        F.expr("percentile(bal_cents, 0.5)").alias("med_cents")
    )
    dev = bal.join(F.broadcast(med), "c_mktsegment").select(
        "c_mktsegment",
        "bal_cents",
        "med_cents",
        F.abs(F.col("bal_cents") - F.col("med_cents")).alias("abs_dev"),
    )
    mad = dev.groupBy("c_mktsegment").agg(
        F.expr("percentile(abs_dev, 0.5)").alias("mad_cents")
    )
    return (
        dev.join(F.broadcast(mad), "c_mktsegment")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.max("med_cents") / 100.0, 6).alias("median_bal"),
            F.round(F.max("mad_cents") / 100.0, 6).alias("mad_bal"),
            F.sum(
                F.when(
                    F.col("abs_dev") > 3 * 1.4826 * F.col("mad_cents"), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
            F.round(
                F.max(F.col("abs_dev") / (1.4826 * F.col("mad_cents"))), 6
            ).alias("max_robust_z"),
        )
        .orderBy("c_mktsegment")
    )


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
# Welch's t-test on per-user spend between hash-assigned arms
# ---------------------------------------------------------------------------

_WELCH_ORACLE = f"""
WITH per_user AS (
  SELECT user_id,
         CASE WHEN (user_id * 48271) % 100 < 50 THEN 'A' ELSE 'B' END AS arm,
         SUM({CENTS_SQL.format(expr="value")}) AS spend_cents
  FROM events GROUP BY user_id
),
arms AS (
  SELECT arm, COUNT(*) AS n, SUM(spend_cents) AS s,
         SUM(spend_cents * spend_cents) AS ss
  FROM per_user GROUP BY arm
),
wide AS (
  SELECT
    MAX(CASE WHEN arm = 'A' THEN n END) AS n1,
    MAX(CASE WHEN arm = 'A' THEN s END) AS s1,
    MAX(CASE WHEN arm = 'A' THEN ss END) AS ss1,
    MAX(CASE WHEN arm = 'B' THEN n END) AS n2,
    MAX(CASE WHEN arm = 'B' THEN s END) AS s2,
    MAX(CASE WHEN arm = 'B' THEN ss END) AS ss2
  FROM arms
),
calc AS (
  SELECT n1, n2,
         CAST(s1 AS DOUBLE) / n1 AS m1,
         CAST(s2 AS DOUBLE) / n2 AS m2,
         (ss1 - CAST(s1 AS DOUBLE) * s1 / n1) / (n1 - 1) AS v1,
         (ss2 - CAST(s2 AS DOUBLE) * s2 / n2) / (n2 - 1) AS v2
  FROM wide
)
SELECT n1, n2,
       ROUND(m1 / 100, 6) AS mean_a,
       ROUND(m2 / 100, 6) AS mean_b,
       ROUND((m1 - m2) / SQRT(v1 / n1 + v2 / n2), 6) AS t_stat,
       ROUND((v1 / n1 + v2 / n2) * (v1 / n1 + v2 / n2) /
             ((v1 / n1) * (v1 / n1) / (n1 - 1) +
              (v2 / n2) * (v2 / n2) / (n2 - 1)),
             6) AS welch_df
FROM calc
"""


@register(
    "e_welch_ttest", oracle=_WELCH_ORACLE, tags=("A1", "A2", "A7", "P6")
)
def e_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test on per-user total spend between
    two hash-assigned experiment arms, with the Welch–Satterthwaite
    degrees of freedom. The statistically correct A/B readout for a
    continuous metric (complements `e_ab_test_lift`'s conversion-rate
    readout): the randomization unit is the USER, so the metric is
    aggregated per user before any arm statistics.

    Scale: one user-keyed combinable aggregation (the only shuffle of
    the fact), then a 2-row arm rollup pivoted into one row. All
    sufficient statistics (n, Σx, Σx²) are exact BIGINTs in cents —
    partition-order free; Welch's formula then runs once on the 1-row
    frame with an identical expression tree on both engines (squares
    are written as explicit multiplication, never libm POW, so the
    result is bit-identical by IEEE semantics).
    """
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.sum(cents(F.col("value"))).alias("spend_cents")
    ).withColumn(
        "arm",
        F.when((F.col("user_id") * 48271) % 100 < 50, "A").otherwise("B"),
    )
    arms = per_user.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("spend_cents").alias("s"),
        F.sum(F.col("spend_cents") * F.col("spend_cents")).alias("ss"),
    )
    wide = arms.agg(
        F.max(F.when(F.col("arm") == "A", F.col("n"))).alias("n1"),
        F.max(F.when(F.col("arm") == "A", F.col("s"))).alias("s1"),
        F.max(F.when(F.col("arm") == "A", F.col("ss"))).alias("ss1"),
        F.max(F.when(F.col("arm") == "B", F.col("n"))).alias("n2"),
        F.max(F.when(F.col("arm") == "B", F.col("s"))).alias("s2"),
        F.max(F.when(F.col("arm") == "B", F.col("ss"))).alias("ss2"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    m1 = F.col("s1").cast("double") / n1
    m2 = F.col("s2").cast("double") / n2
    v1 = (F.col("ss1") - F.col("s1").cast("double") * F.col("s1") / n1) / (
        n1 - 1
    )
    v2 = (F.col("ss2") - F.col("s2").cast("double") * F.col("s2") / n2) / (
        n2 - 1
    )
    se2 = v1 / n1 + v2 / n2
    return wide.select(
        "n1",
        "n2",
        F.round(m1 / 100, 6).alias("mean_a"),
        F.round(m2 / 100, 6).alias("mean_b"),
        F.round((m1 - m2) / F.sqrt(se2), 6).alias("t_stat"),
        F.round(
            se2 * se2
            / (
                (v1 / n1) * (v1 / n1) / (n1 - 1)
                + (v2 / n2) * (v2 / n2) / (n2 - 1)
            ),
            6,
        ).alias("welch_df"),
    )


# ---------------------------------------------------------------------------
# Degree assortativity of the part co-order graph
# ---------------------------------------------------------------------------

_ASSORT_ORACLE = """
WITH pairs AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_partkey < b.l_partkey
),
deg AS (
  SELECT node, COUNT(*) AS d
  FROM (SELECT u AS node FROM pairs UNION ALL SELECT v AS node FROM pairs)
  GROUP BY node
),
directed AS (
  SELECT du.d AS dx, dv.d AS dy
  FROM pairs p JOIN deg du ON p.u = du.node JOIN deg dv ON p.v = dv.node
  UNION ALL
  SELECT dv.d AS dx, du.d AS dy
  FROM pairs p JOIN deg du ON p.u = du.node JOIN deg dv ON p.v = dv.node
),
stats AS (
  SELECT COUNT(*) AS m, SUM(dx) AS sx, SUM(dx * dy) AS sxy,
         SUM(dx * dx) AS sxx
  FROM directed
)
SELECT CAST(m / 2 AS BIGINT) AS n_edges,
       (SELECT COUNT(*) FROM deg) AS n_nodes,
       ROUND((m * sxy - sx * sx) /
             CAST(m * sxx - sx * sx AS DOUBLE), 6) AS assortativity
FROM stats
"""


@register(
    "g_degree_assortativity",
    oracle=_ASSORT_ORACLE,
    tags=("J10", "J1", "A2", "A1"),
)
def g_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity coefficient (Newman 2002) of the part
    co-order graph: the Pearson correlation of endpoint degrees over
    all directed edges — do high-degree parts co-occur with other
    high-degree parts (r > 0) or with the long tail (r < 0)?

    Scale: edge construction is the bounded orderkey self-join (fan-out
    capped by lines-per-order); degrees are one combinable count; the
    two degree lookups are key equi-joins. Because the directed edge
    list is symmetric, Σdx = Σdy and Σdx² = Σdy², so ONE pass of
    integer sufficient statistics feeds the correlation — no float
    accumulates across rows, and the single double division happens on
    the final 1-row frame identically in both engines.
    """
    li = load_table(spark, sf_dir, "lineitem")
    io = li.select("l_orderkey", "l_partkey").dropDuplicates()
    a, b = io.alias("a"), io.alias("b")
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v")
        )
        .dropDuplicates()
    )
    deg = (
        pairs.select(F.col("u").alias("node"))
        .unionAll(pairs.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("d_u"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("d_v"))
    annotated = pairs.join(du, "u").join(dv, "v")
    directed = annotated.select(
        F.col("d_u").alias("dx"), F.col("d_v").alias("dy")
    ).unionAll(
        annotated.select(F.col("d_v").alias("dx"), F.col("d_u").alias("dy"))
    )
    stats = directed.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("dx").alias("sx"),
        F.sum(F.col("dx") * F.col("dy")).alias("sxy"),
        F.sum(F.col("dx") * F.col("dx")).alias("sxx"),
    )
    n_nodes = deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    m, sx = F.col("m"), F.col("sx")
    return stats.crossJoin(F.broadcast(n_nodes)).select(
        F.expr("CAST(m / 2 AS BIGINT)").alias("n_edges"),
        "n_nodes",
        F.round(
            (m * F.col("sxy") - sx * sx)
            / (m * F.col("sxx") - sx * sx).cast("double"),
            6,
        ).alias("assortativity"),
    )


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
# Chi-square test of independence (event_type × day-of-week)
# ---------------------------------------------------------------------------

_CHI2_ORACLE = """
WITH cells AS (
  SELECT event_type,
         ((DATE_DIFF('day', DATE '1970-01-01', CAST(ts AS DATE)) % 7) + 4) % 7
           AS dow,
         COUNT(*) AS o
  FROM events GROUP BY 1, 2
),
margins AS (
  SELECT c.event_type, c.dow, c.o,
         SUM(c.o) OVER (PARTITION BY c.event_type) AS r,
         SUM(c.o) OVER (PARTITION BY c.dow) AS col_sum,
         SUM(c.o) OVER () AS n
  FROM cells c
),
terms AS (
  SELECT event_type, dow,
         CAST(o * n - r * col_sum AS BIGINT) AS num,
         CAST(ROUND(1000000.0 * (CAST(o * n - r * col_sum AS DOUBLE)
                                 * (o * n - r * col_sum))
                    / (CAST(n AS DOUBLE) * n * r * col_sum)) AS BIGINT)
           AS term_micro,
         n
  FROM margins
),
agg AS (
  SELECT COUNT(*) AS n_cells,
         CAST(SUM(term_micro) AS BIGINT) AS chi2_micro,
         CAST(MAX(n) AS BIGINT) AS n_obs
  FROM terms
),
dims AS (
  SELECT (SELECT COUNT(DISTINCT event_type) FROM cells) AS nr,
         (SELECT COUNT(DISTINCT dow) FROM cells) AS nc
)
SELECT a.n_cells, a.n_obs, a.chi2_micro,
       ROUND(a.chi2_micro / 1000000.0, 6) AS chi2,
       CAST((d.nr - 1) * (d.nc - 1) AS BIGINT) AS dof,
       ROUND(SQRT(a.chi2_micro / 1000000.0 /
                  (a.n_obs * LEAST(d.nr - 1, d.nc - 1))), 6) AS cramers_v
FROM agg a CROSS JOIN dims d
"""


@register(
    "a_chi_square_independence",
    oracle=_CHI2_ORACLE,
    tags=("A1", "A2", "W3", "F2"),
)
def a_chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square test of independence between event type and
    day-of-week, with Cramér's V effect size — "is traffic mix a
    function of weekday?". The contingency table, its margins, and the
    test statistic all come out of ONE pass over events.

    Determinism: each cell's contribution uses the algebraic identity
    (o·n − r·c)²/(n·r·c) — numerator exact BIGINT from integer counts,
    one double division per cell, rounded to integer micro at the LEAF
    so the cross-cell SUM is exact integer arithmetic in any partition
    order (the llm_text micro-unit pattern). dow uses epoch-day modular
    math (the t_seasonality_dow_profile convention), not engine week
    functions with differing weekday numbering.

    Scale: one combinable groupBy builds the ≤|types|×7 cell table;
    margins are windows OVER THAT tiny rollup, not the fact.
    """
    e = load_table(spark, sf_dir, "events")
    cells = (
        e.select(
            "event_type",
            (
                (
                    F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
                    % 7
                    + 4
                )
                % 7
            ).alias("dow"),
        )
        .groupBy("event_type", "dow")
        .agg(F.count(F.lit(1)).alias("o"))
    )
    w_r = Window.partitionBy("event_type")
    w_c = Window.partitionBy("dow")
    w_n = Window.partitionBy()
    margins = (
        cells.withColumn("r", F.sum("o").over(w_r))
        .withColumn("col_sum", F.sum("o").over(w_c))
        .withColumn("n", F.sum("o").over(w_n))
    )
    num = F.col("o") * F.col("n") - F.col("r") * F.col("col_sum")
    terms = margins.select(
        F.round(
            1000000.0
            * (num.cast("double") * num)
            / (F.col("n").cast("double") * F.col("n") * F.col("r") * F.col("col_sum"))
        )
        .cast("long")
        .alias("term_micro"),
        "n",
    )
    agg = terms.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum("term_micro").cast("long").alias("chi2_micro"),
        F.max("n").alias("n_obs"),
    )
    dims = cells.agg(
        F.countDistinct("event_type").alias("nr"),
        F.countDistinct("dow").alias("nc"),
    )
    return agg.crossJoin(F.broadcast(dims)).select(
        "n_cells",
        "n_obs",
        "chi2_micro",
        F.round(F.col("chi2_micro") / 1000000.0, 6).alias("chi2"),
        ((F.col("nr") - 1) * (F.col("nc") - 1)).cast("long").alias("dof"),
        F.round(
            F.sqrt(
                F.col("chi2_micro")
                / 1000000.0
                / (F.col("n_obs") * F.least(F.col("nr") - 1, F.col("nc") - 1))
            ),
            6,
        ).alias("cramers_v"),
    )


# ---------------------------------------------------------------------------
# Gini concentration of customer spend, per market segment
# ---------------------------------------------------------------------------

_GINI_ORACLE = f"""
WITH spend AS (
  SELECT c.c_mktsegment, o.o_custkey,
         CAST(SUM({CENTS_SQL.format(expr="o_totalprice")}) AS BIGINT)
           AS spend_cents
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY c.c_mktsegment, o.o_custkey
),
ranked AS (
  SELECT c_mktsegment, spend_cents,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
           ORDER BY spend_cents, o_custkey) AS i
  FROM spend
),
seg AS (
  SELECT c_mktsegment, COUNT(*) AS n,
         CAST(SUM(spend_cents) AS BIGINT) AS total_cents,
         CAST(SUM(i * spend_cents) AS BIGINT) AS weighted
  FROM ranked GROUP BY c_mktsegment
)
SELECT c_mktsegment, n, total_cents,
       ROUND((2.0 * weighted - (n + 1.0) * total_cents)
             / (CAST(n AS DOUBLE) * total_cents), 6) AS gini
FROM seg
ORDER BY c_mktsegment
"""


@register(
    "a_gini_concentration",
    oracle=_GINI_ORACLE,
    tags=("A1", "W1", "J1", "F3"),
)
def a_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer spend per market segment — the
    revenue-concentration metric ("do 20% of customers carry 80% of
    revenue?") from the rank-weighted closed form
    G = (2·Σi·x₍ᵢ₎ − (n+1)·Σx) / (n·Σx) over ascending-sorted spend.

    Determinism: Σi·x and Σx are exact BIGINT (cents); rank ties
    (equal spends) cannot change Σi·x because permuting equal values
    among consecutive ranks leaves the sum invariant — the tie-break
    on custkey is belt-and-braces. One double expression per segment
    at the end, identical tree both engines.

    Scale: one custkey-keyed combinable aggregation of the fact, then
    ranking windows PARTITIONED BY SEGMENT (parallel, never a global
    single-partition sort); each segment's closed form is one
    combinable agg. At extreme per-segment cardinality the ranking
    would move to the bucketed prefix-sum scheme in operators/ids.py.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    spend = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment", "o_custkey")
        .agg(F.sum(cents(F.col("o_totalprice"))).alias("spend_cents"))
    )
    w = Window.partitionBy("c_mktsegment").orderBy("spend_cents", "o_custkey")
    ranked = spend.withColumn("i", F.row_number().over(w))
    seg = ranked.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("spend_cents").cast("long").alias("total_cents"),
        F.sum(F.col("i") * F.col("spend_cents")).cast("long").alias("weighted"),
    )
    return seg.select(
        "c_mktsegment",
        "n",
        "total_cents",
        F.round(
            (2.0 * F.col("weighted") - (F.col("n") + 1.0) * F.col("total_cents"))
            / (F.col("n").cast("double") * F.col("total_cents")),
            6,
        ).alias("gini"),
    ).orderBy("c_mktsegment")


# ---------------------------------------------------------------------------
# Kaplan-Meier survival curve over user lifetimes
# ---------------------------------------------------------------------------

_KM_ORACLE = """
WITH user_span AS (
  SELECT user_id,
         MIN(DATE_DIFF('day', DATE '1970-01-01', CAST(ts AS DATE))) AS f,
         MAX(DATE_DIFF('day', DATE '1970-01-01', CAST(ts AS DATE))) AS l
  FROM events GROUP BY user_id
),
horizon AS (SELECT MAX(l) AS max_day FROM user_span),
lifetimes AS (
  SELECT u.user_id, CAST(u.l - u.f AS BIGINT) AS t,
         u.l >= h.max_day - 2 AS censored
  FROM user_span u CROSS JOIN horizon h
),
per_day AS (
  SELECT t AS j,
         COUNT(*) AS a_j,
         CAST(SUM(CASE WHEN censored THEN 0 ELSE 1 END) AS BIGINT) AS d_j,
         CAST(SUM(CASE WHEN censored THEN 1 ELSE 0 END) AS BIGINT) AS c_j
  FROM lifetimes GROUP BY t
),
at_risk AS (
  SELECT j, a_j, d_j, c_j,
         CAST(SUM(a_j) OVER (ORDER BY j
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT)
           AS n_j
  FROM per_day
),
factors AS (
  SELECT j, n_j, d_j, c_j,
         CAST(ROUND(LN((n_j - d_j) / CAST(n_j AS DOUBLE)) * 1000000)
              AS BIGINT) AS f_micro
  FROM at_risk WHERE n_j > d_j
)
SELECT j AS day, n_j AS n_at_risk, d_j AS n_deaths, c_j AS n_censored,
       CAST(SUM(f_micro) OVER (ORDER BY j
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS log_s_micro,
       ROUND(EXP(SUM(f_micro) OVER (ORDER BY j
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 1000000.0), 4)
         AS survival
FROM factors
ORDER BY day
"""


@register(
    "e_survival_km_curve",
    oracle=_KM_ORACLE,
    tags=("A1", "W3", "F2", "P6"),
)
def e_survival_km_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve of user lifetimes (days between
    first and last observed event). Users whose last event falls in
    the final 3 observed days are right-CENSORED (still active): they
    count in the at-risk denominators but never as churn events — the
    estimator every retention analysis should use instead of naive
    "alive after k days" ratios, which silently treat recent signups
    as churned.

    Determinism: KM is a running PRODUCT, computed in log space with
    each factor ln((n_j−d_j)/n_j) rounded to integer micro-nats at the
    leaf (the llm_text convention) so the cumulative sum is exact
    integer arithmetic; `log_s_micro` is the hash-stable column and
    `survival` is its display form (EXP of the SAME double on both
    engines, rounded to 4dp — coarse enough to absorb a last-ulp libm
    difference in exp()).

    Scale: one user-keyed combinable min/max over events, a 1-row
    horizon broadcast, then ALL remaining work happens on the per-day
    rollup (calendar-bounded); at-risk counts come from a suffix-sum
    window over that rollup rather than a day×user join.
    """
    e = load_table(spark, sf_dir, "events")
    epoch_day = F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
    user_span = e.groupBy("user_id").agg(
        F.min(epoch_day).alias("f"), F.max(epoch_day).alias("l")
    )
    horizon = user_span.agg(F.max("l").alias("max_day"))
    lifetimes = user_span.crossJoin(F.broadcast(horizon)).select(
        (F.col("l") - F.col("f")).cast("long").alias("t"),
        (F.col("l") >= F.col("max_day") - 2).alias("censored"),
    )
    per_day = lifetimes.groupBy(F.col("t").alias("j")).agg(
        F.count(F.lit(1)).alias("a_j"),
        F.sum(F.when(F.col("censored"), 0).otherwise(1))
        .cast("long")
        .alias("d_j"),
        F.sum(F.when(F.col("censored"), 1).otherwise(0))
        .cast("long")
        .alias("c_j"),
    )
    w_suffix = Window.orderBy("j").rowsBetween(0, Window.unboundedFollowing)
    at_risk = per_day.withColumn(
        "n_j", F.sum("a_j").over(w_suffix).cast("long")
    )
    factors = at_risk.filter(F.col("n_j") > F.col("d_j")).select(
        "j",
        "n_j",
        "d_j",
        "c_j",
        F.round(
            F.log((F.col("n_j") - F.col("d_j")) / F.col("n_j").cast("double"))
            * 1000000
        )
        .cast("long")
        .alias("f_micro"),
    )
    w_prefix = Window.orderBy("j").rowsBetween(Window.unboundedPreceding, 0)
    return factors.select(
        F.col("j").alias("day"),
        F.col("n_j").alias("n_at_risk"),
        F.col("d_j").alias("n_deaths"),
        F.col("c_j").alias("n_censored"),
        F.sum("f_micro").over(w_prefix).cast("long").alias("log_s_micro"),
        F.round(
            F.exp(F.sum("f_micro").over(w_prefix) / 1000000.0), 4
        ).alias("survival"),
    ).orderBy("day")


# ---------------------------------------------------------------------------
# Cohort LTV triangle (cumulative revenue by cohort-week × age-week)
# ---------------------------------------------------------------------------

_LTV_ORACLE = f"""
WITH weeks AS (
  SELECT user_id, event_type,
         CAST(FLOOR(DATE_DIFF('day', DATE '1970-01-01', CAST(ts AS DATE))
                    / 7) AS BIGINT) AS w,
         {CENTS_SQL.format(expr="value")} AS v_cents
  FROM events
),
cohorts AS (
  SELECT user_id, MIN(w) AS cohort_week FROM weeks GROUP BY user_id
),
cohort_size AS (
  SELECT cohort_week, COUNT(*) AS n_users FROM cohorts GROUP BY cohort_week
),
weekly AS (
  SELECT c.cohort_week, CAST(w.w - c.cohort_week AS BIGINT) AS age_week,
         CAST(SUM(CASE WHEN w.event_type = 'purchase'
                       THEN w.v_cents ELSE 0 END) AS BIGINT) AS week_rev_cents
  FROM weeks w JOIN cohorts c ON w.user_id = c.user_id
  GROUP BY c.cohort_week, age_week
)
SELECT wk.cohort_week, wk.age_week, cs.n_users, wk.week_rev_cents,
       CAST(SUM(wk.week_rev_cents) OVER (PARTITION BY wk.cohort_week
         ORDER BY wk.age_week
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_rev_cents,
       CAST(CAST(SUM(wk.week_rev_cents) OVER (PARTITION BY wk.cohort_week
         ORDER BY wk.age_week
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         // cs.n_users AS BIGINT) AS ltv_cents_per_user
FROM weekly wk JOIN cohort_size cs ON wk.cohort_week = cs.cohort_week
ORDER BY wk.cohort_week, wk.age_week
"""


@register(
    "e_cohort_ltv_triangle",
    oracle=_LTV_ORACLE,
    tags=("A1", "W3", "J1", "F2"),
)
def e_cohort_ltv_triangle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV triangle: users grouped by first-seen epoch-week,
    purchase revenue accumulated by cohort age in weeks — the
    cumulative-money companion to `e_retention_cohorts`' activity
    matrix, and the table finance teams extrapolate payback curves
    from. `ltv_cents_per_user` divides by ORIGINAL cohort size (not
    current actives), the standard definition.

    Integer math throughout: epoch-week by floor-division (identical
    both engines, no week-truncation semantics), revenue in exact
    cents, per-user LTV by BIGINT floor division. Scale: one user
    shuffle for cohort assignment (shared by `weeks`⋈`cohorts`), one
    combinable (cohort, age) rollup, and a window over the
    weeks×weeks-sized triangle — calendar-bounded, data-volume-free.
    """
    e = load_table(spark, sf_dir, "events")
    epoch_day = F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
    weeks = e.select(
        "user_id",
        "event_type",
        F.floor(epoch_day / 7).cast("long").alias("w"),
        cents(F.col("value")).alias("v_cents"),
    )
    cohorts = weeks.groupBy("user_id").agg(F.min("w").alias("cohort_week"))
    cohort_size = cohorts.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("n_users")
    )
    weekly = (
        weeks.join(cohorts, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("w") - F.col("cohort_week")).cast("long").alias("age_week"),
        )
        .agg(
            F.sum(
                F.when(F.col("event_type") == "purchase", F.col("v_cents"))
                .otherwise(0)
            )
            .cast("long")
            .alias("week_rev_cents")
        )
    )
    w_cum = Window.partitionBy("cohort_week").orderBy("age_week").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        weekly.join(F.broadcast(cohort_size), "cohort_week")
        .withColumn(
            "cum_rev_cents", F.sum("week_rev_cents").over(w_cum).cast("long")
        )
        .select(
            "cohort_week",
            "age_week",
            "n_users",
            "week_rev_cents",
            "cum_rev_cents",
            F.expr("CAST(cum_rev_cents DIV n_users AS BIGINT)").alias(
                "ltv_cents_per_user"
            ),
        )
        .orderBy("cohort_week", "age_week")
    )


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
# A/B power analysis: required sample size from observed variance
# ---------------------------------------------------------------------------

_POWER_ORACLE = f"""
WITH per_user AS (
  SELECT user_id, CAST(SUM({CENTS_SQL.format(expr="value")}) AS BIGINT)
           AS spend_cents
  FROM events GROUP BY user_id
),
stats AS (
  SELECT COUNT(*) AS n, CAST(SUM(spend_cents) AS BIGINT) AS s,
         CAST(SUM(spend_cents * spend_cents) AS BIGINT) AS ss
  FROM per_user
),
calc AS (
  SELECT n, CAST(s AS DOUBLE) / n AS mean_cents,
         (ss - CAST(s AS DOUBLE) * s / n) / (n - 1) AS var_cents2
  FROM stats
)
SELECT n AS n_users_observed,
       ROUND(mean_cents / 100, 6) AS mean_spend,
       ROUND(SQRT(var_cents2) / 100, 6) AS sd_spend,
       ROUND(0.05 * mean_cents / 100, 6) AS mde_spend,
       CAST(CEIL(2.0 * (1.959964 + 0.841621) * (1.959964 + 0.841621)
                 * var_cents2 / ((0.05 * mean_cents) * (0.05 * mean_cents)))
            AS BIGINT) AS n_required_per_arm,
       n >= 2 * CAST(CEIL(2.0 * (1.959964 + 0.841621) * (1.959964 + 0.841621)
                 * var_cents2 / ((0.05 * mean_cents) * (0.05 * mean_cents)))
            AS BIGINT) AS currently_powered
FROM calc
"""


@register(
    "e_power_analysis", oracle=_POWER_ORACLE, tags=("A2", "A1", "F3")
)
def e_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment power analysis: from the observed per-user spend
    distribution, the sample size each A/B arm needs to detect a 5%
    lift at α=0.05 (two-sided) with 80% power —
    n = 2(z_{α/2}+z_β)²σ²/δ². The pre-registration step before
    `e_welch_ttest` reads out a result; run on the same metric so σ²
    is the right one.

    Determinism: n/Σx/Σx² are exact BIGINTs from one combinable
    user-keyed pass; the closed form evaluates once on a 1-row frame
    with z-quantiles as double literals and explicit squaring (no libm
    POW). CEIL on a double is exact. Scale: single aggregation, no
    joins, 1-row output.
    """
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.sum(cents(F.col("value"))).cast("long").alias("spend_cents")
    )
    stats = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("spend_cents").cast("long").alias("s"),
        F.sum(F.col("spend_cents") * F.col("spend_cents"))
        .cast("long")
        .alias("ss"),
    )
    n = F.col("n")
    mean_cents = F.col("s").cast("double") / n
    var_cents2 = (
        F.col("ss") - F.col("s").cast("double") * F.col("s") / n
    ) / (n - 1)
    z2 = (1.959964 + 0.841621) * (1.959964 + 0.841621)
    n_req = F.ceil(
        2.0 * z2 * var_cents2 / ((0.05 * mean_cents) * (0.05 * mean_cents))
    ).cast("long")
    return stats.select(
        n.alias("n_users_observed"),
        F.round(mean_cents / 100, 6).alias("mean_spend"),
        F.round(F.sqrt(var_cents2) / 100, 6).alias("sd_spend"),
        F.round(0.05 * mean_cents / 100, 6).alias("mde_spend"),
        n_req.alias("n_required_per_arm"),
        (n >= 2 * n_req).alias("currently_powered"),
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
# Pareto decile concentration (the "80/20" readout)
# ---------------------------------------------------------------------------

_PARETO_ORACLE = f"""
WITH per_user AS (
  SELECT user_id, CAST(SUM({CENTS_SQL.format(expr="value")}) AS BIGINT)
           AS spend_cents
  FROM events GROUP BY user_id
),
ranked AS (
  SELECT spend_cents,
         ROW_NUMBER() OVER (ORDER BY spend_cents DESC, user_id) AS rn,
         COUNT(*) OVER () AS n
  FROM per_user
),
deciles AS (
  SELECT CAST((10 * (rn - 1)) // n AS BIGINT) + 1 AS decile,
         COUNT(*) AS n_users,
         CAST(SUM(spend_cents) AS BIGINT) AS decile_cents
  FROM ranked GROUP BY 1
),
cum AS (
  SELECT decile, n_users, decile_cents,
         CAST(SUM(decile_cents) OVER (ORDER BY decile
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_cents,
         CAST(SUM(decile_cents) OVER () AS BIGINT) AS total_cents
  FROM deciles
)
SELECT decile, n_users, decile_cents, cum_cents,
       CAST(cum_cents * 1000000 // total_cents AS BIGINT) AS cum_share_ppm
FROM cum
ORDER BY decile
"""


@register(
    "e_pareto_8020", oracle=_PARETO_ORACLE, tags=("W1", "W3", "A1", "O1")
)
def e_pareto_8020(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto concentration by spend decile: users ranked by total
    spend (descending), bucketed into tenths by explicit integer rank
    math — decile = ⌊10·(rn−1)/n⌋+1 rather than NTILE, so the bucket
    boundary rule is pinned identically on both engines — with each
    decile's spend and the running cumulative share in exact ppm. The
    "top 10% of users carry X% of revenue" table, the discrete
    companion to `a_gini_concentration`'s single coefficient.

    Scale: one user-keyed combinable aggregation; the global ranking
    window is the honest cost of an exact full-population rank (at true
    scale it becomes the bucketed prefix-sum scheme of
    operators/ids.py, as a_gini_concentration documents); everything
    after runs on a 10-row frame.
    """
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.sum(cents(F.col("value"))).cast("long").alias("spend_cents")
    )
    w_rank = Window.orderBy(F.col("spend_cents").desc(), "user_id")
    w_all = Window.partitionBy()
    ranked = per_user.select(
        "spend_cents",
        F.row_number().over(w_rank).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    )
    deciles = ranked.groupBy(
        (F.expr("(10 * (rn - 1)) DIV n") + 1).cast("long").alias("decile")
    ).agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("spend_cents").cast("long").alias("decile_cents"),
    )
    w_cum = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    cum = deciles.select(
        "decile",
        "n_users",
        "decile_cents",
        F.sum("decile_cents").over(w_cum).cast("long").alias("cum_cents"),
        F.sum("decile_cents").over(Window.partitionBy()).cast("long").alias(
            "total_cents"
        ),
    )
    return cum.select(
        "decile",
        "n_users",
        "decile_cents",
        "cum_cents",
        F.expr("CAST(cum_cents * 1000000 DIV total_cents AS BIGINT)").alias(
            "cum_share_ppm"
        ),
    ).orderBy("decile")


# ---------------------------------------------------------------------------
# Rolling 7-day median (robust smoothing)
# ---------------------------------------------------------------------------

_ROLLMED_ORACLE = f"""
WITH daily AS (
  SELECT DATE_DIFF('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
         CAST(SUM({CENTS_SQL.format(expr="value")}) AS BIGINT) AS rev_cents
  FROM events GROUP BY 1
)
SELECT d AS day, rev_cents,
       COUNT(*) OVER w AS n_in_window,
       ROUND(quantile_cont(rev_cents, 0.5) OVER w / 100.0, 6)
         AS rolling_median
FROM daily
WINDOW w AS (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
ORDER BY day
"""


@register(
    "w_rolling_median", oracle=_ROLLMED_ORACLE, tags=("W3", "A8", "F2")
)
def w_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day MEDIAN of daily revenue — the robust smoother that
    shrugs off one-day spikes a moving MEAN would chase (the windowed
    companion to `a_mad_outliers`' global robust statistics). Exact
    percentile as a window aggregate: linear-interpolated order
    statistic over integer cents yields exact .0/.5 doubles, bit-equal
    across engines before the shared round. Scale: one combinable
    groupBy(day); the framed window sorts 7 integers per row of a
    calendar-bounded rollup.
    """
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).alias("d")
    ).agg(F.sum(cents(F.col("value"))).cast("long").alias("rev_cents"))
    w = Window.orderBy("d").rowsBetween(-6, 0)
    return daily.select(
        F.col("d").alias("day"),
        "rev_cents",
        F.count(F.lit(1)).over(w).alias("n_in_window"),
        F.round(F.expr("percentile(rev_cents, 0.5)").over(w) / 100.0, 6).alias(
            "rolling_median"
        ),
    ).orderBy("day")


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
# Difference-in-differences (pre/post × treatment/control)
# ---------------------------------------------------------------------------

_DID_ORACLE = f"""
WITH tagged AS (
  SELECT user_id,
         CASE WHEN (user_id * 48271) % 100 < 50 THEN 1 ELSE 0 END AS treated,
         CASE WHEN CAST(ts AS DATE) >= DATE '2024-01-16' THEN 1 ELSE 0 END
           AS post,
         {CENTS_SQL.format(expr="value")} AS v_cents
  FROM events
),
cells AS (
  SELECT treated, post, COUNT(*) AS n,
         CAST(SUM(v_cents) AS BIGINT) AS s
  FROM tagged GROUP BY treated, post
),
wide AS (
  SELECT
    MAX(CASE WHEN treated = 1 AND post = 0 THEN s END) AS s_t_pre,
    MAX(CASE WHEN treated = 1 AND post = 0 THEN n END) AS n_t_pre,
    MAX(CASE WHEN treated = 1 AND post = 1 THEN s END) AS s_t_post,
    MAX(CASE WHEN treated = 1 AND post = 1 THEN n END) AS n_t_post,
    MAX(CASE WHEN treated = 0 AND post = 0 THEN s END) AS s_c_pre,
    MAX(CASE WHEN treated = 0 AND post = 0 THEN n END) AS n_c_pre,
    MAX(CASE WHEN treated = 0 AND post = 1 THEN s END) AS s_c_post,
    MAX(CASE WHEN treated = 0 AND post = 1 THEN n END) AS n_c_post
  FROM cells
)
SELECT n_t_pre, n_t_post, n_c_pre, n_c_post,
       ROUND(CAST(s_t_pre AS DOUBLE) / n_t_pre / 100, 6)  AS mean_t_pre,
       ROUND(CAST(s_t_post AS DOUBLE) / n_t_post / 100, 6) AS mean_t_post,
       ROUND(CAST(s_c_pre AS DOUBLE) / n_c_pre / 100, 6)  AS mean_c_pre,
       ROUND(CAST(s_c_post AS DOUBLE) / n_c_post / 100, 6) AS mean_c_post,
       ROUND((CAST(s_t_post AS DOUBLE) / n_t_post
              - CAST(s_t_pre AS DOUBLE) / n_t_pre)
             - (CAST(s_c_post AS DOUBLE) / n_c_post
                - CAST(s_c_pre AS DOUBLE) / n_c_pre), 6) / 100 AS did_estimate
FROM wide
"""


@register(
    "e_diff_in_diff", oracle=_DID_ORACLE, tags=("A1", "A7", "P6", "F2")
)
def e_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences: treatment assigned by user hash, the
    'intervention' at 2024-01-16 splits pre/post, and the DiD estimate
    (ΔT − ΔC) nets out both the group baseline difference and the
    shared time trend — the causal-inference workhorse when
    randomization happened at a cutover date rather than per request
    (complements `e_welch_ttest`'s randomized-experiment readout).

    Scale: ONE combinable pass builds the 2×2 cell sums (exact BIGINT
    cents); the estimator is a fixed-shape double expression on a
    1-row pivot. The date literal predicate pushes down to the scan.
    """
    e = load_table(spark, sf_dir, "events")
    tagged = e.select(
        F.when((F.col("user_id") * 48271) % 100 < 50, 1).otherwise(0).alias(
            "treated"
        ),
        F.when(
            F.to_date("ts") >= F.lit("2024-01-16").cast("date"), 1
        )
        .otherwise(0)
        .alias("post"),
        cents(F.col("value")).alias("v_cents"),
    )
    cells = tagged.groupBy("treated", "post").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v_cents").cast("long").alias("s")
    )

    def cell(t, p, col):
        return F.max(
            F.when((F.col("treated") == t) & (F.col("post") == p), F.col(col))
        )

    wide = cells.agg(
        cell(1, 0, "s").alias("s_t_pre"), cell(1, 0, "n").alias("n_t_pre"),
        cell(1, 1, "s").alias("s_t_post"), cell(1, 1, "n").alias("n_t_post"),
        cell(0, 0, "s").alias("s_c_pre"), cell(0, 0, "n").alias("n_c_pre"),
        cell(0, 1, "s").alias("s_c_post"), cell(0, 1, "n").alias("n_c_post"),
    )
    m = lambda s, n: F.col(s).cast("double") / F.col(n)  # noqa: E731
    return wide.select(
        "n_t_pre", "n_t_post", "n_c_pre", "n_c_post",
        F.round(m("s_t_pre", "n_t_pre") / 100, 6).alias("mean_t_pre"),
        F.round(m("s_t_post", "n_t_post") / 100, 6).alias("mean_t_post"),
        F.round(m("s_c_pre", "n_c_pre") / 100, 6).alias("mean_c_pre"),
        F.round(m("s_c_post", "n_c_post") / 100, 6).alias("mean_c_post"),
        (
            F.round(
                (m("s_t_post", "n_t_post") - m("s_t_pre", "n_t_pre"))
                - (m("s_c_post", "n_c_post") - m("s_c_pre", "n_c_pre")),
                6,
            )
            / 100
        ).alias("did_estimate"),
    )


# ---------------------------------------------------------------------------
# Repurchase rate within 30 days (temporal self-join via lead)
# ---------------------------------------------------------------------------

_REPURCHASE_ORACLE = """
WITH seq AS (
  SELECT o_custkey, o_orderdate,
         LEAD(o_orderdate) OVER (PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey) AS next_date
  FROM orders
)
SELECT COUNT(*) AS n_orders_with_next,
       CAST(SUM(CASE WHEN DATE_DIFF('day', CAST(o_orderdate AS DATE),
                                    CAST(next_date AS DATE)) <= 30
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_within_30d,
       CAST(SUM(CASE WHEN DATE_DIFF('day', CAST(o_orderdate AS DATE),
                                    CAST(next_date AS DATE)) <= 30
                     THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT)
         AS repurchase_30d_ppm
FROM seq WHERE next_date IS NOT NULL
"""


@register(
    "e_repurchase_rate_30d",
    oracle=_REPURCHASE_ORACLE,
    tags=("W2", "A2", "F2", "P5"),
)
def e_repurchase_rate_30d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-day repurchase rate: of orders that HAVE a next order from
    the same customer, the share whose gap is ≤30 days — the loyalty
    metric computed the scalable way: `lead()` over one customer-keyed
    window replaces the naive temporal self-join (orders × orders per
    customer is quadratic in orders-per-customer; the window is
    linear). Exact integer ppm; window ties broken on orderkey.
    """
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = o.select(
        "o_orderdate", F.lead("o_orderdate").over(w).alias("next_date")
    ).filter(F.col("next_date").isNotNull())
    gap = F.datediff(
        F.col("next_date").cast("date"), F.col("o_orderdate").cast("date")
    )
    return seq.agg(
        F.count(F.lit(1)).alias("n_orders_with_next"),
        F.sum(F.when(gap <= 30, 1).otherwise(0))
        .cast("long")
        .alias("n_within_30d"),
    ).select(
        "n_orders_with_next",
        "n_within_30d",
        F.expr(
            "CAST(n_within_30d * 1000000 DIV n_orders_with_next AS BIGINT)"
        ).alias("repurchase_30d_ppm"),
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
# Leave-one-out target encoding (ML feature engineering)
# ---------------------------------------------------------------------------

_TARGETENC_ORACLE = """
WITH base AS (
  SELECT o_orderkey, o_orderpriority,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS y_cents
  FROM orders
),
cat AS (
  SELECT o_orderpriority, COUNT(*) AS n_cat,
         CAST(SUM(y_cents) AS BIGINT) AS s_cat
  FROM base GROUP BY o_orderpriority
),
encoded AS (
  SELECT b.o_orderkey, b.o_orderpriority,
         ROUND((c.s_cat - b.y_cents)
               / (100.0 * (c.n_cat - 1)), 6) AS te_loo
  FROM base b JOIN cat c ON b.o_orderpriority = c.o_orderpriority
)
SELECT o_orderpriority,
       COUNT(*) AS n_rows,
       ROUND(MIN(te_loo), 6) AS min_te,
       ROUND(MAX(te_loo), 6) AS max_te,
       CAST(SUM(CAST(ROUND(te_loo * 1000000) AS BIGINT)) AS BIGINT)
         AS sum_te_micro
FROM encoded
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register(
    "a_target_encoding_loo",
    oracle=_TARGETENC_ORACLE,
    tags=("A1", "J2", "F3", "P6"),
)
def a_target_encoding_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding of order priority against order
    value — the ML feature-engineering op that replaces a categorical
    with its target mean while EXCLUDING the row's own target
    ((Σy_cat − y_i)/(n_cat − 1)), the standard leakage guard; a naive
    mean encoding leaks each label into its own feature. Summarized
    per category (min/max/micro-sum of the encodings) so the checked
    output stays small while pinning every row's value through the
    sum.

    Determinism: category sums are exact BIGINT cents; each row's LOO
    value is one fixed-shape double division, and the summary sum is
    taken on values pre-scaled to exact micro integers. Scale: one
    combinable category rollup (≤5 rows, broadcast back) and one
    map-side encode pass — no row-level shuffle at all.
    """
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        "o_orderpriority", cents(F.col("o_totalprice")).alias("y_cents")
    )
    cat = base.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_cat"),
        F.sum("y_cents").cast("long").alias("s_cat"),
    )
    encoded = base.join(F.broadcast(cat), "o_orderpriority").select(
        "o_orderpriority",
        F.round(
            (F.col("s_cat") - F.col("y_cents"))
            / (100.0 * (F.col("n_cat") - 1)),
            6,
        ).alias("te_loo"),
    )
    return (
        encoded.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.min("te_loo"), 6).alias("min_te"),
            F.round(F.max("te_loo"), 6).alias("max_te"),
            F.sum(F.round(F.col("te_loo") * 1000000).cast("long"))
            .cast("long")
            .alias("sum_te_micro"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# KPI driver-tree decomposition (ΔRevenue = mix of user count × ARPU)
# ---------------------------------------------------------------------------

_KPI_ORACLE = f"""
WITH weekly AS (
  SELECT CAST(FLOOR(DATE_DIFF('day', DATE '1970-01-01', CAST(ts AS DATE))
                    / 7) AS BIGINT) AS w,
         user_id,
         {CENTS_SQL.format(expr="value")} AS v_cents
  FROM events
),
bounds AS (SELECT MIN(w) AS w0, MAX(w) AS w1 FROM weekly),
per_week AS (
  SELECT wk.w, COUNT(DISTINCT wk.user_id) AS n_users,
         CAST(SUM(wk.v_cents) AS BIGINT) AS rev_cents
  FROM weekly wk CROSS JOIN bounds b
  WHERE wk.w IN (b.w0, b.w1)
  GROUP BY wk.w
),
wide AS (
  SELECT
    MAX(CASE WHEN w = (SELECT w0 FROM bounds) THEN n_users END) AS u0,
    MAX(CASE WHEN w = (SELECT w0 FROM bounds) THEN rev_cents END) AS r0,
    MAX(CASE WHEN w = (SELECT w1 FROM bounds) THEN n_users END) AS u1,
    MAX(CASE WHEN w = (SELECT w1 FROM bounds) THEN rev_cents END) AS r1
  FROM per_week
)
SELECT u0, u1, r0, r1,
       r1 - r0 AS delta_rev_cents,
       ROUND((u1 - u0) * ((CAST(r0 AS DOUBLE) / u0 +
                           CAST(r1 AS DOUBLE) / u1) / 2) / 100, 6)
         AS user_count_contrib,
       ROUND((CAST(r1 AS DOUBLE) / u1 - CAST(r0 AS DOUBLE) / u0)
             * ((u0 + u1) / 2.0) / 100, 6) AS arpu_contrib,
       ROUND(((u1 - u0) * ((CAST(r0 AS DOUBLE) / u0 +
                            CAST(r1 AS DOUBLE) / u1) / 2)
              + (CAST(r1 AS DOUBLE) / u1 - CAST(r0 AS DOUBLE) / u0)
                * ((u0 + u1) / 2.0)
              - (r1 - r0)) / 100, 6) AS residual_check
FROM wide
"""


@register(
    "e_kpi_driver_decomposition",
    oracle=_KPI_ORACLE,
    tags=("A1", "A3", "A7", "F2"),
)
def e_kpi_driver_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KPI driver-tree decomposition: revenue change between the first
    and last observed week split into a USER-COUNT contribution and an
    ARPU contribution via the symmetric (midpoint) decomposition
    ΔR = Δu·ARPU̅ + Δarpu·u̅ — the "why did the metric move?" analysis
    every growth team runs; the symmetric form makes the two
    contributions sum EXACTLY to ΔR (`residual_check` pins ≈0, up to
    the shared rounding).

    Scale: the bounds are a 1-row min/max broadcast, the heavy pass
    aggregates ONLY the two boundary weeks (pushed as an IN filter
    before the distinct-count shuffle); the algebra runs on a 1-row
    pivot with exact integer inputs.
    """
    e = load_table(spark, sf_dir, "events")
    weekly = e.select(
        F.floor(
            F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")) / 7
        )
        .cast("long")
        .alias("w"),
        "user_id",
        cents(F.col("value")).alias("v_cents"),
    )
    bounds = weekly.agg(F.min("w").alias("w0"), F.max("w").alias("w1"))
    per_week = (
        weekly.crossJoin(F.broadcast(bounds))
        .filter((F.col("w") == F.col("w0")) | (F.col("w") == F.col("w1")))
        .groupBy("w", "w0", "w1")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.sum("v_cents").cast("long").alias("rev_cents"),
        )
    )
    wide = per_week.agg(
        F.max(F.when(F.col("w") == F.col("w0"), F.col("n_users"))).alias("u0"),
        F.max(F.when(F.col("w") == F.col("w0"), F.col("rev_cents"))).alias("r0"),
        F.max(F.when(F.col("w") == F.col("w1"), F.col("n_users"))).alias("u1"),
        F.max(F.when(F.col("w") == F.col("w1"), F.col("rev_cents"))).alias("r1"),
    )
    arpu0 = F.col("r0").cast("double") / F.col("u0")
    arpu1 = F.col("r1").cast("double") / F.col("u1")
    du = F.col("u1") - F.col("u0")
    u_contrib = du * ((arpu0 + arpu1) / 2)
    a_contrib = (arpu1 - arpu0) * ((F.col("u0") + F.col("u1")) / 2.0)
    return wide.select(
        "u0",
        "u1",
        "r0",
        "r1",
        (F.col("r1") - F.col("r0")).alias("delta_rev_cents"),
        F.round(u_contrib / 100, 6).alias("user_count_contrib"),
        F.round(a_contrib / 100, 6).alias("arpu_contrib"),
        F.round(
            (u_contrib + a_contrib - (F.col("r1") - F.col("r0"))) / 100, 6
        ).alias("residual_check"),
    )


# ---------------------------------------------------------------------------
# Hill estimator: power-law tail exponent of the spend distribution
# ---------------------------------------------------------------------------

_HILL_ORACLE = f"""
WITH per_user AS (
  SELECT user_id, CAST(SUM({CENTS_SQL.format(expr="value")}) AS BIGINT)
           AS spend_cents
  FROM events GROUP BY user_id
),
ranked AS (
  SELECT spend_cents,
         ROW_NUMBER() OVER (ORDER BY spend_cents DESC, user_id) AS rk,
         COUNT(*) OVER () AS n
  FROM per_user
),
tail AS (
  SELECT r.spend_cents, r.rk,
         (SELECT MIN(spend_cents) FROM ranked
          WHERE rk <= GREATEST(CAST(n * 5 // 100 AS BIGINT), 10)) AS x_min,
         GREATEST(CAST(r.n * 5 // 100 AS BIGINT), 10) AS k
  FROM ranked r
  WHERE r.rk <= GREATEST(CAST(r.n * 5 // 100 AS BIGINT), 10)
),
logs AS (
  SELECT k, x_min,
         CAST(ROUND(LN(spend_cents / CAST(x_min AS DOUBLE)) * 1000000)
              AS BIGINT) AS log_ratio_micro
  FROM tail
)
SELECT MAX(k) AS k_tail, MAX(x_min) AS x_min_cents,
       CAST(SUM(log_ratio_micro) AS BIGINT) AS sum_log_micro,
       ROUND(1 + MAX(k) / (SUM(log_ratio_micro) / 1000000.0), 6)
         AS alpha_hill
FROM logs
"""


@register(
    "a_hill_tail_exponent",
    oracle=_HILL_ORACLE,
    tags=("A8", "W1", "A2", "F3"),
)
def a_hill_tail_exponent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill estimator of the power-law tail exponent of per-user
    spend: α = 1 + k / Σ ln(x_i/x_min) over the top-5% order
    statistics — the quantitative answer to "HOW heavy is the tail?"
    that `e_pareto_8020` (shares) and `a_gini_concentration`
    (inequality) only describe; α ≤ 2 means infinite variance and
    mean-based metrics become unstable.

    Determinism: the tail set is an exact rank cut (ties broken on
    user_id); each log-ratio rounds to integer micro-nats at the LEAF
    so the tail sum is exact integer arithmetic; one double division
    at the end. Scale: one user-keyed combine, a global rank window
    (the documented exact-order cost), then k-row arithmetic.
    """
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.sum(cents(F.col("value"))).cast("long").alias("spend_cents")
    )
    w = Window.orderBy(F.col("spend_cents").desc(), "user_id")
    ranked = per_user.select(
        "spend_cents",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    ).withColumn(
        "k", F.greatest(F.expr("CAST(n * 5 DIV 100 AS BIGINT)"), F.lit(10))
    )
    tail = ranked.filter(F.col("rk") <= F.col("k"))
    x_min = tail.agg(F.min("spend_cents").alias("x_min"))
    logs = tail.crossJoin(F.broadcast(x_min)).select(
        "k",
        "x_min",
        F.round(
            F.log(F.col("spend_cents") / F.col("x_min").cast("double"))
            * 1000000
        )
        .cast("long")
        .alias("log_ratio_micro"),
    )
    return logs.agg(
        F.max("k").alias("k_tail"),
        F.max("x_min").alias("x_min_cents"),
        F.sum("log_ratio_micro").cast("long").alias("sum_log_micro"),
    ).select(
        "k_tail",
        "x_min_cents",
        "sum_log_micro",
        F.round(
            1 + F.col("k_tail") / (F.col("sum_log_micro") / 1000000.0), 6
        ).alias("alpha_hill"),
    )


# ---------------------------------------------------------------------------
# Sample-ratio-mismatch (SRM) check for experiment health
# ---------------------------------------------------------------------------

_SRM_ORACLE = """
WITH assigned AS (
  SELECT DISTINCT user_id,
         CASE WHEN (user_id * 48271) % 100 < 50 THEN 'A' ELSE 'B' END AS arm
  FROM events
),
counts AS (
  SELECT CAST(SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b
  FROM assigned
)
SELECT n_a, n_b,
       ROUND(CAST(n_a - n_b AS DOUBLE) * (n_a - n_b)
             / (n_a + n_b), 6) AS chi2_srm,
       CAST(n_a - n_b AS DOUBLE) * (n_a - n_b) / (n_a + n_b) < 10.83
         AS ratio_healthy,
       CAST(n_a * 1000000 // (n_a + n_b) AS BIGINT) AS share_a_ppm
FROM counts
"""


@register(
    "a_srm_check", oracle=_SRM_ORACLE, tags=("A2", "A7", "P6")
)
def a_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch check — the experiment-health gate that
    must pass BEFORE `e_welch_ttest` or `e_ab_test_lift` are read: a
    50/50 assignment whose realized split fails the 1-dof chi-square
    (χ² = (n_a−n_b)²/(n_a+n_b) against the p<0.001 critical value
    10.83) indicates broken randomization — logging loss, bot
    filtering, redirect bugs — and invalidates every downstream
    metric no matter how significant it looks.

    Scale: one distinct-user pass (the assignment unit), one 2-cell
    conditional rollup, closed-form χ² on a 1-row frame — exact
    integer counts into one fixed-shape double expression.
    """
    e = load_table(spark, sf_dir, "events")
    assigned = e.select("user_id").dropDuplicates().select(
        F.when((F.col("user_id") * 48271) % 100 < 50, "A")
        .otherwise("B")
        .alias("arm")
    )
    counts = assigned.agg(
        F.sum(F.when(F.col("arm") == "A", 1).otherwise(0))
        .cast("long")
        .alias("n_a"),
        F.sum(F.when(F.col("arm") == "B", 1).otherwise(0))
        .cast("long")
        .alias("n_b"),
    )
    diff = (F.col("n_a") - F.col("n_b")).cast("double")
    chi2 = diff * (F.col("n_a") - F.col("n_b")) / (F.col("n_a") + F.col("n_b"))
    return counts.select(
        "n_a",
        "n_b",
        F.round(chi2, 6).alias("chi2_srm"),
        (chi2 < 10.83).alias("ratio_healthy"),
        F.expr("CAST(n_a * 1000000 DIV (n_a + n_b) AS BIGINT)").alias(
            "share_a_ppm"
        ),
    )


# ---------------------------------------------------------------------------
# CUPED variance reduction for the A/B readout
# ---------------------------------------------------------------------------

_CUPED_ORACLE = f"""
WITH per_user AS (
  SELECT user_id,
         CASE WHEN (user_id * 48271) % 100 < 50 THEN 'A' ELSE 'B' END AS arm,
         CAST(SUM(CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16'
                  THEN {CENTS_SQL.format(expr="value")} ELSE 0 END)
              AS BIGINT) AS x_pre,
         CAST(SUM(CASE WHEN CAST(ts AS DATE) >= DATE '2024-01-16'
                  THEN {CENTS_SQL.format(expr="value")} ELSE 0 END)
              AS BIGINT) AS y_post
  FROM events GROUP BY user_id
),
moments AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(x_pre) AS BIGINT) AS sx,
         CAST(SUM(y_post) AS BIGINT) AS sy,
         CAST(SUM(x_pre * y_post) AS BIGINT) AS sxy,
         CAST(SUM(x_pre * x_pre) AS BIGINT) AS sxx,
         CAST(SUM(y_post * y_post) AS BIGINT) AS syy
  FROM per_user
),
theta AS (
  SELECT n, sx, sy, syy,
         (sxy - CAST(sx AS DOUBLE) * sy / n)
           / (sxx - CAST(sx AS DOUBLE) * sx / n) AS th,
         (sxy - CAST(sx AS DOUBLE) * sy / n)
           * ((sxy - CAST(sx AS DOUBLE) * sy / n)
              / (sxx - CAST(sx AS DOUBLE) * sx / n)) AS explained
  FROM moments
),
arms AS (
  SELECT p.arm, COUNT(*) AS n_arm,
         CAST(SUM(p.y_post) AS BIGINT) AS sy_arm,
         CAST(SUM(p.x_pre) AS BIGINT) AS sx_arm
  FROM per_user p GROUP BY p.arm
),
adj AS (
  SELECT a.arm, a.n_arm,
         CAST(a.sy_arm AS DOUBLE) / a.n_arm
           - t.th * (CAST(a.sx_arm AS DOUBLE) / a.n_arm
                     - CAST(t.sx AS DOUBLE) / t.n) AS y_cuped_mean,
         t.th, t.explained, t.sy, t.syy, t.n
  FROM arms a CROSS JOIN theta t
)
SELECT arm, n_arm,
       ROUND(y_cuped_mean / 100, 6) AS cuped_mean_spend,
       ROUND(th, 6) AS theta,
       ROUND(explained
             / (syy - CAST(sy AS DOUBLE) * sy / n), 6)
         AS variance_reduction_frac
FROM adj
ORDER BY arm
"""


@register(
    "e_cuped_adjustment", oracle=_CUPED_ORACLE, tags=("A1", "A7", "F2", "P6")
)
def e_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction: per-user PRE-period spend (days
    before the cutover) is the control covariate; θ = cov(Y,X)/var(X)
    is fit on the pooled population, and each arm's post-period mean
    is adjusted to Ŷ = Ȳ_arm − θ(X̄_arm − X̄) — the industry-standard
    trick that shrinks experiment confidence intervals by the R² of
    pre on post (reported as `variance_reduction_frac`) without
    touching the treatment effect. Pre-period data is valid as a
    covariate precisely because assignment can't affect it.

    Determinism: one combinable pass builds per-user (x, y) in exact
    cents; pooled moments and arm sums are exact BIGINTs (magnitudes
    checked: x·y products stay under 2⁵³ at these scales); θ and the
    adjustment evaluate in fixed-shape double expressions on 1-row /
    2-row frames.
    """
    e = load_table(spark, sf_dir, "events")
    cut = F.lit("2024-01-16").cast("date")
    per_user = e.groupBy("user_id").agg(
        F.sum(
            F.when(F.to_date("ts") < cut, cents(F.col("value"))).otherwise(0)
        )
        .cast("long")
        .alias("x_pre"),
        F.sum(
            F.when(F.to_date("ts") >= cut, cents(F.col("value"))).otherwise(0)
        )
        .cast("long")
        .alias("y_post"),
    ).withColumn(
        "arm",
        F.when((F.col("user_id") * 48271) % 100 < 50, "A").otherwise("B"),
    )
    moments = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x_pre").cast("long").alias("sx"),
        F.sum("y_post").cast("long").alias("sy"),
        F.sum(F.col("x_pre") * F.col("y_post")).cast("long").alias("sxy"),
        F.sum(F.col("x_pre") * F.col("x_pre")).cast("long").alias("sxx"),
        F.sum(F.col("y_post") * F.col("y_post")).cast("long").alias("syy"),
    )
    cov = F.col("sxy") - F.col("sx").cast("double") * F.col("sy") / F.col("n")
    varx = F.col("sxx") - F.col("sx").cast("double") * F.col("sx") / F.col("n")
    theta = moments.select(
        "n", "sx", "sy", "syy",
        (cov / varx).alias("th"),
        (cov * (cov / varx)).alias("explained"),
    )
    arms = per_user.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n_arm"),
        F.sum("y_post").cast("long").alias("sy_arm"),
        F.sum("x_pre").cast("long").alias("sx_arm"),
    )
    adj = arms.crossJoin(F.broadcast(theta))
    y_cuped = F.col("sy_arm").cast("double") / F.col("n_arm") - F.col("th") * (
        F.col("sx_arm").cast("double") / F.col("n_arm")
        - F.col("sx").cast("double") / F.col("n")
    )
    vary = F.col("syy") - F.col("sy").cast("double") * F.col("sy") / F.col("n")
    return adj.select(
        "arm",
        "n_arm",
        F.round(y_cuped / 100, 6).alias("cuped_mean_spend"),
        F.round(F.col("th"), 6).alias("theta"),
        F.round(F.col("explained") / vary, 6).alias("variance_reduction_frac"),
    ).orderBy("arm")


# ---------------------------------------------------------------------------
# Two-sample Kolmogorov-Smirnov test in exact integers
# ---------------------------------------------------------------------------

_KS_ORACLE = f"""
WITH cohorts AS (
  SELECT user_id,
         (user_id * 48271) % 100 < 50 AS in_a,
         CAST(SUM({CENTS_SQL.format(expr="value")}) AS BIGINT) AS spend
  FROM events GROUP BY user_id
),
sizes AS (
  SELECT CAST(SUM(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN in_a THEN 0 ELSE 1 END) AS BIGINT) AS n2
  FROM cohorts
),
steps AS (
  SELECT spend, in_a,
         CAST(SUM(CASE WHEN in_a THEN 1 ELSE 0 END)
              OVER (ORDER BY spend, user_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS c1,
         CAST(SUM(CASE WHEN in_a THEN 0 ELSE 1 END)
              OVER (ORDER BY spend, user_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS c2
  FROM cohorts
),
d AS (
  SELECT MAX(ABS(c1 * s.n2 - c2 * s.n1)) AS d_scaled, s.n1, s.n2
  FROM steps CROSS JOIN sizes s
  GROUP BY s.n1, s.n2
)
SELECT n1, n2, CAST(d_scaled AS BIGINT) AS d_scaled,
       ROUND(CAST(d_scaled AS DOUBLE) / (n1 * n2), 6) AS ks_d,
       ROUND(1.358 * SQRT((n1 + n2) / (CAST(n1 AS DOUBLE) * n2)), 6)
         AS crit_05,
       CAST(d_scaled AS DOUBLE) / (n1 * n2)
         > 1.358 * SQRT((n1 + n2) / (CAST(n1 AS DOUBLE) * n2))
         AS distributions_differ
FROM d
"""


@register(
    "a_ks_two_sample", oracle=_KS_ORACLE, tags=("A8", "W3", "A2", "P6")
)
def a_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov test on per-user spend between
    hash-assigned cohorts: D = max |F₁(x) − F₂(x)| — the
    nonparametric "did the WHOLE distribution shift?" test that
    catches changes a mean test misses (variance, shape, tails), with
    the α=0.05 critical value 1.358·√((n₁+n₂)/n₁n₂).

    The integer trick: cross-scale the ECDF gap to
    |c₁·n₂ − c₂·n₁| — exact BIGINT at every step of the merged sort,
    so the supremum is an exact integer MAX and only the final
    normalization divides. The running counts come from one window
    over the merged cohort sort (ties broken on user_id identically
    both engines). Scale: one user-keyed combine, then the global
    sorted window — the documented exact-order cost (a banded
    approximation splits the value range at scale).
    """
    e = load_table(spark, sf_dir, "events")
    cohorts = e.groupBy("user_id").agg(
        F.sum(cents(F.col("value"))).cast("long").alias("spend")
    ).withColumn("in_a", (F.col("user_id") * 48271) % 100 < 50)
    sizes = cohorts.agg(
        F.sum(F.when(F.col("in_a"), 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(F.col("in_a"), 0).otherwise(1)).cast("long").alias("n2"),
    )
    w = Window.orderBy("spend", "user_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    steps = cohorts.select(
        F.sum(F.when(F.col("in_a"), 1).otherwise(0))
        .over(w)
        .cast("long")
        .alias("c1"),
        F.sum(F.when(F.col("in_a"), 0).otherwise(1))
        .over(w)
        .cast("long")
        .alias("c2"),
    )
    d = (
        steps.crossJoin(F.broadcast(sizes))
        .groupBy("n1", "n2")
        .agg(
            F.max(
                F.abs(F.col("c1") * F.col("n2") - F.col("c2") * F.col("n1"))
            ).alias("d_scaled")
        )
    )
    ks = F.col("d_scaled").cast("double") / (F.col("n1") * F.col("n2"))
    crit = 1.358 * F.sqrt(
        (F.col("n1") + F.col("n2")) / (F.col("n1").cast("double") * F.col("n2"))
    )
    return d.select(
        "n1",
        "n2",
        F.col("d_scaled").cast("long").alias("d_scaled"),
        F.round(ks, 6).alias("ks_d"),
        F.round(crit, 6).alias("crit_05"),
        (ks > crit).alias("distributions_differ"),
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
# Inverse-propensity weighting (observational effect estimate)
# ---------------------------------------------------------------------------

_IPW_ORACLE = f"""
WITH per_user AS (
  SELECT user_id,
         (user_id * 2654435761) % 100 < 40 + (user_id % 3) * 10 AS treated,
         CAST(SUM(CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16'
                  THEN {CENTS_SQL.format(expr="value")} ELSE 0 END)
              AS BIGINT) AS x_pre,
         CAST(SUM(CASE WHEN CAST(ts AS DATE) >= DATE '2024-01-16'
                  THEN {CENTS_SQL.format(expr="value")} ELSE 0 END)
              AS BIGINT) AS y_post
  FROM events GROUP BY user_id
),
strata AS (
  SELECT user_id, treated, y_post, user_id % 3 AS stratum FROM per_user
),
propensity AS (
  SELECT stratum,
         CAST(SUM(CASE WHEN treated THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
         COUNT(*) AS n_s
  FROM strata GROUP BY stratum
),
weighted AS (
  SELECT s.stratum, s.treated, s.y_post, p.n_t, p.n_s,
         CASE WHEN s.treated
              THEN CAST(p.n_s AS DOUBLE) / p.n_t
              ELSE CAST(p.n_s AS DOUBLE) / (p.n_s - p.n_t) END AS w
  FROM strata s JOIN propensity p ON s.stratum = p.stratum
)
SELECT treated,
       COUNT(*) AS n_users,
       ROUND(SUM(w * y_post) / SUM(w) / 100, 6) AS ipw_mean_spend,
       ROUND(SUM(CAST(y_post AS DOUBLE)) / COUNT(*) / 100, 6)
         AS naive_mean_spend
FROM weighted
GROUP BY treated
ORDER BY treated
"""


@register(
    "e_ipw_adjustment", oracle=_IPW_ORACLE, tags=("A1", "A7", "J2", "P6")
)
def e_ipw_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-propensity weighting for an OBSERVATIONAL comparison:
    'treatment' here is deliberately CONFOUNDED with a user stratum
    (assignment probability varies by user_id%3), so the naive group
    means are biased; weighting each user by 1/P(their assignment |
    stratum) rebalances the strata and recovers comparable means —
    the third member of the causal toolkit (DiD nets out time trends,
    CUPED cuts variance, IPW corrects selection). Stratum propensities
    are exact count ratios, not a fitted model, so the whole estimator
    is deterministic.

    Caveat (float sums): the weighted sums Σw·y are double — here the
    weights are one of three exact rational values per stratum and
    the comparison survives because both engines sum the same
    ~thousands of products into well-separated magnitudes and round
    to 6dp; sub-ulp ordering effects are absorbed by the rounding.
    Scale: one user pass, a 3-row propensity table broadcast back,
    one combinable weighted rollup.
    """
    e = load_table(spark, sf_dir, "events")
    cut = F.lit("2024-01-16").cast("date")
    per_user = e.groupBy("user_id").agg(
        F.sum(
            F.when(F.to_date("ts") >= cut, cents(F.col("value"))).otherwise(0)
        )
        .cast("long")
        .alias("y_post"),
    ).select(
        "user_id",
        "y_post",
        (
            (F.col("user_id") * 2654435761) % 100
            < 40 + (F.col("user_id") % 3) * 10
        ).alias("treated"),
        (F.col("user_id") % 3).alias("stratum"),
    )
    propensity = per_user.groupBy("stratum").agg(
        F.sum(F.when(F.col("treated"), 1).otherwise(0))
        .cast("long")
        .alias("n_t"),
        F.count(F.lit(1)).alias("n_s"),
    )
    weighted = per_user.join(F.broadcast(propensity), "stratum").select(
        "treated",
        "y_post",
        F.when(
            F.col("treated"), F.col("n_s").cast("double") / F.col("n_t")
        )
        .otherwise(F.col("n_s").cast("double") / (F.col("n_s") - F.col("n_t")))
        .alias("w"),
    )
    return (
        weighted.groupBy("treated")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.round(
                F.sum(F.col("w") * F.col("y_post")) / F.sum("w") / 100, 6
            ).alias("ipw_mean_spend"),
            F.round(
                F.sum(F.col("y_post").cast("double")) / F.count(F.lit(1)) / 100,
                6,
            ).alias("naive_mean_spend"),
        )
        .orderBy("treated")
    )


# ---------------------------------------------------------------------------
# Wilson score confidence interval for a conversion rate
# ---------------------------------------------------------------------------

_WILSON_ORACLE = """
WITH conv AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
  FROM events GROUP BY user_id
),
counts AS (
  SELECT COUNT(*) AS n, CAST(SUM(converted) AS BIGINT) AS k FROM conv
),
calc AS (
  SELECT n, k,
         CAST(k AS DOUBLE) / n AS p,
         1.959964 * 1.959964 AS z2
  FROM counts
)
SELECT n, k,
       ROUND(p, 6) AS rate,
       ROUND((p + z2 / (2 * n)
              - 1.959964 * SQRT((p * (1 - p) + z2 / (4 * n)) / n))
             / (1 + z2 / n), 6) AS wilson_lo,
       ROUND((p + z2 / (2 * n)
              + 1.959964 * SQRT((p * (1 - p) + z2 / (4 * n)) / n))
             / (1 + z2 / n), 6) AS wilson_hi
FROM calc
"""


@register(
    "a_wilson_ci", oracle=_WILSON_ORACLE, tags=("A2", "A7", "F3")
)
def a_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson score 95% confidence interval for the user conversion
    rate — the binomial interval that behaves at the boundaries where
    the naive Wald interval collapses (p near 0 or 1, small n): the
    number that belongs next to every conversion-rate readout
    (`e_ab_test_lift` reports the point estimates; this bounds them).

    Determinism: n and k are exact integers from one user-keyed
    combine; the closed form evaluates once on a 1-row frame with
    z² written as an explicit product and identical expression shape
    on both engines (√ correctly rounded).
    """
    e = load_table(spark, sf_dir, "events")
    conv = e.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted")
    )
    counts = conv.agg(
        F.count(F.lit(1)).alias("n"), F.sum("converted").cast("long").alias("k")
    )
    p = F.col("k").cast("double") / F.col("n")
    z = 1.959964
    z2 = z * z
    n = F.col("n")
    center = p + z2 / (2 * n)
    half = z * F.sqrt((p * (1 - p) + z2 / (4 * n)) / n)
    denom = 1 + z2 / n
    return counts.select(
        "n",
        "k",
        F.round(p, 6).alias("rate"),
        F.round((center - half) / denom, 6).alias("wilson_lo"),
        F.round((center + half) / denom, 6).alias("wilson_hi"),
    )


# ---------------------------------------------------------------------------
# Retention-curve exponential fit (log-linear decay rate)
# ---------------------------------------------------------------------------

_RETFIT_ORACLE = """
WITH days AS (
  SELECT user_id,
         DATE_DIFF('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d
  FROM events
),
weeks AS (
  SELECT user_id, CAST(FLOOR(d / 7) AS BIGINT) AS w FROM days
),
cohort AS (SELECT MIN(w) AS w0, COUNT(DISTINCT user_id) AS n0 FROM weeks),
activity AS (
  SELECT CAST(wk.w - c.w0 AS BIGINT) AS age,
         COUNT(DISTINCT wk.user_id) AS active
  FROM weeks wk CROSS JOIN cohort c
  GROUP BY age
),
pts AS (
  SELECT a.age AS x,
         CAST(ROUND(LN(a.active * 1000000.0 / c.n0) * 1000000) AS BIGINT)
           AS y_micro
  FROM activity a CROSS JOIN cohort c
  WHERE a.age >= 1
),
stats AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(y_micro) AS BIGINT) AS sy,
         CAST(SUM(x * y_micro) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx
  FROM pts
)
SELECT n AS n_weeks,
       ROUND((n * sxy - sx * sy)
             / CAST(n * sxx - sx * sx AS DOUBLE) / 1000000, 6)
         AS weekly_log_decay,
       ROUND((sy - CAST(n * sxy - sx * sy AS DOUBLE)
                   / (n * sxx - sx * sx) * sx) / n / 1000000, 6)
         AS log_intercept
FROM stats
"""


@register(
    "e_retention_curve_fit",
    oracle=_RETFIT_ORACLE,
    tags=("A3", "A1", "F3", "F2"),
)
def e_retention_curve_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential retention-curve fit: weekly active share by cohort
    age, fit as ln(retention) = a + b·age by OLS — `weekly_log_decay`
    (b) is the churn half-life in one number (half-life = ln2/|b|),
    the summary that turns `e_retention_cohorts`' matrix into a
    forecastable parameter. Week-0 is excluded (it is 100% by
    construction and would bias the fit).

    Determinism: retention ratios round to micro-nat logs at the LEAF
    (llm_text convention), so the OLS sufficient statistics are exact
    BIGINTs; the two closed-form divisions run on a 1-row frame.
    Scale: one distinct-user pass per (user, week), a 1-row cohort
    broadcast, then arithmetic on a weeks-sized rollup.
    """
    e = load_table(spark, sf_dir, "events")
    weeks = e.select(
        "user_id",
        F.floor(
            F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")) / 7
        )
        .cast("long")
        .alias("w"),
    ).dropDuplicates()
    cohort = weeks.agg(
        F.min("w").alias("w0"), F.countDistinct("user_id").alias("n0")
    )
    activity = (
        weeks.crossJoin(F.broadcast(cohort))
        .groupBy((F.col("w") - F.col("w0")).cast("long").alias("age"))
        .agg(
            F.countDistinct("user_id").alias("active"),
            F.max("n0").alias("n0"),
        )
    )
    pts = activity.filter(F.col("age") >= 1).select(
        F.col("age").alias("x"),
        F.round(
            F.log(F.col("active") * 1000000.0 / F.col("n0")) * 1000000
        )
        .cast("long")
        .alias("y_micro"),
    )
    stats = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y_micro").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y_micro")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    n, sx = F.col("n"), F.col("sx")
    slope_num = n * F.col("sxy") - sx * F.col("sy")
    slope_den = (n * F.col("sxx") - sx * sx).cast("double")
    return stats.select(
        n.alias("n_weeks"),
        F.round(slope_num / slope_den / 1000000, 6).alias("weekly_log_decay"),
        F.round(
            (F.col("sy") - slope_num.cast("double") / (n * F.col("sxx") - sx * sx) * sx)
            / n
            / 1000000,
            6,
        ).alias("log_intercept"),
    )


# ---------------------------------------------------------------------------
# Pairwise Pearson correlation matrix (one pass, long format)
# ---------------------------------------------------------------------------

_CORRMAT_ORACLE = """
WITH leaves AS (
  SELECT CAST(l_quantity AS BIGINT) AS q,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS p,
         CAST(ROUND(l_discount * 100) AS BIGINT) AS d,
         CAST(ROUND(l_tax * 100) AS BIGINT) AS t
  FROM lineitem
),
stats AS (
  SELECT COUNT(*) AS n,
         SUM(q) AS sq, SUM(p) AS sp, SUM(d) AS sd, SUM(t) AS st,
         SUM(q*q) AS sqq, SUM(p*p) AS spp,
         SUM(d*d) AS sdd, SUM(t*t) AS stt,
         SUM(q*p) AS sqp, SUM(q*d) AS sqd, SUM(q*t) AS sqt,
         SUM(p*d) AS spd, SUM(p*t) AS spt, SUM(d*t) AS sdt
  FROM leaves
),
pairs AS (
  SELECT 'discount' AS var_x, 'price' AS var_y,
         n, spd AS sxy, sd AS sx, sp AS sy, sdd AS sxx, spp AS syy
  FROM stats
  UNION ALL SELECT 'discount', 'quantity', n, sqd, sd, sq, sdd, sqq FROM stats
  UNION ALL SELECT 'discount', 'tax',      n, sdt, sd, st, sdd, stt FROM stats
  UNION ALL SELECT 'price',    'quantity', n, sqp, sp, sq, spp, sqq FROM stats
  UNION ALL SELECT 'price',    'tax',      n, spt, sp, st, spp, stt FROM stats
  UNION ALL SELECT 'quantity', 'tax',      n, sqt, sq, st, sqq, stt FROM stats
)
SELECT var_x, var_y, n,
       ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
             / (SQRT(CAST(n * sxx - sx * sx AS DOUBLE))
                * SQRT(CAST(n * syy - sy * sy AS DOUBLE))), 6) AS pearson_r
FROM pairs
ORDER BY var_x, var_y
"""


@register(
    "a_correlation_matrix",
    oracle=_CORRMAT_ORACLE,
    tags=("A8", "A1", "F3", "A2"),
)
def a_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full pairwise Pearson correlation matrix over four lineitem
    measures in ONE pass: fifteen exact-integer sufficient statistics
    (four sums, four sums-of-squares, six cross-products, one count)
    from a single combinable aggregate, then six output rows unpivoted
    via stack() and one float formula per row. The single-pass shape is
    the one that scales — a naive corr() per pair rescans the fact
    table six times; this scans once.

    Determinism: leaves are exact integers (quantity units, price
    cents, discount/tax percent points); sums accumulate as
    decimal(38,0) (Spark) / HUGEINT (DuckDB) because cents-squared
    sums exceed int64 near sf1; the Pearson numerator/denominators
    are computed in exact integer arithmetic and only the final ratio
    is evaluated in doubles, identically ordered on both engines."""
    li = load_table(spark, sf_dir, "lineitem")

    def dec(c: F.Column) -> F.Column:
        return c.cast("decimal(38,0)")

    q, p = F.col("q"), F.col("p")
    d, t = F.col("d"), F.col("t")
    leaves = li.select(
        F.col("l_quantity").cast("long").alias("q"),
        cents(F.col("l_extendedprice")).alias("p"),
        F.round(F.col("l_discount") * 100).cast("long").alias("d"),
        F.round(F.col("l_tax") * 100).cast("long").alias("t"),
    )
    stats = leaves.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec(q)).alias("sq"),
        F.sum(dec(p)).alias("sp"),
        F.sum(dec(d)).alias("sd"),
        F.sum(dec(t)).alias("st"),
        F.sum(dec(q * q)).alias("sqq"),
        F.sum(dec(p * p)).alias("spp"),
        F.sum(dec(d * d)).alias("sdd"),
        F.sum(dec(t * t)).alias("stt"),
        F.sum(dec(q * p)).alias("sqp"),
        F.sum(dec(q * d)).alias("sqd"),
        F.sum(dec(q * t)).alias("sqt"),
        F.sum(dec(p * d)).alias("spd"),
        F.sum(dec(p * t)).alias("spt"),
        F.sum(dec(d * t)).alias("sdt"),
    )
    pairs = stats.selectExpr(
        "n",
        """stack(6,
           'discount', 'price',    spd, sd, sp, sdd, spp,
           'discount', 'quantity', sqd, sd, sq, sdd, sqq,
           'discount', 'tax',      sdt, sd, st, sdd, stt,
           'price',    'quantity', sqp, sp, sq, spp, sqq,
           'price',    'tax',      spt, sp, st, spp, stt,
           'quantity', 'tax',      sqt, sq, st, sqq, stt
         ) AS (var_x, var_y, sxy, sx, sy, sxx, syy)""",
    )
    nd = F.col("n").cast("decimal(38,0)")
    num = nd * F.col("sxy") - F.col("sx") * F.col("sy")
    denx = nd * F.col("sxx") - F.col("sx") * F.col("sx")
    deny = nd * F.col("syy") - F.col("sy") * F.col("sy")
    return pairs.select(
        "var_x",
        "var_y",
        "n",
        F.round(
            num.cast("double")
            / (F.sqrt(denx.cast("double")) * F.sqrt(deny.cast("double"))),
            6,
        ).alias("pearson_r"),
    ).orderBy("var_x", "var_y")


# ---------------------------------------------------------------------------
# Rank-based propensity matching (ATT with matched controls)
# ---------------------------------------------------------------------------

_MATCHING_ORACLE = f"""
WITH per_user AS (
  SELECT user_id,
         (user_id * 2654435761) % 100 < 40 + (user_id % 3) * 10 AS treated,
         CAST(SUM(CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16'
                  THEN {CENTS_SQL.format(expr="value")} ELSE 0 END)
              AS BIGINT) AS x_pre,
         CAST(SUM(CASE WHEN CAST(ts AS DATE) >= DATE '2024-01-16'
                  THEN {CENTS_SQL.format(expr="value")} ELSE 0 END)
              AS BIGINT) AS y_post
  FROM events GROUP BY user_id
),
t AS (
  SELECT ROW_NUMBER() OVER (ORDER BY x_pre, user_id) AS rk, x_pre, y_post
  FROM per_user WHERE treated
),
c AS (
  SELECT ROW_NUMBER() OVER (ORDER BY x_pre, user_id) AS rk, x_pre, y_post
  FROM per_user WHERE NOT treated
)
SELECT COUNT(*) AS n_pairs,
       ROUND(CAST(SUM(t.y_post - c.y_post) AS DOUBLE) / COUNT(*) / 100, 6)
         AS att_dollars,
       ROUND(CAST(SUM(ABS(t.x_pre - c.x_pre)) AS DOUBLE) / COUNT(*) / 100, 6)
         AS mean_abs_covariate_gap_dollars,
       CAST(SUM(ABS(t.x_pre - c.x_pre)) AS BIGINT) AS total_gap_cents
FROM t JOIN c ON t.rk = c.rk
"""


@register(
    "e_propensity_rank_matching",
    oracle=_MATCHING_ORACLE,
    tags=("P6", "A1", "W1", "J1"),
)
def e_propensity_rank_matching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matched-pairs treatment-effect estimate: treated and control
    users are each ranked by the pre-period covariate and paired rank
    to rank — deterministic rank matching, the order-statistics
    cousin of greedy nearest-neighbor matching (which is inherently
    sequential and unreproducible in parallel). The ATT averages
    post-period outcome differences over pairs; the mean matched
    covariate gap is reported as the balance diagnostic a reviewer
    would demand. Completes the observational-causal family next to
    IPW (reweights) / CUPED (adjusts) / DiD (differences trends).

    Determinism/scale: the per-user rollup is one combinable groupBy
    in exact cents; each arm's ranking is a window over the USER
    rollup (bounded by users, not events — the heavy table never
    sorts); the pair join is equi on rank. The inner join drops
    unmatched tail ranks, exactly as 1:1 matching prescribes."""
    e = load_table(spark, sf_dir, "events")
    pre = F.when(
        F.col("ts").cast("date") < F.lit("2024-01-16").cast("date"),
        cents(F.col("value")),
    ).otherwise(0)
    post = F.when(
        F.col("ts").cast("date") >= F.lit("2024-01-16").cast("date"),
        cents(F.col("value")),
    ).otherwise(0)
    per_user = e.groupBy("user_id").agg(
        F.sum(pre).cast("long").alias("x_pre"),
        F.sum(post).cast("long").alias("y_post"),
    ).withColumn(
        "treated",
        (F.col("user_id") * 2654435761) % 100
        < 40 + (F.col("user_id") % 3) * 10,
    )
    w = Window.orderBy("x_pre", "user_id")
    t = (
        per_user.filter("treated")
        .select(F.row_number().over(w).alias("rk"), "x_pre", "y_post")
    )
    c = (
        per_user.filter("NOT treated")
        .select(F.row_number().over(w).alias("rk"), "x_pre", "y_post")
    )
    ta, ca = t.alias("t"), c.alias("c")
    pairs = ta.join(ca, "rk")
    return pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(
            F.sum(F.col("t.y_post") - F.col("c.y_post")).cast("double")
            / F.count(F.lit(1))
            / 100,
            6,
        ).alias("att_dollars"),
        F.round(
            F.sum(F.abs(F.col("t.x_pre") - F.col("c.x_pre"))).cast("double")
            / F.count(F.lit(1))
            / 100,
            6,
        ).alias("mean_abs_covariate_gap_dollars"),
        F.sum(F.abs(F.col("t.x_pre") - F.col("c.x_pre")))
        .cast("long")
        .alias("total_gap_cents"),
    )


# ---------------------------------------------------------------------------
# Mann-Whitney U rank-sum test (nonparametric A/B readout)
# ---------------------------------------------------------------------------

_MWU_ORACLE = f"""
WITH per_user AS (
  SELECT user_id,
         SUM({CENTS_SQL.format(expr="value")}) AS spend_cents,
         CASE WHEN (user_id * 48271) % 100 < 50 THEN 'A' ELSE 'B' END AS arm
  FROM events
  GROUP BY user_id
),
vals AS (
  SELECT spend_cents,
         COUNT(*) AS t,
         SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS t1
  FROM per_user
  GROUP BY spend_cents
),
ranked AS (
  SELECT t, t1,
         COALESCE(SUM(t) OVER (ORDER BY spend_cents
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS below
  FROM vals
),
agg AS (
  SELECT CAST(SUM(t1) AS BIGINT)                       AS n1,
         CAST(SUM(t) AS BIGINT)                        AS n,
         CAST(SUM(t1 * (2 * below + t + 1)) AS BIGINT) AS r1_x2,
         CAST(SUM(t * t * t - t) AS BIGINT)            AS tie_cube
  FROM ranked
),
u AS (
  SELECT n1, n - n1 AS n2, n, tie_cube,
         r1_x2 - n1 * (n1 + 1) AS u1_x2
  FROM agg
)
SELECT n1, n2, u1_x2,
       2 * n1 * n2 - u1_x2 AS u2_x2,
       ROUND((CAST(u1_x2 AS DOUBLE) - CAST(n1 * n2 AS DOUBLE))
             / (2 * SQRT(CAST(n1 AS DOUBLE) * n2 / 12.0
                * ((n + 1) - CAST(tie_cube AS DOUBLE)
                             / (CAST(n AS DOUBLE) * (n - 1))))), 6) AS z_stat
FROM u
"""


@register(
    "e_mann_whitney_u",
    oracle=_MWU_ORACLE,
    tags=("A1", "A2", "A7", "W3"),
)
def e_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test on per-user spend between two
    hash-assigned experiment arms — the nonparametric complement of
    `e_welch_ttest` for skewed revenue metrics, with the tie-corrected
    normal approximation.

    Scale design — the ranks are never materialized per row. Doubled
    average ranks of a tie group are exact integers (2*min_rank + t - 1
    where min_rank = below + 1), so the whole test reduces to sufficient
    statistics over the DISTINCT-VALUE rollup: one combinable per-user
    aggregation (the only shuffle of the fact), one combinable
    distinct-cents rollup, and one O(distinct values) cumulative window
    over that rollup — cardinality bounded by the money grid, not the
    user count. U1 + U2 == n1*n2 by construction (both emitted, the
    oracle pins the identity). The z denominator applies the standard
    tie correction Σ(t³-t)/(n(n-1)); all inputs to the one float
    expression are exact BIGINTs, so the round-6 double matches DuckDB
    bit-for-bit."""
    e = load_table(spark, sf_dir, "events")
    per_user = (
        e.groupBy("user_id")
        .agg(F.sum(cents(F.col("value"))).alias("spend_cents"))
        .withColumn(
            "arm",
            F.when((F.col("user_id") * 48271) % 100 < 50, "A").otherwise("B"),
        )
    )
    vals = per_user.groupBy("spend_cents").agg(
        F.count(F.lit(1)).alias("t"),
        F.sum(F.when(F.col("arm") == "A", 1).otherwise(0)).alias("t1"),
    )
    w = Window.orderBy("spend_cents").rowsBetween(Window.unboundedPreceding, -1)
    ranked = vals.select(
        "t", "t1", F.coalesce(F.sum("t").over(w), F.lit(0)).alias("below")
    )
    agg = ranked.agg(
        F.sum("t1").alias("n1"),
        F.sum("t").alias("n"),
        F.sum(F.col("t1") * (2 * F.col("below") + F.col("t") + 1)).alias("r1_x2"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")).alias("tie_cube"),
    )
    u = agg.select(
        "n1",
        (F.col("n") - F.col("n1")).alias("n2"),
        "n",
        "tie_cube",
        (F.col("r1_x2") - F.col("n1") * (F.col("n1") + 1)).alias("u1_x2"),
    )
    n1d = F.col("n1").cast("double")
    nd = F.col("n").cast("double")
    return u.select(
        "n1",
        "n2",
        "u1_x2",
        (2 * F.col("n1") * F.col("n2") - F.col("u1_x2")).alias("u2_x2"),
        F.round(
            (F.col("u1_x2").cast("double") - (F.col("n1") * F.col("n2")).cast("double"))
            / (
                2
                * F.sqrt(
                    n1d
                    * F.col("n2")
                    / 12.0
                    * (
                        (F.col("n") + 1)
                        - F.col("tie_cube").cast("double")
                        / (nd * (F.col("n") - 1))
                    )
                )
            ),
            6,
        ).alias("z_stat"),
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
# Two-feature OLS via exact normal equations (multiple regression in SQL)
# ---------------------------------------------------------------------------

_OLS2_ORACLE = f"""
WITH obs AS (
  SELECT {CENTS_SQL.format(expr="l_extendedprice")}        AS y,
         CAST(ROUND(l_quantity) AS BIGINT)                 AS x1,
         CAST(ROUND(l_discount * 100) AS BIGINT)           AS x2
  FROM lineitem
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT)      AS n,
         CAST(SUM(x1) AS BIGINT)       AS sx1,
         CAST(SUM(x2) AS BIGINT)       AS sx2,
         CAST(SUM(y) AS BIGINT)        AS sy,
         CAST(SUM(x1 * x1) AS BIGINT)  AS sx1x1,
         CAST(SUM(x2 * x2) AS BIGINT)  AS sx2x2,
         CAST(SUM(x1 * x2) AS BIGINT)  AS sx1x2,
         CAST(SUM(x1 * y) AS BIGINT)   AS sx1y,
         CAST(SUM(x2 * y) AS BIGINT)   AS sx2y,
         CAST(SUM(CAST(y AS DECIMAL(38,0)) * y) AS DECIMAL(38,0)) AS syy
  FROM obs
),
m AS (
  SELECT n, sx1, sx2, sy,
         CAST(n AS DOUBLE) * sx1x1 - CAST(sx1 AS DOUBLE) * sx1 AS s11,
         CAST(n AS DOUBLE) * sx1x2 - CAST(sx1 AS DOUBLE) * sx2 AS s12,
         CAST(n AS DOUBLE) * sx2x2 - CAST(sx2 AS DOUBLE) * sx2 AS s22,
         CAST(n AS DOUBLE) * sx1y  - CAST(sx1 AS DOUBLE) * sy  AS sy1,
         CAST(n AS DOUBLE) * sx2y  - CAST(sx2 AS DOUBLE) * sy  AS sy2,
         CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
           - CAST(sy AS DOUBLE) * sy                           AS syy_c
  FROM s
)
SELECT n,
       ROUND((s22 * sy1 - s12 * sy2) / (s11 * s22 - s12 * s12) / 100, 6)
         AS b_qty_dollars,
       ROUND((s11 * sy2 - s12 * sy1) / (s11 * s22 - s12 * s12) / 100, 6)
         AS b_disc_dollars,
       ROUND((CAST(sy AS DOUBLE)
              - (s22 * sy1 - s12 * sy2) / (s11 * s22 - s12 * s12) * sx1
              - (s11 * sy2 - s12 * sy1) / (s11 * s22 - s12 * s12) * sx2)
             / n / 100, 6) AS b0_dollars,
       ROUND(((s22 * sy1 - s12 * sy2) / (s11 * s22 - s12 * s12) * sy1
              + (s11 * sy2 - s12 * sy1) / (s11 * s22 - s12 * s12) * sy2)
             / syy_c, 6) AS r2
FROM m
"""


@register(
    "a_ols_two_feature",
    oracle=_OLS2_ORACLE,
    tags=("A1", "A2", "F3"),
)
def a_ols_two_feature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple regression in pure SQL: price ~ quantity + discount fit
    by the closed-form 2-feature normal equations (Cramer's rule on the
    centered cross-product matrix), with R² — the "small model, huge
    data" shape where the FIT is one combinable aggregation and only
    the 3x3 solve is scalar math.

    Scale design — one pass accumulates the 10 sufficient statistics as
    exact BIGINTs (x1 ≤ 50, x2 ≤ 10 keep cross-products far from
    overflow through sf100; Σy² alone is DECIMAL(38,0) because cents²
    ~1e14/row). The centered moments and the solve then run in DOUBLE
    with identical expression trees on both engines — deterministic
    because every operand derives from exact integers, not from
    float accumulation order."""
    li = load_table(spark, sf_dir, "lineitem")
    obs = li.select(
        cents(F.col("l_extendedprice")).alias("y"),
        F.round(F.col("l_quantity")).cast("long").alias("x1"),
        F.round(F.col("l_discount") * 100).cast("long").alias("x2"),
    )
    s = obs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x1").alias("sx1"),
        F.sum("x2").alias("sx2"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x1") * F.col("x1")).alias("sx1x1"),
        F.sum(F.col("x2") * F.col("x2")).alias("sx2x2"),
        F.sum(F.col("x1") * F.col("x2")).alias("sx1x2"),
        F.sum(F.col("x1") * F.col("y")).alias("sx1y"),
        F.sum(F.col("x2") * F.col("y")).alias("sx2y"),
        F.sum(F.col("y").cast("decimal(38,0)") * F.col("y")).alias("syy"),
    )
    nd = F.col("n").cast("double")
    m = s.select(
        "n",
        "sx1",
        "sx2",
        "sy",
        (nd * F.col("sx1x1") - F.col("sx1").cast("double") * F.col("sx1")).alias("s11"),
        (nd * F.col("sx1x2") - F.col("sx1").cast("double") * F.col("sx2")).alias("s12"),
        (nd * F.col("sx2x2") - F.col("sx2").cast("double") * F.col("sx2")).alias("s22"),
        (nd * F.col("sx1y") - F.col("sx1").cast("double") * F.col("sy")).alias("sy1"),
        (nd * F.col("sx2y") - F.col("sx2").cast("double") * F.col("sy")).alias("sy2"),
        (nd * F.col("syy").cast("double") - F.col("sy").cast("double") * F.col("sy")).alias(
            "syy_c"
        ),
    )
    det = F.col("s11") * F.col("s22") - F.col("s12") * F.col("s12")
    b1 = (F.col("s22") * F.col("sy1") - F.col("s12") * F.col("sy2")) / det
    b2 = (F.col("s11") * F.col("sy2") - F.col("s12") * F.col("sy1")) / det
    return m.select(
        "n",
        F.round(b1 / 100, 6).alias("b_qty_dollars"),
        F.round(b2 / 100, 6).alias("b_disc_dollars"),
        F.round(
            (F.col("sy").cast("double") - b1 * F.col("sx1") - b2 * F.col("sx2"))
            / F.col("n")
            / 100,
            6,
        ).alias("b0_dollars"),
        F.round((b1 * F.col("sy1") + b2 * F.col("sy2")) / F.col("syy_c"), 6).alias(
            "r2"
        ),
    )


# ---------------------------------------------------------------------------
# Cohen's kappa inter-rater agreement
# ---------------------------------------------------------------------------

_KAPPA_ORACLE = """
WITH rated AS (
  SELECT CASE WHEN n_chars >= 500 THEN 1 ELSE 0 END AS r1,
         CASE WHEN LEN(STRING_SPLIT(text, ' ')) >= 80 THEN 1 ELSE 0 END AS r2
  FROM documents
),
conf AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(r1 * r2) AS BIGINT)                   AS n11,
         CAST(SUM(r1 * (1 - r2)) AS BIGINT)             AS n10,
         CAST(SUM((1 - r1) * r2) AS BIGINT)             AS n01,
         CAST(SUM((1 - r1) * (1 - r2)) AS BIGINT)       AS n00
  FROM rated
)
SELECT n, n11, n10, n01, n00,
       ROUND(CAST(n11 + n00 AS DOUBLE) / n, 6) AS po,
       ROUND((CAST(n11 + n10 AS DOUBLE) * (n11 + n01)
              + CAST(n01 + n00 AS DOUBLE) * (n10 + n00))
             / (CAST(n AS DOUBLE) * n), 6) AS pe,
       ROUND((CAST(n11 + n00 AS DOUBLE) / n
              - (CAST(n11 + n10 AS DOUBLE) * (n11 + n01)
                 + CAST(n01 + n00 AS DOUBLE) * (n10 + n00))
                / (CAST(n AS DOUBLE) * n))
             / (1 - (CAST(n11 + n10 AS DOUBLE) * (n11 + n01)
                     + CAST(n01 + n00 AS DOUBLE) * (n10 + n00))
                    / (CAST(n AS DOUBLE) * n)), 6) AS kappa
FROM conf
"""


@register(
    "a_cohens_kappa",
    oracle=_KAPPA_ORACLE,
    tags=("A2", "A7", "P6", "N5"),
)
def a_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two deterministic document-quality
    'raters' (char-length vs token-count thresholds) — the
    chance-corrected agreement statistic every labeling/eval pipeline
    reports before trusting its annotations. The two raters here are
    correlated by construction (long docs have many tokens), so kappa
    lands well above 0 and the query demonstrates exactly why raw
    agreement (po) overstates reliability.

    Scale design — kappa is four confusion counts: one combinable
    aggregation over the fact computes n11/n10/n01/n00 as exact
    BIGINTs (the rater functions are row-local), and po/pe/kappa are
    one fixed float expression per output value, identical trees both
    engines, round-6. No shuffle beyond the single global rollup."""
    d = load_table(spark, sf_dir, "documents")
    rated = d.select(
        F.when(F.col("n_chars") >= 500, 1).otherwise(0).alias("r1"),
        F.when(F.size(F.split(F.col("text"), " ")) >= 80, 1)
        .otherwise(0)
        .alias("r2"),
    )
    conf = rated.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("r1") * F.col("r2")).alias("n11"),
        F.sum(F.col("r1") * (1 - F.col("r2"))).alias("n10"),
        F.sum((1 - F.col("r1")) * F.col("r2")).alias("n01"),
        F.sum((1 - F.col("r1")) * (1 - F.col("r2"))).alias("n00"),
    )
    n = F.col("n")
    po = (F.col("n11") + F.col("n00")).cast("double") / n
    pe = (
        (F.col("n11") + F.col("n10")).cast("double") * (F.col("n11") + F.col("n01"))
        + (F.col("n01") + F.col("n00")).cast("double") * (F.col("n10") + F.col("n00"))
    ) / (n.cast("double") * n)
    return conf.select(
        "n",
        "n11",
        "n10",
        "n01",
        "n00",
        F.round(po, 6).alias("po"),
        F.round(pe, 6).alias("pe"),
        F.round((po - pe) / (1 - pe), 6).alias("kappa"),
    )


# ---------------------------------------------------------------------------
# Delta-method CI for a ratio metric (clicks per view), per experiment arm
# ---------------------------------------------------------------------------

_RATIO_CI_ORACLE = """
WITH per_user AS (
  SELECT user_id,
         CASE WHEN (user_id * 48271) % 100 < 50 THEN 'A' ELSE 'B' END AS arm,
         CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT)
           AS x,
         CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT)
           AS y
  FROM events
  GROUP BY user_id
),
s AS (
  SELECT arm,
         CAST(COUNT(*) AS BIGINT)     AS n,
         CAST(SUM(x) AS BIGINT)       AS sx,
         CAST(SUM(y) AS BIGINT)       AS sy,
         CAST(SUM(x * x) AS BIGINT)   AS sxx,
         CAST(SUM(y * y) AS BIGINT)   AS syy,
         CAST(SUM(x * y) AS BIGINT)   AS sxy
  FROM per_user
  GROUP BY arm
)
SELECT arm, n, sx, sy,
       ROUND(CAST(sx AS DOUBLE) / sy, 6) AS ratio,
       ROUND(SQRT(((sxx - CAST(sx AS DOUBLE) * sx / n) / (n - 1)
              - 2 * (CAST(sx AS DOUBLE) / sy)
                  * ((sxy - CAST(sx AS DOUBLE) * sy / n) / (n - 1))
              + (CAST(sx AS DOUBLE) / sy) * (CAST(sx AS DOUBLE) / sy)
                  * ((syy - CAST(sy AS DOUBLE) * sy / n) / (n - 1)))
             / n) / (CAST(sy AS DOUBLE) / n), 6) AS se,
       ROUND(CAST(sx AS DOUBLE) / sy
             - 1.959964 * SQRT(((sxx - CAST(sx AS DOUBLE) * sx / n) / (n - 1)
              - 2 * (CAST(sx AS DOUBLE) / sy)
                  * ((sxy - CAST(sx AS DOUBLE) * sy / n) / (n - 1))
              + (CAST(sx AS DOUBLE) / sy) * (CAST(sx AS DOUBLE) / sy)
                  * ((syy - CAST(sy AS DOUBLE) * sy / n) / (n - 1)))
             / n) / (CAST(sy AS DOUBLE) / n), 6) AS ci_lo,
       ROUND(CAST(sx AS DOUBLE) / sy
             + 1.959964 * SQRT(((sxx - CAST(sx AS DOUBLE) * sx / n) / (n - 1)
              - 2 * (CAST(sx AS DOUBLE) / sy)
                  * ((sxy - CAST(sx AS DOUBLE) * sy / n) / (n - 1))
              + (CAST(sx AS DOUBLE) / sy) * (CAST(sx AS DOUBLE) / sy)
                  * ((syy - CAST(sy AS DOUBLE) * sy / n) / (n - 1)))
             / n) / (CAST(sy AS DOUBLE) / n), 6) AS ci_hi
FROM s
ORDER BY arm
"""


@register(
    "e_ratio_delta_method_ci",
    oracle=_RATIO_CI_ORACLE,
    tags=("A1", "A7", "P6"),
)
def e_ratio_delta_method_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-method confidence interval for a RATIO metric
    (clicks-per-view) per experiment arm — the correct inference when
    the randomization unit (user) differs from the metric's numerator/
    denominator events, where a naive binomial CI is simply wrong.
    Var(x̄/ȳ) ≈ (σx² − 2Rσxy + R²σy²) / (n·ȳ²) with R = Σx/Σy; the
    z-multiplier is the pre-rounded literal 1.959964 on both engines
    (no inverse-normal function runs at query time).

    Scale design — one combinable per-user aggregation (the only
    shuffle of the fact), then a 2-row arm rollup of exact BIGINT
    sufficient statistics (n, Σx, Σy, Σx², Σy², Σxy). The delta-method
    formula is one fixed expression tree per output column over those
    integers — bit-stable, round-6."""
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("x"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("y"),
    ).withColumn(
        "arm",
        F.when((F.col("user_id") * 48271) % 100 < 50, "A").otherwise("B"),
    )
    s = per_user.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n = F.col("n")
    ratio = F.col("sx").cast("double") / F.col("sy")
    var_x = (F.col("sxx") - F.col("sx").cast("double") * F.col("sx") / n) / (n - 1)
    cov_xy = (F.col("sxy") - F.col("sx").cast("double") * F.col("sy") / n) / (n - 1)
    var_y = (F.col("syy") - F.col("sy").cast("double") * F.col("sy") / n) / (n - 1)
    se = F.sqrt((var_x - 2 * ratio * cov_xy + ratio * ratio * var_y) / n) / (
        F.col("sy").cast("double") / n
    )
    return s.select(
        "arm",
        "n",
        "sx",
        "sy",
        F.round(ratio, 6).alias("ratio"),
        F.round(se, 6).alias("se"),
        F.round(ratio - 1.959964 * se, 6).alias("ci_lo"),
        F.round(ratio + 1.959964 * se, 6).alias("ci_hi"),
    ).orderBy("arm")


# ---------------------------------------------------------------------------
# One-way ANOVA F-test across return flags
# ---------------------------------------------------------------------------

_ANOVA_ORACLE = f"""
WITH g AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS BIGINT) AS n_g,
         CAST(SUM({CENTS_SQL.format(expr="l_extendedprice")}) AS BIGINT) AS s_g,
         CAST(SUM(CAST({CENTS_SQL.format(expr="l_extendedprice")}
                        AS DECIMAL(38,0))
                  * {CENTS_SQL.format(expr="l_extendedprice")})
              AS DECIMAL(38,0)) AS ss_g
  FROM lineitem
  GROUP BY l_returnflag
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(n_g) AS BIGINT) AS n,
         CAST(SUM(s_g) AS BIGINT) AS s,
         CAST(SUM(ss_g) AS DECIMAL(38,0)) AS ss,
         SUM(CAST(s_g AS DOUBLE) * s_g / n_g) AS sum_sq_over_n
  FROM g
)
SELECT k, n,
       ROUND((sum_sq_over_n - CAST(s AS DOUBLE) * s / n)
             / (CAST(ss AS DOUBLE) - sum_sq_over_n)
             * (n - k) / (k - 1), 6) AS f_stat,
       ROUND((sum_sq_over_n - CAST(s AS DOUBLE) * s / n)
             / (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n), 6)
         AS eta_squared
FROM tot
"""


@register(
    "a_oneway_anova_f",
    oracle=_ANOVA_ORACLE,
    tags=("A1", "A2", "F3"),
)
def a_oneway_anova_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F-statistic for price across the three return
    flags, with η² effect size — the k-group generalization of the
    two-arm t-test (`e_welch_ttest`); the between/within sum-of-squares
    decomposition IS the sufficient-statistics discipline: SSB and SSW
    both derive from per-group (n, Σy, Σy²).

    Scale design — one combinable groupBy(flag) collects exact
    integer-cents statistics (Σy² in DECIMAL(38,0): cents² ~1e14/row
    overflows BIGINT beyond ~sf0.5); the 3-row rollup and the F/η²
    formulas run once, identical float expression trees both engines,
    round-6. The per-group Σ²/n fold is the only mixed-type sum and is
    summed over exactly k=3 rows in a fixed groupwise order-independent
    way (addition of 3 doubles from exact ints — commutative set is
    tiny and DuckDB/Spark both reduce over the same 3 values; the
    round-6 absorbs any ordering ulp)."""
    li = load_table(spark, sf_dir, "lineitem")
    y = cents(F.col("l_extendedprice"))
    g = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_g"),
        F.sum(y).alias("s_g"),
        F.sum(y.cast("decimal(38,0)") * y).alias("ss_g"),
    )
    tot = g.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n_g").alias("n"),
        F.sum("s_g").alias("s"),
        F.sum("ss_g").alias("ss"),
        F.sum(F.col("s_g").cast("double") * F.col("s_g") / F.col("n_g")).alias(
            "sum_sq_over_n"
        ),
    )
    ssb = F.col("sum_sq_over_n") - F.col("s").cast("double") * F.col("s") / F.col("n")
    ssw = F.col("ss").cast("double") - F.col("sum_sq_over_n")
    sst = F.col("ss").cast("double") - F.col("s").cast("double") * F.col("s") / F.col(
        "n"
    )
    return tot.select(
        "k",
        "n",
        F.round(ssb / ssw * (F.col("n") - F.col("k")) / (F.col("k") - 1), 6).alias(
            "f_stat"
        ),
        F.round(ssb / sst, 6).alias("eta_squared"),
    )


# ---------------------------------------------------------------------------
# Mutual information of a 2-D feature histogram (micro-nat ladder)
# ---------------------------------------------------------------------------

_MI_ORACLE = """
WITH feat AS (
  SELECT n_chars // 200 AS xb,
         LEN(STRING_SPLIT(text, ' ')) // 40 AS yb
  FROM documents
),
cells AS (
  SELECT xb, yb, CAST(COUNT(*) AS BIGINT) AS c FROM feat GROUP BY xb, yb
),
mx AS (SELECT xb, CAST(SUM(c) AS BIGINT) AS cx FROM cells GROUP BY xb),
my AS (SELECT yb, CAST(SUM(c) AS BIGINT) AS cy FROM cells GROUP BY yb),
n AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cells),
terms AS (
  SELECT cells.xb, cells.yb,
         CAST(ROUND(CAST(c AS DOUBLE) / n.n
              * LN(CAST(c AS DOUBLE) * n.n / (CAST(cx AS DOUBLE) * cy))
              * 1000000) AS BIGINT) AS mi_term_micro
  FROM cells
  JOIN mx USING (xb) JOIN my USING (yb) CROSS JOIN n
),
hx AS (
  SELECT CAST(SUM(CAST(ROUND(-(CAST(cx AS DOUBLE) / n.n)
              * LN(CAST(cx AS DOUBLE) / n.n) * 1000000) AS BIGINT)) AS BIGINT)
           AS hx_micro
  FROM mx CROSS JOIN n
),
hy AS (
  SELECT CAST(SUM(CAST(ROUND(-(CAST(cy AS DOUBLE) / n.n)
              * LN(CAST(cy AS DOUBLE) / n.n) * 1000000) AS BIGINT)) AS BIGINT)
           AS hy_micro
  FROM my CROSS JOIN n
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM cells) AS n_cells,
       (SELECT n FROM n) AS n_docs,
       CAST(SUM(mi_term_micro) AS BIGINT) AS mi_micro_nats,
       (SELECT hx_micro FROM hx) AS hx_micro_nats,
       (SELECT hy_micro FROM hy) AS hy_micro_nats
FROM terms
"""


@register(
    "a_mutual_information_2d",
    oracle=_MI_ORACLE,
    tags=("A1", "A3", "N5"),
)
def a_mutual_information_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between two document features (char-length
    bucket × token-count bucket), with both marginal entropies — the
    feature-redundancy detector for curation pipelines (MI ≈ min(H)
    means one feature is the other in disguise; MI ≈ 0 means they
    filter independently).

    Float-determinism recipe (the n_char_entropy contract): each
    histogram cell contributes p·ln(p·N²/(cx·cy)) ROUNDED TO INTEGER
    MICRO-NATS before summation, so the only float op per cell is one
    fixed expression over exact BIGINT counts and the aggregation is
    an order-free integer sum. Scale: one combinable 2-D histogram
    rollup (cells bounded by the bucket grid, not the corpus), marginals
    re-aggregated FROM the cells (no second pass over the fact), both
    broadcast back onto cells."""
    d = load_table(spark, sf_dir, "documents")
    feat = d.select(
        F.expr("n_chars DIV 200").alias("xb"),
        F.expr("size(split(text, ' ')) DIV 40").alias("yb"),
    )
    cells = feat.groupBy("xb", "yb").agg(F.count(F.lit(1)).alias("c"))
    mx = cells.groupBy("xb").agg(F.sum("c").alias("cx"))
    my = cells.groupBy("yb").agg(F.sum("c").alias("cy"))
    n = cells.agg(F.sum("c").alias("n"))
    terms = (
        cells.join(broadcast(mx), "xb")
        .join(broadcast(my), "yb")
        .crossJoin(broadcast(n))
        .select(
            F.round(
                F.col("c").cast("double")
                / F.col("n")
                * F.log(
                    F.col("c").cast("double")
                    * F.col("n")
                    / (F.col("cx").cast("double") * F.col("cy"))
                )
                * 1000000
            )
            .cast("long")
            .alias("mi_term_micro")
        )
    )
    hx = (
        mx.crossJoin(broadcast(n))
        .select(
            F.round(
                -(F.col("cx").cast("double") / F.col("n"))
                * F.log(F.col("cx").cast("double") / F.col("n"))
                * 1000000
            )
            .cast("long")
            .alias("t")
        )
        .agg(F.sum("t").cast("long").alias("hx_micro_nats"))
    )
    hy = (
        my.crossJoin(broadcast(n))
        .select(
            F.round(
                -(F.col("cy").cast("double") / F.col("n"))
                * F.log(F.col("cy").cast("double") / F.col("n"))
                * 1000000
            )
            .cast("long")
            .alias("t")
        )
        .agg(F.sum("t").cast("long").alias("hy_micro_nats"))
    )
    n_cells = cells.agg(F.count(F.lit(1)).alias("n_cells"))
    return (
        terms.agg(F.sum("mi_term_micro").cast("long").alias("mi_micro_nats"))
        .crossJoin(broadcast(n_cells))
        .crossJoin(broadcast(n.select(F.col("n").alias("n_docs"))))
        .crossJoin(broadcast(hx))
        .crossJoin(broadcast(hy))
        .select(
            "n_cells", "n_docs", "mi_micro_nats", "hx_micro_nats", "hy_micro_nats"
        )
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
# SPRT sequential experiment monitoring (integer micro-nat LLR walk)
# ---------------------------------------------------------------------------

# ln(p1/p0), ln((1-p1)/(1-p0)) for H0: p=0.50 vs H1: p=0.55, and the
# Wald boundaries ln((1-b)/a), ln(b/(1-a)) at a=b=0.05 — pre-rounded
# micro-nat literals so no transcendental runs at query time.
_SPRT_L1 = 95310    # round(ln(0.55/0.50) * 1e6)
_SPRT_L0 = -105361  # round(ln(0.45/0.50) * 1e6)
_SPRT_A = 2944439   # round(ln(19) * 1e6)
_SPRT_B = -2944439  # round(ln(1/19) * 1e6)

_SPRT_ORACLE = f"""
WITH trials AS (
  SELECT user_id,
         MIN(CAST(ts AS DATE)) AS day,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
  FROM events
  GROUP BY user_id
),
daily AS (
  SELECT day,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(converted) AS BIGINT) AS k
  FROM trials GROUP BY day
),
walk AS (
  SELECT day,
         CAST(SUM(k) OVER w AS BIGINT) AS k_cum,
         CAST(SUM(n) OVER w AS BIGINT) AS n_cum,
         CAST(SUM(k) OVER w AS BIGINT) * {_SPRT_L1}
           + (CAST(SUM(n) OVER w AS BIGINT) - CAST(SUM(k) OVER w AS BIGINT))
             * {_SPRT_L0} AS llr_micro
  FROM daily
  WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
crossing AS (
  SELECT MIN(CASE WHEN llr_micro >= {_SPRT_A} THEN day END) AS first_h1_day,
         MIN(CASE WHEN llr_micro <= {_SPRT_B} THEN day END) AS first_h0_day
  FROM walk
),
final AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(MAX(n_cum) AS BIGINT) AS total_trials,
         CAST(MAX(k_cum) AS BIGINT) AS total_conversions
  FROM walk
)
SELECT f.n_days, f.total_trials, f.total_conversions,
       (SELECT CAST(llr_micro AS BIGINT) FROM walk
         ORDER BY day DESC LIMIT 1) AS final_llr_micro,
       CAST(COALESCE(DATEDIFF('day', DATE '1970-01-01', c.first_h1_day), -1)
            AS BIGINT) AS first_h1_epoch_day,
       CAST(COALESCE(DATEDIFF('day', DATE '1970-01-01', c.first_h0_day), -1)
            AS BIGINT) AS first_h0_epoch_day,
       CASE WHEN c.first_h1_day IS NOT NULL
                 AND (c.first_h0_day IS NULL OR c.first_h1_day <= c.first_h0_day)
              THEN 'accept_h1'
            WHEN c.first_h0_day IS NOT NULL THEN 'accept_h0'
            ELSE 'continue' END AS decision
FROM final f CROSS JOIN crossing c
"""


@register(
    "e_sprt_sequential_test",
    oracle=_SPRT_ORACLE,
    tags=("W3", "A1", "F2"),
)
def e_sprt_sequential_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald SPRT sequential monitoring of a conversion rate (H0: 50%
    vs H1: 55%, α=β=0.05): the cumulative log-likelihood-ratio walk by
    cohort day, the first boundary crossing, and the decision — the
    always-valid alternative to fixed-horizon testing that lets an
    experiment stop the day the evidence suffices.

    Determinism — the walk is EXACT INTEGER arithmetic end to end: the
    two per-trial log-likelihood increments and both Wald boundaries
    are pre-rounded micro-nat literals (no ln at query time), so
    LLR_t = k_t·L1 + (n_t−k_t)·L0 is a BIGINT and the crossing day is
    an exact comparison. Scale — one combinable per-user reduction
    (the only shuffle of the fact), a calendar-bounded daily rollup,
    and one O(days) cumulative window."""
    e = load_table(spark, sf_dir, "events")
    trials = e.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("day"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "converted"
        ),
    )
    daily = trials.groupBy("day").agg(
        F.count(F.lit(1)).alias("n"), F.sum("converted").alias("k")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    walk = daily.select(
        "day",
        F.sum("k").over(w).alias("k_cum"),
        F.sum("n").over(w).alias("n_cum"),
        (
            F.sum("k").over(w) * _SPRT_L1
            + (F.sum("n").over(w) - F.sum("k").over(w)) * _SPRT_L0
        ).alias("llr_micro"),
    )
    crossing = walk.agg(
        F.min(F.when(F.col("llr_micro") >= _SPRT_A, F.col("day"))).alias(
            "first_h1_day"
        ),
        F.min(F.when(F.col("llr_micro") <= _SPRT_B, F.col("day"))).alias(
            "first_h0_day"
        ),
    )
    final = walk.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.max("n_cum").alias("total_trials"),
        F.max("k_cum").alias("total_conversions"),
    )
    last_llr = (
        walk.orderBy(F.col("day").desc())
        .limit(1)
        .select(F.col("llr_micro").cast("long").alias("final_llr_micro"))
    )
    epoch = F.lit("1970-01-01").cast("date")
    return (
        final.crossJoin(broadcast(crossing))
        .crossJoin(broadcast(last_llr))
        .select(
            "n_days",
            "total_trials",
            "total_conversions",
            "final_llr_micro",
            F.coalesce(F.datediff(F.col("first_h1_day"), epoch), F.lit(-1))
            .cast("long")
            .alias("first_h1_epoch_day"),
            F.coalesce(F.datediff(F.col("first_h0_day"), epoch), F.lit(-1))
            .cast("long")
            .alias("first_h0_epoch_day"),
            F.when(
                F.col("first_h1_day").isNotNull()
                & (
                    F.col("first_h0_day").isNull()
                    | (F.col("first_h1_day") <= F.col("first_h0_day"))
                ),
                "accept_h1",
            )
            .when(F.col("first_h0_day").isNotNull(), "accept_h0")
            .otherwise("continue")
            .alias("decision"),
        )
    )


# ---------------------------------------------------------------------------
# Empirical-Bayes shrinkage of per-brand return rates (ranking low-n fairly)
# ---------------------------------------------------------------------------

_EB_SHRINK_ORACLE = """
WITH per_brand AS (
  SELECT p_brand,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
           AS k
  FROM lineitem JOIN part ON p_partkey = l_partkey
  GROUP BY p_brand
),
global AS (
  SELECT CAST(SUM(k) AS BIGINT) AS k_tot, CAST(SUM(n) AS BIGINT) AS n_tot
  FROM per_brand
),
scored AS (
  SELECT p_brand, n, k,
         k * 1000000 // n AS raw_ppm,
         ROUND((k + 20.0 * k_tot / n_tot) / (n + 20.0) * 1000000, 6)
           AS shrunk_ppm
  FROM per_brand CROSS JOIN global
)
SELECT p_brand, n, k, raw_ppm, shrunk_ppm,
       CAST(ROW_NUMBER() OVER (ORDER BY raw_ppm DESC, p_brand) AS BIGINT)
         AS rank_raw,
       CAST(ROW_NUMBER() OVER (ORDER BY shrunk_ppm DESC, p_brand) AS BIGINT)
         AS rank_shrunk
FROM scored
ORDER BY p_brand
"""


@register(
    "a_empirical_bayes_shrinkage",
    oracle=_EB_SHRINK_ORACLE,
    tags=("A1", "A7", "W1", "J1"),
)
def a_empirical_bayes_shrinkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes (Beta-binomial) shrinkage of per-brand return
    rates: each brand's rate pulls toward the global prior with
    strength α=20 pseudo-observations — the ranking fix for the
    classic small-n pathology where a brand with 2 returns out of 3
    items tops the raw leaderboard. Both rankings are emitted so the
    rank churn IS the output: rows where rank_raw and rank_shrunk
    disagree are exactly the low-evidence entries the shrinkage
    demoted.

    Determinism & scale — one combinable join+rollup produces exact
    (n, k) per brand; the global prior is a 1-row broadcast; the
    shrunk rate is one fixed float expression (α literal, round-6);
    both rank windows run over the |brands|-row rollup. At 100 TB
    nothing beyond the first rollup touches the fact."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    per_brand = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("k"),
        )
    )
    g = per_brand.agg(
        F.sum("k").alias("k_tot"), F.sum("n").alias("n_tot")
    )
    scored = per_brand.crossJoin(broadcast(g)).select(
        "p_brand",
        "n",
        "k",
        F.expr("k * 1000000 DIV n").alias("raw_ppm"),
        F.round(
            (F.col("k") + 20.0 * F.col("k_tot") / F.col("n_tot"))
            / (F.col("n") + 20.0)
            * 1000000,
            6,
        ).alias("shrunk_ppm"),
    )
    return scored.select(
        "p_brand",
        "n",
        "k",
        "raw_ppm",
        "shrunk_ppm",
        F.row_number()
        .over(Window.orderBy(F.col("raw_ppm").desc(), F.col("p_brand")))
        .cast("long")
        .alias("rank_raw"),
        F.row_number()
        .over(Window.orderBy(F.col("shrunk_ppm").desc(), F.col("p_brand")))
        .cast("long")
        .alias("rank_shrunk"),
    ).orderBy("p_brand")


# ---------------------------------------------------------------------------
# Simpson's paradox detector (aggregate vs stratified sign disagreement)
# ---------------------------------------------------------------------------

_SIMPSON_ORACLE = """
WITH labeled AS (
  SELECT CASE WHEN l_discount >= 0.05 THEN 'high_disc' ELSE 'low_disc' END
           AS arm,
         CAST(ROUND(l_quantity) AS BIGINT) // 10 AS qty_stratum,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS ret
  FROM lineitem
),
overall AS (
  SELECT CAST(SUM(CASE WHEN arm = 'high_disc' THEN ret ELSE 0 END) AS BIGINT)
           * 1000000
           // CAST(SUM(CASE WHEN arm = 'high_disc' THEN 1 ELSE 0 END) AS BIGINT)
           AS rate_high_ppm,
         CAST(SUM(CASE WHEN arm = 'low_disc' THEN ret ELSE 0 END) AS BIGINT)
           * 1000000
           // CAST(SUM(CASE WHEN arm = 'low_disc' THEN 1 ELSE 0 END) AS BIGINT)
           AS rate_low_ppm
  FROM labeled
),
strata AS (
  SELECT qty_stratum,
         CAST(SUM(CASE WHEN arm = 'high_disc' THEN ret ELSE 0 END) AS BIGINT)
           * 1000000
           // CAST(SUM(CASE WHEN arm = 'high_disc' THEN 1 ELSE 0 END) AS BIGINT)
           AS s_high_ppm,
         CAST(SUM(CASE WHEN arm = 'low_disc' THEN ret ELSE 0 END) AS BIGINT)
           * 1000000
           // CAST(SUM(CASE WHEN arm = 'low_disc' THEN 1 ELSE 0 END) AS BIGINT)
           AS s_low_ppm
  FROM labeled
  GROUP BY qty_stratum
  HAVING SUM(CASE WHEN arm = 'high_disc' THEN 1 ELSE 0 END) > 0
     AND SUM(CASE WHEN arm = 'low_disc' THEN 1 ELSE 0 END) > 0
),
verdicts AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
         CAST(SUM(CASE WHEN s_high_ppm > s_low_ppm THEN 1 ELSE 0 END)
              AS BIGINT) AS n_high_wins,
         CAST(SUM(CASE WHEN s_high_ppm < s_low_ppm THEN 1 ELSE 0 END)
              AS BIGINT) AS n_low_wins
  FROM strata
)
SELECT o.rate_high_ppm, o.rate_low_ppm,
       v.n_strata, v.n_high_wins, v.n_low_wins,
       (o.rate_high_ppm > o.rate_low_ppm AND v.n_low_wins > v.n_high_wins)
       OR (o.rate_high_ppm < o.rate_low_ppm AND v.n_high_wins > v.n_low_wins)
         AS paradox_detected
FROM overall o CROSS JOIN verdicts v
"""


@register(
    "a_simpsons_paradox_detector",
    oracle=_SIMPSON_ORACLE,
    tags=("A7", "A1", "P6"),
)
def a_simpsons_paradox_detector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson's paradox audit: the high-discount vs low-discount
    return-rate comparison computed BOTH ways — pooled over all
    lineitems and stratified by quantity band — with a detector that
    fires when the pooled winner loses in the majority of strata. This
    is the stratification sanity check every observational metric
    comparison needs before anyone acts on it (the pooled number is
    confounded by whatever drives stratum membership).

    Determinism & scale — two combinable conditional-aggregate passes
    (pooled 1-row, per-stratum bounded rollup); all rates exact
    integer ppm (positive floor division), the verdict pure boolean
    algebra on integers. Strata missing either arm are excluded — a
    one-armed stratum has no within-stratum comparison."""
    li = load_table(spark, sf_dir, "lineitem")
    labeled = li.select(
        F.when(F.col("l_discount") >= 0.05, "high_disc")
        .otherwise("low_disc")
        .alias("arm"),
        F.expr("CAST(ROUND(l_quantity) AS BIGINT) DIV 10").alias("qty_stratum"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("ret"),
    )
    high_ret = F.sum(F.when(F.col("arm") == "high_disc", F.col("ret")).otherwise(0))
    high_n = F.sum(F.when(F.col("arm") == "high_disc", 1).otherwise(0))
    low_ret = F.sum(F.when(F.col("arm") == "low_disc", F.col("ret")).otherwise(0))
    low_n = F.sum(F.when(F.col("arm") == "low_disc", 1).otherwise(0))
    overall = labeled.agg(
        F.expr(
            "SUM(CASE WHEN arm = 'high_disc' THEN ret ELSE 0 END) * 1000000"
            " DIV SUM(CASE WHEN arm = 'high_disc' THEN 1 ELSE 0 END)"
        ).alias("rate_high_ppm"),
        F.expr(
            "SUM(CASE WHEN arm = 'low_disc' THEN ret ELSE 0 END) * 1000000"
            " DIV SUM(CASE WHEN arm = 'low_disc' THEN 1 ELSE 0 END)"
        ).alias("rate_low_ppm"),
    )
    strata = (
        labeled.groupBy("qty_stratum")
        .agg(
            high_ret.alias("hr"),
            high_n.alias("hn"),
            low_ret.alias("lr"),
            low_n.alias("ln_"),
        )
        .filter((F.col("hn") > 0) & (F.col("ln_") > 0))
        .select(
            F.expr("hr * 1000000 DIV hn").alias("s_high_ppm"),
            F.expr("lr * 1000000 DIV ln_").alias("s_low_ppm"),
        )
    )
    verdicts = strata.agg(
        F.count(F.lit(1)).alias("n_strata"),
        F.sum(
            F.when(F.col("s_high_ppm") > F.col("s_low_ppm"), 1).otherwise(0)
        ).alias("n_high_wins"),
        F.sum(
            F.when(F.col("s_high_ppm") < F.col("s_low_ppm"), 1).otherwise(0)
        ).alias("n_low_wins"),
    )
    return overall.crossJoin(broadcast(verdicts)).select(
        "rate_high_ppm",
        "rate_low_ppm",
        "n_strata",
        "n_high_wins",
        "n_low_wins",
        (
            (
                (F.col("rate_high_ppm") > F.col("rate_low_ppm"))
                & (F.col("n_low_wins") > F.col("n_high_wins"))
            )
            | (
                (F.col("rate_high_ppm") < F.col("rate_low_ppm"))
                & (F.col("n_high_wins") > F.col("n_low_wins"))
            )
        ).alias("paradox_detected"),
    )


# ---------------------------------------------------------------------------
# Direct standardization (stratum-weighted adjusted rates)
# ---------------------------------------------------------------------------

_DIRECT_STD_ORACLE = """
WITH labeled AS (
  SELECT CASE WHEN l_discount >= 0.05 THEN 'high_disc' ELSE 'low_disc' END
           AS arm,
         CAST(ROUND(l_quantity) AS BIGINT) // 10 AS qty_stratum,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS ret
  FROM lineitem
),
strata AS (
  SELECT qty_stratum, arm,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(ret) AS BIGINT) AS k
  FROM labeled GROUP BY qty_stratum, arm
),
ref AS (
  SELECT qty_stratum, CAST(SUM(n) AS BIGINT) AS w
  FROM strata GROUP BY qty_stratum
),
tot AS (SELECT CAST(SUM(w) AS BIGINT) AS w_tot FROM ref),
adjusted AS (
  SELECT s.arm,
         CAST(SUM(s.k * r.w * 1000000 // s.n // t.w_tot) AS BIGINT)
           AS adj_rate_ppm,
         CAST(SUM(s.k) AS BIGINT) * 1000000 // CAST(SUM(s.n) AS BIGINT)
           AS crude_rate_ppm,
         CAST(COUNT(*) AS BIGINT) AS n_strata
  FROM strata s JOIN ref r USING (qty_stratum) CROSS JOIN tot t
  GROUP BY s.arm
)
SELECT arm, crude_rate_ppm, adj_rate_ppm, n_strata
FROM adjusted
ORDER BY arm
"""


@register(
    "e_direct_standardization",
    oracle=_DIRECT_STD_ORACLE,
    tags=("A1", "A7", "J1", "P6"),
)
def e_direct_standardization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Direct standardization — the FIX for the confounding
    `a_simpsons_paradox_detector` detects: each arm's return rate is
    re-weighted to the POOLED quantity-stratum distribution, so both
    arms are compared as if they had the same stratum mix. Crude and
    adjusted rates ride the same row; when they disagree materially,
    the crude comparison was confounded by stratum membership — the
    epidemiology-standard adjustment, applied to product metrics.

    Determinism & scale — one combinable (stratum, arm) rollup over the
    fact; reference weights re-aggregate the rollup; the adjusted rate
    is a sum of per-stratum exact-integer terms (k·w·10⁶ // n // W —
    positive floor divisions nested innermost-first identically on both
    engines). Nothing beyond the first rollup touches the fact."""
    li = load_table(spark, sf_dir, "lineitem")
    labeled = li.select(
        F.when(F.col("l_discount") >= 0.05, "high_disc")
        .otherwise("low_disc")
        .alias("arm"),
        F.expr("CAST(ROUND(l_quantity) AS BIGINT) DIV 10").alias("qty_stratum"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("ret"),
    )
    strata = labeled.groupBy("qty_stratum", "arm").agg(
        F.count(F.lit(1)).alias("n"), F.sum("ret").alias("k")
    )
    ref = strata.groupBy("qty_stratum").agg(F.sum("n").alias("w"))
    tot = ref.agg(F.sum("w").alias("w_tot"))
    return (
        strata.join(broadcast(ref), "qty_stratum")
        .crossJoin(broadcast(tot))
        .groupBy("arm")
        .agg(
            F.sum(F.expr("k * w * 1000000 DIV n DIV w_tot"))
            .cast("long")
            .alias("adj_rate_ppm"),
            F.expr("SUM(k) * 1000000 DIV SUM(n)").alias("crude_rate_ppm"),
            F.count(F.lit(1)).alias("n_strata"),
        )
        .select("arm", "crude_rate_ppm", "adj_rate_ppm", "n_strata")
        .orderBy("arm")
    )


# ---------------------------------------------------------------------------
# Price-volume decomposition of year-over-year revenue change per brand
# ---------------------------------------------------------------------------

_PVM_ORACLE = f"""
WITH yr AS (
  SELECT p_brand,
         CASE WHEN l_shipdate < DATE '1997-01-01' THEN 0 ELSE 1 END AS y,
         CAST(SUM({CENTS_SQL.format(expr="l_extendedprice")}) AS BIGINT) AS rev,
         CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS qty
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1998-01-01'
  GROUP BY p_brand, CASE WHEN l_shipdate < DATE '1997-01-01' THEN 0 ELSE 1 END
),
wide AS (
  SELECT p_brand,
         CAST(MAX(CASE WHEN y = 0 THEN rev END) AS BIGINT) AS rev0,
         CAST(MAX(CASE WHEN y = 1 THEN rev END) AS BIGINT) AS rev1,
         CAST(MAX(CASE WHEN y = 0 THEN qty END) AS BIGINT) AS qty0,
         CAST(MAX(CASE WHEN y = 1 THEN qty END) AS BIGINT) AS qty1
  FROM yr GROUP BY p_brand
  HAVING MAX(CASE WHEN y = 0 THEN rev END) IS NOT NULL
     AND MAX(CASE WHEN y = 1 THEN rev END) IS NOT NULL
)
SELECT p_brand, rev0, rev1, rev1 - rev0 AS d_rev_cents,
       ROUND((qty1 - qty0)
             * ((CAST(rev0 AS DOUBLE) / qty0 + CAST(rev1 AS DOUBLE) / qty1) / 2)
             / 100, 6) AS volume_effect_dollars,
       ROUND((CAST(rev1 AS DOUBLE) / qty1 - CAST(rev0 AS DOUBLE) / qty0)
             * ((qty0 + qty1) / 2.0) / 100, 6) AS price_effect_dollars,
       ROUND((rev1 - rev0) / 100.0
             - (qty1 - qty0)
               * ((CAST(rev0 AS DOUBLE) / qty0 + CAST(rev1 AS DOUBLE) / qty1) / 2)
               / 100
             - (CAST(rev1 AS DOUBLE) / qty1 - CAST(rev0 AS DOUBLE) / qty0)
               * ((qty0 + qty1) / 2.0) / 100, 6) + 0.0 AS residual_dollars
FROM wide
ORDER BY p_brand
"""


@register(
    "e_price_volume_mix",
    oracle=_PVM_ORACLE,
    tags=("A1", "A7", "J1", "F2"),
)
def e_price_volume_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-volume decomposition of each brand's 1996→1997 revenue
    change — the FP&A bridge that answers 'did we sell MORE, or at
    HIGHER prices?' per product line. The symmetric (midpoint) form
    Δrev = Δq·p̄ + Δp·q̄ makes the two effects sum exactly to the
    revenue delta; `residual_dollars` carries the identity (0 up to
    the shared round-6) so every row proves its own bookkeeping.

    Determinism & scale — one combinable (brand, year) rollup behind a
    pushed two-year scan filter; the decomposition is per-brand scalar
    algebra over exact integer cents/quantities. Brands missing either
    year are excluded (no year-over-year bridge exists for them)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    yr = (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
        )
        .join(p, li.l_partkey == p.p_partkey)
        .groupBy(
            "p_brand",
            F.when(F.col("l_shipdate") < "1997-01-01", 0).otherwise(1).alias("y"),
        )
        .agg(
            F.sum(cents(F.col("l_extendedprice"))).alias("rev"),
            F.sum(F.round(F.col("l_quantity")).cast("long")).alias("qty"),
        )
    )
    wide = (
        yr.groupBy("p_brand")
        .agg(
            F.max(F.when(F.col("y") == 0, F.col("rev"))).alias("rev0"),
            F.max(F.when(F.col("y") == 1, F.col("rev"))).alias("rev1"),
            F.max(F.when(F.col("y") == 0, F.col("qty"))).alias("qty0"),
            F.max(F.when(F.col("y") == 1, F.col("qty"))).alias("qty1"),
        )
        .filter(F.col("rev0").isNotNull() & F.col("rev1").isNotNull())
    )
    p0 = F.col("rev0").cast("double") / F.col("qty0")
    p1 = F.col("rev1").cast("double") / F.col("qty1")
    p_mid = (p0 + p1) / 2
    q_mid = (F.col("qty0") + F.col("qty1")) / 2.0
    vol = (F.col("qty1") - F.col("qty0")) * p_mid / 100
    prc = (p1 - p0) * q_mid / 100
    return wide.select(
        "p_brand",
        "rev0",
        "rev1",
        (F.col("rev1") - F.col("rev0")).alias("d_rev_cents"),
        F.round(vol, 6).alias("volume_effect_dollars"),
        F.round(prc, 6).alias("price_effect_dollars"),
        (
            F.round((F.col("rev1") - F.col("rev0")) / 100.0 - vol - prc, 6)
            + 0.0  # normalize IEEE -0.0 to +0.0 (both engines)
        ).alias("residual_dollars"),
    ).orderBy("p_brand")


# ---------------------------------------------------------------------------
# Expected shortfall (CVaR): the mean of the tail beyond the p95 order value
# ---------------------------------------------------------------------------

_CVAR_ORACLE = """
WITH vals AS (
  SELECT o_orderpriority,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v
  FROM orders
),
ranked AS (
  SELECT o_orderpriority, v,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY v DESC, v)
           AS rk,
         COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM vals
)
SELECT o_orderpriority,
       CAST(MAX(n) AS BIGINT) AS n_orders,
       CAST(MAX(CASE WHEN rk = (n + 19) // 20 THEN v END) AS BIGINT) / 100.0
         AS var95_dollars,
       CAST(SUM(CASE WHEN rk <= (n + 19) // 20 THEN v ELSE 0 END) AS BIGINT)
         / 100.0
         / CAST(MAX((n + 19) // 20) AS BIGINT) AS cvar95_dollars,
       CAST(MAX((n + 19) // 20) AS BIGINT) AS n_tail
FROM ranked
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register(
    "a_cvar_expected_shortfall",
    oracle=_CVAR_ORACLE,
    tags=("A8", "W1", "A1"),
)
def a_cvar_expected_shortfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-at-Risk and Expected Shortfall (CVaR) of order values per
    priority class: VaR95 is the top-5% threshold, CVaR95 the MEAN of
    everything beyond it — the coherent tail metric risk teams (and
    capacity planners: 'what does a p95+ day actually cost?') use
    because a percentile alone says nothing about how bad the tail is.
    n_tail = ⌈n/20⌉ spells the tail definition into the output.

    Determinism & scale — per-group descending rank with a value
    tie-break, tail size by positive ceil-division ((n+19)//20,
    identical on both engines), tail mean from an exact integer cents
    sum. One shuffle on the group key; the window state is one rank
    counter per group."""
    o = load_table(spark, sf_dir, "orders")
    vals = o.select(
        "o_orderpriority", cents(F.col("o_totalprice")).alias("v")
    )
    w = Window.partitionBy("o_orderpriority").orderBy(F.col("v").desc(), "v")
    wn = Window.partitionBy("o_orderpriority")
    ranked = vals.select(
        "o_orderpriority",
        "v",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    tail_n = F.expr("(n + 19) DIV 20")
    return (
        ranked.groupBy("o_orderpriority")
        .agg(
            F.max("n").cast("long").alias("n_orders"),
            (
                F.max(F.when(F.col("rk") == tail_n, F.col("v"))).cast("long")
                / 100.0
            ).alias("var95_dollars"),
            (
                F.sum(F.when(F.col("rk") <= tail_n, F.col("v")).otherwise(0))
                .cast("long")
                / 100.0
                / F.max(tail_n).cast("long")
            ).alias("cvar95_dollars"),
            F.max(tail_n).cast("long").alias("n_tail"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Intraclass correlation ICC(1): how much of metric variance is between-days
# ---------------------------------------------------------------------------

_ICC_ORACLE = f"""
WITH obs AS (
  SELECT CAST(l_shipdate AS DATE) AS day,
         {CENTS_SQL.format(expr="l_extendedprice")} AS y
  FROM lineitem
  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
),
g AS (
  SELECT day,
         CAST(COUNT(*) AS BIGINT) AS n_g,
         CAST(SUM(y) AS BIGINT) AS s_g,
         CAST(SUM(CAST(y AS DECIMAL(38,0)) * y) AS DECIMAL(38,0)) AS ss_g
  FROM obs GROUP BY day
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(n_g) AS BIGINT) AS n,
         CAST(SUM(s_g) AS BIGINT) AS s,
         CAST(SUM(ss_g) AS DECIMAL(38,0)) AS ss,
         -- each group's s²/n term rounds to an integer (cents²)
         -- BEFORE the sum: 91 groups is enough for accumulation
         -- order to move a raw double sum by ulps across engines.
         CAST(SUM(CAST(ROUND(CAST(s_g AS DOUBLE) * s_g / n_g) AS DECIMAL(38,0)))
              AS DECIMAL(38,0)) AS sum_sq_over_n_i
  FROM g
)
SELECT k AS n_days, n AS n_obs,
       ROUND((CAST(sum_sq_over_n_i AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
             / (k - 1) / 10000, 6) AS msb_dollars_sq,
       ROUND((CAST(ss AS DOUBLE) - CAST(sum_sq_over_n_i AS DOUBLE)) / (n - k)
             / 10000, 6) AS msw_dollars_sq,
       ROUND(((CAST(sum_sq_over_n_i AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / (k - 1)
              - (CAST(ss AS DOUBLE) - CAST(sum_sq_over_n_i AS DOUBLE)) / (n - k))
             / ((CAST(sum_sq_over_n_i AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / (k - 1)
                + (CAST(n AS DOUBLE) / k - 1)
                  * (CAST(ss AS DOUBLE) - CAST(sum_sq_over_n_i AS DOUBLE)) / (n - k)), 6)
         AS icc1
FROM tot
"""


@register(
    "a_intraclass_correlation",
    oracle=_ICC_ORACLE,
    tags=("A1", "A2", "F2"),
)
def a_intraclass_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ICC(1) — the share of line-price variance explained by the DAY
    grouping (one-way random-effects intraclass correlation,
    (MSB−MSW)/(MSB+(n̄−1)·MSW)) — the clustering diagnostic that
    decides whether per-day aggregation is informative and how much
    day-level clustering inflates naive standard errors (design
    effect ≈ 1+(n̄−1)·ICC). ICC ≈ 0 here is itself the finding: line
    prices don't cluster by ship date, so day-level models of PRICE
    are noise.

    Determinism & scale — the same sufficient-statistics discipline as
    `a_oneway_anova_f` with day as the factor: per-day exact BIGINT
    (n, Σy) and DECIMAL(38,0) Σy², one bounded rollup, one fixed float
    expression per output, round-6."""
    li = load_table(spark, sf_dir, "lineitem")
    y = cents(F.col("l_extendedprice"))
    g = (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1996-04-01")
        )
        .groupBy(F.col("l_shipdate").cast("date").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_g"),
            F.sum(y).alias("s_g"),
            F.sum(y.cast("decimal(38,0)") * y).alias("ss_g"),
        )
    )
    tot = g.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n_g").alias("n"),
        F.sum("s_g").alias("s"),
        F.sum("ss_g").alias("ss"),
        F.sum(
            F.round(
                F.col("s_g").cast("double") * F.col("s_g") / F.col("n_g")
            ).cast("decimal(38,0)")
        ).alias("sum_sq_over_n_i"),
    )
    msb = (
        F.col("sum_sq_over_n_i").cast("double")
        - F.col("s").cast("double") * F.col("s") / F.col("n")
    ) / (F.col("k") - 1)
    msw = (
        F.col("ss").cast("double") - F.col("sum_sq_over_n_i").cast("double")
    ) / (F.col("n") - F.col("k"))
    return tot.select(
        F.col("k").alias("n_days"),
        F.col("n").alias("n_obs"),
        F.round(msb / 10000, 6).alias("msb_dollars_sq"),
        F.round(msw / 10000, 6).alias("msw_dollars_sq"),
        F.round(
            (msb - msw)
            / (msb + (F.col("n").cast("double") / F.col("k") - 1) * msw),
            6,
        ).alias("icc1"),
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
# Quantile treatment effects (distributional lift, not just the mean)
# ---------------------------------------------------------------------------

_QTE_ORACLE = """
WITH per_user AS (
  SELECT user_id,
         CASE WHEN (user_id * 48271) % 100 < 50 THEN 'A' ELSE 'B' END AS arm,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS spend
  FROM events GROUP BY user_id
),
q AS (
  SELECT arm,
         PERCENTILE_CONT(0.10) WITHIN GROUP (ORDER BY spend) AS q10,
         PERCENTILE_CONT(0.25) WITHIN GROUP (ORDER BY spend) AS q25,
         PERCENTILE_CONT(0.50) WITHIN GROUP (ORDER BY spend) AS q50,
         PERCENTILE_CONT(0.75) WITHIN GROUP (ORDER BY spend) AS q75,
         PERCENTILE_CONT(0.90) WITHIN GROUP (ORDER BY spend) AS q90,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM per_user GROUP BY arm
),
wide AS (
  SELECT
    MAX(CASE WHEN arm = 'A' THEN q10 END) AS a10,
    MAX(CASE WHEN arm = 'B' THEN q10 END) AS b10,
    MAX(CASE WHEN arm = 'A' THEN q25 END) AS a25,
    MAX(CASE WHEN arm = 'B' THEN q25 END) AS b25,
    MAX(CASE WHEN arm = 'A' THEN q50 END) AS a50,
    MAX(CASE WHEN arm = 'B' THEN q50 END) AS b50,
    MAX(CASE WHEN arm = 'A' THEN q75 END) AS a75,
    MAX(CASE WHEN arm = 'B' THEN q75 END) AS b75,
    MAX(CASE WHEN arm = 'A' THEN q90 END) AS a90,
    MAX(CASE WHEN arm = 'B' THEN q90 END) AS b90,
    CAST(MAX(CASE WHEN arm = 'A' THEN n END) AS BIGINT) AS n_a,
    CAST(MAX(CASE WHEN arm = 'B' THEN n END) AS BIGINT) AS n_b
  FROM q
)
SELECT quantile, ROUND(q_a / 100, 6) AS q_a_dollars,
       ROUND(q_b / 100, 6) AS q_b_dollars,
       ROUND((q_a - q_b) / 100, 6) AS qte_dollars, n_a, n_b
FROM (
  SELECT 'p10' AS quantile, a10 AS q_a, b10 AS q_b, n_a, n_b FROM wide
  UNION ALL SELECT 'p25', a25, b25, n_a, n_b FROM wide
  UNION ALL SELECT 'p50', a50, b50, n_a, n_b FROM wide
  UNION ALL SELECT 'p75', a75, b75, n_a, n_b FROM wide
  UNION ALL SELECT 'p90', a90, b90, n_a, n_b FROM wide
)
ORDER BY quantile
"""


@register(
    "e_quantile_treatment_effects",
    oracle=_QTE_ORACLE,
    tags=("A8", "A1", "O3", "P6"),
)
def e_quantile_treatment_effects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile treatment effects: the A-vs-B per-user spend difference
    at p10/p25/p50/p75/p90 — the distributional readout a mean-effect
    test (`e_welch_ttest`) cannot give: an intervention that lifts the
    median while gutting the p90 has a zero mean effect and a very
    nonzero product decision. Per-quantile arm values and their
    difference, dollars, round-6.

    Determinism & scale — one combinable per-user reduction, exact
    percentile_cont order statistics per 2-row arm group (a + f·(b−a)
    interpolation identical both engines, proven by
    a_percentile_cont_disc), a 1-row pivot and a 5-row unpivot. The
    fact is touched once."""
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("spend")
    ).withColumn(
        "arm",
        F.when((F.col("user_id") * 48271) % 100 < 50, "A").otherwise("B"),
    )
    q = per_user.groupBy("arm").agg(
        *[
            F.expr(
                f"percentile_cont({p}) WITHIN GROUP (ORDER BY spend)"
            ).alias(f"q{int(p * 100)}")
            for p in (0.10, 0.25, 0.50, 0.75, 0.90)
        ],
        F.count(F.lit(1)).alias("n"),
    )
    wide = q.agg(
        *[
            F.max(F.when(F.col("arm") == arm, F.col(f"q{pct}"))).alias(
                f"{arm.lower()}{pct}"
            )
            for arm in ("A", "B")
            for pct in (10, 25, 50, 75, 90)
        ],
        F.max(F.when(F.col("arm") == "A", F.col("n"))).cast("long").alias("n_a"),
        F.max(F.when(F.col("arm") == "B", F.col("n"))).cast("long").alias("n_b"),
    )
    rows = [
        wide.select(
            F.lit(f"p{pct}").alias("quantile"),
            F.round(F.col(f"a{pct}") / 100, 6).alias("q_a_dollars"),
            F.round(F.col(f"b{pct}") / 100, 6).alias("q_b_dollars"),
            F.round((F.col(f"a{pct}") - F.col(f"b{pct}")) / 100, 6).alias(
                "qte_dollars"
            ),
            "n_a",
            "n_b",
        )
        for pct in (10, 25, 50, 75, 90)
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out.orderBy("quantile")


# ---------------------------------------------------------------------------
# Benjamini-Hochberg FDR correction over a family of Welch tests
# ---------------------------------------------------------------------------

_BH_FDR_ORACLE = f"""
WITH spend AS (
  SELECT n_name AS nation, EXTRACT(year FROM o_orderdate) AS yr,
         {CENTS_SQL.format(expr="o_totalprice")} AS pc
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  WHERE o_orderdate >= DATE '1996-01-01'
    AND o_orderdate < DATE '1998-01-01'
),
stats AS (
  SELECT nation, yr, COUNT(*) AS n, CAST(SUM(pc) AS BIGINT) AS s,
         CAST(SUM(pc * pc) AS HUGEINT) AS ss
  FROM spend GROUP BY nation, yr
),
welch AS (
  SELECT a.nation, a.n AS n1, b.n AS n2,
         ROUND((CAST(a.s AS DOUBLE) / a.n - CAST(b.s AS DOUBLE) / b.n)
           / SQRT((CAST(a.ss AS DOUBLE) - CAST(a.s AS DOUBLE) * a.s / a.n)
                    / (a.n - 1) / a.n
                + (CAST(b.ss AS DOUBLE) - CAST(b.s AS DOUBLE) * b.s / b.n)
                    / (b.n - 1) / b.n), 6) AS z
  FROM stats a JOIN stats b
    ON a.nation = b.nation AND a.yr = 1996 AND b.yr = 1997
),
ptab AS (
  SELECT nation, n1, n2, z,
         CAST(ROUND(2000000.0
           / (1.0 + EXP(1.5976 * ABS(z)
                        + 0.07056 * ABS(z) * ABS(z) * ABS(z))))
           AS BIGINT) AS p_ppm
  FROM welch
),
ranked AS (
  SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY p_ppm, nation) AS BIGINT)
              AS p_rank,
         CAST(COUNT(*) OVER () AS BIGINT) AS m
  FROM ptab
),
adj AS (
  SELECT *, MIN(p_ppm * m * 1000 // p_rank)
              OVER (ORDER BY p_rank
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
              AS bh_raw
  FROM ranked
)
SELECT nation, n1, n2, z, p_ppm, p_rank,
       CAST(LEAST(bh_raw, 1000000000) AS BIGINT) AS bh_adj_nano,
       LEAST(bh_raw, 1000000000) <= 50000000 AS significant_fdr05
FROM adj ORDER BY p_rank, nation
"""


@register(
    "e_bh_fdr_correction",
    oracle=_BH_FDR_ORACLE,
    tags=("A1", "J1", "W1", "W3", "F3"),
)
def e_bh_fdr_correction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR correction across a family of 25
    simultaneous Welch tests (per-nation mean order value, 1996 vs
    1997) — the multiple-comparisons step every metrics platform needs
    once it reports more than one A/B readout: adjusted p = min over
    j >= rank of p_(j) * m / j, monotone by construction.

    Scale + determinism design: the heavy pass is ONE combinable
    sufficient-stats groupBy (n, sum-cents, sum-cents² as BIGINT/
    decimal) over the joined fact — the family table itself is m = 25
    rows, so the rank window and the suffix-running-min frame (ROWS
    CURRENT ROW → UNBOUNDED FOLLOWING) run on a broadcast-sized frame.
    Two-sided p-values come from Page's logistic approximation of the
    normal CDF on the 6-dp-rounded z (EXP's sub-ulp jitter is absorbed
    by ppm rounding at the leaf), and the BH ladder p*m*1000 DIV rank
    is exact BIGINT floor division — both engines walk identical
    integers."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    spend = (
        orders.filter(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1998-01-01")
        )
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("yr"),
            cents(F.col("o_totalprice")).alias("pc"),
        )
    )
    stats = spend.groupBy("nation", "yr").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("pc").cast("long").alias("s"),
        F.sum(F.col("pc").cast("decimal(38,0)") * F.col("pc")).alias("ss"),
    )
    a = stats.filter(F.col("yr") == 1996).select(
        "nation",
        F.col("n").alias("n1"),
        F.col("s").alias("s1"),
        F.col("ss").alias("ss1"),
    )
    b = stats.filter(F.col("yr") == 1997).select(
        "nation",
        F.col("n").alias("n2"),
        F.col("s").alias("s2"),
        F.col("ss").alias("ss2"),
    )
    welch = a.join(b, "nation").select(
        "nation",
        "n1",
        "n2",
        F.expr(
            "ROUND((CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2) "
            "/ SQRT((CAST(ss1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1) "
            "/ (n1 - 1) / n1 "
            "+ (CAST(ss2 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n2) "
            "/ (n2 - 1) / n2), 6)"
        ).alias("z"),
    )
    ptab = welch.select(
        "nation",
        "n1",
        "n2",
        "z",
        F.expr(
            "CAST(ROUND(2000000.0 "
            "/ (1.0 + EXP(1.5976 * ABS(z) "
            "+ 0.07056 * ABS(z) * ABS(z) * ABS(z)))) AS BIGINT)"
        ).alias("p_ppm"),
    )
    w_rank = Window.orderBy("p_ppm", "nation")
    ranked = ptab.select(
        "*",
        F.row_number().over(w_rank).cast("long").alias("p_rank"),
        F.count(F.lit(1))
        .over(Window.partitionBy())
        .cast("long")
        .alias("m"),
    )
    w_suffix = Window.orderBy("p_rank").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    adj = ranked.select(
        "*",
        F.min(F.expr("p_ppm * m * 1000 DIV p_rank")).over(w_suffix).alias(
            "bh_raw"
        ),
    )
    return adj.select(
        "nation",
        "n1",
        "n2",
        "z",
        "p_ppm",
        "p_rank",
        F.least(F.col("bh_raw"), F.lit(1000000000))
        .cast("long")
        .alias("bh_adj_nano"),
        (F.least(F.col("bh_raw"), F.lit(1000000000)) <= 50000000).alias(
            "significant_fdr05"
        ),
    ).orderBy("p_rank", "nation")


# ---------------------------------------------------------------------------
# Spearman rank correlation on the daily series (tie-corrected, exact ranks)
# ---------------------------------------------------------------------------

_SPEARMAN_ORACLE = f"""
WITH daily AS (
  SELECT o_orderdate AS d,
         CAST(SUM({CENTS_SQL.format(expr="o_totalprice")}) AS BIGINT)
           AS rev_cents,
         COUNT(*) AS n_orders
  FROM orders
  WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
  GROUP BY o_orderdate
),
ranked AS (
  SELECT d, rev_cents, n_orders,
         2 * RANK() OVER (ORDER BY rev_cents)
           + COUNT(*) OVER (PARTITION BY rev_cents) - 1 AS rx2,
         2 * RANK() OVER (ORDER BY n_orders)
           + COUNT(*) OVER (PARTITION BY n_orders) - 1 AS ry2
  FROM daily
),
stats AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(rx2) AS BIGINT) AS sx,
         CAST(SUM(ry2) AS BIGINT) AS sy,
         CAST(SUM(rx2 * ry2) AS HUGEINT) AS sxy,
         CAST(SUM(rx2 * rx2) AS HUGEINT) AS sxx,
         CAST(SUM(ry2 * ry2) AS HUGEINT) AS syy
  FROM ranked
)
SELECT n AS n_days,
       ROUND((n * sxy - sx * sy)
             / SQRT(CAST(n * sxx - sx * sx AS DOUBLE))
             / SQRT(CAST(n * syy - sy * sy AS DOUBLE)), 6)
         AS spearman_rho
FROM stats
"""


@register(
    "a_spearman_rank_corr",
    oracle=_SPEARMAN_ORACLE,
    tags=("A1", "W1", "W3", "F3", "F2"),
)
def a_spearman_rank_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between daily revenue and daily order
    count over 1996 — the robust (monotone, outlier-insensitive)
    companion to the Pearson `a_correlation_matrix`: rho is Pearson on
    tie-corrected average ranks.

    Determinism + scale design: average ranks with ties are stored
    DOUBLED so they stay exact integers — rx2 = 2·RANK() + tiecount − 1
    (the doubling cancels in the correlation). The heavy pass is ONE
    combinable day rollup; the rank windows run over the CALENDAR-
    bounded daily series (≤366 rows — the series-query convention), so
    the global window is O(days), never data-sized. Sufficient stats
    are exact BIGINT/decimal; the one float formula is evaluated with
    an identical expression tree on both engines and rounded to 6 dp."""
    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.filter(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1997-01-01")
        )
        .groupBy(F.col("o_orderdate").alias("d"))
        .agg(
            F.sum(cents(F.col("o_totalprice"))).cast("long").alias(
                "rev_cents"
            ),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
    ranked = daily.select(
        "d",
        (
            2 * F.rank().over(Window.orderBy("rev_cents"))
            + F.count(F.lit(1)).over(Window.partitionBy("rev_cents"))
            - 1
        ).alias("rx2"),
        (
            2 * F.rank().over(Window.orderBy("n_orders"))
            + F.count(F.lit(1)).over(Window.partitionBy("n_orders"))
            - 1
        ).alias("ry2"),
    )

    def dec(c: F.Column) -> F.Column:
        return c.cast("decimal(38,0)")

    stats = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rx2").cast("long").alias("sx"),
        F.sum("ry2").cast("long").alias("sy"),
        F.sum(dec(F.col("rx2") * F.col("ry2"))).alias("sxy"),
        F.sum(dec(F.col("rx2") * F.col("rx2"))).alias("sxx"),
        F.sum(dec(F.col("ry2") * F.col("ry2"))).alias("syy"),
    )
    nd = F.col("n").cast("decimal(38,0)")
    sxd = F.col("sx").cast("decimal(38,0)")
    syd = F.col("sy").cast("decimal(38,0)")
    return stats.select(
        F.col("n").alias("n_days"),
        F.round(
            (nd * F.col("sxy") - sxd * F.col("sy")).cast("double")
            / F.sqrt((nd * F.col("sxx") - sxd * F.col("sx")).cast("double"))
            / F.sqrt((nd * F.col("syy") - syd * F.col("sy")).cast("double")),
            6,
        ).alias("spearman_rho"),
    )


# ---------------------------------------------------------------------------
# Bucketed Wasserstein-1 distance between two spend distributions
# ---------------------------------------------------------------------------

_W1_ORACLE = f"""
WITH vals AS (
  SELECT EXTRACT(year FROM o_orderdate) AS yr,
         {CENTS_SQL.format(expr="o_totalprice")} AS pc
  FROM orders
  WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1998-01-01'
),
bounds AS (
  SELECT CAST(MIN(pc) AS BIGINT) AS mn, CAST(MAX(pc) AS BIGINT) AS mx
  FROM vals
),
binned AS (
  SELECT LEAST(255, (v.pc - b.mn) * 256 // (b.mx - b.mn + 1)) AS bin,
         CAST(SUM(CASE WHEN v.yr = 1996 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
         CAST(SUM(CASE WHEN v.yr = 1997 THEN 1 ELSE 0 END) AS BIGINT) AS c2
  FROM vals v CROSS JOIN bounds b
  GROUP BY 1
),
tot AS (
  SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2
  FROM binned
),
cum AS (
  SELECT bin,
         CAST(SUM(c1) OVER (ORDER BY bin
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS c1c,
         CAST(SUM(c2) OVER (ORDER BY bin
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS c2c,
         LEAD(bin, 1, bin) OVER (ORDER BY bin) AS next_bin
  FROM binned
),
integral AS (
  SELECT CAST(SUM(ABS(c1c * t.n2 - c2c * t.n1) * (next_bin - bin))
              AS HUGEINT) AS s
  FROM cum CROSS JOIN tot t
)
SELECT t.n1, t.n2,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM binned) AS n_bins_used,
       ROUND(CAST(i.s AS DOUBLE) / t.n1 / t.n2
             * (b.mx - b.mn + 1) / 256 / 100.0, 6) AS w1_dollars
FROM integral i CROSS JOIN tot t CROSS JOIN bounds b
"""


@register(
    "e_wasserstein_spend_shift",
    oracle=_W1_ORACLE,
    tags=("A1", "A7", "W3", "W2", "F3"),
)
def e_wasserstein_spend_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wasserstein-1 (earth-mover) distance between the 1996 and 1997
    order-value distributions on a fixed 256-bin grid — the
    distribution-shift metric that, unlike KS or PSI, reports HOW MUCH
    money moved, in dollars: W1 = ∫|F₁−F₂|dx.

    Scale design: one combinable conditional-aggregate pass bins both
    years simultaneously (bin id is pure integer math against the
    broadcast 1-row min/max bounds); the CDF difference integral runs
    over the ≤256-row bin rollup with run-length compression of empty
    bins (LEAD(bin) supplies the gap width, so absent bins cost
    nothing). |F₁−F₂| is kept as the exact integer |c1c·n2 − c2c·n1|
    (common-denominator trick) and every product stays in BIGINT/
    decimal — the single float division happens once, on the 1-row
    result."""
    orders = load_table(spark, sf_dir, "orders")
    vals = orders.filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1998-01-01")
    ).select(
        F.year("o_orderdate").alias("yr"),
        cents(F.col("o_totalprice")).alias("pc"),
    )
    bounds = vals.agg(
        F.min("pc").cast("long").alias("mn"),
        F.max("pc").cast("long").alias("mx"),
    )
    binned = (
        vals.crossJoin(F.broadcast(bounds))
        .select(
            F.expr("LEAST(255, (pc - mn) * 256 DIV (mx - mn + 1))").alias(
                "bin"
            ),
            "yr",
        )
        .groupBy("bin")
        .agg(
            F.sum(F.when(F.col("yr") == 1996, 1).otherwise(0))
            .cast("long")
            .alias("c1"),
            F.sum(F.when(F.col("yr") == 1997, 1).otherwise(0))
            .cast("long")
            .alias("c2"),
        )
    )
    tot = binned.agg(
        F.sum("c1").cast("long").alias("n1"),
        F.sum("c2").cast("long").alias("n2"),
    )
    n_bins = binned.agg(F.count(F.lit(1)).alias("n_bins_used"))
    w_cum = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = binned.select(
        "bin",
        F.sum("c1").over(w_cum).cast("long").alias("c1c"),
        F.sum("c2").over(w_cum).cast("long").alias("c2c"),
        F.lead("bin", 1).over(Window.orderBy("bin")).alias("next_bin_raw"),
    ).withColumn("next_bin", F.coalesce("next_bin_raw", F.col("bin")))
    integral = cum.crossJoin(F.broadcast(tot)).agg(
        F.sum(
            (
                F.abs(
                    F.col("c1c").cast("decimal(38,0)") * F.col("n2")
                    - F.col("c2c").cast("decimal(38,0)") * F.col("n1")
                )
                * (F.col("next_bin") - F.col("bin"))
            )
        ).alias("s")
    )
    return (
        integral.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(n_bins))
        .crossJoin(F.broadcast(bounds))
        .select(
            "n1",
            "n2",
            "n_bins_used",
            F.round(
                F.col("s").cast("double")
                / F.col("n1")
                / F.col("n2")
                * (F.col("mx") - F.col("mn") + 1)
                / 256
                / 100.0,
                6,
            ).alias("w1_dollars"),
        )
    )


# ---------------------------------------------------------------------------
# Kruskal-Wallis H test across day-of-week groups (rank-based k-sample)
# ---------------------------------------------------------------------------

_KRUSKAL_ORACLE = f"""
WITH daily AS (
  SELECT o_orderdate AS d,
         DAYOFWEEK(o_orderdate) + 1 AS dow,
         CAST(SUM({CENTS_SQL.format(expr="o_totalprice")}) AS BIGINT)
           AS rev_cents
  FROM orders
  WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
  GROUP BY 1, 2
),
ranked AS (
  SELECT dow, rev_cents,
         2 * RANK() OVER (ORDER BY rev_cents)
           + COUNT(*) OVER (PARTITION BY rev_cents) - 1 AS r2
  FROM daily
),
grp AS (
  SELECT dow, CAST(COUNT(*) AS BIGINT) AS n_j,
         CAST(SUM(r2) AS BIGINT) AS sr2
  FROM ranked GROUP BY dow
),
terms AS (
  SELECT CAST(SUM(sr2 * sr2 * 1000000 // n_j) AS BIGINT) AS term_micro,
         CAST(SUM(n_j) AS BIGINT) AS n
  FROM grp
),
ties AS (
  SELECT CAST(SUM(t * t * t - t) AS BIGINT) AS tie_term
  FROM (SELECT COUNT(*) AS t FROM daily GROUP BY rev_cents)
),
h AS (
  SELECT n,
         CAST(3 AS DOUBLE) * term_micro / n / (n + 1) / 1000000
           - CAST(3 AS DOUBLE) * (n + 1) AS h_raw,
         1.0 - CAST(tie_term AS DOUBLE) / (CAST(n AS DOUBLE) * n * n - n)
           AS c
  FROM terms CROSS JOIN ties
)
SELECT n AS n_days, CAST(6 AS BIGINT) AS df,
       ROUND(h_raw, 6) AS h_stat,
       ROUND(h_raw / c, 6) AS h_tie_corrected,
       h_raw / c > 12.591587 AS reject_at_05
FROM h
"""


@register(
    "a_kruskal_wallis_dow",
    oracle=_KRUSKAL_ORACLE,
    tags=("A1", "W1", "W3", "F3", "F2"),
)
def a_kruskal_wallis_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H test: does daily revenue differ by day of week?
    The rank-based (distribution-free) k-sample companion to
    `a_oneway_anova_f` — robust to the heavy right tail that makes the
    F-test's normality assumption suspect on revenue data.

    Determinism + scale design: same doubled-average-rank trick as
    `a_spearman_rank_corr` (r2 = 2·RANK + tiecount − 1 stays integer),
    and Σ R_j²/n_j is carried as the exact integer
    Σ sr2²·10⁶ DIV n_j so the per-group division never produces an
    order-sensitive float sum. The heavy pass is ONE combinable day
    rollup; ranks and group stats live on the ≤366-row calendar-bounded
    series. Tie correction C = 1 − Σ(t³−t)/(N³−N) is exact-integer in
    both operands; the χ²₆ critical value 12.591587 is a literal."""
    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.filter(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1997-01-01")
        )
        .groupBy(
            F.col("o_orderdate").alias("d"),
            F.dayofweek("o_orderdate").alias("dow"),
        )
        .agg(
            F.sum(cents(F.col("o_totalprice"))).cast("long").alias(
                "rev_cents"
            )
        )
    )
    ranked = daily.select(
        "dow",
        "rev_cents",
        (
            2 * F.rank().over(Window.orderBy("rev_cents"))
            + F.count(F.lit(1)).over(Window.partitionBy("rev_cents"))
            - 1
        ).alias("r2"),
    )
    grp = ranked.groupBy("dow").agg(
        F.count(F.lit(1)).cast("long").alias("n_j"),
        F.sum("r2").cast("long").alias("sr2"),
    )
    terms = grp.agg(
        F.sum(F.expr("sr2 * sr2 * 1000000 DIV n_j")).cast("long").alias(
            "term_micro"
        ),
        F.sum("n_j").cast("long").alias("n"),
    )
    ties = (
        daily.groupBy("rev_cents")
        .agg(F.count(F.lit(1)).alias("t"))
        .agg(F.sum(F.expr("t * t * t - t")).cast("long").alias("tie_term"))
    )
    h = terms.crossJoin(F.broadcast(ties)).select(
        "n",
        F.expr(
            "CAST(3 AS DOUBLE) * term_micro / n / (n + 1) / 1000000 "
            "- CAST(3 AS DOUBLE) * (n + 1)"
        ).alias("h_raw"),
        F.expr(
            "1.0 - CAST(tie_term AS DOUBLE) "
            "/ (CAST(n AS DOUBLE) * n * n - n)"
        ).alias("c"),
    )
    return h.select(
        F.col("n").alias("n_days"),
        F.lit(6).cast("long").alias("df"),
        F.round(F.col("h_raw"), 6).alias("h_stat"),
        F.round(F.col("h_raw") / F.col("c"), 6).alias("h_tie_corrected"),
        (F.col("h_raw") / F.col("c") > 12.591587).alias("reject_at_05"),
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
# Cook's distance: influential-day diagnostics for the daily trend fit
# ---------------------------------------------------------------------------

_COOKS_ORACLE = f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         DATEDIFF('day', DATE '1996-01-01', CAST(o_orderdate AS DATE)) + 1
           AS t,
         CAST(SUM({CENTS_SQL.format(expr="o_totalprice")}) AS BIGINT) AS y
  FROM orders
  WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
  GROUP BY 1, 2
),
sums AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(t) AS HUGEINT) AS st,
         CAST(SUM(CAST(t AS HUGEINT) * t) AS HUGEINT) AS stt,
         CAST(SUM(y) AS HUGEINT) AS sy,
         CAST(SUM(CAST(t AS HUGEINT) * y) AS HUGEINT) AS sty
  FROM daily
),
fit AS (
  SELECT n, st,
         n * stt - st * st AS det,
         sy * stt - st * sty AS det_a,
         n * sty - st * sy AS det_b
  FROM sums
),
resid AS (
  SELECT d.d, d.t, d.y,
         CAST(ROUND(CAST(d.y * f.det - f.det_a - f.det_b * d.t AS DOUBLE)
                    / CAST(f.det AS DOUBLE) * 1000) AS BIGINT) AS e_milli,
         CAST(f.det + (f.n * d.t - f.st) * (f.n * d.t - f.st) AS HUGEINT)
           AS hnum,
         CAST(f.n * f.det AS HUGEINT) AS hden,
         f.n AS n
  FROM daily d CROSS JOIN fit f
),
sse AS (
  SELECT CAST(SUM(CAST(e_milli AS HUGEINT) * e_milli) AS HUGEINT)
           AS sse_milli2
  FROM resid
)
SELECT CAST(r.t AS BIGINT) AS day_index, r.y AS revenue_cents,
       CAST(ROUND(r.e_milli / 1000.0) AS BIGINT) AS residual_cents,
       ROUND(CAST(r.e_milli AS DOUBLE) * r.e_milli * r.hnum * r.hden
             * (CAST(r.n AS DOUBLE) - 2)
             / (2.0 * CAST(s.sse_milli2 AS DOUBLE)
                * CAST(r.hden - r.hnum AS DOUBLE)
                * CAST(r.hden - r.hnum AS DOUBLE)), 6) AS cooks_d,
       CAST(r.e_milli AS DOUBLE) * r.e_milli * r.hnum * r.hden
         * (CAST(r.n AS DOUBLE) - 2)
         / (2.0 * CAST(s.sse_milli2 AS DOUBLE)
            * CAST(r.hden - r.hnum AS DOUBLE)
            * CAST(r.hden - r.hnum AS DOUBLE))
         > 4.0 / CAST(r.n AS DOUBLE) AS is_influential
FROM resid r CROSS JOIN sse s
ORDER BY cooks_d DESC, day_index
LIMIT 10
"""


@register(
    "a_cooks_distance_outliers",
    oracle=_COOKS_ORACLE,
    tags=("A1", "A8", "F3", "O2", "J9"),
)
def a_cooks_distance_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cook's distance on the daily-revenue trend fit: the top-10 days
    whose removal would most move the regression line — regression
    influence diagnostics (leverage × residual), the principled version
    of 'delete the weird day and refit'.

    Determinism + scale design: the OLS fit is exact-integer Cramer
    (det, det_a, det_b); residuals are leaf-rounded to millicents
    through e·det = y·det − det_a − det_b·t (one exact integer per row
    before any float), so SSE = Σe² is an exact integer sum. Leverage
    uses the rational identity h_i = [det + (n·t−Σt)²] / (n·det) —
    Cook's D becomes a single fixed-shape product of integer-valued
    doubles per row, identical trees both engines. Heavy pass: ONE
    combinable day rollup; diagnostics run on the ≤366-row
    calendar-bounded series; deterministic (cooks_d, day) top-10."""
    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.filter(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1997-01-01")
        )
        .groupBy(
            F.col("o_orderdate").cast("date").alias("d"),
            (
                F.datediff(
                    F.col("o_orderdate").cast("date"), F.lit("1996-01-01")
                )
                + 1
            ).alias("t"),
        )
        .agg(F.sum(cents(F.col("o_totalprice"))).cast("long").alias("y"))
    )

    def dec(c: F.Column) -> F.Column:
        return c.cast("decimal(38,0)")

    sums = daily.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("t").cast("decimal(38,0)").alias("st"),
        F.sum(dec(F.col("t")) * F.col("t")).alias("stt"),
        F.sum("y").cast("decimal(38,0)").alias("sy"),
        F.sum(dec(F.col("t")) * F.col("y")).alias("sty"),
    )
    fit = sums.select(
        "n",
        "st",
        F.expr("n * stt - st * st").alias("det"),
        F.expr("sy * stt - st * sty").alias("det_a"),
        F.expr("n * sty - st * sy").alias("det_b"),
    )
    resid = daily.crossJoin(F.broadcast(fit)).select(
        "d",
        "t",
        "y",
        F.expr(
            "CAST(ROUND(CAST(y * det - det_a - det_b * t AS DOUBLE) "
            "/ CAST(det AS DOUBLE) * 1000) AS BIGINT)"
        ).alias("e_milli"),
        F.expr(
            "CAST(det + (n * t - st) * (n * t - st) AS DECIMAL(38,0))"
        ).alias("hnum"),
        F.expr("CAST(n * det AS DECIMAL(38,0))").alias("hden"),
        "n",
    )
    sse = resid.agg(
        F.sum(dec(F.col("e_milli")) * F.col("e_milli")).alias("sse_milli2")
    )
    cook_expr = (
        "CAST(e_milli AS DOUBLE) * e_milli * hnum * hden "
        "* (CAST(n AS DOUBLE) - 2) "
        "/ (2.0 * CAST(sse_milli2 AS DOUBLE) "
        "* CAST(hden - hnum AS DOUBLE) "
        "* CAST(hden - hnum AS DOUBLE))"
    )
    return (
        resid.crossJoin(F.broadcast(sse))
        .select(
            F.col("t").cast("long").alias("day_index"),
            F.col("y").alias("revenue_cents"),
            F.expr("CAST(ROUND(e_milli / 1000.0) AS BIGINT)").alias(
                "residual_cents"
            ),
            F.expr(f"ROUND({cook_expr}, 6)").alias("cooks_d"),
            F.expr(f"{cook_expr} > 4.0 / CAST(n AS DOUBLE)").alias(
                "is_influential"
            ),
        )
        .orderBy(F.col("cooks_d").desc(), "day_index")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Chain-ladder LTV projection over the cohort-month development triangle
# ---------------------------------------------------------------------------

_CHAIN_LADDER_ORACLE = f"""
WITH first_order AS (
  SELECT o_custkey AS ck,
         MIN(EXTRACT(year FROM o_orderdate) * 12
             + EXTRACT(month FROM o_orderdate) - 1) AS cohort
  FROM orders GROUP BY o_custkey
),
rev AS (
  SELECT f.cohort,
         EXTRACT(year FROM o.o_orderdate) * 12
           + EXTRACT(month FROM o.o_orderdate) - 1 - f.cohort AS age,
         CAST(SUM({CENTS_SQL.format(expr="o.o_totalprice")}) AS BIGINT)
           AS inc_cents
  FROM orders o JOIN first_order f ON o.o_custkey = f.ck
  WHERE f.cohort >= 1996 * 12 AND f.cohort < 1996 * 12 + 12
  GROUP BY 1, 2
),
max_ym AS (
  SELECT MAX(cohort + age) AS m FROM rev
),
cum AS (
  SELECT cohort, age,
         CAST(SUM(inc_cents) OVER (PARTITION BY cohort ORDER BY age
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS c
  FROM rev
),
dense AS (
  SELECT g.cohort, g.age,
         CAST(MAX(c.c) OVER (PARTITION BY g.cohort ORDER BY g.age
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS c
  FROM (SELECT DISTINCT r.cohort, a.age
        FROM rev r CROSS JOIN (SELECT DISTINCT age FROM rev) a
        CROSS JOIN max_ym m
        WHERE r.cohort + a.age <= m.m) g
  LEFT JOIN cum c ON g.cohort = c.cohort AND g.age = c.age
),
factors AS (
  SELECT a.age AS j,
         CAST(SUM(b.c) AS BIGINT) AS num,
         CAST(SUM(a.c) AS BIGINT) AS den,
         CAST(ROUND(LN(CAST(SUM(b.c) AS DOUBLE) / SUM(a.c)) * 1000000)
              AS BIGINT) AS lnf_micro
  FROM dense a JOIN dense b ON a.cohort = b.cohort AND b.age = a.age + 1
  GROUP BY a.age
  HAVING SUM(a.c) > 0 AND SUM(b.c) > 0
),
suffix AS (
  SELECT j, CAST(SUM(lnf_micro) OVER (ORDER BY j
              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT)
              AS log_growth_micro
  FROM factors
),
latest AS (
  SELECT d.cohort, MAX(d.age) AS last_age
  FROM dense d GROUP BY d.cohort
)
SELECT l.cohort - 1996 * 12 AS cohort_month,
       CAST(l.last_age AS BIGINT) AS last_age,
       d.c AS c_latest_cents,
       CAST(COALESCE(s.log_growth_micro, 0) AS BIGINT) AS log_growth_micro,
       ROUND(d.c * EXP(COALESCE(s.log_growth_micro, 0) / 1000000.0) / 100,
             2) AS ultimate_ltv_dollars
FROM latest l
JOIN dense d ON l.cohort = d.cohort AND l.last_age = d.age
LEFT JOIN suffix s ON s.j = l.last_age
ORDER BY cohort_month
"""


@register(
    "e_chain_ladder_ltv",
    oracle=_CHAIN_LADDER_ORACLE,
    tags=("A1", "J1", "W3", "F2", "F3"),
)
def e_chain_ladder_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chain-ladder ultimate-LTV projection (the actuarial
    loss-development method applied to revenue cohorts): development
    factor f_j = Σᵢ C(i, j+1) / Σᵢ C(i, j) over cohorts observed at both
    ages, and each cohort's latest cumulative revenue is projected to
    ultimate by the product of the remaining factors — the standard
    answer to 'what will the June cohort be worth?' from a
    right-censored triangle.

    Determinism + scale design: the only data-sized work is the
    first-order-month customer rollup and ONE (cohort, age) groupBy —
    the triangle itself is months² ≤ 144 rows, so the densify grid,
    cumulative windows, factor joins, and the suffix-sum of log factors
    (the KM log-space convention: ln f_j micro-nat rounded to exact
    BIGINT, summed as integers; `log_growth_micro` is the hash-stable
    column, the dollars column is EXP of the same double both sides)
    all run on a broadcast-sized frame."""
    orders = load_table(spark, sf_dir, "orders")
    ym = (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1).alias(
        "ym"
    )
    first_order = (
        orders.select(F.col("o_custkey").alias("ck"), ym)
        .groupBy("ck")
        .agg(F.min("ym").alias("cohort"))
        .filter(
            (F.col("cohort") >= 1996 * 12)
            & (F.col("cohort") < 1996 * 12 + 12)
        )
    )
    rev = (
        orders.select("o_custkey", ym, "o_totalprice")
        .join(first_order, F.col("o_custkey") == F.col("ck"))
        .groupBy(
            "cohort", (F.col("ym") - F.col("cohort")).alias("age")
        )
        .agg(
            F.sum(cents(F.col("o_totalprice"))).cast("long").alias(
                "inc_cents"
            )
        )
    )
    max_ym = rev.agg(F.max(F.col("cohort") + F.col("age")).alias("m"))
    w_cum = Window.partitionBy("cohort").orderBy("age").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = rev.select(
        "cohort", "age", F.sum("inc_cents").over(w_cum).cast("long").alias("c")
    )
    grid = (
        rev.select("cohort")
        .distinct()
        .crossJoin(F.broadcast(rev.select("age").distinct()))
        .crossJoin(F.broadcast(max_ym))
        .filter(F.col("cohort") + F.col("age") <= F.col("m"))
        .select("cohort", "age")
    )
    dense = grid.join(cum, ["cohort", "age"], "left").select(
        "cohort",
        "age",
        F.max("c").over(w_cum).cast("long").alias("c"),
    )
    a = dense.select("cohort", F.col("age").alias("j"), F.col("c").alias("ca"))
    b = dense.select(
        "cohort", (F.col("age") - 1).alias("j"), F.col("c").alias("cb")
    )
    factors = (
        a.join(b, ["cohort", "j"])
        .groupBy("j")
        .agg(
            F.sum("cb").cast("long").alias("num"),
            F.sum("ca").cast("long").alias("den"),
        )
        .filter((F.col("num") > 0) & (F.col("den") > 0))
        .select(
            "j",
            F.expr(
                "CAST(ROUND(LN(CAST(num AS DOUBLE) / den) * 1000000) "
                "AS BIGINT)"
            ).alias("lnf_micro"),
        )
    )
    w_suffix = Window.orderBy("j").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    suffix = factors.select(
        "j",
        F.sum("lnf_micro").over(w_suffix).cast("long").alias(
            "log_growth_micro"
        ),
    )
    latest = dense.groupBy("cohort").agg(F.max("age").alias("last_age"))
    return (
        latest.join(
            dense.select(
                "cohort", F.col("age").alias("last_age"), F.col("c")
            ),
            ["cohort", "last_age"],
        )
        .join(
            F.broadcast(suffix.select(F.col("j").alias("last_age"),
                                      "log_growth_micro")),
            "last_age",
            "left",
        )
        .select(
            (F.col("cohort") - 1996 * 12).alias("cohort_month"),
            F.col("last_age").cast("long").alias("last_age"),
            F.col("c").alias("c_latest_cents"),
            F.coalesce(F.col("log_growth_micro"), F.lit(0))
            .cast("long")
            .alias("log_growth_micro"),
            F.round(
                F.col("c")
                * F.exp(
                    F.coalesce(F.col("log_growth_micro"), F.lit(0))
                    / 1000000.0
                )
                / 100,
                2,
            ).alias("ultimate_ltv_dollars"),
        )
        .orderBy("cohort_month")
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
# Hodges-Lehmann robust location estimator (median of Walsh averages)
# ---------------------------------------------------------------------------

_HL_ORACLE = f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(SUM({CENTS_SQL.format(expr="o_totalprice")}) AS BIGINT) AS x
  FROM orders
  WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
  GROUP BY 1
),
walsh AS (
  SELECT a.x + b.x AS w2
  FROM daily a JOIN daily b ON a.d <= b.d
),
est AS (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM daily) AS n_days,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM walsh) AS n_walsh,
         (SELECT quantile_cont(w2, 0.5) FROM walsh) AS hl2_cents,
         (SELECT quantile_cont(x, 0.5) FROM daily) AS med_cents,
         (SELECT CAST(SUM(x) AS BIGINT) FROM daily) AS sum_cents
)
SELECT n_days, n_walsh,
       ROUND(hl2_cents / 200.0, 6) AS hl_estimate_dollars,
       ROUND(med_cents / 100.0, 6) AS median_dollars,
       ROUND(CAST(sum_cents AS DOUBLE) / n_days / 100.0, 6)
         AS mean_dollars
FROM est
"""


@register(
    "a_hodges_lehmann_estimator",
    oracle=_HL_ORACLE,
    tags=("A8", "A2", "J7", "J10", "F3"),
)
def a_hodges_lehmann_estimator(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hodges-Lehmann location estimate of daily revenue — the median
    of all pairwise Walsh averages (xᵢ+xⱼ)/2, i ≤ j: the estimator
    behind the Wilcoxon signed-rank test, ~95% as efficient as the mean
    under normality yet 29%-breakdown robust; reported next to the
    plain mean and median so a reader sees the three-way disagreement
    that flags skew.

    Determinism + scale design: Walsh sums stay DOUBLED integers
    (xᵢ+xⱼ, no halving float), and the n(n+1)/2 pair set is a theta
    self-join of the ≤366-row CALENDAR-bounded day rollup — 67k pairs
    regardless of data volume, the same bounded-pairs posture as
    Theil-Sen and Mann-Kendall. The exact median over an odd pair
    count selects an integer; both engines interpolate identically
    (Spark percentile ≡ DuckDB quantile_cont)."""
    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.filter(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1997-01-01")
        )
        .groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(F.sum(cents(F.col("o_totalprice"))).cast("long").alias("x"))
    )
    a = daily.select(F.col("d").alias("da"), F.col("x").alias("xa"))
    b = daily.select(F.col("d").alias("db"), F.col("x").alias("xb"))
    walsh = a.join(b, F.col("da") <= F.col("db")).select(
        (F.col("xa") + F.col("xb")).alias("w2")
    )
    n_days = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.percentile("x", F.lit(0.5)).alias("med_cents"),
        F.sum("x").cast("long").alias("sum_cents"),
    )
    hl = walsh.agg(
        F.count(F.lit(1)).cast("long").alias("n_walsh"),
        F.percentile("w2", F.lit(0.5)).alias("hl2_cents"),
    )
    return n_days.crossJoin(F.broadcast(hl)).select(
        "n_days",
        "n_walsh",
        F.round(F.col("hl2_cents") / 200.0, 6).alias("hl_estimate_dollars"),
        F.round(F.col("med_cents") / 100.0, 6).alias("median_dollars"),
        F.round(
            F.col("sum_cents").cast("double") / F.col("n_days") / 100.0, 6
        ).alias("mean_dollars"),
    )


# ---------------------------------------------------------------------------
# Customer segment migration matrix (tertile flows, 1996 -> 1997)
# ---------------------------------------------------------------------------

_MIGRATION_ORACLE = f"""
WITH spend AS (
  SELECT o_custkey AS ck, EXTRACT(year FROM o_orderdate) AS yr,
         CAST(SUM({CENTS_SQL.format(expr="o_totalprice")}) AS BIGINT) AS s
  FROM orders
  WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1998-01-01'
  GROUP BY 1, 2
),
seg AS (
  SELECT ck, yr,
         (ROW_NUMBER() OVER (PARTITION BY yr ORDER BY s, ck) - 1) * 3
           // COUNT(*) OVER (PARTITION BY yr) AS tertile
  FROM spend
),
flows AS (
  SELECT a.tertile AS seg_1996,
         COALESCE(b.tertile, -1) AS seg_1997,
         CAST(COUNT(*) AS BIGINT) AS n_customers
  FROM (SELECT * FROM seg WHERE yr = 1996) a
  LEFT JOIN (SELECT * FROM seg WHERE yr = 1997) b ON a.ck = b.ck
  GROUP BY 1, 2
)
SELECT CAST(seg_1996 AS BIGINT) AS seg_1996,
       CAST(seg_1997 AS BIGINT) AS seg_1997,
       n_customers,
       CAST(n_customers * 1000000
            // SUM(n_customers) OVER (PARTITION BY seg_1996) AS BIGINT)
         AS row_share_ppm,
       seg_1997 = seg_1996 AS is_retained_in_segment
FROM flows
ORDER BY seg_1996, seg_1997
"""


@register(
    "e_segment_migration_matrix",
    oracle=_MIGRATION_ORACLE,
    tags=("A1", "W1", "J3", "P6", "F3"),
)
def e_segment_migration_matrix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Customer spend-tertile migration matrix 1996 → 1997 — the
    segment-flow table (upgraded / downgraded / churned per tertile,
    with row-share ppm) that sits behind every retention deck; the
    diagonal is segment stickiness and the -1 column is churn.

    Determinism + scale design: tertiles use the explicit integer
    rank-bucket rule (rank−1)·3 DIV n with a (spend, custkey) total
    order — NTILE spelled out so ties are deterministic on both
    engines. The heavy pass is ONE (customer, year) rollup; the rank
    window runs per year over the customer rollup (the Pareto-deciles
    convention — at crawl scale the rank window becomes quantile
    cutpoints, same downstream matrix). Flows are one left join +
    combinable counts; shares are exact integer ppm."""
    orders = load_table(spark, sf_dir, "orders")
    spend = (
        orders.filter(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1998-01-01")
        )
        .groupBy(
            F.col("o_custkey").alias("ck"),
            F.year("o_orderdate").alias("yr"),
        )
        .agg(F.sum(cents(F.col("o_totalprice"))).cast("long").alias("s"))
    )
    w_rank = Window.partitionBy("yr").orderBy("s", "ck")
    w_n = Window.partitionBy("yr")
    seg = spend.select(
        "ck",
        "yr",
        ((F.row_number().over(w_rank) - 1) * 3).alias("_r3"),
        F.count(F.lit(1)).over(w_n).alias("_n"),
    ).select("ck", "yr", F.expr("_r3 DIV _n").alias("tertile"))
    a = seg.filter(F.col("yr") == 1996).select(
        "ck", F.col("tertile").alias("seg_1996")
    )
    b = seg.filter(F.col("yr") == 1997).select(
        "ck", F.col("tertile").alias("seg_1997_raw")
    )
    flows = (
        a.join(b, "ck", "left")
        .select(
            "seg_1996",
            F.coalesce(F.col("seg_1997_raw"), F.lit(-1)).alias("seg_1997"),
        )
        .groupBy("seg_1996", "seg_1997")
        .agg(F.count(F.lit(1)).cast("long").alias("n_customers"))
    )
    w_row = Window.partitionBy("seg_1996")
    return flows.select(
        F.col("seg_1996").cast("long").alias("seg_1996"),
        F.col("seg_1997").cast("long").alias("seg_1997"),
        "n_customers",
        F.expr(
            "n_customers * 1000000 DIV "
            "SUM(n_customers) OVER (PARTITION BY seg_1996)"
        )
        .cast("long")
        .alias("row_share_ppm"),
        (F.col("seg_1997") == F.col("seg_1996")).alias(
            "is_retained_in_segment"
        ),
    ).orderBy("seg_1996", "seg_1997")


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
# Price elasticity of demand from the discount ladder (log-log OLS)
# ---------------------------------------------------------------------------

_ELASTICITY_ORACLE = """
WITH buckets AS (
  SELECT CAST(ROUND(l_discount * 100) AS BIGINT) AS disc_pct,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
  FROM lineitem
  GROUP BY 1
),
pts AS (
  SELECT disc_pct,
         CAST(ROUND(LN(1.0 - disc_pct / 100.0) * 1000000) AS BIGINT)
           AS x_micro,
         CAST(ROUND(LN(CAST(q AS DOUBLE)) * 1000000) AS BIGINT) AS y_micro
  FROM buckets
),
stats AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(x_micro) AS BIGINT) AS sx,
         CAST(SUM(y_micro) AS BIGINT) AS sy,
         CAST(SUM(x_micro * y_micro) AS HUGEINT) AS sxy,
         CAST(SUM(x_micro * x_micro) AS HUGEINT) AS sxx
  FROM pts
)
SELECT n AS n_price_points,
       ROUND((n * sxy - sx * sy)
             / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS elasticity,
       (n * sxy - sx * sy)
         / CAST(n * sxx - sx * sx AS DOUBLE) < -1.0 AS is_elastic
FROM stats
"""


@register(
    "e_price_elasticity",
    oracle=_ELASTICITY_ORACLE,
    tags=("A1", "A2", "F3"),
)
def e_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price elasticity of demand read off the discount ladder:
    log-log OLS of total quantity on relative price (1 − discount)
    across the 11 discrete discount levels — elasticity < −1 means
    revenue-positive discounting (demand grows faster than price
    falls), the single number a pricing team asks for first.

    Determinism + scale design: the discount ladder is a DATA-MODEL
    constant (11 levels), so the heavy pass is ONE combinable groupBy
    to 11 rows; relative price is exact two-decimal arithmetic
    (disc_pct integer ÷ 100), both log leaves are micro-nat rounded
    BIGINTs, and the OLS runs on exact integer sufficient statistics —
    the Heaps/Zipf convention."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    buckets = lineitem.groupBy(
        F.round(F.col("l_discount") * 100).cast("long").alias("disc_pct")
    ).agg(F.sum(F.col("l_quantity").cast("long")).cast("long").alias("q"))
    pts = buckets.select(
        "disc_pct",
        F.expr(
            "CAST(ROUND(LN(1.0D - disc_pct / 100.0D) * 1000000) AS BIGINT)"
        ).alias("x_micro"),
        F.expr(
            "CAST(ROUND(LN(CAST(q AS DOUBLE)) * 1000000) AS BIGINT)"
        ).alias("y_micro"),
    )

    def dec(c: F.Column) -> F.Column:
        return c.cast("decimal(38,0)")

    stats = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x_micro").cast("long").alias("sx"),
        F.sum("y_micro").cast("long").alias("sy"),
        F.sum(dec(F.col("x_micro") * F.col("y_micro"))).alias("sxy"),
        F.sum(dec(F.col("x_micro") * F.col("x_micro"))).alias("sxx"),
    )
    nd = F.col("n").cast("decimal(38,0)")
    sxd = F.col("sx").cast("decimal(38,0)")
    slope = (nd * F.col("sxy") - sxd * F.col("sy")).cast("double") / (
        nd * F.col("sxx") - sxd * F.col("sx")
    ).cast("double")
    return stats.select(
        F.col("n").alias("n_price_points"),
        F.round(slope, 6).alias("elasticity"),
        (slope < -1.0).alias("is_elastic"),
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
# Negative-binomial method-of-moments fit for overdispersed daily counts
# ---------------------------------------------------------------------------

_NEGBIN_ORACLE = """
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
         CAST(SUM(c * c) AS BIGINT) AS ss
  FROM daily GROUP BY event_type
),
mv AS (
  SELECT t.event_type, p.n_days, t.s,
         CAST(t.s AS DOUBLE) / p.n_days AS m,
         (CAST(t.ss AS DOUBLE) - CAST(t.s AS DOUBLE) * t.s / p.n_days)
           / p.n_days AS v
  FROM stats t CROSS JOIN spine p
)
SELECT event_type, n_days, s AS n_events,
       ROUND(m, 6) AS mean_per_day,
       ROUND(v, 6) AS var_per_day,
       CASE WHEN v > m THEN ROUND(m * m / (v - m), 6) END AS nb_r,
       CASE WHEN v > m THEN ROUND(m / v, 6) END AS nb_p,
       v > m AS nb_applicable
FROM mv ORDER BY event_type
"""


@register(
    "a_negbin_moments_fit",
    oracle=_NEGBIN_ORACLE,
    tags=("A1", "A2", "P6", "F3"),
)
def a_negbin_moments_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Negative-binomial method-of-moments fit per event type — the
    parametric follow-up to `t_burstiness_fano`: once counts are
    overdispersed (v > m), NB(r, p) with r = m²/(v−m), p = m/v gives
    usable alert thresholds where Poisson quantiles false-alarm;
    nb_applicable routes types back to Poisson when v ≤ m (NULL
    params, never a negative r).

    Determinism + scale design: identical sufficient-statistics shape
    as the Fano query (zero-day-inclusive variance from active-day
    Σc/Σc² + the 1-row calendar day count — no densify); the two
    moment formulas are fixed-shape doubles on the per-type 1-row
    frame, guarded by an exact comparison so the CASE branch cannot
    disagree between engines."""
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
    )
    mv = stats.crossJoin(F.broadcast(spine)).select(
        "event_type",
        "n_days",
        "s",
        F.expr("CAST(s AS DOUBLE) / n_days").alias("m"),
        F.expr(
            "(CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n_days) / n_days"
        ).alias("v"),
    )
    return mv.select(
        "event_type",
        "n_days",
        F.col("s").alias("n_events"),
        F.round(F.col("m"), 6).alias("mean_per_day"),
        F.round(F.col("v"), 6).alias("var_per_day"),
        F.when(
            F.col("v") > F.col("m"),
            F.round(F.col("m") * F.col("m") / (F.col("v") - F.col("m")), 6),
        ).alias("nb_r"),
        F.when(
            F.col("v") > F.col("m"), F.round(F.col("m") / F.col("v"), 6)
        ).alias("nb_p"),
        (F.col("v") > F.col("m")).alias("nb_applicable"),
    ).orderBy("event_type")


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
# Attribution-window sensitivity sweep (last-click, w ∈ {1,3,7,14} days)
# ---------------------------------------------------------------------------

_ATTR_SWEEP_ORACLE = """
WITH ordered AS (
  SELECT user_id, ts, event_type,
         CAST(ROUND(value * 100) AS BIGINT) AS v_cents,
         MAX(CASE WHEN event_type = 'click' THEN EPOCH_US(ts) END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS last_click_us
  FROM events
),
purchases AS (
  SELECT v_cents,
         EPOCH_US(ts) - last_click_us AS gap_us
  FROM ordered WHERE event_type = 'purchase'
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_purchases,
         CAST(SUM(v_cents) AS BIGINT) AS rev_cents
  FROM purchases
),
sweep AS (
  SELECT w.w_days,
         CAST(SUM(CASE WHEN p.gap_us IS NOT NULL
                        AND p.gap_us <= w.w_days * 86400000000
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_attributed,
         CAST(SUM(CASE WHEN p.gap_us IS NOT NULL
                        AND p.gap_us <= w.w_days * 86400000000
                       THEN p.v_cents ELSE 0 END) AS BIGINT)
           AS attributed_cents
  FROM purchases p
  CROSS JOIN (SELECT UNNEST([1, 3, 7, 14]) AS w_days) w
  GROUP BY w.w_days
)
SELECT CAST(s.w_days AS BIGINT) AS window_days,
       t.n_purchases, s.n_attributed, s.attributed_cents,
       CAST(s.n_attributed * 1000000 // t.n_purchases AS BIGINT)
         AS attributed_share_ppm,
       CAST(s.attributed_cents * 1000000 // t.rev_cents AS BIGINT)
         AS revenue_share_ppm
FROM sweep s CROSS JOIN tot t
ORDER BY window_days
"""


@register(
    "e_attribution_window_sweep",
    oracle=_ATTR_SWEEP_ORACLE,
    tags=("A7", "W3", "W2", "F2", "J9"),
)
def e_attribution_window_sweep(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Attribution-window sensitivity: how much purchase count and
    revenue a LAST-CLICK model attributes at lookback windows of 1, 3,
    7, and 14 days — the table that settles 'our conversion rate
    doubled' arguments by showing how much of the lift is just a wider
    window (monotone by construction, so the marginal column between
    rows is the incremental claim).

    Scale design: the last-click timestamp comes from ONE per-user
    interleaved window pass (prefix MAX of click epoch-µs up to the
    PREVIOUS row, total order (ts, event_id)), so no click×purchase
    join exists; the 4-row window dim then fans each purchase out
    bounded-constant-fold wide. Gaps are exact integer microseconds;
    shares are exact integer ppm of the 1-row broadcast totals."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    ordered = events.select(
        "event_type",
        cents(F.col("value")).alias("v_cents"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.max(
            F.when(
                F.col("event_type") == "click",
                F.unix_micros(F.col("ts").cast("timestamp")),
            )
        )
        .over(w)
        .alias("last_click_us"),
    )
    purchases = ordered.filter(F.col("event_type") == "purchase").select(
        "v_cents", (F.col("ts_us") - F.col("last_click_us")).alias("gap_us")
    )
    tot = purchases.agg(
        F.count(F.lit(1)).cast("long").alias("n_purchases"),
        F.sum("v_cents").cast("long").alias("rev_cents"),
    )
    wins = spark.createDataFrame(
        [(1,), (3,), (7,), (14,)], ["w_days"]
    )
    attributed = F.col("gap_us").isNotNull() & (
        F.col("gap_us") <= F.col("w_days") * 86400000000
    )
    sweep = (
        purchases.crossJoin(F.broadcast(wins))
        .groupBy("w_days")
        .agg(
            F.sum(F.when(attributed, 1).otherwise(0))
            .cast("long")
            .alias("n_attributed"),
            F.sum(F.when(attributed, F.col("v_cents")).otherwise(0))
            .cast("long")
            .alias("attributed_cents"),
        )
    )
    return (
        sweep.crossJoin(F.broadcast(tot))
        .select(
            F.col("w_days").cast("long").alias("window_days"),
            "n_purchases",
            "n_attributed",
            "attributed_cents",
            F.expr("n_attributed * 1000000 DIV n_purchases")
            .cast("long")
            .alias("attributed_share_ppm"),
            F.expr("attributed_cents * 1000000 DIV rev_cents")
            .cast("long")
            .alias("revenue_share_ppm"),
        )
        .orderBy("window_days")
    )


# ---------------------------------------------------------------------------
# Iterative proportional fitting (raking) to population marginals
# ---------------------------------------------------------------------------

_IPF_ORACLE = """
WITH active AS (
  SELECT DISTINCT o_custkey FROM orders
  WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
),
dims AS (
  SELECT c.c_custkey, c.c_mktsegment AS seg, r.r_name AS region,
         CASE WHEN a.o_custkey IS NOT NULL THEN 1 ELSE 0 END AS is_active
  FROM customer c
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  LEFT JOIN active a ON c.c_custkey = a.o_custkey
),
cells AS (
  SELECT seg, region,
         CAST(SUM(is_active) AS BIGINT) AS m0,
         CAST(COUNT(*) AS BIGINT) AS pop
  FROM dims GROUP BY seg, region
),
t_seg AS (SELECT seg, CAST(SUM(pop) AS BIGINT) AS t FROM cells GROUP BY seg),
t_reg AS (SELECT region, CAST(SUM(pop) AS BIGINT) AS c FROM cells GROUP BY region),
base AS (
  SELECT cells.seg, cells.region, m0, pop,
         CAST(m0 AS DOUBLE) AS m, t_seg.t AS t, t_reg.c AS c
  FROM cells JOIN t_seg ON cells.seg = t_seg.seg
             JOIN t_reg ON cells.region = t_reg.region
),
i1r AS (SELECT *, m * t / SUM(m) OVER (PARTITION BY seg) AS m1 FROM base),
i1c AS (SELECT *, m1 * c / SUM(m1) OVER (PARTITION BY region) AS m2 FROM i1r),
i2r AS (SELECT *, m2 * t / SUM(m2) OVER (PARTITION BY seg) AS m3 FROM i1c),
i2c AS (SELECT *, m3 * c / SUM(m3) OVER (PARTITION BY region) AS m4 FROM i2r),
i3r AS (SELECT *, m4 * t / SUM(m4) OVER (PARTITION BY seg) AS m5 FROM i2c),
i3c AS (SELECT *, m5 * c / SUM(m5) OVER (PARTITION BY region) AS m6 FROM i3r),
rowsums AS (
  SELECT seg, region, m0, pop, m6, t,
         SUM(m6) OVER (PARTITION BY seg) AS rowsum
  FROM i3c
),
final AS (
  SELECT *, MAX(ABS(rowsum - t)) OVER () AS row_gap FROM rowsums
)
SELECT seg, region, m0 AS observed_active, pop AS population,
       ROUND(m6, 6) AS raked_estimate,
       ROUND(m6 / m0, 6) AS raking_weight,
       ROUND(row_gap, 6) AS max_rowsum_gap,
       row_gap < 1.0 AS converged_3_iters
FROM final
ORDER BY seg, region
"""


@register(
    "a_ipf_raking",
    oracle=_IPF_ORACLE,
    tags=("A1", "W3", "J1", "J2", "F3"),
)
def a_ipf_raking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative proportional fitting (raking): the 1996-active
    customer sample is reweighted so its (segment × region) cell
    estimates match BOTH population marginals — the survey
    post-stratification step behind every 'weighted to be
    representative' statistic; the per-cell raking weight is what a
    downstream weighted mean consumes. Three row/column iterations are
    UNROLLED as six window passes (IPF converges geometrically; the
    output carries the remaining row-marginal gap and a converged
    flag, so the truncation is honest).

    Scale design: the only data-sized work is one distinct-active
    semi-ish join and one (seg, region) rollup — the IPF itself runs
    entirely on the 25-cell bounded table, where window sums ARE the
    marginal sums. Deterministic: integer inputs, identical
    double-expression trees on both engines, 6-dp display rounding."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    active = (
        orders.filter(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1997-01-01")
        )
        .select("o_custkey")
        .distinct()
    )
    dims = (
        customer.join(
            F.broadcast(nation),
            customer.c_nationkey == nation.n_nationkey,
        )
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .join(active, customer.c_custkey == active.o_custkey, "left")
        .select(
            F.col("c_mktsegment").alias("seg"),
            F.col("r_name").alias("region"),
            F.when(F.col("o_custkey").isNotNull(), 1)
            .otherwise(0)
            .alias("is_active"),
        )
    )
    cells = dims.groupBy("seg", "region").agg(
        F.sum("is_active").cast("long").alias("m0"),
        F.count(F.lit(1)).cast("long").alias("pop"),
    )
    w_seg = Window.partitionBy("seg")
    w_reg = Window.partitionBy("region")
    w_all = Window.partitionBy()
    base = cells.select(
        "*",
        F.col("m0").cast("double").alias("m"),
        F.sum("pop").over(w_seg).cast("long").alias("t"),
        F.sum("pop").over(w_reg).cast("long").alias("c"),
    )
    cur = base
    col = "m"
    for i, (w, tgt) in enumerate(
        [(w_seg, "t"), (w_reg, "c")] * 3, start=1
    ):
        nxt = f"m{i}"
        cur = cur.withColumn(
            nxt,
            F.col(col) * F.col(tgt) / F.sum(F.col(col)).over(w),
        )
        col = nxt
    rowsums = cur.withColumn("rowsum", F.sum("m6").over(w_seg))
    final = rowsums.withColumn(
        "row_gap",
        F.max(F.abs(F.col("rowsum") - F.col("t"))).over(w_all),
    )
    return final.select(
        "seg",
        "region",
        F.col("m0").alias("observed_active"),
        F.col("pop").alias("population"),
        F.round(F.col("m6"), 6).alias("raked_estimate"),
        F.round(F.col("m6") / F.col("m0"), 6).alias("raking_weight"),
        F.round(F.col("row_gap"), 6).alias("max_rowsum_gap"),
        (F.col("row_gap") < 1.0).alias("converged_3_iters"),
    ).orderBy("seg", "region")


# ---------------------------------------------------------------------------
# Weibull fit of order-fulfilment durations (empirical-survival linearization)
# ---------------------------------------------------------------------------

_WEIBULL_ORACLE = """
WITH spans AS (
  SELECT o.o_orderkey,
         CAST(DATEDIFF('day', CAST(o.o_orderdate AS DATE),
                       MAX(CAST(l.l_shipdate AS DATE))) + 1 AS BIGINT) AS t
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  WHERE o.o_orderdate >= DATE '1996-01-01'
    AND o.o_orderdate < DATE '1997-01-01'
  GROUP BY o.o_orderkey, o.o_orderdate
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM spans),
per_t AS (
  SELECT t, CAST(COUNT(*) AS BIGINT) AS a FROM spans GROUP BY t
),
surv AS (
  SELECT t,
         CAST(SUM(a) OVER (ORDER BY t
           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS BIGINT)
           AS n_gt
  FROM per_t
),
pts AS (
  SELECT CAST(ROUND(LN(CAST(s.t AS DOUBLE)) * 1000000) AS BIGINT)
           AS x_micro,
         CAST(ROUND(LN(-LN(CAST(s.n_gt AS DOUBLE) / o.n)) * 1000000)
              AS BIGINT) AS y_micro
  FROM surv s CROSS JOIN tot o
  WHERE s.t > 0 AND s.n_gt > 0 AND s.n_gt < o.n
),
stats AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(x_micro) AS BIGINT) AS sx,
         CAST(SUM(y_micro) AS BIGINT) AS sy,
         CAST(SUM(x_micro * y_micro) AS HUGEINT) AS sxy,
         CAST(SUM(x_micro * x_micro) AS HUGEINT) AS sxx
  FROM pts
),
fit1 AS (
  SELECT n, sx, sy,
         (n * sxy - CAST(sx AS HUGEINT) * sy)
           / CAST(n * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE) AS k
  FROM stats
),
fit AS (
  SELECT n, k,
         (CAST(sy AS DOUBLE) / n / 1000000.0)
           - k * (CAST(sx AS DOUBLE) / n / 1000000.0) AS b0
  FROM fit1
)
SELECT n AS n_points,
       ROUND(k, 6) AS weibull_shape_k,
       ROUND(EXP(-b0 / k), 6) AS weibull_scale_days,
       k > 1.0 AS hazard_increasing
FROM fit
"""


@register(
    "e_weibull_survival_fit",
    oracle=_WEIBULL_ORACLE,
    tags=("A1", "W3", "F3", "F2", "J1"),
)
def e_weibull_survival_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weibull fit of order-fulfilment durations by linearizing the
    empirical survival curve: under Weibull lifetimes ln(−ln S(t)) is
    linear in ln t, so the OLS slope IS the shape k — k > 1 means the
    completion hazard RISES with order age (backlogs get cleared), the
    parametric readout that turns a duration histogram into a
    forecastable model with a scale in days. (The events table cannot
    host this fit: every synthetic user is active to the horizon, so
    the KM curve there is all-censored and flat — durations with real
    spread live on the fulfilment pipeline.)

    Determinism + scale design: one order-keyed max-ship rollup; the
    survival curve is a suffix-sum window over the bounded distinct-
    duration spine (n_gt = #orders strictly longer, exact integers);
    both log-log leaves are micro-nat rounded BIGINTs feeding the
    Heaps/Zipf exact-OLS form; degenerate endpoints (S = 0, S = 1)
    are excluded identically on both engines."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    spans = (
        orders.filter(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1997-01-01")
        )
        .join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .groupBy(
            "o_orderkey", F.col("o_orderdate").cast("date").alias("od")
        )
        .agg(
            (
                F.datediff(
                    F.max(F.col("l_shipdate").cast("date")), F.col("od")
                )
                + 1
            )
            .cast("long")
            .alias("t")
        )
    )
    tot = spans.agg(F.count(F.lit(1)).cast("long").alias("n"))
    per_t = spans.groupBy("t").agg(F.count(F.lit(1)).alias("a"))
    w_suffix = Window.orderBy("t").rowsBetween(
        1, Window.unboundedFollowing
    )
    surv = per_t.select(
        "t",
        F.sum("a").over(w_suffix).cast("long").alias("n_gt"),
    )
    pts = (
        surv.crossJoin(F.broadcast(tot))
        .filter(
            (F.col("t") > 0) & (F.col("n_gt") > 0) & (F.col("n_gt") < F.col("n"))
        )
        .select(
            F.expr(
                "CAST(ROUND(LN(CAST(t AS DOUBLE)) * 1000000) AS BIGINT)"
            ).alias("x_micro"),
            F.expr(
                "CAST(ROUND(LN(-LN(CAST(n_gt AS DOUBLE) / n)) * 1000000) "
                "AS BIGINT)"
            ).alias("y_micro"),
        )
    )

    def dec(c: F.Column) -> F.Column:
        return c.cast("decimal(38,0)")

    stats = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x_micro").cast("long").alias("sx"),
        F.sum("y_micro").cast("long").alias("sy"),
        F.sum(dec(F.col("x_micro") * F.col("y_micro"))).alias("sxy"),
        F.sum(dec(F.col("x_micro") * F.col("x_micro"))).alias("sxx"),
    )
    nd = F.col("n").cast("decimal(38,0)")
    sxd = F.col("sx").cast("decimal(38,0)")
    k = (nd * F.col("sxy") - sxd * F.col("sy")).cast("double") / (
        nd * F.col("sxx") - sxd * F.col("sx")
    ).cast("double")
    b0 = (F.col("sy").cast("double") / F.col("n") / 1000000.0) - k * (
        F.col("sx").cast("double") / F.col("n") / 1000000.0
    )
    return stats.select(
        F.col("n").alias("n_points"),
        F.round(k, 6).alias("weibull_shape_k"),
        F.round(F.exp(-b0 / k), 6).alias("weibull_scale_days"),
        (k > 1.0).alias("hazard_increasing"),
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
# Fleiss' kappa: agreement among THREE heuristic quality raters
# ---------------------------------------------------------------------------

_FLEISS_ORACLE = """
WITH rated AS (
  SELECT (CASE WHEN n_chars >= 500 THEN 1 ELSE 0 END)
       + (CASE WHEN LEN(LIST_DISTINCT(STRING_SPLIT(LOWER(text), ' ')))
                    * 10 >= LEN(STRING_SPLIT(LOWER(text), ' ')) * 3
               THEN 1 ELSE 0 END)
       + (CASE WHEN LENGTH(REGEXP_REPLACE(text, '[^.!?,;]', '', 'g')) * 50
                    <= LENGTH(text)
               THEN 1 ELSE 0 END) AS n_pos
  FROM documents
),
cells AS (
  SELECT n_pos, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM rated GROUP BY n_pos
),
stats AS (
  SELECT CAST(SUM(n_docs) AS BIGINT) AS n,
         CAST(SUM(n_docs * (n_pos * (n_pos - 1)
                            + (3 - n_pos) * (2 - n_pos))) AS BIGINT)
           AS agree_pairs,
         CAST(SUM(n_docs * n_pos) AS BIGINT) AS total_pos
  FROM cells
),
kappa AS (
  SELECT n, agree_pairs, total_pos,
         CAST(agree_pairs AS DOUBLE) / (n * 6) AS p_bar,
         (CAST(total_pos AS DOUBLE) / (n * 3))
           * (CAST(total_pos AS DOUBLE) / (n * 3))
         + (1.0 - CAST(total_pos AS DOUBLE) / (n * 3))
           * (1.0 - CAST(total_pos AS DOUBLE) / (n * 3)) AS p_e
  FROM stats
)
SELECT n AS n_docs, agree_pairs, total_pos,
       ROUND(p_bar, 6) AS observed_agreement,
       ROUND(p_e, 6) AS chance_agreement,
       ROUND((p_bar - p_e) / (1.0 - p_e), 6) AS fleiss_kappa,
       (p_bar - p_e) / (1.0 - p_e) > 0.4 AS moderate_or_better
FROM kappa
"""


@register(
    "a_fleiss_kappa",
    oracle=_FLEISS_ORACLE,
    tags=("A1", "A2", "F1", "F3"),
)
def a_fleiss_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleiss' kappa across THREE heuristic quality raters (length,
    lexical diversity, low punctuation density) voting accept/reject
    per document — the multi-rater generalization of Cohen's kappa
    (`a_cohens_kappa` covers the 2-rater case): are the heuristics
    measuring the same thing, or padding the ensemble?

    Determinism + scale design: with binary categories and 3 raters a
    document's agreement-pair count depends ONLY on its positive-vote
    count k — k(k−1) + (3−k)(2−k) — so the whole statistic reduces to
    ONE combinable 4-cell rollup (k ∈ 0..3); every input to the two
    fixed-shape double formulas (P̄ over n·3·2 rater pairs, Pₑ from
    the marginal) is an exact integer. Rater thresholds are spelled in
    cross-multiplied integer arithmetic — no float ratios before the
    vote."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.col("text")), " ")
    n_pos = (
        F.when(F.col("n_chars") >= 500, 1).otherwise(0)
        + F.when(
            F.size(F.array_distinct(toks)) * 10 >= F.size(toks) * 3, 1
        ).otherwise(0)
        + F.when(
            F.length(F.regexp_replace(F.col("text"), r"[^.!?,;]", "")) * 50
            <= F.length(F.col("text")),
            1,
        ).otherwise(0)
    )
    cells = (
        docs.select(n_pos.alias("n_pos"))
        .groupBy("n_pos")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )
    stats = cells.agg(
        F.sum("n_docs").cast("long").alias("n"),
        F.sum(
            F.col("n_docs")
            * (
                F.col("n_pos") * (F.col("n_pos") - 1)
                + (3 - F.col("n_pos")) * (2 - F.col("n_pos"))
            )
        )
        .cast("long")
        .alias("agree_pairs"),
        F.sum(F.col("n_docs") * F.col("n_pos")).cast("long").alias(
            "total_pos"
        ),
    )
    kappa = stats.select(
        "n",
        "agree_pairs",
        "total_pos",
        F.expr("CAST(agree_pairs AS DOUBLE) / (n * 6)").alias("p_bar"),
        F.expr(
            "(CAST(total_pos AS DOUBLE) / (n * 3)) "
            "* (CAST(total_pos AS DOUBLE) / (n * 3)) "
            "+ (1.0 - CAST(total_pos AS DOUBLE) / (n * 3)) "
            "* (1.0 - CAST(total_pos AS DOUBLE) / (n * 3))"
        ).alias("p_e"),
    )
    return kappa.select(
        F.col("n").alias("n_docs"),
        "agree_pairs",
        "total_pos",
        F.round(F.col("p_bar"), 6).alias("observed_agreement"),
        F.round(F.col("p_e"), 6).alias("chance_agreement"),
        F.round(
            (F.col("p_bar") - F.col("p_e")) / (1.0 - F.col("p_e")), 6
        ).alias("fleiss_kappa"),
        (
            (F.col("p_bar") - F.col("p_e")) / (1.0 - F.col("p_e")) > 0.4
        ).alias("moderate_or_better"),
    )


# ---------------------------------------------------------------------------
# Cronbach's alpha: internal consistency of the quality-score items
# ---------------------------------------------------------------------------

_CRONBACH_ORACLE = """
WITH items AS (
  SELECT LEAST(LENGTH(text), 1000) AS x1,
         LEAST(LEN(LIST_DISTINCT(STRING_SPLIT(LOWER(text), ' '))), 200)
           AS x2,
         LEAST(LEN(STRING_SPLIT(LOWER(text), ' ')), 300) AS x3
  FROM documents
),
sums AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x1) AS BIGINT) AS s1,
         CAST(SUM(CAST(x1 AS HUGEINT) * x1) AS HUGEINT) AS ss1,
         CAST(SUM(x2) AS BIGINT) AS s2,
         CAST(SUM(CAST(x2 AS HUGEINT) * x2) AS HUGEINT) AS ss2,
         CAST(SUM(x3) AS BIGINT) AS s3,
         CAST(SUM(CAST(x3 AS HUGEINT) * x3) AS HUGEINT) AS ss3,
         CAST(SUM(CAST(x1 + x2 + x3 AS HUGEINT) * (x1 + x2 + x3))
              AS HUGEINT) AS sst
  FROM items
),
vars AS (
  SELECT n,
         (CAST(ss1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n) / n AS v1,
         (CAST(ss2 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n) / n AS v2,
         (CAST(ss3 AS DOUBLE) - CAST(s3 AS DOUBLE) * s3 / n) / n AS v3,
         (CAST(sst AS DOUBLE)
          - CAST(s1 + s2 + s3 AS DOUBLE) * (s1 + s2 + s3) / n) / n AS vt
  FROM sums
)
SELECT n AS n_docs,
       ROUND(v1, 6) AS var_len, ROUND(v2, 6) AS var_uniq,
       ROUND(v3, 6) AS var_tok, ROUND(vt, 6) AS var_total,
       ROUND(1.5 * (1.0 - (v1 + v2 + v3) / vt), 6) AS cronbach_alpha,
       1.5 * (1.0 - (v1 + v2 + v3) / vt) >= 0.7 AS acceptable_reliability
FROM vars
"""


@register(
    "a_cronbach_alpha",
    oracle=_CRONBACH_ORACLE,
    tags=("A1", "A2", "F3", "F1"),
)
def a_cronbach_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cronbach's alpha for the three capped quality items (length,
    unique tokens, token count): α = k/(k−1) · (1 − Σ item var / total
    var) — the reliability coefficient that says whether the items
    form ONE scale worth averaging (the continuous companion to the
    Fleiss/Cohen kappa pair, which judge binary votes).

    Determinism + scale design: ONE combinable pass accumulates all
    seven sufficient statistics (per-item sums and squares plus the
    squared item-sum, widened before multiply); population variances
    and α are fixed-shape doubles on the 1-row frame — k/(k−1) is the
    literal 1.5. Items are capped with LEAST so a single pathological
    document cannot own the variance."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.col("text")), " ")
    items = docs.select(
        F.least(F.length("text"), F.lit(1000)).alias("x1"),
        F.least(F.size(F.array_distinct(toks)), F.lit(200)).alias("x2"),
        F.least(F.size(toks), F.lit(300)).alias("x3"),
    )

    def dec(c: F.Column) -> F.Column:
        return c.cast("decimal(38,0)")

    t = (F.col("x1") + F.col("x2") + F.col("x3")).alias("t")
    sums = items.select("x1", "x2", "x3", t).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x1").cast("long").alias("s1"),
        F.sum(dec(F.col("x1")) * F.col("x1")).alias("ss1"),
        F.sum("x2").cast("long").alias("s2"),
        F.sum(dec(F.col("x2")) * F.col("x2")).alias("ss2"),
        F.sum("x3").cast("long").alias("s3"),
        F.sum(dec(F.col("x3")) * F.col("x3")).alias("ss3"),
        F.sum(dec(F.col("t")) * F.col("t")).alias("sst"),
    )
    vars_ = sums.select(
        "n",
        F.expr(
            "(CAST(ss1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n) / n"
        ).alias("v1"),
        F.expr(
            "(CAST(ss2 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n) / n"
        ).alias("v2"),
        F.expr(
            "(CAST(ss3 AS DOUBLE) - CAST(s3 AS DOUBLE) * s3 / n) / n"
        ).alias("v3"),
        F.expr(
            "(CAST(sst AS DOUBLE) "
            "- CAST(s1 + s2 + s3 AS DOUBLE) * (s1 + s2 + s3) / n) / n"
        ).alias("vt"),
    )
    alpha = F.expr("1.5 * (1.0 - (v1 + v2 + v3) / vt)")
    return vars_.select(
        F.col("n").alias("n_docs"),
        F.round(F.col("v1"), 6).alias("var_len"),
        F.round(F.col("v2"), 6).alias("var_uniq"),
        F.round(F.col("v3"), 6).alias("var_tok"),
        F.round(F.col("vt"), 6).alias("var_total"),
        F.round(alpha, 6).alias("cronbach_alpha"),
        (alpha >= 0.7).alias("acceptable_reliability"),
    )


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
# Theil index with exact between/within decomposition across segments
# ---------------------------------------------------------------------------

_THEIL_ORACLE = f"""
WITH spend AS (
  SELECT c.c_mktsegment AS seg,
         CAST(SUM({CENTS_SQL.format(expr="o_totalprice")}) AS BIGINT) AS y
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY c.c_mktsegment, o.o_custkey
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS sy
  FROM spend
),
leafs AS (
  SELECT s.seg, s.y,
         CAST(ROUND((CAST(s.y AS DOUBLE) / t.sy)
                    * LN(CAST(s.y AS DOUBLE) * t.n / t.sy)
                    * 1000000000) AS BIGINT) AS t_nano
  FROM spend s CROSS JOIN tot t
),
seg_stats AS (
  SELECT l.seg,
         CAST(COUNT(*) AS BIGINT) AS n_g,
         CAST(SUM(l.y) AS BIGINT) AS sy_g,
         CAST(SUM(l.t_nano) AS BIGINT) AS t_total_contrib_nano
  FROM leafs l GROUP BY l.seg
),
between_terms AS (
  SELECT g.seg, g.n_g, g.sy_g, g.t_total_contrib_nano,
         CAST(ROUND((CAST(g.sy_g AS DOUBLE) / t.sy)
                    * LN((CAST(g.sy_g AS DOUBLE) / t.sy)
                         / (CAST(g.n_g AS DOUBLE) / t.n))
                    * 1000000000) AS BIGINT) AS between_nano
  FROM seg_stats g CROSS JOIN tot t
),
totals AS (
  SELECT CAST(SUM(t_total_contrib_nano) AS BIGINT) AS t_nano,
         CAST(SUM(between_nano) AS BIGINT) AS b_nano
  FROM between_terms
)
SELECT bt.seg, bt.n_g AS n_customers,
       ROUND(bt.between_nano / 1000000000.0, 6) AS between_contribution,
       ROUND((bt.t_total_contrib_nano - bt.between_nano) / 1000000000.0, 6)
         AS within_contribution,
       ROUND(t.t_nano / 1000000000.0, 6) AS theil_total,
       ROUND(t.b_nano / 1000000000.0, 6) AS theil_between,
       ROUND((t.t_nano - t.b_nano) / 1000000000.0, 6) AS theil_within,
       CAST(t.b_nano * 1000000 // t.t_nano AS BIGINT)
         AS between_share_ppm
FROM between_terms bt CROSS JOIN totals t
ORDER BY bt.seg
"""


@register(
    "a_theil_decomposition",
    oracle=_THEIL_ORACLE,
    tags=("A1", "J1", "F3", "J9"),
)
def a_theil_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil inequality index with its EXACT additive decomposition:
    T = T_between + T_within across market segments — the property
    Gini famously lacks, and the reason Theil is the tool for 'is
    spend inequality BETWEEN customer segments or WITHIN them?' (here
    between_share_ppm answers it directly; each segment row carries
    its own between and within contributions).

    Determinism + scale design: the heavy pass is one (segment,
    customer) rollup; every Theil leaf (y/Y)·ln(y·n/Y) is nano-nat
    rounded to an exact BIGINT before summation (the JSD/KM leaf
    convention), and the within term is derived as total − between
    from those same integers, so additivity is exact BY CONSTRUCTION
    in the output — a reader can check the decomposition with integer
    arithmetic."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    spend = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("seg"), "o_custkey")
        .agg(F.sum(cents(F.col("o_totalprice"))).cast("long").alias("y"))
        .select("seg", "y")
    )
    tot = spend.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("sy"),
    )
    leafs = spend.crossJoin(F.broadcast(tot)).select(
        "seg",
        "y",
        F.expr(
            "CAST(ROUND((CAST(y AS DOUBLE) / sy) "
            "* LN(CAST(y AS DOUBLE) * n / sy) * 1000000000) AS BIGINT)"
        ).alias("t_nano"),
    )
    seg_stats = leafs.groupBy("seg").agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum("y").cast("long").alias("sy_g"),
        F.sum("t_nano").cast("long").alias("t_total_contrib_nano"),
    )
    between = seg_stats.crossJoin(F.broadcast(tot)).select(
        "seg",
        "n_g",
        "sy_g",
        "t_total_contrib_nano",
        F.expr(
            "CAST(ROUND((CAST(sy_g AS DOUBLE) / sy) "
            "* LN((CAST(sy_g AS DOUBLE) / sy) "
            "/ (CAST(n_g AS DOUBLE) / n)) * 1000000000) AS BIGINT)"
        ).alias("between_nano"),
    )
    totals = between.agg(
        F.sum("t_total_contrib_nano").cast("long").alias("t_nano"),
        F.sum("between_nano").cast("long").alias("b_nano"),
    )
    return (
        between.crossJoin(F.broadcast(totals))
        .select(
            "seg",
            F.col("n_g").alias("n_customers"),
            F.round(F.col("between_nano") / 1000000000.0, 6).alias(
                "between_contribution"
            ),
            F.round(
                (F.col("t_total_contrib_nano") - F.col("between_nano"))
                / 1000000000.0,
                6,
            ).alias("within_contribution"),
            F.round(F.col("t_nano") / 1000000000.0, 6).alias(
                "theil_total"
            ),
            F.round(F.col("b_nano") / 1000000000.0, 6).alias(
                "theil_between"
            ),
            F.round(
                (F.col("t_nano") - F.col("b_nano")) / 1000000000.0, 6
            ).alias("theil_within"),
            F.expr("b_nano * 1000000 DIV t_nano").cast("long").alias(
                "between_share_ppm"
            ),
        )
        .orderBy("seg")
    )


# ---------------------------------------------------------------------------
# McNemar's test: do two paired binary raters disagree systematically?
# ---------------------------------------------------------------------------

_MCNEMAR_ORACLE = """
WITH rated AS (
  SELECT CASE WHEN n_chars >= 500 THEN 1 ELSE 0 END AS r1,
         CASE WHEN LEN(STRING_SPLIT(LOWER(text), ' ')) >= 80
              THEN 1 ELSE 0 END AS r2
  FROM documents
),
cells AS (
  SELECT CAST(SUM(r1 * (1 - r2)) AS BIGINT) AS b,
         CAST(SUM((1 - r1) * r2) AS BIGINT) AS c,
         CAST(SUM(r1 * r2) AS BIGINT) AS both_pos,
         CAST(SUM((1 - r1) * (1 - r2)) AS BIGINT) AS both_neg
  FROM rated
)
SELECT both_pos, both_neg, b AS only_rater1, c AS only_rater2,
       CAST(b + c AS BIGINT) AS n_discordant,
       ROUND(CAST((b - c) * (b - c) AS DOUBLE) / (b + c), 6)
         AS mcnemar_chi2,
       ROUND((CAST(ABS(b - c) AS DOUBLE) - 1.0)
             * (CAST(ABS(b - c) AS DOUBLE) - 1.0) / (b + c), 6)
         AS mcnemar_chi2_corrected,
       CAST((b - c) * (b - c) AS DOUBLE) / (b + c) > 3.841459
         AS raters_biased_at_05
FROM cells
"""


@register(
    "a_mcnemar_test",
    oracle=_MCNEMAR_ORACLE,
    tags=("A1", "A2", "A7", "F3"),
)
def a_mcnemar_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's test on the two paired quality raters that
    `a_cohens_kappa` scores for agreement: kappa asks 'do they agree?',
    McNemar asks the orthogonal question — 'when they DISAGREE, is it
    systematically one-sided?' (χ² = (b−c)²/(b+c) over the discordant
    cells only; a biased rater pair can still have high kappa). Both
    the raw and continuity-corrected statistics are reported against
    the χ²₁ critical value 3.841459 as a literal.

    Determinism + scale design: one combinable pass to the four
    2×2 cells (the kappa rollup shape); both test statistics are
    fixed-shape doubles over exact integers on a 1-row frame."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.col("text")), " ")
    rated = docs.select(
        F.when(F.col("n_chars") >= 500, 1).otherwise(0).alias("r1"),
        F.when(F.size(toks) >= 80, 1).otherwise(0).alias("r2"),
    )
    cells = rated.agg(
        F.sum(F.col("r1") * (1 - F.col("r2"))).cast("long").alias("b"),
        F.sum((1 - F.col("r1")) * F.col("r2")).cast("long").alias("c"),
        F.sum(F.col("r1") * F.col("r2")).cast("long").alias("both_pos"),
        F.sum((1 - F.col("r1")) * (1 - F.col("r2")))
        .cast("long")
        .alias("both_neg"),
    )
    return cells.select(
        "both_pos",
        "both_neg",
        F.col("b").alias("only_rater1"),
        F.col("c").alias("only_rater2"),
        (F.col("b") + F.col("c")).cast("long").alias("n_discordant"),
        F.expr(
            "ROUND(CAST((b - c) * (b - c) AS DOUBLE) / (b + c), 6)"
        ).alias("mcnemar_chi2"),
        F.expr(
            "ROUND((CAST(ABS(b - c) AS DOUBLE) - 1.0) "
            "* (CAST(ABS(b - c) AS DOUBLE) - 1.0) / (b + c), 6)"
        ).alias("mcnemar_chi2_corrected"),
        F.expr(
            "CAST((b - c) * (b - c) AS DOUBLE) / (b + c) > 3.841459"
        ).alias("raters_biased_at_05"),
    )


# ---------------------------------------------------------------------------
# Dorfman group testing: optimal pool size for defect screening
# ---------------------------------------------------------------------------

_DORFMAN_ORACLE = """
WITH defect AS (
  SELECT CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_def,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM lineitem
),
ks AS (SELECT UNNEST(GENERATE_SERIES(2, 12)) AS k),
plans AS (
  SELECT k.k, d.n_def, d.n,
         CAST(ROUND((1.0 / k.k + 1.0
                     - POWER(1.0 - CAST(d.n_def AS DOUBLE) / d.n, k.k))
                    * 1000000) AS BIGINT) AS tests_per_item_micro
  FROM ks k CROSS JOIN defect d
),
ranked AS (
  SELECT *, MIN(tests_per_item_micro) OVER () AS best_micro
  FROM plans
)
SELECT CAST(k AS BIGINT) AS pool_size,
       CAST(n_def * 1000000 // n AS BIGINT) AS defect_rate_ppm,
       ROUND(tests_per_item_micro / 1000000.0, 6) AS expected_tests_per_item,
       ROUND(1.0 - tests_per_item_micro / 1000000.0, 6) AS savings_vs_naive,
       tests_per_item_micro = best_micro AS is_optimal_pool
FROM ranked
ORDER BY pool_size
"""


@register(
    "a_dorfman_group_testing",
    oracle=_DORFMAN_ORACLE,
    tags=("A2", "A7", "F3", "J9"),
)
def a_dorfman_group_testing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dorfman pooled-testing plan: with defect rate p measured from
    the data (returned line items), expected tests per item for pool
    size k is 1/k + 1 − (1−p)^k — the WWII blood-screening optimization
    that modern QA reuses for batched inspection: the flagged row is
    the cost-minimizing pool size, and savings_vs_naive is the audit
    budget it frees (pooling only wins when p is small; the table
    makes that visible as savings going negative for large k at high
    p).

    Determinism + scale design: p comes from ONE combinable pass; the
    11-row pool-size grid is a broadcast dim; each plan's expected
    cost is micro-rounded at the leaf (POWER of the same double base
    and integer exponent on both engines) so the argmin compares exact
    integers — optimal-pool ties flag both rows identically."""
    li = load_table(spark, sf_dir, "lineitem")
    defect = li.agg(
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
        .cast("long")
        .alias("n_def"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    ks = spark.range(2, 13).select(F.col("id").cast("int").alias("k"))
    plans = ks.crossJoin(F.broadcast(defect)).select(
        "k",
        "n_def",
        "n",
        F.expr(
            "CAST(ROUND((1.0 / k + 1.0 "
            "- POWER(1.0 - CAST(n_def AS DOUBLE) / n, k)) "
            "* 1000000) AS BIGINT)"
        ).alias("tests_per_item_micro"),
    )
    ranked = plans.withColumn(
        "best_micro",
        F.min("tests_per_item_micro").over(Window.partitionBy()),
    )
    return ranked.select(
        F.col("k").cast("long").alias("pool_size"),
        F.expr("n_def * 1000000 DIV n").cast("long").alias(
            "defect_rate_ppm"
        ),
        F.round(F.col("tests_per_item_micro") / 1000000.0, 6).alias(
            "expected_tests_per_item"
        ),
        F.round(
            1.0 - F.col("tests_per_item_micro") / 1000000.0, 6
        ).alias("savings_vs_naive"),
        (F.col("tests_per_item_micro") == F.col("best_micro")).alias(
            "is_optimal_pool"
        ),
    ).orderBy("pool_size")


# ---------------------------------------------------------------------------
# ABC / XYZ classification matrix: revenue share × demand variability
# ---------------------------------------------------------------------------

_ABC_XYZ_ORACLE = """
WITH monthly AS (
  SELECT l_partkey,
         EXTRACT(year FROM l_shipdate) * 12
           + EXTRACT(month FROM l_shipdate) - 1 AS ym,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS rev
  FROM lineitem
  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
  GROUP BY 1, 2
),
per_part AS (
  SELECT l_partkey,
         CAST(SUM(rev) AS BIGINT) AS rev,
         CAST(SUM(q) AS BIGINT) AS sq,
         CAST(SUM(q * q) AS BIGINT) AS sqq
  FROM monthly GROUP BY l_partkey
),
ranked AS (
  SELECT *,
         SUM(rev) OVER (ORDER BY rev DESC, l_partkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_rev,
         SUM(rev) OVER () AS tot_rev
  FROM per_part
),
classed AS (
  SELECT l_partkey, rev,
         CASE WHEN cum_rev * 10 <= tot_rev * 7 THEN 'A'
              WHEN cum_rev * 10 <= tot_rev * 9 THEN 'B'
              ELSE 'C' END AS abc,
         (CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * sq / 12) / 12 AS v,
         CAST(sq AS DOUBLE) / 12 AS m
  FROM ranked
),
xyz AS (
  SELECT l_partkey, rev, abc,
         CASE WHEN v * 4 < m * m THEN 'X'
              WHEN v < m * m THEN 'Y'
              ELSE 'Z' END AS xyz
  FROM classed
)
SELECT abc, xyz,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(rev) AS BIGINT) AS revenue_cents,
       CAST(SUM(rev) * 1000000 // (SELECT SUM(rev) FROM per_part)
            AS BIGINT) AS revenue_share_ppm
FROM xyz
GROUP BY abc, xyz
ORDER BY abc, xyz
"""


@register(
    "e_abc_xyz_matrix",
    oracle=_ABC_XYZ_ORACLE,
    tags=("A1", "W1", "W3", "F3", "F2"),
)
def e_abc_xyz_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC/XYZ inventory segmentation: parts classed by cumulative
    revenue share (A ≤ 70%, B ≤ 90%, C tail — the Pareto axis) crossed
    with monthly demand variability (X: CV < 0.5 — forecastable;
    Y: CV < 1; Z: erratic), the 9-cell matrix that decides stocking
    policy per class (AX: automate; CZ: make-to-order). The census
    reports part counts and exact revenue share per cell.

    Determinism + scale design: one (part, month) rollup feeds both
    axes; zero months enter the variance through the active-month
    identity (Σq, Σq² over 12 known months — the Fano convention); the
    ABC cut uses exact cross-multiplied integers (cum·10 ≤ tot·7, no
    float shares), and the CV bands compare v against m² with integer
    factors (CV < ½ ⇔ 4v < m²) so no square root or division is ever
    taken. The revenue rank window runs over the parts rollup — the
    documented Pareto-deciles posture (quantile cutpoints at crawl
    scale)."""
    li = load_table(spark, sf_dir, "lineitem")
    monthly = (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
        )
        .groupBy(
            "l_partkey",
            (F.year("l_shipdate") * 12 + F.month("l_shipdate") - 1).alias(
                "ym"
            ),
        )
        .agg(
            F.sum(F.col("l_quantity").cast("long")).cast("long").alias("q"),
            F.sum(cents(F.col("l_extendedprice"))).cast("long").alias(
                "rev"
            ),
        )
    )
    per_part = monthly.groupBy("l_partkey").agg(
        F.sum("rev").cast("long").alias("rev"),
        F.sum("q").cast("long").alias("sq"),
        F.sum(F.col("q") * F.col("q")).cast("long").alias("sqq"),
    )
    w_cum = Window.orderBy(F.col("rev").desc(), "l_partkey").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = per_part.select(
        "*",
        F.sum("rev").over(w_cum).alias("cum_rev"),
        F.sum("rev").over(Window.partitionBy()).alias("tot_rev"),
    )
    classed = ranked.select(
        "l_partkey",
        "rev",
        F.when(F.col("cum_rev") * 10 <= F.col("tot_rev") * 7, "A")
        .when(F.col("cum_rev") * 10 <= F.col("tot_rev") * 9, "B")
        .otherwise("C")
        .alias("abc"),
        F.expr(
            "(CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * sq / 12) / 12"
        ).alias("v"),
        F.expr("CAST(sq AS DOUBLE) / 12").alias("m"),
    )
    xyz = classed.select(
        "rev",
        "abc",
        F.when(F.col("v") * 4 < F.col("m") * F.col("m"), "X")
        .when(F.col("v") < F.col("m") * F.col("m"), "Y")
        .otherwise("Z")
        .alias("xyz"),
    )
    tot = per_part.agg(F.sum("rev").cast("long").alias("t"))
    return (
        xyz.groupBy("abc", "xyz")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.sum("rev").cast("long").alias("revenue_cents"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "abc",
            "xyz",
            "n_parts",
            "revenue_cents",
            F.expr("revenue_cents * 1000000 DIV t")
            .cast("long")
            .alias("revenue_share_ppm"),
        )
        .orderBy("abc", "xyz")
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


# ---------------------------------------------------------------------------
# Minimum-detectable-effect vs experiment runtime planning curve
# ---------------------------------------------------------------------------

_MDE_CURVE_ORACLE = f"""
WITH spend AS (
  SELECT o_custkey AS ck,
         CAST(SUM({CENTS_SQL.format(expr="o_totalprice")}) AS BIGINT) AS y
  FROM orders
  WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
  GROUP BY o_custkey
),
pop AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_year,
         CAST(SUM(y) AS BIGINT) AS s,
         CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS ss
  FROM spend
),
weeks AS (SELECT UNNEST(GENERATE_SERIES(1, 8)) AS w),
curve AS (
  SELECT wk.w, p.n_year,
         CAST(p.n_year * wk.w // 52 // 2 AS BIGINT) AS n_per_arm,
         (CAST(p.ss AS DOUBLE) - CAST(p.s AS DOUBLE) * p.s / p.n_year)
           / p.n_year AS v,
         CAST(p.s AS DOUBLE) / p.n_year AS mu
  FROM weeks wk CROSS JOIN pop p
)
SELECT CAST(w AS BIGINT) AS runtime_weeks,
       n_per_arm,
       ROUND(mu / 100, 6) AS mean_spend_dollars,
       ROUND((2.801582 * SQRT(2.0 * v / n_per_arm)) / 100, 6)
         AS mde_dollars,
       CAST(ROUND(2.801582 * SQRT(2.0 * v / n_per_arm) / mu * 1000000)
            AS BIGINT) AS mde_relative_ppm,
       2.801582 * SQRT(2.0 * v / n_per_arm) / mu < 0.05
         AS can_detect_5pct
FROM curve
ORDER BY runtime_weeks
"""


@register(
    "e_mde_runtime_curve",
    oracle=_MDE_CURVE_ORACLE,
    tags=("A1", "A2", "F3", "J9"),
)
def e_mde_runtime_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum detectable effect as a function of experiment RUNTIME:
    with per-customer spend variance measured from the data and
    enrollment proportional to weeks live (n/arm = yearly actives ×
    w/52 ÷ 2), MDE(w) = (z_{α/2} + z_β)·√(2σ²/n) — the planning curve
    behind 'how long must this A/B run to see 5%?'
    (`e_power_analysis` answers the inverse one-point question; the
    curve is what goes in the experiment-review doc, and the
    can_detect_5pct column is the go/no-go row).

    Determinism + scale design: ONE combinable customer rollup feeds
    exact n/Σy/Σy² (widened); the 8-week grid is a broadcast dim;
    z_{0.025} + z_{0.2} = 2.801582 is a literal (the power-analysis
    convention); per-arm counts use integer floor division so both
    engines walk identical sample sizes."""
    orders = load_table(spark, sf_dir, "orders")
    spend = (
        orders.filter(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1997-01-01")
        )
        .groupBy(F.col("o_custkey").alias("ck"))
        .agg(F.sum(cents(F.col("o_totalprice"))).cast("long").alias("y"))
    )
    pop = spend.agg(
        F.count(F.lit(1)).cast("long").alias("n_year"),
        F.sum("y").cast("long").alias("s"),
        F.sum(F.col("y").cast("decimal(38,0)") * F.col("y")).alias("ss"),
    )
    weeks = spark.range(1, 9).select(F.col("id").cast("int").alias("w"))
    curve = weeks.crossJoin(F.broadcast(pop)).select(
        "w",
        F.expr("CAST(n_year * w DIV 52 DIV 2 AS BIGINT)").alias(
            "n_per_arm"
        ),
        F.expr(
            "(CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n_year) "
            "/ n_year"
        ).alias("v"),
        F.expr("CAST(s AS DOUBLE) / n_year").alias("mu"),
    )
    return curve.select(
        F.col("w").cast("long").alias("runtime_weeks"),
        "n_per_arm",
        F.round(F.col("mu") / 100, 6).alias("mean_spend_dollars"),
        F.round(
            (2.801582 * F.sqrt(2.0 * F.col("v") / F.col("n_per_arm")))
            / 100,
            6,
        ).alias("mde_dollars"),
        F.expr(
            "CAST(ROUND(2.801582 * SQRT(2.0 * v / n_per_arm) / mu "
            "* 1000000) AS BIGINT)"
        ).alias("mde_relative_ppm"),
        F.expr(
            "2.801582 * SQRT(2.0 * v / n_per_arm) / mu < 0.05"
        ).alias("can_detect_5pct"),
    ).orderBy("runtime_weeks")


# ---------------------------------------------------------------------------
# Jackknife standard error of the Gini (leave-one-segment-out)
# ---------------------------------------------------------------------------

_JACKKNIFE_GINI_ORACLE = f"""
WITH spend AS (
  SELECT c.c_mktsegment AS seg, o.o_custkey AS ck,
         CAST(SUM({CENTS_SQL.format(expr="o_totalprice")}) AS BIGINT) AS y
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
),
segs AS (SELECT DISTINCT seg AS excl FROM spend),
reps AS (
  SELECT g.excl, s.ck, s.y
  FROM spend s CROSS JOIN segs g
  WHERE s.seg <> g.excl
),
ranked AS (
  SELECT excl, y,
         ROW_NUMBER() OVER (PARTITION BY excl ORDER BY y, ck) AS i
  FROM reps
),
ginis AS (
  SELECT excl,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(y) AS BIGINT) AS total,
         CAST(SUM(CAST(i AS HUGEINT) * y) AS HUGEINT) AS weighted
  FROM ranked GROUP BY excl
),
theta AS (
  SELECT excl,
         CAST(ROUND((2.0 * CAST(weighted AS DOUBLE)
          - (n + 1.0) * total) / (CAST(n AS DOUBLE) * total)
          * 1000000000) AS BIGINT) AS g_nano
  FROM ginis
),
jack AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_reps,
         CAST(SUM(g_nano) AS BIGINT) AS sg_nano,
         CAST(SUM(CAST(g_nano AS HUGEINT) * g_nano) AS HUGEINT) AS sgg
  FROM theta
),
fin AS (
  SELECT n_reps,
         CAST(sg_nano AS DOUBLE) / n_reps / 1000000000.0 AS gbar,
         SQRT((n_reps - 1.0) / n_reps
              * (CAST(sgg AS DOUBLE)
                 - CAST(sg_nano AS DOUBLE) * sg_nano / n_reps))
           / 1000000000.0 AS se
  FROM jack
)
SELECT n_reps,
       ROUND(gbar, 6) AS mean_loo_gini,
       ROUND(se, 6) AS jackknife_se,
       ROUND(gbar - 2.0 * se, 6) AS ci_lo,
       ROUND(gbar + 2.0 * se, 6) AS ci_hi
FROM fin
"""


@register(
    "a_jackknife_gini_se",
    oracle=_JACKKNIFE_GINI_ORACLE,
    tags=("A1", "W1", "J1", "F3", "J9"),
)
def a_jackknife_gini_se(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-one-GROUP jackknife standard error for the spend Gini —
    the resampling answer to 'is 0.41 ± what?' for a statistic with no
    closed-form variance: five leave-one-segment-out replicates, SE =
    √((G−1)/G · Σ(θᵢ−θ̄)²), and a ±2SE interval. Grouped deletion
    (not delete-one-row) is what makes resampling tractable in one
    query: G replicates ≡ a G-row dim, not n re-runs.

    Determinism + scale design: the replicate fan-out is spend ×
    5-segment dim with the excluded segment filtered — an honest G×
    data cost, the price of any jackknife; each replicate's Gini uses
    the exact integer rank form (rank windows PARTITIONED BY excluded
    segment, so replicates never interleave); each θᵢ is nano-rounded
    to an exact BIGINT at the leaf so the 5-term jackknife sums are
    pure integers (the leaf-rounding convention — a raw double sum
    over a hash-agg frame has no fixed order)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    spend = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.col("o_custkey").alias("ck"),
        )
        .agg(F.sum(cents(F.col("o_totalprice"))).cast("long").alias("y"))
    )
    segs = spend.select(F.col("seg").alias("excl")).distinct()
    reps = spend.crossJoin(F.broadcast(segs)).filter(
        F.col("seg") != F.col("excl")
    )
    w_rank = Window.partitionBy("excl").orderBy("y", "ck")
    ranked = reps.select(
        "excl", "y", F.row_number().over(w_rank).alias("i")
    )
    ginis = ranked.groupBy("excl").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("total"),
        F.sum(F.col("i").cast("decimal(38,0)") * F.col("y")).alias(
            "weighted"
        ),
    )
    theta = ginis.select(
        "excl",
        F.expr(
            "CAST(ROUND((2.0 * CAST(weighted AS DOUBLE) "
            "- (n + 1.0) * total) / (CAST(n AS DOUBLE) * total) "
            "* 1000000000) AS BIGINT)"
        ).alias("g_nano"),
    )
    jack = theta.agg(
        F.count(F.lit(1)).cast("long").alias("n_reps"),
        F.sum("g_nano").cast("long").alias("sg_nano"),
        F.sum(
            F.col("g_nano").cast("decimal(38,0)") * F.col("g_nano")
        ).alias("sgg"),
    )
    fin = jack.select(
        "n_reps",
        F.expr(
            "CAST(sg_nano AS DOUBLE) / n_reps / 1000000000.0"
        ).alias("gbar"),
        F.expr(
            "SQRT((n_reps - 1.0) / n_reps * (CAST(sgg AS DOUBLE) "
            "- CAST(sg_nano AS DOUBLE) * sg_nano / n_reps)) "
            "/ 1000000000.0"
        ).alias("se"),
    )
    return fin.select(
        "n_reps",
        F.round(F.col("gbar"), 6).alias("mean_loo_gini"),
        F.round(F.col("se"), 6).alias("jackknife_se"),
        F.round(F.col("gbar") - 2.0 * F.col("se"), 6).alias("ci_lo"),
        F.round(F.col("gbar") + 2.0 * F.col("se"), 6).alias("ci_hi"),
    )
