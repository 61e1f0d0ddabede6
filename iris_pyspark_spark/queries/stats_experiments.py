"""Experimentation & product-metric statistics (split from
stats_analytics.py, round 5): A/B effect estimators (Welch, CUPED,
IPW, diff-in-diff, quantile effects), survival/retention/LTV curves,
funnels and decompositions.

Shared scale discipline (SURVEY.md §2.12): every float statistic is
computed FROM exact-integer sufficient statistics (counts, cents sums,
cents sums-of-squares as BIGINT) aggregated with combinable SUM/COUNT —
map-side partial aggregation applies, partition layout cannot change a
bit. The float formula is then evaluated once per output row with an
identical expression tree in Spark and DuckDB (IEEE doubles: same
operands + same operation order = same bits; sqrt is correctly rounded
by spec), and rounded to 6 decimals on both sides.
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
         u.l >= h.max_day AS censored
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
    first and last observed event). Users still active on the FINAL
    observed day are right-CENSORED: they
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
        (F.col("l") >= F.col("max_day")).alias("censored"),
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



