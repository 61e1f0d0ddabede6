"""Measurement-quality & experiment-design statistics (split from
stats_analytics.py, round 5): rater agreement (kappa family),
reliability (Cronbach, ICC), sample-ratio/paradox audits, group
testing, power/MDE/SPRT design curves, exact permutation testing,
Bradley-Terry preference-strength fitting.

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
# Exact permutation test via deterministic md5 re-randomizations
# ---------------------------------------------------------------------------

_PERM_TEST_ORACLE = f"""
WITH per_user AS (
  SELECT user_id,
         CASE WHEN (user_id * 48271) % 100 < 50 THEN 1 ELSE 0 END AS in_a,
         SUM({CENTS_SQL.format(expr="value")}) AS spend_cents
  FROM events GROUP BY user_id
),
sizes AS (
  SELECT CAST(SUM(in_a) AS BIGINT) AS n_a,
         COUNT(*) AS n_users,
         CAST(SUM(CASE WHEN in_a = 1 THEN spend_cents ELSE 0 END)
              AS BIGINT) AS stat_obs
  FROM per_user
),
perms AS (SELECT UNNEST(RANGE(1, 200)) AS perm_id),
ranked AS (
  SELECT p.perm_id, u.spend_cents,
         ROW_NUMBER() OVER (
           PARTITION BY p.perm_id
           ORDER BY MD5(CONCAT(CAST(p.perm_id AS VARCHAR), ':',
                               CAST(u.user_id AS VARCHAR))), u.user_id
         ) AS rk
  FROM per_user u CROSS JOIN perms p
),
perm_stats AS (
  SELECT r.perm_id, SUM(r.spend_cents) AS stat_perm
  FROM ranked r, sizes s
  WHERE r.rk <= s.n_a
  GROUP BY r.perm_id
)
SELECT s.n_users, s.n_a, 199 AS n_perms,
       s.stat_obs AS stat_obs_cents,
       CAST(SUM(CASE WHEN p.stat_perm >= s.stat_obs THEN 1 ELSE 0 END)
            AS BIGINT) AS n_ge,
       ROUND((1.0 + SUM(CASE WHEN p.stat_perm >= s.stat_obs
                             THEN 1 ELSE 0 END)) / 200.0, 6) AS p_value
FROM perm_stats p, sizes s
GROUP BY s.n_users, s.n_a, s.stat_obs
"""


@register(
    "e_permutation_test_exact",
    oracle=_PERM_TEST_ORACLE,
    tags=("A1", "A2", "J9", "F7", "W1"),
)
def e_permutation_test_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact (Monte-Carlo-free) permutation test of the arm-A total-spend
    statistic under 199 DETERMINISTIC re-randomizations: permutation p
    reassigns users to a pseudo-arm-A of the observed size by ranking on
    md5(p:user_id) — a fixed, seedless shuffle both engines reproduce
    bit-identically, so the p-value is a hash-checkable exact rational
    (1 + #{perm stat >= observed}) / 200. The distribution-free
    counterpart to `e_welch_ttest` on the same randomization unit.

    Scale: ONE user-keyed combinable aggregation of the fact table, then
    the (users x 199) expansion happens on the tiny per-user rollup —
    each permutation is an independent window partition, so the work
    fans out across the cluster by perm_id and nothing ever shuffles the
    raw events twice. All statistics are exact BIGINT cents.
    """
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.sum(cents(F.col("value"))).alias("spend_cents")
    ).withColumn(
        "in_a",
        F.when((F.col("user_id") * 48271) % 100 < 50, 1).otherwise(0),
    )
    # The 1-row observed-statistic aggregate would otherwise re-scan the
    # fact through per_user's lineage a second time (once for sizes, once
    # under the permutation fan-out). Collect the bounded row and inline
    # its three scalars, so events is scanned exactly once per run.
    obs = per_user.agg(
        F.sum("in_a").cast("bigint").alias("n_a"),
        F.count(F.lit(1)).alias("n_users"),
        F.sum(
            F.when(F.col("in_a") == 1, F.col("spend_cents")).otherwise(0)
        ).alias("stat_obs"),
    ).collect()[0]
    sizes = spark.createDataFrame(
        [(obs.n_a, obs.n_users, obs.stat_obs)],
        "n_a long, n_users long, stat_obs long",
    )
    perms = spark.range(1, 200).select(F.col("id").alias("perm_id"))
    ranked = per_user.crossJoin(broadcast(perms)).withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("perm_id").orderBy(
                F.md5(
                    F.concat(
                        F.col("perm_id").cast("string"),
                        F.lit(":"),
                        F.col("user_id").cast("string"),
                    )
                ),
                F.col("user_id"),
            )
        ),
    )
    perm_stats = (
        ranked.join(broadcast(sizes), F.col("rk") <= F.col("n_a"))
        .groupBy("perm_id", "n_users", "n_a", "stat_obs")
        .agg(F.sum("spend_cents").alias("stat_perm"))
    )
    out = perm_stats.groupBy("n_users", "n_a", "stat_obs").agg(
        F.sum(
            F.when(F.col("stat_perm") >= F.col("stat_obs"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_ge"),
        F.round(
            (
                1.0
                + F.sum(
                    F.when(
                        F.col("stat_perm") >= F.col("stat_obs"), 1
                    ).otherwise(0)
                )
            )
            / 200.0,
            6,
        ).alias("p_value"),
    )
    return out.select(
        "n_users",
        "n_a",
        F.lit(199).alias("n_perms"),
        F.col("stat_obs").alias("stat_obs_cents"),
        "n_ge",
        "p_value",
    )


# ---------------------------------------------------------------------------
# Bradley-Terry pairwise-strength fit (two MM iterations, exact terms)
# ---------------------------------------------------------------------------

_BT_ORACLE = f"""
WITH li AS (
  SELECT l_orderkey, l_suppkey,
         {CENTS_SQL.format(expr="l_extendedprice")} AS price_cents
  FROM lineitem
),
contests AS (
  SELECT sn1.n_name AS nation_i, sn2.n_name AS nation_j,
         CASE WHEN a.price_cents > b.price_cents THEN 1 ELSE 0 END AS win_i
  FROM li a
  JOIN li b ON a.l_orderkey = b.l_orderkey
  JOIN supplier s1 ON a.l_suppkey = s1.s_suppkey
  JOIN supplier s2 ON b.l_suppkey = s2.s_suppkey
  JOIN nation sn1 ON s1.s_nationkey = sn1.n_nationkey
  JOIN nation sn2 ON s2.s_nationkey = sn2.n_nationkey
  WHERE sn1.n_name < sn2.n_name AND a.price_cents <> b.price_cents
),
pair_counts AS (
  SELECT nation_i, nation_j,
         COUNT(*) AS n_games,
         CAST(SUM(win_i) AS BIGINT) AS wins_i
  FROM contests GROUP BY nation_i, nation_j
),
directed AS (
  SELECT nation_i AS nation, nation_j AS opp, n_games,
         wins_i AS wins FROM pair_counts
  UNION ALL
  SELECT nation_j AS nation, nation_i AS opp, n_games,
         n_games - wins_i AS wins FROM pair_counts
),
w1 AS (
  SELECT nation,
         CAST(SUM(n_games) AS BIGINT) AS games,
         CAST(SUM(wins) AS BIGINT) AS wins,
         ROUND(2.0 * SUM(wins) / SUM(n_games), 6) AS w1
  FROM directed GROUP BY nation
),
mm2 AS (
  SELECT d.nation,
         SUM(CAST(ROUND(1000000000.0 * d.n_games / (wi.w1 + wj.w1))
             AS BIGINT)) AS denom_nanos
  FROM directed d
  JOIN w1 wi ON d.nation = wi.nation
  JOIN w1 wj ON d.opp = wj.nation
  GROUP BY d.nation
)
SELECT w.nation, w.games, w.wins, w.w1,
       ROUND(w.wins / (m.denom_nanos / 1000000000.0), 6) AS w2
FROM w1 w JOIN mm2 m ON w.nation = m.nation
ORDER BY w.nation
"""


@register(
    "e_bradley_terry_strength",
    oracle=_BT_ORACLE,
    tags=("J10", "J1", "A1", "W1"),
)
def e_bradley_terry_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley-Terry pairwise-preference strength fit — the model behind
    reward-model / RLHF preference data and ranking leaderboards — run
    for two minorization-maximization iterations from the uniform start.
    Contests: within each order, every pair of line items from suppliers
    of different nations is a game won by the pricier item. Iteration 1
    collapses to w1 = 2*wins/games exactly (uniform opponents); iteration
    2 is the real MM update w2 = wins / SUM_j(n_ij / (w1_i + w1_j)).

    Determinism: each MM denominator term is rounded to an exact nano
    BIGINT before the order-sensitive SUM, so partition order cannot
    change a bit. Scale: the only fan-out is the per-order self-join
    (bounded: <= 7 items/order in TPC-H shape), keyed on l_orderkey —
    co-partitioned, no cartesian; nations are a 25-row broadcast."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_suppkey",
        cents(F.col("l_extendedprice")).alias("price_cents"),
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    sn = broadcast(
        s.join(broadcast(n), s.s_nationkey == n.n_nationkey).select(
            "s_suppkey", "n_name"
        )
    )
    a = (
        li.join(sn, li.l_suppkey == sn.s_suppkey)
        .select("l_orderkey", F.col("n_name").alias("nation_i"), "price_cents")
    )
    b = (
        li.join(sn, li.l_suppkey == sn.s_suppkey)
        .select(
            F.col("l_orderkey").alias("bo"),
            F.col("n_name").alias("nation_j"),
            F.col("price_cents").alias("price_j"),
        )
    )
    contests = a.join(
        b,
        (a.l_orderkey == b.bo)
        & (F.col("nation_i") < F.col("nation_j"))
        & (F.col("price_cents") != F.col("price_j")),
    ).select(
        "nation_i",
        "nation_j",
        F.when(F.col("price_cents") > F.col("price_j"), 1)
        .otherwise(0)
        .alias("win_i"),
    )
    pair_counts = contests.groupBy("nation_i", "nation_j").agg(
        F.count(F.lit(1)).alias("n_games"),
        F.sum("win_i").cast("bigint").alias("wins_i"),
    )
    # pair_counts is bounded by nations^2/2 (<= 300 rows) but its lineage
    # is the full order-internal contest join; three downstream consumers
    # (w1, both mm2 sides) would re-run that join once each. Collect the
    # bounded aggregate and rebuild it as a literal frame — the same
    # bounded-rollup collect pattern as the similarity slabs — so the
    # heavy pass runs exactly once at any scale.
    pair_counts = spark.createDataFrame(
        pair_counts.collect(),
        "nation_i string, nation_j string, n_games long, wins_i long",
    )
    directed = pair_counts.select(
        F.col("nation_i").alias("nation"),
        F.col("nation_j").alias("opp"),
        "n_games",
        F.col("wins_i").alias("wins"),
    ).unionByName(
        pair_counts.select(
            F.col("nation_j").alias("nation"),
            F.col("nation_i").alias("opp"),
            "n_games",
            (F.col("n_games") - F.col("wins_i")).alias("wins"),
        )
    )
    w1 = directed.groupBy("nation").agg(
        F.sum("n_games").cast("bigint").alias("games"),
        F.sum("wins").cast("bigint").alias("wins"),
        F.round(2.0 * F.sum("wins") / F.sum("n_games"), 6).alias("w1"),
    )
    wi = w1.select(F.col("nation").alias("ni"), F.col("w1").alias("w1_i"))
    wj = w1.select(F.col("nation").alias("nj"), F.col("w1").alias("w1_j"))
    mm2 = (
        directed.join(broadcast(wi), F.col("nation") == F.col("ni"))
        .join(broadcast(wj), F.col("opp") == F.col("nj"))
        .groupBy("nation")
        .agg(
            F.sum(
                F.round(
                    1000000000.0
                    * F.col("n_games")
                    / (F.col("w1_i") + F.col("w1_j")),
                    0,
                ).cast("bigint")
            ).alias("denom_nanos")
        )
    )
    return (
        w1.join(mm2, "nation")
        .select(
            "nation",
            "games",
            "wins",
            "w1",
            F.round(
                F.col("wins") / (F.col("denom_nanos") / 1000000000.0), 6
            ).alias("w2"),
        )
        .orderBy("nation")
    )
