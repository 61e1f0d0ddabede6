"""Sorts / limits / set operations (SURVEY.md §2.6, O1–O4).

`ORDER BY ... LIMIT k` compiles to TakeOrderedAndProject in Spark —
each partition keeps only its local top-k before a single merge, so the
pattern is scale-safe (no global sort materialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "o_sort_limit",
    oracle="""
SELECT p_partkey, p_name, p_retailprice
FROM part
ORDER BY p_retailprice DESC, p_partkey ASC
LIMIT 20
""",
    tags=("O1", "O2"),
)
def o_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return (
        part.select("p_partkey", "p_name", "p_retailprice")
        .orderBy(F.col("p_retailprice").desc(), F.col("p_partkey").asc())
        .limit(20)
    )


@register(
    "o_union_all",
    oracle="""
SELECT kind, COUNT(*) AS n FROM (
  SELECT 'hot'  AS kind, event_id FROM events WHERE event_type = 'click'
  UNION ALL
  SELECT 'cold' AS kind, event_id FROM events WHERE event_type = 'error'
) t GROUP BY kind
""",
    tags=("O3",),
)
def o_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    hot = events.filter(F.col("event_type") == "click").select(
        F.lit("hot").alias("kind"), "event_id"
    )
    cold = events.filter(F.col("event_type") == "error").select(
        F.lit("cold").alias("kind"), "event_id"
    )
    return hot.unionByName(cold).groupBy("kind").agg(F.count(F.lit(1)).alias("n"))


@register(
    "o_union_distinct",
    oracle="""
SELECT user_id FROM events WHERE event_type = 'purchase'
UNION
SELECT user_id FROM events WHERE event_type = 'signup'
""",
    tags=("O3", "P7"),
)
def o_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    a = events.filter(F.col("event_type") == "purchase").select("user_id")
    b = events.filter(F.col("event_type") == "signup").select("user_id")
    return a.union(b).distinct()


@register(
    "o_intersect",
    oracle="""
SELECT o_custkey AS key FROM orders
INTERSECT
SELECT user_id AS key FROM events
""",
    tags=("O4",),
)
def o_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    events = load_table(spark, sf_dir, "events")
    return orders.select(F.col("o_custkey").alias("key")).intersect(
        events.select(F.col("user_id").alias("key"))
    )


@register(
    "o_except",
    oracle="""
SELECT c_custkey AS key FROM customer WHERE c_custkey < 200
EXCEPT
SELECT user_id AS key FROM events WHERE event_type = 'purchase'
""",
    tags=("O4",),
)
def o_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    events = load_table(spark, sf_dir, "events")
    lhs = customer.filter(F.col("c_custkey") < 200).select(
        F.col("c_custkey").alias("key")
    )
    rhs = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("key")
    )
    # SQL EXCEPT is distinct-based; Spark's subtract() matches that.
    return lhs.subtract(rhs)


@register(
    "o_setops_all",
    oracle="""
SELECT op, c_nationkey, c_mktsegment, COUNT(*) AS n FROM (
  SELECT 'intersect_all' AS op, * FROM (
    SELECT c_nationkey, c_mktsegment FROM customer WHERE c_acctbal > 0
    INTERSECT ALL
    SELECT c_nationkey, c_mktsegment FROM customer WHERE c_mktsegment = 'BUILDING'
  )
  UNION ALL
  SELECT 'except_all' AS op, * FROM (
    SELECT c_nationkey, c_mktsegment FROM customer WHERE c_acctbal > 0
    EXCEPT ALL
    SELECT c_nationkey, c_mktsegment FROM customer WHERE c_mktsegment = 'BUILDING'
  )
) t GROUP BY op, c_nationkey, c_mktsegment
""",
    tags=("O4", "O3"),
)
def o_setops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset (ALL) set-op semantics: intersectAll/exceptAll keep
    duplicate multiplicities (SQL INTERSECT ALL / EXCEPT ALL), unlike
    the distinct-based intersect/subtract in o_intersect/o_except.
    Results are rolled up to (op, key, count) so the check is
    order-free."""
    customer = load_table(spark, sf_dir, "customer")
    lhs = customer.filter(F.col("c_acctbal") > 0).select(
        "c_nationkey", "c_mktsegment"
    )
    rhs = customer.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_nationkey", "c_mktsegment"
    )
    both = lhs.intersectAll(rhs).withColumn("op", F.lit("intersect_all"))
    only = lhs.exceptAll(rhs).withColumn("op", F.lit("except_all"))
    return (
        both.unionByName(only)
        .groupBy("op", "c_nationkey", "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "o_union_by_name_evolution",
    oracle="""
SELECT key, price, seg FROM (
  SELECT o_orderkey AS key, o_totalprice AS price FROM orders WHERE o_orderkey < 300
  UNION ALL BY NAME
  SELECT c_custkey AS key, c_mktsegment AS seg FROM customer WHERE c_custkey < 100
)
""",
    tags=("O3", "S1"),
)
def o_union_by_name_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolving union: unionByName(allowMissingColumns=True)
    aligns by column NAME and null-fills gaps (DuckDB: UNION ALL BY
    NAME) — how a pipeline appends a v2 batch whose schema gained or
    lost columns without positional corruption."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    a = orders.filter(F.col("o_orderkey") < 300).select(
        F.col("o_orderkey").alias("key"), F.col("o_totalprice").alias("price")
    )
    b = customer.filter(F.col("c_custkey") < 100).select(
        F.col("c_custkey").alias("key"), F.col("c_mktsegment").alias("seg")
    )
    return a.unionByName(b, allowMissingColumns=True).select("key", "price", "seg")


# --- LIMIT/OFFSET pagination ------------------------------------------------

_PAGINATION_ORACLE = """
SELECT c_custkey, c_name, c_acctbal
FROM customer
ORDER BY c_acctbal DESC, c_custkey
LIMIT 25 OFFSET 50
"""


@register("o_offset_pagination", oracle=_PAGINATION_ORACLE, tags=("O1", "O2"))
def o_offset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page 3 of a leaderboard: total order (tie-broken), OFFSET 50,
    LIMIT 25. Spark executes sort + offset + limit as a single
    TakeOrdered-style boundary collecting only offset+limit rows per
    partition — pagination never materializes the full sort. (Deep
    pagination still degrades linearly in offset; keyset pagination —
    WHERE key > last_seen — is the constant-cost form, same plan as
    this one's filter+limit.)"""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.select("c_custkey", "c_name", "c_acctbal")
        .orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
        .offset(50)
        .limit(25)
    )


# --- O4: multiset (ALL) set operations — EXCEPT ALL / INTERSECT ALL ---------

_MULTISET_ORACLE = """
WITH l AS (
  SELECT l_partkey AS key, COUNT(*) AS cl FROM lineitem
  WHERE l_returnflag = 'R' GROUP BY 1
),
r AS (
  SELECT l_partkey AS key, COUNT(*) AS cr FROM lineitem
  WHERE l_returnflag = 'A' GROUP BY 1
),
joined AS (
  SELECT COALESCE(l.key, r.key) AS key,
         COALESCE(cl, 0) AS cl, COALESCE(cr, 0) AS cr
  FROM l FULL OUTER JOIN r ON l.key = r.key
)
SELECT key,
       CAST(cl AS BIGINT) AS n_returned,
       CAST(cr AS BIGINT) AS n_accepted,
       CAST(GREATEST(cl - cr, 0) AS BIGINT) AS except_all_copies,
       CAST(LEAST(cl, cr) AS BIGINT) AS intersect_all_copies
FROM joined
WHERE GREATEST(cl - cr, 0) >= 3
ORDER BY key
"""


@register(
    "o_except_all_intersect_all",
    oracle=_MULTISET_ORACLE,
    tags=("O4", "O3", "J3", "A1"),
)
def o_except_all_intersect_all(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Multiset set operations: EXCEPT ALL keeps max(cl−cr, 0) copies
    and INTERSECT ALL keeps min(cl, cr) — the bag semantics DISTINCT
    set-ops silently destroy (auditing 'how many MORE returned than
    accepted line items does each part have' needs multiplicities,
    not membership). The query runs Spark's native exceptAll /
    intersectAll operators and verifies their per-key copy counts
    against the count-difference identity.

    Scale design: Spark plans exceptAll/intersectAll as
    count-aggregate + generate (replicate) — exactly the identity the
    oracle states — so both engines do two combinable counts + one
    key-equi full-outer join; no row-level anti semantics at scale.
    The ≥3-copies filter keeps output bounded and non-vacuous."""
    li = load_table(spark, sf_dir, "lineitem")
    lhs = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_partkey").alias("key")
    )
    rhs = li.filter(F.col("l_returnflag") == "A").select(
        F.col("l_partkey").alias("key")
    )
    except_all = lhs.exceptAll(rhs).groupBy("key").agg(
        F.count(F.lit(1)).cast("long").alias("except_all_copies")
    )
    intersect_all = lhs.intersectAll(rhs).groupBy("key").agg(
        F.count(F.lit(1)).cast("long").alias("intersect_all_copies")
    )
    cl = lhs.groupBy("key").agg(
        F.count(F.lit(1)).cast("long").alias("n_returned")
    )
    cr = rhs.groupBy("key").agg(
        F.count(F.lit(1)).cast("long").alias("n_accepted")
    )
    return (
        cl.join(cr, "key", "full_outer")
        .select(
            "key",
            F.coalesce("n_returned", F.lit(0)).alias("n_returned"),
            F.coalesce("n_accepted", F.lit(0)).alias("n_accepted"),
        )
        .join(except_all, "key", "left")
        .join(intersect_all, "key", "left")
        .select(
            "key",
            "n_returned",
            "n_accepted",
            F.coalesce("except_all_copies", F.lit(0)).alias(
                "except_all_copies"
            ),
            F.coalesce("intersect_all_copies", F.lit(0)).alias(
                "intersect_all_copies"
            ),
        )
        .filter(F.col("except_all_copies") >= 3)
        .orderBy("key")
    )


# --- O4, third wave: symmetric difference ------------------------------------

_SYMDIFF_ORACLE = """
WITH clickers AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
buyers   AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
only_click AS (SELECT user_id FROM clickers EXCEPT SELECT user_id FROM buyers),
only_buy   AS (SELECT user_id FROM buyers   EXCEPT SELECT user_id FROM clickers)
SELECT 'click_only' AS side, CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(MIN(user_id) AS BIGINT) AS min_user FROM only_click
UNION ALL
SELECT 'purchase_only', CAST(COUNT(*) AS BIGINT), CAST(MIN(user_id) AS BIGINT)
FROM only_buy
ORDER BY side
"""


@register(
    "o_symmetric_difference",
    oracle=_SYMDIFF_ORACLE,
    tags=("O4", "O3", "A2", "P7"),
)
def o_symmetric_difference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4, third wave: symmetric difference of two behavioral cohorts —
    users who click but never buy and users who buy but never click —
    as two EXCEPT DISTINCT arms unioned with a side label. EXCEPT
    compiles to a left-anti hash join after per-side dedup, so each arm
    is one shuffle on the key; the sides stay labeled rather than
    merged, because 'which direction is missing' IS the analysis.

    Scale: dedup-before-except keeps the anti-join inputs at distinct-
    key cardinality, not event cardinality."""
    events = load_table(spark, sf_dir, "events")
    clickers = (
        events.filter(F.col("event_type") == "click").select("user_id").distinct()
    )
    buyers = (
        events.filter(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
    )
    def arm(side: str, a: DataFrame, b: DataFrame) -> DataFrame:
        return (
            a.exceptAll(b)
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_users"),
                F.min("user_id").cast("long").alias("min_user"),
            )
            .select(F.lit(side).alias("side"), "n_users", "min_user")
        )
    return arm("click_only", clickers, buyers).unionByName(
        arm("purchase_only", buyers, clickers)
    ).orderBy("side")


# --- O4+A2, sixth wave: cohort INTERSECT/EXCEPT with a one-row readout -------

_COHORT_SETOPS_ORACLE = """
WITH hi AS (
  SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 300000
),
urgent AS (
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
)
SELECT
  CAST((SELECT COUNT(*) FROM hi)     AS BIGINT) AS n_high_value,
  CAST((SELECT COUNT(*) FROM urgent) AS BIGINT) AS n_urgent,
  CAST((SELECT COUNT(*) FROM (SELECT * FROM hi INTERSECT SELECT * FROM urgent))
       AS BIGINT) AS n_both,
  CAST((SELECT COUNT(*) FROM (SELECT * FROM hi EXCEPT SELECT * FROM urgent))
       AS BIGINT) AS n_high_only,
  CAST((SELECT COUNT(*) FROM (SELECT * FROM urgent EXCEPT SELECT * FROM hi))
       AS BIGINT) AS n_urgent_only
"""


@register("o_cohort_setops_census", oracle=_COHORT_SETOPS_ORACLE, tags=("O4", "A2"))
def o_cohort_setops_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4+A2, sixth wave: two customer cohorts (high-value vs urgent-
    priority buyers) related by INTERSECT and both EXCEPT directions in
    one readout row — the audit identity n_both + n_high_only =
    n_high_value is visible in the output itself.

    Scale: both cohorts are pre-DISTINCTed at customer-key cardinality
    BEFORE the set ops, so intersect/except hash-join keys, never raw
    order rows; the five global counts are combinable single-long
    aggregates crossed into one row (1-row joins, no data movement)."""
    orders = load_table(spark, sf_dir, "orders")
    hi = (
        orders.filter(F.col("o_totalprice") > 300000)
        .select("o_custkey")
        .distinct()
    )
    urgent = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
        .distinct()
    )
    both = hi.intersect(urgent)
    hi_only = hi.subtract(urgent)
    urgent_only = urgent.subtract(hi)

    def one(df: DataFrame, name: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).cast("long").alias(name)).withColumn(
            "_k", F.lit(1)
        )

    out = (
        one(hi, "n_high_value")
        .join(one(urgent, "n_urgent"), "_k")
        .join(one(both, "n_both"), "_k")
        .join(one(hi_only, "n_high_only"), "_k")
        .join(one(urgent_only, "n_urgent_only"), "_k")
    )
    return out.drop("_k")


# --- O1+O3+F2, seventh wave: calendar spine union with gap ranking ------------

_SPINE_GAP_ORACLE = """
WITH spine AS (
  SELECT y.y AS yr, m.m AS mon
  FROM generate_series(1992, 1998) AS y(y), generate_series(1, 12) AS m(m)
),
actual AS (
  SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS yr,
         CAST(MONTH(o_orderdate) AS BIGINT) AS mon,
         CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY 1, 2
),
dense AS (
  SELECT CAST(spine.yr AS BIGINT) AS yr, CAST(spine.mon AS BIGINT) AS mon,
         CAST(COALESCE(actual.n_orders, 0) AS BIGINT) AS n_orders
  FROM spine LEFT JOIN actual
    ON spine.yr = actual.yr AND spine.mon = actual.mon
)
SELECT yr, mon, n_orders,
       CAST(CASE WHEN n_orders = 0 THEN 1 ELSE 0 END AS BIGINT) AS is_gap,
       CAST(RANK() OVER (ORDER BY n_orders DESC, yr ASC, mon ASC) AS BIGINT)
         AS busy_rank
FROM dense
ORDER BY yr, mon
"""


@register(
    "o_spine_gap_rank",
    oracle=_SPINE_GAP_ORACLE,
    tags=("O1", "O3", "F2", "W1"),
)
def o_spine_gap_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1+O3, seventh wave: calendar DENSIFICATION — a complete month
    spine (sequence + explode, zero driver loops) left-joined with the
    actual per-month order counts so silent gaps surface as explicit
    zero rows, then a global busy-season RANK with a pinned total
    order (count desc, then calendar asc) and an ORDER BY on the
    output. The spine/actual reconciliation is the reporting shape
    where 'no data' must be distinguishable from 'no row'.

    Scale: the spine is 84 rows — broadcast side; the fact aggregate
    is one combinable shuffle; the global rank operates on the 84-row
    densified result, not the fact."""
    from pyspark.sql.window import Window

    spine = (
        spark.range(1)
        .select(
            F.explode(
                F.sequence(
                    F.lit("1992-01-01").cast("date"),
                    F.lit("1998-12-01").cast("date"),
                    F.expr("INTERVAL 1 MONTH"),
                )
            ).alias("month_start")
        )
        .select(
            F.year("month_start").cast("long").alias("yr"),
            F.month("month_start").cast("long").alias("mon"),
        )
    )
    orders = load_table(spark, sf_dir, "orders")
    actual = orders.groupBy(
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mon"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
    dense = spine.join(actual, ["yr", "mon"], "left").select(
        "yr",
        "mon",
        F.coalesce("n_orders", F.lit(0)).cast("long").alias("n_orders"),
    )
    w = Window.orderBy(
        F.desc("n_orders"), F.asc("yr"), F.asc("mon")
    )
    return (
        dense.select(
            "yr",
            "mon",
            "n_orders",
            (F.col("n_orders") == 0).cast("long").alias("is_gap"),
            F.rank().over(w).cast("long").alias("busy_rank"),
        )
        .orderBy("yr", "mon")
    )


# --- O4+P7, seventh wave: day-over-day cohort set operations ------------------

_COHORT_FLUX_ORACLE = """
WITH du AS (
  SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
),
retained AS (
  SELECT d + INTERVAL 1 DAY AS d, user_id FROM du
  INTERSECT
  SELECT d, user_id FROM du
),
churned AS (
  SELECT d + INTERVAL 1 DAY AS d, user_id FROM du
  EXCEPT
  SELECT d, user_id FROM du
)
SELECT CAST(STRFTIME(m.d, '%Y-%m-%d') AS VARCHAR) AS day_key,
       CAST(COALESCE(r.n, 0) AS BIGINT) AS n_retained,
       CAST(COALESCE(c.n, 0) AS BIGINT) AS n_lost
FROM (SELECT DISTINCT d FROM du WHERE d > (SELECT MIN(d) FROM du)) m
LEFT JOIN (SELECT CAST(d AS DATE) AS d, COUNT(*) AS n
           FROM retained GROUP BY 1) r ON r.d = m.d
LEFT JOIN (SELECT CAST(d AS DATE) AS d, COUNT(*) AS n
           FROM churned GROUP BY 1) c ON c.d = m.d
"""


@register(
    "o_cohort_flux_setops",
    oracle=_COHORT_FLUX_ORACLE,
    tags=("O4", "P7", "F2"),
)
def o_cohort_flux_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4+P7, seventh wave: day-over-day user-base FLUX computed with
    REAL set operators — the previous day's (day+1, user) set
    INTERSECT this day's set is retention, EXCEPT is churn — applied
    GLOBALLY in one pass over the distinct (day, user) grid (the P7
    distinct), not per day pair in a loop. The day spine for the
    output rows is the observed days after the first (the events table
    spans one month of days, so days are the churn granularity).

    Scale: the distinct grid is one hash shuffle of |active
    user-days|; INTERSECT/EXCEPT hash-join the shifted copy of the
    SAME grid (no re-scan of the fact); the final census is a tiny
    day-keyed rollup."""
    e = load_table(spark, sf_dir, "events")
    du = e.select(
        F.col("ts").cast("date").alias("d"),
        "user_id",
    ).distinct()
    shifted = du.select(F.date_add(F.col("d"), 1).alias("d"), "user_id")
    retained = shifted.intersect(du)
    # shifted is already distinct (a 1:1 date shift of the distinct
    # grid), so set EXCEPT is the direct spelling of the oracle.
    churned = shifted.subtract(du)
    days = (
        du.select("d")
        .distinct()
        .join(
            du.select(F.min("d").alias("first_d")),
            F.col("d") > F.col("first_d"),
        )
        .select("d")
    )
    r_cnt = retained.groupBy("d").agg(F.count(F.lit(1)).alias("rn"))
    c_cnt = churned.groupBy("d").agg(F.count(F.lit(1)).alias("cn"))
    return (
        days.join(r_cnt, "d", "left")
        .join(c_cnt, "d", "left")
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day_key"),
            F.coalesce("rn", F.lit(0)).cast("long").alias("n_retained"),
            F.coalesce("cn", F.lit(0)).cast("long").alias("n_lost"),
        )
    )


# === Eighth wave (round 10): O4 depth restocks =================================

# --- O4+P7+F2, eighth wave: weekday/weekend user-set algebra --------------------

_WEEKDAY_SETOPS_ORACLE = """
WITH du AS (
  SELECT DISTINCT user_id, ISODOW(ts) AS dow FROM events
),
weekday_users AS (SELECT DISTINCT user_id FROM du WHERE dow <= 5),
weekend_users AS (SELECT DISTINCT user_id FROM du WHERE dow >= 6),
cats AS (
  SELECT 'weekend_only' AS category, COUNT(*) AS n FROM
    (SELECT user_id FROM weekend_users EXCEPT SELECT user_id FROM weekday_users)
  UNION ALL
  SELECT 'weekday_only', COUNT(*) FROM
    (SELECT user_id FROM weekday_users EXCEPT SELECT user_id FROM weekend_users)
  UNION ALL
  SELECT 'both', COUNT(*) FROM
    (SELECT user_id FROM weekday_users INTERSECT
     SELECT user_id FROM weekend_users)
)
SELECT category, CAST(n AS BIGINT) AS n_users FROM cats
"""


@register(
    "o_weekday_cohort_except",
    oracle=_WEEKDAY_SETOPS_ORACLE,
    tags=("O4", "P7", "F2"),
)
def o_weekday_cohort_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4+P7+F2, eighth wave: user-base partition by CALENDAR BEHAVIOR
    with real set operators — the distinct (user, ISO-weekday) grid
    (P7) splits into weekday and weekend activity sets (F2: dayofweek
    on event time), and EXCEPT both ways plus INTERSECT yield the
    weekend-only / weekday-only / both trichotomy as one 3-row census.
    The three counts partition the active-user total, so the invariant
    n(weekend_only)+n(weekday_only)+n(both) = |active users| makes any
    set-operator defect arithmetically visible.

    Scale: the distinct grid is one hash shuffle of |user x 7|; each
    set op hash-joins two <=|users| sets; no fact re-scan after the
    grid."""
    e = load_table(spark, sf_dir, "events")
    du = e.select(
        "user_id",
        F.dayofweek(F.col("ts")).alias("dow_sun1"),  # Sunday=1 convention
    ).distinct()
    # ISO dow (Mon=1..Sun=7) from Spark's Sunday=1 dayofweek, kept
    # integer: iso = ((dow_sun1 + 5) % 7) + 1.
    du = du.select(
        "user_id", (((F.col("dow_sun1") + 5) % 7) + 1).alias("dow")
    )
    weekday_users = du.filter(F.col("dow") <= 5).select("user_id").distinct()
    weekend_users = du.filter(F.col("dow") >= 6).select("user_id").distinct()
    weekend_only = weekend_users.subtract(weekday_users)
    weekday_only = weekday_users.subtract(weekend_users)
    both = weekday_users.intersect(weekend_users)

    def n(df: DataFrame, label: str) -> DataFrame:
        return df.agg(
            F.lit(label).alias("category"),
            F.count(F.lit(1)).cast("long").alias("n_users"),
        )

    return (
        n(weekend_only, "weekend_only")
        .unionByName(n(weekday_only, "weekday_only"))
        .unionByName(n(both, "both"))
    )


# --- O4+P7+S5, eighth wave: symmetric difference over a pruned partitioned read --

_SYMDIFF_PRUNE_ORACLE = """
WITH p_users AS (
  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
),
c_users AS (
  SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
),
cats AS (
  SELECT 'purchase_no_click' AS category, COUNT(*) AS n FROM
    (SELECT user_id FROM p_users EXCEPT SELECT user_id FROM c_users)
  UNION ALL
  SELECT 'click_no_purchase', COUNT(*) FROM
    (SELECT user_id FROM c_users EXCEPT SELECT user_id FROM p_users)
  UNION ALL
  SELECT 'both', COUNT(*) FROM
    (SELECT user_id FROM p_users INTERSECT SELECT user_id FROM c_users)
)
SELECT category, CAST(n AS BIGINT) AS n_users FROM cats
"""


@register(
    "o_segment_symdiff_prune",
    oracle=_SYMDIFF_PRUNE_ORACLE,
    tags=("O4", "P7", "S5"),
)
def o_segment_symdiff_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4+P7+S5, eighth wave: SYMMETRIC DIFFERENCE of behavior cohorts
    computed over a PARTITION-PRUNED read — events are exported
    hive-partitioned by event_type (S5), the audit reads back ONLY the
    purchase and click branches (a partition-column filter the scan
    resolves against directory names — 2 of 5 directories touched),
    takes each branch's distinct user set (P7), and states the symdiff
    via EXCEPT both ways plus the INTERSECT (O4). This is the funnel
    diagnosis query ('who buys without clicking?') in its cheapest
    physical form: pruning makes the scan proportional to the cohorts
    examined, not the event firehose.

    Scale: the partitioned export is one shuffle on event_type; the
    pruned read touches 2 partitions regardless of how many types
    exist; set ops hash-join <=|users| sets."""
    from ..sources import scratch_dir

    path = scratch_dir(sf_dir, "events_by_type_parquet")
    e = load_table(spark, sf_dir, "events").select("user_id", "event_type")
    e.repartition("event_type").write.mode("overwrite").partitionBy(
        "event_type"
    ).parquet(path)
    back = spark.read.parquet(path)
    p_users = (
        back.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    )
    c_users = (
        back.filter(F.col("event_type") == "click").select("user_id").distinct()
    )

    def n(df: DataFrame, label: str) -> DataFrame:
        return df.agg(
            F.lit(label).alias("category"),
            F.count(F.lit(1)).cast("long").alias("n_users"),
        )

    return (
        n(p_users.subtract(c_users), "purchase_no_click")
        .unionByName(n(c_users.subtract(p_users), "click_no_purchase"))
        .unionByName(n(p_users.intersect(c_users), "both"))
    )
