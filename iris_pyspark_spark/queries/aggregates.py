"""Aggregation queries (SURVEY.md §2.4, A1–A9).

Determinism notes:
  * Double SUM/AVG straight off a single-file scan matches DuckDB
    bit-exactly (same accumulation order); verified empirically.
  * Post-join or multi-granularity double sums use integer-cents math.
  * stddev/variance use the explicit sum-of-squares formula written
    identically on both engines (library implementations differ in
    merge order — observed 1-ulp mismatches).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast
from pyspark.sql.window import Window

from ..catalog import load_table, load_tables
from ..registry import register
from .joins import CENTS_SQL, cents


@register(
    "a_global_stats",
    oracle="""
SELECT
  COUNT(*)                    AS n_rows,
  COUNT(DISTINCT l_orderkey)  AS n_orders,
  SUM(l_quantity)             AS total_qty,
  MIN(l_shipdate)             AS min_ship,
  MAX(l_shipdate)             AS max_ship,
  SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) / 100.0 / COUNT(*) AS avg_price
FROM lineitem
""",
    tags=("A2", "A3"),
)
def a_global_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # avg over integer cents: COUNT(DISTINCT) in the same agg gives the
    # plan an Expand node, which reorders double accumulation vs the
    # oracle — exact integer sums are immune to ordering.
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.sum("l_quantity").alias("total_qty"),
        F.min("l_shipdate").alias("min_ship"),
        F.max("l_shipdate").alias("max_ship"),
        (F.sum(cents(F.col("l_extendedprice"))) / 100.0 / F.count(F.lit(1))).alias(
            "avg_price"
        ),
    )


@register(
    "a_count_distinct",
    oracle="""
SELECT c_mktsegment,
       COUNT(DISTINCT c_nationkey) AS n_nations,
       COUNT(*)                    AS n_customers
FROM customer
GROUP BY c_mktsegment
""",
    tags=("A3",),
)
def a_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    return customer.groupBy("c_mktsegment").agg(
        F.countDistinct("c_nationkey").alias("n_nations"),
        F.count(F.lit(1)).alias("n_customers"),
    )


# A4: HLL sketch — approximate by design, so no value oracle exists;
# the driver records its weaker rows-only check (SURVEY.md §5.2).
@register("a_approx_count_distinct", oracle=None, tags=("A4",))
def a_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only self-validation: the exact distinct rides the same row
    and `approx_ok` bounds the HLL estimate to 5x the configured rsd —
    checkable from the sweep output alone."""
    li = load_table(spark, sf_dir, "lineitem")
    # rsd=0.02: half the precision digits of the default demo but 4x
    # smaller HLL register arrays per partial aggregate — the sketch
    # size, not the row count, dominates this aggregate's cost.
    agged = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )
    rel_err = F.abs(F.col("approx_parts") - F.col("exact_parts")) / F.col(
        "exact_parts"
    )
    return agged.withColumn("approx_ok", rel_err <= 0.1)


@register(
    "a_rollup",
    oracle=f"""
SELECT r_name, n_name,
       SUM({CENTS_SQL.format(expr="c_acctbal")}) / 100.0 AS total_acctbal,
       COUNT(*) AS n
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
""",
    tags=("A5",),
)
def a_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("customer", "nation", "region"))
    joined = t["customer"].join(
        broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey")
    ).join(broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
    return joined.rollup("r_name", "n_name").agg(
        (F.sum(cents(F.col("c_acctbal"))) / 100.0).alias("total_acctbal"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "a_cube",
    oracle="""
SELECT l_returnflag, l_linestatus, COUNT(*) AS n, SUM(l_quantity) AS qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
    tags=("A5",),
)
def a_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("qty")
    )


@register(
    "a_grouping_sets_sql",
    oracle="""
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
""",
    tags=("A5", "E2-sql"),
)
def a_grouping_sets_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL entry point (E2): identical text runs on both engines."""
    load_tables(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@register(
    "a_having",
    oracle="""
SELECT p_brand, COUNT(*) AS n_parts, MAX(p_retailprice) AS max_price
FROM part
GROUP BY p_brand
HAVING COUNT(*) > 50
""",
    tags=("A6",),
)
def a_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return (
        part.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.max("p_retailprice").alias("max_price"),
        )
        .filter(F.col("n_parts") > 50)
    )


@register(
    "a_conditional_agg",
    oracle="""
SELECT
  STRFTIME(ts, '%Y-%m-%d') AS day,
  SUM(CASE WHEN event_type = 'click'    THEN value ELSE 0 END) AS click_value,
  SUM(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END) AS purchase_value,
  COUNT(CASE WHEN event_type = 'error' THEN 1 END)             AS n_errors
FROM events
GROUP BY STRFTIME(ts, '%Y-%m-%d')
""",
    tags=("A7",),
)
def a_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # day emitted as a string: pandas-level date representations differ
    # between engines (datetime.date vs datetime64), strings never do.
    events = load_table(spark, sf_dir, "events")
    return events.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day")).agg(
        F.sum(F.when(F.col("event_type") == "click", F.col("value")).otherwise(0.0)).alias(
            "click_value"
        ),
        F.sum(
            F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(0.0)
        ).alias("purchase_value"),
        F.count(F.when(F.col("event_type") == "error", F.lit(1))).alias("n_errors"),
    )


@register(
    "a_pivot",
    oracle="""
SELECT
  c_nationkey,
  COUNT(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 END) AS automobile,
  COUNT(CASE WHEN c_mktsegment = 'BUILDING'   THEN 1 END) AS building,
  COUNT(CASE WHEN c_mktsegment = 'FURNITURE'  THEN 1 END) AS furniture,
  COUNT(CASE WHEN c_mktsegment = 'HOUSEHOLD'  THEN 1 END) AS household,
  COUNT(CASE WHEN c_mktsegment = 'MACHINERY'  THEN 1 END) AS machinery
FROM customer
GROUP BY c_nationkey
""",
    tags=("A7",),
)
def a_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native `.pivot()` with an explicit value list (scale note: always
    pass the value list — without it Spark runs an extra distinct job)."""
    customer = load_table(spark, sf_dir, "customer")
    segs = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    piv = (
        customer.groupBy("c_nationkey")
        .pivot("c_mktsegment", segs)
        .agg(F.count(F.lit(1)))
    )
    # pivot leaves missing combos null; oracle's COUNT(CASE...) yields 0
    out = piv.select(
        "c_nationkey",
        *[F.coalesce(F.col(s), F.lit(0)).alias(s.lower()) for s in segs],
    )
    return out


@register(
    "a_stats_formulas",
    oracle="""
SELECT
  l_returnflag,
  MIN(l_quantity) AS min_qty,
  MAX(l_quantity) AS max_qty,
  SQRT((SUM(l_quantity * l_quantity) - SUM(l_quantity) * SUM(l_quantity) / COUNT(*)) / (COUNT(*) - 1)) AS sd_qty,
  MEDIAN(l_quantity) AS med_qty
FROM lineitem
GROUP BY l_returnflag
""",
    tags=("A8",),
)
def a_stats_formulas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stddev via the explicit formula so both engines run the identical
    scalar expression over exact integer-valued sums (library stddev
    implementations differ in the last ulp)."""
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    n = F.count(F.lit(1))
    sd = F.sqrt(
        (F.sum(q * q) - F.sum(q) * F.sum(q) / n) / (n - F.lit(1))
    )
    return li.groupBy("l_returnflag").agg(
        F.min(q).alias("min_qty"),
        F.max(q).alias("max_qty"),
        sd.alias("sd_qty"),
        F.median(q).alias("med_qty"),
    )


@register(
    "a_collect_list",
    oracle="""
SELECT r_name,
       ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT(LIST(n_name))), ',') AS nations
FROM region JOIN nation ON n_regionkey = r_regionkey
GROUP BY r_name
""",
    tags=("A9",),
)
def a_collect_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set is order-insensitive; emit a sorted joined string so
    the value comparison is well-defined on both engines."""
    t = load_tables(spark, sf_dir, ("region", "nation"))
    joined = t["nation"].join(
        broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey")
    )
    return joined.groupBy("r_name").agg(
        F.array_join(F.sort_array(F.collect_set("n_name")), ",").alias("nations")
    )


# --- A-extra: mergeable HLL sketches (the 100 TB distinct-count pattern) ----


@register("a_hll_sketch_mergeable", oracle=None, tags=("A4",))
def a_hll_sketch_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase distinct count via mergeable HLL sketches: build one
    sketch per source partition (hll_sketch_agg), merge them into a
    global sketch (hll_union_agg), estimate once. At scale this is the
    pattern for distinct-counting across table shards / days without
    re-scanning: sketches are tiny, unions are exact. Estimates are
    deterministic (datasketches is seed-fixed) but library-specific →
    rows-only check; the exact-distinct cross-check lives in
    a_count_distinct."""
    docs = load_table(spark, sf_dir, "documents")
    per_source = docs.groupBy("source").agg(
        F.hll_sketch_agg("text").alias("sketch"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    merged = per_source.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).cast("long").alias(
            "approx_distinct_texts"
        ),
        F.sum("n_docs").alias("n_docs_total"),
    )
    # Rows-only self-validation: the exact distinct rides the single
    # output row (broadcast of a 1-row aggregate) and `approx_ok`
    # bounds the merged-sketch estimate to 5% relative error — the
    # merge must not degrade accuracy versus a single global sketch.
    exact = docs.agg(F.countDistinct("text").alias("exact_distinct_texts"))
    rel_err = (
        F.abs(F.col("approx_distinct_texts") - F.col("exact_distinct_texts"))
        / F.col("exact_distinct_texts")
    )
    return (
        merged.crossJoin(broadcast(exact))
        .withColumn("approx_ok", rel_err <= 0.05)
    )


_MODERN_AGGS_ORACLE = """
SELECT o_orderpriority,
       COUNT(*) FILTER (WHERE o_totalprice > 100000) AS n_big,
       BOOL_AND(o_totalprice > 0)  AS all_positive,
       BOOL_OR(o_orderstatus = 'F') AS any_final,
       MODE(o_orderstatus)          AS modal_status
FROM orders
GROUP BY o_orderpriority
"""


@register("a_modern_aggs", oracle=_MODERN_AGGS_ORACLE, tags=("A1",))
def a_modern_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count_if / bool_and / bool_or / mode — the modern aggregate set
    (mode is deterministic here: status frequencies never tie per group
    in this data; ties would need an explicit tie-break)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count_if(F.col("o_totalprice") > 100000).alias("n_big"),
        F.bool_and(F.col("o_totalprice") > 0).alias("all_positive"),
        F.bool_or(F.col("o_orderstatus") == "F").alias("any_final"),
        F.mode("o_orderstatus").alias("modal_status"),
    )


_UNPIVOT_ORACLE = """
SELECT n_name, metric, CAST(val AS BIGINT) AS val
FROM (
  SELECT n.n_name,
         COUNT(DISTINCT c.c_custkey) AS n_customers,
         COUNT(DISTINCT s.s_suppkey) AS n_suppliers
  FROM nation n
  LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
  LEFT JOIN supplier s ON s.s_nationkey = n.n_nationkey
  GROUP BY n.n_name
)
UNPIVOT (val FOR metric IN (n_customers, n_suppliers))
"""


@register("a_unpivot_melt", oracle=_UNPIVOT_ORACLE, tags=("A7", "P1"))
def a_unpivot_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unpivot/melt — the inverse of pivot: wide per-nation metrics to
    long (nation, metric, value) form."""
    t = {n: load_table(spark, sf_dir, n) for n in ("nation", "customer", "supplier")}
    wide = (
        t["nation"]
        .join(t["customer"], F.col("c_nationkey") == F.col("n_nationkey"), "left")
        .join(t["supplier"], F.col("s_nationkey") == F.col("n_nationkey"), "left")
        .groupBy("n_name")
        .agg(
            F.countDistinct("c_custkey").alias("n_customers"),
            F.countDistinct("s_suppkey").alias("n_suppliers"),
        )
    )
    return wide.unpivot(
        ids=["n_name"],
        values=["n_customers", "n_suppliers"],
        variableColumnName="metric",
        valueColumnName="val",
    )


_QUANTILES_ORACLE = """
SELECT l_returnflag,
       quantile_cont(l_extendedprice, 0.5)  AS median_price,
       quantile_cont(l_extendedprice, 0.95) AS p95_price,
       quantile_cont(l_extendedprice, 0.25) AS p25_price,
       COUNT(*) AS n
FROM lineitem
GROUP BY l_returnflag
"""


@register("a_exact_quantiles", oracle=_QUANTILES_ORACLE, tags=("A8",))
def a_exact_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact quantiles: continuous (linear-interpolated) and discrete
    percentile — both engines implement the same definitions on the
    same doubles, so values match bit-exactly. (The approximate-sketch
    path for 100 TB is a_approx_count_distinct / percentile_approx;
    exact quantiles are the small-group truth.)"""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", F.lit(0.5)).alias("median_price"),
        F.percentile("l_extendedprice", F.lit(0.95)).alias("p95_price"),
        F.percentile("l_extendedprice", F.lit(0.25)).alias("p25_price"),
        F.count(F.lit(1)).alias("n"),
    )


_ARGMAX_ORACLE = """
SELECT c_mktsegment,
       MAX({'bal': c_acctbal, 'id': c_custkey}).bal AS top_balance,
       MAX({'bal': c_acctbal, 'id': c_custkey}).id  AS top_customer
FROM customer
GROUP BY c_mktsegment
"""


@register("a_argmax_struct", oracle=_ARGMAX_ORACLE, tags=("A1", "N6"))
def a_argmax_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic argmax-per-group: MAX over a (value, id) struct
    compares lexicographically, so ties on the value break by id — the
    safe spelling of max_by, whose tie behavior is undefined on both
    engines."""
    c = load_table(spark, sf_dir, "customer")
    top = F.max(F.struct(F.col("c_acctbal").alias("bal"), F.col("c_custkey").alias("id")))
    return c.groupBy("c_mktsegment").agg(
        top.getField("bal").alias("top_balance"),
        top.getField("id").alias("top_customer"),
    )


# Approximate percentiles are algorithm-specific (Spark: KLL-ish GK
# sketch) → rows-only; the query carries its own exact reference columns
# and tests/test_approx_bounds.py enforces the accuracy envelope.
@register("a_approx_percentile", oracle=None, tags=("A8", "A4"))
def a_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile next to the exact percentile it estimates —
    the 100 TB pattern for quantile monitoring (the sketch is mergeable
    and single-pass; exact percentiles need a full sort). Rows-only
    self-validation: approx and exact ride the same row, `max_rel_err`
    quantifies the sketch error, and `approx_ok` asserts it under 1%
    plus monotonicity of the approx quantiles — the invariants a reader
    of the sweep output can check without an oracle.

    Checked output is scalar-only: the three quantiles are emitted as
    separate double columns (the driver's canonicalizer cannot sort
    array cells — CORRECTNESS_r03 recorded the array-typed spelling as
    a hard TypeError)."""
    li = load_table(spark, sf_dir, "lineitem")
    agged = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", [0.25, 0.5, 0.95], 10000).alias(
            "approx_pcts"
        ),
        F.percentile("l_extendedprice", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.95)))
        .alias("exact_pcts"),
        F.count(F.lit(1)).alias("n"),
    )
    rel_err = F.expr(
        "aggregate(zip_with(approx_pcts, exact_pcts,"
        " (a, e) -> abs(a - e) / e), 0D, (acc, x) -> greatest(acc, x))"
    )
    monotone = F.expr(
        "approx_pcts[0] <= approx_pcts[1] AND approx_pcts[1] <= approx_pcts[2]"
    )
    return agged.select(
        "l_returnflag",
        F.col("approx_pcts")[0].alias("p25_approx"),
        F.col("approx_pcts")[1].alias("p50_approx"),
        F.col("approx_pcts")[2].alias("p95_approx"),
        F.col("exact_pcts")[0].alias("p25_exact"),
        F.col("exact_pcts")[1].alias("p50_exact"),
        F.col("exact_pcts")[2].alias("p95_exact"),
        "n",
        F.round(rel_err, 8).alias("max_rel_err"),
        (monotone & (rel_err < 0.01)).alias("approx_ok"),
    )


# --- mode() / median() ------------------------------------------------------

_MODE_MEDIAN_ORACLE = """
SELECT MODE(event_type)                  AS top_event,
       MEDIAN(value)                     AS median_value,
       ROUND(AVG(value), 6)              AS mean_value
FROM events
"""


@register("a_mode_median", oracle=_MODE_MEDIAN_ORACLE, tags=("A8", "A1"))
def a_mode_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mode() and median() — the modern direct aggregates (Spark 3.4+).
    Global scope on purpose: the event-type counts are globally distinct
    (no tie), so mode() is deterministic in both engines; a grouped
    mode over small groups would tie and both engines break ties
    arbitrarily. median() interpolates the two middle order statistics
    identically. mean rides along rounded (the one float aggregate
    whose summation order neither engine pins — acceptable at 1e-6
    after rounding because values are bounded)."""
    e = load_table(spark, sf_dir, "events")
    return e.agg(
        F.mode("event_type").alias("top_event"),
        F.median("value").alias("median_value"),
        F.round(F.avg("value"), 6).alias("mean_value"),
    )


# --- fixed-bin histogram ----------------------------------------------------

_HIST_ORACLE = """
SELECT CASE WHEN value < 0 THEN 0
            WHEN value >= 100 THEN 21
            ELSE CAST(FLOOR(value / 5.0) + 1 AS BIGINT) END AS bin,
       COUNT(*)                            AS n,
       ROUND(MIN(value), 6)                AS lo,
       ROUND(MAX(value), 6)                AS hi
FROM events
GROUP BY bin
"""


@register("a_histogram_width_bucket", oracle=_HIST_ORACLE, tags=("A1", "F3"))
def a_histogram_width_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-bin histogram via width_bucket(value, 0, 100, 20) — the
    one-pass distributed histogram (each row maps to its bin, one
    skinny shuffle of 22 bins including under/overflow). The per-bin
    min/max ride along to pin the bin boundaries, not just the counts;
    the oracle restates width_bucket's half-open convention
    (0=underflow, 21=overflow) as explicit arithmetic since DuckDB
    lacks the function."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy(
        F.width_bucket("value", F.lit(0.0), F.lit(100.0), F.lit(20)).alias("bin")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("value"), 6).alias("lo"),
        F.round(F.max("value"), 6).alias("hi"),
    )


# --- boolean aggregates + ordered listagg -----------------------------------

_BOOL_LISTAGG_ORACLE = """
SELECT r_regionkey,
       BOOL_AND(n_nationkey % 2 = 0)  AS all_even,
       BOOL_OR(n_name LIKE 'A%')      AS any_a,
       STRING_AGG(n_name, '|' ORDER BY n_name) AS members
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_regionkey
"""


@register("a_bool_listagg", oracle=_BOOL_LISTAGG_ORACLE, tags=("A9", "A1"))
def a_bool_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregates (bool_and/bool_or = SQL EVERY/ANY) and ordered
    listagg — the string concatenation aggregate is deterministic ONLY
    with WITHIN GROUP (ORDER BY ...): an unordered listagg concatenates
    in partition-arrival order, precisely the layout dependence the
    invariance suite exists to catch. Oracle = DuckDB STRING_AGG with
    the same ORDER BY."""
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    j = n.join(r, n.n_regionkey == r.r_regionkey)
    return j.groupBy("r_regionkey").agg(
        F.bool_and((F.col("n_nationkey") % 2 == 0)).alias("all_even"),
        F.bool_or(F.col("n_name").like("A%")).alias("any_a"),
        F.expr("listagg(n_name, '|') WITHIN GROUP (ORDER BY n_name)").alias("members"),
    )


# --- grouping() / grouping_id() ---------------------------------------------

_GROUPING_ID_ORACLE = """
SELECT COALESCE(l_returnflag, '(all)')  AS returnflag,
       COALESCE(l_linestatus, '(all)') AS linestatus,
       GROUPING(l_returnflag)          AS g_flag,
       GROUPING(l_linestatus)          AS g_status,
       COUNT(*)                        AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


@register("a_grouping_id", oracle=_GROUPING_ID_ORACLE, tags=("A5",))
def a_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """grouping()/grouping_id() — the only way to tell a real NULL key
    from a rollup subtotal row. Each output row carries its grouping
    indicator bits, and the display key coalesces subtotals to '(all)';
    without grouping(), a table with NULL-valued keys would be
    indistinguishable from its own totals."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("long").alias("g_flag"),
        F.grouping("l_linestatus").cast("long").alias("g_status"),
        F.count(F.lit(1)).alias("n"),
    ).select(
        F.coalesce("l_returnflag", F.lit("(all)")).alias("returnflag"),
        F.coalesce("l_linestatus", F.lit("(all)")).alias("linestatus"),
        "g_flag",
        "g_status",
        "n",
    )


# --- percentile_cont / percentile_disc --------------------------------------

_PCTL_ORACLE = """
SELECT event_type,
       PERCENTILE_CONT(0.9) WITHIN GROUP (ORDER BY value) AS p90_cont,
       PERCENTILE_DISC(0.9) WITHIN GROUP (ORDER BY value) AS p90_disc,
       PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY value) AS median_cont
FROM events
GROUP BY event_type
"""


@register("a_percentile_cont_disc", oracle=_PCTL_ORACLE, tags=("A8",))
def a_percentile_cont_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-standard WITHIN GROUP percentiles: percentile_cont
    interpolates between order statistics, percentile_disc returns an
    actual data value — the distinction that matters when the metric
    must be an observed latency, not a synthetic midpoint. Both are
    exact order statistics (sort-based), deterministic on any layout;
    interpolation arithmetic is the same (a + f*(b-a)) in both
    engines."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.expr("percentile_cont(0.9) WITHIN GROUP (ORDER BY value)").alias("p90_cont"),
        F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY value)").alias("p90_disc"),
        F.expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY value)").alias(
            "median_cont"
        ),
    )


_SEMI_ROLLUP_ORACLE = f"""
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n_orders,
       SUM({CENTS_SQL.format(expr="o_totalprice")}) / 100.0 AS total_price
FROM orders o
WHERE EXISTS (SELECT 1 FROM customer c
              WHERE c.c_custkey = o.o_custkey AND c.c_acctbal > 5000)
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
HAVING COUNT(*) > 20
"""


@register(
    "a_semi_rollup_having",
    oracle=_SEMI_ROLLUP_ORACLE,
    tags=("J4", "A5", "A6"),
)
def a_semi_rollup_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS-as-left-semi feeding a rollup with a HAVING gate: orders
    from well-funded customers, subtotaled by (status, priority) with
    hierarchy totals, keeping only populated cells. The semi join ships
    no customer payload columns (probe-only), the rollup is one hash
    aggregate pass with grouping-set expansion, and HAVING is a filter
    on the aggregated output — one shuffle on the group keys total."""
    orders = load_table(spark, sf_dir, "orders")
    rich = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .select("c_custkey")
    )
    kept = orders.join(rich, orders.o_custkey == rich.c_custkey, "left_semi")
    return (
        kept.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (F.sum(cents(F.col("o_totalprice"))) / 100.0).alias("total_price"),
        )
        .filter(F.col("n_orders") > 20)
    )


# --- A8+A1: linear-regression aggregates (corr / slope / intercept / r2) ----

#: Exact-integer sufficient statistics -> double formula, identical
#: operation order in both engines. The sums are over integer-valued
#: columns (quantity, price cents) so each SUM is exact (< 2^53; DuckDB
#: promotes to HUGEINT, Spark keeps BIGINT); casting the exact sums to
#: double and combining with the SAME IEEE ops makes every output column
#: bit-identical — unlike the engines' native one-pass covariance
#: kernels, whose summation orders differ in the last ulp.
_REGR_ORACLE = """
WITH s AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS DOUBLE)                                        AS n,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE)                 AS sx,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) AS sy,
         CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                  * CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) AS syy,
         CAST(SUM(CAST(l_quantity AS BIGINT)
                  * CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) AS sxy
  FROM lineitem
  GROUP BY l_returnflag
)
SELECT l_returnflag,
       CAST(n AS BIGINT)                                          AS n_rows,
       (n * sxy - sx * sy) / (n * sxx - sx * sx)                  AS slope_cents,
       (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n  AS intercept_cents,
       ((n * sxy - sx * sy) * (n * sxy - sx * sy))
         / ((n * sxx - sx * sx) * (n * syy - sy * sy))            AS r2,
       (n * sxy - sx * sy)
         / (SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy))    AS corr_xy,
       TRUE AS regr_ok,
       TRUE AS corr_ok
FROM s
"""


@register("a_regression_aggs", oracle=_REGR_ORACLE, tags=("A8", "A1"))
def a_regression_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-regression aggregates per return flag: slope / intercept /
    r² / correlation of price (cents) against quantity — the OLS summary
    every metrics warehouse computes.

    Determinism design: built from exact-integer sufficient statistics
    (Σx, Σy, Σxy, Σx², Σy² over integral columns — each partial sum
    stays < 2^53 so BIGINT/HUGEINT agree exactly), cast once to double,
    then combined with the identical IEEE operation order as the oracle
    — bit-equal at any partition count. The native `regr_slope` /
    `corr` kernels are ALSO run and pinned to the formula within 1e-9
    relative (`regr_ok`, `corr_ok`): the built-in API surface is
    exercised, but only the order-free formula enters the hash-checked
    numeric columns. Scale shape: one partial-aggregated shuffle, six
    longs per group — mergeable across any shard layout."""
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("long")
    y = cents(F.col("l_extendedprice"))
    agged = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_l"),
        F.sum(x).alias("sx_l"),
        F.sum(y).alias("sy_l"),
        F.sum(x * x).alias("sxx_l"),
        F.sum(y * y).alias("syy_l"),
        F.sum(x * y).alias("sxy_l"),
        F.regr_slope(y.cast("double"), x.cast("double")).alias("native_slope"),
        F.corr(y.cast("double"), x.cast("double")).alias("native_corr"),
    )
    n = F.col("n_l").cast("double")
    sx = F.col("sx_l").cast("double")
    sy = F.col("sy_l").cast("double")
    sxx = F.col("sxx_l").cast("double")
    syy = F.col("syy_l").cast("double")
    sxy = F.col("sxy_l").cast("double")
    cov_n = n * sxy - sx * sy
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy
    slope = cov_n / var_x
    intercept = (sy - slope * sx) / n
    r2 = (cov_n * cov_n) / (var_x * var_y)
    corr = cov_n / (F.sqrt(var_x) * F.sqrt(var_y))
    rel = lambda a, b: F.abs(a - b) / F.greatest(F.abs(b), F.lit(1e-12))  # noqa: E731
    return agged.select(
        "l_returnflag",
        F.col("n_l").alias("n_rows"),
        slope.alias("slope_cents"),
        intercept.alias("intercept_cents"),
        r2.alias("r2"),
        corr.alias("corr_xy"),
        (rel(F.col("native_slope"), slope) < 1e-9).alias("regr_ok"),
        (rel(F.col("native_corr"), corr) < 1e-9).alias("corr_ok"),
    )


_BITMAP_ORACLE = """
SELECT event_type,
       COUNT(DISTINCT user_id) AS n_users,
       COUNT(*) AS n_events
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@register("a_bitmap_distinct", oracle=_BITMAP_ORACLE, tags=("A3", "A1"))
def a_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counts via the Spark 3.5 bitmap function family —
    the 100 TB acceleration pattern for COUNT(DISTINCT bigint): keys
    fold into fixed 4 KB bitmaps per 32768-id bucket
    (bitmap_construct_agg over bitmap_bit_position, grouped by
    bitmap_bucket_number), partial bitmaps OR-merge associatively
    (bitmap_or_agg — map-side combine works on bytes, not id sets),
    and the popcount (bitmap_count) sums per group. Unlike
    approx_count_distinct this is exact, and unlike a plain
    COUNT(DISTINCT) the shuffle carries |buckets| x 4 KB rows instead
    of every distinct id — the same trick materialized-view engines
    use for incremental distinct maintenance. The oracle is the plain
    COUNT(DISTINCT), proving bit-equality of the rewrite."""
    ev = load_table(spark, sf_dir, "events")
    buckets = ev.groupBy(
        "event_type",
        F.expr("bitmap_bucket_number(user_id)").alias("bucket"),
    ).agg(
        F.expr("bitmap_construct_agg(bitmap_bit_position(user_id))").alias("bm"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    return (
        buckets.groupBy("event_type")
        .agg(
            F.expr("sum(bitmap_count(bm))").cast("long").alias("n_users"),
            F.sum("n_rows").cast("long").alias("n_events"),
        )
        .orderBy("event_type")
    )


# --- weighted median via the cumulative-weight histogram walk ---------------

_WMEDIAN_ORACLE = f"""
WITH hist AS (
  SELECT l_returnflag,
         {CENTS_SQL.format(expr="l_extendedprice")} AS price_cents,
         SUM(CAST(l_quantity AS BIGINT)) AS wt
  FROM lineitem GROUP BY l_returnflag, price_cents
),
cum AS (
  SELECT l_returnflag, price_cents, wt,
         SUM(wt) OVER (PARTITION BY l_returnflag ORDER BY price_cents
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
         SUM(wt) OVER (PARTITION BY l_returnflag) AS tw
  FROM hist
)
SELECT l_returnflag,
       CAST(MIN(CASE WHEN 2 * cw >= tw THEN price_cents END) AS BIGINT)
         AS wmedian_cents,
       CAST(MIN(tw) AS BIGINT) AS total_weight
FROM cum GROUP BY l_returnflag ORDER BY l_returnflag
"""


@register("a_weighted_median", oracle=_WMEDIAN_ORACLE, tags=("A8", "A1", "W3"))
def a_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median of extended price per return flag — the
    weighted-percentile shape MEDIAN()/percentile_approx can't express
    (each row counts `l_quantity` times). Definition: the lower weighted
    median, i.e. the smallest price whose cumulative weight reaches half
    the total.

    Scale design: the fact table is FIRST compressed to a per-(group,
    value) histogram by a combinable groupBy (map-side partial
    aggregation does most of the work), so the cumulative-weight window
    walks |distinct prices per group| rows — the value histogram, not
    the corpus. All arithmetic is exact integers (cents, long weights):
    the crossing row is engine- and layout-independent with no float
    comparisons anywhere."""
    li = load_table(spark, sf_dir, "lineitem")
    hist = (
        li.select(
            "l_returnflag",
            cents(F.col("l_extendedprice")).alias("price_cents"),
            F.col("l_quantity").cast("long").alias("wt"),
        )
        .groupBy("l_returnflag", "price_cents")
        .agg(F.sum("wt").alias("wt"))
    )
    w_cum = (
        Window.partitionBy("l_returnflag")
        .orderBy("price_cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("l_returnflag")
    cum = hist.select(
        "l_returnflag",
        "price_cents",
        F.sum("wt").over(w_cum).alias("cw"),
        F.sum("wt").over(w_all).alias("tw"),
    )
    return (
        cum.groupBy("l_returnflag")
        .agg(
            F.min(F.when(2 * F.col("cw") >= F.col("tw"), F.col("price_cents")))
            .cast("long")
            .alias("wmedian_cents"),
            F.min("tw").cast("long").alias("total_weight"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Decimal128 exact aggregation (no cents trick needed)
# ---------------------------------------------------------------------------

_DECIMAL_ORACLE = """
SELECT l_returnflag,
       COUNT(*) AS n_lines,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,2))) AS DOUBLE)
         AS revenue_exact,
       CAST(MIN(CAST(l_extendedprice AS DECIMAL(20,2))) AS DOUBLE)
         AS min_price,
       CAST(MAX(CAST(l_extendedprice AS DECIMAL(20,2))) AS DOUBLE)
         AS max_price
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register(
    "a_decimal128_exact",
    oracle=_DECIMAL_ORACLE,
    tags=("A1", "F3", "O1"),
)
def a_decimal128_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact money aggregation through the DECIMAL type system —
    Tungsten's decimal128 accumulator sums 2-decimal prices with zero
    rounding error in ANY partition order, the engine-native
    alternative to this repo's integer-cents convention (`cents()` /
    CENTS_SQL): cents scale to BIGINT manually; DECIMAL(20,2) lets the
    type system carry the scale. The exact decimal sum is cast to
    DOUBLE once at the boundary (nearest-double of the same exact
    value on both engines — bit-equal).

    Scale: a single partial+final hash aggregate; decimal sums get
    map-side combine exactly like longs (Spark widens the accumulator
    to DECIMAL(30,2) internally, overflow-checked, good to 10^28
    dollars)."""
    li = load_table(spark, sf_dir, "lineitem")
    dec = F.col("l_extendedprice").cast("decimal(20,2)")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(dec).cast("double").alias("revenue_exact"),
            F.min(dec).cast("double").alias("min_price"),
            F.max(dec).cast("double").alias("max_price"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Power-of-two (HdrHistogram-style) value histogram
# ---------------------------------------------------------------------------

_LOG2_ORACLE = """
WITH v AS (
  SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents FROM orders
),
bucketed AS (
  SELECT LENGTH(bin(cents)) AS bucket, cents FROM v
)
SELECT bucket,
       CAST(CAST(1 AS BIGINT) << (bucket - 1) AS BIGINT) AS lo_cents,
       CAST((CAST(1 AS BIGINT) << bucket) - 1 AS BIGINT) AS hi_cents,
       COUNT(*) AS n_orders,
       CAST(SUM(cents) AS BIGINT) AS sum_cents
FROM bucketed
GROUP BY bucket
ORDER BY bucket
"""


@register(
    "a_log2_histogram", oracle=_LOG2_ORACLE, tags=("A1", "F3", "O1")
)
def a_log2_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-of-two histogram of order values — the HdrHistogram /
    latency-bucket layout (exponentially wider bins, constant relative
    error) that monitoring systems use because a fixed-width histogram
    wastes all its bins on the body and none on the tail.

    The bucket index is ⌊log2(v)⌋+1 computed EXACTLY as the length of
    the binary-digit string (`bin`), never as LN(v)/LN(2) — a float
    log at an exact power of two can land a hair below the integer and
    floor into the wrong bucket on one engine but not the other.
    Bounds come from BIGINT shifts. Scale: pure map + one combinable
    groupBy over ≤64 buckets — histogram cells merge across partitions
    exactly like the Count-Min cells in `n_countmin_sketch`.
    """
    o = load_table(spark, sf_dir, "orders")
    v = o.select(cents(F.col("o_totalprice")).alias("cents"))
    bucketed = v.select(F.length(F.bin("cents")).alias("bucket"), "cents")
    return (
        bucketed.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("cents").cast("long").alias("sum_cents"),
        )
        .select(
            "bucket",
            F.expr("CAST(shiftleft(1L, bucket - 1) AS BIGINT)").alias(
                "lo_cents"
            ),
            F.expr("CAST(shiftleft(1L, bucket) - 1 AS BIGINT)").alias(
                "hi_cents"
            ),
            "n_orders",
            "sum_cents",
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# Mergeable equi-width quantile histogram sketch
# ---------------------------------------------------------------------------

_QHIST_BUCKETS = 256

_QHIST_ORACLE = f"""
WITH v AS (
  SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents FROM orders
),
bounds AS (
  SELECT MIN(cents) AS lo, MAX(cents) AS hi, COUNT(*) AS n FROM v
),
bucketed AS (
  SELECT LEAST(CAST(({_QHIST_BUCKETS} * (cents - b.lo))
                    // (b.hi - b.lo + 1) AS BIGINT),
               {_QHIST_BUCKETS - 1}) AS bkt
  FROM v CROSS JOIN bounds b
),
hist AS (
  SELECT bkt, COUNT(*) AS c FROM bucketed GROUP BY bkt
),
cum AS (
  SELECT bkt, c,
         CAST(SUM(c) OVER (ORDER BY bkt
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_c
  FROM hist
),
qs AS (SELECT UNNEST([25, 50, 95]) AS q),
walk AS (
  SELECT q.q, c.bkt, c.cum_c,
         ROW_NUMBER() OVER (PARTITION BY q.q ORDER BY c.bkt) AS rn
  FROM qs q JOIN cum c
    ON c.cum_c * 100 >= q.q * (SELECT n FROM bounds)
),
est AS (
  SELECT w.q,
         b.lo + ((w.bkt * (b.hi - b.lo + 1)) // {_QHIST_BUCKETS}) AS est_lo,
         b.lo + (((w.bkt + 1) * (b.hi - b.lo + 1)) // {_QHIST_BUCKETS})
           AS est_hi
  FROM walk w CROSS JOIN bounds b WHERE w.rn = 1
),
exact AS (
  SELECT 25 AS q, quantile_cont(cents, 0.25) AS exact_cents FROM v
  UNION ALL SELECT 50, quantile_cont(cents, 0.50) FROM v
  UNION ALL SELECT 95, quantile_cont(cents, 0.95) FROM v
)
SELECT e.q, est_lo, est_hi, ROUND(x.exact_cents, 6) AS exact_cents,
       x.exact_cents >= est_lo AND x.exact_cents <= est_hi
         AS exact_within_bucket_ok
FROM est e JOIN exact x ON e.q = x.q
ORDER BY e.q
"""


@register(
    "a_quantile_histogram_sketch",
    oracle=_QHIST_ORACLE,
    tags=("A8", "A4", "A1", "W3"),
)
def a_quantile_histogram_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile estimation by equi-width histogram: 256
    integer buckets over the value range, a cumulative walk to locate
    p25/p50/p95, and the EXACT quantile proven to land inside the
    located bucket (`exact_within_bucket_ok`). The fourth member of
    this engine's mergeable-sketch family (Count-Min = frequencies,
    HLL = distincts, Misra-Gries = heavy hitters, this = quantiles):
    per-partition histograms merge by cell-wise ADD — the groupBy IS
    the merge, so 1000 executors combine map-side for free where an
    exact percentile needs a full sort.

    Everything is exact integer arithmetic (bucket index by positive
    floor-division of cents offsets, bounds by the inverse formula);
    the only float is DuckDB's interpolated exact quantile, used
    purely as the validation target. Scale: one combinable 256-cell
    aggregation after a 1-row bounds broadcast; the walk windows over
    256 rows.
    """
    o = load_table(spark, sf_dir, "orders")
    v = o.select(cents(F.col("o_totalprice")).alias("cents"))
    bounds = v.agg(
        F.min("cents").alias("lo"),
        F.max("cents").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    )
    nb = _QHIST_BUCKETS
    bucketed = v.crossJoin(F.broadcast(bounds)).select(
        F.least(
            F.expr(f"CAST(({nb} * (cents - lo)) DIV (hi - lo + 1) AS BIGINT)"),
            F.lit(nb - 1).cast("long"),
        ).alias("bkt"),
        "lo",
        "hi",
        "n",
    )
    hist = bucketed.groupBy("bkt", "lo", "hi", "n").agg(
        F.count(F.lit(1)).alias("c")
    )
    w_cum = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.withColumn("cum_c", F.sum("c").over(w_cum).cast("long"))
    qs = spark.createDataFrame([(25,), (50,), (95,)], "q int")
    walk = (
        F.broadcast(qs)
        .join(cum, F.col("cum_c") * 100 >= F.col("q") * F.col("n"))
        .withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("q").orderBy("bkt")),
        )
        .filter(F.col("rn") == 1)
    )
    est = walk.select(
        "q",
        F.expr(f"lo + ((bkt * (hi - lo + 1)) DIV {nb})").alias("est_lo"),
        F.expr(f"lo + (((bkt + 1) * (hi - lo + 1)) DIV {nb})").alias("est_hi"),
    )
    exact = v.agg(
        F.expr("percentile(cents, 0.25)").alias("e25"),
        F.expr("percentile(cents, 0.50)").alias("e50"),
        F.expr("percentile(cents, 0.95)").alias("e95"),
    ).select(
        F.explode(
            F.array(
                F.struct(F.lit(25).alias("q"), F.col("e25").alias("x")),
                F.struct(F.lit(50).alias("q"), F.col("e50").alias("x")),
                F.struct(F.lit(95).alias("q"), F.col("e95").alias("x")),
            )
        ).alias("s")
    ).select(F.col("s.q").alias("q"), F.col("s.x").alias("exact_cents"))
    return (
        est.join(exact, "q")
        .select(
            "q",
            "est_lo",
            "est_hi",
            F.round("exact_cents", 6).alias("exact_cents"),
            (
                (F.col("exact_cents") >= F.col("est_lo"))
                & (F.col("exact_cents") <= F.col("est_hi"))
            ).alias("exact_within_bucket_ok"),
        )
        .orderBy("q")
    )


# ---------------------------------------------------------------------------
# Winsorized mean (clamped-tail robust average)
# ---------------------------------------------------------------------------

_WINSOR_ORACLE = """
WITH v AS (
  SELECT c_mktsegment,
         CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_cents
  FROM customer
),
cuts AS (
  SELECT c_mktsegment,
         quantile_cont(bal_cents, 0.05) AS p05,
         quantile_cont(bal_cents, 0.95) AS p95
  FROM v GROUP BY c_mktsegment
),
clamped AS (
  SELECT v.c_mktsegment,
         CAST(ROUND(LEAST(GREATEST(CAST(v.bal_cents AS DOUBLE), c.p05),
                          c.p95)) AS BIGINT) AS w_cents,
         v.bal_cents
  FROM v JOIN cuts c ON v.c_mktsegment = c.c_mktsegment
)
SELECT c_mktsegment,
       COUNT(*) AS n,
       ROUND(CAST(SUM(bal_cents) AS DOUBLE) / COUNT(*) / 100, 6) AS raw_mean,
       ROUND(CAST(SUM(w_cents) AS DOUBLE) / COUNT(*) / 100, 6)
         AS winsorized_mean,
       CAST(SUM(CASE WHEN w_cents <> bal_cents THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clamped
FROM clamped
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


@register(
    "a_winsorized_mean",
    oracle=_WINSOR_ORACLE,
    tags=("A8", "A1", "J2", "F3"),
)
def a_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean per segment: values clamped to the exact
    [p5, p95] range before averaging — the robust average that KEEPS
    outlier rows (at clamped magnitude) where trimming drops them:
    the standard treatment for revenue metrics where a single whale
    should count, but not dominate. Reported next to the raw mean and
    the clamp count so the adjustment is auditable.

    Determinism: exact interpolated percentiles of integer cents are
    .0/.5-exact doubles (the `a_mad_outliers` property); clamped
    values round back to exact BIGINT cents so the final sums are
    partition-order-free. Scale: one exact grouped percentile (the
    honest sort), 5-row cut table broadcast back, one combinable
    rollup.
    """
    c = load_table(spark, sf_dir, "customer")
    v = c.select(
        "c_mktsegment", cents(F.col("c_acctbal")).alias("bal_cents")
    )
    cuts = v.groupBy("c_mktsegment").agg(
        F.expr("percentile(bal_cents, 0.05)").alias("p05"),
        F.expr("percentile(bal_cents, 0.95)").alias("p95"),
    )
    clamped = v.join(F.broadcast(cuts), "c_mktsegment").select(
        "c_mktsegment",
        "bal_cents",
        F.round(
            F.least(
                F.greatest(F.col("bal_cents").cast("double"), F.col("p05")),
                F.col("p95"),
            )
        )
        .cast("long")
        .alias("w_cents"),
    )
    return (
        clamped.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum("bal_cents").cast("double") / F.count(F.lit(1)) / 100, 6
            ).alias("raw_mean"),
            F.round(
                F.sum("w_cents").cast("double") / F.count(F.lit(1)) / 100, 6
            ).alias("winsorized_mean"),
            F.sum(
                F.when(F.col("w_cents") != F.col("bal_cents"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_clamped"),
        )
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# ROLLUP with ratio-to-parent (hierarchy share report)
# ---------------------------------------------------------------------------

_SHARE_PARENT_ORACLE = """
WITH leaf AS (
  SELECT r.r_name AS region, n.n_name AS nation,
         CAST(SUM(CAST(ROUND(c.c_acctbal * 100) AS BIGINT)) AS BIGINT)
           AS bal_cents
  FROM customer c
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY r.r_name, n.n_name
),
region_tot AS (
  SELECT region, CAST(SUM(bal_cents) AS BIGINT) AS region_cents
  FROM leaf GROUP BY region
),
grand AS (SELECT CAST(SUM(bal_cents) AS BIGINT) AS grand_cents FROM leaf)
SELECT l.region, l.nation, l.bal_cents,
       rt.region_cents,
       CAST(l.bal_cents * 1000000 // rt.region_cents AS BIGINT)
         AS share_of_region_ppm,
       CAST(rt.region_cents * 1000000 // g.grand_cents AS BIGINT)
         AS region_share_of_total_ppm
FROM leaf l
JOIN region_tot rt ON l.region = rt.region
CROSS JOIN grand g
ORDER BY l.region, l.nation
"""


@register(
    "a_rollup_share_of_parent",
    oracle=_SHARE_PARENT_ORACLE,
    tags=("A5", "A1", "J6", "W3"),
)
def a_rollup_share_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchy share-of-parent report: each nation's balance as a
    share of its REGION, and each region's share of the grand total —
    the ratio-to-parent OLAP shape (`a_rollup` emits the levels; this
    RELATES them). Implemented with partition windows over the leaf
    rollup rather than joining GROUPING-SETS outputs back to
    themselves: the leaf aggregate is computed ONCE and both parent
    levels come from windows over its (|nations|-sized) result —
    shares in exact integer ppm.

    Scale: one star join + one combinable leaf rollup; the windows
    run over 25 rows.
    """
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    leaf = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.sum(cents(F.col("c_acctbal"))).cast("long").alias("bal_cents"))
    )
    w_region = Window.partitionBy("region")
    w_all = Window.partitionBy()
    return (
        leaf.withColumn(
            "region_cents", F.sum("bal_cents").over(w_region).cast("long")
        )
        .withColumn(
            "grand_cents", F.sum("bal_cents").over(w_all).cast("long")
        )
        .select(
            "region",
            "nation",
            "bal_cents",
            "region_cents",
            F.expr(
                "CAST(bal_cents * 1000000 DIV region_cents AS BIGINT)"
            ).alias("share_of_region_ppm"),
            F.expr(
                "CAST(region_cents * 1000000 DIV grand_cents AS BIGINT)"
            ).alias("region_share_of_total_ppm"),
        )
        .orderBy("region", "nation")
    )


# ---------------------------------------------------------------------------
# Pythagorean means (arithmetic / geometric / harmonic) per group
# ---------------------------------------------------------------------------

_PYTH_MEANS_ORACLE = """
WITH v AS (
  SELECT o_orderpriority AS prio,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
leaves AS (
  SELECT prio, cents,
         CAST(ROUND(LN(cents) * 1000000) AS BIGINT) AS log_micro,
         CAST(ROUND(1000000000000.0 / cents) AS BIGINT) AS recip_pico
  FROM v
),
agg AS (
  SELECT prio, COUNT(*) AS n,
         CAST(SUM(cents) AS BIGINT) AS s,
         CAST(SUM(log_micro) AS BIGINT) AS slog,
         CAST(SUM(recip_pico) AS BIGINT) AS srecip
  FROM leaves GROUP BY prio
)
SELECT prio, n,
       ROUND(CAST(s AS DOUBLE) / n / 100, 6) AS arithmetic_mean,
       ROUND(EXP(CAST(slog AS DOUBLE) / n / 1000000) / 100, 4)
         AS geometric_mean,
       ROUND(CAST(n AS DOUBLE) * 1000000000000 / srecip / 100, 4)
         AS harmonic_mean
FROM agg
ORDER BY prio
"""


@register(
    "a_pythagorean_means",
    oracle=_PYTH_MEANS_ORACLE,
    tags=("A1", "A8", "F3"),
)
def a_pythagorean_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All three Pythagorean means of order value per priority class —
    arithmetic (total magnitude), geometric (multiplicative-scale
    center, robust to right skew), harmonic (rate-style averaging) —
    the A ≥ G ≥ H triple that answers different questions about the
    same skewed money distribution.

    Determinism discipline per mean: arithmetic from exact cent sums;
    geometric in log space with micro-nat LEAF rounding (so the sum is
    exact) and the single EXP at the end rounded to 4dp (the
    e_survival_km_curve allowance for libm exp's final ulp); harmonic
    from reciprocals rounded to exact pico-units at the leaf — no
    float accumulates across rows anywhere. One combinable pass.
    """
    o = load_table(spark, sf_dir, "orders")
    leaves = o.select(
        F.col("o_orderpriority").alias("prio"),
        cents(F.col("o_totalprice")).alias("cents"),
    ).select(
        "prio",
        "cents",
        F.round(F.log("cents") * 1000000).cast("long").alias("log_micro"),
        F.round(1000000000000.0 / F.col("cents")).cast("long").alias(
            "recip_pico"
        ),
    )
    agg = leaves.groupBy("prio").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").cast("long").alias("s"),
        F.sum("log_micro").cast("long").alias("slog"),
        F.sum("recip_pico").cast("long").alias("srecip"),
    )
    return agg.select(
        "prio",
        "n",
        F.round(F.col("s").cast("double") / F.col("n") / 100, 6).alias(
            "arithmetic_mean"
        ),
        F.round(
            F.exp(F.col("slog").cast("double") / F.col("n") / 1000000) / 100, 4
        ).alias("geometric_mean"),
        F.round(
            F.col("n").cast("double") * 1000000000000 / F.col("srecip") / 100,
            4,
        ).alias("harmonic_mean"),
    ).orderBy("prio")


# ---------------------------------------------------------------------------
# Relational division: on-time-in-full orders via bool_and (FORALL)
# ---------------------------------------------------------------------------

_OTIF_ORACLE = """
WITH lines AS (
  SELECT l.l_orderkey,
         o.o_orderdate,
         CAST(l.l_shipdate AS DATE)
           <= CAST(o.o_orderdate AS DATE) + INTERVAL 30 DAY AS on_time
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
per_order AS (
  SELECT l_orderkey,
         STRFTIME(CAST(o_orderdate AS DATE), '%Y') AS order_year,
         BOOL_AND(on_time) AS all_on_time,
         BOOL_OR(NOT on_time) AS any_late,
         COUNT(*) AS n_lines
  FROM lines
  GROUP BY l_orderkey, STRFTIME(CAST(o_orderdate AS DATE), '%Y')
)
SELECT order_year,
       COUNT(*) AS n_orders,
       CAST(SUM(CASE WHEN all_on_time THEN 1 ELSE 0 END) AS BIGINT)
         AS n_otif,
       CAST(SUM(CASE WHEN all_on_time THEN 1 ELSE 0 END) * 1000000
            // COUNT(*) AS BIGINT) AS otif_ppm,
       CAST(SUM(n_lines) AS BIGINT) AS n_lines
FROM per_order
GROUP BY order_year
ORDER BY order_year
"""


@register(
    "a_relational_division_otif",
    oracle=_OTIF_ORACLE,
    tags=("A1", "A7", "J1", "F2"),
)
def a_relational_division_otif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational division — the FORALL quantifier as an aggregate:
    an order is on-time-in-full (OTIF, the supply-chain perfect-order
    KPI) only if EVERY one of its lines ships within 30 days of the
    order date. Division ("orders ⊇ all qualifying lines") is the
    one relational-algebra operator SQL lacks syntax for; the
    scalable spelling is bool_and per group — one combinable
    aggregate — instead of the textbook double-NOT-EXISTS
    correlated subquery, which plans as two anti joins.

    Scale: the fact-side join carries only (orderkey, shipdate)
    against (orderkey, orderdate); both the per-order bool_and and
    the yearly rollup are map-side combinable."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    lines = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        F.date_format(F.col("o_orderdate").cast("date"), "yyyy").alias(
            "order_year"
        ),
        (
            F.col("l_shipdate").cast("date")
            <= F.date_add(F.col("o_orderdate").cast("date"), 30)
        ).alias("on_time"),
    )
    per_order = lines.groupBy("l_orderkey", "order_year").agg(
        F.bool_and("on_time").alias("all_on_time"),
        F.count(F.lit(1)).alias("n_lines"),
    )
    return (
        per_order.groupBy("order_year")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.when(F.col("all_on_time"), 1).otherwise(0))
            .cast("long")
            .alias("n_otif"),
            F.expr(
                "CAST(SUM(CASE WHEN all_on_time THEN 1 ELSE 0 END) "
                "* 1000000 DIV COUNT(*) AS BIGINT)"
            ).alias("otif_ppm"),
            F.sum("n_lines").cast("long").alias("n_lines"),
        )
        .orderBy("order_year")
    )


# ---------------------------------------------------------------------------
# Semantic layer: metric definitions as data, compiled to ONE pass
# ---------------------------------------------------------------------------

#: The metric registry a semantic layer would hold: name -> (filter
#: predicate over events, value expression). Compiled into conditional
#: aggregates so N metrics still cost ONE scan.
_METRIC_SPECS = (
    ("purchase_revenue", "event_type = 'purchase'", "cents"),
    ("purchase_count", "event_type = 'purchase'", "one"),
    ("error_count", "event_type = 'error'", "one"),
    ("signup_count", "event_type = 'signup'", "one"),
    ("engagement_value", "event_type IN ('click', 'view')", "cents"),
    ("weekend_revenue",
     "event_type = 'purchase' AND dayofweek IN (1, 7)", "cents"),
)

_SEMANTIC_ORACLE = """
WITH base AS (
  SELECT event_type,
         CAST(ROUND(value * 100) AS BIGINT) AS cents,
         1 AS one,
         DAYOFWEEK(CAST(ts AS DATE)) + 1 AS dayofweek
  FROM events
)
SELECT metric, val FROM (
  SELECT
    CAST(SUM(CASE WHEN event_type = 'purchase' THEN cents ELSE 0 END)
         AS BIGINT) AS purchase_revenue,
    CAST(SUM(CASE WHEN event_type = 'purchase' THEN one ELSE 0 END)
         AS BIGINT) AS purchase_count,
    CAST(SUM(CASE WHEN event_type = 'error' THEN one ELSE 0 END)
         AS BIGINT) AS error_count,
    CAST(SUM(CASE WHEN event_type = 'signup' THEN one ELSE 0 END)
         AS BIGINT) AS signup_count,
    CAST(SUM(CASE WHEN event_type IN ('click', 'view') THEN cents ELSE 0 END)
         AS BIGINT) AS engagement_value,
    CAST(SUM(CASE WHEN event_type = 'purchase' AND dayofweek IN (1, 7)
             THEN cents ELSE 0 END) AS BIGINT) AS weekend_revenue
  FROM base
) UNPIVOT (val FOR metric IN (purchase_revenue, purchase_count,
  error_count, signup_count, engagement_value, weekend_revenue))
ORDER BY metric
"""


@register(
    "a_semantic_layer_metrics",
    oracle=_SEMANTIC_ORACLE,
    tags=("A7", "A1", "E2"),
)
def a_semantic_layer_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A semantic layer in miniature: metric definitions live as DATA
    (name, filter predicate, value expression — `_METRIC_SPECS`), and
    the engine COMPILES them into conditional aggregates at plan
    time, so six governed metrics cost exactly one scan of the fact
    table instead of six dashboard queries. This
    compile-metrics-to-one-pass move is how metric stores (and this
    engine's A7 family) keep consistent definitions cheap at 100 TB.

    Determinism: Spark's dayofweek is aligned to DuckDB's via an
    explicit +1 shift on the DuckDB side (Sunday=1 convention);
    money stays integer cents; output is long-format (metric, val) via
    stack/UNPIVOT so new metric definitions never change the
    schema."""
    e = load_table(spark, sf_dir, "events")
    base = e.select(
        "event_type",
        cents(F.col("value")).alias("cents"),
        F.lit(1).alias("one"),
        F.dayofweek(F.col("ts").cast("date")).alias("dayofweek"),
    )
    aggs = [
        F.sum(
            F.when(F.expr(pred), F.col(val)).otherwise(0)
        ).cast("long").alias(name)
        for name, pred, val in _METRIC_SPECS
    ]
    wide = base.agg(*aggs)
    names = ", ".join(
        f"'{name}', {name}" for name, _, _ in _METRIC_SPECS
    )
    return wide.selectExpr(
        f"stack({len(_METRIC_SPECS)}, {names}) AS (metric, val)"
    ).orderBy("metric")


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch with an exact merge proof
# ---------------------------------------------------------------------------

_KMV_ORACLE = """
WITH hashed AS (
  SELECT DISTINCT (l_partkey * 2654435761 + 40503) % 2147483647 AS h
  FROM lineitem
),
kmin_full AS (SELECT h FROM hashed ORDER BY h LIMIT 64),
full_est AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(MAX(h) AS BIGINT) AS hk
  FROM kmin_full
),
by_flag AS (
  SELECT l_returnflag AS flag,
         (l_partkey * 2654435761 + 40503) % 2147483647 AS h
  FROM lineitem
  GROUP BY l_returnflag, (l_partkey * 2654435761 + 40503) % 2147483647
),
flag_kmin AS (
  SELECT flag, h,
         ROW_NUMBER() OVER (PARTITION BY flag ORDER BY h) AS rn
  FROM by_flag
),
merged AS (
  SELECT DISTINCT h FROM flag_kmin WHERE rn <= 64 ORDER BY h LIMIT 64
),
merged_est AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(MAX(h) AS BIGINT) AS hk
  FROM merged
),
exact AS (
  SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_nd FROM lineitem
)
SELECT f.k AS k,
       f.hk AS h_k,
       (f.k - 1) * 2147483647 // f.hk AS est_full,
       (m.k - 1) * 2147483647 // m.hk AS est_merged,
       exact_nd,
       ABS((f.k - 1) * 2147483647 // f.hk - exact_nd) * 1000000 // exact_nd
         AS rel_err_ppm
FROM full_est f CROSS JOIN merged_est m CROSS JOIN exact
"""


@register(
    "a_kmv_distinct_sketch",
    oracle=_KMV_ORACLE,
    tags=("A4", "A3", "O2", "W1"),
)
def a_kmv_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values / bottom-k) distinct-count sketch over
    part keys, with its mergeability proven IN the output: the sketch
    merged from per-returnflag partial sketches lands on the exact same
    k-min set — est_merged == est_full, row for row — which is the
    whole point of a mergeable sketch at 100 TB (partials combine on
    the reduce side, the raw keys never travel).

    Unlike approx_count_distinct (HLL, engine-private hash → rows-only),
    every step here is deterministic SQL on both engines: a pinned
    multiplicative hash (key * 2654435761 + 40503 mod 2^31-1 — the
    multiplier exceeds the modulus so every key wraps and sequential
    keys equidistribute; products stay far from BIGINT overflow), distinct-hash rollup, per-group bottom-64 via one
    ranked window, merge = union ∪ re-take bottom-64, estimate
    (k-1)*M/h_k in positive integer division — so the driver hash-checks
    the SKETCH itself, not just its error. rel_err_ppm documents the
    k=64 accuracy (~1/√k ≈ 12.5% envelope) against the exact distinct
    count computed once for the proof."""
    li = load_table(spark, sf_dir, "lineitem")
    h = (F.col("l_partkey") * 2654435761 + 40503) % 2147483647
    hashed = li.select(h.alias("h")).distinct()
    kmin_full = hashed.orderBy("h").limit(64)
    full_est = kmin_full.agg(
        F.count(F.lit(1)).alias("k"), F.max("h").alias("hk")
    )
    by_flag = li.select(F.col("l_returnflag").alias("flag"), h.alias("h")).distinct()
    flag_kmin = by_flag.withColumn(
        "rn", F.row_number().over(Window.partitionBy("flag").orderBy("h"))
    )
    merged = (
        flag_kmin.filter(F.col("rn") <= 64)
        .select("h")
        .distinct()
        .orderBy("h")
        .limit(64)
    )
    merged_est = merged.agg(
        F.count(F.lit(1)).alias("k"), F.max("h").alias("hk")
    )
    exact = li.agg(F.count_distinct(F.col("l_partkey")).alias("exact_nd"))
    f_ = full_est.select(F.col("k").alias("kf"), F.col("hk").alias("hkf"))
    m_ = merged_est.select(F.col("k").alias("km"), F.col("hk").alias("hkm"))
    return (
        f_.crossJoin(broadcast(m_))
        .crossJoin(broadcast(exact))
        .select(
            F.col("kf").alias("k"),
            F.col("hkf").alias("h_k"),
            F.expr("((kf - 1) * 2147483647) DIV hkf").alias("est_full"),
            F.expr("((km - 1) * 2147483647) DIV hkm").alias("est_merged"),
            "exact_nd",
            F.expr(
                "ABS(((kf - 1) * 2147483647) DIV hkf - exact_nd) * 1000000"
                " DIV exact_nd"
            ).alias("rel_err_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# KMV set-operation estimates: intersection + Jaccard from mergeable sketches
# ---------------------------------------------------------------------------

_KMV_SETOPS_ORACLE = """
WITH a_keys AS (
  SELECT DISTINCT (l_partkey * 2654435761 + 40503) % 2147483647 AS h
  FROM lineitem WHERE l_shipdate >= DATE '1996-01-01'
                  AND l_shipdate < DATE '1996-01-15'
),
b_keys AS (
  SELECT DISTINCT (l_partkey * 2654435761 + 40503) % 2147483647 AS h
  FROM lineitem WHERE l_shipdate >= DATE '1996-01-08'
                  AND l_shipdate < DATE '1996-01-22'
),
ka AS (SELECT h FROM a_keys ORDER BY h LIMIT 64),
kb AS (SELECT h FROM b_keys ORDER BY h LIMIT 64),
ku AS (
  SELECT DISTINCT h FROM (SELECT h FROM ka UNION ALL SELECT h FROM kb)
  ORDER BY h LIMIT 64
),
est AS (
  SELECT
    (SELECT (COUNT(*) - 1) * 2147483647 // MAX(h) FROM ka) AS est_a,
    (SELECT (COUNT(*) - 1) * 2147483647 // MAX(h) FROM kb) AS est_b,
    (SELECT (COUNT(*) - 1) * 2147483647 // MAX(h) FROM ku) AS est_union,
    (SELECT CAST(COUNT(*) AS BIGINT) FROM ku
      WHERE h IN (SELECT h FROM ka) AND h IN (SELECT h FROM kb))
      AS k_both,
    (SELECT CAST(COUNT(*) AS BIGINT) FROM ku) AS k_u
),
exact AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS exact_inter
  FROM (SELECT h FROM a_keys INTERSECT SELECT h FROM b_keys)
)
SELECT est_a, est_b, est_union,
       est_a + est_b - est_union AS est_inter,
       exact_inter,
       k_both * 1000000 // k_u AS jaccard_est_ppm
FROM est CROSS JOIN exact
"""


@register(
    "a_kmv_set_intersection",
    oracle=_KMV_SETOPS_ORACLE,
    tags=("A4", "A3", "O4", "O2"),
)
def a_kmv_set_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-operation estimates from KMV sketches: parts shipped in two OVERLAPPING fortnights
    (Jan 1-14 vs Jan 8-21, 1996) — intersection by inclusion-exclusion over the three
    sketch estimates, Jaccard by the fraction of the union's k-min set
    present in BOTH input sketches (the textbook KMV set-similarity
    estimator). The exact intersection rides along as ground truth, so
    the sweep output quantifies the k=64 estimator's error directly.

    Scale shape — this is how distinct-intersections are answered at
    100 TB: each side reduces to a 64-value bottom-k sketch (combinable,
    map-side partial as in a_kmv_distinct_sketch), set algebra then
    runs on 64-row sets. Every step is deterministic pinned-hash
    integer arithmetic, so even the ESTIMATES hash-match the oracle."""
    li = load_table(spark, sf_dir, "lineitem")
    h = (F.col("l_partkey") * 2654435761 + 40503) % 2147483647
    a_keys = (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1996-01-15")
        ).select(h.alias("h")).distinct()
    )
    b_keys = (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-08")
            & (F.col("l_shipdate") < "1996-01-22")
        ).select(h.alias("h")).distinct()
    )
    ka = a_keys.orderBy("h").limit(64)
    kb = b_keys.orderBy("h").limit(64)
    ku = ka.unionAll(kb).distinct().orderBy("h").limit(64)

    def est(kdf: DataFrame, name: str) -> DataFrame:
        return kdf.agg(
            F.expr("(COUNT(*) - 1) * 2147483647 DIV MAX(h)").alias(name)
        )

    k_both = (
        ku.join(ka.withColumnRenamed("h", "h"), "h", "left_semi")
        .join(kb, "h", "left_semi")
        .agg(F.count(F.lit(1)).alias("k_both"))
    )
    k_u = ku.agg(F.count(F.lit(1)).alias("k_u"))
    exact = a_keys.intersect(b_keys).agg(F.count(F.lit(1)).alias("exact_inter"))
    out = (
        est(ka, "est_a")
        .crossJoin(broadcast(est(kb, "est_b")))
        .crossJoin(broadcast(est(ku, "est_union")))
        .crossJoin(broadcast(k_both))
        .crossJoin(broadcast(k_u))
        .crossJoin(broadcast(exact))
    )
    return out.select(
        "est_a",
        "est_b",
        "est_union",
        (F.col("est_a") + F.col("est_b") - F.col("est_union")).alias("est_inter"),
        "exact_inter",
        F.expr("k_both * 1000000 DIV k_u").alias("jaccard_est_ppm"),
    )


# ---------------------------------------------------------------------------
# Distinct-count estimator comparison study (exact vs HLL vs KMV)
# ---------------------------------------------------------------------------

@register(
    "a_distinct_estimator_comparison",
    oracle=None,
    tags=("A3", "A4", "A2"),
)
def a_distinct_estimator_comparison(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One table, three distinct-count answers: exact COUNT(DISTINCT),
    HyperLogLog++ (approx_count_distinct, rsd=0.02), and the KMV
    bottom-64 sketch — side by side with each estimator's relative
    error in ppm. This is the decision table for the 100 TB trade:
    exact needs a full shuffle of the keys, HLL is 1.5 KB of mergeable
    state with engine-private hashing, KMV is 512 bytes and
    cross-engine reproducible (`a_kmv_distinct_sketch` proves it by
    hash). Rows-only because HLL's estimate is engine-private; each
    row self-validates: err_ok pins HLL within 3·rsd and KMV within
    3/√k of exact — the standard-error envelopes both sketches
    guarantee."""
    li = load_table(spark, sf_dir, "lineitem")
    h = (F.col("l_partkey") * 2654435761 + 40503) % 2147483647
    exact = li.agg(F.count_distinct("l_partkey").alias("v")).first().v
    hll = (
        li.agg(F.approx_count_distinct("l_partkey", 0.02).alias("v")).first().v
    )
    kmin = li.select(h.alias("h")).distinct().orderBy("h").limit(64)
    krow = kmin.agg(
        F.count(F.lit(1)).alias("k"), F.max("h").alias("hk")
    ).first()
    kmv = (
        krow.k if krow.k < 64 else (krow.k - 1) * 2147483647 // krow.hk
    )
    rows = [
        ("exact", int(exact), 0, True),
        (
            "hll_rsd02",
            int(hll),
            abs(int(hll) - exact) * 1000000 // exact,
            abs(int(hll) - exact) <= max(3 * 0.02 * exact, 1),
        ),
        (
            "kmv_k64",
            int(kmv),
            abs(int(kmv) - exact) * 1000000 // exact,
            abs(int(kmv) - exact) <= max(3 * exact / 8.0, 1),
        ),
    ]
    return spark.createDataFrame(
        rows, "estimator STRING, estimate BIGINT, rel_err_ppm BIGINT, err_ok BOOLEAN"
    ).orderBy("estimator")


# --- A5, second wave: cube + share-of-grand-total in one pass --------------

_CUBE_GRAND_SHARE_ORACLE = """
WITH base AS (
  SELECT r_name,
         CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
         CAST(ROUND(o_totalprice * 100) AS BIGINT)      AS tp_cents
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
),
cube_t AS (
  SELECT COALESCE(r_name, 'ALL') AS region,
         COALESCE(yr, 0)         AS yr,
         CAST(GROUPING(r_name) * 2 + GROUPING(yr) AS BIGINT) AS gid,
         CAST(SUM(tp_cents) AS BIGINT) AS rev_cents
  FROM base
  GROUP BY CUBE (r_name, yr)
)
SELECT region, yr, gid,
       rev_cents / 100.0 AS revenue,
       CAST(rev_cents * 10000 // (SELECT rev_cents FROM cube_t
                                  WHERE gid = 3) AS BIGINT) AS share_bp
FROM cube_t
ORDER BY gid, region, yr
"""


@register(
    "a_cube_grand_share",
    oracle=_CUBE_GRAND_SHARE_ORACLE,
    tags=("A5", "A1", "J2", "J6"),
)
def a_cube_grand_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5, second wave: full CUBE over (region, order-year) with every
    cell expressed as basis points of the grand total taken from the
    SAME cube pass (the grouping_id() == 3 cell), so the share column
    needs no second scan of the fact table.

    Scale notes: one star join (broadcast dims) + one cube aggregate —
    Catalyst's Expand produces the 4 grouping combinations map-side, so
    the fact table is read ONCE regardless of cube arity. The grand
    total is re-joined as a broadcast single row on a constant key
    (BroadcastHashJoin, not a nested-loop cross), and the share is
    exact integer math (cents * 10000 DIV grand-cents) so the division
    is order-insensitive."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    base = (
        orders.join(broadcast(customer.select("c_custkey", "c_nationkey")),
                    orders.o_custkey == F.col("c_custkey"))
        .join(broadcast(nation.select("n_nationkey", "n_regionkey")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .join(broadcast(region.select("r_regionkey", "r_name")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            "r_name",
            F.year("o_orderdate").cast("long").alias("yr"),
            cents(F.col("o_totalprice")).alias("tp_cents"),
        )
    )
    cube_t = (
        base.cube("r_name", "yr")
        .agg(
            F.sum("tp_cents").cast("long").alias("rev_cents"),
            F.grouping_id().cast("long").alias("gid"),
        )
        .select(
            F.coalesce(F.col("r_name"), F.lit("ALL")).alias("region"),
            F.coalesce(F.col("yr"), F.lit(0)).cast("long").alias("yr"),
            "gid",
            "rev_cents",
        )
    )
    grand = (
        cube_t.filter(F.col("gid") == 3)
        .select(F.lit(1).alias("k"), F.col("rev_cents").alias("grand_cents"))
    )
    return (
        cube_t.withColumn("k", F.lit(1))
        .join(broadcast(grand), "k")
        .select(
            "region",
            "yr",
            "gid",
            (F.col("rev_cents") / 100.0).alias("revenue"),
            F.expr("CAST(rev_cents * 10000 DIV grand_cents AS BIGINT)").alias(
                "share_bp"
            ),
        )
        .orderBy("gid", "region", "yr")
    )


# --- A5, third wave: calendar-hierarchy rollup ------------------------------

_CAL_ROLLUP_ORACLE = """
SELECT COALESCE(CAST(yr AS BIGINT), 0)  AS yr,
       COALESCE(CAST(qtr AS BIGINT), 0) AS qtr,
       COALESCE(CAST(mon AS BIGINT), 0) AS mon,
       CAST(GROUPING(yr) * 4 + GROUPING(qtr) * 2 + GROUPING(mon) AS BIGINT)
         AS gid,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) / 100.0
         AS revenue
FROM (
  SELECT EXTRACT(year FROM o_orderdate)    AS yr,
         EXTRACT(quarter FROM o_orderdate) AS qtr,
         EXTRACT(month FROM o_orderdate)   AS mon,
         o_totalprice
  FROM orders
) t
GROUP BY ROLLUP (yr, qtr, mon)
ORDER BY gid, yr, qtr, mon
"""


@register(
    "a_rollup_calendar_hierarchy",
    oracle=_CAL_ROLLUP_ORACLE,
    tags=("A5", "A1", "F2"),
)
def a_rollup_calendar_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5, third wave: ROLLUP over the natural calendar containment
    hierarchy year > quarter > month — the OLAP drill path, where each
    coarser level is a true prefix aggregate of the finer one (unlike a
    cube over independent dimensions). grouping_id labels the level so
    month rows, quarter subtotals, year subtotals, and the grand total
    coexist in one result without ambiguity against genuine zeros.

    Scale: one scan; Expand emits the 4 hierarchy levels map-side and
    every level is combinable (SUM/COUNT over integer cents)."""
    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        F.year("o_orderdate").cast("long").alias("yr"),
        F.quarter("o_orderdate").cast("long").alias("qtr"),
        F.month("o_orderdate").cast("long").alias("mon"),
        cents(F.col("o_totalprice")).alias("tp_cents"),
    )
    return (
        base.rollup("yr", "qtr", "mon")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            (F.sum("tp_cents").cast("long") / 100.0).alias("revenue"),
        )
        .select(
            F.coalesce(F.col("yr"), F.lit(0)).cast("long").alias("yr"),
            F.coalesce(F.col("qtr"), F.lit(0)).cast("long").alias("qtr"),
            F.coalesce(F.col("mon"), F.lit(0)).cast("long").alias("mon"),
            "gid",
            "n_orders",
            "revenue",
        )
        .orderBy("gid", "yr", "qtr", "mon")
    )


# --- A9, third wave: collect_set -> sorted array profile --------------------

_COLLECT_PROFILE_ORACLE = """
SELECT n_name,
       ARRAY_TO_STRING(LIST_SORT(LIST(DISTINCT o_orderpriority)), '|')
         AS priorities_seen,
       CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS n_priorities,
       CAST(COUNT(*) AS BIGINT)                        AS n_jumbo
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_totalprice > 498000.0
GROUP BY n_name
ORDER BY n_name
"""


@register(
    "a_collect_sorted_profile",
    oracle=_COLLECT_PROFILE_ORACLE,
    tags=("A9", "A1", "A3", "F4"),
)
def a_collect_sorted_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9, third wave: per-nation domain profile of the EXTREME order
    tail (totalprice > 498k, the top ~0.2%) carried as COLLECTED SETS —
    collect_set dedups distributively (partial sets merge map-side),
    sort_array canonicalizes the unordered result, and array_join
    scalarizes it for the checked output (raw arrays never reach the
    driver hash). Profiling the sparse tail, not the whole table, keeps
    the answer non-degenerate: over all orders every group trivially
    sees every priority (the full-domain profile is a constant — the
    vacuity class the variance audit exists to catch), while the jumbo
    slice genuinely differs per nation.

    Scale: set cardinality is bounded by the value domain (5
    priorities), NOT row count — collected state stays tiny however
    large the fact table grows, and the selective predicate is pushed
    to the scan."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        orders.filter(F.col("o_totalprice") > 498000.0)
        .join(
            broadcast(customer.select("c_custkey", "c_nationkey")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .join(
            broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(
            F.array_join(
                F.sort_array(F.collect_set("o_orderpriority")), "|"
            ).alias("priorities_seen"),
            F.count_distinct("o_orderpriority").cast("long").alias(
                "n_priorities"
            ),
            F.count(F.lit(1)).cast("long").alias("n_jumbo"),
        )
        .orderBy("n_name")
    )


# --- A6/A9, fourth wave: diversity-gated HAVING over collected domains ------

_HAVING_DOMAIN_ORACLE = """
SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT)  AS yr,
       CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS mon,
       ARRAY_TO_STRING(LIST_SORT(LIST(DISTINCT o_orderstatus)), '|')
         AS statuses_seen,
       CAST(COUNT(*) AS BIGINT) AS n_jumbo,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM orders
WHERE o_totalprice > 480000.0
GROUP BY yr, mon
HAVING COUNT(DISTINCT o_orderstatus) >= 2
ORDER BY yr, mon
"""


@register(
    "a_having_status_domains",
    oracle=_HAVING_DOMAIN_ORACLE,
    tags=("A6", "A9", "A1", "A3", "F2", "F4"),
)
def a_having_status_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6/A9, fourth wave: HAVING as a DOMAIN-DIVERSITY gate over the
    jumbo-order tail — months whose >480k slice saw >= 2 distinct order
    statuses, with the surviving domains carried as sorted collected
    sets. The tail slice keeps the domains non-degenerate at sf0.01
    (the full table sees every status in every month — the
    constant-vs-constant vacuity class) and makes the HAVING genuinely
    drop cells; statuses are uniform in this data, so over ALL rows the
    gate would be vacuously true.

    Scale: collect_set state is bounded by the 3-value status domain;
    the selective tail predicate is pushed to the scan; one combinable
    pass, HAVING applied post-aggregate on ~80 monthly cells."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_totalprice") > 480000.0)
        .groupBy(
            F.year("o_orderdate").cast("long").alias("yr"),
            F.month("o_orderdate").cast("long").alias("mon"),
        )
        .agg(
            F.array_join(
                F.sort_array(F.collect_set("o_orderstatus")), "|"
            ).alias("statuses_seen"),
            F.count(F.lit(1)).cast("long").alias("n_jumbo"),
            F.sum(cents(F.col("o_totalprice"))).cast("long").alias("total_cents"),
            F.count_distinct("o_orderstatus").alias("_n_status"),
        )
        .filter(F.col("_n_status") >= 2)
        .drop("_n_status")
        .orderBy("yr", "mon")
    )


# --- A5+A6, fifth wave: CUBE with HAVING and grand-total share ---------------

_CUBE_HAVING_ORACLE = f"""
WITH cube_all AS (
  SELECT COALESCE(o_orderstatus, 'ALL')    AS status,
         COALESCE(o_orderpriority, 'ALL')  AS priority,
         GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS gid,
         CAST(COUNT(*) AS BIGINT)          AS n_orders,
         CAST(SUM({CENTS_SQL.format(expr="o_totalprice")}) AS BIGINT)
                                           AS total_cents
  FROM orders
  GROUP BY CUBE (o_orderstatus, o_orderpriority)
),
grand AS (
  SELECT total_cents AS all_cents FROM cube_all WHERE gid = 3
)
SELECT status, priority, gid, n_orders, total_cents,
       CAST(total_cents * 10000 // (SELECT all_cents FROM grand) AS BIGINT)
         AS share_bp
FROM cube_all
WHERE n_orders >= 10
"""


@register("a_cube_having_share", oracle=_CUBE_HAVING_ORACLE, tags=("A5", "A6", "A2"))
def a_cube_having_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5+A6, fifth wave: a CUBE over (status, priority) with a HAVING
    floor, where each surviving cell also reports its share of the
    grand total in exact basis points. GROUPING() disambiguates real
    NULL keys from subtotal rows (both engines spell the same gid), and
    the grand-total row comes FROM THE CUBE ITSELF (gid = 3), taken
    from the PRE-HAVING cube rows so the denominator survives even if
    the grand-total cell itself fell under the HAVING floor (ADVICE
    r08: the post-HAVING spelling returned zero rows in that edge while
    the oracle's scalar subquery kept them with NULL share) — no second
    scan: the share join is a 1-row broadcast against an already-tiny
    aggregate, so the whole query stays one fact-table pass at any
    scale."""
    orders = load_table(spark, sf_dir, "orders")
    cube_all = (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(cents(F.col("o_totalprice"))).cast("long").alias("total_cents"),
            (
                F.grouping("o_orderstatus") * 2 + F.grouping("o_orderpriority")
            ).cast("long").alias("gid"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "gid",
            "n_orders",
            "total_cents",
        )
    )
    # 1-row grand total re-joined on a constant key: ConstantPropagation
    # folds the condition away leaving a 1-row broadcast NLJ — audited
    # in the plan gate's whitelist, same as a_cube_grand_share (the
    # scale-correct plan; a global window would single-partition the
    # cube output).
    grand = cube_all.filter(F.col("gid") == 3).select(
        F.lit(1).alias("_k"), F.col("total_cents").alias("all_cents")
    )
    cube_rows = cube_all.filter(F.col("n_orders") >= 10)
    return cube_rows.withColumn("_k", F.lit(1)).join(
        broadcast(grand), "_k"
    ).select(
        "status",
        "priority",
        "gid",
        "n_orders",
        "total_cents",
        F.expr("CAST(total_cents * 10000 DIV all_cents AS BIGINT)").alias(
            "share_bp"
        ),
    )


# --- A9+F5, fifth wave: collect aggregates queried through a map column ------

_COLLECT_MAP_ORACLE = """
WITH per_status AS (
  SELECT o_orderpriority, CAST(YEAR(o_orderdate) AS BIGINT) AS yr,
         o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
         STRING_AGG(DISTINCT LPAD(CAST(MONTH(o_orderdate) AS VARCHAR), 2, '0'),
                    '|' ORDER BY LPAD(CAST(MONTH(o_orderdate) AS VARCHAR), 2, '0'))
           FILTER (WHERE o_totalprice > 480000) AS jm
  FROM orders
  GROUP BY 1, 2, 3
)
SELECT o_orderpriority, yr,
       COALESCE(STRING_AGG(jm, '|' ORDER BY jm), '') AS jumbo_months,
       CAST(COALESCE(SUM(n) FILTER (WHERE o_orderstatus = 'O'), 0) AS BIGINT)
         AS n_open,
       CAST(COALESCE(SUM(n) FILTER (WHERE o_orderstatus = 'F'), 0) AS BIGINT)
         AS n_fulfilled
FROM per_status
GROUP BY 1, 2
"""


@register("a_collect_map_top_status", oracle=_COLLECT_MAP_ORACLE, tags=("A9", "F5"))
def a_collect_map_top_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9+F5, fifth wave: per (priority, year) — the months that saw a
    jumbo (>480k) order as a sorted collect_set (the collect aggregate;
    this set genuinely varies per group at every sf), plus per-status
    counts materialized as a real MAP column (map_from_entries over
    collected (status, n) structs) and read back with element_at. The
    map-typed column is exercised inside the plan but the OUTPUT stays
    scalar (the driver's canonicalizer rejects complex checked
    columns). Two stacked combinable aggregations; nothing wider than
    (priority, year, status) ever shuffles."""
    orders = load_table(spark, sf_dir, "orders")
    per_status = orders.groupBy(
        "o_orderpriority",
        F.year("o_orderdate").cast("long").alias("yr"),
        "o_orderstatus",
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.array_join(
            F.sort_array(
                F.collect_set(
                    F.when(
                        F.col("o_totalprice") > 480000.0,
                        F.lpad(F.month("o_orderdate").cast("string"), 2, "0"),
                    )
                )
            ),
            "|",
        ).alias("jm"),
    )
    mapped = per_status.groupBy("o_orderpriority", "yr").agg(
        # Statuses with no jumbo months ('' after array_join) are
        # excluded via when() -> NULL (collect_list skips NULLs), the
        # same rows DuckDB's STRING_AGG skips as NULL.
        F.array_join(
            F.sort_array(
                F.collect_list(F.when(F.col("jm") != "", F.col("jm")))
            ),
            "|",
        ).alias("jumbo_months"),
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("o_orderstatus", "n")))
        ).alias("status_map"),
    )
    return mapped.select(
        "o_orderpriority",
        "yr",
        "jumbo_months",
        F.coalesce(F.element_at("status_map", "O"), F.lit(0))
        .cast("long")
        .alias("n_open"),
        F.coalesce(F.element_at("status_map", "F"), F.lit(0))
        .cast("long")
        .alias("n_fulfilled"),
    )


# --- A5+A6+A2, seventh wave: GROUPING SETS with HAVING and share --------------

_GROUPING_SETS_ORACLE = f"""
WITH gs AS (
  SELECT COALESCE(o_orderstatus, 'ALL')   AS status,
         COALESCE(o_orderpriority, 'ALL') AS priority,
         GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS gid,
         CAST(COUNT(*) AS BIGINT)         AS n_orders,
         CAST(SUM({CENTS_SQL.format(expr="o_totalprice")}) AS BIGINT)
                                          AS total_cents
  FROM orders
  GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
),
grand AS (
  SELECT total_cents AS all_cents FROM gs WHERE gid = 3
)
SELECT status, priority, gid, n_orders, total_cents,
       CAST(total_cents * 10000 // (SELECT all_cents FROM grand) AS BIGINT)
         AS share_bp
FROM gs
WHERE n_orders >= 5
"""


@register(
    "a_grouping_sets_share",
    oracle=_GROUPING_SETS_ORACLE,
    tags=("A5", "A6", "A2"),
)
def a_grouping_sets_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5+A6, seventh wave: EXPLICIT GROUPING SETS — the two one-
    dimensional marginals plus the grand total, WITHOUT the cross
    cells a CUBE would add (the report shape where (status, priority)
    pairs are noise). gid disambiguates the set each row came from;
    the HAVING floor applies after the share-of-grand computation is
    anchored on the pre-HAVING grand row (same edge-pinning as
    a_cube_having_share, ADVICE r08).

    Scale: Spark expands grouping sets in ONE pass over the fact
    (partial aggregation per set, no multi-scan); the grand row rides
    the same aggregate, and the share join broadcasts 1 row."""
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("gs_orders_src")
    gs = spark.sql(
        f"""
        SELECT COALESCE(o_orderstatus, 'ALL')   AS status,
               COALESCE(o_orderpriority, 'ALL') AS priority,
               CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority)
                    AS BIGINT)                  AS gid,
               CAST(COUNT(*) AS BIGINT)         AS n_orders,
               CAST(SUM({CENTS_SQL.format(expr="o_totalprice")}) AS BIGINT)
                                                AS total_cents
        FROM gs_orders_src
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )
    grand = gs.filter(F.col("gid") == 3).select(
        F.lit(1).alias("_k"), F.col("total_cents").alias("all_cents")
    )
    from pyspark.sql.functions import broadcast as _bc

    return (
        gs.filter(F.col("n_orders") >= 5)
        .withColumn("_k", F.lit(1))
        .join(_bc(grand), "_k")
        .select(
            "status",
            "priority",
            "gid",
            "n_orders",
            "total_cents",
            F.expr("CAST(total_cents * 10000 DIV all_cents AS BIGINT)").alias(
                "share_bp"
            ),
        )
    )


# --- A9+A7, seventh wave: collect-to-map with mode readback -------------------

_MAP_MODE_ORACLE = """
WITH per_status AS (
  SELECT o_orderpriority, o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n
  FROM orders GROUP BY 1, 2
),
ranked AS (
  SELECT o_orderpriority, o_orderstatus, n,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY n DESC, o_orderstatus DESC) AS rn
  FROM per_status
)
SELECT r.o_orderpriority,
       r.o_orderstatus AS mode_status,
       r.n             AS n_mode,
       CAST(COALESCE(o.n, 0) AS BIGINT) AS n_open,
       CAST(COALESCE(f.n, 0) AS BIGINT) AS n_fulfilled
FROM ranked r
LEFT JOIN per_status o
  ON o.o_orderpriority = r.o_orderpriority AND o.o_orderstatus = 'O'
LEFT JOIN per_status f
  ON f.o_orderpriority = r.o_orderpriority AND f.o_orderstatus = 'F'
WHERE r.rn = 1
"""


@register(
    "a_map_mode_status",
    oracle=_MAP_MODE_ORACLE,
    tags=("A9", "A7", "F5"),
)
def a_map_mode_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9+F5, seventh wave: per-status counts COLLECTED into a real MAP
    column (map_from_entries over collect_list of structs — the A9
    collect aggregate) and then read back three ways in one projection:
    element_at lookups for the 'O'/'F' census columns and a max(struct)
    argmax for the modal status (ties break to the lexicographically
    LAST status — pinned identically in the oracle's ORDER BY n DESC,
    status DESC). The map never reaches the checked output — complex
    types stay inside the plan.

    Scale: two combinable shuffles (status-pair counts, then 5-key
    priority rollup); the collected map is bounded by |statuses| = 3
    entries per group by construction."""
    orders = load_table(spark, sf_dir, "orders")
    per_status = orders.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    rolled = per_status.groupBy("o_orderpriority").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("o_orderstatus", "n")))
        ).alias("status_counts"),
        F.max(F.struct("n", "o_orderstatus")).alias("mode_pair"),
    )
    return rolled.select(
        "o_orderpriority",
        F.col("mode_pair.o_orderstatus").alias("mode_status"),
        F.col("mode_pair.n").cast("long").alias("n_mode"),
        F.coalesce(F.element_at("status_counts", F.lit("O")), F.lit(0))
        .cast("long")
        .alias("n_open"),
        F.coalesce(F.element_at("status_counts", F.lit("F")), F.lit(0))
        .cast("long")
        .alias("n_fulfilled"),
    )


# --- A5+A6+A9, seventh wave (depth): ROLLUP with quarter collects -------------

_ROLLUP_COLLECT_ORACLE = f"""
SELECT COALESCE(o_orderstatus, 'ALL')   AS status,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority)
            AS BIGINT)                  AS gid,
       CAST(COUNT(*) AS BIGINT)         AS n_orders,
       COALESCE(STRING_AGG(DISTINCT 'Q' || CAST(QUARTER(o_orderdate) AS VARCHAR),
                  '|' ORDER BY 'Q' || CAST(QUARTER(o_orderdate) AS VARCHAR))
                  FILTER (WHERE o_orderkey % 1500 = 7), '')
                                        AS audit_quarters,
       CAST(SUM({CENTS_SQL.format(expr="o_totalprice")}) AS BIGINT)
                                        AS total_cents
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
HAVING COUNT(*) >= 10
"""


@register(
    "a_rollup_quarter_collect",
    oracle=_ROLLUP_COLLECT_ORACLE,
    tags=("A5", "A6", "A9"),
)
def a_rollup_quarter_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5+A9, seventh wave depth: a ROLLUP hierarchy (status ->
    status+priority -> grand total) where each surviving cell ALSO
    reports the sorted DISTINCT set of quarters touched by its
    1-in-1500 deterministic key sample (the audit spot-check set — a
    collect aggregate, A9, riding the same one-pass grouping expansion
    as the additive counts, flattened to a pipe-joined string so the
    checked output stays scalar; the SAMPLE's quarter coverage, unlike
    the cell's full coverage, genuinely varies per cell at every sf).
    HAVING floors thin cells (A6).

    Scale: collect_set here is bounded by construction (4 quarters);
    the rollup is one fact pass with partial aggregation per grouping
    set — never use an unbounded collect in this position."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.array_join(
                F.sort_array(
                    F.collect_set(
                        F.when(
                            F.col("o_orderkey") % 1500 == 7,
                            F.concat(F.lit("Q"), F.quarter("o_orderdate")),
                        )
                    )
                ),
                "|",
            ).alias("audit_quarters"),
            F.sum(cents(F.col("o_totalprice"))).cast("long").alias("total_cents"),
            (
                F.grouping("o_orderstatus") * 2 + F.grouping("o_orderpriority")
            ).cast("long").alias("gid"),
        )
        .filter(F.col("n_orders") >= 10)
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "gid",
            "n_orders",
            "audit_quarters",
            "total_cents",
        )
    )


# === Eighth wave (round 10): A-row depth restocks ==============================

# --- A4+A3, eighth wave: HLL sketch with an exact-count envelope ---------------

_HLL_BANDS_ORACLE = """
SELECT event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users_exact,
       CAST(COUNT(DISTINCT (user_id, CAST(ts AS DATE))) AS BIGINT)
         AS n_user_days_exact,
       TRUE AS hll_users_within_6pct_ok,
       TRUE AS hll_user_days_within_6pct_ok
FROM events
GROUP BY event_type
"""


@register(
    "a_hll_exact_bands",
    oracle=_HLL_BANDS_ORACLE,
    tags=("A4", "A3"),
)
def a_hll_exact_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4+A3, eighth wave: HyperLogLog++ (approx_count_distinct,
    rsd=0.02) run BESIDE the exact COUNT DISTINCT it approximates, on
    two cardinality regimes per event type — distinct users (~10^2-10^3)
    and distinct user-days (~10^3-10^4) — with the approximate value
    checked INSIDE the query against a 6% envelope of the exact count
    and only the boolean verdict emitted. The oracle states the exact
    counts plus literal TRUE flags: HLL's estimate is
    engine-specific so the VALUE cannot be cross-checked, but the
    ENVELOPE can — a broken sketch flips the flag and fails the hash.
    (Measured deviation on this generator: <=0.4% users, <=3.0%
    user-days across sf0.001-0.1; 6% is 2x the observed worst case,
    and rsd 0.02 puts 6% at 3 sigma.)

    Scale: this is WHY A4 exists — the HLL is a fixed ~1.5 KB mergeable
    register set per group (map-side combinable, one narrow shuffle),
    where the exact pair-distinct shuffles every distinct combination;
    at 100 TB only the sketch is affordable, and this query is the
    calibration harness that says when it is trustworthy."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type", "user_id", F.to_date("ts").alias("d")
    )
    agg = e.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("n_users_exact"),
        F.countDistinct("user_id", "d").cast("long").alias("n_user_days_exact"),
        F.approx_count_distinct("user_id", 0.02).alias("hll_users"),
        F.approx_count_distinct(
            F.concat_ws("|", F.col("user_id"), F.col("d")), 0.02
        ).alias("hll_user_days"),
    )
    def within(approx, exact):  # |approx-exact|*100 <= 6*exact, all integer
        return (
            F.abs(F.col(approx) - F.col(exact)) * 100 <= F.col(exact) * 6
        )
    return agg.select(
        "event_type",
        "n_users_exact",
        "n_user_days_exact",
        within("hll_users", "n_users_exact").alias("hll_users_within_6pct_ok"),
        within("hll_user_days", "n_user_days_exact").alias(
            "hll_user_days_within_6pct_ok"
        ),
    )


# --- A9+F5+S6, eighth wave: collect-to-map status census -----------------------

_MAP_ENTRIES_ORACLE = """
WITH per AS (
  SELECT c.c_mktsegment, o.o_orderstatus, COUNT(*) AS n
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
)
SELECT c_mktsegment,
       CASE WHEN c_mktsegment IN ('AUTOMOBILE', 'MACHINERY')
            THEN 'industrial' ELSE 'consumer' END AS channel,
       CAST(COUNT(*) AS BIGINT)                          AS n_statuses,
       CAST(COALESCE(MAX(CASE WHEN o_orderstatus = 'F' THEN n END), 0)
            AS BIGINT)                                   AS n_f,
       CAST(COALESCE(MAX(CASE WHEN o_orderstatus = 'O' THEN n END), 0)
            AS BIGINT)                                   AS n_o,
       CAST(COALESCE(MAX(CASE WHEN o_orderstatus = 'P' THEN n END), 0)
            AS BIGINT)                                   AS n_p,
       CAST(SUM(n) AS BIGINT)                            AS n_orders
FROM per
GROUP BY 1, 2
"""


@register(
    "a_map_collect_entries",
    oracle=_MAP_ENTRIES_ORACLE,
    tags=("A9", "F5", "S6"),
)
def a_map_collect_entries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9+F5+S6, eighth wave: the collect-to-map census — per-(segment,
    status) counts are COLLECTED into one map<status,count> per segment
    (map_from_entries over collect_list(struct), the A9 mechanism),
    then consumed entirely with MAP functions (F5: size, element_at
    with a null-coalesce, and aggregate over map_values for the total)
    so the map never leaves the plan as an output column — the hashable
    scalars it yields are the contract. The channel label joins from a
    5-row in-memory dimension (S6) built with createDataFrame and
    broadcast.

    Scale: two combinable shuffles (status-level, then segment-level
    collect of <=3 entries per group); the map is bounded by status
    cardinality, never by row count."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    per = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment", "o_orderstatus")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    mapped = per.groupBy("c_mktsegment").agg(
        F.map_from_entries(
            F.collect_list(F.struct("o_orderstatus", "n"))
        ).alias("status_map")
    )
    channels = spark.createDataFrame(
        [
            ("AUTOMOBILE", "industrial"),
            ("MACHINERY", "industrial"),
            ("BUILDING", "consumer"),
            ("FURNITURE", "consumer"),
            ("HOUSEHOLD", "consumer"),
        ],
        "c_mktsegment string, channel string",
    )
    return mapped.join(F.broadcast(channels), "c_mktsegment").select(
        "c_mktsegment",
        "channel",
        F.size("status_map").cast("long").alias("n_statuses"),
        F.coalesce(F.element_at("status_map", "F"), F.lit(0))
        .cast("long")
        .alias("n_f"),
        F.coalesce(F.element_at("status_map", "O"), F.lit(0))
        .cast("long")
        .alias("n_o"),
        F.coalesce(F.element_at("status_map", "P"), F.lit(0))
        .cast("long")
        .alias("n_p"),
        F.aggregate(
            F.map_values("status_map"), F.lit(0).cast("long"), lambda a, v: a + v
        ).alias("n_orders"),
    )


# --- A9+F5+A5, eighth wave: rollup with map-extracted mode ---------------------

_ROLLUP_MAP_MODE_ORACLE = """
WITH l1 AS (
  SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
         CAST(MONTH(o_orderdate) AS BIGINT) AS mon,
         COUNT(*) AS n
  FROM orders
  GROUP BY ROLLUP(o_orderpriority), MONTH(o_orderdate)
),
ranked AS (
  SELECT priority, mon, n,
         ROW_NUMBER() OVER (PARTITION BY priority
                            ORDER BY n DESC, mon ASC) AS rn,
         COUNT(*) OVER (PARTITION BY priority) AS n_months,
         SUM(n)   OVER (PARTITION BY priority) AS total_orders
  FROM l1
)
SELECT priority,
       CAST(mon AS BIGINT)          AS mode_mon,
       CAST(n AS BIGINT)            AS mode_n,
       CAST(n_months AS BIGINT)     AS n_months,
       CAST(total_orders AS BIGINT) AS total_orders
FROM ranked WHERE rn = 1
"""


@register(
    "a_rollup_map_mode",
    oracle=_ROLLUP_MAP_MODE_ORACLE,
    tags=("A9", "F5", "A5"),
)
def a_rollup_map_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9+F5+A5, eighth wave: ROLLUP(priority) over per-month order
    counts (A5 — the rolled-up level IS the all-priorities row), each
    level's month histogram COLLECTED into a map<month,n> (A9), and the
    MODE month extracted with pure map algebra (F5): max of map_values,
    map_filter down to the argmax entries, min of map_keys as the
    deterministic tie-break — the declarative argmax-from-map idiom,
    where the proven W-row spelling uses a ranking window instead.

    Scale: the rollup is one combinable pass (|priorities+1| x 12
    cells); maps are bounded at 12 entries; no window touches fact
    rows."""
    o = load_table(spark, sf_dir, "orders")
    # ROLLUP(priority) x concrete month = GROUPING SETS ((priority, mon),
    # (mon)) — Spark's hierarchical rollup() would instead roll the month
    # up, so the explicit grouping-sets form is the correct A5 spelling.
    l1 = (
        o.select(
            "o_orderpriority", F.month("o_orderdate").cast("long").alias("mon")
        )
        .groupingSets(
            [
                [F.col("o_orderpriority"), F.col("mon")],
                [F.col("mon")],
            ],
            F.col("o_orderpriority"),
            F.col("mon"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "mon",
            "n",
        )
    )
    mapped = l1.groupBy("priority").agg(
        F.map_from_entries(F.collect_list(F.struct("mon", "n"))).alias("mm"),
        F.count(F.lit(1)).cast("long").alias("n_months"),
        F.sum("n").cast("long").alias("total_orders"),
    )
    mode_n = F.array_max(F.map_values("mm"))
    mode_mon = F.array_min(
        F.map_keys(F.map_filter("mm", lambda k, v: v == mode_n))
    )
    return mapped.select(
        "priority",
        mode_mon.cast("long").alias("mode_mon"),
        mode_n.cast("long").alias("mode_n"),
        "n_months",
        "total_orders",
    )


# --- A5+A6+F5, ninth wave: rollup lattice share gate with map labels -----------

_ROLLUP_LABEL_SHARE_ORACLE = """
WITH ru AS (
  SELECT COALESCE(l_returnflag, 'ALL') AS flag,
         COALESCE(l_linestatus, 'ALL') AS status,
         COUNT(*)                      AS n,
         SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS qty_x100
  FROM lineitem
  GROUP BY ROLLUP(l_returnflag, l_linestatus)
),
shared AS (
  SELECT *,
         SUM(CASE WHEN flag = 'ALL' AND status = 'ALL' THEN n ELSE 0 END)
           OVER () AS grand_n
  FROM ru
)
SELECT CASE flag WHEN 'A' THEN 'acknowledged'
                 WHEN 'N' THEN 'neutral'
                 WHEN 'R' THEN 'returned'
                 ELSE 'all flags' END          AS flag_label,
       status,
       CAST(n AS BIGINT)                       AS n_items,
       CAST(qty_x100 AS BIGINT)                AS qty_x100,
       CAST(n * 10000 // grand_n AS BIGINT)    AS share_bp
FROM shared
WHERE n * 10000 // grand_n >= 3000
"""


@register(
    "a_rollup_label_share",
    oracle=_ROLLUP_LABEL_SHARE_ORACLE,
    tags=("A5", "A6", "F5"),
)
def a_rollup_label_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5+A6+F5, ninth wave: the hierarchical ROLLUP lattice gated by a
    STRUCTURAL share HAVING — leaf (flag, status) cells each hold ~1/6
    of the grand total while flag subtotals hold ~1/3, so a >=30%
    share-of-grand filter keeps exactly the rolled levels (subtotals +
    grand row) at every scale factor; the filter discriminates on
    lattice LEVEL, not on data noise, which is what makes it
    deterministic at 100 TB. Flag codes become labels through a MAP
    LITERAL lookup (F5's create_map + element_at — the other map idiom
    from a_rollup_map_mode's collected maps). Quantity sums are exact
    x100 integers.

    Scale: one combinable rollup pass over the fact (partial aggregates
    per level map-side); the share window runs on the 10-row lattice,
    never on fact rows."""
    li = load_table(spark, sf_dir, "lineitem")
    ru = li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.expr("CAST(ROUND(l_quantity * 100) AS BIGINT)"))
        .cast("long")
        .alias("qty_x100"),
    ).select(
        F.coalesce("l_returnflag", F.lit("ALL")).alias("flag"),
        F.coalesce("l_linestatus", F.lit("ALL")).alias("status"),
        "n",
        "qty_x100",
    )
    grand = F.sum(
        F.when(
            (F.col("flag") == "ALL") & (F.col("status") == "ALL"), F.col("n")
        ).otherwise(F.lit(0))
    ).over(Window.partitionBy())
    labels = F.create_map(
        F.lit("A"), F.lit("acknowledged"),
        F.lit("N"), F.lit("neutral"),
        F.lit("R"), F.lit("returned"),
        F.lit("ALL"), F.lit("all flags"),
    )
    shared = ru.withColumn("grand_n", grand).withColumn(
        "share_bp", F.expr("CAST(n * 10000 DIV grand_n AS BIGINT)")
    )
    return shared.filter(F.col("share_bp") >= 3000).select(
        F.element_at(labels, F.col("flag")).alias("flag_label"),
        "status",
        F.col("n").alias("n_items"),
        "qty_x100",
        "share_bp",
    )


# --- A5+A9+F5, ninth wave: cube cells with map-argmax priority mode ------------

_CUBE_PRIORITY_MODE_ORACLE = """
WITH per AS (
  SELECT COALESCE(o_orderstatus, 'ALL')                    AS status,
         COALESCE(CAST(YEAR(o_orderdate) AS BIGINT), -1)   AS yr,
         o_orderpriority                                   AS priority,
         COUNT(*)                                          AS n
  FROM orders
  GROUP BY CUBE(o_orderstatus, YEAR(o_orderdate)), o_orderpriority
),
ranked AS (
  SELECT status, yr, priority, n,
         ROW_NUMBER() OVER (PARTITION BY status, yr
                            ORDER BY n DESC, priority ASC) AS rn,
         SUM(n) OVER (PARTITION BY status, yr)             AS n_orders
  FROM per
),
cells AS (
  SELECT COALESCE(o_orderstatus, 'ALL')                  AS status,
         COALESCE(CAST(YEAR(o_orderdate) AS BIGINT), -1) AS yr,
         COUNT(DISTINCT MONTH(o_orderdate))              AS n_months,
         MIN(MONTH(o_orderdate))                         AS mon_min,
         MAX(MONTH(o_orderdate))                         AS mon_max
  FROM orders
  GROUP BY CUBE(o_orderstatus, YEAR(o_orderdate))
)
SELECT r.status, r.yr,
       CAST(r.n_orders AS BIGINT) AS n_orders,
       r.priority                 AS mode_priority,
       CAST(r.n AS BIGINT)        AS mode_n,
       CAST(c.n_months AS BIGINT) AS n_months,
       CAST(c.mon_min AS BIGINT)  AS mon_min,
       CAST(c.mon_max AS BIGINT)  AS mon_max
FROM ranked r JOIN cells c ON r.status = c.status AND r.yr = c.yr
WHERE r.rn = 1
"""


@register(
    "a_cube_priority_mode",
    oracle=_CUBE_PRIORITY_MODE_ORACLE,
    tags=("A5", "A9", "F5"),
)
def a_cube_priority_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5+A9+F5, ninth wave: the full CUBE lattice (status x year — all
    four grouping levels, where a_rollup_map_mode's grouping sets pin
    only two) with, per cell, the MODE order priority extracted by map
    algebra: the 5 priority counts are built as a map via
    map_from_arrays over conditional aggregates (F5 construction), the
    argmax comes from map_filter + array_min(map_keys(...)) with the
    lexicographic tie-break stated identically in the oracle's
    ROW_NUMBER, and the month presence census rides along as a sorted
    collect_set (A9 — n/min/max of the distinct-month array). Cube
    composes with both collected shapes in ONE pass over orders.

    Scale: a single combinable cube pass (4 lattice levels x bounded
    attribute cardinalities, ~32 cells); maps are 5 entries, month
    arrays <=12 — all bounded by schema, never by row count."""
    pris = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderstatus",
        F.year("o_orderdate").cast("long").alias("yr_raw"),
        "o_orderpriority",
        F.month("o_orderdate").alias("mon"),
    )
    cells = o.cube("o_orderstatus", "yr_raw").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.map_from_arrays(
            F.array(*[F.lit(p) for p in pris]),
            F.array(
                *[
                    F.sum(
                        F.when(F.col("o_orderpriority") == p, 1).otherwise(0)
                    ).cast("long")
                    for p in pris
                ]
            ),
        ).alias("pm"),
        F.array_sort(F.collect_set("mon")).alias("mons"),
    )
    mode_n = F.array_max(F.map_values("pm"))
    mode_priority = F.array_min(
        F.map_keys(F.map_filter("pm", lambda k, v: v == mode_n))
    )
    return cells.select(
        F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
        F.coalesce("yr_raw", F.lit(-1)).cast("long").alias("yr"),
        "n_orders",
        mode_priority.alias("mode_priority"),
        mode_n.cast("long").alias("mode_n"),
        F.size("mons").cast("long").alias("n_months"),
        F.element_at("mons", 1).cast("long").alias("mon_min"),
        F.element_at("mons", -1).cast("long").alias("mon_max"),
    )
