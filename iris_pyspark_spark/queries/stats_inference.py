"""Statistical-inference estimators (split from stats_analytics.py,
round 5): association/correlation, robust statistics, hypothesis
tests, tail/concentration indices, shrinkage and resampling.

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
    # Pair generation from per-order baskets (round 11, shared helper):
    # one lineitem shuffle + in-task expansion instead of the two-scan
    # orderkey self-join; the per-order multiplicity feeding n_ab is
    # identical by construction.
    from .graph_analytics import _basket_pairs

    pairs = (
        _basket_pairs(spark, sf_dir)
        .groupBy(
            F.col("u").alias("item_a"),
            F.col("v").alias("item_b"),
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
    headline=True,
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
    # Mixed-width accumulation (round 11, guide §2.3 narrower types):
    # the nine sums whose per-row terms are bounded by the data model
    # (q <= 50 quantity units, d <= 10 discount points, t <= 8 tax
    # points — max product q*q = 2500) accumulate as LONG, which cannot
    # overflow below ~3.7e15 rows (int64 max / 2500), four orders of
    # magnitude past the 100 TB lineitem row count. Only the six
    # price-cent sums (p ~ 1e7 cents; p*p ~ 1e14 per row overflows
    # int64 within one sf0.1 partition) pay the decimal(38,0) slow
    # path. Everything is cast back to decimal(38,0) in the ONE-row
    # post-aggregation projection, so the stack() unpivot and the
    # exact-integer Pearson formulas below see identical types and
    # values — measured 0.76s -> 0.62s for the aggregate at sf0.1.
    stats = leaves.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).alias("sq"),
        F.sum(dec(p)).alias("sp"),
        F.sum(d).alias("sd"),
        F.sum(t).alias("st"),
        F.sum(q * q).alias("sqq"),
        F.sum(dec(p * p)).alias("spp"),
        F.sum(d * d).alias("sdd"),
        F.sum(t * t).alias("stt"),
        F.sum(dec(q * p)).alias("sqp"),
        F.sum(q * d).alias("sqd"),
        F.sum(q * t).alias("sqt"),
        F.sum(dec(p * d)).alias("spd"),
        F.sum(dec(p * t)).alias("spt"),
        F.sum(d * t).alias("sdt"),
    ).select(
        "n",
        *[
            (F.col(c) if c in ("sp", "spp", "sqp", "spd", "spt") else dec(F.col(c))).alias(c)
            for c in ("sq", "sp", "sd", "st", "sqq", "spp", "sdd", "stt",
                      "sqp", "sqd", "sqt", "spd", "spt", "sdt")
        ],
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
