"""Data-governance & principled-sampling operators (engine-added,
round 4): k-anonymity auditing, snapshot diffing into a change-data
feed, systematic probability-proportional-to-size sampling, and a
multinomial Naive Bayes language classifier built entirely from
Catalyst aggregations (no MLlib, no UDF).

Scale discipline shared by the module: heavy passes are combinable
groupBys; per-stratum windows partition on a bounded key (source); all
cross-engine floats go through the exact-integer sufficient-statistics
/ micro-nat patterns established in queries/llm_text.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table, load_tables
from ..registry import register
from .joins import CENTS_SQL, cents

# ---------------------------------------------------------------------------
# k-anonymity / l-diversity audit
# ---------------------------------------------------------------------------

_KANON_ORACLE = """
WITH classes AS (
  SELECT c_nationkey, c_mktsegment,
         COUNT(*) AS n_rows,
         COUNT(DISTINCT CAST(FLOOR(c_acctbal / 1000.0) AS INTEGER))
           AS l_distinct
  FROM customer
  GROUP BY c_nationkey, c_mktsegment
),
overall AS (
  SELECT MIN(n_rows) AS k_global,
         CAST(SUM(CASE WHEN n_rows < 5 THEN n_rows ELSE 0 END) AS BIGINT)
           AS n_rows_at_risk
  FROM classes
)
SELECT c_nationkey, c_mktsegment, n_rows, l_distinct,
       n_rows >= 5 AS k_anonymous,
       l_distinct >= 3 AS l_diverse,
       g.k_global, g.n_rows_at_risk
FROM classes CROSS JOIN overall g
ORDER BY n_rows, c_nationkey, c_mktsegment
LIMIT 30
"""


@register(
    "a_k_anonymity_audit",
    oracle=_KANON_ORACLE,
    tags=("A1", "A3", "O2", "P6"),
)
def a_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy audit before a data release: group the table by its
    quasi-identifiers (nation × market segment), and report the 30
    smallest equivalence classes with their k (class size) and l
    (distinct sensitive values — banded account balance) — the
    k-anonymity / l-diversity readout that decides whether rows need
    suppression or generalization before sharing.

    Scale: one combinable groupBy over the quasi-identifier key (class
    count is bounded by the QI domain, not data volume), a 1-row global
    rollup broadcast back, and a deterministic smallest-first top-30
    (ties broken on the QI key) that Spark plans as
    TakeOrderedAndProject — no global sort materializes.
    """
    c = load_table(spark, sf_dir, "customer")
    classes = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct(
            F.floor(F.col("c_acctbal") / 1000.0).cast("int")
        ).alias("l_distinct"),
    )
    glob = classes.agg(
        F.min("n_rows").alias("k_global"),
        F.sum(F.when(F.col("n_rows") < 5, F.col("n_rows")).otherwise(0))
        .cast("long")
        .alias("n_rows_at_risk"),
    )
    return (
        classes.crossJoin(F.broadcast(glob))
        .select(
            "c_nationkey",
            "c_mktsegment",
            "n_rows",
            "l_distinct",
            (F.col("n_rows") >= 5).alias("k_anonymous"),
            (F.col("l_distinct") >= 3).alias("l_diverse"),
            "k_global",
            "n_rows_at_risk",
        )
        .orderBy("n_rows", "c_nationkey", "c_mktsegment")
        .limit(30)
    )


# ---------------------------------------------------------------------------
# Snapshot diff → change-data-feed generation (inverse of CDC apply)
# ---------------------------------------------------------------------------

_CDF_ORACLE = f"""
WITH v1 AS (
  SELECT o_orderkey, o_orderstatus,
         {CENTS_SQL.format(expr="o_totalprice")} AS total_cents
  FROM orders WHERE o_orderkey % 7 <> 0
),
v2 AS (
  SELECT o_orderkey, o_orderstatus,
         CASE WHEN o_orderkey % 3 = 0
              THEN {CENTS_SQL.format(expr="o_totalprice")} + 500
              ELSE {CENTS_SQL.format(expr="o_totalprice")} END AS total_cents
  FROM orders WHERE o_orderkey % 5 <> 0
),
diff AS (
  SELECT COALESCE(v1.o_orderkey, v2.o_orderkey) AS k,
         CASE
           WHEN v1.o_orderkey IS NULL THEN 'insert'
           WHEN v2.o_orderkey IS NULL THEN 'delete'
           WHEN v1.total_cents <> v2.total_cents THEN 'update'
           ELSE 'unchanged'
         END AS op,
         v1.total_cents AS old_cents, v2.total_cents AS new_cents
  FROM v1 FULL OUTER JOIN v2 ON v1.o_orderkey = v2.o_orderkey
)
SELECT op, COUNT(*) AS n_rows,
       CAST(SUM(COALESCE(old_cents, 0)) AS BIGINT) AS sum_old_cents,
       CAST(SUM(COALESCE(new_cents, 0)) AS BIGINT) AS sum_new_cents,
       MIN(k) AS min_key, MAX(k) AS max_key
FROM diff WHERE op <> 'unchanged'
GROUP BY op
ORDER BY op
"""


@register(
    "s_snapshot_diff_cdf",
    oracle=_CDF_ORACLE,
    tags=("J3", "A1", "P6", "P5"),
)
def s_snapshot_diff_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-feed GENERATION: diff two table snapshots into an
    insert/update/delete changelog — the exact inverse of
    `s_cdc_apply_changelog` (which replays such a log). Lakehouse
    table formats derive their change feed this way when the writer
    didn't record row-level changes: one key-equi FULL OUTER join of
    the snapshots, row classification by null-side and value compare,
    and the unchanged majority dropped before anything aggregates.

    The two snapshots are deterministic transforms of `orders` (v1
    drops keys ≡0 mod 7; v2 drops ≡0 mod 5 and bumps totals on ≡0 mod
    3), so every op class is planted and the checksums pin row-level
    content, not just counts. Scale: the join shuffles both snapshots
    once on the key; the summary is a 3-row combinable rollup. Money
    stays in exact integer cents end-to-end.
    """
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        "o_orderkey",
        "o_orderstatus",
        cents(F.col("o_totalprice")).alias("total_cents"),
    )
    v1 = base.filter(F.col("o_orderkey") % 7 != 0).select(
        F.col("o_orderkey").alias("k1"), F.col("total_cents").alias("old_cents")
    )
    v2 = (
        base.filter(F.col("o_orderkey") % 5 != 0)
        .select(
            F.col("o_orderkey").alias("k2"),
            F.when(
                F.col("o_orderkey") % 3 == 0, F.col("total_cents") + 500
            )
            .otherwise(F.col("total_cents"))
            .alias("new_cents"),
        )
    )
    diff = v1.join(v2, v1.k1 == v2.k2, "full_outer").select(
        F.coalesce("k1", "k2").alias("k"),
        F.when(F.col("k1").isNull(), "insert")
        .when(F.col("k2").isNull(), "delete")
        .when(F.col("old_cents") != F.col("new_cents"), "update")
        .otherwise("unchanged")
        .alias("op"),
        "old_cents",
        "new_cents",
    )
    return (
        diff.filter(F.col("op") != "unchanged")
        .groupBy("op")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.coalesce("old_cents", F.lit(0)))
            .cast("long")
            .alias("sum_old_cents"),
            F.sum(F.coalesce("new_cents", F.lit(0)))
            .cast("long")
            .alias("sum_new_cents"),
            F.min("k").alias("min_key"),
            F.max("k").alias("max_key"),
        )
        .orderBy("op")
    )


# ---------------------------------------------------------------------------
# Systematic PPS (probability-proportional-to-size) sampling
# ---------------------------------------------------------------------------

_PPS_ORACLE = """
WITH w AS (
  SELECT source, doc_id, n_chars,
         SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_hi,
         SUM(n_chars) OVER (PARTITION BY source) AS big_w
  FROM documents
),
marked AS (
  SELECT source, doc_id, n_chars, big_w,
         cum_hi - n_chars AS cum_lo, cum_hi,
         CASE WHEN 10 * (cum_hi - n_chars) <= big_w THEN 0
              ELSE (10 * (cum_hi - n_chars) + big_w - 1) // (2 * big_w) END
           AS pts_below_lo,
         CASE WHEN 10 * cum_hi <= big_w THEN 0
              ELSE (10 * cum_hi + big_w - 1) // (2 * big_w) END
           AS pts_below_hi
  FROM w
)
SELECT source, doc_id, n_chars, CAST(big_w AS BIGINT) AS big_w,
       CAST(pts_below_hi - pts_below_lo AS BIGINT) AS n_hits
FROM marked
WHERE pts_below_hi - pts_below_lo >= 1
ORDER BY source, doc_id
"""


@register(
    "n_pps_systematic_sample",
    oracle=_PPS_ORACLE,
    tags=("W3", "A1", "N5", "P2"),
)
def n_pps_systematic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic probability-proportional-to-size sampling: per source
    stratum, k=5 sample points are placed at the midpoints of equal
    slices of the stratum's total character mass, and a document is
    drawn once per point that lands in its cumulative-weight interval
    — the classic PPS design for size-biased corpus sampling (big docs
    proportionally likelier, multiplicity `n_hits` for docs wider than
    a slice), fully deterministic with zero random state.

    All arithmetic is exact BIGINT: point i sits at (2i+1)·W/(2k)
    weight units, and "points strictly below x" has the closed form
    ceil((2k·x − W)/(2W)) — evaluated with positive-only integer
    ceil-division so Spark's truncating DIV and DuckDB's flooring //
    agree. Scale: cumulative weights come from a window PARTITIONED BY
    the stratum (parallel across sources, never a global single-
    partition scan); selection is then a pure map — no join at all.
    """
    d = load_table(spark, sf_dir, "documents")
    w_cum = Window.partitionBy("source").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_all = Window.partitionBy("source")
    k2 = 10  # 2 * k, with k = 5 sample points per stratum
    marked = (
        d.select("source", "doc_id", "n_chars")
        .withColumn("cum_hi", F.sum("n_chars").over(w_cum))
        .withColumn("big_w", F.sum("n_chars").over(w_all))
        .withColumn("cum_lo", F.col("cum_hi") - F.col("n_chars"))
        .withColumn(
            "pts_below_lo",
            F.when(k2 * F.col("cum_lo") <= F.col("big_w"), F.lit(0)).otherwise(
                F.expr(f"({k2} * cum_lo + big_w - 1) DIV (2 * big_w)")
            ),
        )
        .withColumn(
            "pts_below_hi",
            F.when(k2 * F.col("cum_hi") <= F.col("big_w"), F.lit(0)).otherwise(
                F.expr(f"({k2} * cum_hi + big_w - 1) DIV (2 * big_w)")
            ),
        )
    )
    return (
        marked.withColumn(
            "n_hits",
            (F.col("pts_below_hi") - F.col("pts_below_lo")).cast("long"),
        )
        .filter(F.col("n_hits") >= 1)
        .select("source", "doc_id", "n_chars", "big_w", "n_hits")
        .orderBy("source", "doc_id")
    )


# ---------------------------------------------------------------------------
# Multinomial Naive Bayes language ID — pure Catalyst, no MLlib
# ---------------------------------------------------------------------------

_NB_ORACLE = """
WITH split AS (
  SELECT doc_id, lang, LOWER(text) AS text,
         (doc_id * 48271) % 100 < 80 AS is_train
  FROM documents
),
train_tok AS (
  SELECT lang, UNNEST(STRING_SPLIT(text, ' ')) AS term
  FROM split WHERE is_train
),
counts AS (
  SELECT lang, term, COUNT(*) AS c FROM train_tok GROUP BY lang, term
),
lang_tot AS (
  SELECT lang, COUNT(*) AS n_tok FROM train_tok GROUP BY lang
),
vocab AS (SELECT COUNT(DISTINCT term) AS v FROM train_tok),
priors AS (
  SELECT lang, COUNT(*) AS n_docs,
         (SELECT COUNT(*) FROM split WHERE is_train) AS tot_docs
  FROM split WHERE is_train GROUP BY lang
),
test_tok AS (
  SELECT doc_id, lang AS true_lang, UNNEST(STRING_SPLIT(text, ' ')) AS term
  FROM split WHERE NOT is_train
),
scored AS (
  SELECT t.doc_id, t.true_lang, l.lang AS cand_lang,
         CAST(ROUND(LN((COALESCE(c.c, 0) + 1) /
                       CAST(l.n_tok + v.v AS DOUBLE)) * 1000000) AS BIGINT)
           AS tok_micro_nats
  FROM test_tok t
  CROSS JOIN lang_tot l
  CROSS JOIN vocab v
  LEFT JOIN counts c ON c.lang = l.lang AND c.term = t.term
),
doc_scores AS (
  SELECT s.doc_id, s.true_lang, s.cand_lang,
         CAST(SUM(s.tok_micro_nats) AS BIGINT)
           + CAST(ROUND(LN(p.n_docs / CAST(p.tot_docs AS DOUBLE))
                        * 1000000) AS BIGINT) AS score_micro
  FROM scored s JOIN priors p ON p.lang = s.cand_lang
  GROUP BY s.doc_id, s.true_lang, s.cand_lang, p.n_docs, p.tot_docs
),
pred AS (
  SELECT doc_id, true_lang, cand_lang AS pred_lang,
         ROW_NUMBER() OVER (PARTITION BY doc_id
           ORDER BY score_micro DESC, cand_lang) AS rk
  FROM doc_scores
)
SELECT true_lang, pred_lang, COUNT(*) AS n_docs
FROM pred WHERE rk = 1
GROUP BY true_lang, pred_lang
ORDER BY true_lang, pred_lang
"""


@register(
    "n_naive_bayes_langid",
    oracle=_NB_ORACLE,
    tags=("N5", "N7", "A1", "W4"),
)
def n_naive_bayes_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes language identifier trained AND applied
    entirely inside Catalyst — token likelihoods with Laplace
    smoothing, log-priors, and per-document argmax, no MLlib and no
    Python in the loop. Returns the test-split confusion matrix (the
    diagonal should dominate since the corpus langs have disjoint
    vocabularies). Complements `n_langid` (heuristic n-gram scorer)
    and `ml_classification_pipeline` (the MLlib path) by showing the
    same capability as pure relational algebra.

    Determinism: every log-probability is rounded to integer
    micro-nats at the leaf (the llm_text.py convention), so the
    per-document sums are exact integer arithmetic in any partition
    order, and the argmax breaks ties on the candidate language.

    Scale: the model IS two combinable aggregations (token×lang
    counts, lang totals) plus 1-row vocab/prior tables (broadcast);
    scoring fans each test token out ×|langs| (a constant 5) and joins
    the count table UNHINTED — at crawl scale that table is
    vocabulary-sized and must be allowed to shuffle-join rather than
    force-broadcast (the `n_vocab_coverage` posture). One doc-keyed
    shuffle aggregates scores; the argmax is a bounded 5-row-per-doc
    window.
    """
    d = load_table(spark, sf_dir, "documents")
    split = d.select(
        "doc_id",
        "lang",
        F.lower("text").alias("text"),
        ((F.col("doc_id") * 48271) % 100 < 80).alias("is_train"),
    )
    train_tok = (
        split.filter("is_train")
        .select("lang", F.explode(F.split("text", " ")).alias("term"))
    )
    counts = train_tok.groupBy("lang", "term").agg(
        F.count(F.lit(1)).alias("c")
    )
    lang_tot = train_tok.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_tok")
    )
    vocab = train_tok.agg(F.countDistinct("term").alias("v"))
    train_docs = split.filter("is_train")
    priors = (
        train_docs.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .crossJoin(
            F.broadcast(
                train_docs.agg(F.count(F.lit(1)).alias("tot_docs"))
            )
        )
        .select(
            F.col("lang").alias("cand_lang"),
            F.round(
                F.log(F.col("n_docs") / F.col("tot_docs").cast("double"))
                * 1000000
            )
            .cast("long")
            .alias("prior_micro"),
        )
    )
    test_tok = (
        split.filter(~F.col("is_train"))
        .select(
            "doc_id",
            F.col("lang").alias("true_lang"),
            F.explode(F.split("text", " ")).alias("term"),
        )
    )
    cand = (
        test_tok.crossJoin(
            F.broadcast(
                lang_tot.select(F.col("lang").alias("cand_lang"), "n_tok")
            )
        )
        .crossJoin(F.broadcast(vocab))
        .join(
            counts.select(
                F.col("lang").alias("c_lang"),
                F.col("term").alias("c_term"),
                "c",
            ),
            (F.col("cand_lang") == F.col("c_lang"))
            & (F.col("term") == F.col("c_term")),
            "left",
        )
    )
    scored = cand.select(
        "doc_id",
        "true_lang",
        "cand_lang",
        F.round(
            F.log(
                (F.coalesce(F.col("c"), F.lit(0)) + 1)
                / (F.col("n_tok") + F.col("v")).cast("double")
            )
            * 1000000
        )
        .cast("long")
        .alias("tok_micro_nats"),
    )
    doc_scores = (
        scored.groupBy("doc_id", "true_lang", "cand_lang")
        .agg(F.sum("tok_micro_nats").cast("long").alias("tok_sum"))
        .join(F.broadcast(priors), "cand_lang")
        .select(
            "doc_id",
            "true_lang",
            "cand_lang",
            (F.col("tok_sum") + F.col("prior_micro")).alias("score_micro"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score_micro").desc(), "cand_lang"
    )
    pred = doc_scores.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") == 1
    )
    return (
        pred.groupBy(
            "true_lang", F.col("cand_lang").alias("pred_lang")
        )
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("true_lang", "pred_lang")
    )


# ---------------------------------------------------------------------------
# GROUP BY ALL / ORDER BY ALL — one SQL text on both engines
# ---------------------------------------------------------------------------

_GBA_SQL = f"""
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n_lines,
       CAST(SUM({CENTS_SQL.format(expr="l_extendedprice")}) AS BIGINT)
         AS revenue_cents
FROM lineitem
WHERE l_quantity < 30
GROUP BY ALL
ORDER BY ALL
"""


@register("sql_group_by_all", oracle=_GBA_SQL, tags=("E2", "A1", "O1"))
def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL / ORDER BY ALL (Spark 3.4+ / DuckDB dialect
    convergence): the grouping and ordering keys are inferred from the
    select list, and the IDENTICAL SQL text runs on both engines — the
    strongest possible oracle (zero translation). Catalyst resolves
    ALL at analysis time into the ordinary aggregate, so the physical
    plan is the same partial+final hash aggregate as an explicit
    GROUP BY."""
    load_tables(spark, sf_dir, ("lineitem",))
    return spark.sql(_GBA_SQL)


# ---------------------------------------------------------------------------
# Laplace-mechanism noisy counts (deterministic test-harness noise)
# ---------------------------------------------------------------------------

_DP_ORACLE = """
WITH grp AS (
  SELECT lang, source, COUNT(*) AS true_count,
         CAST(SUM(doc_id) % 100000 AS BIGINT) AS seed
  FROM documents GROUP BY lang, source
),
unif AS (
  SELECT lang, source, true_count,
         ((seed * 48271) % 10000 + 0.5) / 10000.0 AS u
  FROM grp
),
noised AS (
  SELECT lang, source, true_count, u,
         CAST(ROUND(-1000000.0 * SIGN(u - 0.5)
                    * LN(1 - 2 * ABS(u - 0.5))) AS BIGINT) AS noise_micro
  FROM unif
)
SELECT lang, source, true_count, noise_micro,
       ROUND((true_count * 1000000 + noise_micro) / 1000000.0, 6)
         AS noisy_count,
       ABS(noise_micro) <= 10000000 AS noise_bounded_ok
FROM noised
ORDER BY lang, source
"""


@register(
    "n_dp_noisy_counts",
    oracle=_DP_ORACLE,
    tags=("A1", "F3", "P6", "N5"),
)
def n_dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laplace-mechanism noisy release of per-(lang, source) document
    counts, scale b = 1/ε with ε = 1 — the differential-privacy
    companion to `a_k_anonymity_audit` (DP protects the release
    mechanism where k-anonymity only audits the table). Noise is drawn
    by inverse-CDF: -b·sign(u−½)·ln(1−2|u−½|).

    HONESTY NOTE: u here is a DETERMINISTIC multiplicative-hash of the
    group (seeded from Σdoc_id mod 1e5) so the query is reproducible
    and oracle-checkable — real DP requires a secret-seeded RNG at this
    one spot; everything else (sensitivity-1 count, scale, mechanism)
    is the production shape. u lands on the (m+0.5)/10⁴ grid, so it is
    never exactly 0/½/1 and |noise| ≤ ln(10⁴) ≈ 9.2 — pinned by the
    `noise_bounded_ok` column.

    Determinism: one combinable count+seed aggregation; the noise
    expression evaluates on exact grid doubles with an identical tree
    (SIGN/ABS exact; LN's result is immediately rounded to integer
    micro). Scale: group-count-sized output, map-side combine, no
    joins at all.
    """
    d = load_table(spark, sf_dir, "documents")
    grp = d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("true_count"),
        (F.sum("doc_id") % 100000).cast("long").alias("seed"),
    )
    u = ((F.col("seed") * 48271) % 10000 + 0.5) / 10000.0
    noised = grp.select(
        "lang",
        "source",
        "true_count",
        F.round(
            -1000000.0
            * F.signum(u - 0.5)
            * F.log(1 - 2 * F.abs(u - 0.5))
        )
        .cast("long")
        .alias("noise_micro"),
    )
    return noised.select(
        "lang",
        "source",
        "true_count",
        "noise_micro",
        F.round(
            (F.col("true_count") * 1000000 + F.col("noise_micro")) / 1000000.0,
            6,
        ).alias("noisy_count"),
        (F.abs("noise_micro") <= 10000000).alias("noise_bounded_ok"),
    ).orderBy("lang", "source")


# ---------------------------------------------------------------------------
# GDPR right-to-be-forgotten: multi-level delete cascade with audit
# ---------------------------------------------------------------------------

_GDPR_ORACLE = """
WITH forget AS (
  SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0
),
orders_gone AS (
  SELECT o_orderkey FROM orders
  WHERE o_custkey IN (SELECT c_custkey FROM forget)
),
audit AS (
  SELECT 'customer' AS tbl,
         (SELECT COUNT(*) FROM customer) AS rows_before,
         (SELECT COUNT(*) FROM customer
          WHERE c_custkey NOT IN (SELECT c_custkey FROM forget))
           AS rows_after
  UNION ALL
  SELECT 'orders',
         (SELECT COUNT(*) FROM orders),
         (SELECT COUNT(*) FROM orders
          WHERE o_custkey NOT IN (SELECT c_custkey FROM forget))
  UNION ALL
  SELECT 'lineitem',
         (SELECT COUNT(*) FROM lineitem),
         (SELECT COUNT(*) FROM lineitem
          WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders_gone))
)
SELECT tbl, rows_before, rows_after,
       rows_before - rows_after AS rows_removed,
       CASE tbl
         WHEN 'customer' THEN (SELECT COUNT(*) FROM forget)
         WHEN 'orders'   THEN (SELECT COUNT(*) FROM orders_gone)
         ELSE (SELECT COUNT(*) FROM lineitem
               WHERE l_orderkey IN (SELECT o_orderkey FROM orders_gone))
       END AS rows_tombstoned,
       rows_before - rows_after = CASE tbl
         WHEN 'customer' THEN (SELECT COUNT(*) FROM forget)
         WHEN 'orders'   THEN (SELECT COUNT(*) FROM orders_gone)
         ELSE (SELECT COUNT(*) FROM lineitem
               WHERE l_orderkey IN (SELECT o_orderkey FROM orders_gone))
       END AS cascade_complete_ok
FROM audit
ORDER BY tbl
"""


@register(
    "s_gdpr_forget_cascade",
    oracle=_GDPR_ORACLE,
    tags=("J5", "J4", "A2", "P4"),
)
def s_gdpr_forget_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten delete cascade: a deterministic forget-set
    of customers (custkey ≡ 0 mod 97) is erased from `customer`, then
    cascaded through the foreign keys — their `orders`, then those
    orders' `lineitem` rows — with a per-table audit row (before /
    after / removed / tombstoned) and a `cascade_complete_ok` proof
    that removed == tombstoned at every level, i.e. nothing orphaned
    and nothing over-deleted.

    Scale: each level is ONE anti join against the (small) key set of
    the level above — the forget-set broadcast-prunes customer and
    orders; the orderkey tombstones of a real deletion batch stay
    small enough to broadcast too, and at worst degrade to a shuffled
    anti join. Counts are combinable; the audit is a 3-row union.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    forget = c.filter(F.col("c_custkey") % 97 == 0).select("c_custkey")
    orders_gone = o.join(
        F.broadcast(forget), o.o_custkey == forget.c_custkey, "left_semi"
    ).select("o_orderkey")

    c_after = c.join(
        F.broadcast(forget), "c_custkey", "left_anti"
    )
    o_after = o.join(
        F.broadcast(forget), o.o_custkey == forget.c_custkey, "left_anti"
    )
    tomb = orders_gone.withColumnRenamed("o_orderkey", "l_orderkey")
    li_gone = li.join(F.broadcast(tomb), "l_orderkey", "left_semi")
    li_after = li.join(F.broadcast(tomb), "l_orderkey", "left_anti")

    def audit(tbl, before_df, after_df, tomb_df):
        return (
            before_df.agg(F.count(F.lit(1)).alias("rows_before"))
            .crossJoin(after_df.agg(F.count(F.lit(1)).alias("rows_after")))
            .crossJoin(tomb_df.agg(F.count(F.lit(1)).alias("rows_tombstoned")))
            .select(
                F.lit(tbl).alias("tbl"),
                "rows_before",
                "rows_after",
                (F.col("rows_before") - F.col("rows_after")).alias(
                    "rows_removed"
                ),
                "rows_tombstoned",
                (
                    F.col("rows_before") - F.col("rows_after")
                    == F.col("rows_tombstoned")
                ).alias("cascade_complete_ok"),
            )
        )

    return (
        audit("customer", c, c_after, forget)
        .unionByName(audit("orders", o, o_after, orders_gone))
        .unionByName(audit("lineitem", li, li_after, li_gone))
        .orderBy("tbl")
    )


# ---------------------------------------------------------------------------
# Column-masking / row-filter policy view
# ---------------------------------------------------------------------------

_MASK_ORACLE = """
SELECT c_custkey,
       CONCAT(SUBSTR(c_name, 1, 9), '***') AS name_masked,
       r.r_name AS geo_coarse,
       SUBSTR(SHA256(CAST(c_custkey AS VARCHAR)), 1, 16) AS stable_token,
       CASE WHEN c_acctbal < 0 THEN 'negative'
            WHEN c_acctbal < 5000 THEN 'low'
            ELSE 'high' END AS balance_band,
       c_mktsegment
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
ORDER BY c_custkey
"""


@register(
    "s_column_masking_view",
    oracle=_MASK_ORACLE,
    tags=("P6", "F1", "F7", "P4"),
)
def s_column_masking_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row/column-level security as a policy view: analysts get a
    masked projection — name truncated to its constant prefix,
    location coarsened from nation to region (generalization, the
    k-anonymity move, via two broadcast joins against the 25/5-row
    dims), a STABLE pseudonymous join token (sha2 of the key,
    truncated; the same customer tokenizes identically across
    datasets, so joins still work without exposing the key space),
    account balance coarsened to bands — plus a row filter restricting
    to permitted market segments. The policy is projection + filter +
    broadcast-dim lookups: the filter pushes down to the scan,
    unmasked columns are pruned out of ReadSchema, and no shuffle
    exists at any scale."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            "c_custkey",
            F.concat(F.substring("c_name", 1, 9), F.lit("***")).alias(
                "name_masked"
            ),
            F.col("r_name").alias("geo_coarse"),
            F.substring(
                F.sha2(F.col("c_custkey").cast("string"), 256), 1, 16
            ).alias("stable_token"),
            F.when(F.col("c_acctbal") < 0, "negative")
            .when(F.col("c_acctbal") < 5000, "low")
            .otherwise("high")
            .alias("balance_band"),
            "c_mktsegment",
        )
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# Schema-wide constraint audit (PK uniqueness + FK referential integrity)
# ---------------------------------------------------------------------------

_CONSTRAINT_AUDIT_ORACLE = """
SELECT * FROM (
  SELECT 'pk_customer' AS constraint_name,
         CAST((SELECT COUNT(*) - COUNT(DISTINCT c_custkey) FROM customer)
              AS BIGINT) AS n_violations
  UNION ALL
  SELECT 'pk_orders',
         CAST((SELECT COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders)
              AS BIGINT)
  UNION ALL
  SELECT 'pk_part',
         CAST((SELECT COUNT(*) - COUNT(DISTINCT p_partkey) FROM part)
              AS BIGINT)
  UNION ALL
  SELECT 'pk_lineitem_composite',
         CAST((SELECT COUNT(*) - COUNT(DISTINCT l_orderkey * 100 + l_linenumber)
               FROM lineitem) AS BIGINT)
  UNION ALL
  SELECT 'fk_orders_customer',
         CAST((SELECT COUNT(*) FROM orders o
               WHERE NOT EXISTS (SELECT 1 FROM customer c
                                 WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
  UNION ALL
  SELECT 'fk_lineitem_orders',
         CAST((SELECT COUNT(*) FROM lineitem l
               WHERE NOT EXISTS (SELECT 1 FROM orders o
                                 WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT)
  UNION ALL
  SELECT 'fk_lineitem_part',
         CAST((SELECT COUNT(*) FROM lineitem l
               WHERE NOT EXISTS (SELECT 1 FROM part p
                                 WHERE p.p_partkey = l.l_partkey)) AS BIGINT)
  UNION ALL
  SELECT 'fk_customer_nation',
         CAST((SELECT COUNT(*) FROM customer c
               WHERE NOT EXISTS (SELECT 1 FROM nation n
                                 WHERE n.n_nationkey = c.c_nationkey))
              AS BIGINT)
  UNION ALL
  SELECT 'fk_supplier_nation',
         CAST((SELECT COUNT(*) FROM supplier s
               WHERE NOT EXISTS (SELECT 1 FROM nation n
                                 WHERE n.n_nationkey = s.s_nationkey))
              AS BIGINT)
  UNION ALL
  SELECT 'fk_nation_region',
         CAST((SELECT COUNT(*) FROM nation n
               WHERE NOT EXISTS (SELECT 1 FROM region r
                                 WHERE r.r_regionkey = n.n_regionkey))
              AS BIGINT)
) ORDER BY constraint_name
"""


@register(
    "s_constraint_audit_all_tables",
    oracle=_CONSTRAINT_AUDIT_ORACLE,
    tags=("A3", "J5", "A2", "S1"),
)
def s_constraint_audit_all_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Warehouse-wide constraint audit, dbt-test style: primary-key
    uniqueness on every dimension/fact key (including lineitem's
    composite key) and referential integrity along every foreign-key
    edge of the schema graph — ten constraints, one violation count
    each, in a single report. This is the nightly data-contract gate
    that pages before a broken upstream load reaches consumers;
    `s_expectations_check` samples one table deeply, this sweeps the
    whole schema's join spine.

    Scale design — each PK check is one combinable count-distinct;
    each FK check is a LEFT ANTI join (never EXISTS-per-row) whose
    build side is the referenced key set; at 100 TB the anti joins on
    shared keys reuse the same shuffle partitioning. The ten counts
    union into a 10-row report — the audit's cost is one pass per
    constraint regardless of table count."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")

    def pk(name: str, df: DataFrame, key) -> DataFrame:
        return df.agg(
            F.lit(name).alias("constraint_name"),
            (F.count(F.lit(1)) - F.count_distinct(key)).alias("n_violations"),
        )

    def fk(name: str, child: DataFrame, ck: str, parent: DataFrame, pk_: str) -> DataFrame:
        return (
            child.join(parent.select(pk_), child[ck] == parent[pk_], "left_anti")
            .agg(F.count(F.lit(1)).alias("n_violations"))
            .select(F.lit(name).alias("constraint_name"), "n_violations")
        )

    checks = [
        pk("pk_customer", c, F.col("c_custkey")),
        pk("pk_orders", o, F.col("o_orderkey")),
        pk("pk_part", p, F.col("p_partkey")),
        pk(
            "pk_lineitem_composite",
            li,
            F.col("l_orderkey") * 100 + F.col("l_linenumber"),
        ),
        fk("fk_orders_customer", o, "o_custkey", c, "c_custkey"),
        fk("fk_lineitem_orders", li, "l_orderkey", o, "o_orderkey"),
        fk("fk_lineitem_part", li, "l_partkey", p, "p_partkey"),
        fk("fk_customer_nation", c, "c_nationkey", n, "n_nationkey"),
        fk("fk_supplier_nation", s, "s_nationkey", n, "n_nationkey"),
        fk("fk_nation_region", n, "n_regionkey", r, "r_regionkey"),
    ]
    out = checks[0]
    for df in checks[1:]:
        out = out.unionAll(df)
    return out.orderBy("constraint_name")


# ---------------------------------------------------------------------------
# Crypto-shredding: GDPR erasure by key deletion, data files untouched
# ---------------------------------------------------------------------------

@register("s_crypto_shredding", oracle=None, tags=("F7", "J3", "A1", "P5"))
def s_crypto_shredding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crypto-shredding: every user's PII column is encrypted with a
    PER-USER key held in a separate key table; GDPR erasure deletes the
    KEY ROW, never the data file — the only erasure mechanism that
    works on immutable/archived storage, and the reason column vaults
    keep the key table tiny and separately governed. Here users
    ≡ 0 mod 7 are 'forgotten': after the key-table anti-delete, their
    rows decrypt to NULL while every retained user round-trips
    losslessly.

    Rows-only (AES-GCM ciphertext is nondeterministic by design); the
    per-segment report self-validates: `shredded_unreadable_ok` pins
    that NO forgotten row decrypted; `retained_readable_ok` pins that
    EVERY retained row decrypted to its original name. Scale — key
    derivation and encryption are map-side JVM expressions; the key
    table joins by user id (broadcast at dim scale); erasure cost is
    O(forgotten keys), not O(data)."""
    c = load_table(spark, sf_dir, "customer")
    # Per-user AES-128 key derived deterministically for the fixture:
    # 16 hex chars of the keyed hash of the user id.
    key_tbl = c.select(
        "c_custkey",
        F.substring(F.sha2(F.concat(F.lit("k:"), F.col("c_custkey")), 256), 1, 16)
        .alias("user_key"),
    )
    vault = c.join(key_tbl, "c_custkey").select(
        "c_custkey",
        "c_mktsegment",
        F.aes_encrypt(F.col("c_name").cast("binary"), F.col("user_key")).alias(
            "name_ct"
        ),
        F.col("c_name").alias("orig_name"),
    )
    surviving_keys = key_tbl.filter(F.col("c_custkey") % 7 != 0)
    joined = vault.join(F.broadcast(surviving_keys), "c_custkey", "left")
    decrypted = joined.select(
        "c_custkey",
        "c_mktsegment",
        "orig_name",
        (F.col("c_custkey") % 7 == 0).alias("shredded"),
        F.when(
            F.col("user_key").isNotNull(),
            F.aes_decrypt(F.col("name_ct"), F.col("user_key")).cast("string"),
        ).alias("recovered"),
    )
    return (
        decrypted.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum(F.when(F.col("shredded"), 1).otherwise(0)).alias("n_shredded"),
            F.sum(
                F.when(F.col("shredded") & F.col("recovered").isNotNull(), 1)
                .otherwise(0)
            ).alias("n_shredded_readable"),
            F.sum(
                F.when(
                    ~F.col("shredded")
                    & (F.col("recovered") == F.col("orig_name")),
                    1,
                ).otherwise(0)
            ).alias("n_retained_roundtrip"),
        )
        .select(
            "c_mktsegment",
            "n_users",
            "n_shredded",
            (F.col("n_shredded_readable") == 0).alias("shredded_unreadable_ok"),
            (
                F.col("n_retained_roundtrip")
                == F.col("n_users") - F.col("n_shredded")
            ).alias("retained_readable_ok"),
        )
        .orderBy("c_mktsegment")
    )
