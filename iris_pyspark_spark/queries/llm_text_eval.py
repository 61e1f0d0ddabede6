"""Corpus evaluation & distribution statistics (split from llm_text.py,
round 5): chat-format and preference audits, langid confusion, filter
ablation, slice metrics, Zipf/JSD/self-BLEU/Chao1 distribution laws,
truncation and collision sweeps, MoE balance proxy, BPE training.

Same determinism and scale discipline as llm_text.py: integer/exact
sufficient statistics first, one float formula per output row, banded
or vocabulary-cut joins only — never all-pairs (self-BLEU uses the
per-ngram sum decomposition instead of the m^2 pair join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from ..operators.text import (
    LANG_MARKERS,
    predicted_lang,
    quality_score,
    token_count_bpe_ish,
    token_count_whitespace,
    tokens,
)
from ..registry import register

from .llm_text import _langid_oracle
# ---------------------------------------------------------------------------
# Language-ID confusion matrix with per-class precision/recall/F1
# ---------------------------------------------------------------------------

def _langid_confusion_oracle() -> str:
    inner = _langid_oracle().strip()
    return f"""
WITH pred AS ({inner}),
cells AS (
  SELECT lang AS true_lang, pred_lang,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM pred GROUP BY lang, pred_lang
),
row_tot AS (
  SELECT true_lang, CAST(SUM(n) AS BIGINT) AS n_true
  FROM cells GROUP BY true_lang
),
col_tot AS (
  SELECT pred_lang, CAST(SUM(n) AS BIGINT) AS n_pred
  FROM cells GROUP BY pred_lang
),
diag AS (
  SELECT true_lang AS lang, n AS tp FROM cells WHERE true_lang = pred_lang
)
SELECT r.true_lang AS lang,
       r.n_true,
       CAST(COALESCE(c.n_pred, 0) AS BIGINT) AS n_pred,
       CAST(COALESCE(d.tp, 0) AS BIGINT) AS tp,
       CASE WHEN COALESCE(c.n_pred, 0) = 0 THEN 0
            ELSE COALESCE(d.tp, 0) * 1000000 // c.n_pred END AS precision_ppm,
       COALESCE(d.tp, 0) * 1000000 // r.n_true AS recall_ppm,
       CASE WHEN COALESCE(d.tp, 0) = 0 THEN 0
            ELSE 2 * COALESCE(d.tp, 0) * 1000000
                 // (r.n_true + COALESCE(c.n_pred, 0)) END AS f1_ppm
FROM row_tot r
LEFT JOIN col_tot c ON r.true_lang = c.pred_lang
LEFT JOIN diag d ON r.true_lang = d.lang
ORDER BY r.true_lang
"""


@register(
    "n_langid_confusion_matrix",
    oracle=_langid_confusion_oracle(),
    tags=("N5", "A1", "J3"),
)
def n_langid_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language precision/recall/F1 of the marker-lexicon language
    identifier against the corpus's declared labels — the evaluation
    matrix that turns `n_langid`'s per-document predictions into a
    deployable/not-deployable decision per language (a 95% English
    recall means nothing if Spanish recall is 40% and Spanish docs get
    dropped from the corpus). F1 uses the 2·tp/(|true|+|pred|)
    identity so every metric is positive integer ppm floor division.

    Scale design — predictions are row-local (marker counting); the
    confusion matrix is one combinable (true, pred) rollup bounded by
    |langs|²; marginals re-aggregate the CELLS, never the corpus."""
    d = load_table(spark, sf_dir, "documents")
    pred = d.select(
        F.col("lang").alias("true_lang"),
        predicted_lang(tokens("text")).alias("pred_lang"),
    )
    cells = pred.groupBy("true_lang", "pred_lang").agg(
        F.count(F.lit(1)).alias("n")
    )
    row_tot = cells.groupBy("true_lang").agg(F.sum("n").alias("n_true"))
    col_tot = cells.groupBy("pred_lang").agg(F.sum("n").alias("n_pred"))
    diag = cells.filter(F.col("true_lang") == F.col("pred_lang")).select(
        F.col("true_lang").alias("lang"), F.col("n").alias("tp")
    )
    return (
        row_tot.join(
            col_tot, row_tot.true_lang == col_tot.pred_lang, "left"
        )
        .join(diag, row_tot.true_lang == diag.lang, "left")
        .select(
            F.col("true_lang").alias("lang"),
            "n_true",
            F.coalesce(F.col("n_pred"), F.lit(0)).cast("long").alias("n_pred"),
            F.coalesce(F.col("tp"), F.lit(0)).cast("long").alias("tp"),
            F.expr(
                "CASE WHEN COALESCE(n_pred, 0) = 0 THEN 0"
                " ELSE COALESCE(tp, 0) * 1000000 DIV n_pred END"
            ).alias("precision_ppm"),
            F.expr("COALESCE(tp, 0) * 1000000 DIV n_true").alias("recall_ppm"),
            F.expr(
                "CASE WHEN COALESCE(tp, 0) = 0 THEN 0"
                " ELSE 2 * COALESCE(tp, 0) * 1000000"
                " DIV (n_true + COALESCE(n_pred, 0)) END"
            ).alias("f1_ppm"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Preference-pair transitivity audit (Condorcet cycles in pairwise labels)
# ---------------------------------------------------------------------------

_PREF_CYCLE_ORACLE = """
WITH items AS (
  SELECT doc_id, n_chars FROM documents WHERE doc_id % 29 = 0
),
prefs AS (
  -- a beats b iff longer, with a deterministic 10% label-noise flip:
  -- exactly how real preference datasets acquire inconsistencies.
  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         CASE WHEN (a.n_chars > b.n_chars
                    OR (a.n_chars = b.n_chars AND a.doc_id < b.doc_id))
                   <> ((a.doc_id * 31 + b.doc_id * 17) % 10 = 0)
              THEN 1 ELSE 0 END AS a_wins
  FROM items a JOIN items b ON a.doc_id < b.doc_id
),
triads AS (
  SELECT ab.a_wins AS r_ab, bc.a_wins AS r_bc, ac.a_wins AS r_ac
  FROM prefs ab
  JOIN prefs bc ON ab.b_id = bc.a_id
  JOIN prefs ac ON ab.a_id = ac.a_id AND bc.b_id = ac.b_id
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM items) AS n_items,
       CAST(COUNT(*) AS BIGINT) AS n_triads,
       CAST(SUM(CASE WHEN (r_ab = 1 AND r_bc = 1 AND r_ac = 0)
                       OR (r_ab = 0 AND r_bc = 0 AND r_ac = 1)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_cycles,
       CAST(SUM(CASE WHEN (r_ab = 1 AND r_bc = 1 AND r_ac = 0)
                       OR (r_ab = 0 AND r_bc = 0 AND r_ac = 1)
                     THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT)
         AS cycle_ppm
FROM triads
"""


@register(
    "n_preference_cycle_audit",
    oracle=_PREF_CYCLE_ORACLE,
    tags=("J10", "J9", "A7", "N5"),
)
def n_preference_cycle_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitivity audit of a pairwise-preference dataset: count
    Condorcet cycles (A≻B≻C≻A) among all labeled triads — the
    consistency check run before fitting a Bradley-Terry/RLHF reward
    model, because cyclic preferences put a hard ceiling on any scalar
    reward's agreement rate. Preferences derive from a length prior
    with a deterministic 10% hash-flip noise, so cycles genuinely
    occur and the cycle rate is reproducible.

    Scale design — the audit runs on a SAMPLED item set (doc_id % 29:
    bounded regardless of corpus size — cycle RATE estimation needs a
    sample, not the full O(n³) triad space); pair labels are one
    bounded theta self-join, triads close over two more equi-joins on
    the pair table. All counts exact integers, rate in ppm."""
    d = load_table(spark, sf_dir, "documents")
    items = d.filter(F.col("doc_id") % 29 == 0).select("doc_id", "n_chars")
    a, b = items.alias("a"), items.alias("b")
    better = (F.col("a.n_chars") > F.col("b.n_chars")) | (
        (F.col("a.n_chars") == F.col("b.n_chars"))
        & (F.col("a.doc_id") < F.col("b.doc_id"))
    )
    flip = (F.col("a.doc_id") * 31 + F.col("b.doc_id") * 17) % 10 == 0
    prefs = a.join(b, F.col("a.doc_id") < F.col("b.doc_id")).select(
        F.col("a.doc_id").alias("a_id"),
        F.col("b.doc_id").alias("b_id"),
        F.when(better != flip, 1).otherwise(0).alias("a_wins"),
    )
    ab, bc, ac = prefs.alias("ab"), prefs.alias("bc"), prefs.alias("ac")
    triads = (
        ab.join(bc, F.col("ab.b_id") == F.col("bc.a_id"))
        .join(
            ac,
            (F.col("ab.a_id") == F.col("ac.a_id"))
            & (F.col("bc.b_id") == F.col("ac.b_id")),
        )
        .select(
            F.col("ab.a_wins").alias("r_ab"),
            F.col("bc.a_wins").alias("r_bc"),
            F.col("ac.a_wins").alias("r_ac"),
        )
    )
    cyc = (
        (F.col("r_ab") == 1) & (F.col("r_bc") == 1) & (F.col("r_ac") == 0)
    ) | ((F.col("r_ab") == 0) & (F.col("r_bc") == 0) & (F.col("r_ac") == 1))
    n_items = items.agg(F.count(F.lit(1)).alias("n_items"))
    return (
        triads.agg(
            F.count(F.lit(1)).alias("n_triads"),
            F.sum(F.when(cyc, 1).otherwise(0)).alias("n_cycles"),
            F.expr(
                "SUM(CASE WHEN (r_ab = 1 AND r_bc = 1 AND r_ac = 0)"
                " OR (r_ab = 0 AND r_bc = 0 AND r_ac = 1)"
                " THEN 1 ELSE 0 END) * 1000000 DIV COUNT(*)"
            ).alias("cycle_ppm"),
        )
        .crossJoin(F.broadcast(n_items))
        .select("n_items", "n_triads", "n_cycles", "cycle_ppm")
    )


# ---------------------------------------------------------------------------
# Quality-filter ablation matrix (solo kills, unique kills, overlap)
# ---------------------------------------------------------------------------

_ABLATION_ORACLE = """
WITH feats AS (
  SELECT doc_id,
         LEN(STRING_SPLIT(LOWER(text), ' ')) AS n_tok,
         LENGTH(text) AS n_char,
         LENGTH(REPLACE(text, ' ', '')) AS n_nonspace,
         LEN(LIST_DISTINCT(STRING_SPLIT(LOWER(text), ' '))) AS n_uniq
  FROM documents
),
flags AS (
  SELECT doc_id,
         CASE WHEN n_tok < 40 THEN 1 ELSE 0 END AS f_too_short,
         CASE WHEN n_char - n_nonspace < n_tok - 1 THEN 1 ELSE 0 END
           AS f_spacing_anomaly,
         CASE WHEN n_uniq * 1000 // n_tok < 450 THEN 1 ELSE 0 END
           AS f_repetitive,
         CASE WHEN n_char * 10 // n_tok > 90 THEN 1 ELSE 0 END
           AS f_long_tokens
  FROM feats
)
SELECT
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(f_too_short) AS BIGINT)        AS k_too_short,
  CAST(SUM(f_spacing_anomaly) AS BIGINT)  AS k_spacing,
  CAST(SUM(f_repetitive) AS BIGINT)       AS k_repetitive,
  CAST(SUM(f_long_tokens) AS BIGINT)      AS k_long_tokens,
  CAST(SUM(CASE WHEN f_too_short = 1 AND f_spacing_anomaly = 0
                 AND f_repetitive = 0 AND f_long_tokens = 0
                THEN 1 ELSE 0 END) AS BIGINT) AS u_too_short,
  CAST(SUM(CASE WHEN f_repetitive = 1 AND f_too_short = 0
                 AND f_spacing_anomaly = 0 AND f_long_tokens = 0
                THEN 1 ELSE 0 END) AS BIGINT) AS u_repetitive,
  CAST(SUM(CASE WHEN f_too_short + f_spacing_anomaly + f_repetitive
                     + f_long_tokens >= 1 THEN 1 ELSE 0 END) AS BIGINT)
    AS k_any,
  CAST(SUM(f_too_short * f_repetitive) AS BIGINT) AS both_short_repetitive,
  CAST(SUM(f_too_short * f_long_tokens) AS BIGINT) AS both_short_longtok
FROM flags
"""


@register(
    "n_filter_ablation_matrix",
    oracle=_ABLATION_ORACLE,
    tags=("N5", "A7", "A2"),
)
def n_filter_ablation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ablation accounting for a four-heuristic quality-filter stack
    (too-short, spacing anomaly, repetition, overlong tokens): each
    filter's total kills, its UNIQUE kills (docs no other filter
    catches — the only number that justifies keeping a filter), the
    union kill count, and the biggest pairwise overlaps. This is the
    analysis that turns a filter pile into a filter PORTFOLIO —
    `n_quality_gopher_filters` applies the stack; this measures which
    parts of it earn their false-positive budget.

    Determinism & scale — every filter is a row-local integer
    predicate (ratios as positive floor divisions in milli-units);
    the whole matrix is ONE combinable conditional-aggregate pass,
    no joins, no second scan."""
    d = load_table(spark, sf_dir, "documents")
    feats = d.select(
        F.size(F.split(F.lower(F.col("text")), " ")).alias("n_tok"),
        F.length("text").alias("n_char"),
        F.length(F.regexp_replace(F.col("text"), " ", "")).alias("n_nonspace"),
        F.size(F.array_distinct(F.split(F.lower(F.col("text")), " "))).alias(
            "n_uniq"
        ),
    )
    flags = feats.select(
        F.when(F.col("n_tok") < 40, 1).otherwise(0).alias("f_too_short"),
        F.when(
            F.col("n_char") - F.col("n_nonspace") < F.col("n_tok") - 1, 1
        ).otherwise(0).alias("f_spacing_anomaly"),
        F.when(F.expr("n_uniq * 1000 DIV n_tok") < 450, 1)
        .otherwise(0)
        .alias("f_repetitive"),
        F.when(F.expr("n_char * 10 DIV n_tok") > 90, 1)
        .otherwise(0)
        .alias("f_long_tokens"),
    )
    return flags.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("f_too_short").alias("k_too_short"),
        F.sum("f_spacing_anomaly").alias("k_spacing"),
        F.sum("f_repetitive").alias("k_repetitive"),
        F.sum("f_long_tokens").alias("k_long_tokens"),
        F.sum(
            F.when(
                (F.col("f_too_short") == 1)
                & (F.col("f_spacing_anomaly") == 0)
                & (F.col("f_repetitive") == 0)
                & (F.col("f_long_tokens") == 0),
                1,
            ).otherwise(0)
        ).alias("u_too_short"),
        F.sum(
            F.when(
                (F.col("f_repetitive") == 1)
                & (F.col("f_too_short") == 0)
                & (F.col("f_spacing_anomaly") == 0)
                & (F.col("f_long_tokens") == 0),
                1,
            ).otherwise(0)
        ).alias("u_repetitive"),
        F.sum(
            F.when(
                F.col("f_too_short")
                + F.col("f_spacing_anomaly")
                + F.col("f_repetitive")
                + F.col("f_long_tokens")
                >= 1,
                1,
            ).otherwise(0)
        ).alias("k_any"),
        F.sum(F.col("f_too_short") * F.col("f_repetitive")).alias(
            "both_short_repetitive"
        ),
        F.sum(F.col("f_too_short") * F.col("f_long_tokens")).alias(
            "both_short_longtok"
        ),
    )


# ---------------------------------------------------------------------------
# Search-result diversification: per-source cap on the BM25 top-k
# ---------------------------------------------------------------------------

_DIVERSITY_ORACLE = """
WITH scored AS (
  SELECT doc_id, source,
         -- deterministic relevance proxy: clamped length score with an
         -- id tie-break (stands in for the BM25 arm, whose scores are
         -- proven separately by n_bm25_retrieval)
         LEAST(n_chars, 2000) AS score
  FROM documents
),
ranked AS (
  SELECT doc_id, source, score,
         ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS global_rank,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY score DESC, doc_id) AS within_source
  FROM scored
),
diversified AS (
  SELECT doc_id, source, score, global_rank, within_source,
         ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS final_rank
  FROM ranked WHERE within_source <= 2
)
SELECT final_rank, doc_id, source, CAST(score AS BIGINT) AS score,
       CAST(global_rank AS BIGINT) AS undiversified_rank,
       CAST(within_source AS BIGINT) AS slot_within_source
FROM diversified
WHERE final_rank <= 20
ORDER BY final_rank
"""


@register(
    "n_search_diversity_cap",
    oracle=_DIVERSITY_ORACLE,
    tags=("W4", "W1", "O2", "N5"),
)
def n_search_diversity_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Search-result diversification: the relevance-ranked list
    re-ranked under a max-2-per-source cap before taking the top-20 —
    the post-retrieval constraint every search/RAG stack applies so
    one crawl domain can't monopolize the context window. Each row
    keeps its undiversified rank, so the delta between the two
    rankings IS the crowding that the cap removed.

    Determinism & scale — both rankings are total orders with
    (score desc, id) tie-breaks; the cap is a per-source row_number
    filter (WindowGroupLimit-eligible: the per-source window prunes to
    2 rows map-side BEFORE the global re-rank), and only the capped
    survivors reach the final top-20 sort."""
    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        "source",
        F.least(F.col("n_chars"), F.lit(2000)).alias("score"),
    )
    order = (F.col("score").desc(), F.col("doc_id"))
    ranked = scored.select(
        "doc_id",
        "source",
        "score",
        F.row_number().over(Window.orderBy(*order)).alias("global_rank"),
        F.row_number()
        .over(Window.partitionBy("source").orderBy(*order))
        .alias("within_source"),
    )
    return (
        ranked.filter(F.col("within_source") <= 2)
        .withColumn(
            "final_rank", F.row_number().over(Window.orderBy(*order))
        )
        .filter(F.col("final_rank") <= 20)
        .select(
            "final_rank",
            "doc_id",
            "source",
            F.col("score").cast("long").alias("score"),
            F.col("global_rank").cast("long").alias("undiversified_rank"),
            F.col("within_source").cast("long").alias("slot_within_source"),
        )
        .orderBy("final_rank")
    )


# ---------------------------------------------------------------------------
# Slice-based evaluation: classifier accuracy per (lang, length-band) slice
# ---------------------------------------------------------------------------

_SLICE_EVAL_ORACLE = """
WITH scored AS (
  SELECT lang,
         CASE WHEN n_chars < 500 THEN 'short'
              WHEN n_chars < 1200 THEN 'medium'
              ELSE 'long' END AS len_band,
         CASE WHEN n_chars >= 700 THEN 1 ELSE 0 END AS pred,
         CASE WHEN LEN(STRING_SPLIT(text, ' ')) >= 110 THEN 1 ELSE 0 END
           AS label
  FROM documents
),
slices AS (
  SELECT lang, len_band,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN pred = label THEN 1 ELSE 0 END) AS BIGINT)
           AS n_correct,
         CAST(SUM(label) AS BIGINT) AS n_pos
  FROM scored GROUP BY lang, len_band
),
overall AS (
  SELECT CAST(SUM(n_correct) AS BIGINT) * 1000000
           // CAST(SUM(n) AS BIGINT) AS overall_acc_ppm,
         CAST(MIN(n_correct * 1000000 // n) AS BIGINT) AS worst_acc_ppm
  FROM slices
)
SELECT lang, len_band, n, n_pos,
       n_correct * 1000000 // n AS acc_ppm,
       overall_acc_ppm,
       (n_correct * 1000000 // n) = worst_acc_ppm AS is_worst_slice,
       (n_correct * 1000000 // n) + 100000 < overall_acc_ppm
         AS lags_overall_by_10pts
FROM slices CROSS JOIN overall
ORDER BY lang, len_band
"""


@register(
    "n_slice_eval_metrics",
    oracle=_SLICE_EVAL_ORACLE,
    tags=("N5", "A1", "A7", "P6"),
)
def n_slice_eval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slice-based model evaluation: the quality classifier's accuracy
    on every (language × length-band) slice, each row also carrying the
    overall accuracy, a worst-slice marker, and a lags-by-10-points
    flag — the Robustness-Gym-style report that catches a model whose
    aggregate accuracy hides a collapsed slice (aggregate 85%, Spanish
    short-docs 40% → the aggregate is a lie for that traffic). Ships
    with `n_langid_confusion_matrix` and `n_calibration_ece` as the
    three-view eval battery: per-class, calibration, per-slice.

    Determinism & scale — predictions and labels are row-local integer
    predicates; one combinable (lang, band) rollup; overall and worst
    re-aggregate the |slices| rows; every rate is positive integer ppm
    floor division."""
    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        "lang",
        F.when(F.col("n_chars") < 500, "short")
        .when(F.col("n_chars") < 1200, "medium")
        .otherwise("long")
        .alias("len_band"),
        F.when(F.col("n_chars") >= 700, 1).otherwise(0).alias("pred"),
        F.when(F.size(F.split(F.col("text"), " ")) >= 110, 1)
        .otherwise(0)
        .alias("label"),
    )
    slices = scored.groupBy("lang", "len_band").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("pred") == F.col("label"), 1).otherwise(0)).alias(
            "n_correct"
        ),
        F.sum("label").cast("long").alias("n_pos"),
    )
    overall = slices.agg(
        F.expr("SUM(n_correct) * 1000000 DIV SUM(n)").alias("overall_acc_ppm"),
        F.min(F.expr("n_correct * 1000000 DIV n")).cast("long").alias(
            "worst_acc_ppm"
        ),
    )
    return (
        slices.crossJoin(F.broadcast(overall))
        .select(
            "lang",
            "len_band",
            "n",
            "n_pos",
            F.expr("n_correct * 1000000 DIV n").alias("acc_ppm"),
            "overall_acc_ppm",
            (F.expr("n_correct * 1000000 DIV n") == F.col("worst_acc_ppm")).alias(
                "is_worst_slice"
            ),
            (
                F.expr("n_correct * 1000000 DIV n") + 100000
                < F.col("overall_acc_ppm")
            ).alias("lags_overall_by_10pts"),
        )
        .orderBy("lang", "len_band")
    )


# ---------------------------------------------------------------------------
# Zipf's law: rank-frequency slope of the term distribution
# ---------------------------------------------------------------------------

_ZIPF_ORACLE = """
WITH toks AS (
  SELECT UNNEST(STRING_SPLIT(LOWER(text), ' ')) AS term FROM documents
),
freq AS (
  SELECT term, COUNT(*) AS n_occ FROM toks GROUP BY term
),
vocab AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS vocab_size,
         CAST(MAX(n_occ) AS BIGINT) AS top_freq
  FROM freq
),
ranked AS (
  SELECT term, n_occ,
         ROW_NUMBER() OVER (ORDER BY n_occ DESC, term) AS rnk
  FROM freq
),
pts AS (
  SELECT CAST(ROUND(LN(CAST(rnk AS DOUBLE)) * 1000000) AS BIGINT) AS x_micro,
         CAST(ROUND(LN(CAST(n_occ AS DOUBLE)) * 1000000) AS BIGINT) AS y_micro
  FROM ranked WHERE rnk <= 200
),
stats AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(x_micro) AS BIGINT) AS sx,
         CAST(SUM(y_micro) AS BIGINT) AS sy,
         CAST(SUM(x_micro * y_micro) AS HUGEINT) AS sxy,
         CAST(SUM(x_micro * x_micro) AS HUGEINT) AS sxx
  FROM pts
)
SELECT s.n AS n_points,
       v.vocab_size,
       v.top_freq,
       ROUND((s.n * s.sxy - s.sx * s.sy)
             / CAST(s.n * s.sxx - s.sx * s.sx AS DOUBLE), 6) AS zipf_slope
FROM stats s CROSS JOIN vocab v
"""


@register(
    "n_zipf_law_fit",
    oracle=_ZIPF_ORACLE,
    tags=("N5", "A1", "W1", "O2", "F3"),
)
def n_zipf_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's law fit: OLS slope of ln(frequency) on ln(rank) over the
    top-200 terms — the rank-frequency exponent (~-1 for natural text)
    that sanity-checks a crawl's token distribution (a slope far from
    -1 flags boilerplate or spam domination) and is the companion
    diagnostic to Heaps' law (`n_heaps_law_fit`).

    Scale design: term frequencies are ONE combinable groupBy (map-side
    partial counts); the top-200 selection is a distributed
    TakeOrderedAndProject with a total-order tie-break (freq desc,
    term), NEVER a global sort; ranking and the OLS run on the 200-row
    result. Log leaves are micro-nat rounded BIGINTs so the sufficient
    statistics are exact integers — partition layout cannot move a bit
    (the Heaps/retention-fit convention)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("term")
    )
    freq = toks.groupBy("term").agg(F.count(F.lit(1)).alias("n_occ"))
    vocab = freq.agg(
        F.count(F.lit(1)).alias("vocab_size"),
        F.max("n_occ").alias("top_freq"),
    )
    top = freq.orderBy(F.col("n_occ").desc(), "term").limit(200)
    ranked = top.withColumn(
        "rnk",
        F.row_number().over(Window.orderBy(F.col("n_occ").desc(), "term")),
    )
    pts = ranked.select(
        F.round(F.log(F.col("rnk").cast("double")) * 1000000)
        .cast("long")
        .alias("x_micro"),
        F.round(F.log(F.col("n_occ").cast("double")) * 1000000)
        .cast("long")
        .alias("y_micro"),
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
    num = nd * F.col("sxy") - (F.col("sx").cast("decimal(38,0)") * F.col("sy"))
    den = nd * F.col("sxx") - (F.col("sx").cast("decimal(38,0)") * F.col("sx"))
    return stats.crossJoin(F.broadcast(vocab)).select(
        F.col("n").alias("n_points"),
        "vocab_size",
        "top_freq",
        F.round(num.cast("double") / den.cast("double"), 6).alias(
            "zipf_slope"
        ),
    )


# ---------------------------------------------------------------------------
# Jensen-Shannon divergence between per-source unigram distributions
# ---------------------------------------------------------------------------

_JSD_ORACLE = """
WITH toks AS (
  SELECT source, UNNEST(STRING_SPLIT(LOWER(text), ' ')) AS term
  FROM documents
),
term_counts AS (
  SELECT source, term, COUNT(*) AS c FROM toks GROUP BY source, term
),
top_terms AS (
  SELECT term FROM (
    SELECT term, SUM(c) AS tot FROM term_counts GROUP BY term
    ORDER BY tot DESC, term LIMIT 300
  )
),
counts AS (
  SELECT tc.source, tc.term, tc.c
  FROM term_counts tc JOIN top_terms USING (term)
),
totals AS (SELECT source, CAST(SUM(c) AS BIGINT) AS tot FROM counts GROUP BY source),
grid AS (
  SELECT s.source, t.term
  FROM (SELECT DISTINCT source FROM documents) s CROSS JOIN top_terms t
),
filled AS (
  SELECT g.source, g.term, CAST(COALESCE(c.c, 0) AS BIGINT) AS c
  FROM grid g LEFT JOIN counts c ON g.source = c.source AND g.term = c.term
),
pairs AS (
  SELECT a.term, a.source AS source_a, b.source AS source_b,
         a.c AS ca, b.c AS cb, ta.tot AS ta, tb.tot AS tb
  FROM filled a
  JOIN filled b ON a.term = b.term AND a.source < b.source
  JOIN totals ta ON a.source = ta.source
  JOIN totals tb ON b.source = tb.source
),
contrib AS (
  SELECT source_a, source_b,
         CASE WHEN ca = 0 THEN 0 ELSE
           CAST(ROUND((CAST(ca AS DOUBLE) / ta)
                * LN(2.0 * ca * tb / (ca * tb + cb * ta))
                * 1000000000) AS BIGINT) END AS kp_nano,
         CASE WHEN cb = 0 THEN 0 ELSE
           CAST(ROUND((CAST(cb AS DOUBLE) / tb)
                * LN(2.0 * cb * ta / (cb * ta + ca * tb))
                * 1000000000) AS BIGINT) END AS kq_nano
  FROM pairs
)
SELECT source_a, source_b,
       CAST(COUNT(*) AS BIGINT) AS n_terms,
       CAST(SUM(kp_nano) AS BIGINT) AS kl_p_m_nano,
       CAST(SUM(kq_nano) AS BIGINT) AS kl_q_m_nano,
       ROUND((SUM(kp_nano) + SUM(kq_nano)) / 2.0 / 1000000000, 6) AS jsd_nats
FROM contrib
GROUP BY source_a, source_b
ORDER BY source_a, source_b
"""


@register(
    "n_js_divergence_sources",
    oracle=_JSD_ORACLE,
    tags=("N5", "A1", "J1", "J9", "P5"),
)
def n_js_divergence_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence between every pair of per-source
    unigram distributions over a shared top-300 vocabulary — the
    standard domain-shift / mixture-distance metric a pretraining
    curator reads before setting domain mix weights (JSD is symmetric,
    bounded by ln 2, and defined even where one side has zero mass).

    Scale design: (1) per-(source, term) counts are ONE combinable
    groupBy over the token explode; (2) the vocabulary is capped to the
    top-300 global terms BEFORE any pair fan-out (the apriori posture —
    the join fan-out is |sources|² per term, a data-model constant,
    never vocabulary-sized); (3) the sources × vocab grid is a cross of
    two tiny dims so zero counts are explicit rows and the KL terms
    stay total; (4) each term's KL contribution is nano-nat rounded to
    an exact BIGINT at the leaf, making the final sums bit-stable
    across partition layouts and engines."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source",
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("term"),
    )
    term_counts = toks.groupBy("source", "term").agg(
        F.count(F.lit(1)).alias("c")
    )
    top_terms = (
        term_counts.groupBy("term")
        .agg(F.sum("c").alias("tot"))
        .orderBy(F.col("tot").desc(), "term")
        .limit(300)
        .select("term")
    )
    counts = term_counts.join(F.broadcast(top_terms), "term")
    totals = counts.groupBy("source").agg(
        F.sum("c").cast("long").alias("tot")
    )
    sources = docs.select("source").distinct()
    grid = sources.crossJoin(F.broadcast(top_terms))
    filled = (
        grid.join(counts, ["source", "term"], "left")
        .select(
            "source",
            "term",
            F.coalesce(F.col("c"), F.lit(0)).cast("long").alias("c"),
        )
    )
    a = filled.select(
        F.col("term").alias("term"),
        F.col("source").alias("source_a"),
        F.col("c").alias("ca"),
    )
    b = filled.select(
        F.col("term").alias("term"),
        F.col("source").alias("source_b"),
        F.col("c").alias("cb"),
    )
    ta = totals.select(
        F.col("source").alias("source_a"), F.col("tot").alias("ta")
    )
    tb = totals.select(
        F.col("source").alias("source_b"), F.col("tot").alias("tb")
    )
    pairs = (
        a.join(b, "term")
        .filter(F.col("source_a") < F.col("source_b"))
        .join(F.broadcast(ta), "source_a")
        .join(F.broadcast(tb), "source_b")
    )
    contrib = pairs.select(
        "source_a",
        "source_b",
        # NOTE: the `2.0D` double literal is load-bearing — a bare `2.0`
        # parses as DECIMAL(2,1) in Spark SQL and drags the whole ratio
        # into decimal arithmetic (scale-truncated ≈1e-7), silently
        # diverging from DuckDB's double evaluation of the same text.
        F.expr(
            "CASE WHEN ca = 0 THEN 0 ELSE "
            "CAST(ROUND((CAST(ca AS DOUBLE) / ta) "
            "* LN(2.0D * ca * tb / (ca * tb + cb * ta)) "
            "* 1000000000) AS BIGINT) END"
        ).alias("kp_nano"),
        F.expr(
            "CASE WHEN cb = 0 THEN 0 ELSE "
            "CAST(ROUND((CAST(cb AS DOUBLE) / tb) "
            "* LN(2.0D * cb * ta / (cb * ta + ca * tb)) "
            "* 1000000000) AS BIGINT) END"
        ).alias("kq_nano"),
    )
    return (
        contrib.groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.sum("kp_nano").cast("long").alias("kl_p_m_nano"),
            F.sum("kq_nano").cast("long").alias("kl_q_m_nano"),
            F.round(
                (F.sum("kp_nano") + F.sum("kq_nano")) / 2.0 / 1000000000, 6
            ).alias("jsd_nats"),
        )
        .orderBy("source_a", "source_b")
    )


# ---------------------------------------------------------------------------
# Self-BLEU corpus diversity — the pairwise metric without the pair join
# ---------------------------------------------------------------------------

_SELF_BLEU_ORACLE = """
WITH sample_docs AS (
  SELECT doc_id, lang, STRING_SPLIT(LOWER(text), ' ') AS t
  FROM documents WHERE doc_id % 7 = 0
),
doc_bigrams AS (
  SELECT DISTINCT doc_id, t[i] AS w1, t[i + 1] AS w2
  FROM sample_docs, UNNEST(GENERATE_SERIES(1, LEN(t) - 1)) AS g(i)
),
df AS (
  SELECT w1, w2, COUNT(*) AS df FROM doc_bigrams GROUP BY w1, w2
),
per_doc AS (
  SELECT b.doc_id,
         CAST(COUNT(*) AS BIGINT) AS nb,
         CAST(SUM(f.df - 1) AS BIGINT) AS shared
  FROM doc_bigrams b JOIN df f ON b.w1 = f.w1 AND b.w2 = f.w2
  GROUP BY b.doc_id
),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM per_doc),
doc_scores AS (
  SELECT p.doc_id, s.lang,
         p.shared * 1000000 // ((m.m - 1) * p.nb) AS self_bleu2_ppm
  FROM per_doc p
  CROSS JOIN m
  JOIN sample_docs s ON p.doc_id = s.doc_id
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(self_bleu2_ppm) // COUNT(*) AS BIGINT)
         AS avg_self_bleu2_ppm,
       CAST(1000000 - SUM(self_bleu2_ppm) // COUNT(*) AS BIGINT)
         AS diversity_ppm
FROM doc_scores
GROUP BY lang
ORDER BY lang
"""


@register(
    "n_self_bleu_diversity",
    oracle=_SELF_BLEU_ORACLE,
    tags=("N5", "A1", "J1", "P7", "F4"),
)
def n_self_bleu_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-BLEU (bigram) corpus-diversity score per language — high
    self-BLEU means documents parrot each other (mode collapse in
    synthetic data, boilerplate in crawls); diversity = 1 − self-BLEU.

    Scale design — the restructured quadratic: self-BLEU is defined
    pairwise (each doc scored against every other), but the mean
    bigram-precision against the rest decomposes as
    Σ_{g∈doc}(df(g) − 1) / ((m−1)·|doc bigrams|) where df is the
    bigram's document frequency in the sample — so ONE combinable df
    groupBy + ONE join back replaces the m² pair join entirely (the
    same Σ(df−1) identity that makes the containment/PMI family
    scale). The deterministic doc_id % 7 sample bounds m; every score
    is exact-integer ppm floor division, bit-stable on both engines."""
    docs = load_table(spark, sf_dir, "documents")
    sample = docs.filter(F.col("doc_id") % 7 == 0).select(
        "doc_id", "lang", F.split(F.lower(F.col("text")), " ").alias("t")
    )
    doc_bigrams = (
        sample.select(
            "doc_id",
            F.explode(
                F.arrays_zip(
                    F.slice(
                        F.col("t"), 1, F.greatest(F.size("t") - 1, F.lit(0))
                    ),
                    F.slice(
                        F.col("t"), 2, F.greatest(F.size("t") - 1, F.lit(0))
                    ),
                )
            ).alias("bg"),
        )
        .select(
            "doc_id",
            F.col("bg.0").alias("w1"),
            F.col("bg.1").alias("w2"),
        )
        .dropDuplicates(["doc_id", "w1", "w2"])
    )
    df_tab = doc_bigrams.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("df")
    )
    per_doc = (
        doc_bigrams.join(df_tab, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("nb"),
            F.sum(F.col("df") - 1).cast("long").alias("shared"),
        )
    )
    m = per_doc.agg(F.count(F.lit(1)).cast("long").alias("m"))
    doc_scores = (
        per_doc.crossJoin(F.broadcast(m))
        .join(sample.select("doc_id", "lang"), "doc_id")
        .select(
            "lang",
            F.expr("shared * 1000000 DIV ((m - 1) * nb)").alias(
                "self_bleu2_ppm"
            ),
        )
    )
    return (
        doc_scores.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.expr("SUM(self_bleu2_ppm) DIV COUNT(*)").alias(
                "avg_self_bleu2_ppm"
            ),
            F.expr("1000000 - SUM(self_bleu2_ppm) DIV COUNT(*)").alias(
                "diversity_ppm"
            ),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Context-window truncation loss sweep (ctx ∈ {64, 128, 256, 512} tokens)
# ---------------------------------------------------------------------------

_TRUNC_SWEEP_ORACLE = """
WITH toks AS (
  SELECT doc_id, lang,
         CAST(LEN(STRING_SPLIT(LOWER(text), ' ')) AS BIGINT) AS n_tok
  FROM documents
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_tok) AS BIGINT) AS total_tokens
  FROM toks
),
sweep AS (
  SELECT c.ctx,
         CAST(SUM(LEAST(t.n_tok, c.ctx)) AS BIGINT) AS kept_tokens,
         CAST(SUM(CASE WHEN t.n_tok > c.ctx THEN 1 ELSE 0 END) AS BIGINT)
           AS n_truncated_docs
  FROM toks t
  CROSS JOIN (SELECT UNNEST([64, 128, 256, 512]) AS ctx) c
  GROUP BY c.ctx
)
SELECT CAST(s.ctx AS BIGINT) AS ctx_tokens,
       t.n_docs, t.total_tokens, s.kept_tokens, s.n_truncated_docs,
       CAST(s.kept_tokens * 1000000 // t.total_tokens AS BIGINT)
         AS retention_ppm,
       CAST(s.n_truncated_docs * 1000000 // t.n_docs AS BIGINT)
         AS truncated_docs_ppm
FROM sweep s CROSS JOIN tot t
ORDER BY ctx_tokens
"""


@register(
    "n_truncation_loss_sweep",
    oracle=_TRUNC_SWEEP_ORACLE,
    tags=("N5", "A1", "A7", "J9"),
)
def n_truncation_loss_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window truncation loss: at each candidate context length
    (64/128/256/512 whitespace tokens), what fraction of corpus tokens
    survive naive truncation and how many documents get cut — the
    planning table that, read against `n_seq_length_histogram`, decides
    whether to pack, chunk (`n_doc_chunking`), or drop long documents
    before training.

    Scale design: ONE map-only token count per document (fused into the
    scan, no explode — LEN of the split array), then the 4-row context
    dim fans each doc a constant factor into a combinable conditional
    aggregate; shares are exact integer ppm of 1-row broadcast totals.
    Monotone in ctx by construction, so adjacent rows read as marginal
    gains."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.size(F.split(F.lower(F.col("text")), " "))
        .cast("long")
        .alias("n_tok")
    )
    tot = toks.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("total_tokens"),
    )
    ctxs = spark.createDataFrame(
        [(64,), (128,), (256,), (512,)], ["ctx"]
    )
    sweep = (
        toks.crossJoin(F.broadcast(ctxs))
        .groupBy("ctx")
        .agg(
            F.sum(F.least(F.col("n_tok"), F.col("ctx").cast("long")))
            .cast("long")
            .alias("kept_tokens"),
            F.sum(
                F.when(F.col("n_tok") > F.col("ctx"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_truncated_docs"),
        )
    )
    return (
        sweep.crossJoin(F.broadcast(tot))
        .select(
            F.col("ctx").cast("long").alias("ctx_tokens"),
            "n_docs",
            "total_tokens",
            "kept_tokens",
            "n_truncated_docs",
            F.expr("kept_tokens * 1000000 DIV total_tokens")
            .cast("long")
            .alias("retention_ppm"),
            F.expr("n_truncated_docs * 1000000 DIV n_docs")
            .cast("long")
            .alias("truncated_docs_ppm"),
        )
        .orderBy("ctx_tokens")
    )


# ---------------------------------------------------------------------------
# Code-switching audit: sentence-level language votes within each document
# ---------------------------------------------------------------------------


def _codeswitch_oracle() -> str:
    score_cols = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        lst = ", ".join(f"'{m}'" for m in markers)
        score_cols.append(
            f"LEN(LIST_FILTER(STRING_SPLIT(sent, ' '), "
            f"t -> LIST_CONTAINS([{lst}], t))) AS score_{lang}"
        )
    langs_desc = sorted(LANG_MARKERS, reverse=True)
    case = "CASE " + " ".join(
        f"WHEN score_{code} = best THEN '{code}'" for code in langs_desc
    ) + " END"
    greatest = (
        "GREATEST(" + ", ".join(f"score_{c}" for c in sorted(LANG_MARKERS)) + ")"
    )
    return f"""
WITH sents AS (
  SELECT doc_id, lang, TRIM(u.s) AS sent
  FROM documents,
       UNNEST(LIST_FILTER(regexp_split_to_array(LOWER(text), '[.!?]+'),
                          s -> LEN(TRIM(s)) > 0)) AS u(s)
),
scored AS (
  SELECT doc_id, lang, {", ".join(score_cols)} FROM sents
),
best AS (SELECT *, {greatest} AS best FROM scored),
votes AS (
  SELECT doc_id, lang, {case} AS pred, CAST(COUNT(*) AS BIGINT) AS c
  FROM best GROUP BY doc_id, lang, {case}
),
per_doc AS (
  SELECT doc_id, lang,
         CAST(SUM(c) AS BIGINT) AS n_sent,
         CAST(COUNT(*) AS BIGINT) AS n_langs,
         MAX(LPAD(CAST(c AS VARCHAR), 6, '0') || pred) AS mx
  FROM votes GROUP BY doc_id, lang
),
flagged AS (
  SELECT lang, n_sent, n_langs,
         (n_sent - CAST(SUBSTR(mx, 1, 6) AS BIGINT)) * 1000000 // n_sent
           AS minority_ppm
  FROM per_doc
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN n_langs >= 2 AND minority_ppm >= 200000
                THEN 1 ELSE 0 END) AS BIGINT) AS n_codeswitched,
       CAST(SUM(CASE WHEN n_langs >= 2 AND minority_ppm >= 200000
                THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT)
         AS codeswitch_ppm,
       CAST(MAX(minority_ppm) AS BIGINT) AS max_minority_ppm
FROM flagged
GROUP BY lang
ORDER BY lang
"""


@register(
    "n_codeswitch_audit",
    oracle=_codeswitch_oracle(),
    tags=("N5", "F4", "A1", "A7"),
)
def n_codeswitch_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-switching audit: language-ID voted PER SENTENCE (the
    `n_sentence_stats` segmentation rule × the `n_langid` marker
    argmax), then per-document minority-language share — documents
    where ≥2 languages each hold ≥20% of sentences are flagged, the
    mixed-language pages that doc-level language-ID mislabels and
    quality filters should route to their own bucket.

    Determinism + scale design: sentence explode and marker scoring
    are map-only and fuse into the scan; votes are ONE combinable
    (doc, pred) rollup; the dominant-language argmax uses the
    LPAD(count)||lang string-max trick so count ties break on the
    largest language code identically in both engines (counts < 10⁶
    keep the fixed-width key total). Shares are exact integer ppm."""
    docs = load_table(spark, sf_dir, "documents")
    sents = docs.select(
        "doc_id",
        "lang",
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), r"[.!?]+"),
                lambda s: F.length(F.trim(s)) > 0,
            )
        ).alias("raw_sent"),
    ).select("doc_id", "lang", F.trim(F.col("raw_sent")).alias("sent"))
    pred = predicted_lang(F.split(F.col("sent"), " "))
    votes = (
        sents.select("doc_id", "lang", pred.alias("pred"))
        .groupBy("doc_id", "lang", "pred")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    per_doc = votes.groupBy("doc_id", "lang").agg(
        F.sum("c").cast("long").alias("n_sent"),
        F.count(F.lit(1)).cast("long").alias("n_langs"),
        F.max(
            F.concat(
                F.lpad(F.col("c").cast("string"), 6, "0"), F.col("pred")
            )
        ).alias("mx"),
    )
    flagged = per_doc.select(
        "lang",
        "n_langs",
        F.expr(
            "(n_sent - CAST(SUBSTR(mx, 1, 6) AS BIGINT)) * 1000000 "
            "DIV n_sent"
        ).alias("minority_ppm"),
    )
    switched = (F.col("n_langs") >= 2) & (F.col("minority_ppm") >= 200000)
    return (
        flagged.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.when(switched, 1).otherwise(0))
            .cast("long")
            .alias("n_codeswitched"),
            F.expr(
                "SUM(CASE WHEN n_langs >= 2 AND minority_ppm >= 200000 "
                "THEN 1 ELSE 0 END) * 1000000 DIV COUNT(*)"
            )
            .cast("long")
            .alias("codeswitch_ppm"),
            F.max("minority_ppm").cast("long").alias("max_minority_ppm"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Hashing-trick collision sweep: feature-space width planning table
# ---------------------------------------------------------------------------

_HASH_COLLISION_ORACLE = """
WITH terms AS (
  SELECT DISTINCT UNNEST(STRING_SPLIT(LOWER(text), ' ')) AS term
  FROM documents
),
keyed AS (
  SELECT term,
         CAST(('0x' || SUBSTR(MD5(term), 1, 12)) AS BIGINT) AS h
  FROM terms
),
vocab AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM keyed),
widths AS (SELECT UNNEST([1024, 4096, 16384]) AS w),
hashed AS (
  SELECT w.w, CAST(COUNT(DISTINCT k.h % w.w) AS BIGINT) AS n_buckets
  FROM keyed k CROSS JOIN widths w
  GROUP BY w.w
)
SELECT CAST(h.w AS BIGINT) AS width,
       v.v AS vocab_size,
       h.n_buckets AS buckets_used,
       CAST((v.v - h.n_buckets) * 1000000 // v.v AS BIGINT)
         AS collided_terms_ppm,
       CAST(h.n_buckets * 1000000 // h.w AS BIGINT) AS load_factor_ppm
FROM hashed h CROSS JOIN vocab v
ORDER BY width
"""


@register(
    "n_hashing_collision_sweep",
    oracle=_HASH_COLLISION_ORACLE,
    tags=("N5", "F7", "A3", "J9"),
)
def n_hashing_collision_sweep(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hashing-trick planning table: at feature widths 2¹⁰/2¹²/2¹⁴, how
    many vocabulary terms collide (lose identity) and how loaded the
    buckets are — the two numbers that size a hashed feature space
    (`n_feature_hashing`'s width becomes a measured choice instead of
    a guess; expected collisions follow the birthday bound, so the
    observed ppm also sanity-checks the hash).

    Determinism + scale design: the hash is a PORTABLE md5-prefix
    integer (48 bits via hex parse — both engines compute the same
    value by construction; Spark's xxhash64 and DuckDB's hash() don't
    match and would make the oracle vacuous); distinct terms are one
    combinable pass, the 3-row width dim fans them constant-fold wide,
    and COUNT(DISTINCT h % w) per width is the collision census."""
    docs = load_table(spark, sf_dir, "documents")
    terms = docs.select(
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("term")
    ).distinct()
    keyed = terms.select(
        "term",
        F.expr(
            "CAST(CONV(SUBSTR(MD5(term), 1, 12), 16, 10) AS BIGINT)"
        ).alias("h"),
    )
    vocab = keyed.agg(F.count(F.lit(1)).cast("long").alias("v"))
    widths = spark.createDataFrame(
        [(1024,), (4096,), (16384,)], ["w"]
    )
    hashed = (
        keyed.crossJoin(F.broadcast(widths))
        .groupBy("w")
        .agg(
            F.countDistinct(F.col("h") % F.col("w"))
            .cast("long")
            .alias("n_buckets")
        )
    )
    return (
        hashed.crossJoin(F.broadcast(vocab))
        .select(
            F.col("w").cast("long").alias("width"),
            F.col("v").alias("vocab_size"),
            F.col("n_buckets").alias("buckets_used"),
            F.expr("(v - n_buckets) * 1000000 DIV v")
            .cast("long")
            .alias("collided_terms_ppm"),
            F.expr("n_buckets * 1000000 DIV w")
            .cast("long")
            .alias("load_factor_ppm"),
        )
        .orderBy("width")
    )


# ---------------------------------------------------------------------------
# Chao1 vocabulary richness + Good-Turing frequency re-estimation
# ---------------------------------------------------------------------------

_CHAO1_ORACLE = """
WITH words AS (
  SELECT doc_id, STRING_SPLIT(LOWER(text), ' ') AS t FROM documents
),
toks AS (
  SELECT t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] AS term
  FROM words, UNNEST(GENERATE_SERIES(1, LEN(t) - 2)) AS g(i)
  WHERE LEN(t) >= 3
),
freq AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS r FROM toks GROUP BY term
),
fof AS (
  SELECT r, CAST(COUNT(*) AS BIGINT) AS s_r FROM freq GROUP BY r
),
tot AS (
  SELECT CAST(SUM(s_r) AS BIGINT) AS v,
         CAST(SUM(r * s_r) AS BIGINT) AS n_tokens,
         CAST(MAX(CASE WHEN r = 1 THEN s_r ELSE 0 END) AS BIGINT) AS f1,
         CAST(MAX(CASE WHEN r = 2 THEN s_r ELSE 0 END) AS BIGINT) AS f2
  FROM fof
),
low AS (
  SELECT r FROM fof ORDER BY r LIMIT 5
),
gt AS (
  SELECT a.r, a.s_r,
         CAST(COALESCE(b.s_r, 0) AS BIGINT) AS s_r_next,
         CASE WHEN a.s_r > 0 THEN
           ROUND((a.r + 1.0) * COALESCE(b.s_r, 0) / a.s_r, 6) END
           AS gt_adjusted_count
  FROM fof a
  JOIN low ON a.r = low.r
  LEFT JOIN fof b ON b.r = a.r + 1
)
SELECT CAST(g.r AS BIGINT) AS freq_class, g.s_r AS n_terms,
       g.s_r_next AS n_terms_next_class,
       g.gt_adjusted_count,
       t.v AS observed_vocab,
       CASE WHEN t.f2 > 0 THEN
         ROUND(t.v + CAST(t.f1 AS DOUBLE) * t.f1 / (2.0 * t.f2), 6) END
         AS chao1_vocab_estimate,
       CAST(t.f1 * 1000000 // t.n_tokens AS BIGINT) AS unseen_mass_ppm
FROM gt g CROSS JOIN tot t
ORDER BY freq_class
"""


@register(
    "n_chao1_good_turing",
    oracle=_CHAO1_ORACLE,
    tags=("N5", "A1", "A3", "J3"),
)
def n_chao1_good_turing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary richness and unseen-mass estimation from the
    frequency-of-frequencies table: Chao1 (V + F₁²/2F₂) estimates how
    many vocabulary items the corpus has NOT yet seen (the ecology
    species-richness estimator applied to tokens — pairs with Heaps'
    law, which fits the growth curve; Chao1 bounds its asymptote), and
    Good-Turing re-estimated counts r* = (r+1)·S(r+1)/S(r) for
    the five RAREST observed classes are the smoothing weights a
    language model assigns to rare events (word TRIGRAMS, because this
    corpus's unigram vocabulary is tiny and saturated — no unigram is
    rare); F₁/N is the Good-Turing probability mass of UNSEEN
    tokens — the number that decides how much more crawl to buy.

    Scale design: term frequencies are ONE combinable groupBy; the
    frequency-of-frequencies rollup is bounded by the max term count
    (≤ distinct r values); everything downstream — the r→r+1 self
    join, Chao1, unseen mass — runs on that tiny table with exact
    integer inputs and one fixed-shape double per output column."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.split(F.lower(F.col("text")), " ")
    sz = F.greatest(F.size(t) - 2, F.lit(0))
    trigrams = docs.filter(F.size(t) >= 3).select(
        F.explode(
            F.arrays_zip(
                F.slice(t, 1, sz), F.slice(t, 2, sz), F.slice(t, 3, sz)
            )
        ).alias("g")
    ).select(
        F.concat_ws(
            " ", F.col("g.0"), F.col("g.1"), F.col("g.2")
        ).alias("term")
    )
    freq = trigrams.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("r")
    )
    fof = freq.groupBy("r").agg(F.count(F.lit(1)).cast("long").alias("s_r"))
    tot = fof.agg(
        F.sum("s_r").cast("long").alias("v"),
        F.sum(F.col("r") * F.col("s_r")).cast("long").alias("n_tokens"),
        F.max(F.when(F.col("r") == 1, F.col("s_r")).otherwise(0))
        .cast("long")
        .alias("f1"),
        F.max(F.when(F.col("r") == 2, F.col("s_r")).otherwise(0))
        .cast("long")
        .alias("f2"),
    )
    nxt = fof.select(
        (F.col("r") - 1).alias("r"), F.col("s_r").alias("s_r_next")
    )
    low = fof.orderBy("r").limit(5).select("r")
    gt = (
        fof.join(F.broadcast(low), "r")
        .join(nxt, "r", "left")
        .select(
            "r",
            "s_r",
            F.coalesce("s_r_next", F.lit(0)).cast("long").alias(
                "s_r_next"
            ),
            F.when(
                F.col("s_r") > 0,
                F.round(
                    (F.col("r") + 1.0)
                    * F.coalesce("s_r_next", F.lit(0))
                    / F.col("s_r"),
                    6,
                ),
            ).alias("gt_adjusted_count"),
        )
    )
    return (
        gt.crossJoin(F.broadcast(tot))
        .select(
            F.col("r").cast("long").alias("freq_class"),
            F.col("s_r").alias("n_terms"),
            F.col("s_r_next").alias("n_terms_next_class"),
            "gt_adjusted_count",
            F.col("v").alias("observed_vocab"),
            F.when(
                F.col("f2") > 0,
                F.round(
                    F.col("v")
                    + F.col("f1").cast("double")
                    * F.col("f1")
                    / (2.0 * F.col("f2")),
                    6,
                ),
            ).alias("chao1_vocab_estimate"),
            F.expr("f1 * 1000000 DIV n_tokens")
            .cast("long")
            .alias("unseen_mass_ppm"),
        )
        .orderBy("freq_class")
    )


# ---------------------------------------------------------------------------
# Inverted-index compression estimate: delta + varbyte postings sizing
# ---------------------------------------------------------------------------

_POSTINGS_VB_ORACLE = """
WITH postings AS (
  SELECT DISTINCT UNNEST(STRING_SPLIT(LOWER(text), ' ')) AS term, doc_id
  FROM documents
),
gaps AS (
  SELECT term,
         doc_id - COALESCE(LAG(doc_id) OVER (PARTITION BY term
                                             ORDER BY doc_id), -1) AS gap
  FROM postings
),
sized AS (
  SELECT term, CAST((LENGTH(BIN(gap)) + 6) // 7 AS BIGINT) AS vb_bytes
  FROM gaps
),
per_term AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
         CAST(SUM(vb_bytes) AS BIGINT) AS vb
  FROM sized GROUP BY term
)
SELECT CAST(LENGTH(BIN(df)) AS BIGINT) AS df_band,
       CAST(COUNT(*) AS BIGINT) AS n_terms,
       CAST(SUM(df) AS BIGINT) AS total_postings,
       CAST(SUM(vb) AS BIGINT) AS varbyte_bytes,
       CAST(SUM(df) * 8 AS BIGINT) AS raw_bytes,
       CAST(SUM(vb) * 1000000 // (SUM(df) * 8) AS BIGINT)
         AS compressed_share_ppm
FROM per_term
GROUP BY df_band
ORDER BY df_band
"""


@register(
    "n_postings_compression_estimate",
    oracle=_POSTINGS_VB_ORACLE,
    tags=("N5", "F7", "W2", "A1"),
)
def n_postings_compression_estimate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Delta + varbyte sizing of the inverted index
    (`n_inverted_index_build`'s storage bill): posting lists are
    delta-encoded (gap = docid − previous docid) and each gap costs
    ⌈bits/7⌉ varbyte bytes — reported per document-frequency band,
    showing the classic effect that FREQUENT terms compress best
    (dense postings → small gaps → 1-byte deltas) while rare terms
    stay near raw cost. This is how one prices an index before
    building it.

    Determinism + scale design: postings are one distinct
    (term, doc) pass; gaps are one term-keyed LAG window (the index's
    natural partitioning — no global sort); the byte cost uses the
    exact LENGTH(BIN(gap)) integer-bit rule (the log2-histogram
    convention — never float log); bands and ratios are exact
    integers end to end. First gap encodes docid+1 so it is always
    positive."""
    docs = load_table(spark, sf_dir, "documents")
    postings = docs.select(
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("term"),
        "doc_id",
    ).dropDuplicates()
    w = Window.partitionBy("term").orderBy("doc_id")
    gaps = postings.select(
        "term",
        (
            F.col("doc_id")
            - F.coalesce(F.lag("doc_id").over(w), F.lit(-1))
        ).alias("gap"),
    )
    sized = gaps.select(
        "term",
        F.expr("CAST((LENGTH(BIN(gap)) + 6) DIV 7 AS BIGINT)").alias(
            "vb_bytes"
        ),
    )
    per_term = sized.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.sum("vb_bytes").cast("long").alias("vb"),
    )
    return (
        per_term.groupBy(
            F.expr("CAST(LENGTH(BIN(df)) AS BIGINT)").alias("df_band")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_terms"),
            F.sum("df").cast("long").alias("total_postings"),
            F.sum("vb").cast("long").alias("varbyte_bytes"),
            (F.sum("df") * 8).cast("long").alias("raw_bytes"),
            F.expr("SUM(vb) * 1000000 DIV (SUM(df) * 8)")
            .cast("long")
            .alias("compressed_share_ppm"),
        )
        .orderBy("df_band")
    )


# ---------------------------------------------------------------------------
# MoE router load-balance proxy: expert shares + Switch-style balance loss
# ---------------------------------------------------------------------------

_MOE_BALANCE_ORACLE = """
WITH toks AS (
  SELECT UNNEST(STRING_SPLIT(LOWER(text), ' ')) AS term FROM documents
),
routed AS (
  SELECT CAST(('0x' || SUBSTR(MD5(term), 1, 12)) AS BIGINT) % 8 AS expert
  FROM toks
),
loads AS (
  SELECT expert, CAST(COUNT(*) AS BIGINT) AS c FROM routed GROUP BY expert
),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM loads),
shares AS (
  SELECT l.expert, l.c, t.n,
         CAST(l.c * 1000000 // t.n AS BIGINT) AS share_ppm
  FROM loads l CROSS JOIN tot t
)
SELECT CAST(expert AS BIGINT) AS expert, c AS n_tokens, share_ppm,
       ROUND(8.0 * SUM((CAST(c AS DOUBLE) / n) * (CAST(c AS DOUBLE) / n))
             OVER (), 6) AS balance_loss,
       ROUND(MAX(CAST(c AS DOUBLE)) OVER ()
             / (CAST(MAX(n) OVER () AS DOUBLE) / 8), 6)
         AS max_over_mean_load,
       MAX(CAST(c AS DOUBLE)) OVER ()
         / (CAST(MAX(n) OVER () AS DOUBLE) / 8) < 1.2
         AS within_20pct_of_uniform
FROM shares
ORDER BY expert
"""


@register(
    "n_moe_load_balance_proxy",
    oracle=_MOE_BALANCE_ORACLE,
    tags=("N5", "F7", "A1", "J9"),
)
def n_moe_load_balance_proxy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture-of-experts router load balance, measured the way the
    Switch-Transformer auxiliary loss does: with a deterministic
    hash router over E = 8 experts, the balance loss E·Σ fᵢ·Pᵢ
    collapses to E·Σ fᵢ² (router probabilities equal realized
    fractions), minimized at 1.0 by uniform routing; max/mean load is
    the capacity-factor driver. The data-engineering half of MoE
    training IS this census — token routing is a groupBy, and a hot
    expert is a skewed key (`a_salted_hot_key`'s problem wearing a
    different hat).

    Determinism + scale design: the router is the portable md5-prefix
    hash (the `n_hashing_collision_sweep` convention); the census is
    ONE combinable groupBy to exactly 8 cells; the loss and load
    ratios are fixed-shape doubles over the 8-row frame with exact
    integer inputs."""
    docs = load_table(spark, sf_dir, "documents")
    routed = docs.select(
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("term")
    ).select(
        (
            F.expr("CAST(CONV(SUBSTR(MD5(term), 1, 12), 16, 10) AS BIGINT)")
            % 8
        ).alias("expert")
    )
    loads = routed.groupBy("expert").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    tot = loads.agg(F.sum("c").cast("long").alias("n"))
    shares = loads.crossJoin(F.broadcast(tot)).select(
        "expert",
        "c",
        "n",
        F.expr("c * 1000000 DIV n").cast("long").alias("share_ppm"),
    )
    w_all = Window.partitionBy()
    return shares.select(
        F.col("expert").cast("long").alias("expert"),
        F.col("c").alias("n_tokens"),
        "share_ppm",
        F.round(
            8.0
            * F.sum(
                (F.col("c").cast("double") / F.col("n"))
                * (F.col("c").cast("double") / F.col("n"))
            ).over(w_all),
            6,
        ).alias("balance_loss"),
        F.round(
            F.max(F.col("c").cast("double")).over(w_all)
            / (F.max("n").over(w_all).cast("double") / 8),
            6,
        ).alias("max_over_mean_load"),
        (
            F.max(F.col("c").cast("double")).over(w_all)
            / (F.max("n").over(w_all).cast("double") / 8)
            < 1.2
        ).alias("within_20pct_of_uniform"),
    ).orderBy("expert")


# ---------------------------------------------------------------------------
# Bigram entropy rate: how much each next token is constrained by context
# ---------------------------------------------------------------------------

_BIGRAM_ENTROPY_ORACLE = """
WITH words AS (
  SELECT STRING_SPLIT(LOWER(text), ' ') AS t FROM documents
),
bigrams AS (
  SELECT t[i] AS w1, t[i + 1] AS w2
  FROM words, UNNEST(GENERATE_SERIES(1, LEN(t) - 1)) AS g(i)
  WHERE LEN(t) >= 2
),
c2 AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c FROM bigrams GROUP BY w1, w2
),
c1 AS (
  SELECT w1, CAST(SUM(c) AS BIGINT) AS c1 FROM c2 GROUP BY w1
),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM c2),
uni_terms AS (
  SELECT CAST(ROUND(-(CAST(c1.c1 AS DOUBLE) / t.n)
                    * LN(CAST(c1.c1 AS DOUBLE) / t.n)
                    * 1000000000) AS BIGINT) AS h_nano
  FROM c1 CROSS JOIN tot t
),
cond_terms AS (
  SELECT CAST(ROUND(-(CAST(c2.c AS DOUBLE) / t.n)
                    * LN(CAST(c2.c AS DOUBLE) / c1.c1)
                    * 1000000000) AS BIGINT) AS h_nano
  FROM c2 JOIN c1 ON c2.w1 = c1.w1 CROSS JOIN tot t
),
ents AS (
  SELECT (SELECT CAST(SUM(h_nano) AS BIGINT) FROM uni_terms) AS h1_nano,
         (SELECT CAST(SUM(h_nano) AS BIGINT) FROM cond_terms) AS h2_nano,
         (SELECT n FROM tot) AS n
)
SELECT n AS n_bigrams,
       ROUND(h1_nano / 1000000000.0, 6) AS unigram_entropy_nats,
       ROUND(h2_nano / 1000000000.0, 6) AS conditional_entropy_nats,
       CAST((h1_nano - h2_nano) * 1000000 // h1_nano AS BIGINT)
         AS redundancy_ppm,
       h2_nano < h1_nano AS context_is_informative
FROM ents
"""


@register(
    "n_bigram_entropy_rate",
    oracle=_BIGRAM_ENTROPY_ORACLE,
    tags=("N5", "A1", "J1", "F3"),
)
def n_bigram_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram entropy rate H(W₂|W₁) versus unigram entropy H(W): their
    gap (mutual information between adjacent tokens, reported as
    redundancy ppm) measures how much one token of context constrains
    the next — the corpus-level compressibility/predictability number
    that a language model's first attention head will exploit, and the
    Shannon companion to `n_bigram_lm_score` (which scores documents)
    and `n_char_entropy` (character level, no context).

    Determinism + scale design: ONE bigram groupBy feeds both
    distributions (the unigram table is the bigram table re-summed, so
    the two entropies share a denominator and the redundancy is an
    exact integer ratio); every entropy term is nano-nat rounded to an
    exact BIGINT at the leaf (the JSD/KM convention) before the sums,
    so partition layout cannot move a bit."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.split(F.lower(F.col("text")), " ")
    sz = F.greatest(F.size(t) - 1, F.lit(0))
    bigrams = docs.filter(F.size(t) >= 2).select(
        F.explode(
            F.arrays_zip(F.slice(t, 1, sz), F.slice(t, 2, sz))
        ).alias("bg")
    ).select(F.col("bg.0").alias("w1"), F.col("bg.1").alias("w2"))
    c2 = bigrams.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    c1 = c2.groupBy("w1").agg(F.sum("c").cast("long").alias("c1"))
    tot = c2.agg(F.sum("c").cast("long").alias("n"))
    uni = (
        c1.crossJoin(F.broadcast(tot))
        .select(
            F.expr(
                "CAST(ROUND(-(CAST(c1 AS DOUBLE) / n) "
                "* LN(CAST(c1 AS DOUBLE) / n) * 1000000000) AS BIGINT)"
            ).alias("h_nano")
        )
        .agg(F.sum("h_nano").cast("long").alias("h1_nano"))
    )
    cond = (
        c2.join(c1, "w1")
        .crossJoin(F.broadcast(tot))
        .select(
            F.expr(
                "CAST(ROUND(-(CAST(c AS DOUBLE) / n) "
                "* LN(CAST(c AS DOUBLE) / c1) * 1000000000) AS BIGINT)"
            ).alias("h_nano")
        )
        .agg(F.sum("h_nano").cast("long").alias("h2_nano"))
    )
    return (
        uni.crossJoin(F.broadcast(cond))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("n").alias("n_bigrams"),
            F.round(F.col("h1_nano") / 1000000000.0, 6).alias(
                "unigram_entropy_nats"
            ),
            F.round(F.col("h2_nano") / 1000000000.0, 6).alias(
                "conditional_entropy_nats"
            ),
            F.expr("(h1_nano - h2_nano) * 1000000 DIV h1_nano")
            .cast("long")
            .alias("redundancy_ppm"),
            (F.col("h2_nano") < F.col("h1_nano")).alias(
                "context_is_informative"
            ),
        )
    )


# ---------------------------------------------------------------------------
# BPE merge training, three rounds unrolled in pure SQL
# ---------------------------------------------------------------------------

_BPE_MERGE_ORACLE = """
WITH t0 AS (
  SELECT doc_id, ' ' || LOWER(text) || ' ' AS txt FROM documents
),
p1 AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM (
    SELECT t[i] AS w1, t[i + 1] AS w2
    FROM (SELECT STRING_SPLIT(TRIM(txt), ' ') AS t FROM t0),
         UNNEST(GENERATE_SERIES(1, LEN(t) - 1)) AS g(i)
  ) GROUP BY w1, w2 ORDER BY cnt DESC, w1, w2 LIMIT 1
),
t1 AS (
  SELECT doc_id,
         REPLACE(t0.txt, ' ' || p1.w1 || ' ' || p1.w2 || ' ',
                 ' ' || p1.w1 || '_' || p1.w2 || ' ') AS txt
  FROM t0 CROSS JOIN p1
),
p2 AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM (
    SELECT t[i] AS w1, t[i + 1] AS w2
    FROM (SELECT STRING_SPLIT(TRIM(txt), ' ') AS t FROM t1),
         UNNEST(GENERATE_SERIES(1, LEN(t) - 1)) AS g(i)
  ) GROUP BY w1, w2 ORDER BY cnt DESC, w1, w2 LIMIT 1
),
t2 AS (
  SELECT doc_id,
         REPLACE(t1.txt, ' ' || p2.w1 || ' ' || p2.w2 || ' ',
                 ' ' || p2.w1 || '_' || p2.w2 || ' ') AS txt
  FROM t1 CROSS JOIN p2
),
p3 AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM (
    SELECT t[i] AS w1, t[i + 1] AS w2
    FROM (SELECT STRING_SPLIT(TRIM(txt), ' ') AS t FROM t2),
         UNNEST(GENERATE_SERIES(1, LEN(t) - 1)) AS g(i)
  ) GROUP BY w1, w2 ORDER BY cnt DESC, w1, w2 LIMIT 1
),
t3 AS (
  SELECT doc_id,
         REPLACE(t2.txt, ' ' || p3.w1 || ' ' || p3.w2 || ' ',
                 ' ' || p3.w1 || '_' || p3.w2 || ' ') AS txt
  FROM t2 CROSS JOIN p3
),
stats AS (
  SELECT 1 AS rnd, (SELECT w1 FROM p1) AS w1, (SELECT w2 FROM p1) AS w2,
         (SELECT cnt FROM p1) AS pair_count,
         (SELECT CAST(COUNT(DISTINCT u.w) AS BIGINT)
          FROM (SELECT UNNEST(STRING_SPLIT(TRIM(txt), ' ')) AS w
                FROM t1) u) AS vocab_after,
         (SELECT CAST(SUM(LEN(STRING_SPLIT(TRIM(txt), ' '))) AS BIGINT)
          FROM t1) AS tokens_after
  UNION ALL
  SELECT 2, (SELECT w1 FROM p2), (SELECT w2 FROM p2),
         (SELECT cnt FROM p2),
         (SELECT CAST(COUNT(DISTINCT u.w) AS BIGINT)
          FROM (SELECT UNNEST(STRING_SPLIT(TRIM(txt), ' ')) AS w
                FROM t2) u),
         (SELECT CAST(SUM(LEN(STRING_SPLIT(TRIM(txt), ' '))) AS BIGINT)
          FROM t2)
  UNION ALL
  SELECT 3, (SELECT w1 FROM p3), (SELECT w2 FROM p3),
         (SELECT cnt FROM p3),
         (SELECT CAST(COUNT(DISTINCT u.w) AS BIGINT)
          FROM (SELECT UNNEST(STRING_SPLIT(TRIM(txt), ' ')) AS w
                FROM t3) u),
         (SELECT CAST(SUM(LEN(STRING_SPLIT(TRIM(txt), ' '))) AS BIGINT)
          FROM t3)
)
SELECT CAST(rnd AS BIGINT) AS merge_rank, w1, w2, pair_count,
       vocab_after, tokens_after
FROM stats ORDER BY merge_rank
"""


@register(
    "n_bpe_merge_simulation",
    oracle=_BPE_MERGE_ORACLE,
    tags=("N5", "A1", "F1", "J9", "O2"),
)
def n_bpe_merge_simulation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer TRAINING, three merge rounds unrolled in pure
    relational algebra: each round counts adjacent-pair frequencies,
    picks the argmax pair (count desc, then lexicographic — the
    deterministic tie rule real tokenizers need but rarely document),
    and rewrites the corpus with the merged token; the output is the
    learned merge table plus vocab/token counts after each merge — the
    compression trajectory that motivates BPE in the first place.

    Determinism + scale design: each round is one combinable pair
    count + a 1-row argmax broadcast + a MAP-ONLY space-padded string
    rewrite (non-overlapping left-to-right REPLACE — both engines
    share the greedy-scan quirk on runs like 'a b a b', which is BPE's
    own behavior); rounds are data-dependent sequentially but each is
    a constant number of stages, so 3 rounds = 3 bounded passes. The
    winning pair flows through a broadcast, never a collect."""
    docs = load_table(spark, sf_dir, "documents")
    cur = docs.select(
        "doc_id",
        F.concat(F.lit(" "), F.lower(F.col("text")), F.lit(" ")).alias(
            "txt"
        ),
    )
    rows = []
    for rnd in range(1, 4):
        t = F.split(F.trim(F.col("txt")), " ")
        sz = F.greatest(F.size(t) - 1, F.lit(0))
        pairs = (
            cur.select(
                F.explode(
                    F.arrays_zip(F.slice(t, 1, sz), F.slice(t, 2, sz))
                ).alias("bg")
            )
            .select(
                F.col("bg.0").alias("w1"), F.col("bg.1").alias("w2")
            )
            .groupBy("w1", "w2")
            .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "w1", "w2")
            .limit(1)
        )
        cur = cur.crossJoin(F.broadcast(pairs)).select(
            "doc_id",
            F.expr(
                "replace(txt, ' ' || w1 || ' ' || w2 || ' ', "
                "' ' || w1 || '_' || w2 || ' ')"
            ).alias("txt"),
        )
        t_after = F.split(F.trim(F.col("txt")), " ")
        summary = (
            cur.select(
                F.explode(t_after).alias("w")
            )
            .agg(
                F.countDistinct("w").cast("long").alias("vocab_after"),
                F.count(F.lit(1)).cast("long").alias("tokens_after"),
            )
            .crossJoin(F.broadcast(pairs))
            .select(
                F.lit(rnd).cast("long").alias("merge_rank"),
                "w1",
                "w2",
                F.col("cnt").alias("pair_count"),
                "vocab_after",
                "tokens_after",
            )
        )
        rows.append(summary)
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out.orderBy("merge_rank")
