"""Text-analysis queries over `documents` (SURVEY.md §2.10 N5 + north
star: language-ID, quality scoring, token counting, fingerprinting).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from ..operators.text import (
    LANG_MARKERS,
    fingerprint_min_md5,
    predicted_lang,
    quality_score,
    token_count_bpe_ish,
    token_count_whitespace,
    tokens,
)
from ..registry import register


@register(
    "n_text_stats_top_terms",
    oracle="""
WITH toks AS (
  SELECT lang, UNNEST(STRING_SPLIT(LOWER(text), ' ')) AS term
  FROM documents
),
counts AS (
  SELECT lang, term, COUNT(*) AS n
  FROM toks GROUP BY lang, term
)
SELECT lang, term, n, rnk FROM (
  SELECT lang, term, n,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, term ASC) AS rnk
  FROM counts
) t WHERE rnk <= 5
""",
    tags=("N5",),
    headline=True,
)
def n_text_stats_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term frequency: tokenize → explode → count → top-5 per language."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("lang", F.explode(tokens("text")).alias("term"))
    counts = toks.groupBy("lang", "term").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), F.col("term").asc())
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("lang", "term", "n", "rnk")
    )


@register(
    "n_token_count",
    oracle=r"""
SELECT
  doc_id,
  LEN(STRING_SPLIT(LOWER(text), ' ')) AS n_tokens_ws,
  LEN(REGEXP_EXTRACT_ALL(LOWER(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS n_tokens_bpe,
  n_chars = LENGTH(text) AS n_chars_consistent
FROM documents
""",
    tags=("N5",),
)
def n_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        token_count_whitespace("text").alias("n_tokens_ws"),
        token_count_bpe_ish("text").alias("n_tokens_bpe"),
        (F.col("n_chars") == F.length("text")).alias("n_chars_consistent"),
    )


def _langid_oracle() -> str:
    score_cols = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        lst = ", ".join(f"'{m}'" for m in markers)
        score_cols.append(
            f"LEN(LIST_FILTER(STRING_SPLIT(LOWER(text), ' '), "
            f"t -> LIST_CONTAINS([{lst}], t))) AS score_{lang}"
        )
    # argmax with largest-lang-code tie-break: check codes descending.
    langs_desc = sorted(LANG_MARKERS, reverse=True)
    case = "CASE " + " ".join(
        f"WHEN score_{code} = best THEN '{code}'" for code in langs_desc
    ) + " END"
    greatest = "GREATEST(" + ", ".join(f"score_{c}" for c in sorted(LANG_MARKERS)) + ")"
    return f"""
WITH scored AS (
  SELECT doc_id, lang, {", ".join(score_cols)}
  FROM documents
),
best AS (SELECT *, {greatest} AS best FROM scored)
SELECT doc_id, lang, {case} AS pred_lang, ({case}) = lang AS is_match
FROM best
"""


@register("n_langid", oracle=_langid_oracle(), tags=("N5",))
def n_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-lexicon language-ID heuristic (deterministic argmax)."""
    d = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    pred = predicted_lang(toks)
    return d.select(
        "doc_id",
        "lang",
        pred.alias("pred_lang"),
        (pred == F.col("lang")).alias("is_match"),
    )


@register(
    "n_quality_score",
    oracle="""
WITH t AS (
  SELECT doc_id,
         LEN(STRING_SPLIT(LOWER(text), ' '))                 AS n_tok,
         LEN(LIST_DISTINCT(STRING_SPLIT(LOWER(text), ' ')))  AS n_uniq,
         LENGTH(text)                                        AS n_char
  FROM documents
)
SELECT doc_id, n_tok, n_uniq,
  LEAST(CAST(n_tok AS DOUBLE) / 60.0, 1.0) * 0.5
  + (n_uniq / CAST(n_tok AS DOUBLE)) * 0.4
  + LEAST(((n_char - (n_tok - 1)) / CAST(n_tok AS DOUBLE)) / 10.0, 1.0) * 0.1
    AS quality
FROM t
""",
    tags=("N5",),
)
def n_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tok"),
        F.size(F.array_distinct(toks)).alias("n_uniq"),
        quality_score("text").alias("quality"),
    )


@register(
    "n_fingerprint",
    oracle="""
SELECT doc_id,
  ARRAY_TO_STRING(
    LIST_SORT(LIST_TRANSFORM(RANGE(1, GREATEST(LENGTH(text) - 4, 1) + 1),
                             i -> MD5(SUBSTR(text, i, 5))))[1:4],
    ',') AS fingerprint
FROM documents
""",
    tags=("N5", "F7"),
)
def n_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-style fingerprint: 4 smallest md5s of all 5-grams."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", fingerprint_min_md5("text", k=5, keep=4).alias("fingerprint"))


_CURATION_ORACLE = """
WITH corpus AS (
  SELECT doc_id, text, source FROM documents
  UNION ALL
  SELECT doc_id + 100000, UPPER(text), source FROM documents
),
hashed AS (
  SELECT doc_id, text, source, SHA256(LOWER(TRIM(text))) AS h FROM corpus
),
survivors AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id) AS rn
    FROM hashed
  ) WHERE rn = 1
),
scored AS (
  SELECT doc_id, source,
         LEN(STRING_SPLIT(LOWER(text), ' ')) AS n_tok,
         LEAST(CAST(LEN(STRING_SPLIT(LOWER(text), ' ')) AS DOUBLE) / 60.0, 1.0) * 0.5
         + (LEN(LIST_DISTINCT(STRING_SPLIT(LOWER(text), ' ')))
            / CAST(LEN(STRING_SPLIT(LOWER(text), ' ')) AS DOUBLE)) * 0.4
         + LEAST(((LENGTH(text) - (LEN(STRING_SPLIT(LOWER(text), ' ')) - 1))
                  / CAST(LEN(STRING_SPLIT(LOWER(text), ' ')) AS DOUBLE)) / 10.0, 1.0) * 0.1
           AS quality
  FROM survivors
)
SELECT c.source                                        AS source,
       COUNT(*)                                        AS n_input,
       (SELECT COUNT(*) FROM survivors s WHERE s.source = c.source)
                                                       AS n_after_dedup,
       (SELECT COUNT(*) FROM scored q
        WHERE q.source = c.source AND q.quality >= 0.8) AS n_kept,
       (SELECT CAST(COALESCE(SUM(q.n_tok), 0) AS BIGINT) FROM scored q
        WHERE q.source = c.source AND q.quality >= 0.8) AS tokens_kept
FROM corpus c
GROUP BY c.source
"""


@register(
    "pipeline_data_curation",
    oracle=_CURATION_ORACLE,
    tags=("N1", "N5", "P7"),
    headline=True,
)
def pipeline_data_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-data curation — the composition the engine
    exists for: planted-duplicate corpus → exact dedup (normalized-hash,
    keep-min-id) → quality gate (>= 0.8, bit-deterministic heuristic) →
    per-source accounting of inputs, survivors, kept docs, and kept
    tokens. Every stage is the registered operator, chained; the oracle
    recomputes the identical pipeline in SQL."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text", "source")
    corpus = d.unionByName(
        d.select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.upper("text").alias("text"),
            "source",
        )
    ).repartition(spark.sparkContext.defaultParallelism)
    # ^ the single-file scan arrives as ONE partition; without the
    # repartition the dedup hashing and quality scoring of the doubled
    # corpus serialize in a single task.
    # Single-pass accounting: every text-derived scalar (hash, token
    # count, quality) is computed MAP-SIDE and `text` is dropped before
    # any shuffle — the dedup window then moves ~40-byte rows, not
    # document bodies, and the per-source rollup is one conditional
    # aggregation. The naive form (three aggregate branches joined back
    # together) re-executes the corpus per branch; a window over rows
    # still carrying `text` shuffles the whole corpus bytes. Same
    # numbers, same oracle.
    from ..operators.dedup import normalized_text_hash

    skinny = corpus.select(
        "doc_id",
        "source",
        normalized_text_hash(F.col("text")).alias("__text_hash"),
        token_count_whitespace("text").alias("n_tok"),
        quality_score("text").alias("quality"),
    )
    w = Window.partitionBy("__text_hash")
    flagged = skinny.withColumn(
        "__survivor", F.min("doc_id").over(w) == F.col("doc_id")
    )
    kept = F.col("__survivor") & (F.col("quality") >= 0.8)
    return flagged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_input"),
        F.count_if(F.col("__survivor")).alias("n_after_dedup"),
        F.count_if(kept).alias("n_kept"),
        F.coalesce(F.sum(F.when(kept, F.col("n_tok"))), F.lit(0))
        .cast("long")
        .alias("tokens_kept"),
    )
