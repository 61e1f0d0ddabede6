"""Text-analysis queries over `documents` (SURVEY.md §2.10 N5 + north
star: language-ID, quality scoring, token counting, fingerprinting).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from ..operators.similarity import (
    dot_unrolled,
    dot_unrolled_sql,
    norm_unrolled_sql,
)
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


# --- PII redaction ----------------------------------------------------------

_EMAIL_RE = r"[a-zA-Z0-9._]+@[a-zA-Z0-9.]+"
_PHONE_RE = r"555-[0-9]{4}"

_PII_ORACLE = f"""
WITH seeded AS (
  SELECT doc_id,
         text || ' contact user' || doc_id ||
         '@example.com or 555-' || LPAD(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
           AS text
  FROM documents WHERE doc_id % 5 = 0
  UNION ALL
  SELECT doc_id, text FROM documents WHERE doc_id % 5 <> 0
),
redacted AS (
  SELECT doc_id,
         LEN(REGEXP_EXTRACT_ALL(text, '{_EMAIL_RE}'))  AS n_emails,
         LEN(REGEXP_EXTRACT_ALL(text, '{_PHONE_RE}'))  AS n_phones,
         REGEXP_REPLACE(REGEXP_REPLACE(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                        '{_PHONE_RE}', '<PHONE>', 'g') AS clean
  FROM seeded
)
SELECT doc_id, n_emails, n_phones,
       SUBSTRING(clean, GREATEST(LEN(clean) - 39, 1), 40) AS clean_tail
FROM redacted
WHERE n_emails + n_phones > 0
"""


@register("n_pii_redaction", oracle=_PII_ORACLE, tags=("N5", "F1"))
def n_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing pass: every 5th doc gets a planted email + phone
    (known positives), then both patterns are counted (`regexp_count`)
    and masked (`regexp_replace` replaces ALL matches in Spark; the
    DuckDB oracle needs the explicit 'g' flag). Pure map-side JVM regex
    — at 100 TB this is a scan-speed pass with zero shuffle; the
    returned tail substring pins the actual redacted text, not just the
    counts. Patterns stay in the RE2 ∩ java.util.regex common subset so
    both engines compile them identically."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    seeded = d.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                F.col("doc_id"),
                F.lit("@example.com or 555-"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.col("text")),
    )
    clean = F.regexp_replace(
        F.regexp_replace("text", F.lit(_EMAIL_RE), F.lit("<EMAIL>")),
        F.lit(_PHONE_RE),
        F.lit("<PHONE>"),
    )
    redacted = seeded.select(
        "doc_id",
        F.regexp_count("text", F.lit(_EMAIL_RE)).alias("n_emails"),
        F.regexp_count("text", F.lit(_PHONE_RE)).alias("n_phones"),
        clean.alias("clean"),
    )
    return redacted.filter(F.col("n_emails") + F.col("n_phones") > 0).select(
        "doc_id",
        "n_emails",
        "n_phones",
        F.substring(
            "clean", F.greatest(F.length("clean") - 39, F.lit(1)), F.lit(40)
        ).alias("clean_tail"),
    )


# --- Gopher-style repetition / quality filters ------------------------------

_GOPHER_ORACLE = """
WITH toks AS (
  SELECT doc_id, UNNEST(STRING_SPLIT(LOWER(text), ' ')) AS tok
  FROM documents
),
tok_counts AS (
  SELECT doc_id, tok, COUNT(*) AS n FROM toks GROUP BY doc_id, tok
),
per_doc AS (
  SELECT doc_id,
         CAST(SUM(n) AS BIGINT)                       AS n_words,
         COUNT(*)                                     AS n_distinct,
         CAST(MAX(n) AS BIGINT)                       AS top_word_n,
         CAST(SUM(n * LEN(tok)) AS BIGINT)            AS total_chars,
         CAST(SUM(CASE WHEN tok IN ('the','a','of','to','and','in','is')
                       THEN n ELSE 0 END) AS BIGINT)  AS n_stop
  FROM tok_counts GROUP BY doc_id
)
SELECT doc_id, n_words,
       ROUND(top_word_n  / CAST(n_words AS DOUBLE), 6) AS top_word_frac,
       ROUND(n_distinct  / CAST(n_words AS DOUBLE), 6) AS distinct_frac,
       ROUND(total_chars / CAST(n_words AS DOUBLE), 6) AS mean_word_len,
       ROUND(n_stop      / CAST(n_words AS DOUBLE), 6) AS stopword_frac,
       (n_words BETWEEN 30 AND 100000
        AND top_word_n  / CAST(n_words AS DOUBLE) <= 0.20
        AND n_distinct  / CAST(n_words AS DOUBLE) >= 0.20
        AND total_chars / CAST(n_words AS DOUBLE) BETWEEN 2 AND 12
        AND n_stop      / CAST(n_words AS DOUBLE) >= 0.01) AS keep
FROM per_doc
"""


@register("n_quality_gopher_filters", oracle=_GOPHER_ORACLE, tags=("N5", "A1"))
def n_quality_gopher_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-rule repetition/quality gate: per-document word count,
    most-frequent-word fraction, distinct-word ratio, mean word length,
    and stopword fraction, combined into a keep flag with the published
    thresholds (word count bounds, top-word <= 20%, distinct >= 20%,
    mean length 2-12 chars, stopword floor). Shape is explode -> two
    cascaded aggregations keyed by doc_id, so the heavy first combine is
    map-side partial and the ratios are exact integer sums divided once
    (deterministic across engines, then rounded identically)."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(tokens("text")).alias("tok"))
    tok_counts = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("n"))
    stop = F.col("tok").isin("the", "a", "of", "to", "and", "in", "is")
    per_doc = tok_counts.groupBy("doc_id").agg(
        F.sum("n").cast("long").alias("n_words"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("n").cast("long").alias("top_word_n"),
        F.sum(F.col("n") * F.length("tok")).cast("long").alias("total_chars"),
        F.sum(F.when(stop, F.col("n")).otherwise(0)).cast("long").alias("n_stop"),
    )
    nw = F.col("n_words").cast("double")
    top_frac = F.col("top_word_n") / nw
    dist_frac = F.col("n_distinct") / nw
    mean_len = F.col("total_chars") / nw
    stop_frac = F.col("n_stop") / nw
    keep = (
        F.col("n_words").between(30, 100000)
        & (top_frac <= 0.20)
        & (dist_frac >= 0.20)
        & mean_len.between(2, 12)
        & (stop_frac >= 0.01)
    )
    return per_doc.select(
        "doc_id",
        "n_words",
        F.round(top_frac, 6).alias("top_word_frac"),
        F.round(dist_frac, 6).alias("distinct_frac"),
        F.round(mean_len, 6).alias("mean_word_len"),
        F.round(stop_frac, 6).alias("stopword_frac"),
        keep.alias("keep"),
    )


# --- TF-IDF top terms per document ------------------------------------------

_TFIDF_ORACLE = """
WITH toks AS (
  SELECT doc_id, UNNEST(STRING_SPLIT(LOWER(text), ' ')) AS tok FROM documents
),
tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY doc_id, tok),
df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.tok, tf.tf, df.df,
         ROUND(tf.tf * (LN((n.n_docs + 1) / CAST(df.df + 1 AS DOUBLE)) + 1), 6)
           AS tfidf
  FROM tf JOIN df ON tf.tok = df.tok CROSS JOIN n
  WHERE tf.doc_id < 100
)
SELECT doc_id, tok, tf, df, tfidf FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY doc_id ORDER BY tfidf DESC, tok ASC) AS rnk
  FROM scored
) t WHERE rnk <= 3
"""


@register("n_tfidf_top_terms", oracle=_TFIDF_ORACLE, tags=("N5", "A1", "W4"))
def n_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF keyword extraction: corpus-wide document frequency
    (computed over ALL docs) joined back to term frequencies, smoothed
    idf = ln((N+1)/(df+1)) + 1, top-3 terms per doc by rounded score.
    The df join is left UNHINTED on purpose: at test scale Catalyst/AQE
    broadcasts the vocabulary-sized side, but a 100 TB crawl's token
    vocabulary (typos, numbers, ids) is NOT broadcastable — the adaptive
    plan degrades to a hash join on `tok`, which is the correct shape
    there. Only the one-row n_docs scalar is force-broadcast. Ranking
    uses the ROUNDED score in both engines so the order is identical
    even if libm ulps differ."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(tokens("text")).alias("tok"))
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    n_docs = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.filter(F.col("doc_id") < 100)
        .join(df, "tok")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "tok",
            "tf",
            "df",
            F.round(
                F.col("tf")
                * (
                    F.log((F.col("n_docs") + 1) / (F.col("df") + 1).cast("double"))
                    + 1
                ),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("tok").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "tok", "tf", "df", "tfidf")
    )


# --- BM25 retrieval scoring -------------------------------------------------

_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TERMS = ("table", "data", "window")  # the "search query"

_BM25_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, UNNEST(STRING_SPLIT(LOWER(text), ' ')) AS tok FROM documents
),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
stats AS (
  SELECT COUNT(*) AS n_docs, SUM(dl) / CAST(COUNT(*) AS DOUBLE) AS avgdl
  FROM dl
),
tf AS (
  SELECT doc_id, tok, COUNT(*) AS tf FROM toks
  WHERE tok IN ('table', 'data', 'window') GROUP BY doc_id, tok
),
df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
contrib AS (
  SELECT tf.doc_id, tf.tok,
         LN(1 + (stats.n_docs - df.df + 0.5) / (df.df + 0.5))
           * (tf.tf * ({_BM25_K1} + 1))
           / (tf.tf + {_BM25_K1} * (1 - {_BM25_B} + {_BM25_B} * dl.dl / stats.avgdl))
           AS c
  FROM tf
  JOIN df ON tf.tok = df.tok
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
),
scored AS (
  SELECT doc_id,
         ROUND(COALESCE(MAX(CASE WHEN tok = 'table'  THEN c END), 0)
             + COALESCE(MAX(CASE WHEN tok = 'data'   THEN c END), 0)
             + COALESCE(MAX(CASE WHEN tok = 'window' THEN c END), 0), 6) AS bm25
  FROM contrib GROUP BY doc_id
)
SELECT doc_id, bm25 FROM scored
ORDER BY bm25 DESC, doc_id ASC LIMIT 10
"""


def _bm25_scored_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, bm25) for the fixed 3-term query — the scoring shared by
    n_bm25_retrieval and the lexical arm of n_hybrid_rrf_fusion. Only
    docs matching at least one query term appear (contrib is inner-built
    from tf)."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(tokens("text")).alias("tok"))
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl") / F.count(F.lit(1)).cast("double")).alias("avgdl"),
    )
    tf = (
        toks.filter(F.col("tok").isin(*_BM25_TERMS))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    contrib = (
        tf.join(F.broadcast(df), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            "tok",
            (
                F.log(1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
                * (F.col("tf") * (_BM25_K1 + 1))
                / (
                    F.col("tf")
                    + _BM25_K1
                    * (1 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
                )
            ).alias("c"),
        )
    )
    pivot = [
        F.coalesce(F.max(F.when(F.col("tok") == t, F.col("c"))), F.lit(0.0))
        for t in _BM25_TERMS
    ]
    return contrib.groupBy("doc_id").agg(
        F.round(pivot[0] + pivot[1] + pivot[2], 6).alias("bm25")
    )


@register("n_bm25_retrieval", oracle=_BM25_ORACLE, tags=("N5", "N3", "O2"))
def n_bm25_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 lexical retrieval (k1=1.2, b=0.75) for a 3-term query —
    top-10 docs. Per-term contributions are pivoted into columns and
    added in a FIXED order (table + data + window): float addition is
    non-associative, so relying on aggregation order would be
    nondeterministic across partitionings and engines. df/avgdl stats
    are scalars broadcast to the tf side; only the tf aggregation
    shuffles the corpus."""
    scored = _bm25_scored_df(spark, sf_dir)
    return scored.orderBy(F.col("bm25").desc(), F.col("doc_id").asc()).limit(10)


# --- hybrid retrieval: reciprocal-rank fusion of BM25 + dense cosine --------

#: Embedding width of the `embeddings` table (TESTDATA.md, measured).
_EMB_DIM = 64
_RRF_K = 60  # the standard RRF smoothing constant (Cormack et al.)
_RRF_TOPN = 100  # per-arm candidate depth

_RRF_ORACLE_TEMPLATE = """
WITH toks AS (
  SELECT doc_id, UNNEST(STRING_SPLIT(LOWER(text), ' ')) AS tok FROM documents
),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
stats AS (
  SELECT COUNT(*) AS n_docs, SUM(dl) / CAST(COUNT(*) AS DOUBLE) AS avgdl
  FROM dl
),
tf AS (
  SELECT doc_id, tok, COUNT(*) AS tf FROM toks
  WHERE tok IN ('table', 'data', 'window') GROUP BY doc_id, tok
),
df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
contrib AS (
  SELECT tf.doc_id, tf.tok,
         LN(1 + (stats.n_docs - df.df + 0.5) / (df.df + 0.5))
           * (tf.tf * ({k1} + 1))
           / (tf.tf + {k1} * (1 - {b} + {b} * dl.dl / stats.avgdl))
           AS c
  FROM tf
  JOIN df ON tf.tok = df.tok
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
),
scored AS (
  SELECT doc_id,
         ROUND(COALESCE(MAX(CASE WHEN tok = 'table'  THEN c END), 0)
             + COALESCE(MAX(CASE WHEN tok = 'data'   THEN c END), 0)
             + COALESCE(MAX(CASE WHEN tok = 'window' THEN c END), 0), 6) AS bm25
  FROM contrib GROUP BY doc_id
),
lex AS (
  SELECT doc_id, lex_rank FROM (
    SELECT doc_id,
           ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id ASC) AS lex_rank
    FROM scored
  ) t WHERE lex_rank <= {topn}
),
normed AS (
  SELECT vec_id, embedding, {norm_sql} AS nrm FROM embeddings
),
qv AS (SELECT embedding AS q_emb, nrm AS q_nrm FROM normed WHERE vec_id = 0),
dense_sc AS (
  SELECT b.vec_id AS doc_id,
         ROUND(({dot_sql}) / (qv.q_nrm * b.nrm), 9) AS sim
  FROM normed b CROSS JOIN qv WHERE b.vec_id <> 0
),
den AS (
  SELECT doc_id, dense_rank FROM (
    SELECT doc_id,
           ROW_NUMBER() OVER (ORDER BY sim DESC, doc_id ASC) AS dense_rank
    FROM dense_sc
  ) t WHERE dense_rank <= {topn}
)
SELECT COALESCE(lex.doc_id, den.doc_id) AS doc_id,
       CAST(lex.lex_rank AS BIGINT) AS lex_rank,
       CAST(den.dense_rank AS BIGINT) AS dense_rank,
       ROUND(COALESCE(CAST(1 AS DOUBLE) / ({k} + lex.lex_rank), 0)
           + COALESCE(CAST(1 AS DOUBLE) / ({k} + den.dense_rank), 0), 9)
         AS rrf_score
FROM lex FULL OUTER JOIN den ON lex.doc_id = den.doc_id
ORDER BY rrf_score DESC, doc_id ASC LIMIT 10
"""


_RRF_ORACLE = _RRF_ORACLE_TEMPLATE.format(
    k1=_BM25_K1,
    b=_BM25_B,
    topn=_RRF_TOPN,
    k=_RRF_K,
    norm_sql=norm_unrolled_sql("embedding", _EMB_DIM),
    dot_sql=dot_unrolled_sql("q_emb", "b.embedding", _EMB_DIM),
)


@register(
    "n_hybrid_rrf_fusion",
    oracle=_RRF_ORACLE,
    tags=("N5", "N3", "O2", "W1"),
)
def n_hybrid_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval — reciprocal-rank fusion (RRF, k=60) of a BM25
    lexical arm and a dense cosine arm, the standard first-stage
    retriever of a RAG / contamination-audit pipeline. Assumes the
    id-aligned convention vec_id == doc_id (TESTDATA.md: both are
    0..N-1).

    Scale design: each arm reduces to a bounded candidate list BEFORE
    anything global happens — `orderBy().limit(topn)` plans as
    TakeOrderedAndProject (per-partition partial top-k, no full sort
    shuffle), and only the <=topn survivors enter the single-partition
    rank window (bounded by construction, same contract as the top-k
    queries). The fusion join is a full outer join of two <=topn-row
    sides; the dense arm broadcasts the 1-row probe vector
    (bounded BNLJ, allowlisted). RRF scores are computed from integer
    ranks by identical IEEE double expressions on both engines, so the
    hash compare is exact."""
    # Lexical arm: BM25 candidates.
    scored = _bm25_scored_df(spark, sf_dir)
    lex100 = (
        scored.orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
        .limit(_RRF_TOPN)
    )
    wl = Window.orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
    lex = lex100.select(
        "doc_id", F.row_number().over(wl).cast("long").alias("lex_rank")
    )

    # Dense arm: cosine against the fixed probe (vec_id 0).
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    normed = e.withColumn(
        "nrm",
        F.sqrt(dot_unrolled(F.col("embedding"), F.col("embedding"), _EMB_DIM)),
    )
    qv = normed.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_emb"), F.col("nrm").alias("q_nrm")
    )
    sim = dot_unrolled(F.col("q_emb"), F.col("embedding"), _EMB_DIM) / (
        F.col("q_nrm") * F.col("nrm")
    )
    dense_sc = (
        normed.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(F.col("vec_id").alias("doc_id"), F.round(sim, 9).alias("sim"))
    )
    den100 = (
        dense_sc.orderBy(F.col("sim").desc(), F.col("doc_id").asc())
        .limit(_RRF_TOPN)
    )
    wd = Window.orderBy(F.col("sim").desc(), F.col("doc_id").asc())
    den = den100.select(
        "doc_id", F.row_number().over(wd).cast("long").alias("dense_rank")
    )

    # Fusion: RRF from the two rank lists.
    fused = lex.join(den, "doc_id", "full")
    rrf = F.round(
        F.coalesce(F.lit(1.0) / (F.lit(_RRF_K) + F.col("lex_rank")), F.lit(0.0))
        + F.coalesce(
            F.lit(1.0) / (F.lit(_RRF_K) + F.col("dense_rank")), F.lit(0.0)
        ),
        9,
    )
    return (
        fused.select("doc_id", "lex_rank", "dense_rank", rrf.alias("rrf_score"))
        .orderBy(F.col("rrf_score").desc(), F.col("doc_id").asc())
        .limit(10)
    )


# --- bigram language-model scoring (perplexity-style quality filter) --------

_LM_ORACLE = """
WITH toks AS (
  SELECT doc_id, STRING_SPLIT(LOWER(text), ' ') AS t FROM documents
),
bigrams AS (
  SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
  FROM toks, UNNEST(GENERATE_SERIES(1, LEN(t) - 1)) AS g(i)
),
c2 AS (SELECT w1, w2, COUNT(*) AS c12 FROM bigrams GROUP BY w1, w2),
c1 AS (SELECT w1, COUNT(*) AS c1 FROM bigrams GROUP BY w1),
v  AS (SELECT COUNT(DISTINCT w1) AS v FROM (
         SELECT w1 FROM bigrams UNION ALL SELECT w2 FROM bigrams)),
scored AS (
  SELECT b.doc_id,
         CAST(ROUND(LN((c2.c12 + 1) / CAST(c1.c1 + v.v AS DOUBLE)) * 1000000)
              AS BIGINT) AS lp_micro
  FROM bigrams b
  JOIN c2 ON b.w1 = c2.w1 AND b.w2 = c2.w2
  JOIN c1 ON b.w1 = c1.w1
  CROSS JOIN v
)
SELECT doc_id,
       COUNT(*)                        AS n_bigrams,
       CAST(SUM(lp_micro) AS BIGINT)   AS logprob_micro,
       CAST(FLOOR(SUM(lp_micro) / CAST(COUNT(*) AS DOUBLE)) AS BIGINT)
         AS avg_logprob_micro
FROM scored
WHERE doc_id < 100
GROUP BY doc_id
"""


@register("n_bigram_lm_score", oracle=_LM_ORACLE, tags=("N5", "A1", "F4"))
def n_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-style quality scoring with a corpus-trained bigram LM
    (add-one smoothing): p(w2|w1) = (c(w1,w2)+1)/(c(w1)+V), per-doc
    score = sum of log-probs. The CCNet/KenLM filtering recipe with the
    LM trained in-engine. Determinism across engines: each bigram's
    log-prob is rounded to integer MICRO-NATS first, so the per-doc sum
    is exact integer arithmetic — float addition order never matters.
    Count tables join back on the bigram key (unhinted: vocabulary² is
    not broadcastable at crawl scale); the corpus shuffles twice (count,
    score-join), both on the same derived keys. The exploded bigram
    table feeds FOUR consumers (c2, c1, V, the score join), so it is
    materialized once to scratch parquet — without that, Spark
    re-tokenizes the corpus per consumer (a CTE is not a
    materialization barrier); same artifact discipline as the MinHash
    signature table."""
    from ..sources import scratch_dir

    d = load_table(spark, sf_dir, "documents")
    t = F.split(F.lower(F.col("text")), " ")
    bigrams_path = scratch_dir(sf_dir, "bigram_table")
    d.select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.slice(t, 1, F.greatest(F.size(t) - 1, F.lit(0))),
                F.slice(t, 2, F.greatest(F.size(t) - 1, F.lit(0))),
            )
        ).alias("bg"),
    ).select(
        "doc_id", F.col("bg.0").alias("w1"), F.col("bg.1").alias("w2")
    ).write.mode("overwrite").parquet(bigrams_path)
    bigrams = spark.read.parquet(bigrams_path)
    c2 = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = bigrams.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    v = (
        bigrams.select(F.col("w1").alias("w"))
        .unionAll(bigrams.select(F.col("w2").alias("w")))
        .agg(F.count_distinct("w").alias("v"))
    )
    scored = (
        bigrams.join(c2, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(v))
        .select(
            "doc_id",
            F.round(
                F.log((F.col("c12") + 1) / (F.col("c1") + F.col("v")).cast("double"))
                * 1000000
            )
            .cast("long")
            .alias("lp_micro"),
        )
    )
    return (
        scored.filter(F.col("doc_id") < 100)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("lp_micro").cast("long").alias("logprob_micro"),
            F.floor(F.sum("lp_micro") / F.count(F.lit(1)).cast("double"))
            .cast("long")
            .alias("avg_logprob_micro"),
        )
    )


# --- character-entropy quality signal ---------------------------------------

_ENTROPY_ORACLE = """
WITH chars AS (
  SELECT doc_id, UNNEST(STRING_SPLIT(LOWER(text), '')) AS ch
  FROM documents WHERE doc_id < 200
),
counts AS (
  SELECT doc_id, ch, COUNT(*) AS c FROM chars GROUP BY doc_id, ch
),
totals AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n FROM counts GROUP BY doc_id
),
terms AS (
  SELECT c.doc_id,
         CAST(ROUND(-(c.c / CAST(t.n AS DOUBLE))
                    * LN(c.c / CAST(t.n AS DOUBLE)) * 1000000) AS BIGINT)
           AS h_micro
  FROM counts c JOIN totals t ON c.doc_id = t.doc_id
)
SELECT e.doc_id,
       t.n                                  AS n_chars_total,
       CAST(SUM(h_micro) AS BIGINT)         AS entropy_micro_nats
FROM terms e JOIN totals t ON e.doc_id = t.doc_id
GROUP BY e.doc_id, t.n
"""


@register("n_char_entropy", oracle=_ENTROPY_ORACLE, tags=("N5", "A1"))
def n_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level Shannon entropy per document — the cheap
    gibberish/encoding-junk detector (random bytes score high, repeated
    padding scores low; natural language sits in a narrow band). Same
    float-determinism recipe as the bigram LM: each character class
    contributes -p·ln(p) rounded to integer micro-nats, the per-doc
    total is an exact integer sum, so aggregation order is irrelevant.
    Shape: explode to chars → two stacked aggregations on doc_id — the
    heavy combine is map-side partial, and the result is one row per
    document."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    chars = d.select(
        "doc_id", F.explode(F.split(F.lower(F.col("text")), "")).alias("ch")
    )
    counts = chars.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("c"))
    totals = counts.groupBy("doc_id").agg(F.sum("c").cast("long").alias("n"))
    p = F.col("c") / F.col("n").cast("double")
    terms = counts.join(totals, "doc_id").select(
        "doc_id",
        "n",
        F.round(-p * F.log(p) * 1000000).cast("long").alias("h_micro"),
    )
    return terms.groupBy("doc_id", F.col("n").alias("n_chars_total")).agg(
        F.sum("h_micro").cast("long").alias("entropy_micro_nats")
    )


# --- end-to-end pretraining corpus pipeline (v2: six stages) ----------------

_PRETRAIN_ORACLE = f"""
WITH corpus AS (
  SELECT doc_id, text, lang FROM documents
  UNION ALL
  SELECT doc_id + 100000, UPPER(text), lang FROM documents WHERE doc_id % 3 = 0
),
deduped AS (
  SELECT doc_id, text, lang FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY SHA256(LOWER(TRIM(text))) ORDER BY doc_id) AS rn
    FROM corpus
  ) WHERE rn = 1
),
redacted AS (
  SELECT doc_id, lang,
         REGEXP_REPLACE(text || CASE WHEN doc_id % 5 = 0
             THEN ' contact user' || doc_id || '@example.com' ELSE '' END,
             '{_EMAIL_RE}', '<EMAIL>', 'g') AS text
  FROM deduped
),
gated AS (
  SELECT doc_id, lang, text,
         LEN(STRING_SPLIT(LOWER(text), ' ')) AS n_tok,
         LEN(LIST_DISTINCT(STRING_SPLIT(LOWER(text), ' '))) AS n_distinct
  FROM redacted
),
kept AS (
  SELECT doc_id, lang, n_tok,
         CASE WHEN (doc_id * 2654435761) % 100 < 80 THEN 'train'
              WHEN (doc_id * 2654435761) % 100 < 90 THEN 'val'
              ELSE 'test' END AS split
  FROM gated
  WHERE n_tok BETWEEN 30 AND 100000
    AND n_distinct / CAST(n_tok AS DOUBLE) >= 0.20
),
input_counts AS (SELECT COUNT(*) AS n_input FROM corpus)
SELECT k.split, k.lang,
       COUNT(*)                    AS n_docs,
       CAST(SUM(k.n_tok) AS BIGINT) AS total_tokens,
       MIN(k.doc_id)               AS first_doc,
       (SELECT n_input FROM input_counts) AS n_input_corpus
FROM kept k
GROUP BY k.split, k.lang
"""


@register(
    "pipeline_pretrain_corpus",
    oracle=_PRETRAIN_ORACLE,
    tags=("N1", "N5", "P6", "P7"),
)
def pipeline_pretrain_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full raw-crawl → training-shards composition, six stages in
    one lazy plan: (1) corpus with planted case-mangled duplicates,
    (2) exact dedup (normalized-hash keep-min-id), (3) PII redaction
    (seeded emails masked), (4) quality gate (token-count bounds +
    distinct-word floor on the REDACTED text — order matters and the
    oracle pins it), (5) deterministic 80/10/10 split by id hash,
    (6) per-(split, lang) accounting with the input size carried along.
    Catalyst fuses the map-side stages (redact, gate, split) into the
    dedup shuffle's output: the corpus moves through exactly THREE
    exchanges (scan fan-out, dedup hash, final group) no matter how
    many logical stages compose — the input-size scalar is computed
    straight from the base table so the corpus branch is never
    recomputed for bookkeeping."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    corpus = d.unionByName(
        d.filter(F.col("doc_id") % 3 == 0).select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.upper("text").alias("text"),
            "lang",
        )
    ).repartition(spark.sparkContext.defaultParallelism)

    w = Window.partitionBy(F.sha2(F.lower(F.trim(F.col("text"))), 256)).orderBy(
        "doc_id"
    )
    deduped = (
        corpus.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    seeded = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(F.lit(" contact user"), F.col("doc_id"), F.lit("@example.com")),
        ).otherwise(F.lit("")),
    )
    redacted = deduped.withColumn(
        "text", F.regexp_replace(seeded, F.lit(_EMAIL_RE), F.lit("<EMAIL>"))
    )
    toks = F.split(F.lower(F.col("text")), " ")
    gated = redacted.select(
        "doc_id",
        "lang",
        F.size(toks).alias("n_tok"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
    )
    bucket = (F.col("doc_id") * 2654435761) % 100
    kept = gated.filter(
        F.col("n_tok").between(30, 100000)
        & (F.col("n_distinct") / F.col("n_tok").cast("double") >= 0.20)
    ).withColumn(
        "split",
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test"),
    )
    # Input size from the base table arithmetic — NOT count(corpus),
    # which would re-run the union+repartition branch just to count it.
    n_input = d.agg(
        (F.count(F.lit(1)) + F.count_if(F.col("doc_id") % 3 == 0)).alias(
            "n_input_corpus"
        )
    )
    return (
        kept.groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("long").alias("total_tokens"),
            F.min("doc_id").alias("first_doc"),
        )
        .crossJoin(F.broadcast(n_input))
    )


# --- tokenizer vocabulary coverage (OOV rate) -------------------------------

_VOCAB_K = 1000

_VOCAB_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, UNNEST(STRING_SPLIT(LOWER(text), ' ')) AS tok FROM documents
),
vocab AS (
  SELECT tok FROM (
    SELECT tok, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, tok ASC) AS rnk
    FROM toks GROUP BY tok
  ) t WHERE rnk <= {_VOCAB_K}
),
flagged AS (
  SELECT t.doc_id, v.tok IS NOT NULL AS in_vocab
  FROM toks t LEFT JOIN vocab v ON t.tok = v.tok
)
SELECT doc_id,
       COUNT(*)                               AS n_tokens,
       COUNT(*) FILTER (WHERE NOT in_vocab)   AS n_oov,
       ROUND(COUNT(*) FILTER (WHERE NOT in_vocab)
             / CAST(COUNT(*) AS DOUBLE), 6)   AS oov_rate
FROM flagged
WHERE doc_id < 100
GROUP BY doc_id
"""


@register("n_vocab_coverage", oracle=_VOCAB_ORACLE, tags=("N5", "A1", "J3"))
def n_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocabulary coverage: build the top-1000-token vocab
    from the corpus (deterministic rank: count DESC, token ASC), then
    score every document's out-of-vocabulary rate against it — the
    measurement that decides whether a tokenizer/vocab fits a corpus
    before burning GPU-hours. The vocab is bounded (top-K) so its join
    side broadcasts; the corpus explodes once. OOV flags come from a
    LEFT join (an inner join would silently drop the OOV tokens being
    counted)."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(tokens("text")).alias("tok"))
    # The global rank window runs over the vocabulary-sized aggregate,
    # not the corpus — single-reducer on metadata, same as the offsets
    # table in global_ids.
    vocab = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("__n"))
        .withColumn("rnk", F.row_number().over(Window.orderBy(F.col("__n").desc(), F.col("tok").asc())))
        .filter(F.col("rnk") <= _VOCAB_K)
        .select("tok", F.lit(True).alias("in_vocab"))
    )
    flagged = toks.filter(F.col("doc_id") < 100).join(
        F.broadcast(vocab), "tok", "left"
    )
    oov = F.count_if(F.col("in_vocab").isNull())
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        oov.alias("n_oov"),
        F.round(oov / F.count(F.lit(1)).cast("double"), 6).alias("oov_rate"),
    )


# --- dataset card summary ---------------------------------------------------

_CARD_ORACLE = """
WITH stats AS (
  SELECT lang,
         COUNT(*) AS n_docs,
         CAST(SUM(LEN(STRING_SPLIT(LOWER(text), ' '))) AS BIGINT) AS total_tokens,
         CAST(SUM(n_chars) AS BIGINT) AS total_chars,
         COUNT(DISTINCT source) AS n_sources
  FROM documents GROUP BY lang
),
tot AS (SELECT SUM(n_docs) AS all_docs, SUM(total_tokens) AS all_tokens FROM stats)
SELECT s.lang, s.n_docs, s.total_tokens, s.total_chars, s.n_sources,
       ROUND(s.n_docs / CAST(t.all_docs AS DOUBLE), 6)       AS doc_share,
       ROUND(s.total_tokens / CAST(t.all_tokens AS DOUBLE), 6) AS token_share,
       CAST(FLOOR(s.total_tokens / CAST(s.n_docs AS DOUBLE)) AS BIGINT)
                                                             AS avg_doc_tokens
FROM stats s CROSS JOIN tot t
"""


@register("n_dataset_card", oracle=_CARD_ORACLE, tags=("N5", "A2"))
def n_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-card summary — the documentation table every released
    corpus ships: per-language doc/token/char totals, source diversity,
    corpus shares, and floor-divided average length. One aggregation
    plus a broadcast totals join; the output is card-sized regardless
    of corpus size. Shares are ratios of exact integer sums rounded
    once, so the card reproduces bit-identically on any engine."""
    d = load_table(spark, sf_dir, "documents")
    stats = d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count_whitespace("text")).cast("long").alias("total_tokens"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.count_distinct("source").alias("n_sources"),
    )
    tot = stats.agg(
        F.sum("n_docs").alias("all_docs"),
        F.sum("total_tokens").alias("all_tokens"),
    )
    return stats.crossJoin(F.broadcast(tot)).select(
        "lang", "n_docs", "total_tokens", "total_chars", "n_sources",
        F.round(F.col("n_docs") / F.col("all_docs").cast("double"), 6).alias(
            "doc_share"
        ),
        F.round(
            F.col("total_tokens") / F.col("all_tokens").cast("double"), 6
        ).alias("token_share"),
        F.floor(F.col("total_tokens") / F.col("n_docs").cast("double"))
        .cast("long")
        .alias("avg_doc_tokens"),
    )


# --- CCNet-style language x quality-band matrix ------------------------------

_BANDS_ORACLE = """
WITH scored AS (
  SELECT doc_id, lang,
         LEN(STRING_SPLIT(LOWER(text), ' ')) AS n_tok,
         LEAST(CAST(LEN(STRING_SPLIT(LOWER(text), ' ')) AS DOUBLE) / 60.0, 1.0) * 0.5
         + (LEN(LIST_DISTINCT(STRING_SPLIT(LOWER(text), ' ')))
            / CAST(LEN(STRING_SPLIT(LOWER(text), ' ')) AS DOUBLE)) * 0.4
         + LEAST(((LENGTH(text) - (LEN(STRING_SPLIT(LOWER(text), ' ')) - 1))
                  / CAST(LEN(STRING_SPLIT(LOWER(text), ' ')) AS DOUBLE)) / 10.0, 1.0) * 0.1
           AS quality
  FROM documents
)
SELECT lang,
       CASE WHEN quality >= 0.85 THEN 'head'
            WHEN quality >= 0.75 THEN 'middle'
            ELSE 'tail' END AS band,
       COUNT(*)                   AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS total_tokens
FROM scored
GROUP BY lang, band
"""


@register("n_lang_quality_bands", oracle=_BANDS_ORACLE, tags=("N5", "P6", "A1"))
def n_lang_quality_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style corpus partitioning: every document lands in a
    (language, quality-band) cell — head/middle/tail by the
    bit-deterministic quality heuristic — with doc and token counts per
    cell. This matrix is how web corpora are actually released and
    sampled (train on head+middle, hold tail for ablation); the band
    threshold comparison happens on the exact shared formula, so cell
    membership is identical on every engine."""
    d = load_table(spark, sf_dir, "documents")
    band = (
        F.when(quality_score("text") >= 0.85, "head")
        .when(quality_score("text") >= 0.75, "middle")
        .otherwise("tail")
    )
    return d.groupBy("lang", band.alias("band")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count_whitespace("text")).cast("long").alias("total_tokens"),
    )


_IMPORTANCE_ORACLE = """
WITH toks AS (
  SELECT doc_id, lang, UNNEST(STRING_SPLIT(LOWER(text), ' ')) AS tok
  FROM documents
),
corpus_counts AS (SELECT tok, COUNT(*) AS c_all FROM toks GROUP BY tok),
corpus_total  AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_all FROM toks),
target_counts AS (SELECT tok, COUNT(*) AS c_tgt FROM toks WHERE lang = 'en' GROUP BY tok),
target_total  AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_tgt FROM toks WHERE lang = 'en'),
vocab         AS (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS v FROM toks),
scored AS (
  SELECT t.doc_id,
         CAST(ROUND(
           (LN((COALESCE(tc.c_tgt, 0) + 1) / CAST(tt.n_tgt + vv.v AS DOUBLE))
            - LN((cc.c_all + 1) / CAST(ct.n_all + vv.v AS DOUBLE))) * 1000000
         ) AS BIGINT) AS lr_micro
  FROM toks t
  JOIN corpus_counts cc USING (tok)
  LEFT JOIN target_counts tc USING (tok)
  CROSS JOIN corpus_total ct
  CROSS JOIN target_total tt
  CROSS JOIN vocab vv
  WHERE t.doc_id < 200
)
SELECT doc_id,
       COUNT(*) AS n_toks,
       CAST(SUM(lr_micro) AS BIGINT) AS logratio_micro,
       CAST(FLOOR(SUM(lr_micro) / CAST(COUNT(*) AS DOUBLE)) AS BIGINT)
         AS avg_logratio_micro
FROM scored
GROUP BY doc_id
"""


@register("n_importance_weights", oracle=_IMPORTANCE_ORACLE, tags=("N5", "A1", "P6"))
def n_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection: score every document by the mean
    unigram log-likelihood RATIO between a target distribution (here:
    the English slice, standing in for 'looks like the domain I want')
    and the whole corpus, both add-one smoothed over the shared
    vocabulary. Documents whose tokens are relatively more probable
    under the target get positive scores — the importance-resampling
    signal used to pick pretraining data that matches a target domain
    without training a classifier.

    Engine mechanics: the token table feeds four consumers (corpus
    counts, corpus total, target counts, the scoring join), so it is
    materialized once to scratch parquet — same artifact discipline as
    the bigram LM. Count tables join on the token key (vocabulary-sized,
    unhinted — not broadcastable at crawl scale); scalar totals ride a
    broadcast cross join. Each token's log-ratio is rounded to integer
    MICRO-NATS before the per-doc sum, so float addition order never
    matters and the result is bit-deterministic."""
    from ..sources import scratch_dir

    d = load_table(spark, sf_dir, "documents")
    toks_path = scratch_dir(sf_dir, "importance_toks")
    d.select(
        "doc_id", "lang", F.explode(F.split(F.lower(F.col("text")), " ")).alias("tok")
    ).write.mode("overwrite").parquet(toks_path)
    toks = spark.read.parquet(toks_path)

    corpus_counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c_all"))
    corpus_total = toks.agg(F.count(F.lit(1)).cast("long").alias("n_all"))
    target = toks.filter(F.col("lang") == "en")
    target_counts = target.groupBy("tok").agg(F.count(F.lit(1)).alias("c_tgt"))
    target_total = target.agg(F.count(F.lit(1)).cast("long").alias("n_tgt"))
    vocab = toks.agg(F.count_distinct("tok").cast("long").alias("v"))

    lr = (
        F.log((F.coalesce(F.col("c_tgt"), F.lit(0)) + 1) / (F.col("n_tgt") + F.col("v")).cast("double"))
        - F.log((F.col("c_all") + 1) / (F.col("n_all") + F.col("v")).cast("double"))
    )
    scored = (
        toks.filter(F.col("doc_id") < 200)
        .join(corpus_counts, "tok")
        .join(target_counts, "tok", "left")
        .crossJoin(F.broadcast(corpus_total))
        .crossJoin(F.broadcast(target_total))
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            F.round(lr * 1000000).cast("long").alias("lr_micro"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_toks"),
        F.sum("lr_micro").cast("long").alias("logratio_micro"),
        F.floor(F.sum("lr_micro") / F.count(F.lit(1)).cast("double"))
        .cast("long")
        .alias("avg_logratio_micro"),
    )


# --- Misra-Gries heavy hitters: mergeable top-terms without full shuffle ----


@register("n_heavy_hitters_sketch", oracle=None, tags=("N5", "A4", "U5"))
def n_heavy_hitters_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 corpus terms from a mergeable Misra-Gries sketch
    (capacity 50 per partition): one map-side Arrow-batched pass emits
    <= 51 rows per partition, the only shuffle aggregates those tiny
    summaries — the 100 TB alternative to the full token groupBy, whose
    exact counts are joined back HERE only as self-validation.

    Rows-only by design: counter values depend on partition/batch
    arrival order (deterministic within an environment, not across
    layouts). The sketch's two provable invariants ride every row as
    `under_ok` (estimate never exceeds the true count) and `err_ok`
    (undercount bounded by the summed per-partition dropped mass) —
    plus `bound_useful` pinning that the error bound is small enough
    to order the true heavy hitters at this scale."""
    from pyspark.sql.functions import broadcast

    from ..operators.sketches import DROPS_SENTINEL, mg_partial_counters

    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.select(F.explode(F.split(F.lower("text"), r"\s+")).alias("term"))
        .filter(F.length("term") > 0)
    )
    partials = mg_partial_counters(toks, "term", capacity=50)
    drops = partials.filter(F.col("term") == DROPS_SENTINEL).agg(
        F.sum("est").alias("max_err")
    )
    ests = (
        partials.filter(F.col("term") != DROPS_SENTINEL)
        .groupBy("term")
        .agg(F.sum("est").alias("est"))
    )
    exact = toks.groupBy("term").agg(F.count(F.lit(1)).alias("n_exact"))
    return (
        ests.join(exact, "term")
        .crossJoin(broadcast(drops))
        .select(
            "term",
            "est",
            "n_exact",
            "max_err",
            (F.col("est") <= F.col("n_exact")).alias("under_ok"),
            (F.col("n_exact") - F.col("est") <= F.col("max_err")).alias("err_ok"),
            (F.col("max_err") < F.col("n_exact")).alias("bound_useful"),
        )
        .orderBy(F.col("est").desc(), F.col("term"))
        .limit(20)
    )


# --- Count-Min sketch: mergeable point-frequency estimates ------------------


@register("n_countmin_sketch", oracle=None, tags=("N5", "A4", "F7"))
def n_countmin_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min point-frequency estimates for the top-20 corpus terms,
    d=4 rows x w=1024 buckets — the OVERcounting mergeable-sketch
    complement to the Misra-Gries UNDERcounting sketch above.

    Spark-first shape: a CMS in a distributed engine IS a groupBy —
    bucket = xxhash64(term, row_seed) % w, and the cell array is just
    COUNT(*) per (row, bucket), built in ONE pass by exploding each
    token into its 4 (row, bucket) coordinates. Cells merge across
    partitions/shards by plain addition (map-side combine does this
    for free), which is the sketch's entire distributed-systems value:
    at 100 TB the 4x1024 cell table is bytes per shard, mergeable by
    union+sum without touching tokens again. Point query = MIN over
    the term's 4 cells. No UDF anywhere — whole plan is Catalyst.

    Rows-only by design (a sketch estimate has no SQL oracle); exact
    counts join back only as self-validation:
      * over_ok  — est >= exact (CMS never undercounts: every
                   occurrence of the term lands in all 4 its cells);
      * err_ok   — est - exact <= 16 * N / w, a deterministic pin with
                   ~8x headroom over the observed collision mass at all
                   three driver scale factors (the probabilistic CMS
                   bound is e*N/w per row; min-of-4 rows collapses it).
    """
    d = 4
    w = 1024
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.lower("text"), r"\s+")).alias("term")
    ).filter(F.length("term") > 0)

    coords = F.array(
        *[
            F.struct(
                F.lit(r).alias("row"),
                F.pmod(F.xxhash64("term", F.lit(r)), F.lit(w)).alias("bucket"),
            )
            for r in range(d)
        ]
    )
    cells = (
        toks.select(F.explode(coords).alias("c"))
        .groupBy(F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cell"))
    )
    total = toks.agg(F.count(F.lit(1)).alias("n_total"))

    top = (
        toks.groupBy("term")
        .agg(F.count(F.lit(1)).alias("n_exact"))
        .orderBy(F.col("n_exact").desc(), "term")
        .limit(20)
    )
    probes = top.select(
        "term", "n_exact", F.explode(coords).alias("c")
    ).select("term", "n_exact", F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket"))
    return (
        probes.join(cells, ["row", "bucket"])
        .groupBy("term", "n_exact")
        .agg(F.min("cell").alias("est"))
        .crossJoin(F.broadcast(total))
        .select(
            "term",
            "n_exact",
            "est",
            "n_total",
            (F.col("est") >= F.col("n_exact")).alias("over_ok"),
            (
                F.col("est") - F.col("n_exact") <= F.expr(f"(16 * n_total) div {w}")
            ).alias("err_ok"),
        )
        .orderBy(F.col("n_exact").desc(), "term")
    )


_BPE_PAIRS_ORACLE = """
WITH wf AS (
  SELECT w, COUNT(*) AS freq FROM (
    SELECT UNNEST(STRING_SPLIT(LOWER(text), ' ')) AS w FROM documents
  ) WHERE LENGTH(w) >= 2 GROUP BY w
),
pairs AS (
  SELECT SUBSTRING(wf.w, CAST(gs.i AS INTEGER), 2) AS pair, wf.freq
  FROM wf, UNNEST(GENERATE_SERIES(1, LENGTH(wf.w) - 1)) AS gs(i)
),
counts AS (SELECT pair, CAST(SUM(freq) AS BIGINT) AS n_pairs FROM pairs GROUP BY pair)
SELECT pair, n_pairs FROM counts ORDER BY n_pairs DESC, pair ASC LIMIT 40
"""


@register("n_bpe_pair_counts", oracle=_BPE_PAIRS_ORACLE, tags=("N5", "A1", "O2"))
def n_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First BPE merge iteration: the corpus-wide adjacent-symbol-pair
    statistics a tokenizer trainer computes before every merge — the
    top-40 candidate merges by weighted pair count.

    Scale design: the pair table is built from the WORD-FREQUENCY
    table, not the raw token stream — the classic BPE-trainer trick.
    The corpus collapses to |vocab| rows first (one combinable
    count shuffle), then each distinct word fans out to only
    len(word)-1 pairs, so the second aggregation is over
    O(|vocab| * avg_len) rows no matter how many times each word
    occurs in the corpus. Both aggregations are map-side combinable;
    the final top-40 is a TakeOrderedAndProject (no global sort), and
    the tie at the cut is broken by pair text so the LIMIT is
    deterministic on both engines."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select(F.explode(tokens("text")).alias("w")).filter(F.length("w") >= 2)
    wf = words.groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
    pairs = wf.select(
        "freq",
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair"),
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("freq").alias("n_pairs"))
        .orderBy(F.col("n_pairs").desc(), F.col("pair").asc())
        .limit(40)
    )


_ROUGE_ORACLE = """
WITH prs AS (
  SELECT doc_id AS cand_id,
         LEAD(doc_id) OVER (PARTITION BY lang, source ORDER BY doc_id) AS ref_id
  FROM documents
),
pr AS (SELECT cand_id, ref_id FROM prs WHERE ref_id IS NOT NULL),
toks AS (
  SELECT DISTINCT doc_id, UNNEST(STRING_SPLIT(LOWER(text), ' ')) AS term
  FROM documents
),
sizes AS (SELECT doc_id, COUNT(*) AS n_terms FROM toks GROUP BY doc_id),
ov AS (
  SELECT p.cand_id, p.ref_id, COUNT(*) AS n_overlap
  FROM pr p
  JOIN toks c ON c.doc_id = p.cand_id
  JOIN toks r ON r.doc_id = p.ref_id AND r.term = c.term
  GROUP BY p.cand_id, p.ref_id
)
SELECT p.cand_id, p.ref_id,
       COALESCE(o.n_overlap, 0) AS n_overlap,
       sc.n_terms AS n_cand, sr.n_terms AS n_ref,
       ROUND(CAST(COALESCE(o.n_overlap, 0) AS DOUBLE) / sc.n_terms, 6) AS rouge1_precision,
       ROUND(CAST(COALESCE(o.n_overlap, 0) AS DOUBLE) / sr.n_terms, 6) AS rouge1_recall,
       ROUND(2.0 * COALESCE(o.n_overlap, 0) / (sc.n_terms + sr.n_terms), 6) AS rouge1_f1
FROM pr p
LEFT JOIN ov o ON o.cand_id = p.cand_id AND o.ref_id = p.ref_id
JOIN sizes sc ON sc.doc_id = p.cand_id
JOIN sizes sr ON sr.doc_id = p.ref_id
"""


@register("n_rouge_ngram_overlap", oracle=_ROUGE_ORACLE, tags=("N5", "J3", "W2"))
def n_rouge_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROUGE-1 (distinct-unigram overlap) between each document and its
    successor within the same (lang, source) shard — the set-overlap
    eval metric (summary-vs-reference, prompt-vs-completion leakage
    scoring) expressed as pure joins.

    Scale design: candidate/reference pairing is a lead() window (one
    shuffle on the shard key, no self-join over documents); overlap is
    counted by joining the per-doc DISTINCT-token table to itself ON
    (pair, term) — fan-out is bounded by tokens-per-doc, never
    corpus-quadratic. Precision/recall/F1 are each a single IEEE
    division of exact integers (ROUGE-1 F1 reduces to 2*o/(c+r)), so
    rounding to 6 dp is engine-stable."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang", "source").orderBy("doc_id")
    pr = (
        d.select(
            F.col("doc_id").alias("cand_id"),
            F.lead("doc_id").over(w).alias("ref_id"),
        )
        .filter(F.col("ref_id").isNotNull())
    )
    toks = d.select(
        "doc_id", F.explode(F.array_distinct(tokens("text"))).alias("term")
    )
    sizes = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_terms"))
    ct = toks.select(F.col("doc_id").alias("cand_id"), "term")
    rt = toks.select(F.col("doc_id").alias("ref_id"), "term")
    ov = (
        pr.join(ct, "cand_id")
        .join(rt, ["ref_id", "term"])
        .groupBy("cand_id", "ref_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    n_ov = F.coalesce("n_overlap", F.lit(0))
    return (
        pr.join(ov, ["cand_id", "ref_id"], "left")
        .join(sizes.select(F.col("doc_id").alias("cand_id"), F.col("n_terms").alias("n_cand")), "cand_id")
        .join(sizes.select(F.col("doc_id").alias("ref_id"), F.col("n_terms").alias("n_ref")), "ref_id")
        .select(
            "cand_id",
            "ref_id",
            n_ov.alias("n_overlap"),
            "n_cand",
            "n_ref",
            F.round(n_ov.cast("double") / F.col("n_cand"), 6).alias("rouge1_precision"),
            F.round(n_ov.cast("double") / F.col("n_ref"), 6).alias("rouge1_recall"),
            F.round(F.lit(2.0) * n_ov / (F.col("n_cand") + F.col("n_ref")), 6).alias("rouge1_f1"),
        )
    )


# ---------------------------------------------------------------------------
# Token co-occurrence PMI over documents
# ---------------------------------------------------------------------------

_PMI_ORACLE = """
WITH doc_tok AS (
  SELECT DISTINCT doc_id, UNNEST(STRING_SPLIT(LOWER(text), ' ')) AS term
  FROM documents
),
df AS (
  SELECT term, COUNT(*) AS c FROM doc_tok GROUP BY term
),
vocab AS (
  SELECT term, c FROM df
  ORDER BY c DESC, term
  LIMIT 100
),
n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM doc_tok),
kept AS (
  SELECT t.doc_id, t.term, v.c
  FROM doc_tok t JOIN vocab v ON t.term = v.term
),
pairs AS (
  SELECT a.term AS term_a, b.term AS term_b,
         MAX(a.c) AS c_a, MAX(b.c) AS c_b, COUNT(*) AS c_ab
  FROM kept a JOIN kept b ON a.doc_id = b.doc_id
  WHERE a.term < b.term
  GROUP BY a.term, b.term
  HAVING COUNT(*) >= 3
)
SELECT term_a, term_b, c_a, c_b, c_ab,
       CAST(ROUND(LN(c_ab * CAST(n.n_docs AS DOUBLE) / (c_a * c_b))
                  * 1000000) AS BIGINT) AS pmi_micro
FROM pairs CROSS JOIN n
ORDER BY pmi_micro DESC, term_a, term_b
LIMIT 30
"""


@register(
    "n_cooccurrence_pmi",
    oracle=_PMI_ORACLE,
    tags=("N5", "J10", "A1", "O2"),
)
def n_cooccurrence_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information of token pairs co-occurring in the
    same document — the collocation detector ("strong coffee" vs
    chance co-occurrence) behind phrase mining and word-association
    features. Top-30 pairs by PMI among the top-100 document-frequency
    vocabulary, with c_ab ≥ 3 support.

    Scale design mirrors `a_market_basket_lift`'s apriori posture:
    the VOCAB CAP comes first (top-100 by df, deterministic tie-break)
    so the doc-keyed pair join fans out at most |vocab-hits-per-doc|²
    — bounded by the cap, never by document length; the df table joins
    unhinted (vocabulary-sized at crawl scale — the n_vocab_coverage
    posture). PMI = ln(c_ab·N/(c_a·c_b)) is rounded to integer
    micro-nats at the leaf, so ordering and hash are integer-exact.
    """
    d = load_table(spark, sf_dir, "documents")
    doc_tok = d.select(
        "doc_id", F.explode(tokens("text")).alias("term")
    ).dropDuplicates(["doc_id", "term"])
    df_counts = doc_tok.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    vocab = df_counts.orderBy(F.col("c").desc(), "term").limit(100)
    n_docs = doc_tok.agg(F.countDistinct("doc_id").alias("n_docs"))
    kept = doc_tok.join(vocab, "term")
    a = kept.alias("a")
    b = kept.alias("b")
    pairs = (
        a.join(b, "doc_id")
        .filter(F.col("a.term") < F.col("b.term"))
        .groupBy(
            F.col("a.term").alias("term_a"), F.col("b.term").alias("term_b")
        )
        .agg(
            F.max("a.c").alias("c_a"),
            F.max("b.c").alias("c_b"),
            F.count(F.lit(1)).alias("c_ab"),
        )
        .filter(F.col("c_ab") >= 3)
    )
    return (
        pairs.crossJoin(F.broadcast(n_docs))
        .select(
            "term_a",
            "term_b",
            "c_a",
            "c_b",
            "c_ab",
            F.round(
                F.log(
                    F.col("c_ab")
                    * F.col("n_docs").cast("double")
                    / (F.col("c_a") * F.col("c_b"))
                )
                * 1000000
            )
            .cast("long")
            .alias("pmi_micro"),
        )
        .orderBy(F.col("pmi_micro").desc(), "term_a", "term_b")
        .limit(30)
    )


# ---------------------------------------------------------------------------
# n-gram novelty rate (memorization / generalization check)
# ---------------------------------------------------------------------------

_NOVELTY_K = 5

_NOVELTY_ORACLE = f"""
WITH split AS (
  SELECT doc_id, lang, STRING_SPLIT(LOWER(text), ' ') AS toks,
         (doc_id * 48271) % 100 < 80 AS is_train
  FROM documents
),
train_sh AS (
  SELECT DISTINCT
         ARRAY_TO_STRING(LIST_SLICE(toks, i, i + {_NOVELTY_K} - 1), ' ') AS sh
  FROM (SELECT toks FROM split WHERE is_train),
       UNNEST(GENERATE_SERIES(1, GREATEST(LEN(toks) - {_NOVELTY_K} + 1, 1)))
         AS t(i)
),
test_sh AS (
  SELECT DISTINCT doc_id, lang,
         ARRAY_TO_STRING(LIST_SLICE(toks, i, i + {_NOVELTY_K} - 1), ' ') AS sh
  FROM (SELECT doc_id, lang, toks FROM split WHERE NOT is_train),
       UNNEST(GENERATE_SERIES(1, GREATEST(LEN(toks) - {_NOVELTY_K} + 1, 1)))
         AS t(i)
),
flagged AS (
  SELECT e.lang, e.doc_id, e.sh,
         t.sh IS NULL AS novel
  FROM test_sh e LEFT JOIN train_sh t ON e.sh = t.sh
)
SELECT lang,
       COUNT(DISTINCT doc_id) AS n_test_docs,
       COUNT(*) AS tot_shingles,
       CAST(SUM(CASE WHEN novel THEN 1 ELSE 0 END) AS BIGINT)
         AS novel_shingles,
       CAST(SUM(CASE WHEN novel THEN 1 ELSE 0 END) * 1000000 // COUNT(*)
            AS BIGINT) AS novelty_ppm
FROM flagged
GROUP BY lang
ORDER BY lang
"""


@register(
    "n_ngram_novelty_rate",
    oracle=_NOVELTY_ORACLE,
    tags=("N5", "N2", "J5", "A1"),
)
def n_ngram_novelty_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram novelty of a held-out split against the training corpus:
    the fraction of each test document's distinct 5-token shingles
    never seen in training — the memorization/generalization metric
    behind "is the eval set actually novel?" checks (the complement of
    `n_contamination_check`: that flags overlap pairs, this measures
    the aggregate novelty rate per language).

    Scale: the shingle explode is map-only (the word_shingles
    codegen); the membership test is ONE digest-keyed LEFT join of
    test shingles against the DISTINCT train shingle set — never
    doc×doc; the train set joins unhinted because at crawl scale it is
    corpus-sized (the n_vocab_coverage posture). Ratios are exact
    integer ppm.
    """
    from ..operators.dedup import word_shingles

    d = load_table(spark, sf_dir, "documents")
    split = d.select(
        "doc_id",
        "lang",
        tokens("text").alias("toks"),
        ((F.col("doc_id") * 48271) % 100 < 80).alias("is_train"),
    )
    train_sh = (
        split.filter("is_train")
        .select(F.explode(word_shingles(F.col("toks"), _NOVELTY_K)).alias("sh"))
        .dropDuplicates()
    )
    test_sh = (
        split.filter(~F.col("is_train"))
        .select(
            "doc_id",
            "lang",
            F.explode(word_shingles(F.col("toks"), _NOVELTY_K)).alias("sh"),
        )
        .dropDuplicates(["doc_id", "sh"])
    )
    flagged = test_sh.join(
        train_sh.withColumnRenamed("sh", "tsh"),
        test_sh.sh == F.col("tsh"),
        "left",
    ).select("lang", "doc_id", F.col("tsh").isNull().alias("novel"))
    return (
        flagged.groupBy("lang")
        .agg(
            F.countDistinct("doc_id").alias("n_test_docs"),
            F.count(F.lit(1)).alias("tot_shingles"),
            F.sum(F.when(F.col("novel"), 1).otherwise(0))
            .cast("long")
            .alias("novel_shingles"),
        )
        .select(
            "lang",
            "n_test_docs",
            "tot_shingles",
            "novel_shingles",
            F.expr(
                "CAST(novel_shingles * 1000000 DIV tot_shingles AS BIGINT)"
            ).alias("novelty_ppm"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Inverted index build (retrieval-infrastructure shape)
# ---------------------------------------------------------------------------

_INVIDX_ORACLE = """
WITH tok AS (
  SELECT doc_id, UNNEST(STRING_SPLIT(LOWER(text), ' ')) AS term
  FROM documents
),
stats AS (
  SELECT term,
         COUNT(DISTINCT doc_id) AS df,
         COUNT(*) AS cf,
         ARRAY_TO_STRING(
           LIST_SLICE(LIST_SORT(LIST(DISTINCT doc_id)), 1, 10), ',')
           AS postings_head
  FROM tok GROUP BY term
)
SELECT term, df, cf, postings_head
FROM stats
ORDER BY df DESC, term
LIMIT 50
"""


@register(
    "n_inverted_index_build",
    oracle=_INVIDX_ORACLE,
    tags=("N5", "A9", "A3", "O2"),
)
def n_inverted_index_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index construction: term → (document frequency,
    collection frequency, head of the sorted posting list) — the build
    step under `n_bm25_retrieval`'s scoring, shown as its own operator
    because index BUILDING is the batch-engine job (serving is not).
    Top-50 terms by df, postings truncated to 10 doc_ids and emitted
    as a comma-joined STRING (arrays never reach checked output — the
    round-3 canonicalizer lesson).

    Scale: ONE term-keyed combinable aggregation builds every posting
    list in parallel — `collect_set` is the per-term reducer and its
    size is bounded here by the truncation; a full-corpus index would
    instead range-bucket doc_ids per term (posting-list sharding) to
    cap reducer memory, the standard segment layout. Sorting happens
    INSIDE the array (array_sort on the collected set), not as a
    global sort.
    """
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokens("text")).alias("term"))
    stats = tok.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df"),
        F.count(F.lit(1)).alias("cf"),
        F.array_join(
            F.slice(F.array_sort(F.collect_set("doc_id")), 1, 10), ","
        ).alias("postings_head"),
    )
    return stats.orderBy(F.col("df").desc(), "term").limit(50)


# ---------------------------------------------------------------------------
# Tokenizer fertility (BPE-ish tokens per whitespace word, per lang)
# ---------------------------------------------------------------------------

_FERTILITY_ORACLE = r"""
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(LEN(STRING_SPLIT(LOWER(text), ' '))) AS BIGINT) AS ws_tokens,
       CAST(SUM(LEN(REGEXP_EXTRACT_ALL(LOWER(text),
                    '[a-z]+|[0-9]+|[^a-z0-9\s]'))) AS BIGINT) AS bpe_tokens,
       CAST(SUM(LEN(REGEXP_EXTRACT_ALL(LOWER(text),
                    '[a-z]+|[0-9]+|[^a-z0-9\s]'))) * 1000000
            // SUM(LEN(STRING_SPLIT(LOWER(text), ' '))) AS BIGINT)
         AS fertility_ppm
FROM documents
GROUP BY lang
ORDER BY lang
"""


@register(
    "n_tokenizer_fertility",
    oracle=_FERTILITY_ORACLE,
    tags=("N5", "A1", "F1"),
)
def n_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language: BPE-ish tokens emitted per
    whitespace word (×1e6) — the compression-quality metric that
    decides whether a tokenizer is fair across languages (high
    fertility = a language pays more sequence length for the same
    text; the standard argument for vocab rebalancing). Uses the
    repo's two token counters (operators/text.py) so the ratio is
    consistent with `n_token_count`.

    Scale: pure map (both counts are regexp/split evaluations fused
    into the scan) + one combinable groupBy(lang); ratio in exact
    integer ppm.
    """
    d = load_table(spark, sf_dir, "documents")
    from ..operators.text import token_count_bpe_ish, token_count_whitespace

    counts = d.select(
        "lang",
        token_count_whitespace("text").alias("ws"),
        token_count_bpe_ish("text").alias("bpe"),
    )
    return (
        counts.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ws").cast("long").alias("ws_tokens"),
            F.sum("bpe").cast("long").alias("bpe_tokens"),
        )
        .select(
            "lang",
            "n_docs",
            "ws_tokens",
            "bpe_tokens",
            F.expr(
                "CAST(bpe_tokens * 1000000 DIV ws_tokens AS BIGINT)"
            ).alias("fertility_ppm"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Sentence segmentation stats
# ---------------------------------------------------------------------------

_SENTENCE_ORACLE = """
WITH sent AS (
  SELECT lang, doc_id,
         LIST_FILTER(regexp_split_to_array(LOWER(text), '[.!?]+'),
                     s -> LEN(TRIM(s)) > 0) AS sents
  FROM documents
),
per_doc AS (
  SELECT lang, doc_id, LEN(sents) AS n_sents,
         CAST(LIST_SUM(LIST_TRANSFORM(sents,
              s -> LEN(STRING_SPLIT(TRIM(s), ' ')))) AS BIGINT) AS n_words
  FROM sent
)
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_sents) AS BIGINT) AS tot_sentences,
       CAST(SUM(n_words) AS BIGINT) AS tot_words,
       CAST(SUM(n_words) * 1000000 // SUM(n_sents) AS BIGINT)
         AS words_per_sentence_ppm,
       MAX(n_sents) AS max_sents_per_doc
FROM per_doc
GROUP BY lang
ORDER BY lang
"""


@register(
    "n_sentence_stats",
    oracle=_SENTENCE_ORACLE,
    tags=("N5", "F1", "F4", "A1"),
)
def n_sentence_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence segmentation statistics per language: sentence counts,
    word totals, and mean sentence length (integer ppm) from a
    punctuation-rule splitter ([.!?]+) — the readability/structure
    features quality classifiers consume alongside `n_quality_score`'s
    character-level ratios (very long or very short mean sentences
    both flag extraction garbage).

    Scale: pure map — the split and the per-sentence word counts are
    higher-order array expressions fused into the scan (bounded by
    document length, no explode row blow-up), then one combinable
    groupBy(lang). Both engines apply the identical regex class and
    the identical empty-segment filter.
    """
    d = load_table(spark, sf_dir, "documents")
    sents = F.filter(
        F.split(F.lower("text"), r"[.!?]+"),
        lambda s: F.length(F.trim(s)) > 0,
    )
    per_doc = d.select(
        "lang",
        F.size(sents).alias("n_sents"),
        F.aggregate(
            F.transform(sents, lambda s: F.size(F.split(F.trim(s), " "))),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("n_words"),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_sents").cast("long").alias("tot_sentences"),
            F.sum("n_words").cast("long").alias("tot_words"),
            F.max("n_sents").alias("max_sents_per_doc"),
        )
        .select(
            "lang",
            "n_docs",
            "tot_sentences",
            "tot_words",
            F.expr(
                "CAST(tot_words * 1000000 DIV tot_sentences AS BIGINT)"
            ).alias("words_per_sentence_ppm"),
            "max_sents_per_doc",
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# T5-style span-corruption planning statistics
# ---------------------------------------------------------------------------

_SPAN_ORACLE = """
WITH per_doc AS (
  SELECT lang,
         LEN(STRING_SPLIT(LOWER(text), ' ')) AS n_tok
  FROM documents
),
planned AS (
  SELECT lang, n_tok,
         ((n_tok - 1) // 7) + 1 AS n_spans,
         3 * (((n_tok - 1) // 7) + 1 - 1)
           + LEAST(3, n_tok - (7 * (((n_tok - 1) // 7) + 1 - 1) + 1) + 1)
           AS n_masked
  FROM per_doc WHERE n_tok >= 1
)
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS tot_tokens,
       CAST(SUM(n_masked) AS BIGINT) AS tot_masked,
       CAST(SUM(n_spans) AS BIGINT) AS tot_sentinels,
       CAST(SUM(n_masked) * 1000000 // SUM(n_tok) AS BIGINT)
         AS mask_ratio_ppm,
       CAST(SUM(n_tok - n_masked + n_spans) AS BIGINT)
         AS tot_corrupted_len
FROM planned
GROUP BY lang
ORDER BY lang
"""


@register(
    "n_span_corruption_stats",
    oracle=_SPAN_ORACLE,
    tags=("N5", "A1", "F3", "P2"),
)
def n_span_corruption_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style span-corruption planning: with deterministic mask spans
    (3 tokens starting at every 7th position), the per-language token,
    mask, and sentinel totals plus the achieved mask ratio (target
    ≈3/7·…≈ the 15%-class regimes) and the corrupted sequence length
    (original − masked + one sentinel per span) — the budgeting pass
    that sizes encoder/decoder lengths before any tokenization compute
    is spent.

    The span layout has a CLOSED FORM (span count = ⌊(n−1)/7⌋+1; only
    the last span can truncate), so the whole plan is per-row integer
    arithmetic — pure map, no explode, fuses into the scan; one
    combinable groupBy(lang) aggregates. Positive-only floor division
    keeps Spark DIV and DuckDB // in agreement.
    """
    d = load_table(spark, sf_dir, "documents")
    per_doc = d.select(
        "lang", token_count_whitespace("text").alias("n_tok")
    ).filter(F.col("n_tok") >= 1)
    n_spans = F.expr("((n_tok - 1) DIV 7) + 1")
    planned = per_doc.select(
        "lang",
        "n_tok",
        n_spans.alias("n_spans"),
        (
            3 * (n_spans - 1)
            + F.least(F.lit(3), F.col("n_tok") - (7 * (n_spans - 1) + 1) + 1)
        ).alias("n_masked"),
    )
    return (
        planned.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("long").alias("tot_tokens"),
            F.sum("n_masked").cast("long").alias("tot_masked"),
            F.sum("n_spans").cast("long").alias("tot_sentinels"),
            F.sum(
                F.col("n_tok") - F.col("n_masked") + F.col("n_spans")
            )
            .cast("long")
            .alias("tot_corrupted_len"),
        )
        .select(
            "lang",
            "n_docs",
            "tot_tokens",
            "tot_masked",
            "tot_sentinels",
            F.expr(
                "CAST(tot_masked * 1000000 DIV tot_tokens AS BIGINT)"
            ).alias("mask_ratio_ppm"),
            "tot_corrupted_len",
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Code-vs-prose detection score
# ---------------------------------------------------------------------------

_CODE_ORACLE = r"""
WITH feats AS (
  SELECT doc_id, lang, n_chars,
         LEN(REGEXP_EXTRACT_ALL(text, '[{}();=\[\]<>]')) AS n_codechars,
         LEN(REGEXP_EXTRACT_ALL(text,
             'def |class |import |return |void |int |const |var |function '))
           AS n_keywords,
         LEN(STRING_SPLIT(text, CHR(10))) AS n_lines
  FROM documents
),
scored AS (
  SELECT doc_id, lang,
         CAST(n_codechars * 1000000 // GREATEST(n_chars, 1) AS BIGINT)
           AS symbol_density_ppm,
         n_keywords, n_lines,
         CAST(n_codechars * 1000000 // GREATEST(n_chars, 1) AS BIGINT) >= 20000
           OR n_keywords >= 3 AS looks_like_code
  FROM feats
)
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN looks_like_code THEN 1 ELSE 0 END) AS BIGINT)
         AS n_code_docs,
       CAST(SUM(symbol_density_ppm) // COUNT(*) AS BIGINT)
         AS mean_symbol_density_ppm,
       CAST(SUM(n_keywords) AS BIGINT) AS tot_keywords
FROM scored
GROUP BY lang
ORDER BY lang
"""


@register(
    "n_code_detection_score",
    oracle=_CODE_ORACLE,
    tags=("N5", "F1", "A1", "P6"),
)
def n_code_detection_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-vs-prose detection: per-document symbol density (braces,
    brackets, assignment/comparison glyphs per character, integer ppm)
    and programming-keyword hits, rolled up per language — the routing
    signal that decides whether a crawl document goes to the code
    pipeline (different dedup, different quality gates, different
    tokenizer) or the prose pipeline. A pure heuristic like
    `n_langid`, and honestly so: the 2%-density / 3-keyword thresholds
    are the tunable bits.

    Scale: regexp counters are map-only and fuse into the scan; one
    combinable groupBy(lang). All ratios exact integer ppm with
    GREATEST guards against empty docs.
    """
    d = load_table(spark, sf_dir, "documents")
    feats = d.select(
        "doc_id",
        "lang",
        "n_chars",
        F.regexp_count(F.col("text"), F.lit(r"[{}();=\[\]<>]")).alias(
            "n_codechars"
        ),
        F.regexp_count(
            F.col("text"),
            F.lit(
                "def |class |import |return |void |int |const |var "
                "|function "
            ),
        ).alias("n_keywords"),
    )
    scored = feats.select(
        "lang",
        F.expr(
            "CAST(n_codechars * 1000000 DIV GREATEST(n_chars, 1) AS BIGINT)"
        ).alias("symbol_density_ppm"),
        "n_keywords",
    ).withColumn(
        "looks_like_code",
        (F.col("symbol_density_ppm") >= 20000) | (F.col("n_keywords") >= 3),
    )
    return (
        scored.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("looks_like_code"), 1).otherwise(0))
            .cast("long")
            .alias("n_code_docs"),
            F.sum("symbol_density_ppm").cast("long").alias("_sum_density"),
            F.sum("n_keywords").cast("long").alias("tot_keywords"),
        )
        .select(
            "lang",
            "n_docs",
            "n_code_docs",
            F.expr("CAST(_sum_density DIV n_docs AS BIGINT)").alias(
                "mean_symbol_density_ppm"
            ),
            "tot_keywords",
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Content-policy blocklist filter
# ---------------------------------------------------------------------------

_BLOCKLIST_RE = "slow|error|fail"

_BLOCKLIST_ORACLE = f"""
WITH flagged AS (
  SELECT lang, doc_id,
         LEN(REGEXP_EXTRACT_ALL(LOWER(text), '{_BLOCKLIST_RE}')) AS n_hits
  FROM documents
)
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN n_hits > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_quarantined,
       CAST(SUM(n_hits) AS BIGINT) AS tot_hits,
       CAST(SUM(CASE WHEN n_hits > 0 THEN 1 ELSE 0 END) * 1000000
            // COUNT(*) AS BIGINT) AS quarantine_rate_ppm
FROM flagged
GROUP BY lang
ORDER BY lang
"""


@register(
    "n_blocklist_filter",
    oracle=_BLOCKLIST_ORACLE,
    tags=("N5", "F1", "A1", "P6"),
)
def n_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-policy blocklist screening: documents matching any term
    of a policy regex are counted into a per-language quarantine rate
    — the FIRST, cheapest layer of a safety-filtering stack (regex
    blocklists catch the unambiguous cases; classifier scores handle
    nuance) and the same operational shape as `n_pii_redaction`
    (count/flag) pointed at policy terms instead of PII. The terms
    here are corpus-vocabulary stand-ins; the pipeline shape — one
    alternation regex, compiled once, streamed over the scan — is what
    a real blocklist of thousands of terms uses (regex trie / Aho-
    Corasick at that size, still map-only).

    Scale: pure-map regexp counter fused into the scan + one
    combinable groupBy(lang); integer ppm rate.
    """
    d = load_table(spark, sf_dir, "documents")
    flagged = d.select(
        "lang",
        F.regexp_count(F.lower("text"), F.lit(_BLOCKLIST_RE)).alias("n_hits"),
    )
    return (
        flagged.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("n_hits") > 0, 1).otherwise(0))
            .cast("long")
            .alias("n_quarantined"),
            F.sum("n_hits").cast("long").alias("tot_hits"),
        )
        .select(
            "lang",
            "n_docs",
            "n_quarantined",
            "tot_hits",
            F.expr(
                "CAST(n_quarantined * 1000000 DIV n_docs AS BIGINT)"
            ).alias("quarantine_rate_ppm"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Character-encoding audit (mojibake / control-char detection)
# ---------------------------------------------------------------------------

_ENCODING_ORACLE = """
WITH corpus AS (
  SELECT doc_id, lang, text FROM documents
  UNION ALL
  SELECT doc_id + 600000, lang,
         text || ' corrupt' || CHR(65533) || 'ed Ã¯Â¿Â½ bytes'
  FROM documents WHERE doc_id % 71 = 0
),
audited AS (
  SELECT doc_id, lang,
         LEN(REGEXP_EXTRACT_ALL(text, CHR(65533))) AS n_replacement,
         LEN(REGEXP_EXTRACT_ALL(text, 'Ã[¡-¿]')) AS n_mojibake_pairs,
         doc_id >= 600000 AS planted
  FROM corpus
)
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN n_replacement + n_mojibake_pairs > 0
                THEN 1 ELSE 0 END) AS BIGINT) AS n_suspect,
       CAST(SUM(n_replacement) AS BIGINT) AS tot_replacement_chars,
       CAST(SUM(n_mojibake_pairs) AS BIGINT) AS tot_mojibake_pairs,
       CAST(SUM(CASE WHEN planted THEN 1 ELSE 0 END) AS BIGINT) AS n_planted,
       MIN(CASE WHEN planted
                THEN n_replacement + n_mojibake_pairs > 0 END)
         AS planted_all_caught_ok
FROM audited
GROUP BY lang
ORDER BY lang
"""


@register(
    "n_encoding_audit",
    oracle=_ENCODING_ORACLE,
    tags=("N5", "F1", "A1", "P5"),
)
def n_encoding_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-encoding health audit: per language, documents
    containing U+FFFD replacement characters (a decoder already gave
    up) or UTF-8-as-Latin-1 mojibake signatures (the 'Ã©'-class double
    encoding) — the crawl-ingest gate that catches broken transcoding
    BEFORE it poisons tokenization. Planted corruption (docs ≡0 mod 71
    re-appended with both artifact classes at doc_id+600000) proves
    detector recall: `planted_all_caught_ok` requires every planted
    row flagged.

    Scale: map-only regexp counters over the scan + one combinable
    groupBy(lang); both engines apply identical Unicode literals
    (CHR(65533)/\\ufffd resolve to the same codepoint).
    """
    d = load_table(spark, sf_dir, "documents")
    planted = d.filter(F.col("doc_id") % 71 == 0).select(
        (F.col("doc_id") + 600000).alias("doc_id"),
        "lang",
        F.concat(
            F.col("text"), F.lit(" corrupt�ed Ã¯Â¿Â½ bytes")
        ).alias("text"),
    )
    corpus = d.select("doc_id", "lang", "text").unionByName(planted)
    audited = corpus.select(
        "lang",
        F.regexp_count(F.col("text"), F.lit("�")).alias("n_replacement"),
        F.regexp_count(F.col("text"), F.lit("Ã[¡-¿]")).alias(
            "n_mojibake_pairs"
        ),
        (F.col("doc_id") >= 600000).alias("planted"),
    )
    return (
        audited.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                F.when(
                    F.col("n_replacement") + F.col("n_mojibake_pairs") > 0, 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_suspect"),
            F.sum("n_replacement").cast("long").alias("tot_replacement_chars"),
            F.sum("n_mojibake_pairs").cast("long").alias("tot_mojibake_pairs"),
            F.sum(F.when(F.col("planted"), 1).otherwise(0))
            .cast("long")
            .alias("n_planted"),
            F.min(
                F.when(
                    F.col("planted"),
                    F.col("n_replacement") + F.col("n_mojibake_pairs") > 0,
                )
            ).alias("planted_all_caught_ok"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Suffix-stripping stem normalization (vocab compression)
# ---------------------------------------------------------------------------

_STEM_ORACLE = """
WITH tok AS (
  SELECT lang, UNNEST(STRING_SPLIT(LOWER(text), ' ')) AS term
  FROM documents
),
stemmed AS (
  SELECT lang, term,
         CASE WHEN LEN(term) > 4
              THEN REGEXP_REPLACE(term, '(ing|ed|es|s)$', '')
              ELSE term END AS stem
  FROM tok
)
SELECT lang,
       COUNT(*) AS n_tokens,
       COUNT(DISTINCT term) AS vocab_raw,
       COUNT(DISTINCT stem) AS vocab_stemmed,
       CAST((COUNT(DISTINCT term) - COUNT(DISTINCT stem)) * 1000000
            // COUNT(DISTINCT term) AS BIGINT) AS vocab_reduction_ppm
FROM stemmed
GROUP BY lang
ORDER BY lang
"""


@register(
    "n_stemming_normalize",
    oracle=_STEM_ORACLE,
    tags=("N5", "F1", "A3", "A1"),
)
def n_stemming_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suffix-stripping stem normalization (a Porter-lite single rule:
    drop ing/ed/es/s from tokens longer than 4 chars) and the vocab
    compression it buys per language — the normalization step between
    raw tokens and index/dedup keys that collapses inflection families
    (match/matches/matched/matching → one key). The length guard stops
    short-token mangling; real stacks layer more rules, each another
    regexp_replace in the same map-only chain.

    Scale: explode + one combinable groupBy(lang) carrying two exact
    distinct-counts; the stem itself fuses into the scan. Identical
    anchored regex on both engines.
    """
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("lang", F.explode(tokens("text")).alias("term"))
    stemmed = tok.withColumn(
        "stem",
        F.when(
            F.length("term") > 4,
            F.regexp_replace("term", "(ing|ed|es|s)$", ""),
        ).otherwise(F.col("term")),
    )
    return (
        stemmed.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.countDistinct("term").alias("vocab_raw"),
            F.countDistinct("stem").alias("vocab_stemmed"),
        )
        .select(
            "lang",
            "n_tokens",
            "vocab_raw",
            "vocab_stemmed",
            F.expr(
                "CAST((vocab_raw - vocab_stemmed) * 1000000 DIV vocab_raw"
                " AS BIGINT)"
            ).alias("vocab_reduction_ppm"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Statistical text-watermark detection (greenlist bias test)
# ---------------------------------------------------------------------------

_WATERMARK_ORACLE = """
WITH corpus AS (
  SELECT doc_id, LOWER(text) AS text FROM documents
  UNION ALL
  SELECT doc_id + 700000,
         'key agg row map par fig log sum min max bit hex oct dec val'
  FROM documents WHERE doc_id % 79 = 0
),
toks AS (
  SELECT doc_id, STRING_SPLIT(text, ' ') AS t FROM corpus
),
pairs AS (
  SELECT doc_id,
         UNNEST(GENERATE_SERIES(2, LEN(t))) AS i,
         t
  FROM toks WHERE LEN(t) >= 2
),
scored AS (
  SELECT doc_id,
         CASE WHEN (LEN(t[i - 1]) * 48271 + LEN(t[i]) * 16807) % 2 = 0
              THEN 1 ELSE 0 END AS green
  FROM pairs
),
per_doc AS (
  SELECT doc_id, COUNT(*) AS n,
         CAST(SUM(green) AS BIGINT) AS g
  FROM scored GROUP BY doc_id
)
SELECT doc_id, n, g,
       ROUND((g - n / 2.0) / SQRT(n / 4.0), 6) AS z_score,
       (g - n / 2.0) / SQRT(n / 4.0) > 4 AS watermark_detected,
       doc_id >= 700000 AS planted
FROM per_doc
WHERE n >= 10 AND ((g - n / 2.0) / SQRT(n / 4.0) > 4 OR doc_id >= 700000)
ORDER BY doc_id
"""


@register(
    "n_watermark_detection",
    oracle=_WATERMARK_ORACLE,
    tags=("N5", "F4", "A1", "P6"),
)
def n_watermark_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical text-watermark detection (Kirchenbauer-style
    greenlist test): a watermarking generator biases each token toward
    a 'green list' seeded by the previous token; the detector recounts
    the green fraction and flags docs where the one-proportion z-score
    exceeds 4 — organic text sits at g/n ≈ ½, watermarked text far
    above. The hash here keys on adjacent token LENGTHS (cross-engine
    reproducible; a production detector uses the generator's seeded
    vocab hash — same relational shape), and planted fully-green docs
    (uniform 3-letter tokens at doc_id+700000) prove detector recall
    while the organic corpus shows the false-positive behavior.

    Scale: pair scoring is a higher-order array expression per doc
    (no token explode — the GENERATE_SERIES runs inside the row), one
    combinable per-doc rollup, and a closed-form z per row.
    """
    d = load_table(spark, sf_dir, "documents")
    planted = d.filter(F.col("doc_id") % 79 == 0).select(
        (F.col("doc_id") + 700000).alias("doc_id"),
        F.lit(
            "key agg row map par fig log sum min max bit hex oct dec val"
        ).alias("text"),
    )
    corpus = d.select("doc_id", F.lower("text").alias("text")).unionByName(
        planted
    )
    t = F.split(F.col("text"), " ")
    green_sum = F.aggregate(
        F.sequence(F.lit(2), F.size(t)),
        F.lit(0).cast("long"),
        lambda acc, i: acc
        + F.when(
            (
                F.length(F.element_at(t, i - 1)) * 48271
                + F.length(F.element_at(t, i)) * 16807
            )
            % 2
            == 0,
            1,
        ).otherwise(0),
    )
    per_doc = corpus.filter(F.size(t) >= 2).select(
        "doc_id",
        (F.size(t) - 1).cast("long").alias("n"),
        green_sum.alias("g"),
    )
    z = (F.col("g") - F.col("n") / 2.0) / F.sqrt(F.col("n") / 4.0)
    return (
        per_doc.filter(
            (F.col("n") >= 10) & ((z > 4) | (F.col("doc_id") >= 700000))
        )
        .select(
            "doc_id",
            "n",
            "g",
            F.round(z, 6).alias("z_score"),
            (z > 4).alias("watermark_detected"),
            (F.col("doc_id") >= 700000).alias("planted"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# TF-IDF document-document cosine similarity (sparse lexical near-dup)
# ---------------------------------------------------------------------------

_TFIDF_SIM_ORACLE = """
WITH toks AS (
  SELECT doc_id, UNNEST(STRING_SPLIT(LOWER(text), ' ')) AS tok
  FROM documents WHERE doc_id % 7 = 0
),
tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY doc_id, tok),
df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM tf),
w AS (
  SELECT tf.doc_id, tf.tok,
         CAST(ROUND(tf.tf * (LN((n.n_docs + 1) / CAST(df.df + 1 AS DOUBLE))
                             + 1) * 1000) AS BIGINT) AS w_milli
  FROM tf JOIN df ON tf.tok = df.tok CROSS JOIN n
  WHERE df.df * 5 <= (SELECT n_docs FROM n)
),
norms AS (
  SELECT doc_id, CAST(SUM(w_milli * w_milli) AS BIGINT) AS norm2
  FROM w GROUP BY doc_id
),
dots AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(SUM(a.w_milli * b.w_milli) AS BIGINT) AS dot
  FROM w a JOIN w b ON a.tok = b.tok
  WHERE a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT d.doc_a, d.doc_b, d.dot,
       ROUND(d.dot / (SQRT(CAST(na.norm2 AS DOUBLE))
                      * SQRT(CAST(nb.norm2 AS DOUBLE))), 6) AS cosine
FROM dots d
JOIN norms na ON d.doc_a = na.doc_id
JOIN norms nb ON d.doc_b = nb.doc_id
ORDER BY cosine DESC, d.doc_a, d.doc_b
LIMIT 20
"""


@register(
    "n_tfidf_doc_similarity",
    oracle=_TFIDF_SIM_ORACLE,
    tags=("N5", "N3", "J10", "O2"),
)
def n_tfidf_doc_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse LEXICAL document similarity: tf-idf-weighted cosine over
    a shared-term equi-join — the classic IR doc-doc measure that
    complements the DENSE embedding cosine (`n_cosine_topk`) and the
    SET measures (Jaccard/containment): it finds docs sharing
    distinctive VOCABULARY with term-frequency weighting neither of
    those captures. Top-20 pairs over a doc_id%7 sample.

    Scale posture: the dot products come from a TERM-keyed equi-join
    over the sparse weight table, and the join is bounded by dropping
    COMMON terms first (df ≤ n/5 — a stopword-df cut, the lexical
    analogue of the LSH banding bound: frequent terms generate
    quadratic fan-out and carry no discriminative weight anyway).
    Weights are rounded to integer milli at the leaf, so dots and
    norms² are exact BIGINTs; one double expression normalizes.
    """
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 7 == 0)
    toks = d.select("doc_id", F.explode(tokens("text")).alias("tok"))
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    df_t = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    n = tf.agg(F.countDistinct("doc_id").alias("n_docs"))
    w = (
        tf.join(df_t, "tok")
        .crossJoin(F.broadcast(n))
        .filter(F.col("df") * 5 <= F.col("n_docs"))
        .select(
            "doc_id",
            "tok",
            F.round(
                F.col("tf")
                * (
                    F.log(
                        (F.col("n_docs") + 1) / (F.col("df") + 1).cast("double")
                    )
                    + 1
                )
                * 1000
            )
            .cast("long")
            .alias("w_milli"),
        )
    )
    norms = w.groupBy("doc_id").agg(
        F.sum(F.col("w_milli") * F.col("w_milli")).cast("long").alias("norm2")
    )
    a, b = w.alias("a"), w.alias("b")
    dots = (
        a.join(b, "tok")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(
            F.sum(F.col("a.w_milli") * F.col("b.w_milli"))
            .cast("long")
            .alias("dot")
        )
    )
    na = norms.select(F.col("doc_id").alias("doc_a"), F.col("norm2").alias("n2a"))
    nb = norms.select(F.col("doc_id").alias("doc_b"), F.col("norm2").alias("n2b"))
    return (
        dots.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "dot",
            F.round(
                F.col("dot")
                / (
                    F.sqrt(F.col("n2a").cast("double"))
                    * F.sqrt(F.col("n2b").cast("double"))
                ),
                6,
            ).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), "doc_a", "doc_b")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Sequence-length histogram (context-window planning)
# ---------------------------------------------------------------------------

_SEQLEN_ORACLE = r"""
WITH lens AS (
  SELECT LEN(REGEXP_EXTRACT_ALL(LOWER(text), '[a-z]+|[0-9]+|[^a-z0-9\s]'))
           AS n_tok
  FROM documents
),
bucketed AS (
  SELECT LENGTH(bin(GREATEST(n_tok, 1))) AS bucket, n_tok FROM lens
),
tot AS (SELECT CAST(SUM(n_tok) AS BIGINT) AS all_tok FROM lens)
SELECT bucket,
       CAST(CAST(1 AS BIGINT) << (bucket - 1) AS BIGINT) AS lo_tokens,
       CAST((CAST(1 AS BIGINT) << bucket) - 1 AS BIGINT) AS hi_tokens,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS tokens_in_bucket,
       CAST(SUM(n_tok) * 1000000 // t.all_tok AS BIGINT) AS token_share_ppm
FROM bucketed CROSS JOIN tot t
GROUP BY bucket, t.all_tok
ORDER BY bucket
"""


@register(
    "n_seq_length_histogram",
    oracle=_SEQLEN_ORACLE,
    tags=("N5", "A1", "F3"),
)
def n_seq_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-length distribution in power-of-two buckets — the
    context-window planning table: what fraction of TOKENS (not docs —
    training cost is token-weighted) lives in each length doubling,
    which decides the max_seq_len / packing-budget trade-off
    (`n_token_packing` consumes the budget this query justifies).
    BPE-ish token counts; exact LENGTH(bin()) bucketing (the
    a_log2_histogram rule).

    Scale: map-only counting fused into the scan, a 1-row token total
    broadcast, ≤32 combinable buckets.
    """
    d = load_table(spark, sf_dir, "documents")
    lens = d.select(
        token_count_bpe_ish("text").alias("n_tok")
    )
    bucketed = lens.select(
        F.length(F.bin(F.greatest(F.col("n_tok"), F.lit(1)))).alias("bucket"),
        "n_tok",
    )
    tot = lens.agg(F.sum("n_tok").cast("long").alias("all_tok"))
    return (
        bucketed.crossJoin(F.broadcast(tot))
        .groupBy("bucket", "all_tok")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("long").alias("tokens_in_bucket"),
        )
        .select(
            "bucket",
            F.expr("CAST(shiftleft(1L, bucket - 1) AS BIGINT)").alias(
                "lo_tokens"
            ),
            F.expr("CAST(shiftleft(1L, bucket) - 1 AS BIGINT)").alias(
                "hi_tokens"
            ),
            "n_docs",
            "tokens_in_bucket",
            F.expr(
                "CAST(tokens_in_bucket * 1000000 DIV all_tok AS BIGINT)"
            ).alias("token_share_ppm"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# Prefix autocomplete: top completion per 3-char prefix
# ---------------------------------------------------------------------------

_AUTOCOMPLETE_ORACLE = """
WITH toks AS (
  SELECT UNNEST(STRING_SPLIT(LOWER(text), ' ')) AS term FROM documents
),
terms AS (
  SELECT term, COUNT(*) AS freq
  FROM toks
  WHERE LEN(term) >= 4 AND regexp_matches(term, '^[a-z]+$')
  GROUP BY term
),
ranked AS (
  SELECT SUBSTR(term, 1, 3) AS prefix, term, freq,
         SUM(freq) OVER (PARTITION BY SUBSTR(term, 1, 3)) AS prefix_freq,
         ROW_NUMBER() OVER (PARTITION BY SUBSTR(term, 1, 3)
                            ORDER BY freq DESC, term) AS rn
  FROM terms
)
SELECT prefix, term AS top_completion, freq AS completion_freq,
       CAST(prefix_freq AS BIGINT) AS prefix_freq,
       CAST(freq * 1000000 // prefix_freq AS BIGINT) AS confidence_ppm
FROM ranked
WHERE rn = 1 AND prefix_freq >= 20
ORDER BY prefix
"""


@register(
    "n_autocomplete_prefix_topk",
    oracle=_AUTOCOMPLETE_ORACLE,
    tags=("N5", "W4", "F1", "A1"),
)
def n_autocomplete_prefix_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix → top-completion table, the serving artifact behind
    search-box autocomplete: alphabetic terms roll up to exact corpus
    frequencies, group under their 3-character prefix, and each
    prefix keeps its most frequent completion (ties break
    alphabetically) with an exact-ppm confidence = completion share
    of all prefix traffic. Thin prefixes (<20 total) are dropped, as
    a ranker would.

    Scale: term frequencies are one combinable groupBy over the
    token explode (the only pass touching raw text); the top-1 window
    then runs on the VOCABULARY rolled up by prefix — crawl-scale
    corpora shrink to vocab-sized state before any ordering
    happens. Integer floor-division ppm, no float."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("term")
    )
    terms = (
        toks.filter(
            (F.length("term") >= 4) & F.col("term").rlike("^[a-z]+$")
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    prefixed = terms.select(
        F.substring("term", 1, 3).alias("prefix"), "term", "freq"
    )
    wsum = Window.partitionBy("prefix")
    wrank = Window.partitionBy("prefix").orderBy(
        F.col("freq").desc(), F.col("term")
    )
    ranked = prefixed.select(
        "prefix",
        "term",
        "freq",
        F.sum("freq").over(wsum).alias("prefix_freq"),
        F.row_number().over(wrank).alias("rn"),
    )
    return (
        ranked.filter((F.col("rn") == 1) & (F.col("prefix_freq") >= 20))
        .select(
            "prefix",
            F.col("term").alias("top_completion"),
            F.col("freq").alias("completion_freq"),
            F.col("prefix_freq").cast("long").alias("prefix_freq"),
            F.expr("freq * 1000000 DIV prefix_freq").alias("confidence_ppm"),
        )
        .orderBy("prefix")
    )


# ---------------------------------------------------------------------------
# Hashing-trick featurization (signed feature hashing into 64 buckets)
# ---------------------------------------------------------------------------

_FEATHASH_ORACLE = """
WITH base AS (
  SELECT doc_id, LOWER(text) AS t FROM documents WHERE doc_id % 17 = 0
),
shingles AS (
  SELECT doc_id,
         SUBSTR(t, i, 3) AS sh
  FROM base, UNNEST(GENERATE_SERIES(1, GREATEST(LEN(t) - 2, 0))) AS g(i)
),
coded AS (
  SELECT doc_id,
         ASCII(SUBSTR(sh, 1, 1)) * 961
         + ASCII(SUBSTR(sh, 2, 1)) * 31
         + ASCII(SUBSTR(sh, 3, 1)) AS h
  FROM shingles
  WHERE regexp_matches(sh, '^[a-z]{3}$')
),
feats AS (
  SELECT doc_id, h % 64 AS bucket,
         CAST(SUM(CASE WHEN (h // 64) % 2 = 0 THEN 1 ELSE -1 END)
              AS BIGINT) AS v
  FROM coded GROUP BY doc_id, h % 64
),
nz AS (SELECT * FROM feats WHERE v <> 0)
SELECT doc_id,
       COUNT(*) AS nnz,
       CAST(SUM(v * v) AS BIGINT) AS l2_sq,
       MIN({'na': -ABS(v), 'b': bucket}).b AS top_bucket
FROM nz
GROUP BY doc_id
ORDER BY doc_id
"""


@register(
    "n_feature_hashing",
    oracle=_FEATHASH_ORACLE,
    tags=("N5", "F7", "F1", "A1"),
)
def n_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick featurization: character 3-shingles hash into a
    fixed 64-bucket signed feature space (sign from the hash's next
    bit, the Weinberger et al. collision-debiasing trick) — the
    vocabulary-free featurizer that needs NO fitted dictionary, so a
    100 TB corpus featurizes in one stateless map pass. Per document:
    non-zero bucket count, exact squared L2 norm, dominant bucket
    (|value| argmax, tie → lowest bucket).

    Determinism: the hash is explicit base-31 ASCII arithmetic on
    [a-z]{3} shingles (identical integer math on both engines — no
    engine-native hash whose seeds differ); all aggregates are exact
    integers. Scale: shingle explode → two combinable groupBys, all
    keyed by doc; nothing global."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 17 == 0
    ).select("doc_id", F.lower(F.col("text")).alias("t"))
    shingles = docs.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(1), F.greatest(F.length("t") - 2, F.lit(0)))
        ).alias("i"),
        "t",
    ).select("doc_id", F.expr("substr(t, i, 3)").alias("sh"))
    coded = shingles.filter(F.col("sh").rlike("^[a-z]{3}$")).select(
        "doc_id",
        (
            F.ascii(F.expr("substr(sh, 1, 1)")) * 961
            + F.ascii(F.expr("substr(sh, 2, 1)")) * 31
            + F.ascii(F.expr("substr(sh, 3, 1)"))
        ).alias("h"),
    )
    feats = (
        coded.groupBy("doc_id", (F.col("h") % 64).alias("bucket"))
        .agg(
            F.sum(
                F.when(F.expr("(h DIV 64) % 2 = 0"), 1).otherwise(-1)
            )
            .cast("long")
            .alias("v")
        )
        .filter(F.col("v") != 0)
    )
    return (
        feats.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("nnz"),
            F.sum(F.col("v") * F.col("v")).cast("long").alias("l2_sq"),
            F.min(
                F.struct(
                    (-F.abs(F.col("v"))).alias("na"),
                    F.col("bucket").alias("b"),
                )
            )
            .getField("b")
            .alias("top_bucket"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Heaps' law: vocabulary growth V = K * T^beta fit over the corpus prefix
# ---------------------------------------------------------------------------

_HEAPS_ORACLE = """
WITH toks AS (
  SELECT doc_id, UNNEST(STRING_SPLIT(LOWER(text), ' ')) AS term
  FROM documents
),
tok_per_doc AS (
  SELECT doc_id, COUNT(*) AS n_tok FROM toks GROUP BY doc_id
),
first_occ AS (
  SELECT MIN(doc_id) AS first_doc FROM toks GROUP BY term
),
new_per_doc AS (
  SELECT first_doc AS doc_id, COUNT(*) AS n_new
  FROM first_occ GROUP BY first_doc
),
spine AS (
  SELECT t.doc_id, t.n_tok, COALESCE(n.n_new, 0) AS n_new
  FROM tok_per_doc t LEFT JOIN new_per_doc n ON t.doc_id = n.doc_id
),
cum AS (
  SELECT doc_id,
         SUM(n_tok) OVER (ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS t_cum,
         SUM(n_new) OVER (ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS v_cum
  FROM spine
),
pts AS (
  SELECT CAST(ROUND(LN(CAST(t_cum AS DOUBLE)) * 1000000) AS BIGINT)
           AS x_micro,
         CAST(ROUND(LN(CAST(v_cum AS DOUBLE)) * 1000000) AS BIGINT)
           AS y_micro
  FROM cum
  WHERE doc_id % 25 = 0 AND v_cum > 0
),
stats AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(x_micro) AS BIGINT) AS sx,
         CAST(SUM(y_micro) AS BIGINT) AS sy,
         CAST(SUM(x_micro * y_micro) AS HUGEINT) AS sxy,
         CAST(SUM(x_micro * x_micro) AS HUGEINT) AS sxx
  FROM stats_src
), stats_src AS (SELECT * FROM pts),
tot AS (
  SELECT (SELECT MAX(t_cum) FROM cum) AS total_tokens,
         (SELECT MAX(v_cum) FROM cum) AS vocab_size
)
SELECT s.n AS n_points,
       CAST(t.total_tokens AS BIGINT) AS total_tokens,
       CAST(t.vocab_size AS BIGINT) AS vocab_size,
       ROUND((s.n * s.sxy - s.sx * s.sy)
             / CAST(s.n * s.sxx - s.sx * s.sx AS DOUBLE), 6) AS heaps_beta
FROM stats s CROSS JOIN tot t
"""


@register(
    "n_heaps_law_fit",
    oracle=_HEAPS_ORACLE,
    tags=("N5", "A1", "W3", "F3"),
)
def n_heaps_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps' law fit: vocabulary size grows as V ≈ K·T^β with corpus
    tokens T — the sublinear exponent β (~0.4-0.6 for natural text)
    that capacity-plans tokenizer vocabularies and predicts how much
    NEW vocabulary the next 10x of crawl will add. Per-doc token
    counts and first-occurrence ("new term") counts roll up in one
    combinable pass each; their running sums over corpus order give
    the growth curve; a 1-in-25 systematic sample of milestones feeds
    a log-log OLS (micro-nat leaves → exact BIGINT/HUGEINT sufficient
    statistics, the retention-fit convention).

    Scale note (honest): prefix-cumulative vocabulary growth is
    inherently ordered — the running sums run in ONE partition, but
    over the per-doc rollup (two longs per doc), not over tokens; at
    crawl scale you would run the same windows over coarser milestone
    prefixes."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower(F.col("text")), " ")).alias("term")
    )
    tok_per_doc = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_tok"))
    new_per_doc = (
        toks.groupBy("term")
        .agg(F.min("doc_id").alias("first_doc"))
        .groupBy(F.col("first_doc").alias("doc_id"))
        .agg(F.count(F.lit(1)).alias("n_new"))
    )
    spine = tok_per_doc.join(new_per_doc, "doc_id", "left").select(
        "doc_id", "n_tok", F.coalesce("n_new", F.lit(0)).alias("n_new")
    )
    wcum = Window.orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = spine.select(
        "doc_id",
        F.sum("n_tok").over(wcum).alias("t_cum"),
        F.sum("n_new").over(wcum).alias("v_cum"),
    )
    pts = cum.filter((F.col("doc_id") % 25 == 0) & (F.col("v_cum") > 0)).select(
        F.round(F.log(F.col("t_cum").cast("double")) * 1000000)
        .cast("long")
        .alias("x_micro"),
        F.round(F.log(F.col("v_cum").cast("double")) * 1000000)
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
    tot = cum.agg(
        F.max("t_cum").cast("long").alias("total_tokens"),
        F.max("v_cum").cast("long").alias("vocab_size"),
    )
    nd = F.col("n").cast("decimal(38,0)")
    num = nd * F.col("sxy") - (F.col("sx").cast("decimal(38,0)") * F.col("sy"))
    den = nd * F.col("sxx") - (
        F.col("sx").cast("decimal(38,0)") * F.col("sx")
    )
    return stats.crossJoin(F.broadcast(tot)).select(
        F.col("n").alias("n_points"),
        "total_tokens",
        "vocab_size",
        F.round(num.cast("double") / den.cast("double"), 6).alias(
            "heaps_beta"
        ),
    )


# ---------------------------------------------------------------------------
# Per-language feature-scaler parameter table (min-max / z-score / robust)
# ---------------------------------------------------------------------------

_SCALER_ORACLE = """
WITH stats AS (
  SELECT lang,
         CAST(COUNT(*) AS BIGINT)                 AS n,
         CAST(MIN(n_chars) AS BIGINT)             AS min_chars,
         CAST(MAX(n_chars) AS BIGINT)             AS max_chars,
         CAST(SUM(n_chars) AS BIGINT)             AS s,
         CAST(SUM(n_chars * n_chars) AS BIGINT)   AS ss,
         PERCENTILE_CONT(0.25) WITHIN GROUP (ORDER BY n_chars) AS q25,
         PERCENTILE_CONT(0.50) WITHIN GROUP (ORDER BY n_chars) AS q50,
         PERCENTILE_CONT(0.75) WITHIN GROUP (ORDER BY n_chars) AS q75
  FROM documents
  GROUP BY lang
)
SELECT lang, n, min_chars, max_chars,
       ROUND(CAST(s AS DOUBLE) / n, 6) AS mean_chars,
       ROUND(SQRT((ss - CAST(s AS DOUBLE) * s / n) / (n - 1)), 6) AS std_chars,
       q50 AS median_chars,
       q75 - q25 AS iqr_chars,
       ROUND((1000 - CAST(min_chars AS DOUBLE))
             / (max_chars - min_chars), 6) AS probe_minmax,
       ROUND((1000 - CAST(s AS DOUBLE) / n)
             / SQRT((ss - CAST(s AS DOUBLE) * s / n) / (n - 1)), 6)
         AS probe_zscore,
       ROUND((1000 - q50) / (q75 - q25), 6) AS probe_robust
FROM stats
ORDER BY lang
"""


@register(
    "n_feature_scaling_params",
    oracle=_SCALER_ORACLE,
    tags=("N5", "A1", "A8", "A2"),
)
def n_feature_scaling_params(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language feature-scaler parameter table for the document
    length feature — min-max, z-score, and robust (median/IQR) scaling
    side by side, each also applied to a fixed 1000-char probe so the
    three scalers' different outlier sensitivity is visible in one row.
    This is the fit() half of a fit/transform scaling pipeline: at
    serving time the small parameter table broadcasts onto any fact.

    Scale design — one combinable groupBy(lang) computes every
    parameter in a single pass: min/max/Σx/Σx² are exact BIGINTs;
    the quartiles are percentile_cont order statistics (sort-based
    per group, interpolation a + f*(b-a) identical on both engines,
    proven by a_percentile_cont_disc). The float formulas (std via the
    sufficient-statistics identity, the three probe projections) run
    once per language row, identical expression trees, round-6."""
    d = load_table(spark, sf_dir, "documents")
    stats = d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.sum("n_chars").alias("s"),
        F.sum(F.col("n_chars") * F.col("n_chars")).alias("ss"),
        F.expr("percentile_cont(0.25) WITHIN GROUP (ORDER BY n_chars)").alias("q25"),
        F.expr("percentile_cont(0.50) WITHIN GROUP (ORDER BY n_chars)").alias("q50"),
        F.expr("percentile_cont(0.75) WITHIN GROUP (ORDER BY n_chars)").alias("q75"),
    )
    n, s, ss = F.col("n"), F.col("s"), F.col("ss")
    mean = s.cast("double") / n
    std = F.sqrt((ss - s.cast("double") * s / n) / (n - 1))
    return stats.select(
        "lang",
        "n",
        "min_chars",
        "max_chars",
        F.round(mean, 6).alias("mean_chars"),
        F.round(std, 6).alias("std_chars"),
        F.col("q50").alias("median_chars"),
        (F.col("q75") - F.col("q25")).alias("iqr_chars"),
        F.round(
            (1000 - F.col("min_chars").cast("double"))
            / (F.col("max_chars") - F.col("min_chars")),
            6,
        ).alias("probe_minmax"),
        F.round((1000 - mean) / std, 6).alias("probe_zscore"),
        F.round(
            (1000 - F.col("q50")) / (F.col("q75") - F.col("q25")), 6
        ).alias("probe_robust"),
    ).orderBy("lang")


# ---------------------------------------------------------------------------
# Quality-classifier calibration: reliability table + ECE
# ---------------------------------------------------------------------------

_ECE_ORACLE = """
WITH scored AS (
  SELECT doc_id,
         -- 'confidence' proxy in [0,1]: clamped n_chars/1000, milli units
         CAST(LEAST(n_chars, 1000) AS BIGINT) * 1000000 // 1000 // 1000
           AS conf_milli_raw,
         CASE WHEN LEN(STRING_SPLIT(text, ' ')) >= 80 THEN 1 ELSE 0 END
           AS label
  FROM documents
),
binned AS (
  SELECT conf_milli_raw // 100 AS bin,
         conf_milli_raw, label
  FROM scored
),
per_bin AS (
  SELECT bin,
         CAST(COUNT(*) AS BIGINT) AS n_b,
         CAST(SUM(conf_milli_raw) AS BIGINT) AS conf_sum_milli,
         CAST(SUM(label) AS BIGINT) AS n_pos
  FROM binned GROUP BY bin
),
tot AS (SELECT CAST(SUM(n_b) AS BIGINT) AS n FROM per_bin)
SELECT bin, n_b,
       conf_sum_milli * 1000 // n_b AS mean_conf_micro,
       n_pos * 1000000 // n_b AS obs_rate_micro,
       ABS(conf_sum_milli * 1000 // n_b - n_pos * 1000000 // n_b) * n_b
         // (SELECT n FROM tot) AS ece_contribution_micro
FROM per_bin
ORDER BY bin
"""


@register(
    "n_calibration_ece",
    oracle=_ECE_ORACLE,
    tags=("N5", "A1", "A7"),
)
def n_calibration_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability table for a document-quality 'classifier': documents
    bin by predicted confidence (length-based score in exact
    milli-units), each bin reports mean confidence vs observed positive
    rate, and the per-bin |gap|·n_b/N terms sum to the Expected
    Calibration Error — the audit that decides whether a quality
    score's 0.9 means 90%. A well-calibrated curation threshold needs
    this BEFORE the score gates a 100 TB corpus.

    Determinism — confidence, bin edges, rates and ECE contributions
    are all positive integer floor divisions in milli/micro units; no
    float enters the query. Scale — one combinable pass builds the
    ≤10-row reliability table; the 1-row total broadcasts back for the
    ECE weights."""
    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        F.expr("LEAST(n_chars, 1000) * 1000000 DIV 1000 DIV 1000").alias(
            "conf_milli_raw"
        ),
        F.when(F.size(F.split(F.col("text"), " ")) >= 80, 1)
        .otherwise(0)
        .alias("label"),
    )
    binned = scored.select(
        F.expr("conf_milli_raw DIV 100").alias("bin"),
        "conf_milli_raw",
        "label",
    )
    per_bin = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_b"),
        F.sum("conf_milli_raw").alias("conf_sum_milli"),
        F.sum("label").alias("n_pos"),
    )
    tot = per_bin.agg(F.sum("n_b").alias("n"))
    return (
        per_bin.crossJoin(F.broadcast(tot))
        .select(
            "bin",
            "n_b",
            F.expr("conf_sum_milli * 1000 DIV n_b").alias("mean_conf_micro"),
            F.expr("n_pos * 1000000 DIV n_b").alias("obs_rate_micro"),
            F.expr(
                "ABS(conf_sum_milli * 1000 DIV n_b - n_pos * 1000000 DIV n_b)"
                " * n_b DIV n"
            ).alias("ece_contribution_micro"),
        )
        .orderBy("bin")
    )


# ---------------------------------------------------------------------------
# Chat-turn alternation audit (SFT conversation-format validation)
# ---------------------------------------------------------------------------

_CHAT_AUDIT_ORACLE = """
WITH turns AS (
  SELECT user_id AS conv_id, ts, event_id,
         CASE WHEN event_type IN ('click', 'purchase') THEN 'user'
              WHEN event_type IN ('view', 'signup') THEN 'assistant'
              ELSE 'system' END AS role
  FROM events
),
flagged AS (
  SELECT conv_id, role,
         LAG(role) OVER (PARTITION BY conv_id ORDER BY ts, event_id)
           AS prev_role,
         ROW_NUMBER() OVER (PARTITION BY conv_id ORDER BY ts, event_id)
           AS turn_idx
  FROM turns
),
per_conv AS (
  SELECT conv_id,
         CAST(COUNT(*) AS BIGINT) AS n_turns,
         CAST(SUM(CASE WHEN role <> 'system' AND prev_role = role
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_repeat_violations,
         CAST(SUM(CASE WHEN role = 'system' AND turn_idx > 1
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_misplaced_system,
         CAST(MAX(CASE WHEN turn_idx = 1 AND role = 'assistant'
                       THEN 1 ELSE 0 END) AS BIGINT) AS starts_with_assistant
  FROM flagged
  GROUP BY conv_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_conversations,
       CAST(SUM(n_turns) AS BIGINT) AS total_turns,
       CAST(SUM(CASE WHEN n_repeat_violations = 0 AND n_misplaced_system = 0
                      AND starts_with_assistant = 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_wellformed,
       CAST(SUM(n_repeat_violations) AS BIGINT) AS total_repeat_violations,
       CAST(SUM(n_misplaced_system) AS BIGINT) AS total_misplaced_system,
       CAST(SUM(CASE WHEN n_repeat_violations = 0 AND n_misplaced_system = 0
                      AND starts_with_assistant = 0
                     THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT)
         AS wellformed_ppm
FROM per_conv
"""


@register(
    "n_chat_alternation_audit",
    oracle=_CHAT_AUDIT_ORACLE,
    tags=("N5", "W2", "A1", "P6"),
)
def n_chat_alternation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chat-template validation over event streams recast as
    conversations: roles must alternate (no consecutive same-role
    turns), system turns may only lead, and a conversation must not
    open with the assistant — the structural checks every SFT/RLHF
    ingest runs before a malformed transcript poisons a chat fine-tune.
    Reports total/repeat/misplaced violations and the well-formed rate
    in exact ppm.

    Scale design — one per-conversation lag window (conversations
    co-locate on their shuffle key; state is one previous-role per
    row) and one combinable rollup; the deterministic turn order is
    (ts, event_id) so replays can't reorder ties. Same shape at 100 TB:
    nothing global except the final 1-row summary."""
    e = load_table(spark, sf_dir, "events")
    turns = e.select(
        F.col("user_id").alias("conv_id"),
        "ts",
        "event_id",
        F.when(F.col("event_type").isin("click", "purchase"), "user")
        .when(F.col("event_type").isin("view", "signup"), "assistant")
        .otherwise("system")
        .alias("role"),
    )
    w = Window.partitionBy("conv_id").orderBy("ts", "event_id")
    flagged = turns.select(
        "conv_id",
        "role",
        F.lag("role").over(w).alias("prev_role"),
        F.row_number().over(w).alias("turn_idx"),
    )
    per_conv = flagged.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.sum(
            F.when(
                (F.col("role") != "system") & (F.col("prev_role") == F.col("role")),
                1,
            ).otherwise(0)
        ).alias("n_repeat_violations"),
        F.sum(
            F.when((F.col("role") == "system") & (F.col("turn_idx") > 1), 1).otherwise(
                0
            )
        ).alias("n_misplaced_system"),
        F.max(
            F.when((F.col("turn_idx") == 1) & (F.col("role") == "assistant"), 1)
            .otherwise(0)
        ).alias("starts_with_assistant"),
    )
    wellformed = (
        (F.col("n_repeat_violations") == 0)
        & (F.col("n_misplaced_system") == 0)
        & (F.col("starts_with_assistant") == 0)
    )
    return per_conv.agg(
        F.count(F.lit(1)).alias("n_conversations"),
        F.sum("n_turns").cast("long").alias("total_turns"),
        F.sum(F.when(wellformed, 1).otherwise(0)).alias("n_wellformed"),
        F.sum("n_repeat_violations").cast("long").alias("total_repeat_violations"),
        F.sum("n_misplaced_system").cast("long").alias("total_misplaced_system"),
        F.expr(
            "SUM(CASE WHEN n_repeat_violations = 0 AND n_misplaced_system = 0"
            " AND starts_with_assistant = 0 THEN 1 ELSE 0 END) * 1000000"
            " DIV COUNT(*)"
        ).alias("wellformed_ppm"),
    )


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
