"""Corpus text statistics (split from llm_text.py, round 5): PMI,
n-gram novelty, inverted index, tokenizer fertility, sentence/encoding
audits, span corruption, watermark detection, TF-IDF similarity,
feature hashing/scaling, Heaps' law, calibration ECE.

Same determinism and scale discipline as llm_text.py: integer/exact
sufficient statistics first, one float formula per output row, banded
or vocabulary-cut joins only — never all-pairs.
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
       (g - n / 2.0) / SQRT(n / 4.0) > 2.33 AS watermark_detected,
       doc_id >= 700000 AS planted
FROM per_doc
WHERE n >= 10 AND ((g - n / 2.0) / SQRT(n / 4.0) > 2.33 OR doc_id >= 700000)
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
    exceeds 2.33 (the one-sided 99th percentile; short docs cap z at
    sqrt(n), so a threshold above sqrt(min doc length) could NEVER fire
    — the round-5 vacuity audit caught exactly that) — organic text sits at g/n ≈ ½, watermarked text far
    above. The hash here keys on adjacent token LENGTHS (cross-engine
    reproducible; a production detector uses the generator's seeded
    vocab hash — same relational shape), and planted fully-green docs
    (uniform 3-letter tokens at doc_id+700000) prove detector recall
    while the organic corpus shows the false-positive behavior.

    Scale: pair scoring is a map-side posexplode of token lengths plus
    one windowed lag and one combinable per-doc rollup — whole-stage
    codegen end to end. (The earlier per-row higher-order fold evaluated
    INTERPRETED, and Catalyst pushed the z-filter — fold included —
    below the repartition into the single-partition scan, computing the
    fold twice in one task; the aggregation form is both parallel and a
    pushdown barrier.)
    """
    from pyspark.sql.window import Window

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
    toks = corpus.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), " ")).alias("pos", "tok"),
    ).select("doc_id", "pos", F.length("tok").alias("len"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    pair_green = F.when(
        (F.lag("len").over(w) * 48271 + F.col("len") * 16807) % 2 == 0, 1
    ).otherwise(0)
    per_doc = (
        toks.select("doc_id", "pos", pair_green.alias("green"))
        .groupBy("doc_id")
        .agg(
            (F.count(F.lit(1)) - 1).cast("long").alias("n"),
            # lag is NULL on the first token: when() already scores it 0.
            F.sum("green").cast("long").alias("g"),
        )
        .filter(F.col("n") >= 1)
    )
    z = (F.col("g") - F.col("n") / 2.0) / F.sqrt(F.col("n") / 4.0)
    return (
        per_doc.filter(
            (F.col("n") >= 10) & ((z > 2.33) | (F.col("doc_id") >= 700000))
        )
        .select(
            "doc_id",
            "n",
            "g",
            F.round(z, 6).alias("z_score"),
            (z > 2.33).alias("watermark_detected"),
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


