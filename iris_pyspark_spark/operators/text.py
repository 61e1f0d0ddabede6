"""Text-analysis column builders (SURVEY.md north star: language-ID,
quality scoring, token counting, fingerprinting).

Everything here is a pure Column expression over built-in functions —
JVM-side, codegen-friendly, no Python in the hot path. At 100 TB these
run as map-only stages fused into the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Tiny per-language marker lexicons for the n-gram/stopword heuristic.
#: Deterministic by construction; real deployments would swap in proper
#: frequency tables — the operator shape (score-per-language → argmax)
#: is what matters.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "join", "fast"),
    "es": ("slow", "agg", "merge", "vector", "value"),
    "de": ("customer", "hash", "row", "column", "key"),
    "fr": ("scan", "data", "query", "batch", "small"),
    "zh": ("join", "small", "row", "value", "the"),
}


def tokens(text: str | Column) -> Column:
    """Whitespace tokenization of already-normalized text."""
    return F.split(F.lower(text), " ")


def token_count_whitespace(text: str | Column) -> Column:
    return F.size(tokens(text))


def token_count_bpe_ish(text: str | Column) -> Column:
    """BPE-ish token estimate: alpha runs, digit runs, and residual
    non-space symbols each count as one token."""
    return F.regexp_count(F.lower(text), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"))


def marker_hits(toks: Column, markers: tuple[str, ...]) -> Column:
    """How many tokens are in the marker list (with multiplicity)."""
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def predicted_lang(toks: Column) -> Column:
    """argmax over marker scores. array_max on (score, lang) structs →
    on a score tie the LARGEST language code wins; oracles must state
    the same tie-break (CASE checking codes in descending order)."""
    pairs = F.array(
        *[
            F.struct(
                marker_hits(toks, m).alias("score"), F.lit(lang).alias("lang")
            )
            for lang, m in sorted(LANG_MARKERS.items())
        ]
    )
    return F.array_max(pairs).getField("lang")


def quality_score(text: str | Column) -> Column:
    """Composite doc-quality heuristic in [0, ~1.5]: favors mid-length
    docs with diverse vocabulary. Integer counts + fixed-order double
    arithmetic → bit-deterministic."""
    toks = tokens(text)
    n = F.size(toks)
    n_uniq = F.size(F.array_distinct(toks))
    avg_word_len = (F.length(text) - (n - 1)) / n.cast("double")  # total chars sans spaces
    uniq_ratio = n_uniq / n.cast("double")
    length_term = F.least(n.cast("double") / 60.0, F.lit(1.0))
    return length_term * 0.5 + uniq_ratio * 0.4 + F.least(
        avg_word_len / 10.0, F.lit(1.0)
    ) * 0.1


def char_shingles(text: str | Column, k: int = 5) -> Column:
    """All k-char shingles of the text (positions 1..len-k+1)."""
    t = F.col(text) if isinstance(text, str) else text
    n = F.greatest(F.length(t) - (k - 1), F.lit(1))
    return F.transform(F.sequence(F.lit(1), n), lambda i: t.substr(i, F.lit(k)))


def fingerprint_min_md5(text: str | Column, k: int = 5, keep: int = 4) -> Column:
    """Winnowing-style document fingerprint: md5 each k-gram, keep the
    `keep` lexicographically smallest digests, join to one string.
    Pure string ops → identical on any engine with md5."""
    hashed = F.transform(char_shingles(text, k), F.md5)
    return F.array_join(F.slice(F.array_sort(hashed), 1, keep), ",")
