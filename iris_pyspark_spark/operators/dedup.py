"""Deduplication operators (SURVEY.md §2.10 N1/N2): exact, MinHash+LSH,
SimHash, n-gram Jaccard.

All pure DataFrame compositions — hashing via xxhash64/sha2 built-ins,
signatures via higher-order functions, candidate generation via
equi-joins on bucket keys. No Python in the row path, fixed seeds, no
nondeterministic functions → stable output at any parallelism.

Scale design: every near-dup variant reduces the quadratic all-pairs
problem to an equi-join on a derived key (LSH band bucket, SimHash
prefix block, shared token), which Spark shuffles/hash-joins like any
other key — that is the property that survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def normalized_text_hash(text: Column) -> Column:
    """Exact-dedup key: sha256 of lower(trim(text))."""
    return F.sha2(F.lower(F.trim(text)), 256)


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep the smallest id per normalized-text hash; adds `n_copies`."""
    key = normalized_text_hash(F.col(text_col)).alias("__text_hash")
    w = Window.partitionBy("__text_hash")
    ranked = (
        df.withColumn("__text_hash", key)
        .withColumn("__keep", F.min(id_col).over(w))
        .withColumn("n_copies", F.count(F.lit(1)).over(w))
    )
    return ranked.filter(F.col(id_col) == F.col("__keep")).drop("__text_hash", "__keep")


def word_shingles(toks: Column, k: int) -> Column:
    """k-word shingles (contiguous) of a token array."""
    n = F.greatest(F.size(toks) - (k - 1), F.lit(1))
    return F.transform(
        F.sequence(F.lit(1), n), lambda i: F.concat_ws(" ", F.slice(toks, i, k))
    )


def minhash_signature(shingles: Column, num_hashes: int) -> Column:
    """num_hashes-wide MinHash signature: sig[i] = min over shingles of
    xxhash64(shingle, seed=i). Entirely inside codegen (nested HOFs)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda seed: F.array_min(
            F.transform(shingles, lambda s: F.xxhash64(s, seed))
        ),
    )


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_k: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
) -> DataFrame:
    """MinHash-LSH near-dup candidates: docs agreeing on ALL rows of at
    least one band land in the same bucket; the bucket equi-join emits
    (id_a < id_b) pairs with the estimated Jaccard = fraction of equal
    signature components."""
    rows = num_hashes // bands
    toks = F.split(F.lower(F.col(text_col)), " ")
    sig = minhash_signature(word_shingles(toks, shingle_k), num_hashes)

    signed = df.select(F.col(id_col), sig.alias("sig"))
    banded = signed.select(
        id_col,
        "sig",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.concat_ws(",", F.transform(
                        F.slice("sig", b * rows + 1, rows), lambda x: x.cast("string")
                    ))
                ),
            )
        ).alias("band", "band_hash"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    est = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda eq: eq
        )
    ) / F.lit(float(num_hashes))
    return pairs.select("id_a", "id_b", est.alias("est_jaccard"))


#: SimHash as a SQL expression (needs expr(): shiftright's bit-count arg
#: must be a column, which the Python DSL doesn't accept). 64-bit
#: signature: bit j of sig = 1 iff Σ_tokens (±1 by bit j of xxhash64(tok)) > 0.
_SIMHASH_EXPR = """
aggregate(
  sequence(0, 63),
  0L,
  (acc, j) -> acc + IF(
    aggregate({toks}, 0L,
      (s, w) -> s + IF(((xxhash64(w) >> j) & 1) = 1, 1L, -1L)) > 0,
    shiftleft(1L, j), 0L)
)
"""


def simhash64(toks_sql: str) -> Column:
    """64-bit SimHash of a token-array SQL expression."""
    return F.expr(_SIMHASH_EXPR.format(toks=toks_sql))


def simhash_near_pairs(
    df: DataFrame, id_col: str, simhash_col: str, max_hamming: int, block_bits: int = 16
) -> DataFrame:
    """Near-dup pairs by SimHash: block on the top `block_bits` bits
    (equi-join key), then exact Hamming filter inside each block."""
    blocked = df.withColumn(
        "__block", F.shiftright(F.col(simhash_col), 64 - block_bits)
    )
    a, b = blocked.alias("a"), blocked.alias("b")
    hamming = F.bit_count(
        F.col(f"a.{simhash_col}").bitwiseXOR(F.col(f"b.{simhash_col}"))
    )
    return (
        a.join(
            b,
            (F.col("a.__block") == F.col("b.__block"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            "hamming",
        )
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str,
    min_jaccard: float,
) -> DataFrame:
    """Exact word-set Jaccard between doc pairs sharing `block_col`
    (blocking keeps the join linear-ish in block sizes). Integer
    |intersection| / |union| → bit-deterministic double."""
    toks = df.select(
        F.col(id_col),
        F.col(block_col).alias("__block"),
        F.explode(F.array_distinct(F.split(F.lower(F.col(text_col)), " "))).alias("tok"),
    )
    sizes = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_tok"))

    a, b = toks.alias("a"), toks.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.__block") == F.col("b.__block"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_tok").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_tok").alias("n_b"))
    jac = F.col("n_shared") / (
        F.col("n_a") + F.col("n_b") - F.col("n_shared")
    ).cast("double")
    return (
        shared.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= min_jaccard)
        .select("id_a", "id_b", "n_shared", "jaccard")
    )
