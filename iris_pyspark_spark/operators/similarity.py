"""Vector similarity operators (SURVEY.md §2.10 N3/N4): cosine / dot /
L2 over `array<float>` embedding columns, plus top-k and IVF pruning.

All arithmetic is double-cast higher-order functions — inside Catalyst
codegen, no UDF. The fold order is fixed (left fold, 0.0 init), so
results are bit-deterministic and an oracle can state the identical
fold (DuckDB list_reduce folds left too; 0.0 + x0 == x0 exactly).

Scale design:
  * brute-force top-k = broadcast the (small) query set against the
    corpus → map-side only, then a per-query top-k window;
  * all-pairs self-similarity is quadratic by nature — the scale path
    is IVF (cluster pruning, `ivf_assign`) or MinHash-LSH (dedup.py),
    both of which turn it into an equi-join on a bucket key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ as a left fold in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """dot / (norm_a * norm_b) — stated in exactly this operation order
    everywhere (including oracles)."""
    return dot(a, b) / (norm(a) * norm(b))


def l2_sq(a: Column, b: Column) -> Column:
    """Squared L2 distance via the same fold discipline."""
    return F.aggregate(
        F.zip_with(
            a, b, lambda x, y: (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


#: DuckDB spellings of the identical folds, for oracle SQL.
DOT_SQL = (
    "LIST_REDUCE(LIST_TRANSFORM(LIST_ZIP({a}, {b}), "
    "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (x, y) -> x + y)"
)
NORM_SQL = "SQRT(" + DOT_SQL.format(a="{a}", b="{a}") + ")"


def cosine_sql(a: str, b: str) -> str:
    return (
        DOT_SQL.format(a=a, b=b)
        + " / ("
        + NORM_SQL.format(a=a)
        + " * "
        + NORM_SQL.format(a=b)
        + ")"
    )


def l2_sq_sql(a: str, b: str) -> str:
    return (
        f"LIST_REDUCE(LIST_TRANSFORM(LIST_ZIP({a}, {b}), "
        "p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))), "
        "(x, y) -> x + y)"
    )


def knn_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    q_id: str,
    c_id: str,
    q_vec: str,
    c_vec: str,
    k: int,
    metric: str = "cosine",
) -> DataFrame:
    """Top-k corpus neighbors per query vector. The query side is
    broadcast (it is the small side by construction), so the corpus is
    scanned exactly once, map-side, at any scale; the only shuffle is
    the per-query top-k window over |Q|·|C| candidate rows."""
    sim = (
        cosine(F.col(q_vec), F.col(c_vec))
        if metric == "cosine"
        else -l2_sq(F.col(q_vec), F.col(c_vec))
    )
    pairs = corpus.crossJoin(broadcast(queries)).filter(F.col(q_id) != F.col(c_id))
    w = Window.partitionBy(q_id).orderBy(F.col("sim").desc(), F.col(c_id).asc())
    return (
        pairs.withColumn("sim", sim)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


def ivf_assign(
    vectors: DataFrame, centroids: DataFrame, v_id: str, c_id: str, v_vec: str, c_vec: str
) -> DataFrame:
    """IVF cell assignment: nearest centroid per vector (L2, ties by
    centroid id). Centroids broadcast; one map-side pass over vectors."""
    w = Window.partitionBy(v_id).orderBy(F.col("dist_sq").asc(), F.col(c_id).asc())
    return (
        vectors.crossJoin(broadcast(centroids))
        .withColumn("dist_sq", l2_sq(F.col(v_vec), F.col(c_vec)))
        .withColumn("__rnk", F.row_number().over(w))
        .filter(F.col("__rnk") == 1)
        .drop("__rnk", c_vec)
    )
