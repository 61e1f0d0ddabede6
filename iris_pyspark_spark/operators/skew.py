"""Skew-mitigation operators: salting for hot keys (SURVEY.md §4).

AQE's skew-join split handles most skew at runtime, but it only splits
the probe side of sort-merge joins and does nothing for hot-key
aggregation fan-in. These operators implement the explicit pattern for
the cases AQE can't fix; results are bit-identical to the unsalted
plan (verified by oracle), because the salt only changes WHERE partial
results are computed, not what is summed (integer-cents/count
aggregates are associative-commutative exactly).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    salt_src: str,
    n_salts: int = 8,
) -> DataFrame:
    """Equi-join resilient to hot fact keys: the fact side derives a
    deterministic salt from `salt_src` (any well-distributed column,
    e.g. the fact's primary key), the dim side is exploded n_salts ways,
    and the join runs on (key, salt) — a hot key's rows now spread over
    n_salts shuffle partitions instead of one.

    Cost model: dim is replicated n_salts x (fine for dimension tables;
    for fact-fact joins broadcast the salt range instead). Join output
    equals the plain join exactly — salt is internal and dropped.
    """
    salted_fact = fact.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(salt_src)), F.lit(n_salts))
    )
    salted_dim = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = salted_fact.join(
        salted_dim,
        (F.col(fact_key) == F.col(dim_key)) & (salted_fact["__salt"] == salted_dim["__salt"]),
    )
    return out.drop("__salt")


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: dict[str, Column],
    salt_src: str,
    n_salts: int = 8,
) -> DataFrame:
    """Two-phase hot-key aggregation: partial-aggregate by (key, salt),
    then final-aggregate by key. Both phases apply SUM, so `aggs` must
    map output name → a SUM-decomposable column expression (counts via
    lit(1), integer cents, any exact-associative sum input) — NOT
    min/max/avg, which need different merge functions.

    (Spark's hash aggregate already does map-side partials; explicit
    salting additionally splits the REDUCE side, which matters when one
    key owns a double-digit share of all rows.)
    """
    salt = F.pmod(F.xxhash64(F.col(salt_src)), F.lit(n_salts)).alias("__salt")
    partial = (
        df.select(key, salt, *[c.alias(f"__in_{n}") for n, c in aggs.items()])
        .groupBy(key, "__salt")
        .agg(*[F.sum(f"__in_{n}").alias(f"__p_{n}") for n in aggs])
    )
    return partial.groupBy(key).agg(
        *[F.sum(f"__p_{n}").alias(n) for n in aggs]
    )
