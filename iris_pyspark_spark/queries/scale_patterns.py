"""Scale-pattern queries: the plan shapes that matter at 100 TB, each
oracle-checked to prove the optimized layout computes the identical
result as the naive plan.

  j_salted_skew           — hot-key join via salting (operators/skew.py)
  a_salted_hot_key        — two-phase hot-key aggregation
  j_bucketed_colocated    — bucketed tables joined with NO shuffle
                            (tests/test_plans.py asserts the plan)
  st_stateful_running_count — custom stateful streaming operator via
                            applyInPandasWithState (arbitrary state API)

The skew queries manufacture the skew inline (half of all events get
folded onto one hot user) because the synthetic data is uniform.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import load_table
from ..operators.skew import salted_agg, salted_join
from ..registry import register
from ..sources import scratch_dir
from .joins import CENTS_SQL, cents

#: Skewed key derivation: half of all events collapse onto user 1.
_HOT_SQL = "CASE WHEN user_id % 2 = 0 THEN 1 ELSE user_id END"
def _hot() -> "F.Column":
    return F.when(F.col("user_id") % 2 == 0, F.lit(1)).otherwise(F.col("user_id"))


_SALTED_JOIN_ORACLE = f"""
SELECT c_mktsegment,
       COUNT(*) AS n_events,
       SUM({CENTS_SQL.format(expr="value")}) / 100.0 AS total_value
FROM (SELECT {_HOT_SQL} AS hot_user, value FROM events) e
JOIN customer ON hot_user = c_custkey
GROUP BY c_mktsegment
"""


@register("j_salted_skew", oracle=_SALTED_JOIN_ORACLE, tags=("J1", "skew"))
def j_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key join: 50% of the fact rows share one key; the salted join
    spreads them across 8 shuffle partitions. Result == plain join."""
    e = load_table(spark, sf_dir, "events").select(
        _hot().alias("hot_user"), "event_id", "value"
    )
    c = load_table(spark, sf_dir, "customer")
    joined = salted_join(
        e, c, fact_key="hot_user", dim_key="c_custkey", salt_src="event_id", n_salts=8
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.sum(cents(F.col("value"))) / 100.0).alias("total_value"),
    )


_SALTED_AGG_ORACLE = f"""
SELECT {_HOT_SQL} AS hot_user,
       CAST(SUM(1) AS BIGINT) AS n_events,
       CAST(SUM({CENTS_SQL.format(expr="value")}) AS BIGINT) AS value_cents
FROM events
GROUP BY 1
"""


@register("a_salted_hot_key", oracle=_SALTED_AGG_ORACLE, tags=("A1", "skew"))
def a_salted_hot_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase (salted) aggregation over a 50%-hot key distribution;
    bit-identical to the one-phase plan (long sums are associative)."""
    e = load_table(spark, sf_dir, "events").select(
        _hot().alias("hot_user"), "event_id", "value"
    )
    return salted_agg(
        e,
        key="hot_user",
        aggs={"n_events": F.lit(1).cast("long"), "value_cents": cents(F.col("value"))},
        salt_src="event_id",
        n_salts=8,
    )


_BUCKETED_ORACLE = f"""
SELECT o_orderpriority,
       COUNT(*) AS n_items,
       SUM({CENTS_SQL.format(expr="l_extendedprice * (1 - l_discount)")}) / 100.0
         AS revenue
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderpriority
"""


@register("j_bucketed_colocated", oracle=_BUCKETED_ORACLE, tags=("J1", "bucketing"))
def j_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders and lineitem written as 8-bucket tables on the join key,
    then joined — both sides arrive pre-partitioned, so the join plans
    with NO shuffle exchange (asserted in tests/test_plans.py). At 100 TB
    this converts the recurring fact-fact shuffle into a one-time
    layout cost paid at ingest."""
    sf_tag = sf_dir.rstrip("/").split("/")[-1].replace(".", "_")
    names = {}
    for tbl, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        name = f"bkt_{tbl}_{sf_tag}"
        if not spark.catalog.tableExists(name):
            (
                load_table(spark, sf_dir, tbl)
                .write.bucketBy(8, key)
                .sortBy(key)
                .option("path", scratch_dir(sf_dir, f"bucketed_{tbl}"))
                .mode("overwrite")
                .saveAsTable(name)
            )
        names[tbl] = name
    o = spark.table(names["orders"])
    li = spark.table(names["lineitem"])
    rev = cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            (F.sum(rev) / 100.0).alias("revenue"),
        )
    )


_STATEFUL_ORACLE = """
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(MAX(event_id) AS BIGINT) AS max_event_id
FROM events
GROUP BY event_type
"""

_STATE_SCHEMA = T.StructType(
    [T.StructField("n", T.LongType()), T.StructField("max_id", T.LongType())]
)
_OUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("max_event_id", T.LongType()),
    ]
)


def _count_events(
    key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: Any
) -> Iterator[pd.DataFrame]:
    n, max_id = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        max_id = max(max_id, int(pdf["event_id"].max()))
    state.update((n, max_id))
    yield pd.DataFrame(
        {"event_type": [key[0]], "n_events": [n], "max_event_id": [max_id]}
    )


@register("st_stateful_running_count", oracle=_STATEFUL_ORACLE, tags=("T4", "U2"))
def st_stateful_running_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (arbitrary-state API): per
    event_type, applyInPandasWithState keeps (count, max id) in the
    state store across micro-batches and emits the running totals each
    update. Draining the source makes the final update equal the batch
    aggregate, which the oracle checks."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from ..streaming import drain_to_table, read_events_stream

    e = read_events_stream(spark, sf_dir).select("event_type", "event_id")
    updates = e.groupBy("event_type").applyInPandasWithState(
        _count_events,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    sink = drain_to_table(updates, output_mode="update")
    # One update row per (micro-batch, key): keep each key's last.
    return sink.groupBy("event_type").agg(
        F.max("n_events").alias("n_events"),
        F.max("max_event_id").alias("max_event_id"),
    )


_DPP_ORACLE = """
WITH lang_dim AS (
  SELECT * FROM (VALUES ('en', 'english'), ('de', 'german')) AS t(lang_code, lang_name)
)
SELECT lang_name,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
JOIN lang_dim ON lang = lang_code
GROUP BY lang_name
"""


@register("s_dynamic_partition_pruning", oracle=_DPP_ORACLE, tags=("S5", "J2"))
def s_dynamic_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning: the fact side is partitioned by lang,
    the dim side's filter is only known at runtime (join, not a literal
    predicate) — Spark injects a dynamicpruning subquery so only the
    joined partitions are scanned (asserted in tests/test_plans.py).
    At 100 TB this is the difference between scanning 2 partitions and
    scanning all of them."""
    from pyspark.sql import Row

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars", "lang"
    )
    path = scratch_dir(sf_dir, "documents_dpp_by_lang")
    import os

    # _SUCCESS marker, not bare existence: an interrupted write leaves a
    # partial directory that bare exists-checks would trust forever.
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        docs.write.mode("overwrite").partitionBy("lang").parquet(path)
    fact = spark.read.parquet(path)
    dim = spark.createDataFrame(
        [
            Row(lang_code="en", lang_name="english"),
            Row(lang_code="de", lang_name="german"),
            Row(lang_code="es", lang_name="spanish"),
            Row(lang_code="fr", lang_name="french"),
            Row(lang_code="zh", lang_name="chinese"),
        ]
    ).filter(F.col("lang_name").isin("english", "german"))  # runtime-only filter → DPP
    return (
        fact.join(dim, fact.lang == dim.lang_code)
        .groupBy("lang_name")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


_RANGE_BUCKETED_ORACLE = """
SELECT a.event_id AS error_id, b.event_id AS click_id,
       EPOCH_US(b.ts) - EPOCH_US(a.ts) AS us_apart
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND a.event_type = 'error' AND b.event_type = 'click'
 AND b.ts >= a.ts - INTERVAL 5 MINUTE
 AND b.ts <= a.ts + INTERVAL 5 MINUTE
"""


@register("j_range_bucketed", oracle=_RANGE_BUCKETED_ORACLE, tags=("J7", "skew"))
def j_range_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalable interval join: clicks within ±5 min of each error, per
    user. A naive time-range theta join plans as a nested loop over the
    user's full history; bucketing timestamps into window-sized epochs
    and exploding one side into its 3 candidate buckets turns it into an
    equi-join on (user, bucket) + an exact refine filter — the shape
    that shuffles instead of looping, with candidate volume bounded by
    bucket occupancy. Result == the plain range join (oracle)."""
    W_US = 5 * 60 * 1_000_000  # window half-width in microseconds
    e = load_table(spark, sf_dir, "events")
    errors = e.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        F.col("user_id").alias("u_a"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_a"),
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("u_b"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_b"),
    )
    # Errors probe their own bucket ±1; clicks carry exactly one bucket.
    probed = errors.select(
        "*",
        F.explode(
            F.array(*[(F.col("ts_a") / W_US).cast("long") + d for d in (-1, 0, 1)])
        ).alias("bucket"),
    )
    hashed = clicks.withColumn("bucket", (F.col("ts_b") / W_US).cast("long"))
    return (
        probed.join(
            hashed,
            (F.col("u_a") == F.col("u_b")) & (probed.bucket == hashed.bucket),
        )
        .filter(
            (F.col("ts_b") >= F.col("ts_a") - W_US)
            & (F.col("ts_b") <= F.col("ts_a") + W_US)
        )
        .select(
            "error_id",
            "click_id",
            (F.col("ts_b") - F.col("ts_a")).alias("us_apart"),
        )
    )
