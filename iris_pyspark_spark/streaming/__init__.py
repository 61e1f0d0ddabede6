"""Structured Streaming surface (SURVEY.md §2.9, streaming forms).

Every batch event-time query in queries/events_windows.py has a true
streaming twin here: `spark.readStream` over the events parquet →
stateful incremental execution (micro-batches, state store, watermark
tracking) → memory sink. `Trigger.AvailableNow` drains all available
input then stops, so the streaming result is a finite DataFrame the
DuckDB oracle can check — the execution path is IncrementalExecution,
not the batch planner, which is the point.

Output modes: aggregations run in `complete` mode (append would hold
back the final windows forever, since the watermark never advances past
the last event of a drained source); row-level ops (dedup) run in
`update`/`append`. On a real cluster the same code runs unbounded with
a kafka/files source and a real sink; watermarks bound the state store
exactly as demonstrated in tests/test_streaming.py.

The events table's `ts` has shipped as both parquet TIMESTAMP(NANOS)
(readable only as raw ns-int64 under nanosAsLong) and TIMESTAMP(MICROS)
(read natively) across driver data generations. Streaming sources
require an explicit schema, so we probe the file's batch-read schema
once and build the matching source schema + normalization, exactly
mirroring catalog.load_table.
"""

from __future__ import annotations

import itertools
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..session import configure
from ..sources import scratch_dir

def _events_raw_schema(ts_type: T.DataType) -> T.StructType:
    """Explicit source schema; `ts_type` matches what the parquet scan
    yields for this data generation (LongType for ns files under
    nanosAsLong, TimestampType for µs files — requesting ltz directly is
    safe because the session timezone is pinned to UTC)."""
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )

# Public constant for callers that hand-write ns-int64 event rows (the
# nanosAsLong vintage shape: ts is a raw LongType of epoch-nanos). Code
# reading driver parquet should instead probe like read_events_stream —
# the file's vintage decides which variant applies.
EVENTS_RAW_SCHEMA = _events_raw_schema(T.LongType())

_SINK_IDS = itertools.count()


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet, normalized to the same
    (event_id, ts timestamp_ntz, ...) shape the batch catalog serves."""
    configure(spark)
    # The file stream source monitors a DIRECTORY; the test data is a
    # single parquet file, so stage it into a scratch dir once. (A real
    # deployment's landing zone is already a directory of files.)
    src = scratch_dir(sf_dir, "events_stream_src")
    staged = os.path.join(src, "events.parquet")
    if not os.path.exists(staged):
        os.makedirs(src, exist_ok=True)
        # Copy to a temp name + atomic rename: an interrupted copy must
        # not leave a truncated file that exists-checks would then trust.
        tmp = staged + ".tmp"
        shutil.copy2(f"{sf_dir}/events.parquet", tmp)
        os.replace(tmp, staged)
    # Probe the batch-read type of ts for this data generation (cheap:
    # footer read only, no job).
    probed = spark.read.parquet(staged).schema["ts"].dataType
    if isinstance(probed, T.LongType):
        raw = spark.readStream.schema(_events_raw_schema(T.LongType())).parquet(src)
        # TIMESTAMP (ltz), not NTZ: watermarks/event-time require it. The
        # session is pinned to UTC (session.RUNTIME_CONFS), so epoch math
        # is identical to the batch catalog's TIMESTAMP_NTZ.
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if not isinstance(probed, (T.TimestampType, T.TimestampNTZType)):
        raise TypeError(
            f"events.ts has unexpected parquet vintage {probed}; expected "
            "ns-int64 (LongType under nanosAsLong) or a µs timestamp — a new "
            "encoding needs an explicit normalization here, not a guess"
        )
    return spark.readStream.schema(_events_raw_schema(T.TimestampType())).parquet(src)


def drain_to_table(
    stream_df: DataFrame,
    output_mode: str,
    *,
    shuffle_partitions: int | None = None,
    no_data_microbatches: bool = True,
) -> DataFrame:
    """Run a streaming DataFrame to completion (AvailableNow) into a
    memory sink; return the sink contents as a batch DataFrame.

    Tuning knobs for COMPLETE-mode drains (both conf values are set for
    the duration of this drain only, then restored):

    * `shuffle_partitions` — every stateful operator loads + commits one
      state store per shuffle partition per micro-batch; a drain whose
      final answer is a few thousand rows doesn't need 32 of them per
      operator. Complete mode re-emits the whole result each batch, so
      partition count cannot change the answer. Leave None for append /
      update queries at production scale, where state volume is the
      sizing driver.
    * `no_data_microbatches=False` skips the trailing empty batch Spark
      schedules to let watermark-driven state FLUSH (append-mode window
      emission, outer-join flush, session timeouts). Complete mode
      emits the full result on every data batch, so the extra batch is
      pure fixed overhead there — but leave it True for any query whose
      final rows are emitted by watermark expiry."""
    name = f"stream_sink_{next(_SINK_IDS)}"
    spark = stream_df.sparkSession
    overrides: dict[str, str] = {}
    if shuffle_partitions is not None:
        overrides["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if not no_data_microbatches:
        overrides["spark.sql.streaming.noDataMicroBatches.enabled"] = "false"
    restore = {k: spark.conf.get(k) for k in overrides}
    for k, v in overrides.items():
        spark.conf.set(k, v)
    try:
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        for k, v in restore.items():
            spark.conf.set(k, v)
    return spark.table(name)
