"""Custom Python Data Source (Spark 4 DataSource API, SURVEY §2.1 ext).

A deterministic synthetic "sensors" source demonstrating the full
batch-reader contract: named format registration, schema declaration,
partition planning (one InputPartition per reader split — Spark
schedules each to an executor), and per-partition row generation.
Deterministic arithmetic rows keep it oracle-checkable with a
closed-form SQL equivalent (DuckDB range()).

At scale this is the pattern for reading bespoke feeds (internal APIs,
proprietary formats) with real partition parallelism instead of a
driver-side collect-and-parallelize.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class SensorsDataSource(DataSource):
    """format("demo_sensors") — options: partitions, rows_per_partition."""

    @classmethod
    def name(cls) -> str:
        return "demo_sensors"

    def schema(self) -> str:
        return "sensor_id bigint, reading double"

    def reader(self, schema) -> "SensorsReader":
        return SensorsReader(self.options)


class SensorsReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.n_partitions = int(options.get("partitions", "4"))
        self.rows_per_partition = int(options.get("rows_per_partition", "100"))

    def partitions(self):
        return [InputPartition(i) for i in range(self.n_partitions)]

    def read(self, partition):
        base = partition.value * self.rows_per_partition
        for j in range(self.rows_per_partition):
            sid = base + j
            # Pure integer-derived double: bit-identical on any engine.
            yield (sid, float(sid % 7) + 0.5)


class SensorsStreamDataSource(DataSource):
    """format("demo_sensors_stream") — the STREAMING half of the custom
    Python Data Source contract: a bounded synthetic feed of
    `batches` × `rows_per_batch` deterministic rows, exposed through
    SimpleDataSourceStreamReader (offset bookkeeping + replay, no
    partition planning — right for low-throughput bespoke feeds; a
    high-volume feed would implement DataSourceStreamReader with real
    partitions instead). Offsets are dict checkpoints; readBetweenOffsets
    replays any committed range after a restart, which is what makes the
    source exactly-once under micro-batch recovery."""

    @classmethod
    def name(cls) -> str:
        return "demo_sensors_stream"

    def schema(self) -> str:
        return "sensor_id bigint, reading double"

    def simpleStreamReader(self, schema) -> "SensorsStreamReader":
        return SensorsStreamReader(self.options)


def _sensor_rows(batch: int, rows_per_batch: int) -> list:
    """Materialized list, not a generator: the runner's prefetch cache
    copy.copy()s the iterator it is handed, which list iterators support
    and generators do not."""
    base = batch * rows_per_batch
    return [
        (sid, float(sid % 7) + 0.5)  # same closed form as the batch source
        for sid in range(base, base + rows_per_batch)
    ]


class SensorsStreamReader:
    """SimpleDataSourceStreamReader subclass (imported lazily so module
    import never depends on streaming internals)."""

    def __new__(cls, options):
        from pyspark.sql.datasource import SimpleDataSourceStreamReader

        class _Reader(SimpleDataSourceStreamReader):
            def __init__(self, opts) -> None:
                self.batches = int(opts.get("batches", "4"))
                self.rows_per_batch = int(opts.get("rows_per_batch", "100"))

            def initialOffset(self):
                return {"batch": 0}

            def read(self, start):
                b = int(start["batch"])
                if b >= self.batches:  # feed exhausted: no progress
                    return (iter([]), {"batch": b})
                return (iter(_sensor_rows(b, self.rows_per_batch)), {"batch": b + 1})

            def readBetweenOffsets(self, start, end):
                rows: list = []
                for b in range(int(start["batch"]), int(end["batch"])):
                    rows.extend(_sensor_rows(b, self.rows_per_batch))
                return iter(rows)

        return _Reader(options)


class ArrowParquetSinkDataSource(DataSource):
    """format("arrow_parquet_sink") — the WRITE half of the custom
    Python Data Source contract, on the Arrow fast path
    (DataSourceArrowWriter): each executor task receives
    pyarrow.RecordBatch objects (zero row-by-row Python cost) and
    writes one parquet part per batch straight from Arrow; the commit
    message carries (path, row-count) per task and the driver-side
    commit() writes a _SUCCESS manifest listing every part with its
    count — the two-phase commit that makes the sink atomic-ish:
    readers key on the manifest, so a failed/partial job (no manifest)
    is invisible. This is the pattern for bespoke sinks (feature
    stores, internal services) with real partition parallelism instead
    of collect-and-upload."""

    @classmethod
    def name(cls) -> str:
        return "arrow_parquet_sink"

    def writer(self, schema, overwrite):
        return ArrowParquetSinkWriter(self.options)


class ArrowParquetSinkWriter:
    def __new__(cls, options):
        from pyspark.sql.datasource import (
            DataSourceArrowWriter,
            WriterCommitMessage,
        )

        class _Msg(WriterCommitMessage):
            def __init__(self, paths: list, rows: int) -> None:
                self.paths = paths
                self.rows = rows

        class _Writer(DataSourceArrowWriter):
            def __init__(self, opts) -> None:
                self.path = opts["path"]

            def write(self, iterator):
                import os

                import pyarrow as pa
                import pyarrow.parquet as pq

                from pyspark import TaskContext

                pid = TaskContext.get().partitionId()
                os.makedirs(self.path, exist_ok=True)
                paths: list = []
                rows = 0
                for i, batch in enumerate(iterator):
                    out = os.path.join(self.path, f"part-{pid:05d}-{i:03d}.parquet")
                    pq.write_table(pa.Table.from_batches([batch]), out)
                    paths.append(out)
                    rows += batch.num_rows
                return _Msg(paths, rows)

            def commit(self, messages):
                import json
                import os

                manifest = {
                    "parts": sorted(p for m in messages for p in m.paths),
                    "rows": sum(m.rows for m in messages),
                }
                with open(os.path.join(self.path, "_MANIFEST.json"), "w") as f:
                    json.dump(manifest, f)

            def abort(self, messages):
                pass  # parts without a manifest are never read

        return _Writer(options)
