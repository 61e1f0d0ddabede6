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
