"""SparkSession factory with scale-aware defaults.

One session per process; all knobs are safe on a real multi-executor
cluster (they tune *plan* behavior, not local-mode hacks):

  * AQE on (runtime re-planning, partition coalescing, skew-join split).
  * Arrow on (vectorized pandas interchange for the UDF slow-path).
  * `nanosAsLong` on: the `events` table is parquet TIMESTAMP(NANOS),
    which Spark 4 refuses to read natively; we read it as raw ns-int64
    and convert to TIMESTAMP_NTZ in the catalog (catalog.py).
  * shuffle.partitions defaults small for the MB-scale test data; at
    real scale AQE coalescing makes the static number mostly moot, and
    callers can override via IRIS_PYSPARK_SHUFFLE_PARTITIONS.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Runtime (SQL) confs — settable on an existing session too, which is how we
#: harden sessions handed to us by external drivers (see `configure`).
RUNTIME_CONFS: dict[str, str] = {
    # Streaming stateful ops don't get AQE partition coalescing, so the
    # static shuffle-partition count matters there (a vanilla session's
    # 200 means 200 near-empty state-store tasks per micro-batch at test
    # scale). Batch plans are unaffected in practice: AQE re-coalesces.
    "spark.sql.shuffle.partitions": os.environ.get(
        "IRIS_PYSPARK_SHUFFLE_PARTITIONS", "32"
    ),
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
    # NOTE: spark.sql.parquet.aggregatePushdown was set here in round 3
    # and removed in round 4: it only applies to the DSv2 parquet reader,
    # and Spark's default spark.sql.sources.useV1SourceList keeps parquet
    # on the v1 FileScan path — verified empirically (MIN/MAX probe plan
    # shows FileScan with no PushedAggregation). An inert conf is worse
    # than none: it reads as a capability the engine doesn't deliver.
    # Footer-stats skipping for MIN/MAX probes is instead provided
    # explicitly by s_minmax_manifest_skipping's manifest pattern.
}


def configure(spark: SparkSession) -> SparkSession:
    """Apply runtime confs to an existing session (idempotent).

    Used both by our own factory and on driver-provided sessions, since
    reading `events.parquet` is impossible without `nanosAsLong`.

    Failures to apply a conf are collected and reported in ONE warning
    (not raised): a session that rejects `nanosAsLong` will fail on
    `events` reads far from the cause, and the warning is the breadcrumb.
    """
    failed: list[str] = []
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            failed.append(k)
    if failed:
        import warnings

        warnings.warn(
            "could not apply session confs "
            f"{failed}; events.parquet reads need "
            "spark.sql.legacy.parquet.nanosAsLong — expect failures there"
            if "spark.sql.legacy.parquet.nanosAsLong" in failed
            else f"could not apply session confs {failed}",
            RuntimeWarning,
            stacklevel=2,
        )
    return spark


def get_spark(
    app_name: str = "iris_pyspark_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Create (or fetch) the process-wide SparkSession.

    An explicit `shuffle_partitions` wins over the env-var default —
    both at build time and past the `configure()` re-application below
    (which would otherwise clobber it with the RUNTIME_CONFS value)."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    explicit_shuffle = shuffle_partitions
    shuffle_partitions = shuffle_partitions or int(
        os.environ.get("IRIS_PYSPARK_SHUFFLE_PARTITIONS", "32")
    )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("IRIS_PYSPARK_DRIVER_MEM", "8g"))
        # Whole-stage codegen emits one class per query stage; the JVM
        # default 240 MB code cache fills after a few dozen generated
        # stages, the JIT stops compiling, and everything silently runs
        # interpreted (~5-10x slower). Size it for a many-query session.
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=1g -XX:+UseCodeCacheFlushing",
        )
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    configure(spark)
    if explicit_shuffle is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(explicit_shuffle))
    _gc_scratch_once()
    return spark


_GC_DONE = False


def _gc_scratch_once() -> None:
    """Once per process: size-capped sweep of the persistent scratch
    root (fingerprinted artifacts accumulate across rounds with no
    natural expiry — see sources.gc_scratch)."""
    global _GC_DONE
    if _GC_DONE:
        return
    _GC_DONE = True
    try:
        from .sources import gc_scratch

        deleted = gc_scratch()
        if deleted:
            import warnings

            warnings.warn(
                f"scratch GC evicted {len(deleted)} artifact dirs over the "
                "2 GiB cap (rebuilt on next use)",
                RuntimeWarning,
                stacklevel=2,
            )
    except Exception:
        pass  # GC must never block session creation
