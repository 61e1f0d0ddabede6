"""Multimodal column operators: opaque binary payloads + typed metadata.

Design (100 TB): media lives in a `binary` column (or an object-store URI
column resolved inside the UDF) with a typed metadata struct alongside.
All per-item work — decode, feature-extract, resize, frame-sample — runs
as Arrow-batched `mapInPandas` over whatever partitioning the table
already has: no shuffle, no collect, embarrassingly parallel. Partition
sizing is governed by `spark.sql.files.maxPartitionBytes`, so a 100 TB
media table fans out to however many executors exist.

The actual codec step is STUBBED: this container has no image/audio
libraries, so `decode_image` raises NotImplementedError and the query
path uses `fake_decode_meta` — a deterministic pure-arithmetic stand-in
(reproducible in ANSI SQL, which keeps the whole pipeline
oracle-checkable end-to-end). The Spark-side plumbing — binary schema,
Arrow batch shape, UDF signatures, frame-sampling layout — is real.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Fake "video" frame size in bytes — one frame per 256-byte slice.
FRAME_BYTES = 256

DECODED_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


def decode_image(payload: bytes) -> "object":
    """Real codec entry point — NOT IMPLEMENTED in this container.

    On a cluster with codec libraries installed, this would return a
    decoded ndarray (H x W x C). Swap the body in and `fake_decode_meta`
    out; the mapInPandas plumbing is unchanged.
    """
    raise NotImplementedError(
        "image/audio codecs are not installed in this environment; "
        "the pipeline uses fake_decode_meta as a deterministic stand-in"
    )


def fake_decode_meta(n_bytes: pd.Series) -> pd.DataFrame:
    """Deterministic stand-in for codec metadata, pure arithmetic on the
    payload length so a SQL oracle can reproduce it exactly:
        width  = n_bytes % 640 + 1
        height = (n_bytes // 7) % 480 + 1
        n_frames = ceil(n_bytes / FRAME_BYTES)
    """
    nb = n_bytes.astype("int64")
    return pd.DataFrame(
        {
            "n_bytes": nb.astype("int32"),
            "width": (nb % 640 + 1).astype("int32"),
            "height": ((nb // 7) % 480 + 1).astype("int32"),
            "n_frames": (-(-nb // FRAME_BYTES)).astype("int32"),
        }
    )


def attach_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Synthesize the opaque media payload: the UTF-8 bytes of `text`.

    Stands in for reading real media bytes; everything downstream treats
    it as an opaque blob.
    """
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def decode_metadata(df: DataFrame) -> DataFrame:
    """Arrow-batched 'decode': binary payload → typed metadata frame.

    `df` must have (doc_id long, payload binary). Runs mapInPandas with
    per-partition codec init (stubbed), streaming Arrow batches.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Per-partition init happens here (codec handles, GPU context...).
        for pdf in batches:
            meta = fake_decode_meta(pdf["payload"].map(len))
            meta.insert(0, "doc_id", pdf["doc_id"].values)
            yield meta

    return df.select("doc_id", "payload").mapInPandas(run, DECODED_META_SCHEMA)


def sample_frames(df: DataFrame, every_k: int = 4) -> DataFrame:
    """Frame sampling over the fake video: keep every k-th frame index.

    Pure Catalyst (sequence + filter higher-order function) — the sampled
    indices stay JVM-side; only a real pixel decode would need Python.
    Output: doc_id, n_frames, sampled_frames array<int>.
    """
    n_frames = F.ceil(F.octet_length("payload") / F.lit(FRAME_BYTES)).cast("int")
    # Guard n_frames=0 (empty payload): sequence(0, -1) would produce a
    # DESCENDING [0, -1] (Spark defaults to step -1 when start > stop),
    # leaking a phantom frame index 0.
    sampled = F.when(n_frames > 0, F.filter(
        F.sequence(F.lit(0), n_frames - 1),
        lambda i: i % every_k == 0,
    )).otherwise(F.array().cast("array<int>"))
    return df.select(
        "doc_id",
        n_frames.alias("n_frames"),
        sampled.alias("sampled_frames"),
    )
