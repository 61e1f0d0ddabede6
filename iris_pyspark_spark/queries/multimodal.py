"""N6 + multimodal binary plumbing (SURVEY.md §2.10, north star).

m_struct_columns       — N6: nested struct carried through filter/agg,
                         accessed with dotted paths (pure Catalyst).
m_decode_metadata      — binary payload → typed metadata via Arrow-batched
                         mapInPandas; the codec is a deterministic fake
                         (operators/multimodal.py) so DuckDB reproduces it.
m_frame_sampling       — fake-video frame index sampling with Catalyst
                         higher-order functions (sequence + filter).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.multimodal import attach_payload, decode_metadata, sample_frames
from ..registry import register

# --- N6: struct (nested) columns through relational ops --------------------

_STRUCT_ORACLE = """
SELECT m.source AS source,
       COUNT(*) AS n_docs,
       CAST(SUM(m.meta.n_chars) AS BIGINT) AS total_chars,
       MAX(m.meta.lang) AS max_lang
FROM (
  SELECT {'source': source,
          'meta': {'lang': lang, 'n_chars': n_chars}} AS m
  FROM documents
  WHERE n_chars >= 100
)
WHERE m.meta.lang <> 'zh'
GROUP BY m.source
"""


@register("m_struct_columns", oracle=_STRUCT_ORACLE, tags=("N6",))
def m_struct_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    nested = docs.filter(F.col("n_chars") >= 100).select(
        F.struct(
            F.col("source").alias("source"),
            F.struct(
                F.col("lang").alias("lang"),
                F.col("n_chars").alias("n_chars"),
            ).alias("meta"),
        ).alias("m")
    )
    return (
        nested.filter(F.col("m.meta.lang") != "zh")
        .groupBy(F.col("m.source").alias("source"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("m.meta.n_chars").alias("total_chars"),
            F.max("m.meta.lang").alias("max_lang"),
        )
    )


# --- binary payload → decoded metadata (Arrow-batched Python) --------------

_DECODE_ORACLE = """
SELECT doc_id,
       CAST(nb AS INT)                    AS n_bytes,
       CAST(nb % 640 + 1 AS INT)          AS width,
       CAST((nb // 7) % 480 + 1 AS INT)   AS height,
       CAST(CEIL(nb / 256.0) AS INT)      AS n_frames
FROM (SELECT doc_id, octet_length(encode(text)) AS nb FROM documents)
"""


@register("m_decode_metadata", oracle=_DECODE_ORACLE, tags=("multimodal", "U5"))
def m_decode_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = attach_payload(load_table(spark, sf_dir, "documents"))
    return decode_metadata(docs)


# --- frame sampling (Catalyst higher-order functions, no Python) -----------

_FRAMES_ORACLE = """
SELECT doc_id,
       CAST(CEIL(nb / 256.0) AS INT) AS n_frames,
       [i for i in range(0, CAST(CEIL(nb / 256.0) AS INT)) if i % 4 = 0]
         AS sampled_frames
FROM (SELECT doc_id, octet_length(encode(text)) AS nb FROM documents)
"""


@register("m_frame_sampling", oracle=_FRAMES_ORACLE, tags=("multimodal", "F4"))
def m_frame_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = attach_payload(load_table(spark, sf_dir, "documents"))
    return sample_frames(docs, every_k=4)
