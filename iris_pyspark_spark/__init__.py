"""iris_pyspark_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first analytics engine covering the full operator
surface described in SURVEY.md §2: relational core (scan / filter /
project / join / aggregate / window / set-ops), scalar function families,
event-time windowing (batch + Structured Streaming parity), and the
LLM-data-pipeline extensions (dedup, similarity search, multimodal
columns, text analysis), plus an MLlib classification pipeline.

Design principles (see SURVEY.md §4):
  * Declare plans with the DataFrame / SQL API; let Catalyst + AQE pick
    physical strategies (no hand-scheduling, no RDDs).
  * Built-in `pyspark.sql.functions` everywhere possible; Arrow-batched
    pandas UDFs only where built-ins cannot express the semantics.
  * Broadcast small dimensions, keep filters/pruning pushed to parquet,
    stay inside whole-stage codegen.

Note on the reference (`/root/reference`): it was an empty directory at
survey time (SURVEY.md §0), so no file:line citations into it exist
anywhere in this package; the operator inventory in SURVEY.md §2 is the
implementation contract instead.
"""

__version__ = "0.1.0"
