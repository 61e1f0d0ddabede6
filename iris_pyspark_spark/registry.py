"""Query registry — the single source of truth for the engine's surface.

Every operator from SURVEY.md §2 lands here as a named query:
    fn(spark, sf_dir) -> DataFrame          (the Spark-first implementation)
    oracle: str | None                       (equivalent DuckDB ANSI SQL)

`__spark_entry__.py` re-exports this registry to the driver; the in-repo
pytest suite (tests/test_correctness.py) runs the same Spark-vs-DuckDB
comparison the driver's t2 gate runs, so mismatches are caught pre-commit.

Determinism rules every query follows (SURVEY.md §5.2):
  * alias every computed column identically in Spark and oracle SQL;
  * no nondeterministic functions in checked output;
  * LIMIT only after a total order (explicit tie-break keys);
  * float outputs either bit-deterministic (sums at matching operation
    order, integer-scaled money math) or rounded identically on both sides.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None → driver does rows-only check
    tags: tuple[str, ...] = ()
    headline: bool = False  # included in bench.py's headline set


REGISTRY: dict[str, Query] = {}

#: Modules whose import registers queries (side-effectful @register calls).
_QUERY_MODULES = (
    "flagship",
    "sql_entry",
    "sources_sinks",
    "filters",
    "joins",
    "aggregates",
    "windows",
    "setops",
    "scalar_funcs",
    "udfs",
    "events_windows",
    "streaming_parity",
    "scale_patterns",
    "llm_text",
    "llm_dedup",
    "llm_similarity",
    "multimodal",
    "ml_pipeline",
)


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    headline: bool = False,
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add fn to the registry under `name`."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, tags=tags, headline=headline)
        return fn

    return deco


def load_all() -> dict[str, Query]:
    """Import all query modules (idempotent) and return the registry."""
    for mod in _QUERY_MODULES:
        importlib.import_module(f"iris_pyspark_spark.queries.{mod}")
    return REGISTRY
