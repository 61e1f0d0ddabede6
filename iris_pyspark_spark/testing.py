"""In-repo replica of the driver's t2 correctness gate.

Runs a registered query on Spark and its oracle SQL on DuckDB over the
same parquet tables, then compares row count, coarse schema, and an
order-insensitive canonical form of every value. Strict string-level
equality on canonicalized cells approximates (conservatively) whatever
hashing the driver uses — if this passes, a value-hash comparison
passes too.
"""

from __future__ import annotations

import datetime as _dt
import math
from dataclasses import dataclass

import duckdb
import numpy as np
import pandas as pd

from .catalog import TABLES

NULL = "\x00NULL"


def make_oracle_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """DuckDB connection with the ten views registered, as the driver does."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon_cell(v: object) -> str:
    if v is None:
        return NULL
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return NULL
        return repr(f)  # shortest round-trip repr of the float64
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, pd.Timestamp):
        if pd.isna(v):
            return NULL
        return v.isoformat()
    if isinstance(v, _dt.datetime):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_canon_cell(x)}" for k, x in sorted(v.items())) + "}"
    if isinstance(v, bytes):
        return "0x" + v.hex()
    if v is pd.NaT or (isinstance(v, float) and pd.isna(v)):
        return NULL
    return str(v)


def _dtype_class(s: pd.Series) -> str:
    kind = s.dtype.kind
    if kind in "iu":
        return "int"
    if kind == "f":
        return "float"
    if kind == "b":
        return "bool"
    if kind == "M":
        return "timestamp"
    if kind == "O":
        sample = next((x for x in s if x is not None and x is not pd.NaT), None)
        if isinstance(sample, _dt.datetime):
            return "timestamp"
        if isinstance(sample, _dt.date):
            return "date"
        if isinstance(sample, (list, np.ndarray, tuple)):
            return "array"
        if isinstance(sample, bytes):
            return "binary"
        if isinstance(sample, (int, np.integer)):
            return "int"
        if isinstance(sample, (float, np.floating)):
            return "float"
        return "string"
    return str(s.dtype)


def canonical_rows(df: pd.DataFrame) -> list[tuple[str, ...]]:
    cols = sorted(df.columns)
    out = [
        tuple(_canon_cell(row[c]) for c in cols)
        for row in df.to_dict(orient="records")
    ]
    return sorted(out)


def assert_driver_safe_schema(df, name: str) -> None:
    """Gate: no complex-typed column may reach the driver's checked output.

    The driver canonicalizes EVERY query's output (including rows-only
    queries) with pandas ``sort_values`` over all columns; array/map
    cells arrive as numpy.ndarray / dict — unhashable — and crash its
    ``Categorical`` factorize (CORRECTNESS_r03: a_approx_percentile,
    f_array_funcs both TypeError'd). Queries must scalarize or
    stringify complex values before returning.
    """
    from pyspark.sql.types import ArrayType, MapType, StructType

    bad = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not bad, (
        f"{name}: complex-typed checked output columns {bad} would crash the "
        "driver canonicalizer — project to scalars or stringify (array_join/to_json)"
    )


@dataclass
class CompareResult:
    ok: bool
    detail: str = ""


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> CompareResult:
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        return CompareResult(
            False,
            f"column mismatch: spark={sorted(spark_pdf.columns)} oracle={sorted(oracle_pdf.columns)}",
        )
    if len(spark_pdf) != len(oracle_pdf):
        return CompareResult(
            False, f"row count mismatch: spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
        )
    for c in sorted(spark_pdf.columns):
        sc, oc = _dtype_class(spark_pdf[c]), _dtype_class(oracle_pdf[c])
        if sc != oc:
            return CompareResult(False, f"dtype mismatch on {c}: spark={sc} oracle={oc}")
    s_rows = canonical_rows(spark_pdf)
    o_rows = canonical_rows(oracle_pdf)
    if s_rows != o_rows:
        diffs = [
            (a, b) for a, b in zip(s_rows, o_rows) if a != b
        ][:3]
        return CompareResult(False, f"value mismatch; first diffs (spark, oracle): {diffs}")
    return CompareResult(True)
