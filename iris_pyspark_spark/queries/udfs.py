"""U1-U5: the Python UDF surface (SURVEY.md §2.8).

Every shape Spark offers for user Python code, each oracle-checked
against pure-SQL DuckDB — proving the UDF output matches what the
declarative form computes:

  U1 scalar @pandas_udf            — Arrow-vectorized Series→Series
  U2 groupBy().applyInPandas       — grouped-map (pandas per group)
  U3 @pandas_udf GROUPED_AGG       — pandas UDAF inside .agg()
  U4 @udtf                         — Python table function (lateral rows)
  U5 mapInPandas (iterator form)   — per-partition init + batch stream

Determinism: float outputs either copy input columns untouched or use
elementwise arithmetic in the same operation order as the oracle (IEEE
doubles are bit-equal then), with sums in integer cents (joins.cents).

Scale notes: all UDFs here are Arrow-batched (no row-at-a-time pickling
except the UDTF, which is inherently per-row — kept for surface
completeness, not the hot path). On a real cluster each runs inside the
executor's Python worker against its own partition: no collect, no
driver funnel. The equivalent built-in-function forms of U1/U3/U5 live
in other query modules; UDFs are the escape hatch, not the default.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf, udtf

from ..catalog import load_table
from ..registry import register
from .joins import CENTS_SQL, cents

# --- U1: scalar pandas UDF (Series → Series, Arrow-vectorized) -------------

_U1_ORACLE = f"""
SELECT l_returnflag,
       CAST(SUM({CENTS_SQL.format(expr="l_extendedprice * (1 - l_discount) * (1 + l_tax)")})
         AS BIGINT) AS charge_cents,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_quantity >= 30
GROUP BY l_returnflag
"""


def _make_charge_udf():
    @pandas_udf("double")
    def charge(price: pd.Series, disc: pd.Series, tax: pd.Series) -> pd.Series:
        # Same elementwise operation order as the oracle expression → bit-equal.
        return price * (1 - disc) * (1 + tax)

    return charge


@register("u_scalar_pandas_udf", oracle=_U1_ORACLE, tags=("U1",))
def u_scalar_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 30)
    charge = _make_charge_udf()("l_extendedprice", "l_discount", "l_tax")
    charge_cents = F.round(charge * 100, 0).cast("long")
    return li.groupBy("l_returnflag").agg(
        F.sum(charge_cents).alias("charge_cents"),
        F.count(F.lit(1)).alias("n_items"),
    )


# --- U2: grouped-map applyInPandas (top-3 orders per priority) -------------

_U2_ORACLE = """
SELECT o_orderpriority, o_orderkey, o_totalprice, rk
FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (
           PARTITION BY o_orderpriority
           ORDER BY o_totalprice DESC, o_orderkey
         ) AS rk
  FROM orders
)
WHERE rk <= 3
"""

_U2_SCHEMA = (
    "o_orderpriority string, o_orderkey long, o_totalprice double, rk int"
)


def _top3_per_group(pdf: pd.DataFrame) -> pd.DataFrame:
    out = pdf.sort_values(
        ["o_totalprice", "o_orderkey"], ascending=[False, True]
    ).head(3)
    out = out.assign(rk=range(1, len(out) + 1))
    return out[["o_orderpriority", "o_orderkey", "o_totalprice", "rk"]]


@register("u_grouped_map_apply_in_pandas", oracle=_U2_ORACLE, tags=("U2",))
def u_grouped_map_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_orderkey", "o_totalprice"
    )
    return orders.groupBy("o_orderpriority").applyInPandas(_top3_per_group, _U2_SCHEMA)


# --- U3: grouped-agg pandas UDAF (price spread per group) ------------------

_U3_ORACLE = """
SELECT l_returnflag,
       MAX(l_extendedprice) - MIN(l_extendedprice) AS price_spread,
       COUNT(*) AS n_items
FROM lineitem
GROUP BY l_returnflag
"""


def _make_spread_udaf():
    @pandas_udf("double")
    def spread(price: pd.Series) -> float:
        # max/min are order-insensitive and exact on doubles → deterministic.
        return float(price.max() - price.min())

    return spread


def _make_count_udaf():
    # Spark refuses to mix GROUPED_AGG pandas UDFs with JVM aggregates in
    # one .agg(), so the row count is a pandas UDAF too.
    @pandas_udf("long")
    def n_rows(price: pd.Series) -> int:
        return int(len(price))

    return n_rows


@register("u_grouped_agg_pandas_udaf", oracle=_U3_ORACLE, tags=("U3",))
def u_grouped_agg_pandas_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        _make_spread_udaf()("l_extendedprice").alias("price_spread"),
        _make_count_udaf()("l_extendedprice").alias("n_items"),
    )


# --- U1+U2+U3 combined suite (driver-sweep representative) -----------------

_SUITE_ORACLE = """
SELECT o_orderpriority,
       MAX(o_totalprice * 1.1) - MIN(o_totalprice * 1.1) AS adj_spread,
       COUNT(*) AS n_top
FROM (
  SELECT o_orderpriority, o_totalprice,
         ROW_NUMBER() OVER (
           PARTITION BY o_orderpriority
           ORDER BY o_totalprice DESC, o_orderkey
         ) AS rk
  FROM orders
) t
WHERE rk <= 3
GROUP BY o_orderpriority
"""


def _make_adjust_udf():
    @pandas_udf("double")
    def adjust(price: pd.Series) -> pd.Series:
        # Elementwise, same operation order as the oracle → bit-equal.
        return price * 1.1

    return adjust


def _make_suite_spread_udaf():
    @pandas_udf("double")
    def spread(adj: pd.Series) -> float:
        # max/min are order-insensitive and exact on doubles.
        return float(adj.max() - adj.min())

    return spread


def _make_suite_count_udaf():
    @pandas_udf("long")
    def n_rows(adj: pd.Series) -> int:
        return int(len(adj))

    return n_rows


@register("u_vectorized_suite", oracle=_SUITE_ORACLE, tags=("U1", "U2", "U3"))
def u_vectorized_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 + U2 + U3 chained in one plan — grouped-map applyInPandas
    (top-3 per priority) feeds a scalar pandas UDF (price adjustment)
    feeds a grouped-agg pandas UDAF (spread). Combined-family
    representative for the driver's bounded correctness sweep; each
    shape also has its own per-family query above. Every stage is
    Arrow-batched — no row-at-a-time Python anywhere."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_orderkey", "o_totalprice"
    )
    top3 = orders.groupBy("o_orderpriority").applyInPandas(
        _top3_per_group, _U2_SCHEMA
    )
    adjusted = top3.withColumn("adj", _make_adjust_udf()("o_totalprice"))
    return adjusted.groupBy("o_orderpriority").agg(
        _make_suite_spread_udaf()("adj").alias("adj_spread"),
        _make_suite_count_udaf()("adj").alias("n_top"),
    )


# --- U4: Python UDTF (lateral word expansion with position) ----------------

_U4_ORACLE = """
SELECT doc_id,
       unnest(parts[1:5]) AS word,
       CAST(unnest(generate_series(1, least(5, len(parts)))) AS INT) AS pos
FROM (SELECT doc_id, string_split(text, ' ') AS parts FROM documents)
"""


class _LeadingWords:
    """Emit the first 5 space-separated tokens of a text with 1-based
    positions. Split on a literal single space (keeping empty tokens) to
    match DuckDB's string_split semantics exactly."""

    def eval(self, text: str):
        if text is None:
            return
        for i, w in enumerate(text.split(" ")[:5], start=1):
            yield (w, i)


@register("u_udtf_leading_words", oracle=_U4_ORACLE, tags=("U4",))
def u_udtf_leading_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("u4_documents")
    spark.udtf.register("leading_words", udtf(_LeadingWords, returnType="word: string, pos: int"))
    return spark.sql(
        """
        SELECT d.doc_id, w.word, w.pos
        FROM u4_documents d, LATERAL leading_words(d.text) w
        """
    )


# --- U5: mapInPandas iterator UDF (per-partition init, batch stream) -------

_U5_ORACLE = """
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
       CAST(length(text) AS INT) AS n_chars_actual
FROM documents
"""

_U5_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_tokens", T.IntegerType()),
        T.StructField("n_chars_actual", T.IntegerType()),
    ]
)


def _token_counter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    # Iterator form: expensive setup (model/tokenizer load) happens ONCE
    # per partition, then streams Arrow batches — the 100 TB-safe shape
    # for Python feature extraction. The "model" here is a trivial
    # splitter; the plumbing is the point.
    tokenize = lambda s: len(s.split(" "))  # noqa: E731  (stands in for a real tokenizer)
    for pdf in batches:
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_tokens": pdf["text"].map(tokenize).astype("int32"),
                "n_chars_actual": pdf["text"].str.len().astype("int32"),
            }
        )


@register("u_iterator_map_in_pandas", oracle=_U5_ORACLE, tags=("U5",))
def u_iterator_map_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.mapInPandas(_token_counter, _U5_SCHEMA)


# --- U2-cogroup: cogrouped applyInPandas (two-sided grouped map) -----------

_COGROUP_ORACLE = """
SELECT
  p.event_id,
  p.user_id,
  p.ts,
  (SELECT MAX(c.ts) FROM events c
    WHERE c.user_id = p.user_id AND c.event_type = 'click' AND c.ts <= p.ts
  ) AS last_click_ts
FROM events p
WHERE p.event_type = 'purchase'
"""


def _asof_cogroup(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
    # Arrow hands both sides of ONE user key; pandas merge_asof picks the
    # last right row with click_ts <= ts (allow_exact_matches default).
    left = left.sort_values("ts", kind="mergesort")
    right = right[["click_ts"]].sort_values("click_ts", kind="mergesort")
    out = pd.merge_asof(left, right, left_on="ts", right_on="click_ts")
    out = out.rename(columns={"click_ts": "last_click_ts"})
    return out[["event_id", "user_id", "ts", "last_click_ts"]]


@register("u_cogrouped_asof", oracle=_COGROUP_ORACLE, tags=("U2", "J8"))
def u_cogrouped_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cogroup().applyInPandas — the two-sided grouped-map shape: both
    tables shuffle once on the key, then pandas sees each key's pair of
    frames. Implements the same as-of semantics as j_asof_last_click
    (which uses the pure-DataFrame union-tag rewrite), so the two
    strategies are cross-checked against one oracle. The cogroup shape
    is the escape hatch for per-key logic needing BOTH sides at once
    (merge_asof, interval reconciliation, per-key model scoring)."""
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    return (
        purchases.groupby("user_id")
        .cogroup(clicks.groupby("user_id"))
        .applyInPandas(
            _asof_cogroup,
            "event_id bigint, user_id bigint, ts timestamp_ntz, "
            "last_click_ts timestamp_ntz",
        )
    )


# --- mapInArrow: zero-copy Arrow-batch transform ----------------------------

_ARROW_ORACLE = f"""
SELECT l_orderkey, l_linenumber,
       CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
         AS net_cents,
       l_quantity >= 25 AS bulk
FROM lineitem
WHERE l_returnflag = 'R'
"""


def _arrow_net_cents(batches):
    import pyarrow as pa
    import pyarrow.compute as pc

    for b in batches:
        price = b.column("l_extendedprice")
        disc = b.column("l_discount")
        net = pc.multiply(price, pc.subtract(pa.scalar(1.0), disc))
        cents = pc.cast(
            pc.round(pc.multiply(net, pa.scalar(100.0)), round_mode="half_towards_infinity"),
            pa.int64(),
        )
        bulk = pc.greater_equal(b.column("l_quantity"), pa.scalar(25.0))
        yield pa.RecordBatch.from_arrays(
            [b.column("l_orderkey"), b.column("l_linenumber"), cents, bulk],
            ["l_orderkey", "l_linenumber", "net_cents", "bulk"],
        )


@register("u_map_in_arrow", oracle=_ARROW_ORACLE, tags=("U5", "U1"))
def u_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow — the lowest-overhead Python escape hatch: batches
    cross as Arrow RecordBatches with NO pandas conversion (no index,
    no object boxing), and pyarrow.compute kernels are C++ SIMD. This
    is the shape for byte-level work (codecs, tokenizers backed by
    native libs) where even the pandas_udf conversion tax matters.
    Rounding: net = price*(1-discount) has four decimals, so *100 DOES
    land on exact .5s — pyarrow's default half-to-even silently differs
    from SQL ROUND there; round_mode='half_towards_infinity' pins it."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    src = li.select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount", "l_quantity")
    return src.mapInArrow(
        _arrow_net_cents,
        "l_orderkey bigint, l_linenumber int, net_cents bigint, bulk boolean",
    )


# --- Arrow-optimized scalar Python UDF --------------------------------------

_ARROW_UDF_ORACLE = """
SELECT doc_id,
       LEN(STRING_SPLIT(text, ' ')) - 1 AS n_spaces,
       UPPER(SUBSTRING(lang, 1, 1)) || SUBSTRING(lang, 2) AS lang_title
FROM documents WHERE doc_id < 100
"""


@register("u_arrow_python_udf", oracle=_ARROW_UDF_ORACLE, tags=("U1",))
def u_arrow_python_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """@udf(useArrow=True) — the Spark 4 Arrow-optimized scalar Python
    UDF: per-ROW Python semantics (simplest escape hatch) but Arrow
    batch transfer instead of pickled rows, ~2-5x over legacy pickling.
    Still ~10-100x slower than pandas_udf's vectorized kernels — this
    query exists to cover the surface and document the hierarchy:
    builtin >> pandas_udf >> arrow udf >> pickled udf. The logic is
    trivially SQL-expressible on purpose, so the oracle pins the UDF
    machinery, not the math."""
    from pyspark.sql.functions import udf

    @udf("int", useArrow=True)
    def count_spaces(s: str) -> int:
        return s.count(" ")

    @udf("string", useArrow=True)
    def title_first(s: str) -> str:
        return s[:1].upper() + s[1:] if s else s

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return d.select(
        "doc_id",
        count_spaces("text").alias("n_spaces"),
        title_first("lang").alias("lang_title"),
    )


# --- UDTF with a TABLE argument ---------------------------------------------

_UDTF_TABLE_ORACLE = """
WITH toks AS (
  SELECT doc_id, UNNEST(STRING_SPLIT(LOWER(text), ' ')[1:3]) AS w
  FROM documents WHERE doc_id < 50
)
SELECT doc_id, w, LENGTH(w) AS wlen FROM toks
"""


@register("u_udtf_table_arg", oracle=_UDTF_TABLE_ORACLE, tags=("U4", "E2"))
def u_udtf_table_arg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polymorphic UDTF invoked with a TABLE(...) argument from SQL —
    the Spark 4 form that makes a Python table function composable in
    the FROM clause like any relation (vs the LATERAL-only scalar-arg
    form in u_udtf_leading_words). Rows stream through eval()
    per-partition; no state crosses partitions, so the expansion
    parallelizes like explode. Logic is deliberately SQL-expressible so
    the oracle pins the invocation machinery."""
    from pyspark.sql.functions import udtf

    from ..catalog import load_tables

    @udtf(returnType="doc_id bigint, w string, wlen int")
    class LeadingTokens:
        def eval(self, row):
            text = row["text"] or ""
            for w in text.lower().split(" ")[:3]:
                yield (row["doc_id"], w, len(w))

    spark.udtf.register("leading_tokens", LeadingTokens)
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT t.doc_id, t.w, t.wlen
        FROM leading_tokens(
          TABLE(SELECT doc_id, text FROM documents WHERE doc_id < 50)
        ) AS t
        """
    )


# --- U2 (Arrow-native): grouped applyInArrow -------------------------------

_ARROW_GROUP_ORACLE = """
SELECT o_orderstatus,
       COUNT(*)                                        AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents,
       MAX(o_orderkey)                                 AS max_key
FROM orders
GROUP BY o_orderstatus
"""


def _arrow_group_stats(table):
    """pyarrow.Table -> pyarrow.Table: per-group stats computed with
    Arrow compute kernels — no pandas conversion at all. Integer-cents
    rounding happens element-wise before the sum, so the reduction is
    exact integer arithmetic."""
    import pyarrow as pa
    import pyarrow.compute as pc

    cents = pc.cast(
        pc.round(pc.multiply(table.column("o_totalprice"), pa.scalar(100.0))),
        pa.int64(),
    )
    return pa.table(
        {
            "o_orderstatus": [table.column("o_orderstatus")[0].as_py()],
            "n_orders": [table.num_rows],
            "total_cents": [pc.sum(cents).as_py()],
            "max_key": [pc.max(table.column("o_orderkey")).as_py()],
        }
    )


@register("u_grouped_apply_in_arrow", oracle=_ARROW_GROUP_ORACLE, tags=("U2", "U5"))
def u_grouped_apply_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy().applyInArrow — the Arrow-native grouped-map variant:
    each group arrives as a pyarrow.Table and the function answers with
    one, skipping the pandas conversion layer entirely (no NaN/None
    coercion, no index machinery — the right choice when the logic is
    expressible in Arrow compute kernels). Same shuffle shape as
    applyInPandas: one hash exchange on the group key."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_orderkey", "o_totalprice"
    )
    return orders.groupBy("o_orderstatus").applyInArrow(
        _arrow_group_stats,
        "o_orderstatus string, n_orders long, total_cents long, max_key long",
    )


# --- U2 (Arrow-native, cogrouped): cogroup().applyInArrow ------------------

_COGROUP_ARROW_ORACLE = """
SELECT o.o_orderstatus,
       CAST(COUNT(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders,
       CAST(COUNT(l.l_orderkey) AS BIGINT)          AS n_items
FROM orders o LEFT JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY o.o_orderstatus
"""


def _arrow_cogroup_stats(left, right):
    """(orders group, lineitem group) -> one stats row, all in Arrow
    kernels: count of distinct orders on the left, matched line items
    on the right (both sides arrive pre-bucketed by the cogroup key)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    status = left.column("o_orderstatus")[0].as_py()
    n_orders = pc.count_distinct(left.column("o_orderkey")).as_py()
    left_keys = pc.unique(left.column("o_orderkey"))
    matched = pc.is_in(right.column("l_orderkey"), value_set=left_keys)
    return pa.table(
        {
            "o_orderstatus": [status],
            "n_orders": [n_orders],
            "n_items": [pc.sum(pc.cast(matched, pa.int64())).as_py() or 0],
        }
    )


@register(
    "u_cogrouped_apply_in_arrow", oracle=_COGROUP_ARROW_ORACLE, tags=("U2", "J3")
)
def u_cogrouped_apply_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cogroup().applyInArrow — two tables bucketed on the same key
    arrive as a pyarrow.Table pair per key: the custom-join escape
    hatch in its Arrow-native form (here a per-status orders/lineitem
    reconciliation). Both sides shuffle once on the cogroup key; the
    kernels never leave Arrow."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_orderkey"
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    # Cogroup key: order status on the left; line items join through
    # their order key mapped to status via a broadcast of the (tiny)
    # distinct mapping — keeps the example a pure cogroup demo.
    key_map = F.broadcast(
        load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    )
    li_with_status = li.join(
        key_map, li.l_orderkey == key_map.o_orderkey, "inner"
    ).select("l_orderkey", F.col("o_orderstatus").alias("status"))
    return (
        orders.groupBy("o_orderstatus")
        .cogroup(li_with_status.groupBy("status"))
        .applyInArrow(
            _arrow_cogroup_stats,
            "o_orderstatus string, n_orders long, n_items long",
        )
    )


# --- U3+U4 composed: pandas UDAF feeding a UDTF unpivot ---------------------

_UDAF_UDTF_ORACLE = """
WITH agg AS (
  SELECT event_type,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS total_cents,
         COUNT(*) AS n
  FROM events
  GROUP BY event_type
)
SELECT event_type, 'total_cents' AS stat, total_cents AS v FROM agg
UNION ALL
SELECT event_type, 'n' AS stat, n AS v FROM agg
"""


def _make_cents_sum_udaf():
    @pandas_udf("long")
    def cents_sum(v: pd.Series) -> int:
        import numpy as np

        # Half-away-from-zero, matching SQL ROUND / joins.cents — NOT
        # pandas .round(), whose numpy half-to-even diverges on exact
        # .5 cents (the ADVICE.md streaming_parity finding, applied
        # everywhere pandas rounds money).
        x = v.to_numpy(dtype="float64") * 100.0
        return int(np.trunc(x + np.copysign(0.5, x)).astype("int64").sum())

    return cents_sum


def _make_row_count_udaf():
    @pandas_udf("long")
    def n_rows(v: pd.Series) -> int:
        return int(len(v))

    return n_rows


@register("u_udaf_udtf_compose", oracle=_UDAF_UDTF_ORACLE, tags=("U3", "U4"))
def u_udaf_udtf_compose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two Python escape hatches composed end to end: a GROUPED_AGG
    pandas UDAF reduces the event feed to per-type (total_cents, n) —
    integer-exact so partition order can't drift the sum — then a UDTF
    invoked with a TABLE argument unpivots each aggregate row into
    (stat, value) rows, the long-format shape metric stores ingest.
    The UDAF runs Arrow-batched inside the groupBy (one shuffle); the
    UDTF streams the 5 aggregate rows — per-row Python is fine AFTER
    aggregation collapses cardinality, which is the rule for where a
    UDTF may sit in a 100 TB plan (never on the fact side)."""
    e = load_table(spark, sf_dir, "events")
    agged = e.groupBy("event_type").agg(
        _make_cents_sum_udaf()("value").alias("total_cents"),
        _make_row_count_udaf()("value").alias("n"),
    )

    @udtf(returnType="event_type string, stat string, v bigint")
    class UnpivotStats:
        def eval(self, row):
            yield (row["event_type"], "total_cents", row["total_cents"])
            yield (row["event_type"], "n", row["n"])

    spark.udtf.register("unpivot_stats", UnpivotStats)
    agged.createOrReplaceTempView("u_compose_agged")
    return spark.sql(
        """
        SELECT t.event_type, t.stat, t.v
        FROM unpivot_stats(
          TABLE(SELECT event_type, total_cents, n FROM u_compose_agged)
        ) AS t
        """
    )


# --- UDTF with analyze(): plan-time dynamic output schema -------------------

_UDTF_ANALYZE_ORACLE = """
SELECT doc_id,
       STRING_SPLIT(text, ' ')[1] AS tok0,
       STRING_SPLIT(text, ' ')[2] AS tok1,
       STRING_SPLIT(text, ' ')[3] AS tok2,
       STRING_SPLIT(text, ' ')[4] AS tok3
FROM documents
WHERE doc_id < 100
"""


@register("u_udtf_analyze_schema", oracle=_UDTF_ANALYZE_ORACLE, tags=("U4", "E2", "F1"))
def u_udtf_analyze_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polymorphic UDTF whose OUTPUT SCHEMA is computed at plan time by
    a static analyze() method from a literal argument (Spark 3.5+/4
    AnalyzeResult) — here `split_fixed(text, 4)` resolves to four
    tok0..tok3 string columns before any data moves, so Catalyst can
    prune/optimize the dynamic columns like statically declared ones.
    The third distinct UDTF invocation form in the registry (static
    returnType: u_udtf_leading_words; TABLE argument: u_udtf_table_arg).
    Splitting is SQL-expressible on purpose: the oracle pins the
    analyze machinery, not the string logic. Out-of-range positions
    yield NULL on both engines (list_extract past the end vs explicit
    None padding)."""
    from pyspark.sql.functions import udtf

    from ..catalog import load_tables

    class SplitFixed:
        @staticmethod
        def analyze(text, n):
            from pyspark.sql.types import StringType, StructType
            from pyspark.sql.udtf import AnalyzeResult

            schema = StructType()
            for i in range(n.value):
                schema = schema.add(f"tok{i}", StringType())
            return AnalyzeResult(schema=schema)

        def eval(self, text, n):
            toks = (text or "").split(" ")
            yield tuple(toks[i] if i < len(toks) else None for i in range(n))

    spark.udtf.register("split_fixed", udtf(SplitFixed))
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT doc_id, s.*
        FROM (SELECT doc_id, text FROM documents WHERE doc_id < 100),
             LATERAL split_fixed(text, 4) s
        """
    )


# --- pandas API on Spark: the drop-in pandas layer --------------------------

_PS_ORACLE = """
SELECT c_mktsegment,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal_cents,
       CAST(MIN(c_custkey) AS BIGINT) AS min_key
FROM customer
WHERE c_acctbal > 0.0
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


@register("u_pandas_on_spark_api", oracle=_PS_ORACLE, tags=("U1", "A1", "P2"))
def u_pandas_on_spark_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas API on Spark (pyspark.pandas): the pandas-idiom surface
    (filter mask, assign, groupby().agg(), reset_index, sort) compiled
    to the SAME Catalyst plans the DataFrame API produces — no
    collect, no pandas materialization; `to_spark()` hands back the
    lazy plan. This is the migration path for pandas codebases onto
    100 TB inputs, so the registry covers it as an entry point (the
    oracle pins that the pandas idioms mean what SQL means). Cents are
    computed pre-groupby with the same round-then-cast as CENTS_SQL."""
    import pyspark.pandas as ps

    from ..catalog import load_table

    # ps.DataFrame over the already-normalized batch table (attach to
    # plan, not to a path, so the catalog's session fixes apply).
    pdf = load_table(spark, sf_dir, "customer").pandas_api()
    pdf = pdf[pdf["c_acctbal"] > 0.0]
    pdf = pdf.assign(bal_cents=(pdf["c_acctbal"] * 100).round(0).astype("int64"))
    out = (
        pdf.groupby("c_mktsegment")
        .agg(
            n_customers=("c_custkey", "count"),
            bal_cents=("bal_cents", "sum"),
            min_key=("c_custkey", "min"),
        )
        .reset_index()
        .sort_values("c_mktsegment")
    )
    sdf = out.to_spark()
    return sdf.select(
        "c_mktsegment",
        F.col("n_customers").cast("long").alias("n_customers"),
        F.col("bal_cents").cast("long").alias("bal_cents"),
        F.col("min_key").cast("long").alias("min_key"),
    )


_UDTF_PART_ORACLE = """
WITH ranked AS (
  SELECT lang, doc_id, n_chars,
         ROW_NUMBER() OVER (PARTITION BY lang
           ORDER BY n_chars DESC, doc_id) AS rk
  FROM documents
)
SELECT lang, doc_id, n_chars, CAST(rk AS INT) AS rk
FROM ranked WHERE rk <= 2
ORDER BY lang, rk
"""


@register("u_udtf_partition_by", oracle=_UDTF_PART_ORACLE, tags=("U4", "E2", "W4"))
def u_udtf_partition_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDTF over a PARTITIONED table argument — `TABLE(...) PARTITION
    BY lang ORDER BY ...` (Spark 4): the engine groups and sorts rows
    BEFORE the Python function sees them, so eval() observes one
    ordered partition at a time and terminate() fires at each
    partition boundary — the protocol for per-group streaming logic in
    a table function (here: top-2 longest docs per language, emitted
    from bounded per-partition state). The relational equivalent is a
    rank window, which is exactly what the oracle pins — the query
    verifies the PARTITION BY/ORDER BY delivery contract, not novel
    logic.

    Scale: the partitioning clause is a real shuffle planned by
    Catalyst (same exchange as the window form); Python state is O(k)
    per partition because rows arrive ordered — no per-group
    collect."""
    from pyspark.sql.functions import udtf

    from ..catalog import load_tables

    @udtf(returnType="lang string, doc_id bigint, n_chars bigint, rk int")
    class TopLongest:
        def __init__(self):
            self._emitted = 0
            self._lang = None

        def eval(self, row):
            # Rows arrive ordered by (n_chars DESC, doc_id) within each
            # lang partition; emit the first two only.
            self._lang = row["lang"]
            if self._emitted < 2:
                self._emitted += 1
                yield (
                    row["lang"], row["doc_id"], row["n_chars"], self._emitted
                )

    spark.udtf.register("top_longest", TopLongest)
    load_tables(spark, sf_dir, ("documents",))
    return spark.sql(
        """
        SELECT t.lang, t.doc_id, t.n_chars, t.rk
        FROM top_longest(
          TABLE(SELECT lang, doc_id, n_chars FROM documents)
          PARTITION BY lang ORDER BY (n_chars DESC, doc_id)
        ) t
        ORDER BY t.lang, t.rk
        """
    )


_GROUPED_OLS_ORACLE = """
WITH pts AS (
  SELECT c_mktsegment AS seg,
         CAST(c_custkey AS DOUBLE) AS x,
         CAST(ROUND(c_acctbal * 100) AS BIGINT) AS y_cents
  FROM customer
),
stats AS (
  SELECT seg, COUNT(*) AS n,
         CAST(SUM(x) AS DOUBLE) AS sx,
         CAST(SUM(y_cents) AS DOUBLE) AS sy,
         CAST(SUM(x * y_cents) AS DOUBLE) AS sxy,
         CAST(SUM(x * x) AS DOUBLE) AS sxx
  FROM pts GROUP BY seg
)
SELECT seg, n,
       ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
       ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
         AS intercept
FROM stats
ORDER BY seg
"""


@register(
    "u_grouped_ols_fit",
    oracle=_GROUPED_OLS_ORACLE,
    tags=("U2", "A1", "F3"),
)
def u_grouped_ols_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group model fitting — the canonical "many small models"
    grouped-map pattern: one OLS fit (balance vs custkey) per market
    segment runs INSIDE applyInPandas, each group's data arriving as a
    pandas frame on one executor. The Python side computes the SAME
    closed-form normal equations the SQL oracle uses (deliberately NOT
    numpy.lstsq: SVD's float path differs in final ulps, the closed
    form is reproducible) — so the query proves the grouped-map
    machinery delivers every row of every group exactly once.

    Scale: one shuffle on the grouping key; each model fits in one
    task's memory because per-group data does (the applyInPandas
    contract) — 10⁶ segments fit 10⁶ models embarrassingly parallel.
    Sufficient sums accumulate in numpy float64 from a SORTED frame
    (deterministic summation order within the group).
    """
    import pandas as pd

    d = load_table(spark, sf_dir, "customer").select(
        F.col("c_mktsegment").alias("seg"),
        F.col("c_custkey").cast("double").alias("x"),
        cents(F.col("c_acctbal")).alias("y_cents"),
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("x", kind="mergesort")
        n = float(len(pdf))
        x = pdf["x"].to_numpy()
        y = pdf["y_cents"].to_numpy().astype("float64")
        sx, sy = float(x.sum()), float(y.sum())
        sxy = float((x * y).sum())
        sxx = float((x * x).sum())
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        intercept = (sy - slope * sx) / n
        return pd.DataFrame(
            {
                "seg": [pdf["seg"].iloc[0]],
                "n": [int(n)],
                "slope": [round(slope, 6)],
                "intercept": [round(intercept, 6)],
            }
        )

    return (
        d.groupBy("seg")
        .applyInPandas(fit, "seg string, n long, slope double, intercept double")
        .orderBy("seg")
    )


# ---------------------------------------------------------------------------
# U3: pandas grouped-agg UDAF Gini, cross-checked against the SQL rank form
# ---------------------------------------------------------------------------

_UDAF_GINI_ORACLE = f"""
WITH spend AS (
  SELECT c.c_mktsegment, o.o_custkey,
         CAST(SUM({CENTS_SQL.format(expr="o_totalprice")}) AS BIGINT)
           AS spend_cents
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY c.c_mktsegment, o.o_custkey
),
ranked AS (
  SELECT c_mktsegment, spend_cents,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
           ORDER BY spend_cents, o_custkey) AS i
  FROM spend
),
seg AS (
  SELECT c_mktsegment, COUNT(*) AS n,
         CAST(SUM(spend_cents) AS BIGINT) AS total_cents,
         CAST(SUM(i * spend_cents) AS BIGINT) AS weighted
  FROM ranked GROUP BY c_mktsegment
)
SELECT c_mktsegment, n, total_cents,
       ROUND((2.0 * weighted - (n + 1.0) * total_cents)
             / (CAST(n AS DOUBLE) * total_cents), 6) AS gini
FROM seg
ORDER BY c_mktsegment
"""


def _make_gini_udaf():
    import math

    import numpy as np

    @pandas_udf("double")
    def gini_udaf(x: pd.Series) -> float:
        # Exact-integer rank form: sort values ascending, i = 1..n,
        # G = (2Σi·x − (n+1)Σx)/(nΣx). The Σi·x weight is invariant
        # under tie order (equal x swap freely), so sorting VALUES only
        # matches the oracle's (value, custkey) total order. Arithmetic
        # mirrors the oracle's double tree; final rounding is explicit
        # half-away-from-zero (Python round() is banker's).
        v = np.sort(x.to_numpy(dtype="int64"))
        n = len(v)
        total = int(v.sum())
        weighted = int((np.arange(1, n + 1, dtype="int64") * v).sum())
        g = (2.0 * weighted - (n + 1.0) * total) / (float(n) * total)
        return math.floor(g * 1000000 + 0.5) / 1000000

    return gini_udaf


def _make_long_udafs():
    @pandas_udf("long")
    def n_udaf(x: pd.Series) -> int:
        return int(len(x))

    @pandas_udf("long")
    def sum_udaf(x: pd.Series) -> int:
        return int(x.to_numpy(dtype="int64").sum())

    return n_udaf, sum_udaf


@register(
    "u_udaf_gini_crosscheck",
    oracle=_UDAF_GINI_ORACLE,
    tags=("U3", "A1", "J1", "F3"),
)
def u_udaf_gini_crosscheck(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment Gini computed by a pandas grouped-agg UDAF and
    hash-checked against the pure-SQL rank formulation
    (`a_gini_concentration`'s oracle verbatim) — the Arrow UDAF path
    proven value-identical to Catalyst window arithmetic, which is the
    guarantee a user needs before trusting custom Python aggregates on
    money columns.

    Scale notes: the heavy pass is the (segment, customer) rollup;
    the UDAF receives one Arrow batch per segment (customer-bounded,
    not row-bounded) and runs O(n log n) numpy sort per group — the
    exact shape MLlib-free custom metrics take at 100 TB. Exact int64
    rank weights (Σi·x far from overflow through sf1), double formula
    mirroring the oracle's tree, explicit half-away rounding (Python
    round() is banker's and WOULD diverge)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    spend = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("c_mktsegment", "o_custkey")
        .agg(
            F.sum(cents(F.col("o_totalprice")))
            .cast("long")
            .alias("spend_cents")
        )
    )
    n_udaf, sum_udaf = _make_long_udafs()
    # Spark forbids mixing pandas UDAFs with built-in aggregates in one
    # agg() — so n/total are (trivial) pandas UDAFs too, keeping the
    # whole aggregation on the Arrow path.
    return (
        spend.groupBy("c_mktsegment")
        .agg(
            n_udaf("spend_cents").alias("n"),
            sum_udaf("spend_cents").alias("total_cents"),
            _make_gini_udaf()("spend_cents").alias("gini"),
        )
        .orderBy("c_mktsegment")
    )


# --- U3, second wave: exact-integer variance as a pandas UDAF --------------

_UDAF_VARIANCE_ORACLE = """
SELECT o_orderpriority AS priority,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(*) * SUM(tp * tp) - SUM(tp) * SUM(tp) AS DOUBLE)
         / CAST(COUNT(*) * COUNT(*) AS DOUBLE) AS var_cents2
FROM (
  SELECT o_orderpriority, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS tp
  FROM orders
) t
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def _make_variance_udafs():
    @pandas_udf("long")
    def n_udaf(x: pd.Series) -> int:
        return int(len(x))

    @pandas_udf("double")
    def varpop_udaf(x: pd.Series) -> float:
        # Arbitrary-precision integer sums (sum of cents^2 exceeds int64
        # at sf>=0.01), so the only float operations are the two final
        # int->double conversions and one division — bit-identical to
        # the oracle's CAST(HUGEINT AS DOUBLE) / CAST(... AS DOUBLE).
        vals = [int(v) for v in x]
        n = len(vals)
        s = sum(vals)
        s2 = sum(v * v for v in vals)
        return float(n * s2 - s * s) / float(n * n)

    return n_udaf, varpop_udaf


@register(
    "u_udaf_exact_variance",
    oracle=_UDAF_VARIANCE_ORACLE,
    tags=("U3", "A1", "A8"),
)
def u_udaf_exact_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3, second wave: population variance of order value (in cents²)
    as a pandas GROUPED_AGG UDAF using arbitrary-precision integer
    sufficient statistics — the moment formula (n·Σx² − (Σx)²) / n²
    evaluated exactly in Python ints, with floats entering only at the
    final division. Hash-checked against DuckDB computing the same tree
    in HUGEINT, proving the Arrow UDAF path is value-identical to
    exact SQL arithmetic (the naive float Welford loop would NOT be:
    accumulation order differs per partition).

    Scale notes: each group arrives as one Arrow batch (5 groups here);
    the sufficient statistics are a single O(n) pass per group and the
    UDAF output is one row per group — the canonical shape for custom
    numeric aggregates when a built-in (var_pop) exists but a bespoke
    formula (trimmed/robust variants) does not."""
    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        F.col("o_orderpriority").alias("priority"),
        cents(F.col("o_totalprice")).alias("tp"),
    )
    n_udaf, varpop_udaf = _make_variance_udafs()
    return (
        base.groupBy("priority")
        .agg(
            n_udaf("tp").alias("n"),
            varpop_udaf("tp").alias("var_cents2"),
        )
        .orderBy("priority")
    )


# --- U3, third wave: pandas UDAF evaluated over a WINDOW ---------------------

_UDAF_WINDOW_ORACLE = """
WITH m AS (
  SELECT o_orderpriority AS priority,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS tp,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
              OVER (PARTITION BY o_orderpriority) AS DOUBLE)
         / CAST(COUNT(*) OVER (PARTITION BY o_orderpriority) AS DOUBLE)
           AS grp_mean
  FROM orders
)
SELECT priority,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN tp > grp_mean THEN 1 ELSE 0 END) AS BIGINT)
         AS n_above_mean,
       CAST(SUM(CASE WHEN tp > grp_mean THEN 1 ELSE 0 END) * 1000000
            // COUNT(*) AS BIGINT) AS above_ppm
FROM m
GROUP BY priority
ORDER BY priority
"""


def _make_window_mean_udaf():
    @pandas_udf("double")
    def mean_udaf(x: pd.Series) -> float:
        # Exact integer sum, float only at the final division — matches
        # the oracle's CAST(SUM AS DOUBLE)/CAST(COUNT AS DOUBLE) tree.
        vals = [int(v) for v in x]
        return float(sum(vals)) / float(len(vals))

    return mean_udaf


@register(
    "u_udaf_window_mean",
    oracle=_UDAF_WINDOW_ORACLE,
    tags=("U3", "W3", "A1", "A7"),
)
def u_udaf_window_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3, third wave: a pandas GROUPED_AGG UDAF evaluated OVER A WINDOW
    (unbounded frame) — the third execution surface for custom
    aggregates after .agg() and SQL registration: Spark feeds the UDAF
    each partition's full frame and broadcasts the scalar back to every
    row, so per-row comparisons against a custom group statistic need
    no self-join. Here each order is compared to its priority group's
    exact-integer mean; the rollup counts the above-mean fraction.

    Scale: one shuffle on the window key; the UDAF runs once per group
    (not per row); the follow-up rollup is combinable."""
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("priority")
    mean_udaf = _make_window_mean_udaf()
    scored = orders.select(
        F.col("o_orderpriority").alias("priority"),
        cents(F.col("o_totalprice")).alias("tp"),
    ).withColumn("grp_mean", mean_udaf("tp").over(w))
    return (
        scored.groupBy("priority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.when(F.col("tp") > F.col("grp_mean"), 1).otherwise(0))
            .cast("long")
            .alias("n_above_mean"),
            F.expr(
                "CAST(SUM(CASE WHEN tp > grp_mean THEN 1 ELSE 0 END) "
                "* 1000000 DIV COUNT(*) AS BIGINT)"
            ).alias("above_ppm"),
        )
        .orderBy("priority")
    )


# --- U4, third wave: UDTF emitting ONLY at terminate() -----------------------

_UDTF_TERMINATE_ORACLE = """
SELECT o_orderpriority AS priority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM orders
GROUP BY o_orderpriority
ORDER BY priority
"""


@register(
    "u_udtf_terminate_rollup",
    oracle=_UDTF_TERMINATE_ORACLE,
    tags=("U4", "A1", "E2"),
)
def u_udtf_terminate_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U4, third wave: a UDTF whose rows come ONLY from terminate() —
    eval() just accumulates per-partition state (count + exact integer
    cents sum) and the boundary flush emits one summary row per
    PARTITION BY group. This is the streaming-accumulator protocol
    (flush-at-boundary), distinct from the emit-as-you-go shape of
    u_udtf_partition_by; the oracle is the plain GROUP BY the UDTF must
    reproduce exactly.

    Scale: the PARTITION BY is a Catalyst-planned shuffle; Python state
    is two integers per partition."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="priority string, n_orders bigint, total_cents bigint")
    class TerminateRollup:
        def __init__(self):
            self._priority = None
            self._n = 0
            self._total = 0

        def eval(self, row):
            self._priority = row["o_orderpriority"]
            self._n += 1
            self._total += int(row["tp"])

        def terminate(self):
            if self._n:
                yield self._priority, self._n, self._total

    orders = load_table(spark, sf_dir, "orders")
    orders.select(
        "o_orderpriority", cents(F.col("o_totalprice")).alias("tp")
    ).createOrReplaceTempView("udtf_term_src")
    spark.udtf.register("terminate_rollup", TerminateRollup)
    return spark.sql(
        """
        SELECT priority, n_orders, total_cents
        FROM terminate_rollup(
          TABLE(udtf_term_src) PARTITION BY o_orderpriority
        )
        ORDER BY priority
        """
    )


# --- U1, fourth wave: Arrow scalar pandas UDF banding --------------------------

_PANDAS_BAND_ORACLE = f"""
SELECT band,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM({CENTS_SQL.format(expr="value")}) AS BIGINT) AS value_cents
FROM (
  SELECT LEAST({CENTS_SQL.format(expr="value")} // 500, 9) AS band, value
  FROM events
)
GROUP BY band
ORDER BY band
"""


@register(
    "u_pandas_scalar_band",
    oracle=_PANDAS_BAND_ORACLE,
    tags=("U1", "F3", "A1"),
)
def u_pandas_scalar_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1, fourth wave: a Series→Series pandas (Arrow) scalar UDF doing
    integer banding — cents // 500 capped at band 9 — checked against
    the identical integer arithmetic in SQL. The point is the TRANSPORT
    proof: values cross the JVM→Arrow→pandas boundary and come back
    bit-identical to the JVM-side formula (float-cents rounding included).

    Scale: Arrow-vectorized batches (no per-row Python dispatch);
    banding is embarrassingly parallel; the rollup is combinable."""
    import numpy as np

    @pandas_udf("long")
    def band_of(v: pd.Series) -> pd.Series:
        cents_i = np.rint(v.to_numpy() * 100).astype("int64")
        return pd.Series(np.minimum(cents_i // 500, 9))

    events = load_table(spark, sf_dir, "events")
    return (
        events.select(band_of(F.col("value")).alias("band"), "value")
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(cents(F.col("value"))).cast("long").alias("value_cents"),
        )
        .orderBy("band")
    )


# --- U3, fourth wave: trimmed-mean pandas UDAF --------------------------------

_TRIMMED_MEAN_ORACLE = """
WITH c AS (
  SELECT o_orderpriority AS priority,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS tp
  FROM orders
)
SELECT priority,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST((CAST(SUM(tp) AS BIGINT) - MIN(tp) - MAX(tp)) * 1000
            // (COUNT(*) - 2) AS BIGINT) AS trimmed_mean_milli
FROM c
GROUP BY priority
ORDER BY priority
"""


@register(
    "u_udaf_trimmed_mean",
    oracle=_TRIMMED_MEAN_ORACLE,
    tags=("U3", "A8", "A1"),
)
def u_udaf_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3, fourth wave: a robust (min/max-trimmed) mean as a pandas
    GROUPED_AGG UDAF over exact integer cents — sum minus extremes,
    integer-milli division at the end, so the Arrow round trip is
    bit-checkable against HUGEINT SQL (a float mean would drift with
    accumulation order). The bespoke-statistic shape U3 exists for:
    var_pop is built in, trimmed means are not.

    Scale: one Arrow batch per group (5 groups), O(n) per group, one
    scalar out."""

    @pandas_udf("long")
    def trimmed_mean_milli(tp: pd.Series) -> int:
        vals = tp.to_numpy()
        n = len(vals)
        if n <= 2:
            return 0
        s = int(vals.sum()) - int(vals.min()) - int(vals.max())
        return (s * 1000) // (n - 2)

    # JVM aggregates can't share an .agg() with GROUPED_AGG pandas UDFs
    # (INVALID_PANDAS_UDF_PLACEMENT) — the count rides along as a UDAF.
    n_udaf = _make_count_udaf()
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            F.col("o_orderpriority").alias("priority"),
            cents(F.col("o_totalprice")).alias("tp"),
        )
        .groupBy("priority")
        .agg(
            n_udaf("tp").alias("n"),
            trimmed_mean_milli("tp").alias("trimmed_mean_milli"),
        )
        .orderBy("priority")
    )


# --- U4, fourth wave: emit-as-you-go UDTF with checkpoint rows ----------------

_UDTF_BALANCE_ORACLE = """
WITH seq AS (
  SELECT o_orderpriority AS priority,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS tp,
         ROW_NUMBER() OVER w AS rn,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) OVER (
           PARTITION BY o_orderpriority ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS running_cents
  FROM orders
  WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderdate, o_orderkey)
)
SELECT priority, CAST(rn AS BIGINT) AS rn, running_cents
FROM seq WHERE rn % 500 = 0
ORDER BY priority, rn
"""


@register(
    "u_udtf_running_balance",
    oracle=_UDTF_BALANCE_ORACLE,
    tags=("U4", "W3", "A1"),
)
def u_udtf_running_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U4, fourth wave: an emit-as-you-go UDTF over ORDERED partitions —
    eval() keeps a running integer balance per PARTITION BY group and
    emits a checkpoint row every 500 input rows (the ledger-audit
    shape: bounded output from unbounded ordered input). The oracle is
    the framed window sum the UDTF must reproduce exactly, which pins
    both the ORDER BY contract of TABLE(...) partitions and the
    integer-cents transport.

    Scale: the PARTITION BY/ORDER BY is a Catalyst shuffle+sort; Python
    state is two integers; output is input/500 rows."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="priority string, rn bigint, running_cents bigint")
    class RunningBalance:
        def __init__(self):
            self._rn = 0
            self._bal = 0

        def eval(self, row):
            self._rn += 1
            self._bal += int(row["tp"])
            if self._rn % 500 == 0:
                yield row["o_orderpriority"], self._rn, self._bal

    orders = load_table(spark, sf_dir, "orders")
    orders.select(
        "o_orderpriority",
        "o_orderdate",
        "o_orderkey",
        cents(F.col("o_totalprice")).alias("tp"),
    ).createOrReplaceTempView("udtf_balance_src")
    spark.udtf.register("running_balance", RunningBalance)
    return spark.sql(
        """
        SELECT priority, rn, running_cents
        FROM running_balance(
          TABLE(udtf_balance_src)
          PARTITION BY o_orderpriority
          ORDER BY (o_orderdate, o_orderkey)
        )
        ORDER BY priority, rn
        """
    )


# --- U5, fourth wave: iterator mapInPandas partial aggregation ----------------

_ITER_PARTIAL_ORACLE = f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(MIN({CENTS_SQL.format(expr="l_extendedprice")}) AS BIGINT) AS min_cents,
       CAST(MAX({CENTS_SQL.format(expr="l_extendedprice")}) AS BIGINT) AS max_cents,
       CAST(SUM({CENTS_SQL.format(expr="l_extendedprice")}) AS BIGINT) AS sum_cents
FROM lineitem
"""


@register(
    "u_iter_partial_stats",
    oracle=_ITER_PARTIAL_ORACLE,
    tags=("U5", "A2"),
)
def u_iter_partial_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U5, fourth wave: the map-side-combine protocol hand-built with an
    ITERATOR mapInPandas UDF — each Arrow batch is folded into one
    partial-stats row (n/min/max/sum in exact integer cents) inside the
    iterator, and a JVM-side global aggregate merges the partials. The
    batch boundaries are partitioning-dependent, but every output stat
    is merge-invariant, so the result is bit-stable under ANY layout —
    the associativity argument stated as a query.

    Scale: driver sees nothing; per task the Python side holds one
    batch; the merge input is one row per batch, not per record."""

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for b in batches:
            c = np.rint(b["l_extendedprice"].to_numpy() * 100).astype("int64")
            if len(c) == 0:
                continue
            yield pd.DataFrame(
                {
                    "n": [len(c)],
                    "mn": [int(c.min())],
                    "mx": [int(c.max())],
                    "sm": [int(c.sum())],
                }
            )

    li = load_table(spark, sf_dir, "lineitem").select("l_extendedprice")
    part = li.mapInPandas(partials, "n long, mn long, mx long, sm long")
    return part.agg(
        F.sum("n").cast("long").alias("n_rows"),
        F.min("mn").cast("long").alias("min_cents"),
        F.max("mx").cast("long").alias("max_cents"),
        F.sum("sm").cast("long").alias("sum_cents"),
    )


# --- U3+U4, fifth wave: decile-trimmed-sum UDAF unpivoted by a UDTF ----------

_TRIMSUM_UDTF_ORACLE = """
WITH c AS (
  SELECT event_type,
         CAST(ROUND(value * 100) AS BIGINT) AS v_cents,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY CAST(ROUND(value * 100) AS BIGINT)) AS rk,
         COUNT(*)    OVER (PARTITION BY event_type) AS n
  FROM events
),
agged AS (
  SELECT event_type,
         CAST(MAX(n) AS BIGINT)       AS n,
         CAST(MAX(n) // 10 AS BIGINT) AS k_trimmed,
         CAST(SUM(CASE WHEN rk > n // 10 AND rk <= n - n // 10
                       THEN v_cents ELSE 0 END) AS BIGINT) AS trimmed_cents
  FROM c GROUP BY event_type
)
SELECT event_type, stat, val FROM (
  SELECT event_type, 'n' AS stat, n AS val FROM agged
  UNION ALL
  SELECT event_type, 'k_trimmed', k_trimmed FROM agged
  UNION ALL
  SELECT event_type, 'trimmed_cents', trimmed_cents FROM agged
)
"""


@register("u_udaf_trimsum_udtf_unpivot", oracle=_TRIMSUM_UDTF_ORACLE, tags=("U3", "U4"))
def u_udaf_trimsum_udtf_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3+U4, fifth wave: a grouped-agg pandas UDAF computes the
    decile-trimmed sum per event type (drop the n//10 smallest and
    largest cents — all-integer, sort-order deterministic: equal values
    are interchangeable in a sum), then a TABLE-argument UDTF unpivots
    each group row into (stat, val) rows — the UDAF/UDTF handshake:
    vectorized aggregate in, table function out.

    Scale: the UDAF sorts each group's cents inside one Arrow batch
    (groups = 5 event types; per-group data fits by construction at any
    sf because the trim is a per-type statistic job, not a per-user
    one); the UDTF streams the 5-row aggregate, trivially parallel."""
    import numpy as np

    from pyspark.sql.functions import udtf

    @pandas_udf("long")
    def trimmed_sum_cents(v: pd.Series) -> int:
        # Half-away-from-zero (matches the oracle's SQL ROUND) — not
        # np.rint's half-to-even; see cents_sum above.
        x = v.to_numpy(dtype="float64") * 100.0
        cents_i = np.sort(np.trunc(x + np.copysign(0.5, x)).astype("int64"))
        k = len(cents_i) // 10
        return int(cents_i[k : len(cents_i) - k].sum())

    @pandas_udf("long")
    def n_rows(v: pd.Series) -> int:
        return int(len(v))

    agged = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            n_rows(F.col("value")).alias("n"),
            trimmed_sum_cents(F.col("value")).alias("trimmed_cents"),
        )
        .select(
            "event_type",
            "n",
            F.expr("n DIV 10").cast("long").alias("k_trimmed"),
            "trimmed_cents",
        )
    )
    agged.createOrReplaceTempView("u_trimsum_agged")

    @udtf(returnType="event_type string, stat string, val bigint")
    class UnpivotStats:
        def eval(self, row):
            yield (row["event_type"], "n", row["n"])
            yield (row["event_type"], "k_trimmed", row["k_trimmed"])
            yield (row["event_type"], "trimmed_cents", row["trimmed_cents"])

    spark.udtf.register("unpivot_trim_stats", UnpivotStats)
    return spark.sql(
        """
        SELECT t.event_type, t.stat, t.val
        FROM unpivot_trim_stats(
          TABLE(SELECT event_type, n, k_trimmed, trimmed_cents
                FROM u_trimsum_agged)
        ) AS t
        """
    )


# --- U1+P6, fifth wave: two-argument pandas scalar UDF (exact margin math) ---

_MARGIN_BAND_ORACLE = """
WITH m AS (
  SELECT l_returnflag,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)) // 100
           AS net_cents
  FROM lineitem
),
banded AS (
  SELECT l_returnflag,
         CASE WHEN net_cents < 2000000 THEN 'small'
              WHEN net_cents < 5000000 THEN 'mid'
              ELSE 'large' END AS band,
         net_cents
  FROM m
)
SELECT l_returnflag, band,
       CAST(COUNT(*) AS BIGINT)      AS n_items,
       CAST(SUM(net_cents) AS BIGINT) AS net_cents_sum
FROM banded
GROUP BY l_returnflag, band
"""


@register("u_pandas_margin_band", oracle=_MARGIN_BAND_ORACLE, tags=("U1", "P6"))
def u_pandas_margin_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1+P6, fifth wave: a TWO-ARGUMENT Series pandas UDF — net cents
    from (price, discount) in pure int64 (round to cents, apply the
    discount as an integer percentage, floor-divide) — proving
    multi-column Arrow transport keeps both operands aligned, then a
    CASE WHEN banding and a combinable rollup. The oracle states the
    identical integer pipeline; any drift in the Arrow boundary or the
    rounding would shift rows across band edges and break the hash.

    Scale: vectorized batches, no per-row dispatch; integer arithmetic
    (no float accumulation anywhere past the first rint)."""
    import numpy as np

    @pandas_udf("long")
    def net_cents(price: pd.Series, disc: pd.Series) -> pd.Series:
        # Half-away-from-zero money rounding (oracle uses SQL ROUND).
        xp = price.to_numpy(dtype="float64") * 100.0
        xd = disc.to_numpy(dtype="float64") * 100.0
        p = np.trunc(xp + np.copysign(0.5, xp)).astype("int64")
        d = np.trunc(xd + np.copysign(0.5, xd)).astype("int64")
        return pd.Series(p * (100 - d) // 100)

    li = load_table(spark, sf_dir, "lineitem")
    m = li.select(
        "l_returnflag",
        net_cents(F.col("l_extendedprice"), F.col("l_discount")).alias("net_cents"),
    )
    banded = m.select(
        "l_returnflag",
        F.when(F.col("net_cents") < 2_000_000, "small")
        .when(F.col("net_cents") < 5_000_000, "mid")
        .otherwise("large")
        .alias("band"),
        "net_cents",
    )
    return banded.groupBy("l_returnflag", "band").agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum("net_cents").cast("long").alias("net_cents_sum"),
    )


# --- U5+O2, sixth wave: per-partition top-k via iterator state ---------------

_ITER_TOPK_ORACLE = """
SELECT o_orderkey,
       CAST(ROUND(o_totalprice * 100) AS BIGINT) AS total_cents
FROM orders
ORDER BY total_cents DESC, o_orderkey ASC
LIMIT 10
"""


@register("u_iter_partition_topk", oracle=_ITER_TOPK_ORACLE, tags=("U5", "O2"))
def u_iter_partition_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U5+O2, sixth wave: map-side top-k pushdown hand-built with an
    ITERATOR mapInPandas UDF — the iterator keeps a running top-10
    ACROSS Arrow batches (true cross-batch state, which the per-batch
    partial-stats form never exercises) and emits one 10-row partial
    per PARTITION after the last batch; the JVM then resolves the
    global top-10 over |partitions| x 10 candidate rows.

    Scale: this is exactly Spark's own TakeOrderedAndProject strategy
    re-expressed through the Python iterator API — the shuffle carries
    k rows per partition instead of the fact table. All comparisons in
    exact integer cents; ties broken by ascending key on BOTH the
    partial and the final sort, so the result is partitioning-
    invariant."""
    import heapq

    def topk_iter(batches):
        import numpy as np

        heap = []  # min-heap of (cents, -orderkey): kept 10 largest
        for pdf in batches:
            # Half-away-from-zero (oracle: SQL ROUND), not pandas
            # .round()'s half-to-even.
            x = pdf["o_totalprice"].to_numpy(dtype="float64") * 100.0
            cents_i = pd.Series(np.trunc(x + np.copysign(0.5, x)).astype("int64"))
            for key, c in zip(pdf["o_orderkey"].astype("int64"), cents_i):
                item = (int(c), -int(key))
                if len(heap) < 10:
                    heapq.heappush(heap, item)
                elif item > heap[0]:
                    heapq.heapreplace(heap, item)
        if heap:
            rows = sorted(heap, reverse=True)
            yield pd.DataFrame(
                {
                    "o_orderkey": [-nk for _, nk in rows],
                    "total_cents": [c for c, _ in rows],
                }
            )

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    partials = orders.mapInPandas(
        topk_iter, "o_orderkey bigint, total_cents bigint"
    )
    return (
        partials.orderBy(F.col("total_cents").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


# --- U2, sixth wave: grouped-map min-max normalization -----------------------

_GROUPED_NORM_ORACLE = """
WITH c AS (
  SELECT event_id, event_type,
         CAST(ROUND(value * 100) AS BIGINT) AS v_cents,
         MIN(CAST(ROUND(value * 100) AS BIGINT)) OVER (PARTITION BY event_type)
           AS lo,
         MAX(CAST(ROUND(value * 100) AS BIGINT)) OVER (PARTITION BY event_type)
           AS hi
  FROM events
)
SELECT event_id, event_type, v_cents,
       CAST(CASE WHEN hi = lo THEN 0
                 ELSE (v_cents - lo) * 10000 // (hi - lo) END AS BIGINT)
         AS range_bp
FROM c
"""


@register("u_grouped_map_minmax_norm", oracle=_GROUPED_NORM_ORACLE, tags=("U2",))
def u_grouped_map_minmax_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2, sixth wave: grouped-map applyInPandas where each group's
    output depends on group-level statistics (min/max) applied back to
    EVERY row — the normalize-within-group shape (feature scaling per
    stratum) that needs the whole group in one pandas frame, which is
    exactly what grouped-map provides and a scalar UDF cannot.

    Scale: one shuffle on the (5-value) group key; inside each group
    the math is vectorized int64 (cents, bp floor-division — identical
    spelling to the oracle's window form, including the degenerate
    hi == lo guard). Output cardinality equals input — nothing
    collected."""

    def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        # Half-away-from-zero money rounding (oracle uses SQL ROUND).
        x = pdf["value"].to_numpy(dtype="float64") * 100.0
        cents_i = pd.Series(np.trunc(x + np.copysign(0.5, x)).astype("int64"), index=pdf.index)
        lo, hi = int(cents_i.min()), int(cents_i.max())
        if hi == lo:
            bp = pd.Series(0, index=pdf.index, dtype="int64")
        else:
            bp = (cents_i - lo) * 10000 // (hi - lo)
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"].astype("int64"),
                "event_type": pdf["event_type"],
                "v_cents": cents_i,
                "range_bp": bp.astype("int64"),
            }
        )

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    return events.groupBy("event_type").applyInPandas(
        normalize,
        "event_id bigint, event_type string, v_cents bigint, range_bp bigint",
    )


# --- U2+T4, seventh wave: grouped-map sessionization --------------------------

_GROUPED_SESSIONIZE_ORACLE = """
WITH flagged AS (
  SELECT user_id, ts, event_id,
    CASE WHEN LAG(ts) OVER w IS NULL
           OR EPOCH_US(ts) - EPOCH_US(LAG(ts) OVER w) > 1800 * 1000000
         THEN 1 ELSE 0 END AS is_start
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, ts,
    SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged
),
per_session AS (
  SELECT user_id, sid,
         COUNT(*) AS n,
         EPOCH_US(MAX(ts)) // 1000000 - EPOCH_US(MIN(ts)) // 1000000 AS span_s
  FROM sessions GROUP BY user_id, sid
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT)       AS n_sessions,
       CAST(MAX(n) AS BIGINT)         AS longest_session_events,
       CAST(MAX(span_s) AS BIGINT)    AS longest_session_span_s,
       CAST(SUM(n) AS BIGINT)         AS n_events
FROM per_session
GROUP BY user_id
"""


@register(
    "u_grouped_map_sessionize",
    oracle=_GROUPED_SESSIONIZE_ORACLE,
    tags=("U2", "T4", "A1"),
)
def u_grouped_map_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2+T4, seventh wave: applyInPandas sessionization — the grouped-
    map shape at its PRODUCTION keying: one pandas frame per user_id
    (thousands of small groups, ~tens of rows each), NOT per low-
    cardinality attribute, so no group becomes an executor memory wall
    at any scale. Inside the frame: sort by (ts, event_id), gap-split
    at 30 minutes with a vectorized cumsum over the gap>threshold
    flags — the imperative per-entity logic (custom sessionizers,
    trajectory splits) that genuinely needs the whole group in one
    frame, which is exactly what grouped-map provides and built-in
    window functions express only for FIXED gap rules. The oracle
    states the same sessions with the LAG-gap idiom.

    Scale: one shuffle on user_id; per-group work is O(rows log rows)
    in the group's own size; output is one row per user — nothing
    collected, no driver row path."""
    import numpy as np

    events = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id"
    )

    def sessionize(pdf: pd.DataFrame) -> pd.DataFrame:
        p = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        ts_us = p["ts"].to_numpy(dtype="datetime64[us]").astype("int64")
        gaps = np.diff(ts_us, prepend=ts_us[:1])
        sid = np.cumsum(gaps > 1800 * 1_000_000)
        ts_s = ts_us // 1_000_000
        n_sessions = int(sid[-1]) + 1
        counts = np.bincount(sid)
        # Sorted by ts, so each session is one contiguous segment:
        # span = last ts - first ts of the segment, O(rows) total.
        starts = np.flatnonzero(np.r_[True, np.diff(sid) > 0])
        ends = np.r_[starts[1:] - 1, len(ts_s) - 1]
        spans = ts_s[ends] - ts_s[starts]
        return pd.DataFrame(
            {
                "user_id": [int(p["user_id"].iloc[0])],
                "n_sessions": [n_sessions],
                "longest_session_events": [int(counts.max())],
                "longest_session_span_s": [int(spans.max())],
                "n_events": [len(p)],
            }
        )

    schema = (
        "user_id long, n_sessions long, longest_session_events long, "
        "longest_session_span_s long, n_events long"
    )
    return events.groupBy("user_id").applyInPandas(sessionize, schema)


# --- U1+F2, seventh wave: pandas scalar UDF calendar decomposition -----------

@register(
    "u_pandas_weekday_value",
    oracle="""
SELECT CAST(ISODOW(o_orderdate) AS BIGINT)  AS iso_dow,
       CAST(MONTH(o_orderdate) AS BIGINT)   AS mon,
       CAST(COUNT(*) AS BIGINT)             AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM orders
GROUP BY 1, 2
""",
    tags=("U1", "F2", "A1"),
)
def u_pandas_weekday_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1+F2, seventh wave: Arrow-vectorized pandas scalar UDF doing
    CALENDAR decomposition — ISO day-of-week via pandas' datetime
    accessor (Monday=1..Sunday=7, the ISO 8601 convention DuckDB's
    ISODOW states) — demonstrating the U1 shape on date, not money,
    input. The month extraction stays JVM-side (F.month) so the plan
    mixes codegen and Arrow stages the way a real pipeline does.

    Scale: Arrow batch transfer, no per-row Python dispatch; the rollup
    is an ordinary combinable shuffle agg on a 7x12 key grid."""
    import numpy as np

    @pandas_udf("long")
    def iso_dow(d: pd.Series) -> pd.Series:
        return (d.dt.dayofweek + 1).astype("int64")

    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            iso_dow(F.col("o_orderdate")).alias("iso_dow"),
            F.month("o_orderdate").cast("long").alias("mon"),
            cents(F.col("o_totalprice")).alias("c"),
        )
        .groupBy("iso_dow", "mon")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("c").cast("long").alias("total_cents"),
        )
    )


# --- U3+A8, seventh wave: grouped-agg UDAF low median --------------------------

_MEDIAN_LOW_ORACLE = """
WITH c AS (
  SELECT o_orderpriority,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
r AS (
  SELECT o_orderpriority, cents,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY cents) AS rn,
         COUNT(*)    OVER (PARTITION BY o_orderpriority) AS n
  FROM c
)
SELECT o_orderpriority,
       CAST(cents AS BIGINT) AS median_low_cents,
       CAST(n AS BIGINT)     AS n_orders
FROM r
WHERE rn = (n - 1) // 2 + 1
"""


@register(
    "u_udaf_median_low_cents",
    oracle=_MEDIAN_LOW_ORACLE,
    tags=("U3", "A8"),
)
def u_udaf_median_low_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3+A8, seventh wave: grouped-agg pandas UDAF computing the LOW
    MEDIAN (the (n-1)//2-th order statistic) on exact integer cents —
    an always-integer, tie-safe median spelling (any engine's
    interpolated median turns even-count groups into floats; the low
    median is a real data value, deterministic under duplicates). The
    UDAF uses np.partition (O(n) selection, not a full sort). Money is
    rounded half-away-from-zero, matching the oracle's SQL ROUND.

    Scale: one shuffle on the 5-value priority key; each group's cents
    vector fits one Arrow batch by construction at this keying — for
    fact-scale groups use the built-in percentile_approx instead (the
    A8 row's sketch queries prove that path)."""
    import numpy as np

    @pandas_udf("long")
    def median_low(v: pd.Series) -> int:
        x = v.to_numpy(dtype="float64") * 100.0
        cents_i = np.trunc(x + np.copysign(0.5, x)).astype("int64")
        k = (len(cents_i) - 1) // 2
        return int(np.partition(cents_i, k)[k])

    # Group-agg pandas UDFs cannot mix with JVM aggregates in one agg()
    # (INVALID_PANDAS_UDF_PLACEMENT), so the row count is a sibling
    # pandas UDAF — same Arrow pass, no second shuffle.
    @pandas_udf("long")
    def n_rows(v: pd.Series) -> int:
        return int(len(v))

    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        median_low(F.col("o_totalprice")).alias("median_low_cents"),
        n_rows(F.col("o_totalprice")).alias("n_orders"),
    )


# --- U4+F2+J3, seventh wave: UDTF calendar spine + outer join ------------------

_FISCAL_SPINE_ORACLE = """
WITH spine AS (
  SELECT y.y AS yr, q.q AS q
  FROM generate_series(1992, 1998) AS y(y), generate_series(1, 4) AS q(q)
),
agg AS (
  SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS yr,
         CAST(QUARTER(o_orderdate) AS BIGINT) AS q,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS tc
  FROM orders GROUP BY 1, 2
)
SELECT CAST(spine.yr AS BIGINT)      AS yr,
       CAST(spine.q AS BIGINT)       AS q,
       CAST(COALESCE(agg.n, 0) AS BIGINT)  AS n_orders,
       CAST(COALESCE(agg.tc, 0) AS BIGINT) AS total_cents
FROM spine LEFT JOIN agg ON spine.yr = agg.yr AND spine.q = agg.q
"""


@register(
    "u_udtf_fiscal_spine",
    oracle=_FISCAL_SPINE_ORACLE,
    tags=("U4", "F2", "J3"),
)
def u_udtf_fiscal_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U4+F2+J3, seventh wave: a GENERATOR UDTF (no input table — pure
    table function from literal bounds) emits the complete fiscal
    quarter spine, which LEFT-JOINs the order aggregate so quarters
    with no orders surface as explicit zeros — the classic calendar-
    spine densification every reporting pipeline needs, with the spine
    produced by the U4 mechanism rather than sequence()+explode (the F4
    row's proven spelling).

    Scale: the spine is 28 rows — broadcast side of the outer join; the
    fact aggregate is one combinable shuffle. The UDTF runs once on a
    single 1-row driver frame, never per fact row."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="yr bigint, q bigint")
    class FiscalSpine:
        def eval(self, start_yr: int, end_yr: int):
            for y in range(start_yr, end_yr + 1):
                for q in range(1, 5):
                    yield y, q

    spark.udtf.register("fiscal_spine", FiscalSpine)
    spine = spark.sql("SELECT * FROM fiscal_spine(1992, 1998)")
    orders = load_table(spark, sf_dir, "orders")
    agg = (
        orders.groupBy(
            F.year("o_orderdate").cast("long").alias("yr"),
            F.quarter("o_orderdate").cast("long").alias("q"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(cents(F.col("o_totalprice"))).cast("long").alias("tc"),
        )
    )
    return (
        spine.join(agg, ["yr", "q"], "left")
        .select(
            "yr",
            "q",
            F.coalesce("n", F.lit(0)).cast("long").alias("n_orders"),
            F.coalesce("tc", F.lit(0)).cast("long").alias("total_cents"),
        )
    )


# --- U5+A1, seventh wave: iterator UDF cross-batch histogram ------------------

_ITER_HISTOGRAM_ORACLE = """
SELECT LEAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) // 5000000, 11)
         AS band,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
GROUP BY 1
"""


@register(
    "u_iter_partition_histogram",
    oracle=_ITER_HISTOGRAM_ORACLE,
    tags=("U5", "A1", "F3"),
)
def u_iter_partition_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U5+A1, seventh wave: ITERATOR mapInPandas accumulating a fixed
    12-band integer histogram ACROSS Arrow batches and emitting ONE
    partial histogram per partition after the last batch — the map-side
    pre-aggregation shape hand-built through the Python iterator API:
    the shuffle then carries |partitions| x 12 rows instead of the fact
    table, and a JVM-side sum folds the partials. Bands are $50k
    buckets of exact half-away-rounded cents, clamped to band 11.

    Scale: per-partition Python state is 12 int64s; the emit-at-end
    iterator protocol (not per-batch) is the part the per-batch partial
    queries never exercise. The final agg is a combinable 12-key
    shuffle."""

    def histogram(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        counts = np.zeros(12, dtype="int64")
        for b in batches:
            x = b["o_totalprice"].to_numpy(dtype="float64") * 100.0
            cents_i = np.trunc(x + np.copysign(0.5, x)).astype("int64")
            band = np.minimum(cents_i // 5_000_000, 11)
            counts += np.bincount(band, minlength=12)
        if counts.sum():
            yield pd.DataFrame(
                {"band": np.arange(12, dtype="int64"), "n_partial": counts}
            )

    orders = load_table(spark, sf_dir, "orders").select("o_totalprice")
    partials = orders.mapInPandas(histogram, "band long, n_partial long")
    return (
        partials.groupBy("band")
        .agg(F.sum("n_partial").cast("long").alias("n_orders"))
        .filter(F.col("n_orders") > 0)
    )


# === Eighth wave (round 10): U-row depth restocks =============================

# --- U1+F6+P1, eighth wave: pandas scalar UDF over parsed JSON props ----------

_JSON_RISK_ORACLE = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT) * 7
                + CAST(ROUND(value * 100) AS BIGINT) // 100) AS BIGINT)
         AS risk_points
FROM events
GROUP BY event_type
"""


@register(
    "u_pandas_json_risk",
    oracle=_JSON_RISK_ORACLE,
    tags=("U1", "F6", "P1"),
)
def u_pandas_json_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1+F6+P1, eighth wave: the JSON-to-UDF handoff — the `props`
    JSON string is parsed JVM-side with get_json_object (F6, stays in
    codegen), the extracted field and the raw value then feed an
    Arrow-vectorized pandas scalar UDF computing an integer risk score
    (k*7 + whole dollars of the half-away-rounded cents), and the
    projected computed column (P1) rolls up per event type. All-integer
    arithmetic: the only float op is the cents rounding, spelled
    identically to the oracle's ROUND(value*100).

    Scale: JSON field extraction never enters Python (one codegen
    stage); the UDF sees Arrow batches of two primitive columns; the
    census is a combinable 5-key shuffle."""
    import numpy as np

    @pandas_udf("long")
    def risk(k: pd.Series, value: pd.Series) -> pd.Series:
        x = value.to_numpy(dtype="float64") * 100.0
        cents_i = np.trunc(x + np.copysign(0.5, x)).astype("int64")
        return pd.Series(k.to_numpy(dtype="int64") * 7 + cents_i // 100)

    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
        "value",
    )
    return (
        e.select("event_type", risk(F.col("k"), F.col("value")).alias("r"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("r").cast("long").alias("risk_points"),
        )
    )


# --- U1+U3+P1, eighth wave: scalar UDF feeding a MAD UDAF ----------------------

_MAD_BAND_ORACLE = """
WITH c AS (
  SELECT o_orderstatus,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
m AS (
  SELECT o_orderstatus, cents,
         ROW_NUMBER() OVER (PARTITION BY o_orderstatus ORDER BY cents) AS rn,
         COUNT(*)    OVER (PARTITION BY o_orderstatus) AS n
  FROM c
),
med AS (
  SELECT o_orderstatus, cents AS med_cents, n
  FROM m WHERE rn = (n - 1) // 2 + 1
),
d AS (
  SELECT c.o_orderstatus, ABS(c.cents - med.med_cents) AS dev,
         med.med_cents, med.n
  FROM c JOIN med USING (o_orderstatus)
),
m2 AS (
  SELECT o_orderstatus, dev, med_cents, n,
         ROW_NUMBER() OVER (PARTITION BY o_orderstatus ORDER BY dev) AS rn2
  FROM d
)
SELECT o_orderstatus,
       CAST(med_cents AS BIGINT) AS median_low_cents,
       CAST(dev AS BIGINT)       AS mad_low_cents,
       CAST(n AS BIGINT)         AS n_orders
FROM m2 WHERE rn2 = (n - 1) // 2 + 1
"""


@register(
    "u_pandas_udaf_mad_band",
    oracle=_MAD_BAND_ORACLE,
    tags=("U1", "U3", "P1"),
)
def u_pandas_udaf_mad_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1+U3+P1, eighth wave: the two pandas UDF shapes COMPOSED in one
    plan — an Arrow scalar UDF (U1) converts money to exact half-away
    integer cents as a projected column (P1), and grouped-agg pandas
    UDAFs (U3) then compute the LOW MEDIAN and the low-median absolute
    deviation (MAD) on it. MAD is the robust dispersion statistic no
    built-in aggregate expresses; both order statistics use the
    (n-1)//2 low convention so every output is an actual data value —
    integer, tie-safe, engine-independent.

    Scale: one shuffle on the 3-value status key; each group's cents
    vector is one Arrow batch at this keying (see
    u_udaf_median_low_cents's note on fact-scale groups); np.partition
    keeps per-group selection O(n)."""
    import numpy as np

    @pandas_udf("long")
    def to_cents(v: pd.Series) -> pd.Series:
        x = v.to_numpy(dtype="float64") * 100.0
        return pd.Series(np.trunc(x + np.copysign(0.5, x)).astype("int64"))

    def _low_median(x):
        import numpy as np

        k = (len(x) - 1) // 2
        return int(np.partition(x, k)[k])

    @pandas_udf("long")
    def median_low(v: pd.Series) -> int:
        return _low_median(v.to_numpy(dtype="int64"))

    @pandas_udf("long")
    def mad_low(v: pd.Series) -> int:
        import numpy as np

        x = v.to_numpy(dtype="int64")
        return _low_median(np.abs(x - _low_median(x)))

    @pandas_udf("long")
    def n_rows(v: pd.Series) -> int:
        return int(len(v))

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderstatus", to_cents(F.col("o_totalprice")).alias("cents")
    )
    return orders.groupBy("o_orderstatus").agg(
        median_low(F.col("cents")).alias("median_low_cents"),
        mad_low(F.col("cents")).alias("mad_low_cents"),
        n_rows(F.col("cents")).alias("n_orders"),
    )


# --- U2+T4, eighth wave: grouped-map per-session rows --------------------------

_GAP_SESSION_ROWS_ORACLE = """
WITH flagged AS (
  SELECT user_id, ts, event_id,
    CASE WHEN LAG(ts) OVER w IS NULL
           OR EPOCH_US(ts) - EPOCH_US(LAG(ts) OVER w) > 2700000000
         THEN 1 ELSE 0 END AS is_start
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, ts, event_id,
    SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged
)
SELECT user_id,
       CAST(sid AS BIGINT)                        AS session_idx,
       CAST(COUNT(*) AS BIGINT)                   AS n_events,
       CAST(EPOCH_US(MAX(ts)) // 1000000
            - EPOCH_US(MIN(ts)) // 1000000 AS BIGINT) AS span_s,
       CAST(MIN(event_id) AS BIGINT)              AS first_event_id
FROM sessions
GROUP BY user_id, sid
"""


@register(
    "u_grouped_map_gap_sessions",
    oracle=_GAP_SESSION_ROWS_ORACLE,
    tags=("U2", "T4"),
)
def u_grouped_map_gap_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2+T4, eighth wave: applyInPandas sessionization emitting ONE ROW
    PER SESSION (1-based index in time order, event count, span, first
    event id) — the per-entity EXPLODING grouped-map shape, where the
    output grain is finer than one row per group (its proven sibling
    u_grouped_map_sessionize emits a per-user rollup). A 45-minute gap
    rule distinguishes it from the 30-minute forms and shows the
    threshold is a parameter, not a constant baked into the operator.

    Scale: one shuffle on user_id, per-group O(rows log rows), output
    bounded by session count — still no driver row path. The oracle
    restates the sessions with the LAG-gap idiom; first_event_id is
    MIN within the session (events are second-distinct per user, and
    the session sort is (ts, event_id), so MIN is the first row's id —
    an order-free spelling both engines agree on)."""
    import numpy as np

    events = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id"
    )

    def split_sessions(pdf: pd.DataFrame) -> pd.DataFrame:
        p = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        ts_us = p["ts"].to_numpy(dtype="datetime64[us]").astype("int64")
        eid = p["event_id"].to_numpy(dtype="int64")
        gaps = np.diff(ts_us, prepend=ts_us[:1])
        sid = np.cumsum(gaps > 2700 * 1_000_000) + 1  # 1-based like the oracle
        ts_s = ts_us // 1_000_000
        starts = np.flatnonzero(np.r_[True, np.diff(sid) > 0])
        ends = np.r_[starts[1:] - 1, len(ts_s) - 1]
        return pd.DataFrame(
            {
                "user_id": np.full(len(starts), int(p["user_id"].iloc[0])),
                "session_idx": sid[starts],
                "n_events": ends - starts + 1,
                "span_s": ts_s[ends] - ts_s[starts],
                "first_event_id": np.minimum.reduceat(eid, starts),
            }
        )

    schema = (
        "user_id long, session_idx long, n_events long, span_s long, "
        "first_event_id long"
    )
    return events.groupBy("user_id").applyInPandas(split_sessions, schema)


# --- U4+A5+A6, eighth wave: UDTF-expanded manual rollup ------------------------

_UDTF_ROLLUP_ORACLE = """
WITH ru AS (
  SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
         CASE WHEN GROUPING(o_orderstatus) = 1 THEN 'ALL'
              ELSE o_orderstatus END      AS status,
         CAST(COUNT(*) AS BIGINT)         AS n_orders,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS total_cents
  FROM orders
  GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
),
shared AS (
  SELECT *,
         SUM(CASE WHEN priority = 'ALL' AND status = 'ALL'
                  THEN total_cents ELSE 0 END) OVER () AS grand_cents
  FROM ru
)
SELECT priority, status, n_orders, total_cents,
       CAST(total_cents * 10000 // grand_cents AS BIGINT) AS share_bp
FROM shared
WHERE total_cents * 10000 // grand_cents >= 500
"""


@register(
    "u_udtf_rollup_expand",
    oracle=_UDTF_ROLLUP_ORACLE,
    tags=("U4", "A5", "A6"),
)
def u_udtf_rollup_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U4+A5+A6, eighth wave: a LATERAL UDTF re-derives the ROLLUP
    lattice by hand — the base (priority, status) aggregate (computed
    JVM-side first, so the UDTF sees 15 rows, never the fact table) is
    expanded by a table function into its three grouping levels, the
    levels re-aggregate, and a HAVING keeps cells holding >=5% of the
    grand total (stated as exact integer basis points against the
    window-summed grand-total row). Proves the U4 mechanism composes
    with the A5 semantics the built-in rollup states — the oracle IS
    the built-in ROLLUP with the same share filter.

    Scale: the UDTF runs on |priority x status| pre-aggregated rows
    (bounded by attribute cardinality, not data size); the only
    fact-table pass is the combinable base aggregate."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="priority string, status string, n bigint, tc bigint")
    class RollupExpand:
        def eval(self, priority: str, status: str, n: int, tc: int):
            yield priority, status, n, tc
            yield priority, "ALL", n, tc
            yield "ALL", "ALL", n, tc

    spark.udtf.register("rollup_expand", RollupExpand)
    base = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(cents(F.col("o_totalprice"))).cast("long").alias("tc"),
        )
    )
    base.createOrReplaceTempView("rollup_base_r10")
    levels = spark.sql(
        """
        SELECT r.priority, r.status, r.n, r.tc
        FROM rollup_base_r10 b,
             LATERAL rollup_expand(b.o_orderpriority, b.o_orderstatus,
                                   b.n, b.tc) r
        """
    )
    agg = levels.groupBy("priority", "status").agg(
        F.sum("n").cast("long").alias("n_orders"),
        F.sum("tc").cast("long").alias("total_cents"),
    )
    from pyspark.sql import Window

    grand = F.sum(
        F.when(
            (F.col("priority") == "ALL") & (F.col("status") == "ALL"),
            F.col("total_cents"),
        ).otherwise(F.lit(0))
    ).over(Window.partitionBy())
    shared = agg.withColumn("grand_cents", grand).withColumn(
        "share_bp",
        F.expr("CAST(total_cents * 10000 DIV grand_cents AS BIGINT)"),
    )
    return shared.filter(F.col("share_bp") >= 500).select(
        "priority", "status", "n_orders", "total_cents", "share_bp"
    )


# --- U5+S2+S6, eighth wave: iterator UDF partials over a CSV scan -------------

_CSV_EXTREMES_ORACLE = """
SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'express'
            ELSE 'standard' END AS tier,
       o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(MIN(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS min_cents,
       CAST(MAX(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS max_cents,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM orders
GROUP BY 1, 2
"""


@register(
    "u_iter_csv_extremes",
    oracle=_CSV_EXTREMES_ORACLE,
    tags=("U5", "S2", "S6"),
)
def u_iter_csv_extremes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U5+S2+S6, eighth wave: the iterator mapInPandas partial-aggregate
    shape fed by a CSV round-trip — orders are exported to headered CSV
    with money already as integer cents (integers survive text
    round-trips bit-exactly; doubles are the reason the payload is
    converted BEFORE the sink), read back with an explicit schema (S2 —
    no inference pass), streamed through a per-partition iterator UDF
    that accumulates per-priority (count, min, max, sum) across Arrow
    batches and emits one partial row per (partition, priority), and
    finally combined JVM-side and enriched by an in-memory tier
    dimension (S6) built with createDataFrame.

    Scale: the shuffle carries |partitions x 5| partial rows, not the
    fact table; the tier dim is 5 rows — broadcast; per-partition
    Python state is a 5-entry dict of 4 int64s."""
    import numpy as np

    from ..sources import scratch_dir

    path = scratch_dir(sf_dir, "orders_csv_cents")
    load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        cents(F.col("o_totalprice")).alias("cents"),
    ).write.mode("overwrite").option("header", True).csv(path)
    back = spark.read.options(header=True).schema(
        "o_orderkey long, o_orderpriority string, cents long"
    ).csv(path)

    def extremes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: dict[str, list[int]] = {}
        for b in batches:
            for prio, grp in b.groupby("o_orderpriority", sort=False):
                c = grp["cents"].to_numpy(dtype="int64")
                s = acc.setdefault(
                    str(prio), [0, np.iinfo("int64").max, np.iinfo("int64").min, 0]
                )
                s[0] += len(c)
                s[1] = min(s[1], int(c.min()))
                s[2] = max(s[2], int(c.max()))
                s[3] += int(c.sum())
        if acc:
            yield pd.DataFrame(
                {
                    "o_orderpriority": list(acc),
                    "n_partial": [v[0] for v in acc.values()],
                    "min_c": [v[1] for v in acc.values()],
                    "max_c": [v[2] for v in acc.values()],
                    "sum_c": [v[3] for v in acc.values()],
                }
            )

    partials = back.select("o_orderpriority", "cents").mapInPandas(
        extremes,
        "o_orderpriority string, n_partial long, min_c long, max_c long, sum_c long",
    )
    combined = partials.groupBy("o_orderpriority").agg(
        F.sum("n_partial").cast("long").alias("n_orders"),
        F.min("min_c").cast("long").alias("min_cents"),
        F.max("max_c").cast("long").alias("max_cents"),
        F.sum("sum_c").cast("long").alias("total_cents"),
    )
    tiers = spark.createDataFrame(
        [
            ("1-URGENT", "express"),
            ("2-HIGH", "express"),
            ("3-MEDIUM", "standard"),
            ("4-NOT SPECIFIED", "standard"),
            ("5-LOW", "standard"),
        ],
        "o_orderpriority string, tier string",
    )
    return combined.join(F.broadcast(tiers), "o_orderpriority").select(
        "tier", "o_orderpriority", "n_orders", "min_cents", "max_cents",
        "total_cents",
    )


# --- U5+A4, eighth wave: iterator-UDF mergeable quantile sketch ----------------

_ITER_QSKETCH_BUCKETS = 128

_ITER_QSKETCH_ORACLE = f"""
WITH v AS (
  SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents FROM lineitem
),
bounds AS (
  SELECT MIN(cents) AS lo, MAX(cents) AS hi, COUNT(*) AS n FROM v
),
hist AS (
  SELECT LEAST(({_ITER_QSKETCH_BUCKETS} * (cents - b.lo)) // (b.hi - b.lo + 1),
               {_ITER_QSKETCH_BUCKETS - 1}) AS bkt,
         COUNT(*) AS c
  FROM v, bounds b
  GROUP BY 1
),
cum AS (
  SELECT bkt, SUM(c) OVER (ORDER BY bkt
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_c
  FROM hist
),
qs AS (SELECT UNNEST([50, 90]) AS q),
walk AS (
  SELECT q.q, c.bkt,
         ROW_NUMBER() OVER (PARTITION BY q.q ORDER BY c.bkt) AS rn
  FROM qs q JOIN cum c
    ON c.cum_c * 100 >= q.q * (SELECT n FROM bounds)
),
est AS (
  SELECT w.q,
         b.lo + ((w.bkt * (b.hi - b.lo + 1)) // {_ITER_QSKETCH_BUCKETS})
           AS est_lo,
         b.lo + (((w.bkt + 1) * (b.hi - b.lo + 1)) // {_ITER_QSKETCH_BUCKETS})
           AS est_hi
  FROM walk w CROSS JOIN bounds b WHERE w.rn = 1
),
exact AS (
  SELECT 50 AS q, quantile_cont(cents, 0.50) AS exact_cents FROM v
  UNION ALL SELECT 90, quantile_cont(cents, 0.90) FROM v
)
SELECT e.q, CAST(est_lo AS BIGINT) AS est_lo, CAST(est_hi AS BIGINT) AS est_hi,
       ROUND(x.exact_cents, 6) AS exact_cents,
       x.exact_cents >= est_lo AND x.exact_cents <= est_hi
         AS exact_within_bucket_ok
FROM est e JOIN exact x ON e.q = x.q
"""


@register(
    "u_iter_quantile_sketch",
    oracle=_ITER_QSKETCH_ORACLE,
    tags=("U5", "A4"),
)
def u_iter_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U5+A4, eighth wave: the mergeable quantile sketch with its
    per-partition accumulation written through the ITERATOR UDF API —
    each partition streams Arrow batches into a 128-cell integer
    histogram (fixed bounds broadcast as columns) and emits ONE partial
    per partition; the JVM sum is the sketch MERGE; a cumulative walk
    locates p50/p90, and the exact quantile is proven to land inside
    the located bucket (`exact_within_bucket_ok` — the same
    approximate-with-exact-envelope proof a_quantile_histogram_sketch
    states for the pure-JVM spelling). This is the A4 shape where the
    sketch update is custom Python (any user-defined mergeable sketch
    rides this exact skeleton), while merge and walk stay declarative.

    Scale: Python state is 128 int64s per partition; the shuffle
    carries |partitions| x <=128 rows; the 1-row bounds frame broadcast
    to the scan is the allowlisted bounded nested-loop join."""
    import numpy as np

    nb = _ITER_QSKETCH_BUCKETS
    li = load_table(spark, sf_dir, "lineitem").select(
        cents(F.col("l_extendedprice")).alias("cents")
    )
    bounds = li.agg(
        F.min("cents").alias("lo"),
        F.max("cents").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    )
    withb = li.crossJoin(F.broadcast(bounds))

    def sketch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts = np.zeros(nb, dtype="int64")
        lo = hi = n = None
        for b in batches:
            if lo is None and len(b):
                lo = int(b["lo"].iloc[0])
                hi = int(b["hi"].iloc[0])
                n = int(b["n"].iloc[0])
            c = b["cents"].to_numpy(dtype="int64")
            bkt = np.minimum((nb * (c - lo)) // (hi - lo + 1), nb - 1)
            counts += np.bincount(bkt, minlength=nb)
        if lo is not None:
            nz = np.flatnonzero(counts)
            yield pd.DataFrame(
                {
                    "bkt": nz.astype("int64"),
                    "c": counts[nz],
                    "lo": np.full(len(nz), lo, dtype="int64"),
                    "hi": np.full(len(nz), hi, dtype="int64"),
                    "n": np.full(len(nz), n, dtype="int64"),
                }
            )

    partials = withb.mapInPandas(
        sketch, "bkt long, c long, lo long, hi long, n long"
    )
    hist = partials.groupBy("bkt", "lo", "hi", "n").agg(
        F.sum("c").alias("c")
    )
    from pyspark.sql import Window

    w_cum = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.withColumn("cum_c", F.sum("c").over(w_cum).cast("long"))
    qs = spark.createDataFrame([(50,), (90,)], "q int")
    walk = (
        F.broadcast(qs)
        .join(cum, F.col("cum_c") * 100 >= F.col("q") * F.col("n"))
        .withColumn(
            "rn", F.row_number().over(Window.partitionBy("q").orderBy("bkt"))
        )
        .filter(F.col("rn") == 1)
    )
    est = walk.select(
        F.col("q").cast("long").alias("q"),
        F.expr(f"CAST(lo + ((bkt * (hi - lo + 1)) DIV {nb}) AS BIGINT)").alias(
            "est_lo"
        ),
        F.expr(
            f"CAST(lo + (((bkt + 1) * (hi - lo + 1)) DIV {nb}) AS BIGINT)"
        ).alias("est_hi"),
    )
    exact = li.agg(
        F.expr("percentile(cents, 0.50)").alias("e50"),
        F.expr("percentile(cents, 0.90)").alias("e90"),
    ).select(
        F.explode(
            F.map_from_arrays(
                F.array(F.lit(50).cast("long"), F.lit(90).cast("long")),
                F.array(F.col("e50"), F.col("e90")),
            )
        ).alias("q", "exact_raw")
    )
    return est.join(exact, "q").select(
        "q",
        "est_lo",
        "est_hi",
        F.round(F.col("exact_raw"), 6).alias("exact_cents"),
        (
            (F.col("exact_raw") >= F.col("est_lo"))
            & (F.col("exact_raw") <= F.col("est_hi"))
        ).alias("exact_within_bucket_ok"),
    )


# --- U3+A6, eighth wave: winsorized-sum UDAF with a share HAVING ---------------

_WINSOR_ORACLE = """
WITH c AS (
  SELECT o_orderpriority,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
r AS (
  SELECT o_orderpriority, cents,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY cents) AS rn,
         COUNT(*)    OVER (PARTITION BY o_orderpriority) AS n
  FROM c
),
clip AS (
  SELECT o_orderpriority, n,
         MAX(CASE WHEN rn = n // 10 + 1 THEN cents END)  AS lo_clip,
         MAX(CASE WHEN rn = n - n // 10 THEN cents END)  AS hi_clip
  FROM r GROUP BY o_orderpriority, n
),
win AS (
  SELECT r.o_orderpriority, r.n,
         SUM(LEAST(GREATEST(r.cents, c.lo_clip), c.hi_clip)) AS win_cents
  FROM r JOIN clip c USING (o_orderpriority)
  GROUP BY r.o_orderpriority, r.n
),
tot AS (
  SELECT *,
         SUM(win_cents) OVER () AS tot_win,
         SUM(n) OVER ()         AS tot_n
  FROM win
)
SELECT o_orderpriority,
       CAST(win_cents AS BIGINT) AS winsorized_cents,
       CAST(n AS BIGINT)         AS n_orders
FROM tot
WHERE win_cents * tot_n > tot_win * n
"""


@register(
    "u_udaf_winsorized_share",
    oracle=_WINSOR_ORACLE,
    tags=("U3", "A6"),
)
def u_udaf_winsorized_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3+A6, eighth wave: a WINSORIZED-SUM pandas UDAF (clip each
    group's cents to its own [k+1-th smallest, k-th largest] order
    statistics, k = n//10, then sum — the outlier-robust revenue total
    that, unlike its proven trimmed-sum sibling, keeps every row's
    membership) with a HAVING that keeps only priorities whose
    winsorized MEAN beats the overall winsorized mean — stated as the
    cross-multiplied integer inequality win*totN > totWin*n, so no
    division and no floats anywhere. Ratio-based, hence
    scale-invariant: the kept set is about the distribution's shape,
    not the row count.

    Scale: one shuffle on the 5-value priority key; np.partition gives
    both clip bounds in O(n); the HAVING's grand totals ride a window
    over 5 aggregated rows."""
    import numpy as np

    @pandas_udf("long")
    def winsorized_sum(v: pd.Series) -> int:
        x = v.to_numpy(dtype="float64") * 100.0
        c = np.trunc(x + np.copysign(0.5, x)).astype("int64")
        k = len(c) // 10
        lo = int(np.partition(c, k)[k])
        hi = int(np.partition(c, len(c) - 1 - k)[len(c) - 1 - k])
        return int(np.clip(c, lo, hi).sum())

    @pandas_udf("long")
    def n_rows(v: pd.Series) -> int:
        return int(len(v))

    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    agg = orders.groupBy("o_orderpriority").agg(
        winsorized_sum(F.col("o_totalprice")).alias("winsorized_cents"),
        n_rows(F.col("o_totalprice")).alias("n_orders"),
    )
    w = Window.partitionBy()
    shared = agg.withColumn("tot_win", F.sum("winsorized_cents").over(w)) \
        .withColumn("tot_n", F.sum("n_orders").over(w))
    return shared.filter(
        F.col("winsorized_cents") * F.col("tot_n")
        > F.col("tot_win") * F.col("n_orders")
    ).select("o_orderpriority", "winsorized_cents", "n_orders")


# --- U3+A6+A9+P7, ninth wave: p90 UDAF census with structural share gate -------

_P90_CENSUS_ORACLE = """
WITH base AS (
  SELECT lang,
         CAST(SUBSTR(source, 4) AS INT) % 4 AS src_class,
         source, n_chars
  FROM documents
),
agg AS (
  SELECT lang, src_class, COUNT(*) AS n_docs FROM base GROUP BY 1, 2
),
ranked AS (
  SELECT lang, src_class, n_chars,
         ROW_NUMBER() OVER (PARTITION BY lang, src_class ORDER BY n_chars)
           AS rn,
         COUNT(*)    OVER (PARTITION BY lang, src_class) AS n
  FROM base
),
p90 AS (
  SELECT lang, src_class, n_chars AS p90_chars
  FROM ranked WHERE rn = ((n - 1) * 9) // 10 + 1
),
srcs AS (
  SELECT lang, src_class,
         COUNT(*)    AS n_sources,
         MIN(source) AS first_source
  FROM (SELECT DISTINCT lang, src_class, source FROM base)
  GROUP BY 1, 2
),
shared AS (
  SELECT a.*, SUM(n_docs) OVER () AS total_docs FROM agg a
)
SELECT s.lang,
       CAST(s.src_class AS BIGINT)                    AS src_class,
       CAST(s.n_docs AS BIGINT)                       AS n_docs,
       CAST(p.p90_chars AS BIGINT)                    AS p90_chars,
       CAST(r.n_sources AS BIGINT)                    AS n_sources,
       r.first_source,
       CAST(s.n_docs * 10000 // s.total_docs AS BIGINT) AS share_bp
FROM shared s
JOIN p90  p ON s.lang = p.lang AND s.src_class = p.src_class
JOIN srcs r ON s.lang = r.lang AND s.src_class = r.src_class
WHERE s.n_docs * 10000 // s.total_docs >= 600
"""


@register(
    "u_udaf_p90_census",
    oracle=_P90_CENSUS_ORACLE,
    tags=("U3", "A6", "A9", "P7"),
)
def u_udaf_p90_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3+A6+A9+P7, ninth wave: a grouped-agg pandas UDAF computes the
    exact LOW-P90 of document length per (lang, source-class) — the
    (n-1)*9//10 order statistic, an actual data value, tie-safe and
    engine-independent — beside a sibling count UDAF (pandas UDAFs
    cannot mix with JVM aggregates in one agg()). The distinct source
    census arrives from a separate DISTINCT stage (P7: dropDuplicates
    on (lang, src_class, source)) collected into a sorted array (A9),
    and the HAVING gate keeps only groups holding >=6% of all documents
    — 'en' carries ~44% of this corpus by construction (a generator
    weight, not noise) so its four source-class groups sit at ~11% each
    while every other language's sit at ~3-4%: the filter discriminates
    on corpus composition, stable at any scale factor.

    Scale: one shuffle on the 20-value (lang, src_class) key for the
    UDAF; the distinct stage is a combinable pre-aggregation; the share
    window runs on 20 group rows."""
    import numpy as np

    @pandas_udf("long")
    def p90_low(v: pd.Series) -> int:
        x = v.to_numpy(dtype="int64")
        k = (len(x) - 1) * 9 // 10
        return int(np.partition(x, k)[k])

    @pandas_udf("long")
    def n_rows(v: pd.Series) -> int:
        return int(len(v))

    base = load_table(spark, sf_dir, "documents").select(
        "lang",
        (F.substring("source", 4, 10).cast("int") % 4)
        .cast("long")
        .alias("src_class"),
        "source",
        "n_chars",
    )
    stats = base.groupBy("lang", "src_class").agg(
        n_rows(F.col("n_chars")).alias("n_docs"),
        p90_low(F.col("n_chars")).alias("p90_chars"),
    )
    srcs = (
        base.select("lang", "src_class", "source")
        .dropDuplicates()
        .groupBy("lang", "src_class")
        .agg(F.array_sort(F.collect_set("source")).alias("src_arr"))
        .select(
            "lang",
            "src_class",
            F.size("src_arr").cast("long").alias("n_sources"),
            F.element_at("src_arr", 1).alias("first_source"),
        )
    )
    from pyspark.sql import Window

    shared = stats.withColumn(
        "total_docs", F.sum("n_docs").over(Window.partitionBy())
    ).withColumn(
        "share_bp", F.expr("CAST(n_docs * 10000 DIV total_docs AS BIGINT)")
    )
    return (
        shared.filter(F.col("share_bp") >= 600)
        .join(srcs, ["lang", "src_class"])
        .select(
            "lang", "src_class", "n_docs", "p90_chars",
            "n_sources", "first_source", "share_bp",
        )
    )


# --- U3+A4+S6, ninth wave: KMV distinct-estimate UDAF ---------------------------

_KMV_ORACLE = """
WITH h AS (
  SELECT c_mktsegment,
         (c_custkey * 2654435761) % 4294967296 AS hv
  FROM customer
),
ranked AS (
  SELECT c_mktsegment, hv,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY hv) AS rn,
         COUNT(*)     OVER (PARTITION BY c_mktsegment)             AS n
  FROM h
),
kth AS (
  SELECT c_mktsegment,
         CAST(hv AS BIGINT) AS kth_min_hash,
         CAST(LEAST(64, n) AS BIGINT) AS k_used
  FROM ranked WHERE rn = LEAST(64, n)
),
exact AS (
  SELECT c_mktsegment, COUNT(DISTINCT c_custkey) AS n_exact
  FROM customer GROUP BY 1
),
dims(c_mktsegment, sector) AS (
  VALUES ('AUTOMOBILE', 'industrial'), ('MACHINERY', 'industrial'),
         ('BUILDING', 'construction'), ('FURNITURE', 'consumer'),
         ('HOUSEHOLD', 'consumer')
)
SELECT k.c_mktsegment,
       d.sector,
       k.k_used,
       k.kth_min_hash,
       CAST((k.k_used - 1) * 4294967296 // k.kth_min_hash AS BIGINT)
         AS est_distinct,
       CAST(e.n_exact AS BIGINT) AS n_exact
FROM kth k
JOIN exact e ON k.c_mktsegment = e.c_mktsegment
JOIN dims  d ON k.c_mktsegment = d.c_mktsegment
"""


@register(
    "u_udaf_kmv_distinct",
    oracle=_KMV_ORACLE,
    tags=("U3", "A4", "S6"),
)
def u_udaf_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3+A4+S6, ninth wave: a KMV (k-minimum-values) distinct-count
    sketch as a grouped-agg pandas UDAF — the sketch keeps the k=64
    smallest values of a multiplicative 32-bit hash and estimates
    distinct count as (k-1)*2^32 / h_k. The hash is pure integer
    arithmetic ((key * 2654435761) mod 2^32, Knuth's multiplicative
    scheme) so the oracle reproduces the k-th order statistic and the
    estimate EXACTLY in SQL — the sketch's correctness is hash-proven,
    not eyeballed (the same trick u_iter_quantile_sketch uses: sketch
    mechanics in the engine, arithmetic identity in the oracle). The
    UDAF maintains a bounded 64-slot buffer per Arrow chunk (true
    streaming-sketch mechanics, O(k) memory however large the group);
    the exact count rides beside it for the error audit, and the sector
    label joins from a 5-row createDataFrame dimension (S6), broadcast.

    Scale: one shuffle on the 5-value segment key; at 100 TB the same
    UDAF runs unchanged because its state never exceeds 64 int64s —
    partial-aggregation of KMV sketches (union = merge-and-truncate) is
    the documented scale path."""
    import numpy as np

    @pandas_udf("long")
    def kmv_kth_min(v: pd.Series) -> int:
        buf = None
        x = v.to_numpy(dtype="int64")
        for i in range(0, len(x), 256):
            chunk = (x[i : i + 256] * 2654435761) % 4294967296
            buf = chunk if buf is None else np.concatenate([buf, chunk])
            if len(buf) > 64:
                buf = np.partition(buf, 63)[:64]
        k = min(64, len(buf))
        return int(np.partition(buf, k - 1)[k - 1])

    @pandas_udf("long")
    def k_used(v: pd.Series) -> int:
        return int(min(64, len(v)))

    c = load_table(spark, sf_dir, "customer")
    sketch = c.groupBy("c_mktsegment").agg(
        k_used(F.col("c_custkey")).alias("k_used"),
        kmv_kth_min(F.col("c_custkey")).alias("kth_min_hash"),
    )
    exact = c.groupBy("c_mktsegment").agg(
        F.countDistinct("c_custkey").cast("long").alias("n_exact")
    )
    dims = spark.createDataFrame(
        [
            ("AUTOMOBILE", "industrial"),
            ("MACHINERY", "industrial"),
            ("BUILDING", "construction"),
            ("FURNITURE", "consumer"),
            ("HOUSEHOLD", "consumer"),
        ],
        "c_mktsegment string, sector string",
    )
    return (
        sketch.join(exact, "c_mktsegment")
        .join(F.broadcast(dims), "c_mktsegment")
        .select(
            "c_mktsegment",
            "sector",
            "k_used",
            "kth_min_hash",
            F.expr(
                "CAST((k_used - 1) * 4294967296 DIV kth_min_hash AS BIGINT)"
            ).alias("est_distinct"),
            "n_exact",
        )
    )


# --- U4+A4+S2, ninth wave: bucketed-min distinct estimator via UDTF ------------

_HLL_BUCKETS_ORACLE = """
WITH h AS (
  SELECT (o_custkey * 2246822519) % 4294967296 AS hv
  FROM orders
),
reg AS (
  SELECT hv % 64 AS bucket,
         MIN(hv // 64) AS min_v,
         COUNT(*)      AS n
  FROM h GROUP BY 1
),
expanded AS (
  SELECT bucket % 8                       AS band,
         min_v,
         4294967296 // (min_v + 1)        AS contrib,
         n
  FROM reg
)
SELECT CAST(band AS BIGINT)               AS band,
       CAST(COUNT(*) AS BIGINT)           AS n_buckets,
       CAST(SUM(min_v) AS BIGINT)         AS sum_min_v,
       CAST(SUM(contrib) // COUNT(*) AS BIGINT) AS est_per_bucket,
       CAST(SUM(n) AS BIGINT)             AS n_rows
FROM expanded
GROUP BY 1
"""


@register(
    "u_udtf_hll_buckets",
    oracle=_HLL_BUCKETS_ORACLE,
    tags=("U4", "A4", "S2"),
)
def u_udtf_hll_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U4+A4+S2, ninth wave: the stochastic-averaging half of HLL — a
    64-register bucketed-MIN distinct estimator whose register table is
    built JVM-side (one combinable groupBy on hash%64) and whose
    register->estimate expansion runs through a LATERAL UDTF over the
    64 bounded register rows (the u_udtf_rollup_expand shape: Python
    table function mechanics, never on fact rows). Per bucket the
    estimator is domain/(min+1) — with a pure-arithmetic 32-bit hash
    ((key * 2246822519) mod 2^32) every register value, contribution,
    and banded estimate is an exact integer the oracle reproduces in
    SQL: approximate-by-design semantics, hash-proven numbers. The fact
    arrives through a pipe-delimited quoted CSV round trip (S2 — keys
    are integers, so the text round trip is lossless by construction).

    Scale: the CSV scan and the register groupBy are the only
    fact-width stages (both combinable); the UDTF touches exactly 64
    rows at any data size. 4294967296 = 64 buckets x 2^26 domain,
    written as one literal (DuckDB folds INT32 products)."""
    from pyspark.sql.functions import udtf

    from ..sources import scratch_dir

    path = scratch_dir(sf_dir, "orders_keys_csv")
    load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    ).write.mode("overwrite").option("header", True).option("sep", "|").csv(
        path
    )
    back = (
        spark.read.options(header=True, sep="|")
        .schema("o_orderkey long, o_custkey long")
        .csv(path)
    )
    reg = (
        back.select(
            ((F.col("o_custkey") * 2246822519) % 4294967296).alias("hv")
        )
        .select(
            (F.col("hv") % 64).alias("bucket"),
            (F.col("hv") / 64).cast("long").alias("v"),
        )
        .groupBy("bucket")
        .agg(
            F.min("v").cast("long").alias("min_v"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )

    @udtf(returnType="band bigint, min_v bigint, contrib bigint, n bigint")
    class RegisterExpand:
        def eval(self, bucket: int, min_v: int, n: int):
            yield bucket % 8, min_v, 4294967296 // (min_v + 1), n

    spark.udtf.register("hll_register_expand", RegisterExpand)
    reg.createOrReplaceTempView("hll_registers_r11")
    expanded = spark.sql(
        """
        SELECT r.band, r.min_v, r.contrib, r.n
        FROM hll_registers_r11 b,
             LATERAL hll_register_expand(b.bucket, b.min_v, b.n) r
        """
    )
    return expanded.groupBy("band").agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.sum("min_v").cast("long").alias("sum_min_v"),
        F.expr("CAST(SUM(contrib) DIV COUNT(*) AS BIGINT)").alias(
            "est_per_bucket"
        ),
        F.sum("n").cast("long").alias("n_rows"),
    )


# --- U1+F6+S3, ninth wave: pandas UDF over a JSON-lines payload column ---------

_JSON_GATE_ORACLE = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS total_cents,
       CAST(SUM(user_id % 7 + event_id % 11) AS BIGINT)        AS marks_total
FROM events
GROUP BY event_type
"""


@register(
    "u_pandas_json_gate",
    oracle=_JSON_GATE_ORACLE,
    tags=("U1", "F6", "S3"),
)
def u_pandas_json_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1+F6+S3, ninth wave: a JSON sink/scan round trip where part of
    the payload stays as an EMBEDDED JSON STRING column — the events
    land in a written .json directory (S3 both directions) as
    {event_type, payload} with payload itself a to_json'd
    {v_cents, marks[2]} document (the envelope-in-envelope shape log
    pipelines actually emit). Read back, the JVM json path extracts the
    money with get_json_object (F6) while an Arrow scalar pandas UDF
    (U1) parses the SAME payload with json.loads and folds the marks
    array — two independent decoders over one string column, both
    oracle-checked against the pre-serialization arithmetic. Cents are
    converted to integers BEFORE the text sink so the round trip is
    lossless.

    Scale: the UDF is Arrow-batched stdlib-json over one string column;
    at 100 TB the marks fold would move to from_json + aggregate (the
    JVM spelling lives in F4/F6 queries) — this query pins that the
    escape hatch agrees with it."""
    import json as _json

    from ..sources import scratch_dir

    path = scratch_dir(sf_dir, "events_json_gate")
    load_table(spark, sf_dir, "events").select(
        "event_type",
        F.to_json(
            F.struct(
                cents(F.col("value")).alias("v_cents"),
                F.array(
                    F.col("user_id") % 7, F.col("event_id") % 11
                ).alias("marks"),
            )
        ).alias("payload"),
    ).write.mode("overwrite").json(path)
    back = spark.read.schema("event_type string, payload string").json(path)

    @pandas_udf("long")
    def marks_sum(payload: pd.Series) -> pd.Series:
        return payload.map(lambda s: sum(_json.loads(s)["marks"]))

    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.get_json_object("payload", "$.v_cents").cast("long"))
        .cast("long")
        .alias("total_cents"),
        F.sum(marks_sum(F.col("payload"))).cast("long").alias("marks_total"),
    )


# --- U1+P3+P4, ninth wave: UDF-banded predicate gauntlet ------------------------

_BAND_FILTER_ORACLE = """
WITH banded AS (
  SELECT c_mktsegment, c_nationkey,
         CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents,
         (CAST(ROUND(c_acctbal * 100) AS BIGINT) + 100000) // 250000 AS band
  FROM customer
  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY', 'AUTOMOBILE')
    AND c_acctbal BETWEEN -500 AND 9500
    AND c_name LIKE '%5'
)
SELECT c_mktsegment,
       CAST(band AS BIGINT)              AS band,
       CAST(COUNT(*) AS BIGINT)          AS n_customers,
       CAST(SUM(cents) AS BIGINT)        AS total_cents,
       CAST(COUNT(DISTINCT c_nationkey) AS BIGINT) AS n_nations
FROM banded
WHERE (band >= 2 AND NOT c_mktsegment = 'MACHINERY')
   OR (band = 0 AND c_nationkey < 10)
GROUP BY 1, 2
"""


@register(
    "u_pandas_band_filter",
    oracle=_BAND_FILTER_ORACLE,
    tags=("U1", "P3", "P4"),
)
def u_pandas_band_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1+P3+P4, ninth wave: a UDF output inside the predicate gauntlet
    — an Arrow scalar pandas UDF (U1) bands account balances by exact
    shifted-integer floor division (cents+100000)//250000 (the shift
    keeps both engines in positive-operand division, dodging the
    floor-vs-truncate negative-division split), and the banded rows
    then pass IN + BETWEEN + LIKE scan predicates (P4) and a boolean
    COMBINATION over the UDF column itself ((band>=2 AND NOT seg) OR
    (band=0 AND nation<10), P3) before a per-(segment, band) census.
    Proves predicate semantics hold when one operand is Python-computed.

    Scale: the scan predicates (IN/BETWEEN/LIKE on native columns) push
    to the parquet reader BELOW the UDF — only surviving rows pay the
    Arrow hop; the band predicate necessarily evaluates after it."""
    import numpy as np

    @pandas_udf("long")
    def band(v: pd.Series) -> pd.Series:
        x = v.to_numpy(dtype="float64") * 100.0
        c = np.trunc(x + np.copysign(0.5, x)).astype("int64")
        return pd.Series((c + 100000) // 250000)

    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY", "AUTOMOBILE")
        & F.col("c_acctbal").between(-500, 9500)
        & F.col("c_name").like("%5")
    )
    banded = c.select(
        "c_mktsegment",
        "c_nationkey",
        cents(F.col("c_acctbal")).alias("cents"),
        band(F.col("c_acctbal")).alias("band"),
    ).filter(
        ((F.col("band") >= 2) & ~(F.col("c_mktsegment") == "MACHINERY"))
        | ((F.col("band") == 0) & (F.col("c_nationkey") < 10))
    )
    return banded.groupBy("c_mktsegment", "band").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("cents").cast("long").alias("total_cents"),
        F.countDistinct("c_nationkey").cast("long").alias("n_nations"),
    )


# --- U5+S2+S6, ninth wave: iterator-UDF digest over a quoted CSV scan ----------

_CSV_DIGEST_ORACLE = """
SELECT (CAST(SUBSTR(p_brand, 7) AS INT)) % 3               AS tier,
       p_brand,
       CAST(COUNT(*) AS BIGINT)                            AS n_parts,
       CAST(SUM((p_partkey * 31
                 + CAST(ROUND(p_retailprice * 100) AS BIGINT)) % 1000003)
            AS BIGINT)                                     AS checksum_sum,
       CAST(MIN(CAST(ROUND(p_retailprice * 100) AS BIGINT)) AS BIGINT)
         AS min_cents,
       CAST(MAX(CAST(ROUND(p_retailprice * 100) AS BIGINT)) AS BIGINT)
         AS max_cents
FROM part
GROUP BY 1, 2
"""


@register(
    "u_iter_csv_digest",
    oracle=_CSV_DIGEST_ORACLE,
    tags=("U5", "S2", "S6"),
)
def u_iter_csv_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U5+S2+S6, ninth wave: an ingest-integrity digest computed by an
    ITERATOR pandas UDF over a fully-quoted CSV round trip — parts are
    written with quoteAll (names contain spaces; the dialect is
    exercised on every field) and money as pre-converted integer cents
    (S2, text-lossless), read back with an explicit schema, and
    mapInPandas folds each Arrow batch into PER-BRAND PARTIALS (n, sum
    of per-row modular checksums, min/max cents) — one partial row per
    (batch, brand), so Python emits O(batches x brands) rows while the
    JVM groupBy does the cross-partition merge (sum/sum/min/max are all
    combinable). The brand tier joins from a 25-row createDataFrame
    dimension (S6), broadcast; the oracle states the same tier as
    SUBSTR arithmetic — the documented identity between the dim and
    the brand numbering.

    Scale: the checksum is per-row modular arithmetic (sum of mods, NOT
    mod of sum — order-free and exactly SQL-stated); Python never holds
    more than one Arrow batch; the merge is a 25-key shuffle."""
    import numpy as np

    from ..sources import scratch_dir

    path = scratch_dir(sf_dir, "part_csv_quoted")
    load_table(spark, sf_dir, "part").select(
        "p_partkey",
        "p_brand",
        "p_name",
        cents(F.col("p_retailprice")).alias("price_cents"),
    ).write.mode("overwrite").option("header", True).option(
        "quoteAll", True
    ).csv(path)
    back = (
        spark.read.options(header=True)
        .schema("p_partkey long, p_brand string, p_name string, price_cents long")
        .csv(path)
    )

    def digest(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            chk = (
                pdf["p_partkey"].to_numpy(dtype="int64") * 31
                + pdf["price_cents"].to_numpy(dtype="int64")
            ) % 1000003
            g = pd.DataFrame(
                {"p_brand": pdf["p_brand"], "chk": chk, "c": pdf["price_cents"]}
            ).groupby("p_brand")
            out = g.agg(
                n=("chk", "size"),
                checksum_sum=("chk", "sum"),
                min_cents=("c", "min"),
                max_cents=("c", "max"),
            ).reset_index()
            yield out

    partials = back.mapInPandas(
        digest,
        "p_brand string, n long, checksum_sum long, min_cents long, "
        "max_cents long",
    )
    tiers = spark.createDataFrame(
        [(f"Brand#{i}", i % 3) for i in range(1, 26)],
        "p_brand string, tier int",
    )
    return (
        partials.join(F.broadcast(tiers), "p_brand")
        .groupBy(F.col("tier").cast("long").alias("tier"), "p_brand")
        .agg(
            F.sum("n").cast("long").alias("n_parts"),
            F.sum("checksum_sum").cast("long").alias("checksum_sum"),
            F.min("min_cents").cast("long").alias("min_cents"),
            F.max("max_cents").cast("long").alias("max_cents"),
        )
    )
