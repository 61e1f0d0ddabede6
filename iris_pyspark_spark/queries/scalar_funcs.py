"""Scalar function families (SURVEY.md §2.7, F1–F7).

One query per family, each exercising several functions. All functions
here are JVM built-ins (whole-stage codegen) — never Python UDFs.

Cross-engine hazards handled:
  * regexp_replace: DuckDB replaces first match only → 'g' flag.
  * datediff argument order is reversed between engines.
  * day-of-week numbering differs → derived from ISO dow identically.
  * libm 1-ulp divergence (exp/ln/pow on arbitrary doubles) → rounded
    to 6 decimals on both sides (round boundaries of irrational results
    are measure-zero).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "f_string_funcs",
    oracle="""
SELECT
  c_custkey,
  UPPER(c_mktsegment)                              AS seg_upper,
  LOWER(c_name)                                    AS name_lower,
  TRIM(CONCAT('  ', c_name, '  '))                 AS name_trimmed,
  SUBSTRING(c_name, 1, 8)                          AS name_prefix,
  LENGTH(c_name)                                   AS name_len,
  CONCAT(c_mktsegment, ':', c_name)                AS seg_name,
  REGEXP_EXTRACT(c_name, 'Customer#(\\d+)', 1)     AS cust_digits,
  REGEXP_REPLACE(c_name, '0', 'O', 'g')            AS name_os,
  LPAD(CAST(c_nationkey AS VARCHAR), 4, '0')       AS nation_padded,
  REVERSE(c_mktsegment)                            AS seg_rev
FROM customer
""",
    tags=("F1",),
)
def f_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_mktsegment").alias("seg_upper"),
        F.lower("c_name").alias("name_lower"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit("  "))).alias("name_trimmed"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").alias("name_len"),
        F.concat(F.col("c_mktsegment"), F.lit(":"), F.col("c_name")).alias("seg_name"),
        F.regexp_extract("c_name", r"Customer#(\d+)", 1).alias("cust_digits"),
        F.regexp_replace("c_name", "0", "O").alias("name_os"),
        F.lpad(F.col("c_nationkey").cast("string"), 4, "0").alias("nation_padded"),
        F.reverse("c_mktsegment").alias("seg_rev"),
    )


@register(
    "f_split_explode",
    oracle="""
SELECT p_partkey,
       STRING_SPLIT(p_name, ' ')[1] AS first_word,
       LEN(STRING_SPLIT(p_name, ' ')) AS n_words
FROM part
""",
    tags=("F1", "F4"),
)
def f_split_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    words = F.split("p_name", " ")
    return p.select(
        "p_partkey",
        F.element_at(words, 1).alias("first_word"),
        F.size(words).alias("n_words"),
    )


@register(
    "f_date_funcs",
    oracle="""
SELECT
  o_orderkey,
  YEAR(o_orderdate)                              AS y,
  MONTH(o_orderdate)                             AS m,
  DAY(o_orderdate)                               AS d,
  QUARTER(o_orderdate)                           AS q,
  (ISODOW(o_orderdate) % 7) + 1                  AS dow_sunday1,
  DATE_TRUNC('month', o_orderdate)               AS month_start,
  DATE_DIFF('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS days_since_epoch_start,
  o_orderdate + INTERVAL 30 DAY                  AS due_date,
  CAST(EPOCH(o_orderdate) AS BIGINT)             AS epoch_sec
FROM orders
""",
    tags=("F2",),
)
def f_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    # Spark dayofweek is Sunday=1; state it via ISO dow so both engines
    # compute the same formula ((isodow % 7) + 1 == dayofweek).
    return o.select(
        "o_orderkey",
        F.year(d).alias("y"),
        F.month(d).alias("m"),
        F.dayofmonth(d).alias("d"),
        F.quarter(d).alias("q"),
        F.dayofweek(d).alias("dow_sunday1"),
        F.date_trunc("month", d).alias("month_start"),
        F.datediff(d.cast("date"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_epoch_start"
        ),
        (d + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
        F.unix_seconds(d.cast("timestamp")).alias("epoch_sec"),
    )


@register(
    "f_math_funcs",
    oracle="""
SELECT
  p_partkey,
  CAST(FLOOR(p_retailprice) AS BIGINT)   AS price_floor,
  CAST(CEIL(p_retailprice) AS BIGINT)    AS price_ceil,
  ABS(p_size - 25)                       AS size_dev,
  ((p_partkey % 7) + 7) % 7              AS key_mod7,
  CAST(POW(2, p_size % 5) AS BIGINT)     AS pow2,
  CAST(SIGN(p_retailprice - 1000) AS INT) AS above_1k,
  ROUND(SQRT(CAST(p_size AS DOUBLE)), 6) AS sqrt_size,
  ROUND(LN(p_retailprice), 6)            AS ln_price,
  ROUND(EXP(CAST(p_size AS DOUBLE) / 50), 6) AS exp_size
FROM part
""",
    tags=("F3",),
)
def f_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    price = F.col("p_retailprice")
    size = F.col("p_size")
    return p.select(
        "p_partkey",
        F.floor(price).alias("price_floor"),
        F.ceil(price).alias("price_ceil"),
        F.abs(size - 25).alias("size_dev"),
        F.pmod("p_partkey", F.lit(7)).alias("key_mod7"),
        F.pow(F.lit(2), size % 5).cast("long").alias("pow2"),
        F.signum(price - 1000).cast("int").alias("above_1k"),
        F.round(F.sqrt(size.cast("double")), 6).alias("sqrt_size"),
        F.round(F.log(price), 6).alias("ln_price"),
        F.round(F.exp(size.cast("double") / 50), 6).alias("exp_size"),
    )


@register(
    "f_array_funcs",
    oracle="""
SELECT
  vec_id,
  LEN(embedding)                                    AS dim,
  embedding[1]                                      AS first_elem,
  embedding[1]                                      AS head_1,
  embedding[2]                                      AS head_2,
  embedding[3]                                      AS head_3,
  embedding[4]                                      AS head_4,
  LIST_REDUCE(LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
              (a, b) -> a + b)                      AS norm_sq,
  LIST_SORT(embedding[1:4])[1]                      AS sorted_1,
  LIST_SORT(embedding[1:4])[4]                      AS sorted_4,
  LEN(LIST_DISTINCT([label, label % 3, 7]))         AS n_distinct_labels
FROM embeddings
""",
    tags=("F4",),
)
def f_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function family over the embedding column. Checked output is
    scalar-only by contract: slice/sort_array are exercised but their
    elements are projected to scalar columns (head_1..4, sorted_1/4) —
    raw array cells crash the driver canonicalizer's sort_values
    (CORRECTNESS_r03 TypeError: unhashable numpy.ndarray)."""
    e = load_table(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    head4 = F.slice(emb, 1, 4)
    head4_sorted = F.sort_array(F.slice(emb, 1, 4))
    return e.select(
        "vec_id",
        F.size(emb).alias("dim"),
        F.element_at(emb, 1).alias("first_elem"),
        F.element_at(head4, 1).alias("head_1"),
        F.element_at(head4, 2).alias("head_2"),
        F.element_at(head4, 3).alias("head_3"),
        F.element_at(head4, 4).alias("head_4"),
        F.aggregate(
            F.transform(emb, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("norm_sq"),
        F.element_at(head4_sorted, 1).alias("sorted_1"),
        F.element_at(head4_sorted, 4).alias("sorted_4"),
        F.size(
            F.array_distinct(F.array(F.col("label"), F.col("label") % 3, F.lit(7)))
        ).alias("n_distinct_labels"),
    )


@register(
    "f_map_funcs",
    oracle="""
SELECT
  doc_id,
  'lang'                                        AS k1,
  lang                                          AS v1,
  MAP(['lang', 'source'], [lang, source])['lang'][1] AS lang_via_map,
  ARRAY_TO_STRING(MAP_KEYS(MAP(['lang', 'source'], [lang, source])), ',') AS keys_csv
FROM documents
""",
    tags=("F5",),
)
def f_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    m = F.create_map(
        F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source")
    )
    return d.select(
        "doc_id",
        F.lit("lang").alias("k1"),
        F.col("lang").alias("v1"),
        F.element_at(m, "lang").alias("lang_via_map"),
        F.array_join(F.map_keys(m), ",").alias("keys_csv"),
    )


@register(
    "f_json_funcs",
    oracle="""
SELECT
  event_id,
  JSON_EXTRACT_STRING(props, '$.k')              AS k_str,
  CAST(JSON_EXTRACT_STRING(props, '$.k') AS INT) AS k_int,
  CAST(JSON_EXTRACT_STRING(props, '$.k') AS INT) > 50 AS k_gt50
FROM events
""",
    tags=("F6",),
)
def f_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    k_str = F.get_json_object("props", "$.k")
    parsed = F.from_json("props", "k INT")
    return e.select(
        "event_id",
        k_str.alias("k_str"),
        parsed.getField("k").alias("k_int"),
        (parsed.getField("k") > 50).alias("k_gt50"),
    )


@register(
    "f_hash_funcs",
    oracle="""
SELECT
  doc_id,
  MD5(text)                       AS text_md5,
  SHA256(lang)                    AS lang_sha256
FROM documents
""",
    tags=("F7",),
)
def f_hash_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2("lang", 256).alias("lang_sha256"),
    )


# xxhash64 / crc32 have no DuckDB equivalents → rows-only check; they are
# the hash basis for the dedup operators so they get their own entry.
@register("f_hash_spark_native", oracle=None, tags=("F7",))
def f_hash_spark_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only self-validation: `crc_ok` pins crc32 into its 32-bit
    range per row, and `collision_ok` (broadcast of a 1-row summary)
    asserts xxhash64 is injective on this corpus — distinct hash count
    equals distinct text count, the property every dedup operator built
    on it depends on."""
    from pyspark.sql.functions import broadcast

    d = load_table(spark, sf_dir, "documents")
    summary = d.agg(
        F.countDistinct("text").alias("n_texts"),
        F.countDistinct(F.xxhash64("text")).alias("n_hashes"),
    )
    return (
        d.select(
            "doc_id",
            F.xxhash64("text").alias("text_xxh64"),
            F.crc32("lang").alias("lang_crc32"),
            F.hash("text", "lang").alias("row_hash32"),
        )
        .crossJoin(broadcast(summary))
        .withColumn(
            "crc_ok",
            (F.col("lang_crc32") >= 0) & (F.col("lang_crc32") <= F.lit(4294967295)),
        )
        .withColumn("collision_ok", F.col("n_hashes") == F.col("n_texts"))
        .drop("n_texts", "n_hashes")
    )


_VARIANT_ORACLE = """
SELECT event_type,
       CAST(SUM(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
       CAST(MAX(CAST(json_extract(props, '$.k') AS INT)) AS INT)    AS max_k,
       COUNT(*) AS n
FROM events
WHERE CAST(json_extract(props, '$.k') AS INT) IS NOT NULL
GROUP BY event_type
"""


@register("f_variant_type", oracle=_VARIANT_ORACLE, tags=("F6",))
def f_variant_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT (Spark 4's open semi-structured type): parse_json into a
    variant column once, then typed variant_get extraction — unlike
    get_json_object this parses each document a single time and keeps a
    binary-encoded tree, the right shape for wide semi-structured scans
    at 100 TB."""
    e = load_table(spark, sf_dir, "events")
    v = e.select(
        "event_type", F.parse_json(F.col("props")).alias("v")
    ).select(
        "event_type",
        F.variant_get(F.col("v"), "$.k", "int").alias("k"),
    )
    return (
        v.filter(F.col("k").isNotNull())
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
            F.count(F.lit(1)).alias("n"),
        )
    )


_TRY_ORACLE = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN l_discount = 0 THEN NULL
                     ELSE CAST(ROUND(l_extendedprice / l_discount) AS BIGINT)
                END) AS BIGINT)                          AS sum_price_per_disc,
       COUNT(*) FILTER (WHERE NOT regexp_matches(l_returnflag, '^[+-]?[0-9]+$'))
                                                         AS n_nonnumeric_flags,
       CAST(SUM(TRY_CAST(l_linenumber AS BIGINT)) AS BIGINT)         AS sum_lineno
FROM lineitem
GROUP BY l_linestatus
"""


@register("f_try_functions", oracle=_TRY_ORACLE, tags=("F3", "P5"))
def f_try_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe expression family: try_divide (NULL on /0 instead of
    error under ANSI mode) and try_cast (NULL on malformed input) — the
    functions that keep a 100 TB scan alive when a handful of rows are
    garbage.

    Scale note, measured: try_cast's FAILURE path throws and catches a
    JVM exception per failing row under ANSI (~8us/row — 4.9s for one
    600k-row column where every value fails; at 100 TB that is the
    whole job). try_cast is therefore for RARE garbage; a column
    expected to be mostly non-numeric is classified with a cheap regex
    guard instead (same semantics on this data, no exception traffic,
    0.3s). The success-path try_casts (l_linenumber) stay — they cost
    nothing."""
    li = load_table(spark, sf_dir, "lineitem")
    price_per_disc = F.round(
        F.try_divide(F.col("l_extendedprice"), F.col("l_discount"))
    ).cast("long")
    return li.groupBy("l_linestatus").agg(
        F.sum(price_per_disc).alias("sum_price_per_disc"),
        F.count_if(~F.col("l_returnflag").rlike("^[+-]?[0-9]+$")).alias(
            "n_nonnumeric_flags"
        ),
        F.sum(F.col("l_linenumber").try_cast("bigint")).alias("sum_lineno"),
    )


_DATE_ADV_ORACLE = """
SELECT
  CAST(year(o_orderdate) AS INT)                              AS yr,
  CAST(quarter(o_orderdate) AS INT)                           AS qtr,
  MIN(CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR))   AS first_month_end,
  MAX(CAST(CAST(date_trunc('week', o_orderdate) AS DATE) AS VARCHAR)) AS last_week_start,
  CAST(MAX(date_diff('day', CAST(o_orderdate AS DATE),
                     DATE '1999-01-01')) AS INT)              AS max_days_to_1999,
  COUNT(*) AS n
FROM orders
GROUP BY 1, 2
"""


@register("f_date_advanced", oracle=_DATE_ADV_ORACLE, tags=("F2",))
def f_date_advanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar arithmetic beyond the basics: quarter boundaries,
    last_day-of-month, ISO week truncation, day differences."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return (
        o.groupBy(
            F.year("o_orderdate").alias("yr"),
            F.quarter("o_orderdate").alias("qtr"),
        )
        .agg(
            F.min(F.last_day(d).cast("string")).alias("first_month_end"),
            F.max(F.date_trunc("week", "o_orderdate").cast("date").cast("string")).alias(
                "last_week_start"
            ),
            F.max(F.datediff(F.lit("1999-01-01").cast("date"), d)).alias(
                "max_days_to_1999"
            ),
            F.count(F.lit(1)).alias("n"),
        )
    )


_EXPLODE_OUTER_ORACLE = """
SELECT doc_id, word
FROM (
  SELECT doc_id,
         CASE WHEN lang = 'zh' THEN NULL
              ELSE string_split(LOWER(LEFT(text, 30)), ' ') END AS words
  FROM documents
)
LEFT JOIN LATERAL UNNEST(words) AS t(word) ON TRUE
"""


@register("f_explode_outer", oracle=_EXPLODE_OUTER_ORACLE, tags=("F4", "P5"))
def f_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer: null/empty arrays keep their parent row (word =
    NULL) instead of dropping it — plain explode silently loses rows,
    which at 100 TB means silently losing documents."""
    d = load_table(spark, sf_dir, "documents")
    words = F.when(
        F.col("lang") != "zh",
        F.split(F.lower(F.col("text").substr(1, 30)), " "),
    )
    return d.select("doc_id", words.alias("words")).select(
        "doc_id", F.explode_outer("words").alias("word")
    )


_BITWISE_ORACLE = """
SELECT event_id,
       event_id & 255                    AS low_byte,
       event_id | 4096                   AS with_flag,
       xor(event_id, user_id)            AS mixed,
       CAST(event_id << 2 AS BIGINT)     AS shifted_l,
       CAST(event_id >> 3 AS BIGINT)     AS shifted_r,
       CAST(bit_count(event_id) AS INT)  AS popcount
FROM events
WHERE event_id < 200
"""


@register("f_bitwise_funcs", oracle=_BITWISE_ORACLE, tags=("F3",))
def f_bitwise_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise family: and/or/xor, shifts, popcount — the primitives the
    dedup/LSH operators build on, exposed as a query of their own."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 200)
    eid = F.col("event_id")
    return e.select(
        "event_id",
        eid.bitwiseAND(F.lit(255)).alias("low_byte"),
        eid.bitwiseOR(F.lit(4096)).alias("with_flag"),
        eid.bitwiseXOR(F.col("user_id")).alias("mixed"),
        F.shiftleft(eid, 2).alias("shifted_l"),
        F.shiftright(eid, 3).alias("shifted_r"),
        F.bit_count(eid).alias("popcount"),
    )


# --- Combined-family queries (driver-sweep representatives) ----------------
# The external driver's correctness sweep has a bounded budget of registry
# entries; these two queries each exercise a FULL §2 family combination
# (F2+F3, F5+F6+F7) in one plan so the priority prefix of the registry can
# cover every family. Expressions are the cross-engine-safe subset proven
# by the per-family queries above.

_TEMPORAL_MATH_ORACLE = """
SELECT
  o_orderkey,
  YEAR(o_orderdate)                                AS y,
  QUARTER(o_orderdate)                             AS q,
  (ISODOW(o_orderdate) % 7) + 1                    AS dow_sunday1,
  DATE_TRUNC('month', o_orderdate)                 AS month_start,
  o_orderdate + INTERVAL 30 DAY                    AS due_date,
  CAST(FLOOR(o_totalprice) AS BIGINT)              AS price_floor,
  CAST(CEIL(o_totalprice) AS BIGINT)               AS price_ceil,
  ABS(o_custkey - 750)                             AS cust_dev,
  ((o_orderkey % 7) + 7) % 7                       AS key_mod7,
  CAST(SIGN(o_totalprice - 150000) AS INT)         AS above_150k,
  ROUND(SQRT(o_totalprice), 6)                     AS sqrt_price,
  ROUND(LN(o_totalprice), 6)                       AS ln_price
FROM orders
"""


@register("f_temporal_math", oracle=_TEMPORAL_MATH_ORACLE, tags=("F2", "F3"))
def f_temporal_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 (date/time) + F3 (math) in one projection over orders — the
    per-family forms live in f_date_funcs / f_math_funcs; this combined
    shape keeps the driver's bounded correctness sweep covering both
    rows. All expressions stay inside whole-stage codegen."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    price = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.year(d).alias("y"),
        F.quarter(d).alias("q"),
        F.dayofweek(d).alias("dow_sunday1"),
        F.date_trunc("month", d).alias("month_start"),
        (d + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
        F.floor(price).alias("price_floor"),
        F.ceil(price).alias("price_ceil"),
        F.abs(F.col("o_custkey") - 750).alias("cust_dev"),
        F.pmod("o_orderkey", F.lit(7)).alias("key_mod7"),
        F.signum(price - 150000).cast("int").alias("above_150k"),
        F.round(F.sqrt(price), 6).alias("sqrt_price"),
        F.round(F.log(price), 6).alias("ln_price"),
    )


_SEMISTRUCTURED_ORACLE = """
SELECT
  event_id,
  MAP(['type', 'origin'], [event_type, 'events'])['type'][1]  AS type_via_map,
  ARRAY_TO_STRING(MAP_KEYS(MAP(['type', 'origin'], [event_type, 'events'])), ',') AS keys_csv,
  JSON_EXTRACT_STRING(props, '$.k')                           AS k_str,
  CAST(JSON_EXTRACT_STRING(props, '$.k') AS INT)              AS k_int,
  MD5(props)                                                  AS props_md5,
  SHA256(event_type)                                          AS type_sha256
FROM events
WHERE event_id < 5000
"""


@register("f_semistructured", oracle=_SEMISTRUCTURED_ORACLE, tags=("F5", "F6", "F7"))
def f_semistructured(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5 (map) + F6 (json) + F7 (hash) in one projection over events —
    combined-family representative for the driver sweep; per-family
    forms live in f_map_funcs / f_json_funcs / f_hash_funcs."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 5000)
    m = F.create_map(
        F.lit("type"), F.col("event_type"), F.lit("origin"), F.lit("events")
    )
    return e.select(
        "event_id",
        F.element_at(m, "type").alias("type_via_map"),
        F.array_join(F.map_keys(m), ",").alias("keys_csv"),
        F.get_json_object("props", "$.k").alias("k_str"),
        F.from_json("props", "k INT").getField("k").alias("k_int"),
        F.md5("props").alias("props_md5"),
        F.sha2("event_type", 256).alias("type_sha256"),
    )


_HOF_ORACLE = """
SELECT vec_id,
       len(list_filter(embedding, x -> x > 0))                  AS n_positive,
       CASE WHEN len(list_filter(embedding, x -> x > 0.4)) > 0
            THEN TRUE ELSE FALSE END                            AS any_large,
       CASE WHEN len(list_filter(embedding, x -> abs(x) <= 1.0)) = len(embedding)
            THEN TRUE ELSE FALSE END                            AS all_bounded,
       CAST(ROUND(list_reduce(
         list_transform(embedding, x -> CAST(x AS DOUBLE)),
         (a, b) -> a + b) * 1000000) AS BIGINT)                 AS sum_micro
FROM embeddings
WHERE vec_id < 50
"""


@register("f_higher_order_funcs", oracle=_HOF_ORACLE, tags=("F4",))
def f_higher_order_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions: filter/exists/forall/aggregate with
    lambdas. Semantics coverage — the HOT paths avoid HOFs (they run
    interpreted; see operators/similarity.py), but the API surface is
    part of the engine contract. The fold matches DuckDB's list_reduce
    seeded by the first element; micro-rounding shields nothing (values
    are bit-equal) but keeps the output integer."""
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 50)
    emb = F.col("embedding")
    first_plus_rest = F.aggregate(
        F.slice(F.transform(emb, lambda x: x.cast("double")), 2, 10_000),
        F.element_at(emb, 1).cast("double"),
        lambda acc, x: acc + x,
    )
    return e.select(
        "vec_id",
        F.size(F.filter(emb, lambda x: x > 0)).alias("n_positive"),
        F.exists(emb, lambda x: x > 0.4).alias("any_large"),
        F.forall(emb, lambda x: F.abs(x) <= 1.0).alias("all_bounded"),
        F.round(first_plus_rest * 1_000_000).cast("long").alias("sum_micro"),
    )


_REGEX_ORACLE = r"""
SELECT doc_id,
       regexp_matches(text, '[0-9]')                          AS has_digits,
       CAST(LEN(regexp_extract_all(LOWER(text), '[a-z]+')) AS INT) AS n_word_runs,
       NULLIF(regexp_extract(LOWER(text), '[a-z]{7,}'), '')   AS first_long_word,
       NULLIF(ARRAY_TO_STRING(regexp_extract_all(LOWER(text), '[a-z]{7,}'), '|'), '') AS long_words
FROM documents
WHERE doc_id < 200
"""


@register("f_regex_funcs", oracle=_REGEX_ORACLE, tags=("F1",))
def f_regex_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex family: rlike, regexp_extract (empty-match normalized to
    NULL on both engines — Spark returns '' where DuckDB returns NULL),
    regexp_extract_all, regexp_count-backed run counting. long_words is
    pipe-joined to a string: checked output must be scalar-only (driver
    canonicalizer contract)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    lower = F.lower(F.col("text"))
    return d.select(
        "doc_id",
        F.col("text").rlike("[0-9]").alias("has_digits"),
        F.regexp_count(lower, F.lit("[a-z]+")).alias("n_word_runs"),
        F.nullif(F.regexp_extract(lower, "[a-z]{7,}", 0), F.lit("")).alias(
            "first_long_word"
        ),
        F.nullif(
            F.array_join(F.regexp_extract_all(lower, F.lit("[a-z]{7,}"), 0), "|"),
            F.lit(""),
        ).alias("long_words"),
    )


_MAP_HOF_ORACLE = """
SELECT doc_id, 'chars' AS k, n_chars * 2 AS v2 FROM documents WHERE doc_id < 100
UNION ALL
SELECT doc_id, 'ident', doc_id * 2 FROM documents WHERE doc_id < 100
"""


@register("f_map_transform", oracle=_MAP_HOF_ORACLE, tags=("F5",))
def f_map_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map higher-order functions (transform_values, then explode back
    to rows): the oracle states the expected key/value rows directly, so
    the map machinery is checked against map-free relational truth."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    m = F.create_map(
        F.lit("chars"), F.col("n_chars").cast("long"),
        F.lit("ident"), F.col("doc_id"),
    )
    doubled = F.transform_values(m, lambda k, v: v * 2)
    return d.select("doc_id", F.explode(doubled).alias("k", "v2"))


# --- URL functions ----------------------------------------------------------

_URL_ORACLE = """
SELECT doc_id,
       source || '.example.com'            AS host,
       '/docs/' || CAST(doc_id AS VARCHAR) AS path,
       lang                                AS qparam_lang,
       'a+b%26c'                           AS encoded
FROM documents
WHERE doc_id < 100
"""


@register("f_url_funcs", oracle=_URL_ORACLE, tags=("F1", "F6"))
def f_url_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing/encoding family: URLs are synthesized from table
    columns, then `parse_url` must recover exactly the parts they were
    built from (HOST, PATH, the `lang` query parameter), and
    `url_encode` must percent-encode the fixed string 'a b&c' to
    'a+b%26c'. The oracle states the expected parts relationally —
    DuckDB never needs a URL parser, it just restates the construction.
    All map-side JVM string ops; crawl-scale URL normalization runs at
    scan speed."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
        F.lit("&ref=feed"),
    )
    return d.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("qparam_lang"),
        F.url_encode(F.lit("a b&c")).alias("encoded"),
    )


# --- AES encrypt/decrypt round-trip -----------------------------------------

_AES_ORACLE = """
SELECT doc_id,
       SUBSTRING(text, 1, 40) AS decrypted_prefix,
       TRUE                   AS roundtrip_ok
FROM documents WHERE doc_id < 50
"""


@register("f_aes_roundtrip", oracle=_AES_ORACLE, tags=("F7", "F1"))
def f_aes_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level encryption surface: aes_encrypt (GCM, random IV per
    row — ciphertext is intentionally nondeterministic) then
    aes_decrypt with the same key must restore the plaintext exactly.
    The oracle checks the recovered plaintext, the only deterministic
    artifact; the in-flight ciphertext never leaves the plan. This is
    the column-vaulting pattern for PII-bearing fields at rest —
    encryption is map-side JVM code, so it runs at scan speed on any
    partition count."""
    key = F.lit("0123456789abcdef")  # 16-byte AES-128 key (fixture)
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    ct = F.aes_encrypt(F.col("text").cast("binary"), key)
    pt = F.aes_decrypt(ct, key).cast("string")
    return d.select(
        "doc_id",
        F.substring(pt, 1, 40).alias("decrypted_prefix"),
        (pt == F.col("text")).alias("roundtrip_ok"),
    )


# --- collation-aware comparison (Spark 4 collations) ------------------------

_COLLATION_ORACLE = """
WITH mixed AS (
  SELECT n_name FROM nation
  UNION ALL SELECT LOWER(n_name) FROM nation
  UNION ALL SELECT
    UPPER(SUBSTRING(n_name, 1, 1)) || LOWER(SUBSTRING(n_name, 2)) FROM nation
)
SELECT LOWER(n_name) AS name_ci,
       COUNT(*)      AS n_variants
FROM mixed
GROUP BY name_ci
"""


@register("f_collation_group", oracle=_COLLATION_ORACLE, tags=("F1", "P7"))
def f_collation_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware grouping (Spark 4 collations): three case
    variants of every nation name collapse to one group under
    UTF8_LCASE — equality, grouping, and joins all honor the collation
    without rewriting every expression with lower(). The emitted key is
    lower()ed because a collated group's REPRESENTATIVE is whichever
    variant a partition saw first (engine-arbitrary); the collation
    decides membership, not spelling. The oracle states the same
    grouping with explicit LOWER."""
    n = load_table(spark, sf_dir, "nation").select("n_name")
    mixed = (
        n.unionByName(n.select(F.lower("n_name").alias("n_name")))
        .unionByName(n.select(F.initcap(F.lower("n_name")).alias("n_name")))
    )
    grouped = mixed.groupBy(
        F.collate(F.col("n_name"), "UTF8_LCASE").alias("k")
    ).agg(F.count(F.lit(1)).alias("n_variants"))
    return grouped.select(
        F.lower(F.col("k")).alias("name_ci"), "n_variants"
    )


# --- XML parsing ------------------------------------------------------------

_XML_ORACLE = """
SELECT n_nationkey,
       n_name      AS xname,
       n_regionkey AS xregion
FROM nation
"""


@register("f_xml_funcs", oracle=_XML_ORACLE, tags=("F6", "F1"))
def f_xml_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML ingestion surface: rows are serialized to XML strings from
    table columns, then from_xml must recover exactly the fields they
    were built from — the same construct-then-parse contract as the URL
    family, so DuckDB never needs an XML parser. Schema-on-read over
    feed/XML landing data is a scan-speed map at any scale."""
    n = load_table(spark, sf_dir, "nation")
    xml = F.concat(
        F.lit("<nation><name>"), F.col("n_name"),
        F.lit("</name><region>"), F.col("n_regionkey").cast("string"),
        F.lit("</region></nation>"),
    )
    parsed = n.select(
        "n_nationkey",
        F.from_xml(xml, "name STRING, region INT").alias("p"),
    )
    return parsed.select(
        "n_nationkey",
        F.col("p.name").alias("xname"),
        F.col("p.region").alias("xregion"),
    )


# --- interval arithmetic ----------------------------------------------------

_INTERVAL_ORACLE = """
SELECT o_orderkey,
       CAST(CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS VARCHAR)  AS due_date,
       CAST(CAST(o_orderdate + INTERVAL '45' DAY AS DATE) AS VARCHAR) AS followup_date,
       CAST(DATE_DIFF('day', CAST(o_orderdate AS DATE),
                      CAST(o_orderdate + INTERVAL 3 MONTH AS DATE)) AS BIGINT)
                                                             AS days_to_due
FROM orders WHERE o_orderkey <= 200
"""


@register("f_interval_arithmetic", oracle=_INTERVAL_ORACLE, tags=("F2",))
def f_interval_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-interval arithmetic: month intervals are calendar-aware
    (Jan 31 + 1 month = Feb 28 — not 30 fixed days), day intervals are
    exact; both engines implement the same end-of-month clamping, which
    this query pins across a date range that crosses month-length
    boundaries. days_to_due varies 89-92 by month — the reason SLA math
    must use intervals, not day constants."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 200)
    due = F.col("o_orderdate") + F.expr("INTERVAL 3 MONTHS")
    return o.select(
        "o_orderkey",
        # date columns cross pandas as strings: DuckDB DATE arrives as
        # datetime64 while Spark DATE arrives as date objects.
        due.cast("date").cast("string").alias("due_date"),
        (F.col("o_orderdate") + F.expr("INTERVAL 45 DAYS"))
        .cast("date").cast("string").alias("followup_date"),
        F.datediff(due.cast("date"), F.col("o_orderdate").cast("date"))
        .cast("long")
        .alias("days_to_due"),
    )


# ---------------------------------------------------------------------------
# Business-day arithmetic (weekend-excluding date math)
# ---------------------------------------------------------------------------

_BUSDAYS_ORACLE = """
WITH spans AS (
  SELECT DATE_DIFF('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS d0,
         DATE_DIFF('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS d1
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
bus AS (
  SELECT d1 - d0 AS calendar_days,
         (5 * ((d1 + 3) // 7) + LEAST((d1 + 3) % 7, 5))
         - (5 * ((d0 + 3) // 7) + LEAST((d0 + 3) % 7, 5)) AS business_days
  FROM spans WHERE d1 >= d0
)
SELECT business_days,
       COUNT(*) AS n_lines,
       MIN(calendar_days) AS min_calendar,
       MAX(calendar_days) AS max_calendar
FROM bus
GROUP BY business_days
ORDER BY business_days
"""


@register(
    "f_business_days_diff",
    oracle=_BUSDAYS_ORACLE,
    tags=("F2", "F3", "A1", "J1"),
)
def f_business_days_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekend-excluding date arithmetic: business days between order
    and ship date, as the distribution of lead times — NETWORKDAYS
    done in closed form instead of exploding a calendar: with
    Monday-aligned day numbers x = epoch_day + 3 (1969-12-29 was a
    Monday), B(x) = 5·⌊x/7⌋ + min(x mod 7, 5) counts business days
    before x, and the span is B(x1) − B(x0) — O(1) integer arithmetic
    per row where the join-a-calendar-spine approach costs a join and
    |span| rows each.

    Scale: the orderkey equi-join is the only shuffle; the
    business-day math is a pure map (positive-only floor division —
    epoch days are ~19,700 here, and the +3 alignment keeps x
    positive for all dates since 1969-12-29).
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    spans = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
        ).alias("d0"),
        F.datediff(
            F.col("l_shipdate").cast("date"), F.lit("1970-01-01").cast("date")
        ).alias("d1"),
    )

    bus = spans.filter(F.col("d1") >= F.col("d0")).select(
        (F.col("d1") - F.col("d0")).alias("calendar_days"),
        (
            (5 * F.expr("(d1 + 3) DIV 7") + F.least((F.col("d1") + 3) % 7, F.lit(5)))
            - (5 * F.expr("(d0 + 3) DIV 7") + F.least((F.col("d0") + 3) % 7, F.lit(5)))
        ).alias("business_days"),
    )
    return (
        bus.groupBy("business_days")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.min("calendar_days").alias("min_calendar"),
            F.max("calendar_days").alias("max_calendar"),
        )
        .orderBy("business_days")
    )


# ---------------------------------------------------------------------------
# Timezone conversion family (F2): UTC instants to zone wall-clocks
# ---------------------------------------------------------------------------

_TZ_ORACLE = """
SELECT event_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS utc_str,
       strftime((ts AT TIME ZONE 'UTC') AT TIME ZONE 'America/New_York',
                '%Y-%m-%d %H:%M:%S') AS ny_str,
       strftime((ts AT TIME ZONE 'UTC') AT TIME ZONE 'Asia/Tokyo',
                '%Y-%m-%d %H:%M:%S') AS tokyo_str,
       strftime((ts AT TIME ZONE 'UTC') AT TIME ZONE 'Asia/Kolkata',
                '%Y-%m-%d %H:%M:%S') AS kolkata_str,
       CAST(EXTRACT(hour FROM (ts AT TIME ZONE 'UTC')
                    AT TIME ZONE 'America/New_York') AS INT) AS ny_hour,
       DATE_DIFF('day', CAST(ts AS DATE),
                 CAST((ts AT TIME ZONE 'UTC') AT TIME ZONE 'Asia/Tokyo'
                      AS DATE)) AS tokyo_day_shift
FROM events
WHERE user_id % 7 = 0
"""


@register("f_timezone_functions", oracle=_TZ_ORACLE, tags=("F2", "F1"))
def f_timezone_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timezone conversion: UTC event instants rendered as wall-clock
    in named IANA zones — whole-hour offsets (America/New_York, DST
    aware via the zone db; Asia/Tokyo, no DST) and the half-hour
    offset case (Asia/Kolkata +05:30, the classic bug-finder), plus
    the derived local hour and the date rollover flag (Tokyo evenings
    land on tomorrow's date). Both engines resolve the SAME IANA tzdb
    names, so wall-clock strings compare exactly.

    Scale: pure per-row codegen projection — from_utc_timestamp is a
    JVM intrinsic over the session tzdb; no shuffle, pushes the
    user_id filter to the scan."""
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 7 == 0)
    fmt = "yyyy-MM-dd HH:mm:ss"

    def wall(tz: str) -> F.Column:
        return F.from_utc_timestamp(F.col("ts"), tz)

    return e.select(
        "event_id",
        F.date_format("ts", fmt).alias("utc_str"),
        F.date_format(wall("America/New_York"), fmt).alias("ny_str"),
        F.date_format(wall("Asia/Tokyo"), fmt).alias("tokyo_str"),
        F.date_format(wall("Asia/Kolkata"), fmt).alias("kolkata_str"),
        F.hour(wall("America/New_York")).alias("ny_hour"),
        F.datediff(
            F.to_date(wall("Asia/Tokyo")), F.to_date("ts")
        ).alias("tokyo_day_shift"),
    )


# ---------------------------------------------------------------------------
# Snowflake-style ID encode/decode round-trip
# ---------------------------------------------------------------------------

_SNOWFLAKE_ORACLE = """
WITH encoded AS (
  SELECT o_orderkey,
         DATEDIFF('ms', TIMESTAMP '1992-01-01 00:00:00', o_orderdate)
           AS epoch_ms,
         o_custkey % 1024          AS shard,
         o_orderkey % 4096         AS seq,
         (DATEDIFF('ms', TIMESTAMP '1992-01-01 00:00:00', o_orderdate))
           * 4194304 + (o_custkey % 1024) * 4096 + (o_orderkey % 4096)
           AS snowflake_id
  FROM orders
),
decoded AS (
  SELECT o_orderkey, snowflake_id, epoch_ms, shard, seq,
         snowflake_id // 4194304                    AS dec_ms,
         (snowflake_id // 4096) % 1024              AS dec_shard,
         snowflake_id % 4096                        AS dec_seq
  FROM encoded
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_ids,
       CAST(SUM(CASE WHEN dec_ms = epoch_ms AND dec_shard = shard
                      AND dec_seq = seq THEN 1 ELSE 0 END) AS BIGINT)
         AS n_roundtrip_ok,
       CAST(COUNT(DISTINCT snowflake_id) AS BIGINT) AS n_distinct_ids,
       CAST(MIN(snowflake_id) AS BIGINT) AS min_id,
       CAST(MAX(snowflake_id) AS BIGINT) AS max_id
FROM decoded
"""


@register(
    "f_snowflake_id_codec",
    oracle=_SNOWFLAKE_ORACLE,
    tags=("F7", "F3", "F2", "A3"),
)
def f_snowflake_id_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snowflake-style distributed ID codec: pack (ms-since-epoch,
    10-bit shard, 12-bit sequence) into one BIGINT and decode it back,
    proving the round-trip on every order — the time-sortable,
    coordination-free ID scheme every event pipeline reinvents. IDs
    from different shards interleave but remain globally time-ordered
    to the millisecond, which is why these keys range-prune on time.

    Determinism/scale: encode is row-local integer arithmetic
    (epoch_ms * 2^22 + shard * 2^12 + seq — spelled as multiplication,
    and decode as positive floor division/modulo, identical in Spark
    DIV and DuckDB //); the only shuffle is the final count-distinct
    rollup. 1992-epoch milliseconds * 2^22 stays under 2^63 for ~69
    years of timestamps — the same budget real Snowflake has."""
    o = load_table(spark, sf_dir, "orders")
    encoded = o.select(
        "o_orderkey",
        (
            F.unix_timestamp(F.col("o_orderdate"))
            - F.unix_timestamp(F.lit("1992-01-01 00:00:00").cast("timestamp"))
        ).alias("epoch_s"),
        (F.col("o_custkey") % 1024).alias("shard"),
        (F.col("o_orderkey") % 4096).alias("seq"),
    ).select(
        "o_orderkey",
        (F.col("epoch_s") * 1000).alias("epoch_ms"),
        "shard",
        "seq",
        (
            F.col("epoch_s") * 1000 * 4194304
            + F.col("shard") * 4096
            + F.col("seq")
        ).alias("snowflake_id"),
    )
    decoded = encoded.select(
        "snowflake_id",
        "epoch_ms",
        "shard",
        "seq",
        F.expr("snowflake_id DIV 4194304").alias("dec_ms"),
        F.expr("(snowflake_id DIV 4096) % 1024").alias("dec_shard"),
        (F.col("snowflake_id") % 4096).alias("dec_seq"),
    )
    return decoded.agg(
        F.count(F.lit(1)).alias("n_ids"),
        F.sum(
            F.when(
                (F.col("dec_ms") == F.col("epoch_ms"))
                & (F.col("dec_shard") == F.col("shard"))
                & (F.col("dec_seq") == F.col("seq")),
                1,
            ).otherwise(0)
        ).alias("n_roundtrip_ok"),
        F.count_distinct(F.col("snowflake_id")).alias("n_distinct_ids"),
        F.min("snowflake_id").alias("min_id"),
        F.max("snowflake_id").alias("max_id"),
    )


# ---------------------------------------------------------------------------
# Luhn check-digit computation and validation (PII/payment-card hygiene)
# ---------------------------------------------------------------------------

_LUHN_ORACLE = """
WITH pans AS (
  SELECT o_orderkey,
         LPAD(CAST(o_orderkey % 1000000000 AS VARCHAR), 9, '0')
           || LPAD(CAST(o_custkey % 1000000 AS VARCHAR), 6, '0') AS body
  FROM orders
),
digits AS (
  SELECT o_orderkey, body, pos,
         CAST(SUBSTRING(body, CAST(pos AS INT), 1) AS BIGINT) AS d,
         -- doubling applies to positions with odd distance from the
         -- RIGHT end of body||check (body length 15 -> odd positions)
         CASE WHEN pos % 2 = 1 THEN 1 ELSE 0 END AS dbl
  FROM pans, UNNEST(generate_series(1, 15)) AS t(pos)
),
sums AS (
  SELECT o_orderkey, body,
         CAST(SUM(CASE WHEN dbl = 1
                       THEN (2 * d) % 10 + (2 * d) // 10
                       ELSE d END) AS BIGINT) AS s
  FROM digits GROUP BY o_orderkey, body
),
carded AS (
  SELECT o_orderkey, body, (10 - s % 10) % 10 AS check_digit, s
  FROM sums
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_cards,
       CAST(SUM(CASE WHEN (s + check_digit) % 10 = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_valid,
       CAST(SUM(CASE WHEN (s + ((check_digit + 1) % 10)) % 10 = 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_tampered_pass,
       CAST(SUM(check_digit) AS BIGINT) AS checksum_digit_total
FROM carded
"""


@register(
    "f_luhn_checksum",
    oracle=_LUHN_ORACLE,
    tags=("F1", "F3", "F7"),
)
def f_luhn_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Luhn (mod-10) check-digit computation and validation over
    synthetic 15-digit card bodies derived from order/customer keys —
    the checksum behind every PAN detector in a PII-scanning pipeline
    (`n_pii_redaction` finds number SHAPES; Luhn separates real card
    numbers from random digit runs). Every generated check digit
    validates (n_valid == n_cards) and every single-digit tamper fails
    (n_tampered_pass == 0) — the checksum's guarantee, proven inline.

    Scale design — pure row-local integer arithmetic: the 15-digit
    explode is a map-side sequence (bounded fan-out 15), the doubled
    digits fold as (2d)%10 + (2d)//10 (positive operands, so Spark DIV
    and DuckDB // agree), and one combinable rollup produces the
    summary. No UDF, no shuffle beyond the final aggregate."""
    o = load_table(spark, sf_dir, "orders")
    pans = o.select(
        "o_orderkey",
        F.concat(
            F.lpad((F.col("o_orderkey") % 1000000000).cast("string"), 9, "0"),
            F.lpad((F.col("o_custkey") % 1000000).cast("string"), 6, "0"),
        ).alias("body"),
    )
    digits = pans.select(
        "o_orderkey",
        "body",
        F.explode(F.sequence(F.lit(1), F.lit(15))).alias("pos"),
    ).select(
        "o_orderkey",
        "body",
        F.substring(F.col("body"), 1, 15).substr(F.col("pos"), F.lit(1))
        .cast("long")
        .alias("d"),
        F.when(F.col("pos") % 2 == 1, 1).otherwise(0).alias("dbl"),
    )
    sums = digits.groupBy("o_orderkey", "body").agg(
        F.sum(
            F.when(
                F.col("dbl") == 1,
                (2 * F.col("d")) % 10 + F.expr("(2 * d) DIV 10"),
            ).otherwise(F.col("d"))
        ).alias("s")
    )
    carded = sums.select(
        "o_orderkey",
        "s",
        ((10 - F.col("s") % 10) % 10).alias("check_digit"),
    )
    return carded.agg(
        F.count(F.lit(1)).alias("n_cards"),
        F.sum(
            F.when((F.col("s") + F.col("check_digit")) % 10 == 0, 1).otherwise(0)
        ).alias("n_valid"),
        F.sum(
            F.when(
                (F.col("s") + ((F.col("check_digit") + 1) % 10)) % 10 == 0, 1
            ).otherwise(0)
        ).alias("n_tampered_pass"),
        F.sum("check_digit").cast("long").alias("checksum_digit_total"),
    )


# ---------------------------------------------------------------------------
# Penny allocation: split money into N parts that sum EXACTLY (largest
# remainder method)
# ---------------------------------------------------------------------------

_PENNY_ORACLE = """
WITH base AS (
  SELECT o_orderkey,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS total_cents
  FROM orders WHERE o_orderkey % 101 = 0
),
parts AS (
  SELECT o_orderkey, total_cents, i,
         total_cents // 3
         + CASE WHEN i <= total_cents % 3 THEN 1 ELSE 0 END AS installment
  FROM base, UNNEST([1, 2, 3]) AS t(i)
)
SELECT o_orderkey, total_cents,
       CAST(MAX(CASE WHEN i = 1 THEN installment END) AS BIGINT) AS inst_1,
       CAST(MAX(CASE WHEN i = 2 THEN installment END) AS BIGINT) AS inst_2,
       CAST(MAX(CASE WHEN i = 3 THEN installment END) AS BIGINT) AS inst_3,
       CAST(SUM(installment) AS BIGINT) = total_cents AS sums_exact,
       CAST(MAX(installment) - MIN(installment) AS BIGINT) AS max_skew_cents
FROM parts
GROUP BY o_orderkey, total_cents
ORDER BY o_orderkey
"""


@register(
    "f_penny_allocation",
    oracle=_PENNY_ORACLE,
    tags=("F3", "F7", "A1"),
)
def f_penny_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder penny allocation: each order total splits into
    3 installments that sum EXACTLY to the total (the first
    `total mod 3` installments carry the extra cent) — the billing
    arithmetic naive division gets wrong by a cent, which is how
    reconciliation breaks at month-end. `sums_exact` proves the
    invariant on every row; `max_skew_cents` pins the fairness bound
    (installments differ by at most 1 cent).

    Determinism & scale — pure row-local positive integer arithmetic
    (// and % identical across engines), bounded 3-way explode; no
    shuffle beyond the per-order regroup of the exploded parts (and a
    production allocator would keep it columnar: three expressions,
    zero explode)."""
    o = load_table(spark, sf_dir, "orders")
    base = o.filter(F.col("o_orderkey") % 101 == 0).select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("total_cents"),
    )
    parts = base.select(
        "o_orderkey",
        "total_cents",
        F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("i"),
    ).withColumn(
        "installment",
        F.expr("total_cents DIV 3")
        + F.when(F.col("i") <= F.col("total_cents") % 3, 1).otherwise(0),
    )
    return (
        parts.groupBy("o_orderkey", "total_cents")
        .agg(
            F.max(F.when(F.col("i") == 1, F.col("installment"))).alias("inst_1"),
            F.max(F.when(F.col("i") == 2, F.col("installment"))).alias("inst_2"),
            F.max(F.when(F.col("i") == 3, F.col("installment"))).alias("inst_3"),
            (F.sum("installment") == F.col("total_cents")).alias("sums_exact"),
            (F.max("installment") - F.min("installment")).alias("max_skew_cents"),
        )
        .orderBy("o_orderkey")
    )


# ---------------------------------------------------------------------------
# Rounding-mode audit: how often half-even vs half-away would disagree
# ---------------------------------------------------------------------------

_ROUNDING_AUDIT_ORACLE = """
WITH probe AS (
  SELECT l_extendedprice * (1 - l_discount) AS x FROM lineitem
),
modes AS (
  SELECT x,
         CAST(ROUND(x * 100) AS BIGINT) AS half_away_cents,
         CAST(FLOOR(x * 100) AS BIGINT)
           + CASE
               WHEN x * 100 - FLOOR(x * 100) > 0.5 THEN 1
               WHEN x * 100 - FLOOR(x * 100) < 0.5 THEN 0
               WHEN CAST(FLOOR(x * 100) AS BIGINT) % 2 = 0 THEN 0
               ELSE 1
             END AS half_even_cents,
         CAST(FLOOR(x * 100) AS BIGINT) AS trunc_cents
  FROM probe
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN half_away_cents <> half_even_cents
                THEN 1 ELSE 0 END) AS BIGINT) AS n_mode_disagreements,
       CAST(SUM(CASE WHEN half_away_cents <> trunc_cents
                THEN 1 ELSE 0 END) AS BIGINT) AS n_round_vs_trunc,
       CAST(SUM(half_away_cents) AS BIGINT) AS sum_half_away_cents,
       CAST(SUM(half_even_cents) AS BIGINT) AS sum_half_even_cents,
       CAST(SUM(half_away_cents) - SUM(half_even_cents) AS BIGINT)
         AS mode_bias_cents
FROM modes
"""


@register(
    "f_rounding_mode_audit",
    oracle=_ROUNDING_AUDIT_ORACLE,
    tags=("F3", "F7", "A2", "P6"),
)
def f_rounding_mode_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rounding-mode audit on the money hot path: counts rows where
    half-away-from-zero (this engine's `cents()` convention, Spark
    ROUND) and banker's half-even (numpy/pandas default) would land on
    DIFFERENT cents, plus the aggregate bias between the two modes —
    the empirical justification for the repo-wide integer-cents rule,
    and the QC probe that catches a library swap silently changing
    financial totals (the round-3 streaming bug class:
    streaming_parity.py's pandas round() divergence).

    Determinism design: the half-even arm is spelled out with
    FLOOR/parity CASE arithmetic (identical text both engines) rather
    than each engine's native banker's rounding, so the audit itself
    cannot suffer the disagreement it measures. Exactly-.5 fraction
    compares are exact in binary doubles (x*100 either IS or IS NOT a
    representable half), so the three-way CASE is bit-stable. One
    combinable scan pass, zero joins."""
    li = load_table(spark, sf_dir, "lineitem")
    modes = li.select(
        F.expr("l_extendedprice * (1 - l_discount)").alias("x")
    ).select(
        F.expr("CAST(ROUND(x * 100) AS BIGINT)").alias("half_away_cents"),
        F.expr(
            "CAST(FLOOR(x * 100) AS BIGINT) + CASE "
            "WHEN x * 100 - FLOOR(x * 100) > 0.5 THEN 1 "
            "WHEN x * 100 - FLOOR(x * 100) < 0.5 THEN 0 "
            "WHEN CAST(FLOOR(x * 100) AS BIGINT) % 2 = 0 THEN 0 "
            "ELSE 1 END"
        ).alias("half_even_cents"),
        F.expr("CAST(FLOOR(x * 100) AS BIGINT)").alias("trunc_cents"),
    )
    return modes.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(
            F.when(
                F.col("half_away_cents") != F.col("half_even_cents"), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_mode_disagreements"),
        F.sum(
            F.when(
                F.col("half_away_cents") != F.col("trunc_cents"), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_round_vs_trunc"),
        F.sum("half_away_cents").cast("long").alias("sum_half_away_cents"),
        F.sum("half_even_cents").cast("long").alias("sum_half_even_cents"),
        (F.sum("half_away_cents") - F.sum("half_even_cents"))
        .cast("long")
        .alias("mode_bias_cents"),
    )


# ---------------------------------------------------------------------------
# F5: map aggregation pipeline — build, inspect, and unfold map columns
# ---------------------------------------------------------------------------

_MAP_AGG_ORACLE = """
WITH cnt AS (
  SELECT n.n_name AS nation, o.o_orderpriority AS prio,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM orders o
  JOIN customer cu ON o.o_custkey = cu.c_custkey
  JOIN nation n ON cu.c_nationkey = n.n_nationkey
  GROUP BY 1, 2
)
SELECT nation,
       CAST(COUNT(*) AS BIGINT) AS n_priorities,
       STRING_AGG(prio, ',' ORDER BY prio) AS priorities_sorted,
       CAST(SUM(c) AS BIGINT) AS total_orders,
       CAST(MAX(CASE WHEN prio = '1-URGENT' THEN c ELSE 0 END) AS BIGINT)
         AS urgent_orders,
       CAST(MAX(CASE WHEN c = (SELECT MAX(c2.c) FROM cnt c2
                               WHERE c2.nation = cnt.nation)
                THEN prio END) AS VARCHAR) AS top_priority
FROM cnt
GROUP BY nation
ORDER BY nation
"""


@register(
    "f_map_aggregation_pipeline",
    oracle=_MAP_AGG_ORACLE,
    tags=("F5", "F4", "A9", "A1", "J1"),
)
def f_map_aggregation_pipeline(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The full map-column lifecycle in one query: per-nation priority
    counts are COLLECTED into a real MapType column
    (map_from_entries over a sorted entry array), then interrogated
    with the map function family — size, map_keys, map_values,
    element_at, and an argmax over entries — before unfolding back to
    scalar columns. This is the semi-structured aggregation pattern
    (feature maps, per-key counters) users reach for between rigid
    columns and opaque JSON.

    Determinism + scale design: ONE combinable (nation, priority)
    rollup feeds a bounded collect (≤5 entries per nation — the
    priority domain is a data-model constant); the entry array is
    array_sort-ed BEFORE map construction so map iteration order —
    which Spark does not define — can never leak into output; the
    argmax uses struct ordering (c, prio) so count ties break on the
    key identically to the oracle's correlated-max spelling. Output is
    scalars only (the no-maps-in-checked-output rule)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    cnt = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(
            F.broadcast(nation),
            customer.c_nationkey == nation.n_nationkey,
        )
        .groupBy(
            F.col("n_name").alias("nation"),
            F.col("o_orderpriority").alias("prio"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    mapped = cnt.groupBy("nation").agg(
        F.map_from_entries(
            F.array_sort(
                F.collect_list(F.struct(F.col("prio"), F.col("c")))
            )
        ).alias("prio_map")
    )
    return mapped.select(
        "nation",
        F.size("prio_map").cast("long").alias("n_priorities"),
        F.array_join(F.array_sort(F.map_keys("prio_map")), ",").alias(
            "priorities_sorted"
        ),
        F.aggregate(
            F.map_values("prio_map"),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("total_orders"),
        F.coalesce(
            F.element_at("prio_map", "1-URGENT"), F.lit(0)
        )
        .cast("long")
        .alias("urgent_orders"),
        F.expr(
            "array_max(transform(map_entries(prio_map), "
            "e -> struct(e.value AS c, e.key AS prio))).prio"
        ).alias("top_priority"),
    ).orderBy("nation")


# ---------------------------------------------------------------------------
# Hexagonal grid binning (axial coordinates, cube rounding)
# ---------------------------------------------------------------------------

_HEXBIN_ORACLE = """
WITH pts AS (
  SELECT CAST((user_id * 48271) % 4000 - 2000 AS DOUBLE) AS px,
         CAST((event_id * 69621) % 4000 - 2000 AS DOUBLE) AS py
  FROM events
),
axial AS (
  SELECT
    (SQRT(CAST(3 AS DOUBLE)) / CAST(3 AS DOUBLE) * px
     - py / CAST(3 AS DOUBLE)) / CAST(250 AS DOUBLE) AS qf,
    (CAST(2 AS DOUBLE) / CAST(3 AS DOUBLE) * py)
      / CAST(250 AS DOUBLE) AS rf
  FROM pts
),
rounded AS (
  SELECT qf, rf, -qf - rf AS sf,
         FLOOR(qf + 0.5) AS q0, FLOOR(rf + 0.5) AS r0,
         FLOOR(-qf - rf + 0.5) AS s0
  FROM axial
),
fixed AS (
  SELECT
    CAST(CASE WHEN ABS(q0 - qf) > ABS(r0 - rf)
               AND ABS(q0 - qf) > ABS(s0 - sf)
              THEN -r0 - s0 ELSE q0 END AS BIGINT) AS hq,
    CAST(CASE WHEN NOT (ABS(q0 - qf) > ABS(r0 - rf)
                        AND ABS(q0 - qf) > ABS(s0 - sf))
               AND ABS(r0 - rf) > ABS(s0 - sf)
              THEN -q0 - s0 ELSE r0 END AS BIGINT) AS hr
  FROM rounded
)
SELECT hq, hr, COUNT(*) AS n_events
FROM fixed
GROUP BY hq, hr
ORDER BY n_events DESC, hq, hr
LIMIT 15
"""


@register(
    "f_hex_bin_assign",
    oracle=_HEXBIN_ORACLE,
    tags=("F3", "A1", "O2"),
)
def f_hex_bin_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hexagonal-grid spatial binning (the H3/Uber-style density rollup)
    in pure closed-form math: planar point -> fractional axial hex
    coordinates -> cube rounding (round each of q, r, s and fix the
    axis with the largest rounding error so q + r + s = 0 stays exact).

    Determinism: the only operations are +, -, *, / and SQRT — all
    correctly rounded by IEEE-754 — evaluated with an identical
    expression tree on both engines, and half-rounding is written as
    FLOOR(x + 0.5) explicitly so no engine ROUND-mode difference can
    bite. Scale: map-only per-event math followed by ONE combinable
    (hq, hr) aggregation; top-k under a total order.
    """
    e = load_table(spark, sf_dir, "events")
    px = ((F.col("user_id") * 48271) % 4000 - 2000).cast("double")
    py = ((F.col("event_id") * 69621) % 4000 - 2000).cast("double")
    three = F.lit(3.0)
    qf = (F.sqrt(three) / three * px - py / three) / F.lit(250.0)
    rf = (F.lit(2.0) / three * py) / F.lit(250.0)
    axial = e.select(qf.alias("qf"), rf.alias("rf"))
    sf = -F.col("qf") - F.col("rf")
    rounded = axial.select(
        "qf",
        "rf",
        sf.alias("sf"),
        F.floor(F.col("qf") + 0.5).alias("q0"),
        F.floor(F.col("rf") + 0.5).alias("r0"),
        F.floor(sf + 0.5).alias("s0"),
    )
    dq = F.abs(F.col("q0") - F.col("qf"))
    dr = F.abs(F.col("r0") - F.col("rf"))
    ds = F.abs(F.col("s0") - F.col("sf"))
    q_fix = (dq > dr) & (dq > ds)
    fixed = rounded.select(
        F.when(q_fix, -F.col("r0") - F.col("s0"))
        .otherwise(F.col("q0"))
        .cast("bigint")
        .alias("hq"),
        F.when(~q_fix & (dr > ds), -F.col("q0") - F.col("s0"))
        .otherwise(F.col("r0"))
        .cast("bigint")
        .alias("hr"),
    )
    return (
        fixed.groupBy("hq", "hr")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy(F.col("n_events").desc(), "hq", "hr")
        .limit(15)
    )


# --- F5, second wave: map build -> broadcast map join -> map_zip_with ------

_MAP_SHARE_ORACLE = """
WITH nat AS (
  SELECT r_name, n_name, o_orderpriority AS priority, COUNT(*) AS cnt
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  GROUP BY r_name, n_name, o_orderpriority
),
reg AS (
  SELECT r_name, priority, CAST(SUM(cnt) AS BIGINT) AS total
  FROM nat GROUP BY r_name, priority
)
SELECT nat.r_name AS r_name, nat.n_name, nat.priority AS priority,
       CAST(nat.cnt AS BIGINT)                   AS n_orders,
       CAST(nat.cnt * 10000 // reg.total AS BIGINT) AS share_bp
FROM nat JOIN reg ON nat.r_name = reg.r_name AND nat.priority = reg.priority
WHERE nat.cnt * 10000 // reg.total >= 200
ORDER BY r_name, n_name, priority
"""


@register(
    "f_map_share_zipwith",
    oracle=_MAP_SHARE_ORACLE,
    tags=("F5", "F4", "A1", "A9", "J2"),
)
def f_map_share_zipwith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5, second wave: per-nation priority histograms carried as MAP
    columns end to end — map_from_entries(collect_list(struct)) builds
    them, a broadcast join lines each nation map up with its region's
    total map, map_zip_with pairs per-key (nation count, region total),
    and explode unpacks the map for the final share filter. The map is
    the in-flight container; the checked output is exploded rows (maps
    are unordered, so raw map columns are never hash-compared).

    Scale notes: counts are pre-aggregated BEFORE any map is built, so
    the collect_list per nation holds at most |priorities| (5) entries
    — bounded fan-in, never row-scale. The region map side is 5 rows ->
    broadcast. Exact integer basis points (cnt * 10000 DIV total), no
    float division."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    cnt = (
        orders.join(F.broadcast(customer.select("c_custkey", "c_nationkey")),
                    orders.o_custkey == F.col("c_custkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_name", "n_regionkey")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region.select("r_regionkey", "r_name")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name", F.col("o_orderpriority").alias("priority"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    nat_maps = cnt.groupBy("r_name", "n_name").agg(
        F.map_from_entries(F.collect_list(F.struct("priority", "cnt"))).alias("nm")
    )
    reg_maps = (
        cnt.groupBy("r_name", "priority")
        .agg(F.sum("cnt").cast("long").alias("total"))
        .groupBy("r_name")
        .agg(
            F.map_from_entries(F.collect_list(F.struct("priority", "total"))).alias(
                "rm"
            )
        )
    )
    zipped = (
        nat_maps.join(F.broadcast(reg_maps), "r_name")
        .select(
            "r_name",
            "n_name",
            F.map_zip_with(
                "nm", "rm", lambda k, a, b: F.struct(a.alias("cnt"), b.alias("total"))
            ).alias("z"),
        )
        .select("r_name", "n_name", F.explode("z").alias("priority", "pair"))
        # Keys present only region-wide (nation never used the priority)
        # come through map_zip_with with a null nation count: drop them.
        .filter(F.col("pair.cnt").isNotNull())
    )
    return (
        zipped.select(
            "r_name",
            "n_name",
            "priority",
            F.col("pair.cnt").cast("long").alias("n_orders"),
            F.expr("CAST(pair.cnt * 10000 DIV pair.total AS BIGINT)").alias(
                "share_bp"
            ),
        )
        .filter(F.col("share_bp") >= 200)
        .orderBy("r_name", "n_name", "priority")
    )


# --- F5, third wave: str_to_map + transform_keys / transform_values ---------

_STR_TO_MAP_ORACLE = """
SELECT o_orderpriority AS priority,
       CAST(COUNT(*) AS BIGINT)                       AS n,
       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT)
                                                      AS n_final,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) / 100.0
                                                      AS revenue
FROM orders
WHERE EXTRACT(year FROM o_orderdate) = 1997
GROUP BY o_orderpriority
ORDER BY priority
"""


@register(
    "f_str_to_map_roundtrip",
    oracle=_STR_TO_MAP_ORACLE,
    tags=("F5", "F1", "A1", "A7"),
)
def f_str_to_map_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5, third wave: the key=value wire format round trip — rows are
    serialized to 'k=v,k=v' strings (the log-line / tag-string shape),
    parsed back with str_to_map, normalized with transform_keys
    (lower-casing) and transform_values (typed casts), and the parsed
    map drives the aggregation. Proves the parse→normalize→consume
    chain is lossless: the oracle computes the same rollup from the
    original columns, never seeing the string form.

    Scale: map functions here are per-row scalar expressions (no
    explode, no shuffle added); the single aggregation is combinable."""
    orders = load_table(spark, sf_dir, "orders")
    from .joins import cents

    wire = orders.select(
        F.concat_ws(
            ",",
            F.concat(F.lit("PRIORITY="), F.col("o_orderpriority")),
            F.concat(F.lit("STATUS="), F.col("o_orderstatus")),
            F.concat(
                F.lit("CENTS="), cents(F.col("o_totalprice")).cast("string")
            ),
            F.concat(F.lit("YEAR="), F.year("o_orderdate").cast("string")),
        ).alias("line")
    )
    parsed = wire.select(
        F.transform_keys(
            F.str_to_map(F.col("line"), F.lit(","), F.lit("=")),
            lambda k, _v: F.lower(k),
        ).alias("m")
    ).select(
        F.col("m").getItem("priority").alias("priority"),
        F.col("m").getItem("status").alias("status"),
        F.transform_values(
            F.map_filter(F.col("m"), lambda k, _v: k.isin("cents", "year")),
            lambda _k, v: v.cast("long"),
        ).alias("nums"),
    )
    return (
        parsed.filter(F.col("nums").getItem("year") == 1997)
        .groupBy("priority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.when(F.col("status") == "F", 1).otherwise(0))
            .cast("long")
            .alias("n_final"),
            (F.sum(F.col("nums").getItem("cents")).cast("long") / 100.0).alias(
                "revenue"
            ),
        )
        .orderBy("priority")
    )


# --- F5/F6, fourth wave: from_json into a MAP + map function pipeline --------

_JSON_MAP_ORACLE = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(k) AS BIGINT)   AS k_sum,
       CAST(SUM(CASE WHEN k >= 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
       CAST(SUM(k * k) AS BIGINT) AS k_sq_sum
FROM (
  SELECT event_type,
         CAST(REGEXP_EXTRACT(props, '[0-9]+') AS BIGINT) AS k
  FROM events
)
GROUP BY event_type
ORDER BY event_type
"""


@register(
    "f_from_json_map_profile",
    oracle=_JSON_MAP_ORACLE,
    tags=("F5", "F6", "A1", "A7"),
)
def f_from_json_map_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5/F6, fourth wave: the semi-structured props column parsed with
    from_json into a real MAP<STRING,BIGINT> (schema-on-read, not string
    hacking), then consumed through the map-function surface:
    element_at for the typed lookup, map_filter for a value-predicated
    sub-map whose size feeds the high-k census. The oracle re-derives k
    from the raw string independently (regexp), so a from_json parsing
    bug cannot hide.

    Scale: from_json/element_at are per-row scalars with no shuffle;
    map_filter is a higher-order function on 1-entry maps (bounded
    lambda work per row), and the rollup is one combinable pass."""
    events = load_table(spark, sf_dir, "events")
    m = F.from_json(F.col("props"), "map<string,bigint>")
    base = events.select(
        "event_type",
        F.element_at(m, "k").alias("k"),
        F.size(F.map_filter(m, lambda _, v: v >= 50)).alias("n_kept"),
    )
    return (
        base.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("k").cast("long").alias("k_sum"),
            F.sum("n_kept").cast("long").alias("n_high"),
            F.sum(F.col("k") * F.col("k")).cast("long").alias("k_sq_sum"),
        )
        .orderBy("event_type")
    )


# --- F6+P1, fifth wave: JSON build -> parse -> extract round-trip ------------

_JSON_ROUNDTRIP_ORACLE = """
WITH built AS (
  SELECT event_type,
         CAST(props ->> 'k' AS BIGINT)          AS k,
         CAST(FLOOR(value) AS BIGINT)           AS v_floor
  FROM events
),
proj AS (
  SELECT event_type,
         k // 25                                AS k_band,
         k % 2 = 0                              AS k_even,
         v_floor
  FROM built
)
SELECT event_type, k_band,
       CAST(COUNT(*) AS BIGINT)                    AS n,
       CAST(SUM(CASE WHEN k_even THEN 1 ELSE 0 END) AS BIGINT) AS n_even,
       CAST(SUM(v_floor) AS BIGINT)                AS v_floor_sum
FROM proj
GROUP BY event_type, k_band
"""


@register("f_props_json_projection", oracle=_JSON_ROUNDTRIP_ORACLE, tags=("F6", "P1"))
def f_props_json_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6+P1, fifth wave: the events `props` column is a REAL JSON
    string — parse it twice (get_json_object path extraction AND a
    typed from_json through a schema, asserting they agree via the
    banding), then a pure projection stage (integer band, parity flag,
    floored cents) feeding a combinable rollup. Everything is a JVM
    built-in inside one codegen stage; JSON parsing happens exactly
    once per row per extractor, map-side, before the only shuffle."""
    e = load_table(spark, sf_dir, "events")
    built = e.select(
        "event_type",
        # typed path: schema'd from_json -> struct field
        F.from_json("props", "k BIGINT").getField("k").alias("k"),
        # text path: JSONPath extraction, cast after (same value)
        F.get_json_object("props", "$.k").cast("bigint").alias("k_text"),
        F.floor("value").cast("bigint").alias("v_floor"),
    )
    proj = built.select(
        "event_type",
        # use the TYPED extraction, but only where both parses agree —
        # a disagreement would surface as a NULL band and break the
        # count against the oracle.
        F.when(F.col("k") == F.col("k_text"), F.expr("k DIV 25"))
        .cast("bigint")
        .alias("k_band"),
        (F.col("k") % 2 == 0).alias("k_even"),
        "v_floor",
    )
    return proj.groupBy("event_type", "k_band").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("k_even"), 1).otherwise(0)).cast("long").alias("n_even"),
        F.sum("v_floor").cast("long").alias("v_floor_sum"),
    )
