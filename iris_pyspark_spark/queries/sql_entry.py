"""E2 entry point (SURVEY.md §3.2): queries expressed as SQL STRINGS over
the registered temp views — Spark's ANTLR parser → the same Catalyst
plan the DataFrame API builds. Views are named identically to the
DuckDB oracle's, so engine SQL and oracle SQL read near-identically
(they differ only where dialect forces it, e.g. integer-cents casts).

Also covers the rewrites only the SQL surface exercises: correlated
scalar subqueries and EXISTS/NOT EXISTS (decorrelated by Catalyst into
aggregated joins — verify with .explain(): no per-row subplan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_tables
from ..registry import register

#: TPC-H Q3 shape. Revenue in integer cents: the join reorders rows, so
#: a raw double SUM would differ between engines by summation order.
_Q3 = """
SELECT
  o_orderkey,
  SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
    / CAST(100 AS DOUBLE) AS revenue,
  o_orderdate,
  o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


@register("sql_q3_shipping_priority", oracle=_Q3, tags=("E2", "J6", "O2"))
def sql_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    return spark.sql(_Q3)


#: Correlated scalar subquery: customers above their segment's average
#: balance. The comparison runs in integer cents so the averaged double
#: is bit-identical on both engines (sum of longs / count).
_CORR = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE CAST(ROUND(c_acctbal * 100) AS BIGINT) > (
  SELECT AVG(CAST(ROUND(c2.c_acctbal * 100) AS BIGINT))
  FROM customer c2
  WHERE c2.c_mktsegment = c.c_mktsegment
)
"""


@register("sql_correlated_scalar_subquery", oracle=_CORR, tags=("E2",))
def sql_correlated_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    return spark.sql(_CORR)


#: EXISTS + NOT EXISTS in one query: nations that have customers but no
#: suppliers. Catalyst decorrelates into semi/anti joins (J4/J5 via SQL).
_EXISTS = """
SELECT n_nationkey, n_name
FROM nation n
WHERE EXISTS (SELECT 1 FROM customer c WHERE c.c_nationkey = n.n_nationkey)
  AND NOT EXISTS (SELECT 1 FROM supplier s WHERE s.s_nationkey = n.n_nationkey)
"""


@register("sql_exists_not_exists", oracle=_EXISTS, tags=("E2", "J4", "J5"))
def sql_exists_not_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    return spark.sql(_EXISTS)


#: IN-subquery with aggregation inside: orders whose priciest lineitem
#: part is a large-size part.
_IN_SUB = """
SELECT o_orderkey, o_totalprice
FROM orders
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size >= 48)
)
"""


@register("sql_in_subquery", oracle=_IN_SUB, tags=("E2", "J4"))
def sql_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    return spark.sql(_IN_SUB)


#: TPC-H Q2 shape: min-cost supplier per part via a correlated subquery
#: over a multi-join — the classic nested-subquery planning test.
#: (Supplier "cost" is s_acctbal here: the schema has no partsupp table,
#: so suppliers pair with parts through lineitem.)
_Q2 = """
SELECT p.p_partkey, p.p_name, s.s_name, s.s_acctbal
FROM part p
JOIN lineitem l ON l.l_partkey = p.p_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
WHERE p.p_size >= 45
  AND s.s_acctbal = (
    SELECT MIN(s2.s_acctbal)
    FROM lineitem l2
    JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
    WHERE l2.l_partkey = p.p_partkey
  )
GROUP BY p.p_partkey, p.p_name, s.s_name, s.s_acctbal
"""


@register("sql_q2_min_cost_supplier", oracle=_Q2, tags=("E2", "J6"))
def sql_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    return spark.sql(_Q2)


#: TPC-H Q19 shape: disjunction of conjunctive branches over a join —
#: exercises BooleanSimplification, predicate pushdown through the OR,
#: and join-condition extraction. Revenue in integer cents (join
#: reorders rows).
_Q19 = """
SELECT
  SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
    / CAST(100 AS DOUBLE) AS revenue,
  COUNT(*) AS n_items
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE
  (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
     AND l_quantity >= 1 AND l_quantity <= 11)
  OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
     AND l_quantity >= 10 AND l_quantity <= 20)
  OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
     AND l_quantity >= 20 AND l_quantity <= 30)
"""


@register("sql_q19_disjunctive_filter", oracle=_Q19, tags=("E2", "P3", "J1"))
def sql_q19_disjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    return spark.sql(_Q19)


#: TPC-H Q14 shape: conditional-aggregate ratio (promo revenue share).
#: Both the numerator and denominator are integer-cents sums, so the
#: final single division is bit-identical across engines.
_Q14 = """
SELECT
  CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
           THEN CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
           ELSE 0 END) AS DOUBLE)
  / CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS DOUBLE)
    AS promo_revenue_share,
  COUNT(*) AS n_items
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1995-10-01 00:00:00'
"""


@register("sql_q14_promo_share", oracle=_Q14, tags=("E2", "A7"))
def sql_q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    return spark.sql(_Q14)


#: TPC-H Q4 shape: order-priority counts for orders with at least one
#: late lineitem in a date window — EXISTS + date-range pushdown.
_Q4 = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1994-07-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1994-10-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
  )
GROUP BY o_orderpriority
"""


@register("sql_q4_priority_exists", oracle=_Q4, tags=("E2", "J4"))
def sql_q4_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    return spark.sql(_Q4)


#: TPC-H Q10 shape: revenue lost to returned items, per customer+nation.
_Q10 = """
SELECT c_custkey, c_name, n_name,
       SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
         / CAST(100 AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1994-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1994-07-01 00:00:00'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@register("sql_q10_returned_items", oracle=_Q10, tags=("E2", "J6", "O2"))
def sql_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    return spark.sql(_Q10)


#: TPC-H Q12 shape: late-shipment counts bucketed by priority class.
_Q12 = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate > o_orderdate
  AND l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1995-01-01 00:00:00'
GROUP BY l_linestatus
"""


@register("sql_q12_priority_buckets", oracle=_Q12, tags=("E2", "A7"))
def sql_q12_priority_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    return spark.sql(_Q12)


#: LATERAL correlated subquery: top-2 most expensive orders per customer
#: for a bounded customer slice. Catalyst plans the correlated LATERAL
#: as a decorrelated join + per-key window, not a per-row re-execution.
_LATERAL_SPARK = """
SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
FROM customer c,
LATERAL (
  SELECT o_orderkey, o_totalprice
  FROM orders
  WHERE o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey
  LIMIT 2
) t
WHERE c.c_custkey <= 100
"""

#: DuckDB's LATERAL has the same semantics; the query is dialect-shared.
_LATERAL_ORACLE = _LATERAL_SPARK


@register("sql_lateral_topk", oracle=_LATERAL_ORACLE, tags=("E2", "J6", "W4"))
def sql_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    return spark.sql(_LATERAL_SPARK)


#: stack()/inline(): SQL-side row generators — the UNPIVOT primitive as
#: a TVF. stack(3, ...) turns one region row into three (metric, value)
#: rows; the oracle reproduces it with UNION ALL (DuckDB has no stack).
_STACK_SPARK = """
SELECT r_regionkey, metric, val
FROM region,
LATERAL stack(3,
  'key_x2',   r_regionkey * 2,
  'key_sq',   r_regionkey * r_regionkey,
  'key_neg',  -r_regionkey
) AS t(metric, val)
"""

_STACK_ORACLE = """
SELECT r_regionkey, 'key_x2' AS metric, r_regionkey * 2 AS val FROM region
UNION ALL
SELECT r_regionkey, 'key_sq', r_regionkey * r_regionkey FROM region
UNION ALL
SELECT r_regionkey, 'key_neg', -r_regionkey FROM region
"""


@register("sql_stack_tvf", oracle=_STACK_ORACLE, tags=("E2", "F4", "P1"))
def sql_stack_tvf(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    return spark.sql(_STACK_SPARK)


#: SQL pipe syntax (Spark 4.0+): the same Q1-ish aggregation written as
#: a left-to-right operator chain. Parses to the identical Catalyst plan
#: as the nested form — the oracle is that nested form in DuckDB SQL.
_PIPE_SPARK = """
FROM lineitem
|> WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
|> AGGREGATE
     COUNT(*) AS n_items,
     SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS price_cents
   GROUP BY l_returnflag, l_linestatus
|> ORDER BY l_returnflag, l_linestatus
"""

_PIPE_ORACLE = """
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS price_cents
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@register("sql_pipe_syntax", oracle=_PIPE_ORACLE, tags=("E2", "A1"))
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    return spark.sql(_PIPE_SPARK)


#: Parameterized SQL: named :param markers bound server-side — the
#: injection-safe API surface. The oracle inlines the same literals.
_PARAM_SPARK = """
SELECT o_orderpriority,
       COUNT(*) AS n_orders
FROM orders
WHERE o_orderdate >= :lo AND o_orderdate < :hi AND o_totalprice > :min_price
GROUP BY o_orderpriority
"""

_PARAM_ORACLE = """
SELECT o_orderpriority,
       COUNT(*) AS n_orders
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND o_totalprice > 50000.0
GROUP BY o_orderpriority
"""


@register("sql_parameterized", oracle=_PARAM_ORACLE, tags=("E2", "P4"))
def sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    import datetime as dt

    load_tables(spark, sf_dir)
    return spark.sql(
        _PARAM_SPARK,
        args={
            "lo": dt.datetime(1996, 1, 1),
            "hi": dt.datetime(1997, 1, 1),
            "min_price": 50000.0,
        },
    )


#: TPC-H Q5 shape (local supplier volume): six-table join where the
#: customer and the supplier must share a nation — the classic test of
#: join ORDER (dims first, fact-fact on keys) and of revenue arithmetic
#: surviving a many-way reorder (integer cents again). Adapted dates to
#: this dataset's 1995-2001 span.
_Q5 = """
SELECT
  n_name,
  SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
    / CAST(100 AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


@register("sql_q5_local_supplier_volume", oracle=_Q5, tags=("E2", "J6", "J1"))
def sql_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    return spark.sql(_Q5)


#: TPC-H Q8 shape (national market share): the two-role nation join
#: (supplier's nation vs customer's nation) plus a conditional share
#: aggregate per year — numerator and denominator in one pass. Integer
#: cents for both; the share division happens once per year row.
_Q8 = """
SELECT
  o_year,
  SUM(CASE WHEN nation = 'NATION_2' THEN volume_cents ELSE 0 END)
    / CAST(GREATEST(SUM(volume_cents), 1) AS DOUBLE) AS mkt_share
FROM (
  SELECT
    EXTRACT(YEAR FROM o_orderdate) AS o_year,
    CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS volume_cents,
    n2.n_name AS nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  JOIN region   ON n1.n_regionkey = r_regionkey
  WHERE r_name = 'ASIA'
    AND p_type = 'ECONOMY'
) all_nations
GROUP BY o_year
ORDER BY o_year
"""


@register("sql_q8_market_share", oracle=_Q8, tags=("E2", "J6", "A7"))
def sql_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    return spark.sql(_Q8)


#: Lateral column aliases (Spark 3.4+): a SELECT item referencing an
#: alias defined earlier in the SAME select list — the spreadsheet-style
#: derivation chain users write constantly; before 3.4 it forced nested
#: subqueries. DuckDB supports the identical syntax, so one SQL text
#: runs on both engines. Elementwise IEEE ops in the same order on the
#: same doubles → bit-equal without integer-cents scaffolding; the final
#: cents cast just pins the money column's type.
_LCA = """
SELECT l_orderkey,
       l_linenumber,
       l_extendedprice * (1 - l_discount)           AS net,
       net * (1 + l_tax)                            AS gross,
       CAST(ROUND(gross * 100) AS BIGINT)           AS gross_cents
FROM lineitem
WHERE l_quantity >= 45
"""


@register("sql_lateral_column_alias", oracle=_LCA, tags=("E2", "P1"))
def sql_lateral_column_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    return spark.sql(_LCA)


#: TPC-H Q20 shape: a semi-join THROUGH a correlated aggregate — which
#: suppliers ever shipped a Brand#3 part in a quantity above half that
#: part's average. The schema has no partsupp, so lineitem stands in as
#: the supply record (same join/decorrelation structure: per-part
#: aggregate -> threshold filter -> DISTINCT supplier keys -> IN
#: semi-join -> dim enrichment). AVG(l_quantity) is exact (integral
#: doubles), so the threshold compare is bit-identical on both engines;
#: the identical SQL text runs on both. Catalyst decorrelates the IN to
#: a left-semi hash join; the per-part aggregate side is tiny (parts of
#: one brand) at any scale.
_Q20 = """
WITH brand_parts AS (
  SELECT p_partkey FROM part WHERE p_brand = 'Brand#3'
),
limits AS (
  SELECT l_partkey, 0.5 * AVG(l_quantity) AS qty_floor
  FROM lineitem JOIN brand_parts ON p_partkey = l_partkey
  GROUP BY l_partkey
),
qualifying AS (
  SELECT DISTINCT l_suppkey
  FROM lineitem JOIN limits ON lineitem.l_partkey = limits.l_partkey
  WHERE l_quantity > qty_floor
)
SELECT s_suppkey, s_name, n_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (SELECT l_suppkey FROM qualifying)
ORDER BY s_name, s_suppkey
"""


@register("sql_q20_excess_suppliers", oracle=_Q20, tags=("E2", "J4", "A1"))
def sql_q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    return spark.sql(_Q20)
