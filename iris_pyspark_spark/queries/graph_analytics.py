"""Graph analytics over relational data (SURVEY.md §2.11 adjacency):
iterative ranking on a co-occurrence graph derived from the fact
tables. Complements the dedup-clustering use of
operators.graph.connected_components with the other canonical
iterative-relational workload, PageRank.

Scale design: the supplier co-order graph has bounded degree per order
(lineitems per order is small and fixed by the data model), so edge
construction is linear in lineitem — an orderkey self-join, never
all-pairs across suppliers. Each PageRank round is one shuffle-join +
one map-side-combinable SUM; rounds materialize to parquet to break
lineage (the iterative-DataFrame discipline documented on
connected_components).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register("g_pagerank_parts", oracle=None, tags=("J10", "A1", "J1"))
def g_pagerank_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 parts by PageRank on the co-order graph (parts are
    linked when they appear as lines of the same order — the basket
    graph; suppliers would saturate to a complete graph, parts stay
    sparse with a real degree distribution), 6 fixed iterations of
    operators.graph.pagerank_integer.

    Rows-only by design — PageRank has no ANSI-SQL equivalent DuckDB
    can run (aggregation over a recursive reference is outside
    recursive-CTE SQL). In exchange the operator is EXACT-integer
    deterministic, so tests/test_graph.py pins the full fixed point
    against an independent numpy implementation bit-for-bit, and every
    output row carries provable invariants:

      * teleport_ok — rank >= the teleport floor (0.15 * 1e6);
      * mass_ok    — total mass <= n_vertices * 1e6 (long floors only
                     ever DROP mass, never create it);
      * degree_ok  — the vertex exists in the edge list (out_deg >= 1).
    """
    from ..sources import scratch_dir

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    pairs = li.dropDuplicates(["l_orderkey", "l_partkey"])
    a, b = pairs.alias("a"), pairs.alias("b")
    edges = (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_partkey") != F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
        )
    )

    from ..operators.graph import pagerank_integer

    ranks = pagerank_integer(
        edges, "src", "dst", scratch_dir(sf_dir, "pagerank"), iters=6
    )
    totals = ranks.agg(
        F.sum("rank_micro").alias("total_mass_micro"),
        F.count(F.lit(1)).alias("n_vertices"),
    )
    # The operator materialized the degree-annotated edge table; read
    # it back for the report column instead of re-running the orderkey
    # self-join a second time.
    out_deg = (
        spark.read.parquet(f"{scratch_dir(sf_dir, 'pagerank')}/pr_edges")
        .select(F.col("src").alias("id"), "out_deg")
        .dropDuplicates(["id"])
    )
    return (
        ranks.join(out_deg, "id", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            F.col("id").alias("p_partkey"),
            "rank_micro",
            "out_deg",
            "n_vertices",
            "total_mass_micro",
            (F.col("rank_micro") >= 150_000).alias("teleport_ok"),
            (F.col("total_mass_micro") <= F.col("n_vertices") * 1_000_000).alias(
                "mass_ok"
            ),
            (F.coalesce("out_deg", F.lit(0)) >= 1).alias("degree_ok"),
        )
        .orderBy(F.col("rank_micro").desc(), F.col("p_partkey"))
        .limit(20)
    )
