"""Exact-integer PageRank: pin the Spark fixed point bit-for-bit
against an independent numpy implementation, and pin partition
invariance (the operator's whole reason for integer arithmetic)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from iris_pyspark_spark.operators.graph import pagerank_integer


def _numpy_pagerank(edges: list[tuple[int, int]], iters: int = 6, damping_pct: int = 85):
    """Independent reference: same integer semantics, dense numpy."""
    verts = sorted({v for e in edges for v in e})
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    out_deg = np.zeros(n, dtype=np.int64)
    for s, _ in set(edges):
        out_deg[idx[s]] += 1
    rank = np.full(n, 1_000_000, dtype=np.int64)
    teleport = (100 - damping_pct) * 10_000
    dedup = sorted(set(edges))
    for _ in range(iters):
        incoming = np.zeros(n, dtype=np.int64)
        for s, d in dedup:
            incoming[idx[d]] += rank[idx[s]] // out_deg[idx[s]]
        rank = teleport + (incoming * damping_pct) // 100
    return {v: int(rank[idx[v]]) for v in verts}


@pytest.fixture(scope="module")
def toy_edges():
    # Directed, includes a dangling vertex (4 has no out-edges), a
    # 2-cycle, and a hub.
    return [
        (1, 2), (2, 1),          # cycle
        (1, 3), (2, 3), (5, 3),  # hub 3
        (3, 4),                  # dangling sink 4
        (5, 1), (5, 2),
    ]


def test_pagerank_matches_numpy_bit_for_bit(spark, tmp_path, toy_edges):
    df = spark.createDataFrame(toy_edges, ["src", "dst"])
    got = {
        r.id: r.rank_micro
        for r in pagerank_integer(df, "src", "dst", str(tmp_path / "pr")).collect()
    }
    assert got == _numpy_pagerank(toy_edges)


def test_pagerank_partition_invariant(spark, tmp_path, toy_edges):
    base = spark.createDataFrame(toy_edges, ["src", "dst"])
    results = []
    for i, layout in enumerate(
        [base.coalesce(1), base.repartition(7), base.repartition(3, "dst")]
    ):
        rows = pagerank_integer(
            layout, "src", "dst", str(tmp_path / f"pr{i}")
        ).collect()
        results.append(sorted((r.id, r.rank_micro) for r in rows))
    assert results[0] == results[1] == results[2]


def test_pagerank_mass_never_created(spark, tmp_path, toy_edges):
    df = spark.createDataFrame(toy_edges, ["src", "dst"])
    ranks = pagerank_integer(df, "src", "dst", str(tmp_path / "prm"))
    total, n = ranks.agg(
        F.sum("rank_micro"), F.count(F.lit(1))
    ).first()
    assert total <= n * 1_000_000
    assert ranks.filter(F.col("rank_micro") < 150_000).count() == 0
