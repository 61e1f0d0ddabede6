"""Exact-integer PageRank: pin the Spark fixed point bit-for-bit
against an independent numpy implementation, and pin partition
invariance (the operator's whole reason for integer arithmetic).

The Spark fixed point is computed ONCE per layout in a module-scoped
fixture — each pagerank_integer call is 6 rounds of join + parquet
lineage-break (dozens of tiny jobs), so the three tests sharing runs
instead of re-running cuts ~15s of pure scheduling overhead from the
suite without weakening any assertion.
"""

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


TOY_EDGES = [
    (1, 2), (2, 1),          # cycle
    (1, 3), (2, 3), (5, 3),  # hub 3
    (3, 4),                  # dangling sink 4
    (5, 1), (5, 2),
]


@pytest.fixture(scope="module")
def pr_results(spark, tmp_path_factory):
    """Fixed point under three partition layouts, computed once."""
    root = tmp_path_factory.mktemp("pr")
    base = spark.createDataFrame(TOY_EDGES, ["src", "dst"])
    out = []
    for i, layout in enumerate(
        [base.coalesce(1), base.repartition(7), base.repartition(3, "dst")]
    ):
        df = pagerank_integer(layout, "src", "dst", str(root / f"pr{i}"))
        out.append(df)
    return out


def test_pagerank_matches_numpy_bit_for_bit(pr_results):
    got = {r.id: r.rank_micro for r in pr_results[0].collect()}
    assert got == _numpy_pagerank(TOY_EDGES)


def test_pagerank_partition_invariant(pr_results):
    canon = [
        sorted((r.id, r.rank_micro) for r in df.collect()) for df in pr_results
    ]
    assert canon[0] == canon[1] == canon[2]


def test_pagerank_mass_never_created(pr_results):
    ranks = pr_results[0]
    total, n = ranks.agg(F.sum("rank_micro"), F.count(F.lit(1))).first()
    assert total <= n * 1_000_000
    assert ranks.filter(F.col("rank_micro") < 150_000).count() == 0
