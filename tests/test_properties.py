"""Property-based checks: custom operators vs pure-Python references on
random inputs (hypothesis). Complements the fixed-fixture oracle tests —
random shapes hit gap/tie/boundary layouts the synthetic tables never
produce. Example counts are small: each example is a Spark round-trip.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

BASE = dt.datetime(2024, 1, 1)

events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),        # user_id
        st.integers(min_value=0, max_value=20_000),   # seconds offset
    ),
    min_size=1,
    max_size=25,
)


def _reference_sessionize(rows, gap_seconds):
    """Pure-Python reference: 1-based session number per user over
    (ts, event_id)-ordered events."""
    out = {}
    by_user = {}
    for eid, (user, off) in enumerate(rows):
        by_user.setdefault(user, []).append((off, eid))
    for user, evs in by_user.items():
        evs.sort()
        sid = 0
        prev = None
        for off, eid in evs:
            if prev is None or off - prev > gap_seconds:
                sid += 1
            out[eid] = (user, sid)
            prev = off
    return out


def test_sessionize_matches_reference(spark):
    """24 random event layouts vs the pure-Python reference, batched
    into ONE Spark round: users are namespaced per example (user +
    ex*100), so sessionize's per-user partitioning keeps examples
    independent while the whole battery pays a single job. (Replaces a
    hypothesis loop that paid a Spark round-trip per example — 3s →
    sub-second for twice the examples.)"""
    import random

    from iris_pyspark_spark.operators.sessionize import sessionize

    gap = 1800
    rng = random.Random(20260813)
    spark_rows = []
    expected = {}
    eid = 0
    for ex in range(24):
        n = rng.randint(1, 25)
        rows = [(rng.randint(1, 3) + ex * 100, rng.randint(0, 20_000)) for _ in range(n)]
        base_eid = eid
        for user, off in rows:
            spark_rows.append((eid, user, BASE + dt.timedelta(seconds=off)))
            eid += 1
        for local_eid, (user, sid) in _reference_sessionize(rows, gap).items():
            expected[base_eid + local_eid] = (user, sid)
    df = spark.createDataFrame(
        spark_rows, "event_id long, user_id long, ts timestamp"
    ).repartition(3)
    got = {
        r.event_id: (r.user_id, r.session_id)
        for r in sessionize(
            df, key="user_id", ts="ts", gap_seconds=gap, tie_break="event_id"
        ).collect()
    }
    assert got == expected


asof_strategy = st.tuples(
    st.lists(st.integers(min_value=0, max_value=1000), min_size=1, max_size=10),  # left times
    st.lists(st.integers(min_value=0, max_value=1000), min_size=0, max_size=10),  # right times
)


def test_asof_join_matches_reference(spark):
    """24 random (left, right) time layouts vs the pure-Python
    reference, batched into ONE Spark round with the example index as
    the join key — asof_join matches within key only, so examples stay
    independent. (Replaces a hypothesis loop paying one Spark
    round-trip per example — 6s → sub-second, twice the examples.)
    Example 0 keeps an empty right side: every left row must survive
    with a NULL match."""
    import random

    from iris_pyspark_spark.operators.asof import asof_join

    rng = random.Random(20260813)
    left_rows, right_rows = [], []
    expected = {}
    lid = 0
    for ex in range(24):
        left_times = [rng.randint(0, 1000) for _ in range(rng.randint(1, 10))]
        right_times = (
            [] if ex == 0
            else [rng.randint(0, 1000) for _ in range(rng.randint(0, 10))]
        )
        uniq_right = sorted(set(right_times))
        for s in left_times:
            left_rows.append((ex, lid, BASE + dt.timedelta(seconds=s)))
            at_or_before = [rs for rs in uniq_right if rs <= s]
            expected[lid] = float(max(at_or_before)) if at_or_before else None
            lid += 1
        right_rows.extend(
            (ex, BASE + dt.timedelta(seconds=s)) for s in uniq_right
        )
    left = spark.createDataFrame(left_rows, "k long, lid long, lts timestamp")
    right = spark.createDataFrame(right_rows, "k long, rts timestamp")
    got = {
        r.lid: (r.rts - BASE).total_seconds() if r.rts is not None else None
        for r in asof_join(left, right, on="k", left_time="lts", right_time="rts").collect()
    }
    assert got == expected


edges_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=12),
        st.integers(min_value=0, max_value=12),
    ),
    min_size=1,
    max_size=20,
)


def _reference_components(edges):
    """Union-find reference: min vertex id per component."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in parent}


def test_connected_components_matches_union_find(spark, tmp_path_factory):
    """24 random graphs vs a union-find reference, batched into ONE
    iterative CC run: each graph lives in its own disjoint vertex-id
    range (ex·1000), so components never cross examples and the whole
    battery converges in the iterations of the deepest single graph.
    (Replaces a hypothesis loop paying a full iterate-materialize cycle
    per example — 14s → ~2s for three times the examples, and the
    batched instance is a better shape test: one run over many islands
    is exactly the 100 TB layout.)"""
    import random

    from iris_pyspark_spark.operators.graph import connected_components

    rng = random.Random(20260813)
    all_edges = []
    for ex in range(16):
        base = ex * 1000
        all_edges.extend(
            (base + rng.randint(0, 8), base + rng.randint(0, 8))
            for _ in range(rng.randint(1, 14))
        )
    # One explicit worst-case island: a 9-vertex path (depth the random
    # graphs rarely produce) — the shape pointer jumping exists for.
    all_edges.extend((16000 + i, 16000 + i + 1) for i in range(8))
    df = spark.createDataFrame(all_edges, "src long, dst long")
    scratch = str(tmp_path_factory.mktemp("cc"))
    got = {
        r.id: r.component
        for r in connected_components(df, "src", "dst", scratch).collect()
    }
    assert got == _reference_components(all_edges)


chunk_strategy = st.lists(
    st.text(alphabet="ab ", min_size=0, max_size=120), min_size=1, max_size=6
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(chunk_strategy)
def test_chunking_covers_every_token(spark, texts):
    """Every token position of every doc appears in at least one chunk,
    chunk 0 always exists, and consecutive chunks overlap by
    chunk - stride positions (except the clamped tail)."""
    from pyspark.sql import functions as F

    chunk, stride = 8, 6
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    toks = F.split(F.lower(F.col("text")), " ")
    n = F.size(toks)
    k_max = F.floor(
        (F.greatest(n - chunk, F.lit(0)) + stride - 1) / F.lit(stride).cast("double")
    ).cast("int")
    spans = df.select(
        "doc_id", n.alias("n_tok"),
        F.explode(F.sequence(F.lit(0), k_max)).alias("chunk_id"),
    ).withColumn(
        "start", F.col("chunk_id") * stride
    )
    rows = spans.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append((r.chunk_id, r.start, r.n_tok))
    for doc_id, chunks in by_doc.items():
        chunks.sort()
        n_tok = chunks[0][2]
        covered = set()
        for _, start, _ in chunks:
            covered |= set(range(start, min(start + chunk, n_tok)))
        assert covered == set(range(n_tok)), (doc_id, n_tok, chunks)


def test_global_ids_match_enumerate(spark):
    """global_ids == 1-based position under sorted(bucket, key), for
    arbitrary bucket skew including empty/singleton/hot buckets.

    One Spark round over a seeded battery of skew layouts (hot bucket,
    singletons, gaps, uniform) — global ids are a TOTAL order, so the
    layouts ride in disjoint bucket ranges of one frame and the
    reference is a single enumerate(sorted(...)). (Replaces a
    hypothesis loop paying a Spark round-trip per example.)"""
    import random

    from iris_pyspark_spark.operators.ids import global_ids

    rng = random.Random(20260813)
    rows: set[tuple[int, int]] = set()
    for ex in range(12):
        base = ex * 100
        layout = ex % 4
        if layout == 0:    # hot bucket: most rows on one bucket
            rows.update((base, rng.randint(0, 1000)) for _ in range(25))
            rows.add((base + 5, rng.randint(0, 1000)))
        elif layout == 1:  # singletons across sparse buckets
            rows.update((base + b * 7, rng.randint(0, 1000)) for b in range(6))
        elif layout == 2:  # uniform spread
            rows.update(
                (base + rng.randint(0, 5), rng.randint(0, 1000)) for _ in range(30)
            )
        else:              # single row
            rows.add((base, rng.randint(0, 1000)))
    row_list = sorted(rows)
    df = spark.createDataFrame(row_list, "bucket int, k int").repartition(5)
    got = {
        (r["bucket"], r["k"]): r["global_id"]
        for r in global_ids(df, "bucket", ["k"]).collect()
    }
    expected = {row: i + 1 for i, row in enumerate(row_list)}
    assert got == expected


def test_banded_pairs_match_naive_quadratic(spark):
    """banded_abs_diff_pairs vs the naive O(n^2) reference on seeded
    random values — negatives, zeros, and exact band-boundary diffs
    included (the trunc-toward-zero bucket edge cases the correctness
    argument in operators/banding.py covers). Batched into ONE Spark
    round: groups namespace the examples."""
    import itertools
    import random

    from pyspark.sql import Row

    from iris_pyspark_spark.operators.banding import banded_abs_diff_pairs

    rng = random.Random(20260814)
    BAND = 100
    rows, expected = [], set()
    rid = 0
    for ex in range(24):
        # Mix of uniform spread, tight clusters, and exact-boundary values.
        vals = (
            [rng.randint(-500, 500) for _ in range(rng.randint(2, 12))]
            + [0, BAND, -BAND, BAND - 1, -(BAND - 1)][: rng.randint(0, 5)]
        )
        ids = []
        for v in vals:
            rows.append(Row(rid=rid, grp=ex, val=v))
            ids.append((rid, v))
            rid += 1
        for (ia, va), (ib, vb) in itertools.combinations(ids, 2):
            if abs(va - vb) <= BAND:
                a, b = min(ia, ib), max(ia, ib)
                expected.add((ex, a, b, abs(va - vb)))
    df = spark.createDataFrame(rows, "rid long, grp int, val long")
    got = {
        (r.grp, r.id_a, r.id_b, r.diff)
        for r in banded_abs_diff_pairs(
            df, id_col="rid", group_col="grp", val_col="val", band=BAND
        ).collect()
    }
    assert got == expected, (
        f"missing={sorted(expected - got)[:5]} extra={sorted(got - expected)[:5]}"
    )


def test_simhash_table_form_matches_expression_form(spark, sf_dir):
    """simhash64_table (codegen explode + combinable 64-sum agg) must be
    value-identical to the interpreted simhash64() fold on real docs —
    same per-token xxhash64, same strictly-positive majority rule,
    duplicate tokens counted."""
    from pyspark.sql import functions as F

    from iris_pyspark_spark.catalog import load_table
    from iris_pyspark_spark.operators.dedup import simhash64, simhash64_table

    d = load_table(spark, sf_dir, "documents").limit(300)
    old = d.select("doc_id", simhash64("split(lower(text), ' ')").alias("simhash"))
    new = simhash64_table(d, "doc_id", "text").withColumnRenamed("simhash", "s2")
    joined = old.join(new, "doc_id")
    assert joined.count() == 300
    assert joined.filter(F.col("simhash") != F.col("s2")).count() == 0


def test_simhash_table_form_keeps_null_text_rows(spark):
    """NULL-text rows must survive the table form (cardinality parity
    with the fold form) and carry the SAME signature the fold yields for
    NULL text — 0, because IF(NULL > 0, bit, 0) takes the else branch on
    all 64 bits; empty-string text gets a real signature in both forms
    (split('', ' ') is ['']), and a consumer of the (id, simhash) table
    sees every input id."""
    from iris_pyspark_spark.operators.dedup import simhash64, simhash64_table

    d = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, None), (3, ""), (4, "alpha")],
        "doc_id INT, text STRING",
    )
    old = d.select("doc_id", simhash64("split(lower(text), ' ')").alias("simhash"))
    new = simhash64_table(d, "doc_id", "text").withColumnRenamed("simhash", "s2")
    joined = old.join(new, "doc_id", "full_outer")
    rows = {r["doc_id"]: (r["simhash"], r["s2"]) for r in joined.collect()}
    assert set(rows) == {1, 2, 3, 4}
    for i in (1, 2, 3, 4):
        assert rows[i][0] is not None and rows[i][0] == rows[i][1], (i, rows[i])
    assert rows[2][1] == 0  # NULL text packs to 0 in BOTH forms
