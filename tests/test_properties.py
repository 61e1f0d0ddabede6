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


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(events_strategy)
def test_sessionize_matches_reference(spark, rows):
    from pyspark.sql import functions as F

    from iris_pyspark_spark.operators.sessionize import sessionize

    gap = 1800
    df = spark.createDataFrame(
        [(eid, user, BASE + dt.timedelta(seconds=off)) for eid, (user, off) in enumerate(rows)],
        "event_id long, user_id long, ts timestamp",
    ).repartition(3)
    got = {
        r.event_id: (r.user_id, r.session_id)
        for r in sessionize(
            df, key="user_id", ts="ts", gap_seconds=gap, tie_break="event_id"
        ).collect()
    }
    assert got == _reference_sessionize(rows, gap)


asof_strategy = st.tuples(
    st.lists(st.integers(min_value=0, max_value=1000), min_size=1, max_size=10),  # left times
    st.lists(st.integers(min_value=0, max_value=1000), min_size=0, max_size=10),  # right times
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(asof_strategy)
def test_asof_join_matches_reference(spark, data):
    from iris_pyspark_spark.operators.asof import asof_join

    left_times, right_times = data
    left = spark.createDataFrame(
        [(1, i, BASE + dt.timedelta(seconds=s)) for i, s in enumerate(left_times)],
        "k long, lid long, lts timestamp",
    )
    right = spark.createDataFrame(
        [(1, BASE + dt.timedelta(seconds=s)) for s in sorted(set(right_times))],
        "k long, rts timestamp",
    )
    got = {
        r.lid: (r.rts - BASE).total_seconds() if r.rts is not None else None
        for r in asof_join(left, right, on="k", left_time="lts", right_time="rts").collect()
    }
    uniq_right = sorted(set(right_times))
    expected = {}
    for i, s in enumerate(left_times):
        at_or_before = [rs for rs in uniq_right if rs <= s]
        expected[i] = float(max(at_or_before)) if at_or_before else None
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


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(edges_strategy)
def test_connected_components_matches_union_find(spark, tmp_path_factory, edges):
    from iris_pyspark_spark.operators.graph import connected_components

    df = spark.createDataFrame(edges, "src long, dst long")
    scratch = str(tmp_path_factory.mktemp("cc"))
    got = {
        r.id: r.component
        for r in connected_components(df, "src", "dst", scratch).collect()
    }
    assert got == _reference_components(edges)


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


ids_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),      # bucket
        st.integers(min_value=0, max_value=1000),   # order key
    ),
    min_size=1,
    max_size=30,
    unique=True,  # (bucket, key) unique → total order well-defined
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(ids_strategy)
def test_global_ids_match_enumerate(spark, rows):
    """global_ids == 1-based position under sorted(bucket, key), for
    arbitrary bucket skew including empty/singleton/hot buckets."""
    from iris_pyspark_spark.operators.ids import global_ids

    df = spark.createDataFrame(rows, "bucket int, k int")
    got = {
        (r["bucket"], r["k"]): r["global_id"]
        for r in global_ids(df, "bucket", ["k"]).collect()
    }
    expected = {row: i + 1 for i, row in enumerate(sorted(rows))}
    assert got == expected
