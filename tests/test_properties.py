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
