"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with the `noop` sink — full computation,
no driver-side collect cost in the measurement.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from iris_pyspark_spark.registry import load_all
from iris_pyspark_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    registry = load_all()
    headline = {n: q for n, q in registry.items() if q.headline}

    spark = get_spark(app_name="iris-pyspark-bench")
    # Warm codegen/JIT once per headline plan at the smallest SF:
    # generated classes depend on plan shape, not data volume, so this
    # compiles every stage for pennies and the sf-under-test runs
    # measure steady-state execution, not JIT compilation.
    warm_dir = "/root/testdata/sf0.001"
    for name, q in sorted(headline.items()):
        try:
            q.fn(spark, warm_dir).write.format("noop").mode("overwrite").save()
        except Exception:
            pass  # warmup is best-effort

    # Four measured runs per query, report the fastest: the container
    # this runs in shows 3-8x wall-clock spikes from external CPU
    # contention (same plan, same data, back-to-back runs: 36s vs 4s),
    # and min-of-N measures the engine rather than the noise. n=2 proved
    # too jittery to distinguish a real regression from scheduler luck
    # (round-3 verdict: three join headliners swung 27-40% with no code
    # change on their path); n=4 keeps the round-over-round comparison
    # meaningful at ~30s extra wall-clock.
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "4"))
    timings: dict[str, float] = {}
    for name, q in sorted(headline.items()):
        best = float("inf")
        for _ in range(n_runs):
            t0 = time.perf_counter()
            q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)

    print(
        json.dumps(
            {
                "metric": "headline_queries_wall_clock",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "n": n_runs,  # min-of-n runs per query (see contention note)
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
