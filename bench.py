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

    # Two measured runs per query, report the faster: the container this
    # runs in shows 3-8x wall-clock spikes from external CPU contention
    # (same plan, same data, back-to-back runs: 36s vs 4s), and min-of-N
    # is the standard way to measure the engine rather than the noise.
    timings: dict[str, float] = {}
    for name, q in sorted(headline.items()):
        best = float("inf")
        for _ in range(2):
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
                "n": 2,  # min-of-2 runs per query (see contention note above)
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
