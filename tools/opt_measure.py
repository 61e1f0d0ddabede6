"""Round-11 optimization measurement harness (guide §1).

For each named query (default: the 18-query headline set):

  * captures ``df.explain("formatted")`` to ``plans/r11/<name>_<tag>.txt``
  * times min-of-N noop-sink executions (same methodology as bench.py),
    with ``setJobDescription`` labels so UI/event logs are readable

Usage:
    python tools/opt_measure.py --tag before [--runs 4] [query ...]
    python tools/opt_measure.py --tag after --no-plans q1_pricing_summary

Prints one JSON line: {"queries": {name: sec}, "tag": ..., "sf": ...}.
This is a measurement tool only — bench.py remains the driver contract.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iris_pyspark_spark.registry import load_all  # noqa: E402
from iris_pyspark_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*", help="query names (default: headline set)")
    ap.add_argument("--tag", default="before", help="plan file suffix (before/after)")
    ap.add_argument("--runs", type=int, default=4)
    ap.add_argument("--no-plans", action="store_true")
    ap.add_argument("--no-time", action="store_true")
    ap.add_argument("--plans-dir", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r12"))
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    registry = load_all()
    if args.queries:
        names = args.queries
    else:
        names = sorted(n for n, q in registry.items() if q.headline)

    spark = get_spark(app_name="iris-pyspark-opt-measure")
    os.makedirs(args.plans_dir, exist_ok=True)

    # Warm codegen at the smallest SF so timing measures steady state.
    # Derived from the SF dir under test (ADVICE r11: a hardcoded
    # /root/testdata path silently no-ops on other hosts and the
    # timings quietly measure cold codegen); failures are logged, not
    # swallowed.
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if not args.no_time:
        for name in names:
            try:
                registry[name].fn(spark, warm_dir).write.format("noop").mode(
                    "overwrite").save()
            except Exception as exc:
                print(f"  warmup failed for {name}: {exc!r}", file=sys.stderr)

    timings: dict[str, float] = {}
    for name in names:
        q = registry[name]
        if not args.no_plans:
            df = q.fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(args.plans_dir, f"{name}_{args.tag}.txt"), "w") as f:
                f.write(plan)
        if args.no_time:
            continue
        runs: list[float] = []
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(f"{name} [{args.tag} run {i}]")
            t0 = time.perf_counter()
            q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        timings[name] = round(min(runs), 4)
        print(f"  {name}: min={min(runs):.3f} runs={[round(r, 3) for r in runs]}",
              file=sys.stderr)

    print(json.dumps({"tag": args.tag, "queries": timings,
                      "total": round(sum(timings.values()), 4), "sf": sf}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
