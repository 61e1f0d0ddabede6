"""Superlinearity hunter: time every registered query at two scale
factors and flag suspicious growth.

A query whose wall-clock grows much faster than the data is a scale
bug even when every correctness gate is green — round 5 ran this and
caught two (fixed-cardinality blocking in n_edit_distance_pairs, 14.7x
wall-clock for 10x data; quadratic output in n_ngram_jaccard, 9.7x).

Usage:
    python tools/scaling_sweep.py run  <sf_dir> <out.json>   # one pass
    python tools/scaling_sweep.py diff <small.json> <big.json> [ratio] [artifact.json]

Standing per-round gate (round 6 on): run both passes, then `diff ...
SCALING_r{N}.json` and check the artifact in — the round-over-round
ratio table is diffable, and any query at/above the flag threshold is
triaged in CHANGELOG or fixed before the round closes.

`run` executes each query once with the noop sink (full computation, no
collect) and writes {name: seconds | null(env-gated) | "ERR ..."}.
`diff` prints queries above the ratio threshold (default 8 — ~linear
for 10x data is 10x on data terms, but fixed per-query overheads pull
honest queries well below it; anything above is worth a plan read).
Run the two `run` passes sequentially, never concurrently — contention
invalidates the comparison. First-run artifact builds inflate one-pass
times; confirm a suspect with a warmed re-run before acting.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(sf_dir: str, out: str) -> int:
    from iris_pyspark_spark.registry import EnvironmentGated, load_all
    from iris_pyspark_spark.session import get_spark

    spark = get_spark(app_name="scaling-sweep")
    times: dict[str, object] = {}
    for name, q in load_all().items():
        t0 = time.perf_counter()
        try:
            q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times[name] = round(time.perf_counter() - t0, 3)
        except EnvironmentGated:
            times[name] = None
        except Exception as e:  # noqa: BLE001 — record, keep sweeping
            times[name] = f"ERR {type(e).__name__}"
    json.dump(times, open(out, "w"), indent=0)
    errs = [n for n, v in times.items() if isinstance(v, str)]
    print(f"swept {len(times)} queries at {sf_dir}; {len(errs)} errors {errs}")
    return 1 if errs else 0


def diff(
    small_path: str,
    big_path: str,
    threshold: float = 8.0,
    artifact: str | None = None,
) -> int:
    small = json.load(open(small_path))
    big = json.load(open(big_path))
    rows = []
    for name, tb in big.items():
        ts = small.get(name)
        if (
            isinstance(tb, (int, float))
            and isinstance(ts, (int, float))
            and tb > 2.0  # ignore noise-floor queries
        ):
            rows.append((tb / max(ts, 0.05), ts, tb, name))
    rows.sort(reverse=True)
    flagged = [r for r in rows if r[0] >= threshold]
    print(f"{'ratio':>6} {'small':>7} {'big':>7}  query")
    for r, ts, tb, name in rows[:15]:
        mark = "  <-- SUPERLINEAR SUSPECT" if r >= threshold else ""
        print(f"{r:6.1f} {ts:7.2f} {tb:7.2f}  {name}{mark}")
    if artifact:
        json.dump(
            {
                "small": small_path,
                "big": big_path,
                "threshold": threshold,
                "n_timed": len(rows),
                "flagged": [name for _r, _ts, _tb, name in flagged],
                # Only above-noise-floor queries carry a meaningful ratio;
                # the table is the round-over-round diffable record.
                "ratios": {
                    name: {"small_s": ts, "big_s": tb, "ratio": round(r, 2)}
                    for r, ts, tb, name in rows
                },
            },
            open(artifact, "w"),
            indent=1,
        )
        print(f"wrote {artifact}")
    return 1 if flagged else 0


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else ""
    if mode == "run" and len(sys.argv) == 4:
        raise SystemExit(run(sys.argv[2], sys.argv[3]))
    if mode == "diff" and len(sys.argv) in (4, 5, 6):
        thr = float(sys.argv[4]) if len(sys.argv) >= 5 else 8.0
        art = sys.argv[5] if len(sys.argv) == 6 else None
        raise SystemExit(diff(sys.argv[2], sys.argv[3], thr, art))
    print(__doc__)
    raise SystemExit(2)
