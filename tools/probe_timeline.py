"""Host-contention probe timeline (round 12, VERDICT r11 task 1).

Appends one JSON line per sample to the given file (default
PROBE_r12.jsonl): the serial and 8-thread-parallel calibration kernels
from bench.py plus their ratio. A ratio ~1 means the memory system is
quiet (a bench run measures the engine); >>3 means collapsed (a run
measures the host). The timeline is the durable record of WHEN quiet
windows existed during a session — the artifact the r10/r11 verdicts
asked for alongside any BENCH_QUIET capture.

Usage:
    python tools/probe_timeline.py [out.jsonl] [interval_sec] [n_samples]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _calibration_parallel_sec, _calibration_sec  # noqa: E402


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else "PROBE_r12.jsonl"
    interval = float(sys.argv[2]) if len(sys.argv) > 2 else 600.0
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 10**9
    for _ in range(n):
        serial = _calibration_sec()
        parallel = _calibration_parallel_sec()
        row = {
            "ts": round(time.time(), 1),
            "iso": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "serial": serial,
            "parallel": parallel,
            "ratio": round(parallel / max(serial, 1e-9), 2),
        }
        with open(out, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(json.dumps(row), flush=True)
        time.sleep(interval)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
