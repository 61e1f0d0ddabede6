"""Opportunistic quiet-window reference bench (VERDICT r09 task 5).

Two consecutive driver benches were host-invalidated (r08 contended
CPU, r09 collapsed memory bandwidth), so round-over-round engine
comparisons need a durable quiet-window artifact, not a CHANGELOG
sentence. This tool makes capturing one mechanical:

    python tools/quiet_bench.py [BENCH_QUIET_rNN.json]

1. Probe the host: serial + 8-thread parallel calibration (bench.py's
   own yardsticks). If parallel > 3x serial the memory system is
   collapsed — exit 1 WITHOUT benching (a run now would measure the
   host, not the engine).
2. Otherwise run bench.py at sf0.1 with min-of-6 (SPARK_GRAFT_BENCH_RUNS=6)
   and write its JSON line, plus the pre-run probe, to the artifact.

Exit codes: 0 artifact written, 1 host collapsed, 2 bench failed.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _calibration_parallel_sec, _calibration_sec  # noqa: E402


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else "BENCH_QUIET_r10.json"
    serial = _calibration_sec()
    parallel = _calibration_parallel_sec()
    ratio = parallel / max(serial, 1e-9)
    print(f"probe: serial={serial} parallel={parallel} ratio={ratio:.1f}")
    if ratio > 3.0:
        print("host collapsed (parallel > 3x serial) — not benching")
        return 1
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = env.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    env["SPARK_GRAFT_BENCH_RUNS"] = "6"
    proc = subprocess.run(
        [sys.executable, "bench.py"], capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    if proc.returncode != 0 or not line:
        print(proc.stdout[-2000:])
        print(proc.stderr[-2000:])
        return 2
    payload = json.loads(line[-1])
    payload["quiet_probe"] = {
        "serial_before_bench": serial,
        "parallel_before_bench": parallel,
        "ratio": round(ratio, 2),
    }
    payload["n_runs"] = 6
    with open(out, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"wrote {out}: headline {payload['value']}s, "
          f"host_collapsed={payload['host_collapsed']}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
