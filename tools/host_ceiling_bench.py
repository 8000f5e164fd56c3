"""Measure the HOST's own N→4N parallel-scaling ceiling.

The sandbox advertises 32 CPUs, but they are virtualized/SMT-shared:
16 truly-parallel CPU-bound processes do not deliver 4x the throughput
of 4. Any Spark-level scaling-efficiency number on this host must be
read against this hardware ceiling — a job whose 4→16 efficiency equals
the ceiling is scaling PERFECTLY at the Spark layer.

Method: N identical single-process CPU-bound tasks (pure-python sha256
chain — no memory pressure, no IO, no GIL sharing) launched
concurrently; perfect hardware scaling keeps wall time constant as N
grows. Prints one JSON line with per-level throughput and

    ceiling = tasks_per_sec(4N) / (4 x tasks_per_sec(N))

Usage: python tools/host_ceiling_bench.py [chain_len] [repeats]
"""

from __future__ import annotations

import json
import subprocess
import sys
import time

CHAIN = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
REPEATS = int(sys.argv[2]) if len(sys.argv) > 2 else 2
LEVELS = (4, 16)

WORK = (
    "import hashlib\nh=b'x'\n"
    f"for i in range({CHAIN}): h=hashlib.sha256(h).digest()"
)


def run(n: int) -> float:
    t0 = time.time()
    ps = [subprocess.Popen([sys.executable, "-c", WORK]) for _ in range(n)]
    for p in ps:
        p.wait()
    return n / (time.time() - t0)  # tasks/sec


def main() -> None:
    best = {}
    for _ in range(REPEATS):
        for n in LEVELS:  # interleaved, best-of-R like the Spark benches
            tp = run(n)
            if tp > best.get(n, 0.0):
                best[n] = tp
    n, n4 = LEVELS
    out = {
        "metric": "host_parallel_scaling_ceiling",
        "work": f"sha256 chain x{CHAIN}",
        "tasks_per_sec": {str(k): round(v, 3) for k, v in best.items()},
        "ceiling_4x": round(best[n4] / (4 * best[n]), 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
