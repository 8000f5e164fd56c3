"""Two-cluster-size scaling evidence for the FULL BFS crawl loop
(VERDICT r3 item 8: scaling_bench covers the extraction pipeline; this
covers claim ordering, fetch join, fused extraction, spidering, Bloom
seen-dedup and snapshot checkpointing end to end).

Protocol identical to tools/scaling_bench.py: the sandbox has no real
multi-executor cluster, so the north_rule's N → 4N criterion is
evidenced by running the IDENTICAL crawl (same pre-materialized linked
web, same seed) at two parallelism levels in separate JVMs, interleaved
best-of-R to decorrelate the host's 10-50% CPU-steal phases.

    scaling_efficiency = throughput_4N / (4 x throughput_N)

Writes BENCH_CRAWL_SCALING.json, appends the runs to BENCH_CRAWL.jsonl
(crawl_bench does that itself), and rewrites only the crawl-scaling
table between its markers in BENCH.md.

Usage: python tools/crawl_scaling_bench.py [n_pages]
Env:   ARES_SCALING_LEVELS=4,16   ARES_SCALING_REPEATS=2
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
N_PAGES = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
LEVELS = tuple(
    int(x) for x in os.environ.get("ARES_SCALING_LEVELS", "4,16").split(",")
)
REPEATS = int(os.environ.get("ARES_SCALING_REPEATS", "2"))

_MARK = "| cluster size | wall (s) | crawl URLs/sec |"


def run_level(cpus: int, pages_dir: str) -> dict:
    env = dict(os.environ, ARES_CRAWLBENCH_PAGES_DIR=pages_dir)
    out = subprocess.run(
        [sys.executable, str(REPO / "tools" / "crawl_bench.py"),
         str(N_PAGES), str(cpus)],
        env=env, capture_output=True, text=True, timeout=3600, cwd=REPO,
    )
    Path(f"/tmp/crawl_scaling_{cpus}.stderr").write_text(out.stderr[-50000:])
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> None:
    pages_dir = tempfile.mkdtemp(prefix="ares_crawlscaling_pages_")
    results: dict[int, dict] = {}
    for rep in range(REPEATS):
        for cpus in LEVELS:
            r = run_level(cpus, pages_dir)
            best = results.get(cpus)
            if best is None or r["urls_per_sec"] > best["urls_per_sec"]:
                results[cpus] = r
            print(f"rep{rep} local[{cpus}]: {r['wall_sec']}s  "
                  f"{r['urls_per_sec']} urls/s  gens={r['generations']}",
                  flush=True)

    n, n4 = LEVELS
    tp_n, tp_4n = results[n]["urls_per_sec"], results[n4]["urls_per_sec"]
    eff = tp_4n / (tp_n * (n4 / n))
    summary = {
        "job": "FULL BFS crawl loop (claim+fetch+extract+spider+seen+checkpoint)",
        "n_pages": N_PAGES,
        "levels": {f"local[{n}]": results[n], f"local[{n4}]": results[n4]},
        "throughput_N": tp_n,
        "throughput_4N": tp_4n,
        "scaling_efficiency": round(eff, 3),
        "meets_north_rule": eff >= 0.8,
    }
    (REPO / "BENCH_CRAWL_SCALING.json").write_text(json.dumps(summary, indent=1))

    table = f"""{_MARK}
|---|---|---|
| local[{n}] (N) | {results[n]["wall_sec"]} | {tp_n} |
| local[{n4}] (4N) | {results[n4]["wall_sec"]} | {tp_4n} |

**Crawl-loop scaling efficiency (throughput_4N / (4 x throughput_N)) = {eff:.3f}**"""
    bench_md = REPO / "BENCH.md"
    if bench_md.exists():
        import re as _re

        txt = bench_md.read_text()
        new, count = _re.subn(
            _re.escape(_MARK) + r".*?\*\*Crawl-loop scaling efficiency [^*]+\*\*",
            table, txt, count=1, flags=_re.DOTALL,
        )
        bench_md.write_text(new if count else txt + "\n" + table + "\n")
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
