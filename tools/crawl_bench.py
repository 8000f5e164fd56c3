"""End-to-end crawl-loop bench: the full frontier engine (claim ordering,
fetch join, fused extraction, spidering, Bloom seen-dedup, snapshot
checkpointing) over a fully-linked synthetic web.

This is the true north-star shape — URLs scheduled+extracted/sec through
the ENTIRE loop, not just the extraction stage. Usage:

    python tools/crawl_bench.py [n_pages] [cpus]

Prints one JSON line and appends a section to BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_PAGES = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
CPUS = int(sys.argv[2]) if len(sys.argv) > 2 else 32
# link fanout shapes the BFS ramp: fanout 8 ≈ log_8(n) generations of
# which the first ~5 are tiny (pure scheduling latency); a wide fanout
# (e.g. 64) models the 10^10-frontier steady state where every
# generation is budget-capped huge and ramp-up is negligible
FANOUT = int(os.environ.get("ARES_CRAWLBENCH_FANOUT", "8"))
# >0: fetch through a hash-bucketed corpus (crawl/pagestore.py) with this
# many buckets — the Iceberg bucket-pruning analog. The BFS-ramp
# generations then scan only their batch's buckets instead of the whole
# corpus. 0 = plain parquet corpus (the r4 baseline).
BUCKETS = int(os.environ.get("ARES_CRAWLBENCH_BUCKETS", "0"))
# A/B knob for the driver-local small-generation path (localgen.py):
# unset = engine default, 0 = disabled (the r4 all-distributed baseline)
LOCAL_MAX_BATCH = os.environ.get("ARES_CRAWLBENCH_LOCAL_MAX_BATCH")


def main() -> None:
    from ares_spark.crawl import CrawlConfig, run_crawl
    from ares_spark.io.synth import synth_linked_pages
    from ares_spark.session import get_spark

    spark = get_spark("crawl-bench", master=f"local[{CPUS}]",
                      shuffle_partitions=max(CPUS, 8))
    # ARES_CRAWLBENCH_PAGES_DIR: reuse a pre-materialized pages table so
    # two cluster-size runs (tools/crawl_scaling_bench.py) crawl IDENTICAL
    # input; unset → generate a fresh one
    pages_dir = os.environ.get("ARES_CRAWLBENCH_PAGES_DIR") or tempfile.mkdtemp(
        prefix="ares_crawlbench_pages_"
    )
    seed_url = "https://site000.example.org/p0.html"  # synth_linked_pages page 0
    if not (Path(pages_dir) / "_SUCCESS").exists():
        pages_df, seed_url = synth_linked_pages(
            spark, N_PAGES, n_hosts=max(N_PAGES // 400, 8), fanout=FANOUT,
            partitions=CPUS * 2,
        )
        pages_df.write.mode("overwrite").parquet(pages_dir)
    pages = spark.read.parquet(pages_dir)
    if BUCKETS:
        from ares_spark.crawl import BucketedPages, write_bucketed_pages

        bdir = str(Path(pages_dir).with_name(Path(pages_dir).name + f"_b{BUCKETS}"))
        if (Path(bdir) / "_SUCCESS").exists():
            pages = BucketedPages(bdir, BUCKETS)
        else:
            pages = write_bucketed_pages(pages, bdir, BUCKETS)

    ckpt = tempfile.mkdtemp(prefix="ares_crawlbench_ckpt_")
    cfg = CrawlConfig(
        schema_spec="blog@latest",
        max_depth=32,
        max_pages=N_PAGES,
        # the synthetic web spans site*.example.org — allow the suffix
        # (empty allowed_domains would pin the crawl to the seed host)
        allowed_domains=["example.org"],
        ordering="host_rr",
        use_bloom=True,
        max_generations=40,
        max_retries=0,
        prefetch_ordering=os.environ.get("ARES_PREFETCH_ORDERING", "1") == "1",
        **({"local_max_batch": int(LOCAL_MAX_BATCH)} if LOCAL_MAX_BATCH else {}),
    )
    t0 = time.time()
    summary = run_crawl(spark, pages, [seed_url], ckpt, cfg)
    wall = time.time() - t0

    from ares_spark.crawl.checkpoint import SnapshotStore

    visits = SnapshotStore(ckpt).read_all_batches(spark, "visits").count()
    result = {
        "metric": "crawl_loop_urls_per_sec",
        "n_pages": N_PAGES,
        "cpus": CPUS,
        "fanout": FANOUT,
        "buckets": BUCKETS,
        "generations": summary["generation"] + 1,
        "urls_visited": visits,
        "seen_total": summary.get("seen_total"),
        "wall_sec": round(wall, 2),
        "urls_per_sec": round(visits / wall, 1),
    }
    print(json.dumps(result))
    # record the run in BENCH_CRAWL.jsonl (append-only log of runs);
    # BENCH.md's crawl table is curated by hand from these lines, so a
    # bench run never clobbers or duplicates the markdown
    log = Path(__file__).resolve().parent.parent / "BENCH_CRAWL.jsonl"
    with log.open("a") as fh:
        fh.write(json.dumps(result) + "\n")


if __name__ == "__main__":
    main()
