"""Benchmark harness — prints ONE JSON line for the driver.

Runs the headline workload at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] (default 32):

- the north-star crawl pipeline (clean → hash → extract → validate →
  ground) over a deterministic synthetic Common-Crawl-style pages corpus,
  reported as pipeline seconds + URLs/sec
- a set of headline relational / dedup / similarity / text queries from
  __spark_entry__ at the bench scale factor

Output: {"metric": ..., "value": <total sec>, "unit": "sec",
         "queries": {name: sec, ...}, "sf": ...,
         "urls_per_sec": ..., "pipeline_urls": ...}

Scaling evidence (N vs 4N cores) is produced by tools/scaling_bench.py,
which shells out to this file with ARES_BENCH_MODE=pipeline at two
parallelism levels and writes BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PIPELINE_URLS = int(os.environ.get("ARES_BENCH_URLS", "40000"))
MODE = os.environ.get("ARES_BENCH_MODE", "full")  # full | pipeline

HEADLINE = [
    "b05_latest_per_key",
    "b07_grouped_agg",
    "b08_inner_join",
    "b09_anti_join_seen",
    "a20_priority_frontier",
    "t02_quality_score",
    "t03_lang_id",
    "t04_fingerprint",
    "d01_exact_dup_groups",
    "d02_minhash_lsh",
    "d03_ngram_jaccard",
    "d06_minhash_lsh_xx",
    "d08_line_dedup",
    "t07_repetition",
    "t05_fingerprint64",
    "s01_ann_bruteforce",
    "s02_ann_lsh",
    "d07b_embedding_near_pairs_lsh",
]


def run_pipeline(spark, n_urls: int, partitions: int) -> dict:
    """North-star workload: full scrape pipeline over n_urls pages.

    Pages are pre-materialized to parquet (untimed) so the timed region
    is exactly the engine: read → clean+links (one parse) → content_hash
    → distinct-content extraction → validation → groundedness → data_hash.
    """
    import tempfile

    from pyspark.sql import functions as F

    from ares_spark.io.synth import synth_pages
    from ares_spark.operators.pipeline import scrape_batch
    from ares_spark.schemas import SchemaRegistry

    pages_dir = os.environ.get("ARES_BENCH_PAGES_DIR")
    if not pages_dir:
        pages_dir = tempfile.mkdtemp(prefix="ares_bench_pages_")
    marker = os.path.join(pages_dir, "_SUCCESS")
    if not os.path.exists(marker):
        synth_pages(
            spark, n_pages=n_urls, n_hosts=200, partitions=partitions, with_text=False
        ).drop("text").write.mode("overwrite").parquet(pages_dir)

    _, _, schema = SchemaRegistry().resolve("blog")
    pages = spark.read.parquet(pages_dir)
    # steady-state measurement: a 10^10-URL crawl amortizes Python-worker
    # startup / JIT / codegen to zero, so warm them on a small slice first,
    # then take the best of N repeats (the virtualized host shows 10-50%
    # CPU-steal variance run to run; fused mode recomputes everything each
    # repeat, so repeats are honest)
    warm = spark.read.parquet(pages_dir).limit(2000).repartition(partitions)
    scrape_batch(warm, schema, "blog").agg(F.count("*")).first()
    repeats = int(os.environ.get("ARES_BENCH_REPEATS", "2"))
    dt = float("inf")
    for _ in range(repeats):
        t0 = time.time()
        out = scrape_batch(pages, schema, "blog")
        n_valid, n_total = out.agg(
            F.sum(F.col("is_valid").cast("int")), F.count("*")
        ).first()
        dt = min(dt, time.time() - t0)
    return {
        "pipeline_sec": round(dt, 3),
        "pipeline_urls": int(n_total),
        "valid_extractions": int(n_valid),
        "urls_per_sec": round(n_total / dt, 1),
    }


def main() -> None:
    from ares_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark(
        "ares-bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 8),
        # CPU-bound pandas-UDF stages need row-count-based splits, not the
        # 128MB byte-based default (tiny html rows → one giant split)
        extra_conf={"spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024)},
    )
    partitions = max(CPUS * 4, 32)

    pipe = run_pipeline(spark, PIPELINE_URLS, partitions)
    result = {
        "metric": "urls_extracted_per_sec",
        "unit": "sec",
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        **pipe,
    }

    queries: dict[str, float] = {"crawl_pipeline": pipe["pipeline_sec"]}
    if MODE == "full":
        qs = entrymod.queries()
        for name in HEADLINE:
            fn = qs[name]
            t0 = time.time()
            df = fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            queries[name] = round(time.time() - t0, 3)
    result["queries"] = queries
    result["value"] = round(sum(queries.values()), 3)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
