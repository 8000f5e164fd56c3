"""Hot-domain skew evidence: salted vs unsalted partitioning ahead of the
CPU-bound parse/extract stage (the north_rule's "salted-host
repartitioning to defeat hot-domain skew").

Builds a pathologically skewed corpus (SKEW_FRAC of all pages on ONE
host), then times the fused clean+extract pass twice over identical
input:

- unsalted: repartition(N, host_shard) — the hot host's shard lands on
  one task; the stage serializes on it
- salted:   repartition(N, host_shard, xxhash64(url) % N) — the crawl
  loop's actual partitioning (loop.py fetch stage); the hot host spreads
  across all tasks

Prints one JSON line and appends it to BENCH_SKEW.jsonl. Usage:
    python tools/skew_bench.py [n_pages] [skew_frac]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

N_PAGES = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
SKEW_FRAC = float(sys.argv[2]) if len(sys.argv) > 2 else 0.9


def main() -> None:
    from ares_spark.crawl.seen import host_shard_col
    from ares_spark.operators.pipeline import scrape_fused
    from ares_spark.schemas import SchemaRegistry
    from ares_spark.session import get_spark

    spark = get_spark()
    salt_n = spark.sparkContext.defaultParallelism
    _, _, schema = SchemaRegistry().resolve("blog")

    hot = int(N_PAGES * SKEW_FRAC)
    pages = (
        spark.range(N_PAGES)
        .select(
            F.when(
                F.col("id") < hot,
                F.concat(F.lit("https://hot.example.com/p"), F.col("id")),
            )
            .otherwise(
                F.concat(
                    F.lit("https://cold"), F.col("id") % 50,
                    F.lit(".example.com/p"), F.col("id"),
                )
            )
            .alias("url")
        )
        .withColumn(
            "html",
            F.encode(
                F.concat(
                    F.lit("<html><head><title>T</title></head><body><h1>H</h1><p>"),
                    F.repeat(F.concat(F.lit("word "), F.col("url")), 40),
                    F.lit("</p></body></html>"),
                ),
                "utf-8",
            ),
        )
        .withColumn("host", F.regexp_extract("url", r"https://([^/]+)/", 1))
        .withColumn("host_shard", host_shard_col("host"))
        .withColumn("url_hash", F.xxhash64("url"))
        .persist()
    )
    pages.count()  # materialize input once, outside both timed regions

    def run(df) -> float:
        t0 = time.time()
        scrape_fused(df, schema).write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 2)

    # scrape_fused repartitions only when the input is narrower than the
    # target parallelism — these inputs already have salt_n partitions, so
    # the partitioning under test is exactly the one below
    unsalted = run(pages.repartition(salt_n, F.col("host_shard")))
    salted = run(
        pages.repartition(
            salt_n, F.col("host_shard"), F.pmod(F.col("url_hash"), F.lit(salt_n))
        )
    )
    # second pass in reverse order to cancel warm-up bias; keep best of 2
    salted = min(salted, run(
        pages.repartition(
            salt_n, F.col("host_shard"), F.pmod(F.col("url_hash"), F.lit(salt_n))
        )
    ))
    unsalted = min(unsalted, run(pages.repartition(salt_n, F.col("host_shard"))))

    result = {
        "n_pages": N_PAGES,
        "skew_frac": SKEW_FRAC,
        "parallelism": salt_n,
        "unsalted_sec": unsalted,
        "salted_sec": salted,
        "speedup": round(unsalted / salted, 2),
    }
    print(json.dumps(result))
    with (Path(__file__).resolve().parent.parent / "BENCH_SKEW.jsonl").open("a") as fh:
        fh.write(json.dumps(result) + "\n")


if __name__ == "__main__":
    main()
