"""spark-submit entry point for the crawl engine — the north_rule's
ship shape ("the whole job ships via spark-submit --py-files").

The script imports ``ares_spark`` from the --py-files zip (driver AND
executors), reads pages from parquet or WARC archives, runs the crawl to
completion, and prints the final manifest as one JSON line.

Usage (a real cluster swaps --master and the paths move to shared
storage; nothing else changes):

    ZIP=$(python -c "from ares_spark.session import _package_zip; print(_package_zip())")
    spark-submit --master local[32] --py-files "$ZIP" tools/submit_crawl.py \\
        --pages /data/pages.parquet --seeds https://site.example.org/ \\
        --checkpoint /ckpt/run1 [--warc '/data/*.warc.gz'] \\
        [--max-pages 1000] [--max-depth 3] [--ordering host_rr] \\
        [--allowed-domains example.org] [--resume]

Exercised end-to-end (subprocess spark-submit, zip-only imports) by
tests/test_submit.py.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--pages", help="pages parquet path (url, html[, ...])")
    ap.add_argument("--warc", help="WARC path/glob/dir instead of --pages")
    ap.add_argument("--seeds", nargs="+", default=[], help="seed URLs")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--max-pages", type=int, default=100)
    ap.add_argument("--max-depth", type=int, default=1)
    ap.add_argument("--max-generations", type=int, default=64)
    ap.add_argument("--ordering", choices=["fifo", "host_rr"], default="fifo")
    ap.add_argument("--schema", default="blog@latest")
    ap.add_argument("--allowed-domains", nargs="*", default=[])
    ap.add_argument("--per-host-budget", type=int, default=None)
    ap.add_argument("--robots-from-corpus", action="store_true")
    ap.add_argument("--resume", action="store_true",
                    help="resume from the checkpoint's last manifest")
    args = ap.parse_args()

    # under spark-submit the session is preconfigured by the launcher;
    # ares_spark arrives via --py-files on driver and executors alike
    from pyspark.sql import SparkSession

    from ares_spark.crawl import CrawlConfig, resume_crawl, run_crawl

    spark = SparkSession.builder.getOrCreate()
    if args.warc:
        from ares_spark.io.warc import warc_pages

        pages = warc_pages(spark, args.warc)
    elif args.pages:
        pages = spark.read.parquet(args.pages)
    else:
        ap.error("one of --pages / --warc is required")

    if args.resume:
        summary = resume_crawl(spark, pages, args.checkpoint)
    else:
        if not args.seeds:
            ap.error("--seeds required unless --resume")
        cfg = CrawlConfig(
            schema_spec=args.schema,
            max_pages=args.max_pages,
            max_depth=args.max_depth,
            max_generations=args.max_generations,
            ordering=args.ordering,
            allowed_domains=args.allowed_domains,
            per_host_budget=args.per_host_budget,
            robots_from_corpus=args.robots_from_corpus,
        )
        summary = run_crawl(spark, pages, args.seeds, args.checkpoint, cfg)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
