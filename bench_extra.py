"""Extra benchmarks for optimization work (guide §1.4 noop-sink isolation).

NOT the driver's bench — bench.py stays frozen. This tool times individual
declared queries with the noop sink, optionally captures explain("formatted")
to plans/, and can run at any SF dir.

Usage:
  python bench_extra.py <query> [<query>...] [--sf DIR] [--repeats N] [--plan OUT.txt]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--plan-dir", default=None, help="write <query>.txt explain into this dir")
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from ares_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark(
        "ares-bench-extra",
        master=f"local[{args.cpus}]",
        shuffle_partitions=max(args.cpus, 8),
        extra_conf={"spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024)},
    )
    qs = entrymod.queries()
    out: dict[str, list[float]] = {}
    for name in args.queries:
        fn = qs[name]
        if args.plan_dir:
            os.makedirs(args.plan_dir, exist_ok=True)
            df = fn(spark, args.sf)
            with open(os.path.join(args.plan_dir, f"{name}.txt"), "w") as fh:
                fh.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
        times = []
        for _ in range(args.repeats):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            df = fn(spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 3))
        out[name] = times
        print(json.dumps({"query": name, "sf": args.sf, "times": times,
                          "min": min(times)}), flush=True)
    print(json.dumps({"sf": args.sf, "results": out}))


if __name__ == "__main__":
    main()
