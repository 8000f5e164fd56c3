"""SparkSession factory tuned for this engine.

Local-mode defaults mirror what the sandbox provides (``local[32]``,
single JVM); on a real cluster the same builder inherits the submitted
master/executor config from ``spark-submit --py-files``. Scale knobs:

- AQE on: runtime shuffle-partition coalescing + skew-join splitting —
  the backstop behind our explicit salted-host partitioning.
- Arrow on: every pandas UDF crosses Python<->JVM as Arrow batches
  (BASELINE.json input_hint: "no per-row Python").
- shuffle.partitions sized to cores in local mode rather than the 200
  default, so sf0.1-scale benches don't drown in empty-partition overhead;
  at cluster scale pass --conf spark.sql.shuffle.partitions explicitly
  (rule of thumb: 2-3x total executor cores, or let AQE coalesce from a
  higher initial value).
"""

from __future__ import annotations

import hashlib
import os
import zipfile
from pathlib import Path

from pyspark.sql import SparkSession


def _package_zip() -> str:
    """Zip the ares_spark package for shipment to executors — the
    programmatic equivalent of ``spark-submit --py-files ares_spark.zip``.
    Content-addressed so repeated sessions reuse the same archive."""
    pkg_dir = Path(__file__).resolve().parent
    digest = hashlib.sha256()
    files = sorted(p for p in pkg_dir.rglob("*") if p.suffix in (".py", ".json"))
    for p in files:
        digest.update(str(p.relative_to(pkg_dir)).encode())
        digest.update(p.read_bytes())
    out = Path(os.environ.get("TMPDIR", "/tmp")) / f"ares_spark-{digest.hexdigest()[:16]}.zip"
    if not out.exists():
        tmp = out.with_suffix(".tmp")
        with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
            for p in files:
                zf.write(p, f"ares_spark/{p.relative_to(pkg_dir)}")
        tmp.rename(out)
    return str(out)


def get_spark(
    app_name: str = "ares_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    # spark.driver.memory via builder.config does NOT apply in PySpark local
    # mode — py4j launches the JVM before the conf is seen, leaving the
    # default 1g heap (measured: 177s of GC in a 24s stage). The heap must
    # be on the JVM command line via PYSPARK_SUBMIT_ARGS.
    import pyspark

    if pyspark.SparkContext._jvm is None and "PYSPARK_SUBMIT_ARGS" not in os.environ:
        mem = os.environ.get("ARES_DRIVER_MEM", "48g")
        os.environ["PYSPARK_SUBMIT_ARGS"] = f"--driver-memory {mem} pyspark-shell"
    if shuffle_partitions is None:
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else "32"
        shuffle_partitions = 32 if n == "*" else max(int(n), 8)
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "8192")
        .config("spark.driver.memory", os.environ.get("ARES_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    # ship the package to executor Python workers regardless of cwd/cluster
    spark.sparkContext.addPyFile(_package_zip())
    return spark
