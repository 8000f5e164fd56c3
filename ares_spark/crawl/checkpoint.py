"""Snapshot-checkpointed tables with lineage manifests.

The Iceberg-shaped persistence layer (the sandbox image has no Iceberg
jars, so snapshots are parquet directories + JSON manifests; the API is
write-once/append/overwrite-latest, exactly what Iceberg snapshots give, and
the calls are isolated here so an Iceberg catalog can slot in by swapping
this module).

Layout per crawl run:
    {root}/manifest-g{NNNN}.json        lineage per generation
    {root}/frontier/g{NNNN}/*.parquet   full frontier state snapshot
    {root}/url_seen/g{NNNN}/*.parquet   URL-seen snapshot
    {root}/extractions/batch-g{NNNN}/   per-generation extraction append

Each manifest records the north_rule lineage: generation number, per
host-shard fetch counters, seen/extraction counts, breaker state, the
logical batch timestamp, and the next created_seq — everything needed to
resume mid-crawl after killing the driver (tested in tests/test_crawl_resume).
"""

from __future__ import annotations

import json
import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


class SnapshotStore:
    def __init__(self, root: str | os.PathLike):
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)

    # -- manifests -----------------------------------------------------------

    def manifest_path(self, generation: int) -> Path:
        return self.root / f"manifest-g{generation:04d}.json"

    def write_manifest(self, generation: int, payload: dict) -> None:
        tmp = self.manifest_path(generation).with_suffix(".tmp")
        tmp.write_text(json.dumps(payload, indent=1, sort_keys=True))
        tmp.rename(self.manifest_path(generation))  # atomic publish

    def latest_generation(self) -> int | None:
        gens = sorted(
            int(p.stem.split("-g")[1]) for p in self.root.glob("manifest-g*.json")
        )
        return gens[-1] if gens else None

    def read_manifest(self, generation: int) -> dict:
        return json.loads(self.manifest_path(generation).read_text())

    # -- snapshots -----------------------------------------------------------

    def _snap_dir(self, table: str, generation: int) -> str:
        return str(self.root / table / f"g{generation:04d}")

    def write_snapshot(self, df: DataFrame, table: str, generation: int) -> None:
        df.write.mode("overwrite").parquet(self._snap_dir(table, generation))

    def read_snapshot(self, spark: SparkSession, table: str, generation: int) -> DataFrame:
        return spark.read.parquet(self._snap_dir(table, generation))

    def append_batch(self, df: DataFrame, table: str, generation: int) -> None:
        df.write.mode("overwrite").parquet(
            str(self.root / table / f"batch-g{generation:04d}")
        )

    def read_all_batches(
        self, spark: SparkSession, table: str, upto_generation: int | None = None
    ) -> DataFrame | None:
        base = self.root / table
        dirs = sorted(str(p) for p in base.glob("batch-g*") if p.is_dir())
        if upto_generation is not None:
            dirs = [d for d in dirs if int(d.rsplit("batch-g", 1)[1]) <= upto_generation]
        if not dirs:
            return None
        return spark.read.parquet(*dirs)


class FrontierLog:
    """Merge-on-read frontier state: base snapshots + per-generation deltas.

    The round-1 frontier rewrote the FULL table every generation —
    O(all jobs ever) read+join+write per generation, the scale-killer at a
    10^10-row frontier. This log keeps it O(delta):

    - ``base-g{N}``: resolved LIVE (status=pending) rows as of *before*
      generation N. Written at seed time (base-g0000) and at every
      compaction (every ``compact_interval`` generations).
    - ``batch-g{N}``: generation N's state changes ONLY — claimed rows
      with their new status (completed / failed / retry-pending) and the
      newly enqueued children. O(batch + children), never O(frontier).
    - read_live(g) = latest-wins per job_id over base ∪ deltas, pending
      rows only. The window partitions by job_id — hash-distributed
      across the cluster, never a single-task sort. Terminal rows
      (completed/failed) act as tombstones: the latest row wins and is
      then filtered out of the live set, so completed jobs cost nothing
      at claim time.
    - read_full(g) = live ∪ every terminal row (each job_id is terminal
      at most once) — the full scrape_jobs-table view, for final-state
      inspection and trace tests; never on the hot path.

    In an Iceberg deployment base/delta become one table with
    merge-on-read position deletes, bucket-partitioned by host_shard
    (MERGE INTO; see job_repository.rs:176-244 for the status-transition
    contract this reproduces). ``state_gen`` is the write-generation
    marker resolution orders by; it is internal and stripped on read.
    """

    def __init__(self, store: SnapshotStore, compact_interval: int = 8):
        self.store = store
        self.compact_interval = compact_interval
        self.dir = store.root / "frontier"
        self.dir.mkdir(parents=True, exist_ok=True)

    def _base_gens(self) -> list[int]:
        return sorted(
            int(p.name.split("base-g")[1]) for p in self.dir.glob("base-g*") if p.is_dir()
        )

    def _delta_dirs(self, lo: int, hi: int) -> list[str]:
        out = []
        for p in sorted(self.dir.glob("batch-g*")):
            if p.is_dir():
                n = int(p.name.split("batch-g")[1])
                if lo <= n <= hi:
                    out.append(str(p))
        return out

    def write_base(self, df: DataFrame, before_generation: int) -> None:
        """Persist resolved live rows as the state before ``before_generation``."""
        df.withColumn("state_gen", F.lit(before_generation - 1)).write.mode(
            "overwrite"
        ).parquet(str(self.dir / f"base-g{before_generation:04d}"))

    def append_delta(self, df: DataFrame, generation: int) -> None:
        df.withColumn("state_gen", F.lit(generation)).write.mode("overwrite").parquet(
            str(self.dir / f"batch-g{generation:04d}")
        )

    def _resolved(self, spark: SparkSession, upto_generation: int) -> DataFrame:
        bases = [b for b in self._base_gens() if b <= upto_generation + 1]
        if not bases:
            raise FileNotFoundError(f"no frontier base at or before g{upto_generation}")
        b = bases[-1]
        paths = [str(self.dir / f"base-g{b:04d}")] + self._delta_dirs(b, upto_generation)
        df = spark.read.parquet(*paths)
        w = Window.partitionBy("job_id").orderBy(F.col("state_gen").desc())
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn", "state_gen")
        )

    def read_live(self, spark: SparkSession, upto_generation: int) -> DataFrame:
        return self._resolved(spark, upto_generation).filter(F.col("status") == "pending")

    def read_full(self, spark: SparkSession, upto_generation: int) -> DataFrame:
        """Live ∪ terminal rows — the complete jobs-table view (cold path)."""
        live = self.read_live(spark, upto_generation)
        deltas = self._delta_dirs(0, upto_generation)
        if not deltas:
            return live
        done = (
            spark.read.parquet(*deltas)
            .filter(F.col("state_gen") <= upto_generation)
            .filter(F.col("status").isin("completed", "failed"))
            .drop("state_gen")
        )
        return live.unionByName(done)

    def maybe_compact(self, spark: SparkSession, generation: int) -> bool:
        """Fold deltas into a new base every ``compact_interval`` generations —
        bounds the number of files resolution reads, amortized O(live/K)."""
        if (generation + 1) % self.compact_interval != 0:
            return False
        self.write_base(self.read_live(spark, generation), generation + 1)
        return True
