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

from pyspark.sql import DataFrame, SparkSession


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
