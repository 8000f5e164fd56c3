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
import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _success_markers_enabled() -> bool:
    """Whether Spark's committer writes ``_SUCCESS`` at all. Managed
    clusters commonly set mapreduce.fileoutputcommitter.marksuccessfuljobs
    =false; requiring the marker there would make every valid checkpoint
    invisible and break resume. Fall back to dir-exists in that case (the
    crash-mid-write protection the marker gives is then the committer's
    own job-level atomicity)."""
    spark = SparkSession.getActiveSession()
    if spark is None:
        return True
    key = id(spark)
    cached = _MARKER_CACHE.get(key)
    if cached is not None:
        return cached
    try:
        conf = spark.sparkContext._jsc.hadoopConfiguration()
        v = conf.get("mapreduce.fileoutputcommitter.marksuccessfuljobs", "true")
        result = str(v).lower() != "false"
    except Exception:
        result = True
    _MARKER_CACHE[key] = result
    return result


_MARKER_CACHE: dict[int, bool] = {}


def _committed(p: Path) -> bool:
    """A parquet dir is live only once Spark's job commit published its
    ``_SUCCESS`` marker. A crash DURING a merged-run/base write leaves a
    partial dir WITHOUT the marker; treating it as live would shadow the
    intact source dirs (covered-span dedup / latest-base-wins) and
    silently drop rows on resume. Partial dirs are skipped here and
    overwritten by the re-run (every writer uses mode("overwrite")).
    When the job conf disables success markers entirely, dir existence is
    the only available signal — see _success_markers_enabled."""
    if not p.is_dir():
        return False
    return (p / "_SUCCESS").exists() or not _success_markers_enabled()


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

    def read_batch(self, spark: SparkSession, table: str, generation: int) -> DataFrame:
        """One generation's append, read back from parquet (cheaper than
        re-deriving it through the extraction lineage)."""
        return spark.read.parquet(str(self.root / table / f"batch-g{generation:04d}"))

    # append-only logs are per-generation ``batch-g{N}`` dirs plus compacted
    # ``run-g{LO}-g{HI}`` dirs (see compact_log). A run covers every batch in
    # [LO, HI]; reads list both and skip any dir whose range another dir
    # covers, so a crash between "write merged run" and "delete sources"
    # never double-reads rows.

    def _log_dirs(self, table: str) -> list[tuple[int, int, Path]]:
        """(lo, hi, path) per live log dir, sorted by lo, covered dirs
        dropped."""
        base = self.root / table
        spans = []
        for p in base.glob("batch-g*"):
            if _committed(p):
                n = int(p.name.rsplit("batch-g", 1)[1])
                spans.append((n, n, p))
        for p in base.glob("run-g*"):
            if _committed(p):
                lo, hi = p.name[len("run-g"):].split("-g")
                spans.append((int(lo), int(hi), p))
        spans.sort(key=lambda s: (s[0], -(s[1])))
        out: list[tuple[int, int, Path]] = []
        for lo, hi, p in spans:
            if out and lo >= out[-1][0] and hi <= out[-1][1]:
                continue  # covered by a merged run (crash leftovers)
            out.append((lo, hi, p))
        return out

    def read_all_batches(
        self, spark: SparkSession, table: str, upto_generation: int | None = None
    ) -> DataFrame | None:
        dirs = [
            str(p)
            for lo, hi, p in self._log_dirs(table)
            if upto_generation is None or hi <= upto_generation
        ]
        if not dirs:
            return None
        return spark.read.parquet(*dirs)

    def compact_log(
        self,
        spark: SparkSession,
        table: str,
        upto_generation: int,
        max_runs: int = 12,
    ) -> bool:
        """Bound the log's dir count (Iceberg's rewrite_data_files
        bin-packing, emulated on parquet): while more than ``max_runs``
        dirs cover generations ≤ ``upto_generation``, fold the two smallest
        ADJACENT ones into a ``run-g{LO}-g{HI}`` dir. Merging smallest
        pairs keeps the rewrite amortized O(log n) per row instead of the
        O(n)-every-K-generations a single-base design would pay on an
        insert-only log that never shrinks.

        ``upto_generation`` must not exceed the last PUBLISHED manifest:
        a crashed generation is re-run with overwrite-by-dir idempotency,
        which only holds while its batch dir is still un-merged."""
        compacted = False
        while True:
            dirs = [d for d in self._log_dirs(table) if d[1] <= upto_generation]
            if len(dirs) <= max_runs:
                return compacted
            sizes = [
                sum(f.stat().st_size for f in p.rglob("*") if f.is_file())
                for _, _, p in dirs
            ]
            i = min(
                range(len(dirs) - 1), key=lambda j: sizes[j] + sizes[j + 1]
            )
            (lo1, _, p1), (_, hi2, p2) = dirs[i], dirs[i + 1]
            merged = self.root / table / f"run-g{lo1:04d}-g{hi2:04d}"
            spark.read.parquet(str(p1), str(p2)).write.mode("overwrite").parquet(
                str(merged)
            )
            shutil.rmtree(p1)
            shutil.rmtree(p2)
            compacted = True


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
            int(p.name.split("base-g")[1])
            for p in self.dir.glob("base-g*")
            if _committed(p)
        )

    def _delta_dirs(self, lo: int, hi: int) -> list[str]:
        out = []
        for p in sorted(self.dir.glob("batch-g*")):
            if _committed(p):
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

    @staticmethod
    def _backfill_score(df: DataFrame) -> DataFrame:
        """Checkpoints written before the frontier grew its 'score' column
        lack it in parquet; resume must not fail on the spider's select.
        mergeSchema (set by the caller) surfaces the column as null when
        only SOME dirs carry it; a fully pre-score checkpoint needs the
        column added. Either way missing values become the neutral 0.0
        (order_host_rr's score-less default)."""
        if "score" not in df.columns:
            return df.withColumn("score", F.lit(0.0))
        return df.withColumn("score", F.coalesce("score", F.lit(0.0)))

    def _resolved(self, spark: SparkSession, upto_generation: int) -> DataFrame:
        bases = [b for b in self._base_gens() if b <= upto_generation + 1]
        if not bases:
            raise FileNotFoundError(f"no frontier base at or before g{upto_generation}")
        b = bases[-1]
        paths = [str(self.dir / f"base-g{b:04d}")] + self._delta_dirs(b, upto_generation)
        df = self._backfill_score(
            spark.read.option("mergeSchema", "true").parquet(*paths)
        )
        w = Window.partitionBy("job_id").orderBy(F.col("state_gen").desc())
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn", "state_gen")
        )

    def read_live(self, spark: SparkSession, upto_generation: int) -> DataFrame:
        return self._resolved(spark, upto_generation).filter(F.col("status") == "pending")

    def read_full(self, spark: SparkSession, upto_generation: int) -> DataFrame:
        """Live ∪ latest terminal row per job — the complete jobs-table
        view (cold path). Terminal rows resolve latest-wins per job_id
        because cancel/reset (job_repository.rs:230-319) make terminal
        states non-absorbing: a job can go failed → pending (reset) →
        failed again; only its newest terminal row — and none at all if
        it is currently live — belongs in the view."""
        live = self.read_live(spark, upto_generation)
        deltas = self._delta_dirs(0, upto_generation)
        if not deltas:
            return live
        term = self._backfill_score(
            spark.read.option("mergeSchema", "true").parquet(*deltas)
            .filter(F.col("state_gen") <= upto_generation)
            .filter(F.col("status").isin("completed", "failed", "cancelled"))
        )
        w = Window.partitionBy("job_id").orderBy(F.col("state_gen").desc())
        done = (
            term.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn", "state_gen")
            .join(live.select("job_id"), "job_id", "left_anti")
        )
        return live.unionByName(done)

    def maybe_compact(self, spark: SparkSession, generation: int) -> bool:
        """Fold deltas into a new base every ``compact_interval`` generations —
        bounds the number of files resolution reads, amortized O(live/K)."""
        if (generation + 1) % self.compact_interval != 0:
            return False
        self.write_base(self.read_live(spark, generation), generation + 1)
        return True


class LatestStateLog:
    """Incrementally-maintained latest-row-per-key state table — the
    FrontierLog base+delta merge-on-read pattern applied to any keyed
    state. Used for ``extractions_latest`` (A12 change detection,
    repository.rs:48-70 get_latest contract): the per-generation cost is
    O(delta) to write and O(batch ∩ state) to resolve, instead of the
    read-ALL-history-and-window-it the round-2 loop paid per generation.

    - ``batch-g{N}``: generation N's upserts (pre-reduced to one row per
      key by the caller, or resolved here via the tiebreak).
    - ``base-g{N}``: resolved state as of before generation N, rewritten
      every ``compact_interval`` generations.
    - read_latest(g, keys) = latest-wins per key over base ∪ deltas;
      passing ``keys`` (a DataFrame of key columns) SEMI-JOINS the raw
      union down to the requested keys *before* the resolve window, so the
      shuffle+window is O(|keys| ∩ state), never O(state) — at 10^10 urls
      the window over full state would be the generation bottleneck. In an
      Iceberg deployment the base is bucket-partitioned by hash(key) and
      the semi-join prunes partitions, making the SCAN O(|keys|) too.
    """

    def __init__(
        self,
        store: SnapshotStore,
        table: str,
        key_cols: list[str],
        tiebreak_cols: list[str] | None = None,
        compact_interval: int = 8,
    ):
        self.store = store
        self.table = table
        self.key_cols = list(key_cols)
        self.tiebreak_cols = list(tiebreak_cols or [])
        self.compact_interval = compact_interval
        self.dir = store.root / table
        self.dir.mkdir(parents=True, exist_ok=True)

    def _base_gens(self) -> list[int]:
        return sorted(
            int(p.name.split("base-g")[1])
            for p in self.dir.glob("base-g*")
            if _committed(p)
        )

    def _delta_dirs(self, lo: int, hi: int) -> list[str]:
        out = []
        for p in sorted(self.dir.glob("batch-g*")):
            if _committed(p):
                n = int(p.name.split("batch-g")[1])
                if lo <= n <= hi:
                    out.append(str(p))
        return out

    def write_base(self, df: DataFrame, before_generation: int) -> None:
        df.withColumn("state_gen", F.lit(before_generation - 1)).write.mode(
            "overwrite"
        ).parquet(str(self.dir / f"base-g{before_generation:04d}"))

    def append_delta(self, df: DataFrame, generation: int) -> None:
        df.withColumn("state_gen", F.lit(generation)).write.mode("overwrite").parquet(
            str(self.dir / f"batch-g{generation:04d}")
        )

    def read_latest(
        self, spark: SparkSession, upto_generation: int, keys: DataFrame | None = None
    ) -> DataFrame | None:
        """Latest row per key as of ``upto_generation`` (None if the log is
        empty). ``keys``: optional DataFrame whose key columns restrict the
        resolve to the rows that can match — the hot-path form."""
        bases = [b for b in self._base_gens() if b <= upto_generation + 1]
        paths = (
            [str(self.dir / f"base-g{bases[-1]:04d}")] if bases else []
        ) + self._delta_dirs(bases[-1] if bases else 0, upto_generation)
        if not paths:
            return None
        df = spark.read.parquet(*paths)
        if keys is not None:
            df = df.join(keys.select(*self.key_cols).distinct(), self.key_cols, "left_semi")
        order = [F.col("state_gen").desc()] + [
            F.col(c).desc() for c in self.tiebreak_cols
        ]
        w = Window.partitionBy(*self.key_cols).orderBy(*order)
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn", "state_gen")
        )

    def maybe_compact(self, spark: SparkSession, generation: int) -> bool:
        if (generation + 1) % self.compact_interval != 0:
            return False
        resolved = self.read_latest(spark, generation)
        if resolved is None:
            return False
        self.write_base(resolved, generation + 1)
        # covered deltas are dead weight for later reads — drop them, BUT
        # keep the previous base and its deltas: compaction runs before
        # this generation's manifest publishes, so a crash right here
        # resumes at generation-1 and must still resolve upto generation-1
        # (which the brand-new base, covering upto ``generation``, cannot
        # serve). One base of history is exactly enough.
        bases = self._base_gens()
        keep_from = bases[-2] if len(bases) >= 2 else 0
        for d in self._delta_dirs(0, keep_from - 1):
            shutil.rmtree(d)
        for b in bases[:-2]:
            shutil.rmtree(self.dir / f"base-g{b:04d}")
        return True
