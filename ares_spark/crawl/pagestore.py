"""Hash-bucketed pages corpus — the Iceberg ``bucket(N, url)`` partition
transform, emulated on parquet (sandbox has no Iceberg jars; the swap point
is this module, same as crawl/checkpoint.py isolates the snapshot-log swap).

Why it exists (scale): the sandbox "fetch" is ``batch ⋈ pages`` (loop.py).
Round-4 replaced the per-generation corpus SHUFFLE with a streamed corpus
scan + broadcast semi-join probe — but every generation still paid a full
O(corpus) *scan*. At 10^10 pages that is the dominant fetch cost for the
BFS ramp and politeness-capped generations, whose batches touch a tiny
fraction of the corpus. Iceberg's answer is bucket partitioning: store
pages partitioned by ``bucket = pmod(hash(url), B)``, derive the batch's
bucket set (≤ min(|batch|, B) ints), and let partition pruning skip
every untouched bucket — scan cost drops from O(corpus) to
O(|batch| × corpus/B), i.e. proportional to the batch, not the corpus.

The bucket function reuses the engine's canonical url hash
(seen.py url_hash_col = xxhash64 over the RFC-3986-canonicalized url), so
frontier rows derive their bucket from the ``url_hash`` column they already
carry — no re-hash, and the store/probe hashes cannot drift apart.

Reference anchor: the Rust engine fetches over HTTP so has no corpus-scan
analog; this is the batch/Iceberg-native half of A1 (north_rule: "Iceberg
tables at 10^10-URL scale" + partition pruning), same slot the live
fetcher (crawl/httpfetch.py) fills for the wire half.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ares_spark.crawl.seen import url_hash_col

__all__ = ["BucketedPages", "page_bucket_col", "write_bucketed_pages"]


def page_bucket_col(n_buckets: int, url_col="url"):
    """Bucket id of a url: pmod(xxhash64(canonical url), B) — MUST stay in
    lockstep with seen.url_hash_col (frontier rows reuse their url_hash)."""
    return F.pmod(url_hash_col(url_col), F.lit(n_buckets)).cast("int")


def write_bucketed_pages(
    pages: DataFrame, path: str, n_buckets: int = 4096
) -> "BucketedPages":
    """Materialize a pages corpus hash-bucketed on disk.

    One-time preparation cost (one full shuffle by bucket), amortized over
    every subsequent crawl generation's pruned scan. ``n_buckets`` trades
    pruning resolution against file health: a generation of |batch| urls
    scans at most min(|batch|, B) buckets (pruning bites below ~B/4), but
    each bucket must still hold a healthy parquet file — size B ≈
    corpus_bytes / 128 MB and let pruning resolution follow (10^10 pages ×
    ~3 KB → B ≈ 2^18, which prunes the entire BFS ramp; a 400 MB sandbox
    corpus → B ≈ 64-256). Over-bucketing a small corpus degrades BOTH
    paths: tiny files + B-dir listings cost more than the full scan they
    replace. repartition BY THE PARTITION COLUMN
    before partitionBy so each task owns whole buckets — without it every
    task writes a file into every bucket dir (B × tasks small files, the
    classic partitionBy explosion).
    """
    bucketed = pages.withColumn("page_bucket", page_bucket_col(n_buckets))
    writer_parallelism = min(
        n_buckets, pages.sparkSession.sparkContext.defaultParallelism * 4
    )
    (
        bucketed.repartition(writer_parallelism, "page_bucket")
        .write.mode("overwrite")
        .partitionBy("page_bucket")
        .parquet(path)
    )
    return BucketedPages(path, n_buckets)


class BucketedPages:
    """Handle to a bucket-partitioned pages corpus (see write_bucketed_pages).

    Passed wherever crawl APIs accept a ``pages`` DataFrame; the fetch
    stage detects it and swaps the full-corpus scan for a partition-pruned
    one when the generation's batch is small enough for pruning to bite.
    """

    def __init__(self, path: str, n_buckets: int):
        self.path = str(path)
        self.n_buckets = int(n_buckets)
        self._session = None
        self._df = None

    def _base(self, spark: SparkSession) -> DataFrame:
        """One partition-discovery per session: building a parquet relation
        lists every bucket dir (B dirs — the dominant cost of a pruned
        scan at high B). Cache the relation; every generation's pruned
        scan then reuses its file index and pays only the pruning filter,
        exactly like Iceberg scanning one snapshot's manifest repeatedly."""
        if self._df is None or self._session is not spark:
            self._session = spark
            self._df = spark.read.parquet(self.path)
        return self._df

    def read_all(self, spark: SparkSession) -> DataFrame:
        """The whole corpus (no pruning) — robots derivation and
        corpus-scale generations."""
        return self._base(spark).drop("page_bucket")

    def buckets_for_batch(self, batch: DataFrame) -> list[int]:
        """Distinct bucket ids of a frontier batch, from the url_hash the
        frontier already carries. Driver-bounded: ≤ min(|batch|, B) ints —
        call only on generation batches (politeness/budget-capped), never
        on the corpus."""
        rows = (
            batch.select(
                F.pmod(F.col("url_hash"), F.lit(self.n_buckets))
                .cast("int")
                .alias("page_bucket")
            )
            .distinct()
            .collect()
        )
        return sorted(r.page_bucket for r in rows)

    def scan_buckets(self, spark: SparkSession, bucket_ids: list[int]) -> DataFrame:
        """Partition-pruned corpus scan: only the named buckets' files are
        read (PartitionFilters on page_bucket — plan-asserted in
        tests/test_pagestore.py)."""
        if not bucket_ids:
            return self.read_all(spark).limit(0)
        return (
            self._base(spark)
            .filter(F.col("page_bucket").isin(bucket_ids))
            .drop("page_bucket")
        )

    def scan_for_batch(self, spark: SparkSession, batch: DataFrame) -> DataFrame:
        return self.scan_buckets(spark, self.buckets_for_batch(batch))
