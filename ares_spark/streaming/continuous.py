"""Continuous crawl/extract as a Structured Streaming job.

Shapes:

- ``continuous_extraction_query``: ``readStream`` over a pages directory
  (new parquet files = newly fetched pages, e.g. dropped by a fetch fleet)
  → the SAME fused clean/extract pipeline (mapInPandas works unchanged on
  streaming DataFrames via foreachBatch) → parquet sink with checkpointing.
  Trigger ``availableNow`` drains the backlog then stops — the streaming
  twin of one frontier generation; remove the trigger for a standing query.

- ``host_rate_metrics``: event-time windowed per-host fetch counts with a
  watermark for late arrivals — the observability side of politeness
  (1 req/s/domain ceilings become assertable from this stream).

State stores, offsets and sink commits live under ``checkpoint_dir`` —
exactly-once per micro-batch against file sources/sinks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ares_spark.io.synth import PAGES_SCHEMA


def continuous_extraction_query(
    spark: SparkSession,
    pages_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema: dict,
    available_now: bool = True,
    max_files_per_trigger: int = 16,
):
    """Start the streaming extraction query; returns the StreamingQuery."""
    from ares_spark.operators.pipeline import scrape_fused

    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(pages_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        out = scrape_fused(batch_df, schema).withColumn(
            "data_hash", F.sha2(F.col("extracted_data"), 256)
        ).withColumn("batch_id", F.lit(batch_id))
        (
            out.filter(F.col("is_valid"))
            .select(
                "url", "content_hash", "data_hash", "extracted_data",
                "warc_ts", "batch_id",
            )
            .write.mode("append")
            .parquet(out_dir)
        )

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def host_rate_metrics(
    pages_stream: DataFrame, window: str = "10 seconds", watermark: str = "30 seconds"
) -> DataFrame:
    """Watermarked per-host fetch-rate aggregation (streaming DataFrame in,
    streaming DataFrame out; attach your own sink)."""
    return (
        pages_stream.withColumn(
            "host", F.regexp_extract("url", r"^https?://([^/:?#]+)", 1)
        )
        .withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window), "host")
        .agg(F.count("*").alias("fetches"))
        .select(
            F.col("window.start").alias("window_start"),
            "host",
            "fetches",
        )
    )


def streaming_first_seen(
    pages_stream: DataFrame,
    key_col: str = "url",
    ttl_minutes: int | None = None,
) -> DataFrame:
    """Exactly-first-occurrence filter over an unbounded stream — the
    URL-seen set as a CUSTOM STATEFUL streaming operator
    (``applyInPandasWithState``): per-key state holds the occurrence
    count; only a key's first-ever row passes through, duplicates within
    and across micro-batches are dropped. ``ttl_minutes`` expires idle
    keys (processing-time timeout) so a recrawl horizon bounds state
    size — at 10^10 keys the state store shards per key-group across
    executors exactly like the batch engine's Bloom sidecars shard by
    host. State survives restarts via the query checkpoint."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "key string, warc_ts timestamp, n_dupes_dropped long"

    def first_seen(key, pdfs, state: GroupState):
        import pandas as pd

        prior = state.get[0] if state.exists else 0
        rows = 0
        first_ts = None
        for pdf in pdfs:
            if len(pdf) and prior == 0 and rows == 0:
                first_ts = pdf["warc_ts"].iloc[0]
            rows += len(pdf)
        if ttl_minutes is not None:
            state.setTimeoutDuration(ttl_minutes * 60_000)
        if prior == 0 and rows > 0:
            state.update((rows,))
            yield pd.DataFrame(
                {"key": [key[0]], "warc_ts": [first_ts],
                 "n_dupes_dropped": [rows - 1]}
            )
        else:
            if state.hasTimedOut:
                state.remove()  # TTL eviction: the key may be recrawled
            elif rows:
                state.update((prior + rows,))
            yield pd.DataFrame({"key": [], "warc_ts": [], "n_dupes_dropped": []})

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_minutes is not None
        else GroupStateTimeout.NoTimeout
    )
    return (
        pages_stream.groupBy(F.col(key_col))
        .applyInPandasWithState(
            first_seen, out_schema, "n long", "append", timeout
        )
    )
