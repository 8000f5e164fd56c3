"""Frontier table schema + claim ordering (SURVEY.md A19-A22, B2, B4).

The frontier is the Spark replacement for the ``scrape_jobs`` queue
(/root/reference/crates/ares-db/migrations/002_scrape_jobs.sql): one row
per job, state advanced by whole-generation batches instead of row locks.
Determinism comes from ``created_seq`` — a dense global sequence assigned
at enqueue time (seed order, then (parent claim position, link rank)) —
which reproduces the serial worker's FIFO claim order
(job_repository.rs:161-163) without any claim races.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

FRONTIER_SCHEMA = T.StructType(
    [
        T.StructField("job_id", T.StringType(), False),
        T.StructField("url", T.StringType(), False),  # canonical form
        T.StructField("url_hash", T.LongType(), False),  # xxhash64(url)
        T.StructField("host", T.StringType(), True),
        T.StructField("host_shard", T.IntegerType(), True),
        T.StructField("schema_name", T.StringType(), True),
        T.StructField("status", T.StringType(), False),  # pending|completed|failed
        T.StructField("retry_count", T.IntegerType(), False),
        T.StructField("max_retries", T.IntegerType(), False),
        T.StructField("next_retry_at", T.DoubleType(), True),  # logical epoch s
        T.StructField("created_seq", T.LongType(), False),
        T.StructField("created_at", T.DoubleType(), False),
        T.StructField("crawl_session_id", T.StringType(), True),
        T.StructField("parent_job_id", T.StringType(), True),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("score", T.DoubleType(), True),  # priority (north_rule)
        T.StructField("max_depth", T.IntegerType(), False),
        T.StructField("max_pages", T.IntegerType(), False),
        T.StructField("allowed_domains", T.ArrayType(T.StringType()), True),
        T.StructField("generation", T.IntegerType(), False),
        T.StructField("error", T.StringType(), True),
    ]
)


def claimable(frontier: DataFrame, batch_ts: float) -> DataFrame:
    """B2: pending AND (next_retry_at IS NULL OR next_retry_at <= now)."""
    return frontier.filter(
        (F.col("status") == "pending")
        & (F.col("next_retry_at").isNull() | (F.col("next_retry_at") <= F.lit(batch_ts)))
    )


def global_order_rank(
    df: DataFrame, order_cols, out_col: str = "claim_pos", n_rows: int | None = None
) -> DataFrame:
    """``out_col`` = 1-based global rank under order_cols (a total order).

    Auto-switch (the engine default): batches at or below
    ``WINDOW_RANK_MAX_ROWS`` use the plain window (fewest jobs); larger
    batches use the distributed range-partitioned rank so the global sort
    never runs on one task. Ranks are identical either way (proven in
    tests/test_ranking.py), so the switch is invisible to the trace.
    ``n_rows`` is the caller's already-known row count; without it, auto
    mode pays one count job. ``ares.rank.mode`` in (window|distributed)
    forces a path (tests / plan audits)."""
    from ares_spark.operators.ranking import WINDOW_RANK_MAX_ROWS, global_rank

    mode = df.sparkSession.conf.get("ares.rank.mode", "auto")
    if mode == "auto":
        if n_rows is None:
            n_rows = df.count()
        mode = "window" if n_rows <= WINDOW_RANK_MAX_ROWS else "distributed"
    if mode == "distributed":
        return global_rank(df, order_cols, out_col=out_col)
    # cast: global_rank emits long; keep one type so per-generation parquet
    # appends never mix int/long when the auto-switch flips between gens
    return df.withColumn(
        out_col, F.row_number().over(Window.orderBy(*order_cols)).cast("long")
    )


def order_fifo(df: DataFrame, n_rows: int | None = None) -> DataFrame:
    """Reference claim order (job_repository.rs:161-163):
    next_retry_at NULLS FIRST, then creation order."""
    return global_order_rank(
        df,
        [F.col("next_retry_at").asc_nulls_first(), F.col("created_seq").asc()],
        n_rows=n_rows,
    )


def order_host_rr(df: DataFrame, n_rows: int | None = None) -> DataFrame:
    """north_rule priority: host-aware round-robin with depth/score order
    (SURVEY A20) — rank within host by (depth asc, score DESC,
    created_seq), interleave hosts by rank. Higher score = claimed
    earlier within its host round; inputs without a score column order
    as all-equal (back-compatible)."""
    order = [F.col("next_retry_at").asc_nulls_first(), F.col("depth").asc()]
    if "score" in df.columns:
        order.append(F.col("score").desc_nulls_last())
    order.append(F.col("created_seq").asc())
    w_host = Window.partitionBy("host").orderBy(*order)
    df = df.withColumn("host_rank", F.row_number().over(w_host))
    return global_order_rank(
        df, [F.col("host_rank"), F.col("host"), F.col("created_seq")], n_rows=n_rows
    ).drop("host_rank")


def order_counted(df: DataFrame, ordering: str) -> tuple[DataFrame, int]:
    """Claim ordering with the batch size folded into the rank's own
    counting pass (ranking.global_rank_counted): ONE job materializes the
    frontier resolve, range-orders the batch, and returns its size —
    collapsing the loop's former separate claim-count job. Ranks are
    identical to order_fifo/order_host_rr (same order keys through the
    proven window==distributed equivalence), so traces are unchanged."""
    from ares_spark.operators.ranking import global_rank_counted

    if ordering == "fifo":
        return global_rank_counted(
            df,
            [F.col("next_retry_at").asc_nulls_first(), F.col("created_seq").asc()],
            out_col="claim_pos",
        )
    order = [F.col("next_retry_at").asc_nulls_first(), F.col("depth").asc()]
    if "score" in df.columns:
        order.append(F.col("score").desc_nulls_last())
    order.append(F.col("created_seq").asc())
    w_host = Window.partitionBy("host").orderBy(*order)
    ranked, n = global_rank_counted(
        df.withColumn("host_rank", F.row_number().over(w_host)),
        [F.col("host_rank"), F.col("host"), F.col("created_seq")],
        out_col="claim_pos",
    )
    return ranked.drop("host_rank"), n


def retry_delay_expr(attempt_col="retry_count"):
    """A22 backoff schedule: 60s / 300s / 1800s / 3600s (job.rs:60-94)."""
    a = F.col(attempt_col) if isinstance(attempt_col, str) else attempt_col
    return (
        F.when(a <= 1, 60.0).when(a == 2, 300.0).when(a == 3, 1800.0).otherwise(3600.0)
    )


def cancel_jobs(sel: DataFrame) -> DataFrame:
    """A job-control transition (job_repository.rs:230-244 cancel_job):
    rows NOT already completed/cancelled move to 'cancelled' — a terminal
    status claimable() never selects. Input is the caller's selection of
    current-state rows; output is the delta to append to the FrontierLog."""
    return (
        sel.filter(~F.col("status").isin("completed", "cancelled"))
        .withColumn("status", F.lit("cancelled"))
    )


def reset_jobs(sel: DataFrame) -> DataFrame:
    """Manual retry (job_repository.rs:296-319 retry_job): failed or
    cancelled rows become fresh pending — retry_count 0, error and
    next_retry_at cleared — so the next generation claims them again."""
    return (
        sel.filter(F.col("status").isin("failed", "cancelled"))
        .withColumn("status", F.lit("pending"))
        .withColumn("retry_count", F.lit(0))
        .withColumn("error", F.lit(None).cast("string"))
        .withColumn("next_retry_at", F.lit(None).cast("double"))
    )
