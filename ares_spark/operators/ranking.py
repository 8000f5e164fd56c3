"""Scalable deterministic global ranking.

``row_number() OVER (ORDER BY ...)`` with no PARTITION BY funnels every
row through ONE task — fine for small claim batches, the serial section
at 10M-row crawl generations. This module computes the identical rank
distributed, entirely JVM-side (no Python/Arrow round trip):

1. range-repartition by the order key (boundaries come from sampling and
   may vary run-to-run; they affect placement only, never rank values) —
   partition i holds keys strictly below partition i+1
2. one counting pass → cumulative offset per partition (driver,
   O(#partitions))
3. rank = offset[pid] + row_number() over (PARTITION BY pid ORDER BY
   keys) — a *partitioned* window: parallel, whole-stage-codegen, never
   a single-task sort

Requires the order columns to form a TOTAL order (include a unique
tiebreaker — the engine always has created_seq/url_hash). Ranks are then
unique, dense from 1, and equal to the single-task window's output.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


# persisted range-partitioned intermediates, released by the caller once
# the ranked output has been fully consumed (release_rank_pins) — without
# this a long crawl accumulates one pinned RDD per ranked generation
_PINNED: list[DataFrame] = []


def release_rank_pins() -> None:
    while _PINNED:
        _PINNED.pop().unpersist()


def pin_watermark() -> int:
    """Current pin-list length — pair with take_pins_since to hand a
    rank's pins to a LATER release scope (the crawl loop's next-generation
    ordering prefetch runs inside generation g's checkpoint barrier but
    its pins must survive g's release_rank_pins). Caller must guarantee
    no other thread ranks between the watermark and the take."""
    return len(_PINNED)


def take_pins_since(mark: int) -> list:
    pins = _PINNED[mark:]
    del _PINNED[mark:]
    return pins


def adopt_pins(pins: list) -> None:
    """Re-enter pins into the global release scope (released by the next
    release_rank_pins call)."""
    _PINNED.extend(pins)


def global_rank(
    df: DataFrame,
    order_cols: list[Column | str],
    out_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``out_col`` = 1-based global rank under ``order_cols`` (must be
    a total order). Distributed: no single-task sort. Internally persists
    the range exchange (both passes must see one sampled partitioning);
    call ``release_rank_pins()`` when the output is consumed."""
    return global_rank_counted(df, order_cols, out_col, num_partitions)[0]


def global_rank_counted(
    df: DataFrame,
    order_cols: list[Column | str],
    out_col: str = "rank",
    num_partitions: int | None = None,
) -> tuple[DataFrame, int]:
    """``global_rank`` that also returns the TOTAL row count — the
    offset-building pass counts every partition anyway, so callers that
    need the batch size (claim count, spider budget) fold their formerly
    separate ``.count()`` job into this one. One job materializes the
    input lineage, range-partitions it, and yields (ranked_df, n_rows)."""
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    # persist: range boundaries come from sampling at execution time, so
    # the count pass and the rank pass MUST read the same materialized
    # partitioning (a re-executed exchange could re-sample differently)
    from pyspark import StorageLevel

    ranged = (
        df.repartitionByRange(num_partitions, *cols)
        .withColumn("__pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    _PINNED.append(ranged)
    counts = {r["__pid"]: r["count"] for r in ranged.groupBy("__pid").count().collect()}
    if not counts:
        return df.withColumn(out_col, F.lit(0).cast("long")), 0
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    # offsets as a literal map: O(#partitions) entries, folded into codegen
    off_expr = F.create_map(
        *[x for pid, off in offsets.items() for x in (F.lit(pid), F.lit(off))]
    )[F.col("__pid")]
    w = Window.partitionBy("__pid").orderBy(*cols)
    ranked = ranged.withColumn(
        out_col, (off_expr + F.row_number().over(w)).cast("long")
    ).drop("__pid")
    return ranked, acc


# threshold above which the frontier ordering switches from the
# single-task window to the distributed rank (rows). 50k keeps tiny test
# batches on the cheap window while real crawl generations (100k+ URLs,
# unbounded at web scale) take the distributed path — the window's
# single-task sort is the serial section the auto-switch exists to avoid.
# Env-overridable for perf experiments (ARES_WINDOW_RANK_MAX_ROWS).
import os

WINDOW_RANK_MAX_ROWS = int(os.environ.get("ARES_WINDOW_RANK_MAX_ROWS", "50000"))
