"""Scalable deterministic global ranking.

``row_number() OVER (ORDER BY ...)`` with no PARTITION BY funnels every
row through ONE task — fine for small claim batches, the serial section
at 10M-row crawl generations. This module computes the identical rank
distributed:

1. range-repartition by the order key (boundaries come from sampling and
   may vary run-to-run; they affect placement only, never rank values)
2. sort within partitions
3. one pass to count rows per partition → cumulative offsets (driver,
   O(#partitions))
4. second pass assigns rank = partition offset + local position

Requires the order columns to form a TOTAL order (include a unique
tiebreaker — the engine always has created_seq/url_hash). Ranks are then
unique, dense from 1, and equal to the single-task window's output.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def global_rank(
    df: DataFrame,
    order_cols: list[Column | str],
    out_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``out_col`` = 1-based global rank under ``order_cols`` (must be
    a total order). Distributed: no single-task sort."""
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    ranged = df.repartitionByRange(num_partitions, *cols).sortWithinPartitions(*cols)
    # persist: range boundaries come from sampling at execution time, so
    # the count pass and the assign pass MUST read the same materialized
    # partitioning (a re-executed exchange could re-sample differently)
    from pyspark import StorageLevel

    ranged = ranged.persist(StorageLevel.MEMORY_AND_DISK)

    # pass 1: rows per physical partition (cheap: runs on the sorted data)
    counts_df = ranged.select(F.spark_partition_id().alias("pid")).groupBy("pid").count()
    counts = {r.pid: r["count"] for r in counts_df.collect()}
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    offsets_b = spark.sparkContext.broadcast(offsets)

    from pyspark.sql import types as T

    # NOTE: StructType.add mutates in place and DataFrame.schema is cached —
    # build the output schema without touching df.schema
    field_names = [f.name for f in df.schema.fields]
    out_schema = T.StructType(list(df.schema.fields) + [T.StructField(out_col, T.LongType())])

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        pos = offsets_b.value.get(pid, 0)
        for pdf in batches:
            n = len(pdf)
            out = pdf[field_names].copy()
            out[out_col] = range(pos + 1, pos + n + 1)
            pos += n
            yield out

    return ranged.mapInPandas(assign, schema=out_schema)


# threshold above which the frontier ordering switches from the
# single-task window to the distributed rank (rows)
WINDOW_RANK_MAX_ROWS = 2_000_000
