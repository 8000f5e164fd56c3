"""Distributed global rank == single-task window rank (STATUS gap #1)."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from ares_spark.operators.ranking import global_rank


def test_global_rank_matches_window(spark):
    df = (
        spark.range(50_000)
        .select(
            F.col("id"),
            (F.xxhash64("id") % 1000).alias("key"),
            F.when(F.col("id") % 7 == 0, F.col("id") % 13).alias("nullable"),
        )
        .repartition(16)
    )
    order = [F.col("nullable").asc_nulls_first(), F.col("key").asc(), F.col("id").asc()]
    expected = {
        r.id: r.rk
        for r in df.withColumn("rk", F.row_number().over(Window.orderBy(*order))).collect()
    }
    got = {r.id: r.rank for r in global_rank(df, order, num_partitions=16).collect()}
    assert got == expected


def test_global_rank_empty_and_single(spark):
    df = spark.range(0).select(F.col("id"))
    assert global_rank(df, [F.col("id")]).count() == 0
    one = spark.range(1).select(F.col("id"))
    assert global_rank(one, [F.col("id")]).first().rank == 1


def test_crawl_with_distributed_rank_same_trace(spark, tmp_path_factory):
    """The crawl visit trace is identical under ares.rank.mode=distributed."""
    from ares_spark.crawl import CrawlConfig, run_crawl
    from ares_spark.crawl.checkpoint import SnapshotStore
    from ares_spark.io.synth import CRAWL_SEED_URL, crawl_site_pages

    site = crawl_site_pages(spark)
    spark.conf.set("ares.rank.mode", "distributed")
    try:
        ckpt = str(tmp_path_factory.mktemp("crawl_dr"))
        run_crawl(spark, site, [CRAWL_SEED_URL], ckpt,
                  CrawlConfig(max_depth=1, use_bloom=False))
        visits = SnapshotStore(ckpt).read_all_batches(spark, "visits")
        got = [(r.visit_pos, r.url) for r in visits.orderBy("visit_pos").collect()]
    finally:
        spark.conf.unset("ares.rank.mode")  # back to the auto default
    assert got == [
        (0, CRAWL_SEED_URL),
        (1, "https://blog.example.com/post-backpressure.html"),
        (2, "https://blog.example.com/post-ownership.html"),
    ]


def test_engine_rank_plan_partitions_all_windows(spark):
    """Above the auto-switch threshold, the claim-ordering plan must contain
    NO unpartitioned Window (the single-task global sort): every
    windowspecdefinition's first argument is a partition column, never a
    sort-order token."""
    import re

    from ares_spark.crawl.frontier import order_fifo, order_host_rr
    from ares_spark.operators.ranking import WINDOW_RANK_MAX_ROWS

    n = WINDOW_RANK_MAX_ROWS + 1
    df = spark.range(n).select(
        F.col("id").alias("created_seq"),
        F.concat(F.lit("h"), (F.col("id") % 100)).alias("host"),
        F.lit(None).cast("double").alias("next_retry_at"),
        (F.col("id") % 3).cast("int").alias("depth"),
    )
    for fn in (order_fifo, order_host_rr):
        plan = fn(df, n_rows=n)._jdf.queryExecution().executedPlan().toString()
        specs = re.findall(r"windowspecdefinition\(([^,]+),", plan)
        assert specs, "expected Window nodes in the ranked plan"
        for first_arg in specs:
            assert "ASC" not in first_arg and "DESC" not in first_arg, (
                f"unpartitioned window in engine plan: {first_arg}"
            )


def test_keyset_pagination_plan_no_global_window(spark):
    """b04_history_keyset is the 100x-clean pagination path: its physical
    plan is a pushed-down cursor filter + distributed top-K
    (TakeOrderedAndProject) with NO Window node at all — and it returns
    exactly the rows the OFFSET formulation returns for the same page."""
    import __spark_entry__ as e

    sf = "/root/testdata/sf0.001"
    q = e.queries()["b04_history_keyset"](spark, sf)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan
    # parity with the OFFSET formulation of the same page
    got = [(r.event_id, r.ts_epoch) for r in q.collect()]
    ev = spark.read.parquet(f"{sf}/events.parquet")
    from pyspark.sql import Window as W

    cur = F.lit("2024-01-15 00:00:00").cast("timestamp")
    w = W.orderBy(F.col("ts").desc(), F.col("event_id").desc())
    offs = (ev.filter((F.col("ts") < cur)
                      | ((F.col("ts") == cur) & (F.col("event_id") < 5000)))
            .withColumn("rn", F.row_number().over(w)).filter("rn <= 20")
            .select("event_id", F.unix_timestamp("ts").alias("ts_epoch")))
    want = [(r.event_id, r.ts_epoch) for r in offs.collect()]
    assert sorted(got) == sorted(want) and len(got) == 20


def test_offset_and_claim_queries_plan_no_unpartitioned_window(spark):
    """r5: a20_priority_frontier and b04_history_pagination were rewritten
    from a global row_number window to distributed top-K
    (TakeOrderedAndProject) + a bounded window over only the capped
    survivors. Assert the shape: TakeOrderedAndProject present, and every
    remaining windowspecdefinition carries a partition expression (never a
    sort-order token first), so nothing funnels the full table through a
    single task."""
    import re

    import __spark_entry__ as e

    sf = "/root/testdata/sf0.001"
    for name in ("a20_priority_frontier", "b04_history_pagination"):
        q = e._query_registry()[name](spark, sf)
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan, name
        specs = re.findall(r"windowspecdefinition\(([^,]+),", plan)
        for first_arg in specs:
            assert "ASC" not in first_arg and "DESC" not in first_arg, (
                f"{name}: unpartitioned window survives: {first_arg}"
            )
