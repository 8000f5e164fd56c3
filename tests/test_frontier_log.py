"""FrontierLog unit semantics + the bucketed fetch-join plan evidence."""

import pytest
from pyspark.sql import functions as F

from ares_spark.crawl.checkpoint import FrontierLog, SnapshotStore
from ares_spark.crawl.frontier import FRONTIER_SCHEMA


def _row(job_id, status="pending", seq=0, url=None):
    return {
        "job_id": job_id, "url": url or f"https://x.example.com/{job_id}",
        "url_hash": hash(job_id) % (1 << 40), "host": "x.example.com",
        "host_shard": 1, "schema_name": "blog", "status": status,
        "retry_count": 0, "max_retries": 3, "next_retry_at": None,
        "created_seq": seq, "created_at": 0.0, "crawl_session_id": "s",
        "parent_job_id": None, "depth": 0, "max_depth": 1, "max_pages": 10,
        "allowed_domains": [], "generation": 0, "error": None,
    }


def _df(spark, rows):
    import pandas as pd

    cols = [f.name for f in FRONTIER_SCHEMA.fields]
    return spark.createDataFrame(pd.DataFrame(rows, columns=cols), FRONTIER_SCHEMA)


def test_frontier_log_latest_wins_and_tombstones(spark, tmp_path):
    flog = FrontierLog(SnapshotStore(tmp_path), compact_interval=2)
    flog.write_base(_df(spark, [_row("a"), _row("b")]), 0)
    # gen 0: a completes (terminal = tombstone for the live view), c enqueued
    flog.append_delta(_df(spark, [_row("a", status="completed"), _row("c", seq=2)]), 0)
    live = {r.job_id: r.status for r in flog.read_live(spark, 0).collect()}
    assert live == {"b": "pending", "c": "pending"}
    full = {r.job_id: r.status for r in flog.read_full(spark, 0).collect()}
    assert full == {"a": "completed", "b": "pending", "c": "pending"}
    # gen 1: b fails permanently; compaction folds into a new base
    flog.append_delta(_df(spark, [_row("b", status="failed")]), 1)
    assert flog.maybe_compact(spark, 1) is True
    assert flog._base_gens() == [0, 2]
    live2 = {r.job_id for r in flog.read_live(spark, 1).collect()}
    assert live2 == {"c"}
    # post-compaction reads resolve from the new base; terminals survive
    # in the full view via the delta log
    full2 = {r.job_id: r.status for r in flog.read_full(spark, 1).collect()}
    assert full2 == {"a": "completed", "b": "failed", "c": "pending"}
    # reading before any base errors loudly
    with pytest.raises(FileNotFoundError):
        FrontierLog(SnapshotStore(tmp_path / "empty")).read_live(spark, 0)


def test_bucketed_pages_fetch_join_avoids_payload_shuffle(spark, tmp_path):
    """SCALE.md's core claim, executable: with the pages table bucketed by
    url, the fetch join shuffles only the (slim) frontier side — the fat
    html payload side has NO Exchange. A plain parquet pages table needs
    one more Exchange (the payload shuffle)."""
    from ares_spark.io.synth import synth_pages

    pages = synth_pages(spark, n_pages=1000, n_hosts=10)
    batch = pages.select("url").sample(0.5, seed=1)
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        spark.sql("drop table if exists pages_bucketed_t")
        pages.write.bucketBy(8, "url").sortBy("url").mode("overwrite").saveAsTable(
            "pages_bucketed_t"
        )

        def n_exchanges(right):
            plan = (
                batch.join(right, "url").select("url", "html")
                ._jdf.queryExecution().executedPlan().toString()
            )
            return sum("Exchange" in line for line in plan.splitlines())

        n_bucketed = n_exchanges(spark.table("pages_bucketed_t"))
        n_plain = n_exchanges(pages)
        assert n_bucketed == n_plain - 1, (n_bucketed, n_plain)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql("drop table if exists pages_bucketed_t")
