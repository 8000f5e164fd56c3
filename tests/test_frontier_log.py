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
        "parent_job_id": None, "depth": 0, "score": 0.0, "max_depth": 1, "max_pages": 10,
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


# ---- LatestStateLog (extractions_latest, A12 incremental state) ----------------


def _ext_df(spark, rows):
    return spark.createDataFrame(rows, "url string, data_hash string, claim_pos long")


def test_latest_state_log_latest_wins_and_keys_semijoin(spark, tmp_path):
    from ares_spark.crawl.checkpoint import LatestStateLog, SnapshotStore

    log = LatestStateLog(
        SnapshotStore(tmp_path), "extractions_latest", ["url"],
        tiebreak_cols=["claim_pos"], compact_interval=2,
    )
    assert log.read_latest(spark, 5) is None  # empty log
    log.append_delta(_ext_df(spark, [("u1", "h1", 1), ("u2", "h2", 2)]), 0)
    log.append_delta(_ext_df(spark, [("u1", "h1b", 3)]), 1)
    got = {r.url: r.data_hash for r in log.read_latest(spark, 1).collect()}
    assert got == {"u1": "h1b", "u2": "h2"}
    # as-of semantics: upto generation 0 still sees the old hash
    asof = {r.url: r.data_hash for r in log.read_latest(spark, 0).collect()}
    assert asof == {"u1": "h1", "u2": "h2"}
    # keys semi-join restricts the resolve to requested urls
    keys = spark.createDataFrame([("u1",), ("u9",)], "url string")
    sub = {r.url: r.data_hash for r in log.read_latest(spark, 1, keys=keys).collect()}
    assert sub == {"u1": "h1b"}


def test_latest_state_log_within_gen_tiebreak(spark, tmp_path):
    from ares_spark.crawl.checkpoint import LatestStateLog, SnapshotStore

    log = LatestStateLog(
        SnapshotStore(tmp_path), "extractions_latest", ["url"],
        tiebreak_cols=["claim_pos"],
    )
    # two rows for one url in one generation: highest claim_pos wins
    log.append_delta(_ext_df(spark, [("u1", "early", 1), ("u1", "late", 7)]), 0)
    got = {r.url: r.data_hash for r in log.read_latest(spark, 0).collect()}
    assert got == {"u1": "late"}


def test_latest_state_log_compaction_keeps_one_base_of_history(spark, tmp_path):
    from ares_spark.crawl.checkpoint import LatestStateLog, SnapshotStore

    log = LatestStateLog(
        SnapshotStore(tmp_path), "extractions_latest", ["url"],
        tiebreak_cols=["claim_pos"], compact_interval=2,
    )
    for g in range(6):
        log.append_delta(_ext_df(spark, [("u1", f"h{g}", g), (f"v{g}", "x", g)]), g)
        log.maybe_compact(spark, g)  # fires at g=1,3,5
    got = {r.url: r.data_hash for r in log.read_latest(spark, 5).collect()}
    assert got["u1"] == "h5" and {f"v{g}" for g in range(6)} <= set(got)
    # crash-window read: resolve upto generation 4 must still work even
    # though compaction at g=5 just published base-g0006 (resume-at-g-1)
    asof4 = {r.url: r.data_hash for r in log.read_latest(spark, 4).collect()}
    assert asof4["u1"] == "h4"
    # old deltas beyond one base of history are gone
    import re
    deltas = sorted(p.name for p in (tmp_path / "extractions_latest").glob("batch-g*"))
    bases = sorted(p.name for p in (tmp_path / "extractions_latest").glob("base-g*"))
    assert len(bases) == 2 and len(deltas) <= 4, (bases, deltas)


# ---- append-log run compaction (url_seen/visits/extractions) -------------------


def test_compact_log_bounds_dirs_and_preserves_rows(spark, tmp_path):
    from ares_spark.crawl.checkpoint import SnapshotStore

    store = SnapshotStore(tmp_path)
    for g in range(10):
        store.append_batch(
            spark.createDataFrame([(g, f"row{g}")], "generation int, v string"),
            "url_seen", g,
        )
    # nothing to do under the cap
    assert store.compact_log(spark, "url_seen", 9, max_runs=12) is False
    assert store.compact_log(spark, "url_seen", 9, max_runs=4) is True
    dirs = store._log_dirs("url_seen")
    assert len(dirs) <= 4
    got = sorted(r.v for r in store.read_all_batches(spark, "url_seen").collect())
    assert got == [f"row{g}" for g in range(10)]
    # upto filtering: dir-level hi <= upto (merged runs cover only <= upto
    # generations because compaction is capped at the published manifest)
    upto = store.read_all_batches(spark, "url_seen", 9)
    assert upto.count() == 10


def test_compact_log_never_merges_past_published_manifest(spark, tmp_path):
    from ares_spark.crawl.checkpoint import SnapshotStore

    store = SnapshotStore(tmp_path)
    for g in range(6):
        store.append_batch(
            spark.createDataFrame([(g,)], "generation int"), "visits", g
        )
    store.compact_log(spark, "visits", 4, max_runs=1)  # gen 5 unpublished
    names = {p.name for _, _, p in store._log_dirs("visits")}
    assert "batch-g0005" in names  # still un-merged -> overwrite-idempotent
    assert store.read_all_batches(spark, "visits").count() == 6
    # a re-run of generation 5 overwrites its dir without duplicating rows
    store.append_batch(spark.createDataFrame([(5,)], "generation int"), "visits", 5)
    assert store.read_all_batches(spark, "visits").count() == 6


@pytest.mark.parametrize("seed", [1, 7, 23])
def test_latest_state_log_random_walk_vs_model(spark, tmp_path, seed):
    """Model-based check: a random sequence of (append delta, compact,
    read-asof) operations must always agree with a plain python dict
    replay — the state log's merge-on-read + compaction + history window
    can never change WHAT is resolved, only how it is stored."""
    import random

    from ares_spark.crawl.checkpoint import LatestStateLog, SnapshotStore

    rng = random.Random(seed)
    log = LatestStateLog(
        SnapshotStore(tmp_path / f"w{seed}"), "state", ["url"],
        tiebreak_cols=["claim_pos"], compact_interval=rng.choice([2, 3]),
    )
    model: dict[str, str] = {}
    history = []  # model snapshot after each generation
    for g in range(10):
        n = rng.randint(0, 4)
        rows = []
        for i in range(n):
            u = f"u{rng.randint(0, 6)}"
            rows.append((u, f"h{g}-{i}", i))
        # within-gen dup handling: max claim_pos wins — apply in order
        for u, h, _ in rows:
            model[u] = h
        log.append_delta(_ext_df(spark, rows), g)
        log.maybe_compact(spark, g)
        history.append(dict(model))
        got = {r.url: r.data_hash for r in log.read_latest(spark, g).collect()}
        assert got == model, (seed, g)
    # the crash-resume window: the generation-back as-of view must still
    # resolve exactly (compaction keeps one base of history for this;
    # older as-of views are dropped by design)
    asof = {r.url: r.data_hash for r in log.read_latest(spark, 8).collect()}
    assert asof == history[8]
    final = {r.url: r.data_hash for r in log.read_latest(spark, 9).collect()}
    assert final == history[-1]


@pytest.mark.parametrize("seed", [3, 11])
def test_compact_log_random_walk_preserves_multiset(spark, tmp_path, seed):
    """Append/compact in random interleavings: the union read equals the
    exact multiset of appended rows at every step, and dirs stay bounded."""
    import random

    from ares_spark.crawl.checkpoint import SnapshotStore

    rng = random.Random(seed)
    store = SnapshotStore(tmp_path / f"c{seed}")
    expect: list[str] = []
    for g in range(14):
        rows = [(g, f"r{g}-{i}") for i in range(rng.randint(0, 3))]
        expect.extend(v for _, v in rows)
        store.append_batch(
            spark.createDataFrame(rows or [(g, None)], "generation int, v string")
            .filter("v is not null"),
            "log", g,
        )
        if rng.random() < 0.5:
            store.compact_log(spark, "log", g - 1, max_runs=rng.choice([2, 4]))
            assert len([d for d in store._log_dirs("log") if d[1] <= g - 1]) <= 4
        df = store.read_all_batches(spark, "log")
        got = sorted(r.v for r in df.collect()) if df is not None else []
        assert got == sorted(expect), (seed, g)


def test_compact_log_crash_mid_merge_never_double_reads(spark, tmp_path):
    """Simulated crash between 'write merged run' and 'delete sources':
    both the run dir and its source batch dirs exist on disk — reads must
    skip the covered sources, and the next compaction cleans up."""
    from ares_spark.crawl.checkpoint import SnapshotStore

    store = SnapshotStore(tmp_path)
    for g in range(4):
        store.append_batch(
            spark.createDataFrame([(g, f"row{g}")], "generation int, v string"),
            "log", g,
        )
    # hand-write a merged run covering g0-g1 WITHOUT deleting the sources
    src = [str(tmp_path / "log" / f"batch-g000{g}") for g in (0, 1)]
    spark.read.parquet(*src).write.mode("overwrite").parquet(
        str(tmp_path / "log" / "run-g0000-g0001")
    )
    got = sorted(r.v for r in store.read_all_batches(spark, "log").collect())
    assert got == ["row0", "row1", "row2", "row3"]  # no duplicates
    live = {p.name for _, _, p in store._log_dirs("log")}
    assert "run-g0000-g0001" in live
    assert "batch-g0000" not in live and "batch-g0001" not in live
    # compaction over the leftover state still converges and stays exact
    store.compact_log(spark, "log", 3, max_runs=1)
    got2 = sorted(r.v for r in store.read_all_batches(spark, "log").collect())
    assert got2 == got


def test_compact_log_crash_during_merge_write_keeps_sources(spark, tmp_path):
    """Simulated crash DURING the merged-run parquet write (mid job
    commit): the run dir exists but has no _SUCCESS marker and is missing
    a part file. It must be treated as dead — the intact source batch
    dirs stay live, no rows are lost, and a later compaction overwrites
    the partial dir."""
    from ares_spark.crawl.checkpoint import SnapshotStore

    store = SnapshotStore(tmp_path)
    for g in range(4):
        store.append_batch(
            spark.createDataFrame([(g, f"row{g}")], "generation int, v string"),
            "log", g,
        )
    # hand-write the merged run, then simulate the crash: drop _SUCCESS
    # and one data file
    src = [str(tmp_path / "log" / f"batch-g000{g}") for g in (0, 1)]
    run = tmp_path / "log" / "run-g0000-g0001"
    spark.read.parquet(*src).write.mode("overwrite").parquet(str(run))
    (run / "_SUCCESS").unlink()
    next(run.glob("part-*")).unlink()
    live = {p.name for _, _, p in store._log_dirs("log")}
    assert "run-g0000-g0001" not in live
    assert "batch-g0000" in live and "batch-g0001" in live
    got = sorted(r.v for r in store.read_all_batches(spark, "log").collect())
    assert got == ["row0", "row1", "row2", "row3"]  # nothing lost
    # recovery: compaction overwrites the partial dir and stays exact
    store.compact_log(spark, "log", 3, max_runs=1)
    got2 = sorted(r.v for r in store.read_all_batches(spark, "log").collect())
    assert got2 == got


def test_latest_state_log_partial_base_is_ignored(spark, tmp_path):
    """A base-g{N} left by a crash mid-write (no _SUCCESS) must not
    become bases[-1] in read_latest — it would shadow all older history
    and corrupt change detection."""
    from ares_spark.crawl.checkpoint import LatestStateLog, SnapshotStore

    log = LatestStateLog(SnapshotStore(tmp_path), "st", ["k"])
    log.write_base(spark.createDataFrame([("a", 1), ("b", 1)], "k string, v int"), 0)
    log.append_delta(spark.createDataFrame([("a", 2)], "k string, v int"), 0)
    # crash mid-compaction: partial base-g0002 (missing _SUCCESS + a part)
    base2 = log.dir / "base-g0002"
    spark.createDataFrame([("a", 99)], "k string, v int").withColumn(
        "state_gen", F.lit(1)
    ).write.parquet(str(base2))
    (base2 / "_SUCCESS").unlink()
    next(base2.glob("part-*")).unlink()
    got = {r.k: r.v for r in log.read_latest(spark, 1).collect()}
    assert got == {"a": 2, "b": 1}  # resolved from base-g0000 + delta
    # re-running the compaction overwrites the partial dir cleanly
    log.write_base(log.read_latest(spark, 1), 2)
    got2 = {r.k: r.v for r in log.read_latest(spark, 2).collect()}
    assert got2 == got


def test_frontier_resume_backfills_missing_score_column(spark, tmp_path):
    """Checkpoints written before the frontier had a 'score' column must
    still resume: read_live/read_full backfill score=0.0 instead of
    failing the spider's unconditional select, including the mixed case
    (old score-less base + new delta that has the column)."""
    flog = FrontierLog(SnapshotStore(tmp_path), compact_interval=8)
    old = _df(spark, [_row("a"), _row("b")]).drop("score")  # pre-score era
    flog.write_base(old, 0)
    live = flog.read_live(spark, 0)
    assert live.select("score").collect()[0].score == 0.0
    # new code appends a delta WITH score; mixed read still resolves
    flog.append_delta(_df(spark, [_row("a", status="completed"),
                                  _row("c", seq=2)]), 0)
    got = {r.job_id: r.score for r in flog.read_live(spark, 0).collect()}
    assert got == {"b": 0.0, "c": 0.0}
    full = {r.job_id: r.status for r in flog.read_full(spark, 0).collect()}
    assert full == {"a": "completed", "b": "pending", "c": "pending"}


def test_read_full_latest_terminal_after_cancel_and_reset(spark, tmp_path):
    """Cancel/reset (job_repository.rs:230-319) make terminal states
    non-absorbing: read_full must show only the LATEST terminal row per
    job, and none at all once the job is live (pending) again."""
    from ares_spark.crawl.frontier import cancel_jobs, reset_jobs

    flog = FrontierLog(SnapshotStore(tmp_path))
    flog.write_base(_df(spark, [_row("a"), _row("b"), _row("c")]), 0)
    # g0: a fails; g1: cancel b; g2: reset a and b back to pending
    flog.append_delta(_df(spark, [_row("a", status="failed")]), 0)
    flog.append_delta(cancel_jobs(flog.read_full(spark, 0).filter("job_id = 'b'")), 1)
    full1 = {r.job_id: r.status for r in flog.read_full(spark, 1).collect()}
    assert full1 == {"a": "failed", "b": "cancelled", "c": "pending"}
    # cancel refuses completed/cancelled rows; reset refuses pending ones
    assert cancel_jobs(flog.read_full(spark, 1).filter("job_id = 'b'")).count() == 0
    assert reset_jobs(flog.read_full(spark, 1).filter("job_id = 'c'")).count() == 0
    resets = reset_jobs(flog.read_full(spark, 1).filter("job_id in ('a','b')"))
    assert resets.count() == 2
    flog.append_delta(resets, 2)
    full2 = {r.job_id: (r.status, r.retry_count) for r in flog.read_full(spark, 2).collect()}
    assert full2 == {"a": ("pending", 0), "b": ("pending", 0), "c": ("pending", 0)}
    live = {r.job_id for r in flog.read_live(spark, 2).collect()}
    assert live == {"a", "b", "c"}  # reset rows are claimable again


def test_committed_falls_back_when_success_markers_disabled(spark, tmp_path):
    """r5 ADVICE fix: managed clusters often set
    mapreduce.fileoutputcommitter.marksuccessfuljobs=false, so no dir ever
    gets a _SUCCESS marker; _committed must then fall back to dir-exists
    instead of making every valid checkpoint invisible on resume."""
    from ares_spark.crawl import checkpoint as cp

    d = tmp_path / "nomarker"
    d.mkdir()
    (d / "part-0.parquet").write_bytes(b"x")
    assert not cp._committed(d)  # markers enabled (default): marker required

    conf = spark.sparkContext._jsc.hadoopConfiguration()
    prev = conf.get("mapreduce.fileoutputcommitter.marksuccessfuljobs", "true")
    conf.set("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
    cp._MARKER_CACHE.clear()
    try:
        assert cp._committed(d)  # fallback: dir existence is the signal
        assert not cp._committed(tmp_path / "absent")
    finally:
        conf.set("mapreduce.fileoutputcommitter.marksuccessfuljobs", prev)
        cp._MARKER_CACHE.clear()
