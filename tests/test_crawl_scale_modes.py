"""M4 scale machinery: host-round-robin ordering, per-host politeness
budgets, crawl-delay budgets, Bloom-tier seen filtering, breaker skips."""

import pytest
from pyspark.sql import functions as F

from ares_spark.crawl import CrawlConfig, run_crawl
from ares_spark.crawl.checkpoint import FrontierLog, SnapshotStore
from ares_spark.crawl.frontier import order_host_rr
from ares_spark.crawl.seen import filter_unseen
from ares_spark.io.synth import EPOCH, PAGES_SCHEMA


def _mk_pages(spark, spec):
    """spec: {url: [linked urls]} — minimal pages with those links."""
    rows = []
    for url, links in spec.items():
        body = "".join(f'<a href="{l}">x</a>' for l in links)
        rows.append((url, EPOCH, f"<html><body>{body}</body></html>".encode(), None, "en"))
    return spark.createDataFrame(rows, PAGES_SCHEMA)


def test_order_host_rr_interleaves_hosts(spark):
    rows = [
        ("a.com", 0, None, 0), ("a.com", 1, None, 0), ("a.com", 2, None, 0),
        ("b.com", 3, None, 0), ("b.com", 4, None, 0),
        ("c.com", 5, None, 0),
    ]
    df = spark.createDataFrame(
        rows, "host string, created_seq long, next_retry_at double, depth int"
    )
    got = [
        (r.host, r.created_seq)
        for r in order_host_rr(df).orderBy("claim_pos").collect()
    ]
    # round 1: one per host (a,b,c), round 2: (a,b), round 3: (a)
    assert got == [
        ("a.com", 0), ("b.com", 3), ("c.com", 5),
        ("a.com", 1), ("b.com", 4), ("a.com", 2),
    ]


def test_per_host_budget_spreads_over_generations(spark, tmp_path_factory):
    """per_host_budget=1: one fetch per host per generation — the hot host's
    4 pages take 4 generations instead of 1 (politeness window semantics)."""
    host = "https://hot.example.com"
    spec = {
        f"{host}/": [f"{host}/p1", f"{host}/p2", f"{host}/p3"],
        f"{host}/p1": [], f"{host}/p2": [], f"{host}/p3": [],
    }
    pages = _mk_pages(spark, spec)
    ckpt = str(tmp_path_factory.mktemp("crawl_budget"))
    summary = run_crawl(
        spark, pages, [f"{host}/"], ckpt,
        CrawlConfig(max_depth=1, per_host_budget=1, use_bloom=False, max_generations=10),
    )
    # 4 pages × budget 1/host/gen → 4 generations of visits
    visits = SnapshotStore(ckpt).read_all_batches(spark, "visits")
    per_gen = {r.generation: r.n for r in
               visits.groupBy("generation").agg(F.count("*").alias("n")).collect()}
    assert all(n == 1 for n in per_gen.values())
    assert len(per_gen) == 4


def test_crawl_delay_budget_from_robots(spark, tmp_path_factory):
    """Crawl-delay 30 with a 60s window → budget 2/host/generation."""
    host = "https://slow.example.com"
    spec = {
        f"{host}/": [f"{host}/a", f"{host}/b", f"{host}/c", f"{host}/d"],
        f"{host}/a": [], f"{host}/b": [], f"{host}/c": [], f"{host}/d": [],
    }
    pages = _mk_pages(spark, spec)
    ckpt = str(tmp_path_factory.mktemp("crawl_delay"))
    run_crawl(
        spark, pages, [f"{host}/"], ckpt,
        CrawlConfig(max_depth=1, politeness_window_s=60.0, use_bloom=False,
                    max_generations=10),
        robots_raw={"slow.example.com": "User-agent: *\nCrawl-delay: 30\n"},
    )
    visits = SnapshotStore(ckpt).read_all_batches(spark, "visits")
    per_gen = [r.n for r in visits.groupBy("generation").agg(F.count("*").alias("n"))
               .orderBy("generation").collect()]
    assert max(per_gen) <= 2  # 60s window / 30s delay
    assert sum(per_gen) == 5  # all pages eventually visited


def test_crawl_delay_does_not_throttle_other_hosts(spark, tmp_path_factory):
    """A crawl-delay on ONE host must not cap the others: hosts missing
    from the budgets table get a NULL politeness budget (unlimited), not
    the greatest(1, floor(w/null))=1 collapse (greatest skips nulls) that
    would silently serialize every delay-less host to 1 fetch/generation
    the moment any robots corpus carries a Crawl-delay."""
    slow, fast = "https://slow.example.com", "https://fast.example.com"
    spec = {f"{slow}/": [f"{fast}/p{i}" for i in range(6)]}
    for i in range(6):
        spec[f"{fast}/p{i}"] = []
    pages = _mk_pages(spark, spec)
    ckpt = str(tmp_path_factory.mktemp("crawl_delay_mixed"))
    run_crawl(
        spark, pages, [f"{slow}/"], ckpt,
        CrawlConfig(max_depth=1, politeness_window_s=60.0, use_bloom=False,
                    max_generations=10,
                    allowed_domains=["slow.example.com", "fast.example.com"]),
        robots_raw={"slow.example.com": "User-agent: *\nCrawl-delay: 30\n"},
    )
    visits = SnapshotStore(ckpt).read_all_batches(spark, "visits")
    fast_gens = [
        r.generation
        for r in visits.filter(F.col("url").contains("fast")).collect()
    ]
    # all six fast-host pages fetch in ONE generation (no budget applies)
    assert len(fast_gens) == 6 and len(set(fast_gens)) == 1


def test_bloom_tier_matches_exact(spark, tmp_path_factory):
    """filter_unseen with the Bloom tier returns exactly the exact-path
    result (false positives rescued by the backstop join)."""
    from ares_spark.crawl.seen import host_shard_col, url_hash_col

    n = 20000
    seen = (
        spark.range(n)
        .select(
            F.concat(F.lit("https://h"), (F.col("id") % 37).cast("string"),
                     F.lit(".example.org/p"), F.col("id").cast("string")).alias("url")
        )
        .withColumn("url_hash", url_hash_col("url"))
        .withColumn("host", F.regexp_extract("url", r"https://([^/]+)/", 1))
        .withColumn("host_shard", host_shard_col("host"))
        .select("url_hash", "host_shard")
    )
    cand = (
        spark.range(n - 500, n + 500)  # 500 seen + 500 new
        .select(
            F.concat(F.lit("https://h"), (F.col("id") % 37).cast("string"),
                     F.lit(".example.org/p"), F.col("id").cast("string")).alias("url")
        )
        .withColumn("url_hash", url_hash_col("url"))
        .withColumn("host", F.regexp_extract("url", r"https://([^/]+)/", 1))
        .withColumn("host_shard", host_shard_col("host"))
    )
    exact = sorted(r.url for r in filter_unseen(cand, seen, use_bloom=False).collect())
    bloom = sorted(
        r.url
        for r in filter_unseen(cand, seen, spark=spark, use_bloom=True,
                               bloom_min_seen=1000).collect()
    )
    assert len(exact) == 500
    assert bloom == exact


def test_breaker_skips_then_recovers(spark, tmp_path_factory):
    """A host whose pages all 404 opens its breaker after the failure
    threshold; its retries are deferred while open, and the crawl still
    terminates with the host's jobs failed."""
    host = "https://dead.example.com"
    ok = "https://fine.example.com"
    spec = {f"{ok}/": [f"{ok}/a", f"{host}/x1", f"{host}/x2"], f"{ok}/a": []}
    pages = _mk_pages(spark, spec)
    ckpt = str(tmp_path_factory.mktemp("crawl_brk"))
    summary = run_crawl(
        spark, pages, [f"{ok}/"], ckpt,
        CrawlConfig(max_depth=1, max_retries=3, use_bloom=False, max_generations=30,
                    allowed_domains=["fine.example.com", "dead.example.com"],
                    breaker={"failure_threshold": 2}),
    )
    frontier = FrontierLog(SnapshotStore(ckpt)).read_full(spark, summary["generation"])
    rows = {r.url: r for r in frontier.collect()}
    assert rows[f"{ok}/a"].status == "completed"
    assert rows[f"{host}/x1"].status == "failed"
    assert rows[f"{host}/x2"].status == "failed"
    breaker = summary["breaker"]["hosts"].get("dead.example.com")
    assert breaker is not None and breaker["consecutive_failures"] >= 2


def test_agent_specific_robots_group(spark, tmp_path_factory):
    """The crawl honors the group matching ITS configured user-agent
    (robots.rs:84-88 passes the client UA to the matcher)."""
    host = "https://ua.example.com"
    spec = {f"{host}/": [f"{host}/a", f"{host}/b"], f"{host}/a": [], f"{host}/b": []}
    pages = _mk_pages(spark, spec)
    robots = {"ua.example.com":
              "User-agent: aresbot\nDisallow: /b\n\nUser-agent: *\nDisallow:\n"}
    from ares_spark.crawl import CrawlConfig, run_crawl
    from ares_spark.crawl.checkpoint import FrontierLog, SnapshotStore

    ck = str(tmp_path_factory.mktemp("crawl_ua"))
    run_crawl(spark, pages, [f"{host}/"], ck,
              CrawlConfig(max_depth=1, use_bloom=False, user_agent="AresBot/1.0"),
              robots_raw=robots)
    seen = sorted(r.url for r in
                  SnapshotStore(ck).read_all_batches(spark, "url_seen").collect())
    assert seen == [f"{host}/a"]  # /b blocked for aresbot specifically

    ck2 = str(tmp_path_factory.mktemp("crawl_ua2"))
    run_crawl(spark, pages, [f"{host}/"], ck2,
              CrawlConfig(max_depth=1, use_bloom=False, user_agent="otherbot"),
              robots_raw=robots)
    seen2 = sorted(r.url for r in
                   SnapshotStore(ck2).read_all_batches(spark, "url_seen").collect())
    assert seen2 == [f"{host}/a", f"{host}/b"]  # * group allows all


def test_politeness_jitter_deterministic(spark, tmp_path_factory):
    """Seeded jitter (throttle.rs per-wait U[0,jitter] at batch
    granularity): tightens budgets deterministically — same seed, same
    schedule; zero jitter reproduces the plain window/delay budget."""
    from pyspark.sql import functions as F

    from ares_spark.crawl.loop import politeness_budget_col

    df = spark.createDataFrame(
        [("a.example.com", 10.0), ("b.example.com", 10.0)], "host string, crawl_delay double"
    )
    plain = {r.host: r.b for r in df.select(
        "host", politeness_budget_col("crawl_delay", 60.0).alias("b")).collect()}
    assert plain == {"a.example.com": 6, "b.example.com": 6}
    j1 = {r.host: r.b for r in df.select(
        "host", politeness_budget_col("crawl_delay", 60.0, jitter_ms=500, generation=3).alias("b")).collect()}
    j2 = {r.host: r.b for r in df.select(
        "host", politeness_budget_col("crawl_delay", 60.0, jitter_ms=500, generation=3).alias("b")).collect()}
    assert j1 == j2  # replay-stable
    assert all(1 <= b <= 6 for b in j1.values())  # jitter only tightens
    # a different generation re-rolls (at least for some host/seed combos
    # the roll differs; equality of ALL budgets across 8 gens would mean
    # the generation is not in the hash)
    # boundary-straddling delay: floor(60/(9.8+x)) is 6 for x < ~0.2 and 5
    # above — across 8 generations the seeded roll must cross it
    bdf = spark.createDataFrame(
        [("a.example.com", 9.8), ("b.example.com", 9.8)], "host string, crawl_delay double"
    )
    rolls = set()
    for g in range(8):
        rolls.add(tuple(sorted(
            (r.host, r.b) for r in bdf.select(
                "host", politeness_budget_col("crawl_delay", 60.0, jitter_ms=500, generation=g).alias("b")
            ).collect())))
    assert len(rolls) > 1


def test_order_host_rr_score_priority(spark):
    """north_rule depth/SCORE ordering: within a host round, higher score
    claims first; depth still dominates score; scoreless input unchanged."""
    rows = [
        # host, seq, retry, depth, score
        ("a.com", 0, None, 1, 0.2), ("a.com", 1, None, 1, 0.9),
        ("a.com", 2, None, 0, 0.1),  # lower depth beats any score
        ("b.com", 3, None, 1, 0.5),
    ]
    df = spark.createDataFrame(
        rows,
        "host string, created_seq long, next_retry_at double, depth int, score double",
    )
    got = [(r.host, r.created_seq)
           for r in order_host_rr(df).orderBy("claim_pos").collect()]
    assert got == [
        ("a.com", 2), ("b.com", 3),   # round 1: depth-0 wins a.com
        ("a.com", 1),                 # round 2: score 0.9 before 0.2
        ("a.com", 0),
    ]


def test_crawl_parent_decay_scoring(spark, tmp_path):
    """score_mode='parent_decay': seeds carry 1.0 and children inherit
    parent x decay — the frontier rows the loop persists show it."""
    from ares_spark.crawl import CrawlConfig, run_crawl
    from ares_spark.crawl.checkpoint import FrontierLog, SnapshotStore

    pages = _mk_pages(spark, {
        "https://s.org/": ["https://s.org/a"],
        "https://s.org/a": ["https://s.org/b"],
        "https://s.org/b": [],
    })
    cfg = CrawlConfig(max_depth=3, max_pages=10, max_retries=0,
                      allowed_domains=["s.org"], max_generations=6,
                      ordering="host_rr", score_mode="parent_decay")
    run_crawl(spark, pages, ["https://s.org/"], str(tmp_path / "ck"), cfg,
              session_id="s")
    flog = FrontierLog(SnapshotStore(str(tmp_path / "ck")))
    g = SnapshotStore(str(tmp_path / "ck")).latest_generation()
    rows = {r.url: r.score for r in flog.read_full(spark, g).collect()}
    assert rows["https://s.org/"] == 1.0
    assert abs(rows["https://s.org/a"] - 0.85) < 1e-9
    assert abs(rows["https://s.org/b"] - 0.85 * 0.85) < 1e-9
