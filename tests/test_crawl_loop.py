"""M3: BFS crawl loop — trace parity with the reference's serial worker.

The expected trace is hand-derived from the reference semantics on its own
crawl fixture (/root/reference/bench/fixtures/crawl/): single worker, FIFO
claim by (next_retry_at NULLS FIRST, created_at) (job_repository.rs:161),
links emitted sorted (link_discovery.rs:59-60), children only while
depth < max_depth (worker.rs:286-289), seed never marked visited
(main.rs:784-798), seen-set insert for discovered children only
(worker.rs:356-387).
"""

import pytest
from pyspark.sql import functions as F

from ares_spark.crawl import CrawlConfig, resume_crawl, run_crawl
from ares_spark.crawl.checkpoint import FrontierLog, SnapshotStore
from ares_spark.io.synth import CRAWL_SEED_URL, crawl_site_pages

SEED = CRAWL_SEED_URL
POSTS = [
    "https://blog.example.com/post-backpressure.html",
    "https://blog.example.com/post-ownership.html",
]


def _visits(spark, ckpt):
    df = SnapshotStore(ckpt).read_all_batches(spark, "visits")
    return [(r.visit_pos, r.url, r.outcome) for r in df.orderBy("visit_pos").collect()]


@pytest.fixture(scope="module")
def site(spark):
    return crawl_site_pages(spark).cache()


def test_depth1_trace(spark, site, tmp_path_factory):
    """Reference trace, max_depth=1: visit index then the two posts
    (alphabetical), tag links NOT followed (depth cap), seen set = posts."""
    ckpt = str(tmp_path_factory.mktemp("crawl_d1"))
    summary = run_crawl(
        spark, site, [SEED], ckpt,
        CrawlConfig(schema_spec="blog@latest", max_depth=1, max_pages=100, use_bloom=False),
    )
    visits = _visits(spark, ckpt)
    assert [(v[0], v[1]) for v in visits] == [(0, SEED), (1, POSTS[0]), (2, POSTS[1])]
    assert all(v[2] == "completed" for v in visits)
    seen = SnapshotStore(ckpt).read_all_batches(spark, "url_seen")
    assert sorted(r.url for r in seen.collect()) == POSTS  # seed NOT in seen
    ex = SnapshotStore(ckpt).read_all_batches(spark, "extractions")
    # validation gating (A9): the two posts satisfy the blog schema; the
    # index page (no author/publish_date/hero_image) is gated out and
    # never persisted (scrape.rs:576-594)
    assert sorted(r.url for r in ex.collect()) == POSTS


def test_depth2_retries_tag_pages(spark, site, tmp_path_factory):
    """max_depth=2: the posts' /tag/* links (same host) are enqueued, miss
    the pages table (fetch error), retry with backoff, end failed after
    max_retries."""
    ckpt = str(tmp_path_factory.mktemp("crawl_d2"))
    summary = run_crawl(
        spark, site, [SEED], ckpt,
        CrawlConfig(schema_spec="blog@latest", max_depth=2, max_pages=100,
                    max_retries=2, use_bloom=False, max_generations=20,
                    # this test pins RETRY scheduling; keep the per-host
                    # breaker out of the way (5 same-host fetch errors would
                    # open it and stretch the retries over its recovery
                    # windows — breaker semantics are pinned in
                    # test_crawl_scale_modes)
                    breaker={"failure_threshold": 1_000}),
    )
    store = SnapshotStore(ckpt)
    frontier = FrontierLog(store).read_full(spark, summary["generation"])
    rows = {r.url: r for r in frontier.collect()}
    tag_urls = [u for u in rows if "/tag/" in u]
    assert tag_urls, "tag pages should have been enqueued at depth 2"
    for u in tag_urls:
        assert rows[u].status == "failed"
        assert rows[u].retry_count == 2
        assert rows[u].error.startswith("fetch_error")
    # completed pages stayed completed
    assert rows[SEED].status == "completed"
    # can_retry() gates on the OLD retry_count (job.rs:125-127), so
    # max_retries=2 means initial attempt + 2 retries = 3 claims total
    visits = _visits(spark, ckpt)
    tag_visits = [v for v in visits if "/tag/" in v[1]]
    assert len(tag_visits) == len(tag_urls) * 3


def test_max_pages_budget(spark, site, tmp_path_factory):
    """max_pages=1: only one child may ever be enqueued (visited-count cap,
    worker.rs:303-325), chosen deterministically (first in claim order)."""
    ckpt = str(tmp_path_factory.mktemp("crawl_mp"))
    summary = run_crawl(
        spark, site, [SEED], ckpt,
        CrawlConfig(schema_spec="blog@latest", max_depth=1, max_pages=1, use_bloom=False),
    )
    seen = SnapshotStore(ckpt).read_all_batches(spark, "url_seen")
    assert [r.url for r in seen.collect()] == [POSTS[0]]
    visits = _visits(spark, ckpt)
    assert [v[1] for v in visits] == [SEED, POSTS[0]]


def test_domain_filter_default_seed_host(spark, site, tmp_path_factory):
    """Cross-domain links are dropped when allowed_domains defaults to the
    seed host (worker.rs:293-301)."""
    import datetime as dt

    from ares_spark.io.synth import EPOCH, PAGES_SCHEMA

    html = (
        b'<html><head><title>x</title></head><body>'
        b'<a href="https://other.example.net/a">ext</a>'
        b'<a href="/local">in</a></body></html>'
    )
    pages = spark.createDataFrame(
        [("https://seed.example.com/", EPOCH, html, None, "en")], PAGES_SCHEMA
    )
    ckpt = str(tmp_path_factory.mktemp("crawl_dom"))
    summary = run_crawl(
        spark, pages, ["https://seed.example.com/"], ckpt,
        CrawlConfig(schema_spec="blog@latest", max_depth=1, max_retries=1,
                    use_bloom=False, max_generations=10),
    )
    frontier = FrontierLog(SnapshotStore(ckpt)).read_full(spark, summary["generation"])
    urls = [r.url for r in frontier.collect()]
    assert "https://seed.example.com/local" in urls
    assert not any("other.example.net" in u for u in urls)


def test_robots_filtering(spark, site, tmp_path_factory):
    """Links disallowed by the host's robots.txt are never enqueued (A5)."""
    robots = {"blog.example.com": "User-agent: *\nDisallow: /post-ownership.html\n"}
    ckpt = str(tmp_path_factory.mktemp("crawl_rb"))
    summary = run_crawl(
        spark, site, [SEED], ckpt,
        CrawlConfig(schema_spec="blog@latest", max_depth=1, use_bloom=False),
        robots_raw=robots,
    )
    seen = SnapshotStore(ckpt).read_all_batches(spark, "url_seen")
    assert [r.url for r in seen.collect()] == [POSTS[0]]


def test_seed_requeue_quirk(spark, tmp_path_factory):
    """A child page linking back to the seed re-enqueues it ONCE (the seed
    is never marked visited — main.rs:784-798 / worker.rs:356-387)."""
    import datetime as dt

    from ares_spark.io.synth import EPOCH, PAGES_SCHEMA

    seed_html = b'<html><body><a href="/child">c</a></body></html>'
    child_html = b'<html><body><a href="/">back</a><a href="/child">self</a></body></html>'
    pages = spark.createDataFrame(
        [
            ("https://q.example.com/", EPOCH, seed_html, None, "en"),
            ("https://q.example.com/child", EPOCH, child_html, None, "en"),
        ],
        PAGES_SCHEMA,
    )
    ckpt = str(tmp_path_factory.mktemp("crawl_q"))
    run_crawl(
        spark, pages, ["https://q.example.com/"], ckpt,
        CrawlConfig(schema_spec="blog@latest", max_depth=3, use_bloom=False,
                    max_generations=10),
    )
    visits = _visits(spark, ckpt)
    seed_visits = [v for v in visits if v[1] == "https://q.example.com/"]
    child_visits = [v for v in visits if v[1].endswith("/child")]
    assert len(seed_visits) == 2  # original + re-enqueued once
    assert len(child_visits) == 1  # child IS in the seen set → only once


def test_resume_mid_crawl(spark, site, tmp_path_factory):
    """Kill after generation 0, resume: final state identical to an
    uninterrupted run (north_rule resumability)."""
    cfg = CrawlConfig(schema_spec="blog@latest", max_depth=2, max_retries=1,
                      use_bloom=False, max_generations=20)
    full_ckpt = str(tmp_path_factory.mktemp("crawl_full"))
    full = run_crawl(spark, site, [SEED], full_ckpt, cfg, session_id="fixed-session")

    part_ckpt = str(tmp_path_factory.mktemp("crawl_part"))
    cfg1 = CrawlConfig(**{**cfg.__dict__, "max_generations": 1})
    run_crawl(spark, site, [SEED], part_ckpt, cfg1, session_id="fixed-session")
    # patch the stored config back to the full horizon, then resume
    import json
    from pathlib import Path

    cfg_path = Path(part_ckpt) / "config.json"
    meta = json.loads(cfg_path.read_text())
    meta["cfg"]["max_generations"] = 20
    cfg_path.write_text(json.dumps(meta))
    resumed = resume_crawl(spark, site, part_ckpt)

    assert resumed["generation"] == full["generation"]
    f_full = FrontierLog(SnapshotStore(full_ckpt)).read_full(spark, full["generation"])
    f_res = FrontierLog(SnapshotStore(part_ckpt)).read_full(spark, resumed["generation"])
    key = lambda r: (r.url, r.status, r.retry_count, r.created_seq)
    assert sorted(map(key, f_full.collect())) == sorted(map(key, f_res.collect()))
    # visit logs identical too
    assert _visits(spark, full_ckpt) == _visits(spark, part_ckpt)


def test_change_detection_on_requeued_seed(spark, tmp_path_factory):
    """A12 in the loop: the re-enqueued seed is extracted twice with the
    same content → second extraction has changed=False; first visits of
    every url are changed=True."""
    from ares_spark.io.synth import EPOCH, PAGES_SCHEMA

    seed_html = (b'<html><head><title>Seed</title>'
                 b'<link rel="canonical" href="https://cd.example.com/">'
                 b'<meta name="description" content="d">'
                 b'</head><body><h1>Seed</h1><p>seed body text</p>'
                 b'<a href="/child">c</a></body></html>')
    child_html = (b'<html><head><title>Child</title>'
                  b'<link rel="canonical" href="https://cd.example.com/child">'
                  b'<meta name="description" content="e">'
                  b'</head><body><h1>Child</h1><p>child body text</p>'
                  b'<a href="/">back</a></body></html>')
    pages = spark.createDataFrame(
        [("https://cd.example.com/", EPOCH, seed_html, None, "en"),
         ("https://cd.example.com/child", EPOCH, child_html, None, "en")],
        PAGES_SCHEMA,
    )
    ckpt = str(tmp_path_factory.mktemp("crawl_cd"))
    run_crawl(spark, pages, ["https://cd.example.com/"], ckpt,
              CrawlConfig(schema_spec="product", max_depth=3, use_bloom=False,
                          max_generations=10))
    ex = SnapshotStore(ckpt).read_all_batches(spark, "extractions")
    rows = sorted(
        ((r.url, r.generation, r.changed) for r in ex.collect()),
        key=lambda x: (x[0], x[1]),
    )
    seed_rows = [r for r in rows if r[0].endswith(".com/")]
    assert len(seed_rows) == 2  # original visit + requeued visit
    assert seed_rows[0][2] is True and seed_rows[1][2] is False
    child_rows = [r for r in rows if "child" in r[0]]
    assert [r[2] for r in child_rows] == [True]


def test_compaction_invisible_and_resume_safe(spark, site, tmp_path_factory):
    """Frontier delta-log compaction must never change results: a crawl
    compacting every generation equals one that never compacts, and a
    mid-crawl resume that lands between compactions reproduces both."""
    base_cfg = dict(schema_spec="blog@latest", max_depth=2, max_retries=2,
                    use_bloom=False, max_generations=20,
                    breaker={"failure_threshold": 1_000})
    ck_never = str(tmp_path_factory.mktemp("crawl_nc"))
    never = run_crawl(spark, site, [SEED], ck_never,
                      CrawlConfig(**base_cfg, compact_interval=64),
                      session_id="fixed-session")
    ck_every = str(tmp_path_factory.mktemp("crawl_ec"))
    every = run_crawl(spark, site, [SEED], ck_every,
                      CrawlConfig(**base_cfg, compact_interval=1),
                      session_id="fixed-session")
    key = lambda r: (r.url, r.status, r.retry_count, r.created_seq)
    f_never = FrontierLog(SnapshotStore(ck_never)).read_full(spark, never["generation"])
    f_every = FrontierLog(SnapshotStore(ck_every)).read_full(spark, every["generation"])
    assert sorted(map(key, f_never.collect())) == sorted(map(key, f_every.collect()))
    assert _visits(spark, ck_never) == _visits(spark, ck_every)
    # mid-crawl kill + resume with compaction every 2 generations: the
    # resume point (gen 3) sits between compaction boundaries
    import json
    from pathlib import Path

    ck_part = str(tmp_path_factory.mktemp("crawl_pc"))
    run_crawl(spark, site, [SEED], ck_part,
              CrawlConfig(**{**base_cfg, "max_generations": 3}, compact_interval=2),
              session_id="fixed-session")
    cfg_path = Path(ck_part) / "config.json"
    meta = json.loads(cfg_path.read_text())
    meta["cfg"]["max_generations"] = 20
    cfg_path.write_text(json.dumps(meta))
    resumed = resume_crawl(spark, site, ck_part)
    assert resumed["generation"] == never["generation"]
    f_res = FrontierLog(SnapshotStore(ck_part)).read_full(spark, resumed["generation"])
    assert sorted(map(key, f_res.collect())) == sorted(map(key, f_never.collect()))
    assert _visits(spark, ck_part) == _visits(spark, ck_never)


def test_robots_as_dataframe_table(spark, site, tmp_path_factory):
    """The web-scale robots path: a (host, robots_txt) DataFrame instead of
    a driver dict produces the identical crawl."""
    robots_df = spark.createDataFrame(
        [("blog.example.com", "User-agent: *\nDisallow: /post-ownership.html\n")],
        "host string, robots_txt string",
    )
    ckpt = str(tmp_path_factory.mktemp("crawl_rdf"))
    run_crawl(
        spark, site, [SEED], ckpt,
        CrawlConfig(schema_spec="blog@latest", max_depth=1, use_bloom=False),
        robots_raw=robots_df,
    )
    seen = SnapshotStore(ckpt).read_all_batches(spark, "url_seen")
    assert [r.url for r in seen.collect()] == [POSTS[0]]


def test_robots_from_corpus(spark, tmp_path):
    """cfg.robots_from_corpus derives the robots TABLE from /robots.txt
    rows in the pages corpus itself (the reference fetches robots at
    crawl time) — disallowed paths are never enqueued, robots-less hosts
    are unrestricted, and the robots url itself never needs pre-wiring."""
    def page(url, links):
        body = "".join(f'<a href="{l}">x</a>' for l in links)
        return (url, f"<html><body><h1>t</h1>{body}</body></html>".encode())

    rows = [
        ("https://a.example.org/robots.txt",
         b"User-agent: *\nDisallow: /private\n"),
        page("https://a.example.org/", [
            "https://a.example.org/public",
            "https://a.example.org/private/x",
            "https://b.example.org/open",
        ]),
        page("https://a.example.org/public", []),
        page("https://a.example.org/private/x", []),
        page("https://b.example.org/open", []),
    ]
    pages = spark.createDataFrame(rows, "url string, html binary")
    cfg = CrawlConfig(max_depth=3, max_pages=50, max_retries=0,
                      allowed_domains=["example.org"], max_generations=8,
                      robots_from_corpus=True)
    run_crawl(spark, pages, ["https://a.example.org/"], str(tmp_path / "ck"),
              cfg, session_id="s")
    visits = SnapshotStore(str(tmp_path / "ck")).read_all_batches(spark, "visits")
    visited = {r.url for r in visits.collect()}
    assert "https://a.example.org/public" in visited
    assert "https://b.example.org/open" in visited  # no robots -> allowed
    assert "https://a.example.org/private/x" not in visited


def test_resume_equals_uninterrupted_across_all_state_layers(
    spark, site, tmp_path_factory
):
    """Kill-and-resume under EVERY round-3 state layer active at an
    aggressive cadence — frontier compaction, extractions_latest
    compaction, append-log run compaction, Bloom sidecars — and require
    the resumed run to equal the uninterrupted one on every persisted
    table: frontier full state, visits, url_seen set, latest extraction
    per url, and the resolved extractions_latest state."""
    import json
    from pathlib import Path

    from ares_spark.crawl.checkpoint import LatestStateLog

    cfg = CrawlConfig(schema_spec="blog@latest", max_depth=2, max_retries=1,
                      use_bloom=True, bloom_min_seen=2,
                      bloom_capacity_per_shard=5000,
                      compact_interval=2, max_generations=20)
    full_ckpt = str(tmp_path_factory.mktemp("al_full"))
    full = run_crawl(spark, site, [SEED], full_ckpt, cfg, session_id="s")

    part_ckpt = str(tmp_path_factory.mktemp("al_part"))
    cfg2 = CrawlConfig(**{**cfg.__dict__, "max_generations": 2})
    run_crawl(spark, site, [SEED], part_ckpt, cfg2, session_id="s")
    cfg_path = Path(part_ckpt) / "config.json"
    meta = json.loads(cfg_path.read_text())
    meta["cfg"]["max_generations"] = 20
    cfg_path.write_text(json.dumps(meta))
    resumed = resume_crawl(spark, site, part_ckpt)
    assert resumed["generation"] == full["generation"]
    g = full["generation"]

    def snap(ck):
        store = SnapshotStore(ck)
        frontier = sorted(
            (r.url, r.status, r.retry_count, r.created_seq)
            for r in FrontierLog(store, 2).read_full(spark, g).collect()
        )
        seen = sorted(r.url for r in store.read_all_batches(spark, "url_seen").collect())
        ext = store.read_all_batches(spark, "extractions")
        from ares_spark.operators.pipeline import latest_per_key

        ext_latest = sorted(
            (r.url, r.data_hash)
            for r in latest_per_key(ext, ["url"], order_col="generation",
                                    tiebreak="claim_pos").collect()
        )
        elog = LatestStateLog(store, "extractions_latest", ["url"],
                              tiebreak_cols=["claim_pos"], compact_interval=2)
        state = sorted(
            (r.url, r.data_hash) for r in elog.read_latest(spark, g).collect()
        )
        return frontier, seen, ext_latest, state

    f_full, s_full, e_full, st_full = snap(full_ckpt)
    f_res, s_res, e_res, st_res = snap(part_ckpt)
    assert f_full == f_res
    assert s_full == s_res
    assert e_full == e_res
    assert st_full == st_res
    # the maintained state table agrees with a from-scratch recompute of
    # latest-per-url over the raw extraction log — on both checkpoints
    assert st_full == e_full and st_res == e_res
    assert _visits(spark, full_ckpt) == _visits(spark, part_ckpt)


def test_persist_unchanged_false_skips_save(spark, tmp_path_factory):
    """skip_save parity (scrape.rs:256-299 skip_unchanged): with
    persist_unchanged=False the requeued seed's unchanged re-extraction is
    NOT appended — the extraction log holds one row per url — while the
    latest-state view still resolves (the prior row stays latest). The
    default mode keeps the reference's save-snapshot behavior."""
    from ares_spark.io.synth import EPOCH, PAGES_SCHEMA

    seed_html = (b'<html><head><title>Seed</title>'
                 b'<link rel="canonical" href="https://sk.example.com/">'
                 b'<meta name="description" content="d">'
                 b'</head><body><h1>Seed</h1><p>seed body text</p>'
                 b'<a href="/child">c</a></body></html>')
    child_html = (b'<html><head><title>Child</title>'
                  b'<link rel="canonical" href="https://sk.example.com/child">'
                  b'<meta name="description" content="e">'
                  b'</head><body><h1>Child</h1><p>child body text</p>'
                  b'<a href="/">back</a></body></html>')
    pages = spark.createDataFrame(
        [("https://sk.example.com/", EPOCH, seed_html, None, "en"),
         ("https://sk.example.com/child", EPOCH, child_html, None, "en")],
        PAGES_SCHEMA,
    )
    for persist, want_seed_rows in ((True, 2), (False, 1)):
        ckpt = str(tmp_path_factory.mktemp(f"crawl_sk_{persist}"))
        run_crawl(spark, pages, ["https://sk.example.com/"], ckpt,
                  CrawlConfig(schema_spec="product", max_depth=3,
                              use_bloom=False, max_generations=10,
                              persist_unchanged=persist))
        ex = SnapshotStore(ckpt).read_all_batches(spark, "extractions")
        seed_rows = [r for r in ex.collect() if r.url == "https://sk.example.com/"]
        assert len(seed_rows) == want_seed_rows, persist
        if not persist:
            # the one persisted row is the FIRST (changed) observation
            assert seed_rows[0].changed is True
