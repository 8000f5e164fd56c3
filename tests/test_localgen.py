"""Driver-local small-generation fast path (crawl/localgen.py): trace
parity with the distributed loop on EVERY persisted state layer.

The fast path re-executes the whole generation driver-side with the same
kernels and writes the same checkpoint layout; these tests run identical
crawls with the path ON (default) and OFF (local_max_batch=0) and require
byte-level equality of: the full frontier state (all columns), the visits
log, the url_seen set, the extraction log (data hashes, validity,
change flags), and every per-generation lineage manifest (breaker state,
shard counters, seq/visit bases). Any drift between the two executors —
ordering, politeness math, retry scheduling, spider filters, budget
caps — lands here first.
"""

import json
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from ares_spark.crawl import CrawlConfig, resume_crawl, run_crawl
from ares_spark.crawl.checkpoint import FrontierLog, SnapshotStore
from ares_spark.io.synth import CRAWL_SEED_URL, EPOCH, PAGES_SCHEMA, crawl_site_pages

SEED = CRAWL_SEED_URL


@pytest.fixture(scope="module")
def site(spark):
    return crawl_site_pages(spark).cache()


def _mk_pages(spark, spec):
    rows = []
    for url, links in spec.items():
        body = "".join(f'<a href="{l}">x</a>' for l in links)
        rows.append((url, EPOCH, f"<html><body>{body}</body></html>".encode(), None, "en"))
    return spark.createDataFrame(rows, PAGES_SCHEMA)


def _full_state(spark, ckpt, upto_g, compact_interval=8):
    """Every persisted layer, fully materialized for comparison."""
    store = SnapshotStore(ckpt)
    frontier = sorted(
        (r.job_id, r.url, r.url_hash, r.host, r.host_shard, r.schema_name,
         r.status, r.retry_count, r.max_retries, r.next_retry_at,
         r.created_seq, r.created_at, r.crawl_session_id, r.parent_job_id,
         r.depth, r.score, r.max_depth, r.max_pages,
         tuple(r.allowed_domains or []), r.generation, r.error)
        for r in FrontierLog(store, compact_interval)
        .read_full(spark, upto_g).collect()
    )
    visits = sorted(
        (r.visit_pos, r.url, r.outcome, r.generation)
        for r in store.read_all_batches(spark, "visits").collect()
    )
    seen_df = store.read_all_batches(spark, "url_seen")
    seen = sorted(
        (r.crawl_session_id, r.url_hash, r.url, r.host_shard, r.created_at)
        for r in seen_df.collect()
    ) if seen_df is not None else []
    ext_df = store.read_all_batches(spark, "extractions")
    ext = sorted(
        (r.job_id, r.url, r.schema_name, r.extracted_data, r.content_hash,
         r.data_hash, r.model, r.is_valid, tuple(r.validation_errors or []),
         tuple(r.ungrounded_paths or []), r.created_at, r.generation,
         r.claim_pos, r.changed)
        for r in ext_df.collect()
    ) if ext_df is not None else []
    manifests = [store.read_manifest(g) for g in range(upto_g + 1)]
    return {"frontier": frontier, "visits": visits, "seen": seen,
            "extractions": ext, "manifests": manifests}


def _run_both(spark, pages, seeds, cfg_kwargs, tmp_path_factory, tag,
              robots=None):
    """Run local-path-on and local-path-off crawls; return (ckpts, gens)."""
    outs = []
    for mode, lmb in (("local", 2048), ("dist", 0)):
        ckpt = str(tmp_path_factory.mktemp(f"lg_{tag}_{mode}"))
        cfg = CrawlConfig(**{**cfg_kwargs, "local_max_batch": lmb})
        s = run_crawl(spark, pages, seeds, ckpt, cfg, robots_raw=robots,
                      session_id="s")
        outs.append((ckpt, s["generation"]))
    (ck_l, g_l), (ck_d, g_d) = outs
    assert g_l == g_d
    return ck_l, ck_d, g_l


def _assert_equal_state(spark, ck_l, ck_d, g, compact_interval=8):
    st_l = _full_state(spark, ck_l, g, compact_interval)
    st_d = _full_state(spark, ck_d, g, compact_interval)
    for layer in ("visits", "seen", "extractions", "frontier", "manifests"):
        assert st_l[layer] == st_d[layer], f"{layer} differs local vs distributed"


def test_parity_depth2_retries_with_compaction(spark, site, tmp_path_factory):
    """FIFO depth-2 crawl with fetch errors, retry/backoff time-warps and
    an aggressive compaction cadence (every 2 generations: frontier base
    folds, extractions_latest folds, append-log bin-packing)."""
    cfg = dict(schema_spec="blog@latest", max_depth=2, max_retries=2,
               use_bloom=False, max_generations=20, compact_interval=2,
               breaker={"failure_threshold": 1_000})
    ck_l, ck_d, g = _run_both(spark, site, [SEED], cfg, tmp_path_factory, "d2")
    _assert_equal_state(spark, ck_l, ck_d, g, compact_interval=2)


def test_parity_host_rr_politeness_scores(spark, tmp_path_factory):
    """host_rr claim ordering + robots crawl-delay budgets + seeded
    politeness jitter + per_host_budget + parent_decay scores + a
    max_pages budget cap — the full cap/ordering math both ways."""
    hosts = ["a.example.com", "b.example.com", "slow.example.com"]
    spec = {}
    root_links = []
    for h in hosts:
        for i in range(4):
            u = f"https://{h}/p{i}"
            spec[u] = [f"https://{h}/p{(i + 1) % 4}"]
            root_links.append(u)
    spec["https://a.example.com/"] = root_links
    pages = _mk_pages(spark, spec)
    cfg = dict(schema_spec="blog@latest", max_depth=3, max_pages=11,
               ordering="host_rr", per_host_budget=3, use_bloom=False,
               politeness_window_s=60.0, politeness_jitter_ms=500,
               max_generations=15, score_mode="parent_decay",
               allowed_domains=hosts)
    robots = {"slow.example.com": "User-agent: *\nCrawl-delay: 25\n"}
    ck_l, ck_d, g = _run_both(
        spark, pages, ["https://a.example.com/"], cfg, tmp_path_factory,
        "rr", robots=robots)
    _assert_equal_state(spark, ck_l, ck_d, g)


def test_parity_breaker_suppressed_generations(spark, tmp_path_factory):
    """A host whose pages are all missing trips the circuit breaker
    (open → suppressed generations → half-open probes); breaker state
    rides the manifests and must evolve identically."""
    spec = {"https://ok.example.com/": [
        f"https://dead.example.com/x{i}" for i in range(6)
    ] + ["https://ok.example.com/a"], "https://ok.example.com/a": []}
    pages = _mk_pages(spark, spec)
    cfg = dict(schema_spec="blog@latest", max_depth=1, max_retries=3,
               use_bloom=False, max_generations=25,
               allowed_domains=["ok.example.com", "dead.example.com"],
               breaker={"failure_threshold": 2})
    ck_l, ck_d, g = _run_both(
        spark, pages, ["https://ok.example.com/"], cfg, tmp_path_factory, "brk")
    _assert_equal_state(spark, ck_l, ck_d, g)


def test_parity_link_position_scores_and_skip_save(spark, site, tmp_path_factory):
    cfg = dict(schema_spec="blog@latest", max_depth=2, max_retries=0,
               use_bloom=False, max_generations=10,
               score_mode="link_position", ordering="host_rr",
               persist_unchanged=False)
    ck_l, ck_d, g = _run_both(spark, site, [SEED], cfg, tmp_path_factory, "lp")
    _assert_equal_state(spark, ck_l, ck_d, g)


def test_handoff_mid_crawl_matches_distributed(spark, tmp_path_factory):
    """A crawl that STARTS local and outgrows the gate mid-run: the
    distributed path hydrates from locally-written checkpoints, the Bloom
    tier activates over a seen log that local generations wrote, and the
    final state equals the all-distributed run."""
    from ares_spark.io.synth import synth_linked_pages

    pages, seed = synth_linked_pages(spark, 120, n_hosts=6, fanout=4,
                                     partitions=4)
    pages = pages.cache()
    base = dict(schema_spec="blog@latest", max_depth=10, max_pages=120,
                allowed_domains=["example.org"], ordering="host_rr",
                use_bloom=True, bloom_min_seen=5, bloom_capacity_per_shard=5000,
                max_generations=15, max_retries=0, compact_interval=3)
    ck_h = str(tmp_path_factory.mktemp("lg_handoff"))
    s_h = run_crawl(spark, pages, [seed], ck_h,
                    CrawlConfig(**{**base, "local_max_batch": 3}),
                    session_id="s")
    ck_d = str(tmp_path_factory.mktemp("lg_handoff_dist"))
    s_d = run_crawl(spark, pages, [seed], ck_d,
                    CrawlConfig(**{**base, "local_max_batch": 0}),
                    session_id="s")
    assert s_h["generation"] == s_d["generation"]
    _assert_equal_state(spark, ck_h, ck_d, s_h["generation"],
                        compact_interval=3)


def test_local_resume_equals_uninterrupted(spark, site, tmp_path_factory):
    """Kill a local-path crawl after 2 generations and resume: the resumed
    run re-hydrates the driver-local mirror from the checkpoints and must
    equal the uninterrupted local run on every layer."""
    cfg = dict(schema_spec="blog@latest", max_depth=2, max_retries=1,
               use_bloom=False, compact_interval=2, max_generations=20)
    full_ckpt = str(tmp_path_factory.mktemp("lg_res_full"))
    full = run_crawl(spark, site, [SEED], full_ckpt, CrawlConfig(**cfg),
                     session_id="s")
    part_ckpt = str(tmp_path_factory.mktemp("lg_res_part"))
    run_crawl(spark, site, [SEED], part_ckpt,
              CrawlConfig(**{**cfg, "max_generations": 2}), session_id="s")
    meta_path = Path(part_ckpt) / "config.json"
    meta = json.loads(meta_path.read_text())
    meta["cfg"]["max_generations"] = 20
    meta_path.write_text(json.dumps(meta))
    resumed = resume_crawl(spark, site, part_ckpt)
    assert resumed["generation"] == full["generation"]
    _assert_equal_state(spark, full_ckpt, part_ckpt, full["generation"],
                        compact_interval=2)


def test_parity_bucketed_corpus_fetch(spark, site, tmp_path_factory, tmp_path):
    """Local fetch through a hash-bucketed corpus (partition-pruned probe)
    must match the plain-corpus distributed run."""
    from ares_spark.crawl import write_bucketed_pages

    bp = write_bucketed_pages(site, str(tmp_path / "bucketed"), 8)
    cfg = dict(schema_spec="blog@latest", max_depth=2, max_retries=1,
               use_bloom=False, max_generations=15)
    ck_l = str(tmp_path_factory.mktemp("lg_bp_local"))
    s_l = run_crawl(spark, bp, [SEED], ck_l,
                    CrawlConfig(**{**cfg, "local_max_batch": 2048}),
                    session_id="s")
    ck_d = str(tmp_path_factory.mktemp("lg_bp_dist"))
    s_d = run_crawl(spark, site, [SEED], ck_d,
                    CrawlConfig(**{**cfg, "local_max_batch": 0}),
                    session_id="s")
    assert s_l["generation"] == s_d["generation"]
    _assert_equal_state(spark, ck_l, ck_d, s_l["generation"])


def test_parity_property_random_graphs(spark, tmp_path_factory):
    """Property form of the parity suite: randomized small web graphs
    (dangling links, cross-host edges, self-loops, duplicate links) ×
    randomized config draws (ordering, depth, retries, budgets, scores,
    skip_save, compaction cadence) must produce identical full state
    under both executors. Catches interaction bugs the hand-picked
    matrix misses."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    hosts = ["h1.example.net", "h2.example.net", "h3.example.net"]

    @settings(max_examples=4, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture,
                                     HealthCheck.too_slow])
    @given(data=st.data())
    def run(data):
        n = data.draw(st.integers(4, 9), label="n_pages")
        urls = [f"https://{hosts[i % len(hosts)]}/p{i}" for i in range(n)]
        spec = {}
        for i, u in enumerate(urls):
            k = data.draw(st.integers(0, 4), label=f"fanout{i}")
            targets = [
                urls[data.draw(st.integers(0, n - 1), label=f"t{i}_{j}")]
                for j in range(k)
            ]
            if data.draw(st.booleans(), label=f"dangle{i}"):
                targets.append(f"https://{hosts[0]}/missing{i}")
            spec[u] = targets
        cfg = dict(
            schema_spec="blog@latest",
            max_depth=data.draw(st.integers(1, 3), label="depth"),
            max_pages=data.draw(st.integers(2, 40), label="max_pages"),
            max_retries=data.draw(st.integers(0, 2), label="retries"),
            ordering=data.draw(st.sampled_from(["fifo", "host_rr"]),
                               label="ordering"),
            per_host_budget=data.draw(st.sampled_from([None, 1, 2]),
                                      label="budget"),
            score_mode=data.draw(
                st.sampled_from(["zero", "link_position", "parent_decay"]),
                label="score"),
            persist_unchanged=data.draw(st.booleans(), label="persist"),
            compact_interval=data.draw(st.sampled_from([2, 8]), label="ci"),
            use_bloom=False, max_generations=12,
            allowed_domains=hosts,
        )
        pages = _mk_pages(spark, spec)
        outs = []
        for mode, lmb in (("local", 2048), ("dist", 0)):
            ckpt = str(tmp_path_factory.mktemp(f"lg_prop_{mode}"))
            s = run_crawl(spark, pages, [urls[0]], ckpt,
                          CrawlConfig(**{**cfg, "local_max_batch": lmb}),
                          session_id="s")
            outs.append((ckpt, s["generation"]))
        (ck_l, g_l), (ck_d, g_d) = outs
        assert g_l == g_d
        _assert_equal_state(spark, ck_l, ck_d, g_l,
                            compact_interval=cfg["compact_interval"])

    run()


def test_local_generations_issue_one_spark_job(spark, site, tmp_path_factory):
    """The economics the fast path exists for: a fully-local generation
    issues exactly ONE Spark job (the bounded corpus probe). Tracked via
    the status tracker's job counter across a whole small crawl."""
    ckpt = str(tmp_path_factory.mktemp("lg_jobs"))
    all_before = set(spark.sparkContext.statusTracker().getJobIdsForGroup())
    run_crawl(
        spark, site, [SEED], ckpt,
        CrawlConfig(schema_spec="blog@latest", max_depth=1, max_pages=100,
                    use_bloom=False), session_id="s",
    )
    # jobs: seed write_base + read-back ≤ 2, then exactly one fetch probe
    # per generation (2 generations for the depth-1 site)
    all_after = set(spark.sparkContext.statusTracker().getJobIdsForGroup())
    n_jobs = len(all_after - all_before)
    assert n_jobs <= 5, f"local crawl ran {n_jobs} Spark jobs (expected <=5)"
