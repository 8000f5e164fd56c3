"""The BFS crawl generation loop (SURVEY.md §3.2, M3/M4).

One iteration = one frontier generation:

    claim     pending ∧ retry-due, ordered (FIFO parity | host-RR scale),
              capped by per-host politeness budgets + circuit breaker
    fetch     batch ⋈ pages on url (the sandbox "fetch"; a live crawler
              swaps this join for an HTTP mapInPandas stage)
    extract   clean → hash → extract → validate → ground, fused into ONE
              Arrow pass by default (cfg.extraction_mode)
    spider    links → domain filter → robots (host-keyed table join) →
              seen-dedup → budget cap → next-generation children with
              deterministic created_seq
    persist   frontier DELTA (merge-on-read FrontierLog; never an
              O(frontier) rewrite) + url_seen/extraction/visit appends +
              lineage manifest (per host-shard counters) → resumable

Determinism: with cfg.ordering='fifo' and no politeness caps the visit
order equals the reference's serial worker trace (FIFO claim by
(next_retry_at NULLS FIRST, created_seq) + alphabetically sorted link
emission) — asserted against the reference crawl fixture in
tests/test_crawl_loop.py.

Driver state is BOUNDED: lineage collects one row per host shard, the
breaker ingests failing hosts (top-K) plus tracked hosts only, robots and
politeness budgets are join-based — nothing the driver holds grows with
batch size.

Scale: every per-generation stage is a bounded number of shuffles: the
merge-on-read frontier resolve (hash on job_id), claim ordering (the
distributed global rank above 50k rows — never an unpartitioned window),
fetch join (co-partitioned on url), seen anti-join (Bloom-prefiltered,
hash-partitioned), child ranking (same distributed rank). Hot-domain skew
is defeated by salting: batch processing repartitions by
(host_shard, salt) before the html-parsing UDF.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ares_spark.crawl.breaker import CircuitBreaker
from ares_spark.crawl.checkpoint import FrontierLog, LatestStateLog, SnapshotStore
from ares_spark.crawl.frontier import (
    FRONTIER_SCHEMA,
    claimable,
    global_order_rank,
    order_counted,
    retry_delay_expr,
)
from ares_spark.crawl.robots import RobotsMatcher
from ares_spark.crawl.seen import (
    BloomSidecarSet,
    host_shard_col,
    url_hash_col,
)
from ares_spark.functions.urls import canonicalize_url, url_host
from ares_spark.operators.clean import process_pages
from ares_spark.operators.pipeline import extract_distinct

SEEN_SCHEMA = T.StructType(
    [
        T.StructField("crawl_session_id", T.StringType()),
        T.StructField("url_hash", T.LongType()),
        T.StructField("url", T.StringType()),
        T.StructField("host_shard", T.IntegerType()),
        T.StructField("created_at", T.DoubleType()),
    ]
)

_HOST_RE = r"^https?://(?:[^@/]*@)?([^/:?#]+)"

# ARES_LOOP_TIMING=1 prints per-action wall times for each generation —
# the profiling hook behind crawl_bench perf work
_TIMING = os.environ.get("ARES_LOOP_TIMING") == "1"


def _parallel_actions(*thunks) -> None:
    """Run independent Spark ACTIONS concurrently (one thread each; Spark
    schedules jobs from multiple threads natively) with a barrier at the
    end; the first exception re-raises. The per-generation control plane
    is a handful of small jobs whose cost is driver/scheduler LATENCY,
    not compute (measured ~1-1.5s each, flat in cores and data size —
    BENCH.md round-4 campaign); overlapping them cuts the serial section
    Amdahl charges every generation. Only actions with no data
    dependency and no shared driver-side mutable state go in one group;
    concurrent materialization of a shared cached DataFrame is safe
    (Spark's cache manager locks per partition).
    """
    if len(thunks) == 1:
        thunks[0]()
        return
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=len(thunks)) as ex:
        for f in [ex.submit(t) for t in thunks]:
            f.result()


def _tick(label: str, t0: float, g: int | None = None) -> float:
    now = time.time()
    if _TIMING:
        tag = f"g{g} " if g is not None else ""
        print(f"[loop-timing] {tag}{label}: {now - t0:.2f}s", flush=True)
    return now


@dataclass
class CrawlConfig:
    schema_spec: str = "blog@latest"
    max_depth: int = 1  # CLI default (crates/ares-cli/src/main.rs:402)
    max_pages: int = 100  # CrawlConfig default (crawl.rs:22-32)
    max_retries: int = 3
    allowed_domains: list[str] = field(default_factory=list)
    ordering: str = "fifo"  # fifo (reference parity) | host_rr (north_rule)
    per_host_budget: int | None = None  # politeness cap per generation
    politeness_window_s: float = 60.0  # generation ≈ one politeness window
    max_generations: int = 64
    batch_interval_s: float = 1.0
    use_bloom: bool = True
    bloom_min_seen: int = 10_000
    bloom_capacity_per_shard: int = 1_000_000
    ssrf_filter: bool = True
    n_shards: int = 64
    compact_interval: int = 8  # frontier delta-log compaction cadence (gens)
    breaker_feed_top_k: int = 10_000  # max failing hosts fed to the breaker/gen
    # politeness jitter (throttle.rs:45-49,77-85: delay + U[0, jitter] per
    # wait). Batch analog: a SEEDED uniform roll per (host, generation) on
    # top of crawl-delay, so runs stay replayable. 0 disables (engine
    # default — determinism first; the reference defaults to 500ms).
    politeness_jitter_ms: int = 0
    politeness_jitter_seed: int = 42
    salt_partitions: int | None = None  # repartition width for the UDF stage
    breaker: dict = field(default_factory=dict)
    model: str = "deterministic-extractor-v1"
    user_agent: str = "ares"  # robots group selection (robots.rs:84-88)
    # fused = one Arrow pass with a partition-local extraction memo (the
    # throughput default); staged = global distinct-content extraction +
    # join (for expensive extractors with high cross-partition duplication)
    extraction_mode: str = "fused"
    # derive the robots corpus from the pages table itself (rows whose
    # path is exactly /robots.txt) — the batch analog of the reference's
    # fetch-robots-at-crawl-time; an explicit robots_raw still wins
    robots_from_corpus: bool = False
    # frontier priority score (north_rule: host-RR with depth/SCORE order):
    #   zero          all equal — ordering reduces to (depth, created_seq)
    #   link_position earlier links on a page outrank later ones
    #   parent_decay  seeds 1.0, children inherit parent_score × decay
    #                 (a PageRank-ish prior favoring link-near-seed pages)
    score_mode: str = "zero"
    score_decay: float = 0.85
    # skip_save parity (scrape.rs:256-299 skip_unchanged): when False,
    # valid-but-UNCHANGED extractions are dropped before the append — the
    # prior row stays the latest; changed or first-time rows always persist
    persist_unchanged: bool = True
    # A1 live half (fetcher.rs:149-186): "pages" joins the corpus table
    # (sandbox default), "live" issues real GETs via crawl.httpfetch with
    # the SSRF guard re-validated per request. Same downstream semantics:
    # a live failure IS a missing pages row (retry/backoff/breaker).
    fetch_mode: str = "pages"  # pages | live
    fetch_timeout_s: float = 30.0  # reference default timeout (main.rs)
    http_proxy: str | None = None  # absolute-form HTTP proxy (fetcher.rs:117)
    fetch_delay_s: float = 0.0  # min per-host interval between live GETs
    fetch_user_agent: str = "Ares/0.2 (AI Scraper)"  # fetcher.rs:123
    # batches up to this size fetch via a broadcast semi-join probe into a
    # streamed corpus scan (no per-generation corpus shuffle); above it,
    # the batch is corpus-scale and a co-shuffle join is the right plan.
    # ~1M urls broadcast ≈ 60-100 MB — inside executor broadcast budgets.
    fetch_semi_join_max_batch: int = 1_000_000
    # overlap the NEXT generation's claim ordering inside this
    # generation's checkpoint barrier (measured A/B knob)
    prefetch_ordering: bool = True
    # driver-local small-generation fast path (crawl/localgen.py): a
    # generation whose claimable batch is at most local_max_batch rows —
    # the BFS ramp, retry-only and politeness-capped generations — runs
    # entirely on the driver (~1 Spark job instead of ~6), writing the
    # identical checkpoint layout. Hands off to the distributed path the
    # moment the batch, the enqueued-url count (local_max_state), or the
    # Bloom activation threshold outgrows it. 0 disables.
    local_max_batch: int = 2048
    local_max_state: int = 100_000


def seed_frontier(
    spark: SparkSession, seed_urls: list[str], cfg: CrawlConfig, session_id: str, t0: float
) -> DataFrame:
    """Seed jobs (depth 0). NOTE the reference quirk: seeds are NOT marked
    visited (main.rs:784-798) — a child linking back re-enqueues them once."""
    rows = []
    for i, u in enumerate(seed_urls):
        cu = canonicalize_url(u)
        if cu is None:
            continue
        rows.append(
            {
                "job_id": f"seed-{session_id[:8]}-{i}",
                "url": cu,
                "host": url_host(cu),
                "schema_name": cfg.schema_spec,
                "status": "pending",
                "retry_count": 0,
                "max_retries": cfg.max_retries,
                "next_retry_at": None,
                "created_seq": i,
                "created_at": t0,
                "crawl_session_id": session_id,
                "parent_job_id": None,
                "depth": 0,
                "score": 1.0 if cfg.score_mode == "parent_decay" else 0.0,
                "max_depth": cfg.max_depth,
                "max_pages": cfg.max_pages,
                "allowed_domains": list(cfg.allowed_domains),
                "generation": 0,
                "error": None,
            }
        )
    base = T.StructType(
        [f for f in FRONTIER_SCHEMA.fields if f.name not in ("url_hash", "host_shard")]
    )
    df = spark.createDataFrame(pd.DataFrame(rows, columns=[f.name for f in base.fields]), base)
    return (
        df.withColumn("url_hash", url_hash_col("url"))
        .withColumn("host_shard", host_shard_col("host", cfg.n_shards))
        .select(*[f.name for f in FRONTIER_SCHEMA.fields])
    )


def _robots_allowed_col(user_agent: str = "ares"):
    """Vectorized robots check (A5) over (link, robots_txt) pairs — the
    robots corpus arrives via a JOIN on host, never as a whole-corpus
    driver broadcast (at 10^7 hosts a dict broadcast exceeds limits; a
    host-keyed table joins only the hosts present in the batch). Texts
    parse once per (text, partition) via a partition-local memo. Missing
    host (null text) → allow. The memo is capped: robots texts repeat
    heavily per host, but a task that streams millions of distinct hosts
    must not grow an unbounded dict (same guard as the extraction memo,
    pipeline.py)."""

    @pandas_udf("boolean")
    def allowed(urls: pd.Series, txts: pd.Series) -> pd.Series:
        compiled: dict[str, RobotsMatcher] = {}

        def check(u, t):
            if not u:
                return False
            if t is None:
                return True
            m = compiled.get(t)
            if m is None:
                m = RobotsMatcher.parse(t)
                if len(compiled) < 10_000:
                    compiled[t] = m
            return m.is_allowed(u, user_agent)

        return pd.Series([check(u, t) for u, t in zip(urls, txts)], dtype=bool)

    return allowed


def robots_from_pages(pages: DataFrame) -> DataFrame:
    """(host, robots_txt) derived from the crawl corpus itself — the batch
    analog of the reference's fetch-robots.txt-at-crawl-time (spider
    behavior, robots.rs): any row whose url path is exactly /robots.txt
    supplies its host's rules. Stays a DataFrame end to end (the
    10^7-host corpus never lands on the driver); a host with several
    robots rows resolves deterministically (max url wins — in practice
    the path is unique per host)."""
    from ares_spark.operators.pipeline import latest_per_key

    cand = pages.filter(
        F.col("url").rlike(r"^https?://[^/]+/robots\.txt$")
    ).select(
        F.regexp_extract("url", _HOST_RE, 1).alias("host"),
        F.col("url"),
        F.decode(F.col("html"), "UTF-8").alias("robots_txt"),
    )
    return latest_per_key(cand, ["host"], order_col="url", tiebreak=None).drop("url")


def _robots_assets(spark, robots_raw, cfg: "CrawlConfig"):
    """Robots corpus as DataFrames. ``robots_raw`` is either a
    {host: robots_txt} dict (test/CLI convenience — becomes a DataFrame)
    or a DataFrame with (host, robots_txt) columns (the web-scale path: a
    10^7-host robots TABLE never materializes on the driver); everything
    downstream is join-based either way.
    Returns (robots_df(host, robots_txt) | None,
             robots_budgets(host, crawl_delay) | None) — budgets are the
    per-generation politeness caps derived from Crawl-delay, parsed
    EXECUTOR-side and materialized once per crawl (persisted), so no
    generation ever parses robots on the driver."""
    from pyspark.sql import DataFrame as _DF

    if robots_raw is None or (isinstance(robots_raw, dict) and not robots_raw):
        return None, None
    if isinstance(robots_raw, _DF):
        robots_df = robots_raw.select("host", "robots_txt")
    else:
        robots_df = spark.createDataFrame(
            sorted(robots_raw.items()), "host string, robots_txt string"
        )
    ua, window_s = cfg.user_agent, cfg.politeness_window_s

    @pandas_udf("double")
    def delay_of(txts: pd.Series) -> pd.Series:
        return txts.map(
            lambda t: float(RobotsMatcher.parse(t or "").crawl_delay(ua) or 0.0)
        )

    from pyspark import StorageLevel

    budgets = (
        robots_df.withColumn("crawl_delay", delay_of("robots_txt"))
        .filter(F.col("crawl_delay") > 0)
        .select("host", "crawl_delay")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    if budgets.count() == 0:
        budgets.unpersist()
        budgets = None
    return robots_df, budgets


def politeness_budget_col(
    delay_col,
    window_s: float,
    jitter_ms: int = 0,
    generation: int = 0,
    seed: int = 42,
    host_col="host",
):
    """Per-generation fetch budget for a host with a crawl-delay:
    max(1, floor(window / effective_delay)), where effective_delay adds the
    reference's per-wait uniform jitter (throttle.rs:67-73) as a seeded
    deterministic roll per (host, generation) — replay-stable.

    NULL-preserving: a host with no crawl-delay (null after the budgets
    left join) has NO politeness budget — the result must stay null so
    F.least skips it. greatest(1, floor(w/null)) would collapse to 1
    (greatest SKIPS nulls), silently throttling every delay-less host to
    one fetch per generation whenever any robots corpus is present."""
    delay = delay_col if not isinstance(delay_col, str) else F.col(delay_col)
    if jitter_ms > 0:
        h = F.col(host_col) if isinstance(host_col, str) else host_col
        roll = F.pmod(F.xxhash64(h, F.lit(generation), F.lit(seed)), F.lit(jitter_ms + 1))
        delay = delay + roll / F.lit(1000.0)
    return F.when(
        delay.isNotNull(),
        F.greatest(F.lit(1), F.floor(F.lit(window_s) / delay)).cast("int"),
    )


def child_score_expr(cfg: "CrawlConfig"):
    """Frontier priority for a discovered link (north_rule depth/score
    ordering; column expression over the spider's candidate rows, which
    carry the parent's ``score`` and the link's ``link_rank``)."""
    if cfg.score_mode == "link_position":
        return -F.col("link_rank").cast("double")
    if cfg.score_mode == "parent_decay":
        return F.coalesce(F.col("score"), F.lit(0.0)) * F.lit(cfg.score_decay)
    return F.lit(0.0)


def _read_seen(spark, store, upto_generation: int):
    """The URL-seen set = union of the append-only per-generation logs."""
    df = store.read_all_batches(spark, "url_seen", upto_generation)
    return df if df is not None else spark.createDataFrame([], SEEN_SCHEMA)


class CrawlState:
    def __init__(self, store, flog, frontier, seen, batch_ts, seq_base, visit_base, breaker,
                 generation, visited: int = 0):
        self.store = store
        self.flog = flog
        self.frontier = frontier
        self.seen = seen
        self.batch_ts = batch_ts
        self.seq_base = seq_base
        self.visit_base = visit_base
        self.breaker = breaker
        self.generation = generation
        # A17 semantics (worker.rs:303-314): count visited once, then track
        # locally — avoids rescanning the seen log every generation
        self.visited = visited
        # maintained per-shard Bloom bitmaps (north_rule seen-set); built
        # lazily, updated incrementally with each generation's new links,
        # persisted as sidecars for resume
        self.bloom_set = None
        # robots corpus as join-able DataFrames (built once per drive)
        self.robots_df = None
        self.robots_budgets = None
        # next-generation claim ordering, prefetched inside the previous
        # generation's checkpoint barrier: {"batch", "n", "batch_ts",
        # "pins"} — consumed (or invalidated on a time-warp) by _drive
        self.prefetch = None
        # driver-local fast-path mirror (crawl/localgen.LocalCrawl);
        # local_dead latches once the crawl outgrows it — the sidecar
        # Bloom tier is distributed-only, so the loop never goes back
        self.local = None
        self.local_dead = False


def run_crawl(
    spark: SparkSession,
    pages: DataFrame,
    seed_urls: list[str],
    checkpoint_dir: str,
    cfg: CrawlConfig | None = None,
    robots_raw: dict[str, str] | DataFrame | None = None,
    schema: dict | None = None,
    session_id: str | None = None,
    seed_df: DataFrame | None = None,
) -> dict:
    """Run a crawl session to completion (or max_generations). Returns the
    summary dict of the final manifest. ``robots_raw`` may be a dict or a
    (host, robots_txt) DataFrame — pass the table form at web scale.
    ``seed_df``: a url DataFrame seeded distributively
    (seed_frontier_from_df) instead of the driver-side ``seed_urls``
    list — required when the bootstrap (e.g. a WAT link graph) is too
    big for the driver; ``seed_urls`` is ignored when given."""
    cfg = cfg or CrawlConfig()
    session_id = session_id or str(uuid.uuid4())
    store = SnapshotStore(checkpoint_dir)
    if schema is None:
        from ares_spark.schemas import SchemaRegistry

        _, _, schema = SchemaRegistry().resolve(cfg.schema_spec)
    t0 = 0.0
    flog = FrontierLog(store, compact_interval=cfg.compact_interval)
    if seed_df is not None:
        base = seed_frontier_from_df(seed_df, cfg, session_id, t0)
    else:
        base = seed_frontier(spark, seed_urls, cfg, session_id, t0)
    flog.write_base(base, 0)
    # read the base back: the hot path and the resume path share one code
    # path, and the frontier's lineage starts at parquet every generation
    frontier = flog.read_live(spark, -1)
    n_seeds = frontier.count() if seed_df is not None else len(seed_urls)
    seen = spark.createDataFrame([], SEEN_SCHEMA)
    state = CrawlState(
        store, flog, frontier, seen, t0, n_seeds, 0, CircuitBreaker(**cfg.breaker), 0
    )
    # persist config for resume
    (store.root / "config.json").write_text(
        json.dumps({"cfg": cfg.__dict__, "session_id": session_id, "schema": schema})
    )
    return _drive(spark, pages, state, cfg, robots_raw or {}, schema, session_id)


def resume_crawl(
    spark: SparkSession,
    pages: DataFrame,
    checkpoint_dir: str,
    robots_raw: dict[str, str] | None = None,
    max_generations: int | None = None,
) -> dict:
    """Resume a killed crawl from its last published manifest (north_rule:
    any run is resumable mid-crawl from snapshot + lineage).
    ``max_generations`` extends the stored config's horizon — the operator
    knob for continuing a crawl that ran to its generation cap."""
    store = SnapshotStore(checkpoint_dir)
    meta = json.loads((store.root / "config.json").read_text())
    cfg = CrawlConfig(**meta["cfg"])
    if max_generations is not None:
        cfg.max_generations = max_generations
    g = store.latest_generation()
    if g is None:
        raise FileNotFoundError("no manifest to resume from")
    man = store.read_manifest(g)
    flog = FrontierLog(store, compact_interval=cfg.compact_interval)
    state = CrawlState(
        store,
        flog,
        flog.read_live(spark, g),
        _read_seen(spark, store, g),
        man["batch_ts"],
        man["seq_base"],
        man["visit_base"],
        CircuitBreaker.from_dict(man["breaker"]),
        g + 1,
        visited=man.get("seen_total", 0),
    )
    state.bloom_set = BloomSidecarSet.load(store.root / "blooms")
    return _drive(spark, pages, state, cfg, robots_raw or {}, meta["schema"], meta["session_id"])


def _drive(spark, pages, state, cfg, robots_raw, schema, session_id) -> dict:
    from ares_spark.crawl.pagestore import BucketedPages

    if cfg.robots_from_corpus and (
        robots_raw is None or (isinstance(robots_raw, dict) and not robots_raw)
    ):
        robots_src = (
            pages.read_all(spark) if isinstance(pages, BucketedPages) else pages
        )
        robots_raw = robots_from_pages(robots_src)
    state.robots_df, state.robots_budgets = _robots_assets(spark, robots_raw, cfg)
    # extractions_latest: incrementally-maintained latest extraction per
    # url (A12). Purely disk-backed, so run and resume share this one line.
    state.elog = LatestStateLog(
        state.store, "extractions_latest", ["url"],
        tiebreak_cols=["claim_pos"], compact_interval=cfg.compact_interval,
    )
    last_summary = {"generations": state.generation, "session_id": session_id}
    from ares_spark.operators.ranking import adopt_pins, release_rank_pins

    from ares_spark.crawl.localgen import LocalCrawl, local_eligible

    while state.generation < cfg.max_generations:
        # driver-local small-generation fast path: tiny batches (BFS
        # ramp / retry-only / politeness-capped) run on the driver with
        # one Spark job total; state round-trips through the same
        # checkpoint layout, so the handoff below is just "read it back"
        if state.local is None and not state.local_dead:
            if local_eligible(state, cfg, robots_raw):
                state.local = LocalCrawl.hydrate(
                    state, cfg, robots_raw, schema, session_id
                )
            else:
                state.local_dead = True
        if state.local is not None:
            sig = state.local.step(spark, pages, state, cfg)
            if sig == "done":
                break
            if sig != "handoff":
                if isinstance(sig, dict):
                    last_summary = sig
                continue
            # outgrew the gates: hydrate the distributed path from disk
            # and never come back (Bloom sidecars are distributed-only)
            state.local = None
            state.local_dead = True
            from pyspark import StorageLevel

            state.frontier = state.flog.read_live(
                spark, state.generation - 1
            ).persist(StorageLevel.MEMORY_AND_DISK)
            state.seen = _read_seen(spark, state.store, state.generation - 1)
        pf, state.prefetch = state.prefetch, None
        if pf is not None and pf["batch_ts"] == state.batch_ts:
            # ordering was prefetched inside the previous generation's
            # checkpoint barrier — zero serial cost here; its rank pins
            # are adopted so THIS generation's release covers them
            batch, n_claimable = pf["batch"], pf["n"]
            adopt_pins(pf["pins"])
        else:
            if pf is not None:  # stale: a time-warp moved the clock
                for p in pf["pins"]:
                    p.unpersist()
            claim = claimable(state.frontier, state.batch_ts)
            # ONE job: frontier resolve + claim ordering + batch size —
            # the count is folded into the rank's partition-offset pass
            # (order_counted), collapsing the former claim-count job
            t0 = time.time()
            batch, n_claimable = order_counted(claim, cfg.ordering)
            _tick("order+count(+frontier materialize)", t0, state.generation)
        if n_claimable == 0:
            release_rank_pins()
            # time-warp to the earliest retry, like an injected test clock
            nxt = state.frontier.filter(F.col("status") == "pending").agg(
                F.min("next_retry_at")
            ).first()[0]
            if nxt is None:
                break
            state.batch_ts = float(nxt)
            continue
        last_summary = _run_generation(
            spark, pages, state, cfg, robots_raw, schema, session_id, batch, n_claimable
        )
    return last_summary


def _fetch_from_pages(spark, batch, pages, cfg, n_claimable, g):
    """Sandbox fetch (``batch ⋈ pages``) — scan/shuffle strategy chosen by
    batch size and corpus layout:

    1. **Bucket-pruned scan** (pages is a BucketedPages and the batch is
       well under the bucket count): read ONLY the batch's hash buckets —
       the Iceberg bucket-partition-pruning plan, O(|batch| × corpus/B)
       read instead of O(corpus). The bucket set comes from the frontier's
       own url_hash column, driver-bounded at ≤ min(|batch|, B) ints. The
       4× guard keeps the pruned path where it pays: at |batch| ≈ B the
       expected hit fraction is already 1 − 1/e ≈ 63% of buckets, and the
       extra distinct-buckets job would buy almost nothing.
    2. **Streamed scan + broadcast semi-join probe** (sub-corpus batch):
       BFS-ramp / politeness-capped generations are far smaller than the
       corpus. A plain batch⋈pages LEFT join sort-merge-shuffles the
       ENTIRE corpus every generation (Spark cannot broadcast the
       preserved side of an outer join) — O(corpus) exchange per
       generation, the scale killer for deep crawls. Instead: stream-scan
       pages ONCE with the batch's url set broadcast as a semi-join probe
       (no corpus shuffle, no corpus sort), then left-join the ≤|batch|
       hit set back to the batch.
    3. **Co-shuffle join** (corpus-scale batch): the batch is the same
       order of size as the corpus, so the shuffle is the right plan.
    """
    from ares_spark.crawl.pagestore import BucketedPages

    bucketed = pages if isinstance(pages, BucketedPages) else None
    if bucketed is not None and n_claimable * 4 <= bucketed.n_buckets:
        t0 = time.time()
        scan = bucketed.scan_for_batch(spark, batch)
        _tick("fetch bucket-prune", t0, g)
        page_hits = scan.select("url", "html").join(
            F.broadcast(batch.select("url")), "url", "left_semi"
        )
        return batch.join(page_hits, "url", "left")
    pages_df = bucketed.read_all(spark) if bucketed is not None else pages
    if n_claimable <= cfg.fetch_semi_join_max_batch:
        page_hits = pages_df.select("url", "html").join(
            F.broadcast(batch.select("url")), "url", "left_semi"
        )
        return batch.join(page_hits, "url", "left")
    return batch.join(pages_df.select("url", "html"), "url", "left")


def _run_generation(
    spark, pages, state, cfg, robots_raw, schema, session_id, batch, n_claimable
) -> dict:
    """``batch`` arrives already claim-ordered (order_counted in _drive —
    the ordering job doubles as the claim count)."""
    g = state.generation

    # --- politeness + breaker caps (per host) --------------------------------
    # never a distinct-hosts collect (unbounded at 10^6+ hosts/batch):
    # breaker caps are a SMALL driver set (only failing/recovering hosts are
    # tracked) broadcast-joined in; robots crawl-delay budgets are a
    # once-per-crawl DataFrame joined by host; per_host_budget is a scalar
    breaker_caps: dict[str, int] = {}
    for h in list(state.breaker.hosts):
        cap = state.breaker.claim_budget(h, g)
        if cap is not None:
            breaker_caps[h] = cap
    caps_active = (
        cfg.per_host_budget is not None
        or state.robots_budgets is not None
        or bool(breaker_caps)
    )
    if caps_active:
        w_host = Window.partitionBy("host").orderBy("claim_pos")
        batch = batch.withColumn("__hrn", F.row_number().over(w_host))
        budget_cols = []
        if cfg.per_host_budget is not None:
            budget_cols.append(F.lit(cfg.per_host_budget))
        if state.robots_budgets is not None:
            batch = batch.join(F.broadcast(state.robots_budgets), "host", "left")
            budget_cols.append(
                politeness_budget_col(
                    "crawl_delay", cfg.politeness_window_s,
                    cfg.politeness_jitter_ms, g, cfg.politeness_jitter_seed,
                )
            )
        if breaker_caps:
            caps_df = spark.createDataFrame(
                sorted(breaker_caps.items()), "host string, breaker_cap int"
            )
            batch = batch.join(F.broadcast(caps_df), "host", "left")
            budget_cols.append(F.col("breaker_cap"))
        budget = F.least(*budget_cols) if len(budget_cols) > 1 else budget_cols[0]
        batch = batch.filter(budget.isNull() | (F.col("__hrn") <= budget)).drop(
            "__hrn", "crawl_delay", "breaker_cap"
        )
        # a zero cap (open breaker) can suppress the whole batch: tick the
        # generation clock (the breaker's recovery unit) without burning a
        # fetch cycle — no extraction, no spider, no delta, just a manifest
        if (
            breaker_caps
            and min(breaker_caps.values()) == 0
            and batch.limit(1).count() == 0
        ):
            summary = {
                "generation": g,
                "session_id": session_id,
                "batch_ts": state.batch_ts + cfg.batch_interval_s,
                "claimed": 0,
                "completed": 0,
                "errors": 0,
                "new_children": 0,
                "seen_total": state.visited,
                "seq_base": state.seq_base,
                "visit_base": state.visit_base,
                "shards": {},
                "breaker": state.breaker.to_dict(),
                "suppressed": True,
            }
            state.store.write_manifest(g, summary)
            state.batch_ts += cfg.batch_interval_s
            state.generation = g + 1
            return summary
    # visit positions must stay DENSE after the cap filter: re-rank the
    # surviving rows in claim order, else positions gap within a generation
    # and (visit_base advancing by the post-cap count) get reused by the
    # next one — corrupting the trace the visits log exists for
    if caps_active:
        # n_claimable over-counts the post-cap batch, but the rank only
        # uses it for the window/distributed auto-switch — an upper bound
        # picks a valid path either way and saves a count job per capped
        # generation
        batch = global_order_rank(
            batch, [F.col("claim_pos")], out_col="visit_seq", n_rows=n_claimable
        )
    else:
        batch = batch.withColumn("visit_seq", F.col("claim_pos"))

    # --- fetch (pages-table join, or live HTTP when flagged) -----------------
    salt_n = cfg.salt_partitions or spark.sparkContext.defaultParallelism
    if cfg.fetch_mode == "live":
        from ares_spark.crawl.httpfetch import live_fetch

        raw = live_fetch(
            batch,
            timeout_s=cfg.fetch_timeout_s,
            proxy=cfg.http_proxy,
            per_host_delay_s=cfg.fetch_delay_s,
            ssrf=cfg.ssrf_filter,
            user_agent=cfg.fetch_user_agent,
            n_partitions=salt_n,
        )
    else:
        raw = _fetch_from_pages(spark, batch, pages, cfg, n_claimable, g)
    fetched = (
        raw
        # salted-host repartition: spread a hot host across all tasks before
        # the CPU-heavy parse stage (north_rule skew handling)
        .repartition(salt_n, F.col("host_shard"), F.pmod(F.col("url_hash"), F.lit(salt_n)))
        .cache()
    )
    found = fetched.filter(F.col("html").isNotNull())
    missing = fetched.filter(F.col("html").isNull())

    # --- extract --------------------------------------------------------------
    if cfg.extraction_mode == "fused":
        # one Arrow pass: clean + hash + extract + validate + ground with a
        # partition-local extraction memo (scrape_fused) — no mid-pipeline
        # shuffle, one JVM↔Python crossing per page. The staged path below
        # instead dedups extraction work GLOBALLY by content hash — worth
        # it only when cross-partition duplication is high and the
        # extractor is expensive (e.g. a live LLM stage).
        from ares_spark.operators.pipeline import scrape_fused

        processed = scrape_fused(found, schema).cache()
        joined = processed
    else:
        processed = process_pages(found).cache()
        results = extract_distinct(
            processed.select("content_hash", "text").dropDuplicates(["content_hash"]),
            schema,
        )
        joined = processed.join(results, "content_hash", "left")
    extractions = (
        joined
        .withColumn("schema_name", F.lit(cfg.schema_spec))
        .withColumn("model", F.lit(cfg.model))
        .withColumn("data_hash", F.sha2(F.col("extracted_data"), 256))
        .withColumn("created_at", F.lit(state.batch_ts))
        .withColumn("generation", F.lit(g))
        .select(
            "job_id", "url", "schema_name", "extracted_data", "content_hash",
            "data_hash", "model", "is_valid", "validation_errors",
            "ungrounded_paths", "created_at", "generation", "claim_pos",
        )
    )
    # A12 change detection vs the latest prior extraction per url
    # (scrape.rs:256-299): relevant whenever a url is processed again —
    # the seed-requeue quirk, recrawls, retry-after-transient-success.
    # The prior state comes from the incrementally-maintained
    # extractions_latest LatestStateLog (base + ≤K deltas, semi-joined to
    # this batch's urls before the resolve window) — O(batch ∩ state) per
    # generation, never the read-ALL-extraction-history-and-window-it the
    # round-2 loop paid (the A12 scale-killer in VERDICT r2).
    prior_latest = state.elog.read_latest(
        spark, g - 1, keys=found.select("url")
    ) if g > 0 else None
    if prior_latest is not None:
        extractions = extractions.join(
            prior_latest.select("url", F.col("data_hash").alias("prev_data_hash")),
            "url",
            "left",
        ).withColumn(
            "changed",
            F.col("prev_data_hash").isNull()
            | (F.col("prev_data_hash") != F.col("data_hash")),
        ).drop("prev_data_hash")
    else:
        extractions = extractions.withColumn("changed", F.lit(True))
    t0 = time.time()
    persistable = extractions.filter(F.col("is_valid"))
    if not cfg.persist_unchanged:
        # scrape.rs:265-268 skip_unchanged: drop unchanged rows BEFORE the
        # append; the elog delta below is built from the written batch, so
        # skipped urls keep their prior latest row untouched
        persistable = persistable.filter(F.col("changed"))
    # extractions_latest delta: this generation's valid rows reduced to one
    # per url (claim_pos tiebreak, matching get_latest). Built from the
    # just-written parquet — 3 columns read back beats re-running the
    # extraction lineage (and its prior-join) a second time.
    from ares_spark.operators.pipeline import latest_per_key

    def _elog_delta():
        ext_delta = latest_per_key(
            state.store.read_batch(spark, "extractions", g).select(
                "url", "data_hash", "claim_pos"
            ),
            ["url"],
            order_col="claim_pos",
            tiebreak=None,
        )
        state.elog.append_delta(ext_delta, g)
        state.elog.maybe_compact(spark, g)

    # the extraction append + its elog chain touch no state the spider or
    # the checkpoint barrier needs (different table dirs; elog is this
    # chain's alone), so the append — the single most expensive action of
    # a big generation — overlaps the spider's candidate build/rank
    # instead of serializing ahead of it. Concurrent first-materialization
    # of the shared `processed` cache is safe (per-partition cache locks);
    # the barrier below joins the chain before the manifest commits.
    from concurrent.futures import ThreadPoolExecutor

    _ext_pool = ThreadPoolExecutor(max_workers=1)

    def _ext_chain():
        t = time.time()
        state.store.append_batch(persistable, "extractions", g)
        _tick("extractions_append", t, g)
        _elog_delta()

    _ext_future = _ext_pool.submit(_ext_chain)

    # --- visit log (claim events, reference trace order) ----------------------
    visits = fetched.select(
        (F.lit(state.visit_base) + F.col("visit_seq") - 1).alias("visit_pos"),
        "url",
        F.when(F.col("html").isNotNull(), "completed").otherwise("fetch_error").alias("outcome"),
        F.lit(g).alias("generation"),
    )

    def _visits_append():
        state.store.append_batch(visits, "visits", g)

    # _visits_append joins the big checkpoint barrier below; the
    # extraction append + elog chain started above is already running
    # alongside the spider and joins the same barrier via its future —
    # one barrier per generation, every independent write overlapped.

    # --- spider: next-generation children -------------------------------------
    spider_src = processed.filter(
        F.col("crawl_session_id").isNotNull() & (F.col("depth") < F.col("max_depth"))
    )
    kids = (
        spider_src.select(
            "claim_pos", "job_id", "depth", "score", "max_depth", "max_pages",
            "allowed_domains", "url",
            F.posexplode("links").alias("link_rank", "link"),
        )
        .withColumn("link_host", F.regexp_extract("link", _HOST_RE, 1))
        # A15 domain filter; empty allowed_domains defaults to the PARENT
        # job's own host (worker.rs:293-301)
        .withColumn(
            "eff_allowed",
            F.when(
                F.size("allowed_domains") > 0, F.col("allowed_domains")
            ).otherwise(F.array(F.regexp_extract("url", _HOST_RE, 1))),
        )
        .filter(
            F.exists(
                "eff_allowed",
                lambda d: (F.col("link_host") == d)
                | F.col("link_host").endswith(F.concat(F.lit("."), d)),
            )
        )
    )
    if cfg.ssrf_filter:
        # A2: never enqueue private/reserved-IP or non-http(s) targets (the
        # reference validates at fetch time; the batch engine filters the
        # frontier so poisoned links don't occupy politeness budget)
        from ares_spark.operators.ssrf import fetchable_col

        kids = kids.filter(fetchable_col("link"))
    if state.robots_df is not None:
        # A5 at scale: join the robots TABLE by host (only hosts present in
        # this batch's links flow through; AQE broadcasts when small)
        kids = (
            kids.join(
                state.robots_df.withColumnRenamed("host", "link_host"),
                "link_host",
                "left",
            )
            .filter(_robots_allowed_col(cfg.user_agent)(F.col("link"), F.col("robots_txt")))
            .drop("robots_txt")
        )

    kids = kids.withColumn("link_hash", F.xxhash64("link")).withColumn(
        "host_shard", host_shard_col("link_host", cfg.n_shards)
    )
    # within-batch dedup: first occurrence in claim order wins (A16 ON
    # CONFLICT semantics under a deterministic order)
    w_dup = Window.partitionBy("link_hash").orderBy("claim_pos", "link_rank")
    kids = kids.withColumn("__dup_rn", F.row_number().over(w_dup)).filter(
        F.col("__dup_rn") == 1
    )
    # A16 seen-set anti-join (Bloom tier + exact backstop)
    from pyspark import StorageLevel

    candidates = kids.withColumnRenamed("link_hash", "url_hash")
    cand_pinned = None
    if cfg.use_bloom and state.visited > cfg.bloom_min_seen:
        if state.bloom_set is None:
            # first activation (or resume without sidecars): build from the
            # full seen log once; afterwards updates are O(new links)
            state.bloom_set = BloomSidecarSet(
                state.store.root / "blooms", cfg.bloom_capacity_per_shard
            )
            state.bloom_set.update(state.seen, generation=g - 1)
        # partition-local probing: repartition by (shard, salt) so each
        # task loads O(1) sidecars while a hot shard still spreads over
        # ~4 tasks; the closure ships only the sidecar directory path —
        # no driver-held bitmaps, no whole-set broadcast
        salt_slots = max(1, (4 * salt_n) // max(1, cfg.n_shards))
        maybe = state.bloom_set.probe_col()
        # persist: the maybe/not-maybe split consumes candidates TWICE —
        # without it the whole spider lineage (explode + filters + dedup
        # window) re-executes per branch
        cand_pinned = (
            candidates.repartition(
                salt_n, F.col("host_shard"), F.pmod(F.col("url_hash"), F.lit(salt_slots))
            )
            .withColumn("__maybe_seen", maybe)
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        new_fast = cand_pinned.filter(~F.col("__maybe_seen")).drop("__maybe_seen")
        suspects = cand_pinned.filter(F.col("__maybe_seen")).drop("__maybe_seen")
        rescued = suspects.join(state.seen.select("url_hash"), "url_hash", "left_anti")
        fresh = new_fast.unionByName(rescued)
    else:
        fresh = candidates.join(state.seen.select("url_hash"), "url_hash", "left_anti")
    # A17 max_pages: budget over *visited* count, deterministic order.
    # The fresh-count job is FOLDED into the distributed rank's
    # partition-offset pass (global_rank_counted): one job materializes
    # the candidate lineage (bloom probes included), range-orders it, and
    # returns n_fresh — at web scale a generation can emit 10M+ fresh
    # links and an unpartitioned window here would be the serial section.
    visited = state.visited
    budget_left = max(cfg.max_pages - visited, 0)
    from ares_spark.operators.ranking import global_rank_counted

    # persist BEFORE ranking: repartitionByRange runs a range-boundary
    # SAMPLING pass over its input ahead of the shuffle — unpersisted,
    # the whole candidate lineage (UDF filters, bloom probes, dedup
    # window) would execute twice per generation (measured 2× wall at
    # local[16]). The sampling pass populates this pin; the shuffle and
    # every later consumer read the cache.
    fresh_pinned = fresh.persist(StorageLevel.MEMORY_AND_DISK)
    ranked_fresh, n_fresh = global_rank_counted(
        fresh_pinned, [F.col("claim_pos"), F.col("link_rank")], out_col="__rank"
    )
    t0 = _tick("spider_rank+count", t0, g)
    capped = ranked_fresh.filter(F.col("__rank") <= budget_left)
    children = capped.select(
        F.md5(F.concat_ws(":", F.lit(session_id), (F.lit(state.seq_base) + F.col("__rank") - 1), "link")).alias("job_id"),
        F.col("link").alias("url"),
        F.col("url_hash"),
        F.col("link_host").alias("host"),
        F.col("host_shard"),
        F.lit(cfg.schema_spec).alias("schema_name"),
        F.lit("pending").alias("status"),
        F.lit(0).alias("retry_count"),
        F.lit(cfg.max_retries).alias("max_retries"),
        F.lit(None).cast("double").alias("next_retry_at"),
        (F.lit(state.seq_base) + F.col("__rank") - 1).alias("created_seq"),
        F.lit(state.batch_ts).alias("created_at"),
        F.lit(session_id).alias("crawl_session_id"),
        F.col("job_id").alias("parent_job_id"),
        (F.col("depth") + 1).alias("depth"),
        child_score_expr(cfg).alias("score"),
        F.col("max_depth"),
        F.col("max_pages"),
        F.col("allowed_domains"),
        F.lit(g + 1).alias("generation"),
        F.lit(None).cast("string").alias("error"),
    ).cache()
    # n_children needs no extra job: the budget filter keeps exactly
    # min(n_fresh, budget_left) rows (__rank is dense from 1)
    n_children = min(n_fresh, budget_left)

    # --- frontier state transitions (A21/A22) ---------------------------------
    # merge-on-read: the generation's DELTA is just the claimed rows with
    # their new state + the new children — O(batch), never the O(frontier)
    # full-table join+rewrite. Unclaimed pending rows are simply not
    # rewritten; FrontierLog resolves latest-wins per job_id at read.
    frontier_cols = [f.name for f in FRONTIER_SCHEMA.fields]
    fetch_failed = F.col("html").isNull()
    changed = (
        fetched.withColumn(
            # can_retry() gates on the OLD count (job.rs:125-127:
            # retry_count < max_retries) → max_retries retries after the
            # initial attempt, i.e. max_retries+1 total claims
            "status",
            F.when(~fetch_failed, "completed")
            .when(F.col("retry_count") < F.col("max_retries"), "pending")
            .otherwise("failed"),
        )
        .withColumn(
            # increments ONLY when a retry is scheduled
            # (job_repository.rs:211: retry_count + 1 iff next_retry set);
            # a permanent fail keeps the old count
            "retry_count",
            F.when(
                fetch_failed & (F.col("status") == "pending"), F.col("retry_count") + 1
            ).otherwise(F.col("retry_count")),
        )
        .withColumn(
            "next_retry_at",
            F.when(
                fetch_failed & (F.col("status") == "pending"),
                F.lit(state.batch_ts) + retry_delay_expr("retry_count"),
            ).otherwise(F.lit(None).cast("double")),
        )
        .withColumn(
            "error",
            F.when(
                fetch_failed,
                # live mode carries the real failure (timeout / HTTP code /
                # SSRF reason); pages mode has exactly one failure cause
                F.coalesce(F.col("fetch_error"), F.lit("fetch_error"))
                if "fetch_error" in fetched.columns
                else F.lit("fetch_error: url not in pages"),
            ).otherwise(F.col("error")),
        )
        .select(*frontier_cols)
    )
    delta = changed.unionByName(children.select(*frontier_cols))

    new_seen = children.select(
        F.lit(session_id).alias("crawl_session_id"),
        "url_hash",
        "url",
        "host_shard",
        F.lit(state.batch_ts).alias("created_at"),
    )

    # --- lineage + snapshots ----------------------------------------------------
    # six INDEPENDENT actions (different tables / disjoint driver state)
    # run concurrently — their cost is job latency, not compute, and the
    # barrier below is the only ordering the manifest commit needs:
    #   1. bloom sidecar RMW (new_seen)
    #   2. host-shard stats + breaker feed (fetched; mutates state.breaker
    #      ONLY in this thunk). Driver collects ≤ n_shards rows + a
    #      BOUNDED top-K failing-host feed — never every host
    #   3. frontier delta append (delta) — chained inside its thread:
    #      frontier compaction, the next-generation frontier read, and
    #      the NEXT generation's claim ordering (order_counted), all of
    #      which depend only on the delta being durable. Prefetching the
    #      ordering here removes it from the next generation's serial
    #      section entirely (its rank pins are handed to _drive).
    #   4. url_seen append — INSERT-only (ON CONFLICT DO NOTHING
    #      semantics): per-generation appends, O(new links), never a
    #      rewrite of the 10^10-row set
    #   5. extractions_latest delta (+ its compaction)
    #   6. visits append
    shard_rows: list = []

    def _bloom_update():
        if state.bloom_set is not None:
            # distributed read-modify-write of the per-shard sidecars — the
            # update itself persists them (resume picks the files back up)
            state.bloom_set.update(new_seen, generation=g)

    def _stats_and_breaker():
        # persist: one groupBy over the (cached) batch feeds BOTH the
        # shard rollup and the breaker feed
        host_stats = fetched.groupBy("host", "host_shard").agg(
            F.sum(F.col("html").isNotNull().cast("int")).alias("ok"),
            F.sum(F.col("html").isNull().cast("int")).alias("err"),
        ).persist(StorageLevel.MEMORY_AND_DISK)
        shard_rows.extend(
            host_stats.groupBy("host_shard")
            .agg(F.sum("ok").alias("ok"), F.sum("err").alias("err"))
            .collect()
        )
        feed = host_stats.filter(F.col("err") > 0).orderBy(
            F.col("err").desc(), "host"
        ).limit(cfg.breaker_feed_top_k)
        if state.breaker.hosts:
            tracked_df = spark.createDataFrame(
                [(h,) for h in sorted(state.breaker.hosts)], "host string"
            )
            feed = feed.unionByName(
                host_stats.join(F.broadcast(tracked_df), "host", "left_semi")
            ).dropDuplicates(["host"])
        for r in feed.collect():
            state.breaker.record(r.host, int(r.ok), int(r.err), g)
        host_stats.unpersist()

    compact_cell: list = []
    frontier_cell: list = []
    prefetch_cell: list = []

    def _frontier_delta():
        state.flog.append_delta(delta, g)
        # compaction BEFORE the next-frontier read: the read's lineage
        # must never straddle a base-dir swap
        compact_cell.append(state.flog.maybe_compact(spark, g))
        nxt = state.flog.read_live(spark, g).persist(StorageLevel.MEMORY_AND_DISK)
        frontier_cell.append(nxt)
        if g + 1 < cfg.max_generations and cfg.prefetch_ordering:
            # prefetch the NEXT generation's claim ordering while the
            # sibling writes run. Pin-handoff invariant: no other thread
            # ranks between watermark and take (_parallel_actions peers
            # here run appends/collects only)
            from ares_spark.operators.ranking import pin_watermark, take_pins_since

            next_ts = state.batch_ts + cfg.batch_interval_s
            mark = pin_watermark()
            nb, nn = order_counted(claimable(nxt, next_ts), cfg.ordering)
            prefetch_cell.append(
                {"batch": nb, "n": nn, "batch_ts": next_ts,
                 "pins": take_pins_since(mark)}
            )

    def _url_seen_append():
        state.store.append_batch(new_seen, "url_seen", g)

    try:
        _parallel_actions(_bloom_update, _stats_and_breaker, _frontier_delta,
                          _url_seen_append, _visits_append,
                          _ext_future.result)
    finally:
        _ext_pool.shutdown(wait=False)
    t0 = _tick("checkpoint+prefetch(par x6)", t0, g)
    shard_stats: dict[int, dict] = {}
    for r in shard_rows:
        shard_stats[int(r.host_shard)] = {"fetched": int(r.ok), "errors": int(r.err)}

    n_batch = int(sum(s["fetched"] + s["errors"] for s in shard_stats.values()))
    compacted = compact_cell[0]
    if compacted:
        t0 = _tick("frontier_compact", t0, g)
    # bound the dir count of the append-only logs (Iceberg bin-packing,
    # emulated): fold only generations ≤ the last PUBLISHED manifest —
    # a crashed generation re-runs with overwrite-by-dir idempotency,
    # which needs its own batch dir un-merged
    for log_table in ("url_seen", "visits", "extractions"):
        state.store.compact_log(spark, log_table, g - 1,
                                max_runs=2 * cfg.compact_interval)
    t0 = _tick("log_compaction", t0, g)
    summary = {
        "generation": g,
        "session_id": session_id,
        "batch_ts": state.batch_ts + cfg.batch_interval_s,
        "claimed": n_batch,
        "completed": int(sum(s["fetched"] for s in shard_stats.values())),
        "errors": int(sum(s["errors"] for s in shard_stats.values())),
        "new_children": int(n_children),
        "seen_total": visited + int(n_children),
        "seq_base": state.seq_base + int(n_children),
        "visit_base": state.visit_base + n_batch,
        "shards": shard_stats,
        "breaker": state.breaker.to_dict(),
        "frontier_compacted": compacted,
    }
    state.store.write_manifest(g, summary)

    fetched.unpersist()
    processed.unpersist()
    if cand_pinned is not None:
        cand_pinned.unpersist()
    fresh_pinned.unpersist()
    children.unpersist()
    # release the distributed-rank exchanges pinned this generation
    from ares_spark.operators.ranking import release_rank_pins

    release_rank_pins()

    # re-read from the log: truncates the iterative lineage (plan growth is
    # the classic iterative-Spark failure mode) and makes resume == hot path.
    # The resolved live view (persisted) and next generation's ordering
    # were both produced inside the _frontier_delta thread above.
    prev_frontier = state.frontier
    state.frontier = frontier_cell[0]
    prev_frontier.unpersist()
    state.prefetch = prefetch_cell[0] if prefetch_cell else None
    state.seen = _read_seen(spark, state.store, g)
    state.batch_ts += cfg.batch_interval_s
    state.seq_base = summary["seq_base"]
    state.visit_base = summary["visit_base"]
    state.visited = summary["seen_total"]
    state.generation = g + 1
    return summary


def job_control(
    spark: SparkSession, checkpoint_dir: str, op: str, urls: list[str]
) -> dict:
    """Operator-facing job control between generations — the batch form of
    job_repository.rs:230-244 (cancel_job) and :296-319 (retry_job).

    ``op='cancel'``: matching rows not already completed/cancelled move to
    'cancelled' (terminal; never claimed again). ``op='reset'``: matching
    failed/cancelled rows become fresh pending (retry_count=0, error and
    backoff cleared) so the next resume claims them again.

    The transition delta is appended as its OWN generation with a manifest
    carrying the crawl counters forward, so the op is itself checkpointed,
    crash-safe (overwrite-by-dir idempotent), and visible to a subsequent
    resume_crawl exactly like any other generation."""
    from ares_spark.crawl.frontier import cancel_jobs, reset_jobs

    if op not in ("cancel", "reset"):
        raise ValueError(f"unknown job-control op: {op!r}")
    store = SnapshotStore(checkpoint_dir)
    meta = json.loads((store.root / "config.json").read_text())
    cfg = CrawlConfig(**meta["cfg"])
    g = store.latest_generation()
    if g is None:
        raise FileNotFoundError("no manifest to apply a job-control op to")
    man = store.read_manifest(g)
    flog = FrontierLog(store, compact_interval=cfg.compact_interval)
    targets = [canonicalize_url(u) for u in urls]
    sel = flog.read_full(spark, g).filter(F.col("url").isin(targets))
    delta = cancel_jobs(sel) if op == "cancel" else reset_jobs(sel)
    n = delta.count()
    flog.append_delta(delta, g + 1)
    summary = {
        **man,
        "generation": g + 1,
        "claimed": 0, "completed": 0, "errors": 0, "new_children": 0,
        "control_op": {"op": op, "urls": targets, "rows": n},
    }
    store.write_manifest(g + 1, summary)
    return summary


def seed_frontier_from_df(
    links: DataFrame, cfg: CrawlConfig, session_id: str, t0: float = 0.0,
    url_col: str = "url",
) -> DataFrame:
    """Distributed frontier seeding — the scale path for bootstraps too
    big for the driver-side list (a WAT link graph, a 10^9-row seed
    table). Canonicalize (Arrow-batched) → distinct → deterministic
    0-based created_seq via the auto-switching global rank (alphabetical
    url order — reproducible at any partitioning) → frontier rows, no
    driver materialization anywhere. Feed to run_crawl(seed_df=...)."""
    from ares_spark.functions.urls import canonical_url_col

    urls = (
        links.select(canonical_url_col(F.col(url_col)).alias("url"))
        .filter(F.col("url").isNotNull())
        .distinct()
    )
    ranked = global_order_rank(urls, [F.col("url").asc()], out_col="__seq")
    seq0 = (F.col("__seq") - 1).cast("long")
    return ranked.select(
        F.md5(F.concat_ws(":", F.lit(session_id), seq0.cast("string"), F.col("url"))).alias("job_id"),
        F.col("url"),
        url_hash_col("url").alias("url_hash"),
        F.regexp_extract("url", _HOST_RE, 1).alias("host"),
        host_shard_col(F.regexp_extract("url", _HOST_RE, 1), cfg.n_shards).alias("host_shard"),
        F.lit(cfg.schema_spec).alias("schema_name"),
        F.lit("pending").alias("status"),
        F.lit(0).alias("retry_count"),
        F.lit(cfg.max_retries).alias("max_retries"),
        F.lit(None).cast("double").alias("next_retry_at"),
        seq0.alias("created_seq"),
        F.lit(t0).alias("created_at"),
        F.lit(session_id).alias("crawl_session_id"),
        F.lit(None).cast("string").alias("parent_job_id"),
        F.lit(0).alias("depth"),
        F.lit(1.0 if cfg.score_mode == "parent_decay" else 0.0).alias("score"),
        F.lit(cfg.max_depth).alias("max_depth"),
        F.lit(cfg.max_pages).alias("max_pages"),
        F.array(*[F.lit(d) for d in cfg.allowed_domains]).cast("array<string>").alias("allowed_domains"),
        F.lit(0).alias("generation"),
        F.lit(None).cast("string").alias("error"),
    ).select(*[f.name for f in FRONTIER_SCHEMA.fields])
