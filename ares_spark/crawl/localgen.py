"""Driver-local small-generation fast path for the BFS crawl loop.

THE PROBLEM (BENCH.md round-4/5 campaigns): the BFS ramp — the first ~5
generations of a fanout-F crawl, sized 1, F, F², ... — costs ~25-30s of
pure control-plane latency at ANY core count: each tiny generation pays
the same 4-6 Spark job launches as a 10M-row generation, and Amdahl
charges that constant serially. The same shape recurs mid-crawl for
politeness-capped or retry-only generations. This is the dominant serial
section keeping the full-loop 4→16-core efficiency below the north
rule's 0.8 (the data plane alone measures 0.92).

THE FIX — the AQE move, applied to the whole generation: when the
claimable batch is tiny, executing it distributed buys nothing (Spark
itself rewrites tiny shuffles into local reads for the same reason).
``LocalCrawl`` runs the ENTIRE generation on the driver in
pandas/pure-Python — claim ordering, politeness caps, extraction,
spidering, seen-dedup, state transitions — using the SAME kernels the
distributed path runs inside its Arrow UDFs (``process_html``,
``extract_structured``, ``fetchable_series``, ``RobotsMatcher``, the
``spark_xxhash64`` twin whose parity with ``F.xxhash64`` is pinned in
tests/test_units.py), and writes the IDENTICAL checkpoint layout
(parquet dirs + ``_SUCCESS`` + manifests) through pyarrow. Because ALL
state handoff goes through that on-disk layout, local and distributed
generations interleave freely: the ramp runs local, the first
over-threshold generation hydrates the Spark path from the same files,
and resume works from either. Trace parity local==distributed is pinned
across the config matrix in tests/test_localgen.py.

The only Spark action a local generation issues is the corpus lookup
("fetch"): one bounded ``IN``-probe scan (bucket-pruned when the corpus
is a BucketedPages). Everything else is microseconds of driver work, so
a ramp generation costs ~1 job instead of ~6.

Scale honesty: this path is gated by ``cfg.local_max_batch`` (batch
rows) and ``cfg.local_max_state`` (total enqueued urls) — bounds chosen
so the hydrated frontier/seen/extraction-latest state is trivially
driver-sized. The fetch also collects the batch's html payloads to the
driver: size ``local_max_batch`` against page weight (2048 × ~100 KB
real CC pages ≈ 200 MB; drop the knob if pages run to megabytes). Beyond the gates — and the moment the Bloom sidecar tier
would activate — the loop hands off to the distributed path and never
comes back (the sidecars are maintained distributed-only; a local
generation must not run while sidecars exist or they would silently
miss its keys). At a 10^10-url frontier the gates confine this path to
exactly where it belongs: the seed ramp and tiny tail generations.

Reference anchor: the serial worker's whole loop is "local"
(/root/reference/crates/ares-core/src/worker.rs); this module is that
worker resurrected as the small-batch executor of the distributed
engine, state-compatible with it by construction.
"""

from __future__ import annotations

import hashlib
import math
import re
import shutil
import time
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

from ares_spark.crawl.robots import RobotsMatcher
from ares_spark.functions.xxh64 import spark_xxhash64

_HOST_RE = re.compile(r"^https?://(?:[^@/]*@)?([^/:?#]+)")
_MAX_CONTENT_CHARS = 500_000  # scrape_fused default (loop.py extract stage)

# -- arrow schemas (must mirror what the Spark writers produce) ---------------

_S, _I, _L, _D, _B = pa.string(), pa.int32(), pa.int64(), pa.float64(), pa.bool_()
_SL = pa.list_(pa.string())

FRONTIER_PA = pa.schema([
    ("job_id", _S), ("url", _S), ("url_hash", _L), ("host", _S),
    ("host_shard", _I), ("schema_name", _S), ("status", _S),
    ("retry_count", _I), ("max_retries", _I), ("next_retry_at", _D),
    ("created_seq", _L), ("created_at", _D), ("crawl_session_id", _S),
    ("parent_job_id", _S), ("depth", _I), ("score", _D), ("max_depth", _I),
    ("max_pages", _I), ("allowed_domains", _SL), ("generation", _I),
    ("error", _S), ("state_gen", _I),
])

SEEN_PA = pa.schema([
    ("crawl_session_id", _S), ("url_hash", _L), ("url", _S),
    ("host_shard", _I), ("created_at", _D),
])

EXTRACTIONS_PA = pa.schema([
    ("job_id", _S), ("url", _S), ("schema_name", _S), ("extracted_data", _S),
    ("content_hash", _S), ("data_hash", _S), ("model", _S), ("is_valid", _B),
    ("validation_errors", _SL), ("ungrounded_paths", _SL),
    ("created_at", _D), ("generation", _I), ("claim_pos", _L), ("changed", _B),
])

ELOG_PA = pa.schema([
    ("url", _S), ("data_hash", _S), ("claim_pos", _L), ("state_gen", _I),
])

VISITS_PA = pa.schema([
    ("visit_pos", _L), ("url", _S), ("outcome", _S), ("generation", _I),
])


def _write_dir(rows: list[dict], schema: pa.Schema, dir_path: Path) -> None:
    """Overwrite-by-dir parquet write with the Spark committer's contract:
    data first, ``_SUCCESS`` marker last (a crash mid-write leaves the dir
    uncommitted and checkpoint readers skip it)."""
    if dir_path.exists():
        shutil.rmtree(dir_path)
    dir_path.mkdir(parents=True)
    pq.write_table(pa.Table.from_pylist(rows, schema=schema),
                   dir_path / "part-00000.parquet")
    (dir_path / "_SUCCESS").touch()


def _read_dir_rows(path, columns=None) -> list[dict]:
    return pq.read_table(str(path), columns=columns).to_pylist()


def _pmod(a: int, n: int) -> int:
    return a % n  # python % is already non-negative for positive n (= F.pmod)


def _host_of(url: str) -> str:
    m = _HOST_RE.search(url or "")
    return m.group(1) if m else ""  # regexp_extract: no match -> ""


def local_eligible(state, cfg, robots_raw) -> bool:
    """Gates under which a generation may run driver-local. Bloom: the
    sidecar tier is maintained by the distributed path only, so local
    generations are allowed only while no sidecars exist AND the seen
    set is still below the activation threshold (a later first
    activation rebuilds from the full url_seen log, which includes every
    locally-written generation)."""
    return (
        cfg.local_max_batch > 0
        and cfg.fetch_mode == "pages"
        and (robots_raw is None or isinstance(robots_raw, dict))
        and state.bloom_set is None
        and not (cfg.use_bloom and state.visited > cfg.bloom_min_seen)
        and state.seq_base <= cfg.local_max_state
    )


class LocalCrawl:
    """Driver-held mirror of the crawl state (live frontier, seen-hash
    set, latest-extraction-per-url), hydrated from the checkpoint dirs
    and kept in lockstep by applying each local generation's own deltas."""

    def __init__(self, cfg, robots: dict | None, schema: dict, session_id: str):
        self.cfg = cfg
        self.schema = schema
        self.session_id = session_id
        self.robots = dict(robots or {})
        # politeness budgets: mirror of _robots_assets delay_of + filter>0
        self.budgets = {}
        for host, txt in self.robots.items():
            d = float(RobotsMatcher.parse(txt or "").crawl_delay(cfg.user_agent) or 0.0)
            if d > 0:
                self.budgets[host] = d
        self._robots_memo: dict[str, RobotsMatcher] = {}
        self.frontier: dict[str, dict] = {}   # job_id -> live pending row
        self.seen: set[int] = set()           # url_hash of url_seen log
        self.elog: dict[str, str] = {}        # url -> latest data_hash

    # -- hydration from the on-disk checkpoint --------------------------------

    @classmethod
    def hydrate(cls, state, cfg, robots_raw, schema, session_id) -> "LocalCrawl":
        lc = cls(cfg, robots_raw if isinstance(robots_raw, dict) else None,
                 schema, session_id)
        g0 = state.generation - 1
        # frontier live view == FrontierLog._resolved(pending only)
        flog = state.flog
        bases = [b for b in flog._base_gens() if b <= g0 + 1]
        if not bases:
            raise FileNotFoundError(f"no frontier base at or before g{g0}")
        b = bases[-1]
        paths = [flog.dir / f"base-g{b:04d}"] + [
            Path(p) for p in flog._delta_dirs(b, g0)
        ]
        best: dict[str, dict] = {}
        for p in paths:
            for r in _read_dir_rows(p):
                if "score" not in r or r["score"] is None:
                    r["score"] = 0.0  # _backfill_score parity
                prev = best.get(r["job_id"])
                if prev is None or r["state_gen"] > prev["state_gen"]:
                    best[r["job_id"]] = r
        for jid, r in best.items():
            if r["status"] == "pending":
                r.pop("state_gen", None)
                lc.frontier[jid] = r
        # seen set (url_seen log <= g0)
        for lo, hi, p in state.store._log_dirs("url_seen"):
            if hi <= g0:
                for r in _read_dir_rows(p, columns=["url_hash"]):
                    lc.seen.add(r["url_hash"])
        # extractions_latest (LatestStateLog resolution: state_gen desc,
        # claim_pos desc)
        elog = state.elog
        ebases = [x for x in elog._base_gens() if x <= g0 + 1]
        epaths = ([elog.dir / f"base-g{ebases[-1]:04d}"] if ebases else []) + [
            Path(p) for p in elog._delta_dirs(ebases[-1] if ebases else 0, g0)
        ]
        ebest: dict[str, tuple] = {}
        for p in epaths:
            for r in _read_dir_rows(p):
                key = (r["state_gen"], r["claim_pos"])
                prev = ebest.get(r["url"])
                if prev is None or key > prev[0]:
                    ebest[r["url"]] = (key, r["data_hash"])
        lc.elog = {u: v[1] for u, v in ebest.items()}
        return lc

    # -- claim ordering (frontier.py order_fifo / order_host_rr) --------------

    def _claimable(self, batch_ts: float) -> list[dict]:
        return [
            r for r in self.frontier.values()
            if r["next_retry_at"] is None or r["next_retry_at"] <= batch_ts
        ]

    @staticmethod
    def _order(rows: list[dict], ordering: str) -> list[dict]:
        """Claim order == the distributed rank's total order; claim_pos is
        assigned 1..n by the caller."""
        def nra(r):
            return (0, 0.0) if r["next_retry_at"] is None else (1, r["next_retry_at"])

        if ordering == "fifo":
            return sorted(rows, key=lambda r: (*nra(r), r["created_seq"]))
        # host_rr: rank within host by (nra, depth, score desc nulls last,
        # created_seq), then interleave by (host_rank, host, created_seq)
        by_host: dict = {}
        for r in rows:
            by_host.setdefault(r["host"], []).append(r)
        hrank = {}
        for rs in by_host.values():
            rs.sort(key=lambda r: (
                *nra(r), r["depth"],
                (1, 0.0) if r["score"] is None else (0, -r["score"]),
                r["created_seq"],
            ))
            for i, r in enumerate(rs):
                hrank[r["job_id"]] = i + 1
        return sorted(rows, key=lambda r: (
            hrank[r["job_id"]],
            (r["host"] is None, r["host"] or ""),  # asc nulls first
            r["created_seq"],
        ))

    # -- politeness / breaker caps (loop.py caps block) -----------------------

    def _apply_caps(self, batch, breaker_caps, g):
        cfg = self.cfg
        hrn: dict = {}
        kept = []
        for r in batch:  # batch is in claim order -> per-host row_number
            h = r["host"]
            hrn[h] = hrn.get(h, 0) + 1
            vals = []
            if cfg.per_host_budget is not None:
                vals.append(cfg.per_host_budget)
            delay = self.budgets.get(h) if self.budgets else None
            if delay is not None:
                if cfg.politeness_jitter_ms > 0:
                    roll = _pmod(
                        spark_xxhash64(h, g, cfg.politeness_jitter_seed),
                        cfg.politeness_jitter_ms + 1,
                    )
                    delay = delay + roll / 1000.0
                vals.append(max(1, math.floor(cfg.politeness_window_s / delay)))
            cap = breaker_caps.get(h)
            if cap is not None:
                vals.append(cap)
            if not vals or hrn[h] <= min(vals):  # F.least skips nulls
                kept.append(r)
        return kept

    # -- one generation (mirrors loop._run_generation row for row) ------------

    def step(self, spark, pages, state, _cfg=None) -> dict | str:
        """Run one generation driver-local. Returns the manifest summary
        dict, or one of the signals: "handoff" (batch/state outgrew the
        gates — caller switches to the distributed path), "warped"
        (nothing claimable yet; logical clock advanced to the earliest
        retry), "done" (frontier drained)."""
        cfg, g = self.cfg, state.generation
        if (cfg.use_bloom and state.visited > cfg.bloom_min_seen) or \
                state.seq_base > cfg.local_max_state:
            return "handoff"
        claim = self._claimable(state.batch_ts)
        if not claim:
            nxts = [r["next_retry_at"] for r in self.frontier.values()
                    if r["next_retry_at"] is not None]
            if not nxts:
                return "done"
            state.batch_ts = float(min(nxts))
            return "warped"
        if len(claim) > cfg.local_max_batch:
            return "handoff"
        t0 = time.time()
        batch = [dict(r) for r in self._order(claim, cfg.ordering)]
        for i, r in enumerate(batch):
            r["claim_pos"] = i + 1

        # politeness + breaker caps
        breaker_caps: dict[str, int] = {}
        for h in list(state.breaker.hosts):
            cap = state.breaker.claim_budget(h, g)
            if cap is not None:
                breaker_caps[h] = cap
        caps_active = (
            cfg.per_host_budget is not None or bool(self.budgets)
            or bool(breaker_caps)
        )
        if caps_active:
            batch = self._apply_caps(batch, breaker_caps, g)
            if breaker_caps and min(breaker_caps.values()) == 0 and not batch:
                # all-suppressed generation: tick the clock (breaker
                # recovery unit) without burning a fetch cycle
                summary = {
                    "generation": g, "session_id": self.session_id,
                    "batch_ts": state.batch_ts + cfg.batch_interval_s,
                    "claimed": 0, "completed": 0, "errors": 0,
                    "new_children": 0, "seen_total": state.visited,
                    "seq_base": state.seq_base, "visit_base": state.visit_base,
                    "shards": {}, "breaker": state.breaker.to_dict(),
                    "suppressed": True,
                }
                state.store.write_manifest(g, summary)
                state.batch_ts += cfg.batch_interval_s
                state.generation = g + 1
                return summary
        for i, r in enumerate(batch):  # dense visit positions post-cap
            r["visit_seq"] = i + 1

        # fetch: the one Spark action (bounded IN-probe corpus lookup)
        html_by_url = self._fetch(spark, pages, batch)
        found = [r for r in batch if html_by_url.get(r["url"]) is not None]
        self._tick("local fetch", t0, g)

        # extract (scrape_fused kernel, driver-side) + A12 change detection
        ext_rows, links_of = self._extract(found, html_by_url, state.batch_ts, g)
        persistable = [
            r for r in ext_rows
            if r["is_valid"] and (cfg.persist_unchanged or r["changed"])
        ]
        _write_dir(persistable, EXTRACTIONS_PA,
                   state.store.root / "extractions" / f"batch-g{g:04d}")
        # extractions_latest delta: one row per url, claim_pos tiebreak
        latest: dict[str, dict] = {}
        for r in persistable:
            prev = latest.get(r["url"])
            if prev is None or r["claim_pos"] > prev["claim_pos"]:
                latest[r["url"]] = r
        delta_rows = [
            {"url": r["url"], "data_hash": r["data_hash"],
             "claim_pos": r["claim_pos"], "state_gen": g}
            for r in latest.values()
        ]
        _write_dir(delta_rows, ELOG_PA, state.elog.dir / f"batch-g{g:04d}")
        self._elog_compact(state.elog, g)
        for r in delta_rows:
            self.elog[r["url"]] = r["data_hash"]

        # visits log
        _write_dir(
            [
                {"visit_pos": state.visit_base + r["visit_seq"] - 1,
                 "url": r["url"],
                 "outcome": "completed" if html_by_url.get(r["url"]) is not None
                 else "fetch_error",
                 "generation": g}
                for r in batch
            ],
            VISITS_PA, state.store.root / "visits" / f"batch-g{g:04d}",
        )

        # spider -> children
        children, new_seen = self._spider(found, links_of, state, g)

        # frontier transitions + delta
        transitions = []
        for r in batch:
            row = {k: r[k] for k in _FRONTIER_COLS}
            if html_by_url.get(r["url"]) is not None:
                row["status"] = "completed"
            elif r["retry_count"] < r["max_retries"]:
                row["status"] = "pending"
                row["retry_count"] = r["retry_count"] + 1
                row["next_retry_at"] = state.batch_ts + _retry_delay(row["retry_count"])
                row["error"] = "fetch_error: url not in pages"
            else:
                row["status"] = "failed"
                row["next_retry_at"] = None
                row["error"] = "fetch_error: url not in pages"
            transitions.append(row)
        delta = transitions + [
            {k: c[k] for k in _FRONTIER_COLS} for c in children
        ]
        for row in delta:
            row["state_gen"] = g
        _write_dir(delta, FRONTIER_PA, state.flog.dir / f"batch-g{g:04d}")
        compacted = self._flog_compact(state.flog, g, delta)
        _write_dir(new_seen, SEEN_PA,
                   state.store.root / "url_seen" / f"batch-g{g:04d}")
        for r in new_seen:
            self.seen.add(r["url_hash"])

        # breaker + per-shard lineage (stats over the claimed batch)
        host_stats: dict[str, list] = {}
        shard_stats: dict[int, dict] = {}
        for r in batch:
            ok = 1 if html_by_url.get(r["url"]) is not None else 0
            hs = host_stats.setdefault(r["host"], [0, 0])
            hs[0] += ok
            hs[1] += 1 - ok
            ss = shard_stats.setdefault(
                int(r["host_shard"]), {"fetched": 0, "errors": 0})
            ss["fetched"] += ok
            ss["errors"] += 1 - ok
        failing = sorted(
            ((h, s) for h, s in host_stats.items() if s[1] > 0),
            key=lambda x: (-x[1][1], x[0] if x[0] is not None else ""),
        )[: cfg.breaker_feed_top_k]
        feed = {h: s for h, s in failing}
        for h in state.breaker.hosts:
            if h in host_stats:
                feed.setdefault(h, host_stats[h])
        for h, (ok, err) in feed.items():
            state.breaker.record(h, ok, err, g)

        self._log_compaction(state.store, g, cfg)
        n_batch = len(batch)
        summary = {
            "generation": g, "session_id": self.session_id,
            "batch_ts": state.batch_ts + cfg.batch_interval_s,
            "claimed": n_batch,
            "completed": sum(s["fetched"] for s in shard_stats.values()),
            "errors": sum(s["errors"] for s in shard_stats.values()),
            "new_children": len(children),
            "seen_total": state.visited + len(children),
            "seq_base": state.seq_base + len(children),
            "visit_base": state.visit_base + n_batch,
            "shards": shard_stats,
            "breaker": state.breaker.to_dict(),
            "frontier_compacted": compacted,
        }
        state.store.write_manifest(g, summary)

        # frontier dict <- delta (latest-wins; terminal rows drop out)
        for row in delta:
            live = {k: row[k] for k in _FRONTIER_COLS}
            if row["status"] == "pending":
                self.frontier[row["job_id"]] = live
            else:
                self.frontier.pop(row["job_id"], None)
        state.batch_ts += cfg.batch_interval_s
        state.seq_base = summary["seq_base"]
        state.visit_base = summary["visit_base"]
        state.visited = summary["seen_total"]
        state.generation = g + 1
        self._tick("local gen total", t0, g)
        return summary

    # -- stages ----------------------------------------------------------------

    def _fetch(self, spark, pages, batch) -> dict:
        """url -> html for the batch (the sandbox "fetch"): ONE bounded
        Spark probe — bucket-pruned when the corpus is a BucketedPages
        (bucket ids derived from the url_hash the frontier already
        carries, no Spark job for the bucket set)."""
        from pyspark.sql import functions as F

        from ares_spark.crawl.pagestore import BucketedPages

        urls = [r["url"] for r in batch]
        if isinstance(pages, BucketedPages):
            buckets = sorted({
                _pmod(r["url_hash"], pages.n_buckets) for r in batch
            })
            scan = pages.scan_buckets(spark, buckets)
        else:
            scan = pages
        rows = (
            scan.select("url", "html")
            .filter(F.col("url").isin(urls))
            .collect()
        )
        return {r.url: (bytes(r.html) if r.html is not None else None)
                for r in rows}

    def _extract(self, found, html_by_url, batch_ts, g):
        """scrape_fused's kernel (clean+hash+extract+validate+ground with
        a content-hash memo) + the loop's A12 change detection."""
        from ares_spark.html import process_html
        from ares_spark.operators.extract import canonical_json, extract_structured
        from ares_spark.operators.groundedness import ungrounded_fields
        from ares_spark.operators.validate import validate_extracted_output

        cfg = self.cfg
        memo: dict[str, tuple] = {}
        ext_rows, links_of = [], {}
        for r in found:
            raw = html_by_url[r["url"]].decode("utf-8", "replace")
            text, links = process_html(raw, r["url"] or "", _MAX_CONTENT_CHARS)
            links_of[r["job_id"]] = links
            chash = hashlib.sha256(text.encode()).hexdigest()
            hit = memo.get(chash)
            if hit is None:
                value = extract_structured(text, self.schema)
                errors = validate_extracted_output(self.schema, value)
                ung = ungrounded_fields(text, value) if not errors else []
                hit = (canonical_json(value), not errors, errors, ung)
                if len(memo) < 100_000:
                    memo[chash] = hit
            data_hash = hashlib.sha256(hit[0].encode()).hexdigest()
            prev = self.elog.get(r["url"])
            ext_rows.append({
                "job_id": r["job_id"], "url": r["url"],
                "schema_name": cfg.schema_spec, "extracted_data": hit[0],
                "content_hash": chash, "data_hash": data_hash,
                "model": cfg.model, "is_valid": hit[1],
                "validation_errors": hit[2], "ungrounded_paths": hit[3],
                "created_at": batch_ts, "generation": g,
                "claim_pos": r["claim_pos"],
                "changed": prev is None or prev != data_hash,
            })
        return ext_rows, links_of

    def _spider(self, found, links_of, state, g):
        """links -> domain filter -> SSRF -> robots -> within-batch dedup
        -> seen anti-join -> budget cap -> children rows."""
        import pandas as pd

        from ares_spark.operators.ssrf import fetchable_series

        cfg = self.cfg
        cand = []
        for r in found:
            if r["crawl_session_id"] is None or r["depth"] >= r["max_depth"]:
                continue
            allowed = r["allowed_domains"] if r["allowed_domains"] else \
                [_host_of(r["url"])]
            for rank, link in enumerate(links_of.get(r["job_id"]) or []):
                lh = _host_of(link)
                if not any(lh == d or lh.endswith("." + d) for d in allowed):
                    continue
                cand.append({
                    "parent": r, "link": link, "link_rank": rank,
                    "link_host": lh,
                })
        if cand and cfg.ssrf_filter:
            ok = fetchable_series(pd.Series([c["link"] for c in cand]))
            cand = [c for c, keep in zip(cand, ok) if keep]
        if cand and self.robots:
            kept = []
            for c in cand:
                txt = self.robots.get(c["link_host"])
                if txt is None:
                    kept.append(c)
                    continue
                m = self._robots_memo.get(txt)
                if m is None:
                    m = RobotsMatcher.parse(txt)
                    if len(self._robots_memo) < 10_000:
                        self._robots_memo[txt] = m
                if m.is_allowed(c["link"], cfg.user_agent):
                    kept.append(c)
            cand = kept
        # within-batch dedup: first (claim_pos, link_rank) per link_hash
        cand.sort(key=lambda c: (c["parent"]["claim_pos"], c["link_rank"]))
        fresh, in_batch = [], set()
        for c in cand:
            h = spark_xxhash64(c["link"])
            if h in in_batch or h in self.seen:
                continue
            in_batch.add(h)
            c["url_hash"] = h
            fresh.append(c)
        budget_left = max(cfg.max_pages - state.visited, 0)
        fresh = fresh[:budget_left]  # already in (claim_pos, link_rank) order
        children, new_seen = [], []
        for rank, c in enumerate(fresh, start=1):
            seq = state.seq_base + rank - 1
            p = c["parent"]
            score = 0.0
            if cfg.score_mode == "link_position":
                score = -float(c["link_rank"])
            elif cfg.score_mode == "parent_decay":
                score = (p["score"] or 0.0) * cfg.score_decay
            children.append({
                "job_id": hashlib.md5(
                    f"{self.session_id}:{seq}:{c['link']}".encode()
                ).hexdigest(),
                "url": c["link"], "url_hash": c["url_hash"],
                "host": c["link_host"],
                "host_shard": _pmod(spark_xxhash64(c["link_host"]), cfg.n_shards),
                "schema_name": cfg.schema_spec, "status": "pending",
                "retry_count": 0, "max_retries": cfg.max_retries,
                "next_retry_at": None, "created_seq": seq,
                "created_at": state.batch_ts,
                "crawl_session_id": self.session_id,
                "parent_job_id": p["job_id"], "depth": p["depth"] + 1,
                "score": score, "max_depth": p["max_depth"],
                "max_pages": p["max_pages"],
                "allowed_domains": p["allowed_domains"],
                "generation": g + 1, "error": None,
            })
            new_seen.append({
                "crawl_session_id": self.session_id,
                "url_hash": c["url_hash"], "url": c["link"],
                "host_shard": children[-1]["host_shard"],
                "created_at": state.batch_ts,
            })
        return children, new_seen

    # -- compactions (same cadence/layout as the Spark writers) ---------------

    def _flog_compact(self, flog, g: int, delta) -> bool:
        if (g + 1) % flog.compact_interval != 0:
            return False
        # live view after this delta == self.frontier updated with it; the
        # dict is pre-update here, so resolve inline
        live = dict(self.frontier)
        for row in delta:
            if row["status"] == "pending":
                live[row["job_id"]] = row
            else:
                live.pop(row["job_id"], None)
        rows = []
        for r in live.values():
            out = {k: r[k] for k in _FRONTIER_COLS}
            out["state_gen"] = g  # write_base(before=g+1) convention
            rows.append(out)
        _write_dir(rows, FRONTIER_PA, flog.dir / f"base-g{g + 1:04d}")
        return True

    def _elog_compact(self, elog, g: int) -> None:
        """LatestStateLog.maybe_compact: fold to a new base every interval,
        keep ONE base of history + its deltas (crash right here resumes at
        g-1, which the brand-new base cannot serve)."""
        if (g + 1) % elog.compact_interval != 0:
            return
        resolved: dict[str, dict] = {}
        ebases = elog._base_gens()
        paths = ([elog.dir / f"base-g{ebases[-1]:04d}"] if ebases else []) + [
            Path(p) for p in elog._delta_dirs(ebases[-1] if ebases else 0, g)
        ]
        for p in paths:
            for r in _read_dir_rows(p):
                key = (r["state_gen"], r["claim_pos"])
                prev = resolved.get(r["url"])
                if prev is None or key > (prev["state_gen"], prev["claim_pos"]):
                    resolved[r["url"]] = r
        if not resolved:
            return
        rows = [
            {"url": r["url"], "data_hash": r["data_hash"],
             "claim_pos": r["claim_pos"], "state_gen": g}
            for r in resolved.values()
        ]
        _write_dir(rows, ELOG_PA, elog.dir / f"base-g{g + 1:04d}")
        bases = elog._base_gens()
        keep_from = bases[-2] if len(bases) >= 2 else 0
        for d in elog._delta_dirs(0, keep_from - 1):
            shutil.rmtree(d)
        for b in bases[:-2]:
            shutil.rmtree(elog.dir / f"base-g{b:04d}")

    def _log_compaction(self, store, g: int, cfg) -> None:
        """SnapshotStore.compact_log (bin-packing of the append-only logs),
        pyarrow edition: fold the two smallest adjacent dirs while more
        than max_runs cover generations <= g-1."""
        for table in ("url_seen", "visits", "extractions"):
            max_runs = 2 * cfg.compact_interval
            while True:
                dirs = [d for d in store._log_dirs(table) if d[1] <= g - 1]
                if len(dirs) <= max_runs:
                    break
                sizes = [
                    sum(f.stat().st_size for f in p.rglob("*") if f.is_file())
                    for _, _, p in dirs
                ]
                i = min(range(len(dirs) - 1), key=lambda j: sizes[j] + sizes[j + 1])
                (lo1, _, p1), (_, hi2, p2) = dirs[i], dirs[i + 1]
                merged = store.root / table / f"run-g{lo1:04d}-g{hi2:04d}"
                t1 = pq.read_table(str(p1))
                # dirs may mix Spark- and pyarrow-written files whose
                # schemas differ in nullability/metadata — align by name
                t2 = pq.read_table(str(p2)).select(t1.column_names).cast(t1.schema)
                t = pa.concat_tables([t1, t2])
                if merged.exists():
                    shutil.rmtree(merged)
                merged.mkdir(parents=True)
                pq.write_table(t, merged / "part-00000.parquet")
                (merged / "_SUCCESS").touch()
                shutil.rmtree(p1)
                shutil.rmtree(p2)

    @staticmethod
    def _tick(label: str, t0: float, g: int) -> None:
        from ares_spark.crawl import loop as _loop

        _loop._tick(label, t0, g)


_FRONTIER_COLS = [f.name for f in FRONTIER_PA if f.name != "state_gen"]


def _retry_delay(attempt: int) -> float:
    """frontier.retry_delay_expr: 60s / 300s / 1800s / 3600s."""
    if attempt <= 1:
        return 60.0
    if attempt == 2:
        return 300.0
    if attempt == 3:
        return 1800.0
    return 3600.0
