"""Live HTTP fetch stage (A1's real-crawl half, fetcher.rs:149-186).

All tests run against a loopback absolute-form HTTP proxy server serving
the reference's own crawl fixture corpus — real sockets, zero external
network. The headline test is c02-equivalence: the live-fetch crawl
trace is IDENTICAL to the pages-join trace on the same corpus.
"""

from __future__ import annotations

import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from ares_spark.crawl import CrawlConfig, run_crawl
from ares_spark.crawl.checkpoint import SnapshotStore
from ares_spark.crawl.httpfetch import live_fetch

FIXTURES = Path("/root/reference/bench/fixtures/crawl")
SEED = "http://blog.example.com/"
POSTS = [
    "http://blog.example.com/post-backpressure.html",
    "http://blog.example.com/post-ownership.html",
]


class _OriginHandler(BaseHTTPRequestHandler):
    """Absolute-form proxy handler: `GET http://host/path` requests arrive
    with the full URL in the request line — serve straight from a dict."""

    corpus: dict = {}
    seen_uas: list = []

    def do_GET(self):  # noqa: N802 (stdlib API)
        _OriginHandler.seen_uas.append(self.headers.get("User-Agent"))
        entry = self.corpus.get(self.path)
        if entry is None:
            self.send_response(404)
            self.send_header("Content-Length", "0")
            self.end_headers()
            return
        if callable(entry):
            entry(self)
            return
        self.send_response(200)
        self.send_header("Content-Type", "text/html; charset=utf-8")
        self.send_header("Content-Length", str(len(entry)))
        self.end_headers()
        self.wfile.write(entry)

    def log_message(self, *args):  # keep pytest output clean
        pass


def _slow(handler):
    time.sleep(1.5)
    handler.send_response(200)
    handler.send_header("Content-Length", "2")
    handler.end_headers()
    handler.wfile.write(b"ok")


@pytest.fixture(scope="module")
def server():
    corpus = {
        SEED: (FIXTURES / "index.html").read_bytes(),
        POSTS[0]: (FIXTURES / "post-backpressure.html").read_bytes(),
        POSTS[1]: (FIXTURES / "post-ownership.html").read_bytes(),
        "http://slow.example.com/page": _slow,
    }
    _OriginHandler.corpus = corpus
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _OriginHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{srv.server_address[1]}"
    finally:
        srv.shutdown()


def _batch(spark, urls):
    rows = [(u, u.split("/")[2], i + 1) for i, u in enumerate(urls)]
    return spark.createDataFrame(rows, "url string, host string, claim_pos int")


def test_fetch_columns_and_error_taxonomy(spark, server):
    """(html, fetch_status, fetched_at, fetch_error) per row; the error
    strings mirror the reference's AppError variants: HTTP code for
    non-2xx, timeout, connection-failed — and success carries the body."""
    before = time.time()
    out = {
        r.url: r
        for r in live_fetch(
            _batch(spark, [SEED, "http://blog.example.com/nope", "http://slow.example.com/page"]),
            timeout_s=0.5,
            proxy=server,
            n_partitions=2,
        ).collect()
    }
    ok = out[SEED]
    assert bytes(ok.html) == (FIXTURES / "index.html").read_bytes()
    assert ok.fetch_status == 200 and ok.fetch_error is None
    assert before <= ok.fetched_at <= time.time()
    missing = out["http://blog.example.com/nope"]
    assert missing.html is None and missing.fetch_status == 404
    assert missing.fetch_error == "HTTP 404 for http://blog.example.com/nope"
    slow = out["http://slow.example.com/page"]
    assert slow.html is None and slow.fetch_status is None
    assert slow.fetch_error == "Request timed out after 0.5s"
    # reference UA on the wire (fetcher.rs:123)
    assert "Ares/0.2 (AI Scraper)" in _OriginHandler.seen_uas


def test_connection_refused_is_an_error_row(spark):
    """A dead origin (no proxy, unreachable port on a PUBLIC-looking name
    that fails DNS) yields a Connection-failed row, not a task failure."""
    out = live_fetch(
        _batch(spark, ["http://definitely-not-a-real-host.invalid/x"]),
        timeout_s=2.0,
        n_partitions=1,
    ).collect()[0]
    assert out.html is None and out.fetch_status is None
    assert out.fetch_error.startswith("Connection failed:")


def test_ssrf_guard_blocks_before_any_socket(spark, server):
    """fetcher.rs:151-153: validate_url runs per request, in front of the
    connection. Private-IP and scheme-violating URLs never reach the wire
    (the proxy would happily serve them — the guard fires first)."""
    _OriginHandler.corpus["http://127.0.0.1/secret"] = b"leak"
    n_before = len(_OriginHandler.seen_uas)
    out = {
        r.url: r
        for r in live_fetch(
            _batch(spark, ["http://127.0.0.1/secret", "http://169.254.169.254/meta"]),
            proxy=server,
            n_partitions=1,
        ).collect()
    }
    assert all(r.html is None for r in out.values())
    assert "SSRF blocked" in out["http://127.0.0.1/secret"].fetch_error
    assert "SSRF blocked" in out["http://169.254.169.254/meta"].fetch_error
    assert len(_OriginHandler.seen_uas) == n_before  # zero requests made


def test_per_host_politeness_pacing(spark, server):
    """Same-host requests are spaced >= per_host_delay_s apart (task-local
    pacing; one task owns the host after the repartition-by-host)."""
    urls = [SEED, POSTS[0], POSTS[1]]
    t0 = time.time()
    rows = live_fetch(
        _batch(spark, urls), proxy=server, per_host_delay_s=0.4, n_partitions=4
    ).collect()
    assert time.time() - t0 >= 0.8  # 3 same-host requests → 2 waits
    stamps = sorted(r.fetched_at for r in rows)
    assert all(b - a >= 0.35 for a, b in zip(stamps, stamps[1:]))
    assert all(r.fetch_status == 200 for r in rows)


def _visits(spark, ckpt):
    df = SnapshotStore(ckpt).read_all_batches(spark, "visits")
    return [
        (r.visit_pos, r.url, r.outcome, r.generation)
        for r in df.orderBy("visit_pos").collect()
    ]


def _extractions(spark, ckpt):
    df = SnapshotStore(ckpt).read_all_batches(spark, "extractions")
    return sorted(
        (r.url, r.content_hash, r.data_hash, r.is_valid, r.generation)
        for r in df.collect()
    )


def test_live_crawl_trace_equals_pages_join_trace(spark, server, tmp_path_factory):
    """c02-equivalence (VERDICT r4 #5): the FULL BFS crawl — depth 2, so
    the /tag/* links 404 on the live server exactly where they miss the
    pages table, exercising retry/backoff — produces an IDENTICAL visit
    trace, extraction set, and frontier outcome either way."""
    from ares_spark.io.synth import PAGES_SCHEMA

    import datetime as dt

    rows = []
    for off, (url, fname) in enumerate(
        [(SEED, "index.html"), (POSTS[0], "post-backpressure.html"), (POSTS[1], "post-ownership.html")]
    ):
        html = (FIXTURES / fname).read_text()
        from ares_spark.html import clean_html

        rows.append(
            (url, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=off), html.encode(), clean_html(html), "en")
        )
    pages = spark.createDataFrame(rows, PAGES_SCHEMA).cache()

    base_cfg = dict(
        schema_spec="blog@latest", max_depth=2, max_pages=100, max_retries=1,
        use_bloom=False, max_generations=16,
    )
    ck_pages = str(tmp_path_factory.mktemp("live_eq_pages"))
    run_crawl(spark, pages, [SEED], ck_pages, CrawlConfig(**base_cfg), session_id="eq")

    ck_live = str(tmp_path_factory.mktemp("live_eq_live"))
    run_crawl(
        spark, pages, [SEED], ck_live,
        CrawlConfig(**base_cfg, fetch_mode="live", http_proxy=server, fetch_timeout_s=10.0),
        session_id="eq",
    )

    assert _visits(spark, ck_live) == _visits(spark, ck_pages)
    assert _extractions(spark, ck_live) == _extractions(spark, ck_pages)
    for ck in (ck_pages, ck_live):
        # the tag pages went through pending→retry→failed identically
        from ares_spark.crawl.checkpoint import FrontierLog

        flog = FrontierLog(SnapshotStore(ck))
        final = {
            r.url: (r.status, r.retry_count)
            for r in flog.read_full(spark, SnapshotStore(ck).latest_generation()).collect()
        }
        tag_rows = {u: v for u, v in final.items() if "/tag/" in u}
        assert tag_rows and all(v == ("failed", 1) for v in tag_rows.values())
    # live mode recorded the REAL failure cause on the frontier row
    flog = FrontierLog(SnapshotStore(ck_live))
    errs = {
        r.url: r.error
        for r in flog.read_full(spark, SnapshotStore(ck_live).latest_generation()).collect()
        if "/tag/" in r.url
    }
    assert all(e and e.startswith("HTTP 404 for ") for e in errs.values())
