"""WARC source: spec-pinned parsing + distributed read + pages-table feed."""

import gzip
import hashlib

import pytest
from pyspark.sql import functions as F


def test_warc_parse_handcrafted_bytes(tmp_path):
    """Parser pinned against WARC bytes built by hand from ISO 28500 —
    not via write_warc — so a writer/reader twin bug cannot self-cancel.
    Mixes response / request / warcinfo records and \\r\\n framing."""
    from ares_spark.io.warc import _records_of

    body = b"<html><body>hand</body></html>"
    http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
            b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n" + body)
    rec_resp = (b"WARC/1.0\r\n"
                b"WARC-Type: response\r\n"
                b"WARC-Target-URI: https://w.example.org/a\r\n"
                b"WARC-Date: 2026-03-01T12:00:00Z\r\n"
                b"Content-Length: " + str(len(http)).encode() + b"\r\n\r\n"
                + http + b"\r\n\r\n")
    rec_info = (b"WARC/1.0\r\n"
                b"WARC-Type: warcinfo\r\n"
                b"Content-Length: 4\r\n\r\nxxxx\r\n\r\n")
    rec_req = (b"WARC/1.0\r\n"
               b"WARC-Type: request\r\n"
               b"WARC-Target-URI: https://w.example.org/a\r\n"
               b"Content-Length: 2\r\n\r\nGE\r\n\r\n")
    p = tmp_path / "hand.warc"
    p.write_bytes(rec_info + rec_req + rec_resp)
    got = list(_records_of(str(p)))
    assert len(got) == 1  # warcinfo/request skipped
    url, when, rtype, status, mime, html, _ = got[0]
    assert url == "https://w.example.org/a"
    assert when.isoformat() == "2026-03-01T12:00:00+00:00"  # tz-AWARE UTC
    assert (rtype, status, mime) == ("response", 200, "text/html")
    assert bytes(html) == body


def test_warc_roundtrip_gzip_members(spark, tmp_path):
    """write_warc (one gzip member per record, the CC convention) →
    read_warc over multiple files; record order and bytes survive."""
    from ares_spark.io.warc import read_warc, write_warc

    recs_a = [
        {"url": f"https://a.example.org/p{i}", "date": "2026-03-01T00:00:00Z",
         "body": f"<html><p>page {i}</p></html>".encode()}
        for i in range(5)
    ]
    recs_b = [
        {"url": "https://b.example.org/err", "date": "2026-03-02T00:00:00Z",
         "body": b"<html>gone</html>", "status": 404},
        {"url": "https://b.example.org/img", "date": "2026-03-02T00:00:00Z",
         "body": b"\x89PNGfake", "mime": "image/png"},
    ]
    write_warc(str(tmp_path / "a.warc.gz"), recs_a)
    write_warc(str(tmp_path / "b.warc.gz"), recs_b)
    # plain (non-gzip) variant must read identically
    write_warc(str(tmp_path / "c.warc"), recs_a[:2], per_record_gzip=False)

    df = read_warc(spark, str(tmp_path)).cache()
    assert df.count() == 9
    got = {r.url: bytes(r.html) for r in df.collect()}
    assert got["https://a.example.org/p3"] == b"<html><p>page 3</p></html>"
    assert df.filter("http_status = 404").count() == 1
    # multi-member gzip: each file really has >1 member
    raw = (tmp_path / "a.warc.gz").read_bytes()
    assert raw.count(b"\x1f\x8b\x08") >= 5


def test_warc_pages_filters_to_fetchable_html(spark, tmp_path):
    from ares_spark.io.warc import warc_pages, write_warc

    write_warc(str(tmp_path / "x.warc.gz"), [
        {"url": "https://x.org/ok", "date": "2026-03-01T00:00:00Z",
         "body": b"<html>ok</html>"},
        {"url": "https://x.org/404", "date": "2026-03-01T00:00:00Z",
         "body": b"<html>nope</html>", "status": 404},
        {"url": "https://x.org/png", "date": "2026-03-01T00:00:00Z",
         "body": b"\x89PNG", "mime": "image/png"},
    ])
    pages = warc_pages(spark, str(tmp_path))
    assert [r.url for r in pages.collect()] == ["https://x.org/ok"]
    assert set(pages.columns) == {"url", "warc_ts", "html"}


def test_warc_pages_feed_scrape_pipeline(spark, tmp_path):
    """The reader's output IS the engine's input: WARC → warc_pages →
    scrape_batch runs the full fused pipeline on archive bytes."""
    from ares_spark.io.warc import warc_pages, write_warc
    from ares_spark.operators.pipeline import scrape_batch
    from ares_spark.schemas import SchemaRegistry

    html = (b"<html><head><title>T</title></head>"
            b"<body><h1>Warc Page</h1><p>Body text here.</p></body></html>")
    write_warc(str(tmp_path / "p.warc.gz"), [
        {"url": f"https://warc.example.org/{i}", "date": "2026-03-01T00:00:00Z",
         "body": html} for i in range(4)
    ])
    _, _, schema = SchemaRegistry().resolve("blog")
    out = scrape_batch(warc_pages(spark, str(tmp_path)), schema, "blog",
                       batch_ts="2026-03-01 00:00:00").cache()
    assert out.count() == 4
    # identical bytes → one distinct content hash, text extracted
    assert out.select("content_hash").distinct().count() == 1
    assert out.first().text.strip() != ""


def test_warc_truncated_record_refused(tmp_path):
    from ares_spark.io.warc import _records_of

    p = tmp_path / "bad.warc"
    p.write_bytes(b"WARC/1.0\r\nWARC-Type: response\r\n"
                  b"WARC-Target-URI: https://t/\r\nContent-Length: 999\r\n\r\nshort")
    with pytest.raises(ValueError, match="truncated"):
        list(_records_of(str(p)))


def test_cdx_indexed_read_equals_sequential(spark, tmp_path):
    """Record-granular CDX reads return exactly what the sequential
    file-per-task reader returns — and a filtered index reads only the
    addressed records (the scale path: a fat archive splits across
    tasks, predicate pushdown happens on the index before any byte of
    the archive is read)."""
    from ares_spark.io.warc import read_cdx, read_warc, read_warc_cdx, write_warc

    recs = [
        {"url": f"https://cdx.example.org/p{i:03d}", "date": "2026-03-01T00:00:00Z",
         "body": f"<html><p>page {i} {'x' * (i % 7)}</p></html>".encode(),
         "status": 200 if i % 5 else 404}
        for i in range(50)
    ]
    warc = tmp_path / "big.warc.gz"
    cdx = tmp_path / "big.cdx"
    write_warc(str(warc), recs, cdx_path=str(cdx))

    entries = read_cdx(spark, str(cdx))
    assert entries.count() == 50

    via_cdx = read_warc_cdx(spark, entries, base_dir=str(tmp_path)).cache()
    sequential = read_warc(spark, str(warc)).cache()
    a = sorted((r.url, bytes(r.html), r.http_status) for r in via_cdx.collect())
    b = sorted((r.url, bytes(r.html), r.http_status) for r in sequential.collect())
    assert a == b and len(a) == 50

    # pre-filter the INDEX: only the addressed half is parsed
    half = entries.orderBy("offset").limit(25)
    got = read_warc_cdx(spark, half, base_dir=str(tmp_path))
    assert got.count() == 25
    # the entries DataFrame partitions arbitrarily -> record-granular tasks
    assert via_cdx.rdd.getNumPartitions() > 1


def test_warc_ts_independent_of_session_timezone(spark, tmp_path):
    """WARC-Date is UTC; the stored instant must not shift when the Spark
    session timezone is not UTC (the parse yields tz-AWARE datetimes)."""
    from pyspark.sql import functions as F

    from ares_spark.io.warc import read_warc, write_warc

    write_warc(str(tmp_path / "t.warc.gz"),
               [{"url": "https://tz.example.org/", "date": "2026-03-01T12:00:00Z",
                 "body": b"<html>x</html>", "status": 200, "mime": "text/html"}])
    from datetime import datetime, timezone

    want = int(datetime(2026, 3, 1, 12, tzinfo=timezone.utc).timestamp())
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        for tz in ("UTC", "America/New_York", "Asia/Tokyo"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            got = (read_warc(spark, str(tmp_path))
                   .select(F.unix_timestamp("warc_ts").alias("e"))
                   .collect()[0].e)
            assert got == want, tz
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
