"""WARC source — read Common-Crawl-style web archives into the engine's
pages-table shape (url, warc_ts, html, ...).

The input_hint's pages table is "Common-Crawl-style"; Common Crawl ships
as WARC (ISO 28500) files, gzipped one-member-per-record. This reader is
pure python (stdlib gzip + the public WARC/HTTP framing) and distributes
file-per-task:

- the driver lists PATHS only (never file bytes); tasks open their files
  and STREAM records through the gzip decoder, so executor memory is
  bounded by record size, not file size — a deliberate contrast with
  ``spark.read.format("binaryFile")``, which materializes each 1 GB
  archive as a single row
- ``mapInPandas`` yields record batches incrementally (ARROW_BATCH rows)
- at 100 TB (≈ 100k CC archives) the path list is ~10 MB on the driver
  and parallelism is file-granular, which matches how CC is sharded;
  finer-than-file splitting would need gzip-member indexing (CC provides
  .warc.gz + .cdx indexes for that — a cdx-driven reader slots in here)

Only ``response`` and ``resource`` records carry page content;
``warcinfo``/``request``/``metadata`` are skipped. For ``response``
records the HTTP envelope is split off and the status/MIME surface as
columns so scans can prune non-200/non-HTML rows without touching bytes.
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

WARC_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("record_type", T.StringType()),
        T.StructField("http_status", T.IntegerType()),
        T.StructField("mime", T.StringType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("warc_file", T.StringType()),
    ]
)

ARROW_BATCH = 1024


def iter_warc_records(stream) -> Iterator[tuple[dict, bytes]]:
    """Yield (headers, payload) per WARC record from a byte stream.
    Framing per ISO 28500: version line, CRLF header block, blank line,
    Content-Length payload bytes, blank separator lines."""
    while True:
        line = stream.readline()
        if not line:
            return
        if line.strip() == b"":
            continue
        if not line.startswith(b"WARC/"):
            raise ValueError(f"bad WARC version line: {line[:40]!r}")
        headers: dict[str, str] = {}
        while True:
            h = stream.readline()
            if h in (b"\r\n", b"\n", b""):
                break
            key, _, val = h.decode("utf-8", "replace").partition(":")
            headers[key.strip().lower()] = val.strip()
        length = int(headers.get("content-length", "0"))
        payload = stream.read(length)
        if len(payload) != length:
            raise ValueError("truncated WARC record payload")
        yield headers, payload


def _split_http(payload: bytes) -> tuple[int | None, str | None, bytes]:
    """HTTP response envelope → (status, mime, body)."""
    head, sep, body = payload.partition(b"\r\n\r\n")
    if not sep:
        head, sep, body = payload.partition(b"\n\n")
    if not sep:
        return None, None, payload
    lines = head.split(b"\r\n" if b"\r\n" in head else b"\n")
    status = None
    first = lines[0].split()
    if len(first) >= 2 and first[0].startswith(b"HTTP/"):
        try:
            status = int(first[1])
        except ValueError:
            status = None
    mime = None
    for ln in lines[1:]:
        k, _, v = ln.decode("latin-1").partition(":")
        if k.strip().lower() == "content-type":
            mime = v.strip().split(";")[0].strip().lower() or None
            break
    return status, mime, body


def _open_stream(path: str):
    fh = open(path, "rb")
    magic = fh.read(2)
    fh.seek(0)
    if magic == b"\x1f\x8b":
        # gzip.GzipFile iterates ALL members of a multi-member file —
        # exactly the CC per-record-member convention
        return io.BufferedReader(gzip.GzipFile(fileobj=fh))
    return io.BufferedReader(fh)


def _records_of(path: str) -> Iterator[tuple]:
    from datetime import datetime

    with _open_stream(path) as stream:
        for headers, payload in iter_warc_records(stream):
            rtype = headers.get("warc-type", "")
            if rtype not in ("response", "resource"):
                continue
            url = headers.get("warc-target-uri")
            ts = headers.get("warc-date")
            when = None
            if ts:
                try:
                    when = datetime.fromisoformat(ts.replace("Z", "+00:00")).replace(
                        tzinfo=None
                    )
                except ValueError:
                    when = None
            if rtype == "response":
                status, mime, body = _split_http(payload)
            else:
                status, body = None, payload
                mime = (headers.get("content-type") or "").split(";")[0].strip() or None
            yield (url, when, rtype, status, mime, body, path)


def read_warc(spark: SparkSession, paths: list[str] | str,
              parallelism: int | None = None) -> DataFrame:
    """WARC archive(s) → DataFrame(WARC_SCHEMA). ``paths``: explicit list
    or a directory/glob understood by the local/shared filesystem."""
    import glob as _glob
    import os

    if isinstance(paths, str):
        if os.path.isdir(paths):
            files = sorted(
                os.path.join(paths, f) for f in os.listdir(paths)
                if f.endswith((".warc", ".warc.gz"))
            )
        else:
            files = sorted(_glob.glob(paths))
    else:
        files = sorted(paths)
    if not files:
        return spark.createDataFrame([], WARC_SCHEMA)
    if parallelism is None:
        parallelism = min(len(files), spark.sparkContext.defaultParallelism)
    path_df = spark.createDataFrame([(p,) for p in files], "path string").repartition(
        parallelism, "path"
    )

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in WARC_SCHEMA.fields]
        for pdf in batches:
            buf: list[tuple] = []
            for path in pdf["path"]:
                for rec in _records_of(path):
                    buf.append(rec)
                    if len(buf) >= ARROW_BATCH:
                        yield pd.DataFrame(buf, columns=cols)
                        buf = []
            if buf:
                yield pd.DataFrame(buf, columns=cols)

    return path_df.mapInPandas(parse, schema=WARC_SCHEMA)


def warc_pages(spark: SparkSession, paths, min_status: int = 200,
               max_status: int = 299) -> DataFrame:
    """WARC → the engine's pages-table shape (url, warc_ts, html):
    successful HTML responses only, envelope columns dropped. Feed this
    straight to run_crawl / scrape_batch."""
    raw = read_warc(spark, paths)
    return raw.filter(
        (F.col("record_type") == "response")
        & F.col("http_status").between(min_status, max_status)
        & (F.col("mime").isNull() | F.col("mime").startswith("text/html"))
        & F.col("url").isNotNull()
    ).select("url", "warc_ts", "html")


# -- writer (fixtures / round-tripping) ----------------------------------------


def write_warc(path: str, records: list[dict], per_record_gzip: bool = True) -> None:
    """Write a WARC file. Each record dict: url, date (ISO str), body
    (bytes), and optionally status (int, default 200) + mime. Response
    records get a minimal HTTP envelope; per_record_gzip=True writes one
    gzip member per record (the Common Crawl convention)."""
    out = open(path, "wb")
    try:
        for r in records:
            status = r.get("status", 200)
            mime = r.get("mime", "text/html")
            http = (
                f"HTTP/1.1 {status} OK\r\nContent-Type: {mime}\r\n"
                f"Content-Length: {len(r['body'])}\r\n\r\n"
            ).encode() + r["body"]
            head = (
                "WARC/1.0\r\n"
                "WARC-Type: response\r\n"
                f"WARC-Target-URI: {r['url']}\r\n"
                f"WARC-Date: {r['date']}\r\n"
                "Content-Type: application/http; msgtype=response\r\n"
                f"Content-Length: {len(http)}\r\n\r\n"
            ).encode()
            blob = head + http + b"\r\n\r\n"
            out.write(gzip.compress(blob) if per_record_gzip else blob)
    finally:
        out.close()
