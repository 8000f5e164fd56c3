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


def _parse_records(stream, source: str) -> Iterator[tuple]:
    """WARC byte stream → WARC_SCHEMA row tuples (content records only)."""
    from datetime import datetime

    for headers, payload in iter_warc_records(stream):
        rtype = headers.get("warc-type", "")
        if rtype not in ("response", "resource"):
            continue
        url = headers.get("warc-target-uri")
        ts = headers.get("warc-date")
        when = None
        if ts:
            try:
                # keep the tzinfo: WARC-Date is UTC, and a tz-AWARE value
                # pins the instant regardless of spark.sql.session.timeZone
                # (a naive one would shift by the session tz offset)
                when = datetime.fromisoformat(ts.replace("Z", "+00:00"))
            except ValueError:
                when = None
        if rtype == "response":
            status, mime, body = _split_http(payload)
        else:
            status, body = None, payload
            mime = (headers.get("content-type") or "").split(";")[0].strip() or None
        yield (url, when, rtype, status, mime, body, source)


def _frame(rows: list[tuple]) -> pd.DataFrame:
    """Record tuples → Arrow-bound batch. warc_ts becomes tz-aware UTC
    dtype so the Arrow timestamp carries the tz and the stored instant is
    independent of spark.sql.session.timeZone."""
    out = pd.DataFrame(rows, columns=[f.name for f in WARC_SCHEMA.fields])
    out["warc_ts"] = pd.to_datetime(out["warc_ts"], utc=True)
    return out


def _records_of(path: str) -> Iterator[tuple]:
    with _open_stream(path) as stream:
        yield from _parse_records(stream, path)


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
        for pdf in batches:
            buf: list[tuple] = []
            for path in pdf["path"]:
                for rec in _records_of(path):
                    buf.append(rec)
                    if len(buf) >= ARROW_BATCH:
                        yield _frame(buf)
                        buf = []
            if buf:
                yield _frame(buf)

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


# -- CDX-indexed reads (record-granular splits) --------------------------------
#
# File-per-task reading caps parallelism at the archive count and makes a
# single fat archive a straggler. Common Crawl ships CDX(J) indexes with
# each record's (filename, offset, length) — and because every record is
# its own gzip member, a task can seek straight to its records and
# decompress only them. read_warc_cdx turns N archives × M records into
# an arbitrarily-partitionable DataFrame of index entries: parallelism is
# record-granular, stragglers impossible, and predicate pushdown on the
# (small, columnar) index happens before any archive byte is read.

CDX_SCHEMA = T.StructType(
    [
        T.StructField("warc_file", T.StringType()),
        T.StructField("offset", T.LongType()),
        T.StructField("length", T.LongType()),
    ]
)


def read_cdx(spark: SparkSession, path: str) -> DataFrame:
    """Parse CDXJ index file(s) (lines of ``urlkey timestamp {json}``,
    gzipped or plain — spark.read.text decompresses .gz transparently)
    into (warc_file, offset, length) entries. DISTRIBUTED: a Common
    Crawl cdx shard runs to a gigabyte, so the lines never pass through
    the driver — the JSON tail parses JVM-side per partition."""
    lines = spark.read.text(path).filter(F.length(F.trim("value")) > 0)
    # the json object runs from the FIRST '{' to end of line (the urlkey/
    # timestamp prefix never contains one)
    j = F.expr("substring(value, instr(value, '{'))")
    return lines.select(
        F.get_json_object(j, "$.filename").alias("warc_file"),
        F.get_json_object(j, "$.offset").cast("long").alias("offset"),
        F.get_json_object(j, "$.length").cast("long").alias("length"),
    )


def read_warc_cdx(
    spark: SparkSession, entries: DataFrame, base_dir: str = "",
    parallelism: int | None = None,
) -> DataFrame:
    """WARC records addressed by CDX entries → DataFrame(WARC_SCHEMA).
    Each task seeks to its entries' offsets and decompresses only those
    gzip members — never a whole-archive scan. ``entries`` may be
    pre-filtered/partitioned arbitrarily (it is just a DataFrame)."""
    import os

    if parallelism is None:
        parallelism = spark.sparkContext.defaultParallelism
    src = entries.select("warc_file", "offset", "length").repartition(
        parallelism, "warc_file", "offset"
    )

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            buf: list[tuple] = []
            # group by file so each archive opens once per batch, offsets
            # read in ascending order (sequential-friendly on object stores)
            for fname, grp in pdf.groupby("warc_file"):
                path = os.path.join(base_dir, fname) if base_dir else fname
                with open(path, "rb") as fh:
                    for off, length in sorted(
                        zip(grp["offset"], grp["length"])
                    ):
                        fh.seek(int(off))
                        member = fh.read(int(length))
                        blob = gzip.decompress(member)
                        stream = io.BufferedReader(io.BytesIO(blob))
                        for rec in _parse_records(stream, path):
                            buf.append(rec)
                        if len(buf) >= ARROW_BATCH:
                            yield _frame(buf)
                            buf = []
            if buf:
                yield _frame(buf)

    return src.mapInPandas(fetch, schema=WARC_SCHEMA)


# -- writer (fixtures / round-tripping) ----------------------------------------


def write_warc(
    path: str, records: list[dict], per_record_gzip: bool = True,
    cdx_path: str | None = None,
) -> None:
    """Write a WARC file. Each record dict: url, date (ISO str), body
    (bytes), and optionally status (int, default 200) + mime. Response
    records get a minimal HTTP envelope; per_record_gzip=True writes one
    gzip member per record (the Common Crawl convention). ``cdx_path``
    additionally writes a CDXJ index with per-record (offset, length)."""
    import json as _json
    import os

    cdx_lines = []
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
            member = gzip.compress(blob) if per_record_gzip else blob
            offset = out.tell()
            out.write(member)
            cdx_lines.append(
                f"{r['url']} {r['date']} "
                + _json.dumps(
                    {"url": r["url"], "filename": os.path.basename(path),
                     "offset": offset, "length": len(member),
                     "status": str(status), "mime": mime}
                )
            )
    finally:
        out.close()
    if cdx_path is not None:
        if not per_record_gzip:
            raise ValueError("CDX offsets require per-record gzip members")
        with open(cdx_path, "w") as fh:
            fh.write("\n".join(cdx_lines) + ("\n" if cdx_lines else ""))
