"""WET / WAT sources — Common Crawl's companion formats to WARC.

Common Crawl publishes three artifacts per segment (all ISO-28500
framing, gzipped one-member-per-record):

- ``*.warc.gz``  raw fetches           → ``io.warc.read_warc``
- ``*.wet.gz``   extracted plain text  (``WARC-Type: conversion``)
- ``*.wat.gz``   per-page JSON metadata (``WARC-Type: metadata``) —
  notably the outlink table under
  ``Envelope.Payload-Metadata.HTTP-Response-Metadata.HTML-Metadata.Links``

WET feeds the training-data side of this engine directly (quality
gates, language ID, dedup, stratified mixing — the documents-table
ops), and WAT feeds the crawl side (a link graph to seed/extend the
frontier without parsing HTML). Both readers reuse the WARC framing
parser and the same scale shape: the driver lists PATHS only, tasks
stream records through the gzip decoder, ``mapInPandas`` emits
Arrow-sized batches; WAT's JSON stays JVM-side (``get_json_object`` +
``from_json``) — no Python in the link-extraction row path.
"""

from __future__ import annotations

import gzip
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ares_spark.io.warc import ARROW_BATCH, _open_stream, iter_warc_records

WET_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("text", T.StringType()),
        T.StructField("wet_file", T.StringType()),
    ]
)

WAT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("meta_json", T.StringType()),
        T.StructField("wat_file", T.StringType()),
    ]
)

# the dashed CC key names need bracket selectors in get_json_object
_WAT_LINKS_PATH = (
    "$['Envelope']['Payload-Metadata']['HTTP-Response-Metadata']"
    "['HTML-Metadata']['Links']"
)
_WAT_TITLE_PATH = (
    "$['Envelope']['Payload-Metadata']['HTTP-Response-Metadata']"
    "['HTML-Metadata']['Head']['Title']"
)


def _ts(headers: dict):
    from datetime import datetime

    ts = headers.get("warc-date")
    if not ts:
        return None
    try:
        return datetime.fromisoformat(ts.replace("Z", "+00:00"))  # tz-AWARE
    except ValueError:
        return None


def _list_files(paths, suffixes) -> list[str]:
    import glob as _glob
    import os

    if isinstance(paths, str):
        if os.path.isdir(paths):
            return sorted(
                os.path.join(paths, f) for f in os.listdir(paths)
                if f.endswith(suffixes)
            )
        return sorted(_glob.glob(paths))
    return sorted(paths)


def _typed_reader(
    spark: SparkSession, paths, suffixes, warc_type: str, schema,
    parallelism: int | None,
) -> DataFrame:
    files = _list_files(paths, suffixes)
    if not files:
        return spark.createDataFrame([], schema)
    if parallelism is None:
        parallelism = min(len(files), spark.sparkContext.defaultParallelism)
    path_df = spark.createDataFrame([(p,) for p in files], "path string").repartition(
        parallelism, "path"
    )
    cols = [f.name for f in schema.fields]

    def frame(rows: list[tuple]) -> pd.DataFrame:
        out = pd.DataFrame(rows, columns=cols)
        out["warc_ts"] = pd.to_datetime(out["warc_ts"], utc=True)
        return out

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            buf: list[tuple] = []
            for path in pdf["path"]:
                with _open_stream(path) as stream:
                    for headers, payload in iter_warc_records(stream):
                        if headers.get("warc-type") != warc_type:
                            continue
                        buf.append(
                            (headers.get("warc-target-uri"), _ts(headers),
                             payload.decode("utf-8", "replace"), path)
                        )
                        if len(buf) >= ARROW_BATCH:
                            yield frame(buf)
                            buf = []
            if buf:
                yield frame(buf)

    return path_df.mapInPandas(parse, schema=schema)


def read_wet(spark: SparkSession, paths, parallelism: int | None = None) -> DataFrame:
    """WET archive(s) → DataFrame(url, warc_ts, text, wet_file): the
    ``conversion`` records' plain-text payloads (warcinfo skipped)."""
    return _typed_reader(
        spark, paths, (".wet", ".wet.gz"), "conversion", WET_SCHEMA, parallelism
    )


def read_wat(spark: SparkSession, paths, parallelism: int | None = None) -> DataFrame:
    """WAT archive(s) → DataFrame(url, warc_ts, meta_json, wat_file):
    the ``metadata`` records' JSON envelopes, unparsed (JSON extraction
    composes JVM-side downstream — see wat_links)."""
    return _typed_reader(
        spark, paths, (".wat", ".wat.gz"), "metadata", WAT_SCHEMA, parallelism
    )


def wet_documents(spark: SparkSession, paths) -> DataFrame:
    """WET → the engine's documents-table shape (doc_id, url, text):
    the bridge from a Common Crawl segment into the training-data ops
    (token counts, quality gates, language ID, MinHash/SimHash dedup,
    stratified mixing). doc_id = xxhash64(url) — deterministic and
    partition-invariant."""
    return (
        read_wet(spark, paths)
        .filter(F.col("url").isNotNull() & (F.length("text") > 0))
        .select(F.xxhash64("url").alias("doc_id"), "url", "warc_ts", "text")
    )


def wat_links(spark: SparkSession, paths) -> DataFrame:
    """WAT → the outlink table (src_url, link_url, link_path), extracted
    entirely JVM-side: get_json_object walks the dashed CC envelope keys,
    from_json types the Links array, explode emits one row per link.
    This is the frontier feed that skips HTML parsing altogether —
    at CC scale (~3B links/segment) the whole plan is scan → project →
    explode with no Python and no shuffle."""
    link_schema = "array<struct<url:string,href:string,path:string>>"
    raw = read_wat(spark, paths).select(
        F.col("url").alias("src_url"),
        F.from_json(
            F.get_json_object("meta_json", _WAT_LINKS_PATH), link_schema
        ).alias("__links"),
    )
    return (
        raw.filter(F.col("__links").isNotNull())
        .select("src_url", F.explode("__links").alias("__l"))
        .select(
            "src_url",
            F.coalesce(F.col("__l.url"), F.col("__l.href")).alias("link_url"),
            F.col("__l.path").alias("link_path"),
        )
        .filter(F.col("link_url").isNotNull())
    )


def wat_titles(spark: SparkSession, paths) -> DataFrame:
    """WAT → (url, title) — the Head.Title metadata column."""
    return read_wat(spark, paths).select(
        "url", F.get_json_object("meta_json", _WAT_TITLE_PATH).alias("title")
    )


# -- writers (fixtures / round-tripping) ---------------------------------------


def _write_records(path: str, records: list[tuple[dict, bytes]],
                   per_record_gzip: bool = True) -> None:
    with open(path, "wb") as out:
        for headers, payload in records:
            head = "WARC/1.0\r\n" + "".join(
                f"{k}: {v}\r\n" for k, v in headers.items()
            ) + f"Content-Length: {len(payload)}\r\n\r\n"
            blob = head.encode() + payload + b"\r\n\r\n"
            out.write(gzip.compress(blob) if per_record_gzip else blob)


def write_wet(path: str, records: list[dict], per_record_gzip: bool = True) -> None:
    """Write a WET file. Each record dict: url, date (ISO str), text."""
    _write_records(path, [
        ({"WARC-Type": "conversion",
          "WARC-Target-URI": r["url"],
          "WARC-Date": r["date"],
          "Content-Type": "text/plain"},
         r["text"].encode())
        for r in records
    ], per_record_gzip)


def write_wat(path: str, records: list[dict], per_record_gzip: bool = True) -> None:
    """Write a WAT file. Each record dict: url, date (ISO str), and
    optionally links (list of urls) + title — wrapped in the CC envelope
    shape wat_links/wat_titles read back."""
    import json as _json

    recs = []
    for r in records:
        html_meta: dict = {}
        if r.get("links") is not None:
            html_meta["Links"] = [
                {"path": "A@/href", "url": u} for u in r["links"]
            ]
        if r.get("title") is not None:
            html_meta["Head"] = {"Title": r["title"]}
        envelope = {
            "Envelope": {
                "WARC-Header-Metadata": {
                    "WARC-Target-URI": r["url"], "WARC-Date": r["date"],
                },
                "Payload-Metadata": {
                    "HTTP-Response-Metadata": {"HTML-Metadata": html_meta}
                },
            }
        }
        recs.append((
            {"WARC-Type": "metadata",
             "WARC-Target-URI": r["url"],
             "WARC-Date": r["date"],
             "Content-Type": "application/json"},
            _json.dumps(envelope, separators=(",", ":")).encode(),
        ))
    _write_records(path, recs, per_record_gzip)


def write_wet_dataset(df: DataFrame, out_dir: str) -> int:
    """Distributed WET sink — the crawl's output as a Common Crawl
    artifact: each partition writes one ``part-NNNNN.wet.gz`` (one gzip
    member per conversion record). Expects columns (url, warc_ts, text);
    rows with null url/text are skipped. Task retries are idempotent
    (tmp + rename, partition-deterministic names). Returns rows written.

    This closes the CC loop: WARC/WAT in → crawl/extract → WET out, so a
    downstream training-data pipeline can consume the engine's output
    with the same read_wet used for upstream CC segments."""
    import os
    import uuid as _uuid

    os.makedirs(out_dir, exist_ok=True)
    src = df.select("url", "warc_ts", "text")
    # Arrow delivers Spark timestamps as naive values in the SESSION tz;
    # capture it driver-side so tasks can restore the 'Z' suffix honestly
    # (read_wet parses WARC-Date as tz-aware UTC — keep both sides matched).
    session_tz = df.sparkSession.conf.get(
        "spark.sql.session.timeZone", None
    ) or "UTC"

    def dump(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        final = os.path.join(out_dir, f"part-{pid:05d}.wet.gz")
        tmp = final + f".tmp-{_uuid.uuid4().hex[:8]}"
        n = 0
        with open(tmp, "wb") as out:
            for pdf in batches:
                for url, ts, text in zip(pdf["url"], pdf["warc_ts"], pdf["text"]):
                    if url is None or text is None:
                        continue
                    # pd.isna, not `is None`: a null timestamp arrives as
                    # NaT through Arrow and must mean "no WARC-Date header",
                    # not a strftime crash mid-write-task.
                    if pd.isna(ts):
                        when = ""
                    else:
                        stamp = pd.Timestamp(ts)
                        if stamp.tzinfo is None:  # naive session-local value
                            stamp = stamp.tz_localize(session_tz)
                        when = stamp.tz_convert("UTC").strftime(
                            "%Y-%m-%dT%H:%M:%SZ"
                        )
                    payload = str(text).encode()
                    head = (
                        "WARC/1.0\r\n"
                        "WARC-Type: conversion\r\n"
                        f"WARC-Target-URI: {url}\r\n"
                        + (f"WARC-Date: {when}\r\n" if when else "")
                        + "Content-Type: text/plain\r\n"
                        f"Content-Length: {len(payload)}\r\n\r\n"
                    ).encode()
                    out.write(gzip.compress(head + payload + b"\r\n\r\n"))
                    n += 1
        if n:
            os.replace(tmp, final)  # atomic publish; retries overwrite
        else:
            os.unlink(tmp)
        yield pd.DataFrame({"n": [n]})

    counts = src.mapInPandas(dump, schema="n long").collect()  # 1 row/partition
    return int(sum(r.n for r in counts))
