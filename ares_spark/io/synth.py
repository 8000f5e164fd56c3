"""Deterministic Common-Crawl-style page corpus (BASELINE.json input_hint).

Synthesizes the ``pages`` input table
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``
per FIXTURES.md §1: head metadata, strip-me blocks, relative/absolute/
mailto/fragment/cross-domain links, a deliberate hot-domain skew (~40% of
rows on one host), plus the reference 3-page crawl mini-site verbatim so
crawl-order parity tests run against real reference HTML.

Everything is seeded & content-addressed — the same (seed, n_pages) always
produces byte-identical HTML, so content hashes and crawl traces are stable
across runs, partitions and cluster sizes. Generation happens ON EXECUTORS
via ``spark.range(n)`` + mapInPandas: no driver-side materialization, so
the same generator scales to 10^8-row benches.
"""

from __future__ import annotations

import datetime as dt
import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

HOT_HOST = "hot.example.com"
EPOCH = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

_WORDS = (
    "channel queue worker schedule retry backoff frontier crawl parse token "
    "shard partition bloom filter budget robots politeness extract validate "
    "ground markdown metadata canonical snapshot lineage generation"
).split()

_LANGS = ["en", "en", "en", "de", "fr", "es", "zh"]


def _h(s: str) -> int:
    return int.from_bytes(hashlib.sha256(s.encode()).digest()[:8], "big")


def _host_for(i: int, n_hosts: int, seed: int) -> str:
    # ~40% of pages land on the hot host (FIXTURES.md: hot-domain skew)
    r = _h(f"host:{seed}:{i}")
    if r % 10 < 4:
        return HOT_HOST
    return f"site{r % n_hosts:03d}.example.org"


def page_url(i: int, n_hosts: int = 50, seed: int = 42) -> str:
    host = _host_for(i, n_hosts, seed)
    section = _h(f"sec:{seed}:{i}") % 7
    return f"https://{host}/s{section}/page-{i:06d}.html"


def _words(key: str, n: int) -> str:
    out = []
    x = _h(key)
    for k in range(n):
        out.append(_WORDS[(x >> (k % 48)) % len(_WORDS)])
        x = x * 6364136223846793005 + 1442695040888963407 & (2**64 - 1)
    return " ".join(out)


def page_html(i: int, n_pages: int, n_hosts: int = 50, seed: int = 42) -> str:
    """Deterministic HTML for page i: metadata-rich, strip-blocks, mixed links."""
    url = page_url(i, n_hosts, seed)
    r = _h(f"page:{seed}:{i}")
    title = f"Page {i}: {_words(f't:{seed}:{i}', 4)}"
    author = f"Author {(r >> 8) % 97}"
    published = (EPOCH + dt.timedelta(days=r % 365)).date().isoformat()
    desc = _words(f"d:{seed}:{i}", 10)
    para1 = _words(f"p1:{seed}:{i}", 28)
    para2 = _words(f"p2:{seed}:{i}", 24)
    tags = sorted({_WORDS[(r >> (4 * k)) % len(_WORDS)] for k in range(3)})

    # deterministic out-links: a few same-site relative, one absolute
    # same-host, one cross-domain, plus mailto/fragment noise
    n_rel = r % 4
    links = [f'<li><a href="./page-{(i * 7 + k + 1) % n_pages:06d}.html">rel {k}</a></li>' for k in range(n_rel)]
    links.append(f'<li><a href="{page_url((i * 13 + 5) % n_pages, n_hosts, seed)}">abs</a></li>')
    links.append(f'<li><a href="https://site{(r >> 16) % n_hosts:03d}.example.org/x.html">cross</a></li>')
    links.append('<li><a href="mailto:a@b.c">mail</a></li>')
    links.append('<li><a href="#top">frag</a></li>')

    head_meta = ""
    if r % 5 != 0:  # some pages have no metadata head (FIXTURES.md)
        head_meta = (
            f'<link rel="canonical" href="{url}">'
            f'<meta property="og:title" content="{title}">'
            f'<meta name="author" content="{author}">'
            f'<meta property="article:published_time" content="{published}">'
            f'<meta property="og:image" content="https://{HOT_HOST}/img/{i}.png">'
            f'<meta name="description" content="{desc}">'
        )
    return (
        "<!DOCTYPE html>"
        f'<html lang="en"><head><meta charset="utf-8"><title>{title}</title>{head_meta}</head>'
        "<body>"
        '<nav><a href="/">Home</a><a href="/about">About</a></nav>'
        "<script>var tracker = 'strip-me';</script>"
        "<style>.x{color:red}</style>"
        f"<main><article><h1>{title}</h1>"
        f'<p class="byline">By {author}</p>'
        f"<p>{para1}</p><p>{para2}</p>"
        f'<ul class="tags">{"".join(f"<li><a href=/tag/{t}>{t}</a></li>" for t in tags)}</ul>'
        f"<h2>Links</h2><ul>{''.join(links)}</ul>"
        "</article></main>"
        "<footer>strip-me footer</footer>"
        "</body></html>"
    )


def synth_pages(
    spark: SparkSession,
    n_pages: int = 200,
    n_hosts: int = 50,
    seed: int = 42,
    partitions: int | None = None,
    with_text: bool = True,
) -> DataFrame:
    """Distributed deterministic pages table (executor-side generation).

    ``with_text=False`` skips the golden cleaned-text column (it costs a
    full clean per row) — used when generating large bench corpora where
    the pipeline under test computes the text itself."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ares_spark.html import clean_html  # ships via --py-files

        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                html = page_html(i, n_pages, n_hosts, seed)
                rows.append(
                    {
                        "url": page_url(i, n_hosts, seed),
                        "warc_ts": EPOCH + dt.timedelta(seconds=i),
                        "html": html.encode("utf-8"),
                        # golden column: what the pipeline must reproduce
                        "text": clean_html(html) if with_text else None,
                        "lang": _LANGS[_h(f"lang:{seed}:{i}") % len(_LANGS)],
                    }
                )
            yield pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])

    base = spark.range(n_pages)
    if partitions:
        base = base.repartition(partitions)
    return base.mapInPandas(gen, schema=PAGES_SCHEMA)


def synth_linked_pages(
    spark: SparkSession,
    n_pages: int,
    n_hosts: int = 50,
    fanout: int = 8,
    seed: int = 42,
    partitions: int | None = None,
) -> tuple[DataFrame, str]:
    """A fully-linked synthetic web for crawl benchmarking: every link
    resolves to a REAL page (no 404 noise), page i links to the ``fanout``
    pages (i*fanout+1 .. i*fanout+fanout) mod n, mixing same-host relative
    and cross-host absolute links. Returns (pages, seed_url); BFS from the
    seed reaches all n pages in ~log_fanout(n) generations."""

    def linked_url(i: int) -> str:
        return f"https://site{i % n_hosts:03d}.example.org/p{i}.html"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                links = []
                for k in range(1, fanout + 1):
                    j = (i * fanout + k) % n_pages
                    target = linked_url(j)
                    if j % n_hosts == i % n_hosts:
                        links.append(f'<a href="/p{j}.html">l{k}</a>')
                    else:
                        links.append(f'<a href="{target}">l{k}</a>')
                title = f"Linked page {i}"
                html = (
                    f"<html><head><title>{title}</title>"
                    f'<meta name="author" content="Gen {i % 13}">'
                    f'<meta name="description" content="{_words(f"ld:{seed}:{i}", 8)}">'
                    f"</head><body><h1>{title}</h1>"
                    f"<p>{_words(f'lp:{seed}:{i}', 30)}</p>"
                    f"<ul>{''.join(links)}</ul></body></html>"
                )
                rows.append(
                    {
                        "url": linked_url(i),
                        "warc_ts": EPOCH + dt.timedelta(seconds=i),
                        "html": html.encode(),
                        "text": None,
                        "lang": "en",
                    }
                )
            yield pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])

    base = spark.range(n_pages)
    if partitions:
        base = base.repartition(partitions)
    return base.mapInPandas(gen, schema=PAGES_SCHEMA), linked_url(0)


# --- reference crawl mini-site, table-backed (FIXTURES.md §6) ---------------

CRAWL_SEED_URL = "https://blog.example.com/"
_CRAWL_FILES = {
    "https://blog.example.com/": "index.html",
    "https://blog.example.com/post-backpressure.html": "post-backpressure.html",
    "https://blog.example.com/post-ownership.html": "post-ownership.html",
}


def crawl_site_pages(spark: SparkSession) -> DataFrame:
    """The reference's bench/fixtures/crawl/ mini-site as a pages table.

    NOTE: link targets inside index.html are ./post-*.html, which resolve
    against the seed to https://blog.example.com/post-*.html.
    """
    from pathlib import Path

    from ares_spark.html import clean_html

    fixtures = Path("/root/reference/bench/fixtures/crawl")
    rows = []
    for ts_off, (url, fname) in enumerate(_CRAWL_FILES.items()):
        html = (fixtures / fname).read_text()
        rows.append(
            (url, EPOCH + dt.timedelta(seconds=ts_off), html.encode(), clean_html(html), "en")
        )
    return spark.createDataFrame(rows, PAGES_SCHEMA)
