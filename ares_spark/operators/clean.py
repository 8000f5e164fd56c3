"""Vectorized clean / link-discovery operators (SURVEY.md A6, A7, A14).

The hot path is ``process_pages``: one ``mapInPandas`` pass that decodes
each ``html:binary`` cell ONCE and emits both the cleaned text and the
discovered links — the columnar analog of the reference's zero-copy
``Arc<str>`` HTML hand-off (models.rs:162-163). Arrow-batched, no
per-row Python round trips (BASELINE.json input_hint).

Scale notes:
- html parsing is CPU-bound Python; parallelism = input partitions, so
  the caller repartitions by salted host first (crawl/politeness.py) —
  that both defeats hot-domain skew and keeps politeness accounting local.
- output text/links stay columnar; content_hash is computed JVM-side
  (F.sha2) so the UDF only does what the JVM genuinely cannot.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ares_spark.html import clean_html, process_html

DEFAULT_MAX_CONTENT_CHARS = 500_000


def _decode(b) -> str:
    if b is None:
        return ""
    if isinstance(b, (bytes, bytearray)):
        return bytes(b).decode("utf-8", errors="replace")
    return str(b)


@pandas_udf(T.StringType())
def clean_html_udf(html: pd.Series) -> pd.Series:
    """html (binary|string) -> cleaned markdown text. A6."""
    return html.map(lambda b: clean_html(_decode(b)))


# fused output schema for process_pages
_PROCESSED_FIELDS = [
    T.StructField("text", T.StringType()),
    T.StructField("links", T.ArrayType(T.StringType())),
]


def process_pages(
    pages: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
    max_content_chars: int = DEFAULT_MAX_CONTENT_CHARS,
    with_hash: bool = True,
) -> DataFrame:
    """frontier⋈pages batch -> + text, links, content_hash columns.

    Single html decode+parse per row (A6+A14 fused); sha2 content hash
    (A11, models.rs:167-171) stays JVM-side for codegen.
    """
    schema = T.StructType(
        [f for f in pages.schema.fields if f.name not in ("text", "links", "content_hash")]
        + _PROCESSED_FIELDS
    )
    in_names = [f.name for f in pages.schema.fields]
    keep = [n for n in in_names if n not in ("text", "links", "content_hash")]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts = []
            links = []
            for html, url in zip(pdf[html_col], pdf[url_col]):
                t, l = process_html(_decode(html), url or "", max_content_chars)
                texts.append(t)
                links.append(l)
            out = pdf[keep].copy()
            out["text"] = texts
            out["links"] = links
            yield out

    result = pages.mapInPandas(run, schema=schema)
    if with_hash:
        result = result.withColumn("content_hash", F.sha2(F.col("text"), 256))
    return result


def with_cleaned_text(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """Cheap variant when links aren't needed (no spidering)."""
    return pages.withColumn("text", clean_html_udf(F.col(html_col))).withColumn(
        "content_hash", F.sha2(F.col("text"), 256)
    )
