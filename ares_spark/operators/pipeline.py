"""The fetch→clean→extract→validate→persist micro-batch (SURVEY.md §3.1).

One declarative DataFrame chain per batch — the Spark equivalent of
``ScrapeService::scrape`` (/root/reference/crates/ares-core/src/scrape.rs:126-311):

    frontier ⋈ pages                   # "fetch" = read html from the pages table
    → process_pages                    # clean + link discovery, one html parse (A6/A14)
    → content_hash = sha2(text)        # A11, JVM-side
    → extraction-cache dedup           # A24: extract once per distinct content
    → extract + validate + ground      # A8/A9/A10, one Arrow pass
    → data_hash = sha2(extracted_data) # A11
    → change detection vs prior latest # A12 (window + left join)
    → valid rows only                  # invalid never persisted (scrape.rs:576-594)

Scale design:
- the expensive UDF runs on DISTINCT content hashes only (web corpora are
  heavily duplicated); results broadcast/shuffle-join back by hash.
- change detection joins against the *latest-per-key slice* of the
  extraction history, not the full history (window + row_number == 1).
- everything else is built-in (sha2, joins, windows) → whole-stage codegen.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ares_spark.operators.clean import process_pages

EXTRACT_RESULT_SCHEMA = T.StructType(
    [
        T.StructField("content_hash", T.StringType()),
        T.StructField("extracted_data", T.StringType()),
        T.StructField("is_valid", T.BooleanType()),
        T.StructField("validation_errors", T.ArrayType(T.StringType())),
        T.StructField("ungrounded_paths", T.ArrayType(T.StringType())),
    ]
)


def extract_distinct(texts: DataFrame, schema: dict) -> DataFrame:
    """(content_hash, text) distinct → extraction results, one Arrow pass.

    extract (A8) + validate (A9) + groundedness (A10) fused so the cleaned
    text is parsed once per distinct content.
    """
    schema_json = json.dumps(schema)  # closure-captured, broadcast with the task

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ares_spark.operators.extract import canonical_json, extract_structured
        from ares_spark.operators.groundedness import ungrounded_fields
        from ares_spark.operators.validate import validate_extracted_output

        sch = json.loads(schema_json)
        for pdf in batches:
            out = []
            for chash, text in zip(pdf["content_hash"], pdf["text"]):
                value = extract_structured(text or "", sch)
                errors = validate_extracted_output(sch, value)
                ungrounded = ungrounded_fields(text or "", value) if not errors else []
                out.append(
                    {
                        "content_hash": chash,
                        "extracted_data": canonical_json(value),
                        "is_valid": not errors,
                        "validation_errors": errors,
                        "ungrounded_paths": ungrounded,
                    }
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "content_hash",
                    "extracted_data",
                    "is_valid",
                    "validation_errors",
                    "ungrounded_paths",
                ],
            )

    return texts.mapInPandas(run, schema=EXTRACT_RESULT_SCHEMA)


def latest_per_key(
    df: DataFrame, keys: list[str], order_col: str = "created_at", tiebreak: str | None = "id"
) -> DataFrame:
    """Newest row per key — repository.rs:48-70 (B5).

    row_number over (partition by keys order by order_col desc, tiebreak
    desc); ties broken deterministically.
    """
    order = [F.col(order_col).desc()]
    if tiebreak:
        order.append(F.col(tiebreak).desc())
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")
    )


def scrape_batch(
    batch: DataFrame,
    schema: dict,
    schema_name: str,
    schema_version: str = "1.0.0",
    model: str = "deterministic-extractor-v1",
    provider: str = "local",
    prior_extractions: DataFrame | None = None,
    batch_ts=None,
    max_content_chars: int = 500_000,
) -> DataFrame:
    """Run the full per-batch pipeline over rows carrying (url, html).

    Returns extraction rows (FIXTURES.md §4 shape) with ``is_valid``,
    ``ungrounded_paths``, ``changed`` and ``links`` columns; caller persists
    ``is_valid`` rows and feeds ``links`` to the spider stage.
    """
    processed = process_pages(batch, max_content_chars=max_content_chars)

    # A24 extraction cache: extract once per distinct cleaned content.
    distinct_texts = processed.select("content_hash", "text").dropDuplicates(["content_hash"])

    if prior_extractions is not None:
        # cache hits: reuse prior extracted_data for known content hashes
        prior_hits = (
            prior_extractions.filter(
                (F.col("schema_name") == schema_name) & (F.col("model") == model)
            )
            .select(
                "content_hash",
                F.col("extracted_data").alias("extracted_data"),
            )
            .dropDuplicates(["content_hash"])
            .withColumn("is_valid", F.lit(True))
            .withColumn("validation_errors", F.array().cast(T.ArrayType(T.StringType())))
            .withColumn("ungrounded_paths", F.array().cast(T.ArrayType(T.StringType())))
            .select(
                "content_hash", "extracted_data", "is_valid", "validation_errors", "ungrounded_paths"
            )
        )
        misses = distinct_texts.join(
            prior_hits.select("content_hash"), "content_hash", "left_anti"
        )
        results = extract_distinct(misses, schema).unionByName(prior_hits)
    else:
        results = extract_distinct(distinct_texts, schema)

    enriched = (
        processed.join(results, "content_hash", "left")
        .withColumn("schema_name", F.lit(schema_name))
        .withColumn("schema_version", F.lit(schema_version))
        .withColumn("model", F.lit(model))
        .withColumn("provider", F.lit(provider))
        .withColumn("data_hash", F.sha2(F.col("extracted_data"), 256))
        .withColumn(
            "created_at",
            F.lit(batch_ts).cast("timestamp") if batch_ts is not None else F.col("warc_ts"),
        )
        .withColumn(
            "id",
            F.sha2(F.concat_ws("\x1f", "url", "schema_name", "data_hash", "created_at"), 256),
        )
    )

    # A12 change detection vs latest prior extraction per (url, schema_name)
    if prior_extractions is not None:
        prior_latest = latest_per_key(
            prior_extractions.filter(F.col("schema_name") == schema_name),
            ["url", "schema_name"],
        ).select("url", "schema_name", F.col("data_hash").alias("prev_data_hash"))
        # no broadcast hint: prior_latest is url-keyed and can be batch-sized;
        # AQE broadcasts it at runtime when it is actually small
        enriched = enriched.join(prior_latest, ["url", "schema_name"], "left").withColumn(
            "changed",
            F.col("prev_data_hash").isNull() | (F.col("prev_data_hash") != F.col("data_hash")),
        )
    else:
        enriched = enriched.withColumn("prev_data_hash", F.lit(None).cast("string")).withColumn(
            "changed", F.lit(True)
        )
    return enriched
