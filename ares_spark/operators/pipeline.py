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


def scrape_fused(
    batch: DataFrame,
    schema: dict,
    max_content_chars: int = 500_000,
) -> DataFrame:
    """One-pass clean+extract+validate+ground over (url, html, ...) rows.

    The throughput path: a single mapInPandas stage computes everything
    per row with a partition-local extraction memo keyed by content hash
    (the A24 cache, partition-scoped). Compared with the two-stage
    global-dedup path this trades cross-partition dedup of extraction work
    for: one Python IPC pass instead of two, no shuffle, no persist, no
    join — a large win when content duplication across partitions is low
    or the extractor is cheap, and the right default in syscall-expensive
    environments (microVMs) where JVM↔Python socket traffic dominates.
    Results are IDENTICAL to the two-stage path (extraction is a pure
    function of (text, schema)).
    """
    import hashlib

    schema_json = json.dumps(schema)
    out_schema = T.StructType(
        [f for f in batch.schema.fields if f.name not in
         ("text", "links", "content_hash", "extracted_data", "is_valid",
          "validation_errors", "ungrounded_paths")]
        + [
            T.StructField("text", T.StringType()),
            T.StructField("links", T.ArrayType(T.StringType())),
            T.StructField("content_hash", T.StringType()),
            T.StructField("extracted_data", T.StringType()),
            T.StructField("is_valid", T.BooleanType()),
            T.StructField("validation_errors", T.ArrayType(T.StringType())),
            T.StructField("ungrounded_paths", T.ArrayType(T.StringType())),
        ]
    )
    keep = [f.name for f in out_schema.fields if f.name not in
            ("text", "links", "content_hash", "extracted_data", "is_valid",
             "validation_errors", "ungrounded_paths")]

    def run(batches):
        from ares_spark.html import process_html
        from ares_spark.operators.extract import canonical_json, extract_structured
        from ares_spark.operators.groundedness import ungrounded_fields
        from ares_spark.operators.validate import validate_extracted_output

        sch = json.loads(schema_json)
        memo: dict[str, tuple] = {}  # content_hash -> extraction result
        for pdf in batches:
            texts, links_col, hashes = [], [], []
            datas, valids, errses, ungs = [], [], [], []
            for html, url in zip(pdf["html"], pdf["url"]):
                raw = bytes(html).decode("utf-8", "replace") if isinstance(
                    html, (bytes, bytearray)) else (html or "")
                text, links = process_html(raw, url or "", max_content_chars)
                chash = hashlib.sha256(text.encode()).hexdigest()
                hit = memo.get(chash)
                if hit is None:
                    value = extract_structured(text, sch)
                    errors = validate_extracted_output(sch, value)
                    ung = ungrounded_fields(text, value) if not errors else []
                    hit = (canonical_json(value), not errors, errors, ung)
                    if len(memo) < 100_000:
                        memo[chash] = hit
                texts.append(text)
                links_col.append(links)
                hashes.append(chash)
                datas.append(hit[0])
                valids.append(hit[1])
                errses.append(hit[2])
                ungs.append(hit[3])
            out = pdf[keep].copy()
            out["text"] = texts
            out["links"] = links_col
            out["content_hash"] = hashes
            out["extracted_data"] = datas
            out["is_valid"] = valids
            out["validation_errors"] = errses
            out["ungrounded_paths"] = ungs
            yield out

    return batch.mapInPandas(run, schema=out_schema)


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
    parallelism: int | None = None,
    mode: str = "fused",
    cache_ttl_s: float | None = None,
) -> DataFrame:
    """Run the full per-batch pipeline over rows carrying (url, html).

    Returns extraction rows (FIXTURES.md §4 shape) with ``is_valid``,
    ``ungrounded_paths``, ``changed`` and ``links`` columns; caller persists
    ``is_valid`` rows and feeds ``links`` to the spider stage.

    CPU-stage partitioning: the clean/extract pandas UDFs are CPU-bound
    per ROW, but Spark sizes input splits and AQE-coalesced shuffles by
    BYTES — a 60 MB batch of 40k pages otherwise lands on 1-2 tasks and
    serializes the whole pipeline (measured: local[32] slower than
    local[8]). We therefore repartition explicitly to ``parallelism``
    (default: sc.defaultParallelism) on url-hash before each UDF stage;
    an explicit repartition also opts that exchange out of AQE
    coalescing.
    """
    if parallelism is None:
        parallelism = batch.sparkSession.sparkContext.defaultParallelism
    # only shuffle when the source is too narrow for the UDF stage — a
    # well-partitioned scan (files.maxPartitionBytes sized for ~row-count
    # parallelism) skips a full shuffle of the html payload
    if batch.rdd.getNumPartitions() < parallelism:
        batch = batch.repartition(parallelism, F.xxhash64("url"))

    if mode == "fused" and prior_extractions is None:
        # single-pass clean+extract with partition-local memo (see
        # scrape_fused): fewer Python IPC passes, no mid-pipeline shuffle
        joined = scrape_fused(batch, schema, max_content_chars)
    else:
        processed = process_pages(batch, max_content_chars=max_content_chars)
        # persist: two consumers (distinct-content extraction + the final
        # join) would otherwise re-run the html-parse UDF — the most
        # expensive stage — twice (measured 2x wall time).
        from pyspark import StorageLevel

        processed = processed.persist(StorageLevel.MEMORY_AND_DISK)

        # A24 extraction cache: extract once per distinct cleaned content.
        distinct_texts = (
            processed.select("content_hash", "text")
            .repartition(parallelism, "content_hash")
            .dropDuplicates(["content_hash"])
        )

        if prior_extractions is not None:
            # cache hits: reuse prior results for known content hashes.
            # Only VALID priors are hits (an invalid row handed in by a
            # caller must not resurrect as valid), and the stored
            # validation_errors/ungrounded_paths are carried through so a
            # cache hit reports exactly what a fresh extraction would.
            fresh_priors = prior_extractions.filter(
                (F.col("schema_name") == schema_name)
                & (F.col("model") == model)
                & F.col("is_valid")
            )
            if cache_ttl_s is not None:
                # A24 TTL (cache.rs:26-44 moka time_to_live): a prior older
                # than the TTL relative to this batch's logical timestamp is
                # EXPIRED — the content re-extracts instead of reusing it
                if batch_ts is None:
                    raise ValueError(
                        "cache_ttl_s needs an explicit batch_ts — TTL is "
                        "measured against the batch's logical clock, not "
                        "wall time (runs must be replayable)"
                    )
                now_s = F.lit(batch_ts).cast("timestamp").cast("double")
                fresh_priors = fresh_priors.filter(
                    now_s - F.col("created_at").cast("double") <= cache_ttl_s
                )
            prior_hits = (
                fresh_priors
                .select(
                    "content_hash", "extracted_data", "is_valid",
                    "validation_errors", "ungrounded_paths",
                )
                .dropDuplicates(["content_hash"])
            )
            misses = distinct_texts.join(
                prior_hits.select("content_hash"), "content_hash", "left_anti"
            )
            results = extract_distinct(misses, schema).unionByName(prior_hits)
        else:
            results = extract_distinct(distinct_texts, schema)

        joined = processed.join(results, "content_hash", "left")

    enriched = (
        joined.withColumn("schema_name", F.lit(schema_name))
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


def hash_bucket_col(key_col, seed: int = 42, buckets: int = 1_000_000):
    """Deterministic sampling bucket in [0, buckets): md5-derived so the
    SAME bucket is computable in any engine (the DuckDB oracle replays
    it) — reproducible across runs, partitions, and cluster sizes,
    unlike rand()-based sampling."""
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    h = F.md5(F.concat_ws("\x1f", key.cast("string"), F.lit(str(seed))))
    return F.pmod(
        F.conv(F.substring(h, 1, 15), 16, 10).cast("long"), F.lit(buckets)
    ).cast("int")


def stratified_sample(
    df: DataFrame,
    fracs: dict[str, float],
    strata_col: str,
    key_col: str,
    seed: int = 42,
    default_frac: float = 0.0,
) -> DataFrame:
    """Deterministic stratified corpus mixing (the data-mixture step of a
    training pipeline): keep each row iff its hash bucket falls under its
    stratum's fraction. Pure column math — no shuffle, no RNG state, no
    sampleBy approximation — and exactly reproducible at any scale or
    partitioning, so a 100-TB mixture is re-derivable row-for-row."""
    buckets = 1_000_000
    bucket = hash_bucket_col(key_col, seed, buckets)
    frac = F.lit(float(default_frac))
    for value, f in sorted(fracs.items()):
        frac = F.when(F.col(strata_col) == value, float(f)).otherwise(frac)
    return df.filter(bucket < (frac * buckets).cast("int"))
