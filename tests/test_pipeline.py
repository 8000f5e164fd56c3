"""End-to-end scrape pipeline over the synthetic pages table (M1)."""

import json

import pytest
from pyspark.sql import functions as F

from ares_spark.io.synth import CRAWL_SEED_URL, crawl_site_pages, synth_pages
from ares_spark.operators.pipeline import latest_per_key, scrape_batch
from ares_spark.schemas import SchemaRegistry


@pytest.fixture(scope="module")
def pages(spark):
    return synth_pages(spark, n_pages=60, n_hosts=10).cache()


def test_synth_pages_shape(spark, pages):
    rows = pages.collect()
    assert len(rows) == 60
    r = rows[0]
    assert r.url.startswith("https://")
    assert isinstance(r.html, (bytes, bytearray))
    assert r.text  # golden column filled
    hot = sum(1 for r in rows if "hot.example.com" in r.url)
    assert 10 <= hot <= 40  # hot-domain skew present


def test_synth_pages_deterministic(spark):
    a = synth_pages(spark, n_pages=20, n_hosts=5).orderBy("url").collect()
    b = synth_pages(spark, n_pages=20, n_hosts=5, partitions=7).orderBy("url").collect()
    assert [(r.url, bytes(r.html)) for r in a] == [(r.url, bytes(r.html)) for r in b]


def test_pipeline_text_matches_golden_column(spark, pages):
    """Byte-identical invariant: pipeline text == pre-computed golden text."""
    _, _, schema = SchemaRegistry().resolve("blog")
    out = scrape_batch(pages.withColumnRenamed("text", "expected_text"), schema, "blog")
    mismatches = out.filter(F.col("text") != F.col("expected_text")).count()
    assert mismatches == 0


def test_pipeline_extracts_and_hashes(spark, pages):
    _, _, schema = SchemaRegistry().resolve("blog")
    out = scrape_batch(pages, schema, "blog").cache()
    assert out.count() == 60
    row = out.filter(F.col("is_valid")).first()
    data = json.loads(row.extracted_data)
    assert set(data) <= {"title", "author", "publish_date", "summary", "tags", "hero_image", "url"}
    assert len(row.content_hash) == 64 and len(row.data_hash) == 64
    # pages without head metadata fail required-field validation -> gated
    assert out.filter(~F.col("is_valid")).count() > 0
    # no prior extractions -> everything is 'changed'
    assert out.filter(~F.col("changed")).count() == 0


def test_pipeline_change_detection(spark, pages):
    _, _, schema = SchemaRegistry().resolve("blog")
    first = scrape_batch(pages, schema, "blog").filter(F.col("is_valid"))
    prior = first.select(
        "id",
        "url",
        "schema_name",
        "extracted_data",
        "content_hash",
        "data_hash",
        "model",
        "provider",
        "schema_version",
        "created_at",
        # the A24 cache reuses only VALID priors and carries their stored
        # validation columns through — history rows must provide them
        "is_valid",
        "validation_errors",
        "ungrounded_paths",
    ).cache()
    # re-scrape the same pages with the prior history: nothing changed,
    # and every content hash is a cache hit (A24)
    second = scrape_batch(
        pages.join(prior.select("url"), "url", "left_semi"),
        schema,
        "blog",
        prior_extractions=prior,
    ).cache()
    assert second.count() == prior.count()
    assert second.filter(F.col("changed")).count() == 0
    # cache reuse preserves extracted_data byte-for-byte
    joined = second.alias("s").join(prior.alias("p"), "url")
    assert (
        joined.filter(F.col("s.extracted_data") != F.col("p.extracted_data")).count() == 0
    )


def test_crawl_site_pages_clean(spark):
    df = crawl_site_pages(spark)
    assert df.count() == 3
    seed = df.filter(F.col("url") == CRAWL_SEED_URL).first()
    assert "Foundry Blog" in seed.text


def test_latest_per_key(spark):
    rows = [
        ("u1", "s", "2026-01-01 00:00:00", "a"),
        ("u1", "s", "2026-01-03 00:00:00", "c"),
        ("u1", "s", "2026-01-02 00:00:00", "b"),
        ("u2", "s", "2026-01-01 00:00:00", "z"),
    ]
    df = spark.createDataFrame(rows, "url string, schema_name string, created_at string, id string")
    got = {
        r.url: r.id
        for r in latest_per_key(df.withColumn("created_at", F.to_timestamp("created_at")),
                                ["url", "schema_name"]).collect()
    }
    assert got == {"u1": "c", "u2": "z"}


def test_pipeline_cache_ignores_invalid_priors(spark, pages):
    """An invalid prior row handed in by a caller must NOT resurrect as a
    valid cache hit, and cache hits must report the STORED validation
    columns (not synthesized empties)."""
    _, _, schema = SchemaRegistry().resolve("blog")
    first = scrape_batch(pages, schema, "blog").cache()
    cols = [
        "id", "url", "schema_name", "extracted_data", "content_hash",
        "data_hash", "model", "provider", "schema_version", "created_at",
        "is_valid", "validation_errors", "ungrounded_paths",
    ]
    # poison the history: flip every prior to invalid
    poisoned = first.select(*cols).withColumn("is_valid", F.lit(False))
    second = scrape_batch(pages, schema, "blog", prior_extractions=poisoned, mode="staged").cache()
    # nothing is a cache hit -> results equal a fresh extraction, row by row
    fresh = scrape_batch(pages, schema, "blog").cache()
    j = second.alias("s").join(fresh.alias("f"), "url")
    assert j.filter(
        (F.col("s.is_valid") != F.col("f.is_valid"))
        | (F.col("s.extracted_data") != F.col("f.extracted_data"))
    ).count() == 0
    # genuine (valid) priors: hits carry the stored ungrounded_paths through
    second2 = scrape_batch(
        pages, schema, "blog",
        prior_extractions=first.select(*cols), mode="staged",
    ).cache()
    j2 = second2.alias("s").join(first.filter(F.col("is_valid")).alias("p"), "url")
    assert j2.filter(
        F.col("s.ungrounded_paths") != F.col("p.ungrounded_paths")
    ).count() == 0


def test_pipeline_cache_ttl_expires_stale_priors(spark, pages):
    """A24 TTL (cache.rs:26-44): a valid prior older than cache_ttl_s
    relative to the batch's logical timestamp is EXPIRED — its content
    re-extracts fresh; a prior within the TTL is still a hit. Without a
    cache_ttl_s, priors are reused regardless of age (legacy behavior)."""
    _, _, schema = SchemaRegistry().resolve("blog")
    first = scrape_batch(pages, schema, "blog", batch_ts="2026-01-01 00:00:00")
    cols = [
        "id", "url", "schema_name", "extracted_data", "content_hash",
        "data_hash", "model", "provider", "schema_version", "created_at",
        "is_valid", "validation_errors", "ungrounded_paths",
    ]
    sentinel = '{"title":"FROM-CACHE"}'
    prior = (first.filter(F.col("is_valid")).select(*cols)
             .withColumn("extracted_data", F.lit(sentinel)))
    n_valid = prior.count()

    def hits(batch_ts, ttl):
        out = scrape_batch(pages, schema, "blog", prior_extractions=prior,
                           batch_ts=batch_ts, mode="staged", cache_ttl_s=ttl)
        return out.filter(F.col("extracted_data") == sentinel).count()

    # 1 day later with a 7-day TTL: every valid prior is still a hit
    assert hits("2026-01-02 00:00:00", 7 * 86400.0) == n_valid
    # 31 days later with a 7-day TTL: everything expired, zero hits
    assert hits("2026-02-01 00:00:00", 7 * 86400.0) == 0
    # no TTL: age is irrelevant (reuse-forever legacy mode)
    out = scrape_batch(pages, schema, "blog", prior_extractions=prior,
                       batch_ts="2027-01-01 00:00:00", mode="staged")
    assert out.filter(F.col("extracted_data") == sentinel).count() == n_valid
    # TTL without a logical clock is refused — replayability contract
    with pytest.raises(ValueError, match="batch_ts"):
        scrape_batch(pages, schema, "blog", prior_extractions=prior,
                     mode="staged", cache_ttl_s=60.0)
