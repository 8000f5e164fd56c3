"""BucketedPages — Iceberg bucket-partition-pruning analog for the fetch
stage (crawl/pagestore.py).

Pins three things:
 1. layout + bucket math: pmod(xxhash64(url), B) matches the frontier's
    url_hash-derived bucket ids exactly (store and probe cannot drift);
 2. partition pruning is REAL — the pruned scan's input files are a strict
    subset limited to the requested bucket dirs (plan-level evidence, not
    just row equality);
 3. crawl-trace equivalence: a full crawl fetching through BucketedPages
    is generation-for-generation identical to the plain-DataFrame corpus
    join (visits, extractions, frontier, seen).
"""

import pytest
from pyspark.sql import functions as F

from ares_spark.crawl import BucketedPages, CrawlConfig, run_crawl, write_bucketed_pages
from ares_spark.crawl.checkpoint import SnapshotStore
from ares_spark.crawl.pagestore import page_bucket_col
from ares_spark.crawl.seen import url_hash_col
from ares_spark.io.synth import CRAWL_SEED_URL, crawl_site_pages

SEED = CRAWL_SEED_URL


@pytest.fixture(scope="module")
def site(spark):
    return crawl_site_pages(spark).cache()


@pytest.fixture(scope="module")
def store(spark, site, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("pagestore") / "pages_bucketed")
    return write_bucketed_pages(site, path, n_buckets=8)


def test_roundtrip_and_bucket_math(spark, site, store):
    """read_all returns the corpus unchanged; bucket ids derived from the
    url column at write time equal pmod(url_hash, B) at probe time."""
    back = store.read_all(spark)
    assert sorted(r.url for r in back.select("url").collect()) == sorted(
        r.url for r in site.select("url").collect()
    )
    # bucket-function lockstep: url-derived vs url_hash-derived ids agree
    both = site.select(
        page_bucket_col(8).alias("from_url"),
        F.pmod(url_hash_col("url"), F.lit(8)).cast("int").alias("from_hash"),
    )
    assert both.filter(F.col("from_url") != F.col("from_hash")).count() == 0


def test_pruned_scan_reads_only_named_buckets(spark, site, store):
    """Plan-level pruning evidence: inputFiles of a 2-bucket scan touch
    only those bucket dirs and strictly fewer files than the full scan."""
    probe = site.limit(1).select("url", url_hash_col("url").alias("url_hash"))
    buckets = store.buckets_for_batch(probe)
    assert len(buckets) == 1
    pruned = store.scan_buckets(spark, buckets)
    # inputFiles() reports the relation pre-pruning; input_file_name() at
    # execution time reflects the files actually read after the
    # PartitionFilters fire
    files = [
        r[0]
        for r in pruned.select(F.input_file_name()).distinct().collect()
    ]
    all_files = spark.read.parquet(store.path).inputFiles()
    assert files and len(files) < len(all_files)
    allowed = {f"page_bucket={b}" for b in buckets}
    for f in files:
        assert any(a in f for a in allowed), f"unpruned file read: {f}"
    # and the pruned scan still contains every probe url
    got = {r.url for r in pruned.select("url").collect()}
    assert {r.url for r in probe.select("url").collect()} <= got


def test_empty_batch_scans_nothing(spark, site, store):
    empty = site.limit(0).select("url", url_hash_col("url").alias("url_hash"))
    assert store.buckets_for_batch(empty) == []
    assert store.scan_buckets(spark, []).count() == 0


def _trace(spark, ckpt):
    st = SnapshotStore(ckpt)
    visits = [
        (r.visit_pos, r.url, r.outcome)
        for r in st.read_all_batches(spark, "visits").orderBy("visit_pos").collect()
    ]
    ex = sorted(
        (r.url, r.data_hash)
        for r in st.read_all_batches(spark, "extractions").collect()
    )
    seen = sorted(r.url for r in st.read_all_batches(spark, "url_seen").collect())
    return visits, ex, seen


def test_crawl_trace_identical_to_dataframe_fetch(spark, site, store, tmp_path_factory):
    """The bucket-pruned fetch is a pure plan substitution: depth-2 crawl
    (retries, tag-page fetch errors and all) produces byte-identical
    visits / extractions / seen vs the plain corpus-DataFrame join."""
    cfg = CrawlConfig(
        schema_spec="blog@latest", max_depth=2, max_pages=100, max_retries=1,
        use_bloom=False, max_generations=20,
        breaker={"failure_threshold": 1_000},
    )
    ck_a = str(tmp_path_factory.mktemp("crawl_plain"))
    ck_b = str(tmp_path_factory.mktemp("crawl_bucketed"))
    sum_a = run_crawl(spark, site, [SEED], ck_a, cfg)
    sum_b = run_crawl(spark, store, [SEED], ck_b, cfg)
    assert sum_a["generation"] == sum_b["generation"]
    assert _trace(spark, ck_a) == _trace(spark, ck_b)
