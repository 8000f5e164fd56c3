"""Dedup + similarity operator semantics (training-data ops)."""

import pytest
from pyspark.sql import functions as F

from ares_spark.operators.dedup import (
    dedup_exact,
    exact_duplicates,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash64,
    simhash_near_pairs,
)
from ares_spark.operators.similarity import brute_force_topk, lsh_ann_topk


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    rows = [
        (0, base),
        (1, base),  # exact dup of 0
        (2, base.replace("lazy", "sleepy")),  # near dup
        (3, "completely different text about spark shuffles and partitions ok"),
        (4, base.replace("today", "tomorrow morning")),  # near dup
        (5, "another unrelated document mentioning bloom filters and crawling"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_exact_duplicates_groups(spark, docs):
    groups = exact_duplicates(docs).collect()
    assert len(groups) == 1
    g = groups[0]
    assert g.dup_count == 2 and g.keeper_id == 0 and g.member_ids == [0, 1]


def test_dedup_exact_keeps_min_id(spark, docs):
    kept = sorted(r.doc_id for r in dedup_exact(docs).collect())
    assert kept == [0, 2, 3, 4, 5]


def test_ngram_jaccard_finds_near_dups(spark, docs):
    pairs = {(r.id_a, r.id_b): r.jaccard for r in ngram_jaccard_pairs(docs, threshold=0.3).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs and 0.3 <= pairs[(0, 2)] < 1.0
    assert not any(3 in p or 5 in p for p in pairs)


def test_minhash_lsh_candidates_subset_confirmed(spark, docs):
    """LSH pairs ⊆ exact-Jaccard pairs at the same threshold (the bucket
    join only generates candidates; the confirm step enforces the bound)."""
    lsh = {(r.id_a, r.id_b) for r in minhash_lsh_pairs(docs, threshold=0.3).collect()}
    exact = {(r.id_a, r.id_b) for r in ngram_jaccard_pairs(docs, threshold=0.3).collect()}
    assert lsh <= exact
    assert (0, 1) in lsh  # identical texts always collide in every band


def test_simhash_identical_and_near(spark, docs):
    sims = {r.doc_id: r.simhash for r in simhash64(docs).collect()}
    assert sims[0] == sims[1]
    near = {(r.id_a, r.id_b): r.hamming for r in
            simhash_near_pairs(docs, max_hamming=10).collect()}
    assert near.get((0, 1)) == 0
    assert (0, 2) in near  # one-token change → small hamming distance


def test_ann_lsh_recall_vs_bruteforce(spark, sf_dir):
    """LSH ANN recall@5 vs exact brute force on the real embeddings table:
    multi-probe 6-plane buckets must recover most true neighbors."""
    emb = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .withColumn("embedding", F.col("embedding").cast("array<double>"))
    )
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= 10)
    exact = brute_force_topk(corpus, queries, k=5)
    approx = lsh_ann_topk(corpus, queries, dim=64, k=5, planes=6, tables=8)
    e = {(r.query_id, r.vec_id) for r in exact.collect()}
    a = {(r.query_id, r.vec_id) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.8, f"recall@5 = {recall}"
