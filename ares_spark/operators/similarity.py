"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: exact baseline; JVM-side dot products via
  ``zip_with`` + ``aggregate`` (no Python per row).
- LSH-bucketed ANN: random-hyperplane signatures as the scale path —
  candidates only within matching buckets, then exact re-rank. Hyperplanes
  are seed-derived (deterministic), broadcast as literal arrays.

At cluster scale the brute-force path is an O(n·q) shuffle join — usable
for small query sets against big corpora (queries broadcast); the LSH path
keys the shuffle by bucket so cost tracks bucket occupancy, and a plane
count of p gives 2^p buckets to spread the corpus.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k per query. queries: (query_id, embedding).

    The query side is broadcast (small by construction); ranking is a
    window per query id. Ties broken by corpus id for determinism.
    """
    from pyspark.sql import Window

    q = queries.select(F.col(query_id_col), F.col(vec_col).alias("__qvec"))
    scored = corpus.select(F.col(id_col), F.col(vec_col)).join(F.broadcast(q)).withColumn(
        "cosine", cosine(F.col(vec_col), F.col("__qvec"))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, F.round("cosine", 6).alias("cosine"), "rank")
    )


def _hyperplanes(dim: int, planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-gaussian hyperplanes from sha256 bits
    (Box-Muller over hash-derived uniforms)."""
    out = []
    for p in range(planes):
        row = []
        for d in range(0, dim, 2):
            h = hashlib.sha256(f"{seed}:{p}:{d}".encode()).digest()
            u1 = (int.from_bytes(h[:8], "big") / 2**64) or 1e-12
            u2 = int.from_bytes(h[8:16], "big") / 2**64
            r = math.sqrt(-2 * math.log(u1))
            row.append(r * math.cos(2 * math.pi * u2))
            if d + 1 < dim:
                row.append(r * math.sin(2 * math.pi * u2))
        out.append(row[:dim])
    return out


def lsh_bucket(vec_col, dim: int, planes: int = 8, seed: int = 42):
    """Bucket id column: sign bits against `planes` fixed hyperplanes."""
    hps = _hyperplanes(dim, planes, seed)
    bucket = F.lit(0).cast("long")
    for i, hp in enumerate(hps):
        plane = F.array(*[F.lit(float(x)) for x in hp])
        bit = F.when(_dot(vec_col, plane) > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        bucket = bucket + F.shiftleft(bit, i)
    return bucket


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    planes: int = 8,
    tables: int = 8,
    multiprobe_bits: int = 1,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: exact cosine re-rank within matching LSH buckets.

    Standard multi-table random-hyperplane LSH: ``tables`` independent
    hash tables of ``planes`` sign bits each; a corpus vector is a
    candidate if it matches the query's bucket in ANY table (plus 1-bit
    multi-probe flips per table). Recall rises with tables and falls with
    planes; cost tracks total bucket occupancy — at 10^9 vectors pick
    planes so 2^planes * tables ≫ executor count and each bucket fits a
    task. Candidates dedup on (query, id) before the exact re-rank.
    """
    from pyspark.sql import Window

    c_buckets = corpus.select(
        F.col(id_col),
        F.col(vec_col),
        F.explode(
            F.array(
                *[
                    F.concat_ws(
                        ":", F.lit(str(t)),
                        lsh_bucket(F.col(vec_col), dim, planes, seed + 1000 * t).cast("string"),
                    )
                    for t in range(tables)
                ]
            )
        ).alias("bucket"),
    )
    probe_cols = []
    for t in range(tables):
        b = lsh_bucket(F.col(vec_col), dim, planes, seed + 1000 * t)
        variants = [b]
        if multiprobe_bits >= 1:
            variants += [b.bitwiseXOR(F.lit(1 << i)) for i in range(planes)]
        probe_cols += [
            F.concat_ws(":", F.lit(str(t)), v.cast("string")) for v in variants
        ]
    probes = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("__qvec"),
        F.explode(F.array(*probe_cols)).alias("bucket"),
    )
    cand = (
        c_buckets.join(F.broadcast(probes), "bucket")
        .select(query_id_col, id_col, vec_col, "__qvec")
        .dropDuplicates([query_id_col, id_col])
    )
    scored = cand.withColumn("cosine", cosine(F.col(vec_col), F.col("__qvec")))
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, F.round("cosine", 6).alias("cosine"), "rank")
    )
