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

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


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
    """Bucket id column: sign bits against `planes` fixed hyperplanes.

    Expression-tree variant (one plane = one literal array + fold) — kept
    for single-table uses and as the spec the vectorized signature stage
    must match (pinned in test_dedup_similarity); for multi-table
    signatures use ``table_signatures_col`` (one numpy matmul per Arrow
    batch instead of tables×planes expression trees, and no megabyte
    literal arrays in the task binary)."""
    hps = _hyperplanes(dim, planes, seed)
    bucket = F.lit(0).cast("long")
    for i, hp in enumerate(hps):
        plane = F.array(*[F.lit(float(x)) for x in hp])
        bit = F.when(_dot(vec_col, plane) > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        bucket = bucket + F.shiftleft(bit, i)
    return bucket


def table_signatures_col(spark, vec_col, dim: int, planes: int, tables: int, seed: int = 42):
    """array<long> column: per-table LSH bucket ids, computed in ONE
    vectorized pass — the plane matrix (tables·planes × dim) is a Spark
    broadcast and each Arrow batch does a single numpy matmul. Bit i of
    table t is sign(vec · plane(seed+1000t, i)), identical to
    ``lsh_bucket`` up to float summation order."""
    import numpy as np

    rows: list[list[float]] = []
    for t in range(tables):
        rows += _hyperplanes(dim, planes, seed + 1000 * t)
    bc = spark.sparkContext.broadcast(np.asarray(rows, dtype=np.float64))
    n_planes, n_tables = planes, tables

    @pandas_udf("array<long>")
    def sig(vecs: pd.Series) -> pd.Series:
        import numpy as np

        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        P = bc.value
        V = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        bits = (V @ P.T) > 0  # (n, tables*planes)
        bits = bits.reshape(len(V), n_tables, n_planes)
        weights = np.left_shift(np.int64(1), np.arange(n_planes, dtype=np.int64))
        buckets = (bits * weights).sum(axis=2, dtype=np.int64)  # (n, tables)
        return pd.Series(list(buckets))

    return sig(vec_col)


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

    spark = corpus.sparkSession
    sigs = table_signatures_col(spark, F.col(vec_col), dim, planes, tables, seed)
    c_buckets = corpus.select(
        F.col(id_col), F.col(vec_col), F.posexplode(sigs).alias("__t", "__b")
    ).select(
        id_col, vec_col, F.concat_ws(":", F.col("__t"), F.col("__b")).alias("bucket")
    )
    # probes: per-table bucket plus 1-bit multiprobe flips, all JVM-side
    # bit math over the vectorized signatures
    variants = [F.col("__b")]
    if multiprobe_bits >= 1:
        variants += [F.col("__b").bitwiseXOR(F.lit(1 << i)) for i in range(planes)]
    probes = (
        queries.select(
            F.col(query_id_col),
            F.col(vec_col).alias("__qvec"),
            F.posexplode(table_signatures_col(spark, F.col(vec_col), dim, planes, tables, seed)).alias(
                "__t", "__b"
            ),
        )
        .select(
            query_id_col, "__qvec", "__t", F.explode(F.array(*variants)).alias("__bv")
        )
        .select(
            query_id_col, "__qvec", F.concat_ws(":", F.col("__t"), F.col("__bv")).alias("bucket")
        )
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


def embedding_near_pairs(
    df: DataFrame,
    dim: int,
    threshold: float,
    planes: int = 8,
    tables: int = 16,
    multiprobe_bits: int = 1,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    broadcast_max_rows: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate PAIRS at scale: multi-table LSH
    bucket candidate generation + exact-cosine confirm — the packaged
    100-TB path for what q_d07's all-pairs baseline computes exactly.

    Candidate SET (identical in both execution paths below): all pairs
    (a < b) whose sign-bit signatures agree in some table up to Hamming
    distance ``multiprobe_bits`` (0 = exact bucket match only). Every
    emitted pair is confirmed with the EXACT cosine ≥ ``threshold`` —
    LSH only bounds which pairs are examined (recall knob: tables up,
    planes down, multiprobe on). Returns (id_a, id_b, cosine) with
    id_a < id_b, cosine rounded to 6. At 10^9 rows raise ``planes`` so
    2^planes tracks corpus size and bucket occupancy stays task-sized.

    Two physical paths, chosen by corpus size (guide-§8 shape: decide
    with small rows, move heavy bytes at most once):

    - **broadcast-confirm** (n ≤ ``broadcast_max_rows``, default 200k or
      $ARES_NEARPAIRS_BCAST_MAX): the id→vector matrix plus the bucket
      matrix (n·(dim+tables) doubles/longs — ~125 MB at 200k×64) ship as
      ONE Spark broadcast, and a ``spark.range(k)`` seed fans the
      (table, bucket) space over k tasks; candidate pairs are generated
      AND cosine-confirmed inside numpy per bucket, so neither the
      bucket entries nor the ~occupancy² intermediate pair set ever
      enter an exchange — only the few survivors do (the final
      (id_a, id_b) dedup). Replacing the old bucket self-join + 2
      vector re-joins + per-pair JVM aggregate fold with this cut d07b
      at 20k×64 (driver sf1.0 bench shape) from 280 s to ~1.4 s warm:
      the join emitted ~2×10^8 candidate rows through an exchange and
      folded 64-element lambdas per pair; the broadcast path does the
      same math as 4096 small matmuls and shuffles ~16k rows.
    - **join-confirm** (n above the cap): the prior shape — bucket
      equi-self-join moving (id, table, bucket) ints, pair dedup, then
      the vectors re-join by id and the JVM-side exact cosine. Scales
      past driver/executor broadcast memory; cost tracks bucket
      occupancy, so at that scale ``planes`` must grow with log2(n)
      (the knob above) to keep occupancy bounded.
    """
    import os

    if broadcast_max_rows is None:
        broadcast_max_rows = int(os.environ.get("ARES_NEARPAIRS_BCAST_MAX", "200000"))
    # ONE bounded scan decides the path AND feeds it: collect up to cap+1
    # (id, vector) rows — if the corpus fits, this is the broadcast matrix
    # itself, so the grouped path never scans the input again (the input is
    # a single-row-group file in the bench, so each scan is serial)
    probe = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v")
    ).limit(broadcast_max_rows + 1).toPandas()
    if len(probe) <= broadcast_max_rows:
        return _near_pairs_grouped(
            df, probe, dim, threshold, planes, tables, multiprobe_bits, seed, id_col
        )
    return _near_pairs_joined(
        df, dim, threshold, planes, tables, multiprobe_bits, seed, id_col, vec_col
    )


def _near_pairs_grouped(
    df: DataFrame,
    pdf_all: pd.DataFrame,
    dim: int,
    threshold: float,
    planes: int,
    tables: int,
    multiprobe_bits: int,
    seed: int,
    id_col: str,
) -> DataFrame:
    """Broadcast-confirm path of embedding_near_pairs (see its docstring).
    ``pdf_all`` is the already-collected (id, v) frame — the caller's
    path-probe collect doubles as the broadcast matrix, so this path runs
    exactly ONE scan of the input (which is serial on single-row-group
    files).

    Shape (guide §3.1/§8: a broadcast replaces the shuffle outright):
    signatures are the same numpy matmul as ``table_signatures_col`` but
    computed driver-side on the collected matrix; (ids, vectors, norms,
    bucket matrix) ship as ONE broadcast, and a ``spark.range(k)`` seed
    fans the (table, bucket) space out over k tasks — task p owns the
    buckets with ``(t·2^planes + bucket) % k == p``. Each task generates
    its buckets' candidate pairs and confirms them in numpy; only the
    few cosine-≥-threshold survivors ever enter an exchange (the final
    (id_a, id_b) dedup). Nothing else is shuffled: no bucket self-join,
    no candidate-pair exchange, no per-group Arrow round-trip (an
    applyInPandas over the 4096 (table, bucket) groups was measured at
    ~6 s of pure per-group framework overhead — the whole point of
    slicing by bucket RANGE instead of grouping by bucket VALUE).

    Candidate set per bucket (t, v): exact members E(v) × E(v), plus
    probes×E — a Hamming-1 pair is covered exactly once per table
    because probes flip only 0-bits ("probe up"): the lower-bucket
    member probes into the higher bucket, where its partner sits as
    exact. Same symmetric Hamming≤1 candidate set as probing both
    directions, half the work. The emitted cosine is the deterministic
    per-pair element-product sum (independent of task slicing, so
    cross-table duplicates carry bit-identical values and the final
    dropDuplicates is order-safe); the cheap prefilter uses one BLAS
    matmul per bucket with an epsilon slack, and the exact recompute
    decides the threshold."""
    import numpy as np

    spark = df.sparkSession
    id_dtype = df.schema[id_col].dataType.simpleString()
    out_schema = f"id_a {id_dtype}, id_b {id_dtype}, cosine double"
    if len(pdf_all) == 0:
        return spark.createDataFrame([], out_schema)
    raw_ids = pdf_all["id"].to_numpy()
    ids_sorted = np.sort(raw_ids)
    order = np.argsort(raw_ids, kind="stable")
    V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf_all["v"]])[order]

    # signatures, driver-side: bit i of table t = sign(v · plane(seed+1000t, i))
    # — the identical matmul + bit-packing as table_signatures_col
    P = np.asarray(
        [row for t in range(tables) for row in _hyperplanes(dim, planes, seed + 1000 * t)],
        dtype=np.float64,
    )
    bits = (V @ P.T) > 0
    bits = bits.reshape(len(V), tables, planes)
    weights = np.left_shift(np.int64(1), np.arange(planes, dtype=np.int64))
    buckets = (bits * weights).sum(axis=2, dtype=np.int64)  # (n, tables)

    # broadcast only (ids, V, buckets): norms and the normalized matrix
    # re-derive per task in O(n*dim) — ~half the broadcast bytes, and each
    # of the k workers unpickles that much less
    bc = spark.sparkContext.broadcast((ids_sorted, V, buckets))
    thr = float(threshold)
    k = spark.sparkContext.defaultParallelism
    n_tables, n_planes, probe_on = tables, planes, multiprobe_bits >= 1

    def gen(batches):
        sids, Vb, B = bc.value
        nb = np.sqrt((Vb * Vb).sum(axis=1))
        Vnb = Vb / np.maximum(nb, 1e-300)[:, None]
        srt = [np.argsort(B[:, t], kind="stable") for t in range(n_tables)]
        sb = [B[srt[t], t] for t in range(n_tables)]

        def members(t, v):
            lo = np.searchsorted(sb[t], v, "left")
            hi = np.searchsorted(sb[t], v, "right")
            return srt[t][lo:hi]

        for pdf in batches:
            outs = []
            for part in pdf["id"].tolist():
                for t in range(n_tables):
                    for v in np.unique(sb[t]):
                        if int(t << n_planes | int(v)) % k != part:
                            continue
                        E = members(t, v)
                        A = E
                        if probe_on:
                            vv = int(v)
                            probes = [members(t, vv ^ (1 << i))
                                      for i in range(n_planes) if vv & (1 << i)]
                            if probes:
                                A = np.concatenate([E] + probes)
                        if E.size == 0 or A.size < 2:
                            continue
                        S = Vnb[A] @ Vnb[E].T
                        mask = (S >= thr - 1e-9) & (A[:, None] != E[None, :])
                        ra, rb = np.nonzero(mask)
                        if ra.size == 0:
                            continue
                        pa, pb = sids[A[ra]], sids[E[rb]]
                        lo_, hi_ = np.minimum(pa, pb), np.maximum(pa, pb)
                        uniq = np.unique(np.stack([lo_, hi_], axis=1), axis=0)
                        ilo = np.searchsorted(sids, uniq[:, 0])
                        ihi = np.searchsorted(sids, uniq[:, 1])
                        # deterministic exact confirm: fixed-length (dim)
                        # row-product sum, independent of task slicing —
                        # this value decides the threshold
                        dot = (Vb[ilo] * Vb[ihi]).sum(axis=1)
                        cos = dot / (nb[ilo] * nb[ihi])
                        keep = cos >= thr
                        if keep.any():
                            outs.append(pd.DataFrame({
                                "id_a": uniq[keep, 0], "id_b": uniq[keep, 1],
                                "cosine": cos[keep]}))
            if outs:
                yield pd.concat(outs, ignore_index=True)

    seeds = spark.range(0, k, 1, numPartitions=k)
    out = seeds.mapInPandas(gen, out_schema)
    return (
        out.dropDuplicates(["id_a", "id_b"])
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
    )


def _near_pairs_joined(
    df: DataFrame,
    dim: int,
    threshold: float,
    planes: int,
    tables: int,
    multiprobe_bits: int,
    seed: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Join-confirm path of embedding_near_pairs (corpus too big to
    broadcast): bucket equi-self-join moving (id, table, bucket) ints
    only — the embedding vectors must NOT ride the explode (tables ×
    (planes+1) copies of a dim-float array through the exchange, a ~100×
    exchange-payload amplification). The vectors re-join AFTER the
    candidate pairs dedup, keyed by id; AQE broadcasts that side when it
    fits and hash-joins at scale, so the payload crosses the wire at most
    twice per surviving candidate instead of 144× per row."""
    spark = df.sparkSession
    sigs = table_signatures_col(spark, F.col(vec_col), dim, planes, tables, seed)
    b = df.select(
        F.col(id_col), F.posexplode(sigs).alias("__t", "__b")
    )
    left = b.select(F.col(id_col).alias("id_a"), "__t", "__b")
    if multiprobe_bits >= 1:
        variants = [F.col("__b")] + [
            F.col("__b").bitwiseXOR(F.lit(1 << i)) for i in range(planes)
        ]
        left = left.select(
            "id_a", "__t", F.explode(F.array(*variants)).alias("__b")
        )
    right = b.select(F.col(id_col).alias("id_b"), "__t", "__b")
    cand = (
        left.join(right, ["__t", "__b"])  # equi-join on bucket — never a cross
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    vecs = df.select(F.col(id_col), F.col(vec_col))
    cand = (
        cand.join(vecs.select(F.col(id_col).alias("id_a"),
                              F.col(vec_col).alias("__ea")), "id_a")
        .join(vecs.select(F.col(id_col).alias("id_b"),
                          F.col(vec_col).alias("__eb")), "id_b")
    )
    return (
        cand.withColumn("cosine", cosine(F.col("__ea"), F.col("__eb")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
    )


# ---- IVF (inverted-file) ANN — the other scale path the brief names ----------


def kmeans_centroids(
    corpus: DataFrame,
    dim: int,
    n_centroids: int = 16,
    sample: int = 4096,
    iters: int = 10,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Coarse quantizer fit: Lloyd's k-means on a BOUNDED deterministic
    sample (lowest ``sample`` ids — reproducible regardless of
    partitioning), driver-side numpy. At 10^9 vectors the sample cap
    keeps the fit O(sample·k·iters) and the driver holds k·dim floats;
    the full corpus never leaves the executors. Returns a (k, dim)
    numpy array of L2-normalized centroids (cosine assignment = argmax
    dot against normalized centroids)."""
    import numpy as np

    pts = np.stack([
        np.asarray(r[vec_col], dtype=np.float64)
        for r in corpus.select(id_col, vec_col).orderBy(id_col).limit(sample).collect()
    ])
    pts = pts / np.maximum(np.linalg.norm(pts, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    cents = pts[rng.choice(len(pts), size=min(n_centroids, len(pts)), replace=False)]
    for _ in range(iters):
        sims = pts @ cents.T
        assign = sims.argmax(axis=1)
        for c in range(len(cents)):
            members = pts[assign == c]
            if len(members):
                v = members.mean(axis=0)
                cents[c] = v / max(np.linalg.norm(v), 1e-12)
    return cents


def _centroid_assign_col(spark, vec_col, centroids, top: int = 1):
    """array<int> of the ``top`` nearest centroid ids per vector — one
    numpy matmul per Arrow batch against the broadcast centroid matrix."""
    import numpy as np

    bc = spark.sparkContext.broadcast(np.asarray(centroids, dtype=np.float64))

    @pandas_udf("array<int>")
    def assign(vecs: pd.Series) -> pd.Series:
        import numpy as np

        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        C = bc.value
        V = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        V = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        sims = V @ C.T
        order = np.argsort(-sims, axis=1)[:, :top]
        return pd.Series([row.astype("int32").tolist() for row in order])

    return assign(vec_col)


def ivf_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    seed: int = 42,
    sample: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF ANN: k-means coarse quantizer → corpus bucketed by nearest
    centroid (the inverted file) → each query probes its ``nprobe``
    nearest centroids and exact-cosine re-ranks ONLY those lists.

    The other classic ANN scale shape next to LSH (lsh_ann_topk): cost
    per query ≈ nprobe/n_centroids of the corpus, tunable recall via
    nprobe. Centroids broadcast (k·dim floats); corpus assignment is one
    Arrow matmul pass; the candidate join keys on centroid id so the
    shuffle tracks list occupancy. Deterministic end to end (seeded fit
    on a bounded deterministic sample)."""
    from pyspark.sql import Window

    spark = corpus.sparkSession
    cents = kmeans_centroids(
        corpus, dim, n_centroids, sample, seed=seed, id_col=id_col, vec_col=vec_col
    )
    inv = corpus.select(
        F.col(id_col), F.col(vec_col),
        F.explode(_centroid_assign_col(spark, F.col(vec_col), cents, top=1)).alias("__c"),
    )
    probes = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("__qvec"),
        F.explode(
            _centroid_assign_col(spark, F.col(vec_col), cents, top=nprobe)
        ).alias("__c"),
    )
    cand = inv.join(F.broadcast(probes), "__c").dropDuplicates([query_id_col, id_col])
    scored = cand.withColumn("cosine", cosine(F.col(vec_col), F.col("__qvec")))
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, F.round("cosine", 6).alias("cosine"), "rank")
    )
