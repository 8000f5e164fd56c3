"""Deduplication operators for web-scale corpora.

Four families, each a composition of built-in DataFrame ops (no Python in
the row path), each with a DuckDB oracle in ``__spark_entry__``:

- exact:        hash-groupBy on md5(text)
- minhash LSH:  shingle → K minhashes → B bands → bucket join → candidate
                pairs → exact-Jaccard confirm
- ngram Jaccard: inverted shingle index join (only pairs sharing ≥1
                shingle are scored — never the O(n²) cross join)
- simhash:      64-bit sign-aggregated token hashes; Hamming-near buckets

Scale notes: every join key is a hash/bucket → uniform shuffle; candidate
generation is index-based so cost tracks true duplicate density, not n².
All hashes are md5/xxhash64 derived so results are identical across
cluster sizes and engines.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ares_spark.functions.text import shingles, tokens


def exact_duplicates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Groups of byte-identical texts: (text_hash, dup_count, member ids,
    keeper = min id). Only groups with >1 member."""
    return (
        df.select(F.md5(F.col(text_col)).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(
            F.count("*").alias("dup_count"),
            F.min(id_col).alias("keeper_id"),
            F.array_sort(F.collect_list(id_col)).alias("member_ids"),
        )
        .filter(F.col("dup_count") > 1)
    )


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the min-id row per identical text (deterministic winner)."""
    w = F.row_number().over(
        Window.partitionBy(F.md5(F.col(text_col))).orderBy(F.col(id_col))
    )
    return df.withColumn("__rn", w).filter(F.col("__rn") == 1).drop("__rn")


def _shingle_table(df: DataFrame, text_col: str, id_col: str, shingle_n: int) -> DataFrame:
    """(id, sh: array<string>) distinct shingles, PERSISTED — every caller
    consumes it at least twice (index build + exact confirm / both sides
    of a self-join), and shingling is the expensive part (measured ~4× the
    whole op when recomputed per consumer). Computed in one Arrow pass:
    the python shingler is the exact twin of the ``shingles`` expression
    (parity pinned in test_fingerprint_pandas_matches_expression) and
    evaluates ~8× faster than the nested-HOF expression tree; all
    consumers are set-based (min-hash, intersect/union sizes), so the
    sorted-set order is immaterial."""
    from pyspark import StorageLevel

    from ares_spark.functions.text import _py_shingles

    n = shingle_n

    @pandas_udf("array<string>")
    def sh_of(texts: pd.Series) -> pd.Series:
        return pd.Series([sorted(set(_py_shingles(t, n))) for t in texts])

    return df.select(
        F.col(id_col), sh_of(F.col(text_col)).alias("sh")
    ).persist(StorageLevel.MEMORY_AND_DISK)


def _minhash_sig_col(sh_col, num_hashes: int, hash_fn: str):
    def _minhash_k(k: int):
        # closure factory: default-arg lambdas change the lambda's arity and
        # make Spark pass the element index as the extra argument
        if hash_fn == "xx":
            return lambda s: F.xxhash64(F.lit(k), s)
        return lambda s: F.md5(F.concat(F.lit(f"{k}:"), s))

    return F.array(
        *[F.array_min(F.transform(sh_col, _minhash_k(k))) for k in range(num_hashes)]
    )


def minhash_signature(df: DataFrame, text_col: str, id_col: str, num_hashes: int = 16,
                      shingle_n: int = 3, hash_fn: str = "md5") -> DataFrame:
    """(id, sig) — sig[k] = min over shingles of hash(k, shingle).

    hash_fn='md5' (strings) is DuckDB-reproducible — the oracle path.
    hash_fn='xx' (xxhash64 longs) is the SCALE default: one 64-bit JVM
    hash instead of a 128-bit digest + string materialization per
    (shingle, k); not SQL-expressible, so it carries a rows-only driver
    check (d06)."""
    sh = F.array_distinct(shingles(text_col, shingle_n))
    return df.select(
        F.col(id_col), _minhash_sig_col(sh, num_hashes, hash_fn).alias("sig")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.5,
    hash_fn: str = "md5",
) -> DataFrame:
    """Near-duplicate pairs via MinHash LSH + exact-Jaccard confirmation.

    bands of rows=num_hashes/bands; a pair is a candidate if any band's
    minhash slice matches; candidates confirmed with exact shingle Jaccard
    ≥ threshold. Returns (id_a, id_b, jaccard) with id_a < id_b.
    ``hash_fn`` picks the signature hash (see minhash_signature).
    """
    rows = num_hashes // bands
    if hash_fn == "md5":
        # fused shingle+signature+band Arrow pass: hashlib.md5 is
        # byte-identical to Spark/DuckDB md5, python min() over hex
        # strings == array_min (lexicographic), "|".join == concat_ws —
        # value-equality with the expression path pinned in
        # test_minhash_fused_band_pass_matches_expression. Replaces the
        # 16×array_min(transform(md5)) expression tree whose codegen
        # compile dominated the (tiny, 150-doc) d02 first call; the
        # xx path below keeps the JVM tree (pure-python xxh64 is far
        # slower per shingle than the JVM hash).
        import hashlib

        from pyspark import StorageLevel

        from ares_spark.functions.text import _py_shingles

        n_sh, n_h, n_b, n_r = shingle_n, num_hashes, bands, rows

        @pandas_udf("struct<sh:array<string>,bands:array<string>>")
        def sh_bands(texts: pd.Series) -> pd.DataFrame:
            out = []
            for t in texts:
                shs = sorted(set(_py_shingles(t, n_sh)))
                sig = [
                    min(hashlib.md5(f"{k}:{s}".encode()).hexdigest() for s in shs)
                    for k in range(n_h)
                ]
                bnd = [
                    hashlib.md5(
                        "|".join([str(b)] + sig[b * n_r:(b + 1) * n_r]).encode()
                    ).hexdigest()
                    for b in range(n_b)
                ]
                out.append({"sh": shs, "bands": bnd})
            return pd.DataFrame(out)

        base = df.select(
            F.col(id_col), sh_bands(F.col(text_col)).alias("__sb")
        ).select(
            id_col, F.col("__sb.sh").alias("sh"), F.col("__sb.bands").alias("bands")
        ).persist(StorageLevel.MEMORY_AND_DISK)
        sh = base.select(id_col, "sh")
        buckets = base.select(
            F.col(id_col), F.explode("bands").alias("bucket")
        ).dropDuplicates([id_col, "bucket"])
    else:
        sh = _shingle_table(df, text_col, id_col, shingle_n)
        sigs = sh.select(
            F.col(id_col), _minhash_sig_col(F.col("sh"), num_hashes, hash_fn).alias("sig")
        )
        band_cols = [
            F.xxhash64(F.lit(b), *[F.col("sig")[b * rows + r] for r in range(rows)])
            for b in range(bands)
        ]
        buckets = sigs.select(
            F.col(id_col), F.explode(F.array(*band_cols)).alias("bucket")
        ).dropDuplicates([id_col, "bucket"])
    cand = (
        buckets.alias("a")
        .join(buckets.alias("b"), "bucket")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.join(sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a")), "id_a")
        .join(sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int | None = 1000,
) -> DataFrame:
    """Exact n-gram Jaccard near-dups via inverted shingle index.

    Pairs are generated ONLY for docs sharing ≥1 shingle (explode + self
    join on shingle), then scored exactly. Returns (id_a, id_b, jaccard).

    ``max_doc_freq`` caps the inverted index: a shingle present in more
    than that many docs is dropped BEFORE the self-join — a stop-shingle
    in n docs would otherwise emit O(n²) candidate pairs for that one key
    (the self-join's skew bomb at corpus scale). Recall contract: a true
    duplicate pair is missed only if EVERY shingle it shares is above the
    cap — impossible when the cap exceeds real duplicate-group sizes,
    which is how the default is chosen; set None for the exact
    (oracle-equivalent) behavior.
    """
    sh = _shingle_table(df, text_col, id_col, shingle_n)
    inv = sh.select(F.col(id_col), F.col("sh"), F.explode("sh").alias("shingle"))
    if max_doc_freq is not None:
        rare = (
            inv.groupBy("shingle")
            .agg(F.count("*").alias("__df"))
            .filter(F.col("__df") <= max_doc_freq)
            .select("shingle")
        )
        inv = inv.join(rare, "shingle")
    cand = (
        inv.alias("a")
        .join(inv.alias("b"), "shingle")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.join(sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a")), "id_a")
        .join(sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b")) / F.size(F.array_union("sh_a", "sh_b")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def simhash64_expr(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Expression-tree SimHash (xxhash64 bit votes via 64 aggregate folds).
    Kept as the built-ins reference — the 64 per-element lambda folds make
    it ~10× slower per row than the Arrow pass below."""
    toks = F.array_distinct(F.transform(tokens(text_col), lambda t: F.lower(t)))
    hashes = F.transform(toks, lambda t: F.xxhash64(t))

    def _vote(b: int):
        # closure factory (see _minhash_k): keep the aggregate merge lambda
        # at arity 2 or Spark rejects/misbinds it
        return lambda acc, h: acc + F.when(
            F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    bit_votes = [
        F.aggregate(hashes, F.lit(0).cast("long"), _vote(b)) for b in range(64)
    ]
    sim = None
    for b, vote in enumerate(bit_votes):
        bit = F.when(vote > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, b)
        sim = term if sim is None else sim.bitwiseXOR(term)  # disjoint bits: XOR == OR
    return df.select(F.col(id_col), sim.alias("simhash"))


def simhash64(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash over distinct lowercased whitespace tokens: for each
    of 64 bit positions, sum +1/-1 votes across token hashes; bit set if
    the sum is positive.

    One Arrow pass: blake2b-64 per token (deterministic, library-free),
    numpy for the 64-lane vote matrix. Hamming-pair SEMANTICS are
    identical to the expression version (same vote rule, different token
    hash family); values are rows-only checked by the driver (d04) and
    pinned in pytest on the fixture corpus."""
    import hashlib

    @pandas_udf("long")
    def sim_of(texts: pd.Series) -> pd.Series:
        import numpy as np

        from ares_spark.functions.text import _py_tokens

        shifts = np.arange(64, dtype=np.uint64)
        out = []
        for t in texts:
            toks = {w.lower() for w in _py_tokens(t)}
            if not toks:
                out.append(0)
                continue
            hs = np.fromiter(
                (int.from_bytes(hashlib.blake2b(w.encode(), digest_size=8).digest(), "big")
                 for w in toks),
                dtype=np.uint64, count=len(toks),
            )
            bits = ((hs[:, None] >> shifts) & np.uint64(1)).astype(np.int32)
            votes = (2 * bits - 1).sum(axis=0)
            val = int(((votes > 0).astype(np.uint64) << shifts).sum())
            out.append(val - (1 << 64) if val >= (1 << 63) else val)
        return pd.Series(out, dtype="int64")

    return df.select(F.col(id_col), sim_of(F.col(text_col)).alias("simhash"))


def simhash_near_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs with Hamming distance ≤ max_hamming between SimHashes.

    Candidate generation: split the 64-bit hash into (max_hamming+1)
    16-bit blocks — any pair within the distance must agree on ≥1 block
    (pigeonhole) — then confirm with bit_count(xor)."""
    sims = simhash64(df, text_col, id_col)
    nblocks = max_hamming + 1
    width = 64 // nblocks
    blocks = sims.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(
            F.array(
                *[
                    F.concat_ws(
                        ":",
                        F.lit(str(i)),
                        (F.shiftright("simhash", i * width).bitwiseAND(F.lit((1 << width) - 1))).cast("string"),
                    )
                    for i in range(nblocks)
                ]
            )
        ).alias("block"),
    )
    pairs = (
        blocks.alias("a")
        .join(blocks.alias("b"), "block")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.simhash").alias("sim_a"),
            F.col("b.simhash").alias("sim_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        pairs.withColumn("hamming", F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def line_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_line_dups: int = 1,
) -> DataFrame:
    """Cross-document line-level dedup (the CCNet/RefinedWeb boilerplate
    pass): a trimmed non-empty line is kept only while its corpus-wide
    occurrence count is ≤ ``max_line_dups`` — nav bars, cookie banners
    and footers repeated across a site vanish, unique prose stays.

    Returns (id, clean_text, n_kept, n_dropped). Shuffle inventory at
    corpus scale: one explode (O(lines)), one partial-aggregated groupBy
    on xxhash64(line) (hot boilerplate lines combine map-side, so no
    skew bomb), then a join against ONLY the over-the-cap line set —
    bounded by total_lines / max_line_dups, so AQE broadcasts it on
    typical corpora and the hot-line join skew never materializes (AQE
    skew-join is the backstop when it does) — and one per-doc window to
    reassemble. Nothing driver-side.
    """
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("line_no", "line"),
    ).withColumn("tline", F.trim("line"))
    lines = lines.withColumn("lhash", F.xxhash64("tline"))
    frequent = (
        lines.filter(F.col("tline") != "")
        .groupBy("lhash")
        .agg(F.count("*").alias("n_occ"))
        .filter(F.col("n_occ") > max_line_dups)
        .select("lhash")
        .withColumn("__freq", F.lit(True))
    )
    kept = (
        lines.join(frequent, "lhash", "left")
        .withColumn(
            "keep",
            (F.col("tline") == "") | F.col("__freq").isNull(),
        )
    )
    return (
        kept.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(F.col("keep"), F.struct("line_no", "line"))
                        )
                    ),
                    lambda s: s["line"],
                ),
                "\n",
            ).alias("clean_text"),
            F.sum(F.col("keep").cast("int")).alias("n_kept"),
            F.sum((~F.col("keep")).cast("int")).alias("n_dropped"),
        )
    )


def contamination_flags(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    ngram_n: int = 8,
) -> DataFrame:
    """Benchmark-contamination check (the pre-training hygiene pass): a
    document is contaminated if it shares ANY word ``ngram_n``-gram with
    the benchmark corpus. Returns (id, n_hits, contaminated).

    Scale shape: the benchmark is small by definition — its distinct
    n-grams broadcast; documents stream through an explode + broadcast
    semi-join + partial-aggregated count. Never a doc×bench cartesian,
    never a driver collect of doc data."""
    from ares_spark.functions.text import shingles

    bench = (
        benchmark.select(F.explode(F.array_distinct(shingles(bench_text_col, ngram_n))).alias("g"))
        .distinct()
    )
    doc_grams = docs.select(
        F.col(id_col), F.explode(F.array_distinct(shingles(text_col, ngram_n))).alias("g")
    )
    hits = (
        doc_grams.join(F.broadcast(bench), "g")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hits"))
    )
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .withColumn("n_hits", F.coalesce("n_hits", F.lit(0)))
        .withColumn("contaminated", F.col("n_hits") > 0)
    )
