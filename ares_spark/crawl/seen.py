"""URL-seen set: partitioned Bloom pre-filter + exact anti-join backstop,
with a cuckoo-filter fallback where deletions are needed (north_rule).

Reference semantics: INSERT … ON CONFLICT DO NOTHING on
(session_id, sha256(url)) — /root/reference/crates/ares-db/src/
job_repository.rs:364-380. The rebuild keys on ``xxhash64(canonical_url)``
per BASELINE.json north_rule and makes membership two-tier:

1. per-host-shard Bloom bitmaps (built distributed via groupBy shard +
   JVM-side aggregation into positions; probed vectorized) drop the vast
   majority of already-seen candidates WITHOUT shuffling them against the
   full seen table;
2. survivors go through an exact left-anti join — the correctness
   backstop, so Bloom false positives can only cause extra work on tier 2,
   never a wrong result. (A Bloom "maybe-seen" that is actually new is
   rescued by the exact join; a Bloom "definitely-new" skips the join.)

At 10^10 URLs the seen table is the biggest state; the Bloom tier turns
the per-generation anti-join from (candidates ⋈ 10^10 rows) into
(candidates ⋈ seen-partition-pruned) with bitmaps sized ~1.2 GB/10^9 keys
at 1% fpp, sharded by host so each executor holds only its shards.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# -- column helpers -----------------------------------------------------------


def url_hash_col(url_col="url"):
    """xxhash64 over the (already canonicalized) URL — the seen-set key."""
    c = F.col(url_col) if isinstance(url_col, str) else url_col
    return F.xxhash64(c)


def host_shard_col(host_col="host", n_shards: int = 64):
    c = F.col(host_col) if isinstance(host_col, str) else host_col
    return F.pmod(F.xxhash64(c), F.lit(n_shards)).cast("int")


# -- Bloom filter --------------------------------------------------------------


class BloomFilter:
    """Vectorized Bloom filter over int64 keys (numpy bitmap).

    k hash functions derived from the key by mixing with distinct odd
    multipliers (splitmix-style), so membership tests run as pure numpy
    array ops — no per-row Python when probing an Arrow batch.
    """

    _MIXERS = np.array(
        [0x9E3779B97F4A7C15, 0xBF58476D1CE4E5B9, 0x94D049BB133111EB, 0xD6E8FEB86659FD93,
         0xA5A5A5A5A5A5A5A5, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9, 0x27D4EB2F165667C5],
        dtype=np.uint64,
    )

    def __init__(self, n_bits: int, n_hashes: int, bits: np.ndarray | None = None):
        self.n_bits = int(n_bits)
        self.n_hashes = int(n_hashes)
        self.bits = bits if bits is not None else np.zeros((self.n_bits + 7) // 8, dtype=np.uint8)

    @classmethod
    def sized(cls, n_items: int, fpp: float = 0.01) -> "BloomFilter":
        n_items = max(n_items, 1)
        n_bits = max(64, int(-n_items * math.log(fpp) / (math.log(2) ** 2)))
        n_hashes = max(1, min(8, round(n_bits / n_items * math.log(2))))
        return cls(n_bits, n_hashes)

    def _positions(self, keys: np.ndarray) -> np.ndarray:
        k = keys.astype(np.uint64, copy=False)
        mix = self._MIXERS[: self.n_hashes]
        h = k[:, None] * mix[None, :]
        h ^= h >> np.uint64(31)
        return (h % np.uint64(self.n_bits)).astype(np.int64)

    def add(self, keys) -> None:
        pos = self._positions(np.asarray(keys, dtype=np.int64)).ravel()
        np.bitwise_or.at(self.bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))

    def might_contain(self, keys) -> np.ndarray:
        keys = np.asarray(keys, dtype=np.int64)
        if keys.size == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(keys)
        byte = self.bits[pos >> 3]
        return ((byte >> (pos & 7).astype(np.uint8)) & 1).all(axis=1)

    def to_bytes(self) -> bytes:
        head = np.array([self.n_bits, self.n_hashes], dtype=np.int64).tobytes()
        return head + self.bits.tobytes()

    @classmethod
    def from_bytes(cls, raw: bytes) -> "BloomFilter":
        n_bits, n_hashes = np.frombuffer(raw[:16], dtype=np.int64)
        return cls(int(n_bits), int(n_hashes), np.frombuffer(raw[16:], dtype=np.uint8).copy())


def build_shard_blooms(
    seen: DataFrame, hash_col: str = "url_hash", shard_col: str = "host_shard",
    fpp: float = 0.01,
) -> dict[int, bytes]:
    """Build one Bloom bitmap per host shard, distributed: keys are
    collected per shard partition via mapInPandas (Arrow batches), the
    bitmaps OR-merged on the driver. Returns {shard: serialized bloom}."""
    import pandas as pd

    counts = {r[shard_col]: r["n"] for r in
              seen.groupBy(shard_col).agg(F.count("*").alias("n")).collect()}

    def build(batches):
        acc: dict[int, BloomFilter] = {}
        sizes = counts
        for pdf in batches:
            for shard, grp in pdf.groupby(shard_col):
                bf = acc.get(shard)
                if bf is None:
                    bf = BloomFilter.sized(sizes.get(shard, 1024), fpp)
                    acc[shard] = bf
                bf.add(grp[hash_col].to_numpy())
        yield pd.DataFrame(
            {"shard": list(acc), "bloom": [b.to_bytes() for b in acc.values()]}
        )

    parts = (
        seen.select(shard_col, hash_col)
        .repartition(shard_col)
        .mapInPandas(build, schema="shard int, bloom binary")
        .collect()
    )
    merged: dict[int, BloomFilter] = {}
    for row in parts:
        bf = BloomFilter.from_bytes(bytes(row.bloom))
        if row.shard in merged:
            merged[row.shard].bits |= bf.bits
        else:
            merged[row.shard] = bf
    return {s: b.to_bytes() for s, b in merged.items()}


def bloom_maybe_seen_col(spark, blooms: dict[int, bytes], hash_col="url_hash",
                         shard_col="host_shard"):
    """Vectorized probe column: True = maybe seen (needs exact check),
    False = definitely new. Bitmaps ride to executors via broadcast."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    bc = spark.sparkContext.broadcast(blooms)

    # NOTE: no type hints — string annotations ('pd.Series') aren't
    # resolvable here because pandas is imported locally
    @pandas_udf("boolean")
    def probe(hashes, shards):
        local = {s: BloomFilter.from_bytes(raw) for s, raw in bc.value.items()}
        out = np.zeros(len(hashes), dtype=bool)
        h = hashes.to_numpy()
        sh = shards.to_numpy()
        for s in np.unique(sh):
            bf = local.get(int(s))
            if bf is None:
                continue  # no seen rows in this shard yet → all new
            m = sh == s
            out[m] = bf.might_contain(h[m])
        return pd.Series(out)

    return probe(F.col(hash_col), F.col(shard_col))


def filter_unseen(
    candidates: DataFrame,
    seen: DataFrame,
    spark=None,
    use_bloom: bool = True,
    bloom_min_seen: int = 10_000,
    hash_col: str = "url_hash",
    shard_col: str = "host_shard",
    seen_count: int | None = None,
) -> DataFrame:
    """candidates minus seen (A16): Bloom pre-filter when the seen set is
    big enough to pay for bitmap construction, exact anti-join always.
    Pass ``seen_count`` when known (the crawl loop tracks it) to avoid a
    sizing scan."""
    if use_bloom and spark is not None:
        approx_seen = (
            seen_count
            if seen_count is not None
            else seen.limit(bloom_min_seen + 1).count()
        )
        if approx_seen > bloom_min_seen:
            blooms = build_shard_blooms(seen, hash_col, shard_col)
            maybe = bloom_maybe_seen_col(spark, blooms, hash_col, shard_col)
            candidates = candidates.withColumn("__maybe_seen", maybe)
            new_fast = candidates.filter(~F.col("__maybe_seen")).drop("__maybe_seen")
            suspects = candidates.filter(F.col("__maybe_seen")).drop("__maybe_seen")
            rescued = suspects.join(seen.select(hash_col), hash_col, "left_anti")
            return new_fast.unionByName(rescued)
    return candidates.join(seen.select(hash_col), hash_col, "left_anti")


class ShardedBloomSet:
    """Maintained per-host-shard Bloom bitmaps with incremental updates
    and sidecar persistence (the north_rule's partitioned bloom-filter
    URL-seen set, kept across generations instead of rebuilt).

    - bitmaps are sized with headroom (capacity_per_shard); when a shard's
      inserted count approaches capacity the shard is marked for rebuild
      at the next maintenance window (fpp stays bounded)
    - update(new_seen) builds per-shard bitmaps over ONLY the new rows
      (distributed) and ORs them in — O(new) per generation
    - save/load round-trips through the snapshot store so resume
      continues incrementally
    """

    def __init__(self, capacity_per_shard: int = 1_000_000, fpp: float = 0.01):
        self.capacity = capacity_per_shard
        self.fpp = fpp
        self.blooms: dict[int, BloomFilter] = {}
        self.counts: dict[int, int] = {}

    def _ensure(self, shard: int) -> BloomFilter:
        bf = self.blooms.get(shard)
        if bf is None:
            bf = BloomFilter.sized(self.capacity, self.fpp)
            self.blooms[shard] = bf
            self.counts[shard] = 0
        return bf

    def update(self, new_seen: DataFrame, hash_col="url_hash", shard_col="host_shard") -> None:
        """OR-in bitmaps built over the new rows only (distributed build)."""
        deltas = build_shard_blooms_sized(
            new_seen, self.capacity, self.fpp, hash_col, shard_col
        )
        for shard, (raw, n) in deltas.items():
            bf = self._ensure(int(shard))
            delta = BloomFilter.from_bytes(raw)
            if delta.n_bits == bf.n_bits and delta.n_hashes == bf.n_hashes:
                bf.bits |= delta.bits
            else:
                # a size mismatch would silently create false NEGATIVES —
                # refuse loudly (capacity/fpp must not change mid-run)
                raise ValueError(
                    f"bloom sizing mismatch for shard {shard}: "
                    f"{delta.n_bits}x{delta.n_hashes} vs {bf.n_bits}x{bf.n_hashes}"
                )
            self.counts[int(shard)] = self.counts.get(int(shard), 0) + int(n)

    def overloaded_shards(self) -> list[int]:
        return [s for s, n in self.counts.items() if n > self.capacity]

    def as_bytes_dict(self) -> dict[int, bytes]:
        return {s: b.to_bytes() for s, b in self.blooms.items()}

    # -- persistence ---------------------------------------------------------

    def save(self, directory) -> None:
        import json as _json
        from pathlib import Path

        d = Path(directory)
        d.mkdir(parents=True, exist_ok=True)
        for shard, bf in self.blooms.items():
            (d / f"shard-{shard:04d}.bloom").write_bytes(bf.to_bytes())
        (d / "meta.json").write_text(
            _json.dumps({"capacity": self.capacity, "fpp": self.fpp, "counts": self.counts})
        )

    @classmethod
    def load(cls, directory) -> "ShardedBloomSet | None":
        import json as _json
        from pathlib import Path

        d = Path(directory)
        meta = d / "meta.json"
        if not meta.exists():
            return None
        m = _json.loads(meta.read_text())
        out = cls(m["capacity"], m["fpp"])
        out.counts = {int(k): v for k, v in m["counts"].items()}
        for p in d.glob("shard-*.bloom"):
            shard = int(p.stem.split("-")[1])
            out.blooms[shard] = BloomFilter.from_bytes(p.read_bytes())
        return out


def build_shard_blooms_sized(
    seen: DataFrame, capacity: int, fpp: float,
    hash_col: str = "url_hash", shard_col: str = "host_shard",
) -> dict[int, tuple[bytes, int]]:
    """Like build_shard_blooms but with FIXED sizing (so bitmaps from
    different generations are OR-compatible). Returns {shard: (bytes, n)}."""
    import pandas as pd

    def build(batches):
        acc: dict[int, BloomFilter] = {}
        counts: dict[int, int] = {}
        for pdf in batches:
            for shard, grp in pdf.groupby(shard_col):
                bf = acc.get(shard)
                if bf is None:
                    bf = BloomFilter.sized(capacity, fpp)
                    acc[shard] = bf
                    counts[shard] = 0
                bf.add(grp[hash_col].to_numpy())
                counts[shard] += len(grp)
        yield pd.DataFrame(
            {"shard": list(acc), "bloom": [b.to_bytes() for b in acc.values()],
             "n": [counts[s] for s in acc]}
        )

    parts = (
        seen.select(shard_col, hash_col)
        .repartition(shard_col)
        .mapInPandas(build, schema="shard int, bloom binary, n long")
        .collect()
    )
    merged: dict[int, tuple[BloomFilter, int]] = {}
    for row in parts:
        bf = BloomFilter.from_bytes(bytes(row.bloom))
        if row.shard in merged:
            merged[row.shard][0].bits |= bf.bits
            merged[row.shard] = (merged[row.shard][0], merged[row.shard][1] + int(row.n))
        else:
            merged[row.shard] = (bf, int(row.n))
    return {s: (b.to_bytes(), n) for s, (b, n) in merged.items()}


# process-wide sidecar bitmap memo, shared across tasks (and generations)
# inside a reused Python worker — guide §4.5: module-level state in an
# importable module survives task boundaries under spark.python.worker.reuse.
# Content-addressed by (mtime_ns, size): an atomic republish (tmp+rename)
# changes mtime, so a stale bitmap is never served; a miss re-reads disk.
# Before this memo every probing/RMW task re-read + re-deserialized every
# sidecar it touched each generation (~MBs per shard × tasks × generations —
# the "sidecar load amplification" named in the r5 scaling diagnosis).
_SIDECAR_MEMO: dict[str, tuple[tuple[int, int], "BloomFilter"]] = {}
_SIDECAR_MEMO_MAX = 256


def _load_sidecar(path) -> "BloomFilter | None":
    """Load a sidecar bitmap through the process-wide memo (None if the
    file does not exist; absence is never memoized — a later publish in
    the same worker must be visible)."""
    try:
        st = path.stat()
    except FileNotFoundError:
        return None
    key = (st.st_mtime_ns, st.st_size)
    hit = _SIDECAR_MEMO.get(str(path))
    if hit is not None and hit[0] == key:
        return hit[1]
    bf = BloomFilter.from_bytes(path.read_bytes())
    _memo_sidecar(path, bf)
    return bf


def _memo_sidecar(path, bf: "BloomFilter") -> None:
    try:
        st = path.stat()
    except FileNotFoundError:
        return
    if len(_SIDECAR_MEMO) >= _SIDECAR_MEMO_MAX:
        _SIDECAR_MEMO.clear()
    _SIDECAR_MEMO[str(path)] = ((st.st_mtime_ns, st.st_size), bf)


class BloomSidecarSet:
    """Partition-local sharded Bloom seen-set (SURVEY §4 item 1: puffin-
    style sidecars): one bitmap FILE per host shard, probed and updated
    inside the tasks that own the shard's rows. The driver never holds a
    bitmap and no whole-bitmap-set broadcast ever ships — at 10^10 keys
    the bitmaps total tens of GB, which a driver-held dict (the round-2
    design) could neither hold nor broadcast. Driver state is just
    {shard: count} — flat in shard count.

    File layout matches ShardedBloomSet.save (``shard-XXXX.bloom`` +
    ``meta.json``), so resume from an older checkpoint keeps working. In
    the sandbox the sidecar directory is a local path shared by the
    in-process executors; on a real cluster it is shared storage (DFS /
    object store — exactly how Iceberg puffin files are read), and each
    task reads only the shards present in its partition.

    - ``update(new_seen)``: distributed read-modify-write. Rows
      repartition by shard (each shard → exactly one task), the task
      loads that shard's sidecar, ORs the new keys in, republishes
      atomically (tmp + rename). Task retries are idempotent: every
      attempt reads the same rows and rename-over is last-write-wins of
      identical content. O(new keys) work + one bitmap IO per shard.
    - ``probe_col()``: vectorized maybe-seen column; each task lazily
      loads only the sidecars for shards in ITS rows (memoized per task).
      Repartition the probe input by (shard, salt) first so a task
      touches O(1) shards and a hot shard still spreads across tasks.
    """

    def __init__(self, directory, capacity_per_shard: int = 1_000_000,
                 fpp: float = 0.01, counts: dict[int, int] | None = None,
                 applied_gen: int | None = None):
        from pathlib import Path

        self.dir = Path(directory)
        self.capacity = capacity_per_shard
        self.fpp = fpp
        self.counts: dict[int, int] = dict(counts or {})
        # highest generation whose counts are already folded in — makes
        # re-running a crashed generation idempotent on the saturation
        # stats (the bitmap OR itself is naturally idempotent)
        self.applied_gen = applied_gen

    @classmethod
    def load(cls, directory) -> "BloomSidecarSet | None":
        import json as _json
        from pathlib import Path

        meta = Path(directory) / "meta.json"
        if not meta.exists():
            return None
        m = _json.loads(meta.read_text())
        return cls(directory, m["capacity"], m["fpp"],
                   {int(k): v for k, v in m["counts"].items()},
                   m.get("applied_gen"))

    def _write_meta(self) -> None:
        import json as _json

        self.dir.mkdir(parents=True, exist_ok=True)
        tmp = self.dir / "meta.json.tmp"
        tmp.write_text(_json.dumps(
            {"capacity": self.capacity, "fpp": self.fpp,
             "counts": self.counts, "applied_gen": self.applied_gen}
        ))
        tmp.rename(self.dir / "meta.json")

    def overloaded_shards(self) -> list[int]:
        return [s for s, n in self.counts.items() if n > self.capacity]

    def update(self, new_seen: DataFrame, hash_col="url_hash",
               shard_col="host_shard", generation: int | None = None) -> None:
        import os as _os

        import pandas as pd

        self.dir.mkdir(parents=True, exist_ok=True)
        directory, capacity, fpp = str(self.dir), self.capacity, self.fpp

        def rmw(batches):
            from pathlib import Path

            acc: dict[int, BloomFilter] = {}
            counts: dict[int, int] = {}
            ref = BloomFilter.sized(capacity, fpp)
            for pdf in batches:
                for shard, grp in pdf.groupby(shard_col):
                    shard = int(shard)
                    bf = acc.get(shard)
                    if bf is None:
                        p = Path(directory) / f"shard-{shard:04d}.bloom"
                        bf = _load_sidecar(p)
                        if bf is not None:
                            # the memo'd bitmap is shared read-only with
                            # probe tasks in this worker — RMW mutates, so
                            # work on a copy and re-memo after publish
                            bf = BloomFilter(bf.n_bits, bf.n_hashes,
                                             bf.bits.copy())
                        else:
                            bf = BloomFilter.sized(capacity, fpp)
                        if (bf.n_bits, bf.n_hashes) != (ref.n_bits, ref.n_hashes):
                            # silent false NEGATIVES otherwise — refuse loudly
                            # (capacity/fpp must not change mid-run)
                            raise ValueError(
                                f"bloom sizing mismatch for shard {shard}: "
                                f"{bf.n_bits}x{bf.n_hashes} vs {ref.n_bits}x{ref.n_hashes}"
                            )
                        acc[shard] = bf
                        counts[shard] = 0
                    bf.add(grp[hash_col].to_numpy())
                    # distinct keys, not raw rows — saturation stats track
                    # set growth, and duplicate rows must not inflate them
                    counts[shard] += int(grp[hash_col].nunique())
            for shard, bf in acc.items():
                p = Path(directory) / f"shard-{shard:04d}.bloom"
                tmp = p.with_name(p.name + f".tmp-{_os.getpid()}")
                tmp.write_bytes(bf.to_bytes())
                tmp.rename(p)  # atomic publish
                _memo_sidecar(p, bf)  # next probe/RMW in this worker skips the read
            yield pd.DataFrame({"shard": list(acc), "n": [counts[s] for s in acc]})

        rows = (
            new_seen.select(shard_col, hash_col)
            .repartition(shard_col)  # one task owns each shard's RMW
            .mapInPandas(rmw, schema="shard int, n long")
            .collect()  # bounded: one (shard, n) row per shard
        )
        if (generation is not None and self.applied_gen is not None
                and generation <= self.applied_gen):
            return  # re-run of a crashed-then-recovered generation:
            # bitmaps re-ORed (idempotent), counts already folded in
        for r in rows:
            self.counts[int(r.shard)] = self.counts.get(int(r.shard), 0) + int(r.n)
        if generation is not None:
            self.applied_gen = generation
        self._write_meta()

    def probe_col(self, hash_col="url_hash", shard_col="host_shard"):
        """True = maybe seen (needs the exact backstop), False = definitely
        new. A shard with no sidecar yet has no seen rows → all new. The
        closure carries only the directory PATH; bitmaps load task-side."""
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        directory, capacity, fpp = str(self.dir), self.capacity, self.fpp
        # per-TASK absence memo only; loaded bitmaps go through the
        # process-wide content-addressed _SIDECAR_MEMO (shared across the
        # tasks of a generation and across generations in a reused worker)
        cache: dict[int, BloomFilter | None] = {}

        @pandas_udf("boolean")
        def probe(hashes, shards):
            from pathlib import Path

            out = np.zeros(len(hashes), dtype=bool)
            h = hashes.to_numpy()
            sh = shards.to_numpy()
            for s in np.unique(sh):
                s = int(s)
                if s not in cache:
                    cache[s] = _load_sidecar(Path(directory) / f"shard-{s:04d}.bloom")
                bf = cache[s]
                if bf is None:
                    continue
                m = sh == s
                out[m] = bf.might_contain(h[m])
            return pd.Series(out)

        return probe(F.col(hash_col), F.col(shard_col))


# -- cuckoo fallback ------------------------------------------------------------


class CuckooFilter:
    """Small cuckoo filter (4-slot buckets, 16-bit fingerprints) — the
    deletion-capable fallback the north_rule asks for (e.g. evicting URLs
    scheduled for recrawl from the seen set). Driver/executor-local."""

    def __init__(self, capacity: int, max_kicks: int = 500):
        self.n_buckets = max(1, 1 << (capacity.bit_length()))
        self.table = np.zeros((self.n_buckets, 4), dtype=np.uint16)
        self.max_kicks = max_kicks
        self._rng_state = 0x9E3779B97F4A7C15

    _M64 = (1 << 64) - 1

    def _fp(self, key: int) -> int:
        fp = ((key & self._M64) * 0xBF58476D1CE4E5B9 & self._M64) >> 48
        return fp or 1  # 0 means empty slot

    def _idx(self, key: int) -> int:
        return (key & self._M64) % self.n_buckets

    def _alt(self, idx: int, fp: int) -> int:
        h = fp * 0x5BD1E9955BD1E995 & self._M64
        return (idx ^ h) % self.n_buckets

    def _insert_at(self, idx: int, fp: int) -> bool:
        row = self.table[idx]
        empty = np.nonzero(row == 0)[0]
        if empty.size:
            row[empty[0]] = fp
            return True
        return False

    def add(self, key: int) -> bool:
        fp = self._fp(key)
        i1 = self._idx(key)
        i2 = self._alt(i1, fp)
        if self._insert_at(i1, fp) or self._insert_at(i2, fp):
            return True
        idx = i1
        for _ in range(self.max_kicks):
            self._rng_state = (self._rng_state * 6364136223846793005 + 1) & self._M64
            slot = (self._rng_state >> 60) & 3
            fp, self.table[idx][slot] = int(self.table[idx][slot]), fp
            idx = self._alt(idx, fp)
            if self._insert_at(idx, fp):
                return True
        return False  # table full

    def contains(self, key: int) -> bool:
        fp = self._fp(key)
        i1 = self._idx(key)
        i2 = self._alt(i1, fp)
        return bool((self.table[i1] == fp).any() or (self.table[i2] == fp).any())

    def delete(self, key: int) -> bool:
        fp = self._fp(key)
        for idx in (self._idx(key), self._alt(self._idx(key), fp)):
            row = self.table[idx]
            hit = np.nonzero(row == fp)[0]
            if hit.size:
                row[hit[0]] = 0
                return True
        return False
