"""URL-seen membership: distributed Bloom filter + cuckoo fallback.

Replaces the reference's Redis TTL hash set (ttl_hash_set/ttl_hash_set.go:
57-189, keys ``prefix:md5(url)`` :202-204) with, per the north rule:

* identity  = ``xxhash64(canonicalize(url))`` — computed JVM-side
  (``F.xxhash64``), never in Python;
* a **Bloom pre-filter** over the enqueued seen set, probed by a vectorized
  pandas UDF, that cheaply drops the (vast at 10^10-URL scale) majority of
  already-seen outlink candidates BEFORE the exact anti-join — cutting the
  shuffle volume of the dedup join;
* a **cuckoo filter** fallback supporting deletion, needed because the
  ``Set(url, ReadyToEnqueue)`` reset on non-accepted content types
  (workflow.go:136) removes membership — bloom cannot unlearn;
* **exactness guaranteed by construction**: filters only PRE-filter.  Bloom
  false positives would wrongly drop frontier candidates, so every candidate
  surviving (or flagged by) the pre-filter is confirmed with an exact
  left-anti join against the seen table.  The filters are pure bandwidth
  optimizations; correctness never depends on them.

Scale design — the filter NEVER lives on the driver and no row data is ever
collected: it is a **segmented bloom table** ``(segment int, bits binary)``
stored in the catalog, segment = ``pmod(url_hash, n_segments)``.

* build/maintain: per-segment partial bitmaps via ``groupBy(segment).
  applyInPandas`` (``bloom_partials``), OR-merged against the stored rows
  (``bloom_or_merge``) and committed through the catalog's bucketed merge —
  maintenance I/O per batch is proportional to the delta's segments.
* probe: candidates are cogrouped with their segment's bitmap
  (``bloom_probe_join``) — the bitmap rides the shuffle once per segment,
  never by closure, never through the driver.
* at 10^10 URLs / 1% fpp the filter is ~12 GB total; with 1024 segments each
  bitmap row is ~12 MB — shuffle-safe.  Sandbox uses smaller segment counts.

The driver-resident ``BloomFilter`` class remains the per-partition/per-
segment compute kernel (and the unit-test surface); ``make_bloom_probe_udf``
(closure-ship) is kept only for single-process use.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType


def _positions(hashes: np.ndarray, k: int, n_bits: int) -> np.ndarray:
    """k probe positions per hash via splitmix64-style remixing (vectorized).

    Double hashing g_i = h1 + i*h2 over uint64, mod n_bits.
    """
    h = hashes.astype(np.uint64)
    z = (h + np.uint64(0x9E3779B97F4A7C15)) * np.uint64(0xBF58476D1CE4E5B9)
    z ^= z >> np.uint64(27)
    h2 = z * np.uint64(0x94D049BB133111EB) | np.uint64(1)
    idx = np.arange(k, dtype=np.uint64)[:, None]
    return ((h[None, :] + idx * h2[None, :]) % np.uint64(n_bits)).astype(np.int64)


class BloomFilter:
    def __init__(self, n_bits: int, k: int, bits: np.ndarray | None = None):
        self.n_bits = n_bits
        self.k = k
        self.bits = bits if bits is not None else np.zeros(n_bits // 8 + 1, dtype=np.uint8)

    @classmethod
    def sized_for(cls, n_items: int, fpp: float = 0.01) -> "BloomFilter":
        n_items = max(n_items, 1)
        n_bits = max(64, int(-n_items * math.log(fpp) / (math.log(2) ** 2)))
        k = max(1, round(n_bits / n_items * math.log(2)))
        return cls(n_bits, k)

    def add_many(self, hashes: np.ndarray) -> None:
        if len(hashes) == 0:
            return
        pos = _positions(np.asarray(hashes, dtype=np.int64), self.k, self.n_bits)
        np.bitwise_or.at(self.bits, pos.ravel() // 8, (1 << (pos.ravel() % 8)).astype(np.uint8))

    def contains_many(self, hashes: np.ndarray) -> np.ndarray:
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        pos = _positions(np.asarray(hashes, dtype=np.int64), self.k, self.n_bits)
        hit = (self.bits[pos // 8] >> (pos % 8)) & 1
        return hit.all(axis=0).astype(bool)

    def to_bytes(self) -> bytes:
        return self.bits.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes, n_bits: int, k: int) -> "BloomFilter":
        """Decode a stored bitmap; REJECTS a geometry mismatch.  A bitmap
        written under a different n_bits silently decoded with this one
        yields garbage membership bits — and a bloom false negative breaks
        the publish-dedup exactness invariant (the bloom-negative path skips
        the exact join).  Callers on the probe path catch this and fail safe
        to maybe_seen=True (the exact join then decides)."""
        expected = n_bits // 8 + 1
        if len(data) != expected:
            raise ValueError(
                f"bloom bitmap is {len(data)} bytes, geometry n_bits={n_bits} "
                f"expects {expected} — stale segment from an old build?"
            )
        return cls(n_bits, k, np.frombuffer(data, dtype=np.uint8).copy())


def build_bloom_distributed(
    df: DataFrame, hash_col: str, n_items_estimate: int, fpp: float = 0.01
) -> BloomFilter:
    """OR-reduce per-partition partial bitmaps (the distributed build path).

    Each partition builds a fixed-size partial via mapInPandas; the driver
    ORs them.  Collected data = n_partitions × bitmap size, never row data.
    """
    proto = BloomFilter.sized_for(n_items_estimate, fpp)
    n_bits, k = proto.n_bits, proto.k

    def partials(batches):
        bf = BloomFilter(n_bits, k)
        saw = False
        for pdf in batches:
            saw = True
            bf.add_many(pdf[hash_col].to_numpy(dtype=np.int64))
        if saw:
            yield pd.DataFrame({"bits": [bf.to_bytes()]})

    parts = df.select(hash_col).mapInPandas(partials, "bits binary").collect()
    out = BloomFilter(n_bits, k)
    for row in parts:
        out.bits |= np.frombuffer(row["bits"], dtype=np.uint8)
    return out


def make_bloom_probe_udf(bloom: BloomFilter):
    """Vectorized membership probe over an xxhash64 column.

    The bitmap travels to executors by closure (broadcast-equivalent for the
    py4j path; on a real cluster use ``spark.sparkContext.broadcast``)."""
    blob, n_bits, k = bloom.to_bytes(), bloom.n_bits, bloom.k

    @F.pandas_udf(BooleanType())
    def probe(hashes: pd.Series) -> pd.Series:
        bf = BloomFilter.from_bytes(blob, n_bits, k)
        return pd.Series(bf.contains_many(hashes.to_numpy(dtype=np.int64)))

    return probe


# -- segmented bloom (catalog-table form; nothing driver-resident) -----------

BLOOM_TABLE_SCHEMA = "segment int, bits binary"


def bloom_segment_col(hash_col: str, n_segments: int):
    return F.pmod(F.col(hash_col), F.lit(n_segments)).cast("int")


def bloom_partials(
    df: DataFrame, hash_col: str, n_segments: int, n_bits: int, k: int
) -> DataFrame:
    """(segment, bits) partial bitmaps from a hash column — one shuffle by
    segment, one fixed-size bitmap per segment, fully distributed."""

    def build(key, pdf: pd.DataFrame) -> pd.DataFrame:
        bf = BloomFilter(n_bits, k)
        bf.add_many(pdf[hash_col].to_numpy(dtype=np.int64))
        return pd.DataFrame({"segment": [key[0]], "bits": [bf.to_bytes()]})

    return (
        df.select(hash_col)
        .withColumn("segment", bloom_segment_col(hash_col, n_segments))
        .groupBy("segment")
        .applyInPandas(build, BLOOM_TABLE_SCHEMA)
    )


def bloom_or_merge(old: DataFrame, delta: DataFrame) -> DataFrame:
    """OR the delta's partial bitmaps into the stored rows (left join on
    segment; missing old row → delta wins).  Output covers exactly the
    delta's segments — the caller commits it as a bucketed merge."""
    from pyspark.sql.types import BinaryType

    o = old.select("segment", F.col("bits").alias("old_bits"))

    @F.pandas_udf(BinaryType())
    def or_bits(a: pd.Series, b: pd.Series) -> pd.Series:
        out = []
        for x, y in zip(a, b):
            if y is None:
                out.append(bytes(x))
            else:
                out.append(
                    np.bitwise_or(
                        np.frombuffer(x, dtype=np.uint8),
                        np.frombuffer(y, dtype=np.uint8),
                    ).tobytes()
                )
        return pd.Series(out)

    return delta.join(o, "segment", "left").select(
        "segment", or_bits("bits", "old_bits").alias("bits")
    )


def bloom_probe_join(
    cands: DataFrame,
    bloom: DataFrame,
    hash_col: str,
    n_segments: int,
    n_bits: int,
    k: int,
) -> DataFrame:
    """cands + ``maybe_seen`` via a cogrouped per-segment probe.

    Shuffle key = segment (uniform by hash); each group sees its candidate
    rows plus its ONE bitmap row — the bitmap never fans out per candidate
    row and never touches the driver.  A segment with no bitmap row has no
    members → certainly new."""
    c = cands.withColumn("segment", bloom_segment_col(hash_col, n_segments))
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in cands.schema.fields
    ) + ", maybe_seen boolean"

    def probe(key, cpdf: pd.DataFrame, bpdf: pd.DataFrame) -> pd.DataFrame:
        if len(bpdf):
            try:
                bf = BloomFilter.from_bytes(bytes(bpdf["bits"].iloc[0]), n_bits, k)
                hit = bf.contains_many(cpdf[hash_col].to_numpy(dtype=np.int64))
            except ValueError:
                # geometry mismatch (stale segment): fail SAFE — flag every
                # candidate maybe_seen so the exact anti-join decides; a
                # false negative here would skip the join and re-enqueue
                hit = np.ones(len(cpdf), dtype=bool)
        else:
            hit = np.zeros(len(cpdf), dtype=bool)
        cpdf = cpdf.drop(columns=["segment"]).copy()
        cpdf["maybe_seen"] = hit
        return cpdf

    return (
        c.groupBy("segment")
        .cogroup(bloom.groupBy("segment"))
        .applyInPandas(probe, out_schema)
    )


def bloom_sizing(n_items: int, fpp: float = 0.01) -> tuple[int, int]:
    """(n_bits, k) for a capacity — shared by build and probe sides."""
    bf = BloomFilter.sized_for(max(n_items, 1), fpp)
    return bf.n_bits, bf.k


class CuckooFilter:
    """Minimal cuckoo filter (4-slot buckets, 16-bit fingerprints) with
    delete — the fallback for the ``Set(url, ReadyToEnqueue)`` reset path
    (workflow.go:136) where membership must be removable.

    numpy-backed; deterministic eviction (seeded per-filter RNG).
    """

    MAX_KICKS = 500

    def __init__(self, n_buckets: int):
        self.n_buckets = int(2 ** math.ceil(math.log2(max(n_buckets, 2))))
        self.table = np.zeros((self.n_buckets, 4), dtype=np.uint16)  # 0 = empty
        self._rng = np.random.default_rng(42)

    @staticmethod
    def _fingerprint(h: np.ndarray) -> np.ndarray:
        fp = ((h >> np.uint64(48)) & np.uint64(0xFFFF)).astype(np.uint16)
        return np.where(fp == 0, np.uint16(1), fp)

    def _i1(self, h: np.ndarray) -> np.ndarray:
        return (h & np.uint64(self.n_buckets - 1)).astype(np.int64)

    def _i2(self, i1: np.ndarray, fp: np.ndarray) -> np.ndarray:
        mix = fp.astype(np.uint64) * np.uint64(0x5BD1E995)
        return ((i1.astype(np.uint64) ^ mix) & np.uint64(self.n_buckets - 1)).astype(np.int64)

    def add(self, h: int) -> bool:
        h = np.uint64(np.int64(h).astype(np.uint64))
        fp = int(self._fingerprint(np.array([h]))[0])
        i1 = int(self._i1(np.array([h]))[0])
        i2 = int(self._i2(np.array([i1]), np.array([fp], dtype=np.uint16))[0])
        for i in (i1, i2):
            empty = np.where(self.table[i] == 0)[0]
            if len(empty):
                self.table[i, empty[0]] = fp
                return True
        i = i1
        for _ in range(self.MAX_KICKS):
            slot = int(self._rng.integers(0, 4))
            fp, self.table[i, slot] = int(self.table[i, slot]), fp
            i = int(self._i2(np.array([i]), np.array([fp], dtype=np.uint16))[0])
            empty = np.where(self.table[i] == 0)[0]
            if len(empty):
                self.table[i, empty[0]] = fp
                return True
        return False  # full — caller must resize/rebuild

    def _locate(self, h: int):
        hu = np.uint64(np.int64(h).astype(np.uint64))
        fp = int(self._fingerprint(np.array([hu]))[0])
        i1 = int(self._i1(np.array([hu]))[0])
        i2 = int(self._i2(np.array([i1]), np.array([fp], dtype=np.uint16))[0])
        return fp, i1, i2

    def contains(self, h: int) -> bool:
        fp, i1, i2 = self._locate(h)
        return bool((self.table[i1] == fp).any() or (self.table[i2] == fp).any())

    def delete(self, h: int) -> bool:
        fp, i1, i2 = self._locate(h)
        for i in (i1, i2):
            slots = np.where(self.table[i] == fp)[0]
            if len(slots):
                self.table[i, slots[0]] = 0
                return True
        return False

    def contains_many(self, hashes: np.ndarray) -> np.ndarray:
        return np.fromiter(
            (self.contains(int(h)) for h in hashes), dtype=bool, count=len(hashes)
        )


def seen_merge(seen: DataFrame, delta: DataFrame) -> DataFrame:
    """MERGE INTO seen: delta rows win on url_canon (the batch analogue of
    SETEX/INCR upserts, ttl_hash_set.go:57-95).  Both sides keyed by
    (url_hash, url_canon); the anti-join side is the big table, the delta is
    one batch — broadcast it."""
    return seen.join(
        F.broadcast(delta.select("url_canon").distinct()), "url_canon", "left_anti"
    ).unionByName(delta)


def seen_ttl(
    seen: DataFrame, keys: DataFrame, batch_id: int, ttl_batches: int | None
) -> DataFrame:
    """Per-key remaining TTL with Redis sign semantics (TTLForKey,
    ttl_hash_set.go:177-189; sign cases ttl_hash_set_test.go:156-175):

    * present with expiry  → remaining batches (≥ 0 while alive; a key whose
      window elapsed reads as absent → -2, matching the expire-at-read model)
    * present, no TTL configured → -1
    * absent               → -2

    ``keys`` is a DataFrame with a ``url_canon`` column (the introspection
    batch); the lookup is one left join."""
    lkp = seen.select("url_canon", "updated_batch")
    joined = keys.select("url_canon").join(lkp, "url_canon", "left")
    if ttl_batches is None:
        ttl = F.when(F.col("updated_batch").isNotNull(), F.lit(-1)).otherwise(
            F.lit(-2)
        )
    else:
        remaining = F.col("updated_batch") + F.lit(ttl_batches) - F.lit(batch_id)
        ttl = (
            F.when(F.col("updated_batch").isNull(), F.lit(-2))
            .when(remaining < 0, F.lit(-2))  # elapsed ≡ gone (expire-at-read)
            .otherwise(remaining)
        )
    return joined.select("url_canon", ttl.cast("long").alias("ttl_batches"))


def expire_seen(seen: DataFrame, batch_id: int, ttl_batches: int | None) -> DataFrame:
    """Generation expiry: every write refreshed updated_batch (as every Redis
    write refreshed the TTL, ttl_hash_set.go:64-65,87); rows older than the
    TTL window drop out at batch start."""
    if ttl_batches is None:
        return seen
    return seen.where(F.col("updated_batch") >= F.lit(batch_id - ttl_batches))
