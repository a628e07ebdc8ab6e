"""URL-seen set: partitioned Bloom prefilter + exact anti-join.

The reference's only seen-set-shaped structure is the in-memory TTL cache
(/root/reference/internal/cache/in_memory.go:9-109), which is not wired into
the crawl loop — the live loop refetches duplicates
(cmd/transmitter/main.go:179-187 enqueues the same URL 11x). The north rule
makes dedup a first-class engine feature: canonicalized URL -> xxhash64,
an exact membership table, and an approximate Bloom prefilter whose
per-partition bitmaps are merged via ``treeAggregate``.

Design for 10^10 URLs:
* the exact set is an append-only snapshot table keyed (url_hash, url) —
  membership is a ``left_anti`` join (hash-partitioned shuffle, AQE-skew
  aware); joining on both columns makes 64-bit collisions harmless.
* the Bloom bitmap is built distributed (one numpy bitmap per partition,
  OR-merged tree-wise — at 1000 executors the tree depth keeps driver
  traffic logarithmic) and broadcast back; candidates that are
  *definitely new* (bloom miss) bypass the anti-join shuffle entirely.
  With a mostly-new frontier that removes the dominant shuffle; with a
  mostly-duplicate frontier the exact join only sees the maybe-seen slice.
* no false negatives by construction, so exactness is preserved (bloom is
  a prefilter only — SURVEY.md §7 hard part (c)).
* TTL semantics (in_memory.go:51-61) map to ``seen_round >= r - ttl``
  filters on the exact table; recrawl policies plug in there.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_M1 = np.uint64(0xBF58476D1CE4E5B9)
_M2 = np.uint64(0x94D049BB133111EB)


def _mix(h: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """splitmix64-style double hashing: two independent 64-bit streams."""
    x = h.astype(np.uint64)
    x ^= x >> np.uint64(30)
    x *= _M1
    x ^= x >> np.uint64(27)
    h1 = x * _M2
    h2 = (x ^ (x >> np.uint64(31))) * _M1 | np.uint64(1)
    return h1, h2


class BloomFilter:
    """Fixed-size Bloom over int64 keys; numpy bitmap, vectorized ops only."""

    def __init__(self, n_bits: int = 1 << 23, n_hashes: int = 5):
        assert n_bits & (n_bits - 1) == 0, "n_bits must be a power of two"
        self.n_bits = n_bits
        self.n_hashes = n_hashes
        self.bits = np.zeros(n_bits // 64, dtype=np.uint64)

    def _positions(self, keys: np.ndarray) -> np.ndarray:
        h1, h2 = _mix(keys)
        idx = np.arange(self.n_hashes, dtype=np.uint64)[:, None]
        return (h1[None, :] + idx * h2[None, :]) & np.uint64(self.n_bits - 1)

    def add(self, keys: np.ndarray) -> None:
        if len(keys) == 0:
            return
        pos = self._positions(np.asarray(keys))
        word = (pos >> np.uint64(6)).ravel()
        bit = np.uint64(1) << (pos & np.uint64(63)).ravel()
        np.bitwise_or.at(self.bits, word, bit)

    def contains(self, keys: np.ndarray) -> np.ndarray:
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(np.asarray(keys))
        word = pos >> np.uint64(6)
        bit = np.uint64(1) << (pos & np.uint64(63))
        hits = (self.bits[word] & bit) != 0
        return hits.all(axis=0)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        assert self.n_bits == other.n_bits and self.n_hashes == other.n_hashes
        self.bits |= other.bits
        return self


def build_bloom_distributed(
    df: DataFrame, key_col: str, n_bits: int = 1 << 23, n_hashes: int = 5
) -> BloomFilter:
    """Per-partition bitmaps OR-merged via ``treeAggregate`` (north rule).
    Each partition's work is one vectorized numpy pass over its keys."""
    n_parts = max(1, df.rdd.getNumPartitions())
    depth = 2 if n_parts <= 64 else 3

    def seq_op(bits: np.ndarray, rows) -> np.ndarray:
        bf = BloomFilter(n_bits, n_hashes)
        bf.bits = bits
        keys = np.fromiter((r[0] for r in rows), dtype=np.int64)
        bf.add(keys)
        return bf.bits

    def comb_op(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        return a | b

    zero = np.zeros(n_bits // 64, dtype=np.uint64)
    # mapPartitions first so seq_op sees whole partitions (vectorized),
    # then treeAggregate merges the (tiny) bitmaps logarithmically.
    bitmaps = df.select(key_col).rdd.mapPartitions(
        lambda it: [seq_op(zero.copy(), it)]
    )
    merged = bitmaps.treeAggregate(zero, comb_op, comb_op, depth=depth)
    bf = BloomFilter(n_bits, n_hashes)
    bf.bits = merged
    return bf


def bloom_contains_col(spark, bloom: BloomFilter, key: Column) -> Column:
    """Broadcast the bitmap once; membership test is a vectorized pandas UDF
    over the int64 key column."""
    bc = spark.sparkContext.broadcast(
        (bloom.bits, bloom.n_bits, bloom.n_hashes)
    )

    @F.pandas_udf("boolean")
    def _contains(keys: pd.Series) -> pd.Series:
        bits, n_bits, n_hashes = bc.value
        bf = BloomFilter(n_bits, n_hashes)
        bf.bits = bits
        return pd.Series(bf.contains(keys.to_numpy(dtype=np.int64)))

    return _contains(key)


class SeenSet:
    """Exact membership (snapshot table) + incremental Bloom prefilter.

    ``filter_new(candidates)`` returns candidates not present in the set:
    bloom-miss rows pass through without touching the join; bloom-hit rows
    go through the exact ``left_anti`` on (url_hash, url).
    """

    def __init__(
        self,
        spark,
        n_bits: int = 1 << 23,
        n_hashes: int = 5,
        use_bloom: bool = True,
    ):
        self.spark = spark
        self.use_bloom = use_bloom
        self.bloom = BloomFilter(n_bits, n_hashes) if use_bloom else None
        self._seen_df: DataFrame | None = None
        self._nonempty = False

    def load(self, seen_df: DataFrame) -> None:
        """(Re)load the exact set, e.g. on resume; rebuilds the bloom
        distributed."""
        self._seen_df = seen_df
        self._nonempty = bool(seen_df.take(1))
        if self.use_bloom and self._nonempty:
            self.bloom = build_bloom_distributed(
                seen_df, "url_hash", self.bloom.n_bits, self.bloom.n_hashes
            )

    def set_exact(self, seen_df: DataFrame) -> None:
        """Swap the exact side (e.g. to a freshly committed snapshot read)
        WITHOUT rebuilding the bloom — used when the bloom has already been
        updated incrementally via ``add``."""
        self._seen_df = seen_df
        self._nonempty = bool(seen_df.take(1))

    def add(self, new_df: DataFrame) -> None:
        """Register newly seen rows (url_hash, url). The exact table is the
        caller's snapshot append; here we fold the round's hashes into the
        bloom via a distributed build + driver-side OR (round waves are
        politeness-bounded, so the per-round build is small)."""
        self._seen_df = (
            new_df.select("url_hash", "url")
            if self._seen_df is None
            else self._seen_df.select("url_hash", "url").unionByName(
                new_df.select("url_hash", "url")
            )
        )
        self._nonempty = True
        if self.use_bloom:
            round_bloom = build_bloom_distributed(
                new_df, "url_hash", self.bloom.n_bits, self.bloom.n_hashes
            )
            self.bloom.merge(round_bloom)

    def filter_new(self, candidates: DataFrame) -> DataFrame:
        if self._seen_df is None or not self._nonempty:
            return candidates
        seen = self._seen_df.select("url_hash", "url")
        if not self.use_bloom:
            return candidates.join(seen, ["url_hash", "url"], "left_anti")
        maybe_flag = bloom_contains_col(
            self.spark, self.bloom, F.col("url_hash")
        )
        flagged = candidates.withColumn("_maybe_seen", maybe_flag)
        definitely_new = flagged.filter(~F.col("_maybe_seen")).drop("_maybe_seen")
        survivors = (
            flagged.filter(F.col("_maybe_seen"))
            .drop("_maybe_seen")
            .join(seen, ["url_hash", "url"], "left_anti")
        )
        return definitely_new.unionByName(survivors)
