"""Sketches: distinct-count (KMV / bottom-k) and set membership
(Bloom filter), both as streaming Ray Data passes.

``kmv_distinct`` estimates ``COUNT(DISTINCT col)`` with bounded memory
by keeping the ``k`` lexicographically smallest md5 digests of the
values seen (bottom-k / K-Minimum-Values estimator, Bar-Yossef et al.
RANDOM'02): with ``d`` distinct values uniformly hashed into [0, 1),
the k-th smallest hash ``x`` satisfies ``E[k / x] ≈ d + 1``, and the
unbiased estimate is ``(k - 1) / x`` (relative error ~ 1/sqrt(k)).
When fewer than ``k`` distinct hashes exist the count is exact.

Unlike HyperLogLog this estimator is a *deterministic* function of the
input value set — merge of per-block bottom-k sets equals bottom-k of
the union, independent of partitioning — so the driver's DuckDB oracle
can replay it exactly in SQL (``md5`` + ``ORDER BY`` + ``LIMIT k``;
queries.SQL_DOC_VOCAB_KMV).

Scale shape: one streaming ``map_batches`` pass emitting ≤ k rows per
block, a hash-prefix-bucketed reduce over those tiny partials (256
groups via ``map_groups_typed`` — typed empties, bounded group size
≤ the partial stream), and a 1-row finalize over ≤ 256·k digests.
md5-per-unique-value is the portable-oracle choice (precedent:
``text.rolling_fingerprint_batch``); production would swap a faster
64-bit hash at the cost of SQL replayability.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from .base import map_groups_typed

_PART_SCHEMA = pa.schema([("h", pa.string())])
_OUT_SCHEMA = pa.schema([("n_distinct_est", pa.float64()), ("kmv_k", pa.int64())])
_TWO64 = float(2**64)


def _bottom_k(hashes: np.ndarray, k: int) -> np.ndarray:
    u = np.unique(hashes)  # sorted ascending
    return u[:k]


def kmv_distinct(ds: rd.Dataset, col: str, k: int = 256) -> rd.Dataset:
    """1-row Dataset ``{n_distinct_est: double, kmv_k: int64}`` —
    bottom-k estimate of the number of distinct non-null values in
    ``ds[col]`` (exact when distinct < k).  The estimate is rounded to
    6 decimals so the float compares equal across engines."""
    if k < 2:
        raise ValueError("k must be >= 2")

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _PART_SCHEMA.empty_table()
        uniq = pc.unique(batch[col].combine_chunks().cast(pa.string())).drop_null()
        hs = np.array(
            [hashlib.md5(s.encode("utf-8")).hexdigest() for s in uniq.to_pylist()],
            dtype=object,
        )
        return pa.table({"h": pa.array(_bottom_k(hs, k), type=pa.string())})

    def add_bucket(batch: pa.Table) -> pa.Table:
        hs = batch["h"].to_numpy(zero_copy_only=False)
        bucket = np.array([int(h[:2], 16) for h in hs], dtype=np.int64)
        return batch.append_column("bucket", pa.array(bucket))

    def combine_group(g: pa.Table) -> pa.Table:
        hs = g["h"].to_numpy(zero_copy_only=False)
        return pa.table({"h": pa.array(_bottom_k(hs, k), type=pa.string())})

    def finalize(batch: pa.Table) -> pa.Table:
        hs = _bottom_k(batch["h"].to_numpy(zero_copy_only=False), k)
        if len(hs) < k:
            est = float(len(hs))
        else:
            frac = int(hs[k - 1][:16], 16) / _TWO64
            est = (k - 1) / frac
        return pa.table(
            {
                "n_distinct_est": pa.array([np.round(est, 6)], type=pa.float64()),
                "kmv_k": pa.array([k], type=pa.int64()),
            },
            schema=_OUT_SCHEMA,
        )

    parts = ds.map_batches(partial, batch_format="pyarrow")
    # bucketed reduce: group the tiny partial stream by md5 first byte
    # (256 groups), keep bottom-k per bucket — the global bottom-k is a
    # subset of the union, so finalize sees ≤ 256*k rows regardless of
    # input block count.  map_groups_typed keeps empties typed.
    bucketed = parts.map_batches(add_bucket, batch_format="pyarrow")
    merged = map_groups_typed(
        bucketed, "bucket", combine_group, _PART_SCHEMA.empty_table()
    )
    final = merged.repartition(1).map_batches(
        finalize, batch_size=None, batch_format="pyarrow"
    )
    # an all-empty input can collapse to zero blocks inside the sort,
    # so finalize would never run — union a typed 0-estimate default
    # and keep the first row (finalize's, when it exists)
    default = rd.from_arrow(
        pa.table(
            {
                "n_distinct_est": pa.array([0.0], type=pa.float64()),
                "kmv_k": pa.array([k], type=pa.int64()),
            },
            schema=_OUT_SCHEMA,
        )
    )
    return final.union(default).limit(1)


# --------------------------------------------------------------------------
# Bloom-filter membership sketch


class BloomFilter:
    """Fixed-size Bloom filter over u64 value hashes (double hashing,
    Kirsch–Mitzenmacher '06: position_i = (h1 + i·h2) mod m — two
    derived hashes give the FPR of k independent ones).

    Guarantees NO false negatives: ``contains`` is True for every
    inserted value; false-positive rate ≈ (1 - e^(-k·n/m))^k.  Use as a
    pre-filter in front of an exact check (decontamination, seen-URL /
    seen-document sets): rows the filter rejects are PROVABLY novel and
    skip the expensive exact path entirely.

    Scale shape: the bitmap is a flat uint64 word array — ``ray.put``
    it once and probe inside ``map_batches`` (plasma reads of numpy are
    zero-copy, so N probe tasks share one copy per node).  A single
    filter is sized for up to ~10^9 members at a useful FPR (m=2^33
    bits = 1 GiB); beyond that, hash-partition the corpus and build one
    filter per partition (the probe then routes by the same partition
    hash) — the build below is that per-partition primitive.
    """

    __slots__ = ("m_bits", "k", "words")

    _H2_MIX = np.uint64(0x9E3779B97F4A7C15)

    def __init__(self, m_bits: int, k: int, words: np.ndarray):
        if m_bits % 64 or len(words) != m_bits // 64:
            raise ValueError(f"words length {len(words)} != m_bits/64")
        self.m_bits = m_bits
        self.k = k
        self.words = words

    @classmethod
    def empty(cls, m_bits: int = 1 << 23, k: int = 7) -> "BloomFilter":
        return cls(m_bits, k, np.zeros(m_bits // 64, dtype=np.uint64))

    @staticmethod
    def _hash(values: np.ndarray) -> np.ndarray:
        from ..functions.hashing import hash_strings

        v = np.asarray(values)
        if v.dtype.kind in "iu":
            import pandas as pd

            return pd.util.hash_array(v.astype(np.int64), categorize=False)
        return hash_strings(v)

    def _positions(self, h: np.ndarray) -> np.ndarray:
        """(n, k) bit positions via double hashing; h2 forced odd so the
        stride cycles the whole (power-of-two) table."""
        h1 = h
        h2 = (h ^ (h >> np.uint64(33))) * self._H2_MIX | np.uint64(1)
        i = np.arange(self.k, dtype=np.uint64)[None, :]
        return (h1[:, None] + i * h2[:, None]) % np.uint64(self.m_bits)

    def add(self, values: np.ndarray) -> None:
        pos = self._positions(self._hash(values)).ravel()
        np.bitwise_or.at(
            self.words, (pos >> np.uint64(6)).astype(np.int64),
            np.uint64(1) << (pos & np.uint64(63)),
        )

    def contains(self, values: np.ndarray) -> np.ndarray:
        """Boolean mask; vectorized word-gather + popcount-free test."""
        if len(values) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(self._hash(values))
        w = self.words[(pos >> np.uint64(6)).astype(np.int64)]
        bit = np.uint64(1) << (pos & np.uint64(63))
        return ((w & bit) != 0).all(axis=1)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        if (self.m_bits, self.k) != (other.m_bits, other.k):
            raise ValueError("bloom configs differ")
        return BloomFilter(self.m_bits, self.k, self.words | other.words)


def build_bloom(
    ds: rd.Dataset, col: str, m_bits: int = 1 << 23, k: int = 7
) -> BloomFilter:
    """Distributed Bloom build: each block folds its values into a
    local bitmap (one vectorized scatter-OR), blocks emit the packed
    bitmap as one binary row, and the driver OR-folds the stream —
    memory bounded at TWO bitmaps regardless of input size.  The result
    is a deterministic function of the value SET (OR is commutative),
    so partitioning never changes it."""

    def partial(batch: pa.Table) -> pa.Table:
        bf = BloomFilter.empty(m_bits, k)
        vals = batch[col].to_numpy(zero_copy_only=False)
        if len(vals):
            bf.add(vals)
        return pa.table({"bm": pa.array([bf.words.tobytes()], type=pa.binary())})

    out = BloomFilter.empty(m_bits, k)
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for blob in b["bm"]:
            out.words |= np.frombuffer(blob.as_py(), dtype=np.uint64)
    return out


def bloom_split(
    ds: rd.Dataset, col: str, bloom_ref, novel: bool
) -> rd.Dataset:
    """Filter by Bloom membership.  ``novel=True`` keeps rows the
    filter REJECTS — provably absent from the built set (the
    no-false-negative guarantee); ``novel=False`` keeps the accepted
    rows (members plus an FPR-bounded sliver) for the exact
    verification pass.  ``bloom_ref`` is ``ray.put((m_bits, k, words))``
    — one object-store copy shared zero-copy by every probe task."""
    import ray

    def probe(batch: pa.Table) -> pa.Table:
        m_bits, k, words = ray.get(bloom_ref)
        bf = BloomFilter(m_bits, k, words)
        mask = bf.contains(batch[col].to_numpy(zero_copy_only=False))
        return batch.filter(pa.array(~mask if novel else mask))

    return ds.map_batches(probe, batch_format="pyarrow")
