"""Sketches: distinct-count (KMV bottom-k and HyperLogLog), set
membership (Bloom filter) and point frequency / heavy hitters
(Count-Min), all as streaming Ray Data passes.

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


def _scatter_or(words: np.ndarray, pos: np.ndarray) -> None:
    """OR the given u64 bit positions into a packed word array — the
    ONE scatter kernel shared by BloomFilter.add, the distributed
    build's dense partial and the sparse-blob fold."""
    np.bitwise_or.at(
        words, (pos >> np.uint64(6)).astype(np.int64),
        np.uint64(1) << (pos & np.uint64(63)),
    )


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
        _scatter_or(self.words, self._positions(self._hash(values)).ravel())

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
    ds: rd.Dataset,
    col: str,
    m_bits: int = 1 << 23,
    k: int = 7,
    tree_fanin: int = 64,
) -> BloomFilter:
    """Distributed Bloom build: each block folds its values into a
    local partial, partials OR-fold to one bitmap.  The result is a
    deterministic function of the value SET (OR is commutative), so
    partitioning never changes it.

    Scale shape (round-4 hardening — the naive build ships one DENSE
    bitmap per block through the driver, blocks × m_bits/8 bytes into
    one node):

    - **Sparse partials**: a block whose set bit-positions (k·n_vals
      u64s) are smaller than the bitmap emits them as a sorted
      positions row instead of the dense bitmap — small blocks cost
      O(values), not O(m_bits).  Tagged ``dense`` flag per row; the
      fold handles both kinds.
    - **Tree fold**: when more than ``tree_fanin`` partial rows exist,
      one worker-side fold level (repartition into ceil(n/fanin)
      blocks — even by construction, no sort — then one whole-block
      OR-fold task per block) reduces driver ingest from O(blocks)
      partials to O(blocks / tree_fanin); add levels by lowering
      ``tree_fanin`` if blocks ever outgrow one level."""

    def partial(batch: pa.Table) -> pa.Table:
        vals = batch[col].to_numpy(zero_copy_only=False)
        if len(vals) == 0:
            return pa.table(
                {"bm": pa.array([], type=pa.binary()),
                 "dense": pa.array([], type=pa.bool_())}
            )
        bf = BloomFilter.empty(m_bits, k)
        pos = bf._positions(bf._hash(vals)).ravel()
        if pos.nbytes < m_bits // 8:
            blob = np.unique(pos).tobytes()  # sorted u64 positions
            return pa.table(
                {"bm": pa.array([blob], type=pa.binary()),
                 "dense": pa.array([False])}
            )
        _scatter_or(bf.words, pos)
        return pa.table(
            {"bm": pa.array([bf.words.tobytes()], type=pa.binary()),
             "dense": pa.array([True])}
        )

    def _fold_into(words: np.ndarray, blob: bytes, dense: bool) -> None:
        if dense:
            words |= np.frombuffer(blob, dtype=np.uint64)
        else:
            _scatter_or(words, np.frombuffer(blob, dtype=np.uint64))

    def or_fold_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return pa.table(
                {"bm": pa.array([], type=pa.binary()),
                 "dense": pa.array([], type=pa.bool_())}
            )
        words = np.zeros(m_bits // 64, dtype=np.uint64)
        dense_col = block["dense"].to_numpy(zero_copy_only=False)
        for i, blob in enumerate(block["bm"]):
            _fold_into(words, blob.as_py(), bool(dense_col[i]))
        return pa.table(
            {"bm": pa.array([words.tobytes()], type=pa.binary()),
             "dense": pa.array([True])}
        )

    partials = ds.map_batches(partial, batch_format="pyarrow").materialize()
    n_partials = partials.count()
    if n_partials > tree_fanin:
        # worker-side fold level: spread the partial rows evenly over
        # ceil(n/fanin) blocks (repartition — grouping is arbitrary,
        # OR is commutative) and fold each whole block into one bitmap
        n_groups = -(-n_partials // tree_fanin)
        partials = partials.repartition(n_groups).map_batches(
            or_fold_block, batch_size=None, batch_format="pyarrow"
        )

    out = BloomFilter.empty(m_bits, k)
    for b in partials.iter_batches(batch_format="pyarrow"):
        dense_col = b["dense"].to_numpy(zero_copy_only=False)
        for i, blob in enumerate(b["bm"]):
            _fold_into(out.words, blob.as_py(), bool(dense_col[i]))
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


# --------------------------------------------------------------------------
# Count-Min frequency sketch (heavy hitters / point frequency queries)

_CMS_PART_SCHEMA = pa.schema(
    [("r", pa.int64()), ("c", pa.int64()), ("cnt", pa.int64())]
)


def cms_positions(values: np.ndarray, depth: int, width: int) -> np.ndarray:
    """(n, depth) Count-Min column indices.  Row ``r``'s hash is hex
    slice ``[8r, 8r+8)`` of ONE md5 hexdigest per value (depth ≤ 4) —
    the rows are distinct 32-bit views of a single 128-bit digest
    rather than independent hashes, the portable-oracle trade-off
    (DuckDB replays each as
    ``CAST(('0x' || substr(md5(v), 1+8*r, 8)) AS BIGINT) % width``;
    same md5-per-unique-value cost class as :func:`kmv_distinct`,
    production would swap a faster keyed hash)."""
    if not 1 <= depth <= 4:
        raise ValueError(f"depth must be in [1, 4] (md5 has 4 u32 slices), got {depth}")
    out = np.empty((len(values), depth), dtype=np.int64)
    for i, v in enumerate(values):
        hx = hashlib.md5(str(v).encode("utf-8")).hexdigest()
        for r in range(depth):
            out[i, r] = int(hx[8 * r : 8 * r + 8], 16) % width
    return out


def cms_partial_table(
    values: np.ndarray, weights: np.ndarray, depth: int, width: int
) -> pa.Table:
    """One block's Count-Min cells (Cormode & Muthukrishnan '05): fold
    the (value, weight) pairs into a local depth×width counter matrix
    via one scatter-add per row, emit the nonzero cells as narrow
    ``(r, c, cnt)`` rows.  Cell streams SUM-merge (addition is
    commutative/associative), so the folded sketch is a deterministic
    function of the input multiset, independent of partitioning."""
    if len(values) == 0:
        return _CMS_PART_SCHEMA.empty_table()
    pos = cms_positions(values, depth, width)
    mat = np.zeros((depth, width), dtype=np.int64)
    w = np.asarray(weights, dtype=np.int64)
    for r in range(depth):
        np.add.at(mat[r], pos[:, r], w)
    rr, cc = np.nonzero(mat)
    return pa.table(
        {
            "r": pa.array(rr.astype(np.int64)),
            "c": pa.array(cc.astype(np.int64)),
            "cnt": pa.array(mat[rr, cc]),
        },
        schema=_CMS_PART_SCHEMA,
    )


def cms_cells(
    parts: rd.Dataset, depth: int, width: int
) -> rd.Dataset:
    """Fold a per-block cell stream into the global sketch: one tiny
    groupby over ≤ depth·width distinct (r, c) keys — the shuffle moves
    at most ``blocks × depth × min(width, block_vocab)`` narrow rows,
    never the data."""
    from ray.data.aggregate import Sum

    return parts.groupby(["r", "c"]).aggregate(Sum("cnt", alias_name="cnt"))


def cms_point_estimates(
    cells, values: np.ndarray, depth: int, width: int
) -> np.ndarray:
    """Point-frequency estimates for ``values`` from folded cells (a
    pandas DataFrame or pyarrow Table of (r, c, cnt)).  Estimate = min
    over rows of the addressed cell — never an undercount
    (est ≥ true count; overshoot ≤ e·N/width per row with prob.
    1 − e^−depth for independent rows)."""
    if isinstance(cells, pa.Table):
        cells = cells.to_pandas()
    mat = np.zeros((depth, width), dtype=np.int64)
    mat[cells["r"].to_numpy(), cells["c"].to_numpy()] = cells["cnt"].to_numpy()
    if len(values) == 0:
        return np.empty(0, dtype=np.int64)
    pos = cms_positions(values, depth, width)
    ests = np.empty((len(values), depth), dtype=np.int64)
    for r in range(depth):
        ests[:, r] = mat[r, pos[:, r]]
    return ests.min(axis=1)


# --------------------------------------------------------------------------
# HyperLogLog distinct-count sketch


_HLL_PART_SCHEMA = pa.schema([("bucket", pa.int64()), ("rho", pa.int64())])
# per-batch dense register-matrix element cap for hll_partials_by_key
# (keys × m entries, int64 → 32 MB at the default); above it the sparse
# segmented-max path runs instead of allocating a gigabyte-scale matrix
_HLL_DENSE_CAP = 1 << 22


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Vectorized bit_length over uint64 (0 → 0)."""
    x = x.astype(np.uint64, copy=True)
    bl = np.zeros(x.shape, dtype=np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        su = np.uint64(s)
        big = (x >> su) > 0
        bl[big] += s
        x[big] >>= su
    bl[x > 0] += 1
    return bl


def hll_partials(ds: rd.Dataset, col: str, p: int = 12) -> rd.Dataset:
    """Per-block HyperLogLog register partials (Flajolet et al. 2007):
    one streaming pass emitting ≤ 2**p narrow (bucket, rho) rows per
    block — the per-block MAX-fold of each value hash's register
    update.  Register folds are idempotent maxes, so the partial
    stream merges into the exact serial register file regardless of
    partitioning (pinned by tests), and the groupby that folds it
    shuffles at most ``blocks × 2**p`` tiny rows — never the data.

    NULLs are skipped (the ``COUNT(DISTINCT col)`` convention, same
    policy as ``kmv_distinct``)."""
    if not 4 <= p <= 18:
        raise ValueError(f"p must be in [4, 18], got {p}")
    m = 1 << p

    def partial(batch: pa.Table) -> pa.Table:
        colv = batch[col].combine_chunks() if isinstance(
            batch[col], pa.ChunkedArray
        ) else batch[col]
        colv = colv.drop_null()
        if len(colv) == 0:
            return _HLL_PART_SCHEMA.empty_table()
        h = BloomFilter._hash(colv.to_numpy(zero_copy_only=False)).astype(np.uint64)
        bucket = (h >> np.uint64(64 - p)).astype(np.int64)
        w = h << np.uint64(p)  # remaining 64-p bits, left-aligned
        rho = np.where(
            w == 0, np.int64(64 - p + 1), np.int64(65) - _bit_length_u64(w)
        ).astype(np.int64)
        regs = np.zeros(m, dtype=np.int64)
        np.maximum.at(regs, bucket, rho)
        nz = np.flatnonzero(regs)
        return pa.table(
            {
                "bucket": pa.array(nz, type=pa.int64()),
                "rho": pa.array(regs[nz], type=pa.int64()),
            }
        )

    return ds.map_batches(partial, batch_format="pyarrow")


def hll_estimate(buckets: np.ndarray, rhos: np.ndarray, p: int) -> dict:
    """Finalize folded registers → estimate.  The harmonic-mean
    denominator is carried as the EXACT integer ``sum(2**(64-rho))``
    (zero registers contribute 2**64), so a SQL oracle can reproduce
    the estimate bit-for-bit from staged partials: both engines round
    the same integer to double once, then apply the identical
    alpha·m²·2⁶⁴/denom expression (and the standard linear-counting
    small-range correction m·ln(m/V) when est ≤ 2.5·m and V>0)."""
    import math

    m = 1 << p
    n_zero = m - len(buckets)
    denom = sum(int(2 ** (64 - int(r))) for r in rhos) + n_zero * 2**64
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m * 2.0**64 / float(denom)
    if est <= 2.5 * m and n_zero > 0:
        est = m * math.log(m / n_zero)
    return {
        "n_distinct_est": round(est, 6),
        "hll_p": p,
        "n_zero": n_zero,
        "denom": str(denom),
    }


def hll_distinct(ds: rd.Dataset, col: str, p: int = 12):
    """COUNT(DISTINCT col) estimate via HyperLogLog (relative error
    ≈ 1.04/sqrt(2**p); p=12 → ~1.6% at 4 KiB of registers).  The
    mergeable complement to :func:`kmv_distinct`: KMV is the
    SQL-replayable deterministic estimator, HLL is the constant-memory
    register fold whose per-block partials OR into shards/streams —
    the shape used to track corpus cardinality across incremental
    ingest.  Returns a one-row pyarrow Table."""
    parts = hll_partials(ds, col, p)
    return hll_from_partials(parts, p)


def hll_from_partials(parts: rd.Dataset, p: int) -> pa.Table:
    from ray.data.aggregate import Max

    folded = parts.groupby("bucket").aggregate(Max("rho", alias_name="rho"))
    df = folded.to_pandas()  # ≤ 2**p rows: driver-side finalize
    out = hll_estimate(
        df["bucket"].to_numpy() if len(df) else np.empty(0, np.int64),
        df["rho"].to_numpy() if len(df) else np.empty(0, np.int64),
        p,
    )
    return pa.table(
        {
            "n_distinct_est": pa.array([out["n_distinct_est"]], type=pa.float64()),
            "hll_p": pa.array([out["hll_p"]], type=pa.int64()),
            "n_zero": pa.array([out["n_zero"]], type=pa.int64()),
            "denom": pa.array([out["denom"]], type=pa.string()),
        }
    )


# ---------------------------------------------------------------------------
# exact φ-heavy hitters (two-pass, no full-vocabulary shuffle)


def token_heavy_hitters(
    docs: rd.Dataset,
    phi_num: int,
    phi_den: int,
    text_col: str = "text",
    candidate_limit: int = 5_000_000,
) -> rd.Dataset:
    """EXACT φ-heavy hitters of the whitespace-token stream — every
    token whose corpus count ``n`` satisfies ``n·phi_den ≥ phi_num·N``
    (N = total tokens, φ = phi_num/phi_den as an exact rational) —
    in two streaming passes that NEVER shuffle the full vocabulary
    (the scale gap vs the doc_top_tokens full-token groupby: at
    web scale the distinct-token table is itself huge).

    Pass 1 (candidate generation, Misra–Gries-flavored): per block,
    one ``np.unique`` count; a token is a LOCAL candidate iff
    ``n_b·phi_den ≥ phi_num·N_b``.  Pigeonhole guarantees the union of
    local candidates is a superset of the global φ-heavy set (if
    ``n ≥ φ·N`` then some block has ``n_b ≥ φ·N_b``, else summing the
    strict inequalities contradicts).  Each block contributes ≤ 1/φ
    candidates plus one total row, so the collected union is bounded
    by blocks·(1/φ + 1) rows (asserted ≤ ``candidate_limit``).

    Pass 2 (exact counting): the sorted candidate array is broadcast
    once via ``ray.put``; per block a searchsorted membership filter
    keeps candidate tokens only, partial-counts them, and one
    ≤ |candidates|-key groupby sums.  The final filter applies the
    exact integer threshold.  Output: (tok, n) with EXACT counts —
    a DuckDB oracle can re-derive it fully independently.

    Tokenization rides the audited helper (functions/tokenize.py):
    lower → trim → whitespace split, empty tokens dropped.
    """
    import ray
    from ray.data.aggregate import Sum

    from ..functions.tokenize import tokens_flat

    if phi_num <= 0 or phi_den <= 0:
        raise ValueError(f"phi must be positive, got {phi_num}/{phi_den}")

    _CAND_SCHEMA = pa.schema(
        [("tok", pa.string()), ("is_total", pa.bool_()), ("ntot", pa.int64())]
    )

    def local_candidates(batch: pa.Table) -> pa.Table:
        denc = tokens_flat(batch[text_col]).flat.dictionary_encode()
        counts = np.bincount(
            denc.indices.to_numpy(zero_copy_only=False),
            minlength=len(denc.dictionary),
        ).astype(np.int64)
        n_b = int(counts.sum())
        heavy = counts * phi_den >= phi_num * n_b
        toks = denc.dictionary.filter(pa.array(heavy))
        return pa.table(
            {
                "tok": pa.concat_arrays(
                    [toks.cast(pa.string()), pa.array([None], type=pa.string())]
                ),
                "is_total": pa.array([False] * len(toks) + [True]),
                "ntot": pa.array([0] * len(toks) + [n_b], type=pa.int64()),
            },
            schema=_CAND_SCHEMA,
        )

    # bound driver memory WHILE streaming: raise as soon as the running row
    # count exceeds the limit, before concatenating/holding the full set
    part_tables: list[pa.Table] = []
    seen_rows = 0
    for bt in (
        docs.select_columns([text_col])
        .map_batches(local_candidates, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=65536)
    ):
        seen_rows += bt.num_rows
        if seen_rows > candidate_limit:
            raise ValueError(
                f"token_heavy_hitters: >{candidate_limit} candidate rows "
                f"(candidate_limit); raise phi or the limit"
            )
        part_tables.append(bt)
    parts = (
        pa.concat_tables(part_tables) if part_tables
        else _CAND_SCHEMA.empty_table()
    )
    is_total = parts["is_total"].to_numpy(zero_copy_only=False)
    n_total = int(parts["ntot"].to_numpy(zero_copy_only=False)[is_total].sum())
    cands = np.unique(
        np.asarray(parts["tok"].filter(pa.array(~is_total)).to_pylist(), dtype=object)
    )
    empty = pa.table(
        {"tok": pa.array([], type=pa.string()), "n": pa.array([], type=pa.int64())}
    )
    if n_total == 0 or len(cands) == 0:
        return rd.from_arrow(empty)
    cand_ref = ray.put(cands)

    def count_candidates(batch: pa.Table) -> pa.Table:
        cand = ray.get(cand_ref)
        denc = tokens_flat(batch[text_col]).flat.dictionary_encode()
        counts = np.bincount(
            denc.indices.to_numpy(zero_copy_only=False),
            minlength=len(denc.dictionary),
        ).astype(np.int64)
        toks = np.asarray(denc.dictionary.to_pylist(), dtype=object)
        pos = np.searchsorted(cand, toks)
        pos_c = np.clip(pos, 0, len(cand) - 1)
        member = cand[pos_c] == toks
        if not member.any():
            return empty
        return pa.table(
            {
                "tok": pa.array(toks[member], type=pa.string()),
                "n": pa.array(counts[member], type=pa.int64()),
            }
        )

    agg = (
        docs.select_columns([text_col])
        .map_batches(count_candidates, batch_format="pyarrow")
        .groupby("tok")
        .aggregate(Sum("n", alias_name="n"))
    )

    def threshold(batch: pa.Table) -> pa.Table:
        n = batch["n"].to_numpy(zero_copy_only=False)
        keep = n * phi_den >= phi_num * n_total
        return batch.filter(pa.array(keep))

    return agg.map_batches(threshold, batch_format="pyarrow")


def hll_partials_by_key(
    ds: rd.Dataset, key_col: str, col: str, p: int = 12,
    dense_cap: int = _HLL_DENSE_CAP,
) -> rd.Dataset:
    """Per-KEY HyperLogLog register partials: one streaming pass
    emitting (key, bucket, rho) rows — the per-block MAX-fold of each
    value's register update within its key group (the windowed /
    per-segment cardinality shape: distinct users per time window
    WITHOUT shuffling a (key, value) distinct table).  Register folds
    are idempotent maxes, so any partitioning merges to the exact
    serial register file per key; the downstream groupby shuffles at
    most blocks × keys-per-block × nnz-registers tiny rows.

    NULL values are skipped (COUNT(DISTINCT) convention); NULL keys
    are skipped too (no stratum to charge)."""
    if not 4 <= p <= 18:
        raise ValueError(f"p must be in [4, 18], got {p}")
    m = 1 << p
    empty = pa.table(
        {
            "key": pa.array([], type=pa.int64()),
            "bucket": pa.array([], type=pa.int64()),
            "rho": pa.array([], type=pa.int64()),
        }
    )

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        keys = batch[key_col].to_numpy(zero_copy_only=False)
        vals = batch[col].to_numpy(zero_copy_only=False)
        ok = ~pd.isna(keys) & ~pd.isna(vals)
        if not ok.any():
            return empty
        keys = keys[ok].astype(np.int64)
        h = BloomFilter._hash(vals[ok]).astype(np.uint64)
        bucket = (h >> np.uint64(64 - p)).astype(np.int64)
        w = h << np.uint64(p)
        rho = np.where(
            w == 0, np.int64(64 - p + 1), np.int64(65) - _bit_length_u64(w)
        ).astype(np.int64)
        kcodes, kuniq = pd.factorize(keys)
        if len(kuniq) * m <= dense_cap:  # dense matrix ≤ 32 MB default
            regs = np.zeros((len(kuniq), m), dtype=np.int64)
            np.maximum.at(regs, (kcodes, bucket), rho)
            ki, bi = np.nonzero(regs)
            return pa.table(
                {
                    "key": pa.array(kuniq[ki].astype(np.int64)),
                    "bucket": pa.array(bi.astype(np.int64)),
                    "rho": pa.array(regs[ki, bi]),
                }
            )
        # high key cardinality (fine-grained windows): a dense
        # (keys × m) matrix would allocate gigabytes — sparse
        # lexsort + segmented max over (key, bucket) runs instead
        order = np.lexsort((bucket, kcodes))
        kc, bu, rh = kcodes[order], bucket[order], rho[order]
        new = np.ones(len(kc), dtype=bool)
        new[1:] = (kc[1:] != kc[:-1]) | (bu[1:] != bu[:-1])
        gid = np.cumsum(new) - 1
        gmax = np.zeros(int(gid[-1]) + 1, dtype=np.int64)
        np.maximum.at(gmax, gid, rh)
        starts = np.flatnonzero(new)
        return pa.table(
            {
                "key": pa.array(kuniq[kc[starts]].astype(np.int64)),
                "bucket": pa.array(bu[starts].astype(np.int64)),
                "rho": pa.array(gmax),
            }
        )

    return ds.map_batches(partial, batch_format="pyarrow")


def kmv_distinct_by_key(
    ds: rd.Dataset, key_col: str, col: str, k: int = 64, n_parts: int = 64
) -> rd.Dataset:
    """Per-KEY bottom-k (KMV) distinct-count estimates: one row
    (key, n_distinct_est, kmv_k) per key — the keyed twin of
    :func:`kmv_distinct` and the fully-SQL-replayable alternative to
    :func:`hll_partials_by_key` (md5 + per-key ORDER BY/LIMIT k is a
    deterministic function of the value sets, so an oracle re-derives
    every estimate independently — no staging needed).

    Shape: per-block (key, h) bottom-k partials (≤ k rows per key per
    block) → one key-hash groupby where each key's rows land together
    → per-key bottom-k fold + finalize in one vectorized pass.  NULL
    keys and NULL values are skipped."""
    if k < 2:
        raise ValueError("k must be >= 2")
    from ..functions.hashing import part_of_ints

    empty_part = pa.table(
        {
            "key": pa.array([], type=pa.int64()),
            "h": pa.array([], type=pa.string()),
            "part": pa.array([], type=pa.int32()),
        }
    )
    out_schema = pa.schema(
        [("key", pa.int64()), ("n_distinct_est", pa.float64()),
         ("kmv_k", pa.int64())]
    )

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        keys = batch[key_col].to_numpy(zero_copy_only=False)
        vals = batch[col].to_numpy(zero_copy_only=False)
        ok = ~pd.isna(keys) & ~pd.isna(vals)
        if not ok.any():
            return empty_part
        df = pd.DataFrame(
            {"key": keys[ok].astype(np.int64), "v": vals[ok]}
        ).drop_duplicates()
        df["h"] = [
            hashlib.md5(str(v).encode("utf-8")).hexdigest() for v in df["v"]
        ]
        df = df.sort_values(["key", "h"]).groupby("key").head(k)
        kk = df["key"].to_numpy()
        return pa.table(
            {
                "key": pa.array(kk, type=pa.int64()),
                "h": pa.array(df["h"].to_numpy(dtype=object), type=pa.string()),
                "part": pa.array(part_of_ints(n_parts, kk), type=pa.int32()),
            }
        )

    def finalize_group(g: pa.Table) -> pa.Table:
        import pandas as pd

        if g.num_rows == 0:
            return out_schema.empty_table()
        df = pd.DataFrame(
            {
                "key": g["key"].to_numpy(zero_copy_only=False),
                "h": g["h"].to_numpy(zero_copy_only=False),
            }
        ).drop_duplicates().sort_values(["key", "h"]).groupby("key").head(k)
        keys_out, est_out = [], []
        for key, sub in df.groupby("key", sort=True):
            hs = sub["h"].to_numpy()
            if len(hs) < k:
                est = float(len(hs))
            else:
                frac = int(hs[k - 1][:16], 16) / _TWO64
                est = (k - 1) / frac
            keys_out.append(int(key))
            est_out.append(np.round(est, 6))
        return pa.table(
            {
                "key": pa.array(keys_out, type=pa.int64()),
                "n_distinct_est": pa.array(est_out, type=pa.float64()),
                "kmv_k": pa.array([k] * len(keys_out), type=pa.int64()),
            },
            schema=out_schema,
        )

    parts = ds.map_batches(partial, batch_format="pyarrow")
    return map_groups_typed(parts, "part", finalize_group, out_schema.empty_table())
