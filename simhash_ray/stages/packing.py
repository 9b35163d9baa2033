"""Training-output preparation: token chunking, sequence packing,
deterministic global ordering.

The last mile of a pretraining-data pipeline — after dedup/curation the
corpus must be cut into model-sized pieces, packed into fixed token
budgets, and laid out in a reproducible global order.  Reference
analogue: the reference streams `(label, message)` lines straight into
training (/root/reference/src/SimHash.hs train loop); these operators
are the batch-shaped generalization a 100-TB corpus needs.

Three operators, all streaming `map_batches` except where a shuffle is
semantically required:

- :func:`chunk_tokens` — split each document's whitespace tokens into
  fixed-size windows (context-length sharding).  Pure per-batch
  `map_batches`; the chunk texts are rebuilt with one vectorized
  ``pc.binary_join`` over a re-offsetted ListArray — no Python loop.
- :func:`pack_greedy` — greedy first-fit-in-id-order packing of
  documents into bins of ``capacity`` tokens (sequence packing for
  pretraining batches).  Packing is sequential BY DEFINITION, so the
  operator makes the sequential scope explicit and bounded: documents
  are packed independently within deterministic id-range partitions
  (``part = id // part_span``), one narrow shuffle of (id, n_tokens)
  rows groups each partition, and the greedy inside a partition runs
  as O(bins · log rows) numpy ``searchsorted`` steps over the token
  cumsum — not a per-row Python loop.  Bins never span partitions, so
  results are independent of cluster size / block layout, and each
  partition's bins are addressable as (part, bin_seq).
- :func:`global_rank` — deterministic global enumeration by a
  content-independent md5 shuffle key (reproducible training order;
  the distributed ``zipWithIndex``).  Histogram pattern: one pass
  counts rows per key-prefix bucket (≤ n_buckets narrow rows to the
  driver), the driver prefix-sums bucket offsets, and a second pass
  ranks within buckets — no global sort of the full table and no
  driver materialization beyond the n_buckets histogram.

Scale notes: ``chunk_tokens`` shuffles nothing.  ``pack_greedy``
shuffles only (id, count) pairs — 16 bytes/row — and ``part_span``
bounds the per-group working set.  ``global_rank`` moves each row
once through the bucket groupby; bucket skew is impossible because the
key is a uniform hash.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Count

from ..functions.hashing import md5_u32_of_int_ids
from ..functions.tokenize import tokens_flat
from .base import map_groups_typed


# ---------------------------------------------------------------------------
# fixed-window token chunking


def _chunk_empty(id_col: str) -> pa.Table:
    return pa.table(
        {
            id_col: pa.array([], type=pa.int64()),
            "chunk_idx": pa.array([], type=pa.int64()),
            "n_chunk_tokens": pa.array([], type=pa.int64()),
            "chunk_text": pa.array([], type=pa.string()),
        }
    )


def chunk_arrays(ft, window: int):
    """Shared window-chunking kernel over a non-empty flat-token view:
    → (row_rep, chunk_idx, (starts, ends), chunk_text).  The chunk
    slices tile the flat token array exactly (consecutive rows are
    contiguous, empty rows contribute no gap), so one re-offset
    ListArray + ``pc.binary_join`` builds every chunk string with no
    per-row Python.  Consumers: :func:`chunk_tokens` and
    paradedup.within_doc_dedup."""
    counts = ft.counts
    n_chunks = -(-counts // window)  # ceil; 0-token rows -> 0 chunks
    row_rep = np.repeat(np.arange(ft.n), n_chunks)
    cum_chunks = np.cumsum(n_chunks)
    total_chunks = int(cum_chunks[-1])
    chunk_idx = np.arange(total_chunks) - np.repeat(cum_chunks - n_chunks, n_chunks)
    row_starts = np.cumsum(counts) - counts
    starts = row_starts[row_rep] + chunk_idx * window
    ends = np.minimum(starts + window, (row_starts + counts)[row_rep])
    offsets = np.append(starts, len(ft.flat)).astype(np.int32)
    lists = pa.ListArray.from_arrays(pa.array(offsets), ft.flat)
    chunk_text = pc.binary_join(lists, " ")
    return row_rep, chunk_idx, (starts, ends), chunk_text


def chunk_tokens(
    ds: rd.Dataset,
    window: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> rd.Dataset:
    """Split each row's whitespace tokens into consecutive windows of
    ``window`` tokens (last window ragged); rows with no tokens emit no
    chunks.  Output: (id, chunk_idx, n_chunk_tokens, chunk_text) with
    chunk_text = the window's tokens joined by a single space.

    Vectorized end-to-end: the flat token array from the audited
    tokenizer is re-offsetted into a chunk ListArray (chunk slices tile
    the flat array exactly — consecutive rows are contiguous and empty
    rows contribute no gap), then one ``pc.binary_join`` builds every
    chunk string.
    """
    if window <= 0:
        raise ValueError(f"window must be positive, got {window}")
    empty = _chunk_empty(id_col)

    def _chunk(batch: pa.Table) -> pa.Table:
        ft = tokens_flat(batch[text_col], lower=False)
        if ft.n == 0 or len(ft.flat) == 0:
            return empty
        row_rep, chunk_idx, lengths, chunk_text = chunk_arrays(ft, window)
        starts, ends = lengths  # kept as (starts, ends) for n_chunk_tokens
        ids = batch[id_col].to_numpy(zero_copy_only=False)[row_rep]
        return pa.table(
            {
                id_col: pa.array(ids, type=pa.int64()),
                "chunk_idx": pa.array(chunk_idx.astype(np.int64)),
                "n_chunk_tokens": pa.array((ends - starts).astype(np.int64)),
                "chunk_text": chunk_text,
            }
        )

    return ds.map_batches(_chunk, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# greedy sequence packing


def _pack_empty(id_col: str) -> pa.Table:
    return pa.table(
        {
            id_col: pa.array([], type=pa.int64()),
            "part": pa.array([], type=pa.int64()),
            "bin_seq": pa.array([], type=pa.int64()),
            "n_tokens": pa.array([], type=pa.int64()),
            "bin_offset": pa.array([], type=pa.int64()),
        }
    )


def _pack_group(group: pa.Table, id_col: str, capacity: int) -> pa.Table:
    """Greedy first-fit-in-id-order packing of one partition.

    Documents are taken in ascending id order; each bin absorbs
    documents while its token total stays ≤ capacity; a document that
    alone exceeds capacity still gets its own (oversized) bin.  The
    scan is O(bins · log rows): one searchsorted per bin over the
    cumulative token counts.
    """
    ids = group[id_col].to_numpy(zero_copy_only=False)
    n = group["n_tokens"].to_numpy(zero_copy_only=False)
    order = np.argsort(ids, kind="stable")
    ids, n = ids[order], n[order]
    cum = np.cumsum(n)
    bins = np.empty(len(n), dtype=np.int64)
    bin_base = np.empty(len(n), dtype=np.int64)
    start, base, seq = 0, 0, 0
    while start < len(n):
        j = int(np.searchsorted(cum, base + capacity, side="right"))
        if j <= start:  # oversized document: own bin
            j = start + 1
        bins[start:j] = seq
        bin_base[start:j] = base
        base = int(cum[j - 1])
        start = j
        seq += 1
    part = group["part"].to_numpy(zero_copy_only=False)[order]
    return pa.table(
        {
            id_col: pa.array(ids, type=pa.int64()),
            "part": pa.array(part, type=pa.int64()),
            "bin_seq": pa.array(bins),
            "n_tokens": pa.array(n, type=pa.int64()),
            "bin_offset": pa.array(cum - n - bin_base),
        }
    )


def pack_greedy(
    ds: rd.Dataset,
    capacity: int,
    id_col: str = "doc_id",
    count_col: str = "n_tokens",
    part_span: int = 1 << 20,
) -> rd.Dataset:
    """Greedy sequence packing: assign each row to a (part, bin_seq)
    bin of at most ``capacity`` tokens, first-fit in ascending id order
    within deterministic id-range partitions (``part = id //
    part_span``).  ``bin_offset`` is the row's token offset inside its
    packed sequence.

    Input needs ``id_col`` + ``count_col`` (integer token counts);
    project upstream.  Only those two narrow columns shuffle.  The
    partition span is the documented sequential scope: bins never span
    partitions, so packing is reproducible regardless of block layout,
    and a 100-TB run packs every partition in parallel.
    """
    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    if part_span <= 0:
        raise ValueError(f"part_span must be positive, got {part_span}")
    empty = _pack_empty(id_col)

    def _key(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: pa.array(ids, type=pa.int64()),
                "part": pa.array(
                    (ids // part_span).astype(np.int64), type=pa.int64()
                ),
                "n_tokens": pa.array(
                    batch[count_col].to_numpy(zero_copy_only=False).astype(np.int64)
                ),
            }
        )

    keyed = ds.map_batches(_key, batch_format="pyarrow")
    return map_groups_typed(
        keyed, "part", lambda g: _pack_group(g, id_col, capacity), empty
    )


# ---------------------------------------------------------------------------
# deterministic global ordering (distributed zipWithIndex)


def global_rank(
    ds: rd.Dataset,
    id_col: str = "doc_id",
    n_buckets: int = 256,
) -> rd.Dataset:
    """Deterministic global rank of every row under the
    content-independent shuffle order ``(md5_u32(id), id)`` — the
    reproducible training-order shuffle.  Output: (id, rank), rank in
    [0, n).

    Two passes over the narrow (id, key, bucket) projection (the lazy
    input re-executes; the md5 key is deterministic so both passes see
    identical keys): pass 1 is a bucket-count groupby whose result —
    ≤ ``n_buckets`` rows — is the only driver materialization; pass 2
    ranks within buckets (bucket = key's top bits, so bucket order is
    a prefix of key order) and adds the driver-prefix-summed bucket
    offset.  No global sort of the full table.
    """
    if not 1 <= n_buckets <= 1 << 16:
        raise ValueError(f"n_buckets must be in [1, 65536], got {n_buckets}")
    shift = 32 - int(np.log2(n_buckets)) if n_buckets > 1 else 32
    if n_buckets != (1 << (32 - shift)) and n_buckets != 1:
        raise ValueError(f"n_buckets must be a power of two, got {n_buckets}")

    def _key(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        key = md5_u32_of_int_ids(ids)
        if n_buckets == 1:  # >> 32 on uint32 is undefined in numpy
            bucket = np.zeros(len(key), dtype=np.int64)
        else:
            bucket = (key >> np.uint32(shift)).astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(ids, type=pa.int64()),
                "shuffle_key": pa.array(key.astype(np.int64), type=pa.int64()),
                "bucket": pa.array(bucket, type=pa.int64()),
            }
        )

    keyed = ds.map_batches(_key, batch_format="pyarrow")

    counts = {
        int(r["bucket"]): int(r["count()"])
        for r in keyed.groupby("bucket").aggregate(Count()).take_all()
    }
    offsets = np.zeros(n_buckets + 1, dtype=np.int64)
    for b, c in counts.items():
        offsets[b + 1] = c
    offsets = np.cumsum(offsets)

    empty = pa.table(
        {
            id_col: pa.array([], type=pa.int64()),
            "rank": pa.array([], type=pa.int64()),
        }
    )

    def _rank(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_numpy(zero_copy_only=False)
        key = group["shuffle_key"].to_numpy(zero_copy_only=False)
        bucket = int(group["bucket"][0].as_py())
        order = np.lexsort((ids, key))
        rank = np.empty(len(ids), dtype=np.int64)
        rank[order] = offsets[bucket] + np.arange(len(ids), dtype=np.int64)
        return pa.table(
            {
                id_col: pa.array(ids, type=pa.int64()),
                "rank": pa.array(rank),
            }
        )

    return map_groups_typed(keyed, "bucket", _rank, empty)
