"""Content-defined chunking (CDC) dedup — gear rolling hash.

Fixed-window chunking misses every duplicate after a single-byte
insertion (all downstream windows shift); CDC cuts where the CONTENT
says to, so an edit perturbs only the chunks it touches and the rest
of a near-duplicate document still dedups exactly — the storage/corpus
dedup technique behind LBFS/FastCDC, applied here to training-corpus
text at the byte level.

Semantics (deterministic, pinned per-row in tests/test_cdc.py):
  h_j = ((h_{j-1} << 1) + GEAR[b_j]) mod 2^64        (gear rolling hash)
  cut AFTER byte j when (h_j & mask) == 0 and j is not the row's last
  byte; chunks are the spans between cuts.  No min/max normalization —
  the cut rule is pure content, so equal byte runs chunk identically
  wherever they appear.  The hash rolls across the whole row (no reset
  at cuts) and never across rows.

Because ``<< 1`` ages a byte out of the hash after 64 steps, h_j equals
the 64-byte windowed sum  sum_{k<64} GEAR[b_{j-k}] << k  — which the
batch kernel computes as 64 shifted vector adds over a zero-padded flat
buffer (63 zero-gear pad bytes between rows keep windows from crossing
row boundaries), zero-copy off the Arrow string column's own data
buffer.  Chunk contents are never materialized as Python objects in
the span kernel; the chunk column is rebuilt zero-copy from the same
data buffer via ``Array.from_buffers``.

Scale: the chunk table is ~bytes/2^mask_bits narrow rows (id, idx,
len, u64 hash ≈ 32 B); dup-marking is one hash-partitioned groupby
over it and the per-doc rollup is a second narrow groupby with
in-batch partial pre-aggregation — no driver-side materialization
anywhere.  At 100 TB use mask_bits≈13 (8 KiB avg chunks) so the chunk
table is ~0.4% of corpus bytes.

Reference analogue: the reference engine has no CDC; this extends the
dedup tier (SURVEY.md §2.5 exact-dedup family) with the
insertion-robust exact operator a training-data pipeline needs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..functions.hashing import hash_strings
from ..simhash import _splitmix64_np

# Deterministic gear table: splitmix64 of a domain-separated index.
_GEAR = _splitmix64_np(
    np.arange(256, dtype=np.uint64) + np.uint64(0xCDC0_0001_0000_0000)
)

_PAD = 63  # window length - 1: zero-gear gap that isolates rows


def _ranges(counts: np.ndarray) -> np.ndarray:
    """concat(arange(c) for c in counts), vectorized."""
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    starts = np.zeros(len(counts), dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    return np.arange(total, dtype=np.int64) - np.repeat(starts, counts)


def chunk_spans_flat(
    data: np.ndarray, offsets: np.ndarray, mask_bits: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Chunk spans for n rows packed in one uint8 buffer.

    ``data`` is the flat byte buffer, ``offsets`` (int64, n+1) the
    absolute row boundaries within it (an Arrow binary column's own
    buffers).  Returns (row_idx, start, end) per chunk with start/end
    ABSOLUTE into ``data``; chunks tile each row in order, so the
    returned spans are globally contiguous and non-overlapping.
    """
    mask = np.uint64((1 << mask_bits) - 1)
    n = len(offsets) - 1
    lens = np.diff(offsets)
    total_in = int(lens.sum())
    padded_total = total_in + _PAD * n
    # scatter each row's gear values into the padded buffer
    prow = np.zeros(n, dtype=np.int64)  # padded start per row
    np.cumsum(lens[:-1] + _PAD, out=prow[1:])
    pidx = np.repeat(prow, lens) + _ranges(lens)
    G = np.zeros(padded_total, dtype=np.uint64)
    flat_rows = np.repeat(np.arange(n, dtype=np.int64), lens)
    G[pidx] = _GEAR[data[np.repeat(offsets[:-1], lens) + _ranges(lens)]]
    # 64-byte windowed sum == the rolling gear hash (see module doc)
    H = np.zeros(padded_total, dtype=np.uint64)
    for k in range(64):
        H[k:] += G[: padded_total - k] << np.uint64(k)
    hit_flat = (H[pidx] & mask) == 0
    # a cut after a row's LAST byte is a no-op (would make an empty tail)
    rel = _ranges(lens)
    hit_flat &= rel != np.repeat(lens, lens) - 1
    cut_rows = flat_rows[hit_flat]
    cut_rel = rel[hit_flat] + 1  # boundary sits after the hit byte
    # assemble per-row boundary lists: [0, cuts..., len]
    n_cuts = np.bincount(cut_rows, minlength=n).astype(np.int64)
    n_chunks = n_cuts + 1
    total_chunks = int(n_chunks.sum())
    chunk_row = np.repeat(np.arange(n, dtype=np.int64), n_chunks)
    within = _ranges(n_chunks)
    cut_base = np.zeros(n, dtype=np.int64)
    np.cumsum(n_cuts[:-1], out=cut_base[1:])
    starts_rel = np.zeros(total_chunks, dtype=np.int64)
    inner = within > 0
    starts_rel[inner] = cut_rel[cut_base[chunk_row[inner]] + within[inner] - 1]
    ends_rel = np.empty(total_chunks, dtype=np.int64)
    last = within == np.repeat(n_chunks, n_chunks) - 1
    ends_rel[~last] = cut_rel[cut_base[chunk_row[~last]] + within[~last]]
    ends_rel[last] = lens[chunk_row[last]]
    row_off = offsets[:-1][chunk_row]
    return chunk_row, row_off + starts_rel, row_off + ends_rel


def chunk_boundaries_ref(row: bytes, mask_bits: int) -> list[int]:
    """Per-row rolling reference (test pin): boundary offsets incl. 0
    and len(row)."""
    mask = (1 << mask_bits) - 1
    h = 0
    cuts = [0]
    for j, b in enumerate(row):
        h = ((h << 1) + int(_GEAR[b])) & 0xFFFFFFFFFFFFFFFF
        if (h & mask) == 0 and j != len(row) - 1:
            cuts.append(j + 1)
    cuts.append(len(row))
    return cuts


def _binary_buffers(col: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(data uint8, absolute int64 offsets) of a string/binary column,
    zero-copy, slice-offset-safe.  Shared by every zero-copy payload
    reader (cdc chunking, audio features); null rows are the caller's
    job to handle first."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    arr = col.cast(pa.large_binary())
    if arr.null_count:
        raise ValueError("null binary rows are not supported here")
    buffers = arr.buffers()
    offsets = np.frombuffer(buffers[1], dtype=np.int64)[
        arr.offset : arr.offset + len(arr) + 1
    ]
    data = (
        np.frombuffer(buffers[2], dtype=np.uint8)
        if buffers[2] is not None else np.empty(0, dtype=np.uint8)
    )
    return data, offsets


def cdc_chunk_table(
    docs: rd.Dataset,
    mask_bits: int = 6,
    text_col: str = "text",
    id_col: str = "doc_id",
    with_content: bool = False,
) -> rd.Dataset:
    """(doc_id, chunk_idx, chunk_len, chunk_hash[, chunk]) — one row
    per CDC chunk.  ``with_content`` additionally carries the chunk
    bytes (zero-copy view into the batch's own data buffer) — used
    only by the oracle-staging query; the scale path ships hashes."""

    def fn(batch: pa.Table) -> pa.Table:
        data, offsets = _binary_buffers(batch[text_col])
        rows, starts, ends = chunk_spans_flat(data, offsets, mask_bits)
        # rebuild the chunk column zero-copy: spans tile the buffer, so
        # concat(starts, last end) is a valid monotone offsets vector
        chunk_offsets = np.append(starts, ends[-1] if len(ends) else 0)
        chunks = pa.Array.from_buffers(
            pa.large_binary(),
            len(starts),
            [None, pa.py_buffer(chunk_offsets), pa.py_buffer(data)],
        )
        id_arr = batch[id_col]
        if isinstance(id_arr, pa.ChunkedArray):
            id_arr = id_arr.combine_chunks()
        out = {
            # carry the input id dtype through (string ids work — same
            # policy as stages/decontam after round-3 advice item 4)
            "doc_id": id_arr.take(pa.array(rows, type=pa.int64())),
            "chunk_idx": pa.array(
                _ranges(np.bincount(rows, minlength=len(offsets) - 1)),
                type=pa.int64(),
            ),
            "chunk_len": pa.array(ends - starts, type=pa.int64()),
            "chunk_hash": pa.array(
                hash_strings(chunks.to_numpy(zero_copy_only=False)).view(
                    np.int64
                ),
                type=pa.int64(),
            ),
        }
        if with_content:
            out["chunk"] = chunks
        return pa.table(out)

    return docs.select_columns([id_col, text_col]).map_batches(
        fn, batch_format="pyarrow"
    )


def _empty_marked(id_type: pa.DataType) -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array([], type=id_type),
            "n": pa.array([], type=pa.int64()),
            "n_dup": pa.array([], type=pa.int64()),
            "dup_bytes": pa.array([], type=pa.int64()),
        }
    )


def cdc_dedup_stats(
    docs: rd.Dataset,
    mask_bits: int = 6,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_parts: int = 64,
    chunk_ds: rd.Dataset | None = None,
) -> rd.Dataset:
    """Per-doc CDC dedup accounting: (doc_id, n_chunks, n_dup_chunks,
    dup_bytes).  An occurrence is a dup iff another occurrence of the
    same chunk hash precedes it in (doc_id, chunk_idx) order — the
    first-wins rule of the exact-dedup family, at chunk granularity.

    One hash-partitioned groupby marks dups (per-partition vectorized
    lexicographic-min; a hash's occurrences all land in one partition),
    then the per-doc rollup pre-aggregates inside each block before a
    narrow groupby-sum.  Pass ``chunk_ds`` to reuse an already-built
    chunk table (the oracle query stages one with content)."""
    from ray.data.aggregate import Sum

    from .base import map_groups_typed

    chunks = (
        cdc_chunk_table(docs, mask_bits, text_col, id_col)
        if chunk_ds is None
        else chunk_ds
    )
    def add_part(batch: pa.Table) -> pa.Table:
        part = (
            batch["chunk_hash"].to_numpy(zero_copy_only=False).view(np.uint64)
            % np.uint64(n_parts)
        ).astype(np.int32)
        return batch.append_column("part", pa.array(part, type=pa.int32()))

    chunks = chunks.map_batches(add_part, batch_format="pyarrow")

    id_type = chunks.schema().base_schema.field("doc_id").type

    def mark(block: pa.Table) -> pa.Table:
        h = block["chunk_hash"].to_numpy(zero_copy_only=False)
        d = block["doc_id"].to_numpy(zero_copy_only=False)
        i = block["chunk_idx"].to_numpy(zero_copy_only=False)
        ln = block["chunk_len"].to_numpy(zero_copy_only=False)
        order = np.lexsort((i, d, h))
        hs = h[order]
        first = np.ones(len(hs), dtype=bool)
        first[1:] = hs[1:] != hs[:-1]
        dup = np.empty(len(hs), dtype=bool)
        dup[order] = ~first
        # in-block partial per-doc rollup: the groupby downstream sums
        # a few rows per (block, doc) instead of one per chunk
        ud, inv = np.unique(d, return_inverse=True)
        return pa.table(
            {
                "doc_id": pa.array(ud, type=id_type),
                "n": pa.array(np.bincount(inv), type=pa.int64()),
                "n_dup": pa.array(
                    np.bincount(inv, weights=dup).astype(np.int64),
                    type=pa.int64(),
                ),
                "dup_bytes": pa.array(
                    np.bincount(inv, weights=ln * dup).astype(np.int64),
                    type=pa.int64(),
                ),
            }
        )

    marked = map_groups_typed(chunks, "part", mark, _empty_marked(id_type))
    agg = marked.groupby("doc_id").aggregate(
        Sum("n", alias_name="n_chunks"),
        Sum("n_dup", alias_name="n_dup_chunks"),
        Sum("dup_bytes", alias_name="dup_bytes"),
    )
    return agg.sort("doc_id")
