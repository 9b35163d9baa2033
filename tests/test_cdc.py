"""Content-defined chunking: batch kernel vs per-row rolling reference,
insertion robustness (the property fixed-window chunking lacks),
dedup-stat correctness vs a brute-force pandas oracle."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from simhash_ray.stages.cdc import (
    cdc_chunk_table,
    cdc_dedup_stats,
    chunk_boundaries_ref,
    chunk_spans_flat,
)


def _spans_via_kernel(rows: list[bytes], mask_bits: int):
    data = np.frombuffer(b"".join(rows), dtype=np.uint8)
    offsets = np.zeros(len(rows) + 1, dtype=np.int64)
    np.cumsum([len(r) for r in rows], out=offsets[1:])
    return chunk_spans_flat(data, offsets, mask_bits)


def test_kernel_matches_rolling_reference():
    rng = np.random.default_rng(0)
    rows = []
    for n in [0, 1, 2, 63, 64, 65, 200, 1000]:
        rows.append(rng.integers(0, 256, size=n, dtype=np.uint8).tobytes())
    # low-entropy rows: repeated bytes exercise dense/absent cut regimes
    rows += [b"a" * 300, b"ab" * 150, bytes(range(64)) * 4]
    ridx, starts, ends = _spans_via_kernel(rows, mask_bits=4)
    for r, row in enumerate(rows):
        bounds = chunk_boundaries_ref(row, 4)
        sel = ridx == r
        base = sum(len(x) for x in rows[:r])
        got = list(zip((starts[sel] - base).tolist(), (ends[sel] - base).tolist()))
        want = list(zip(bounds[:-1], bounds[1:]))
        if not want:  # empty row -> one empty chunk
            want = [(0, 0)]
        assert got == want, (r, got, want)


def test_seeded_fuzz_vs_reference():
    rng = np.random.default_rng(7)
    for trial in range(200):
        n_rows = int(rng.integers(1, 8))
        rows = [
            rng.integers(0, 256, size=int(rng.integers(0, 150)), dtype=np.uint8)
            .tobytes()
            for _ in range(n_rows)
        ]
        ridx, starts, ends = _spans_via_kernel(rows, mask_bits=3)
        base = 0
        for r, row in enumerate(rows):
            bounds = chunk_boundaries_ref(row, 3)
            sel = ridx == r
            got = list(
                zip((starts[sel] - base).tolist(), (ends[sel] - base).tolist())
            )
            want = list(zip(bounds[:-1], bounds[1:])) or [(0, 0)]
            assert got == want, (trial, r)
            base += len(row)


def test_insertion_robustness():
    """One inserted byte re-chunks only the neighbourhood of the edit:
    chunks strictly after the first cut past the edit are identical —
    the whole point of CDC over fixed windows."""
    rng = np.random.default_rng(3)
    doc = rng.integers(0, 256, size=4000, dtype=np.uint8).tobytes()
    edited = doc[:100] + b"X" + doc[100:]

    def chunk_set(row):
        b = chunk_boundaries_ref(row, 5)
        return {row[s:e] for s, e in zip(b[:-1], b[1:])}

    a, b = chunk_set(doc), chunk_set(edited)
    # the vast majority of chunks survive the edit byte-identically
    assert len(a & b) / len(a) > 0.8


def test_dedup_stats_vs_bruteforce(ray_session):
    rng = np.random.default_rng(11)
    base = rng.integers(97, 123, size=600, dtype=np.uint8).tobytes().decode()
    texts = [
        base,                      # doc 0: owner of everything
        base,                      # doc 1: exact dup of 0
        base[:300] + "Q" + base[300:],  # doc 2: near dup (1 insert)
        "".join(chr(c) for c in rng.integers(97, 123, size=500)),  # fresh
        "",                        # empty doc: one empty chunk
    ]
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                "text": pa.array(texts, type=pa.string()),
            }
        )
    ).repartition(3)
    out = cdc_dedup_stats(docs, mask_bits=4).to_pandas()

    # brute-force oracle over the (tested-above) chunk table
    ct = cdc_chunk_table(docs, mask_bits=4, with_content=True).to_pandas()
    ct = ct.sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
    seen = {}
    dup = []
    for _, r in ct.iterrows():
        k = r["chunk"]
        dup.append(k in seen)
        seen.setdefault(k, (r["doc_id"], r["chunk_idx"]))
    ct["dup"] = dup
    want = (
        ct.groupby("doc_id")
        .agg(
            n_chunks=("chunk_idx", "size"),
            n_dup_chunks=("dup", "sum"),
            dup_bytes=("chunk_len", lambda s: int(s[ct.loc[s.index, "dup"]].sum())),
        )
        .reset_index()
    )
    got = out.sort_values("doc_id").reset_index(drop=True)
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["n_chunks"].tolist() == want["n_chunks"].tolist()
    assert got["n_dup_chunks"].tolist() == want["n_dup_chunks"].tolist()
    assert got["dup_bytes"].tolist() == want["dup_bytes"].tolist()
    # doc 1 is a byte-identical dup: every chunk is a dup
    row1 = got[got["doc_id"] == 1].iloc[0]
    assert row1["n_dup_chunks"] == row1["n_chunks"]
    # doc 2 (single insertion) still dedups most of its bytes
    row2 = got[got["doc_id"] == 2].iloc[0]
    assert row2["dup_bytes"] > 0.5 * len(texts[2])


def test_null_text_raises(ray_session):
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1], type=pa.int64()),
                "text": pa.array([None], type=pa.string()),
            }
        )
    )
    with pytest.raises(Exception, match="null"):
        cdc_chunk_table(docs, mask_bits=4).to_pandas()


def test_string_ids_preserved(ray_session):
    docs = rd.from_arrow(
        pa.table(
            {
                "image_id": pa.array(["b", "a", "c"], type=pa.string()),
                "caption": pa.array(["x y z w", "x y z w", "q r"], type=pa.string()),
            }
        )
    )
    out = cdc_dedup_stats(
        docs, mask_bits=3, text_col="caption", id_col="image_id"
    ).to_pandas()
    assert out["doc_id"].tolist() == ["a", "b", "c"]
    # 'a' precedes 'b' lexicographically -> b's chunks are all dups of a's
    assert out.set_index("doc_id").loc["b", "n_dup_chunks"] == \
        out.set_index("doc_id").loc["b", "n_chunks"]
    assert out.set_index("doc_id").loc["a", "n_dup_chunks"] == 0
