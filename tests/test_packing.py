"""chunk_tokens / pack_greedy / global_rank: truth, invariants, edges,
block-layout independence."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from simhash_ray.functions.hashing import md5_u32_of_int_ids
from simhash_ray.stages.packing import chunk_tokens, global_rank, pack_greedy


def _doc_df(rng, n):
    words = np.array(["alpha", "Beta", "g", "delta42", "ee", "zz"], dtype=object)
    texts = [
        " ".join(rng.choice(words, rng.integers(0, 40)))
        + (" " if rng.random() < 0.3 else "")
        for _ in range(n)
    ]
    texts[0] = ""  # empty doc
    texts[1] = "   "  # whitespace-only doc
    return pd.DataFrame(
        {"doc_id": np.arange(n, dtype=np.int64) * 3 + 5, "text": texts}
    )


# ---------------------------------------------------------------------------
# chunk_tokens


def test_chunks_match_naive_and_reassemble():
    rng = np.random.default_rng(3)
    df = _doc_df(rng, 400)
    w = 7
    out = (
        chunk_tokens(rd.from_pandas(df).repartition(9), window=w)
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )
    # naive per-row truth
    want_rows = []
    for doc_id, text in zip(df["doc_id"], df["text"]):
        toks = text.split()
        for i in range(0, len(toks), w):
            piece = toks[i : i + w]
            want_rows.append((doc_id, i // w, len(piece), " ".join(piece)))
    want = pd.DataFrame(
        want_rows, columns=["doc_id", "chunk_idx", "n_chunk_tokens", "chunk_text"]
    ).sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
    want["doc_id"] = want["doc_id"].astype(np.int64)
    want["chunk_idx"] = want["chunk_idx"].astype(np.int64)
    want["n_chunk_tokens"] = want["n_chunk_tokens"].astype(np.int64)
    pd.testing.assert_frame_equal(out, want)
    # reassembly: chunks of a doc joined = normalized text
    re = out.groupby("doc_id")["chunk_text"].apply(" ".join)
    for doc_id, text in zip(df["doc_id"], df["text"]):
        if text.split():
            assert re[doc_id] == " ".join(text.split())
        else:
            assert doc_id not in re.index


def test_chunks_all_full_except_last():
    df = pd.DataFrame({"doc_id": [1], "text": ["a b c d e f g h i j k"]})
    out = chunk_tokens(rd.from_pandas(df), window=4).to_pandas()
    assert list(out["n_chunk_tokens"]) == [4, 4, 3]
    assert list(out["chunk_idx"]) == [0, 1, 2]


def test_chunks_window_validation():
    with pytest.raises(ValueError):
        chunk_tokens(rd.from_pandas(pd.DataFrame({"doc_id": [], "text": []})), 0)


# ---------------------------------------------------------------------------
# pack_greedy


def _naive_pack(df, capacity, part_span):
    rows = []
    df = df.assign(part=df["doc_id"] // part_span).sort_values("doc_id")
    for part, g in df.groupby("part"):
        seq, filled, docs = 0, 0, 0
        for doc_id, n in zip(g["doc_id"], g["n_tokens"]):
            # a NON-EMPTY bin closes when the next doc would overflow —
            # counting docs, not tokens: a bin holding only zero-token
            # docs still closes (matches the engine's cumsum boundary)
            if docs > 0 and filled + n > capacity:
                seq, filled, docs = seq + 1, 0, 0
            rows.append((doc_id, part, seq, n, filled))
            filled += n
            docs += 1
    return pd.DataFrame(
        rows, columns=["doc_id", "part", "bin_seq", "n_tokens", "bin_offset"]
    )


def test_pack_matches_naive_and_invariants():
    rng = np.random.default_rng(11)
    n = 600
    df = pd.DataFrame(
        {
            "doc_id": rng.permutation(np.arange(n, dtype=np.int64) * 2 + 1),
            "n_tokens": rng.integers(0, 40, n).astype(np.int64),
        }
    )
    df.loc[5, "n_tokens"] = 500  # oversized: must land alone in its own bin
    cap, span = 64, 100
    out = (
        pack_greedy(rd.from_pandas(df).repartition(7), cap, part_span=span)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = (
        _naive_pack(df, cap, span).sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        out.astype({"bin_seq": np.int64, "bin_offset": np.int64}), want
    )
    # invariants: bin totals <= capacity unless singleton
    per_bin = out.groupby(["part", "bin_seq"])["n_tokens"].agg(["sum", "count"])
    over = per_bin[per_bin["sum"] > cap]
    assert (over["count"] == 1).all()
    # offsets tile each bin
    chk = out.sort_values(["part", "bin_seq", "doc_id"])
    for (_, _), g in chk.groupby(["part", "bin_seq"]):
        assert list(g["bin_offset"]) == list(
            np.cumsum(g["n_tokens"]) - g["n_tokens"]
        )


def test_pack_layout_independent():
    rng = np.random.default_rng(4)
    df = pd.DataFrame(
        {
            "doc_id": np.arange(300, dtype=np.int64),
            "n_tokens": rng.integers(1, 30, 300).astype(np.int64),
        }
    )
    a = (
        pack_greedy(rd.from_pandas(df).repartition(2), 50, part_span=64)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        pack_greedy(rd.from_pandas(df).repartition(23), 50, part_span=64)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_pack_validation():
    ds = rd.from_pandas(pd.DataFrame({"doc_id": [1], "n_tokens": [2]}))
    with pytest.raises(ValueError):
        pack_greedy(ds, 0)
    with pytest.raises(ValueError):
        pack_greedy(ds, 10, part_span=0)


# ---------------------------------------------------------------------------
# global_rank


def test_global_rank_matches_lexsort():
    ids = np.random.default_rng(9).permutation(
        np.arange(2000, dtype=np.int64) * 7 + 3
    )
    out = (
        global_rank(rd.from_pandas(pd.DataFrame({"doc_id": ids})).repartition(11))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    key = md5_u32_of_int_ids(np.sort(ids))
    want_rank = np.empty(len(ids), dtype=np.int64)
    want_rank[np.lexsort((np.sort(ids), key))] = np.arange(len(ids))
    assert list(out["doc_id"]) == list(np.sort(ids))
    assert list(out["rank"]) == list(want_rank)
    # permutation of [0, n)
    assert sorted(out["rank"]) == list(range(len(ids)))


def test_global_rank_validation():
    ds = rd.from_pandas(pd.DataFrame({"doc_id": [1]}))
    with pytest.raises(ValueError):
        global_rank(ds, n_buckets=0)
    with pytest.raises(ValueError):
        global_rank(ds, n_buckets=200)  # not a power of two
