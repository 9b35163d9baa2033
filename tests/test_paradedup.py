"""paragraph_dedup / dedup_units_keep_first / dedup_exact_bytes:
truth vs a naive per-row reference, edges, block-layout independence."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from simhash_ray.stages.collapse import dedup_exact_bytes
from simhash_ray.stages.paradedup import (
    dedup_units_keep_first,
    explode_separator,
    paragraph_dedup,
    within_doc_dedup,
)


def _doc_df(rng, n, n_words=6, max_len=40):
    words = np.array(
        ["alpha", "Beta", "g", "delta42", "ee", "zz", "qq", "x1"][:n_words],
        dtype=object,
    )
    texts = [
        " ".join(rng.choice(words, rng.integers(0, max_len)))
        + (" " if rng.random() < 0.3 else "")
        for _ in range(n)
    ]
    texts[0] = ""
    texts[1] = "   "
    # plant exact duplicate docs (all their chunks collide)
    for i in range(2, min(n, 20), 4):
        texts[i] = texts[n - 1 - i]
    return pd.DataFrame(
        {"doc_id": np.arange(n, dtype=np.int64) * 3 + 5, "text": texts}
    )


def _naive_window(df, window, sep=" "):
    seen = set()
    rows = []
    for doc_id, text in sorted(zip(df["doc_id"], df["text"])):
        toks = text.split()
        kept = []
        for i in range(0, len(toks), window):
            piece = " ".join(toks[i : i + window])
            if piece not in seen:
                seen.add(piece)
                kept.append(piece)
        rows.append((doc_id, sep.join(kept), len(kept)))
    return pd.DataFrame(rows, columns=["doc_id", "text", "n_kept"])


def _naive_sep(df, sep):
    seen = set()
    rows = []
    for doc_id, text in sorted(zip(df["doc_id"], df["text"])):
        kept = []
        for unit in text.split(sep):
            if unit not in seen:
                seen.add(unit)
                kept.append(unit)
        rows.append((doc_id, sep.join(kept), len(kept)))
    return pd.DataFrame(rows, columns=["doc_id", "text", "n_kept"])


def _run(ds):
    return (
        ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    )


def test_window_mode_matches_naive():
    rng = np.random.default_rng(7)
    df = _doc_df(rng, 300)
    out = _run(paragraph_dedup(rd.from_pandas(df).repartition(9), window=5))
    want = _naive_window(df, 5).sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, want, check_dtype=False)


def test_window_mode_block_layout_independent():
    rng = np.random.default_rng(11)
    df = _doc_df(rng, 200)
    a = _run(paragraph_dedup(rd.from_pandas(df).repartition(1), window=4))
    b = _run(paragraph_dedup(rd.from_pandas(df).repartition(17), window=4))
    pd.testing.assert_frame_equal(a, b)


def test_separator_mode_matches_naive():
    rng = np.random.default_rng(13)
    base = _doc_df(rng, 150)
    # build multi-paragraph texts, duplicating paragraphs across docs
    paras = [t or "empty" for t in base["text"][:40]]
    texts = [
        "\n".join(
            paras[j % len(paras)]
            for j in range(i, i + rng.integers(1, 5))
        )
        for i in range(150)
    ]
    texts[0] = ""  # splits to one empty unit
    df = pd.DataFrame({"doc_id": base["doc_id"], "text": texts})
    out = _run(paragraph_dedup(rd.from_pandas(df).repartition(7), sep="\n"))
    want = _naive_sep(df, "\n").sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, want, check_dtype=False)


def _naive_window_none(df, window, sep=" "):
    from collections import Counter

    counts = Counter()
    for text in df["text"]:
        toks = text.split()
        for i in range(0, len(toks), window):
            counts[" ".join(toks[i : i + window])] += 1
    rows = []
    for doc_id, text in sorted(zip(df["doc_id"], df["text"])):
        toks = text.split()
        kept = [
            " ".join(toks[i : i + window])
            for i in range(0, len(toks), window)
            if counts[" ".join(toks[i : i + window])] == 1
        ]
        rows.append((doc_id, sep.join(kept), len(kept)))
    return pd.DataFrame(rows, columns=["doc_id", "text", "n_kept"])


def test_keep_none_matches_naive():
    rng = np.random.default_rng(29)
    df = _doc_df(rng, 250)
    out = _run(
        paragraph_dedup(rd.from_pandas(df).repartition(9), window=5, keep="none")
    )
    want = (
        _naive_window_none(df, 5).sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, want, check_dtype=False)
    # the conservative rule keeps strictly no more than keep-first
    first = _run(paragraph_dedup(rd.from_pandas(df).repartition(9), window=5))
    assert (out["n_kept"] <= first["n_kept"]).all()


def test_keep_first_survivor_set():
    # duplicates within one doc AND across docs; min (id, ord) survives
    units = pd.DataFrame(
        {
            "doc_id": np.array([9, 9, 5, 5, 7], dtype=np.int64),
            "chunk_idx": np.array([0, 1, 0, 1, 0], dtype=np.int64),
            "chunk_text": ["x", "x", "x", "y", "y"],
        }
    )
    out = (
        dedup_units_keep_first(rd.from_pandas(units).repartition(3))
        .to_pandas()
        .sort_values(["chunk_text"])
        .reset_index(drop=True)
    )
    want = pd.DataFrame(
        {"doc_id": [5, 5], "chunk_idx": [0, 1], "chunk_text": ["x", "y"]}
    )
    pd.testing.assert_frame_equal(out, want, check_dtype=False)


def test_explode_separator_empty_text_yields_one_empty_unit():
    df = pd.DataFrame({"doc_id": np.array([1], dtype=np.int64), "text": [""]})
    out = explode_separator(rd.from_pandas(df), "\n").to_pandas()
    assert out.to_dict("list") == {
        "doc_id": [1],
        "chunk_idx": [0],
        "chunk_text": [""],
    }


def test_all_empty_docs_survive_as_empty_rows():
    df = pd.DataFrame(
        {"doc_id": np.arange(5, dtype=np.int64), "text": [""] * 5}
    )
    out = _run(paragraph_dedup(rd.from_pandas(df).repartition(3), window=4))
    assert out["doc_id"].tolist() == list(range(5))
    assert (out["text"] == "").all() and (out["n_kept"] == 0).all()


def test_dedup_exact_bytes_matches_naive():
    rng = np.random.default_rng(23)
    payloads = [rng.bytes(rng.integers(1, 200)) for _ in range(40)]
    blobs = [payloads[rng.integers(0, 40)] for _ in range(500)]
    ids = [f"img{i:04d}" for i in range(500)]
    t = pa.table(
        {"image_id": pa.array(ids), "bytes": pa.array(blobs, type=pa.binary())}
    )
    out = (
        dedup_exact_bytes(rd.from_arrow(t).repartition(11))
        .to_pandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    first = {}
    for i, b in sorted(zip(ids, blobs)):
        first.setdefault(b, i)
    want = pd.DataFrame(
        {
            "image_id": ids,
            "rep_id": [first[b] for b in blobs],
        }
    ).sort_values("image_id").reset_index(drop=True)
    want["is_rep"] = want["image_id"] == want["rep_id"]
    pd.testing.assert_frame_equal(out, want, check_dtype=False)
    assert out["is_rep"].sum() == len({b for b in blobs})


def _naive_within(text, sep=None, window=None):
    if sep is not None:
        units = (text or "").split(sep)
    else:
        toks = (text or "").split()
        units = [
            " ".join(toks[i : i + window]) for i in range(0, len(toks), window)
        ]
    seen, kept = set(), []
    for u in units:
        if u not in seen:
            seen.add(u)
            kept.append(u)
    join = sep if sep is not None else " "
    return join.join(kept), len(kept), len(units) - len(kept)


def test_within_doc_dedup_matches_naive_both_modes():
    rng = np.random.default_rng(31)
    words = np.array(["aa", "bb", "cc", "dd"], dtype=object)
    texts = [
        " ".join(rng.choice(words, rng.integers(0, 14))) for _ in range(300)
    ]
    texts += ["", None, "aa", "aa aa aa aa", "aa bb\naa bb\ncc"]
    df = pd.DataFrame(
        {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
    )
    for kw in ({"sep": "\n"}, {"window": 2}, {"window": 3}):
        out = (
            within_doc_dedup(rd.from_pandas(df).repartition(7), **kw)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        for i, t in enumerate(texts):
            wt, wk, wd = _naive_within(t, **kw)
            assert out.loc[i, "text"] == wt, (kw, i, t)
            assert out.loc[i, "n_kept"] == wk
            assert out.loc[i, "n_dropped"] == wd


def test_within_doc_dedup_rejects_bad_args():
    import pytest

    df = pd.DataFrame({"doc_id": [0], "text": ["x"]})
    with pytest.raises(ValueError):
        within_doc_dedup(rd.from_pandas(df))
    with pytest.raises(ValueError):
        within_doc_dedup(rd.from_pandas(df), sep="\n", window=2)
