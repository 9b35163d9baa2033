"""Shared-substring dedup: planted copied-passage recall."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from simhash_ray.stages.substring import shared_substring_pairs


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(17)
    vocab = np.array([f"v{i:03d}" for i in range(900)])
    docs = [" ".join(rng.choice(vocab, 60)) for _ in range(200)]
    # plant: 40 docs copy a 20-token passage from a source doc into
    # otherwise-random text (a verbatim substring, the suffix-array case)
    planted = []
    for i in range(40):
        src_tokens = docs[i].split()
        passage = src_tokens[10:30]
        filler = list(rng.choice(vocab, 35))
        docs.append(" ".join(filler[:15] + passage + filler[15:]))
        planted.append((i, 200 + i))
    return pd.DataFrame(
        {"doc_id": np.arange(len(docs), dtype=np.int64), "text": docs}
    ), set(planted)


def test_planted_passages_found(corpus):
    df, planted = corpus
    out = shared_substring_pairs(
        rd.from_pandas(df), window=8, min_shared=3, n_parts=16
    ).to_pandas()
    found = set(zip(out["a"], out["b"]))
    assert planted <= found, f"missed {planted - found}"
    # a 20-token shared passage yields exactly 13 shared 8-windows
    sub = out.set_index(["a", "b"]).loc[list(planted)]
    assert (sub["n_shared"] == 13).all()
    # no random pair shares ≥3 windows in this corpus
    assert len(found - planted) == 0


def test_short_docs_no_windows():
    df = pd.DataFrame({"doc_id": [1, 2], "text": ["a b c", "a b c"]})
    out = shared_substring_pairs(rd.from_pandas(df), window=8).to_pandas()
    assert len(out) == 0


def test_hot_window_df_guard_matches_oracle():
    """Boilerplate windows (df > max_df) are excluded on BOTH the Ray
    and the SQL side: a 10-token blurb shared by 300 docs (> max_df
    256) produces zero pairs, while a genuine 2-doc shared passage
    survives — and the two engines agree exactly (the round-1 silent
    256-doc cap would have diverged here)."""
    import duckdb

    from simhash_ray.pipelines.queries import SQL_DOC_SUBSTRING_PAIRS

    rng = np.random.default_rng(3)
    vocab = np.array([f"v{i:03d}" for i in range(900)])
    # one hot 10-token passage = three 8-token windows, df=300 > 256
    boiler = " ".join(f"b{i}" for i in range(10))
    docs = [boiler + " " + " ".join(rng.choice(vocab, 30)) for _ in range(300)]
    # one genuine pair sharing the same-shape 10-token passage (df=2)
    passage = " ".join(f"p{i}" for i in range(10))
    docs.append(passage + " " + " ".join(rng.choice(vocab, 30)))
    docs.append(" ".join(rng.choice(vocab, 30)) + " " + passage)
    df = pd.DataFrame({"doc_id": np.arange(len(docs), dtype=np.int64), "text": docs})

    out = shared_substring_pairs(
        rd.from_pandas(df), window=8, min_shared=3, n_parts=8
    ).to_pandas()
    con = duckdb.connect()
    con.register("documents", df)
    oracle = con.execute(SQL_DOC_SUBSTRING_PAIRS).df()
    con.close()

    def canon(d):
        return sorted(map(tuple, d[["a", "b", "n_shared"]].to_numpy()))

    assert canon(out) == canon(oracle)
    assert set(zip(out["a"], out["b"])) == {(300, 301)}
    assert out["n_shared"].tolist() == [3]
