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
