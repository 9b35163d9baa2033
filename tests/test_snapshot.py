"""corpus_diff: naive-reference equivalence, edge snapshots, duplicate
guard, partition invariance."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from simhash_ray.stages.snapshot import corpus_diff


def _snap(ids, texts):
    return pd.DataFrame({"doc_id": np.asarray(ids, dtype=np.int64), "text": texts})


def _naive(old, new):
    o = dict(zip(old["doc_id"], old["text"]))
    n = dict(zip(new["doc_id"], new["text"]))
    out = {}
    for i in set(o) | set(n):
        if i not in o:
            out[i] = "added"
        elif i not in n:
            out[i] = "removed"
        else:
            out[i] = "unchanged" if o[i] == n[i] else "changed"
    return out


def _run(old, new, parts=(3, 5)):
    return corpus_diff(
        rd.from_pandas(old).repartition(parts[0]),
        rd.from_pandas(new).repartition(parts[1]),
        n_parts=8,
    ).to_pandas()


def test_diff_matches_naive_random():
    rng = np.random.default_rng(2)
    old = _snap(range(200), [f"t{rng.integers(0, 50)}" for _ in range(200)])
    keep = rng.random(200) > 0.2
    new = old[keep].copy()
    flip = rng.random(len(new)) > 0.7
    new.loc[flip, "text"] = new.loc[flip, "text"] + "x"
    adds = _snap(range(500, 540), [f"a{i}" for i in range(40)])
    new = pd.concat([new, adds], ignore_index=True)
    got = _run(old, new)
    want = _naive(old, new)
    assert dict(zip(got["doc_id"], got["status"])) == want
    # partition layout must not matter
    got2 = _run(old, new, parts=(11, 2))
    assert dict(zip(got2["doc_id"], got2["status"])) == want


def test_diff_edge_snapshots():
    old = _snap([1, 2], ["a", "b"])
    empty = _snap([], [])
    all_removed = _run(old, empty)
    assert set(all_removed["status"]) == {"removed"} and len(all_removed) == 2
    all_added = _run(empty, old)
    assert set(all_added["status"]) == {"added"} and len(all_added) == 2


def test_diff_duplicate_id_raises():
    old = _snap([1, 1], ["a", "b"])
    new = _snap([1], ["a"])
    with pytest.raises(Exception, match="duplicate|more than twice"):
        _run(old, new)
