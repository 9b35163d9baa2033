"""prefix_jaccard_pairs: exact set-similarity join via prefix
filtering — equality with the brute-force engine (the exactness claim)
across thresholds, corpora and verify paths; run-cap guard."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from simhash_ray.stages.minhash import all_pairs_jaccard
from simhash_ray.stages.ssjoin import prefix_jaccard_pairs


def _canon(df: pd.DataFrame) -> list:
    if df.empty and "a" not in df.columns:  # empty Dataset loses schema
        return []
    return sorted(map(tuple, df[["a", "b", "inter", "uni"]].to_numpy().tolist()))


def _corpus(seed: int, n: int = 150, vocab_n: int = 120, dups: int = 25):
    rng = np.random.default_rng(seed)
    vocab = [f"t{i}" for i in range(vocab_n)]
    rows = [
        " ".join(rng.choice(vocab, size=rng.integers(4, 28)))
        for _ in range(n)
    ]
    for i in range(dups):  # near-dups: one token edited
        toks = rows[i % n].split()
        toks[rng.integers(0, len(toks))] = f"edit{i}"
        rows.append(" ".join(toks))
    rows.append("")  # empty doc never pairs
    df = pd.DataFrame(
        {"doc_id": np.arange(len(rows), dtype=np.int64), "text": rows}
    )
    return rd.from_pandas(df).repartition(6)


@pytest.mark.parametrize("tn,td", [(9, 10), (7, 10), (1, 2), (1, 1)])
def test_equals_brute_force_across_thresholds(tn, td):
    ds = _corpus(seed=tn * 10 + td)
    fast = _canon(prefix_jaccard_pairs(ds, tn, td).to_pandas())
    ref = _canon(
        all_pairs_jaccard(ds, tn, td, use_token_sets=True).to_pandas()
    )
    assert fast == ref
    if (tn, td) != (1, 1):
        assert len(ref) > 0  # the scenario actually exercises pairs


def test_join_verify_path_equals_broadcast():
    ds = _corpus(seed=5)
    a = _canon(prefix_jaccard_pairs(ds, 7, 10).to_pandas())
    b = _canon(
        prefix_jaccard_pairs(
            ds, 7, 10, broadcast_limit=0, n_parts=8
        ).to_pandas()
    )
    assert a == b


def test_boundary_pairs_seeded_fuzz():
    # many small docs with overlapping vocab → pairs dense around the
    # threshold; exact equality must hold including boundary pairs
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(18)]
    rows = [
        " ".join(rng.choice(vocab, size=rng.integers(3, 12), replace=False))
        for _ in range(120)
    ]
    df = pd.DataFrame(
        {"doc_id": np.arange(len(rows), dtype=np.int64), "text": rows}
    )
    ds = rd.from_pandas(df).repartition(4)
    for tn, td in ((1, 2), (2, 3), (3, 5)):
        fast = _canon(prefix_jaccard_pairs(ds, tn, td).to_pandas())
        ref = _canon(
            all_pairs_jaccard(ds, tn, td, use_token_sets=True).to_pandas()
        )
        assert fast == ref


def test_partition_invariance():
    ds2 = _corpus(seed=7)
    a = _canon(
        prefix_jaccard_pairs(ds2.repartition(2), 7, 10).to_pandas()
    )
    b = _canon(
        prefix_jaccard_pairs(ds2.repartition(13), 7, 10).to_pandas()
    )
    assert a == b


def test_run_cap_raises_on_identical_class():
    rows = ["same tokens everywhere alike"] * 40
    df = pd.DataFrame(
        {"doc_id": np.arange(40, dtype=np.int64), "text": rows}
    )
    ds = rd.from_pandas(df)
    with pytest.raises(Exception, match="run_cap"):
        prefix_jaccard_pairs(ds, 9, 10, run_cap=10).to_pandas()


def test_bad_theta_raises():
    ds = _corpus(seed=9, n=5, dups=0)
    with pytest.raises(ValueError):
        prefix_jaccard_pairs(ds, 0, 10)
