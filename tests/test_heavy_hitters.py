"""token_heavy_hitters: exact φ-heavy hitters in two passes — naive
truth, pigeonhole superset behavior (token locally light in most
blocks still caught), partition invariance, degenerate inputs."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from simhash_ray.stages.sketch import token_heavy_hitters


def _truth(texts, num, den) -> list:
    toks = []
    for t in texts:
        toks.extend(t.lower().split())
    vc = pd.Series(toks, dtype=object).value_counts()
    total = int(vc.sum())
    keep = vc[vc * den >= num * total]
    return sorted((str(t), int(n)) for t, n in keep.items())


def _run(texts, num, den, n_parts=6, **kw) -> list:
    ds = rd.from_pandas(pd.DataFrame({"text": texts})).repartition(n_parts)
    out = token_heavy_hitters(ds, num, den, **kw).to_pandas()
    if "tok" not in out.columns:  # fully-empty Dataset loses its schema
        return []
    return sorted((str(t), int(n)) for t, n in zip(out["tok"], out["n"]))


def _corpus(seed: int, n: int = 400) -> list:
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(60)]
    # Zipf-ish draw so some tokens are genuinely heavy
    p = 1.0 / np.arange(1, len(vocab) + 1)
    p /= p.sum()
    return [
        " ".join(rng.choice(vocab, size=rng.integers(3, 20), p=p))
        for _ in range(n)
    ]


@pytest.mark.parametrize("num,den", [(1, 5), (1, 20), (1, 100), (1, 2)])
def test_matches_naive_truth(num, den):
    texts = _corpus(seed=num * 100 + den)
    assert _run(texts, num, den) == _truth(texts, num, den)


def test_locally_light_heavy_token_still_caught():
    # 'rare' is exactly at the global threshold but diluted so it is a
    # local candidate in as few blocks as possible; pigeonhole says it
    # must surface in at least one block's candidate set
    blocks = []
    for i in range(10):
        filler = " ".join(f"f{i}_{j}" for j in range(90))
        blocks.append(filler + " rare " * 10)
    texts = blocks
    got = _run(texts, 1, 10, n_parts=10)
    truth = _truth(texts, 1, 10)
    assert got == truth
    assert "rare" in {t for t, _ in truth}  # the scenario actually plants it


def test_partition_invariance():
    texts = _corpus(seed=9)
    assert _run(texts, 1, 30, n_parts=2) == _run(texts, 1, 30, n_parts=13)


def test_empty_and_whitespace_rows():
    texts = ["", "   ", "a a a b", "\t\n"]
    assert _run(texts, 1, 2) == _truth(texts, 1, 2)


def test_bad_phi_raises():
    with pytest.raises(ValueError):
        _run(["a"], 0, 5)


def test_candidate_limit_raises():
    texts = _corpus(seed=11)
    with pytest.raises(ValueError, match="candidate_limit"):
        _run(texts, 1, 100, candidate_limit=3)
