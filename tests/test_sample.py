"""Deterministic sampling: rate accuracy, partition invariance, caps."""

import numpy as np
import pandas as pd
import ray.data as rd

from simhash_ray.functions.hashing import md5_u32_of_int_ids
from simhash_ray.stages.sample import cap_per_group, hash_sample, stratified_sample


def _docs(n=4000, seed=3):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "lang": rng.choice(["en", "de", "fr"], n, p=[0.6, 0.25, 0.15]),
        }
    )


def test_hash_sample_rate_and_exactness():
    df = _docs()
    out = hash_sample(rd.from_pandas(df), 1, 4).to_pandas()
    # exact definition: u32(md5(id)) * 4 < 2^32
    u = md5_u32_of_int_ids(df["doc_id"].to_numpy()).astype(np.uint64)
    want = set(df["doc_id"][u * 4 < np.uint64(1 << 32)])
    assert set(out["doc_id"]) == want
    assert abs(len(out) / len(df) - 0.25) < 0.03


def test_sample_partition_invariant():
    df = _docs()
    a = hash_sample(rd.from_pandas(df).repartition(17), 1, 3).to_pandas()
    b = hash_sample(rd.from_pandas(df).repartition(2), 1, 3).to_pandas()
    assert set(a["doc_id"]) == set(b["doc_id"])


def test_stratified_rates():
    df = _docs(8000)
    out = stratified_sample(
        rd.from_pandas(df), "lang", {"en": (1, 4), "de": (1, 2)}
    ).to_pandas()
    by = out.groupby("lang").size()
    base = df.groupby("lang").size()
    assert abs(by["en"] / base["en"] - 0.25) < 0.05
    assert abs(by["de"] / base["de"] - 0.50) < 0.05
    assert by["fr"] == base["fr"]  # default rate 1/1 keeps everything


def test_cap_per_group_deterministic():
    df = _docs(3000)
    a = cap_per_group(rd.from_pandas(df).repartition(11), "lang", 7).to_pandas()
    b = cap_per_group(rd.from_pandas(df).repartition(3), "lang", 7).to_pandas()
    assert (a.groupby("lang").size() == 7).all()
    key = ["doc_id", "lang", "rank"]
    assert sorted(map(tuple, a[key].values.tolist())) == sorted(
        map(tuple, b[key].values.tolist())
    )
    # selection = ascending md5 order, ties by id
    u = md5_u32_of_int_ids(df["doc_id"].to_numpy()).astype(np.int64)
    ranked = df.assign(u=u).sort_values(["u", "doc_id"]).groupby("lang").head(7)
    assert set(a["doc_id"]) == set(ranked["doc_id"])


def test_stratified_null_groups_sampled_at_default():
    """Null group values take the default rate, never dropped silently
    (round-3 advice item 3; SQL mirrors must handle NULL explicitly)."""
    df = pd.DataFrame({
        "doc_id": np.arange(400, dtype=np.int64),
        "lang": ["en", "de", None, "fr"] * 100,
    })
    out = stratified_sample(
        rd.from_pandas(df), "lang", {"en": (0, 1), "de": (0, 1)},
        default=(1, 1),
    ).to_pandas()
    # en/de fully dropped; fr and ALL null rows kept at default 1/1
    assert len(out) == 200
    assert out["lang"].isna().sum() == 100


def test_rebalance_to_proportions():
    from simhash_ray.stages.sample import rebalance_to_proportions

    rng = np.random.default_rng(9)
    langs = np.array(
        ["en"] * 6000 + ["de"] * 1500 + ["fr"] * 900 + ["zh"] * 800
    )
    rng.shuffle(langs)
    df = pd.DataFrame(
        {"doc_id": np.arange(len(langs), dtype=np.int64), "lang": langs}
    )
    weights = {"en": 4, "de": 1, "fr": 1}
    out = (
        rebalance_to_proportions(rd.from_pandas(df).repartition(5), "lang", weights)
        .to_pandas()
    )
    # whitelist: zh dropped entirely
    assert set(out["lang"]) <= set(weights)
    got = out["lang"].value_counts()
    # bottleneck en (6000/4=1500 vs de 1500/1, fr 900/1 → fr? no:
    # fr 900/1=900 is the min) → fr kept whole, expected counts
    # en = 4*900 = 3600, de = 900
    assert got["fr"] == 900
    for g, exp in (("en", 3600), ("de", 900)):
        assert abs(got[g] - exp) < 4 * np.sqrt(exp), (g, got[g], exp)
    # partition invariance: identical kept id set under another layout
    out2 = (
        rebalance_to_proportions(rd.from_pandas(df).repartition(17), "lang", weights)
        .to_pandas()
    )
    assert sorted(out2["doc_id"]) == sorted(out["doc_id"])


def test_rebalance_absent_target_group_yields_empty():
    from simhash_ray.stages.sample import rebalance_to_proportions

    df = pd.DataFrame(
        {"doc_id": np.arange(10, dtype=np.int64), "lang": ["en"] * 10}
    )
    out = rebalance_to_proportions(
        rd.from_pandas(df), "lang", {"en": 1, "xx": 1}
    ).to_pandas()
    assert len(out) == 0


# ---- select_token_budget -------------------------------------------------


def _budget_corpus(n=900, seed=11):
    rng = np.random.default_rng(seed)
    words = [f"w{i}" for i in range(50)]
    texts = [
        " ".join(rng.choice(words, rng.integers(0, 30)))
        for _ in range(n)
    ]
    # sprinkle whitespace-only and empty docs (0 tokens)
    for i in range(0, n, 97):
        texts[i] = ["", "   ", "\t\n"][i % 3]
    return pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64), "text": texts})


def _naive_token_budget(df, budget):
    """Independent reference: hashlib md5 order + pandas cumsum."""
    import hashlib

    d = df.copy()
    d["u"] = [
        int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
        for i in d["doc_id"]
    ]
    d["ntok"] = [len(t.split()) for t in d["text"]]
    d = d.sort_values(["u", "doc_id"])
    return set(d["doc_id"][d["ntok"].cumsum() <= budget])


def test_token_budget_matches_naive_across_budgets():
    from simhash_ray.stages.sample import select_token_budget

    df = _budget_corpus()
    total = sum(len(t.split()) for t in df["text"])
    ds = rd.from_pandas(df)
    for budget in (0, 1, 37, total // 3, total - 1, total, total + 10):
        out = select_token_budget(ds, budget, collect_limit=50).to_pandas()
        got = set(out["doc_id"]) if len(out) else set()
        assert got == _naive_token_budget(df, budget), budget


def test_token_budget_partition_invariant_and_deep_refinement():
    from simhash_ray.stages.sample import select_token_budget

    df = _budget_corpus(400, seed=5)
    budget = sum(len(t.split()) for t in df["text"]) // 2
    want = _naive_token_budget(df, budget)
    for parts, climit in ((13, 2), (3, 400)):
        out = select_token_budget(
            rd.from_pandas(df).repartition(parts), budget, collect_limit=climit
        ).to_pandas()
        assert set(out["doc_id"]) == want
        # full input schema survives the filter
        assert list(out.columns) == ["doc_id", "text"]


def test_token_budget_keep_all_fast_path():
    from simhash_ray.stages.sample import select_token_budget

    df = _budget_corpus(60, seed=7)
    out = select_token_budget(rd.from_pandas(df), 10**9, collect_limit=4)
    assert set(out.to_pandas()["doc_id"]) == set(df["doc_id"])
