"""Distributed spherical k-means + SemDeDup (stages/kmeans.py):
determinism/partition-invariance of the fixed-point Lloyd fit,
assignment parity vs a per-row numpy reference, planted-cluster purity,
and SemDeDup's within-cluster smaller-id duplicate marking."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from simhash_ray.stages.kmeans import (
    assign_centroids,
    centroids_table,
    kmeans_fit,
    semdedup,
)


def _planted(n_per=40, k=3, dim=16, seed=11, spread=0.05):
    """k well-separated unit directions + tight gaussian clouds."""
    rng = np.random.default_rng(seed)
    dirs = rng.standard_normal((k, dim))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    # orthogonalize so clusters are genuinely far apart
    q, _ = np.linalg.qr(dirs.T)
    dirs = q.T[:k]
    rows, labels = [], []
    for c in range(k):
        pts = dirs[c] + spread * rng.standard_normal((n_per, dim))
        rows.append(pts)
        labels.extend([c] * n_per)
    mat = np.concatenate(rows).astype(np.float32)
    return pd.DataFrame(
        {
            "vec_id": np.arange(len(mat), dtype=np.int64),
            "embedding": list(mat),
            "truth": np.array(labels, dtype=np.int64),
        }
    )


@pytest.fixture(scope="module")
def planted():
    return _planted()


def _ds(df, n_blocks=1):
    d = rd.from_pandas(df)
    return d.repartition(n_blocks) if n_blocks > 1 else d


def test_fit_is_deterministic_and_partition_invariant(planted):
    c1 = kmeans_fit(_ds(planted, 3), k=3, n_iters=4)
    c2 = kmeans_fit(_ds(planted, 7), k=3, n_iters=4)
    c3 = kmeans_fit(_ds(planted.sample(frac=1.0, random_state=0), 5), k=3, n_iters=4)
    # bit-identical: the fixed-point accumulate is order-independent
    assert c1.tobytes() == c2.tobytes() == c3.tobytes()


def test_planted_cluster_purity(planted):
    cents = kmeans_fit(_ds(planted, 4), k=3, n_iters=5)
    out = assign_centroids(_ds(planted, 4), cents).to_pandas()[["vec_id", "cent"]]
    merged = out.merge(planted[["vec_id", "truth"]], on="vec_id")
    # every truth cluster maps to exactly one centroid and vice versa
    purity = merged.groupby("truth")["cent"].nunique()
    assert (purity == 1).all()
    assert merged["cent"].nunique() == 3


def test_assignment_matches_numpy_reference(planted):
    cents = kmeans_fit(_ds(planted, 2), k=3, n_iters=3)
    out = (
        assign_centroids(_ds(planted, 5), cents)
        .to_pandas()
        .sort_values("vec_id")
    )
    mat = np.stack(planted["embedding"].to_numpy()).astype(np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    ref = np.argmax(mat @ cents.T, axis=1)
    assert (out["cent"].to_numpy() == ref).all()


def test_empty_clusters_keep_seed_centroid():
    # 5 identical points, k=3: two clusters stay empty, no NaNs
    df = pd.DataFrame(
        {
            "vec_id": np.arange(5, dtype=np.int64),
            "embedding": [np.ones(4, dtype=np.float32)] * 5,
        }
    )
    cents = kmeans_fit(rd.from_pandas(df), k=3, n_iters=3)
    assert np.isfinite(cents).all()
    assert cents.shape == (3, 4)


def test_k_larger_than_corpus_raises():
    df = pd.DataFrame(
        {
            "vec_id": np.arange(3, dtype=np.int64),
            "embedding": [np.ones(4, dtype=np.float32)] * 3,
        }
    )
    with pytest.raises(ValueError, match="exceeds row count"):
        kmeans_fit(rd.from_pandas(df), k=8, n_iters=1)


def test_semdedup_flags_planted_dups_and_keeps_min_id(planted):
    # append near-exact copies of rows 0..9 with HIGHER ids
    base = planted.drop(columns=["truth"])
    dup = base.head(10).copy()
    dup["vec_id"] = dup["vec_id"] + 1000
    dup["embedding"] = [
        (v * np.float32(1.0 + 1e-4)) for v in dup["embedding"]
    ]  # same direction ⇒ cosine ≈ 1
    corpus = pd.concat([base, dup], ignore_index=True)
    out, cents = semdedup(
        rd.from_pandas(corpus).repartition(3),
        k=3,
        threshold_num=999,
        threshold_den=1000,
        n_iters=4,
    )
    res = out.to_pandas().set_index("vec_id")
    # every planted copy is marked dup; its smaller-id original is not
    assert res.loc[1000:1009, "is_dup"].all()
    assert not res.loc[0:9, "is_dup"].any()
    # copies land in the same cluster as their originals
    assert (
        res.loc[1000:1009, "cent"].to_numpy() == res.loc[0:9, "cent"].to_numpy()
    ).all()


def test_semdedup_matches_brute_force(planted):
    """Full-output parity vs an in-memory reference at a mid threshold
    (pairs exist but aren't all near-1): assignment via the returned
    centroids, dup marking via the global mask restricted per cluster."""
    ds = _ds(planted.drop(columns=["truth"]), 4)
    out, cents = semdedup(ds, k=3, threshold_num=9, threshold_den=10, n_iters=4)
    res = out.to_pandas().sort_values("vec_id").reset_index(drop=True)
    mat = np.stack(planted["embedding"].to_numpy()).astype(np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    cent = np.argmax(mat @ cents.T, axis=1)
    sims = mat @ mat.T
    n = len(mat)
    expect = np.zeros(n, dtype=bool)
    for i in range(n):
        js = np.flatnonzero(
            (cent == cent[i])
            & (np.arange(n) < i)
            & (sims[i] * 10 >= 9)
        )
        expect[i] = len(js) > 0
    assert (res["cent"].to_numpy() == cent).all()
    assert (res["is_dup"].to_numpy() == expect).all()


def test_fit_sample_path(planted):
    cents = kmeans_fit(
        _ds(planted, 3), k=3, n_iters=3, fit_sample=(3, 4)
    )
    assert np.isfinite(cents).all()
    # sampled fit still separates the planted clusters
    out = assign_centroids(_ds(planted, 3), cents).to_pandas()[["vec_id", "cent"]]
    merged = out.merge(planted[["vec_id", "truth"]], on="vec_id")
    assert (merged.groupby("truth")["cent"].nunique() == 1).all()


def test_centroids_table_roundtrip():
    c = np.arange(12, dtype=np.float64).reshape(3, 4)
    t = centroids_table(c)
    assert t.column_names == ["cent", "centroid"]
    back = np.stack(t["centroid"].to_pylist())
    assert (back == c).all()
