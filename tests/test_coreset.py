"""kcenter_coreset: greedy farthest-point selection — naive truth,
planted-cluster coverage, duplicate robustness, partition invariance,
bounds."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from simhash_ray.stages.coreset import kcenter_coreset


def _ds(ids: np.ndarray, emb: np.ndarray, n_parts: int = 5) -> rd.Dataset:
    tbl = pa.table(
        {
            "vec_id": pa.array(ids.astype(np.int64)),
            "embedding": pa.array(
                [[float(x) for x in e] for e in emb],
                type=pa.list_(pa.float32()),
            ),
        }
    )
    return rd.from_arrow(tbl).repartition(n_parts)


def _naive(ids: np.ndarray, emb32: np.ndarray, k: int) -> list:
    emb = emb32.astype(np.float64)
    sel = [int(np.argmin(ids))]
    for _ in range(1, k):
        cm = emb[sel]
        md = np.sqrt(((emb[:, None, :] - cm[None, :, :]) ** 2).sum(-1)).min(1)
        cand = [i for i in range(len(ids)) if i not in sel]
        sel.append(max(cand, key=lambda i: (md[i], -ids[i])))
    return [int(ids[i]) for i in sel]


@pytest.mark.parametrize("seed", [0, 7])
def test_matches_naive_greedy(seed):
    rng = np.random.default_rng(seed)
    n, d, k = 250, 12, 6
    emb = rng.normal(size=(n, d)).astype(np.float32)
    ids = rng.permutation(n).astype(np.int64)
    out = kcenter_coreset(_ds(ids, emb), k).to_pandas()
    assert out["vec_id"].tolist() == _naive(ids, emb, k)
    assert out["step"].tolist() == list(range(k))


def test_covers_planted_clusters():
    # farthest-point traversal must visit every well-separated cluster
    # before revisiting any (the Gonzalez 2-approx property)
    rng = np.random.default_rng(1)
    k = 5
    centers = rng.normal(size=(k, 8)) * 50.0
    rows, labels = [], []
    for c_i, c in enumerate(centers):
        pts = c + rng.normal(scale=0.1, size=(40, 8))
        rows.append(pts)
        labels.extend([c_i] * 40)
    emb = np.concatenate(rows).astype(np.float32)
    ids = np.arange(len(emb), dtype=np.int64)
    out = kcenter_coreset(_ds(ids, emb), k).to_pandas()
    picked_clusters = {labels[int(v)] for v in out["vec_id"]}
    assert picked_clusters == set(range(k))


def test_duplicate_vectors_never_reselected():
    rng = np.random.default_rng(2)
    base = rng.normal(size=(30, 6)).astype(np.float32)
    emb = np.concatenate([base, base])  # every vector duplicated
    ids = np.arange(60, dtype=np.int64)
    out = kcenter_coreset(_ds(ids, emb), 10).to_pandas()
    assert out["vec_id"].is_unique
    assert out["vec_id"].tolist() == _naive(ids, emb, 10)


def test_partition_invariance():
    rng = np.random.default_rng(3)
    emb = rng.normal(size=(200, 10)).astype(np.float32)
    ids = rng.permutation(200).astype(np.int64)
    a = kcenter_coreset(_ds(ids, emb, n_parts=2), 5).to_pandas()
    b = kcenter_coreset(_ds(ids, emb, n_parts=13), 5).to_pandas()
    assert a["vec_id"].tolist() == b["vec_id"].tolist()


def test_k_bounds():
    rng = np.random.default_rng(4)
    emb = rng.normal(size=(5, 4)).astype(np.float32)
    ids = np.arange(5, dtype=np.int64)
    out = kcenter_coreset(_ds(ids, emb, n_parts=2), 1).to_pandas()
    assert out["vec_id"].tolist() == [0]
    with pytest.raises(ValueError):
        kcenter_coreset(_ds(ids, emb, n_parts=2), 0)
    with pytest.raises(ValueError):
        kcenter_coreset(_ds(ids, emb, n_parts=2), 6)
