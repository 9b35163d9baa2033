"""Product-quantization ANN: deterministic fit, per-row encode parity,
ADC ranking properties on planted cluster structure."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from simhash_ray.stages.pq import (
    _assign_codes_int,
    codebooks_table,
    fit_pq_codebooks,
    pq_encode,
    pq_topk,
)
from simhash_ray.stages.quantize import quantize_mat


def _clustered(n_clusters=20, per=25, d=64, seed=5, sigma=0.08):
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 1, (n_clusters, d))
    pts = np.repeat(centers, per, axis=0) + rng.normal(
        0, sigma, (n_clusters * per, d)
    )
    df = pd.DataFrame(
        {
            "vec_id": np.arange(n_clusters * per, dtype=np.int64),
            "embedding": list(pts.astype(np.float32)),
        }
    )
    return df, per


@pytest.fixture(scope="module")
def corpus(ray_session):
    df, per = _clustered()
    return rd.from_pandas(df).materialize(), df, per


def test_fit_deterministic_across_layout(corpus):
    ds, _, _ = corpus
    b1 = fit_pq_codebooks(ds, m=8, ks=16)
    b2 = fit_pq_codebooks(ds.repartition(7), m=8, ks=16)
    assert b1.shape == (8, 16, 8)
    assert (b1 == b2).all()
    assert b1.min() >= -127 and b1.max() <= 127


def test_encode_matches_per_row_reference(corpus):
    ds, df, _ = corpus
    books = fit_pq_codebooks(ds, m=8, ks=16)
    out = pq_encode(ds, books).to_pandas().sort_values("vec_id")
    mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    q, scale = quantize_mat(mat)
    q = q.astype(np.int64)
    got = np.stack([np.frombuffer(c, dtype=np.uint8) for c in out["codes"]])
    for s in range(8):
        sub = q[:, s * 8 : (s + 1) * 8]
        # per-row reference: explicit L2 argmin with lowest-code ties
        want = np.array(
            [
                int(np.argmin(((row - books[s]) ** 2).sum(axis=1)))
                for row in sub
            ],
            dtype=np.uint8,
        )
        assert (got[:, s] == want).all(), f"subspace {s} diverges"
    assert np.allclose(out["scale"].to_numpy(), scale)


def test_assign_tie_breaks_to_lowest_code():
    cents = np.array([[1, 1], [1, 1], [5, 5]], dtype=np.int64)
    sub = np.array([[1, 1], [5, 5], [3, 3]], dtype=np.int64)
    codes = _assign_codes_int(sub, cents)
    assert codes[0] == 0  # duplicate centroid: lowest index wins
    assert codes[1] == 2
    assert codes[2] == 0  # equidistant between code 0/1 and code 2 → lowest


def test_topk_stays_within_planted_cluster(corpus):
    ds, _, per = corpus
    topk = pq_topk(ds, query_ids=[0, per, 2 * per, 3 * per], k=5).to_pandas()
    assert len(topk) == 20
    for _, row in topk.iterrows():
        assert row["neighbor_id"] // per == row["query_id"] // per, (
            "PQ top-5 neighbor outside the query's planted cluster"
        )
    # self excluded, ranks are 1..5 per query
    assert (topk["neighbor_id"] != topk["query_id"]).all()
    assert sorted(topk[topk["query_id"] == 0]["rank"]) == [1, 2, 3, 4, 5]


def test_codebooks_table_unpacks(corpus):
    ds, _, _ = corpus
    books = fit_pq_codebooks(ds, m=8, ks=16)
    tbl = codebooks_table(books)
    assert tbl.num_rows == 8 * 16 * 8
    df = tbl.to_pandas()
    rec = df.sort_values(["sub", "code", "dim"])["val"].to_numpy().reshape(8, 16, 8)
    assert (rec == books).all()


def test_dim_not_divisible_raises(ray_session):
    df = pd.DataFrame(
        {
            "vec_id": np.arange(4, dtype=np.int64),
            "embedding": list(np.ones((4, 10), dtype=np.float32)),
        }
    )
    with pytest.raises(ValueError):
        fit_pq_codebooks(rd.from_pandas(df), m=8, ks=4)


def test_fit_with_few_distinct_subvectors(ray_session):
    # fewer distinct subvectors than ks: codebook pads cyclically,
    # duplicate centroids never win an argmin (lowest-code ties)
    df = pd.DataFrame(
        {
            "vec_id": np.arange(6, dtype=np.int64),
            "embedding": list(
                np.tile(np.arange(64, dtype=np.float32), (6, 1))
                * np.array([1, 1, 2, 2, 3, 3], dtype=np.float32)[:, None]
            ),
        }
    )
    ds = rd.from_pandas(df)
    books = fit_pq_codebooks(ds, m=8, ks=16)
    codes = pq_encode(ds, books).to_pandas().sort_values("vec_id")
    got = np.stack([np.frombuffer(c, dtype=np.uint8) for c in codes["codes"]])
    # identical (post-quantization) vectors get identical codes
    assert (got[0] == got[1]).all()


def test_fit_empty_table_raises(ray_session):
    t = pa.table({"vec_id": pa.array([], type=pa.int64()),
                  "embedding": pa.array([], type=pa.list_(pa.float32()))})
    with pytest.raises(ValueError):
        fit_pq_codebooks(rd.from_arrow(t))
