"""int8 quantization: kernel properties, dataset plumbing, quantized
top-k vs exact rescoring."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from simhash_ray.stages.quantize import quantize_int8, quantize_mat, quantized_topk


def test_quantize_mat_properties():
    rng = np.random.default_rng(2)
    mat = rng.normal(size=(200, 64)) * rng.uniform(0.1, 10, (200, 1))
    mat[0] = 0.0  # zero vector
    q, scale = quantize_mat(mat)
    assert q.dtype == np.int8
    assert scale[0] == 0.0 and not q[0].any()
    nz = slice(1, None)
    # extreme |x| of each row saturates to exactly +/-127
    assert (np.abs(q[nz]).max(axis=1) == 127).all()
    # reconstruction error bounded by half a quantization step
    err = np.abs(mat[nz] - q[nz].astype(np.float64) * scale[nz, None])
    assert (err <= scale[nz, None] / 2 + 1e-12).all()


def test_quantize_mat_matches_scalar_definition():
    rng = np.random.default_rng(5)
    mat = rng.normal(size=(50, 8))
    q, scale = quantize_mat(mat)
    for r in range(50):
        s = np.abs(mat[r]).max() / 127.0
        assert scale[r] == s
        for c in range(8):
            assert q[r, c] == int(np.floor(mat[r, c] / s + 0.5))


def test_quantize_int8_dataset_roundtrip():
    rng = np.random.default_rng(8)
    vecs = [rng.normal(size=16).astype(np.float32).tolist() for _ in range(300)]
    df = pd.DataFrame({"vec_id": np.arange(300, dtype=np.int64), "embedding": vecs})
    out = (
        quantize_int8(rd.from_pandas(df).repartition(7))
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    mat = np.array(vecs, dtype=np.float64)
    q, scale = quantize_mat(mat)
    assert np.array_equal(np.stack(out["qvec"].to_numpy()), q)
    assert np.array_equal(out["scale"].to_numpy(), scale)


def test_quantized_topk_matches_driver_truth():
    rng = np.random.default_rng(13)
    mat = rng.normal(size=(400, 32))
    df = pd.DataFrame(
        {
            "vec_id": np.arange(400, dtype=np.int64),
            "embedding": [v.astype(np.float32).tolist() for v in mat],
        }
    )
    k = 4
    out = (
        quantized_topk(rd.from_pandas(df).repartition(9), list(range(6)), k=k)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    # driver truth over the SAME float32-stored values
    mat64 = np.array(df["embedding"].tolist(), dtype=np.float64)
    q, s = quantize_mat(mat64)
    want = []
    for qid in range(6):
        dots = (q[qid].astype(np.int32) @ q.astype(np.int32).T).astype(np.float64)
        scores = (dots * s[qid]) * s
        order = np.lexsort((np.arange(400), -scores))
        order = order[order != qid][:k]
        for r, n in enumerate(order):
            want.append((qid, int(n), r + 1))
    want = pd.DataFrame(want, columns=["query_id", "neighbor_id", "rank"]).astype(
        np.int64
    )
    pd.testing.assert_frame_equal(out, want)


def test_quantized_topk_missing_query_raises():
    df = pd.DataFrame(
        {"vec_id": [0, 1], "embedding": [[1.0, 0.0], [0.0, 1.0]]}
    )
    with pytest.raises(ValueError, match="absent"):
        quantized_topk(rd.from_pandas(df), [0, 99], k=1)
