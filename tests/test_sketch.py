"""stages/sketch.kmv_distinct: accuracy vs planted cardinality,
partition invariance (bottom-k-of-union determinism), exact small-set
path, and null handling."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from simhash_ray.stages.sketch import kmv_distinct


def _est(ds, col="v", k=256):
    out = kmv_distinct(ds, col, k=k).to_pandas()
    assert list(out["kmv_k"]) == [k]
    return float(out["n_distinct_est"].iloc[0])


def test_kmv_exact_below_k(ray_session):
    vals = [f"v{i}" for i in range(100)] * 3  # 100 distinct, repeated
    ds = rd.from_arrow(pa.table({"v": vals}))
    assert _est(ds, k=256) == 100.0


def test_kmv_estimate_within_error_bound(ray_session):
    n = 5000
    vals = [f"item-{i}" for i in range(n)]
    ds = rd.from_arrow(pa.table({"v": vals}))
    est = _est(ds, k=256)
    # KMV relative error ~ 1/sqrt(k) ≈ 6%; allow 4 sigma
    assert abs(est - n) / n < 0.25, est


def test_kmv_partition_invariant(ray_session):
    vals = [f"x{i % 700}" for i in range(3000)]
    t = pa.table({"v": vals})
    a = _est(rd.from_arrow(t), k=128)
    b = _est(rd.from_arrow(t).repartition(13), k=128)
    c = _est(rd.from_arrow(t).repartition(1), k=128)
    assert a == b == c


def test_kmv_nulls_and_empty(ray_session):
    ds = rd.from_arrow(pa.table({"v": pa.array(["a", None, "b", None, "a"])}))
    assert _est(ds, k=16) == 2.0
    empty = rd.from_arrow(pa.table({"v": pa.array([], type=pa.string())}))
    assert _est(empty, k=16) == 0.0


def test_kmv_matches_reference_formula(ray_session):
    """Cross-check the streamed estimate against a direct single-pass
    computation of the same estimator."""
    import hashlib

    n, k = 2000, 64
    vals = [f"doc-{i}" for i in range(n)]
    hs = sorted(hashlib.md5(v.encode()).hexdigest() for v in set(vals))
    frac = int(hs[k - 1][:16], 16) / 2**64
    want = np.round((k - 1) / frac, 6)
    ds = rd.from_arrow(pa.table({"v": vals})).repartition(5)
    assert _est(ds, k=k) == want
