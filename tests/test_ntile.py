"""exact_ntile: exact NTILE(k) OVER (ORDER BY col, id) without a
global sort — naive-truth, tie-heavy, k>n, forced-refinement and
partition-invariance coverage."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from simhash_ray.stages.topk import exact_ntile


def _truth(df: pd.DataFrame, k: int) -> pd.Series:
    """SQL-spec NTILE: order by (v, doc_id); first n % k tiles get
    one extra row."""
    order = df.sort_values(["v", "doc_id"]).reset_index(drop=True)
    n = len(df)
    base, rem = divmod(n, k)
    sizes = np.full(k, base, dtype=np.int64)
    sizes[:rem] += 1
    tiles = np.repeat(np.arange(1, k + 1), sizes)
    return pd.Series(tiles, index=order["doc_id"].to_numpy()).sort_index()


def _frame(n: int, n_vals: int, seed: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "doc_id": rng.permutation(n).astype(np.int64),
            "v": rng.integers(0, n_vals, n).astype(np.int64),
        }
    )


def _run(df: pd.DataFrame, k: int, n_parts: int = 5, **kw) -> pd.Series:
    ds = rd.from_pandas(df).repartition(n_parts)
    out = exact_ntile(ds, "v", k, id_col="doc_id", **kw).to_pandas()
    return out.set_index("doc_id")["tile"].sort_index()


@pytest.mark.parametrize("k", [1, 2, 3, 7, 16, 100])
def test_matches_sql_ntile_tie_heavy(k):
    df = _frame(997, 12, seed=1)  # ~83 rows per value: ties everywhere
    pd.testing.assert_series_equal(
        _run(df, k), _truth(df, k), check_names=False
    )


@pytest.mark.parametrize("k", [996, 997, 998, 2000])
def test_k_near_and_above_n(k):
    df = _frame(997, 30, seed=2)
    pd.testing.assert_series_equal(
        _run(df, k), _truth(df, k), check_names=False
    )


def test_all_one_value():
    df = pd.DataFrame(
        {"doc_id": np.arange(50, dtype=np.int64), "v": np.zeros(50, np.int64)}
    )
    pd.testing.assert_series_equal(
        _run(df, 4), _truth(df, 4), check_names=False
    )


def test_forced_refinement_rounds_match_collect_path():
    # collect_limit below every class size forces the bucket-count
    # order-statistic rounds; the answer must be identical
    df = _frame(2000, 6, seed=3)
    fast = _run(df, 7)
    slow = _run(df, 7, collect_limit=20, n_buckets=8)
    pd.testing.assert_series_equal(fast, slow, check_names=False)
    pd.testing.assert_series_equal(fast, _truth(df, 7), check_names=False)


def test_partition_invariance():
    df = _frame(1500, 25, seed=4)
    a = _run(df, 9, n_parts=2)
    b = _run(df, 9, n_parts=17)
    pd.testing.assert_series_equal(a, b, check_names=False)


def test_bad_k_raises():
    df = _frame(10, 3, seed=5)
    with pytest.raises(ValueError):
        _run(df, 0)
