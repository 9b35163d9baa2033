"""psi_per_group: PSI drift diagnostic — naive-truth, planted-drift
ordering, empty-bin smoothing, partition invariance."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from simhash_ray.stages.drift import psi_per_group


def _truth(df: pd.DataFrame, n_bins: int = 10, scale: float = 1e6) -> pd.DataFrame:
    vm = np.floor(df["value"].to_numpy() * scale).astype(np.int64)
    order = np.sort(vm)
    n = len(order)
    # ceil(n*q)-1 discrete quantile rule (stages/topk._disc_index)
    thr = np.sort(
        np.asarray(
            [
                order[max(0, (n * j + n_bins - 1) // n_bins - 1)]
                for j in range(1, n_bins)
            ]
        )
    )
    bins = np.searchsorted(thr, vm, side="left")
    groups = np.sort(df["g"].unique())
    mat = np.zeros((len(groups), n_bins), dtype=np.int64)
    gi = {g: i for i, g in enumerate(groups)}
    for g, b in zip(df["g"], bins):
        mat[gi[g], b] += 1
    gt = mat.sum(axis=0)
    q = (gt + 1.0) / (gt.sum() + n_bins)
    p = (mat + 1.0) / (mat.sum(axis=1, keepdims=True) + n_bins)
    psi = ((p - q) * np.log(p / q)).sum(axis=1)
    return pd.DataFrame({"g": groups, "psi": np.round(psi, 6)})


def _run(df: pd.DataFrame, n_parts: int = 5, **kw) -> pd.DataFrame:
    ds = rd.from_pandas(df).repartition(n_parts)
    out = psi_per_group(ds, "g", "value", **kw).to_pandas()
    return out.sort_values("g").reset_index(drop=True)


def _frame(seed: int, shift: float = 0.0) -> pd.DataFrame:
    # drifted segment kept SMALL so the global mixture stays close to
    # the stable segments' distribution (PSI is measured vs global)
    rng = np.random.default_rng(seed)
    a = rng.normal(0.0, 1.0, 1500)
    b = rng.normal(0.0, 1.0, 1400)
    c = rng.normal(shift, 1.0, 100)  # the drifted segment
    return pd.DataFrame(
        {
            "g": ["a"] * len(a) + ["b"] * len(b) + ["c"] * len(c),
            "value": np.concatenate([a, b, c]),
        }
    )


def test_matches_naive_truth():
    df = _frame(seed=1, shift=1.5)
    pd.testing.assert_frame_equal(_run(df), _truth(df))


def test_planted_drift_ranks_highest():
    df = _frame(seed=2, shift=2.5)
    out = _run(df).set_index("g")["psi"]
    assert out["c"] > out["a"] and out["c"] > out["b"]
    assert out["c"] > 0.25  # "major shift" band
    assert out[["a", "b"]].max() < 0.1  # stable segments


def test_degenerate_group_single_bin_stays_finite():
    # one group entirely inside one global bin: 9 of its 10 cells are
    # empty; Laplace smoothing must keep every term finite
    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {
            "g": ["wide"] * 2000 + ["point"] * 50,
            "value": np.concatenate(
                [rng.uniform(0, 100, 2000), np.full(50, 3.14159)]
            ),
        }
    )
    out = _run(df)
    assert np.isfinite(out["psi"]).all()
    pd.testing.assert_frame_equal(out, _truth(df))


def test_partition_invariance():
    df = _frame(seed=4, shift=0.7)
    pd.testing.assert_frame_equal(_run(df, n_parts=2), _run(df, n_parts=17))


def test_bad_bins_raises():
    with pytest.raises(ValueError):
        _run(_frame(seed=5), n_bins=1)
