"""topk_per_group / exact_quantiles: truth, ties, edges."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from simhash_ray.stages.topk import exact_quantiles, topk_per_group


def _naive_topk(df, group, order, tie, k):
    s = df.sort_values([group, order, tie], ascending=[True, False, True])
    s = s.groupby(group).head(k).copy()
    s["rank"] = s.groupby(group).cumcount() + 1
    return s.reset_index(drop=True)


def test_topk_matches_naive_across_blocks():
    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {
            "g": rng.choice(list("abcde"), 5000),
            "v": rng.integers(0, 300, 5000).astype(np.float64),
            "id": np.arange(5000, dtype=np.int64),
        }
    )
    # many ties in v: the tie_col must fully determine the output
    out = (
        topk_per_group(
            rd.from_pandas(df).repartition(13), "g", "v", k=4, tie_col="id"
        )
        .to_pandas()
        .sort_values(["g", "rank"])
        .reset_index(drop=True)
    )
    want = _naive_topk(df, "g", "v", "id", 4)[["g", "v", "id", "rank"]]
    got = out[["g", "v", "id", "rank"]].reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.sort_values(["g", "rank"]).reset_index(drop=True),
        want.sort_values(["g", "rank"]).reset_index(drop=True),
    )


def test_topk_group_smaller_than_k():
    df = pd.DataFrame(
        {"g": ["a", "a", "b"], "v": [1.0, 2.0, 3.0], "id": [1, 2, 3]}
    )
    out = topk_per_group(rd.from_pandas(df), "g", "v", k=5, tie_col="id").to_pandas()
    assert len(out) == 3
    assert set(out[out["g"] == "a"]["rank"]) == {1, 2}


def test_quantiles_match_duckdb_disc():
    import duckdb

    rng = np.random.default_rng(11)
    # near-distinct values over odd sizes so index off-by-ones show up
    for n in (73, 101, 1777):
        vals = rng.integers(0, 10**6, n).astype(np.int64)
        ds = rd.from_pandas(pd.DataFrame({"x": vals})).repartition(7)
        out = exact_quantiles(
            ds, "x", {"p50": (1, 2), "p90": (9, 10), "p25": (1, 4)}
        ).to_pandas()
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE t AS SELECT unnest($1::BIGINT[]) AS x", [vals.tolist()]
        )
        for name, q in [("p50", 0.5), ("p90", 0.9), ("p25", 0.25)]:
            want = con.execute(f"SELECT quantile_disc(x, {q}) FROM t").fetchone()[0]
            assert out[name][0] == want, (n, name)


def test_quantiles_single_row_and_exact_boundary():
    out = exact_quantiles(
        rd.from_pandas(pd.DataFrame({"x": np.array([42], dtype=np.int64)})),
        "x", {"p50": (1, 2)},
    ).to_pandas()
    assert out["p50"][0] == 42
    # n=5, q=1/4 → (n-1)*q = 1 exactly → index 1
    out = exact_quantiles(
        rd.from_pandas(pd.DataFrame({"x": np.array([10, 20, 30, 40, 50],
                                                   dtype=np.int64)})),
        "x", {"p25": (1, 4)},
    ).to_pandas()
    assert out["p25"][0] == 20


def test_quantiles_cardinality_guard():
    ds = rd.from_pandas(pd.DataFrame({"x": np.arange(100, dtype=np.int64)}))
    with pytest.raises(ValueError, match="distinct"):
        exact_quantiles(ds, "x", {"p50": (1, 2)}, max_distinct=10)


def test_quantiles_negative_values():
    vals = np.array([-50, -3, -3, 0, 7, 7, 7, 100], dtype=np.int64)
    out = exact_quantiles(
        rd.from_pandas(pd.DataFrame({"x": vals})), "x",
        {"p0": (0, 1), "p50": (1, 2), "p100": (1, 1)},
    ).to_pandas()
    s = np.sort(vals)
    assert out["p0"][0] == s[0] == -50
    assert out["p50"][0] == s[(len(s) - 1) // 2]
    assert out["p100"][0] == s[-1] == 100


def test_sampled_quantiles_partition_invariant_and_near_exact(ray_session):
    """The deterministic-sample quantile path: identical result under
    any partitioning (no RNG), and within the DKW rank band of the
    exact answer on a 20k-row skewed column."""
    import pyarrow as pa

    from simhash_ray.stages.topk import exact_quantiles, sampled_quantiles

    rng = np.random.default_rng(8)
    vals = rng.geometric(0.02, size=20_000).astype(np.int64)  # heavy tail
    t = pa.table(
        {"doc_id": pa.array(np.arange(20_000, dtype=np.int64)), "v": pa.array(vals)}
    )
    qs = {"p50": (1, 2), "p90": (9, 10)}
    outs = [
        sampled_quantiles(
            rd.from_arrow(t).repartition(p), "v", qs, rate=(1, 4), id_col="doc_id"
        ).to_pandas()
        for p in (1, 7)
    ]
    pd.testing.assert_frame_equal(outs[0], outs[1])

    exact = exact_quantiles(rd.from_arrow(t), "v", qs).to_pandas()
    s = np.sort(vals)
    for name, (num, den) in qs.items():
        est = outs[0][name][0]
        # rank of the estimate in the FULL data within ±4*sqrt(q(1-q)/m)
        q = num / den
        m = 20_000 // 4
        rank = np.searchsorted(s, est, side="right") / len(s)
        assert abs(rank - q) < 4 * np.sqrt(q * (1 - q) / m) + 1 / m, (
            name, est, rank, exact[name][0],
        )


# ---------------------------------------------------------------------------
# exact quantiles at UNBOUNDED cardinality (order-statistic refinement)


def test_exact_quantiles_unbounded_matches_bounded_and_numpy():
    import ray.data as rd

    from simhash_ray.stages.topk import (
        _disc_index,
        exact_quantiles,
        exact_quantiles_unbounded,
    )

    rng = np.random.default_rng(8)
    # near-unique values (unbounded-cardinality shape) + heavy dup mass
    vals = np.concatenate(
        [rng.integers(-10**12, 10**12, 5000), np.full(2000, 42)]
    ).astype(np.int64)
    ds = rd.from_pandas(pd.DataFrame({"v": vals})).repartition(7)
    q = {"p50": (1, 2), "p90": (9, 10), "p1": (1, 100)}
    fast = exact_quantiles_unbounded(ds, "v", q)
    ref = exact_quantiles(ds, "v", q)  # histogram path, already pinned
    for name in q:
        assert fast[name][0].as_py() == ref[name][0].as_py()
    # numpy cross-check of the disc rule
    s = np.sort(vals)
    for name, (num, den) in q.items():
        assert fast[name][0].as_py() == int(s[_disc_index(len(s), num, den)])


def test_exact_quantiles_unbounded_forced_refinement_rounds():
    import ray.data as rd

    from simhash_ray.stages.topk import exact_quantiles, exact_quantiles_unbounded

    rng = np.random.default_rng(9)
    vals = rng.integers(0, 10**9, 4000).astype(np.int64)
    ds = rd.from_pandas(pd.DataFrame({"v": vals})).repartition(5)
    q = {"p50": (1, 2), "p99": (99, 100)}
    slow = exact_quantiles_unbounded(ds, "v", q, n_buckets=16, collect_limit=50)
    ref = exact_quantiles(ds, "v", q)
    for name in q:
        assert slow[name][0].as_py() == ref[name][0].as_py()


def test_exact_quantiles_unbounded_single_value_multiplicity():
    import ray.data as rd

    from simhash_ray.stages.topk import exact_quantiles_unbounded

    ds = rd.from_pandas(
        pd.DataFrame({"v": np.full(3000, 7, dtype=np.int64)})
    ).repartition(3)
    out = exact_quantiles_unbounded(
        ds, "v", {"p50": (1, 2)}, collect_limit=10
    )
    assert out["p50"][0].as_py() == 7


def test_exact_quantiles_unbounded_full_int64_span_no_overflow():
    """Column spanning more than half the int64 range (hashed-value
    shape): int64 (v - lo) would wrap; the uint64 bucket arithmetic
    must still return the exact order statistic."""
    import ray.data as rd

    from simhash_ray.stages.topk import _disc_index, exact_quantiles_unbounded

    rng = np.random.default_rng(10)
    lo_half = rng.integers(np.iinfo(np.int64).min, np.iinfo(np.int64).min + 10**6, 2000)
    hi_half = rng.integers(np.iinfo(np.int64).max - 10**6, np.iinfo(np.int64).max, 2000)
    vals = np.concatenate([lo_half, hi_half]).astype(np.int64)
    ds = rd.from_pandas(pd.DataFrame({"v": vals})).repartition(6)
    q = {"p25": (1, 4), "p50": (1, 2), "p75": (3, 4)}
    # collect_limit below n forces the refinement rounds to run
    out = exact_quantiles_unbounded(ds, "v", q, n_buckets=32, collect_limit=300)
    s = np.sort(vals)
    for name, (num, den) in q.items():
        assert out[name][0].as_py() == int(s[_disc_index(len(s), num, den)])
