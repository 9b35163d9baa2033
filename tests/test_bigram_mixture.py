"""Unit tests for the round-4 late additions: bigram-LM scoring,
per-source KL mixture diagnostic, Q3-style join path equivalence, and
similarity-retrieval top-k semantics."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _docs_ds(texts, sources=None):
    import ray.data as rd

    n = len(texts)
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
            "source": pa.array(sources or ["s"] * n, type=pa.string()),
        }
    )
    return rd.from_arrow(tbl)


def test_bigram_scorer_matches_hand_reference():
    import ray

    from simhash_ray.stages.text import (
        bigram_counts,
        bigram_left_counts,
        make_bigram_scorer,
    )

    # corpus bigrams: "a b"x3 (d0 twice, d1 once), "b a"x1, "b c"x1,
    # "a c"x1 → vocab at min_count=2 is {"a b": 3}; left counts
    # c(a) = 3 + 1 = 4 (from "a b" and "a c")
    docs = _docs_ds(["a b a b", "a b c", "x", "a c"])
    bigrams = bigram_counts(docs).materialize()
    got = bigrams.to_pandas().set_index("bg")["cnt"].to_dict()
    assert got == {"a b": 3, "b a": 1, "b c": 1, "a c": 1}
    left = bigram_left_counts(bigrams).to_pandas().set_index("u")["cnt_u"]
    assert left.to_dict() == {"a": 4, "b": 2}

    vocab = pd.Series({"a b": 3})
    cnt_ref = ray.put(vocab)
    left_ref = ray.put(left)
    out = (
        docs.map_batches(
            make_bigram_scorer(cnt_ref, left_ref), batch_format="pyarrow"
        )
        .to_pandas()
        .set_index("doc_id")["avg_bigram_logprob"]
    )
    want = round(math.log(3 / 4), 6)
    # d2 ("x") and d3 ("a c", out-of-vocab bigram) are dropped
    assert sorted(out.index) == [0, 1]
    assert abs(out[0] - want) < 1e-9  # two in-vocab occurrences, same ratio
    assert abs(out[1] - want) < 1e-9


def test_bigram_counts_layout_invariant():
    from simhash_ray.stages.text import bigram_counts

    texts = [f"tok{i % 7} tok{(i + 1) % 5} tok{i % 3}" for i in range(200)]
    one = bigram_counts(_docs_ds(texts)).to_pandas()
    many = bigram_counts(_docs_ds(texts).repartition(17)).to_pandas()
    a = one.sort_values("bg").reset_index(drop=True)
    b = many.sort_values("bg").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    # no cross-document bigram: each doc has 3 tokens → 2 bigrams
    assert int(a["cnt"].sum()) == 2 * len(texts)


def test_source_kl_planted_drift():
    from simhash_ray.pipelines.queries import source_kl

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(20)]
    base_p = np.ones(20) / 20.0
    skew_p = np.ones(20)
    skew_p[:2] = 40.0  # two tokens dominate
    skew_p /= skew_p.sum()

    def make(n, p):
        return [" ".join(rng.choice(vocab, size=30, p=p)) for _ in range(n)]

    texts = make(60, base_p) + make(60, base_p) + make(60, skew_p)
    sources = ["match_a"] * 60 + ["match_b"] * 60 + ["drifted"] * 60
    out = source_kl(_docs_ds(texts, sources)).set_index("source")["kl"]
    # the matching sources carry baseline KL (sampling noise + the
    # drifted source shifting the corpus mix); the drifted one must
    # still stand clearly above them
    assert out.idxmax() == "drifted"
    assert out["drifted"] > 2.5 * max(out["match_a"], out["match_b"])
    assert (out >= 0).all()  # KL is non-negative


def test_shipping_priority_join_path_matches_broadcast():
    from simhash_ray.pipelines.queries import q_shipping_priority

    def canon(df):
        df = df.to_pandas() if not isinstance(df, pd.DataFrame) else df
        df = df[sorted(df.columns)]
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    a = canon(q_shipping_priority(SF_DIR))
    b = canon(q_shipping_priority(SF_DIR, broadcast_limit=0))
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)


def test_similar_topk_rank_semantics():
    from simhash_ray.pipelines.queries import q_doc_similar_topk

    out = q_doc_similar_topk(SF_DIR).to_pandas()
    assert len(out) > 0
    for src, grp in out.groupby("src"):
        grp = grp.sort_values("rank")
        assert len(grp) <= 3
        assert list(grp["rank"]) == list(range(1, len(grp) + 1))
        sims = grp["sim"].to_numpy()
        assert (np.diff(sims) <= 1e-12).all()  # non-increasing by rank
        assert (grp["nbr"] != src).all()


def test_transition_counts_matches_pandas_lag():
    import ray.data as rd

    from simhash_ray.stages.window import transition_counts

    rng = np.random.default_rng(11)
    n = 3000
    tbl = pa.table(
        {
            "event_id": pa.array(range(n), type=pa.int64()),
            "user_id": pa.array(rng.integers(0, 80, n), type=pa.int64()),
            # duplicate timestamps on purpose: the id tie-break must decide
            "ts": pa.array(
                np.datetime64("2026-01-01") + rng.integers(0, 500, n)
                .astype("timedelta64[s]").astype("timedelta64[us]"),
                type=pa.timestamp("us"),
            ),
            "event_type": pa.array(
                rng.choice(["view", "click", "purchase", "refund"], n),
                type=pa.string(),
            ),
        }
    )
    got = (
        transition_counts(rd.from_arrow(tbl).repartition(13), n_parts=8)
        .to_pandas()
        .sort_values(["from_type", "to_type"])
        .reset_index(drop=True)
    )
    df = tbl.to_pandas().sort_values(["user_id", "ts", "event_id"])
    df["prev"] = df.groupby("user_id")["event_type"].shift(1)
    want = (
        df.dropna(subset=["prev"])
        .groupby(["prev", "event_type"], as_index=False)
        .size()
        .rename(columns={"prev": "from_type", "event_type": "to_type",
                         "size": "n"})
        .sort_values(["from_type", "to_type"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_events_cohorts_synthetic_triangle(tmp_path):
    import pyarrow.parquet as pq

    from simhash_ray.pipelines.queries import q_events_cohorts

    # 3 cohorts (weeks 0,1,2), deterministic activity: user u of cohort c
    # is active in weeks c..c+u%3  → a proper retention triangle
    rows = {"user_id": [], "ts": []}
    base = np.datetime64("2026-01-05T00:00:00", "us")  # a Monday
    week = np.timedelta64(7, "D").astype("timedelta64[us]")
    for u in range(30):
        c = u % 3
        for w in range(c, c + 1 + (u % 3)):
            rows["user_id"].append(u)
            rows["ts"].append(base + w * week + np.timedelta64(u, "h"))
    tbl = pa.table(
        {"user_id": pa.array(rows["user_id"], type=pa.int64()),
         "ts": pa.array(rows["ts"], type=pa.timestamp("us"))}
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(tbl, d / "events.parquet")

    got = (
        q_events_cohorts(str(d))
        .to_pandas()
        .sort_values(["cohort_week", "activity_week"])
        .reset_index(drop=True)
    )
    # naive reference
    df = tbl.to_pandas()
    df["week"] = df["ts"].dt.to_period("W-SUN").dt.start_time
    first = df.groupby("user_id")["week"].min().rename("cohort_week")
    act = df[["user_id", "week"]].drop_duplicates().join(first, on="user_id")
    want = (
        act.groupby(["cohort_week", "week"], as_index=False)
        .size()
        .rename(columns={"week": "activity_week", "size": "n_users"})
    )
    want["week_no"] = (
        (want["activity_week"] - want["cohort_week"]).dt.days // 7
    ).astype(np.int64)
    want = want[["cohort_week", "activity_week", "week_no", "n_users"]]
    want = want.sort_values(["cohort_week", "activity_week"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert got["week_no"].max() >= 2  # a real triangle, not one cohort

    # join path ≡ broadcast path
    alt = (
        q_events_cohorts(str(d), broadcast_limit=0)
        .to_pandas()
        .sort_values(["cohort_week", "activity_week"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(alt, got, check_dtype=False)
