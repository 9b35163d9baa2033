"""Unit semantics of stages/joins: asof_join (backward-inclusive
match, null fill, max-tie_break determinism, typed empty groups) and
range_join (keyed and keyless-bucketed modes vs a brute-force
reference; pair-meets-exactly-once under bucket replication)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from simhash_ray.stages.joins import asof_join, range_join


def _ds(rows: dict) -> rd.Dataset:
    return rd.from_arrow(pa.table(rows))


def _result(ds: rd.Dataset):
    df = ds.to_pandas()
    return df.sort_values(["k", "t"]).reset_index(drop=True)


def test_asof_backward_inclusive_and_null_fill(ray_session):
    left = _ds({"k": [1, 1, 1, 2, 3], "t": [5, 10, 20, 7, 1], "lv": [0, 1, 2, 3, 4]})
    right = _ds({"k": [1, 1, 2], "t": [5, 15, 9], "rv": [100, 150, 290]})
    out = _result(asof_join(left, right, on="t", by="k"))
    # k=1: t=5 matches right t=5 (inclusive); t=10 -> t=5; t=20 -> t=15
    # k=2: t=7 has no right t<=7 -> nulls; k=3: no right group at all -> nulls
    assert out["t_r"].tolist()[:3] == [5, 5, 15]
    assert out["rv_r"].tolist()[:3] == [100, 100, 150]
    assert out["rv_r"].isna().tolist() == [False, False, False, True, True]
    assert out["t_r"].isna().tolist() == [False, False, False, True, True]
    # left payload survives untouched
    assert out["lv"].tolist() == [0, 1, 2, 3, 4]


def test_asof_tie_break_max_wins(ray_session):
    left = _ds({"k": [7], "t": [10], "lv": [0]})
    # three right rows tied at t=10: the max tie_break (id=9) must win
    right = _ds({"k": [7, 7, 7], "t": [10, 10, 10], "id": [3, 9, 1]})
    out = asof_join(left, right, on="t", by="k", tie_break="id").to_pandas()
    assert out["id_r"].tolist() == [9]


def test_asof_schema_fixed_and_right_only_groups_dropped(ray_session):
    left = _ds({"k": [1], "t": [1], "lv": [5]})
    right = _ds({"k": [2, 2], "t": [0, 1], "rv": [8, 9]})
    ds = asof_join(left, right, on="t", by="k")
    out = ds.to_pandas()
    # right-only group k=2 emits nothing; schema stays the declared one
    assert len(out) == 1 and out["t_r"].isna().all()
    assert set(out.columns) == {"k", "t", "lv", "t_r", "rv_r"}
    assert ds.schema().names == ["k", "t", "lv", "t_r", "rv_r"]


def test_asof_tie_break_must_be_right_payload(ray_session):
    left = _ds({"k": [1], "t": [1]})
    right = _ds({"k": [1], "t": [1]})
    try:
        asof_join(left, right, on="t", by="k", tie_break="missing")
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_range_join_keyed_basic(ray_session):
    pts = _ds({"k": [1, 1, 2], "t": [5, 11, 5], "pid": [0, 1, 2]})
    iv = _ds({"k": [1, 1, 2], "lo": [0, 10, 6], "hi": [10, 20, 9], "wid": [7, 8, 9]})
    out = (
        range_join(pts, iv, on="t", lo="lo", hi="hi", by="k")
        .to_pandas()
        .sort_values(["pid", "wid_r"])
        .reset_index(drop=True)
    )
    # point (1,5)->window 7 only; (1,11)->window 8; (2,5) outside [6,9]
    assert list(zip(out["pid"], out["wid_r"])) == [(0, 7), (1, 8)]
    assert set(out.columns) == {"k", "t", "pid", "lo_r", "hi_r", "wid_r"}


def _range_brute(pk, pt, ik, ilo, ihi):
    pairs = set()
    for i in range(len(pt)):
        for j in range(len(ilo)):
            if (pk is None or pk[i] == ik[j]) and ilo[j] <= pt[i] <= ihi[j]:
                pairs.add((i, j))
    return pairs


def test_range_join_keyed_matches_brute_force(ray_session):
    rng = np.random.default_rng(7)
    n_p, n_i = 250, 120
    pk = rng.integers(0, 10, n_p)
    pt = rng.integers(0, 1000, n_p)
    ik = rng.integers(0, 10, n_i)
    ilo = rng.integers(0, 1000, n_i)
    ihi = ilo + rng.integers(0, 120, n_i)
    pts = _ds({"k": pk, "t": pt, "pid": np.arange(n_p)})
    iv = _ds({"k": ik, "lo": ilo, "hi": ihi, "wid": np.arange(n_i)})
    out = range_join(pts, iv, on="t", lo="lo", hi="hi", by="k").to_pandas()
    got = set(zip(out["pid"], out["wid_r"]))
    assert got == _range_brute(pk, pt, ik, ilo, ihi)


def test_range_join_bucketed_matches_brute_force_each_pair_once(ray_session):
    """Keyless mode: bucket replication must produce every containing
    pair EXACTLY once (list equality, not set equality)."""
    rng = np.random.default_rng(11)
    n_p, n_i = 300, 80
    pt = rng.integers(0, 500, n_p)
    ilo = rng.integers(0, 500, n_i)
    ihi = ilo + rng.integers(0, 90, n_i)  # spans several 25-wide buckets
    pts = _ds({"t": pt, "pid": np.arange(n_p)})
    iv = _ds({"lo": ilo, "hi": ihi, "wid": np.arange(n_i)})
    out = range_join(
        pts, iv, on="t", lo="lo", hi="hi", bucket_width=25
    ).to_pandas()
    got = sorted(zip(out["pid"], out["wid_r"]))
    want = sorted(_range_brute(None, pt, None, ilo, ihi))
    assert got == want  # exact multiplicity: no dup from replication


def test_range_join_timestamp_columns(ray_session):
    ts = np.array(["2024-01-01T00:00:05", "2024-01-01T01:00:00"], dtype="datetime64[us]")
    lo = np.array(["2024-01-01T00:00:00"], dtype="datetime64[us]")
    hi = np.array(["2024-01-01T00:30:00"], dtype="datetime64[us]")
    pts = _ds({"t": ts, "pid": [0, 1]})
    iv = _ds({"lo": lo, "hi": hi, "wid": [5]})
    out = range_join(
        pts, iv, on="t", lo="lo", hi="hi", bucket_width=60_000_000
    ).to_pandas()
    assert out["pid"].tolist() == [0] and out["wid_r"].tolist() == [5]


def test_range_join_keyless_requires_bucket_width(ray_session):
    pts = _ds({"t": [1], "pid": [0]})
    iv = _ds({"lo": [0], "hi": [2], "wid": [1]})
    try:
        range_join(pts, iv, on="t", lo="lo", hi="hi")
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_asof_matches_numpy_reference(ray_session):
    """Randomized cross-check against a brute-force per-row scan."""
    rng = np.random.default_rng(42)
    n_l, n_r = 300, 200
    lk = rng.integers(0, 12, n_l)
    lt = rng.integers(0, 50, n_l)
    rk = rng.integers(0, 12, n_r)
    rt = rng.integers(0, 50, n_r)
    rid = np.arange(n_r)
    left = _ds({"k": lk, "t": lt, "lid": np.arange(n_l)})
    right = _ds({"k": rk, "t": rt, "rid": rid})
    out = (
        asof_join(left, right, on="t", by="k", tie_break="rid")
        .to_pandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    for i in range(n_l):
        cand = np.flatnonzero((rk == lk[i]) & (rt <= lt[i]))
        row = out.iloc[i]
        if len(cand) == 0:
            assert np.isnan(row["rid_r"]) or row["rid_r"] is None
        else:
            best_t = rt[cand].max()
            expect = rid[cand[rt[cand] == best_t]].max()
            assert row["rid_r"] == expect, f"row {i}"
