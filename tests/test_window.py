"""rolling_time_avg semantics: RANGE-frame window (trailing w seconds,
equal-ts peers included), per-key isolation, and the virtual-axis /
per-run-fallback equivalence."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from simhash_ray.stages.window import rolling_time_avg

US = 1_000_000


def _ref(df: pd.DataFrame, window_s: int) -> pd.DataFrame:
    """O(n²) reference with SQL RANGE semantics."""
    rows = []
    for _, g in df.groupby("user_id"):
        ts = g["ts"].astype("int64").to_numpy()  # pandas datetime64 → ns
        val = g["value"].to_numpy()
        for i in range(len(g)):
            in_win = (ts >= ts[i] - window_s * 1_000_000_000) & (ts <= ts[i])
            rows.append(
                {
                    "event_id": g["event_id"].iloc[i],
                    "n_win": int(in_win.sum()),
                    "rolling_avg": float(val[in_win].mean()),
                }
            )
    return (
        pd.DataFrame(rows).sort_values("event_id").reset_index(drop=True)
    )


def _run(df: pd.DataFrame, window_s: int, **kw) -> pd.DataFrame:
    ds = rd.from_pandas(df).repartition(3)
    out = rolling_time_avg(ds, window_s=window_s, **kw).to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


def _mkdf(seed: int, n: int, n_users: int, tie_every: int = 5) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    ts = rng.integers(0, 3600 * US, size=n)
    ts[::tie_every] = ts[1::tie_every][: len(ts[::tie_every])]  # planted ties
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, n_users, size=n).astype(np.int64),
            "ts": pd.to_datetime(ts, unit="us"),
            "value": np.round(rng.uniform(0, 20, size=n), 2),
        }
    )


def test_rolling_matches_quadratic_reference(ray_session):
    df = _mkdf(0, 400, 7)
    got = _run(df, 600)
    want = _ref(df, 600)
    pd.testing.assert_series_equal(got["n_win"], want["n_win"], check_dtype=False)
    np.testing.assert_allclose(got["rolling_avg"], want["rolling_avg"], rtol=1e-12)


def test_rolling_equal_ts_peers_all_in_frame(ray_session):
    """SQL RANGE ... CURRENT ROW includes every row sharing the current
    ts — all three tied rows must see n_win=3."""
    df = pd.DataFrame(
        {
            "event_id": [1, 2, 3],
            "user_id": [5, 5, 5],
            "ts": pd.to_datetime([100 * US] * 3, unit="us"),
            "value": [1.0, 2.0, 6.0],
        }
    )
    got = _run(df, 600)
    assert got["n_win"].tolist() == [3, 3, 3]
    np.testing.assert_allclose(got["rolling_avg"], [3.0, 3.0, 3.0])


def test_rolling_boundary_inclusive_and_key_isolated(ray_session):
    """A row exactly window_s old is IN the frame; other keys never
    leak even at identical timestamps."""
    df = pd.DataFrame(
        {
            "event_id": [1, 2, 3],
            "user_id": [1, 1, 2],
            "ts": pd.to_datetime([0, 600 * US, 600 * US], unit="us"),
            "value": [10.0, 20.0, 99.0],
        }
    )
    got = _run(df, 600)
    by = got.set_index("event_id")
    assert by.loc[2, "n_win"] == 2 and by.loc[2, "rolling_avg"] == 15.0
    assert by.loc[3, "n_win"] == 1 and by.loc[3, "rolling_avg"] == 99.0


def test_rolling_fallback_path_matches_virtual_axis(ray_session):
    """Force the per-run searchsorted fallback (virtual_axis_limit=1 →
    every partition takes the overflow branch) and pin it equal to the
    vectorized virtual-axis path and the quadratic reference."""
    df = _mkdf(1, 300, 5)
    fast = _run(df, 600)
    slow = _run(df, 600, virtual_axis_limit=1)
    want = _ref(df, 600)
    pd.testing.assert_frame_equal(fast, slow, check_dtype=False)
    pd.testing.assert_series_equal(fast["n_win"], want["n_win"], check_dtype=False)
    np.testing.assert_allclose(fast["rolling_avg"], want["rolling_avg"], rtol=1e-12)


def _funnel_reference(df, steps):
    """Per-user Python reference: greedy-earliest strict chain."""
    out = []
    for uid, g in df.groupby("user_id"):
        g = g.sort_values("ts")
        prev = None
        ts_list = []
        for st in steps:
            cand = g[(g["event_type"] == st)]
            if prev is not None:
                cand = cand[cand["ts"] > prev]
            if len(cand) == 0:
                break
            prev = cand["ts"].iloc[0]
            ts_list.append(prev)
        if ts_list:
            row = {"user_id": uid, "n_steps": len(ts_list)}
            for i, t in enumerate(ts_list):
                row[f"t{i + 1}"] = t
            out.append(row)
    cols = ["user_id"] + [f"t{i + 1}" for i in range(len(steps))] + ["n_steps"]
    return (
        pd.DataFrame(out, columns=cols)
        .sort_values("user_id", ignore_index=True)
    )


def test_funnel_partial_paths_match_reference(ray_session):
    """Funnel edge coverage the testdata can't hit: users missing a
    step, out-of-order-only steps (click before any view), users with
    no step-1 event (absent from output), duplicate timestamps — both
    the vectorized virtual-axis path and the per-run fallback
    (virtual_axis_limit=1) equal the per-user Python reference."""
    import pyarrow as pa

    from simhash_ray.stages.window import funnel

    rng = np.random.default_rng(17)
    steps = ["view", "click", "purchase"]
    rows = []
    base = pd.Timestamp("2026-01-01").value // 1000  # us
    for uid in range(60):
        n_ev = rng.integers(1, 12)
        for _ in range(n_ev):
            rows.append(
                {
                    "user_id": uid,
                    "ts": pd.Timestamp(
                        (base + int(rng.integers(0, 3_600_000_000))) * 1000
                    ),
                    "event_type": steps[rng.integers(0, 3)]
                    if rng.random() < 0.8
                    else "error",
                }
            )
    # handcrafted edges
    t = lambda s: pd.Timestamp(f"2026-01-02 00:00:{s:02d}")
    rows += [  # user 100: click BEFORE the only view → funnel stops at t1
        {"user_id": 100, "ts": t(1), "event_type": "click"},
        {"user_id": 100, "ts": t(2), "event_type": "view"},
    ]
    rows += [  # user 101: view+click same ts → strict > rejects the click
        {"user_id": 101, "ts": t(1), "event_type": "view"},
        {"user_id": 101, "ts": t(1), "event_type": "click"},
        {"user_id": 101, "ts": t(3), "event_type": "click"},
    ]
    rows += [{"user_id": 102, "ts": t(1), "event_type": "error"}]  # no step 1
    df = pd.DataFrame(rows)
    want = _funnel_reference(df, steps)
    assert (want["n_steps"] < 3).any() and 102 not in set(want["user_id"])

    ev = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    for limit in (2**62, 1):  # vectorized axis, then per-run fallback
        got = (
            funnel(ev, steps, n_parts=4, virtual_axis_limit=limit)
            .to_pandas()
            .sort_values("user_id", ignore_index=True)
        )
        pd.testing.assert_frame_equal(
            got, want.astype(got.dtypes.to_dict()), check_dtype=False
        )


def test_window_dedup_matches_naive_and_layout_invariant():
    """window_dedup ≡ per-key sequential LAG rule, any block layout."""
    import pandas as pd

    from simhash_ray.stages.window import window_dedup

    rng = np.random.default_rng(31)
    n = 4000
    base = np.datetime64("2024-01-01", "us")
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 40, n).astype(np.int64),
            "event_type": rng.choice(["a", "b", "c"], n),
            "ts": base + rng.integers(0, 3_000_000, n).astype("timedelta64[s]").astype("timedelta64[us]"),
        }
    )
    # force ts ties inside keys so the id tie-break is exercised
    df.loc[1, ["user_id", "event_type", "ts"]] = df.loc[0, ["user_id", "event_type", "ts"]]
    win = 3600

    def naive(d):
        kept = []
        for _, g in d.groupby(["user_id", "event_type"]):
            g = g.sort_values(["ts", "event_id"])
            prev = None
            for _, r in g.iterrows():
                if prev is None or (r["ts"] - prev).total_seconds() > win:
                    kept.append(r["event_id"])
                prev = r["ts"]
        return sorted(kept)

    expect = naive(df)
    for parts in (3, 17):
        out = window_dedup(
            rd.from_pandas(df).repartition(parts), window_s=win, n_parts=8
        ).to_pandas()
        assert sorted(out["event_id"]) == expect, parts
        assert set(out.columns) == {"event_id", "user_id", "event_type", "ts"}


# ---------------------------------------------------------------------------
# cumulative_sum (running total)


def test_cumulative_sum_matches_pandas_window():
    import pandas as pd

    from simhash_ray.stages.window import cumulative_sum

    rng = np.random.default_rng(5)
    n = 3000
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 40, n).astype(np.int64),
            "ts": pd.to_datetime(
                rng.integers(0, 10_000, n), unit="s", origin="2024-01-01"
            ),
            "value": rng.normal(size=n),
        }
    )
    out = (
        cumulative_sum(rd.from_pandas(df).repartition(7), n_parts=8)
        .to_pandas()
        .set_index("event_id")["running_sum"]
        .sort_index()
    )
    truth = (
        df.sort_values(["user_id", "ts", "event_id"])
        .assign(rs=lambda d: d.groupby("user_id")["value"].cumsum())
        .set_index("event_id")["rs"]
        .sort_index()
    )
    assert np.allclose(out.to_numpy(), truth.to_numpy(), atol=1e-9)


def test_cumulative_sum_ts_tie_broken_by_id():
    import pandas as pd

    from simhash_ray.stages.window import cumulative_sum

    df = pd.DataFrame(
        {
            "event_id": np.array([3, 1, 2], dtype=np.int64),
            "user_id": np.array([7, 7, 7], dtype=np.int64),
            "ts": pd.to_datetime(["2024-01-01"] * 3),  # all tied
            "value": [10.0, 1.0, 100.0],
        }
    )
    out = (
        cumulative_sum(rd.from_pandas(df), n_parts=2)
        .to_pandas()
        .set_index("event_id")["running_sum"]
    )
    assert out[1] == 1.0 and out[2] == 101.0 and out[3] == 111.0


def test_tumbling_partial_arrow_kernel_matches_pandas_reference():
    """The tumbling partial's Arrow segmented-sum hot path (and the
    null-bearing pandas fallback) must both reproduce the pinned
    groupby semantics: null keys dropped, NaN-skipping sums."""
    from simhash_ray.stages.window import tumbling_window_agg

    rng = np.random.default_rng(3)
    n = 5000
    df = pd.DataFrame(
        {
            "event_type": rng.choice(["a", "b", "c", "d"], n),
            "ts": pd.to_datetime(rng.integers(0, 86400 * US, n), unit="us"),
            "value": np.round(rng.uniform(0, 10, n), 3),
        }
    )
    # null-bearing copy exercises the fallback branch
    df_null = df.copy()
    df_null.loc[::97, "event_type"] = None
    df_null.loc[1::113, "value"] = np.nan

    for frame in (df, df_null):
        got = (
            tumbling_window_agg(rd.from_pandas(frame).repartition(4), window_s=3600)
            .to_pandas()
            .sort_values(["event_type", "window_start"])
            .reset_index(drop=True)
        )
        r = frame.dropna(subset=["event_type"]).copy()
        w_us = 3600 * US
        r["window_start"] = pd.to_datetime(
            (r["ts"].astype("int64") // 1000 // w_us) * w_us, unit="us"
        )
        ref = (
            r.groupby(["event_type", "window_start"], as_index=False)
            .agg(n_events=("value", "size"), sum_value=("value", "sum"))
            .sort_values(["event_type", "window_start"])
            .reset_index(drop=True)
        )
        assert len(got) == len(ref)
        assert (got["event_type"] == ref["event_type"]).all()
        assert (got["n_events"] == ref["n_events"]).all()
        np.testing.assert_allclose(got["sum_value"], np.round(ref["sum_value"], 6))


def test_tumbling_pre_epoch_and_nan_value_consistency():
    """r5 review findings: (a) pre-epoch timestamps bucket identically
    in the hot path and the null-fallback path (both truncate toward
    zero, matching DuckDB's integer //); (b) a float NaN stored as a
    VALUE (null_count==0) routes to the NaN-skipping path."""
    import pyarrow as pa

    from simhash_ray.stages.window import tumbling_window_agg

    ts = pd.to_datetime(
        [-1, -3600 * US - 1, -7200 * US, 10, 3600 * US + 5], unit="us"
    )
    base = pd.DataFrame(
        {"event_type": ["a"] * 5, "ts": ts, "value": [1.0] * 5}
    )
    hot = (
        tumbling_window_agg(rd.from_pandas(base), window_s=3600)
        .to_pandas()
        .sort_values("window_start")
        .reset_index(drop=True)
    )
    # force the fallback path with one extra null-key row
    with_null = pd.concat(
        [base, pd.DataFrame({"event_type": [None], "ts": [ts[0]], "value": [1.0]})],
        ignore_index=True,
    )
    fb = (
        tumbling_window_agg(rd.from_pandas(with_null), window_s=3600)
        .to_pandas()
        .sort_values("window_start")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(hot, fb)
    # truncation semantics: ts=-1us and ts=+10us share window 0
    w0 = hot[hot["window_start"] == pd.Timestamp(0)]
    assert int(w0["n_events"].iloc[0]) == 2

    # NaN stored as a value (arrow null_count == 0) must be skipped
    tbl = pa.table(
        {
            "event_type": pa.array(["a", "a", "b"]),
            "ts": pa.array([pd.Timestamp(10, unit="us")] * 3, type=pa.timestamp("us")),
            "value": pa.array(np.array([1.0, np.nan, 2.0]), type=pa.float64()),
        }
    )
    assert tbl["value"].null_count == 0  # genuinely a value, not a null
    out = (
        tumbling_window_agg(rd.from_arrow(tbl), window_s=3600)
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    assert out.loc[0, "sum_value"] == 1.0  # NaN skipped, not propagated
    assert out.loc[0, "n_events"] == 2
