"""Query-vs-DuckDB-oracle conformance at sf0.001 — a local replica of
the driver's correctness gate (same compare semantics: row count,
column names, order-insensitive value equality)."""

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as entry_mod

import os

SF_DIR = os.environ.get("GRAFT_TEST_SF", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def _to_pandas(obj):
    import pyarrow as pa
    import ray.data as rd

    if isinstance(obj, rd.Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


ORACLE_NAMES = sorted(entry_mod.oracle_sql())


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(name, con):
    ray_fn = entry_mod.queries()[name]
    got = _canon(_to_pandas(ray_fn(SF_DIR)))
    want = _canon(con.execute(entry_mod.oracle_sql()[name]).fetchdf())
    assert list(got.columns) == list(want.columns), (
        f"{name} column mismatch: {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name} row count {len(got)} vs {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


ROWS_ONLY = sorted(set(entry_mod.queries()) - set(entry_mod.oracle_sql()))


@pytest.mark.parametrize("name", ROWS_ONLY or ["<all queries have oracles>"])
def test_rows_only_queries_run(name):
    if not ROWS_ONLY:  # every registered query is covered by the oracle gate
        return
    df = _to_pandas(entry_mod.queries()[name](SF_DIR))
    assert df is not None
    assert len(df.columns) > 0


def test_segment_revenue_join_path_matches_broadcast():
    """Forcing broadcast_limit=0 exercises the distributed-join
    fallback (round-3 verdict item 7); both paths must agree."""
    from simhash_ray.pipelines.queries import q_segment_revenue

    a = _canon(_to_pandas(q_segment_revenue(SF_DIR)))
    b = _canon(_to_pandas(q_segment_revenue(SF_DIR, broadcast_limit=0)))
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)


def test_id_set_filter_join_paths_match_broadcast():
    """_id_set_filter's hash-join fallbacks (semi via inner join, anti
    via left-outer + null marker) must agree with the broadcast-set
    fast path on the same inputs."""
    import ray.data as rd

    from simhash_ray.pipelines.queries import _id_set_filter

    ds = rd.from_items([{"doc_id": i, "v": i * 10} for i in range(50)])
    # duplicate ids on purpose: both paths must keep SET semantics
    ids = rd.from_items(
        [{"doc_id": i} for i in range(0, 50, 3)]
        + [{"doc_id": i} for i in range(0, 50, 6)]
    )
    for keep in (True, False):
        a = (
            _id_set_filter(ds, ids, keep=keep)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        b = (
            _id_set_filter(ds, ids, keep=keep, limit=0)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            a[sorted(a.columns)], b[sorted(b.columns)], check_dtype=False
        )
        want = set(range(0, 50, 3)) if keep else set(range(50)) - set(range(0, 50, 3))
        assert set(a["doc_id"]) == want


def test_entry_smoke():
    df = _to_pandas(entry_mod.entry())
    assert len(df) > 0
    assert {"image_id", "cluster_id", "is_representative"} <= set(df.columns)
