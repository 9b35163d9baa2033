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


# --------------------------------------------------------------------------
# BloomFilter


def test_bloom_no_false_negatives_and_fpr(ray_session):
    from simhash_ray.stages.sketch import BloomFilter

    bf = BloomFilter.empty(1 << 18, 7)
    members = np.array([f"url/{i}" for i in range(5000)], dtype=object)
    bf.add(members)
    assert bf.contains(members).all()  # the hard guarantee
    probe = np.array([f"other/{i}" for i in range(50000)], dtype=object)
    fpr = bf.contains(probe).mean()
    # n=5000, m=2^18, k=7 → theoretical ≈ 2.3e-5; allow generous slack
    assert fpr < 0.01, fpr


def test_bloom_distributed_build_is_partition_invariant(ray_session):
    import pandas as pd

    from simhash_ray.stages.sketch import BloomFilter, build_bloom

    vals = [f"doc {i % 700}" for i in range(3000)]  # dupes across blocks
    ds = rd.from_arrow(pa.table({"v": vals})).repartition(7)
    bf = build_bloom(ds, "v", m_bits=1 << 16, k=5)
    ref = BloomFilter.empty(1 << 16, 5)
    ref.add(np.array(vals, dtype=object))
    assert np.array_equal(bf.words, ref.words)  # OR-fold == local build
    bf1 = build_bloom(ds.repartition(2), "v", m_bits=1 << 16, k=5)
    assert np.array_equal(bf1.words, bf.words)


def test_bloom_split_prefilter_composes_with_exact_check(ray_session):
    """The decontamination shape: bloom-novel rows are provably clean;
    bloom-member rows go to the exact check; union == exact answer."""
    import ray

    from simhash_ray.stages.sketch import build_bloom, bloom_split

    seen = [f"s{i}" for i in range(400)]
    corpus_vals = [f"s{i}" for i in range(0, 400, 2)] + [
        f"n{i}" for i in range(600)
    ]
    corpus = rd.from_arrow(pa.table({"v": corpus_vals, "row": list(range(len(corpus_vals)))}))
    bf = build_bloom(rd.from_arrow(pa.table({"v": seen})), "v", m_bits=1 << 16, k=5)
    ref = ray.put((bf.m_bits, bf.k, bf.words))

    novel = bloom_split(corpus, "v", ref, novel=True).to_pandas()
    candid = bloom_split(corpus, "v", ref, novel=False).to_pandas()
    # no member leaks into the novel side
    assert not set(novel["v"]) & set(seen)
    # split is a partition of the corpus
    assert len(novel) + len(candid) == len(corpus_vals)
    # exact verify over just the candidates reproduces the true clean set
    truly_clean = set(candid["v"]) - set(seen)
    got_clean = set(novel["v"]) | truly_clean
    want_clean = set(corpus_vals) - set(seen)
    assert got_clean == want_clean


def test_bloom_int_column(ray_session):
    import ray

    from simhash_ray.stages.sketch import build_bloom, bloom_split

    base = rd.from_arrow(pa.table({"doc_id": list(range(0, 1000, 3))}))
    bf = build_bloom(base, "doc_id", m_bits=1 << 16, k=5)
    ref = ray.put((bf.m_bits, bf.k, bf.words))
    probe = rd.from_arrow(pa.table({"doc_id": list(range(100))}))
    novel = bloom_split(probe, "doc_id", ref, novel=True).to_pandas()
    assert all(i % 3 != 0 for i in novel["doc_id"])


# --------------------------------------------------------------------------
# HyperLogLog


def _hll_serial_registers(values, p):
    """Reference: per-value register update, one Python loop."""
    from simhash_ray.stages.sketch import BloomFilter, _bit_length_u64

    m = 1 << p
    regs = np.zeros(m, dtype=np.int64)
    h = BloomFilter._hash(np.asarray(values, dtype=object)).astype(np.uint64)
    for hv in h:
        b = int(hv >> np.uint64(64 - p))
        w = np.uint64((int(hv) << p) & ((1 << 64) - 1))
        rho = 64 - p + 1 if w == 0 else 65 - int(_bit_length_u64(np.array([w]))[0])
        regs[b] = max(regs[b], rho)
    return regs


def test_hll_partials_fold_to_serial_registers(ray_session):
    """groupby-MAX over per-block partials == the serial register file,
    independent of partitioning."""
    from ray.data.aggregate import Max

    from simhash_ray.stages.sketch import hll_partials

    vals = [f"doc-{i % 700}" for i in range(2000)]
    want = _hll_serial_registers(vals, 10)
    for blocks in (1, 7):
        ds = rd.from_items([{"text": v} for v in vals]).repartition(blocks)
        folded = (
            hll_partials(ds, "text", p=10)
            .groupby("bucket")
            .aggregate(Max("rho", alias_name="rho"))
            .to_pandas()
        )
        got = np.zeros(1 << 10, dtype=np.int64)
        got[folded["bucket"].to_numpy()] = folded["rho"].to_numpy()
        np.testing.assert_array_equal(got, want)


def test_hll_estimate_within_error_bound(ray_session):
    """Relative error within ~5·(1.04/sqrt(m)) for a 20k-distinct set."""
    from simhash_ray.stages.sketch import hll_distinct

    n = 20_000
    ds = rd.from_items([{"text": f"v{i}"} for i in range(n)]).repartition(4)
    est = hll_distinct(ds, "text", p=12).to_pandas()["n_distinct_est"][0]
    assert abs(est - n) / n < 5 * 1.04 / np.sqrt(4096), est


def test_hll_small_range_linear_counting_and_nulls(ray_session):
    """Small cardinalities take the linear-counting branch and stay
    near-exact; NULLs are skipped like COUNT(DISTINCT)."""
    from simhash_ray.stages.sketch import hll_distinct

    items = [{"text": f"x{i % 50}"} for i in range(500)] + [{"text": None}] * 20
    ds = rd.from_items(items).repartition(3)
    out = hll_distinct(ds, "text", p=12).to_pandas()
    assert abs(out["n_distinct_est"][0] - 50) < 5
    assert out["n_zero"][0] > 0


# --------------------------------------------------------------------------
# Count-Min sketch


def test_cms_never_undercounts_and_exact_on_clean_rows(ray_session):
    """est >= true for every value (the CMS one-sided guarantee), and
    est == true for values with at least one collision-free row —
    computed deterministically from the md5 positions themselves."""
    from simhash_ray.stages.sketch import (
        cms_cells,
        cms_partial_table,
        cms_point_estimates,
        cms_positions,
    )

    depth, width = 4, 1 << 14
    rng = np.random.default_rng(5)
    uniq = np.array([f"tok{i}" for i in range(300)], dtype=object)
    weights = rng.integers(1, 50, size=len(uniq)).astype(np.int64)

    parts = rd.from_arrow(
        pa.table({"v": uniq, "n": weights})
    ).repartition(7).map_batches(
        lambda b: cms_partial_table(
            b["v"].to_numpy(zero_copy_only=False),
            b["n"].to_numpy(zero_copy_only=False),
            depth,
            width,
        ),
        batch_format="pyarrow",
    )
    cells = cms_cells(parts, depth, width).to_pandas()
    est = cms_point_estimates(cells, uniq, depth, width)
    assert (est >= weights).all()

    pos = cms_positions(uniq, depth, width)
    for i in range(len(uniq)):
        clean = False
        for r in range(depth):
            if (pos[:, r] == pos[i, r]).sum() == 1:  # no other value shares
                clean = True
        if clean:
            assert est[i] == weights[i], (uniq[i], est[i], weights[i])


def test_cms_fold_is_partition_invariant(ray_session):
    """The folded cell table is a deterministic function of the input
    multiset: any block decomposition sums to the serial matrix."""
    from simhash_ray.stages.sketch import cms_cells, cms_partial_table

    depth, width = 3, 512
    vals = np.array([f"w{i % 40}" for i in range(1000)], dtype=object)
    ones = np.ones(len(vals), dtype=np.int64)
    serial = cms_partial_table(vals, ones, depth, width).to_pandas()

    t = pa.table({"v": vals, "n": ones})
    for n_parts in (1, 4, 11):
        parts = rd.from_arrow(t).repartition(n_parts).map_batches(
            lambda b: cms_partial_table(
                b["v"].to_numpy(zero_copy_only=False),
                b["n"].to_numpy(zero_copy_only=False),
                depth,
                width,
            ),
            batch_format="pyarrow",
        )
        folded = (
            cms_cells(parts, depth, width)
            .to_pandas()
            .sort_values(["r", "c"], ignore_index=True)
        )
        import pandas as pd

        pd.testing.assert_frame_equal(
            folded, serial.sort_values(["r", "c"], ignore_index=True)
        )


def test_cms_empty_and_validation(ray_session):
    from simhash_ray.stages.sketch import (
        cms_partial_table,
        cms_point_estimates,
        cms_positions,
    )
    import pytest

    empty = cms_partial_table(np.array([], dtype=object), np.array([], dtype=np.int64), 4, 64)
    assert empty.num_rows == 0 and empty.schema.names == ["r", "c", "cnt"]
    assert len(cms_point_estimates(empty, np.array([], dtype=object), 4, 64)) == 0
    with pytest.raises(ValueError):
        cms_positions(np.array(["a"], dtype=object), 5, 64)  # md5 has 4 slices


def test_bloom_build_sparse_dense_and_tree_fold_equal():
    """The sparse-partial + tree-fold build is bit-identical to a
    serial add, for small blocks (sparse path), a big single block
    (dense path), and enough blocks to trigger the tree level."""
    import pandas as pd

    from simhash_ray.stages.sketch import BloomFilter, build_bloom

    rng = np.random.default_rng(41)
    vals = rng.integers(0, 2**62, 5000).astype(np.int64)
    serial = BloomFilter.empty(1 << 16, 5)
    serial.add(vals)
    # many tiny blocks → sparse partials + tree fold (fanin 4 ≪ blocks)
    ds = rd.from_pandas(pd.DataFrame({"v": vals})).repartition(40)
    bf = build_bloom(ds, "v", m_bits=1 << 16, k=5, tree_fanin=4)
    assert np.array_equal(bf.words, serial.words)
    # one dense block: k*n*8 bytes > m_bits/8 forces the dense partial
    bf2 = build_bloom(
        rd.from_pandas(pd.DataFrame({"v": vals})).repartition(1),
        "v", m_bits=1 << 12, k=5, tree_fanin=64,
    )
    serial2 = BloomFilter.empty(1 << 12, 5)
    serial2.add(vals)
    assert np.array_equal(bf2.words, serial2.words)


def test_hll_partials_by_key_fold_equals_serial_and_accuracy():
    import pandas as pd

    from simhash_ray.stages.sketch import (
        hll_estimate,
        hll_partials,
        hll_partials_by_key,
    )

    rng = np.random.default_rng(6)
    n = 6000
    df = pd.DataFrame(
        {
            "win": rng.integers(0, 4, n).astype(np.int64),
            "user": rng.integers(0, 700, n).astype(np.int64),
        }
    )
    p = 12
    parts = (
        hll_partials_by_key(
            rd.from_pandas(df).repartition(9), "win", "user", p=p
        )
        .to_pandas()
        .groupby(["key", "bucket"], as_index=False)["rho"]
        .max()
    )
    for w, sub in parts.groupby("key"):
        # serial reference: single-partition per-key registers
        one = df[df["win"] == w][["user"]]
        ref = (
            hll_partials(rd.from_pandas(one).repartition(1), "user", p=p)
            .to_pandas()
            .groupby("bucket", as_index=False)["rho"]
            .max()
        )
        got = sub[["bucket", "rho"]].reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got.sort_values("bucket").reset_index(drop=True),
            ref.sort_values("bucket").reset_index(drop=True),
        )
        est = hll_estimate(sub["bucket"].to_numpy(), sub["rho"].to_numpy(), p)
        exact = one["user"].nunique()
        assert abs(est["n_distinct_est"] - exact) / exact < 0.08  # ~3 sigma


def test_hll_partials_by_key_skips_nulls():
    import pandas as pd

    from simhash_ray.stages.sketch import hll_partials_by_key

    df = pd.DataFrame(
        {
            "win": pd.array([1, 1, None, 2], dtype="Int64"),
            "user": pd.array([10, None, 5, 7], dtype="Int64"),
        }
    )
    parts = hll_partials_by_key(rd.from_pandas(df), "win", "user").to_pandas()
    # only (win=1,user=10) and (win=2,user=7) contribute
    assert set(parts["key"]) == {1, 2}
    assert len(parts) == 2


def test_kmv_by_key_matches_serial_and_is_accurate():
    import pandas as pd

    from simhash_ray.stages.sketch import kmv_distinct_by_key

    rng = np.random.default_rng(12)
    n = 8000
    df = pd.DataFrame(
        {
            "win": rng.integers(0, 5, n).astype(np.int64),
            "user": rng.integers(0, 900, n).astype(np.int64),
        }
    )
    out = (
        kmv_distinct_by_key(
            rd.from_pandas(df).repartition(11), "win", "user", k=64
        )
        .to_pandas()
        .set_index("key")
        .sort_index()
    )
    import hashlib as _hl

    for w, sub in df.groupby("win"):
        hs = sorted(
            _hl.md5(str(v).encode()).hexdigest() for v in sub["user"].unique()
        )
        if len(hs) < 64:
            ref = float(len(hs))
        else:
            ref = 63 / (int(hs[63][:16], 16) / 2.0**64)
        assert out.loc[w, "n_distinct_est"] == round(ref, 6)
        exact = sub["user"].nunique()
        assert abs(out.loc[w, "n_distinct_est"] - exact) / exact < 0.4  # k=64

    # partition invariance
    out2 = (
        kmv_distinct_by_key(
            rd.from_pandas(df).repartition(3), "win", "user", k=64
        )
        .to_pandas()
        .set_index("key")
        .sort_index()
    )
    pd.testing.assert_frame_equal(out, out2)


def test_kmv_by_key_exact_branch_and_nulls():
    import pandas as pd

    from simhash_ray.stages.sketch import kmv_distinct_by_key

    df = pd.DataFrame(
        {
            "win": pd.array([1, 1, 1, 2, None], dtype="Int64"),
            "user": pd.array([5, 5, 9, 7, 3], dtype="Int64"),
        }
    )
    out = (
        kmv_distinct_by_key(rd.from_pandas(df), "win", "user", k=64)
        .to_pandas()
        .set_index("key")
    )
    assert out.loc[1, "n_distinct_est"] == 2.0  # exact below k
    assert out.loc[2, "n_distinct_est"] == 1.0
    assert set(out.index) == {1, 2}  # null key skipped


def test_hll_partials_by_key_sparse_path_equals_dense():
    import pandas as pd

    from simhash_ray.stages.sketch import hll_partials_by_key

    rng = np.random.default_rng(11)
    n = 4000
    df = pd.DataFrame(
        {
            "win": rng.integers(0, 50, n).astype(np.int64),
            "user": rng.integers(0, 900, n).astype(np.int64),
        }
    )
    ds = rd.from_pandas(df).repartition(5)

    def fold(parts):
        return (
            parts.to_pandas()
            .groupby(["key", "bucket"], as_index=False)["rho"]
            .max()
            .sort_values(["key", "bucket"])
            .reset_index(drop=True)
        )

    dense = fold(hll_partials_by_key(ds, "win", "user", p=10))
    # dense_cap=0 forces the sparse lexsort+segmented-max branch
    sparse = fold(hll_partials_by_key(ds, "win", "user", p=10, dense_cap=0))
    pd.testing.assert_frame_equal(dense, sparse)
