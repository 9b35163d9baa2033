"""Naive-truth tests for Hamming retrieval, weighted sampling, and the
image dedup report (round-4 late additions)."""

import numpy as np
import pandas as pd
import pyarrow as pa

SF_DIR = "/root/testdata/sf0.001"


def test_images_hamming_topk_matches_bruteforce():
    from simhash_ray.pipelines.queries import (
        fixture_dir_for_sf,
        q_images_hamming_topk,
        read_images_fixture,
    )

    got = q_images_hamming_topk(SF_DIR).to_pandas()
    sigs = read_images_fixture(SF_DIR, columns=["image_id", "phash"]).to_pandas()
    ids = sigs["image_id"].to_numpy(dtype=object)
    h = sigs["phash"].to_numpy().view(np.uint64)
    qids = np.sort(ids)[:20]
    rows = []
    for qid in qids:
        qh = h[ids == qid][0]
        dist = np.array([bin(int(qh ^ x)).count("1") for x in h])
        order = np.lexsort((ids, dist))
        order = [i for i in order if ids[i] != qid][:5]
        for r, i in enumerate(order, 1):
            rows.append((qid, ids[i], int(dist[i]), r))
    want = pd.DataFrame(rows, columns=["qid", "nbr", "dist", "rank"])
    a = got.sort_values(["qid", "rank"]).reset_index(drop=True)
    b = want.sort_values(["qid", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a[["qid", "nbr", "dist", "rank"]], b)


def test_weighted_sample_matches_driver_ranking_and_layout():
    import ray.data as rd

    from simhash_ray.functions.hashing import md5_u32_of_int_ids
    from simhash_ray.pipelines.queries import q_doc_weighted_sample

    got = q_doc_weighted_sample(SF_DIR).to_pandas()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet",
                           columns=["doc_id", "n_chars"])
    docs = docs[docs["n_chars"] > 0]
    u = (md5_u32_of_int_ids(docs["doc_id"].to_numpy()).astype(np.float64)
         + 0.5) / 2**32
    key = np.log(u) / docs["n_chars"].to_numpy(dtype=np.float64)
    order = np.lexsort((docs["doc_id"].to_numpy(), -key))[:100]
    want = docs.iloc[order].reset_index(drop=True)
    want["rank"] = np.arange(1, len(want) + 1)
    a = got.sort_values("rank").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        a[["doc_id", "n_chars", "rank"]], want[["doc_id", "n_chars", "rank"]],
        check_dtype=False,
    )
    # heavier docs must be over-represented vs uniform: the mean weight
    # of the sample exceeds the corpus mean (ES property, deterministic
    # here because the keys are fixed by md5)
    assert a["n_chars"].mean() > docs["n_chars"].mean()


def test_images_dedup_report_consistent_with_assignment():
    from simhash_ray.pipelines.queries import (
        _flagship_dedup,
        fixture_dir_for_sf,
        q_images_dedup_report,
        read_images_fixture,
    )

    rep = q_images_dedup_report(SF_DIR).to_pandas()
    fmts = read_images_fixture(SF_DIR, columns=["image_id", "fmt"]).to_pandas()
    assign = _flagship_dedup(fixture_dir_for_sf(SF_DIR)).assignment.to_pandas()
    merged = assign.merge(fmts, on="image_id")
    want = merged.groupby("fmt").agg(
        n_images=("is_representative", "size"),
        n_dups=("is_representative", lambda s: int((~s).sum())),
    )
    got = rep.set_index("fmt")
    assert int(got["n_images"].sum()) == len(fmts)
    for fmt, row in want.iterrows():
        assert got.loc[fmt, "n_images"] == row["n_images"]
        assert got.loc[fmt, "n_dups"] == row["n_dups"]
        assert abs(
            got.loc[fmt, "dup_rate"] - row["n_dups"] / row["n_images"]
        ) < 1e-12


def test_images_cluster_sizes_mass_conservation():
    from simhash_ray.pipelines.queries import q_images_cluster_sizes, read_images_fixture

    hist = q_images_cluster_sizes(SF_DIR).to_pandas()
    n = len(read_images_fixture(SF_DIR, columns=["image_id"]).to_pandas())
    assert int((hist["cluster_size"] * hist["n_clusters"]).sum()) == n
    assert (hist["cluster_size"] >= 1).all()


def test_images_sig_bitstats_totals():
    from simhash_ray.pipelines.queries import q_images_sig_bitstats, read_images_fixture

    stats = q_images_sig_bitstats(SF_DIR).to_pandas()
    assert len(stats) == 64
    h = read_images_fixture(SF_DIR, columns=["image_id", "phash"]).to_pandas()[
        "phash"
    ].to_numpy().view(np.uint64)
    total_pop = sum(bin(int(x)).count("1") for x in h)
    assert int(stats["n_set"].sum()) == total_pop
    assert (stats["n_set"] <= len(h)).all()
