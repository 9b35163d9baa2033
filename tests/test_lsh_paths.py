"""Broadcast vs distributed candidate-generation equivalence: the two
paths (shuffle-free band tasks over broadcast sigs; groupby band-bucket
shuffle) must produce the same verified edge set."""

import numpy as np
import pandas as pd
import pytest
import pyarrow as pa
import ray.data as rd

from simhash_ray.config import DEFAULT_CONFIG
from simhash_ray.fixtures import FixtureSpec, generate_fixture
from simhash_ray.pipelines.dedup_images import (
    cluster_broadcast,
    dup_edges,
    signatures,
)
from simhash_ray.stages.collapse import collapse_exact
from simhash_ray.stages.lsh import make_verifier


def test_broadcast_and_distributed_edges_agree():
    fx = generate_fixture(FixtureSpec(n_rows=500, seed=21))
    images = rd.from_arrow(fx["images"])
    collapsed = collapse_exact(signatures(images, DEFAULT_CONFIG), 16).materialize()

    dist = dup_edges(collapsed, DEFAULT_CONFIG, 16).to_pandas()
    dist_pairs = set(map(tuple, dist[["a", "b"]].itertuples(index=False)))

    _, edge_df = cluster_broadcast(collapsed, DEFAULT_CONFIG)
    bc_pairs = set(map(tuple, edge_df[["a", "b"]].itertuples(index=False)))

    assert dist_pairs == bc_pairs
    assert len(bc_pairs) > 0


def test_make_verifier_filters_by_space_tau():
    batch = pa.table(
        {
            "a": pa.array(["x", "y", "z"]),
            "b": pa.array(["p", "q", "r"]),
            "sig_a": pa.array([0, 0, 0], type=pa.int64()),
            "sig_b": pa.array([0b111, 0b11111, 0], type=pa.int64()),
            "space": pa.array([0, 0, 1], type=pa.int32()),
            "star": pa.array([False, False, False]),
        }
    )
    out = make_verifier({0: 4, 1: 0})(batch)
    assert out["a"].to_pylist() == ["x", "z"]  # 3 bits ok, 5 bits rejected, 0 ok


def test_oversized_bucket_cross_sig_pair_survives_verify(ray_session):
    """Round-4 recall fix: in a bucket larger than pair_full_threshold,
    a within-tau pair whose members are BOTH far from the bucket head
    must still be found (exact triu over distinct-sig run heads, not a
    filtered head-star) — in BOTH pair-generation kernels."""
    from simhash_ray.config import LSHConfig
    from simhash_ray.stages.lsh import (
        broadcast_candidate_edges,
        make_pair_generator,
    )

    tau = 1
    base = np.uint64(0)
    # filler sigs: disjoint set nibbles, pairwise Hamming 8 from each
    # other and 4 from base — never within tau of anything
    fillers = [np.uint64(0xF) << np.uint64(16 + 4 * i) for i in range(8)]
    x = np.uint64(0b111) << np.uint64(50)  # 3 bits: dist 3 from base
    y = np.uint64(0b011) << np.uint64(50)  # 2 bits: dist 2 from base
    assert bin(int(x ^ y)).count("1") == tau
    sigs = np.array([base, *fillers, x, y], dtype=np.uint64)
    n = len(sigs)
    ids = np.array([f"n{i:02d}" for i in range(n)], dtype=object)

    # kernel 1: the groupby-partition pair generator (fused verify)
    group = pa.table(
        {
            "id": pa.array(ids, type=pa.string()),
            "space": pa.array(np.zeros(n, dtype=np.int64)),
            "band": pa.array(np.zeros(n, dtype=np.int64)),
            "key": pa.array(np.zeros(n, dtype=np.int64)),
            "sig": pa.array(sigs.view(np.int64), type=pa.int64()),
        }
    )
    out = make_pair_generator(pair_full_threshold=4, taus={0: tau})(group)
    got = {(a, b) for a, b in zip(out["a"].to_pylist(), out["b"].to_pylist())}
    assert ("n09", "n10") in got, got  # the planted x-y pair

    # kernel 2: the broadcast band tasks
    cfg = LSHConfig(n_blocks=4, combo_m=1, hamming_tau=tau, pair_full_threshold=4)
    ai, bi = broadcast_candidate_edges(
        {0: sigs}, [(0, cfg)], taus={0: tau},
        pair_full_threshold=4,
    )
    idx_pairs = {(int(a), int(b)) for a, b in zip(ai, bi)}
    assert (9, 10) in idx_pairs, idx_pairs


def test_pair_generator_rejects_missing_tau_space(ray_session):
    """A space id with no taus entry must raise, not silently drop."""
    from simhash_ray.stages.lsh import make_pair_generator

    group = pa.table(
        {
            "id": pa.array(["a", "b"], type=pa.string()),
            "space": pa.array(np.array([1, 1], dtype=np.int64)),
            "band": pa.array(np.zeros(2, dtype=np.int64)),
            "key": pa.array(np.zeros(2, dtype=np.int64)),
            "sig": pa.array(np.zeros(2, dtype=np.int64)),
        }
    )
    with pytest.raises(ValueError, match="no taus entry"):
        make_pair_generator(pair_full_threshold=4, taus={0: 3})(group)


def test_first_band_only_identical_edge_set():
    """Opt-in first-band pair emission must produce the IDENTICAL
    deduped edge set on a non-degenerate corpus (no star-regime
    buckets) — only the pre-dedupe multiplicity changes."""
    from simhash_ray.fixtures import FixtureSpec, generate_fixture
    from simhash_ray.pipelines.dedup_images import (
        collapse_exact,
        dup_edges,
        signatures,
    )
    from simhash_ray.config import DEFAULT_CONFIG

    tables = generate_fixture(FixtureSpec(n_rows=10_000, seed=7))
    images = rd.from_arrow(tables["images"])
    sigs = signatures(images, DEFAULT_CONFIG).materialize()
    collapsed = collapse_exact(sigs, 32).materialize()
    base = dup_edges(collapsed, DEFAULT_CONFIG, 32).to_pandas()
    fb = dup_edges(
        collapsed, DEFAULT_CONFIG, 32, first_band_only=True
    ).to_pandas()
    key = lambda df: sorted(map(tuple, df[["a", "b"]].values.tolist()))
    assert key(base) == key(fb)
    assert len(base) > 0

    # pre-dedupe volume: first-band emission must be strictly smaller
    cands = dup_edges(
        collapsed, DEFAULT_CONFIG, 32, candidates_only=True
    ).count()
    cands_fb = dup_edges(
        collapsed, DEFAULT_CONFIG, 32, candidates_only=True,
        first_band_only=True,
    ).count()
    assert cands_fb < cands


def test_first_band_lut_properties():
    from simhash_ray.config import LSHConfig
    from simhash_ray.stages.lsh import _combos, _first_band_lut

    cfg = LSHConfig(n_blocks=4, combo_m=2, hamming_tau=2)
    lut = _first_band_lut(cfg)
    combos = _combos(cfg)
    full = (1 << cfg.n_blocks) - 1
    assert lut[full] == 0  # identical sigs -> first band
    assert lut[0] == -1  # nothing agrees -> no colliding band
    for mask in range(1 << cfg.n_blocks):
        want = -1
        for bi, combo in enumerate(combos):
            if all((mask >> b) & 1 for b in combo):
                want = bi
                break
        assert lut[mask] == want, mask
