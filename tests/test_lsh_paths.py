"""Broadcast vs distributed candidate-generation equivalence: the two
paths (shuffle-free band tasks over broadcast sigs; groupby band-bucket
shuffle) must produce the same verified edge set."""

import numpy as np
import pandas as pd
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
