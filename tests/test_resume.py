"""Checkpoint/resume semantics (SURVEY.md §5.5): kill after a partial
commit, rerun, identical final output; committed stages are skipped."""

import json
import os

import pandas as pd
import pytest
import ray.data as rd

from simhash_ray.config import DEFAULT_CONFIG, DedupConfig, LSHConfig
from simhash_ray.fixtures import FixtureSpec, generate_fixture
from simhash_ray.pipelines.dedup_images import dedup_images, dedup_images_checkpointed


@pytest.fixture(scope="module")
def images_tbl():
    return generate_fixture(FixtureSpec(n_rows=300, seed=3))["images"]


def _canon(ds):
    return (
        ds.to_pandas()
        .sort_values("image_id")
        .reset_index(drop=True)[["image_id", "cluster_id", "is_representative"]]
    )


def test_checkpointed_matches_plain(tmp_path, images_tbl):
    images = rd.from_arrow(images_tbl)
    plain = dedup_images(images, DEFAULT_CONFIG, n_parts=8)
    ckpt = dedup_images_checkpointed(
        images, str(tmp_path / "run"), DEFAULT_CONFIG, n_parts=8
    )
    pd.testing.assert_frame_equal(_canon(plain.assignment), _canon(ckpt.assignment))
    # manifests + metrics committed
    for stage in ("signatures", "collapsed", "edges", "assignment"):
        m = json.load(open(tmp_path / "run" / f"{stage}.manifest.json"))
        assert m["config_hash"] == DEFAULT_CONFIG.config_hash()
        assert m["row_count"] > 0
    metrics = json.load(open(tmp_path / "run" / "metrics.json"))
    assert all(not v["resumed"] for v in metrics.values())


def test_resume_skips_committed_and_is_identical(tmp_path, images_tbl):
    images = rd.from_arrow(images_tbl)
    root = str(tmp_path / "run")
    first = dedup_images_checkpointed(images, root, DEFAULT_CONFIG, n_parts=8)
    want = _canon(first.assignment)

    # simulate a crash after 'collapsed' committed: later stages lost
    from simhash_ray.state.manifest import CheckpointedRun

    run = CheckpointedRun(root, DEFAULT_CONFIG.config_hash())
    run.invalidate_from("edges")
    run.invalidate_from("assignment")

    second = dedup_images_checkpointed(images, root, DEFAULT_CONFIG, n_parts=8)
    pd.testing.assert_frame_equal(_canon(second.assignment), want)
    metrics = json.load(open(tmp_path / "run" / "metrics.json"))
    assert metrics["signatures"]["resumed"] and metrics["collapsed"]["resumed"]
    assert not metrics["edges"]["resumed"] and not metrics["assignment"]["resumed"]


def test_config_change_invalidates(tmp_path, images_tbl):
    images = rd.from_arrow(images_tbl)
    root = str(tmp_path / "run")
    dedup_images_checkpointed(images, root, DEFAULT_CONFIG, n_parts=8)
    other = DedupConfig(text_lsh=LSHConfig(hamming_tau=4))
    dedup_images_checkpointed(images, root, other, n_parts=8)
    metrics = json.load(open(tmp_path / "run" / "metrics.json"))
    assert all(not v["resumed"] for v in metrics.values())
