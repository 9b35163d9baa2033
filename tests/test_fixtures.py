"""Fixture-generator tests: determinism, schema, planted-structure
certification (SURVEY.md §5.2)."""

import numpy as np
import pyarrow as pa
import pytest

from simhash_ray.config import DEFAULT_CONFIG
from simhash_ray.fixtures import (
    IMAGE_SCHEMA,
    TRUTH_SCHEMA,
    FixtureSpec,
    generate_fixture,
)
from simhash_ray.imgcodec import decode_image
from simhash_ray.phash import phash64, phash_to_uint64
from simhash_ray.simhash import hamming64, simhash_batch


@pytest.fixture(scope="module")
def fx():
    return generate_fixture(FixtureSpec(n_rows=600, seed=42))


def test_schema_and_counts(fx):
    assert fx["images"].schema.equals(IMAGE_SCHEMA)
    assert fx["truth"].schema.equals(TRUTH_SCHEMA)
    assert fx["images"].num_rows == 600
    kinds = fx["truth"]["kind"].to_pylist()
    assert {"unique", "original", "exact_dup", "near_dup_caption",
            "near_dup_image", "near_dup_both"} <= set(kinds)


def test_deterministic():
    a = generate_fixture(FixtureSpec(n_rows=120, seed=7))
    b = generate_fixture(FixtureSpec(n_rows=120, seed=7))
    assert a["images"].equals(b["images"])
    assert a["truth"].equals(b["truth"])
    c = generate_fixture(FixtureSpec(n_rows=120, seed=8))
    assert not a["images"].equals(c["images"])


def test_bytes_decode_and_phash_consistent(fx):
    """Per-row invariant precondition: the stored bytes decode to pixels
    whose pinned phash equals the phash column."""
    tbl = fx["images"].slice(0, 80)
    for row in tbl.to_pylist():
        pix = decode_image(row["bytes"], row["fmt"], row["w"], row["h"])
        assert pix.shape == (row["h"], row["w"], 3)
        assert phash64(pix) == row["phash"]


def test_planted_dups_within_hamming_balls(fx):
    """Certification: every planted dup is inside the pinned Hamming ball
    of its cluster source in at least one signature space."""
    cfg = DEFAULT_CONFIG
    images, truth = fx["images"], fx["truth"]
    sig = simhash_batch(images["caption"].combine_chunks(), cfg.simhash)
    ph = phash_to_uint64(images["phash"].to_numpy())
    cluster = np.array(truth["cluster_id"].to_pylist())
    kind = np.array(truth["kind"].to_pylist())
    # source row index for cluster k is k (originals are first, in order)
    dup_rows = np.flatnonzero(
        np.isin(kind, ["exact_dup", "near_dup_caption", "near_dup_image", "near_dup_both"])
    )
    assert len(dup_rows) > 0
    src = cluster[dup_rows]
    d_text = hamming64(sig[dup_rows], sig[src])
    d_img = hamming64(ph[dup_rows], ph[src])
    text_ok = d_text <= cfg.text_lsh.hamming_tau
    img_ok = d_img <= cfg.image_lsh.hamming_tau
    assert np.all(text_ok | img_ok)
    # kind-specific: caption near-dups keep the image signature exact, and vice versa
    k = kind[dup_rows]
    assert np.all(d_img[k == "near_dup_caption"] == 0)
    assert np.all(d_text[k == "near_dup_image"] == 0)
    assert np.all((d_text[k == "exact_dup"] == 0) & (d_img[k == "exact_dup"] == 0))


def test_uniques_are_far_apart(fx):
    """No accidental near-dups among unique/original rows (makes
    precision measurable)."""
    cfg = DEFAULT_CONFIG
    images, truth = fx["images"], fx["truth"]
    kind = np.array(truth["kind"].to_pylist())
    base = np.flatnonzero(np.isin(kind, ["unique", "original"]))
    sig = simhash_batch(images["caption"].combine_chunks(), cfg.simhash)[base]
    ph = phash_to_uint64(images["phash"].to_numpy())[base]
    # all-pairs check at this scale
    for arr, tau in ((sig, cfg.text_lsh.hamming_tau), (ph, cfg.image_lsh.hamming_tau)):
        x = arr[:, None] ^ arr[None, :]
        pop = np.unpackbits(x.view(np.uint8).reshape(len(base), len(base), 8), axis=2)
        d = pop.sum(axis=2)
        np.fill_diagonal(d, 99)
        assert d.min() > tau


def test_hot_caption_variant():
    fx = generate_fixture(FixtureSpec(n_rows=300, seed=5, hot_frac=0.1))
    caps = fx["images"]["caption"].to_pylist()
    kinds = np.array(fx["truth"]["kind"].to_pylist())
    hot = [c for c, k in zip(caps, kinds) if k == "hot_caption"]
    assert len(hot) == 30 and len(set(hot)) == 1
