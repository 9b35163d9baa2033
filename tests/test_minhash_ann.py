"""MinHash-LSH recall vs the exact Jaccard operator; multimodal stages."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from simhash_ray.fixtures import FixtureSpec, generate_fixture
from simhash_ray.stages.minhash import all_pairs_jaccard, minhash_dup_pairs
from simhash_ray.stages.multimodal import (
    AudioFeatureStub,
    ImageResize,
    ImageStats,
    VideoFrameSampleStub,
)


def _paraphrase_corpus(n_base=150, n_dup=60, seed=5):
    rng = np.random.default_rng(seed)
    vocab = np.array([f"w{i:03d}x" for i in range(800)])
    docs = [
        " ".join(rng.choice(vocab, rng.integers(30, 61))) for _ in range(n_base)
    ]
    for i in range(n_dup):
        src = docs[i % n_base].split()
        # drop ~4% of tokens → shingle-jaccard stays high
        keep = rng.random(len(src)) > 0.04
        docs.append(" ".join(np.array(src, dtype=object)[keep]))
    return pd.DataFrame({"doc_id": np.arange(len(docs), dtype=np.int64), "text": docs})


@pytest.fixture(scope="module")
def corpus():
    return _paraphrase_corpus()


def test_minhash_recall_vs_exact(corpus):
    docs = rd.from_pandas(corpus)
    exact = all_pairs_jaccard(docs, 75, 100, shingle_k=2).to_pandas()
    strong = set(zip(exact["a"], exact["b"]))
    assert len(strong) >= 40  # planted paraphrases are found by the oracle
    found = minhash_dup_pairs(docs, theta=0.6, shingle_k=2, concurrency=(1, 2)).to_pandas()
    found_pairs = set(zip(found["a"], found["b"]))
    recall = len(strong & found_pairs) / len(strong)
    assert recall >= 0.9, f"minhash recall {recall:.3f}"


def test_exact_jaccard_thresholds(corpus):
    docs = rd.from_pandas(corpus)
    loose = all_pairs_jaccard(docs, 5, 10, shingle_k=2).to_pandas()
    tight = all_pairs_jaccard(docs, 95, 100, shingle_k=2).to_pandas()
    assert len(tight) <= len(loose)
    # threshold is the exact rational inter/uni >= num/den
    assert (loose["inter"] * 10 >= 5 * loose["uni"]).all()


@pytest.fixture(scope="module")
def image_fixture():
    return generate_fixture(FixtureSpec(n_rows=120, seed=9))


def test_image_stats_invariant(image_fixture):
    ds = rd.from_arrow(image_fixture["images"])
    out = ds.map_batches(
        ImageStats, batch_format="pyarrow", batch_size=64, concurrency=2
    ).to_pandas()
    assert len(out) == 120
    assert out["phash_matches"].all()
    assert ((out["mean_r"] >= 0) & (out["mean_r"] <= 255)).all()


def test_image_resize(image_fixture):
    ds = rd.from_arrow(image_fixture["images"])
    out = ds.map_batches(
        ImageResize,
        fn_constructor_kwargs={"out_side": 32},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=2,
    ).to_pandas()
    assert (out["w"] == 32).all() and (out["fmt"] == "raw").all()
    assert out["bytes"].map(len).eq(32 * 32 * 3).all()


def test_audio_stub_marks_itself():
    batch = pa.table({"clip_id": pa.array([1, 2]), "bytes": pa.array([b"abc", b""])})
    out = AudioFeatureStub()(batch)
    assert out["stub"].to_pylist() == [True, True]
    assert out["energy_proxy"].to_pylist()[1] == 0.0


def test_video_stub_raises():
    with pytest.raises(NotImplementedError):
        VideoFrameSampleStub()(pa.table({"bytes": pa.array([b""])}))
