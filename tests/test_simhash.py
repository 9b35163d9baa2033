"""Golden-oracle tests for the 64-bit SimHash encoder (SURVEY.md §5.1).

The pure-Python :func:`simhash_oracle` is the spec; the vectorized
:func:`simhash_batch` must match it bit-for-bit on every input shape.
Pure numpy/pyarrow — no Ray needed here.
"""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from simhash_ray.config import SimHashConfig
from simhash_ray.simhash import (
    TokenHashCache,
    hamming64,
    simhash_batch,
    simhash_oracle,
)

CFG = SimHashConfig()

SAMPLES = [
    "",
    "   ",
    "one",
    "one two",
    "one two three four five",
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox jumps over the lazy cat",
    "The QUICK brown FOX",
    "  leading and trailing  ",
    "tabs\tand\nnewlines here",
    "repeat repeat repeat repeat",
    "unicode tøkens füß İstanbul",
    "a, b, c, commas, inside",
    "x" * 300,
    " ".join(f"w{i}" for i in range(100)),
]


def test_batch_matches_oracle_default_config():
    sigs = simhash_batch(pa.array(SAMPLES), CFG)
    expected = np.array([simhash_oracle(t, CFG) for t in SAMPLES], dtype=np.uint64)
    np.testing.assert_array_equal(sigs, expected)


@pytest.mark.parametrize(
    "cfg",
    [
        SimHashConfig(shingle_k=1),
        SimHashConfig(shingle_k=3),
        SimHashConfig(char_ngram=0),
        SimHashConfig(char_ngram=2),
        SimHashConfig(lowercase=False),
        SimHashConfig(hash_seed=12345),
    ],
)
def test_batch_matches_oracle_config_sweep(cfg):
    sigs = simhash_batch(pa.array(SAMPLES), cfg)
    expected = np.array([simhash_oracle(t, cfg) for t in SAMPLES], dtype=np.uint64)
    np.testing.assert_array_equal(sigs, expected)


@pytest.mark.parametrize(
    "kwargs",
    [{"bits": 128}, {"bits": 32}, {"shingle_k": 0}, {"char_ngram": -1}],
)
def test_invalid_config_rejected_loudly(kwargs):
    """Config validation fails at construction, not deep in a kernel
    (SURVEY §2 S3: 'validate loudly')."""
    with pytest.raises(ValueError):
        SimHashConfig(**kwargs)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(blacklist_categories=("Cs",), max_codepoint=0x2FFF),
            max_size=40,
        ),
        max_size=8,
    )
)
def test_batch_matches_oracle_property(texts):
    sigs = simhash_batch(pa.array(texts, type=pa.string()), CFG)
    expected = np.array([simhash_oracle(t, CFG) for t in texts], dtype=np.uint64)
    np.testing.assert_array_equal(sigs, expected)


def test_deterministic_and_cache_invariant():
    cache = TokenHashCache(CFG)
    a = simhash_batch(pa.array(SAMPLES), CFG, cache)
    b = simhash_batch(pa.array(SAMPLES), CFG, cache)  # warm cache
    c = simhash_batch(pa.array(SAMPLES), CFG)  # cold cache
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(a, c)


def test_nulls_and_chunked():
    arr = pa.chunked_array([["a b c", None], ["", "d e"]])
    sigs = simhash_batch(arr, CFG)
    assert sigs[1] == 0 and sigs[2] == 0
    assert sigs[0] == simhash_oracle("a b c", CFG)
    assert sigs[3] == simhash_oracle("d e", CFG)


def test_single_edit_is_near():
    """A one-word substitution in a long caption stays within a small
    Hamming ball — the property LSH banding relies on."""
    base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
    edited = base.replace("golf", "gulf")
    d = hamming64(
        np.array([simhash_oracle(base, CFG)], dtype=np.uint64),
        np.array([simhash_oracle(edited, CFG)], dtype=np.uint64),
    )[0]
    assert 0 < d <= 16


def test_disjoint_texts_are_far():
    a = simhash_oracle("alpha bravo charlie delta echo foxtrot golf hotel", CFG)
    b = simhash_oracle("zulu yankee xray whiskey victor uniform tango sierra", CFG)
    d = hamming64(np.array([a], dtype=np.uint64), np.array([b], dtype=np.uint64))[0]
    assert d > 16


def test_char_ngram_divergence():
    """token_similarity analogue: with char n-grams on, near-spellings are
    closer than with it off (SURVEY.md §2.6 step 2)."""
    on, off = SimHashConfig(char_ngram=3), SimHashConfig(char_ngram=0)
    t1, t2 = "misspelling of a wordd here today", "misspelling of a words here today"

    def d(cfg):
        return hamming64(
            np.array([simhash_oracle(t1, cfg)], dtype=np.uint64),
            np.array([simhash_oracle(t2, cfg)], dtype=np.uint64),
        )[0]

    assert simhash_oracle(t1, on) != simhash_oracle(t1, off)
    assert d(on) <= d(off) + 2  # overlapping char-grams shouldn't push apart


def test_shingle_order_sensitivity():
    """k>=2 word shingles make word order matter."""
    a = simhash_oracle("one two three four five six", CFG)
    b = simhash_oracle("six five four three two one", CFG)
    assert a != b


def test_hamming64_known_values():
    a = np.array([0, 0xFFFFFFFFFFFFFFFF, 0b1010], dtype=np.uint64)
    b = np.array([0, 0, 0b0101], dtype=np.uint64)
    np.testing.assert_array_equal(hamming64(a, b), [0, 64, 4])


# --------------------------------------------------------------------------
# digest-multiset projection (the doc_simhash_sigs staged-oracle seam)


def _fold_digests(rows, digs, cnt, n):
    """The ±1 accumulate + sign fold the SQL oracle re-runs in DuckDB
    (pipelines/queries.SQL_DOC_SIMHASH_SIGS), in numpy."""
    sigs = np.zeros(n, dtype=np.uint64)
    for j in range(64):
        bit = ((digs >> np.uint64(j)) & np.uint64(1)).astype(np.int64)
        adder = np.bincount(rows, weights=cnt * (2 * bit - 1), minlength=n)
        sigs |= (adder > 0).astype(np.uint64) << np.uint64(j)
    return sigs


@pytest.mark.parametrize(
    "cfg",
    [
        CFG,
        SimHashConfig(shingle_k=1),
        SimHashConfig(shingle_k=3),
        SimHashConfig(char_ngram=0),
        SimHashConfig(char_ngram=2),
        SimHashConfig(lowercase=False),
    ],
)
def test_digest_rows_fold_reproduces_batch(cfg):
    """Sign-folding the staged digest multiset must reproduce
    simhash_batch exactly — the pin that makes the staged SQL oracle a
    real cross-check of the encoder's accumulate semantics."""
    from simhash_ray.simhash import simhash_digest_rows

    texts = pa.array(SAMPLES)
    rows, digs, cnt = simhash_digest_rows(texts, cfg)
    # multiset is aggregated: no duplicate (row, digest) keys, counts >= 1
    key = rows.astype(object) * (1 << 64) + digs.astype(object)
    assert len(set(key)) == len(key)
    assert (cnt >= 1).all()
    got = _fold_digests(rows, digs, cnt, len(SAMPLES))
    np.testing.assert_array_equal(got, simhash_batch(texts, cfg))


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(blacklist_categories=("Cs",), max_codepoint=0x2FFF),
            max_size=40,
        ),
        max_size=8,
    )
)
def test_digest_rows_fold_property(texts):
    from simhash_ray.simhash import simhash_digest_rows

    arr = pa.array(texts, type=pa.string())
    rows, digs, cnt = simhash_digest_rows(arr, CFG)
    got = _fold_digests(rows, digs, cnt, len(texts))
    np.testing.assert_array_equal(got, simhash_batch(arr, CFG))


def test_idf_weighted_signatures_cap1_equals_uniform_and_layout_invariant():
    """weight_cap=1 forces every weight to 1 (n//df >= 1 always), so
    the weighted fold must reproduce the uniform encoder bit-for-bit;
    the real weights must be partition-layout-invariant."""
    import pandas as pd
    import ray.data as rd

    from simhash_ray.config import DEFAULT_CONFIG
    from simhash_ray.stages.encode import (
        encode_signatures,
        idf_weighted_signatures,
    )

    rng = np.random.default_rng(13)
    vocab = np.array([f"t{i}" for i in range(200)])
    texts = [" ".join(rng.choice(vocab, rng.integers(0, 25))) for _ in range(300)]
    texts += ["", "   "]
    df = pd.DataFrame(
        {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
    )
    ds = rd.from_pandas(df).repartition(5)
    cap1 = (
        idf_weighted_signatures(ds, DEFAULT_CONFIG.simhash, weight_cap=1)
        .to_pandas().set_index("doc_id").sort_index()
    )
    uni = (
        encode_signatures(
            rd.from_pandas(df), DEFAULT_CONFIG.simhash,
            text_col="text", concurrency=(1, 2),
        )
        .select_columns(["doc_id", "simhash"])
        .to_pandas().set_index("doc_id").sort_index()
    )
    assert (cap1["simhash"] == uni["simhash"]).all()
    w1 = (
        idf_weighted_signatures(ds, DEFAULT_CONFIG.simhash)
        .to_pandas().set_index("doc_id").sort_index()
    )
    w2 = (
        idf_weighted_signatures(
            rd.from_pandas(df).repartition(17), DEFAULT_CONFIG.simhash
        )
        .to_pandas().set_index("doc_id").sort_index()
    )
    assert (w1["simhash"] == w2["simhash"]).all()
    # empty/whitespace docs land on signature 0 in both variants
    assert w1.loc[300, "simhash"] == 0 and w1.loc[301, "simhash"] == 0
