"""Text-analysis operators over document tables (training-data pipeline
building blocks): token counting, quality counters, language-ID
heuristic, fingerprinting, exact dedup.

All hot paths are vectorized pyarrow.compute / numpy inside
``map_batches``; the only per-row Python is md5 hex digest (stdlib) and
the stopword scoring over the *unique token dictionary* of each batch.

SQL-oracle-friendliness: operators that the driver checks against
DuckDB return INTEGER counters (ratios are left to the consumer) so
the value-hash comparison is exact (no float summation-order noise).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..functions.tokenize import tokens_flat


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Whitespace token count, matching Python ``str.split`` semantics."""
    counts = tokens_flat(batch[text_col], lower=False).counts
    return batch.append_column("n_tokens", pa.array(counts, type=pa.int64()))


def repetition_counts_batch(
    batch: pa.Table, k: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> pa.Table:
    """Within-document n-gram repetition counters (the Gopher-style
    repetition quality signal, cf. Rae et al. 2021 §A1.2): per doc the
    total number of k-token windows and the number of DISTINCT ones —
    1 − distinct/total is the duplicate-window fraction a curation
    filter thresholds on.  Integer counters only (the ratio is left to
    the consumer) so the SQL oracle compares exactly.

    Tokenization = lower + whitespace, window identity = 64-bit hash
    identity — shared with stages/substring.py via minhash's flat
    shingler."""
    from .minhash import _shingle_hashes_flat

    texts = batch[text_col].combine_chunks().cast(pa.string())
    # one tokenization pass: the shingler returns per-row non-empty
    # token counts alongside the distinct window hashes
    _sh, rows, n, ntok = _shingle_hashes_flat(
        texts, k, short_rows="drop", return_lens=True
    )
    nwin = np.maximum(ntok - (k - 1), 0).astype(np.int64)
    ndist = (
        np.bincount(rows, minlength=n).astype(np.int64)
        if len(rows)
        else np.zeros(n, dtype=np.int64)
    )
    return pa.table(
        {
            id_col: batch[id_col],
            "n_windows": pa.array(nwin, type=pa.int64()),
            "n_distinct_windows": pa.array(ndist, type=pa.int64()),
        }
    )


def unigram_token_counts(docs, text_col: str = "text"):
    """Corpus unigram counts (lower + whitespace tokens, every
    occurrence): per-batch value_counts partials → one groupby sum.
    Returns the DISTRIBUTED (token, cnt) dataset — on web-scale text
    the distinct-token tail is unbounded (typos/URLs), so callers must
    bound it (min-count cutoff / top-N) BEFORE any driver collect or
    broadcast; see queries.q_doc_unigram_logprob."""
    import ray.data as rd  # noqa: F401  (signature documentation)
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        flat = tokens_flat(batch[text_col]).flat
        if len(flat) == 0:
            return pa.table(
                {"token": pa.array([], type=pa.string()),
                 "cnt": pa.array([], type=pa.int64())}
            )
        vc = pd.Series(flat.to_numpy(zero_copy_only=False)).value_counts()
        return pa.table(
            {
                "token": pa.array(vc.index.to_numpy(dtype=object),
                                  type=pa.string()),
                "cnt": pa.array(vc.to_numpy().astype(np.int64), type=pa.int64()),
            }
        )

    return (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("cnt", alias_name="cnt"))
    )


def doc_term_freqs(docs, text_col: str = "text", id_col: str = "doc_id"):
    """Per-document term frequencies: one (id, tok, tf) row per
    distinct token per document.  EXACT with no merge shuffle — a
    document is a single input row, so its whole token multiset is
    visible inside one batch; the count is one vectorized np.unique
    over (row, token-dict-index) composite keys.  The output is the
    inverted-index relation every tf-idf / BM25 / keyword-extraction
    op starts from; downstream df/joins shuffle by token."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch[id_col]
        empty = pa.table(
            {
                id_col: pa.array([], type=ids.type),
                "tok": pa.array([], type=pa.string()),
                "tf": pa.array([], type=pa.int64()),
            }
        )
        ft = tokens_flat(batch[text_col])
        if len(ft.flat) == 0:
            return empty
        flat = (
            ft.flat.combine_chunks()
            if isinstance(ft.flat, pa.ChunkedArray)
            else ft.flat
        )
        denc = flat.dictionary_encode()
        idx = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        v = len(denc.dictionary)
        key = ft.row_of * v + idx
        uk, tf = np.unique(key, return_counts=True)
        return pa.table(
            {
                id_col: ids.take(pa.array(uk // v, type=pa.int64())),
                "tok": denc.dictionary.take(pa.array(uk % v, type=pa.int64())),
                "tf": pa.array(tf.astype(np.int64), type=pa.int64()),
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow")


def make_unigram_scorer(freq_ref, total: int, text_col: str = "text",
                        id_col: str = "doc_id"):
    """Batch scorer: mean ln(count/total) over a doc's IN-VOCAB token
    occurrences (the CCNet-style unigram-LM quality signal, cf.
    Wenzek et al., LREC 2020).  ``freq_ref`` = ray.put pandas Series
    token → corpus count — a vocabulary BOUNDED by the caller (min-count
    cutoff / top-N); out-of-vocab tokens are excluded from the average
    (the LM-vocab behaviour), and docs with zero in-vocab tokens are
    dropped (mirrored by the SQL oracle's freq join)."""
    import ray

    def score(batch: pa.Table) -> pa.Table:
        freq = ray.get(freq_ref)
        ft = tokens_flat(batch[text_col])
        n = batch.num_rows
        row_of = ft.row_of
        tok_arr = ft.flat.to_numpy(zero_copy_only=False)
        if len(tok_arr) == 0:
            return pa.table(
                {id_col: pa.array([], type=batch[id_col].type),
                 "avg_logprob": pa.array([], type=pa.float64())}
            )
        counts = pd.Series(tok_arr).map(freq).to_numpy(dtype=np.float64)
        in_vocab = ~np.isnan(counts)
        row_of, counts = row_of[in_vocab], counts[in_vocab]
        logp = np.log(counts / total)
        sums = np.bincount(row_of, weights=logp, minlength=n)
        ntok = np.bincount(row_of, minlength=n)
        nonempty = ntok > 0
        return pa.table(
            {
                id_col: batch[id_col].filter(pa.array(nonempty)),
                "avg_logprob": pa.array(
                    np.round(sums[nonempty] / ntok[nonempty], 6),
                    type=pa.float64(),
                ),
            }
        )

    return score


def bigram_counts(docs, text_col: str = "text"):
    """Corpus bigram counts (adjacent lower+whitespace token pairs
    WITHIN each document, every occurrence): per-batch value_counts
    partials → one groupby sum.  A bigram is keyed as ``'u v'`` —
    tokens are whitespace-free by construction, so the single space is
    an unambiguous separator (and what the SQL oracle concatenates).

    Like :func:`unigram_token_counts` the result is the DISTRIBUTED
    (bg, cnt) relation; on web-scale text the distinct-bigram tail is
    unbounded, so callers must bound it before any collect/broadcast
    (see queries.q_doc_bigram_logprob)."""
    from ray.data.aggregate import Sum

    empty = pa.table(
        {"bg": pa.array([], type=pa.string()),
         "cnt": pa.array([], type=pa.int64())}
    )

    def partial(batch: pa.Table) -> pa.Table:
        ft = tokens_flat(batch[text_col])
        if len(ft.flat) < 2:
            return empty
        flat = (
            ft.flat.combine_chunks()
            if isinstance(ft.flat, pa.ChunkedArray)
            else ft.flat
        )
        same_row = ft.row_of[1:] == ft.row_of[:-1]
        if not same_row.any():
            return empty
        mask = pa.array(same_row)
        left = flat.slice(0, len(flat) - 1).filter(mask)
        right = flat.slice(1).filter(mask)
        bg = pc.binary_join_element_wise(left, right, " ")
        vc = pd.Series(bg.to_numpy(zero_copy_only=False)).value_counts()
        return pa.table(
            {
                "bg": pa.array(vc.index.to_numpy(dtype=object), type=pa.string()),
                "cnt": pa.array(vc.to_numpy().astype(np.int64), type=pa.int64()),
            }
        )

    return (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("bg")
        .aggregate(Sum("cnt", alias_name="cnt"))
    )


def bigram_left_counts(bigrams):
    """Context counts c(u) = Σ_v c(u v), derived DISTRIBUTEDLY from the
    (bg, cnt) relation (one narrow map + one groupby; the unbounded
    distinct-token tail never leaves the object store)."""
    from ray.data.aggregate import Sum

    def extract(batch: pa.Table) -> pa.Table:
        u = pc.list_element(pc.split_pattern(batch["bg"], " "), 0)
        return pa.table({"u": u, "cnt": batch["cnt"]})

    return (
        bigrams.map_batches(extract, batch_format="pyarrow")
        .groupby("u")
        .aggregate(Sum("cnt", alias_name="cnt_u"))
    )


def make_bigram_scorer(cnt_ref, left_ref, text_col: str = "text",
                       id_col: str = "doc_id"):
    """Batch scorer: mean ln(c(u v) / c(u)) over a doc's IN-VOCAB
    bigram occurrences — the bigram-LM (MLE conditional) quality
    signal, the order-2 counterpart of :func:`make_unigram_scorer`
    (KenLM-style fluency filters are n-gram LMs; order 2 keeps the
    oracle exactly replayable).  ``cnt_ref``/``left_ref`` = ray.put
    pandas Series ``'u v'`` → corpus count and ``u`` → Σ_v c(u v),
    both BOUNDED by the caller.  Out-of-vocab bigrams are excluded
    from the average; docs with zero in-vocab bigrams are dropped
    (mirrored by the SQL oracle's vocab join)."""
    import ray

    def score(batch: pa.Table) -> pa.Table:
        cnt = ray.get(cnt_ref)
        left = ray.get(left_ref)
        ft = tokens_flat(batch[text_col])
        n = batch.num_rows
        empty = pa.table(
            {id_col: pa.array([], type=batch[id_col].type),
             "avg_bigram_logprob": pa.array([], type=pa.float64())}
        )
        if len(ft.flat) < 2:
            return empty
        flat = (
            ft.flat.combine_chunks()
            if isinstance(ft.flat, pa.ChunkedArray)
            else ft.flat
        )
        same_row = ft.row_of[1:] == ft.row_of[:-1]
        if not same_row.any():
            return empty
        mask = pa.array(same_row)
        lt = flat.slice(0, len(flat) - 1).filter(mask)
        rt = flat.slice(1).filter(mask)
        bg = pc.binary_join_element_wise(lt, rt, " ").to_numpy(
            zero_copy_only=False
        )
        row_of = ft.row_of[:-1][same_row]
        c = pd.Series(bg).map(cnt).to_numpy(dtype=np.float64)
        in_vocab = ~np.isnan(c)
        if not in_vocab.any():
            return empty
        row_of, c = row_of[in_vocab], c[in_vocab]
        u = pd.Series(lt.filter(pa.array(in_vocab)).to_numpy(
            zero_copy_only=False
        )).map(left).to_numpy(dtype=np.float64)
        logp = np.log(c / u)
        sums = np.bincount(row_of, weights=logp, minlength=n)
        nbg = np.bincount(row_of, minlength=n)
        nonempty = nbg > 0
        return pa.table(
            {
                id_col: batch[id_col].filter(pa.array(nonempty)),
                "avg_bigram_logprob": pa.array(
                    np.round(sums[nonempty] / nbg[nonempty], 6),
                    type=pa.float64(),
                ),
            }
        )

    return score


# PII-redaction patterns (RE2-compatible; the DuckDB oracle runs the
# IDENTICAL strings through regexp_replace, so semantics can't drift).
# Applied IN ORDER, counting matches on the current text before each
# replacement — emails first so their digit runs aren't double-counted.
REDACT_PATTERNS: list[tuple[str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("number", r"[0-9]{7,}"),
]


def redact_batch(
    batch: pa.Table, text_col: str = "text", id_col: str = "doc_id"
) -> pa.Table:
    """PII scrub: replace emails and long digit runs with ``<email>`` /
    ``<number>`` placeholders (vectorized RE2 kernels) and count the
    redactions — the curation pass that runs before publishing a
    training corpus.  Returns (id, n_redacted, redacted)."""
    text = pc.fill_null(
        batch[text_col].combine_chunks().cast(pa.string()), ""
    )
    n_red = np.zeros(batch.num_rows, dtype=np.int64)
    for name, pat in REDACT_PATTERNS:
        n_red += (
            pc.count_substring_regex(text, pat)
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        text = pc.replace_substring_regex(text, pat, f"<{name}>")
    return pa.table(
        {
            id_col: batch[id_col],
            "n_redacted": pa.array(n_red, type=pa.int64()),
            "redacted": text,
        }
    )


# BPE-ish pre-tokenizer chunks (GPT-2-style, RE2-compatible — no
# lookahead): optional-space word runs, digit runs, punctuation runs.
BPE_ISH_PATTERN = r" ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+"


def bpe_token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """BPE-ish token count: non-overlapping matches of the GPT-2-style
    pre-tokenizer chunk pattern (one vectorized RE2 kernel; the same
    pattern runs in the DuckDB oracle via regexp_extract_all)."""
    n = pc.count_substring_regex(
        batch[text_col].combine_chunks().cast(pa.string()), BPE_ISH_PATTERN
    ).cast(pa.int64())
    # null text counts 0 tokens, matching token_count_batch (the SQL
    # oracle COALESCEs identically)
    return batch.append_column("n_bpe_tokens", pc.fill_null(n, 0))


def quality_counters_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Integer quality counters: total/alpha/digit/space char counts."""
    text = batch[text_col].combine_chunks().cast(pa.string())
    n_chars = pc.utf8_length(text).cast(pa.int64())
    # count kernels, not replace+length: the replace path materialized
    # three full string columns per batch just to count characters
    alpha = pc.count_substring_regex(text, "[a-zA-Z]").cast(pa.int64())
    digit = pc.count_substring_regex(text, "[0-9]").cast(pa.int64())
    space = pc.count_substring(text, " ").cast(pa.int64())
    out = batch.append_column("len_chars", n_chars)
    out = out.append_column("alpha_chars", alpha)
    out = out.append_column("digit_chars", digit)
    return out.append_column("space_chars", space)


# Tiny per-language stopword lists for the n-gram/stopword heuristic.
# This is a deterministic toy model (no external models in-sandbox).
_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for"},
    "de": {"der", "die", "das", "und", "ist", "ein", "nicht", "mit", "sich", "auf"},
    "fr": {"le", "la", "les", "et", "des", "un", "une", "est", "dans", "que"},
    "es": {"el", "la", "los", "y", "de", "que", "en", "un", "una", "es"},
}


class LangIdScorer:
    """Actor-pool language-ID stage: stopword-hit voting over the batch's
    unique-token dictionary (state = the compiled stopword table)."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.langs = sorted(_STOPWORDS)
        self.tables = [_STOPWORDS[lang] for lang in self.langs]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ft = tokens_flat(batch[self.text_col])
        n = ft.n
        dict_arr = ft.flat.dictionary_encode()
        uniq = dict_arr.dictionary.to_pylist()
        codes = dict_arr.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        # per-unique-token lang votes
        votes = np.zeros((len(uniq), len(self.langs)), dtype=np.int64)
        for i, tok in enumerate(uniq):
            for j, table in enumerate(self.tables):
                if tok in table:
                    votes[i, j] = 1
        scores = np.zeros((n, len(self.langs)), dtype=np.int64)
        np.add.at(scores, ft.row_of, votes[codes])
        best = np.argmax(scores, axis=1)
        hit = scores.max(axis=1) > 0
        pred = np.where(hit, np.array(self.langs, dtype=object)[best], "und")
        return batch.append_column("lang_pred", pa.array(pred, type=pa.string()))


def stopword_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-row count of token OCCURRENCES that are a stopword in any
    language — the "stopword ratio" ingredient of quality scoring,
    kept integer so the SQL oracle matches exactly.  Vectorized over
    the batch's unique-token dictionary (membership test runs once per
    distinct token, the per-row step is a bincount)."""
    ft = tokens_flat(batch[text_col])
    dict_arr = ft.flat.dictionary_encode()
    uniq = dict_arr.dictionary.to_pylist()
    any_stop = frozenset().union(*_STOPWORDS.values())
    is_stop = np.array([t in any_stop for t in uniq], dtype=np.int64)
    codes = dict_arr.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    counts = np.bincount(
        ft.row_of, weights=is_stop[codes], minlength=ft.n
    ).astype(np.int64)
    return batch.append_column("n_stopwords", pa.array(counts, type=pa.int64()))


def md5_fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Content fingerprint = md5 hex of the raw text (DuckDB-matchable)."""
    texts = batch[text_col].to_pylist()
    fp = [hashlib.md5(("" if t is None else t).encode("utf-8")).hexdigest() for t in texts]
    return batch.append_column("fingerprint", pa.array(fp, type=pa.string()))


def rolling_fingerprint_batch(
    batch: pa.Table, text_col: str = "text", window: int = 16, keep: int = 4
) -> pa.Table:
    """Winnowing-style document fingerprint: the ``keep``
    lexicographically smallest md5 hashes of the w-token windows
    (w = min(window, n_tokens); all positions, duplicates kept),
    concatenated.  Order-robust against small edits (unlike a whole-
    document md5) AND exactly expressible in SQL (md5 + list_sort +
    list_slice), so the driver's DuckDB oracle checks it bit-for-bit
    (queries.SQL_DOC_ROLLING_FP).  Empty documents fingerprint to ''.

    md5-per-window is the portable-oracle choice; at production scale
    the hash would be a compiled rolling hash — the pipeline shape
    (map_batches, per-unique-window hashing) is unchanged by that
    swap."""
    out: list[str] = []
    for row in tokens_flat(batch[text_col]).per_row_lists():
        if not len(row):
            out.append("")
            continue
        w = min(window, len(row))
        hashes = sorted(
            hashlib.md5(" ".join(row[i : i + w]).encode("utf-8")).hexdigest()
            for i in range(len(row) - w + 1)
        )[:keep]
        out.append("".join(hashes))
    return batch.append_column("rolling_fp", pa.array(out, type=pa.string()))


def exact_dedup(
    ds: rd.Dataset, key_col: str = "text", id_col: str = "doc_id"
) -> rd.Dataset:
    """Exact dedup: min id per identical key + multiplicity.

    groupby shuffle on the key; returns (id_col, n_copies) — one row
    per distinct key, keeping the minimum id (deterministic winner)."""
    from ray.data.aggregate import Count, Min

    return ds.groupby(key_col).aggregate(
        Min(id_col, alias_name=id_col), Count(alias_name="n_copies")
    )


_NORM_PUNCT_RE = r"[!-/:-@\[-`{-~]"  # the ASCII punctuation ranges


def norm_key_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Append ``norm_key``: the fuzzy-exact dedup key — lowercase,
    ASCII punctuation stripped, whitespace runs collapsed to one
    space, then space-trimmed (the Dolma/RefinedWeb "normalized exact
    match" rule: catches re-punctuated / re-spaced / re-cased copies
    that byte dedup misses, without any similarity machinery).

    Every step is chosen for engine parity so a SQL oracle replays
    the key byte-for-byte: utf8proc ``lower`` (both pyarrow and
    DuckDB), RE2 ``regexp_replace`` with the same two patterns (both
    engines embed RE2 — ``\\s`` is ASCII-only in both), and a
    plain-space trim (DuckDB ``trim`` only strips ' '; non-ASCII
    whitespace deliberately survives in the key on BOTH sides)."""
    s = pc.utf8_lower(batch[text_col].cast(pa.string()))
    s = pc.replace_substring_regex(s, _NORM_PUNCT_RE, "")
    s = pc.replace_substring_regex(s, r"\s+", " ")
    s = pc.utf8_trim(s, characters=" ")
    return batch.append_column("norm_key", s)


def normalized_dedup(
    ds: rd.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> rd.Dataset:
    """Normalized-text exact dedup: one streaming key pass then the
    :func:`exact_dedup` min-id election grouped on ``norm_key`` —
    (id, n_copies), one row per distinct normalized key.  The shuffle
    carries (id, norm_key) only; the key is ≤ the text's length so
    this stays a narrow exchange."""
    keyed = ds.select_columns([id_col, text_col]).map_batches(
        lambda t: norm_key_batch(t, text_col).drop_columns([text_col]),
        batch_format="pyarrow",
    )
    return exact_dedup(keyed, key_col="norm_key", id_col=id_col)


def nfc_normalize_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Unicode NFC normalization: (id cols…, text_nfc, changed).

    NOT built on ``pc.utf8_normalize``: pyarrow 16.1's kernel emits
    DECOMPOSED output under ``form="NFC"`` (verified: U+00E9 →
    U+0065 U+0301), silently disagreeing with DuckDB's
    ``nfc_normalize`` and Python's ``unicodedata`` — invisible on
    ASCII corpora.  Instead: a vectorized ``string_is_ascii`` fast
    path (ASCII is NFC-invariant, the common case for web English)
    and ``unicodedata.normalize`` only for the non-ASCII rows.
    """
    import unicodedata

    txt = batch[text_col].cast(pa.string())
    # null text rows: string_is_ascii yields null — treat them as the
    # fast path (nothing to normalize; text_nfc stays null, changed is
    # null, matching SQL's nfc_normalize(NULL)/NULL <> NULL)
    is_ascii = pc.fill_null(pc.string_is_ascii(txt), True).to_numpy(
        zero_copy_only=False
    )
    if bool(is_ascii.all()):
        nfc = txt
    else:
        vals = txt.to_pylist()
        for i in np.flatnonzero(~is_ascii):
            v = vals[i]
            if v is not None:
                vals[i] = unicodedata.normalize("NFC", v)
        nfc = pa.array(vals, type=pa.string())
    out = batch.drop_columns([text_col])
    out = out.append_column("text_nfc", nfc)
    return out.append_column("changed", pc.not_equal(nfc, txt))


def unigram_target_counts(
    docs, target_col: str, target_value, text_col: str = "text"
):
    """(token, cnt, cnt_t): corpus-wide AND target-subset unigram
    occurrence counts in ONE streaming pass (per-block np.unique
    partials -> one token groupby) — the sufficient statistic for
    importance-ratio data selection (DSIR, Xie et al. 2023: weight a
    doc by how much more likely its tokens are under a target-domain
    LM than under the raw-corpus LM).  Same unbounded-tail caveat as
    unigram_token_counts: callers must min-count/top-N bound the
    result before any collect."""
    from ray.data.aggregate import Sum

    empty = pa.table(
        {
            "token": pa.array([], type=pa.string()),
            "cnt": pa.array([], type=pa.int64()),
            "cnt_t": pa.array([], type=pa.int64()),
        }
    )

    def partial(batch: pa.Table) -> pa.Table:
        ft = tokens_flat(batch[text_col])
        flat = ft.flat.to_numpy(zero_copy_only=False)
        if len(flat) == 0:
            return empty
        is_target = (
            batch[target_col].to_numpy(zero_copy_only=False) == target_value
        )
        uniq, inv = np.unique(flat, return_inverse=True)
        return pa.table(
            {
                "token": pa.array(uniq, type=pa.string()),
                "cnt": pa.array(np.bincount(inv), type=pa.int64()),
                "cnt_t": pa.array(
                    np.bincount(inv, weights=is_target[ft.row_of]).astype(
                        np.int64
                    ),
                    type=pa.int64(),
                ),
            }
        )

    return (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("cnt", alias_name="cnt"), Sum("cnt_t", alias_name="cnt_t"))
    )


def make_dsir_scorer(lam_ref, text_col: str = "text", id_col: str = "doc_id"):
    """Batch scorer for DSIR importance weights: per-doc SUM of the
    broadcast per-token log-ratio lambda over IN-VOCAB occurrences
    (multiplicity counts), rounded to 6 dp; docs with zero in-vocab
    tokens are dropped (mirrored by the SQL oracle's join).  ``lam_ref``
    = ray.put pandas Series token -> lambda, bounded by the caller."""
    import ray

    def score(batch: pa.Table) -> pa.Table:
        lam = ray.get(lam_ref)
        ft = tokens_flat(batch[text_col])
        n = batch.num_rows
        tok_arr = ft.flat.to_numpy(zero_copy_only=False)
        empty = pa.table(
            {
                id_col: pa.array([], type=batch[id_col].type),
                "dsir_weight": pa.array([], type=pa.float64()),
            }
        )
        if len(tok_arr) == 0:
            return empty
        vals = pd.Series(tok_arr).map(lam).to_numpy(dtype=np.float64)
        in_vocab = ~np.isnan(vals)
        row_of, vals = ft.row_of[in_vocab], vals[in_vocab]
        sums = np.bincount(row_of, weights=vals, minlength=n)
        ntok = np.bincount(row_of, minlength=n)
        nonempty = ntok > 0
        return pa.table(
            {
                id_col: batch[id_col].filter(pa.array(nonempty)),
                "dsir_weight": pa.array(
                    np.round(sums[nonempty], 6), type=pa.float64()
                ),
            }
        )

    return score
