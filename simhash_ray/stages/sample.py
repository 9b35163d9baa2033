"""Deterministic sampling operators: hash-Bernoulli, stratified rates,
per-group caps.

Web-scale corpus curation samples constantly — downsample a crawl,
rebalance languages, cap any one domain's share — and it must be
REPRODUCIBLE: the same row keeps/drops regardless of partitioning,
cluster size, or rerun.  All three operators therefore decide from the
md5 of the row id (the vectorized single-block md5 in
functions/hashing.py, which a SQL oracle reproduces with DuckDB's
``md5()``), never from an RNG:

- ``hash_sample``: keep iff u32(md5(id)) · den < num · 2^32 — an exact
  integer-rational Bernoulli(num/den).
- ``stratified_sample``: per-stratum rational rates (the language /
  source rebalancing primitive).
- ``cap_per_group``: at most n rows per group, chosen by md5 order
  (deterministic "random" domain capping, cf. per-domain caps in web
  corpus curation); rides stages/topk.py's partial-then-merge, so the
  shuffle is ≤ n × groups × blocks rows.

Every operator is a single streaming ``map_batches`` (plus, for the
cap, the tiny top-k merge) — no full-table shuffle, no driver loop.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..functions.hashing import md5_u32_of_int_ids

_TWO32 = 1 << 32


def select_token_budget(
    ds: rd.Dataset,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
    collect_limit: int = 1_000_000,
) -> rd.Dataset:
    """Keep the maximal md5-ordered corpus prefix whose cumulative
    whitespace-token count fits ``budget`` — the "cut an N-token
    training subset" operator.  Deterministic and partition-invariant:
    rows are ordered by (u32(md5(id)), id), a reproducible pseudo-random
    shuffle, and a row survives iff the running token total through it
    is ≤ ``budget`` (SQL: ``SUM(ntok) OVER (ORDER BY u, id) <= budget``).

    Distributed as a weighted order-statistic search, NOT a global
    sort: the cut point is a lexicographic threshold (u*, id*), found by
    iteratively narrowing a u-interval — each round is one streaming
    pass over the narrow (id, u, ntok) table producing per-block
    ``np.bincount`` partials folded through a ≤ ``n_buckets``-cardinality
    groupby, so the driver only ever sees bucket subtotals.  When the
    surviving interval holds ≤ ``collect_limit`` rows (one round cuts
    the candidate set by ~``n_buckets``×) its narrow rows are collected
    for the exact tie-broken cut, then ONE stateless filter pass keeps
    rows below the threshold (u is recomputed from the id — no join).
    Token counts ride the audited tokenizer (functions/tokenize.py),
    whose count the SQL oracle mirrors exactly (SQL_DOC_TOKEN_STATS).
    """
    from ray.data.aggregate import Sum

    from .text import token_count_batch

    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")

    def keyed(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        counted = token_count_batch(batch, text_col=text_col)
        return pa.table(
            {
                "id": pa.array(ids, type=pa.int64()),
                "u": pa.array(
                    md5_u32_of_int_ids(ids).astype(np.int64), type=pa.int64()
                ),
                "ntok": counted["n_tokens"],
            }
        )

    narrow = (
        ds.select_columns([id_col, text_col])
        .map_batches(keyed, batch_format="pyarrow")
        .materialize()
    )

    lo, hi = 0, _TWO32  # current u-interval known to contain the cut
    tokens_before = 0  # exact token total of rows with u < lo
    n_in = narrow.count()
    keep_all = False

    while n_in > collect_limit:
        if hi - lo <= 1:
            raise ValueError(
                f"select_token_budget: {n_in} rows share the single md5-u32 "
                f"value {lo} (> collect_limit={collect_limit}); raise "
                "collect_limit — u32 collision mass this large is "
                "pathological for real ids"
            )
        k = min(n_buckets, hi - lo)
        width = -((lo - hi) // k)  # ceil((hi-lo)/k): bucket idx < k
        interval = (lo, hi, width)

        def part(batch: pa.Table, iv=interval) -> pa.Table:
            b_lo, b_hi, b_w = iv
            u = batch["u"].to_numpy()
            m = (u >= b_lo) & (u < b_hi)
            empty = pa.table(
                {
                    "bucket": pa.array([], type=pa.int64()),
                    "tok": pa.array([], type=pa.int64()),
                    "cnt": pa.array([], type=pa.int64()),
                }
            )
            if not m.any():
                return empty
            b = (u[m] - b_lo) // b_w
            tok = batch["ntok"].to_numpy()[m]
            # float64 bincount is exact here: a block's token total is
            # far below 2^53
            sums = np.bincount(b, weights=tok).astype(np.int64)
            cnts = np.bincount(b).astype(np.int64)
            nz = np.flatnonzero(cnts)
            return pa.table(
                {
                    "bucket": pa.array(nz, type=pa.int64()),
                    "tok": pa.array(sums[nz], type=pa.int64()),
                    "cnt": pa.array(cnts[nz], type=pa.int64()),
                }
            )

        agg = (
            narrow.map_batches(part, batch_format="pyarrow")
            .groupby("bucket")
            .aggregate(Sum("tok", alias_name="tok"), Sum("cnt", alias_name="cnt"))
            .to_pandas()
            .sort_values("bucket")
            .reset_index(drop=True)
        )
        cum = tokens_before + agg["tok"].cumsum()
        over = cum > budget
        if not over.any():  # whole interval fits (first round: whole corpus)
            keep_all = True
            break
        j = int(over.idxmax())
        tokens_before += int(agg["tok"].iloc[:j].sum())
        lo = lo + int(agg["bucket"].iloc[j]) * width
        hi = min(hi, lo + width)
        n_in = int(agg["cnt"].iloc[j])

    if keep_all:
        return ds

    if n_in > 0:
        seg = narrow.filter(
            expr=f"u >= {lo} and u < {hi}"
        ).to_pandas().sort_values(["u", "id"])
        kept = (tokens_before + seg["ntok"].cumsum()) <= budget  # a prefix
        n_kept = int(kept.sum())
    else:  # interval emptied by an exactly-aligned earlier cut
        n_kept = 0
    if n_kept == 0:
        u_thr, id_thr = lo, None  # keep iff u < lo
    else:
        last = seg.iloc[n_kept - 1]
        u_thr, id_thr = int(last["u"]), int(last["id"])

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        u = md5_u32_of_int_ids(ids).astype(np.int64)
        if id_thr is None:
            m = u < u_thr
        else:
            m = (u < u_thr) | ((u == u_thr) & (ids <= id_thr))
        return batch.filter(pa.array(m))

    return ds.map_batches(keep, batch_format="pyarrow")


def _keep_mask(ids: np.ndarray, num: int, den: int) -> np.ndarray:
    return md5_u32_of_int_ids(ids).astype(np.uint64) * np.uint64(den) < np.uint64(
        num * _TWO32
    )


def hash_sample(
    ds: rd.Dataset, num: int, den: int, id_col: str = "doc_id"
) -> rd.Dataset:
    """Deterministic Bernoulli(num/den) sample keyed on md5(id)."""
    if not (0 <= num <= den and den > 0):
        raise ValueError(f"rate {num}/{den} out of [0, 1]")

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.filter(pa.array(_keep_mask(ids, num, den)))

    return ds.map_batches(fn, batch_format="pyarrow")


def stratified_sample(
    ds: rd.Dataset,
    group_col: str,
    rates: dict[str, tuple[int, int]],
    default: tuple[int, int] = (1, 1),
    id_col: str = "doc_id",
) -> rd.Dataset:
    """Per-stratum deterministic sampling: row of stratum g survives
    iff u32(md5(id)) · den_g < num_g · 2^32 (``default`` for strata not
    in ``rates``).

    Null-group policy: rows whose ``group_col`` is null/NaN belong to
    no named stratum and are sampled at the ``default`` rate — they are
    never silently dropped.  SQL mirrors must treat NULL groups
    explicitly (``lang IS NULL OR lang NOT IN (...)``), since a bare
    ``NOT IN`` drops NULLs (round-3 advice item 3)."""
    for num, den in list(rates.values()) + [default]:
        if not (0 <= num <= den and den > 0):
            raise ValueError(f"rate {num}/{den} out of [0, 1]")

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        u = md5_u32_of_int_ids(ids).astype(np.uint64)
        groups = batch[group_col].to_numpy(zero_copy_only=False)
        keep = np.zeros(len(ids), dtype=bool)
        # one vectorized compare per stratum (|rates| is small)
        seen = np.zeros(len(ids), dtype=bool)
        for g, (num, den) in rates.items():
            m = groups == g
            keep |= m & (u * np.uint64(den) < np.uint64(num * _TWO32))
            seen |= m
        dnum, dden = default
        keep |= ~seen & (u * np.uint64(dden) < np.uint64(dnum * _TWO32))
        return batch.filter(pa.array(keep))

    return ds.map_batches(fn, batch_format="pyarrow")


def cap_per_group(
    ds: rd.Dataset,
    group_col: str,
    n: int,
    id_col: str = "doc_id",
) -> rd.Dataset:
    """Keep at most ``n`` rows per group, selected by ascending
    md5(id) order (ties by id) — ROW_NUMBER() over a deterministic
    pseudo-random shuffle.  Output keeps the input columns plus the
    1-based ``rank``."""
    from .topk import topk_per_group

    def add_key(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        # ascending md5 order under topk's DESC sort = negated u32
        key = -md5_u32_of_int_ids(ids).astype(np.int64)
        return batch.append_column("_cap_key", pa.array(key, type=pa.int64()))

    keyed = ds.map_batches(add_key, batch_format="pyarrow")
    out = topk_per_group(keyed, group_col, "_cap_key", k=n, tie_col=id_col)
    return out.drop_columns(["_cap_key"])


def rebalance_to_proportions(
    ds: rd.Dataset,
    group_col: str,
    weights: dict[str, int],
    id_col: str = "doc_id",
) -> rd.Dataset:
    """Deterministically DOWN-sample so the kept rows' expected group
    proportions match ``weights`` (language / source rebalancing, the
    mixture-reweighting step of corpus curation).

    The bottleneck group b (min count/weight; double division, ties by
    group name — the SQL oracle orders identically) is kept whole and
    every other target group g is kept at the exact integer rational
    rate (w_g·count_b) / (w_b·count_g) ≤ 1, via the same
    u32(md5(id))·den < num·2^32 Bernoulli as every sampler here — so
    the decision is partition- and rerun-invariant.  Groups NOT in
    ``weights`` (including null) are dropped — this operator is a
    whitelist + reweighting, mirroring SQL's ``group IN (...)``.

    One bounded-cardinality count groupby (same stance as
    stages/topk.exact_quantiles: the group column is a dimension, not
    free text) + one streaming filter pass; no full-table shuffle."""
    import logging

    if not weights:
        raise ValueError("weights must be non-empty")
    for g, w in weights.items():
        if w <= 0:
            raise ValueError(f"weight for {g!r} must be positive, got {w}")
    from ray.data.aggregate import Count

    cdf = ds.groupby(group_col).aggregate(Count(alias_name="c")).to_pandas()
    counts = {
        g: int(c)
        for g, c in zip(cdf[group_col], cdf["c"])
        if g in weights
    }
    absent = sorted(set(weights) - set(counts))
    if absent:
        logging.getLogger(__name__).warning(
            "rebalance_to_proportions: target group(s) %s have no rows; "
            "the achievable rebalanced corpus is empty",
            absent,
        )
        return ds.limit(0)
    b = min(counts, key=lambda g: (counts[g] / weights[g], g))
    bc, bw = counts[b], weights[b]
    rates: dict[str, tuple[int, int]] = {}
    for g, c in counts.items():
        num, den = weights[g] * bc, bw * c
        if num > den:  # only from float near-ties; clamp to keep-all
            num = den
        if max(num, den) >= _TWO32:
            raise ValueError(
                f"rate {num}/{den} for group {g!r} overflows the exact "
                "u32 Bernoulli compare; scale weights down"
            )
        rates[g] = (num, den)
    return stratified_sample(ds, group_col, rates, default=(0, 1), id_col=id_col)
