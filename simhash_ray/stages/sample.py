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
