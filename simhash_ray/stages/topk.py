"""Per-group top-k and exact distributed quantiles.

Two order-statistics operators a training-data pipeline leans on —
"best k examples per bucket" (per-source / per-language / per-cluster
sampling) and "where are the length/quality percentiles" (corpus
curation thresholds) — both built on the partial-then-merge shape that
keeps the shuffle k·groups rows and never whole partitions.

Scale notes (documented partitioning assumptions):
- ``topk_per_group``: every map task emits at most k rows per group it
  sees, so the groupby-merge moves ≤ k × n_groups × n_blocks narrow
  rows — independent of input size.  The merge uses
  ``base.map_groups_typed`` (sorted-block group slicing).
- ``exact_quantiles``: exact (not sketched) by exploiting bounded
  VALUE cardinality, not bounded rows: the shuffle carries one
  (value, count) row per distinct value per block and the driver folds
  the final distinct-value histogram (token counts, char lengths,
  scores — ≤ ~10^6 distinct values even at 10^12 rows).  For unbounded
  or continuous columns use a sketch instead; this operator asserts
  the histogram stays under ``max_distinct``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Sum

from .base import map_groups_typed


def _topk_take(
    tbl: pa.Table,
    group_col: str,
    order_col: str,
    tie_col: str,
    k: int,
    with_rank: bool,
) -> pa.Table:
    """Vectorized per-block top-k: one lexsort + run-rank, no Python
    per-row work.  Order = ``order_col`` DESC, ties broken by
    ``tie_col`` ASC (bit-for-bit the SQL ROW_NUMBER() spec)."""
    codes = pd.factorize(tbl[group_col].to_numpy(zero_copy_only=False))[0]
    v = tbl[order_col].to_numpy(zero_copy_only=False)
    t = tbl[tie_col].to_numpy(zero_copy_only=False)
    order = np.lexsort((t, -v, codes))
    gs = codes[order]
    new_run = np.ones(len(gs), dtype=bool)
    new_run[1:] = gs[1:] != gs[:-1]
    run_start = np.maximum.accumulate(np.where(new_run, np.arange(len(gs)), 0))
    rank = np.arange(len(gs)) - run_start
    keep = rank < k
    out = tbl.take(pa.array(order[keep], type=pa.int64()))
    if with_rank:
        out = out.append_column(
            "rank", pa.array((rank[keep] + 1).astype(np.int64), type=pa.int64())
        )
    return out


def topk_per_group(
    ds: rd.Dataset,
    group_col: str,
    order_col: str,
    k: int,
    tie_col: str,
) -> rd.Dataset:
    """Top-k rows per group by ``order_col`` DESC (ties: ``tie_col``
    ASC), with a 1-based ``rank`` column — ROW_NUMBER() semantics.

    Project ``ds`` to the needed columns before calling: the partial
    stage forwards every input column of its surviving rows."""
    def _pa_type(t):
        if isinstance(t, pa.DataType):
            return t
        # pandas-block schemas carry numpy dtypes; object dtype = strings here
        dt = np.dtype(t) if not isinstance(t, np.dtype) else t
        return pa.string() if dt == object else pa.from_numpy_dtype(dt)

    sch = ds.schema()
    empty = pa.table(
        {n: pa.array([], type=_pa_type(t)) for n, t in zip(sch.names, sch.types)}
    ).append_column("rank", pa.array([], type=pa.int64()))

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty.drop_columns(["rank"])
        return _topk_take(batch, group_col, order_col, tie_col, k, with_rank=False)

    def merge(group: pa.Table) -> pa.Table:
        return _topk_take(group, group_col, order_col, tie_col, k, with_rank=True)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return map_groups_typed(partials, group_col, merge, empty)


def exact_quantiles_per_group(
    ds: rd.Dataset,
    group_col: str,
    col: str,
    quantiles: dict[str, tuple[int, int]],
    max_distinct: int = 10_000_000,
) -> pa.Table:
    """Per-group :func:`exact_quantiles`: one row per group, same
    quantile_disc index arithmetic.  The shuffle carries one
    (group, value, count) row per distinct pair per block; the folded
    per-group histograms (bounded by ``max_distinct`` TOTAL rows,
    asserted before collection) sort once on the driver."""

    def vc(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {group_col: pa.array([], type=pa.string()),
                 "val": pa.array([], type=pa.int64()),
                 "cnt": pa.array([], type=pa.int64())}
            )
        df = pd.DataFrame(
            {
                group_col: batch[group_col].to_numpy(zero_copy_only=False),
                "val": batch[col].to_numpy(zero_copy_only=False).astype(np.int64),
            }
        )
        agg = df.groupby([group_col, "val"], as_index=False).size()
        return pa.table(
            {
                group_col: pa.array(agg[group_col].to_numpy(dtype=object),
                                    type=pa.string()),
                "val": pa.array(agg["val"].to_numpy(), type=pa.int64()),
                "cnt": pa.array(agg["size"].to_numpy().astype(np.int64),
                                type=pa.int64()),
            }
        )

    hist_ds = (
        ds.select_columns([group_col, col])
        .map_batches(vc, batch_format="pyarrow")
        .groupby([group_col, "val"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .materialize()
    )
    n_rows = hist_ds.count()
    if n_rows > max_distinct:
        raise ValueError(
            f"exact_quantiles_per_group: {n_rows} distinct (group, value) "
            f"pairs exceeds max_distinct={max_distinct}; use a sketch"
        )
    hist = hist_ds.to_pandas().sort_values([group_col, "val"])
    out_rows = {group_col: []}
    for name in quantiles:
        out_rows[name] = []
    for g, sub in hist.groupby(group_col, sort=True):
        vals = sub["val"].to_numpy()
        cum = sub["cnt"].to_numpy().cumsum()
        n = int(cum[-1])
        out_rows[group_col].append(g)
        for name, (num, den) in quantiles.items():
            idx = _disc_index(n, num, den)
            out_rows[name].append(int(vals[np.searchsorted(cum, idx + 1)]))
    return pa.table(
        {
            group_col: pa.array(out_rows[group_col], type=pa.string()),
            **{
                name: pa.array(out_rows[name], type=pa.int64())
                for name in quantiles
            },
        }
    )


def exact_quantiles(
    ds: rd.Dataset,
    col: str,
    quantiles: dict[str, tuple[int, int]],
    max_distinct: int = 10_000_000,
) -> pa.Table:
    """One-row table of EXACT discrete quantiles of an integer column.

    ``quantiles`` maps output column name → (num, den) with
    q = num/den; each result is the value at 0-based sorted index
    ceil(n·num/den) − 1 (``_disc_index``, integer arithmetic) —
    DuckDB's ``quantile_disc`` rule, pinned across n and q by test.

    Distributed shape: per-block value counts → groupby(value) sum →
    the distinct-value histogram (small by the bounded-cardinality
    assumption, asserted) folds on the driver."""

    def vc(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"val": pa.array([], type=pa.int64()),
                 "cnt": pa.array([], type=pa.int64())}
            )
        u, c = np.unique(
            batch[col].to_numpy(zero_copy_only=False).astype(np.int64),
            return_counts=True,
        )
        return pa.table(
            {"val": pa.array(u, type=pa.int64()),
             "cnt": pa.array(c.astype(np.int64), type=pa.int64())}
        )

    hist_ds = (
        ds.select_columns([col])
        .map_batches(vc, batch_format="pyarrow")
        .groupby("val")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .materialize()
    )
    # guard BEFORE collecting — the point is to never pull an unbounded
    # histogram onto the driver
    n_distinct = hist_ds.count()
    if n_distinct > max_distinct:
        raise ValueError(
            f"exact_quantiles: {n_distinct} distinct values exceeds "
            f"max_distinct={max_distinct}; use a sketch for this column"
        )
    hist = hist_ds.to_pandas().sort_values("val")
    vals = hist["val"].to_numpy()
    cum = hist["cnt"].to_numpy().cumsum()
    n = int(cum[-1]) if len(cum) else 0
    out = {}
    for name, (num, den) in quantiles.items():
        if n == 0:
            out[name] = pa.array([None], type=pa.int64())
            continue
        idx = _disc_index(n, num, den)
        out[name] = pa.array(
            [int(vals[np.searchsorted(cum, idx + 1)])], type=pa.int64()
        )
    return pa.table(out)


def _disc_index(n: int, num: int, den: int) -> int:
    """0-based sorted index of the discrete q=num/den quantile:
    ceil(n·q) − 1, clamped at 0 — pinned against DuckDB's
    quantile_disc across n and q in tests (NOT floor((n−1)·q), which
    coincides only when n·q is ≥ the next integer boundary — e.g. both
    give 449 at n=500, q=0.9, but 64 vs 65 at n=73)."""
    return max(0, (n * num + den - 1) // den - 1)


def sampled_quantiles(
    ds: rd.Dataset,
    col: str,
    quantiles: dict[str, tuple[int, int]],
    rate: tuple[int, int],
    id_col: str = "doc_id",
    max_distinct: int = 10_000_000,
) -> pa.Table:
    """Approximate quantiles at UNBOUNDED value cardinality: a
    deterministic md5-Bernoulli(rate) row sample (stages/sample
    .hash_sample — partition-invariant, no RNG, SQL-replayable)
    followed by :func:`exact_quantiles` on the sample.

    This is the scale path where exact_quantiles' whole-column
    bounded-distinct requirement cannot hold (floating scores,
    unbounded lengths): the histogram the driver folds is bounded by
    the SAMPLE's distinct count instead.  Deterministic given the data,
    so an oracle replays it exactly; the sample q-quantile's true rank
    deviates by the usual O(sqrt(q(1-q)/m)) at sample size m (DKW
    bound) — callers pick the rate so m stays large enough for their
    tolerance."""
    from .sample import hash_sample

    num, den = rate
    return exact_quantiles(
        hash_sample(ds, num, den, id_col=id_col), col, quantiles, max_distinct
    )
