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
from ray.data.aggregate import Max as AggMax
from ray.data.aggregate import Min as AggMin
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


def _value_histogram(
    narrow: rd.Dataset, col: str, max_distinct: int
) -> tuple[np.ndarray, np.ndarray]:
    """Sorted distinct-value histogram of an integer column:
    (values, cumulative counts).  Per-block ``np.unique`` partials →
    one bounded groupby → driver fold (asserted ≤ ``max_distinct``
    rows before collection)."""

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
        narrow.map_batches(vc, batch_format="pyarrow")
        .groupby("val")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .materialize()
    )
    n_distinct = hist_ds.count()
    if n_distinct > max_distinct:
        raise ValueError(
            f"_value_histogram: {n_distinct} distinct values exceeds "
            f"max_distinct={max_distinct}"
        )
    hist = hist_ds.to_pandas().sort_values("val")
    return hist["val"].to_numpy(), hist["cnt"].to_numpy().cumsum()


def _wide_bucket(v: np.ndarray, b_lo: int, b_w: int) -> np.ndarray:
    """``(v - b_lo) // b_w`` computed overflow-safely: for an int64
    column whose min/max span more than half the int64 range (hashed
    values — exactly what the unbounded order-statistic path is
    advertised for), ``v - b_lo`` in int64 wraps and rows land in wrong
    buckets.  Two's-complement wraparound in uint64 makes the
    difference exact for any int64 pair (it is always < 2**64)."""
    diff = v.astype(np.int64).astype(np.uint64) - np.uint64(
        b_lo & 0xFFFFFFFFFFFFFFFF
    )
    return (diff // np.uint64(b_w)).astype(np.int64)


def _id_order_statistic(
    narrow: rd.Dataset,
    value: int,
    m: int,
    n_in: int,
    col: str,
    id_col: str,
    n_buckets: int,
    collect_limit: int,
) -> int:
    """The m-th smallest (1-based) ``id_col`` among rows with
    ``col == value`` — found WITHOUT collecting the class: rounds of
    ≤ ``n_buckets``-cardinality bucket-count groupbys over the id
    range narrow the candidate interval ~``n_buckets``× per round
    (the stages/sample.select_token_budget refinement shape); the
    final ≤ ``collect_limit`` candidates are collected for the exact
    pick.  Ids are assumed distinct (they are row keys)."""
    cls = narrow.filter(expr=f"{col} == {value}")
    lo, hi = None, None  # inclusive id interval containing the answer
    before = 0  # rows of the class with id < lo

    while n_in > collect_limit:
        if lo is None:
            # one aggregate pass bounds the id range; only needed when
            # the class is too big to collect outright
            mm = cls.aggregate(AggMin(id_col), AggMax(id_col))
            lo, hi = int(mm[f"min({id_col})"]), int(mm[f"max({id_col})"])
        span = hi - lo + 1
        if span <= 1:
            break  # degenerate: all remaining candidates share one id
        k = min(n_buckets, span)
        width = (span + k - 1) // k
        iv = (lo, hi, width)

        def part(batch: pa.Table, iv=iv) -> pa.Table:
            b_lo, b_hi, b_w = iv
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            msk = (ids >= b_lo) & (ids <= b_hi)
            if not msk.any():
                return pa.table(
                    {"bucket": pa.array([], type=pa.int64()),
                     "cnt": pa.array([], type=pa.int64())}
                )
            b = _wide_bucket(ids[msk], b_lo, b_w)
            cnts = np.bincount(b).astype(np.int64)
            nz = np.flatnonzero(cnts)
            return pa.table(
                {"bucket": pa.array(nz, type=pa.int64()),
                 "cnt": pa.array(cnts[nz], type=pa.int64())}
            )

        agg = (
            cls.map_batches(part, batch_format="pyarrow")
            .groupby("bucket")
            .aggregate(Sum("cnt", alias_name="cnt"))
            .to_pandas()
            .sort_values("bucket")
            .reset_index(drop=True)
        )
        cum = before + agg["cnt"].cumsum()
        j = int((cum >= m).idxmax())
        before += int(agg["cnt"].iloc[:j].sum())
        lo_new = lo + int(agg["bucket"].iloc[j]) * width
        hi = min(hi, lo_new + width - 1)
        lo = lo_new
        n_in = int(agg["cnt"].iloc[j])

    flt = f"{col} == {value}"
    if lo is not None:
        flt += f" and {id_col} >= {lo} and {id_col} <= {hi}"
    ids = np.sort(
        narrow.filter(expr=flt).to_pandas()[id_col].to_numpy().astype(np.int64)
    )
    return int(ids[m - before - 1])


def _order_statistic(
    narrow: rd.Dataset,
    m: int,
    n_in: int,
    col: str,
    n_buckets: int = 4096,
    collect_limit: int = 1_000_000,
) -> int:
    """The m-th smallest (1-based, duplicates counted) value of an
    integer column — found WITHOUT any bounded-cardinality assumption:
    rounds of ≤ ``n_buckets``-key bucket-count groupbys over the value
    range narrow the candidate interval ~``n_buckets``× per round;
    the final ≤ ``collect_limit`` candidate rows are collected for the
    exact pick.  An interval collapsed to one value short-circuits
    (every candidate equals it), so pathological multiplicity cannot
    force an unbounded collect.  This is the exact-quantile scale path
    for unbounded-cardinality columns (the histogram-based
    :func:`exact_quantiles` needs bounded distincts; the sampled
    variant trades exactness)."""
    lo: int | None = None
    hi: int | None = None
    before = 0

    while n_in > collect_limit:
        if lo is None:
            mm = narrow.aggregate(AggMin(col), AggMax(col))
            lo, hi = int(mm[f"min({col})"]), int(mm[f"max({col})"])
        span = hi - lo + 1
        if span <= 1:
            return lo
        k = min(n_buckets, span)
        width = (span + k - 1) // k
        iv = (lo, hi, width)

        def part(batch: pa.Table, iv=iv) -> pa.Table:
            b_lo, b_hi, b_w = iv
            v = batch[col].to_numpy(zero_copy_only=False)
            msk = (v >= b_lo) & (v <= b_hi)
            if not msk.any():
                return pa.table(
                    {"bucket": pa.array([], type=pa.int64()),
                     "cnt": pa.array([], type=pa.int64())}
                )
            b = _wide_bucket(v[msk], b_lo, b_w)
            cnts = np.bincount(b).astype(np.int64)
            nz = np.flatnonzero(cnts)
            return pa.table(
                {"bucket": pa.array(nz, type=pa.int64()),
                 "cnt": pa.array(cnts[nz], type=pa.int64())}
            )

        agg = (
            narrow.map_batches(part, batch_format="pyarrow")
            .groupby("bucket")
            .aggregate(Sum("cnt", alias_name="cnt"))
            .to_pandas()
            .sort_values("bucket")
            .reset_index(drop=True)
        )
        cum = before + agg["cnt"].cumsum()
        j = int((cum >= m).idxmax())
        before += int(agg["cnt"].iloc[:j].sum())
        lo_new = lo + int(agg["bucket"].iloc[j]) * width
        hi = min(hi, lo_new + width - 1)
        lo = lo_new
        n_in = int(agg["cnt"].iloc[j])

    flt = None
    if lo is not None:
        flt = f"{col} >= {lo} and {col} <= {hi}"
    seg = narrow.filter(expr=flt) if flt else narrow
    vals = np.sort(seg.to_pandas()[col].to_numpy().astype(np.int64))
    return int(vals[m - before - 1])


def exact_quantiles_unbounded(
    ds: rd.Dataset,
    col: str,
    quantiles: dict[str, tuple[int, int]],
    n_buckets: int = 4096,
    collect_limit: int = 1_000_000,
) -> pa.Table:
    """EXACT discrete quantiles of an integer column with UNBOUNDED
    value cardinality — one :func:`_order_statistic` refinement per
    requested quantile instead of :func:`exact_quantiles`' whole-column
    histogram (same ``ceil(n·q)−1`` quantile_disc index rule).  Each
    quantile costs O(log_{n_buckets}(range)) streaming passes; for the
    common 2–5 requested quantiles that is a handful of narrow
    bucket-count groupbys, never a distinct-value shuffle."""
    narrow = ds.select_columns([col]).materialize()
    n = narrow.count()
    out = {}
    for name, (num, den) in quantiles.items():
        if n == 0:
            out[name] = pa.array([None], type=pa.int64())
            continue
        m = _disc_index(n, num, den) + 1
        out[name] = pa.array(
            [_order_statistic(narrow, m, n, col, n_buckets, collect_limit)],
            type=pa.int64(),
        )
    return pa.table(out)


_INT64_MAX = (1 << 63) - 1


def exact_ntile(
    ds: rd.Dataset,
    col: str,
    k: int,
    id_col: str = "doc_id",
    max_distinct: int = 10_000_000,
    n_buckets: int = 4096,
    collect_limit: int = 1_000_000,
) -> rd.Dataset:
    """EXACT ``NTILE(k) OVER (ORDER BY col, id)`` — the global
    rank-bucketing window verb (percentile cohorts, curriculum
    buckets) — without a global sort and without ranking every row.

    Distributed shape: the k−1 tile boundaries are RANKS; each
    boundary resolves to a lexicographic (value, id) threshold using
    (a) the bounded distinct-value histogram (one narrow groupby —
    the exact_quantiles cardinality assumption) to locate the
    boundary's value class, then (b) when a boundary falls strictly
    inside a class, a distributed order-statistic search on ids
    within that one class (:func:`_id_order_statistic` — bucket-count
    rounds, never a class collect above ``collect_limit``).  One final
    stateless pass assigns ``tile = 1 + #thresholds < (value, id)``
    (O(k) vectorized compares per batch).  Ties on ``col`` are broken
    by ``id_col`` exactly as the SQL window spec does, so the output
    hash-matches ``NTILE`` row for row.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    narrow = ds.select_columns([id_col, col]).materialize()
    vals, cum = _value_histogram(narrow, col, max_distinct)
    n = int(cum[-1]) if len(cum) else 0
    empty = pa.table(
        {id_col: pa.array([], type=pa.int64()),
         "tile": pa.array([], type=pa.int64())}
    )
    if n == 0:
        return rd.from_arrow(empty)

    base, rem = divmod(n, k)
    sizes = np.full(k, base, dtype=np.int64)
    sizes[:rem] += 1  # NTILE: the first n % k tiles get one extra row
    bound_ranks = np.cumsum(sizes)[:-1]  # rank of the LAST row of tiles 1..k-1

    # Resolve each boundary rank to a (value, id) threshold.  Boundaries
    # are grouped BY VALUE CLASS so the number of Ray passes scales with
    # the number of classes touched (≤ min(k−1, distinct)), never with
    # k: small classes are collected together in ≤ total_rows /
    # collect_limit chunked passes; only a class individually larger
    # than collect_limit pays refinement rounds.
    tv = np.empty(k - 1, dtype=np.int64)
    ti = np.empty(k - 1, dtype=np.int64)
    small_cls: dict[int, list[tuple[int, int]]] = {}  # class idx → [(j, m)]
    big_cls: dict[int, list[tuple[int, int]]] = {}
    for j, B in enumerate(bound_ranks):
        if B <= 0:  # empty leading tiles (k > n): threshold below all rows
            tv[j] = int(vals[0]) - 1
            ti[j] = _INT64_MAX
            continue
        i = int(np.searchsorted(cum, B))
        before = int(cum[i - 1]) if i else 0
        tv[j] = int(vals[i])
        if int(cum[i]) == int(B):
            # boundary lands exactly on the end of the value class: the
            # sentinel id compares above every real id
            ti[j] = _INT64_MAX
        else:
            m = int(B) - before
            n_cls = int(cum[i]) - before
            tgt = small_cls if n_cls <= collect_limit else big_cls
            tgt.setdefault(i, []).append((j, m))

    # chunk small classes by cumulative row count; one collect pass per
    # chunk answers every boundary of every class in the chunk
    pending = sorted(small_cls)
    while pending:
        chunk: list[int] = []
        rows = 0
        while pending:
            i = pending[0]
            sz = int(cum[i]) - (int(cum[i - 1]) if i else 0)
            if chunk and rows + sz > collect_limit:
                break
            chunk.append(pending.pop(0))
            rows += sz
        want = np.asarray([int(vals[i]) for i in chunk], dtype=np.int64)

        def pick(batch: pa.Table, want=want) -> pa.Table:
            msk = np.isin(
                batch[col].to_numpy(zero_copy_only=False).astype(np.int64), want
            )
            return batch.filter(pa.array(msk))

        seg = narrow.map_batches(pick, batch_format="pyarrow").to_pandas()
        for i in chunk:
            ids = np.sort(
                seg.loc[seg[col] == int(vals[i]), id_col]
                .to_numpy()
                .astype(np.int64)
            )
            for j, m in small_cls[i]:
                ti[j] = int(ids[m - 1])

    for i, targets in big_cls.items():
        n_cls = int(cum[i]) - (int(cum[i - 1]) if i else 0)
        for j, m in targets:
            ti[j] = _id_order_statistic(
                narrow, int(vals[i]), m, n_cls, col, id_col,
                n_buckets, collect_limit,
            )

    def assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty
        v = batch[col].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        tile = np.ones(len(v), dtype=np.int64)
        for t_v, t_i in zip(tv, ti):  # k is small: O(k) vector compares
            tile += (v > t_v) | ((v == t_v) & (ids > t_i))
        return pa.table(
            {id_col: pa.array(ids, type=pa.int64()),
             "tile": pa.array(tile, type=pa.int64())}
        )

    return narrow.map_batches(assign, batch_format="pyarrow")


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
