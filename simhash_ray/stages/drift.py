"""Distribution-drift diagnostics over a numeric column.

``psi_per_group`` computes the Population Stability Index of each
group's value distribution against the GLOBAL distribution — the
standard "which segment drifted from the corpus mix" statistic for
monitoring a metric column (per event type, per source, per week):

    PSI(p, q) = Σ_b (p_b − q_b) · ln(p_b / q_b)

with bins = the global distribution's own discrete quantiles and
Laplace(+1) smoothing so empty cells stay finite.  Conventional read:
< 0.1 stable, 0.1–0.25 moderate shift, > 0.25 major shift.

Determinism / oracle story: values are quantized to integer
micro-units by ``floor(value · scale)`` (an IEEE-exact double multiply
+ floor, bit-identical in numpy and SQL), bin thresholds come from
:func:`..stages.topk.exact_quantiles` whose ``ceil(n·q)−1`` index rule
is pinned against DuckDB ``quantile_disc``, and a row's bin is the
count of thresholds strictly below its quantized value — so a DuckDB
oracle re-derives every number independently.

Scale shape: one bounded distinct-value histogram groupby for the
thresholds (the exact_quantiles cardinality assumption — switch the
threshold source to ``sampled_quantiles`` for unbounded/continuous
columns at extreme scale), then one streaming pass emitting per-block
(group, bin) partial counts into a ≤ groups×(n_bins+1)-key groupby;
the driver folds only that tiny cell table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Sum

from .topk import exact_quantiles


def psi_per_group(
    ds: rd.Dataset,
    group_col: str,
    value_col: str,
    n_bins: int = 10,
    scale: float = 1e6,
    max_distinct: int = 10_000_000,
) -> pa.Table:
    """One row per group: ``(group, psi)`` of the group's
    ``value_col`` distribution vs the global one (see module doc)."""
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")

    def quantize(batch: pa.Table) -> pa.Table:
        v = batch[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        vm = np.floor(v * scale).astype(np.int64)
        return pa.table(
            {
                group_col: batch[group_col],
                "vm": pa.array(vm, type=pa.int64()),
            }
        )

    narrow = (
        ds.select_columns([group_col, value_col])
        .map_batches(quantize, batch_format="pyarrow")
        .materialize()
    )

    qspec = {f"t{j}": (j, n_bins) for j in range(1, n_bins)}
    tq = exact_quantiles(narrow, "vm", qspec, max_distinct=max_distinct)
    thresholds = np.sort(
        np.asarray([tq[f"t{j}"][0].as_py() for j in range(1, n_bins)], dtype=np.int64)
    )

    def bin_counts(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {group_col: pa.array([], type=pa.string()),
                 "bin": pa.array([], type=pa.int64()),
                 "c": pa.array([], type=pa.int64())}
            )
        vm = batch["vm"].to_numpy(zero_copy_only=False)
        # bin = #thresholds strictly below vm (searchsorted 'left' over
        # the sorted threshold multiset == COUNT(t < vm) in SQL)
        b = np.searchsorted(thresholds, vm, side="left").astype(np.int64)
        df = pd.DataFrame(
            {group_col: batch[group_col].to_numpy(zero_copy_only=False), "bin": b}
        )
        agg = df.groupby([group_col, "bin"], as_index=False).size()
        return pa.table(
            {
                group_col: pa.array(
                    agg[group_col].to_numpy(dtype=object), type=pa.string()
                ),
                "bin": pa.array(agg["bin"].to_numpy(), type=pa.int64()),
                "c": pa.array(agg["size"].to_numpy().astype(np.int64)),
            }
        )

    cells = (
        narrow.map_batches(bin_counts, batch_format="pyarrow")
        .groupby([group_col, "bin"])
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
    )

    groups = np.sort(cells[group_col].unique())
    mat = np.zeros((len(groups), n_bins), dtype=np.int64)
    gidx = {g: i for i, g in enumerate(groups)}
    for g, b, c in cells.itertuples(index=False):
        mat[gidx[g], int(b)] += int(c)

    g_tot = mat.sum(axis=0)  # global bin counts
    n_all = int(g_tot.sum())
    q = (g_tot + 1.0) / (n_all + n_bins)
    n_g = mat.sum(axis=1, keepdims=True)
    p = (mat + 1.0) / (n_g + n_bins)
    psi = ((p - q) * np.log(p / q)).sum(axis=1)
    return pa.table(
        {
            group_col: pa.array(groups, type=pa.string()),
            "psi": pa.array(np.round(psi, 6), type=pa.float64()),
        }
    )
