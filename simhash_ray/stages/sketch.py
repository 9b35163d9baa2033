"""Distinct-count sketching (KMV / bottom-k) as a streaming Ray Data
aggregate.

``kmv_distinct`` estimates ``COUNT(DISTINCT col)`` with bounded memory
by keeping the ``k`` lexicographically smallest md5 digests of the
values seen (bottom-k / K-Minimum-Values estimator, Bar-Yossef et al.
RANDOM'02): with ``d`` distinct values uniformly hashed into [0, 1),
the k-th smallest hash ``x`` satisfies ``E[k / x] ≈ d + 1``, and the
unbiased estimate is ``(k - 1) / x`` (relative error ~ 1/sqrt(k)).
When fewer than ``k`` distinct hashes exist the count is exact.

Unlike HyperLogLog this estimator is a *deterministic* function of the
input value set — merge of per-block bottom-k sets equals bottom-k of
the union, independent of partitioning — so the driver's DuckDB oracle
can replay it exactly in SQL (``md5`` + ``ORDER BY`` + ``LIMIT k``;
queries.SQL_DOC_VOCAB_KMV).

Scale shape: one streaming ``map_batches`` pass emitting ≤ k rows per
block, a hash-prefix-bucketed reduce over those tiny partials (256
groups via ``map_groups_typed`` — typed empties, bounded group size
≤ the partial stream), and a 1-row finalize over ≤ 256·k digests.
md5-per-unique-value is the portable-oracle choice (precedent:
``text.rolling_fingerprint_batch``); production would swap a faster
64-bit hash at the cost of SQL replayability.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from .base import map_groups_typed

_PART_SCHEMA = pa.schema([("h", pa.string())])
_OUT_SCHEMA = pa.schema([("n_distinct_est", pa.float64()), ("kmv_k", pa.int64())])
_TWO64 = float(2**64)


def _bottom_k(hashes: np.ndarray, k: int) -> np.ndarray:
    u = np.unique(hashes)  # sorted ascending
    return u[:k]


def kmv_distinct(ds: rd.Dataset, col: str, k: int = 256) -> rd.Dataset:
    """1-row Dataset ``{n_distinct_est: double, kmv_k: int64}`` —
    bottom-k estimate of the number of distinct non-null values in
    ``ds[col]`` (exact when distinct < k).  The estimate is rounded to
    6 decimals so the float compares equal across engines."""
    if k < 2:
        raise ValueError("k must be >= 2")

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _PART_SCHEMA.empty_table()
        uniq = pc.unique(batch[col].combine_chunks().cast(pa.string())).drop_null()
        hs = np.array(
            [hashlib.md5(s.encode("utf-8")).hexdigest() for s in uniq.to_pylist()],
            dtype=object,
        )
        return pa.table({"h": pa.array(_bottom_k(hs, k), type=pa.string())})

    def add_bucket(batch: pa.Table) -> pa.Table:
        hs = batch["h"].to_numpy(zero_copy_only=False)
        bucket = np.array([int(h[:2], 16) for h in hs], dtype=np.int64)
        return batch.append_column("bucket", pa.array(bucket))

    def combine_group(g: pa.Table) -> pa.Table:
        hs = g["h"].to_numpy(zero_copy_only=False)
        return pa.table({"h": pa.array(_bottom_k(hs, k), type=pa.string())})

    def finalize(batch: pa.Table) -> pa.Table:
        hs = _bottom_k(batch["h"].to_numpy(zero_copy_only=False), k)
        if len(hs) < k:
            est = float(len(hs))
        else:
            frac = int(hs[k - 1][:16], 16) / _TWO64
            est = (k - 1) / frac
        return pa.table(
            {
                "n_distinct_est": pa.array([np.round(est, 6)], type=pa.float64()),
                "kmv_k": pa.array([k], type=pa.int64()),
            },
            schema=_OUT_SCHEMA,
        )

    parts = ds.map_batches(partial, batch_format="pyarrow")
    # bucketed reduce: group the tiny partial stream by md5 first byte
    # (256 groups), keep bottom-k per bucket — the global bottom-k is a
    # subset of the union, so finalize sees ≤ 256*k rows regardless of
    # input block count.  map_groups_typed keeps empties typed.
    bucketed = parts.map_batches(add_bucket, batch_format="pyarrow")
    merged = map_groups_typed(
        bucketed, "bucket", combine_group, _PART_SCHEMA.empty_table()
    )
    final = merged.repartition(1).map_batches(
        finalize, batch_size=None, batch_format="pyarrow"
    )
    # an all-empty input can collapse to zero blocks inside the sort,
    # so finalize would never run — union a typed 0-estimate default
    # and keep the first row (finalize's, when it exists)
    default = rd.from_arrow(
        pa.table(
            {
                "n_distinct_est": pa.array([0.0], type=pa.float64()),
                "kmv_k": pa.array([k], type=pa.int64()),
            },
            schema=_OUT_SCHEMA,
        )
    )
    return final.union(default).limit(1)
