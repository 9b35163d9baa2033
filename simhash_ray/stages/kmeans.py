"""Distributed spherical k-means + SemDeDup-style embedding dedup.

Semantic dedup (SemDeDup, Abbas et al. 2023, arXiv:2303.09540) is the
embedding-space complement of the signature pipelines: cluster the
corpus's embeddings with k-means, then search for near-duplicates ONLY
within each cluster — the k-means partition turns the O(n²) cosine
dup-pair problem into k independent O((n/k)²) problems that parallelize
over a single ``groupby("cent")`` shuffle.

Ray-Data shape (no reference analogue — the reference's only learned
stage is the out-of-scope SpatialPooler chain, SURVEY.md §2.3):

- ``kmeans_fit`` — Lloyd iterations as streaming ``map_batches``
  passes: centroids broadcast once per iteration (``ray.put``), each
  batch emits per-centroid partial sums (≤ k tiny rows per batch), the
  driver reduces them.  Nothing but the (k × dim) matrix and the
  ≤ k·n_batches partial rows ever leaves the workers.
- ``assign_centroids`` — one streaming pass adding an int32 ``cent``
  column (float64 matmul against the broadcast unit-centroid matrix,
  argmax-cosine, ties to the lowest centroid id).
- ``semdedup`` — assign, then ``groupby("cent").map_groups`` marks each
  row a duplicate iff a same-cluster row with a SMALLER id is within
  the rational cosine threshold (``sim · den ≥ num``, float64 on both
  sides so a DuckDB ``list_cosine_similarity`` oracle agrees — the
  same discipline as stages/ann.cosine_dup_pairs).

Determinism (the property every operator in this repo guarantees):
- Seeding needs no RNG: the initial centroids are the k rows with the
  smallest ``(md5_u32(id), id)`` — the sampling operators' deterministic
  uniform variate (functions/hashing.py), partition-invariant.
- Lloyd's accumulate is ORDER-INDEPENDENT: unit vectors are quantized
  to 2^-30 fixed-point int64 before summing, so partial sums reduce
  exactly regardless of batch boundaries or collection order (float
  accumulation would drift with Ray's nondeterministic block order).
  Headroom: |q| ≤ 2^30 per element ⇒ int64 sums are exact up to 2^33
  (~8.6e9) rows per centroid — beyond that, shard the fit sample.
- Given fixed centroids, assignment is pure per-row argmax.

100-TB notes: fit on a deterministic hash-sample (``fit_sample``; the
standard k-means-on-a-sample recipe — centroid quality needs ≫ k
points, not the full corpus), then one streaming assignment pass over
everything.  The broadcast matrix is k × dim × 8 B (100k × 768 → 600
MB: one object-store put, zero-copy reads).  The per-cluster pair scan
is O((n/k)²·d); size k so n/k stays in the ~10^4–10^5 band and watch
the ``semdedup: cluster … exceeds`` warning for skewed clusters.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..functions.hashing import md5_u32_of_int_ids
from .ann import _to_matrix

logger = logging.getLogger(__name__)

_FP_SHIFT = 30  # fixed-point bits for the exact Lloyd accumulate
_FP_ONE = float(1 << _FP_SHIFT)


def _unit_rows(mat: np.ndarray) -> np.ndarray:
    norm = np.linalg.norm(mat, axis=1, keepdims=True)
    return mat / np.where(norm == 0.0, 1.0, norm)


def _seed_centroids(
    vectors: rd.Dataset, k: int, id_col: str, vec_col: str
) -> np.ndarray:
    """(k, dim) unit float64 seeds = the k rows with the smallest
    (md5_u32(id), id) — deterministic and partition-invariant, computed
    as per-batch bottom-k partials merged on the driver (the KMV
    sketch's collection shape; ≤ k rows per batch move)."""

    def bottom_k(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "u": pa.array([], type=pa.int64()),
                    "id": pa.array([], type=pa.int64()),
                    "vec": pa.array([], type=pa.list_(pa.float64())),
                }
            )
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        u = md5_u32_of_int_ids(ids).astype(np.int64)
        take = np.lexsort((ids, u))[:k]
        mat = _to_matrix(batch[vec_col])[take]
        return pa.table(
            {
                "u": pa.array(u[take], type=pa.int64()),
                "id": pa.array(ids[take], type=pa.int64()),
                "vec": pa.array(list(mat), type=pa.list_(pa.float64())),
            }
        )

    parts = vectors.select_columns([id_col, vec_col]).map_batches(
        bottom_k, batch_format="pyarrow"
    ).to_pandas()
    if len(parts) < k:
        raise ValueError(f"kmeans: k={k} exceeds row count {len(parts)}")
    parts = parts.sort_values(["u", "id"], kind="mergesort").head(k)
    return _unit_rows(np.stack(parts["vec"].to_numpy()).astype(np.float64))


def _assign(mat: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """Argmax-cosine centroid per unit row; np.argmax takes the FIRST
    max, so exact ties resolve to the lowest centroid id (the oracle's
    ``ORDER BY sim DESC, cent`` rule)."""
    return np.argmax(mat @ cents.T, axis=1)


def kmeans_fit(
    vectors: rd.Dataset,
    k: int,
    n_iters: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    fit_sample: tuple[int, int] | None = None,
) -> np.ndarray:
    """Spherical k-means (Lloyd): returns the (k, dim) unit float64
    centroid matrix after a fixed ``n_iters`` rounds (fixed so the
    output is run-invariant; convergence-based stopping would make it
    depend on float noise).  ``fit_sample=(num, den)`` fits on the
    deterministic hash-Bernoulli sample (stages/sample.hash_sample) —
    the 100-TB path."""
    if fit_sample is not None:
        from .sample import hash_sample

        vectors = hash_sample(vectors, *fit_sample, id_col=id_col)
    vectors = vectors.select_columns([id_col, vec_col]).materialize()
    cents = _seed_centroids(vectors, k, id_col, vec_col)
    dim = cents.shape[1]

    for it in range(n_iters):
        ref = ray.put(cents)

        def partial(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return pa.table(
                    {
                        "cent": pa.array([], type=pa.int32()),
                        "n": pa.array([], type=pa.int64()),
                        "qsum": pa.array([], type=pa.list_(pa.int64())),
                    }
                )
            c = ray.get(ref)
            mat = _unit_rows(_to_matrix(batch[vec_col]))
            a = _assign(mat, c)
            q = np.rint(mat * _FP_ONE).astype(np.int64)
            order = np.argsort(a, kind="stable")
            a_sorted = a[order]
            starts = np.flatnonzero(np.diff(a_sorted, prepend=-1))
            sums = np.add.reduceat(q[order], starts, axis=0)
            counts = np.diff(np.append(starts, len(a_sorted)))
            return pa.table(
                {
                    "cent": pa.array(a_sorted[starts].astype(np.int32),
                                     type=pa.int32()),
                    "n": pa.array(counts.astype(np.int64), type=pa.int64()),
                    "qsum": pa.array(list(sums), type=pa.list_(pa.int64())),
                }
            )

        parts = vectors.map_batches(partial, batch_format="pyarrow").to_pandas()
        total = np.zeros((k, dim), dtype=np.int64)
        n_rows = np.zeros(k, dtype=np.int64)
        cidx = parts["cent"].to_numpy()
        np.add.at(total, cidx, np.stack(parts["qsum"].to_numpy()))
        np.add.at(n_rows, cidx, parts["n"].to_numpy())
        nonempty = n_rows > 0
        new = cents.copy()  # empty clusters keep their previous centroid
        new[nonempty] = _unit_rows(
            total[nonempty].astype(np.float64)
            / (n_rows[nonempty, None].astype(np.float64) * _FP_ONE)
        )
        cents = new
    return cents


def assign_centroids(
    vectors: rd.Dataset,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> rd.Dataset:
    """Adds int32 ``cent`` = argmax-cosine centroid id.  One streaming
    pass; the centroid matrix is put once and read zero-copy."""
    ref = ray.put(np.ascontiguousarray(centroids, dtype=np.float64))

    def fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column(
                "cent", pa.array([], type=pa.int32())
            )
        c = ray.get(ref)
        mat = _unit_rows(_to_matrix(batch[vec_col]))
        return batch.append_column(
            "cent", pa.array(_assign(mat, c).astype(np.int32), type=pa.int32())
        )

    return vectors.map_batches(fn, batch_format="pyarrow")


def semdedup(
    vectors: rd.Dataset,
    k: int,
    threshold_num: int,
    threshold_den: int,
    n_iters: int = 6,
    centroids: np.ndarray | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_group: int = 100_000,
) -> tuple[rd.Dataset, np.ndarray]:
    """SemDeDup: (assignment with ``is_dup``, centroid matrix).

    A row is a duplicate iff some SAME-CLUSTER row with a smaller id has
    ``cos · den ≥ num`` — so per duplicate group the smallest id
    survives (the signature pipelines' min-id election, restated in
    embedding space).  Marking against smaller ids only (not a full CC)
    is the SemDeDup paper's semantics: one pairwise scan per cluster,
    no transitive chaining across the threshold.

    Returns the centroids too so callers (and the SQL oracle) can
    reproduce the assignment from the exact same matrix."""
    if centroids is None:
        centroids = kmeans_fit(
            vectors, k, n_iters=n_iters, id_col=id_col, vec_col=vec_col
        )
    assigned = assign_centroids(vectors, centroids, id_col, vec_col)

    def mark(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        g = len(df)
        if g > max_group:
            logger.warning(
                "semdedup: cluster %s has %d rows (> max_group=%d) — the "
                "O(g²) scan is exact but this cluster dominates cost; "
                "raise k or pre-split the hot cluster",
                df["cent"].iat[0], g, max_group,
            )
        mat = _unit_rows(
            np.stack(df[vec_col].to_numpy()).astype(np.float64)
        )
        is_dup = np.zeros(g, dtype=bool)
        # row blocks bound the g×g similarity matrix's memory
        block = max(1, min(g, (1 << 24) // max(g, 1)))
        for lo in range(0, g, block):
            hi = min(g, lo + block)
            sims = mat[lo:hi] @ mat.T
            hit = sims * threshold_den >= threshold_num
            # only columns j < row index i count (smaller id ⇒ survivor)
            cols = np.arange(g)[None, :]
            rows = np.arange(lo, hi)[:, None]
            is_dup[lo:hi] = np.any(hit & (cols < rows), axis=1)
        return pd.DataFrame(
            {
                id_col: df[id_col].to_numpy(),
                "cent": df["cent"].to_numpy(),
                "is_dup": is_dup,
            }
        )

    out = assigned.select_columns([id_col, vec_col, "cent"]).groupby(
        "cent"
    ).map_groups(mark, batch_format="pandas")
    return out, centroids


def centroids_table(centroids: np.ndarray) -> pa.Table:
    """(cent:int32, centroid:list<double>) — the staging shape the SQL
    oracles read back with ``read_parquet``."""
    return pa.table(
        {
            "cent": pa.array(
                np.arange(len(centroids), dtype=np.int32), type=pa.int32()
            ),
            "centroid": pa.array(
                list(np.asarray(centroids, dtype=np.float64)),
                type=pa.list_(pa.float64()),
            ),
        }
    )
