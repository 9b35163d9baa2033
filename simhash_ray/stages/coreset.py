"""Coreset / diversity selection over an embedding column.

``kcenter_coreset`` is deterministic greedy k-center (farthest-point
traversal, Gonzalez '85 — the 2-approximation for the k-center cover):
start from the lowest id, then k−1 times select the row farthest (L2)
from the already-selected set, ties broken by lowest id.  This is the
classic "pick a maximally diverse subset" verb of data-selection
pipelines (seed sets for active learning / dataset distillation /
evaluation probes) — the geometric complement of SemDeDup's
remove-the-redundant direction.

Distributed shape: the row table is materialized once as the narrow
(id, embedding) projection; each of the k−1 rounds is ONE streaming
pass — the current center matrix rides a ``ray.put`` broadcast, each
block computes min-distance-to-centers with one vectorized cdist and
emits a single (md, id) partial, and the driver folds block winners.
Cost is O(k·n·d) distance work per round against the full center set
(k² total passes' worth) — simple and stateless; an incremental
variant would carry per-row min-dist state at the cost of
rematerializing n rows per round, a poor trade below very large k.

Oracle story: the selection is a chain of argmax decisions; the staged
selection table lets a DuckDB oracle verify the chain INDUCTIVELY —
step 0 re-derived from scratch, each step t re-derived as the argmax
of min ``list_distance`` to the staged centers with step < t (ties by
id), excluding already-selected ids — so every decision is recomputed
by a different engine.  Distances are float64 in both engines;
summation-order noise (~1e-16 relative) is far below fixture-scale
argmax gaps (the same tolerance argument as the k-means staged
oracle)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd


def _emb_matrix(col: pa.ChunkedArray | pa.Array, n: int) -> np.ndarray:
    from .ann import _to_matrix  # the audited list/tensor-ext adapter

    return _to_matrix(col).reshape(n, -1)


def kcenter_coreset(
    vecs: rd.Dataset,
    k: int,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> pa.Table:
    """(step, id) table of the k greedy-k-center selections (see
    module doc).  ``k`` must be ≥ 1 and ≤ the row count."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    narrow = vecs.select_columns([id_col, emb_col]).materialize()
    n = narrow.count()
    if k > n:
        raise ValueError(f"k={k} exceeds the {n}-row input")

    from ray.data.aggregate import Min as AggMin

    first = int(narrow.aggregate(AggMin(id_col))[f"min({id_col})"])
    order_ids = [first]  # selection order (the output)

    for _t in range(1, k):
        sorted_ids = sorted(order_ids)  # searchsorted precondition
        centers = _collect_centers(narrow, sorted_ids, id_col, emb_col)
        cref = ray.put((np.asarray(sorted_ids, dtype=np.int64), centers))

        def winner(batch: pa.Table) -> pa.Table:
            empty = pa.table(
                {"md": pa.array([], type=pa.float64()),
                 "id": pa.array([], type=pa.int64())}
            )
            if batch.num_rows == 0:
                return empty
            sids, cmat = ray.get(cref)
            ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            emb = _emb_matrix(batch[emb_col], batch.num_rows)
            # ||x-c|| via the expanded form: one matmul per block
            d2 = (
                (emb * emb).sum(axis=1)[:, None]
                - 2.0 * emb @ cmat.T
                + (cmat * cmat).sum(axis=1)[None, :]
            )
            md = np.sqrt(np.maximum(d2, 0.0)).min(axis=1)
            pos = np.searchsorted(sids, ids)
            pos_c = np.clip(pos, 0, len(sids) - 1)
            unselected = sids[pos_c] != ids
            if not unselected.any():
                return empty
            md, ids = md[unselected], ids[unselected]
            order = np.lexsort((ids, -md))  # max md, ties lowest id
            w = order[0]
            return pa.table(
                {"md": pa.array([md[w]], type=pa.float64()),
                 "id": pa.array([ids[w]], type=pa.int64())}
            )

        parts = narrow.map_batches(winner, batch_format="pyarrow").to_pandas()
        if parts.empty:
            raise RuntimeError("kcenter_coreset: no unselected rows left")
        order = np.lexsort(
            (parts["id"].to_numpy(), -parts["md"].to_numpy())
        )
        order_ids.append(int(parts["id"].to_numpy()[order[0]]))

    return pa.table(
        {
            "step": pa.array(np.arange(k), type=pa.int64()),
            id_col: pa.array(np.asarray(order_ids, dtype=np.int64)),
        }
    )


def _collect_centers(
    narrow: rd.Dataset, sel_ids: list, id_col: str, emb_col: str
) -> np.ndarray:
    sset = np.asarray(sorted(sel_ids), dtype=np.int64)
    sref = ray.put(sset)

    def pick(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ss = ray.get(sref)
        pos = np.clip(np.searchsorted(ss, ids), 0, len(ss) - 1)
        return batch.filter(pa.array(ss[pos] == ids))

    rows = narrow.map_batches(pick, batch_format="pyarrow").to_pandas()
    rows = rows.sort_values(id_col)
    mat = np.stack(
        [np.asarray(e, dtype=np.float64) for e in rows[emb_col]]
    )
    return mat
