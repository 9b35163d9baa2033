"""Int8 embedding quantization + quantized similarity search.

At 100-TB scale the embedding table's float32 payload dominates the
object-store and network budget of every ANN / semantic-dedup stage; a
per-vector symmetric int8 quantization cuts that 4× (64-dim float32 =
256 B → 64 B + one float64 scale) at a bounded precision cost.  This
module provides the quantizer and a quantized brute-force top-k whose
scores are EXACTLY reproducible by a SQL oracle:

- quantization is deterministic "round half up":
  ``scale = max|x| / 127`` per vector, ``q_i = floor(x_i/scale + 0.5)``
  in float64 — both numpy and DuckDB evaluate the identical IEEE
  expression, so the quantized vectors match bit-for-bit (pinned by
  the ``embed_quantize`` driver query).  A zero vector quantizes to
  zeros with scale 0.
- quantized dot products are EXACT integers (64 dims × 127² ≈ 1.03e6
  fits float64 exactly, any summation order), so the dequantized score
  ``(dot · scale_a) · scale_b`` is bit-identical across engines and
  the rank order needs no float tolerance.

Scale notes: the quantizer is a pure streaming ``map_batches`` (one
vectorized pass, no shuffle).  ``quantized_topk`` mirrors
:func:`..stages.ann.brute_force_topk`'s broadcast + per-batch partial
top-k shape — the int32 matmul here stands in for the int8 GEMM kernel
a real deployment would use; the 4× win in this design is in storage
and shuffle width, which is what the operator moves.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from .ann import (
    _EMPTY_TOPK,
    _EMPTY_TOPK_PARTIAL,
    _fetch_queries,
    _merge_topk,
    _to_matrix,
)
from .base import map_groups_typed


def quantize_mat(mat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(n, d) float64 → (int8 quantized (n, d), float64 scales (n,)).

    ``q = floor(x/scale + 0.5)`` with ``scale = max|x|/127``; values
    land in [-127, 127] (the extreme |x| maps to ±127 exactly, and the
    1-ulp division error cannot reach the next half-integer).  Zero
    vectors → zeros, scale 0.
    """
    mat = np.asarray(mat, dtype=np.float64)
    scale = np.abs(mat).max(axis=1) / 127.0 if mat.size else np.zeros(len(mat))
    safe = np.where(scale == 0.0, 1.0, scale)
    q = np.floor(mat / safe[:, None] + 0.5)
    q[scale == 0.0] = 0.0
    return q.astype(np.int8), scale


def quantize_int8(
    ds: rd.Dataset,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> rd.Dataset:
    """Streaming per-vector int8 quantization: (id, qvec list<int8>,
    scale float64)."""

    def _q(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table(
                {
                    id_col: pa.array([], type=pa.int64()),
                    "qvec": pa.array([], type=pa.list_(pa.int8())),
                    "scale": pa.array([], type=pa.float64()),
                }
            )
        mat = _to_matrix(batch[vec_col])
        q, scale = quantize_mat(mat)
        d = q.shape[1]
        lists = pa.ListArray.from_arrays(
            pa.array(np.arange(n + 1, dtype=np.int32) * d),
            pa.array(q.reshape(-1), type=pa.int8()),
        )
        return pa.table(
            {
                id_col: batch[id_col],
                "qvec": lists,
                "scale": pa.array(scale, type=pa.float64()),
            }
        )

    return ds.select_columns([id_col, vec_col]).map_batches(
        _q, batch_format="pyarrow"
    )


def quantized_topk(
    vectors: rd.Dataset,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> rd.Dataset:
    """(query_id, neighbor_id, rank) — top-k by DEQUANTIZED int8 dot
    product ``(q_a · q_b) · scale_a · scale_b`` (score desc, id asc).

    Same broadcast + per-batch partial top-k shape as
    ``brute_force_topk``; scores are exact integers times two scales,
    so a DuckDB oracle over the same quantization reproduces the
    ranking bit-for-bit with no float tolerance.
    """
    q_ids, q_mat = _fetch_queries(
        vectors, query_ids, id_col, vec_col, normalize=False
    )
    qq, qs = quantize_mat(q_mat)
    ref = ray.put((q_ids, qq.astype(np.int32), qs))

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _EMPTY_TOPK_PARTIAL
        qi, qm, qsc = ray.get(ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        bq, bs = quantize_mat(_to_matrix(batch[vec_col]))
        dots = (qm @ bq.astype(np.int32).T).astype(np.float64)
        scores = (dots * qsc[:, None]) * bs[None, :]
        out_q, out_n, out_s = [], [], []
        kk = min(k + 1, scores.shape[1])  # +1: the query itself may be here
        for row in range(len(qi)):
            top = np.lexsort((ids, -scores[row]))[:kk]
            out_q.append(np.full(len(top), qi[row], dtype=np.int64))
            out_n.append(ids[top])
            out_s.append(scores[row][top])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), type=pa.int64()),
                "neighbor_id": pa.array(np.concatenate(out_n), type=pa.int64()),
                "score": pa.array(np.concatenate(out_s), type=pa.float64()),
            }
        )

    partials = vectors.select_columns([id_col, vec_col]).map_batches(
        partial, batch_format="pyarrow", batch_size=4096
    )

    return map_groups_typed(
        partials, "query_id", _merge_topk(k), _EMPTY_TOPK, batch_format="pandas"
    )
