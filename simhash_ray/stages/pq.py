"""Product-quantization ANN (PQ) in the exact-integer domain.

PQ (Jégou, Douze & Schmid, TPAMI 2011, "Product Quantization for
Nearest Neighbor Search") splits each d-dim vector into ``m``
subvectors and replaces every subvector with the index of its nearest
centroid in a per-subspace codebook of ``ks`` entries: 64 float32 dims
(256 B) become ``m`` uint8 codes (8 B at m=8) — a 32× cut in the
storage/shuffle footprint of the corpus side of every similarity scan,
which is the budget that matters at 100-TB embedding scale.  Queries
stay unquantized ("asymmetric distance computation"): scoring a coded
vector needs only ``m`` lookups into a per-query (m × ks) table of
subspace dot products.

This implementation runs PQ **on top of the int8 quantization** from
:mod:`.quantize` so that every decision an oracle must replay is exact
integer arithmetic:

- vectors are int8-quantized by the pinned round-half-up rule (already
  bit-reproducible in SQL — the ``embed_quantize`` query);
- codebook centroids are INTEGER vectors (means rounded half-up to
  [-127, 127]);
- code assignment minimizes the exact integer L2 distance, ties broken
  toward the LOWEST code index (numpy argmin ≡ SQL
  ``ORDER BY dist, code``);
- ADC scores are ``(Σ_s q_sub·c[s,code_s]) · scale_q · scale_v`` — an
  exact-integer dot (≤ 64·127² ≈ 1e6 per lane-sum, exact in float64)
  times two float64 scales, the same tolerance-free trick as
  :func:`.quantize.quantized_topk`.

Only the codebooks (a tiny (m, ks, d/m) table) need staging for the
SQL oracle; codes and ranks are re-derived independently from the
embeddings view.

Scale notes: the fit trains on a deterministic md5-sampled subset
(standard PQ practice — codebooks are estimated, the CODES are exact
given the codebooks) collected once to the driver, bounded by
``sample_limit``; encode and search are pure streaming ``map_batches``
with the codebooks broadcast via ``ray.put`` once.  The corpus-side
table that actually scans at query time is (id, m bytes, scale) — the
float payload never re-enters the hot loop.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from .ann import _EMPTY_TOPK, _EMPTY_TOPK_PARTIAL, _fetch_queries, _merge_topk, _to_matrix
from .base import map_groups_typed
from .quantize import quantize_mat


def _assign_codes_int(sub: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """(n, dsub) int64 subvectors × (ks, dsub) int64 centroids → (n,)
    argmin-L2 codes, exact integer distances, first (= lowest) index on
    ties."""
    # ||x-c||² = ||x||² - 2x·c + ||c||²; ||x||² is constant per row
    d = -2 * (sub @ cents.T) + (cents * cents).sum(axis=1)[None, :]
    return np.argmin(d, axis=1).astype(np.int64)


def fit_pq_codebooks(
    vectors: rd.Dataset,
    m: int = 8,
    ks: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_limit: int = 65536,
    iters: int = 10,
) -> np.ndarray:
    """Deterministic per-subspace Lloyd over the int8-quantized sample
    → (m, ks, d/m) int64 codebooks with every centroid in [-127, 127].

    Sampling: rows whose ``md5(id)`` falls under ``sample_limit/count``
    (partition-invariant), capped at ``sample_limit`` and collected once
    — codebooks are an ESTIMATE by construction, so a bounded sample is
    the correct scale behavior (Jégou §V trains on a learning set).
    Seeding: the first ``ks`` distinct subvectors in id order.  Empty
    clusters keep their previous centroid.  Everything downstream of
    the returned codebooks is exact."""
    total = vectors.count()
    ds = vectors.select_columns([id_col, vec_col])
    if total > sample_limit:
        from .sample import hash_sample

        ds = hash_sample(ds, sample_limit, total, id_col=id_col).limit(sample_limit)
    rows = ds.take_all()
    if not rows:
        raise ValueError("cannot fit PQ codebooks on an empty vector table")
    rows.sort(key=lambda r: r[id_col])
    mat = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in rows])
    q, _ = quantize_mat(mat)
    q = q.astype(np.int64)
    n, d = q.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    books = np.empty((m, ks, dsub), dtype=np.int64)
    for s in range(m):
        sub = q[:, s * dsub : (s + 1) * dsub]
        uniq = np.unique(sub, axis=0)  # sorted lexicographically: deterministic
        if len(uniq) >= ks:
            cents = uniq[
                np.linspace(0, len(uniq) - 1, ks).round().astype(np.int64)
            ].copy()
        else:  # fewer distinct subvectors than codes: duplicates are
            # harmless — argmin ties resolve to the lowest code
            cents = uniq[np.arange(ks) % len(uniq)].copy()
        for _ in range(iters):
            codes = _assign_codes_int(sub, cents)
            nxt = cents.copy()
            for c in range(ks):
                members = sub[codes == c]
                if len(members):
                    nxt[c] = np.floor(members.mean(axis=0) + 0.5).astype(np.int64)
            if (nxt == cents).all():
                break
            cents = nxt
        books[s] = np.clip(cents, -127, 127)
    return books


def codebooks_table(books: np.ndarray) -> pa.Table:
    """(m, ks, dsub) → unpacked (sub, code, dim, val) rows for staging
    (dim is 0-based WITHIN the subspace; absolute dim = sub·dsub+dim)."""
    m, ks, dsub = books.shape
    sub, code, dim = np.meshgrid(
        np.arange(m), np.arange(ks), np.arange(dsub), indexing="ij"
    )
    return pa.table(
        {
            "sub": pa.array(sub.reshape(-1), type=pa.int32()),
            "code": pa.array(code.reshape(-1), type=pa.int32()),
            "dim": pa.array(dim.reshape(-1), type=pa.int32()),
            "val": pa.array(books.reshape(-1), type=pa.int64()),
        }
    )


def pq_encode(
    vectors: rd.Dataset,
    books: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> rd.Dataset:
    """(id, codes fixed_size_binary(m) uint8, scale float64) — the
    32×-smaller corpus representation.  Streaming; codebooks broadcast
    once."""
    m, ks, dsub = books.shape
    if ks > 256:
        raise ValueError("uint8 codes require ks <= 256")
    ref = ray.put(books)

    def enc(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table(
                {
                    id_col: pa.array([], type=pa.int64()),
                    "codes": pa.array([], type=pa.binary(m)),
                    "scale": pa.array([], type=pa.float64()),
                }
            )
        bks = ray.get(ref)
        q, scale = quantize_mat(_to_matrix(batch[vec_col]))
        q = q.astype(np.int64)
        codes = np.empty((n, m), dtype=np.uint8)
        for s in range(m):
            codes[:, s] = _assign_codes_int(
                q[:, s * dsub : (s + 1) * dsub], bks[s]
            ).astype(np.uint8)
        return pa.table(
            {
                id_col: batch[id_col].cast(pa.int64()),
                "codes": pa.Array.from_buffers(
                    pa.binary(m), n, [None, pa.py_buffer(codes.tobytes())]
                ),
                "scale": pa.array(scale, type=pa.float64()),
            }
        )

    return vectors.select_columns([id_col, vec_col]).map_batches(
        enc, batch_format="pyarrow"
    )


def pq_topk(
    vectors: rd.Dataset,
    query_ids: list[int],
    k: int = 5,
    m: int = 8,
    ks: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    books: np.ndarray | None = None,
    codes_ds: rd.Dataset | None = None,
) -> rd.Dataset:
    """(query_id, neighbor_id, rank) — PQ/ADC approximate top-k under
    the dequantized inner product (score desc, id asc; self excluded).

    Per query: ONE (m × ks) integer lookup table of subspace dots; per
    corpus row: m table lookups + a sum.  The corpus side is the coded
    table (m bytes + scale per row), so at scale the scan moves ~32×
    less data than the float path.  Pass precomputed ``books`` /
    ``codes_ds`` to reuse a fitted index across queries."""
    if books is None:
        books = fit_pq_codebooks(vectors, m=m, ks=ks, id_col=id_col, vec_col=vec_col)
    m, ks, dsub = books.shape
    if codes_ds is None:
        codes_ds = pq_encode(vectors, books, id_col, vec_col)
    q_ids, q_mat = _fetch_queries(vectors, query_ids, id_col, vec_col, normalize=False)
    qq, qs = quantize_mat(q_mat)
    qq = qq.astype(np.int64)
    # (n_q, m, ks) integer LUT: query-subvector · centroid
    lut = np.einsum("qsd,skd->qsk", qq.reshape(len(q_ids), m, dsub), books)
    ref = ray.put((q_ids, lut, qs))

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _EMPTY_TOPK_PARTIAL
        qi, qlut, qsc = ray.get(ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        col = batch["codes"].combine_chunks()
        codes = np.frombuffer(col.buffers()[1], dtype=np.uint8)
        off = col.offset * m
        codes = codes[off : off + batch.num_rows * m].reshape(-1, m).astype(np.int64)
        vs = batch["scale"].to_numpy(zero_copy_only=False)
        # dots[q, v] = Σ_s lut[q, s, codes[v, s]] — gather then sum
        dots = qlut[:, np.arange(m)[None, :], codes].sum(axis=2)
        scores = (dots.astype(np.float64) * qsc[:, None]) * vs[None, :]
        out_q, out_n, out_s = [], [], []
        kk = min(k + 1, scores.shape[1])
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

    partials = codes_ds.map_batches(partial, batch_format="pyarrow", batch_size=4096)
    return map_groups_typed(
        partials, "query_id", _merge_topk(k), _EMPTY_TOPK, batch_format="pandas"
    )
