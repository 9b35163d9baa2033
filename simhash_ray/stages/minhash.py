"""MinHash + LSH near-duplicate detection for text corpora.

Scale path for n-gram-Jaccard dedup: word-shingle → 64-perm MinHash →
band buckets → candidate pairs → Jaccard-estimate verify.  Same
coarse-partition shuffle pattern as stages/lsh.py (one groupby, numpy
run processing inside partitions).

The exact counterpart (``all_pairs_jaccard``) is a broadcast
all-pairs operator used as the correctness oracle at validation scale;
MinHash recall against it is tested on planted paraphrase fixtures.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..functions.hashing import part_of_ints

_MIX = np.uint64(0x9E3779B97F4A7C15)


def _shingle_hashes(texts: pa.ChunkedArray | pa.Array, k: int) -> list[np.ndarray]:
    """Per row: u64 hashes of the distinct word k-gram shingles."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    toks = pc.utf8_split_whitespace(pc.utf8_lower(texts.cast(pa.string())))
    out = []
    for row in toks.to_pylist():
        row = [t for t in (row or []) if t]
        if len(row) == 0:
            out.append(np.empty(0, dtype=np.uint64))
            continue
        kk = min(k, len(row))
        th = pd.util.hash_array(np.array(row, dtype=object))
        acc = np.full(len(th) - kk + 1, np.uint64(0x5851F42D4C957F2D), dtype=np.uint64)
        for j in range(kk):
            acc = (acc ^ th[j : j + len(acc)]) * _MIX
        acc ^= acc >> np.uint64(31)
        out.append(np.unique(acc))
    return out


def _minhash_sig(shingles: np.ndarray, n_perm: int, seeds: np.ndarray) -> np.ndarray:
    """64-bit universal-hash permutations: h_i(x) = splitmix(x ^ seed_i)."""
    if len(shingles) == 0:
        return np.full(n_perm, np.uint64(0xFFFFFFFFFFFFFFFF), dtype=np.uint64)
    z = shingles[None, :] ^ seeds[:, None]  # (n_perm, n_shingles)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    z ^= z >> np.uint64(31)
    return z.min(axis=1)


class MinHashEncoder:
    """Actor stage: adds band-key columns from a MinHash signature."""

    def __init__(
        self,
        text_col: str = "text",
        id_col: str = "doc_id",
        shingle_k: int = 2,
        n_perm: int = 64,
        n_bands: int = 16,
        seed: int = 7_2025,
        n_parts: int = 64,
    ):
        assert n_perm % n_bands == 0
        self.text_col, self.id_col = text_col, id_col
        self.shingle_k, self.n_perm, self.n_bands = shingle_k, n_perm, n_bands
        self.rows_per_band = n_perm // n_bands
        rng = np.random.default_rng(seed)
        self.seeds = rng.integers(0, 2**63, n_perm, dtype=np.uint64)
        self.n_parts = n_parts

    def __call__(self, batch: pa.Table) -> pa.Table:
        shingles = _shingle_hashes(batch[self.text_col], self.shingle_k)
        sigs = np.stack(
            [_minhash_sig(s, self.n_perm, self.seeds) for s in shingles]
        )  # (n, n_perm)
        n = len(sigs)
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        # fold each band's rows into one u64 key
        out_id, out_band, out_key, out_sig = [], [], [], []
        sig_bin = [s.tobytes() for s in sigs]  # full sig bytes for verify
        for b in range(self.n_bands):
            seg = sigs[:, b * self.rows_per_band : (b + 1) * self.rows_per_band]
            key = np.zeros(n, dtype=np.uint64)
            for j in range(self.rows_per_band):
                key = (key ^ seg[:, j]) * _MIX
            key ^= key >> np.uint64(31)
            out_id.append(ids)
            out_band.append(np.full(n, b, dtype=np.int32))
            out_key.append(key.view(np.int64))
            out_sig.extend(sig_bin)
        band = np.concatenate(out_band)
        key = np.concatenate(out_key)
        part = part_of_ints(self.n_parts, band.astype(np.int64), key)
        return pa.table(
            {
                "id": pa.array(np.concatenate(out_id)),
                "band": pa.array(band, type=pa.int32()),
                "key": pa.array(key, type=pa.int64()),
                "sig": pa.array(out_sig, type=pa.large_binary()),
                "part": pa.array(part, type=pa.int32()),
            }
        )


def _pairgen(group: pa.Table) -> pa.Table:
    ids = np.asarray(group["id"].to_numpy(zero_copy_only=False))
    band = group["band"].to_numpy(zero_copy_only=False)
    key = group["key"].to_numpy(zero_copy_only=False)
    sig = np.asarray(group["sig"].to_numpy(zero_copy_only=False), dtype=object)
    order = np.lexsort((ids, key, band))
    ids, band, key, sig = ids[order], band[order], key[order], sig[order]
    n = len(ids)
    new_run = np.ones(n, dtype=bool)
    new_run[1:] = (band[1:] != band[:-1]) | (key[1:] != key[:-1])
    starts = np.flatnonzero(new_run)
    lengths = np.diff(np.append(starts, n))
    a_i, b_i = [], []
    capped = np.minimum(lengths, 512)
    for g in np.unique(capped[lengths >= 2]):  # vectorized per distinct length
        runs = starts[(capped == g) & (lengths >= 2)]
        i, j = np.triu_indices(int(g), 1)
        a_i.append((runs[:, None] + i[None, :]).ravel())
        b_i.append((runs[:, None] + j[None, :]).ravel())
    if not a_i:
        return pa.table(
            {
                "a": pa.array([], type=pa.int64()),
                "b": pa.array([], type=pa.int64()),
                "sig_a": pa.array([], type=pa.large_binary()),
                "sig_b": pa.array([], type=pa.large_binary()),
            }
        )
    ai, bi = np.concatenate(a_i), np.concatenate(b_i)
    a, b = ids[ai], ids[bi]
    swap = a > b
    a2 = np.where(swap, b, a)
    b2 = np.where(swap, a, b)
    sa = np.where(swap, sig[bi], sig[ai])
    sb = np.where(swap, sig[ai], sig[bi])
    return pa.table(
        {
            "a": pa.array(a2, type=pa.int64()),
            "b": pa.array(b2, type=pa.int64()),
            "sig_a": pa.array(list(sa), type=pa.large_binary()),
            "sig_b": pa.array(list(sb), type=pa.large_binary()),
        }
    )


def make_minhash_verifier(theta: float, n_perm: int = 64):
    """Estimated Jaccard = fraction of matching permutation minima."""

    def verify(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "a": pa.array([], type=pa.int64()),
                    "b": pa.array([], type=pa.int64()),
                    "est_jaccard": pa.array([], type=pa.float64()),
                }
            )
        sa = np.stack(
            [np.frombuffer(x, dtype=np.uint64) for x in batch["sig_a"].to_pylist()]
        )
        sb = np.stack(
            [np.frombuffer(x, dtype=np.uint64) for x in batch["sig_b"].to_pylist()]
        )
        est = (sa == sb).mean(axis=1)
        keep = est >= theta
        df = pd.DataFrame(
            {
                "a": batch["a"].to_numpy(zero_copy_only=False)[keep],
                "b": batch["b"].to_numpy(zero_copy_only=False)[keep],
                "est_jaccard": est[keep],
            }
        ).drop_duplicates(["a", "b"])
        return pa.Table.from_pandas(df, preserve_index=False)

    return verify


def minhash_dup_pairs(
    docs: rd.Dataset,
    theta: float = 0.7,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 2,
    concurrency=(1, 8),
    n_parts: int = 64,
) -> rd.Dataset:
    """(a, b, est_jaccard) candidate-verified near-dup pairs."""
    enc = docs.select_columns([id_col, text_col]).map_batches(
        MinHashEncoder,
        fn_constructor_kwargs={
            "text_col": text_col,
            "id_col": id_col,
            "shingle_k": shingle_k,
            "n_parts": n_parts,
        },
        batch_format="pyarrow",
        batch_size=2048,
        concurrency=concurrency,
    )
    pairs = enc.groupby("part").map_groups(_pairgen, batch_format="pyarrow")
    return pairs.map_batches(
        make_minhash_verifier(theta), batch_format="pyarrow"
    )


def all_pairs_jaccard(
    docs: rd.Dataset,
    theta_num: int,
    theta_den: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 2,
    use_token_sets: bool = False,
) -> rd.Dataset:
    """EXACT all-pairs shingle-Jaccard ≥ θ via a broadcast small side.

    Returns (a, b, inter, uni) with integer intersection/union sizes,
    thresholded as the exact rational ``inter/uni >= theta_num/theta_den``
    via integer cross-multiplication (bit-exact vs a SQL oracle — a
    float θ literal would disagree with SQL on boundary pairs).  The full shingle-set table is broadcast via
    ``ray.put`` once and compared per batch — valid while the corpus
    fits a worker heap (validation/oracle scale); the scalable
    counterpart is :func:`minhash_dup_pairs`.
    """

    def row_sets(batch: pa.Table) -> list[tuple[int, np.ndarray]]:
        ids = batch[id_col].to_pylist()
        if use_token_sets:
            toks = pc.utf8_split_whitespace(
                pc.utf8_lower(batch[text_col].combine_chunks().cast(pa.string()))
            ).to_pylist()
            sets = [
                np.unique(pd.util.hash_array(np.array(sorted({t for t in (r or []) if t}), dtype=object)))
                if r
                else np.empty(0, dtype=np.uint64)
                for r in toks
            ]
        else:
            sets = _shingle_hashes(batch[text_col], shingle_k)
        return list(zip(ids, sets))

    # Build the broadcast universe: dense binary matrix over the corpus's
    # distinct shingle hashes (streamed once on the driver, ray.put once).
    all_sets: list[tuple[int, np.ndarray]] = []
    for batch in docs.select_columns([id_col, text_col]).iter_batches(
        batch_size=4096, batch_format="pyarrow"
    ):
        all_sets.extend(row_sets(batch))
    all_sets.sort(key=lambda t: t[0])
    vocab: dict[int, int] = {}
    for _, s in all_sets:
        for v in s:
            vocab.setdefault(int(v), len(vocab))
    uni_ids = np.array([i for i, _ in all_sets], dtype=np.int64)
    mat = np.zeros((len(all_sets), len(vocab)), dtype=np.int8)
    for r, (_, s) in enumerate(all_sets):
        mat[r, [vocab[int(v)] for v in s]] = 1
    sizes = mat.sum(axis=1).astype(np.int64)
    ref = ray.put((uni_ids, mat, sizes, vocab))

    def compare(batch: pa.Table) -> pa.Table:
        uids, umat, usizes, uvocab = ray.get(ref)
        mine = row_sets(batch)
        my_ids = np.array([i for i, _ in mine], dtype=np.int64)
        my_mat = np.zeros((len(mine), umat.shape[1]), dtype=np.int8)
        for r, (_, s) in enumerate(mine):
            cols = [uvocab[int(v)] for v in s if int(v) in uvocab]
            my_mat[r, cols] = 1
        inter = my_mat.astype(np.int32) @ umat.astype(np.int32).T  # (B, N)
        my_sizes = my_mat.sum(axis=1).astype(np.int64)
        uni = my_sizes[:, None] + usizes[None, :] - inter
        keep = (
            (uni > 0)
            & (inter.astype(np.int64) * theta_den >= theta_num * uni)
            & (my_ids[:, None] < uids[None, :])
        )
        bi, ui = np.nonzero(keep)
        return pa.table(
            {
                "a": pa.array(my_ids[bi], type=pa.int64()),
                "b": pa.array(uids[ui], type=pa.int64()),
                "inter": pa.array(inter[bi, ui].astype(np.int64), type=pa.int64()),
                "uni": pa.array(uni[bi, ui].astype(np.int64), type=pa.int64()),
            }
        )

    return docs.select_columns([id_col, text_col]).map_batches(
        compare, batch_format="pyarrow", batch_size=1024
    )
