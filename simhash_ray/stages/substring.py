"""Shared-substring duplicate detection (the north rule's
"suffix-array substring" dedup variant, in its scalable windowed form).

Exact suffix arrays over a distributed corpus are impractical; the
standard large-scale equivalent (cf. Lee et al., "Deduplicating
Training Data Makes Language Models Better", ACL 2022 — see PAPERS.md)
detects documents sharing long verbatim token runs via fixed-width
token windows: any common substring of ≥ (2·window−1) tokens is
guaranteed to contribute ≥ window shared windows, so thresholding on
shared-window count lower-bounds shared-substring length.

Pipeline: per-doc DISTINCT w-token windows → explode (window, doc) →
coarse-partition groupby on the window → per-window doc pairs →
second groupby counting distinct shared windows per pair → threshold.
Both shuffles use the vectorized run-detection pattern of stages/lsh.

Boilerplate guard: windows shared by more than ``max_df`` documents
(headers, license blurbs, templates) are EXCLUDED from pair counting —
this is part of the operator's defined semantics (cf. the too-common-
shingle filtering in the dedup literature), mirrored exactly by the
SQL oracle (queries.SQL_DOC_SUBSTRING_PAIRS filters on window document
frequency too), and every exclusion is counted and logged.  Windows at
or below ``max_df`` are counted exactly — no silent truncation.
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..functions.hashing import part_of_ints


# window hashing rides the vectorized flat shingle machinery (one
# token-hash pass + masked rolling fold + lexsort dedupe); rows
# shorter than the window contribute nothing ("drop"), matching the
# SQL oracle's `i <= len(t) - 7` bound.  Window identity is hash
# identity — same probabilistic-collision stance as before, now
# without building per-window Python strings.


def shared_substring_pairs(
    docs: rd.Dataset,
    window: int = 8,
    min_shared: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_parts: int = 64,
    max_df: int = 256,
) -> rd.Dataset:
    """(a, b, n_shared) for doc pairs sharing ≥ min_shared distinct
    w-token windows, counting only windows whose document frequency is
    ≤ ``max_df`` (a < b; counts are exact and SQL-oracle-matched under
    that definition — see module docstring's boilerplate guard)."""

    def explode(batch: pa.Table) -> pa.Table:
        from .minhash import _shingle_hashes_flat

        if not pa.types.is_integer(batch[id_col].type):
            raise ValueError(
                f"shared_substring_pairs requires integer {id_col!r} ids "
                f"(got {batch[id_col].type}); map string ids to int64 "
                "first — the pair table and its partition hash are "
                "int-keyed end-to-end"
            )
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        sh, rows, _ = _shingle_hashes_flat(
            batch[text_col], window, short_rows="drop"
        )
        wh = sh.view(np.int64)
        return pa.table(
            {
                "doc": pa.array(ids[rows], type=pa.int64()),
                "win": pa.array(wh, type=pa.int64()),
                "part": pa.array(part_of_ints(n_parts, wh), type=pa.int32()),
            }
        )

    def window_pairs(group: pa.Table) -> pa.Table:
        doc = group["doc"].to_numpy(zero_copy_only=False)
        win = group["win"].to_numpy(zero_copy_only=False)
        order = np.lexsort((doc, win))
        doc, win = doc[order], win[order]
        new_run = np.ones(len(win), dtype=bool)
        new_run[1:] = win[1:] != win[:-1]
        starts = np.flatnonzero(new_run)
        lengths = np.diff(np.append(starts, len(win)))
        a_i, b_i = [], []
        # boilerplate guard: a window's run length IS its global df
        # (the groupby partitions by window hash), so the df filter is
        # exact here; drops are counted and logged, never silent
        keep_sel = (lengths >= 2) & (lengths <= max_df)
        n_boiler = int(((lengths > max_df)).sum())
        if n_boiler:
            logging.getLogger(__name__).warning(
                "shared_substring_pairs: excluded %d boilerplate windows "
                "with df > %d from pair counting",
                n_boiler,
                max_df,
            )
        for g in np.unique(lengths[keep_sel]):
            runs = starts[keep_sel & (lengths == g)]
            i, j = np.triu_indices(int(g), 1)
            a_i.append((runs[:, None] + i[None, :]).ravel())
            b_i.append((runs[:, None] + j[None, :]).ravel())
        if not a_i:
            return pa.table(
                {
                    "a": pa.array([], type=pa.int64()),
                    "b": pa.array([], type=pa.int64()),
                    "part": pa.array([], type=pa.int32()),
                }
            )
        ai, bi = np.concatenate(a_i), np.concatenate(b_i)
        a, b = doc[ai], doc[bi]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pa.table(
            {
                "a": pa.array(lo, type=pa.int64()),
                "b": pa.array(hi, type=pa.int64()),
                "part": pa.array(part_of_ints(n_parts, lo, hi), type=pa.int32()),
            }
        )

    def count_pairs(group: pa.Table) -> pa.Table:
        df = (
            group.select(["a", "b"])
            .to_pandas()
            .groupby(["a", "b"], as_index=False)
            .size()
            .rename(columns={"size": "n_shared"})
        )
        df = df[df["n_shared"] >= min_shared]
        df["n_shared"] = df["n_shared"].astype(np.int64)
        return pa.Table.from_pandas(
            df,
            preserve_index=False,
            schema=pa.schema(
                [("a", pa.int64()), ("b", pa.int64()), ("n_shared", pa.int64())]
            ),
        )

    from .base import map_groups_typed

    exploded = docs.select_columns([id_col, text_col]).map_batches(
        explode, batch_format="pyarrow"
    )
    empty_pairs = pa.table(
        {
            "a": pa.array([], type=pa.int64()),
            "b": pa.array([], type=pa.int64()),
            "part": pa.array([], type=pa.int32()),
        }
    )
    empty_counts = pa.table(
        {
            "a": pa.array([], type=pa.int64()),
            "b": pa.array([], type=pa.int64()),
            "n_shared": pa.array([], type=pa.int64()),
        }
    )
    pairs = map_groups_typed(exploded, "part", window_pairs, empty_pairs)
    return map_groups_typed(pairs, "part", count_pairs, empty_counts)
