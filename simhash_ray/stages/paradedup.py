"""Paragraph-level exact dedup: explode → global keep-first → rebuild.

The classic within-corpus boilerplate remover (Dolma / RefinedWeb style
"exact paragraph dedup"): cut every document into units (paragraphs on
a separator, or fixed token windows when the corpus has no separator
structure), drop every unit whose exact text already occurred earlier
in the corpus — "earlier" = smaller ``(doc_id, unit_idx)`` — and
reassemble each document from its surviving units in order.  Documents
that lose every unit survive as empty text (the downstream length
filter drops them), so the output has exactly one row per input doc.

Reference analogue: the reference dedups nothing — this is a §2.5
training-data addition.  Unit semantics follow the published web-corpus
curation recipe (exact-match paragraph dedup before fuzzy dedup).

Scale design (the 100-TB story):

- **explode** is a pure streaming ``map_batches`` (reuses the audited
  chunking kernel from stages/packing.py or a vectorized
  ``split_pattern`` — no Python row loop).
- **keep-first** is ONE coarse-partition shuffle keyed on a hash of the
  unit text (same pattern as stages/collapse.py).  A per-batch
  combiner first collapses each block's own repeats to the block
  minimum, so a boilerplate unit repeated billions of times crosses
  the shuffle at most once per block — hot keys are bounded by block
  count, not row count (the skew shield).
- **reassemble** is one more coarse shuffle keyed on ``doc_id``; a
  sentinel row per document (unit_idx = −1) guarantees every doc
  appears in the output without any sparse-side join (Ray 2.49's hash
  join misbehaves when one side has empty partitions).  Inside a
  partition everything is run-detection + one ``pc.binary_join`` —
  per-partition vectorized, never per-group Python.

Unit strings move through each shuffle exactly once; all decisions are
content-deterministic, so results are independent of block layout and
cluster size.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..functions.hashing import part_of_strings
from .base import map_groups_typed


def _as_array(col) -> pa.Array:
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def _keep_first_kernel(
    t: pa.Table, id_col: str, ord_col: str, unit_col: str
) -> pa.Table:
    """Keep, per distinct unit text, the row with the smallest
    ``(id, ord)``, carrying the summed occurrence count in ``cnt``
    (input rows without a ``cnt`` column count 1 each — so folding
    pre-combined blocks preserves global multiplicity).  Vectorized:
    dictionary-encode the unit column (C-speed string hashing),
    lexsort rows by (id, ord), and take the first occurrence of each
    code in that order (``np.unique``'s return_index is exactly
    first-occurrence)."""
    if t.num_rows == 0:
        if "cnt" not in t.column_names:
            t = t.append_column("cnt", pa.array([], type=pa.int64()))
        return t
    codes = (
        _as_array(t[unit_col]).dictionary_encode().indices.to_numpy(
            zero_copy_only=False
        )
    )
    ids = t[id_col].to_numpy(zero_copy_only=False)
    ords = t[ord_col].to_numpy(zero_copy_only=False)
    if "cnt" in t.column_names:
        cnt_in = t["cnt"].to_numpy(zero_copy_only=False)
        t = t.drop_columns(["cnt"])
    else:
        cnt_in = np.ones(len(ids), dtype=np.int64)
    sums = np.bincount(codes, weights=cnt_in).astype(np.int64)
    order = np.lexsort((ords, ids))
    # np.unique returns sorted unique codes + first-occurrence index,
    # elementwise aligned — so sums[u] is each kept row's multiplicity
    u, first = np.unique(codes[order], return_index=True)
    keep_order = np.argsort(order[first])  # restore original row order
    kept = t.take(pa.array(order[first][keep_order]))
    return kept.append_column("cnt", pa.array(sums[u][keep_order]))


def dedup_units_keep_first(
    units: rd.Dataset,
    id_col: str = "doc_id",
    ord_col: str = "chunk_idx",
    unit_col: str = "chunk_text",
    n_parts: int = 64,
    keep: str = "first",
) -> rd.Dataset:
    """Global dedup over exploded units.  ``keep="first"`` (RefinedWeb
    /Dolma rule): a unit row survives iff its ``(id, ord)`` is the
    corpus minimum among rows with identical unit text.
    ``keep="none"`` (conservative boilerplate rule): a unit survives
    only if its text occurs exactly once in the whole corpus — repeats
    are dropped EVERYWHERE, first occurrence included.  Output: the
    (id, ord, unit) projection, one row per surviving occurrence.

    One groupby shuffle on a hash partition of the unit text; the
    per-batch combiner bounds any hot unit to one row per input block
    before the shuffle (it carries a ``cnt`` partial so ``keep="none"``
    still sees exact global multiplicity).
    """
    if keep not in ("first", "none"):
        raise ValueError(f"keep must be 'first' or 'none', got {keep!r}")
    cols = [id_col, ord_col, unit_col]

    def prep(batch: pa.Table) -> pa.Table:
        batch = _keep_first_kernel(
            batch.select(cols), id_col, ord_col, unit_col
        )
        part = part_of_strings(
            batch[unit_col].to_numpy(zero_copy_only=False), n_parts
        )
        return batch.append_column("part", pa.array(part, type=pa.int32()))

    empty = pa.table(
        {
            id_col: pa.array([], type=pa.int64()),
            ord_col: pa.array([], type=pa.int64()),
            unit_col: pa.array([], type=pa.string()),
        }
    )

    def group_fn(g: pa.Table) -> pa.Table:
        out = _keep_first_kernel(
            g.drop_columns(["part"]), id_col, ord_col, unit_col
        )
        if keep == "none":
            out = out.filter(pc.equal(out["cnt"], pa.scalar(1)))
        return out.drop_columns(["cnt"])

    keyed = units.map_batches(prep, batch_format="pyarrow")
    return map_groups_typed(keyed, "part", group_fn, empty)


def reassemble_docs(
    survivors: rd.Dataset,
    doc_ids: rd.Dataset,
    id_col: str = "doc_id",
    ord_col: str = "chunk_idx",
    unit_col: str = "chunk_text",
    sep: str = " ",
    n_parts: int = 64,
) -> rd.Dataset:
    """Rebuild one row per document from its surviving units, joined
    by ``sep`` in ascending ``ord`` order.  ``doc_ids`` (one narrow
    ``id_col`` column, duplicates allowed — they are collapsed) pins
    the output domain: docs with zero surviving units emit
    ``text=''``/``n_kept=0`` via a sentinel row, not a sparse join.

    Output: (id, text, n_kept).
    """

    def sentinel(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].cast(pa.int64())
        n = len(ids)
        return pa.table(
            {
                id_col: ids,
                ord_col: pa.array(np.full(n, -1, dtype=np.int64)),
                unit_col: pa.array([""] * n, type=pa.string()),
            }
        )

    sent = doc_ids.map_batches(sentinel, batch_format="pyarrow")
    allrows = survivors.select_columns([id_col, ord_col, unit_col]).union(sent)

    def add_part(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        part = (ids % n_parts).astype(np.int32)
        return batch.append_column("part", pa.array(part))

    empty = pa.table(
        {
            id_col: pa.array([], type=pa.int64()),
            "text": pa.array([], type=pa.string()),
            "n_kept": pa.array([], type=pa.int64()),
        }
    )

    def rebuild(g: pa.Table) -> pa.Table:
        ids = g[id_col].to_numpy(zero_copy_only=False)
        ords = g[ord_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ords, ids))
        ids_s, ords_s = ids[order], ords[order]
        new_run = np.ones(len(ids_s), dtype=bool)
        new_run[1:] = ids_s[1:] != ids_s[:-1]
        run_id = np.cumsum(new_run) - 1
        n_runs = int(run_id[-1]) + 1
        mask = ords_s >= 0  # drop sentinels (and collapsed dup sentinels)
        n_kept = np.bincount(run_id[mask], minlength=n_runs)
        offsets = np.concatenate([[0], np.cumsum(n_kept)]).astype(np.int32)
        units_sorted = _as_array(g[unit_col]).take(pa.array(order))
        kept_units = units_sorted.filter(pa.array(mask))
        lists = pa.ListArray.from_arrays(pa.array(offsets), kept_units)
        return pa.table(
            {
                id_col: pa.array(ids_s[new_run], type=pa.int64()),
                "text": pc.binary_join(lists, sep),
                "n_kept": pa.array(n_kept.astype(np.int64)),
            }
        )

    keyed = allrows.map_batches(add_part, batch_format="pyarrow")
    return map_groups_typed(keyed, "part", rebuild, empty)


def explode_separator(
    ds: rd.Dataset,
    sep: str = "\n",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> rd.Dataset:
    """Explode each row's text on a literal separator into
    (id, chunk_idx, chunk_text) unit rows — the natural-paragraph
    explode for corpora that have separator structure.  Empty texts
    emit one empty unit (SQL ``string_split`` semantics: splitting
    ``''`` yields ``['']``).  Fully vectorized via Arrow split/flatten.
    """
    empty = pa.table(
        {
            id_col: pa.array([], type=pa.int64()),
            "chunk_idx": pa.array([], type=pa.int64()),
            "chunk_text": pa.array([], type=pa.string()),
        }
    )

    def fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty
        # null-safe: null text behaves as '' (one empty unit), matching
        # SQL COALESCE(text, '') split semantics
        text = pc.fill_null(_as_array(batch[text_col]), "")
        lists = pc.split_pattern(text, sep)
        flat = pc.list_flatten(lists)
        counts = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
        row_rep = np.repeat(np.arange(len(counts)), counts)
        starts = np.cumsum(counts) - counts
        ords = np.arange(len(flat)) - starts[row_rep]
        ids = batch[id_col].to_numpy(zero_copy_only=False)[row_rep]
        return pa.table(
            {
                id_col: pa.array(ids, type=pa.int64()),
                "chunk_idx": pa.array(ords.astype(np.int64)),
                "chunk_text": flat,
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def paragraph_dedup(
    docs: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str | None = None,
    window: int | None = None,
    n_parts: int = 64,
    keep: str = "first",
) -> rd.Dataset:
    """End-to-end paragraph dedup over (id, text) documents.

    Exactly one of ``sep`` (natural paragraphs, rejoined with the same
    separator) or ``window`` (fixed token windows, rejoined with a
    single space — for corpora without separator structure) selects
    the unit policy; ``keep`` selects the dedup rule (``"first"`` =
    keep first occurrence, ``"none"`` = drop every repeated unit
    everywhere).  Output: (id, text, n_kept), one row per input
    document, text = surviving units in original order.
    """
    if (sep is None) == (window is None):
        raise ValueError("pass exactly one of sep= or window=")
    if sep is not None:
        units = explode_separator(docs, sep, id_col, text_col)
        join_sep = sep
    else:
        from .packing import chunk_tokens

        units = chunk_tokens(docs, window, id_col, text_col)
        join_sep = " "
    survivors = dedup_units_keep_first(
        units, id_col, "chunk_idx", "chunk_text", n_parts, keep
    )
    ids = docs.select_columns([id_col])
    return reassemble_docs(
        survivors, ids, id_col, "chunk_idx", "chunk_text", join_sep, n_parts
    )


def within_doc_dedup(
    docs: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str | None = None,
    window: int | None = None,
) -> rd.Dataset:
    """WITHIN-document repeated-unit removal (the RefinedWeb /
    Dolma-style "drop duplicated lines inside each document" pass):
    a unit that already occurred EARLIER IN THE SAME DOCUMENT is
    dropped; the document is rebuilt from its surviving units in order.
    Cross-document repeats are untouched — that's
    :func:`paragraph_dedup`'s job.

    Because the decision is local to a row, this is ONE streaming
    ``map_batches`` — no shuffle at any scale (contrast the corpus-wide
    variant's two coarse shuffles).  Unit policy mirrors
    :func:`paragraph_dedup`: ``sep`` splits on a literal separator
    (rejoined with it), ``window`` uses fixed token windows (rejoined
    with a single space).  Dedup compares exact unit STRINGS (pandas
    hash-table ``duplicated`` — no hash-collision exposure).

    Output: (id, text, n_kept, n_dropped), one row per input document.
    """
    if (sep is None) == (window is None):
        raise ValueError("pass exactly one of sep= or window=")
    join_sep = sep if sep is not None else " "

    def empty() -> pa.Table:
        return pa.table(
            {
                id_col: pa.array([], type=pa.int64()),
                "text": pa.array([], type=pa.string()),
                "n_kept": pa.array([], type=pa.int64()),
                "n_dropped": pa.array([], type=pa.int64()),
            }
        )

    def fn(batch: pa.Table) -> pa.Table:
        import pandas as pd

        n = batch.num_rows
        if n == 0:
            return empty()
        if sep is not None:
            text = pc.fill_null(_as_array(batch[text_col]), "")
            lists = pc.split_pattern(text, sep)
            flat = pc.list_flatten(lists)
            counts = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
            row_rep = np.repeat(np.arange(n), counts)
        else:
            from ..functions.tokenize import tokens_flat
            from .packing import chunk_arrays

            ft = tokens_flat(batch[text_col], lower=False)
            if len(ft.flat) == 0:
                ids = batch[id_col].cast(pa.int64())
                zero = pa.array(np.zeros(n, dtype=np.int64))
                return pa.table(
                    {
                        id_col: ids,
                        "text": pa.array([""] * n, type=pa.string()),
                        "n_kept": zero,
                        "n_dropped": zero,
                    }
                )
            row_rep, _, _, flat = chunk_arrays(ft, window)
        # exact-string keep-first within each row (value hash table, C)
        keep = ~pd.DataFrame(
            {"r": row_rep, "t": flat.to_pandas()}
        ).duplicated().to_numpy()
        kept_counts = np.bincount(row_rep[keep], minlength=n)
        all_counts = np.bincount(row_rep, minlength=n)
        offsets = np.append(0, np.cumsum(kept_counts)).astype(np.int32)
        joined = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(offsets), flat.filter(pa.array(keep))),
            join_sep,
        )
        return pa.table(
            {
                id_col: batch[id_col].cast(pa.int64()),
                "text": joined,
                "n_kept": pa.array(kept_counts.astype(np.int64)),
                "n_dropped": pa.array((all_counts - kept_counts).astype(np.int64)),
            }
        )

    return docs.select_columns([id_col, text_col]).map_batches(
        fn, batch_format="pyarrow"
    )
