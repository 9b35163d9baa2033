"""Corpus snapshot diff — the recrawl-delta classifier.

A periodically refreshed web corpus needs, per refresh, the exact
delta between the committed snapshot and the new crawl: which ids were
``added``, ``removed``, ``changed`` (same id, different content) or
``unchanged``.  Downstream, only added+changed rows re-enter the
expensive pipeline (encode → dedup → curate), so the diff itself must
not touch payloads: both sides are reduced to a narrow
(id, content-fingerprint, side) projection and the classification is
ONE coarse-partition shuffle of those ~50-byte rows — the texts/bytes
never move.  Fingerprint = md5 hex of the text (stages/text.py's
``md5_fingerprint_batch``, DuckDB-matchable), so a SQL oracle checks
the whole operator with a FULL OUTER JOIN.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from .base import map_groups_typed
from .text import md5_fingerprint_batch

_EMPTY_DIFF = pa.table(
    {
        "doc_id": pa.array([], type=pa.int64()),
        "status": pa.array([], type=pa.string()),
    }
)


def _narrow(ds: rd.Dataset, side: int, id_col: str, text_col: str, n_parts: int):
    def fn(batch: pa.Table) -> pa.Table:
        fp = md5_fingerprint_batch(batch, text_col=text_col)["fingerprint"]
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "fp": fp,
                "side": pa.array(
                    np.full(len(ids), side, dtype=np.int8), type=pa.int8()
                ),
                "part": pa.array(
                    (ids % n_parts).astype(np.int32), type=pa.int32()
                ),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        fn, batch_format="pyarrow"
    )


def corpus_diff(
    old: rd.Dataset,
    new: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_parts: int = 64,
) -> rd.Dataset:
    """(doc_id, status) over the union of both snapshots' ids, status ∈
    {added, removed, changed, unchanged}.  Ids must be unique within
    each side (a duplicate raises — an ambiguous diff is a pipeline
    bug upstream, not something to classify silently)."""

    def classify(grp: pa.Table) -> pa.Table:
        ids = grp["doc_id"].to_numpy(zero_copy_only=False)
        side = grp["side"].to_numpy(zero_copy_only=False)
        fp = np.asarray(grp["fp"].to_pylist(), dtype=object)
        order = np.lexsort((side, ids))
        ids, side, fp = ids[order], side[order], fp[order]
        uniq, starts, counts = np.unique(ids, return_index=True, return_counts=True)
        if counts.max(initial=0) > 2:
            raise ValueError(
                f"corpus_diff: id {uniq[int(counts.argmax())]} appears "
                "more than twice across the two snapshots — duplicate "
                "ids within one side"
            )
        status = np.empty(len(uniq), dtype=object)
        single = counts == 1
        # count==1: present on exactly one side
        s1 = side[starts[single]]
        if single.any() and not ((s1 == 0) | (s1 == 1)).all():
            raise ValueError("corpus_diff: side must be 0 (old) or 1 (new)")
        status[single] = np.where(s1 == 1, "added", "removed")
        both = ~single
        if both.any():
            i = starts[both]
            if not ((side[i] == 0) & (side[i + 1] == 1)).all():
                raise ValueError(
                    "corpus_diff: duplicate ids within one side"
                )
            status[both] = np.where(fp[i] == fp[i + 1], "unchanged", "changed")
        return pa.table(
            {
                "doc_id": pa.array(uniq, type=pa.int64()),
                "status": pa.array(status, type=pa.string()),
            }
        )

    narrow = _narrow(old, 0, id_col, text_col, n_parts).union(
        _narrow(new, 1, id_col, text_col, n_parts)
    )
    return map_groups_typed(narrow, "part", classify, _EMPTY_DIFF)
