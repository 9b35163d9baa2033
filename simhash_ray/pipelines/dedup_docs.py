"""Document near-duplicate dedup: the flagship SimHash pipeline over a
text-only corpus (the reference's own domain — its encoder consumes
document strings, /root/reference/src/Htm/SimHashDocumentEncoder.hsc).

Same architecture as pipelines/dedup_images with a single (text)
signature space: encode (actor pool) → Hamming-ball LSH banding →
verified edges → union-find → (doc_id, cluster_id, is_representative).
Shares every stage implementation; only the space wiring differs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..config import DEFAULT_CONFIG, DedupConfig
from ..stages.encode import encode_signatures
from ..stages.lsh import TEXT_SPACE, broadcast_candidate_edges
from ..stages.cluster import unionfind_driver
from .dedup_images import BROADCAST_SIG_LIMIT


def dedup_documents(
    docs: rd.Dataset,
    cfg: DedupConfig = DEFAULT_CONFIG,
    text_col: str = "text",
    id_col: str = "doc_id",
    concurrency=None,
    broadcast_sig_limit: int | None = None,
) -> rd.Dataset:
    """(doc_id, cluster_id, is_representative) — near-dup clusters of a
    document table at the pinned SimHash/LSH config.

    Direct regime only is implemented here (signature table collected
    once below the broadcast limit); corpora beyond it should run the
    image pipeline's distributed machinery with the text space — the
    stages are shared, see pipelines/dedup_images.dup_edges."""
    limit = BROADCAST_SIG_LIMIT if broadcast_sig_limit is None else broadcast_sig_limit
    sigs = encode_signatures(
        docs.select_columns([id_col, text_col]),
        cfg.simhash,
        text_col=text_col,
        concurrency=concurrency,
    ).select_columns([id_col, "simhash"])
    n = sigs.count()
    if n > limit:
        raise NotImplementedError(
            "document corpus exceeds the broadcast regime; compose the "
            "distributed stages (collapse_exact + dup_edges) as "
            "dedup_images does"
        )
    sig_df = sigs.to_pandas().sort_values(id_col, ignore_index=True)
    ids = sig_df[id_col].to_numpy()
    ai, bi = broadcast_candidate_edges(
        {TEXT_SPACE: sig_df["simhash"].to_numpy().view(np.uint64)},
        [(TEXT_SPACE, cfg.text_lsh)],
        taus={TEXT_SPACE: cfg.text_lsh.hamming_tau},
        pair_full_threshold=cfg.text_lsh.pair_full_threshold,
    )
    edge_df = pd.DataFrame({"a": ids[ai], "b": ids[bi]}).drop_duplicates()
    label_df = unionfind_driver(edge_df)
    lm = pd.Series(label_df["label"].to_numpy(), index=label_df["node"].to_numpy())
    cluster = (
        pd.Series(ids).map(lm).fillna(pd.Series(ids)).to_numpy().astype(ids.dtype)
    )
    out = pa.table(
        {
            id_col: pa.array(ids),
            "cluster_id": pa.array(cluster),
            "is_representative": pa.array(ids == cluster),
        }
    )
    return rd.from_arrow(out)
