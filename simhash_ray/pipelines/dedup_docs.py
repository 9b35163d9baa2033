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

    Two regimes, equivalent outputs (like the image flagship): below
    ``broadcast_sig_limit`` the signature table is collected once and
    banded via broadcast Ray tasks; above it the fully-distributed
    stages run (collapse → band-bucket groupby → distributed pair-gen
    → attach) with a text-only signature space — force with
    ``broadcast_sig_limit=0`` (equivalence-tested)."""
    sigs = encode_signatures(
        docs.select_columns([id_col, text_col]),
        cfg.simhash,
        text_col=text_col,
        concurrency=concurrency,
    ).select_columns([id_col, "simhash"])
    # materialize before counting: count() would otherwise execute the
    # (dominant) encode stage once for the count and again for the
    # downstream consumer (to_pandas / collapse_exact)
    return dedup_documents_from_sigs(
        sigs.materialize(), cfg, id_col=id_col,
        broadcast_sig_limit=broadcast_sig_limit,
    )


def dedup_documents_from_sigs(
    sigs: rd.Dataset,
    cfg: DedupConfig = DEFAULT_CONFIG,
    id_col: str = "doc_id",
    broadcast_sig_limit: int | None = None,
) -> rd.Dataset:
    """Everything after the encode stage of :func:`dedup_documents` —
    callers that already hold the (id, simhash) table (e.g. the
    oracle-staging query) enter here so the encode runs once."""
    limit = BROADCAST_SIG_LIMIT if broadcast_sig_limit is None else broadcast_sig_limit
    n = sigs.count()
    if n > limit:
        return _dedup_documents_distributed(sigs, cfg, id_col, n)
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
    if np.issubdtype(ids.dtype, np.integer):
        from ..stages.cluster import attach_int_labels

        cluster = attach_int_labels(ids, label_df)
    else:  # string/object ids: map stays in object space, no float trip
        lm = pd.Series(
            label_df["label"].to_numpy(), index=label_df["node"].to_numpy()
        )
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


_WIRE_PAD = 20  # zero-pad width: lexicographic order == numeric order


def _dedup_documents_distributed(
    sigs: rd.Dataset, cfg: DedupConfig, id_col: str, n_rows: int
) -> rd.Dataset:
    """Cluster-scale regime: reuse the image flagship's distributed
    stages (exact-sig collapse → band-bucket groupby → distributed
    pair-gen → attach) with a TEXT-only signature space.

    Integer doc ids travel as zero-padded strings through the
    string-keyed stages so lexicographic min == numeric min (both
    regimes elect identical representatives — equivalence-tested)."""
    import pyarrow.compute as pc

    from ..stages.collapse import collapse_exact
    from .dedup_images import attach_clusters, choose_n_parts, dup_edges

    schema = sigs.schema()  # ray Schema wrapper: .names / .types
    int_ids = pa.types.is_integer(dict(zip(schema.names, schema.types))[id_col])

    def to_wire(batch: pa.Table) -> pa.Table:
        ids = batch[id_col]
        if int_ids:
            ids_np = ids.to_numpy(zero_copy_only=False)
            if ids_np.size and ids_np.min() < 0:
                # '-0005' < '-0010' lexicographically: zero-padding a
                # negative id breaks lexicographic==numeric order and
                # the two regimes would elect different representatives
                raise ValueError(
                    f"{id_col} must be non-negative for the distributed "
                    "regime's string wire format (zero-padded ids); "
                    f"got min={ids_np.min()}"
                )
            wire = np.char.zfill(ids_np.astype("U"), _WIRE_PAD)
            arr = pa.array(wire, type=pa.string())
        else:
            arr = ids.cast(pa.string())
        return pa.table(
            {
                "image_id": arr,
                "simhash": batch["simhash"],
                # single-space run: collapse keys on (simhash, phash),
                # a constant phash makes that a collapse on simhash
                "phash": pa.array(
                    np.zeros(batch.num_rows, dtype=np.int64), type=pa.int64()
                ),
            }
        )

    n_parts = choose_n_parts(n_rows)
    wire = sigs.map_batches(to_wire, batch_format="pyarrow")
    collapsed = collapse_exact(wire, n_parts).materialize()
    from ..stages.lsh import TEXT_SPACE as _TS

    edges = dup_edges(
        collapsed, cfg, n_parts, spaces=[(_TS, "simhash", cfg.text_lsh)]
    ).materialize()
    assignment, _, _ = attach_clusters(
        collapsed, edges, cfg, n_parts, compute_n_clusters=False
    )

    def from_wire(batch: pa.Table) -> pa.Table:
        if int_ids:
            ids = pc.cast(batch["image_id"], pa.int64())
            cluster = pc.cast(batch["cluster_id"], pa.int64())
        else:
            ids, cluster = batch["image_id"], batch["cluster_id"]
        return pa.table(
            {
                id_col: ids,
                "cluster_id": cluster,
                "is_representative": batch["is_representative"],
            }
        )

    return assignment.map_batches(from_wire, batch_format="pyarrow")


def dedup_documents_checkpointed(
    docs: rd.Dataset,
    ckpt_dir: str,
    cfg: DedupConfig = DEFAULT_CONFIG,
    text_col: str = "text",
    id_col: str = "doc_id",
    concurrency=None,
    input_fingerprint: str = "",
) -> rd.Dataset:
    """Checkpoint-resumable document dedup — the text twin of
    dedup_images_checkpointed: the (dominant) encode stage and the
    clustering each commit a Parquet directory + lineage manifest
    (state/manifest.py), so a killed run resumes at the first
    uncommitted stage and a rerun is free.  Kill-and-rerun identity is
    pinned in tests/test_resume.py."""
    _, assignment = dedup_documents_checkpointed_parts(
        docs, ckpt_dir, cfg, text_col=text_col, id_col=id_col,
        concurrency=concurrency, input_fingerprint=input_fingerprint,
    )
    return assignment


def dedup_documents_checkpointed_parts(
    docs: rd.Dataset,
    ckpt_dir: str,
    cfg: DedupConfig = DEFAULT_CONFIG,
    text_col: str = "text",
    id_col: str = "doc_id",
    concurrency=None,
    input_fingerprint: str = "",
) -> tuple[rd.Dataset, rd.Dataset]:
    """:func:`dedup_documents_checkpointed` returning BOTH committed
    stages, (signatures, assignment) — callers that must export the
    signature table for a later incremental ingest (the dedup-docs CLI)
    read it from here instead of re-encoding."""
    from ..state.manifest import CheckpointedRun

    run = CheckpointedRun(ckpt_dir, cfg.config_hash())
    sigs = run.stage(
        "doc_signatures",
        lambda: encode_signatures(
            docs.select_columns([id_col, text_col]),
            cfg.simhash,
            text_col=text_col,
            concurrency=concurrency,
        ).select_columns([id_col, "simhash"]),
        input_fingerprint,
    )
    assignment = run.stage(
        "doc_assignment",
        lambda: dedup_documents_from_sigs(sigs, cfg, id_col=id_col),
        input_fingerprint,
    )
    run.write_metrics()
    return sigs, assignment
