"""Tiered cascade dedup: exact bytes → phash LSH → caption SimHash.

The web-scale cost-discipline pattern the flagship's joint two-space
pass deliberately does NOT express: run the CHEAPEST dedup tier first
and let every later (more expensive) tier see only the survivors of
the previous one.  At 10^12 rows the exact-bytes tier typically drops
10-30% of the corpus for the price of one streaming sha256 pass and a
digest-only shuffle, so the LSH band expansion — the widest shuffle in
the pipeline — runs over a strictly smaller signature table, and the
caption tier smaller still.

Semantics (differ from the flagship's joint clustering on purpose):
each tier clusters ONLY within its own space over its own input set,
elects the min-id member as keeper, and drops the rest.  A row's
``tier`` records where IT was dropped; its final ``cluster_id`` is the
ultimate surviving keeper, found by chasing the (strictly
id-decreasing, hence acyclic) member→keeper chain across tiers.

Reference parity: the per-tier machinery is the flagship's
(stages/collapse, stages/lsh, stages/cluster — see
pipelines/dedup_images.py for the Haskell reference citations); this
module only adds the tier composition.

Shuffle inventory (scale notes):
  1. exact tier        — sha256 in place; (id, 32 B digest) rows shuffle
                         once; image bytes move ZERO times.
  2. per sig tier      — the flagship's collapse + band groupby + CC
                         rounds, but over the PRUNED survivor set.
  3. survivor filter   — broadcast of the dropped-id set when small
                         (the typical case: dups ≪ corpus), hash join
                         on survivor ids otherwise.
  4. composition       — joins move only (member, keeper) pairs of
                         DROPPED rows: bounded by the dup count, never
                         the corpus size.

The caller owns ``ray.init`` (driver contract, __ray_entry__.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..config import DEFAULT_CONFIG, DedupConfig
from ..stages.collapse import collapse_exact, dedup_exact_bytes
from ..stages.lsh import IMAGE_SPACE, TEXT_SPACE
from .dedup_images import (
    BROADCAST_LIMIT,
    attach_clusters,
    dup_edges,
    signatures,
)

# tier name → (LSH space tag, signature column, cfg attribute)
SIG_TIERS = {
    "phash": (IMAGE_SPACE, "phash", "image_lsh"),
    "caption": (TEXT_SPACE, "simhash", "text_lsh"),
}
DEFAULT_TIERS = ("exact", "phash", "caption")


@dataclass
class CascadeResult:
    # (image_id, cluster_id, tier) for EVERY input row; tier ∈
    # {"exact", "phash", "caption", "survivor"}
    assignment: rd.Dataset
    # per-tier member→keeper maps, in tier order (materialized)
    tier_maps: list = field(default_factory=list)  # [(tier, Dataset), ...]
    # rows dropped at each tier (same order)
    tier_drops: dict = field(default_factory=dict)
    # the signature table the sig tiers ran over (None if no sig tier
    # ran); covers tier-input survivors at the time of the first sig
    # tier — oracle staging reuses it
    signatures: rd.Dataset | None = None


def _n_join() -> int:
    # chained-join sessions starve aggregator actors above CPU//4
    # partitions (measured; see BASELINE.md join-deadlock note)
    return int(min(8, max(2, ray.cluster_resources().get("CPU", 8) // 4)))


def _indexer_lookup(values: np.ndarray, lut: pd.Series, default: np.ndarray):
    """Exact hash-based lookup: ``lut[values]`` with ``default`` for
    misses.  ``Index.get_indexer`` keeps int64 ids exact (a pandas
    ``.map`` would widen missing hits to float64 and lose precision
    above 2**53) and works for string ids identically."""
    out = np.asarray(default, dtype=object).copy()
    if len(lut):
        pos = lut.index.get_indexer(pd.Index(values))
        hit = pos >= 0
        out[hit] = lut.to_numpy()[pos[hit]]
    return out


def _drop_rows(
    ds: rd.Dataset,
    dropped: rd.Dataset,
    n_dropped: int,
    limit: int,
    id_col: str = "image_id",
) -> rd.Dataset:
    """Filter ``ds`` down to rows whose id is NOT in ``dropped``.

    Broadcast anti-filter below ``limit`` dropped ids (the wide rows
    never shuffle); above it a left join against the dropped map +
    null-keeper filter (anti-join) takes over."""
    if n_dropped == 0:
        return ds
    if n_dropped <= limit:
        dup_df = dropped.select_columns([id_col]).to_pandas()
        dup_ref = ray.put(pa.array(dup_df[id_col]))

        def keep(batch: pa.Table) -> pa.Table:
            dups = ray.get(dup_ref)
            mask = pc.invert(
                pc.is_in(batch[id_col].cast(dups.type), value_set=dups)
            )
            return batch.filter(mask)

        return ds.map_batches(keep, batch_format="pyarrow")
    joined = ds.join(
        dropped.select_columns([id_col, "keeper_id"]),
        join_type="left_outer",
        num_partitions=_n_join(),
        on=(id_col,),
        aggregator_ray_remote_args={"num_cpus": 0.5},
    )
    return joined.map_batches(
        lambda t: t.filter(pc.is_null(t["keeper_id"])).drop_columns(["keeper_id"]),
        batch_format="pyarrow",
    )


def _remap_keeper(
    m: rd.Dataset, f: rd.Dataset, n_f: int, limit: int, id_col: str = "image_id"
) -> rd.Dataset:
    """Rewrite ``m.keeper_id`` through the later-tier map ``f``: a
    keeper that was itself dropped later resolves to ITS final keeper
    (chains are id-decreasing, so one pass per tier suffices)."""
    if n_f <= limit:
        f_df = f.select_columns([id_col, "keeper_id"]).to_pandas()
        map_ref = ray.put(
            pd.Series(
                f_df["keeper_id"].to_numpy(), index=f_df[id_col].to_numpy()
            )
        )

        def remap(batch: pa.Table) -> pa.Table:
            keep = batch["keeper_id"].to_numpy(zero_copy_only=False)
            resolved = _indexer_lookup(keep, ray.get(map_ref), keep)
            return pa.table(
                {
                    id_col: batch[id_col],
                    "keeper_id": pa.array(resolved, type=batch["keeper_id"].type),
                    "tier": batch["tier"],
                }
            )

        return m.map_batches(remap, batch_format="pyarrow")
    f_r = f.select_columns([id_col, "keeper_id"]).map_batches(
        lambda t: t.rename_columns(["keeper_id", "final_keeper"]),
        batch_format="pyarrow",
    )
    joined = m.join(
        f_r,
        join_type="left_outer",
        num_partitions=_n_join(),
        on=("keeper_id",),
        aggregator_ray_remote_args={"num_cpus": 0.5},
    )

    def finish(batch: pa.Table) -> pa.Table:
        keeper = batch["keeper_id"]
        return pa.table(
            {
                id_col: batch[id_col],
                "keeper_id": pc.coalesce(
                    batch["final_keeper"].cast(keeper.type), keeper
                ),
                "tier": batch["tier"],
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


def _attach_final(
    ids: rd.Dataset,
    f: rd.Dataset | None,
    n_f: int,
    limit: int,
    id_col: str = "image_id",
) -> rd.Dataset:
    """(id) × composed map → (id, cluster_id, tier); unmatched rows
    are their own cluster with tier='survivor'."""
    if f is None or n_f == 0:
        return ids.map_batches(
            lambda t: pa.table(
                {
                    id_col: t[id_col],
                    "cluster_id": t[id_col].combine_chunks()
                    if isinstance(t[id_col], pa.ChunkedArray)
                    else t[id_col],
                    "tier": pa.array(["survivor"] * len(t), type=pa.string()),
                }
            ),
            batch_format="pyarrow",
        )
    if n_f <= limit:
        f_df = f.to_pandas()
        idx = f_df[id_col].to_numpy()
        keep_ref = ray.put(pd.Series(f_df["keeper_id"].to_numpy(), index=idx))
        tier_ref = ray.put(pd.Series(f_df["tier"].to_numpy(), index=idx))

        def attach(batch: pa.Table) -> pa.Table:
            vals = batch[id_col].to_numpy(zero_copy_only=False)
            cluster = _indexer_lookup(vals, ray.get(keep_ref), vals)
            tier = _indexer_lookup(
                vals, ray.get(tier_ref), np.full(len(vals), "survivor", object)
            )
            return pa.table(
                {
                    id_col: batch[id_col],
                    "cluster_id": pa.array(cluster, type=batch[id_col].type),
                    "tier": pa.array(tier, type=pa.string()),
                }
            )

        return ids.map_batches(attach, batch_format="pyarrow")
    joined = ids.join(
        f,
        join_type="left_outer",
        num_partitions=_n_join(),
        on=(id_col,),
        aggregator_ray_remote_args={"num_cpus": 0.5},
    )

    def finish(batch: pa.Table) -> pa.Table:
        sid = batch[id_col]
        sid = sid.combine_chunks() if isinstance(sid, pa.ChunkedArray) else sid
        return pa.table(
            {
                id_col: sid,
                "cluster_id": pc.coalesce(batch["keeper_id"].cast(sid.type), sid),
                "tier": pc.coalesce(
                    batch["tier"].cast(pa.string()), pa.scalar("survivor")
                ),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


def _with_tier(m: rd.Dataset, tier: str) -> rd.Dataset:
    return m.map_batches(
        lambda t: t.append_column(
            "tier", pa.array([tier] * len(t), type=pa.string())
        ),
        batch_format="pyarrow",
    )


def dedup_images_cascade(
    images: rd.Dataset,
    cfg: DedupConfig = DEFAULT_CONFIG,
    tiers: tuple = DEFAULT_TIERS,
    concurrency=None,
    n_parts: int = 64,
    broadcast_limit: int | None = None,
    precomputed_sigs: rd.Dataset | None = None,
) -> CascadeResult:
    """Run the dedup tiers in order, each over the previous tier's
    survivors, and compose the per-tier member→keeper maps into one
    global assignment ``(image_id, cluster_id, tier)``.

    ``precomputed_sigs`` (image_id, simhash, phash, covering at least
    every row alive at the first sig tier) skips the encode pass —
    signatures are per-row deterministic, so an all-rows table is
    semantically identical (oracle staging uses this).
    """
    limit = BROADCAST_LIMIT if broadcast_limit is None else broadcast_limit
    unknown = [t for t in tiers if t != "exact" and t not in SIG_TIERS]
    if unknown:
        raise ValueError(f"unknown cascade tiers {unknown}; valid: "
                         f"('exact', {', '.join(repr(k) for k in SIG_TIERS)})")

    current: rd.Dataset | None = images  # wide rows, alive set (exact tier)
    # narrow projection pruned in lockstep with ``current``: the sig-tier
    # encode must NEVER pull the byte payloads through its anti-filter —
    # projecting straight off the read keeps the column pushdown, so the
    # encode pass moves (id, caption, phash) rows only (measured 45 s →
    # ~9 s at 400k rows when bytes stopped flowing through the filter)
    narrow: rd.Dataset = images.select_columns(["image_id", "caption", "phash"])
    sigs: rd.Dataset | None = None  # narrow (id, simhash, phash), alive set
    sigs_out: rd.Dataset | None = None
    tier_maps: list = []
    tier_drops: dict = {}

    for tier_idx, tier in enumerate(tiers):
        if tier == "exact":
            m = dedup_exact_bytes(current, n_parts=n_parts).materialize()
            dropped = m.filter(expr="is_rep == False").map_batches(
                lambda t: t.select(["image_id", "rep_id"]).rename_columns(
                    ["image_id", "keeper_id"]
                ),
                batch_format="pyarrow",
            )
        else:
            space, col, cfg_attr = SIG_TIERS[tier]
            first_sig_tier = sigs is None
            if first_sig_tier:
                if precomputed_sigs is not None:
                    sigs = precomputed_sigs
                    # restrict to the alive set (ids dropped by earlier
                    # tiers must not re-enter)
                    for _, prev in tier_maps:
                        sigs = _drop_rows(sigs, prev, prev.count(), limit)
                else:
                    sigs = signatures(narrow, cfg, concurrency=concurrency)
                sigs = sigs.materialize()
                sigs_out = sigs
            if first_sig_tier:
                collapsed = collapse_exact(sigs, n_parts).materialize()
            else:
                # after any sig tier, survivors have pairwise-distinct
                # (simhash, phash): an identical pair is Hamming 0 in
                # the previous tier's space, so at most one member of
                # each identical-sig group is still alive — the
                # collapse groupby shuffle would be a no-op; build its
                # output shape directly (everyone their own rep)
                collapsed = sigs.map_batches(
                    lambda t: pa.table(
                        {
                            "image_id": t["image_id"],
                            "rep_id": t["image_id"].cast(pa.string()),
                            "simhash": t["simhash"],
                            "phash": t["phash"],
                            "is_rep": pa.array([True] * len(t)),
                        }
                    ),
                    batch_format="pyarrow",
                ).materialize()
            # materialize: attach_clusters consumes the edge table twice
            # (count + collect/CC) — every other caller pins it first
            edges = dup_edges(
                collapsed, cfg, n_parts,
                spaces=[(space, col, getattr(cfg, cfg_attr))],
            ).materialize()
            assignment, _, _ = attach_clusters(
                collapsed, edges, cfg, n_parts,
                broadcast_limit=limit, compute_n_clusters=False,
            )
            dropped = assignment.filter(
                expr="is_representative == False"
            ).map_batches(
                lambda t: t.select(["image_id", "cluster_id"]).rename_columns(
                    ["image_id", "keeper_id"]
                ),
                batch_format="pyarrow",
            )
        dropped = dropped.materialize()
        n_dropped = dropped.count()
        tier_maps.append((tier, dropped))
        tier_drops[tier] = n_dropped
        # prune the alive set for the NEXT tier (skip after the last)
        if tier_idx + 1 < len(tiers) and n_dropped:
            if sigs is not None:
                sigs = _drop_rows(sigs, dropped, n_dropped, limit).materialize()
            else:
                current = _drop_rows(current, dropped, n_dropped, limit)
                narrow = _drop_rows(narrow, dropped, n_dropped, limit)

    # ---- compose maps, last tier backwards -------------------------------
    final: rd.Dataset | None = None
    n_final = 0
    for tier, m in reversed(tier_maps):
        n_m = tier_drops[tier]
        if n_m == 0:
            continue
        m_t = _with_tier(m, tier)
        if final is None:
            final = m_t
        else:
            final = _remap_keeper(m_t, final, n_final, limit).union(final)
        n_final += n_m
        final = final.materialize()

    ids = images.select_columns(["image_id"])
    assignment = _attach_final(ids, final, n_final, limit)
    return CascadeResult(
        assignment=assignment,
        tier_maps=tier_maps,
        tier_drops=tier_drops,
        signatures=sigs_out,
    )


def dedup_docs_cascade(
    docs: rd.Dataset,
    theta: float = 0.7,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 2,
    n_perm: int = 64,
    n_bands: int = 16,
    concurrency=(1, 8),
    n_parts: int = 64,
    broadcast_limit: int | None = None,
    pairs: rd.Dataset | None = None,
) -> CascadeResult:
    """Text-domain tiered cascade: exact text → MinHash-LSH (estimated
    Jaccard ≥ θ), the document twin of :func:`dedup_images_cascade`.

    The exact tier pays one streaming sha256 pass + a digest-only
    shuffle to drop every byte-identical document, so the MinHash tier
    — shingling, 64 permutations, band expansion, the wide shuffle —
    runs over distinct texts only.  On web crawls exact duplicates are
    the DOMINANT dup class (mirrors, boilerplate pages), so the
    pruning typically pays for itself many times over.

    Output ``assignment``: (id_col, cluster_id, tier) for every input
    row, tier ∈ {'exact', 'minhash', 'survivor'}; cluster_id is the
    final surviving keeper (exact keepers that the MinHash tier then
    merged resolve through the keeper chain).  ``pairs`` short-circuits
    the MinHash encode when the caller already holds the verified pair
    table FOR THE TIER-1 SURVIVOR SET (oracle staging uses this).
    """
    from ..stages.minhash import minhash_dedup

    limit = BROADCAST_LIMIT if broadcast_limit is None else broadcast_limit
    narrow = docs.select_columns([id_col, text_col])

    m1 = dedup_exact_bytes(
        narrow, id_col=id_col, bytes_col=text_col, n_parts=n_parts,
        id_type=pa.int64(),
    ).materialize()
    dropped1 = m1.filter(expr="is_rep == False").map_batches(
        lambda t: t.select([id_col, "rep_id"]).rename_columns(
            [id_col, "keeper_id"]
        ),
        batch_format="pyarrow",
    ).materialize()
    n1 = dropped1.count()

    survivors1 = _drop_rows(narrow, dropped1, n1, limit, id_col)
    a2 = minhash_dedup(
        survivors1, theta, text_col, id_col, shingle_k, n_perm, n_bands,
        concurrency, n_parts, broadcast_limit=limit, pairs=pairs,
    )
    dropped2 = a2.filter(expr="is_representative == False").map_batches(
        lambda t: t.select([id_col, "cluster_id"]).rename_columns(
            [id_col, "keeper_id"]
        ),
        batch_format="pyarrow",
    ).materialize()
    n2 = dropped2.count()

    tier_maps = [("exact", dropped1), ("minhash", dropped2)]
    tier_drops = {"exact": n1, "minhash": n2}

    final = None
    n_final = 0
    if n2:
        final = _with_tier(dropped2, "minhash").materialize()
        n_final = n2
    if n1:
        m1_t = _with_tier(dropped1, "exact")
        if final is None:
            final = m1_t.materialize()
        else:
            final = _remap_keeper(m1_t, final, n_final, limit, id_col).union(
                final
            ).materialize()
        n_final += n1

    ids = docs.select_columns([id_col])
    assignment = _attach_final(ids, final, n_final, limit, id_col)
    return CascadeResult(
        assignment=assignment, tier_maps=tier_maps, tier_drops=tier_drops
    )
