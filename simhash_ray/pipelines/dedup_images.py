"""Flagship pipeline: near-duplicate detection + clustering over the
image+caption table (BASELINE.json north_rule).

    read (pruned: image_id, caption, phash)
      → map_batches(SimHashEncoder actor pool)          [stages/encode]
      → exact-(simhash,phash) collapse                  [stages/collapse]
      → band expansion (text + image spaces, one pass)  [stages/lsh]
      → ONE coarse groupby → vectorized bucket pairing  [stages/lsh]
      → Hamming verify (popcount ≤ τ per space)         [stages/lsh]
      → iterative min-label propagation → clusters      [stages/cluster]
      → cluster attach (broadcast small label map, else
        hash join) → assignment / representatives / survivors

Shuffle inventory (scale notes):
  1. collapse groupby     — narrow (id, 2×int64) rows
  2. band-bucket groupby  — 56 narrow rows per *distinct* signature
  3. CC rounds            — only nodes with verified edges
  4. survivor rejoin      — broadcast of the dup-id set when small,
                            hash `Dataset.join` on image_id otherwise;
                            the wide `bytes` column moves exactly once.

The caller owns `ray.init` (driver contract, /root/repo/__ray_entry__.py).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..config import DEFAULT_CONFIG, DedupConfig, LSHConfig
from ..simhash import hamming64
from ..stages.collapse import collapse_exact
from ..stages.cluster import connected_components, unionfind_driver
from ..stages.encode import encode_signatures
from ..stages.lsh import (
    IMAGE_SPACE,
    TEXT_SPACE,
    broadcast_candidate_edges,
    candidate_pairs,
    make_band_expander,
)

BROADCAST_LIMIT = 2_000_000  # rows; above this fall back to Dataset.join
# Distinct-signature rows (16 B each) below this → shuffle-free
# broadcast pairing (stages/lsh.broadcast_candidate_edges); above →
# the distributed band-bucket groupby.  20M rows ≈ 0.5 GB replicated.
BROADCAST_SIG_LIMIT = 20_000_000


@dataclass
class DedupResult:
    assignment: rd.Dataset  # (image_id, cluster_id, is_representative)
    edges: rd.Dataset  # verified dup pairs (a, b, space)
    n_clusters_with_dups: int
    n_nodes_clustered: int
    # (image_id, simhash, phash) — populated in the direct regime where
    # the table is already materialized (oracle staging reuses it so the
    # driver gate doesn't pay a second encode pass); None in the
    # distributed regime (the collapse stage consumes the lazy plan).
    signatures: rd.Dataset | None = None


def signatures(
    images: rd.Dataset, cfg: DedupConfig = DEFAULT_CONFIG, concurrency=None
) -> rd.Dataset:
    """(image_id, caption, phash) → (image_id, simhash, phash)."""
    return encode_signatures(
        images.select_columns(["image_id", "caption", "phash"]),
        cfg.simhash,
        concurrency=concurrency,
    ).select_columns(["image_id", "simhash", "phash"])


def _band_plan(
    collapsed: rd.Dataset, cfg: DedupConfig, spaces: list | None = None
) -> tuple[list, int, int]:
    """(spaces, n_bands, band_parts) — THE shared banding decomposition
    for the edges stage, used by both `dup_edges` and the per-shard
    checkpointing path so the two cannot drift (r5 review finding).

    band_parts sizing (r5 sweep, 1M rows / 36.8M band rows, 32 CPUs):
    3.3 s at 4096 parts vs 4.1 s at the old rows/4096=10498 — the band
    shuffle is flat across 1k–4k parts and degrades above, so size ~1
    part per 8k band rows."""
    import itertools as _it

    if spaces is None:  # default: both north-rule signature spaces
        spaces = [
            (TEXT_SPACE, "simhash", cfg.text_lsh),
            (IMAGE_SPACE, "phash", cfg.image_lsh),
        ]
    n_bands = sum(
        1
        for _, _, c in spaces
        for _ in _it.combinations(range(c.n_blocks), c.combo_m)
    )
    n_reps_max = collapsed.count()  # metadata read on materialized input
    band_parts = int(min(65536, max(256, (n_reps_max * n_bands) // 8192)))
    return spaces, n_bands, band_parts


def dup_edges(
    collapsed: rd.Dataset,
    cfg: DedupConfig = DEFAULT_CONFIG,
    n_parts: int = 64,
    spaces: list | None = None,
    part_range: tuple[int, int] | None = None,
    candidates_only: bool = False,
    first_band_only: bool = False,
) -> rd.Dataset:
    """Distinct-signature nodes → banding → bucket pairs → verified
    (a, b) dup edges.

    Shuffle sizing (measured at 400k rows / 17M band rows, 32 CPUs —
    see BASELINE.md "distributed regime tuning"): the narrow rep table
    is repartitioned to ~1 block per CPU BEFORE band expansion (moving
    400k×24 B rows instead of the 43×-larger band table: the round-1
    post-expansion repartition cost ~2× the whole stage); band_parts
    come from :func:`_band_plan`.

    ``part_range``/``candidates_only`` serve the per-shard edge
    checkpointing path: restrict banding to a coarse-partition range
    and return the batch-locally-deduped verified pairs WITHOUT the
    global dedupe (the caller dedupes the shard union).

    ``first_band_only`` (OPT-IN): emit each exactly-enumerated pair
    only from its first-colliding band — shrinks the dedupe input
    ~n_bands× (the 100-TB shuffle lever; A/B in BASELINE.md) at the
    cost of the weaker star-regime recall guarantee documented on
    ``make_pair_generator``; identical final edge set whenever no
    band bucket exceeds OVERSIZED_EXACT_CAP distinct sigs
    (equivalence-tested)."""
    spaces, _, band_parts = _band_plan(collapsed, cfg, spaces)
    cpus = int(ray.cluster_resources().get("CPU", 32))
    sig_cols = sorted({col for _, col, _ in spaces})
    reps = (
        collapsed.filter(expr="is_rep == True")
        .select_columns(["image_id", *sig_cols])
        .repartition(max(32, cpus))
    )
    expander = make_band_expander(
        spaces,
        id_col="image_id",
        n_parts=band_parts,
        part_range=part_range,
    )
    bands = reps.map_batches(expander, batch_format="pyarrow")
    verified = candidate_pairs(
        bands,
        # pairing thresholds are per-pipeline (shared across spaces):
        # the stricter (smaller) of the configs wins
        pair_full_threshold=min(c.pair_full_threshold for _, _, c in spaces),
        taus={sp: c.hamming_tau for sp, _, c in spaces},
        shuffle_blocks=None,  # pre-partitioned above, narrow side
        first_band_cfgs=(
            {sp: c for sp, _, c in spaces} if first_band_only else None
        ),
    )
    if candidates_only:
        def local_dedupe(t: pa.Table) -> pa.Table:
            return t.select(["a", "b"]).group_by(["a", "b"]).aggregate([])

        return verified.map_batches(local_dedupe, batch_format="pyarrow")
    from ..stages.cluster import dedupe_edges

    return dedupe_edges(verified.select_columns(["a", "b"]), n_parts)


def choose_n_parts(n_rows: int) -> int:
    """Coarse-partition count for a bucket shuffle over ``n_rows``.

    Round-5 sweep (1M rows, 32 CPUs, BASELINE.md "part-count sweep"):
    the exact-collapse groupby ran 1.37 s at 128 parts, 5.7 s at 325
    (the old ~1 part/3k-rows rule) and 57 s at 1024 — and the edge
    dedupe over 5.9M rows showed the same cliff (64p: 2.6 s, 325p:
    6.9 s, 1024p: 57 s).  Ray's sort-based shuffle cost grows
    super-linearly with reduce-partition count long before partitions
    get large, so parts should track the CLUSTER (a few × total CPUs
    for parallelism) and row count only as a memory bound — not ~1
    part per few thousand rows.  ~4× CPUs, with a rows/65536 floor so
    cluster-scale inputs still bound per-partition memory, both
    clamped."""
    import ray as _ray

    cpus = int(_ray.cluster_resources().get("CPU", 32)) if (
        _ray.is_initialized()
    ) else 32
    return int(min(65536, max(64, 4 * cpus, n_rows // 65536)))


def cluster_broadcast(collapsed: rd.Dataset, cfg: DedupConfig):
    """Shuffle-free LSH + clustering over the collapsed distinct-sig
    table: collect the narrow rep rows once (16 B/row + id), fan out
    one Ray task per band over the broadcast signature arrays, then
    index-space union-find on the driver.

    Returns (label_df[node,label], edge_df[a,b])."""
    import pandas as pd

    from ..stages.cluster import unionfind_driver
    from ..stages.lsh import broadcast_candidate_edges

    rep_df = (
        collapsed.filter(expr="is_rep == True")
        .select_columns(["image_id", "simhash", "phash"])
        .to_pandas()
        .sort_values("image_id", ignore_index=True)
        # sorted by id → index order == lexicographic order, so index
        # pairs (lo, hi) and star centers match the distributed path's
        # a < b / min-id conventions exactly
    )
    ids = rep_df["image_id"].to_numpy(dtype=object)
    ai, bi = broadcast_candidate_edges(
        {
            TEXT_SPACE: rep_df["simhash"].to_numpy().view(np.uint64),
            IMAGE_SPACE: rep_df["phash"].to_numpy().view(np.uint64),
        },
        [(TEXT_SPACE, cfg.text_lsh), (IMAGE_SPACE, cfg.image_lsh)],
        taus={
            TEXT_SPACE: cfg.text_lsh.hamming_tau,
            IMAGE_SPACE: cfg.image_lsh.hamming_tau,
        },
        pair_full_threshold=min(
            cfg.text_lsh.pair_full_threshold, cfg.image_lsh.pair_full_threshold
        ),
    )
    edge_df = pd.DataFrame({"a": ids[ai], "b": ids[bi]})
    label_df = unionfind_driver(edge_df)
    return label_df, edge_df


def _direct_regime_cluster(ids, space_sigs, spaces, taus, pair_full_threshold):
    """Shared direct-regime tail (flagship + dihedral): broadcast
    banding over id-aligned signature arrays → canonical (a < b,
    deduped) edge set → driver union-find.  Returns
    (edge_df, label_df, edges_ds)."""
    import pandas as pd

    ai, bi = broadcast_candidate_edges(
        space_sigs, spaces, taus=taus, pair_full_threshold=pair_full_threshold
    )
    a_ids, b_ids = ids[ai], ids[bi]
    swap = a_ids > b_ids
    a_ids[swap], b_ids[swap] = b_ids[swap], a_ids[swap]
    edge_df = pd.DataFrame({"a": a_ids, "b": b_ids}).drop_duplicates()
    label_df = unionfind_driver(edge_df)
    edges = rd.from_pandas(edge_df) if len(edge_df) else rd.from_arrow(
        pa.table({"a": pa.array([], pa.string()), "b": pa.array([], pa.string())})
    )
    return edge_df, label_df, edges


def dedup_images(
    images: rd.Dataset,
    cfg: DedupConfig = DEFAULT_CONFIG,
    n_parts: int | None = None,
    concurrency=None,
    broadcast_sig_limit: int | None = None,
    precomputed_sigs: rd.Dataset | None = None,
) -> DedupResult:
    """Two regimes, equivalent outputs (tests/test_lsh_paths.py and
    tests/test_pipeline.py::test_distributed_regime_matches_direct;
    ``broadcast_sig_limit`` overrides BROADCAST_SIG_LIMIT — pass 0 to
    force the distributed regime, as bench.py does for its
    ``e2e_dedup_distributed`` number):

    - **direct** (rows ≤ BROADCAST_SIG_LIMIT): encode distributed, then
      the narrow signature table (≤ ~0.5 GB) is collected once and
      banded by one raw Ray task per band over broadcast arrays — no
      all-to-all shuffle at all.  Identical-signature masses (the exact
      dup / hot-caption cases) are connected by Hamming-0 chain edges
      inside oversized buckets, so the exact-collapse stage is not
      needed for correctness here.
    - **distributed** (above the limit): exact-signature collapse
      groupby → band-bucket groupby shuffle → distributed min-label
      propagation — every stage streaming and partitioned.
    """
    n_rows = images.count()
    if n_parts is None:
        n_parts = choose_n_parts(n_rows)
    limit = BROADCAST_SIG_LIMIT if broadcast_sig_limit is None else broadcast_sig_limit
    # ``precomputed_sigs``: callers that already hold the (image_id,
    # simhash, phash) table at the SAME cfg skip the encode pass (the
    # sf0.01 gate's query-sharing path; must cover every input row)
    sigs = (
        precomputed_sigs
        if precomputed_sigs is not None
        else signatures(images, cfg, concurrency=concurrency)
    )
    kept_sigs = None
    if n_rows <= limit:
        sigs = sigs.materialize()
        kept_sigs = sigs
        sig_df = sigs.to_pandas()
        ids = sig_df["image_id"].to_numpy(dtype=object)
        edge_df, label_df, edges = _direct_regime_cluster(
            ids,
            {
                TEXT_SPACE: sig_df["simhash"].to_numpy().view(np.uint64),
                IMAGE_SPACE: sig_df["phash"].to_numpy().view(np.uint64),
            },
            [(TEXT_SPACE, cfg.text_lsh), (IMAGE_SPACE, cfg.image_lsh)],
            taus={
                TEXT_SPACE: cfg.text_lsh.hamming_tau,
                IMAGE_SPACE: cfg.image_lsh.hamming_tau,
            },
            pair_full_threshold=min(
                cfg.text_lsh.pair_full_threshold, cfg.image_lsh.pair_full_threshold
            ),
        )
        assignment = _attach_by_own_id(sigs, label_df)
        n_clusters = len(set(label_df["label"]))
        n_nodes = len(label_df)
    else:  # cluster-scale regime (composed-tested + benched since r2)
        collapsed = collapse_exact(sigs, n_parts).materialize()
        edges = dup_edges(collapsed, cfg, n_parts).materialize()
        assignment, n_clusters, n_nodes = attach_clusters(
            collapsed, edges, cfg, n_parts
        )
    return DedupResult(
        assignment=assignment.materialize(),
        edges=edges,
        n_clusters_with_dups=n_clusters,
        n_nodes_clustered=n_nodes,
        signatures=kept_sigs,
    )


def dedup_images_dihedral(
    images: rd.Dataset,
    cfg: DedupConfig = DEFAULT_CONFIG,
    n_parts: int | None = None,
    concurrency=(1, 8),
    broadcast_sig_limit: int | None = None,
) -> DedupResult:
    """Mirror/rotation-robust image dedup: the flagship's candidate →
    verify → cluster machinery run in the single dihedral-canonical
    hash space (stages/multimodal.DihedralPhash — min of the pinned
    phash over the 8 thumbnail symmetries), so a horizontally mirrored
    or rotated copy lands at Hamming 0 where the precomputed ``phash``
    column sees an unrelated signature.

    Same two regimes as :func:`dedup_images` (``broadcast_sig_limit=0``
    forces the distributed path).  The distributed regime reuses
    collapse_exact / dup_edges / attach_clusters unchanged by carrying
    the dihedral sig in BOTH signature slots and banding only the
    image space — 8 extra bytes/row through the collapse shuffle buys
    zero new shuffle code.  Unlike the flagship this stage must DECODE
    (the stored phash cannot be canonicalized post-hoc), so the encode
    pool is the wide-binary actor-pool shape: small batches, bytes
    never pass the encoder."""
    from ..stages.multimodal import dihedral_signatures

    n_rows = images.count()
    if n_parts is None:
        n_parts = choose_n_parts(n_rows)
    limit = BROADCAST_SIG_LIMIT if broadcast_sig_limit is None else broadcast_sig_limit
    sigs = dihedral_signatures(images, concurrency=concurrency)
    kept_sigs = None
    if n_rows <= limit:
        sigs = sigs.materialize()
        kept_sigs = sigs
        sig_df = sigs.to_pandas()
        ids = sig_df["image_id"].to_numpy(dtype=object)
        edge_df, label_df, edges = _direct_regime_cluster(
            ids,
            {IMAGE_SPACE: sig_df["dsig"].to_numpy().view(np.uint64)},
            [(IMAGE_SPACE, cfg.image_lsh)],
            taus={IMAGE_SPACE: cfg.image_lsh.hamming_tau},
            pair_full_threshold=cfg.image_lsh.pair_full_threshold,
        )
        assignment = _attach_by_own_id(sigs, label_df)
        n_clusters = len(set(label_df["label"]))
        n_nodes = len(label_df)
    else:  # cluster-scale regime: reuse the flagship stages verbatim
        both = sigs.map_batches(
            lambda t: pa.table(
                {"image_id": t["image_id"], "simhash": t["dsig"], "phash": t["dsig"]}
            ),
            batch_format="pyarrow",
        )
        collapsed = collapse_exact(both, n_parts).materialize()
        edges = dup_edges(
            collapsed, cfg, n_parts,
            spaces=[(IMAGE_SPACE, "phash", cfg.image_lsh)],
        ).materialize()
        assignment, n_clusters, n_nodes = attach_clusters(
            collapsed, edges, cfg, n_parts
        )
    return DedupResult(
        assignment=assignment.materialize(),
        edges=edges,
        n_clusters_with_dups=n_clusters,
        n_nodes_clustered=n_nodes,
        signatures=kept_sigs,  # (image_id, dsig) in this pipeline
    )


def tile_dup_pairs(
    images: rd.Dataset,
    tau: int = 2,
    k_min: int = 3,
    concurrency=(1, 8),
    broadcast_sig_limit: int | None = None,
    lsh_cfg: LSHConfig | None = None,
    pair_full_threshold: int | None = None,
    exact_identical_pairs_cap: int | None = None,
    first_band_only: bool = False,
) -> rd.Dataset:
    """Crop/occlusion-robust image near-dup pairs: a pair is a dup iff
    ≥ ``k_min`` of the 4 quadrant hashes (stages/multimodal.TilePhash)
    are within Hamming ``tau``.  The global DCT hash drifts unboundedly
    under a localized edit (logo overlay, caption bar, occlusion) since
    every coefficient sees every pixel; a quadrant edit perturbs only
    the tiles it covers, so the untouched tiles still collide —
    tests/test_tilephash.py plants one-quadrant edits that the global
    hash misses at τ=6 and this operator finds exactly.

    Candidates band each tile as its own LSH space (default 4 blocks
    choose 2 → 6 bands of 32-bit keys per tile, pigeonhole recall 1.0
    for any tile ≤ τ ≤ 2; a qualifying pair has ≥ k_min ≥ 1 such
    tiles), via the flagship's broadcast-band machinery over the
    collected narrow signature table — bounded by BROADCAST_SIG_LIMIT
    like the flagship's direct regime.  Above the limit the SAME
    per-tile spaces ride the flagship's distributed banding (narrow
    sig repartition → one band-bucket groupby with fused per-space
    Hamming verify → one (a,b) groupby counting distinct agreeing
    tiles): by the pigeonhole bound a tile within τ ALWAYS collides
    in ≥1 of its bands, so "pair verified in space t" ⟺ "tile t
    within τ" and the distinct-space count IS n_tiles_close — the two
    regimes emit identical pairs (equivalence-tested by forcing
    ``broadcast_sig_limit=0``).

    Pair-enumeration recall: full C(g,2) pairs are emitted for any
    band bucket up to ``pair_full_threshold`` members (default
    lsh.OVERSIZED_EXACT_CAP = 4096 — tiles with constant content,
    e.g. letterbox bars or blank document corners, produce huge
    identical-sig buckets, and unlike the clustering pipelines there
    is no exact-collapse upstream to absorb them, so this operator
    needs a much larger full-pair threshold than the clustering
    default of 256).  PAST the threshold, identical-sig runs still
    enumerate their exact C(r,2) pairs up to
    ``exact_identical_pairs_cap`` pairs per run (default
    lsh.EXACT_IDENTICAL_PAIRS_CAP ≈ 16.7M ⇔ ~5800 identical members
    — round-4 verdict item 4: a pairs-emitting operator must not
    silently undercount), degrading to the connectivity chain with a
    loud log only beyond that bound; distinct-sig heads keep lsh.py's
    triu/star scheme."""
    from ..stages.lsh import EXACT_IDENTICAL_PAIRS_CAP, OVERSIZED_EXACT_CAP
    from ..stages.multimodal import tile_signatures

    if not 1 <= k_min <= 4:
        raise ValueError(f"k_min must be in 1..4, got {k_min}")
    cfg = lsh_cfg or LSHConfig(n_blocks=4, combo_m=2, hamming_tau=tau)
    if tau > cfg.n_blocks - cfg.combo_m:
        raise ValueError(
            f"tau={tau} exceeds the banding's pigeonhole bound "
            f"{cfg.n_blocks - cfg.combo_m}; recall would drop below 1.0"
        )
    limit = BROADCAST_SIG_LIMIT if broadcast_sig_limit is None else broadcast_sig_limit
    sigs = tile_signatures(images, concurrency=concurrency).materialize()
    n = sigs.count()
    threshold = (
        OVERSIZED_EXACT_CAP if pair_full_threshold is None else pair_full_threshold
    )
    id_cap = (
        EXACT_IDENTICAL_PAIRS_CAP
        if exact_identical_pairs_cap is None else exact_identical_pairs_cap
    )
    if n > limit:
        import logging

        logging.getLogger(__name__).info(
            "tile_dup_pairs: %d rows exceed broadcast_sig_limit=%d; "
            "using the distributed banding regime", n, limit,
        )
        return _tile_pairs_distributed(
            sigs, n, tau, k_min, cfg, threshold, exact_identical_cap=id_cap,
            first_band_only=first_band_only,
        )
    ids, arrs, ai, bi = _tile_candidates(
        sigs.to_pandas(), tau, cfg, threshold, exact_identical_cap=id_cap
    )
    return rd.from_arrow(_tile_verify(arrs, ids, ai, bi, tau, k_min))


_EMPTY_TILE_PAIRS = pa.table(
    {
        "a": pa.array([], type=pa.string()),
        "b": pa.array([], type=pa.string()),
        "n_tiles_close": pa.array([], type=pa.int64()),
    }
)


def _tile_pairs_distributed(
    sigs: rd.Dataset,
    n: int,
    tau: int,
    k_min: int,
    cfg: LSHConfig,
    pair_full_threshold: int,
    n_parts: int | None = None,
    exact_identical_cap: int = 0,
    first_band_only: bool = False,
) -> rd.Dataset:
    """Cluster-scale regime of tile_dup_pairs: the 4 tile columns band
    as 4 LSH spaces through ONE bucket groupby with fused per-space
    Hamming verify (the flagship's dup_edges shape), then ONE hashed
    (a, b) groupby dedups band multiplicity per space and counts the
    distinct agreeing tiles.  Narrow rows only; nothing collects."""
    from ..stages.base import map_groups_typed
    from ..stages.lsh import candidate_pairs, make_band_expander

    import itertools as _it

    n_bands = 4 * sum(1 for _ in _it.combinations(range(cfg.n_blocks), cfg.combo_m))
    band_parts = int(min(65536, max(256, (n * n_bands) // 8192)))
    cpus = int(ray.cluster_resources().get("CPU", 32))
    spaces = [(t, f"t{t}", cfg) for t in range(4)]
    bands = sigs.repartition(max(32, cpus)).map_batches(
        make_band_expander(spaces, id_col="image_id", n_parts=band_parts),
        batch_format="pyarrow",
    )
    verified = candidate_pairs(
        bands,
        pair_full_threshold=pair_full_threshold,
        taus={t: tau for t in range(4)},
        exact_identical_cap=exact_identical_cap,
        # per-tile-space first-band emission (opt-in, same caveat as
        # dup_edges): the (a,b,space) dedupe groupby sees one row per
        # colliding SPACE instead of up to 6 per space — n_tiles_close
        # (distinct-space count) is unchanged
        first_band_cfgs=(
            {t: cfg for t in range(4)} if first_band_only else None
        ),
    )
    pair_parts = choose_n_parts(n)

    def add_part(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        import pandas as pd

        key = pd.util.hash_array(
            np.char.add(np.char.add(a.astype(str), "\x00"), b.astype(str))
        )
        part = (key % np.uint64(pair_parts)).astype(np.int32)
        return pa.table(
            {
                "a": batch["a"],
                "b": batch["b"],
                "space": batch["space"],
                "part": pa.array(part, type=pa.int32()),
            }
        )

    def count_tiles(group: pa.Table) -> pa.Table:
        a = group["a"].to_numpy(zero_copy_only=False).astype(object)
        b = group["b"].to_numpy(zero_copy_only=False).astype(object)
        sp = group["space"].to_numpy(zero_copy_only=False)
        # dedupe (a, b, space) band multiplicity, then count distinct
        # spaces per pair — one factorize + lexsort, no Python loops
        import pandas as pd

        # exact pair identity: factorize the joined id strings (a u64
        # hash here would let a collision merge two distinct pairs)
        codes, _ = pd.factorize(
            np.char.add(np.char.add(a.astype(str), "\x00"), b.astype(str))
        )
        comp = codes.astype(np.int64) * 8 + sp.astype(np.int64)
        uniq = np.unique(comp)
        pair_code = uniq // 8
        heads = np.ones(len(uniq), dtype=bool)
        heads[1:] = pair_code[1:] != pair_code[:-1]
        counts = np.diff(np.append(np.flatnonzero(heads), len(uniq)))
        keep_pair = counts >= k_min
        if not keep_pair.any():
            return _EMPTY_TILE_PAIRS
        # map each comp value back to one representative input row
        order = np.argsort(comp, kind="stable")
        comp_sorted = comp[order]
        firsts = np.ones(len(comp_sorted), dtype=bool)
        firsts[1:] = comp_sorted[1:] != comp_sorted[:-1]
        first_rows = order[firsts]  # one row per distinct (pair, space)
        head_rows = first_rows[heads]  # one row per distinct pair
        sel = head_rows[keep_pair]
        return pa.table(
            {
                "a": pa.array(a[sel], type=pa.string()),
                "b": pa.array(b[sel], type=pa.string()),
                "n_tiles_close": pa.array(
                    counts[keep_pair], type=pa.int64()
                ),
            }
        )

    parted = verified.map_batches(add_part, batch_format="pyarrow")
    return map_groups_typed(parted, "part", count_tiles, _EMPTY_TILE_PAIRS)


def _tile_candidates(
    df, tau: int, cfg: LSHConfig, pair_full_threshold: int,
    exact_identical_cap: int = 0,
):
    """Shared candidate half of the tile near-dup (collected pandas
    signature frame → (ids, per-tile sig arrays, ai, bi) index pairs)
    — used by tile_dup_pairs and by the oracle-staging query so the
    candidate configuration cannot drift between them."""
    ids = df["image_id"].to_numpy(dtype=object)
    arrs = {
        t: df[f"t{t}"].to_numpy().astype(np.int64).view(np.uint64)
        for t in range(4)
    }
    ai, bi = broadcast_candidate_edges(
        arrs,
        [(t, cfg) for t in range(4)],
        taus={t: tau for t in range(4)},
        pair_full_threshold=pair_full_threshold,
        exact_identical_cap=exact_identical_cap,
    )
    return ids, arrs, ai, bi


def _tile_verify(arrs, ids, ai, bi, tau: int, k_min: int) -> pa.Table:
    """Shared verify tail of the tile near-dup: count tiles within
    Hamming ``tau`` per candidate index pair, keep ≥ ``k_min``, emit
    canonical (a < b) id pairs — used by tile_dup_pairs and by the
    oracle-staging query so the two cannot drift."""
    empty = pa.table(
        {
            "a": pa.array([], type=pa.string()),
            "b": pa.array([], type=pa.string()),
            "n_tiles_close": pa.array([], type=pa.int64()),
        }
    )
    if len(ai) == 0:
        return empty
    close = np.zeros(len(ai), dtype=np.int64)
    for t in range(4):
        close += (hamming64(arrs[t][ai], arrs[t][bi]) <= tau).astype(np.int64)
    keep = close >= k_min
    if not keep.any():
        return empty
    a_ids, b_ids = ids[ai[keep]], ids[bi[keep]]
    swap = a_ids > b_ids
    a_ids[swap], b_ids[swap] = b_ids[swap], a_ids[swap]
    return pa.table(
        {
            "a": pa.array(a_ids, type=pa.string()),
            "b": pa.array(b_ids, type=pa.string()),
            "n_tiles_close": pa.array(close[keep], type=pa.int64()),
        }
    )


def _attach_by_own_id(sigs: rd.Dataset, label_df) -> rd.Dataset:
    """Attach cluster ids when nodes ARE image ids (direct regime)."""
    import pandas as pd

    label_ref = ray.put(
        pd.Series(
            label_df["label"].to_numpy(), index=label_df["node"].to_numpy()
        )
    )

    def attach(batch: pa.Table) -> pa.Table:
        lm = ray.get(label_ref)
        ids = pd.Series(batch["image_id"].to_numpy(zero_copy_only=False))
        cluster = ids.map(lm).fillna(ids).to_numpy(dtype=object)
        return pa.table(
            {
                "image_id": batch["image_id"],
                "cluster_id": pa.array(cluster, type=pa.string()),
                "is_representative": pa.array(
                    ids.to_numpy(dtype=object) == cluster
                ),
            }
        )

    return sigs.select_columns(["image_id"]).map_batches(
        attach, batch_format="pyarrow"
    )


def _attach_with_label_df(collapsed: rd.Dataset, label_df) -> rd.Dataset:
    """Broadcast the (node → cluster label) map and attach per batch
    (vectorized pandas dict-map, no per-row Python)."""
    import pandas as pd

    label_ref = ray.put(
        pd.Series(
            label_df["label"].to_numpy(), index=label_df["node"].to_numpy()
        )
    )

    def attach(batch: pa.Table) -> pa.Table:
        lm = ray.get(label_ref)
        rep = pd.Series(batch["rep_id"].to_numpy(zero_copy_only=False))
        cluster = rep.map(lm).fillna(rep).to_numpy(dtype=object)
        ids = batch["image_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "image_id": batch["image_id"],
                "cluster_id": pa.array(cluster, type=pa.string()),
                "is_representative": pa.array(ids == cluster),
            }
        )

    return collapsed.select_columns(["image_id", "rep_id"]).map_batches(
        attach, batch_format="pyarrow"
    )


def attach_clusters(
    collapsed: rd.Dataset,
    edges: rd.Dataset,
    cfg: DedupConfig = DEFAULT_CONFIG,
    n_parts: int = 64,
    broadcast_limit: int | None = None,
    compute_n_clusters: bool = True,
) -> tuple[rd.Dataset, int, int]:
    """Cluster the verified edges and attach cluster ids to every row.

    The verified edge set is tiny relative to the input (only near-dup
    pairs): below BROADCAST_LIMIT run union-find on the driver (one
    collect, zero extra shuffles); above it, the distributed min-label-
    propagation rounds + a hash ``Dataset.join`` take over
    (``broadcast_limit=0`` forces that path — equivalence-tested in
    tests/test_pipeline.py)."""
    limit = BROADCAST_LIMIT if broadcast_limit is None else broadcast_limit
    n_edges = edges.count()
    labels = None
    if n_edges <= limit:
        from ..stages.cluster import unionfind_driver

        label_df = unionfind_driver(edges.to_pandas())
        n_nodes = len(label_df)
    else:  # cluster-scale path
        labels = connected_components(edges, cfg.max_cluster_rounds, n_parts)
        n_nodes = labels.count()
        label_df = labels.to_pandas() if n_nodes <= limit else None

    if label_df is not None:
        assignment = _attach_with_label_df(collapsed, label_df)
    else:  # exercised at cluster scale (>BROADCAST_LIMIT labels)
        joined = collapsed.select_columns(["image_id", "rep_id"]).join(
            labels.map_batches(
                lambda t: t.rename_columns(["rep_id", "label"]),
                batch_format="pyarrow",
            ),
            join_type="left_outer",
            num_partitions=n_parts,
            on=("rep_id",),
        )

        def finish(batch: pa.Table) -> pa.Table:
            # vectorized: cluster = label, falling back to rep_id for
            # rows whose rep has no verified edge (no join match)
            cluster = pc.coalesce(
                batch["label"].cast(pa.string()), batch["rep_id"].cast(pa.string())
            )
            return pa.table(
                {
                    "image_id": batch["image_id"],
                    "cluster_id": cluster,
                    "is_representative": pc.equal(
                        batch["image_id"].cast(pa.string()), cluster
                    ),
                }
            )

        assignment = joined.map_batches(finish, batch_format="pyarrow")

    if not compute_n_clusters:  # callers that discard the metric
        return assignment, -1, n_nodes  # (dedup_docs; review finding)
    # n_clusters = distinct cluster ids among NON-representative rows —
    # one regime-independent definition (the label-set count missed
    # collapse-only exact-dup clusters in the distributed regime, so the
    # CLI metrics differed between regimes and across a resume)
    assignment = assignment.materialize()
    n_clusters = _count_distinct_clusters(assignment)
    return assignment, n_clusters, n_nodes


# Per-block-unique cluster-id rows collected for the exact distinct
# count before falling back to the groupby path (strings ≈ 20 B → the
# bound is ~1 GB of driver ids; the r5 part-count sweep measured the
# groupby alternative at 5.7-6.7 s for a metric scalar).
NCLUSTERS_COLLECT_LIMIT = 50_000_000


def _count_distinct_clusters(assignment: rd.Dataset) -> int:
    """Exact count of distinct ``cluster_id`` among non-representative
    rows: per-block unique partials stream to the driver (bounded by
    NCLUSTERS_COLLECT_LIMIT) for one np.unique; past the bound the
    distributed groupby-count path runs instead (equivalence-tested in
    tests/test_pipeline.py by forcing the bound to 0)."""
    def block_unique(t: pa.Table) -> pa.Table:
        nr = t.filter(pc.invert(t["is_representative"]))
        return pa.table({"cluster_id": pc.unique(nr["cluster_id"])})

    partials = assignment.map_batches(block_unique, batch_format="pyarrow")
    collected: list = []
    total = 0
    for bt in partials.iter_batches(batch_format="pyarrow", batch_size=None):
        total += bt.num_rows
        if total > NCLUSTERS_COLLECT_LIMIT:
            return (
                partials.groupby("cluster_id").count().count()
            )
        collected.append(bt["cluster_id"].to_numpy(zero_copy_only=False))
    if not collected:
        return 0
    return int(len(np.unique(np.concatenate(collected))))


def _edge_shard_fns(
    collapsed: rd.Dataset, cfg: DedupConfig, n_shards: int
) -> tuple[list, str]:
    """Deterministic band-partition-range shards of the dup_edges
    computation (round-4 verdict item 8: at 10^12 rows the band +
    verify pass is hours long, so `edges` needs the same per-shard
    resume granularity signatures already have).

    Shard i delegates to :func:`dup_edges` with a contiguous
    ``part_range`` and ``candidates_only=True`` — ONE banding code
    path for the sharded and unsharded stages, so they cannot drift.
    Band keys are a pure function of the signatures, so the
    decomposition is deterministic w.r.t. (collapsed, band_parts,
    n_shards); the fingerprint suffix pins band_parts so a rep-count
    change can't silently mix decompositions.  The caller runs the
    global dedupe over the shard union (cheap relative to the banding
    it skips on resume)."""
    _, _, band_parts = _band_plan(collapsed, cfg)
    bounds = np.linspace(0, band_parts, num=max(1, n_shards) + 1, dtype=np.int64)

    def make_fn(lo: int, hi: int):
        def fn() -> rd.Dataset:
            return dup_edges(
                collapsed, cfg, part_range=(lo, hi), candidates_only=True
            )

        return fn

    fns = [
        make_fn(int(lo), int(hi))
        for lo, hi in zip(bounds[:-1], bounds[1:])
        if hi > lo
    ]
    return fns, f"bandparts={band_parts}"


def _signature_shard_fns(table_path: str, cfg: DedupConfig, n_shards: int):
    """Deterministic row-group-range shards of one Parquet file, each
    producing its slice of the signature table (used by the per-shard
    checkpointing paths)."""
    import pyarrow.parquet as pq

    n_rg = pq.ParquetFile(table_path).metadata.num_row_groups
    groups = np.array_split(np.arange(n_rg), max(1, min(n_shards, n_rg)))

    def make_fn(rgs):
        def fn():
            tbl = pq.ParquetFile(table_path).read_row_groups(
                [int(r) for r in rgs],
                columns=["image_id", "caption", "phash"],
            )
            return signatures(rd.from_arrow(tbl), cfg)

        return fn

    return [make_fn(rgs) for rgs in groups if len(rgs)]


def dedup_images_checkpointed(
    images: rd.Dataset,
    ckpt_dir: str,
    cfg: DedupConfig = DEFAULT_CONFIG,
    n_parts: int | None = None,
    input_fingerprint: str = "",
    table_path: str | None = None,
    signature_shards: int = 0,
    edge_shards: int = 0,
) -> DedupResult:
    """Checkpoint-resumable flagship run: each stage commits a Parquet
    directory + lineage manifest (state/manifest.py); a rerun skips
    committed stages — kill-and-rerun yields identical output
    (SURVEY.md §5.5 resume test).

    With ``table_path`` + ``signature_shards`` > 0, the (dominant)
    signature stage commits PER SHARD — a run killed mid-encode
    resumes at the first uncommitted row-group range instead of
    re-encoding everything (the 100-TB resume granularity)."""
    from ..state.manifest import CheckpointedRun

    if n_parts is None:
        n_parts = choose_n_parts(images.count())
    run = CheckpointedRun(ckpt_dir, cfg.config_hash())
    if table_path and signature_shards > 0:
        sigs = run.sharded_stage(
            "signatures",
            _signature_shard_fns(table_path, cfg, signature_shards),
            input_fingerprint or table_path,
        )
    else:
        sigs = run.stage(
            "signatures", lambda: signatures(images, cfg), input_fingerprint
        )
    collapsed = run.stage(
        "collapsed", lambda: collapse_exact(sigs, n_parts), input_fingerprint
    )
    if edge_shards > 0:
        # per-band-partition-range resume for the (hours-long at 10^12
        # rows) band+verify pass; the global dedupe over the shard
        # union commits as its own (cheap) stage
        from ..stages.cluster import dedupe_edges

        fns, decomp = _edge_shard_fns(collapsed, cfg, edge_shards)
        cand_fp = f"{input_fingerprint}:{decomp}"
        cands = run.sharded_stage("edge_cands", fns, cand_fp)
        edges = run.stage(
            "edges",
            lambda: dedupe_edges(cands.select_columns(["a", "b"]), n_parts),
            cand_fp,
        )
    else:
        edges = run.stage(
            "edges", lambda: dup_edges(collapsed, cfg, n_parts), input_fingerprint
        )
    holder: dict = {}

    def produce_assignment():
        assignment, n_clusters, n_nodes = attach_clusters(
            collapsed, edges, cfg, n_parts
        )
        holder["n_clusters"] = n_clusters
        holder["n_nodes"] = n_nodes
        return assignment

    assignment = run.stage("assignment", produce_assignment, input_fingerprint)
    run.write_metrics()
    if "n_clusters" not in holder:  # assignment stage was resumed
        holder["n_nodes"] = -1  # not recomputed on resume
        holder["n_clusters"] = (
            assignment.filter(expr="is_representative == False")
            .groupby("cluster_id")
            .count()
            .count()  # distributed distinct count — no driver collect
        )
    return DedupResult(
        assignment=assignment,
        edges=edges,
        n_clusters_with_dups=holder["n_clusters"],
        n_nodes_clustered=holder["n_nodes"],
    )


def sharded_signatures_checkpointed(
    table_path: str,
    ckpt_dir: str,
    cfg: DedupConfig = DEFAULT_CONFIG,
    n_shards: int = 8,
):
    """Signature encode with PER-SHARD checkpointing: the input Parquet
    is split into deterministic row-group ranges, each encoded and
    committed (data dir + manifest) independently
    (state/manifest.sharded_stage) — a run killed after k of n shards
    resumes at shard k instead of re-encoding everything.  This is the
    100-TB-regime resume granularity the stage-level manifests of
    ``dedup_images_checkpointed`` cannot give (a signature stage over
    10^12 rows runs for hours).

    Returns (signatures Dataset, CheckpointedRun)."""
    from ..state.manifest import CheckpointedRun

    run = CheckpointedRun(ckpt_dir, cfg.config_hash())
    sigs = run.sharded_stage(
        "signatures",
        _signature_shard_fns(table_path, cfg, n_shards),
        input_fingerprint=table_path,
    )
    return sigs, run


def survivors(
    images: rd.Dataset,
    result: DedupResult,
    n_parts: int = 64,
    broadcast_limit: int | None = None,
) -> rd.Dataset:
    """Semi-join the byte-bearing table down to cluster representatives.

    Ships the small side (non-representative ids) as a broadcast set;
    the wide ``bytes`` rows are filtered in place, never shuffled.
    Above ``broadcast_limit`` dup ids, an inner hash join on the
    representative ids takes over (forced with 0 in tests)."""
    limit = BROADCAST_LIMIT if broadcast_limit is None else broadcast_limit
    dup_ids_ds = result.assignment.filter(expr="is_representative == False")
    n_dups = dup_ids_ds.count()
    if n_dups == 0:  # nothing to drop (an empty Dataset loses its schema)
        return images
    if n_dups <= limit:
        dup_df = dup_ids_ds.select_columns(["image_id"]).to_pandas()
        dup_ref = ray.put(pa.array(dup_df["image_id"], type=pa.string()))

        def keep(batch: pa.Table) -> pa.Table:
            dups = ray.get(dup_ref)
            mask = pc.invert(
                pc.is_in(batch["image_id"].cast(pa.string()), value_set=dups)
            )
            return batch.filter(mask)

        return images.map_batches(keep, batch_format="pyarrow")
    # large-scale path: hash semi-join on image_id
    reps = result.assignment.filter(expr="is_representative == True").select_columns(
        ["image_id"]
    )
    return images.join(
        reps,
        join_type="inner",
        num_partitions=n_parts,
        on=("image_id",),
        aggregator_ray_remote_args={"num_cpus": 0.5},
    )


def planted_pair_recall(
    assignment_df, truth_df
) -> tuple[float, float, int]:
    """Driver-side scoring vs the fixture truth table.

    Returns (dup_pair_recall, cluster_merge_precision, n_truth_pairs):
    recall = fraction of planted same-cluster pairs that the pipeline
    co-clustered; precision = fraction of found co-clustered planted
    pairs that are planted pairs (computed over planted rows only).
    """
    import pandas as pd

    df = truth_df.merge(assignment_df, on="image_id", how="left")
    n_pairs = 0
    n_hit = 0
    for _, grp in df.groupby("cluster_id_x"):
        if len(grp) < 2:
            continue
        n = len(grp)
        n_pairs += n * (n - 1) // 2
        counts = grp.groupby("cluster_id_y").size()
        n_hit += int((counts * (counts - 1) // 2).sum())
    found_pairs = 0
    found_true = 0
    for _, grp in df.groupby("cluster_id_y"):
        if len(grp) < 2:
            continue
        n = len(grp)
        found_pairs += n * (n - 1) // 2
        counts = grp.groupby("cluster_id_x").size()
        found_true += int((counts * (counts - 1) // 2).sum())
    recall = n_hit / n_pairs if n_pairs else 1.0
    precision = found_true / found_pairs if found_pairs else 1.0
    return recall, precision, n_pairs
