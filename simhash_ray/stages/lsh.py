"""Hamming-ball LSH: band expansion → bucket pair generation → verify.

The reference has no candidate-generation machinery (it is a linear
per-record classifier chain, SURVEY.md §2.5); this is the new engine's
design for the north rule's "LSH banding → Hamming verification":

1. ``expand_bands`` (map_batches, stateless): per signature space emit
   C(n_blocks, combo_m) narrow rows ``(id, space, band, key, sig)``.
   Pigeonhole guarantee (config.LSHConfig): any pair within
   ``hamming_tau`` shares at least one exact band key.
2. ``candidate_pairs``: ONE coarse groupby shuffle on a hash partition
   of (space, band, key), then *vectorized* run detection inside each
   partition — pairing logic is numpy over sorted runs, not a Python
   call per bucket (millions of tiny buckets would drown
   ``map_groups`` per-group overhead).
3. ``verify_pairs`` (map_batches, stateless): exact popcount Hamming
   check against the per-space τ.

Skew guard: buckets larger than ``pair_full_threshold``
(config.LSHConfig) skip the all-members C(g,2) expansion.  Identical
sigs are chained (Hamming-0 edges), and the DISTINCT-sig run heads
still get an exact triu up to ``OVERSIZED_EXACT_CAP`` heads — so
cross-sig recall stays 1.0 through the verify unless a single band
bucket holds > OVERSIZED_EXACT_CAP distinct signatures, in which case
a head-star is emitted with a loud warning and a within-τ pair can be
missed ONLY if every band bucket it shares is equally degenerate.
Fallback-path edges are reported in the ``star`` column.
Exact-signature hot keys (the 10%-hot-caption stressor) never reach
here: the pipeline collapses identical (simhash, phash) groups first
(stages/collapse.py).
"""

from __future__ import annotations

import itertools

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..config import LSHConfig
from ..functions.hashing import part_of_ints
from ..simhash import hamming64

TEXT_SPACE, IMAGE_SPACE = 0, 1


def _combos(cfg: LSHConfig) -> list[tuple[int, ...]]:
    return list(itertools.combinations(range(cfg.n_blocks), cfg.combo_m))


def combo_key(sig: np.ndarray, combo: tuple[int, ...], r: int) -> np.ndarray:
    """Band key for one block combination: the concatenated r-bit
    blocks of ``sig`` named by ``combo``.  THE key construction — every
    band producer (expander, broadcast band tasks, incremental probe)
    must call this so keys stay bit-identical across paths."""
    mask = np.uint64((1 << r) - 1)
    key = np.zeros(len(sig), dtype=np.uint64)
    for j, b in enumerate(combo):
        key |= ((sig >> np.uint64(b * r)) & mask) << np.uint64(j * r)
    return key


def band_keys(sig: np.ndarray, cfg: LSHConfig) -> list[np.ndarray]:
    """:func:`combo_key` per band of ``cfg`` (one array per combo)."""
    r = 64 // cfg.n_blocks
    return [combo_key(sig, combo, r) for combo in _combos(cfg)]


def make_band_expander(
    spaces: list[tuple[int, str, LSHConfig]],
    id_col: str = "image_id",
    n_parts: int = 64,
    part_range: tuple[int, int] | None = None,
):
    """Build the map_batches fn: one pass emits band rows for every
    signature space (text simhash + image phash) — a single downstream
    shuffle instead of one per space.

    ``part_range=(lo, hi)`` emits only rows whose coarse partition
    falls in [lo, hi) — the per-shard edge checkpointing path filters
    INSIDE the expander so out-of-range band rows never materialize
    (each shard still computes every key, but ships ~1/n_shards of the
    rows)."""

    plans = []
    for space_id, sig_col, cfg in spaces:
        r = 64 // cfg.n_blocks
        mask = np.uint64((1 << r) - 1)
        combos = _combos(cfg)
        plans.append((space_id, sig_col, r, mask, combos))

    def expand(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        out_id, out_space, out_band, out_key, out_sig = [], [], [], [], []
        for space_id, sig_col, r, mask, combos in plans:
            sig = batch[sig_col].to_numpy(zero_copy_only=False).view(np.uint64)
            n = len(sig)
            blocks = [
                (sig >> np.uint64(b * r)) & mask for b in range(max(c[-1] for c in combos) + 1)
            ] if combos else []
            for band_idx, combo in enumerate(combos):
                key = np.zeros(n, dtype=np.uint64)
                for j, b in enumerate(combo):
                    key |= blocks[b] << np.uint64(j * r)
                out_id.append(ids)
                out_space.append(np.full(n, space_id, dtype=np.int32))
                out_band.append(np.full(n, band_idx, dtype=np.int32))
                out_key.append(key.view(np.int64))
                out_sig.append(sig.view(np.int64))
        space = np.concatenate(out_space)
        band = np.concatenate(out_band)
        key = np.concatenate(out_key)
        part = part_of_ints(n_parts, space.astype(np.int64), band.astype(np.int64), key)
        ids_out = np.concatenate(out_id)
        sig_out = np.concatenate(out_sig)
        if part_range is not None:
            keep = (part >= part_range[0]) & (part < part_range[1])
            ids_out, space, band = ids_out[keep], space[keep], band[keep]
            key, sig_out, part = key[keep], sig_out[keep], part[keep]
        return pa.table(
            {
                "id": pa.array(ids_out, type=pa.string()),
                "space": space,
                "band": band,
                "key": key,
                "sig": sig_out,
                "part": part,
            }
        )

    return expand


# Above ``pair_full_threshold`` members, a bucket's cross-sig pairs are
# still generated EXACTLY (triu over the distinct-sig run heads) up to
# this many distinct sigs — 4096 heads = 8.4M candidate pairs ≈ 0.25 s
# of SWAR popcount, a bounded cost for a pathological bucket.  Beyond
# it the star fallback concedes recall for pairs whose EVERY shared
# band bucket is this degenerate, and a warning is logged.
OVERSIZED_EXACT_CAP = 4096

_oversized_cap_warned = False


# Per-identical-sig-run pair budget for pairs-emitting operators
# (exact_identical_cap): C(g,2) pairs enumerate exactly up to this many
# per run (1<<24 ≈ 16.7M pairs ⇔ g ≈ 5800 identical members, ~270 MB of
# index arrays); past it the run degrades to the connectivity chain
# with a loud warning.  0 (the clustering default) keeps the chain for
# every oversized run — clustering only needs connectivity.
EXACT_IDENTICAL_PAIRS_CAP = 1 << 24

_identical_cap_warned = False


def _oversized_bucket_pairs(
    seg_order: np.ndarray, seg_sig: np.ndarray, exact_identical_cap: int = 0,
    emit_identical: bool = True,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Edges for one oversized (> pair_full_threshold) bucket whose
    members are given sig-sorted: (a) identical-sig runs — Hamming-0
    chains by default (keeps hot masses connected when the caller
    skipped exact-collapse), or, when ``exact_identical_cap`` > 0
    (pairs-emitting operators, round-4 verdict item 4), the EXACT
    C(r,2) triu per run up to that many pairs per run with a
    chain-and-loud-warning fallback beyond; (b) EXACT triu over the
    distinct-sig run heads when there are ≤ OVERSIZED_EXACT_CAP of
    them — cross-sig recall stays 1.0 — else a head-star with a loud
    warning (the only regime where a within-τ pair can be missed, and
    only if every band bucket it shares is equally degenerate).

    Returns (a_idx, b_idx, star): ``star`` is False only for the
    exact identical-sig enumeration (not a fallback), True for chain /
    head-triu / star edges (the observability flag downstream)."""
    g = len(seg_order)
    head = np.ones(g, dtype=bool)
    head[1:] = seg_sig[1:] != seg_sig[:-1]
    a_parts: list[np.ndarray] = []
    b_parts: list[np.ndarray] = []
    star_parts: list[np.ndarray] = []
    if exact_identical_cap > 0 and not emit_identical:
        # identical-sig members share the same key in EVERY band, so a
        # pairs-emitting operator enumerates each run exactly once —
        # from band 0 of its space — instead of n_bands× (the band-0
        # bucket always contains the full run, enumerated exactly
        # there); bands > 0 skip identical runs entirely
        pass
    elif exact_identical_cap > 0:
        starts = np.flatnonzero(head)
        lengths = np.diff(np.append(starts, g))
        sel_runs = lengths >= 2  # skip the length-1 runs in bulk — a
        # Python iteration per distinct sig would dominate degenerate
        # mostly-distinct oversized buckets
        for s, r in zip(starts[sel_runs], lengths[sel_runs]):
            r = int(r)
            n_pairs = r * (r - 1) // 2
            if n_pairs <= exact_identical_cap:
                i, j = np.triu_indices(r, 1)
                a_parts.append(seg_order[s + i])
                b_parts.append(seg_order[s + j])
                star_parts.append(np.zeros(n_pairs, dtype=bool))
            else:
                global _identical_cap_warned
                if not _identical_cap_warned:
                    import logging

                    logging.getLogger(__name__).warning(
                        "identical-sig run of %d members (%d pairs) exceeds "
                        "exact_identical_cap=%d: emitting the connectivity "
                        "chain instead of exact pairs (logged once per "
                        "worker)", r, n_pairs, exact_identical_cap,
                    )
                    _identical_cap_warned = True
                idxs = seg_order[s : s + r]
                a_parts.append(idxs[:-1])
                b_parts.append(idxs[1:])
                star_parts.append(np.ones(r - 1, dtype=bool))
    else:
        chain_b = np.flatnonzero(~head)
        if len(chain_b):
            a_parts.append(seg_order[chain_b - 1])
            b_parts.append(seg_order[chain_b])
            star_parts.append(np.ones(len(chain_b), dtype=bool))
    run_heads = seg_order[head]
    h = len(run_heads)
    if h > 1:
        if h <= OVERSIZED_EXACT_CAP:
            i, j = np.triu_indices(h, 1)
            a_parts.append(run_heads[i])
            b_parts.append(run_heads[j])
            star_parts.append(np.ones(len(i), dtype=bool))
        else:
            global _oversized_cap_warned
            if not _oversized_cap_warned:
                import logging

                logging.getLogger(__name__).warning(
                    "oversized LSH bucket with %d distinct sigs > "
                    "OVERSIZED_EXACT_CAP=%d: falling back to a head-star; "
                    "within-tau pairs confined to such buckets may be "
                    "missed (logged once per worker)",
                    h, OVERSIZED_EXACT_CAP,
                )
                _oversized_cap_warned = True
            a_parts.append(np.full(h - 1, run_heads[0]))
            b_parts.append(run_heads[1:])
            star_parts.append(np.ones(h - 1, dtype=bool))
    if not a_parts:
        return (
            np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, bool)
        )
    return (
        np.concatenate(a_parts),
        np.concatenate(b_parts),
        np.concatenate(star_parts),
    )


def _first_band_lut(cfg: LSHConfig) -> np.ndarray:
    """LUT over block-equality bitmasks → the FIRST band index whose
    combo blocks are all equal (−1 if none — unreachable for a pair
    that actually collided in some bucket).  Powers the opt-in
    first-band pair emission: a pair within τ collides in up to every
    matching band, and emitting it only from its first-colliding band
    removes the ~n_bands× duplication the edge dedupe otherwise pays."""
    combos = _combos(cfg)
    lut = np.full(1 << cfg.n_blocks, -1, dtype=np.int64)
    for mask in range(1 << cfg.n_blocks):
        for bi, combo in enumerate(combos):
            if all((mask >> b) & 1 for b in combo):
                lut[mask] = bi
                break
    return lut


def _block_eq_mask(x: np.ndarray, n_blocks: int) -> np.ndarray:
    """Per-element bitmask of which r-bit blocks of the XOR are zero."""
    r = 64 // n_blocks
    bmask = np.uint64((1 << r) - 1)
    eq = np.zeros(len(x), dtype=np.int64)
    for k in range(n_blocks):
        eq |= (((x >> np.uint64(k * r)) & bmask) == 0).astype(np.int64) << k
    return eq


def make_pair_generator(
    pair_full_threshold: int = 256,
    taus: dict[int, int] | None = None,
    exact_identical_cap: int = 0,
    first_band_cfgs: dict[int, LSHConfig] | None = None,
):
    """Per-coarse-partition pair generation (used via groupby('part')).

    Inside one partition: lexsort by (space, band, key), find runs,
    emit all C(g,2) pairs for runs ≤ ``pair_full_threshold``; larger
    runs get the oversized-bucket treatment (identical-sig chains +
    exact triu over the ≤ ``OVERSIZED_EXACT_CAP`` distinct-sig run
    heads, star + warning beyond — see the module docstring for the
    precise recall guarantee; same scheme as
    ``broadcast_candidate_edges``).  The fallback-path edges are
    visible in the ``star`` column for observability.

    When ``taus`` is given (space → Hamming τ), verification is FUSED
    into pair generation — the popcount check runs on the in-partition
    numpy arrays and only surviving edges leave the stage (one fewer
    operator, no unverified-pair traffic).  Any space id present in
    the band rows MUST have a τ entry (validated; a silent default of
    0 would discard every pair of that space).

    ``first_band_cfgs`` (space → LSHConfig; OPT-IN, default off): emit
    each exactly-enumerated pair only from its FIRST-colliding band —
    the pair's block-equality mask + a per-space LUT decide locally,
    no coordination.  Removes the ~n_bands× duplicate-pair volume the
    downstream dedupe otherwise shuffles (the 100-TB lever; A/B in
    BASELINE.md).  Exactness caveat, which is why it is opt-in: a
    within-τ pair whose FIRST-colliding band bucket exceeded
    OVERSIZED_EXACT_CAP distinct sigs (star regime) is not enumerated
    there, and with the filter on, later small buckets skip it too —
    the default path's guarantee ("missed only if EVERY shared bucket
    is degenerate") weakens to "missed if the FIRST shared bucket is
    degenerate".  Fallback (star=True) edges are never filtered, so
    cluster CONNECTIVITY of hot masses is unaffected either way."""
    tau_arr = None
    if taus is not None:
        tau_arr = np.full(max(taus) + 1, -1, dtype=np.int64)
        for k, v in taus.items():
            tau_arr[k] = v
    fb_luts = None
    if first_band_cfgs is not None:
        fb_luts = {
            sp: (_first_band_lut(c), c.n_blocks)
            for sp, c in first_band_cfgs.items()
        }

    def pairs(group: pa.Table) -> pa.Table:
        ids = np.asarray(group["id"].to_numpy(zero_copy_only=False), dtype=object)
        space = group["space"].to_numpy(zero_copy_only=False)
        band = group["band"].to_numpy(zero_copy_only=False)
        key = group["key"].to_numpy(zero_copy_only=False)
        sig = group["sig"].to_numpy(zero_copy_only=False)
        order = np.lexsort((key, band, space))
        space, band, key = space[order], band[order], key[order]
        ids, sig = ids[order], sig[order]
        n = len(ids)
        if n == 0:
            return _EMPTY_PAIRS
        new_run = np.ones(n, dtype=bool)
        new_run[1:] = (
            (space[1:] != space[:-1]) | (band[1:] != band[:-1]) | (key[1:] != key[:-1])
        )
        starts = np.flatnonzero(new_run)
        lengths = np.diff(np.append(starts, n))
        a_idx: list[np.ndarray] = []
        b_idx: list[np.ndarray] = []
        star_flags: list[np.ndarray] = []
        # Vectorized by distinct run length: collision runs are
        # overwhelmingly g==2 (each near-dup pair re-collides in up to
        # every band) — a Python loop per run costs ~70 CPU-seconds per
        # 400k-row input; one triu template per distinct g costs ~none.
        sel = lengths >= 2
        full_sel = sel & (lengths <= pair_full_threshold)
        for g in np.unique(lengths[full_sel]):
            runs = starts[full_sel & (lengths == g)]
            i, j = np.triu_indices(int(g), 1)
            a_idx.append((runs[:, None] + i[None, :]).ravel())
            b_idx.append((runs[:, None] + j[None, :]).ravel())
        if a_idx:
            n_full = sum(len(x) for x in a_idx)
            star_flags.append(np.zeros(n_full, dtype=bool))
        for s, g in zip(
            starts[sel & ~full_sel], lengths[sel & ~full_sel]
        ):  # rare oversized buckets — see _oversized_bucket_pairs
            g = int(g)
            seg_order = np.argsort(sig[s : s + g], kind="stable") + s
            seg_sig = sig[seg_order]
            oa, ob, ostar = _oversized_bucket_pairs(
                seg_order, seg_sig, exact_identical_cap,
                emit_identical=(int(band[s]) == 0),
            )
            if len(oa):
                a_idx.append(oa)
                b_idx.append(ob)
                star_flags.append(ostar)
        if not a_idx:
            return _EMPTY_PAIRS
        ai = np.concatenate(a_idx)
        bi = np.concatenate(b_idx)
        stars = np.concatenate(star_flags)
        if tau_arr is not None:  # fused Hamming verification
            sp = space[ai]
            if len(sp) and (sp.max() >= len(tau_arr) or tau_arr[sp].min() < 0):
                raise ValueError(
                    f"make_pair_generator: band rows contain space ids "
                    f"{sorted(set(sp.tolist()) - set(np.flatnonzero(tau_arr >= 0).tolist()))} "
                    f"with no taus entry"
                )
            d = hamming64(
                sig[ai].view(np.uint64), sig[bi].view(np.uint64)
            )
            keep = d <= tau_arr[sp]
            ai, bi, stars = ai[keep], bi[keep], stars[keep]
            if len(ai) == 0:
                return _EMPTY_PAIRS
        if fb_luts is not None and len(ai):
            # opt-in first-band emission: keep an exactly-enumerated
            # (star=False) pair only when THIS band is the first whose
            # combo blocks all agree; fallback edges pass untouched
            sp = space[ai]
            bd = band[ai]
            x = sig[ai].view(np.uint64) ^ sig[bi].view(np.uint64)
            keep = np.ones(len(ai), dtype=bool)
            for s_id, (lut, n_blocks) in fb_luts.items():
                m = (sp == s_id) & ~stars
                if not m.any():
                    continue
                eq = _block_eq_mask(x[m], n_blocks)
                keep[m] = lut[eq] == bd[m]
            ai, bi, stars = ai[keep], bi[keep], stars[keep]
            if len(ai) == 0:
                return _EMPTY_PAIRS
        a, b = ids[ai], ids[bi]
        swap = a > b
        a[swap], b[swap] = b[swap], a[swap]
        sa, sb = sig[ai].copy(), sig[bi].copy()
        sa[swap], sb[swap] = sig[bi][swap], sig[ai][swap]
        return pa.table(
            {
                "a": pa.array(a, type=pa.string()),
                "b": pa.array(b, type=pa.string()),
                "sig_a": pa.array(sa, type=pa.int64()),
                "sig_b": pa.array(sb, type=pa.int64()),
                "space": pa.array(space[ai], type=pa.int32()),
                "star": pa.array(stars, type=pa.bool_()),
            }
        )

    return pairs


_EMPTY_PAIRS = pa.table(
    {
        "a": pa.array([], type=pa.string()),
        "b": pa.array([], type=pa.string()),
        "sig_a": pa.array([], type=pa.int64()),
        "sig_b": pa.array([], type=pa.int64()),
        "space": pa.array([], type=pa.int32()),
        "star": pa.array([], type=pa.bool_()),
    }
)


def broadcast_candidate_edges(
    sig_arrays: dict[int, "np.ndarray"],
    spaces: list[tuple[int, LSHConfig]],
    taus: dict[int, int],
    pair_full_threshold: int = 256,
    exact_identical_cap: int = 0,
):
    """Shuffle-free candidate generation for the post-collapse regime.

    After exact-signature collapse the distinct-signature table is tiny
    (16 bytes/row) — when it fits comfortably in memory, replicating it
    beats an all-to-all: the signature arrays are ``ray.put`` ONCE and
    one Ray task per (space, band) extracts its band key, argsorts,
    pair-generates and Hamming-verifies locally, returning int64 INDEX
    pairs (a few KB).  No groupby, no sort shuffle, no driver-side
    coordination beyond a concat + unique.

    This is the same broadcast-small-side principle as the ray_guide's
    join pattern; the distributed ``candidate_pairs`` groupby remains
    the path for when distinct signatures outgrow memory (the caller
    picks by row count — see pipelines/dedup_images.py).

    Returns (ai, bi): deduplicated int64 index arrays (ai < bi).
    """
    import ray

    for sp, arr in sig_arrays.items():
        # the dedupe below packs (ai << 32) | bi into one u64 — only
        # valid when indices fit 32 bits (the caller gates this path at
        # BROADCAST_SIG_LIMIT ≪ 2^32; assert so a future caller can't
        # silently corrupt edges)
        if len(arr) >= 1 << 32:
            raise ValueError(
                f"broadcast_candidate_edges: space {sp} has {len(arr)} "
                "rows >= 2^32; use the distributed candidate_pairs path"
            )
    refs = {sp: ray.put(arr.astype(np.uint64)) for sp, arr in sig_arrays.items()}

    # num_cpus=2: the kernel (u64 sorts + pair gathers) is memory-
    # bandwidth-bound — measured on 28 bands × 1M sigs, 8 concurrent
    # tasks beat 28 concurrent by 1.6×; reserving 2 CPUs/task caps
    # concurrency near the bandwidth sweet spot at every cluster size.
    @ray.remote(num_cpus=2)
    def band_task(sig_ref, combo, r, tau, band_idx):
        sig = sig_ref
        key = combo_key(sig, combo, r)
        order = np.lexsort((sig, key))
        k = key[order]
        sig_sorted = sig[order]
        new_run = np.ones(len(k), dtype=bool)
        new_run[1:] = k[1:] != k[:-1]
        starts = np.flatnonzero(new_run)
        lengths = np.diff(np.append(starts, len(k)))
        a_idx, b_idx = [], []
        sel = lengths >= 2
        full_sel = sel & (lengths <= pair_full_threshold)
        for g in np.unique(lengths[full_sel]):
            runs = starts[full_sel & (lengths == g)]
            i, j = np.triu_indices(int(g), 1)
            a_idx.append((runs[:, None] + i[None, :]).ravel())
            b_idx.append((runs[:, None] + j[None, :]).ravel())
        # Oversized buckets: identical-sig chains + exact triu over the
        # distinct-sig run heads (star + warning above
        # OVERSIZED_EXACT_CAP) — shared kernel with make_pair_generator
        # so the direct and distributed regimes cannot diverge.
        for s, g in zip(starts[sel & ~full_sel], lengths[sel & ~full_sel]):
            idx = np.arange(s, s + int(g))
            oa, ob, _ = _oversized_bucket_pairs(
                idx, sig_sorted[s : s + int(g)], exact_identical_cap,
                emit_identical=(band_idx == 0),
            )
            if len(oa):
                a_idx.append(oa)
                b_idx.append(ob)
        if not a_idx:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        ai = order[np.concatenate(a_idx)]
        bi = order[np.concatenate(b_idx)]
        d = hamming64(sig[ai], sig[bi])
        keep = d <= tau
        ai, bi = ai[keep], bi[keep]
        lo = np.minimum(ai, bi)
        hi = np.maximum(ai, bi)
        return lo.astype(np.int64), hi.astype(np.int64)

    futures = []
    for space_id, cfg in spaces:
        r = 64 // cfg.n_blocks
        for band_idx, combo in enumerate(_combos(cfg)):
            futures.append(
                band_task.remote(
                    refs[space_id], combo, r, taus[space_id], band_idx
                )
            )
    parts = ray.get(futures)
    if not parts:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    ai = np.concatenate([p[0] for p in parts])
    bi = np.concatenate([p[1] for p in parts])
    if len(ai) == 0:
        return ai, bi
    packed = np.unique((ai.astype(np.uint64) << np.uint64(32)) | bi.astype(np.uint64))
    return (packed >> np.uint64(32)).astype(np.int64), (
        packed & np.uint64(0xFFFFFFFF)
    ).astype(np.int64)


def make_verifier(taus: dict[int, int]):
    """map_batches fn: exact Hamming verification per signature space.
    Every space id appearing in the pairs MUST have a τ entry —
    validated per batch (a silent default of 0 would discard every
    pair of an unlisted space)."""
    tau_arr = np.full(max(taus) + 1, -1, dtype=np.int64)
    for k, v in taus.items():
        tau_arr[k] = v

    def verify(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        d = hamming64(
            batch["sig_a"].to_numpy(zero_copy_only=False).view(np.uint64),
            batch["sig_b"].to_numpy(zero_copy_only=False).view(np.uint64),
        )
        space = batch["space"].to_numpy(zero_copy_only=False)
        if space.max() >= len(tau_arr) or tau_arr[space].min() < 0:
            raise ValueError(
                "make_verifier: pairs contain space ids with no taus entry"
            )
        keep = d <= tau_arr[space]
        return batch.filter(pa.array(keep))

    return verify


def candidate_pairs(
    band_rows: rd.Dataset,
    pair_full_threshold: int = 256,
    taus: dict[int, int] | None = None,
    shuffle_blocks: int | None = None,
    exact_identical_cap: int = 0,
    first_band_cfgs: dict[int, LSHConfig] | None = None,
) -> rd.Dataset:
    """ONE all-to-all shuffle (coarse hash partition) → vectorized
    within-partition bucket pairing (+ fused verify when taus given).

    ``shuffle_blocks``: Ray's sort-based shuffle runs one map task per
    input block — a handful of 128 MiB blocks serializes the whole
    exchange.  Prefer repartitioning the NARROW pre-band table on the
    caller side (pipelines/dedup_images.dup_edges does: moving 24 B/row
    beats moving the 43×-larger band table) and leave this None; pass
    a block count only when the input arrives as a few huge blocks."""
    if shuffle_blocks:
        band_rows = band_rows.repartition(shuffle_blocks)
    from .base import map_groups_typed

    return map_groups_typed(
        band_rows, "part",
        make_pair_generator(
            pair_full_threshold, taus, exact_identical_cap, first_band_cfgs
        ),
        _EMPTY_PAIRS,
    )
