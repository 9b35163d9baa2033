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


def _run_bench() -> dict:
    import logging

    import ray

    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
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

    def run_flagship():
        images = read_images(columns=["image_id", "caption", "phash"])
        res = flagship.dedup_images(
            images, DEFAULT_CONFIG, broadcast_sig_limit=headline_limit
        )
        return res.assignment.count()

    n_assigned = timed("e2e_dedup", run_flagship)
    assert n_assigned == n_images, (n_assigned, n_images)
    if not os.environ.get("GRAFT_BENCH_ONESHOT"):  # min-of-2 by default
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
        from simhash_ray.pipelines.queries import q_events_asof, q_events_range_join

        timed("events_asof", lambda: q_events_asof(sf_dir).count())
        timed("events_range_join", lambda: q_events_range_join(sf_dir).count())
        vecs = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
        timed(
            "embed_dup_pairs_lsh",
            lambda: lsh_cosine_dup_pairs(vecs, 2, 5, n_parts=16).count(),
        )
        from simhash_ray.pipelines.queries import q_doc_decontaminate

        timed("doc_decontaminate", lambda: q_doc_decontaminate(sf_dir).count())

        # incremental ingest: fold a 20% shard into the deduped 80%
        # base; the base run + its signatures are the pre-existing
        # corpus state, so they stay OUTSIDE the timed region
        from simhash_ray.pipelines.dedup_incremental import (
            dedup_images_incremental,
        )

        import numpy as _np
        import pyarrow as _pa

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
        base_res = flagship.dedup_images(base, DEFAULT_CONFIG)
        base_sigs = flagship.signatures(base, DEFAULT_CONFIG).materialize()
        n_shard = shard.count()
        timed(
            "incremental_ingest",
            lambda: dedup_images_incremental(
                shard, base_sigs, base_res.assignment
            ).assignment_new.count(),
        )
        timings["incremental_images_per_sec"] = round(
            n_shard / timings["incremental_ingest"], 1
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
    }
    ray.shutdown()
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
                }
            )
        )
    else:
        print(json.dumps(_run_bench()))


if __name__ == "__main__":
    main()
