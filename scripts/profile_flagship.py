"""Per-stage wall-time profile of the flagship pipeline.

Usage: RAY_GRAFT_CPUS=8 python scripts/profile_flagship.py [sf_dir]
Prints one JSON line of stage → seconds — the feedback loop for the
scaling-efficiency work (BASELINE.md)."""

import json
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray


def main():
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        logging_level="ERROR",
    )
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from simhash_ray.config import DEFAULT_CONFIG
    from simhash_ray.fixtures import FixtureSpec, default_fixture_dir, write_fixture
    from simhash_ray.pipelines import dedup_images as fl
    from simhash_ray.pipelines.queries import read_images_fixture
    from simhash_ray.sources.tables import read_table
    from simhash_ray.stages.collapse import collapse_exact

    t = {}

    def mark(name, t0):
        t[name] = round(time.perf_counter() - t0, 2)
        return time.perf_counter()

    cfg = DEFAULT_CONFIG
    t0 = time.perf_counter()
    rows_env = os.environ.get("GRAFT_BENCH_ROWS")
    if rows_env:
        spec = FixtureSpec(n_rows=int(rows_env), seed=42, sizes=(32,), formats=("raw", "bmp"))
        fdir = write_fixture(default_fixture_dir(spec), spec)
        images = read_table(fdir, "images", columns=["image_id", "caption", "phash"])
    else:
        images = read_images_fixture(sf, columns=["image_id", "caption", "phash"])
    n_parts = fl.choose_n_parts(images.count())
    import numpy as np
    from simhash_ray.stages.lsh import TEXT_SPACE, IMAGE_SPACE, broadcast_candidate_edges
    from simhash_ray.stages.cluster import unionfind_driver
    import pandas as pd

    sigs = fl.signatures(images, cfg).materialize()
    t0 = mark("encode", t0)
    sig_df = sigs.to_pandas()
    t0 = mark("collect_sigs", t0)
    ids = sig_df["image_id"].to_numpy(dtype=object)
    ai, bi = broadcast_candidate_edges(
        {TEXT_SPACE: sig_df["simhash"].to_numpy().view(np.uint64),
         IMAGE_SPACE: sig_df["phash"].to_numpy().view(np.uint64)},
        [(TEXT_SPACE, cfg.text_lsh), (IMAGE_SPACE, cfg.image_lsh)],
        taus={TEXT_SPACE: cfg.text_lsh.hamming_tau, IMAGE_SPACE: cfg.image_lsh.hamming_tau},
    )
    t0 = mark("band_tasks", t0)
    a_ids, b_ids = ids[ai], ids[bi]
    swap = a_ids > b_ids
    a_ids[swap], b_ids[swap] = b_ids[swap], a_ids[swap]
    edge_df = pd.DataFrame({"a": a_ids, "b": b_ids}).drop_duplicates()
    label_df = unionfind_driver(edge_df)
    t0 = mark("unionfind", t0)
    assignment = fl._attach_by_own_id(sigs, label_df).materialize()
    t0 = mark("attach", t0)
    t["total"] = round(sum(v for k, v in t.items() if isinstance(v, float)), 2)
    t["num_cpus"] = num_cpus
    t["n_edges"] = len(edge_df)
    t["n_clusters"] = len(set(label_df["label"]))
    print(json.dumps(t))
    ray.shutdown()


if __name__ == "__main__":
    main()
