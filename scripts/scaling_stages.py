"""Per-stage scaling measurement (BASELINE.md scaling protocol,
round 2): times ONE stage at two CPU levels in fresh Ray sessions and
reports the efficiency, isolating stage scaling from the e2e
pipeline's fixed driver-side costs (fixture read, signature collect,
driver union-find) that deflate the whole-pipeline ratio on a
single box.

    python scripts/scaling_stages.py [encode|bands] [lo] [hi]

Each level runs in a fresh subprocess (`_child`), warmup pass
untimed, min of two timed passes (the sandbox VM's throughput drifts
>2x between minutes — BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ROWS = int(os.environ.get("GRAFT_BENCH_ROWS", "400000"))


def _child(stage: str, ncpu: int) -> None:
    import logging

    import ray

    ray.init(
        address="local", num_cpus=ncpu, include_dashboard=False,
        logging_level="ERROR", ignore_reinit_error=True,
    )
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from simhash_ray.config import DEFAULT_CONFIG as cfg
    from simhash_ray.fixtures import FixtureSpec, default_fixture_dir, write_fixture
    from simhash_ray.pipelines import dedup_images as fl
    from simhash_ray.sources.tables import read_table

    spec = FixtureSpec(n_rows=ROWS, seed=42, sizes=(32,), formats=("raw", "bmp"))
    fdir = write_fixture(default_fixture_dir(spec), spec)
    images = read_table(fdir, "images", columns=["image_id", "caption", "phash"])

    if stage == "encode":
        def run():
            return fl.signatures(images, cfg).materialize().count()
    elif stage == "bands":
        sigs = fl.signatures(images, cfg).materialize()
        from simhash_ray.stages.collapse import collapse_exact

        collapsed = collapse_exact(sigs, fl.choose_n_parts(ROWS)).materialize()

        def run():
            return fl.dup_edges(collapsed, cfg, fl.choose_n_parts(ROWS)).materialize().count()
    else:
        raise SystemExit(f"unknown stage {stage}")

    run()  # warmup: actor spawn + imports + page cache
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        n = run()
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({"stage": stage, "ncpu": ncpu, "sec": round(best, 3), "rows": n}))
    ray.shutdown()


def main() -> None:
    if len(sys.argv) >= 2 and sys.argv[1] == "--child":
        _child(sys.argv[2], int(sys.argv[3]))
        return
    stage = sys.argv[1] if len(sys.argv) > 1 else "encode"
    lo = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    hi = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    res = {}
    for ncpu in (lo, hi):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", stage, str(ncpu)],
            capture_output=True, text=True, check=True,
        ).stdout
        res[ncpu] = json.loads(out.strip().splitlines()[-1])
    eff = (res[lo]["sec"] / res[hi]["sec"]) / (hi / lo)
    print(
        json.dumps(
            {
                "metric": f"stage_scaling_{stage}",
                "value": round(eff, 3),
                "unit": "ratio",
                "sec_locpu": res[lo]["sec"],
                "sec_hicpu": res[hi]["sec"],
                "cpus": [lo, hi],
                "rows": ROWS,
            }
        )
    )


if __name__ == "__main__":
    main()
