"""CLI smoke test: `python -m simhash_ray dedup` over the sf0.001-scale
fixture in a subprocess (its own Ray session), mirroring the
reference's runnable-binary surface (simhash-runner.hs:126-184)."""

import json
import os
import subprocess
import sys

import pyarrow.parquet as pq

from simhash_ray.fixtures import FixtureSpec, default_fixture_dir, write_fixture


def test_cli_dedup_smoke(tmp_path):
    fdir = write_fixture(
        default_fixture_dir(FixtureSpec(n_rows=300, seed=13)),
        FixtureSpec(n_rows=300, seed=13),
    )
    out = tmp_path / "out"
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)  # subprocess owns its own local session
    res = subprocess.run(
        [
            sys.executable, "-m", "simhash_ray", "--num-cpus", "8",
            "dedup", os.path.join(fdir, "images.parquet"),
            "--out", str(out), "--survivors",
        ],
        capture_output=True,
        text=True,
        timeout=540,
        cwd="/root/repo",
        env=env,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    metrics = json.loads(res.stdout.strip().splitlines()[-1])
    assert metrics["n_rows"] == 300
    assert metrics["n_clusters_with_dups"] >= 1
    adf = pq.read_table(str(out / "assignment")).to_pandas()
    assert len(adf) == 300 and adf["image_id"].is_unique
    sdf = pq.read_table(str(out / "survivors")).to_pandas()
    assert len(sdf) == int(adf["is_representative"].sum())
    assert "bytes" in sdf.columns  # survivors carry the wide columns
