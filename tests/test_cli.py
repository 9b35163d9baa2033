"""CLI smoke test: `python -m simhash_ray dedup` over the sf0.001-scale
fixture in a subprocess (its own Ray session), mirroring the
reference's runnable-binary surface (simhash-runner.hs:126-184)."""

import json
import os
import subprocess
import sys

import pandas as pd
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


def test_cli_dedup_cascade_smoke(tmp_path):
    fdir = write_fixture(
        default_fixture_dir(FixtureSpec(n_rows=300, seed=13)),
        FixtureSpec(n_rows=300, seed=13),
    )
    out = tmp_path / "out"
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)
    res = subprocess.run(
        [
            sys.executable, "-m", "simhash_ray", "--num-cpus", "8",
            "dedup", os.path.join(fdir, "images.parquet"),
            "--out", str(out), "--survivors", "--cascade",
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
    assert metrics["tier_drops"]["exact"] >= 1  # fixture plants exact dups
    adf = pq.read_table(str(out / "assignment")).to_pandas()
    assert len(adf) == 300 and adf["image_id"].is_unique
    assert set(adf["tier"]) <= {"exact", "phash", "caption", "survivor"}
    sdf = pq.read_table(str(out / "survivors")).to_pandas()
    assert len(sdf) == metrics["n_survivors"]
    assert len(sdf) == int((adf["tier"] == "survivor").sum())
    assert "bytes" in sdf.columns


def test_cli_config_sidecar(tmp_path):
    """--config loads a YAML sidecar with a non-default τ (the
    reference's <model>.opts.yml surface, V2.hs:41-62); the sidecar's
    config hash must land in metrics.json AND the checkpoint manifests
    (config-addressed resume)."""
    from simhash_ray.config import DedupConfig, LSHConfig, load_config

    fdir = write_fixture(
        default_fixture_dir(FixtureSpec(n_rows=300, seed=13)),
        FixtureSpec(n_rows=300, seed=13),
    )
    cfg_file = tmp_path / "opts.yml"
    cfg_file.write_text(
        "text_lsh:\n  n_blocks: 8\n  combo_m: 2\n  hamming_tau: 4\n"
        "max_cluster_rounds: 9\n"
    )
    expect = DedupConfig(
        text_lsh=LSHConfig(n_blocks=8, combo_m=2, hamming_tau=4),
        max_cluster_rounds=9,
    )
    assert load_config(str(cfg_file)) == expect  # loader parity

    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)
    res = subprocess.run(
        [
            sys.executable, "-m", "simhash_ray", "--num-cpus", "8",
            "--config", str(cfg_file),
            "dedup", os.path.join(fdir, "images.parquet"),
            "--out", str(out), "--ckpt", str(ckpt),
        ],
        capture_output=True, text=True, timeout=540, cwd="/root/repo", env=env,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    metrics = json.loads(res.stdout.strip().splitlines()[-1])
    assert metrics["config_hash"] == expect.config_hash()
    manifests = [
        m
        for r, _, fs in os.walk(ckpt)
        for f in fs
        if f.endswith(".json")
        for m in [json.load(open(os.path.join(r, f)))]
        if "stage" in m  # lineage manifests (not the stats sink)
    ]
    assert manifests and all(
        m.get("config_hash") == expect.config_hash() for m in manifests
    )


def test_config_loader_rejects_bad_input(tmp_path):
    import pytest

    from simhash_ray.config import load_config

    bad = tmp_path / "bad.yml"
    bad.write_text("text_lsh:\n  n_block: 8\n")  # typo'd key
    with pytest.raises(ValueError, match="n_block"):
        load_config(str(bad))
    bad2 = tmp_path / "bad2.json"
    bad2.write_text('{"simhash": {"shingle_k": "two"}}')
    with pytest.raises(ValueError, match="shingle_k"):
        load_config(str(bad2))
    bad3 = tmp_path / "bad3.yml"
    bad3.write_text("text_lsh:\n  hamming_tau: 7\n")  # pigeonhole break
    with pytest.raises(ValueError, match="pigeonhole"):
        load_config(str(bad3))


def test_submit_job_local_smoke(tmp_path):
    """scripts/submit_job.py --local drives the same entrypoint the
    cluster job-submission path wraps (round-2 verdict item 9)."""
    fdir = write_fixture(
        default_fixture_dir(FixtureSpec(n_rows=300, seed=13)),
        FixtureSpec(n_rows=300, seed=13),
    )
    out = tmp_path / "out"
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)
    res = subprocess.run(
        [
            sys.executable, "scripts/submit_job.py", "--local", "--",
            "--num-cpus", "8",
            "encode", os.path.join(fdir, "images.parquet"),
            "--out", str(out),
        ],
        capture_output=True,
        text=True,
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=300,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    sig = pq.read_table(str(out))
    assert sig.num_rows == 300
    assert {"image_id", "simhash", "phash"} <= set(sig.column_names)


def test_submit_job_entrypoint_shape():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "submit_job",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "scripts", "submit_job.py",
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert mod.build_entrypoint(["dedup", "/d", "--out", "/o"]) == (
        "python -m simhash_ray dedup /d --out /o"
    )


def test_cli_dedup_docs_smoke(tmp_path):
    out = tmp_path / "out"
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)
    res = subprocess.run(
        [
            sys.executable, "-m", "simhash_ray", "--num-cpus", "8",
            "dedup-docs", "/root/testdata/sf0.001/documents.parquet",
            "--out", str(out),
        ],
        capture_output=True,
        text=True,
        env=env,
        timeout=300,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    a = pq.read_table(str(out / "assignment"))
    assert a.num_rows == 500
    assert {"doc_id", "cluster_id", "is_representative"} <= set(a.column_names)
    m = json.loads((out / "metrics.json").read_text())
    assert m["n_rows"] == 500
    assert m["n_representatives"] + m["n_duplicates_removed"] == 500


def test_cli_paradedup_smoke(tmp_path):
    out = tmp_path / "out"
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)
    res = subprocess.run(
        [
            sys.executable, "-m", "simhash_ray", "--num-cpus", "8",
            "paradedup", "/root/testdata/sf0.001/documents.parquet",
            "--out", str(out), "--window", "8",
        ],
        capture_output=True,
        text=True,
        env=env,
        timeout=300,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    t = pq.read_table(str(out / "documents"))
    assert t.num_rows == 500
    assert {"doc_id", "text", "n_kept"} <= set(t.column_names)
    m = json.loads((out / "metrics.json").read_text())
    assert m["n_docs"] == 500 and m["n_units_kept"] > 0
    # mutually exclusive unit flags are rejected loudly
    bad = subprocess.run(
        [
            sys.executable, "-m", "simhash_ray", "paradedup",
            "/root/testdata/sf0.001/documents.parquet",
            "--out", str(tmp_path / "bad"),
        ],
        capture_output=True, text=True, env=env, timeout=120,
    )
    assert bad.returncode == 2


def test_cli_ingest_smoke(tmp_path):
    """encode + dedup over a base, then `ingest` a shard: the merged
    assignment must equal a full-batch CLI dedup over base ∪ shard."""
    import pandas as pd

    fdir = write_fixture(
        default_fixture_dir(FixtureSpec(n_rows=300, seed=13)),
        FixtureSpec(n_rows=300, seed=13),
    )
    df = pq.read_table(os.path.join(fdir, "images.parquet")).to_pandas()
    base_df = df.iloc[: len(df) * 4 // 5]
    shard_df = df.iloc[len(df) * 4 // 5 :]
    base_tbl = tmp_path / "base.parquet"
    shard_tbl = tmp_path / "shard.parquet"
    import pyarrow as pa

    pq.write_table(pa.Table.from_pandas(base_df, preserve_index=False), base_tbl)
    pq.write_table(pa.Table.from_pandas(shard_df, preserve_index=False), shard_tbl)

    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)

    def run(*cli):
        res = subprocess.run(
            [sys.executable, "-m", "simhash_ray", "--num-cpus", "8", *cli],
            capture_output=True, text=True, timeout=540, cwd="/root/repo",
            env=env,
        )
        assert res.returncode == 0, res.stderr[-2000:]
        return json.loads(res.stdout.strip().splitlines()[-1])

    base_out = tmp_path / "corpus"
    run("dedup", str(base_tbl), "--out", str(base_out))
    run("encode", str(base_tbl), "--out", str(base_out))
    ing_out = tmp_path / "corpus2"
    metrics = run("ingest", str(shard_tbl), "--base", str(base_out),
                  "--out", str(ing_out))
    assert metrics["n_shard"] == len(shard_df)

    full_out = tmp_path / "full"
    run("dedup", os.path.join(fdir, "images.parquet"), "--out", str(full_out))
    merged = (
        pq.read_table(str(ing_out / "assignment")).to_pandas()
        .sort_values("image_id").reset_index(drop=True)
    )
    full = (
        pq.read_table(str(full_out / "assignment")).to_pandas()
        .sort_values("image_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        merged[["image_id", "cluster_id", "is_representative"]],
        full[["image_id", "cluster_id", "is_representative"]],
    )
    # the updated signature table covers base ∪ shard, ready as next --base
    sigs = pq.read_table(str(ing_out / "signatures")).to_pandas()
    assert set(sigs["image_id"]) == set(df["image_id"])


def test_cli_convert_roundtrip(tmp_path):
    """lines → parquet → jsonl → (read back): the convert on-ramp from
    the reference's line corpora into engine tables."""
    src = tmp_path / "corpus.txt"
    src.write_text(
        "\n".join(f"lab{i % 2}, body text {i}, extra" for i in range(40)) + "\n",
        encoding="utf-8",
    )
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)

    def run(*cli):
        res = subprocess.run(
            [sys.executable, "-m", "simhash_ray", "--num-cpus", "4", *cli],
            capture_output=True, text=True, timeout=540,
            cwd="/root/repo", env=env,
        )
        assert res.returncode == 0, res.stderr[-2000:]
        return json.loads(res.stdout.strip().splitlines()[-1])

    pq_out = tmp_path / "pq"
    m = run("convert", str(src), "--from", "lines", "--to", "parquet",
            "--out", str(pq_out))
    assert m["rows"] == 40
    import pyarrow.parquet as _pq
    import glob

    parts = glob.glob(str(pq_out / "*.parquet"))
    tbl = _pq.read_table(parts)
    assert tbl.num_rows == 40
    assert sorted(tbl.column_names) == ["label", "text"]
    # first-comma split: the message keeps its interior comma
    assert any(t.endswith(", extra") for t in tbl["text"].to_pylist())

    jl_out = tmp_path / "jl"
    m2 = run("convert", str(pq_out), "--from", "parquet", "--to", "jsonl",
             "--out", str(jl_out))
    assert m2["rows"] == 40


def test_cli_curate_smoke(tmp_path):
    """curate over the sf0.001 documents table: writes corpus/ +
    metrics, resumable rerun from --ckpt is instant-identical."""
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)
    cmd = [
        sys.executable, "-m", "simhash_ray", "--num-cpus", "8",
        "curate", "/root/testdata/sf0.001/documents.parquet",
        "--out", str(out), "--ckpt", str(ckpt),
    ]
    res = subprocess.run(
        cmd, capture_output=True, text=True, timeout=540,
        cwd="/root/repo", env=env,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    metrics = json.loads(res.stdout.strip().splitlines()[-1])
    assert metrics["n_rows"] > 0
    assert set(metrics["splits"]) <= {"train", "valid"}
    df = pq.read_table(str(out / "corpus")).to_pandas()
    assert len(df) == metrics["n_rows"]
    assert set(df.columns) == {"doc_id", "split", "n_tokens"}
    # resumable rerun: committed stages skip, output identical
    out2 = tmp_path / "out2"
    cmd2 = cmd[:-4] + ["--out", str(out2), "--ckpt", str(ckpt)]
    res2 = subprocess.run(
        cmd2, capture_output=True, text=True, timeout=540,
        cwd="/root/repo", env=env,
    )
    assert res2.returncode == 0, res2.stderr[-2000:]
    df2 = pq.read_table(str(out2 / "corpus")).to_pandas()
    pd.testing.assert_frame_equal(
        df.sort_values("doc_id").reset_index(drop=True),
        df2.sort_values("doc_id").reset_index(drop=True),
    )
    mjson = json.load(open(ckpt / "metrics.json"))
    assert all(v["resumed"] for v in mjson.values())


def test_cli_convert_wds_roundtrip(tmp_path):
    """parquet image table → WebDataset tar shards → parquet: the
    multimodal corpus on/off-ramp."""
    import hashlib

    import numpy as np
    import pyarrow as pa

    rng = np.random.default_rng(6)
    tbl = pa.table(
        {
            "image_id": pa.array([f"k{i:03d}" for i in range(30)]),
            "bytes": pa.array(
                [rng.bytes(rng.integers(5, 200)) for _ in range(30)],
                type=pa.large_binary(),
            ),
            "w": pa.array(rng.integers(4, 32, 30).astype(np.int32)),
            "h": pa.array(rng.integers(4, 32, 30).astype(np.int32)),
            "fmt": pa.array(["png"] * 30),
            "caption": pa.array([f"caption {i}" for i in range(30)]),
        }
    )
    src = tmp_path / "imgs.parquet"
    pq.write_table(tbl, str(src))
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)

    def run(*cli):
        res = subprocess.run(
            [sys.executable, "-m", "simhash_ray", "--num-cpus", "4", *cli],
            capture_output=True, text=True, timeout=540,
            cwd="/root/repo", env=env,
        )
        assert res.returncode == 0, res.stderr[-2000:]
        return json.loads(res.stdout.strip().splitlines()[-1])

    wds_dir = tmp_path / "wds"
    m = run("convert", str(src), "--from", "parquet", "--to", "wds",
            "--out", str(wds_dir))
    assert m["rows"] == 30
    assert any(f.endswith(".tar") for f in os.listdir(wds_dir))

    back_dir = tmp_path / "back"
    m2 = run("convert", str(wds_dir), "--from", "wds", "--to", "parquet",
             "--out", str(back_dir))
    assert m2["rows"] == 30
    back = pq.read_table(str(back_dir)).to_pandas().sort_values("image_id")
    orig = tbl.to_pandas().sort_values("image_id")
    assert list(back["caption"]) == list(orig["caption"])
    assert [hashlib.md5(b).hexdigest() for b in back["bytes"]] == [
        hashlib.md5(b).hexdigest() for b in orig["bytes"]
    ]


def test_cli_dedup_wds_matches_parquet(tmp_path):
    """`dedup --format wds` (payload-only tar shards, phash computed on
    the fly) must produce the same clustering as the parquet path with
    its precomputed phash column."""
    import ray.data as rd

    from simhash_ray.sources.webdataset import write_webdataset

    fdir = write_fixture(
        default_fixture_dir(FixtureSpec(n_rows=300, seed=13)),
        FixtureSpec(n_rows=300, seed=13),
    )
    wds_dir = tmp_path / "wds"
    write_webdataset(
        rd.read_parquet(os.path.join(fdir, "images.parquet")), str(wds_dir),
        shard_rows=64,
    ).materialize()

    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)

    def run(*cli):
        res = subprocess.run(
            [sys.executable, "-m", "simhash_ray", "--num-cpus", "8", *cli],
            capture_output=True, text=True, timeout=540,
            cwd="/root/repo", env=env,
        )
        assert res.returncode == 0, res.stderr[-2000:]
        return json.loads(res.stdout.strip().splitlines()[-1])

    m_wds = run("dedup", str(wds_dir), "--format", "wds",
                "--out", str(tmp_path / "out_wds"))
    m_pq = run("dedup", os.path.join(fdir, "images.parquet"),
               "--out", str(tmp_path / "out_pq"))
    assert m_wds["n_rows"] == m_pq["n_rows"] == 300
    assert m_wds["n_clusters_with_dups"] == m_pq["n_clusters_with_dups"]
    assert m_wds["n_nodes_clustered"] == m_pq["n_nodes_clustered"]
    a = pq.read_table(str(tmp_path / "out_wds" / "assignment")).to_pandas()
    b = pq.read_table(str(tmp_path / "out_pq" / "assignment")).to_pandas()
    pd.testing.assert_frame_equal(
        a.sort_values("image_id").reset_index(drop=True),
        b.sort_values("image_id").reset_index(drop=True),
    )


def test_cli_ingest_docs(tmp_path):
    """dedup-docs (exports signatures) → ingest --domain docs: the
    hourly document-shard fold, end-to-end through the CLI."""
    import pyarrow as pa

    full = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id", "text"])
    ids = full["doc_id"].to_pylist()
    cut = sorted(ids)[int(len(ids) * 0.8)]
    base_tbl = full.filter(pa.compute.less(full["doc_id"], cut))
    shard_tbl = full.filter(pa.compute.greater_equal(full["doc_id"], cut))
    base_pq = tmp_path / "base.parquet"
    shard_pq = tmp_path / "shard.parquet"
    pq.write_table(base_tbl, str(base_pq))
    pq.write_table(shard_tbl, str(shard_pq))

    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)

    def run(*cli):
        res = subprocess.run(
            [sys.executable, "-m", "simhash_ray", "--num-cpus", "8", *cli],
            capture_output=True, text=True, timeout=540,
            cwd="/root/repo", env=env,
        )
        assert res.returncode == 0, res.stderr[-2000:]
        return json.loads(res.stdout.strip().splitlines()[-1])

    base_out = tmp_path / "base_out"
    m1 = run("dedup-docs", str(base_pq), "--out", str(base_out))
    assert m1["n_rows"] == base_tbl.num_rows
    assert os.path.isdir(base_out / "signatures")

    ing_out = tmp_path / "ing_out"
    m2 = run("ingest", str(shard_pq), "--base", str(base_out),
             "--out", str(ing_out), "--domain", "docs")
    assert m2["n_shard"] == shard_tbl.num_rows
    merged = pq.read_table(str(ing_out / "assignment")).to_pandas()
    assert len(merged) == full.num_rows
    assert set(merged["doc_id"]) == set(ids)
    # updated signatures cover the whole corpus, ready as the next base
    sigs = pq.read_table(str(ing_out / "signatures")).to_pandas()
    assert len(sigs) == full.num_rows


def test_cli_paradedup_within_doc(tmp_path):
    out = tmp_path / "out"
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)
    res = subprocess.run(
        [
            sys.executable, "-m", "simhash_ray", "--num-cpus", "8",
            "paradedup", "/root/testdata/sf0.001/documents.parquet",
            "--out", str(out), "--window", "2", "--within-doc",
        ],
        capture_output=True,
        text=True,
        env=env,
        timeout=300,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    t = pq.read_table(str(out / "documents"))
    assert t.num_rows == 500
    assert {"doc_id", "text", "n_kept", "n_dropped"} <= set(t.column_names)
    m = json.loads((out / "metrics.json").read_text())
    assert m["n_docs"] == 500 and m["keep"] == "within-doc-first"


def test_cli_paradedup_spans(tmp_path):
    out = tmp_path / "out"
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)
    res = subprocess.run(
        [
            sys.executable, "-m", "simhash_ray", "--num-cpus", "8",
            "paradedup", "/root/testdata/sf0.001/documents.parquet",
            "--out", str(out), "--window", "8", "--spans",
        ],
        capture_output=True,
        text=True,
        env=env,
        timeout=300,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    t = pq.read_table(str(out / "documents"))
    assert t.num_rows == 500
    assert {"doc_id", "text", "n_kept", "n_removed"} <= set(t.column_names)
    m = json.loads((out / "metrics.json").read_text())
    assert m["n_docs"] == 500 and m["keep"] == "cross-doc-first-span"
    assert m["n_tokens_kept"] > 0
    # --spans is exclusive with --sep / --within-doc
    bad = subprocess.run(
        [
            sys.executable, "-m", "simhash_ray", "paradedup",
            "/root/testdata/sf0.001/documents.parquet",
            "--out", str(tmp_path / "bad"), "--sep", "x", "--spans",
        ],
        capture_output=True, text=True, env=env, timeout=120,
    )
    assert bad.returncode == 2


def test_cli_dedup_docs_idf(tmp_path):
    out = tmp_path / "out"
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)
    res = subprocess.run(
        [
            sys.executable, "-m", "simhash_ray", "--num-cpus", "8",
            "dedup-docs", "/root/testdata/sf0.001/documents.parquet",
            "--out", str(out), "--idf",
        ],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    m = json.loads((out / "metrics.json").read_text())
    assert m["n_rows"] == 500 and m["encoder"] == "idf-weighted"
    assert m["n_representatives"] + m["n_duplicates_removed"] == 500
    t = pq.read_table(str(out / "assignment"))
    assert t.num_rows == 500
    # --idf --ckpt combination is rejected loudly
    bad = subprocess.run(
        [
            sys.executable, "-m", "simhash_ray", "dedup-docs",
            "/root/testdata/sf0.001/documents.parquet",
            "--out", str(tmp_path / "bad"), "--idf", "--ckpt",
            str(tmp_path / "ck"),
        ],
        capture_output=True, text=True, env=env, timeout=120,
    )
    assert bad.returncode == 2


def test_cli_simjoin(tmp_path):
    import numpy as np

    rng = np.random.default_rng(21)
    vocab = [f"w{i}" for i in range(200)]
    corpus_rows = [
        " ".join(rng.choice(vocab, size=25)) for _ in range(60)
    ]
    # probe: 5 near-copies of corpus rows (1 token edited) + 5 fresh
    probe_rows = []
    for i in range(5):
        toks = corpus_rows[i * 7].split()
        toks[3] = "edited"
        probe_rows.append(" ".join(toks))
    probe_rows += [" ".join(rng.choice(vocab, size=25)) for _ in range(5)]

    corpus_pq = tmp_path / "corpus.parquet"
    probe_pq = tmp_path / "probe.parquet"
    pd.DataFrame(
        {"doc_id": range(60), "text": corpus_rows}
    ).to_parquet(corpus_pq)
    pd.DataFrame(
        {"doc_id": range(1000, 1010), "text": probe_rows}
    ).to_parquet(probe_pq)

    out = tmp_path / "out"
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)
    res = subprocess.run(
        [
            sys.executable, "-m", "simhash_ray", "--num-cpus", "8",
            "simjoin", str(probe_pq), "--corpus", str(corpus_pq),
            "--out", str(out), "--theta", "0.5",
        ],
        capture_output=True, text=True, timeout=540,
        cwd="/root/repo", env=env,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    metrics = json.loads(res.stdout.strip().splitlines()[-1])
    assert metrics["n_pairs"] >= 4  # near-copies found
    assert metrics["n_probe_matched"] >= 4
    pdf = pq.read_table(str(out / "pairs")).to_pandas()
    assert set(pdf["a"]).issubset(set(range(1000, 1010)))
    assert set(pdf["b"]).issubset(set(range(60)))


def test_cli_dedup_ckpt_edge_shards_smoke(tmp_path):
    """--ckpt + --edge-shards: the checkpointed run with per-shard edge
    commits matches the plain CLI output shape and leaves the shard
    manifests on disk."""
    import glob

    fdir = write_fixture(
        default_fixture_dir(FixtureSpec(n_rows=300, seed=13)),
        FixtureSpec(n_rows=300, seed=13),
    )
    out = tmp_path / "out"
    ck = tmp_path / "ck"
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)
    res = subprocess.run(
        [
            sys.executable, "-m", "simhash_ray", "--num-cpus", "8",
            "dedup", os.path.join(fdir, "images.parquet"),
            "--out", str(out), "--ckpt", str(ck), "--edge-shards", "2",
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
    assert len(glob.glob(str(ck / "edge_cands.shard_*.manifest.json"))) == 2
    adf = pq.read_table(str(out / "assignment")).to_pandas()
    assert len(adf) == 300 and adf["image_id"].is_unique
