"""WebDataset tar-shard source/sink: round-trip, determinism, edges."""

import hashlib
import os
import tarfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from simhash_ray.sources.webdataset import read_webdataset, write_webdataset


def _table(n=40, seed=0):
    rng = np.random.default_rng(seed)
    return pa.table(
        {
            "image_id": pa.array([f"img{i:04d}" for i in range(n)]),
            "bytes": pa.array(
                [rng.bytes(rng.integers(10, 500)) for _ in range(n)],
                type=pa.large_binary(),
            ),
            "w": pa.array(rng.integers(8, 64, n).astype(np.int32)),
            "h": pa.array(rng.integers(8, 64, n).astype(np.int32)),
            "fmt": pa.array(rng.choice(["png", "bmp"], n)),
            "caption": pa.array([f"cap {i} — naïve ünïcode" for i in range(n)]),
        }
    )


def test_roundtrip(tmp_path):
    tbl = _table()
    out = str(tmp_path / "wds")
    manifest = write_webdataset(
        rd.from_arrow(tbl).repartition(5), out, shard_rows=8
    ).to_pandas()
    assert manifest["n_samples"].sum() == tbl.num_rows
    assert all(p.endswith(".tar") and os.path.exists(p) for p in manifest["shard"])

    back = read_webdataset(out).to_pandas().sort_values("image_id")
    orig = tbl.to_pandas().sort_values("image_id")
    assert list(back["image_id"]) == list(orig["image_id"])
    assert list(back["caption"]) == list(orig["caption"])
    assert list(back["fmt"]) == list(orig["fmt"])
    assert list(back["w"]) == list(orig["w"])
    assert [hashlib.md5(b).hexdigest() for b in back["bytes"]] == [
        hashlib.md5(b).hexdigest() for b in orig["bytes"]
    ]


def test_shard_bytes_deterministic(tmp_path):
    tbl = _table(12, seed=3)
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    write_webdataset(rd.from_arrow(tbl), d1, shard_rows=None).materialize()
    write_webdataset(rd.from_arrow(tbl), d2, shard_rows=None).materialize()
    f1 = sorted(os.listdir(d1))
    assert f1 == sorted(os.listdir(d2))
    for f in f1:
        assert (
            open(os.path.join(d1, f), "rb").read()
            == open(os.path.join(d2, f), "rb").read()
        )


def test_reader_drops_payloadless_and_ignores_junk(tmp_path):
    shard = str(tmp_path / "shard-x.tar")
    with tarfile.open(shard, "w") as tf:
        import io

        def add(name, data):
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))

        add("a.png", b"PAYLOAD")
        add("a.txt", "hello".encode())
        add("b.txt", "caption without image".encode())  # dropped
        add("noext", b"junk")  # ignored
    out = read_webdataset([shard]).to_pandas()
    assert list(out["image_id"]) == ["a"]
    assert out["caption"][0] == "hello"
    assert bytes(out["bytes"][0]) == b"PAYLOAD"
    assert out["w"].isna().all()  # no json metadata


def test_reader_empty_dir_raises(tmp_path):
    with pytest.raises(ValueError, match="no .tar shards"):
        read_webdataset(str(tmp_path))


def test_writer_rejects_reserved_fmt(tmp_path):
    tbl = pa.table(
        {
            "image_id": pa.array(["a"]),
            "bytes": pa.array([b"x"], type=pa.large_binary()),
            "fmt": pa.array(["txt"]),  # collides with the caption member
            "caption": pa.array(["c"]),
        }
    )
    with pytest.raises(Exception, match="reserved"):
        write_webdataset(rd.from_arrow(tbl), str(tmp_path / "w")).materialize()
    tbl2 = tbl.set_column(2, "fmt", pa.array(["tar.gz"]))
    with pytest.raises(Exception, match="reserved"):
        write_webdataset(rd.from_arrow(tbl2), str(tmp_path / "w2")).materialize()


def test_writer_clears_stale_shards(tmp_path):
    out = str(tmp_path / "wds")
    write_webdataset(rd.from_arrow(_table(20, seed=1)), out, shard_rows=4).materialize()
    n_first = len(os.listdir(out))
    assert n_first > 1
    # different data + coarser layout: all old shards must be gone
    write_webdataset(rd.from_arrow(_table(6, seed=2)), out, shard_rows=None).materialize()
    back = read_webdataset(out).to_pandas()
    assert len(back) == 6
