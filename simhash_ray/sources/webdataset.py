"""WebDataset-style tar-shard source/sink for image+caption corpora.

The de-facto layout for 100-TB image-text pretraining data is a
directory of tar shards, each holding samples as member files grouped
by key — ``<key>.<fmt>`` (image payload), ``<key>.txt`` (caption),
``<key>.json`` (metadata) — so a reader streams one shard per task
with zero random IO.  This module adds that format next to the
Parquet/Lance/lines adapters (reference-native formats are in
``sources/textlines.py``; the reference itself is line-oriented,
/root/reference/src/Utils.hs:38-54 — tar shards are the multimodal
counterpart this engine needs at the north rule's scale).

Scale/parallelism model: the SHARD is the unit of parallelism in both
directions — the writer emits one tar per input block (tmp +
``os.replace`` atomic commit, deterministic ``shard-<min key>.tar``
name so a rerun overwrites rather than duplicates), the reader maps
one parse task per tar via ``ray.data.read_binary_files``.  No shuffle
on either path.  Samples inside a shard are parsed with the stdlib
``tarfile`` — tar is inherently a sequential container, so the
per-member loop IS the vectorized form here; cross-shard parallelism
is where the throughput comes from.  Member headers are pinned
(mtime 0, uid/gid 0, sorted keys) so a shard's bytes are a pure
function of its rows.

On a multi-node cluster ``out_dir`` must be shared storage (NFS / S3
mount) — same contract as every other sink in this repo.
"""

from __future__ import annotations

import io
import json
import os
import tarfile

import numpy as np
import pyarrow as pa
import ray.data as rd

_META_COLS = ("w", "h")


def _sample_key(image_id: str) -> str:
    # tar member names sort as strings; keys are used verbatim
    return str(image_id)


def write_webdataset(
    ds: rd.Dataset,
    out_dir: str,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
    fmt_col: str = "fmt",
    caption_col: str = "caption",
    shard_rows: int | None = 2048,
) -> rd.Dataset:
    """Write an image+caption Dataset as a directory of WebDataset tar
    shards; returns the shard manifest (shard, n_samples) Dataset.

    One tar per input batch, committed atomically (tmp +
    ``os.replace``) under the deterministic name
    ``shard-<min image_id>.tar`` — and any PRE-EXISTING ``.tar`` files
    in ``out_dir`` are removed first, because shard names depend on the
    input partitioning: a rerun with a different layout (or different
    data) would otherwise leave stale shards that silently merge into
    the next read.

    ``fmt`` values are validated per batch: ``txt``/``json`` collide
    with the reserved caption/metadata member extensions and a dot
    inside ``fmt`` would corrupt the reader's key split — both raise.
    """
    os.makedirs(out_dir, exist_ok=True)
    for f in os.listdir(out_dir):
        if f.endswith(".tar") or f.endswith(".tar.tmp"):
            os.unlink(os.path.join(out_dir, f))
    has_meta = [c for c in _META_COLS if c in ds.schema().names]

    def _write(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "shard": pa.array([], type=pa.string()),
                "n_samples": pa.array([], type=pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        bad = {
            f for f in set(batch[fmt_col].to_pylist())
            if not f or "." in str(f) or str(f) in ("txt", "json")
        }
        if bad:
            raise ValueError(
                f"write_webdataset: fmt values {sorted(map(str, bad))} are "
                "reserved or contain '.', which would collide with the "
                "caption/metadata members or corrupt the key split"
            )
        ids = [str(v) for v in batch[id_col].to_pylist()]
        order = np.argsort(np.asarray(ids, dtype=object), kind="stable")
        payloads = batch[bytes_col].to_pylist()
        fmts = batch[fmt_col].to_pylist()
        caps = batch[caption_col].to_pylist()
        metas = {c: batch[c].to_pylist() for c in has_meta}
        name = f"shard-{min(ids)}.tar"
        final = os.path.join(out_dir, name)
        tmp = final + ".tmp"

        def _add(tf: tarfile.TarFile, member: str, data: bytes) -> None:
            info = tarfile.TarInfo(member)
            info.size = len(data)
            info.mtime = 0
            info.uid = info.gid = 0
            tf.addfile(info, io.BytesIO(data))

        with tarfile.open(tmp, "w") as tf:
            for i in order:
                key = _sample_key(ids[i])
                _add(tf, f"{key}.{fmts[i]}", bytes(payloads[i]))
                _add(tf, f"{key}.txt", str(caps[i]).encode("utf-8"))
                meta = {c: metas[c][i] for c in has_meta}
                _add(
                    tf,
                    f"{key}.json",
                    json.dumps(meta, sort_keys=True).encode("utf-8"),
                )
        os.replace(tmp, final)
        return pa.table(
            {
                "shard": pa.array([final], type=pa.string()),
                "n_samples": pa.array([batch.num_rows], type=pa.int64()),
            }
        )

    cols = [id_col, bytes_col, fmt_col, caption_col, *has_meta]
    return ds.select_columns(cols).map_batches(
        _write, batch_format="pyarrow", batch_size=shard_rows
    )


def read_webdataset(path: str | list[str]) -> rd.Dataset:
    """Read a WebDataset tar-shard directory (or explicit shard list)
    back into (image_id, bytes, fmt, caption, w, h) — one parse task
    per shard, streaming.

    Unknown member extensions are ignored; a sample missing its image
    payload is dropped (a sample is defined by its payload member).
    """
    if isinstance(path, str) and os.path.isdir(path):
        paths = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".tar")
        )
    else:
        paths = [path] if isinstance(path, str) else sorted(path)
    if not paths:
        raise ValueError(f"no .tar shards under {path!r}")
    raw = rd.read_binary_files(paths)

    def _parse(batch: pa.Table) -> pa.Table:
        out = {
            "image_id": [],
            "bytes": [],
            "fmt": [],
            "caption": [],
            "w": [],
            "h": [],
        }
        for payload in batch["bytes"].to_pylist():
            samples: dict[str, dict] = {}
            with tarfile.open(fileobj=io.BytesIO(payload)) as tf:
                for member in tf.getmembers():
                    if not member.isfile():
                        continue
                    key, dot, ext = member.name.rpartition(".")
                    if not dot:
                        continue
                    data = tf.extractfile(member).read()
                    s = samples.setdefault(key, {})
                    if ext == "txt":
                        s["caption"] = data.decode("utf-8")
                    elif ext == "json":
                        s["meta"] = json.loads(data)
                    else:
                        s["bytes"] = data
                        s["fmt"] = ext
            for key in sorted(samples):
                s = samples[key]
                if "bytes" not in s:
                    continue
                meta = s.get("meta", {})
                out["image_id"].append(key)
                out["bytes"].append(s["bytes"])
                out["fmt"].append(s["fmt"])
                out["caption"].append(s.get("caption", ""))
                out["w"].append(meta.get("w"))
                out["h"].append(meta.get("h"))
        return pa.table(
            {
                "image_id": pa.array(out["image_id"], type=pa.string()),
                "bytes": pa.array(out["bytes"], type=pa.large_binary()),
                "fmt": pa.array(out["fmt"], type=pa.string()),
                "caption": pa.array(out["caption"], type=pa.string()),
                "w": pa.array(out["w"], type=pa.int64()),
                "h": pa.array(out["h"], type=pa.int64()),
            }
        )

    return raw.map_batches(_parse, batch_format="pyarrow", batch_size=1)
