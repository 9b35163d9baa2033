"""Multimodal column operators: image decode / feature / resize as
actor-pool map_batches stages; audio/video stubs.

Image ops are REAL (stdlib codecs from simhash_ray.imgcodec); the
audio/video stages are stubs behind clearly-marked seams — the decode
libraries are not in this container, but the Ray-side plumbing (schema,
batch size, actor signature, output layout) is real and tested.

These run over the north-rule image table; ``bytes`` is a wide binary
column, so stages keep ``batch_size`` small and should be placed
*after* any row-reducing filter.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..imgcodec import decode_image
from ..phash import phash64


class ImageStats:
    """Decode each image and emit per-channel means + recomputed phash.

    Doubles as the per-row invariant checker: ``phash_matches`` is True
    iff the pinned phash of the decoded pixels equals the stored
    ``phash`` column (north-rule invariant; lossless fmts → exact)."""

    def __init__(self):
        self.decode = decode_image  # codec tables loaded once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        means = np.zeros((n, 3), dtype=np.float64)
        ph = np.zeros(n, dtype=np.int64)
        data = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        ws = batch["w"].to_pylist()
        hs = batch["h"].to_pylist()
        for i in range(n):
            pix = self.decode(data[i], fmts[i], ws[i], hs[i])
            means[i] = pix.reshape(-1, 3).mean(axis=0)
            ph[i] = phash64(pix)
        out = batch.drop_columns(["bytes"])
        out = out.append_column("mean_r", pa.array(means[:, 0]))
        out = out.append_column("mean_g", pa.array(means[:, 1]))
        out = out.append_column("mean_b", pa.array(means[:, 2]))
        out = out.append_column("phash_recomputed", pa.array(ph, type=pa.int64()))
        return out.append_column(
            "phash_matches",
            pa.array(ph == batch["phash"].to_numpy(zero_copy_only=False)),
        )


class ImageResize:
    """Block-mean downsample to (out_side, out_side); emits raw RGB
    bytes (the only in-sandbox encodable format without size cost)."""

    def __init__(self, out_side: int = 32):
        self.out_side = out_side

    def __call__(self, batch: pa.Table) -> pa.Table:
        s = self.out_side
        rows = []
        data = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        ws = batch["w"].to_pylist()
        hs = batch["h"].to_pylist()
        for i in range(batch.num_rows):
            pix = decode_image(data[i], fmts[i], ws[i], hs[i])
            h, w, _ = pix.shape
            if h % s or w % s:
                raise ValueError(f"dims {h}x{w} not divisible by {s}")
            small = (
                pix.reshape(s, h // s, s, w // s, 3).mean(axis=(1, 3)).astype(np.uint8)
            )
            rows.append(small.tobytes())
        return pa.table(
            {
                "image_id": batch["image_id"],
                "bytes": pa.array(rows, type=pa.large_binary()),
                "w": pa.array([s] * batch.num_rows, type=pa.int32()),
                "h": pa.array([s] * batch.num_rows, type=pa.int32()),
                "fmt": pa.array(["raw"] * batch.num_rows, type=pa.string()),
            }
        )


class ImageFeatures:
    """Decode → 48-dim color-histogram embedding (16 bins × RGB,
    L2-normalized float32 list column) — the image-side feature
    extractor that bridges the multimodal table into the embedding
    operators (lsh_cosine_dup_pairs / ivf_topk / brute_force_topk):
    visually-near-identical images land at cosine ≈ 1."""

    def __init__(self, bins: int = 16):
        self.bins = bins
        self.decode = decode_image

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        feats = np.zeros((n, self.bins * 3), dtype=np.float32)
        data = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        ws = batch["w"].to_pylist()
        hs = batch["h"].to_pylist()
        for i in range(n):  # per-row decode is inherent; hist is numpy
            pix = self.decode(data[i], fmts[i], ws[i], hs[i])
            for c in range(3):
                h, _ = np.histogram(
                    pix[:, :, c], bins=self.bins, range=(0, 256)
                )
                feats[i, c * self.bins : (c + 1) * self.bins] = h
            nrm = np.linalg.norm(feats[i])
            if nrm > 0:
                feats[i] /= nrm
        return pa.table(
            {
                "image_id": batch["image_id"],
                "embedding": pa.array(
                    list(feats), type=pa.list_(pa.float32())
                ),
            }
        )


def image_embeddings(
    ds: rd.Dataset, bins: int = 16, concurrency=(1, 8), batch_size: int = 256
) -> rd.Dataset:
    """(image_id, embedding) — actor-pool feature extraction over the
    wide binary column (placed before any embedding-space dedup/ANN)."""
    return ds.map_batches(
        ImageFeatures,
        fn_constructor_kwargs={"bins": bins},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class AudioFeatureStub:
    """STUB: audio decode/feature-extract (no audio libs in-sandbox).

    Real plumbing, fake kernel: emits a deterministic pseudo-feature
    (byte-level energy proxy) per row and a ``stub=True`` marker so
    downstream consumers can't mistake it for a real decoder.  Swap
    ``_features`` for a real implementation (e.g. soundfile + librosa)
    in production."""

    STUB = True

    def _features(self, payload: bytes) -> float:
        if len(payload) == 0:
            return 0.0
        arr = np.frombuffer(payload, dtype=np.uint8)
        return float(arr.astype(np.float64).mean())

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self._features(b) for b in batch["bytes"].to_pylist()]
        out = batch.drop_columns(["bytes"])
        out = out.append_column("energy_proxy", pa.array(feats, type=pa.float64()))
        return out.append_column("stub", pa.array([True] * batch.num_rows))


class VideoFrameSampleStub:
    """STUB: video frame sampling (no video libs in-sandbox)."""

    STUB = True

    def __call__(self, batch: pa.Table) -> pa.Table:
        raise NotImplementedError(
            "video decoding requires av/ffmpeg, unavailable in this sandbox; "
            "the stage contract is batch(bytes) -> rows of (video_id, "
            "frame_idx, bytes) with one output row per sampled frame"
        )


def image_stats(ds: rd.Dataset, concurrency=(1, 8), batch_size: int = 256) -> rd.Dataset:
    """Wide-binary-aware actor stage: small batches, pool sized by caller."""
    return ds.map_batches(
        ImageStats,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
