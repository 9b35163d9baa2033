"""Multimodal column operators: image decode / feature / resize as
actor-pool map_batches stages; audio/video behind injectable-decoder
seams.

Image ops are REAL (stdlib codecs from simhash_ray.imgcodec).  The
audio/video stages take a user-supplied decoder callable (the decode
libraries are not in this container); without one they degrade to
clearly-marked stubs, but the Ray-side plumbing (schema, batch size,
actor signature, constructor kwargs, output layout) is real and
tested with injected fake decoders.

These run over the north-rule image table; ``bytes`` is a wide binary
column, so stages keep ``batch_size`` small and should be placed
*after* any row-reducing filter.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..imgcodec import decode_image, decode_image_batch
from ..phash import phash64


class ImageStats:
    """Decode each image and emit per-channel means + recomputed phash.

    Doubles as the per-row invariant checker: ``phash_matches`` is True
    iff the pinned phash of the decoded pixels equals the stored
    ``phash`` column (north-rule invariant; lossless fmts → exact)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        means = np.zeros((n, 3), dtype=np.float64)
        ph = np.zeros(n, dtype=np.int64)
        data = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        ws = batch["w"].to_pylist()
        hs = batch["h"].to_pylist()
        pixs = decode_image_batch(data, fmts, ws, hs)
        for i in range(n):
            means[i] = pixs[i].reshape(-1, 3).mean(axis=0)
            ph[i] = phash64(pixs[i])
        out = batch.drop_columns(["bytes"])
        out = out.append_column("mean_r", pa.array(means[:, 0]))
        out = out.append_column("mean_g", pa.array(means[:, 1]))
        out = out.append_column("mean_b", pa.array(means[:, 2]))
        out = out.append_column("phash_recomputed", pa.array(ph, type=pa.int64()))
        return out.append_column(
            "phash_matches",
            pa.array(ph == batch["phash"].to_numpy(zero_copy_only=False)),
        )


class DihedralPhash:
    """Decode each image and emit the dihedral-canonical perceptual
    hash (phash.dihedral_phash_batch_32): min-over-orbit of the pinned
    8×8 DCT-sign hash, so mirrored/rotated copies collide at Hamming 0
    — the precomputed ``phash`` column cannot catch those (mirroring
    scrambles DCT signs).  Rows group by decoded shape so each uniform
    group hashes as ONE vectorized (B, 32, 32) orbit pass."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..phash import dihedral_phash_batch_32

        dsig = _hash_decoded_batch(batch, dihedral_phash_batch_32)
        return pa.table(
            {"image_id": batch["image_id"], "dsig": pa.array(dsig, type=pa.int64())}
        )


def _hash_decoded_batch(batch: pa.Table, hash_fn, n_out: int = 1) -> np.ndarray:
    """Decode the batch's payloads and hash every decoded image with
    ``hash_fn`` ((B, 32, 32) gray stack → int64 array, or (B, n_out)
    for multi-output hashes like the per-quadrant tile hash), grouping
    rows by decoded shape so each uniform group hashes as ONE
    vectorized pass — the shared body of ComputePhash, DihedralPhash
    and TilePhash.

    Raises loudly when a raw-format row lacks w/h metadata: 'raw' is
    the only format whose decode needs stored dims (BMP/PNG parse their
    headers), and externally-produced WebDataset shards routinely omit
    the json member."""
    from collections import defaultdict

    from ..phash import gray32_from_rgb

    n = batch.num_rows
    out = np.zeros(n if n_out == 1 else (n, n_out), dtype=np.int64)
    if not n:
        return out
    fmts = batch["fmt"].to_pylist()
    ws = batch["w"].to_pylist()
    hs = batch["h"].to_pylist()
    bad = [
        i for i in range(n)
        if fmts[i] == "raw" and (ws[i] is None or hs[i] is None)
    ]
    if bad:
        raise ValueError(
            f"{len(bad)} raw-format samples lack w/h metadata (first: row "
            f"{bad[0]}); raw payloads cannot be decoded without stored dims "
            "— re-write the shards with w/h json members"
        )
    pixs = decode_image_batch(batch["bytes"].to_pylist(), fmts, ws, hs)
    groups = defaultdict(list)
    for i, p in enumerate(pixs):
        groups[p.shape].append(i)
    for idxs in groups.values():
        stack = np.stack([pixs[i] for i in idxs])
        out[np.asarray(idxs)] = hash_fn(gray32_from_rgb(stack))
    return out


class ComputePhash:
    """Decode each image and emit the pinned 64-bit perceptual hash
    plus the caption — the on-ramp from payload-only corpora
    (WebDataset tar shards) into the flagship dedup, which otherwise
    reads the precomputed ``phash`` column.  The hash is the exact
    fixture/column hash (``phash_batch_32(gray32_from_rgb(...))``)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..phash import phash_batch_32

        ph = _hash_decoded_batch(batch, phash_batch_32)
        return pa.table(
            {
                "image_id": batch["image_id"],
                "caption": batch["caption"],
                "phash": pa.array(ph, type=pa.int64()),
            }
        )


def phash_signatures(
    ds: rd.Dataset, concurrency=(1, 8), batch_size: int = 256
) -> rd.Dataset:
    """(image_id, caption, phash) — actor-pool decode + pinned phash
    over the wide binary column (feeds dedup_images from payload-only
    sources such as WebDataset shards)."""
    return ds.map_batches(
        ComputePhash,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def dihedral_signatures(
    ds: rd.Dataset, concurrency=(1, 8), batch_size: int = 256
) -> rd.Dataset:
    """(image_id, dsig) — actor-pool dihedral-canonical hashing over
    the wide binary column (feeds dedup_images_dihedral)."""
    return ds.map_batches(
        DihedralPhash,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class TilePhash:
    """Decode each image and emit the four per-quadrant perceptual
    hashes (phash.tile_phash_batch_32) — the crop/occlusion-robust
    signature: an edit confined to one quadrant leaves the other three
    tiles colliding at Hamming 0, where the global DCT hash (every
    coefficient sees every pixel) drifts unboundedly."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..phash import tile_phash_batch_32

        tiles = _hash_decoded_batch(batch, tile_phash_batch_32, n_out=4)
        return pa.table(
            {
                "image_id": batch["image_id"],
                "t0": pa.array(tiles[:, 0], type=pa.int64()),
                "t1": pa.array(tiles[:, 1], type=pa.int64()),
                "t2": pa.array(tiles[:, 2], type=pa.int64()),
                "t3": pa.array(tiles[:, 3], type=pa.int64()),
            }
        )


def tile_signatures(
    ds: rd.Dataset, concurrency=(1, 8), batch_size: int = 256
) -> rd.Dataset:
    """(image_id, t0..t3) — actor-pool decode + per-quadrant hashing
    over the wide binary column (feeds tile_dup_pairs)."""
    return ds.map_batches(
        TilePhash,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
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
        if 256 % bins:
            raise ValueError(
                f"bins must divide 256 (got {bins}): the whole-batch "
                "bincount kernel maps value→bin as value // (256/bins)"
            )
        self.bins = bins

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        nb = self.bins
        data = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        ws = batch["w"].to_pylist()
        hs = batch["h"].to_pylist()
        # decode groups by (fmt, w, h) into one frombuffer each
        # (imgcodec.decode_image_batch); the HISTOGRAM is one
        # whole-batch bincount — 3 np.histogram calls per row cost
        # ~50 µs each in call overhead alone, which dominated the
        # 400k-row bench (68 s → the bincount path)
        pix_flat = [
            p.reshape(-1, 3) for p in decode_image_batch(data, fmts, ws, hs)
        ]
        if n == 0:
            return pa.table(
                {"image_id": batch["image_id"],
                 "embedding": pa.array([], type=pa.list_(pa.float32()))}
            )
        counts = np.array([p.shape[0] for p in pix_flat], dtype=np.int64)
        flat = np.concatenate(pix_flat, axis=0)  # (total_pix, 3) uint8
        row_of = np.repeat(np.arange(n, dtype=np.int64), counts)
        # bin index = value // (256/bins); layout row*3*nb + c*nb + bin
        # (identical to the historical per-channel np.histogram layout)
        shift = 256 // nb
        code = flat.astype(np.int64) // shift
        idx = (row_of[:, None] * 3 + np.arange(3, dtype=np.int64)[None, :]) * nb + code
        feats = (
            np.bincount(idx.ravel(), minlength=n * 3 * nb)
            .reshape(n, 3 * nb)
            .astype(np.float32)
        )
        nrm = np.sqrt((feats.astype(np.float64) ** 2).sum(axis=1))
        nz = nrm > 0
        feats[nz] /= nrm[nz, None].astype(np.float32)
        return pa.table(
            {
                "image_id": batch["image_id"],
                "embedding": pa.ListArray.from_arrays(
                    pa.array(
                        np.arange(n + 1, dtype=np.int32) * (3 * nb)
                    ),
                    pa.array(feats.ravel(), type=pa.float32()),
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


# payload bytes per byte-mean chunk (int64 scratch = 8×); module-level
# so tests can force the multi-chunk path cheaply
_AUDIO_SUM_CHUNK = 1 << 22


def wav_decoder(payload: bytes) -> np.ndarray:
    """Stdlib PCM WAV decode (``wave`` + numpy, no external audio
    libs): bytes → 1-D float64 samples in [-1, 1), channels averaged
    to mono.  Supports 8/16/24/32-bit integer PCM — the one audio
    format this engine can decode for real in-sandbox."""
    import io
    import wave

    with wave.open(io.BytesIO(payload)) as w:
        nch = w.getnchannels()
        sw = w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if sw == 1:  # unsigned 8-bit
        pcm = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif sw == 2:
        pcm = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif sw == 3:  # packed little-endian 24-bit
        a = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3).astype(np.int64)
        v = a[:, 0] | (a[:, 1] << 8) | (a[:, 2] << 16)
        v = np.where(v >= 1 << 23, v - (1 << 24), v)
        pcm = v.astype(np.float64) / float(1 << 23)
    elif sw == 4:
        pcm = np.frombuffer(raw, dtype="<i4").astype(np.float64) / float(1 << 31)
    else:
        raise ValueError(f"unsupported WAV sample width {sw}")
    if nch > 1:
        pcm = pcm.reshape(-1, nch).mean(axis=1)
    return pcm


def _pcm_features(pcm: np.ndarray) -> tuple[int, float, float]:
    """(n_samples, rms, zero-crossing rate) of a 1-D sample array."""
    pcm = np.asarray(pcm, dtype=np.float64).ravel()
    n = pcm.size
    rms = float(np.sqrt(np.mean(pcm * pcm))) if n else 0.0
    zcr = (
        float(np.mean(np.signbit(pcm[1:]) != np.signbit(pcm[:-1])))
        if n > 1 else 0.0
    )
    return n, rms, zcr


class AudioFeatures:
    """Audio decode + feature-extract behind an injectable decoder seam
    (round-2 verdict item 10).

    ``decoder`` is ``bytes -> 1-D float ndarray`` of PCM samples (e.g.
    ``lambda b: soundfile.read(io.BytesIO(b))[0]`` in production).
    When supplied, the stage emits real features per row — sample
    count, RMS energy, zero-crossing rate — through the same actor
    pool / schema plumbing tests exercise with a fake decoder.

    With the default ``decoder=None``, rows carrying RIFF/WAVE
    payloads decode FOR REAL through the stdlib :func:`wav_decoder`
    (``stub=False``); every other row degrades to the deterministic
    zero-copy byte-level energy proxy and is marked ``stub=True`` so
    downstream consumers can't mistake it for a decode.  The proxy is
    computed off the Arrow offsets/data buffers directly (the
    cdc._binary_buffers pattern) — payloads are materialized as Python
    bytes only for the rows actually being WAV-decoded."""

    def __init__(self, decoder=None):
        self.decoder = decoder
        self.stub = decoder is None

    STUB = True  # class-level marker: non-WAV rows of the DEFAULT kernel

    def _proxy(self, payload: bytes) -> float:
        if len(payload) == 0:
            return 0.0
        arr = np.frombuffer(payload, dtype=np.uint8)
        return float(arr.astype(np.float64).mean())

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        out = batch.drop_columns(["bytes"])
        col = batch["bytes"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if not self.stub:  # injected decoder: every row decodes
            payloads = col.to_pylist()
            n_samples = np.zeros(n, dtype=np.int64)
            rms = np.zeros(n, dtype=np.float64)
            zcr = np.zeros(n, dtype=np.float64)
            for i, b in enumerate(payloads):
                n_samples[i], rms[i], zcr[i] = _pcm_features(self.decoder(b))
            out = out.append_column(
                "n_samples", pa.array(n_samples, type=pa.int64())
            )
            out = out.append_column("rms", pa.array(rms, type=pa.float64()))
            out = out.append_column("zcr", pa.array(zcr, type=pa.float64()))
            return out.append_column("stub", pa.array([False] * n))

        # default path: zero-copy byte means off the Arrow buffers;
        # WAV payloads (RIFF....WAVE magic) additionally decode for real
        arr = col.cast(pa.large_binary())
        if arr.null_count:  # rare null-bearing batch: simple row path
            payloads = [b or b"" for b in arr.to_pylist()]
            lens = np.array([len(b) for b in payloads], dtype=np.int64)
            energy = np.array([self._proxy(b) for b in payloads])
            get = lambda i, s, e: payloads[i][s:e]  # noqa: E731
        else:
            from .cdc import _binary_buffers

            data, offsets = _binary_buffers(arr)
            lens = np.diff(offsets)
            # per-row byte sums via CHUNKED local cumsum: a whole-buffer
            # int64 cumsum would allocate 8 bytes of scratch per payload
            # byte (8 GB for a 1 GB batch) — bound the scratch to ~32 MB
            # by walking row ranges whose payload fits the chunk budget
            sums = np.zeros(n, dtype=np.int64)
            row = 0
            budget = _AUDIO_SUM_CHUNK  # payload bytes/chunk (×8 scratch)
            while row < n:
                end = row
                base = offsets[row]
                while end < n and offsets[end + 1] - base <= budget:
                    end += 1
                end = max(end, row + 1)  # a single giant row goes alone
                seg = data[offsets[row] : offsets[end]].astype(np.int64)
                cs = np.zeros(len(seg) + 1, dtype=np.int64)
                np.cumsum(seg, out=cs[1:])
                local = offsets[row : end + 1] - base
                sums[row:end] = cs[local[1:]] - cs[local[:-1]]
                row = end
            energy = np.where(lens > 0, sums / np.maximum(lens, 1), 0.0)
            dv = data  # header peeks + WAV slices below copy per row
            get = lambda i, s, e: bytes(  # noqa: E731
                dv[offsets[i] + s : min(offsets[i] + e, offsets[i + 1])]
            )
        n_samples = np.zeros(n, dtype=np.int64)
        rms = np.zeros(n, dtype=np.float64)
        zcr = np.zeros(n, dtype=np.float64)
        is_wav = np.zeros(n, dtype=bool)
        for i in np.flatnonzero(lens >= 44):  # minimal RIFF+fmt+data size
            if get(i, 0, 4) == b"RIFF" and get(i, 8, 12) == b"WAVE":
                try:
                    pcm = wav_decoder(get(i, 0, int(lens[i])))
                except Exception:
                    continue  # malformed header: stays a stub row
                n_samples[i], rms[i], zcr[i] = _pcm_features(pcm)
                is_wav[i] = True
        out = out.append_column(
            "energy_proxy", pa.array(energy, type=pa.float64())
        )
        mask = ~is_wav
        out = out.append_column(
            "n_samples", pa.array(n_samples, type=pa.int64(), mask=mask)
        )
        out = out.append_column(
            "rms", pa.array(rms, type=pa.float64(), mask=mask)
        )
        out = out.append_column(
            "zcr", pa.array(zcr, type=pa.float64(), mask=mask)
        )
        return out.append_column("stub", pa.array(mask))


# Backwards-compatible name for the decoder-less stub configuration.
AudioFeatureStub = AudioFeatures


def audio_features(
    ds: rd.Dataset, decoder=None, concurrency=(1, 8), batch_size: int = 256
) -> rd.Dataset:
    """Actor-pool audio feature stage over a wide ``bytes`` column; see
    :class:`AudioFeatures` for the decoder-injection contract."""
    return ds.map_batches(
        AudioFeatures,
        fn_constructor_kwargs={"decoder": decoder},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class VideoFrameSampler:
    """Video frame sampling behind the same injectable seam.

    ``frame_decoder`` is ``bytes -> iterable of (frame_idx:int,
    frame_bytes:bytes)`` (e.g. an ``av`` demux loop in production);
    ``every_n`` keeps every n-th decoded frame.  Output: one row per
    sampled frame, ``(video_id, frame_idx, bytes)``.  Without a
    decoder the stage raises with the stage contract — video decode
    is genuinely unavailable in-sandbox and a fake would be
    indistinguishable from data."""

    STUB = True  # decoder-less configuration raises

    def __init__(self, frame_decoder=None, every_n: int = 1):
        if every_n < 1:
            raise ValueError(f"every_n must be >= 1, got {every_n}")
        self.frame_decoder = frame_decoder
        self.every_n = every_n

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.frame_decoder is None:
            raise NotImplementedError(
                "video decoding requires av/ffmpeg, unavailable in this "
                "sandbox; inject frame_decoder(bytes) -> iterable of "
                "(frame_idx, frame_bytes) to run this stage — the contract "
                "is batch(video_id, bytes) -> rows of (video_id, frame_idx, "
                "bytes), one output row per sampled frame"
            )
        ids: list = []
        idxs: list[int] = []
        frames: list[bytes] = []
        vid_col = batch["video_id"].to_pylist()
        for vid, payload in zip(vid_col, batch["bytes"].to_pylist()):
            for frame_idx, frame_bytes in self.frame_decoder(payload):
                if frame_idx % self.every_n:
                    continue
                ids.append(vid)
                idxs.append(frame_idx)
                frames.append(frame_bytes)
        return pa.table(
            {
                "video_id": pa.array(ids, type=batch["video_id"].type),
                "frame_idx": pa.array(idxs, type=pa.int64()),
                "bytes": pa.array(frames, type=pa.binary()),
            }
        )


# Backwards-compatible name for the decoder-less stub configuration.
VideoFrameSampleStub = VideoFrameSampler


def video_frames(
    ds: rd.Dataset,
    frame_decoder=None,
    every_n: int = 1,
    concurrency=(1, 8),
    batch_size: int = 64,
) -> rd.Dataset:
    """Actor-pool frame-sampling stage; see :class:`VideoFrameSampler`."""
    return ds.map_batches(
        VideoFrameSampler,
        fn_constructor_kwargs={"frame_decoder": frame_decoder, "every_n": every_n},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def image_stats(ds: rd.Dataset, concurrency=(1, 8), batch_size: int = 256) -> rd.Dataset:
    """Wide-binary-aware actor stage: small batches, pool sized by caller."""
    return ds.map_batches(
        ImageStats,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
