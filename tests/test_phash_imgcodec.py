"""Tests for the pinned phash and the stdlib image codecs."""

import numpy as np
import pytest

from simhash_ray.imgcodec import FORMATS, decode_image, encode_image
from simhash_ray.phash import phash64, phash_to_uint64
from simhash_ray.simhash import hamming64


def _img(seed, h=64, w=64):
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("fmt", FORMATS)
@pytest.mark.parametrize("h,w", [(32, 32), (64, 32), (96, 64)])
def test_codec_roundtrip_lossless(fmt, h, w):
    rgb = _img(1, h, w)
    data = encode_image(rgb, fmt)
    back = decode_image(data, fmt, w, h)
    np.testing.assert_array_equal(back, rgb)


def test_png_filters_decode():
    """Our decoder must handle filtered PNGs, not just our own filter-0
    output: synthesize scanlines with each filter type and round-trip."""
    import struct
    import zlib

    from simhash_ray.imgcodec import _PNG_SIG, _chunk

    rng = np.random.default_rng(7)
    rgb = rng.integers(0, 256, (5, 4, 3), dtype=np.uint8)
    h, w = rgb.shape[:2]
    # build filtered scanlines manually (filters 0..4, one per row)
    prev = np.zeros(w * 3, dtype=np.int32)
    lines = []
    for y in range(h):
        cur = rgb[y].reshape(-1).astype(np.int32)
        ftype = y % 5
        enc = cur.copy()
        if ftype == 1:
            enc[3:] = (cur[3:] - cur[:-3]) % 256
        elif ftype == 2:
            enc = (cur - prev) % 256
        elif ftype == 3:
            for x in range(w * 3):
                left = cur[x - 3] if x >= 3 else 0
                enc[x] = (cur[x] - ((left + prev[x]) >> 1)) % 256
        elif ftype == 4:
            for x in range(w * 3):
                a = cur[x - 3] if x >= 3 else 0
                b = prev[x]
                c = prev[x - 3] if x >= 3 else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[x] = (cur[x] - pred) % 256
        lines.append(bytes([ftype]) + bytes(enc.astype(np.uint8)))
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + _chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(decode_image(png, "png", w, h), rgb)


def test_phash_deterministic_and_fmt_invariant():
    rgb = _img(2)
    p = phash64(rgb)
    assert p == phash64(rgb)
    for fmt in FORMATS:  # lossless re-encode must not move the phash
        back = decode_image(encode_image(rgb, fmt), fmt, 64, 64)
        assert phash64(back) == p


def test_phash_small_perturbation_is_near():
    rgb = _img(3).astype(np.int16)
    noisy = np.clip(rgb + np.random.default_rng(4).integers(-2, 3, rgb.shape), 0, 255)
    d = hamming64(
        phash_to_uint64(np.array([phash64(rgb.astype(np.uint8))])),
        phash_to_uint64(np.array([phash64(noisy.astype(np.uint8))])),
    )[0]
    assert d <= 6


def test_phash_different_images_far():
    d = hamming64(
        phash_to_uint64(np.array([phash64(_img(5))])),
        phash_to_uint64(np.array([phash64(_img(6))])),
    )[0]
    assert d > 10


def test_phash_rejects_bad_dims():
    with pytest.raises(ValueError):
        phash64(np.zeros((33, 32, 3), dtype=np.uint8))


def test_decode_image_batch_matches_per_row():
    """The grouped frombuffer batch decoder must be row-for-row
    identical to decode_image across mixed formats, sizes, padded BMP
    rows (w not divisible by 4), and interleaved group order."""
    from simhash_ray.imgcodec import decode_image_batch

    rng = np.random.default_rng(7)
    rows = []
    for fmt in FORMATS:
        for (h, w) in ((8, 8), (5, 7), (16, 6)):
            for _ in range(3):
                rgb = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
                rows.append((encode_image(rgb, fmt), fmt, w, h, rgb))
    rng.shuffle(rows)
    datas = [r[0] for r in rows]
    fmts = [r[1] for r in rows]
    ws = [r[2] for r in rows]
    hs = [r[3] for r in rows]
    got = decode_image_batch(datas, fmts, ws, hs)
    for g, (data, fmt, w, h, rgb) in zip(got, rows):
        np.testing.assert_array_equal(g, decode_image(data, fmt, w, h))
        np.testing.assert_array_equal(g, rgb)


def test_decode_image_batch_nonuniform_bmp_falls_back():
    """A BMP with an unusual-but-valid header layout must still decode
    (per-row fallback), not crash the uniform fast path."""
    from simhash_ray.imgcodec import decode_image_batch, encode_bmp

    rng = np.random.default_rng(8)
    rgb = rng.integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    data = bytearray(encode_bmp(rgb))
    # append trailing junk: offset+seg still <= len, header intact
    data.extend(b"\x00" * 7)
    got = decode_image_batch([bytes(data)], ["bmp"], [4], [4])
    np.testing.assert_array_equal(got[0], rgb)


def test_dihedral_phash_invariant_under_all_8_symmetries():
    """The canonical hash is constant on the whole dihedral orbit
    (4 rotations x optional mirror), while the plain phash is NOT
    mirror-invariant — the gap dedup_images_dihedral exists to close."""
    from simhash_ray.phash import dihedral_phash64

    rng = np.random.default_rng(3)
    for side in (32, 64):
        img = rng.integers(0, 256, (side, side, 3), dtype=np.uint8)
        base = dihedral_phash64(img)
        variants = []
        for k in range(4):
            rot = np.rot90(img, k)
            variants += [rot, rot[:, ::-1]]
        for v in variants:
            assert dihedral_phash64(np.ascontiguousarray(v)) == base
        mirrored = np.ascontiguousarray(img[:, ::-1])
        assert phash64(img) != phash64(mirrored)  # plain hash splits the pair


def test_dihedral_phash_batch_matches_scalar_and_is_orbit_min():
    from simhash_ray.phash import (
        dihedral_phash64,
        dihedral_phash_batch_32,
        gray32_from_rgb,
        phash_batch_32,
    )

    rng = np.random.default_rng(4)
    imgs = rng.integers(0, 256, (5, 64, 64, 3), dtype=np.uint8)
    thumbs = gray32_from_rgb(imgs)
    batch = dihedral_phash_batch_32(thumbs)
    for i in range(5):
        assert int(batch[i]) == dihedral_phash64(imgs[i])
        # canonical == min-as-uint64 over the 8 explicitly listed variants
        orbit = []
        t = thumbs[i]
        for k in range(4):
            rot = np.rot90(t, k)
            orbit += [rot, rot[:, ::-1]]
        sigs = phash_batch_32(np.ascontiguousarray(np.stack(orbit)))
        assert np.int64(batch[i]).view(np.uint64) == sigs.view(np.uint64).min()


def test_gray32_matches_phash64_pipeline():
    """phash_batch_32(gray32_from_rgb(x)) == phash64(x) — one audited
    kernel behind scalar, batch, fixture and dihedral paths."""
    from simhash_ray.phash import gray32_from_rgb, phash_batch_32

    rng = np.random.default_rng(5)
    for side in (32, 96):
        img = rng.integers(0, 256, (side, side, 3), dtype=np.uint8)
        assert int(phash_batch_32(gray32_from_rgb(img)[None])[0]) == phash64(img)
