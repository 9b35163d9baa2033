"""Stdlib-only image codecs: raw RGB8, 24-bit BMP, 8-bit RGB PNG.

No Pillow in the sandbox (SURVEY.md §7 risks), so the fixture ``fmt``
vocabulary is restricted to formats we can encode/decode with numpy +
zlib.  All three are lossless → the per-row invariant (decoded-pixel
allclose vs source) is exact equality here; the PSNR ≥ 40 dB branch of
the north rule only applies to lossy formats, which cannot occur
in-sandbox.

- ``raw``: C-order RGB8 bytes, length w*h*3.
- ``bmp``: BITMAPINFOHEADER, 24 bpp BI_RGB, BGR pixel order, rows
  padded to 4 bytes, bottom-up.
- ``png``: 8-bit/channel RGB, single IDAT, encoder emits filter 0;
  decoder implements all five standard filters (0-4).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

FORMATS = ("raw", "bmp", "png")


# --------------------------------------------------------------------------
# raw
def encode_raw(rgb: np.ndarray) -> bytes:
    return np.ascontiguousarray(rgb, dtype=np.uint8).tobytes()


def decode_raw(data: bytes, w: int, h: int) -> np.ndarray:
    arr = np.frombuffer(data, dtype=np.uint8)
    if arr.size != w * h * 3:
        raise ValueError(f"raw payload {arr.size} != {w}*{h}*3")
    return arr.reshape(h, w, 3)


# --------------------------------------------------------------------------
# bmp
def encode_bmp(rgb: np.ndarray) -> bytes:
    h, w, _ = rgb.shape
    row_size = (w * 3 + 3) & ~3
    img_size = row_size * h
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 14 + 40)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    rows = np.zeros((h, row_size), dtype=np.uint8)
    bgr = rgb[::-1, :, ::-1]  # bottom-up, BGR
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    return header + info + rows.tobytes()


def decode_bmp(data: bytes) -> np.ndarray:
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    offset = struct.unpack_from("<I", data, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", data, 14)
    bpp = struct.unpack_from("<H", data, 28)[0]
    if bpp != 24 or hdr_size < 40:
        raise ValueError(f"unsupported BMP (bpp={bpp})")
    flip = h > 0
    h = abs(h)
    row_size = (w * 3 + 3) & ~3
    rows = np.frombuffer(data, dtype=np.uint8, count=row_size * h, offset=offset)
    rows = rows.reshape(h, row_size)[:, : w * 3].reshape(h, w, 3)
    bgr = rows[::-1] if flip else rows
    return np.ascontiguousarray(bgr[:, :, ::-1])


# --------------------------------------------------------------------------
# png
_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(rgb: np.ndarray) -> bytes:
    h, w, _ = rgb.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    scan = np.zeros((h, 1 + w * 3), dtype=np.uint8)
    scan[:, 1:] = np.ascontiguousarray(rgb, dtype=np.uint8).reshape(h, w * 3)
    idat = zlib.compress(scan.tobytes(), 6)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def _unfilter(scan: np.ndarray, w: int, h: int) -> np.ndarray:
    """Undo PNG per-scanline filters (types 0-4) for 3-byte pixels."""
    bpp = 3
    out = np.zeros((h, w * bpp), dtype=np.uint8)
    for y in range(h):
        ftype = scan[y, 0]
        line = scan[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(w * bpp, np.int32)
        if ftype == 0:
            cur = line
        elif ftype == 1:  # Sub
            cur = line.copy()
            for x in range(bpp, w * bpp):
                cur[x] = (cur[x] + cur[x - bpp]) & 0xFF
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype == 3:  # Average
            cur = line.copy()
            for x in range(w * bpp):
                left = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line.copy()
            for x in range(w * bpp):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {ftype}")
        out[y] = cur.astype(np.uint8)
    return out


def decode_png(data: bytes) -> np.ndarray:
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, w = 8, None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype, _, _, interlace = struct.unpack(">IIBBBBB", payload)
            if depth != 8 or ctype != 2 or interlace != 0:
                raise ValueError("only 8-bit RGB non-interlaced PNG supported")
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
    raw = zlib.decompress(bytes(idat))
    scan = np.frombuffer(raw, dtype=np.uint8).reshape(h, 1 + w * 3)
    return _unfilter(scan, w, h).reshape(h, w, 3)


# --------------------------------------------------------------------------
def encode_image(rgb: np.ndarray, fmt: str) -> bytes:
    if fmt == "raw":
        return encode_raw(rgb)
    if fmt == "bmp":
        return encode_bmp(rgb)
    if fmt == "png":
        return encode_png(rgb)
    raise ValueError(f"unknown fmt {fmt!r}")


def decode_image(data: bytes, fmt: str, w: int, h: int) -> np.ndarray:
    if fmt == "raw":
        return decode_raw(data, w, h)
    if fmt == "bmp":
        return decode_bmp(data)
    if fmt == "png":
        return decode_png(data)
    raise ValueError(f"unknown fmt {fmt!r}")


def decode_image_batch(
    datas: list, fmts: list, ws: list, hs: list
) -> list[np.ndarray]:
    """Batch decode: group rows by (fmt, w, h) and decode each uniform
    raw/BMP group with ONE ``frombuffer``+reshape over the concatenated
    payloads instead of a per-row Python call — the per-row call
    overhead (not the byte shuffling) dominated the 400k-image embed
    bench.  PNG (zlib + per-scanline filters) and non-uniform rows fall
    back to :func:`decode_image`; output is row-for-row identical to
    the per-row path (pinned by tests)."""
    from collections import defaultdict

    n = len(datas)
    out: list = [None] * n
    groups: dict = defaultdict(list)
    for i in range(n):
        groups[(fmts[i], ws[i], hs[i])].append(i)
    for (fmt, w, h), idxs in groups.items():
        if fmt == "raw" and all(len(datas[i]) == w * h * 3 for i in idxs):
            buf = np.frombuffer(b"".join(datas[i] for i in idxs), dtype=np.uint8)
            arrs = buf.reshape(len(idxs), h, w, 3)
            for j, i in enumerate(idxs):
                out[i] = arrs[j]
        elif fmt == "bmp":
            row_size = (w * 3 + 3) & ~3
            seg = row_size * h
            uniform = True
            for i in idxs:
                d = datas[i]
                if (
                    d[:2] != b"BM"
                    or struct.unpack_from("<H", d, 28)[0] != 24
                    or struct.unpack_from("<Iii", d, 14) != (40, w, h)
                    or struct.unpack_from("<I", d, 10)[0] + seg > len(d)
                ):
                    uniform = False
                    break
            if not uniform:
                for i in idxs:
                    out[i] = decode_image(datas[i], fmt, w, h)
                continue
            buf = np.frombuffer(
                b"".join(
                    datas[i][
                        struct.unpack_from("<I", datas[i], 10)[0] :
                        struct.unpack_from("<I", datas[i], 10)[0] + seg
                    ]
                    for i in idxs
                ),
                dtype=np.uint8,
            )
            rows = buf.reshape(len(idxs), h, row_size)[:, :, : w * 3]
            rgb = rows.reshape(len(idxs), h, w, 3)[:, ::-1, :, ::-1]
            rgb = np.ascontiguousarray(rgb)
            for j, i in enumerate(idxs):
                out[i] = rgb[j]
        else:
            for i in idxs:
                out[i] = decode_image(datas[i], fmt, w, h)
    return out
