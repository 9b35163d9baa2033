"""64-bit perceptual hash (8×8 DCT-sign) — pinned implementation.

The north-rule input table carries ``phash:int64`` as a *precomputed*
column (BASELINE.json input_hint); the pipeline treats it as opaque
signature bits.  This module is the fixture generator's pinned
implementation, and also backs the per-row invariant check
(recompute-phash-of-decoded-representative == phash column).

Pinned spec:
1. grayscale = 0.299 R + 0.587 G + 0.114 B (float64)
2. downsample to 32×32 by exact block mean (fixture sizes are
   multiples of 32: 32/64/96)
3. orthonormal 2-D DCT-II: D @ G @ D.T with D the 32×32 DCT matrix
4. take the low-frequency top-left 8×8 block, median over all 64
   coefficients, bit[r*8+c] = 1 iff coeff[r,c] > median
5. pack LSB-first into a uint64 (returned as int64 two's-complement)
"""

from __future__ import annotations

import numpy as np

_N = 32
_LOW = 8


def _dct_matrix(n: int = _N) -> np.ndarray:
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    d = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    d[0] /= np.sqrt(2.0)
    return d


_D = _dct_matrix()
_SHIFTS = np.arange(64, dtype=np.uint64)


def phash64(rgb: np.ndarray) -> int:
    """Perceptual hash of an (h, w, 3) uint8 RGB array → int64 bits."""
    h, w, _ = rgb.shape
    if h % _N or w % _N:
        raise ValueError(f"dimensions must be multiples of {_N}, got {h}x{w}")
    gray = (
        0.299 * rgb[..., 0].astype(np.float64)
        + 0.587 * rgb[..., 1]
        + 0.114 * rgb[..., 2]
    )
    small = gray.reshape(_N, h // _N, _N, w // _N).mean(axis=(1, 3))
    coeffs = _D @ small @ _D.T
    low = coeffs[:_LOW, :_LOW]
    med = np.median(low)
    bits = (low > med).reshape(-1)
    sig = np.uint64(0)
    sig = (bits.astype(np.uint64) << _SHIFTS).sum(dtype=np.uint64)
    return int(np.int64(sig))


def phash_to_uint64(phash: np.ndarray) -> np.ndarray:
    """int64 column → uint64 bit view (for Hamming math)."""
    return np.asarray(phash, dtype=np.int64).view(np.uint64)


def gray32_from_rgb(rgb: np.ndarray) -> np.ndarray:
    """(h, w, 3) uint8 → (32, 32) float64 gray thumbnail (steps 1-2 of
    the pinned spec); also accepts a (B, h, w, 3) stack → (B, 32, 32)."""
    h, w = rgb.shape[-3:-1]
    if h % _N or w % _N:
        raise ValueError(f"dimensions must be multiples of {_N}, got {h}x{w}")
    gray = (
        0.299 * rgb[..., 0].astype(np.float64)
        + 0.587 * rgb[..., 1]
        + 0.114 * rgb[..., 2]
    )
    return gray.reshape(
        *gray.shape[:-2], _N, h // _N, _N, w // _N
    ).mean(axis=(-3, -1))


def phash_batch_32(gray32: np.ndarray) -> np.ndarray:
    """Vectorized pinned phash (steps 3-5) for a (B, 32, 32) float
    stack → int64 array.  ``phash64`` == ``phash_batch_32(thumb[None])[0]``
    (pinned by tests)."""
    coeffs = _D @ gray32 @ _D.T  # broadcasted BLAS matmul (B, 32, 32)
    low = coeffs[:, :_LOW, :_LOW].reshape(len(gray32), -1)
    med = np.median(low, axis=1, keepdims=True)
    bits = (low > med).astype(np.uint64)
    return (bits << _SHIFTS[None, :]).sum(axis=1, dtype=np.uint64).view(np.int64)


def dihedral_phash_batch_32(gray32: np.ndarray) -> np.ndarray:
    """Dihedral-canonical perceptual hash: min (as uint64) of the
    pinned phash over the 8 symmetries of the 32×32 thumbnail (4
    rotations × optional mirror).  Every image in a dihedral orbit
    hashes identically, so mirrored/rotated duplicates — invisible to
    the plain phash — become Hamming-0 in this space.  The orbit is
    taken on the THUMBNAIL: block-mean commutes with the symmetry
    group when h, w are multiples of 32 (north-rule sizes), so
    thumbnail-orbit == image-orbit."""
    (b,) = gray32.shape[:1]
    best = np.full(b, np.iinfo(np.uint64).max, dtype=np.uint64)
    t = gray32
    for _ in range(4):
        t = np.rot90(t, axes=(-2, -1))
        for v in (t, t[..., ::-1]):
            best = np.minimum(
                best, phash_batch_32(np.ascontiguousarray(v)).view(np.uint64)
            )
    return best.view(np.int64)


def dihedral_phash64(rgb: np.ndarray) -> int:
    """Dihedral-canonical hash of one (h, w, 3) uint8 RGB image."""
    return int(dihedral_phash_batch_32(gray32_from_rgb(rgb)[None])[0])


_D16 = _dct_matrix(16)


def tile_phash_batch_32(gray32: np.ndarray) -> np.ndarray:
    """Per-quadrant perceptual hashes: (B, 32, 32) gray stack →
    (B, 4) int64, tile order row-major (TL, TR, BL, BR), each tile
    hashed with the pinned DCT-sign rule at n=16 (same steps 3-5 as the
    global hash: orthonormal 2-D DCT-II, low 8×8 block, median
    threshold, LSB-first pack).

    Rationale: every coefficient of the GLOBAL hash sees every pixel,
    so a crop / occlusion / logo overlay that touches one corner
    perturbs all 64 bits unboundedly.  A quadrant edit perturbs only
    the tiles it covers — the untouched tiles still collide at Hamming
    0, which is what the tile near-dup operator banks on
    (pipelines/dedup_images.tile_dup_pairs)."""
    b = len(gray32)
    tiles = (
        gray32.reshape(b, 2, 16, 2, 16)
        .transpose(0, 1, 3, 2, 4)
        .reshape(b * 4, 16, 16)
    )
    coeffs = _D16 @ tiles @ _D16.T
    low = coeffs[:, :_LOW, :_LOW].reshape(b * 4, -1)
    med = np.median(low, axis=1, keepdims=True)
    bits = (low > med).astype(np.uint64)
    packed = (bits << _SHIFTS[None, :]).sum(axis=1, dtype=np.uint64)
    return packed.view(np.int64).reshape(b, 4)
