"""simhash_ray — a Ray-Data-native near-duplicate detection + clustering
engine, built from scratch with the capabilities of Lupino/simhash
(reference surveyed in /root/repo/SURVEY.md).

Layout:
  config.py    pinned SimHash / LSH / pipeline configs
  simhash.py   64-bit SimHash encoder (oracle + vectorized)
  phash.py     8×8 DCT-sign perceptual hash (fixture-side)
  imgcodec.py  stdlib raw/BMP/PNG image encode/decode
  fixtures.py  deterministic image+caption fixture generator
  sources/     table readers (Lance-or-Parquet adapter)
  stages/      Ray Data stage building blocks (encode, band, pair,
               verify, cluster, text ops, ann, minhash, multimodal)
  pipelines/   end-to-end pipelines (flagship image dedup, text dedup)
  state/       lineage manifests, metrics, resume
"""

from .config import DEFAULT_CONFIG, DedupConfig, LSHConfig, SimHashConfig
from .simhash import hamming64, simhash_batch, simhash_oracle

__all__ = [
    "DEFAULT_CONFIG",
    "DedupConfig",
    "LSHConfig",
    "SimHashConfig",
    "hamming64",
    "simhash_batch",
    "simhash_oracle",
]
