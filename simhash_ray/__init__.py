"""simhash_ray — Ray-Data-native near-duplicate detection engine.

Public surface (see README.md for the full map):

- flagship image pipeline: :func:`dedup_images`,
  :func:`dedup_images_checkpointed`, :func:`survivors`
- text-domain flagship: :func:`dedup_documents`
- building blocks live under ``simhash_ray.stages`` (encode, lsh,
  cluster, minhash, substring, ann, text, window, joins, multimodal)
  and ``simhash_ray.state`` (manifests, progress)
- the full query/operator catalog: ``simhash_ray.pipelines.queries``
- CLI: ``python -m simhash_ray dedup <table> --out DIR``

Nothing here calls ``ray.init`` — the caller owns the session
(driver contract, /root/repo/__ray_entry__.py).
"""

from .config import DEFAULT_CONFIG, DedupConfig, LSHConfig, SimHashConfig
from .pipelines.dedup_docs import dedup_documents
from .pipelines.dedup_images import (
    dedup_images,
    dedup_images_checkpointed,
    survivors,
)

__all__ = [
    "DEFAULT_CONFIG",
    "DedupConfig",
    "LSHConfig",
    "SimHashConfig",
    "dedup_documents",
    "dedup_images",
    "dedup_images_checkpointed",
    "survivors",
]
