"""simhash_ray — Ray-Data-native near-duplicate detection engine.

Public surface (see README.md for the full map):

- flagship image pipeline: :func:`dedup_images`,
  :func:`dedup_images_checkpointed`, :func:`survivors`
- incremental ingest: :func:`dedup_images_incremental`,
  :func:`dedup_documents_incremental`,
  :func:`apply_remap`
- text-domain flagship: :func:`dedup_documents`
- curation ops: :func:`decontaminate`, :func:`topk_per_group`,
  :func:`exact_quantiles`, :func:`hash_sample`,
  :func:`stratified_sample`, :func:`cap_per_group`
- sources/sinks: :func:`read_table` / :func:`write_table`
  (Lance-or-Parquet), :func:`read_label_lines` /
  :func:`write_label_lines` (the reference's ``label, message`` line
  format, Utils.hs:38-54 semantics), :func:`read_jsonl` /
  :func:`write_jsonl`, :func:`read_csv_table`
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
from .pipelines.dedup_incremental import (
    apply_remap,
    dedup_documents_incremental,
    dedup_images_incremental,
)
from .sources.tables import read_table, write_table
from .sources.textlines import (
    read_csv_table,
    read_jsonl,
    read_label_lines,
    write_jsonl,
    write_label_lines,
)
from .stages.decontam import decontaminate
from .stages.sample import cap_per_group, hash_sample, stratified_sample
from .stages.topk import exact_quantiles, topk_per_group

__all__ = [
    "DEFAULT_CONFIG",
    "DedupConfig",
    "LSHConfig",
    "SimHashConfig",
    "apply_remap",
    "cap_per_group",
    "decontaminate",
    "dedup_documents",
    "dedup_images",
    "dedup_images_checkpointed",
    "dedup_documents_incremental",
    "dedup_images_incremental",
    "exact_quantiles",
    "hash_sample",
    "read_csv_table",
    "read_jsonl",
    "read_label_lines",
    "read_table",
    "stratified_sample",
    "survivors",
    "topk_per_group",
    "write_jsonl",
    "write_label_lines",
    "write_table",
]
