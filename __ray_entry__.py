"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: no
``ray.init`` / ``ray.shutdown`` here or in simhash_ray library code.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline (SimHash encode → exact collapse → LSH banding
    → Hamming verify → min-label clustering → representatives) on the
    deterministic sf0.001-scale north-rule fixture; returns the cluster
    assignment Dataset (image_id, cluster_id, is_representative)."""
    from simhash_ray.pipelines.queries import q_images_dedup

    return q_images_dedup("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline (SURVEY.md §2 and the
    §2.5 training-data additions).  Each callable takes ``sf_dir``."""
    from simhash_ray.pipelines.queries import ray_queries

    return ray_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for EVERY registered query (same column
    names; floats rounded identically on both sides).  Operators that
    are not SQL-expressible end-to-end (keyed hashing, LSH banding,
    decode) stage their deterministic intermediates to parquet and the
    oracle re-runs the downstream half (verify / clustering /
    expansion) from the staged files — see the 'oracle staging' section
    in simhash_ray/pipelines/queries.py."""
    from simhash_ray.pipelines.queries import oracle_sqls

    return oracle_sqls()
