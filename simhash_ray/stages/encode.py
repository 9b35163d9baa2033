"""SimHash encoder stage — the flagship map_batches actor (SURVEY.md §2.2 M4).

Mirrors the reference's runner pattern: N model replicas each owning
private hasher state behind a queue
(/root/reference/src/Htm/Runner.hs:37-71, pool wiring
/root/reference/app/simhash-runner.hs:163-170).  Here a replica is one
actor in a ``map_batches`` pool; the state loaded once per actor
(reference: the C++ model; ours: the token-hash cache + config) lives
in ``__init__``, per-batch work in ``__call__`` — zero-copy Arrow in,
Arrow out.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..config import SimHashConfig
from ..simhash import TokenHashCache, simhash_batch


class SimHashEncoder:
    """Callable class for ``map_batches``: adds an int64 ``simhash``
    column computed from a text column.  Conforms to the ``Stage``
    protocol (stages/base.py) — ``setup``/``process_batch``/
    ``checkpoint`` — so it is pluggable through ``compile_pipeline``
    as well as usable directly."""

    def __init__(
        self,
        cfg: SimHashConfig = SimHashConfig(),
        text_col: str = "caption",
        out_col: str = "simhash",
    ):
        self.cfg = cfg
        self.text_col = text_col
        self.out_col = out_col
        self.cache = TokenHashCache(cfg)

    def setup(self) -> None:  # state already built in __init__
        pass

    def checkpoint(self) -> dict:
        return {"config_hash": self.cfg.config_hash()}

    def process_batch(self, batch: pa.Table) -> pa.Table:
        sigs = simhash_batch(batch[self.text_col], self.cfg, self.cache)
        return batch.append_column(
            self.out_col, pa.array(sigs.view(np.int64), type=pa.int64())
        )

    __call__ = process_batch


def encode_signatures(
    ds: rd.Dataset,
    cfg: SimHashConfig = SimHashConfig(),
    text_col: str = "caption",
    out_col: str = "simhash",
    batch_size: int = 4096,
    concurrency=None,
) -> rd.Dataset:
    """Attach the 64-bit SimHash signature column via an actor pool.

    ``concurrency=None`` sizes an autoscaling pool (1, n_cpus) from the
    cluster; pass an int or (min, max) to pin it.  batch_size ~4k keeps
    per-batch numpy intermediates (n_digests × 64 lanes) in cache.
    """
    if concurrency is None:
        import ray

        n_cpus = int(ray.cluster_resources().get("CPU", 4))
        # small min floor: pool spawn cost is proportional to the
        # floor (hurts the high-CPU run), while a 1-actor start
        # serializes the stage head.  Floor and cap both stay below
        # the cluster CPU count so upstream read/map tasks never
        # starve (a pool that reserves every CPU deadlocks tiny
        # clusters).
        concurrency = (
            max(1, min(4, n_cpus // 2)),
            max(1, n_cpus - 1),  # strictly below the CPU count: a pool
            # reserving every core starves the feeding read/map tasks
        )
    return ds.map_batches(
        SimHashEncoder,
        fn_constructor_kwargs={"cfg": cfg, "text_col": text_col, "out_col": out_col},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )
