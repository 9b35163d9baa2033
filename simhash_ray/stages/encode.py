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


# ---------------------------------------------------------------------------
# IDF-weighted SimHash (Charikar's weighted variant, exact-integer domain)

IDF_WEIGHT_CAP = 1_000_000  # keeps cnt·w·digests/doc < 2^63 at any corpus
IDF_BROADCAST_LIMIT = 50_000_000  # distinct digests in the ray.put table


def idf_weighted_signatures(
    docs: rd.Dataset,
    cfg: SimHashConfig = SimHashConfig(),
    text_col: str = "text",
    id_col: str = "doc_id",
    weight_cap: int = IDF_WEIGHT_CAP,
    broadcast_limit: int = IDF_BROADCAST_LIMIT,
) -> rd.Dataset:
    """(id, simhash) with each feature digest weighted by the exact
    integer IDF surrogate ``min(n_docs // df, weight_cap)`` — rare
    features dominate the sign fold, boilerplate features are damped
    (Charikar's weighted SimHash; the uniform encoder is the w ≡ 1
    special case, pinned by test at weight_cap=1).

    Exact-integer discipline: a float idf (ln-based) would make the
    ``adder > 0`` sign threshold depend on summation order and the
    engine's libm; the integer-rational weight makes every lane fold
    bit-reproducible, so the SQL oracle re-derives df, the weights and
    every signature from the staged digest multiset independently.

    Two streaming passes over the digest projection (recompute beats
    carrying): pass 1 folds per-block DISTINCT (doc, digest) partials
    through one digest groupby into the df table (broadcast via
    ray.put below ``broadcast_limit`` distinct digests; above it this
    raises — the hash-join scoring variant is the documented scale
    follow-up).  Pass 2 re-derives each doc's digest multiset locally
    and folds all 64 lanes with the weights applied — no shuffle.
    """
    import ray

    from ..functions.hashing import part_of_ints
    from ..simhash import simhash_digest_rows
    from .base import map_groups_typed

    n_docs = docs.count()
    narrow = docs.select_columns([id_col, text_col])
    n_parts = 64

    def digest_partial(batch: pa.Table) -> pa.Table:
        rows, digs, _ = simhash_digest_rows(batch[text_col], cfg)
        if len(digs) == 0:
            return pa.table(
                {"digest": pa.array([], type=pa.int64()),
                 "df": pa.array([], type=pa.int64()),
                 "part": pa.array([], type=pa.int32())}
            )
        # (row, digest) pairs are already distinct per row in the
        # projection, so per-block df partial = run-length over digest
        ds_ = np.sort(digs)
        first = np.ones(len(ds_), dtype=bool)
        first[1:] = ds_[1:] != ds_[:-1]
        starts = np.flatnonzero(first)
        cnt = np.diff(np.append(starts, len(ds_)))
        dd = ds_[starts].view(np.int64)
        return pa.table(
            {"digest": pa.array(dd, type=pa.int64()),
             "df": pa.array(cnt.astype(np.int64)),
             "part": pa.array(part_of_ints(n_parts, dd), type=pa.int32())}
        )

    def fold_df(group: pa.Table) -> pa.Table:
        d = group["digest"].to_numpy(zero_copy_only=False)
        c = group["df"].to_numpy(zero_copy_only=False)
        order = np.argsort(d, kind="stable")
        d, c = d[order], c[order]
        first = np.ones(len(d), dtype=bool)
        first[1:] = d[1:] != d[:-1]
        total = np.add.reduceat(c, np.flatnonzero(first))
        return pa.table(
            {"digest": pa.array(d[first], type=pa.int64()),
             "df": pa.array(total.astype(np.int64))}
        )

    df_ds = map_groups_typed(
        narrow.map_batches(digest_partial, batch_format="pyarrow"),
        "part",
        fold_df,
        pa.table({"digest": pa.array([], type=pa.int64()),
                  "df": pa.array([], type=pa.int64())}),
    ).materialize()
    n_distinct = df_ds.count()
    if n_distinct > broadcast_limit:
        raise ValueError(
            f"{n_distinct} distinct feature digests exceed the broadcast "
            f"limit {broadcast_limit}; shard the corpus or add the "
            "hash-join scoring path"
        )
    pdf = df_ds.to_pandas()
    dig_sorted = pdf["digest"].to_numpy().view(np.uint64)
    order = np.argsort(dig_sorted, kind="stable")
    dig_sorted = dig_sorted[order]
    w_sorted = np.minimum(
        n_docs // pdf["df"].to_numpy()[order], weight_cap
    ).astype(np.int64)
    ref = ray.put((dig_sorted, w_sorted))

    def weighted_fold(batch: pa.Table) -> pa.Table:
        ids = batch[id_col]
        n = batch.num_rows
        rows, digs, cnt = simhash_digest_rows(batch[text_col], cfg)
        sig = np.zeros(n, dtype=np.uint64)
        if len(digs):
            dig_s, w_s = ray.get(ref)
            w = w_s[np.searchsorted(dig_s, digs)]
            cw = cnt * w
            starts = np.flatnonzero(
                np.concatenate([[True], rows[1:] != rows[:-1]])
            )
            row_ids = rows[starts]
            for j in range(64):
                bit = ((digs >> np.uint64(j)) & np.uint64(1)).view(np.int64)
                contrib = np.where(bit == 1, cw, -cw)
                adder = np.add.reduceat(contrib, starts)
                sig[row_ids[adder > 0]] |= np.uint64(1) << np.uint64(j)
        return pa.table(
            {
                id_col: ids,
                "simhash": pa.array(sig.view(np.int64), type=pa.int64()),
            }
        )

    return narrow.map_batches(weighted_fold, batch_format="pyarrow")
