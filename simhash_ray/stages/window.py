"""Event-stream windowing on a batch engine (SURVEY.md §2.5 additions).

Ray Data has no event-time windows; the idiomatic mapping (ray_guide)
is: tumbling windows = derive the bucket key in ``map_batches`` +
partial pre-aggregation, then one small ``groupby``; session windows =
``groupby(key).map_groups`` over ts-sorted groups with the gap rule in
pandas.  Ordering assumption: sessionization sorts within each user
group — no global order is required.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Count, Sum


def tumbling_window_agg(
    events: rd.Dataset,
    window_s: int = 3600,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> rd.Dataset:
    """Per (key, window): row count and value sum.

    Pre-aggregates inside each batch (one row per key-window per batch)
    before the groupby shuffle — the wide input never moves, only
    partials.  Window = epoch-seconds floor-div, matching DuckDB's
    ``to_timestamp(epoch(ts)//W*W)``."""

    def partial(batch: pa.Table) -> pa.Table:
        # explicit schema so empty batches don't drift the block schema
        part_schema = pa.schema(
            [
                (key_col, batch.schema.field(key_col).type),
                ("window_start", pa.int64()),
                ("n_events", pa.int64()),
                ("sum_value", pa.float64()),
            ]
        )
        key_arr = batch[key_col]
        if isinstance(key_arr, pa.ChunkedArray):
            key_arr = key_arr.combine_chunks()
        if batch.num_rows == 0:
            return part_schema.empty_table()
        vals_np = batch[value_col].to_numpy(zero_copy_only=False)
        if (
            key_arr.null_count
            or batch[value_col].null_count
            or batch[ts_col].null_count
            # a float NaN stored as a VALUE (null_count == 0) must take
            # the NaN-skipping pandas path too — np.add.reduceat would
            # propagate it where the pinned semantics skip it
            or (
                vals_np.dtype.kind == "f" and bool(np.isnan(vals_np).any())
            )
        ):
            # rare null-bearing batch: the pandas path preserves the
            # pinned groupby semantics (null keys dropped, NaN-skipping
            # sums) exactly
            ts_c = batch[ts_col].cast(pa.timestamp("us")).cast(pa.int64())
            bucket_c = pc.multiply(
                pc.floor(pc.divide(ts_c, window_s * 1_000_000)).cast(pa.int64()),
                window_s * 1_000_000,
            )
            df = pa.table(
                {
                    key_col: key_arr,
                    "window_start": bucket_c,
                    "sum_value": batch[value_col],
                }
            ).to_pandas()
            agg = df.groupby([key_col, "window_start"], as_index=False).agg(
                n_events=("sum_value", "size"), sum_value=("sum_value", "sum")
            )[[key_col, "window_start", "n_events", "sum_value"]]
            return pa.Table.from_pandas(
                agg, preserve_index=False, schema=part_schema
            )
        # hot path: Arrow dictionary-encode + lexsort + segmented
        # reduction — zero pandas conversion (round-4 verdict item 6)
        ts = (
            batch[ts_col]
            .cast(pa.timestamp("us"))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        w_us = window_s * 1_000_000
        # truncating (toward-zero) division, matching the pinned
        # fallback semantics (pc.divide truncates) and the DuckDB
        # oracle's epoch//W for pre-epoch timestamps — numpy // floors
        q = np.where(ts >= 0, ts // w_us, -((-ts) // w_us))
        bucket = q * w_us
        denc = key_arr.dictionary_encode()
        kcodes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vals = vals_np.astype(np.float64)
        order = np.lexsort((bucket, kcodes))
        kc, bu, va = kcodes[order], bucket[order], vals[order]
        new = np.ones(len(kc), dtype=bool)
        new[1:] = (kc[1:] != kc[:-1]) | (bu[1:] != bu[:-1])
        starts = np.flatnonzero(new)
        counts = np.diff(np.append(starts, len(kc)))
        sums = np.add.reduceat(va, starts)
        return pa.table(
            {
                key_col: denc.dictionary.take(pa.array(kc[starts])),
                "window_start": pa.array(bu[starts], type=pa.int64()),
                "n_events": pa.array(counts, type=pa.int64()),
                "sum_value": pa.array(sums, type=pa.float64()),
            },
            schema=part_schema,
        )

    partials = events.select_columns([key_col, ts_col, value_col]).map_batches(
        partial, batch_format="pyarrow"
    )
    out = partials.groupby([key_col, "window_start"]).aggregate(
        Sum("n_events", alias_name="n_events"),
        Sum("sum_value", alias_name="sum_value"),
    )

    def finish(batch: pa.Table) -> pa.Table:
        ws = batch["window_start"].cast(pa.timestamp("us"))
        val = np.round(batch["sum_value"].to_numpy(zero_copy_only=False), 6)
        return pa.table(
            {
                key_col: batch[key_col],
                "window_start": ws,
                "n_events": batch["n_events"],
                "sum_value": pa.array(val, type=pa.float64()),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


def hopping_window_agg(
    events: rd.Dataset,
    size_s: int = 7200,
    hop_s: int = 3600,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> rd.Dataset:
    """Hopping (sliding) windows: size ``size_s`` advancing by
    ``hop_s`` — each event lands in ``size/hop`` overlapping windows.
    The fan-out happens INSIDE the per-batch partial (a tiled bucket
    column), so the shuffle still moves only pre-aggregated partials,
    ``size/hop`` × the tumbling volume, never raw events."""
    assert size_s % hop_s == 0
    k = size_s // hop_s
    hop_us = hop_s * 1_000_000

    part_schema = pa.schema(
        [
            ("window_start", pa.int64()),
            (key_col, pa.string()),
            ("n_events", pa.int64()),
            ("sum_value", pa.float64()),
        ]
    )

    def partial(batch: pa.Table) -> pa.Table:
        ts = (
            batch[ts_col]
            .cast(pa.timestamp("us"))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        base = (ts // hop_us) * hop_us  # most recent hop boundary
        keys = batch[key_col].to_numpy(zero_copy_only=False)
        vals = batch[value_col].to_numpy(zero_copy_only=False)
        # window starts: base, base-hop, ..., base-(k-1)*hop
        starts = np.concatenate([base - j * hop_us for j in range(k)])
        df = pd.DataFrame(
            {
                "window_start": starts,
                key_col: np.tile(keys, k),
                "n_events": np.ones(len(starts), dtype=np.int64),
                "sum_value": np.tile(vals, k),
            }
        )
        agg = df.groupby(["window_start", key_col], as_index=False).agg(
            n_events=("n_events", "sum"), sum_value=("sum_value", "sum")
        )
        return pa.Table.from_pandas(agg, preserve_index=False, schema=part_schema)

    out = (
        events.select_columns([key_col, ts_col, value_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby([key_col, "window_start"])
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("sum_value", alias_name="sum_value"),
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                key_col: batch[key_col],
                "window_start": batch["window_start"].cast(pa.timestamp("us")),
                "n_events": batch["n_events"],
                "sum_value": pa.array(
                    np.round(
                        batch["sum_value"].to_numpy(zero_copy_only=False), 6
                    ),
                    type=pa.float64(),
                ),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


def sessionize(
    events: rd.Dataset,
    gap_s: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    n_parts: int = 64,
) -> rd.Dataset:
    """Session windows per user: a new session starts when the gap from
    the previous event exceeds ``gap_s``.  Returns one row per session:
    (user_id, session_start, session_end, n_events).

    One coarse groupby on a hash partition of the user id, then the
    whole partition sessionizes in a single numpy pass (lexsort by
    (user, ts) → session-start mask → run-boundary gathers) — no
    per-user Python, so extreme user cardinality costs nothing beyond
    the one shuffle (round-1 ran a pandas ``map_groups`` per user)."""
    from ..functions.hashing import part_of_ints, part_of_strings

    def tag(batch: pa.Table) -> pa.Table:
        users = batch[user_col]
        if pa.types.is_integer(users.type):
            part = part_of_ints(
                n_parts, users.to_numpy(zero_copy_only=False).astype(np.int64)
            )
        else:
            part = part_of_strings(
                np.asarray(users.to_numpy(zero_copy_only=False), dtype=object),
                n_parts,
            )
        return pa.table(
            {
                user_col: users,
                ts_col: batch[ts_col].cast(pa.timestamp("us")),
                "part": pa.array(part, type=pa.int32()),
            }
        )

    gap_us = np.int64(gap_s * 1_000_000)

    def per_part(group: pa.Table) -> pa.Table:
        users = group[user_col].to_numpy(zero_copy_only=False)
        ts = group[ts_col].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        ts_i = ts.view(np.int64)
        order = np.lexsort((ts_i, users))
        users, ts_i = users[order], ts_i[order]
        n = len(users)
        if n == 0:
            return pa.table(
                {
                    user_col: group[user_col],
                    "session_start": pa.array([], type=pa.timestamp("us")),
                    "session_end": pa.array([], type=pa.timestamp("us")),
                    "n_events": pa.array([], type=pa.int64()),
                }
            )
        start = np.ones(n, dtype=bool)
        start[1:] = (users[1:] != users[:-1]) | (ts_i[1:] - ts_i[:-1] > gap_us)
        starts = np.flatnonzero(start)
        ends = np.append(starts[1:], n) - 1
        return pa.table(
            {
                user_col: pa.array(users[starts], type=group[user_col].type),
                "session_start": pa.array(
                    ts_i[starts].view("datetime64[us]"), type=pa.timestamp("us")
                ),
                "session_end": pa.array(
                    ts_i[ends].view("datetime64[us]"), type=pa.timestamp("us")
                ),
                "n_events": pa.array((ends - starts + 1).astype(np.int64)),
            }
        )

    return (
        events.select_columns([user_col, ts_col])
        .map_batches(tag, batch_format="pyarrow")
        .groupby("part")
        .map_groups(per_part, batch_format="pyarrow")
    )


def rolling_time_avg(
    events: rd.Dataset,
    window_s: int = 600,
    key_col: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
    id_col: str = "event_id",
    n_parts: int = 64,
    virtual_axis_limit: int = 2**62,
) -> rd.Dataset:
    """Per-row trailing time-window aggregate: for every event, the
    count and mean of ``val_col`` over the key's events in
    ``[ts - window_s, ts]`` — SQL ``AVG(value) OVER (PARTITION BY key
    ORDER BY ts RANGE BETWEEN INTERVAL w PRECEDING AND CURRENT ROW)``,
    including the equal-``ts`` peer semantics (all rows sharing the
    current timestamp are in the frame).

    Same shuffle shape as :func:`sessionize`: one coarse groupby on a
    hash partition of the key, then the WHOLE partition is processed
    in a single numpy pass — keys are lexsorted into contiguous runs
    and each run's timestamps are lifted onto a disjoint virtual time
    axis (run_index · span), so ONE global ``searchsorted`` pair
    resolves every row's window without per-key Python and windows can
    never cross keys.  Window sums come from one prefix sum.
    Assumes non-null values (the fixture's contract; SQL AVG null
    semantics would need a second validity prefix sum)."""
    from ..functions.hashing import part_of_ints, part_of_strings

    win_us = np.int64(window_s) * 1_000_000

    def tag(batch: pa.Table) -> pa.Table:
        keys = batch[key_col]
        if pa.types.is_integer(keys.type):
            part = part_of_ints(
                n_parts, keys.to_numpy(zero_copy_only=False).astype(np.int64)
            )
        else:
            part = part_of_strings(
                np.asarray(keys.to_numpy(zero_copy_only=False), dtype=object),
                n_parts,
            )
        return pa.table(
            {
                id_col: batch[id_col],
                key_col: keys,
                "ts_us": batch[ts_col].cast(pa.timestamp("us")).cast(pa.int64()),
                val_col: batch[val_col],
                "part": pa.array(part, type=pa.int32()),
            }
        )

    out_schema = pa.schema(
        [(id_col, pa.int64()), ("n_win", pa.int64()), ("rolling_avg", pa.float64())]
    )

    def per_part(group: pa.Table) -> pa.Table:
        n = group.num_rows
        if n == 0:
            return out_schema.empty_table()
        keys = group[key_col].to_numpy(zero_copy_only=False)
        ts = group["ts_us"].to_numpy(zero_copy_only=False).astype(np.int64)
        vals = group[val_col].to_numpy(zero_copy_only=False).astype(np.float64)
        ids = group[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ts, keys))
        keys, ts, vals, ids = keys[order], ts[order], vals[order], ids[order]
        run_start = np.ones(n, dtype=bool)
        run_start[1:] = keys[1:] != keys[:-1]
        run_id = np.cumsum(run_start) - 1
        ts_rel = ts - ts.min()
        span = np.int64(int(ts_rel.max()) + int(win_us) + 2)
        n_runs = int(run_id[-1]) + 1
        if n_runs * int(span) >= virtual_axis_limit:  # axis would overflow:
            # per-run searchsorted fallback (same semantics, looped)
            starts = np.flatnonzero(run_start)
            ends = np.append(starts[1:], n)
            lo = np.empty(n, np.int64)
            hi = np.empty(n, np.int64)
            for s, e in zip(starts, ends):
                seg = ts[s:e]
                lo[s:e] = s + np.searchsorted(seg, seg - win_us, side="left")
                hi[s:e] = s + np.searchsorted(seg, seg, side="right")
        else:
            vt = run_id.astype(np.int64) * span + ts_rel
            lo = np.searchsorted(vt, vt - win_us, side="left")
            hi = np.searchsorted(vt, vt, side="right")
        # longdouble prefix: the window sum is a difference of two
        # prefix entries whose magnitude is the PARTITION total, so
        # float64 cancellation error (~|csum|·eps) could land inside
        # the oracle's 1e-6 rounding cell at scale; 80-bit prefixes
        # push it ~3 orders below that
        csum = np.concatenate(
            [[np.longdouble(0)], np.cumsum(vals, dtype=np.longdouble)]
        )
        n_win = hi - lo
        avg = ((csum[hi] - csum[lo]) / n_win).astype(np.float64)
        return pa.table(
            {
                id_col: pa.array(ids, type=group[id_col].type),
                "n_win": pa.array(n_win.astype(np.int64)),
                "rolling_avg": pa.array(avg, type=pa.float64()),
            }
        )

    return (
        events.select_columns([id_col, key_col, ts_col, val_col])
        .map_batches(tag, batch_format="pyarrow")
        .groupby("part")
        .map_groups(per_part, batch_format="pyarrow")
    )


def funnel(
    events: rd.Dataset,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    n_parts: int = 64,
    virtual_axis_limit: int = 2**62,
) -> rd.Dataset:
    """Greedy-earliest funnel per user: t1 = the user's earliest
    ``steps[0]`` event; t_i = the earliest ``steps[i-1]`` event
    STRICTLY after t_{i-1}; NULL from the first missing step on.  One
    row per user who reaches step 1: (user_id, t1..tk, n_steps) — the
    SQL chained MIN-after-join semantics (see SQL_EVENTS_FUNNEL).

    Same shuffle shape as :func:`sessionize` / :func:`rolling_time_avg`:
    one coarse groupby on the user hash, then the WHOLE partition runs
    in k vectorized passes — users lexsort into runs, timestamps lift
    onto the disjoint virtual axis, and each step resolves with ONE
    global ``searchsorted`` over that step's event subset (no per-user
    Python; the per-run loop fallback covers a virtual-axis overflow,
    same policy as rolling_time_avg)."""
    from ..functions.hashing import part_of_ints, part_of_strings

    k = len(steps)
    if k == 0:
        raise ValueError("steps must be non-empty")

    def tag(batch: pa.Table) -> pa.Table:
        users = batch[user_col]
        if pa.types.is_integer(users.type):
            part = part_of_ints(
                n_parts, users.to_numpy(zero_copy_only=False).astype(np.int64)
            )
        else:
            part = part_of_strings(
                np.asarray(users.to_numpy(zero_copy_only=False), dtype=object),
                n_parts,
            )
        return pa.table(
            {
                user_col: users,
                "ts_us": batch[ts_col].cast(pa.timestamp("us")).cast(pa.int64()),
                type_col: batch[type_col],
                "part": pa.array(part, type=pa.int32()),
            }
        )

    out_fields = [(user_col, pa.int64())]
    out_fields += [(f"t{i + 1}", pa.timestamp("us")) for i in range(k)]
    out_fields.append(("n_steps", pa.int64()))
    out_schema = pa.schema(out_fields)

    def per_part(group: pa.Table) -> pa.Table:
        n = group.num_rows
        if n == 0:
            return out_schema.empty_table()
        users = group[user_col].to_numpy(zero_copy_only=False)
        ts = group["ts_us"].to_numpy(zero_copy_only=False).astype(np.int64)
        types = np.asarray(group[type_col].to_numpy(zero_copy_only=False))
        order = np.lexsort((ts, users))
        users, ts, types = users[order], ts[order], types[order]
        run_start = np.ones(n, dtype=bool)
        run_start[1:] = users[1:] != users[:-1]
        run_id = np.cumsum(run_start) - 1
        n_runs = int(run_id[-1]) + 1
        user_of_run = users[run_start]
        t0 = int(ts.min())
        ts_rel = ts - t0
        span = np.int64(int(ts_rel.max()) + 2)
        step_ts = np.full((k, n_runs), -1, dtype=np.int64)

        if n_runs * int(span) >= virtual_axis_limit:
            # per-run fallback: same semantics, looped over users
            starts = np.flatnonzero(run_start)
            ends = np.append(starts[1:], n)
            for j, (s, e) in enumerate(zip(starts, ends)):
                prev = np.int64(-1)
                for i, st in enumerate(steps):
                    seg = ts[s:e][types[s:e] == st]
                    pos = np.searchsorted(seg, prev, side="right")
                    if pos >= len(seg):
                        break
                    step_ts[i, j] = seg[pos]
                    prev = seg[pos]
        else:
            vt = run_id.astype(np.int64) * span + ts_rel
            runs = np.arange(n_runs, dtype=np.int64)
            cur = runs * span - 1  # "before the run's first event"
            alive = np.ones(n_runs, dtype=bool)
            for i, st in enumerate(steps):
                sv = vt[types == st]
                if len(sv) == 0:
                    break
                pos = np.searchsorted(sv, cur, side="right")
                ok = alive & (pos < len(sv))
                cand = sv[np.minimum(pos, len(sv) - 1)]
                ok &= (cand // span) == runs  # hit stayed inside the run
                step_ts[i, ok] = t0 + (cand[ok] % span)
                cur = np.where(ok, cand, cur)
                alive = ok
                if not alive.any():
                    break

        keep = step_ts[0] >= 0  # users who reach step 1
        cols: dict = {user_col: pa.array(user_of_run[keep], type=pa.int64())}
        for i in range(k):
            vals = step_ts[i, keep]
            arr = pa.array(vals, type=pa.int64()).cast(pa.timestamp("us"))
            cols[f"t{i + 1}"] = pc.if_else(
                pa.array(vals >= 0), arr, pa.scalar(None, pa.timestamp("us"))
            )
        cols["n_steps"] = pa.array(
            (step_ts[:, keep] >= 0).sum(axis=0).astype(np.int64)
        )
        return pa.table(cols, schema=out_schema)

    from .base import map_groups_typed

    return map_groups_typed(
        events.select_columns([user_col, ts_col, type_col]).map_batches(
            tag, batch_format="pyarrow"
        ),
        "part",
        per_part,
        out_schema.empty_table(),
    )


def window_dedup(
    events: rd.Dataset,
    window_s: int,
    key_cols: tuple[str, ...] = ("user_id", "event_type"),
    ts_col: str = "ts",
    id_col: str = "event_id",
    n_parts: int = 64,
) -> rd.Dataset:
    """Event-stream dedup: drop an event when the PREVIOUS event of the
    same key (``key_cols``) is at most ``window_s`` seconds older — the
    "collapse duplicate firings" pass of telemetry/webhook ingestion.
    LAG semantics (the reference event is the previous event whether or
    not it was itself kept), so the rule is SQL's
    ``LAG(ts) OVER (PARTITION BY key ORDER BY ts, id)`` — deterministic
    under ts ties via the id tie-break.

    Output: the KEPT rows (id, key_cols, ts).  One coarse groupby on
    the hash of the first key column; each partition dedups in a single
    numpy pass (lexsort → per-run shifted-gap mask) — no per-key
    Python.
    """
    from ..functions.hashing import part_of_ints, part_of_strings

    from .base import map_groups_typed

    if window_s < 0:
        raise ValueError(f"window_s must be >= 0, got {window_s}")
    first_key = key_cols[0]
    keep_cols = [id_col, *key_cols, ts_col]

    def tag(batch: pa.Table) -> pa.Table:
        keys = batch[first_key]
        if pa.types.is_integer(keys.type):
            part = part_of_ints(
                n_parts, keys.to_numpy(zero_copy_only=False).astype(np.int64)
            )
        else:
            part = part_of_strings(
                np.asarray(keys.to_numpy(zero_copy_only=False), dtype=object),
                n_parts,
            )
        cols = {c: batch[c] for c in keep_cols}
        cols[ts_col] = batch[ts_col].cast(pa.timestamp("us"))
        cols["part"] = pa.array(part, type=pa.int32())
        return pa.table(cols)

    win_us = np.int64(window_s * 1_000_000)

    sch = events.schema()
    _py_fallback = {int: pa.int64(), str: pa.string(), float: pa.float64(),
                    bool: pa.bool_()}

    def _pa_t(t):
        # Ray schemas over pandas-backed blocks report numpy dtypes or
        # plain Python classes instead of Arrow types — coerce
        if isinstance(t, pa.DataType):
            return t
        if t in _py_fallback:
            return _py_fallback[t]
        try:
            return pa.from_numpy_dtype(np.dtype(t))
        except (TypeError, pa.ArrowNotImplementedError):
            return pa.string()

    types = {f: _pa_t(t) for f, t in zip(sch.names, sch.types)}

    def empty() -> pa.Table:
        return pa.table(
            {
                c: pa.array(
                    [],
                    type=pa.timestamp("us") if c == ts_col else types[c],
                )
                for c in keep_cols
            }
        )

    def per_part(group: pa.Table) -> pa.Table:
        n = group.num_rows
        if n == 0:
            return group.select(keep_cols)
        ids = group[id_col].to_numpy(zero_copy_only=False)
        ts_i = (
            group[ts_col]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .view(np.int64)
        )
        key_arrs = [
            group[c].to_numpy(zero_copy_only=False) for c in key_cols
        ]
        # composite key → dense codes (hash factorize; grouping only)
        if len(key_arrs) == 1:
            codes = pd.factorize(key_arrs[0], sort=False)[0]
        else:
            codes = pd.MultiIndex.from_arrays(key_arrs).factorize(sort=False)[0]
        order = np.lexsort((ids, ts_i, codes))
        c_s, t_s = codes[order], ts_i[order]
        keep_sorted = np.ones(n, dtype=bool)
        same = c_s[1:] == c_s[:-1]
        keep_sorted[1:] = ~(same & (t_s[1:] - t_s[:-1] <= win_us))
        keep = np.zeros(n, dtype=bool)
        keep[order] = keep_sorted
        return group.select(keep_cols).filter(pa.array(keep))

    tagged = events.select_columns(keep_cols).map_batches(
        tag, batch_format="pyarrow"
    )
    return map_groups_typed(tagged, "part", per_part, empty())


def transition_counts(
    events: rd.Dataset,
    ts_col: str = "ts",
    id_col: str = "event_id",
    user_col: str = "user_id",
    type_col: str = "event_type",
    n_parts: int = 64,
) -> rd.Dataset:
    """Per-user consecutive event-type transition counts — the Markov
    transition matrix of the event stream (the "what follows what"
    statistic behind funnel design and anomaly dashboards).  LAG
    semantics: each user's events are ordered by (ts, id) and every
    adjacent pair contributes one (from_type, to_type) observation —
    SQL's ``LAG(type) OVER (PARTITION BY user ORDER BY ts, id)``.

    One coarse groupby on the user hash (a user's whole stream lands
    in one partition); each partition factorizes types once and counts
    pairs with a single np.unique over composite codes — no per-user
    Python.  Partition partials (≤ |types|² rows each) fold through a
    tiny (from_type, to_type) groupby."""
    from ray.data.aggregate import Sum

    from ..functions.hashing import part_of_ints, part_of_strings
    from .base import map_groups_typed

    keep_cols = [id_col, user_col, ts_col, type_col]

    def tag(batch: pa.Table) -> pa.Table:
        keys = batch[user_col]
        if pa.types.is_integer(keys.type):
            part = part_of_ints(
                n_parts, keys.to_numpy(zero_copy_only=False).astype(np.int64)
            )
        else:
            part = part_of_strings(
                np.asarray(keys.to_numpy(zero_copy_only=False), dtype=object),
                n_parts,
            )
        cols = {c: batch[c] for c in keep_cols}
        cols[ts_col] = batch[ts_col].cast(pa.timestamp("us"))
        cols["part"] = pa.array(part, type=pa.int32())
        return pa.table(cols)

    empty = pa.table(
        {"from_type": pa.array([], type=pa.string()),
         "to_type": pa.array([], type=pa.string()),
         "n": pa.array([], type=pa.int64())}
    )

    def per_part(group: pa.Table) -> pa.Table:
        n = group.num_rows
        if n < 2:
            return empty
        ids = group[id_col].to_numpy(zero_copy_only=False)
        ts_i = (
            group[ts_col]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .view(np.int64)
        )
        users = group[user_col].to_numpy(zero_copy_only=False)
        u_codes = pd.factorize(users, sort=False)[0]
        t_codes, t_uniq = pd.factorize(
            group[type_col].to_numpy(zero_copy_only=False), sort=False
        )
        order = np.lexsort((ids, ts_i, u_codes))
        u_s, t_s = u_codes[order], t_codes[order]
        adj = u_s[1:] == u_s[:-1]
        if not adj.any():
            return empty
        k = len(t_uniq)
        pair = t_s[:-1][adj].astype(np.int64) * k + t_s[1:][adj]
        uniq, cnt = np.unique(pair, return_counts=True)
        return pa.table(
            {
                "from_type": pa.array(t_uniq[uniq // k], type=pa.string()),
                "to_type": pa.array(t_uniq[uniq % k], type=pa.string()),
                "n": pa.array(cnt.astype(np.int64), type=pa.int64()),
            }
        )

    tagged = events.select_columns(keep_cols).map_batches(
        tag, batch_format="pyarrow"
    )
    partials = map_groups_typed(tagged, "part", per_part, empty)
    return partials.groupby(["from_type", "to_type"]).aggregate(
        Sum("n", alias_name="n")
    )


def cumulative_sum(
    events: rd.Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    val_col: str = "value",
    n_parts: int = 64,
) -> rd.Dataset:
    """Per-key RUNNING TOTAL ordered by (ts, id) — SQL's
    ``SUM(val) OVER (PARTITION BY key ORDER BY ts, id ROWS UNBOUNDED
    PRECEDING)``, the cumulative-metric window verb (lifetime spend,
    session depth).  Output: (id, running_sum).

    One coarse groupby on the key hash; each partition does a single
    lexsort + one global ``np.cumsum`` with per-run offset subtraction
    (segmented prefix sum) — no per-key Python.  numpy's cumsum is
    sequential in sort order, matching the SQL window's incremental
    accumulation, so float64 results agree to summation-order noise
    (both engines round for comparison)."""
    from ..functions.hashing import part_of_ints, part_of_strings
    from .base import map_groups_typed

    def tag(batch: pa.Table) -> pa.Table:
        keys = batch[key_col]
        if pa.types.is_integer(keys.type):
            part = part_of_ints(
                n_parts, keys.to_numpy(zero_copy_only=False).astype(np.int64)
            )
        else:
            part = part_of_strings(
                np.asarray(keys.to_numpy(zero_copy_only=False), dtype=object),
                n_parts,
            )
        return pa.table(
            {
                id_col: batch[id_col].cast(pa.int64()),
                "k": batch[key_col],
                "t": batch[ts_col].cast(pa.timestamp("us")).cast(pa.int64()),
                "v": batch[val_col].cast(pa.float64()),
                "part": pa.array(part, type=pa.int32()),
            }
        )

    empty = pa.table(
        {
            id_col: pa.array([], type=pa.int64()),
            "running_sum": pa.array([], type=pa.float64()),
        }
    )

    def per_part(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return empty
        ids = group[id_col].to_numpy(zero_copy_only=False)
        k = group["k"].to_numpy(zero_copy_only=False)
        t = group["t"].to_numpy(zero_copy_only=False)
        v = group["v"].to_numpy(zero_copy_only=False)
        import pandas as _pd

        codes = _pd.factorize(k)[0]
        order = np.lexsort((ids, t, codes))
        codes, v_s, ids_s = codes[order], v[order], ids[order]
        cs = np.cumsum(v_s)
        new_run = np.ones(len(cs), dtype=bool)
        new_run[1:] = codes[1:] != codes[:-1]
        starts = np.flatnonzero(new_run)
        lengths = np.diff(np.append(starts, len(cs)))
        prev = np.concatenate([[0.0], cs[starts[1:] - 1]])
        run_off = np.repeat(prev, lengths)
        return pa.table(
            {
                id_col: pa.array(ids_s, type=pa.int64()),
                "running_sum": pa.array(cs - run_off, type=pa.float64()),
            }
        )

    tagged = events.select_columns(
        [id_col, key_col, ts_col, val_col]
    ).map_batches(tag, batch_format="pyarrow")
    return map_groups_typed(tagged, "part", per_part, empty)
