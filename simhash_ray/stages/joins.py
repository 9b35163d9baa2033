"""Temporal joins the Dataset API lacks, composed Ray-Data-first.

``asof_join`` — for every left row, attach the nearest earlier (or
exactly simultaneous) right row within the same ``by`` key: the
standard event-attribution / point-in-time-lookup primitive of a
training-data pipeline (e.g. "which click preceded this purchase").

``range_join`` — inner-join point rows to every interval row whose
``[lo, hi]`` contains the point: the windowed-attribution primitive
("all errors in the hour before each purchase").  Keyed mode groups
by an equality key; keyless mode bins time into fixed-width buckets,
replicating each interval to every bucket it overlaps while each
point lands in exactly one bucket — so every (point, interval) pair
meets exactly once and no cross-bucket dedup pass is needed.

Composition (the brief's custom-operator option (a)): tag-union the
two sides into one narrow stream → ONE ``groupby(by)`` shuffle (via
``map_groups_typed`` so empty partitions stay typed) → per-group
numpy ``searchsorted`` backward match.  Scale/partitioning
assumptions, documented per the brief:

- the single shuffle moves only ``by`` + ``on`` + the requested
  payload columns — prune before calling;
- per-``by``-group rows must fit one task (same bound as any keyed
  groupby here); a hot key (one user with ~10^8 events) needs
  pre-splitting by time range before this operator;
- right-side ties on ``on`` within a ``by`` group are resolved by the
  ``tie_break`` column (the MAX ``tie_break`` row wins — deterministic
  regardless of block arrival order); without one the winner depends
  on union block order, so pass ``tie_break`` whenever ties are
  possible.  DuckDB's ASOF JOIN leaves ties unspecified, so oracle
  queries pre-dedupe the right side with a window-``QUALIFY`` that
  mirrors the same max-``tie_break`` rule.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from .base import map_groups_typed


def asof_join(
    left: rd.Dataset,
    right: rd.Dataset,
    on: str,
    by: str,
    suffix: str = "_r",
    tie_break: str | None = None,
) -> rd.Dataset:
    """Backward (inclusive) as-of join: every left row + the columns of
    the right row with the greatest ``on`` ≤ left's ``on`` and the same
    ``by`` value; right columns are null where no such row exists.

    Left payload columns keep their names; right payload columns (and
    the matched right ``on``) get ``suffix``.  Output schema is fixed
    up front from the two input schemas, so empty partitions stay
    typed."""
    lschema = left.schema()
    rschema = right.schema()
    ltypes = dict(zip(lschema.names, lschema.types))
    rtypes = dict(zip(rschema.names, rschema.types))
    for col in (on, by):
        if col not in ltypes or col not in rtypes:
            raise ValueError(f"both sides need column {col!r}")
    lpay = [c for c in lschema.names if c not in (on, by)]
    rpay = [c for c in rschema.names if c not in (on, by)]
    if tie_break is not None and tie_break not in rpay:
        raise ValueError(f"tie_break {tie_break!r} must be a right payload column")
    out_fields = (
        [(by, ltypes[by]), (on, ltypes[on])]
        + [(c, ltypes[c]) for c in lpay]
        + [(on + suffix, rtypes[on])]
        + [(c + suffix, rtypes[c]) for c in rpay]
    )
    out_schema = pa.schema(out_fields)
    empty = out_schema.empty_table()

    def tag(side: int):
        # both sides emit the SAME canonical column order (by, on,
        # side, L_*, R_*, R_<on>) — union requires identical schemas
        def fn(t: pa.Table) -> pa.Table:
            n = t.num_rows
            cols = {
                by: t[by],
                on: t[on],
                "side": pa.array(np.full(n, side, dtype=np.int8)),
            }
            for c in lpay:
                cols["L_" + c] = t[c] if side == 0 else pa.nulls(n, type=ltypes[c])
            for c in rpay:
                cols["R_" + c] = t[c] if side == 1 else pa.nulls(n, type=rtypes[c])
            # the right side's `on` travels as a payload too (it lands
            # in the output as on+suffix)
            cols["R_" + on] = t[on] if side == 1 else pa.nulls(n, type=rtypes[on])
            return pa.table(cols)

        return fn

    tagged = left.map_batches(tag(0), batch_format="pyarrow").union(
        right.map_batches(tag(1), batch_format="pyarrow")
    )

    def per_group(g: pa.Table) -> pa.Table:
        side = g["side"].to_numpy(zero_copy_only=False)
        on_np = g[on].to_numpy(zero_copy_only=False)
        l_idx = np.flatnonzero(side == 0)
        r_idx = np.flatnonzero(side == 1)
        if len(l_idx) == 0:
            return empty
        l_on = on_np[l_idx]
        cols: dict = {
            by: g[by].take(pa.array(l_idx)),
            on: g[on].take(pa.array(l_idx)),
        }
        for c in lpay:
            cols[c] = g["L_" + c].take(pa.array(l_idx))
        if len(r_idx) == 0:
            n = len(l_idx)
            cols[on + suffix] = pa.nulls(n, type=rtypes[on])
            for c in rpay:
                cols[c + suffix] = pa.nulls(n, type=rtypes[c])
            return pa.table(cols, schema=out_schema)
        # sort right rows by (on, tie_break) ascending; searchsorted's
        # side="right" - 1 then lands on the max-tie_break row among
        # equal `on` values (see module docstring)
        if tie_break is not None:
            tb = g["R_" + tie_break].to_numpy(zero_copy_only=False)[r_idx]
            r_order = r_idx[np.lexsort((tb, on_np[r_idx]))]
        else:
            r_order = r_idx[np.argsort(on_np[r_idx], kind="stable")]
        r_on_sorted = on_np[r_order]
        pos = np.searchsorted(r_on_sorted, l_on, side="right") - 1
        matched = pos >= 0
        gather = np.where(matched, r_order[np.clip(pos, 0, None)], -1)
        take_idx = pa.array(
            np.where(matched, gather, np.int64(0)), type=pa.int64()
        )
        mask = pa.array(~matched)

        def gathered(col: pa.ChunkedArray | pa.Array, typ) -> pa.Array:
            taken = col.take(take_idx)
            if isinstance(taken, pa.ChunkedArray):
                taken = taken.combine_chunks()
            return pa.compute.if_else(mask, pa.nulls(len(l_idx), type=typ), taken)

        cols[on + suffix] = gathered(g["R_" + on], rtypes[on])
        for c in rpay:
            cols[c + suffix] = gathered(g["R_" + c], rtypes[c])
        return pa.table(cols, schema=out_schema)

    return map_groups_typed(tagged, by, per_group, empty)


def _emit_pairs(p_on, i_lo, i_hi):
    """Vectorized (point, interval) containment pairs within one group.

    ``p_on`` must be sorted ascending.  Returns (point_pos, interval_pos)
    index arrays into the sorted points / the intervals as given."""
    start = np.searchsorted(p_on, i_lo, side="left")
    end = np.searchsorted(p_on, i_hi, side="right")
    counts = np.maximum(end - start, 0)
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    itake = np.repeat(np.arange(len(i_lo)), counts)
    first = np.repeat(start, counts)
    offsets = np.repeat(np.cumsum(counts) - counts, counts)
    ptake = first + (np.arange(total) - offsets)
    return ptake, itake


def range_join(
    points: rd.Dataset,
    intervals: rd.Dataset,
    on: str,
    lo: str,
    hi: str,
    by: str | None = None,
    suffix: str = "_r",
    bucket_width: int | None = None,
) -> rd.Dataset:
    """Inner join: every (point row, interval row) pair with
    ``interval[lo] <= point[on] <= interval[hi]`` (and equal ``by``
    values in keyed mode).  Point columns keep their names; interval
    columns get ``suffix``.

    Scale/partitioning assumptions (brief's custom-operator contract):

    - **keyed mode** (``by`` given): ONE ``groupby(by)`` shuffle of the
      pruned tag-union; per-``by``-group rows must fit one task — a
      hot key needs the keyless bucketed mode instead.
    - **keyless mode** (``by=None``): requires ``bucket_width`` in the
      units of ``on`` (µs for timestamps).  Each interval is
      replicated to ``(hi - lo) / bucket_width + 1`` buckets — pick a
      width near the typical interval length so the replication
      factor stays small; a pathological interval spanning the whole
      time axis replicates everywhere (same hazard class as a hot
      groupby key, visible in the band-row count).
    """
    pschema, ischema = points.schema(), intervals.schema()
    ptypes = dict(zip(pschema.names, pschema.types))
    ityps = dict(zip(ischema.names, ischema.types))
    if on not in ptypes:
        raise ValueError(f"points need column {on!r}")
    for col in (lo, hi):
        if col not in ityps:
            raise ValueError(f"intervals need column {col!r}")
    if by is None and bucket_width is None:
        raise ValueError("keyless mode requires bucket_width")
    if by is not None:
        if by not in ptypes or by not in ityps:
            raise ValueError(f"both sides need column {by!r}")
    ppay = [c for c in pschema.names if c not in (on, by)]
    ipay = [c for c in ischema.names if c not in (lo, hi, by)]
    key = by if by is not None else "__bucket"
    key_type = ptypes[by] if by is not None else pa.int64()
    out_fields = (
        ([(by, ptypes[by])] if by is not None else [])
        + [(on, ptypes[on])]
        + [(c, ptypes[c]) for c in ppay]
        + [(lo + suffix, ityps[lo]), (hi + suffix, ityps[hi])]
        + [(c + suffix, ityps[c]) for c in ipay]
    )
    out_schema = pa.schema(out_fields)
    empty = out_schema.empty_table()

    def _as_np(arr: pa.ChunkedArray | pa.Array) -> np.ndarray:
        np_vals = arr.to_numpy(zero_copy_only=False)
        if np_vals.dtype.kind == "M":  # datetime64 → integer units (µs)
            return np_vals.astype("int64")
        return np_vals  # ints/floats compare natively — no cast

    def _bucket_of(vals: np.ndarray) -> np.ndarray:
        return np.floor_divide(vals, bucket_width).astype(np.int64)

    # canonical tagged layout both sides emit: key, side, P_on, P_*,
    # I_lo, I_hi, I_* (union needs identical schemas)
    def tag_points(t: pa.Table):
        n = t.num_rows
        cols = {
            key: t[by] if by is not None else pa.array(_bucket_of(_as_np(t[on]))),
            "side": pa.array(np.zeros(n, dtype=np.int8)),
            "P_" + on: t[on],
        }
        for c in ppay:
            cols["P_" + c] = t[c]
        cols["I_" + lo] = pa.nulls(n, type=ityps[lo])
        cols["I_" + hi] = pa.nulls(n, type=ityps[hi])
        for c in ipay:
            cols["I_" + c] = pa.nulls(n, type=ityps[c])
        return pa.table(cols)

    def tag_intervals(t: pa.Table):
        if by is not None:
            n = t.num_rows
            key_col = t[by]
            pick = lambda c: t[c]  # no replication in keyed mode
        else:
            lo_b = _bucket_of(_as_np(t[lo]))
            hi_b = _bucket_of(_as_np(t[hi]))
            counts = np.maximum(hi_b - lo_b + 1, 0)
            n = int(counts.sum())
            offs = np.repeat(np.cumsum(counts) - counts, counts)
            key_col = pa.array(np.repeat(lo_b, counts) + (np.arange(n) - offs))
            take = pa.array(np.repeat(np.arange(t.num_rows), counts), type=pa.int64())
            pick = lambda c: t[c].take(take)
        cols = {
            key: key_col,
            "side": pa.array(np.ones(n, dtype=np.int8)),
            "P_" + on: pa.nulls(n, type=ptypes[on]),
        }
        for c in ppay:
            cols["P_" + c] = pa.nulls(n, type=ptypes[c])
        cols["I_" + lo] = pick(lo)
        cols["I_" + hi] = pick(hi)
        for c in ipay:
            cols["I_" + c] = pick(c)
        return pa.table(cols)

    tagged = points.map_batches(tag_points, batch_format="pyarrow").union(
        intervals.map_batches(tag_intervals, batch_format="pyarrow")
    )

    def per_group(g: pa.Table) -> pa.Table:
        side = g["side"].to_numpy(zero_copy_only=False)
        p_idx = np.flatnonzero(side == 0)
        i_idx = np.flatnonzero(side == 1)
        if len(p_idx) == 0 or len(i_idx) == 0:
            return empty
        p_on = _as_np(g["P_" + on])[p_idx]
        order = np.argsort(p_on, kind="stable")
        p_sorted = p_idx[order]
        ptake, itake = _emit_pairs(
            p_on[order], _as_np(g["I_" + lo])[i_idx], _as_np(g["I_" + hi])[i_idx]
        )
        if len(ptake) == 0:
            return empty
        p_rows = pa.array(p_sorted[ptake], type=pa.int64())
        i_rows = pa.array(i_idx[itake], type=pa.int64())
        cols: dict = {}
        if by is not None:
            cols[by] = g[key].take(p_rows)
        cols[on] = g["P_" + on].take(p_rows)
        for c in ppay:
            cols[c] = g["P_" + c].take(p_rows)
        cols[lo + suffix] = g["I_" + lo].take(i_rows)
        cols[hi + suffix] = g["I_" + hi].take(i_rows)
        for c in ipay:
            cols[c + suffix] = g["I_" + c].take(i_rows)
        return pa.table(cols, schema=out_schema)

    return map_groups_typed(tagged, key, per_group, empty)
