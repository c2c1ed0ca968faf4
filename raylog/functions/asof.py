"""As-of (time-travel) join and per-key ordered window functions.

Both are "ordered within key" operators Ray Data has no primitive for.
The execution shape is the engine's standard one for ordered semantics
(`agg.partitioned_group_apply`, SURVEY §4.3): hash-partition on the key
so every key's rows land whole in one partition, then ONE vectorized
numpy pass per partition (lexsort + segment-aware shifts/carries) — no
per-group Python, no global sort, no driver materialization. The only
exchange is the hash shuffle on the key; at 100 TB the partition count
scales with the cluster, and per-key data (one user / one container) is
small by construction.

As-of semantics match SQL ``ASOF LEFT JOIN``: for each left row, the
right row with the greatest ``on`` ≤ left's ``on`` within the same
``by`` key (equality included); unmatched left rows keep nulls. Callers
should pre-aggregate the right side to one row per (by, on) for
deterministic output (as SQL's ASOF does not pick among exact ties).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from raylog.functions.agg import partitioned_group_apply


def _as_i64(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    arr = np.asarray(col)
    if arr.dtype.kind == "M":  # datetime64 → int64 view (same ordering)
        return arr.view("i8")
    if arr.dtype.kind not in "iub":
        # silently truncating float keys (10.9 → 10) would corrupt
        # as-of/interval matching and window ordering — refuse
        raise TypeError(
            f"ordered-join key/order column must be integer or temporal, "
            f"got {arr.dtype} — quantize float timestamps explicitly"
        )
    return arr.astype(np.int64, copy=False)


def _null_filled(n: int, typ: pa.DataType) -> pa.Array:
    return pa.nulls(n, typ)


def asof_join(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    by: str,
    on: str,
    right_vals: list[str],
    num_partitions: int = 32,
) -> rd.Dataset:
    """Left as-of join: latest right row with ``on`` ≤ left ``on`` per
    ``by`` key. Left columns pass through; ``right_vals`` columns arrive
    null-filled where no prior right row exists."""
    left_schema = left.schema()
    left_cols = [c for c in left_schema.names]
    for c in right_vals:
        if c in left_cols:
            raise ValueError(f"right_vals column {c!r} collides with left")
    right_schema = right.schema()
    if right_schema is None or not right_schema.names:
        # all-empty right side: dataset-level schema resolves empty
        # (SCALE.md hazard); every left row gets null right_vals
        def nullwiden(b: pa.Table) -> pa.Table:
            cols = {c: b[c] for c in left_cols}
            for c in right_vals:
                cols[c] = pa.nulls(b.num_rows)
            return pa.table(cols)

        return left.map_batches(nullwiden, batch_format="pyarrow",
                                batch_size=None)
    rtypes = {n: t for n, t in zip(right_schema.names, right_schema.types)}
    ltypes = {n: t for n, t in zip(left_schema.names, left_schema.types)}

    def widen_left(b: pa.Table) -> pa.Table:
        cols = {c: b[c] for c in left_cols}
        cols["__side"] = pa.nulls(b.num_rows, pa.int8()).fill_null(1)
        for c in right_vals:
            cols[c] = _null_filled(b.num_rows, rtypes[c])
        return pa.table(cols)

    def widen_right(b: pa.Table) -> pa.Table:
        cols = {}
        for c in left_cols:
            cols[c] = b[c] if c in (by, on) else _null_filled(b.num_rows,
                                                              ltypes[c])
        cols["__side"] = pa.nulls(b.num_rows, pa.int8()).fill_null(0)
        for c in right_vals:
            cols[c] = b[c]
        return pa.table(cols)

    both = left.map_batches(
        widen_left, batch_format="pyarrow", batch_size=None
    ).union(right.map_batches(
        widen_right, batch_format="pyarrow", batch_size=None
    ))

    def stitch(part: pa.Table) -> pa.Table:
        n = part.num_rows
        if n == 0:
            return part.drop_columns(["__side"])
        by_v = _as_i64(part[by])
        on_v = _as_i64(part[on])
        side = _as_i64(part["__side"])
        order = np.lexsort((side, on_v, by_v))  # right (0) before left at ties
        is_right = side[order] == 0
        pos = np.arange(n)
        carry = np.maximum.accumulate(np.where(is_right, pos, -1))
        valid = carry >= 0
        ref = np.where(valid, carry, 0)
        ok = valid & (by_v[order][ref] == by_v[order])

        lmask = ~is_right
        take_left = order[lmask]
        ref_orig = order[ref][lmask]
        ok_l = ok[lmask]
        out = {c: part[c].take(pa.array(take_left)) for c in left_cols}
        okl = pa.array(ok_l)
        for c in right_vals:
            vals = part[c].take(pa.array(ref_orig))
            out[c] = pc.if_else(okl, vals, pa.scalar(None, rtypes[c]))
        return pa.table(out)

    return partitioned_group_apply(both, [by], stitch,
                                   num_partitions=num_partitions)


def window_lag_moving(
    ds: rd.Dataset,
    *,
    by: str,
    order: list[str],
    value: str,
    window: int = 3,
    num_partitions: int = 32,
) -> rd.Dataset:
    """Per-key ordered LAG(value) and trailing ``window``-row moving
    average (SQL ``ROWS BETWEEN window-1 PRECEDING AND CURRENT ROW``),
    computed with segment-aware vectorized shifts — one numpy pass per
    hash partition."""

    def run(part: pa.Table) -> pa.Table:
        n = part.num_rows
        if n == 0:
            return part.append_column(
                "lag_value", pa.nulls(0, pa.float64())
            ).append_column("mov_avg", pa.nulls(0, pa.float64()))
        by_v = _as_i64(part[by])
        keys = [np.asarray(_as_i64(part[c])) for c in reversed(order)]
        sort = np.lexsort(tuple(keys) + (by_v,))
        v = np.asarray(part[value].combine_chunks()
                       if isinstance(part[value], pa.ChunkedArray)
                       else part[value], dtype=np.float64)[sort]
        u = by_v[sort]
        seg_start = np.empty(n, dtype=bool)
        seg_start[0] = True
        seg_start[1:] = u[1:] != u[:-1]

        msum = v.copy()
        mcnt = np.ones(n, dtype=np.float64)
        lag = np.full(n, np.nan)
        seg_id = np.cumsum(seg_start)
        for d in range(1, window):
            shifted = np.empty(n)
            shifted[:d] = np.nan
            shifted[d:] = v[:-d]
            # row i-d is in the same segment iff seg_id unchanged over d rows
            vd = np.zeros(n, dtype=bool)
            vd[d:] = seg_id[d:] == seg_id[:-d]
            if d == 1:
                lag = np.where(vd, shifted, np.nan)
            msum = msum + np.where(vd, np.nan_to_num(shifted), 0.0)
            mcnt = mcnt + vd
        mov = msum / mcnt

        out = {c: part[c].take(pa.array(sort)) for c in part.column_names}
        out["lag_value"] = pa.array(lag, from_pandas=True)  # NaN → null
        out["mov_avg"] = pa.array(mov)
        return pa.table(out)

    return partitioned_group_apply(ds, [by], run,
                                   num_partitions=num_partitions)


def interval_join(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    by: str,
    on: str,
    right_vals: list[str],
    lower: int = 0,
    upper: int,
    num_partitions: int = 32,
) -> rd.Dataset:
    """Bounded interval (stream-stream) join: one output row per (left,
    right) pair with same ``by`` key and ``on_r ∈ [on_l + lower, on_l +
    upper]`` (both inclusive; ``on`` compared in its int64/ns domain).

    No per-key loop and no n×m blowup machinery: within each hash
    partition the right rows and BOTH window endpoints of every left row
    are lexsorted together; a running count of right rows then reads off
    each endpoint's global rank into the (key, on)-sorted right array,
    and the matches are the rank range — expanded with one repeat/arange
    pass. Output size is the true match count, the only inflation risk
    is the window width itself (a caller-chosen semantic bound).
    """
    left_cols = list(left.schema().names)
    for c in right_vals:
        if c in left_cols:
            raise ValueError(f"right_vals column {c!r} collides with left")
    right_schema = right.schema()
    if right_schema is None or not right_schema.names:
        # all-empty right side: dataset-level schema resolves empty
        # (SCALE.md hazard); every left row gets null right_vals
        def nullwiden(b: pa.Table) -> pa.Table:
            cols = {c: b[c] for c in left_cols}
            for c in right_vals:
                cols[c] = pa.nulls(b.num_rows)
            return pa.table(cols)

        return left.map_batches(nullwiden, batch_format="pyarrow",
                                batch_size=None)
    rtypes = {n: t for n, t in zip(right_schema.names, right_schema.types)}
    ltypes_schema = left.schema()
    ltypes = {n: t for n, t in zip(ltypes_schema.names, ltypes_schema.types)}

    def widen_left(b: pa.Table) -> pa.Table:
        cols = {c: b[c] for c in left_cols}
        cols["__side"] = pa.nulls(b.num_rows, pa.int8()).fill_null(0)
        for c in right_vals:
            cols[c] = pa.nulls(b.num_rows, rtypes[c])
        return pa.table(cols)

    def widen_right(b: pa.Table) -> pa.Table:
        cols = {}
        for c in left_cols:
            cols[c] = b[c] if c in (by, on) else pa.nulls(b.num_rows,
                                                          ltypes[c])
        cols["__side"] = pa.nulls(b.num_rows, pa.int8()).fill_null(1)
        for c in right_vals:
            cols[c] = b[c]
        return pa.table(cols)

    both = left.map_batches(
        widen_left, batch_format="pyarrow", batch_size=None
    ).union(right.map_batches(
        widen_right, batch_format="pyarrow", batch_size=None
    ))

    def stitch(part: pa.Table) -> pa.Table:
        by_v = _as_i64(part[by])
        on_v = _as_i64(part[on])
        side = _as_i64(part["__side"])
        is_left = side == 0
        l_idx = np.flatnonzero(is_left)
        r_idx = np.flatnonzero(~is_left)
        out_schema = {c: ltypes[c] for c in left_cols}
        out_schema.update({c: rtypes[c] for c in right_vals})
        if len(l_idx) == 0 or len(r_idx) == 0:
            return pa.table({c: pa.nulls(0, t)
                             for c, t in out_schema.items()})
        # rights sorted by (key, on); remember their original rows
        r_order = r_idx[np.lexsort((on_v[r_idx], by_v[r_idx]))]
        rk, rt = by_v[r_order], on_v[r_order]
        # merge rights with both endpoints of every left window:
        # sides: lo endpoint (0) < right (1) < hi endpoint (2) at ties,
        # making both bounds inclusive
        mk = np.concatenate([by_v[l_idx], rk, by_v[l_idx]])
        mt = np.concatenate([on_v[l_idx] + lower, rt, on_v[l_idx] + upper])
        ms = np.concatenate([
            np.zeros(len(l_idx), dtype=np.int8),
            np.ones(len(r_order), dtype=np.int8),
            np.full(len(l_idx), 2, dtype=np.int8),
        ])
        order = np.lexsort((ms, mt, mk))
        rr = np.cumsum(ms[order] == 1)  # rights at-or-before each row
        pos = np.empty(len(order), dtype=np.int64)
        pos[order] = np.arange(len(order))
        lo = rr[pos[: len(l_idx)]]           # rights strictly before lo
        hi = rr[pos[len(l_idx) + len(r_order):]]  # rights ≤ hi endpoint
        # clamp to the left row's own key segment: ranks outside the key
        # can't occur because endpoints share the key in the lexsort
        lens = hi - lo
        keep = lens > 0
        lo, lens = lo[keep], lens[keep]
        l_rows = l_idx[keep]
        total = int(lens.sum())
        if total == 0:
            return pa.table({c: pa.nulls(0, t)
                             for c, t in out_schema.items()})
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        ranks = np.arange(total) - np.repeat(starts, lens) + np.repeat(lo, lens)
        left_take = pa.array(np.repeat(l_rows, lens))
        right_take = pa.array(r_order[ranks])
        out = {c: part[c].take(left_take) for c in left_cols}
        for c in right_vals:
            out[c] = part[c].take(right_take)
        return pa.table(out)

    return partitioned_group_apply(both, [by], stitch,
                                   num_partitions=num_partitions)
