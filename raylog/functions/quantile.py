"""Exact distributed quantiles for bounded-cardinality value columns.

A quantile needs global order, but when the VALUE domain is bounded
(token counts, line lengths, status codes, bucketed floats) the exact
answer falls out of a (key, value) → count histogram: the grouped count
is the only shuffle (key-compressed partials through
`agg.grouped_aggregate_ds`, never raw rows), and the per-key finish is
one vectorized pass over the histogram — a global searchsorted on the
running count, no per-group Python and no full sort of the data.

For unbounded/continuous domains, quantize first (fixed-width bins give
a bounded-error answer) or use a mergeable sketch; this module is the
EXACT path the oracle can check. Selection rule matches SQL
``quantile_disc`` / ``percentile_disc``: the element at 1-based rank
``ceil(p * n)`` in value order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from raylog.functions.agg import grouped_aggregate_ds, partitioned_group_apply


def grouped_quantiles(
    ds: rd.Dataset,
    *,
    key: str,
    value: str,
    ps: list[float],
    out_names: list[str] | None = None,
    num_partitions: int = 16,
) -> rd.Dataset:
    """Per-``key`` exact quantiles of ``value`` at probabilities ``ps``.

    Returns one row per key with one column per quantile. Histogram rows
    per key = distinct values per key (bounded by assumption), so the
    finish stage input is cardinality-compressed.
    """
    names = out_names or [f"p{int(p * 100)}" for p in ps]
    hist = grouped_aggregate_ds(
        ds.select_columns([key, value]), [key, value],
        [("*", "count", "cnt")], num_partitions=num_partitions,
    )

    def finish(part: pa.Table) -> pa.Table:
        df = part.to_pandas().sort_values([key, value], kind="mergesort")
        k = df[key].to_numpy()
        v = df[value].to_numpy()
        cnt = df["cnt"].to_numpy(dtype=np.int64)
        n = len(df)
        if n == 0:
            cols = {key: pa.array([], part.schema.field(key).type)}
            for nm in names:
                cols[nm] = pa.array([], part.schema.field(value).type)
            return pa.table(cols)
        seg_start = np.empty(n, dtype=bool)
        seg_start[0] = True
        seg_start[1:] = k[1:] != k[:-1]
        starts = np.flatnonzero(seg_start)
        c = np.cumsum(cnt)
        prior = np.where(starts > 0, c[starts - 1], 0)
        totals = np.add.reduceat(cnt, starts)
        out = {key: pa.array(k[starts])}
        for p, nm in zip(ps, names):
            target = np.maximum(np.ceil(p * totals).astype(np.int64), 1)
            # running count is globally nondecreasing → one searchsorted
            pos = np.searchsorted(c, prior + target, side="left")
            out[nm] = pa.array(v[pos])
        return pa.table(out)

    return partitioned_group_apply(hist, [key], finish,
                                   num_partitions=num_partitions)
