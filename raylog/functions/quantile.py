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


# --------------------------------------------------------------------------
# DDSketch — the mergeable sketch path for UNBOUNDED/continuous domains
# (Masson, Rim, Lee: "DDSketch: a fast and fully-mergeable quantile
# sketch with relative-error guarantees", VLDB 2019). Log-width buckets
# give every quantile estimate a relative error <= alpha; partials are
# plain (bucket, count) rows, so merging IS the repo's key-compressed
# grouped count — no new exchange machinery.
# --------------------------------------------------------------------------


def _dd_gamma(alpha: float) -> float:
    return (1.0 + alpha) / (1.0 - alpha)


def dd_bucket(vals: np.ndarray, alpha: float) -> np.ndarray:
    """Bucket index per positive value: ceil(ln(x) / ln(gamma)).

    Deterministic float64 libm arithmetic — the DuckDB oracle replicates
    it with CEIL(LN(x)/LN(gamma)) on the same machine."""
    g = _dd_gamma(alpha)
    return np.ceil(np.log(vals.astype(np.float64))
                   / np.log(g)).astype(np.int64)


def dd_value(bucket: np.ndarray, alpha: float) -> np.ndarray:
    """Representative value of a bucket: 2*gamma^b / (gamma + 1) — the
    midpoint guaranteeing |est - x| <= alpha * x for any x in bucket."""
    g = _dd_gamma(alpha)
    return 2.0 * np.power(g, bucket.astype(np.float64)) / (g + 1.0)


def grouped_quantile_sketch(
    ds: rd.Dataset,
    *,
    group_cols: list[str],
    value_col: str,
    qs: list[float],
    alpha: float = 0.01,
    num_partitions: int = 8,
) -> rd.Dataset:
    """Per-group DDSketch quantiles for unbounded positive domains.

    map: per batch, key-compressed (group, bucket) -> count partials
    (bucket count is bounded by the value's log-range / alpha — a few
    thousand buckets span 1..10^9 at alpha=0.01 — so partials are
    sketch-sized, never data-sized); merge: the hash-partitioned
    grouped count; finish: per group, rank-scan the sorted buckets at
    ceil(q * n) — one vectorized pass per partition of complete groups.

    Output: (group_cols..., q_milli, bucket) — ``dd_value(bucket,
    alpha)`` is the value estimate with relative error <= alpha.
    Zero / negative values are excluded (standard DDSketch domain;
    count them separately if they matter).
    """
    import pyarrow.compute as pc

    def partial(b: pa.Table) -> pa.Table:
        vals = np.asarray(b[value_col].combine_chunks(), dtype=np.float64)
        mask = vals > 0
        sub = b.filter(pa.array(mask)).select(group_cols)
        bkt = dd_bucket(vals[mask], alpha)
        tbl = sub.append_column("bucket", pa.array(bkt))
        # key-compressed partial: one row per (group, bucket) per batch
        return tbl.group_by(group_cols + ["bucket"]).aggregate(
            [([], "count_all")]).rename_columns(
                group_cols + ["bucket", "cnt"])

    hist = grouped_aggregate_ds(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        group_cols + ["bucket"], [("cnt", "sum", "cnt")],
        num_partitions=num_partitions,
    )

    qs_arr = np.asarray(sorted(qs), dtype=np.float64)

    def finish(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            cols = {g: pa.array([], part[g].type) for g in group_cols}
            cols["q_milli"] = pa.array([], pa.int64())
            cols["bucket"] = pa.array([], pa.int64())
            return pa.table(cols)
        order = np.asarray(pc.sort_indices(
            part, sort_keys=[(g, "ascending") for g in group_cols]
            + [("bucket", "ascending")]), dtype=np.int64)
        sorted_part = part.take(pa.array(order))
        bkt = np.asarray(sorted_part["bucket"].combine_chunks(),
                         dtype=np.int64)
        cnt = np.asarray(sorted_part["cnt"].combine_chunks(),
                         dtype=np.int64)
        gcols = [np.asarray(sorted_part[g].combine_chunks().to_pylist(),
                            dtype=object) for g in group_cols]
        n = len(bkt)
        new_g = np.zeros(n, dtype=bool)
        new_g[0] = True
        for gc in gcols:
            new_g[1:] |= gc[1:] != gc[:-1]
        starts = np.flatnonzero(new_g)
        ends = np.append(starts[1:], n)
        out_rows: dict[str, list] = {g: [] for g in group_cols}
        out_rows["q_milli"] = []
        out_rows["bucket"] = []
        csum = np.cumsum(cnt)
        for s, e in zip(starts, ends):
            seg_tot = csum[e - 1] - (csum[s - 1] if s > 0 else 0)
            base = csum[s - 1] if s > 0 else 0
            ranks = np.ceil(qs_arr * seg_tot).astype(np.int64)
            ranks = np.maximum(ranks, 1)
            idx = s + np.searchsorted(csum[s:e] - base, ranks, side="left")
            for q, i in zip(qs_arr, idx):
                for g, gc in zip(group_cols, gcols):
                    out_rows[g].append(gc[i])
                out_rows["q_milli"].append(int(round(1000 * q)))
                out_rows["bucket"].append(int(bkt[i]))
        cols = {g: pa.array(out_rows[g],
                            part[g].type) for g in group_cols}
        cols["q_milli"] = pa.array(out_rows["q_milli"], pa.int64())
        cols["bucket"] = pa.array(out_rows["bucket"], pa.int64())
        return pa.table(cols)

    return partitioned_group_apply(
        hist, group_cols, finish, num_partitions=num_partitions,
    )
