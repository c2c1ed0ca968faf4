"""Generic scalable grouped aggregation: per-batch partials + tree combine.

The scale pattern (SURVEY §4.3, ray_guide "Aggregation at scale"): a bare
``groupby().aggregate()`` shuffles every row and its sort-based
implementation collapses on many small blocks; instead each batch is
pre-aggregated with Arrow's hash group_by (bounded output: one row per key
per batch), partials are merged in a local combine stage, and the final
merge runs over the (tiny) combined partials. Skewed keys cannot create a
hot reducer because reducer input is key-compressed, not row-count-bound.

Supported ops: sum, count, min, max, mean (mean decomposes into
sum+count partials and finalizes as their ratio).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

_PARTIAL_OPS = {"sum": "sum", "count": "count", "min": "min", "max": "max"}


def _partial_batch(batch: pa.Table, keys: list[str], aggs) -> pa.Table:
    cols = []
    star = False
    for col, op, alias in aggs:
        if op == "mean":
            cols.append((col, "sum"))
            cols.append((col, "count"))
        elif op == "count" and col == "*":
            star = True
        elif op == "count":
            cols.append((col, "count"))
        else:
            cols.append((col, _PARTIAL_OPS[op]))
    # dedupe requested (col, op) pairs
    seen, spec = set(), []
    for c, o in cols:
        if (c, o) not in seen:
            seen.add((c, o))
            spec.append((c, o))
    if star:
        spec.append(([], "count_all"))
    g = batch.group_by(keys).aggregate(spec)
    if star:
        g = g.rename_columns(
            ["_star_count" if c == "count_all" else c for c in g.column_names]
        )
    return g


def _combine_batch(batch: pa.Table, keys: list[str]) -> pa.Table:
    spec = []
    rename = {}
    for name in batch.column_names:
        if name in keys:
            continue
        col, op = name.rsplit("_", 1)
        if op in ("sum", "count"):
            spec.append((name, "sum"))
            rename[f"{name}_sum"] = name
        elif op in ("min", "max"):
            spec.append((name, op))
            rename[f"{name}_{op}"] = name
    g = batch.group_by(keys).aggregate(spec)
    return g.rename_columns([rename.get(c, c) for c in g.column_names])


def grouped_aggregate(
    ds: rd.Dataset,
    keys: list[str],
    aggs: list[tuple[str, str, str]],
    *,
    batch_size: int = 65_536,
) -> pa.Table:
    """aggs: [(column, op, alias)] with op ∈ {sum,count,min,max,mean}.

    Returns the final aggregate as an Arrow table (small by construction —
    bounded by key cardinality). ``count`` uses non-null count of the key
    column when column is "*".
    """
    partials = ds.map_batches(
        lambda b: _partial_batch(b, keys, aggs),
        batch_format="pyarrow",
        batch_size=None,
    )
    local = partials.map_batches(
        lambda b: _combine_batch(b, keys),
        batch_format="pyarrow",
        batch_size=batch_size,
    )
    tables = list(local.iter_batches(batch_format="pyarrow", batch_size=None))
    if not tables:
        return pa.table({})
    merged = _combine_batch(
        pa.concat_tables(tables, promote_options="default"), keys
    )
    # finalize
    out: dict[str, pa.Array] = {k: merged[k] for k in keys}
    for col, op, alias in aggs:
        if op == "mean":
            out[alias] = pc.divide(
                pc.cast(merged[f"{col}_sum"], pa.float64()),
                pc.cast(merged[f"{col}_count"], pa.float64()),
            )
        elif op == "count":
            out[alias] = (
                merged["_star_count"] if col == "*" else merged[f"{col}_count"]
            )
        else:
            out[alias] = merged[f"{col}_{_PARTIAL_OPS[op]}"]
    return pa.table(out)
