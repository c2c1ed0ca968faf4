"""Generic scalable grouped aggregation: per-batch partials + tree combine.

The scale pattern (SURVEY §4.3, ray_guide "Aggregation at scale"): a bare
``groupby().aggregate()`` shuffles every row and its sort-based
implementation collapses on many small blocks; instead each batch is
pre-aggregated with Arrow's hash group_by (bounded output: one row per key
per batch), partials are merged in a local combine stage, and the final
merge runs over the (tiny) combined partials. Skewed keys cannot create a
hot reducer because reducer input is key-compressed, not row-count-bound.

Two final-combine paths, chosen by KEY CARDINALITY:

- :func:`grouped_aggregate` (→ ``pa.Table``): driver-side final merge of
  the combined partials. Right when the key space is small (sink counts,
  regions, windows) — the merged table is tiny by construction.
- :func:`grouped_aggregate_ds` (→ ``Dataset``): hash-partitioned
  distributed combine for HIGH-cardinality keys (per-document hashes,
  distinct ids, candidate pairs) where the result is itself large. Each
  partial row gets a partition id from a vectorized hash of its key
  columns; ``groupby(__p)`` moves key-compressed partials (never raw
  rows) into ``num_partitions`` balanced reducers; each reducer finishes
  its disjoint key range with one Arrow ``group_by``. Nothing
  key-cardinality-sized ever lands on the driver. (Measured 16-20×
  faster than Ray's native sort/hash groupby aggregations on 1M partial
  rows — see round-1 notes in BASELINE.md.)

Supported ops: sum, count, min, max, mean (mean decomposes into
sum+count partials and finalizes as their ratio).
"""

from __future__ import annotations

import numpy as np
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


def partition_ids(tbl: pa.Table, keys: list[str], num_partitions: int) -> pa.Array:
    """Deterministic (within a runtime) partition id per row from the key
    columns — vectorized via polars' seeded xxhash; same key → same
    partition in every worker process."""
    try:
        import polars as pl

        df = pl.from_arrow(tbl.select(keys))
        h = df.select(
            pl.concat_str(
                [pl.col(k).cast(pl.Utf8).fill_null("\x00null") for k in keys],
                separator="\x1f",
            ).hash(seed=17).alias("h")
        )["h"].to_numpy()
        return pa.array((h % num_partitions).astype(np.int64))
    except Exception:  # pragma: no cover - polars always present in image
        import hashlib

        cols = [tbl[k].to_pylist() for k in keys]
        out = [
            int(hashlib.md5("\x1f".join(map(str, row)).encode()).hexdigest()[:8], 16)
            % num_partitions
            for row in zip(*cols)
        ]
        return pa.array(out, pa.int64())


def _finalize(merged: pa.Table, keys: list[str], aggs) -> pa.Table:
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


def grouped_aggregate_ds(
    ds: rd.Dataset,
    keys: list[str],
    aggs: list[tuple[str, str, str]],
    *,
    num_partitions: int = 32,
    batch_size: int = 65_536,
) -> rd.Dataset:
    """Distributed grouped aggregate for HIGH-cardinality keys.

    Same ``aggs`` spec as :func:`grouped_aggregate`, but the final combine
    is hash-partitioned across ``num_partitions`` reducers and the result
    stays a ``Dataset`` — no driver-side table whose size scales with the
    number of distinct keys. Use for per-document / per-pair keys;
    ``num_partitions`` scales with cluster size, not key count (each
    reducer hash-aggregates its partition in one Arrow pass).
    """
    partials = ds.map_batches(
        lambda b: _partial_batch(b, keys, aggs),
        batch_format="pyarrow",
        batch_size=None,
    )

    def _local_combine_with_p(b: pa.Table) -> pa.Table:
        g = _combine_batch(b, keys)
        return g.append_column("__p", partition_ids(g, keys, num_partitions))

    local = partials.map_batches(
        _local_combine_with_p, batch_format="pyarrow", batch_size=batch_size
    )

    def _final(group: pa.Table) -> pa.Table:
        merged = _combine_batch(group.drop_columns(["__p"]), keys)
        return _finalize(merged, keys, aggs)

    return local.groupby("__p").map_groups(_final, batch_format="pyarrow")


def partitioned_group_apply(
    ds: rd.Dataset,
    keys: list[str],
    fn,
    *,
    num_partitions: int = 32,
    batch_size: int = 65_536,
    materialize_input: bool = False,
) -> rd.Dataset:
    """Apply ``fn(pa.Table) -> pa.Table`` to hash partitions that contain
    COMPLETE key groups (same key → same partition).

    The alternative — ``groupby(keys).map_groups`` — invokes a Python
    function once per group: with tens of thousands of tiny groups
    (LSH buckets, inverted-index postings) the per-group pandas overhead
    dominates by 10-30×, and its parallelism collapses to however many
    sorted blocks the shuffle happened to emit. Here ``fn`` receives one
    whole partition (≈ rows/num_partitions, groups unsplit) and handles
    its own vectorized segmentation; the shuffle is the fast int-key
    ``groupby(__p)`` path. ``batch_size`` also coalesces fragmented
    upstream blocks before the shuffle (64 tiny SplitBlocks blocks made
    the sort 8× slower, see BASELINE.md notes).

    ``materialize_input=True`` pins the input blocks before the
    ``groupby(__p)`` barrier. Use when the PRODUCER chain is expensive
    (shingling, fingerprint selection): Ray's sort-based shuffle runs
    measurably worse fused with a heavy producer (interleaved
    in-process A/B on the 19M-row winnow posting set: fused
    57.0/57.4 s vs materialized 21.4/38.6 s at 32 CPUs). The shuffle is
    a barrier that buffers the rows anyway, so peak memory is
    comparable; leave False when the producer is cheap (an extra pinned
    copy buys nothing).
    """
    if materialize_input:
        ds = ds.materialize()

    def addp(b: pa.Table) -> pa.Table:
        return b.append_column("__p", partition_ids(b, keys, num_partitions))

    def run(part: pa.Table) -> pa.Table:
        return fn(part.drop_columns(["__p"]))

    return ds.map_batches(addp, batch_format="pyarrow",
                          batch_size=batch_size).groupby("__p").map_groups(
        run, batch_format="pyarrow"
    )


def argmax_per_key(
    ds: rd.Dataset,
    keys: list[str],
    order_cols: list[str],
    descending: list[bool],
    *,
    num_partitions: int = 32,
    batch_size: int = 65_536,
) -> rd.Dataset:
    """Keep ONE whole row per key — the extreme of ``order_cols`` — at
    high key cardinality (CDC keep-latest-version, newest crawl snapshot
    per URL, best-scoring duplicate per content hash).

    The scale shape mirrors :func:`grouped_aggregate_ds`: each batch first
    reduces itself to ≤ one row per distinct key (a vectorized
    sort + first-occurrence mask — bounded output regardless of row
    count), then the key-compressed partials hash-partition by key and
    each reducer runs the same kernel over complete key groups. No
    driver-side table, no per-group Python calls, and reducer input is
    O(distinct keys), not O(rows), so a hot key (one user producing 30%
    of events) costs its reducer one extra sort pass, not a giant group.
    """
    ascending = [not d for d in descending]

    def _one_per_key(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return tbl
        df = tbl.to_pandas()
        df = df.sort_values(keys + order_cols,
                            ascending=[True] * len(keys) + ascending,
                            kind="mergesort")
        df = df.drop_duplicates(subset=keys, keep="first")
        return pa.Table.from_pandas(df.reset_index(drop=True),
                                    preserve_index=False).cast(tbl.schema)

    partials = ds.map_batches(_one_per_key, batch_format="pyarrow",
                              batch_size=batch_size)
    return partitioned_group_apply(partials, keys, _one_per_key,
                                   num_partitions=num_partitions,
                                   batch_size=batch_size)


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
    return _finalize(merged, keys, aggs)


def seed_join_side(ds, sentinel: "pa.Table"):
    """Guard a (possibly filtered-to-nothing) join input against Ray's
    empty-side hazard: when EVERY block of a side has zero rows the
    dataset-level schema resolves empty and the hash-shuffle join dies
    planning against it. Unioning a one-row sentinel table FIRST makes
    it the schema source; use an unmatchable key (all real keys are
    non-negative ids — convention: -(1<<62)) so the row vanishes in
    inner joins (filter it explicitly after outer joins)."""
    import ray.data as rd

    return rd.from_arrow(sentinel).union(ds)
