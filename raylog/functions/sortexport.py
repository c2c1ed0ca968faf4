"""Range-partitioned globally-sorted parquet export.

A downstream consumer that binary-searches or merges by key wants the
corpus laid out as SORTED, RANGE-DISJOINT files. Ray's ``ds.sort``
produces sorted blocks but not a keyed file layout; this sink does the
classic sample-based range partition explicitly:

1. one streaming pass samples each block's key distribution (stride
   sample — deterministic, no RNG);
2. the driver cuts the tiny sample into ``num_ranges`` quantile
   boundaries (bounded: sample_stride values per block);
3. each batch tags rows with a range id (vectorized searchsorted), the
   hash shuffle on the range id co-locates each range whole, and every
   range sorts itself and writes ONE deterministically-named file
   (idempotent: a retry overwrites the same name via tmp+rename, same
   contract as `sinks/writer.py`).

File names embed the range index, so ``sorted(glob(...))`` IS the
global order. Skewed keys cost at most one hot range — boundaries come
from the sampled distribution, and ``num_ranges`` scales with the
cluster, not the data.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from raylog.functions.agg import partitioned_group_apply
from raylog.state import fsio


def range_sorted_export(
    ds: rd.Dataset,
    out_dir: str,
    *,
    key: str,
    num_ranges: int = 16,
    sample_stride: int = 64,
    filesystem=None,
) -> pa.Table:
    """Write ``ds`` as ``num_ranges`` sorted, range-disjoint parquet
    files under ``out_dir``; returns a manifest (range_id, rows,
    key_min, key_max) table sorted by range_id.

    Pre-existing ``range_*.parquet`` files are removed first: the
    consumer contract is ``sorted(glob("range_*.parquet"))`` == global
    order, and stale higher-numbered files from an earlier, larger run
    would silently corrupt it.
    """
    fs, out_dir = fsio.resolve_fs(out_dir, filesystem)
    fsio.ensure_dir(fs, out_dir)
    for stale in fsio.list_files(fs, out_dir):
        if os.path.basename(stale).startswith("range_"):
            fsio.delete_file(fs, stale)

    def sample(b: pa.Table) -> pa.Table:
        v = np.sort(np.asarray(b[key].combine_chunks(), dtype=np.int64))
        return pa.table({"v": pa.array(v[:: max(1, len(v) // sample_stride)])})

    sampled = np.sort(np.concatenate([
        np.asarray(t["v"]) for t in ds.map_batches(
            sample, batch_format="pyarrow", batch_size=None
        ).iter_batches(batch_format="pyarrow", batch_size=None)
    ] or [np.zeros(0, dtype=np.int64)]))
    if len(sampled) == 0:
        return pa.table({"range_id": pa.array([], pa.int64()),
                         "rows": pa.array([], pa.int64()),
                         "key_min": pa.array([], pa.int64()),
                         "key_max": pa.array([], pa.int64())})
    cuts = np.unique(sampled[np.linspace(
        0, len(sampled) - 1, num_ranges + 1).astype(np.int64)][1:-1])

    def tag(b: pa.Table) -> pa.Table:
        v = np.asarray(b[key].combine_chunks(), dtype=np.int64)
        return b.append_column(
            "__range", pa.array(np.searchsorted(cuts, v, side="right")))

    def write_range(part: pa.Table) -> pa.Table:
        # a hash partition holds one or more COMPLETE ranges: sort the
        # whole partition by (range, key) once, then slice per range
        rng = np.asarray(part["__range"].combine_chunks(), dtype=np.int64)
        kv = np.asarray(part[key].combine_chunks(), dtype=np.int64)
        order = np.lexsort((kv, rng))
        part = part.take(pa.array(order))
        rng, kv = rng[order], kv[order]
        starts = np.flatnonzero(np.concatenate(
            [[True], rng[1:] != rng[:-1]]))
        bounds = np.append(starts, len(rng))
        rows = []
        for s, e in zip(bounds[:-1], bounds[1:]):
            rid = int(rng[s])
            t = part.slice(s, e - s).drop_columns(["__range"])
            # idempotent: retry replaces (per-FS finalize, state/fsio.py)
            fsio.write_parquet_atomic(
                fs, t, fsio.join(out_dir, f"range_{rid:05d}.parquet"),
                compression="snappy", compression_level=None)
            rows.append((rid, e - s, int(kv[s]), int(kv[e - 1])))
        return pa.table({
            "range_id": pa.array([r[0] for r in rows], pa.int64()),
            "rows": pa.array([r[1] for r in rows], pa.int64()),
            "key_min": pa.array([r[2] for r in rows], pa.int64()),
            "key_max": pa.array([r[3] for r in rows], pa.int64()),
        })

    manifest = partitioned_group_apply(
        ds.map_batches(tag, batch_format="pyarrow", batch_size=None),
        ["__range"], write_range, num_partitions=num_ranges,
    ).to_pandas().sort_values("range_id").reset_index(drop=True)
    return pa.Table.from_pandas(manifest, preserve_index=False)


def compact_parquet_dir(
    in_dir: str,
    out_dir: str,
    *,
    target_rows: int = 1_000_000,
    filesystem=None,
) -> pa.Table:
    """Compact a directory of small parquet files into ~target_rows
    files — the maintenance pass a resumable pipeline needs after many
    checkpointed shards each wrote their own small output.

    Planning is metadata-only (row counts from parquet footers, no data
    read on the driver); files are greedily binned in name order so
    compaction preserves the directory's file-name ordering contract
    (`range_sorted_export` output stays globally sorted). One Ray task
    per bin reads its files and writes ONE deterministically-named
    output (tmp+rename — rerun-idempotent). Returns a manifest
    (out_file, n_files, rows).
    """
    import ray.data as _rd

    in_fs, in_dir = fsio.resolve_fs(in_dir, filesystem)
    out_fs, out_dir = fsio.resolve_fs(out_dir, filesystem)
    files = fsio.list_committed(in_fs, in_dir)
    bins: list[dict] = []
    cur: dict | None = None
    for f in files:
        rows = pq.read_metadata(f, filesystem=in_fs).num_rows
        if cur is None or (cur["rows"] + rows > target_rows and cur["files"]):
            cur = {"files": [], "rows": 0}
            bins.append(cur)
        cur["files"].append(f)
        cur["rows"] += rows
    fsio.ensure_dir(out_fs, out_dir)

    def write_bin(batch: pa.Table):
        for idx, fl in zip(batch["idx"].to_pylist(),
                           batch["files"].to_pylist()):
            t = pa.concat_tables(
                [pq.read_table(f, filesystem=in_fs) for f in fl],
                promote_options="default")
            final = fsio.join(out_dir, f"part_{idx:05d}.parquet")
            fsio.write_parquet_atomic(out_fs, t, final,
                                      compression="snappy",
                                      compression_level=None)
            yield pa.table({
                "out_file": pa.array([final]),
                "n_files": pa.array([len(fl)], pa.int64()),
                "rows": pa.array([t.num_rows], pa.int64()),
            })

    items = [{"idx": i, "files": b["files"]} for i, b in enumerate(bins)]
    if not items:
        return pa.table({"out_file": pa.array([], pa.string()),
                         "n_files": pa.array([], pa.int64()),
                         "rows": pa.array([], pa.int64())})
    manifest = _rd.from_items(items).map_batches(
        write_bin, batch_format="pyarrow", batch_size=1,
    ).to_pandas().sort_values("out_file").reset_index(drop=True)
    return pa.Table.from_pandas(manifest, preserve_index=False)
