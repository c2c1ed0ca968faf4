"""Hash-bucketed table storage (hive/iceberg-style bucketing).

The physical layout that turns repeated keyed access from full scans
into single-bucket reads: rows land in ``bucket = hash(key) % n`` and
each bucket is its own parquet directory. Three wins at 100 TB:

1. point/key lookups read 1/n of the data (``read_bucket_for``);
2. two tables bucketed the same way co-join bucket-by-bucket with NO
   shuffle (the partitioning key chosen once and reused — the engine's
   stated partitioning discipline);
3. buckets are the resume/compaction unit (same contract as the sink
   manifest: deterministic names, tmp+rename, idempotent rewrite).

The bucket hash is `agg.partition_ids`' seeded xxhash (polars) — the
same function the in-memory hash-partitioned aggregate uses, so disk
bucketing and runtime partitioning agree: a Dataset read from bucket b
hash-partitions into partition b with zero row movement.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from raylog.functions.agg import partition_ids
from raylog.state import fsio

__all__ = ["write_bucketed", "read_bucket_for", "read_bucketed"]


def write_bucketed(ds: rd.Dataset, out_dir: str, key: str,
                   num_buckets: int = 16, filesystem=None) -> None:
    """Write ``ds`` as ``out_dir/bucket=NNNN/part-*.parquet``.

    Streaming: each task tags its batch (vectorized hash), splits it by
    bucket, and appends one deterministically-named file per (block,
    bucket) — no shuffle; a bucket's rows may span files (readers glob
    the directory). Retries overwrite via the per-FS finalize contract
    (``state/fsio.py``); ``filesystem`` injects shared multi-node
    storage, default local."""
    fs, out_dir = fsio.resolve_fs(out_dir, filesystem)
    for b in range(num_buckets):
        fsio.ensure_dir(fs, f"{out_dir}/bucket={b:04d}")

    def write(batch: pa.Table) -> pa.Table:
        import numpy as np

        if batch.num_rows == 0:
            return pa.table({"written": pa.array([], pa.int64())})
        pids = partition_ids(batch, [key], num_buckets)
        parr = np.asarray(pids)
        # deterministic per-(content, bucket) file identity → a retried
        # task overwrites its own files, never duplicates them; the tag
        # covers EVERY column's buffers (key column alone collides for
        # two blocks with equal keys but different payloads — silent
        # row loss, ADVICE r2)
        import hashlib

        h = hashlib.md5(str(batch.num_rows).encode())
        for name in batch.column_names:
            h.update(name.encode())
            for buf in batch[name].combine_chunks().buffers():
                if buf is not None:
                    h.update(buf)
        tag = h.hexdigest()[:16]
        n = 0
        for b in np.unique(parr):
            part = batch.filter(pa.array(parr == b))
            fsio.write_parquet_atomic(
                fs, part,
                f"{out_dir}/bucket={int(b):04d}/part-{tag}.parquet",
                tmp_token=f"p{os.getpid()}")
            n += part.num_rows
        return pa.table({"written": pa.array([n], pa.int64())})

    # consume the sink stage (counts only — payloads stay in the tasks)
    ds.map_batches(write, batch_format="pyarrow",
                   batch_size=None).sum("written")


def _bucket_files(out_dir: str, bucket: int | None,
                  filesystem=None) -> tuple[list[str], object]:
    """COMMITTED part files of one bucket (or all), through the fs
    layer — on marker-strategy filesystems an in-flight writer's data
    object is invisible until its ``.ok`` lands."""
    fs, out_dir = fsio.resolve_fs(out_dir, filesystem)
    if bucket is not None:
        return fsio.list_committed(fs, f"{out_dir}/bucket={bucket:04d}"), fs
    dirs = sorted(
        i.path for i in fs.get_file_info(
            fsio.pafs.FileSelector(out_dir, allow_not_found=True))
        if i.type == fsio.pafs.FileType.Directory
        and i.base_name.startswith("bucket="))
    files: list[str] = []
    for d in dirs:
        files.extend(fsio.list_committed(fs, d))
    return sorted(files), fs


def read_bucketed(out_dir: str, columns: list[str] | None = None,
                  filesystem=None) -> rd.Dataset:
    """Read the whole bucketed table (all buckets)."""
    from raylog.sources.reader import read_sequences

    files, fs = _bucket_files(out_dir, None, filesystem)
    return read_sequences(files, columns=columns,
                          filesystem=fs if filesystem is not None else None)


def read_bucket_for(out_dir: str, key: str, value,
                    num_buckets: int = 16,
                    columns: list[str] | None = None,
                    filesystem=None) -> rd.Dataset:
    """Read ONLY the bucket that can contain ``key == value`` — the 1/n
    point-lookup path. Uses the same seeded hash as the writer."""
    from raylog.sources.reader import read_sequences

    probe = pa.table({key: pa.array([value])})
    b = int(partition_ids(probe, [key], num_buckets)[0].as_py())
    files, fs = _bucket_files(out_dir, b, filesystem)
    return read_sequences(files, columns=columns,
                          filesystem=fs if filesystem is not None else None)


def bucketed_join(left_dir: str, right_dir: str, key: str,
                  num_buckets: int = 16,
                  left_columns: list[str] | None = None,
                  right_columns: list[str] | None = None,
                  filesystem=None) -> rd.Dataset:
    """Shuffle-free join of two tables bucketed on the SAME key with the
    same ``num_buckets``: bucket b of the left can only match bucket b
    of the right, so each task reads one bucket pair and hash-joins it
    locally — the network moves each row zero times (vs twice for a
    shuffle join). This is the reuse dividend of picking one
    partitioning key and writing it into the layout."""
    items = [{"b": b} for b in range(num_buckets)]
    lfs, left_dir = fsio.resolve_fs(left_dir, filesystem)
    rfs, right_dir = fsio.resolve_fs(right_dir, filesystem)

    def join_bucket(batch: pa.Table):
        for b in batch["b"].to_pylist():
            lf = fsio.list_committed(lfs, f"{left_dir}/bucket={b:04d}")
            rf = fsio.list_committed(rfs, f"{right_dir}/bucket={b:04d}")
            if not lf or not rf:
                continue
            lt = pa.concat_tables([
                pq.read_table(f, columns=left_columns, filesystem=lfs)
                for f in lf])
            rt = pa.concat_tables([
                pq.read_table(f, columns=right_columns, filesystem=rfs)
                for f in rf])
            # suffixes apply ONLY to colliding non-key names (pyarrow
            # semantics) — self-joins work, disjoint schemas unchanged
            yield lt.join(rt, keys=[key], join_type="inner",
                          right_suffix="_r")

    return rd.from_items(items).map_batches(
        join_bucket, batch_format="pyarrow", batch_size=1)
