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

__all__ = ["write_bucketed", "read_bucket_for", "read_bucketed"]


def write_bucketed(ds: rd.Dataset, out_dir: str, key: str,
                   num_buckets: int = 16) -> None:
    """Write ``ds`` as ``out_dir/bucket=NNNN/part-*.parquet``.

    Streaming: each task tags its batch (vectorized hash), splits it by
    bucket, and appends one deterministically-named file per (block,
    bucket) — no shuffle; a bucket's rows may span files (readers glob
    the directory). Retries overwrite via tmp+rename."""
    os.makedirs(out_dir, exist_ok=True)
    for b in range(num_buckets):
        os.makedirs(f"{out_dir}/bucket={b:04d}", exist_ok=True)

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
            path = f"{out_dir}/bucket={int(b):04d}/part-{tag}.parquet"
            tmp = f"{path}.tmp{os.getpid()}"
            pq.write_table(part, tmp, compression="zstd",
                           compression_level=1)
            os.replace(tmp, path)
            n += part.num_rows
        return pa.table({"written": pa.array([n], pa.int64())})

    # consume the sink stage (counts only — payloads stay in the tasks)
    ds.map_batches(write, batch_format="pyarrow",
                   batch_size=None).sum("written")


def read_bucketed(out_dir: str, columns: list[str] | None = None
                  ) -> rd.Dataset:
    """Read the whole bucketed table (all buckets)."""
    import glob

    files = sorted(glob.glob(f"{out_dir}/bucket=*/part-*.parquet"))
    from raylog.sources.reader import read_sequences

    return read_sequences(files, columns=columns)


def read_bucket_for(out_dir: str, key: str, value,
                    num_buckets: int = 16,
                    columns: list[str] | None = None) -> rd.Dataset:
    """Read ONLY the bucket that can contain ``key == value`` — the 1/n
    point-lookup path. Uses the same seeded hash as the writer."""
    import glob

    probe = pa.table({key: pa.array([value])})
    b = int(partition_ids(probe, [key], num_buckets)[0].as_py())
    files = sorted(glob.glob(f"{out_dir}/bucket={b:04d}/part-*.parquet"))
    from raylog.sources.reader import read_sequences

    return read_sequences(files, columns=columns)


def bucketed_join(left_dir: str, right_dir: str, key: str,
                  num_buckets: int = 16,
                  left_columns: list[str] | None = None,
                  right_columns: list[str] | None = None) -> rd.Dataset:
    """Shuffle-free join of two tables bucketed on the SAME key with the
    same ``num_buckets``: bucket b of the left can only match bucket b
    of the right, so each task reads one bucket pair and hash-joins it
    locally — the network moves each row zero times (vs twice for a
    shuffle join). This is the reuse dividend of picking one
    partitioning key and writing it into the layout."""
    import glob

    items = [{"b": b} for b in range(num_buckets)]

    def join_bucket(batch: pa.Table):
        for b in batch["b"].to_pylist():
            lf = sorted(glob.glob(f"{left_dir}/bucket={b:04d}/part-*.parquet"))
            rf = sorted(glob.glob(f"{right_dir}/bucket={b:04d}/part-*.parquet"))
            if not lf or not rf:
                continue
            lt = pa.concat_tables([pq.read_table(f, columns=left_columns)
                                   for f in lf])
            rt = pa.concat_tables([pq.read_table(f, columns=right_columns)
                                   for f in rf])
            yield lt.join(rt, keys=[key], join_type="inner")

    return rd.from_items(items).map_batches(
        join_bucket, batch_format="pyarrow", batch_size=1)
