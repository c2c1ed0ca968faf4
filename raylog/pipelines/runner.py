"""Resumable sharded pipeline runner (checkpoint + per-partition lineage).

Input parquet files are grouped into shards; each shard runs the FUSED
single-pass pipeline (read → parse → enrich → route → per-sink parquet
write → aggregate partials — raylog/pipelines/fused.py, the measured-
fastest execution path) into its own output directory, then a manifest
line is committed recording the shard's lineage (input files), per-sink
row counts, throughput metrics, and the Ray Data stage stats. A re-run
skips completed shards and idempotently rewrites incomplete ones, so a
killed run resumes without double-counting: the final aggregate is
computed from the durable per-shard aggregate parquet files, never from
mixed in-memory state.

Resume validates lineage: a manifest entry whose recorded input files no
longer match the current shard assignment (the file list or shard count
changed between runs) raises instead of silently skipping mismatched
work.

At cluster scale each shard is itself executed with full parallelism
(shards bound failure/retry domains, not concurrency), mirroring how a
100 TB input would be processed as O(10k) × O(10 GB) shards.
"""

from __future__ import annotations

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq

from raylog.pipelines.fused import run_fused
from raylog.state import fsio
from raylog.state.manifest import Manifest


def _shards(files: list[str], n_shards: int) -> list[list[str]]:
    n_shards = max(1, min(n_shards, len(files)))
    out: list[list[str]] = [[] for _ in range(n_shards)]
    for i, f in enumerate(sorted(files)):
        out[i % n_shards].append(f)
    return out


def run_resumable(
    input_files: list[str],
    out_root: str,
    dim: pa.Table,
    *,
    n_shards: int = 4,
    concurrency: int | tuple[int, int] | None = None,
    enrich_concurrency: int | tuple[int, int] | None = None,  # unused (fused)
    batch_size: int = 32_768,  # unused (fused path reads whole row groups)
    max_shards_this_run: int | None = None,
    filesystem=None,
) -> pa.Table:
    """Run (or resume) the full pipeline; returns final sink counts.

    ``max_shards_this_run`` exists for crash-simulation tests: process at
    most that many pending shards, then stop (as if the job died).

    ``enrich_concurrency`` / ``batch_size`` are accepted for backward
    compatibility but unused: each shard executes via the fused
    single-pass path (one actor pool; measured ~7× faster than the staged
    writer chain in BENCH_r01), which sizes itself off the cluster CPUs
    when ``concurrency`` is None.

    ``filesystem`` routes ALL output — shard sink dirs, per-shard
    aggregates, the manifest, the final counts — through an injected
    ``pyarrow.fs.FileSystem`` (the multi-node shared-storage path);
    default is the local filesystem, byte-identical to before.
    """
    fs, out_root = fsio.resolve_fs(out_root, filesystem)
    fsio.ensure_dir(fs, out_root)
    manifest = Manifest(fsio.join(out_root, "manifest.jsonl"),
                        filesystem=filesystem)
    shards = _shards(input_files, n_shards)
    processed = 0
    for shard_id, files in enumerate(shards):
        done_entry = manifest.entry(shard_id)
        if done_entry is not None:
            recorded = done_entry.get("input_files")
            if recorded != files:
                raise ValueError(
                    f"manifest lineage mismatch for shard {shard_id}: "
                    f"recorded input_files {recorded!r} != current shard "
                    f"assignment {files!r} — the input file list or "
                    "n_shards changed since the previous run; resume with "
                    "the original inputs or use a fresh out_root"
                )
            continue
        if max_shards_this_run is not None and processed >= max_shards_this_run:
            break
        shard_dir = fsio.join(out_root, f"shard={shard_id:05d}")
        fsio.delete_dir(fs, shard_dir)  # incomplete from a previous run
        fsio.ensure_dir(fs, shard_dir)
        t0 = time.monotonic()
        agg, stages = run_fused(
            files, dim, shard_dir, concurrency=concurrency,
            collect_stats=True, filesystem=filesystem,
        )
        fsio.write_parquet_atomic(
            fs, agg, fsio.join(shard_dir, "sink_counts.parquet"),
            compression="snappy", compression_level=None)
        wall = time.monotonic() - t0
        sink_rows = {}
        for b in agg.to_pylist():
            sink_rows[b["sink"]] = sink_rows.get(b["sink"], 0) + b["cnt"]
        total = sum(sink_rows.values())
        manifest.mark_done(
            shard_id,
            {
                "input_files": files,
                "sink_rows": sink_rows,
                "routed_rows": total,
                "wall_sec": round(wall, 3),
                "rows_per_sec": round(total / wall, 1) if wall > 0 else None,
                "stages": stages,
            },
        )
        processed += 1

    # final aggregate strictly from durable per-shard partials
    done_aggs = [
        fsio.join(out_root, f"shard={e['shard_id']:05d}", "sink_counts.parquet")
        for e in manifest.entries()
    ]
    if not done_aggs:
        return pa.table(
            {"sink": pa.array([], pa.string()), "source": pa.array([], pa.string()),
             "level": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())}
        )
    import pandas as pd

    df = pd.concat([pq.read_table(p, filesystem=fs).to_pandas()
                    for p in done_aggs])
    out = (
        df.groupby(["sink", "source", "level"], dropna=False)["cnt"]
        .sum()
        .reset_index()
    )
    out["level"] = out["level"].where(out["level"].notna(), None)
    final = pa.Table.from_pandas(out, preserve_index=False)
    fsio.write_parquet_atomic(fs, final,
                              fsio.join(out_root, "sink_counts.parquet"),
                              compression="snappy", compression_level=None)
    return final


def run_follow(
    input_dir: str,
    out_root: str,
    dim: pa.Table,
    *,
    pattern: str = "*.parquet",
    poll_sec: float = 0.5,
    max_ticks: int | None = None,
    stop_after_idle: int | None = None,
    concurrency: int | tuple[int, int] | None = None,
    max_runs_per_tick: int = 8,
    dim_refresh_sec: float = 300.0,
    filesystem=None,
) -> pa.Table:
    """Continuous micro-batch mode — the engine's TAIL analog.

    ``filesystem`` routes all OUTPUT (group dirs, manifest, final
    counts) through an injected ``pyarrow.fs.FileSystem``; the tailed
    ``input_dir`` stays a local listing by the documented
    immutable-shard convention (the reference's tail is a node-local
    agent too — shared-storage INPUT goes through the batch
    :func:`run_resumable` path instead).

    The reference is a resident agent: tail picks up log files as they
    appear and the offset DB survives restarts. The batch-engine analog
    is a follow loop: each tick lists ``input_dir``, processes files
    not yet committed to the manifest (one shard per FILE — lineage is
    append-only, so new files never invalidate old entries the way a
    changed fixed file list does in :func:`run_resumable`), and commits
    a manifest line after the shard's outputs are durable. A killed
    follower restarted on the same ``out_root`` resumes exactly where
    it stopped.

    Stop conditions (a production follower runs forever; tests and
    drain jobs need bounds): ``max_ticks`` total ticks, or
    ``stop_after_idle`` consecutive ticks that discovered nothing new.
    Returns the cumulative sink counts from the durable per-file
    aggregates.

    Rotation semantics: manifest entries key on the file NAME, so a
    rotated file must arrive under a new name (the universal convention
    for immutable shard drops). Rewriting an already-committed name in
    place is NOT detected — the reference's inode-tracking tail has no
    analog over immutable parquet, and silent reprocessing would
    double-count; drop rewrites under fresh names instead.

    Tiny-file amortization (VERDICT r3 'do this' #5, the tail's
    ``Rotate_Wait`` regime of thousands of small rotated files,
    conf/ds/docker-runtime.conf:13-14): a tick's new files batch into
    ≤ ``max_runs_per_tick`` contiguous groups, each ONE fused run —
    not one run per file, whose per-run fixed cost (actor pool spin-up,
    plan build) dominates on small files. Resume stays PER FILE: every
    file of a completed group gets its own manifest line (all pointing
    at the group's aggregate, deduped at final-aggregation time), so a
    restarted follower re-lists exactly the unfinished files; a group
    interrupted mid-run committed nothing and reruns whole (idempotent
    writes, stale group dirs of a dead follower are swept at start).

    Dim refresh (VERDICT r3 'do this' #6, the Kube_Meta_Cache_TTL 300
    analog, conf/ds/fluent-bit.conf:47): pass ``dim`` as a ZERO-ARG
    CALLABLE to make the enrichment table dynamic — it is re-invoked at
    tick start once ``dim_refresh_sec`` has elapsed since the last
    load (epoch swap: each group run broadcasts the table it was given
    via ``ray.put``, so in-flight work keeps its version and the next
    tick's records carry the new tags). Every manifest line records
    ``dim_epoch`` for lineage. A plain ``pa.Table`` keeps the static
    batch-mode behavior.
    """
    import glob as _glob
    import hashlib as _hashlib

    fs, out_root = fsio.resolve_fs(out_root, filesystem)
    fsio.ensure_dir(fs, out_root)
    dim_source = dim if callable(dim) else None
    cur_dim = dim_source() if dim_source else dim
    dim_epoch, dim_loaded = 0, time.monotonic()
    manifest = Manifest(fsio.join(out_root, "follow_manifest.jsonl"),
                        filesystem=filesystem)
    # sweep group dirs no completed entry references (dead follower)
    live = {e.get("group") for e in manifest.entries()}
    from pyarrow import fs as _pafs

    for info in fs.get_file_info(
            _pafs.FileSelector(out_root, allow_not_found=True)):
        if (info.type == _pafs.FileType.Directory
                and info.base_name.startswith("group=")
                and info.base_name[len("group="):] not in live):
            fsio.delete_dir(fs, info.path)
    ticks = idle = 0
    while True:
        if (dim_source is not None
                and time.monotonic() - dim_loaded >= dim_refresh_sec):
            cur_dim = dim_source()
            dim_epoch += 1
            dim_loaded = time.monotonic()
        files = sorted(_glob.glob(os.path.join(input_dir, pattern)))
        new = [f for f in files if not manifest.done(os.path.basename(f))]
        n_groups = max(1, min(max_runs_per_tick, len(new)))
        chunk = -(-len(new) // n_groups) if new else 0
        for gi in range(0, len(new), max(chunk, 1)):
            group = new[gi: gi + chunk]
            keys = [os.path.basename(f) for f in group]
            ghash = _hashlib.md5("\x1f".join(keys).encode()).hexdigest()[:12]
            shard_dir = fsio.join(out_root, f"group={ghash}")
            fsio.delete_dir(fs, shard_dir)  # incomplete from a dead follower
            fsio.ensure_dir(fs, shard_dir)
            t0 = time.monotonic()
            agg, stages = run_fused(group, cur_dim, shard_dir,
                                    concurrency=concurrency,
                                    collect_stats=True,
                                    filesystem=filesystem)
            fsio.write_parquet_atomic(
                fs, agg, fsio.join(shard_dir, "sink_counts.parquet"),
                compression="snappy", compression_level=None)
            wall = time.monotonic() - t0
            total = sum(r["cnt"] for r in agg.to_pylist())
            for key, f in zip(keys, group):
                manifest.mark_done(key, {
                    "input_files": [f],
                    "group": ghash,
                    "dim_epoch": dim_epoch,
                    "group_files": keys,
                    "routed_rows": total,
                    "wall_sec": round(wall, 3),
                    "rows_per_sec": (round(total / wall, 1)
                                     if wall > 0 else None),
                    "stages": stages,
                })
        ticks += 1
        idle = 0 if new else idle + 1
        if max_ticks is not None and ticks >= max_ticks:
            break
        if stop_after_idle is not None and idle >= stop_after_idle:
            break
        time.sleep(poll_sec)

    # one aggregate per GROUP (per-file entries share their group's
    # partial); pre-batching entries (no "group") keep file= paths
    seen_groups: set[str] = set()
    done_aggs = []
    for e in manifest.entries():
        g = e.get("group")
        if g is None:
            done_aggs.append(fsio.join(
                out_root, f"file={e['shard_id']}", "sink_counts.parquet"))
        elif g not in seen_groups:
            seen_groups.add(g)
            done_aggs.append(fsio.join(
                out_root, f"group={g}", "sink_counts.parquet"))
    if not done_aggs:
        return pa.table(
            {"sink": pa.array([], pa.string()),
             "source": pa.array([], pa.string()),
             "level": pa.array([], pa.string()),
             "cnt": pa.array([], pa.int64())}
        )
    import pandas as pd

    df = pd.concat([pq.read_table(p, filesystem=fs).to_pandas()
                    for p in done_aggs])
    out = (
        df.groupby(["sink", "source", "level"], dropna=False)["cnt"]
        .sum()
        .reset_index()
    )
    out["level"] = out["level"].where(out["level"].notna(), None)
    final = pa.Table.from_pandas(out, preserve_index=False)
    fsio.write_parquet_atomic(fs, final,
                              fsio.join(out_root, "sink_counts.parquet"),
                              compression="snappy", compression_level=None)
    return final
