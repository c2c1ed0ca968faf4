"""Resumable sharded pipeline runner (checkpoint + per-partition lineage).

Input parquet files are grouped into shards; each shard runs the full
streaming pipeline (parse → enrich → route → single-pass sink write →
aggregate partials) into its own output directory, then a manifest line
is committed recording the shard's lineage (input files), per-sink row
counts, throughput metrics, and the Ray Data stage stats. A re-run skips
completed shards and idempotently rewrites incomplete ones, so a killed
run resumes without double-counting: the final aggregate is computed
from the durable per-shard aggregate parquet files, never from mixed
in-memory state.

At cluster scale each shard is itself executed with full parallelism
(shards bound failure/retry domains, not concurrency), mirroring how a
100 TB input would be processed as O(10k) × O(10 GB) shards.
"""

from __future__ import annotations

import os
import shutil
import time

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from raylog.pipelines import log_pipeline as LP
from raylog.sinks.writer import run_to_sinks
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
    enrich_concurrency: int | tuple[int, int] | None = None,
    batch_size: int = 32_768,
    max_shards_this_run: int | None = None,
) -> pa.Table:
    """Run (or resume) the full pipeline; returns final sink counts.

    ``max_shards_this_run`` exists for crash-simulation tests: process at
    most that many pending shards, then stop (as if the job died).

    Default pool sizes derive from the cluster CPU count so that
    enrich + writer pools + task stages never reserve every CPU (fixed
    actor pools hold their CPUs for the whole execution; all-reserved
    pools stall the downstream combine indefinitely).
    """
    if concurrency is None or enrich_concurrency is None:
        import ray

        ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        if ncpu < 3:
            raise ValueError(
                "the staged sharded runner needs >= 3 CPUs (two actor pools "
                "+ task stages; two pools on 2 CPUs reserve everything and "
                "deadlock the consume) — use the fused path "
                "(run_fused / --fused) on tiny clusters"
            )
        if enrich_concurrency is None:
            enrich_concurrency = max(1, ncpu // 4)
        if concurrency is None:
            concurrency = max(1, ncpu // 2 - 1)
    os.makedirs(out_root, exist_ok=True)
    manifest = Manifest(os.path.join(out_root, "manifest.jsonl"))
    shards = _shards(input_files, n_shards)
    processed = 0
    for shard_id, files in enumerate(shards):
        if manifest.done(shard_id):
            continue
        if max_shards_this_run is not None and processed >= max_shards_this_run:
            break
        shard_dir = os.path.join(out_root, f"shard={shard_id:05d}")
        if os.path.exists(shard_dir):
            shutil.rmtree(shard_dir)  # incomplete from a previous run
        os.makedirs(shard_dir)
        t0 = time.monotonic()
        ds = rd.read_parquet(files)
        routed = LP.pipeline_from_records(ds, dim, concurrency=enrich_concurrency)
        agg, stages = run_to_sinks(
            routed, shard_dir, concurrency=concurrency, batch_size=batch_size,
            collect_stats=True,
        )
        pq.write_table(agg, os.path.join(shard_dir, "sink_counts.parquet"))
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
        os.path.join(out_root, f"shard={e['shard_id']:05d}", "sink_counts.parquet")
        for e in manifest.entries()
    ]
    if not done_aggs:
        return pa.table(
            {"sink": pa.array([], pa.string()), "source": pa.array([], pa.string()),
             "level": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())}
        )
    import pandas as pd

    df = pd.concat([pq.read_table(p).to_pandas() for p in done_aggs])
    out = (
        df.groupby(["sink", "source", "level"], dropna=False)["cnt"]
        .sum()
        .reset_index()
    )
    out["level"] = out["level"].where(out["level"].notna(), None)
    final = pa.Table.from_pandas(out, preserve_index=False)
    pq.write_table(final, os.path.join(out_root, "sink_counts.parquet"))
    return final
