"""raylog CLI — run the pipeline standalone.

Examples::

    # parquet sequences input → routed sinks + counts, resumable
    python -m raylog run --input '/data/seq/*.parquet' --out /tmp/out --shards 8

    # raw CRI or docker-JSON log files
    python -m raylog run --input '/var/log/pods/*.log' --format cri --out /tmp/out

    # fused single-pass (fastest; no shard checkpointing)
    python -m raylog run --input '/data/seq/*.parquet' --out /tmp/out --fused

Owns its Ray session (the only places allowed to: CLI, bench.py, tests).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time


def _init_ray(num_cpus: int | None, address: str | None = None):
    import os

    import ray

    if not ray.is_initialized():
        # "local" = private single-node instance (the sandbox default);
        # "auto" = attach to an existing cluster — what `ray job submit`
        # entrypoints use (the job runner exports RAY_ADDRESS)
        addr = address or os.environ.get("RAY_ADDRESS", "local")
        kwargs = dict(address=addr, include_dashboard=False,
                      logging_level="ERROR")
        if num_cpus and addr == "local":  # cluster CPU counts are managed
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False
    return ray


def cmd_run(args) -> int:
    ray = _init_ray(args.cpus, args.address)
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from raylog.records import build_dim_table

    files = sorted(glob.glob(args.input))
    if not files:
        print(f"no input files match {args.input!r}", file=sys.stderr)
        return 2

    t0 = time.monotonic()
    if args.format in ("cri", "docker"):
        from raylog.sources.logfiles import (
            read_cri_logs_with_source,
            read_docker_json_logs_with_source,
        )

        ds = (read_cri_logs_with_source if args.format == "cri"
              else read_docker_json_logs_with_source)(files)
        n = ds.count()
        if args.out:
            ds.write_parquet(args.out)
        print(json.dumps({"rows": n, "wall_sec": round(time.monotonic() - t0, 2)}))
        ray.shutdown()
        return 0

    # parquet sequences input
    sources = set()
    for f in files:
        col = pq.read_table(f, columns=["source"])["source"]
        sources.update(pc.unique(col.combine_chunks()).to_pylist())
    dim = build_dim_table(sorted(sources))

    if args.fused:
        from raylog.pipelines.fused import run_fused

        agg = run_fused(files, dim, args.out)
    else:
        from raylog.pipelines.runner import run_resumable

        agg = run_resumable(files, args.out, dim, n_shards=args.shards)
    total = sum(r["cnt"] for r in agg.to_pylist())
    print(json.dumps({
        "routed_rows": int(total),
        "agg_keys": agg.num_rows,
        "wall_sec": round(time.monotonic() - t0, 2),
        "out": args.out,
    }))
    ray.shutdown()
    return 0


def cmd_query(args) -> int:
    """Run any registered operator/pipeline from the query catalog."""
    from raylog.pipelines.queries import QUERIES

    if args.list or args.name is None:
        for name in sorted(QUERIES):
            print(name)
        return 0
    if args.name not in QUERIES:
        print(f"unknown query {args.name!r} (use --list)", file=sys.stderr)
        return 2
    ray = _init_ray(args.cpus, args.address)
    import pandas as pd
    import pyarrow as pa
    t0 = time.monotonic()
    res = QUERIES[args.name](args.sf_dir)
    if isinstance(res, pa.Table):
        df = res.to_pandas()
    elif isinstance(res, pd.DataFrame):
        df = res
    else:  # ray.data.Dataset
        df = res.to_pandas()
    wall = round(time.monotonic() - t0, 2)
    if args.out:
        df.to_parquet(args.out)
    else:
        with pd.option_context("display.max_rows", 20):
            print(df)
    print(json.dumps({"query": args.name, "rows": len(df),
                      "wall_sec": wall}), file=sys.stderr)
    ray.shutdown()
    return 0


def cmd_synth(args) -> int:
    ray = _init_ray(args.cpus, args.address)
    from raylog.sources.synth import synthesize_sequences

    paths = synthesize_sequences(args.out, args.rows, seed=args.seed)
    print(json.dumps({"files": len(paths), "rows": args.rows, "dir": args.out}))
    ray.shutdown()
    return 0


def cmd_follow(args) -> int:
    ray = _init_ray(args.cpus, args.address)
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from raylog.pipelines.runner import run_follow
    from raylog.records import build_dim_table

    first = sorted(glob.glob(os.path.join(args.input_dir, args.pattern)))
    sources = set()
    for f in first:
        col = pq.read_table(f, columns=["source"])["source"]
        sources.update(pc.unique(col.combine_chunks()).to_pylist())
    if args.sources:
        sources.update(args.sources.split(","))
    dim = build_dim_table(sorted(sources))
    t0 = time.monotonic()
    agg = run_follow(
        args.input_dir, args.out, dim, pattern=args.pattern,
        poll_sec=args.poll_sec, max_ticks=args.max_ticks,
        stop_after_idle=args.stop_after_idle,
    )
    total = sum(r["cnt"] for r in agg.to_pylist())
    print(json.dumps({
        "routed_rows": int(total),
        "agg_keys": agg.num_rows,
        "wall_sec": round(time.monotonic() - t0, 2),
        "out": args.out,
    }))
    ray.shutdown()
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="raylog")
    sub = p.add_subparsers(dest="cmd", required=True)

    run = sub.add_parser("run", help="run the log pipeline over input files")
    run.add_argument("--input", required=True, help="glob of input files")
    run.add_argument("--out", required=True, help="output root directory")
    run.add_argument("--format", choices=["parquet", "cri", "docker"],
                     default="parquet")
    run.add_argument("--shards", type=int, default=4)
    run.add_argument("--fused", action="store_true",
                     help="single-pass fused execution (no shard resume)")
    run.add_argument("--cpus", type=int, default=None)
    run.add_argument("--address", default=None,
                     help="Ray address: 'local' (default) or 'auto' to "
                          "attach to a cluster (ray job submit)")
    run.set_defaults(fn=cmd_run)

    q = sub.add_parser("query", help="run a registered query/operator")
    q.add_argument("name", nargs="?", default=None,
                   help="query name (omit with --list to enumerate)")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.001",
                   help="input tables directory")
    q.add_argument("--out", default=None,
                   help="write result parquet here instead of printing")
    q.add_argument("--list", action="store_true",
                   help="list the registered query catalog")
    q.add_argument("--cpus", type=int, default=None)
    q.add_argument("--address", default=None)
    q.set_defaults(fn=cmd_query)

    fol = sub.add_parser(
        "follow",
        help="tail analog: watch a directory, process new files per tick")
    fol.add_argument("--input-dir", required=True)
    fol.add_argument("--out", required=True)
    fol.add_argument("--pattern", default="*.parquet")
    fol.add_argument("--poll-sec", type=float, default=2.0)
    fol.add_argument("--max-ticks", type=int, default=None)
    fol.add_argument("--stop-after-idle", type=int, default=None,
                     help="stop after N ticks with no new files "
                          "(omit to follow forever)")
    fol.add_argument("--sources", default=None,
                     help="comma-separated extra sources for the dim "
                          "table (files arriving later may carry "
                          "sources absent from the first wave)")
    fol.add_argument("--cpus", type=int, default=None)
    fol.add_argument("--address", default=None)
    fol.set_defaults(fn=cmd_follow)

    synth = sub.add_parser("synth", help="synthesize a sequences table")
    synth.add_argument("--out", required=True)
    synth.add_argument("--rows", type=int, default=1_000_000)
    synth.add_argument("--seed", type=int, default=42)
    synth.add_argument("--cpus", type=int, default=None)
    synth.add_argument("--address", default=None)
    synth.set_defaults(fn=cmd_synth)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
