"""Fused single-pass execution of the flagship pipeline.

The staged pipeline (log_pipeline.py) crosses the object store at every
operator boundary — ~1 KB/row of payload (tokens + content + tags) memcpy'd
2-3x through plasma. Correct, streaming, but bandwidth-bound well before
CPU-bound. This module applies explicit operator fusion, the same move a
query engine's physical planner makes: ONE actor-pool ``map_batches``
stage consumes (file, row_group) work items and runs read → P4/P1 parse →
E1 enrich → P2 extract → N* reshape → T1/T2 route → per-sink parquet
append entirely inside the task, emitting only the per-batch partial
(sink, source, level) counts. Payload bytes never enter the object store;
the only exchanged data is key-compressed partials.

Same semantics as the staged pipeline (shared stage kernels); the pytest
suite asserts staged == fused on the conformance fixture. Scale notes: at
10^12 rows this is the execution shape that survives — per-row-group
failure/retry domains, zero payload shuffle, aggregation traffic bounded
by key cardinality.
"""

from __future__ import annotations

import uuid

import pyarrow as pa
import ray
import ray.data as rd

from raylog.pipelines import log_pipeline as LP
from raylog.sources.reader import _list_row_groups
from raylog.stages import parse, route
from raylog.stages.enrich import BroadcastEnricher
from raylog.state import fsio


class FusedSinkTask:
    """read + parse + enrich + route + write, one row group per item."""

    def __init__(
        self,
        dim,
        out_dir: str | None,
        cap: int = parse.TRUNCATE_CAP,
        compression: str = "zstd",
        columns: list[str] | None = None,
        filesystem=None,
        input_filesystem=None,
    ):
        self.enricher = BroadcastEnricher(dim, key="source")
        self.cap = cap
        self.compression = compression
        self.columns = columns
        self.input_fs = input_filesystem
        self.uid = uuid.uuid4().hex[:12]  # tmp-file disambiguator only
        self.fs = self.out_dir = None
        if out_dir:
            self.fs, self.out_dir = fsio.resolve_fs(out_dir, filesystem)
            for sink in route.SINKS:
                fsio.ensure_dir(self.fs, fsio.join(self.out_dir, sink))

    def _atomic_write(self, out: pa.Table, path: str) -> None:
        # deterministic name + per-FS finalize (state/fsio.py: tmp+rename
        # where rename is atomic, commit marker on object stores): a
        # Ray-retried task REPLACES its output instead of duplicating it
        # (sink rows hit storage exactly once per work item, not per
        # attempt)
        fsio.write_parquet_atomic(self.fs, out, path,
                                  compression=self.compression,
                                  tmp_token=self.uid)

    def _process(self, tbl: pa.Table) -> pa.Table:
        tbl = parse.cri_parse(tbl, key="raw")
        tbl = parse.truncate_content(tbl, key="log", cap=self.cap)
        tbl = self.enricher(tbl)
        tbl = parse.erda_info(tbl, key="log")
        tbl = route.pack_tags(tbl)
        tbl = route.add_route_flags(tbl)
        return tbl

    def _write_export_partitioned(self, sub: pa.Table, out: pa.Table,
                                  item_id: str) -> None:
        import hashlib

        import pyarrow.compute as pc

        urls = sub["monitor_log_collector"]
        urls = urls.combine_chunks() if isinstance(urls, pa.ChunkedArray) else urls
        for url in pc.unique(urls).to_pylist():
            mask = pc.equal(urls, url)
            part = out.filter(mask)
            slug = hashlib.md5(url.encode()).hexdigest()[:10]
            d = fsio.join(self.out_dir, "export", f"collector={slug}")
            fsio.ensure_dir(self.fs, d)
            self._atomic_write(part, fsio.join(d, f"part-{item_id}.parquet"))

    def __call__(self, batch: pa.Table):
        import hashlib

        from raylog.sources.reader import _open_parquet

        paths = batch["path"].to_pylist()
        rgs = batch["row_group"].to_pylist()
        for path, rg in zip(paths, rgs):
            tbl = _open_parquet(path, self.input_fs).read_row_group(
                rg, columns=self.columns)
            routed = self._process(tbl)
            if self.out_dir:
                # sink file names derive from the WORK ITEM identity
                # (input file + row group), never from the attempt
                item_id = f"{hashlib.md5(path.encode()).hexdigest()[:10]}-rg{rg:05d}"
                for sink in route.SINKS:
                    sub = routed.filter(route.sink_mask(routed, sink))
                    if sub.num_rows == 0:
                        continue
                    out = route.project_logevent(sub, sink, include_maps=True)
                    if sink == "export":
                        # G6 analog (out_erda/sender.go:66-82): one export
                        # sub-sink per collector-URL label value — per-key
                        # grouping, strictly more correct than the
                        # reference's first-record-of-chunk shortcut
                        self._write_export_partitioned(sub, out, item_id)
                        continue
                    self._atomic_write(
                        out,
                        fsio.join(self.out_dir, sink,
                                  f"part-{item_id}.parquet"),
                    )
            yield LP.sink_counts_batch(routed)


def run_fused(
    files: list[str],
    dim: pa.Table,
    out_dir: str | None,
    *,
    concurrency: int | tuple[int, int] | None = None,
    collect_stats: bool = False,
    filesystem=None,
    input_filesystem=None,
) -> pa.Table | tuple[pa.Table, list[dict]]:
    """Execute the fused pipeline; returns the final sink counts table.

    The actor pool is sized to NCPU-2 by default: a pool that reserves
    every logical CPU blocks the downstream combine tasks until the idle
    pool is torn down (measured ~19 s of dead time), so headroom for the
    task stages is mandatory, not a tuning nicety.

    ``filesystem`` / ``input_filesystem`` inject ``pyarrow.fs``
    filesystems for the sink writes and the row-group reads
    respectively (separate knobs: on a SubTree view the two sides'
    paths resolve against different roots); both default to local.
    """
    items = _list_row_groups(files, filesystem=input_filesystem)
    if concurrency is None:
        ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        concurrency = max(1, ncpu - 2)
    dim_ref = ray.put(dim) if ray.is_initialized() else dim
    partials = rd.from_items(items).map_batches(
        FusedSinkTask,
        fn_constructor_kwargs={"dim": dim_ref, "out_dir": out_dir,
                               "filesystem": filesystem,
                               "input_filesystem": input_filesystem},
        concurrency=concurrency,
        batch_size=1,
        batch_format="pyarrow",
    )
    return LP.aggregate_counts_table(partials, collect_stats=collect_stats)
