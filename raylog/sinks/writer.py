"""Single-pass routed sink writer (the O1/O2/O3 outputs, SURVEY §2.7).

Ray Data datasets are lazy: consuming three filtered branches separately
would re-execute the whole upstream lineage three times (or force a full
materialization). At 100 TB neither is acceptable, so the fan-out is done
in ONE streaming pass: an actor-pool ``map_batches`` stage that, per
batch, filters + projects each sink's rows, appends them to that sink's
parquet directory, and RETURNS only the per-batch partial aggregate
counts. The pipeline's output dataset is therefore tiny (the partials);
rows hit disk exactly once; and the only shuffle (final groupby over
partials) moves a few KB regardless of input size or source skew.

Sink files are named deterministically from the BATCH CONTENT (md5 of the
batch's doc_id buffer) and committed with the per-FS write-then-finalize
contract (``state/fsio.py``: tmp+rename where rename is atomic, commit
marker elsewhere): a Ray-retried task or restarted actor re-processing
the same block REPLACES its previous output instead of writing a
duplicate under a fresh uuid — "rows hit disk exactly once" holds per
work item, not per attempt. ``filesystem=`` injects any
``pyarrow.fs.FileSystem`` (multi-node shared storage); the default is
the local filesystem, unchanged.
"""

from __future__ import annotations

import hashlib
import uuid

import numpy as np
import pyarrow as pa
import ray.data as rd

from raylog.pipelines import log_pipeline as LP
from raylog.stages import route
from raylog.state import fsio


def batch_identity(batch: pa.Table, id_col: str = "doc_id") -> str:
    """Deterministic id for a batch: md5 of the id column's VALUES.

    Two attempts at the same block produce the same batch → the same id →
    the retry overwrites rather than duplicates. Integer ids hash their
    fixed-width buffer directly; string ids (the sequences table's
    ``doc_id: string``) go through polars' seeded per-row xxhash first —
    ``np.asarray`` on a string column yields OBJECT pointers, which
    differ across worker processes and would silently break the
    retry-replaces contract."""
    col = (batch[id_col].combine_chunks()
           if isinstance(batch[id_col], pa.ChunkedArray) else batch[id_col])
    if pa.types.is_integer(col.type) or pa.types.is_floating(col.type):
        ids = np.asarray(col)
    else:
        import polars as pl

        ids = pl.from_arrow(pa.table({"k": col}))["k"].hash(seed=17).to_numpy()
    return hashlib.md5(ids.tobytes()).hexdigest()[:16]


class SinkWriter:
    """Actor-pool stage: write each batch's routed rows to per-sink parquet.

    Emits the batch's partial (sink, source, level, cnt) counts as its
    output. ``__init__`` runs once per actor (directory setup, id).
    """

    def __init__(self, out_dir: str, compression: str = "zstd",
                 filesystem=None):
        self.fs, self.out_dir = fsio.resolve_fs(out_dir, filesystem)
        self.compression = compression
        self.uid = uuid.uuid4().hex[:12]  # tmp-file disambiguator only
        for sink in route.SINKS:
            fsio.ensure_dir(self.fs, fsio.join(self.out_dir, sink))

    def __call__(self, batch: pa.Table) -> pa.Table:
        bid = batch_identity(batch)
        for sink in route.SINKS:
            sub = batch.filter(route.sink_mask(batch, sink))
            if sub.num_rows == 0:
                continue
            out = route.project_logevent(sub, sink, include_maps=True)
            fsio.write_parquet_atomic(
                self.fs, out,
                fsio.join(self.out_dir, sink, f"part-{bid}.parquet"),
                compression=self.compression, tmp_token=self.uid)
        return LP.sink_counts_batch(batch)


def run_to_sinks(
    routed: rd.Dataset,
    out_dir: str,
    *,
    concurrency: int | tuple[int, int] = 8,
    batch_size: int | None = None,
    collect_stats: bool = False,
    filesystem=None,
) -> pa.Table | tuple:
    """Consume the routed dataset: write sinks + return final agg counts.

    The returned table is the per-sink (sink, source, level) counts — the
    flagship aggregate artifact. Small by construction (bounded by key
    cardinality), safe to materialize. ``filesystem`` (a picklable
    ``pyarrow.fs.FileSystem``) threads into every writer actor.
    """
    partials = routed.map_batches(
        SinkWriter,
        fn_constructor_kwargs={"out_dir": out_dir, "filesystem": filesystem},
        concurrency=concurrency,
        batch_size=batch_size,
        batch_format="pyarrow",
    )
    return LP.aggregate_counts_table(partials, collect_stats=collect_stats)
