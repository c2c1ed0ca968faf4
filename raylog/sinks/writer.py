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
batch's doc_id buffer) and committed with write-to-temp + atomic rename:
a Ray-retried task or restarted actor re-processing the same block
REPLACES its previous output instead of writing a duplicate under a fresh
uuid — "rows hit disk exactly once" holds per work item, not per attempt.
"""

from __future__ import annotations

import hashlib
import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from raylog.pipelines import log_pipeline as LP
from raylog.stages import route


def batch_identity(batch: pa.Table, id_col: str = "doc_id") -> str:
    """Deterministic id for a batch: md5 of the raw id-column buffer.

    Two attempts at the same block produce the same batch → the same id →
    the retry overwrites rather than duplicates."""
    ids = np.asarray(
        batch[id_col].combine_chunks()
        if isinstance(batch[id_col], pa.ChunkedArray) else batch[id_col]
    )
    return hashlib.md5(ids.tobytes()).hexdigest()[:16]


class SinkWriter:
    """Actor-pool stage: write each batch's routed rows to per-sink parquet.

    Emits the batch's partial (sink, source, level, cnt) counts as its
    output. ``__init__`` runs once per actor (directory setup, id).
    """

    def __init__(self, out_dir: str, compression: str = "zstd"):
        self.out_dir = out_dir
        self.compression = compression
        self.uid = uuid.uuid4().hex[:12]  # tmp-file disambiguator only
        for sink in route.SINKS:
            os.makedirs(os.path.join(out_dir, sink), exist_ok=True)

    def __call__(self, batch: pa.Table) -> pa.Table:
        bid = batch_identity(batch)
        for sink in route.SINKS:
            sub = batch.filter(route.sink_mask(batch, sink))
            if sub.num_rows == 0:
                continue
            out = route.project_logevent(sub, sink, include_maps=True)
            path = os.path.join(self.out_dir, sink, f"part-{bid}.parquet")
            tmp = f"{path}.{self.uid}.tmp"
            pq.write_table(out, tmp, compression=self.compression,
                           compression_level=1)
            os.replace(tmp, path)
        return LP.sink_counts_batch(batch)


def run_to_sinks(
    routed: rd.Dataset,
    out_dir: str,
    *,
    concurrency: int | tuple[int, int] = 8,
    batch_size: int | None = None,
    collect_stats: bool = False,
) -> pa.Table | tuple:
    """Consume the routed dataset: write sinks + return final agg counts.

    The returned table is the per-sink (sink, source, level) counts — the
    flagship aggregate artifact. Small by construction (bounded by key
    cardinality), safe to materialize.
    """
    partials = routed.map_batches(
        SinkWriter,
        fn_constructor_kwargs={"out_dir": out_dir},
        concurrency=concurrency,
        batch_size=batch_size,
        batch_format="pyarrow",
    )
    return LP.aggregate_counts_table(partials, collect_stats=collect_stats)
