"""The flagship DaemonSet-analog pipeline (conf/ds/fluent-bit.conf).

Dataflow (each stage a lazy ``map_batches`` over zero-copy Arrow batches;
the streaming executor pipelines them with backpressure):

    read (parquet, pruned columns)
      → build/ingest log records
      → P4 cri_parse (time/stream/log split + ns timestamp)
      → P1 truncate (50 KiB content cap)
      → E1/E2 broadcast enrichment (actor pool, dim loaded once per actor)
      → P2 erda-info (level / request_id regex extract)
      → N7-N10 reshape + tags pack
      → T1/T2 route flags
      → per-sink projection (G3/N11) → parquet sinks / aggregate counts

Scale notes (100 TB design): every stage up to the sink is an
embarrassingly parallel map — no shuffle. The per-sink
(sink, source, level) counts are pre-aggregated per batch inside the
writer stage, so the only groupby moves tiny partials (≤ distinct keys per
batch), never rows; skewed `source` distributions therefore cannot create
a hot reducer. The dimension table is broadcast via ``ray.put`` once and
read from the local object store by each enrichment actor.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data as rd

from raylog import records as R
from raylog.stages import enrich, parse, route


def read_documents(sf_dir: str, columns=("doc_id", "text", "source")) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=list(columns))


def dim_for(sf_dir: str) -> pa.Table:
    """Build the enrichment dim table from the distinct `source` values.

    Dimension build is a driver-side read of ONE column of the small
    documents table (the dim side of a broadcast join is by definition
    small); at production scale this would read a catalog, not the facts.
    """
    src = pq.read_table(f"{sf_dir}/documents.parquet", columns=["source"])
    sources = pc.unique(src["source"].combine_chunks()).to_pylist()
    return R.build_dim_table(sources)


def records_ds(sf_dir: str) -> rd.Dataset:
    """documents → log-record stream (doc_id, source, stream, raw, tokens...)."""
    return read_documents(sf_dir).map_batches(
        R.build_records_batch, batch_format="pyarrow", batch_size=None
    )


def parsed_ds(ds: rd.Dataset, cap: int = parse.TRUNCATE_CAP) -> rd.Dataset:
    """P4 + P1: CRI split, ns timestamp, content truncation."""
    def _parse(batch: pa.Table) -> pa.Table:
        batch = parse.cri_parse(batch, key="raw")
        batch = parse.truncate_content(batch, key="log", cap=cap)
        return batch

    return ds.map_batches(_parse, batch_format="pyarrow", batch_size=None)


def enriched_ds(
    ds: rd.Dataset,
    dim: pa.Table,
    *,
    concurrency: int | tuple[int, int] = 4,
) -> rd.Dataset:
    """E1/E2 broadcast lookup (actor pool) + P2 + reshape + route flags."""
    dim_ref = ray.put(dim) if ray.is_initialized() else dim
    ds = ds.map_batches(
        enrich.BroadcastEnricher,
        fn_constructor_kwargs={"dim": dim_ref, "key": "source"},
        concurrency=concurrency,
        batch_format="pyarrow",
        batch_size=None,
    )

    def _post(batch: pa.Table) -> pa.Table:
        batch = parse.erda_info(batch, key="log")
        batch = route.pack_tags(batch)
        batch = route.add_route_flags(batch)
        return batch

    return ds.map_batches(_post, batch_format="pyarrow", batch_size=None)


def pipeline_from_records(ds: rd.Dataset, dim: pa.Table, **kw) -> rd.Dataset:
    """records (any source) → parsed → enriched + routed (lazy)."""
    return enriched_ds(parsed_ds(ds), dim, **kw)


def full_pipeline(sf_dir: str, **kw) -> rd.Dataset:
    """records → parsed → enriched+routed (lazy)."""
    return pipeline_from_records(records_ds(sf_dir), dim_for(sf_dir), **kw)


def sink_dataset(routed: rd.Dataset, sink: str) -> rd.Dataset:
    """One sink's routed + projected rows (lazy filter fan-out branch)."""
    def _take(batch: pa.Table) -> pa.Table:
        sub = batch.filter(route.sink_mask(batch, sink))
        return route.project_logevent(sub, sink)

    return routed.map_batches(_take, batch_format="pyarrow", batch_size=None)


NULL_KEY = "\x00null"


def sink_counts_batch(batch: pa.Table) -> pa.Table:
    """Per-batch PARTIAL (sink, source, level, cnt) counts for all sinks.

    The partial-aggregation half of the only shuffle in the pipeline:
    emits at most (#sinks × #distinct keys in batch) rows per batch.
    """
    schema = pa.schema(
        [
            ("sink", pa.string()),
            ("source", pa.string()),
            ("level", pa.string()),
            ("cnt", pa.int64()),
        ]
    )
    # null keys are sentinel-encoded around the shuffle so every block
    # carries a stable string-typed schema
    level = pc.fill_null(batch["level"], NULL_KEY)
    keyed = pa.table({"source": batch["source"], "level": level})
    outs = []
    for sink in route.SINKS:
        sub = keyed.filter(route.sink_mask(batch, sink))
        if sub.num_rows == 0:
            continue
        g = sub.group_by(["source", "level"]).aggregate([([], "count_all")])
        outs.append(
            pa.table(
                {
                    "sink": pa.array([sink] * g.num_rows),
                    "source": g["source"],
                    "level": g["level"],
                    "cnt": pc.cast(g["count_all"], pa.int64()),
                },
                schema=schema,
            )
        )
    if not outs:
        return schema.empty_table()
    return pa.concat_tables(outs)


def combine_counts_batch(batch: pa.Table) -> pa.Table:
    """Merge partial count rows (sum cnt per (sink, source, level))."""
    g = batch.group_by(["sink", "source", "level"]).aggregate([("cnt", "sum")])
    return pa.table(
        {
            "sink": g["sink"],
            "source": g["source"],
            "level": g["level"],
            "cnt": g["cnt_sum"],
        }
    )


def decode_null_level(batch: pa.Table) -> pa.Table:
    lvl = batch["level"]
    lvl = lvl.combine_chunks() if isinstance(lvl, pa.ChunkedArray) else lvl
    i = batch.column_names.index("level")
    return batch.set_column(
        i,
        "level",
        pc.if_else(pc.equal(lvl, NULL_KEY), pa.scalar(None, pa.string()), lvl),
    )


def stage_metrics(ds: rd.Dataset) -> list[dict]:
    """Per-operator wall-time metrics from an executed dataset's stats.

    The north rule asks for throughput/latency metrics emitted per stage;
    this parses Ray Data's per-operator stats into compact records the
    manifest can persist per shard.
    """
    import re as _re

    out = []
    try:
        text = ds.stats()
    except Exception:
        return out
    for m in _re.finditer(
        r"Operator \d+ (?P<name>.+?): .*?(?P<tasks>\d+) tasks executed, "
        r"(?P<blocks>\d+) blocks produced in (?P<sec>[\d.]+)s",
        text,
    ):
        out.append(
            {
                "operator": m.group("name")[:80],
                "tasks": int(m.group("tasks")),
                "blocks": int(m.group("blocks")),
                "wall_sec": float(m.group("sec")),
            }
        )
    return out


def aggregate_counts_table(
    partials: rd.Dataset, *, collect_stats: bool = False
) -> pa.Table | tuple[pa.Table, list[dict]]:
    """Tree-reduce partial (sink, source, level, cnt) rows to final counts.

    Ray's generic sort-based groupby is built for row-level shuffles; the
    partials here are already key-compressed, so a two-level combine —
    local merge over runs of partial blocks (distributed), then one final
    merge of the tiny combined blocks on the driver — is both cheaper and
    skew-proof (every combine output is bounded by key cardinality, never
    by input rows). At 10^12-row scale add combine levels, never rows.
    """
    local = partials.map_batches(
        combine_counts_batch, batch_format="pyarrow", batch_size=65_536
    )
    tables = list(local.iter_batches(batch_format="pyarrow", batch_size=None))
    if not tables:
        tbl = pa.schema(
            [("sink", pa.string()), ("source", pa.string()),
             ("level", pa.string()), ("cnt", pa.int64())]
        ).empty_table()
    else:
        tbl = decode_null_level(combine_counts_batch(pa.concat_tables(tables)))
    if collect_stats:
        return tbl, stage_metrics(local)
    return tbl


def tree_aggregate_counts(partials: rd.Dataset) -> rd.Dataset:
    """Dataset-shaped wrapper over :func:`aggregate_counts_table`."""
    return rd.from_arrow(aggregate_counts_table(partials))


def sink_counts(routed: rd.Dataset) -> rd.Dataset:
    """Final per-sink aggregate over per-batch partials (the only exchange)."""
    partials = routed.map_batches(
        sink_counts_batch, batch_format="pyarrow", batch_size=None
    )
    return tree_aggregate_counts(partials)
