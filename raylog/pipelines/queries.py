"""Driver-facing query registry: one entry per operator/pipeline.

Each query is a callable ``(sf_dir) -> ray.data.Dataset`` paired with an
ANSI-SQL oracle string DuckDB can run over the same parquet tables (views
``documents`` etc. pre-registered by the driver). Column names match
between the Ray result and the SQL exactly; list-typed payload columns are
checked through scalar proxies (``n_tok``, ``tok_sum``) here and through
true list equality in the pytest suite.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import pyarrow as pa

from raylog import records as R
from raylog.stages import route

QUERIES: dict[str, Callable[[str], Any]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, sql: str | None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn

    return deco


def _P() -> str:
    return R.oracle_prefix()


# --------------------------------------------------------------------------
# Log-record derivation + parse stages
# --------------------------------------------------------------------------

@query(
    "log_records",
    _P() + """
SELECT doc_id, source, stream, raw, n_tok, tok_sum FROM recs2""",
)
def log_records(sf_dir: str):
    """S1-analog ingest: documents → log-record stream (SURVEY §2.1)."""
    from raylog.pipelines import log_pipeline as LP

    return LP.records_ds(sf_dir).drop_columns(["tokens"])


@query(
    "log_parse",
    _P() + """
SELECT doc_id, level, request_id, ts_ns, log AS content FROM recs2""",
)
def log_parse(sf_dir: str):
    """P4 CRI split + P2 erda-info regex extraction (vectorized grok)."""
    from raylog.pipelines import log_pipeline as LP
    from raylog.stages import parse

    ds = LP.parsed_ds(LP.records_ds(sf_dir))
    ds = ds.map_batches(
        lambda b: parse.erda_info(b, key="log"), batch_format="pyarrow"
    )
    return ds.map_batches(
        lambda b: pa.table(
            {
                "doc_id": b["doc_id"],
                "level": b["level"],
                "request_id": b["request_id"],
                "ts_ns": b["ts_ns"],
                "content": b["log"],
            }
        ),
        batch_format="pyarrow",
    )


@query(
    "log_enrich",
    _P() + """
SELECT doc_id, source, pod_name, pod_namespace, container_id, cluster_name,
       application_name, msp_env_id, org_name, workspace,
       monitor_log_collector, terminus_define_tag
FROM enriched""",
)
def log_enrich(sf_dir: str):
    """E1/E2 broadcast-lookup enrichment (left join, null on miss)."""
    from raylog.pipelines import log_pipeline as LP

    routed = LP.full_pipeline(sf_dir)
    return routed.select_columns(
        [
            "doc_id", "source", "pod_name", "pod_namespace", "container_id",
            "cluster_name", "application_name", "msp_env_id", "org_name",
            "workspace", "monitor_log_collector", "terminus_define_tag",
        ]
    )


@query(
    "log_route_flags",
    _P() + """
SELECT doc_id, in_container, in_job, in_export FROM routed""",
)
def log_route_flags(sf_dir: str):
    """T1/T2 rewrite_tag truth table (SURVEY §2.6)."""
    from raylog.pipelines import log_pipeline as LP

    return LP.full_pipeline(sf_dir).select_columns(
        ["doc_id", "in_container", "in_job", "in_export"]
    )


@query(
    "log_tags",
    _P() + f"""
SELECT doc_id, {route.tags_str_sql()} AS tags_str FROM enriched""",
)
def log_tags(sf_dir: str):
    """N7-N10 reshape: canonical packed tags map (as deterministic string)."""
    from raylog.pipelines import log_pipeline as LP

    return LP.full_pipeline(sf_dir).select_columns(["doc_id", "tags_str"])


# --------------------------------------------------------------------------
# Routing fan-out sinks + flagship aggregate
# --------------------------------------------------------------------------

_SINK_PROJ = """
SELECT doc_id, source, {id_expr} AS id, '{source_out}' AS source_out,
       coalesce(stream, 'stdout') AS stream, level, request_id, ts_ns,
       log AS content, n_tok, tok_sum
FROM routed WHERE {flag}"""


def _sink_query(sink: str):
    from raylog.pipelines import log_pipeline as LP

    def fn(sf_dir: str, sink=sink):
        ds = LP.sink_dataset(LP.full_pipeline(sf_dir), sink)
        return ds.drop_columns(["tokens", "tags_str"])

    return fn


for _sink, _id_expr, _src_out, _flag in (
    ("container", "coalesce(container_id, '')", "container", "in_container"),
    ("job", "terminus_define_tag", "job", "in_job"),
    ("export", "coalesce(container_id, '')", "container", "in_export"),
):
    QUERIES[f"log_sink_{_sink}"] = _sink_query(_sink)
    ORACLES[f"log_sink_{_sink}"] = _P() + _SINK_PROJ.format(
        id_expr=_id_expr, source_out=_src_out, flag=_flag
    )


@query(
    "log_throttle_window",
    """
WITH w AS (
  SELECT event_id, CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) AS "window" FROM events
), c AS (
  SELECT "window", COUNT(*) AS cnt FROM w GROUP BY 1
)
SELECT "window", cnt,
       CASE WHEN cnt > 15 THEN 15 ELSE cnt END AS kept,
       CASE WHEN cnt > 15 THEN cnt - 15 ELSE 0 END AS dropped
FROM c""",
)
def log_throttle_window(sf_dir: str):
    """R1 throttle accounting: per-window kept/dropped at rate=15/hour.

    (Reference: patched sliding-window throttle,
    filter_throttle_patch/throttle.c:98-107; batch analog documented in
    raylog/stages/throttle.py.)
    """
    import pyarrow.compute as pc
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate
    from raylog.stages.throttle import add_window_column

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "ts"])
    ds = add_window_column(ds, "ts", 3600)
    tbl = grouped_aggregate(ds, ["window"], [("*", "count", "cnt")])
    rate = pa.scalar(15, pa.int64())
    cnt = pc.cast(tbl["cnt"].combine_chunks() if isinstance(tbl["cnt"], pa.ChunkedArray) else tbl["cnt"], pa.int64())
    kept = pc.min_element_wise(cnt, rate)
    dropped = pc.subtract(cnt, kept)
    return pa.table({"window": tbl["window"], "cnt": cnt, "kept": kept, "dropped": dropped})


@query(
    "log_throttle_flags",
    """
WITH w AS (
  SELECT event_id, CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) AS "window" FROM events
)
SELECT event_id, "window",
       ROW_NUMBER() OVER (PARTITION BY "window" ORDER BY event_id) > 15 AS over_rate
FROM w""",
)
def log_throttle_flags(sf_dir: str):
    """R1 per-record over-rate flags (ordered within window, map_groups)."""
    import ray.data as rd

    from raylog.stages.throttle import over_rate_flags

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "ts"])
    out = over_rate_flags(ds, ts_col="ts", order_col="event_id", rate=15,
                          interval_sec=3600)
    return out.select_columns(["event_id", "window", "over_rate"])


@query(
    "log_multiline_join",
    """
WITH m AS (
  SELECT doc_id, source, (doc_id % 10) IN (8, 9) AS cont FROM documents
), g AS (
  SELECT *, MAX(CASE WHEN NOT cont THEN doc_id END)
              OVER (PARTITION BY source ORDER BY doc_id
                    ROWS UNBOUNDED PRECEDING) AS head_id
  FROM m
)
SELECT head_id, source, COUNT(*) AS n_lines
FROM g WHERE head_id IS NOT NULL GROUP BY 1, 2""",
)
def log_multiline_join(sf_dir: str):
    """P5 multiline join: continuation rows (doc_id%10 ∈ {8,9} — the
    stack-trace-line analog) collapse onto the preceding head row per
    source, in doc order (groupby(source).map_groups)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from raylog.stages.multiline import multiline_join

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "source"])

    def mark(b: pa.Table) -> pa.Table:
        mod = pc.subtract(
            b["doc_id"],
            pc.multiply(pc.divide(b["doc_id"], pa.scalar(10, pa.int64())),
                        pa.scalar(10, pa.int64())),
        )
        cont = pc.or_(pc.equal(mod, 8), pc.equal(mod, 9))
        return b.append_column("cont", cont)

    ds = ds.map_batches(mark, batch_format="pyarrow", batch_size=None)
    return multiline_join(ds, is_continuation="cont", order_col="doc_id")


@query(
    "log_export_by_collector",
    R.oracle_prefix() + """
SELECT monitor_log_collector, COUNT(*) AS cnt
FROM routed WHERE in_export GROUP BY 1""",
)
def log_export_by_collector(sf_dir: str):
    """G6 analog: export branch partitioned by collector-URL label value
    (the reference routes each chunk to the URL in its first record's
    label, out_erda/sender.go:66-82 — per-key grouping, strictly more
    correct)."""
    import pyarrow.compute as pc

    from raylog.functions.agg import grouped_aggregate
    from raylog.pipelines import log_pipeline as LP

    routed = LP.full_pipeline(sf_dir)

    def exp_labels(b: pa.Table) -> pa.Table:
        col = b["monitor_log_collector"]
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        return b.filter(pc.is_valid(arr)).select(["monitor_log_collector"])

    exp = routed.map_batches(exp_labels, batch_format="pyarrow", batch_size=None)
    return grouped_aggregate(exp, ["monitor_log_collector"], [("*", "count", "cnt")])


# --------------------------------------------------------------------------
# Relational breadth (generic engine ops over the TPC-H-ish tables)
# --------------------------------------------------------------------------

@query(
    "agg_pricing_summary",
    """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
       CAST(ROUND(SUM(l_extendedprice) * 100, 0) AS BIGINT) AS sum_base_price_cents,
       CAST(ROUND(SUM(l_extendedprice * (1 - l_discount)) * 100, 0) AS BIGINT) AS sum_disc_price_cents,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01'
GROUP BY 1, 2""",
)
def agg_pricing_summary(sf_dir: str):
    """TPC-H Q1-style pricing summary: vectorized filter + computed column
    + partial/tree grouped aggregate (money as integer cents so the value
    hash is float-robust)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def prep(b: pa.Table) -> pa.Table:
        mask = pc.less_equal(b["l_shipdate"], pa.scalar(__import__("datetime").datetime(1998, 9, 1)))
        b = b.filter(mask)
        disc = pc.multiply(b["l_extendedprice"], pc.subtract(pa.scalar(1.0), b["l_discount"]))
        return b.append_column("disc_price", disc)

    ds = ds.map_batches(prep, batch_format="pyarrow", batch_size=None)
    tbl = grouped_aggregate(
        ds,
        ["l_returnflag", "l_linestatus"],
        [
            ("l_quantity", "sum", "sum_qty"),
            ("l_extendedprice", "sum", "sum_base_price"),
            ("disc_price", "sum", "sum_disc_price"),
            ("*", "count", "count_order"),
        ],
    )
    return pa.table(
        {
            "l_returnflag": tbl["l_returnflag"],
            "l_linestatus": tbl["l_linestatus"],
            "sum_qty": pc.cast(pc.round(tbl["sum_qty"]), pa.int64()),
            "sum_base_price_cents": pc.cast(pc.round(pc.multiply(tbl["sum_base_price"], pa.scalar(100.0))), pa.int64()),
            "sum_disc_price_cents": pc.cast(pc.round(pc.multiply(tbl["sum_disc_price"], pa.scalar(100.0))), pa.int64()),
            "count_order": tbl["count_order"],
        }
    )


@query(
    "top_orders",
    """
SELECT o_orderkey, CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS total_cents
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
)
def top_orders(sf_dir: str):
    """Top-k: distributed sort (desc, deterministic tiebreak) + limit."""
    import pyarrow.compute as pc
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"])
    top = ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(10)
    tbl = pa.concat_tables(list(top.iter_batches(batch_format="pyarrow", batch_size=None)))
    return pa.table(
        {
            "o_orderkey": tbl["o_orderkey"],
            "total_cents": pc.cast(pc.round(pc.multiply(tbl["o_totalprice"], pa.scalar(100.0))), pa.int64()),
        }
    )


@query(
    "orders_by_region",
    """
SELECT r.r_name, COUNT(*) AS n_orders,
       CAST(ROUND(SUM(o.o_totalprice) * 100, 0) AS BIGINT) AS total_cents
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY 1""",
)
def orders_by_region(sf_dir: str):
    """Broadcast hash join: the small dim chain (customer⋈nation⋈region)
    is built driver-side, broadcast once via ray.put, joined map-side per
    batch (no shuffle) — then partial/tree aggregate by region."""
    import pandas as pd
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate
    from raylog.stages.enrich import BroadcastEnricher

    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]).to_pandas()
    nat = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    reg = pq.read_table(f"{sf_dir}/region.parquet").to_pandas()
    dim = cust.merge(nat, left_on="c_nationkey", right_on="n_nationkey").merge(
        reg, left_on="n_regionkey", right_on="r_regionkey"
    )[["c_custkey", "r_name"]]
    dim_tbl = pa.Table.from_pandas(dim.rename(columns={"c_custkey": "o_custkey"}), preserve_index=False)

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"])
    import ray

    dim_ref = ray.put(dim_tbl) if ray.is_initialized() else dim_tbl
    ds = ds.map_batches(
        BroadcastEnricher,
        fn_constructor_kwargs={"dim": dim_ref, "key": "o_custkey"},
        concurrency=2,
        batch_format="pyarrow",
        batch_size=None,
    )
    tbl = grouped_aggregate(
        ds, ["r_name"],
        [("*", "count", "n_orders"), ("o_totalprice", "sum", "total")],
    )
    return pa.table(
        {
            "r_name": tbl["r_name"],
            "n_orders": tbl["n_orders"],
            "total_cents": pc.cast(pc.round(pc.multiply(tbl["total"], pa.scalar(100.0))), pa.int64()),
        }
    )


@query(
    "events_hourly",
    """
SELECT event_type, CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) AS "window",
       COUNT(*) AS cnt,
       CAST(ROUND(SUM(value) * 100, 0) AS BIGINT) AS value_cents
FROM events GROUP BY 1, 2""",
)
def events_hourly(sf_dir: str):
    """Tumbling event-time window aggregate (1h) per event type."""
    import pyarrow.compute as pc
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate
    from raylog.stages.throttle import add_window_column

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"])
    ds = add_window_column(ds, "ts", 3600)
    tbl = grouped_aggregate(
        ds, ["event_type", "window"],
        [("*", "count", "cnt"), ("value", "sum", "value_sum")],
    )
    return pa.table(
        {
            "event_type": tbl["event_type"],
            "window": tbl["window"],
            "cnt": tbl["cnt"],
            "value_cents": pc.cast(pc.round(pc.multiply(tbl["value_sum"], pa.scalar(100.0))), pa.int64()),
        }
    )


@query("distinct_sources", "SELECT DISTINCT source FROM documents")
def distinct_sources(sf_dir: str):
    """Distinct values via key-only partial/tree aggregate (no row shuffle)."""
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["source"])
    return grouped_aggregate(ds, ["source"], [])


@query(
    "log_sink_counts",
    _P() + """
, u AS (
  SELECT 'container' AS sink, source, level FROM routed WHERE in_container
  UNION ALL SELECT 'job', source, level FROM routed WHERE in_job
  UNION ALL SELECT 'export', source, level FROM routed WHERE in_export)
SELECT sink, source, level, COUNT(*) AS cnt FROM u GROUP BY 1, 2, 3""",
)
def log_sink_counts(sf_dir: str):
    """Flagship per-sink aggregate: (sink, source, level) counts via
    per-batch partial aggregation + tiny final groupby (the only shuffle)."""
    from raylog.pipelines import log_pipeline as LP

    return LP.sink_counts(LP.full_pipeline(sf_dir))
