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
