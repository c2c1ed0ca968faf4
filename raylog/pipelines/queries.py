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


from raylog.pipelines.eci_pipeline import (  # noqa: E402
    ECI_CONST_TAGS as _ECI_TAGS,
)


def _src_tag(sf_dir: str, table: str = "documents") -> str:
    """Cache tag for fixtures derived from ``sf_dir``'s parquet: the
    full path plus the source file's (mtime_ns, size) fingerprint, so a
    regenerated fixture at the same path — or two sf dirs sharing a leaf
    name — never serves a stale derived file."""
    import os

    p = f"{sf_dir}/{table}.parquet"
    st = os.stat(p)
    base = sf_dir.strip("/").replace("/", "_")
    return f"{base}.{st.st_mtime_ns:x}_{st.st_size:x}"


def _tmp_name(path: str) -> str:
    """Per-process temp name so concurrent writers never interleave
    before the atomic ``os.replace``."""
    import os

    return f"{path}.tmp{os.getpid()}"


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
    import pyarrow.compute as pc

    from raylog.pipelines import log_pipeline as LP

    def widen(b: pa.Table) -> pa.Table:
        i = b.column_names.index("n_tok")
        return b.set_column(i, "n_tok", pc.cast(b["n_tok"], pa.int64()))

    return LP.records_ds(sf_dir).drop_columns(["tokens"]).map_batches(
        widen, batch_format="pyarrow", batch_size=None
    )


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
    "route_tokens_equality",
    _P() + """
, chk AS (
  SELECT doc_id,
         CAST(COALESCE(SUM(i * tokens[CAST(i AS INT)]), 0) AS BIGINT)
           AS tok_chk
  FROM recs2, LATERAL (
    SELECT unnest(generate_series(1, len(tokens))) AS i
  ) g
  GROUP BY doc_id
)
SELECT 'container' AS sink, r.doc_id, c.tok_chk, r.n_tok
FROM routed r JOIN chk c USING (doc_id) WHERE r.in_container
UNION ALL
SELECT 'job', r.doc_id, c.tok_chk, r.n_tok
FROM routed r JOIN chk c USING (doc_id) WHERE r.in_job
UNION ALL
SELECT 'export', r.doc_id, c.tok_chk, r.n_tok
FROM routed r JOIN chk c USING (doc_id) WHERE r.in_export""",
)
def route_tokens_equality(sf_dir: str):
    """North-rule invariant, checked per ROW per SINK: the token array
    of every routed row is byte-identical through parse → enrich →
    route, witnessed by a position-weighted checksum Σ (i+1-start)·t_i
    (order- and value-sensitive — any reorder, drop or mutation of one
    token changes it) plus n_tok. One output row per (sink, routed
    doc), exactly the fan-out the sinks receive."""
    import numpy as np

    from raylog.pipelines import log_pipeline as LP

    routed = LP.full_pipeline(sf_dir)

    def fan_out(b: pa.Table) -> pa.Table:
        toks = b["tokens"]
        toks = (toks.combine_chunks() if isinstance(toks, pa.ChunkedArray)
                else toks)
        off = np.asarray(toks.offsets, dtype=np.int64)
        # rebase: a sliced ListArray (Ray block splits) has offsets that
        # don't start at 0 and a values buffer wider than this slice
        vals = np.asarray(toks.values, dtype=np.int64)[off[0]: off[-1]]
        off = off - off[0]
        pos = (np.arange(len(vals), dtype=np.int64)
               - np.repeat(off[:-1], np.diff(off)) + 1)
        csum = np.concatenate([[0], np.cumsum(vals * pos)])
        chk = csum[off[1:]] - csum[off[:-1]]
        doc = np.asarray(b["doc_id"].combine_chunks(), dtype=np.int64)
        ntok = np.asarray(b["n_tok"].combine_chunks(), dtype=np.int64)
        out_sink, out_doc, out_chk, out_n = [], [], [], []
        for sink, flag in (("container", "in_container"), ("job", "in_job"),
                           ("export", "in_export")):
            m = np.asarray(b[flag].combine_chunks(), dtype=bool)
            out_sink.append(np.full(int(m.sum()), sink, dtype=object))
            out_doc.append(doc[m])
            out_chk.append(chk[m])
            out_n.append(ntok[m])
        return pa.table({
            "sink": pa.array(np.concatenate(out_sink), pa.string()),
            "doc_id": pa.array(np.concatenate(out_doc)),
            "tok_chk": pa.array(np.concatenate(out_chk)),
            "n_tok": pa.array(np.concatenate(out_n)),
        })

    return routed.map_batches(fan_out, batch_format="pyarrow",
                              batch_size=None)


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
        import pyarrow.compute as pc

        ds = LP.sink_dataset(LP.full_pipeline(sf_dir), sink)
        ds = ds.drop_columns(["tokens", "tags_str"])

        def widen(b: pa.Table) -> pa.Table:
            i = b.column_names.index("n_tok")
            return b.set_column(i, "n_tok", pc.cast(b["n_tok"], pa.int64()))

        return ds.map_batches(widen, batch_format="pyarrow", batch_size=None)

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
    """R1 per-record over-rate flags (distributed bucketed ranks)."""
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
-- headless prefix (continuations before any head) flushes as ONE
-- record rooted at the source's first row, like the reference engine
, g2 AS (
  SELECT source,
         COALESCE(head_id, MIN(doc_id) OVER (PARTITION BY source))
           AS head_id
  FROM g
)
SELECT head_id, source, COUNT(*) AS n_lines FROM g2 GROUP BY 1, 2""",
)
def log_multiline_join(sf_dir: str):
    """P5 multiline join: continuation rows (doc_id%10 ∈ {8,9} — the
    stack-trace-line analog) collapse onto the preceding head row per
    source, in doc order (bucketed record-id assignment — no
    hot-source single task). Leading headless continuations flush as
    one record per source (reference buffer-until-firstline behavior)."""
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


def _multiline_cri_dir(sf_dir: str) -> str:
    """One CRI log file per source with P/F-split heads and stack-trace
    continuation lines, derived deterministically from documents (cached).

    Per doc: head content = '2024-01-02 03:04:05 ' + text (matches the
    cri_firstline date detector); docs with doc_id%5==1 have the head
    split into a P + F pair (runtime 16KB-split analog); docs with
    doc_id%3==0 get two java stack-frame continuation lines. Line
    timestamps increase as doc_id*16 + line_no nanoseconds."""
    import os

    import pyarrow.parquet as pq

    root = f"/tmp/raylog_logfiles/{_src_tag(sf_dir)}.mcri"
    done = os.path.join(root, "_DONE")
    if os.path.exists(done):
        return root
    os.makedirs(root, exist_ok=True)
    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "source"])
    by_src: dict[str, list[str]] = {}
    for r in docs.to_pylist():
        d, text, src = r["doc_id"], r["text"], r["source"]
        lines = by_src.setdefault(src, [])

        def ts(j, d=d):
            return f"2024-01-02T03:04:05.{d * 16 + j:09d}Z"

        content = f"2024-01-02 03:04:05 {text}"
        if d % 5 == 1:  # runtime split: P part + F terminator
            lines.append(f"{ts(0)} stdout P {content[:20]}")
            lines.append(f"{ts(1)} stdout F {content[20:]}")
            j = 2
        else:
            lines.append(f"{ts(0)} stdout F {content}")
            j = 1
        if d % 3 == 0:  # java stack-trace continuations
            lines.append(f"{ts(j)} stdout F   at com.example.Service.handle(Doc{d}.java:42)")
            lines.append(f"{ts(j + 1)} stdout F   at java.base/java.lang.Thread.run(Thread.java:833)")
    for src, lines in by_src.items():
        with open(os.path.join(root, f"{src}.log"), "w") as f:
            f.write("\n".join(lines) + "\n")
    open(done, "w").close()
    return root


@query(
    "log_multiline_cri",
    f"""
SELECT CAST({R.TS_BASE_NS} AS BIGINT) + doc_id * 16 AS head_id, source,
       CAST(CASE WHEN doc_id % 3 = 0 THEN 3 ELSE 1 END AS BIGINT) AS n_lines,
       '2024-01-02 03:04:05 ' || text ||
         CASE WHEN doc_id % 3 = 0
              THEN chr(10) || '  at com.example.Service.handle(Doc' || doc_id
                   || '.java:42)'
                   || chr(10) || '  at java.base/java.lang.Thread.run(Thread.java:833)'
              ELSE '' END AS content
FROM documents""",
)
def log_multiline_cri(sf_dir: str):
    """P3/P4/P5 on the real wire format end to end: CRI log FILES (one
    per source) → cri parse (P/F logtag extracted) → partial-line rejoin
    on the logtag (conf/ds/parsers.conf cri) → firstline date-regex
    continuation detection (parsers.conf cri_firstline) → bucketed
    multiline join. The oracle independently derives the expected joined
    records from documents."""
    from raylog.sources.logfiles import read_cri_logs_with_source
    from raylog.stages import parse
    from raylog.stages.multiline import multiline_join, rejoin_partials

    import glob as _glob

    root = _multiline_cri_dir(sf_dir)
    files = sorted(_glob.glob(f"{root}/*.log"))
    ds = read_cri_logs_with_source(files)
    # stage 1: CRI P/F rejoin (tail-marked records, concat without sep)
    lines = rejoin_partials(ds, logtag_col="logtag", order_col="ts_ns",
                            content_col="log")
    # stage 2: firstline multiline join (head-marked, newline join)
    lines = lines.map_batches(
        lambda b: parse.firstline_flags(b, key="content"),
        batch_format="pyarrow", batch_size=None,
    )
    return multiline_join(lines, is_continuation="is_continuation",
                          order_col="head_id", content_col="content")


def _multiline_docker_dir(sf_dir: str) -> str:
    """Docker JSON log files (one per source) with 16KB-split lines and
    stack continuations, derived deterministically from documents.

    Complete docker log values end with ``\\n``; docs with doc_id%4==2
    have their line split into two chunks (the runtime's 16KB split —
    first chunk has NO trailing newline); docs with doc_id%3==0 add two
    stack-frame records."""
    import json as _json
    import os

    import pyarrow.parquet as pq

    root = f"/tmp/raylog_logfiles/{_src_tag(sf_dir)}.mdocker"
    done = os.path.join(root, "_DONE")
    if os.path.exists(done):
        return root
    os.makedirs(root, exist_ok=True)
    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "source"])
    by_src: dict[str, list[str]] = {}
    for r in docs.to_pylist():
        d, text, src = r["doc_id"], r["text"], r["source"]
        lines = by_src.setdefault(src, [])

        def rec(j, log, d=d):
            t = f"2024-01-02T03:04:05.{d * 16 + j:09d}Z"
            return _json.dumps({"log": log, "stream": "stdout", "time": t})

        content = f"2024-01-02 03:04:05 {text}\n"
        if d % 4 == 2:  # 16KB-split analog: first chunk has no newline
            lines.append(rec(0, content[:30]))
            lines.append(rec(1, content[30:]))
            j = 2
        else:
            lines.append(rec(0, content))
            j = 1
        if d % 3 == 0:
            lines.append(rec(j, f"  at com.example.Service.handle(Doc{d}.java:42)\n"))
            lines.append(rec(j + 1, "  at java.base/java.lang.Thread.run(Thread.java:833)\n"))
    for src, lines in by_src.items():
        with open(os.path.join(root, f"{src}.log"), "w") as f:
            f.write("\n".join(lines) + "\n")
    open(done, "w").close()
    return root


@query(
    "log_multiline_docker",
    f"""
SELECT CAST({R.TS_BASE_NS} AS BIGINT) + doc_id * 16 AS head_id, source,
       CAST(CASE WHEN doc_id % 3 = 0 THEN 3 ELSE 1 END AS BIGINT) AS n_lines,
       '2024-01-02 03:04:05 ' || text ||
         CASE WHEN doc_id % 3 = 0
              THEN chr(10) || '  at com.example.Service.handle(Doc' || doc_id
                   || '.java:42)'
                   || chr(10) || '  at java.base/java.lang.Thread.run(Thread.java:833)'
              ELSE '' END AS content
FROM documents""",
)
def log_multiline_docker(sf_dir: str):
    """P3 full docker path: JSON-line log FILES → parse → 16KB-split
    rejoin (record boundary = trailing newline in the log value — the
    docker_firstline/Docker_Mode signal, conf/ds/parsers.conf:17-23) →
    firstline date-regex multiline join. Oracle re-derives the joined
    records from documents."""
    import glob as _glob

    import pyarrow.compute as pc

    from raylog.sources.logfiles import read_docker_json_logs_with_source
    from raylog.stages import parse
    from raylog.stages.multiline import multiline_join, rejoin_partials

    root = _multiline_docker_dir(sf_dir)
    files = sorted(_glob.glob(f"{root}/*.log"))
    ds = read_docker_json_logs_with_source(files)

    def tag_complete(b: pa.Table) -> pa.Table:
        log = b["log"].combine_chunks() if isinstance(b["log"], pa.ChunkedArray) else b["log"]
        complete = pc.ends_with(pc.fill_null(log, ""), pattern="\n")
        return b.append_column(
            "logtag", pc.if_else(complete, pa.scalar("F"), pa.scalar("P"))
        )

    ds = ds.map_batches(tag_complete, batch_format="pyarrow", batch_size=None)
    lines = rejoin_partials(ds, logtag_col="logtag", order_col="ts_ns",
                            content_col="log")

    def strip_nl(b: pa.Table) -> pa.Table:
        c = b["content"].combine_chunks() if isinstance(b["content"], pa.ChunkedArray) else b["content"]
        i = b.column_names.index("content")
        return b.set_column(i, "content", pc.utf8_rtrim(c, characters="\n"))

    lines = lines.map_batches(strip_nl, batch_format="pyarrow", batch_size=None)
    lines = lines.map_batches(
        lambda b: parse.firstline_flags(b, key="content"),
        batch_format="pyarrow", batch_size=None,
    )
    return multiline_join(lines, is_continuation="is_continuation",
                          order_col="head_id", content_col="content")


@query(
    "log_throttle_sliding",
    """
WITH w AS (
  SELECT event_id, CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) AS win FROM events
), c AS (
  SELECT win, COUNT(*) AS cnt FROM w GROUP BY 1
), p AS (
  SELECT a.win, COALESCE(SUM(b.cnt), 0) AS prior
  FROM c a LEFT JOIN c b ON b.win BETWEEN a.win - 4 AND a.win - 1
  GROUP BY 1
), r AS (
  SELECT event_id, win,
         ROW_NUMBER() OVER (PARTITION BY win ORDER BY event_id) AS rnk
  FROM w
)
SELECT r.event_id, r.win AS "window", (p.prior + r.rnk) > 40 AS over_rate
FROM r JOIN p ON r.win = p.win""",
)
def log_throttle_sliding(sf_dir: str):
    """R1 faithful window shape: 5 sliding sub-intervals
    (filter_throttle_patch/throttle.c:69-107) — a record is over-rate
    when the previous 4 sub-windows' counts plus its own in-window rank
    exceed the rate."""
    import ray.data as rd

    from raylog.stages.throttle import sliding_over_rate_flags

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "ts"])
    out = sliding_over_rate_flags(ds, ts_col="ts", order_col="event_id",
                                  rate=40, interval_sec=3600, subwindows=5)
    return out.select_columns(["event_id", "window", "over_rate"])


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
        # non-empty (`.+`), mirroring route.sink_mask's export predicate
        return b.filter(route._nonempty(b["monitor_log_collector"])).select(
            ["monitor_log_collector"]
        )

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
    """Top-k via per-batch partial pruning + tiny merge (no distributed
    sort: each block forwards only its own best 10 rows)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from raylog.functions.topk import topk

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"])
    tbl = topk(ds, sort_cols=["o_totalprice", "o_orderkey"],
               descending=[True, False], k=10)
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


@query(
    "approx_distinct_docs",
    """
WITH h AS (SELECT DISTINCT md5(text) AS m FROM documents),
b AS (SELECT m FROM h ORDER BY m LIMIT 256),
s AS (SELECT COUNT(*) AS n, MAX(m) AS mk FROM b)
SELECT CASE WHEN n < 256 THEN CAST(n AS BIGINT)
       ELSE CAST((CAST(255 AS HUGEINT) * 1152921504606846976)
                 // CAST('0x' || substr(mk, 1, 15) AS BIGINT) AS BIGINT)
       END AS est_distinct
FROM s""",
)
def approx_distinct_docs(sf_dir: str):
    """Approximate distinct-document count via a bottom-k (KMV, k=256)
    estimator: k smallest md5 digests, est = (k−1)·2^60 // h_(k) —
    integer arithmetic a DuckDB oracle reproduces exactly (the HLL
    register max-merge in ``sketch.approx_distinct`` stays the scale
    path, pytest-guarded; its estimate has no SQL restatement).
    Reference analog: the fluent-bit metrics counters
    (conf/ds/fluent-bit.conf:8-10)."""
    import ray.data as rd

    from raylog.functions.sketch import distinct_kmv

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    return distinct_kmv(ds, "text", k=256)


@query(
    "events_hopping",
    """
WITH w AS (
  SELECT event_type, CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) AS sub FROM events
), hops AS (
  SELECT event_type, sub + i AS "window"
  FROM w, UNNEST(generate_series(0, 4)) AS t(i)
)
SELECT event_type, "window", COUNT(*) AS cnt
FROM hops GROUP BY 1, 2""",
)
def events_hopping(sf_dir: str):
    """Hopping (overlapping) window aggregate: 5-hour windows sliding by
    1 hour — each event expands to its 5 covering windows (vectorized
    np.repeat, a bounded ×5 fan-out) and the partial/tree aggregate does
    the rest; no window ever becomes a task boundary."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate
    from raylog.stages.throttle import add_window_column

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "ts"])
    ds = add_window_column(ds, "ts", 3600)

    def expand(b: pa.Table) -> pa.Table:
        sub = np.asarray(b["window"].combine_chunks()
                         if isinstance(b["window"], pa.ChunkedArray)
                         else b["window"], dtype=np.int64)
        et = b["event_type"]
        et = et.combine_chunks() if isinstance(et, pa.ChunkedArray) else et
        n = len(sub)
        idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), 5))
        import pyarrow.compute as pc

        return pa.table({
            "event_type": pc.take(et, idx),
            "window": pa.array((sub[:, None]
                                + np.arange(5, dtype=np.int64)[None, :]
                                ).reshape(-1)),
        })

    ds = ds.map_batches(expand, batch_format="pyarrow", batch_size=None)
    return grouped_aggregate(ds, ["event_type", "window"],
                             [("*", "count", "cnt")])


@query("distinct_sources", "SELECT DISTINCT source FROM documents")
def distinct_sources(sf_dir: str):
    """Distinct values: key-only per-batch partials, hash-partitioned
    distributed combine (distinct container ids at 100 TB are themselves a
    large set — the result stays a Dataset, never a driver table)."""
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate_ds

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["source"])
    return grouped_aggregate_ds(ds, ["source"], [], num_partitions=8)


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


# --------------------------------------------------------------------------
# Training-data ops: text analysis
# --------------------------------------------------------------------------

@query(
    "text_token_counts",
    r"""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
       CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS BIGINT) AS n_bpe_tokens
FROM documents""",
)
def text_token_counts(sf_dir: str):
    """Token counting: whitespace + BPE-ish regex, vectorized Arrow."""
    import ray.data as rd

    from raylog.functions.text import token_counts

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    ds = ds.map_batches(token_counts, batch_format="pyarrow", batch_size=None)
    return ds.select_columns(["doc_id", "n_ws_tokens", "n_bpe_tokens"])


@query(
    "text_quality",
    """
WITH q AS (
  SELECT doc_id,
         CAST(length(text) AS BIGINT) AS n_chars_calc,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
         CAST(len(list_filter(string_split(text, ' '), w -> w IN ('the', 'a'))) AS BIGINT) AS stop_hits
  FROM documents
)
SELECT doc_id, n_chars_calc, n_words, stop_hits,
       CAST(FLOOR(1000 * (0.5 * LEAST(n_words / 40.0, 1.0)
                          + 0.5 * (1.0 - stop_hits * 1.0 / n_words))) AS BIGINT)
         AS score_milli
FROM q""",
)
def text_quality(sf_dir: str):
    """Quality scoring: length + stopword-ratio components, 0-1000 score."""
    import ray.data as rd

    from raylog.functions.text import quality_scores

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    ds = ds.map_batches(quality_scores, batch_format="pyarrow", batch_size=None)
    return ds.select_columns(
        ["doc_id", "n_chars_calc", "n_words", "stop_hits", "score_milli"]
    )


@query(
    "text_langid",
    """
WITH h AS (
  SELECT doc_id,
    CAST(len(list_filter(string_split(text,' '), w -> w IN ('der','die','das','und'))) AS BIGINT) AS h_de,
    CAST(len(list_filter(string_split(text,' '), w -> w IN ('the','a','of','and'))) AS BIGINT) AS h_en,
    CAST(len(list_filter(string_split(text,' '), w -> w IN ('el','la','de','y'))) AS BIGINT) AS h_es,
    CAST(len(list_filter(string_split(text,' '), w -> w IN ('le','la','de','et'))) AS BIGINT) AS h_fr
  FROM documents
), g AS (
  SELECT *, GREATEST(h_de, h_en, h_es, h_fr) AS mx,
         (CASE WHEN h_de = GREATEST(h_de,h_en,h_es,h_fr) THEN 1 ELSE 0 END
        + CASE WHEN h_en = GREATEST(h_de,h_en,h_es,h_fr) THEN 1 ELSE 0 END
        + CASE WHEN h_es = GREATEST(h_de,h_en,h_es,h_fr) THEN 1 ELSE 0 END
        + CASE WHEN h_fr = GREATEST(h_de,h_en,h_es,h_fr) THEN 1 ELSE 0 END) AS ties
  FROM h
)
SELECT doc_id,
       CASE WHEN mx = 0 OR ties > 1 THEN 'und'
            WHEN h_de = mx THEN 'de'
            WHEN h_en = mx THEN 'en'
            WHEN h_es = mx THEN 'es'
            ELSE 'fr' END AS lang_pred
FROM g""",
)
def text_langid(sf_dir: str):
    """Language ID: stopword-marker argmax heuristic (tie/zero → 'und')."""
    import ray.data as rd

    from raylog.functions.text import lang_id

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    ds = ds.map_batches(lang_id, batch_format="pyarrow", batch_size=None)
    return ds.select_columns(["doc_id", "lang_pred"])


@query(
    "langid_confusion",
    """
WITH h AS (
  SELECT doc_id, lang,
    CAST(len(list_filter(string_split(text,' '), w -> w IN ('der','die','das','und'))) AS BIGINT) AS h_de,
    CAST(len(list_filter(string_split(text,' '), w -> w IN ('the','a','of','and'))) AS BIGINT) AS h_en,
    CAST(len(list_filter(string_split(text,' '), w -> w IN ('el','la','de','y'))) AS BIGINT) AS h_es,
    CAST(len(list_filter(string_split(text,' '), w -> w IN ('le','la','de','et'))) AS BIGINT) AS h_fr
  FROM documents
), g AS (
  SELECT *, GREATEST(h_de, h_en, h_es, h_fr) AS mx,
         (CASE WHEN h_de = GREATEST(h_de,h_en,h_es,h_fr) THEN 1 ELSE 0 END
        + CASE WHEN h_en = GREATEST(h_de,h_en,h_es,h_fr) THEN 1 ELSE 0 END
        + CASE WHEN h_es = GREATEST(h_de,h_en,h_es,h_fr) THEN 1 ELSE 0 END
        + CASE WHEN h_fr = GREATEST(h_de,h_en,h_es,h_fr) THEN 1 ELSE 0 END) AS ties
  FROM h
)
SELECT lang,
       CASE WHEN mx = 0 OR ties > 1 THEN 'und'
            WHEN h_de = mx THEN 'de'
            WHEN h_en = mx THEN 'en'
            WHEN h_es = mx THEN 'es'
            ELSE 'fr' END AS lang_pred,
       COUNT(*) AS n
FROM g GROUP BY 1, 2""",
)
def langid_confusion(sf_dir: str):
    """Language-ID quality audit: confusion matrix of the declared
    ``lang`` label vs the heuristic prediction — the "how much of each
    declared language bucket is actually mislabeled" check run before
    trusting either column for mixture design. Prediction is the same
    vectorized kernel as ``text_langid``; the matrix is a
    langs²-bounded partial+tree aggregate (no shuffle of rows)."""
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate
    from raylog.functions.text import lang_id

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "lang"])
    pred = ds.map_batches(lang_id, batch_format="pyarrow", batch_size=None)
    return grouped_aggregate(pred, ["lang", "lang_pred"],
                             [("*", "count", "n")])


@query(
    "corpus_profile",
    """
SELECT source, COUNT(*) AS n_docs,
       COUNT(DISTINCT lang) AS n_langs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(MIN(n_chars) AS BIGINT) AS min_chars,
       CAST(MAX(n_chars) AS BIGINT) AS max_chars
FROM documents GROUP BY source""",
)
def corpus_profile(sf_dir: str):
    """Per-source corpus profile (the data-quality dashboard row):
    doc count, exact distinct languages, and char-volume extremes.

    Count/sum/min/max ride the partial+tree aggregate; the exact
    distinct-lang count goes through the hash-partitioned distinct on
    (source, lang) — a langs×sources-bounded exchange — then a tiny
    per-source count. No row shuffle anywhere."""
    import pandas as pd
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate, grouped_aggregate_ds

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["source", "lang", "n_chars"])
    base = grouped_aggregate(ds, ["source"], [
        ("*", "count", "n_docs"), ("n_chars", "sum", "sum_chars"),
        ("n_chars", "min", "min_chars"), ("n_chars", "max", "max_chars"),
    ]).to_pandas()
    sl = grouped_aggregate(
        grouped_aggregate_ds(ds, ["source", "lang"], []),
        ["source"], [("*", "count", "n_langs")],
    ).to_pandas()
    out = base.merge(sl, on="source")
    return pa.table({
        "source": pa.array(out["source"], pa.string()),
        "n_docs": pa.array(out["n_docs"], pa.int64()),
        "n_langs": pa.array(out["n_langs"], pa.int64()),
        "sum_chars": pa.array(out["sum_chars"], pa.int64()),
        "min_chars": pa.array(out["min_chars"], pa.int64()),
        "max_chars": pa.array(out["max_chars"], pa.int64()),
    })


@query("text_fingerprint", "SELECT doc_id, md5(text) AS fp_md5 FROM documents")
def text_fingerprint(sf_dir: str):
    """Document fingerprinting (md5 content hash; rolling hash in pytest)."""
    import ray.data as rd

    from raylog.functions.text import fingerprints

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    ds = ds.map_batches(fingerprints, batch_format="pyarrow", batch_size=None)
    return ds.select_columns(["doc_id", "fp_md5"])


# --------------------------------------------------------------------------
# Token-payload statistics (vocab heavy hitters, bigram LM counts)
# --------------------------------------------------------------------------

@query(
    "tokens_top_terms",
    _P() + """
SELECT token, cnt, rank FROM (
  SELECT token, COUNT(*) AS cnt,
         ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, token) AS rank
  FROM (SELECT CAST(unnest(tokens) AS BIGINT) AS token FROM recs2)
  GROUP BY token
) WHERE rank <= 50""",
)
def tokens_top_terms(sf_dir: str):
    """Vocabulary heavy hitters over the tokens payload.

    np.unique partial counts per batch → hash-partitioned combine →
    partial top-k; no token-cardinality table on the driver.
    """
    from raylog.functions.tokens import token_top_terms
    from raylog.pipelines import log_pipeline as LP

    ds = LP.records_ds(sf_dir).select_columns(["tokens"])
    return token_top_terms(ds, k=50)


@query(
    "tokens_bigrams",
    _P() + """
SELECT t1, t2, cnt, rank FROM (
  SELECT t1, t2, COUNT(*) AS cnt,
         ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, t1, t2) AS rank
  FROM (
    SELECT CAST(tokens[CAST(i AS INT)] AS BIGINT) AS t1,
           CAST(tokens[CAST(i AS INT) + 1] AS BIGINT) AS t2
    FROM recs2, LATERAL (
      SELECT unnest(generate_series(1, CAST(n_tok AS INT) - 1)) AS i
    ) g
  ) GROUP BY t1, t2
) WHERE rank <= 50""",
)
def tokens_bigrams(sf_dir: str):
    """Next-token (bigram) counts over the tokens payload, top-50.

    Consecutive pairs packed into one uint64 key per batch, boundaries
    masked vectorized; same partial-count + distributed-combine shape as
    unigrams.
    """
    from raylog.functions.tokens import bigram_top_terms
    from raylog.pipelines import log_pipeline as LP

    ds = LP.records_ds(sf_dir).select_columns(["tokens"])
    return bigram_top_terms(ds, k=50)


@query(
    "tokens_bigrams_sketch",
    _P() + """
SELECT t1, t2, cnt FROM (
  SELECT t1, t2, COUNT(*) AS cnt,
         ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, t1, t2) AS rnk
  FROM (
    SELECT CAST(tokens[CAST(i AS INT)] AS BIGINT) AS t1,
           CAST(tokens[CAST(i AS INT) + 1] AS BIGINT) AS t2
    FROM recs2, LATERAL (
      SELECT unnest(generate_series(1, CAST(n_tok AS INT) - 1)) AS i
    ) g
  ) GROUP BY t1, t2
) WHERE rnk <= 20""",
)
def tokens_bigrams_sketch(sf_dir: str):
    """Bigram heavy hitters via count-min sketch + exact candidate
    verification — the shuffle-free scale path for unbounded pair keys
    (exchange = blocks × sketch size, not one row per distinct pair).

    The verified counts are EXACT whenever every true heavy hitter
    reaches some block's local top-m candidate pool; this corpus's
    bigram key space (word-length pairs, ≪ m=128 distinct) satisfies
    that, so the result is oracle-checkable here. On adversarially flat
    distributions recall is the (documented) approximation.
    """
    import numpy as np

    from raylog.functions.sketch import cms_heavy_hitters
    from raylog.functions.tokens import bigram_keys_batch
    from raylog.pipelines import log_pipeline as LP

    ds = LP.records_ds(sf_dir).select_columns(["tokens"])
    keys = ds.map_batches(bigram_keys_batch, batch_format="pyarrow",
                          batch_size=None)
    hh = cms_heavy_hitters(keys, "key", k=20, top_m=128)
    key = np.asarray(hh["key"], dtype=np.int64).view(np.uint64)
    t1 = (key >> np.uint64(32)).astype(np.uint32).view(np.int32).astype(np.int64)
    t2 = (key & np.uint64(0xFFFFFFFF)).astype(np.uint32).view(np.int32).astype(np.int64)
    return pa.table({"t1": pa.array(t1), "t2": pa.array(t2),
                     "cnt": hh["cnt"]})


@query(
    "tokens_remap_filter",
    _P() + """
SELECT doc_id,
       CAST(len(list_filter(list_transform(tokens, t -> t % 7), t -> t >= 2))
            AS BIGINT) AS n_tok2,
       CAST(coalesce(list_aggregate(
              list_filter(list_transform(tokens, t -> t % 7), t -> t >= 2),
              'sum'), 0) AS BIGINT) AS tok_sum2
FROM recs2""",
)
def tokens_remap_filter(sf_dir: str):
    """Vocabulary surgery on the tokens payload: remap every token
    (t → t % 7, the shape of an id-remap lookup) then drop a stop-set
    (t < 2), REBUILDING the list column — flatten, vectorized
    mask/remap, new offsets from a masked cumsum; zero Python per row.
    The remap is arithmetic here so the oracle can restate it; swapping
    in a broadcast ``np.take`` lookup table is the same kernel."""
    import numpy as np

    from raylog.pipelines import log_pipeline as LP

    def surgery(b: pa.Table) -> pa.Table:
        col = b["tokens"]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        vals = np.asarray(col.flatten(), dtype=np.int64)
        lengths = np.asarray(pa.compute.list_value_length(col), dtype=np.int64)
        remapped = vals % 7
        keep = remapped >= 2
        kept = remapped[keep]
        # new per-row lengths: count of kept tokens per original row
        row_id = np.repeat(np.arange(len(lengths)), lengths)
        n2 = np.bincount(row_id[keep], minlength=len(lengths)).astype(np.int64)
        offsets = np.concatenate([[0], np.cumsum(n2)])
        new_col = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), pa.array(kept, pa.int64()))
        csum = np.concatenate([[0], np.cumsum(kept)])
        tok_sum2 = csum[offsets[1:]] - csum[offsets[:-1]]
        return pa.table({
            "doc_id": b["doc_id"],
            "n_tok2": pa.array(n2),
            "tok_sum2": pa.array(tok_sum2),
            "tokens2": new_col,
        })

    ds = LP.records_ds(sf_dir).select_columns(["doc_id", "tokens"])
    out = ds.map_batches(surgery, batch_format="pyarrow", batch_size=None)
    return out.select_columns(["doc_id", "n_tok2", "tok_sum2"])


@query(
    "embed_centroids",
    """
SELECT label, CAST(i AS BIGINT) AS dim,
       avg(embedding[CAST(i AS INT)]) AS v
FROM embeddings, LATERAL (
  SELECT unnest(generate_series(1, len(embedding))) AS i
) g
GROUP BY 1, 2""",
)
def embed_centroids(sf_dir: str):
    """Per-label embedding centroids: per-batch dim-wise sums (one numpy
    matrix reduction per label per block — never one row per (vector,
    dim)), merged on the tiny labels×dims grid."""
    import numpy as np
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["label", "embedding"])

    def partial(b: pa.Table) -> pa.Table:
        col = b["embedding"]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        dim = len(col[0]) if len(col) else 0
        mat = np.asarray(col.flatten(), dtype=np.float64).reshape(-1, dim)
        labels = np.asarray(b["label"].combine_chunks(), dtype=np.int64)
        uk = np.unique(labels)
        rows = []
        for lb in uk:  # labels are few; the reduction per label is vector
            sub = mat[labels == lb]
            rows.append((lb, sub.sum(axis=0), len(sub)))
        return pa.table({
            "label": pa.array([r[0] for r in rows], pa.int64()),
            "sums": pa.array([r[1].tolist() for r in rows],
                             pa.list_(pa.float64())),
            "n": pa.array([r[2] for r in rows], pa.int64()),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    acc: dict[int, tuple[np.ndarray, int]] = {}
    for t in parts.iter_batches(batch_format="pyarrow", batch_size=None):
        for lb, s, n in zip(t["label"].to_pylist(), t["sums"].to_pylist(),
                            t["n"].to_pylist()):
            s = np.asarray(s)
            if lb in acc:
                acc[lb] = (acc[lb][0] + s, acc[lb][1] + n)
            else:
                acc[lb] = (s, n)
    labels_out, dims_out, vals_out = [], [], []
    for lb in sorted(acc):
        s, n = acc[lb]
        for i, v in enumerate(s / n):
            labels_out.append(lb)
            dims_out.append(i + 1)
            vals_out.append(v)
    return pa.table({
        "label": pa.array(labels_out, pa.int64()),
        "dim": pa.array(dims_out, pa.int64()),
        "v": pa.array(vals_out, pa.float64()),
    })


@query(
    "tokens_percentile_curation",
    _P() + """
, q AS (
  SELECT source,
         quantile_disc(n_tok, 0.10) AS lo,
         quantile_disc(n_tok, 0.90) AS hi
  FROM recs2 GROUP BY source
)
SELECT r.source, CAST(COUNT(*) AS BIGINT) AS kept,
       CAST(SUM(r.n_tok) AS BIGINT) AS kept_tokens
FROM recs2 r JOIN q ON r.source = q.source
WHERE r.n_tok >= q.lo AND r.n_tok <= q.hi
GROUP BY r.source""",
)
def tokens_percentile_curation(sf_dir: str):
    """Percentile-threshold curation: per-source p10/p90 length bounds
    from the histogram quantile op, broadcast as a plain dict (quantile
    output is key-cardinality-bounded), then a shuffle-free filter +
    count pass — the 'trim the length-distribution tails per domain'
    recipe."""
    import numpy as np
    import pyarrow.compute as pc

    from raylog.functions.agg import grouped_aggregate
    from raylog.functions.quantile import grouped_quantiles
    from raylog.pipelines import log_pipeline as LP

    ds = LP.records_ds(sf_dir).select_columns(["source", "n_tok"]).map_batches(
        lambda b: b.set_column(
            b.column_names.index("n_tok"), "n_tok",
            pc.cast(b["n_tok"], pa.int64())),
        batch_format="pyarrow", batch_size=None,
    )
    q = grouped_quantiles(ds, key="source", value="n_tok", ps=[0.10, 0.90],
                          out_names=["lo", "hi"], num_partitions=8).to_pandas()
    # tiny (source → lo/hi) dim arrays; per-batch lookup is a single
    # vectorized pc.index_in + numpy gather, no per-row Python
    keys = pa.array(q["source"].tolist(), pa.string())
    lo_arr = np.asarray(q["lo"], dtype=np.float64)
    hi_arr = np.asarray(q["hi"], dtype=np.float64)

    def keep(b: pa.Table) -> pa.Table:
        idx = np.asarray(pc.index_in(b["source"], value_set=keys)
                         .combine_chunks(), dtype=np.int64)
        n = np.asarray(b["n_tok"].combine_chunks(), dtype=np.int64)
        lo = lo_arr[idx]
        hi = hi_arr[idx]
        return b.filter(pa.array((n >= lo) & (n <= hi)))

    kept = ds.map_batches(keep, batch_format="pyarrow", batch_size=None)
    return grouped_aggregate(kept, ["source"], [
        ("*", "count", "kept"), ("n_tok", "sum", "kept_tokens"),
    ])


@query(
    "orders_rollup",
    """
SELECT coalesce(o_orderpriority, '(all)') AS o_orderpriority,
       coalesce(o_orderstatus, '(all)') AS o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n
FROM orders
GROUP BY ROLLUP (o_orderpriority, o_orderstatus)""",
)
def orders_rollup(sf_dir: str):
    """ROLLUP aggregation (priority → priority×status → grand total) as
    a union of three key-compressed partial aggregates — each level is
    its own tiny exchange, no re-scan (the finest level feeds the
    coarser ones)."""
    import pandas as pd
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderpriority", "o_orderstatus"])
    fine = grouped_aggregate(
        ds, ["o_orderpriority", "o_orderstatus"], [("*", "count", "n")],
    ).to_pandas()
    mid = fine.groupby("o_orderpriority", as_index=False)["n"].sum()
    mid["o_orderstatus"] = "(all)"
    total = pd.DataFrame({
        "o_orderpriority": ["(all)"], "o_orderstatus": ["(all)"],
        "n": [fine["n"].sum()],
    })
    out = pd.concat([fine, mid, total], ignore_index=True)[
        ["o_orderpriority", "o_orderstatus", "n"]]
    out["n"] = out["n"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


@query(
    "tokens_pack_chunks",
    _P() + """
, r AS (SELECT doc_id, doc_id % 8 AS shard, n_tok FROM recs2),
c AS (
  SELECT shard, doc_id, n_tok,
         SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
                          ROWS UNBOUNDED PRECEDING) AS cum
  FROM r
)
SELECT shard, doc_id,
       CAST((cum - n_tok) // 512 AS BIGINT) AS first_pack,
       CAST(CASE WHEN n_tok > 0 THEN (cum - 1) // 512
            ELSE (cum - n_tok) // 512 END AS BIGINT) AS last_pack,
       CAST((cum - n_tok) % 512 AS BIGINT) AS first_offset
FROM c""",
)
def tokens_pack_chunks(sf_dir: str):
    """Sequence packing (concat-and-chunk): per-shard token streams cut
    into fixed 512-token context windows; each doc's window span and
    offset computed closed-form from a per-shard running sum — one
    vectorized pass per hash partition."""
    from raylog.functions.packing import pack_chunks
    from raylog.pipelines import log_pipeline as LP

    ds = LP.records_ds(sf_dir).select_columns(["doc_id", "n_tok"])
    out = pack_chunks(ds, max_tokens=512, num_shards=8, num_partitions=8)
    return out


@query(
    "tokens_pack_windows",
    _P() + """
, r AS (SELECT doc_id, doc_id % 8 AS shard, tokens FROM recs2),
flat AS (
  SELECT shard, doc_id, i, tokens[CAST(i AS INT)] AS t
  FROM r, LATERAL (
    SELECT unnest(generate_series(1, len(tokens))) AS i
  ) g
),
seq AS (
  SELECT shard, t,
         CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY doc_id, i)
              - 1 AS BIGINT) AS pos
  FROM flat
)
SELECT shard, CAST(pos // 512 AS BIGINT) AS pack_id,
       CAST(COUNT(*) AS BIGINT) AS n_fill,
       CAST(SUM((pos % 512 + 1) * t) AS BIGINT) AS tok_chk
FROM seq GROUP BY shard, pos // 512""",
)
def tokens_pack_windows(sf_dir: str):
    """MATERIALIZED context windows: the actual fixed 512-token
    sequences a trainer reads (concat-and-chunk per shard in doc
    order), built as a real list<int32> column with zero per-window
    Python. The oracle form reduces each window to a position-weighted
    checksum — order- and value-exact — because the raw list column is
    the deliverable but a scalar is the robust hash-compare form."""
    import numpy as np

    from raylog.functions.packing import pack_windows
    from raylog.pipelines import log_pipeline as LP

    ds = LP.records_ds(sf_dir).select_columns(["doc_id", "tokens"])
    wins = pack_windows(ds, max_tokens=512, num_shards=8, num_partitions=8)

    def checksum(b: pa.Table) -> pa.Table:
        toks = b["tokens"]
        toks = (toks.combine_chunks() if isinstance(toks, pa.ChunkedArray)
                else toks)
        off = np.asarray(toks.offsets, dtype=np.int64)
        vals = np.asarray(toks.values, dtype=np.int64)[off[0]:off[-1]]
        off = off - off[0]
        pos = (np.arange(len(vals), dtype=np.int64)
               - np.repeat(off[:-1], np.diff(off)) + 1)
        csum = np.concatenate([[0], np.cumsum(vals * pos)])
        chk = csum[off[1:]] - csum[off[:-1]]
        return pa.table({
            "shard": b["shard"],
            "pack_id": b["pack_id"],
            "n_fill": b["n_fill"],
            "tok_chk": pa.array(chk),
        })

    return wins.map_batches(checksum, batch_format="pyarrow",
                            batch_size=None)


@query(
    "tokens_quantile_sketch",
    _P() + """
, t AS (SELECT source, n_tok FROM recs2 WHERE n_tok > 0),
b AS (
  SELECT source,
         CAST(CEIL(LN(CAST(n_tok AS DOUBLE)) / LN(1.01 / 0.99)) AS BIGINT)
           AS bucket
  FROM t
),
h AS (SELECT source, bucket, COUNT(*) AS cnt FROM b GROUP BY 1, 2),
r AS (
  SELECT source, bucket,
         SUM(cnt) OVER (PARTITION BY source ORDER BY bucket
                        ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(cnt) OVER (PARTITION BY source) AS tot
  FROM h
)
SELECT source, q.q_milli, CAST(MIN(bucket) AS BIGINT) AS bucket
FROM r, (VALUES (500), (950), (990)) AS q(q_milli)
WHERE cum >= GREATEST(1, CEIL(q.q_milli / 1000.0 * tot))
GROUP BY 1, 2""",
)
def tokens_quantile_sketch(sf_dir: str):
    """DDSketch per-source token-length quantiles (p50/p95/p99) — the
    MERGEABLE sketch path for unbounded value domains that
    quantile.py's exact histogram path points to: log-width buckets
    bound every estimate's relative error at alpha=1%, and partials are
    key-compressed (group, bucket) counts, so the merge is the ordinary
    hash-partitioned grouped count. Output carries the bucket INDEX
    (integer — exact oracle compare); dd_value(bucket, alpha) is the
    value estimate. The oracle replays ceil(ln(x)/ln(gamma)) in SQL —
    numpy and DuckDB share libm doubles on one host, so indices match
    exactly; a cross-platform oracle would compare dd_value within
    alpha instead of indices."""
    from raylog.functions.quantile import grouped_quantile_sketch
    from raylog.pipelines import log_pipeline as LP

    ds = LP.records_ds(sf_dir).select_columns(["source", "n_tok"])
    return grouped_quantile_sketch(
        ds, group_cols=["source"], value_col="n_tok",
        qs=[0.5, 0.95, 0.99], alpha=0.01)


@query(
    "tokens_pack_segments",
    _P() + """
, r AS (SELECT doc_id, doc_id % 8 AS shard, n_tok FROM recs2),
c AS (
  SELECT shard, doc_id, n_tok,
         SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
                          ROWS UNBOUNDED PRECEDING) AS cum
  FROM r
),
e AS (
  SELECT shard, doc_id, n_tok, cum, cum - n_tok AS strt,
         CAST((cum - n_tok) // 512 AS BIGINT) AS first_pack,
         CAST(CASE WHEN n_tok > 0 THEN (cum - 1) // 512
              ELSE (cum - n_tok) // 512 END AS BIGINT) AS last_pack
  FROM c
),
x AS (
  SELECT shard, doc_id, w,
         LEAST(cum, (w + 1) * 512) - GREATEST(strt, w * 512) AS overlap
  FROM e, LATERAL (
    SELECT unnest(generate_series(first_pack, last_pack)) AS w
  ) g
  WHERE n_tok > 0
),
rk AS (
  SELECT shard, w, overlap,
         CAST(ROW_NUMBER() OVER (PARTITION BY shard, w ORDER BY doc_id)
              AS BIGINT) AS rnk
  FROM x
)
SELECT shard, CAST(w AS BIGINT) AS pack_id,
       CAST(COUNT(*) AS BIGINT) AS n_segments,
       CAST(SUM(rnk * overlap) AS BIGINT) AS seg_chk
FROM rk GROUP BY 1, 2""",
)
def tokens_pack_segments(sf_dir: str):
    """Per-window SEGMENT bookkeeping for packed sequences: how many
    docs each 512-token context window spans and an order-weighted
    checksum over their in-window token counts — the metadata a trainer
    turns into block-diagonal attention masks. Closed form from the
    per-shard running sum; the per-window aggregate completes inside
    the shard's partition (no second exchange)."""
    from raylog.functions.packing import pack_segments
    from raylog.pipelines import log_pipeline as LP

    ds = LP.records_ds(sf_dir).select_columns(["doc_id", "n_tok"])
    return pack_segments(ds, max_tokens=512, num_shards=8,
                         num_partitions=8)


@query(
    "tokens_pack_windows_eos",
    _P() + """
, r AS (SELECT doc_id, doc_id % 8 AS shard,
               list_append(tokens, 99999) AS tokens
        FROM recs2),
flat AS (
  SELECT shard, doc_id, i, tokens[CAST(i AS INT)] AS t
  FROM r, LATERAL (
    SELECT unnest(generate_series(1, len(tokens))) AS i
  ) g
),
seq AS (
  SELECT shard, t,
         CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY doc_id, i)
              - 1 AS BIGINT) AS pos
  FROM flat
)
SELECT shard, CAST(pos // 512 AS BIGINT) AS pack_id,
       CAST(COUNT(*) AS BIGINT) AS n_fill,
       CAST(SUM((pos % 512 + 1) * t) AS BIGINT) AS tok_chk
FROM seq GROUP BY shard, pos // 512""",
)
def tokens_pack_windows_eos(sf_dir: str):
    """Context windows with a document separator (EOS id 99999)
    inserted after every doc before chunking — the standard trainer
    layout so models learn document boundaries inside packed windows.
    Same checksum oracle form as `tokens_pack_windows`."""
    import numpy as np

    from raylog.functions.packing import pack_windows
    from raylog.pipelines import log_pipeline as LP

    ds = LP.records_ds(sf_dir).select_columns(["doc_id", "tokens"])
    wins = pack_windows(ds, max_tokens=512, num_shards=8,
                        num_partitions=8, sep_token=99999)

    def checksum(b: pa.Table) -> pa.Table:
        toks = b["tokens"]
        toks = (toks.combine_chunks() if isinstance(toks, pa.ChunkedArray)
                else toks)
        off = np.asarray(toks.offsets, dtype=np.int64)
        vals = np.asarray(toks.values, dtype=np.int64)[off[0]:off[-1]]
        off = off - off[0]
        pos = (np.arange(len(vals), dtype=np.int64)
               - np.repeat(off[:-1], np.diff(off)) + 1)
        csum = np.concatenate([[0], np.cumsum(vals * pos)])
        chk = csum[off[1:]] - csum[off[:-1]]
        return pa.table({
            "shard": b["shard"],
            "pack_id": b["pack_id"],
            "n_fill": b["n_fill"],
            "tok_chk": pa.array(chk),
        })

    return wins.map_batches(checksum, batch_format="pyarrow",
                            batch_size=None)


@query(
    "tokens_span_corruption",
    _P() + """
, pos AS (
  SELECT doc_id, n_tok, i - 1 AS p, tokens[CAST(i AS INT)] AS t
  FROM recs2, LATERAL (
    SELECT unnest(generate_series(1, len(tokens))) AS i
  ) g
),
m AS (
  SELECT *,
         ((p + doc_id * 7) % 10 = 0
          OR (p >= 1 AND (p - 1 + doc_id * 7) % 10 = 0)
          OR (p >= 2 AND (p - 2 + doc_id * 7) % 10 = 0)) AS masked
  FROM pos
),
r AS (
  SELECT doc_id, masked, t,
         CAST(ROW_NUMBER() OVER (PARTITION BY doc_id, masked
                                 ORDER BY p) AS BIGINT) AS rnk
  FROM m
)
SELECT doc_id,
       CAST(SUM(CASE WHEN masked THEN 1 ELSE 0 END) AS BIGINT) AS n_masked,
       CAST(COALESCE(SUM(CASE WHEN masked THEN rnk * t END), 0)
            AS BIGINT) AS target_chk,
       CAST(COALESCE(SUM(CASE WHEN NOT masked THEN rnk * t END), 0)
            AS BIGINT) AS input_chk
FROM r GROUP BY doc_id""",
)
def tokens_span_corruption(sf_dir: str):
    """Denoising-objective (T5/UL2 span corruption) data prep, counted
    and checksummed: a deterministic rule starts a 3-token mask span at
    every position p with (p + 7·doc_id) % 10 == 0 (≈30% corruption
    after overlap), splitting each doc into the model INPUT (kept
    tokens) and the denoising TARGET (masked tokens). Output per doc:
    n_masked plus position-weighted checksums of both streams — exact
    content+order witnesses without emitting the streams themselves.
    Map-only and fully vectorized (the mask is three shifted modular
    tests; stream checksums are segmented cumsums)."""
    import numpy as np

    from raylog.pipelines import log_pipeline as LP

    ds = LP.records_ds(sf_dir).select_columns(["doc_id", "tokens"])

    def corrupt(b: pa.Table) -> pa.Table:
        toks = b["tokens"]
        toks = (toks.combine_chunks() if isinstance(toks, pa.ChunkedArray)
                else toks)
        off = np.asarray(toks.offsets, dtype=np.int64)
        vals = np.asarray(toks.values, dtype=np.int64)[off[0]:off[-1]]
        off = off - off[0]
        ids = np.asarray(b["doc_id"].combine_chunks(), dtype=np.int64)
        lens = np.diff(off)
        row = np.repeat(np.arange(len(ids), dtype=np.int64), lens)
        p = np.arange(len(vals), dtype=np.int64) - np.repeat(off[:-1], lens)
        phase = (p + ids[row] * 7) % 10
        masked = (phase == 0)
        masked |= (p >= 1) & ((phase - 1) % 10 == 0)
        masked |= (p >= 2) & ((phase - 2) % 10 == 0)
        # rank within (doc, masked-stream): running count per stream
        def stream_chk(sel: np.ndarray) -> np.ndarray:
            r = row[sel]
            ones = np.ones(sel.sum(), dtype=np.int64)
            # rank = position within its doc segment of the stream
            seg_start = np.concatenate(
                [[True], r[1:] != r[:-1]]) if len(r) else np.array([], bool)
            csum = np.cumsum(ones)
            base = np.repeat(csum[np.flatnonzero(seg_start)] - 1,
                             np.diff(np.append(np.flatnonzero(seg_start),
                                               len(r))))
            rnk = csum - base
            prod = np.cumsum(vals[sel] * rnk)
            prodc = np.concatenate([[0], prod])
            starts = np.flatnonzero(seg_start)
            ends = np.append(starts[1:], len(r))
            out = np.zeros(len(ids), dtype=np.int64)
            out[r[starts]] = prodc[ends] - prodc[starts]
            return out

        return pa.table({
            "doc_id": pa.array(ids),
            "n_masked": pa.array(np.bincount(
                row[masked], minlength=len(ids)).astype(np.int64)),
            "target_chk": pa.array(stream_chk(masked)),
            "input_chk": pa.array(stream_chk(~masked)),
        })

    return ds.map_batches(corrupt, batch_format="pyarrow", batch_size=None)


@query(
    "tokens_batch_padding",
    _P() + """
, t AS (
  SELECT doc_id, n_tok,
         CAST(((n_tok + 31) // 32) * 32 AS BIGINT) AS lbucket
  FROM recs2
),
r AS (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY lbucket ORDER BY doc_id)
                 - 1 AS BIGINT) AS rn
  FROM t
)
SELECT lbucket, CAST(rn // 16 AS BIGINT) AS batch_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS real_tok,
       CAST(MAX(n_tok) * COUNT(*) AS BIGINT) AS padded_tok
FROM r GROUP BY 1, 2""",
)
def tokens_batch_padding(sf_dir: str):
    """Length-bucketed dynamic batching with padding accounting: docs
    round up to 32-token length buckets, rank within their bucket (the
    skew-proof bucketed running count — no per-bucket giant task), form
    16-doc batches in rank order, and each batch reports real vs padded
    tokens (padded = batch max × batch size — the dynamic-padding cost
    a dataloader pays). The real/padded ratio is the padding-efficiency
    curve that picks bucket widths."""
    from raylog.functions.agg import grouped_aggregate_ds
    from raylog.pipelines import log_pipeline as LP
    from raylog.stages.ordered import running_count

    ds = LP.records_ds(sf_dir).select_columns(["doc_id", "n_tok"])

    def add_bucket(b: pa.Table) -> pa.Table:
        import numpy as np

        nt = np.asarray(b["n_tok"].combine_chunks(), dtype=np.int64)
        return b.append_column("lbucket", pa.array(((nt + 31) // 32) * 32))

    ranked = running_count(
        ds.map_batches(add_bucket, batch_format="pyarrow", batch_size=None),
        part_col="lbucket", order_col="doc_id", out_col="rank",
    )

    def add_batch(b: pa.Table) -> pa.Table:
        import numpy as np

        rk = np.asarray(b["rank"].combine_chunks(), dtype=np.int64)
        return b.append_column("batch_id", pa.array((rk - 1) // 16))

    # (lbucket, batch_id) cardinality GROWS with corpus size (~n/16
    # rows) — hash-partitioned combine, never a driver merge
    agg = grouped_aggregate_ds(
        ranked.map_batches(add_batch, batch_format="pyarrow",
                           batch_size=None),
        ["lbucket", "batch_id"],
        [("*", "count", "n_docs"), ("n_tok", "sum", "real_tok"),
         ("n_tok", "max", "max_tok")],
        num_partitions=8,
    )

    def finish(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return (b.append_column(
            "padded_tok", pc.multiply(b["max_tok"], b["n_docs"]))
            .drop_columns(["max_tok"]))

    return agg.map_batches(finish, batch_format="pyarrow", batch_size=None)


@query(
    "tokens_pack_greedy",
    # first-fit is a sequential recurrence — expressible as a DuckDB
    # recursive CTE stepping one doc per shard per iteration (the
    # dedup_cluster_sizes technique; VERDICT r2 next-round #7)
    _P().replace("WITH ", "WITH RECURSIVE ", 1) + """
, r AS (SELECT doc_id, doc_id % 8 AS shard, n_tok FROM recs2),
seq AS (
  SELECT shard, doc_id, n_tok,
         CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY doc_id)
              AS BIGINT) AS rn,
         CAST(SUM(LEAST(n_tok, 512)) OVER (PARTITION BY shard
              ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
  FROM r
),
g AS (
  SELECT shard, doc_id, n_tok, rn, cum,
         CAST(0 AS BIGINT) AS pack_id, CAST(0 AS BIGINT) AS base
  FROM seq WHERE rn = 1
  UNION ALL
  SELECT s.shard, s.doc_id, s.n_tok, s.rn, s.cum,
         CASE WHEN s.cum <= g.base + 512 THEN g.pack_id
              ELSE g.pack_id + 1 END,
         CASE WHEN s.cum <= g.base + 512 THEN g.base ELSE g.cum END
  FROM g JOIN seq s ON s.shard = g.shard AND s.rn = g.rn + 1
)
SELECT shard, doc_id, pack_id, n_tok > 512 AS overflow FROM g""",
)
def tokens_pack_greedy(sf_dir: str):
    """Sequence packing (whole-doc first-fit): greedy window assignment
    per shard; sequential boundary recurrence as per-pack searchsorted
    steps on the partition cumsum. Packing invariants additionally
    asserted in tests/test_packing.py."""
    from raylog.functions.packing import pack_greedy
    from raylog.pipelines import log_pipeline as LP

    ds = LP.records_ds(sf_dir).select_columns(["doc_id", "n_tok"])
    return pack_greedy(ds, max_tokens=512, num_shards=8, num_partitions=8)


@query(
    "export_sorted_by_toklen",
    _P() + """
SELECT doc_id, n_tok FROM recs2""",
)
def export_sorted_by_toklen(sf_dir: str):
    """Globally-sorted range-partitioned export: records written as
    range-disjoint parquet files sorted by n_tok (sample-based range
    cuts, per-range sort, idempotent file names); the gate checks the
    round-tripped content, pytest checks the global order contract."""
    import glob
    import os

    import pyarrow.compute as pc
    import pyarrow.parquet as _pq
    import ray.data as rd

    from raylog.functions.sortexport import range_sorted_export
    from raylog.pipelines import log_pipeline as LP

    ds = LP.records_ds(sf_dir).select_columns(["doc_id", "n_tok"]).map_batches(
        lambda b: b.set_column(b.column_names.index("n_tok"), "n_tok",
                               pc.cast(b["n_tok"], pa.int64())),
        batch_format="pyarrow", batch_size=None,
    )
    out_dir = f"/tmp/raylog_cache/sorted_{os.path.basename(sf_dir.rstrip('/'))}"
    range_sorted_export(ds, out_dir, key="n_tok", num_ranges=8)
    files = sorted(glob.glob(f"{out_dir}/range_*.parquet"))
    return pa.concat_tables([_pq.read_table(f) for f in files])


@query(
    "tokens_quantiles_by_source",
    _P() + """
SELECT source,
       quantile_disc(n_tok, 0.5) AS p50,
       quantile_disc(n_tok, 0.9) AS p90,
       quantile_disc(n_tok, 0.99) AS p99
FROM recs2 GROUP BY source""",
)
def tokens_quantiles_by_source(sf_dir: str):
    """Exact per-source sequence-length quantiles via a (source, n_tok)
    count histogram — grouped counts are the only shuffle; no sort of
    the data."""
    import pyarrow.compute as pc

    from raylog.functions.quantile import grouped_quantiles
    from raylog.pipelines import log_pipeline as LP

    ds = LP.records_ds(sf_dir).select_columns(["source", "n_tok"]).map_batches(
        lambda b: b.set_column(
            b.column_names.index("n_tok"), "n_tok",
            pc.cast(b["n_tok"], pa.int64())),
        batch_format="pyarrow", batch_size=None,
    )
    return grouped_quantiles(ds, key="source", value="n_tok",
                             ps=[0.5, 0.9, 0.99], num_partitions=8)


@query(
    "text_tfidf_top_terms",
    """
WITH words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM words GROUP BY 1, 2),
df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
nd AS (SELECT COUNT(*) AS n FROM documents),
scored AS (
  SELECT doc_id, term, tf, tf * ln(n * 1.0 / df) AS score
  FROM tf JOIN df USING (term) CROSS JOIN nd
),
r AS (SELECT *, CAST(ROW_NUMBER() OVER (
        PARTITION BY doc_id ORDER BY score DESC, term) AS BIGINT) AS rank
      FROM scored)
SELECT doc_id, term, tf, score, rank FROM r WHERE rank <= 3""",
)
def text_tfidf_top_terms(sf_dir: str):
    """Per-document top-3 TF-IDF terms: batch-local tf, distributed df,
    hash join on term, per-doc head inside whole-doc hash partitions."""
    import pyarrow.parquet as _pq
    import ray.data as rd

    from raylog.functions.tfidf import tfidf_top_terms

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    n_docs = _pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    out = tfidf_top_terms(ds, n_docs=n_docs, k=3, num_partitions=8)
    return out.select_columns(["doc_id", "term", "tf", "score", "rank"])


@query(
    "text_chunks",
    """
SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
       substr(text, CAST(i * 80 + 1 AS INT), 120) AS chunk,
       CAST(length(substr(text, CAST(i * 80 + 1 AS INT), 120)) AS BIGINT)
         AS chunk_len
FROM documents, LATERAL (
  SELECT unnest(generate_series(0, (length(text) - 1) // 80)) AS i
) g
WHERE length(text) > 0""",
)
def text_chunks(sf_dir: str):
    """Overlapping character chunking (size 120, stride 80) — the
    RAG/pretraining doc-splitting step, one numpy byte-gather per batch
    (no per-row or per-chunk Python)."""
    import ray.data as rd

    from raylog.functions.text import chunk_texts

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return ds.map_batches(
        lambda b: chunk_texts(b, size=120, stride=80),
        batch_format="pyarrow", batch_size=None,
    )


_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\b\d{3}-\d{4}\b"


@query(
    "text_pii_redact",
    f"""
WITH w AS (
  SELECT doc_id,
         text || ' contact user' || doc_id || '@ex' || (doc_id % 7)
              || '.com tel 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
           AS t
  FROM documents
)
SELECT doc_id,
       regexp_replace(regexp_replace(t, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                      '{_PHONE_RE}', '<PHONE>', 'g') AS clean,
       CAST(len(regexp_extract_all(t, '{_EMAIL_RE}')) +
            len(regexp_extract_all(t, '{_PHONE_RE}')) AS BIGINT) AS n_pii
FROM w""",
)
def text_pii_redact(sf_dir: str):
    """PII scrubbing: vectorized RE2 redaction of emails + phone numbers
    (deterministically injected so the oracle can restate the input).
    Single-pass Arrow kernels — compiled once, no Python per row."""
    import pyarrow.compute as pc
    import ray.data as rd

    def scrub(b: pa.Table) -> pa.Table:
        import numpy as np

        ids = np.asarray(b["doc_id"].combine_chunks(), dtype=np.int64)
        did = pc.cast(b["doc_id"], pa.string())
        mod7 = pa.array((ids % 7).astype("U1"))
        mod1e4 = pc.utf8_lpad(pa.array((ids % 10000).astype("U4")), 4, "0")
        n = b.num_rows

        def lit(s):
            return pa.array([s] * n, pa.string())

        t = pc.binary_join_element_wise(
            b["text"], lit(" contact user"), did, lit("@ex"), mod7,
            lit(".com tel 555-"), mod1e4, "",
        )
        n_pii = pc.add(
            pc.count_substring_regex(t, _EMAIL_RE),
            pc.count_substring_regex(t, _PHONE_RE),
        )
        clean = pc.replace_substring_regex(t, _EMAIL_RE, "<EMAIL>")
        clean = pc.replace_substring_regex(clean, _PHONE_RE, "<PHONE>")
        return pa.table({
            "doc_id": b["doc_id"],
            "clean": clean,
            "n_pii": pc.cast(n_pii, pa.int64()),
        })

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return ds.map_batches(scrub, batch_format="pyarrow", batch_size=None)


@query(
    "text_tokenize",
    """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
words AS (SELECT doc_id, unnest(ws) AS wd,
                 generate_subscripts(ws, 1) AS pos FROM w),
vocab AS (SELECT wd, ROW_NUMBER() OVER (ORDER BY wd) - 1 AS tok
          FROM (SELECT DISTINCT wd FROM words))
SELECT doc_id, CAST(pos AS BIGINT) AS pos, CAST(tok AS BIGINT) AS tok
FROM words JOIN vocab USING (wd)""",
)
def text_tokenize(sf_dir: str):
    """Corpus tokenization — vocabulary build + encode, the bridge from
    raw documents to the engine's tokenized-sequences input shape.

    Pass 1 builds the vocabulary DISTRIBUTED: each batch emits its
    batch-distinct words (batch-distinct-bounded, never one row per
    token), the hash-partitioned aggregate dedups them, and the sorted
    vocab — token id = lexicographic rank, the deterministic analog of
    a trained BPE merge table — is broadcast once via ``ray.put``.
    Pass 2 encodes every batch vectorized: split → flatten →
    ``np.searchsorted`` → exploded (doc_id, pos, tok) rows. At real
    scale the vocab is capped top-K + UNK id (standard practice);
    output would stay ``list<int32>`` per doc rather than exploded —
    exploded here because the driver compare needs scalar rows.
    """
    import numpy as np
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate_ds

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def batch_vocab(b: pa.Table) -> pa.Table:
        split = pc.split_pattern(b["text"].combine_chunks(), " ")
        return pa.table({"wd": pc.unique(split.flatten())})

    vc = grouped_aggregate_ds(
        ds.map_batches(batch_vocab, batch_format="pyarrow",
                       batch_size=None), ["wd"], [],
    ).to_pandas()
    vocab = np.sort(np.array(vc["wd"], dtype="U"))
    vocab_ref = ray.put(vocab) if ray.is_initialized() else vocab

    def encode(b: pa.Table) -> pa.Table:
        v = ray.get(vocab_ref) if ray.is_initialized() else vocab_ref
        split = pc.split_pattern(b["text"].combine_chunks(), " ")
        lens = np.asarray(pc.list_value_length(split), dtype=np.int64)
        flat = split.flatten().dictionary_encode()
        codes = np.asarray(flat.indices, dtype=np.int64)
        dict_tok = np.searchsorted(v, np.asarray(flat.dictionary, dtype="U"))
        ids = np.asarray(b["doc_id"].combine_chunks(), dtype=np.int64)
        pos = (np.arange(lens.sum(), dtype=np.int64)
               - np.repeat(np.cumsum(lens) - lens, lens) + 1)  # 1-based
        return pa.table({
            "doc_id": pa.array(np.repeat(ids, lens)),
            "pos": pa.array(pos),
            "tok": pa.array(dict_tok[codes].astype(np.int64)),
        })

    return ds.map_batches(encode, batch_format="pyarrow", batch_size=None)


@query(
    "corpus_source_overlap",
    """
WITH sw AS (SELECT DISTINCT source, unnest(string_split(text, ' ')) AS w
            FROM documents),
sizes AS (SELECT source, COUNT(*) AS n FROM sw GROUP BY source),
inter AS (SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS n_inter
          FROM sw a JOIN sw b USING (w)
          WHERE a.source < b.source GROUP BY 1, 2)
SELECT src_a, src_b, n_inter,
       sa.n + sb.n - n_inter AS n_union,
       CAST(ROUND(1000.0 * n_inter / (sa.n + sb.n - n_inter)) AS BIGINT)
         AS jacc_milli
FROM inter
JOIN sizes sa ON sa.source = src_a
JOIN sizes sb ON sb.source = src_b""",
)
def corpus_source_overlap(sf_dir: str):
    """Inter-corpus overlap diagnostics: vocabulary Jaccard for every
    source pair — the "how much do my data sources duplicate each
    other" matrix that drives mixture design before training.

    Shape: distinct (source, word) pairs via the hash-partitioned
    aggregate (vocab×sources-bounded exchange, never one row per
    token); per-word source-pair expansion inside complete-postings
    hash partitions (the inverted-index pair kernel shared with n-gram
    dedup — a word shared by m sources costs m²/2, bounded by the
    source count, not the corpus); the pair matrix itself is
    sources²-bounded, so the final join with sizes is driver-trivial.
    """
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import (grouped_aggregate,
                                      grouped_aggregate_ds,
                                      partitioned_group_apply)
    from raylog.functions.dedup import _intra_bucket_pairs

    import pyarrow.compute as pc

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["source", "text"])

    def pairs(b: pa.Table) -> pa.Table:
        split = pc.split_pattern(b["text"].combine_chunks(), " ")
        lens = np.asarray(pc.list_value_length(split), dtype=np.int64)
        flat = split.flatten().dictionary_encode()
        codes = np.asarray(flat.indices, dtype=np.int64)
        src = b["source"].combine_chunks().dictionary_encode()
        sidx = np.repeat(np.asarray(src.indices, dtype=np.int64), lens)
        vocab = len(flat.dictionary)
        u = np.unique(sidx * vocab + codes)
        return pa.table({
            "source": src.dictionary.take(pa.array(u // vocab)),
            "w": flat.dictionary.take(pa.array(u % vocab)),
        })

    sw = grouped_aggregate_ds(
        ds.map_batches(pairs, batch_format="pyarrow", batch_size=None),
        ["source", "w"], [],
    )
    sizes = grouped_aggregate(sw, ["source"], [("*", "count", "n")])
    src_names = np.array(sorted(sizes["source"].to_pylist()), dtype=object)
    n_by = dict(zip(sizes["source"].to_pylist(), sizes["n"].to_pylist()))
    sid = {s: i for i, s in enumerate(src_names)}

    name_arr = pa.array(list(src_names), pa.string())

    def to_sid(b: pa.Table) -> pa.Table:
        ids = np.asarray(
            pc.index_in(b["source"], value_set=name_arr).combine_chunks(),
            dtype=np.int64)
        return pa.table({"w": b["w"], "sid": pa.array(ids)})

    inter = grouped_aggregate(
        partitioned_group_apply(
            sw.map_batches(to_sid, batch_format="pyarrow", batch_size=None),
            ["w"],
            lambda part: _intra_bucket_pairs(part, ["w"], id_col="sid"),
        ),
        ["doc_a", "doc_b"], [("*", "count", "n_inter")],
    )
    a = inter["doc_a"].to_numpy()
    b_ = inter["doc_b"].to_numpy()
    ni = inter["n_inter"].to_numpy()
    na = np.array([n_by[src_names[i]] for i in a], dtype=np.int64)
    nb = np.array([n_by[src_names[i]] for i in b_], dtype=np.int64)
    nu = na + nb - ni
    return pa.table({
        "src_a": pa.array(src_names[a], pa.string()),
        "src_b": pa.array(src_names[b_], pa.string()),
        "n_inter": pa.array(ni, pa.int64()),
        "n_union": pa.array(nu, pa.int64()),
        "jacc_milli": pa.array(np.round(1000.0 * ni / nu).astype(np.int64)),
    })


@query(
    "text_decontaminate",
    """
WITH snips AS (
  SELECT DISTINCT substr(text, 1, 40) AS snip
  FROM documents WHERE doc_id % 97 = 0 AND len(text) >= 40
)
SELECT d.doc_id,
       EXISTS(SELECT 1 FROM snips s WHERE contains(d.text, s.snip))
         AS contaminated
FROM documents d""",
)
def text_decontaminate(sf_dir: str):
    """Benchmark decontamination: flag training docs containing a
    verbatim snippet from the held-out eval set (here: the 40-char
    prefix of every ``doc_id % 97 == 0`` doc — a deterministic stand-in
    for a benchmark blocklist).

    Scale shape: the snippet set is TINY relative to the corpus (an
    eval suite, not a second corpus), so it is collected once, compiled
    into ONE RE2 alternation (RE2 builds a DFA — matching is a single
    vectorized pass per batch regardless of snippet count), and
    broadcast via ``ray.put``; the corpus streams through
    ``map_batches`` with no shuffle. For snippet sets beyond regex-DFA
    size, swap the kernel for an Aho-Corasick automaton at the marked
    point — the plumbing is unchanged.
    """
    import re

    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def eval_snips(b: pa.Table) -> pa.Table:
        import numpy as np

        ids = np.asarray(b["doc_id"].combine_chunks(), dtype=np.int64)
        lens = np.asarray(pc.utf8_length(b["text"].combine_chunks()),
                          dtype=np.int64)
        m = pa.array((ids % 97 == 0) & (lens >= 40))
        return pa.table(
            {"snip": pc.utf8_slice_codeunits(b.filter(m)["text"], 0, 40)})

    snip_tbls = list(
        ds.map_batches(eval_snips, batch_format="pyarrow", batch_size=None)
        .iter_batches(batch_format="pyarrow", batch_size=None))
    snips = sorted({s for t in snip_tbls for s in t["snip"].to_pylist()})
    # ONE combined alternation — swap point for Aho-Corasick at larger sets
    pattern = "|".join(re.escape(s) for s in snips) if snips else None
    pat_ref = ray.put(pattern) if ray.is_initialized() else pattern

    def flag(b: pa.Table) -> pa.Table:
        pat = ray.get(pat_ref) if ray.is_initialized() else pat_ref
        if pat is None:
            hit = pa.array([False] * b.num_rows, pa.bool_())
        else:
            hit = pc.match_substring_regex(b["text"], pat)
        return pa.table({"doc_id": b["doc_id"], "contaminated": hit})

    return ds.map_batches(flag, batch_format="pyarrow", batch_size=None)


@query(
    "text_repetition",
    """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
words AS (SELECT doc_id, unnest(ws) AS wd FROM w),
counts AS (SELECT doc_id, wd, COUNT(*) AS c FROM words GROUP BY doc_id, wd),
s AS (SELECT doc_id, SUM(c) AS n_words, COUNT(*) AS n_distinct,
             MAX(c) AS top_word_n
      FROM counts GROUP BY doc_id),
bg AS (SELECT doc_id,
              unnest([ws[i] || ' ' || ws[i+1] FOR i IN range(1, len(ws))]) AS b
       FROM w),
bgc AS (SELECT doc_id, b, COUNT(*) AS c FROM bg GROUP BY doc_id, b),
bs AS (SELECT doc_id, MAX(c) AS top_bigram_n FROM bgc GROUP BY doc_id)
SELECT s.doc_id, CAST(n_words AS BIGINT) AS n_words,
       CAST(n_distinct AS BIGINT) AS n_distinct,
       CAST(top_word_n AS BIGINT) AS top_word_n,
       CAST(COALESCE(bs.top_bigram_n, 0) AS BIGINT) AS top_bigram_n,
       CAST(n_words - n_distinct AS DOUBLE) / n_words AS dup_word_frac
FROM s LEFT JOIN bs USING (doc_id)""",
)
def text_repetition(sf_dir: str):
    """Gopher-style repetition quality signals, fully vectorized:
    per-doc word count, distinct-word count, modal-word count,
    modal-BIGRAM count and duplicate-word fraction.

    Per-doc statistics need only doc-local data, so every batch is
    independent (zero shuffle). The kernel dictionary-encodes the
    flattened word array once, then does all counting in numpy integer
    space: (doc, word) pair codes → ``np.unique`` with counts →
    ``bincount``/``maximum.at`` per doc; bigrams pair adjacent word
    codes with document boundaries masked. No Python-per-row anywhere.
    """
    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd

    def rep(b: pa.Table) -> pa.Table:
        n_docs = b.num_rows
        if n_docs == 0:
            return pa.table({
                "doc_id": b["doc_id"],
                "n_words": pa.array([], pa.int64()),
                "n_distinct": pa.array([], pa.int64()),
                "top_word_n": pa.array([], pa.int64()),
                "top_bigram_n": pa.array([], pa.int64()),
                "dup_word_frac": pa.array([], pa.float64()),
            })
        split = pc.split_pattern(b["text"].combine_chunks(), " ")
        lens = np.asarray(pc.list_value_length(split), dtype=np.int64)
        flat = split.flatten().dictionary_encode()
        codes = np.asarray(flat.indices, dtype=np.int64)
        vocab = len(flat.dictionary)
        doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), lens)

        up, cnt = np.unique(doc_idx * vocab + codes, return_counts=True)
        pair_doc = up // vocab
        n_words = np.bincount(doc_idx, minlength=n_docs)
        n_distinct = np.bincount(pair_doc, minlength=n_docs)
        top_word = np.zeros(n_docs, dtype=np.int64)
        np.maximum.at(top_word, pair_doc, cnt)

        same = doc_idx[:-1] == doc_idx[1:]  # mask document boundaries
        bg_doc = doc_idx[:-1][same]
        bg_code = (codes[:-1] * vocab + codes[1:])[same]
        ub, inv = np.unique(bg_code, return_inverse=True)
        nb = max(len(ub), 1)
        up2, cnt2 = np.unique(bg_doc * nb + inv, return_counts=True)
        top_bigram = np.zeros(n_docs, dtype=np.int64)
        np.maximum.at(top_bigram, up2 // nb, cnt2)

        dup_frac = (n_words - n_distinct).astype(np.float64) / n_words
        return pa.table({
            "doc_id": b["doc_id"],
            "n_words": pa.array(n_words),
            "n_distinct": pa.array(n_distinct),
            "top_word_n": pa.array(top_word),
            "top_bigram_n": pa.array(top_bigram),
            "dup_word_frac": pa.array(dup_frac),
        })

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return ds.map_batches(rep, batch_format="pyarrow", batch_size=None)


@query(
    "text_lm_score",
    """
WITH words AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
               FROM documents),
vc AS (SELECT w, COUNT(*) AS c FROM words GROUP BY w),
tot AS (SELECT SUM(c) AS n FROM vc)
SELECT doc_id, COUNT(*) AS n_words,
       CAST(ROUND(-1e6 * AVG(ln(vc.c / tot.n))) AS BIGINT) AS nll_micro
FROM words JOIN vc USING (w) CROSS JOIN tot
GROUP BY doc_id""",
)
def text_lm_score(sf_dir: str):
    """Corpus-LM quality scoring (CCNet-style perplexity filtering):
    per-doc mean negative log-likelihood under a unigram LM trained on
    the corpus itself.

    Two passes, both shuffle-light: (1) global word counts via the
    hash-partitioned distributed aggregate (vocab-cardinality exchange,
    not corpus-size); the fitted table — vocab + log-probs, the "model"
    — is broadcast once via ``ray.put``. (2) every batch scores its own
    docs: dictionary-encode, one ``np.searchsorted`` vocab lookup, one
    ``bincount`` segment-sum per doc. At real scale the vocab table is
    capped top-K + UNK mass (standard LM practice); here the synthetic
    vocab is tiny so the exact table ships whole.
    """
    import numpy as np
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate_ds

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def words(b: pa.Table) -> pa.Table:
        split = pc.split_pattern(b["text"].combine_chunks(), " ")
        flat = split.flatten().dictionary_encode()
        codes = np.asarray(flat.indices, dtype=np.int64)
        uc, cnt = np.unique(codes, return_counts=True)
        return pa.table({
            "w": flat.dictionary.take(pa.array(uc)),
            "c": pa.array(cnt, pa.int64()),
        })

    vc = grouped_aggregate_ds(
        ds.map_batches(words, batch_format="pyarrow", batch_size=None),
        ["w"], [("c", "sum", "c")],
    ).to_pandas()
    vocab = np.array(vc["w"], dtype=object)
    order = np.argsort(vocab)
    vocab = vocab[order]
    counts = vc["c"].to_numpy()[order].astype(np.float64)
    logp = np.log(counts / counts.sum())
    model = (vocab.astype("U"), logp)
    model_ref = ray.put(model) if ray.is_initialized() else model

    def score(b: pa.Table) -> pa.Table:
        vocab_, logp_ = (ray.get(model_ref)
                         if ray.is_initialized() else model_ref)
        n_docs = b.num_rows
        split = pc.split_pattern(b["text"].combine_chunks(), " ")
        lens = np.asarray(pc.list_value_length(split), dtype=np.int64)
        flat = split.flatten().dictionary_encode()
        codes = np.asarray(flat.indices, dtype=np.int64)
        dict_words = np.asarray(flat.dictionary, dtype="U")
        dict_logp = logp_[np.searchsorted(vocab_, dict_words)]
        doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
        ll = np.bincount(doc_idx, weights=dict_logp[codes],
                         minlength=n_docs)
        nll = -ll / np.maximum(lens, 1)
        return pa.table({
            "doc_id": b["doc_id"],
            "n_words": pa.array(lens),
            "nll_micro": pa.array(np.round(1e6 * nll).astype(np.int64)),
        })

    return ds.map_batches(score, batch_format="pyarrow", batch_size=None)


# --------------------------------------------------------------------------
# Training-data ops: deduplication
# --------------------------------------------------------------------------

@query(
    "dedup_incremental",
    """
SELECT b.doc_id FROM documents b
WHERE b.doc_id % 3 <> 0 AND NOT EXISTS (
  SELECT 1 FROM documents a
  WHERE a.doc_id % 3 = 0
    AND substr(a.text, 1, 40) = substr(b.text, 1, 40))""",
)
def dedup_incremental(sf_dir: str):
    """Incremental (cross-corpus) dedup: drop incoming docs whose
    content key already exists in a reference corpus — the "dedup new
    crawl against what we already trained on" operation. Reference =
    ``doc_id % 3 == 0``, incoming = the rest; key = 128-bit xxhash of
    the 40-char content prefix (prefix collisions exist in the fixture,
    so the path is genuinely exercised).

    Scale shape — a symmetric bloom-join: (1) a Bloom filter over the
    reference keys is built DISTRIBUTED (one m/8-byte bitmap partial
    per block, OR-merged — exchange volume independent of corpus size)
    and broadcast via ``ray.put``; incoming batches probe it
    vectorized, and bloom-NEGATIVE rows (definitely new) stream
    straight to the output. (2) The positive sliver is verified
    exactly: a second bloom built over the candidates prunes the
    reference side to possibly-matching keys, then both tiny sides
    co-group inside hash partitions (``partitioned_group_apply`` —
    complete key groups per partition, one vectorized membership pass;
    no acero join, which mis-handles empty shuffle partitions). The
    verify exchange is bounded by candidate volume + the FP slivers,
    never by either corpus. Exactness is restored by the verify, so
    the oracle is the exact NOT EXISTS.
    """
    import numpy as np
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    from raylog.functions.agg import partitioned_group_apply
    from raylog.functions.dedup import add_content_h128
    from raylog.functions.sketch import bloom_build, bloom_probe

    M_BITS, K = 1 << 20, 4

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def keyed(b: pa.Table) -> pa.Table:
        pref = pc.utf8_slice_codeunits(b["text"].combine_chunks(), 0, 40)
        t = pa.table({"doc_id": b["doc_id"], "prefix": pref})
        return add_content_h128(t, "prefix").select(
            ["doc_id", "content_h1", "content_h2"])

    def side(b: pa.Table, ref_side: bool) -> pa.Table:
        ids = np.asarray(b["doc_id"].combine_chunks(), dtype=np.int64)
        m = (ids % 3 == 0) if ref_side else (ids % 3 != 0)
        return b.filter(pa.array(m))

    keys = ds.map_batches(keyed, batch_format="pyarrow", batch_size=None)
    ref = keys.map_batches(lambda b: side(b, True),
                           batch_format="pyarrow", batch_size=None)
    inc = keys.map_batches(lambda b: side(b, False),
                           batch_format="pyarrow", batch_size=None)

    bloom = bloom_build(ref, m_bits=M_BITS, k=K)
    bloom_ref = ray.put(bloom) if ray.is_initialized() else bloom

    def probe(b: pa.Table) -> pa.Table:
        bl = (ray.get(bloom_ref) if ray.is_initialized() else bloom_ref)
        h1 = np.asarray(b["content_h1"].combine_chunks()).astype(np.uint64)
        h2 = np.asarray(b["content_h2"].combine_chunks()).astype(np.uint64)
        return b.append_column(
            "maybe", pa.array(bloom_probe(h1, h2, bl, M_BITS, K)))

    flagged = inc.map_batches(probe, batch_format="pyarrow", batch_size=None)
    negatives = flagged.map_batches(
        lambda b: b.filter(pc.invert(b["maybe"])).select(["doc_id"]),
        batch_format="pyarrow", batch_size=None)
    candidates = flagged.map_batches(
        lambda b: b.filter(b["maybe"]).select(
            ["doc_id", "content_h1", "content_h2"]),
        batch_format="pyarrow", batch_size=None)

    # symmetric reduction: prune the reference side to keys that might
    # match a candidate, via a bloom over the candidates themselves
    cand_bloom = bloom_build(candidates, m_bits=M_BITS, k=K)
    cb_ref = ray.put(cand_bloom) if ray.is_initialized() else cand_bloom

    def ref_prune(b: pa.Table) -> pa.Table:
        bl = (ray.get(cb_ref) if ray.is_initialized() else cb_ref)
        h1 = np.asarray(b["content_h1"].combine_chunks()).astype(np.uint64)
        h2 = np.asarray(b["content_h2"].combine_chunks()).astype(np.uint64)
        keep = bloom_probe(h1, h2, bl, M_BITS, K)
        return pa.table({
            "doc_id": pa.nulls(int(keep.sum()), pa.int64()),
            "content_h1": b["content_h1"].combine_chunks().filter(pa.array(keep)),
            "content_h2": b["content_h2"].combine_chunks().filter(pa.array(keep)),
            "is_ref": pa.nulls(int(keep.sum()), pa.int8()).fill_null(1),
        })

    ref_pruned = ref.map_batches(ref_prune, batch_format="pyarrow",
                                 batch_size=None)
    cand_m = candidates.map_batches(
        lambda b: b.append_column(
            "is_ref", pa.nulls(b.num_rows, pa.int8()).fill_null(0)),
        batch_format="pyarrow", batch_size=None)

    def verify(part: pa.Table) -> pa.Table:
        h1 = np.asarray(part["content_h1"].combine_chunks()).astype(np.uint64)
        h2 = np.asarray(part["content_h2"].combine_chunks()).astype(np.uint64)
        is_ref = np.asarray(part["is_ref"].combine_chunks(), dtype=np.int8)
        key = np.empty(len(h1), dtype=[("a", np.uint64), ("b", np.uint64)])
        key["a"], key["b"] = h1, h2
        _, inv = np.unique(key, return_inverse=True)
        in_ref = np.bincount(inv, weights=is_ref) > 0
        keep = (is_ref == 0) & ~in_ref[inv]
        return part.filter(pa.array(keep)).select(["doc_id"])

    verified = partitioned_group_apply(
        cand_m.union(ref_pruned), ["content_h1", "content_h2"], verify,
        num_partitions=8)
    return negatives.union(verified)


@query(
    "dedup_substring_coverage",
    """
WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
wins AS (
  SELECT doc_id,
         array_to_string(w[CAST(i AS INT):CAST(i + 7 AS INT)], ' ') AS gram
  FROM words, LATERAL (
    SELECT unnest(generate_series(1, len(w) - 7)) AS i
  ) g
),
gd AS (SELECT gram, COUNT(DISTINCT doc_id) AS nd FROM wins GROUP BY 1)
SELECT w.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_windows,
       CAST(SUM(CASE WHEN gd.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS dup_windows
FROM wins w JOIN gd USING (gram)
GROUP BY 1""",
)
def dedup_substring_coverage(sf_dir: str):
    """Exact substring dedup signal (Lee et al. 2022): per doc, how many
    of its 8-word windows occur verbatim in >= 2 distinct docs — the
    coverage a curation pass thresholds to drop or trim
    boilerplate-heavy documents. One hash exchange end to end: rolling
    window hashes partition by gram, distinct-doc counts + per-doc
    partials compute inside each partition, partials combine in the
    hash-partitioned aggregate."""
    import ray.data as rd

    from raylog.functions.dedup import substring_duplicate_coverage

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return substring_duplicate_coverage(ds, n=8, min_docs=2)


@query(
    "dedup_duplicate_spans",
    """
WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
wins AS (
  SELECT doc_id, i,
         array_to_string(w[CAST(i AS INT):CAST(i + 7 AS INT)], ' ') AS gram
  FROM words, LATERAL (
    SELECT unnest(generate_series(1, len(w) - 7)) AS i
  ) g
),
gd AS (SELECT gram, COUNT(DISTINCT doc_id) AS nd FROM wins GROUP BY 1),
dup AS (SELECT doc_id, i FROM wins JOIN gd USING (gram) WHERE nd >= 2),
isl AS (
  SELECT doc_id, i,
         CASE WHEN i - LAG(i) OVER (PARTITION BY doc_id ORDER BY i) <= 8
              THEN 0 ELSE 1 END AS brk
  FROM dup
),
grp AS (
  SELECT doc_id, i,
         SUM(brk) OVER (PARTITION BY doc_id ORDER BY i
                        ROWS UNBOUNDED PRECEDING) AS isl_id
  FROM isl
)
SELECT doc_id,
       CAST(MIN(i) - 1 AS BIGINT) AS span_start,
       CAST(MAX(i) + 8 - MIN(i) AS BIGINT) AS span_len
FROM grp GROUP BY doc_id, isl_id""",
)
def dedup_duplicate_spans(sf_dir: str):
    """Exact substring dedup, TRIM form (Lee et al. 2022 §4): the
    maximal word ranges of each doc covered by 8-word windows that
    occur verbatim in >= 2 distinct docs — the ranges a curation pass
    cuts out instead of dropping the doc. Islands-and-gaps over
    duplicated window starts, all three passes hash-partitioned."""
    import ray.data as rd

    from raylog.functions.dedup import duplicate_spans

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return duplicate_spans(ds, n=8, min_docs=2)


@query(
    "dedup_trim_spans",
    """
WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
wins AS (
  SELECT doc_id, i,
         array_to_string(w[CAST(i AS INT):CAST(i + 7 AS INT)], ' ') AS gram
  FROM words, LATERAL (
    SELECT unnest(generate_series(1, len(w) - 7)) AS i
  ) g
),
gd AS (SELECT gram, COUNT(DISTINCT doc_id) AS nd FROM wins GROUP BY 1),
dup AS (SELECT doc_id, i FROM wins JOIN gd USING (gram) WHERE nd >= 2),
pos AS (
  SELECT doc_id, j, w[CAST(j AS INT)] AS word
  FROM words, LATERAL (
    SELECT unnest(generate_series(1, len(w))) AS j
  ) g
),
kept AS (
  SELECT p.doc_id, p.j, p.word
  FROM pos p
  WHERE NOT EXISTS (
    SELECT 1 FROM dup d
    WHERE d.doc_id = p.doc_id AND p.j >= d.i AND p.j < d.i + 8
  )
)
SELECT d.doc_id,
       coalesce(k.text_trimmed, '') AS text_trimmed,
       CAST(len(string_split(d.text, ' ')) - coalesce(k.n_kept, 0)
            AS BIGINT) AS n_removed
FROM documents d LEFT JOIN (
  SELECT doc_id, array_to_string(array_agg(word ORDER BY j), ' ')
           AS text_trimmed,
         COUNT(*) AS n_kept
  FROM kept GROUP BY doc_id
) k USING (doc_id)""",
)
def dedup_trim_spans(sf_dir: str):
    """APPLY the exact-substring trim: the corpus with every
    cross-doc-duplicated 8-word range removed (the keep-one-remove-rest
    output of Lee et al. 2022 at span granularity — here all duplicated
    occurrences are cut; a keep-one policy is one extra min-doc rank).
    Word surgery is vectorized: interval removals scatter into a diff
    array, the kept words re-offset through one ListArray +
    binary_join."""
    import ray.data as rd

    from raylog.functions.dedup import trim_duplicate_spans

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return trim_duplicate_spans(ds, n=8, min_docs=2)


@query(
    "dedup_trim_keep_one",
    """
WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
wins AS (
  SELECT doc_id, i,
         array_to_string(w[CAST(i AS INT):CAST(i + 7 AS INT)], ' ') AS gram
  FROM words, LATERAL (
    SELECT unnest(generate_series(1, len(w) - 7)) AS i
  ) g
),
gstat AS (
  SELECT gram, COUNT(DISTINCT doc_id) AS nd FROM wins GROUP BY 1
),
ranked AS (
  SELECT w.doc_id, w.i, g.nd,
         ROW_NUMBER() OVER (PARTITION BY w.gram
                            ORDER BY w.doc_id, w.i) AS occ_rank
  FROM wins w JOIN gstat g USING (gram)
),
dup AS (
  SELECT doc_id, i FROM ranked WHERE nd >= 2 AND occ_rank > 1
),
pos AS (
  SELECT doc_id, j, w[CAST(j AS INT)] AS word
  FROM words, LATERAL (
    SELECT unnest(generate_series(1, len(w))) AS j
  ) g
),
kept AS (
  SELECT p.doc_id, p.j, p.word
  FROM pos p
  WHERE NOT EXISTS (
    SELECT 1 FROM dup d
    WHERE d.doc_id = p.doc_id AND p.j >= d.i AND p.j < d.i + 8
  )
)
SELECT d.doc_id,
       coalesce(k.text_trimmed, '') AS text_trimmed,
       CAST(len(string_split(d.text, ' ')) - coalesce(k.n_kept, 0)
            AS BIGINT) AS n_removed
FROM documents d LEFT JOIN (
  SELECT doc_id, array_to_string(array_agg(word ORDER BY j), ' ')
           AS text_trimmed,
         COUNT(*) AS n_kept
  FROM kept GROUP BY doc_id
) k USING (doc_id)""",
)
def dedup_trim_keep_one(sf_dir: str):
    """keep-one-remove-rest span trim (the literal Lee et al. 2022
    policy): the globally first occurrence of each duplicated 8-word
    passage (min doc_id, then min position) survives; every other
    occurrence is cut. The exemption is computed inside the gram's hash
    partition — a gram's occurrences are co-located by construction."""
    import ray.data as rd

    from raylog.functions.dedup import trim_duplicate_spans

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return trim_duplicate_spans(ds, n=8, min_docs=2, keep="first")


@query(
    "curation_trim_repack",
    """
WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
wins AS (
  SELECT doc_id, i,
         array_to_string(w[CAST(i AS INT):CAST(i + 7 AS INT)], ' ') AS gram
  FROM words, LATERAL (
    SELECT unnest(generate_series(1, len(w) - 7)) AS i
  ) g
),
gd AS (SELECT gram, COUNT(DISTINCT doc_id) AS nd FROM wins GROUP BY 1),
dup AS (SELECT doc_id, i FROM wins JOIN gd USING (gram) WHERE nd >= 2),
pos AS (
  SELECT doc_id, j
  FROM words, LATERAL (
    SELECT unnest(generate_series(1, len(w))) AS j
  ) g
),
keptc AS (
  SELECT p.doc_id, COUNT(*) AS n_kept
  FROM pos p
  WHERE NOT EXISTS (
    SELECT 1 FROM dup d
    WHERE d.doc_id = p.doc_id AND p.j >= d.i AND p.j < d.i + 8
  )
  GROUP BY p.doc_id
),
t2 AS (
  SELECT d.doc_id, d.doc_id % 8 AS shard,
         CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_tok2
  FROM documents d LEFT JOIN keptc k USING (doc_id)
),
c AS (
  SELECT shard, doc_id, n_tok2,
         SUM(n_tok2) OVER (PARTITION BY shard ORDER BY doc_id
                           ROWS UNBOUNDED PRECEDING) AS cum
  FROM t2
)
SELECT shard, doc_id, n_tok2,
       CAST((cum - n_tok2) // 512 AS BIGINT) AS first_pack,
       CAST(CASE WHEN n_tok2 > 0 THEN (cum - 1) // 512
            ELSE (cum - n_tok2) // 512 END AS BIGINT) AS last_pack
FROM c""",
)
def curation_trim_repack(sf_dir: str):
    """Composite curation chain over the round-3 operators: exact
    substring TRIM (all duplicated 8-word ranges removed) → re-count
    tokens on the trimmed text → REPACK into 512-token windows — the
    point being that dedup changes token counts, so window assignments
    must be recomputed downstream of it. Each stage keeps its
    distributed shape (trim's two hash exchanges, packing's per-shard
    closed form); the oracle replays the whole chain in one SQL
    statement."""
    import numpy as np

    import pyarrow.compute as pc
    import ray.data as rd

    from raylog.functions.dedup import trim_duplicate_spans
    from raylog.functions.packing import pack_chunks

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    trimmed = trim_duplicate_spans(ds, n=8, min_docs=2)

    def recount(b: pa.Table) -> pa.Table:
        txt = b["text_trimmed"].combine_chunks()
        n2 = np.asarray(pc.list_value_length(
            pc.split_pattern(txt, pattern=" ")), dtype=np.int64)
        empty = np.asarray(pc.equal(txt, ""), dtype=bool)
        n2 = np.where(empty, 0, n2)
        return pa.table({
            "doc_id": b["doc_id"],
            "n_tok2": pa.array(n2),
        })

    counted = trimmed.map_batches(recount, batch_format="pyarrow",
                                  batch_size=None)
    packed = pack_chunks(counted, id_col="doc_id", len_col="n_tok2",
                         max_tokens=512, num_shards=8, num_partitions=8,
                         keep_len=True)
    return packed.map_batches(
        lambda b: b.drop_columns(["first_offset"]),
        batch_format="pyarrow", batch_size=None)


@query(
    "corpus_snapshot_diff",
    """
WITH b AS (
  SELECT doc_id, CASE WHEN doc_id % 7 = 0 THEN text || ' v2'
                      ELSE text END AS text
  FROM documents WHERE doc_id % 11 <> 0
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, 'new ' || text AS text
  FROM documents WHERE doc_id % 13 = 0
)
SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
       CASE WHEN a.doc_id IS NULL THEN 'added'
            WHEN b.doc_id IS NULL THEN 'removed'
            WHEN a.text = b.text THEN 'same'
            ELSE 'changed' END AS status
FROM documents a FULL OUTER JOIN b USING (doc_id)""",
)
def corpus_snapshot_diff(sf_dir: str):
    """Snapshot diff: per doc id, added / removed / changed / same
    between corpus v1 (the documents table) and a deterministic v2
    (docs %11 dropped, %7 text-edited, %13 re-added under new ids) —
    the primitive an incremental curation run uses to process only the
    delta. Hash-only exchange (~24 B/doc), content never moves."""
    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd

    from raylog.functions.dedup import snapshot_diff

    a = rd.read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "text"])

    def to_v2(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["doc_id"].combine_chunks(), dtype=np.int64)
        txt = batch["text"].combine_chunks()
        keep = ids % 11 != 0
        edited = pc.if_else(
            pa.array(ids % 7 == 0),
            pc.binary_join_element_wise(txt, pa.scalar(" v2"), ""),
            txt)
        kept = pa.table({"doc_id": pa.array(ids),
                         "text": edited}).filter(pa.array(keep))
        newm = ids % 13 == 0
        new = pa.table({
            "doc_id": pa.array(ids[newm] + 1_000_000),
            "text": pc.binary_join_element_wise(
                pa.scalar("new "), txt.filter(pa.array(newm)), ""),
        })
        return pa.concat_tables([kept, new])

    b = a.map_batches(to_v2, batch_format="pyarrow", batch_size=None)
    return snapshot_diff(a, b)


@query(
    "dedup_token_substring",
    _P() + """
, wins AS (
  SELECT doc_id,
         array_to_string(tokens[CAST(i AS INT):CAST(i + 7 AS INT)], ',')
           AS gram
  FROM recs2, LATERAL (
    SELECT unnest(generate_series(1, len(tokens) - 7)) AS i
  ) g
),
gd AS (SELECT gram, COUNT(DISTINCT doc_id) AS nd FROM wins GROUP BY 1)
SELECT w.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_windows,
       CAST(SUM(CASE WHEN gd.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS dup_windows
FROM wins w JOIN gd USING (gram)
GROUP BY 1""",
)
def dedup_token_substring(sf_dir: str):
    """Exact substring dedup on the PRE-TOKENIZED payload: duplicated
    8-TOKEN windows of the sequences table's `tokens` arrays (the
    input_hint column), no word hashing at all — windows slide over the
    raw int32 ids. Same one-exchange shape as the text form
    (`dedup_substring_coverage` with token_col)."""
    from raylog.functions.dedup import substring_duplicate_coverage
    from raylog.pipelines import log_pipeline as LP

    ds = LP.records_ds(sf_dir).select_columns(["doc_id", "tokens"])
    return substring_duplicate_coverage(ds, token_col="tokens", n=8,
                                        min_docs=2)


@query(
    "dedup_exact_sequences",
    _P() + """
SELECT MIN(doc_id) AS doc_id FROM recs2 GROUP BY tokens""",
)
def dedup_exact_sequences(sf_dir: str):
    """Exact dedup of identical TOKEN SEQUENCES — the payload-axis
    form of keep-first dedup: the oracle groups by the list itself,
    the engine exchanges two vectorized 64-bit polynomial sequence
    hashes per row (never the arrays) and keep-firsts through the
    hash-partitioned aggregate."""
    from raylog.functions.tokens import dedup_sequences
    from raylog.pipelines import log_pipeline as LP

    ds = LP.records_ds(sf_dir).select_columns(["doc_id", "tokens"])
    return dedup_sequences(ds)


@query(
    "dedup_exact",
    "SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text",
)
def dedup_exact(sf_dir: str):
    """Exact dedup survivors: hash-partitioned keep-first (min doc_id)."""
    import ray.data as rd

    from raylog.functions.dedup import exact_dedup_survivors

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return exact_dedup_survivors(ds)


@query(
    "dedup_ngram_pairs",
    """
WITH docs AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS (SELECT DISTINCT doc_id,
              list_extract(w, i) || ' ' || list_extract(w, i+1) || ' ' || list_extract(w, i+2) AS g
       FROM docs, UNNEST(generate_series(1, len(w) - 2)) AS t(i)
       WHERE len(w) >= 3),
sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
          FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2)
SELECT doc_a, doc_b,
       CAST(FLOOR(1000 * (c * 1.0 / (x.n + y.n - c))) AS BIGINT) AS jacc_milli
FROM inter JOIN sz x ON doc_a = x.doc_id JOIN sz y ON doc_b = y.doc_id
WHERE c * 1.0 / (x.n + y.n - c) >= 0.3""",
)
def dedup_ngram_pairs(sf_dir: str):
    """Exact n-gram Jaccard near-dup pairs (J >= 0.3, word 3-grams) via a
    distributed inverted shingle index."""
    import ray.data as rd

    from raylog.functions.dedup import ngram_jaccard_pairs

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ngram_jaccard_pairs(ds, threshold=0.3)


_NGRAM_PAIRS_CTE = """
docs AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS (SELECT DISTINCT doc_id,
              list_extract(w, i) || ' ' || list_extract(w, i+1) || ' ' || list_extract(w, i+2) AS g
       FROM docs, UNNEST(generate_series(1, len(w) - 2)) AS t(i)
       WHERE len(w) >= 3),
sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
          FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2),
np AS (SELECT doc_a, doc_b FROM inter
       JOIN sz x ON doc_a = x.doc_id JOIN sz y ON doc_b = y.doc_id
       WHERE c * 1.0 / (x.n + y.n - c) >= 0.3),
edges AS (SELECT doc_a AS ea, doc_b AS eb FROM np
          UNION SELECT doc_b, doc_a FROM np),
reach(ra, rb) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT r.ra, e.eb FROM reach r JOIN edges e ON r.rb = e.ea
),
cc AS (SELECT ra AS doc_id, MIN(rb) AS cluster_id FROM reach GROUP BY ra)"""


@query(
    "dedup_cc_clusters",
    "WITH RECURSIVE " + _NGRAM_PAIRS_CTE + """
SELECT doc_id, cluster_id FROM cc""",
)
def dedup_cc_clusters(sf_dir: str):
    """Dedup cluster resolution: distributed connected components
    (iterative min-label propagation — join + min-aggregate per round)
    over the exact n-gram near-dup pair graph. cluster_id = min doc_id
    in the component; singletons label themselves."""
    import ray.data as rd

    from raylog.functions.cc import connected_components
    from raylog.functions.dedup import ngram_jaccard_pairs

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    pairs = ngram_jaccard_pairs(docs, threshold=0.3)
    return connected_components(docs.select_columns(["doc_id"]), pairs)


@query(
    "dedup_cc_corpus",
    "WITH RECURSIVE " + _NGRAM_PAIRS_CTE + """
SELECT d.doc_id, d.source, d.n_chars
FROM documents d JOIN cc ON d.doc_id = cc.doc_id
WHERE cc.doc_id = cc.cluster_id""",
)
def dedup_cc_corpus(sf_dir: str):
    """Curated corpus after near-dup clustering: keep the min-doc_id
    representative of every cluster (hash join back to the doc table)."""
    import ray.data as rd

    from raylog.functions.cc import connected_components, dedup_survivors
    from raylog.functions.dedup import ngram_jaccard_pairs

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text", "source", "n_chars"])
    pairs = ngram_jaccard_pairs(
        docs.select_columns(["doc_id", "text"]), threshold=0.3)
    clusters = connected_components(docs.select_columns(["doc_id"]), pairs)
    out = dedup_survivors(
        docs.select_columns(["doc_id", "source", "n_chars"]), clusters)
    return out.select_columns(["doc_id", "source", "n_chars"])


@query("dedup_minhash_pairs", None)  # rows-only: probabilistic banding
def dedup_minhash_pairs(sf_dir: str):
    """MinHash+LSH near-dup pairs (64 hashes, 16 bands), Jaccard-verified.
    Non-SQL (seeded permutations); recall vs the exact baseline asserted
    in pytest."""
    import ray.data as rd

    from raylog.functions.dedup import minhash_lsh_pairs

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return minhash_lsh_pairs(ds, threshold=0.3)


@query("dedup_simhash_pairs", None)  # rows-only: probabilistic banding
def dedup_simhash_pairs(sf_dir: str):
    """SimHash near-dup pairs (64-bit, 4x16 banding, Hamming <= 4).

    Banding guarantees recall only for distance <= 3 (pigeonhole over 4
    bands); beyond that candidates are probabilistic. The synthetic docs
    share a 30-word vocabulary, so distances are compressed vs natural
    corpora — the tight threshold keeps the pair set meaningful."""
    import ray.data as rd

    from raylog.functions.dedup import simhash_pairs

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return simhash_pairs(ds, max_hamming=4)


@query(
    "dedup_embed_pairs",
    """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       CAST(ROUND(1000 * list_cosine_similarity(a.v, b.v)) AS BIGINT) AS cos_milli
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.v, b.v) >= 0.4""",
)
def dedup_embed_pairs(sf_dir: str):
    """Embedding-cosine near-dup pairs (cos >= 0.4, float64 matmul vs a
    broadcast normalized corpus)."""
    import numpy as np
    import ray.data as rd

    import pyarrow.parquet as pq

    from raylog.functions.dedup import embedding_near_dup_pairs

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    # parquet metadata row count: no extra ds.count() pass for the
    # broadcast-vs-bucketed path choice
    n_rows = pq.read_metadata(f"{sf_dir}/embeddings.parquet").num_rows
    tbl = embedding_near_dup_pairs(ds, threshold=0.4, n_rows=n_rows)
    return tbl


@query(
    "corpus_curation",
    """
WITH q AS (
  SELECT doc_id, source, text,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
         CAST(len(list_filter(string_split(text, ' '),
                              w -> w IN ('the', 'a'))) AS BIGINT) AS stop_hits
  FROM documents
), scored AS (
  SELECT doc_id, source,
         CAST(FLOOR(1000 * (0.5 * LEAST(n_words / 40.0, 1.0)
                            + 0.5 * (1.0 - stop_hits * 1.0 / n_words))) AS BIGINT)
           AS score_milli
  FROM q
), survivors AS (
  SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text
)
SELECT s.doc_id, s.source, s.score_milli
FROM scored s JOIN survivors v USING (doc_id)
WHERE s.score_milli >= 900""",
)
def corpus_curation(sf_dir: str):
    """Composite curation pipeline (the training-data flagship): quality
    scoring (vectorized) → threshold filter → exact-dedup SEMI-JOIN
    (keep-first survivors via the hash-partitioned aggregate, joined
    back without any driver-side id set). The shape a 100 TB curation
    run uses: every stage streams, the only exchanges are the dedup key
    shuffle and the survivor hash join."""
    import ray.data as rd

    from raylog.functions.dedup import exact_dedup_survivors
    from raylog.functions.text import quality_scores

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "source", "text"])
    scored = ds.map_batches(quality_scores, batch_format="pyarrow",
                            batch_size=None)

    def keep(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        m = pc.greater_equal(b["score_milli"], pa.scalar(900, pa.int64()))
        return b.filter(m).select(["doc_id", "source", "score_milli"])

    scored = scored.map_batches(keep, batch_format="pyarrow", batch_size=None)
    survivors = exact_dedup_survivors(ds.select_columns(["doc_id", "text"]))
    return scored.join(survivors, join_type="inner", num_partitions=8,
                       on=("doc_id",))


@query("dedup_embed_pairs_bucketed", None)  # rows-only: approximate scale path
def dedup_embed_pairs_bucketed(sf_dir: str):
    """Embedding near-dup SCALE path forced on (centroid buckets,
    exact-within-bucket, top-2 multi-assignment) — pairs are a subset of
    the brute-force result with identical cosines; recall asserted in
    pytest."""
    import ray.data as rd

    import pyarrow.parquet as pq

    from raylog.functions.dedup import embedding_near_dup_pairs

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    n_rows = pq.read_metadata(f"{sf_dir}/embeddings.parquet").num_rows
    return embedding_near_dup_pairs(ds, threshold=0.4, max_broadcast_rows=10,
                                    n_clusters=8, assign_top=2, n_rows=n_rows)


# --------------------------------------------------------------------------
# Training-data ops: similarity search + multimodal
# --------------------------------------------------------------------------

@query(
    "ann_cosine_topk",
    """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT * FROM e WHERE vec_id < 5),
s AS (SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
             list_cosine_similarity(q.v, e.v) AS cos
      FROM q JOIN e ON e.vec_id <> q.vec_id),
r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cos DESC, neighbor_id) AS rank
      FROM s)
SELECT query_id, rank, neighbor_id,
       CAST(ROUND(1000000 * cos) AS BIGINT) AS cos_micro
FROM r WHERE rank <= 10""",
)
def ann_cosine_topk(sf_dir: str):
    """Exact cosine top-10 for query vectors (vec_id < 5): per-batch
    partial top-k against a broadcast query matrix, merged globally."""
    import ray.data as rd

    from raylog.functions.similarity import ann_brute_topk

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return ann_brute_topk(ds, query_ids=[0, 1, 2, 3, 4], k=10)


@query(
    "ann_filtered_topk",
    """
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT * FROM e WHERE vec_id < 5),
s AS (SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
             list_cosine_similarity(q.v, e.v) AS cos
      FROM q JOIN e ON e.vec_id <> q.vec_id AND e.label = 1),
r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cos DESC, neighbor_id) AS rank
      FROM s)
SELECT query_id, rank, neighbor_id,
       CAST(ROUND(1000000 * cos) AS BIGINT) AS cos_micro
FROM r WHERE rank <= 10""",
)
def ann_filtered_topk(sf_dir: str):
    """Metadata-filtered vector search: exact cosine top-10 restricted
    to label=1 neighbors — the attribute predicate is pushed into the
    corpus scan (filter before matmul), queries come from the unfiltered
    table."""
    import pyarrow.compute as pc
    import ray.data as rd

    from raylog.functions.similarity import ann_brute_topk

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding", "label"])
    corpus = ds.map_batches(
        lambda b: b.filter(pc.equal(b["label"], 1)).select(
            ["vec_id", "embedding"]),
        batch_format="pyarrow", batch_size=None,
    )
    return ann_brute_topk(ds, query_ids=[0, 1, 2, 3, 4], k=10,
                          corpus_ds=corpus)


@query("ann_ivf_topk", None)  # rows-only: approximate (recall vs brute in pytest)
def ann_ivf_topk(sf_dir: str):
    """IVF approximate top-10 (16 lists, nprobe=4) — the 10^9-vector
    path: corpus physically partitioned by coarse-quantizer list (cached
    on disk), probes read only their list directories."""
    import ray.data as rd

    from raylog.functions.similarity import ann_ivf_topk as ivf

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return ivf(ds, query_ids=[0, 1, 2, 3, 4], k=10,
               index_dir=f"/tmp/raylog_ivf/{_src_tag(sf_dir, 'embeddings')}_c16")


@query("ann_pq_topk", None)  # rows-only: iterative codebook training
def ann_pq_topk(sf_dir: str):
    """PQ + ADC approximate top-10 (Jégou et al. 2011): vectors
    compress to m uint8 codes and every query scores the corpus from
    an [m, ks] inner-product table — the memory-bound scale path (m
    bytes per vector in the scan instead of d floats). ADC-exactness
    and recall-vs-brute asserted in pytest."""
    import ray.data as rd

    from raylog.functions.similarity import ann_pq_topk as pq

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    return pq(ds, query_ids=[0, 1, 2, 3, 4], k=10, m=32, ks=64)


@query("ann_ivfpq_topk", None)  # rows-only: iterative training
def ann_ivfpq_topk(sf_dir: str):
    """IVF × PQ probe (FAISS-IVFPQ shape): coarse lists partition the
    corpus on disk AND store only m uint8 residual codes per vector, so
    a probe's IO is (nprobe/n_clusters) × (m/8d) of the raw volume —
    the billion-vector production index. Recall + code-only-storage
    asserted in pytest."""
    import ray.data as rd

    from raylog.functions.similarity import ann_ivfpq_topk as ivfpq

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    return ivfpq(
        ds, query_ids=[0, 1, 2, 3, 4], k=10, n_clusters=8, m=32, ks=64,
        nprobe=4,
        index_dir=f"/tmp/raylog_ivfpq/{_src_tag(sf_dir, 'embeddings')}_c8")


@query("embed_kmeans", None)  # rows-only: iterative algorithm, no SQL analog
def embed_kmeans(sf_dir: str):
    """Distributed k-means cluster assignment over the embedding column
    — the coarse partitioner behind SemDeDup-style semantic curation
    (cluster → curate within cluster) and the IVF index.

    Seeded centroids are fitted on a bounded sample (driver-side matmul
    over ≤2048 rows), broadcast once via ``ray.put``; the corpus
    streams through one vectorized assign pass per batch (matmul +
    argmax — no per-row Python, no shuffle). Deterministic: same seed →
    same assignment (asserted in pytest, with cluster balance)."""
    import numpy as np
    import ray
    import ray.data as rd

    from raylog.functions.similarity import _kmeans, _to_matrix

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    sample = pa.concat_tables(list(
        ds.limit(2048).map_batches(
            lambda b: b.select(["vec_id", "embedding"]),
            batch_format="pyarrow", batch_size=None,
        ).iter_batches(batch_format="pyarrow", batch_size=None)))
    # block arrival order is nondeterministic — canonicalize by id so the
    # seeded centroid init (row-index based) is run-stable
    sample = sample.sort_by("vec_id")
    cents = _kmeans(_to_matrix(sample, "embedding"), n_clusters=8)
    cents_ref = ray.put(cents) if ray.is_initialized() else cents

    def assign(b: pa.Table) -> pa.Table:
        c = (ray.get(cents_ref) if ray.is_initialized() else cents_ref)
        m = _to_matrix(b, "embedding")
        sims = m @ c.T
        cl = sims.argmax(axis=1).astype(np.int32)
        return pa.table({
            "vec_id": b["vec_id"],
            "cluster": pa.array(cl),
            "cos_to_centroid_milli": pa.array(
                np.round(1000 * sims.max(axis=1)).astype(np.int64)),
        })

    return ds.map_batches(assign, batch_format="pyarrow", batch_size=None)


@query("mm_media_features", None)  # rows-only: binary plumbing, no SQL analog
def mm_media_features(sf_dir: str):
    """Multimodal plumbing: binary payload -> actor-pool decode (fake
    kernel) -> fixed-dim feature vector; returns typed metadata + feature
    checksum per row."""
    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd

    from raylog.functions.multimodal import media_pipeline

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = media_pipeline(ds)

    def proj(b: pa.Table) -> pa.Table:
        feats = b["features"].to_pylist()
        fsum = pa.array(
            [int(np.round(1000 * sum(f))) for f in feats], pa.int64()
        )
        return pa.table({
            "doc_id": b["doc_id"],
            "mime": b["mime"],
            "n_bytes": b["n_bytes"],
            "height": b["height"],
            "width": b["width"],
            "feat_milli_sum": fsum,
        })

    return out.map_batches(proj, batch_format="pyarrow", batch_size=None)


@query("mm_frame_sample", None)  # rows-only: binary plumbing, no SQL analog
def mm_frame_sample(sf_dir: str):
    """Multimodal video plumbing: payload → per-frame exploded rows
    (doc_id, frame_idx, frame bytes) via an actor-pool sampler with
    small-batch sizing (fake frame kernel; ffmpeg swap point)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from raylog.functions.multimodal import frame_sample_pipeline

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = frame_sample_pipeline(ds, n_frames=4)

    def proj(b: pa.Table) -> pa.Table:
        fr = b["frame"]
        fr = fr.combine_chunks() if isinstance(fr, pa.ChunkedArray) else fr
        return pa.table({
            "doc_id": b["doc_id"],
            "frame_idx": b["frame_idx"],
            "frame_bytes": pc.cast(pc.binary_length(fr), pa.int64()),
        })

    return out.map_batches(proj, batch_format="pyarrow", batch_size=None)


# --------------------------------------------------------------------------
# ECI sidecar pipeline variant + raw log-file sources
# --------------------------------------------------------------------------

@query("mm_real_decode", None)  # binary payloads: no SQL restatement
def mm_real_decode(sf_dir: str):
    """REAL multimodal decode path: deterministic P6 images + PCM16 WAV
    payloads decoded with pure numpy/stdlib codecs (no PIL/ffmpeg) —
    true dimensions, pixel means, nearest-neighbor resize. Exact decode
    values asserted in tests/test_codecs.py."""
    import ray.data as rd

    from raylog.functions.multimodal import media_pipeline_real

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"])
    cols = ["doc_id", "mime", "height", "width", "mean_px"]
    img = media_pipeline_real(docs, kind="image").select_columns(cols)
    wav = media_pipeline_real(docs, kind="audio").select_columns(cols)
    return img.union(wav)


@query(
    "logfile_jsonl",
    """
SELECT CASE WHEN doc_id % 11 <> 5 THEN doc_id END AS doc_id,
       CASE WHEN doc_id % 11 <> 5 THEN 'svc-' || (doc_id % 7) END AS svc,
       CASE WHEN doc_id % 11 <> 5 THEN doc_id % 100 END AS code,
       doc_id % 11 <> 5 AS parsed
FROM documents""",
)
def logfile_jsonl(sf_dir: str):
    """JSONL file source: newline-delimited JSON tail → typed columns
    (missing keys → null, malformed lines (doc_id%11==5 carry broken
    bodies) → parsed=false). File derived deterministically from
    documents so the oracle restates it without reading the file."""
    import os

    import pyarrow.parquet as _pq

    from raylog.sources.logfiles import read_jsonl

    path = f"/tmp/raylog_cache/jsonl_{_src_tag(sf_dir)}.jsonl"
    if not os.path.exists(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        ids = _pq.read_table(f"{sf_dir}/documents.parquet",
                             columns=["doc_id"])["doc_id"].to_pylist()
        tmp = _tmp_name(path)
        with open(tmp, "w") as f:
            for d in sorted(ids):
                if d % 11 == 5:
                    f.write('{"doc_id": %d, broken\n' % d)
                else:
                    f.write('{"doc_id": %d, "svc": "svc-%d", "code": %d}\n'
                            % (d, d % 7, d % 100))
        os.replace(tmp, path)
    return read_jsonl(path, fields=[
        ("doc_id", pa.int64()), ("svc", pa.string()), ("code", pa.int64()),
    ])


@query(
    "logfile_csv",
    """
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(value), 4) AS sum_value
FROM events GROUP BY 1""",
)
def logfile_csv(sf_dir: str):
    """CSV source: Ray's native ``read_csv`` (streaming, column-typed)
    over a deterministically exported copy of the events table, then the
    standard partial+combine aggregate — exercises a third wire format
    end-to-end (parquet / JSONL / CSV)."""
    import csv
    import os

    import pyarrow.compute as pc
    import pyarrow.parquet as _pq
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate

    path = f"/tmp/raylog_cache/events_{_src_tag(sf_dir, 'events')}.csv"
    if not os.path.exists(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        t = _pq.read_table(f"{sf_dir}/events.parquet",
                           columns=["event_id", "event_type", "value"])
        tmp = _tmp_name(path)
        with open(tmp, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["event_id", "event_type", "value"])
            for eid, et, v in zip(t["event_id"].to_pylist(),
                                  t["event_type"].to_pylist(),
                                  t["value"].to_pylist()):
                w.writerow([eid, et, repr(v)])
        os.replace(tmp, path)
    ds = rd.read_csv(path)
    out = grouped_aggregate(ds, ["event_type"], [
        ("*", "count", "n"), ("value", "sum", "sum_value"),
    ])
    return out.set_column(out.column_names.index("sum_value"), "sum_value",
                          pc.round(out["sum_value"], 4))


@query(
    "eci_enrich",
    _P() + """
SELECT r.doc_id,
       r.source AS pri_id,
       CASE WHEN s.sid % 20 <> 19
            THEN '/kubepods/besteffort/pod' || s.sid || '/' || printf('%016x', s.sid * 2654435761)
       END AS cpuset,
       CASE WHEN s.sid % 20 <> 19 THEN printf('%016x', s.sid * 2654435761)
       END AS container_id_cpuset,
       'terminus-dev' AS eci_cluster_name,
""" + ",\n".join(
        f"       '{_ECI_TAGS[k]}' AS {k}"
        for k in sorted(_ECI_TAGS) if k != "eci_cluster_name"
    ) + """
FROM recs2 r JOIN src_rank s USING (source)""",
)
def eci_enrich(sf_dir: str):
    """ECI chain: P6 log-id from the tail path, E2 cpuset broadcast
    lookup, P7 container-id regex, E3 constant tags — the reference's
    COMPLETE 20-key record_modifier set (conf/eci/fluent-bit.conf:77-99)
    — (SURVEY §3.2)."""
    from raylog.pipelines.eci_pipeline import eci_pipeline

    ds = eci_pipeline(sf_dir)
    return ds.select_columns(
        ["doc_id", "pri_id", "cpuset", "container_id_cpuset",
         "eci_cluster_name"]
        + [k for k in sorted(_ECI_TAGS) if k != "eci_cluster_name"]
    )


def _logfile_cache(sf_dir: str, fmt: str) -> str:
    """Materialize the sf's log records as a raw log file (cached)."""
    import os

    import pyarrow.parquet as pq

    from raylog import records as R
    from raylog.sources.logfiles import write_cri_log, write_docker_json_log

    os.makedirs("/tmp/raylog_logfiles", exist_ok=True)
    path = f"/tmp/raylog_logfiles/{_src_tag(sf_dir)}.{fmt}.log"
    if not os.path.exists(path):
        docs = pq.read_table(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text", "source"])
        recs = R.build_records_batch(docs)
        if fmt == "cri":
            write_cri_log(path, recs["raw"].to_pylist())
        else:
            rows = []
            for r in recs.to_pylist():
                # docker wire format: log/stream/time
                time = r["raw"].split(" ", 1)[0]
                log = r["raw"].split(" F ", 1)[1]
                rows.append({"log": log, "stream": r["stream"], "time": time})
            write_docker_json_log(path, rows)
    return path


@query(
    "logfile_cri",
    _P() + """
SELECT stream, level, request_id, log AS content FROM recs2""",
)
def logfile_cri(sf_dir: str):
    """S1/S2 tail analog: CRI-format log FILE → read_text → CRI parse →
    erda-info; round-trips the reference's wire format end-to-end."""
    from raylog.sources.logfiles import read_cri_logs
    from raylog.stages import parse

    path = _logfile_cache(sf_dir, "cri")
    ds = read_cri_logs(path)
    ds = ds.map_batches(
        lambda b: parse.erda_info(b, key="log"),
        batch_format="pyarrow", batch_size=None,
    )
    return ds.select_columns(["stream", "level", "request_id", "log"]).map_batches(
        lambda b: b.rename_columns(["stream", "level", "request_id", "content"]),
        batch_format="pyarrow", batch_size=None,
    )


@query(
    "logfile_docker",
    _P() + """
SELECT stream, log AS content, ts_ns FROM recs2""",
)
def logfile_docker(sf_dir: str):
    """P3 docker JSON-per-line log FILE → parsed record stream."""
    from raylog.sources.logfiles import read_docker_json_logs

    path = _logfile_cache(sf_dir, "docker")
    ds = read_docker_json_logs(path)
    return ds.select_columns(["stream", "log", "ts_ns"]).map_batches(
        lambda b: b.rename_columns(["stream", "content", "ts_ns"]),
        batch_format="pyarrow", batch_size=None,
    )


# --------------------------------------------------------------------------
# JSON content parse (Merge_Log analog), sampling, per-group top-k
# --------------------------------------------------------------------------

@query(
    "events_props_parse",
    """
SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k
FROM events""",
)
def events_props_parse(sf_dir: str):
    """E1 Merge_Log analog: re-parse a JSON content column into typed
    fields (vectorized regex extract for the flat case; a json.loads
    actor stage is the general path)."""
    import pyarrow.compute as pc
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "props"])

    def parse_props(b: pa.Table) -> pa.Table:
        props = b["props"]
        arr = props.combine_chunks() if isinstance(props, pa.ChunkedArray) else props
        ext = pc.extract_regex(arr, r'"k":\s*(?P<k>-?\d+)')
        k = pc.cast(pc.struct_field(ext, "k"), pa.int64())
        return pa.table({"event_id": b["event_id"], "prop_k": k})

    return ds.map_batches(parse_props, batch_format="pyarrow", batch_size=None)


@query(
    "log_merge_json",
    """
WITH j AS (
  SELECT doc_id,
         doc_id % 11 = 5 AS bad,
         '{"svc":"svc-' || (doc_id % 7) || '","code":' || (doc_id % 100)
           || CASE WHEN doc_id % 4 = 0
                   THEN ',"extra":"x-' || doc_id || '"' ELSE '' END || '}'
           AS body
  FROM documents
)
SELECT doc_id,
       CASE WHEN NOT bad THEN json_extract_string(body, '$.svc') END AS svc,
       CASE WHEN NOT bad
            THEN CAST(json_extract(body, '$.code') AS BIGINT) END AS code,
       CASE WHEN NOT bad
            THEN json_extract_string(body, '$.extra') END AS extra,
       CAST(NULL AS VARCHAR) AS absent,
       NOT bad AS parsed
FROM j""",
)
def log_merge_json(sf_dir: str):
    """E1 Merge_Log general path (conf/ds/fluent-bit.conf:50-51): a JSON
    content column re-parsed into a typed struct — arbitrary keys, a key
    missing per-row ('extra'), a key absent everywhere ('absent') → null,
    and non-JSON rows (doc_id%11==5 carry a broken body) → null struct.
    The JSON bodies are derived deterministically so DuckDB's json
    functions can restate the extraction."""
    import pyarrow.compute as pc
    import ray.data as rd

    from raylog.stages.parse import merge_log

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def mk_json(b: pa.Table) -> pa.Table:
        import numpy as np

        d = np.asarray(b["doc_id"].combine_chunks(), dtype=np.int64)
        n = len(d)

        def s(vals):
            return pa.array([str(v) for v in vals], pa.string())

        extra = pc.if_else(
            pa.array(d % 4 == 0),
            pc.binary_join_element_wise(
                pa.array([',"extra":"x-'] * n), s(d), pa.array(['"'] * n), ""
            ),
            pa.scalar("", pa.string()),
        )
        body = pc.binary_join_element_wise(
            pa.array(['{"svc":"svc-'] * n), s(d % 7),
            pa.array(['","code":'] * n), s(d % 100), extra,
            pa.array(["}"] * n), "",
        )
        body = pc.if_else(pa.array(d % 11 == 5),
                          pc.binary_join_element_wise(
                              pa.array(["not-json "] * n), body, ""),
                          body)
        return pa.table({"doc_id": b["doc_id"], "log": body})

    ds = ds.map_batches(mk_json, batch_format="pyarrow", batch_size=None)
    ds = ds.map_batches(
        lambda b: merge_log(b, key="log", fields=[
            ("svc", pa.string()), ("code", pa.int64()),
            ("extra", pa.string()), ("absent", pa.string()),
        ]),
        batch_format="pyarrow", batch_size=None,
    )

    def flatten(b: pa.Table) -> pa.Table:
        st = b["log_processed"]
        st = st.combine_chunks() if isinstance(st, pa.ChunkedArray) else st
        return pa.table({
            "doc_id": b["doc_id"],
            "svc": pc.struct_field(st, "svc"),
            "code": pc.struct_field(st, "code"),
            "extra": pc.struct_field(st, "extra"),
            "absent": pc.struct_field(st, "absent"),
            "parsed": pc.is_valid(st),
        })

    return ds.map_batches(flatten, batch_format="pyarrow", batch_size=None)


@query(
    "sample_hash",
    """
SELECT doc_id, source FROM documents
WHERE CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 10 = 0""",
)
def sample_hash(sf_dir: str):
    """Deterministic content-hash sampling (~10%): reproducible across
    engines and runs, unlike RNG sampling (which is also provided via
    ds.random_sample(seed) but is not cross-engine checkable)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "text"])

    def pick(b: pa.Table) -> pa.Table:
        import hashlib

        text = b["text"].to_pylist()
        keep = [int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % 10 == 0 for t in text]
        return b.filter(pa.array(keep)).select(["doc_id", "source"])

    return ds.map_batches(pick, batch_format="pyarrow", batch_size=None)


@query(
    "sample_stratified",
    """
SELECT doc_id, source FROM documents
WHERE CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 100
      < (ascii(right(source, 1)) % 4 + 1) * 10""",
)
def sample_stratified(sf_dir: str):
    """Stratified sampling: per-stratum (source) rates 10-40%, chosen by
    a deterministic content hash — reproducible across engines/runs and
    shuffle-free (pure per-batch filter)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "source", "text"])

    def pick(b: pa.Table) -> pa.Table:
        import hashlib

        import numpy as np

        text = b["text"].to_pylist()
        h = np.array([int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % 100
                      for t in text], dtype=np.int64)
        last = np.array([ord(s[-1]) for s in b["source"].to_pylist()],
                        dtype=np.int64)
        keep = h < (last % 4 + 1) * 10
        return b.filter(pa.array(keep)).select(["doc_id", "source"])

    return ds.map_batches(pick, batch_format="pyarrow", batch_size=None)


@query(
    "sample_group_topn",
    """
SELECT doc_id, source FROM (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY md5(text), doc_id) AS rnk
  FROM documents
) WHERE rnk <= 3""",
)
def sample_group_topn(sf_dir: str):
    """Deterministic per-group sample: the 3 docs with the smallest
    content hash per source — reproducible across runs/engines (unlike
    RNG sampling) and shuffle-light: per-batch partial top-3 per group,
    tiny k×groups merge (`topk.topk`)."""
    import hashlib

    import ray.data as rd

    from raylog.functions.topk import topk

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "source", "text"])

    def h(b: pa.Table) -> pa.Table:
        hh = [hashlib.md5(t.encode()).hexdigest()
              for t in b["text"].to_pylist()]
        return pa.table({"doc_id": b["doc_id"], "source": b["source"],
                         "h": pa.array(hh, pa.string())})

    hashed = ds.map_batches(h, batch_format="pyarrow", batch_size=None)
    out = topk(hashed, sort_cols=["h", "doc_id"], descending=[False, False],
               k=3, group_cols=["source"])
    return out.select(["doc_id", "source"])


@query(
    "sample_temperature",
    """
WITH t AS (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (PARTITION BY source
             ORDER BY md5(text || CAST(doc_id AS VARCHAR)), doc_id) AS rnk,
         COUNT(*) OVER (PARTITION BY source) AS n_s
  FROM documents
)
SELECT doc_id, source FROM t
WHERE rnk <= CAST(CEIL(4 * SQRT(n_s)) AS BIGINT)""",
)
def sample_temperature(sf_dir: str):
    """Temperature (mixture) resampling: rebalance the per-source mix to
    quota_s = ceil(4·n_s^0.5) — the alpha=0.5 temperature rule that
    flattens a zipf-skewed source distribution for training-data mixing.

    Deterministic and shuffle-free: selection is "the quota_s docs with
    the smallest salted content hash per source" — per-batch partial
    top-k per source (pruned to the max quota), then a quota-bounded
    merge; only ≤ max_quota × sources rows per block ever move. Source
    counts come from a tiny partial+combine aggregate, not a shuffle.
    """
    import hashlib
    import math

    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate
    from raylog.functions.topk import topk

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "source", "text"])
    counts = grouped_aggregate(ds, ["source"], [("*", "count", "n_s")])
    quota = {s: math.ceil(4 * math.sqrt(n)) for s, n in
             zip(counts["source"].to_pylist(), counts["n_s"].to_pylist())}
    k_max = max(quota.values(), default=0)

    def h(b: pa.Table) -> pa.Table:
        hh = [hashlib.md5((t + str(d)).encode()).hexdigest()
              for t, d in zip(b["text"].to_pylist(), b["doc_id"].to_pylist())]
        return pa.table({"doc_id": b["doc_id"], "source": b["source"],
                         "h": pa.array(hh, pa.string())})

    hashed = ds.map_batches(h, batch_format="pyarrow", batch_size=None)
    # partial top-k_max per source (superset of every per-source quota),
    # then trim each source to its own quota on the k-bounded merge
    merged = topk(hashed, sort_cols=["h", "doc_id"],
                  descending=[False, False], k=k_max,
                  group_cols=["source"], add_rank="rnk").to_pandas()
    lim = merged["source"].map(quota).to_numpy()
    keep = merged["rnk"].to_numpy() <= lim
    out = merged[keep]
    return pa.table({
        "doc_id": pa.array(out["doc_id"].to_numpy(), pa.int64()),
        "source": pa.array(out["source"].tolist(), pa.string()),
    })


@query(
    "orders_price_band",
    """
WITH bands AS (
  SELECT CAST(g AS BIGINT) AS band_id, g * 50000.0 AS lo, (g + 1) * 50000.0 AS hi
  FROM generate_series(0, 11) t(g)
)
SELECT b.band_id, COUNT(*) AS n_orders,
       ROUND(SUM(o.o_totalprice), 2) AS sum_price
FROM orders o JOIN bands b ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
GROUP BY 1""",
)
def orders_price_band(sf_dir: str):
    """Range join: orders against a band dimension via broadcast +
    vectorized binary search (np.searchsorted) — no shuffle, no
    inequality hash-join; the band table ships once per actor."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate

    edges = np.arange(13, dtype=np.float64) * 50000.0  # 12 bands

    def band(b: pa.Table) -> pa.Table:
        p = np.asarray(b["o_totalprice"].combine_chunks(), dtype=np.float64)
        idx = np.searchsorted(edges, p, side="right") - 1
        ok = (idx >= 0) & (idx < 12) & (p < edges[-1])
        return pa.table({
            "band_id": pa.array(idx[ok].astype(np.int64)),
            "o_totalprice": pa.array(p[ok]),
        })

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_totalprice"])
    banded = ds.map_batches(band, batch_format="pyarrow", batch_size=None)
    out = grouped_aggregate(
        banded, ["band_id"],
        [("*", "count", "n_orders"), ("o_totalprice", "sum", "sum_price")],
    )
    import pyarrow.compute as pc

    return out.set_column(out.column_names.index("sum_price"), "sum_price",
                          pc.round(out["sum_price"], 2))


@query(
    "join_salted_enrich",
    _P() + """
SELECT pod_namespace, CAST(COUNT(*) AS BIGINT) AS n
FROM enriched WHERE pod_namespace IS NOT NULL GROUP BY 1""",
)
def join_salted_enrich(sf_dir: str):
    """Skew-aware salted hash join: records ⋈ dim on the zipf-hot
    ``source`` key (hot source ≈30% of rows). Hot keys detected from a
    key-compressed histogram, dim hot rows replicated ×salt, fact hot
    rows scattered over the salts — the hot reducer is split salt_factor
    ways; output identical to the plain join."""
    from raylog.functions.agg import grouped_aggregate
    from raylog.functions.joins import salted_join
    from raylog.pipelines import log_pipeline as LP

    fact = LP.records_ds(sf_dir).select_columns(["doc_id", "source"])
    dim = LP.dim_for(sf_dir).select(["source", "pod_namespace"])
    joined = salted_join(fact, dim, key="source", salt_factor=8,
                         num_partitions=8)
    return grouped_aggregate(joined, ["pod_namespace"],
                             [("*", "count", "n")])


@query(
    "join_anti_customers",
    """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderpriority = '1-URGENT')""",
)
def join_anti_customers(sf_dir: str):
    """Anti join at scale: distinct urgent-order custkeys (key-compressed
    partial distinct) → left-outer hash join → null filter. No broadcast
    assumption on either side."""
    import pyarrow.compute as pc
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate_ds

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_name"])
    urgent = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderpriority"],
    ).map_batches(
        lambda b: b.filter(
            pc.equal(b["o_orderpriority"], "1-URGENT")).select(["o_custkey"]),
        batch_format="pyarrow", batch_size=None,
    )
    okeys = grouped_aggregate_ds(
        urgent, ["o_custkey"], [], num_partitions=8,
    ).map_batches(
        lambda b: b.append_column(
            "__has", pa.nulls(b.num_rows, pa.int8()).fill_null(1)),
        batch_format="pyarrow", batch_size=None,
    )
    j = cust.join(okeys, join_type="left_outer", num_partitions=8,
                  on=("c_custkey",), right_on=("o_custkey",))
    return j.map_batches(
        lambda b: b.filter(pc.is_null(b["__has"])).select(
            ["c_custkey", "c_name"]),
        batch_format="pyarrow", batch_size=None,
    )


@query(
    "join_semi_customers",
    """
SELECT c.c_mktsegment, COUNT(*) AS n_cust FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY 1""",
)
def join_semi_customers(sf_dir: str):
    """Semi join: customers with ≥1 order, counted per segment — inner
    join against the distinct-key table (rows never duplicate because
    the right side is key-distinct by construction)."""
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate, grouped_aggregate_ds

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_mktsegment"])
    okeys = grouped_aggregate_ds(
        rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"]),
        ["o_custkey"], [], num_partitions=8,
    )
    j = cust.join(okeys, join_type="inner", num_partitions=8,
                  on=("c_custkey",), right_on=("o_custkey",))
    return grouped_aggregate(j, ["c_mktsegment"], [("*", "count", "n_cust")])


@query(
    "top_orders_per_segment",
    """
WITH j AS (
  SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
), r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                               ORDER BY o_totalprice DESC, o_orderkey) AS rnk
  FROM j
)
SELECT c_mktsegment, rnk, o_orderkey,
       CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS total_cents
FROM r WHERE rnk <= 3""",
)
def top_orders_per_segment(sf_dir: str):
    """Per-group top-k: broadcast join to the segment dim, then per-batch
    partial top-k per segment + tiny merge (no per-segment giant group —
    a 5-segment groupby would make 5 single tasks at scale)."""
    import numpy as np
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from raylog.functions.topk import topk
    from raylog.stages.enrich import BroadcastEnricher

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_mktsegment"])
    cust = cust.rename_columns(["o_custkey", "c_mktsegment"])
    dim_ref = ray.put(cust) if ray.is_initialized() else cust
    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_custkey", "o_orderkey", "o_totalprice"])
    ds = ds.map_batches(
        BroadcastEnricher,
        fn_constructor_kwargs={"dim": dim_ref, "key": "o_custkey"},
        concurrency=2, batch_format="pyarrow", batch_size=None,
    )
    tbl = topk(ds, sort_cols=["o_totalprice", "o_orderkey"],
               descending=[True, False], k=3,
               group_cols=["c_mktsegment"], add_rank="rnk")
    return pa.table({
        "c_mktsegment": tbl["c_mktsegment"],
        "rnk": pc.cast(tbl["rnk"], pa.int64()),
        "o_orderkey": tbl["o_orderkey"],
        "total_cents": pc.cast(
            pc.round(pc.multiply(tbl["o_totalprice"], pa.scalar(100.0))),
            pa.int64()),
    })


# --------------------------------------------------------------------------
# Reshape (nest/lift/modify), truncate, union
# --------------------------------------------------------------------------

@query(
    "log_reshape",
    _P() + """
SELECT doc_id, pod_name AS out_pod_name,
       cluster_name AS out_dice_cluster_name,
       workspace AS out_workspace
FROM enriched""",
)
def log_reshape(sf_dir: str):
    """N1-N10 reshape round-trip: copy into the __tags_ namespace (N7),
    dice_* aliases (N8), nest into a `tags` struct (N10), lift back out
    (N1) — flattened values must survive unchanged."""
    from raylog.pipelines import log_pipeline as LP
    from raylog.stages import reshape

    routed = LP.full_pipeline(sf_dir)

    def do(b: pa.Table) -> pa.Table:
        ops = [
            ("copy", c, f"__tags_{c}")
            for c in ("pod_name", "pod_namespace", "container_id",
                      "cluster_name", "application_name", "org_name",
                      "workspace")
        ]
        b = reshape.apply_modify(b, ops)
        b = reshape.apply_modify(b, reshape.N8_DICE_COPIES)
        b = reshape.nest_columns(b, "__tags_", "tags")
        b = reshape.lift_struct(b, "tags", prefix="out_")
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "out_pod_name": b["out_pod_name"],
                "out_dice_cluster_name": b["out_dice_cluster_name"],
                "out_workspace": b["out_workspace"],
            }
        )

    return routed.map_batches(do, batch_format="pyarrow", batch_size=None)


@query(
    "log_truncate",
    _P() + """
SELECT doc_id, substr(log, 1, 64) AS content_trunc,
       CAST(LEAST(length(log), 64) AS BIGINT) AS content_len
FROM recs2""",
)
def log_truncate(sf_dir: str):
    """P1 truncate semantics at a visible cap (64 chars; production cap is
    the reference's 51200)."""
    import pyarrow.compute as pc

    from raylog.pipelines import log_pipeline as LP
    from raylog.stages import parse

    ds = LP.parsed_ds(LP.records_ds(sf_dir), cap=64)

    def proj(b: pa.Table) -> pa.Table:
        log = b["log"].combine_chunks() if isinstance(b["log"], pa.ChunkedArray) else b["log"]
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "content_trunc": log,
                "content_len": pc.cast(pc.utf8_length(log), pa.int64()),
            }
        )

    return ds.map_batches(proj, batch_format="pyarrow", batch_size=None)


@query(
    "union_sinks",
    _P() + """
, u AS (
  SELECT 'job' AS sink_name, source FROM routed WHERE in_job
  UNION ALL
  SELECT 'export', source FROM routed WHERE in_export
)
SELECT sink_name, COUNT(*) AS cnt FROM u GROUP BY 1""",
)
def union_sinks(sf_dir: str):
    """Dataset union: job ∪ export branches re-merged, counted by branch."""
    import pyarrow.compute as pc

    from raylog.functions.agg import grouped_aggregate
    from raylog.pipelines import log_pipeline as LP

    # a union executes BOTH branch lineages in one run → two enrichment
    # actor pools live at once; keep each small so their sum leaves CPUs
    # for the task stages (all-reserved pools deadlock the consume)
    routed = LP.full_pipeline(sf_dir, concurrency=1)

    def tag(name):
        def f(b: pa.Table) -> pa.Table:
            sub = b.filter(LP.route.sink_mask(b, name))
            return pa.table(
                {"sink_name": pa.array([name] * sub.num_rows), "source": sub["source"]}
            )
        return f

    job = routed.map_batches(tag("job"), batch_format="pyarrow", batch_size=None)
    exp = routed.map_batches(tag("export"), batch_format="pyarrow", batch_size=None)
    u = job.union(exp)
    return grouped_aggregate(u, ["sink_name"], [("*", "count", "cnt")])


# --------------------------------------------------------------------------
# As-of join + per-key ordered window functions
# --------------------------------------------------------------------------

@query(
    "events_asof_join",
    """
SELECT e.event_id, e.user_id, r.ref_id AS last_purchase_id
FROM events e ASOF LEFT JOIN (
  SELECT user_id, ts, MAX(event_id) AS ref_id FROM events
  WHERE event_type = 'purchase' GROUP BY 1, 2
) r ON e.user_id = r.user_id AND e.ts >= r.ts""",
)
def events_asof_join(sf_dir: str):
    """As-of join: each event picks the latest prior-or-equal purchase by
    the same user (hash-partition on user, one vectorized carry pass per
    partition — no global sort)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate_ds
    from raylog.functions.asof import asof_join

    left = rd.read_parquet(f"{sf_dir}/events.parquet",
                           columns=["event_id", "user_id", "ts"])
    right_raw = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type"],
    ).map_batches(
        lambda b: b.filter(pc.equal(b["event_type"], "purchase")).drop_columns(
            ["event_type"]),
        batch_format="pyarrow", batch_size=None,
    )
    right = grouped_aggregate_ds(
        right_raw, ["user_id", "ts"],
        [("event_id", "max", "last_purchase_id")], num_partitions=8,
    )
    out = asof_join(left, right, by="user_id", on="ts",
                    right_vals=["last_purchase_id"], num_partitions=8)
    return out.select_columns(["event_id", "user_id", "last_purchase_id"])


@query(
    "events_interval_join",
    """
SELECT a.event_id, a.user_id, b.event_id AS purchase_id
FROM events a JOIN events b
ON a.user_id = b.user_id AND b.ts >= a.ts
   AND b.ts <= a.ts + INTERVAL 30 MINUTE
WHERE a.event_type = 'view' AND b.event_type = 'purchase'""",
)
def events_interval_join(sf_dir: str):
    """Bounded interval join: each view paired with every purchase by
    the same user within the next 30 minutes — merged-rank endpoint
    counting per hash partition, no per-key loop, no inequality hash
    join."""
    import pyarrow.compute as pc
    import ray.data as rd

    from raylog.functions.asof import interval_join

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts", "event_type"])

    def pick(kind, rename=None):
        def f(b: pa.Table) -> pa.Table:
            t = b.filter(pc.equal(b["event_type"], kind)).drop_columns(
                ["event_type"])
            if rename:
                t = t.rename_columns(
                    [rename.get(c, c) for c in t.column_names])
            return t
        return f

    views = ev.map_batches(pick("view"), batch_format="pyarrow",
                           batch_size=None)
    buys = ev.map_batches(pick("purchase", {"event_id": "purchase_id"}),
                          batch_format="pyarrow", batch_size=None)
    out = interval_join(
        views, buys, by="user_id", on="ts", right_vals=["purchase_id"],
        lower=0, upper=30 * 60 * 1_000_000,  # ts is us-precision
        num_partitions=8,
    )
    return out.select_columns(["event_id", "user_id", "purchase_id"])


@query(
    "events_funnel",
    """
WITH m AS (SELECT user_id, event_type, MIN(ts) AS mt
           FROM events GROUP BY 1, 2),
p AS (SELECT user_id,
        MIN(CASE WHEN event_type = 'view' THEN mt END) AS v,
        MIN(CASE WHEN event_type = 'click' THEN mt END) AS c,
        MIN(CASE WHEN event_type = 'purchase' THEN mt END) AS b
      FROM m GROUP BY 1)
SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(CASE WHEN v IS NOT NULL AND c IS NOT NULL AND v < c
                     THEN 1 ELSE 0 END) AS BIGINT) AS view_click,
       CAST(SUM(CASE WHEN v IS NOT NULL AND c IS NOT NULL
                      AND b IS NOT NULL AND v < c AND c < b
                     THEN 1 ELSE 0 END) AS BIGINT) AS view_click_buy
FROM p""",
)
def events_funnel(sf_dir: str):
    """Ordered funnel analysis (first view < first click < first
    purchase per user): key-compressed distributed min-aggregate on
    (user, stage), vectorized pivot inside whole-user hash partitions,
    constant-size final count — user cardinality never lands anywhere
    whole."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import (
        grouped_aggregate,
        grouped_aggregate_ds,
        partitioned_group_apply,
    )

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type", "ts"])
    firsts = grouped_aggregate_ds(
        ev, ["user_id", "event_type"], [("ts", "min", "mt")],
        num_partitions=8,
    )

    def pivot(part: pa.Table) -> pa.Table:
        u = np.asarray(part["user_id"].combine_chunks(), dtype=np.int64)
        et = np.asarray(part["event_type"].combine_chunks())
        mt = np.asarray(part["mt"].combine_chunks()).view("i8")
        order = np.argsort(u, kind="mergesort")
        u, et, mt = u[order], et[order], mt[order]
        starts = np.flatnonzero(np.concatenate([[True], u[1:] != u[:-1]]))
        seg = np.repeat(np.arange(len(starts)),
                        np.diff(np.append(starts, len(u))))
        big = np.iinfo(np.int64).max
        stage = {}
        for name in ("view", "click", "purchase"):
            vals = np.full(len(starts), big)
            m = et == name
            np.minimum.at(vals, seg[m], mt[m])
            stage[name] = vals
        vc = (stage["view"] < big) & (stage["click"] < big) & (
            stage["view"] < stage["click"])
        vcb = vc & (stage["purchase"] < big) & (
            stage["click"] < stage["purchase"])
        return pa.table({
            "k": pa.nulls(1, pa.int8()).fill_null(0),
            "n_users": pa.array([len(starts)], pa.int64()),
            "view_click": pa.array([int(vc.sum())], pa.int64()),
            "view_click_buy": pa.array([int(vcb.sum())], pa.int64()),
        })

    partials = partitioned_group_apply(firsts, ["user_id"], pivot,
                                       num_partitions=8)
    out = grouped_aggregate(partials, ["k"], [
        ("n_users", "sum", "n_users"),
        ("view_click", "sum", "view_click"),
        ("view_click_buy", "sum", "view_click_buy"),
    ])
    return out.drop_columns(["k"])


@query(
    "events_window_funcs",
    """
SELECT event_id, user_id,
       LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)
         AS lag_value,
       AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
         AS mov_avg
FROM events""",
)
def events_window_funcs(sf_dir: str):
    """Per-user ordered LAG + trailing 3-row moving average: one
    segment-aware numpy pass per hash partition (SQL window restated
    without a global sort)."""
    import ray.data as rd

    from raylog.functions.asof import window_lag_moving

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts", "value"])
    out = window_lag_moving(ds, by="user_id", order=["ts", "event_id"],
                            value="value", window=3, num_partitions=8)
    return out.select_columns(["event_id", "user_id", "lag_value", "mov_avg"])


@query(
    "text_boilerplate_scrub",
    """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), g AS (
  SELECT doc_id, i, array_to_string(w[i:i+4], ' ') AS gram
  FROM t, UNNEST(generate_series(1, len(w) - 4)) AS u(i)
), boiler AS (
  SELECT gram FROM g GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2
), hits AS (
  SELECT g.doc_id, g.i FROM g JOIN boiler USING (gram)
), cov AS (
  SELECT DISTINCT doc_id, p
  FROM hits, UNNEST(generate_series(i, i + 4)) AS c(p)
), words AS (
  SELECT doc_id, p, w[p] AS word
  FROM t, UNNEST(generate_series(1, len(w))) AS u(p)
), clean AS (
  SELECT words.doc_id,
         STRING_AGG(word, ' ' ORDER BY p) AS clean_text,
         COUNT(*) AS kept_words
  FROM words LEFT JOIN cov USING (doc_id, p)
  WHERE cov.p IS NULL GROUP BY words.doc_id
), spans AS (
  SELECT doc_id, COUNT(*) AS dup_spans FROM hits GROUP BY doc_id
)
SELECT t.doc_id,
       COALESCE(s.dup_spans, 0) AS dup_spans,
       len(t.w) - COALESCE(c.kept_words, 0) AS removed_words,
       COALESCE(c.kept_words, 0) AS kept_words,
       COALESCE(c.clean_text, '') AS clean_text
FROM t LEFT JOIN clean c ON t.doc_id = c.doc_id
       LEFT JOIN spans s ON t.doc_id = s.doc_id""",
)
def text_boilerplate_scrub(sf_dir: str):
    """C4/RefinedWeb-style corpus-wide boilerplate removal: word
    5-grams appearing in ≥2 distinct documents are duplicated spans;
    every word covered by one is scrubbed. Distributed df pass →
    broadcast heavy-hitter gram set → vectorized scrub + text rebuild
    (see raylog/functions/boilerplate.py)."""
    import ray.data as rd

    from raylog.functions.boilerplate import remove_boilerplate

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return remove_boilerplate(ds, k=5, min_df=2)


@query(
    "text_nb_classify",
    """
WITH w AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS word FROM documents
), cnt AS (
  SELECT lang, word, COUNT(*) AS c FROM w GROUP BY 1, 2
), tot AS (
  SELECT lang, SUM(c) AS t FROM cnt GROUP BY 1
), vocab AS (
  SELECT COUNT(DISTINCT word) AS v FROM w
), prior AS (
  SELECT lang, COUNT(*) AS n FROM documents GROUP BY 1
), nd AS (
  SELECT COUNT(*) AS nd FROM documents
), s AS (
  SELECT dw.doc_id, c.lang AS cls,
         ANY_VALUE(ln(CAST(p.n AS DOUBLE) / nd.nd)) +
         SUM(ln(CAST(COALESCE(cnt.c, 0) + 1 AS DOUBLE) / (tot.t + vocab.v)))
           AS score
  FROM w dw
  CROSS JOIN prior c
  JOIN prior p ON p.lang = c.lang
  CROSS JOIN nd
  JOIN tot ON tot.lang = c.lang
  CROSS JOIN vocab
  LEFT JOIN cnt ON cnt.lang = c.lang AND cnt.word = dw.word
  GROUP BY dw.doc_id, c.lang
)
SELECT d.doc_id, d.lang, pick.cls AS nb_pred
FROM documents d JOIN (
  SELECT doc_id, cls FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                 ORDER BY score DESC, cls) AS rn FROM s
  ) WHERE rn = 1
) pick ON d.doc_id = pick.doc_id""",
)
def text_nb_classify(sf_dir: str):
    """Count-based quality/domain classifier (the SQL-exact stand-in
    for FineWeb-style fastText filters): multinomial Naive Bayes fit on
    the corpus's own ``lang`` labels via the distributed aggregate,
    model broadcast once, vectorized per-batch scoring
    (raylog/functions/nbayes.py). Output is the argmax label with
    lexicographic tie-break."""
    import ray.data as rd

    from raylog.functions.nbayes import nbayes_classify

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang", "text"])
    return (nbayes_classify(ds, text_col="text", label_col="lang")
            .select_columns(["doc_id", "lang", "nb_pred"]))


@query(
    "text_bm25_topk",
    """
WITH q(query_id, term) AS (
  VALUES (0, 'spark'), (0, 'join'), (0, 'merge'),
         (1, 'window'), (1, 'batch'), (1, 'stream'),
         (2, 'customer'), (2, 'vector'), (2, 'the')
), w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
), dl AS (
  SELECT doc_id, COUNT(*) AS dl FROM w GROUP BY 1
), stats AS (
  SELECT COUNT(*) AS n, AVG(dl) AS avgdl FROM dl
), tf AS (
  SELECT q.query_id, q.term, w.doc_id, COUNT(*) AS tf
  FROM q JOIN w ON w.word = q.term GROUP BY 1, 2, 3
), df AS (
  SELECT word AS term, COUNT(DISTINCT doc_id) AS df FROM w
  WHERE word IN (SELECT term FROM q) GROUP BY 1
), s AS (
  SELECT tf.query_id, tf.doc_id,
         SUM(ln((stats.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
             * tf.tf * 2.2
             / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl))) AS score
  FROM tf JOIN df ON tf.term = df.term
          JOIN dl ON tf.doc_id = dl.doc_id
          CROSS JOIN stats
  GROUP BY 1, 2
)
SELECT query_id, rnk, doc_id,
       CAST(ROUND(score * 1000, 0) AS BIGINT) AS score_milli
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY score DESC, doc_id) AS rnk
      FROM s)
WHERE rnk <= 10""",
)
def text_bm25_topk(sf_dir: str):
    """Sparse-lexical retrieval: BM25 (k1=1.2, b=0.75, Lucene +1 idf)
    top-10 per query over the corpus. One tiny stats aggregate + one
    streaming score pass with per-block partial top-k
    (raylog/functions/bm25.py) — exchange is O(terms) + O(k×queries×
    blocks), constant in corpus size."""
    import pyarrow.compute as pc
    import ray.data as rd

    from raylog.functions.bm25 import bm25_topk

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    queries = [(0, ["spark", "join", "merge"]),
               (1, ["window", "batch", "stream"]),
               (2, ["customer", "vector", "the"])]
    tbl = bm25_topk(ds, queries, k=10)
    return pa.table({
        "query_id": tbl["query_id"],
        "rnk": pc.cast(tbl["rnk"], pa.int64()),
        "doc_id": tbl["doc_id"],
        "score_milli": pc.cast(
            pc.round(pc.multiply(tbl["score"], pa.scalar(1000.0))),
            pa.int64()),
    })


@query(
    "embed_pca_cov",
    """
WITH w AS (
  SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
  FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS u(i)
)
SELECT a.i AS i, b.i AS j, COVAR_SAMP(a.x, b.x) AS cov
FROM w a JOIN w b ON a.vec_id = b.vec_id
GROUP BY 1, 2""",
)
def embed_pca_cov(sf_dir: str):
    """PCA moment pass: the exact d×d sample covariance of the
    embedding column from ONE streaming pass of d²-bounded per-block
    partials (raylog/functions/pca.py) — the input to the driver-local
    eigendecomposition. Emitted as (i, j, cov) rows, 1-based."""
    import ray.data as rd

    import numpy as np

    from raylog.functions.pca import embedding_cov

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["embedding"])
    cov, _, _ = embedding_cov(ds)
    d = cov.shape[0]
    jj, ii = np.meshgrid(np.arange(1, d + 1), np.arange(1, d + 1))
    return pa.table({
        "i": pa.array(ii.ravel(), pa.int64()),
        "j": pa.array(jj.ravel(), pa.int64()),
        "cov": pa.array(cov.ravel(), pa.float64()),
    })


@query("embed_pca_project", None)  # eigenvector basis: no SQL restatement
def embed_pca_project(sf_dir: str):
    """PCA projection to 4 components (broadcast components, per-batch
    matmul). Rows-only: the eigenbasis has no tractable SQL analog; the
    pytest suite checks diagonalization + explained-variance order."""
    import pyarrow.compute as pc
    import ray.data as rd

    from raylog.functions.pca import pca_project

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    out = pca_project(ds, 4)

    def widen(b: pa.Table) -> pa.Table:
        cols = {"vec_id": b["vec_id"]}
        lst = b["pca"].combine_chunks()
        for c in range(4):
            cols[f"pc{c + 1}"] = pc.list_element(lst, c)
        return pa.table(cols)

    return out.map_batches(widen, batch_format="pyarrow", batch_size=None)


@query(
    "events_hourly_active_users",
    """
SELECT CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) AS "window",
       COUNT(DISTINCT user_id) AS active_users
FROM events GROUP BY 1""",
)
def events_hourly_active_users(sf_dir: str):
    """Windowed exact COUNT DISTINCT (hourly active users): the naive
    shape shuffles every event row; here the per-batch partial is the
    batch-distinct (window, user) set, the hash-partitioned distinct
    collapses duplicates with key-compressed exchange, and the final
    per-window count is a windows-bounded aggregate."""
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate, grouped_aggregate_ds
    from raylog.stages.throttle import add_window_column

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "user_id"])
    ds = add_window_column(ds, "ts", 3600).drop_columns(["ts"])
    distinct = grouped_aggregate_ds(ds, ["window", "user_id"], [],
                                    num_partitions=8)
    return grouped_aggregate(distinct, ["window"],
                             [("*", "count", "active_users")])


@query(
    "embed_quantize_int8",
    """
WITH s AS (
  SELECT vec_id,
         list_max(list_transform(embedding,
                                 y -> abs(CAST(y AS DOUBLE)))) / 127.0
           AS scale
  FROM embeddings
)
SELECT e.vec_id, s.scale,
       CASE WHEN s.scale = 0
            THEN list_transform(e.embedding, x -> CAST(0 AS BIGINT))
            ELSE list_transform(e.embedding,
                  x -> CAST(ROUND(CAST(x AS DOUBLE) / s.scale) AS BIGINT))
       END AS q
FROM embeddings e JOIN s ON e.vec_id = s.vec_id""",
)
def embed_quantize_int8(sf_dir: str):
    """Symmetric per-vector int8 quantization (the 4× storage/bandwidth
    reduction step before ANN index build at scale): scale = max|x|/127,
    q = round(x/scale). Pure per-batch numpy — no exchange at all; the
    oracle uses the bit-identical formula (x / (amax/127), not
    x*127/amax) so values match exactly."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.pca import _raw_matrix

    def quant(b: pa.Table) -> pa.Table:
        m = _raw_matrix(b, "embedding")
        amax = np.abs(m).max(axis=1)
        scale = amax / 127.0
        safe = np.where(scale == 0, 1.0, scale)
        q = np.round(m / safe[:, None]).astype(np.int64)
        q[scale == 0] = 0
        flat = pa.array(q.ravel(), pa.int64())
        offs = pa.array(np.arange(len(m) + 1, dtype=np.int32) * m.shape[1],
                        pa.int32())
        return pa.table({
            "vec_id": b["vec_id"],
            "scale": pa.array(scale, pa.float64()),
            "q": pa.ListArray.from_arrays(offs, flat),
        })

    return rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                           columns=["vec_id", "embedding"]).map_batches(
        quant, batch_format="pyarrow", batch_size=None)


@query(
    "text_decontaminate_ngram",
    """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), g AS (
  SELECT doc_id, array_to_string(w[i:i+7], ' ') AS gram
  FROM t, UNNEST(generate_series(1, len(w) - 7)) AS u(i)
), ev AS (
  SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0
), h AS (
  SELECT g.doc_id, COUNT(*) AS hits FROM g JOIN ev USING (gram) GROUP BY 1
)
SELECT t.doc_id, COALESCE(h.hits, 0) AS ngram_hits,
       COALESCE(h.hits, 0) > 0 AS contaminated
FROM t LEFT JOIN h USING (doc_id)""",
)
def text_decontaminate_ngram(sf_dir: str):
    """N-gram-level benchmark decontamination (GPT-3 appx C / PaLM
    style, word 8-grams standing in for the 13-gram standard on these
    short docs): eval set = ``doc_id % 97 == 0`` docs; their distinct
    gram hashes broadcast once; corpus streams through one rolling-hash
    + searchsorted pass (raylog/functions/boilerplate.py)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from raylog.functions.boilerplate import ngram_decontaminate

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    def eval_docs(b: pa.Table) -> pa.Table:
        import numpy as np

        ids = np.asarray(b["doc_id"].combine_chunks(), dtype=np.int64)
        return b.filter(pa.array(ids % 97 == 0))

    ev = ds.map_batches(eval_docs, batch_format="pyarrow", batch_size=None)
    return ngram_decontaminate(ds, ev, k=8)


@query(
    "docs_zscore_by_source",
    """
WITH s AS (
  SELECT source, AVG(CAST(n_chars AS DOUBLE)) AS mu,
         STDDEV_SAMP(CAST(n_chars AS DOUBLE)) AS sd
  FROM documents GROUP BY source
)
SELECT d.doc_id, d.source,
       CAST(ROUND((d.n_chars - s.mu) / s.sd * 1000, 0) AS BIGINT)
         AS z_milli
FROM documents d JOIN s USING (source)""",
)
def docs_zscore_by_source(sf_dir: str):
    """Per-group z-score normalization (feature engineering for quality
    scoring): one sources-bounded mean/std aggregate, stats broadcast,
    one vectorized normalize pass — the broadcast-small-side shape, no
    row shuffle. Std is the n-1 sample form computed from (Σx, Σx², n)
    partials."""
    import numpy as np
    import ray
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "source", "n_chars"])

    def sq(b: pa.Table) -> pa.Table:
        x = np.asarray(b["n_chars"].combine_chunks(), dtype=np.float64)
        return b.append_column("n_chars_sq", pa.array(x * x, pa.float64()))

    stats = grouped_aggregate(
        ds.map_batches(sq, batch_format="pyarrow", batch_size=None),
        ["source"],
        [("n_chars", "sum", "sx"), ("n_chars_sq", "sum", "sxx"),
         ("*", "count", "n")]).to_pandas()
    stats["mu"] = stats["sx"] / stats["n"]
    # Welford-free two-moment sample std; matches STDDEV_SAMP
    stats["sd"] = np.sqrt(
        (stats["sxx"] - stats["n"] * stats["mu"] ** 2) / (stats["n"] - 1))
    lut = {r.source: (r.mu, r.sd) for r in stats.itertuples()}
    ref = ray.put(lut) if ray.is_initialized() else lut

    def norm(b: pa.Table) -> pa.Table:
        m = ray.get(ref) if ray.is_initialized() else ref
        src = b["source"].to_pylist()
        mu = np.array([m[s][0] for s in src])
        sd = np.array([m[s][1] for s in src])
        x = np.asarray(b["n_chars"].combine_chunks(), dtype=np.float64)
        z = np.round((x - mu) / sd * 1000.0).astype(np.int64)
        return pa.table({"doc_id": b["doc_id"], "source": b["source"],
                         "z_milli": pa.array(z, pa.int64())})

    return ds.map_batches(norm, batch_format="pyarrow", batch_size=None)


@query(
    "sample_exact_n",
    """
SELECT doc_id, source FROM (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
           AS rn
  FROM documents
) WHERE rn <= 40""",
)
def sample_exact_n(sf_dir: str):
    """Exactly-N global deterministic sample (the reservoir-sample
    analog with a content-addressed rank): rank = md5(doc_id), each
    block forwards only its own N smallest, driver merges N×blocks
    rows. Unlike rate-based hash sampling (`sample_hash`), the output
    size is exact regardless of corpus size."""
    import hashlib

    import ray.data as rd

    from raylog.functions.topk import topk

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "source"])

    def rank(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_pylist()
        r = [hashlib.md5(str(i).encode()).hexdigest() for i in ids]
        return b.append_column("rnk_key", pa.array(r, pa.string()))

    tbl = topk(ds.map_batches(rank, batch_format="pyarrow", batch_size=None),
               sort_cols=["rnk_key", "doc_id"], descending=[False, False],
               k=40)
    return tbl.select(["doc_id", "source"])


@query(
    "sample_mixture_budget",
    """
WITH t AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         (doc_id * 2654435761) % 4294967296 AS coin
  FROM documents
), c AS (
  SELECT *, SUM(n_tok) OVER (PARTITION BY source ORDER BY coin, doc_id
                             ROWS UNBOUNDED PRECEDING) - n_tok AS prior
  FROM t
)
SELECT doc_id, source, n_tok FROM c
WHERE prior < CASE WHEN source IN ('src0', 'src1', 'src2')
                   THEN 600 ELSE 150 END""",
)
def sample_mixture_budget(sf_dir: str):
    """Data mixing to a token budget: each source contributes docs up
    to its mixture target in TOKENS (not doc counts), deterministically
    (multiplicative coin order). Distributed threshold selection: a
    tiny (source, coin-bucket) token histogram picks each source's
    cutoff bucket on the driver; only the ~1/n_buckets boundary sliver
    is ever sorted. Here src0-2 are upweighted 4:1 over the rest, with
    targets small enough that every source's threshold actually cuts."""
    import ray.data as rd

    from raylog.functions.mixture import mixture_by_token_budget
    from raylog.pipelines import log_pipeline as LP

    ds = LP.records_ds(sf_dir).select_columns(["doc_id", "source", "n_tok"])
    srcs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["source"]).unique("source")
    targets = {s: (600 if s in ("src0", "src1", "src2") else 150)
               for s in srcs}
    return mixture_by_token_budget(ds, targets=targets)


@query(
    "sample_mixture_report",
    """
WITH t AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         (doc_id * 2654435761) % 4294967296 AS coin,
         CASE WHEN source IN ('src0', 'src1', 'src2')
              THEN 600 ELSE 150 END AS target
  FROM documents
), c AS (
  SELECT *, SUM(n_tok) OVER (PARTITION BY source ORDER BY coin, doc_id
                             ROWS UNBOUNDED PRECEDING) - n_tok AS prior
  FROM t
)
SELECT source,
       CAST(MIN(target) AS BIGINT) AS target_tok,
       CAST(SUM(CASE WHEN prior < target THEN n_tok ELSE 0 END)
            AS BIGINT) AS kept_tok,
       CAST(SUM(CASE WHEN prior < target THEN 1 ELSE 0 END)
            AS BIGINT) AS kept_docs,
       CAST(COUNT(*) AS BIGINT) AS total_docs
FROM c GROUP BY source""",
)
def sample_mixture_report(sf_dir: str):
    """Mixture AUDIT: per source, the token target vs what the
    budget sampler actually kept (kept_tok >= target, overshoot < 1
    doc) and the doc counts — the attainment report a data-mixing run
    publishes next to its output. Derived from the same selection rule
    as `sample_mixture_budget`, aggregated per source."""
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate
    from raylog.functions.mixture import mixture_by_token_budget
    from raylog.pipelines import log_pipeline as LP

    ds = LP.records_ds(sf_dir).select_columns(["doc_id", "source", "n_tok"])
    srcs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["source"]).unique("source")
    targets = {s: (600 if s in ("src0", "src1", "src2") else 150)
               for s in srcs}
    kept = mixture_by_token_budget(ds, targets=targets)
    agg = grouped_aggregate(
        kept, ["source"],
        [("n_tok", "sum", "kept_tok"), ("*", "count", "kept_docs")],
    )

    def finish(b: pa.Table) -> pa.Table:
        import numpy as np

        s_list = b["source"].combine_chunks().to_pylist()
        return (b.append_column("target_tok", pa.array(
            np.array([targets[s] for s in s_list], dtype=np.int64)))
            .append_column("total_docs", pa.array(
                np.array([totals[s] for s in s_list], dtype=np.int64))))

    totals = {r["source"]: r["n"] for r in grouped_aggregate(
        ds, ["source"], [("*", "count", "n")]).to_pylist()}
    return finish(agg)


@query(
    "sample_epochs",
    """
WITH t AS (
  SELECT doc_id, source,
         CASE WHEN source IN ('src0', 'src1') THEN 2.5
              WHEN source IN ('src2', 'src3') THEN 1.5 ELSE 1.0 END AS w,
         (doc_id * 2654435761) % 4294967296 AS coin
  FROM documents
), c AS (
  SELECT doc_id, source,
         CAST(FLOOR(w) AS BIGINT)
           + CASE WHEN coin < (w - FLOOR(w)) * 4294967296
                  THEN 1 ELSE 0 END AS n_copies
  FROM t
)
SELECT doc_id, source, CAST(e AS BIGINT) AS epoch
FROM c, LATERAL (SELECT unnest(generate_series(1, n_copies)) AS e) g""",
)
def sample_epochs(sf_dir: str):
    """Source upweighting by REPETITION (fractional epochs, the other
    standard mixture mechanism besides budget truncation): weight 2.5
    emits every doc twice plus a third copy for a deterministic 50% of
    docs (multiplicative coin < frac). Map-only — each batch expands
    its own rows, no shuffle, exact in expectation per source. Output:
    (doc_id, source, epoch)."""
    import numpy as np
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "source"])

    def expand(b: pa.Table) -> pa.Table:
        ids = np.asarray(b["doc_id"].combine_chunks(), dtype=np.int64)
        srcs = np.asarray(b["source"].combine_chunks().to_pylist(),
                          dtype=object)
        w = np.where(np.isin(srcs, ("src0", "src1")), 2.5,
                     np.where(np.isin(srcs, ("src2", "src3")), 1.5, 1.0))
        coin = (ids * 2654435761) % (1 << 32)
        n_copies = (np.floor(w)
                    + (coin < (w - np.floor(w)) * (1 << 32))).astype(np.int64)
        rep = np.repeat(np.arange(len(ids)), n_copies)
        cum = np.cumsum(n_copies) - n_copies
        epoch = np.arange(len(rep), dtype=np.int64) - cum[rep] + 1
        return pa.table({
            "doc_id": pa.array(ids[rep]),
            "source": pa.array(srcs[rep], pa.string()),
            "epoch": pa.array(epoch),
        })

    return ds.map_batches(expand, batch_format="pyarrow", batch_size=None)


@query(
    "events_latest_per_user",
    """
SELECT user_id, event_id, ts, event_type, value FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1""",
)
def events_latest_per_user(sf_dir: str):
    """CDC keep-latest-version per key (newest crawl snapshot per URL,
    latest event per user): distributed argmax — each batch keeps one
    row per key it sees, key-compressed partials hash-partition, each
    reducer finishes complete key groups. High-cardinality-safe: no
    driver merge, no per-group task (VERDICT r1's grouped-top-k trap)."""
    import ray.data as rd

    from raylog.functions.agg import argmax_per_key

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_id", "ts", "event_type", "value"])
    return argmax_per_key(ds, ["user_id"], ["ts", "event_id"],
                          [True, True], num_partitions=8)


# --------------------------------------------------------------------------
# Large-side hash join (native) + session windows
# --------------------------------------------------------------------------

@query(
    "join_lineitem_orders",
    """
SELECT o.o_orderpriority, COUNT(*) AS n_items,
       CAST(SUM(l.l_quantity) AS BIGINT) AS sum_qty
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY 1""",
)
def join_lineitem_orders(sf_dir: str):
    """Both-sides-large hash join: Ray Data's native hash-partitioned
    Dataset.join (fact ⋈ fact on orderkey) → partial/tree aggregate.

    Broadcast is the engine default for dim lookups; this is the path for
    two fact tables (hash-partition both on the key, join per partition).
    """
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_quantity"])
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderpriority"])
    import pyarrow.compute as pc

    joined = li.join(
        orders, join_type="inner", num_partitions=8,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )
    tbl = grouped_aggregate(
        joined, ["o_orderpriority"],
        [("*", "count", "n_items"), ("l_quantity", "sum", "sum_qty_f")],
    )
    return pa.table(
        {
            "o_orderpriority": tbl["o_orderpriority"],
            "n_items": tbl["n_items"],
            "sum_qty": pc.cast(pc.round(tbl["sum_qty_f"]), pa.int64()),
        }
    )


@query(
    "events_sessionize",
    """
WITH e AS (
  SELECT user_id, event_id, epoch(ts) AS t FROM events
), d AS (
  SELECT *, CASE WHEN t - LAG(t) OVER (PARTITION BY user_id ORDER BY t, event_id)
                      > 1800 OR LAG(t) OVER (PARTITION BY user_id ORDER BY t, event_id) IS NULL
                 THEN 1 ELSE 0 END AS new_session
  FROM e
), s AS (
  SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY t, event_id
                                   ROWS UNBOUNDED PRECEDING) AS session_no
  FROM d
)
SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
       COUNT(*) AS n_events,
       CAST(FLOOR(MAX(t) - MIN(t)) AS BIGINT) AS duration_sec
FROM s GROUP BY 1, 2""",
)
def events_sessionize(sf_dir: str):
    """Session windows (30-min inactivity gap) per user.

    Users hash-partition (complete users per partition,
    ``partitioned_group_apply``); each partition derives every user's
    session boundaries and aggregates in ONE vectorized pass — no
    per-user pandas group calls (at scale users are numerous and small:
    the per-group-overhead pathology measured on the LSH buckets)."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import partitioned_group_apply

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_id", "ts"])

    def sessions(part: pa.Table) -> pa.Table:
        def col(name):
            c = part[name]
            return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c

        user = np.asarray(col("user_id"))
        t = np.asarray(col("ts")).astype("datetime64[us]").astype(np.int64) / 1e6
        eid = np.asarray(col("event_id"), dtype=np.int64)
        n = len(user)
        if n == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "session_no": pa.array([], pa.int64()),
                             "n_events": pa.array([], pa.int64()),
                             "duration_sec": pa.array([], pa.int64())})
        order = np.lexsort((eid, t, user))
        user, t = user[order], t[order]
        new = np.ones(n, dtype=bool)
        new[1:] = (user[1:] != user[:-1]) | ((t[1:] - t[:-1]) > 1800)
        ustarts = np.concatenate([[0], np.flatnonzero(user[1:] != user[:-1]) + 1])
        sncum = np.cumsum(new.astype(np.int64))
        seg = np.searchsorted(ustarts, np.arange(n), side="right") - 1
        sn = sncum - sncum[ustarts][seg] + 1
        sstarts = np.flatnonzero(new)
        sends = np.concatenate([sstarts[1:], [n]])
        return pa.table({
            "user_id": pa.array(user[sstarts]),
            "session_no": pa.array(sn[sstarts]),
            "n_events": pa.array((sends - sstarts).astype(np.int64)),
            "duration_sec": pa.array(
                np.floor(t[sends - 1] - t[sstarts]).astype(np.int64)),
        })

    return partitioned_group_apply(ds, ["user_id"], sessions)


@query(
    "docs_histogram",
    """
WITH s AS (
  SELECT CAST(MIN(n_chars) AS DOUBLE) AS lo,
         CAST(MAX(n_chars) AS DOUBLE) AS hi
  FROM documents
)
SELECT LEAST(CAST(FLOOR((n_chars - lo) * 32.0 / (hi - lo + 1.0)) AS BIGINT),
             31) AS bin,
       CAST(FLOOR(lo + (hi - lo + 1.0) / 32.0 * LEAST(CAST(FLOOR((n_chars
             - lo) * 32.0 / (hi - lo + 1.0)) AS BIGINT), 31)) AS BIGINT)
         AS lo_edge,
       COUNT(*) AS n
FROM documents, s GROUP BY 1, 2""",
)
def docs_histogram(sf_dir: str):
    """Fixed-bin global histogram (dataset profiling / distribution
    dashboard): pass 1 computes global min/max (scalar tree aggregate),
    edges broadcast; pass 2 emits one 32-long ``np.bincount`` vector per
    batch — the only exchange is bins-sized partials, elementwise-summed
    (the HLL-merge shape, `functions/sketch.py`). No key shuffle, no
    sort; exchange volume is independent of row count and value
    cardinality, unlike a GROUP-BY-value histogram."""
    import numpy as np
    import ray.data as rd

    NBINS = 32
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["n_chars"])

    mm = ds.aggregate(rd.aggregate.Min("n_chars"), rd.aggregate.Max("n_chars"))
    lo = float(mm["min(n_chars)"])
    hi = float(mm["max(n_chars)"])
    width = (hi - lo + 1.0) / NBINS

    def partial(b: pa.Table) -> pa.Table:
        x = np.asarray(b["n_chars"].combine_chunks(), dtype=np.float64)
        bins = np.minimum(np.floor((x - lo) * NBINS / (hi - lo + 1.0))
                          .astype(np.int64), NBINS - 1)
        counts = np.bincount(bins, minlength=NBINS)
        return pa.table({"bin": pa.array(np.arange(NBINS, dtype=np.int64)),
                         "n": pa.array(counts.astype(np.int64))})

    # bins×blocks partial rows merge in one tiny driver-side sum (bounded
    # by NBINS × num_blocks, independent of data volume).
    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None).to_arrow_refs()
    import ray

    total = np.zeros(NBINS, dtype=np.int64)
    for t in ray.get(parts):
        tb = t if isinstance(t, pa.Table) else pa.Table.from_batches([t])
        total[np.asarray(tb["bin"].combine_chunks())] += np.asarray(
            tb["n"].combine_chunks())
    keep = total > 0
    bins = np.arange(NBINS, dtype=np.int64)[keep]
    return pa.table({
        "bin": pa.array(bins),
        "lo_edge": pa.array(np.floor(lo + width * bins).astype(np.int64)),
        "n": pa.array(total[keep]),
    })


@query(
    "log_templates",
    _P() + """
, t AS (
  SELECT doc_id,
         regexp_replace(regexp_replace(regexp_replace(log,
           '[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}',
           '<id>', 'g'),
           '\\b[0-9a-f]{16}\\b', '<hex>', 'g'),
           '\\b[0-9]+\\b', '<n>', 'g') AS template
  FROM recs2
)
SELECT template, COUNT(*) AS n_lines, MIN(doc_id) AS first_doc
FROM t GROUP BY 1""",
)
def log_templates(sf_dir: str):
    """Log template mining (Drain/Spell-style pattern extraction, the
    standard first step of log analytics): variable tokens — UUIDs, long
    hex ids, integers — masked to placeholders with three chained RE2
    passes (pyarrow and DuckDB share the RE2 engine, so semantics match
    bit-for-bit), then counts + first-seen per template through the
    hash-partitioned high-cardinality aggregate. No driver-side template
    table; exchange is key-compressed partials."""
    import pyarrow.compute as pc

    from raylog.functions.agg import grouped_aggregate_ds
    from raylog.pipelines import log_pipeline as LP

    ds = LP.parsed_ds(LP.records_ds(sf_dir))

    def mask(b: pa.Table) -> pa.Table:
        t = b["log"]
        t = pc.replace_substring_regex(
            t,
            pattern="[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}"
                    "-[0-9a-f]{12}",
            replacement="<id>")
        t = pc.replace_substring_regex(t, pattern=r"\b[0-9a-f]{16}\b",
                                       replacement="<hex>")
        t = pc.replace_substring_regex(t, pattern=r"\b[0-9]+\b",
                                       replacement="<n>")
        return pa.table({"doc_id": b["doc_id"], "template": t})

    masked = ds.map_batches(mask, batch_format="pyarrow", batch_size=None)
    return grouped_aggregate_ds(
        masked, ["template"],
        [("*", "count", "n_lines"), ("doc_id", "min", "first_doc")])


@query(
    "docs_char_entropy",
    """
WITH c AS (
  SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents
), g AS (
  SELECT doc_id, ch, COUNT(*) AS n FROM c GROUP BY 1, 2
), h AS (
  SELECT doc_id, SUM(n) AS tot, SUM(n * log2(n)) AS snln,
         COUNT(*) AS n_distinct, MAX(n) AS maxn
  FROM g GROUP BY 1
)
SELECT d.doc_id,
       CAST(FLOOR((log2(h.tot) - h.snln / h.tot) * 1000.0) AS BIGINT)
         AS entropy_milli,
       h.n_distinct AS n_distinct_chars,
       CAST((1000 * h.maxn) // h.tot AS BIGINT) AS modal_char_milli
FROM documents d JOIN h USING (doc_id)""",
)
def docs_char_entropy(sf_dir: str):
    """Character-distribution quality signals per document (entropy /
    distinct chars / modal-char per-mille — the low-entropy-boilerplate
    and ASCII-art detectors of C4/RefinedWeb-style cleaning). One
    segmented-bincount pass per batch over the flat UTF-8 buffer, zero
    exchange (`functions/text.py:char_entropy`)."""
    import ray.data as rd

    from raylog.functions.text import char_entropy

    return rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"]).map_batches(
        char_entropy, batch_format="pyarrow", batch_size=None).select_columns(
        ["doc_id", "entropy_milli", "n_distinct_chars", "modal_char_milli"])


@query(
    "sample_dsir",
    """
WITH words AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
               FROM documents),
cr AS (SELECT w, COUNT(*) AS c FROM words GROUP BY w),
ct AS (SELECT w, COUNT(*) AS c FROM words WHERE doc_id % 31 = 0 GROUP BY w),
tot AS (SELECT (SELECT COUNT(*) FROM cr) AS v,
               (SELECT SUM(c) FROM cr) AS tr,
               (SELECT COALESCE(SUM(c), 0) FROM ct) AS tt),
lr AS (SELECT cr.w,
              ln((COALESCE(ct.c, 0) + 1.0) / (tot.tt + tot.v))
                - ln((cr.c + 1.0) / (tot.tr + tot.v)) AS r
       FROM cr LEFT JOIN ct USING (w) CROSS JOIN tot),
dw AS (SELECT doc_id, SUM(r) AS logw FROM words JOIN lr USING (w)
       GROUP BY doc_id)
SELECT doc_id, source, CAST(ROUND(1e6 * logw) AS BIGINT) AS logw_micro
FROM (
  SELECT d.doc_id, d.source, dw.logw,
         ROW_NUMBER() OVER (ORDER BY dw.logw DESC, d.doc_id) AS rn
  FROM documents d JOIN dw USING (doc_id)
) WHERE rn <= 100""",
)
def sample_dsir(sf_dir: str):
    """DSIR-style data selection (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): fit unigram bag-of-words
    models on a target slice (``doc_id % 31 == 0``) and on the raw
    corpus (Laplace-smoothed over the shared vocab), weight each doc by
    its summed log importance ratio, keep the top-100 (the deterministic
    argmax variant of the paper's Gumbel-top-k; swapping in Gumbel noise
    is one hash-derived ``-log(-log u)`` add).

    Scale shape: ONE word-count aggregate produces both distributions
    (vocab-cardinality exchange, target mask applied per token inside the
    batch); the log-ratio model broadcasts once; scoring is the
    searchsorted+bincount kernel; selection is per-block partial top-k —
    no shuffle of the corpus at any point. At real scale the feature
    table is capped exactly as the paper does (DSIR hashes n-grams into
    10k buckets; equivalently top-V words + UNK mass, the `text_lm_score`
    practice) — the synthetic vocab is tiny so the exact table ships
    whole here."""
    import numpy as np
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate_ds
    from raylog.functions.topk import topk

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "source", "text"])

    def wcounts(b: pa.Table) -> pa.Table:
        split = pc.split_pattern(b["text"].combine_chunks(), " ")
        lens = np.asarray(pc.list_value_length(split), dtype=np.int64)
        flat = split.flatten().dictionary_encode()
        codes = np.asarray(flat.indices, dtype=np.int64)
        ids = np.asarray(b["doc_id"].combine_chunks(), dtype=np.int64)
        tgt_tok = np.repeat(ids % 31 == 0, lens)
        nv = len(flat.dictionary)
        cr = np.bincount(codes, minlength=nv)
        ct = np.bincount(codes[tgt_tok], minlength=nv)
        return pa.table({"w": flat.dictionary,
                         "cr": pa.array(cr, pa.int64()),
                         "ct": pa.array(ct, pa.int64())})

    vc = grouped_aggregate_ds(
        ds.map_batches(wcounts, batch_format="pyarrow", batch_size=None),
        ["w"], [("cr", "sum", "cr"), ("ct", "sum", "ct")],
    ).to_pandas()
    vocab = np.array(vc["w"], dtype=object)
    order = np.argsort(vocab)
    vocab = vocab[order].astype("U")
    cr = vc["cr"].to_numpy()[order].astype(np.float64)
    ct = vc["ct"].to_numpy()[order].astype(np.float64)
    v, tr, tt = float(len(vocab)), cr.sum(), ct.sum()
    ratio = np.log((ct + 1.0) / (tt + v)) - np.log((cr + 1.0) / (tr + v))
    model = (vocab, ratio)
    model_ref = ray.put(model) if ray.is_initialized() else model

    def score(b: pa.Table) -> pa.Table:
        vocab_, ratio_ = (ray.get(model_ref)
                          if ray.is_initialized() else model_ref)
        n_docs = b.num_rows
        split = pc.split_pattern(b["text"].combine_chunks(), " ")
        lens = np.asarray(pc.list_value_length(split), dtype=np.int64)
        flat = split.flatten().dictionary_encode()
        codes = np.asarray(flat.indices, dtype=np.int64)
        dict_r = ratio_[np.searchsorted(vocab_,
                                        np.asarray(flat.dictionary,
                                                   dtype="U"))]
        doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
        logw = np.bincount(doc_idx, weights=dict_r[codes], minlength=n_docs)
        return pa.table({"doc_id": b["doc_id"], "source": b["source"],
                         "logw": pa.array(logw, pa.float64())})

    scored = ds.map_batches(score, batch_format="pyarrow", batch_size=None)
    best = topk(scored, sort_cols=["logw", "doc_id"],
                descending=[True, False], k=100)
    return pa.table({
        "doc_id": best["doc_id"],
        "source": best["source"],
        "logw_micro": pc.cast(pc.round(pc.multiply(best["logw"],
                                                   pa.scalar(1e6))),
                              pa.int64()),
    })


@query(
    "events_anomaly",
    """
WITH c AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, COUNT(*) AS n
  FROM events GROUP BY 1, 2
), s AS (
  SELECT event_type, AVG(CAST(n AS DOUBLE)) AS mu,
         STDDEV_SAMP(CAST(n AS DOUBLE)) AS sd
  FROM c GROUP BY 1
)
SELECT c.event_type, c.day, c.n,
       CAST(ROUND((c.n - s.mu) / s.sd * 1000) AS BIGINT) AS z_milli,
       (c.n - s.mu) > 2 * s.sd AS is_spike
FROM c JOIN s USING (event_type)""",
)
def events_anomaly(sf_dir: str):
    """Log/metric-volume anomaly detection (the ops-dashboard spike
    alert a log agent feeds): daily counts per event type, per-type
    volume z-score over the window series, spike = count > mean + 2σ.

    The only full-data pass is the (type, day)-keyed count — partial +
    tree combine, types×days-bounded result; the z-score/spike finish
    runs on that tiny table driver-side. The scale knob is purely key
    cardinality, never row volume."""
    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts"])

    def day(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": b["event_type"],
            "day": pc.strftime(b["ts"], format="%Y-%m-%d"),
        })

    counts = grouped_aggregate(
        ds.map_batches(day, batch_format="pyarrow", batch_size=None),
        ["event_type", "day"], [("*", "count", "n")]).to_pandas()
    g = counts.groupby("event_type")["n"]
    stats = g.agg(mu="mean", sd=lambda x: x.std(ddof=1)).reset_index()
    m = counts.merge(stats, on="event_type")
    z = (m["n"] - m["mu"]) / m["sd"]
    return pa.table({
        "event_type": pa.array(m["event_type"], pa.string()),
        "day": pa.array(m["day"], pa.string()),
        "n": pa.array(m["n"], pa.int64()),
        "z_milli": pa.array(np.round(z * 1000).astype(np.int64)),
        "is_spike": pa.array((m["n"] - m["mu"]) > 2 * m["sd"]),
    })


@query("text_bpe_vocab", None)
def text_bpe_vocab(sf_dir: str):
    """BPE tokenizer training on the corpus (Sennrich 2016 / GPT-2
    recipe): the distributed pass is ONE word→count aggregate; merges
    run on the vocab-bounded weighted word table (`functions/bpe.py`).
    Deterministic (count-desc, lexicographic tie-break) — no SQL oracle
    (iterative merges are not SQL-expressible); pytest checks the merge
    sequence against an independent scalar reference, round-trip
    decode, and partition invariance."""
    import ray.data as rd

    from raylog.functions.bpe import bpe_train

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    return bpe_train(ds, num_merges=64).merge_table()


@query("text_bpe_encode", None)
def text_bpe_encode(sf_dir: str):
    """Encode the corpus with the corpus-trained BPE model: model
    broadcast once via ``ray.put``; each batch dictionary-encodes its
    word column so every distinct word is encoded exactly once, then
    token lists gather per document. Returns (doc_id, bpe token ids,
    n_bpe)."""
    import ray.data as rd

    from raylog.functions.bpe import bpe_encode_ds, bpe_train

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    model = bpe_train(ds, num_merges=64)
    return bpe_encode_ds(ds, model)


@query(
    "events_watermark_late",
    """
WITH e AS (
  SELECT event_id, event_type, epoch_us(ts) AS t FROM events
), w AS (
  SELECT *,
         MAX(t) OVER (PARTITION BY event_type ORDER BY event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS wm_prev,
         MAX(t) OVER (PARTITION BY event_type ORDER BY event_id
                      ROWS UNBOUNDED PRECEDING) AS wm
  FROM e
)
SELECT event_id, event_type,
       COALESCE(wm_prev - 3600000000 > t, FALSE) AS is_late,
       wm AS watermark_us
FROM w""",
)
def events_watermark_late(sf_dir: str):
    """Event-time watermark + late-data classification (the streaming
    allowed-lateness rule, batch-restated): records arrive in
    ``event_id`` order per type; the watermark is the running max event
    time seen so far; a record is late when it lags the pre-arrival
    watermark by over 1 hour (it would have missed its window).

    Types hash-partition (complete types per partition); ONE segmented
    ``np.maximum.accumulate`` pass per partition covers every type in
    it — no per-type task. A real stream keeps this state
    incrementally per source partition; the batch analog's only
    sequential dependency is within a type, which is inherent to
    watermark semantics."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import partitioned_group_apply

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "event_type", "ts"])

    def wm(part: pa.Table) -> pa.Table:
        def col(name):
            c = part[name]
            return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c

        typ = np.asarray(col("event_type"))
        eid = np.asarray(col("event_id"), dtype=np.int64)
        t = np.asarray(col("ts")).astype("datetime64[us]").astype(np.int64)
        n = len(typ)
        if n == 0:
            return pa.table({"event_id": pa.array([], pa.int64()),
                             "event_type": pa.array([], pa.string()),
                             "is_late": pa.array([], pa.bool_()),
                             "watermark_us": pa.array([], pa.int64())})
        order = np.lexsort((eid, typ))
        typ_s, eid_s, t_s = typ[order], eid[order], t[order]
        seg_start = np.ones(n, dtype=bool)
        seg_start[1:] = typ_s[1:] != typ_s[:-1]
        # segmented running max: one in-place accumulate per segment
        # (segments = distinct types in this partition — a handful)
        wm_incl = t_s.copy()
        starts = np.flatnonzero(seg_start)
        bounds = np.concatenate([starts, [n]])
        for i in range(len(starts)):
            s, e = bounds[i], bounds[i + 1]
            np.maximum.accumulate(t_s[s:e], out=wm_incl[s:e])
        wm_prev = np.empty(n, dtype=np.int64)
        wm_prev[1:] = wm_incl[:-1]
        is_late = np.zeros(n, dtype=bool)
        np.less(t_s[1:], wm_prev[1:] - 3_600_000_000,
                out=is_late[1:], where=~seg_start[1:])
        is_late &= ~seg_start
        return pa.table({
            "event_id": pa.array(eid_s),
            "event_type": pa.array(typ_s),
            "is_late": pa.array(is_late),
            "watermark_us": pa.array(wm_incl),
        })

    return partitioned_group_apply(ds, ["event_type"], wm)


@query(
    "pretrain_prep",
    """
WITH snips AS (
  SELECT DISTINCT substr(text, 1, 40) AS snip
  FROM documents WHERE doc_id % 97 = 0 AND len(text) >= 40
), q AS (
  SELECT doc_id, text,
    CAST(len(string_split(text,' ')) AS BIGINT) AS n_words,
    CAST(len(list_filter(string_split(text,' '), w -> w IN ('the','a'))) AS BIGINT) AS stop_hits,
    CAST(len(list_filter(string_split(text,' '), w -> w IN ('der','die','das','und'))) AS BIGINT) AS h_de,
    CAST(len(list_filter(string_split(text,' '), w -> w IN ('the','a','of','and'))) AS BIGINT) AS h_en,
    CAST(len(list_filter(string_split(text,' '), w -> w IN ('el','la','de','y'))) AS BIGINT) AS h_es,
    CAST(len(list_filter(string_split(text,' '), w -> w IN ('le','la','de','et'))) AS BIGINT) AS h_fr
  FROM documents
), scored AS (
  SELECT *,
    CAST(FLOOR(1000 * (0.5 * LEAST(n_words / 40.0, 1.0)
               + 0.5 * (1.0 - stop_hits * 1.0 / n_words))) AS BIGINT) AS score,
    GREATEST(h_de, h_en, h_es, h_fr) AS mx,
    (CASE WHEN h_de = GREATEST(h_de,h_en,h_es,h_fr) THEN 1 ELSE 0 END
   + CASE WHEN h_en = GREATEST(h_de,h_en,h_es,h_fr) THEN 1 ELSE 0 END
   + CASE WHEN h_es = GREATEST(h_de,h_en,h_es,h_fr) THEN 1 ELSE 0 END
   + CASE WHEN h_fr = GREATEST(h_de,h_en,h_es,h_fr) THEN 1 ELSE 0 END) AS ties
  FROM q
), kept AS (
  SELECT doc_id, text FROM scored
  WHERE score >= 600 AND mx > 0 AND ties = 1 AND h_en = mx
    AND NOT EXISTS (SELECT 1 FROM snips s WHERE contains(scored.text, s.snip))
), surv AS (
  SELECT MIN(doc_id) AS doc_id FROM kept GROUP BY text
)
SELECT doc_id, doc_id % 8 AS shard FROM surv""",
)
def pretrain_prep(sf_dir: str):
    """End-to-end pretraining-corpus prep — the composite pipeline a
    training-data user actually runs, every stage a proven engine
    kernel: quality filter (score ≥ 600) → language filter (en) →
    benchmark decontamination (eval-snippet RE2 alternation, broadcast
    once) → exact dedup (hash-partitioned keep-first) → deterministic
    shard assignment.

    Order note: decontamination commutes with exact dedup (identical
    texts share a contamination flag), so the cheap row-local filters
    run before the keyed aggregate — filters first, shuffle last, the
    100 TB-shape rule. Everything streams; the only exchange is the
    dedup key aggregate; the snippet set is the only driver-side state
    (eval-suite-sized by construction)."""
    import re

    import numpy as np
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    from raylog.functions.dedup import exact_dedup_survivors
    from raylog.functions.text import lang_id, quality_scores

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def eval_snips(b: pa.Table) -> pa.Table:
        ids = np.asarray(b["doc_id"].combine_chunks(), dtype=np.int64)
        lens = np.asarray(pc.utf8_length(b["text"].combine_chunks()),
                          dtype=np.int64)
        m = pa.array((ids % 97 == 0) & (lens >= 40))
        return pa.table(
            {"snip": pc.utf8_slice_codeunits(b.filter(m)["text"], 0, 40)})

    snip_tbls = list(
        ds.map_batches(eval_snips, batch_format="pyarrow", batch_size=None)
        .iter_batches(batch_format="pyarrow", batch_size=None))
    snips = sorted({s for t in snip_tbls for s in t["snip"].to_pylist()})
    pattern = "|".join(re.escape(s) for s in snips) if snips else None
    pat_ref = ray.put(pattern) if ray.is_initialized() else pattern

    def keep(b: pa.Table) -> pa.Table:
        scored = lang_id(quality_scores(b))
        m = pc.and_(pc.greater_equal(scored["score_milli"], pa.scalar(600)),
                    pc.equal(scored["lang_pred"], pa.scalar("en")))
        kept = scored.filter(m).select(["doc_id", "text"])
        pat = ray.get(pat_ref) if ray.is_initialized() else pat_ref
        if pat is None or kept.num_rows == 0:
            return kept
        clean = pc.invert(pc.match_substring_regex(
            kept["text"].combine_chunks(), pat))
        return kept.filter(clean)

    kept = ds.map_batches(keep, batch_format="pyarrow", batch_size=None)
    surv = exact_dedup_survivors(kept)

    def shard(b: pa.Table) -> pa.Table:
        ids = b["doc_id"]
        return pa.table({
            "doc_id": ids,
            "shard": pc.cast(
                pc.bit_wise_and(ids.combine_chunks(), pa.scalar(7)),
                pa.int64()),
        })

    return surv.map_batches(shard, batch_format="pyarrow", batch_size=None)


_STOPSET = ("the", "a", "of", "and", "der", "die", "das", "und",
            "el", "la", "de", "y", "le", "et")


@query(
    "text_remove_stopwords",
    """
SELECT doc_id,
       array_to_string(list_filter(string_split(text, ' '),
         w -> w NOT IN ({stops})), ' ') AS cleaned,
       CAST(len(string_split(text, ' '))
            - len(list_filter(string_split(text, ' '),
                  w -> w NOT IN ({stops}))) AS BIGINT) AS n_removed
FROM documents""".format(stops=",".join(f"'{w}'" for w in _STOPSET)),
)
def text_remove_stopwords(sf_dir: str):
    """Stopword-strip with full text rebuild (the classic IR/quality
    preproc pass): split → membership mask computed ONCE on the batch's
    dictionary-encoded distinct words (not per token) → masked flat
    gather → list offsets rebuilt → Arrow ``binary_join`` re-joins the
    cleaned text. Zero exchange, zero Python per row."""
    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd

    stopset = set(_STOPSET)

    def clean(b: pa.Table) -> pa.Table:
        text = b["text"].combine_chunks()
        split = pc.split_pattern(text, " ")
        lens = np.asarray(pc.list_value_length(split), dtype=np.int64)
        flat = split.flatten().dictionary_encode()
        codes = np.asarray(flat.indices, dtype=np.int64)
        dwords = flat.dictionary.to_pylist()
        dict_keep = np.array([w not in stopset for w in dwords])
        keep = dict_keep[codes]
        doc_idx = np.repeat(np.arange(b.num_rows, dtype=np.int64), lens)
        new_lens = np.bincount(doc_idx, weights=keep,
                               minlength=b.num_rows).astype(np.int64)
        offs = np.concatenate([[0], np.cumsum(new_lens)]).astype(np.int32)
        kept_words = split.flatten().filter(pa.array(keep))
        lists = pa.ListArray.from_arrays(pa.array(offs, pa.int32()),
                                         kept_words)
        return pa.table({
            "doc_id": b["doc_id"],
            "cleaned": pc.binary_join(lists, " "),
            "n_removed": pa.array(lens - new_lens),
        })

    return rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"]).map_batches(
        clean, batch_format="pyarrow", batch_size=None)


@query(
    "corpus_source_kl",
    """
WITH words AS (SELECT source, unnest(string_split(text, ' ')) AS w
               FROM documents),
sw AS (SELECT source, w, COUNT(*) AS c FROM words GROUP BY 1, 2),
st AS (SELECT source, SUM(c) AS n FROM sw GROUP BY 1),
gw AS (SELECT w, SUM(c) AS c FROM sw GROUP BY 1),
gt AS (SELECT SUM(c) AS n FROM gw)
SELECT sw.source,
       CAST(FLOOR(1000 * SUM((sw.c * 1.0 / st.n)
            * ln((sw.c * 1.0 / st.n) / (gw.c * 1.0 / gt.n)))) AS BIGINT)
         AS kl_milli
FROM sw JOIN st USING (source) JOIN gw USING (w) CROSS JOIN gt
GROUP BY 1""",
)
def corpus_source_kl(sf_dir: str):
    """Per-source KL divergence from the corpus-wide word distribution
    (mixture diagnostics: which source is distributionally aberrant —
    the quantitative form of the Pile/ROOTS source-audit step).

    Exchange shape: ONE (source, word)-keyed count aggregate
    (vocab×sources-bounded, hash-partitioned); the global distribution
    and per-source totals derive from it and broadcast; the KL terms
    are one vectorized pass over the count Dataset; the finish is a
    sources-bounded sum. Corpus rows shuffle zero times."""
    import numpy as np
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate, grouped_aggregate_ds

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["source", "text"])

    def wcounts(b: pa.Table) -> pa.Table:
        split = pc.split_pattern(b["text"].combine_chunks(), " ")
        lens = np.asarray(pc.list_value_length(split), dtype=np.int64)
        flat = split.flatten().dictionary_encode()
        codes = np.asarray(flat.indices, dtype=np.int64)
        src = np.asarray(b["source"].combine_chunks().dictionary_encode()
                         .indices, dtype=np.int64)
        src_dict = b["source"].combine_chunks().dictionary_encode().dictionary
        tok_src = np.repeat(src, lens)
        nv = len(flat.dictionary)
        packed = tok_src * nv + codes
        up, cnt = np.unique(packed, return_counts=True)
        return pa.table({
            "source": src_dict.take(pa.array(up // nv)),
            "w": flat.dictionary.take(pa.array(up % nv)),
            "c": pa.array(cnt.astype(np.int64)),
        })

    sw = grouped_aggregate_ds(
        ds.map_batches(wcounts, batch_format="pyarrow", batch_size=None),
        ["source", "w"], [("c", "sum", "c")])

    gw = grouped_aggregate(sw, ["w"], [("c", "sum", "c")]).to_pandas()
    vocab = np.array(gw["w"], dtype=object)
    order = np.argsort(vocab)
    vocab = vocab[order].astype("U")
    gcnt = gw["c"].to_numpy()[order].astype(np.float64)
    gtot = gcnt.sum()
    st = grouped_aggregate(sw, ["source"], [("c", "sum", "n")]).to_pandas()
    stot = {r.source: float(r.n) for r in st.itertuples()}
    model = (vocab, gcnt / gtot, stot)
    ref = ray.put(model) if ray.is_initialized() else model

    def terms(b: pa.Table) -> pa.Table:
        vocab_, q_, stot_ = ray.get(ref) if ray.is_initialized() else ref
        w = np.asarray(b["w"].combine_chunks(), dtype="U")
        c = np.asarray(b["c"].combine_chunks(), dtype=np.float64)
        src = b["source"].to_pylist()
        n = np.array([stot_[s] for s in src])
        p = c / n
        q = q_[np.searchsorted(vocab_, w)]
        return pa.table({
            "source": b["source"],
            "term": pa.array(p * np.log(p / q), pa.float64()),
        })

    out = grouped_aggregate(
        sw.map_batches(terms, batch_format="pyarrow", batch_size=None),
        ["source"], [("term", "sum", "kl")])
    return pa.table({
        "source": out["source"],
        "kl_milli": pc.cast(pc.floor(pc.multiply(out["kl"],
                                                 pa.scalar(1000.0))),
                            pa.int64()),
    })


@query(
    "dedup_online",
    "SELECT DISTINCT text FROM documents",
)
def dedup_online(sf_dir: str):
    """Online streaming dedup via the sharded shared mutable index
    (`state/dedup_index.py`) — the raw-actor escape hatch: cross-batch
    first-wins membership the Dataset API cannot express. The survivor
    TEXT SET is deterministic (exactly one per distinct content) even
    though which physical row survives follows arrival order, so the
    oracle compares the set itself."""
    import ray.data as rd

    from raylog.state.dedup_index import online_dedup

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    out, _shards = online_dedup(ds, num_shards=4, concurrency=2)
    return out.select_columns(["text"])


@query(
    "embed_hard_negatives",
    """
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT * FROM e WHERE vec_id < 5),
s AS (SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
             list_cosine_similarity(q.v, e.v) AS cos
      FROM q JOIN e ON e.label <> q.label),
r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cos DESC, neighbor_id) AS rank
      FROM s)
SELECT query_id, rank, neighbor_id,
       CAST(ROUND(1000000 * cos) AS BIGINT) AS cos_micro
FROM r WHERE rank <= 5""",
)
def embed_hard_negatives(sf_dir: str):
    """Hard-negative mining for contrastive training (SimCSE/DPR
    recipe): for each query vector, the top-5 most-similar vectors with
    a DIFFERENT label — near-misses across the class boundary, the
    negatives that matter.

    Per-query label exclusion composes from the existing filtered-ANN
    kernel: queries group by label (labels-bounded), one scan per query
    label with the corpus predicate pushed into the read; each scan is
    the broadcast-queries / per-batch-partial-top-k shape."""
    import pyarrow.compute as pc
    import ray.data as rd

    from raylog.functions.similarity import ann_brute_topk

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding", "label"])
    qids = [0, 1, 2, 3, 4]
    qlab = {}
    lab_tbl = ds.map_batches(
        lambda b: b.filter(pc.is_in(b["vec_id"], value_set=pa.array(qids)))
        .select(["vec_id", "label"]),
        batch_format="pyarrow", batch_size=None).to_pandas()
    for r in lab_tbl.itertuples():
        qlab[int(r.vec_id)] = int(r.label)

    parts = []
    for lab in sorted(set(qlab.values())):
        group = [q for q, lb in qlab.items() if lb == lab]
        corpus = ds.filter(
            expr=f"label != {lab}")
        parts.append(ann_brute_topk(ds, query_ids=group, k=5,
                                    corpus_ds=corpus))
    out = pa.concat_tables(parts)
    return out.sort_by([("query_id", "ascending"), ("rank", "ascending")])


@query(
    "events_daily_top_users",
    """
WITH c AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day, user_id, COUNT(*) AS n
  FROM events GROUP BY 1, 2
), r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY day
                               ORDER BY n DESC, user_id) AS rnk
  FROM c
)
SELECT day, rnk, user_id, n FROM r WHERE rnk <= 3""",
)
def events_daily_top_users(sf_dir: str):
    """Trending entities per window (daily top-3 most active users —
    the leaderboard/hot-key dashboard query): (day, user) counts via
    the hash-partitioned high-cardinality aggregate, then the grouped
    partial-top-k kernel — each block forwards ≤ k rows per day it
    sees, merge is days×k-bounded. No global sort, no per-day giant
    group task (the VERDICT r1 grouped-top-k trap)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate_ds
    from raylog.functions.topk import topk

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "user_id"])

    def day(b: pa.Table) -> pa.Table:
        return pa.table({
            "day": pc.strftime(b["ts"], format="%Y-%m-%d"),
            "user_id": b["user_id"],
        })

    counts = grouped_aggregate_ds(
        ds.map_batches(day, batch_format="pyarrow", batch_size=None),
        ["day", "user_id"], [("*", "count", "n")])
    tbl = topk(counts, sort_cols=["n", "user_id"],
               descending=[True, False], k=3,
               group_cols=["day"], add_rank="rnk")
    return pa.table({
        "day": tbl["day"],
        "rnk": pc.cast(tbl["rnk"], pa.int64()),
        "user_id": tbl["user_id"],
        "n": tbl["n"],
    })


@query(
    "events_user_trend",
    """
WITH e AS (
  SELECT user_id, epoch(ts) AS t, value FROM events
), s AS (
  SELECT user_id, COUNT(*) AS n_events,
         REGR_SLOPE(value, t) AS slope
  FROM e GROUP BY 1
)
SELECT user_id, n_events,
       CAST(FLOOR(slope * 1e9) AS BIGINT) AS slope_nano
FROM s WHERE n_events >= 2 AND slope IS NOT NULL""",
)
def events_user_trend(sf_dir: str):
    """Per-entity linear trend (is each user's metric drifting up or
    down — the grouped least-squares slope, the fleet-health regression
    a telemetry pipeline runs per host/user/service).

    Closed-form slope from five moment sums (n, Σt, Σv, Σtv, Σt²) —
    each batch emits one moment row per key it sees, the
    hash-partitioned combine merges them, the finish is pure arithmetic
    per key. High-cardinality-safe: no per-group task, no sort, the
    exchange is key-compressed moment partials (the `agg.py` shape)."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate_ds

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "value"])

    def moments(b: pa.Table) -> pa.Table:
        t = (np.asarray(b["ts"].combine_chunks())
             .astype("datetime64[us]").astype(np.int64) / 1e6)
        v = np.asarray(b["value"].combine_chunks(), dtype=np.float64)
        return pa.table({
            "user_id": b["user_id"],
            "t": pa.array(t, pa.float64()),
            "v": pa.array(v, pa.float64()),
            "tv": pa.array(t * v, pa.float64()),
            "tt": pa.array(t * t, pa.float64()),
        })

    agg = grouped_aggregate_ds(
        ds.map_batches(moments, batch_format="pyarrow", batch_size=None),
        ["user_id"],
        [("*", "count", "n"), ("t", "sum", "st"), ("v", "sum", "sv"),
         ("tv", "sum", "stv"), ("tt", "sum", "stt")])

    def finish(b: pa.Table) -> pa.Table:
        n = np.asarray(b["n"].combine_chunks(), dtype=np.float64)
        st = np.asarray(b["st"].combine_chunks())
        sv = np.asarray(b["sv"].combine_chunks())
        stv = np.asarray(b["stv"].combine_chunks())
        stt = np.asarray(b["stt"].combine_chunks())
        denom = stt - st * st / n
        with np.errstate(divide="ignore", invalid="ignore"):
            slope = (stv - st * sv / n) / denom
        keep = (n >= 2) & (denom > 0) & np.isfinite(slope)
        out = pa.table({
            "user_id": b["user_id"],
            "n_events": pa.array(n.astype(np.int64)),
            "slope_nano": pa.array(
                np.floor(np.where(keep, slope, 0.0) * 1e9).astype(np.int64)),
        })
        return out.filter(pa.array(keep))

    return agg.map_batches(finish, batch_format="pyarrow", batch_size=None)


@query(
    "docs_percent_rank",
    """
SELECT doc_id, source,
       CAST(FLOOR(1000 * PERCENT_RANK() OVER (PARTITION BY source
                                              ORDER BY n_chars)) AS BIGINT)
         AS pr_milli
FROM documents""",
)
def docs_percent_rank(sf_dir: str):
    """Per-row percentile rank of doc length within its source (the CDF
    position feature quality classifiers consume). PERCENT_RANK =
    (count of strictly smaller values) / (n_group - 1), computed WITHOUT
    a sort: per-(source, value) counts are bounded by
    sources × distinct-lengths (a length column has bounded range at
    any corpus size), the tiny CDF table broadcasts, each batch looks
    its rows up with one searchsorted. No shuffle of the corpus."""
    import numpy as np
    import ray
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "source", "n_chars"])

    counts = grouped_aggregate(ds, ["source", "n_chars"],
                               [("*", "count", "c")]).to_pandas()
    cdf = {}
    for src, g in counts.groupby("source"):
        g = g.sort_values("n_chars")
        vals = g["n_chars"].to_numpy()
        c = g["c"].to_numpy()
        below = np.concatenate([[0], np.cumsum(c)[:-1]])
        n = int(c.sum())
        cdf[src] = (vals, below, n)
    ref = ray.put(cdf) if ray.is_initialized() else cdf

    def rank(b: pa.Table) -> pa.Table:
        m = ray.get(ref) if ray.is_initialized() else ref
        src = b["source"].to_pylist()
        x = np.asarray(b["n_chars"].combine_chunks(), dtype=np.int64)
        pr = np.zeros(len(x), dtype=np.float64)
        order = np.argsort(src, kind="stable")
        i = 0
        src_arr = np.array(src, dtype=object)
        while i < len(order):
            j = i
            s = src_arr[order[i]]
            while j < len(order) and src_arr[order[j]] == s:
                j += 1
            sel = order[i:j]
            vals, below, n = m[s]
            pos = np.searchsorted(vals, x[sel])
            pr[sel] = below[pos] / max(n - 1, 1)
            i = j
        return pa.table({
            "doc_id": b["doc_id"],
            "source": b["source"],
            "pr_milli": pa.array(np.floor(1000 * pr).astype(np.int64)),
        })

    return ds.map_batches(rank, batch_format="pyarrow", batch_size=None)


@query(
    "text_pmi_bigrams",
    """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
words AS (SELECT doc_id, unnest(w) AS w FROM t),
wc AS (SELECT w, COUNT(*) AS c FROM words GROUP BY 1),
tot AS (SELECT SUM(c) AS n FROM wc),
bg AS (
  SELECT list_extract(w, i) AS w1, list_extract(w, i + 1) AS w2,
         COUNT(*) AS c
  FROM t, UNNEST(generate_series(1, len(w) - 1)) AS u(i)
  GROUP BY 1, 2
), btot AS (SELECT SUM(c) AS n FROM bg),
pmi AS (
  SELECT bg.w1, bg.w2, bg.c,
         ln((bg.c * 1.0 / btot.n)
            / ((a.c * 1.0 / tot.n) * (b.c * 1.0 / tot.n))) AS v
  FROM bg JOIN wc a ON bg.w1 = a.w JOIN wc b ON bg.w2 = b.w
  CROSS JOIN tot CROSS JOIN btot
  WHERE bg.c >= 5
)
SELECT w1, w2, c, CAST(FLOOR(1000 * v) AS BIGINT) AS pmi_milli
FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY v DESC, w1, w2) AS rn
      FROM pmi)
WHERE rn <= 30""",
)
def text_pmi_bigrams(sf_dir: str):
    """Collocation mining: top-30 word bigrams by pointwise mutual
    information (count ≥ 5) — the classic phrase-detection pass
    (word2vec's phrase building, Mikolov 2013).

    Word counts and bigram counts each flow through the
    hash-partitioned aggregate (vocab- / pairs-bounded partials); the
    unigram distribution broadcasts; PMI evaluates vectorized over the
    bigram Dataset; selection is partial top-k. Bigram pairs use
    in-batch dictionary codes packed into one uint64 — the
    `tokens.py` masked-pair kernel shape applied to words."""
    import numpy as np
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate_ds
    from raylog.functions.topk import topk

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def bigram_counts(b: pa.Table) -> pa.Table:
        split = pc.split_pattern(b["text"].combine_chunks(), " ")
        lens = np.asarray(pc.list_value_length(split), dtype=np.int64)
        flat = split.flatten().dictionary_encode()
        codes = np.asarray(flat.indices, dtype=np.uint64)
        nv = np.uint64(len(flat.dictionary))
        if len(codes) < 2:
            return pa.table({"w1": pa.array([], pa.string()),
                             "w2": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64())})
        key = codes[:-1] * nv + codes[1:]
        mask = np.ones(len(codes) - 1, dtype=bool)
        ends = np.cumsum(lens)[:-1]
        ends = ends[(ends > 0) & (ends < len(codes))]
        mask[ends - 1] = False
        uk, cnt = np.unique(key[mask], return_counts=True)
        return pa.table({
            "w1": flat.dictionary.take(pa.array((uk // nv).astype(np.int64))),
            "w2": flat.dictionary.take(pa.array((uk % nv).astype(np.int64))),
            "c": pa.array(cnt.astype(np.int64)),
        })

    def word_counts(b: pa.Table) -> pa.Table:
        split = pc.split_pattern(b["text"].combine_chunks(), " ")
        flat = split.flatten().dictionary_encode()
        codes = np.asarray(flat.indices, dtype=np.int64)
        uc, cnt = np.unique(codes, return_counts=True)
        return pa.table({"w": flat.dictionary.take(pa.array(uc)),
                         "c": pa.array(cnt, pa.int64())})

    wc = grouped_aggregate_ds(
        ds.map_batches(word_counts, batch_format="pyarrow", batch_size=None),
        ["w"], [("c", "sum", "c")]).to_pandas()
    vocab = np.array(wc["w"], dtype=object)
    order = np.argsort(vocab)
    vocab = vocab[order].astype("U")
    wcnt = wc["c"].to_numpy()[order].astype(np.float64)
    wtot = wcnt.sum()
    model_ref = (ray.put((vocab, wcnt / wtot))
                 if ray.is_initialized() else (vocab, wcnt / wtot))

    bg = grouped_aggregate_ds(
        ds.map_batches(bigram_counts, batch_format="pyarrow",
                       batch_size=None),
        ["w1", "w2"], [("c", "sum", "c")])
    btot = float(bg.sum("c"))

    def pmi(b: pa.Table) -> pa.Table:
        vocab_, p_ = (ray.get(model_ref)
                      if ray.is_initialized() else model_ref)
        c = np.asarray(b["c"].combine_chunks(), dtype=np.float64)
        keep = c >= 5
        b2 = b.filter(pa.array(keep))
        if b2.num_rows == 0:
            return pa.table({"w1": pa.array([], pa.string()),
                             "w2": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64()),
                             "v": pa.array([], pa.float64())})
        c2 = c[keep]
        p1 = p_[np.searchsorted(vocab_, np.asarray(b2["w1"].combine_chunks(),
                                                   dtype="U"))]
        p2 = p_[np.searchsorted(vocab_, np.asarray(b2["w2"].combine_chunks(),
                                                   dtype="U"))]
        v = np.log((c2 / btot) / (p1 * p2))
        return pa.table({"w1": b2["w1"], "w2": b2["w2"],
                         "c": pc.cast(b2["c"], pa.int64()),
                         "v": pa.array(v, pa.float64())})

    scored = bg.map_batches(pmi, batch_format="pyarrow", batch_size=None)
    best = topk(scored, sort_cols=["v", "w1", "w2"],
                descending=[True, False, False], k=30)
    return pa.table({
        "w1": best["w1"], "w2": best["w2"], "c": best["c"],
        "pmi_milli": pc.cast(pc.floor(pc.multiply(best["v"],
                                                  pa.scalar(1000.0))),
                             pa.int64()),
    })


@query(
    "docs_robust_z",
    """
WITH m AS (SELECT source, quantile_disc(n_chars, 0.5) AS med
           FROM documents GROUP BY 1),
a AS (SELECT d.doc_id, d.source, d.n_chars,
             abs(d.n_chars - m.med) AS adev, m.med
      FROM documents d JOIN m USING (source)),
md AS (SELECT source, quantile_disc(adev, 0.5) AS mad FROM a GROUP BY 1)
SELECT a.doc_id, a.source,
       CAST(FLOOR(1000.0 * (a.n_chars - a.med) / md.mad) AS BIGINT)
         AS rz_milli
FROM a JOIN md USING (source) WHERE md.mad > 0""",
)
def docs_robust_z(sf_dir: str):
    """Robust (median/MAD) per-group z-score — the outlier-resistant
    normalization quality pipelines prefer over mean/std when lengths
    are heavy-tailed. Two passes through the exact distributed-quantile
    kernel (value-cardinality-bounded histograms, `quantile.py`): per-
    source median, then median absolute deviation of the integer
    deviations; both tiny tables broadcast; the normalize is one
    vectorized pass. All arithmetic before the final divide is exact
    integers — the SQL restatement matches bit-for-bit."""
    import numpy as np
    import ray
    import ray.data as rd

    from raylog.functions.quantile import grouped_quantiles

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "source", "n_chars"])

    med_tbl = grouped_quantiles(ds, key="source", value="n_chars",
                                ps=[0.5], out_names=["med"]).to_pandas()
    med = {r.source: int(r.med) for r in med_tbl.itertuples()}
    med_ref = ray.put(med) if ray.is_initialized() else med

    def adev(b: pa.Table) -> pa.Table:
        m = ray.get(med_ref) if ray.is_initialized() else med_ref
        src = b["source"].to_pylist()
        x = np.asarray(b["n_chars"].combine_chunks(), dtype=np.int64)
        mv = np.array([m[s] for s in src], dtype=np.int64)
        return pa.table({"source": b["source"],
                         "adev": pa.array(np.abs(x - mv))})

    mad_tbl = grouped_quantiles(
        ds.map_batches(adev, batch_format="pyarrow", batch_size=None),
        key="source", value="adev", ps=[0.5], out_names=["mad"]).to_pandas()
    mad = {r.source: int(r.mad) for r in mad_tbl.itertuples()}
    mad_ref = ray.put(mad) if ray.is_initialized() else mad

    def norm(b: pa.Table) -> pa.Table:
        m = ray.get(med_ref) if ray.is_initialized() else med_ref
        d = ray.get(mad_ref) if ray.is_initialized() else mad_ref
        src = b["source"].to_pylist()
        x = np.asarray(b["n_chars"].combine_chunks(), dtype=np.int64)
        mv = np.array([m[s] for s in src], dtype=np.int64)
        dv = np.array([d[s] for s in src], dtype=np.int64)
        keep = dv > 0
        with np.errstate(divide="ignore", invalid="ignore"):
            rz = np.floor(1000.0 * (x - mv) / np.maximum(dv, 1)
                          ).astype(np.int64)
        return pa.table({
            "doc_id": b["doc_id"],
            "source": b["source"],
            "rz_milli": pa.array(rz),
        }).filter(pa.array(keep))

    return ds.map_batches(norm, batch_format="pyarrow", batch_size=None)


@query(
    "docs_shuffle_rank",
    """
SELECT doc_id,
       CAST(ROW_NUMBER() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)),
                               doc_id) - 1 AS BIGINT) AS shuffle_rank
FROM documents""",
)
def docs_shuffle_rank(sf_dir: str):
    """Deterministic global corpus shuffle (the training-order
    permutation every pretraining run needs, resumable because it is a
    pure function of the ids): rank = position under (md5(doc_id),
    doc_id) order.

    Distributed WITHOUT a global sort: md5 keys are uniform, so the
    first byte is a balanced range partition — per-batch bucket counts
    (256-bounded) tree-merge into exact bucket offsets, each hash
    partition sorts only its own buckets' keys and adds the offset.
    At 100 TB the same plan holds with 2-3 prefix bytes; the exchange
    is (bucket, count) partials plus the one key-partitioned pass."""
    import hashlib

    import numpy as np
    import ray
    import ray.data as rd

    from raylog.functions.agg import (grouped_aggregate,
                                      partitioned_group_apply)

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id"])

    def keyed(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_pylist()
        keys = [hashlib.md5(str(i).encode()).hexdigest() for i in ids]
        buckets = np.array([int(k[:2], 16) for k in keys], dtype=np.int64)
        return pa.table({"doc_id": b["doc_id"],
                         "key": pa.array(keys, pa.string()),
                         "bucket": pa.array(buckets)})

    kds = ds.map_batches(keyed, batch_format="pyarrow", batch_size=None)
    counts = grouped_aggregate(kds, ["bucket"],
                               [("*", "count", "c")]).to_pandas()
    counts = counts.sort_values("bucket")
    offsets = np.zeros(256, dtype=np.int64)
    off = 0
    for r in counts.itertuples():
        offsets[int(r.bucket)] = off
        off += int(r.c)
    off_ref = ray.put(offsets) if ray.is_initialized() else offsets

    def rank_partition(part: pa.Table) -> pa.Table:
        offs = ray.get(off_ref) if ray.is_initialized() else off_ref
        key = np.asarray(part["key"].combine_chunks(), dtype="U")
        ids = np.asarray(part["doc_id"].combine_chunks(), dtype=np.int64)
        bkt = np.asarray(part["bucket"].combine_chunks(), dtype=np.int64)
        order = np.lexsort((ids, key, bkt))
        # local rank within each bucket (buckets are COMPLETE per
        # partition — partitioned_group_apply guarantees it)
        b_sorted = bkt[order]
        starts = np.ones(len(b_sorted), dtype=bool)
        starts[1:] = b_sorted[1:] != b_sorted[:-1]
        idx = np.arange(len(b_sorted))
        local = idx - idx[starts][np.cumsum(starts) - 1]
        rank = offs[b_sorted] + local
        out = np.empty(len(ids), dtype=np.int64)
        out[order] = rank
        return pa.table({"doc_id": pa.array(ids),
                         "shuffle_rank": pa.array(out)})

    return partitioned_group_apply(kds, ["bucket"], rank_partition)


@query(
    "corpus_lang_source_chi2",
    """
WITH c AS (
  SELECT lang, source, COUNT(*) AS o FROM documents GROUP BY 1, 2
), m AS (
  SELECT lang, SUM(o) AS rl FROM c GROUP BY 1
), n AS (
  SELECT source, SUM(o) AS cs FROM c GROUP BY 1
), t AS (SELECT SUM(o) AS tot FROM c),
cells AS (
  SELECT c.lang, c.source, c.o,
         m.rl * n.cs * 1.0 / t.tot AS e
  FROM c JOIN m USING (lang) JOIN n USING (source) CROSS JOIN t
)
SELECT lang, source, o,
       CAST(FLOOR(1000 * (o - e) * (o - e) / e) AS BIGINT)
         AS chi2_contrib_milli
FROM cells""",
)
def corpus_lang_source_chi2(sf_dir: str):
    """Corpus-composition independence audit: chi-square contribution of
    every (lang, source) cell against the independence expectation —
    the statistical form of "is language balanced across sources?"
    (cells with large contributions are the skewed pockets a mixture
    designer rebalances).

    One (lang, source)-keyed count aggregate (langs×sources-bounded);
    marginals and expectations derive from that tiny table driver-side.
    The corpus streams once, shuffle-free."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["lang", "source"])
    c = grouped_aggregate(ds, ["lang", "source"],
                          [("*", "count", "o")]).to_pandas()
    rl = c.groupby("lang")["o"].sum()
    cs = c.groupby("source")["o"].sum()
    tot = float(c["o"].sum())
    e = (c["lang"].map(rl).to_numpy() * c["source"].map(cs).to_numpy()
         / tot)
    o = c["o"].to_numpy().astype(np.float64)
    contrib = np.floor(1000 * (o - e) ** 2 / e).astype(np.int64)
    return pa.table({
        "lang": pa.array(c["lang"], pa.string()),
        "source": pa.array(c["source"], pa.string()),
        "o": pa.array(c["o"].to_numpy().astype(np.int64)),
        "chi2_contrib_milli": pa.array(contrib),
    })


@query(
    "events_user_sequence",
    """
SELECT user_id,
       list(event_type ORDER BY ts, event_id) AS seq,
       COUNT(*) AS n_events
FROM events GROUP BY user_id""",
)
def events_user_sequence(sf_dir: str):
    """collect_list: per-user time-ordered event-type sequence (the
    behavioral-sequence form fed to session models / next-event
    prediction). Users hash-partition complete
    (`partitioned_group_apply`); each partition sorts once and rebuilds
    every user's list via offsets — no per-user Python calls, no global
    sort."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import partitioned_group_apply

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_id", "ts",
                                  "event_type"])

    def collect(part: pa.Table) -> pa.Table:
        def col(name):
            c = part[name]
            return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c

        user = np.asarray(col("user_id"), dtype=np.int64)
        eid = np.asarray(col("event_id"), dtype=np.int64)
        t = np.asarray(col("ts")).astype("datetime64[us]").astype(np.int64)
        et = col("event_type")
        n = len(user)
        if n == 0:
            return pa.table({
                "user_id": pa.array([], pa.int64()),
                "seq": pa.array([], pa.list_(pa.string())),
                "n_events": pa.array([], pa.int64()),
            })
        order = np.lexsort((eid, t, user))
        user_s = user[order]
        starts = np.ones(n, dtype=bool)
        starts[1:] = user_s[1:] != user_s[:-1]
        offs = np.concatenate([np.flatnonzero(starts), [n]]).astype(np.int32)
        seq = pa.ListArray.from_arrays(pa.array(offs, pa.int32()),
                                       et.take(pa.array(order)))
        return pa.table({
            "user_id": pa.array(user_s[np.flatnonzero(starts)]),
            "seq": seq,
            "n_events": pa.array(np.diff(offs).astype(np.int64)),
        })

    return partitioned_group_apply(ds, ["user_id"], collect)


@query(
    "events_user_pivot",
    """
SELECT user_id,
       CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
       CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
       CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error
FROM events GROUP BY user_id""",
)
def events_user_pivot(sf_dir: str):
    """Pivot (long → wide): per-user event-type count matrix — the
    feature-vector form classifiers consume. Each batch pivots locally
    (one-hot scatter via dictionary codes ONCE per batch), the wide
    partials sum through the hash-partitioned combine — the pivot
    happens before the exchange, so the shuffle carries users × 5
    integer columns, not events."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate_ds

    TYPES = ["click", "view", "purchase", "signup", "error"]
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type"])

    def widen(b: pa.Table) -> pa.Table:
        user = np.asarray(b["user_id"].combine_chunks(), dtype=np.int64)
        et = b["event_type"].combine_chunks().dictionary_encode()
        codes = np.asarray(et.indices, dtype=np.int64)
        dwords = et.dictionary.to_pylist()
        remap = np.array([TYPES.index(w) for w in dwords], dtype=np.int64)
        tcode = remap[codes]
        uu, uidx = np.unique(user, return_inverse=True)
        mat = np.zeros((len(uu), len(TYPES)), dtype=np.int64)
        np.add.at(mat, (uidx, tcode), 1)
        cols = {"user_id": pa.array(uu)}
        for j, t in enumerate(TYPES):
            cols[f"n_{t}"] = pa.array(mat[:, j])
        return pa.table(cols)

    return grouped_aggregate_ds(
        ds.map_batches(widen, batch_format="pyarrow", batch_size=None),
        ["user_id"], [(f"n_{t}", "sum", f"n_{t}") for t in TYPES])


@query(
    "sample_quality_weighted",
    """
WITH q AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
         CAST(len(list_filter(string_split(text, ' '),
              w -> w IN ('the', 'a'))) AS BIGINT) AS stop_hits,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
              AS BIGINT) AS h
  FROM documents
), s AS (
  SELECT doc_id, h,
         CAST(FLOOR(1000 * (0.5 * LEAST(n_words / 40.0, 1.0)
              + 0.5 * (1.0 - stop_hits * 1.0 / n_words))) AS BIGINT)
           AS score
  FROM q
)
SELECT doc_id, score FROM s
WHERE h % 1000 < score""",
)
def sample_quality_weighted(sf_dir: str):
    """Quality-weighted downsampling (soft filtering — the "keep good
    docs more often" alternative to a hard threshold, RefinedWeb-style
    probabilistic retention): acceptance probability = quality score,
    decision = deterministic per-doc hash uniform (reproducible across
    runs and engines, resumable by construction). One streaming pass,
    zero exchange; both the score and the coin are integer-exact in the
    SQL restatement."""
    import hashlib

    import numpy as np
    import ray.data as rd

    from raylog.functions.text import quality_scores

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def pick(b: pa.Table) -> pa.Table:
        scored = quality_scores(b)
        score = np.asarray(scored["score_milli"].combine_chunks(),
                           dtype=np.int64)
        ids = b["doc_id"].to_pylist()
        h = np.array([int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
                      for i in ids], dtype=np.int64)
        keep = (h % 1000) < score
        return pa.table({
            "doc_id": b["doc_id"],
            "score": pa.array(score),
        }).filter(pa.array(keep))

    return ds.map_batches(pick, batch_format="pyarrow", batch_size=None)


@query(
    "text_log_odds_words",
    """
WITH words AS (
  SELECT lang = 'en' AS grp_a, unnest(string_split(text, ' ')) AS w
  FROM documents
), wc AS (
  SELECT w,
         CAST(SUM(CASE WHEN grp_a THEN 1 ELSE 0 END) AS BIGINT) AS ya,
         CAST(SUM(CASE WHEN grp_a THEN 0 ELSE 1 END) AS BIGINT) AS yb
  FROM words GROUP BY 1
), tot AS (
  SELECT SUM(ya) AS na, SUM(yb) AS nb, SUM(ya + yb) AS n FROM wc
), z AS (
  SELECT wc.w, wc.ya, wc.yb,
         (ln((wc.ya + 1000.0 * (wc.ya + wc.yb) / tot.n)
             / (tot.na + 1000.0 - wc.ya - 1000.0 * (wc.ya + wc.yb) / tot.n))
        - ln((wc.yb + 1000.0 * (wc.ya + wc.yb) / tot.n)
             / (tot.nb + 1000.0 - wc.yb - 1000.0 * (wc.ya + wc.yb) / tot.n)))
         / sqrt(1.0 / (wc.ya + 1000.0 * (wc.ya + wc.yb) / tot.n)
              + 1.0 / (wc.yb + 1000.0 * (wc.ya + wc.yb) / tot.n)) AS zv
  FROM wc CROSS JOIN tot
)
SELECT w, ya, yb, CAST(FLOOR(1000 * zv) AS BIGINT) AS z_milli
FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY zv DESC, w) AS rn FROM z)
WHERE rn <= 30""",
)
def text_log_odds_words(sf_dir: str):
    """Discriminative-word mining between two subcorpora (Monroe et al.
    2008 "Fightin' Words": log-odds ratio with informative Dirichlet
    prior, z-scored) — which words characterize the English slice vs
    the rest; the standard corpus-comparison diagnostic.

    ONE masked word-count aggregate yields both group counts per word
    (the DSIR kernel shape); the z computation runs on the
    vocab-bounded table; selection is top-k. Corpus streams once,
    shuffle-free. Prior strength a0=1000, prior = corpus distribution."""
    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate_ds

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["lang", "text"])

    def wcounts(b: pa.Table) -> pa.Table:
        split = pc.split_pattern(b["text"].combine_chunks(), " ")
        lens = np.asarray(pc.list_value_length(split), dtype=np.int64)
        flat = split.flatten().dictionary_encode()
        codes = np.asarray(flat.indices, dtype=np.int64)
        is_a = np.repeat(
            np.asarray(pc.equal(b["lang"].combine_chunks(),
                                pa.scalar("en"))), lens)
        nv = len(flat.dictionary)
        ya = np.bincount(codes[is_a], minlength=nv)
        yb = np.bincount(codes[~is_a], minlength=nv)
        return pa.table({"w": flat.dictionary,
                         "ya": pa.array(ya.astype(np.int64)),
                         "yb": pa.array(yb.astype(np.int64))})

    wc = grouped_aggregate_ds(
        ds.map_batches(wcounts, batch_format="pyarrow", batch_size=None),
        ["w"], [("ya", "sum", "ya"), ("yb", "sum", "yb")]).to_pandas()
    ya = wc["ya"].to_numpy().astype(np.float64)
    yb = wc["yb"].to_numpy().astype(np.float64)
    na, nb = ya.sum(), yb.sum()
    n = na + nb
    a0 = 1000.0
    pw = a0 * (ya + yb) / n
    delta = (np.log((ya + pw) / (na + a0 - ya - pw))
             - np.log((yb + pw) / (nb + a0 - yb - pw)))
    z = delta / np.sqrt(1.0 / (ya + pw) + 1.0 / (yb + pw))
    wc["zv"] = z
    top = wc.sort_values(["zv", "w"], ascending=[False, True],
                         kind="mergesort").head(30)
    return pa.table({
        "w": pa.array(top["w"], pa.string()),
        "ya": pa.array(top["ya"].to_numpy().astype(np.int64)),
        "yb": pa.array(top["yb"].to_numpy().astype(np.int64)),
        "z_milli": pa.array(np.floor(1000 * top["zv"].to_numpy())
                            .astype(np.int64)),
    })


@query(
    "part_unpivot",
    """
SELECT p_partkey, 'p_size' AS attr,
       CAST(p_size AS DOUBLE) AS value FROM part
UNION ALL
SELECT p_partkey, 'p_retailprice' AS attr, p_retailprice FROM part""",
)
def part_unpivot(sf_dir: str):
    """Unpivot (wide → long / melt): numeric attribute columns become
    (key, attr, value) rows — the inverse of `events_user_pivot`, the
    form feature stores and long-format analytics consume. Pure
    row-local reshaping: each batch emits its melted rows in place, no
    exchange; output is exactly rows × n_attrs."""
    import pyarrow.compute as pc
    import ray.data as rd

    ATTRS = ["p_size", "p_retailprice"]
    ds = rd.read_parquet(f"{sf_dir}/part.parquet",
                         columns=["p_partkey"] + ATTRS)

    def melt(b: pa.Table) -> pa.Table:
        keys, attrs, vals = [], [], []
        for a in ATTRS:
            keys.append(b["p_partkey"].combine_chunks())
            attrs.append(pa.array([a] * b.num_rows, pa.string()))
            vals.append(pc.cast(b[a].combine_chunks(), pa.float64()))
        return pa.table({
            "p_partkey": pa.concat_arrays(keys),
            "attr": pa.concat_arrays(attrs),
            "value": pa.concat_arrays(vals),
        })

    return ds.map_batches(melt, batch_format="pyarrow", batch_size=None)


@query(
    "lineitem_corr",
    """
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(FLOOR(1e6 * CORR(l_quantity, l_extendedprice)) AS BIGINT)
         AS corr_micro
FROM lineitem GROUP BY 1""",
)
def lineitem_corr(sf_dir: str):
    """Grouped Pearson correlation (quantity vs price per return flag —
    the drift/sanity statistic a metrics pipeline tracks): five moment
    sums per key through the partial+tree aggregate, closed-form
    finish; same exchange shape as `events_user_trend`."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_returnflag", "l_quantity",
                                  "l_extendedprice"])

    def moments(b: pa.Table) -> pa.Table:
        x = np.asarray(b["l_quantity"].combine_chunks(), dtype=np.float64)
        y = np.asarray(b["l_extendedprice"].combine_chunks(),
                       dtype=np.float64)
        return pa.table({
            "l_returnflag": b["l_returnflag"],
            "x": pa.array(x), "y": pa.array(y),
            "xy": pa.array(x * y), "xx": pa.array(x * x),
            "yy": pa.array(y * y),
        })

    agg = grouped_aggregate(
        ds.map_batches(moments, batch_format="pyarrow", batch_size=None),
        ["l_returnflag"],
        [("*", "count", "n"), ("x", "sum", "sx"), ("y", "sum", "sy"),
         ("xy", "sum", "sxy"), ("xx", "sum", "sxx"),
         ("yy", "sum", "syy")]).to_pandas()
    n = agg["n"].to_numpy().astype(np.float64)
    sx, sy = agg["sx"].to_numpy(), agg["sy"].to_numpy()
    sxy, sxx, syy = (agg["sxy"].to_numpy(), agg["sxx"].to_numpy(),
                     agg["syy"].to_numpy())
    cov = sxy - sx * sy / n
    corr = cov / np.sqrt((sxx - sx * sx / n) * (syy - sy * sy / n))
    return pa.table({
        "l_returnflag": pa.array(agg["l_returnflag"], pa.string()),
        "n": pa.array(agg["n"].to_numpy().astype(np.int64)),
        "corr_micro": pa.array(np.floor(1e6 * corr).astype(np.int64)),
    })


@query(
    "events_type_drift",
    """
WITH e AS (
  SELECT event_type, CAST(day(ts) > 15 AS BOOLEAN) AS h2 FROM events
), c AS (
  SELECT event_type,
         CAST(SUM(CASE WHEN h2 THEN 0 ELSE 1 END) AS BIGINT) AS c1,
         CAST(SUM(CASE WHEN h2 THEN 1 ELSE 0 END) AS BIGINT) AS c2
  FROM e GROUP BY 1
), t AS (SELECT SUM(c1) AS n1, SUM(c2) AS n2 FROM c),
d AS (
  SELECT c.event_type, c.c1, c.c2,
         c.c1 * 1.0 / t.n1 AS p, c.c2 * 1.0 / t.n2 AS q
  FROM c CROSS JOIN t
)
SELECT event_type, c1, c2,
       CAST(FLOOR(1e6 * (
         CASE WHEN p > 0 THEN 0.5 * p * ln(p / ((p + q) / 2)) ELSE 0 END
       + CASE WHEN q > 0 THEN 0.5 * q * ln(q / ((p + q) / 2)) ELSE 0 END))
         AS BIGINT) AS js_contrib_micro
FROM d""",
)
def events_type_drift(sf_dir: str):
    """Distribution-drift detection between two periods (first vs
    second half of the month): per-type Jensen-Shannon divergence
    contributions of the event-type mix — the production monitoring
    check that a pipeline's traffic composition shifted.

    One (type, half)-keyed count aggregate (types-bounded); the JS
    terms compute on the tiny table driver-side. Corpus streams once,
    shuffle-free — the same cells-bounded shape as the chi-square
    audit."""
    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts"])

    def half(b: pa.Table) -> pa.Table:
        day = np.asarray(pc.day(b["ts"].combine_chunks()), dtype=np.int64)
        return pa.table({"event_type": b["event_type"],
                         "h2": pa.array(day > 15)})

    c = grouped_aggregate(
        ds.map_batches(half, batch_format="pyarrow", batch_size=None),
        ["event_type", "h2"], [("*", "count", "n")]).to_pandas()
    piv = c.pivot_table(index="event_type", columns="h2", values="n",
                        fill_value=0, aggfunc="sum")
    c1 = piv.get(False, 0)
    c2 = piv.get(True, 0)
    import pandas as pd

    out = pd.DataFrame({"event_type": piv.index,
                        "c1": np.asarray(c1, dtype=np.int64),
                        "c2": np.asarray(c2, dtype=np.int64)})
    p = out["c1"] / out["c1"].sum()
    q = out["c2"] / out["c2"].sum()
    m = (p + q) / 2
    js = (0.5 * np.where(p > 0, p * np.log(np.where(p > 0, p, 1) / m), 0)
          + 0.5 * np.where(q > 0, q * np.log(np.where(q > 0, q, 1) / m), 0))
    return pa.table({
        "event_type": pa.array(out["event_type"], pa.string()),
        "c1": pa.array(out["c1"]),
        "c2": pa.array(out["c2"]),
        "js_contrib_micro": pa.array(np.floor(1e6 * js).astype(np.int64)),
    })


@query(
    "events_cohort_retention",
    """
WITH f AS (
  SELECT user_id,
         CAST(FLOOR(epoch(MIN(ts)) / 604800) AS BIGINT) AS cohort_wk
  FROM events GROUP BY 1
), a AS (
  SELECT DISTINCT e.user_id, f.cohort_wk,
         CAST(FLOOR(epoch(e.ts) / 604800) AS BIGINT) - f.cohort_wk
           AS wk_offset
  FROM events e JOIN f USING (user_id)
)
SELECT cohort_wk, wk_offset, COUNT(*) AS n_users
FROM a GROUP BY 1, 2""",
)
def events_cohort_retention(sf_dir: str):
    """Cohort retention matrix (the product-analytics staple): users
    cohorted by first-activity week; cell (cohort, offset) = distinct
    users from that cohort active offset weeks later.

    Three keyed passes, all high-cardinality-safe: per-user first-event
    week (hash-partitioned min), broadcast-free hash join of events to
    their user's cohort (native Dataset.join), then batch-distinct
    (user, cohort, offset) partials into the hash-partitioned distinct
    — the final matrix is cohorts×offsets-bounded."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate, grouped_aggregate_ds

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])

    def week(b: pa.Table) -> pa.Table:
        t = (np.asarray(b["ts"].combine_chunks())
             .astype("datetime64[us]").astype(np.int64))
        wk = np.floor(t / 1e6 / 604800).astype(np.int64)
        return pa.table({"user_id": b["user_id"], "wk": pa.array(wk)})

    wks = ds.map_batches(week, batch_format="pyarrow", batch_size=None)
    first = grouped_aggregate_ds(wks, ["user_id"],
                                 [("wk", "min", "cohort_wk")])
    joined = wks.join(first, join_type="inner", num_partitions=8,
                      on=("user_id",))

    def offs(b: pa.Table) -> pa.Table:
        wk = np.asarray(b["wk"].combine_chunks(), dtype=np.int64)
        cw = np.asarray(b["cohort_wk"].combine_chunks(), dtype=np.int64)
        uid = np.asarray(b["user_id"].combine_chunks(), dtype=np.int64)
        # batch-level distinct compresses before the exchange
        key = np.stack([uid, cw, wk - cw], axis=1)
        uniq = np.unique(key, axis=0)
        return pa.table({
            "user_id": pa.array(uniq[:, 0]),
            "cohort_wk": pa.array(uniq[:, 1]),
            "wk_offset": pa.array(uniq[:, 2]),
        })

    distinct = grouped_aggregate_ds(
        joined.map_batches(offs, batch_format="pyarrow", batch_size=None),
        ["user_id", "cohort_wk", "wk_offset"], [("*", "count", "_c")])
    out = grouped_aggregate(distinct, ["cohort_wk", "wk_offset"],
                            [("*", "count", "n_users")])
    return out


@query(
    "events_user_gini",
    """
WITH c AS (
  SELECT user_id, COUNT(*) AS n FROM events GROUP BY 1
), r AS (
  SELECT n, ROW_NUMBER() OVER (ORDER BY n, user_id) AS i FROM c
), t AS (
  SELECT COUNT(*) AS k, SUM(n) AS s, SUM(i * n) AS sin FROM r
)
SELECT CAST(FLOOR(1e6 * (2.0 * sin / (k * s) - (k + 1.0) / k)) AS BIGINT)
         AS gini_micro,
       k AS n_users, CAST(s AS BIGINT) AS n_events
FROM t""",
)
def events_user_gini(sf_dir: str):
    """Activity-concentration (Gini coefficient of events per user —
    the skew/inequality audit: is the corpus dominated by a few heavy
    hitters?). Computed exactly WITHOUT sorting users: per-user counts
    hash-partition, then only the count-of-counts histogram (bounded by
    distinct activity levels) reaches the driver; the sorted-rank Gini
    formula evaluates on the histogram via cumulative arithmetic —
    ties take consecutive ranks, whose contribution depends only on
    the tie block's rank span, so the histogram form is exact."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate, grouped_aggregate_ds

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    per_user = grouped_aggregate_ds(ds, ["user_id"],
                                    [("*", "count", "n")])
    hist = grouped_aggregate(per_user, ["n"],
                             [("*", "count", "m")]).to_pandas()
    hist = hist.sort_values("n")
    n = hist["n"].to_numpy().astype(np.float64)
    m = hist["m"].to_numpy().astype(np.float64)
    k = m.sum()
    s = (n * m).sum()
    # ranks within a tie block of size m at cumulative start c0:
    # sum of ranks = m*c0 + m(m+1)/2 ; contribution = n * that sum
    c0 = np.concatenate([[0.0], np.cumsum(m)[:-1]])
    sin = (n * (m * c0 + m * (m + 1) / 2)).sum()
    gini = 2.0 * sin / (k * s) - (k + 1.0) / k
    return pa.table({
        "gini_micro": pa.array([int(np.floor(1e6 * gini))], pa.int64()),
        "n_users": pa.array([int(k)], pa.int64()),
        "n_events": pa.array([int(s)], pa.int64()),
    })


@query(
    "events_gap_quantiles",
    """
WITH o AS (
  SELECT event_type, epoch_us(ts) AS t,
         LAG(epoch_us(ts)) OVER (PARTITION BY event_type
                                 ORDER BY ts, event_id) AS prev
  FROM events
), g AS (
  SELECT event_type, CAST(FLOOR((t - prev) / 1000000.0) AS BIGINT)
           AS gap_sec
  FROM o WHERE prev IS NOT NULL
)
SELECT event_type,
       quantile_disc(gap_sec, 0.5) AS p50,
       quantile_disc(gap_sec, 0.95) AS p95,
       quantile_disc(gap_sec, 0.99) AS p99
FROM g GROUP BY 1""",
)
def events_gap_quantiles(sf_dir: str):
    """Inter-arrival-time distribution per event type (the latency /
    traffic-cadence percentiles every log pipeline dashboards): gaps
    from one segmented-diff pass per hash partition (complete types per
    partition, arrival order by (ts, event_id)), quantized to whole
    seconds (bounded distinct values — the exact-quantile histogram
    contract), then the distributed quantile kernel."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import partitioned_group_apply
    from raylog.functions.quantile import grouped_quantiles

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "event_id", "ts"])

    def gaps(part: pa.Table) -> pa.Table:
        def col(name):
            c = part[name]
            return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c

        typ = np.asarray(col("event_type"))
        eid = np.asarray(col("event_id"), dtype=np.int64)
        t = np.asarray(col("ts")).astype("datetime64[us]").astype(np.int64)
        n = len(typ)
        if n == 0:
            return pa.table({"event_type": pa.array([], pa.string()),
                             "gap_sec": pa.array([], pa.int64())})
        order = np.lexsort((eid, t, typ))
        typ_s, t_s = typ[order], t[order]
        same = np.zeros(n, dtype=bool)
        same[1:] = typ_s[1:] == typ_s[:-1]
        gap = np.empty(n, dtype=np.int64)
        gap[1:] = np.floor((t_s[1:] - t_s[:-1]) / 1e6).astype(np.int64)
        keep = same
        return pa.table({
            "event_type": pa.array(typ_s[keep]),
            "gap_sec": pa.array(gap[keep]),
        })

    gds = partitioned_group_apply(ds, ["event_type"], gaps)
    return grouped_quantiles(gds, key="event_type", value="gap_sec",
                             ps=[0.5, 0.95, 0.99],
                             out_names=["p50", "p95", "p99"])


@query(
    "events_burstiness",
    """
WITH c AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, COUNT(*) AS n
  FROM events GROUP BY 1, 2
), p AS (
  SELECT event_type, day, n,
         LAG(n) OVER (PARTITION BY event_type ORDER BY day) AS prev
  FROM c
), s AS (
  SELECT event_type,
         COUNT(*) AS k, AVG(CAST(n AS DOUBLE)) AS mu,
         VAR_SAMP(CAST(n AS DOUBLE)) AS v,
         CORR(CAST(n AS DOUBLE), CAST(prev AS DOUBLE)) AS ac1
  FROM p GROUP BY 1
)
SELECT event_type, CAST(k AS BIGINT) AS n_days,
       CAST(FLOOR(1000 * v / mu) AS BIGINT) AS fano_milli,
       CAST(FLOOR(1000 * ac1) AS BIGINT) AS autocorr_milli
FROM s""",
)
def events_burstiness(sf_dir: str):
    """Traffic burstiness + persistence per event type: Fano factor
    (variance/mean of daily counts — 1.0 = Poisson, higher = bursty)
    and lag-1 day-over-day autocorrelation (does a hot day predict the
    next). The only corpus pass is the (type, day) count aggregate;
    both statistics evaluate on that cells-bounded series driver-side,
    matching the SQL window restatement exactly (pairwise-complete
    CORR over consecutive days)."""
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts"])

    def day(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": b["event_type"],
            "day": pc.strftime(b["ts"], format="%Y-%m-%d"),
        })

    c = grouped_aggregate(
        ds.map_batches(day, batch_format="pyarrow", batch_size=None),
        ["event_type", "day"], [("*", "count", "n")]).to_pandas()
    rows = []
    for et, g in c.groupby("event_type"):
        g = g.sort_values("day")
        n = g["n"].to_numpy().astype(np.float64)
        k = len(n)
        mu = n.mean()
        v = n.var(ddof=1) if k > 1 else float("nan")
        cur, prev = n[1:], n[:-1]
        if len(cur) > 1 and cur.std(ddof=0) > 0 and prev.std(ddof=0) > 0:
            ac1 = float(np.corrcoef(cur, prev)[0, 1])
        else:
            ac1 = float("nan")
        rows.append((et, k, int(np.floor(1000 * v / mu)),
                     int(np.floor(1000 * ac1))))
    rows.sort()
    return pa.table({
        "event_type": pa.array([r[0] for r in rows], pa.string()),
        "n_days": pa.array([r[1] for r in rows], pa.int64()),
        "fano_milli": pa.array([r[2] for r in rows], pa.int64()),
        "autocorr_milli": pa.array([r[3] for r in rows], pa.int64()),
    })


@query(
    "events_markov_transitions",
    """
WITH o AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
  FROM events
), t AS (
  SELECT prev AS from_type, event_type AS to_type, COUNT(*) AS n
  FROM o WHERE prev IS NOT NULL GROUP BY 1, 2
), m AS (
  SELECT from_type, SUM(n) AS tot FROM t GROUP BY 1
)
SELECT t.from_type, t.to_type, t.n,
       CAST(FLOOR(1000.0 * t.n / m.tot) AS BIGINT) AS p_milli
FROM t JOIN m USING (from_type)""",
)
def events_markov_transitions(sf_dir: str):
    """First-order Markov transition matrix of user behavior (the
    next-event model behind session prediction / anomaly scoring):
    consecutive event-type pairs per user (arrival order), transition
    counts and row-normalized probabilities.

    One segmented-shift pass per complete-user partition produces the
    pair stream already types²-compressed per batch; the global
    combine and row normalization run on the types²-bounded matrix."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate, partitioned_group_apply

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_id", "ts",
                                  "event_type"])

    def pairs(part: pa.Table) -> pa.Table:
        def col(name):
            c = part[name]
            return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c

        uid = np.asarray(col("user_id"), dtype=np.int64)
        eid = np.asarray(col("event_id"), dtype=np.int64)
        t = np.asarray(col("ts")).astype("datetime64[us]").astype(np.int64)
        et = col("event_type").dictionary_encode()
        codes = np.asarray(et.indices, dtype=np.int64)
        n = len(uid)
        if n == 0:
            return pa.table({"from_type": pa.array([], pa.string()),
                             "to_type": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        order = np.lexsort((eid, t, uid))
        u_s, c_s = uid[order], codes[order]
        same = u_s[1:] == u_s[:-1]
        nv = len(et.dictionary)
        key = c_s[:-1][same] * nv + c_s[1:][same]
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table({
            "from_type": et.dictionary.take(pa.array(uk // nv)),
            "to_type": et.dictionary.take(pa.array(uk % nv)),
            "n": pa.array(cnt.astype(np.int64)),
        })

    pr = partitioned_group_apply(ds, ["user_id"], pairs)
    mat = grouped_aggregate(pr, ["from_type", "to_type"],
                            [("n", "sum", "n")]).to_pandas()
    tot = mat.groupby("from_type")["n"].transform("sum").to_numpy()
    nn = mat["n"].to_numpy().astype(np.float64)
    return pa.table({
        "from_type": pa.array(mat["from_type"], pa.string()),
        "to_type": pa.array(mat["to_type"], pa.string()),
        "n": pa.array(mat["n"].to_numpy().astype(np.int64)),
        "p_milli": pa.array(np.floor(1000.0 * nn / tot).astype(np.int64)),
    })


@query(
    "basket_pair_lift",
    """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
nn AS (SELECT COUNT(DISTINCT l_orderkey) AS orders FROM lineitem),
ic AS (SELECT l_partkey, COUNT(*) AS c FROM li GROUP BY 1),
pc AS (SELECT a.l_partkey AS p1, b.l_partkey AS p2, COUNT(*) AS n
       FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
                          AND a.l_partkey < b.l_partkey
       GROUP BY 1, 2),
l AS (SELECT pc.p1, pc.p2, pc.n,
             pc.n * nn.orders * 1.0 / (x.c * y.c) AS lift
      FROM pc JOIN ic x ON pc.p1 = x.l_partkey
              JOIN ic y ON pc.p2 = y.l_partkey
      CROSS JOIN nn WHERE pc.n >= 2)
SELECT p1, p2, n, CAST(FLOOR(1000 * lift) AS BIGINT) AS lift_milli
FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY lift DESC, p1, p2) AS rn
      FROM l)
WHERE rn <= 20""",
)
def basket_pair_lift(sf_dir: str):
    """Association-rule mining (market-basket co-occurrence): top-20
    part pairs by lift = P(a,b)·N / (count(a)·count(b)) across orders,
    pair support ≥ 2 — the Apriori first pass.

    Baskets are tiny (≤ ~12 items), so pair expansion is quadratic
    only within a basket: complete-order partitions emit each basket's
    sorted-distinct pairs via repeat/arange arithmetic (no Python
    per-order loop); pair counts and item supports each flow through
    the hash-partitioned aggregate; lift evaluates on the
    support-filtered pair table and selection is partial top-k."""
    import numpy as np
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    from raylog.functions.agg import (grouped_aggregate,
                                      grouped_aggregate_ds,
                                      partitioned_group_apply)
    from raylog.functions.topk import topk

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])

    def pairs(part: pa.Table) -> pa.Table:
        ok = np.asarray(part["l_orderkey"].combine_chunks(), dtype=np.int64)
        pk = np.asarray(part["l_partkey"].combine_chunks(), dtype=np.int64)
        if len(ok) == 0:
            return pa.table({"p1": pa.array([], pa.int64()),
                             "p2": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        uniq = np.unique(np.stack([ok, pk], axis=1), axis=0)
        o_s, p_s = uniq[:, 0], uniq[:, 1]  # sorted by (order, part)
        starts = np.ones(len(o_s), dtype=bool)
        starts[1:] = o_s[1:] != o_s[:-1]
        m = np.diff(np.concatenate([np.flatnonzero(starts), [len(o_s)]]))
        base = np.concatenate([[0], np.cumsum(m)[:-1]])
        npairs = m * (m - 1) // 2
        tot = int(npairs.sum())
        if tot == 0:
            return pa.table({"p1": pa.array([], pa.int64()),
                             "p2": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        # enumerate (i, j) i<j within each basket via triangular index
        grp = np.repeat(np.arange(len(m)), npairs)
        local = np.arange(tot) - np.repeat(
            np.concatenate([[0], np.cumsum(npairs)[:-1]]), npairs)
        mm = m[grp].astype(np.float64)
        i = (np.floor((2 * mm - 1 - np.sqrt((2 * mm - 1) ** 2
                                            - 8 * local)) / 2)
             ).astype(np.int64)
        j = (local - (i * (2 * m[grp] - i - 1)) // 2 + i + 1).astype(
            np.int64)
        a = p_s[base[grp] + i]
        b = p_s[base[grp] + j]
        key = np.stack([a, b], axis=1)
        uk, cnt = np.unique(key, axis=0, return_counts=True)
        return pa.table({"p1": pa.array(uk[:, 0]),
                         "p2": pa.array(uk[:, 1]),
                         "n": pa.array(cnt.astype(np.int64))})

    pr = partitioned_group_apply(ds, ["l_orderkey"], pairs)
    pair_counts = grouped_aggregate_ds(pr, ["p1", "p2"],
                                       [("n", "sum", "n")])

    def order_items(b: pa.Table) -> pa.Table:
        ok = np.asarray(b["l_orderkey"].combine_chunks(), dtype=np.int64)
        pk = np.asarray(b["l_partkey"].combine_chunks(), dtype=np.int64)
        uniq = np.unique(np.stack([ok, pk], axis=1), axis=0)
        return pa.table({"l_orderkey": pa.array(uniq[:, 0]),
                         "l_partkey": pa.array(uniq[:, 1])})

    li = grouped_aggregate_ds(
        ds.map_batches(order_items, batch_format="pyarrow",
                       batch_size=None),
        ["l_orderkey", "l_partkey"], [("*", "count", "_c")])
    ic = grouped_aggregate(li, ["l_partkey"],
                           [("*", "count", "c")]).to_pandas()
    n_orders = float(grouped_aggregate(
        li, ["l_orderkey"], [("*", "count", "_c")]).num_rows)
    supp = dict(zip(ic["l_partkey"].astype(int), ic["c"].astype(float)))
    ref = ray.put(supp) if ray.is_initialized() else supp

    def lift(b: pa.Table) -> pa.Table:
        s = ray.get(ref) if ray.is_initialized() else ref
        n = np.asarray(b["n"].combine_chunks(), dtype=np.float64)
        keep = n >= 2
        b2 = b.filter(pa.array(keep))
        if b2.num_rows == 0:
            return pa.table({"p1": pa.array([], pa.int64()),
                             "p2": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "lift": pa.array([], pa.float64())})
        p1 = b2["p1"].to_pylist()
        p2 = b2["p2"].to_pylist()
        ca = np.array([s[x] for x in p1])
        cb = np.array([s[x] for x in p2])
        lv = n[keep] * n_orders / (ca * cb)
        return pa.table({"p1": b2["p1"], "p2": b2["p2"],
                         "n": pc.cast(b2["n"], pa.int64()),
                         "lift": pa.array(lv, pa.float64())})

    scored = pair_counts.map_batches(lift, batch_format="pyarrow",
                                     batch_size=None)
    best = topk(scored, sort_cols=["lift", "p1", "p2"],
                descending=[True, False, False], k=20)
    return pa.table({
        "p1": best["p1"], "p2": best["p2"], "n": best["n"],
        "lift_milli": pc.cast(pc.floor(pc.multiply(best["lift"],
                                                   pa.scalar(1000.0))),
                              pa.int64()),
    })


@query(
    "events_time_weighted_avg",
    """
WITH o AS (
  SELECT user_id, value, epoch_us(ts) AS t,
         LEAD(epoch_us(ts)) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS nxt
  FROM events
), w AS (
  SELECT user_id, value, (nxt - t) AS dur FROM o WHERE nxt IS NOT NULL
)
SELECT user_id,
       CAST(FLOOR(1e6 * SUM(value * dur) / SUM(dur)) AS BIGINT)
         AS twa_micro,
       CAST(SUM(dur) AS BIGINT) AS span_us
FROM w GROUP BY 1""",
)
def events_time_weighted_avg(sf_dir: str):
    """Time-weighted average of a metric per entity (the TWAP /
    duration-weighted gauge every telemetry backend provides — a value
    holds until the next observation): segment-aware LEAD durations
    from one sorted pass per complete-user partition, then a plain
    weighted-sum aggregate. Exchange = per-user partials only."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import partitioned_group_apply

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_id", "ts", "value"])

    def twa(part: pa.Table) -> pa.Table:
        def col(name):
            c = part[name]
            return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c

        uid = np.asarray(col("user_id"), dtype=np.int64)
        eid = np.asarray(col("event_id"), dtype=np.int64)
        t = np.asarray(col("ts")).astype("datetime64[us]").astype(np.int64)
        v = np.asarray(col("value"), dtype=np.float64)
        n = len(uid)
        if n == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "twa_micro": pa.array([], pa.int64()),
                             "span_us": pa.array([], pa.int64())})
        order = np.lexsort((eid, t, uid))
        u_s, t_s, v_s = uid[order], t[order], v[order]
        same = np.zeros(n, dtype=bool)
        same[:-1] = u_s[1:] == u_s[:-1]
        dur = np.zeros(n, dtype=np.int64)
        dur[:-1] = t_s[1:] - t_s[:-1]
        dur[~same] = 0
        wsum = np.zeros(n, dtype=np.float64)
        np.multiply(v_s, dur, out=wsum)
        starts = np.ones(n, dtype=bool)
        starts[1:] = u_s[1:] != u_s[:-1]
        sid = np.cumsum(starts) - 1
        k = int(starts.sum())
        tot_w = np.bincount(sid, weights=wsum, minlength=k)
        tot_d = np.bincount(sid, weights=dur, minlength=k)
        users = u_s[np.flatnonzero(starts)]
        keep = tot_d > 0
        return pa.table({
            "user_id": pa.array(users[keep]),
            "twa_micro": pa.array(np.floor(
                1e6 * tot_w[keep] / tot_d[keep]).astype(np.int64)),
            "span_us": pa.array(tot_d[keep].astype(np.int64)),
        })

    return partitioned_group_apply(ds, ["user_id"], twa)


@query(
    "events_null_audit",
    """
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS null_user_id,
       CAST(SUM(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS null_event_type,
       CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS null_value,
       CAST(SUM(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS null_props
FROM events""",
)
def events_null_audit(sf_dir: str):
    """Data-quality null audit (the schema-health report an ingestion
    pipeline publishes per batch): per-column null counts in one
    streaming pass of constant-size partials — Arrow null bitmaps make
    each column's count a popcount, no value scan."""
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate

    COLS = ["user_id", "event_type", "value", "props"]
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=COLS)

    def partial(b: pa.Table) -> pa.Table:
        out = {"n_rows": pa.array([b.num_rows], pa.int64())}
        for c in COLS:
            out[f"null_{c}"] = pa.array([b[c].null_count], pa.int64())
        out["_k"] = pa.array([0], pa.int64())
        return pa.table(out)

    agg = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        ["_k"],
        [("n_rows", "sum", "n_rows")]
        + [(f"null_{c}", "sum", f"null_{c}") for c in COLS])
    return agg.drop_columns(["_k"])


@query(
    "ri_audit",
    """
SELECT
  (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
   WHERE NOT EXISTS (SELECT 1 FROM orders o
                     WHERE o.o_orderkey = l.l_orderkey))
    AS orphan_lineitems,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM orders o
   WHERE NOT EXISTS (SELECT 1 FROM customer c
                     WHERE c.c_custkey = o.o_custkey))
    AS orphan_orders,
  (SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) FROM orders)
    AS active_customers,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM customer) AS customers""",
)
def ri_audit(sf_dir: str):
    """Referential-integrity audit across the star schema (the
    ingestion health check: orphan facts, dangling foreign keys, dim
    coverage). Each orphan count is a Bloom-prefiltered anti-join —
    distinct keys of the small side broadcast as a sorted array, facts
    stream one searchsorted membership pass; counts are the only
    exchange."""
    import numpy as np
    import ray
    import ray.data as rd

    def keys_of(table: str, col: str) -> np.ndarray:
        ds = rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=[col])
        parts = [np.unique(np.asarray(b[col].combine_chunks(),
                                      dtype=np.int64))
                 for b in ds.iter_batches(batch_format="pyarrow",
                                          batch_size=None)]
        return np.unique(np.concatenate(parts)) if parts else \
            np.array([], dtype=np.int64)

    def orphan_count(table: str, col: str, ref_keys: np.ndarray) -> int:
        ref = ray.put(ref_keys) if ray.is_initialized() else ref_keys
        ds = rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=[col])

        def miss(b: pa.Table) -> pa.Table:
            ks = ray.get(ref) if ray.is_initialized() else ref
            x = np.asarray(b[col].combine_chunks(), dtype=np.int64)
            pos = np.clip(np.searchsorted(ks, x), 0, max(len(ks) - 1, 0))
            n_miss = int((ks[pos] != x).sum()) if len(ks) else len(x)
            return pa.table({"m": pa.array([n_miss], pa.int64())})

        return int(ds.map_batches(miss, batch_format="pyarrow",
                                  batch_size=None).sum("m"))

    okeys = keys_of("orders", "o_orderkey")
    ckeys = keys_of("customer", "c_custkey")
    ocust = keys_of("orders", "o_custkey")
    n_cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                             columns=["c_custkey"]).count()
    return pa.table({
        "orphan_lineitems": pa.array(
            [orphan_count("lineitem", "l_orderkey", okeys)], pa.int64()),
        "orphan_orders": pa.array(
            [orphan_count("orders", "o_custkey", ckeys)], pa.int64()),
        "active_customers": pa.array([len(ocust)], pa.int64()),
        "customers": pa.array([n_cust], pa.int64()),
    })


@query(
    "events_ewma_daily",
    """
WITH c AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, COUNT(*) AS n
  FROM events GROUP BY 1, 2
), r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS i
  FROM c
), e AS (
  SELECT a.event_type, a.day, a.n,
         SUM(b.n * CASE WHEN b.i = 1 THEN POWER(0.5, a.i - 1)
                        ELSE 0.5 * POWER(0.5, a.i - b.i) END) AS ew
  FROM r a JOIN r b ON a.event_type = b.event_type AND b.i <= a.i
  GROUP BY 1, 2, 3
)
SELECT event_type, day, n, CAST(FLOOR(1000 * ew) AS BIGINT) AS ewma_milli
FROM e""",
)
def events_ewma_daily(sf_dir: str):
    """EWMA-smoothed daily volume per type (the smoothed trend line
    behind every ops dashboard and its alert baseline). The corpus pass
    is the (type, day) count aggregate; the recursive smoothing runs on
    the cells-bounded series — inherently sequential per series, and
    the series is days-long, not data-long, so that is the right place
    for it. alpha = 0.5 deliberately: every EWMA value is then an exact
    binary fraction, so the recursion here and the POWER-sum window
    restatement in DuckDB agree bit-for-bit (a decimal alpha lands
    float noise exactly on FLOOR boundaries — measured)."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate
    import pyarrow.compute as pc

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts"])

    def day(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": b["event_type"],
            "day": pc.strftime(b["ts"], format="%Y-%m-%d"),
        })

    c = grouped_aggregate(
        ds.map_batches(day, batch_format="pyarrow", batch_size=None),
        ["event_type", "day"], [("*", "count", "n")]).to_pandas()
    out = []
    for et, g in c.groupby("event_type"):
        g = g.sort_values("day")
        x = g["n"].to_numpy().astype(np.float64)
        e = np.empty(len(x))
        e[0] = x[0]
        for i in range(1, len(x)):
            e[i] = 0.5 * x[i] + 0.5 * e[i - 1]
        for d, n, ew in zip(g["day"], g["n"], e):
            out.append((et, d, int(n), int(np.floor(1000 * ew))))
    out.sort()
    return pa.table({
        "event_type": pa.array([r[0] for r in out], pa.string()),
        "day": pa.array([r[1] for r in out], pa.string()),
        "n": pa.array([r[2] for r in out], pa.int64()),
        "ewma_milli": pa.array([r[3] for r in out], pa.int64()),
    })


@query(
    "orders_benford_audit",
    """
WITH d AS (
  SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR),
              1, 1) AS BIGINT) AS digit
  FROM orders WHERE o_totalprice >= 1
), c AS (
  SELECT digit, COUNT(*) AS n FROM d GROUP BY 1
), t AS (SELECT SUM(n) AS tot FROM c)
SELECT c.digit, c.n,
       CAST(FLOOR(1e6 * c.n / t.tot) AS BIGINT) AS observed_micro,
       CAST(FLOOR(1e6 * ln(1.0 + 1.0 / c.digit) / ln(10.0)) AS BIGINT)
         AS benford_micro
FROM c CROSS JOIN t""",
)
def orders_benford_audit(sf_dir: str):
    """Benford's-law leading-digit audit of order totals (the synthetic
    / fabricated-data forensic: natural multiplicative quantities
    follow P(d) = log10(1 + 1/d); uniform generators do not).
    Leading digit extracted vectorized from the integer part's decimal
    magnitude, digit counts are a 9-row aggregate, expectations join
    driver-side. One streaming pass."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_totalprice"])

    def digit(b: pa.Table) -> pa.Table:
        x = np.asarray(b["o_totalprice"].combine_chunks(),
                       dtype=np.float64)
        xi = x.astype(np.int64)
        lead = xi[xi >= 1]
        # exact integer strip (≤19 passes) — float log10 is off-by-one
        # ulp on exact powers of ten
        while (lead >= 10).any():
            big = lead >= 10
            lead[big] //= 10
        return pa.table({"digit": pa.array(lead.astype(np.int64))})

    c = grouped_aggregate(
        ds.map_batches(digit, batch_format="pyarrow", batch_size=None),
        ["digit"], [("*", "count", "n")]).to_pandas().sort_values("digit")
    tot = float(c["n"].sum())
    d = c["digit"].to_numpy().astype(np.float64)
    return pa.table({
        "digit": pa.array(c["digit"].to_numpy().astype(np.int64)),
        "n": pa.array(c["n"].to_numpy().astype(np.int64)),
        "observed_micro": pa.array(
            np.floor(1e6 * c["n"].to_numpy() / tot).astype(np.int64)),
        "benford_micro": pa.array(
            np.floor(1e6 * np.log(1.0 + 1.0 / d) / np.log(10.0))
            .astype(np.int64)),
    })


@query(
    "docs_ks_by_source",
    """
WITH c AS (SELECT source, n_chars AS v, COUNT(*) AS n
           FROM documents GROUP BY 1, 2),
vals AS (SELECT DISTINCT n_chars AS v FROM documents),
srcs AS (SELECT DISTINCT source FROM documents),
grid AS (SELECT s.source, va.v, COALESCE(c.n, 0) AS n
         FROM srcs s CROSS JOIN vals va
         LEFT JOIN c ON c.source = s.source AND c.v = va.v),
cum AS (SELECT source, v,
               SUM(n) OVER (PARTITION BY source ORDER BY v) AS cs,
               SUM(n) OVER (PARTITION BY source) AS ns
        FROM grid),
tot AS (SELECT v, SUM(n) OVER (ORDER BY v) AS ct, SUM(n) OVER () AS nt
        FROM (SELECT v, SUM(n) AS n FROM grid GROUP BY 1)),
d AS (SELECT cum.source,
             abs(cum.cs * 1.0 / cum.ns
                 - (tot.ct - cum.cs) * 1.0 / (tot.nt - cum.ns)) AS dv
      FROM cum JOIN tot USING (v))
SELECT source, CAST(FLOOR(1000 * MAX(dv)) AS BIGINT) AS ks_milli
FROM d GROUP BY 1""",
)
def docs_ks_by_source(sf_dir: str):
    """Two-sample Kolmogorov-Smirnov statistic per source (each
    source's length distribution vs the rest of the corpus — the
    distribution-shift audit behind "is this source sampled from the
    same population?"). The only corpus pass is the (source, value)
    count aggregate (sources × distinct-lengths bounded); empirical
    CDFs and the sup-norm evaluate on that grid with the SAME float
    expression as the SQL restatement (exact integer operands → the
    doubles agree bit-for-bit)."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["source", "n_chars"])
    c = grouped_aggregate(ds, ["source", "n_chars"],
                          [("*", "count", "n")]).to_pandas()
    piv = c.pivot_table(index="n_chars", columns="source", values="n",
                        fill_value=0, aggfunc="sum").sort_index()
    mat = piv.to_numpy().astype(np.int64)           # values × sources
    cs = np.cumsum(mat, axis=0).astype(np.float64)  # per-source cum
    ns = mat.sum(axis=0).astype(np.float64)
    ct = cs.sum(axis=1)                             # global cum (exact)
    nt = float(ns.sum())
    dv = np.abs(cs * 1.0 / ns - (ct[:, None] - cs) * 1.0 / (nt - ns))
    ks = dv.max(axis=0)
    return pa.table({
        "source": pa.array(list(piv.columns), pa.string()),
        "ks_milli": pa.array(np.floor(1000 * ks).astype(np.int64)),
    })


@query(
    "dedup_cluster_sizes",
    "WITH RECURSIVE " + _NGRAM_PAIRS_CTE + """
, sizes AS (
  SELECT cluster_id, COUNT(*) AS sz FROM cc GROUP BY 1
)
SELECT sz, COUNT(*) AS n_clusters FROM sizes GROUP BY 1""",
)
def dedup_cluster_sizes(sf_dir: str):
    """Duplication profile: near-dup cluster size histogram (how much
    of the corpus is duplicated, and in how large families — the
    summary a dedup report leads with). Cluster labels come from the
    distributed connected-components pass; sizes are a per-label count
    (high-cardinality-safe), the histogram is a count-of-counts — the
    same two-level shape as the Gini query."""
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate, grouped_aggregate_ds
    from raylog.functions.cc import connected_components
    from raylog.functions.dedup import ngram_jaccard_pairs

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    pairs = ngram_jaccard_pairs(docs, threshold=0.3)
    cc = connected_components(docs.select_columns(["doc_id"]), pairs)
    sizes = grouped_aggregate_ds(cc, ["cluster_id"],
                                 [("*", "count", "sz")])
    return grouped_aggregate(sizes, ["sz"], [("*", "count", "n_clusters")])


@query(
    "text_zipf_exponent",
    """
WITH words AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
wc AS (SELECT w, COUNT(*) AS c FROM words GROUP BY 1),
r AS (SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, w) AS rank FROM wc),
f AS (SELECT ln(CAST(rank AS DOUBLE)) AS x, ln(CAST(c AS DOUBLE)) AS y
      FROM r WHERE rank <= 1000)
SELECT CAST(COUNT(*) AS BIGINT) AS n_ranks,
       CAST(FLOOR(1e6 * REGR_SLOPE(y, x)) AS BIGINT) AS zipf_slope_micro,
       CAST(FLOOR(1e6 * REGR_R2(y, x)) AS BIGINT) AS r2_micro
FROM f""",
)
def text_zipf_exponent(sf_dir: str):
    """Zipf-law fit of the word frequency distribution (the canonical
    corpus-health statistic: natural language has rank-frequency slope
    ≈ -1; templated/synthetic text deviates): log-log least-squares
    over the top-1000 ranks, slope + R².

    Word counts flow through the hash-partitioned aggregate; ranking
    the top-1000 is a partial top-k; the regression is closed-form on
    1000 points driver-side. Same five-moment arithmetic as
    `events_user_trend`, restated exactly in SQL REGR_* form."""
    import numpy as np
    import ray.data as rd
    import pyarrow.compute as pc

    from raylog.functions.agg import grouped_aggregate_ds
    from raylog.functions.topk import topk

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def wcounts(b: pa.Table) -> pa.Table:
        split = pc.split_pattern(b["text"].combine_chunks(), " ")
        flat = split.flatten().dictionary_encode()
        codes = np.asarray(flat.indices, dtype=np.int64)
        uc, cnt = np.unique(codes, return_counts=True)
        return pa.table({"w": flat.dictionary.take(pa.array(uc)),
                         "c": pa.array(cnt, pa.int64())})

    wc = grouped_aggregate_ds(
        ds.map_batches(wcounts, batch_format="pyarrow", batch_size=None),
        ["w"], [("c", "sum", "c")])
    top = topk(wc, sort_cols=["c", "w"], descending=[True, False], k=1000)
    c = np.asarray(top["c"], dtype=np.float64)
    rank = np.arange(1, len(c) + 1, dtype=np.float64)
    x, y = np.log(rank), np.log(c)
    n = float(len(x))
    sx, sy, sxy, sxx, syy = x.sum(), y.sum(), (x * y).sum(), \
        (x * x).sum(), (y * y).sum()
    slope = (sxy - sx * sy / n) / (sxx - sx * sx / n)
    r2 = ((sxy - sx * sy / n) ** 2
          / ((sxx - sx * sx / n) * (syy - sy * sy / n)))
    return pa.table({
        "n_ranks": pa.array([int(n)], pa.int64()),
        "zipf_slope_micro": pa.array([int(np.floor(1e6 * slope))],
                                     pa.int64()),
        "r2_micro": pa.array([int(np.floor(1e6 * r2))], pa.int64()),
    })


@query(
    "events_entropy_rate",
    """
WITH o AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
  FROM events
), t AS (
  SELECT prev AS a, event_type AS b, COUNT(*) AS n
  FROM o WHERE prev IS NOT NULL GROUP BY 1, 2
), m AS (SELECT a, SUM(n) AS na FROM t GROUP BY 1),
tot AS (SELECT SUM(n) AS nn FROM t)
SELECT CAST(tot.nn AS BIGINT) AS n_transitions,
       CAST(FLOOR(1e6 * SUM((t.n * 1.0 / tot.nn)
            * -ln(t.n * 1.0 / m.na) / ln(2.0))) AS BIGINT)
         AS h_cond_micro
FROM t JOIN m USING (a) CROSS JOIN tot
GROUP BY tot.nn""",
)
def events_entropy_rate(sf_dir: str):
    """Behavioral predictability: the first-order entropy rate
    H(next | prev) in bits over the event-type Markov chain (low =
    deterministic habits, high = noise — the sessionization QA metric).
    Reuses the transition-pair machinery (segmented shift per
    complete-user partition, types²-bounded matrix); the entropy sum
    evaluates on that tiny matrix driver-side."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate, partitioned_group_apply

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_id", "ts",
                                  "event_type"])

    def pairs(part: pa.Table) -> pa.Table:
        def col(name):
            c = part[name]
            return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c

        uid = np.asarray(col("user_id"), dtype=np.int64)
        eid = np.asarray(col("event_id"), dtype=np.int64)
        t = np.asarray(col("ts")).astype("datetime64[us]").astype(np.int64)
        et = col("event_type").dictionary_encode()
        codes = np.asarray(et.indices, dtype=np.int64)
        n = len(uid)
        if n == 0:
            return pa.table({"a": pa.array([], pa.string()),
                             "b": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        order = np.lexsort((eid, t, uid))
        u_s, c_s = uid[order], codes[order]
        same = u_s[1:] == u_s[:-1]
        nv = len(et.dictionary)
        key = c_s[:-1][same] * nv + c_s[1:][same]
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table({
            "a": et.dictionary.take(pa.array(uk // nv)),
            "b": et.dictionary.take(pa.array(uk % nv)),
            "n": pa.array(cnt.astype(np.int64)),
        })

    pr = partitioned_group_apply(ds, ["user_id"], pairs)
    mat = grouped_aggregate(pr, ["a", "b"], [("n", "sum", "n")]).to_pandas()
    na = mat.groupby("a")["n"].transform("sum").to_numpy().astype(np.float64)
    nn = float(mat["n"].sum())
    p = mat["n"].to_numpy().astype(np.float64)
    h = ((p / nn) * -np.log(p / na) / np.log(2.0)).sum()
    return pa.table({
        "n_transitions": pa.array([int(nn)], pa.int64()),
        "h_cond_micro": pa.array([int(np.floor(1e6 * h))], pa.int64()),
    })


@query(
    "log_slo_report",
    _P() + """
SELECT source,
       COUNT(*) AS n_lines,
       CAST(SUM(CASE WHEN upper(level) = 'ERROR' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_errors,
       CAST(FLOOR(1e6 * SUM(CASE WHEN upper(level) = 'ERROR' THEN 1
                                 ELSE 0 END) * 1.0 / COUNT(*)) AS BIGINT)
         AS err_rate_micro,
       SUM(CASE WHEN upper(level) = 'ERROR' THEN 1 ELSE 0 END) * 1.0
         / COUNT(*) > 0.01 AS slo_violated
FROM recs2 GROUP BY source""",
)
def log_slo_report(sf_dir: str):
    """Per-source error-rate SLO report (the availability dashboard a
    log pipeline feeds: error fraction vs a 1% budget, violation
    flag). Level comes from the engine's own parse chain; counts are
    sources-bounded partial+tree aggregates — one streaming pass over
    the parsed stream."""
    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate
    from raylog.pipelines import log_pipeline as LP
    from raylog.stages import parse

    ds = LP.parsed_ds(LP.records_ds(sf_dir))
    ds = ds.map_batches(lambda b: parse.erda_info(b, key="log"),
                        batch_format="pyarrow")

    def flags(b: pa.Table) -> pa.Table:
        lvl = b["level"].combine_chunks()
        is_err = pc.equal(pc.utf8_upper(pc.fill_null(lvl, "")),
                          pa.scalar("ERROR"))
        return pa.table({
            "source": b["source"],
            "e": pc.cast(is_err, pa.int64()),
        })

    agg = grouped_aggregate(
        ds.map_batches(flags, batch_format="pyarrow", batch_size=None),
        ["source"], [("*", "count", "n_lines"), ("e", "sum", "n_errors")])
    n = np.asarray(agg["n_lines"], dtype=np.float64)
    e = np.asarray(agg["n_errors"], dtype=np.float64)
    return pa.table({
        "source": agg["source"],
        "n_lines": agg["n_lines"],
        "n_errors": agg["n_errors"],
        "err_rate_micro": pa.array(np.floor(1e6 * e / n).astype(np.int64)),
        "slo_violated": pa.array(e / n > 0.01),
    })


@query(
    "events_anomaly_robust",
    """
WITH c AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, COUNT(*) AS n
  FROM events GROUP BY 1, 2
), m AS (
  SELECT event_type, quantile_disc(n, 0.5) AS med FROM c GROUP BY 1
), a AS (
  SELECT c.event_type, c.day, c.n, m.med, abs(c.n - m.med) AS adev
  FROM c JOIN m USING (event_type)
), md AS (
  SELECT event_type, quantile_disc(adev, 0.5) AS mad FROM a GROUP BY 1
)
SELECT a.event_type, a.day, a.n,
       a.n - a.med > 3 * md.mad AS is_spike
FROM a JOIN md USING (event_type) WHERE md.mad > 0""",
)
def events_anomaly_robust(sf_dir: str):
    """Robust (median/MAD) daily-volume spike detection — the
    outlier-resistant twin of `events_anomaly`: a single extreme day
    inflates mean/std and hides itself, but not the median/MAD fences
    (spike = count > median + 3·MAD, all integer-exact arithmetic).
    The corpus pass is the (type, day) count aggregate; medians come
    from the cells-bounded series."""
    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts"])

    def day(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": b["event_type"],
            "day": pc.strftime(b["ts"], format="%Y-%m-%d"),
        })

    c = grouped_aggregate(
        ds.map_batches(day, batch_format="pyarrow", batch_size=None),
        ["event_type", "day"], [("*", "count", "n")]).to_pandas()
    out = []
    for et, g in c.groupby("event_type"):
        n = np.sort(g["n"].to_numpy().astype(np.int64))
        med = int(n[(len(n) - 1) // 2])  # quantile_disc(0.5) rank rule
        adev = np.sort(np.abs(g["n"].to_numpy().astype(np.int64) - med))
        mad = int(adev[(len(adev) - 1) // 2])
        if mad <= 0:
            continue
        for d, cnt in zip(g["day"], g["n"]):
            out.append((et, d, int(cnt), int(cnt) - med > 3 * mad))
    out.sort()
    return pa.table({
        "event_type": pa.array([r[0] for r in out], pa.string()),
        "day": pa.array([r[1] for r in out], pa.string()),
        "n": pa.array([r[2] for r in out], pa.int64()),
        "is_spike": pa.array([r[3] for r in out], pa.bool_()),
    })


@query(
    "docs_histogram_by_source",
    """
WITH s AS (
  SELECT source, CAST(MIN(n_chars) AS DOUBLE) AS lo,
         CAST(MAX(n_chars) AS DOUBLE) AS hi
  FROM documents GROUP BY 1
)
SELECT d.source,
       LEAST(CAST(FLOOR((d.n_chars - s.lo) * 16.0 / (s.hi - s.lo + 1.0))
                  AS BIGINT), 15) AS bin,
       COUNT(*) AS n
FROM documents d JOIN s USING (source)
GROUP BY 1, 2""",
)
def docs_histogram_by_source(sf_dir: str):
    """Per-group fixed-bin histogram (the faceted distribution panel of
    a data-quality dashboard): each source gets 16 bins over its own
    [min, max]. Pass 1 is a sources-bounded min/max aggregate
    (broadcast); pass 2 emits (source, bin) count partials — exchange
    bounded by sources × 16, independent of rows (the grouped form of
    `docs_histogram`)."""
    import numpy as np
    import ray
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate

    NBINS = 16
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["source", "n_chars"])
    mm = grouped_aggregate(ds, ["source"],
                           [("n_chars", "min", "lo"),
                            ("n_chars", "max", "hi")]).to_pandas()
    lut = {r.source: (float(r.lo), float(r.hi)) for r in mm.itertuples()}
    ref = ray.put(lut) if ray.is_initialized() else lut

    def bins(b: pa.Table) -> pa.Table:
        m = ray.get(ref) if ray.is_initialized() else ref
        src = b["source"].to_pylist()
        x = np.asarray(b["n_chars"].combine_chunks(), dtype=np.float64)
        lo = np.array([m[s][0] for s in src])
        hi = np.array([m[s][1] for s in src])
        bn = np.minimum(np.floor((x - lo) * NBINS / (hi - lo + 1.0))
                        .astype(np.int64), NBINS - 1)
        return pa.table({"source": b["source"], "bin": pa.array(bn)})

    return grouped_aggregate(
        ds.map_batches(bins, batch_format="pyarrow", batch_size=None),
        ["source", "bin"], [("*", "count", "n")])


@query(
    "events_dod_returning",
    """
WITH a AS (
  SELECT DISTINCT user_id,
         CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) AS d
  FROM events
)
SELECT b.d AS day_epoch, COUNT(*) AS returning_users
FROM a b JOIN a p ON p.user_id = b.user_id AND p.d = b.d - 1
GROUP BY 1""",
)
def events_dod_returning(sf_dir: str):
    """Day-over-day returning users (the stickiness/churn series): for
    each day, how many active users were also active the previous day.

    No self-join: users hash-partition complete, each partition sorts
    its (user, day) pairs once and a segmented diff==1 test emits
    (day, 1) partials — the exchange is days-bounded counts. The same
    consecutive-pair trick as the Markov/watermark kernels."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate, partitioned_group_apply

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])

    def pairs(part: pa.Table) -> pa.Table:
        def col(name):
            c = part[name]
            return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c

        uid = np.asarray(col("user_id"), dtype=np.int64)
        t = np.asarray(col("ts")).astype("datetime64[us]").astype(np.int64)
        d = np.floor(t / 1e6 / 86400).astype(np.int64)
        if len(uid) == 0:
            return pa.table({"day_epoch": pa.array([], pa.int64())})
        uniq = np.unique(np.stack([uid, d], axis=1), axis=0)
        u_s, d_s = uniq[:, 0], uniq[:, 1]
        consec = (u_s[1:] == u_s[:-1]) & (d_s[1:] - d_s[:-1] == 1)
        return pa.table({"day_epoch": pa.array(d_s[1:][consec])})

    pr = partitioned_group_apply(ds, ["user_id"], pairs)
    return grouped_aggregate(pr, ["day_epoch"],
                             [("*", "count", "returning_users")])


@query(
    "events_changepoint",
    """
WITH c AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, COUNT(*) AS n
  FROM events GROUP BY 1, 2
), s AS (
  SELECT event_type, day, n,
         SUM(n) OVER (PARTITION BY event_type ORDER BY day) AS cum,
         SUM(n) OVER (PARTITION BY event_type) AS tot,
         COUNT(*) OVER (PARTITION BY event_type) AS k,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS i
  FROM c
), d AS (
  SELECT event_type, day,
         abs(cum - i * (tot * 1.0 / k)) AS cusum
  FROM s WHERE i < k
)
SELECT event_type, day AS change_day,
       CAST(FLOOR(1000 * cusum) AS BIGINT) AS cusum_milli
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                                   ORDER BY cusum DESC, day) AS rn
      FROM d)
WHERE rn = 1""",
)
def events_changepoint(sf_dir: str):
    """Changepoint detection per event type (the at-most-one-change
    CUSUM scan statistic: the day where the centered cumulative sum of
    daily counts peaks marks the most likely level shift). One
    (type, day) count pass; the scan statistic evaluates on the
    cells-bounded series with the identical float expression as the
    SQL window restatement."""
    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts"])

    def day(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": b["event_type"],
            "day": pc.strftime(b["ts"], format="%Y-%m-%d"),
        })

    c = grouped_aggregate(
        ds.map_batches(day, batch_format="pyarrow", batch_size=None),
        ["event_type", "day"], [("*", "count", "n")]).to_pandas()
    out = []
    for et, g in c.groupby("event_type"):
        g = g.sort_values("day")
        n = g["n"].to_numpy().astype(np.int64)
        k = len(n)
        if k < 2:
            continue
        cum = np.cumsum(n).astype(np.float64)
        i = np.arange(1, k + 1, dtype=np.float64)
        tot = float(n.sum())
        cusum = np.abs(cum - i * (tot * 1.0 / k))
        cusum = cusum[:-1]  # i < k (the last point is always 0)
        best = int(np.argmax(cusum))  # first max = earliest day tie-break
        out.append((et, g["day"].iloc[best],
                    int(np.floor(1000 * cusum[best]))))
    out.sort()
    return pa.table({
        "event_type": pa.array([r[0] for r in out], pa.string()),
        "change_day": pa.array([r[1] for r in out], pa.string()),
        "cusum_milli": pa.array([r[2] for r in out], pa.int64()),
    })


@query(
    "events_pareto_users",
    """
WITH c AS (
  SELECT user_id, COUNT(*) AS n FROM events GROUP BY 1
), r AS (
  SELECT user_id, n,
         SUM(n) OVER (ORDER BY n DESC, user_id) AS cum,
         SUM(n) OVER () AS tot,
         ROW_NUMBER() OVER (ORDER BY n DESC, user_id) AS i,
         COUNT(*) OVER () AS k
  FROM c
)
SELECT CAST(MIN(i) AS BIGINT) AS users_for_80pct,
       CAST(MAX(k) AS BIGINT) AS n_users,
       CAST(FLOOR(1000.0 * MIN(i) / MAX(k)) AS BIGINT) AS frac_milli
FROM r WHERE cum * 1.0 / tot >= 0.8""",
)
def events_pareto_users(sf_dir: str):
    """Pareto 80/20 concentration: the smallest number of top users
    that account for 80% of all events (the "how head-heavy is this
    corpus" capacity-planning figure). Per-user counts hash-partition;
    only the count-of-counts histogram reaches the driver, and the
    cumulative-coverage threshold resolves on it exactly (heaviest
    users first = walking the histogram from the top; within a tie
    block the cumulative crosses 80% a computable number of users in)."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate, grouped_aggregate_ds

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    per_user = grouped_aggregate_ds(ds, ["user_id"],
                                    [("*", "count", "n")])
    hist = grouped_aggregate(per_user, ["n"],
                             [("*", "count", "m")]).to_pandas()
    hist = hist.sort_values("n", ascending=False)
    n = hist["n"].to_numpy().astype(np.float64)
    m = hist["m"].to_numpy().astype(np.int64)
    tot = float((n * m).sum())
    k = int(m.sum())
    users = 0
    cum = 0.0
    need = None
    for ni, mi in zip(n, m):
        # smallest j in this tie block with (cum + ni*j)/tot >= 0.8 —
        # closed form, but validated with the same float comparison the
        # SQL uses so boundary behavior is identical
        j = int(np.ceil((0.8 * tot - cum) / ni))
        j = max(j, 1)
        while j <= mi and not ((cum + ni * j) * 1.0 / tot >= 0.8):
            j += 1
        if j <= mi and (cum + ni * j) * 1.0 / tot >= 0.8:
            need = users + j
            break
        cum += ni * mi
        users += mi
    return pa.table({
        "users_for_80pct": pa.array([need], pa.int64()),
        "n_users": pa.array([k], pa.int64()),
        "frac_milli": pa.array([int(np.floor(1000.0 * need / k))],
                               pa.int64()),
    })


@query(
    "orders_rfm_segments",
    """
WITH base AS (
  SELECT o_custkey,
         CAST(FLOOR(epoch(o_orderdate) / 86400) AS BIGINT) AS od,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
), g AS (
  SELECT o_custkey, MAX(od) AS last_od, COUNT(*) AS f,
         CAST(SUM(cents) AS BIGINT) AS m_cents
  FROM base GROUP BY 1
), mx AS (SELECT MAX(od) AS d FROM base),
rfm AS (
  SELECT o_custkey, mx.d - last_od AS r, f, m_cents
  FROM g CROSS JOIN mx
), q AS (
  SELECT quantile_disc(r, 0.25) AS r1, quantile_disc(r, 0.5) AS r2,
         quantile_disc(r, 0.75) AS r3,
         quantile_disc(f, 0.25) AS f1, quantile_disc(f, 0.5) AS f2,
         quantile_disc(f, 0.75) AS f3,
         quantile_disc(m_cents, 0.25) AS m1,
         quantile_disc(m_cents, 0.5) AS m2,
         quantile_disc(m_cents, 0.75) AS m3
  FROM rfm
)
SELECT o_custkey, r, f, m_cents,
       1 + CASE WHEN r > q.r1 THEN 1 ELSE 0 END
         + CASE WHEN r > q.r2 THEN 1 ELSE 0 END
         + CASE WHEN r > q.r3 THEN 1 ELSE 0 END AS r_score,
       1 + CASE WHEN f > q.f1 THEN 1 ELSE 0 END
         + CASE WHEN f > q.f2 THEN 1 ELSE 0 END
         + CASE WHEN f > q.f3 THEN 1 ELSE 0 END AS f_score,
       1 + CASE WHEN m_cents > q.m1 THEN 1 ELSE 0 END
         + CASE WHEN m_cents > q.m2 THEN 1 ELSE 0 END
         + CASE WHEN m_cents > q.m3 THEN 1 ELSE 0 END AS m_score
FROM rfm CROSS JOIN q""",
)
def orders_rfm_segments(sf_dir: str):
    """RFM customer segmentation (recency / frequency / monetary
    quartile scores — the marketing-analytics classic): per-customer
    aggregates through the hash-partitioned combine (money as exact
    integer cents — per-row round-half-up BEFORE summing, so both
    engines sum identical integers), quartile thresholds from the
    exact distributed-quantile kernel, scores = strictly-greater
    threshold counts (integer-exact). At petabyte scale the monetary
    thresholds would come from a coarser-unit bounded histogram; the
    rest is cardinality-bounded as-is."""
    import numpy as np
    import ray
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate_ds
    from raylog.functions.quantile import grouped_quantiles

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_custkey", "o_orderdate",
                                  "o_totalprice"])

    def base(b: pa.Table) -> pa.Table:
        od = (np.asarray(b["o_orderdate"].combine_chunks())
              .astype("datetime64[us]").astype(np.int64))
        od = np.floor(od / 1e6 / 86400).astype(np.int64)
        cents = np.floor(np.asarray(b["o_totalprice"].combine_chunks(),
                                    dtype=np.float64) * 100 + 0.5
                         ).astype(np.int64)
        return pa.table({"o_custkey": b["o_custkey"],
                         "od": pa.array(od),
                         "cents": pa.array(cents)})

    bs = ds.map_batches(base, batch_format="pyarrow", batch_size=None)
    g = grouped_aggregate_ds(bs, ["o_custkey"],
                             [("od", "max", "last_od"),
                              ("*", "count", "f"),
                              ("cents", "sum", "m_cents")])
    d_max = int(bs.max("od"))

    def mk_rfm(b: pa.Table) -> pa.Table:
        last = np.asarray(b["last_od"].combine_chunks(), dtype=np.int64)
        return pa.table({
            "o_custkey": b["o_custkey"],
            "r": pa.array(d_max - last),
            "f": pa.array(np.asarray(b["f"].combine_chunks(),
                                     dtype=np.int64)),
            "m_cents": pa.array(np.asarray(b["m_cents"].combine_chunks(),
                                           dtype=np.int64)),
        })

    rfm = g.map_batches(mk_rfm, batch_format="pyarrow", batch_size=None)

    def one_key(b: pa.Table) -> pa.Table:
        return b.append_column("_k", pa.array([0] * b.num_rows,
                                              pa.int64()))

    keyed = rfm.map_batches(one_key, batch_format="pyarrow",
                            batch_size=None)
    qs = {}
    for colname in ["r", "f", "m_cents"]:
        qt = grouped_quantiles(keyed, key="_k", value=colname,
                               ps=[0.25, 0.5, 0.75],
                               out_names=["q1", "q2", "q3"]).to_pandas()
        qs[colname] = (int(qt["q1"][0]), int(qt["q2"][0]),
                       int(qt["q3"][0]))
    ref = ray.put(qs) if ray.is_initialized() else qs

    def score(b: pa.Table) -> pa.Table:
        q = ray.get(ref) if ray.is_initialized() else ref

        def sc(col):
            v = np.asarray(b[col].combine_chunks(), dtype=np.int64)
            t1, t2, t3 = q[col]
            return 1 + (v > t1).astype(np.int64) + (v > t2) + (v > t3)

        return pa.table({
            "o_custkey": b["o_custkey"], "r": b["r"], "f": b["f"],
            "m_cents": b["m_cents"],
            "r_score": pa.array(sc("r")),
            "f_score": pa.array(sc("f")),
            "m_score": pa.array(sc("m_cents")),
        })

    return rfm.map_batches(score, batch_format="pyarrow", batch_size=None)


@query(
    "events_bounce_rate",
    """
WITH e AS (
  SELECT user_id, event_id, epoch(ts) AS t FROM events
), d AS (
  SELECT *, CASE WHEN t - LAG(t) OVER (PARTITION BY user_id
                                       ORDER BY t, event_id) > 1800
                   OR LAG(t) OVER (PARTITION BY user_id
                                   ORDER BY t, event_id) IS NULL
            THEN 1 ELSE 0 END AS new_session
  FROM e
), s AS (
  SELECT user_id,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY t, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_no
  FROM d
), g AS (
  SELECT user_id, session_no, COUNT(*) AS n_events
  FROM s GROUP BY 1, 2
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bounces,
       CAST(FLOOR(1000.0 * SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
            / COUNT(*)) AS BIGINT) AS bounce_milli
FROM g""",
)
def events_bounce_rate(sf_dir: str):
    """Bounce rate (share of single-event sessions under the 30-min
    gap rule — the engagement KPI distilled from sessionization): the
    proven session-window kernel produces per-session event counts;
    the rate reduces over constant-size per-block partials — sessions
    never materialize on the driver."""
    import numpy as np
    import pyarrow.compute as pc

    sessions = QUERIES["events_sessionize"](sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        ne = t["n_events"].combine_chunks()
        nb = pc.sum(pc.cast(pc.equal(ne, pa.scalar(1)), pa.int64())).as_py()
        return pa.table({
            "n": pa.array([t.num_rows], pa.int64()),
            "b": pa.array([int(nb or 0)], pa.int64()),
        })

    parts = sessions.map_batches(partial, batch_format="pyarrow",
                                 batch_size=None)
    n = int(parts.sum("n"))
    b = int(parts.sum("b"))
    return pa.table({
        "n_sessions": pa.array([n], pa.int64()),
        "n_bounces": pa.array([b], pa.int64()),
        "bounce_milli": pa.array([int(np.floor(1000.0 * b / n))],
                                 pa.int64()),
    })


@query(
    "events_rolling_7d",
    """
WITH c AS (
  SELECT event_type, CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) AS d,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT a.event_type, a.d AS day_epoch, a.n,
       CAST(SUM(b.n) AS BIGINT) AS sum_7d
FROM c a JOIN c b ON a.event_type = b.event_type
                 AND b.d BETWEEN a.d - 6 AND a.d
GROUP BY 1, 2, 3""",
)
def events_rolling_7d(sf_dir: str):
    """Rolling 7-day window sum per type (the RANGE-frame windowed
    aggregate — trailing weekly volume behind every rate dashboard):
    one (type, day) count pass; the rolling sum evaluates on the
    cells-bounded series via a vectorized two-pointer pass over the
    sorted day axis (exact gaps respected — a missing day contributes
    nothing, matching the RANGE frame, not a ROWS frame)."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts"])

    def day(b: pa.Table) -> pa.Table:
        t = (np.asarray(b["ts"].combine_chunks())
             .astype("datetime64[us]").astype(np.int64))
        return pa.table({
            "event_type": b["event_type"],
            "d": pa.array(np.floor(t / 1e6 / 86400).astype(np.int64)),
        })

    c = grouped_aggregate(
        ds.map_batches(day, batch_format="pyarrow", batch_size=None),
        ["event_type", "d"], [("*", "count", "n")]).to_pandas()
    out = []
    for et, g in c.groupby("event_type"):
        g = g.sort_values("d")
        d = g["d"].to_numpy().astype(np.int64)
        n = g["n"].to_numpy().astype(np.int64)
        cum = np.concatenate([[0], np.cumsum(n)])
        lo = np.searchsorted(d, d - 6, side="left")
        s7 = cum[np.arange(1, len(d) + 1)] - cum[lo]
        for di, ni, si in zip(d, n, s7):
            out.append((et, int(di), int(ni), int(si)))
    out.sort()
    return pa.table({
        "event_type": pa.array([r[0] for r in out], pa.string()),
        "day_epoch": pa.array([r[1] for r in out], pa.int64()),
        "n": pa.array([r[2] for r in out], pa.int64()),
        "sum_7d": pa.array([r[3] for r in out], pa.int64()),
    })


@query(
    "events_weekday_ratio",
    """
WITH c AS (
  SELECT event_type, CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) AS d,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2
), t AS (
  SELECT event_type, ((d + 4) % 7) IN (5, 6) AS is_weekend, n FROM c
)
SELECT event_type,
       CAST(SUM(CASE WHEN is_weekend THEN 0 ELSE n END) AS BIGINT)
         AS weekday_events,
       CAST(SUM(CASE WHEN is_weekend THEN n ELSE 0 END) AS BIGINT)
         AS weekend_events,
       CAST(COUNT(CASE WHEN NOT is_weekend THEN 1 END) AS BIGINT)
         AS weekdays,
       CAST(COUNT(CASE WHEN is_weekend THEN 1 END) AS BIGINT) AS weekends,
       CAST(FLOOR(1000.0
            * (SUM(CASE WHEN is_weekend THEN 0 ELSE n END) * 1.0
               / COUNT(CASE WHEN NOT is_weekend THEN 1 END))
            / (SUM(CASE WHEN is_weekend THEN n ELSE 0 END) * 1.0
               / COUNT(CASE WHEN is_weekend THEN 1 END))) AS BIGINT)
         AS ratio_milli
FROM t GROUP BY 1""",
)
def events_weekday_ratio(sf_dir: str):
    """Weekday/weekend seasonality per type (mean weekday daily volume
    over mean weekend daily volume — the traffic-shape fingerprint
    separating business tools from consumer apps). Epoch day 0 =
    Thursday, so ``(d+4) % 7 ∈ {5,6}`` marks Sat/Sun. One cells-bounded
    count pass; ratios on the tiny table."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts"])

    def day(b: pa.Table) -> pa.Table:
        t = (np.asarray(b["ts"].combine_chunks())
             .astype("datetime64[us]").astype(np.int64))
        return pa.table({
            "event_type": b["event_type"],
            "d": pa.array(np.floor(t / 1e6 / 86400).astype(np.int64)),
        })

    c = grouped_aggregate(
        ds.map_batches(day, batch_format="pyarrow", batch_size=None),
        ["event_type", "d"], [("*", "count", "n")]).to_pandas()
    c["is_we"] = ((c["d"] + 4) % 7).isin([5, 6])
    rows = []
    for et, g in c.groupby("event_type"):
        wd = g[~g["is_we"]]
        we = g[g["is_we"]]
        if len(wd) == 0 or len(we) == 0 or we["n"].sum() == 0:
            continue
        r = ((wd["n"].sum() * 1.0 / len(wd))
             / (we["n"].sum() * 1.0 / len(we)))
        rows.append((et, int(wd["n"].sum()), int(we["n"].sum()),
                     len(wd), len(we), int(np.floor(1000.0 * r))))
    rows.sort()
    return pa.table({
        "event_type": pa.array([r[0] for r in rows], pa.string()),
        "weekday_events": pa.array([r[1] for r in rows], pa.int64()),
        "weekend_events": pa.array([r[2] for r in rows], pa.int64()),
        "weekdays": pa.array([r[3] for r in rows], pa.int64()),
        "weekends": pa.array([r[4] for r in rows], pa.int64()),
        "ratio_milli": pa.array([r[5] for r in rows], pa.int64()),
    })


@query(
    "events_type_comovement",
    """
WITH c AS (
  SELECT event_type, CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) AS d,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2
), days AS (SELECT DISTINCT d FROM c),
types AS (SELECT DISTINCT event_type FROM c),
grid AS (
  SELECT t.event_type, dy.d, COALESCE(c.n, 0) AS n
  FROM types t CROSS JOIN days dy
  LEFT JOIN c ON c.event_type = t.event_type AND c.d = dy.d
)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       CAST(FLOOR(1e6 * CORR(CAST(a.n AS DOUBLE), CAST(b.n AS DOUBLE)))
            AS BIGINT) AS corr_micro
FROM grid a JOIN grid b ON a.d = b.d AND a.event_type < b.event_type
GROUP BY 1, 2""",
)
def events_type_comovement(sf_dir: str):
    """Cross-series co-movement: pairwise Pearson correlation of the
    types' daily-volume series (which traffic streams rise and fall
    together — the dependency map behind incident blast-radius
    analysis). Zero-filled day grid (missing day = 0 volume), types² / 2
    pairs evaluated from the one cells-bounded count pass."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts"])

    def day(b: pa.Table) -> pa.Table:
        t = (np.asarray(b["ts"].combine_chunks())
             .astype("datetime64[us]").astype(np.int64))
        return pa.table({
            "event_type": b["event_type"],
            "d": pa.array(np.floor(t / 1e6 / 86400).astype(np.int64)),
        })

    c = grouped_aggregate(
        ds.map_batches(day, batch_format="pyarrow", batch_size=None),
        ["event_type", "d"], [("*", "count", "n")]).to_pandas()
    piv = c.pivot_table(index="d", columns="event_type", values="n",
                        fill_value=0, aggfunc="sum").sort_index()
    types = list(piv.columns)
    mat = piv.to_numpy().astype(np.float64)
    rows = []
    for i, ta in enumerate(types):
        for j, tb in enumerate(types):
            if ta < tb:
                r = float(np.corrcoef(mat[:, i], mat[:, j])[0, 1])
                rows.append((ta, tb, int(np.floor(1e6 * r))))
    rows.sort()
    return pa.table({
        "type_a": pa.array([r[0] for r in rows], pa.string()),
        "type_b": pa.array([r[1] for r in rows], pa.string()),
        "corr_micro": pa.array([r[2] for r in rows], pa.int64()),
    })


@query(
    "text_good_turing",
    """
WITH words AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
wc AS (SELECT w, COUNT(*) AS c FROM words GROUP BY 1),
f AS (SELECT c, COUNT(*) AS m FROM wc GROUP BY 1),
t AS (SELECT SUM(c * m) AS n_tokens, SUM(m) AS vocab FROM f),
h AS (SELECT COALESCE(MAX(CASE WHEN c = 1 THEN m END), 0) AS n1 FROM f)
SELECT CAST(t.n_tokens AS BIGINT) AS n_tokens,
       CAST(t.vocab AS BIGINT) AS vocab,
       CAST(h.n1 AS BIGINT) AS hapax,
       CAST(FLOOR(1e6 * h.n1 * 1.0 / t.vocab) AS BIGINT)
         AS hapax_rate_micro,
       CAST(FLOOR(1e6 * h.n1 * 1.0 / t.n_tokens) AS BIGINT)
         AS gt_unseen_micro
FROM t CROSS JOIN h""",
)
def text_good_turing(sf_dir: str):
    """Vocabulary saturation diagnostics: hapax-legomena rate (share of
    words seen exactly once) and the Good-Turing estimate of unseen
    mass (n1/N — the probability the next token is a brand-new word;
    high = the corpus hasn't covered its domain yet). Word counts via
    the hash-partitioned aggregate; only the count-of-counts frequency
    spectrum reaches the driver."""
    import numpy as np
    import ray.data as rd
    import pyarrow.compute as pc

    from raylog.functions.agg import grouped_aggregate, grouped_aggregate_ds

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def wcounts(b: pa.Table) -> pa.Table:
        split = pc.split_pattern(b["text"].combine_chunks(), " ")
        flat = split.flatten().dictionary_encode()
        codes = np.asarray(flat.indices, dtype=np.int64)
        uc, cnt = np.unique(codes, return_counts=True)
        return pa.table({"w": flat.dictionary.take(pa.array(uc)),
                         "c": pa.array(cnt, pa.int64())})

    wc = grouped_aggregate_ds(
        ds.map_batches(wcounts, batch_format="pyarrow", batch_size=None),
        ["w"], [("c", "sum", "c")])
    spec = grouped_aggregate(wc, ["c"], [("*", "count", "m")]).to_pandas()
    c = spec["c"].to_numpy().astype(np.int64)
    m = spec["m"].to_numpy().astype(np.int64)
    n_tokens = int((c * m).sum())
    vocab = int(m.sum())
    n1 = int(m[c == 1].sum()) if (c == 1).any() else 0
    return pa.table({
        "n_tokens": pa.array([n_tokens], pa.int64()),
        "vocab": pa.array([vocab], pa.int64()),
        "hapax": pa.array([n1], pa.int64()),
        "hapax_rate_micro": pa.array(
            [int(np.floor(1e6 * n1 * 1.0 / vocab))], pa.int64()),
        "gt_unseen_micro": pa.array(
            [int(np.floor(1e6 * n1 * 1.0 / n_tokens))], pa.int64()),
    })


@query(
    "orders_repeat_cadence",
    """
WITH o AS (
  SELECT o_custkey, CAST(FLOOR(epoch(o_orderdate) / 86400) AS BIGINT) AS d,
         o_orderkey
  FROM orders
), g AS (
  SELECT o_custkey, d,
         LAG(d) OVER (PARTITION BY o_custkey ORDER BY d, o_orderkey)
           AS prev
  FROM o
), gaps AS (
  SELECT d - prev AS gap_days FROM g WHERE prev IS NOT NULL
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_gaps,
       quantile_disc(gap_days, 0.25) AS p25,
       quantile_disc(gap_days, 0.5) AS p50,
       quantile_disc(gap_days, 0.75) AS p75
FROM gaps""",
)
def orders_repeat_cadence(sf_dir: str):
    """Repeat-purchase cadence (days between a customer's consecutive
    orders, quartiles — the reorder-cycle number inventory planning
    runs on): per-customer gaps from one segmented diff per
    complete-customer partition (order ties broken by orderkey, same
    rule both engines), day-granularity integers through the exact
    distributed-quantile kernel."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import partitioned_group_apply
    from raylog.functions.quantile import grouped_quantiles

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_custkey", "o_orderdate", "o_orderkey"])

    def gaps(part: pa.Table) -> pa.Table:
        def col(name):
            c = part[name]
            return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c

        ck = np.asarray(col("o_custkey"), dtype=np.int64)
        ok = np.asarray(col("o_orderkey"), dtype=np.int64)
        t = (np.asarray(col("o_orderdate"))
             .astype("datetime64[us]").astype(np.int64))
        d = np.floor(t / 1e6 / 86400).astype(np.int64)
        if len(ck) == 0:
            return pa.table({"gap_days": pa.array([], pa.int64()),
                             "_k": pa.array([], pa.int64())})
        order = np.lexsort((ok, d, ck))
        c_s, d_s = ck[order], d[order]
        same = c_s[1:] == c_s[:-1]
        gap = (d_s[1:] - d_s[:-1])[same]
        return pa.table({"gap_days": pa.array(gap),
                         "_k": pa.array(np.zeros(len(gap), np.int64))})

    gds = partitioned_group_apply(ds, ["o_custkey"], gaps)
    n_gaps = int(gds.count())
    q = grouped_quantiles(gds, key="_k", value="gap_days",
                          ps=[0.25, 0.5, 0.75],
                          out_names=["p25", "p50", "p75"]).to_pandas()
    return pa.table({
        "n_gaps": pa.array([n_gaps], pa.int64()),
        "p25": pa.array([int(q["p25"][0])], pa.int64()),
        "p50": pa.array([int(q["p50"][0])], pa.int64()),
        "p75": pa.array([int(q["p75"][0])], pa.int64()),
    })


@query(
    "dedup_savings_report",
    """
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT text) AS BIGINT) AS n_distinct,
       CAST(SUM(length(text)) AS BIGINT) AS total_bytes,
       CAST(FLOOR(1000.0 * (COUNT(*) - COUNT(DISTINCT text))
            / COUNT(*)) AS BIGINT) AS dup_rate_milli
FROM documents""",
)
def dedup_savings_report(sf_dir: str):
    """Dedup savings headline (the one-line summary a curation run
    reports: corpus size, distinct contents, duplication rate): row and
    byte counts are streaming sums; the distinct count comes from the
    hash-partitioned exact-dedup survivor Dataset — counted, never
    collected."""
    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd

    from raylog.functions.dedup import exact_dedup_survivors

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def sizes(b: pa.Table) -> pa.Table:
        return pa.table({
            "n": pa.array([b.num_rows], pa.int64()),
            "bytes": pa.array(
                [int(pc.sum(pc.utf8_length(b["text"].combine_chunks()))
                     .as_py() or 0)], pa.int64()),
        })

    parts = ds.map_batches(sizes, batch_format="pyarrow", batch_size=None)
    n_docs = int(parts.sum("n"))
    total_bytes = int(parts.sum("bytes"))
    n_distinct = int(exact_dedup_survivors(ds).count())
    return pa.table({
        "n_docs": pa.array([n_docs], pa.int64()),
        "n_distinct": pa.array([n_distinct], pa.int64()),
        "total_bytes": pa.array([total_bytes], pa.int64()),
        "dup_rate_milli": pa.array(
            [int(np.floor(1000.0 * (n_docs - n_distinct) / n_docs))],
            pa.int64()),
    })


@query(
    "lineitem_discount_revenue",
    """
SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(FLOOR(l_extendedprice * l_discount * 10000 + 0.5)
                     AS BIGINT)) AS BIGINT) AS revenue_e4
FROM lineitem
WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""",
)
def lineitem_discount_revenue(sf_dir: str):
    """TPC-H Q6-shape forecast-revenue query (discount-band × quantity
    filter, one global sum): per-row products are quantized to exact
    1e-4 fixed-point integers BEFORE summing (identical double→int op
    on both engines), so the distributed integer sum is bit-exact in
    any order — no float-accumulation-order hazard. Predicates are
    vectorized Arrow filters; partials are one row per block."""
    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_extendedprice", "l_discount",
                                  "l_quantity"])

    def partial(b: pa.Table) -> pa.Table:
        disc = np.asarray(b["l_discount"].combine_chunks(),
                          dtype=np.float64)
        qty = np.asarray(b["l_quantity"].combine_chunks(),
                         dtype=np.float64)
        price = np.asarray(b["l_extendedprice"].combine_chunks(),
                           dtype=np.float64)
        keep = (disc >= 0.05) & (disc <= 0.07) & (qty < 24)
        rev = np.floor(price[keep] * disc[keep] * 10000 + 0.5
                       ).astype(np.int64)
        return pa.table({
            "n": pa.array([int(keep.sum())], pa.int64()),
            "r": pa.array([int(rev.sum())], pa.int64()),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None)
    return pa.table({
        "n_items": pa.array([int(parts.sum("n"))], pa.int64()),
        "revenue_e4": pa.array([int(parts.sum("r"))], pa.int64()),
    })
