"""Log pipeline, routing sinks, throttle/multiline, relational breadth.

Domain module of the driver-facing query registry — registration
happens on import via :func:`raylog.pipelines.qbase.query`; the public
surface stays ``raylog.pipelines.queries.QUERIES/ORACLES``.
"""

from __future__ import annotations

import pyarrow as pa

from raylog import records as R
from raylog.pipelines.qbase import (
    ORACLES,
    QUERIES,
    _ECI_TAGS,
    _P,
    _src_tag,
    _tmp_name,
    query,
)
from raylog.stages import route

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
