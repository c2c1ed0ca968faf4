"""Deterministic log-record derivation from the `documents` test table.

The driver's correctness gate runs each Ray query side-by-side with an
ANSI-SQL oracle over the same parquet tables, so the synthetic log-record
stream the pipeline chews on must be *exactly* reproducible in DuckDB SQL.
This module is the single source of truth for that derivation: the Python
(Arrow, vectorized) builder used by the Ray pipeline and the SQL CTE
generator used by the oracles are written side by side and must stay in
lockstep.

Record shape mirrors the reference's data model (SURVEY.md §1): one log
record per `documents` row, with

- ``doc_id``   — record identity (reference: container id + offset)
- ``source``   — tail path / container identity; enrichment + skew key
- ``raw``      — a CRI-format log line (``time stream F log``,
  conf/ds/parsers.conf:25-30 in the reference) whose ``log`` payload
  carries a parseable ``LEVEL [svc,request-id,...]`` section for ~70% of
  rows (the erda-info parser shape, conf/ds/parsers.conf:1-4)
- ``tokens``   — pre-tokenized content payload (list<int32>); per-row
  token-array equality through the pipeline is the core invariant
- ``n_tok``, ``tok_sum`` — token count / checksum (SQL-checkable proxies
  for the list payload)

All derivations are pure modular arithmetic + string concatenation on
``doc_id``/``source``/``text`` so the oracle can restate them in SQL.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Level variants that the reference's erda-info regex
# (conf/ds/parsers.conf:1-4) actually matches. Deliberately excludes bare
# "ERR" and lowercase-only variants the regex rejects (`ERR(?:OR)` requires
# the OR; `[Dd]ebug` requires lowercase "ebug").
LEVELS = [
    "Alert", "ALERT", "Trace", "TRACE", "Debug", "DEBUG", "DEBU",
    "Info", "INFO", "Warn", "WARN", "Warning", "WARNING",
    "Err", "Error", "ERROR",
]

# epoch-ns of 2024-01-02T03:04:05Z; record ts = BASE + (doc_id % 1e9) ns
TS_BASE_NS = 1704164645 * 1_000_000_000
PARSEABLE_MOD = 10
PARSEABLE_LT = 7  # doc_id % 10 < 7 → row carries a LEVEL [...] section


# --------------------------------------------------------------------------
# Python / Arrow side (used by the Ray pipeline)
# --------------------------------------------------------------------------

def _tokens_from_text(text: pa.Array) -> tuple[pa.Array, pa.Array, pa.Array]:
    """tokens = per-word lengths of the single-space-split text.

    Returns (tokens: list<int32>, n_tok: int32, tok_sum: int64), all
    vectorized: split via Arrow, per-element lengths via utf8_length on the
    flattened child, re-wrapped with the original offsets.
    """
    split = pc.split_pattern(text, pattern=" ")
    split = split.combine_chunks() if isinstance(split, pa.ChunkedArray) else split
    lengths = pc.cast(pc.utf8_length(split.values), pa.int32())
    tokens = pa.ListArray.from_arrays(split.offsets, lengths)
    n_tok = pc.cast(pc.list_value_length(tokens), pa.int32())
    off = np.asarray(split.offsets)
    csum = np.concatenate([[0], np.cumsum(np.asarray(lengths), dtype=np.int64)])
    tok_sum = pa.array(csum[off[1:]] - csum[off[:-1]], type=pa.int64())
    return tokens, n_tok, tok_sum


def build_records_batch(batch: pa.Table) -> pa.Table:
    """documents batch (doc_id,text,source[,lang,n_chars]) → log-record batch.

    Output columns: doc_id, source, stream, raw, tokens, n_tok, tok_sum.
    Vectorized: numpy for the numeric pieces, a single Arrow element-wise
    join for the string compose.
    """
    doc_id = np.asarray(batch["doc_id"].combine_chunks(), dtype=np.int64)
    text = pc.cast(batch["text"], pa.string()).combine_chunks()
    source = batch["source"].combine_chunks()
    n = len(doc_id)

    stream = np.where(doc_id % 4 == 0, "stderr", "stdout")
    parseable = (doc_id % PARSEABLE_MOD) < PARSEABLE_LT
    lvl = np.asarray(LEVELS, dtype=object)[doc_id % len(LEVELS)]
    svc_d = (doc_id % 7).astype("U1")
    frac = np.char.zfill((doc_id % 1_000_000_000).astype("U9"), 9)
    hex8 = np.vectorize("{:08x}".format, otypes=[object])(doc_id)
    hex12 = np.vectorize("{:012x}".format, otypes=[object])(doc_id)

    def _s(arr) -> pa.Array:
        return pa.array(arr if isinstance(arr, list) else list(arr), type=pa.string())

    # head = 'LVL [svc-D,HEX8-0000-4000-8000-HEX12,k=v] - ' when parseable else ''
    head = pc.binary_join_element_wise(
        _s(lvl), _s([" [svc-"] * n), _s(svc_d), _s([","] * n), _s(hex8),
        _s(["-0000-4000-8000-"] * n), _s(hex12), _s([",k=v] - "] * n), "",
    )
    head = pc.if_else(pa.array(parseable), head, pa.scalar("", type=pa.string()))
    raw = pc.binary_join_element_wise(
        _s(["2024-01-02T03:04:05."] * n), _s(frac), _s(["Z "] * n),
        _s(stream), _s([" F "] * n), head, text, "",
    )

    tokens, n_tok, tok_sum = _tokens_from_text(text)
    return pa.table(
        {
            "doc_id": pa.array(doc_id),
            "source": source,
            "stream": pa.array(list(stream), type=pa.string()),
            "raw": raw,
            "tokens": tokens,
            "n_tok": n_tok,
            "tok_sum": tok_sum,
        }
    )


def build_dim_table(sources: list[str]) -> pa.Table:
    """Enrichment (dimension) table derived from the distinct source names.

    Analog of the reference's k8s-metadata lookup + env-var record_modifier
    tags (conf/ds/fluent-bit.conf:44-59, conf/eci/fluent-bit.conf:77-99).
    sid = 0-based lexicographic rank; ~5% of sources (sid % 20 == 19) are
    deliberately absent → lookup-miss rows flow with null enrichment (the
    Lua ``-1`` path, conf/eci/scripts/enrich-meta.lua:14-16).
    """
    rows = []
    for sid, src in enumerate(sorted(sources)):
        if sid % 20 == 19:
            continue  # simulated lookup miss
        rows.append(
            {
                "source": src,
                "pod_name": f"{src}-pod-{sid}",
                "pod_namespace": f"ns-{sid % 4}",
                "container_id": f"{sid * 2654435761:016x}",
                "cluster_name": f"cluster-{sid % 3}",
                "application_name": f"{src}-app",
                "msp_env_id": f"env-{sid % 5}",
                "org_name": f"org-{sid % 2}",
                "workspace": ["dev", "test", "staging", "prod"][sid % 4],
                "monitor_log_collector": (
                    f"http://collector-{sid % 10}/collect" if sid % 10 == 3 else None
                ),
                "terminus_define_tag": f"job-{src}" if sid % 10 == 7 else None,
            }
        )
    schema = pa.schema(
        [
            ("source", pa.string()),
            ("pod_name", pa.string()),
            ("pod_namespace", pa.string()),
            ("container_id", pa.string()),
            ("cluster_name", pa.string()),
            ("application_name", pa.string()),
            ("msp_env_id", pa.string()),
            ("org_name", pa.string()),
            ("workspace", pa.string()),
            ("monitor_log_collector", pa.string()),
            ("terminus_define_tag", pa.string()),
        ]
    )
    return pa.Table.from_pylist(rows, schema=schema)


# --------------------------------------------------------------------------
# SQL side (DuckDB oracle CTEs) — must mirror the Python above exactly
# --------------------------------------------------------------------------

_LEVELS_SQL = "[" + ",".join(f"'{v}'" for v in LEVELS) + "]"

RECS_CTE = f"""
recs AS (
  SELECT
    d.doc_id,
    d.source,
    d.text,
    (d.doc_id % {PARSEABLE_MOD}) < {PARSEABLE_LT} AS parseable,
    CASE WHEN d.doc_id % 4 = 0 THEN 'stderr' ELSE 'stdout' END AS stream,
    {_LEVELS_SQL}[CAST(d.doc_id % {len(LEVELS)} AS INT) + 1] AS lvl,
    'svc-' || (d.doc_id % 7) AS svc,
    printf('%08x-0000-4000-8000-%012x', d.doc_id, d.doc_id) AS req_id,
    printf('2024-01-02T03:04:05.%09dZ', d.doc_id % 1000000000) AS ts_str,
    {TS_BASE_NS} + (d.doc_id % 1000000000) AS ts_ns,
    list_transform(string_split(d.text, ' '), w -> CAST(length(w) AS INT)) AS tokens,
    CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tok,
    CAST(list_aggregate(list_transform(string_split(d.text, ' '), w -> length(w)), 'sum') AS BIGINT) AS tok_sum
  FROM documents d
),
recs2 AS (
  SELECT *,
    ts_str || ' ' || stream || ' F ' ||
      CASE WHEN parseable
           THEN lvl || ' [' || svc || ',' || req_id || ',k=v] - '
           ELSE '' END || text AS raw,
    CASE WHEN parseable
         THEN lvl || ' [' || svc || ',' || req_id || ',k=v] - '
         ELSE '' END || text AS log,
    CASE WHEN parseable THEN lvl END AS level,
    CASE WHEN parseable THEN req_id END AS request_id
  FROM recs
)"""

DIM_CTE = """
src_rank AS (
  SELECT source, CAST(ROW_NUMBER() OVER (ORDER BY source) - 1 AS BIGINT) AS sid
  FROM (SELECT DISTINCT source FROM documents)
),
dim AS (
  SELECT
    source,
    source || '-pod-' || sid AS pod_name,
    'ns-' || (sid % 4) AS pod_namespace,
    printf('%016x', sid * 2654435761) AS container_id,
    'cluster-' || (sid % 3) AS cluster_name,
    source || '-app' AS application_name,
    'env-' || (sid % 5) AS msp_env_id,
    'org-' || (sid % 2) AS org_name,
    ['dev','test','staging','prod'][CAST(sid % 4 AS INT) + 1] AS workspace,
    CASE WHEN sid % 10 = 3 THEN 'http://collector-' || (sid % 10) || '/collect' END
      AS monitor_log_collector,
    CASE WHEN sid % 10 = 7 THEN 'job-' || source END AS terminus_define_tag
  FROM src_rank
  WHERE sid % 20 <> 19
)"""

ENRICHED_CTE = """
enriched AS (
  SELECT r.*,
         m.pod_name, m.pod_namespace, m.container_id, m.cluster_name,
         m.application_name, m.msp_env_id, m.org_name, m.workspace,
         m.monitor_log_collector, m.terminus_define_tag
  FROM recs2 r LEFT JOIN dim m USING (source)
),
routed AS (
  -- rewrite_tag matches `.+` (non-empty): empty string routes like absent
  SELECT *,
         coalesce(monitor_log_collector, '') <> '' AS in_export,
         coalesce(terminus_define_tag, '') <> '' AS in_job,
         coalesce(terminus_define_tag, '') = '' AS in_container
  FROM enriched
)"""


def oracle_prefix() -> str:
    """`WITH ...` prefix defining recs2 / dim / enriched / routed CTEs."""
    return "WITH " + RECS_CTE + "," + DIM_CTE + "," + ENRICHED_CTE
