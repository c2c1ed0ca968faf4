"""ECI/log-file sources, JSON parse, sampling, joins, reshape, as-of/windows.

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

# ECI sidecar pipeline variant + raw log-file sources
# --------------------------------------------------------------------------

@query(
    "mm_real_decode",
    """
WITH img AS (
  SELECT doc_id, 8 + doc_id % 25 AS h, 8 + doc_id % 31 AS w
  FROM documents
), px AS (
  SELECT i.doc_id, i.h, i.w,
         SUM( (x.x * 8 + i.doc_id) % 256
            + (y.y * 8 + i.doc_id // 2) % 256
            + (x.x + y.y + i.doc_id) % 256 ) AS s
  FROM img i,
       LATERAL (SELECT unnest(generate_series(0, i.h - 1)) AS y) y,
       LATERAL (SELECT unnest(generate_series(0, i.w - 1)) AS x) x
  GROUP BY 1, 2, 3
), wav AS (
  SELECT doc_id, 256 + doc_id % 512 AS n FROM documents
), amp AS (
  SELECT w.doc_id, w.n,
         SUM(ABS(((t.t * (2654435761 + w.doc_id)) // 128) % 65536
                 - 32768)) AS s
  FROM wav w,
       LATERAL (SELECT unnest(generate_series(0, w.n - 1)) AS t) t
  GROUP BY 1, 2
)
SELECT doc_id, 'image/x-portable-pixmap' AS mime,
       CAST(h AS INTEGER) AS height, CAST(w AS INTEGER) AS width,
       CAST((1000 * s) // (255 * h * w * 3) AS BIGINT) AS mean_milli
FROM px
UNION ALL
SELECT doc_id, 'audio/wav', CAST(1 AS INTEGER), CAST(n AS INTEGER),
       CAST((1000 * s) // (32768 * n) AS BIGINT)
FROM amp""",
)
def mm_real_decode(sf_dir: str):
    """REAL multimodal decode path: deterministic P6 images + PCM16 WAV
    payloads decoded with pure numpy/stdlib codecs (no PIL/ffmpeg) —
    true dimensions, pixel/amplitude means, nearest-neighbor resize.
    SQL-oracled (VERDICT r3 #9): the synthesized pixels/samples are
    integer functions of doc_id, so the oracle regenerates them with
    generate_series and compares an integer mean (floor of 1000× the
    exact rational; the decoded float mean recovers its integer
    numerator exactly — sums ≪ 2^53). Exact float decode values are
    additionally asserted in tests/test_codecs.py."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.multimodal import media_pipeline_real

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"])

    def proj(kind):
        def f(b: pa.Table) -> pa.Table:
            h = np.asarray(b["height"].combine_chunks(),
                           dtype=np.int64)
            w = np.asarray(b["width"].combine_chunks(), dtype=np.int64)
            mean = np.asarray(b["mean_px"].combine_chunks(),
                              dtype=np.float64)
            if kind == "image":
                denom = 255 * h * w * 3
                num = np.round(mean * denom).astype(np.int64)
            else:
                denom = 32768 * w  # width = n_samples, height = 1
                num = np.round(mean * denom).astype(np.int64)
            return pa.table({
                "doc_id": b["doc_id"],
                "mime": b["mime"],
                "height": b["height"],
                "width": b["width"],
                "mean_milli": pa.array(1000 * num // denom),
            })

        return f

    cols = ["doc_id", "mime", "height", "width", "mean_px"]
    img = media_pipeline_real(docs, kind="image").select_columns(
        cols).map_batches(proj("image"), batch_format="pyarrow",
                          batch_size=None)
    wav = media_pipeline_real(docs, kind="audio").select_columns(
        cols).map_batches(proj("audio"), batch_format="pyarrow",
                          batch_size=None)
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
    "sample_split_assign",
    """
WITH a AS (
  SELECT source,
         CASE WHEN h < 80 THEN 'train' WHEN h < 90 THEN 'val'
              ELSE 'test' END AS split
  FROM (SELECT source,
               CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 100 AS h
        FROM documents)
), c AS (
  SELECT source, split, COUNT(*) AS n_docs FROM a GROUP BY 1, 2
), t AS (SELECT source, SUM(n_docs) AS tot FROM c GROUP BY 1)
SELECT c.source, c.split, c.n_docs,
       CAST(FLOOR(1000.0 * c.n_docs / t.tot) AS BIGINT) AS share_milli
FROM c JOIN t USING (source)""",
)
def sample_split_assign(sf_dir: str):
    """Deterministic train/val/test split assignment (80/10/10 by
    content hash — reproducible across engines, runs and re-shards,
    unlike RNG splits) with the per-source audit table: actual counts
    and within-source shares, so skewed sources that drift from the
    nominal ratios are visible before training."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["source", "text"])

    def assign(b: pa.Table) -> pa.Table:
        import hashlib

        h = np.fromiter(
            (int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % 100
             for t in b["text"].to_pylist()),
            dtype=np.int64, count=b.num_rows)
        split = np.where(h < 80, "train", np.where(h < 90, "val", "test"))
        return pa.table({"source": b["source"],
                         "split": pa.array(split, pa.string())})

    counts = grouped_aggregate(
        ds.map_batches(assign, batch_format="pyarrow", batch_size=None),
        ["source", "split"], [("*", "count", "n_docs")],
    ).to_pandas()
    tot = counts.groupby("source")["n_docs"].transform("sum").to_numpy()
    n = counts["n_docs"].to_numpy().astype(np.int64)
    return pa.table({
        "source": pa.array(counts["source"], pa.string()),
        "split": pa.array(counts["split"], pa.string()),
        "n_docs": pa.array(n),
        "share_milli": pa.array(
            np.floor(1000.0 * n / tot).astype(np.int64)),
    })


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


@query(
    "orders_cust_distribution",
    """
WITH oc AS (
  SELECT c.c_custkey, COUNT(o.o_custkey) AS c_count
  FROM customer c LEFT OUTER JOIN (
    SELECT o_custkey FROM orders WHERE o_orderpriority <> '1-URGENT'
  ) o ON c.c_custkey = o.o_custkey
  GROUP BY 1
)
SELECT c_count, COUNT(*) AS custdist FROM oc GROUP BY 1""",
)
def orders_cust_distribution(sf_dir: str):
    """Customer order-count distribution (TPC-H Q13 shape): the LEFT
    OUTER join — customers with zero qualifying orders must appear in
    the c_count=0 bucket, which an inner join silently drops.

    Physical plan: filter+pre-aggregate orders per custkey FIRST (the
    fact side shrinks to ≤|customers| rows before any exchange), then
    one hash-partitioned left-outer join against the customer keys,
    null-fill to 0, and a tiny histogram combine. The join exchange is
    key-bounded on both sides — never rows×orders."""
    import pyarrow.compute as pc
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate, grouped_aggregate_ds

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_orderpriority"])

    def qualifying(b: pa.Table) -> pa.Table:
        keep = pc.not_equal(b["o_orderpriority"], pa.scalar("1-URGENT"))
        return b.filter(keep).select(["o_custkey"])

    per_cust = grouped_aggregate_ds(
        orders.map_batches(qualifying, batch_format="pyarrow",
                           batch_size=None),
        ["o_custkey"], [("o_custkey", "count", "c_count")],
        num_partitions=8,
    )
    from raylog.functions.agg import seed_join_side
    per_cust = seed_join_side(per_cust, pa.table({
        "o_custkey": pa.array([-(1 << 62)], pa.int64()),
        "c_count": pa.array([0], pa.int64()),
    }))  # all orders urgent -> empty side kills the join (SCALE.md);
    # the unmatchable sentinel never pairs with a real customer
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey"])
    j = cust.join(per_cust, join_type="left_outer", num_partitions=8,
                  on=("c_custkey",), right_on=("o_custkey",))

    def fill(b: pa.Table) -> pa.Table:
        return pa.table({
            "c_count": pc.fill_null(pc.cast(b["c_count"], pa.int64()), 0),
        })

    filled = j.map_batches(fill, batch_format="pyarrow", batch_size=None)
    return grouped_aggregate(filled, ["c_count"],
                             [("*", "count", "custdist")])


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
    if "rnk" not in tbl.column_names:  # no doc matches any term
        z = pa.array([], pa.int64())
        return pa.table({"query_id": z, "rnk": z, "doc_id": z,
                         "score_milli": z})
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


@query(
    "events_user_features",
    """
WITH m AS (SELECT MAX(ts) AS mx FROM events),
u AS (
  SELECT user_id,
         COUNT(*) AS n_events,
         COUNT(DISTINCT event_type) AS n_types,
         COUNT(DISTINCT CAST(ts AS DATE)) AS n_days,
         CAST(FLOOR(SUM(CAST(FLOOR(1000 * value) AS BIGINT))
                    * 1.0 / COUNT(*)) AS BIGINT) AS mean_value_milli,
         MAX(ts) AS last_ts
  FROM events GROUP BY 1
)
SELECT user_id, n_events, n_types, n_days, mean_value_milli,
       CAST(FLOOR(epoch(m.mx - last_ts)) AS BIGINT) AS recency_s
FROM u, m""",
)
def events_user_features(sf_dir: str):
    """Per-user ML feature matrix (the feature-engineering table a churn
    / propensity model trains on): event count, distinct-type and
    active-day cardinalities, mean value, recency vs the corpus
    high-water mark.

    One complete-user hash partition pass: lexsort + segment reduceat
    for counts/sums/max, first-occurrence masks over (user, type) and
    (user, day) sorts for the two distinct counts — no per-user Python,
    no COUNT DISTINCT shuffle per feature. The corpus max-ts rides out
    of the same partials (tiny driver-side max of per-partition rows)."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import partitioned_group_apply

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_type", "value"])

    def feats(part: pa.Table) -> pa.Table:
        def col(name):
            c = part[name]
            return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c

        uid = np.asarray(col("user_id"), dtype=np.int64)
        n = len(uid)
        if n == 0:
            return pa.table({
                "user_id": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
                "n_types": pa.array([], pa.int64()),
                "n_days": pa.array([], pa.int64()),
                "mean_value_milli": pa.array([], pa.int64()),
                "last_ts_us": pa.array([], pa.int64()),
            })
        ts = np.asarray(col("ts")).astype("datetime64[us]").astype(np.int64)
        val = np.asarray(col("value"), dtype=np.float64)
        et = col("event_type").dictionary_encode()
        codes = np.asarray(et.indices, dtype=np.int64)
        day = ts // 86_400_000_000

        order = np.lexsort((ts, uid))
        uid_s, ts_s = uid[order], ts[order]
        # per-event milli quantization BEFORE the mean: the integer sum
        # is order-insensitive, so engine and SQL agree exactly (a
        # float64 AVG differs in the last milli with summation order)
        vmilli = np.floor(1000.0 * val[order]).astype(np.int64)
        starts_mask = np.ones(n, dtype=bool)
        starts_mask[1:] = uid_s[1:] != uid_s[:-1]
        starts = np.flatnonzero(starts_mask)
        ends = np.concatenate([starts[1:], [n]])
        cnt = ends - starts
        sums = np.add.reduceat(vmilli, starts)
        last_ts = ts_s[ends - 1]

        def distinct_per_user(second: np.ndarray) -> np.ndarray:
            o = np.lexsort((second, uid))
            u2, s2 = uid[o], second[o]
            first = np.ones(n, dtype=bool)
            first[1:] = (u2[1:] != u2[:-1]) | (s2[1:] != s2[:-1])
            # uid order in this sort matches uid_s's segment order
            return np.add.reduceat(first.astype(np.int64), starts)

        return pa.table({
            "user_id": pa.array(uid_s[starts]),
            "n_events": pa.array(cnt.astype(np.int64)),
            "n_types": pa.array(distinct_per_user(codes)),
            "n_days": pa.array(distinct_per_user(day)),
            "mean_value_milli": pa.array(
                np.floor(sums / cnt).astype(np.int64)),
            "last_ts_us": pa.array(last_ts),
        })

    per_user = partitioned_group_apply(ds, ["user_id"], feats,
                                       num_partitions=8).materialize()
    mx = per_user.max("last_ts_us")

    def finish(b: pa.Table) -> pa.Table:
        last = np.asarray(b["last_ts_us"].combine_chunks(), dtype=np.int64)
        rec = (mx - last) // 1_000_000
        return pa.table({
            "user_id": b["user_id"],
            "n_events": b["n_events"],
            "n_types": b["n_types"],
            "n_days": b["n_days"],
            "mean_value_milli": b["mean_value_milli"],
            "recency_s": pa.array(rec),
        })

    return per_user.map_batches(finish, batch_format="pyarrow",
                                batch_size=None)


# --------------------------------------------------------------------------


@query(
    "events_funnel_time",
    """
WITH m AS (SELECT user_id, event_type, MIN(ts) AS mt
           FROM events GROUP BY 1, 2),
p AS (SELECT user_id,
        MIN(CASE WHEN event_type = 'view' THEN mt END) AS v,
        MIN(CASE WHEN event_type = 'click' THEN mt END) AS c,
        MIN(CASE WHEN event_type = 'purchase' THEN mt END) AS b
      FROM m GROUP BY 1),
d AS (
  SELECT 'view_click' AS step,
         CAST((epoch_us(c) - epoch_us(v)) // 1000000 AS BIGINT)
           AS delay_s
  FROM p WHERE v IS NOT NULL AND c IS NOT NULL AND v < c
  UNION ALL
  SELECT 'click_purchase',
         CAST((epoch_us(b) - epoch_us(c)) // 1000000 AS BIGINT)
  FROM p WHERE c IS NOT NULL AND b IS NOT NULL AND c < b)
SELECT step, CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(quantile_disc(delay_s, 0.25) AS BIGINT) AS p25_s,
       CAST(quantile_disc(delay_s, 0.5) AS BIGINT) AS p50_s,
       CAST(quantile_disc(delay_s, 0.75) AS BIGINT) AS p75_s
FROM d GROUP BY 1""",
)
def events_funnel_time(sf_dir: str):
    """Funnel TIME-TO-CONVERT: for users who progress view→click (and
    click→purchase), the delay between their first events at each
    stage, reported as second-quantized quartiles — the latency
    companion to `events_funnel`'s conversion counts (how LONG the
    funnel takes, not just how many fall through).

    Same key-compressed (user, stage) min-aggregate as the funnel;
    whole-user partitions pivot and emit one (step, delay_s) row per
    CONVERTING user only; the users-bounded delay stream is
    materialized once and feeds both the exact distributed-quantile
    kernel (histogram exchange bounded by steps × distinct seconds)
    and the 2-row count aggregate.
    """
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import (
        grouped_aggregate,
        grouped_aggregate_ds,
        partitioned_group_apply,
    )
    from raylog.functions.quantile import grouped_quantiles

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type", "ts"])
    firsts = grouped_aggregate_ds(
        ev, ["user_id", "event_type"], [("ts", "min", "mt")],
        num_partitions=8,
    )

    def delays(part: pa.Table) -> pa.Table:
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
            msk = et == name
            np.minimum.at(vals, seg[msk], mt[msk])
            stage[name] = vals
        v, c, b = stage["view"], stage["click"], stage["purchase"]
        vc = (v < big) & (c < big) & (v < c)
        cb = (c < big) & (b < big) & (c < b)
        step = np.concatenate([
            np.full(int(vc.sum()), "view_click", dtype=object),
            np.full(int(cb.sum()), "click_purchase", dtype=object),
        ])
        delay = np.concatenate([
            (c[vc] - v[vc]) // 1_000_000,
            (b[cb] - c[cb]) // 1_000_000,
        ])
        return pa.table({
            "step": pa.array(step, pa.string()),
            "delay_s": pa.array(delay.astype(np.int64)),
        })

    d = partitioned_group_apply(firsts, ["user_id"], delays,
                                num_partitions=8).materialize()
    q = grouped_quantiles(d, key="step", value="delay_s",
                          ps=[0.25, 0.5, 0.75],
                          out_names=["p25_s", "p50_s", "p75_s"]
                          ).to_pandas()
    n = grouped_aggregate(d, ["step"],
                          [("*", "count", "n_users")]).to_pandas()
    if "step" not in n.columns or "step" not in q.columns:
        z = pa.array([], pa.int64())  # nobody completed any step pair
        return pa.table({"step": pa.array([], pa.string()),
                         "n_users": z, "p25_s": z, "p50_s": z,
                         "p75_s": z})
    out = n.merge(q, on="step")
    return pa.table({
        "step": pa.array(out["step"], pa.string()),
        "n_users": pa.array(out["n_users"].astype(np.int64)),
        "p25_s": pa.array(out["p25_s"].astype(np.int64)),
        "p50_s": pa.array(out["p50_s"].astype(np.int64)),
        "p75_s": pa.array(out["p75_s"].astype(np.int64)),
    })


# --------------------------------------------------------------------------
# Windowed audio energy (multimodal feature extraction, real decode)
# --------------------------------------------------------------------------

@query(
    "mm_audio_energy_windows",
    """
WITH wav AS (
  SELECT doc_id, 256 + doc_id % 512 AS n FROM documents
), s AS (
  SELECT w.doc_id, t.t // 64 AS win,
         ((t.t * (2654435761 + w.doc_id)) // 128) % 65536 - 32768 AS a
  FROM wav w, LATERAL (SELECT unnest(generate_series(0, w.n - 1)) AS t) t
)
SELECT doc_id, CAST(win AS BIGINT) AS win,
       CAST(COUNT(*) AS BIGINT) AS n_samp,
       CAST(SUM(a * a) AS BIGINT) AS sumsq
FROM s GROUP BY 1, 2""",
)
def mm_audio_energy_windows(sf_dir: str):
    """Windowed audio energy over REAL PCM16 WAV payloads — the
    feature-extraction shape of a speech-data pipeline (VAD, silence
    trimming, loudness normalization all start from per-window
    energy): synthesize → encode → actor-pool decode → one row per
    64-sample window with the EXACT integer Σa² (bit-exact any order,
    ≪ 2^53). The oracle regenerates the deterministic waveform with
    generate_series and reduces the identical integers — the same
    md5/arithmetic-regeneration discipline as `mm_real_decode`.
    Map-only; no exchange beyond the row expansion (×⌈n/64⌉)."""
    import ray.data as rd

    from raylog.functions.multimodal import audio_energy_pipeline

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"])
    return audio_energy_pipeline(docs, window=64)


# --------------------------------------------------------------------------
# Web-corpus curation: hashed classifier inference + per-domain caps
# --------------------------------------------------------------------------

@query(
    "text_hash_classifier",
    """
WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
)
SELECT doc_id,
       CAST(SUM(CAST(('0x' || substr(md5(word), 1, 8)) AS BIGINT)
                % 2001 - 1000) AS BIGINT) AS sum_w,
       CAST(COUNT(*) AS BIGINT) AS n_tok,
       CAST(CASE WHEN SUM(CAST(('0x' || substr(md5(word), 1, 8)) AS BIGINT)
                          % 2001 - 1000) > 0
            THEN 1 ELSE 0 END AS BIGINT) AS pred
FROM w GROUP BY 1""",
)
def text_hash_classifier(sf_dir: str):
    """Hashed-linear classifier inference (fastText / CCNet quality
    filter serving shape): word → fixed signed int weight via md5,
    doc logit = Σ weights, all int64 (bit-exact vs the oracle in any
    summation order). One md5 per DISTINCT word per batch + a cumsum
    segment reduction; map-only — the weight table is hash-derived
    here, and a trained table broadcasts via ray.put identically."""
    import ray.data as rd

    from raylog.functions.text import hash_classifier

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return ds.map_batches(hash_classifier, batch_format="pyarrow",
                          batch_size=None)


@query(
    "web_domain_caps",
    """
WITH u AS (
  SELECT doc_id, n_chars,
         'https://d' ||
         CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                   AS BIGINT) % 40 AS VARCHAR) ||
         '.example.com/' || source || '/' || CAST(doc_id AS VARCHAR) AS url
  FROM documents
), d AS (
  SELECT doc_id, n_chars,
         regexp_extract(url, 'https?://([^/]+)/', 1) AS domain FROM u
)
SELECT doc_id, domain FROM (
  SELECT doc_id, domain,
         ROW_NUMBER() OVER (PARTITION BY domain
                            ORDER BY n_chars DESC, doc_id) AS rnk
  FROM d
) WHERE rnk <= 5""",
)
def web_domain_caps(sf_dir: str):
    """RefinedWeb/C4-style per-domain document cap: synthesize a
    deterministic URL per doc (the corpus has no url column; md5-derived
    domain, same regeneration discipline as the WAV payloads), extract
    the domain with the RE2 kernel (`pc.extract_regex` — byte-identical
    semantics to DuckDB's RE2 `regexp_extract`), keep the top-5 docs per
    domain by length rank. URL synth + regex extract are map-only; the
    cap is `topk.topk_ds` — per-batch partial top-k FIRST (≤k rows per
    domain per block enter the shuffle), finish on hash partitions
    holding complete domains: the result stays a Dataset, so the open
    web's ~10⁸ domains never land on the driver."""
    import hashlib

    import ray.data as rd

    from raylog.functions.topk import topk_ds

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "source", "n_chars"])

    def synth(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        ids = b["doc_id"].to_pylist()
        urls = pa.array([
            "https://d%d.example.com/%s/%d"
            % (int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 40,
               s, i)
            for i, s in zip(ids, b["source"].to_pylist())])
        dom = pc.struct_field(
            pc.extract_regex(urls, pattern=r"https?://(?P<domain>[^/]+)/"),
            "domain")
        return pa.table({"doc_id": b["doc_id"], "n_chars": b["n_chars"],
                         "domain": dom})

    ds = ds.map_batches(synth, batch_format="pyarrow", batch_size=None)
    out = topk_ds(ds, sort_cols=["n_chars", "doc_id"],
                  descending=[True, False], k=5, group_cols=["domain"],
                  num_partitions=8)
    return out.select_columns(["doc_id", "domain"])


@query("text_compression_ratio", None)
def text_compression_ratio(sf_dir: str):
    """zlib compression-ratio quality filter (Gopher/FineWeb
    repetitiveness signal). rows-only: DEFLATE is not SQL-expressible
    (same class as the BPE codec entries); invariants pinned by pytest
    — per-doc brute-force equality vs direct zlib, a known-repetitive
    doc flags, a diverse doc doesn't, ratio is scale-free in level.
    Map-only, zero exchange (`functions/text.py:compression_ratio`)."""
    import ray.data as rd

    from raylog.functions.text import compression_ratio

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return ds.map_batches(compression_ratio, batch_format="pyarrow",
                          batch_size=None)


@query(
    "mm_audio_vad_segments",
    """
WITH wav AS (
  SELECT doc_id, 256 + doc_id % 512 AS n FROM documents
), s AS (
  SELECT w.doc_id, t.t // 64 AS win,
         ((t.t * (2654435761 + w.doc_id)) // 128) % 65536 - 32768 AS a
  FROM wav w, LATERAL (SELECT unnest(generate_series(0, w.n - 1)) AS t) t
), e AS (
  SELECT doc_id, win, SUM(a * a) AS sq, COUNT(*) AS cnt
  FROM s GROUP BY 1, 2
), v AS (
  SELECT doc_id, win FROM e WHERE sq >= 358000000 * cnt
), isl AS (
  SELECT doc_id,
         win - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY win) AS grp
  FROM v
), seg AS (
  SELECT doc_id, grp, COUNT(*) AS seg_len FROM isl GROUP BY 1, 2
)
SELECT d.doc_id,
       CAST(COUNT(seg.grp) AS BIGINT) AS n_segments,
       CAST(COALESCE(SUM(seg.seg_len), 0) AS BIGINT) AS n_voiced,
       CAST(COALESCE(MAX(seg.seg_len), 0) AS BIGINT) AS longest_seg
FROM documents d LEFT JOIN seg ON d.doc_id = seg.doc_id
GROUP BY 1""",
)
def mm_audio_vad_segments(sf_dir: str):
    """Energy-threshold VAD over REAL PCM16 WAV payloads (the
    decode→window→segment stage in front of transcription in a speech
    pipeline): a window is voiced when its exact integer energy meets
    the mean-square threshold (integer cross-multiplication, no float
    mean), voiced islands summarize per doc (count / total / longest).
    One row per doc, map-only; a doc's windows never leave its actor,
    so the island scan needs no order-sensitive exchange. Oracle
    regenerates the waveform and restates the islands with the
    ROW_NUMBER gaps-and-islands form."""
    import ray.data as rd

    from raylog.functions.multimodal import audio_vad_pipeline

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"])
    return audio_vad_pipeline(docs, window=64)


# --------------------------------------------------------------------------
# Model evaluation: exact AUC + calibration of the hashed classifier
# --------------------------------------------------------------------------

_LOGIT_CTE = """
wrd AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
), lg AS (
  SELECT doc_id,
         SUM(CAST(('0x' || substr(md5(word), 1, 8)) AS BIGINT)
             % 2001 - 1000) AS w
  FROM wrd GROUP BY 1
), lab AS (
  SELECT lg.w, CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
  FROM lg JOIN documents d USING (doc_id)
)"""


@query(
    "text_classifier_auc",
    f"""
WITH {_LOGIT_CTE},
h AS (SELECT w, COUNT(*) AS m, SUM(y) AS p FROM lab GROUP BY 1),
r AS (
  SELECT w, m, p,
         COALESCE(SUM(m) OVER (ORDER BY w ROWS BETWEEN UNBOUNDED
                               PRECEDING AND 1 PRECEDING), 0) AS cprev
  FROM h
), s AS (
  SELECT SUM(p * (2 * cprev + m + 1)) AS r2, SUM(p) AS npos,
         SUM(m) AS n
  FROM r
)
SELECT CAST(n AS BIGINT) AS n_docs, CAST(npos AS BIGINT) AS n_pos,
       CAST(FLOOR(1e6 * (CAST(r2 - npos * (npos + 1) AS DOUBLE)
                         / CAST(2 * npos * (n - npos) AS DOUBLE)))
            AS BIGINT) AS auc_micro
FROM s""",
)
def text_classifier_auc(sf_dir: str):
    """EXACT tie-aware AUC (Mann–Whitney rank-sum form) of the hashed
    classifier's integer logit against the lang='en' label — the
    ranking-quality readout of every model-based data filter. Because
    the logit is integer, the whole statistic stays in exact integer
    arithmetic through 2·Σmidranks (ties contribute (2·cprev+m+1)/2
    each, so doubling clears the halves); ONE float division at the
    end, identical structure both engines.

    Logits are map-only (per-batch md5-per-distinct-word kernel);
    the rank statistic needs only the per-distinct-logit histogram
    (m, positives) — exchange bounded by distinct logit values, with
    the prefix-rank pass on that compressed axis."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate
    from raylog.functions.text import hash_classifier

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "lang"])

    def logit_label(b: pa.Table) -> pa.Table:
        lg = hash_classifier(b)
        y = pa.compute.cast(
            pa.compute.equal(b["lang"], "en"), pa.int64())
        return pa.table({"w": lg["sum_w"], "y": y})

    h = grouped_aggregate(
        ds.map_batches(logit_label, batch_format="pyarrow",
                       batch_size=None),
        ["w"], [("*", "count", "m"), ("y", "sum", "p")]).to_pandas()
    h = h.sort_values("w")
    m = [int(v) for v in h["m"]]
    p = [int(v) for v in h["p"]]
    n, npos = sum(m), sum(p)
    r2, cprev = 0, 0
    for mi, pi in zip(m, p):
        r2 += pi * (2 * cprev + mi + 1)
        cprev += mi
    u2 = r2 - npos * (npos + 1)
    auc = int(np.floor(1e6 * (float(u2) / float(2 * npos * (n - npos)))))
    return pa.table({
        "n_docs": pa.array([n], pa.int64()),
        "n_pos": pa.array([npos], pa.int64()),
        "auc_micro": pa.array([auc], pa.int64()),
    })


@query(
    "text_classifier_calibration",
    f"""
WITH {_LOGIT_CTE}
SELECT CAST(FLOOR(w / 200.0) AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(y) AS BIGINT) AS n_pos,
       CAST((1000 * SUM(y)) // COUNT(*) AS BIGINT) AS pos_permille
FROM lab GROUP BY 1""",
)
def text_classifier_calibration(sf_dir: str):
    """Calibration / reliability table of the hashed classifier: docs
    bucketed by logit bin (width 200), with the empirical positive
    rate per bin — the diagram that says whether a filter's score can
    be thresholded meaningfully. Map-only logits + a bins-bounded
    aggregate; all integers."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate
    from raylog.functions.text import hash_classifier

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "lang"])

    def binned(b: pa.Table) -> pa.Table:
        lg = hash_classifier(b)
        w = np.asarray(lg["sum_w"], dtype=np.int64)
        y = np.asarray(pa.compute.cast(
            pa.compute.equal(b["lang"], "en"), pa.int64()))
        return pa.table({
            "bin": pa.array(np.floor(w / 200.0).astype(np.int64)),
            "y": pa.array(y),
        })

    h = grouped_aggregate(
        ds.map_batches(binned, batch_format="pyarrow", batch_size=None),
        ["bin"], [("*", "count", "n_docs"), ("y", "sum", "n_pos")])
    nd = np.asarray(h["n_docs"], dtype=np.int64)
    npos = np.asarray(h["n_pos"], dtype=np.int64)
    return pa.table({
        "bin": h["bin"],
        "n_docs": h["n_docs"],
        "n_pos": h["n_pos"],
        "pos_permille": pa.array(1000 * npos // nd, pa.int64()),
    })


@query(
    "text_rake_keyphrases",
    """
WITH w AS (
  SELECT doc_id, i,
         list_extract(string_split(text, ' '), i) AS word
  FROM documents,
       UNNEST(generate_series(1, len(string_split(text, ' ')))) t(i)
), m AS (
  SELECT doc_id, i, word,
         CASE WHEN word IN ('the','a','and','of','to','in','is','on')
              THEN 1 ELSE 0 END AS stop
  FROM w
), seg AS (
  SELECT doc_id, i, word, stop,
         SUM(stop) OVER (PARTITION BY doc_id ORDER BY i) AS run0
  FROM m
), ph AS (
  SELECT doc_id, run0, string_agg(word, ' ' ORDER BY i) AS phrase,
         COUNT(*) AS plen
  FROM seg WHERE stop = 0 GROUP BY 1, 2
), wstat AS (
  SELECT s.word, SUM(p.plen) AS deg, COUNT(*) AS freq
  FROM seg s JOIN ph p ON p.doc_id = s.doc_id AND p.run0 = s.run0
  WHERE s.stop = 0 GROUP BY 1
), wscore AS (SELECT word, (1000 * deg) // freq AS ws FROM wstat),
pdist AS (SELECT phrase, COUNT(*) AS n_instances FROM ph GROUP BY 1),
pwords AS (
  SELECT phrase, unnest(string_split(phrase, ' ')) AS word FROM pdist
), ps AS (
  SELECT pw.phrase, SUM(ws.ws) AS score
  FROM pwords pw JOIN wscore ws USING (word) GROUP BY 1
)
SELECT p.phrase, CAST(d.n_instances AS BIGINT) AS n_instances,
       CAST(p.score AS BIGINT) AS score_milli
FROM ps p JOIN pdist d USING (phrase)
ORDER BY p.score DESC, p.phrase LIMIT 20""",
)
def text_rake_keyphrases(sf_dir: str):
    """RAKE keyphrase extraction (Rose et al.): candidate phrases are
    maximal stopword-free word runs; each word scores deg/freq where
    freq counts its phrase occurrences and deg adds the length of
    every phrase containing it (co-occurrence degree); a phrase scores
    the sum of its words' scores. Top-20 phrases, integer milli-scores
    (per-word floor division — identical both engines, no float).

    Pass 1: (word, deg, freq) vocab-bounded aggregate → broadcast
    score dict. Pass 2: phrase instances → hash-partitioned distinct-
    phrase counts (cardinality-safe) → map-side scoring → partial
    top-k merge. Phrases never land on the driver except the final
    20."""
    import numpy as np
    import ray.data as rd

    import ray
    from raylog.functions.agg import grouped_aggregate, grouped_aggregate_ds
    from raylog.functions.text import rake_phrase_instances
    from raylog.functions.topk import topk

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    inst = ds.map_batches(rake_phrase_instances, batch_format="pyarrow",
                          batch_size=None)

    def word_partial(b: pa.Table) -> pa.Table:
        ph = b["phrase"].to_pylist()
        pl = b["plen"].to_pylist()
        ws, dg, fr = {}, {}, {}
        for p, l in zip(ph, pl):
            for w in p.split(" "):
                dg[w] = dg.get(w, 0) + l
                fr[w] = fr.get(w, 0) + 1
        keys = sorted(dg)
        return pa.table({
            "word": pa.array(keys, pa.string()),
            "deg": pa.array([dg[k] for k in keys], pa.int64()),
            "freq": pa.array([fr[k] for k in keys], pa.int64()),
        })

    wstat = grouped_aggregate(
        inst.map_batches(word_partial, batch_format="pyarrow",
                         batch_size=None),
        ["word"], [("deg", "sum", "deg"), ("freq", "sum", "freq")])
    wscore = {w: (1000 * int(d)) // int(f)
              for w, d, f in zip(wstat["word"].to_pylist(),
                                 wstat["deg"].to_pylist(),
                                 wstat["freq"].to_pylist())}
    ref = ray.put(wscore)

    pdist = grouped_aggregate_ds(inst, ["phrase"],
                                 [("*", "count", "n_instances")],
                                 num_partitions=8)

    def score(b: pa.Table) -> pa.Table:
        sc = ray.get(ref)
        s = [sum(sc[w] for w in p.split(" "))
             for p in b["phrase"].to_pylist()]
        return b.append_column("score_milli", pa.array(s, pa.int64()))

    scored = pdist.map_batches(score, batch_format="pyarrow",
                               batch_size=None)
    top = topk(scored, sort_cols=["score_milli", "phrase"],
               descending=[True, False], k=20)
    return top.select(["phrase", "n_instances", "score_milli"])


@query(
    "docs_rank_fusion",
    """
WITH wrd AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
), lg AS (
  SELECT doc_id,
         SUM(CAST(('0x' || substr(md5(word), 1, 8)) AS BIGINT)
             % 2001 - 1000) AS w
  FROM wrd GROUP BY 1
), r AS (
  SELECT d.doc_id,
         RANK() OVER (ORDER BY d.n_chars DESC) AS r1,
         RANK() OVER (ORDER BY lg.w DESC) AS r2
  FROM documents d JOIN lg USING (doc_id)
)
SELECT doc_id, CAST(r1 AS BIGINT) AS rank_chars,
       CAST(r2 AS BIGINT) AS rank_logit,
       CAST(r1 + r2 AS BIGINT) AS fused_rank
FROM r
ORDER BY r1 + r2, doc_id LIMIT 20""",
)
def docs_rank_fusion(sf_dir: str):
    """Rank-based score fusion (Borda-style curation): combine two
    incomparable quality signals — document length and the hashed
    classifier logit — by summing their competition ranks (RANK(): tie
    block shares the smallest rank), then keep the 20 best fused docs.
    Rank fusion is the standard way to blend filters whose raw scales
    don't mix; competition ranks make it integer-exact.

    Ranks come from per-signal DISTINCT-VALUE histograms (exchange
    bounded by distinct values, not rows): rank(v) = 1 + #(values
    better than v) via a prefix sum on the compressed axis, broadcast
    as a lookup; doc scoring is then map-side + partial top-k."""
    import numpy as np
    import ray.data as rd

    import ray
    from raylog.functions.agg import grouped_aggregate
    from raylog.functions.text import hash_classifier
    from raylog.functions.topk import topk

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "n_chars"])

    def signals(b: pa.Table) -> pa.Table:
        lg = hash_classifier(b)
        return pa.table({
            "doc_id": b["doc_id"],
            "nc": b["n_chars"],
            "w": lg["sum_w"],
        })

    sig = ds.map_batches(signals, batch_format="pyarrow",
                         batch_size=None)

    def rank_map(col: str) -> dict:
        h = grouped_aggregate(sig, [col],
                              [("*", "count", "m")]).to_pandas()
        h = h.sort_values(col, ascending=False)
        cum = np.concatenate([[0], h["m"].cumsum().to_numpy()[:-1]])
        return {int(v): int(c) + 1 for v, c in zip(h[col], cum)}

    ref = ray.put((rank_map("nc"), rank_map("w")))

    def fuse(b: pa.Table) -> pa.Table:
        m1, m2 = ray.get(ref)
        r1 = np.array([m1[int(v)] for v in b["nc"].to_pylist()],
                      dtype=np.int64)
        r2 = np.array([m2[int(v)] for v in b["w"].to_pylist()],
                      dtype=np.int64)
        return pa.table({
            "doc_id": b["doc_id"],
            "rank_chars": pa.array(r1),
            "rank_logit": pa.array(r2),
            "fused_rank": pa.array(r1 + r2),
        })

    fused = sig.map_batches(fuse, batch_format="pyarrow",
                            batch_size=None)
    return topk(fused, sort_cols=["fused_rank", "doc_id"],
                descending=[False, False], k=20)


@query(
    "docs_prefix_compression",
    """
WITH u AS (
  SELECT doc_id,
         'https://d' ||
         CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                   AS BIGINT) % 40 AS VARCHAR) ||
         '.example.com/' || source || '/' || CAST(doc_id AS VARCHAR)
           AS url
  FROM documents
), d AS (
  SELECT doc_id, url,
         regexp_extract(url, 'https?://([^/]+)/', 1) AS domain FROM u
), p AS (
  SELECT url, domain,
         LAG(url) OVER (PARTITION BY domain ORDER BY url) AS prev
  FROM d
), l AS (
  SELECT url,
         CASE WHEN prev IS NULL THEN 0 ELSE (
           SELECT COALESCE(MAX(CASE WHEN substr(url, 1, t.i)
                                         = substr(prev, 1, t.i)
                                    THEN t.i END), 0)
           FROM UNNEST(generate_series(
                1, LEAST(length(url), length(prev)))) t(i))
         END AS lcp
  FROM p
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_urls,
       CAST(SUM(length(url)) AS BIGINT) AS total_bytes,
       CAST(SUM(lcp) AS BIGINT) AS saved_bytes,
       CAST((1000 * SUM(lcp)) // SUM(length(url)) AS BIGINT)
         AS saved_permille
FROM l""",
)
def docs_prefix_compression(sf_dir: str):
    """Front-coding (prefix-compression) storage estimate for a sorted
    URL index — the delta-encoding layout every search/storage engine
    uses for sorted string keys: within each domain, sort the URLs and
    count the bytes shared with the predecessor (those bytes store as
    one varint instead). Reports corpus bytes, saved bytes, and the
    savings permille.

    Domains partition the key space (`partitioned_group_apply` —
    complete domains per partition, so sort + LCP never cross a
    partition); the per-predecessor LCP loop is bounded by key length.
    Exchange: the synthesized (domain, url) rows once; output is one
    constant-size row."""
    import hashlib

    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate, partitioned_group_apply

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "source"])

    def synth(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        ids = b["doc_id"].to_pylist()
        urls = pa.array([
            "https://d%d.example.com/%s/%d"
            % (int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 40,
               src, i)
            for i, src in zip(ids, b["source"].to_pylist())])
        dom = pc.struct_field(
            pc.extract_regex(urls, pattern=r"https?://(?P<domain>[^/]+)/"),
            "domain")
        return pa.table({"domain": dom, "url": urls})

    urls = ds.map_batches(synth, batch_format="pyarrow", batch_size=None)

    def front_code(part: pa.Table) -> pa.Table:
        dom = part["domain"].to_pylist()
        url = part["url"].to_pylist()
        order = sorted(range(len(url)), key=lambda i: (dom[i], url[i]))
        total = saved = 0
        prev_d = prev_u = None
        for i in order:
            total += len(url[i])
            if dom[i] == prev_d:
                a, b = url[i], prev_u
                m = min(len(a), len(b))
                l = 0
                while l < m and a[l] == b[l]:
                    l += 1
                saved += l
            prev_d, prev_u = dom[i], url[i]
        return pa.table({
            "g": pa.array([0], pa.int64()),
            "n": pa.array([len(url)], pa.int64()),
            "tot": pa.array([total], pa.int64()),
            "sav": pa.array([saved], pa.int64()),
        })

    a = grouped_aggregate(
        partitioned_group_apply(urls, ["domain"], front_code),
        ["g"], [("n", "sum", "n_urls"), ("tot", "sum", "total_bytes"),
                ("sav", "sum", "saved_bytes")])
    tot = int(a["total_bytes"][0].as_py())
    sav = int(a["saved_bytes"][0].as_py())
    return pa.table({
        "n_urls": a["n_urls"],
        "total_bytes": a["total_bytes"],
        "saved_bytes": a["saved_bytes"],
        "saved_permille": pa.array([1000 * sav // tot], pa.int64()),
    })


@query(
    "docs_merkle_fingerprint",
    """
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       md5(string_agg(md5(text), ' ' ORDER BY md5(text)))
         AS merkle_hex
FROM documents GROUP BY 1""",
)
def docs_merkle_fingerprint(sf_dir: str):
    """Per-source corpus integrity fingerprint: the md5 of the SORTED
    list of per-document content hashes — one short string that two
    environments can compare to prove their partitions are
    byte-identical without shipping any data (the Merkle-style check
    behind every replication/migration sign-off; order-insensitive by
    construction since leaves sort before the root hash).

    Leaf hashing is map-only; complete-source partitions sort their
    leaf hashes and fold the root. Exchange: one 32-byte hash per doc
    (never text). At 100 TB the per-source leaf lists are the honest
    cost of an order-insensitive root; a tree of intermediate nodes
    per shard-range drops the single-reducer memory to O(shards) with
    the same root semantics given a fixed shard partitioning."""
    import hashlib

    import ray.data as rd

    from raylog.functions.agg import partitioned_group_apply

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["source", "text"])

    def leaf(b: pa.Table) -> pa.Table:
        h = [hashlib.md5(t.encode()).hexdigest()
             for t in b["text"].to_pylist()]
        return pa.table({"source": b["source"],
                         "leaf": pa.array(h, pa.string())})

    leaves = ds.map_batches(leaf, batch_format="pyarrow",
                            batch_size=None)

    def root(part: pa.Table) -> pa.Table:
        src = part["source"].to_pylist()
        lf = part["leaf"].to_pylist()
        groups: dict = {}
        for s, l in zip(src, lf):
            groups.setdefault(s, []).append(l)
        out_s, out_n, out_h = [], [], []
        for s in sorted(groups):
            ls = sorted(groups[s])
            out_s.append(s)
            out_n.append(len(ls))
            out_h.append(hashlib.md5(" ".join(ls).encode()).hexdigest())
        return pa.table({
            "source": pa.array(out_s, pa.string()),
            "n_docs": pa.array(out_n, pa.int64()),
            "merkle_hex": pa.array(out_h, pa.string()),
        })

    return partitioned_group_apply(leaves, ["source"], root)
