"""Routing fan-out + final LogEvent projection.

Reference semantics (SURVEY.md §2.6 truth table, derived from the two
rewrite_tag filters conf/ds/fluent-bit.conf:181-193 and the output Match
patterns :209,225,241): with E = "has non-empty monitor_log_collector
label" and J = "has non-empty terminus_define_tag",

- container sink ⟵ record iff ¬J   (T2 keep=false removes J-rows)
- job sink       ⟵ record iff J    (re-tagged erda.log.job)
- export sink    ⟵ record iff E    (T1 keep=true COPY — a row can be in
  BOTH container and export)

Job-branch fixup (N11, conf/ds/fluent-bit.conf:195-199): `id` is
overwritten by the define-tag and `source` becomes "job". Final projection
(G3, out_erda/outerda.go:73-118): required `id` defaults to "" on miss,
`stream` defaults to "stdout".
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

SINKS = ("container", "job", "export")

# tag-map keys (N7-N10 reshape output) → underlying column; dice_* are the
# compat aliases of N8 (conf/ds/fluent-bit.conf:147-161)
TAG_SOURCES: dict[str, str] = {
    "application_name": "application_name",
    "cluster_name": "cluster_name",
    "container_id": "container_id",
    "dice_application_name": "application_name",
    "dice_cluster_name": "cluster_name",
    "dice_org_name": "org_name",
    "dice_workspace": "workspace",
    "level": "level",
    "msp_env_id": "msp_env_id",
    "org_name": "org_name",
    "pod_name": "pod_name",
    "pod_namespace": "pod_namespace",
    "request_id": "request_id",
    "workspace": "workspace",
}


def _arr(col):
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def _nonempty(col) -> pa.Array:
    """Present AND non-empty — the reference's rewrite_tag rules match `.+`
    (conf/ds/fluent-bit.conf:183,190), so an empty-string label must route
    like an absent one."""
    arr = _arr(col)
    return pc.greater(pc.utf8_length(pc.fill_null(arr, "")), 0)


def add_route_flags(batch: pa.Table) -> pa.Table:
    """Append in_container / in_job / in_export boolean columns."""
    j = _nonempty(batch["terminus_define_tag"])
    e = _nonempty(batch["monitor_log_collector"])
    batch = batch.append_column("in_job", j)
    batch = batch.append_column("in_export", e)
    batch = batch.append_column("in_container", pc.invert(j))
    return batch


def sink_mask(batch: pa.Table, sink: str) -> pa.Array:
    if sink == "container":
        return pc.invert(_nonempty(batch["terminus_define_tag"]))
    if sink == "job":
        return _nonempty(batch["terminus_define_tag"])
    if sink == "export":
        return _nonempty(batch["monitor_log_collector"])
    raise ValueError(f"unknown sink {sink!r}")


def pack_tags(batch: pa.Table) -> pa.Table:
    """N10: pack the tag namespace into one deterministic `tags_str` column.

    Sorted `key=value;` concatenation of the non-null tag columns — a
    hash-stable stand-in for the reference's map column (map<string,string>
    value-hashing is engine-dependent; a canonical string is not).
    """
    pieces = []
    for tag_key in sorted(TAG_SOURCES):
        col_name = TAG_SOURCES[tag_key]
        if col_name not in batch.column_names:
            continue
        # scalar prefix/suffix broadcast; null value → null piece → ''
        piece = pc.fill_null(
            pc.binary_join_element_wise(tag_key + "=", batch[col_name], ";", ""),
            "",
        )
        pieces.append(piece)
    if not pieces:
        return batch.append_column(
            "tags_str", pa.array([""] * batch.num_rows, pa.string())
        )
    out = pc.binary_join_element_wise(*pieces, "") if len(pieces) > 1 else pieces[0]
    return batch.append_column("tags_str", out)


def _build_map_column(batch: pa.Table, key_to_col: dict[str, str]) -> pa.MapArray:
    """Vectorized map<string,string> construction: per row, the non-null
    (key, value) entries in sorted key order. No Python per-row loop —
    entry layout comes from a numpy mask matrix, values from one Arrow
    ``take`` over the stacked columns."""
    import numpy as np

    n = batch.num_rows
    present = [k for k in sorted(key_to_col) if key_to_col[k] in batch.column_names]
    if not present or n == 0:
        offsets = pa.array([0] * (n + 1), pa.int32())
        return pa.MapArray.from_arrays(
            offsets, pa.array([], pa.string()), pa.array([], pa.string())
        )
    cols = [_arr(batch[key_to_col[k]]) for k in present]
    masks = np.stack([np.asarray(pc.is_valid(c)) for c in cols])  # [k, n]
    row_idx, key_idx = np.nonzero(masks.T)  # sorted by row, then key
    counts = masks.sum(axis=0)
    offsets = pa.array(
        np.concatenate([[0], np.cumsum(counts)]).astype(np.int32), pa.int32()
    )
    keys_child = pa.array(np.asarray(present, dtype=object)[key_idx], pa.string())
    stacked = pa.concat_arrays([pc.cast(c, pa.string()) for c in cols])
    take_idx = pa.array(key_idx.astype(np.int64) * n + row_idx)
    values_child = pc.take(stacked, take_idx)
    return pa.MapArray.from_arrays(offsets, keys_child, values_child)


def pack_tags_map(batch: pa.Table, out: str = "tags") -> pa.Table:
    """N10 typed form: the tag namespace as a real map<string,string>
    column — the reference LogEvent's ``Tags`` field
    (out_erda/sender.go:13-24). ``tags_str`` (pack_tags) stays the
    hash-stable oracle form; the sink parquet carries BOTH."""
    return batch.append_column(out, _build_map_column(batch, TAG_SOURCES))


LABEL_SOURCES: dict[str, str] = {
    # N9: the kubernetes-label namespace the routing rules read
    # (conf/ds/fluent-bit.conf:181-199) — LogEvent's ``Labels`` map
    "monitor_log_collector": "monitor_log_collector",
    "terminus_define_tag": "terminus_define_tag",
}


def pack_labels_map(batch: pa.Table, out: str = "labels") -> pa.Table:
    """N9 typed form: routing labels as a map<string,string> column."""
    return batch.append_column(out, _build_map_column(batch, LABEL_SOURCES))


def tags_str_sql() -> str:
    """DuckDB expression mirroring :func:`pack_tags` exactly."""
    parts = [
        f"CASE WHEN {TAG_SOURCES[k]} IS NOT NULL THEN '{k}=' || {TAG_SOURCES[k]} || ';' ELSE '' END"
        for k in sorted(TAG_SOURCES)
    ]
    return " || ".join(parts)


def project_logevent(batch: pa.Table, sink: str,
                     include_maps: bool = False) -> pa.Table:
    """G3 + N11: the final per-sink LogEvent projection.

    Keeps doc_id/source (lineage + aggregate keys), the token payload
    (bit-identical), and the LogEvent fields: id, source_out, stream,
    level, request_id, ts_ns, content, tags_str. With ``include_maps``
    the typed ``tags`` / ``labels`` map<string,string> columns
    (LogEvent's Tags/Labels, out_erda/sender.go:13-24) are added — the
    sink writers enable this; the oracle queries compare the canonical
    ``tags_str`` (map value-hashing is engine-dependent).
    """
    n = batch.num_rows
    if sink == "job":
        ids = pc.fill_null(_arr(batch["terminus_define_tag"]), "")
        source_out = pa.array(["job"] * n)
    else:
        ids = pc.fill_null(_arr(batch["container_id"]), "")
        source_out = pa.array(["container"] * n)
    stream = pc.fill_null(_arr(batch["stream"]), "stdout")
    cols: dict[str, pa.Array] = {
        "doc_id": _arr(batch["doc_id"]),
        "source": _arr(batch["source"]),
        "id": ids,
        "source_out": source_out,
        "stream": stream,
        "level": _arr(batch["level"]),
        "request_id": _arr(batch["request_id"]),
        "ts_ns": _arr(batch["ts_ns"]),
        "content": _arr(batch["log"]),
    }
    if "tags_str" in batch.column_names and not include_maps:
        cols["tags_str"] = _arr(batch["tags_str"])
    for payload in ("tokens", "n_tok", "tok_sum"):
        if payload in batch.column_names:
            cols[payload] = _arr(batch[payload])
    if include_maps:
        # the typed maps REPLACE the canonical string in sink files (the
        # LogEvent carries Tags/Labels maps, not a packed string —
        # out_erda/sender.go:13-24); tags_str remains the in-pipeline /
        # oracle form
        cols["tags"] = _build_map_column(batch, TAG_SOURCES)
        cols["labels"] = _build_map_column(batch, LABEL_SOURCES)
    return pa.table(cols)
