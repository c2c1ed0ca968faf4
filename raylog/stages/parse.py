"""Vectorized parse stages (the reference's parser-filter layer).

Reference semantics reproduced here (all regexes re-derived from
/root/reference/conf/ds/parsers.conf and conf/eci/parsers.conf, re-expressed
in RE2 syntax for ``pyarrow.compute.extract_regex`` — Arrow's regex engine):

- CRI line parse (parsers.conf:25-30):   P4
- erda-info level/request-id extraction (parsers.conf:1-4):  P2
- truncate-log 50 KiB cap (parsers.conf:6-10):  P1
- log-id path extraction (conf/eci/parsers.conf:12-17):  P6
- cpuset container-id extraction (conf/eci/parsers.conf:19-23):  P7

All functions are pure ``pa.Table -> pa.Table`` transforms over zero-copy
Arrow batches; no Python per-row loops.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# P4 — CRI format `time stream logtag log`
# (reference: conf/ds/parsers.conf:27-28; RE2 named groups)
CRI_RE = r"^(?P<time>[^ ]+) (?P<stream>stdout|stderr) (?P<logtag>[^ ]*) (?P<log>.*)$"

# P2 — erda-info. Faithful conversion of conf/ds/parsers.conf:3 (Onigmo →
# RE2: `(?<n>..)` → `(?P<n>..)`; char classes kept verbatim incl. the
# literal `|` the reference includes). Note: bare "ERR" does NOT match
# (`ERR(?:OR)` requires OR), nor does "DEBu" etc — semantics preserved.
ERDA_INFO_RE = (
    r"(?P<level>[Aa]lert|ALERT|[Tt]race|TRACE|[Dd]ebug|DEBUG|DEBU|[Ii]nfo|INFO"
    r"|[Ww]arn(?:ing)?|WARN(?:ING)?|[Ee]rr(?:or)?|ERR(?:OR)){1}(?:.*?)"
    r"\[(?:[\w|\-|_]*?)\,"
    r"(?P<request_id>\{?\w{8}-?\w{4}-?\w{4}-?\w{4}-?\w{12}\}?)?"
    r"(?:[\,|\w|\-|_|=]*?)\]"
)

# time split for ns-precision parse: seconds part, fractional digits, tz
CRI_TIME_RE = r"^(?P<sec>\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2})(?:\.(?P<frac>\d+))?(?P<tz>Z|[+-]\d{2}:\d{2})$"

# P5 — start-of-record detector for firstline multiline: the log CONTENT
# of a record's first line begins with a date (re-derived from
# conf/ds/parsers.conf cri_firstline / docker_firstline:
# `\d{4}[\/-]\d{1,2}[\/-]\d{1,2}[ T]\d{2}:\d{2}:\d{2}`); stack-trace
# continuation lines don't match.
FIRSTLINE_RE = r"^\d{4}[/-]\d{1,2}[/-]\d{1,2}[ T]\d{2}:\d{2}:\d{2}"

# P6 — container name from the ECI tail path (conf/eci/parsers.conf:16)
LOG_ID_RE = r"^/stdlog/(?P<pri_id>[\w|\-]+)/(?:\d+\.log)$"

# P7 — container id from a cgroup path (conf/eci/parsers.conf:23)
CPUSET_RE = r"^/(?:.*?)/(?P<container_id>\w+)$"

TRUNCATE_CAP = 51200  # bytes/chars kept by truncate-log (parsers.conf:9)


def _extract(col: pa.ChunkedArray | pa.Array, pattern: str) -> pa.StructArray:
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return pc.extract_regex(arr, pattern)


def cri_parse(batch: pa.Table, key: str = "raw") -> pa.Table:
    """P4: split a CRI line into time/stream/logtag/log + parse ts → ns.

    Non-matching rows pass through with null extracted fields (the parser
    filter's Reserve_Data semantics).
    """
    ext = _extract(batch[key], CRI_RE)
    batch = batch.append_column("cri_time", pc.struct_field(ext, "time"))
    if "stream" not in batch.column_names:
        batch = batch.append_column("stream", pc.struct_field(ext, "stream"))
    batch = batch.append_column("logtag", pc.struct_field(ext, "logtag"))
    batch = batch.append_column("log", pc.struct_field(ext, "log"))
    batch = batch.append_column("ts_ns", parse_cri_time_ns(pc.struct_field(ext, "time")))
    return batch


def parse_cri_time_ns(time_col: pa.Array) -> pa.Array:
    """RFC3339(+nanoseconds) string → int64 epoch-ns, vectorized.

    Arrow's strptime has no %f with ns precision, so: parse the whole-second
    prefix with strptime, the fractional digits as a right-padded int, and
    apply the numeric UTC offset. (Reference time formats:
    conf/ds/parsers.conf:29-30 `%Y-%m-%dT%H:%M:%S.%L%z`.)
    """
    parts = pc.extract_regex(time_col, CRI_TIME_RE)
    sec = pc.strptime(pc.struct_field(parts, "sec"), format="%Y-%m-%dT%H:%M:%S", unit="s")
    sec_ns = pc.multiply(pc.cast(sec, pa.int64()), pa.scalar(1_000_000_000, pa.int64()))
    frac = pc.struct_field(parts, "frac")
    frac9 = pc.utf8_rpad(pc.fill_null(frac, "0"), 9, "0")
    frac_ns = pc.cast(pc.utf8_slice_codeunits(frac9, 0, 9), pa.int64())
    tz = pc.struct_field(parts, "tz")
    tz_sign = pc.if_else(
        pc.equal(pc.utf8_slice_codeunits(pc.fill_null(tz, "Z"), 0, 1), "-"),
        pa.scalar(-1, pa.int64()),
        pa.scalar(1, pa.int64()),
    )
    is_z = pc.equal(pc.fill_null(tz, "Z"), "Z")
    tz_pad = pc.utf8_rpad(pc.fill_null(tz, "Z"), 6, "0")  # keeps Z rows harmless
    tz_h = pc.cast(
        pc.if_else(is_z, "0", pc.utf8_slice_codeunits(tz_pad, 1, 3)), pa.int64()
    )
    tz_m = pc.cast(
        pc.if_else(is_z, "0", pc.utf8_slice_codeunits(tz_pad, 4, 6)), pa.int64()
    )
    off_ns = pc.multiply(
        pc.multiply(tz_sign, pc.add(pc.multiply(tz_h, 3600), pc.multiply(tz_m, 60))),
        pa.scalar(1_000_000_000, pa.int64()),
    )
    return pc.subtract(pc.add(sec_ns, frac_ns), off_ns)


def erda_info(batch: pa.Table, key: str = "log") -> pa.Table:
    """P2: extract `level` / `request_id` from the log content.

    Applied to the CRI-extracted `log` field (the reference applies the
    parser filter to Key_Name log, conf/ds/fluent-bit.conf:61-67);
    Preserve_Key=True + Reserve_Data=True → input column kept, non-matching
    rows flow through with nulls.
    """
    ext = _extract(batch[key], ERDA_INFO_RE)
    batch = batch.append_column("level", pc.struct_field(ext, "level"))
    req = pc.struct_field(ext, "request_id")
    # optional group that did not participate extracts as "" — the reference
    # leaves the key absent in that case, i.e. null
    req = pc.if_else(pc.equal(req, ""), pa.scalar(None, pa.string()), req)
    batch = batch.append_column("request_id", req)
    return batch


def truncate_content(
    batch: pa.Table, key: str = "log", cap: int = TRUNCATE_CAP
) -> pa.Table:
    """P1: truncate the content column to `cap` characters in place.

    Reference: truncate-log `(?<log>[\\s\\S]{0,51200})`, Preserve_Key=False
    (replaces the key). Token payload columns are never touched — the
    per-row token-array equality invariant holds through this stage.
    """
    i = batch.column_names.index(key)
    col = batch[key]
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return batch.set_column(i, key, pc.utf8_slice_codeunits(arr, 0, cap))


def merge_log(
    batch: pa.Table,
    key: str = "log",
    out: str = "log_processed",
    fields: list[tuple[str, pa.DataType]] | None = None,
) -> pa.Table:
    """E1 Merge_Log (conf/ds/fluent-bit.conf:50-51): re-parse a JSON
    content column into a typed nested struct under ``out``
    (Merge_Log_Key log_processed); arbitrary keys, missing keys → null,
    non-JSON rows → null struct (the filter skips the merge and leaves
    the record intact on parse failure).

    ``fields`` fixes the output schema ([(name, arrow type)]); JSON
    decode itself is inherently per-row (no Arrow JSON kernel — the one
    documented per-row loop in the parse layer); everything downstream
    of the struct is columnar again.
    """
    import json

    if fields is None:
        fields = [("msg", pa.string())]
    col = batch[key]
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    names = [n for n, _ in fields]
    cols: dict[str, list] = {n: [] for n in names}
    valid = []
    for s in arr.to_pylist():
        obj = None
        if s is not None:
            try:
                obj = json.loads(s)
                if not isinstance(obj, dict):
                    obj = None
            except (json.JSONDecodeError, ValueError):
                obj = None
        valid.append(obj is not None)
        for n in names:
            cols[n].append(None if obj is None else obj.get(n))
    struct = pa.StructArray.from_arrays(
        [pa.array(cols[n], t) for n, t in fields],
        names=names,
        mask=pa.array([not v for v in valid]),
    )
    return batch.append_column(out, struct)


def firstline_flags(batch: pa.Table, key: str = "log",
                    out: str = "is_continuation") -> pa.Table:
    """P5 detector: mark rows whose content does NOT start a new record.

    The reference's multiline tail input declares a record to start at a
    line matching ``cri_firstline``'s date prefix
    (conf/ds/cri-runtime.conf:17-21); every other line is a continuation
    of the previous record (a java stack frame etc.)."""
    col = batch[key]
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    head = pc.match_substring_regex(pc.fill_null(arr, ""), FIRSTLINE_RE)
    return batch.append_column(out, pc.invert(head))


def log_id(batch: pa.Table, key: str = "source") -> pa.Table:
    """P6: extract the container name from an ECI tail path."""
    ext = _extract(batch[key], LOG_ID_RE)
    return batch.append_column("pri_id", pc.struct_field(ext, "pri_id"))


def cpuset_container_id(batch: pa.Table, key: str = "cpuset") -> pa.Table:
    """P7: extract the container id (last path segment) from a cgroup path."""
    ext = _extract(batch[key], CPUSET_RE)
    return batch.append_column("container_id_cpuset", pc.struct_field(ext, "container_id"))
