"""Raw log-file sources — the engine's analog of the reference tail inputs.

The reference tails container log files in two wire formats
(conf/ds/docker-runtime.conf, conf/ds/cri-runtime.conf):

- CRI:    ``2021-12-01T17:55:56.027+08:00 stdout F <log>`` (one per line)
- docker: ``{"log": "...", "stream": "stdout", "time": "..."}`` JSON/line

These readers consume such files with ``ray.data.read_text`` (streaming,
one block per file chunk) and run the matching parse stage, yielding the
same record stream the parquet path produces; ``Skip_Empty_Lines`` →
empty lines dropped. The test-side writers emit the reference wire
formats so round-trips are asserted end-to-end.
"""

from __future__ import annotations

import json

import pyarrow as pa
import ray.data as rd

from raylog.stages import parse


def read_cri_logs(paths: list[str] | str) -> rd.Dataset:
    """Tail-analog for CRI-format log files → parsed record stream."""
    ds = rd.read_text(paths)

    def to_records(batch: pa.Table) -> pa.Table:
        col = batch["text"]
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        t = pa.table({"raw": arr})
        return parse.cri_parse(t, key="raw")

    return ds.map_batches(to_records, batch_format="pyarrow", batch_size=None)


def read_cri_logs_with_source(paths: list[str] | str) -> rd.Dataset:
    """CRI tail with per-file identity: ``source`` = log file stem.

    The reference derives the record's tag from the tailed path
    (``Tag kube.*`` over /var/log/containers/<pod>..., the
    Kube_Tag_Prefix strip in conf/ds/fluent-bit.conf:52) — the file IS
    the source; multiline joins and ordering are scoped to it."""
    import os

    ds = rd.read_text(paths, include_paths=True)

    def to_records(batch: pa.Table) -> pa.Table:
        col = batch["text"]
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        srcs = [os.path.basename(p).rsplit(".", 1)[0]
                for p in batch["path"].to_pylist()]
        t = pa.table({"raw": arr, "source": pa.array(srcs, pa.string())})
        return parse.cri_parse(t, key="raw")

    return ds.map_batches(to_records, batch_format="pyarrow", batch_size=None)


def read_docker_json_logs(paths: list[str] | str) -> rd.Dataset:
    """P3: docker JSON-per-line log files → parsed record stream.

    JSON decode is a per-line loop (ingestion-format conversion; the
    payload columns downstream stay vectorized Arrow).
    """
    ds = rd.read_text(paths)

    def to_records(batch: pa.Table) -> pa.Table:
        logs, streams, times = [], [], []
        for line in batch["text"].to_pylist():
            try:
                o = json.loads(line)
            except json.JSONDecodeError:
                continue
            logs.append(o.get("log"))
            streams.append(o.get("stream", "stdout"))
            times.append(o.get("time"))
        t = pa.table(
            {
                "log": pa.array(logs, pa.string()),
                "stream": pa.array(streams, pa.string()),
                "time": pa.array(times, pa.string()),
            }
        )
        ts = parse.parse_cri_time_ns(t["time"].combine_chunks())
        return t.append_column("ts_ns", ts)

    return ds.map_batches(to_records, batch_format="pyarrow", batch_size=None)


def read_docker_json_logs_with_source(paths: list[str] | str) -> rd.Dataset:
    """P3 with per-file identity: docker JSON-per-line files, ``source``
    = file stem (tail tag from the path). The raw ``log`` value is kept
    VERBATIM incl. any trailing newline — docker terminates complete
    lines with ``\\n`` and 16KB-split partial chunks lack it, which is
    exactly the record-boundary signal the rejoin stage reads."""
    import os

    ds = rd.read_text(paths, include_paths=True)

    def to_records(batch: pa.Table) -> pa.Table:
        logs, streams, times, srcs = [], [], [], []
        for line, p in zip(batch["text"].to_pylist(),
                           batch["path"].to_pylist()):
            try:
                o = json.loads(line)
            except json.JSONDecodeError:
                continue
            logs.append(o.get("log"))
            streams.append(o.get("stream", "stdout"))
            times.append(o.get("time"))
            srcs.append(os.path.basename(p).rsplit(".", 1)[0])
        t = pa.table(
            {
                "log": pa.array(logs, pa.string()),
                "stream": pa.array(streams, pa.string()),
                "time": pa.array(times, pa.string()),
                "source": pa.array(srcs, pa.string()),
            }
        )
        ts = parse.parse_cri_time_ns(t["time"].combine_chunks())
        return t.append_column("ts_ns", ts)

    return ds.map_batches(to_records, batch_format="pyarrow", batch_size=None)


# --------------------------------------------------------------------------
# wire-format writers (test harness / format round-trips)
# --------------------------------------------------------------------------

def write_cri_log(path: str, raws: list[str]) -> None:
    with open(path, "w") as f:
        for r in raws:
            f.write(r + "\n")


def write_docker_json_log(path: str, records: list[dict]) -> None:
    """records: dicts with log/stream/time keys (docker wire format)."""
    with open(path, "w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")


def read_jsonl(
    paths: list[str] | str,
    fields: list[tuple[str, pa.DataType]],
) -> rd.Dataset:
    """JSONL (newline-delimited JSON) source → typed columns.

    ``ray.data.read_text`` streams lines (one block per file chunk);
    the per-line JSON decode reuses the Merge_Log kernel contract
    (missing keys → null, malformed lines → all-null row with
    ``parsed=false``) so a JSONL tail behaves exactly like a docker
    tail whose whole payload is the JSON body.
    """
    ds = rd.read_text(paths)

    def to_records(batch: pa.Table) -> pa.Table:
        t = pa.table({"log": batch["text"]})
        t = parse.merge_log(t, key="log", out="rec", fields=fields)
        rec = t["rec"].combine_chunks()
        cols = {name: rec.field(name) for name, _ in fields}
        cols["parsed"] = pa.compute.is_valid(rec)
        return pa.table(cols)

    return ds.map_batches(to_records, batch_format="pyarrow",
                          batch_size=None)
