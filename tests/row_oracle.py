"""Row-oriented pure-Python oracle mirroring the fluent-bit chain literally.

This is the test-side reimplementation the vectorized Ray pipeline must
match exactly (SURVEY.md §5): one Python dict per record, processed through
the reference's filter chain step by step — CRI parse (P4), truncate (P1),
k8s-style enrichment (E1), erda-info (P2), reshape (N7-N10), rewrite_tag
routing (T1/T2, §2.6 truth table), final LogEvent projection (G3/N11).
Deliberately slow and literal; run only on small fixtures.
"""

from __future__ import annotations

import re
from datetime import datetime, timezone

# Python re equivalents of the reference regexes (conf/ds/parsers.conf)
CRI_RE = re.compile(r"^(?P<time>[^ ]+) (?P<stream>stdout|stderr) (?P<logtag>[^ ]*) (?P<log>.*)$")
ERDA_INFO_RE = re.compile(
    r"(?P<level>[Aa]lert|ALERT|[Tt]race|TRACE|[Dd]ebug|DEBUG|DEBU|[Ii]nfo|INFO"
    r"|[Ww]arn(?:ing)?|WARN(?:ING)?|[Ee]rr(?:or)?|ERR(?:OR)){1}(.*?)"
    r"\[([\w|\-|_]*?)\,"
    r"(?P<request_id>\{?\w{8}-?\w{4}-?\w{4}-?\w{4}-?\w{12}\}?)?"
    r"([\,|\w|\-|_|=]*?)\]"
)
TIME_RE = re.compile(
    r"^(?P<sec>\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2})(?:\.(?P<frac>\d+))?(?P<tz>Z|[+-]\d{2}:\d{2})$"
)


def parse_time_ns(s: str) -> int | None:
    m = TIME_RE.match(s)
    if not m:
        return None
    sec = datetime.strptime(m.group("sec"), "%Y-%m-%dT%H:%M:%S").replace(
        tzinfo=timezone.utc
    )
    ns = int(sec.timestamp()) * 1_000_000_000
    frac = (m.group("frac") or "0").ljust(9, "0")[:9]
    ns += int(frac)
    tz = m.group("tz")
    if tz != "Z":
        sign = -1 if tz[0] == "-" else 1
        off = sign * (int(tz[1:3]) * 3600 + int(tz[4:6]) * 60)
        ns -= off * 1_000_000_000
    return ns


def process_record(rec: dict, dim: dict[str, dict], cap: int = 51200) -> dict:
    """One record through the whole chain; returns {'sinks': [...], 'event': {...}}."""
    out = dict(rec)
    # P4 CRI parse
    m = CRI_RE.match(rec["raw"])
    if m:
        out["stream"] = m.group("stream")
        out["log"] = m.group("log")
        out["ts_ns"] = parse_time_ns(m.group("time"))
    else:
        out["stream"] = None
        out["log"] = None
        out["ts_ns"] = None
    # P1 truncate
    if out.get("log") is not None:
        out["log"] = out["log"][:cap]
    # E1 enrichment (left-join; miss → keys absent)
    meta = dim.get(rec["source"])
    if meta:
        out.update({k: v for k, v in meta.items() if k != "source"})
    # P2 erda-info
    if out.get("log") is not None:
        m2 = ERDA_INFO_RE.search(out["log"])
        if m2:
            out["level"] = m2.group("level")
            out["request_id"] = m2.group("request_id")
    # T1/T2 routing truth table (SURVEY.md §2.6)
    has_export = out.get("monitor_log_collector") is not None
    has_job = out.get("terminus_define_tag") is not None
    sinks = []
    if has_export:
        sinks.append("export")
    if has_job:
        sinks.append("job")
    else:
        sinks.append("container")
    # G3/N11 projection
    events = {}
    for sink in sinks:
        ev = {
            "doc_id": rec["doc_id"],
            "source": rec["source"],
            "stream": out.get("stream") or "stdout",
            "level": out.get("level"),
            "request_id": out.get("request_id"),
            "ts_ns": out.get("ts_ns"),
            "content": out.get("log"),
            "tokens": rec.get("tokens"),
        }
        if sink == "job":
            ev["id"] = out.get("terminus_define_tag") or ""
            ev["source_out"] = "job"
        else:
            ev["id"] = out.get("container_id") or ""
            ev["source_out"] = "container"
        events[sink] = ev
    return {"sinks": sinks, "events": events}
