"""Unit tests for the vectorized parse stages (reference parity cases)."""

import pyarrow as pa
import pytest

from raylog.stages import parse


def _t(**cols):
    return pa.table({k: pa.array(v) for k, v in cols.items()})


class TestErdaInfo:
    def test_level_variants(self):
        # every variant the reference regex accepts (conf/ds/parsers.conf:3)
        variants = [
            "Alert", "ALERT", "alert", "Trace", "TRACE", "trace", "Debug",
            "DEBUG", "DEBU", "debug", "Info", "INFO", "info", "Warn", "WARN",
            "warn", "Warning", "WARNING", "warning", "Err", "ERR", "err",
            "Error", "ERROR", "error",
        ]
        rows = [f"{v} [svc,12345678-0000-4000-8000-000000000000,k=v] - x" for v in variants]
        out = parse.erda_info(_t(log=rows))
        got = out["level"].to_pylist()
        # bare "ERR" must NOT match (ERR(?:OR) requires OR); "err" matches via
        # [Ee]rr(?:or)?; everything else matches verbatim
        for v, g in zip(variants, got):
            if v == "ERR":
                assert g is None, v
            else:
                assert g == v, (v, g)

    def test_request_id_shapes(self):
        uuid = "12345678-0000-4000-8000-000000000000"
        rows = [
            f"INFO [svc,{uuid},k=v] x",
            "INFO [svc,{12345678-0000-4000-8000-000000000000},k=v] x",  # braces
            "INFO [svc,123456780000400080000000000000000000,k=v] x"[:100],  # no hyphens (36 hex → matches 8+4+4+4+12=32.. may not)
            "INFO [svc,,k=v] x",  # missing request id → null
            "no level at all",
            "plain text without brackets INFO",
        ]
        out = parse.erda_info(_t(log=rows))
        got = out["request_id"].to_pylist()
        assert got[0] == uuid
        assert got[1] == "{" + uuid + "}"
        assert got[3] is None
        assert got[4] is None and out["level"].to_pylist()[4] is None
        assert got[5] is None and out["level"].to_pylist()[5] is None

    def test_no_match_passthrough(self):
        out = parse.erda_info(_t(log=["nothing here"], other=[1]))
        assert out["level"].to_pylist() == [None]
        assert out["other"].to_pylist() == [1]  # Reserve_Data semantics


class TestCriParse:
    def test_basic(self):
        raw = "2021-12-01T17:55:56.027178579+08:00 stderr F hello world"
        out = parse.cri_parse(_t(raw=[raw]))
        assert out["stream"].to_pylist() == ["stderr"]
        assert out["logtag"].to_pylist() == ["F"]
        assert out["log"].to_pylist() == ["hello world"]

    def test_ts_ns_offset(self):
        # 2021-12-01T17:55:56.027178579+08:00 == 09:55:56.027178579 UTC
        from datetime import datetime, timezone

        raw = "2021-12-01T17:55:56.027178579+08:00 stdout F x"
        out = parse.cri_parse(_t(raw=[raw]))
        base = int(
            datetime(2021, 12, 1, 9, 55, 56, tzinfo=timezone.utc).timestamp()
        )
        assert out["ts_ns"].to_pylist() == [base * 1_000_000_000 + 27178579]

    def test_ts_z_and_millis(self):
        out = parse.cri_parse(_t(raw=["2024-01-02T03:04:05.5Z stdout F x"]))
        # ".5" → 500ms
        assert out["ts_ns"].to_pylist()[0] % 1_000_000_000 == 500_000_000

    def test_non_matching_row(self):
        out = parse.cri_parse(_t(raw=["not a cri line"]))
        assert out["log"].to_pylist() == [None]
        assert out["ts_ns"].to_pylist() == [None]


class TestTruncate:
    def test_cap(self):
        out = parse.truncate_content(_t(log=["a" * 100, "short"]), cap=10)
        assert out["log"].to_pylist() == ["a" * 10, "short"]

    def test_tokens_untouched(self):
        t = pa.table(
            {
                "log": pa.array(["x" * 100]),
                "tokens": pa.array([[1, 2, 3]], pa.list_(pa.int32())),
            }
        )
        out = parse.truncate_content(t, cap=5)
        assert out["tokens"].to_pylist() == [[1, 2, 3]]


class TestPathParsers:
    def test_log_id(self):
        out = parse.log_id(
            _t(source=["/stdlog/nginx/0.log", "/stdlog/my-app-1/12.log", "/other/x.log"])
        )
        assert out["pri_id"].to_pylist() == ["nginx", "my-app-1", None]

    def test_cpuset(self):
        path = "/kubepods/besteffort/pod850b055a/c6d02f5eca25c7239ade38d8b8bada5763790eb4f106c4a9023607a28b8441cb"
        out = parse.cpuset_container_id(_t(cpuset=[path]))
        assert out["container_id_cpuset"].to_pylist() == [path.rsplit("/", 1)[1]]
