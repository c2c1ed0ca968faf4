"""Unit tests for the nest/lift/modify reshape family (SURVEY §2.5)."""

import pyarrow as pa

from raylog.stages import reshape


def _t(**cols):
    return pa.table({k: pa.array(v) for k, v in cols.items()})


class TestModify:
    def test_rename_does_not_overwrite(self):
        # fluent-bit `rename` is a no-op when dst exists
        out = reshape.apply_modify(_t(a=[1], b=[2]), [("rename", "a", "b")])
        assert out.column_names == ["a", "b"]
        assert out["b"].to_pylist() == [2]

    def test_hard_rename_overwrites(self):
        out = reshape.apply_modify(_t(a=[1], b=[2]), [("hard_rename", "a", "b")])
        assert out.column_names == ["b"]
        assert out["b"].to_pylist() == [1]

    def test_copy_add_set_remove(self):
        out = reshape.apply_modify(
            _t(a=[1]),
            [("copy", "a", "c"), ("add", "k", "v"), ("add", "k", "w"),
             ("set", "k", "x"), ("remove", "a")],
        )
        assert out.column_names == ["c", "k"]
        assert out["k"].to_pylist() == ["x"]

    def test_missing_src_is_noop(self):
        out = reshape.apply_modify(_t(a=[1]), [("rename", "zzz", "b")])
        assert out.column_names == ["a"]

    def test_order_matters(self):
        # N6 semantics: later op wins on collision
        out = reshape.apply_modify(
            _t(x=[1], y=[2]),
            [("hard_copy", "x", "t"), ("hard_copy", "y", "t")],
        )
        assert out["t"].to_pylist() == [2]


class TestNestLift:
    def test_roundtrip(self):
        t = _t(doc=[1], __tags_a=["A"], __tags_b=["B"], other=[9])
        nested = reshape.nest_columns(t, "__tags_", "tags")
        assert set(nested.column_names) == {"doc", "other", "tags"}
        assert nested["tags"].to_pylist() == [{"a": "A", "b": "B"}]
        lifted = reshape.lift_struct(nested, "tags", prefix="k8s_")
        assert lifted["k8s_a"].to_pylist() == ["A"]
        assert "tags" not in lifted.column_names

    def test_lift_overwrites_existing(self):
        t = _t(a=["old"])
        t = t.append_column(
            "s", pa.array([{"a": "new"}], pa.struct([("a", pa.string())]))
        )
        out = reshape.lift_struct(t, "s")
        assert out["a"].to_pylist() == ["new"]

    def test_nest_with_nulls(self):
        t = _t(__tags_a=["A", None])
        out = reshape.nest_columns(t, "__tags_", "tags")
        assert out["tags"].to_pylist() == [{"a": "A"}, {"a": None}]

    def test_drop_by_prefix(self):
        t = _t(__pri_x=[1], __pri_y=[2], keep=[3])
        out = reshape.drop_by_prefix(t, "__pri_")
        assert out.column_names == ["keep"]


class TestTypedMaps:
    """N9/N10 typed map columns (LogEvent Tags/Labels, out_erda/sender.go)."""

    def _routed_batch(self):
        import pyarrow as pa

        return pa.table({
            "doc_id": pa.array([1, 2], pa.int64()),
            "source": pa.array(["s1", "s2"]),
            "stream": pa.array(["stdout", None]),
            "level": pa.array(["INFO", None]),
            "request_id": pa.array([None, "r2"], pa.string()),
            "ts_ns": pa.array([10, 20], pa.int64()),
            "log": pa.array(["a", "b"]),
            "container_id": pa.array(["c1", None]),
            "pod_name": pa.array(["p1", "p2"]),
            "monitor_log_collector": pa.array(["http://c", None]),
            "terminus_define_tag": pa.array([None, "job-x"], pa.string()),
        })

    def test_tags_map_matches_tags_str(self):
        import pyarrow as pa

        from raylog.stages import route

        b = route.pack_tags(self._routed_batch())
        b = route.pack_tags_map(b)
        for tags_str, entries in zip(b["tags_str"].to_pylist(),
                                     b["tags"].to_pylist()):
            from_map = "".join(f"{k}={v};" for k, v in entries)
            assert from_map == tags_str
            # entries sorted by key, no null values
            keys = [k for k, _ in entries]
            assert keys == sorted(keys)
            assert all(v is not None for _, v in entries)

    def test_sink_parquet_carries_maps(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from raylog.stages import route

        b = route.pack_tags(self._routed_batch())
        out = route.project_logevent(b, "container", include_maps=True)
        p = str(tmp_path / "sink.parquet")
        pq.write_table(out, p)
        back = pq.read_table(p)
        assert dict(back["labels"].to_pylist()[0]) == {
            "monitor_log_collector": "http://c"}
        assert dict(back["labels"].to_pylist()[1]) == {
            "terminus_define_tag": "job-x"}
        t0 = dict(back["tags"].to_pylist()[0])
        assert t0["pod_name"] == "p1" and t0["container_id"] == "c1"
        assert "request_id" not in t0  # null tag omitted from the map
