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
