"""Record reshaping ops — the nest/modify filter family (SURVEY §2.5).

The reference chains upstream `nest` / `modify` filters to reshape flat
keys ↔ nested maps (conf/ds/fluent-bit.conf:70-205). Arrow analogs over
columns / struct columns, all zero-copy where Arrow allows:

- N1/N2  ``lift_struct``     — un-nest a struct column into prefixed
  top-level columns (`nest lift ... add_prefix`)
- N3/N5/N9/N10 ``nest_columns`` — pack prefix-selected columns into a
  struct column, stripping the prefix (`nest nest ... remove_prefix`)
- N4/N12 ``drop_by_prefix``  — `modify remove_wildcard`
- N7     ``apply_modify``    — ordered rename/copy/hard-copy/add/remove
  (the compat keyword block semantics, incl. later-wins collisions)
- N8     11× copy aliases    — expressible as `apply_modify` copy ops

Config order matters in the reference (later lifts overwrite earlier keys
on collision, conf/ds/fluent-bit.conf:107-124); ``apply_modify`` applies
ops strictly in sequence to reproduce that precedence.
"""

from __future__ import annotations

import pyarrow as pa


def _arr(col):
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def lift_struct(batch: pa.Table, col: str, prefix: str = "",
                drop: bool = True) -> pa.Table:
    """N1/N2: un-nest a struct column into `prefix`-prefixed columns.

    Existing columns with the same name are overwritten (fluent-bit lift
    semantics: lifted keys land in the record namespace, later wins).
    """
    s = _arr(batch[col])
    if drop:
        batch = batch.drop_columns([col])
    for field in s.type:
        name = prefix + field.name
        child = s.field(field.name)
        if name in batch.column_names:
            batch = batch.set_column(batch.column_names.index(name), name, child)
        else:
            batch = batch.append_column(name, child)
    return batch


def nest_columns(batch: pa.Table, prefix: str, into: str,
                 strip_prefix: bool = True, drop: bool = True) -> pa.Table:
    """N3/N5/N9/N10: pack `prefix*` columns into one struct column."""
    names = [c for c in batch.column_names if c.startswith(prefix)]
    if not names:
        # zero matching keys → empty-struct column (fluent-bit nests an
        # empty map), not a zero-length array
        empty = pa.array([{}] * batch.num_rows, pa.struct([]))
        return batch.append_column(into, empty)
    arrays = [_arr(batch[c]) for c in names]
    fields = [
        (c[len(prefix):] if strip_prefix else c) for c in names
    ]
    struct = pa.StructArray.from_arrays(arrays, names=fields)
    if drop:
        batch = batch.drop_columns(names)
    return batch.append_column(into, struct)


def drop_by_prefix(batch: pa.Table, prefix: str) -> pa.Table:
    """N4/N12: `modify remove_wildcard prefix`."""
    names = [c for c in batch.column_names if c.startswith(prefix)]
    return batch.drop_columns(names) if names else batch


def apply_modify(batch: pa.Table, ops: list[tuple]) -> pa.Table:
    """N7/N8/N11: ordered modify ops, fluent-bit semantics.

    ops: ("rename", src, dst) — move column (no-op if src missing; does
    NOT overwrite an existing dst, like fluent-bit `rename`);
    ("hard_rename"/"hard_copy", src, dst) — overwrite dst;
    ("copy", src, dst) — duplicate (no overwrite);
    ("add", name, value) — constant column if absent;
    ("set", name, value) — constant column, overwrite;
    ("remove", name).
    """
    for op in ops:
        kind = op[0]
        if kind in ("rename", "hard_rename", "copy", "hard_copy"):
            _, src, dst = op
            if src not in batch.column_names:
                continue
            exists = dst in batch.column_names
            if exists and kind in ("rename", "copy"):
                continue
            col = _arr(batch[src])
            if exists:
                batch = batch.set_column(batch.column_names.index(dst), dst, col)
            else:
                batch = batch.append_column(dst, col)
            if kind in ("rename", "hard_rename"):
                batch = batch.drop_columns([src])
        elif kind in ("add", "set"):
            _, name, value = op
            exists = name in batch.column_names
            if exists and kind == "add":
                continue
            arr = pa.array([value] * batch.num_rows)
            if exists:
                batch = batch.set_column(batch.column_names.index(name), name, arr)
            else:
                batch = batch.append_column(name, arr)
        elif kind == "remove":
            _, name = op
            if name in batch.column_names:
                batch = batch.drop_columns([name])
        else:
            raise ValueError(f"unknown modify op {kind!r}")
    return batch


# the reference's N7 compat keyword block (conf/ds/fluent-bit.conf:132-145)
N7_COMPAT_OPS: list[tuple] = [
    ("add", "source", "container"),
    ("rename", "log", "content"),
    ("rename", "__tags_docker_id", "__tags_container_id"),
    ("rename", "__tags_namespace_name", "__tags_pod_namespace"),
    ("copy", "__tags_container_id", "id"),
    ("remove", "__tags_container_hash"),
    ("remove", "__tags_container_image"),
    ("rename", "__tags_terminus_define_tag", "__pri_terminus_define_tag"),
]

# N8: dice_* compat aliases (conf/ds/fluent-bit.conf:147-161)
N8_DICE_COPIES: list[tuple] = [
    ("copy", f"__tags_{k}", f"__tags_dice_{k}")
    for k in (
        "runtime_id", "runtime_name", "application_id", "application_name",
        "service_name", "workspace", "project_id", "project_name",
        "org_id", "org_name", "cluster_name",
    )
]
