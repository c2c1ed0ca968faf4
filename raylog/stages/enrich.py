"""Enrichment stages — broadcast-lookup left joins and constant tags.

Reference analogs:
- E1 `kubernetes` filter: per-record pod-metadata lookup with a process
  cache (conf/ds/fluent-bit.conf:44-59). Here: the dim table is broadcast
  once via ``ray.put`` and each actor builds its Arrow lookup index ONCE in
  ``__init__``; per batch the join is a vectorized ``index_in`` + ``take``
  (hash join against a small dimension side — no shuffle).
- E2 Lua cpuset lookup (conf/eci/scripts/enrich-meta.lua): same pattern;
  missing key → null columns, row still flows (the Lua ``-1`` path).
- E3/E4 record_modifier / modify-add constant tags
  (conf/eci/fluent-bit.conf:77-99, conf/ds/fluent-bit.conf:127-130).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

try:  # allow pure-pyarrow unit tests without Ray
    import ray
except ImportError:  # pragma: no cover
    ray = None


class BroadcastEnricher:
    """Actor-pool stage: left-join a small dim table onto each batch.

    Use as ``ds.map_batches(BroadcastEnricher, fn_constructor_kwargs=
    {"dim": dim_ref, "key": "source"}, concurrency=N,
    batch_format="pyarrow")``. ``dim`` may be a ``pyarrow.Table`` or a Ray
    ObjectRef to one (``ray.put`` once on the driver; every actor reads the
    same object-store copy — never re-shipped per batch).
    """

    def __init__(self, dim, key: str = "source", prefix: str = ""):
        if ray is not None and isinstance(dim, ray.ObjectRef):
            dim = ray.get(dim)
        if not isinstance(dim, pa.Table):
            dim = pa.Table.from_pandas(dim)
        self.key = key
        self.prefix = prefix
        self.dim_keys = dim[key].combine_chunks()
        self.dim_cols = {
            name: dim[name].combine_chunks()
            for name in dim.column_names
            if name != key
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch[self.key]
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        idx = pc.index_in(arr, value_set=self.dim_keys)  # null → lookup miss
        for name, dim_col in self.dim_cols.items():
            batch = batch.append_column(self.prefix + name, pc.take(dim_col, idx))
        return batch


def constant_tags(batch: pa.Table, tags: dict[str, str]) -> pa.Table:
    """E3/E4: stamp constant columns onto every record (record_modifier)."""
    n = batch.num_rows
    for name, value in tags.items():
        if name in batch.column_names:
            batch = batch.set_column(
                batch.column_names.index(name),
                name,
                pa.nulls(n, pa.string()) if value is None else pa.array([value] * n),
            )
        else:
            batch = batch.append_column(
                name,
                pa.nulls(n, pa.string()) if value is None else pa.array([value] * n),
            )
    return batch
