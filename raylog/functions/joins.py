"""Skew-aware salted hash join.

A hash join partitions by key, so one hot key (the zipf-skewed
``source`` — ~30% of all rows in this workload's fixtures) lands whole
on one reducer and serializes the join. When the small side is too big
to broadcast, the standard fix is SALTING: replicate the small side's
hot-key rows across ``salt_factor`` sub-keys and scatter the fact side's
hot rows uniformly over them (deterministic hash of a row id — no RNG),
then join on (key, salt). Hot-key reducer load drops by ``salt_factor``;
non-hot keys pay nothing (salt 0, no replication).

Hot keys are detected from the fact side's own key histogram — a
key-compressed partial aggregate (`agg.grouped_aggregate_ds`), so
detection never moves raw rows. The result is row-identical to the
unsalted join (asserted against the SQL oracle).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from raylog.functions.agg import grouped_aggregate_ds


def detect_hot_keys(
    fact: rd.Dataset, key: str, *, hot_fraction: float = 0.05,
    num_partitions: int = 8,
) -> tuple[set, int]:
    """(keys holding > hot_fraction of rows, total rows) from a
    key-compressed count — cost is one partial-aggregate pass."""
    counts = grouped_aggregate_ds(
        fact.select_columns([key]), [key], [("*", "count", "n")],
        num_partitions=num_partitions,
    ).to_pandas()  # one row per distinct key (key-compressed)
    total = int(counts["n"].sum())
    hot = set(counts.loc[counts["n"] > hot_fraction * total, key])
    return hot, total


def salted_join(
    fact: rd.Dataset,
    dim: pa.Table,
    *,
    key: str,
    salt_factor: int = 8,
    hot_keys: set | None = None,
    num_partitions: int = 8,
) -> rd.Dataset:
    """Inner hash join fact ⋈ dim on ``key`` with hot-key salting.

    ``dim`` is a driver-side Arrow table here (the dim side is still
    orders of magnitude smaller than the fact side — just not small
    enough to broadcast into every task at full replication); only its
    HOT-key rows are replicated ``salt_factor`` times.
    """
    if hot_keys is None:
        hot_keys, _ = detect_hot_keys(fact, key,
                                      num_partitions=num_partitions)
    hot_list = pa.array(sorted(hot_keys), type=dim[key].type)

    # dim side: hot rows × salt_factor, cold rows once with salt 0
    import pyarrow.compute as pc

    is_hot = pc.is_in(dim[key], value_set=hot_list)
    hot_rows = dim.filter(is_hot)
    cold_rows = dim.filter(pc.invert(is_hot))
    replicated = [cold_rows.append_column(
        "__salt", pa.nulls(cold_rows.num_rows, pa.int32()).fill_null(0))]
    for s in range(salt_factor):
        replicated.append(hot_rows.append_column(
            "__salt", pa.nulls(hot_rows.num_rows, pa.int32()).fill_null(s)))
    dim_salted = pa.concat_tables(replicated)
    dim_ds = rd.from_arrow(dim_salted).map_batches(
        lambda b: b.rename_columns(
            ["__dk" if c == key else c for c in b.column_names]),
        batch_format="pyarrow", batch_size=None,
    )

    def add_salt(b: pa.Table) -> pa.Table:
        hot_mask = np.asarray(
            pc.is_in(b[key], value_set=hot_list).fill_null(False))
        # hot rows round-robin over the salts, counting HOT rows only
        # (cumsum over the mask) — even spread regardless of how hot
        # rows are interleaved with cold ones in the batch. The JOIN
        # RESULT is independent of which salt a row gets (every salt
        # has a matching dim replica), so batch-boundary variation
        # cannot change the output.
        hot_rank = np.cumsum(hot_mask, dtype=np.int64) - 1
        salt = np.where(hot_mask, hot_rank % salt_factor, 0).astype(np.int32)
        return b.append_column("__salt", pa.array(salt))

    fact_salted = fact.map_batches(add_salt, batch_format="pyarrow",
                                   batch_size=None)
    joined = fact_salted.join(
        dim_ds, join_type="inner", num_partitions=num_partitions,
        on=(key, "__salt"), right_on=("__dk", "__salt"),
    )
    return joined.map_batches(
        lambda b: b.drop_columns(
            [c for c in ("__salt", "__dk") if c in b.column_names]),
        batch_format="pyarrow", batch_size=None,
    )
