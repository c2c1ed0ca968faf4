"""Online sharded-index dedup: global first-wins across blocks."""

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from raylog.state.dedup_index import online_dedup


def _corpus(n_rows: int, n_distinct: int) -> pa.Table:
    rng = np.random.default_rng(7)
    pick = rng.integers(0, n_distinct, n_rows)
    return pa.table({
        "doc_id": pa.array(np.arange(n_rows, dtype=np.int64)),
        "text": pa.array([f"document body number {p}" for p in pick]),
    })


def test_online_dedup_exact_survivor_set(ray_session):
    tbl = _corpus(5_000, 700)
    ds = rd.from_arrow(tbl).repartition(16)  # duplicates span blocks
    out, shards = online_dedup(ds, num_shards=4, concurrency=2)
    got = out.to_pandas()
    n_distinct = len(set(tbl["text"].to_pylist()))
    # survivor TEXT set == distinct texts, each exactly once
    assert sorted(got["text"].unique()) == sorted(set(tbl["text"].to_pylist()))
    assert len(got) == got["text"].nunique() == n_distinct
    # index occupancy equals distinct count, sharded
    sizes = ray.get([s.size.remote() for s in shards])
    assert sum(sizes) == n_distinct
    assert all(sz > 0 for sz in sizes)  # shards balanced-ish


def test_online_dedup_bloom_never_duplicates(ray_session):
    tbl = _corpus(3_000, 400)
    ds = rd.from_arrow(tbl).repartition(8)
    out, _ = online_dedup(ds, num_shards=4, concurrency=2,
                          approximate=True)
    got = out.to_pandas()
    n_distinct = len(set(tbl["text"].to_pylist()))
    # bloom may DROP novel rows (false positive) but never passes a dup
    assert got["text"].nunique() == len(got)
    # at this fill factor recall should be essentially complete
    assert len(got) >= n_distinct - 5
