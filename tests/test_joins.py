"""Salted skew join: hot-key detection, replication scope, equivalence."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from raylog.functions.joins import detect_hot_keys, salted_join


def _skewed_fact(n=20_000, seed=8):
    rng = np.random.default_rng(seed)
    # key 0 holds ~40% of rows; the rest spread over 50 keys
    hot = np.zeros(int(n * 0.4), dtype=np.int64)
    cold = rng.integers(1, 51, size=n - len(hot))
    keys = np.concatenate([hot, cold])
    rng.shuffle(keys)
    return pa.table({
        "rid": pa.array(np.arange(n, dtype=np.int64)),
        "k": pa.array(keys),
    })


def test_detect_hot_keys():
    fact = rd.from_arrow(_skewed_fact()).repartition(4)
    hot, total = detect_hot_keys(fact, "k", hot_fraction=0.05)
    assert hot == {0}
    assert total == 20_000


def test_salted_join_equals_plain_join():
    tbl = _skewed_fact()
    dim = pa.table({
        "k": pa.array(np.arange(0, 51, dtype=np.int64)),
        "v": pa.array([f"dim-{i}" for i in range(51)]),
    })
    out = salted_join(
        rd.from_arrow(tbl).repartition(4), dim, key="k", salt_factor=4,
        num_partitions=4,
    ).to_pandas().sort_values("rid").reset_index(drop=True)
    assert len(out) == len(tbl)  # inner join, every key matches exactly once
    want_v = ["dim-%d" % k for k in tbl["k"].to_numpy()]
    assert out["v"].tolist() == [
        "dim-%d" % k for k in out["k"].to_numpy()]
    assert sorted(out["v"]) == sorted(want_v)


def test_salted_join_missing_dim_rows_drop():
    tbl = _skewed_fact(n=2000)
    dim = pa.table({
        "k": pa.array(np.arange(0, 10, dtype=np.int64)),  # keys 10-50 missing
        "v": pa.array([f"d{i}" for i in range(10)]),
    })
    out = salted_join(rd.from_arrow(tbl), dim, key="k", salt_factor=4,
                      num_partitions=2).to_pandas()
    keys = tbl["k"].to_numpy()
    assert len(out) == int((keys < 10).sum())
