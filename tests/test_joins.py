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


def test_left_outer_distribution_keeps_zero_count_rows(tmp_path):
    """orders_cust_distribution (Q13 shape): customers with no
    qualifying orders must land in the c_count=0 bucket."""
    import pyarrow.parquet as pq

    from raylog.pipelines.queries_sources import orders_cust_distribution

    cust = pa.table({
        "c_custkey": pa.array(np.arange(8, dtype=np.int64)),
        "c_name": pa.array([f"c{i}" for i in range(8)]),
        "c_nationkey": pa.array(np.zeros(8, dtype=np.int64)),
        "c_acctbal": pa.array(np.zeros(8)),
        "c_mktsegment": pa.array(["A"] * 8),
    })
    # customers 0,1 have 2 normal orders each; 2 has only urgent
    # (filtered out -> zero bucket); 3..7 have none at all
    orders = pa.table({
        "o_orderkey": pa.array(np.arange(5, dtype=np.int64)),
        "o_custkey": pa.array([0, 0, 1, 1, 2], type=pa.int64()),
        "o_orderstatus": pa.array(["O"] * 5),
        "o_totalprice": pa.array(np.ones(5)),
        "o_orderdate": pa.array(["1996-01-01"] * 5),
        "o_orderpriority": pa.array(
            ["2-HIGH", "3-MEDIUM", "2-HIGH", "5-LOW", "1-URGENT"]),
    })
    pq.write_table(cust, tmp_path / "customer.parquet")
    pq.write_table(orders, tmp_path / "orders.parquet")
    out = orders_cust_distribution(str(tmp_path))
    got = dict(zip(out["c_count"].to_pylist(), out["custdist"].to_pylist()))
    assert got == {0: 6, 2: 2}
