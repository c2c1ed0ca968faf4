"""Batch 46: skyline, rolling distinct users, shard rebalance audit."""

import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_orders_skyline_matches_brute_force():
    from raylog.pipelines.queries_marts import orders_skyline

    rng = np.random.default_rng(11)
    n = 300
    dates = rng.integers(0, 40, n).astype("datetime64[D]").astype(
        "datetime64[us]")
    price = np.round(rng.uniform(100, 1000, n), 2)
    # force a duplicate frontier point (two rows, same date+price)
    dates[1], price[1] = dates[0], price[0]
    tbl = pa.table({
        "o_orderkey": pa.array(np.arange(n, dtype=np.int64)),
        "o_orderdate": pa.array(dates),
        "o_totalprice": pa.array(price),
    })
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(tbl, os.path.join(d, "orders.parquet"))
        got = set(orders_skyline(d).to_pandas()["o_orderkey"])
    di = dates.astype(np.int64)
    brute = set()
    for i in range(n):
        dominated = False
        for j in range(n):
            if i == j:
                continue
            if (di[j] <= di[i] and price[j] >= price[i]
                    and (di[j] < di[i] or price[j] > price[i])):
                dominated = True
                break
        if not dominated:
            brute.add(i)
    assert got == brute


def test_rolling_distinct_users_matches_brute_force():
    from raylog.pipelines.queries_events import events_rolling_distinct_users

    rng = np.random.default_rng(3)
    n = 500
    user = rng.integers(0, 20, n)
    day = rng.integers(0, 30, n)
    ts = (day * 86400 * 1_000_000 + rng.integers(0, 86400_000_000, n))
    tbl = pa.table({
        "user_id": pa.array(user, pa.int64()),
        "ts": pa.array(ts.astype("datetime64[us]")),
    })
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(tbl, os.path.join(d, "events.parquet"))
        got = (events_rolling_distinct_users(d).to_pandas()
               .set_index("day")["wau"].to_dict())
    obs = sorted(set(day))
    brute = {
        dd: len({u for u, dv in zip(user, day) if dd - 6 <= dv <= dd})
        for dd in obs
    }
    assert got == brute


def test_rolling_distinct_gap_user():
    # One user with two active days further apart than the window: two
    # disjoint coverage intervals, never double-counted inside one.
    from raylog.pipelines.queries_events import events_rolling_distinct_users

    tbl = pa.table({
        "user_id": pa.array([1, 1], pa.int64()),
        "ts": pa.array(np.array([0, 20 * 86400 * 1_000_000],
                                dtype="datetime64[us]")),
    })
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(tbl, os.path.join(d, "events.parquet"))
        got = (events_rolling_distinct_users(d).to_pandas()
               .set_index("day")["wau"].to_dict())
    assert got == {0: 1, 20: 1}


def test_shard_rebalance_hrw_minimal_movement():
    from raylog.pipelines.queries_stats import shard_rebalance_audit

    tbl = pa.table({"doc_id": pa.array(np.arange(400, dtype=np.int64))})
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(tbl, os.path.join(d, "orders.parquet"))  # unused
        pq.write_table(tbl, os.path.join(d, "documents.parquet"))
        got = shard_rebalance_audit(d).to_pandas().set_index("strategy")
    # HRW moves ~1/17 (~59 permille); mod moves ~16/17 (~941 permille).
    assert got.loc["rendezvous", "moved_permille"] < 150
    assert got.loc["mod", "moved_permille"] > 700
    # exact brute-force on a few keys
    import hashlib

    for v in [0, 7, 123]:
        s = str(v)
        wt = [int(hashlib.md5(f"{s}|{sh}".encode()).hexdigest()[:15], 16)
              for sh in range(17)]
        s16 = max(range(16), key=wt.__getitem__)
        s17 = max(range(17), key=wt.__getitem__)
        # a key moves under HRW iff shard 16 wins the full argmax
        assert (s16 != s17) == (s17 == 16)
