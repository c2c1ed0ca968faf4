"""Batch 47: Kaplan-Meier life table, join-size stats, Theil-Sen."""

import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _write(d, name, tbl):
    pq.write_table(tbl, os.path.join(d, f"{name}.parquet"))


def test_survival_km_brute_force():
    from raylog.pipelines.queries_events import events_survival_km

    rng = np.random.default_rng(5)
    rows_u, rows_t = [], []
    # 40 users with assorted first/last days; corpus max day = 60
    for u in range(40):
        f = int(rng.integers(0, 30))
        life = int(rng.integers(0, 25))
        last = min(f + life, 60)
        rows_u += [u, u]
        rows_t += [f * 86400 * 10**6, last * 86400 * 10**6]
    # pin the global max so censoring cutoff is deterministic
    rows_u.append(999)
    rows_t.append(60 * 86400 * 10**6)
    tbl = pa.table({
        "user_id": pa.array(rows_u, pa.int64()),
        "ts": pa.array(np.array(rows_t, dtype="datetime64[us]")),
    })
    with tempfile.TemporaryDirectory() as d:
        _write(d, "events", tbl)
        got = events_survival_km(d).to_pandas().set_index("lifetime_days")

    # brute force
    users = {}
    for u, t in zip(rows_u, rows_t):
        f, l = users.get(u, (t, t))
        users[u] = (min(f, t), max(l, t))
    gmax = max(t for t in rows_t)
    lab = [
        ((l - f) // (86400 * 10**6), 1 if l > gmax - 7 * 86400 * 10**6 else 0)
        for f, l in users.values()
    ]
    lifetimes = sorted({t for t, _ in lab})
    for t in lifetimes:
        at_risk = sum(1 for tt, _ in lab if tt >= t)
        ev = sum(1 for tt, c in lab if tt == t and c == 0)
        ce = sum(1 for tt, c in lab if tt == t and c == 1)
        assert got.loc[t, "n_at_risk"] == at_risk
        assert got.loc[t, "n_events"] == ev
        assert got.loc[t, "n_censored"] == ce
    # KM invariants: at_risk strictly decreasing in t, top row = n_users
    ar = got.sort_index()["n_at_risk"].to_numpy()
    assert ar[0] == len(users) and (np.diff(ar) < 0).all()


def test_join_cardinality_exact_vs_real_join():
    from raylog.pipelines.queries_marts import join_cardinality_profile

    rng = np.random.default_rng(9)
    ok = np.arange(50, dtype=np.int64)
    orders = pa.table({
        "o_orderkey": pa.array(ok),
        "o_custkey": pa.array(rng.integers(0, 12, 50).astype(np.int64)),
    })
    li_keys = rng.integers(0, 60, 300).astype(np.int64)  # some unmatched
    lineitem = pa.table({"l_orderkey": pa.array(li_keys)})
    customer = pa.table({
        "c_custkey": pa.array(np.arange(15, dtype=np.int64))})
    with tempfile.TemporaryDirectory() as d:
        _write(d, "orders", orders)
        _write(d, "lineitem", lineitem)
        _write(d, "customer", customer)
        got = join_cardinality_profile(d).to_pandas().set_index(
            ["left_table", "right_table"])
    # real join sizes
    ol = got.loc[("orders", "lineitem")]
    real = sum(1 for k in li_keys if k < 50)
    assert ol.join_rows == real
    assert ol.n_keys_left == 50
    assert ol.n_keys_both == len({k for k in li_keys if k < 50})
    cnt = np.bincount(li_keys[li_keys < 50], minlength=50)
    assert ol.max_key_fanout == cnt.max()
    co = got.loc[("customer", "orders")]
    ocust = orders["o_custkey"].to_numpy()
    assert co.join_rows == sum(1 for k in ocust if k < 15)
    assert co.max_key_fanout == np.bincount(ocust, minlength=15).max()


def test_theilsen_outlier_immunity():
    from raylog.pipelines.queries_stats import events_theilsen_trend

    # steady +2/day trend with one massive spike day: Theil-Sen ~2,
    # where an OLS slope would be dragged far off
    rows_t, rows_ty = [], []
    for day in range(20):
        n = 10 + 2 * day if day != 10 else 500
        for _ in range(n):
            rows_t.append(day * 86400 * 10**6)
            rows_ty.append("steady")
    tbl = pa.table({
        "event_type": pa.array(rows_ty),
        "ts": pa.array(np.array(rows_t, dtype="datetime64[us]")),
    })
    with tempfile.TemporaryDirectory() as d:
        _write(d, "events", tbl)
        got = events_theilsen_trend(d).to_pandas().iloc[0]
    assert got.n_days == 20 and got.n_pairs == 190
    assert abs(got.slope_micro - 2_000_000) < 500_000  # ~2/day, not ~25
