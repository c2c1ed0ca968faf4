"""Batch 48: OHLC bars, OLS sufficient statistics, column profiling."""

import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _write(d, name, tbl):
    pq.write_table(tbl, os.path.join(d, f"{name}.parquet"))


def test_ohlc_bars_brute_force():
    from raylog.pipelines.queries_events import events_ohlc_daily

    rng = np.random.default_rng(21)
    n = 600
    day = rng.integers(0, 10, n)
    within = rng.integers(0, 86400_000_000, n)
    ts = day * 86400 * 10**6 + within
    # force timestamp ties inside one bar to exercise the event_id break
    ts[1] = ts[0]
    day = ts // (86400 * 10**6)
    val = np.round(rng.uniform(-50, 50, n), 3)
    et = rng.choice(["x", "y"], n)
    tbl = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts.astype("datetime64[us]")),
        "event_type": pa.array(et),
        "value": pa.array(val),
    })
    with tempfile.TemporaryDirectory() as d:
        _write(d, "events", tbl)
        got = (events_ohlc_daily(d).to_pandas()
               .set_index(["event_type", "day"]).sort_index())
    for (t, dd), grp in __import__("pandas").DataFrame({
        "t": et, "d": day, "ts": ts, "id": np.arange(n), "v": val
    }).groupby(["t", "d"]):
        g = grp.sort_values(["ts", "id"])
        row = got.loc[(t, dd)]
        assert row["open"] == g["v"].iloc[0]
        assert row["close"] == g["v"].iloc[-1]
        assert row["high"] == g["v"].max()
        assert row["low"] == g["v"].min()
        assert row["n_events"] == len(g)


def test_ols_recovers_exact_linear_trend():
    from raylog.pipelines.queries_stats import events_ols_by_type

    # y = 3x + 7 exactly: slope_micro == 3e6, intercept_micro == 7e6
    rows_t, rows_ty = [], []
    for day in range(12):
        for _ in range(3 * day + 7):
            rows_t.append(day * 86400 * 10**6)
            rows_ty.append("lin")
    tbl = pa.table({
        "event_type": pa.array(rows_ty),
        "ts": pa.array(np.array(rows_t, dtype="datetime64[us]")),
    })
    with tempfile.TemporaryDirectory() as d:
        _write(d, "events", tbl)
        got = events_ols_by_type(d).to_pandas().iloc[0]
    assert got.n_days == 12
    assert got.slope_micro == 3_000_000
    assert got.intercept_micro == 7_000_000


def test_column_profile_nulls_and_distinct():
    from raylog.pipelines.queries_stats import profile_column_stats

    tbl = pa.table({
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
        "ts": pa.array(np.array([0, 0, 86400_000_000, 0],
                                dtype="datetime64[us]")),
        "user_id": pa.array([1, 1, 2, None], pa.int64()),
        "event_type": pa.array(["a", "a", None, None]),
        "value": pa.array([1.5, 1.5, 2.5, None], pa.float64()),
        "props": pa.array([None, None, None, None], pa.string()),
    })
    with tempfile.TemporaryDirectory() as d:
        _write(d, "events", tbl)
        got = (profile_column_stats(d).to_pandas()
               .set_index("column_name"))
    assert (got["n_rows"] == 4).all()
    assert got.loc["user_id", "n_null"] == 1
    assert got.loc["user_id", "n_distinct"] == 2
    assert got.loc["event_type", "n_null"] == 2
    assert got.loc["event_type", "n_distinct"] == 1
    assert got.loc["value", "n_distinct"] == 2
    assert got.loc["props", "n_null"] == 4
    assert got.loc["props", "n_distinct"] == 0
    assert got.loc["event_id", "n_distinct"] == 4
    assert got.loc["ts", "n_distinct"] == 2
