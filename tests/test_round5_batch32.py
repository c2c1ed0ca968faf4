"""Edge-case tests for the round-5 batch-32 operators: the
distributed-prefix-scan pair ``events_peak_concurrency`` and
``events_concurrency_histogram``.
"""

import datetime as dt

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from raylog.pipelines.queries import ORACLES, QUERIES

_T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _us(minutes):
    return _T0 + dt.timedelta(minutes=minutes)


def _write_events(tmp_path, rows):
    pq.write_table(pa.table({
        "event_id": pa.array(list(range(len(rows))), pa.int64()),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
    }), str(tmp_path / "events.parquet"))
    return str(tmp_path)


def _cmp(name, sf_dir, keys):
    out = QUERIES[name](sf_dir)
    if hasattr(out, "to_pandas"):
        out = out.to_pandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')")
    want = con.execute(ORACLES[name]).fetchdf()
    got = out.sort_values(keys).reset_index(drop=True)
    want = want.sort_values(keys).reset_index(drop=True)
    got = got[sorted(got.columns)]
    want = want[sorted(want.columns)]
    pd.testing.assert_frame_equal(
        got, want, check_dtype=False, check_exact=True)
    return got


def test_peak_closed_interval_touch_counts(tmp_path, ray_session):
    """A session ending exactly when another starts overlaps it, and a
    >30-min gap splits one user into two sessions."""
    rows = [
        # user 1: one session [0, 10min]
        (1, _us(0)), (1, _us(10)),
        # user 2: session starting exactly at user 1's end -> overlap
        (2, _us(10)), (2, _us(20)),
        # user 3: two sessions (gap 40min > 30min): [100,105], [145,150]
        (3, _us(100)), (3, _us(105)), (3, _us(145)), (3, _us(150)),
    ]
    sf = _write_events(tmp_path, rows)
    got = _cmp("events_peak_concurrency", sf, ["peak_concurrency"])
    assert got["peak_concurrency"].iloc[0] == 2
    assert got["n_intervals"].iloc[0] == 4
    # peak first attained at the touch instant (minute 10)
    want_us = int(_us(10).timestamp() * 1_000_000)
    assert got["peak_at_us"].iloc[0] == want_us


def test_histogram_conservation_and_levels(tmp_path, ray_session):
    """Level durations: staircase area matches hand computation."""
    rows = [
        # user 1: [0, 30min]; user 2: [10, 20min] nested inside
        (1, _us(0)), (1, _us(30)),
        (2, _us(10)), (2, _us(20)),
    ]
    sf = _write_events(tmp_path, rows)
    got = _cmp("events_concurrency_histogram", sf, ["level"])
    by = dict(zip(got["level"], got["dur_us"]))
    m = 60_000_000  # one minute in us
    # level 1: [0,10) + [20,30) = 20 min; level 2: [10,20) = 10 min
    assert by == {1: 20 * m, 2: 10 * m}


def test_histogram_idle_gap_at_level_zero(tmp_path, ray_session):
    """Time between disjoint sessions is reported at level 0."""
    rows = [
        (1, _us(0)), (1, _us(5)),
        (2, _us(65)), (2, _us(70)),  # 60 min later (own session)
    ]
    sf = _write_events(tmp_path, rows)
    got = _cmp("events_concurrency_histogram", sf, ["level"])
    by = dict(zip(got["level"], got["dur_us"]))
    m = 60_000_000
    assert by[0] == 60 * m   # idle [5, 65)
    assert by[1] == 10 * m   # two 5-min sessions
