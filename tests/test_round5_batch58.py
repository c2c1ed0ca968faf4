"""Batch 58: mix/rate change decomposition."""

import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _write(d, name, tbl):
    pq.write_table(tbl, os.path.join(d, f"{name}.parquet"))


def _events(rows):
    """rows: list of (type, day, value)."""
    day_us = 86400 * 10**6
    return pa.table({
        "event_type": pa.array([r[0] for r in rows]),
        "ts": pa.array(np.array([r[1] * day_us for r in rows],
                                dtype="datetime64[us]")),
        "value": pa.array([float(r[2]) for r in rows]),
    })


def test_decomposition_additive_and_attributed():
    from raylog.pipelines.queries_stats import events_change_decomposition

    # span days 0..10 -> midpoint 5; period 0 = days <= 5
    # 'vol': rate stays 10.0, count doubles 4 -> 8 (pure volume effect)
    # 'rate': count stays 4, rate 10 -> 25 (pure rate effect)
    rows = []
    rows += [("vol", 1, 10.0)] * 4 + [("vol", 9, 10.0)] * 8
    rows += [("rate", 1, 10.0)] * 4 + [("rate", 9, 25.0)] * 4
    rows += [("anchor", 0, 1.0), ("anchor", 10, 1.0)]  # pins the span
    with tempfile.TemporaryDirectory() as d:
        _write(d, "events", _events(rows))
        got = (events_change_decomposition(d).to_pandas()
               .set_index("event_type"))
    v = got.loc["vol"]
    assert v.total_delta_e4 == 4 * 100000
    assert v.volume_effect_e4 == 4 * 100000 and v.rate_effect_e4 == 0
    r = got.loc["rate"]
    assert r.total_delta_e4 == 4 * 150000
    assert r.volume_effect_e4 == 0 and r.rate_effect_e4 == 4 * 150000
    # exact additivity for every segment, including the anchor
    assert (got.volume_effect_e4 + got.rate_effect_e4
            == got.total_delta_e4).all()


def test_decomposition_vanishing_segment():
    from raylog.pipelines.queries_stats import events_change_decomposition

    # 'gone' exists only in period 0; 'new' only in period 1
    rows = [("gone", 0, 7.0), ("gone", 1, 7.0), ("new", 9, 3.0),
            ("anchor", 0, 1.0), ("anchor", 10, 1.0)]
    with tempfile.TemporaryDirectory() as d:
        _write(d, "events", _events(rows))
        got = (events_change_decomposition(d).to_pandas()
               .set_index("event_type"))
    assert got.loc["gone", "total_delta_e4"] == -14 * 10000
    assert got.loc["new", "total_delta_e4"] == 3 * 10000
    assert got.loc["new", "volume_effect_e4"] == 3 * 10000  # n0=0 rule
    assert (got.volume_effect_e4 + got.rate_effect_e4
            == got.total_delta_e4).all()
