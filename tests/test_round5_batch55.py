"""Batch 55: data-contract expectations + gap/SLA monitor."""

import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _write(d, name, tbl):
    pq.write_table(tbl, os.path.join(d, f"{name}.parquet"))


def test_expectations_catch_injected_violations():
    from raylog.pipelines.queries_stats import events_expectations_report

    tbl = pa.table({
        "event_id": pa.array([1, 2, 2, 4], pa.int64()),      # dup id
        "user_id": pa.array([1, None, 3, 4], pa.int64()),    # 1 null
        "event_type": pa.array(["click", "view", "weird", "login"]),
        "value": pa.array([10.0, 600.0, -5.0, 50.0]),         # 2 bad
    })
    with tempfile.TemporaryDirectory() as d:
        _write(d, "events", tbl)
        got = (events_expectations_report(d).to_pandas()
               .set_index("rule"))
    assert (got["n_checked"] == 4).all()
    assert got.loc["value_in_range", "n_violations"] == 2
    assert got.loc["user_id_not_null", "n_violations"] == 1
    assert got.loc["event_type_in_set", "n_violations"] == 1
    assert got.loc["event_id_unique", "n_violations"] == 1
    assert (got["passed"] == 0).all()


def test_expectations_all_pass_on_clean_data():
    from raylog.pipelines.queries_stats import events_expectations_report

    tbl = pa.table({
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "user_id": pa.array([1, 2, 3], pa.int64()),
        "event_type": pa.array(["click", "view", "error"]),
        "value": pa.array([0.0, 500.0, 250.0]),
    })
    with tempfile.TemporaryDirectory() as d:
        _write(d, "events", tbl)
        got = (events_expectations_report(d).to_pandas()
               .set_index("rule"))
    assert (got["passed"] == 1).all()
    assert (got["n_violations"] == 0).all()


def test_gap_sla_planted_outage():
    from raylog.pipelines.queries_stats import events_gap_sla_report

    H = 3_600_000_000
    # type 'a': events every 10 min for 1h, then a 5h outage, then one
    # more event -> max gap 5h, outage share 5h / 6h span
    ts_a = [i * 600_000_000 for i in range(7)]          # 0..1h
    ts_a.append(ts_a[-1] + 5 * H)                        # +5h
    # type 'b': steady, never violates
    ts_b = [i * 1_800_000_000 for i in range(12)]
    tbl = pa.table({
        "event_type": pa.array(["a"] * len(ts_a) + ["b"] * len(ts_b)),
        "ts": pa.array(np.array(ts_a + ts_b, dtype="datetime64[us]")),
        "event_id": pa.array(np.arange(len(ts_a) + len(ts_b),
                                       dtype=np.int64)),
    })
    with tempfile.TemporaryDirectory() as d:
        _write(d, "events", tbl)
        got = (events_gap_sla_report(d).to_pandas()
               .set_index("event_type"))
    assert got.loc["a", "max_gap_us"] == 5 * H
    span = ts_a[-1] - ts_a[0]
    assert got.loc["a", "outage_permille"] == 1000 * (5 * H) // span
    assert got.loc["b", "outage_permille"] == 0
    assert got.loc["b", "max_gap_us"] == 1_800_000_000
