"""Batch 54: lead-lag correlation + greedy set cover."""

import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _write(d, name, tbl):
    pq.write_table(tbl, os.path.join(d, f"{name}.parquet"))


def test_leadlag_detects_planted_shift():
    from raylog.pipelines.queries_stats import events_leadlag_correlation

    # type b's daily volume is exactly type a's, shifted 2 days later
    day_us = 86400 * 10**6
    rng = np.random.default_rng(3)
    base = rng.integers(5, 40, 24)
    rows_t, rows_ty = [], []
    for d in range(24):
        for _ in range(int(base[d])):
            rows_t.append(d * day_us)
            rows_ty.append("a")
        for _ in range(int(base[d])):
            rows_t.append((d + 2) * day_us)
            rows_ty.append("b")
    tbl = pa.table({
        "event_type": pa.array(rows_ty),
        "ts": pa.array(np.array(rows_t, dtype="datetime64[us]")),
    })
    with tempfile.TemporaryDirectory() as d:
        _write(d, "events", tbl)
        got = events_leadlag_correlation(d).to_pandas().iloc[0]
    assert (got.type_a, got.type_b) == ("a", "b")
    assert got.best_lag == 2
    assert got.corr_micro >= 999_999  # identical series at the shift


def test_greedy_setcover_known_instance():
    from raylog.pipelines.queries_marts import lineitem_greedy_setcover

    # supplier 1 covers parts {1..5}; supplier 2 covers {4..9} (gain 6
    # first); supplier 3 covers {1,2,3} (gain 3 after 2 picked first);
    # supplier 4 covers {10} only
    edges = {
        1: [1, 2, 3, 4, 5],
        2: [4, 5, 6, 7, 8, 9],
        3: [1, 2, 3],
        4: [10],
    }
    s, p = [], []
    for k, parts in edges.items():
        for pp in parts:
            s.append(k)
            p.append(pp)
            s.append(k)  # duplicate edges must not change gains
            p.append(pp)
    tbl = pa.table({
        "l_suppkey": pa.array(s, pa.int64()),
        "l_partkey": pa.array(p, pa.int64()),
    })
    with tempfile.TemporaryDirectory() as d:
        _write(d, "lineitem", tbl)
        got = lineitem_greedy_setcover(d).to_pandas()
    # round 3: parts {1,2,3} are already covered, so supplier 3 has
    # ZERO uncovered gain and supplier 4's single new part wins
    assert list(got["suppkey"]) == [2, 1, 4]
    assert list(got["gain"]) == [6, 3, 1]
    assert list(got["covered_parts"]) == [6, 9, 10]


def test_greedy_setcover_stops_when_exhausted():
    from raylog.pipelines.queries_marts import lineitem_greedy_setcover

    tbl = pa.table({
        "l_suppkey": pa.array([7, 7], pa.int64()),
        "l_partkey": pa.array([1, 2], pa.int64()),
    })
    with tempfile.TemporaryDirectory() as d:
        _write(d, "lineitem", tbl)
        got = lineitem_greedy_setcover(d).to_pandas()
    assert len(got) == 1
    assert got.iloc[0].suppkey == 7 and got.iloc[0].covered_parts == 2
