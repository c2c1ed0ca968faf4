"""Batch 49: CDC merge with tombstones, dyadic EWMA, mutual info."""

import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _write(d, name, tbl):
    pq.write_table(tbl, os.path.join(d, f"{name}.parquet"))


def test_cdc_merge_tombstone_semantics():
    from raylog.pipelines.queries_events import events_cdc_merge

    # user 1: upsert(1) then delete(10)      -> absent
    # user 2: delete(20) then upsert(21)     -> present, value of 21
    # user 3: single upsert(33)              -> present
    # user 4: upserts with a ts tie broken by event_id -> id 42 wins
    tbl = pa.table({
        "user_id": pa.array([1, 1, 2, 2, 3, 4, 4], pa.int64()),
        "ts": pa.array(np.array([0, 10, 0, 10, 5, 7, 7],
                                dtype="datetime64[s]").astype(
                                    "datetime64[us]")),
        "event_id": pa.array([1, 10, 20, 21, 33, 41, 42], pa.int64()),
        "value": pa.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0]),
    })
    with tempfile.TemporaryDirectory() as d:
        _write(d, "events", tbl)
        got = (events_cdc_merge(d).to_pandas()
               .set_index("user_id").sort_index())
    assert list(got.index) == [2, 3, 4]
    assert got.loc[2, "last_event_id"] == 21
    assert got.loc[2, "last_value"] == 4.0
    assert got.loc[2, "n_ops"] == 2
    assert got.loc[4, "last_event_id"] == 42
    assert got.loc[4, "last_value"] == 7.0


def test_ewma_exact_dyadic():
    from raylog.pipelines.queries_events import events_ewma_volume

    # counts 8, 4, 2 on days 0,1,2: ewma(2) = 2 + 4/2 + 8/4 = 6 exactly
    rows_t = ([0] * 8 + [86400 * 10**6] * 4 + [2 * 86400 * 10**6] * 2)
    tbl = pa.table({
        "event_type": pa.array(["a"] * 14),
        "ts": pa.array(np.array(rows_t, dtype="datetime64[us]")),
    })
    with tempfile.TemporaryDirectory() as d:
        _write(d, "events", tbl)
        got = (events_ewma_volume(d).to_pandas()
               .set_index("day")["ewma_milli"].to_dict())
    assert got == {0: 8000, 1: 8000, 2: 6000}


def test_mutual_information_independence_and_dependence():
    from raylog.pipelines.queries_stats import events_mutual_information

    day_us = 86400 * 10**6
    # independent: every (type, weekday) cell equal -> MI == 0
    rows_t, rows_ty = [], []
    for wd in range(7):
        for t in ["a", "b"]:
            for _ in range(10):
                rows_t.append(wd * day_us)
                rows_ty.append(t)
    ind = pa.table({
        "event_type": pa.array(rows_ty),
        "ts": pa.array(np.array(rows_t, dtype="datetime64[us]")),
    })
    # dependent: type 'a' only on weekday 0, 'b' only on weekday 1
    dep = pa.table({
        "event_type": pa.array(["a"] * 10 + ["b"] * 10),
        "ts": pa.array(np.array([0] * 10 + [day_us] * 10,
                                dtype="datetime64[us]")),
    })
    with tempfile.TemporaryDirectory() as d:
        _write(d, "events", ind)
        mi0 = events_mutual_information(d).to_pandas().iloc[0]
    with tempfile.TemporaryDirectory() as d:
        _write(d, "events", dep)
        mi1 = events_mutual_information(d).to_pandas().iloc[0]
    assert abs(mi0.mi_micro) <= mi0.n_cells  # 0 up to per-cell floor
    # perfect dependence of 2 equiprobable symbols: MI = ln 2 nats
    assert abs(mi1.mi_micro - 693_147) <= mi1.n_cells + 1
