"""Batch 56: Gorilla codec estimate + PSI drift."""

import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _write(d, name, tbl):
    pq.write_table(tbl, os.path.join(d, f"{name}.parquet"))


def test_gorilla_steady_stream_compresses_to_one_bit():
    from raylog.pipelines.queries_stats import events_gorilla_estimate

    # perfectly periodic stream: every dod == 0 -> 1 bit per delta
    n = 50
    ts = np.arange(n, dtype=np.int64) * 60_000_000
    tbl = pa.table({
        "event_type": pa.array(["steady"] * n),
        "ts": pa.array(ts.astype("datetime64[us]")),
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
    })
    with tempfile.TemporaryDirectory() as d:
        _write(d, "events", tbl)
        got = events_gorilla_estimate(d).to_pandas().iloc[0]
    assert got.n_deltas == n - 2
    assert got.bits_est == n - 2
    assert got.saved_permille == 1000 * (64 * (n - 2) - (n - 2)) \
        // (64 * (n - 2))


def test_gorilla_bucket_boundaries():
    from raylog.pipelines.queries_stats import events_gorilla_estimate

    # craft dods: 0 -> 1 bit, 64 -> 9, 65 -> 12, 2048 -> 16, 2049 -> 36
    deltas = [1000, 1000, 1000 + 64, 1000 + 64 + 65,
              1000 + 64 + 65 + 2048, 1000 + 64 + 65 + 2048 + 2049]
    ts = np.cumsum([0] + deltas).astype(np.int64)
    tbl = pa.table({
        "event_type": pa.array(["x"] * len(ts)),
        "ts": pa.array(ts.astype("datetime64[us]")),
        "event_id": pa.array(np.arange(len(ts), dtype=np.int64)),
    })
    with tempfile.TemporaryDirectory() as d:
        _write(d, "events", tbl)
        got = events_gorilla_estimate(d).to_pandas().iloc[0]
    assert got.n_deltas == 5
    assert got.bits_est == 1 + 9 + 12 + 16 + 36


def test_psi_zero_for_identical_and_large_for_shifted():
    from raylog.pipelines.queries_stats import docs_psi_drift

    def docs(nc_a, nc_b):
        nc = list(nc_a) + list(nc_b)
        return pa.table({
            "doc_id": pa.array(np.arange(len(nc), dtype=np.int64)),
            "text": pa.array(["x"] * len(nc)),
            "lang": pa.array(["en"] * len(nc)),
            "source": pa.array(["a"] * len(nc_a) + ["b"] * len(nc_b)),
            "n_chars": pa.array(nc, pa.int64()),
        })

    same = [150] * 40 + [450] * 40
    with tempfile.TemporaryDirectory() as d:
        _write(d, "documents", docs(same, same))
        psi0 = docs_psi_drift(d).to_pandas().iloc[0]
    with tempfile.TemporaryDirectory() as d:
        _write(d, "documents", docs([150] * 80, [1450] * 80))
        psi1 = docs_psi_drift(d).to_pandas().iloc[0]
    assert psi0.n_ref == 80 and psi0.n_other == 80
    # identical distributions: PSI ~ 0 (only per-bin floor rounding)
    assert abs(psi0.psi_micro) <= 20
    # disjoint bins: PSI far above the 0.25 "shifted" rule of thumb
    assert psi1.psi_micro > 1_000_000
