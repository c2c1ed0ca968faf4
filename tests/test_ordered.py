"""Bucketed ordered operators: running_count, multiline v2, rejoin, throttle."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from raylog.stages.multiline import multiline_join, rejoin_partials
from raylog.stages.ordered import running_count


def _lines_table(n_sources=4, rows_per_source=200, hot_share=None, seed=5):
    """Interleaved per-source ordered rows with a continuation pattern."""
    rng = np.random.default_rng(seed)
    rows = []
    order = 0
    n_total = n_sources * rows_per_source
    src_of = rng.integers(0, n_sources, size=n_total)
    if hot_share:
        hot = rng.random(n_total) < hot_share
        src_of = np.where(hot, 0, src_of)
    for i in range(n_total):
        rows.append({
            "source": f"s{src_of[i]}",
            "order": order,
            "cont": bool(rng.random() < 0.35),
        })
        order += 1
    return pa.Table.from_pylist(rows)


def _expected_multiline(df: pd.DataFrame, headless: str = "emit"):
    out = {}
    for src, g in df.groupby("source"):
        g = g.sort_values("order")
        head = None
        for r in g.itertuples():
            if not r.cont:
                head = r.order
                out[(src, head)] = 0
            elif head is None and headless == "emit":
                # leading continuations flush as one headless record
                # rooted at the source's first row (reference behavior)
                head = r.order
                out[(src, head)] = 0
            if head is not None:
                out[(src, head)] += 1
    return out


@pytest.mark.parametrize("bucket_size", [32, 8192])
def test_running_count_matches_window(ray_session, bucket_size):
    tbl = _lines_table()
    ds = rd.from_arrow(tbl)
    got = running_count(ds, part_col="source", order_col="order",
                        mark_col="cont", inclusive=True, out_col="rc",
                        bucket_size=bucket_size).to_pandas()
    df = tbl.to_pandas().sort_values(["source", "order"])
    df["want"] = df.groupby("source")["cont"].cumsum()
    want = df.set_index("order")["want"]
    got = got.set_index("order")["rc"]
    assert got.sort_index().astype(int).equals(want.sort_index().astype(int))


@pytest.mark.parametrize("bucket_size", [32, 8192])
def test_multiline_bucketed_matches_reference_semantics(ray_session, bucket_size):
    tbl = _lines_table()
    ds = rd.from_arrow(tbl)
    out = multiline_join(ds, is_continuation="cont", order_col="order",
                         bucket_size=bucket_size).to_pandas()
    want = _expected_multiline(tbl.to_pandas())
    got = {(r.source, r.head_id): r.n_lines for r in out.itertuples()}
    assert got == want


@pytest.mark.parametrize("headless", ["emit", "drop"])
def test_multiline_headless_modes(ray_session, headless):
    """'emit' flushes a leading headless-continuation prefix as one
    record (reference buffer-until-firstline); 'drop' discards it."""
    tbl = pa.table({
        "source": pa.array(["s"] * 6),
        "order": pa.array(range(6), pa.int64()),
        "cont": pa.array([True, True, False, True, False, True]),
    })
    out = multiline_join(rd.from_arrow(tbl), is_continuation="cont",
                         order_col="order", headless=headless).to_pandas()
    got = {(r.source, r.head_id): r.n_lines for r in out.itertuples()}
    want = {("s", 2): 2, ("s", 4): 2}
    if headless == "emit":
        want[("s", 0)] = 2  # the two leading continuations, one record
    assert got == want


def test_multiline_hot_source_no_giant_group(ray_session):
    """90%-hot source: with bucketing no task group may exceed
    bucket_size rows (the round-1 hot-source single task is gone)."""
    tbl = _lines_table(n_sources=8, rows_per_source=400, hot_share=0.9)
    B = 64
    ds = rd.from_arrow(tbl)
    out = multiline_join(ds, is_continuation="cont", order_col="order",
                         bucket_size=B).to_pandas()
    want = _expected_multiline(tbl.to_pandas())
    got = {(r.source, r.head_id): r.n_lines for r in out.itertuples()}
    assert got == want
    # structural guarantee: order is globally unique, so any
    # (source, bucket) group holds at most B rows by construction
    df = tbl.to_pandas()
    df["bkt"] = df["order"] // B
    assert df.groupby(["source", "bkt"]).size().max() <= B


def test_rejoin_partials_pf():
    import ray

    lines = pa.Table.from_pylist([
        {"source": "a", "order": 0, "logtag": "P", "log": "hel"},
        {"source": "a", "order": 1, "logtag": "P", "log": "lo wo"},
        {"source": "a", "order": 2, "logtag": "F", "log": "rld"},
        {"source": "a", "order": 3, "logtag": "F", "log": "single"},
        {"source": "b", "order": 4, "logtag": "F", "log": "other"},
        # trailing unterminated P-run: still emitted (flush analog)
        {"source": "a", "order": 5, "logtag": "P", "log": "tail-"},
        {"source": "a", "order": 6, "logtag": "P", "log": "cut"},
    ])
    out = rejoin_partials(rd.from_arrow(lines), logtag_col="logtag",
                          order_col="order", content_col="log").to_pandas()
    got = {(r.source, r.head_id): (r.n_lines, r.content)
           for r in out.itertuples()}
    assert got == {
        ("a", 0): (3, "hello world"),
        ("a", 3): (1, "single"),
        ("a", 5): (2, "tail-cut"),
        ("b", 4): (1, "other"),
    }


def test_sliding_throttle_matches_pandas(ray_session):
    from raylog.stages.throttle import sliding_over_rate_flags

    rng = np.random.default_rng(3)
    n = 3000
    ts = pa.array(
        (rng.integers(0, 8 * 3600, size=n) * 1_000_000).astype("int64"),
        pa.timestamp("us"),
    )
    tbl = pa.table({"event_id": pa.array(np.arange(n, dtype=np.int64)), "ts": ts})
    rate, iv, sw = 100, 3600, 5
    out = sliding_over_rate_flags(
        rd.from_arrow(tbl), ts_col="ts", order_col="event_id",
        rate=rate, interval_sec=iv, subwindows=sw,
    ).to_pandas()

    df = tbl.to_pandas()
    df["w"] = (df["ts"].astype("int64") // 1_000_000) // iv
    cnt = df.groupby("w").size().to_dict()
    df = df.sort_values(["w", "event_id"])
    df["rnk"] = df.groupby("w").cumcount() + 1
    df["prior"] = df["w"].map(
        lambda w: sum(cnt.get(w - i, 0) for i in range(1, sw)))
    df["want"] = (df["prior"] + df["rnk"]) > rate
    merged = out.merge(df[["event_id", "want"]], on="event_id")
    assert (merged["over_rate"] == merged["want"]).all()
    assert merged["over_rate"].any() and not merged["over_rate"].all()


def test_retain_throttle_delays_never_drops():
    import time

    import pyarrow as pa
    import ray.data as rd

    from raylog.stages.throttle import RetainThrottle

    n = 3000
    ds = rd.from_arrow(pa.table({"i": pa.array(range(n))})).repartition(4)
    t0 = time.monotonic()
    out = ds.map_batches(
        RetainThrottle, fn_constructor_kwargs={"rate": 4000.0},
        concurrency=1, batch_format="pyarrow", batch_size=512,
    ).to_pandas()
    wall = time.monotonic() - t0
    assert sorted(out["i"]) == list(range(n))  # nothing dropped
    assert wall >= n / 4000.0  # paced to the configured rate


def test_retain_throttle_burst_cap():
    """An upstream stall must not bank unbounded credit: after a long
    idle gap at most ``burst`` rows pass un-paced, then pacing resumes
    at ``rate`` — the consumer never sees an unlimited-rate flood."""
    import time

    import pyarrow as pa

    from raylog.stages.throttle import RetainThrottle

    th = RetainThrottle(rate=10_000.0, burst=500.0)
    b = pa.table({"i": pa.array(range(500))})
    th(b)  # prime
    th._due = time.monotonic() - 10.0  # simulate a 10 s upstream stall
    t0 = time.monotonic()
    for _ in range(5):  # 2500 rows; only 500 (burst) ride the credit
        th(b)
    wall = time.monotonic() - t0
    assert wall >= 2000 / 10_000.0  # paced after the burst allowance
    assert wall < 1.0  # but the burst itself was honored
