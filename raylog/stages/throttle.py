"""R1 — throttle, re-expressed for a batch engine.

The reference's patched throttle (filter_throttle_patch/throttle.c) is a
processing-time sliding-window rate limiter whose repo-specific `Retain`
mode converts drops into backpressure (10 ms delay per over-rate record,
throttle.c:274-281). In Ray Data, backpressure is native to the streaming
executor, so the *retain* semantics needs no operator at all; what remains
meaningful in batch is the *accounting*: which records would have exceeded
`Rate` per window. Two forms:

- :func:`over_rate_flags` — per-record event-time analog: within each
  (window = floor(ts / interval)) the records beyond ``rate`` (in a
  deterministic order) are flagged. Ordered-within-window semantics →
  ``groupby(window).map_groups`` over window-partitioned input.
- window aggregate (kept / dropped counts per window) — derived with the
  generic partial+tree aggregate.
"""

from __future__ import annotations

import pandas as pd
import ray.data as rd


def add_window_column(ds: rd.Dataset, ts_col: str, interval_sec: int) -> rd.Dataset:
    """Append int64 ``window`` = floor(epoch_seconds / interval)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def _w(batch: pa.Table) -> pa.Table:
        ts = batch[ts_col]
        us = pc.cast(ts.combine_chunks() if isinstance(ts, pa.ChunkedArray) else ts,
                     pa.int64())
        window = pc.divide(us, pa.scalar(interval_sec * 1_000_000, pa.int64()))
        return batch.append_column("window", window)

    return ds.map_batches(_w, batch_format="pyarrow", batch_size=None)


def over_rate_flags(
    ds: rd.Dataset,
    *,
    ts_col: str,
    order_col: str,
    rate: int,
    interval_sec: int,
) -> rd.Dataset:
    """Flag records beyond ``rate`` within each interval window.

    Order within a window is by ``order_col`` (the deterministic analog of
    arrival order). The groupby partitions by window — a bounded-size
    group (one interval's records), so a skewed-hot window degrades to one
    large group, never a driver-side loop.
    """
    ds = add_window_column(ds, ts_col, interval_sec)

    def per_window(g: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        g = g.sort_values(order_col)
        g["over_rate"] = np.arange(len(g)) >= rate
        return g

    return ds.groupby("window").map_groups(per_window, batch_format="pandas")
