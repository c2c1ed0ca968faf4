"""P5 — multiline (stack-trace) join, the ordering-sensitive operator.

The reference joins continuation lines (no leading timestamp — java stack
trace frames) onto the preceding first-line record, per source file, in
file order (`multiline.parser java`, conf/eci/fluent-bit.conf:41-45; the
ds pipeline documents the same filter disabled for upstream bugs,
conf/ds/fluent-bit.conf:36-42).

Batch re-expression: records are partitioned by ``source`` and ordered by
a monotonic per-source sequence (``order_col`` — the tail-offset analog);
every record joins to the greatest non-continuation record at or before
it. Implemented as ``groupby(source).map_groups`` with a vectorized
forward-fill per group; leading continuations with no head are dropped
(the reference buffers them until a first-line arrives; at batch
boundaries it flushes them standalone — we drop, documented divergence).

Partitioning assumption: one group = one source's records; ordering is
total within the group. At 10^12 rows with a hot source, the group for
that source is processed by a single task — if that is a bottleneck,
pre-split by (source, order-range) with boundary stitching.
"""

from __future__ import annotations

import pandas as pd
import ray.data as rd


def multiline_join(
    ds: rd.Dataset,
    *,
    is_continuation: str,
    order_col: str,
    content_col: str | None = None,
) -> rd.Dataset:
    """Collapse continuation rows onto their head row per source.

    Returns one row per logical record: (head_id = head row's order_col,
    source, n_lines, joined content if content_col given).
    """

    def per_source(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_col)
        head = g[order_col].where(~g[is_continuation]).ffill()
        g = g.assign(head_id=head)
        g = g[g["head_id"].notna()]
        if len(g) == 0:
            return pd.DataFrame(
                {"head_id": pd.Series(dtype="int64"),
                 "source": pd.Series(dtype="object"),
                 "n_lines": pd.Series(dtype="int64"),
                 **({"content": pd.Series(dtype="object")} if content_col else {})}
            )
        aggs = {"n_lines": ("head_id", "size")}
        if content_col:
            aggs["content"] = (content_col, lambda s: "\n".join(s))
        out = (
            g.groupby("head_id", as_index=False)
            .agg(**aggs)
        )
        out["head_id"] = out["head_id"].astype("int64")
        out.insert(1, "source", g["source"].iloc[0])
        return out

    return ds.groupby("source").map_groups(per_source, batch_format="pandas")
