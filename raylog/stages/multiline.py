"""P5 — multiline (stack-trace) join + CRI partial-line rejoin.

The reference joins multi-line records two ways:

- firstline multiline (`Parser_Firstline cri_firstline`,
  conf/ds/cri-runtime.conf:17-21 + conf/ds/parsers.conf cri_firstline):
  a record STARTS at a line whose content begins with a date; following
  non-matching lines (java stack frames) are continuations, joined with
  newlines. The ds pipeline documents the same multiline filter
  (conf/ds/fluent-bit.conf:36-42).
- CRI partial-line rejoin (`__pri__logtag` in the cri parser,
  conf/ds/parsers.conf): the container runtime splits long lines into
  parts tagged ``P`` (partial) terminated by one tagged ``F`` (full);
  parts concatenate back (no separator) into the original line.

Both are the same distributed primitive with different record-boundary
marks: head-marked (firstline) or tail-marked (the ``F`` flag). Execution
(round-2 rework, replacing the round-1 ``groupby(source).map_groups``
whose hot source became one task sorting 30% of the dataset):

1. :func:`raylog.stages.ordered.running_count` assigns every row its
   global record id inside its source — bucketed by the order column, so
   no task ever sorts more than ``bucket_size`` rows whatever the source
   skew;
2. rows re-group by (source, record_id // records_per_group): a record's
   rows land in exactly one bounded group; whole partitions of complete
   records assemble in one vectorized pass (lexsort + segment scan +
   Arrow ``binary_join`` for the content).

Partitioning assumptions (documented for the 100 TB case): ``order_col``
is unique per source (tail offset); one logical record is small (a stack
trace / one split line — the reference bounds it by Buffer_Max_Size 10MB,
conf/ds/docker-runtime.conf:9), so groups of ``records_per_group``
records stay bounded. Leading continuations with no head flush as one
headless record per source by default (``headless="emit"`` — the
reference buffers them until a first-line or the flush timeout arrives;
round-2's drop behavior remains available as ``headless="drop"``). A
trailing unterminated ``P``-run IS emitted (the reference's
Multiline_Flush timeout flush).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from raylog.stages.ordered import running_count


def _assemble_records(
    ids: rd.Dataset,
    *,
    source_col: str,
    order_col: str,
    content_col: str | None,
    sep: str,
    drop_zero: bool,
    records_per_group: int,
) -> rd.Dataset:
    """Group rows of one record together and emit the joined record."""

    def add_rbkt(b: pa.Table) -> pa.Table:
        r = b["record_id"]
        r = r.combine_chunks() if isinstance(r, pa.ChunkedArray) else r
        rb = pc.divide(pc.cast(r, pa.int64()),
                       pa.scalar(records_per_group, pa.int64()))
        return b.append_column("__rbkt", rb)

    def assemble(part: pa.Table) -> pa.Table:
        # whole partition of complete records, one vectorized pass:
        # lexsort by (source, record_id, order); record boundaries give
        # head/size directly and the content join is a single Arrow
        # ``binary_join`` over a record-offset list array (no per-record
        # Python/pandas calls)
        def col(name):
            c = part[name]
            return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c

        src = np.asarray(col(source_col), dtype=object)
        rid = np.asarray(col("record_id"), dtype=np.int64)
        order = np.asarray(col(order_col), dtype=np.int64)
        sort = np.lexsort((order, rid, src))
        if drop_zero:
            sort = sort[rid[sort] > 0]
        src, rid, order = src[sort], rid[sort], order[sort]
        n = len(rid)
        empty_cols = {"head_id": pa.array([], pa.int64()),
                      "source": pa.array([], pa.string()),
                      "n_lines": pa.array([], pa.int64())}
        if content_col:
            empty_cols["content"] = pa.array([], pa.string())
        if n == 0:
            return pa.table(empty_cols)
        starts = np.concatenate([[0], np.flatnonzero(
            (src[1:] != src[:-1]) | (rid[1:] != rid[:-1])) + 1])
        sizes = np.diff(np.concatenate([starts, [n]]))
        cols = {
            "head_id": pa.array(order[starts]),
            "source": pa.array(src[starts], pa.string()),
            "n_lines": pa.array(sizes.astype(np.int64)),
        }
        if content_col:
            content = pc.take(col(content_col), pa.array(sort))
            lists = pa.ListArray.from_arrays(
                pa.array(np.concatenate([starts, [n]]).astype(np.int32),
                         pa.int32()),
                content,
            )
            cols["content"] = pc.binary_join(lists, sep)
        return pa.table(cols)

    from raylog.functions.agg import partitioned_group_apply

    return partitioned_group_apply(
        ids.map_batches(add_rbkt, batch_format="pyarrow", batch_size=None),
        [source_col, "__rbkt"], assemble,
    )


def multiline_join(
    ds: rd.Dataset,
    *,
    is_continuation: str,
    order_col: str,
    content_col: str | None = None,
    source_col: str = "source",
    sep: str = "\n",
    bucket_size: int = 65_536,
    records_per_group: int = 4096,
    headless: str = "emit",
) -> rd.Dataset:
    """Collapse continuation rows onto their head row per source
    (firstline / head-marked multiline).

    Returns one row per logical record: (head_id = head row's order_col,
    source, n_lines, joined content if content_col given).

    ``headless`` controls continuations arriving BEFORE any head in a
    source: ``"emit"`` (default) joins them into one headless record
    whose head_id is the first row's order — the reference engine
    buffers such lines and flushes them as one record when the first
    firstline (or the flush timeout) arrives; ``"drop"`` discards them
    (round-2 behavior, kept for callers that want strict head-rooted
    records only).
    """
    if headless not in ("emit", "drop"):
        raise ValueError(f"headless must be 'emit' or 'drop', got {headless!r}")

    def mark(b: pa.Table) -> pa.Table:
        cont = b[is_continuation]
        cont = cont.combine_chunks() if isinstance(cont, pa.ChunkedArray) else cont
        return b.append_column("__mark", pc.invert(pc.cast(cont, pa.bool_())))

    ids = running_count(
        ds.map_batches(mark, batch_format="pyarrow", batch_size=None),
        part_col=source_col, order_col=order_col, mark_col="__mark",
        inclusive=True, out_col="record_id", bucket_size=bucket_size,
    )
    return _assemble_records(
        ids, source_col=source_col, order_col=order_col,
        content_col=content_col, sep=sep, drop_zero=(headless == "drop"),
        records_per_group=records_per_group,
    )


def rejoin_partials(
    ds: rd.Dataset,
    *,
    logtag_col: str,
    order_col: str,
    content_col: str | None = None,
    source_col: str = "source",
    bucket_size: int = 65_536,
    records_per_group: int = 4096,
) -> rd.Dataset:
    """CRI partial-line rejoin: ``P``-tagged parts concatenate (no
    separator) up to and including their terminating ``F`` line
    (tail-marked records; reference cri parser's ``__pri__logtag``).

    A trailing ``P``-run with no ``F`` is emitted as its own record (the
    flush-timeout behavior)."""

    def mark(b: pa.Table) -> pa.Table:
        tag = b[logtag_col]
        tag = tag.combine_chunks() if isinstance(tag, pa.ChunkedArray) else tag
        return b.append_column(
            "__mark", pc.equal(pc.fill_null(tag, "F"), "F")
        )

    ids = running_count(
        ds.map_batches(mark, batch_format="pyarrow", batch_size=None),
        part_col=source_col, order_col=order_col, mark_col="__mark",
        inclusive=False, out_col="record_id", bucket_size=bucket_size,
    )
    return _assemble_records(
        ids, source_col=source_col, order_col=order_col,
        content_col=content_col, sep="", drop_zero=False,
        records_per_group=records_per_group,
    )
