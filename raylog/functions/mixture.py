"""Token-budget data mixing: sample each source to its mixture weight.

A training run specifies a mixture — per-source weights over a token
budget (e.g. 60% web, 30% code, 10% reference). The selection must be
deterministic (re-runs pick the same docs), exact-ish in tokens (not
doc counts — docs vary 100× in length) and, at 100 TB, must not
globally sort anything.

The primitive here is DISTRIBUTED THRESHOLD SELECTION: give every doc
a deterministic coin, and find, per source, the coin cutoff whose
below-cutoff docs carry the source's token target. Scale shape:

1. map: coin = multiplicative hash of doc_id; bucket = coin's top
   ``log2(n_buckets)`` bits;
2. one TINY aggregate: (source, bucket) → token sum (≤ sources ×
   n_buckets rows — mixture metadata, not data);
3. driver: per-source prefix scan over its bucket histogram picks the
   cutoff bucket b* and the residual token budget inside it —
   O(sources × n_buckets) work, independent of corpus size;
4. map (broadcast verdicts): docs in buckets < b* keep, > b* drop;
   docs IN b* — ~1/n_buckets of each source — resolve exactly per
   source with one lexsort+cumsum over only that sliver.

The boundary sliver is the only part that ever needs ordering, and it
is 1/n_buckets of a source; raise ``n_buckets`` to shrink it (the
histogram row count stays tiny).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

# 32-bit multiplicative coin for INTEGER ids, chosen to be exactly
# expressible in ANSI SQL BIGINT arithmetic so a DuckDB oracle can
# replicate the selection: coin = (doc_id * 2654435761) % 2^32.
# String ids (the sequences table) use polars' seeded xxhash instead —
# same determinism, no SQL form.
_COIN_MULT = np.int64(2654435761)
_COIN_MOD = np.int64(1 << 32)


def _coins_col(col) -> np.ndarray:
    """Deterministic 32-bit coin per row of an id column."""
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_integer(col.type):
        # uint64 wraparound matches SQL BIGINT %-semantics for all
        # nonnegative ids; an int64 multiply wraps NEGATIVE past
        # doc_id ~3.5e9, silently diverging from the DuckDB oracle
        ids = np.asarray(col, dtype=np.int64).astype(np.uint64)
        return ((ids * np.uint64(_COIN_MULT))
                & np.uint64(_COIN_MOD - 1)).astype(np.int64)
    import polars as pl

    h = pl.from_arrow(pa.table({"k": col}))["k"].hash(seed=17).to_numpy()
    return (h % np.uint64(_COIN_MOD)).astype(np.int64)


def mixture_by_token_budget(
    ds: rd.Dataset,
    *,
    targets: dict[str, int],
    id_col: str = "doc_id",
    len_col: str = "n_tok",
    source_col: str = "source",
    n_buckets: int = 1024,
) -> rd.Dataset:
    """Deterministic per-source token-budget sample.

    ``targets`` maps source → token target. A doc is kept iff the
    cumulative ``len_col`` of its source's docs ordered by
    (coin, doc_id) BEFORE it is < the source's target (so the doc
    crossing the boundary is included and every source overshoots by
    < 1 doc). Sources absent from ``targets`` are dropped.
    Output: the kept (doc_id, source, n_tok) rows.
    """
    import ray

    bucket_shift = _COIN_MOD // n_buckets

    def with_bucket(b: pa.Table) -> pa.Table:
        coin = _coins_col(b[id_col])
        return pa.table({
            "source": b[source_col],
            "bucket": pa.array(coin // bucket_shift),
            len_col: b[len_col],
        })

    from raylog.functions.agg import grouped_aggregate

    hist = grouped_aggregate(
        ds.map_batches(with_bucket, batch_format="pyarrow", batch_size=None),
        ["source", "bucket"], [(len_col, "sum", "tok")],
    ).to_pandas()

    # driver: per-source cutoff bucket + residual budget inside it
    cut_bucket: dict[str, int] = {}
    residual: dict[str, int] = {}
    for src, g in hist.groupby("source"):
        target = targets.get(src)
        if target is None:
            continue
        g = g.sort_values("bucket")
        cum = g["tok"].cumsum()
        over = cum >= target
        if over.any():
            i = int(np.argmax(over.to_numpy()))
            cut_bucket[src] = int(g["bucket"].iloc[i])
            prior = int(cum.iloc[i - 1]) if i > 0 else 0
            residual[src] = target - prior
        else:  # source smaller than its target: keep everything
            cut_bucket[src] = n_buckets
            residual[src] = 0
    verdicts = (cut_bucket, residual)
    verd_ref = ray.put(verdicts) if ray.is_initialized() else verdicts

    def classify(b: pa.Table) -> pa.Table:
        cb, _res = (verd_ref if isinstance(verd_ref, tuple)
                    else ray.get(verd_ref))
        bucket = _coins_col(b[id_col]) // bucket_shift
        # per-DICTIONARY cut lookup + code gather: the per-row dict.get
        # over 8M Python strings cost ~1-2 s per scan
        sd = b[source_col].combine_chunks().dictionary_encode()
        dict_cuts = np.array(
            [cb.get(s, -1) for s in sd.dictionary.to_pylist()],
            dtype=np.int64)
        cuts = dict_cuts[np.asarray(sd.indices, dtype=np.int64)]
        sub = b.select([id_col, source_col, len_col])
        out = sub.filter(pa.array(bucket < cuts))
        edge = sub.filter(pa.array(bucket == cuts))
        return pa.concat_tables([
            out.append_column(
                "__edge", pa.array(np.zeros(out.num_rows, dtype=bool))),
            edge.append_column(
                "__edge", pa.array(np.ones(edge.num_rows, dtype=bool))),
        ])

    # two consumers (kept-main + edge-resolve) branch from here; the
    # classified set is BUDGET-sized (kept docs + the 1/n_buckets
    # boundary sliver), not corpus-sized, so materializing it is the
    # cheap way to avoid re-running the corpus scan per branch
    classified = ds.map_batches(classify, batch_format="pyarrow",
                                batch_size=None).materialize()

    def resolve(part: pa.Table) -> pa.Table:
        """One partition of boundary-bucket rows: exact per-source
        lexsort+cumsum cut over ~1/n_buckets of each source."""
        _cb, res = (verd_ref if isinstance(verd_ref, tuple)
                    else ray.get(verd_ref))
        idc = part[id_col].combine_chunks() if isinstance(
            part[id_col], pa.ChunkedArray) else part[id_col]
        ids = (np.asarray(idc, dtype=np.int64)
               if pa.types.is_integer(idc.type)
               else np.asarray(idc.to_pylist(), dtype=object))
        srcs = np.asarray(part[source_col].combine_chunks().to_pylist(),
                          dtype=object)
        toks = np.asarray(part[len_col].combine_chunks(), dtype=np.int64)
        coin = _coins_col(idc)
        if len(ids) == 0:
            return part.select([id_col, source_col, len_col])
        order = np.lexsort((ids, coin, srcs))
        s_s, t_s = srcs[order], toks[order]
        new_src = np.empty(len(s_s), dtype=bool)
        new_src[0] = True
        new_src[1:] = s_s[1:] != s_s[:-1]
        starts = np.flatnonzero(new_src)
        seg_len = np.diff(np.append(starts, len(s_s)))
        csum = np.cumsum(t_s)
        base = np.repeat((csum - t_s)[starts], seg_len)
        prior = csum - t_s - base
        budget = np.array([res.get(s, 0) for s in s_s], dtype=np.int64)
        kept = order[prior < budget]
        return part.take(pa.array(np.sort(kept))).select(
            [id_col, source_col, len_col])

    import pyarrow.compute as pc

    from raylog.functions.agg import partitioned_group_apply

    kept_main = classified.map_batches(
        lambda b: b.filter(pc.invert(b["__edge"].combine_chunks()))
        .drop_columns(["__edge"]),
        batch_format="pyarrow", batch_size=None,
    )
    edges = classified.map_batches(
        lambda b: b.filter(b["__edge"].combine_chunks())
        .drop_columns(["__edge"]),
        batch_format="pyarrow", batch_size=None,
    )
    kept_edge = partitioned_group_apply(
        edges, [source_col], resolve, num_partitions=8,
    )
    return kept_main.union(kept_edge)
