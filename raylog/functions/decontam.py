"""N-gram decontamination: which eval documents leak into the train set?

The standard pre-training hygiene check (reference semantics: the
composite ``pretrain_prep`` query's decontaminate step, here as a
standalone auditable report): an eval document is CONTAMINATED if any
of its token n-grams also occurs in a training document. The report
counts, per contaminated eval doc, how many distinct train docs share
at least one n-gram — the signal that drives the drop/keep decision.

Scale shape (mirrors the winnow/ngram dedup family in ``dedup.py``):

- gram extraction is map-only over the flat token buffer (one rolling
  base-128 pack per block, difference-array row-boundary mask — no
  per-row Python);
- the only exchange is hash-partitioned per-doc-distinct postings
  (gram, doc_id, is_eval) — bounded by total gram slots, never by
  pairs;
- the eval×train pair enumeration runs inside complete-gram partitions
  (``partitioned_group_apply``) as a grouped bipartite cartesian
  product in pure numpy index arithmetic, and its output is bounded by
  true contamination volume, then deduplicated to distinct
  (eval_doc, train_doc) edges by a second hash aggregate.

Grams are compared by VALUE (tokens mod 128 packed 8-per-int64), not
by a lossy hash, so the DuckDB oracle can restate the key exactly:
contamination counts are exact, never probabilistic.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from raylog.functions import agg
from raylog.functions.tokens import _flat_values

_BASE = np.int64(128)


def gram_postings_batch(
    batch: pa.Table, *, n: int = 8, list_col: str = "tokens",
    id_col: str = "doc_id", eval_col: str = "is_eval",
) -> pa.Table:
    """One batch → per-doc-DISTINCT (gram, doc_id, is_eval) postings.

    gram = Σ_{k<n} (tok[i+k] mod 128) · 128^k — n ≤ 9 keeps the packed
    key inside int64 (n·7 bits ≤ 63). The mod is part of the DEFINITION
    (restated identically in SQL), so parity is exact even for token
    ids ≥ 128. Windows never cross a row (sequence) boundary.
    """
    if n < 1 or n > 9:
        raise ValueError("n must be in 1..9 (int64 pack)")
    empty = pa.table({
        "gram": pa.array([], pa.int64()),
        "doc_id": pa.array([], pa.int64()),
        "is_eval": pa.array([], pa.bool_()),
    })
    vals, lengths = _flat_values(batch, list_col)
    if len(vals) < n:
        return empty
    m = (np.asarray(vals, dtype=np.int64) % _BASE + _BASE) % _BASE
    w = len(vals) - (n - 1)  # window starts in the flat buffer
    key = m[:w].copy()
    mult = np.int64(1)
    for k in range(1, n):
        mult *= _BASE
        key += m[k:w + k] * mult
    # a window starting at flat i spans [i, i+n-1]; invalid iff some row
    # end e satisfies i < e ≤ i+n-1  →  i ∈ [e-(n-1), e-1]
    bad = np.zeros(w + 1, dtype=np.int64)
    ends = np.cumsum(lengths)[:-1]
    ends = ends[(ends > 0) & (ends < len(vals))]
    lo = np.maximum(ends - (n - 1), 0)
    hi = np.minimum(ends, w)
    ok = lo < hi
    np.add.at(bad, lo[ok], 1)
    np.add.at(bad, hi[ok], -1)
    valid = np.cumsum(bad[:w]) == 0
    doc_of_window = np.repeat(
        np.arange(len(lengths), dtype=np.int64),
        np.maximum(lengths - (n - 1), 0).astype(np.int64),
    )  # row index per IN-ROW window, aligned with `valid[window starts]`
    # flat window starts that stay inside one row, in order, are exactly
    # the in-row windows — select them:
    key = key[valid]
    if not len(key):
        return empty
    ids = np.asarray(batch[id_col].combine_chunks()
                     if isinstance(batch[id_col], pa.ChunkedArray)
                     else batch[id_col], dtype=np.int64)
    ev = np.asarray(batch[eval_col].combine_chunks()
                    if isinstance(batch[eval_col], pa.ChunkedArray)
                    else batch[eval_col])
    docs = ids[doc_of_window]
    evs = ev[doc_of_window]
    # per-doc distinct grams: sort by (doc, gram), keep segment heads
    order = np.lexsort((key, docs))
    dk, kk = docs[order], key[order]
    head = np.ones(len(dk), dtype=bool)
    head[1:] = (dk[1:] != dk[:-1]) | (kk[1:] != kk[:-1])
    return pa.table({
        "gram": pa.array(kk[head]),
        "doc_id": pa.array(dk[head]),
        "is_eval": pa.array(evs[order][head]),
    })


def _bipartite_pairs(part: pa.Table) -> pa.Table:
    """Complete-gram partition → (eval_doc, train_doc) one row per
    sharing occurrence (deduplicated downstream). Grouped bipartite
    cartesian product in pure index arithmetic: for a gram with
    n_e eval and n_t train postings the k-th pair is
    (eval[k // n_t], train[k mod n_t]) — no per-gram Python."""
    empty = pa.table({
        "eval_doc": pa.array([], pa.int64()),
        "train_doc": pa.array([], pa.int64()),
    })
    if part.num_rows == 0:
        return empty
    gram = np.asarray(part["gram"])
    doc = np.asarray(part["doc_id"])
    ev = np.asarray(part["is_eval"])
    # sort by (gram, is_eval): per gram, train block first, then eval
    order = np.lexsort((ev, gram))
    gram, doc, ev = gram[order], doc[order], ev[order]
    seg = np.flatnonzero(np.r_[True, gram[1:] != gram[:-1]])
    seg_end = np.r_[seg[1:], len(gram)]
    first_eval = seg + np.add.reduceat(~ev, seg)  # index of first eval row
    n_t = (first_eval - seg).astype(np.int64)
    n_e = (seg_end - first_eval).astype(np.int64)
    npairs = n_e * n_t
    keep = npairs > 0
    if not keep.any():
        return empty
    seg, first_eval, n_t, npairs = (seg[keep], first_eval[keep],
                                    n_t[keep], npairs[keep])
    off = np.concatenate(([0], np.cumsum(npairs)))
    total = int(off[-1])
    gid = np.repeat(np.arange(len(seg), dtype=np.int64), npairs)
    k = np.arange(total, dtype=np.int64) - off[gid]
    eidx = first_eval[gid] + k // n_t[gid]
    tidx = seg[gid] + k % n_t[gid]
    e, t = doc[eidx], doc[tidx]
    # dedup (eval, train) edges before they leave the partition: hot
    # grams re-derive the same edge many times over, and the exchange
    # should carry the distinct-edge set (the true output bound), not
    # the enumeration volume
    order = np.lexsort((t, e))
    e, t = e[order], t[order]
    head = np.ones(len(e), dtype=bool)
    head[1:] = (e[1:] != e[:-1]) | (t[1:] != t[:-1])
    return pa.table({
        "eval_doc": pa.array(e[head]),
        "train_doc": pa.array(t[head]),
    })


def decontam_ngram_report(
    ds: rd.Dataset, *, n: int = 8, list_col: str = "tokens",
    id_col: str = "doc_id", eval_col: str = "is_eval",
    num_partitions: int = 32,
) -> rd.Dataset:
    """Per contaminated eval doc: the number of DISTINCT train docs
    sharing at least one token n-gram. ``ds`` carries
    (id_col, eval_col, list_col); eval docs with zero overlap do not
    appear (inner-join semantics, matching the SQL oracle)."""
    post = ds.map_batches(
        lambda b: gram_postings_batch(b, n=n, list_col=list_col,
                                      id_col=id_col, eval_col=eval_col),
        batch_format="pyarrow", batch_size=None,
    )
    pairs = agg.partitioned_group_apply(
        post, ["gram"], _bipartite_pairs, num_partitions=num_partitions,
    )
    distinct = agg.grouped_aggregate_ds(
        pairs, ["eval_doc", "train_doc"], [("eval_doc", "count", "_c")],
        num_partitions=num_partitions,
    )
    return agg.grouped_aggregate_ds(
        distinct.map_batches(
            lambda b: b.select(["eval_doc"]).rename_columns(["doc_id"]),
            batch_format="pyarrow", batch_size=None),
        ["doc_id"], [("doc_id", "count", "n_contaminating")],
        num_partitions=num_partitions,
    )
