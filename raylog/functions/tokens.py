"""Token-level corpus statistics over the ``tokens`` list<int32> payload.

The engine's row payload is a pre-tokenized sequence (input_hint:
``tokens: array<int32>``), so vocabulary statistics — unigram frequencies,
heavy hitters, bigram (next-token) counts — are the natural "wide"
analytics a training-data pipeline runs over it (vocab pruning, LM
smoothing tables, tokenizer QA).

Scale shape: the naive plan (``flat_map`` each token to a row, then
``groupby(token).count()``) explodes 100 TB of sequences into one row per
token before the shuffle. Instead each batch is collapsed to a partial
count table with ``np.unique`` (bounded by the batch's distinct tokens ≤
vocab size, typically 10^4-10^5 — orders of magnitude smaller than the
token count), and the partials flow through the hash-partitioned
distributed combine (`agg.grouped_aggregate_ds`) so no vocab-sized table
ever lands on the driver. Top-k then moves only k×blocks rows
(`topk.topk`). The only all-to-all is over key-compressed partials.

Bigrams use the same partial-count shape with the pair packed into one
uint64 key (hi=left token, lo=right token as uint32 bit patterns, so
negative int32 tokens round-trip); list boundaries are masked out
vectorized, never crossed.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from raylog.functions import agg, topk as tk


def _flat_values(batch: pa.Table, list_col: str) -> tuple[np.ndarray, np.ndarray]:
    """(flat token values, per-row list lengths) for a list column batch."""
    col = batch[list_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    vals = np.asarray(col.flatten())
    lengths = np.asarray(pc.list_value_length(col), dtype=np.int64)
    return vals, lengths


def token_count_partial(batch: pa.Table, list_col: str = "tokens") -> pa.Table:
    """One batch → (token, cnt) partial counts via a single np.unique."""
    vals, _ = _flat_values(batch, list_col)
    toks, cnts = np.unique(vals, return_counts=True)
    return pa.table(
        {
            "token": pa.array(toks.astype(np.int64)),
            "cnt": pa.array(cnts.astype(np.int64)),
        }
    )


def bigram_count_partial(batch: pa.Table, list_col: str = "tokens") -> pa.Table:
    """One batch → (t1, t2, cnt) partials for consecutive token pairs.

    Pairs never cross a row (sequence) boundary: positions where the next
    element starts a new list are masked out, vectorized.
    """
    vals, lengths = _flat_values(batch, list_col)
    if len(vals) < 2:
        return pa.table(
            {
                "t1": pa.array([], pa.int64()),
                "t2": pa.array([], pa.int64()),
                "cnt": pa.array([], pa.int64()),
            }
        )
    u = vals.astype(np.int32).view(np.uint32).astype(np.uint64)
    key = (u[:-1] << np.uint64(32)) | u[1:]
    mask = np.ones(len(vals) - 1, dtype=bool)
    ends = np.cumsum(lengths)[:-1]  # exclusive end index of each row's list
    ends = ends[(ends > 0) & (ends < len(vals))]
    mask[ends - 1] = False  # bigram (end-1, end) would cross rows
    uk, cnts = np.unique(key[mask], return_counts=True)
    t1 = (uk >> np.uint64(32)).astype(np.uint32).view(np.int32).astype(np.int64)
    t2 = (uk & np.uint64(0xFFFFFFFF)).astype(np.uint32).view(np.int32).astype(np.int64)
    return pa.table(
        {
            "t1": pa.array(t1),
            "t2": pa.array(t2),
            "cnt": pa.array(cnts.astype(np.int64)),
        }
    )


def token_frequencies(
    ds: rd.Dataset, *, list_col: str = "tokens", num_partitions: int = 32
) -> rd.Dataset:
    """Full (token, cnt) table as a Dataset — vocab-cardinality safe."""
    partials = ds.map_batches(
        lambda b: token_count_partial(b, list_col),
        batch_format="pyarrow",
        batch_size=None,
    )
    return agg.grouped_aggregate_ds(
        partials, ["token"], [("cnt", "sum", "cnt")], num_partitions=num_partitions
    )


def token_top_terms(
    ds: rd.Dataset, *, k: int = 50, list_col: str = "tokens",
    num_partitions: int = 32,
) -> pa.Table:
    """Top-k most frequent tokens (cnt desc, token asc tie-break) with rank."""
    freqs = token_frequencies(ds, list_col=list_col, num_partitions=num_partitions)
    return tk.topk(
        freqs, sort_cols=["cnt", "token"], descending=[True, False], k=k,
        add_rank="rank",
    )


def bigram_top_terms(
    ds: rd.Dataset, *, k: int = 50, list_col: str = "tokens",
    num_partitions: int = 32,
) -> pa.Table:
    """Top-k most frequent consecutive token pairs with rank."""
    partials = ds.map_batches(
        lambda b: bigram_count_partial(b, list_col),
        batch_format="pyarrow",
        batch_size=None,
    )
    freqs = agg.grouped_aggregate_ds(
        partials, ["t1", "t2"], [("cnt", "sum", "cnt")],
        num_partitions=num_partitions,
    )
    return tk.topk(
        freqs, sort_cols=["cnt", "t1", "t2"], descending=[True, False, False],
        k=k, add_rank="rank",
    )
