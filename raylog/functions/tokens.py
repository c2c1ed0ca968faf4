"""Token-level corpus statistics over the ``tokens`` list<int32> payload.

The engine's row payload is a pre-tokenized sequence (input_hint:
``tokens: array<int32>``), so vocabulary statistics — unigram frequencies,
heavy hitters, bigram (next-token) counts — are the natural "wide"
analytics a training-data pipeline runs over it (vocab pruning, LM
smoothing tables, tokenizer QA).

Scale shape: the naive plan (``flat_map`` each token to a row, then
``groupby(token).count()``) explodes 100 TB of sequences into one row per
token before the shuffle. Instead each batch is collapsed to a partial
count table with Arrow's ``value_counts`` (bounded by the batch's distinct tokens ≤
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
    """One batch → (token, cnt) partial counts, fully vectorized.

    Uses Arrow's C++ ``value_counts`` hash kernel directly on the flat
    list buffer — zero big numpy temporaries. This matters more than
    algorithmic constants on this class of host: a fresh ~100 MB numpy
    ``astype`` temp costs seconds in first-touch page faults inside a
    microVM worker (measured 40× slower than the Arrow kernel on a
    cold 12M-token block), while value_counts allocates only the
    vocab-sized output.
    """
    col = batch[list_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten()
    if len(flat) == 0:
        return pa.table({"token": pa.array([], pa.int64()),
                         "cnt": pa.array([], pa.int64())})
    vc = pc.value_counts(flat)
    return pa.table(
        {
            "token": pc.cast(vc.field("values"), pa.int64()),
            "cnt": vc.field("counts"),
        }
    )


def _masked_bigram_keys(vals: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """Packed uint64 keys (hi=left, lo=right token as uint32 bit
    patterns) for all consecutive pairs, with pairs that would cross a
    row (sequence) boundary masked out. Shared by the exact-count and
    sketch bigram paths — one kernel, one boundary rule.

    Temp-frugal on purpose: int32→uint32 is a zero-copy view, the key
    array is built with in-place shift/or (ONE large temp plus the
    masked gather) — fresh big allocations cost seconds in first-touch
    page faults on microVM hosts (see token_count_partial)."""
    u = (vals.view(np.uint32) if vals.dtype == np.int32
         else vals.astype(np.int32).view(np.uint32))
    key = u[:-1].astype(np.uint64)
    key <<= np.uint64(32)
    key |= u[1:]
    mask = np.ones(len(vals) - 1, dtype=bool)
    ends = np.cumsum(lengths)[:-1]  # exclusive end index of each row's list
    ends = ends[(ends > 0) & (ends < len(vals))]
    mask[ends - 1] = False  # bigram (end-1, end) would cross rows
    return key[mask]


def bigram_count_partial(batch: pa.Table, list_col: str = "tokens") -> pa.Table:
    """One batch → (t1, t2, cnt) exact partial counts for consecutive
    token pairs (row boundaries never crossed)."""
    vals, lengths = _flat_values(batch, list_col)
    if len(vals) < 2:
        return pa.table(
            {
                "t1": pa.array([], pa.int64()),
                "t2": pa.array([], pa.int64()),
                "cnt": pa.array([], pa.int64()),
            }
        )
    # near-unique key sets (vocab² pairs) sort faster than they hash:
    # np.unique beats pc.value_counts here, the inverse of the unigram
    # trade-off (measured both ways on the 8M-row fixture)
    uk, cnts = np.unique(_masked_bigram_keys(vals, lengths),
                         return_counts=True)
    t1 = (uk >> np.uint64(32)).astype(np.uint32).view(np.int32).astype(np.int64)
    t2 = (uk & np.uint64(0xFFFFFFFF)).astype(np.uint32).view(np.int32).astype(np.int64)
    return pa.table(
        {
            "t1": pa.array(t1),
            "t2": pa.array(t2),
            "cnt": pa.array(cnts.astype(np.int64)),
        }
    )


# Partial-count output is batch-distinct-bounded: every block emits up
# to ~vocab rows regardless of block size, so the exchange volume is
# vocab × num_blocks. The coalescing knob is BLOCK SIZE AT THE READ
# (``read_sequences(row_groups_per_task=...)``), NOT a downstream
# map_batches(batch_size=...): the batched stage would fuse with the
# item-driven reader and bundle the one-row (path, row_group) items,
# collapsing the entire read into a single task (measured 20× slower).
# All stages here therefore run per-block (batch_size=None).


def _merge_counts(b: pa.Table) -> pa.Table:
    g = b.group_by(["token"]).aggregate([("cnt", "sum")])
    return g.rename_columns(["token", "cnt"])


def token_frequencies(
    ds: rd.Dataset, *, list_col: str = "tokens", combine_blocks: int = 8
) -> pa.Table:
    """Exact (token, cnt) table. Tokenizer vocabularies are bounded by
    construction (10^4-10^6 ids), so the counts are MERGEABLE PARTIALS —
    the same shape as the HLL registers in `sketch.py`: per-block counts,
    a shuffle-free repartition-coalesce combine (vocab × combine_blocks
    rows), one driver group_by on the residue. No sort, no hash shuffle
    (Ray's sort-groupby cost 20s of pure overhead on 3.2M partial rows);
    at deeper scale stack another coalesce level — the tree is
    logarithmic. For UNBOUNDED key spaces use `grouped_aggregate_ds`
    (the bigram path below).
    """
    partials = ds.map_batches(
        lambda b: token_count_partial(b, list_col),
        batch_format="pyarrow",
        batch_size=None,
    )
    combined = partials.repartition(combine_blocks).map_batches(
        _merge_counts, batch_format="pyarrow", batch_size=None,
    )
    residue = pa.concat_tables(
        combined.iter_batches(batch_format="pyarrow", batch_size=None),
        promote_options="default",
    )
    return _merge_counts(residue)


def token_top_terms(
    ds: rd.Dataset, *, k: int = 50, list_col: str = "tokens",
    combine_blocks: int = 8,
) -> pa.Table:
    """Top-k most frequent tokens (cnt desc, token asc tie-break) with rank."""
    import pandas as pd

    freqs = token_frequencies(ds, list_col=list_col,
                              combine_blocks=combine_blocks)
    df = freqs.to_pandas().sort_values(
        ["cnt", "token"], ascending=[False, True], kind="mergesort"
    ).head(k).reset_index(drop=True)
    df["rank"] = range(1, len(df) + 1)
    return pa.Table.from_pandas(df, preserve_index=False)


def bigram_top_terms(
    ds: rd.Dataset, *, k: int = 50, list_col: str = "tokens",
    num_partitions: int = 32,
) -> pa.Table:
    """Top-k most frequent consecutive token pairs with rank.

    Pair cardinality is vocab², so partial-count compression can vanish
    on uniform token streams (every pair near-unique) — the shuffle then
    carries ~one row per input pair, which is the exact-count lower
    bound. Zipfian real corpora compress far better; for
    heavy-hitters-only at extreme scale, sketch first (count-min) and
    verify candidates exactly.
    """
    partials = ds.map_batches(
        lambda b: bigram_count_partial(b, list_col),
        batch_format="pyarrow",
        batch_size=None,
    )
    freqs = agg.grouped_aggregate_ds(
        partials, ["t1", "t2"], [("cnt", "sum", "cnt")],
        num_partitions=num_partitions, batch_size=None,
    )
    return tk.topk(
        freqs, sort_cols=["cnt", "t1", "t2"], descending=[True, False, False],
        k=k, add_rank="rank",
    )


def bigram_keys_batch(batch: pa.Table, list_col: str = "tokens") -> pa.Table:
    """One batch → raw packed bigram keys (no counting) — the sort-free
    feed for sketch-based heavy hitters (`sketch.cms_heavy_hitters`)."""
    vals, lengths = _flat_values(batch, list_col)
    if len(vals) < 2:
        return pa.table({"key": pa.array([], pa.int64())})
    return pa.table({
        "key": pa.array(_masked_bigram_keys(vals, lengths).view(np.int64))
    })


def _masked_pair_arrays(
    vals: np.ndarray, lengths: np.ndarray, d: int
) -> tuple[np.ndarray, np.ndarray]:
    """(left, right) uint32 token arrays for every distance-``d`` pair
    that does NOT cross a row (sequence) boundary. Generalizes the d=1
    bigram mask: a pair starting at flat index i spans [i, i+d], so it
    is invalid iff some row end e falls in (i, i+d] — marked with a
    difference array + cumsum (O(rows) regardless of d), not a per-end
    range write."""
    u = (vals.view(np.uint32) if vals.dtype == np.int32
         else vals.astype(np.int32).view(np.uint32))
    n = len(vals) - d
    bad = np.zeros(n + 1, dtype=np.int64)
    ends = np.cumsum(lengths)[:-1]
    ends = ends[(ends > 0) & (ends < len(vals))]
    lo = np.maximum(ends - d, 0)
    hi = np.minimum(ends, n)
    ok = lo < hi
    np.add.at(bad, lo[ok], 1)
    np.add.at(bad, hi[ok], -1)
    mask = np.cumsum(bad[:n]) == 0
    return u[:n][mask], u[d:][mask]


def skipgram_count_partial(
    batch: pa.Table, *, window: int = 2, list_col: str = "tokens"
) -> pa.Table:
    """One batch → (a, b, cnt) exact partial counts of windowed
    co-occurrence pairs: for every position i, the ordered
    (center=tokens[i], context=tokens[i±d]) pairs for d=1..window —
    the word2vec-style co-occurrence build. Row boundaries never
    crossed; both directions emitted (the matrix is symmetric in
    counts: cnt(a,b) == cnt(b,a))."""
    empty = pa.table({
        "a": pa.array([], pa.int64()),
        "b": pa.array([], pa.int64()),
        "cnt": pa.array([], pa.int64()),
    })
    vals, lengths = _flat_values(batch, list_col)
    keys: list[np.ndarray] = []
    for d in range(1, window + 1):
        if len(vals) <= d:
            break
        left, right = _masked_pair_arrays(vals, lengths, d)
        fwd = left.astype(np.uint64)
        fwd <<= np.uint64(32)
        fwd |= right
        rev = right.astype(np.uint64)
        rev <<= np.uint64(32)
        rev |= left
        keys.append(fwd)
        keys.append(rev)
    if not keys:
        return empty
    uk, cnts = np.unique(np.concatenate(keys), return_counts=True)
    a = (uk >> np.uint64(32)).astype(np.uint32).view(np.int32).astype(np.int64)
    b = (uk & np.uint64(0xFFFFFFFF)).astype(np.uint32).view(np.int32).astype(np.int64)
    return pa.table({
        "a": pa.array(a),
        "b": pa.array(b),
        "cnt": pa.array(cnts.astype(np.int64)),
    })


def skipgram_top_cooc(
    ds: rd.Dataset, *, k: int = 30, window: int = 2,
    list_col: str = "tokens", num_partitions: int = 32,
) -> pa.Table:
    """Top-k windowed co-occurrence pairs (cnt desc, a, b tie-break)
    with rank. Same exchange shape as the bigram path — per-block
    partial counts (batch-distinct-bounded), hash-partitioned combine,
    partial top-k — ×2·window the pair volume."""
    partials = ds.map_batches(
        lambda t: skipgram_count_partial(t, window=window, list_col=list_col),
        batch_format="pyarrow",
        batch_size=None,
    )
    freqs = agg.grouped_aggregate_ds(
        partials, ["a", "b"], [("cnt", "sum", "cnt")],
        num_partitions=num_partitions, batch_size=None,
    )
    return tk.topk(
        freqs, sort_cols=["cnt", "a", "b"], descending=[True, False, False],
        k=k, add_rank="rank",
    )


def zipf_slope(
    ds: rd.Dataset, *, k: int = 100, list_col: str = "tokens"
) -> pa.Table:
    """Zipf's-law fit over the top-k vocabulary: OLS slope of
    ln(cnt) ~ ln(rank) (a healthy natural-language corpus sits near
    −1; flat slopes flag templated/duplicated text). The heavy lifting
    is the existing vocab-bounded top-k aggregate; the fit is a
    closed-form two-moment finish on ≤k rows."""
    top = token_top_terms(ds, k=k, list_col=list_col)
    x = np.log(np.asarray(top["rank"], dtype=np.float64))
    y = np.log(np.asarray(top["cnt"], dtype=np.float64))
    xc = x - x.mean()
    slope = float((xc * (y - y.mean())).sum() / (xc * xc).sum())
    return pa.table({
        "n_terms": pa.array([top.num_rows], pa.int64()),
        "slope": pa.array([slope], pa.float64()),
    })


def bigram_pmi(
    ds: rd.Dataset, *, k: int = 20, list_col: str = "tokens",
    num_partitions: int = 32,
) -> pa.Table:
    """Pointwise mutual information of the top-k consecutive pairs:
    pmi = ln( (c_ab/N2) / ((c_a/N1)·(c_b/N1)) ) with N1 = total
    tokens, N2 = total bigram slots. Joins two existing aggregates —
    the vocab-bounded unigram table and the top-k bigram table — plus
    one tiny scalar partial for N2; no extra corpus shuffle."""
    top = bigram_top_terms(ds, k=k, list_col=list_col,
                           num_partitions=num_partitions)
    uni = token_frequencies(ds, list_col=list_col)
    n1 = int(pc.sum(uni["cnt"]).as_py() or 0)

    def _n2_partial(batch: pa.Table) -> pa.Table:
        col = batch[list_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lens = np.asarray(pc.list_value_length(col), dtype=np.int64)
        return pa.table({"n2": pa.array(
            [int(np.maximum(lens - 1, 0).sum())], pa.int64())})

    n2 = sum(
        int(t["n2"][0].as_py())
        for t in ds.map_batches(_n2_partial, batch_format="pyarrow",
                                batch_size=None).iter_batches(
            batch_format="pyarrow", batch_size=None)
    )
    cnt_by_tok = dict(zip(
        np.asarray(uni["token"]).tolist(), np.asarray(uni["cnt"]).tolist()))
    if "t1" not in top.column_names:  # no bigrams at all
        return pa.table({
            "t1": pa.array([], pa.int64()),
            "t2": pa.array([], pa.int64()),
            "cnt": pa.array([], pa.int64()),
            "rank": pa.array([], pa.int64()),
            "pmi": pa.array([], pa.float64()),
        })
    t1 = np.asarray(top["t1"])
    t2 = np.asarray(top["t2"])
    c1 = np.array([cnt_by_tok[t] for t in t1.tolist()], dtype=np.float64)
    c2 = np.array([cnt_by_tok[t] for t in t2.tolist()], dtype=np.float64)
    cab = np.asarray(top["cnt"], dtype=np.float64)
    pmi = np.log((cab / n2) / ((c1 / n1) * (c2 / n1)))
    return top.append_column("pmi", pa.array(pmi, pa.float64()))


def sequence_hash_columns(batch: pa.Table, tok_col: str = "tokens",
                          h1_col: str = "seq_h1",
                          h2_col: str = "seq_h2") -> pa.Table:
    """Append two 64-bit polynomial hashes of each row's token ARRAY
    (order- and value-sensitive; independent odd multipliers make a
    joint collision ~2^-128). Fully vectorized: values × a reversed
    power ladder, one segmented sum per hash — no per-row Python."""
    import numpy as np

    toks = batch[tok_col]
    toks = (toks.combine_chunks() if isinstance(toks, pa.ChunkedArray)
            else toks)
    off = np.asarray(toks.offsets, dtype=np.int64)
    vals = np.asarray(toks.values, dtype=np.int64)[off[0]:off[-1]]
    off = off - off[0]
    lens = np.diff(off)
    n = len(lens)
    out = {}
    # position from the END of each row (so h = Σ v_i · p^(L-1-i),
    # the classic left-to-right Horner result)
    pos_from_end = (np.repeat(off[1:], lens)
                    - np.arange(len(vals), dtype=np.int64) - 1)
    # the whole hash is mod-2^64 polynomial arithmetic: uint64 wraparound
    # is the point, so scope the overflow warning off here and keep it
    # visible everywhere else
    with np.errstate(over="ignore"):
        for name, mult in ((h1_col, 0x9E3779B97F4A7C15),
                          (h2_col, 0xC2B2AE3D27D4EB4F)):
            p = np.uint64(mult)
            max_len = int(lens.max()) if n else 0
            ladder = np.empty(max_len, dtype=np.uint64)
            if max_len:
                ladder[0] = np.uint64(1)
                for i in range(1, max_len):
                    ladder[i] = ladder[i - 1] * p
            terms = (vals.astype(np.uint64) + np.uint64(1)) * ladder[
                pos_from_end] if len(vals) else np.array([], np.uint64)
            csum = np.concatenate([[np.uint64(0)],
                                   np.cumsum(terms, dtype=np.uint64)])
            h = csum[off[1:]] - csum[off[:-1]]
            # mix the length so [0] and [0,0] (both summing to ladder
            # values that could alias) stay distinct
            h = (h + np.uint64(0x9E37) * lens.astype(np.uint64)) * p
            out[name] = h
    return (batch.append_column(h1_col, pa.array(out[h1_col].view(np.int64)))
            .append_column(h2_col, pa.array(out[h2_col].view(np.int64))))


def dedup_sequences(ds: rd.Dataset, *, id_col: str = "doc_id",
                    tok_col: str = "tokens",
                    num_partitions: int = 32) -> rd.Dataset:
    """Exact dedup of identical TOKEN SEQUENCES (the pre-tokenized
    payload): survivors keep the min id per distinct token array.
    Hash-only exchange (two 64-bit sequence hashes per row); the
    hash-partitioned keep-first aggregate resolves groups."""
    from raylog.functions.agg import grouped_aggregate_ds

    hashed = ds.map_batches(
        lambda b: sequence_hash_columns(b, tok_col=tok_col).select(
            ["seq_h1", "seq_h2", id_col]),
        batch_format="pyarrow", batch_size=None)
    kept = grouped_aggregate_ds(
        hashed, ["seq_h1", "seq_h2"], [(id_col, "min", id_col)],
        num_partitions=num_partitions)
    return kept.map_batches(lambda b: b.select([id_col]),
                            batch_format="pyarrow", batch_size=None)


def prefix_dedup_survivors(
    ds: rd.Dataset,
    *,
    id_col: str = "doc_id",
    tok_col: str = "tokens",
    len_col: str = "n_tok",
    k: int = 64,
    num_partitions: int = 32,
) -> rd.Dataset:
    """Truncated-duplicate detection: group docs sharing an IDENTICAL
    first-``k``-token prefix, keep the longest (min id on ties).

    Catches re-crawls cut at different truncation points — the same
    document captured at 2k and 8k tokens is invisible to exact
    sequence dedup (different arrays) and may fall under a Jaccard
    threshold, but shares its head verbatim. Docs shorter than ``k``
    are exempt (too little signal to call them the same doc).

    Exchange: two 64-bit prefix hashes + length + id per row (never
    the arrays); argmax-per-group (n_tok desc, id asc) with group
    size inside complete-prefix hash partitions. Output:
    (id, n_tok, n_shared)."""
    import numpy as np

    from raylog.functions.agg import partitioned_group_apply

    def keys(b: pa.Table) -> pa.Table:
        toks = b[tok_col]
        toks = (toks.combine_chunks()
                if isinstance(toks, pa.ChunkedArray) else toks)
        nt = pc.cast(pc.list_value_length(toks), pa.int64())
        m = pc.greater_equal(nt, pa.scalar(k, pa.int64()))
        sub = b.filter(m)
        toks_f = sub[tok_col]
        toks_f = (toks_f.combine_chunks()
                  if isinstance(toks_f, pa.ChunkedArray) else toks_f)
        sliced = pc.list_slice(toks_f, 0, k)
        hashed = sequence_hash_columns(
            pa.table({tok_col: sliced}), tok_col=tok_col)
        return pa.table({
            "seq_h1": hashed["seq_h1"],
            "seq_h2": hashed["seq_h2"],
            id_col: sub[id_col],
            len_col: pc.cast(sub[len_col], pa.int64()),
        })

    hashed = ds.map_batches(keys, batch_format="pyarrow", batch_size=None)

    def pick(part: pa.Table) -> pa.Table:
        def col(name):
            c = part[name]
            return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c

        h1 = np.asarray(col("seq_h1")).astype(np.uint64)
        h2 = np.asarray(col("seq_h2")).astype(np.uint64)
        did = np.asarray(col(id_col), dtype=np.int64)
        nt = np.asarray(col(len_col), dtype=np.int64)
        if len(did) == 0:
            return pa.table({
                id_col: pa.array([], pa.int64()),
                len_col: pa.array([], pa.int64()),
                "n_shared": pa.array([], pa.int64()),
            })
        order = np.lexsort((did, -nt, h2, h1))
        h1s, h2s = h1[order], h2[order]
        starts_mask = np.ones(len(did), dtype=bool)
        starts_mask[1:] = (h1s[1:] != h1s[:-1]) | (h2s[1:] != h2s[:-1])
        first = np.flatnonzero(starts_mask)
        sizes = np.diff(np.concatenate([first, [len(did)]]))
        return pa.table({
            id_col: pa.array(did[order][first]),
            len_col: pa.array(nt[order][first]),
            "n_shared": pa.array(sizes.astype(np.int64)),
        })

    return partitioned_group_apply(hashed, ["seq_h1", "seq_h2"], pick,
                                   num_partitions=num_partitions)


def repetition_fraction_batch(batch: pa.Table, id_col: str = "doc_id",
                              list_col: str = "tokens", n: int = 3,
                              base: int = 1 << 21) -> pa.Table:
    """Within-document repeated-n-gram fraction — the Gopher-style
    degenerate-text filter signal (Rae et al. 2021 §A2: drop docs whose
    duplicate n-gram share is high). Per doc: n_grams, n_distinct, and
    rep_milli = 1000·(n_grams − n_distinct) // n_grams.

    Gram identity is EXACT (not hashed): n token ids pack into one
    int64 positionally (token < 2^21, n ≤ 3 ⇒ key < 2^63), so the SQL
    oracle reproduces distinct counts with zero collision risk.
    Map-only, zero exchange, one output row per doc with ≥ n tokens.
    """
    ids = (batch[id_col].combine_chunks()
           if isinstance(batch[id_col], pa.ChunkedArray) else batch[id_col])
    toks = batch[list_col]
    toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    off = np.asarray(toks.offsets, dtype=np.int64)
    flat = np.asarray(toks.values, dtype=np.int64)[off[0]: off[-1]]
    off = off - off[0]
    lens = np.diff(off)
    total = int(off[-1]) if len(off) else 0
    n_docs = len(lens)

    key = np.zeros(total, dtype=np.int64)
    for j in range(n):
        shifted = np.empty(total, dtype=np.int64)
        shifted[: total - j] = flat[j:]
        shifted[total - j:] = 0
        key = key * base + shifted
    pos = np.arange(total, dtype=np.int64) - np.repeat(off[:-1], lens)
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
    n_grams = np.maximum(lens - n + 1, 0)
    valid = pos < np.repeat(n_grams, lens)
    g_doc, g_key = doc_idx[valid], key[valid]

    order = np.lexsort((g_key, g_doc))
    d_s, k_s = g_doc[order], g_key[order]
    first = np.empty(len(d_s), dtype=bool)
    if len(d_s):
        first[0] = True
        first[1:] = (d_s[1:] != d_s[:-1]) | (k_s[1:] != k_s[:-1])
    n_distinct = np.bincount(d_s[first], minlength=n_docs) if len(d_s) \
        else np.zeros(n_docs, dtype=np.int64)
    keep = n_grams > 0
    ng = n_grams[keep]
    nd = n_distinct[keep]
    return pa.table({
        id_col: ids.take(pa.array(np.flatnonzero(keep), pa.int64())),
        "n_grams": pa.array(ng),
        "n_distinct": pa.array(nd),
        "rep_milli": pa.array(1000 * (ng - nd) // ng),
    })


FIM_PRE, FIM_SUF, FIM_MID = 50021, 50022, 50023


def fim_transform_batch(batch: pa.Table, id_col: str = "doc_id",
                        list_col: str = "tokens") -> pa.Table:
    """Fill-in-the-middle (PSM) reordering stats — Bavarian et al. 2022:
    half the docs (deterministic integer coin, the SQL-parity form used
    by the mixture sampler) reorder to
    ``[PRE] prefix [SUF] suffix [MID] middle`` with split points drawn
    from the same coin. Output per doc: fim flag, transformed length,
    and the position-weighted checksum Σ pos·token over the TRANSFORMED
    sequence (sentinels included) — order- and value-sensitive, exactly
    restatable in SQL, and computed here WITHOUT materializing the
    reordered array (each segment's contribution is a weighted range
    sum over the original flat stream).
    """
    from raylog.functions.mixture import _coins_col

    ids = (batch[id_col].combine_chunks()
           if isinstance(batch[id_col], pa.ChunkedArray) else batch[id_col])
    toks = batch[list_col]
    toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    off = np.asarray(toks.offsets, dtype=np.int64)
    flat = np.asarray(toks.values, dtype=np.int64)[off[0]: off[-1]]
    off = off - off[0]
    n = np.diff(off)
    n_docs = len(n)

    # SQL-parity coin and split counts: s1 = prefix len, s2 = prefix+middle
    # len. String ids (the input_hint's doc_id:string) take the seeded-
    # xxhash branch of the shared coin helper — same determinism, no SQL
    # form (the integer-id path keeps the exact oracle).
    coin = _coins_col(ids)
    fim = coin % 2 == 0
    s1 = (coin // 2) % (n + 1)
    s2 = s1 + (coin // 1024) % (n - s1 + 1)

    # per-token new position in the PSM layout (1-based)
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), n)
    i1 = np.arange(len(flat), dtype=np.int64) - np.repeat(off[:-1], n) + 1
    s1r, s2r, nr = s1[doc_idx], s2[doc_idx], n[doc_idx]
    np_pos = np.where(
        i1 <= s1r, i1 + 1,
        np.where(i1 > s2r, s1r + 2 + (i1 - s2r),
                 s1r + (nr - s2r) + 3 + (i1 - s1r)))
    np_pos = np.where(fim[doc_idx], np_pos, i1)
    # int64 segment sum, never float64 weights: pos·token terms past
    # 2^53 would silently round in a weighted bincount while the SQL
    # oracle sums exact integers
    csum = np.zeros(n_docs, dtype=np.int64)
    np.add.at(csum, doc_idx, np_pos * flat)
    sentinels = (1 * FIM_PRE + (s1 + 2) * FIM_SUF
                 + (s1 + n - s2 + 3) * FIM_MID)
    csum = csum + np.where(fim, sentinels, 0)
    return pa.table({
        id_col: ids,
        "fim": pa.array(fim),
        "n_out": pa.array(np.where(fim, n + 3, n)),
        "fim_checksum": pa.array(csum),
    })
