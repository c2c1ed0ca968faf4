"""Sequence packing: map variable-length tokenized docs into fixed-size
context windows — the standard LLM training-data preparation step.

Two packing disciplines, both executed per hash partition (complete
key groups via `agg.partitioned_group_apply`, one vectorized pass,
no global sort, no driver state):

- :func:`pack_chunks` — "concat-and-chunk": documents are concatenated
  in deterministic (partition, doc_id) order and the stream is cut
  every ``max_tokens``; a document spans windows [first_pack,
  last_pack]. Closed form over a running sum → fully vectorized AND
  SQL-restatable (the oracle checks it with a window function).
- :func:`pack_greedy` — whole-doc first-fit: a new window starts when
  the next document would overflow ``max_tokens``; docs longer than the
  window get a window of their own (flagged ``overflow``). The boundary
  recurrence is inherently sequential, so it runs as a per-pack
  ``searchsorted`` on the partition's cumsum — O(n_packs) tiny steps,
  everything else vectorized.

Window ids are (partition, local_id) pairs so no cross-partition
coordination exists; at 10^12 sequences each partition packs its own
shard independently — exactly how a sharded training-data job lays out
its tokenized corpus.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from raylog.functions.agg import partitioned_group_apply


def _ids_array(col) -> np.ndarray:
    """Id column as a sortable numpy array: int64 for integer ids,
    object (string) otherwise — np.lexsort handles both."""
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_integer(col.type):
        return np.asarray(col, dtype=np.int64)
    return np.asarray(col.to_pylist(), dtype=object)


def _with_shard(ds: rd.Dataset, id_col: str, num_shards: int) -> rd.Dataset:
    """Stable shard per doc: ``id % num_shards`` for integer ids (the
    SQL-oracle-parity form) and the seeded-xxhash partitioner for
    string ids (the sequences table's ``doc_id`` is a string)."""
    from raylog.functions.agg import partition_ids

    def add(b: pa.Table) -> pa.Table:
        if pa.types.is_integer(b[id_col].type):
            ids = np.asarray(b[id_col].combine_chunks(), dtype=np.int64)
            return b.append_column("shard", pa.array(ids % num_shards))
        return b.append_column("shard", partition_ids(b, [id_col],
                                                      num_shards))

    return ds.map_batches(add, batch_format="pyarrow", batch_size=None)


def pack_chunks(
    ds: rd.Dataset,
    *,
    id_col: str = "doc_id",
    len_col: str = "n_tok",
    max_tokens: int = 2048,
    num_shards: int = 8,
    num_partitions: int = 8,
    keep_len: bool = False,
) -> rd.Dataset:
    """Concat-and-chunk window assignment per shard (= doc_id % shards).

    Output per doc: shard, doc_id, first_pack, last_pack, first_offset
    (token offset of the doc inside its first window); ``keep_len``
    additionally carries ``len_col`` through to the output.
    """

    def run(part: pa.Table) -> pa.Table:
        ids = _ids_array(part[id_col])
        lens = np.asarray(part[len_col].combine_chunks(), dtype=np.int64)
        shard = np.asarray(part["shard"].combine_chunks(), dtype=np.int64)
        # Arrow C++ sort: object-dtype lexsort on string ids is ~6x
        # slower (see pack_windows)
        order = np.asarray(pc.sort_indices(
            part, sort_keys=[("shard", "ascending"),
                             (id_col, "ascending")]), dtype=np.int64)
        ids, lens, shard = ids[order], lens[order], shard[order]
        cum = np.cumsum(lens)
        seg_start = np.empty(len(ids), dtype=bool)
        if len(ids):
            seg_start[0] = True
            seg_start[1:] = shard[1:] != shard[:-1]
        # per-shard running sum: subtract the shard's prior total
        prior = np.repeat(
            np.where(np.flatnonzero(seg_start) > 0,
                     cum[np.flatnonzero(seg_start) - 1], 0),
            np.diff(np.append(np.flatnonzero(seg_start), len(ids))),
        ) if len(ids) else np.zeros(0, dtype=np.int64)
        cum = cum - prior
        start = cum - lens
        cols = {
            "shard": pa.array(shard),
            id_col: pa.array(ids),
            "first_pack": pa.array(start // max_tokens),
            "last_pack": pa.array(np.where(lens > 0, (cum - 1) // max_tokens,
                                           start // max_tokens)),
            "first_offset": pa.array(start % max_tokens),
        }
        if keep_len:
            cols[len_col] = pa.array(lens)
        return pa.table(cols)

    return partitioned_group_apply(
        _with_shard(ds.select_columns([id_col, len_col]), id_col, num_shards),
        ["shard"], run, num_partitions=num_partitions,
    )


def pack_greedy(
    ds: rd.Dataset,
    *,
    id_col: str = "doc_id",
    len_col: str = "n_tok",
    max_tokens: int = 2048,
    num_shards: int = 8,
    num_partitions: int = 8,
) -> rd.Dataset:
    """Whole-doc first-fit packing per shard.

    Output per doc: shard, doc_id, pack_id (shard-local), overflow
    (doc alone in its window and longer than max_tokens).
    """

    def run(part: pa.Table) -> pa.Table:
        ids = _ids_array(part[id_col])
        lens = np.asarray(part[len_col].combine_chunks(), dtype=np.int64)
        shard = np.asarray(part["shard"].combine_chunks(), dtype=np.int64)
        # Arrow C++ sort: object-dtype lexsort on string ids is ~6x
        # slower (see pack_windows)
        order = np.asarray(pc.sort_indices(
            part, sort_keys=[("shard", "ascending"),
                             (id_col, "ascending")]), dtype=np.int64)
        ids, lens, shard = ids[order], lens[order], shard[order]
        n = len(ids)
        pack = np.zeros(n, dtype=np.int64)
        starts = np.flatnonzero(
            np.concatenate([[True], shard[1:] != shard[:-1]])) if n else []
        bounds = np.append(starts, n)
        capped = np.minimum(lens, max_tokens)  # oversize doc: own window
        for s, e in zip(bounds[:-1], bounds[1:]):
            cum = np.cumsum(capped[s:e])
            i, pid, base = 0, 0, 0
            while i < e - s:
                j = int(np.searchsorted(cum, base + max_tokens, side="right"))
                j = max(j, i + 1)  # always place at least one doc
                pack[s + i:s + j] = pid
                base = cum[j - 1]
                i, pid = j, pid + 1
        return pa.table({
            "shard": pa.array(shard),
            id_col: pa.array(ids),
            "pack_id": pa.array(pack),
            "overflow": pa.array(lens > max_tokens),
        })

    return partitioned_group_apply(
        _with_shard(ds.select_columns([id_col, len_col]), id_col, num_shards),
        ["shard"], run, num_partitions=num_partitions,
    )


def pack_windows(
    ds: rd.Dataset,
    *,
    id_col: str = "doc_id",
    tok_col: str = "tokens",
    max_tokens: int = 512,
    num_shards: int = 8,
    num_partitions: int = 8,
    sep_token: int | None = None,
) -> rd.Dataset:
    """MATERIALIZED concat-and-chunk: the actual fixed-size token
    windows a trainer consumes, not just the span bookkeeping of
    :func:`pack_chunks`.

    Per shard (complete shards per partition): token arrays concatenate
    in doc_id order and the flat stream is cut every ``max_tokens``.
    Output: (shard, pack_id, n_fill, tokens list<int32>) — the final
    window of a shard may be short (``n_fill < max_tokens``; the
    trainer pads it). ``sep_token`` (e.g. an EOS id) is inserted after
    every document before chunking — the standard trainer layout, so a
    model can learn document boundaries inside packed windows. Fully
    vectorized: one ListArray take + flatten per partition, window
    boundaries are arithmetic on the shard's token counts, the output
    list column is rebuilt from offsets with zero per-window Python.

    Scale knob: a shard is processed whole (window boundaries cross doc
    boundaries, so a shard cannot split), so ``num_shards`` must scale
    with the corpus — pick ``corpus_tokens × 4 B / ~1 GB`` shards (e.g.
    ~10^5 at 10^12 sequences) and ``num_partitions ≈ cluster cores``;
    shards are also the natural output-file granularity for resumable
    writes.
    """

    def run(part: pa.Table) -> pa.Table:
        shard = np.asarray(part["shard"].combine_chunks(), dtype=np.int64)
        toks = part[tok_col]
        toks = (toks.combine_chunks() if isinstance(toks, pa.ChunkedArray)
                else toks)
        # 64-bit offsets end to end: a partition past 2^31 flat tokens
        # would overflow 32-bit list offsets in both the take and the
        # window rebuild (the docstring's 10^12-token sizing guidance
        # allows ~60 GB shards); the cast copies offsets only
        if not pa.types.is_large_list(toks.type):
            toks = toks.cast(pa.large_list(toks.type.value_type))
        # Arrow's C++ sort: string doc_ids compare in native code — an
        # object-dtype np.lexsort here cost ~6x the whole op on the
        # 8M-row sequences bench
        order = np.asarray(pc.sort_indices(
            part, sort_keys=[("shard", "ascending"),
                             (id_col, "ascending")]), dtype=np.int64)
        taken = toks.take(pa.array(order))
        flat = taken.flatten()  # concatenated in (shard, doc) order
        lens = np.asarray(pc.list_value_length(taken), dtype=np.int64)
        if sep_token is not None and len(lens):
            # append one separator after every doc: scatter the doc
            # tokens around reserved sep slots — pure offset arithmetic
            vals = np.asarray(flat, dtype=np.int64)
            n_docs_p = len(lens)
            new_lens = lens + 1
            new_total = int(new_lens.sum())
            out = np.full(new_total, int(sep_token), dtype=np.int64)
            new_off = np.concatenate([[0], np.cumsum(new_lens)])
            # destination index of each original token
            shift = np.repeat(new_off[:-1]
                              - np.concatenate([[0], np.cumsum(lens)])[:-1],
                              lens)
            out[np.arange(len(vals), dtype=np.int64) + shift] = vals
            flat = pa.array(out.astype(np.int32), pa.int32())
            lens = new_lens
        shard_s = shard[order]
        n = len(shard_s)
        if n == 0:
            return pa.table({
                "shard": pa.array([], pa.int64()),
                "pack_id": pa.array([], pa.int64()),
                "n_fill": pa.array([], pa.int64()),
                "tokens": pa.array([], pa.large_list(flat.type)),
            })
        new_shard = np.empty(n, dtype=bool)
        new_shard[0] = True
        new_shard[1:] = shard_s[1:] != shard_s[:-1]
        starts = np.flatnonzero(new_shard)
        shard_tok = np.add.reduceat(lens, starts)
        seg_base = np.concatenate([[0], np.cumsum(shard_tok)[:-1]])
        out_shard, out_pid, out_off, out_end = [], [], [], []
        for s_val, base, tot in zip(shard_s[starts], seg_base, shard_tok):
            if tot == 0:
                # a shard of all-empty token lists yields no windows —
                # and contributes no tokens, so the tiling below holds
                continue
            k = int(-(-tot // max_tokens))  # ceil
            out_shard.append(np.full(k, s_val, dtype=np.int64))
            out_pid.append(np.arange(k, dtype=np.int64))
            out_off.append(base + np.arange(k, dtype=np.int64) * max_tokens)
            out_end.append(np.full(k, base + tot, dtype=np.int64))
        if not out_shard:
            return pa.table({
                "shard": pa.array([], pa.int64()),
                "pack_id": pa.array([], pa.int64()),
                "n_fill": pa.array([], pa.int64()),
                "tokens": pa.array([], pa.large_list(flat.type)),
            })
        o_shard = np.concatenate(out_shard)
        o_pid = np.concatenate(out_pid)
        o_off = np.concatenate(out_off)
        ends = np.minimum(o_off + max_tokens, np.concatenate(out_end))
        # windows tile the flat token stream exactly (contiguous per
        # shard, shards back to back), so the list column rebuilds from
        # window lengths over `flat` with NO gather at all
        win_lists = pa.LargeListArray.from_arrays(
            pa.array(np.concatenate([[0], np.cumsum(ends - o_off)]),
                     pa.int64()),
            flat,
        )
        return pa.table({
            "shard": pa.array(o_shard),
            "pack_id": pa.array(o_pid),
            "n_fill": pa.array(ends - o_off),
            "tokens": win_lists,
        })

    # pin the sharded token stream before the shuffle barrier: fused
    # with the parquet read the sort ran 10.6-11.1 s vs 5.1-9.5 s
    # pinned (interleaved forced-flag A/B, half stream, 32 CPUs); the
    # shuffle buffers the payload either way
    return partitioned_group_apply(
        _with_shard(ds.select_columns([id_col, tok_col]), id_col,
                    num_shards),
        ["shard"], run, num_partitions=num_partitions,
        materialize_input=True,
    )


def pack_segments(
    ds: rd.Dataset,
    *,
    id_col: str = "doc_id",
    len_col: str = "n_tok",
    max_tokens: int = 512,
    num_shards: int = 8,
    num_partitions: int = 8,
) -> rd.Dataset:
    """Per-window SEGMENT bookkeeping for concat-and-chunk packing: how
    many documents each context window spans and a checksum over their
    in-window token counts — what a trainer needs to build block-
    diagonal attention masks for packed sequences.

    Closed form per shard (complete shards per partition, same layout
    as :func:`pack_chunks`): each doc expands to its
    ``last_pack - first_pack + 1`` window intersections (doc-major, so
    a window's segments are contiguous and doc-ordered), the overlap
    lengths are interval arithmetic, and the per-window aggregate
    completes INSIDE the partition — no second exchange. Output:
    (shard, pack_id, n_segments, seg_chk) with
    ``seg_chk = Σ rank·overlap`` (rank = 1-based doc order in window).
    """

    def run(part: pa.Table) -> pa.Table:
        lens = np.asarray(part[len_col].combine_chunks(), dtype=np.int64)
        shard = np.asarray(part["shard"].combine_chunks(), dtype=np.int64)
        order = np.asarray(pc.sort_indices(
            part, sort_keys=[("shard", "ascending"),
                             (id_col, "ascending")]), dtype=np.int64)
        lens, shard = lens[order], shard[order]
        n = len(lens)
        if n == 0:
            return pa.table({
                "shard": pa.array([], pa.int64()),
                "pack_id": pa.array([], pa.int64()),
                "n_segments": pa.array([], pa.int64()),
                "seg_chk": pa.array([], pa.int64()),
            })
        cum = np.cumsum(lens)
        seg_start = np.empty(n, dtype=bool)
        seg_start[0] = True
        seg_start[1:] = shard[1:] != shard[:-1]
        starts_idx = np.flatnonzero(seg_start)
        prior = np.repeat(
            np.where(starts_idx > 0, cum[starts_idx - 1], 0),
            np.diff(np.append(starts_idx, n)))
        cum = cum - prior              # per-shard running sum
        start = cum - lens             # doc's first token offset in shard
        first = start // max_tokens
        last = np.where(lens > 0, (cum - 1) // max_tokens, first)
        k = last - first + 1
        rep = np.repeat(np.arange(n), k)
        win = first[rep] + (np.arange(int(k.sum()), dtype=np.int64)
                            - np.repeat(np.cumsum(k) - k, k))
        w_lo = win * max_tokens
        w_hi = w_lo + max_tokens
        overlap = (np.minimum(cum[rep], w_hi)
                   - np.maximum(start[rep], w_lo))
        # zero-length docs intersect nothing real: drop their expansion
        keep = overlap > 0
        rep, win, overlap = rep[keep], win[keep], overlap[keep]
        sh = shard[rep]
        # windows appear doc-major → per-(shard, win) runs contiguous
        m = len(sh)
        if m == 0:
            return pa.table({
                "shard": pa.array([], pa.int64()),
                "pack_id": pa.array([], pa.int64()),
                "n_segments": pa.array([], pa.int64()),
                "seg_chk": pa.array([], pa.int64()),
            })
        new_w = np.empty(m, dtype=bool)
        new_w[0] = True
        new_w[1:] = (sh[1:] != sh[:-1]) | (win[1:] != win[:-1])
        w_starts = np.flatnonzero(new_w)
        w_sizes = np.diff(np.append(w_starts, m))
        rank = (np.arange(m, dtype=np.int64)
                - np.repeat(w_starts, w_sizes) + 1)
        prod = np.concatenate([[0], np.cumsum(rank * overlap)])
        return pa.table({
            "shard": pa.array(sh[w_starts]),
            "pack_id": pa.array(win[w_starts]),
            "n_segments": pa.array(w_sizes.astype(np.int64)),
            "seg_chk": pa.array(prod[np.append(w_starts[1:], m)]
                                - prod[w_starts]),
        })

    return partitioned_group_apply(
        _with_shard(ds.select_columns([id_col, len_col]), id_col,
                    num_shards),
        ["shard"], run, num_partitions=num_partitions,
    )


def write_packed_windows(
    ds: rd.Dataset,
    out_dir: str,
    *,
    max_tokens: int = 512,
    num_shards: int = 8,
    num_partitions: int = 8,
    **pack_kw,
) -> None:
    """Materialize context windows and persist them resumably:
    ``out_dir/bucket=NNNN/part-*.parquet`` via the idempotent bucketed
    writer (deterministic file names — a retried or re-run write
    replaces its own files, never duplicates). Shards are the write
    granularity, matching the packing partitioning, so a failed run
    resumes by re-running only the shards whose files are absent."""
    from raylog.functions.bucketed import write_bucketed

    wins = pack_windows(ds, max_tokens=max_tokens, num_shards=num_shards,
                        num_partitions=num_partitions, **pack_kw)
    write_bucketed(wins, out_dir, key="shard", num_buckets=num_shards)
