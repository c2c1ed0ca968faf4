"""Corpus-wide boilerplate-span removal (C4 / RefinedWeb-style).

C4 discards any three-sentence span that occurs more than once in the
corpus; RefinedWeb removes duplicated n-gram spans. The same shape here,
over word k-grams:

1. **df pass** — every batch emits (gram_hash, docs_containing) partials
   (per-doc distinct, so a gram repeated inside one doc counts once);
   the hash-partitioned distributed combine (``grouped_aggregate_ds``)
   produces exact document frequencies without ever shuffling raw text.
2. **boilerplate set** — grams with ``df >= min_df``. This is a
   heavy-hitter-bounded set (its size is controlled by the threshold,
   not the corpus), collected once and broadcast via ``ray.put`` as a
   sorted uint64 array. At 100 TB, ``min_df`` scales with corpus size
   (a span shared by ≥0.01% of documents), keeping the set small; a
   top-N cap bounds it hard if a pathological threshold is chosen.
3. **removal pass** — each batch recomputes its rolling gram hashes,
   marks matches with one ``searchsorted`` against the broadcast set,
   expands match starts to covered word positions with a
   difference-array cumsum (no per-match loop), and rebuilds the
   cleaned text zero-copy-ish: kept word values are gathered from the
   flat Arrow string buffer and re-joined per doc with
   ``pc.binary_join``.

Gram identity is a positional polynomial mix of blake2b word hashes
(uint64 wraparound) — the same 2^-64 collision regime as the dedup
shingles; ``raylog/functions/dedup.py`` owns the word-hash cache.

Reference analog: none (the reference is a log forwarder); this is one
of the prompt-mandated training-data operators. Semantics follow
Raffel et al. 2020 (C4) §2.2 and Penedo et al. 2023 (RefinedWeb) §3.3.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from raylog.functions.agg import grouped_aggregate_ds
from raylog.functions.dedup import _MIX, _PROCESS_HASHER, _split_words


def _gram_hashes_at_positions(wh: np.ndarray, offsets: np.ndarray, k: int):
    """Rolling k-gram hash at every valid start position (no dedup).

    Returns (gram hashes flat, valid mask over flat word positions,
    doc_idx per word, per-doc word lengths). Docs with < k words emit
    no grams (they cannot carry a k-word boilerplate span).
    """
    n_docs = len(offsets) - 1
    lens = offsets[1:] - offsets[:-1]
    total = int(offsets[-1]) if len(offsets) else 0
    gram = np.zeros(total, dtype=np.uint64)
    for j in range(k):
        shifted = np.empty(total, dtype=np.uint64)
        shifted[: total - j] = wh[j:]
        shifted[total - j:] = 0
        gram = gram * _MIX + shifted
    pos = np.arange(total, dtype=np.int64) - np.repeat(offsets[:-1], lens)
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
    n_grams = np.maximum(lens - k + 1, 0)
    valid = pos < np.repeat(n_grams, lens)
    return gram, valid, doc_idx, lens


def _df_partial(batch: pa.Table, text_col: str, k: int) -> pa.Table:
    wh, offsets = _split_words(batch[text_col], _PROCESS_HASHER)
    gram, valid, doc_idx, _ = _gram_hashes_at_positions(wh, offsets, k)
    g_doc, g_hash = doc_idx[valid], gram[valid]
    # per-doc distinct grams, then per-batch df partial
    order = np.lexsort((g_hash, g_doc))
    g_doc, g_hash = g_doc[order], g_hash[order]
    if len(g_doc):
        keep = np.empty(len(g_doc), dtype=bool)
        keep[0] = True
        keep[1:] = (g_doc[1:] != g_doc[:-1]) | (g_hash[1:] != g_hash[:-1])
        g_hash = g_hash[keep]
    uniq, cnt = (np.unique(g_hash, return_counts=True)
                 if len(g_hash) else (np.array([], np.uint64), np.array([], np.int64)))
    return pa.table({"gh": pa.array(uniq, pa.uint64()),
                     "df": pa.array(cnt.astype(np.int64), pa.int64())})


def boilerplate_gram_set(
    ds: rd.Dataset,
    *,
    text_col: str = "text",
    k: int = 5,
    min_df: int = 2,
    max_set: int = 2_000_000,
    num_partitions: int = 16,
) -> np.ndarray:
    """Sorted uint64 array of gram hashes with document frequency ≥
    ``min_df`` (capped at the ``max_set`` highest-df grams)."""
    df = grouped_aggregate_ds(
        ds.map_batches(lambda b: _df_partial(b, text_col, k),
                       batch_format="pyarrow", batch_size=None),
        ["gh"], [("df", "sum", "df")], num_partitions=num_partitions)
    hot = df.filter(expr=f"df >= {int(min_df)}")
    # heavy-hitter bounded by construction; cap defensively anyway
    tbl = pa.concat_tables(
        hot.iter_batches(batch_format="pyarrow", batch_size=None),
        promote_options="default") if hot.count() else pa.table(
            {"gh": pa.array([], pa.uint64()), "df": pa.array([], pa.int64())})
    gh = np.array(tbl["gh"].to_numpy(zero_copy_only=False), dtype=np.uint64)
    dfv = tbl["df"].to_numpy(zero_copy_only=False)
    if len(gh) > max_set:
        top = np.argsort(dfv)[::-1][:max_set]
        gh = gh[top]
    gh.sort()
    return gh


class BoilerplateScrubber:
    """Actor-pool removal pass: the boilerplate set is fetched from the
    object store once per actor (``__init__``), every batch pays one
    searchsorted + cumsum + byte-gather."""

    def __init__(self, boiler_ref, text_col: str = "text", k: int = 5):
        self.boiler = (ray.get(boiler_ref)
                       if isinstance(boiler_ref, ray.ObjectRef) else boiler_ref)
        self.text_col = text_col
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        k = self.k
        wh, offsets = _split_words(batch[self.text_col], _PROCESS_HASHER)
        gram, valid, doc_idx, lens = _gram_hashes_at_positions(wh, offsets, k)
        total = int(offsets[-1]) if len(offsets) else 0
        n_docs = len(offsets) - 1

        idx = np.searchsorted(self.boiler, gram)
        idx[idx >= len(self.boiler)] = max(len(self.boiler) - 1, 0)
        hit = valid & (self.boiler[idx] == gram) if len(self.boiler) else (
            np.zeros(total, dtype=bool))

        # covered word positions: +1 at each hit start, -1 past its end
        diff = np.zeros(total + 1, dtype=np.int64)
        starts = np.flatnonzero(hit)
        np.add.at(diff, starts, 1)
        np.add.at(diff, starts + k, -1)  # starts are valid ⇒ start+k ≤ doc end
        covered = np.cumsum(diff[:total]) > 0

        dup_spans = np.bincount(doc_idx[hit], minlength=n_docs)
        removed = np.bincount(doc_idx[covered], minlength=n_docs)
        kept_mask = ~covered

        # rebuild cleaned text from kept words
        split = batch[self.text_col].combine_chunks()
        split = pc.split_pattern(split, pattern=" ")
        split = split.combine_chunks() if isinstance(split, pa.ChunkedArray) else split
        flat_words = split.values
        kept_vals = flat_words.take(pa.array(np.flatnonzero(kept_mask), pa.int64()))
        kept_per_doc = np.bincount(doc_idx[kept_mask], minlength=n_docs)
        new_offsets = np.zeros(n_docs + 1, dtype=np.int32)
        np.cumsum(kept_per_doc, out=new_offsets[1:])
        lst = pa.ListArray.from_arrays(pa.array(new_offsets, pa.int32()), kept_vals)
        clean = pc.binary_join(lst, " ")

        return pa.table({
            "doc_id": batch["doc_id"],
            "dup_spans": pa.array(dup_spans.astype(np.int64), pa.int64()),
            "removed_words": pa.array(removed.astype(np.int64), pa.int64()),
            "kept_words": pa.array((lens - removed).astype(np.int64), pa.int64()),
            "clean_text": clean,
        })


class NgramContaminationFlagger:
    """Actor-pool pass: eval-set gram hashes fetched once per actor;
    per batch one rolling-hash pass + searchsorted membership count."""

    def __init__(self, eval_ref, text_col: str = "text", k: int = 8):
        self.eval = (ray.get(eval_ref)
                     if isinstance(eval_ref, ray.ObjectRef) else eval_ref)
        self.text_col, self.k = text_col, k

    def __call__(self, batch: pa.Table) -> pa.Table:
        wh, offsets = _split_words(batch[self.text_col], _PROCESS_HASHER)
        gram, valid, doc_idx, _ = _gram_hashes_at_positions(
            wh, offsets, self.k)
        n_docs = len(offsets) - 1
        ev = self.eval
        if len(ev):
            idx = np.minimum(np.searchsorted(ev, gram), len(ev) - 1)
            hit = valid & (ev[idx] == gram)
        else:
            hit = np.zeros(len(gram), dtype=bool)
        hits = np.bincount(doc_idx[hit], minlength=n_docs).astype(np.int64)
        return pa.table({
            "doc_id": batch["doc_id"],
            "ngram_hits": pa.array(hits, pa.int64()),
            "contaminated": pa.array(hits > 0),
        })


def ngram_decontaminate(
    ds: rd.Dataset,
    eval_ds: rd.Dataset,
    *,
    text_col: str = "text",
    k: int = 8,
    concurrency: int = 2,
) -> rd.Dataset:
    """GPT-3/PaLM-style n-gram decontamination: flag any training doc
    sharing a word k-gram with the held-out eval set.

    The eval set is an eval SUITE — tiny versus the corpus — so its
    distinct gram hashes are collected once (per-batch distinct first,
    so the driver sees eval-gram-bounded rows) and broadcast sorted;
    the corpus streams through one rolling-hash + searchsorted pass per
    batch. Versus the substring variant (`text_decontaminate`), word
    k-grams are tokenization-robust and count overlap positions."""
    parts = eval_ds.map_batches(
        lambda b: _df_partial(b, text_col, k).select(["gh"]),
        batch_format="pyarrow", batch_size=None)
    tbls = list(parts.iter_batches(batch_format="pyarrow", batch_size=None))
    gh = (np.unique(np.concatenate([
        np.array(t["gh"].to_numpy(zero_copy_only=False), dtype=np.uint64)
        for t in tbls])) if tbls else np.array([], dtype=np.uint64))
    ref = ray.put(gh) if ray.is_initialized() else gh
    return ds.map_batches(
        NgramContaminationFlagger,
        fn_constructor_kwargs={"eval_ref": ref, "text_col": text_col, "k": k},
        concurrency=concurrency, batch_format="pyarrow", batch_size=None)


def remove_boilerplate(
    ds: rd.Dataset,
    *,
    text_col: str = "text",
    k: int = 5,
    min_df: int = 2,
    num_partitions: int = 16,
    concurrency: int = 2,
) -> rd.Dataset:
    """Full pipeline: df pass → broadcast set → scrub pass."""
    boiler = boilerplate_gram_set(
        ds, text_col=text_col, k=k, min_df=min_df,
        num_partitions=num_partitions)
    ref = ray.put(boiler) if ray.is_initialized() else boiler
    return ds.map_batches(
        BoilerplateScrubber,
        fn_constructor_kwargs={"boiler_ref": ref, "text_col": text_col, "k": k},
        concurrency=concurrency, batch_format="pyarrow", batch_size=None)
