"""Distributed BPE tokenizer training + encoding.

The canonical subword-tokenizer build for a pretraining corpus
(Sennrich et al. 2016, "Neural Machine Translation of Rare Words with
Subword Units"; the HuggingFace/GPT-2 training recipe): BPE is NOT
trained on the raw token stream — the distributed pass is a word→count
aggregate (vocab-cardinality exchange, the same high-cardinality-safe
shape as `tokens.py`), optionally truncated to the top-V words (the
``min_frequency`` practice), and the merge loop then runs on that small
weighted word table. At 100 TB the corpus never shuffles; only the
word-frequency table leaves the aggregate.

Merge semantics: rank k merges the pair with the highest corpus count
(ties broken lexicographically — deterministic across runs/partitions).
Encoding applies the learned rules in rank order, one vectorized flat-
array pass per rule over the batch's *dictionary-encoded unique words*
(each distinct word is encoded once per batch regardless of its row
count). This apply-in-rank-order scheme is the original Sennrich
formulation; HuggingFace's lowest-rank-first-per-word loop can differ
on words where a later rule creates an earlier rule's pair — train and
encode here share one scheme, so round-trips are exact.

All pair counting and merging is numpy on flat symbol arrays — no
Python loop over words; the only Python-level loop is over the K merge
ranks.

Symbols are BYTE-level (UTF-8 bytes, one latin-1 char per byte — the
GPT-2 byte↔char bijection), so any script trains, encodes and decodes;
bytes unseen at train time map to a reserved ``<unk>`` symbol.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

__all__ = ["bpe_train", "bpe_encode_ds", "BPEModel"]

_EOW = "</w>"  # end-of-word sentinel symbol (classic BPE word boundary)
_UNK = "<unk>"  # reserved id for bytes unseen at train time (ADVICE r2)


class BPEModel:
    """Learned merge table + symbol vocabulary.

    ``merges``: list of (left_id, right_id, new_id) in rank order.
    ``symbols``: list of symbol strings indexed by id (chars + merged).
    """

    def __init__(self, symbols: list[str], merges: list[tuple[int, int, int]]):
        self.symbols = symbols
        self.merges = merges

    def merge_table(self) -> pa.Table:
        return pa.table({
            "rank": pa.array(np.arange(len(self.merges), dtype=np.int64)),
            "left": pa.array([self.symbols[a] for a, _, _ in self.merges],
                             pa.string()),
            "right": pa.array([self.symbols[b] for _, b, _ in self.merges],
                              pa.string()),
            "merged": pa.array([self.symbols[z] for _, _, z in self.merges],
                               pa.string()),
        })

    def decode_ids(self, ids: np.ndarray) -> str:
        """Ids → text. Symbols are byte-level (one latin-1 char per
        UTF-8 byte), so the joined string round-trips through
        latin-1 → utf-8; out-of-range ids render as the UNK symbol."""
        n = len(self.symbols)
        s = "".join(self.symbols[i] if 0 <= i < n else _UNK for i in ids)
        s = s.replace(_EOW, " ")
        return s.encode("latin-1").decode("utf-8", errors="replace").rstrip()


def _words_to_flat(words: np.ndarray) -> tuple[np.ndarray, np.ndarray,
                                               list[str], dict[str, int]]:
    """Unique words → (flat symbol-id array, offsets, symbol list, index).

    BYTE-level: words encode to UTF-8 and every byte value is one
    initial symbol (represented as its latin-1 char — the GPT-2
    byte↔char bijection), so any script (CJK, Cyrillic, emoji) trains
    and round-trips; the earlier latin-1 ``str.encode`` raised on
    non-Latin-1 text (ADVICE r2). The ``\\x00`` separator never occurs
    inside UTF-8 text. Each word gets a ``</w>`` terminator, so merges
    never cross a word boundary and decoding restores spacing; a
    reserved ``<unk>`` symbol absorbs bytes unseen at train time.
    """
    joined = "\x00".join(words.tolist()) + ("\x00" if len(words) else "")
    chars = np.frombuffer(joined.encode("utf-8"), dtype=np.uint8)
    sym_index: dict[str, int] = {}
    symbols: list[str] = []

    uniq = np.unique(chars)
    for b in uniq.tolist():
        ch = chr(b)
        if ch != "\x00":
            sym_index[ch] = len(symbols)
            symbols.append(ch)
    eow = len(symbols)
    sym_index[_EOW] = eow
    symbols.append(_EOW)
    sym_index[_UNK] = len(symbols)
    symbols.append(_UNK)

    lut = np.full(256, -1, dtype=np.int64)
    for ch, i in sym_index.items():
        if len(ch) == 1:
            lut[ord(ch)] = i
    lut[0] = eow  # word separator becomes the end-of-word symbol
    flat = lut[chars]
    # offsets: word w covers flat[off[w]:off[w+1]] (incl. its trailing </w>)
    ends = np.flatnonzero(chars == 0) + 1
    off = np.concatenate([[0], ends]).astype(np.int64)
    return flat, off, symbols, sym_index


def _pair_counts(flat: np.ndarray, off: np.ndarray, wts: np.ndarray,
                 n_sym: int) -> tuple[np.ndarray, np.ndarray]:
    """Weighted adjacent-pair counts, boundaries masked (pairs never span
    the </w> of one word into the next word's first char)."""
    if len(flat) < 2:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    left, right = flat[:-1], flat[1:]
    # position i pairs (i, i+1); invalid when i+1 is a word start
    is_start = np.zeros(len(flat), dtype=bool)
    is_start[off[:-1]] = True
    valid = ~is_start[1:]
    wl = np.diff(off)
    w_of = np.repeat(np.arange(len(wl), dtype=np.int64), wl)[:-1]
    packed = left[valid] * n_sym + right[valid]
    w = wts[w_of[valid]]
    up, inv = np.unique(packed, return_inverse=True)
    cnt = np.bincount(inv, weights=w)
    return up, cnt


def _apply_merge(flat: np.ndarray, off: np.ndarray, a: int, b: int,
                 z: int) -> tuple[np.ndarray, np.ndarray]:
    """Replace every non-overlapping (a,b) with z, left-to-right greedy
    (overlapping runs like ``aaa`` with a==b keep 1st, 3rd, ... match),
    fully vectorized via run-parity selection."""
    if len(flat) < 2:
        return flat, off
    is_start = np.zeros(len(flat), dtype=bool)
    is_start[off[:-1]] = True
    m = np.flatnonzero((flat[:-1] == a) & (flat[1:] == b) & ~is_start[1:])
    if len(m) == 0:
        return flat, off
    if a == b:
        # consecutive match positions overlap; keep even offsets per run
        run_start = np.concatenate([[True], np.diff(m) != 1])
        run_id = np.cumsum(run_start) - 1
        first = m[np.flatnonzero(run_start)]
        keep = ((m - first[run_id]) % 2) == 0
        m = m[keep]
    # drop flat[m+1], set flat[m] = z
    flat = flat.copy()
    flat[m] = z
    mask = np.ones(len(flat), dtype=bool)
    mask[m + 1] = False
    # new offsets: subtract removed positions before each boundary
    removed_before = np.searchsorted(m + 1, off)
    return flat[mask], off - removed_before


def bpe_train(ds: rd.Dataset, text_col: str = "text", num_merges: int = 32,
              top_words: int = 50_000) -> BPEModel:
    """Train BPE: distributed word-count aggregate → driver merge loop.

    The corpus-sized pass is ONE word→count aggregate (key-compressed
    partials, hash-partitioned combine); the driver then sees at most
    ``top_words`` (count desc, word asc — deterministic truncation, the
    min_frequency analog) weighted words and runs ``num_merges``
    vectorized count+merge rounds on the flat symbol array.
    """
    from raylog.functions.agg import grouped_aggregate_ds
    from raylog.functions.topk import topk

    def wc(b: pa.Table) -> pa.Table:
        split = pc.split_pattern(b[text_col].combine_chunks(), " ")
        flat = split.flatten().dictionary_encode()
        codes = np.asarray(flat.indices, dtype=np.int64)
        uc, cnt = np.unique(codes, return_counts=True)
        return pa.table({"w": flat.dictionary.take(pa.array(uc)),
                         "c": pa.array(cnt, pa.int64())})

    counts = grouped_aggregate_ds(
        ds.map_batches(wc, batch_format="pyarrow", batch_size=None),
        ["w"], [("c", "sum", "c")])
    kept = topk(counts, sort_cols=["c", "w"], descending=[True, False],
                k=top_words)
    words = np.asarray(kept["w"], dtype=object)
    wts = np.asarray(kept["c"], dtype=np.float64)
    # canonical order so merge ties are independent of partition order
    o = np.argsort(words)
    words, wts = words[o].astype("U"), wts[o]

    flat, off, symbols, _ = _words_to_flat(words)
    n_sym_cap = len(symbols) + num_merges
    merges: list[tuple[int, int, int]] = []
    for _rank in range(num_merges):
        up, cnt = _pair_counts(flat, off, wts, n_sym_cap)
        if len(up) == 0:
            break
        # argmax count, ties → lexicographically smallest (left, right)
        best_cnt = cnt.max()
        cand = up[cnt == best_cnt]
        keys = sorted((symbols[p // n_sym_cap], symbols[p % n_sym_cap], int(p))
                      for p in cand.tolist())
        a, b = keys[0][2] // n_sym_cap, keys[0][2] % n_sym_cap
        z = len(symbols)
        symbols.append(symbols[a] + symbols[b])
        merges.append((a, b, z))
        flat, off = _apply_merge(flat, off, a, b, z)
    return BPEModel(symbols, merges)


def _encode_words(words: np.ndarray, model: BPEModel) -> tuple[np.ndarray,
                                                               np.ndarray]:
    """Encode unique words with the learned rules in rank order; returns
    (flat token-id array, offsets) aligned with ``words``."""
    sym_index = {s: i for i, s in enumerate(model.symbols)}
    joined = "\x00".join(words.tolist()) + ("\x00" if len(words) else "")
    chars = np.frombuffer(joined.encode("utf-8"), dtype=np.uint8)
    lut = np.full(256, -1, dtype=np.int64)
    for s, i in sym_index.items():
        if len(s) == 1 and ord(s) < 256:
            lut[ord(s)] = i
    lut[0] = sym_index[_EOW]
    flat = lut[chars]
    unseen = flat < 0
    if unseen.any():
        # bytes unseen at train time map to the reserved <unk> symbol;
        # no merge rule references it, so unks stay atomic
        flat[unseen] = sym_index[_UNK]
    ends = np.flatnonzero(chars == 0) + 1
    off = np.concatenate([[0], ends]).astype(np.int64)
    for a, b, z in model.merges:
        flat, off = _apply_merge(flat, off, a, b, z)
    return flat, off


def bpe_encode_ds(ds: rd.Dataset, model: BPEModel, id_col: str = "doc_id",
                  text_col: str = "text") -> rd.Dataset:
    """Encode a corpus: per batch, dictionary-encode the word column so
    each distinct word is BPE-encoded ONCE, then gather per-document
    token lists. Model ships via ``ray.put`` once, not per batch."""
    import ray

    ref = ray.put(model) if ray.is_initialized() else model

    def enc(b: pa.Table) -> pa.Table:
        m = ray.get(ref) if ray.is_initialized() else ref
        split = pc.split_pattern(b[text_col].combine_chunks(), " ")
        lens = np.asarray(pc.list_value_length(split), dtype=np.int64)
        flat_words = split.flatten().dictionary_encode()
        codes = np.asarray(flat_words.indices, dtype=np.int64)
        dwords = np.asarray(flat_words.dictionary, dtype="U")
        tok_flat, tok_off = _encode_words(dwords, m)
        ntok_per_word = np.diff(tok_off)
        # tokens per document = gather word encodings in word order
        per_word_tok = ntok_per_word[codes]
        doc_ntok = np.bincount(
            np.repeat(np.arange(b.num_rows, dtype=np.int64), lens),
            weights=per_word_tok, minlength=b.num_rows).astype(np.int64)
        total = int(per_word_tok.sum())
        base = np.concatenate([[0], np.cumsum(per_word_tok)[:-1]])
        gather = (np.arange(total, dtype=np.int64)
                  - np.repeat(base, per_word_tok)
                  + np.repeat(tok_off[codes], per_word_tok))
        out_off = np.concatenate(
            [[0], np.cumsum(doc_ntok)]).astype(np.int64)
        toks = pa.ListArray.from_arrays(
            pa.array(out_off, pa.int64()).cast(pa.int32()),
            pa.array(tok_flat[gather], pa.int32()))
        return pa.table({
            id_col: b[id_col],
            "bpe_tokens": toks,
            "n_bpe": pa.array(doc_ntok),
        })

    return ds.map_batches(enc, batch_format="pyarrow", batch_size=None)
