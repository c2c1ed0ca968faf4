"""Text analysis for training-data pipelines over the `documents` table.

All stages are vectorized ``map_batches`` transforms; heuristics are
deliberately simple arithmetic over tokens so the DuckDB oracle can
restate them exactly (the correctness gate), while the *structure*
(batch transforms, stateful pattern compilation in actor ``__init__``)
is the real engine surface.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# language → stopword marker sets for the n-gram/stopword langid heuristic
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and"),
    "es": ("el", "la", "de", "y"),
    "de": ("der", "die", "das", "und"),
    "fr": ("le", "la", "de", "et"),
}
QUALITY_STOPWORDS = ("the", "a")


def _chunked(col):
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def token_counts(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Whitespace token count + BPE-ish regex token count (\\w+ | punct)."""
    text = _chunked(batch[text_col])
    ws = pc.add(pc.count_substring(text, " "), 1)
    bpe = pc.count_substring_regex(text, r"\w+|[^\w\s]")
    return batch.append_column("n_ws_tokens", pc.cast(ws, pa.int64())) \
                .append_column("n_bpe_tokens", pc.cast(bpe, pa.int64()))


def _word_membership_count(text: pa.Array, words: tuple[str, ...]) -> pa.Array:
    """Count whitespace-delimited tokens of `text` that are in `words`.

    Split-based (not regex word-boundary counting, which undercounts
    consecutive matches): flatten the split lists, vectorized is_in,
    segmented sum over the list offsets.
    """
    split = pc.split_pattern(text, pattern=" ")
    split = split.combine_chunks() if isinstance(split, pa.ChunkedArray) else split
    hit = pc.cast(pc.is_in(split.values, value_set=pa.array(list(words))), pa.int64())
    off = np.asarray(split.offsets)
    csum = np.concatenate([[0], np.cumsum(np.asarray(hit), dtype=np.int64)])
    return pa.array(csum[off[1:]] - csum[off[:-1]], type=pa.int64())


def quality_scores(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Length / stopword-ratio quality components + a 0-1000 score.

    Components kept as SQL-reproducible integers: n_chars, n_words,
    stop_hits; score_milli = floor(1000*(0.5*min(n_words/40,1) +
    0.5*(1 - stop_hits/n_words))).
    """
    text = _chunked(batch[text_col])
    n_chars = pc.cast(pc.utf8_length(text), pa.int64())
    n_words = pc.cast(pc.add(pc.count_substring(text, " "), 1), pa.int64())
    stop = pc.cast(_word_membership_count(text, QUALITY_STOPWORDS), pa.int64())
    nw = np.asarray(n_words, dtype=np.float64)
    sh = np.asarray(stop, dtype=np.float64)
    # floor, not round: the value is rational and lands on exact .5
    # boundaries where numpy (banker's) and SQL (half-away) disagree
    score = np.floor(1000.0 * (0.5 * np.minimum(nw / 40.0, 1.0) + 0.5 * (1.0 - sh / nw)))
    return (
        batch.append_column("n_chars_calc", n_chars)
        .append_column("n_words", n_words)
        .append_column("stop_hits", stop)
        .append_column("score_milli", pa.array(score.astype(np.int64)))
    )


def lang_id(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Stopword-marker language ID: argmax of per-language marker hits
    (ties and zero hits → 'und'). The n-gram-profile analog of fasttext
    langid, kept SQL-expressible."""
    text = _chunked(batch[text_col])
    langs = sorted(LANG_STOPWORDS)
    hits = {lang: np.asarray(
        pc.cast(_word_membership_count(text, LANG_STOPWORDS[lang]), pa.int64())
    ) for lang in langs}
    mat = np.stack([hits[lang] for lang in langs])  # [lang, row]
    best = mat.argmax(axis=0)
    best_val = mat.max(axis=0)
    # tie → und: count how many langs reach the max
    ties = (mat == best_val).sum(axis=0)
    pred = np.where(
        (best_val > 0) & (ties == 1), np.asarray(langs, dtype=object)[best], "und"
    )
    return batch.append_column("lang_pred", pa.array(list(pred), pa.string()))


_ROLL_B = np.uint64(1_000_003)  # odd base → invertible mod 2^64


def fingerprints(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Document fingerprints: md5 content hash (cross-engine checkable,
    the oracle column) + a 64-bit polynomial rolling hash over words.

    The rolling hash is fully vectorized (round-2 rework of the per-word
    Python loop): h(doc) = Σ wordhash_i · B^(L-1-i) in uint64 wraparound
    arithmetic — per-word blake2b hashes come from the shared
    per-worker cache, powers of B are gathered by exponent and the
    per-document sums are one ``add.reduceat``. Batch-split invariant
    (asserted in pytest); md5 stays a per-row loop (no vectorized md5
    kernel exists — it is the oracle-checkable column, not the hot one).
    """
    from raylog.functions.dedup import _PROCESS_HASHER, _split_words

    text = _chunked(batch[text_col])
    md5 = pa.array([hashlib.md5(t.encode()).hexdigest() for t in text.to_pylist()])
    wh, offsets = _split_words(text, _PROCESS_HASHER)
    lens = offsets[1:] - offsets[:-1]
    if len(wh):
        with np.errstate(over="ignore"):  # uint64 wraparound is the spec
            max_len = int(lens.max())
            pow_b = np.empty(max_len, dtype=np.uint64)
            pow_b[0] = 1
            for i in range(1, max_len):
                pow_b[i] = pow_b[i - 1] * _ROLL_B
            pos = np.arange(len(wh), dtype=np.int64) - np.repeat(offsets[:-1], lens)
            exp = np.repeat(lens, lens) - 1 - pos
            terms = wh * pow_b[exp]
            roll = np.add.reduceat(terms, offsets[:-1]).astype(np.int64)
    else:
        roll = np.zeros(0, dtype=np.int64)
    return batch.append_column("fp_md5", md5).append_column(
        "fp_roll", pa.array(roll, pa.int64())
    )


def chunk_texts(batch: pa.Table, *, id_col: str = "doc_id",
                text_col: str = "text", size: int = 120,
                stride: int = 80) -> pa.Table:
    """RAG-style overlapping character chunking, one output row per
    chunk: chunk i covers ``[i*stride, i*stride + size)``; every doc
    with ≥1 char yields ``(n_chars-1)//stride + 1`` chunks.

    Fully vectorized — no Python loop over rows or chunks: the batch's
    strings are addressed through Arrow's flat UTF-8 buffer, chunk
    (start, length) arrays come from repeat/arange arithmetic, and the
    chunk bytes are ONE numpy gather re-wrapped as a StringArray via
    from_buffers. Byte slicing equals character slicing for ASCII
    corpora (the synthetic tables are ASCII); multi-byte corpora need a
    codepoint-offset pass first.
    """
    col = batch[text_col]
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_large_string(col.type):  # int64 offsets
        off_dtype = np.int64
    elif pa.types.is_string(col.type):  # int32 offsets
        off_dtype = np.int32
    else:
        raise TypeError(f"chunk_texts: {text_col} must be string/"
                        f"large_string, got {col.type}")
    off = np.frombuffer(col.buffers()[1], dtype=off_dtype)[
        col.offset: col.offset + len(col) + 1].astype(np.int64)
    data = np.frombuffer(col.buffers()[2] or b"", dtype=np.uint8)
    doc_start, doc_len = off[:-1], np.diff(off)

    n_chunks = np.where(doc_len > 0, (doc_len - 1) // stride + 1, 0)
    if int(n_chunks.sum()) == 0:  # every text empty → no chunks at all
        return pa.table({
            id_col: pa.array([], batch.schema.field(id_col).type),
            "chunk_idx": pa.array([], pa.int64()),
            "chunk": pa.array([], pa.utf8()),
            "chunk_len": pa.array([], pa.int64()),
        })
    doc_of = np.repeat(np.arange(len(doc_len)), n_chunks)
    chunk_base = np.concatenate([[0], np.cumsum(n_chunks)[:-1]])
    j = np.arange(int(n_chunks.sum())) - np.repeat(chunk_base, n_chunks)
    start = doc_start[doc_of] + j * stride
    clen = np.minimum(size, doc_len[doc_of] - j * stride)

    total = int(clen.sum())
    byte_base = np.concatenate([[0], np.cumsum(clen)[:-1]])
    gather = (np.arange(total) - np.repeat(byte_base, clen)
              + np.repeat(start, clen))
    out_off = np.concatenate([[0], np.cumsum(clen)]).astype(np.int32)
    chunks = pa.Array.from_buffers(
        pa.utf8(), len(clen),
        [None, pa.py_buffer(out_off.tobytes()),
         pa.py_buffer(data[gather].tobytes())],
    )
    ids = batch[id_col]
    ids = ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) else ids
    return pa.table({
        id_col: ids.take(pa.array(doc_of)),
        "chunk_idx": pa.array(j),
        "chunk": chunks,
        "chunk_len": pa.array(clen),
    })


def char_entropy(batch: pa.Table, id_col: str = "doc_id",
                 text_col: str = "text") -> pa.Table:
    """Per-document character-distribution signals (quality filtering:
    low-entropy docs are boilerplate/repetition, high modal-char docs
    are ASCII art / separators): Shannon entropy (bits), distinct-char
    count, modal-char frequency (per-mille, exact integer arithmetic).

    Vectorized: one segmented bincount over the Arrow flat UTF-8 buffer
    (doc_idx*128 + byte scatter), then row-wise ``n·log2 n`` sums on the
    (docs × 128) count matrix. ASCII corpora only (bytes == chars), same
    caveat as :func:`chunk_texts`.
    """
    col = batch[text_col]
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    off_dtype = np.int64 if pa.types.is_large_string(col.type) else np.int32
    off = np.frombuffer(col.buffers()[1], dtype=off_dtype)[
        col.offset: col.offset + len(col) + 1].astype(np.int64)
    data = np.frombuffer(col.buffers()[2] or b"", dtype=np.uint8)[
        off[0]:off[-1]]
    doc_len = np.diff(off)
    n = len(doc_len)
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), doc_len)
    counts = np.bincount(doc_idx * 128 + data, minlength=n * 128
                         ).reshape(n, 128)
    tot = doc_len.astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        snln = np.where(counts > 0,
                        counts * np.log2(np.maximum(counts, 1)), 0.0
                        ).sum(axis=1)
        ent = np.where(doc_len > 0, np.log2(np.maximum(tot, 1)) - snln / tot,
                       0.0)
    maxn = counts.max(axis=1)
    return (
        batch
        .append_column("entropy_milli", pa.array(
            np.floor(ent * 1000.0).astype(np.int64)))
        .append_column("n_distinct_chars", pa.array(
            (counts > 0).sum(axis=1).astype(np.int64)))
        .append_column("modal_char_milli", pa.array(
            np.where(doc_len > 0, (1000 * maxn) // np.maximum(doc_len, 1),
                     0).astype(np.int64)))
    )


def hash_classifier(batch: pa.Table, text_col: str = "text",
                    id_col: str = "doc_id") -> pa.Table:
    """Hashed-linear classifier INFERENCE (the fastText / CCNet
    quality-filter serving shape, minus the training pass): every word
    hashes to a fixed signed integer weight w = md5_32(word) % 2001 −
    1000 and a document's logit is the plain sum of its word weights;
    ``pred`` = logit > 0. All arithmetic is int64 — order-independent
    and bit-exact against the SQL oracle (a float dot product would
    drift with summation order). Per-batch cost: one md5 per DISTINCT
    word (``dictionary_encode``), one gather, one cumsum segment
    reduction. Broadcast-weight inference is map-only — zero exchange
    at any corpus size; a real trained weight table rides the same
    gather via ``ray.put`` (see enrich.py's broadcast-dim pattern)."""
    split = pc.split_pattern(_chunked(batch[text_col]), pattern=" ")
    flat = split.flatten().dictionary_encode()
    w_uniq = np.array(
        [int(hashlib.md5(u.encode()).hexdigest()[:8], 16) % 2001 - 1000
         for u in flat.dictionary.to_pylist()], dtype=np.int64)
    w = w_uniq[np.asarray(flat.indices, dtype=np.int64)]
    offs = np.asarray(split.offsets, dtype=np.int64)
    csum = np.concatenate([np.zeros(1, np.int64), np.cumsum(w)])
    sum_w = csum[offs[1:]] - csum[offs[:-1]]
    return pa.table({
        id_col: _chunked(batch[id_col]),
        "sum_w": pa.array(sum_w),
        "n_tok": pa.array(offs[1:] - offs[:-1]),
        "pred": pa.array((sum_w > 0).astype(np.int64)),
    })


def compression_ratio(batch: pa.Table, text_col: str = "text",
                      id_col: str = "doc_id",
                      level: int = 6,
                      flag_below_permille: int = 400) -> pa.Table:
    """zlib compression-ratio quality signal (the Gopher / FineWeb
    repetitiveness filter): highly repetitive or templated text
    compresses far below normal prose, so a low compressed/raw ratio
    flags low-quality docs. Integer outputs only
    (``ratio_permille = ⌊1000·comp/raw⌋``) — deterministic for a fixed
    zlib level. Per-row ``zlib.compress`` is a C call per doc (same
    budget class as the md5 fingerprint loop); map-only, zero exchange.
    DEFLATE isn't SQL-expressible, so this is a rows-only query backed
    by brute-force + known-repetitive/known-diverse pytest invariants."""
    import zlib

    text = _chunked(batch[text_col]).to_pylist()
    raw = np.fromiter((len(t.encode()) for t in text), np.int64, len(text))
    comp = np.fromiter(
        (len(zlib.compress(t.encode(), level)) for t in text),
        np.int64, len(text))
    ratio = np.where(raw > 0, (1000 * comp) // np.maximum(raw, 1), 1000)
    return pa.table({
        id_col: _chunked(batch[id_col]),
        "raw_len": pa.array(raw),
        "comp_len": pa.array(comp),
        "ratio_permille": pa.array(ratio.astype(np.int64)),
        "flag_repetitive": pa.array(
            (ratio < flag_below_permille).astype(np.int64)),
    })


def cdc_chunks(batch: pa.Table, text_col: str = "text",
               id_col: str = "doc_id", w: int = 3,
               mod: int = 8) -> pa.Table:
    """Content-defined chunking (the rolling-hash boundary rule behind
    CDC dedup storage and stable document splitting): a boundary falls
    after word i when the hash of the trailing ``w``-word window is
    ≡ 0 mod ``mod`` — so chunk boundaries move with CONTENT, not
    offsets, and an insertion only reshapes its local chunk (fixed-size
    chunking shifts every later boundary; cf. `chunk_texts`). Emits per
    doc: chunk count, longest chunk, word count. md5 per window
    position (same budget class as shingle generation); map-only."""
    split = pc.split_pattern(_chunked(batch[text_col]), pattern=" ")
    ids = _chunked(batch[id_col])
    n_chunks = np.zeros(len(ids), np.int64)
    longest = np.zeros(len(ids), np.int64)
    n_words = np.zeros(len(ids), np.int64)
    for r in range(len(ids)):
        words = split[r].as_py()
        n = len(words)
        n_words[r] = n
        cuts = [i for i in range(w, n + 1)
                if int(hashlib.md5(
                    " ".join(words[i - w:i]).encode()
                ).hexdigest()[:8], 16) % mod == 0]
        edges = [0] + cuts + ([n] if (not cuts or cuts[-1] != n) else [])
        lens = np.diff(np.array(edges, np.int64))
        n_chunks[r] = len(lens)
        longest[r] = int(lens.max()) if len(lens) else 0
    return pa.table({
        id_col: ids,
        "n_chunks": pa.array(n_chunks),
        "longest_chunk": pa.array(longest),
        "n_words": pa.array(n_words),
    })


def cdc_chunk_hashes(batch: pa.Table, text_col: str = "text",
                     id_col: str = "doc_id", w: int = 3,
                     mod: int = 8) -> pa.Table:
    """Chunk-store feed for CDC dedup: same boundary rule as
    :func:`cdc_chunks`, but emits one row per CHUNK with a 60-bit
    content hash (md5[:15] of the chunk's words) and its word length —
    what a dedup store keys on. Map-only; the downstream group-by
    chunk hash is the storage-dedup estimate."""
    split = pc.split_pattern(_chunked(batch[text_col]), pattern=" ")
    ids = _chunked(batch[id_col])
    out_id, out_hash, out_len = [], [], []
    for r in range(len(ids)):
        words = split[r].as_py()
        n = len(words)
        cuts = [i for i in range(w, n + 1)
                if int(hashlib.md5(
                    " ".join(words[i - w:i]).encode()
                ).hexdigest()[:8], 16) % mod == 0]
        edges = [0] + cuts + ([n] if (not cuts or cuts[-1] != n) else [])
        d = ids[r].as_py()
        for s, e in zip(edges[:-1], edges[1:]):
            out_id.append(d)
            out_hash.append(int(hashlib.md5(
                " ".join(words[s:e]).encode()).hexdigest()[:15], 16))
            out_len.append(e - s)
    return pa.table({
        id_col: pa.array(out_id, pa.int64()),
        "chash": pa.array(out_hash, pa.int64()),
        "clen": pa.array(out_len, pa.int64()),
    })


_RAKE_STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "on")


def rake_phrase_instances(batch: pa.Table, text_col: str = "text",
                          id_col: str = "doc_id") -> pa.Table:
    """RAKE candidate-phrase segmentation: a phrase instance is a
    maximal run of non-stopwords within one document. Emits one row
    per instance (doc_id, phrase, plen). The run discovery is a
    vectorized boundary pass over the flat word buffer; only the
    per-run string join is a Python loop (runs ≪ words, same budget
    class as the md5 loops)."""
    import numpy as np

    split = pc.split_pattern(_chunked(batch[text_col]), pattern=" ")
    ids = _chunked(batch[id_col])
    flat = split.flatten()
    offs = np.asarray(split.offsets, dtype=np.int64)
    stop = np.asarray(
        pc.is_in(flat, value_set=pa.array(_RAKE_STOPWORDS))
    ).astype(np.int64)
    n = len(flat)
    doc_of = np.repeat(np.arange(len(offs) - 1, dtype=np.int64),
                       np.diff(offs))
    # a run starts at a non-stop word preceded by a stopword or a doc
    # boundary
    nonstop = stop == 0
    prev_stop = np.ones(n, dtype=bool)
    if n > 1:
        prev_stop[1:] = (stop[:-1] == 1) | (doc_of[1:] != doc_of[:-1])
    starts = np.flatnonzero(nonstop & prev_stop)
    next_break = np.ones(n, dtype=bool)
    if n > 1:
        next_break[:-1] = (stop[1:] == 1) | (doc_of[1:] != doc_of[:-1])
    ends = np.flatnonzero(nonstop & next_break)
    words = flat.to_pylist()
    out_id, out_ph, out_len = [], [], []
    for s, e in zip(starts, ends):
        out_id.append(ids[int(doc_of[s])].as_py())
        out_ph.append(" ".join(words[s:e + 1]))
        out_len.append(int(e - s + 1))
    return pa.table({
        id_col: pa.array(out_id, pa.int64()),
        "phrase": pa.array(out_ph, pa.string()),
        "plen": pa.array(out_len, pa.int64()),
    })
