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


def fingerprints(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Document fingerprints: md5 content hash (cross-engine checkable) +
    a 64-bit polynomial rolling hash over words (engine-native)."""
    text = _chunked(batch[text_col])
    md5 = pa.array([hashlib.md5(t.encode()).hexdigest() for t in text.to_pylist()])
    split = pc.split_pattern(text, pattern=" ")
    roll = []
    MOD = (1 << 61) - 1
    B = 1_000_003

    def stable_word_hash(w: str) -> int:
        # process-stable (builtin hash() is salted per interpreter)
        return int.from_bytes(hashlib.blake2b(w.encode(), digest_size=8).digest(), "big")

    for words in split.to_pylist():
        h = 0
        for w in words:
            h = (h * B + stable_word_hash(w) % MOD) % MOD
        roll.append(h)
    return batch.append_column("fp_md5", md5).append_column(
        "fp_roll", pa.array(roll, pa.int64())
    )
