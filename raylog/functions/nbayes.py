"""Distributed multinomial Naive Bayes: train on a label column, score
the corpus — the count-based stand-in for model-based quality / domain
classifiers in training-data curation (FineWeb's fastText-style filters,
CCNet's LM filter). Unlike a learned neural scorer, every number here is
a corpus count, so the whole train+predict round trip has an exact SQL
restatement and rides the engine's aggregate machinery:

- **fit** — word-occurrence counts per (label, word) via the
  hash-partitioned distributed aggregate (`grouped_aggregate_ds` —
  exchange is vocab×labels-bounded partials, never rows), plus doc
  counts per label for the prior. The finished model (sorted vocab,
  [V, C] Laplace-smoothed log-likelihood matrix, log-priors) is
  labels×vocab-bounded and broadcast once via ``ray.put``.
- **predict** — actor pool; per batch: one ``searchsorted`` maps words
  to vocab rows, then C segment-sums (``np.add.reduceat`` over the
  flat per-word log-prob columns) score every doc against every class
  in one vectorized pass. Argmax with lexicographic label tie-break.

Reference analog: none (prompt-mandated training-data operator).
Multinomial NB per Manning/Raghavan/Schütze IR book §13.2.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from raylog.functions.agg import grouped_aggregate, grouped_aggregate_ds


def _word_count_partial(batch: pa.Table, text_col: str, label_col: str) -> pa.Table:
    """(label, word) occurrence-count partials, batch-vocab bounded.

    Identity resolution runs on Arrow dictionary CODES packed into one
    int key (label_code × vocab + word_code) — no per-occurrence Python
    strings, no object-array unique (the earlier string-key formulation
    cost ~20× on wide batches)."""
    split = batch[text_col].combine_chunks()
    split = pc.split_pattern(split, pattern=" ")
    split = split.combine_chunks() if isinstance(split, pa.ChunkedArray) else split
    offsets = np.asarray(split.offsets, dtype=np.int64)
    vals = split.values
    if split.offset or (len(offsets) and offsets[0]):
        vals = vals.slice(offsets[0], offsets[-1] - offsets[0])
    if len(vals) == 0:
        return pa.table({"label": pa.array([], pa.string()),
                         "word": pa.array([], pa.string()),
                         "cnt": pa.array([], pa.int64())})
    wd = vals.dictionary_encode()
    wcodes = np.asarray(wd.indices, dtype=np.int64)
    ld = batch[label_col].combine_chunks().dictionary_encode()
    lcodes = np.asarray(ld.indices, dtype=np.int64)
    lens = np.diff(offsets - offsets[0])
    nv = len(wd.dictionary)
    packed = np.repeat(lcodes, lens) * nv + wcodes
    uniq, cnt = np.unique(packed, return_counts=True)
    return pa.table({
        "label": ld.dictionary.take(pa.array(uniq // nv)),
        "word": wd.dictionary.take(pa.array(uniq % nv)),
        "cnt": pa.array(cnt.astype(np.int64)),
    })


class NBModel:
    """Frozen fitted model: sorted vocab + per-class log-probs."""

    def __init__(self, vocab: np.ndarray, loglik: np.ndarray,
                 logprior: np.ndarray, classes: list[str],
                 oov_loglik: np.ndarray):
        self.vocab = vocab            # sorted, [V] str
        self.loglik = loglik          # [V, C] float64
        self.logprior = logprior      # [C]
        self.classes = classes        # sorted label strings
        self.oov_loglik = oov_loglik  # [C] smoothing-only mass


def fit_nbayes(
    ds: rd.Dataset,
    *,
    text_col: str = "text",
    label_col: str = "lang",
    num_partitions: int = 16,
) -> NBModel:
    wc = grouped_aggregate_ds(
        ds.map_batches(lambda b: _word_count_partial(b, text_col, label_col),
                       batch_format="pyarrow", batch_size=None),
        ["label", "word"], [("cnt", "sum", "cnt")],
        num_partitions=num_partitions)
    wc_tbl = pa.concat_tables(
        wc.iter_batches(batch_format="pyarrow", batch_size=None),
        promote_options="default")  # vocab×labels-bounded by construction
    priors = grouped_aggregate(ds.select_columns([label_col]), [label_col],
                               [("*", "count", "n")])

    lab = np.asarray(wc_tbl["label"].to_pylist(), dtype=object)
    wrd = np.asarray(wc_tbl["word"].to_pylist(), dtype=object)
    cnt = wc_tbl["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    classes = sorted(set(priors[label_col].to_pylist()))
    cidx = {c: i for i, c in enumerate(classes)}
    vocab = np.unique(wrd.astype(str))
    V, C = len(vocab), len(classes)

    counts = np.zeros((V, C), dtype=np.int64)
    vi = np.searchsorted(vocab, wrd.astype(str))
    ci = np.array([cidx[l] for l in lab], dtype=np.int64)
    counts[vi, ci] = cnt
    tot = counts.sum(axis=0)                      # words per class
    loglik = np.log(counts + 1.0) - np.log(tot + float(V))[None, :]
    oov = -np.log(tot + float(V))
    n_docs = priors["n"].to_numpy(zero_copy_only=False).astype(np.float64)
    prior_order = np.array([cidx[l] for l in priors[label_col].to_pylist()])
    pr = np.zeros(C)
    pr[prior_order] = n_docs
    logprior = np.log(pr) - np.log(pr.sum())
    return NBModel(vocab, loglik, logprior, classes, oov)


class NBPredictor:
    """Actor-pool scorer: model from the object store once per actor."""

    def __init__(self, model_ref, text_col: str = "text",
                 out_col: str = "nb_pred"):
        self.m: NBModel = (ray.get(model_ref)
                           if isinstance(model_ref, ray.ObjectRef) else model_ref)
        self.text_col = text_col
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = self.m
        split = batch[self.text_col].combine_chunks()
        split = pc.split_pattern(split, pattern=" ")
        split = split.combine_chunks() if isinstance(split, pa.ChunkedArray) else split
        words = np.asarray(split.values.to_pylist(), dtype=str)
        offsets = np.asarray(split.offsets, dtype=np.int64)
        n_docs = len(offsets) - 1

        vi = np.searchsorted(m.vocab, words)
        vi_c = np.minimum(vi, len(m.vocab) - 1)
        known = (m.vocab[vi_c] == words) if len(m.vocab) else np.zeros(len(words), bool)
        C = len(m.classes)
        scores = np.tile(m.logprior, (n_docs, 1))   # [n_docs, C]
        starts = offsets[:-1]
        for c in range(C):
            per_word = np.where(known, m.loglik[vi_c, c], m.oov_loglik[c])
            if len(per_word):
                seg = np.add.reduceat(per_word, np.minimum(starts, len(per_word) - 1))
                seg[offsets[:-1] == offsets[1:]] = 0.0  # empty docs
                scores[:, c] += seg
        pred = np.argmax(scores, axis=1)            # ties → lowest index = lex-min label
        return batch.append_column(
            self.out_col,
            pa.array(np.asarray(m.classes, dtype=object)[pred], pa.string()))


def nbayes_classify(
    ds: rd.Dataset,
    *,
    text_col: str = "text",
    label_col: str = "lang",
    out_col: str = "nb_pred",
    concurrency: int = 2,
    num_partitions: int = 16,
) -> rd.Dataset:
    """Fit on ``ds``'s own labels, then score every row (self-train /
    label-audit mode — the curation use passes a separate labeled set)."""
    model = fit_nbayes(ds, text_col=text_col, label_col=label_col,
                       num_partitions=num_partitions)
    ref = ray.put(model) if ray.is_initialized() else model
    return ds.map_batches(
        NBPredictor,
        fn_constructor_kwargs={"model_ref": ref, "text_col": text_col,
                               "out_col": out_col},
        concurrency=concurrency, batch_format="pyarrow", batch_size=None)
