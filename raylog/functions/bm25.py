"""Distributed BM25 retrieval: score a small query set against the whole
corpus, return top-k docs per query.

The sparse-lexical sibling of the ANN operators (`similarity.py`): at
100 TB the corpus streams once, and only O(terms) statistics plus
O(k × queries × blocks) partial top-k rows ever move:

1. **stats pass** — one partial+tree aggregate produces, for the query
   terms only (a handful of strings), their document frequencies plus
   the corpus doc count and total word length (for avgdl). Nothing
   per-doc is exchanged.
2. **score pass** — stats broadcast; per batch, each query term's
   occurrences are counted per doc via one vectorized equality +
   bincount over the flat split-word buffer, the Robertson/Sparck-Jones
   BM25 formula (k1=1.2, b=0.75, Lucene's +1 idf floor) scores every
   doc against every query, and only each block's top-k per query
   survive (`functions/topk.py` pattern). The driver merge is
   k × queries × blocks — constant in corpus size.

Reference analog: none (prompt-mandated training-data/retrieval op).
BM25 per Robertson & Zaragoza 2009, §3.3.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from raylog.functions.agg import grouped_aggregate
from raylog.functions.topk import topk

K1 = 1.2
B = 0.75


def _split(batch_col):
    split = batch_col.combine_chunks() if isinstance(
        batch_col, pa.ChunkedArray) else batch_col
    split = pc.split_pattern(split, pattern=" ")
    return split.combine_chunks() if isinstance(split, pa.ChunkedArray) else split


def _term_stats_partial(batch: pa.Table, text_col: str,
                        terms: list[str]) -> pa.Table:
    split = _split(batch[text_col])
    flat = split.values
    offsets = np.asarray(split.offsets, dtype=np.int64)
    lens = offsets[1:] - offsets[:-1]
    n_docs = len(offsets) - 1
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
    rows = {"term": ["\x00corpus"], "df": [0],
            "dl_sum": [int(lens.sum())], "n_docs": [n_docs]}
    for t in terms:
        m = np.asarray(pc.equal(flat, t).fill_null(False)
                       .to_numpy(zero_copy_only=False))
        tf = np.bincount(doc_idx[m], minlength=n_docs)
        rows["term"].append(t)
        rows["df"].append(int((tf > 0).sum()))
        rows["dl_sum"].append(0)
        rows["n_docs"].append(0)
    return pa.table({
        "term": pa.array(rows["term"], pa.string()),
        "df": pa.array(rows["df"], pa.int64()),
        "dl_sum": pa.array(rows["dl_sum"], pa.int64()),
        "n_docs": pa.array(rows["n_docs"], pa.int64()),
    })


class BM25Scorer:
    """Actor-pool scorer; stats fetched once per actor."""

    def __init__(self, stats_ref, queries: list[tuple[int, list[str]]],
                 id_col: str = "doc_id", text_col: str = "text", k: int = 10):
        stats = (ray.get(stats_ref)
                 if isinstance(stats_ref, ray.ObjectRef) else stats_ref)
        self.df, self.n_docs, self.avgdl = stats
        self.queries = queries
        self.id_col, self.text_col, self.k = id_col, text_col, k
        self.idf = {
            t: float(np.log((self.n_docs - d + 0.5) / (d + 0.5) + 1.0))
            for t, d in self.df.items()
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        split = _split(batch[self.text_col])
        flat = split.values
        offsets = np.asarray(split.offsets, dtype=np.int64)
        lens = (offsets[1:] - offsets[:-1]).astype(np.float64)
        n_docs = len(offsets) - 1
        doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64),
                            lens.astype(np.int64))
        norm = K1 * (1.0 - B + B * lens / self.avgdl)

        tf_cache: dict[str, np.ndarray] = {}
        out_q, out_id, out_score = [], [], []
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        for qid, terms in self.queries:
            score = np.zeros(n_docs)
            for t in terms:
                tf = tf_cache.get(t)
                if tf is None:
                    m = np.asarray(pc.equal(flat, t).fill_null(False)
                                   .to_numpy(zero_copy_only=False))
                    tf = np.bincount(doc_idx[m], minlength=n_docs
                                     ).astype(np.float64)
                    tf_cache[t] = tf
                score += self.idf[t] * tf * (K1 + 1.0) / (tf + norm)
            top = np.argsort(-score, kind="stable")[: self.k]
            top = top[score[top] > 0.0]
            out_q.extend([qid] * len(top))
            out_id.extend(ids[top].tolist())
            out_score.extend(score[top].tolist())
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "doc_id": pa.array(out_id, pa.int64()),
            "score": pa.array(out_score, pa.float64()),
        })


def bm25_topk(
    ds: rd.Dataset,
    queries: list[tuple[int, list[str]]],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    concurrency: int = 2,
) -> pa.Table:
    """Top-k (query_id, doc_id, score, rnk) — ranks 1-based per query,
    ties broken by doc_id ascending."""
    terms = sorted({t for _, q in queries for t in q})
    stats_tbl = grouped_aggregate(
        ds.map_batches(lambda b: _term_stats_partial(b, text_col, terms),
                       batch_format="pyarrow", batch_size=None),
        ["term"],
        [("df", "sum", "df"), ("dl_sum", "sum", "dl_sum"),
         ("n_docs", "sum", "n_docs")])
    d = {r["term"]: r for r in stats_tbl.to_pylist()}
    corpus = d.pop("\x00corpus")
    n_docs = corpus["n_docs"]
    avgdl = corpus["dl_sum"] / max(n_docs, 1)
    stats = ({t: v["df"] for t, v in d.items()}, n_docs, avgdl)
    ref = ray.put(stats) if ray.is_initialized() else stats

    partials = ds.map_batches(
        BM25Scorer,
        fn_constructor_kwargs={"stats_ref": ref, "queries": queries,
                               "id_col": id_col, "text_col": text_col, "k": k},
        concurrency=concurrency, batch_format="pyarrow", batch_size=None)
    return topk(partials, sort_cols=["score", "doc_id"],
                descending=[True, False], k=k,
                group_cols=["query_id"], add_rank="rnk")
