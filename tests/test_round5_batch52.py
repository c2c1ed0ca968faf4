"""Batch 52: RAKE keyphrases + rank fusion."""

import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _write(d, name, tbl):
    pq.write_table(tbl, os.path.join(d, f"{name}.parquet"))


def _docs(texts):
    return pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * len(texts)),
        "source": pa.array(["s"] * len(texts)),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })


def test_rake_segmentation_and_scores():
    from raylog.functions.text import rake_phrase_instances

    batch = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array([
            "deep learning of the neural network",
            "the quick fox",
        ]),
    })
    out = rake_phrase_instances(batch).to_pandas()
    got = list(zip(out.doc_id, out.phrase, out.plen))
    assert got == [
        (1, "deep learning", 2),
        (1, "neural network", 2),
        (2, "quick fox", 2),
    ]


def test_rake_degree_beats_frequency():
    from raylog.pipelines.queries_sources import text_rake_keyphrases

    # "red machine" appears once but its words co-occur in a long run;
    # "cat" appears alone many times -> deg/freq favors the phrase
    texts = (["red machine learning system"]  # one 4-word run
             + ["cat"] * 5)                   # five 1-word runs
    with tempfile.TemporaryDirectory() as d:
        _write(d, "documents", _docs(texts))
        got = text_rake_keyphrases(d).to_pandas()
    top = got.iloc[0]
    assert top.phrase == "red machine learning system"
    # each word: deg=4, freq=1 -> 4000 milli; phrase = 4 words = 16000
    assert top.score_milli == 16000
    cat = got[got.phrase == "cat"].iloc[0]
    assert cat.n_instances == 5 and cat.score_milli == 1000


def test_rake_stopword_only_doc_emits_nothing():
    from raylog.functions.text import rake_phrase_instances

    batch = pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "text": pa.array(["the a of to"]),
    })
    assert rake_phrase_instances(batch).num_rows == 0


def test_rank_fusion_competition_ranks():
    from raylog.pipelines.queries_sources import docs_rank_fusion

    # craft docs where length rank and logit rank disagree; verify the
    # fused ordering against a pandas RANK restatement
    rng = np.random.default_rng(31)
    words = [f"w{i}" for i in range(30)]
    texts = [" ".join(rng.choice(words, rng.integers(2, 20)))
             for _ in range(40)]
    tbl = _docs(texts)
    with tempfile.TemporaryDirectory() as d:
        _write(d, "documents", tbl)
        got = docs_rank_fusion(d).to_pandas()
    from raylog.functions.text import hash_classifier
    import pandas as pd

    w = hash_classifier(tbl)["sum_w"].to_numpy()
    nc = np.array([len(t) for t in texts])
    r1 = pd.Series(nc).rank(method="min", ascending=False).astype(int)
    r2 = pd.Series(w).rank(method="min", ascending=False).astype(int)
    fused = (r1 + r2).to_numpy()
    order = sorted(range(40), key=lambda i: (fused[i], i))[:20]
    assert list(got["doc_id"]) == order
    assert list(got["fused_rank"]) == [int(fused[i]) for i in order]
