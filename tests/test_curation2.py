"""Edge-case tests for decontamination, repetition signals and
temperature resampling — the kernels behind ``text_decontaminate``,
``text_repetition`` and ``sample_temperature``.

Each test writes a tiny synthetic ``documents.parquet`` with
deliberately nasty rows (empty text, single-word docs, exact snippet
inclusion) and cross-checks the Ray pipeline against DuckDB running the
registered oracle SQL — the same comparison the driver does, but on
inputs the driver fixture never produces.
"""

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from raylog.pipelines.queries import ORACLES, QUERIES


def _docs_fixture(tmp_path):
    long_pad = " ".join(["pad"] * 30)
    rows = [
        # doc 0 is an eval doc (0 % 97 == 0) with >= 40 chars
        (0, "unique eval snippet alpha beta gamma delta " + long_pad, "srcA"),
        # contains doc 0's 40-char prefix verbatim -> contaminated
        (1, "prefix " + ("unique eval snippet alpha beta gamma delta "
                         + long_pad)[:40] + " suffix", "srcA"),
        (2, "clean document with no overlap at all", "srcA"),
        (3, "word", "srcB"),             # single word: no bigrams
        (4, "", "srcB"),                 # empty text
        (5, "a a a a a", "srcB"),        # maximal repetition
        (6, "x y x y x y", "srcB"),      # repeated bigram
        # second eval doc (97 % 97 == 0)
        (97, "second eval snippet zeta eta theta iota kappa " + long_pad,
         "srcC"),
        (8, "totally different clean content here", "srcC"),
        (9, "more clean filler text for the sample", "srcC"),
    ]
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "source": pa.array([r[2] for r in rows], pa.string()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _oracle(name: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')")
    return con.execute(ORACLES[name]).fetchdf()


def _run(name: str, sf_dir: str) -> pd.DataFrame:
    out = QUERIES[name](sf_dir)
    if hasattr(out, "to_pandas"):
        out = out.to_pandas()
    return out


def _cmp(name, sf_dir, key):
    got = _run(name, sf_dir).sort_values(key).reset_index(drop=True)
    want = _oracle(name, sf_dir).sort_values(key).reset_index(drop=True)
    got = got[sorted(got.columns)]
    want = want[sorted(want.columns)]
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    return got


def test_decontaminate_edge_rows(tmp_path):
    d = _docs_fixture(tmp_path)
    got = _cmp("text_decontaminate", d, "doc_id")
    flags = dict(zip(got["doc_id"], got["contaminated"]))
    assert flags[0] and flags[97]       # eval docs contain themselves
    assert flags[1]                     # verbatim snippet inclusion
    assert not flags[2] and not flags[4]


def test_repetition_edge_rows(tmp_path):
    d = _docs_fixture(tmp_path)
    got = _cmp("text_repetition", d, "doc_id")
    by = {r.doc_id: r for r in got.itertuples()}
    assert by[3].n_words == 1 and by[3].top_bigram_n == 0
    # DuckDB string_split('', ' ') == [''] — one empty-string word
    assert by[4].n_words == 1 and by[4].n_distinct == 1
    assert by[5].n_words == 5 and by[5].n_distinct == 1
    assert by[5].top_word_n == 5 and by[5].dup_word_frac == 0.8
    assert by[6].top_bigram_n == 3      # "x y" occurs 3 times
    # repeated bigram doc: 'x y' 3, 'y x' 2


def test_temperature_sample_quota_and_determinism(tmp_path):
    import math

    d = _docs_fixture(tmp_path)
    got = _cmp("sample_temperature", d, "doc_id")
    sizes = got.groupby("source").size().to_dict()
    # quota_s = ceil(4*sqrt(n_s)) capped by n_s
    for s, n_s in {"srcA": 3, "srcB": 4, "srcC": 3}.items():
        assert sizes[s] == min(n_s, math.ceil(4 * math.sqrt(n_s)))
    again = _run("sample_temperature", d).sort_values("doc_id")
    assert list(again["doc_id"]) == list(got["doc_id"])  # deterministic


def test_temperature_flattens_skew(tmp_path):
    """A 10:1 skewed mix comes out flattened toward sqrt proportions."""
    import numpy as np

    n_hot, n_cold = 400, 40
    rng = np.random.default_rng(7)
    words = np.array(["w%d" % i for i in range(50)])
    texts = [" ".join(rng.choice(words, 12)) + f" id{i}"
             for i in range(n_hot + n_cold)]
    t = pa.table({
        "doc_id": pa.array(range(n_hot + n_cold), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "source": pa.array(["hot"] * n_hot + ["cold"] * n_cold),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    got = _cmp("sample_temperature", str(tmp_path), "doc_id")
    sizes = got.groupby("source").size()
    # input ratio 10:1 -> sampled ratio ~ sqrt(10):1 ≈ 3.16
    ratio = sizes["hot"] / sizes["cold"]
    assert 2.0 < ratio < 4.5, ratio


def test_lm_score_edges_and_ordering(tmp_path):
    """Repetitive docs (common words) must score LOWER nll than docs of
    rare words; empty text scores as the single '' token."""
    rows = [(i, "common common common common", "s") for i in range(8)]
    rows += [(100, "rare1 rare2 rare3 rare4", "s"), (101, "", "s")]
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "source": pa.array([r[2] for r in rows], pa.string()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    got = _cmp("text_lm_score", str(tmp_path), "doc_id")
    by = dict(zip(got["doc_id"], got["nll_micro"]))
    assert by[0] < by[100]          # common-word doc is "more likely"
    assert by[101] > 0              # '' token still scored


def test_tokenize_round_trip(tmp_path):
    """Encode is lossless: decoding (vocab[tok] per position) rebuilds
    every document exactly, including empty text and repeated words."""
    import numpy as np

    rows = [(0, "b a c a b", "s"), (1, "", "s"), (2, "zz", "s"),
            (3, "a a a", "s")]
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "source": pa.array([r[2] for r in rows], pa.string()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    got = _cmp("text_tokenize", str(tmp_path), ["doc_id", "pos"])
    # rebuild vocab as the oracle defines it (sorted distinct words)
    words = sorted({w for _, tx, _ in rows for w in tx.split(" ")})
    for did, tx, _ in rows:
        sub = got[got.doc_id == did].sort_values("pos")
        decoded = " ".join(words[t] for t in sub["tok"])
        assert decoded == tx, (did, decoded)


def test_source_overlap_disjoint_and_identical(tmp_path):
    """Identical vocabularies → jaccard 1000; fully disjoint pairs are
    ABSENT (inner-join semantics, matching the SQL oracle)."""
    rows = [(0, "alpha beta gamma", "sA"), (1, "alpha beta gamma", "sB"),
            (2, "delta epsilon", "sC")]
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "source": pa.array([r[2] for r in rows], pa.string()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    got = _cmp("corpus_source_overlap", str(tmp_path), ["src_a", "src_b"])
    by = {(r.src_a, r.src_b): r.jacc_milli for r in got.itertuples()}
    assert by[("sA", "sB")] == 1000
    assert ("sA", "sC") not in by and ("sB", "sC") not in by
