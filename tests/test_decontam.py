"""N-gram decontamination vs a brute-force set-overlap reference."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from raylog.functions.decontam import (
    _bipartite_pairs,
    decontam_ngram_report,
    gram_postings_batch,
)


def _table(tokens, evals, ids=None):
    ids = ids if ids is not None else list(range(len(tokens)))
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "is_eval": pa.array(evals, pa.bool_()),
        "tokens": pa.array(tokens, pa.list_(pa.int32())),
    })


def _grams(toks, n):
    return {
        tuple(t % 128 for t in toks[i:i + n])
        for i in range(len(toks) - n + 1)
    }


def _brute(tokens, evals, n):
    g = [_grams(t, n) for t in tokens]
    out = {}
    for i, (gi, ei) in enumerate(zip(g, evals)):
        if not ei:
            continue
        cnt = sum(
            1 for j, (gj, ej) in enumerate(zip(g, evals))
            if not ej and gi & gj
        )
        if cnt:
            out[i] = cnt
    return out


class TestGramPostings:
    def test_windows_never_cross_rows_and_distinct_per_doc(self):
        tbl = _table([[1, 2, 3, 1, 2, 3, 1, 2], [3, 1, 2], [1, 2, 3] * 4],
                     [True, False, False])
        out = gram_postings_batch(tbl, n=3).to_pandas()
        # doc 1 has exactly one 3-gram
        assert (out.doc_id == 1).sum() == 1
        # doc 2's rolling (1,2,3)/(2,3,1)/(3,1,2) repeat -> 3 distinct
        assert (out.doc_id == 2).sum() == 3
        # doc 0: 6 windows, (1,2,3) and (2,3,1) and (3,1,2) and (1,2) tail...
        got0 = set(out[out.doc_id == 0].gram)
        assert len(got0) == len({(1, 2, 3), (2, 3, 1), (3, 1, 2)})

    def test_mod_128_pack_handles_big_and_negative_tokens(self):
        tbl = _table([[1000, -5, 70000, 1000, -5, 70000]], [True])
        out = gram_postings_batch(tbl, n=3).to_pandas()
        assert len(out) > 0  # packs without overflow
        assert (out.gram >= 0).all()


class TestBipartitePairs:
    def test_cartesian_per_gram_and_edge_dedup(self):
        part = pa.table({
            "gram": pa.array([7, 7, 7, 7, 9, 9], pa.int64()),
            "doc_id": pa.array([1, 2, 10, 11, 1, 10], pa.int64()),
            "is_eval": pa.array([True, True, False, False, True, False]),
        })
        out = _bipartite_pairs(part).to_pandas()
        got = set(zip(out.eval_doc, out.train_doc))
        assert got == {(1, 10), (1, 11), (2, 10), (2, 11)}
        # gram 9 re-derives edge (1,10): deduped inside the partition
        assert len(out) == 4

    def test_no_eval_or_no_train_emits_nothing(self):
        part = pa.table({
            "gram": pa.array([1, 1, 2, 2], pa.int64()),
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "is_eval": pa.array([True, True, False, False]),
        })
        assert _bipartite_pairs(part).num_rows == 0


class TestDecontamReport:
    def test_matches_bruteforce_random(self, ray_session):
        rng = np.random.default_rng(23)
        tokens = [rng.integers(0, 6, rng.integers(0, 30)).tolist()
                  for _ in range(120)]
        evals = (rng.random(120) < 0.25).tolist()
        got = decontam_ngram_report(
            rd.from_arrow(_table(tokens, evals)).repartition(5), n=4
        ).to_pandas()
        want = _brute(tokens, evals, 4)
        assert dict(zip(got.doc_id, got.n_contaminating)) == want

    def test_hot_gram_counts_stay_exact(self, ray_session):
        # one universal gram shared by every doc: the distinct edge set
        # is the full eval x train bipartite graph
        hot = [5, 5, 5, 5]
        tokens = [hot + [int(i) + 10] for i in range(40)]
        evals = [i < 8 for i in range(40)]
        got = decontam_ngram_report(
            rd.from_arrow(_table(tokens, evals)).repartition(4), n=4
        ).to_pandas()
        assert len(got) == 8
        assert (got.n_contaminating == 32).all()
