"""Containment pairs + semantic (embedding-CC) dedup survivors."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd


@pytest.fixture(scope="module")
def docs_ds(sf_dir):
    return rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])


def _brute_shingles(text: str, k: int = 3) -> set:
    w = text.split(" ")
    return {tuple(w[i:i + k]) for i in range(len(w) - k + 1)}


class TestContainmentPairs:
    def test_matches_brute_force_and_catches_subsets(self):
        from raylog.functions.dedup import ngram_containment_pairs

        base = "the quick brown fox jumps over the lazy dog near the river"
        long = base + " and then it ran far away across the wide green field tonight"
        docs = [
            (1, base),
            (2, long),                      # superset of doc 1
            (3, "completely different words about spark shuffle partitions"),
            (4, "completely different words about spark shuffle partitions"),
            (5, "unrelated short text here"),
        ]
        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array([d for d, _ in docs], pa.int64()),
            "text": pa.array([t for _, t in docs]),
        }))
        out = ngram_containment_pairs(ds, threshold=0.25).to_pandas()
        got = {(r.doc_a, r.doc_b): (r.cont_milli, r.jacc_milli)
               for r in out.itertuples()}

        # brute force over all pairs
        sh = {d: _brute_shingles(t) for d, t in docs}
        expect = {}
        ids = [d for d, _ in docs]
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                inter = len(sh[a] & sh[b])
                if inter == 0:
                    continue
                cont = inter / min(len(sh[a]), len(sh[b]))
                jacc = inter / len(sh[a] | sh[b])
                if cont >= 0.25:
                    expect[(a, b)] = (int(np.floor(1000 * cont)),
                                      int(np.floor(1000 * jacc)))
        assert got == expect
        # the subset pair is caught with full containment but low Jaccard
        assert got[(1, 2)][0] == 1000
        assert got[(1, 2)][1] < 600

    def test_jaccard_path_unchanged_by_refactor(self, docs_ds):
        """The shared _counted_shingle_pairs helper must leave the exact
        Jaccard output identical (guards the round-5 refactor)."""
        from raylog.functions.dedup import ngram_jaccard_pairs

        out = ngram_jaccard_pairs(docs_ds, threshold=0.3).to_pandas()
        assert len(out) > 0
        assert set(out.columns) == {"doc_a", "doc_b", "jacc_milli"}
        assert (out["jacc_milli"] >= 300).all()


class TestSemanticSurvivors:
    def _fixture(self):
        # three tight clusters + two outliers, unit-normalized rows
        rng = np.random.default_rng(7)
        centers = rng.normal(size=(3, 8))
        vecs, labels = [], []
        for ci in range(3):
            for _ in range(5):
                v = centers[ci] + rng.normal(scale=0.05, size=8)
                vecs.append(v)
                labels.append(ci)
        for _ in range(2):
            v = rng.normal(size=8)
            vecs.append(v)
            labels.append(9)
        vecs = np.asarray(vecs)
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        return vecs, np.asarray(labels, dtype=np.int32)

    def test_matches_brute_force_cc(self):
        from raylog.functions.dedup import semantic_dedup_survivors

        vecs, labels = self._fixture()
        n = len(vecs)
        ds = rd.from_arrow(pa.table({
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        }))
        thr = 0.9
        out = semantic_dedup_survivors(
            ds, keep_cols=["label"], threshold=thr, n_rows=n,
        ).to_pandas().sort_values("vec_id").reset_index(drop=True)

        # brute-force CC with union-find over float32-read vectors
        v32 = vecs.astype(np.float32).astype(np.float64)
        v32 /= np.linalg.norm(v32, axis=1, keepdims=True)
        sims = v32 @ v32.T
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for i in range(n):
            for j in range(i + 1, n):
                if sims[i, j] >= thr:
                    parent[find(i)] = find(j)
        comp = {}
        for i in range(n):
            comp.setdefault(find(i), []).append(i)
        expect = sorted((min(m), len(m)) for m in comp.values())
        got = sorted(zip(out["vec_id"], out["n_members"]))
        assert [(a, b) for a, b in got] == expect
        # representative labels survive the join
        lbl = dict(zip(range(n), labels))
        for r in out.itertuples():
            assert r.label == lbl[r.vec_id]
        # the three tight clusters collapse to one survivor each
        assert (out["n_members"] >= 5).sum() == 3


class TestEmptyInputs:
    """Round-5 operators must degrade to empty outputs, not crash."""

    def test_containment_empty(self):
        from raylog.functions.dedup import ngram_containment_pairs

        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array([], pa.int64()),
            "text": pa.array([], pa.string()),
        }))
        out = ngram_containment_pairs(ds).to_pandas()
        assert len(out) == 0

    def test_semantic_survivors_no_edges(self):
        from raylog.functions.dedup import semantic_dedup_survivors

        # orthogonal unit vectors: zero pairs -> every vector survives
        # as its own singleton component
        n, d = 4, 8
        vecs = np.eye(d)[:n]
        ds = rd.from_arrow(pa.table({
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float32())),
            "label": pa.array(np.zeros(n, dtype=np.int32), pa.int32()),
        }))
        out = semantic_dedup_survivors(
            ds, keep_cols=["label"], threshold=0.5, n_rows=n,
        ).to_pandas()
        assert sorted(out["vec_id"]) == list(range(n))
        assert (out["n_members"] == 1).all()

    def test_keep_best_singleton(self):
        # a fully empty corpus can't reach this operator (CC labels
        # every doc), and Ray's hash join loses the schema of an empty
        # dataset; the minimal real case is one singleton cluster
        from raylog.functions.cc import keep_best_per_cluster

        clusters = rd.from_arrow(pa.table({
            "doc_id": pa.array([5], pa.int64()),
            "cluster_id": pa.array([5], pa.int64()),
        }))
        scored = rd.from_arrow(pa.table({
            "doc_id": pa.array([5], pa.int64()),
            "score_milli": pa.array([700], pa.int64()),
        }))
        out = keep_best_per_cluster(scored, clusters).to_pandas()
        assert out.to_dict("records") == [
            {"cluster_id": 5, "doc_id": 5, "score_milli": 700,
             "n_members": 1}]

    def test_prefix_dedup_all_short(self):
        from raylog.functions.tokens import prefix_dedup_survivors

        # every doc shorter than k: all exempt, empty output
        tbl = pa.table({
            "doc_id": pa.array([1, 2], pa.int64()),
            "tokens": pa.array([[1, 2, 3], [4, 5]], pa.list_(pa.int32())),
            "n_tok": pa.array([3, 2], pa.int32()),
        })
        out = prefix_dedup_survivors(rd.from_arrow(tbl)).to_pandas()
        assert len(out) == 0
