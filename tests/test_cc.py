"""Connected components: multi-hop closure, singletons, survivors."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from raylog.functions.cc import connected_components, dedup_survivors


def _cc_ref(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return [find(i) for i in range(n_nodes)]


def test_cc_multi_hop_chain():
    # chain 0-1-2-3-4 plus pair (7,9): closure must label 4 with 0
    nodes = rd.from_arrow(pa.table({"doc_id": pa.array(range(10), pa.int64())}))
    edges = rd.from_arrow(pa.table({
        "doc_a": pa.array([0, 1, 2, 3, 7], pa.int64()),
        "doc_b": pa.array([1, 2, 3, 4, 9], pa.int64()),
    }))
    got = connected_components(nodes, edges, num_partitions=4).to_pandas()
    got = got.sort_values("doc_id").reset_index(drop=True)
    assert got["cluster_id"].tolist() == [0, 0, 0, 0, 0, 5, 6, 7, 8, 7]


def test_cc_random_graph_matches_union_find():
    rng = np.random.default_rng(3)
    n = 400
    m = 300
    a = rng.integers(0, n, size=m)
    b = rng.integers(0, n, size=m)
    keep = a != b
    a, b = a[keep], b[keep]
    nodes = rd.from_arrow(pa.table({"doc_id": pa.array(range(n), pa.int64())}))
    edges = rd.from_arrow(pa.table({
        "doc_a": pa.array(a, pa.int64()), "doc_b": pa.array(b, pa.int64()),
    })).repartition(4)
    got = connected_components(nodes, edges, num_partitions=4).to_pandas()
    got = got.sort_values("doc_id")["cluster_id"].tolist()
    assert got == _cc_ref(n, zip(a.tolist(), b.tolist()))


def test_dedup_survivors_keeps_min_id_per_cluster():
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "source": pa.array(list("abcde")),
    }))
    edges = rd.from_arrow(pa.table({
        "doc_a": pa.array([0, 3], pa.int64()),
        "doc_b": pa.array([1, 4], pa.int64()),
    }))
    clusters = connected_components(
        docs.select_columns(["doc_id"]), edges, num_partitions=2)
    out = dedup_survivors(docs, clusters).to_pandas()
    assert sorted(out["doc_id"].tolist()) == [0, 2, 3]


def test_cc_empty_edges_returns_singletons():
    nodes = rd.from_arrow(pa.table({"doc_id": pa.array(range(5), pa.int64())}))
    edges = rd.from_arrow(pa.table({
        "doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64()),
    }))
    got = connected_components(nodes, edges, num_partitions=2).to_pandas()
    got = got.sort_values("doc_id")
    assert got["cluster_id"].tolist() == [0, 1, 2, 3, 4]


def test_cc_raises_when_diameter_exceeds_max_iters():
    import pytest

    n = 12
    nodes = rd.from_arrow(pa.table({"doc_id": pa.array(range(n), pa.int64())}))
    edges = rd.from_arrow(pa.table({
        "doc_a": pa.array(range(n - 1), pa.int64()),
        "doc_b": pa.array(range(1, n), pa.int64()),
    }))
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(nodes, edges, num_partitions=2, max_iters=3)


def test_keep_best_per_cluster_prefers_score_over_min_id():
    from raylog.functions.cc import keep_best_per_cluster

    clusters = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 7, 9], pa.int64()),
        "cluster_id": pa.array([1, 1, 1, 7, 7], pa.int64()),
    }))
    scored = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 7, 9], pa.int64()),
        # doc 3 beats the min-id doc 1; cluster 7 ties -> min id 7 wins
        "score_milli": pa.array([500, 400, 900, 800, 800], pa.int64()),
    }))
    out = keep_best_per_cluster(scored, clusters).to_pandas()
    got = {r.cluster_id: (r.doc_id, r.score_milli, r.n_members)
           for r in out.itertuples()}
    assert got == {1: (3, 900, 3), 7: (7, 800, 2)}
