"""Edge-case tests for ``dedup_graph_pagerank`` (iterative distributed
SpMV over the exact near-dup graph, integer-exact fixed point)."""

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from raylog.pipelines.queries import ORACLES, QUERIES

E9 = 1_000_000_000


def _cmp(name, sf_dir, keys):
    out = QUERIES[name](sf_dir)
    if hasattr(out, "to_pandas"):
        out = out.to_pandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')")
    want = con.execute(ORACLES[name]).fetchdf()
    got = out.sort_values(keys).reset_index(drop=True)
    want = want.sort_values(keys).reset_index(drop=True)
    got = got[sorted(got.columns)]
    want = want[sorted(want.columns)]
    pd.testing.assert_frame_equal(
        got, want, check_dtype=False, check_exact=True)
    return got


def test_pagerank_regular_fixed_point_and_isolated(tmp_path,
                                                   ray_session):
    """Duplicate cliques (regular components) keep the uniform rank
    1e9 exactly — 2*(r//2) == r for even r — while an isolated doc
    decays to the teleport floor 0.15e9; matches the oracle bit-exact."""
    dup3 = "alpha beta gamma delta epsilon zeta"      # 3-clique (J=1)
    dup2 = "one two three four five six seven"        # 2-clique
    iso = "totally different words nothing shared at all"
    rows = [
        (0, dup3), (1, dup3), (2, dup3),
        (3, dup2), (4, dup2),
        (5, iso),
    ]
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "source": pa.array(["s"] * len(rows), pa.string()),
    }), str(tmp_path / "documents.parquet"))
    got = _cmp("dedup_graph_pagerank", str(tmp_path), ["rank"])
    by = got.set_index("doc_id")
    # regular components: the uniform vector is the exact fixed point
    for d in (0, 1, 2, 3, 4):
        assert by.loc[d, "pagerank_e9"] == E9
    assert by.loc[0, "degree"] == 2 and by.loc[3, "degree"] == 1
    # isolated doc: three teleport-only rounds -> 0.15 * 1e9
    assert by.loc[5, "pagerank_e9"] == 15 * E9 // 100
    assert by.loc[5, "degree"] == 0
    # deterministic tie-break: equal ranks order by doc_id
    assert list(got.sort_values("rank")["doc_id"]) == [0, 1, 2, 3, 4, 5]


def test_pagerank_hub_outranks_leaves(tmp_path, ray_session):
    """Degree asymmetry shows up in rank: a doc near-dup to TWO
    otherwise-unrelated docs outranks them."""
    # hub H shares >=0.3 trigram-Jaccard with A and with B; A and B
    # share nothing. H = A's grams + B's grams (concatenation).
    a = "red green blue cyan magenta"
    b = "dog cat fox wolf bear"
    hub = a + " " + b
    rows = [(0, a), (1, b), (2, hub)]
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "source": pa.array(["s"] * len(rows), pa.string()),
    }), str(tmp_path / "documents.parquet"))
    got = _cmp("dedup_graph_pagerank", str(tmp_path), ["rank"])
    by = got.set_index("doc_id")
    assert by.loc[2, "degree"] == 2
    assert by.loc[2, "pagerank_e9"] > by.loc[0, "pagerank_e9"]
    assert by.loc[0, "pagerank_e9"] == by.loc[1, "pagerank_e9"]


def test_triangles_clique_and_path(tmp_path, ray_session):
    """A 3-clique closes its one wedge-orbit (transitivity 1); a
    2-path stays open (0 triangles, 1 wedge)."""
    dup3 = "alpha beta gamma delta epsilon zeta"
    a = "red green blue cyan magenta"
    b = "dog cat fox wolf bear"
    hub = a + " " + b      # path a - hub - b, no (a,b) edge
    rows = [(0, dup3), (1, dup3), (2, dup3), (3, a), (4, b), (5, hub)]
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "source": pa.array(["s"] * len(rows), pa.string()),
    }), str(tmp_path / "documents.parquet"))
    got = _cmp("dedup_graph_triangles", str(tmp_path), ["n_edges"])
    r = got.iloc[0]
    # clique: 1 triangle, 3 wedges; path: 0 triangles, 1 wedge
    assert r["n_triangles"] == 1
    assert r["n_wedges"] == 4
    assert r["n_edges"] == 5
    assert r["transitivity_e6"] == 3_000_000 * 1 // 4


def test_graph_ops_edgeless_corpus(tmp_path, ray_session):
    """No near-dup pairs at all: PageRank puts every doc at the
    teleport floor, triangles report all zeros — both matching the
    oracle (regression: the empty edge set used to crash both)."""
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["aa bb cc dd ee", "ff gg hh ii jj"],
                         pa.string()),
        "source": pa.array(["s", "s"], pa.string()),
    }), str(tmp_path / "documents.parquet"))
    got = _cmp("dedup_graph_pagerank", str(tmp_path), ["rank"])
    assert (got["pagerank_e9"] == 150_000_000).all()
    assert (got["degree"] == 0).all()
    tri = _cmp("dedup_graph_triangles", str(tmp_path), ["n_edges"])
    assert tri.iloc[0].tolist() == [0, 0, 0, 0]
