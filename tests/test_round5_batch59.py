"""Batch 59: cross-method dedup agreement."""

import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_method_agreement_planted_overlap():
    from raylog.pipelines.queries_dedup import dedup_method_agreement

    # docs 0,1: exact duplicates (lexical pair) AND identical
    # embeddings (semantic pair) -> in both sets.
    # docs 2,3: different texts but identical embeddings -> semantic
    # only. docs 4..: unrelated texts, orthogonal-ish embeddings.
    texts = [
        " ".join(f"a{i}" for i in range(12)),
        " ".join(f"a{i}" for i in range(12)),
        " ".join(f"b{i}" for i in range(12)),
        " ".join(f"c{i}" for i in range(12)),
        " ".join(f"d{i}" for i in range(12)),
        " ".join(f"e{i}" for i in range(12)),
    ]
    # exactly orthogonal one-hot geometry: cross-cosines are 0 except
    # the two planted duplicate pairs (cosine exactly 1)
    dim = 8
    vecs = np.zeros((6, dim))
    vecs[0, 0] = vecs[1, 0] = 1.0   # semantic dup pair (0,1)
    vecs[2, 1] = vecs[3, 1] = 1.0   # semantic dup pair (2,3)
    vecs[4, 2] = 1.0                # singletons
    vecs[5, 3] = 1.0
    docs = pa.table({
        "doc_id": pa.array(np.arange(6, dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * 6),
        "source": pa.array(["s"] * 6),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    emb = pa.table({
        "vec_id": pa.array(np.arange(6, dtype=np.int64)),
        "embedding": pa.array([r.astype(np.float32) for r in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array(np.zeros(6, dtype=np.int32)),
    })
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(docs, os.path.join(d, "documents.parquet"))
        pq.write_table(emb, os.path.join(d, "embeddings.parquet"))
        got = dedup_method_agreement(d).to_pandas().iloc[0]
    assert got.n_ngram_pairs == 1          # (0,1) only
    assert got.n_embed_pairs == 2          # (0,1) and (2,3)
    assert got.n_both == 1                 # (0,1)
    assert got.agreement_permille == 1000 * 1 // 2


def test_merkle_fingerprint_order_insensitive_and_sensitive_to_content():
    from raylog.pipelines.queries_sources import docs_merkle_fingerprint

    import hashlib

    def docs(texts, order):
        t = [texts[i] for i in order]
        return pa.table({
            "doc_id": pa.array(np.arange(len(t), dtype=np.int64)),
            "text": pa.array(t),
            "lang": pa.array(["en"] * len(t)),
            "source": pa.array(["s"] * len(t)),
            "n_chars": pa.array([len(x) for x in t], pa.int64()),
        })

    texts = ["alpha", "beta", "gamma", "delta"]
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(docs(texts, [0, 1, 2, 3]),
                       os.path.join(d, "documents.parquet"))
        a = docs_merkle_fingerprint(d).to_pandas().iloc[0]
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(docs(texts, [3, 1, 0, 2]),
                       os.path.join(d, "documents.parquet"))
        b = docs_merkle_fingerprint(d).to_pandas().iloc[0]
    assert a.merkle_hex == b.merkle_hex  # row order irrelevant
    assert a.n_docs == 4
    # brute-force root
    leaves = sorted(hashlib.md5(t.encode()).hexdigest() for t in texts)
    assert a.merkle_hex == hashlib.md5(" ".join(leaves).encode()).hexdigest()
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(docs(["alpha", "beta", "gamma", "DELTA"],
                            [0, 1, 2, 3]),
                       os.path.join(d, "documents.parquet"))
        c = docs_merkle_fingerprint(d).to_pandas().iloc[0]
    assert c.merkle_hex != a.merkle_hex  # one changed byte flips root


def test_abc_classification_known_split():
    from raylog.pipelines.queries_marts import orders_abc_classification

    # revenues: 50, 30, 15, 4, 1 (total 100):
    # cum 50(A,<=80) 80(A,<=80) 95(B,<=95) 99(C) 100(C)
    tbl = pa.table({
        "o_custkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "o_totalprice": pa.array([50.0, 30.0, 15.0, 4.0, 1.0]),
    })
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(tbl, os.path.join(d, "orders.parquet"))
        got = (orders_abc_classification(d).to_pandas()
               .set_index("abc_class"))
    assert got.loc["A", "n_customers"] == 2
    assert got.loc["A", "share_permille"] == 800
    assert got.loc["B", "n_customers"] == 1
    assert got.loc["C", "n_customers"] == 2
    assert got["revenue_e4"].sum() == 100 * 10000


def test_user_growth_brute_force():
    from raylog.pipelines.queries_events import events_user_growth

    day_us = 86400 * 10**6
    user = [1, 2, 1, 3, 2, 4, 1]
    day = [0, 0, 3, 3, 5, 5, 5]
    tbl = pa.table({
        "user_id": pa.array(user, pa.int64()),
        "ts": pa.array(np.array([d * day_us for d in day],
                                dtype="datetime64[us]")),
    })
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(tbl, os.path.join(d, "events.parquet"))
        got = events_user_growth(d).to_pandas().set_index("day")
    assert got.loc[0, "new_users"] == 2      # users 1, 2
    assert got.loc[3, "new_users"] == 1      # user 3 (1 returns)
    assert got.loc[5, "new_users"] == 1      # user 4
    assert list(got["cumulative_users"]) == [2, 3, 4]
    # final cumulative equals total distinct users
    assert got["cumulative_users"].iloc[-1] == len(set(user))
