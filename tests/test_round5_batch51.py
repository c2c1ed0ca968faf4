"""Batch 51: embedding isotropy, JL distortion, join advisor."""

import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _write(d, name, tbl):
    pq.write_table(tbl, os.path.join(d, f"{name}.parquet"))


def _emb_table(mat):
    return pa.table({
        "vec_id": pa.array(np.arange(len(mat), dtype=np.int64)),
        "embedding": pa.array([row.astype(np.float32) for row in mat],
                              pa.list_(pa.float32())),
        "label": pa.array(np.zeros(len(mat), dtype=np.int32)),
    })


def test_isotropy_identity_on_brute_force():
    from raylog.pipelines.queries_marts import embed_isotropy

    rng = np.random.default_rng(17)
    mat = rng.normal(0, 1, (60, 8)).astype(np.float32)
    with tempfile.TemporaryDirectory() as d:
        _write(d, "embeddings", _emb_table(mat))
        got = embed_isotropy(d).to_pandas().iloc[0]
    q = np.floor(1e5 * mat.astype(np.float64)).astype(object)
    n = len(mat)
    num = 0
    for i in range(n):
        for j in range(n):
            if i != j:
                num += int((q[i] * q[j]).sum())
    den = n * (n - 1) * 10_000
    assert got.n_vecs == n
    assert got.avg_pair_dot_micro == (num + 2_000_000 * den) // den - 2_000_000


def test_isotropy_detects_shared_direction():
    from raylog.pipelines.queries_marts import embed_isotropy

    rng = np.random.default_rng(2)
    centered = rng.normal(0, 1, (80, 8)).astype(np.float32)
    shifted = (centered + 5.0).astype(np.float32)  # strong common mean
    with tempfile.TemporaryDirectory() as d:
        _write(d, "embeddings", _emb_table(centered))
        a = embed_isotropy(d).to_pandas().iloc[0].avg_pair_dot_micro
    with tempfile.TemporaryDirectory() as d:
        _write(d, "embeddings", _emb_table(shifted))
        b = embed_isotropy(d).to_pandas().iloc[0].avg_pair_dot_micro
    # shifted cloud: avg pairwise dot ~ 8 * 25 = 200 >> centered ~ 0
    assert abs(a) < 2_000_000  # |avg dot| < 2 for centered gaussians
    assert b > 150_000_000


def test_jl_distortion_near_one_and_exact():
    from raylog.pipelines.queries_marts import _jl_signs, embed_jl_distortion

    rng = np.random.default_rng(4)
    mat = rng.normal(0, 1, (100, 64)).astype(np.float32)
    with tempfile.TemporaryDirectory() as d:
        _write(d, "embeddings", _emb_table(mat))
        got = embed_jl_distortion(d).to_pandas().iloc[0]
    assert got.n_pairs == 50
    # JL with K=16: ratios concentrate around 1e6 (unbiased estimator)
    assert 100_000 < got.avg_ratio_micro < 3_000_000
    # exact check of one pair against the kernel's definition
    q = np.floor(1e5 * mat.astype(np.float64)).astype(np.int64)
    sgn = _jl_signs(64)
    dq = q[0] - q[1]
    od2 = int((dq * dq).sum())
    dp = dq @ sgn
    pd2 = int((dp * dp).sum())
    r0 = (1_000_000 * pd2) // (16 * od2)
    assert got.min_ratio_micro <= r0 <= got.max_ratio_micro


def test_join_advisor_decisions():
    from raylog.pipelines.queries_marts import plan_join_advisor

    rng = np.random.default_rng(8)
    # orders⋈lineitem: small sides -> broadcast; make lineitem skewed
    # but still tiny so the broadcast rule fires first.
    orders = pa.table({
        "o_orderkey": pa.array(np.arange(30, dtype=np.int64)),
        "o_custkey": pa.array(rng.integers(0, 5, 30).astype(np.int64)),
    })
    li = pa.table({"l_orderkey": pa.array(
        np.concatenate([np.zeros(50, dtype=np.int64),
                        rng.integers(0, 30, 20).astype(np.int64)]))})
    cust = pa.table({"c_custkey": pa.array(np.arange(5, dtype=np.int64))})
    with tempfile.TemporaryDirectory() as d:
        _write(d, "orders", orders)
        _write(d, "lineitem", li)
        _write(d, "customer", cust)
        got = plan_join_advisor(d).to_pandas().set_index(
            ["left_table", "right_table"])
    assert (got["decision"] == "broadcast").all()  # everything tiny
    ol = got.loc[("orders", "lineitem")]
    assert ol.rows_left == 30 and ol.rows_right == 70
    assert ol.max_key_fanout >= 50
