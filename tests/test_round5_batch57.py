"""Batch 57: leakage-free target encoding + kNN label consistency."""

import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _write(d, name, tbl):
    pq.write_table(tbl, os.path.join(d, f"{name}.parquet"))


def test_target_encoding_excludes_own_fold():
    from raylog.pipelines.queries_events import events_target_encoding

    # type 'x': fold 0 rows (users 0,5) have value 10; fold 1 rows
    # (user 1) have value 40. Fold 0's encoding must be 40 (other
    # folds only), fold 1's must be 10.
    tbl = pa.table({
        "event_type": pa.array(["x"] * 4),
        "user_id": pa.array([0, 5, 1, 1], pa.int64()),
        "value": pa.array([10.0, 10.0, 40.0, 40.0]),
    })
    with tempfile.TemporaryDirectory() as d:
        _write(d, "events", tbl)
        got = (events_target_encoding(d).to_pandas()
               .set_index(["event_type", "fold"]))
    assert got.loc[("x", 0), "enc_mean_e4"] == 40_0000
    assert got.loc[("x", 1), "enc_mean_e4"] == 10_0000
    assert got.loc[("x", 0), "n_fold"] == 2


def test_target_encoding_single_fold_guard():
    from raylog.pipelines.queries_events import events_target_encoding

    tbl = pa.table({
        "event_type": pa.array(["only"]),
        "user_id": pa.array([0], pa.int64()),
        "value": pa.array([5.0]),
    })
    with tempfile.TemporaryDirectory() as d:
        _write(d, "events", tbl)
        got = events_target_encoding(d).to_pandas().iloc[0]
    assert got.enc_mean_e4 == -1  # no other folds to encode from


def test_knn_consistency_separable_clusters():
    from raylog.pipelines.queries_dedup import embed_knn_label_consistency

    rng = np.random.default_rng(12)
    # two well-separated gaussian clusters -> consistency 1000
    a = rng.normal(0, 0.05, (30, 8)) + np.array([1] + [0] * 7)
    b = rng.normal(0, 0.05, (30, 8)) + np.array([0, 1] + [0] * 6)
    mat = np.vstack([a, b]).astype(np.float32)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(60, dtype=np.int64)),
        "embedding": pa.array([r for r in mat], pa.list_(pa.float32())),
        "label": pa.array([0] * 30 + [1] * 30, pa.int32()),
    })
    with tempfile.TemporaryDirectory() as d:
        _write(d, "embeddings", tbl)
        got = (embed_knn_label_consistency(d).to_pandas()
               .set_index("label"))
    assert got.loc[0, "consistency_permille"] == 1000
    assert got.loc[1, "consistency_permille"] == 1000
    # scrambled labels on the same geometry cannot stay perfect
    tbl2 = tbl.set_column(2, "label",
                          pa.array(([0, 1] * 30), pa.int32()))
    with tempfile.TemporaryDirectory() as d:
        _write(d, "embeddings", tbl2)
        got2 = (embed_knn_label_consistency(d).to_pandas()
                .set_index("label"))
    assert (got2["consistency_permille"] < 1000).any()
