"""Batch 50: exact AUC, calibration bins, A/B conversion z-test."""

import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _write(d, name, tbl):
    pq.write_table(tbl, os.path.join(d, f"{name}.parquet"))


def _docs(texts, langs):
    return pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(langs),
        "source": pa.array(["s"] * len(texts)),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })


def test_auc_matches_sklearn_style_brute_force():
    from raylog.functions.text import hash_classifier
    from raylog.pipelines.queries_sources import text_classifier_auc

    rng = np.random.default_rng(13)
    words = [f"w{i}" for i in range(50)]
    texts = [" ".join(rng.choice(words, rng.integers(3, 12)))
             for _ in range(120)]
    langs = [("en" if rng.random() < 0.5 else "de") for _ in range(120)]
    tbl = _docs(texts, langs)
    with tempfile.TemporaryDirectory() as d:
        _write(d, "documents", tbl)
        got = text_classifier_auc(d).to_pandas().iloc[0]
    # brute-force tie-aware AUC: P(w_pos > w_neg) + 0.5 P(tie)
    w = hash_classifier(tbl)["sum_w"].to_numpy()
    y = np.array([1 if l == "en" else 0 for l in langs])
    pos, neg = w[y == 1], w[y == 0]
    gt = (pos[:, None] > neg[None, :]).sum()
    tie = (pos[:, None] == neg[None, :]).sum()
    auc = (gt + 0.5 * tie) / (len(pos) * len(neg))
    assert got.n_pos == y.sum()
    assert got.auc_micro == int(np.floor(1e6 * auc))


def test_calibration_bins_sum_to_total():
    from raylog.pipelines.queries_sources import text_classifier_calibration

    texts = ["alpha beta", "gamma", "alpha beta gamma delta", "x y z"]
    langs = ["en", "de", "en", "fr"]
    with tempfile.TemporaryDirectory() as d:
        _write(d, "documents", _docs(texts, langs))
        got = text_classifier_calibration(d).to_pandas()
    assert got["n_docs"].sum() == 4
    assert got["n_pos"].sum() == 2
    assert ((got["pos_permille"] >= 0) & (got["pos_permille"] <= 1000)).all()
    assert (got["pos_permille"]
            == 1000 * got["n_pos"] // got["n_docs"]).all()


def test_ab_conversion_known_counts():
    from raylog.pipelines.queries_events import events_ab_conversion

    # variant A (even users 0,2,4,6): converts 1 of 4
    # variant B (odd users 1,3,5,7):  converts 3 of 4
    rows_u, rows_v = [], []
    conv_a = {0}
    conv_b = {1, 3, 5}
    for u in range(8):
        rows_u += [u, u]
        high = (u in conv_a) or (u in conv_b)
        rows_v += [10.0, 400.0 if high else 20.0]
    tbl = pa.table({
        "user_id": pa.array(rows_u, pa.int64()),
        "value": pa.array(rows_v, pa.float64()),
    })
    with tempfile.TemporaryDirectory() as d:
        _write(d, "events", tbl)
        got = events_ab_conversion(d).to_pandas().iloc[0]
    assert (got.n_users_a, got.n_conv_a) == (4, 1)
    assert (got.n_users_b, got.n_conv_b) == (4, 3)
    p0, p1, pbar = 0.25, 0.75, 0.5
    z = (p1 - p0) / np.sqrt(pbar * 0.5 * (0.25 + 0.25))
    assert got.z_micro == int(np.floor(1e6 * z))


def test_ab_conversion_degenerate_all_convert():
    from raylog.pipelines.queries_events import events_ab_conversion

    tbl = pa.table({
        "user_id": pa.array([0, 1], pa.int64()),
        "value": pa.array([500.0, 500.0], pa.float64()),
    })
    with tempfile.TemporaryDirectory() as d:
        _write(d, "events", tbl)
        got = events_ab_conversion(d).to_pandas().iloc[0]
    assert got.z_micro == 0 and got.n_conv_a == 1 and got.n_conv_b == 1
