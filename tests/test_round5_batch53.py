"""Batch 53: front coding, clustering factor, group-aware split."""

import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _write(d, name, tbl):
    pq.write_table(tbl, os.path.join(d, f"{name}.parquet"))


def test_prefix_compression_brute_force():
    import hashlib

    from raylog.pipelines.queries_sources import docs_prefix_compression

    n = 120
    tbl = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(["x"] * n),
        "lang": pa.array(["en"] * n),
        "source": pa.array([f"src{i % 3}" for i in range(n)]),
        "n_chars": pa.array(np.ones(n, dtype=np.int64)),
    })
    with tempfile.TemporaryDirectory() as d:
        _write(d, "documents", tbl)
        got = docs_prefix_compression(d).to_pandas().iloc[0]
    # brute force
    urls = [
        "https://d%d.example.com/src%d/%d"
        % (int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 40,
           i % 3, i)
        for i in range(n)
    ]
    doms = [u.split("/")[2] for u in urls]
    total = sum(len(u) for u in urls)
    saved = 0
    for dom in set(doms):
        group = sorted(u for u, dm in zip(urls, doms) if dm == dom)
        for a, b in zip(group[1:], group[:-1]):
            l = 0
            while l < min(len(a), len(b)) and a[l] == b[l]:
                l += 1
            saved += l
    assert got.n_urls == n
    assert got.total_bytes == total
    assert got.saved_bytes == saved
    assert got.saved_permille == 1000 * saved // total


def test_clustering_factor_sorted_vs_shuffled():
    from raylog.pipelines.queries_stats import events_clustering_factor

    day_us = 86400 * 10**6
    n = 300
    rng = np.random.default_rng(6)
    # event_type clustered (sorted within the single day); user random
    et = np.sort(rng.choice(["a", "b", "c"], n))
    order = np.arange(n)
    tbl = pa.table({
        "event_type": pa.array(et),
        "user_id": pa.array(rng.integers(0, 100, n).astype(np.int64)),
        "ts": pa.array((order * 1000).astype("datetime64[us]")),
        "event_id": pa.array(order.astype(np.int64)),
    })
    with tempfile.TemporaryDirectory() as d:
        _write(d, "events", tbl)
        got = (events_clustering_factor(d).to_pandas()
               .set_index("column_name"))
    assert got.loc["event_type", "n_runs"] == 3  # perfectly clustered
    assert got.loc["event_type", "n_distinct"] == 3
    assert got.loc["user_id", "n_runs"] > 100  # unclustered
    assert (got["runs_permille"]
            == 1000 * got["n_runs"] // got["n_rows"]).all()


def test_groupaware_split_zero_leakage_and_whole_clusters():
    from raylog.pipelines.queries_dedup import dedup_groupaware_split

    # 3 exact-duplicate families (guaranteed near-dup clusters) + noise
    texts, fam = [], []
    for f in range(3):
        base = " ".join(f"w{f}_{i}" for i in range(12))
        for _ in range(4):
            texts.append(base)
            fam.append(f)
    for i in range(8):
        texts.append(" ".join(f"u{i}_{j}" for j in range(12)))
        fam.append(-1)
    tbl = pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * len(texts)),
        "source": pa.array(["s"] * len(texts)),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    with tempfile.TemporaryDirectory() as d:
        _write(d, "documents", tbl)
        got = dedup_groupaware_split(d).to_pandas()
    assert (got["n_leaked_pairs"] == 0).all()
    assert got["n_docs"].sum() == len(texts)
    # each duplicate family (4 docs, one cluster) sits whole in a fold
    assert got["n_clusters"].sum() == 3 + 8
