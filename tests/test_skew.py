"""Skew-robustness: extreme key skew must not change results or blow up.

The engine's claim (SURVEY §4.3): because aggregation is per-batch
partial + tree combine, a hot `source` compresses to one row per batch
per key — reducer input is key-bounded, never row-bounded. Verified here
with a 90%-hot-source fixture: counts match a direct computation and the
hot key's share flows through exactly.
"""

import numpy as np
import pyarrow as pa
import ray.data as rd

from raylog.functions.agg import grouped_aggregate
from raylog.pipelines import log_pipeline as LP
from raylog.pipelines.fused import run_fused
from raylog.records import build_dim_table
from raylog.sources.synth import _chunk, synth_sources
import pyarrow.parquet as pq


def _skewed_table(n=30_000, hot_share=0.9, seed=99):
    t = _chunk(seed, 0, 0, n, n_sources=50)
    # overwrite sources: hot_share of rows land on one key
    rng = np.random.default_rng(seed)
    hot = rng.random(n) < hot_share
    cold = np.char.add("app-", np.char.zfill(
        rng.integers(1, 50, size=n).astype("U4"), 4))
    srcs = np.where(hot, "app-0000", cold)
    i = t.column_names.index("source")
    return t.set_column(i, "source", pa.array(list(srcs), pa.string()))


def test_extreme_skew_counts_exact(tmp_path):
    tbl = _skewed_table()
    path = str(tmp_path / "skew.parquet")
    pq.write_table(tbl, path, row_group_size=2_000)  # 15 row groups
    dim = build_dim_table(synth_sources(50))
    agg = run_fused([path], dim, None, concurrency=2)
    df = agg.to_pandas()

    # direct truth: container rows = rows whose source has no job tag
    hot_total = int((tbl["source"].to_pandas() == "app-0000").sum())
    got_hot = df[(df.source == "app-0000") & (df.sink == "container")].cnt.sum()
    # app-0000 has sid 0 → not a job/export source → all rows → container
    assert got_hot == hot_total
    assert df.cnt.sum() >= tbl.num_rows  # container+job cover all, export adds


def test_skewed_grouped_aggregate_matches_pandas(tmp_path):
    tbl = _skewed_table(n=20_000)
    path = str(tmp_path / "skew2.parquet")
    pq.write_table(tbl, path, row_group_size=1_000)  # 20 tiny groups
    ds = rd.read_parquet(path)
    got = grouped_aggregate(
        ds, ["source"], [("*", "count", "cnt"), ("n_tok", "sum", "tok")]
    ).to_pandas().set_index("source")
    want = tbl.to_pandas().groupby("source").agg(
        cnt=("n_tok", "size"), tok=("n_tok", "sum")
    )
    assert got["cnt"].to_dict() == want["cnt"].to_dict()
    assert {k: int(v) for k, v in got["tok"].to_dict().items()} == \
           {k: int(v) for k, v in want["tok"].to_dict().items()}
