"""Histogram-based exact quantiles vs DuckDB quantile_disc on random data."""

import duckdb
import numpy as np
import pyarrow as pa
import ray.data as rd

from raylog.functions.quantile import grouped_quantiles


def test_grouped_quantiles_many_keys_match_duckdb():
    rng = np.random.default_rng(5)
    n = 20000
    tbl = pa.table({
        "k": pa.array(rng.integers(0, 200, n)),
        "v": pa.array(rng.integers(0, 64, n)),
    })
    got = grouped_quantiles(
        rd.from_arrow(tbl).repartition(8), key="k", value="v",
        ps=[0.25, 0.5, 0.9, 0.99], out_names=["p25", "p50", "p90", "p99"],
        num_partitions=8,
    ).to_pandas().sort_values("k").reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", tbl)
    want = con.execute("""
        SELECT k, quantile_disc(v, 0.25) p25, quantile_disc(v, 0.5) p50,
               quantile_disc(v, 0.9) p90, quantile_disc(v, 0.99) p99
        FROM t GROUP BY k ORDER BY k""").fetchdf()
    for c in ["p25", "p50", "p90", "p99"]:
        assert got[c].tolist() == want[c].tolist(), c


def test_grouped_quantiles_single_value_groups():
    tbl = pa.table({"k": pa.array([1, 2, 2]), "v": pa.array([7, 3, 3])})
    got = grouped_quantiles(rd.from_arrow(tbl), key="k", value="v",
                            ps=[0.5], num_partitions=2).to_pandas()
    got = got.sort_values("k").reset_index(drop=True)
    assert got["p50"].tolist() == [7, 3]
