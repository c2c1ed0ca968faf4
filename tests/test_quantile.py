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


class TestDDSketch:
    def test_relative_error_guarantee(self, ray_session):
        """Every DDSketch estimate is within alpha of the true
        percentile_disc value, on a heavy-tailed random fixture."""
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from raylog.functions.quantile import dd_value, grouped_quantile_sketch

        rng = np.random.default_rng(9)
        vals = np.exp(rng.normal(4, 2, 20_000))  # lognormal, wide range
        tbl = pa.table({
            "g": pa.array(["a" if i % 3 else "b" for i in range(len(vals))]),
            "v": pa.array(vals),
        })
        qs = [0.5, 0.9, 0.99]
        out = grouped_quantile_sketch(
            rd.from_arrow(tbl), group_cols=["g"], value_col="v", qs=qs,
            alpha=0.02, num_partitions=4).to_pandas()
        assert len(out) == 6
        df = tbl.to_pandas()
        for r in out.itertuples():
            sub = np.sort(df[df.g == r.g]["v"].to_numpy())
            true = sub[max(1, int(np.ceil(r.q_milli / 1000 * len(sub)))) - 1]
            est = dd_value(np.array([r.bucket]), 0.02)[0]
            assert abs(est - true) <= 0.02 * true * 1.0001, (r, est, true)

    def test_merge_invariance(self, ray_session):
        """The sketch over 32 blocks equals the sketch over one block —
        partial merge is exact reorganization."""
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from raylog.functions.quantile import grouped_quantile_sketch

        rng = np.random.default_rng(10)
        tbl = pa.table({
            "g": pa.array(["x"] * 5000),
            "v": pa.array(rng.integers(1, 10_000, 5000).astype("float64")),
        })
        kw = dict(group_cols=["g"], value_col="v", qs=[0.5, 0.95],
                  alpha=0.01, num_partitions=4)
        one = grouped_quantile_sketch(rd.from_arrow(tbl), **kw).to_pandas()
        many = grouped_quantile_sketch(
            rd.from_arrow(tbl).repartition(32), **kw).to_pandas()
        key = lambda d: sorted(map(tuple, d.to_numpy()))
        assert key(one) == key(many)
