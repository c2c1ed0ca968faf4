"""Edge-case tests for the round-5 batch-30 operators:
``nation_market_share`` (TPC-H Q8 shape), ``lineitem_small_qty_revenue``
(TPC-H Q17 shape) and ``tokens_burstiness`` (Church-Gale cf/df).

Tiny synthetic fixtures with deliberately nasty rows, Ray pipeline
cross-checked against DuckDB running the registered oracle SQL.
"""

import datetime as dt

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from raylog.pipelines.queries import ORACLES, QUERIES

_D = dt.date


def _cmp(name, sf_dir, keys, tables):
    out = QUERIES[name](sf_dir)
    if hasattr(out, "to_pandas"):
        out = out.to_pandas()
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')")
    want = con.execute(ORACLES[name]).fetchdf()
    got = out.sort_values(keys).reset_index(drop=True)
    want = want.sort_values(keys).reset_index(drop=True)
    got = got[sorted(got.columns)]
    want = want[sorted(want.columns)]
    pd.testing.assert_frame_equal(
        got, want, check_dtype=False, check_exact=True)
    return got


def _write_q8(tmp_path):
    pq.write_table(pa.table({
        "r_regionkey": pa.array([0, 1], pa.int64()),
        "r_name": pa.array(["ASIA", "EUROPE"], pa.string()),
    }), str(tmp_path / "region.parquet"))
    pq.write_table(pa.table({
        "n_nationkey": pa.array([0, 1, 2], pa.int64()),
        "n_name": pa.array(["NATION_2", "NATION_OTHER", "NATION_EU"],
                           pa.string()),
        "n_regionkey": pa.array([0, 0, 1], pa.int64()),
    }), str(tmp_path / "nation.parquet"))
    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2], pa.int64()),
        "p_type": pa.array(["ECONOMY", "LARGE"], pa.string()),
    }), str(tmp_path / "part.parquet"))
    pq.write_table(pa.table({
        "s_suppkey": pa.array([1, 2], pa.int64()),
        "s_nationkey": pa.array([0, 1], pa.int64()),  # supp 1 = target
    }), str(tmp_path / "supplier.parquet"))
    pq.write_table(pa.table({
        # cust 1 in ASIA (target region), cust 2 in EUROPE
        "c_custkey": pa.array([1, 2], pa.int64()),
        "c_nationkey": pa.array([1, 2], pa.int64()),
    }), str(tmp_path / "customer.parquet"))
    d95, d96 = dt.datetime(1995, 6, 1), dt.datetime(1996, 6, 1)
    pq.write_table(pa.table({
        "o_orderkey": pa.array([10, 11, 12], pa.int64()),
        "o_custkey": pa.array([1, 1, 2], pa.int64()),
        "o_orderdate": pa.array([d95, d96, d95],
                                pa.timestamp("us")),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        # order 10 (1995, ASIA): target supp 60.0 + other supp 40.0
        # order 11 (1996, ASIA): other supp only
        # order 12 (1995, EUROPE cust): excluded entirely
        # non-ECONOMY part row: excluded at the scan
        "l_orderkey": pa.array([10, 10, 10, 11, 12], pa.int64()),
        "l_partkey": pa.array([1, 1, 2, 1, 1], pa.int64()),
        "l_suppkey": pa.array([1, 2, 1, 2, 1], pa.int64()),
        "l_extendedprice": pa.array([60.0, 40.0, 999.0, 10.0, 7.0],
                                    pa.float64()),
        "l_discount": pa.array([0.0, 0.0, 0.0, 0.0, 0.0], pa.float64()),
    }), str(tmp_path / "lineitem.parquet"))
    return str(tmp_path)


def test_market_share_region_and_part_filters(tmp_path, ray_session):
    sf = _write_q8(tmp_path)
    got = _cmp("nation_market_share", sf, ["yr"],
               ["region", "nation", "part", "supplier", "customer",
                "orders", "lineitem"])
    by_yr = got.set_index("yr")
    assert by_yr.loc[1995, "revenue_e4"] == 1_000_000      # 60 + 40
    assert by_yr.loc[1995, "nation_revenue_e4"] == 600_000  # target 60
    assert by_yr.loc[1995, "share_e6"] == 600_000
    assert by_yr.loc[1996, "nation_revenue_e4"] == 0


def test_small_qty_revenue_exact_boundary(tmp_path, ray_session):
    """qty == 0.2*avg is NOT below (strict <); integer test is exact."""
    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2], pa.int64()),
        "p_brand": pa.array(["Brand#13", "Brand#99"], pa.string()),
    }), str(tmp_path / "part.parquet"))
    # part 1: quantities 1, 9, 10, 20 -> sum 40, n 4, avg 10,
    # 0.2*avg = 2: only qty 1 qualifies (exact test 5*q*4 < 40).
    # qty 2 would sit exactly AT the boundary: 5*2*4 = 40, excluded.
    pq.write_table(pa.table({
        "l_partkey": pa.array([1, 1, 1, 1, 2], pa.int64()),
        "l_quantity": pa.array([1.0, 9.0, 10.0, 20.0, 1.0],
                               pa.float64()),
        "l_extendedprice": pa.array([100.005, 5.0, 5.0, 5.0, 777.0],
                                    pa.float64()),
    }), str(tmp_path / "lineitem.parquet"))
    got = _cmp("lineitem_small_qty_revenue", str(tmp_path), ["n_rows"],
               ["part", "lineitem"])
    assert got["n_rows"].iloc[0] == 1
    assert got["revenue_e2"].iloc[0] == 10001  # floor(100.005*100+.5)


def test_burstiness_bursty_vs_spread(tmp_path, ray_session):
    """cf==df for a spread token; cf>>df for a bursty one."""
    # token = word LENGTH. "bb" (2) appears once in each of 4 docs
    # (spread: cf=4, df=4). "ccc" (3) appears 6x inside ONE doc
    # (bursty: cf=6+..., df depends).
    rows = [
        (0, "bb ccc ccc ccc ccc ccc ccc"),
        (1, "bb a"),
        (2, "bb a"),
        (3, "bb a"),
    ]
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "source": pa.array(["s"] * len(rows), pa.string()),
    }), str(tmp_path / "documents.parquet"))
    got = _cmp("tokens_burstiness", str(tmp_path), ["rank"],
               ["documents"])
    by_tok = got.set_index("token")
    assert by_tok.loc[2, "cf"] == 4 and by_tok.loc[2, "df"] == 4
    assert by_tok.loc[2, "burstiness_e3"] == 1000
    assert by_tok.loc[3, "cf"] == 6 and by_tok.loc[3, "df"] == 1
    assert by_tok.loc[3, "burstiness_e3"] == 6000
