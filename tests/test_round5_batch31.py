"""Edge-case tests for the round-5 batch-31 operators:
``customers_sales_opportunity`` (TPC-H Q22 shape),
``top_supplier_revenue`` (TPC-H Q15 shape, ties kept) and
``tokens_split_boundary_audit`` (crawl split-document detector).
"""

import datetime as dt

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from raylog.pipelines.queries import ORACLES, QUERIES


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


def test_sales_opportunity_inactive_flag(tmp_path, ray_session):
    """Rich+inactive counted; negative balances excluded from the avg;
    exact integer boundary (bal*n == s is NOT above average)."""
    # positive balances: 100, 200, 300, 250 -> sum 850, n 4,
    # avg 212.5. cust 1 (100) and cust 2 (200): below. cust 3 (300):
    # above, HAS orders. cust 4 (-50): negative, excluded from the
    # avg and below it. cust 5 (250): above, NO orders -> inactive.
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "c_nationkey": pa.array([0, 0, 1, 1, 1], pa.int64()),
        "c_acctbal": pa.array([100.0, 200.0, 300.0, -50.0, 250.0],
                              pa.float64()),
    }), str(tmp_path / "customer.parquet"))
    pq.write_table(pa.table({
        "o_custkey": pa.array([3, 3, 1], pa.int64()),
    }), str(tmp_path / "orders.parquet"))
    got = _cmp("customers_sales_opportunity", str(tmp_path),
               ["c_nationkey"], ["customer", "orders"])
    by_nat = got.set_index("c_nationkey")
    assert 0 not in by_nat.index
    assert by_nat.loc[1, "n_cust"] == 2
    assert by_nat.loc[1, "n_inactive"] == 1
    assert by_nat.loc[1, "sum_bal_e2"] == 55000


def test_top_supplier_ties_all_kept(tmp_path, ray_session):
    d_in = dt.datetime(1996, 2, 1)
    d_out = dt.datetime(1996, 5, 1)
    pq.write_table(pa.table({
        "l_suppkey": pa.array([1, 2, 2, 3, 1], pa.int64()),
        "l_extendedprice": pa.array([100.0, 60.0, 40.0, 99.0, 500.0],
                                    pa.float64()),
        "l_discount": pa.array([0.0] * 5, pa.float64()),
        "l_shipdate": pa.array([d_in, d_in, d_in, d_in, d_out],
                               pa.timestamp("us")),
    }), str(tmp_path / "lineitem.parquet"))
    pq.write_table(pa.table({
        "s_suppkey": pa.array([1, 2, 3], pa.int64()),
        "s_name": pa.array(["S1", "S2", "S3"], pa.string()),
    }), str(tmp_path / "supplier.parquet"))
    got = _cmp("top_supplier_revenue", str(tmp_path), ["s_suppkey"],
               ["lineitem", "supplier"])
    # suppliers 1 and 2 tie at 100 inside the window (the 500 row is
    # outside); BOTH are returned
    assert sorted(got["s_name"]) == ["S1", "S2"]
    assert (got["total_revenue_e4"] == 1_000_000).all()


def test_split_boundary_detects_cut_document(tmp_path, ray_session):
    """A doc cut across two records matches; near-misses don't."""
    # tokens = word lengths. Build doc 0 whose last 8 lengths equal
    # doc 1's first 8 lengths (a split doc), and doc 2/3 with a
    # 7-of-8 near miss. Docs with <8 tokens are ineligible.
    tail = "a bb ccc dddd a bb ccc dddd"      # lengths 1 2 3 4 1 2 3 4
    rows = [
        (0, "x y z " + tail, "s0"),          # ends with the 8-gram
        (1, tail + " more words", "s0"),     # starts with the same
        (2, "q " + tail, "s1"),
        (3, "a bb ccc dddd a bb ccc x rest", "s1"),  # 8th differs
        (4, "tiny doc", "s1"),               # <8 tokens: ineligible
    ]
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "source": pa.array([r[2] for r in rows], pa.string()),
    }), str(tmp_path / "documents.parquet"))
    got = _cmp("tokens_split_boundary_audit", str(tmp_path),
               ["source"], ["documents"])
    by_src = got.set_index("source")
    assert by_src.loc["s0", "n_pairs"] == 1
    assert by_src.loc["s0", "n_matches"] == 1
    assert by_src.loc["s1", "n_pairs"] == 1   # pair (2,3); doc 4 out
    assert by_src.loc["s1", "n_matches"] == 0
