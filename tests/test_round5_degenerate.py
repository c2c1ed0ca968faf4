"""Degenerate-input robustness for the round-5 batch 29-34 operators:
a fixture where NOTHING qualifies (no order above threshold, no 'F'
orders, no positive balances above average without orders, no ECONOMY
parts, no brand parts, a single one-word document, an empty event
stream). Every operator must return a typed (possibly empty) result
instead of crashing — this suite exists because Ray's hash-shuffle
join crashes on a fully-empty side and the first versions of these
operators did too (sentinel-row + typed-empty guards are the fix).
"""

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from raylog.pipelines.queries import QUERIES

_QUERIES = [
    ("orders_large_volume", 0),
    ("suppliers_kept_waiting", 0),
    ("top_supplier_revenue", 0),
    ("customers_sales_opportunity", 0),
    ("nation_market_share", 0),
    ("lineitem_small_qty_revenue", 1),   # scalar report: one zero row
    ("tokens_kn_continuation", 0),
    ("tokens_burstiness", 1),            # one token still counts
    ("tokens_split_boundary_audit", 1),  # source row with 0 pairs
    ("events_peak_concurrency", 0),
    ("events_concurrency_histogram", 0),
    ("dedup_graph_pagerank", 1),         # the single doc, floor rank
    ("dedup_graph_triangles", 1),        # all-zero report
]


@pytest.fixture(scope="module")
def degenerate_sf(tmp_path_factory):
    d = tmp_path_factory.mktemp("degenerate")
    t0 = dt.datetime(1990, 1, 1)
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1], pa.int64()),
        "l_suppkey": pa.array([1], pa.int64()),
        "l_quantity": pa.array([1.0]),
        "l_extendedprice": pa.array([5.0]),
        "l_discount": pa.array([0.0]),
        "l_partkey": pa.array([1], pa.int64()),
        "l_shipdate": pa.array([t0], pa.timestamp("us")),
    }), str(d / "lineitem.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1], pa.int64()),
        "o_custkey": pa.array([1], pa.int64()),
        "o_totalprice": pa.array([1.0]),
        "o_orderdate": pa.array([t0], pa.timestamp("us")),
        "o_orderstatus": pa.array(["O"]),
    }), str(d / "orders.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array([1], pa.int64()),
        "c_nationkey": pa.array([0], pa.int64()),
        "c_acctbal": pa.array([-5.0]),
        "c_name": pa.array(["C1"]),
    }), str(d / "customer.parquet"))
    pq.write_table(pa.table({
        "s_suppkey": pa.array([1], pa.int64()),
        "s_name": pa.array(["S1"]),
        "s_nationkey": pa.array([0], pa.int64()),
    }), str(d / "supplier.parquet"))
    pq.write_table(pa.table({
        "p_partkey": pa.array([1], pa.int64()),
        "p_brand": pa.array(["Brand#99"]),
        "p_type": pa.array(["LARGE"]),
    }), str(d / "part.parquet"))
    pq.write_table(pa.table({
        "n_nationkey": pa.array([0], pa.int64()),
        "n_name": pa.array(["NATION_2"]),
        "n_regionkey": pa.array([0], pa.int64()),
    }), str(d / "nation.parquet"))
    pq.write_table(pa.table({
        "r_regionkey": pa.array([0], pa.int64()),
        "r_name": pa.array(["ASIA"]),
    }), str(d / "region.parquet"))
    pq.write_table(pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "text": pa.array(["hello"]),
        "source": pa.array(["s"]),
    }), str(d / "documents.parquet"))
    pq.write_table(pa.table({
        "event_id": pa.array([], pa.int64()),
        "user_id": pa.array([], pa.int64()),
        "ts": pa.array([], pa.timestamp("us")),
    }), str(d / "events.parquet"))
    return str(d)


@pytest.mark.parametrize("name,want_rows", _QUERIES)
def test_degenerate_no_crash(name, want_rows, degenerate_sf,
                             ray_session):
    out = QUERIES[name](degenerate_sf)
    if hasattr(out, "to_pandas"):
        out = out.to_pandas()
    assert len(out) == want_rows, f"{name}: {len(out)} rows"
