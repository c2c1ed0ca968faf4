"""Edge-case tests for the round-5 batch-29 operators:
``orders_large_volume`` (TPC-H Q18 shape), ``suppliers_kept_waiting``
(TPC-H Q21 shape) and ``tokens_kn_continuation`` (Kneser-Ney
continuation counts).

Tiny synthetic fixtures with deliberately nasty rows, Ray pipeline
cross-checked against DuckDB running the registered oracle SQL.
"""

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


def _write_mart(tmp_path, lineitem, orders, customer=None, supplier=None):
    pq.write_table(pa.table({
        "l_orderkey": pa.array([r[0] for r in lineitem], pa.int64()),
        "l_suppkey": pa.array([r[1] for r in lineitem], pa.int64()),
        "l_quantity": pa.array([float(r[2]) for r in lineitem],
                               pa.float64()),
        "l_shipdate": pa.array([r[3] for r in lineitem], pa.date32()),
    }), str(tmp_path / "lineitem.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([r[0] for r in orders], pa.int64()),
        "o_custkey": pa.array([r[1] for r in orders], pa.int64()),
        "o_totalprice": pa.array([float(r[2]) for r in orders],
                                 pa.float64()),
        "o_orderdate": pa.array([r[3] for r in orders], pa.date32()),
        "o_orderstatus": pa.array([r[4] for r in orders], pa.string()),
    }), str(tmp_path / "orders.parquet"))
    if customer is not None:
        pq.write_table(pa.table({
            "c_custkey": pa.array([r[0] for r in customer], pa.int64()),
            "c_name": pa.array([r[1] for r in customer], pa.string()),
        }), str(tmp_path / "customer.parquet"))
    if supplier is not None:
        pq.write_table(pa.table({
            "s_suppkey": pa.array([r[0] for r in supplier], pa.int64()),
            "s_name": pa.array([r[1] for r in supplier], pa.string()),
        }), str(tmp_path / "supplier.parquet"))
    return str(tmp_path)


import datetime as _dt

_D = _dt.date


def test_large_volume_threshold_boundary(tmp_path, ray_session):
    """Exactly-150 excluded (strict >), 151 included, sums span rows."""
    d = _D(2024, 1, 1)
    sf = _write_mart(
        tmp_path,
        lineitem=[
            # order 1: 100 + 50 = 150 -> excluded (boundary)
            (1, 1, 100, d), (1, 2, 50, d),
            # order 2: 100 + 51 = 151 -> included
            (2, 1, 100, d), (2, 2, 51, d),
            # order 3: single huge row
            (3, 1, 200, d),
            # order 4: many small rows, total 149 -> excluded
            *[(4, 1, 1, d) for _ in range(149)],
        ],
        orders=[(1, 10, 1000.005, d, "O"), (2, 11, 2000.115, d, "O"),
                (3, 10, 3000.0, d, "F"), (4, 11, 400.0, d, "O")],
        customer=[(10, "Customer#10"), (11, "Customer#11")],
    )
    got = _cmp("orders_large_volume", sf, ["o_orderkey"],
               ["lineitem", "orders", "customer"])
    assert sorted(got["o_orderkey"]) == [2, 3]
    row2 = got[got.o_orderkey == 2].iloc[0]
    assert row2["total_qty"] == 151 and row2["c_name"] == "Customer#11"
    assert row2["totalprice_e2"] == 200012  # *100+0.5 floor rounding


def test_kept_waiting_sole_late_rule(tmp_path, ray_session):
    """n_supp>=2 AND exactly one late supplier AND status='F' only."""
    d = _D(2024, 1, 1)
    late = _D(2024, 3, 15)   # 74 days after d -> late
    ontime = _D(2024, 2, 1)  # 31 days -> on time
    sf = _write_mart(
        tmp_path,
        lineitem=[
            # order 1: two suppliers, only supplier 1 late -> counts
            (1, 1, 5, late), (1, 2, 5, ontime),
            # order 2: two suppliers, BOTH late -> excluded
            (2, 1, 5, late), (2, 3, 5, late),
            # order 3: single supplier late -> excluded (n_supp==1)
            (3, 1, 5, late),
            # order 4: sole-late but order not 'F' -> excluded
            (4, 2, 5, late), (4, 3, 5, ontime),
            # order 5: supplier 2 late via its MAX ship date across two
            # lineitems (first on time, second late) -> counts
            (5, 2, 5, ontime), (5, 2, 5, late), (5, 3, 5, ontime),
        ],
        orders=[(1, 10, 1.0, d, "F"), (2, 10, 1.0, d, "F"),
                (3, 10, 1.0, d, "F"), (4, 10, 1.0, d, "O"),
                (5, 10, 1.0, d, "F")],
        supplier=[(1, "Supp#1"), (2, "Supp#2"), (3, "Supp#3")],
    )
    got = _cmp("suppliers_kept_waiting", sf, ["s_name"],
               ["lineitem", "orders", "supplier"])
    assert dict(zip(got["s_name"], got["numwait"])) == {
        "Supp#1": 1, "Supp#2": 1}


def test_kn_continuation_francisco_effect(tmp_path, ray_session):
    """A token frequent ONLY after one predecessor ranks below a rarer
    token with many distinct predecessors, and matches the oracle."""
    # tokens are word LENGTHS (the recs2 restatement): "bb" -> 2, etc.
    # token 9 appears 6x, always after token 3 -> n_cont(9) = 1.
    # token 2 appears 4x after 4 distinct predecessors -> n_cont(2) = 4.
    rows = []
    for i in range(6):
        rows.append((i, "ccc nnnnnnnnn"))          # 3 -> 9
    rows.append((6, "a bb"))                        # 1 -> 2
    rows.append((7, "ccc bb"))                      # 3 -> 2
    rows.append((8, "dddd bb"))                     # 4 -> 2
    rows.append((9, "eeeee bb"))                    # 5 -> 2
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "source": pa.array(["s"] * len(rows), pa.string()),
    }), str(tmp_path / "documents.parquet"))
    got = _cmp("tokens_kn_continuation", str(tmp_path), ["rank"],
               ["documents"])
    by_tok = dict(zip(got["token"], got["n_cont"]))
    assert by_tok[2] == 4 and by_tok[9] == 1
    # continuation ranking puts 2 above 9 despite 9's higher raw count
    r = dict(zip(got["token"], got["rank"]))
    assert r[2] < r[9]
