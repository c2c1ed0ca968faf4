"""Edge-case tests for the round-5 seventh-batch operators (the
analytics-mart module ``queries_marts``): streak gaps-and-islands,
trailing-window dedup, first-touch tie-breaks, YoY NULL semantics,
zero-vector norms and promo-free months.

Same contract as the other batch suites: tiny synthetic parquet with
deliberately nasty rows, Ray pipeline cross-checked against DuckDB
running the registered oracle SQL.
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
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    return got


def _write_events(tmp_path, rows):
    """rows: (event_id, ts_iso, user_id, event_type)"""
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([pd.Timestamp(r[1]) for r in rows],
                       pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_user_streaks_gaps_and_islands(tmp_path, ray_session):
    rows = [
        # user 1: days 1,2,3 then 5,6 -> max streak 3
        (1, "2024-01-01 08:00", 1, "a"), (2, "2024-01-02 09:00", 1, "a"),
        (3, "2024-01-03 10:00", 1, "a"), (4, "2024-01-05 11:00", 1, "a"),
        (5, "2024-01-06 12:00", 1, "a"),
        # user 2: two events SAME day (dedup to one) -> streak 1
        (6, "2024-01-10 01:00", 2, "b"), (7, "2024-01-10 23:00", 2, "b"),
        # user 3: isolated days far apart -> streak 1
        (8, "2024-01-01 00:00", 3, "c"), (9, "2024-01-20 00:00", 3, "c"),
        # user 4: 4-day run crossing a month boundary
        (10, "2024-01-30 05:00", 4, "d"), (11, "2024-01-31 05:00", 4, "d"),
        (12, "2024-02-01 05:00", 4, "d"), (13, "2024-02-02 05:00", 4, "d"),
    ]
    d = _write_events(tmp_path, rows)
    got = _cmp("events_user_streaks", d, ["max_streak"], ["events"])
    hist = dict(zip(got["max_streak"], got["n_users"]))
    assert hist == {3: 1, 1: 2, 4: 1}


def test_trailing_actives_window_dedup(tmp_path, ray_session):
    rows = [
        # user 1 fires 3 events on day 1 -> counts ONCE on every window
        (1, "2024-01-01 01:00", 1, "a"), (2, "2024-01-01 02:00", 1, "a"),
        (3, "2024-01-01 03:00", 1, "a"),
        # user 2 active day 1 and day 5 -> still one distinct user in the
        # day-5 window even though two activity days fall inside it
        (4, "2024-01-01 04:00", 2, "b"), (5, "2024-01-05 04:00", 2, "b"),
        # day 9: outside user 1's 7-day reach (day 1+6=7) but inside
        # user 2's day-5 coverage
        (6, "2024-01-09 00:00", 3, "c"),
    ]
    d = _write_events(tmp_path, rows)
    got = _cmp("events_trailing_actives", d, ["day"], ["events"])
    per_day = dict(zip(got["day"], got["actives_7d"]))
    # observed days only: 01, 05, 09
    assert per_day == {"2024-01-01": 2, "2024-01-05": 2, "2024-01-09": 2}


def test_first_touch_tiebreak(tmp_path, ray_session):
    rows = [
        # user 1: two events at the IDENTICAL timestamp; event_id breaks
        # the tie -> first touch is type "signup" (eid 1 < eid 2)
        (2, "2024-01-01 00:00:00", 1, "click"),
        (1, "2024-01-01 00:00:00", 1, "signup"),
        # user 2: later-id event arrives earlier in time -> time wins
        (9, "2024-01-01 00:00:00", 2, "signup"),
        (3, "2024-01-02 00:00:00", 2, "click"),
        # user 3: single event
        (4, "2024-01-03 00:00:00", 3, "click"),
    ]
    d = _write_events(tmp_path, rows)
    got = _cmp("events_first_touch", d, ["event_type"], ["events"])
    n = dict(zip(got["event_type"], got["n_users"]))
    assert n == {"signup": 2, "click": 1}
    share = dict(zip(got["event_type"], got["share_milli"]))
    assert share == {"signup": 666, "click": 333}


def test_yoy_growth_first_year_null(tmp_path, ray_session):
    t = pa.table({
        "o_orderdate": pa.array([pd.Timestamp(x) for x in
                                 ["1995-03-01", "1995-07-01",
                                  "1996-01-01", "1998-06-01"]],
                                pa.timestamp("us")),
        "o_totalprice": pa.array([100.005, 200.0, 450.0, 90.0],
                                 pa.float64()),
    })
    pq.write_table(t, str(tmp_path / "orders.parquet"))
    got = _cmp("orders_yoy_growth", str(tmp_path), ["year"], ["orders"])
    got = got.set_index("year")
    # 100.005 quantizes as floor(10000.5 + 0.5) = 10001 cents
    assert int(got.loc[1995, "revenue_cents"]) == 10001 + 20000
    assert pd.isna(got.loc[1995, "yoy_milli"])      # no prior year
    assert int(got.loc[1996, "yoy_milli"]) == 1000 * 45000 // 30001
    # 1997 has no orders: 1998 compares against the PREVIOUS PRESENT
    # year (LAG over existing rows), not a zero-filled 1997
    assert int(got.loc[1998, "yoy_milli"]) == 1000 * 9000 // 45000


def test_embed_norm_audit_zero_vector(tmp_path, ray_session):
    t = pa.table({
        "label": pa.array([0, 0, 1], pa.int32()),
        "embedding": pa.array([[0.0, 0.0], [3.0, 4.0], [1.5, -2.5]],
                              pa.list_(pa.float32())),
    })
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))
    got = _cmp("embed_norm_audit", str(tmp_path), ["label"],
               ["embeddings"]).set_index("label")
    assert int(got.loc[0, "min_ssq_e6"]) == 0          # the zero vector
    assert int(got.loc[0, "max_ssq_e6"]) == 25_000_000  # 3-4-5 triangle
    assert int(got.loc[1, "sum_ssq_e6"]) == 2_250_000 + 6_250_000


def test_promo_share_zero_promo_month(tmp_path, ray_session):
    part = pa.table({
        "p_partkey": pa.array([1, 2], pa.int64()),
        "p_type": pa.array(["PROMO", "STANDARD"], pa.string()),
    })
    pq.write_table(part, str(tmp_path / "part.parquet"))
    li = pa.table({
        "l_partkey": pa.array([1, 2, 2], pa.int64()),
        "l_extendedprice": pa.array([100.0, 50.0, 80.0], pa.float64()),
        "l_discount": pa.array([0.1, 0.0, 0.05], pa.float64()),
        "l_shipdate": pa.array([pd.Timestamp(x) for x in
                                ["1995-01-10", "1995-01-20",
                                 "1995-02-01"]], pa.timestamp("us")),
    })
    pq.write_table(li, str(tmp_path / "lineitem.parquet"))
    got = _cmp("lineitem_promo_share", str(tmp_path), ["month"],
               ["part", "lineitem"]).set_index("month")
    # Feb has only non-promo revenue -> exact 0 share
    assert int(got.loc["1995-02", "promo_share_milli"]) == 0
    assert int(got.loc["1995-02", "promo_e4"]) == 0
    # Jan: promo 100*0.9=90 -> 900000 e4; total 900000+500000
    assert int(got.loc["1995-01", "promo_share_milli"]) == (
        1000 * 900000 // 1400000)


def test_ship_delay_negative_and_bands(tmp_path, ray_session):
    orders = pa.table({
        "o_orderkey": pa.array([1, 2], pa.int64()),
        "o_orderdate": pa.array([pd.Timestamp("1995-06-10")] * 2,
                                pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT", "2-HIGH"], pa.string()),
    })
    pq.write_table(orders, str(tmp_path / "orders.parquet"))
    li = pa.table({
        "l_orderkey": pa.array([1, 1, 1, 1, 2], pa.int64()),
        "l_shipdate": pa.array([pd.Timestamp(x) for x in
                                ["1995-06-05",   # early (-5)
                                 "1995-06-10",   # fast (0)
                                 "1995-06-17",   # fast (7)
                                 "1995-07-15",   # late (35)
                                 "1995-06-25"]], # normal (15)
                               pa.timestamp("us")),
    })
    pq.write_table(li, str(tmp_path / "lineitem.parquet"))
    got = _cmp("lineitem_ship_delay", str(tmp_path), ["o_orderpriority"],
               ["orders", "lineitem"]).set_index("o_orderpriority")
    r = got.loc["1-URGENT"]
    assert (int(r.n_early), int(r.n_fast), int(r.n_normal),
            int(r.n_late)) == (1, 2, 0, 1)
    assert int(r.min_delay) == -5 and int(r.max_delay) == 35
    r2 = got.loc["2-HIGH"]
    assert int(r2.n_normal) == 1 and int(r2.min_delay) == 15


def test_readability_degenerate_docs(tmp_path, ray_session):
    rows = [
        (1, "a.", "en"),                       # 1 word, tiny
        (2, "The cat sat on the mat.", "en"),
        (3, "", "en"),                          # empty: 1 word, 0 letters
        (4, "x" * 300, "en"),                   # one giant word, no dot
    ]
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array([r[2] for r in rows], pa.string()),
        "source": pa.array(["s"] * len(rows), pa.string()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    got = _cmp("docs_readability", str(tmp_path), ["source"],
               ["documents"])
    assert int(got.loc[0, "n_docs"]) == 4


def test_cluster_quality_two_tight_clusters(tmp_path, ray_session):
    import numpy as np
    rng = np.random.default_rng(7)
    a = rng.normal(0, 0.01, (40, 4)) + np.array([1, 0, 0, 0])
    b = rng.normal(0, 0.01, (40, 4)) + np.array([-1, 0, 0, 0])
    c = rng.normal(0, 0.01, (40, 4)) + np.array([0, 5, 0, 0])
    t = pa.table({
        "label": pa.array([0] * 40 + [1] * 40 + [2] * 40, pa.int32()),
        "embedding": pa.array(
            np.vstack([a, b, c]).astype(np.float32).tolist(),
            pa.list_(pa.float32())),
    })
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))
    got = _cmp("embed_cluster_quality", str(tmp_path), ["label"],
               ["embeddings"]).set_index("label")
    # 0 and 1 are mutually nearest (sep ~4); 2 is far from both
    assert int(got.loc[0, "nearest_label"]) == 1
    assert int(got.loc[1, "nearest_label"]) == 0
    # tight clusters: cohesion ~ 4 dims * 1e-4 var * 1000 ≈ 0
    assert int(got.loc[0, "cohesion_milli"]) <= 1
    # sep(0,1) ≈ 2² = 4.0 → ~4000 milli
    assert 3800 <= int(got.loc[0, "sep_milli"]) <= 4200


def test_winsorized_clamps_outlier(tmp_path, ray_session):
    import numpy as np
    # 19 normal values + 1 extreme outlier; the winsorized mean must sit
    # near the bulk while the raw mean would be dragged far right
    vals = [10.0] * 10 + [20.0] * 9 + [100000.0]
    rows = list(range(len(vals)))
    t = pa.table({
        "event_id": pa.array(rows, pa.int64()),
        "ts": pa.array([pd.Timestamp("2024-01-01")] * len(vals),
                       pa.timestamp("us")),
        "user_id": pa.array(rows, pa.int64()),
        "event_type": pa.array(["click"] * len(vals), pa.string()),
        "value": pa.array(vals, pa.float64()),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))
    got = _cmp("events_value_winsorized", str(tmp_path), ["event_type"],
               ["events"]).set_index("event_type")
    r = got.loc["click"]
    assert int(r.hi_e4) == 200000       # p95 = a real element (20.0)
    assert int(r.lo_e4) == 100000
    # clamped sum: 10*100000 + 10*200000 = 3_000_000 over 20 rows
    assert int(r.wins_mean_e4) == 150000


def test_ab_lift_parity_split(tmp_path, ray_session):
    rows = [
        # even users 0,2: one converts; odd users 1,3: both convert
        (1, "2024-01-01", 0, "purchase"), (2, "2024-01-01", 0, "click"),
        (3, "2024-01-01", 2, "view"),
        (4, "2024-01-01", 1, "purchase"), (5, "2024-01-01", 3, "purchase"),
        (6, "2024-01-01", 3, "purchase"),   # double purchase: still 1 user
    ]
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([pd.Timestamp(r[1]) for r in rows],
                       pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([1.0] * len(rows), pa.float64()),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))
    got = _cmp("events_ab_lift", str(tmp_path), ["variant"],
               ["events"]).set_index("variant")
    assert int(got.loc[0, "n_users"]) == 2
    assert int(got.loc[0, "n_converted"]) == 1
    assert int(got.loc[0, "cvr_milli"]) == 500
    assert int(got.loc[1, "n_converted"]) == 2
    assert int(got.loc[1, "cvr_milli"]) == 1000


def _write_docs(tmp_path, rows):
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array(["en"] * len(rows), pa.string()),
        "source": pa.array(["s"] * len(rows), pa.string()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_canonical_dedup_collapses_variants(tmp_path, ray_session):
    rows = [
        (1, "The Quick Brown Fox."),
        (2, "the quick  brown fox"),     # case + double space + no dot
        (3, "  THE QUICK BROWN FOX!!  "), # shouting + trailing space
        (4, "a different document"),
        (5, "A, different; document?"),   # punctuation drift of 4
        (6, "genuinely unique text"),
    ]
    d = _write_docs(tmp_path, rows)
    got = _cmp("dedup_canonical", d, ["doc_id"], ["documents"])
    members = dict(zip(got["doc_id"], got["n_members"]))
    assert members == {1: 3, 4: 2, 6: 1}


def test_editdist_pairs_blocking_and_distance(tmp_path, ray_session):
    base = "shared sixteench "  # 17 chars: first 16 identical
    rows = [
        (1, base + "hello world example text"),
        (2, base + "hello w0rld example text"),   # 1 substitution
        (3, base + "hello world exampel text"),   # transposition = 2 edits
        (4, base + "x" * 40),                     # same block, len diff > 4
        (5, "different prefix here yes", ),       # other block
        (6, base + "hello world example tex"),    # 1 deletion vs doc 1
    ]
    rows = [(i, t if isinstance(t, str) else t[0]) for i, t in
            [(r[0], r[1]) for r in rows]]
    d = _write_docs(tmp_path, rows)
    got = _cmp("dedup_editdist_pairs", d, ["doc_a", "doc_b"],
               ["documents"])
    pairs = {(a, b): dd for a, b, dd in
             zip(got["doc_a"], got["doc_b"], got["dist"])}
    assert pairs[(1, 2)] == 1
    assert pairs[(1, 6)] == 1
    assert pairs[(2, 6)] == 2
    assert (1, 4) not in pairs          # length band excludes
    assert all(5 not in p for p in pairs)  # different block
    # doc 3: 'exampel' vs 'example' = 2 substitutions-ish edits
    assert pairs[(1, 3)] == 2


def test_levenshtein_kernel_matches_duckdb(ray_session):
    import numpy as np

    from raylog.functions.dedup import _codepoints, _levenshtein

    cases = [("kitten", "sitting"), ("", "abc"), ("abc", ""),
             ("same", "same"), ("ab", "ba"), ("flaw", "lawn"),
             ("intention", "execution")]
    for a, b in cases:
        got = _levenshtein(_codepoints(a), _codepoints(b))
        want = duckdb.sql(
            f"SELECT levenshtein('{a}', '{b}')").fetchone()[0]
        assert got == want, (a, b, got, want)


def test_hour_heatmap_weekday_parity(tmp_path, ray_session):
    # 1970-01-01 was a Thursday; DuckDB dayofweek: Sunday=0 .. Saturday=6
    rows = [
        (1, "2024-01-01 00:30", 1, "a"),   # Monday    -> 1
        (2, "2024-01-06 23:10", 1, "a"),   # Saturday  -> 6
        (3, "2024-01-07 12:00", 2, "a"),   # Sunday    -> 0
        (4, "2024-01-07 12:59", 3, "a"),   # same cell
    ]
    d = _write_events(tmp_path, rows)
    got = _cmp("events_hour_heatmap", d, ["weekday", "hour"], ["events"])
    cells = {(w, h): n for w, h, n in
             zip(got["weekday"], got["hour"], got["n"])}
    assert cells == {(1, 0): 1, (6, 23): 1, (0, 12): 2}
    shares = dict(zip(zip(got["weekday"], got["hour"]), got["share_e5"]))
    assert shares[(0, 12)] == 50000


def test_pair_degree_hub_vs_chain(tmp_path, ray_session):
    # four exact copies form a K4 (each degree 3); an isolated doc has
    # no row; a disjoint identical pair contributes two degree-1 docs
    quad = "alpha beta gamma delta epsilon zeta"
    pair = "one two three four five six seven"
    rows = [(1, quad), (2, quad), (3, quad), (4, quad),
            (5, "totally unrelated words entirely distinct tokens"),
            (6, pair), (7, pair)]
    d = _write_docs(tmp_path, rows)
    got = _cmp("dedup_pair_degree_hist", d, ["degree"], ["documents"])
    hist = dict(zip(got["degree"], got["n_docs"]))
    assert hist == {3: 4, 1: 2}


def test_quantile_normalize_calibrates_sources(tmp_path, ray_session):
    # source A scores 1..4, source B scores 101..104: after calibration
    # the rank-matched docs of A and B get the SAME global value
    rows = [(i, "w " * i) for i in range(1, 5)]          # A: tiny scores
    rows += [(100 + i, "w " * (100 + i)) for i in range(1, 5)]
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array(["en"] * len(rows), pa.string()),
        "source": pa.array(["A"] * 4 + ["B"] * 4, pa.string()),
        "n_chars": pa.array([r[0] * 2 for r in rows], pa.int64()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    got = _cmp("docs_quantile_normalize", str(tmp_path), ["doc_id"],
               ["documents"]).set_index("doc_id")
    # rank r of 4 in its source -> global target ceil(r*8/4) = 2r; the
    # global CDF has one doc per value, so norm = the 2r-th smallest
    glob = sorted(t["n_chars"].to_pylist())
    for r, (da, db) in enumerate(zip([1, 2, 3, 4], [101, 102, 103, 104]),
                                 start=1):
        assert int(got.loc[da, "norm_score"]) == glob[2 * r - 1]
        assert int(got.loc[da, "norm_score"]) == int(
            got.loc[db, "norm_score"])


def test_cohort_ltv_offsets(tmp_path, ray_session):
    t = pa.table({
        "o_custkey": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "o_orderdate": pa.array([pd.Timestamp(x) for x in
                                 ["1995-05-01", "1995-08-01", "1997-01-01",
                                  "1996-03-01", "1996-09-09"]],
                                pa.timestamp("us")),
        "o_totalprice": pa.array([10.0, 20.0, 40.0, 5.0, 7.0],
                                 pa.float64()),
    })
    pq.write_table(t, str(tmp_path / "orders.parquet"))
    got = _cmp("orders_cohort_ltv", str(tmp_path),
               ["cohort_year", "year_offset"], ["orders"])
    cells = {(c, o): (n, r) for c, o, n, r in
             zip(got["cohort_year"], got["year_offset"],
                 got["n_orders"], got["revenue_cents"])}
    assert cells[(1995, 0)] == (2, 3000)
    assert cells[(1995, 2)] == (1, 4000)
    assert cells[(1996, 0)] == (2, 1200)
    assert (1995, 1) not in cells       # no 1996 order for cohort 1995


def test_reciprocal_nn_mutual_only(tmp_path, ray_session):
    import numpy as np
    # a<->b mutual top-1; c's top-1 is a but a's is b -> (a,c) excluded;
    # d<->e a second mutual pair far away
    vecs = {
        1: [1.0, 0.0, 0.0],
        2: [0.999, 0.0447, 0.0],          # closest to 1 and vice versa
        3: [0.95, -0.312, 0.0],           # top-1 is 1, but 1 prefers 2
        4: [0.0, 0.0, 1.0],
        5: [0.0, 0.0447, 0.999],
    }
    t = pa.table({
        "vec_id": pa.array(list(vecs), pa.int64()),
        "embedding": pa.array(
            [np.asarray(v, np.float32) / np.linalg.norm(v)
             for v in vecs.values()],
            pa.list_(pa.float32())),
        "label": pa.array([0] * 5, pa.int32()),
    })
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))
    got = _cmp("dedup_reciprocal_nn", str(tmp_path), ["vec_a", "vec_b"],
               ["embeddings"])
    pairs = set(zip(got["vec_a"], got["vec_b"]))
    assert pairs == {(1, 2), (4, 5)}


def test_returns_by_brand_rates(tmp_path, ray_session):
    part = pa.table({
        "p_partkey": pa.array([1, 2], pa.int64()),
        "p_brand": pa.array(["B#1", "B#2"], pa.string()),
    })
    pq.write_table(part, str(tmp_path / "part.parquet"))
    li = pa.table({
        "l_partkey": pa.array([1, 1, 1, 1, 2], pa.int64()),
        "l_returnflag": pa.array(["R", "N", "A", "R", "N"], pa.string()),
    })
    pq.write_table(li, str(tmp_path / "lineitem.parquet"))
    got = _cmp("lineitem_returns_by_brand", str(tmp_path), ["p_brand"],
               ["part", "lineitem"]).set_index("p_brand")
    assert int(got.loc["B#1", "return_rate_milli"]) == 500
    assert int(got.loc["B#2", "n_returned"]) == 0


def test_js_matrix_symmetric_bounds(tmp_path, ray_session):
    import math
    rows = [
        (1, "a a a a", "en"), (2, "a a a a", "en"),      # source X: all 'a'
        (3, "b b b b", "en"),                             # source Y: all 'b'
        (4, "a a b b", "en"),                             # source Z: mixed
    ]
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array([r[2] for r in rows], pa.string()),
        "source": pa.array(["X", "X", "Y", "Z"], pa.string()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    got = _cmp("corpus_source_js_matrix", str(tmp_path),
               ["source_a", "source_b"], ["documents"])
    js = {(a, b): v for a, b, v in
          zip(got["source_a"], got["source_b"], got["js_e4"])}
    # disjoint vocabularies -> maximal JS = ln 2
    assert js[("X", "Y")] == int(math.floor(10000 * math.log(2)))
    # mixed source sits strictly between 0 and ln 2 against either pole
    assert 0 < js[("X", "Z")] < js[("X", "Y")]
    assert js[("X", "Z")] == js[("Y", "Z")]   # symmetric construction


def test_basket_hist(tmp_path, ray_session):
    li = pa.table({
        "l_orderkey": pa.array([1, 1, 1, 2, 3, 3], pa.int64()),
    })
    pq.write_table(li, str(tmp_path / "lineitem.parquet"))
    got = _cmp("lineitem_basket_hist", str(tmp_path), ["n_items"],
               ["lineitem"])
    hist = dict(zip(got["n_items"], got["n_orders"]))
    assert hist == {3: 1, 1: 1, 2: 1}


def test_last_touch_window_and_ties(tmp_path, ray_session):
    rows = [
        # user 1: click 3 days before purchase -> credited
        (1, "2024-01-01 00:00", 1, "click"),
        (2, "2024-01-04 00:00", 1, "purchase"),
        # user 2: only touch is 8 days prior -> outside window, (none)
        (3, "2024-01-01 00:00", 2, "view"),
        (4, "2024-01-09 00:01", 2, "purchase"),
        # user 3: two touches, later one wins; equal-ts touch with a
        # LARGER event_id than the purchase still qualifies (ts <= p.ts)
        (5, "2024-01-02 00:00", 3, "view"),
        (9, "2024-01-03 00:00", 3, "signup"),   # same ts as purchase
        (6, "2024-01-03 00:00", 3, "purchase"),
        # user 4: purchase then a later event -> later event NOT credited
        (7, "2024-01-05 00:00", 4, "purchase"),
        (8, "2024-01-06 00:00", 4, "click"),
    ]
    d = _write_events(tmp_path, rows)
    got = _cmp("events_last_touch", d, ["channel"], ["events"])
    n = dict(zip(got["channel"], got["n_purchases"]))
    assert n == {"click": 1, "(none)": 2, "signup": 1}


def test_nn_label_agreement_planted_noise(tmp_path, ray_session):
    import numpy as np
    rng = np.random.default_rng(3)
    # two tight clusters; one vector of label 1 planted inside cluster 0
    a = rng.normal(0, 0.01, (10, 4)) + np.array([1, 0, 0, 0])
    b = rng.normal(0, 0.01, (10, 4)) + np.array([0, 1, 0, 0])
    noise = np.array([[1.0, 0.001, 0, 0]])
    mat = np.vstack([a, b, noise]).astype(np.float32)
    t = pa.table({
        "vec_id": pa.array(list(range(21)), pa.int64()),
        "label": pa.array([0] * 10 + [1] * 10 + [1], pa.int32()),
        "embedding": pa.array(mat.tolist(), pa.list_(pa.float32())),
    })
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))
    got = _cmp("embed_nn_label_agreement", str(tmp_path), ["label"],
               ["embeddings"]).set_index("label")
    # the planted impostor sits INSIDE cluster 0, so some label-0
    # vectors pick it as their top-1 — agreement drops below 1000
    assert int(got.loc[0, "n_vecs"]) == 10
    assert int(got.loc[0, "agree_milli"]) < 1000
    # label 1: ten clean (mutual within their own cluster) + the
    # planted one whose NN is a cluster-0 vector -> 10/11 agree
    assert int(got.loc[1, "n_agree"]) == 10
    assert int(got.loc[1, "agree_milli"]) == 1000 * 10 // 11


def test_q4_lateness_exists_semantics(tmp_path, ray_session):
    orders = pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_orderdate": pa.array([pd.Timestamp("1995-01-01")] * 3,
                                pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT", "1-URGENT", "2-HIGH"],
                                    pa.string()),
    })
    pq.write_table(orders, str(tmp_path / "orders.parquet"))
    li = pa.table({
        # order 1: two on-time + ONE late item -> late (EXISTS, not ALL)
        "l_orderkey": pa.array([1, 1, 1, 2, 3], pa.int64()),
        "l_shipdate": pa.array([pd.Timestamp(x) for x in
                                ["1995-01-10", "1995-02-01", "1995-09-01",
                                 "1995-03-01",   # exactly 59 days: on time
                                 "1995-03-03"]], # 61 days: late
                               pa.timestamp("us")),
    })
    pq.write_table(li, str(tmp_path / "lineitem.parquet"))
    got = _cmp("orders_q4_lateness", str(tmp_path), ["o_orderpriority"],
               ["orders", "lineitem"]).set_index("o_orderpriority")
    assert int(got.loc["1-URGENT", "n_late"]) == 1   # order 1 only
    assert int(got.loc["1-URGENT", "late_rate_milli"]) == 500
    assert int(got.loc["2-HIGH", "n_late"]) == 1


def test_hapax_rate_ocr_noise(tmp_path, ray_session):
    rows = [
        (1, "the the the cat cat dog", "clean"),   # 0 hapax of 3 types
        (2, "xq9z jw7k vv2m pp1q", "noisy"),        # 4 hapax of 4 types
        (3, "the dog", "mixed"),                     # 2 hapax of 2 types
    ]
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array(["en"] * 3, pa.string()),
        "source": pa.array([r[2] for r in rows], pa.string()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    got = _cmp("docs_hapax_rate", str(tmp_path), ["source"],
               ["documents"]).set_index("source")
    assert int(got.loc["clean", "hapax_milli"]) == 333  # only 'dog'
    assert int(got.loc["noisy", "hapax_milli"]) == 1000
    assert int(got.loc["clean", "n_hapax"]) == 1


def test_stickiness_ratio(tmp_path, ray_session):
    rows = [
        # day 1: users 1,2 active; day 3: only user 1
        (1, "2024-01-01 01:00", 1, "a"), (2, "2024-01-01 02:00", 2, "a"),
        (3, "2024-01-03 01:00", 1, "a"),
    ]
    d = _write_events(tmp_path, rows)
    got = _cmp("events_dau_wau_stickiness", d, ["day"],
               ["events"]).set_index("day")
    # day 1: dau=2, wau=2 -> 1000; day 3: dau=1, wau covers both -> 500
    assert int(got.loc["2024-01-01", "stickiness_milli"]) == 1000
    assert int(got.loc["2024-01-03", "dau"]) == 1
    assert int(got.loc["2024-01-03", "wau"]) == 2
    assert int(got.loc["2024-01-03", "stickiness_milli"]) == 500


def test_revenue_cumulative_order(tmp_path, ray_session):
    t = pa.table({
        "o_orderdate": pa.array([pd.Timestamp(x) for x in
                                 ["1995-02-01", "1995-01-15",
                                  "1995-03-01", "1995-01-20"]],
                                pa.timestamp("us")),
        "o_totalprice": pa.array([20.0, 10.0, 40.0, 5.0], pa.float64()),
    })
    pq.write_table(t, str(tmp_path / "orders.parquet"))
    got = _cmp("orders_revenue_cumulative", str(tmp_path), ["month"],
               ["orders"]).set_index("month")
    assert int(got.loc["1995-01", "cum_cents"]) == 1500
    assert int(got.loc["1995-02", "cum_cents"]) == 3500
    assert int(got.loc["1995-03", "cum_cents"]) == 7500


def test_halves_js_drift_detection(tmp_path, ray_session):
    import math
    # source 'drift': first half all 'a', second half all 'b' -> ln 2;
    # source 'stable': identical halves -> 0
    rows = [
        (1, "a a a", "drift"), (2, "a a a", "drift"),
        (3, "b b b", "drift"), (4, "b b b", "drift"),
        (5, "c c d", "stable"), (6, "c c d", "stable"),
        (7, "c c d", "stable"), (8, "c c d", "stable"),
    ]
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array(["en"] * len(rows), pa.string()),
        "source": pa.array([r[2] for r in rows], pa.string()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    got = _cmp("corpus_source_halves_js", str(tmp_path), ["source"],
               ["documents"]).set_index("source")
    import math
    # per-source median: drift splits docs {1,2} vs {3,4} -> disjoint
    # vocabularies, maximal JS = ln 2; stable splits {5,6} vs {7,8} ->
    # identical distributions, exactly 0
    assert int(got.loc["drift", "js_e4"]) == int(
        math.floor(10000 * math.log(2)))
    assert int(got.loc["stable", "js_e4"]) == 0


def test_quantity_mode_tiebreak(tmp_path, ray_session):
    li = pa.table({
        "l_returnflag": pa.array(["N"] * 4 + ["R"] * 3, pa.string()),
        # N: 7 and 3 both appear twice -> tie, smaller qty (3) wins
        "l_quantity": pa.array([7.0, 3.0, 7.0, 3.0, 9.0, 9.0, 1.0],
                               pa.float64()),
    })
    pq.write_table(li, str(tmp_path / "lineitem.parquet"))
    got = _cmp("lineitem_quantity_mode", str(tmp_path), ["l_returnflag"],
               ["lineitem"]).set_index("l_returnflag")
    assert int(got.loc["N", "mode_qty"]) == 3
    assert int(got.loc["N", "mode_count"]) == 2
    assert int(got.loc["R", "mode_qty"]) == 9


def test_new_vs_returning_mix(tmp_path, ray_session):
    rows = [
        (1, "2024-01-01 01:00", 1, "a"),   # user 1 new on day 1
        (2, "2024-01-01 02:00", 2, "a"),   # user 2 new on day 1
        (3, "2024-01-02 01:00", 1, "a"),   # user 1 returns day 2
        (4, "2024-01-02 02:00", 3, "a"),   # user 3 new on day 2
        (5, "2024-01-02 03:00", 1, "a"),   # same-day repeat: no double
    ]
    d = _write_events(tmp_path, rows)
    got = _cmp("events_new_vs_returning", d, ["day"],
               ["events"]).set_index("day")
    assert (int(got.loc["2024-01-01", "n_new"]),
            int(got.loc["2024-01-01", "n_returning"])) == (2, 0)
    assert (int(got.loc["2024-01-02", "n_new"]),
            int(got.loc["2024-01-02", "n_returning"])) == (1, 1)


def test_char_class_profile(tmp_path, ray_session):
    rows = [
        (1, "AB 12 cd", "mix"),   # 8 chars: 2 upper, 2 digit, 2 space
        (2, "1234567890", "mix"),  # 10 digits
    ]
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array(["en"] * 2, pa.string()),
        "source": pa.array([r[2] for r in rows], pa.string()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    got = _cmp("docs_char_class_profile", str(tmp_path), ["source"],
               ["documents"]).set_index("source")
    assert int(got.loc["mix", "n_chars"]) == 18
    assert int(got.loc["mix", "digit_e4"]) == 10000 * 12 // 18
    assert int(got.loc["mix", "upper_e4"]) == 10000 * 2 // 18
    assert int(got.loc["mix", "space_e4"]) == 10000 * 2 // 18


def test_max_run_hist_detects_loops(tmp_path, ray_session):
    # the tokens payload derives from word LENGTHS: craft docs whose
    # word-length sequences contain known runs
    rows = [
        (1, "aa aa aa b cc", "s"),    # lengths 2,2,2,1,2 -> max run 3
        (2, "a bb a bb a", "s"),       # 1,2,1,2,1 -> max run 1
        (3, "xxx xxx xxx xxx", "s"),   # 3,3,3,3 -> max run 4
    ]
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array(["en"] * 3, pa.string()),
        "source": pa.array([r[2] for r in rows], pa.string()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    got = _cmp("tokens_max_run_hist", str(tmp_path), ["max_run"],
               ["documents"])
    hist = dict(zip(got["max_run"], got["n_seqs"]))
    assert hist == {3: 1, 1: 1, 4: 1}


def test_user_lifespan_hist(tmp_path, ray_session):
    rows = [
        (1, "2024-01-01 01:00", 1, "a"), (2, "2024-01-11 01:00", 1, "a"),
        (3, "2024-01-05 01:00", 2, "a"),   # one-shot user: 0 days
    ]
    d = _write_events(tmp_path, rows)
    got = _cmp("events_user_lifespan_hist", d, ["lifespan_days"],
               ["events"])
    hist = dict(zip(got["lifespan_days"], got["n_users"]))
    assert hist == {10: 1, 0: 1}


def test_cube_subtotals_consistent(tmp_path, ray_session):
    t = pa.table({
        "o_orderpriority": pa.array(["1-URGENT", "2-HIGH", "1-URGENT"],
                                    pa.string()),
        "o_orderdate": pa.array([pd.Timestamp(x) for x in
                                 ["1995-01-01", "1995-06-01",
                                  "1996-01-01"]], pa.timestamp("us")),
        "o_totalprice": pa.array([10.0, 20.0, 40.0], pa.float64()),
    })
    pq.write_table(t, str(tmp_path / "orders.parquet"))
    got = _cmp("orders_cube", str(tmp_path),
               ["o_orderpriority", "year"], ["orders"])
    cells = {(p, y): (n, r) for p, y, n, r in
             zip(got["o_orderpriority"], got["year"],
                 got["n_orders"], got["revenue_cents"])}
    assert cells[("ALL", -1)] == (3, 7000)            # grand total
    assert cells[("1-URGENT", -1)] == (2, 5000)       # priority subtotal
    assert cells[("ALL", 1995)] == (2, 3000)          # year subtotal
    assert cells[("1-URGENT", 1996)] == (1, 4000)     # finest cell
    assert len(cells) == 3 + 2 + 2 + 1   # finest + margins + grand


def test_rolling_median_resists_spike(tmp_path, ray_session):
    rows = []
    eid = 0
    # 8 days of exactly 2 events, one 50-event spike on day 5
    for d in range(1, 9):
        cnt = 50 if d == 5 else 2
        for _ in range(cnt):
            eid += 1
            rows.append((eid, f"2024-01-{d:02d} 03:00", eid, "a"))
    d = _write_events(tmp_path, rows)
    got = _cmp("events_rolling_median_7d", d, ["event_type", "day"],
               ["events"]).set_index("day")
    # the spike day's own median stays 2 (window 1-5: 2,2,2,2,50)
    assert int(got.loc["2024-01-05", "med7_milli"]) == 2000
    assert int(got.loc["2024-01-05", "n"]) == 50
    # two-day window at the series head: median of (2, 2)
    assert int(got.loc["2024-01-02", "med7_milli"]) == 2000


def test_weighted_median_diverges_on_long_tail(tmp_path, ray_session):
    # nine 1-word docs + one 100-word doc: doc-median length is tiny,
    # but most TOKENS live in the long doc
    rows = [(i, "w", "s") for i in range(1, 10)]
    rows.append((10, " ".join(["w"] * 100), "s"))
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array(["en"] * len(rows), pa.string()),
        "source": pa.array([r[2] for r in rows], pa.string()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    got = _cmp("tokens_weighted_median_len", str(tmp_path),
               ["median_len"], ["documents"])
    assert int(got.loc[0, "median_len"]) == 1
    assert int(got.loc[0, "weighted_median_len"]) == 100
    assert int(got.loc[0, "total_tokens"]) == 9 + 100


def test_type_share_by_decile_bands(tmp_path, ray_session):
    rows = []
    eid = 0
    # 10 light users: 1 click each; 1 heavy user: 30 purchases
    for u in range(1, 11):
        eid += 1
        rows.append((eid, "2024-01-01 01:00", u, "click"))
    for _ in range(30):
        eid += 1
        rows.append((eid, "2024-01-02 01:00", 99, "purchase"))
    d = _write_events(tmp_path, rows)
    got = _cmp("events_type_share_by_user_decile", d,
               ["band", "event_type"], ["events"])
    cells = {(b, e): (n, s) for b, e, n, s in
             zip(got["band"], got["event_type"], got["n"],
                 got["share_milli"])}
    # heavy band = the one user above the p90 cut, all purchases
    assert cells[("heavy", "purchase")] == (30, 1000)
    assert cells[("light", "click")][1] == 1000


def test_type_user_overlap_jaccard(tmp_path, ray_session):
    rows = [
        # users 1,2: click+purchase; user 3: click only; user 4: view
        (1, "2024-01-01", 1, "click"), (2, "2024-01-01", 1, "purchase"),
        (3, "2024-01-01", 2, "click"), (4, "2024-01-01", 2, "purchase"),
        (5, "2024-01-01", 3, "click"),
        (6, "2024-01-01", 4, "view"),
        (7, "2024-01-02", 1, "click"),   # repeat: distinct dedups
    ]
    d = _write_events(tmp_path, rows)
    got = _cmp("events_type_user_overlap", d, ["type_a", "type_b"],
               ["events"])
    cells = {(a, b): (n, j) for a, b, n, j in
             zip(got["type_a"], got["type_b"], got["n_both"],
                 got["jaccard_milli"])}
    # click ∩ purchase = {1,2}; union = {1,2,3} -> 2/3
    assert cells[("click", "purchase")] == (2, 666)
    assert ("click", "view") not in cells   # no co-user, no row


def test_char_bigram_entropy_bounds(tmp_path, ray_session):
    rows = [
        (1, "abababababab", "deterministic"),  # H(next|char) = 0
        (2, "aaabbbcccddd", "blocky"),
    ]
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array(["en"] * 2, pa.string()),
        "source": pa.array([r[2] for r in rows], pa.string()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    got = _cmp("docs_char_bigram_entropy", str(tmp_path), ["source"],
               ["documents"]).set_index("source")
    # a->b always, b->a always: zero conditional entropy
    assert int(got.loc["deterministic", "h_cond_millibits"]) == 0
    assert int(got.loc["deterministic", "n_bigrams"]) == 11
    assert int(got.loc["blocky", "h_cond_millibits"]) > 0


def test_truncation_waste_exact(tmp_path, ray_session):
    # doc word-counts 10, 50, 300 -> n_tok = 10, 50, 300
    rows = [(1, " ".join(["w"] * 10), "s"),
            (2, " ".join(["w"] * 50), "s"),
            (3, " ".join(["w"] * 300), "s")]
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array(["en"] * 3, pa.string()),
        "source": pa.array([r[2] for r in rows], pa.string()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    got = _cmp("tokens_truncation_waste", str(tmp_path), ["max_len"],
               ["documents"]).set_index("max_len")
    assert int(got.loc[32, "tokens_kept"]) == 10 + 32 + 32
    assert int(got.loc[32, "n_truncated_docs"]) == 2
    assert int(got.loc[64, "tokens_kept"]) == 10 + 50 + 64
    assert int(got.loc[256, "n_truncated_docs"]) == 1
    assert int(got.loc[256, "kept_share_e4"]) == (
        10000 * (10 + 50 + 256) // 360)


def test_intrinsic_dim_isotropic_vs_collapsed(tmp_path, ray_session):
    import numpy as np
    rng = np.random.default_rng(5)
    # collapsed: all variance on one axis -> PR ~ 1
    base = rng.normal(0, 1.0, (200, 1)) * np.array([[1.0]])
    collapsed = np.hstack([base, 1e-4 * rng.normal(0, 1, (200, 3))])
    t = pa.table({
        "vec_id": pa.array(list(range(200)), pa.int64()),
        "embedding": pa.array(collapsed.astype(np.float32).tolist(),
                              pa.list_(pa.float32())),
        "label": pa.array([0] * 200, pa.int32()),
    })
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))
    got = _cmp("embed_intrinsic_dim", str(tmp_path),
               ["participation_ratio"], ["embeddings"])
    assert float(got.loc[0, "participation_ratio"]) < 1.1

    # isotropic 4-d cloud -> PR near 4
    iso = rng.normal(0, 1.0, (500, 4))
    t2 = pa.table({
        "vec_id": pa.array(list(range(500)), pa.int64()),
        "embedding": pa.array(iso.astype(np.float32).tolist(),
                              pa.list_(pa.float32())),
        "label": pa.array([0] * 500, pa.int32()),
    })
    pq.write_table(t2, str(tmp_path / "embeddings.parquet"))
    got2 = _cmp("embed_intrinsic_dim", str(tmp_path),
                ["participation_ratio"], ["embeddings"])
    assert float(got2.loc[0, "participation_ratio"]) > 3.5


def test_hhi_monopoly_vs_even(tmp_path, ray_session):
    cust = pa.table({
        "c_custkey": pa.array([1, 2, 3, 4], pa.int64()),
        "c_mktsegment": pa.array(["MONO", "MONO", "EVEN", "EVEN"],
                                 pa.string()),
    })
    pq.write_table(cust, str(tmp_path / "customer.parquet"))
    orders = pa.table({
        "o_custkey": pa.array([1, 1, 2, 3, 4], pa.int64()),
        "o_orderdate": pa.array([pd.Timestamp("1995-01-01")] * 5,
                                pa.timestamp("us")),
        "o_totalprice": pa.array([990.0, 9.0, 1.0, 50.0, 50.0],
                                 pa.float64()),
    })
    pq.write_table(orders, str(tmp_path / "orders.parquet"))
    got = _cmp("orders_hhi_by_segment", str(tmp_path),
               ["c_mktsegment"], ["customer", "orders"]
               ).set_index("c_mktsegment")
    # MONO: shares 0.999/0.001 -> HHI ~ 998002 e6-units
    assert int(got.loc["MONO", "hhi_e6"]) == (
        1_000_000 * (99900 ** 2 + 100 ** 2) // (100000 ** 2))
    # EVEN: two equal customers -> exactly 0.5
    assert int(got.loc["EVEN", "hhi_e6"]) == 500000


def test_revenue_pareto_whale(tmp_path, ray_session):
    # one whale with 80% exactly, nine minnows sharing 20%
    orders = pa.table({
        "o_custkey": pa.array(list(range(1, 11)), pa.int64()),
        "o_orderdate": pa.array([pd.Timestamp("1995-01-01")] * 10,
                                pa.timestamp("us")),
        "o_totalprice": pa.array([800.0] + [800.0 / 36] * 9,
                                 pa.float64()),
    })
    pq.write_table(orders, str(tmp_path / "orders.parquet"))
    got = _cmp("orders_revenue_pareto", str(tmp_path),
               ["n_customers"], ["orders"])
    # the whale alone crosses >= 80% of the total
    assert int(got.loc[0, "n_top80"]) == 1
    assert int(got.loc[0, "top80_share_e4"]) == 1000


def test_unigram_entropy_by_source(tmp_path, ray_session):
    rows = [
        (1, "aa aa aa aa", "flat"),       # all token 2 -> H = 0
        # counts 3/1/1: H = log2(5) - (3*log2 3)/5 ≈ 1.371 bits — away
        # from any floor boundary (a UNIFORM dist sits exactly on one,
        # where numpy pairwise vs DuckDB sequential summation can
        # floor to 1999 vs 2000)
        (2, "a bb ccc a a", "spread"),
    ]
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array(["en"] * 2, pa.string()),
        "source": pa.array([r[2] for r in rows], pa.string()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    got = _cmp("tokens_unigram_entropy_by_source", str(tmp_path),
               ["source"], ["documents"]).set_index("source")
    assert int(got.loc["flat", "h_millibits"]) == 0
    assert int(got.loc["spread", "h_millibits"]) == 1370
    assert int(got.loc["spread", "n_tokens"]) == 5


def test_price_quantiles_by_brand(tmp_path, ray_session):
    part = pa.table({
        "p_partkey": pa.array([1, 2], pa.int64()),
        "p_brand": pa.array(["B#1", "B#2"], pa.string()),
    })
    pq.write_table(part, str(tmp_path / "part.parquet"))
    li = pa.table({
        "l_partkey": pa.array([1] * 10 + [2], pa.int64()),
        "l_extendedprice": pa.array(
            [float(i) for i in range(1, 11)] + [7.0], pa.float64()),
    })
    pq.write_table(li, str(tmp_path / "lineitem.parquet"))
    got = _cmp("lineitem_price_quantiles_by_brand", str(tmp_path),
               ["p_brand"], ["part", "lineitem"]).set_index("p_brand")
    # quantile_disc over 1..10: p50 -> ceil(0.5*10)=5th value = 500
    assert int(got.loc["B#1", "p50_cents"]) == 500
    assert int(got.loc["B#1", "p90_cents"]) == 900
    assert int(got.loc["B#2", "p50_cents"]) == 700


def test_vocab_gini_bounds(tmp_path, ray_session):
    rows = [
        (1, "a b c d e f", "even"),       # all counts 1 -> Gini 0
        (2, "x x x x x x x x x y", "spiky"),
    ]
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array(["en"] * 2, pa.string()),
        "source": pa.array([r[2] for r in rows], pa.string()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    got = _cmp("docs_vocab_gini", str(tmp_path), ["source"],
               ["documents"]).set_index("source")
    assert int(got.loc["even", "gini_micro"]) == 0
    # spiky: counts (1, 9) over 2 types: G = 2*(1*1+2*9)/(2*10) - 3/2
    # = 0.4 exactly as a rational — but 1.9 - 1.5 in float64 lands a
    # hair BELOW 0.4, so both engines floor 1e6*G to 399999 (the same
    # value, which is what the oracle compare asserts; this pin just
    # documents the bit)
    assert int(got.loc["spiky", "gini_micro"]) == 399999


def test_split_oov_membership(tmp_path, ray_session):
    import hashlib
    # craft texts whose md5 bucket puts them deterministically in
    # train (<80) or heldout (>=80)
    def bucket(t):
        return int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % 100

    train_texts = []
    held_texts = []
    i = 0
    while len(train_texts) < 2 or len(held_texts) < 1:
        t = f"shared{i} common word{i}"
        (train_texts if bucket(t) < 80 else held_texts).append(t)
        i += 1
    # force a heldout doc that shares 'common' with train but adds a
    # token no train doc has
    extra = None
    j = 0
    while extra is None:
        cand = f"common neverseen{j}"
        if bucket(cand) >= 80:
            extra = cand
        j += 1
    texts = train_texts[:2] + [extra]
    t = pa.table({
        "doc_id": pa.array(list(range(1, len(texts) + 1)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array(["s"] * len(texts), pa.string()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    got = _cmp("tokens_split_oov", str(tmp_path), ["oov_tokens"],
               ["documents"])
    # heldout doc = "common neverseenX": 'common' is in train iff some
    # train text contains it — train texts are "sharedN common wordN",
    # so exactly 1 of 2 heldout tokens is OOV
    assert int(got.loc[0, "heldout_tokens"]) == 2
    assert int(got.loc[0, "oov_tokens"]) == 1
    assert int(got.loc[0, "oov_types"]) == 1
    assert int(got.loc[0, "oov_share_e5"]) == 50000
