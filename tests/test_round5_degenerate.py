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
    ("orders_q5_local_volume", 1),       # the one local-ASIA lineitem
    ("lineitem_q9_profit_by_nation", 0),  # no 'widget' part qualifies
    ("part_q16_supplier_variety", 0),    # only supplier is excluded
    ("lineitem_q19_band_revenue", 1),    # scalar report: one zero row
    ("events_session_quantiles", 1),     # empty stream: n=0, null pcts
    ("events_powerlaw_alpha", 1),        # empty stream: n=0, null alpha
    ("docs_curriculum_rank", 1),         # the single doc, rank 0
    ("embed_centroid_distances", 0),     # one label: no pairs
    ("tokens_fertility_by_source", 1),   # the one-word doc
    ("part_q2_min_supplier", 1),         # the one (part, supplier) pair
    ("supplier_q20_excess", 0),          # no 'widget' part qualifies
    ("events_value_quantiles_by_type", 0),  # empty stream
    ("dedup_shingle_df_spectrum", 1),    # one whole-doc gram, df=1
    ("events_active_days_hist", 0),      # empty stream
    ("tokens_doc_js_divergence", 1),     # single doc: JS = 0
    ("embed_neighbor_sim_hist", 0),      # one vector: no neighbor pair
    ("sample_weighted_no_replacement", 1),  # k=50 of a 1-doc corpus
    ("embed_label_halves_drift", 0),     # one vector: no odd half
    ("docs_simpson_diversity", 1),       # the one-word doc, num=0
    ("events_user_type_entropy", 0),     # empty stream
    ("pretrain_prep_packed", 0),         # nothing survives the filters
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
        "l_linenumber": pa.array([1], pa.int32()),
        "l_tax": pa.array([0.0]),
        "l_returnflag": pa.array(["N"]),
        "l_linestatus": pa.array(["O"]),
        "l_shipdate": pa.array([t0], pa.timestamp("us")),
    }), str(d / "lineitem.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1], pa.int64()),
        "o_custkey": pa.array([1], pa.int64()),
        "o_totalprice": pa.array([1.0]),
        "o_orderdate": pa.array([t0], pa.timestamp("us")),
        "o_orderstatus": pa.array(["O"]),
        "o_orderpriority": pa.array(["1-URGENT"]),
    }), str(d / "orders.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array([1], pa.int64()),
        "c_nationkey": pa.array([0], pa.int64()),
        "c_acctbal": pa.array([-5.0]),
        "c_name": pa.array(["C1"]),
        "c_mktsegment": pa.array(["BUILDING"]),
    }), str(d / "customer.parquet"))
    pq.write_table(pa.table({
        "s_suppkey": pa.array([1], pa.int64()),
        "s_name": pa.array(["S1"]),
        "s_nationkey": pa.array([0], pa.int64()),
        "s_acctbal": pa.array([-5.0]),
    }), str(d / "supplier.parquet"))
    pq.write_table(pa.table({
        "p_partkey": pa.array([1], pa.int64()),
        "p_brand": pa.array(["Brand#99"]),
        "p_type": pa.array(["LARGE"]),
        "p_name": pa.array(["part one"]),
        "p_size": pa.array([1], pa.int32()),
        "p_retailprice": pa.array([1.0]),
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
        "lang": pa.array(["en"]),
        "n_chars": pa.array([5], pa.int64()),
    }), str(d / "documents.parquet"))
    pq.write_table(pa.table({
        "event_id": pa.array([], pa.int64()),
        "user_id": pa.array([], pa.int64()),
        "ts": pa.array([], pa.timestamp("us")),
        "event_type": pa.array([], pa.string()),
        "value": pa.array([], pa.float64()),
        "props": pa.array([], pa.string()),
    }), str(d / "events.parquet"))
    pq.write_table(pa.table({
        "vec_id": pa.array([0], pa.int64()),
        "embedding": pa.array([[0.1] * 16], pa.list_(pa.float32())),
        "label": pa.array([0], pa.int32()),
    }), str(d / "embeddings.parquet"))
    return str(d)


@pytest.mark.parametrize("name,want_rows", _QUERIES)
def test_degenerate_no_crash(name, want_rows, degenerate_sf,
                             ray_session):
    out = QUERIES[name](degenerate_sf)
    if hasattr(out, "to_pandas"):
        out = out.to_pandas()
    assert len(out) == want_rows, f"{name}: {len(out)} rows"


# The registry-wide hardening sweep (round 5) fixed these operators on
# the nothing-qualifies fixture: empty join sides (sentinel-first
# seeding), empty-aggregate driver finishers (typed empty returns),
# NaN/div0 on sub-minimal statistics, and ANN sampling preconditions
# (clamped to the corpus). No-crash + typed result is the contract.
_HARDENED = [
    "basket_pair_lift", "corpus_curation", "corpus_source_js_matrix",
    "corpus_source_overlap", "dedup_dup_mass_by_source",
    "dedup_minhash_pairs", "dedup_ngram_pairs", "dedup_threshold_curve",
    "docs_histogram", "embed_cluster_quality", "embed_intrinsic_dim",
    "embed_pca_project", "embed_kmeans", "events_anomaly",
    "events_asof_join", "events_burstiness", "events_entropy_rate",
    "events_funnel_time", "events_last_touch",
    "events_markov_transitions", "events_top_paths",
    "events_type_user_overlap", "orders_cust_distribution",
    "orders_q3_unshipped", "orders_repeat_cadence",
    "orders_top_returners", "text_bm25_topk", "text_pmi_bigrams",
    "text_zipf_exponent", "tokens_cond_entropy", "tokens_lm2_score",
    "tokens_pmi_bigrams", "ann_cosine_topk", "ann_ivf_topk",
    "ann_pq_topk", "embed_hard_negatives",
]


@pytest.fixture(scope="module")
def degenerate_one_event_sf(degenerate_sf, tmp_path_factory):
    import shutil

    d = tmp_path_factory.mktemp("degenerate1ev")
    for f in ("lineitem", "orders", "customer", "supplier", "part",
              "nation", "region", "documents", "embeddings"):
        shutil.copy(f"{degenerate_sf}/{f}.parquet", d / f"{f}.parquet")
    pq.write_table(pa.table({
        "event_id": pa.array([1], pa.int64()),
        "user_id": pa.array([1], pa.int64()),
        "ts": pa.array([dt.datetime(1990, 1, 1)], pa.timestamp("us")),
        "event_type": pa.array(["view"]),
        "value": pa.array([1.0]),
        "props": pa.array(['{"a":1}']),
    }), str(d / "events.parquet"))
    return str(d)


@pytest.mark.parametrize("name", _HARDENED)
def test_degenerate_hardened_no_crash(name, degenerate_one_event_sf,
                                      ray_session):
    out = QUERIES[name](degenerate_one_event_sf)
    if hasattr(out, "to_pandas"):
        out = out.to_pandas()
    assert out is not None  # typed (possibly empty) result, no crash
