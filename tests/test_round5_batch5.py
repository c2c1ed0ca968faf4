"""Edge-case tests for the round-5 fifth-batch operators:
``docs_ngram_novelty`` (crawl-order first-seen gram rate) and
``docs_ccnet_buckets`` (per-language perplexity-tercile bucketing).

Same contract as the other curation edge suites: a tiny synthetic
``documents.parquet`` with deliberately nasty rows, Ray pipeline
cross-checked against DuckDB running the registered oracle SQL.
"""

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from raylog.pipelines.queries import ORACLES, QUERIES


def _write_docs(tmp_path, rows):
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array([r[2] for r in rows], pa.string()),
        "source": pa.array(["s"] * len(rows), pa.string()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _cmp(name, sf_dir, keys):
    out = QUERIES[name](sf_dir)
    if hasattr(out, "to_pandas"):
        out = out.to_pandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')")
    want = con.execute(ORACLES[name]).fetchdf()
    got = out.sort_values(keys).reset_index(drop=True)
    want = want.sort_values(keys).reset_index(drop=True)
    got = got[sorted(got.columns)]
    want = want[sorted(want.columns)]
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    return got


WORDS = "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11"


def test_ngram_novelty_edges(tmp_path, ray_session):
    rows = [
        (10, WORDS, "en"),                       # 5 distinct grams, all novel
        (20, WORDS, "en"),                       # exact copy: 0 novel
        (30, " ".join(WORDS.split()[:8]) + " z1 z2 z3", "en"),
        # doc 30 shares gram w0..w7 with doc 10; its tail grams are novel
        (40, " ".join(["a"] * 10), "en"),        # 1 distinct gram (self-rep)
        (50, "only seven words here not eight yet", "en"),  # < 8: excluded
        (60, "", "en"),                          # empty: excluded
    ]
    d = _write_docs(tmp_path, rows)
    got = _cmp("docs_ngram_novelty", d, ["doc_id"]).set_index("doc_id")
    assert set(got.index) == {10, 20, 30, 40}  # short/empty docs excluded
    assert got.loc[10, "novel_grams"] == got.loc[10, "n_grams"] == 5
    assert got.loc[20, "novel_grams"] == 0      # later exact copy
    assert got.loc[40, "n_grams"] == 1          # within-doc dedup
    assert got.loc[40, "novel_grams"] == 1
    # doc 30: first gram (w0..w7) first seen in doc 10, the 3 tail grams new
    assert got.loc[30, "n_grams"] == 4
    assert got.loc[30, "novel_grams"] == 3
    assert got.loc[30, "novelty_milli"] == 750


def test_ngram_novelty_order_dependence(tmp_path, ray_session):
    # swapping doc ids flips which copy is "novel": min doc_id wins
    rows = [(2, WORDS, "en"), (1, WORDS, "en")]
    d = _write_docs(tmp_path, rows)
    got = _cmp("docs_ngram_novelty", d, ["doc_id"]).set_index("doc_id")
    assert got.loc[1, "novel_grams"] == 5
    assert got.loc[2, "novel_grams"] == 0


def test_ccnet_buckets_degenerate_langs(tmp_path, ray_session):
    # lang 'aa': a single doc -> t1 == t2 == its value -> bucket 'head';
    # lang 'bb': two identical-score docs -> both land in one bucket;
    # lang 'cc': six docs with spread scores -> all three buckets hit
    common = "the quick brown fox jumps over the lazy dog"
    rows = [
        (1, common, "aa"),
        (2, "alpha beta gamma", "bb"),
        (3, "alpha beta gamma", "bb"),
    ]
    # cc docs: increasingly rare vocabulary -> increasing NLL
    for i in range(6):
        rare = " ".join(f"rare{i}x{j}" for j in range(i + 1))
        rows.append((10 + i, common + " " + rare, "cc"))
    d = _write_docs(tmp_path, rows)
    got = _cmp("docs_ccnet_buckets", d, ["lang", "bucket"])
    by_lang = got.groupby("lang")["n_docs"].sum()
    assert by_lang["aa"] == 1 and by_lang["bb"] == 2 and by_lang["cc"] == 6
    aa = got[got["lang"] == "aa"]
    assert list(aa["bucket"]) == ["head"]       # single doc is its own head
    bb = got[got["lang"] == "bb"]
    assert len(bb) == 1 and bb["n_docs"].iloc[0] == 2  # ties share a bucket
    cc = set(got[got["lang"] == "cc"]["bucket"])
    assert cc == {"head", "middle", "tail"}


def test_ccnet_buckets_mass_conservation(tmp_path, ray_session):
    # bucket n_words/nll sums partition the per-lang totals exactly
    rows = [(i, " ".join(f"t{i}w{j}" for j in range(5 + i % 3)), "xx")
            for i in range(9)]
    d = _write_docs(tmp_path, rows)
    got = _cmp("docs_ccnet_buckets", d, ["lang", "bucket"])
    assert got["n_docs"].sum() == 9
    assert got["n_words"].sum() == sum(5 + i % 3 for i in range(9))


def test_heaps_curve_growth(tmp_path, ray_session):
    # first docs introduce the vocab; later docs reuse it -> cum_vocab
    # flattens while cum_tokens keeps climbing
    rows = []
    for i in range(20):
        if i < 5:
            rows.append((i, " ".join(f"fresh{i}w{j}" for j in range(6)),
                         "en"))
        else:
            rows.append((i, "fresh0w0 fresh0w1 fresh0w2 fresh1w0 "
                            "fresh1w1 fresh1w2", "en"))
    d = _write_docs(tmp_path, rows)
    got = _cmp("tokens_heaps_curve", d, ["bucket"])
    assert list(got["bucket"]) == list(range(10))
    cv = got["cum_vocab"].to_numpy()
    ct = got["cum_tokens"].to_numpy()
    assert (cv[1:] >= cv[:-1]).all() and (ct[1:] > ct[:-1]).all()
    assert cv[-1] == 30                       # 5 docs x 6 fresh words
    assert got["new_words"].to_numpy()[5:].sum() == 0  # growth stops
    assert ct[-1] == 20 * 6


def _write_embeddings(tmp_path, vecs):
    t = pa.table({
        "vec_id": pa.array(list(range(len(vecs))), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array([0] * len(vecs), pa.int32()),
    })
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))


def _cmp_embed(name, sf_dir, keys):
    out = QUERIES[name](sf_dir)
    if hasattr(out, "to_pandas"):
        out = out.to_pandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet')")
    want = con.execute(ORACLES[name]).fetchdf()
    got = out.sort_values(keys).reset_index(drop=True)
    want = want.sort_values(keys).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[sorted(got.columns)],
                                  want[sorted(want.columns)],
                                  check_dtype=False)
    return got


def test_threshold_curve_monotone(tmp_path, ray_session):
    # 0/1 identical (cos 1.0), 2 similar to them (~0.707), 3 orthogonal
    vecs = [
        (1.0, 0.0, 0.0),
        (1.0, 0.0, 0.0),
        (1.0, 1.0, 0.0),
        (0.0, 0.0, 1.0),
    ]
    _write_embeddings(tmp_path, vecs)
    got = _cmp_embed("dedup_threshold_curve", str(tmp_path),
                     ["threshold_milli"])
    np_ = got["n_pairs"].to_numpy()
    nd = got["n_docs"].to_numpy()
    assert (np_[1:] <= np_[:-1]).all() and (nd[1:] <= nd[:-1]).all()
    # at 400..700: pairs (0,1)@1000, (0,2)&(1,2)@707 -> 3 pairs, 3 docs
    assert np_[0] == 3 and nd[0] == 3
    # at 800+: only the identical pair survives
    assert np_[4] == 1 and nd[4] == 2


def test_lm2_score_edges(tmp_path, ray_session):
    # tokens are word LENGTHS of the text (records.py derivation);
    # doc 4 repeats one common bigram, doc 5 is a one-off pattern
    rows = [
        (1, "aa bbb aa bbb aa bbb", "en"),     # lengths 2,3,2,3,...
        (2, "aa bbb aa bbb aa bbb", "en"),     # identical -> same score
        (3, "x", "en"),                        # 1 token: no bigram
        (4, "aa bbb aa bbb", "en"),            # same common bigrams
        (5, "zzzzzz y zzzzzz", "en"),          # rare pattern
    ]
    d = _write_docs(tmp_path, rows)
    got = _cmp("tokens_lm2_score", d, ["doc_id"]).set_index("doc_id")
    assert 3 not in got.index                  # single-token excluded
    assert got.loc[1, "nll2_micro"] == got.loc[2, "nll2_micro"]
    # the common alternating bigram is cheaper than the rare one
    assert got.loc[1, "nll2_micro"] < got.loc[5, "nll2_micro"]
    assert got.loc[1, "n_bigrams"] == 5


def test_position_entropy_template_dip(tmp_path, ray_session):
    # every doc starts with the same-length word -> position 0 entropy
    # is exactly 0 (template artifact); later positions vary
    rows = [(i, "zz " + " ".join(
        ("a" * (1 + (i + j) % 4)) for j in range(10)), "en")
        for i in range(12)]
    d = _write_docs(tmp_path, rows)
    got = _cmp("tokens_position_entropy", d,
               ["pos_bucket"]).set_index("pos_bucket")
    assert got.loc[0, "entropy_milli"] == 0     # constant first token
    assert got.loc[1, "entropy_milli"] > 0
    assert got.loc[8, "n_tokens"] == 12 * 3     # 11 tokens: 3 in tail


def test_dataset_card_counts(tmp_path, ray_session):
    rows = [
        (1, "one two three", "en"),
        (2, "one two three", "en"),     # exact dup of 1
        (3, "four five", "fr"),
        (4, "six", "de"),
    ]
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array([r[2] for r in rows], pa.string()),
        "source": pa.array(["sA", "sA", "sB", "sB"], pa.string()),
        "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    got = _cmp("corpus_dataset_card", str(tmp_path),
               ["metric"]).set_index("metric")["value"]
    assert got["n_docs"] == 4
    assert got["exact_dup_docs"] == 1
    assert got["n_langs"] == 3 and got["n_sources"] == 2
    assert got["en_docs"] == 2
    assert got["n_words"] == 3 + 3 + 2 + 1
    assert got["max_words"] == 3


def test_funnel_time_quartiles(tmp_path, ray_session):
    import datetime as dt
    base = dt.datetime(2024, 1, 1)
    evs = [
        # user 1: view -> +10s click -> +70s purchase
        (1, 1, "view", 0), (2, 1, "click", 10), (3, 1, "purchase", 70),
        # user 2: click BEFORE view -> never converts
        (4, 2, "click", 0), (5, 2, "view", 5),
        # user 3: view -> +20s click, no purchase
        (6, 3, "view", 0), (7, 3, "click", 20),
        # user 4: only purchases
        (8, 4, "purchase", 0),
    ]
    t = pa.table({
        "event_id": pa.array([e[0] for e in evs], pa.int64()),
        "ts": pa.array([base + dt.timedelta(seconds=e[3]) for e in evs],
                       pa.timestamp("us")),
        "user_id": pa.array([e[1] for e in evs], pa.int64()),
        "event_type": pa.array([e[2] for e in evs], pa.string()),
        "value": pa.array([1.0] * len(evs), pa.float64()),
        "props": pa.array(["{}"] * len(evs), pa.string()),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = QUERIES["events_funnel_time"](str(tmp_path))
    if hasattr(out, "to_pandas"):
        out = out.to_pandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet')")
    want = con.execute(ORACLES["events_funnel_time"]).fetchdf()
    got = out.sort_values("step").reset_index(drop=True)
    want = want.sort_values("step").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[sorted(got.columns)],
                                  want[sorted(want.columns)],
                                  check_dtype=False)
    g = got.set_index("step")
    assert g.loc["view_click", "n_users"] == 2       # users 1 and 3
    assert g.loc["view_click", "p50_s"] == 10        # rank ceil(.5*2)=1
    assert g.loc["view_click", "p75_s"] == 20
    assert g.loc["click_purchase", "n_users"] == 1   # user 1 only
    assert g.loc["click_purchase", "p25_s"] == 60
