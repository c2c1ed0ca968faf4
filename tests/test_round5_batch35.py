"""Seeded randomized brute-force checks for the continuation-session
batch 35-38 operators: an INDEPENDENT third implementation (plain
Python over the same fixture) must agree with the Ray pipeline — the
DuckDB oracle already cross-checks separately, so a bug would have to
fool all three.
"""

import datetime as dt
import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from raylog.pipelines.queries import QUERIES


def _write(path, name, table):
    pq.write_table(table, str(path / f"{name}.parquet"))


def _mk_star(d, rng, n_li=400, n_part=40, n_supp=12, n_cust=15,
             n_nat=5):
    """Random mini star schema with every column the batch-35/37
    queries read."""
    t0 = dt.datetime(2024, 1, 1)
    _write(d, "lineitem", pa.table({
        "l_orderkey": pa.array(rng.integers(1, 60, n_li), pa.int64()),
        "l_partkey": pa.array(rng.integers(1, n_part + 1, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(1, n_supp + 1, n_li), pa.int64()),
        "l_quantity": pa.array(rng.integers(1, 50, n_li).astype(float)),
        "l_extendedprice": pa.array(
            np.round(rng.uniform(10, 5000, n_li), 2)),
        "l_discount": pa.array(np.round(rng.uniform(0, 0.1, n_li), 2)),
        "l_returnflag": pa.array(
            rng.choice(["R", "N"], n_li).tolist(), pa.string()),
        "l_shipdate": pa.array(
            [t0 + dt.timedelta(days=int(x))
             for x in rng.integers(0, 900, n_li)], pa.timestamp("us")),
    }))
    _write(d, "orders", pa.table({
        "o_orderkey": pa.array(range(1, 60), pa.int64()),
        "o_custkey": pa.array(rng.integers(1, n_cust + 1, 59), pa.int64()),
    }))
    _write(d, "customer", pa.table({
        "c_custkey": pa.array(range(1, n_cust + 1), pa.int64()),
        "c_nationkey": pa.array(
            rng.integers(0, n_nat, n_cust), pa.int64()),
    }))
    _write(d, "supplier", pa.table({
        "s_suppkey": pa.array(range(1, n_supp + 1), pa.int64()),
        "s_name": pa.array([f"S{i}" for i in range(1, n_supp + 1)],
                           pa.string()),
        "s_nationkey": pa.array(rng.integers(0, n_nat, n_supp), pa.int64()),
        "s_acctbal": pa.array(np.round(rng.uniform(-900, 9000, n_supp), 2)),
    }))
    _write(d, "part", pa.table({
        "p_partkey": pa.array(range(1, n_part + 1), pa.int64()),
        "p_brand": pa.array(
            rng.choice(["Brand#4", "Brand#13", "Brand#15", "Brand#23"],
                       n_part).tolist(), pa.string()),
        "p_type": pa.array(
            rng.choice(["PROMO", "LARGE", "SMALL"], n_part).tolist(),
            pa.string()),
        "p_name": pa.array(
            rng.choice(["red widget", "blue bolt"], n_part).tolist(),
            pa.string()),
        "p_size": pa.array(
            rng.choice([1, 4, 9, 20, 30], n_part), pa.int32()),
        "p_retailprice": pa.array(np.round(rng.uniform(900, 1000, n_part), 2)),
    }))
    _write(d, "nation", pa.table({
        "n_nationkey": pa.array(range(n_nat), pa.int64()),
        "n_name": pa.array([f"N{i}" for i in range(n_nat)], pa.string()),
        "n_regionkey": pa.array([i % 2 for i in range(n_nat)], pa.int64()),
    }))
    _write(d, "region", pa.table({
        "r_regionkey": pa.array([0, 1], pa.int64()),
        "r_name": pa.array(["ASIA", "EUROPE"], pa.string()),
    }))


def test_q2_min_supplier_random_vs_bruteforce(tmp_path, ray_session):
    rng = np.random.default_rng(35)
    for trial in range(3):
        d = tmp_path / f"t{trial}"
        d.mkdir()
        _mk_star(d, rng)
        li = pq.read_table(str(d / "lineitem.parquet")).to_pandas()
        supp = pq.read_table(str(d / "supplier.parquet")).to_pandas()
        cents = {int(r.s_suppkey): int(np.floor(r.s_acctbal * 100 + 0.5))
                 for r in supp.itertuples()}
        nk = {int(r.s_suppkey): int(r.s_nationkey)
              for r in supp.itertuples()}
        best: dict[int, tuple] = {}
        for r in li.itertuples():
            p, s = int(r.l_partkey), int(r.l_suppkey)
            key = (cents[s], s)
            if p not in best or key < best[p]:
                best[p] = key
        want: dict[str, int] = {}
        for p, (_, s) in best.items():
            nm = f"N{nk[s]}"
            want[nm] = want.get(nm, 0) + 1
        got = QUERIES["part_q2_min_supplier"](str(d)).to_pandas()
        assert dict(zip(got["nation"], got["parts_won"])) == want


def test_q16_supplier_variety_random_vs_bruteforce(tmp_path, ray_session):
    rng = np.random.default_rng(36)
    for trial in range(2):
        d = tmp_path / f"t{trial}"
        d.mkdir()
        _mk_star(d, rng)
        li = pq.read_table(str(d / "lineitem.parquet")).to_pandas()
        part = pq.read_table(str(d / "part.parquet")).to_pandas()
        supp = pq.read_table(str(d / "supplier.parquet")).to_pandas()
        bad = {int(r.s_suppkey) for r in supp.itertuples()
               if r.s_acctbal < 0}
        pinfo = {int(r.p_partkey): (r.p_brand, r.p_type, int(r.p_size))
                 for r in part.itertuples()}
        groups: dict[tuple, set] = {}
        for r in li.itertuples():
            b, t, s = pinfo[int(r.l_partkey)]
            if b == "Brand#13" or t == "PROMO" or s not in {1, 4, 9}:
                continue
            if int(r.l_suppkey) in bad:
                continue
            groups.setdefault((b, t, s), set()).add(int(r.l_suppkey))
        got = QUERIES["part_q16_supplier_variety"](str(d)).to_pandas()
        got_map = {(r.p_brand, r.p_type, int(r.p_size)): int(r.supplier_cnt)
                   for r in got.itertuples()}
        assert got_map == {k: len(v) for k, v in groups.items()}


def _disc_quantile(vals, p):
    vals = sorted(vals)
    target = max(int(np.ceil(p * len(vals))), 1)
    return vals[target - 1]


def test_session_quantiles_random_vs_bruteforce(tmp_path, ray_session):
    rng = np.random.default_rng(37)
    for trial in range(3):
        d = tmp_path / f"t{trial}"
        d.mkdir()
        n = 150
        users = rng.integers(1, 12, n)
        base = int(dt.datetime(2024, 1, 1).timestamp())
        t = base + rng.integers(0, 8 * 3600, n)
        pq.write_table(pa.table({
            "event_id": pa.array(range(n), pa.int64()),
            "user_id": pa.array(users, pa.int64()),
            "ts": pa.array([dt.datetime.fromtimestamp(x) for x in t],
                           pa.timestamp("us")),
        }), str(d / "events.parquet"))
        durs = []
        from collections import defaultdict
        by_user = defaultdict(list)
        for u, x in zip(users, t):
            by_user[u].append(x)
        for ts in by_user.values():
            ts = sorted(ts)
            lo = prev = ts[0]
            for x in ts[1:]:
                if x - prev > 1800:
                    durs.append(prev - lo)
                    lo = x
                prev = x
            durs.append(prev - lo)
        got = QUERIES["events_session_quantiles"](str(d)).to_pandas()
        assert got["n_sessions"].iloc[0] == len(durs)
        for p, c in [(0.5, "p50"), (0.9, "p90"), (0.99, "p99")]:
            assert got[c].iloc[0] == _disc_quantile(durs, p)


def test_powerlaw_alpha_random_vs_bruteforce(tmp_path, ray_session):
    rng = np.random.default_rng(38)
    d = tmp_path / "t0"
    d.mkdir()
    n = 400
    users = rng.zipf(2.0, n) % 40
    pq.write_table(pa.table({
        "user_id": pa.array(users, pa.int64()),
    }), str(d / "events.parquet"))
    from collections import Counter
    counts = [c for c in Counter(users.tolist()).values() if c >= 2]
    alpha = 1.0 + len(counts) / sum(np.log(c / 1.5) for c in counts)
    got = QUERIES["events_powerlaw_alpha"](str(d)).to_pandas()
    assert got["n_users"].iloc[0] == len(counts)
    assert abs(got["alpha"].iloc[0] - alpha) < 1e-9


def test_curriculum_rank_is_expected_permutation(tmp_path, ray_session):
    rng = np.random.default_rng(39)
    d = tmp_path / "t0"
    d.mkdir()
    n = 300
    ids = rng.permutation(10_000)[:n].astype(np.int64)
    nchars = rng.integers(0, 1500, n).astype(np.int64)
    pq.write_table(pa.table({
        "doc_id": pa.array(ids),
        "n_chars": pa.array(nchars),
    }), str(d / "documents.parquet"))
    key = sorted(
        range(n),
        key=lambda i: (min(int(nchars[i]) // 100, 9),
                       hashlib.md5(str(ids[i]).encode()).hexdigest(),
                       int(ids[i])))
    want = {int(ids[i]): r for r, i in enumerate(key)}
    got = QUERIES["docs_curriculum_rank"](str(d)).to_pandas()
    assert dict(zip(got["doc_id"], got["curriculum_rank"])) == want


def test_doc_js_divergence_random_vs_bruteforce(tmp_path, ray_session):
    rng = np.random.default_rng(40)
    d = tmp_path / "t0"
    d.mkdir()
    n = 60
    texts = [" ".join(rng.choice(["a", "bb", "ccc", "dddd", "eeeee"],
                                 rng.integers(1, 30)).tolist())
             for _ in range(n)]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "source": pa.array(["s"] * n, pa.string()),
        "lang": pa.array(["en"] * n, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), str(d / "documents.parquet"))
    # tokens = word lengths (records_ds derivation)
    from collections import Counter
    docs = [[len(w) for w in t.split(" ")] for t in texts]
    glob = Counter(x for doc in docs for x in doc)
    tot = sum(glob.values())
    q = {t: c / tot for t, c in glob.items()}
    want = {}
    for i, doc in enumerate(docs):
        cn = Counter(doc)
        nn = len(doc)
        s_in = q_in = 0.0
        for t, c in cn.items():
            p = c / nn
            s_in += (p * np.log(2 * p / (p + q[t]))
                     + q[t] * np.log(2 * q[t] / (p + q[t])))
            q_in += q[t]
        want[i] = 0.5 * s_in + 0.5 * np.log(2.0) * (1 - q_in)
    got = QUERIES["tokens_doc_js_divergence"](str(d)).to_pandas()
    got_map = dict(zip(got["doc_id"], got["js"]))
    assert set(got_map) == set(want)
    for k in want:
        assert abs(got_map[k] - want[k]) < 1e-9, k


def test_neighbor_sim_hist_random_vs_bruteforce(tmp_path, ray_session):
    rng = np.random.default_rng(41)
    d = tmp_path / "t0"
    d.mkdir()
    n, dim = 80, 8
    mat = rng.normal(size=(n, dim)).astype(np.float32)
    pq.write_table(pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array(mat.tolist(), pa.list_(pa.float32())),
    }), str(d / "embeddings.parquet"))
    want: dict[int, int] = {}
    m64 = mat.astype(np.float64)
    for i in range(n - 1):
        a, b = m64[i], m64[i + 1]
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        bn = min(int(np.floor(cos * 10)), 9)
        want[bn] = want.get(bn, 0) + 1
    got = QUERIES["embed_neighbor_sim_hist"](str(d)).to_pandas()
    assert dict(zip(got["bin"], got["n_pairs"])) == want


def test_value_quantiles_by_type_random_vs_bruteforce(tmp_path,
                                                      ray_session):
    rng = np.random.default_rng(42)
    d = tmp_path / "t0"
    d.mkdir()
    n = 300
    types = rng.choice(["a", "b", "c"], n)
    vals = np.round(rng.uniform(0, 50, n), 2)
    pq.write_table(pa.table({
        "event_type": pa.array(types.tolist(), pa.string()),
        "value": pa.array(vals),
    }), str(d / "events.parquet"))
    from collections import defaultdict
    cents = defaultdict(list)
    for t, v in zip(types, vals):
        cents[t].append(int(np.floor(v * 100 + 0.5)))
    got = QUERIES["events_value_quantiles_by_type"](str(d)).to_pandas()
    for r in got.itertuples():
        assert r.p50_cents == _disc_quantile(cents[r.event_type], 0.5)
        assert r.p90_cents == _disc_quantile(cents[r.event_type], 0.9)
        assert r.p99_cents == _disc_quantile(cents[r.event_type], 0.99)
    assert set(got["event_type"]) == set(cents)


def test_active_days_hist_random_vs_bruteforce(tmp_path, ray_session):
    rng = np.random.default_rng(43)
    d = tmp_path / "t0"
    d.mkdir()
    n = 250
    users = rng.integers(1, 25, n)
    base = int(dt.datetime(2024, 1, 1).timestamp())
    t = base + rng.integers(0, 20 * 86400, n)
    pq.write_table(pa.table({
        "user_id": pa.array(users, pa.int64()),
        "ts": pa.array([dt.datetime.fromtimestamp(x) for x in t],
                       pa.timestamp("us")),
    }), str(d / "events.parquet"))
    from collections import defaultdict
    days = defaultdict(set)
    for u, x in zip(users, t):
        days[int(u)].add(x // 86400)
    from collections import Counter
    want = Counter(len(v) for v in days.values())
    got = QUERIES["events_active_days_hist"](str(d)).to_pandas()
    assert dict(zip(got["active_days"], got["n_users"])) == dict(want)


def test_weighted_sample_random_vs_bruteforce(tmp_path, ray_session):
    rng = np.random.default_rng(44)
    d = tmp_path / "t0"
    d.mkdir()
    n = 200
    ids = rng.permutation(5000)[:n].astype(np.int64)
    w = rng.integers(10, 800, n).astype(np.int64)
    pq.write_table(pa.table({
        "doc_id": pa.array(ids),
        "n_chars": pa.array(w),
    }), str(d / "documents.parquet"))
    DEN = 16.0 ** 13 + 1
    keys = []
    for i, ww in zip(ids, w):
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:13], 16)
        keys.append((np.log((h + 1) / DEN) / ww, -int(i)))
    want = {int(ids[j]) for j in
            sorted(range(n), key=lambda j: keys[j], reverse=True)[:50]}
    got = QUERIES["sample_weighted_no_replacement"](str(d)).to_pandas()
    assert set(got["doc_id"]) == want
    assert len(got) == 50
    # heavier docs must be over-represented vs uniform expectation
    assert got["weight"].mean() > w.mean()


def test_label_halves_drift_random_vs_bruteforce(tmp_path, ray_session):
    rng = np.random.default_rng(45)
    d = tmp_path / "t0"
    d.mkdir()
    n, dim = 120, 6
    mat = rng.normal(size=(n, dim)).astype(np.float32)
    labels = rng.integers(0, 4, n)
    pq.write_table(pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array(mat.tolist(), pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    }), str(d / "embeddings.parquet"))
    m64 = mat.astype(np.float64)
    want = {}
    for lb in np.unique(labels):
        for h, name in [(0, "c0"), (1, "c1")]:
            pass
        e = m64[(labels == lb) & (np.arange(n) % 2 == 0)]
        o = m64[(labels == lb) & (np.arange(n) % 2 == 1)]
        if len(e) and len(o):
            c0, c1 = e.mean(axis=0), o.mean(axis=0)
            want[int(lb)] = float(
                c0 @ c1 / (np.linalg.norm(c0) * np.linalg.norm(c1)))
    got = QUERIES["embed_label_halves_drift"](str(d)).to_pandas()
    got_map = dict(zip(got["label"], got["halves_cosine"]))
    assert set(got_map) == set(want)
    for k in want:
        assert abs(got_map[k] - want[k]) < 1e-9


def test_simpson_diversity_random_vs_bruteforce(tmp_path, ray_session):
    rng = np.random.default_rng(46)
    d = tmp_path / "t0"
    d.mkdir()
    n = 80
    srcs = rng.choice(["s0", "s1", "s2"], n)
    texts = [" ".join(rng.choice(["x", "yy", "zzz", "w", "v"],
                                 rng.integers(2, 25)).tolist())
             for _ in range(n)]
    pq.write_table(pa.table({
        "source": pa.array(srcs.tolist(), pa.string()),
        "text": pa.array(texts, pa.string()),
    }), str(d / "documents.parquet"))
    from collections import Counter, defaultdict
    cnt = defaultdict(Counter)
    for s, t in zip(srcs, texts):
        cnt[s].update(t.split(" "))
    got = QUERIES["docs_simpson_diversity"](str(d)).to_pandas()
    for r in got.itertuples():
        c = cnt[r.source]
        nn = sum(c.values())
        assert r.num == sum(v * (v - 1) for v in c.values())
        assert r.den == nn * (nn - 1)
    assert set(got["source"]) == set(cnt)
