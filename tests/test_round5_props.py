"""Seeded randomized brute-force checks for the round-5 batch 29-33
operators: an INDEPENDENT third implementation (plain Python over the
same fixture) must agree with the Ray pipeline — the DuckDB oracle
already cross-checks separately, so a bug would have to fool all
three.
"""

import datetime as dt

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from raylog.pipelines.queries import QUERIES

_T0 = dt.datetime(2024, 1, 1)
_GAP_US = 1_800_000_000


def _brute_sessions(users, ts_us):
    """[(lo, hi)] session intervals under the 30-min-gap rule."""
    from collections import defaultdict

    by_user = defaultdict(list)
    for u, t in zip(users, ts_us):
        by_user[u].append(t)
    ivs = []
    for u, ts in by_user.items():
        ts = sorted(ts)
        lo = prev = ts[0]
        for t in ts[1:]:
            if t - prev > _GAP_US:
                ivs.append((lo, prev))
                lo = t
            prev = t
        ivs.append((lo, prev))
    return ivs


def test_concurrency_scan_random_vs_bruteforce(tmp_path, ray_session):
    rng = np.random.default_rng(7)
    for trial in range(3):
        n_ev = 120
        users = rng.integers(1, 15, n_ev)
        base = int(_T0.timestamp() * 1e6)
        ts_us = base + rng.integers(0, 6 * 3600 * 1_000_000, n_ev)
        d = tmp_path / f"t{trial}"
        d.mkdir()
        pq.write_table(pa.table({
            "event_id": pa.array(range(n_ev), pa.int64()),
            "user_id": pa.array(users, pa.int64()),
            "ts": pa.array([dt.datetime.fromtimestamp(t / 1e6)
                            for t in ts_us], pa.timestamp("us")),
        }), str(d / "events.parquet"))
        # brute force: boundary sweep (+1 before -1 at equal ts)
        ivs = _brute_sessions(users, (ts_us // 1) .astype(int))
        bounds = sorted([(lo, 0) for lo, _ in ivs]
                        + [(hi, 1) for _, hi in ivs])
        conc = peak = 0
        peak_at = None
        lv_dur: dict[int, int] = {}
        for i, (t, kind) in enumerate(bounds):
            conc += 1 if kind == 0 else -1
            if conc > peak:
                peak, peak_at = conc, t
            if i + 1 < len(bounds):
                gap = bounds[i + 1][0] - t
                if gap > 0:
                    lv_dur[conc] = lv_dur.get(conc, 0) + gap
        got = QUERIES["events_peak_concurrency"](str(d)).to_pandas()
        assert got["peak_concurrency"].iloc[0] == peak
        assert got["peak_at_us"].iloc[0] == peak_at
        assert got["n_intervals"].iloc[0] == len(ivs)
        h = QUERIES["events_concurrency_histogram"](str(d)).to_pandas()
        want = {k: v for k, v in lv_dur.items() if v > 0}
        assert dict(zip(h["level"], h["dur_us"])) == want


def _write_docs(path, texts):
    path.mkdir(exist_ok=True)
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "source": pa.array(["s"] * len(texts), pa.string()),
    }), str(path / "documents.parquet"))
    return str(path)


def _rand_texts(rng, n_docs, max_len=12, vocab=6):
    texts = []
    for _ in range(n_docs):
        k = int(rng.integers(1, max_len))
        texts.append(" ".join(
            "x" * int(rng.integers(1, vocab + 1)) for _ in range(k)))
    return texts


def test_kn_continuation_random_vs_bruteforce(tmp_path, ray_session):
    rng = np.random.default_rng(11)
    for trial in range(3):
        texts = _rand_texts(rng, 40)
        sf = _write_docs(tmp_path / f"k{trial}", texts)
        # brute force: distinct (prev, cur) pairs over word lengths
        pairs = set()
        for t in texts:
            L = [len(w) for w in t.split(" ")]
            pairs.update(zip(L, L[1:]))
        n_cont: dict[int, int] = {}
        for _, cur in pairs:
            n_cont[cur] = n_cont.get(cur, 0) + 1
        tot = len(pairs)
        order = sorted(n_cont.items(), key=lambda kv: (-kv[1], kv[0]))
        got = QUERIES["tokens_kn_continuation"](sf).to_pandas()
        for i, (tok, nc) in enumerate(order[:20]):
            assert got["token"].iloc[i] == tok
            assert got["n_cont"].iloc[i] == nc
            assert got["cont_prob_e6"].iloc[i] == 1_000_000 * nc // tot


def test_burstiness_random_vs_bruteforce(tmp_path, ray_session):
    rng = np.random.default_rng(13)
    for trial in range(3):
        texts = _rand_texts(rng, 40)
        sf = _write_docs(tmp_path / f"b{trial}", texts)
        cf: dict[int, int] = {}
        df: dict[int, int] = {}
        for t in texts:
            L = [len(w) for w in t.split(" ")]
            for tok in L:
                cf[tok] = cf.get(tok, 0) + 1
            for tok in set(L):
                df[tok] = df.get(tok, 0) + 1
        order = sorted(cf.items(), key=lambda kv: (-kv[1], kv[0]))
        got = QUERIES["tokens_burstiness"](sf).to_pandas()
        for i, (tok, c) in enumerate(order[:20]):
            assert got["token"].iloc[i] == tok
            assert got["cf"].iloc[i] == c
            assert got["df"].iloc[i] == df[tok]
            assert got["burstiness_e3"].iloc[i] == 1000 * c // df[tok]


def test_split_boundary_random_vs_bruteforce(tmp_path, ray_session):
    rng = np.random.default_rng(17)
    # small vocab + short docs so real 8-gram boundary matches occur
    for trial in range(3):
        texts = []
        for _ in range(30):
            k = int(rng.integers(8, 12))
            texts.append(" ".join(
                "y" * int(rng.integers(1, 3)) for _ in range(k)))
        sf = _write_docs(tmp_path / f"s{trial}", texts)
        toks = [[len(w) for w in t.split(" ")] for t in texts]
        n_pairs = n_matches = 0
        for i in range(len(toks) - 1):
            a, b = toks[i], toks[i + 1]
            if len(a) >= 8 and len(b) >= 8:
                n_pairs += 1
                if a[-8:] == b[:8]:
                    n_matches += 1
        got = QUERIES["tokens_split_boundary_audit"](sf).to_pandas()
        assert got["n_pairs"].iloc[0] == n_pairs
        assert got["n_matches"].iloc[0] == n_matches
        assert n_pairs > 0
