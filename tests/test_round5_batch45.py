"""Batch 45: CDC chunk-store dedup + temporal pair mining."""

import hashlib

import numpy as np
import pyarrow as pa


def _brute_chunks(words: list[str], w: int = 3, mod: int = 8):
    """Straight-line CDC chunking: boundary after position i when the
    trailing w-word window hashes to 0 mod `mod`."""
    n = len(words)
    cuts = [
        i
        for i in range(w, n + 1)
        if int(hashlib.md5(" ".join(words[i - w : i]).encode()).hexdigest()[:8], 16)
        % mod
        == 0
    ]
    edges = [0] + cuts + ([n] if (not cuts or cuts[-1] != n) else [])
    return [words[s:e] for s, e in zip(edges[:-1], edges[1:])]


def test_cdc_chunk_hashes_reassemble_and_hash():
    from raylog.functions.text import cdc_chunk_hashes

    texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "one two",  # shorter than the window: single tail chunk
    ]
    batch = pa.table(
        {"doc_id": pa.array([10, 20, 30], pa.int64()), "text": pa.array(texts)}
    )
    out = cdc_chunk_hashes(batch)
    for did, text in zip([10, 20, 30], texts):
        words = text.split(" ")
        expect = _brute_chunks(words)
        rows = out.filter(pa.compute.equal(out["doc_id"], did))
        assert rows.num_rows == len(expect)
        # chunk word-lengths reassemble the doc
        assert sum(rows["clen"].to_pylist()) == len(words)
        exp_hashes = [
            int(hashlib.md5(" ".join(c).encode()).hexdigest()[:15], 16)
            for c in expect
        ]
        assert rows["chash"].to_pylist() == exp_hashes


def test_cdc_chunk_hashes_shared_chunk_same_hash():
    from raylog.functions.text import cdc_chunk_hashes

    # Two docs sharing a long identical prefix: every chunk fully inside
    # the shared prefix gets the identical content hash (the property the
    # dedup-ratio estimate rests on).
    shared = "w%d " * 40
    a = (shared % tuple(range(40))) + "tail one"
    b = (shared % tuple(range(40))) + "completely different ending here"
    batch = pa.table(
        {"doc_id": pa.array([1, 2], pa.int64()), "text": pa.array([a.strip(), b.strip()])}
    )
    out = cdc_chunk_hashes(batch)
    ha = out.filter(pa.compute.equal(out["doc_id"], 1))["chash"].to_pylist()
    hb = out.filter(pa.compute.equal(out["doc_id"], 2))["chash"].to_pylist()
    # all but the final (divergent) chunk agree
    assert len(ha) > 1 and ha[:-1] == hb[: len(ha) - 1]


def test_pair_within_window_matches_brute_force():
    import ray.data as rd

    from raylog.pipelines.queries_events import events_pair_within_window

    rng = np.random.default_rng(7)
    n = 400
    user = rng.integers(0, 12, n)
    ts_us = rng.integers(0, 2_000_000_000, n)  # spans well past the window
    etype = rng.choice(["a", "b", "c"], n)
    eid = np.arange(n, dtype=np.int64)
    tbl = pa.table(
        {
            "user_id": pa.array(user, pa.int64()),
            "event_id": pa.array(eid),
            "event_type": pa.array(etype),
            "ts": pa.array(ts_us, pa.timestamp("us")),
        }
    )
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        import pyarrow.parquet as pq

        pq.write_table(tbl, os.path.join(d, "events.parquet"))
        got = events_pair_within_window(d).to_pandas()

    W = 300_000_000
    brute: dict[tuple[str, str], int] = {}
    for i in range(n):
        for j in range(n):
            if user[i] != user[j]:
                continue
            if not (ts_us[j] > ts_us[i] or (ts_us[j] == ts_us[i] and eid[j] > eid[i])):
                continue
            if int(ts_us[j]) - int(ts_us[i]) > W:
                continue
            k = (etype[i], etype[j])
            brute[k] = brute.get(k, 0) + 1
    got_d = {
        (r.type_a, r.type_b): int(r.n_pairs) for r in got.itertuples(index=False)
    }
    assert got_d == brute


def test_profile_fd_audit_known_violations():
    import os
    import tempfile

    import pyarrow.parquet as pq

    from raylog.pipelines.queries_stats import profile_fd_audit

    # o_orderkey unique (FD holds, key candidate); o_custkey -> priority
    # violated by custkey 1 (two priorities); status -> priority violated.
    tbl = pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
        "o_custkey": pa.array([1, 1, 2, 3], pa.int64()),
        "o_orderstatus": pa.array(["O", "O", "F", "F"]),
        "o_orderpriority": pa.array(["1-HI", "2-LO", "1-HI", "1-HI"]),
    })
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(tbl, os.path.join(d, "orders.parquet"))
        got = profile_fd_audit(d).to_pandas().set_index(["lhs", "rhs"])
    k = got.loc[("o_orderkey", "o_custkey")]
    assert (k.n_lhs_distinct, k.n_violating_lhs, k.fd_holds) == (4, 0, 1)
    c = got.loc[("o_custkey", "o_orderpriority")]
    assert (c.n_lhs_distinct, c.n_pairs_distinct) == (3, 4)
    assert (c.n_violating_lhs, c.max_rhs_per_lhs, c.fd_holds) == (1, 2, 0)
    s = got.loc[("o_orderstatus", "o_orderpriority")]
    assert (s.n_violating_lhs, s.fd_holds) == (1, 0)
