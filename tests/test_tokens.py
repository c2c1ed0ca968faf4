"""Token-payload statistics: unigram/bigram counts vs a numpy reference."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from raylog.functions.tokens import (
    bigram_count_partial,
    bigram_top_terms,
    token_frequencies,
    token_top_terms,
)


def _synth_lists(n_rows=2000, vocab=5000, seed=7):
    rng = np.random.default_rng(seed)
    lengths = rng.integers(0, 12, size=n_rows)  # includes empty lists
    vals = rng.integers(-vocab // 2, vocab // 2, size=int(lengths.sum()),
                        dtype=np.int32)  # negative tokens exercise packing
    offsets = np.concatenate([[0], np.cumsum(lengths)]).astype(np.int32)
    arr = pa.ListArray.from_arrays(pa.array(offsets), pa.array(vals))
    return pa.table({"tokens": arr}), vals, lengths


def test_token_frequencies_high_cardinality():
    tbl, vals, _ = _synth_lists()
    ds = rd.from_arrow(tbl).repartition(8)
    got = token_frequencies(ds).to_pandas().sort_values("token").reset_index(drop=True)
    want_tok, want_cnt = np.unique(vals, return_counts=True)
    assert got["token"].to_numpy().tolist() == want_tok.astype(np.int64).tolist()
    assert got["cnt"].to_numpy().tolist() == want_cnt.astype(np.int64).tolist()


def test_bigram_partial_masks_row_boundaries():
    # rows [1,2,3] and [3,4]: bigram (3,3) across the boundary must NOT appear
    arr = pa.ListArray.from_arrays(
        pa.array([0, 3, 5], pa.int32()), pa.array([1, 2, 3, 3, 4], pa.int32())
    )
    out = bigram_count_partial(pa.table({"tokens": arr})).to_pandas()
    pairs = set(zip(out.t1, out.t2))
    assert pairs == {(1, 2), (2, 3), (3, 4)}


def test_bigram_empty_and_singleton_rows():
    arr = pa.ListArray.from_arrays(
        pa.array([0, 0, 1, 1, 3], pa.int32()),
        pa.array([9, 5, 6], pa.int32()),
    )
    out = bigram_count_partial(pa.table({"tokens": arr})).to_pandas()
    assert set(zip(out.t1, out.t2)) == {(5, 6)}


def test_topk_matches_reference():
    tbl, vals, lengths = _synth_lists(n_rows=500, vocab=40)
    ds = rd.from_arrow(tbl).repartition(4)
    got = token_top_terms(ds, k=10).to_pandas()
    want_tok, want_cnt = np.unique(vals, return_counts=True)
    order = np.lexsort((want_tok, -want_cnt))[:10]
    assert got["token"].tolist() == want_tok[order].astype(np.int64).tolist()
    assert got["cnt"].tolist() == want_cnt[order].astype(np.int64).tolist()
    assert got["rank"].tolist() == list(range(1, 11))

    # bigram reference: pairs within rows only
    offs = np.concatenate([[0], np.cumsum(lengths)])
    ref = {}
    for s, e in zip(offs[:-1], offs[1:]):
        for i in range(s, e - 1):
            p = (int(vals[i]), int(vals[i + 1]))
            ref[p] = ref.get(p, 0) + 1
    got2 = bigram_top_terms(ds, k=5).to_pandas()
    best = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert [((a, b), c) for (a, b), c in
            zip(zip(got2.t1, got2.t2), got2.cnt)] == best


def test_chunk_texts_edges():
    from raylog.functions.text import chunk_texts

    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(["abcdefghij", "xy", "", "a" * 25]),
    })
    out = chunk_texts(t, size=8, stride=5).to_pandas()
    # doc 1 (10 chars): chunks at 0,5 → "abcdefgh","fghij"
    d1 = out[out.doc_id == 1]
    assert d1["chunk"].tolist() == ["abcdefgh", "fghij"]
    assert d1["chunk_idx"].tolist() == [0, 1]
    # doc 2 short → single chunk; doc 3 empty → no chunks
    assert out[out.doc_id == 2]["chunk"].tolist() == ["xy"]
    assert len(out[out.doc_id == 3]) == 0
    # doc 4 (25 chars): starts 0,5,10,15,20 → lens 8,8,8,8,5
    d4 = out[out.doc_id == 4]
    assert d4["chunk_len"].tolist() == [8, 8, 8, 8, 5]
    assert all(c == "a" * ln for c, ln in zip(d4["chunk"], d4["chunk_len"]))


def test_chunk_texts_sliced_batch():
    from raylog.functions.text import chunk_texts

    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["hello world", "foo", "barbaz"]),
    }).slice(1, 2)  # non-zero arrow offset must not break buffer math
    out = chunk_texts(t, size=4, stride=3).to_pandas()
    assert out[out.doc_id == 2]["chunk"].tolist() == ["foo"]
    assert out[out.doc_id == 3]["chunk"].tolist() == ["barb", "baz"]


class TestSequenceDedup:
    def test_identical_arrays_collapse_order_matters(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from raylog.functions.tokens import dedup_sequences

        tbl = pa.table({
            "doc_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
            "tokens": pa.array(
                [[1, 2, 3], [3, 2, 1], [1, 2, 3], [1, 2], [], []],
                pa.list_(pa.int32())),
        })
        out = dedup_sequences(rd.from_arrow(tbl)).to_pandas()
        # [1,2,3] collapses (min id 1); reversed order is DISTINCT;
        # prefix is distinct; empty arrays collapse
        assert sorted(out["doc_id"]) == [1, 2, 4, 5]

    def test_hashes_distinguish_tricky_shapes(self):
        import numpy as np
        import pyarrow as pa

        from raylog.functions.tokens import sequence_hash_columns

        tbl = pa.table({
            "tokens": pa.array(
                [[0], [0, 0], [0, 0, 0], [], [1, 0], [0, 1]],
                pa.list_(pa.int32())),
        })
        h = sequence_hash_columns(tbl)
        pairs = list(zip(h["seq_h1"].to_pylist(), h["seq_h2"].to_pylist()))
        assert len(set(pairs)) == len(pairs)  # all distinct


def test_repetition_fraction_scalar_reference():
    """Vectorized repeated-trigram fraction == literal per-doc python,
    including all-repeat, no-repeat, and too-short edges."""
    import numpy as np
    import pyarrow as pa

    from raylog.functions.tokens import repetition_fraction_batch

    rng = np.random.default_rng(9)
    tokens = [rng.integers(0, 5, rng.integers(1, 30)).tolist()
              for _ in range(200)]
    tokens += [[7] * 20, list(range(20)), [1, 2]]  # edges
    tbl = pa.table({
        "doc_id": pa.array(range(len(tokens)), pa.int64()),
        "tokens": pa.array(tokens, pa.list_(pa.int32())),
    })
    out = repetition_fraction_batch(tbl)
    got = {r["doc_id"]: (r["n_grams"], r["n_distinct"], r["rep_milli"])
           for r in out.to_pylist()}
    for i, toks in enumerate(tokens):
        grams = [tuple(toks[j:j + 3]) for j in range(len(toks) - 2)]
        if not grams:
            assert i not in got
            continue
        nd = len(set(grams))
        assert got[i] == (len(grams), nd,
                          1000 * (len(grams) - nd) // len(grams))
    assert got[len(tokens) - 3][2] == 1000 * (18 - 1) // 18  # all-repeat
    assert got[len(tokens) - 2][2] == 0                      # no repeats


def test_fim_transform_checksum_matches_materialized():
    """The no-materialize weighted-sum checksum must equal a literal
    python PSM reorder ([PRE] pre [SUF] suf [MID] mid), incl. empty and
    tiny docs and both coin branches."""
    import numpy as np
    import pyarrow as pa

    from raylog.functions.tokens import (FIM_MID, FIM_PRE, FIM_SUF,
                                         fim_transform_batch)

    rng = np.random.default_rng(21)
    tokens = [rng.integers(0, 50_000, rng.integers(0, 30)).tolist()
              for _ in range(300)]
    ids = list(range(300)) + [3_500_000_000, 2**62]  # large-id coins too
    tokens += [[1, 2, 3], [7]]
    tbl = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "tokens": pa.array(tokens, pa.list_(pa.int32())),
    })
    out = {r["doc_id"]: r for r in fim_transform_batch(tbl).to_pylist()}
    for d, toks in zip(ids, tokens):
        coin = (d * 2654435761) % (1 << 32)
        n = len(toks)
        fim = coin % 2 == 0
        if fim:
            s1 = (coin // 2) % (n + 1)
            s2 = s1 + (coin // 1024) % (n - s1 + 1)
            seq = ([FIM_PRE] + toks[:s1] + [FIM_SUF] + toks[s2:]
                   + [FIM_MID] + toks[s1:s2])
        else:
            seq = toks
        want = sum((i + 1) * t for i, t in enumerate(seq))
        r = out[d]
        assert r["fim"] == fim
        assert r["n_out"] == len(seq)
        assert r["fim_checksum"] == want, (d, toks)


class TestSkipgramCooc:
    def test_partial_counts_match_bruteforce(self):
        """Windowed co-occurrence partials vs a per-row double loop
        (both directions, distances 1..w, boundaries never crossed)."""
        from collections import Counter

        from raylog.functions.tokens import skipgram_count_partial

        tbl, vals, lengths = _synth_lists(n_rows=300, vocab=40, seed=11)
        for w in (1, 2, 3):
            out = skipgram_count_partial(tbl, window=w).to_pandas()
            got = {(a, b): c for a, b, c in zip(out.a, out.b, out.cnt)}
            want: Counter = Counter()
            pos = 0
            for ln in lengths:
                row = vals[pos:pos + ln]
                pos += ln
                for i in range(len(row)):
                    for d in range(1, w + 1):
                        if i + d < len(row):
                            want[(row[i], row[i + d])] += 1
                            want[(row[i + d], row[i])] += 1
            assert got == dict(want), f"window={w}"

    def test_counts_symmetric(self):
        from raylog.functions.tokens import skipgram_count_partial

        tbl, _, _ = _synth_lists(n_rows=200, vocab=25, seed=3)
        out = skipgram_count_partial(tbl, window=2).to_pandas()
        got = {(a, b): c for a, b, c in zip(out.a, out.b, out.cnt)}
        assert all(got[(b, a)] == c for (a, b), c in got.items())

    def test_top_cooc_distributed_matches_single_partial(self, ray_session):
        from raylog.functions.tokens import (
            skipgram_count_partial,
            skipgram_top_cooc,
        )

        tbl, _, _ = _synth_lists(n_rows=1500, vocab=20, seed=5)
        got = skipgram_top_cooc(
            rd.from_arrow(tbl).repartition(6), k=10, window=2
        ).to_pandas()
        ref = (skipgram_count_partial(tbl, window=2).to_pandas()
               .sort_values(["cnt", "a", "b"],
                            ascending=[False, True, True],
                            kind="mergesort").head(10).reset_index(drop=True))
        assert got.a.tolist() == ref.a.tolist()
        assert got.b.tolist() == ref.b.tolist()
        assert got.cnt.tolist() == ref.cnt.tolist()
        assert got["rank"].tolist() == list(range(1, 11))


def test_zipf_slope_closed_form_matches_polyfit(ray_session):
    from raylog.functions.tokens import zipf_slope

    tbl, vals, _ = _synth_lists(n_rows=2000, vocab=50, seed=13)
    out = zipf_slope(rd.from_arrow(tbl).repartition(4), k=30).to_pandas()
    tok, cnt = np.unique(vals, return_counts=True)
    order = np.lexsort((tok, -cnt))[:30]
    y = np.log(cnt[order].astype(float))
    x = np.log(np.arange(1, len(order) + 1, dtype=float))
    want = np.polyfit(x, y, 1)[0]
    assert out.n_terms[0] == 30
    assert abs(out.slope[0] - want) < 1e-9


def test_bigram_pmi_matches_bruteforce(ray_session):
    """pmi = ln((c_ab/N2) / ((c_a/N1)(c_b/N1))) against per-pair
    recomputation from exact numpy counts."""
    from collections import Counter

    from raylog.functions.tokens import bigram_pmi

    tbl, vals, lengths = _synth_lists(n_rows=800, vocab=15, seed=9)
    out = bigram_pmi(rd.from_arrow(tbl).repartition(4), k=12).to_pandas()
    uni = Counter(vals.tolist())
    n1 = sum(uni.values())
    pairs: Counter = Counter()
    pos = 0
    for ln in lengths:
        row = vals[pos:pos + ln]
        pos += ln
        pairs.update(zip(row[:-1].tolist(), row[1:].tolist()))
    n2 = sum(pairs.values())
    assert n2 == sum(max(0, ln - 1) for ln in lengths)
    for r in out.itertuples():
        want = np.log((pairs[(r.t1, r.t2)] / n2)
                      / ((uni[r.t1] / n1) * (uni[r.t2] / n1)))
        assert abs(r.pmi - want) < 1e-12
        assert r.cnt == pairs[(r.t1, r.t2)]


def test_prefix_dedup_keeps_longest_capture():
    from raylog.functions.tokens import prefix_dedup_survivors

    rng = np.random.default_rng(3)
    head = rng.integers(0, 1000, size=64).tolist()
    other = rng.integers(0, 1000, size=64).tolist()
    rows = [
        (1, head + [5] * 100),     # same head, mid length
        (2, head + [9] * 400),     # same head, LONGEST -> survivor
        (3, head),                 # exactly the prefix
        (4, other + [1] * 10),     # different head, alone
        (5, [1, 2, 3]),            # shorter than k: exempt entirely
    ]
    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "tokens": pa.array([r[1] for r in rows], pa.list_(pa.int32())),
        "n_tok": pa.array([len(r[1]) for r in rows], pa.int32()),
    })
    out = prefix_dedup_survivors(rd.from_arrow(tbl)).to_pandas()
    got = {r.doc_id: (r.n_tok, r.n_shared) for r in out.itertuples()}
    assert got == {2: (464, 3), 4: (74, 1)}
