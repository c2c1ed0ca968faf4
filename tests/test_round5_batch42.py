"""Batch 42: hashed classifier inference + per-domain caps + audio energy."""

import hashlib

import numpy as np
import pyarrow as pa


def test_hash_classifier_brute_force():
    from raylog.functions.text import hash_classifier

    texts = ["the a of", "zzz qq zzz", ""]
    out = hash_classifier(pa.table({
        "doc_id": pa.array([7, 8, 9], pa.int64()),
        "text": pa.array(texts),
    })).to_pandas().set_index("doc_id")

    def w(word):
        return int(hashlib.md5(word.encode()).hexdigest()[:8], 16) % 2001 - 1000

    for d, t in zip([7, 8, 9], texts):
        words = t.split(" ")  # '' splits to [''] — same as Arrow/DuckDB
        assert out.loc[d, "sum_w"] == sum(w(x) for x in words)
        assert out.loc[d, "n_tok"] == len(words)
        assert out.loc[d, "pred"] == int(out.loc[d, "sum_w"] > 0)


def test_hash_classifier_repeated_word_uses_count_not_membership():
    from raylog.functions.text import hash_classifier

    one = hash_classifier(pa.table({
        "doc_id": pa.array([1], pa.int64()), "text": pa.array(["zzz"])}))
    three = hash_classifier(pa.table({
        "doc_id": pa.array([1], pa.int64()), "text": pa.array(["zzz zzz zzz"])}))
    assert three["sum_w"][0].as_py() == 3 * one["sum_w"][0].as_py()


def test_web_domain_caps_property(sf_dir):
    import __ray_entry__ as E

    out = E.queries()["web_domain_caps"](sf_dir)
    df = out.to_pandas() if hasattr(out, "to_pandas") else out
    counts = df.groupby("domain").size()
    assert (counts <= 5).all()
    assert df.domain.str.match(r"^d\d+\.example\.com$").all()
    # kept docs per domain are the longest: spot-check one domain
    import duckdb
    dom = counts.index[0]
    full = duckdb.sql(f"""
        SELECT doc_id FROM read_parquet('{sf_dir}/documents.parquet')
        WHERE 'd' || CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),1,8))
              AS BIGINT) % 40 AS VARCHAR) || '.example.com' = '{dom}'
        ORDER BY n_chars DESC, doc_id LIMIT 5""").df()
    assert set(df[df.domain == dom].doc_id) == set(full.doc_id)


def test_topk_ds_matches_driver_topk():
    import numpy as np
    import ray.data as rd

    from raylog.functions.topk import topk, topk_ds

    rng = np.random.default_rng(0)
    t = pa.table({"g": rng.integers(0, 200, 5000),
                  "v": rng.integers(0, 1000, 5000),
                  "id": np.arange(5000)})
    a = topk(rd.from_arrow(t).repartition(7),
             sort_cols=["v", "id"], descending=[True, False],
             k=3, group_cols=["g"]).to_pandas()
    b = topk_ds(rd.from_arrow(t).repartition(7),
                sort_cols=["v", "id"], descending=[True, False],
                k=3, group_cols=["g"], num_partitions=5).to_pandas()
    key = ["g", "v", "id"]
    assert a.sort_values(key).reset_index(drop=True).equals(
        b[a.columns].sort_values(key).reset_index(drop=True))


def test_compression_ratio_brute_force_and_flags():
    import zlib

    from raylog.functions.text import compression_ratio

    texts = ["spam " * 200,
             "the quick brown fox jumps over the lazy dog " * 3,
             "k8s pod restart loop backoff exceeded threshold alert", ""]
    out = compression_ratio(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(texts),
    })).to_pandas().set_index("doc_id")
    for d, t in zip([1, 2, 3, 4], texts):
        raw, comp = len(t.encode()), len(zlib.compress(t.encode(), 6))
        assert out.loc[d, "raw_len"] == raw
        assert out.loc[d, "comp_len"] == comp
        expect = (1000 * comp) // raw if raw else 1000
        assert out.loc[d, "ratio_permille"] == expect
    assert out.loc[1, "flag_repetitive"] == 1      # 200× repeated word
    assert out.loc[3, "flag_repetitive"] == 0      # diverse short prose
    assert out.loc[4, "ratio_permille"] == 1000    # empty doc: neutral


def test_audio_vad_brute_force_islands():
    from raylog.functions.multimodal import AudioVAD, attach_wav_payload

    docs = pa.table({"doc_id": pa.array(list(range(12)), pa.int64())})
    out = AudioVAD()(attach_wav_payload(docs)).to_pandas().set_index("doc_id")
    for d in range(12):
        n = 256 + d % 512
        t = np.arange(n, dtype=np.int64)
        a = (((t * (2654435761 + d)) >> 7) % 65536 - 32768)
        starts = np.arange(0, n, 64)
        sq = np.add.reduceat(a * a, starts)
        cnt = np.minimum(starts + 64, n) - starts
        v = (sq >= 358_000_000 * cnt).astype(int)
        runs, run = [], 0
        for x in v:
            if x:
                run += 1
            elif run:
                runs.append(run)
                run = 0
        if run:
            runs.append(run)
        assert out.loc[d, "n_voiced"] == v.sum()
        assert out.loc[d, "n_segments"] == len(runs)
        assert out.loc[d, "longest_seg"] == (max(runs) if runs else 0)


def test_audio_vad_all_silent_and_all_voiced_edges():
    from raylog.functions import codecs
    from raylog.functions.multimodal import AudioVAD

    silent = codecs.encode_wav(np.zeros(200, np.int16), 8000)
    loud = codecs.encode_wav(np.full(200, 30000, np.int16), 8000)
    t = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "payload": pa.array([silent, loud], pa.binary()),
    })
    out = AudioVAD()(t).to_pandas().set_index("doc_id")
    assert (out.loc[1] == [0, 0, 0]).all()          # no voiced windows
    assert out.loc[2, "n_segments"] == 1            # one unbroken island
    assert out.loc[2, "n_voiced"] == 4              # ceil(200/64)
    assert out.loc[2, "longest_seg"] == 4


def test_k_anonymity_invariants(sf_dir):
    import __ray_entry__ as E

    df = E.queries()["events_k_anonymity"](sf_dir).to_pandas()
    df = df.sort_values("k").reset_index(drop=True)
    # violations are monotone nondecreasing in k; groups constant
    assert df.n_violating_rows.is_monotonic_increasing
    assert df.n_violating_groups.is_monotonic_increasing
    assert df.n_groups.nunique() == 1
    assert (df.n_violating_rows >= df.n_violating_groups).all()


def test_split_leakage_invariants(sf_dir):
    import __ray_entry__ as E

    df = E.queries()["dedup_split_leakage"](sf_dir).to_pandas()
    r = df.iloc[0]
    assert 0 <= r.n_cross_pairs <= r.n_pairs
    # each cross pair leaks exactly one test doc, docs can repeat
    assert r.n_leaked_test_docs <= r.n_cross_pairs


def test_cdc_chunks_shift_stability():
    """The CDC property fixed-size chunking lacks: prepending words only
    reshapes the prefix — boundaries inside untouched content stay."""
    from raylog.functions.text import cdc_chunks

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lam mu nu xi omicron pi rho sigma tau upsilon") * 3
    shifted = "zz qq " + base

    def boundaries(text):
        import hashlib
        words = text.split(" ")
        return [i for i in range(3, len(words) + 1)
                if int(hashlib.md5(" ".join(words[i-3:i]).encode())
                       .hexdigest()[:8], 16) % 8 == 0]

    b0 = boundaries(base)
    b1 = boundaries(shifted)
    # every original boundary beyond the 2-word prefix window survives
    assert set(x + 2 for x in b0 if x > 3) <= set(b1)

    out = cdc_chunks(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array([base, shifted]),
    })).to_pandas().set_index("doc_id")
    for d, t, b in [(1, base, b0), (2, shifted, b1)]:
        n = len(t.split(" "))
        edges = [0] + b + ([n] if (not b or b[-1] != n) else [])
        lens = np.diff(edges)
        assert out.loc[d, "n_chunks"] == len(lens)
        assert out.loc[d, "longest_chunk"] == lens.max()
        assert out.loc[d, "n_words"] == n


def test_dim_truncation_prefix_slice_is_exact(sf_dir):
    """The vectorized offsets rebuild slices exactly the first 32 dims."""
    import numpy as np
    import ray.data as rd

    import __ray_entry__ as E

    out = E.queries()["embed_dim_truncation_agreement"](sf_dir).to_pandas()
    assert len(out) == 20
    assert set(out.columns) == {"query_id", "top1_full", "top1_half", "agree"}
    assert ((out.agree == 0) | (out.top1_full == out.top1_half)).all()
    assert ((out.agree == 1) == (out.top1_full == out.top1_half)).all()
