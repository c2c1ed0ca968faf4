"""BPE train/encode: vs an independent scalar reference, round-trip,
partition invariance."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from raylog.functions.bpe import BPEModel, _EOW, bpe_encode_ds, bpe_train


# -- independent scalar reference (pure-Python dicts, no shared code) ------

def _ref_train(word_counts: dict[str, float], num_merges: int):
    """Classic dict-of-tuples BPE with (count desc, pair lexicographic)
    tie-break — mirrors the documented semantics, shares no code with
    the numpy implementation."""
    vocab = {tuple(w) + (_EOW,): c for w, c in word_counts.items()}
    merges = []
    for _ in range(num_merges):
        pairs: dict[tuple[str, str], float] = {}
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] = pairs.get(
                    (syms[i], syms[i + 1]), 0.0) + c
        if not pairs:
            break
        # tie-break: highest count, then lexicographically smallest pair
        bc = max(pairs.values())
        cand = sorted(p for p, c in pairs.items() if c == bc)
        a, b = cand[0]
        merges.append((a, b, a + b))
        new_vocab = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0.0) + c
        vocab = new_vocab
    return merges


def _ref_encode(word: str, merges) -> list[str]:
    syms = list(word) + [_EOW]
    for a, b, _ in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


CORPUS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "widest widest widest",
    "low lower newest",
]


def _docs():
    return pa.table({
        "doc_id": pa.array(np.arange(len(CORPUS), dtype=np.int64)),
        "text": pa.array(CORPUS, pa.string()),
    })


def test_bpe_train_matches_scalar_reference(ray_session):
    ds = rd.from_arrow(_docs())
    model = bpe_train(ds, num_merges=8)

    wc: dict[str, float] = {}
    for t in CORPUS:
        for w in t.split(" "):
            wc[w] = wc.get(w, 0.0) + 1.0
    ref = _ref_train(wc, 8)
    got = [(model.symbols[a], model.symbols[b]) for a, b, _ in model.merges]
    assert got == [(a, b) for a, b, _ in ref]


def test_bpe_encode_matches_scalar_and_roundtrips(ray_session):
    ds = rd.from_arrow(_docs())
    model = bpe_train(ds, num_merges=6)
    wc = {w for t in CORPUS for w in t.split(" ")}
    ref_m = [(model.symbols[a], model.symbols[b], model.symbols[z])
             for a, b, z in model.merges]
    enc = bpe_encode_ds(ds, model).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    for i, text in enumerate(CORPUS):
        toks = [model.symbols[t] for t in enc["bpe_tokens"][i]]
        want = [s for w in text.split(" ") for s in _ref_encode(w, ref_m)]
        assert toks == want, (i, toks, want)
        # round-trip decode
        assert model.decode_ids(np.asarray(enc["bpe_tokens"][i])) == text
        assert enc["n_bpe"][i] == len(want)


def test_bpe_partition_invariance(ray_session):
    one = bpe_train(rd.from_arrow(_docs()), num_merges=6)
    many = bpe_train(rd.from_arrow(_docs()).repartition(5), num_merges=6)
    assert one.merges == many.merges
    assert one.symbols == many.symbols


def test_bpe_overlapping_run_merge(ray_session):
    # 'aaaa' with merge (a,a): greedy left-to-right → (aa)(aa)
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "text": pa.array(["aaaa aaaa aaaa"], pa.string()),
    }))
    model = bpe_train(ds, num_merges=2)
    enc = bpe_encode_ds(ds, model).to_pandas()
    toks = [model.symbols[t] for t in enc["bpe_tokens"][0]]
    assert model.decode_ids(np.asarray(enc["bpe_tokens"][0])) == \
        "aaaa aaaa aaaa"
    # first merge must be (a,a) → 'aa'
    a, b, z = model.merges[0]
    assert model.symbols[a] == "a" and model.symbols[b] == "a"
    assert model.symbols[z] == "aa"


def test_bpe_utf8_corpus_roundtrips(ray_session):
    """Byte-level BPE: non-Latin-1 scripts (CJK, Cyrillic, emoji) train,
    encode and decode exactly (ADVICE r2: the latin-1 path raised)."""
    corpus = ["мир мир мир", "你好 你好 世界", "naïve café 🚀 🚀"]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(len(corpus), dtype=np.int64)),
        "text": pa.array(corpus, pa.string()),
    }))
    model = bpe_train(ds, num_merges=12)
    enc = bpe_encode_ds(ds, model).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    for i, text in enumerate(corpus):
        ids = np.asarray(enc["bpe_tokens"][i])
        assert (ids >= 0).all()
        assert model.decode_ids(ids) == text


def test_bpe_unseen_bytes_become_unk(ray_session):
    """Bytes absent from the training corpus encode to the reserved
    <unk> id — never a negative id (ADVICE r2)."""
    from raylog.functions.bpe import _UNK

    model = bpe_train(rd.from_arrow(_docs()), num_merges=4)
    unk_id = model.symbols.index(_UNK)
    probe = rd.from_arrow(pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "text": pa.array(["low λow"], pa.string()),
    }))
    enc = bpe_encode_ds(probe, model).to_pandas()
    ids = np.asarray(enc["bpe_tokens"][0])
    assert (ids >= 0).all()
    assert unk_id in ids
    # decode renders the unk marker, never a silently-wrong symbol
    assert _UNK in model.decode_ids(ids)
