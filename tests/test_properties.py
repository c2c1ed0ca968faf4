"""Property-based tests: vectorized kernels vs literal Python models.

These run WITHOUT Ray (stages are pure ``pa.Table -> pa.Table``
functions), so hypothesis can hammer them cheaply. The Python models are
the reference-literal implementations from tests/row_oracle.py.
"""

import re
from datetime import datetime, timezone

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from raylog.stages import parse, reshape
from tests import row_oracle

# text fragments that stress the erda-info regex: level-like words,
# brackets, uuid-ish tokens, unicode
_fragment = st.sampled_from(
    ["INFO", "Err", "ERR", "ERROR", "Warning", "warn", "[", "]", ",",
     "svc-1", "12345678-0000-4000-8000-000000000000",
     "{12345678-0000-4000-8000-000000000000}", "plain", "日志", " ", "-", "_",
     "k=v", "stderr", "12345678000040008000000000000000"]
)
_line = st.lists(_fragment, min_size=0, max_size=12).map(" ".join)


@settings(max_examples=300, deadline=None)
@given(st.lists(_line, min_size=1, max_size=20))
def test_erda_info_matches_python_re(lines):
    out = parse.erda_info(pa.table({"log": pa.array(lines, pa.string())}))
    got_level = out["level"].to_pylist()
    got_req = out["request_id"].to_pylist()
    for line, lvl, req in zip(lines, got_level, got_req):
        m = row_oracle.ERDA_INFO_RE.search(line)
        want_lvl = m.group("level") if m else None
        want_req = m.group("request_id") if m else None
        assert lvl == want_lvl, (line, lvl, want_lvl)
        assert req == want_req, (line, req, want_req)


@settings(max_examples=200, deadline=None)
@given(
    st.datetimes(min_value=datetime(1971, 1, 1), max_value=datetime(2200, 1, 1)),
    st.integers(min_value=0, max_value=999_999_999),
    st.sampled_from(["Z", "+00:00", "+08:00", "-05:30", "+13:45"]),
)
def test_time_parse_matches_python(dt, frac_ns, tz):
    s = dt.strftime("%Y-%m-%dT%H:%M:%S") + f".{frac_ns:09d}" + tz
    got = parse.parse_cri_time_ns(pa.array([s]))[0].as_py()
    want = row_oracle.parse_time_ns(s)
    assert got == want, (s, got, want)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=200), st.integers(min_value=0, max_value=64))
def test_truncate_matches_python_slice(text, cap):
    out = parse.truncate_content(
        pa.table({"log": pa.array([text], pa.string())}), cap=cap
    )
    assert out["log"].to_pylist() == [text[:cap]]


_colname = st.sampled_from(["a", "b", "c", "d"])
_op = st.one_of(
    st.tuples(st.sampled_from(["rename", "hard_rename", "copy", "hard_copy"]),
              _colname, _colname),
    st.tuples(st.sampled_from(["add", "set"]), _colname, st.text(max_size=5)),
    st.tuples(st.just("remove"), _colname),
)


@settings(max_examples=300, deadline=None)
@given(st.lists(_op, max_size=8))
def test_apply_modify_matches_dict_model(ops):
    ops = [op for op in ops if not (op[0] in ("rename", "hard_rename",
                                              "copy", "hard_copy")
                                    and op[1] == op[2])]
    batch = pa.table({"a": [1], "b": [2]})
    got = reshape.apply_modify(batch, ops)

    # literal dict model of fluent-bit modify semantics
    rec = {"a": 1, "b": 2}
    for op in ops:
        kind = op[0]
        if kind in ("rename", "hard_rename", "copy", "hard_copy"):
            _, src, dst = op
            if src not in rec:
                continue
            if dst in rec and kind in ("rename", "copy"):
                continue
            rec[dst] = rec[src]
            if kind in ("rename", "hard_rename"):
                del rec[src]
        elif kind == "add":
            rec.setdefault(op[1], op[2])
        elif kind == "set":
            rec[op[1]] = op[2]
        elif kind == "remove":
            rec.pop(op[1], None)

    got_rec = {c: got[c][0].as_py() for c in got.column_names}
    assert got_rec == rec, (ops, got_rec, rec)


@settings(max_examples=100, deadline=None)
@given(st.dictionaries(
    st.sampled_from(["__tags_a", "__tags_b", "__tags_cc", "other"]),
    st.one_of(st.none(), st.text(max_size=6)),
    min_size=1, max_size=4,
))
def test_nest_lift_roundtrip_property(cols):
    batch = pa.table({k: pa.array([v], pa.string()) for k, v in cols.items()})
    tagged = [c for c in cols if c.startswith("__tags_")]
    nested = reshape.nest_columns(batch, "__tags_", "tags")
    lifted = reshape.lift_struct(nested, "tags", prefix="__tags_")
    for c in tagged:
        assert lifted[c].to_pylist() == [cols[c]], c


# ---------------------------------------------------------------------------
# Round-2 session kernels: chunking, bigram masking, packing closed form
# ---------------------------------------------------------------------------

@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.text(alphabet=st.characters(min_codepoint=32,
                                            max_codepoint=126),
                     min_size=0, max_size=40),
             min_size=1, max_size=12),
    st.integers(min_value=2, max_value=15),
    st.integers(min_value=1, max_value=12),
)
def test_chunk_texts_model(texts, size, stride):
    from raylog.functions.text import chunk_texts

    stride = min(stride, size)  # chunks must advance but may overlap
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts),
    })
    out = chunk_texts(t, size=size, stride=stride).to_pandas()
    want = []
    for did, s in enumerate(texts):
        i = 0
        while i * stride < len(s):
            want.append((did, i, s[i * stride: i * stride + size]))
            i += 1
    got = list(zip(out["doc_id"], out["chunk_idx"], out["chunk"]))
    assert got == want


@settings(max_examples=200, deadline=None)
@given(st.lists(st.lists(st.integers(min_value=-2**31, max_value=2**31 - 1),
                         min_size=0, max_size=8),
                min_size=1, max_size=10))
def test_masked_bigram_keys_model(rows):
    import numpy as np

    from raylog.functions.tokens import _masked_bigram_keys

    vals = np.array([v for r in rows for v in r], dtype=np.int32)
    lengths = np.array([len(r) for r in rows], dtype=np.int64)
    if len(vals) < 2:
        return
    got = _masked_bigram_keys(np.asarray(vals), lengths)
    want = []
    for r in rows:
        for a, b in zip(r[:-1], r[1:]):
            ua = np.int32(a).view(np.uint32)
            ub = np.int32(b).view(np.uint32)
            want.append((int(ua) << 32) | int(ub))
    assert got.tolist() == want


@settings(max_examples=150, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=300), min_size=1,
                max_size=60),
       st.integers(min_value=1, max_value=64))
def test_pack_chunks_model_single_shard(lens, cap):
    import numpy as np
    import pyarrow as pa

    from raylog.functions.packing import pack_chunks
    import ray.data as rd

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(lens)), type=pa.int64()),
        "n_tok": pa.array(lens, pa.int64()),
    }))
    out = pack_chunks(ds, max_tokens=cap, num_shards=1,
                      num_partitions=1).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    cum = 0
    for i, ln in enumerate(lens):
        start, cum = cum, cum + ln
        assert out["first_pack"][i] == start // cap
        assert out["first_offset"][i] == start % cap
        want_last = (cum - 1) // cap if ln > 0 else start // cap
        assert out["last_pack"][i] == want_last


# --------------------------------------------------------------------------
# BPE merge kernel: vectorized run-parity merge vs a literal scalar model
# --------------------------------------------------------------------------

@settings(max_examples=300, deadline=None)
@given(
    st.lists(st.lists(st.integers(0, 3), min_size=1, max_size=12),
             min_size=1, max_size=8),
    st.integers(0, 3), st.integers(0, 3),
)
def test_bpe_apply_merge_matches_scalar(words, a, b):
    import numpy as np

    from raylog.functions.bpe import _apply_merge

    flat = np.array([s for w in words for s in w], dtype=np.int64)
    off = np.concatenate([[0], np.cumsum([len(w) for w in words])]).astype(
        np.int64)
    z = 99
    got_flat, got_off = _apply_merge(flat, off, a, b, z)

    # scalar left-to-right greedy merge per word
    exp = []
    for w in words:
        out, i = [], 0
        while i < len(w):
            if i + 1 < len(w) and w[i] == a and w[i + 1] == b:
                out.append(z)
                i += 2
            else:
                out.append(w[i])
                i += 1
        exp.append(out)
    exp_flat = [s for w in exp for s in w]
    exp_off = [0]
    for w in exp:
        exp_off.append(exp_off[-1] + len(w))
    assert got_flat.tolist() == exp_flat
    assert got_off.tolist() == exp_off


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(0, 300), min_size=0, max_size=400),
       st.integers(1, 6))
def test_histogram_binning_matches_float_formula(vals, nbins_pow):
    """docs_histogram's bin rule: numpy floor == the SQL FLOOR restated."""
    import numpy as np

    if not vals:
        return
    nbins = 2 ** nbins_pow
    x = np.asarray(vals, dtype=np.float64)
    lo, hi = x.min(), x.max()
    bins = np.minimum(np.floor((x - lo) * nbins / (hi - lo + 1.0))
                      .astype(np.int64), nbins - 1)
    assert (bins >= 0).all() and (bins < nbins).all()
    # monotone: larger value never gets a smaller bin
    order = np.argsort(x)
    assert (np.diff(bins[order]) >= 0).all()


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(1, 50), min_size=2, max_size=30))
def test_gini_histogram_matches_sorted_formula(counts):
    """events_user_gini's tie-block rank arithmetic vs the literal
    sorted-rank Gini formula."""
    import numpy as np

    x = np.sort(np.asarray(counts, dtype=np.float64))
    k = len(x)
    s = x.sum()
    ranks = np.arange(1, k + 1)
    gini_ref = 2.0 * (ranks * x).sum() / (k * s) - (k + 1.0) / k

    vals, mult = np.unique(x, return_counts=True)
    c0 = np.concatenate([[0.0], np.cumsum(mult)[:-1]])
    sin = (vals * (mult * c0 + mult * (mult + 1) / 2)).sum()
    gini_hist = 2.0 * sin / (k * s) - (k + 1.0) / k
    assert abs(gini_ref - gini_hist) < 1e-12


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(0, 10 ** 12), min_size=1, max_size=200))
def test_benford_integer_digit_strip(vals):
    """Exact integer leading-digit strip vs string slicing."""
    import numpy as np

    xi = np.asarray([v for v in vals if v >= 1], dtype=np.int64)
    if len(xi) == 0:
        return
    lead = xi.copy()
    while (lead >= 10).any():
        big = lead >= 10
        lead[big] //= 10
    want = [int(str(v)[0]) for v in xi.tolist()]
    assert lead.tolist() == want


# --- round-3 kernels: hypothesis vs literal Python models ---------------


@settings(max_examples=150, deadline=None)
@given(st.lists(
    st.lists(st.integers(min_value=0, max_value=10**12), min_size=0,
             max_size=30).map(lambda v: sorted(set(v))),
    min_size=2, max_size=20).filter(lambda ls: len(ls) % 2 == 0))
def test_segmented_intersect_counts_matches_set_model(sets):
    import numpy as np

    from raylog.functions.dedup import _segmented_intersect_counts

    half = len(sets) // 2
    a, b = sets[:half], sets[half:]
    fa = np.array([x for s in a for x in s], dtype=np.uint64)
    fb = np.array([x for s in b for x in s], dtype=np.uint64)
    la = np.array([len(s) for s in a], dtype=np.int64)
    lb = np.array([len(s) for s in b], dtype=np.int64)
    got = _segmented_intersect_counts(fa, la, fb, lb)
    want = [len(set(x) & set(y)) for x, y in zip(a, b)]
    assert got.tolist() == want


@settings(max_examples=150, deadline=None)
@given(st.lists(st.integers(min_value=1, max_value=500), min_size=1,
                max_size=60),
       st.integers(min_value=1, max_value=64))
def test_dd_bucket_alpha_guarantee(vals, denom):
    """dd_value(dd_bucket(x)) is within alpha of x for every positive x
    (the DDSketch defining property), across magnitudes."""
    import numpy as np

    from raylog.functions.quantile import dd_bucket, dd_value

    alpha = 0.01 + (denom % 5) * 0.01
    x = np.array(vals, dtype=np.float64) / denom
    est = dd_value(dd_bucket(x, alpha), alpha)
    assert (np.abs(est - x) <= alpha * x * (1 + 1e-9)).all()


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=9), min_size=8,
                max_size=40),
       st.integers(min_value=0, max_value=1000))
def test_span_corruption_mask_model(tokens, doc_id):
    """The vectorized mask equals the literal per-position model."""
    import numpy as np

    p = np.arange(len(tokens), dtype=np.int64)
    phase = (p + doc_id * 7) % 10
    masked = (phase == 0)
    masked |= (p >= 1) & ((phase - 1) % 10 == 0)
    masked |= (p >= 2) & ((phase - 2) % 10 == 0)
    want = [any((s + doc_id * 7) % 10 == 0
                for s in range(max(0, i - 2), i + 1))
            for i in range(len(tokens))]
    assert masked.tolist() == want


def test_pack_chunks_closed_form_matches_accumulator():
    """first/last pack + offset from the running-sum closed form equal a
    literal token-accumulator walk across many random shards, in ONE
    Ray run (a hypothesis-per-example harness would re-run the pipeline
    100x — the randomization lives inside instead)."""
    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data as rd

    from raylog.functions.packing import pack_chunks

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    rng = np.random.default_rng(31)
    n = 600
    ids = np.sort(rng.choice(10**6, size=n, replace=False)).astype(np.int64)
    lens = rng.integers(0, 700, n).astype(np.int64)
    max_tokens = 512
    tbl = pa.table({"doc_id": pa.array(ids), "n_tok": pa.array(lens)})
    out = pack_chunks(rd.from_arrow(tbl), max_tokens=max_tokens,
                      num_shards=8, num_partitions=4).to_pandas()
    out = out.set_index("doc_id")
    checked = 0
    for shard in range(8):
        cursor = 0
        for did, ln in zip(ids, lens):
            if did % 8 != shard:
                continue
            first = cursor // max_tokens
            last = (cursor + ln - 1) // max_tokens if ln > 0 else first
            off = cursor % max_tokens
            row = out.loc[did]
            assert (row["first_pack"], row["last_pack"],
                    row["first_offset"]) == (first, last, off), (did, ln)
            cursor += ln
            checked += 1
    assert checked == n


@settings(max_examples=60, deadline=None)
@given(st.lists(st.sets(st.integers(min_value=0, max_value=40),
                        min_size=0, max_size=6),
                min_size=130, max_size=160),
       st.sets(st.integers(min_value=0, max_value=10_000),
               min_size=200, max_size=400))
def test_segmented_intersect_width_bucketing(small_sets, big):
    """Force the round-4 power-of-two width-class split (n > 64 and one
    pair far wider than the rest → padded area > 4× data) and check the
    result still matches the set model on every row."""
    import numpy as np

    from raylog.functions.dedup import _segmented_intersect_counts

    sets = [sorted(s) for s in small_sets]
    big_sorted = sorted(big)
    half = len(sets) // 2
    a = sets[:half] + [big_sorted]
    b = sets[half:2 * half] + [big_sorted[: len(big_sorted) // 2]]
    a, b = a[: len(b)], b[: len(a)]
    fa = np.array([x for s in a for x in s], dtype=np.uint64)
    fb = np.array([x for s in b for x in s], dtype=np.uint64)
    la = np.array([len(s) for s in a], dtype=np.int64)
    lb = np.array([len(s) for s in b], dtype=np.int64)
    got = _segmented_intersect_counts(fa, la, fb, lb)
    want = [len(set(x) & set(y)) for x, y in zip(a, b)]
    assert got.tolist() == want


@settings(max_examples=100, deadline=None)
@given(st.lists(st.lists(st.integers(min_value=0, max_value=4),
                         min_size=0, max_size=25),
                min_size=1, max_size=25))
def test_winnow_matches_scalar_model(token_lists):
    """Vectorized winnowing == the literal clipped-window rightmost-min
    model on tie-heavy tiny-vocab docs (hash ties are the hard part)."""
    from raylog.functions.dedup import WINNOW_B, WINNOW_P, winnow_batch

    B, P, k, w = int(WINNOW_B), int(WINNOW_P), 3, 4
    tbl = pa.table({
        "doc_id": pa.array(range(len(token_lists)), pa.int64()),
        "tokens": pa.array(token_lists, pa.list_(pa.int32())),
    })
    got = {r["doc_id"]: (r["n_grams"], r["n_fp"], r["fp_sum"])
           for r in winnow_batch(tbl).to_pylist()}
    for i, toks in enumerate(token_lists):
        if len(toks) < k:
            assert i not in got
            continue
        hs = []
        for j in range(len(toks) - k + 1):
            h = 0
            for t in toks[j:j + k]:
                h = (h * B + t) % P
            hs.append(h)
        sel = set()
        for e in range(len(hs)):
            s0 = max(0, e - w + 1)
            m = min(hs[s0:e + 1])
            sel.add(max(q for q in range(s0, e + 1) if hs[q] == m))
        # fp_sum is Σ ((h·(pos+1)) mod P) — per-term-modded so the
        # oracle's BIGINT never overflows on long docs (round 5 item #3)
        assert got[i] == (len(hs), len(sel),
                          sum(hs[p] * (p + 1) % P for p in sel)), (i, toks)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.lists(st.integers(min_value=0, max_value=3),
                         min_size=0, max_size=20),
                min_size=1, max_size=20))
def test_repetition_fraction_matches_model(token_lists):
    from raylog.functions.tokens import repetition_fraction_batch

    tbl = pa.table({
        "doc_id": pa.array(range(len(token_lists)), pa.int64()),
        "tokens": pa.array(token_lists, pa.list_(pa.int32())),
    })
    got = {r["doc_id"]: (r["n_grams"], r["n_distinct"], r["rep_milli"])
           for r in repetition_fraction_batch(tbl).to_pylist()}
    for i, toks in enumerate(token_lists):
        grams = [tuple(toks[j:j + 3]) for j in range(len(toks) - 2)]
        if not grams:
            assert i not in got
            continue
        nd = len(set(grams))
        assert got[i] == (len(grams), nd,
                          1000 * (len(grams) - nd) // len(grams))
