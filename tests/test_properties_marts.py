"""Property-based tests for the round-5 mart/dedup kernels vs literal
Python models — no Ray needed (the kernels under test are pure numpy /
pure functions), so hypothesis can hammer them cheaply.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from raylog.functions.dedup import _codepoints, _levenshtein

_word = st.text(alphabet="abcxyz 0/Ж", min_size=0, max_size=24)


def _lev_model(a: str, b: str) -> int:
    """Textbook O(nm) dynamic program, cell by cell."""
    n, m = len(a), len(b)
    prev = list(range(m + 1))
    for i in range(1, n + 1):
        cur = [i] + [0] * m
        for j in range(1, m + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (a[i - 1] != b[j - 1]))
        prev = cur
    return prev[m]


@settings(max_examples=300, deadline=None)
@given(_word, _word)
def test_levenshtein_matches_textbook_dp(a, b):
    got = _levenshtein(_codepoints(a), _codepoints(b))
    assert got == _lev_model(a, b), (a, b)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=6), min_size=1,
                max_size=60))
def test_streak_scan_matches_python(day_offsets):
    """The gaps-and-islands vectorized scan (day[i]-i constant within a
    run) against a literal walk, single user."""
    days = np.unique(np.cumsum(np.asarray(day_offsets, dtype=np.int64)))
    # vectorized form (the events_user_streaks kernel, one user)
    brk = np.ones(len(days), dtype=bool)
    if len(days) > 1:
        brk[1:] = days[1:] != days[:-1] + 1
    run_len = np.bincount(np.cumsum(brk) - 1)
    got = int(run_len.max())
    # literal walk
    best = cur = 1
    for i in range(1, len(days)):
        cur = cur + 1 if days[i] == days[i - 1] + 1 else 1
        best = max(best, cur)
    assert got == best


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(st.integers(min_value=0, max_value=40),
                          st.integers(min_value=0, max_value=20)),
                min_size=1, max_size=50))
def test_window_coverage_matches_python(user_days):
    """The trailing-7d interval-coverage expansion vs a literal
    per-day distinct-user count."""
    uid = np.asarray([u for u, _ in user_days], dtype=np.int64)
    day = np.asarray([d for _, d in user_days], dtype=np.int64)
    # dedupe (user, day) as the grouped aggregate would
    packed = np.unique(uid * (1 << 24) + day)
    uid, day = packed >> 24, packed & ((1 << 24) - 1)
    cov_day = (day[:, None] + np.arange(7, dtype=np.int64)).ravel()
    cov_uid = np.repeat(uid, 7)
    cov = np.unique(cov_uid * (1 << 24) + cov_day)
    counts = {}
    for p in cov.tolist():
        counts[p & ((1 << 24) - 1)] = counts.get(p & ((1 << 24) - 1),
                                                 0) + 1
    # literal: for each observed day, distinct users active in [d-6, d]
    observed = sorted(set(day.tolist()))
    pairs = set(zip(uid.tolist(), day.tolist()))
    for d in observed:
        want = len({u for (u, dd) in pairs if d - 6 <= dd <= d})
        assert counts[d] == want, (d, counts[d], want)


@settings(max_examples=150, deadline=None)
@given(st.lists(st.integers(min_value=-1000, max_value=1000),
                min_size=1, max_size=80),
       st.integers(min_value=0, max_value=79),
       st.integers(min_value=0, max_value=79))
def test_winsorize_clamp_invariants(vals, i_lo, i_hi):
    """Clamping at any two dataset elements keeps the mean inside
    [lo, hi] and leaves already-inside values untouched."""
    v = np.asarray(vals, dtype=np.int64)
    lo = int(np.sort(v)[min(i_lo, len(v) - 1)])
    hi = int(np.sort(v)[min(max(i_lo, i_hi), len(v) - 1)])
    w = np.clip(v, lo, hi)
    assert w.min() >= lo and w.max() <= hi
    inside = (v >= lo) & (v <= hi)
    assert (w[inside] == v[inside]).all()
    assert lo * len(v) <= int(w.sum()) <= hi * len(v)


@settings(max_examples=150, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=100), min_size=2,
                max_size=60).filter(lambda x: len(set(x)) >= 2))
def test_quantile_normalize_rank_monotone(scores):
    """Within one source, the calibrated value is nondecreasing in the
    raw score (the defining property of quantile normalization)."""
    v = np.asarray(scores, dtype=np.int64)
    uniq, cnt = np.unique(v, return_counts=True)
    cum = np.cumsum(cnt)
    n_total = int(cum[-1])
    order = np.argsort(v, kind="mergesort")
    rk = np.empty(len(v), dtype=np.int64)
    rk[order] = np.arange(1, len(v) + 1)
    ns = len(v)
    k = (rk * n_total + ns - 1) // ns
    norm = uniq[np.searchsorted(cum, k, side="left")]
    by_rank = norm[order]
    assert (np.diff(by_rank) >= 0).all()
    # top rank always maps to the global maximum
    assert by_rank[-1] == uniq[-1]


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=9), min_size=1,
                max_size=120))
def test_max_run_scan_matches_python(tokens):
    toks = np.asarray(tokens, dtype=np.int64)
    brk = np.ones(len(toks), dtype=bool)
    if len(toks) > 1:
        brk[1:] = toks[1:] != toks[:-1]
    got = int(np.bincount(np.cumsum(brk) - 1).max())
    best = cur = 1
    for i in range(1, len(tokens)):
        cur = cur + 1 if tokens[i] == tokens[i - 1] else 1
        best = max(best, cur)
    assert got == best
