"""Round-5 edge-case closures (VERDICT r4 'do this' items #2/#3/#5/#6).

- string doc_id support across the r4 kernels (winnow select /
  fingerprints / pairs, FIM transform, repetition fraction) — the
  input_hint declares ``doc_id: string``; fixtures are int64 so the
  driver gate can't see this path.
- exact-integer winnow checksum: the old float64-weighted bincount
  silently rounded past 2^53 on ≳10^5-fingerprint docs; the new
  per-term-mod int64 segment sum matches DuckDB exactly at any length.
- ``max_postings`` capped-bucket observability counters.
- no RuntimeWarning from the intentional uint64 wraparound hash.
"""

import warnings

import numpy as np
import pyarrow as pa
import pytest
import ray
import ray.data as rd


def _tok_table(tokens, ids):
    return pa.table({
        "doc_id": ids,
        "tokens": pa.array(tokens, pa.list_(pa.int32())),
    })


class TestStringDocIds:
    """Every r4 kernel must accept the input_hint's doc_id:string —
    same numbers as the int-id run, ids carried through untouched."""

    @staticmethod
    def _corpus(n=80, seed=11):
        rng = np.random.default_rng(seed)
        tokens = []
        for _ in range(n // 2):
            base = rng.integers(0, 30, 25).tolist()
            tokens.append(base)
            mut = list(base)
            mut[5] = int(rng.integers(0, 30))
            tokens.append(mut)
        int_ids = pa.array(range(len(tokens)), pa.int64())
        str_ids = pa.array([f"doc-{i:06d}" for i in range(len(tokens))])
        return tokens, int_ids, str_ids

    def test_winnow_batch_and_fingerprints(self):
        from raylog.functions.dedup import (winnow_batch,
                                            winnow_fingerprint_rows)

        tokens, int_ids, str_ids = self._corpus()
        gi = winnow_batch(_tok_table(tokens, int_ids))
        gs = winnow_batch(_tok_table(tokens, str_ids))
        assert gs["doc_id"].to_pylist() == [
            f"doc-{i:06d}" for i in gi["doc_id"].to_pylist()]
        for c in ("n_grams", "n_fp", "fp_sum"):
            assert gs[c].to_pylist() == gi[c].to_pylist()

        fi = winnow_fingerprint_rows(_tok_table(tokens, int_ids))
        fs = winnow_fingerprint_rows(_tok_table(tokens, str_ids))
        assert fs["fp"].to_pylist() == fi["fp"].to_pylist()
        assert fs["dlen"].to_pylist() == fi["dlen"].to_pylist()
        assert fs["doc_id"].to_pylist() == [
            f"doc-{i:06d}" for i in fi["doc_id"].to_pylist()]

    def test_winnow_pairs(self, ray_session):
        from raylog.functions.dedup import winnow_pairs

        tokens, int_ids, str_ids = self._corpus()
        kw = dict(min_shared=2, min_jacc_milli=300, num_partitions=4)
        pi = winnow_pairs(rd.from_arrow(_tok_table(tokens, int_ids)),
                          **kw).to_pandas()
        ps = winnow_pairs(rd.from_arrow(_tok_table(tokens, str_ids)),
                          **kw).to_pandas()
        want = {(f"doc-{r.doc_a:06d}", f"doc-{r.doc_b:06d}"):
                (r.shared, r.jacc_milli) for r in pi.itertuples()}
        got = {(r.doc_a, r.doc_b): (r.shared, r.jacc_milli)
               for r in ps.itertuples()}
        assert got == want
        assert len(want) > 10

    def test_fim_transform(self):
        """String-id FIM: the coin comes from the shared seeded-xxhash
        helper; the checksum must equal a literal python PSM reorder
        driven by that same coin."""
        from raylog.functions.mixture import _coins_col
        from raylog.functions.tokens import (FIM_MID, FIM_PRE, FIM_SUF,
                                             fim_transform_batch)

        rng = np.random.default_rng(5)
        tokens = [rng.integers(0, 50_000, rng.integers(0, 30)).tolist()
                  for _ in range(200)]
        ids = pa.array([f"s3://bucket/shard-{i}/doc-{i}" for i in
                        range(len(tokens))])
        tbl = _tok_table(tokens, ids)
        coins = _coins_col(tbl["doc_id"])
        out = {r["doc_id"]: r
               for r in fim_transform_batch(tbl).to_pylist()}
        both = {True: 0, False: 0}
        for d, toks, coin in zip(ids.to_pylist(), tokens,
                                 coins.tolist()):
            n = len(toks)
            fim = coin % 2 == 0
            both[fim] += 1
            if fim:
                s1 = (coin // 2) % (n + 1)
                s2 = s1 + (coin // 1024) % (n - s1 + 1)
                seq = ([FIM_PRE] + toks[:s1] + [FIM_SUF] + toks[s2:]
                       + [FIM_MID] + toks[s1:s2])
            else:
                seq = toks
            r = out[d]
            assert r["fim"] == fim
            assert r["n_out"] == len(seq)
            assert r["fim_checksum"] == sum(
                (i + 1) * t for i, t in enumerate(seq))
        assert both[True] > 50 and both[False] > 50  # both coin branches

    def test_repetition_fraction(self):
        from raylog.functions.tokens import repetition_fraction_batch

        tokens, int_ids, str_ids = self._corpus()
        gi = repetition_fraction_batch(_tok_table(tokens, int_ids))
        gs = repetition_fraction_batch(_tok_table(tokens, str_ids))
        for c in ("n_grams", "n_distinct", "rep_milli"):
            assert gs[c].to_pylist() == gi[c].to_pylist()
        assert gs["doc_id"].to_pylist() == [
            f"doc-{i:06d}" for i in gi["doc_id"].to_pylist()]


class TestWinnowExactChecksum:
    """VERDICT r4 item #3: a ≥200k-fingerprint doc where the old
    float64-weighted bincount demonstrably rounds while the new
    per-term-mod int64 path matches DuckDB exactly."""

    def test_big_doc_float64_rounds_int64_exact(self):
        import duckdb

        from raylog.functions.dedup import (WINNOW_P, _winnow_select,
                                            winnow_batch)

        rng = np.random.default_rng(97)
        toks = rng.integers(0, 50_000, 520_000).astype(np.int64)
        tbl = _tok_table([toks.tolist()], pa.array([0], pa.int64()))

        ids, n_grams, sel_doc, sel_pos, sel_h = _winnow_select(
            tbl, "doc_id", "tokens", 3, 4)
        assert len(sel_h) >= 200_000  # the judge's scenario size

        # (a) the OLD definition/kernel (no per-term mod, float64
        # accumulation) rounds: exact python-int sum of the SAME terms
        # disagrees with the float64-weighted bincount
        terms_unmod = sel_h * (sel_pos + 1)          # < 2^50 per term
        exact_unmod = sum(int(t) for t in terms_unmod)
        old = np.bincount(sel_doc, weights=terms_unmod.astype(np.float64),
                          minlength=1)[0]            # the old accumulator
        assert exact_unmod > 2**53   # the hazard regime
        assert old != exact_unmod    # float64 demonstrably rounded
        # ...and the unmodded EXACT sum doesn't even fit BIGINT here,
        # which is why the checksum definition carries the per-term mod
        assert exact_unmod > 2**63

        # (b) the NEW kernel matches an exact python-int reference...
        got = winnow_batch(tbl).to_pylist()[0]
        exact_mod = sum(int(h) * (int(p) + 1) % int(WINNOW_P)
                        for h, p in zip(sel_h, sel_pos))
        assert got["fp_sum"] == exact_mod
        assert 0 < exact_mod < 2**63  # BIGINT-representable

        # (c) ...and DuckDB, evaluating the oracle's arithmetic
        # (Horner grams mod P, clipped-window rightmost min, per-term
        # mod before the BIGINT sum) over the raw token table, agrees
        # exactly.
        con = duckdb.connect()
        con.register("seqs", pa.table({
            "doc_id": pa.array([0], pa.int64()),
            "tokens": pa.array([toks.tolist()], pa.list_(pa.int64())),
        }))
        sql = """
WITH g0 AS (
  SELECT doc_id, i AS pos,
         tokens[CAST(i AS INT) + 1] AS t0,
         tokens[CAST(i AS INT) + 2] AS t1,
         tokens[CAST(i AS INT) + 3] AS t2
  FROM seqs, LATERAL (
    SELECT unnest(generate_series(0, len(tokens) - 3)) AS i
  ) s
), grams AS (
  SELECT doc_id, pos,
         ((t0 * 1000003 + t1) % 2147483647 * 1000003 + t2)
           % 2147483647 AS h
  FROM g0
), wins AS (
  SELECT doc_id, pos AS e,
         MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS mn
  FROM grams
), picked AS (
  SELECT w.doc_id, w.e, MAX(g.pos) AS spos
  FROM wins w
  JOIN grams g
    ON g.doc_id = w.doc_id
   AND g.pos BETWEEN w.e - 3 AND w.e
   AND g.h = w.mn
  GROUP BY 1, 2
), sel AS (
  SELECT DISTINCT p.doc_id, p.spos, g.h
  FROM picked p JOIN grams g
    ON g.doc_id = p.doc_id AND g.pos = p.spos
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_fp,
       CAST(SUM((h * (spos + 1)) % 2147483647) AS BIGINT) AS fp_sum
FROM sel GROUP BY doc_id"""
        n_fp, fp_sum = con.execute(sql).fetchone()
        con.close()
        assert n_fp == got["n_fp"]
        assert fp_sum == got["fp_sum"]


class TestCappedBucketCounters:
    def test_max_postings_trims_are_observable(self, ray_session):
        """VERDICT r4 item #5: when max_postings trims a hot
        fingerprint bucket, the counters actor must report how many
        buckets were capped and how many postings dropped — the signal
        that `shared` became a lower bound on a 100 TB run."""
        from raylog.functions.dedup import winnow_pairs
        from raylog.state.metrics import make_counters, read_counters

        rng = np.random.default_rng(41)
        hot_span = rng.integers(0, 30, 12).tolist()  # shared by all docs
        tokens = [hot_span + rng.integers(0, 30, 20).tolist()
                  for _ in range(60)]
        tbl = _tok_table(tokens, pa.array(range(len(tokens)), pa.int64()))

        counters = make_counters()
        capped = winnow_pairs(rd.from_arrow(tbl), min_shared=1,
                              max_postings=8, num_partitions=4,
                              counters=counters).to_pandas()
        m = read_counters(counters)
        assert m.get("capped_buckets", 0) >= 1
        assert m.get("dropped_postings", 0) > 8
        ray.kill(counters)

        # and with no cap, nothing fires
        counters2 = make_counters()
        full = winnow_pairs(rd.from_arrow(tbl), min_shared=1,
                            num_partitions=4,
                            counters=counters2).to_pandas()
        assert read_counters(counters2) == {}
        ray.kill(counters2)
        # the capped run really did lose shared mass
        assert capped["shared"].sum() < full["shared"].sum()


def test_sequence_hash_no_runtime_warning():
    """VERDICT r4 item #6: the mod-2^64 polynomial hash must not leak
    a RuntimeWarning (wraparound is intentional and scoped)."""
    from raylog.functions.tokens import sequence_hash_columns

    tbl = pa.table({"tokens": pa.array(
        [[50_000] * 64, list(range(100)), []], pa.list_(pa.int32()))})
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        out = sequence_hash_columns(tbl)
    assert out.num_rows == 3
