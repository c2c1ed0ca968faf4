"""Text analysis + token-payload statistics, packing, curation.

Domain module of the driver-facing query registry — registration
happens on import via :func:`raylog.pipelines.qbase.query`; the public
surface stays ``raylog.pipelines.queries.QUERIES/ORACLES``.
"""

from __future__ import annotations

import pyarrow as pa

from raylog import records as R
from raylog.pipelines.qbase import (
    ORACLES,
    QUERIES,
    _ECI_TAGS,
    _P,
    _src_tag,
    _tmp_name,
    query,
)
from raylog.stages import route

# Training-data ops: text analysis
# --------------------------------------------------------------------------

@query(
    "text_token_counts",
    r"""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
       CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS BIGINT) AS n_bpe_tokens
FROM documents""",
)
def text_token_counts(sf_dir: str):
    """Token counting: whitespace + BPE-ish regex, vectorized Arrow."""
    import ray.data as rd

    from raylog.functions.text import token_counts

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    ds = ds.map_batches(token_counts, batch_format="pyarrow", batch_size=None)
    return ds.select_columns(["doc_id", "n_ws_tokens", "n_bpe_tokens"])


@query(
    "text_quality",
    """
WITH q AS (
  SELECT doc_id,
         CAST(length(text) AS BIGINT) AS n_chars_calc,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
         CAST(len(list_filter(string_split(text, ' '), w -> w IN ('the', 'a'))) AS BIGINT) AS stop_hits
  FROM documents
)
SELECT doc_id, n_chars_calc, n_words, stop_hits,
       CAST(FLOOR(1000 * (0.5 * LEAST(n_words / 40.0, 1.0)
                          + 0.5 * (1.0 - stop_hits * 1.0 / n_words))) AS BIGINT)
         AS score_milli
FROM q""",
)
def text_quality(sf_dir: str):
    """Quality scoring: length + stopword-ratio components, 0-1000 score."""
    import ray.data as rd

    from raylog.functions.text import quality_scores

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    ds = ds.map_batches(quality_scores, batch_format="pyarrow", batch_size=None)
    return ds.select_columns(
        ["doc_id", "n_chars_calc", "n_words", "stop_hits", "score_milli"]
    )


@query(
    "text_langid",
    """
WITH h AS (
  SELECT doc_id,
    CAST(len(list_filter(string_split(text,' '), w -> w IN ('der','die','das','und'))) AS BIGINT) AS h_de,
    CAST(len(list_filter(string_split(text,' '), w -> w IN ('the','a','of','and'))) AS BIGINT) AS h_en,
    CAST(len(list_filter(string_split(text,' '), w -> w IN ('el','la','de','y'))) AS BIGINT) AS h_es,
    CAST(len(list_filter(string_split(text,' '), w -> w IN ('le','la','de','et'))) AS BIGINT) AS h_fr
  FROM documents
), g AS (
  SELECT *, GREATEST(h_de, h_en, h_es, h_fr) AS mx,
         (CASE WHEN h_de = GREATEST(h_de,h_en,h_es,h_fr) THEN 1 ELSE 0 END
        + CASE WHEN h_en = GREATEST(h_de,h_en,h_es,h_fr) THEN 1 ELSE 0 END
        + CASE WHEN h_es = GREATEST(h_de,h_en,h_es,h_fr) THEN 1 ELSE 0 END
        + CASE WHEN h_fr = GREATEST(h_de,h_en,h_es,h_fr) THEN 1 ELSE 0 END) AS ties
  FROM h
)
SELECT doc_id,
       CASE WHEN mx = 0 OR ties > 1 THEN 'und'
            WHEN h_de = mx THEN 'de'
            WHEN h_en = mx THEN 'en'
            WHEN h_es = mx THEN 'es'
            ELSE 'fr' END AS lang_pred
FROM g""",
)
def text_langid(sf_dir: str):
    """Language ID: stopword-marker argmax heuristic (tie/zero → 'und')."""
    import ray.data as rd

    from raylog.functions.text import lang_id

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    ds = ds.map_batches(lang_id, batch_format="pyarrow", batch_size=None)
    return ds.select_columns(["doc_id", "lang_pred"])


@query(
    "langid_confusion",
    """
WITH h AS (
  SELECT doc_id, lang,
    CAST(len(list_filter(string_split(text,' '), w -> w IN ('der','die','das','und'))) AS BIGINT) AS h_de,
    CAST(len(list_filter(string_split(text,' '), w -> w IN ('the','a','of','and'))) AS BIGINT) AS h_en,
    CAST(len(list_filter(string_split(text,' '), w -> w IN ('el','la','de','y'))) AS BIGINT) AS h_es,
    CAST(len(list_filter(string_split(text,' '), w -> w IN ('le','la','de','et'))) AS BIGINT) AS h_fr
  FROM documents
), g AS (
  SELECT *, GREATEST(h_de, h_en, h_es, h_fr) AS mx,
         (CASE WHEN h_de = GREATEST(h_de,h_en,h_es,h_fr) THEN 1 ELSE 0 END
        + CASE WHEN h_en = GREATEST(h_de,h_en,h_es,h_fr) THEN 1 ELSE 0 END
        + CASE WHEN h_es = GREATEST(h_de,h_en,h_es,h_fr) THEN 1 ELSE 0 END
        + CASE WHEN h_fr = GREATEST(h_de,h_en,h_es,h_fr) THEN 1 ELSE 0 END) AS ties
  FROM h
)
SELECT lang,
       CASE WHEN mx = 0 OR ties > 1 THEN 'und'
            WHEN h_de = mx THEN 'de'
            WHEN h_en = mx THEN 'en'
            WHEN h_es = mx THEN 'es'
            ELSE 'fr' END AS lang_pred,
       COUNT(*) AS n
FROM g GROUP BY 1, 2""",
)
def langid_confusion(sf_dir: str):
    """Language-ID quality audit: confusion matrix of the declared
    ``lang`` label vs the heuristic prediction — the "how much of each
    declared language bucket is actually mislabeled" check run before
    trusting either column for mixture design. Prediction is the same
    vectorized kernel as ``text_langid``; the matrix is a
    langs²-bounded partial+tree aggregate (no shuffle of rows)."""
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate
    from raylog.functions.text import lang_id

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "lang"])
    pred = ds.map_batches(lang_id, batch_format="pyarrow", batch_size=None)
    return grouped_aggregate(pred, ["lang", "lang_pred"],
                             [("*", "count", "n")])


@query(
    "corpus_profile",
    """
SELECT source, COUNT(*) AS n_docs,
       COUNT(DISTINCT lang) AS n_langs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(MIN(n_chars) AS BIGINT) AS min_chars,
       CAST(MAX(n_chars) AS BIGINT) AS max_chars
FROM documents GROUP BY source""",
)
def corpus_profile(sf_dir: str):
    """Per-source corpus profile (the data-quality dashboard row):
    doc count, exact distinct languages, and char-volume extremes.

    Count/sum/min/max ride the partial+tree aggregate; the exact
    distinct-lang count goes through the hash-partitioned distinct on
    (source, lang) — a langs×sources-bounded exchange — then a tiny
    per-source count. No row shuffle anywhere."""
    import pandas as pd
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate, grouped_aggregate_ds

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["source", "lang", "n_chars"])
    base = grouped_aggregate(ds, ["source"], [
        ("*", "count", "n_docs"), ("n_chars", "sum", "sum_chars"),
        ("n_chars", "min", "min_chars"), ("n_chars", "max", "max_chars"),
    ]).to_pandas()
    sl = grouped_aggregate(
        grouped_aggregate_ds(ds, ["source", "lang"], []),
        ["source"], [("*", "count", "n_langs")],
    ).to_pandas()
    out = base.merge(sl, on="source")
    return pa.table({
        "source": pa.array(out["source"], pa.string()),
        "n_docs": pa.array(out["n_docs"], pa.int64()),
        "n_langs": pa.array(out["n_langs"], pa.int64()),
        "sum_chars": pa.array(out["sum_chars"], pa.int64()),
        "min_chars": pa.array(out["min_chars"], pa.int64()),
        "max_chars": pa.array(out["max_chars"], pa.int64()),
    })


@query("text_fingerprint", "SELECT doc_id, md5(text) AS fp_md5 FROM documents")
def text_fingerprint(sf_dir: str):
    """Document fingerprinting (md5 content hash; rolling hash in pytest)."""
    import ray.data as rd

    from raylog.functions.text import fingerprints

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    ds = ds.map_batches(fingerprints, batch_format="pyarrow", batch_size=None)
    return ds.select_columns(["doc_id", "fp_md5"])


# --------------------------------------------------------------------------
# Token-payload statistics (vocab heavy hitters, bigram LM counts)
# --------------------------------------------------------------------------

@query(
    "tokens_top_terms",
    _P() + """
SELECT token, cnt, rank FROM (
  SELECT token, COUNT(*) AS cnt,
         ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, token) AS rank
  FROM (SELECT CAST(unnest(tokens) AS BIGINT) AS token FROM recs2)
  GROUP BY token
) WHERE rank <= 50""",
)
def tokens_top_terms(sf_dir: str):
    """Vocabulary heavy hitters over the tokens payload.

    np.unique partial counts per batch → hash-partitioned combine →
    partial top-k; no token-cardinality table on the driver.
    """
    from raylog.functions.tokens import token_top_terms
    from raylog.pipelines import log_pipeline as LP

    ds = LP.records_ds(sf_dir).select_columns(["tokens"])
    return token_top_terms(ds, k=50)


@query(
    "tokens_bigrams",
    _P() + """
SELECT t1, t2, cnt, rank FROM (
  SELECT t1, t2, COUNT(*) AS cnt,
         ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, t1, t2) AS rank
  FROM (
    SELECT CAST(tokens[CAST(i AS INT)] AS BIGINT) AS t1,
           CAST(tokens[CAST(i AS INT) + 1] AS BIGINT) AS t2
    FROM recs2, LATERAL (
      SELECT unnest(generate_series(1, CAST(n_tok AS INT) - 1)) AS i
    ) g
  ) GROUP BY t1, t2
) WHERE rank <= 50""",
)
def tokens_bigrams(sf_dir: str):
    """Next-token (bigram) counts over the tokens payload, top-50.

    Consecutive pairs packed into one uint64 key per batch, boundaries
    masked vectorized; same partial-count + distributed-combine shape as
    unigrams.
    """
    from raylog.functions.tokens import bigram_top_terms
    from raylog.pipelines import log_pipeline as LP

    ds = LP.records_ds(sf_dir).select_columns(["tokens"])
    return bigram_top_terms(ds, k=50)


@query(
    "tokens_length_mass",
    _P() + """
, b AS (
  SELECT CAST(FLOOR(log2(CAST(n_tok AS DOUBLE))) AS BIGINT) AS bucket,
         CAST(n_tok AS BIGINT) AS n_tok
  FROM recs2 WHERE n_tok > 0
), t AS (SELECT SUM(n_tok) AS tot FROM b)
SELECT bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
       CAST(FLOOR(1000.0 * SUM(n_tok) / t.tot) AS BIGINT) AS token_mass_milli
FROM b, t GROUP BY bucket, t.tot""",
)
def tokens_length_mass(sf_dir: str):
    """Token mass by power-of-2 document-length bucket: what fraction of
    TOKENS (not docs) lives at each context-length scale — the planning
    table for window size / packing efficiency (a doc-count histogram
    over-weights short docs; training cost follows token mass).
    Map-only bucket assignment + a ~32-bucket combine."""
    import numpy as np

    from raylog.functions.agg import grouped_aggregate
    from raylog.pipelines import log_pipeline as LP

    ds = LP.records_ds(sf_dir).select_columns(["n_tok"])

    def bucket(b: pa.Table) -> pa.Table:
        nt = np.asarray(b["n_tok"].combine_chunks()
                        if isinstance(b["n_tok"], pa.ChunkedArray)
                        else b["n_tok"], dtype=np.int64)
        nt = nt[nt > 0]
        return pa.table({
            "bucket": pa.array(np.floor(np.log2(nt.astype(np.float64)))
                               .astype(np.int64)),
            "n_tok": pa.array(nt),
        })

    agg = grouped_aggregate(
        ds.map_batches(bucket, batch_format="pyarrow", batch_size=None),
        ["bucket"],
        [("*", "count", "n_docs"), ("n_tok", "sum", "n_tokens")],
    ).to_pandas()
    nt = agg["n_tokens"].to_numpy(dtype=np.int64)
    tot = float(nt.sum())
    return pa.table({
        "bucket": pa.array(agg["bucket"].to_numpy(dtype=np.int64)),
        "n_docs": pa.array(agg["n_docs"].to_numpy(dtype=np.int64)),
        "n_tokens": pa.array(nt),
        "token_mass_milli": pa.array(
            np.floor(1000.0 * nt / tot).astype(np.int64)),
    })


@query(
    "tokens_cond_entropy",
    _P() + """
, bg AS (
  SELECT CAST(tokens[CAST(i AS INT)] AS BIGINT) AS t1,
         CAST(tokens[CAST(i AS INT) + 1] AS BIGINT) AS t2
  FROM recs2, LATERAL (
    SELECT unnest(generate_series(1, CAST(n_tok AS INT) - 1)) AS i
  ) g
), c AS (SELECT t1, t2, COUNT(*) AS c FROM bg GROUP BY 1, 2),
a AS (SELECT t1, SUM(c) AS ca FROM c GROUP BY 1),
s AS (SELECT (SELECT SUM(ca * log2(ca)) FROM a) AS sa,
             (SELECT SUM(c * log2(c)) FROM c) AS sc,
             (SELECT SUM(c) FROM c) AS n)
SELECT CAST(n AS BIGINT) AS n_pairs,
       CAST(FLOOR(1000 * ((sa - sc) / n)) AS BIGINT) AS h_cond_milli,
       CAST(FLOOR(1000 * (log2(n) - sa / n)) AS BIGINT) AS h_prev_milli
FROM s""",
)
def tokens_cond_entropy(sf_dir: str):
    """Bigram conditional entropy H(next|prev) + marginal H(prev) of the
    token stream, in millibits — the corpus-repetitiveness health metric
    (low H(next|prev) with normal H(prev) flags templated/looped text
    that per-doc repetition scores miss).

    Closed form from two scalar partial sums — H(next|prev) =
    (Σ_a c_a·log2 c_a − Σ_ab c_ab·log2 c_ab) / N — so beyond the one
    vocab²-bounded bigram combine the finish is a per-block scalar fold:
    no second corpus pass, no vocab table on the driver."""
    import numpy as np
    import ray.data as rd

    from raylog.functions import agg
    from raylog.functions.tokens import bigram_count_partial
    from raylog.pipelines import log_pipeline as LP

    ds = LP.records_ds(sf_dir).select_columns(["tokens"])
    partials = ds.map_batches(
        lambda b: bigram_count_partial(b, "tokens"),
        batch_format="pyarrow", batch_size=None,
    )
    freqs = agg.grouped_aggregate_ds(
        partials, ["t1", "t2"], [("cnt", "sum", "cnt")],
        num_partitions=16, batch_size=None,
    )

    def fold_pairs(b: pa.Table) -> pa.Table:
        c = np.asarray(b["cnt"].combine_chunks(), dtype=np.float64)
        return pa.table({"sc": pa.array([float((c * np.log2(c)).sum())]),
                         "n": pa.array([int(c.sum())], pa.int64())})

    ca = agg.grouped_aggregate_ds(
        freqs, ["t1"], [("cnt", "sum", "ca")],
        num_partitions=16, batch_size=None,
    )

    def fold_prev(b: pa.Table) -> pa.Table:
        v = np.asarray(b["ca"].combine_chunks(), dtype=np.float64)
        return pa.table({"sa": pa.array([float((v * np.log2(v)).sum())])})

    pair_f = freqs.map_batches(fold_pairs, batch_format="pyarrow",
                               batch_size=None).to_pandas()
    prev_f = ca.map_batches(fold_prev, batch_format="pyarrow",
                            batch_size=None).to_pandas()
    if "sc" not in pair_f.columns or int(pair_f["n"].sum()) == 0:
        z = pa.array([], pa.int64())  # no bigrams: entropies undefined
        return pa.table({"n_pairs": z, "h_cond_milli": z,
                         "h_prev_milli": z})
    sc, n = float(pair_f["sc"].sum()), int(pair_f["n"].sum())
    sa = float(prev_f["sa"].sum())
    return pa.table({
        "n_pairs": pa.array([n], pa.int64()),
        "h_cond_milli": pa.array(
            [int(np.floor(1000.0 * (sa - sc) / n))], pa.int64()),
        "h_prev_milli": pa.array(
            [int(np.floor(1000.0 * (np.log2(n) - sa / n)))], pa.int64()),
    })


@query(
    "tokens_bigrams_sketch",
    _P() + """
SELECT t1, t2, cnt FROM (
  SELECT t1, t2, COUNT(*) AS cnt,
         ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, t1, t2) AS rnk
  FROM (
    SELECT CAST(tokens[CAST(i AS INT)] AS BIGINT) AS t1,
           CAST(tokens[CAST(i AS INT) + 1] AS BIGINT) AS t2
    FROM recs2, LATERAL (
      SELECT unnest(generate_series(1, CAST(n_tok AS INT) - 1)) AS i
    ) g
  ) GROUP BY t1, t2
) WHERE rnk <= 20""",
)
def tokens_bigrams_sketch(sf_dir: str):
    """Bigram heavy hitters via count-min sketch + exact candidate
    verification — the shuffle-free scale path for unbounded pair keys
    (exchange = blocks × sketch size, not one row per distinct pair).

    The verified counts are EXACT whenever every true heavy hitter
    reaches some block's local top-m candidate pool; this corpus's
    bigram key space (word-length pairs, ≪ m=128 distinct) satisfies
    that, so the result is oracle-checkable here. On adversarially flat
    distributions recall is the (documented) approximation.
    """
    import numpy as np

    from raylog.functions.sketch import cms_heavy_hitters
    from raylog.functions.tokens import bigram_keys_batch
    from raylog.pipelines import log_pipeline as LP

    ds = LP.records_ds(sf_dir).select_columns(["tokens"])
    keys = ds.map_batches(bigram_keys_batch, batch_format="pyarrow",
                          batch_size=None)
    hh = cms_heavy_hitters(keys, "key", k=20, top_m=128)
    key = np.asarray(hh["key"], dtype=np.int64).view(np.uint64)
    t1 = (key >> np.uint64(32)).astype(np.uint32).view(np.int32).astype(np.int64)
    t2 = (key & np.uint64(0xFFFFFFFF)).astype(np.uint32).view(np.int32).astype(np.int64)
    return pa.table({"t1": pa.array(t1), "t2": pa.array(t2),
                     "cnt": hh["cnt"]})


@query(
    "tokens_zipf_slope",
    _P() + """
SELECT CAST(COUNT(*) AS BIGINT) AS n_terms,
       REGR_SLOPE(ln(CAST(cnt AS DOUBLE)), ln(CAST(rank AS DOUBLE))) AS slope
FROM (
  SELECT COUNT(*) AS cnt,
         ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, token) AS rank
  FROM (SELECT CAST(unnest(tokens) AS BIGINT) AS token FROM recs2)
  GROUP BY token
) WHERE rank <= 100""",
)
def tokens_zipf_slope(sf_dir: str):
    """Zipf's-law slope over the top-100 vocabulary (corpus-health
    audit: natural text sits near −1, templated/duplicated text goes
    flat). The corpus pass is the existing vocab-bounded top-k
    aggregate; the ln-ln OLS fit is a closed-form finish on ≤100 rows
    — algebraically identical to the oracle's REGR_SLOPE."""
    from raylog.functions.tokens import zipf_slope
    from raylog.pipelines import log_pipeline as LP

    ds = LP.records_ds(sf_dir).select_columns(["tokens"])
    return zipf_slope(ds, k=100)


@query(
    "tokens_pmi_bigrams",
    _P() + """
, uni AS (SELECT CAST(unnest(tokens) AS BIGINT) AS token FROM recs2),
ucnt AS (SELECT token, COUNT(*) AS c FROM uni GROUP BY token),
pairs AS (
  SELECT CAST(tokens[CAST(i AS INT)] AS BIGINT) AS t1,
         CAST(tokens[CAST(i AS INT) + 1] AS BIGINT) AS t2
  FROM recs2, LATERAL (
    SELECT unnest(generate_series(1, CAST(n_tok AS INT) - 1)) AS i
  ) g
),
big AS (
  SELECT t1, t2, COUNT(*) AS cnt,
         ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, t1, t2) AS rank
  FROM pairs GROUP BY t1, t2
)
SELECT b.t1, b.t2, b.cnt, CAST(b.rank AS BIGINT) AS rank,
       ln((CAST(b.cnt AS DOUBLE) / (SELECT COUNT(*) FROM pairs))
          / ((CAST(u1.c AS DOUBLE) / (SELECT COUNT(*) FROM uni))
             * (CAST(u2.c AS DOUBLE) / (SELECT COUNT(*) FROM uni)))) AS pmi
FROM big b
JOIN ucnt u1 ON u1.token = b.t1
JOIN ucnt u2 ON u2.token = b.t2
WHERE b.rank <= 20""",
)
def tokens_pmi_bigrams(sf_dir: str):
    """Pointwise mutual information of the top-20 consecutive pairs
    (collocation mining — the association signal behind phrase/merge
    induction). Joins two aggregates the engine already has — the
    vocab-bounded unigram table and the top-k bigram table — plus one
    scalar partial for the bigram total; no additional corpus shuffle.
    """
    from raylog.functions.tokens import bigram_pmi
    from raylog.pipelines import log_pipeline as LP

    ds = LP.records_ds(sf_dir).select_columns(["tokens"])
    return bigram_pmi(ds, k=20)


@query(
    "tokens_skipgram_cooc",
    _P() + """
SELECT a, b, cnt, rank FROM (
  SELECT a, b, COUNT(*) AS cnt,
         ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, a, b) AS rank
  FROM (
    SELECT CAST(tokens[CAST(i AS INT)] AS BIGINT) AS a,
           CAST(tokens[CAST(j AS INT)] AS BIGINT) AS b
    FROM recs2,
         LATERAL (SELECT unnest(generate_series(1, CAST(n_tok AS INT))) AS i) gi,
         LATERAL (SELECT unnest([i - 2, i - 1, i + 1, i + 2]) AS j) gj
    WHERE j BETWEEN 1 AND CAST(n_tok AS INT)
  ) GROUP BY a, b
) WHERE rank <= 30""",
)
def tokens_skipgram_cooc(sf_dir: str):
    """Windowed (±2) co-occurrence heavy hitters — the word2vec-style
    skip-gram pair build. Per-block kernel emits distance-1..2 pairs in
    both directions from the flat token buffer (difference-array
    boundary mask, no per-row Python), then the same hash-partitioned
    combine + partial top-k as the bigram path."""
    from raylog.functions.tokens import skipgram_top_cooc
    from raylog.pipelines import log_pipeline as LP

    ds = LP.records_ds(sf_dir).select_columns(["tokens"])
    return skipgram_top_cooc(ds, k=30, window=2)


@query(
    "tokens_remap_filter",
    _P() + """
SELECT doc_id,
       CAST(len(list_filter(list_transform(tokens, t -> t % 7), t -> t >= 2))
            AS BIGINT) AS n_tok2,
       CAST(coalesce(list_aggregate(
              list_filter(list_transform(tokens, t -> t % 7), t -> t >= 2),
              'sum'), 0) AS BIGINT) AS tok_sum2
FROM recs2""",
)
def tokens_remap_filter(sf_dir: str):
    """Vocabulary surgery on the tokens payload: remap every token
    (t → t % 7, the shape of an id-remap lookup) then drop a stop-set
    (t < 2), REBUILDING the list column — flatten, vectorized
    mask/remap, new offsets from a masked cumsum; zero Python per row.
    The remap is arithmetic here so the oracle can restate it; swapping
    in a broadcast ``np.take`` lookup table is the same kernel."""
    import numpy as np

    from raylog.pipelines import log_pipeline as LP

    def surgery(b: pa.Table) -> pa.Table:
        col = b["tokens"]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        vals = np.asarray(col.flatten(), dtype=np.int64)
        lengths = np.asarray(pa.compute.list_value_length(col), dtype=np.int64)
        remapped = vals % 7
        keep = remapped >= 2
        kept = remapped[keep]
        # new per-row lengths: count of kept tokens per original row
        row_id = np.repeat(np.arange(len(lengths)), lengths)
        n2 = np.bincount(row_id[keep], minlength=len(lengths)).astype(np.int64)
        offsets = np.concatenate([[0], np.cumsum(n2)])
        new_col = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), pa.array(kept, pa.int64()))
        csum = np.concatenate([[0], np.cumsum(kept)])
        tok_sum2 = csum[offsets[1:]] - csum[offsets[:-1]]
        return pa.table({
            "doc_id": b["doc_id"],
            "n_tok2": pa.array(n2),
            "tok_sum2": pa.array(tok_sum2),
            "tokens2": new_col,
        })

    ds = LP.records_ds(sf_dir).select_columns(["doc_id", "tokens"])
    out = ds.map_batches(surgery, batch_format="pyarrow", batch_size=None)
    return out.select_columns(["doc_id", "n_tok2", "tok_sum2"])


@query(
    "embed_centroids",
    """
SELECT label, CAST(i AS BIGINT) AS dim,
       avg(embedding[CAST(i AS INT)]) AS v
FROM embeddings, LATERAL (
  SELECT unnest(generate_series(1, len(embedding))) AS i
) g
GROUP BY 1, 2""",
)
def embed_centroids(sf_dir: str):
    """Per-label embedding centroids: per-batch dim-wise sums (one numpy
    matrix reduction per label per block — never one row per (vector,
    dim)), merged on the tiny labels×dims grid."""
    import numpy as np
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["label", "embedding"])

    def partial(b: pa.Table) -> pa.Table:
        col = b["embedding"]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        dim = len(col[0]) if len(col) else 0
        mat = np.asarray(col.flatten(), dtype=np.float64).reshape(-1, dim)
        labels = np.asarray(b["label"].combine_chunks(), dtype=np.int64)
        uk = np.unique(labels)
        rows = []
        for lb in uk:  # labels are few; the reduction per label is vector
            sub = mat[labels == lb]
            rows.append((lb, sub.sum(axis=0), len(sub)))
        return pa.table({
            "label": pa.array([r[0] for r in rows], pa.int64()),
            "sums": pa.array([r[1].tolist() for r in rows],
                             pa.list_(pa.float64())),
            "n": pa.array([r[2] for r in rows], pa.int64()),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    acc: dict[int, tuple[np.ndarray, int]] = {}
    for t in parts.iter_batches(batch_format="pyarrow", batch_size=None):
        for lb, s, n in zip(t["label"].to_pylist(), t["sums"].to_pylist(),
                            t["n"].to_pylist()):
            s = np.asarray(s)
            if lb in acc:
                acc[lb] = (acc[lb][0] + s, acc[lb][1] + n)
            else:
                acc[lb] = (s, n)
    labels_out, dims_out, vals_out = [], [], []
    for lb in sorted(acc):
        s, n = acc[lb]
        for i, v in enumerate(s / n):
            labels_out.append(lb)
            dims_out.append(i + 1)
            vals_out.append(v)
    return pa.table({
        "label": pa.array(labels_out, pa.int64()),
        "dim": pa.array(dims_out, pa.int64()),
        "v": pa.array(vals_out, pa.float64()),
    })


@query(
    "tokens_percentile_curation",
    _P() + """
, q AS (
  SELECT source,
         quantile_disc(n_tok, 0.10) AS lo,
         quantile_disc(n_tok, 0.90) AS hi
  FROM recs2 GROUP BY source
)
SELECT r.source, CAST(COUNT(*) AS BIGINT) AS kept,
       CAST(SUM(r.n_tok) AS BIGINT) AS kept_tokens
FROM recs2 r JOIN q ON r.source = q.source
WHERE r.n_tok >= q.lo AND r.n_tok <= q.hi
GROUP BY r.source""",
)
def tokens_percentile_curation(sf_dir: str):
    """Percentile-threshold curation: per-source p10/p90 length bounds
    from the histogram quantile op, broadcast as a plain dict (quantile
    output is key-cardinality-bounded), then a shuffle-free filter +
    count pass — the 'trim the length-distribution tails per domain'
    recipe."""
    import numpy as np
    import pyarrow.compute as pc

    from raylog.functions.agg import grouped_aggregate
    from raylog.functions.quantile import grouped_quantiles
    from raylog.pipelines import log_pipeline as LP

    ds = LP.records_ds(sf_dir).select_columns(["source", "n_tok"]).map_batches(
        lambda b: b.set_column(
            b.column_names.index("n_tok"), "n_tok",
            pc.cast(b["n_tok"], pa.int64())),
        batch_format="pyarrow", batch_size=None,
    )
    q = grouped_quantiles(ds, key="source", value="n_tok", ps=[0.10, 0.90],
                          out_names=["lo", "hi"], num_partitions=8).to_pandas()
    # tiny (source → lo/hi) dim arrays; per-batch lookup is a single
    # vectorized pc.index_in + numpy gather, no per-row Python
    keys = pa.array(q["source"].tolist(), pa.string())
    lo_arr = np.asarray(q["lo"], dtype=np.float64)
    hi_arr = np.asarray(q["hi"], dtype=np.float64)

    def keep(b: pa.Table) -> pa.Table:
        idx = np.asarray(pc.index_in(b["source"], value_set=keys)
                         .combine_chunks(), dtype=np.int64)
        n = np.asarray(b["n_tok"].combine_chunks(), dtype=np.int64)
        lo = lo_arr[idx]
        hi = hi_arr[idx]
        return b.filter(pa.array((n >= lo) & (n <= hi)))

    kept = ds.map_batches(keep, batch_format="pyarrow", batch_size=None)
    return grouped_aggregate(kept, ["source"], [
        ("*", "count", "kept"), ("n_tok", "sum", "kept_tokens"),
    ])


@query(
    "orders_rollup",
    """
SELECT coalesce(o_orderpriority, '(all)') AS o_orderpriority,
       coalesce(o_orderstatus, '(all)') AS o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n
FROM orders
GROUP BY ROLLUP (o_orderpriority, o_orderstatus)""",
)
def orders_rollup(sf_dir: str):
    """ROLLUP aggregation (priority → priority×status → grand total) as
    a union of three key-compressed partial aggregates — each level is
    its own tiny exchange, no re-scan (the finest level feeds the
    coarser ones)."""
    import pandas as pd
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderpriority", "o_orderstatus"])
    fine = grouped_aggregate(
        ds, ["o_orderpriority", "o_orderstatus"], [("*", "count", "n")],
    ).to_pandas()
    mid = fine.groupby("o_orderpriority", as_index=False)["n"].sum()
    mid["o_orderstatus"] = "(all)"
    total = pd.DataFrame({
        "o_orderpriority": ["(all)"], "o_orderstatus": ["(all)"],
        "n": [fine["n"].sum()],
    })
    out = pd.concat([fine, mid, total], ignore_index=True)[
        ["o_orderpriority", "o_orderstatus", "n"]]
    out["n"] = out["n"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


@query(
    "tokens_pack_chunks",
    _P() + """
, r AS (SELECT doc_id, doc_id % 8 AS shard, n_tok FROM recs2),
c AS (
  SELECT shard, doc_id, n_tok,
         SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
                          ROWS UNBOUNDED PRECEDING) AS cum
  FROM r
)
SELECT shard, doc_id,
       CAST((cum - n_tok) // 512 AS BIGINT) AS first_pack,
       CAST(CASE WHEN n_tok > 0 THEN (cum - 1) // 512
            ELSE (cum - n_tok) // 512 END AS BIGINT) AS last_pack,
       CAST((cum - n_tok) % 512 AS BIGINT) AS first_offset
FROM c""",
)
def tokens_pack_chunks(sf_dir: str):
    """Sequence packing (concat-and-chunk): per-shard token streams cut
    into fixed 512-token context windows; each doc's window span and
    offset computed closed-form from a per-shard running sum — one
    vectorized pass per hash partition."""
    from raylog.functions.packing import pack_chunks
    from raylog.pipelines import log_pipeline as LP

    ds = LP.records_ds(sf_dir).select_columns(["doc_id", "n_tok"])
    out = pack_chunks(ds, max_tokens=512, num_shards=8, num_partitions=8)
    return out


@query(
    "tokens_pack_windows",
    _P() + """
, r AS (SELECT doc_id, doc_id % 8 AS shard, tokens FROM recs2),
flat AS (
  SELECT shard, doc_id, i, tokens[CAST(i AS INT)] AS t
  FROM r, LATERAL (
    SELECT unnest(generate_series(1, len(tokens))) AS i
  ) g
),
seq AS (
  SELECT shard, t,
         CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY doc_id, i)
              - 1 AS BIGINT) AS pos
  FROM flat
)
SELECT shard, CAST(pos // 512 AS BIGINT) AS pack_id,
       CAST(COUNT(*) AS BIGINT) AS n_fill,
       CAST(SUM((pos % 512 + 1) * t) AS BIGINT) AS tok_chk
FROM seq GROUP BY shard, pos // 512""",
)
def tokens_pack_windows(sf_dir: str):
    """MATERIALIZED context windows: the actual fixed 512-token
    sequences a trainer reads (concat-and-chunk per shard in doc
    order), built as a real list<int32> column with zero per-window
    Python. The oracle form reduces each window to a position-weighted
    checksum — order- and value-exact — because the raw list column is
    the deliverable but a scalar is the robust hash-compare form."""
    import numpy as np

    from raylog.functions.packing import pack_windows
    from raylog.pipelines import log_pipeline as LP

    ds = LP.records_ds(sf_dir).select_columns(["doc_id", "tokens"])
    wins = pack_windows(ds, max_tokens=512, num_shards=8, num_partitions=8)

    def checksum(b: pa.Table) -> pa.Table:
        toks = b["tokens"]
        toks = (toks.combine_chunks() if isinstance(toks, pa.ChunkedArray)
                else toks)
        off = np.asarray(toks.offsets, dtype=np.int64)
        vals = np.asarray(toks.values, dtype=np.int64)[off[0]:off[-1]]
        off = off - off[0]
        pos = (np.arange(len(vals), dtype=np.int64)
               - np.repeat(off[:-1], np.diff(off)) + 1)
        csum = np.concatenate([[0], np.cumsum(vals * pos)])
        chk = csum[off[1:]] - csum[off[:-1]]
        return pa.table({
            "shard": b["shard"],
            "pack_id": b["pack_id"],
            "n_fill": b["n_fill"],
            "tok_chk": pa.array(chk),
        })

    return wins.map_batches(checksum, batch_format="pyarrow",
                            batch_size=None)


@query(
    "tokens_quantile_sketch",
    _P() + """
, t AS (SELECT source, n_tok FROM recs2 WHERE n_tok > 0),
b AS (
  SELECT source,
         CAST(CEIL(LN(CAST(n_tok AS DOUBLE)) / LN(1.01 / 0.99)) AS BIGINT)
           AS bucket
  FROM t
),
h AS (SELECT source, bucket, COUNT(*) AS cnt FROM b GROUP BY 1, 2),
r AS (
  SELECT source, bucket,
         SUM(cnt) OVER (PARTITION BY source ORDER BY bucket
                        ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(cnt) OVER (PARTITION BY source) AS tot
  FROM h
)
SELECT source, q.q_milli, CAST(MIN(bucket) AS BIGINT) AS bucket
FROM r, (VALUES (500), (950), (990)) AS q(q_milli)
WHERE cum >= GREATEST(1, CEIL(q.q_milli / 1000.0 * tot))
GROUP BY 1, 2""",
)
def tokens_quantile_sketch(sf_dir: str):
    """DDSketch per-source token-length quantiles (p50/p95/p99) — the
    MERGEABLE sketch path for unbounded value domains that
    quantile.py's exact histogram path points to: log-width buckets
    bound every estimate's relative error at alpha=1%, and partials are
    key-compressed (group, bucket) counts, so the merge is the ordinary
    hash-partitioned grouped count. Output carries the bucket INDEX
    (integer — exact oracle compare); dd_value(bucket, alpha) is the
    value estimate. The oracle replays ceil(ln(x)/ln(gamma)) in SQL —
    numpy and DuckDB share libm doubles on one host, so indices match
    exactly; a cross-platform oracle would compare dd_value within
    alpha instead of indices."""
    from raylog.functions.quantile import grouped_quantile_sketch
    from raylog.pipelines import log_pipeline as LP

    ds = LP.records_ds(sf_dir).select_columns(["source", "n_tok"])
    return grouped_quantile_sketch(
        ds, group_cols=["source"], value_col="n_tok",
        qs=[0.5, 0.95, 0.99], alpha=0.01)


@query(
    "tokens_pack_segments",
    _P() + """
, r AS (SELECT doc_id, doc_id % 8 AS shard, n_tok FROM recs2),
c AS (
  SELECT shard, doc_id, n_tok,
         SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
                          ROWS UNBOUNDED PRECEDING) AS cum
  FROM r
),
e AS (
  SELECT shard, doc_id, n_tok, cum, cum - n_tok AS strt,
         CAST((cum - n_tok) // 512 AS BIGINT) AS first_pack,
         CAST(CASE WHEN n_tok > 0 THEN (cum - 1) // 512
              ELSE (cum - n_tok) // 512 END AS BIGINT) AS last_pack
  FROM c
),
x AS (
  SELECT shard, doc_id, w,
         LEAST(cum, (w + 1) * 512) - GREATEST(strt, w * 512) AS overlap
  FROM e, LATERAL (
    SELECT unnest(generate_series(first_pack, last_pack)) AS w
  ) g
  WHERE n_tok > 0
),
rk AS (
  SELECT shard, w, overlap,
         CAST(ROW_NUMBER() OVER (PARTITION BY shard, w ORDER BY doc_id)
              AS BIGINT) AS rnk
  FROM x
)
SELECT shard, CAST(w AS BIGINT) AS pack_id,
       CAST(COUNT(*) AS BIGINT) AS n_segments,
       CAST(SUM(rnk * overlap) AS BIGINT) AS seg_chk
FROM rk GROUP BY 1, 2""",
)
def tokens_pack_segments(sf_dir: str):
    """Per-window SEGMENT bookkeeping for packed sequences: how many
    docs each 512-token context window spans and an order-weighted
    checksum over their in-window token counts — the metadata a trainer
    turns into block-diagonal attention masks. Closed form from the
    per-shard running sum; the per-window aggregate completes inside
    the shard's partition (no second exchange)."""
    from raylog.functions.packing import pack_segments
    from raylog.pipelines import log_pipeline as LP

    ds = LP.records_ds(sf_dir).select_columns(["doc_id", "n_tok"])
    return pack_segments(ds, max_tokens=512, num_shards=8,
                         num_partitions=8)


@query(
    "tokens_pack_windows_eos",
    _P() + """
, r AS (SELECT doc_id, doc_id % 8 AS shard,
               list_append(tokens, 99999) AS tokens
        FROM recs2),
flat AS (
  SELECT shard, doc_id, i, tokens[CAST(i AS INT)] AS t
  FROM r, LATERAL (
    SELECT unnest(generate_series(1, len(tokens))) AS i
  ) g
),
seq AS (
  SELECT shard, t,
         CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY doc_id, i)
              - 1 AS BIGINT) AS pos
  FROM flat
)
SELECT shard, CAST(pos // 512 AS BIGINT) AS pack_id,
       CAST(COUNT(*) AS BIGINT) AS n_fill,
       CAST(SUM((pos % 512 + 1) * t) AS BIGINT) AS tok_chk
FROM seq GROUP BY shard, pos // 512""",
)
def tokens_pack_windows_eos(sf_dir: str):
    """Context windows with a document separator (EOS id 99999)
    inserted after every doc before chunking — the standard trainer
    layout so models learn document boundaries inside packed windows.
    Same checksum oracle form as `tokens_pack_windows`."""
    import numpy as np

    from raylog.functions.packing import pack_windows
    from raylog.pipelines import log_pipeline as LP

    ds = LP.records_ds(sf_dir).select_columns(["doc_id", "tokens"])
    wins = pack_windows(ds, max_tokens=512, num_shards=8,
                        num_partitions=8, sep_token=99999)

    def checksum(b: pa.Table) -> pa.Table:
        toks = b["tokens"]
        toks = (toks.combine_chunks() if isinstance(toks, pa.ChunkedArray)
                else toks)
        off = np.asarray(toks.offsets, dtype=np.int64)
        vals = np.asarray(toks.values, dtype=np.int64)[off[0]:off[-1]]
        off = off - off[0]
        pos = (np.arange(len(vals), dtype=np.int64)
               - np.repeat(off[:-1], np.diff(off)) + 1)
        csum = np.concatenate([[0], np.cumsum(vals * pos)])
        chk = csum[off[1:]] - csum[off[:-1]]
        return pa.table({
            "shard": b["shard"],
            "pack_id": b["pack_id"],
            "n_fill": b["n_fill"],
            "tok_chk": pa.array(chk),
        })

    return wins.map_batches(checksum, batch_format="pyarrow",
                            batch_size=None)


@query(
    "tokens_span_corruption",
    _P() + """
, pos AS (
  SELECT doc_id, n_tok, i - 1 AS p, tokens[CAST(i AS INT)] AS t
  FROM recs2, LATERAL (
    SELECT unnest(generate_series(1, len(tokens))) AS i
  ) g
),
m AS (
  SELECT *,
         ((p + doc_id * 7) % 10 = 0
          OR (p >= 1 AND (p - 1 + doc_id * 7) % 10 = 0)
          OR (p >= 2 AND (p - 2 + doc_id * 7) % 10 = 0)) AS masked
  FROM pos
),
r AS (
  SELECT doc_id, masked, t,
         CAST(ROW_NUMBER() OVER (PARTITION BY doc_id, masked
                                 ORDER BY p) AS BIGINT) AS rnk
  FROM m
)
SELECT doc_id,
       CAST(SUM(CASE WHEN masked THEN 1 ELSE 0 END) AS BIGINT) AS n_masked,
       CAST(COALESCE(SUM(CASE WHEN masked THEN rnk * t END), 0)
            AS BIGINT) AS target_chk,
       CAST(COALESCE(SUM(CASE WHEN NOT masked THEN rnk * t END), 0)
            AS BIGINT) AS input_chk
FROM r GROUP BY doc_id""",
)
def tokens_span_corruption(sf_dir: str):
    """Denoising-objective (T5/UL2 span corruption) data prep, counted
    and checksummed: a deterministic rule starts a 3-token mask span at
    every position p with (p + 7·doc_id) % 10 == 0 (≈30% corruption
    after overlap), splitting each doc into the model INPUT (kept
    tokens) and the denoising TARGET (masked tokens). Output per doc:
    n_masked plus position-weighted checksums of both streams — exact
    content+order witnesses without emitting the streams themselves.
    Map-only and fully vectorized (the mask is three shifted modular
    tests; stream checksums are segmented cumsums)."""
    import numpy as np

    from raylog.pipelines import log_pipeline as LP

    ds = LP.records_ds(sf_dir).select_columns(["doc_id", "tokens"])

    def corrupt(b: pa.Table) -> pa.Table:
        toks = b["tokens"]
        toks = (toks.combine_chunks() if isinstance(toks, pa.ChunkedArray)
                else toks)
        off = np.asarray(toks.offsets, dtype=np.int64)
        vals = np.asarray(toks.values, dtype=np.int64)[off[0]:off[-1]]
        off = off - off[0]
        ids = np.asarray(b["doc_id"].combine_chunks(), dtype=np.int64)
        lens = np.diff(off)
        row = np.repeat(np.arange(len(ids), dtype=np.int64), lens)
        p = np.arange(len(vals), dtype=np.int64) - np.repeat(off[:-1], lens)
        phase = (p + ids[row] * 7) % 10
        masked = (phase == 0)
        masked |= (p >= 1) & ((phase - 1) % 10 == 0)
        masked |= (p >= 2) & ((phase - 2) % 10 == 0)
        # rank within (doc, masked-stream): running count per stream
        def stream_chk(sel: np.ndarray) -> np.ndarray:
            r = row[sel]
            ones = np.ones(sel.sum(), dtype=np.int64)
            # rank = position within its doc segment of the stream
            seg_start = np.concatenate(
                [[True], r[1:] != r[:-1]]) if len(r) else np.array([], bool)
            csum = np.cumsum(ones)
            base = np.repeat(csum[np.flatnonzero(seg_start)] - 1,
                             np.diff(np.append(np.flatnonzero(seg_start),
                                               len(r))))
            rnk = csum - base
            prod = np.cumsum(vals[sel] * rnk)
            prodc = np.concatenate([[0], prod])
            starts = np.flatnonzero(seg_start)
            ends = np.append(starts[1:], len(r))
            out = np.zeros(len(ids), dtype=np.int64)
            out[r[starts]] = prodc[ends] - prodc[starts]
            return out

        return pa.table({
            "doc_id": pa.array(ids),
            "n_masked": pa.array(np.bincount(
                row[masked], minlength=len(ids)).astype(np.int64)),
            "target_chk": pa.array(stream_chk(masked)),
            "input_chk": pa.array(stream_chk(~masked)),
        })

    return ds.map_batches(corrupt, batch_format="pyarrow", batch_size=None)


@query(
    "tokens_batch_padding",
    _P() + """
, t AS (
  SELECT doc_id, n_tok,
         CAST(((n_tok + 31) // 32) * 32 AS BIGINT) AS lbucket
  FROM recs2
),
r AS (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY lbucket ORDER BY doc_id)
                 - 1 AS BIGINT) AS rn
  FROM t
)
SELECT lbucket, CAST(rn // 16 AS BIGINT) AS batch_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS real_tok,
       CAST(MAX(n_tok) * COUNT(*) AS BIGINT) AS padded_tok
FROM r GROUP BY 1, 2""",
)
def tokens_batch_padding(sf_dir: str):
    """Length-bucketed dynamic batching with padding accounting: docs
    round up to 32-token length buckets, rank within their bucket (the
    skew-proof bucketed running count — no per-bucket giant task), form
    16-doc batches in rank order, and each batch reports real vs padded
    tokens (padded = batch max × batch size — the dynamic-padding cost
    a dataloader pays). The real/padded ratio is the padding-efficiency
    curve that picks bucket widths."""
    from raylog.functions.agg import grouped_aggregate_ds
    from raylog.pipelines import log_pipeline as LP
    from raylog.stages.ordered import running_count

    ds = LP.records_ds(sf_dir).select_columns(["doc_id", "n_tok"])

    def add_bucket(b: pa.Table) -> pa.Table:
        import numpy as np

        nt = np.asarray(b["n_tok"].combine_chunks(), dtype=np.int64)
        return b.append_column("lbucket", pa.array(((nt + 31) // 32) * 32))

    ranked = running_count(
        ds.map_batches(add_bucket, batch_format="pyarrow", batch_size=None),
        part_col="lbucket", order_col="doc_id", out_col="rank",
    )

    def add_batch(b: pa.Table) -> pa.Table:
        import numpy as np

        rk = np.asarray(b["rank"].combine_chunks(), dtype=np.int64)
        return b.append_column("batch_id", pa.array((rk - 1) // 16))

    # (lbucket, batch_id) cardinality GROWS with corpus size (~n/16
    # rows) — hash-partitioned combine, never a driver merge
    agg = grouped_aggregate_ds(
        ranked.map_batches(add_batch, batch_format="pyarrow",
                           batch_size=None),
        ["lbucket", "batch_id"],
        [("*", "count", "n_docs"), ("n_tok", "sum", "real_tok"),
         ("n_tok", "max", "max_tok")],
        num_partitions=8,
    )

    def finish(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return (b.append_column(
            "padded_tok", pc.multiply(b["max_tok"], b["n_docs"]))
            .drop_columns(["max_tok"]))

    return agg.map_batches(finish, batch_format="pyarrow", batch_size=None)


@query(
    "tokens_pack_greedy",
    # first-fit is a sequential recurrence — expressible as a DuckDB
    # recursive CTE stepping one doc per shard per iteration (the
    # dedup_cluster_sizes technique; VERDICT r2 next-round #7)
    _P().replace("WITH ", "WITH RECURSIVE ", 1) + """
, r AS (SELECT doc_id, doc_id % 8 AS shard, n_tok FROM recs2),
seq AS (
  SELECT shard, doc_id, n_tok,
         CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY doc_id)
              AS BIGINT) AS rn,
         CAST(SUM(LEAST(n_tok, 512)) OVER (PARTITION BY shard
              ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
  FROM r
),
g AS (
  SELECT shard, doc_id, n_tok, rn, cum,
         CAST(0 AS BIGINT) AS pack_id, CAST(0 AS BIGINT) AS base
  FROM seq WHERE rn = 1
  UNION ALL
  SELECT s.shard, s.doc_id, s.n_tok, s.rn, s.cum,
         CASE WHEN s.cum <= g.base + 512 THEN g.pack_id
              ELSE g.pack_id + 1 END,
         CASE WHEN s.cum <= g.base + 512 THEN g.base ELSE g.cum END
  FROM g JOIN seq s ON s.shard = g.shard AND s.rn = g.rn + 1
)
SELECT shard, doc_id, pack_id, n_tok > 512 AS overflow FROM g""",
)
def tokens_pack_greedy(sf_dir: str):
    """Sequence packing (whole-doc first-fit): greedy window assignment
    per shard; sequential boundary recurrence as per-pack searchsorted
    steps on the partition cumsum. Packing invariants additionally
    asserted in tests/test_packing.py."""
    from raylog.functions.packing import pack_greedy
    from raylog.pipelines import log_pipeline as LP

    ds = LP.records_ds(sf_dir).select_columns(["doc_id", "n_tok"])
    return pack_greedy(ds, max_tokens=512, num_shards=8, num_partitions=8)


@query(
    "export_sorted_by_toklen",
    _P() + """
SELECT doc_id, n_tok FROM recs2""",
)
def export_sorted_by_toklen(sf_dir: str):
    """Globally-sorted range-partitioned export: records written as
    range-disjoint parquet files sorted by n_tok (sample-based range
    cuts, per-range sort, idempotent file names); the gate checks the
    round-tripped content, pytest checks the global order contract."""
    import glob
    import os

    import pyarrow.compute as pc
    import pyarrow.parquet as _pq
    import ray.data as rd

    from raylog.functions.sortexport import range_sorted_export
    from raylog.pipelines import log_pipeline as LP

    ds = LP.records_ds(sf_dir).select_columns(["doc_id", "n_tok"]).map_batches(
        lambda b: b.set_column(b.column_names.index("n_tok"), "n_tok",
                               pc.cast(b["n_tok"], pa.int64())),
        batch_format="pyarrow", batch_size=None,
    )
    out_dir = f"/tmp/raylog_cache/sorted_{os.path.basename(sf_dir.rstrip('/'))}"
    range_sorted_export(ds, out_dir, key="n_tok", num_ranges=8)
    files = sorted(glob.glob(f"{out_dir}/range_*.parquet"))
    return pa.concat_tables([_pq.read_table(f) for f in files])


@query(
    "tokens_quantiles_by_source",
    _P() + """
SELECT source,
       quantile_disc(n_tok, 0.5) AS p50,
       quantile_disc(n_tok, 0.9) AS p90,
       quantile_disc(n_tok, 0.99) AS p99
FROM recs2 GROUP BY source""",
)
def tokens_quantiles_by_source(sf_dir: str):
    """Exact per-source sequence-length quantiles via a (source, n_tok)
    count histogram — grouped counts are the only shuffle; no sort of
    the data."""
    import pyarrow.compute as pc

    from raylog.functions.quantile import grouped_quantiles
    from raylog.pipelines import log_pipeline as LP

    ds = LP.records_ds(sf_dir).select_columns(["source", "n_tok"]).map_batches(
        lambda b: b.set_column(
            b.column_names.index("n_tok"), "n_tok",
            pc.cast(b["n_tok"], pa.int64())),
        batch_format="pyarrow", batch_size=None,
    )
    return grouped_quantiles(ds, key="source", value="n_tok",
                             ps=[0.5, 0.9, 0.99], num_partitions=8)


@query(
    "text_tfidf_top_terms",
    """
WITH words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM words GROUP BY 1, 2),
df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
nd AS (SELECT COUNT(*) AS n FROM documents),
scored AS (
  SELECT doc_id, term, tf, tf * ln(n * 1.0 / df) AS score
  FROM tf JOIN df USING (term) CROSS JOIN nd
),
r AS (SELECT *, CAST(ROW_NUMBER() OVER (
        PARTITION BY doc_id ORDER BY score DESC, term) AS BIGINT) AS rank
      FROM scored)
SELECT doc_id, term, tf, score, rank FROM r WHERE rank <= 3""",
)
def text_tfidf_top_terms(sf_dir: str):
    """Per-document top-3 TF-IDF terms: batch-local tf, distributed df,
    hash join on term, per-doc head inside whole-doc hash partitions."""
    import pyarrow.parquet as _pq
    import ray.data as rd

    from raylog.functions.tfidf import tfidf_top_terms

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    n_docs = _pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    out = tfidf_top_terms(ds, n_docs=n_docs, k=3, num_partitions=8)
    return out.select_columns(["doc_id", "term", "tf", "score", "rank"])


@query(
    "text_chunks",
    """
SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
       substr(text, CAST(i * 80 + 1 AS INT), 120) AS chunk,
       CAST(length(substr(text, CAST(i * 80 + 1 AS INT), 120)) AS BIGINT)
         AS chunk_len
FROM documents, LATERAL (
  SELECT unnest(generate_series(0, (length(text) - 1) // 80)) AS i
) g
WHERE length(text) > 0""",
)
def text_chunks(sf_dir: str):
    """Overlapping character chunking (size 120, stride 80) — the
    RAG/pretraining doc-splitting step, one numpy byte-gather per batch
    (no per-row or per-chunk Python)."""
    import ray.data as rd

    from raylog.functions.text import chunk_texts

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return ds.map_batches(
        lambda b: chunk_texts(b, size=120, stride=80),
        batch_format="pyarrow", batch_size=None,
    )


_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\b\d{3}-\d{4}\b"


@query(
    "text_pii_redact",
    f"""
WITH w AS (
  SELECT doc_id,
         text || ' contact user' || doc_id || '@ex' || (doc_id % 7)
              || '.com tel 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
           AS t
  FROM documents
)
SELECT doc_id,
       regexp_replace(regexp_replace(t, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                      '{_PHONE_RE}', '<PHONE>', 'g') AS clean,
       CAST(len(regexp_extract_all(t, '{_EMAIL_RE}')) +
            len(regexp_extract_all(t, '{_PHONE_RE}')) AS BIGINT) AS n_pii
FROM w""",
)
def text_pii_redact(sf_dir: str):
    """PII scrubbing: vectorized RE2 redaction of emails + phone numbers
    (deterministically injected so the oracle can restate the input).
    Single-pass Arrow kernels — compiled once, no Python per row."""
    import pyarrow.compute as pc
    import ray.data as rd

    def scrub(b: pa.Table) -> pa.Table:
        import numpy as np

        ids = np.asarray(b["doc_id"].combine_chunks(), dtype=np.int64)
        did = pc.cast(b["doc_id"], pa.string())
        mod7 = pa.array((ids % 7).astype("U1"))
        mod1e4 = pc.utf8_lpad(pa.array((ids % 10000).astype("U4")), 4, "0")
        n = b.num_rows

        def lit(s):
            return pa.array([s] * n, pa.string())

        t = pc.binary_join_element_wise(
            b["text"], lit(" contact user"), did, lit("@ex"), mod7,
            lit(".com tel 555-"), mod1e4, "",
        )
        n_pii = pc.add(
            pc.count_substring_regex(t, _EMAIL_RE),
            pc.count_substring_regex(t, _PHONE_RE),
        )
        clean = pc.replace_substring_regex(t, _EMAIL_RE, "<EMAIL>")
        clean = pc.replace_substring_regex(clean, _PHONE_RE, "<PHONE>")
        return pa.table({
            "doc_id": b["doc_id"],
            "clean": clean,
            "n_pii": pc.cast(n_pii, pa.int64()),
        })

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return ds.map_batches(scrub, batch_format="pyarrow", batch_size=None)


@query(
    "text_tokenize",
    """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
words AS (SELECT doc_id, unnest(ws) AS wd,
                 generate_subscripts(ws, 1) AS pos FROM w),
vocab AS (SELECT wd, ROW_NUMBER() OVER (ORDER BY wd) - 1 AS tok
          FROM (SELECT DISTINCT wd FROM words))
SELECT doc_id, CAST(pos AS BIGINT) AS pos, CAST(tok AS BIGINT) AS tok
FROM words JOIN vocab USING (wd)""",
)
def text_tokenize(sf_dir: str):
    """Corpus tokenization — vocabulary build + encode, the bridge from
    raw documents to the engine's tokenized-sequences input shape.

    Pass 1 builds the vocabulary DISTRIBUTED: each batch emits its
    batch-distinct words (batch-distinct-bounded, never one row per
    token), the hash-partitioned aggregate dedups them, and the sorted
    vocab — token id = lexicographic rank, the deterministic analog of
    a trained BPE merge table — is broadcast once via ``ray.put``.
    Pass 2 encodes every batch vectorized: split → flatten →
    ``np.searchsorted`` → exploded (doc_id, pos, tok) rows. At real
    scale the vocab is capped top-K + UNK id (standard practice);
    output would stay ``list<int32>`` per doc rather than exploded —
    exploded here because the driver compare needs scalar rows.
    """
    import numpy as np
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate_ds

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def batch_vocab(b: pa.Table) -> pa.Table:
        split = pc.split_pattern(b["text"].combine_chunks(), " ")
        return pa.table({"wd": pc.unique(split.flatten())})

    vc = grouped_aggregate_ds(
        ds.map_batches(batch_vocab, batch_format="pyarrow",
                       batch_size=None), ["wd"], [],
    ).to_pandas()
    vocab = np.sort(np.array(vc["wd"], dtype="U"))
    vocab_ref = ray.put(vocab) if ray.is_initialized() else vocab

    def encode(b: pa.Table) -> pa.Table:
        v = ray.get(vocab_ref) if ray.is_initialized() else vocab_ref
        split = pc.split_pattern(b["text"].combine_chunks(), " ")
        lens = np.asarray(pc.list_value_length(split), dtype=np.int64)
        flat = split.flatten().dictionary_encode()
        codes = np.asarray(flat.indices, dtype=np.int64)
        dict_tok = np.searchsorted(v, np.asarray(flat.dictionary, dtype="U"))
        ids = np.asarray(b["doc_id"].combine_chunks(), dtype=np.int64)
        pos = (np.arange(lens.sum(), dtype=np.int64)
               - np.repeat(np.cumsum(lens) - lens, lens) + 1)  # 1-based
        return pa.table({
            "doc_id": pa.array(np.repeat(ids, lens)),
            "pos": pa.array(pos),
            "tok": pa.array(dict_tok[codes].astype(np.int64)),
        })

    return ds.map_batches(encode, batch_format="pyarrow", batch_size=None)


@query(
    "corpus_source_overlap",
    """
WITH sw AS (SELECT DISTINCT source, unnest(string_split(text, ' ')) AS w
            FROM documents),
sizes AS (SELECT source, COUNT(*) AS n FROM sw GROUP BY source),
inter AS (SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS n_inter
          FROM sw a JOIN sw b USING (w)
          WHERE a.source < b.source GROUP BY 1, 2)
SELECT src_a, src_b, n_inter,
       sa.n + sb.n - n_inter AS n_union,
       CAST(ROUND(1000.0 * n_inter / (sa.n + sb.n - n_inter)) AS BIGINT)
         AS jacc_milli
FROM inter
JOIN sizes sa ON sa.source = src_a
JOIN sizes sb ON sb.source = src_b""",
)
def corpus_source_overlap(sf_dir: str):
    """Inter-corpus overlap diagnostics: vocabulary Jaccard for every
    source pair — the "how much do my data sources duplicate each
    other" matrix that drives mixture design before training.

    Shape: distinct (source, word) pairs via the hash-partitioned
    aggregate (vocab×sources-bounded exchange, never one row per
    token); per-word source-pair expansion inside complete-postings
    hash partitions (the inverted-index pair kernel shared with n-gram
    dedup — a word shared by m sources costs m²/2, bounded by the
    source count, not the corpus); the pair matrix itself is
    sources²-bounded, so the final join with sizes is driver-trivial.
    """
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import (grouped_aggregate,
                                      grouped_aggregate_ds,
                                      partitioned_group_apply)
    from raylog.functions.dedup import _intra_bucket_pairs

    import pyarrow.compute as pc

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["source", "text"])

    def pairs(b: pa.Table) -> pa.Table:
        split = pc.split_pattern(b["text"].combine_chunks(), " ")
        lens = np.asarray(pc.list_value_length(split), dtype=np.int64)
        flat = split.flatten().dictionary_encode()
        codes = np.asarray(flat.indices, dtype=np.int64)
        src = b["source"].combine_chunks().dictionary_encode()
        sidx = np.repeat(np.asarray(src.indices, dtype=np.int64), lens)
        vocab = len(flat.dictionary)
        u = np.unique(sidx * vocab + codes)
        return pa.table({
            "source": src.dictionary.take(pa.array(u // vocab)),
            "w": flat.dictionary.take(pa.array(u % vocab)),
        })

    sw = grouped_aggregate_ds(
        ds.map_batches(pairs, batch_format="pyarrow", batch_size=None),
        ["source", "w"], [],
    )
    sizes = grouped_aggregate(sw, ["source"], [("*", "count", "n")])
    src_names = np.array(sorted(sizes["source"].to_pylist()), dtype=object)
    n_by = dict(zip(sizes["source"].to_pylist(), sizes["n"].to_pylist()))
    sid = {s: i for i, s in enumerate(src_names)}

    name_arr = pa.array(list(src_names), pa.string())

    def to_sid(b: pa.Table) -> pa.Table:
        ids = np.asarray(
            pc.index_in(b["source"], value_set=name_arr).combine_chunks(),
            dtype=np.int64)
        return pa.table({"w": b["w"], "sid": pa.array(ids)})

    inter = grouped_aggregate(
        partitioned_group_apply(
            sw.map_batches(to_sid, batch_format="pyarrow", batch_size=None),
            ["w"],
            lambda part: _intra_bucket_pairs(part, ["w"], id_col="sid"),
        ),
        ["doc_a", "doc_b"], [("*", "count", "n_inter")],
    )
    if "doc_a" not in inter.column_names:  # no cross-source word pair
        z = pa.array([], pa.int64())
        e = pa.array([], pa.string())
        return pa.table({"src_a": e, "src_b": e, "n_inter": z,
                         "n_union": z, "jacc_milli": z})
    a = inter["doc_a"].to_numpy()
    b_ = inter["doc_b"].to_numpy()
    ni = inter["n_inter"].to_numpy()
    na = np.array([n_by[src_names[i]] for i in a], dtype=np.int64)
    nb = np.array([n_by[src_names[i]] for i in b_], dtype=np.int64)
    nu = na + nb - ni
    return pa.table({
        "src_a": pa.array(src_names[a], pa.string()),
        "src_b": pa.array(src_names[b_], pa.string()),
        "n_inter": pa.array(ni, pa.int64()),
        "n_union": pa.array(nu, pa.int64()),
        "jacc_milli": pa.array(np.round(1000.0 * ni / nu).astype(np.int64)),
    })


@query(
    "text_decontaminate",
    """
WITH snips AS (
  SELECT DISTINCT substr(text, 1, 40) AS snip
  FROM documents WHERE doc_id % 97 = 0 AND len(text) >= 40
)
SELECT d.doc_id,
       EXISTS(SELECT 1 FROM snips s WHERE contains(d.text, s.snip))
         AS contaminated
FROM documents d""",
)
def text_decontaminate(sf_dir: str):
    """Benchmark decontamination: flag training docs containing a
    verbatim snippet from the held-out eval set (here: the 40-char
    prefix of every ``doc_id % 97 == 0`` doc — a deterministic stand-in
    for a benchmark blocklist).

    Scale shape: the snippet set is TINY relative to the corpus (an
    eval suite, not a second corpus), so it is collected once, compiled
    into ONE RE2 alternation (RE2 builds a DFA — matching is a single
    vectorized pass per batch regardless of snippet count), and
    broadcast via ``ray.put``; the corpus streams through
    ``map_batches`` with no shuffle. For snippet sets beyond regex-DFA
    size, swap the kernel for an Aho-Corasick automaton at the marked
    point — the plumbing is unchanged.
    """
    import re

    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def eval_snips(b: pa.Table) -> pa.Table:
        import numpy as np

        ids = np.asarray(b["doc_id"].combine_chunks(), dtype=np.int64)
        lens = np.asarray(pc.utf8_length(b["text"].combine_chunks()),
                          dtype=np.int64)
        m = pa.array((ids % 97 == 0) & (lens >= 40))
        return pa.table(
            {"snip": pc.utf8_slice_codeunits(b.filter(m)["text"], 0, 40)})

    snip_tbls = list(
        ds.map_batches(eval_snips, batch_format="pyarrow", batch_size=None)
        .iter_batches(batch_format="pyarrow", batch_size=None))
    snips = sorted({s for t in snip_tbls for s in t["snip"].to_pylist()})
    # ONE combined alternation — swap point for Aho-Corasick at larger sets
    pattern = "|".join(re.escape(s) for s in snips) if snips else None
    pat_ref = ray.put(pattern) if ray.is_initialized() else pattern

    def flag(b: pa.Table) -> pa.Table:
        pat = ray.get(pat_ref) if ray.is_initialized() else pat_ref
        if pat is None:
            hit = pa.array([False] * b.num_rows, pa.bool_())
        else:
            hit = pc.match_substring_regex(b["text"], pat)
        return pa.table({"doc_id": b["doc_id"], "contaminated": hit})

    return ds.map_batches(flag, batch_format="pyarrow", batch_size=None)


@query(
    "text_repetition",
    """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
words AS (SELECT doc_id, unnest(ws) AS wd FROM w),
counts AS (SELECT doc_id, wd, COUNT(*) AS c FROM words GROUP BY doc_id, wd),
s AS (SELECT doc_id, SUM(c) AS n_words, COUNT(*) AS n_distinct,
             MAX(c) AS top_word_n
      FROM counts GROUP BY doc_id),
bg AS (SELECT doc_id,
              unnest([ws[i] || ' ' || ws[i+1] FOR i IN range(1, len(ws))]) AS b
       FROM w),
bgc AS (SELECT doc_id, b, COUNT(*) AS c FROM bg GROUP BY doc_id, b),
bs AS (SELECT doc_id, MAX(c) AS top_bigram_n FROM bgc GROUP BY doc_id)
SELECT s.doc_id, CAST(n_words AS BIGINT) AS n_words,
       CAST(n_distinct AS BIGINT) AS n_distinct,
       CAST(top_word_n AS BIGINT) AS top_word_n,
       CAST(COALESCE(bs.top_bigram_n, 0) AS BIGINT) AS top_bigram_n,
       CAST(n_words - n_distinct AS DOUBLE) / n_words AS dup_word_frac
FROM s LEFT JOIN bs USING (doc_id)""",
)
def text_repetition(sf_dir: str):
    """Gopher-style repetition quality signals, fully vectorized:
    per-doc word count, distinct-word count, modal-word count,
    modal-BIGRAM count and duplicate-word fraction.

    Per-doc statistics need only doc-local data, so every batch is
    independent (zero shuffle). The kernel dictionary-encodes the
    flattened word array once, then does all counting in numpy integer
    space: (doc, word) pair codes → ``np.unique`` with counts →
    ``bincount``/``maximum.at`` per doc; bigrams pair adjacent word
    codes with document boundaries masked. No Python-per-row anywhere.
    """
    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd

    def rep(b: pa.Table) -> pa.Table:
        n_docs = b.num_rows
        if n_docs == 0:
            return pa.table({
                "doc_id": b["doc_id"],
                "n_words": pa.array([], pa.int64()),
                "n_distinct": pa.array([], pa.int64()),
                "top_word_n": pa.array([], pa.int64()),
                "top_bigram_n": pa.array([], pa.int64()),
                "dup_word_frac": pa.array([], pa.float64()),
            })
        split = pc.split_pattern(b["text"].combine_chunks(), " ")
        lens = np.asarray(pc.list_value_length(split), dtype=np.int64)
        flat = split.flatten().dictionary_encode()
        codes = np.asarray(flat.indices, dtype=np.int64)
        vocab = len(flat.dictionary)
        doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), lens)

        up, cnt = np.unique(doc_idx * vocab + codes, return_counts=True)
        pair_doc = up // vocab
        n_words = np.bincount(doc_idx, minlength=n_docs)
        n_distinct = np.bincount(pair_doc, minlength=n_docs)
        top_word = np.zeros(n_docs, dtype=np.int64)
        np.maximum.at(top_word, pair_doc, cnt)

        same = doc_idx[:-1] == doc_idx[1:]  # mask document boundaries
        bg_doc = doc_idx[:-1][same]
        bg_code = (codes[:-1] * vocab + codes[1:])[same]
        ub, inv = np.unique(bg_code, return_inverse=True)
        nb = max(len(ub), 1)
        up2, cnt2 = np.unique(bg_doc * nb + inv, return_counts=True)
        top_bigram = np.zeros(n_docs, dtype=np.int64)
        np.maximum.at(top_bigram, up2 // nb, cnt2)

        dup_frac = (n_words - n_distinct).astype(np.float64) / n_words
        return pa.table({
            "doc_id": b["doc_id"],
            "n_words": pa.array(n_words),
            "n_distinct": pa.array(n_distinct),
            "top_word_n": pa.array(top_word),
            "top_bigram_n": pa.array(top_bigram),
            "dup_word_frac": pa.array(dup_frac),
        })

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return ds.map_batches(rep, batch_format="pyarrow", batch_size=None)


@query(
    "text_lm_score",
    """
WITH words AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
               FROM documents),
vc AS (SELECT w, COUNT(*) AS c FROM words GROUP BY w),
tot AS (SELECT SUM(c) AS n FROM vc)
SELECT doc_id, COUNT(*) AS n_words,
       CAST(ROUND(-1e6 * AVG(ln(vc.c / tot.n))) AS BIGINT) AS nll_micro
FROM words JOIN vc USING (w) CROSS JOIN tot
GROUP BY doc_id""",
)
def text_lm_score(sf_dir: str):
    """Corpus-LM quality scoring (CCNet-style perplexity filtering):
    per-doc mean negative log-likelihood under a unigram LM trained on
    the corpus itself.

    Two passes, both shuffle-light: (1) global word counts via the
    hash-partitioned distributed aggregate (vocab-cardinality exchange,
    not corpus-size); the fitted table — vocab + log-probs, the "model"
    — is broadcast once via ``ray.put``. (2) every batch scores its own
    docs: dictionary-encode, one ``np.searchsorted`` vocab lookup, one
    ``bincount`` segment-sum per doc. At real scale the vocab table is
    capped top-K + UNK mass (standard LM practice); here the synthetic
    vocab is tiny so the exact table ships whole.
    """
    import numpy as np
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate_ds

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def words(b: pa.Table) -> pa.Table:
        split = pc.split_pattern(b["text"].combine_chunks(), " ")
        flat = split.flatten().dictionary_encode()
        codes = np.asarray(flat.indices, dtype=np.int64)
        uc, cnt = np.unique(codes, return_counts=True)
        return pa.table({
            "w": flat.dictionary.take(pa.array(uc)),
            "c": pa.array(cnt, pa.int64()),
        })

    vc = grouped_aggregate_ds(
        ds.map_batches(words, batch_format="pyarrow", batch_size=None),
        ["w"], [("c", "sum", "c")],
    ).to_pandas()
    vocab = np.array(vc["w"], dtype=object)
    order = np.argsort(vocab)
    vocab = vocab[order]
    counts = vc["c"].to_numpy()[order].astype(np.float64)
    logp = np.log(counts / counts.sum())
    model = (vocab.astype("U"), logp)
    model_ref = ray.put(model) if ray.is_initialized() else model

    def score(b: pa.Table) -> pa.Table:
        vocab_, logp_ = (ray.get(model_ref)
                         if ray.is_initialized() else model_ref)
        n_docs = b.num_rows
        split = pc.split_pattern(b["text"].combine_chunks(), " ")
        lens = np.asarray(pc.list_value_length(split), dtype=np.int64)
        flat = split.flatten().dictionary_encode()
        codes = np.asarray(flat.indices, dtype=np.int64)
        dict_words = np.asarray(flat.dictionary, dtype="U")
        dict_logp = logp_[np.searchsorted(vocab_, dict_words)]
        doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
        ll = np.bincount(doc_idx, weights=dict_logp[codes],
                         minlength=n_docs)
        nll = -ll / np.maximum(lens, 1)
        return pa.table({
            "doc_id": b["doc_id"],
            "n_words": pa.array(lens),
            "nll_micro": pa.array(np.round(1e6 * nll).astype(np.int64)),
        })

    return ds.map_batches(score, batch_format="pyarrow", batch_size=None)


# --------------------------------------------------------------------------


@query(
    "docs_ccnet_buckets",
    """
WITH words AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
               FROM documents),
vc AS (SELECT w, COUNT(*) AS c FROM words GROUP BY w),
tot AS (SELECT SUM(c) AS n FROM vc),
scored AS (
  SELECT doc_id, COUNT(*) AS n_words,
         CAST(ROUND(-1e6 * AVG(ln(vc.c / tot.n))) AS BIGINT) AS nll_micro
  FROM words JOIN vc USING (w) CROSS JOIN tot
  GROUP BY doc_id),
sl AS (SELECT s.doc_id, d.lang, s.n_words, s.nll_micro,
              CAST(s.nll_micro // 1000 AS BIGINT) AS nll_milli
       FROM scored s JOIN documents d USING (doc_id)),
th AS (SELECT lang, quantile_disc(nll_milli, 1.0/3) AS t1,
              quantile_disc(nll_milli, 2.0/3) AS t2
       FROM sl GROUP BY lang)
SELECT sl.lang,
       CASE WHEN nll_milli <= t1 THEN 'head'
            WHEN nll_milli <= t2 THEN 'middle'
            ELSE 'tail' END AS bucket,
       COUNT(*) AS n_docs,
       CAST(SUM(n_words) AS BIGINT) AS n_words,
       CAST(SUM(nll_micro) AS BIGINT) AS nll_micro_sum
FROM sl JOIN th USING (lang)
GROUP BY 1, 2""",
)
def docs_ccnet_buckets(sf_dir: str):
    """CCNet-style quality bucketing (Wenzek et al. 2020): score every
    doc with the corpus unigram LM, split each LANGUAGE into
    head/middle/tail by perplexity terciles, and report the
    (lang, bucket) composition table a curation run uses to pick its
    training cut (train on head+middle, drop tail).

    Plan: the `text_lm_score` two-pass scoring (vocab-bounded fit →
    broadcast model → map-side scoring), then per-lang tercile
    thresholds from the exact distributed-quantile kernel over the
    MILLI-quantized NLL (quantize-first is that kernel's documented
    contract for continuous domains — the histogram is bounded by
    distinct milli values, not doc count), thresholds broadcast
    (langs-bounded), bucket assignment map-side, and a
    (langs x 3)-bounded aggregate. No corpus-sized exchange anywhere.
    """
    import numpy as np
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate, grouped_aggregate_ds
    from raylog.functions.quantile import grouped_quantiles

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "lang"])

    def words(b: pa.Table) -> pa.Table:
        split = pc.split_pattern(b["text"].combine_chunks(), " ")
        flat = split.flatten().dictionary_encode()
        codes = np.asarray(flat.indices, dtype=np.int64)
        uc, cnt = np.unique(codes, return_counts=True)
        return pa.table({
            "w": flat.dictionary.take(pa.array(uc)),
            "c": pa.array(cnt, pa.int64()),
        })

    vc = grouped_aggregate_ds(
        ds.map_batches(words, batch_format="pyarrow", batch_size=None),
        ["w"], [("c", "sum", "c")],
    ).to_pandas()
    vocab = np.array(vc["w"], dtype=object)
    order = np.argsort(vocab)
    vocab = vocab[order]
    counts = vc["c"].to_numpy()[order].astype(np.float64)
    logp = np.log(counts / counts.sum())
    model = (vocab.astype("U"), logp)
    model_ref = ray.put(model) if ray.is_initialized() else model

    def score(b: pa.Table) -> pa.Table:
        vocab_, logp_ = (ray.get(model_ref)
                         if ray.is_initialized() else model_ref)
        n_docs = b.num_rows
        split = pc.split_pattern(b["text"].combine_chunks(), " ")
        lens = np.asarray(pc.list_value_length(split), dtype=np.int64)
        flat = split.flatten().dictionary_encode()
        codes = np.asarray(flat.indices, dtype=np.int64)
        dict_words = np.asarray(flat.dictionary, dtype="U")
        dict_logp = logp_[np.searchsorted(vocab_, dict_words)]
        doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
        ll = np.bincount(doc_idx, weights=dict_logp[codes],
                         minlength=n_docs)
        nll_micro = np.round(
            1e6 * (-ll / np.maximum(lens, 1))).astype(np.int64)
        return pa.table({
            "lang": b["lang"],
            "n_words": pa.array(lens),
            "nll_micro": pa.array(nll_micro),
            "nll_milli": pa.array(nll_micro // 1000),
        })

    scored = ds.map_batches(score, batch_format="pyarrow",
                            batch_size=None)

    th = grouped_quantiles(
        scored.select_columns(["lang", "nll_milli"]),
        key="lang", value="nll_milli", ps=[1.0 / 3, 2.0 / 3],
        out_names=["t1", "t2"],
    ).to_pandas()
    lang_keys = np.sort(np.asarray(th["lang"], dtype="U"))
    ordk = np.argsort(np.asarray(th["lang"], dtype="U"))
    thresholds = (lang_keys,
                  th["t1"].to_numpy()[ordk].astype(np.int64),
                  th["t2"].to_numpy()[ordk].astype(np.int64))
    th_ref = (ray.put(thresholds) if ray.is_initialized()
              else thresholds)

    def assign(b: pa.Table) -> pa.Table:
        th_ = (th_ref if isinstance(th_ref, tuple) else ray.get(th_ref))
        keys_, t1_, t2_ = th_
        # dictionary-encode the lang column so the threshold lookup is
        # one searchsorted over DISTINCT langs, then a gather
        lang_dict = b["lang"].combine_chunks().dictionary_encode()
        dpos = np.searchsorted(
            keys_, np.asarray(lang_dict.dictionary, dtype="U"))
        codes = np.asarray(lang_dict.indices, dtype=np.int64)
        milli = np.asarray(b["nll_milli"].combine_chunks(),
                           dtype=np.int64)
        t1 = t1_[dpos][codes]
        t2 = t2_[dpos][codes]
        bucket = np.where(milli <= t1, "head",
                          np.where(milli <= t2, "middle", "tail"))
        return pa.table({
            "lang": b["lang"],
            "bucket": pa.array(bucket.astype(object), pa.string()),
            "n_words": b["n_words"],
            "nll_micro": b["nll_micro"],
        })

    assigned = scored.map_batches(assign, batch_format="pyarrow",
                                  batch_size=None)
    agg = grouped_aggregate(
        assigned, ["lang", "bucket"],
        [("*", "count", "n_docs"),
         ("n_words", "sum", "n_words"),
         ("nll_micro", "sum", "nll_micro_sum")],
    )
    return agg


@query(
    "tokens_heaps_curve",
    """
WITH mx AS (SELECT MAX(doc_id) AS m FROM documents),
words AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
          FROM documents),
fo AS (SELECT w, MIN(doc_id) AS fd FROM words GROUP BY 1),
vb AS (SELECT CAST(fd * 10 // (m + 1) AS BIGINT) AS bucket,
              COUNT(*) AS new_words
       FROM fo CROSS JOIN mx GROUP BY 1),
tb AS (SELECT CAST(doc_id * 10 // (m + 1) AS BIGINT) AS bucket,
              COUNT(*) AS n_tokens
       FROM words CROSS JOIN mx GROUP BY 1)
SELECT tb.bucket, tb.n_tokens,
       CAST(COALESCE(vb.new_words, 0) AS BIGINT) AS new_words,
       CAST(SUM(tb.n_tokens) OVER (ORDER BY tb.bucket) AS BIGINT)
         AS cum_tokens,
       CAST(SUM(COALESCE(vb.new_words, 0)) OVER (ORDER BY tb.bucket)
            AS BIGINT) AS cum_vocab
FROM tb LEFT JOIN vb USING (bucket)""",
)
def tokens_heaps_curve(sf_dir: str):
    """Heaps'-law vocabulary growth curve: cumulative DISTINCT vocab
    vs cumulative token mass across ten equal doc-id (crawl-order)
    slices of the corpus. The flattening of cum_vocab against
    cum_tokens is the classic "is more data still buying new language"
    audit (word-level sibling of `docs_ngram_novelty`; the static
    rank-frequency view is `tokens_zipf_slope`).

    Plan: a word's bucket is decided by its FIRST-occurrence doc_id —
    one map-side (word, min doc) compression per batch, the min folded
    in the hash-partitioned vocab-bounded aggregate; token mass per
    bucket is a 10-cell count partial. Both finishes land on ≤10-row
    tables; the corpus streams once, nothing doc-sized shuffles.
    """
    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate, grouped_aggregate_ds

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    mx = int(grouped_aggregate(
        ds.map_batches(
            lambda b: pa.table(
                {"k": pa.array([0], pa.int64()),
                 "m": pa.array(
                     [pc.max(b["doc_id"]).as_py() or 0], pa.int64())}),
            batch_format="pyarrow", batch_size=None),
        ["k"], [("m", "max", "m")])["m"][0].as_py())

    def partials(b: pa.Table) -> pa.Table:
        ids = np.asarray(b["doc_id"].combine_chunks(), dtype=np.int64)
        split = pc.split_pattern(b["text"].combine_chunks(), " ")
        lens = np.asarray(pc.list_value_length(split), dtype=np.int64)
        flat = split.flatten().dictionary_encode()
        codes = np.asarray(flat.indices, dtype=np.int64)
        doc_idx = np.repeat(np.arange(b.num_rows, dtype=np.int64), lens)
        # per-word min doc inside the batch: reverse doc order + first-hit
        order = np.lexsort((doc_idx, codes))
        c_s, d_s = codes[order], doc_idx[order]
        first = np.empty(len(c_s), dtype=bool)
        if len(c_s):
            first[0] = True
            first[1:] = c_s[1:] != c_s[:-1]
        return pa.table({
            "w": flat.dictionary.take(pa.array(c_s[first])),
            "fd": pa.array(ids[d_s[first]]),
        })

    fo = grouped_aggregate_ds(
        ds.map_batches(partials, batch_format="pyarrow",
                       batch_size=None),
        ["w"], [("fd", "min", "fd")],
    )

    def vb_part(b: pa.Table) -> pa.Table:
        fd = np.asarray(b["fd"].combine_chunks(), dtype=np.int64)
        return pa.table({
            "bucket": pa.array(fd * 10 // (mx + 1)),
            "one": pa.array(np.ones(len(fd), dtype=np.int64)),
        })

    vb = grouped_aggregate(
        fo.map_batches(vb_part, batch_format="pyarrow", batch_size=None),
        ["bucket"], [("one", "sum", "new_words")]).to_pandas()

    def tb_part(b: pa.Table) -> pa.Table:
        ids = np.asarray(b["doc_id"].combine_chunks(), dtype=np.int64)
        split = pc.split_pattern(b["text"].combine_chunks(), " ")
        lens = np.asarray(pc.list_value_length(split), dtype=np.int64)
        return pa.table({
            "bucket": pa.array(ids * 10 // (mx + 1)),
            "n": pa.array(lens),
        })

    tb = grouped_aggregate(
        ds.map_batches(tb_part, batch_format="pyarrow", batch_size=None),
        ["bucket"], [("n", "sum", "n_tokens")]).to_pandas()

    out = tb.merge(vb, on="bucket", how="left").fillna({"new_words": 0})
    out = out.sort_values("bucket").reset_index(drop=True)
    return pa.table({
        "bucket": pa.array(out["bucket"].astype(np.int64)),
        "n_tokens": pa.array(out["n_tokens"].astype(np.int64)),
        "new_words": pa.array(out["new_words"].astype(np.int64)),
        "cum_tokens": pa.array(
            out["n_tokens"].astype(np.int64).cumsum().to_numpy()),
        "cum_vocab": pa.array(
            out["new_words"].astype(np.int64).cumsum().to_numpy()),
    })


@query(
    "tokens_lm2_score",
    _P() + """
, pairs AS (
  SELECT doc_id, CAST(tokens[CAST(i AS INT)] AS BIGINT) AS a,
         CAST(tokens[CAST(i AS INT) + 1] AS BIGINT) AS b
  FROM recs2, LATERAL (
    SELECT unnest(generate_series(1, CAST(n_tok AS INT) - 1)) AS i) g),
bc AS (SELECT a, b, COUNT(*) AS c FROM pairs GROUP BY 1, 2),
ac AS (SELECT a, COUNT(*) AS c FROM pairs GROUP BY 1),
v AS (SELECT COUNT(DISTINCT t) AS nv FROM (
        SELECT unnest(tokens) AS t FROM recs2))
SELECT p.doc_id, COUNT(*) AS n_bigrams,
       CAST(ROUND(-1e6 * AVG(ln((bc.c + 1.0) / (ac.c + v.nv))))
            AS BIGINT) AS nll2_micro
FROM pairs p JOIN bc USING (a, b) JOIN ac USING (a) CROSS JOIN v
GROUP BY 1""",
)
def tokens_lm2_score(sf_dir: str):
    """Bigram-LM quality scoring over the PRE-TOKENIZED sequences
    table: per-sequence mean negative log-likelihood under an add-one
    (Laplace) smoothed bigram model fit on the corpus itself — the
    context-aware step up from `text_lm_score`'s unigram scorer, and
    the shape of CCNet's KenLM perplexity filter expressed on the
    input_hint table.

    Two passes: (1) the bigram model = ONE vocab²-bounded
    hash-partitioned count aggregate over the masked packed-pair
    kernel (`_masked_bigram_keys` — boundary rule shared with every
    bigram op here); context totals and the smoothing vocab fall out
    of the model table and the unigram-frequency table driver-side.
    (2) scoring is map-only: pack each batch's pairs, ONE searchsorted
    into the broadcast sorted model, segment-mean per sequence.
    Sequences with < 2 tokens carry no bigram and are excluded (both
    sides). At real tokenizer vocab the dense bigram table is capped
    top-K + backoff (documented LM practice); the synthetic alphabet
    ships exact.
    """
    import numpy as np
    import ray
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate_ds
    from raylog.functions.tokens import (
        _flat_values,
        _masked_bigram_keys,
        bigram_count_partial,
        token_frequencies,
    )
    from raylog.pipelines import log_pipeline as LP

    ds = LP.records_ds(sf_dir).select_columns(["doc_id", "tokens"])

    bc = grouped_aggregate_ds(
        ds.map_batches(bigram_count_partial, batch_format="pyarrow",
                       batch_size=None),
        ["t1", "t2"], [("cnt", "sum", "c")],
    ).to_pandas()
    nv = len(token_frequencies(ds.select_columns(["tokens"])))

    if "t1" not in bc.columns:  # no bigrams: every doc scores empty
        z = pa.array([], pa.int64())
        return pa.table({"doc_id": z, "n_bigrams": z,
                         "nll2_micro": z})
    t1 = bc["t1"].to_numpy(dtype=np.int64)
    t2 = bc["t2"].to_numpy(dtype=np.int64)
    c = bc["c"].to_numpy(dtype=np.int64)
    key = (t1.astype(np.int32).view(np.uint32).astype(np.uint64)
           << np.uint64(32)) | t2.astype(np.int32).view(np.uint32)
    order = np.argsort(key)
    key_s, c_s, t1_s = key[order], c[order], t1[order]
    # context totals: segment-sum of pair counts per left token
    a_vals, a_inv = np.unique(t1_s, return_inverse=True)
    a_tot = np.bincount(a_inv, weights=c_s).astype(np.int64)
    # per-pair log prob precomputed once: model ships as (key, logp)
    logp = np.log((c_s + 1.0) / (a_tot[a_inv] + nv))
    model = (key_s, logp)
    model_ref = ray.put(model) if ray.is_initialized() else model

    def score(b: pa.Table) -> pa.Table:
        key_, logp_ = (model_ref if isinstance(model_ref, tuple)
                       else ray.get(model_ref))
        vals, lengths = _flat_values(b, "tokens")
        ids = np.asarray(b["doc_id"].combine_chunks(), dtype=np.int64)
        n_pairs = np.maximum(lengths.astype(np.int64) - 1, 0)
        keep = n_pairs > 0
        if len(vals) < 2 or not keep.any():
            return pa.table({
                "doc_id": pa.array([], pa.int64()),
                "n_bigrams": pa.array([], pa.int64()),
                "nll2_micro": pa.array([], pa.int64()),
            })
        pk = _masked_bigram_keys(vals, lengths)
        ll = logp_[np.searchsorted(key_, pk)]
        doc_idx = np.repeat(np.arange(len(ids), dtype=np.int64),
                            n_pairs)
        sums = np.bincount(doc_idx, weights=ll, minlength=len(ids))
        nll = -sums[keep] / n_pairs[keep]
        return pa.table({
            "doc_id": pa.array(ids[keep]),
            "n_bigrams": pa.array(n_pairs[keep]),
            "nll2_micro": pa.array(
                np.round(1e6 * nll).astype(np.int64)),
        })

    return ds.map_batches(score, batch_format="pyarrow",
                          batch_size=None)


@query(
    "tokens_position_entropy",
    _P() + """
, toks AS (
  SELECT LEAST(CAST(i AS BIGINT) - 1, 8) AS pos_bucket,
         CAST(tokens[CAST(i AS INT)] AS BIGINT) AS t
  FROM recs2, LATERAL (
    SELECT unnest(generate_series(1, CAST(n_tok AS INT))) AS i) g),
c AS (SELECT pos_bucket, t, COUNT(*) AS c FROM toks GROUP BY 1, 2),
s AS (SELECT pos_bucket, SUM(c) AS n, SUM(c * log2(c)) AS sc
      FROM c GROUP BY 1)
SELECT pos_bucket, CAST(n AS BIGINT) AS n_tokens,
       CAST(FLOOR(1000 * (log2(n) - sc / n)) AS BIGINT)
         AS entropy_milli
FROM s""",
)
def tokens_position_entropy(sf_dir: str):
    """Positional token entropy audit: Shannon entropy (millibits) of
    the token distribution at each of the first 8 sequence positions
    plus an 8+ tail bucket. Formatted corpora leak template structure
    at fixed offsets (BOS artifacts, boilerplate headers, serialization
    quirks) as an entropy DIP at those positions — the audit a
    pretraining run does before trusting its sequence starts.

    One (pos_bucket, token) hash-partitioned count — 9 × vocab-bounded
    exchange, corpus streams once; the entropy finish is integer-count
    arithmetic on the tiny grid (same SUM(c·log2 c) restatement as
    `tokens_cond_entropy`, FLOOR-quantized so both engines bit-agree).
    """
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate_ds
    from raylog.functions.tokens import _flat_values
    from raylog.pipelines import log_pipeline as LP

    ds = LP.records_ds(sf_dir).select_columns(["tokens"])

    def partials(b: pa.Table) -> pa.Table:
        vals, lengths = _flat_values(b, "tokens")
        if len(vals) == 0:
            return pa.table({"pos_bucket": pa.array([], pa.int64()),
                             "t": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        lens = lengths.astype(np.int64)
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        pos = (np.arange(len(vals), dtype=np.int64)
               - np.repeat(starts, lens))
        bucket = np.minimum(pos, 8)
        # pack (bucket, token) into one key for a single np.unique pass
        keyed = bucket * (np.int64(vals.max()) + 1) + vals.astype(np.int64)
        uk, cnt = np.unique(keyed, return_counts=True)
        base = np.int64(vals.max()) + 1
        return pa.table({
            "pos_bucket": pa.array(uk // base),
            "t": pa.array(uk % base),
            "c": pa.array(cnt.astype(np.int64)),
        })

    grid = grouped_aggregate_ds(
        ds.map_batches(partials, batch_format="pyarrow",
                       batch_size=None),
        ["pos_bucket", "t"], [("c", "sum", "c")],
    ).to_pandas()
    pb = grid["pos_bucket"].to_numpy(dtype=np.int64)
    c = grid["c"].to_numpy(dtype=np.int64)
    order = np.argsort(pb, kind="mergesort")
    pb_s, c_s = pb[order], c[order]
    starts = np.flatnonzero(np.concatenate(
        [[True], pb_s[1:] != pb_s[:-1]]))
    n = np.add.reduceat(c_s, starts).astype(np.float64)
    sc = np.add.reduceat(c_s * np.log2(c_s), starts)
    return pa.table({
        "pos_bucket": pa.array(pb_s[starts]),
        "n_tokens": pa.array(n.astype(np.int64)),
        "entropy_milli": pa.array(
            np.floor(1000 * (np.log2(n) - sc / n)).astype(np.int64)),
    })


@query(
    "corpus_dataset_card",
    """
WITH w AS (SELECT doc_id, len(string_split(text, ' ')) AS nw
           FROM documents)
SELECT 'n_docs' AS metric,
       CAST((SELECT COUNT(*) FROM documents) AS BIGINT) AS value
UNION ALL SELECT 'n_words',
       CAST((SELECT SUM(nw) FROM w) AS BIGINT)
UNION ALL SELECT 'n_chars',
       CAST((SELECT SUM(n_chars) FROM documents) AS BIGINT)
UNION ALL SELECT 'n_langs',
       CAST((SELECT COUNT(DISTINCT lang) FROM documents) AS BIGINT)
UNION ALL SELECT 'n_sources',
       CAST((SELECT COUNT(DISTINCT source) FROM documents) AS BIGINT)
UNION ALL SELECT 'exact_dup_docs',
       CAST((SELECT COUNT(*) - COUNT(DISTINCT text) FROM documents)
            AS BIGINT)
UNION ALL SELECT 'en_docs',
       CAST((SELECT COUNT(*) FROM documents WHERE lang = 'en')
            AS BIGINT)
UNION ALL SELECT 'p50_words',
       CAST((SELECT quantile_disc(nw, 0.5) FROM w) AS BIGINT)
UNION ALL SELECT 'p90_words',
       CAST((SELECT quantile_disc(nw, 0.9) FROM w) AS BIGINT)
UNION ALL SELECT 'max_words',
       CAST((SELECT MAX(nw) FROM w) AS BIGINT)""",
)
def corpus_dataset_card(sf_dir: str):
    """The DATASET CARD headline table every curation run publishes:
    corpus size (docs / words / chars), language and source breadth,
    exact-duplicate mass, English share, and the word-length profile —
    one (metric, value) report assembled entirely from bounded
    aggregates (composition showcase: the distinct-text count rides
    the 128-bit content-key dedup exchange, the length quantiles ride
    the exact distributed-quantile kernel, everything else is
    constant-size partials; the corpus streams twice, once per
    text-derived pass, and no doc-sized table ever reaches the driver).
    """
    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate, grouped_aggregate_ds
    from raylog.functions.dedup import add_content_h128
    from raylog.functions.quantile import grouped_quantiles

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang", "source", "n_chars"])

    def flat_part(b: pa.Table) -> pa.Table:
        split = pc.split_pattern(b["text"].combine_chunks(), " ")
        nw = np.asarray(pc.list_value_length(split), dtype=np.int64)
        lang = np.asarray(b["lang"].combine_chunks(), dtype="U")
        nch = np.asarray(b["n_chars"].combine_chunks(), dtype=np.int64)
        return pa.table({
            "k": pa.array([0], pa.int64()),
            "n_docs": pa.array([b.num_rows], pa.int64()),
            "n_words": pa.array([int(nw.sum())], pa.int64()),
            "n_chars": pa.array([int(nch.sum())], pa.int64()),
            "en_docs": pa.array([int((lang == "en").sum())], pa.int64()),
        })

    tot = grouped_aggregate(
        ds.map_batches(flat_part, batch_format="pyarrow",
                       batch_size=None),
        ["k"], [("n_docs", "sum", "n_docs"),
                ("n_words", "sum", "n_words"),
                ("n_chars", "sum", "n_chars"),
                ("en_docs", "sum", "en_docs")]).to_pandas().iloc[0]

    n_langs = len(grouped_aggregate(
        ds.select_columns(["lang"]).map_batches(
            lambda b: pa.table({
                "lang": pc.unique(b["lang"].combine_chunks()),
            }), batch_format="pyarrow", batch_size=None),
        ["lang"], [("*", "count", "c")]))
    n_sources = len(grouped_aggregate(
        ds.select_columns(["source"]).map_batches(
            lambda b: pa.table({
                "source": pc.unique(b["source"].combine_chunks()),
            }), batch_format="pyarrow", batch_size=None),
        ["source"], [("*", "count", "c")]))

    # distinct texts via the 128-bit content-key dedup exchange
    distinct_texts = grouped_aggregate_ds(
        ds.map_batches(
            lambda b: add_content_h128(b).select(
                ["content_h1", "content_h2", "doc_id"]),
            batch_format="pyarrow", batch_size=None),
        ["content_h1", "content_h2"],
        [("doc_id", "min", "doc_id")]).count()

    def nw_part(b: pa.Table) -> pa.Table:
        split = pc.split_pattern(b["text"].combine_chunks(), " ")
        return pa.table({
            "k": pa.array(np.zeros(b.num_rows, dtype=np.int64)),
            "nw": pa.array(np.asarray(pc.list_value_length(split),
                                      dtype=np.int64)),
        })

    q = grouped_quantiles(
        ds.map_batches(nw_part, batch_format="pyarrow",
                       batch_size=None),
        key="k", value="nw", ps=[0.5, 0.9, 1.0],
        out_names=["p50", "p90", "mx"]).to_pandas().iloc[0]

    metrics = [
        ("n_docs", int(tot["n_docs"])),
        ("n_words", int(tot["n_words"])),
        ("n_chars", int(tot["n_chars"])),
        ("n_langs", int(n_langs)),
        ("n_sources", int(n_sources)),
        ("exact_dup_docs", int(tot["n_docs"]) - int(distinct_texts)),
        ("en_docs", int(tot["en_docs"])),
        ("p50_words", int(q["p50"])),
        ("p90_words", int(q["p90"])),
        ("max_words", int(q["mx"])),
    ]
    return pa.table({
        "metric": pa.array([m for m, _ in metrics], pa.string()),
        "value": pa.array([v for _, v in metrics], pa.int64()),
    })


# --------------------------------------------------------------------------
# Kneser-Ney continuation counts (the KN lower-order distribution)
# --------------------------------------------------------------------------

@query(
    "tokens_kn_continuation",
    _P() + """
, bg AS (
  SELECT DISTINCT CAST(tokens[CAST(i AS INT)] AS BIGINT) AS t1,
         CAST(tokens[CAST(i AS INT) + 1] AS BIGINT) AS t2
  FROM recs2, LATERAL (
    SELECT unnest(generate_series(1, CAST(n_tok AS INT) - 1)) AS i
  ) g
), cc AS (
  SELECT t2 AS token, CAST(COUNT(*) AS BIGINT) AS n_cont FROM bg GROUP BY 1
), t AS (SELECT CAST(COUNT(*) AS BIGINT) AS tot FROM bg)
SELECT token, n_cont, (1000000 * n_cont) // t.tot AS cont_prob_e6, rank
FROM (SELECT token, n_cont,
             ROW_NUMBER() OVER (ORDER BY n_cont DESC, token) AS rank
      FROM cc), t
WHERE rank <= 20""",
)
def tokens_kn_continuation(sf_dir: str):
    """Kneser-Ney continuation counts: for each token w, the number of
    DISTINCT predecessors N1+(·,w), and the KN lower-order probability
    P_cont(w) = N1+(·,w) / |distinct bigrams| — the quantity that makes
    KN smoothing rank "Francisco" (frequent but only ever after "San")
    below genuinely versatile words. Top-20 by continuation count.

    Two-stage: per-batch DISTINCT packed pairs (bigram_count_partial's
    keys, counts discarded) → hash-partitioned global dedup keyed by
    the pair — the same bigram-cardinality-bounded exchange as
    `tokens_bigrams` — then each surviving pair contributes one to its
    t2, a vocab-bounded finish. Σ_w N1+(·,w) = |distinct bigrams|, so
    the normalizer falls out of the same table with no extra pass."""
    import numpy as np

    from raylog.functions.agg import grouped_aggregate, grouped_aggregate_ds
    from raylog.functions.tokens import bigram_count_partial
    from raylog.pipelines import log_pipeline as LP

    ds = LP.records_ds(sf_dir).select_columns(["tokens"])

    distinct = grouped_aggregate_ds(
        ds.map_batches(lambda b: bigram_count_partial(b),
                       batch_format="pyarrow", batch_size=None),
        ["t1", "t2"], [("cnt", "max", "cnt")], num_partitions=32)

    def ones(b: pa.Table) -> pa.Table:
        return pa.table({
            "token": b["t2"],
            "one": pa.array(np.ones(len(b), dtype=np.int64)),
        })

    cc = grouped_aggregate(
        distinct.map_batches(ones, batch_format="pyarrow",
                             batch_size=None),
        ["token"], [("one", "sum", "n_cont")])
    if "token" not in cc.column_names:  # no bigrams (all 1-token docs)
        z = pa.array([], pa.int64())
        return pa.table({"token": z, "n_cont": z,
                         "cont_prob_e6": z, "rank": z})
    tok = np.asarray(cc["token"], dtype=np.int64)
    nc = np.asarray(cc["n_cont"], dtype=np.int64)
    tot = int(nc.sum())
    order = np.lexsort((tok, -nc))[:20]
    return pa.table({
        "token": pa.array(tok[order]),
        "n_cont": pa.array(nc[order]),
        "cont_prob_e6": pa.array(1_000_000 * nc[order] // tot),
        "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
    })


# --------------------------------------------------------------------------
# Token burstiness (Church-Gale cf/df dispersion)
# --------------------------------------------------------------------------

@query(
    "tokens_burstiness",
    _P() + """
, w AS (
  SELECT doc_id, CAST(unnest(tokens) AS BIGINT) AS token FROM recs2
), cf AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS cf FROM w GROUP BY 1),
df AS (SELECT token, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
       FROM w GROUP BY 1)
SELECT token, cf, df, (1000 * cf) // df AS burstiness_e3, rank
FROM (SELECT cf.token, cf, df,
             ROW_NUMBER() OVER (ORDER BY cf DESC, cf.token) AS rank
      FROM cf JOIN df ON cf.token = df.token)
WHERE rank <= 20""",
)
def tokens_burstiness(sf_dir: str):
    """Church-Gale burstiness for the top-20 tokens: collection
    frequency / document frequency. A token with cf≈df is spread thin
    (function-word-like); cf≫df means it bursts inside few documents
    (topical or template/boilerplate) — the dispersion signal behind
    stopword induction and template detection.

    ONE pass emits both partials per batch: cf from the Arrow
    value_counts kernel on the flat buffer, df from np.unique over
    (row, token) packed keys (per-doc dedup happens inside the batch,
    so the exchange carries per-doc-distinct postings at most — and
    after the per-batch (token) regroup, far less). One vocab-bounded
    combine finishes both."""
    import numpy as np

    from raylog.functions.agg import grouped_aggregate
    from raylog.functions.tokens import _flat_values
    from raylog.pipelines import log_pipeline as LP

    ds = LP.records_ds(sf_dir).select_columns(["tokens"])

    def partial(b: pa.Table) -> pa.Table:
        vals, lengths = _flat_values(b, "tokens")
        if len(vals) == 0:
            return pa.table({
                "token": pa.array([], pa.int64()),
                "cf": pa.array([], pa.int64()),
                "df": pa.array([], pa.int64()),
            })
        tok = vals.astype(np.int64)
        rid = np.repeat(np.arange(len(lengths), dtype=np.int64), lengths)
        # cf: plain counts; df: dedup (row, token) first, then count
        ut, cf = np.unique(tok, return_counts=True)
        packed = rid << np.int64(32) | tok  # tokens are int32-ranged
        dt = np.unique(packed) & np.int64(0xFFFFFFFF)
        ud, df = np.unique(dt, return_counts=True)
        # ut == ud (every token occurs in some row) — keep aligned
        out = np.zeros(len(ut), dtype=np.int64)
        out[np.searchsorted(ut, ud)] = df
        return pa.table({
            "token": pa.array(ut),
            "cf": pa.array(cf.astype(np.int64)),
            "df": pa.array(out),
        })

    agg = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        ["token"], [("cf", "sum", "cf"), ("df", "sum", "df")])
    tok = np.asarray(agg["token"], dtype=np.int64)
    cf = np.asarray(agg["cf"], dtype=np.int64)
    df = np.asarray(agg["df"], dtype=np.int64)
    order = np.lexsort((tok, -cf))[:20]
    return pa.table({
        "token": pa.array(tok[order]),
        "cf": pa.array(cf[order]),
        "df": pa.array(df[order]),
        "burstiness_e3": pa.array(1000 * cf[order] // df[order]),
        "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
    })


# --------------------------------------------------------------------------
# Split-document boundary audit (crawl record-splitting detector)
# --------------------------------------------------------------------------

@query(
    "tokens_split_boundary_audit",
    _P() + """
, s AS (
  SELECT source, n_tok, tokens,
         LEAD(doc_id) OVER w AS next_id,
         LEAD(tokens) OVER w AS next_toks,
         LEAD(n_tok) OVER w AS next_n
  FROM recs2
  WINDOW w AS (PARTITION BY source ORDER BY doc_id)
)
SELECT source,
  CAST(COUNT(*) FILTER (WHERE next_id IS NOT NULL
                          AND n_tok >= 8 AND next_n >= 8) AS BIGINT)
    AS n_pairs,
  CAST(COUNT(*) FILTER (WHERE next_id IS NOT NULL
        AND n_tok >= 8 AND next_n >= 8
        AND list_slice(tokens, CAST(n_tok AS INT) - 7,
                       CAST(n_tok AS INT))
            = list_slice(next_toks, 1, 8)) AS BIGINT) AS n_matches
FROM s GROUP BY 1""",
)
def tokens_split_boundary_audit(sf_dir: str):
    """Split-document detector: among doc_id-consecutive document pairs
    within a source, how many have the FIRST doc's last 8 tokens
    exactly equal to the SECOND doc's first 8 tokens — the signature of
    one document cut across two crawl records (or an overlapping
    chunker). Reported per source; both docs must have ≥8 tokens.

    Each doc compresses map-side to its two 8-token sentinels packed as
    4+4 uint64 words (EXACT values, not hashes — equality can never
    false-positive), so the per-source adjacency pass exchanges ~72
    bytes per doc regardless of document length. Sources are
    hash-partitioned complete, sorted by doc_id inside the partition,
    and compared with one shifted vector equality."""
    import numpy as np

    from raylog.functions.agg import partitioned_group_apply
    from raylog.functions.tokens import _flat_values
    from raylog.pipelines import log_pipeline as LP

    ds = LP.records_ds(sf_dir).select_columns(
        ["source", "doc_id", "tokens"])

    def sentinels(b: pa.Table) -> pa.Table:
        vals, lengths = _flat_values(b, "tokens")
        tok = vals.astype(np.uint64) & np.uint64(0xFFFFFFFF)
        starts = np.concatenate(([0], np.cumsum(lengths)[:-1]))
        elig = lengths >= 8
        cols = {"source": b["source"], "doc_id": b["doc_id"],
                "elig": pa.array(elig.astype(np.int64))}
        s_e = starts[elig]
        e_e = (starts + lengths)[elig] - 8
        for w in range(4):
            pre = np.zeros(len(lengths), dtype=np.uint64)
            suf = np.zeros(len(lengths), dtype=np.uint64)
            if elig.any():
                pre[elig] = (tok[s_e + 2 * w] << np.uint64(32)
                             | tok[s_e + 2 * w + 1])
                suf[elig] = (tok[e_e + 2 * w] << np.uint64(32)
                             | tok[e_e + 2 * w + 1])
            cols[f"pre{w}"] = pa.array(pre.view(np.int64))
            cols[f"suf{w}"] = pa.array(suf.view(np.int64))
        return pa.table(cols)

    sent = ds.map_batches(sentinels, batch_format="pyarrow",
                          batch_size=None)

    def adjacency(t: pa.Table) -> pa.Table:
        src = t["source"].to_pandas().to_numpy()
        did = np.asarray(t["doc_id"].combine_chunks()
                         if isinstance(t["doc_id"], pa.ChunkedArray)
                         else t["doc_id"], dtype=np.int64)
        scode, suniq = pa.array(src).dictionary_encode().indices, None
        scode = np.asarray(scode, dtype=np.int64)
        order = np.lexsort((did, scode))
        sc = scode[order]
        same = sc[:-1] == sc[1:]
        elig = np.asarray(t["elig"].combine_chunks()
                          if isinstance(t["elig"], pa.ChunkedArray)
                          else t["elig"], dtype=np.int64)[order] == 1
        pair_ok = same & elig[:-1] & elig[1:]
        match = pair_ok.copy()
        for w in range(4):
            suf = np.asarray(t[f"suf{w}"].combine_chunks()
                             if isinstance(t[f"suf{w}"], pa.ChunkedArray)
                             else t[f"suf{w}"], dtype=np.int64)[order]
            pre = np.asarray(t[f"pre{w}"].combine_chunks()
                             if isinstance(t[f"pre{w}"], pa.ChunkedArray)
                             else t[f"pre{w}"], dtype=np.int64)[order]
            match &= suf[:-1] == pre[1:]
        # per-source sums over the pair positions (left element's source)
        npairs = np.bincount(sc[:-1][pair_ok],
                             minlength=int(sc.max()) + 1 if len(sc) else 0)
        nmatch = np.bincount(sc[:-1][match],
                             minlength=int(sc.max()) + 1 if len(sc) else 0)
        uniq_src = pa.array(src).dictionary_encode().dictionary
        keep = np.arange(len(uniq_src))
        return pa.table({
            "source": uniq_src.take(pa.array(keep)),
            "n_pairs": pa.array(npairs[keep].astype(np.int64)),
            "n_matches": pa.array(nmatch[keep].astype(np.int64)),
        })

    out = partitioned_group_apply(sent, ["source"], adjacency,
                                  num_partitions=8).to_pandas()
    return pa.table({
        "source": pa.array(out["source"], pa.string()),
        "n_pairs": pa.array(out["n_pairs"].to_numpy(np.int64)),
        "n_matches": pa.array(out["n_matches"].to_numpy(np.int64)),
    })


# --------------------------------------------------------------------------
# Pairwise centroid separation (embedding-space label geometry)
# --------------------------------------------------------------------------

@query(
    "embed_centroid_distances",
    """
WITH c AS (
  SELECT label, i, avg(embedding[CAST(i AS INT)]) AS v
  FROM embeddings, LATERAL (
    SELECT unnest(generate_series(1, len(embedding))) AS i
  ) g
  GROUP BY 1, 2
)
SELECT a.label AS label_a, b.label AS label_b,
       SUM(a.v * b.v) / (sqrt(SUM(a.v * a.v)) * sqrt(SUM(b.v * b.v)))
         AS cosine
FROM c a JOIN c b ON a.i = b.i AND a.label < b.label
GROUP BY 1, 2""",
)
def embed_centroid_distances(sf_dir: str):
    """Pairwise cosine similarity between per-label centroids — the
    label-geometry audit (near-parallel centroids mean the labels are
    not separable in this embedding space; run it before trusting any
    label-stratified sampling or hard-negative mining).

    One corpus pass of per-batch dim-wise label sums (the
    `embed_centroids` partial), merged on the labels×dims grid; the
    labels²/2 cosine matrix is driver-side numpy on the tiny centroid
    table. Exchange: labels×dims partials only."""
    import numpy as np
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["label", "embedding"])

    def partial(b: pa.Table) -> pa.Table:
        col = b["embedding"]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        dim = len(col[0]) if len(col) else 0
        mat = np.asarray(col.flatten(), dtype=np.float64).reshape(-1, dim)
        labels = np.asarray(b["label"].combine_chunks(), dtype=np.int64)
        uk = np.unique(labels)
        rows = []
        for lb in uk:
            sub = mat[labels == lb]
            rows.append((lb, sub.sum(axis=0), len(sub)))
        return pa.table({
            "label": pa.array([r[0] for r in rows], pa.int64()),
            "sums": pa.array([r[1].tolist() for r in rows],
                             pa.list_(pa.float64())),
            "n": pa.array([r[2] for r in rows], pa.int64()),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    acc: dict[int, tuple] = {}
    for t in parts.iter_batches(batch_format="pyarrow", batch_size=None):
        for lb, s, n in zip(t["label"].to_pylist(), t["sums"].to_pylist(),
                            t["n"].to_pylist()):
            s = np.asarray(s)
            acc[lb] = (acc[lb][0] + s, acc[lb][1] + n) if lb in acc else (s, n)
    labels = sorted(acc)
    la, lb_, co = [], [], []
    for i, a in enumerate(labels):
        ca = acc[a][0] / acc[a][1]
        na = np.sqrt((ca * ca).sum())
        for b_ in labels[i + 1:]:
            cb = acc[b_][0] / acc[b_][1]
            nb = np.sqrt((cb * cb).sum())
            la.append(a)
            lb_.append(b_)
            co.append(float((ca * cb).sum() / (na * nb)))
    return pa.table({"label_a": pa.array(la, pa.int64()),
                     "label_b": pa.array(lb_, pa.int64()),
                     "cosine": pa.array(co, pa.float64())})


# --------------------------------------------------------------------------
# Tokenizer fertility by source (chars per token)
# --------------------------------------------------------------------------

@query(
    "tokens_fertility_by_source",
    _P() + """
SELECT source,
       CAST(SUM(tok_sum) AS BIGINT) AS total_chars,
       CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
       (1000 * CAST(SUM(tok_sum) AS BIGINT)) // CAST(SUM(n_tok) AS BIGINT)
         AS chars_per_token_milli
FROM recs2 GROUP BY 1""",
)
def tokens_fertility_by_source(sf_dir: str):
    """Tokenizer fertility per source: characters consumed per emitted
    token (the compression-rate audit that flags sources whose text the
    tokenizer fragments badly — a cost and quality signal at corpus
    scale). Integer-exact: two int64 sums per source, permille division
    on the sources-bounded aggregate; zero payload exchange."""
    import numpy as np

    from raylog.functions.agg import grouped_aggregate
    from raylog.pipelines import log_pipeline as LP

    ds = LP.records_ds(sf_dir).select_columns(["source", "n_tok", "tok_sum"])
    agg = grouped_aggregate(ds, ["source"],
                            [("tok_sum", "sum", "total_chars"),
                             ("n_tok", "sum", "total_tokens")])
    ch = np.asarray(agg["total_chars"], dtype=np.int64)
    tk = np.asarray(agg["total_tokens"], dtype=np.int64)
    return pa.table({
        "source": agg["source"],
        "total_chars": agg["total_chars"],
        "total_tokens": agg["total_tokens"],
        "chars_per_token_milli": pa.array(1000 * ch // tk, pa.int64()),
    })


# --------------------------------------------------------------------------
# Per-document divergence from the corpus distribution (outlier docs)
# --------------------------------------------------------------------------

@query(
    "tokens_doc_js_divergence",
    _P() + """
, tok AS (SELECT doc_id, CAST(tokens[CAST(i AS INT)] AS BIGINT) AS t
          FROM recs2, LATERAL (
            SELECT unnest(generate_series(1, CAST(n_tok AS INT))) AS i) g),
dc AS (SELECT doc_id, t, COUNT(*) AS c FROM tok GROUP BY 1, 2),
dn AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n FROM dc GROUP BY 1),
gc AS (SELECT t, COUNT(*) AS c FROM tok GROUP BY 1),
gn AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM gc),
terms AS (
  SELECT dc.doc_id,
         SUM((dc.c * 1.0 / dn.n)
             * ln(2.0 * (dc.c * 1.0 / dn.n)
                  / (dc.c * 1.0 / dn.n + gc.c * 1.0 / gn.n))
             + (gc.c * 1.0 / gn.n)
               * ln(2.0 * (gc.c * 1.0 / gn.n)
                    / (dc.c * 1.0 / dn.n + gc.c * 1.0 / gn.n))) AS s_in,
         SUM(gc.c * 1.0 / gn.n) AS q_in
  FROM dc JOIN dn USING (doc_id) JOIN gc USING (t) CROSS JOIN gn
  GROUP BY 1
)
SELECT doc_id, 0.5 * s_in + 0.5 * ln(2.0) * (1.0 - q_in) AS js
FROM terms""",
)
def tokens_doc_js_divergence(sf_dir: str):
    """Jensen-Shannon divergence of EVERY document's token distribution
    from the corpus distribution — the per-document outlier score that
    flags machine-generated or off-domain docs before training (the
    doc-granular complement of `corpus_source_kl`, which scores whole
    sources).

    Pass 1 builds the vocab-bounded global distribution (one
    value-counts aggregate, broadcast once); pass 2 computes each
    doc's JS in closed form from a dense (docs_in_batch × vocab)
    bincount — the out-of-doc mass needs only 1 − Σ_{t∈doc} q_t, so no
    per-(doc, vocab) expansion ever leaves the batch. Map-only second
    pass; exchange is the vocab aggregate."""
    import numpy as np
    import ray
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate
    from raylog.pipelines import log_pipeline as LP

    ds = LP.records_ds(sf_dir).select_columns(["doc_id", "tokens"])

    def flat_counts(b: pa.Table) -> pa.Table:
        col = b["tokens"]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        vals, cnts = np.unique(
            np.asarray(col.flatten(), dtype=np.int64), return_counts=True)
        return pa.table({"t": pa.array(vals),
                         "c": pa.array(cnts.astype(np.int64))})

    gc = grouped_aggregate(
        ds.map_batches(flat_counts, batch_format="pyarrow", batch_size=None),
        ["t"], [("c", "sum", "c")]).to_pandas().sort_values("t")
    vocab = gc["t"].to_numpy(dtype=np.int64)
    q = gc["c"].to_numpy(dtype=np.float64)
    q = q / q.sum()
    refs = (ray.put(vocab), ray.put(q)) if ray.is_initialized() \
        else (vocab, q)

    def js_batch(b: pa.Table) -> pa.Table:
        vocab_, q_ = (tuple(ray.get(r) for r in refs)
                      if ray.is_initialized() else refs)
        V = len(vocab_)
        col = b["tokens"]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        flat = np.asarray(col.flatten(), dtype=np.int64)
        offs = np.asarray(col.offsets, dtype=np.int64)
        lens = offs[1:] - offs[:-1]
        nd = len(lens)
        ids = np.asarray(b["doc_id"].combine_chunks(), dtype=np.int64)
        if nd == 0 or V == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "js": pa.array([], pa.float64())})
        vix = np.searchsorted(vocab_, flat)
        dli = np.repeat(np.arange(nd, dtype=np.int64), lens)
        cnt = np.bincount(dli * V + vix, minlength=nd * V) \
            .reshape(nd, V).astype(np.float64)
        safe_lens = np.maximum(lens, 1).astype(np.float64)
        p = cnt / safe_lens[:, None]
        mask = cnt > 0
        qm = np.broadcast_to(q_, (nd, V))
        s = p + qm
        with np.errstate(divide="ignore", invalid="ignore"):
            terms = np.where(mask,
                             p * np.log(2.0 * p / s) + qm * np.log(2.0 * qm / s),
                             0.0)
        s_in = terms.sum(axis=1)
        q_in = np.where(mask, qm, 0.0).sum(axis=1)
        js = 0.5 * s_in + 0.5 * np.log(2.0) * (1.0 - q_in)
        keep = lens > 0
        return pa.table({"doc_id": pa.array(ids[keep]),
                         "js": pa.array(js[keep], pa.float64())})

    return ds.map_batches(js_batch, batch_format="pyarrow", batch_size=None)


# --------------------------------------------------------------------------
# Neighbor-pair cosine histogram (embedding-space smoothness audit)
# --------------------------------------------------------------------------

@query(
    "embed_neighbor_sim_hist",
    """
WITH p AS (
  SELECT a.vec_id AS ai, a.embedding AS ea, b.embedding AS eb
  FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
), d AS (
  SELECT ai,
         SUM(CAST(list_extract(ea, CAST(i AS INT)) AS DOUBLE)
             * CAST(list_extract(eb, CAST(i AS INT)) AS DOUBLE)) AS dot,
         SUM(CAST(list_extract(ea, CAST(i AS INT)) AS DOUBLE)
             * CAST(list_extract(ea, CAST(i AS INT)) AS DOUBLE)) AS na2,
         SUM(CAST(list_extract(eb, CAST(i AS INT)) AS DOUBLE)
             * CAST(list_extract(eb, CAST(i AS INT)) AS DOUBLE)) AS nb2
  FROM p, UNNEST(generate_series(1, len(ea))) AS t(i)
  GROUP BY 1
)
SELECT CAST(LEAST(FLOOR(dot / (sqrt(na2) * sqrt(nb2)) * 10), 9) AS BIGINT)
         AS bin,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM d GROUP BY 1""",
)
def embed_neighbor_sim_hist(sf_dir: str):
    """Cosine-similarity histogram over consecutive-id vector pairs —
    the deterministic O(N) pair sample that audits embedding-space
    smoothness (a healthy space shows a unimodal moderate-similarity
    hump; a near-1.0 spike means collapsed/duplicated embeddings) —
    without the N²/2 all-pairs pass.

    Vectors pack to fixed-width float32 blobs so the pair rides ONE
    native hash join on vec_id+1 (Arrow's hash join drops list-typed
    payloads — the `ShingleLists` convention); cosines and bins are one
    numpy pass per joined batch, and only the 20-bin histogram is
    exchanged after that."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])

    def pack(shift: int):
        def _p(b: pa.Table) -> pa.Table:
            col = b["embedding"]
            col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
                else col
            dim = len(col[0]) if len(col) else 0
            mat = np.asarray(col.flatten(), dtype=np.float32) \
                .reshape(-1, dim)
            ids = np.asarray(b["vec_id"].combine_chunks(), dtype=np.int64)
            blobs = [mat[i].tobytes() for i in range(len(ids))]
            return pa.table({
                "k": pa.array(ids + shift),
                "v": pa.array(blobs, pa.binary()),
            })
        return _p

    left = ds.map_batches(pack(1), batch_format="pyarrow",
                          batch_size=None)   # key = vec_id + 1
    right = ds.map_batches(pack(0), batch_format="pyarrow",
                           batch_size=None).rename_columns(["k2", "v2"])
    j = left.join(right, join_type="inner", num_partitions=8,
                  on=("k",), right_on=("k2",))

    def bins(b: pa.Table) -> pa.Table:
        va = b["v"].combine_chunks() if isinstance(b["v"], pa.ChunkedArray) \
            else b["v"]
        vb = b["v2"].combine_chunks() if isinstance(b["v2"], pa.ChunkedArray) \
            else b["v2"]
        n = len(va)
        if n == 0:
            return pa.table({"bin": pa.array([], pa.int64()),
                             "one": pa.array([], pa.int64())})
        ea = np.frombuffer(b"".join(va.to_pylist()), dtype=np.float32) \
            .reshape(n, -1).astype(np.float64)
        eb = np.frombuffer(b"".join(vb.to_pylist()), dtype=np.float32) \
            .reshape(n, -1).astype(np.float64)
        dot = (ea * eb).sum(axis=1)
        cos = dot / (np.sqrt((ea * ea).sum(axis=1))
                     * np.sqrt((eb * eb).sum(axis=1)))
        bn = np.minimum(np.floor(cos * 10), 9).astype(np.int64)
        return pa.table({"bin": pa.array(bn),
                         "one": pa.array(np.ones(n, np.int64))})

    hist = grouped_aggregate(
        j.map_batches(bins, batch_format="pyarrow", batch_size=None),
        ["bin"], [("one", "sum", "n_pairs")])
    if "bin" not in hist.column_names:
        return pa.table({"bin": pa.array([], pa.int64()),
                         "n_pairs": pa.array([], pa.int64())})
    return pa.table({"bin": hist["bin"], "n_pairs": hist["n_pairs"]})


# --------------------------------------------------------------------------
# Split-halves centroid stability per label (embedding reproducibility)
# --------------------------------------------------------------------------

@query(
    "embed_label_halves_drift",
    """
WITH c AS (
  SELECT label, vec_id % 2 AS half, i,
         avg(embedding[CAST(i AS INT)]) AS v
  FROM embeddings, LATERAL (
    SELECT unnest(generate_series(1, len(embedding))) AS i
  ) g
  GROUP BY 1, 2, 3
)
SELECT a.label,
       SUM(a.v * b.v) / (sqrt(SUM(a.v * a.v)) * sqrt(SUM(b.v * b.v)))
         AS halves_cosine
FROM c a JOIN c b ON a.label = b.label AND a.i = b.i
WHERE a.half = 0 AND b.half = 1
GROUP BY 1""",
)
def embed_label_halves_drift(sf_dir: str):
    """Split-halves centroid stability per label: cosine between the
    centroid of even-id and odd-id vectors of the same label — the
    cheap reproducibility audit (a label whose two random halves
    already disagree will not survive a re-embedding, and its
    stratified samples are noise).

    One corpus pass of (label, half)-keyed dim-wise sums; the per-label
    cosine is driver-side numpy on the 2·labels×dims grid. Labels with
    only one half are skipped (the SQL inner join drops them too)."""
    import numpy as np
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "label", "embedding"])

    def partial(b: pa.Table) -> pa.Table:
        col = b["embedding"]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        dim = len(col[0]) if len(col) else 0
        mat = np.asarray(col.flatten(), dtype=np.float64).reshape(-1, dim)
        labels = np.asarray(b["label"].combine_chunks(), dtype=np.int64)
        half = np.asarray(b["vec_id"].combine_chunks(), dtype=np.int64) % 2
        key = labels * 2 + half
        uk = np.unique(key)
        rows = []
        for kk in uk:
            sub = mat[key == kk]
            rows.append((kk, sub.sum(axis=0), len(sub)))
        return pa.table({
            "k": pa.array([r[0] for r in rows], pa.int64()),
            "sums": pa.array([r[1].tolist() for r in rows],
                             pa.list_(pa.float64())),
            "n": pa.array([r[2] for r in rows], pa.int64()),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None)
    acc: dict[int, tuple] = {}
    for t in parts.iter_batches(batch_format="pyarrow", batch_size=None):
        for kk, s, n in zip(t["k"].to_pylist(), t["sums"].to_pylist(),
                            t["n"].to_pylist()):
            s = np.asarray(s)
            acc[kk] = (acc[kk][0] + s, acc[kk][1] + n) if kk in acc \
                else (s, n)
    labels, cosines = [], []
    for lb in sorted({k // 2 for k in acc}):
        if 2 * lb in acc and 2 * lb + 1 in acc:
            c0 = acc[2 * lb][0] / acc[2 * lb][1]
            c1 = acc[2 * lb + 1][0] / acc[2 * lb + 1][1]
            cos = float((c0 * c1).sum()
                        / (np.sqrt((c0 * c0).sum())
                           * np.sqrt((c1 * c1).sum())))
            labels.append(lb)
            cosines.append(cos)
    return pa.table({"label": pa.array(labels, pa.int64()),
                     "halves_cosine": pa.array(cosines, pa.float64())})


# --------------------------------------------------------------------------
# Simpson diversity index per source (vocabulary concentration)
# --------------------------------------------------------------------------

@query(
    "docs_simpson_diversity",
    """
WITH w AS (
  SELECT source, unnest(string_split(text, ' ')) AS word FROM documents
), c AS (
  SELECT source, word, COUNT(*) AS c FROM w GROUP BY 1, 2
), n AS (
  SELECT source, SUM(c) AS n FROM c GROUP BY 1
)
SELECT c.source,
       CAST(SUM(c.c * (c.c - 1)) AS BIGINT) AS num,
       CAST(MAX(n.n) * (MAX(n.n) - 1) AS BIGINT) AS den
FROM c JOIN n ON c.source = n.source
GROUP BY 1""",
)
def docs_simpson_diversity(sf_dir: str):
    """Simpson concentration index per source: the probability that two
    randomly drawn word tokens coincide, D = Σ c(c−1) / (n(n−1)) — the
    vocabulary-concentration audit that flags template-heavy or
    boilerplate sources (high D = few words dominate). Emitted as the
    exact integer numerator/denominator pair, so the result is
    bit-exact in any summation order (past ~1e12 tokens per source the
    c² term needs the float path — switch documented here, not silent).

    One (source, word-hash) hash-partitioned count aggregate — the
    same exact-answer exchange as the vocab ops — then c(c−1) and c
    fold to a sources-bounded table."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate, grouped_aggregate_ds
    from raylog.functions.dedup import _PROCESS_HASHER, _split_words

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["source", "text"])

    def words(b: pa.Table) -> pa.Table:
        wh, offsets = _split_words(b["text"], _PROCESS_HASHER)
        lens = offsets[1:] - offsets[:-1]
        src = np.repeat(np.asarray(b["source"].combine_chunks()), lens)
        return pa.table({"source": pa.array(src),
                         "w": pa.array(wh.astype(np.int64))})

    counts = grouped_aggregate_ds(
        ds.map_batches(words, batch_format="pyarrow", batch_size=None),
        ["source", "w"], [("*", "count", "c")], num_partitions=8)

    def fold(b: pa.Table) -> pa.Table:
        c = np.asarray(b["c"].combine_chunks(), dtype=np.int64)
        return pa.table({"source": b["source"],
                         "num": pa.array(c * (c - 1)),
                         "n": pa.array(c)})

    agg = grouped_aggregate(
        counts.map_batches(fold, batch_format="pyarrow", batch_size=None),
        ["source"], [("num", "sum", "num"), ("n", "sum", "n")])
    if "source" not in agg.column_names:
        return pa.table({"source": pa.array([], pa.string()),
                         "num": pa.array([], pa.int64()),
                         "den": pa.array([], pa.int64())})
    n = np.asarray(agg["n"], dtype=np.int64)
    return pa.table({"source": agg["source"], "num": agg["num"],
                     "den": pa.array(n * (n - 1), pa.int64())})
