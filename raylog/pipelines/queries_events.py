"""Event-stream analytics: sessions, funnels, drift, user aggregates.

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

# Large-side hash join (native) + session windows
# --------------------------------------------------------------------------

@query(
    "join_lineitem_orders",
    """
SELECT o.o_orderpriority, COUNT(*) AS n_items,
       CAST(SUM(l.l_quantity) AS BIGINT) AS sum_qty
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY 1""",
)
def join_lineitem_orders(sf_dir: str):
    """Both-sides-large hash join: Ray Data's native hash-partitioned
    Dataset.join (fact ⋈ fact on orderkey) → partial/tree aggregate.

    Broadcast is the engine default for dim lookups; this is the path for
    two fact tables (hash-partition both on the key, join per partition).
    """
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_quantity"])
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderpriority"])
    import pyarrow.compute as pc

    joined = li.join(
        orders, join_type="inner", num_partitions=8,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )
    tbl = grouped_aggregate(
        joined, ["o_orderpriority"],
        [("*", "count", "n_items"), ("l_quantity", "sum", "sum_qty_f")],
    )
    return pa.table(
        {
            "o_orderpriority": tbl["o_orderpriority"],
            "n_items": tbl["n_items"],
            "sum_qty": pc.cast(pc.round(tbl["sum_qty_f"]), pa.int64()),
        }
    )


@query(
    "events_sessionize",
    """
WITH e AS (
  SELECT user_id, event_id, epoch(ts) AS t FROM events
), d AS (
  SELECT *, CASE WHEN t - LAG(t) OVER (PARTITION BY user_id ORDER BY t, event_id)
                      > 1800 OR LAG(t) OVER (PARTITION BY user_id ORDER BY t, event_id) IS NULL
                 THEN 1 ELSE 0 END AS new_session
  FROM e
), s AS (
  SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY t, event_id
                                   ROWS UNBOUNDED PRECEDING) AS session_no
  FROM d
)
SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
       COUNT(*) AS n_events,
       CAST(FLOOR(MAX(t) - MIN(t)) AS BIGINT) AS duration_sec
FROM s GROUP BY 1, 2""",
)
def events_sessionize(sf_dir: str):
    """Session windows (30-min inactivity gap) per user.

    Users hash-partition (complete users per partition,
    ``partitioned_group_apply``); each partition derives every user's
    session boundaries and aggregates in ONE vectorized pass — no
    per-user pandas group calls (at scale users are numerous and small:
    the per-group-overhead pathology measured on the LSH buckets)."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import partitioned_group_apply

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_id", "ts"])

    def sessions(part: pa.Table) -> pa.Table:
        def col(name):
            c = part[name]
            return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c

        user = np.asarray(col("user_id"))
        t = np.asarray(col("ts")).astype("datetime64[us]").astype(np.int64) / 1e6
        eid = np.asarray(col("event_id"), dtype=np.int64)
        n = len(user)
        if n == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "session_no": pa.array([], pa.int64()),
                             "n_events": pa.array([], pa.int64()),
                             "duration_sec": pa.array([], pa.int64())})
        order = np.lexsort((eid, t, user))
        user, t = user[order], t[order]
        new = np.ones(n, dtype=bool)
        new[1:] = (user[1:] != user[:-1]) | ((t[1:] - t[:-1]) > 1800)
        ustarts = np.concatenate([[0], np.flatnonzero(user[1:] != user[:-1]) + 1])
        sncum = np.cumsum(new.astype(np.int64))
        seg = np.searchsorted(ustarts, np.arange(n), side="right") - 1
        sn = sncum - sncum[ustarts][seg] + 1
        sstarts = np.flatnonzero(new)
        sends = np.concatenate([sstarts[1:], [n]])
        return pa.table({
            "user_id": pa.array(user[sstarts]),
            "session_no": pa.array(sn[sstarts]),
            "n_events": pa.array((sends - sstarts).astype(np.int64)),
            "duration_sec": pa.array(
                np.floor(t[sends - 1] - t[sstarts]).astype(np.int64)),
        })

    return partitioned_group_apply(ds, ["user_id"], sessions)


@query(
    "docs_histogram",
    """
WITH s AS (
  SELECT CAST(MIN(n_chars) AS DOUBLE) AS lo,
         CAST(MAX(n_chars) AS DOUBLE) AS hi
  FROM documents
)
SELECT LEAST(CAST(FLOOR((n_chars - lo) * 32.0 / (hi - lo + 1.0)) AS BIGINT),
             31) AS bin,
       CAST(FLOOR(lo + (hi - lo + 1.0) / 32.0 * LEAST(CAST(FLOOR((n_chars
             - lo) * 32.0 / (hi - lo + 1.0)) AS BIGINT), 31)) AS BIGINT)
         AS lo_edge,
       COUNT(*) AS n
FROM documents, s GROUP BY 1, 2""",
)
def docs_histogram(sf_dir: str):
    """Fixed-bin global histogram (dataset profiling / distribution
    dashboard): pass 1 computes global min/max (scalar tree aggregate),
    edges broadcast; pass 2 emits one 32-long ``np.bincount`` vector per
    batch — the only exchange is bins-sized partials, elementwise-summed
    (the HLL-merge shape, `functions/sketch.py`). No key shuffle, no
    sort; exchange volume is independent of row count and value
    cardinality, unlike a GROUP-BY-value histogram."""
    import numpy as np
    import ray.data as rd

    NBINS = 32
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["n_chars"])

    mm = ds.aggregate(rd.aggregate.Min("n_chars"), rd.aggregate.Max("n_chars"))
    lo = float(mm["min(n_chars)"])
    hi = float(mm["max(n_chars)"])
    width = (hi - lo + 1.0) / NBINS

    def partial(b: pa.Table) -> pa.Table:
        x = np.asarray(b["n_chars"].combine_chunks(), dtype=np.float64)
        bins = np.minimum(np.floor((x - lo) * NBINS / (hi - lo + 1.0))
                          .astype(np.int64), NBINS - 1)
        counts = np.bincount(bins, minlength=NBINS)
        return pa.table({"bin": pa.array(np.arange(NBINS, dtype=np.int64)),
                         "n": pa.array(counts.astype(np.int64))})

    # bins×blocks partial rows merge in one tiny driver-side sum (bounded
    # by NBINS × num_blocks, independent of data volume).
    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None).to_arrow_refs()
    import ray

    total = np.zeros(NBINS, dtype=np.int64)
    for t in ray.get(parts):
        tb = t if isinstance(t, pa.Table) else pa.Table.from_batches([t])
        if "bin" not in tb.column_names:  # schemaless 0-row block
            continue
        total[np.asarray(tb["bin"].combine_chunks())] += np.asarray(
            tb["n"].combine_chunks())
    keep = total > 0
    bins = np.arange(NBINS, dtype=np.int64)[keep]
    return pa.table({
        "bin": pa.array(bins),
        "lo_edge": pa.array(np.floor(lo + width * bins).astype(np.int64)),
        "n": pa.array(total[keep]),
    })


@query(
    "log_templates",
    _P() + """
, t AS (
  SELECT doc_id,
         regexp_replace(regexp_replace(regexp_replace(log,
           '[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}',
           '<id>', 'g'),
           '\\b[0-9a-f]{16}\\b', '<hex>', 'g'),
           '\\b[0-9]+\\b', '<n>', 'g') AS template
  FROM recs2
)
SELECT template, COUNT(*) AS n_lines, MIN(doc_id) AS first_doc
FROM t GROUP BY 1""",
)
def log_templates(sf_dir: str):
    """Log template mining (Drain/Spell-style pattern extraction, the
    standard first step of log analytics): variable tokens — UUIDs, long
    hex ids, integers — masked to placeholders with three chained RE2
    passes (pyarrow and DuckDB share the RE2 engine, so semantics match
    bit-for-bit), then counts + first-seen per template through the
    hash-partitioned high-cardinality aggregate. No driver-side template
    table; exchange is key-compressed partials."""
    import pyarrow.compute as pc

    from raylog.functions.agg import grouped_aggregate_ds
    from raylog.pipelines import log_pipeline as LP

    ds = LP.parsed_ds(LP.records_ds(sf_dir))

    def mask(b: pa.Table) -> pa.Table:
        t = b["log"]
        t = pc.replace_substring_regex(
            t,
            pattern="[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}"
                    "-[0-9a-f]{12}",
            replacement="<id>")
        t = pc.replace_substring_regex(t, pattern=r"\b[0-9a-f]{16}\b",
                                       replacement="<hex>")
        t = pc.replace_substring_regex(t, pattern=r"\b[0-9]+\b",
                                       replacement="<n>")
        return pa.table({"doc_id": b["doc_id"], "template": t})

    masked = ds.map_batches(mask, batch_format="pyarrow", batch_size=None)
    return grouped_aggregate_ds(
        masked, ["template"],
        [("*", "count", "n_lines"), ("doc_id", "min", "first_doc")])


@query(
    "docs_char_entropy",
    """
WITH c AS (
  SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents
), g AS (
  SELECT doc_id, ch, COUNT(*) AS n FROM c GROUP BY 1, 2
), h AS (
  SELECT doc_id, SUM(n) AS tot, SUM(n * log2(n)) AS snln,
         COUNT(*) AS n_distinct, MAX(n) AS maxn
  FROM g GROUP BY 1
)
SELECT d.doc_id,
       CAST(FLOOR((log2(h.tot) - h.snln / h.tot) * 1000.0) AS BIGINT)
         AS entropy_milli,
       h.n_distinct AS n_distinct_chars,
       CAST((1000 * h.maxn) // h.tot AS BIGINT) AS modal_char_milli
FROM documents d JOIN h USING (doc_id)""",
)
def docs_char_entropy(sf_dir: str):
    """Character-distribution quality signals per document (entropy /
    distinct chars / modal-char per-mille — the low-entropy-boilerplate
    and ASCII-art detectors of C4/RefinedWeb-style cleaning). One
    segmented-bincount pass per batch over the flat UTF-8 buffer, zero
    exchange (`functions/text.py:char_entropy`)."""
    import ray.data as rd

    from raylog.functions.text import char_entropy

    return rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"]).map_batches(
        char_entropy, batch_format="pyarrow", batch_size=None).select_columns(
        ["doc_id", "entropy_milli", "n_distinct_chars", "modal_char_milli"])


@query(
    "sample_dsir",
    """
WITH words AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
               FROM documents),
cr AS (SELECT w, COUNT(*) AS c FROM words GROUP BY w),
ct AS (SELECT w, COUNT(*) AS c FROM words WHERE doc_id % 31 = 0 GROUP BY w),
tot AS (SELECT (SELECT COUNT(*) FROM cr) AS v,
               (SELECT SUM(c) FROM cr) AS tr,
               (SELECT COALESCE(SUM(c), 0) FROM ct) AS tt),
lr AS (SELECT cr.w,
              ln((COALESCE(ct.c, 0) + 1.0) / (tot.tt + tot.v))
                - ln((cr.c + 1.0) / (tot.tr + tot.v)) AS r
       FROM cr LEFT JOIN ct USING (w) CROSS JOIN tot),
dw AS (SELECT doc_id, SUM(r) AS logw FROM words JOIN lr USING (w)
       GROUP BY doc_id)
SELECT doc_id, source, CAST(ROUND(1e6 * logw) AS BIGINT) AS logw_micro
FROM (
  SELECT d.doc_id, d.source, dw.logw,
         ROW_NUMBER() OVER (ORDER BY dw.logw DESC, d.doc_id) AS rn
  FROM documents d JOIN dw USING (doc_id)
) WHERE rn <= 100""",
)
def sample_dsir(sf_dir: str):
    """DSIR-style data selection (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): fit unigram bag-of-words
    models on a target slice (``doc_id % 31 == 0``) and on the raw
    corpus (Laplace-smoothed over the shared vocab), weight each doc by
    its summed log importance ratio, keep the top-100 (the deterministic
    argmax variant of the paper's Gumbel-top-k; swapping in Gumbel noise
    is one hash-derived ``-log(-log u)`` add).

    Scale shape: ONE word-count aggregate produces both distributions
    (vocab-cardinality exchange, target mask applied per token inside the
    batch); the log-ratio model broadcasts once; scoring is the
    searchsorted+bincount kernel; selection is per-block partial top-k —
    no shuffle of the corpus at any point. At real scale the feature
    table is capped exactly as the paper does (DSIR hashes n-grams into
    10k buckets; equivalently top-V words + UNK mass, the `text_lm_score`
    practice) — the synthetic vocab is tiny so the exact table ships
    whole here."""
    import numpy as np
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate_ds
    from raylog.functions.topk import topk

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "source", "text"])

    def wcounts(b: pa.Table) -> pa.Table:
        split = pc.split_pattern(b["text"].combine_chunks(), " ")
        lens = np.asarray(pc.list_value_length(split), dtype=np.int64)
        flat = split.flatten().dictionary_encode()
        codes = np.asarray(flat.indices, dtype=np.int64)
        ids = np.asarray(b["doc_id"].combine_chunks(), dtype=np.int64)
        tgt_tok = np.repeat(ids % 31 == 0, lens)
        nv = len(flat.dictionary)
        cr = np.bincount(codes, minlength=nv)
        ct = np.bincount(codes[tgt_tok], minlength=nv)
        return pa.table({"w": flat.dictionary,
                         "cr": pa.array(cr, pa.int64()),
                         "ct": pa.array(ct, pa.int64())})

    vc = grouped_aggregate_ds(
        ds.map_batches(wcounts, batch_format="pyarrow", batch_size=None),
        ["w"], [("cr", "sum", "cr"), ("ct", "sum", "ct")],
    ).to_pandas()
    vocab = np.array(vc["w"], dtype=object)
    order = np.argsort(vocab)
    vocab = vocab[order].astype("U")
    cr = vc["cr"].to_numpy()[order].astype(np.float64)
    ct = vc["ct"].to_numpy()[order].astype(np.float64)
    v, tr, tt = float(len(vocab)), cr.sum(), ct.sum()
    ratio = np.log((ct + 1.0) / (tt + v)) - np.log((cr + 1.0) / (tr + v))
    model = (vocab, ratio)
    model_ref = ray.put(model) if ray.is_initialized() else model

    def score(b: pa.Table) -> pa.Table:
        vocab_, ratio_ = (ray.get(model_ref)
                          if ray.is_initialized() else model_ref)
        n_docs = b.num_rows
        split = pc.split_pattern(b["text"].combine_chunks(), " ")
        lens = np.asarray(pc.list_value_length(split), dtype=np.int64)
        flat = split.flatten().dictionary_encode()
        codes = np.asarray(flat.indices, dtype=np.int64)
        dict_r = ratio_[np.searchsorted(vocab_,
                                        np.asarray(flat.dictionary,
                                                   dtype="U"))]
        doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
        logw = np.bincount(doc_idx, weights=dict_r[codes], minlength=n_docs)
        return pa.table({"doc_id": b["doc_id"], "source": b["source"],
                         "logw": pa.array(logw, pa.float64())})

    scored = ds.map_batches(score, batch_format="pyarrow", batch_size=None)
    best = topk(scored, sort_cols=["logw", "doc_id"],
                descending=[True, False], k=100)
    return pa.table({
        "doc_id": best["doc_id"],
        "source": best["source"],
        "logw_micro": pc.cast(pc.round(pc.multiply(best["logw"],
                                                   pa.scalar(1e6))),
                              pa.int64()),
    })


@query(
    "events_anomaly",
    """
WITH c AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, COUNT(*) AS n
  FROM events GROUP BY 1, 2
), s AS (
  SELECT event_type, AVG(CAST(n AS DOUBLE)) AS mu,
         STDDEV_SAMP(CAST(n AS DOUBLE)) AS sd
  FROM c GROUP BY 1
)
SELECT c.event_type, c.day, c.n,
       CAST(ROUND((c.n - s.mu) / s.sd * 1000) AS BIGINT) AS z_milli,
       (c.n - s.mu) > 2 * s.sd AS is_spike
FROM c JOIN s USING (event_type)""",
)
def events_anomaly(sf_dir: str):
    """Log/metric-volume anomaly detection (the ops-dashboard spike
    alert a log agent feeds): daily counts per event type, per-type
    volume z-score over the window series, spike = count > mean + 2σ.

    The only full-data pass is the (type, day)-keyed count — partial +
    tree combine, types×days-bounded result; the z-score/spike finish
    runs on that tiny table driver-side. The scale knob is purely key
    cardinality, never row volume."""
    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts"])

    def day(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": b["event_type"],
            "day": pc.strftime(b["ts"], format="%Y-%m-%d"),
        })

    counts = grouped_aggregate(
        ds.map_batches(day, batch_format="pyarrow", batch_size=None),
        ["event_type", "day"], [("*", "count", "n")]).to_pandas()
    g = counts.groupby("event_type")["n"]
    stats = g.agg(mu="mean", sd=lambda x: x.std(ddof=1)).reset_index()
    m = counts.merge(stats, on="event_type")
    m = m[(m["sd"].notna()) & (m["sd"] > 0)].reset_index(drop=True)
    z = (m["n"] - m["mu"]) / m["sd"]
    return pa.table({
        "event_type": pa.array(m["event_type"], pa.string()),
        "day": pa.array(m["day"], pa.string()),
        "n": pa.array(m["n"], pa.int64()),
        "z_milli": pa.array(np.round(z * 1000).astype(np.int64)),
        "is_spike": pa.array((m["n"] - m["mu"]) > 2 * m["sd"]),
    })


@query("text_bpe_vocab", None)
def text_bpe_vocab(sf_dir: str):
    """BPE tokenizer training on the corpus (Sennrich 2016 / GPT-2
    recipe): the distributed pass is ONE word→count aggregate; merges
    run on the vocab-bounded weighted word table (`functions/bpe.py`).
    Deterministic (count-desc, lexicographic tie-break) — no SQL oracle
    (iterative merges are not SQL-expressible); pytest checks the merge
    sequence against an independent scalar reference, round-trip
    decode, and partition invariance."""
    import ray.data as rd

    from raylog.functions.bpe import bpe_train

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    return bpe_train(ds, num_merges=64).merge_table()


@query("text_bpe_encode", None)
def text_bpe_encode(sf_dir: str):
    """Encode the corpus with the corpus-trained BPE model: model
    broadcast once via ``ray.put``; each batch dictionary-encodes its
    word column so every distinct word is encoded exactly once, then
    token lists gather per document. Returns (doc_id, bpe token ids,
    n_bpe)."""
    import ray.data as rd

    from raylog.functions.bpe import bpe_encode_ds, bpe_train

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    model = bpe_train(ds, num_merges=64)
    return bpe_encode_ds(ds, model)


@query(
    "events_watermark_late",
    """
WITH e AS (
  SELECT event_id, event_type, epoch_us(ts) AS t FROM events
), w AS (
  SELECT *,
         MAX(t) OVER (PARTITION BY event_type ORDER BY event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS wm_prev,
         MAX(t) OVER (PARTITION BY event_type ORDER BY event_id
                      ROWS UNBOUNDED PRECEDING) AS wm
  FROM e
)
SELECT event_id, event_type,
       COALESCE(wm_prev - 3600000000 > t, FALSE) AS is_late,
       wm AS watermark_us
FROM w""",
)
def events_watermark_late(sf_dir: str):
    """Event-time watermark + late-data classification (the streaming
    allowed-lateness rule, batch-restated): records arrive in
    ``event_id`` order per type; the watermark is the running max event
    time seen so far; a record is late when it lags the pre-arrival
    watermark by over 1 hour (it would have missed its window).

    Types hash-partition (complete types per partition); ONE segmented
    ``np.maximum.accumulate`` pass per partition covers every type in
    it — no per-type task. A real stream keeps this state
    incrementally per source partition; the batch analog's only
    sequential dependency is within a type, which is inherent to
    watermark semantics."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import partitioned_group_apply

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "event_type", "ts"])

    def wm(part: pa.Table) -> pa.Table:
        def col(name):
            c = part[name]
            return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c

        typ = np.asarray(col("event_type"))
        eid = np.asarray(col("event_id"), dtype=np.int64)
        t = np.asarray(col("ts")).astype("datetime64[us]").astype(np.int64)
        n = len(typ)
        if n == 0:
            return pa.table({"event_id": pa.array([], pa.int64()),
                             "event_type": pa.array([], pa.string()),
                             "is_late": pa.array([], pa.bool_()),
                             "watermark_us": pa.array([], pa.int64())})
        order = np.lexsort((eid, typ))
        typ_s, eid_s, t_s = typ[order], eid[order], t[order]
        seg_start = np.ones(n, dtype=bool)
        seg_start[1:] = typ_s[1:] != typ_s[:-1]
        # segmented running max: one in-place accumulate per segment
        # (segments = distinct types in this partition — a handful)
        wm_incl = t_s.copy()
        starts = np.flatnonzero(seg_start)
        bounds = np.concatenate([starts, [n]])
        for i in range(len(starts)):
            s, e = bounds[i], bounds[i + 1]
            np.maximum.accumulate(t_s[s:e], out=wm_incl[s:e])
        wm_prev = np.empty(n, dtype=np.int64)
        wm_prev[1:] = wm_incl[:-1]
        is_late = np.zeros(n, dtype=bool)
        np.less(t_s[1:], wm_prev[1:] - 3_600_000_000,
                out=is_late[1:], where=~seg_start[1:])
        is_late &= ~seg_start
        return pa.table({
            "event_id": pa.array(eid_s),
            "event_type": pa.array(typ_s),
            "is_late": pa.array(is_late),
            "watermark_us": pa.array(wm_incl),
        })

    return partitioned_group_apply(ds, ["event_type"], wm)


@query(
    "pretrain_prep",
    """
WITH snips AS (
  SELECT DISTINCT substr(text, 1, 40) AS snip
  FROM documents WHERE doc_id % 97 = 0 AND len(text) >= 40
), q AS (
  SELECT doc_id, text,
    CAST(len(string_split(text,' ')) AS BIGINT) AS n_words,
    CAST(len(list_filter(string_split(text,' '), w -> w IN ('the','a'))) AS BIGINT) AS stop_hits,
    CAST(len(list_filter(string_split(text,' '), w -> w IN ('der','die','das','und'))) AS BIGINT) AS h_de,
    CAST(len(list_filter(string_split(text,' '), w -> w IN ('the','a','of','and'))) AS BIGINT) AS h_en,
    CAST(len(list_filter(string_split(text,' '), w -> w IN ('el','la','de','y'))) AS BIGINT) AS h_es,
    CAST(len(list_filter(string_split(text,' '), w -> w IN ('le','la','de','et'))) AS BIGINT) AS h_fr
  FROM documents
), scored AS (
  SELECT *,
    CAST(FLOOR(1000 * (0.5 * LEAST(n_words / 40.0, 1.0)
               + 0.5 * (1.0 - stop_hits * 1.0 / n_words))) AS BIGINT) AS score,
    GREATEST(h_de, h_en, h_es, h_fr) AS mx,
    (CASE WHEN h_de = GREATEST(h_de,h_en,h_es,h_fr) THEN 1 ELSE 0 END
   + CASE WHEN h_en = GREATEST(h_de,h_en,h_es,h_fr) THEN 1 ELSE 0 END
   + CASE WHEN h_es = GREATEST(h_de,h_en,h_es,h_fr) THEN 1 ELSE 0 END
   + CASE WHEN h_fr = GREATEST(h_de,h_en,h_es,h_fr) THEN 1 ELSE 0 END) AS ties
  FROM q
), kept AS (
  SELECT doc_id, text FROM scored
  WHERE score >= 600 AND mx > 0 AND ties = 1 AND h_en = mx
    AND NOT EXISTS (SELECT 1 FROM snips s WHERE contains(scored.text, s.snip))
), surv AS (
  SELECT MIN(doc_id) AS doc_id FROM kept GROUP BY text
)
SELECT doc_id, doc_id % 8 AS shard FROM surv""",
)
def pretrain_prep(sf_dir: str):
    """End-to-end pretraining-corpus prep — the composite pipeline a
    training-data user actually runs, every stage a proven engine
    kernel: quality filter (score ≥ 600) → language filter (en) →
    benchmark decontamination (eval-snippet RE2 alternation, broadcast
    once) → exact dedup (hash-partitioned keep-first) → deterministic
    shard assignment.

    Order note: decontamination commutes with exact dedup (identical
    texts share a contamination flag), so the cheap row-local filters
    run before the keyed aggregate — filters first, shuffle last, the
    100 TB-shape rule. Everything streams; the only exchange is the
    dedup key aggregate; the snippet set is the only driver-side state
    (eval-suite-sized by construction)."""
    import re

    import numpy as np
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    from raylog.functions.dedup import exact_dedup_survivors
    from raylog.functions.text import lang_id, quality_scores

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def eval_snips(b: pa.Table) -> pa.Table:
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
    pattern = "|".join(re.escape(s) for s in snips) if snips else None
    pat_ref = ray.put(pattern) if ray.is_initialized() else pattern

    def keep(b: pa.Table) -> pa.Table:
        scored = lang_id(quality_scores(b))
        m = pc.and_(pc.greater_equal(scored["score_milli"], pa.scalar(600)),
                    pc.equal(scored["lang_pred"], pa.scalar("en")))
        kept = scored.filter(m).select(["doc_id", "text"])
        pat = ray.get(pat_ref) if ray.is_initialized() else pat_ref
        if pat is None or kept.num_rows == 0:
            return kept
        clean = pc.invert(pc.match_substring_regex(
            kept["text"].combine_chunks(), pat))
        return kept.filter(clean)

    kept = ds.map_batches(keep, batch_format="pyarrow", batch_size=None)
    surv = exact_dedup_survivors(kept)

    def shard(b: pa.Table) -> pa.Table:
        ids = b["doc_id"]
        return pa.table({
            "doc_id": ids,
            "shard": pc.cast(
                pc.bit_wise_and(ids.combine_chunks(), pa.scalar(7)),
                pa.int64()),
        })

    return surv.map_batches(shard, batch_format="pyarrow", batch_size=None)


_STOPSET = ("the", "a", "of", "and", "der", "die", "das", "und",
            "el", "la", "de", "y", "le", "et")


@query(
    "text_remove_stopwords",
    """
SELECT doc_id,
       array_to_string(list_filter(string_split(text, ' '),
         w -> w NOT IN ({stops})), ' ') AS cleaned,
       CAST(len(string_split(text, ' '))
            - len(list_filter(string_split(text, ' '),
                  w -> w NOT IN ({stops}))) AS BIGINT) AS n_removed
FROM documents""".format(stops=",".join(f"'{w}'" for w in _STOPSET)),
)
def text_remove_stopwords(sf_dir: str):
    """Stopword-strip with full text rebuild (the classic IR/quality
    preproc pass): split → membership mask computed ONCE on the batch's
    dictionary-encoded distinct words (not per token) → masked flat
    gather → list offsets rebuilt → Arrow ``binary_join`` re-joins the
    cleaned text. Zero exchange, zero Python per row."""
    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd

    stopset = set(_STOPSET)

    def clean(b: pa.Table) -> pa.Table:
        text = b["text"].combine_chunks()
        split = pc.split_pattern(text, " ")
        lens = np.asarray(pc.list_value_length(split), dtype=np.int64)
        flat = split.flatten().dictionary_encode()
        codes = np.asarray(flat.indices, dtype=np.int64)
        dwords = flat.dictionary.to_pylist()
        dict_keep = np.array([w not in stopset for w in dwords])
        keep = dict_keep[codes]
        doc_idx = np.repeat(np.arange(b.num_rows, dtype=np.int64), lens)
        new_lens = np.bincount(doc_idx, weights=keep,
                               minlength=b.num_rows).astype(np.int64)
        offs = np.concatenate([[0], np.cumsum(new_lens)]).astype(np.int32)
        kept_words = split.flatten().filter(pa.array(keep))
        lists = pa.ListArray.from_arrays(pa.array(offs, pa.int32()),
                                         kept_words)
        return pa.table({
            "doc_id": b["doc_id"],
            "cleaned": pc.binary_join(lists, " "),
            "n_removed": pa.array(lens - new_lens),
        })

    return rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"]).map_batches(
        clean, batch_format="pyarrow", batch_size=None)


@query(
    "corpus_source_kl",
    """
WITH words AS (SELECT source, unnest(string_split(text, ' ')) AS w
               FROM documents),
sw AS (SELECT source, w, COUNT(*) AS c FROM words GROUP BY 1, 2),
st AS (SELECT source, SUM(c) AS n FROM sw GROUP BY 1),
gw AS (SELECT w, SUM(c) AS c FROM sw GROUP BY 1),
gt AS (SELECT SUM(c) AS n FROM gw)
SELECT sw.source,
       CAST(FLOOR(1000 * SUM((sw.c * 1.0 / st.n)
            * ln((sw.c * 1.0 / st.n) / (gw.c * 1.0 / gt.n)))) AS BIGINT)
         AS kl_milli
FROM sw JOIN st USING (source) JOIN gw USING (w) CROSS JOIN gt
GROUP BY 1""",
)
def corpus_source_kl(sf_dir: str):
    """Per-source KL divergence from the corpus-wide word distribution
    (mixture diagnostics: which source is distributionally aberrant —
    the quantitative form of the Pile/ROOTS source-audit step).

    Exchange shape: ONE (source, word)-keyed count aggregate
    (vocab×sources-bounded, hash-partitioned); the global distribution
    and per-source totals derive from it and broadcast; the KL terms
    are one vectorized pass over the count Dataset; the finish is a
    sources-bounded sum. Corpus rows shuffle zero times."""
    import numpy as np
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate, grouped_aggregate_ds

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["source", "text"])

    def wcounts(b: pa.Table) -> pa.Table:
        split = pc.split_pattern(b["text"].combine_chunks(), " ")
        lens = np.asarray(pc.list_value_length(split), dtype=np.int64)
        flat = split.flatten().dictionary_encode()
        codes = np.asarray(flat.indices, dtype=np.int64)
        src = np.asarray(b["source"].combine_chunks().dictionary_encode()
                         .indices, dtype=np.int64)
        src_dict = b["source"].combine_chunks().dictionary_encode().dictionary
        tok_src = np.repeat(src, lens)
        nv = len(flat.dictionary)
        packed = tok_src * nv + codes
        up, cnt = np.unique(packed, return_counts=True)
        return pa.table({
            "source": src_dict.take(pa.array(up // nv)),
            "w": flat.dictionary.take(pa.array(up % nv)),
            "c": pa.array(cnt.astype(np.int64)),
        })

    sw = grouped_aggregate_ds(
        ds.map_batches(wcounts, batch_format="pyarrow", batch_size=None),
        ["source", "w"], [("c", "sum", "c")])

    gw = grouped_aggregate(sw, ["w"], [("c", "sum", "c")]).to_pandas()
    vocab = np.array(gw["w"], dtype=object)
    order = np.argsort(vocab)
    vocab = vocab[order].astype("U")
    gcnt = gw["c"].to_numpy()[order].astype(np.float64)
    gtot = gcnt.sum()
    st = grouped_aggregate(sw, ["source"], [("c", "sum", "n")]).to_pandas()
    stot = {r.source: float(r.n) for r in st.itertuples()}
    model = (vocab, gcnt / gtot, stot)
    ref = ray.put(model) if ray.is_initialized() else model

    def terms(b: pa.Table) -> pa.Table:
        vocab_, q_, stot_ = ray.get(ref) if ray.is_initialized() else ref
        w = np.asarray(b["w"].combine_chunks(), dtype="U")
        c = np.asarray(b["c"].combine_chunks(), dtype=np.float64)
        src = b["source"].to_pylist()
        n = np.array([stot_[s] for s in src])
        p = c / n
        q = q_[np.searchsorted(vocab_, w)]
        return pa.table({
            "source": b["source"],
            "term": pa.array(p * np.log(p / q), pa.float64()),
        })

    out = grouped_aggregate(
        sw.map_batches(terms, batch_format="pyarrow", batch_size=None),
        ["source"], [("term", "sum", "kl")])
    return pa.table({
        "source": out["source"],
        "kl_milli": pc.cast(pc.floor(pc.multiply(out["kl"],
                                                 pa.scalar(1000.0))),
                            pa.int64()),
    })


@query(
    "dedup_online",
    "SELECT DISTINCT text FROM documents",
)
def dedup_online(sf_dir: str):
    """Online streaming dedup via the sharded shared mutable index
    (`state/dedup_index.py`) — the raw-actor escape hatch: cross-batch
    first-wins membership the Dataset API cannot express. The survivor
    TEXT SET is deterministic (exactly one per distinct content) even
    though which physical row survives follows arrival order, so the
    oracle compares the set itself."""
    import ray.data as rd

    from raylog.state.dedup_index import online_dedup

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    out, _shards = online_dedup(ds, num_shards=4, concurrency=2)
    return out.select_columns(["text"])


@query(
    "embed_hard_negatives",
    """
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT * FROM e WHERE vec_id < 5),
s AS (SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
             list_cosine_similarity(q.v, e.v) AS cos
      FROM q JOIN e ON e.label <> q.label),
r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cos DESC, neighbor_id) AS rank
      FROM s)
SELECT query_id, rank, neighbor_id,
       CAST(ROUND(1000000 * cos) AS BIGINT) AS cos_micro
FROM r WHERE rank <= 5""",
)
def embed_hard_negatives(sf_dir: str):
    """Hard-negative mining for contrastive training (SimCSE/DPR
    recipe): for each query vector, the top-5 most-similar vectors with
    a DIFFERENT label — near-misses across the class boundary, the
    negatives that matter.

    Per-query label exclusion composes from the existing filtered-ANN
    kernel: queries group by label (labels-bounded), one scan per query
    label with the corpus predicate pushed into the read; each scan is
    the broadcast-queries / per-batch-partial-top-k shape."""
    import pyarrow.compute as pc
    import ray.data as rd

    from raylog.functions.similarity import ann_brute_topk

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding", "label"])
    qids = [0, 1, 2, 3, 4]
    qlab = {}
    lab_tbl = ds.map_batches(
        lambda b: b.filter(pc.is_in(b["vec_id"], value_set=pa.array(qids)))
        .select(["vec_id", "label"]),
        batch_format="pyarrow", batch_size=None).to_pandas()
    for r in lab_tbl.itertuples():
        qlab[int(r.vec_id)] = int(r.label)

    parts = []
    for lab in sorted(set(qlab.values())):
        group = [q for q, lb in qlab.items() if lb == lab]
        corpus = ds.filter(
            expr=f"label != {lab}")
        parts.append(ann_brute_topk(ds, query_ids=group, k=5,
                                    corpus_ds=corpus))
    out = pa.concat_tables(parts)
    return out.sort_by([("query_id", "ascending"), ("rank", "ascending")])


@query(
    "events_daily_top_users",
    """
WITH c AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day, user_id, COUNT(*) AS n
  FROM events GROUP BY 1, 2
), r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY day
                               ORDER BY n DESC, user_id) AS rnk
  FROM c
)
SELECT day, rnk, user_id, n FROM r WHERE rnk <= 3""",
)
def events_daily_top_users(sf_dir: str):
    """Trending entities per window (daily top-3 most active users —
    the leaderboard/hot-key dashboard query): (day, user) counts via
    the hash-partitioned high-cardinality aggregate, then the grouped
    partial-top-k kernel — each block forwards ≤ k rows per day it
    sees, merge is days×k-bounded. No global sort, no per-day giant
    group task (the VERDICT r1 grouped-top-k trap)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate_ds
    from raylog.functions.topk import topk

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "user_id"])

    def day(b: pa.Table) -> pa.Table:
        return pa.table({
            "day": pc.strftime(b["ts"], format="%Y-%m-%d"),
            "user_id": b["user_id"],
        })

    counts = grouped_aggregate_ds(
        ds.map_batches(day, batch_format="pyarrow", batch_size=None),
        ["day", "user_id"], [("*", "count", "n")])
    tbl = topk(counts, sort_cols=["n", "user_id"],
               descending=[True, False], k=3,
               group_cols=["day"], add_rank="rnk")
    return pa.table({
        "day": tbl["day"],
        "rnk": pc.cast(tbl["rnk"], pa.int64()),
        "user_id": tbl["user_id"],
        "n": tbl["n"],
    })


@query(
    "events_user_trend",
    """
WITH e AS (
  SELECT user_id, epoch(ts) AS t, value FROM events
), s AS (
  SELECT user_id, COUNT(*) AS n_events,
         REGR_SLOPE(value, t) AS slope
  FROM e GROUP BY 1
)
SELECT user_id, n_events,
       CAST(FLOOR(slope * 1e9) AS BIGINT) AS slope_nano
FROM s WHERE n_events >= 2 AND slope IS NOT NULL""",
)
def events_user_trend(sf_dir: str):
    """Per-entity linear trend (is each user's metric drifting up or
    down — the grouped least-squares slope, the fleet-health regression
    a telemetry pipeline runs per host/user/service).

    Closed-form slope from five moment sums (n, Σt, Σv, Σtv, Σt²) —
    each batch emits one moment row per key it sees, the
    hash-partitioned combine merges them, the finish is pure arithmetic
    per key. High-cardinality-safe: no per-group task, no sort, the
    exchange is key-compressed moment partials (the `agg.py` shape)."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate_ds

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "value"])

    def moments(b: pa.Table) -> pa.Table:
        t = (np.asarray(b["ts"].combine_chunks())
             .astype("datetime64[us]").astype(np.int64) / 1e6)
        v = np.asarray(b["value"].combine_chunks(), dtype=np.float64)
        return pa.table({
            "user_id": b["user_id"],
            "t": pa.array(t, pa.float64()),
            "v": pa.array(v, pa.float64()),
            "tv": pa.array(t * v, pa.float64()),
            "tt": pa.array(t * t, pa.float64()),
        })

    agg = grouped_aggregate_ds(
        ds.map_batches(moments, batch_format="pyarrow", batch_size=None),
        ["user_id"],
        [("*", "count", "n"), ("t", "sum", "st"), ("v", "sum", "sv"),
         ("tv", "sum", "stv"), ("tt", "sum", "stt")])

    def finish(b: pa.Table) -> pa.Table:
        n = np.asarray(b["n"].combine_chunks(), dtype=np.float64)
        st = np.asarray(b["st"].combine_chunks())
        sv = np.asarray(b["sv"].combine_chunks())
        stv = np.asarray(b["stv"].combine_chunks())
        stt = np.asarray(b["stt"].combine_chunks())
        denom = stt - st * st / n
        with np.errstate(divide="ignore", invalid="ignore"):
            slope = (stv - st * sv / n) / denom
        keep = (n >= 2) & (denom > 0) & np.isfinite(slope)
        out = pa.table({
            "user_id": b["user_id"],
            "n_events": pa.array(n.astype(np.int64)),
            "slope_nano": pa.array(
                np.floor(np.where(keep, slope, 0.0) * 1e9).astype(np.int64)),
        })
        return out.filter(pa.array(keep))

    return agg.map_batches(finish, batch_format="pyarrow", batch_size=None)


@query(
    "docs_percent_rank",
    """
SELECT doc_id, source,
       CAST(FLOOR(1000 * PERCENT_RANK() OVER (PARTITION BY source
                                              ORDER BY n_chars)) AS BIGINT)
         AS pr_milli
FROM documents""",
)
def docs_percent_rank(sf_dir: str):
    """Per-row percentile rank of doc length within its source (the CDF
    position feature quality classifiers consume). PERCENT_RANK =
    (count of strictly smaller values) / (n_group - 1), computed WITHOUT
    a sort: per-(source, value) counts are bounded by
    sources × distinct-lengths (a length column has bounded range at
    any corpus size), the tiny CDF table broadcasts, each batch looks
    its rows up with one searchsorted. No shuffle of the corpus."""
    import numpy as np
    import ray
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "source", "n_chars"])

    counts = grouped_aggregate(ds, ["source", "n_chars"],
                               [("*", "count", "c")]).to_pandas()
    cdf = {}
    for src, g in counts.groupby("source"):
        g = g.sort_values("n_chars")
        vals = g["n_chars"].to_numpy()
        c = g["c"].to_numpy()
        below = np.concatenate([[0], np.cumsum(c)[:-1]])
        n = int(c.sum())
        cdf[src] = (vals, below, n)
    ref = ray.put(cdf) if ray.is_initialized() else cdf

    def rank(b: pa.Table) -> pa.Table:
        m = ray.get(ref) if ray.is_initialized() else ref
        src = b["source"].to_pylist()
        x = np.asarray(b["n_chars"].combine_chunks(), dtype=np.int64)
        pr = np.zeros(len(x), dtype=np.float64)
        order = np.argsort(src, kind="stable")
        i = 0
        src_arr = np.array(src, dtype=object)
        while i < len(order):
            j = i
            s = src_arr[order[i]]
            while j < len(order) and src_arr[order[j]] == s:
                j += 1
            sel = order[i:j]
            vals, below, n = m[s]
            pos = np.searchsorted(vals, x[sel])
            pr[sel] = below[pos] / max(n - 1, 1)
            i = j
        return pa.table({
            "doc_id": b["doc_id"],
            "source": b["source"],
            "pr_milli": pa.array(np.floor(1000 * pr).astype(np.int64)),
        })

    return ds.map_batches(rank, batch_format="pyarrow", batch_size=None)


@query(
    "text_pmi_bigrams",
    """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
words AS (SELECT doc_id, unnest(w) AS w FROM t),
wc AS (SELECT w, COUNT(*) AS c FROM words GROUP BY 1),
tot AS (SELECT SUM(c) AS n FROM wc),
bg AS (
  SELECT list_extract(w, i) AS w1, list_extract(w, i + 1) AS w2,
         COUNT(*) AS c
  FROM t, UNNEST(generate_series(1, len(w) - 1)) AS u(i)
  GROUP BY 1, 2
), btot AS (SELECT SUM(c) AS n FROM bg),
pmi AS (
  SELECT bg.w1, bg.w2, bg.c,
         ln((bg.c * 1.0 / btot.n)
            / ((a.c * 1.0 / tot.n) * (b.c * 1.0 / tot.n))) AS v
  FROM bg JOIN wc a ON bg.w1 = a.w JOIN wc b ON bg.w2 = b.w
  CROSS JOIN tot CROSS JOIN btot
  WHERE bg.c >= 5
)
SELECT w1, w2, c, CAST(FLOOR(1000 * v) AS BIGINT) AS pmi_milli
FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY v DESC, w1, w2) AS rn
      FROM pmi)
WHERE rn <= 30""",
)
def text_pmi_bigrams(sf_dir: str):
    """Collocation mining: top-30 word bigrams by pointwise mutual
    information (count ≥ 5) — the classic phrase-detection pass
    (word2vec's phrase building, Mikolov 2013).

    Word counts and bigram counts each flow through the
    hash-partitioned aggregate (vocab- / pairs-bounded partials); the
    unigram distribution broadcasts; PMI evaluates vectorized over the
    bigram Dataset; selection is partial top-k. Bigram pairs use
    in-batch dictionary codes packed into one uint64 — the
    `tokens.py` masked-pair kernel shape applied to words."""
    import numpy as np
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate_ds
    from raylog.functions.topk import topk

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def bigram_counts(b: pa.Table) -> pa.Table:
        split = pc.split_pattern(b["text"].combine_chunks(), " ")
        lens = np.asarray(pc.list_value_length(split), dtype=np.int64)
        flat = split.flatten().dictionary_encode()
        codes = np.asarray(flat.indices, dtype=np.uint64)
        nv = np.uint64(len(flat.dictionary))
        if len(codes) < 2:
            return pa.table({"w1": pa.array([], pa.string()),
                             "w2": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64())})
        key = codes[:-1] * nv + codes[1:]
        mask = np.ones(len(codes) - 1, dtype=bool)
        ends = np.cumsum(lens)[:-1]
        ends = ends[(ends > 0) & (ends < len(codes))]
        mask[ends - 1] = False
        uk, cnt = np.unique(key[mask], return_counts=True)
        return pa.table({
            "w1": flat.dictionary.take(pa.array((uk // nv).astype(np.int64))),
            "w2": flat.dictionary.take(pa.array((uk % nv).astype(np.int64))),
            "c": pa.array(cnt.astype(np.int64)),
        })

    def word_counts(b: pa.Table) -> pa.Table:
        split = pc.split_pattern(b["text"].combine_chunks(), " ")
        flat = split.flatten().dictionary_encode()
        codes = np.asarray(flat.indices, dtype=np.int64)
        uc, cnt = np.unique(codes, return_counts=True)
        return pa.table({"w": flat.dictionary.take(pa.array(uc)),
                         "c": pa.array(cnt, pa.int64())})

    wc = grouped_aggregate_ds(
        ds.map_batches(word_counts, batch_format="pyarrow", batch_size=None),
        ["w"], [("c", "sum", "c")]).to_pandas()
    vocab = np.array(wc["w"], dtype=object)
    order = np.argsort(vocab)
    vocab = vocab[order].astype("U")
    wcnt = wc["c"].to_numpy()[order].astype(np.float64)
    wtot = wcnt.sum()
    model_ref = (ray.put((vocab, wcnt / wtot))
                 if ray.is_initialized() else (vocab, wcnt / wtot))

    bg = grouped_aggregate_ds(
        ds.map_batches(bigram_counts, batch_format="pyarrow",
                       batch_size=None),
        ["w1", "w2"], [("c", "sum", "c")])
    _bt = bg.sum("c")
    if not _bt:  # no bigrams at all (or empty corpus)
        z = pa.array([], pa.int64())
        e = pa.array([], pa.string())
        return pa.table({"w1": e, "w2": e, "c": z, "pmi_milli": z})
    btot = float(_bt)

    def pmi(b: pa.Table) -> pa.Table:
        vocab_, p_ = (ray.get(model_ref)
                      if ray.is_initialized() else model_ref)
        c = np.asarray(b["c"].combine_chunks(), dtype=np.float64)
        keep = c >= 5
        b2 = b.filter(pa.array(keep))
        if b2.num_rows == 0:
            return pa.table({"w1": pa.array([], pa.string()),
                             "w2": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64()),
                             "v": pa.array([], pa.float64())})
        c2 = c[keep]
        p1 = p_[np.searchsorted(vocab_, np.asarray(b2["w1"].combine_chunks(),
                                                   dtype="U"))]
        p2 = p_[np.searchsorted(vocab_, np.asarray(b2["w2"].combine_chunks(),
                                                   dtype="U"))]
        v = np.log((c2 / btot) / (p1 * p2))
        return pa.table({"w1": b2["w1"], "w2": b2["w2"],
                         "c": pc.cast(b2["c"], pa.int64()),
                         "v": pa.array(v, pa.float64())})

    scored = bg.map_batches(pmi, batch_format="pyarrow", batch_size=None)
    best = topk(scored, sort_cols=["v", "w1", "w2"],
                descending=[True, False, False], k=30)
    if "w1" not in best.column_names:  # every bigram below min count
        z = pa.array([], pa.int64())
        e = pa.array([], pa.string())
        return pa.table({"w1": e, "w2": e, "c": z, "pmi_milli": z})
    return pa.table({
        "w1": best["w1"], "w2": best["w2"], "c": best["c"],
        "pmi_milli": pc.cast(pc.floor(pc.multiply(best["v"],
                                                  pa.scalar(1000.0))),
                             pa.int64()),
    })


@query(
    "docs_robust_z",
    """
WITH m AS (SELECT source, quantile_disc(n_chars, 0.5) AS med
           FROM documents GROUP BY 1),
a AS (SELECT d.doc_id, d.source, d.n_chars,
             abs(d.n_chars - m.med) AS adev, m.med
      FROM documents d JOIN m USING (source)),
md AS (SELECT source, quantile_disc(adev, 0.5) AS mad FROM a GROUP BY 1)
SELECT a.doc_id, a.source,
       CAST(FLOOR(1000.0 * (a.n_chars - a.med) / md.mad) AS BIGINT)
         AS rz_milli
FROM a JOIN md USING (source) WHERE md.mad > 0""",
)
def docs_robust_z(sf_dir: str):
    """Robust (median/MAD) per-group z-score — the outlier-resistant
    normalization quality pipelines prefer over mean/std when lengths
    are heavy-tailed. Two passes through the exact distributed-quantile
    kernel (value-cardinality-bounded histograms, `quantile.py`): per-
    source median, then median absolute deviation of the integer
    deviations; both tiny tables broadcast; the normalize is one
    vectorized pass. All arithmetic before the final divide is exact
    integers — the SQL restatement matches bit-for-bit."""
    import numpy as np
    import ray
    import ray.data as rd

    from raylog.functions.quantile import grouped_quantiles

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "source", "n_chars"])

    med_tbl = grouped_quantiles(ds, key="source", value="n_chars",
                                ps=[0.5], out_names=["med"]).to_pandas()
    med = {r.source: int(r.med) for r in med_tbl.itertuples()}
    med_ref = ray.put(med) if ray.is_initialized() else med

    def adev(b: pa.Table) -> pa.Table:
        m = ray.get(med_ref) if ray.is_initialized() else med_ref
        src = b["source"].to_pylist()
        x = np.asarray(b["n_chars"].combine_chunks(), dtype=np.int64)
        mv = np.array([m[s] for s in src], dtype=np.int64)
        return pa.table({"source": b["source"],
                         "adev": pa.array(np.abs(x - mv))})

    mad_tbl = grouped_quantiles(
        ds.map_batches(adev, batch_format="pyarrow", batch_size=None),
        key="source", value="adev", ps=[0.5], out_names=["mad"]).to_pandas()
    mad = {r.source: int(r.mad) for r in mad_tbl.itertuples()}
    mad_ref = ray.put(mad) if ray.is_initialized() else mad

    def norm(b: pa.Table) -> pa.Table:
        m = ray.get(med_ref) if ray.is_initialized() else med_ref
        d = ray.get(mad_ref) if ray.is_initialized() else mad_ref
        src = b["source"].to_pylist()
        x = np.asarray(b["n_chars"].combine_chunks(), dtype=np.int64)
        mv = np.array([m[s] for s in src], dtype=np.int64)
        dv = np.array([d[s] for s in src], dtype=np.int64)
        keep = dv > 0
        with np.errstate(divide="ignore", invalid="ignore"):
            rz = np.floor(1000.0 * (x - mv) / np.maximum(dv, 1)
                          ).astype(np.int64)
        return pa.table({
            "doc_id": b["doc_id"],
            "source": b["source"],
            "rz_milli": pa.array(rz),
        }).filter(pa.array(keep))

    return ds.map_batches(norm, batch_format="pyarrow", batch_size=None)


@query(
    "docs_shuffle_rank",
    """
SELECT doc_id,
       CAST(ROW_NUMBER() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)),
                               doc_id) - 1 AS BIGINT) AS shuffle_rank
FROM documents""",
)
def docs_shuffle_rank(sf_dir: str):
    """Deterministic global corpus shuffle (the training-order
    permutation every pretraining run needs, resumable because it is a
    pure function of the ids): rank = position under (md5(doc_id),
    doc_id) order.

    Distributed WITHOUT a global sort: md5 keys are uniform, so the
    first byte is a balanced range partition — per-batch bucket counts
    (256-bounded) tree-merge into exact bucket offsets, each hash
    partition sorts only its own buckets' keys and adds the offset.
    At 100 TB the same plan holds with 2-3 prefix bytes; the exchange
    is (bucket, count) partials plus the one key-partitioned pass."""
    import hashlib

    import numpy as np
    import ray
    import ray.data as rd

    from raylog.functions.agg import (grouped_aggregate,
                                      partitioned_group_apply)

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id"])

    def keyed(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_pylist()
        keys = [hashlib.md5(str(i).encode()).hexdigest() for i in ids]
        buckets = np.array([int(k[:2], 16) for k in keys], dtype=np.int64)
        return pa.table({"doc_id": b["doc_id"],
                         "key": pa.array(keys, pa.string()),
                         "bucket": pa.array(buckets)})

    kds = ds.map_batches(keyed, batch_format="pyarrow", batch_size=None)
    counts = grouped_aggregate(kds, ["bucket"],
                               [("*", "count", "c")]).to_pandas()
    counts = counts.sort_values("bucket")
    offsets = np.zeros(256, dtype=np.int64)
    off = 0
    for r in counts.itertuples():
        offsets[int(r.bucket)] = off
        off += int(r.c)
    off_ref = ray.put(offsets) if ray.is_initialized() else offsets

    def rank_partition(part: pa.Table) -> pa.Table:
        offs = ray.get(off_ref) if ray.is_initialized() else off_ref
        key = np.asarray(part["key"].combine_chunks(), dtype="U")
        ids = np.asarray(part["doc_id"].combine_chunks(), dtype=np.int64)
        bkt = np.asarray(part["bucket"].combine_chunks(), dtype=np.int64)
        order = np.lexsort((ids, key, bkt))
        # local rank within each bucket (buckets are COMPLETE per
        # partition — partitioned_group_apply guarantees it)
        b_sorted = bkt[order]
        starts = np.ones(len(b_sorted), dtype=bool)
        starts[1:] = b_sorted[1:] != b_sorted[:-1]
        idx = np.arange(len(b_sorted))
        local = idx - idx[starts][np.cumsum(starts) - 1]
        rank = offs[b_sorted] + local
        out = np.empty(len(ids), dtype=np.int64)
        out[order] = rank
        return pa.table({"doc_id": pa.array(ids),
                         "shuffle_rank": pa.array(out)})

    return partitioned_group_apply(kds, ["bucket"], rank_partition)


@query(
    "corpus_lang_source_chi2",
    """
WITH c AS (
  SELECT lang, source, COUNT(*) AS o FROM documents GROUP BY 1, 2
), m AS (
  SELECT lang, SUM(o) AS rl FROM c GROUP BY 1
), n AS (
  SELECT source, SUM(o) AS cs FROM c GROUP BY 1
), t AS (SELECT SUM(o) AS tot FROM c),
cells AS (
  SELECT c.lang, c.source, c.o,
         m.rl * n.cs * 1.0 / t.tot AS e
  FROM c JOIN m USING (lang) JOIN n USING (source) CROSS JOIN t
)
SELECT lang, source, o,
       CAST(FLOOR(1000 * (o - e) * (o - e) / e) AS BIGINT)
         AS chi2_contrib_milli
FROM cells""",
)
def corpus_lang_source_chi2(sf_dir: str):
    """Corpus-composition independence audit: chi-square contribution of
    every (lang, source) cell against the independence expectation —
    the statistical form of "is language balanced across sources?"
    (cells with large contributions are the skewed pockets a mixture
    designer rebalances).

    One (lang, source)-keyed count aggregate (langs×sources-bounded);
    marginals and expectations derive from that tiny table driver-side.
    The corpus streams once, shuffle-free."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["lang", "source"])
    c = grouped_aggregate(ds, ["lang", "source"],
                          [("*", "count", "o")]).to_pandas()
    rl = c.groupby("lang")["o"].sum()
    cs = c.groupby("source")["o"].sum()
    tot = float(c["o"].sum())
    e = (c["lang"].map(rl).to_numpy() * c["source"].map(cs).to_numpy()
         / tot)
    o = c["o"].to_numpy().astype(np.float64)
    contrib = np.floor(1000 * (o - e) ** 2 / e).astype(np.int64)
    return pa.table({
        "lang": pa.array(c["lang"], pa.string()),
        "source": pa.array(c["source"], pa.string()),
        "o": pa.array(c["o"].to_numpy().astype(np.int64)),
        "chi2_contrib_milli": pa.array(contrib),
    })


@query(
    "events_user_sequence",
    """
SELECT user_id,
       list(event_type ORDER BY ts, event_id) AS seq,
       COUNT(*) AS n_events
FROM events GROUP BY user_id""",
)
def events_user_sequence(sf_dir: str):
    """collect_list: per-user time-ordered event-type sequence (the
    behavioral-sequence form fed to session models / next-event
    prediction). Users hash-partition complete
    (`partitioned_group_apply`); each partition sorts once and rebuilds
    every user's list via offsets — no per-user Python calls, no global
    sort."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import partitioned_group_apply

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_id", "ts",
                                  "event_type"])

    def collect(part: pa.Table) -> pa.Table:
        def col(name):
            c = part[name]
            return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c

        user = np.asarray(col("user_id"), dtype=np.int64)
        eid = np.asarray(col("event_id"), dtype=np.int64)
        t = np.asarray(col("ts")).astype("datetime64[us]").astype(np.int64)
        et = col("event_type")
        n = len(user)
        if n == 0:
            return pa.table({
                "user_id": pa.array([], pa.int64()),
                "seq": pa.array([], pa.list_(pa.string())),
                "n_events": pa.array([], pa.int64()),
            })
        order = np.lexsort((eid, t, user))
        user_s = user[order]
        starts = np.ones(n, dtype=bool)
        starts[1:] = user_s[1:] != user_s[:-1]
        offs = np.concatenate([np.flatnonzero(starts), [n]]).astype(np.int32)
        seq = pa.ListArray.from_arrays(pa.array(offs, pa.int32()),
                                       et.take(pa.array(order)))
        return pa.table({
            "user_id": pa.array(user_s[np.flatnonzero(starts)]),
            "seq": seq,
            "n_events": pa.array(np.diff(offs).astype(np.int64)),
        })

    return partitioned_group_apply(ds, ["user_id"], collect)


@query(
    "events_user_pivot",
    """
SELECT user_id,
       CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
       CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
       CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error
FROM events GROUP BY user_id""",
)
def events_user_pivot(sf_dir: str):
    """Pivot (long → wide): per-user event-type count matrix — the
    feature-vector form classifiers consume. Each batch pivots locally
    (one-hot scatter via dictionary codes ONCE per batch), the wide
    partials sum through the hash-partitioned combine — the pivot
    happens before the exchange, so the shuffle carries users × 5
    integer columns, not events."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate_ds

    TYPES = ["click", "view", "purchase", "signup", "error"]
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type"])

    def widen(b: pa.Table) -> pa.Table:
        user = np.asarray(b["user_id"].combine_chunks(), dtype=np.int64)
        et = b["event_type"].combine_chunks().dictionary_encode()
        codes = np.asarray(et.indices, dtype=np.int64)
        dwords = et.dictionary.to_pylist()
        remap = np.array([TYPES.index(w) for w in dwords], dtype=np.int64)
        tcode = remap[codes]
        uu, uidx = np.unique(user, return_inverse=True)
        mat = np.zeros((len(uu), len(TYPES)), dtype=np.int64)
        np.add.at(mat, (uidx, tcode), 1)
        cols = {"user_id": pa.array(uu)}
        for j, t in enumerate(TYPES):
            cols[f"n_{t}"] = pa.array(mat[:, j])
        return pa.table(cols)

    return grouped_aggregate_ds(
        ds.map_batches(widen, batch_format="pyarrow", batch_size=None),
        ["user_id"], [(f"n_{t}", "sum", f"n_{t}") for t in TYPES])


@query(
    "sample_quality_weighted",
    """
WITH q AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
         CAST(len(list_filter(string_split(text, ' '),
              w -> w IN ('the', 'a'))) AS BIGINT) AS stop_hits,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
              AS BIGINT) AS h
  FROM documents
), s AS (
  SELECT doc_id, h,
         CAST(FLOOR(1000 * (0.5 * LEAST(n_words / 40.0, 1.0)
              + 0.5 * (1.0 - stop_hits * 1.0 / n_words))) AS BIGINT)
           AS score
  FROM q
)
SELECT doc_id, score FROM s
WHERE h % 1000 < score""",
)
def sample_quality_weighted(sf_dir: str):
    """Quality-weighted downsampling (soft filtering — the "keep good
    docs more often" alternative to a hard threshold, RefinedWeb-style
    probabilistic retention): acceptance probability = quality score,
    decision = deterministic per-doc hash uniform (reproducible across
    runs and engines, resumable by construction). One streaming pass,
    zero exchange; both the score and the coin are integer-exact in the
    SQL restatement."""
    import hashlib

    import numpy as np
    import ray.data as rd

    from raylog.functions.text import quality_scores

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def pick(b: pa.Table) -> pa.Table:
        scored = quality_scores(b)
        score = np.asarray(scored["score_milli"].combine_chunks(),
                           dtype=np.int64)
        ids = b["doc_id"].to_pylist()
        h = np.array([int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
                      for i in ids], dtype=np.int64)
        keep = (h % 1000) < score
        return pa.table({
            "doc_id": b["doc_id"],
            "score": pa.array(score),
        }).filter(pa.array(keep))

    return ds.map_batches(pick, batch_format="pyarrow", batch_size=None)


@query(
    "text_log_odds_words",
    """
WITH words AS (
  SELECT lang = 'en' AS grp_a, unnest(string_split(text, ' ')) AS w
  FROM documents
), wc AS (
  SELECT w,
         CAST(SUM(CASE WHEN grp_a THEN 1 ELSE 0 END) AS BIGINT) AS ya,
         CAST(SUM(CASE WHEN grp_a THEN 0 ELSE 1 END) AS BIGINT) AS yb
  FROM words GROUP BY 1
), tot AS (
  SELECT SUM(ya) AS na, SUM(yb) AS nb, SUM(ya + yb) AS n FROM wc
), z AS (
  SELECT wc.w, wc.ya, wc.yb,
         (ln((wc.ya + 1000.0 * (wc.ya + wc.yb) / tot.n)
             / (tot.na + 1000.0 - wc.ya - 1000.0 * (wc.ya + wc.yb) / tot.n))
        - ln((wc.yb + 1000.0 * (wc.ya + wc.yb) / tot.n)
             / (tot.nb + 1000.0 - wc.yb - 1000.0 * (wc.ya + wc.yb) / tot.n)))
         / sqrt(1.0 / (wc.ya + 1000.0 * (wc.ya + wc.yb) / tot.n)
              + 1.0 / (wc.yb + 1000.0 * (wc.ya + wc.yb) / tot.n)) AS zv
  FROM wc CROSS JOIN tot
)
SELECT w, ya, yb, CAST(FLOOR(1000 * zv) AS BIGINT) AS z_milli
FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY zv DESC, w) AS rn FROM z)
WHERE rn <= 30""",
)
def text_log_odds_words(sf_dir: str):
    """Discriminative-word mining between two subcorpora (Monroe et al.
    2008 "Fightin' Words": log-odds ratio with informative Dirichlet
    prior, z-scored) — which words characterize the English slice vs
    the rest; the standard corpus-comparison diagnostic.

    ONE masked word-count aggregate yields both group counts per word
    (the DSIR kernel shape); the z computation runs on the
    vocab-bounded table; selection is top-k. Corpus streams once,
    shuffle-free. Prior strength a0=1000, prior = corpus distribution."""
    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate_ds

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["lang", "text"])

    def wcounts(b: pa.Table) -> pa.Table:
        split = pc.split_pattern(b["text"].combine_chunks(), " ")
        lens = np.asarray(pc.list_value_length(split), dtype=np.int64)
        flat = split.flatten().dictionary_encode()
        codes = np.asarray(flat.indices, dtype=np.int64)
        is_a = np.repeat(
            np.asarray(pc.equal(b["lang"].combine_chunks(),
                                pa.scalar("en"))), lens)
        nv = len(flat.dictionary)
        ya = np.bincount(codes[is_a], minlength=nv)
        yb = np.bincount(codes[~is_a], minlength=nv)
        return pa.table({"w": flat.dictionary,
                         "ya": pa.array(ya.astype(np.int64)),
                         "yb": pa.array(yb.astype(np.int64))})

    wc = grouped_aggregate_ds(
        ds.map_batches(wcounts, batch_format="pyarrow", batch_size=None),
        ["w"], [("ya", "sum", "ya"), ("yb", "sum", "yb")]).to_pandas()
    ya = wc["ya"].to_numpy().astype(np.float64)
    yb = wc["yb"].to_numpy().astype(np.float64)
    na, nb = ya.sum(), yb.sum()
    n = na + nb
    a0 = 1000.0
    pw = a0 * (ya + yb) / n
    delta = (np.log((ya + pw) / (na + a0 - ya - pw))
             - np.log((yb + pw) / (nb + a0 - yb - pw)))
    z = delta / np.sqrt(1.0 / (ya + pw) + 1.0 / (yb + pw))
    wc["zv"] = z
    top = wc.sort_values(["zv", "w"], ascending=[False, True],
                         kind="mergesort").head(30)
    return pa.table({
        "w": pa.array(top["w"], pa.string()),
        "ya": pa.array(top["ya"].to_numpy().astype(np.int64)),
        "yb": pa.array(top["yb"].to_numpy().astype(np.int64)),
        "z_milli": pa.array(np.floor(1000 * top["zv"].to_numpy())
                            .astype(np.int64)),
    })


@query(
    "part_unpivot",
    """
SELECT p_partkey, 'p_size' AS attr,
       CAST(p_size AS DOUBLE) AS value FROM part
UNION ALL
SELECT p_partkey, 'p_retailprice' AS attr, p_retailprice FROM part""",
)
def part_unpivot(sf_dir: str):
    """Unpivot (wide → long / melt): numeric attribute columns become
    (key, attr, value) rows — the inverse of `events_user_pivot`, the
    form feature stores and long-format analytics consume. Pure
    row-local reshaping: each batch emits its melted rows in place, no
    exchange; output is exactly rows × n_attrs."""
    import pyarrow.compute as pc
    import ray.data as rd

    ATTRS = ["p_size", "p_retailprice"]
    ds = rd.read_parquet(f"{sf_dir}/part.parquet",
                         columns=["p_partkey"] + ATTRS)

    def melt(b: pa.Table) -> pa.Table:
        keys, attrs, vals = [], [], []
        for a in ATTRS:
            keys.append(b["p_partkey"].combine_chunks())
            attrs.append(pa.array([a] * b.num_rows, pa.string()))
            vals.append(pc.cast(b[a].combine_chunks(), pa.float64()))
        return pa.table({
            "p_partkey": pa.concat_arrays(keys),
            "attr": pa.concat_arrays(attrs),
            "value": pa.concat_arrays(vals),
        })

    return ds.map_batches(melt, batch_format="pyarrow", batch_size=None)


@query(
    "lineitem_corr",
    """
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(FLOOR(1e6 * CORR(l_quantity, l_extendedprice)) AS BIGINT)
         AS corr_micro
FROM lineitem GROUP BY 1""",
)
def lineitem_corr(sf_dir: str):
    """Grouped Pearson correlation (quantity vs price per return flag —
    the drift/sanity statistic a metrics pipeline tracks): five moment
    sums per key through the partial+tree aggregate, closed-form
    finish; same exchange shape as `events_user_trend`."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_returnflag", "l_quantity",
                                  "l_extendedprice"])

    def moments(b: pa.Table) -> pa.Table:
        x = np.asarray(b["l_quantity"].combine_chunks(), dtype=np.float64)
        y = np.asarray(b["l_extendedprice"].combine_chunks(),
                       dtype=np.float64)
        return pa.table({
            "l_returnflag": b["l_returnflag"],
            "x": pa.array(x), "y": pa.array(y),
            "xy": pa.array(x * y), "xx": pa.array(x * x),
            "yy": pa.array(y * y),
        })

    agg = grouped_aggregate(
        ds.map_batches(moments, batch_format="pyarrow", batch_size=None),
        ["l_returnflag"],
        [("*", "count", "n"), ("x", "sum", "sx"), ("y", "sum", "sy"),
         ("xy", "sum", "sxy"), ("xx", "sum", "sxx"),
         ("yy", "sum", "syy")]).to_pandas()
    n = agg["n"].to_numpy().astype(np.float64)
    sx, sy = agg["sx"].to_numpy(), agg["sy"].to_numpy()
    sxy, sxx, syy = (agg["sxy"].to_numpy(), agg["sxx"].to_numpy(),
                     agg["syy"].to_numpy())
    cov = sxy - sx * sy / n
    corr = cov / np.sqrt((sxx - sx * sx / n) * (syy - sy * sy / n))
    return pa.table({
        "l_returnflag": pa.array(agg["l_returnflag"], pa.string()),
        "n": pa.array(agg["n"].to_numpy().astype(np.int64)),
        "corr_micro": pa.array(np.floor(1e6 * corr).astype(np.int64)),
    })


@query(
    "events_type_drift",
    """
WITH e AS (
  SELECT event_type, CAST(day(ts) > 15 AS BOOLEAN) AS h2 FROM events
), c AS (
  SELECT event_type,
         CAST(SUM(CASE WHEN h2 THEN 0 ELSE 1 END) AS BIGINT) AS c1,
         CAST(SUM(CASE WHEN h2 THEN 1 ELSE 0 END) AS BIGINT) AS c2
  FROM e GROUP BY 1
), t AS (SELECT SUM(c1) AS n1, SUM(c2) AS n2 FROM c),
d AS (
  SELECT c.event_type, c.c1, c.c2,
         c.c1 * 1.0 / t.n1 AS p, c.c2 * 1.0 / t.n2 AS q
  FROM c CROSS JOIN t
)
SELECT event_type, c1, c2,
       CAST(FLOOR(1e6 * (
         CASE WHEN p > 0 THEN 0.5 * p * ln(p / ((p + q) / 2)) ELSE 0 END
       + CASE WHEN q > 0 THEN 0.5 * q * ln(q / ((p + q) / 2)) ELSE 0 END))
         AS BIGINT) AS js_contrib_micro
FROM d""",
)
def events_type_drift(sf_dir: str):
    """Distribution-drift detection between two periods (first vs
    second half of the month): per-type Jensen-Shannon divergence
    contributions of the event-type mix — the production monitoring
    check that a pipeline's traffic composition shifted.

    One (type, half)-keyed count aggregate (types-bounded); the JS
    terms compute on the tiny table driver-side. Corpus streams once,
    shuffle-free — the same cells-bounded shape as the chi-square
    audit."""
    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts"])

    def half(b: pa.Table) -> pa.Table:
        day = np.asarray(pc.day(b["ts"].combine_chunks()), dtype=np.int64)
        return pa.table({"event_type": b["event_type"],
                         "h2": pa.array(day > 15)})

    c = grouped_aggregate(
        ds.map_batches(half, batch_format="pyarrow", batch_size=None),
        ["event_type", "h2"], [("*", "count", "n")]).to_pandas()
    piv = c.pivot_table(index="event_type", columns="h2", values="n",
                        fill_value=0, aggfunc="sum")
    c1 = piv.get(False, 0)
    c2 = piv.get(True, 0)
    import pandas as pd

    out = pd.DataFrame({"event_type": piv.index,
                        "c1": np.asarray(c1, dtype=np.int64),
                        "c2": np.asarray(c2, dtype=np.int64)})
    p = out["c1"] / out["c1"].sum()
    q = out["c2"] / out["c2"].sum()
    m = (p + q) / 2
    js = (0.5 * np.where(p > 0, p * np.log(np.where(p > 0, p, 1) / m), 0)
          + 0.5 * np.where(q > 0, q * np.log(np.where(q > 0, q, 1) / m), 0))
    return pa.table({
        "event_type": pa.array(out["event_type"], pa.string()),
        "c1": pa.array(out["c1"]),
        "c2": pa.array(out["c2"]),
        "js_contrib_micro": pa.array(np.floor(1e6 * js).astype(np.int64)),
    })


@query(
    "events_cohort_retention",
    """
WITH f AS (
  SELECT user_id,
         CAST(FLOOR(epoch(MIN(ts)) / 604800) AS BIGINT) AS cohort_wk
  FROM events GROUP BY 1
), a AS (
  SELECT DISTINCT e.user_id, f.cohort_wk,
         CAST(FLOOR(epoch(e.ts) / 604800) AS BIGINT) - f.cohort_wk
           AS wk_offset
  FROM events e JOIN f USING (user_id)
)
SELECT cohort_wk, wk_offset, COUNT(*) AS n_users
FROM a GROUP BY 1, 2""",
)
def events_cohort_retention(sf_dir: str):
    """Cohort retention matrix (the product-analytics staple): users
    cohorted by first-activity week; cell (cohort, offset) = distinct
    users from that cohort active offset weeks later.

    Three keyed passes, all high-cardinality-safe: per-user first-event
    week (hash-partitioned min), broadcast-free hash join of events to
    their user's cohort (native Dataset.join), then batch-distinct
    (user, cohort, offset) partials into the hash-partitioned distinct
    — the final matrix is cohorts×offsets-bounded."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate, grouped_aggregate_ds

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])

    def week(b: pa.Table) -> pa.Table:
        t = (np.asarray(b["ts"].combine_chunks())
             .astype("datetime64[us]").astype(np.int64))
        wk = np.floor(t / 1e6 / 604800).astype(np.int64)
        return pa.table({"user_id": b["user_id"], "wk": pa.array(wk)})

    wks = ds.map_batches(week, batch_format="pyarrow", batch_size=None)
    first = grouped_aggregate_ds(wks, ["user_id"],
                                 [("wk", "min", "cohort_wk")])
    joined = wks.join(first, join_type="inner", num_partitions=8,
                      on=("user_id",))

    def offs(b: pa.Table) -> pa.Table:
        wk = np.asarray(b["wk"].combine_chunks(), dtype=np.int64)
        cw = np.asarray(b["cohort_wk"].combine_chunks(), dtype=np.int64)
        uid = np.asarray(b["user_id"].combine_chunks(), dtype=np.int64)
        # batch-level distinct compresses before the exchange
        key = np.stack([uid, cw, wk - cw], axis=1)
        uniq = np.unique(key, axis=0)
        return pa.table({
            "user_id": pa.array(uniq[:, 0]),
            "cohort_wk": pa.array(uniq[:, 1]),
            "wk_offset": pa.array(uniq[:, 2]),
        })

    distinct = grouped_aggregate_ds(
        joined.map_batches(offs, batch_format="pyarrow", batch_size=None),
        ["user_id", "cohort_wk", "wk_offset"], [("*", "count", "_c")])
    out = grouped_aggregate(distinct, ["cohort_wk", "wk_offset"],
                            [("*", "count", "n_users")])
    return out


@query(
    "events_user_gini",
    """
WITH c AS (
  SELECT user_id, COUNT(*) AS n FROM events GROUP BY 1
), r AS (
  SELECT n, ROW_NUMBER() OVER (ORDER BY n, user_id) AS i FROM c
), t AS (
  SELECT COUNT(*) AS k, SUM(n) AS s, SUM(i * n) AS sin FROM r
)
SELECT CAST(FLOOR(1e6 * (2.0 * sin / (k * s) - (k + 1.0) / k)) AS BIGINT)
         AS gini_micro,
       k AS n_users, CAST(s AS BIGINT) AS n_events
FROM t""",
)
def events_user_gini(sf_dir: str):
    """Activity-concentration (Gini coefficient of events per user —
    the skew/inequality audit: is the corpus dominated by a few heavy
    hitters?). Computed exactly WITHOUT sorting users: per-user counts
    hash-partition, then only the count-of-counts histogram (bounded by
    distinct activity levels) reaches the driver; the sorted-rank Gini
    formula evaluates on the histogram via cumulative arithmetic —
    ties take consecutive ranks, whose contribution depends only on
    the tie block's rank span, so the histogram form is exact."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate, grouped_aggregate_ds

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    per_user = grouped_aggregate_ds(ds, ["user_id"],
                                    [("*", "count", "n")])
    hist = grouped_aggregate(per_user, ["n"],
                             [("*", "count", "m")]).to_pandas()
    hist = hist.sort_values("n")
    n = hist["n"].to_numpy().astype(np.float64)
    m = hist["m"].to_numpy().astype(np.float64)
    k = m.sum()
    s = (n * m).sum()
    # ranks within a tie block of size m at cumulative start c0:
    # sum of ranks = m*c0 + m(m+1)/2 ; contribution = n * that sum
    c0 = np.concatenate([[0.0], np.cumsum(m)[:-1]])
    sin = (n * (m * c0 + m * (m + 1) / 2)).sum()
    gini = 2.0 * sin / (k * s) - (k + 1.0) / k
    return pa.table({
        "gini_micro": pa.array([int(np.floor(1e6 * gini))], pa.int64()),
        "n_users": pa.array([int(k)], pa.int64()),
        "n_events": pa.array([int(s)], pa.int64()),
    })


@query(
    "events_gap_quantiles",
    """
WITH o AS (
  SELECT event_type, epoch_us(ts) AS t,
         LAG(epoch_us(ts)) OVER (PARTITION BY event_type
                                 ORDER BY ts, event_id) AS prev
  FROM events
), g AS (
  SELECT event_type, CAST(FLOOR((t - prev) / 1000000.0) AS BIGINT)
           AS gap_sec
  FROM o WHERE prev IS NOT NULL
)
SELECT event_type,
       quantile_disc(gap_sec, 0.5) AS p50,
       quantile_disc(gap_sec, 0.95) AS p95,
       quantile_disc(gap_sec, 0.99) AS p99
FROM g GROUP BY 1""",
)
def events_gap_quantiles(sf_dir: str):
    """Inter-arrival-time distribution per event type (the latency /
    traffic-cadence percentiles every log pipeline dashboards): gaps
    from one segmented-diff pass per hash partition (complete types per
    partition, arrival order by (ts, event_id)), quantized to whole
    seconds (bounded distinct values — the exact-quantile histogram
    contract), then the distributed quantile kernel."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import partitioned_group_apply
    from raylog.functions.quantile import grouped_quantiles

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "event_id", "ts"])

    def gaps(part: pa.Table) -> pa.Table:
        def col(name):
            c = part[name]
            return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c

        typ = np.asarray(col("event_type"))
        eid = np.asarray(col("event_id"), dtype=np.int64)
        t = np.asarray(col("ts")).astype("datetime64[us]").astype(np.int64)
        n = len(typ)
        if n == 0:
            return pa.table({"event_type": pa.array([], pa.string()),
                             "gap_sec": pa.array([], pa.int64())})
        order = np.lexsort((eid, t, typ))
        typ_s, t_s = typ[order], t[order]
        same = np.zeros(n, dtype=bool)
        same[1:] = typ_s[1:] == typ_s[:-1]
        gap = np.empty(n, dtype=np.int64)
        gap[1:] = np.floor((t_s[1:] - t_s[:-1]) / 1e6).astype(np.int64)
        keep = same
        return pa.table({
            "event_type": pa.array(typ_s[keep]),
            "gap_sec": pa.array(gap[keep]),
        })

    gds = partitioned_group_apply(ds, ["event_type"], gaps)
    return grouped_quantiles(gds, key="event_type", value="gap_sec",
                             ps=[0.5, 0.95, 0.99],
                             out_names=["p50", "p95", "p99"])




@query(
    "template_cap_sample",
    _P() + """
, t AS (
  SELECT doc_id,
         regexp_replace(regexp_replace(regexp_replace(log,
           '[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}',
           '<id>', 'g'),
           '\\b[0-9a-f]{16}\\b', '<hex>', 'g'),
           '\\b[0-9]+\\b', '<n>', 'g') AS template
  FROM recs2
)
SELECT template, doc_id, CAST(rn AS BIGINT) AS rank FROM (
  SELECT template, doc_id,
         ROW_NUMBER() OVER (PARTITION BY template ORDER BY doc_id) AS rn
  FROM t
) WHERE rn <= 3""",
)
def template_cap_sample(sf_dir: str):
    """Over-represented-template downsampling (the anti-boilerplate
    sampling step of a pretraining pipeline): mine the log template of
    every line (same three chained RE2 masks as `log_templates` —
    pyarrow and DuckDB share RE2, bit-identical), then keep at most 3
    docs per template, lowest doc_id first (deterministic). The cap is
    a grouped partial top-k — every block emits ≤3 rows per template
    it saw, the merge re-caps — so exchange is templates×blocks
    bounded, never corpus-sized."""
    import pyarrow.compute as pc

    from raylog.functions import topk as tk
    from raylog.pipelines import log_pipeline as LP

    ds = LP.parsed_ds(LP.records_ds(sf_dir))

    def mask(b: pa.Table) -> pa.Table:
        t = b["log"]
        t = pc.replace_substring_regex(
            t,
            pattern="[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}"
                    "-[0-9a-f]{12}",
            replacement="<id>")
        t = pc.replace_substring_regex(t, pattern=r"\b[0-9a-f]{16}\b",
                                       replacement="<hex>")
        t = pc.replace_substring_regex(t, pattern=r"\b[0-9]+\b",
                                       replacement="<n>")
        return pa.table({"template": t, "doc_id": b["doc_id"]})

    masked = ds.map_batches(mask, batch_format="pyarrow", batch_size=None)
    return tk.topk(
        masked, sort_cols=["doc_id"], descending=[False], k=3,
        group_cols=["template"], add_rank="rank",
    )



# --------------------------------------------------------------------------
# Distributed prefix scan over session boundaries: peak concurrency +
# load-duration curve
# --------------------------------------------------------------------------

_SESSION_GAP_US = 1_800_000_000

_CONC_ORACLE_BODY = """
WITH e AS (
  SELECT user_id, event_id, CAST(epoch_us(ts) AS BIGINT) AS t
  FROM events
), d AS (
  SELECT *, CASE WHEN t - LAG(t) OVER (PARTITION BY user_id
                                       ORDER BY t, event_id)
                      > 1800000000
                   OR LAG(t) OVER (PARTITION BY user_id
                                   ORDER BY t, event_id) IS NULL
                 THEN 1 ELSE 0 END AS new_session
  FROM e
), s AS (
  SELECT *, SUM(new_session) OVER (PARTITION BY user_id
                                   ORDER BY t, event_id
                                   ROWS UNBOUNDED PRECEDING)
              AS session_no
  FROM d
), iv AS (
  SELECT user_id, session_no, MIN(t) AS lo, MAX(t) AS hi
  FROM s GROUP BY 1, 2
), b AS (
  SELECT lo AS ts_us, 1 AS delta FROM iv
  UNION ALL SELECT hi, -1 FROM iv
)"""


def _boundary_bins(sf_dir: str, num_bins: int = 64):
    """Session-boundary rows bucketed by VALUE into ``num_bins``
    contiguous skey ranges — the explicit stand-in for a global sort
    whose block→position mapping the scan needs.

    skey = ts_us*2 + (0 start | 1 end): starts order before ends at
    the same instant (closed intervals — a session ending exactly when
    another starts still overlaps it). A cheap scalar min/max pre-pass
    fixes uniform bin edges; every row maps to exactly ONE bin, so bin
    id IS the block's global position and the driver can turn per-bin
    Δ-sums into exact exclusive offsets — no reliance on opaque block
    identity, and equal keys can never straddle an ordering boundary.
    The exchange is 2×16 B per session, bounded well below the event
    stream."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import partitioned_group_apply

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_id", "ts"])

    def bounds(part: pa.Table) -> pa.Table:
        def col(name):
            c = part[name]
            return (c.combine_chunks()
                    if isinstance(c, pa.ChunkedArray) else c)

        user = np.asarray(col("user_id"))
        t = np.asarray(col("ts")).astype("datetime64[us]").astype(
            np.int64)
        eid = np.asarray(col("event_id"), dtype=np.int64)
        n = len(user)
        if n == 0:
            return pa.table({"skey": pa.array([], pa.int64())})
        order = np.lexsort((eid, t, user))
        user, t = user[order], t[order]
        new = np.ones(n, dtype=bool)
        new[1:] = ((user[1:] != user[:-1])
                   | ((t[1:] - t[:-1]) > _SESSION_GAP_US))
        sstarts = np.flatnonzero(new)
        sends = np.concatenate([sstarts[1:], [n]]) - 1
        lo, hi = t[sstarts], t[sends]
        return pa.table({
            "skey": pa.array(np.concatenate([lo * 2, hi * 2 + 1])),
        })

    b = partitioned_group_apply(ds, ["user_id"], bounds,
                                num_partitions=8)

    from raylog.functions.agg import grouped_aggregate

    def minmax(t: pa.Table) -> pa.Table:
        sk = np.asarray(t["skey"].combine_chunks()
                        if isinstance(t["skey"], pa.ChunkedArray)
                        else t["skey"], dtype=np.int64)
        return pa.table({
            "g": pa.array([0], pa.int64()),
            "lo": pa.array([int(sk.min())], pa.int64()),
            "hi": pa.array([int(sk.max())], pa.int64()),
        })

    mm = grouped_aggregate(
        b.map_batches(minmax, batch_format="pyarrow", batch_size=None),
        ["g"], [("lo", "min", "lo"), ("hi", "max", "hi")])
    if "lo" not in mm.column_names or len(mm) == 0:
        return None, num_bins  # empty event stream
    lo, hi = int(mm["lo"][0].as_py()), int(mm["hi"][0].as_py())
    span = max(hi - lo + 1, 1)

    def binify(t: pa.Table) -> pa.Table:
        sk = np.asarray(t["skey"].combine_chunks()
                        if isinstance(t["skey"], pa.ChunkedArray)
                        else t["skey"], dtype=np.int64)
        bn = np.minimum((sk - lo) * num_bins // span, num_bins - 1)
        return pa.table({"bin": pa.array(bn), "skey": pa.array(sk)})

    return b.map_batches(binify, batch_format="pyarrow",
                         batch_size=None), num_bins


def _scan_bins(sf_dir: str):
    """Run the per-bin scan pass: returns a pandas frame with one meta
    row per non-empty bin (kind 0: bin, dsum, lmax, ts_at local
    first-argmax, n, first_ts, last_ts) and per-(bin, LOCAL level)
    duration partials (kind 1)."""
    import numpy as np

    from raylog.functions.agg import partitioned_group_apply

    binned, _ = _boundary_bins(sf_dir)
    if binned is None:  # empty event stream
        import pandas as pd

        return pd.DataFrame({c: pd.Series([], dtype="int64")
                             for c in ("kind", "bin", "level", "dur_us",
                                       "dsum", "lmax", "ts_at", "n")})

    def scan(part: pa.Table) -> pa.Table:
        bn = np.asarray(part["bin"].combine_chunks()
                        if isinstance(part["bin"], pa.ChunkedArray)
                        else part["bin"], dtype=np.int64)
        sk = np.asarray(part["skey"].combine_chunks()
                        if isinstance(part["skey"], pa.ChunkedArray)
                        else part["skey"], dtype=np.int64)
        out = {c: [] for c in ("kind", "bin", "level", "dur_us",
                               "dsum", "lmax", "ts_at", "n")}
        order = np.lexsort((sk, bn))
        bn, sk = bn[order], sk[order]
        starts = np.concatenate(
            [[0], np.flatnonzero(bn[1:] != bn[:-1]) + 1, [len(bn)]])
        for i in range(len(starts) - 1):
            s, e = starts[i], starts[i + 1]
            skb = sk[s:e]
            delta = np.where(skb & 1 == 0, 1, -1).astype(np.int64)
            pre = np.cumsum(delta)
            ts = skb >> 1
            apos = int(np.argmax(pre))
            out["kind"].append(0)
            out["bin"].append(int(bn[s]))
            out["level"].append(int(ts[0]))    # meta: first_ts
            out["dur_us"].append(int(ts[-1]))  # meta: last_ts
            out["dsum"].append(int(pre[-1]))
            out["lmax"].append(int(pre.max()))
            out["ts_at"].append(int(ts[apos]))
            out["n"].append(int(e - s))
            gaps = ts[1:] - ts[:-1]
            keep = gaps > 0
            if keep.any():
                ul, inv = np.unique(pre[:-1][keep], return_inverse=True)
                dur = np.zeros(len(ul), dtype=np.int64)
                np.add.at(dur, inv, gaps[keep])
                for u, dv in zip(ul, dur):
                    out["kind"].append(1)
                    out["bin"].append(int(bn[s]))
                    out["level"].append(int(u))
                    out["dur_us"].append(int(dv))
                    out["dsum"].append(0)
                    out["lmax"].append(0)
                    out["ts_at"].append(0)
                    out["n"].append(0)
        return pa.table({k: pa.array(v, pa.int64())
                         for k, v in out.items()})

    return partitioned_group_apply(binned, ["bin"], scan,
                                   num_partitions=8).to_pandas()


@query(
    "events_peak_concurrency",
    _CONC_ORACLE_BODY + """
, r AS (
  SELECT ts_us, SUM(delta) OVER (ORDER BY ts_us, delta DESC
                                 ROWS UNBOUNDED PRECEDING) AS conc
  FROM b
), m AS (SELECT MAX(conc) AS mx FROM r)
SELECT CAST(m.mx AS BIGINT) AS peak_concurrency,
       CAST(MIN(r.ts_us) FILTER (WHERE r.conc = m.mx) AS BIGINT)
         AS peak_at_us,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM iv) AS n_intervals
FROM r, m GROUP BY m.mx""",
)
def events_peak_concurrency(sf_dir: str):
    """Maximum number of simultaneously active sessions (30-min-gap
    sessions) and the first instant it is reached — the
    capacity-planning number a 100 TB ingest sizes its collectors by.

    A true DISTRIBUTED prefix scan (unlike the repo's days-bounded
    driver cumsums): boundaries bucket by value into ordered key-range
    bins, each bin reduces map-side to (Δ-sum, local running max,
    first-argmax ts), and the driver turns the bins-bounded Δ-sums
    into exact exclusive offsets — global peak = max(offset + local
    max), earliest attaining bin supplies the timestamp. Bin id gives
    the scan its total order, so no opaque-block-identity assumption
    and equal keys can never straddle an ordering boundary."""
    import numpy as np

    rows = _scan_bins(sf_dir)
    meta = rows[rows["kind"] == 0].sort_values("bin")
    if len(meta) == 0:  # empty event stream: oracle returns 0 rows
        z = pa.array([], pa.int64())
        return pa.table({"peak_concurrency": z, "peak_at_us": z,
                         "n_intervals": z})
    dsum = meta["dsum"].to_numpy(np.int64)
    off = np.concatenate([[0], np.cumsum(dsum)[:-1]])
    glob = off + meta["lmax"].to_numpy(np.int64)
    peak = int(glob.max())
    first = int(np.argmax(glob == peak))
    return pa.table({
        "peak_concurrency": pa.array([peak], pa.int64()),
        "peak_at_us": pa.array(
            [int(meta["ts_at"].to_numpy(np.int64)[first])], pa.int64()),
        "n_intervals": pa.array([int(meta["n"].sum()) // 2], pa.int64()),
    })


@query(
    "events_concurrency_histogram",
    _CONC_ORACLE_BODY + """
, r AS (
  SELECT SUM(delta) OVER (ORDER BY ts_us, delta DESC
                          ROWS UNBOUNDED PRECEDING) AS conc,
         LEAD(ts_us) OVER (ORDER BY ts_us, delta DESC) - ts_us AS dur
  FROM b
)
SELECT CAST(conc AS BIGINT) AS level,
       CAST(SUM(dur) AS BIGINT) AS dur_us
FROM r WHERE dur IS NOT NULL
GROUP BY 1 HAVING SUM(dur) > 0""",
)
def events_concurrency_histogram(sf_dir: str):
    """Load-duration curve: total time spent at each session-
    concurrency level (area under the concurrency staircase — the
    metric behind percentile-based capacity sizing).

    Same bin scan as `events_peak_concurrency`, richer payload: each
    bin emits (LOCAL level → duration) partials from one diff/
    segment-sum pass; the driver shifts each bin's levels by its
    exclusive offset, adds the inter-bin gap at the boundary level,
    and combines. Output bounded by the peak level; zero-duration
    transient levels drop on both sides (oracle HAVING > 0)."""
    import numpy as np

    rows = _scan_bins(sf_dir)
    meta = rows[rows["kind"] == 0].sort_values("bin").reset_index(
        drop=True)
    if len(meta) == 0:  # empty event stream
        z = pa.array([], pa.int64())
        return pa.table({"level": z, "dur_us": z})
    dsum = meta["dsum"].to_numpy(np.int64)
    off = np.concatenate([[0], np.cumsum(dsum)[:-1]])
    off_by_bin = dict(zip(meta["bin"].astype(int), off))
    lv = rows[rows["kind"] == 1]
    acc: dict[int, int] = {}
    for b_, l_, d_ in zip(lv["bin"].astype(int),
                          lv["level"].astype(int),
                          lv["dur_us"].astype(int)):
        g = l_ + off_by_bin[b_]
        acc[g] = acc.get(g, 0) + d_
    # inter-bin gaps: from bin i's last ts to bin i+1's first ts at
    # the level reached at bin i's end (= exclusive offset of i+1)
    first_ts = meta["level"].to_numpy(np.int64)
    last_ts = meta["dur_us"].to_numpy(np.int64)
    for i in range(len(meta) - 1):
        gap = int(first_ts[i + 1] - last_ts[i])
        if gap > 0:
            g = int(off[i + 1])
            acc[g] = acc.get(g, 0) + gap
    levels = sorted(k for k, v in acc.items() if v > 0)
    return pa.table({
        "level": pa.array(levels, pa.int64()),
        "dur_us": pa.array([acc[k] for k in levels], pa.int64()),
    })


# --------------------------------------------------------------------------
# Session-duration percentiles (engagement SLO)
# --------------------------------------------------------------------------

@query(
    "events_session_quantiles",
    """
WITH e AS (
  SELECT user_id, event_id, epoch(ts) AS t FROM events
), d AS (
  SELECT *, CASE WHEN t - LAG(t) OVER (PARTITION BY user_id ORDER BY t, event_id)
                      > 1800 OR LAG(t) OVER (PARTITION BY user_id ORDER BY t, event_id) IS NULL
                 THEN 1 ELSE 0 END AS new_session
  FROM e
), s AS (
  SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY t, event_id
                                   ROWS UNBOUNDED PRECEDING) AS session_no
  FROM d
), dur AS (
  SELECT CAST(FLOOR(MAX(t) - MIN(t)) AS BIGINT) AS duration_sec
  FROM s GROUP BY user_id, session_no
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
       quantile_disc(duration_sec, 0.5) AS p50,
       quantile_disc(duration_sec, 0.9) AS p90,
       quantile_disc(duration_sec, 0.99) AS p99
FROM dur""",
)
def events_session_quantiles(sf_dir: str):
    """Session-duration percentiles (the engagement-SLO cut of the
    sessionize kernel): 30-min-gap sessions per user, duration
    second-quantized, exact global p50/p90/p99.

    Sessions derive in the one partitioned sessionize pass; durations
    compress to a (distinct-seconds)-bounded count histogram via the
    hash-partitioned combine, and the exact disc-quantile rule
    (ceil(p·n), the `grouped_quantiles` contract) finishes on that
    tiny table driver-side — session rows never collect anywhere."""
    import numpy as np

    from raylog.functions.agg import grouped_aggregate

    sess = events_sessionize(sf_dir).select_columns(["duration_sec"])
    hist = grouped_aggregate(sess, ["duration_sec"],
                             [("*", "count", "cnt")]).to_pandas()
    if len(hist) == 0:
        none = pa.array([None], pa.int64())
        return pa.table({"n_sessions": pa.array([0], pa.int64()),
                         "p50": none, "p90": none, "p99": none})
    hist = hist.sort_values("duration_sec")
    v = hist["duration_sec"].to_numpy(dtype=np.int64)
    c = np.cumsum(hist["cnt"].to_numpy(dtype=np.int64))
    n = int(c[-1])
    out = {"n_sessions": pa.array([n], pa.int64())}
    for p, nm in [(0.5, "p50"), (0.9, "p90"), (0.99, "p99")]:
        target = max(int(np.ceil(p * n)), 1)
        out[nm] = pa.array([int(v[np.searchsorted(c, target, "left")])],
                           pa.int64())
    return pa.table(out)


# --------------------------------------------------------------------------
# Power-law exponent of user activity (Clauset MLE)
# --------------------------------------------------------------------------

@query(
    "events_powerlaw_alpha",
    """
WITH u AS (
  SELECT user_id, COUNT(*) AS n FROM events GROUP BY 1
), q AS (
  SELECT n FROM u WHERE n >= 2
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
       1.0 + COUNT(*) / SUM(ln(n / 1.5)) AS alpha
FROM q""",
)
def events_powerlaw_alpha(sf_dir: str):
    """Maximum-likelihood power-law exponent of the per-user activity
    distribution (Clauset/Shalizi/Newman continuous-MLE form with
    xmin=2, the discrete -0.5 offset): how heavy the heavy-tail is —
    the skew forecast every capacity plan needs.

    Per-user counts via the hash-partitioned combine; the MLE needs
    only (count of qualifying users, Σ ln(n/1.5)) — the count table
    compresses to a count-of-counts histogram (bounded by distinct
    activity levels) before any ln, so the driver sees activity
    levels, never users."""
    import numpy as np

    from raylog.functions.agg import grouped_aggregate, grouped_aggregate_ds

    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    per_user = grouped_aggregate_ds(ds, ["user_id"], [("*", "count", "n")])
    hist = grouped_aggregate(per_user, ["n"],
                             [("*", "count", "m")]).to_pandas()
    if "n" in hist.columns:  # empty aggregate drops the key column
        hist = hist[hist["n"] >= 2]
    if "n" not in hist.columns or len(hist) == 0:
        return pa.table({"n_users": pa.array([0], pa.int64()),
                         "alpha": pa.array([None], pa.float64())})
    n = hist["n"].to_numpy(dtype=np.float64)
    m = hist["m"].to_numpy(dtype=np.float64)
    k = m.sum()
    lnsum = (m * np.log(n / 1.5)).sum()
    return pa.table({
        "n_users": pa.array([int(k)], pa.int64()),
        "alpha": pa.array([1.0 + k / lnsum], pa.float64()),
    })


# --------------------------------------------------------------------------
# Curriculum training order (easy→hard, shuffled within difficulty)
# --------------------------------------------------------------------------

@query(
    "docs_curriculum_rank",
    """
SELECT doc_id,
       CAST(ROW_NUMBER() OVER (
         ORDER BY LEAST(n_chars // 100, 9),
                  md5(CAST(doc_id AS VARCHAR)), doc_id) - 1 AS BIGINT)
         AS curriculum_rank
FROM documents""",
)
def docs_curriculum_rank(sf_dir: str):
    """Curriculum training order: short (easy) documents first, hard
    ones last, deterministically shuffled WITHIN each difficulty band —
    the curriculum-learning permutation, resumable because it is a pure
    function of (n_chars, doc_id).

    Same sort-free plan as `docs_shuffle_rank`, with the difficulty
    band prepended to the range key: partition = band×256 md5 buckets
    (2,560-bounded count offsets tree-merged exactly), each partition
    ranks only its own complete buckets and adds the offset. One
    key-partitioned exchange; no global sort."""
    import hashlib

    import numpy as np
    import ray
    import ray.data as rd

    from raylog.functions.agg import (grouped_aggregate,
                                      partitioned_group_apply)

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "n_chars"])

    def keyed(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_pylist()
        nc = np.asarray(b["n_chars"].combine_chunks(), dtype=np.int64)
        band = np.minimum(nc // 100, 9)
        keys = [hashlib.md5(str(i).encode()).hexdigest() for i in ids]
        b256 = np.array([int(k[:2], 16) for k in keys], dtype=np.int64)
        return pa.table({"doc_id": b["doc_id"],
                         "key": pa.array(keys, pa.string()),
                         "bucket": pa.array(band * 256 + b256)})

    kds = ds.map_batches(keyed, batch_format="pyarrow", batch_size=None)
    counts = grouped_aggregate(kds, ["bucket"],
                               [("*", "count", "c")]).to_pandas()
    counts = counts.sort_values("bucket")
    offsets = np.zeros(2560, dtype=np.int64)
    off = 0
    for r in counts.itertuples():
        offsets[int(r.bucket)] = off
        off += int(r.c)
    off_ref = ray.put(offsets) if ray.is_initialized() else offsets

    def rank_partition(part: pa.Table) -> pa.Table:
        offs = ray.get(off_ref) if ray.is_initialized() else off_ref
        key = np.asarray(part["key"].combine_chunks(), dtype="U")
        ids = np.asarray(part["doc_id"].combine_chunks(), dtype=np.int64)
        bkt = np.asarray(part["bucket"].combine_chunks(), dtype=np.int64)
        order = np.lexsort((ids, key, bkt))
        b_sorted = bkt[order]
        starts = np.ones(len(b_sorted), dtype=bool)
        starts[1:] = b_sorted[1:] != b_sorted[:-1]
        idx = np.arange(len(b_sorted))
        local = idx - idx[starts][np.cumsum(starts) - 1]
        rank = offs[b_sorted] + local
        out = np.empty(len(ids), dtype=np.int64)
        out[order] = rank
        return pa.table({"doc_id": pa.array(ids),
                         "curriculum_rank": pa.array(out)})

    return partitioned_group_apply(kds, ["bucket"], rank_partition)


# --------------------------------------------------------------------------
# Per-type value percentiles (ops latency/size distribution)
# --------------------------------------------------------------------------

@query(
    "events_value_quantiles_by_type",
    """
WITH c AS (
  SELECT event_type, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
)
SELECT event_type,
       quantile_disc(cents, 0.5) AS p50_cents,
       quantile_disc(cents, 0.9) AS p90_cents,
       quantile_disc(cents, 0.99) AS p99_cents
FROM c GROUP BY 1""",
)
def events_value_quantiles_by_type(sf_dir: str):
    """Per-type percentiles of the event value (the latency/size
    distribution cut of the ops dashboard): values quantize to exact
    cents (bounded distinct values — the exact-quantile histogram
    contract), then the distributed quantile kernel; corpus streams
    once, exchange is (type, cent)-bounded."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.quantile import grouped_quantiles

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])

    def cents(b: pa.Table) -> pa.Table:
        v = np.asarray(b["value"].combine_chunks(), dtype=np.float64)
        return pa.table({
            "event_type": b["event_type"],
            "cents": pa.array(np.floor(v * 100 + 0.5).astype(np.int64)),
        })

    cds = ds.map_batches(cents, batch_format="pyarrow", batch_size=None)
    return grouped_quantiles(cds, key="event_type", value="cents",
                             ps=[0.5, 0.9, 0.99],
                             out_names=["p50_cents", "p90_cents",
                                        "p99_cents"])


# --------------------------------------------------------------------------
# Active-days distribution (engagement depth histogram)
# --------------------------------------------------------------------------

@query(
    "events_active_days_hist",
    """
WITH ud AS (
  SELECT DISTINCT user_id,
         CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) AS day
  FROM events
), c AS (
  SELECT user_id, COUNT(*) AS active_days FROM ud GROUP BY 1
)
SELECT CAST(active_days AS BIGINT) AS active_days,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM c GROUP BY 1""",
)
def events_active_days_hist(sf_dir: str):
    """How many distinct days each user was active, as a count-of-counts
    histogram (the engagement-depth complement of `events_user_lifespan_hist`,
    which measures span, not density).

    Per-batch distinct (user, day) pairs → hash-partitioned distinct →
    per-user count → days-bounded histogram; users never reach the
    driver."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate, grouped_aggregate_ds

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])

    def pairs(b: pa.Table) -> pa.Table:
        u = np.asarray(b["user_id"].combine_chunks(), dtype=np.int64)
        t = np.asarray(b["ts"].combine_chunks()).astype("datetime64[us]")
        day = np.floor(t.astype(np.int64) / 86400e6).astype(np.int64)
        packed = np.unique((u.astype(np.uint64) << np.uint64(20))
                           | day.astype(np.uint64))
        return pa.table({
            "user_id": pa.array((packed >> np.uint64(20)).astype(np.int64)),
            "day": pa.array((packed & np.uint64((1 << 20) - 1))
                            .astype(np.int64)),
        })

    distinct = grouped_aggregate_ds(
        ds.map_batches(pairs, batch_format="pyarrow", batch_size=None),
        ["user_id", "day"], [("*", "count", "c")], num_partitions=8)
    per_user = grouped_aggregate_ds(distinct, ["user_id"],
                                    [("*", "count", "active_days")],
                                    num_partitions=8)
    hist = grouped_aggregate(per_user, ["active_days"],
                             [("*", "count", "n_users")])
    if "active_days" not in hist.column_names:
        return pa.table({"active_days": pa.array([], pa.int64()),
                         "n_users": pa.array([], pa.int64())})
    return pa.table({"active_days": hist["active_days"],
                     "n_users": hist["n_users"]})


# --------------------------------------------------------------------------
# Weighted sampling WITHOUT replacement (Efraimidis-Spirakis A-ES)
# --------------------------------------------------------------------------

@query(
    "sample_weighted_no_replacement",
    """
WITH k AS (
  SELECT doc_id, n_chars,
         ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))
              AS BIGINT) + 1) * 1.0 / (power(16.0, 13) + 1)) / n_chars
           AS key
  FROM documents
)
SELECT doc_id, CAST(n_chars AS BIGINT) AS weight
FROM k
QUALIFY ROW_NUMBER() OVER (ORDER BY key DESC, doc_id) <= 50""",
)
def sample_weighted_no_replacement(sf_dir: str):
    """Weighted sampling WITHOUT replacement, k=50, weight = n_chars —
    the Efraimidis-Spirakis exponential-keys algorithm (key =
    ln(u)/w ≡ u^(1/w); the global top-k by key IS an exact weighted
    sample), with the repo's deterministic md5 coin standing in for u
    so the sample is reproducible across runs AND engines.

    One map-only key pass + the partial top-k merge (every block emits
    ≤ k rows); no shuffle, no replacement bookkeeping — the classic
    distributed one-pass weighted sampler (Efraimidis & Spirakis 2006,
    IPL). The float key never leaves the engine: output is the integer
    (doc_id, weight) rows only."""
    import hashlib

    import numpy as np
    import ray.data as rd

    from raylog.functions.topk import topk

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "n_chars"])
    DEN = 16.0 ** 13 + 1

    def keys(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_pylist()
        w = np.asarray(b["n_chars"].combine_chunks(), dtype=np.float64)
        h = np.array([int(hashlib.md5(str(i).encode()).hexdigest()[:13], 16)
                      for i in ids], dtype=np.int64)
        key = np.log((h + 1) * 1.0 / DEN) / w
        return pa.table({"doc_id": b["doc_id"],
                         "weight": pa.array(w.astype(np.int64)),
                         "key": pa.array(key, pa.float64())})

    top = topk(ds.map_batches(keys, batch_format="pyarrow",
                              batch_size=None),
               sort_cols=["key", "doc_id"], descending=[True, False], k=50)
    if "doc_id" not in top.column_names:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "weight": pa.array([], pa.int64())})
    return top.select(["doc_id", "weight"])


# --------------------------------------------------------------------------
# Behavioral diversity per user (event-type entropy)
# --------------------------------------------------------------------------

@query(
    "events_user_type_entropy",
    """
WITH c AS (
  SELECT user_id, event_type, COUNT(*) AS c FROM events GROUP BY 1, 2
), n AS (
  SELECT user_id, SUM(c) AS n FROM c GROUP BY 1
)
SELECT c.user_id,
       SUM(-(c.c * 1.0 / n.n) * ln(c.c * 1.0 / n.n)) AS type_entropy
FROM c JOIN n USING (user_id) GROUP BY 1""",
)
def events_user_type_entropy(sf_dir: str):
    """Shannon entropy of each user's event-type distribution — the
    behavioral-diversity feature (0 = single-type bots, high = broad
    engagement) that feeds churn and segmentation models.

    One (user, type) hash-partitioned count aggregate compresses the
    stream to types-bounded rows per user; entropies evaluate inside
    complete-user partitions with one segmented numpy pass (sort by
    user, add.reduceat — no per-user group calls)."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import (grouped_aggregate_ds,
                                      partitioned_group_apply)

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type"])
    counts = grouped_aggregate_ds(ds, ["user_id", "event_type"],
                                  [("*", "count", "c")], num_partitions=8)

    def entropy(part: pa.Table) -> pa.Table:
        u = np.asarray(part["user_id"].combine_chunks(), dtype=np.int64)
        c = np.asarray(part["c"].combine_chunks(), dtype=np.float64)
        if len(u) == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "type_entropy": pa.array([], pa.float64())})
        order = np.argsort(u, kind="mergesort")
        u, c = u[order], c[order]
        starts = np.ones(len(u), dtype=bool)
        starts[1:] = u[1:] != u[:-1]
        idx = np.flatnonzero(starts)
        n = np.add.reduceat(c, idx)
        p = c / np.repeat(n, np.diff(np.append(idx, len(u))))
        h = np.add.reduceat(-p * np.log(p), idx)
        return pa.table({"user_id": pa.array(u[idx]),
                         "type_entropy": pa.array(h, pa.float64())})

    return partitioned_group_apply(counts, ["user_id"], entropy)


# --------------------------------------------------------------------------
# End-to-end pretraining prep INCLUDING packing (composite flagship)
# --------------------------------------------------------------------------

@query(
    "pretrain_prep_packed",
    """
WITH snips AS (
  SELECT DISTINCT substr(text, 1, 40) AS snip
  FROM documents WHERE doc_id % 97 = 0 AND len(text) >= 40
), q AS (
  SELECT doc_id, text,
    CAST(len(string_split(text,' ')) AS BIGINT) AS n_words,
    CAST(len(list_filter(string_split(text,' '), w -> w IN ('the','a'))) AS BIGINT) AS stop_hits,
    CAST(len(list_filter(string_split(text,' '), w -> w IN ('der','die','das','und'))) AS BIGINT) AS h_de,
    CAST(len(list_filter(string_split(text,' '), w -> w IN ('the','a','of','and'))) AS BIGINT) AS h_en,
    CAST(len(list_filter(string_split(text,' '), w -> w IN ('el','la','de','y'))) AS BIGINT) AS h_es,
    CAST(len(list_filter(string_split(text,' '), w -> w IN ('le','la','de','et'))) AS BIGINT) AS h_fr
  FROM documents
), scored AS (
  SELECT *,
    CAST(FLOOR(1000 * (0.5 * LEAST(n_words / 40.0, 1.0)
               + 0.5 * (1.0 - stop_hits * 1.0 / n_words))) AS BIGINT) AS score,
    GREATEST(h_de, h_en, h_es, h_fr) AS mx,
    (CASE WHEN h_de = GREATEST(h_de,h_en,h_es,h_fr) THEN 1 ELSE 0 END
   + CASE WHEN h_en = GREATEST(h_de,h_en,h_es,h_fr) THEN 1 ELSE 0 END
   + CASE WHEN h_es = GREATEST(h_de,h_en,h_es,h_fr) THEN 1 ELSE 0 END
   + CASE WHEN h_fr = GREATEST(h_de,h_en,h_es,h_fr) THEN 1 ELSE 0 END) AS ties
  FROM q
), kept AS (
  SELECT doc_id, text FROM scored
  WHERE score >= 600 AND mx > 0 AND ties = 1 AND h_en = mx
    AND NOT EXISTS (SELECT 1 FROM snips s WHERE contains(scored.text, s.snip))
), surv AS (
  SELECT MIN(doc_id) AS doc_id FROM kept GROUP BY text
), r AS (
  SELECT s.doc_id, s.doc_id % 8 AS shard,
         string_split(d.text, ' ') AS w
  FROM surv s JOIN documents d USING (doc_id)
), flat AS (
  SELECT shard, doc_id, i,
         length(list_extract(w, CAST(i AS INT))) AS t
  FROM r, LATERAL (SELECT unnest(generate_series(1, len(w))) AS i) g
), seq AS (
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
def pretrain_prep_packed(sf_dir: str):
    """The FULL corpus-to-trainer path in one composite: quality filter
    → language filter → benchmark decontamination → exact dedup →
    deterministic sharding → concat-and-chunk packing into the 512-token
    windows a trainer actually reads (position-weighted checksum per
    window, the established robust compare form for list payloads).

    This extends `pretrain_prep` (whose stages and physical plans it
    reuses verbatim) through the LAST mile: survivor ids meet their text
    via ONE native hash join (text is a plain string column, so no
    list-payload workaround is needed), tokens re-derive row-locally,
    and `pack_windows` runs its one shard-partitioned exchange. Total
    exchanges: dedup key aggregate + survivor join + pack shard
    partition — each key-bounded or inherent to the semantics."""
    import numpy as np
    import ray.data as rd

    from raylog import records as R
    from raylog.functions.agg import seed_join_side
    from raylog.functions.packing import pack_windows

    surv = pretrain_prep(sf_dir).select_columns(["doc_id"])
    surv = seed_join_side(surv, pa.table({
        "doc_id": pa.array([-(1 << 62)], pa.int64()),
    }))  # all filters can legally match nothing (SCALE.md join hazard)
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    j = surv.join(docs, join_type="inner", num_partitions=8,
                  on=("doc_id",), right_on=("doc_id",))

    def tokenize(b: pa.Table) -> pa.Table:
        toks, _, _ = R._tokens_from_text(
            b["text"].combine_chunks() if isinstance(b["text"], pa.ChunkedArray)
            else b["text"])
        return pa.table({"doc_id": b["doc_id"], "tokens": toks})

    seqs = j.map_batches(tokenize, batch_format="pyarrow", batch_size=None)
    wins = pack_windows(seqs, max_tokens=512, num_shards=8,
                        num_partitions=8)

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
            "tok_chk": pa.array(chk, pa.int64()),
        })

    return wins.map_batches(checksum, batch_format="pyarrow",
                            batch_size=None)


# --------------------------------------------------------------------------
# Privacy: k-anonymity audit over quasi-identifiers
# --------------------------------------------------------------------------

@query(
    "events_k_anonymity",
    """
WITH g AS (
  SELECT event_type, CAST(hour(ts) AS BIGINT) AS hod,
         CAST(dayofweek(ts) AS BIGINT) AS dow, COUNT(*) AS n
  FROM events GROUP BY 1, 2, 3
)
SELECT k,
       CAST(COALESCE(SUM(CASE WHEN n < k THEN n END), 0) AS BIGINT)
         AS n_violating_rows,
       CAST(COUNT(CASE WHEN n < k THEN 1 END) AS BIGINT)
         AS n_violating_groups,
       CAST(COUNT(*) AS BIGINT) AS n_groups
FROM g CROSS JOIN (VALUES (2), (5), (10)) ks(k)
GROUP BY 1""",
)
def events_k_anonymity(sf_dir: str):
    """k-anonymity audit (privacy compliance for released telemetry):
    rows whose quasi-identifier tuple (event_type, hour-of-day,
    day-of-week) is shared by fewer than k records are re-identifiable.
    One (types×24×7)-bounded count aggregate — partials combined
    per batch, never a corpus shuffle — then the k-threshold sweep on
    the tiny group-size table. Day-of-week via epoch-day arithmetic
    ((days+4) % 7 = DuckDB's Sunday=0 dayofweek post-1970)."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts"])

    def quasi(b: pa.Table) -> pa.Table:
        t = np.asarray(b["ts"].combine_chunks()).astype(
            "datetime64[us]").astype(np.int64)
        day = t // 86_400_000_000
        return pa.table({
            "event_type": b["event_type"],
            "hod": pa.array((t % 86_400_000_000) // 3_600_000_000),
            "dow": pa.array((day + 4) % 7),
        })

    g = grouped_aggregate(
        ds.map_batches(quasi, batch_format="pyarrow", batch_size=None),
        ["event_type", "hod", "dow"], [("*", "count", "n")])
    n = np.asarray(g["n"], dtype=np.int64)
    ks, vrows, vgroups = [], [], []
    for k in (2, 5, 10):
        viol = n < k
        ks.append(k)
        vrows.append(int(n[viol].sum()))
        vgroups.append(int(viol.sum()))
    return pa.table({
        "k": pa.array(ks, pa.int32()),
        "n_violating_rows": pa.array(vrows, pa.int64()),
        "n_violating_groups": pa.array(vgroups, pa.int64()),
        "n_groups": pa.array([len(n)] * 3, pa.int64()),
    })


# --------------------------------------------------------------------------
# Content-defined chunking (rolling-hash boundaries)
# --------------------------------------------------------------------------

@query(
    "text_cdc_chunks",
    """
WITH docs AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
pos AS (
  SELECT doc_id, len(w) AS n, i
  FROM docs, UNNEST(generate_series(3, len(w))) t(i)
  WHERE len(w) >= 3
    AND CAST(('0x' || substr(md5(
          list_extract(w, i - 2) || ' ' ||
          list_extract(w, i - 1) || ' ' ||
          list_extract(w, i)), 1, 8)) AS BIGINT) % 8 = 0
),
lens AS (
  SELECT doc_id,
         i - COALESCE(LAG(i) OVER (PARTITION BY doc_id ORDER BY i), 0)
           AS clen
  FROM pos
  UNION ALL
  SELECT d.doc_id, len(d.w) - COALESCE(m.mx, 0)
  FROM docs d
  LEFT JOIN (SELECT doc_id, MAX(i) AS mx FROM pos GROUP BY 1) m
    USING (doc_id)
  WHERE len(d.w) - COALESCE(m.mx, 0) > 0
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(MAX(clen) AS BIGINT) AS longest_chunk,
       CAST(SUM(clen) AS BIGINT) AS n_words
FROM lens GROUP BY 1""",
)
def text_cdc_chunks(sf_dir: str):
    """Content-defined chunking (CDC — the rolling-hash boundary rule
    behind dedup storage and shift-stable document splitting): boundary
    after word i when the trailing 3-word window hash ≡ 0 mod 8, so an
    edit only reshapes its local chunk instead of shifting every later
    boundary the way fixed-size `text_chunks` does. Per-doc chunk
    count / longest / word count; md5 per window position (the shingle
    budget class); map-only, zero exchange."""
    import ray.data as rd

    from raylog.functions.text import cdc_chunks

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return ds.map_batches(cdc_chunks, batch_format="pyarrow",
                          batch_size=None)


@query(
    "orders_q10_returned_revenue",
    """
WITH l AS (
  SELECT l_orderkey,
         CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000 + 0.5)
              AS BIGINT) AS rev_e4
  FROM lineitem WHERE l_returnflag = 'R'
), j AS (
  SELECT o.o_custkey, SUM(l.rev_e4) AS rev_e4
  FROM l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
    AND o.o_orderdate < TIMESTAMP '1997-01-01'
  GROUP BY 1
)
SELECT c.c_custkey, c.c_name, n.n_name,
       CAST(j.rev_e4 AS BIGINT) AS revenue_e4
FROM j JOIN customer c ON j.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
ORDER BY revenue_e4 DESC, c_custkey LIMIT 20""",
)
def orders_q10_returned_revenue(sf_dir: str):
    """TPC-H Q10 (returned-item revenue, top-20 customers): per-row
    revenue quantized to exact 1e-4 fixed point BEFORE any sum (the Q6
    discipline — distributed integer sums are order-independent), fact⋈
    fact hash join lineitem('R')⋈orders(1996 window), per-customer
    hash-partitioned aggregate, customer join, 25-row nation dim as a
    broadcast dict, partial top-20 finish. Every exchange is key- or
    k-bounded; the date/flag filters run at the scan."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate_ds
    from raylog.functions.topk import topk

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_extendedprice",
                                  "l_discount", "l_returnflag"])

    def quantize(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        b = b.filter(pc.equal(b["l_returnflag"], "R"))
        rev = np.floor(
            np.asarray(b["l_extendedprice"].combine_chunks())
            * (1 - np.asarray(b["l_discount"].combine_chunks()))
            * 10000 + 0.5).astype(np.int64)
        return pa.table({"l_orderkey": b["l_orderkey"],
                         "rev_e4": pa.array(rev)})

    li = li.map_batches(quantize, batch_format="pyarrow", batch_size=None)

    def window(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        lo = pa.scalar(np.datetime64("1996-01-01", "us"))
        hi = pa.scalar(np.datetime64("1997-01-01", "us"))
        m = pc.and_(pc.greater_equal(b["o_orderdate"], lo),
                    pc.less(b["o_orderdate"], hi))
        return b.filter(m).select(["o_orderkey", "o_custkey"])

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    ).map_batches(window, batch_format="pyarrow", batch_size=None)

    joined = li.join(orders, join_type="inner", num_partitions=8,
                     on=("l_orderkey",), right_on=("o_orderkey",))
    per_cust = grouped_aggregate_ds(
        joined, ["o_custkey"], [("rev_e4", "sum", "revenue_e4")],
        num_partitions=8)

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_name", "c_nationkey"])
    enriched = per_cust.join(cust, join_type="inner", num_partitions=8,
                             on=("o_custkey",), right_on=("c_custkey",))

    import duckdb  # nation is a 25-row dim: broadcast as a plain dict
    nat = dict(duckdb.sql(
        f"SELECT n_nationkey, n_name FROM "
        f"read_parquet('{sf_dir}/nation.parquet')").fetchall())

    def finish(b: pa.Table) -> pa.Table:
        # Ray's join keeps the LEFT key column (o_custkey) only
        nk = b["c_nationkey"].to_pylist()
        return pa.table({
            "c_custkey": b["o_custkey"],
            "c_name": b["c_name"],
            "n_name": pa.array([nat[k] for k in nk]),
            "revenue_e4": pa.compute.cast(b["revenue_e4"], pa.int64()),
        })

    out = enriched.map_batches(finish, batch_format="pyarrow",
                               batch_size=None)
    top = topk(out, sort_cols=["revenue_e4", "c_custkey"],
               descending=[True, False], k=20)
    return top.select(["c_custkey", "c_name", "n_name", "revenue_e4"])


@query(
    "events_scd2_history",
    """
WITH e AS (
  SELECT user_id, event_id, event_type,
         CAST(epoch_us(ts) AS BIGINT) AS t
  FROM events
), d AS (
  SELECT *, CASE WHEN LAG(event_type) OVER
                      (PARTITION BY user_id ORDER BY t, event_id)
                      IS DISTINCT FROM event_type
                 THEN 1 ELSE 0 END AS chg
  FROM e
), r AS (
  SELECT *, SUM(chg) OVER (PARTITION BY user_id ORDER BY t, event_id
                           ROWS UNBOUNDED PRECEDING) AS run_no
  FROM d
), g AS (
  SELECT user_id, run_no, MIN(event_type) AS event_type,
         MIN(t) AS valid_from_us, COUNT(*) AS n_events
  FROM r GROUP BY 1, 2
)
SELECT user_id, event_type,
       CAST(valid_from_us AS BIGINT) AS valid_from_us,
       CAST(LEAD(valid_from_us) OVER
              (PARTITION BY user_id ORDER BY run_no) AS BIGINT)
         AS valid_to_us,
       CAST(n_events AS BIGINT) AS n_events
FROM g""",
)
def events_scd2_history(sf_dir: str):
    """Slowly-changing-dimension type-2 history build: the event stream
    is a change feed of each user's current state (their event_type);
    consecutive runs of the same state collapse to validity intervals
    [valid_from, valid_to) with the open (current) interval's
    valid_to = NULL — the temporal-table materialization every
    warehouse CDC load performs.

    Users hash-partition (complete users per partition,
    ``partitioned_group_apply``); each partition lexsorts once by
    (user, ts, event_id) and derives ALL users' run boundaries, run
    lengths and the shifted valid_to in one vectorized pass — no
    per-user group calls, no window-function exchange. Ties inside a
    microsecond break on event_id, matching the oracle's ORDER BY."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import partitioned_group_apply

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_id", "event_type",
                                  "ts"])

    def history(part: pa.Table) -> pa.Table:
        def col(name):
            c = part[name]
            return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c

        empty = pa.table({
            "user_id": pa.array([], pa.int64()),
            "event_type": pa.array([], pa.string()),
            "valid_from_us": pa.array([], pa.int64()),
            "valid_to_us": pa.array([], pa.int64()),
            "n_events": pa.array([], pa.int64()),
        })
        n = part.num_rows
        if n == 0:
            return empty
        user = np.asarray(col("user_id"), dtype=np.int64)
        eid = np.asarray(col("event_id"), dtype=np.int64)
        t = np.asarray(col("ts")).astype("datetime64[us]").astype(np.int64)
        etype = col("event_type").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, t, user))
        user, t, etype = user[order], t[order], etype[order]
        new_user = np.ones(n, dtype=bool)
        new_user[1:] = user[1:] != user[:-1]
        chg = new_user.copy()
        chg[1:] |= etype[1:] != etype[:-1]
        starts = np.flatnonzero(chg)
        ends = np.concatenate([starts[1:], [n]])
        run_user = user[starts]
        valid_from = t[starts]
        # valid_to = next run's valid_from within the same user
        valid_to = np.empty(len(starts), dtype=np.int64)
        valid_to[:-1] = valid_from[1:]
        valid_to[-1] = 0
        last_of_user = np.ones(len(starts), dtype=bool)
        last_of_user[:-1] = run_user[1:] != run_user[:-1]
        return pa.table({
            "user_id": pa.array(run_user),
            "event_type": pa.array(etype[starts]),
            "valid_from_us": pa.array(valid_from),
            "valid_to_us": pa.array(
                np.where(last_of_user, None, valid_to), pa.int64(),
                from_pandas=True),
            "n_events": pa.array((ends - starts).astype(np.int64)),
        })

    return partitioned_group_apply(ds, ["user_id"], history)


@query(
    "text_cdc_dedup_ratio",
    """
WITH docs AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
pos AS (
  SELECT doc_id, len(w) AS n, i
  FROM docs, UNNEST(generate_series(3, len(w))) t(i)
  WHERE len(w) >= 3
    AND CAST(('0x' || substr(md5(
          list_extract(w, i - 2) || ' ' ||
          list_extract(w, i - 1) || ' ' ||
          list_extract(w, i)), 1, 8)) AS BIGINT) % 8 = 0
),
bounds AS (
  SELECT doc_id, i AS e,
         COALESCE(LAG(i) OVER (PARTITION BY doc_id ORDER BY i), 0) AS s
  FROM pos
  UNION ALL
  SELECT d.doc_id, len(d.w), COALESCE(m.mx, 0)
  FROM docs d
  LEFT JOIN (SELECT doc_id, MAX(i) AS mx FROM pos GROUP BY 1) m
    USING (doc_id)
  WHERE len(d.w) - COALESCE(m.mx, 0) > 0
),
chunks AS (
  SELECT CAST(('0x' || substr(md5(array_to_string(
           list_slice(d.w, b.s + 1, b.e), ' ')), 1, 15)) AS BIGINT)
           AS chash,
         b.e - b.s AS clen
  FROM bounds b JOIN docs d USING (doc_id)
),
g AS (SELECT chash, COUNT(*) AS occ, MIN(clen) AS clen
      FROM chunks GROUP BY 1)
SELECT CAST(SUM(occ) AS BIGINT) AS n_chunk_instances,
       CAST(COUNT(*) AS BIGINT) AS n_distinct_chunks,
       CAST(SUM(occ * clen) AS BIGINT) AS total_words,
       CAST(SUM((occ - 1) * clen) AS BIGINT) AS dup_words,
       (1000 * CAST(SUM((occ - 1) * clen) AS BIGINT))
         // CAST(SUM(occ * clen) AS BIGINT) AS dedup_ratio_milli
FROM g""",
)
def text_cdc_dedup_ratio(sf_dir: str):
    """Chunk-store dedup estimate over content-defined chunks (the
    FastCDC evaluation metric: what fraction of the corpus' words would
    a CDC-keyed store NOT re-write?): chunk with the `text_cdc_chunks`
    boundary rule, key chunks by a 60-bit content hash, count
    occurrences per distinct chunk, report instance/distinct counts and
    the duplicate-word mass Σ(occ−1)·len.

    Chunk emission is map-only; the only exchange is the
    hash-partitioned per-chunk-hash aggregate (rows = distinct chunks,
    2 int64s each) and a constant-size final fold — never chunk
    text."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate, grouped_aggregate_ds
    from raylog.functions.text import cdc_chunk_hashes

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    chunks = ds.map_batches(cdc_chunk_hashes, batch_format="pyarrow",
                            batch_size=None)
    per_hash = grouped_aggregate_ds(
        chunks, ["chash"],
        [("clen", "count", "occ"), ("clen", "min", "clen")],
        num_partitions=8)

    def fold(b: pa.Table) -> pa.Table:
        occ = np.asarray(b["occ"].combine_chunks(), dtype=np.int64)
        cl = np.asarray(b["clen"].combine_chunks(), dtype=np.int64)
        return pa.table({
            "k": pa.array([0], pa.int64()),
            "inst": pa.array([int(occ.sum())], pa.int64()),
            "dist": pa.array([len(occ)], pa.int64()),
            "tot": pa.array([int((occ * cl).sum())], pa.int64()),
            "dup": pa.array([int(((occ - 1) * cl).sum())], pa.int64()),
        })

    a = grouped_aggregate(
        per_hash.map_batches(fold, batch_format="pyarrow",
                             batch_size=None),
        ["k"], [("inst", "sum", "n_chunk_instances"),
                ("dist", "sum", "n_distinct_chunks"),
                ("tot", "sum", "total_words"),
                ("dup", "sum", "dup_words")])
    tot = int(a["total_words"][0].as_py())
    dup = int(a["dup_words"][0].as_py())
    return pa.table({
        "n_chunk_instances": a["n_chunk_instances"],
        "n_distinct_chunks": a["n_distinct_chunks"],
        "total_words": a["total_words"],
        "dup_words": a["dup_words"],
        "dedup_ratio_milli": pa.array([1000 * dup // tot], pa.int64()),
    })


@query(
    "events_pair_within_window",
    """
SELECT a.event_type AS type_a, b.event_type AS type_b,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND (b.ts > a.ts OR (b.ts = a.ts AND b.event_id > a.event_id))
 AND epoch_us(b.ts) - epoch_us(a.ts) <= 300000000
GROUP BY 1, 2""",
)
def events_pair_within_window(sf_dir: str):
    """Temporal co-occurrence mining ("A then B within 5 minutes", any
    gap — not just adjacent like `events_markov_transitions`): counts
    every ordered pair of events of the same user at most 300 s apart,
    grouped by (type_a, type_b).

    The naive form is a per-user self-join (quadratic row expansion);
    here each hash partition lexsorts once by (user, ts, event_id),
    finds every event's window end with ONE vectorized searchsorted on
    a segment-offset composite key (user-segment-id·B + relative-time,
    B > max span + window, so probes never cross a user boundary), and
    turns range-counts-by-type into prefix-sum differences — one
    O(n)+bincount pass per event type, T≈types passes total, zero pair
    materialization. Exchange: T² partial counts per partition."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import (grouped_aggregate,
                                      partitioned_group_apply)

    W = 300_000_000  # 5 min in microseconds
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_id", "event_type",
                                  "ts"])

    def pairs(part: pa.Table) -> pa.Table:
        def col(name):
            c = part[name]
            return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c

        empty = pa.table({"type_a": pa.array([], pa.string()),
                          "type_b": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64())})
        n = part.num_rows
        if n == 0:
            return empty
        user = np.asarray(col("user_id"), dtype=np.int64)
        eid = np.asarray(col("event_id"), dtype=np.int64)
        t = np.asarray(col("ts")).astype("datetime64[us]").astype(np.int64)
        types, k = np.unique(col("event_type").to_numpy(zero_copy_only=False),
                             return_inverse=True)
        order = np.lexsort((eid, t, user))
        user, t, k = user[order], t[order], k[order]
        seg_start = np.ones(n, dtype=bool)
        seg_start[1:] = user[1:] != user[:-1]
        seg = np.cumsum(seg_start) - 1
        tr = t - t[np.flatnonzero(seg_start)][seg]  # per-segment relative
        B = int(tr.max()) + W + 1
        key = seg * B + tr
        hi = np.searchsorted(key, key + W, side="right")
        T = len(types)
        acc = np.zeros((T, T), dtype=np.int64)
        idx = np.arange(n, dtype=np.int64)
        for c in range(T):
            p = np.concatenate([[0], np.cumsum((k == c).astype(np.int64))])
            cnt = p[hi] - p[idx + 1]
            acc[:, c] += np.bincount(k, weights=cnt,
                                     minlength=T).astype(np.int64)
        ta, tb = np.nonzero(acc)
        return pa.table({
            "type_a": pa.array(types[ta], pa.string()),
            "type_b": pa.array(types[tb], pa.string()),
            "n": pa.array(acc[ta, tb]),
        })

    parts = partitioned_group_apply(ds, ["user_id"], pairs)
    a = grouped_aggregate(parts, ["type_a", "type_b"],
                          [("n", "sum", "n_pairs")])
    return a


@query(
    "events_rolling_distinct_users",
    """
WITH ud AS (
  SELECT DISTINCT user_id,
         CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) AS d
  FROM events
), days AS (SELECT DISTINCT d FROM ud)
SELECT days.d AS day,
       CAST(COUNT(DISTINCT ud.user_id) AS BIGINT) AS wau
FROM days JOIN ud ON ud.d BETWEEN days.d - 6 AND days.d
GROUP BY 1""",
)
def events_rolling_distinct_users(sf_dir: str):
    """Trailing 7-day distinct active users per observed day (the WAU
    curve — a sliding COUNT DISTINCT, which no plain windowed sum can
    express because a user active twice in the window counts once).

    Exact and shuffle-light: distinct (user, day) via the
    hash-partitioned aggregate, then per-user partitions merge each
    user's active days into coverage intervals [d, d+6] (overlaps
    coalesced — this is where the DISTINCT semantics happen) and emit
    ±1 diff rows; a day-bounded aggregate + driver prefix sum over the
    tiny day axis finishes. Exchange: distinct (user,day) rows once,
    then diff rows (≤ 2× that); raw events never shuffle."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import (grouped_aggregate,
                                      grouped_aggregate_ds,
                                      partitioned_group_apply)

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])

    def to_day(b: pa.Table) -> pa.Table:
        t = (np.asarray(b["ts"].combine_chunks())
             .astype("datetime64[us]").astype(np.int64))
        return pa.table({
            "user_id": b["user_id"],
            "d": pa.array(np.floor(t / 1e6 / 86400).astype(np.int64)),
        })

    ud = grouped_aggregate_ds(
        ds.map_batches(to_day, batch_format="pyarrow", batch_size=None),
        ["user_id", "d"], [("*", "count", "_n")], num_partitions=8)

    W = 7

    def diffs(part: pa.Table) -> pa.Table:
        u = np.asarray(part["user_id"].combine_chunks(), dtype=np.int64)
        d = np.asarray(part["d"].combine_chunks(), dtype=np.int64)
        order = np.lexsort((d, u))
        u, d = u[order], d[order]
        # interval start when new user OR gap > W-1 days since the
        # previous active day (coverage [d, d+6] windows disjoint)
        new = np.ones(len(u), dtype=bool)
        if len(u) > 1:
            new[1:] = (u[1:] != u[:-1]) | (d[1:] - d[:-1] > W - 1)
        # interval end = last active day of each run, +W for the diff
        seg = np.cumsum(new) - 1
        starts = d[new]
        last = np.zeros(seg.max() + 1 if len(seg) else 0, dtype=np.int64)
        np.maximum.at(last, seg, d)
        days = np.concatenate([starts, last + W])
        vals = np.concatenate([np.ones(len(starts), np.int64),
                               -np.ones(len(last), np.int64)])
        return pa.table({"day": pa.array(days), "v": pa.array(vals)})

    dd = grouped_aggregate(
        partitioned_group_apply(ud, ["user_id"], diffs),
        ["day"], [("v", "sum", "v")]).to_pandas().sort_values("day")
    axis = dd["day"].to_numpy()
    wau = np.cumsum(dd["v"].to_numpy())
    # report only days that actually appear in the events
    obs = np.unique(np.asarray(
        grouped_aggregate(ud, ["d"], [("_n", "count", "_c")])["d"]))
    i = np.searchsorted(axis, obs, side="right") - 1
    return pa.table({
        "day": pa.array(obs, pa.int64()),
        "wau": pa.array(wau[i], pa.int64()),
    })


@query(
    "events_survival_km",
    """
WITH u AS (
  SELECT user_id, MIN(ts) AS f, MAX(ts) AS l FROM events GROUP BY 1
), g AS (SELECT MAX(ts) AS gmax FROM events),
lab AS (
  SELECT CAST(FLOOR((epoch_us(l) - epoch_us(f)) / 86400000000.0)
              AS BIGINT) AS t,
         CASE WHEN epoch_us(l) > epoch_us(g.gmax) - 7 * 86400000000
              THEN 1 ELSE 0 END AS cen
  FROM u CROSS JOIN g
), agg AS (
  SELECT t, COUNT(*) AS n,
         SUM(CASE WHEN cen = 0 THEN 1 ELSE 0 END) AS ev,
         SUM(cen) AS ce
  FROM lab GROUP BY 1
)
SELECT t AS lifetime_days,
       CAST(SUM(n) OVER (ORDER BY t DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS n_at_risk,
       CAST(ev AS BIGINT) AS n_events,
       CAST(ce AS BIGINT) AS n_censored
FROM agg""",
)
def events_survival_km(sf_dir: str):
    """Kaplan–Meier life table for user churn (survival analysis):
    per user, observed lifetime = days between first and last event;
    a user still active in the final 7 days of the corpus is CENSORED
    (their true lifetime is only known to exceed the observation).
    One row per distinct lifetime with the KM estimator's sufficient
    statistics — n_at_risk (lifetime ≥ t), n_events (uncensored
    deaths at t), n_censored at t — all integer-exact; the survival
    product Π(1 − d/n) is a trivial driver-side fold of this table.

    Per-user first/last via the hash-partitioned aggregate (the only
    exchange, one row per user); lifetimes collapse to a day-bounded
    table; the reverse cumulative at-risk count runs on that tiny
    axis."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate, grouped_aggregate_ds

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])
    per_user = grouped_aggregate_ds(ds, ["user_id"],
                                    [("ts", "min", "f"),
                                     ("ts", "max", "l")],
                                    num_partitions=8)
    gmax = int(np.asarray(
        grouped_aggregate(
            ds.map_batches(
                lambda b: pa.table({
                    "g": pa.array([0], pa.int64()),
                    "m": pa.array([pa.compute.max(b["ts"]).value
                                   if b.num_rows else 0], pa.int64()),
                }),
                batch_format="pyarrow", batch_size=None),
            ["g"], [("m", "max", "m")])["m"])[0])
    DAY = 86_400_000_000

    def label(b: pa.Table) -> pa.Table:
        f = (np.asarray(b["f"].combine_chunks())
             .astype("datetime64[us]").astype(np.int64))
        l = (np.asarray(b["l"].combine_chunks())
             .astype("datetime64[us]").astype(np.int64))
        t = np.floor((l - f) / float(DAY)).astype(np.int64)
        cen = (l > gmax - 7 * DAY).astype(np.int64)
        return pa.table({"t": pa.array(t), "cen": pa.array(cen),
                         "ev": pa.array(1 - cen)})

    agg = grouped_aggregate(
        per_user.map_batches(label, batch_format="pyarrow",
                             batch_size=None),
        ["t"], [("ev", "count", "n"), ("ev", "sum", "ev"),
                ("cen", "sum", "ce")]).to_pandas().sort_values(
                    "t", ascending=False)
    at_risk = agg["n"].cumsum().to_numpy()
    out = agg.iloc[::-1]
    return pa.table({
        "lifetime_days": pa.array(out["t"].to_numpy(), pa.int64()),
        "n_at_risk": pa.array(at_risk[::-1], pa.int64()),
        "n_events": pa.array(out["ev"].to_numpy(), pa.int64()),
        "n_censored": pa.array(out["ce"].to_numpy(), pa.int64()),
    })


@query(
    "events_ohlc_daily",
    """
WITH e AS (
  SELECT event_type, CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) AS d,
         ts, event_id, value
  FROM events
), r AS (
  SELECT event_type, d, value,
         ROW_NUMBER() OVER (PARTITION BY event_type, d
                            ORDER BY ts, event_id) AS rn_o,
         ROW_NUMBER() OVER (PARTITION BY event_type, d
                            ORDER BY ts DESC, event_id DESC) AS rn_c
  FROM e
), agg AS (
  SELECT event_type, d, MIN(value) AS low, MAX(value) AS high,
         COUNT(*) AS n
  FROM e GROUP BY 1, 2
)
SELECT agg.event_type, agg.d AS day, o.value AS open, agg.high,
       agg.low, c.value AS close, CAST(agg.n AS BIGINT) AS n_events
FROM agg
JOIN r o ON o.event_type = agg.event_type AND o.d = agg.d AND o.rn_o = 1
JOIN r c ON c.event_type = agg.event_type AND c.d = agg.d AND c.rn_c = 1""",
)
def events_ohlc_daily(sf_dir: str):
    """OHLC time-series bars: per (event_type, day), the value of the
    FIRST event (open), the MAX/MIN (high/low), the value of the LAST
    event (close), and the bar volume — the positional first/last-in-
    time aggregate that plain min/max can't express. Ties on timestamp
    break by event_id, so the bar is deterministic.

    open/close ride :func:`argmax_per_key` (per-batch one-row-per-key
    compression, then complete-key-group reducers — O(distinct bars)
    exchange, hot-bar-proof); high/low/volume are the standard partial
    aggregate; the three meet on the tiny bars axis driver-side."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import argmax_per_key, grouped_aggregate

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "event_type",
                                  "value"])

    def addday(b: pa.Table) -> pa.Table:
        t = (np.asarray(b["ts"].combine_chunks())
             .astype("datetime64[us]").astype(np.int64))
        return b.append_column(
            "d", pa.array(np.floor(t / 1e6 / 86400).astype(np.int64)))

    dd = ds.map_batches(addday, batch_format="pyarrow", batch_size=None)
    keys = ["event_type", "d"]
    opens = argmax_per_key(dd, keys, ["ts", "event_id"],
                           [False, False], num_partitions=8).to_pandas()
    closes = argmax_per_key(dd, keys, ["ts", "event_id"],
                            [True, True], num_partitions=8).to_pandas()
    hl = grouped_aggregate(dd, keys,
                           [("value", "min", "low"),
                            ("value", "max", "high"),
                            ("*", "count", "n_events")]).to_pandas()
    m = (hl.merge(opens[keys + ["value"]].rename(columns={"value": "open"}),
                  on=keys)
           .merge(closes[keys + ["value"]].rename(columns={"value": "close"}),
                  on=keys)
           .rename(columns={"d": "day"}))
    return pa.table({
        "event_type": pa.array(m["event_type"], pa.string()),
        "day": pa.array(m["day"], pa.int64()),
        "open": pa.array(m["open"], pa.float64()),
        "high": pa.array(m["high"], pa.float64()),
        "low": pa.array(m["low"], pa.float64()),
        "close": pa.array(m["close"], pa.float64()),
        "n_events": pa.array(m["n_events"], pa.int64()),
    })


@query(
    "events_cdc_merge",
    """
WITH log AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN event_id % 10 = 0 THEN 1 ELSE 0 END AS is_del
  FROM events
), last AS (
  SELECT user_id, value, event_id, is_del,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM log
), cnt AS (SELECT user_id, COUNT(*) AS n_ops FROM log GROUP BY 1)
SELECT l.user_id, l.event_id AS last_event_id, l.value AS last_value,
       CAST(c.n_ops AS BIGINT) AS n_ops
FROM last l JOIN cnt c USING (user_id)
WHERE l.rn = 1 AND l.is_del = 0""",
)
def events_cdc_merge(sf_dir: str):
    """Lakehouse CDC merge (Delta/Hudi/Iceberg MERGE INTO semantics):
    apply a change log to materialize final table state under
    last-writer-wins with DELETE tombstones — the event stream is the
    log keyed by user_id, every 10th event_id is a tombstone, and a
    key whose LAST op is a delete is absent from the result (unlike
    plain keep-latest, which `events_latest_per_user` covers).

    One hash exchange of the narrow 4-column log into complete-user
    partitions (`partitioned_group_apply`); each partition lexsorts
    once and takes per-user last row + op count vectorized — no
    per-user Python, no second pass, no join operator."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import partitioned_group_apply

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id", "value"])

    def merge(part: pa.Table) -> pa.Table:
        u = np.asarray(part["user_id"].combine_chunks(), dtype=np.int64)
        t = (np.asarray(part["ts"].combine_chunks())
             .astype("datetime64[us]").astype(np.int64))
        e = np.asarray(part["event_id"].combine_chunks(), dtype=np.int64)
        v = np.asarray(part["value"].combine_chunks(), dtype=np.float64)
        order = np.lexsort((e, t, u))
        u, t, e, v = u[order], t[order], e[order], v[order]
        lastmask = np.ones(len(u), dtype=bool)
        lastmask[:-1] = u[1:] != u[:-1]
        last_idx = np.flatnonzero(lastmask)
        starts = np.concatenate([[0], last_idx[:-1] + 1]) \
            if len(last_idx) else np.array([], dtype=np.int64)
        n_ops = last_idx - starts + 1
        keep = e[last_idx] % 10 != 0  # tombstone: last op is a delete
        return pa.table({
            "user_id": pa.array(u[last_idx][keep]),
            "last_event_id": pa.array(e[last_idx][keep]),
            "last_value": pa.array(v[last_idx][keep]),
            "n_ops": pa.array(n_ops[keep]),
        })

    return partitioned_group_apply(ds, ["user_id"], merge)


@query(
    "events_ewma_volume",
    """
WITH c AS (
  SELECT event_type, CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) AS d,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT a.event_type, a.d AS day,
       CAST(FLOOR(1000 * SUM(b.n * POWER(0.5, a.d - b.d))) AS BIGINT)
         AS ewma_milli
FROM c a JOIN c b
  ON a.event_type = b.event_type
 AND b.d <= a.d AND a.d - b.d <= 20
GROUP BY 1, 2""",
)
def events_ewma_volume(sf_dir: str):
    """EWMA-smoothed daily volume per event type with α = 1/2 and a
    20-day memory: ewma(d) = Σ_{lag≤20} n(d−lag) · 2^−lag. The dyadic
    decay is the trick that keeps a float recurrence EXACT: every term
    n·2^−lag is a dyadic rational needing ≤ (14-bit count + 20-bit
    shift) < 53 bits, so every partial sum is exactly representable
    and the result is bit-identical in ANY summation order — a
    smoother that survives distributed execution without a fixed-point
    workaround.

    Exchange: the (type, day) cells-bounded count aggregate; the lag
    convolution runs on that tiny axis driver-side."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts"])

    def day(b: pa.Table) -> pa.Table:
        t = (np.asarray(b["ts"].combine_chunks())
             .astype("datetime64[us]").astype(np.int64))
        return pa.table({
            "event_type": b["event_type"],
            "d": pa.array(np.floor(t / 1e6 / 86400).astype(np.int64)),
        })

    c = grouped_aggregate(
        ds.map_batches(day, batch_format="pyarrow", batch_size=None),
        ["event_type", "d"], [("*", "count", "n")]).to_pandas()
    out_t, out_d, out_e = [], [], []
    for et, grp in c.groupby("event_type"):
        g = grp.sort_values("d")
        d = g["d"].to_numpy(dtype=np.int64)
        n = g["n"].to_numpy(dtype=np.float64)
        for i in range(len(d)):
            lag = d[i] - d
            m = (lag >= 0) & (lag <= 20)
            s = float(np.sum(n[m] * np.power(0.5, lag[m].astype(
                np.float64))))
            out_t.append(et)
            out_d.append(int(d[i]))
            out_e.append(int(np.floor(1000 * s)))
    return pa.table({
        "event_type": pa.array(out_t, pa.string()),
        "day": pa.array(out_d, pa.int64()),
        "ewma_milli": pa.array(out_e, pa.int64()),
    })


@query(
    "events_ab_conversion",
    """
WITH u AS (
  SELECT user_id, user_id % 2 AS variant,
         CASE WHEN MAX(value) > 300 THEN 1 ELSE 0 END AS conv
  FROM events GROUP BY 1, 2
), s AS (
  SELECT SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS n0,
         SUM(CASE WHEN variant = 0 THEN conv ELSE 0 END) AS c0,
         SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS n1,
         SUM(CASE WHEN variant = 1 THEN conv ELSE 0 END) AS c1
  FROM u
)
SELECT CAST(n0 AS BIGINT) AS n_users_a, CAST(c0 AS BIGINT) AS n_conv_a,
       CAST(n1 AS BIGINT) AS n_users_b, CAST(c1 AS BIGINT) AS n_conv_b,
       CAST(CASE WHEN c0 + c1 = 0 OR c0 + c1 = n0 + n1 THEN 0
            ELSE FLOOR(1e6 * (
              (CAST(c1 AS DOUBLE) / n1 - CAST(c0 AS DOUBLE) / n0)
              / sqrt((CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                     * (1 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                     * (1.0 / n0 + 1.0 / n1))))
            END AS BIGINT) AS z_micro
FROM s""",
)
def events_ab_conversion(sf_dir: str):
    """A/B experiment readout: users split into two variants by id
    parity, a user CONVERTS when any of their events exceeds the value
    threshold, and the two-proportion pooled z-statistic says whether
    the variants differ (the standard experimentation-platform
    significance gate). Counts are exact integers from one per-user
    hash-partitioned aggregate + a constant fold; the z formula runs
    once on four ints with identical operand structure both engines
    (sqrt is IEEE-exact, no accumulation drift).

    Exchange: one row per user, key-compressed per batch first."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate, grouped_aggregate_ds

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "value"])
    per_user = grouped_aggregate_ds(ds, ["user_id"],
                                    [("value", "max", "mx")],
                                    num_partitions=8)

    def fold(b: pa.Table) -> pa.Table:
        u = np.asarray(b["user_id"].combine_chunks(), dtype=np.int64)
        conv = (np.asarray(b["mx"].combine_chunks(),
                           dtype=np.float64) > 300).astype(np.int64)
        v1 = (u % 2 == 1)
        return pa.table({
            "g": pa.array([0], pa.int64()),
            "n0": pa.array([int((~v1).sum())], pa.int64()),
            "c0": pa.array([int(conv[~v1].sum())], pa.int64()),
            "n1": pa.array([int(v1.sum())], pa.int64()),
            "c1": pa.array([int(conv[v1].sum())], pa.int64()),
        })

    a = grouped_aggregate(
        per_user.map_batches(fold, batch_format="pyarrow",
                             batch_size=None),
        ["g"], [("n0", "sum", "n0"), ("c0", "sum", "c0"),
                ("n1", "sum", "n1"), ("c1", "sum", "c1")])
    n0, c0 = int(a["n0"][0].as_py()), int(a["c0"][0].as_py())
    n1, c1 = int(a["n1"][0].as_py()), int(a["c1"][0].as_py())
    if c0 + c1 == 0 or c0 + c1 == n0 + n1:
        zq = 0  # degenerate: all or none converted, z undefined
    else:
        pbar = float(c0 + c1) / (n0 + n1)
        z = ((float(c1) / n1 - float(c0) / n0)
             / np.sqrt(pbar * (1 - pbar) * (1.0 / n0 + 1.0 / n1)))
        zq = int(np.floor(1e6 * z))
    return pa.table({
        "n_users_a": pa.array([n0], pa.int64()),
        "n_conv_a": pa.array([c0], pa.int64()),
        "n_users_b": pa.array([n1], pa.int64()),
        "n_conv_b": pa.array([c1], pa.int64()),
        "z_micro": pa.array([zq], pa.int64()),
    })


@query(
    "events_target_encoding",
    """
WITH q AS (
  SELECT event_type, user_id % 5 AS fold,
         CAST(FLOOR(value * 10000 + 0.5) AS BIGINT) AS v4
  FROM events
), pf AS (
  SELECT event_type, fold, COUNT(*) AS n_f, SUM(v4) AS s_f
  FROM q GROUP BY 1, 2
), g AS (SELECT event_type, SUM(n_f) AS n, SUM(s_f) AS s
         FROM pf GROUP BY 1)
SELECT pf.event_type, CAST(pf.fold AS BIGINT) AS fold,
       CAST(pf.n_f AS BIGINT) AS n_fold,
       CAST(CASE WHEN g.n - pf.n_f = 0 THEN -1
            ELSE (g.s - pf.s_f) // (g.n - pf.n_f) END AS BIGINT)
         AS enc_mean_e4
FROM pf JOIN g USING (event_type)""",
)
def events_target_encoding(sf_dir: str):
    """Leakage-free K-fold target encoding (the CatBoost/Kaggle
    feature-engineering staple): the encoded value of category
    `event_type` for a row in fold f is the target mean computed on
    the OTHER folds — (S−S_f)/(n−n_f) — so no row sees its own
    target. Folds by user hash (user_id % 5) keep each user's rows in
    one fold (the group-leakage rule). Targets quantize to 1e-4
    fixed-point per row BEFORE summing (the Q6 discipline), making
    every sum and the final floor division exact integers.

    Exchange: one (type, fold) cells-bounded partial aggregate; the
    leave-fold-out arithmetic is a driver-side fold over that tiny
    table."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "user_id", "value"])

    def prep(b: pa.Table) -> pa.Table:
        u = np.asarray(b["user_id"].combine_chunks(), dtype=np.int64)
        v = np.asarray(b["value"].combine_chunks(), dtype=np.float64)
        return pa.table({
            "event_type": b["event_type"],
            "fold": pa.array(u % 5),
            "v4": pa.array(np.floor(v * 10000 + 0.5).astype(np.int64)),
        })

    pf = grouped_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["event_type", "fold"],
        [("*", "count", "n_f"), ("v4", "sum", "s_f")]).to_pandas()
    g = pf.groupby("event_type").agg(n=("n_f", "sum"),
                                     s=("s_f", "sum"))
    rows = []
    for r in pf.itertuples(index=False):
        n, s = int(g.loc[r.event_type, "n"]), int(g.loc[r.event_type, "s"])
        nf, sf = int(r.n_f), int(r.s_f)
        enc = -1 if n - nf == 0 else (s - sf) // (n - nf)
        rows.append((r.event_type, int(r.fold), nf, enc))
    rows.sort()
    return pa.table({
        "event_type": pa.array([r[0] for r in rows], pa.string()),
        "fold": pa.array([r[1] for r in rows], pa.int64()),
        "n_fold": pa.array([r[2] for r in rows], pa.int64()),
        "enc_mean_e4": pa.array([r[3] for r in rows], pa.int64()),
    })


@query(
    "events_user_growth",
    """
WITH f AS (
  SELECT user_id,
         MIN(CAST(FLOOR(epoch(ts) / 86400) AS BIGINT)) AS first_d
  FROM events GROUP BY 1
), days AS (
  SELECT DISTINCT CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) AS d
  FROM events
), n AS (SELECT first_d, COUNT(*) AS new_users FROM f GROUP BY 1)
SELECT days.d AS day,
       CAST(COALESCE(n.new_users, 0) AS BIGINT) AS new_users,
       CAST(SUM(COALESCE(n.new_users, 0))
            OVER (ORDER BY days.d ROWS BETWEEN UNBOUNDED PRECEDING
                  AND CURRENT ROW) AS BIGINT) AS cumulative_users
FROM days LEFT JOIN n ON n.first_d = days.d""",
)
def events_user_growth(sf_dir: str):
    """User acquisition / growth curve: per observed day, the number
    of FIRST-EVER-seen users (new) and the cumulative distinct user
    count to date — the top-line growth chart, and the complement to
    the trailing-window WAU (`events_rolling_distinct_users`).
    Cumulative distinct needs only each user's FIRST day, so the
    whole curve costs one per-user MIN (the key-compressed hash
    aggregate) plus a day-bounded count and a driver prefix sum —
    never a per-day distinct pass."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate, grouped_aggregate_ds

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])

    def to_day(b: pa.Table) -> pa.Table:
        t = (np.asarray(b["ts"].combine_chunks())
             .astype("datetime64[us]").astype(np.int64))
        return pa.table({
            "user_id": b["user_id"],
            "d": pa.array(np.floor(t / 1e6 / 86400).astype(np.int64)),
        })

    dd = ds.map_batches(to_day, batch_format="pyarrow", batch_size=None)
    first = grouped_aggregate_ds(dd, ["user_id"], [("d", "min", "f")],
                                 num_partitions=8)
    newc = grouped_aggregate(first, ["f"],
                             [("*", "count", "new_users")]).to_pandas()
    obs = grouped_aggregate(dd, ["d"],
                            [("*", "count", "_c")]).to_pandas()
    days = np.sort(obs["d"].to_numpy(dtype=np.int64))
    nu = {int(r.f): int(r.new_users) for r in newc.itertuples(index=False)}
    new_arr = np.array([nu.get(int(d), 0) for d in days], dtype=np.int64)
    return pa.table({
        "day": pa.array(days),
        "new_users": pa.array(new_arr),
        "cumulative_users": pa.array(np.cumsum(new_arr)),
    })
