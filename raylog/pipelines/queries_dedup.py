"""Deduplication families, similarity search, multimodal.

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

# Training-data ops: deduplication
# --------------------------------------------------------------------------

@query(
    "dedup_incremental",
    """
SELECT b.doc_id FROM documents b
WHERE b.doc_id % 3 <> 0 AND NOT EXISTS (
  SELECT 1 FROM documents a
  WHERE a.doc_id % 3 = 0
    AND substr(a.text, 1, 40) = substr(b.text, 1, 40))""",
)
def dedup_incremental(sf_dir: str):
    """Incremental (cross-corpus) dedup: drop incoming docs whose
    content key already exists in a reference corpus — the "dedup new
    crawl against what we already trained on" operation. Reference =
    ``doc_id % 3 == 0``, incoming = the rest; key = 128-bit xxhash of
    the 40-char content prefix (prefix collisions exist in the fixture,
    so the path is genuinely exercised).

    Scale shape — a symmetric bloom-join: (1) a Bloom filter over the
    reference keys is built DISTRIBUTED (one m/8-byte bitmap partial
    per block, OR-merged — exchange volume independent of corpus size)
    and broadcast via ``ray.put``; incoming batches probe it
    vectorized, and bloom-NEGATIVE rows (definitely new) stream
    straight to the output. (2) The positive sliver is verified
    exactly: a second bloom built over the candidates prunes the
    reference side to possibly-matching keys, then both tiny sides
    co-group inside hash partitions (``partitioned_group_apply`` —
    complete key groups per partition, one vectorized membership pass;
    no acero join, which mis-handles empty shuffle partitions). The
    verify exchange is bounded by candidate volume + the FP slivers,
    never by either corpus. Exactness is restored by the verify, so
    the oracle is the exact NOT EXISTS.
    """
    import numpy as np
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    from raylog.functions.agg import partitioned_group_apply
    from raylog.functions.dedup import add_content_h128
    from raylog.functions.sketch import bloom_build, bloom_probe

    M_BITS, K = 1 << 20, 4

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def keyed(b: pa.Table) -> pa.Table:
        pref = pc.utf8_slice_codeunits(b["text"].combine_chunks(), 0, 40)
        t = pa.table({"doc_id": b["doc_id"], "prefix": pref})
        return add_content_h128(t, "prefix").select(
            ["doc_id", "content_h1", "content_h2"])

    def side(b: pa.Table, ref_side: bool) -> pa.Table:
        ids = np.asarray(b["doc_id"].combine_chunks(), dtype=np.int64)
        m = (ids % 3 == 0) if ref_side else (ids % 3 != 0)
        return b.filter(pa.array(m))

    keys = ds.map_batches(keyed, batch_format="pyarrow", batch_size=None)
    ref = keys.map_batches(lambda b: side(b, True),
                           batch_format="pyarrow", batch_size=None)
    inc = keys.map_batches(lambda b: side(b, False),
                           batch_format="pyarrow", batch_size=None)

    bloom = bloom_build(ref, m_bits=M_BITS, k=K)
    bloom_ref = ray.put(bloom) if ray.is_initialized() else bloom

    def probe(b: pa.Table) -> pa.Table:
        bl = (ray.get(bloom_ref) if ray.is_initialized() else bloom_ref)
        h1 = np.asarray(b["content_h1"].combine_chunks()).astype(np.uint64)
        h2 = np.asarray(b["content_h2"].combine_chunks()).astype(np.uint64)
        return b.append_column(
            "maybe", pa.array(bloom_probe(h1, h2, bl, M_BITS, K)))

    flagged = inc.map_batches(probe, batch_format="pyarrow", batch_size=None)
    negatives = flagged.map_batches(
        lambda b: b.filter(pc.invert(b["maybe"])).select(["doc_id"]),
        batch_format="pyarrow", batch_size=None)
    candidates = flagged.map_batches(
        lambda b: b.filter(b["maybe"]).select(
            ["doc_id", "content_h1", "content_h2"]),
        batch_format="pyarrow", batch_size=None)

    # symmetric reduction: prune the reference side to keys that might
    # match a candidate, via a bloom over the candidates themselves
    cand_bloom = bloom_build(candidates, m_bits=M_BITS, k=K)
    cb_ref = ray.put(cand_bloom) if ray.is_initialized() else cand_bloom

    def ref_prune(b: pa.Table) -> pa.Table:
        bl = (ray.get(cb_ref) if ray.is_initialized() else cb_ref)
        h1 = np.asarray(b["content_h1"].combine_chunks()).astype(np.uint64)
        h2 = np.asarray(b["content_h2"].combine_chunks()).astype(np.uint64)
        keep = bloom_probe(h1, h2, bl, M_BITS, K)
        return pa.table({
            "doc_id": pa.nulls(int(keep.sum()), pa.int64()),
            "content_h1": b["content_h1"].combine_chunks().filter(pa.array(keep)),
            "content_h2": b["content_h2"].combine_chunks().filter(pa.array(keep)),
            "is_ref": pa.nulls(int(keep.sum()), pa.int8()).fill_null(1),
        })

    ref_pruned = ref.map_batches(ref_prune, batch_format="pyarrow",
                                 batch_size=None)
    cand_m = candidates.map_batches(
        lambda b: b.append_column(
            "is_ref", pa.nulls(b.num_rows, pa.int8()).fill_null(0)),
        batch_format="pyarrow", batch_size=None)

    def verify(part: pa.Table) -> pa.Table:
        h1 = np.asarray(part["content_h1"].combine_chunks()).astype(np.uint64)
        h2 = np.asarray(part["content_h2"].combine_chunks()).astype(np.uint64)
        is_ref = np.asarray(part["is_ref"].combine_chunks(), dtype=np.int8)
        key = np.empty(len(h1), dtype=[("a", np.uint64), ("b", np.uint64)])
        key["a"], key["b"] = h1, h2
        _, inv = np.unique(key, return_inverse=True)
        in_ref = np.bincount(inv, weights=is_ref) > 0
        keep = (is_ref == 0) & ~in_ref[inv]
        return part.filter(pa.array(keep)).select(["doc_id"])

    verified = partitioned_group_apply(
        cand_m.union(ref_pruned), ["content_h1", "content_h2"], verify,
        num_partitions=8)
    return negatives.union(verified)


@query(
    "dedup_substring_coverage",
    """
WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
wins AS (
  SELECT doc_id,
         array_to_string(w[CAST(i AS INT):CAST(i + 7 AS INT)], ' ') AS gram
  FROM words, LATERAL (
    SELECT unnest(generate_series(1, len(w) - 7)) AS i
  ) g
),
gd AS (SELECT gram, COUNT(DISTINCT doc_id) AS nd FROM wins GROUP BY 1)
SELECT w.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_windows,
       CAST(SUM(CASE WHEN gd.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS dup_windows
FROM wins w JOIN gd USING (gram)
GROUP BY 1""",
)
def dedup_substring_coverage(sf_dir: str):
    """Exact substring dedup signal (Lee et al. 2022): per doc, how many
    of its 8-word windows occur verbatim in >= 2 distinct docs — the
    coverage a curation pass thresholds to drop or trim
    boilerplate-heavy documents. One hash exchange end to end: rolling
    window hashes partition by gram, distinct-doc counts + per-doc
    partials compute inside each partition, partials combine in the
    hash-partitioned aggregate."""
    import ray.data as rd

    from raylog.functions.dedup import substring_duplicate_coverage

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return substring_duplicate_coverage(ds, n=8, min_docs=2)


@query(
    "dedup_duplicate_spans",
    """
WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
wins AS (
  SELECT doc_id, i,
         array_to_string(w[CAST(i AS INT):CAST(i + 7 AS INT)], ' ') AS gram
  FROM words, LATERAL (
    SELECT unnest(generate_series(1, len(w) - 7)) AS i
  ) g
),
gd AS (SELECT gram, COUNT(DISTINCT doc_id) AS nd FROM wins GROUP BY 1),
dup AS (SELECT doc_id, i FROM wins JOIN gd USING (gram) WHERE nd >= 2),
isl AS (
  SELECT doc_id, i,
         CASE WHEN i - LAG(i) OVER (PARTITION BY doc_id ORDER BY i) <= 8
              THEN 0 ELSE 1 END AS brk
  FROM dup
),
grp AS (
  SELECT doc_id, i,
         SUM(brk) OVER (PARTITION BY doc_id ORDER BY i
                        ROWS UNBOUNDED PRECEDING) AS isl_id
  FROM isl
)
SELECT doc_id,
       CAST(MIN(i) - 1 AS BIGINT) AS span_start,
       CAST(MAX(i) + 8 - MIN(i) AS BIGINT) AS span_len
FROM grp GROUP BY doc_id, isl_id""",
)
def dedup_duplicate_spans(sf_dir: str):
    """Exact substring dedup, TRIM form (Lee et al. 2022 §4): the
    maximal word ranges of each doc covered by 8-word windows that
    occur verbatim in >= 2 distinct docs — the ranges a curation pass
    cuts out instead of dropping the doc. Islands-and-gaps over
    duplicated window starts, all three passes hash-partitioned."""
    import ray.data as rd

    from raylog.functions.dedup import duplicate_spans

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return duplicate_spans(ds, n=8, min_docs=2)


@query(
    "dedup_trim_spans",
    """
WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
wins AS (
  SELECT doc_id, i,
         array_to_string(w[CAST(i AS INT):CAST(i + 7 AS INT)], ' ') AS gram
  FROM words, LATERAL (
    SELECT unnest(generate_series(1, len(w) - 7)) AS i
  ) g
),
gd AS (SELECT gram, COUNT(DISTINCT doc_id) AS nd FROM wins GROUP BY 1),
dup AS (SELECT doc_id, i FROM wins JOIN gd USING (gram) WHERE nd >= 2),
pos AS (
  SELECT doc_id, j, w[CAST(j AS INT)] AS word
  FROM words, LATERAL (
    SELECT unnest(generate_series(1, len(w))) AS j
  ) g
),
kept AS (
  SELECT p.doc_id, p.j, p.word
  FROM pos p
  WHERE NOT EXISTS (
    SELECT 1 FROM dup d
    WHERE d.doc_id = p.doc_id AND p.j >= d.i AND p.j < d.i + 8
  )
)
SELECT d.doc_id,
       coalesce(k.text_trimmed, '') AS text_trimmed,
       CAST(len(string_split(d.text, ' ')) - coalesce(k.n_kept, 0)
            AS BIGINT) AS n_removed
FROM documents d LEFT JOIN (
  SELECT doc_id, array_to_string(array_agg(word ORDER BY j), ' ')
           AS text_trimmed,
         COUNT(*) AS n_kept
  FROM kept GROUP BY doc_id
) k USING (doc_id)""",
)
def dedup_trim_spans(sf_dir: str):
    """APPLY the exact-substring trim: the corpus with every
    cross-doc-duplicated 8-word range removed (the keep-one-remove-rest
    output of Lee et al. 2022 at span granularity — here all duplicated
    occurrences are cut; a keep-one policy is one extra min-doc rank).
    Word surgery is vectorized: interval removals scatter into a diff
    array, the kept words re-offset through one ListArray +
    binary_join."""
    import ray.data as rd

    from raylog.functions.dedup import trim_duplicate_spans

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return trim_duplicate_spans(ds, n=8, min_docs=2)


@query(
    "dedup_trim_keep_one",
    """
WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
wins AS (
  SELECT doc_id, i,
         array_to_string(w[CAST(i AS INT):CAST(i + 7 AS INT)], ' ') AS gram
  FROM words, LATERAL (
    SELECT unnest(generate_series(1, len(w) - 7)) AS i
  ) g
),
gstat AS (
  SELECT gram, COUNT(DISTINCT doc_id) AS nd FROM wins GROUP BY 1
),
ranked AS (
  SELECT w.doc_id, w.i, g.nd,
         ROW_NUMBER() OVER (PARTITION BY w.gram
                            ORDER BY w.doc_id, w.i) AS occ_rank
  FROM wins w JOIN gstat g USING (gram)
),
dup AS (
  SELECT doc_id, i FROM ranked WHERE nd >= 2 AND occ_rank > 1
),
pos AS (
  SELECT doc_id, j, w[CAST(j AS INT)] AS word
  FROM words, LATERAL (
    SELECT unnest(generate_series(1, len(w))) AS j
  ) g
),
kept AS (
  SELECT p.doc_id, p.j, p.word
  FROM pos p
  WHERE NOT EXISTS (
    SELECT 1 FROM dup d
    WHERE d.doc_id = p.doc_id AND p.j >= d.i AND p.j < d.i + 8
  )
)
SELECT d.doc_id,
       coalesce(k.text_trimmed, '') AS text_trimmed,
       CAST(len(string_split(d.text, ' ')) - coalesce(k.n_kept, 0)
            AS BIGINT) AS n_removed
FROM documents d LEFT JOIN (
  SELECT doc_id, array_to_string(array_agg(word ORDER BY j), ' ')
           AS text_trimmed,
         COUNT(*) AS n_kept
  FROM kept GROUP BY doc_id
) k USING (doc_id)""",
)
def dedup_trim_keep_one(sf_dir: str):
    """keep-one-remove-rest span trim (the literal Lee et al. 2022
    policy): the globally first occurrence of each duplicated 8-word
    passage (min doc_id, then min position) survives; every other
    occurrence is cut. The exemption is computed inside the gram's hash
    partition — a gram's occurrences are co-located by construction."""
    import ray.data as rd

    from raylog.functions.dedup import trim_duplicate_spans

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return trim_duplicate_spans(ds, n=8, min_docs=2, keep="first")


@query(
    "curation_trim_repack",
    """
WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
wins AS (
  SELECT doc_id, i,
         array_to_string(w[CAST(i AS INT):CAST(i + 7 AS INT)], ' ') AS gram
  FROM words, LATERAL (
    SELECT unnest(generate_series(1, len(w) - 7)) AS i
  ) g
),
gd AS (SELECT gram, COUNT(DISTINCT doc_id) AS nd FROM wins GROUP BY 1),
dup AS (SELECT doc_id, i FROM wins JOIN gd USING (gram) WHERE nd >= 2),
pos AS (
  SELECT doc_id, j
  FROM words, LATERAL (
    SELECT unnest(generate_series(1, len(w))) AS j
  ) g
),
keptc AS (
  SELECT p.doc_id, COUNT(*) AS n_kept
  FROM pos p
  WHERE NOT EXISTS (
    SELECT 1 FROM dup d
    WHERE d.doc_id = p.doc_id AND p.j >= d.i AND p.j < d.i + 8
  )
  GROUP BY p.doc_id
),
t2 AS (
  SELECT d.doc_id, d.doc_id % 8 AS shard,
         CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_tok2
  FROM documents d LEFT JOIN keptc k USING (doc_id)
),
c AS (
  SELECT shard, doc_id, n_tok2,
         SUM(n_tok2) OVER (PARTITION BY shard ORDER BY doc_id
                           ROWS UNBOUNDED PRECEDING) AS cum
  FROM t2
)
SELECT shard, doc_id, n_tok2,
       CAST((cum - n_tok2) // 512 AS BIGINT) AS first_pack,
       CAST(CASE WHEN n_tok2 > 0 THEN (cum - 1) // 512
            ELSE (cum - n_tok2) // 512 END AS BIGINT) AS last_pack
FROM c""",
)
def curation_trim_repack(sf_dir: str):
    """Composite curation chain over the round-3 operators: exact
    substring TRIM (all duplicated 8-word ranges removed) → re-count
    tokens on the trimmed text → REPACK into 512-token windows — the
    point being that dedup changes token counts, so window assignments
    must be recomputed downstream of it. Each stage keeps its
    distributed shape (trim's two hash exchanges, packing's per-shard
    closed form); the oracle replays the whole chain in one SQL
    statement."""
    import numpy as np

    import pyarrow.compute as pc
    import ray.data as rd

    from raylog.functions.dedup import trim_duplicate_spans
    from raylog.functions.packing import pack_chunks

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    trimmed = trim_duplicate_spans(ds, n=8, min_docs=2)

    def recount(b: pa.Table) -> pa.Table:
        txt = b["text_trimmed"].combine_chunks()
        n2 = np.asarray(pc.list_value_length(
            pc.split_pattern(txt, pattern=" ")), dtype=np.int64)
        empty = np.asarray(pc.equal(txt, ""), dtype=bool)
        n2 = np.where(empty, 0, n2)
        return pa.table({
            "doc_id": b["doc_id"],
            "n_tok2": pa.array(n2),
        })

    counted = trimmed.map_batches(recount, batch_format="pyarrow",
                                  batch_size=None)
    packed = pack_chunks(counted, id_col="doc_id", len_col="n_tok2",
                         max_tokens=512, num_shards=8, num_partitions=8,
                         keep_len=True)
    return packed.map_batches(
        lambda b: b.drop_columns(["first_offset"]),
        batch_format="pyarrow", batch_size=None)


@query(
    "corpus_snapshot_diff",
    """
WITH b AS (
  SELECT doc_id, CASE WHEN doc_id % 7 = 0 THEN text || ' v2'
                      ELSE text END AS text
  FROM documents WHERE doc_id % 11 <> 0
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, 'new ' || text AS text
  FROM documents WHERE doc_id % 13 = 0
)
SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
       CASE WHEN a.doc_id IS NULL THEN 'added'
            WHEN b.doc_id IS NULL THEN 'removed'
            WHEN a.text = b.text THEN 'same'
            ELSE 'changed' END AS status
FROM documents a FULL OUTER JOIN b USING (doc_id)""",
)
def corpus_snapshot_diff(sf_dir: str):
    """Snapshot diff: per doc id, added / removed / changed / same
    between corpus v1 (the documents table) and a deterministic v2
    (docs %11 dropped, %7 text-edited, %13 re-added under new ids) —
    the primitive an incremental curation run uses to process only the
    delta. Hash-only exchange (~24 B/doc), content never moves."""
    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd

    from raylog.functions.dedup import snapshot_diff

    a = rd.read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "text"])

    def to_v2(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["doc_id"].combine_chunks(), dtype=np.int64)
        txt = batch["text"].combine_chunks()
        keep = ids % 11 != 0
        edited = pc.if_else(
            pa.array(ids % 7 == 0),
            pc.binary_join_element_wise(txt, pa.scalar(" v2"), ""),
            txt)
        kept = pa.table({"doc_id": pa.array(ids),
                         "text": edited}).filter(pa.array(keep))
        newm = ids % 13 == 0
        new = pa.table({
            "doc_id": pa.array(ids[newm] + 1_000_000),
            "text": pc.binary_join_element_wise(
                pa.scalar("new "), txt.filter(pa.array(newm)), ""),
        })
        return pa.concat_tables([kept, new])

    b = a.map_batches(to_v2, batch_format="pyarrow", batch_size=None)
    return snapshot_diff(a, b)


@query(
    "dedup_token_substring",
    _P() + """
, wins AS (
  SELECT doc_id,
         array_to_string(tokens[CAST(i AS INT):CAST(i + 7 AS INT)], ',')
           AS gram
  FROM recs2, LATERAL (
    SELECT unnest(generate_series(1, len(tokens) - 7)) AS i
  ) g
),
gd AS (SELECT gram, COUNT(DISTINCT doc_id) AS nd FROM wins GROUP BY 1)
SELECT w.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_windows,
       CAST(SUM(CASE WHEN gd.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS dup_windows
FROM wins w JOIN gd USING (gram)
GROUP BY 1""",
)
def dedup_token_substring(sf_dir: str):
    """Exact substring dedup on the PRE-TOKENIZED payload: duplicated
    8-TOKEN windows of the sequences table's `tokens` arrays (the
    input_hint column), no word hashing at all — windows slide over the
    raw int32 ids. Same one-exchange shape as the text form
    (`dedup_substring_coverage` with token_col)."""
    from raylog.functions.dedup import substring_duplicate_coverage
    from raylog.pipelines import log_pipeline as LP

    ds = LP.records_ds(sf_dir).select_columns(["doc_id", "tokens"])
    return substring_duplicate_coverage(ds, token_col="tokens", n=8,
                                        min_docs=2)


@query(
    "dedup_winnow_fingerprints",
    _P() + """
, g0 AS (
  SELECT doc_id, i AS pos,
         CAST(tokens[CAST(i AS INT) + 1] AS BIGINT) AS t0,
         CAST(tokens[CAST(i AS INT) + 2] AS BIGINT) AS t1,
         CAST(tokens[CAST(i AS INT) + 3] AS BIGINT) AS t2
  FROM recs2, LATERAL (
    SELECT unnest(generate_series(0, len(tokens) - 3)) AS i
  ) s
  WHERE len(tokens) >= 3
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
), ng AS (
  SELECT doc_id, COUNT(*) AS n_grams FROM grams GROUP BY 1
)
SELECT s.doc_id,
       CAST(ng.n_grams AS BIGINT) AS n_grams,
       CAST(COUNT(*) AS BIGINT) AS n_fp,
       CAST(SUM((s.h * (s.spos + 1)) % 2147483647) AS BIGINT) AS fp_sum
FROM sel s JOIN ng USING (doc_id)
GROUP BY 1, 2""",
)
def dedup_winnow_fingerprints(sf_dir: str):
    """Winnowing fingerprints (Schleimer, Wilkerson & Aiken 2003 — the
    MOSS plagiarism-detection scheme): select the rightmost minimum of
    every 4-window of token-3-gram Horner hashes (mod 2^31−1, exactly
    SQL-evaluable), clipped at the doc start. The selected set is the
    standard density-2/(w+1) sub-sampled fingerprint family for
    near-dup detection at scale; this query materializes per-doc
    fingerprint counts + a position-weighted checksum (each h·(pos+1)
    term reduced mod 2^31−1 before an exact int64 segment sum, so the
    checksum stays BIGINT-representable at any document length).
    Map-only: grams never leave their batch, zero exchange, one output
    row per doc."""
    from raylog.functions.dedup import winnow_batch
    from raylog.pipelines import log_pipeline as LP

    ds = LP.records_ds(sf_dir).select_columns(["doc_id", "tokens"])
    return ds.map_batches(winnow_batch, batch_format="pyarrow",
                          batch_size=None)


@query(
    "dedup_cross_source_matrix",
    """
WITH h AS (SELECT DISTINCT source, substr(text, 1, 40) AS k
           FROM documents)
SELECT a.source AS source_a, b.source AS source_b,
       CAST(COUNT(*) AS BIGINT) AS dup_docs
FROM h a JOIN h b ON a.k = b.k AND a.source < b.source
GROUP BY 1, 2""",
)
def dedup_cross_source_matrix(sf_dir: str):
    """Cross-source duplication matrix: distinct (content, source)
    pairs shared between each unordered source pair, keyed on the
    40-char content prefix (the fixture carries prefix collisions, the
    same key dedup_incremental exercises; full-content keys are the
    key_prefix=None form) — the attribution report for deciding which
    feed to dedup against which. Content keys are the 128-bit
    vectorized hashes (exact-dedup collision regime); source-pair
    combos emit inside hash partitions and the final aggregate is
    source²-bounded."""
    import ray.data as rd

    from raylog.functions.dedup import cross_source_dup_matrix

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "source"])
    return cross_source_dup_matrix(ds, key_prefix=40)


@query(
    "tokens_fim_transform",
    _P() + """
, base AS (
  SELECT doc_id, tokens, len(tokens) AS n,
         (doc_id * 2654435761) % 4294967296 AS coin
  FROM recs2
), sp AS (
  SELECT doc_id, tokens, n, coin,
         coin % 2 = 0 AS fim,
         (coin // 2) % (n + 1) AS s1
  FROM base
), sp2 AS (
  SELECT *, s1 + (coin // 1024) % (n - s1 + 1) AS s2 FROM sp
), tok AS (
  SELECT doc_id, fim, s1, s2, n, g.i,
         CAST(tokens[CAST(g.i AS INT)] AS BIGINT) AS t,
         CASE WHEN NOT fim THEN g.i
              WHEN g.i <= s1 THEN g.i + 1
              WHEN g.i > s2 THEN s1 + 2 + (g.i - s2)
              ELSE s1 + (n - s2) + 3 + (g.i - s1) END AS np
  FROM sp2, LATERAL (
    SELECT unnest(generate_series(1, n)) AS i
  ) g
), per AS (
  SELECT doc_id, CAST(COALESCE(SUM(np * t), 0) AS BIGINT) AS tok_sum
  FROM tok GROUP BY 1
)
SELECT s.doc_id, s.fim,
       CAST(CASE WHEN s.fim THEN s.n + 3 ELSE s.n END AS BIGINT) AS n_out,
       CAST(COALESCE(p.tok_sum, 0)
            + CASE WHEN s.fim
                   THEN 50021 + (s.s1 + 2) * 50022
                        + (s.s1 + s.n - s.s2 + 3) * 50023
                   ELSE 0 END AS BIGINT) AS fim_checksum
FROM sp2 s LEFT JOIN per p USING (doc_id)""",
)
def tokens_fim_transform(sf_dir: str):
    """Fill-in-the-middle (PSM) training-data transform (Bavarian et
    al. 2022): a deterministic coin selects half the docs to reorder as
    [PRE] prefix [SUF] suffix [MID] middle with coin-derived split
    points. The per-doc checksum is the position-weighted sum over the
    transformed sequence incl. sentinel ids — computed map-only with no
    materialized reorder (weighted range sums over the flat stream),
    and exactly restated by the oracle's CASE-mapped positions."""
    from raylog.functions.tokens import fim_transform_batch
    from raylog.pipelines import log_pipeline as LP

    ds = LP.records_ds(sf_dir).select_columns(["doc_id", "tokens"])
    return ds.map_batches(fim_transform_batch, batch_format="pyarrow",
                          batch_size=None)


@query(
    "tokens_oov_by_source",
    _P() + """
, f AS (
  SELECT source, CAST(unnest(tokens) AS BIGINT) AS token FROM recs2
), c AS (SELECT token, COUNT(*) AS cnt FROM f GROUP BY 1),
v AS (
  SELECT token FROM (
    SELECT token, ROW_NUMBER() OVER (ORDER BY cnt DESC, token) AS rnk
    FROM c
  ) WHERE rnk <= 10000
)
SELECT f.source,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_oov,
       CAST((1000 * SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END))
            // COUNT(*) AS BIGINT) AS oov_milli
FROM f LEFT JOIN v USING (token)
GROUP BY 1""",
)
def tokens_oov_by_source(sf_dir: str):
    """Per-source out-of-vocabulary rate against the GLOBAL top-10k
    token vocabulary — the per-feed OOV budget a tokenizer-freeze
    decision reads. Two passes: the vocab-bounded global counts pick
    the top-k (deterministic cnt DESC, token ASC rank), the id set
    broadcasts via ray.put, and a map-only second pass aggregates
    per-source membership counts (source-cardinality-bounded)."""
    import numpy as np
    import ray

    from raylog.functions.agg import grouped_aggregate
    from raylog.functions.tokens import token_frequencies
    from raylog.pipelines import log_pipeline as LP

    recs = LP.records_ds(sf_dir).select_columns(["source", "tokens"])
    freqs = token_frequencies(recs.select_columns(["tokens"])).to_pandas()
    freqs = freqs.sort_values(["cnt", "token"],
                              ascending=[False, True], kind="mergesort")
    top = np.sort(freqs["token"].to_numpy(dtype=np.int64)[:10000])
    top_ref = ray.put(top) if ray.is_initialized() else top

    def partial(b: pa.Table) -> pa.Table:
        vocab = (ray.get(top_ref) if not isinstance(top_ref, np.ndarray)
                 else top_ref)
        toks = b["tokens"]
        toks = (toks.combine_chunks()
                if isinstance(toks, pa.ChunkedArray) else toks)
        off = pa.compute.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        vals = np.asarray(toks.values, dtype=np.int64)
        o = np.asarray(toks.offsets, dtype=np.int64)
        vals = vals[o[0]: o[-1]]
        oov = ~np.isin(vals, vocab)
        src_idx = np.repeat(np.arange(len(off), dtype=np.int64), off)
        srcs = np.asarray(b["source"].combine_chunks().to_pylist(),
                          dtype=object)
        n_tok = np.bincount(src_idx, minlength=len(off)).astype(np.int64)
        n_oov = np.bincount(src_idx, weights=oov.astype(np.float64),
                            minlength=len(off)).astype(np.int64)
        return pa.table({
            "source": pa.array(srcs, pa.string()),
            "n_tokens": pa.array(n_tok),
            "n_oov": pa.array(n_oov),
        })

    agg = grouped_aggregate(
        recs.map_batches(partial, batch_format="pyarrow",
                         batch_size=None),
        ["source"], [("n_tokens", "sum", "n_tokens"),
                     ("n_oov", "sum", "n_oov")])
    return pa.table({
        "source": agg["source"],
        "n_tokens": agg["n_tokens"],
        "n_oov": agg["n_oov"],
        "oov_milli": pa.array(
            1000 * np.asarray(agg["n_oov"], dtype=np.int64)
            // np.asarray(agg["n_tokens"], dtype=np.int64)),
    })


@query(
    "tokens_vocab_coverage",
    _P() + """
, f AS (SELECT CAST(unnest(tokens) AS BIGINT) AS token FROM recs2),
c AS (SELECT token, COUNT(*) AS cnt FROM f GROUP BY 1),
r AS (
  SELECT cnt,
         ROW_NUMBER() OVER (ORDER BY cnt DESC, token) AS rnk,
         CAST(SUM(cnt) OVER (ORDER BY cnt DESC, token
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
  FROM c
), t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM c)
SELECT CAST(k.k AS BIGINT) AS top_k,
       CAST((1000 * COALESCE(
          (SELECT MAX(cum) FROM r WHERE rnk <= k.k), 0)) // t.total
          AS BIGINT) AS coverage_milli
FROM (VALUES (100), (1000), (5000), (10000), (20000), (50000)) k(k), t""",
)
def tokens_vocab_coverage(sf_dir: str):
    """Vocabulary coverage curve: the fraction of all corpus tokens
    covered by the top-k most frequent token ids, for a ladder of k —
    the standard tokenizer-sizing / OOV-budget diagnostic. Counts come
    from the vocab-bounded mergeable partials (`token_frequencies`, no
    shuffle); the curve itself is a vocab-sized driver cumsum. Integer
    milli units, deterministic (cnt DESC, token ASC) rank order."""
    import numpy as np

    from raylog.functions.tokens import token_frequencies
    from raylog.pipelines import log_pipeline as LP

    freqs = token_frequencies(
        LP.records_ds(sf_dir).select_columns(["tokens"])).to_pandas()
    freqs = freqs.sort_values(["cnt", "token"],
                              ascending=[False, True], kind="mergesort")
    cnt = freqs["cnt"].to_numpy(dtype=np.int64)
    cum = np.cumsum(cnt)
    total = int(cum[-1]) if len(cum) else 0
    ks = [100, 1000, 5000, 10000, 20000, 50000]
    cov = [int(1000 * int(cum[min(k, len(cum)) - 1]) // total)
           if len(cum) and total else 0 for k in ks]
    return pa.table({
        "top_k": pa.array(ks, pa.int64()),
        "coverage_milli": pa.array(cov, pa.int64()),
    })


@query(
    "tokens_repetition_fraction",
    _P() + """
, g AS (
  SELECT doc_id,
         CAST(tokens[CAST(i AS INT) + 1] AS BIGINT) * 4398046511104
         + CAST(tokens[CAST(i AS INT) + 2] AS BIGINT) * 2097152
         + CAST(tokens[CAST(i AS INT) + 3] AS BIGINT) AS key
  FROM recs2, LATERAL (
    SELECT unnest(generate_series(0, len(tokens) - 3)) AS i
  ) s
  WHERE len(tokens) >= 3
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(COUNT(DISTINCT key) AS BIGINT) AS n_distinct,
       CAST((1000 * (COUNT(*) - COUNT(DISTINCT key))) // COUNT(*)
            AS BIGINT) AS rep_milli
FROM g GROUP BY 1""",
)
def tokens_repetition_fraction(sf_dir: str):
    """Within-document repeated-trigram fraction over the token payload
    — the Gopher-style degenerate-text filter (Rae et al. 2021 §A2).
    Gram identity is exact positional packing (token < 2^21 into one
    int64, 2^21·2^21 = 4398046511104/2097152 multipliers), so the
    DuckDB DISTINCT oracle matches with zero collision risk. Map-only:
    zero exchange, one row per doc."""
    from raylog.functions.tokens import repetition_fraction_batch
    from raylog.pipelines import log_pipeline as LP

    ds = LP.records_ds(sf_dir).select_columns(["doc_id", "tokens"])
    return ds.map_batches(repetition_fraction_batch,
                          batch_format="pyarrow", batch_size=None)


@query(
    "dedup_winnow_pairs",
    _P() + """
, g0 AS (
  SELECT doc_id, i AS pos,
         CAST(tokens[CAST(i AS INT) + 1] AS BIGINT) AS t0,
         CAST(tokens[CAST(i AS INT) + 2] AS BIGINT) AS t1,
         CAST(tokens[CAST(i AS INT) + 3] AS BIGINT) AS t2
  FROM recs2, LATERAL (
    SELECT unnest(generate_series(0, len(tokens) - 3)) AS i
  ) s
  WHERE len(tokens) >= 3
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
  SELECT DISTINCT p.doc_id, g.h
  FROM picked p JOIN grams g
    ON g.doc_id = p.doc_id AND g.pos = p.spos
), dl AS (
  SELECT doc_id, COUNT(*) AS dlen FROM sel GROUP BY 1
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
  FROM sel a JOIN sel b ON a.h = b.h AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT p.doc_a, p.doc_b, CAST(p.shared AS BIGINT) AS shared,
       CAST((1000 * p.shared) // (da.dlen + db.dlen - p.shared)
            AS BIGINT) AS jacc_milli
FROM pairs p
JOIN dl da ON da.doc_id = p.doc_a
JOIN dl db ON db.doc_id = p.doc_b
WHERE p.shared >= 2
  AND (1000 * p.shared) // (da.dlen + db.dlen - p.shared) >= 300""",
)
def dedup_winnow_pairs(sf_dir: str):
    """Near-dup candidate pairs from shared winnowed fingerprints (the
    MOSS pairing step): docs sharing ≥ 2 selected fingerprint hashes,
    with the winnowed-set Jaccard. The inverted index holds only the
    density-2/(w+1) winnowed subset — ~2/(w+1) of the exact ngram-pair
    path's posting exchange — while the winnowing guarantee still
    surfaces every pair sharing a w+k−1-token run. Integer arithmetic
    end to end; the oracle replays selection + pairing in SQL."""
    from raylog.functions.dedup import winnow_pairs
    from raylog.pipelines import log_pipeline as LP

    ds = LP.records_ds(sf_dir).select_columns(["doc_id", "tokens"])
    return winnow_pairs(ds, min_shared=2, min_jacc_milli=300)


@query(
    "dedup_exact_sequences",
    _P() + """
SELECT MIN(doc_id) AS doc_id FROM recs2 GROUP BY tokens""",
)
def dedup_exact_sequences(sf_dir: str):
    """Exact dedup of identical TOKEN SEQUENCES — the payload-axis
    form of keep-first dedup: the oracle groups by the list itself,
    the engine exchanges two vectorized 64-bit polynomial sequence
    hashes per row (never the arrays) and keep-firsts through the
    hash-partitioned aggregate."""
    from raylog.functions.tokens import dedup_sequences
    from raylog.pipelines import log_pipeline as LP

    ds = LP.records_ds(sf_dir).select_columns(["doc_id", "tokens"])
    return dedup_sequences(ds)


@query(
    "dedup_prefix_survivors",
    _P() + """
, g AS (
  SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok, tokens[1:64] AS pfx
  FROM recs2 WHERE n_tok >= 64
), r AS (
  SELECT doc_id, n_tok,
         ROW_NUMBER() OVER (PARTITION BY pfx
                            ORDER BY n_tok DESC, doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY pfx) AS n_shared
  FROM g
)
SELECT doc_id, n_tok, CAST(n_shared AS BIGINT) AS n_shared
FROM r WHERE rn = 1""",
)
def dedup_prefix_survivors(sf_dir: str):
    """Truncated-duplicate dedup: docs sharing an identical 64-token
    prefix collapse to the LONGEST capture (re-crawls cut at different
    truncation points — invisible to exact sequence dedup, possibly
    under Jaccard thresholds). Hash-only exchange (two 64-bit prefix
    hashes/row); argmax-per-prefix in complete-group partitions; the
    oracle groups by the sliced list itself."""
    from raylog.functions.tokens import prefix_dedup_survivors
    from raylog.pipelines import log_pipeline as LP

    ds = LP.records_ds(sf_dir).select_columns(["doc_id", "tokens", "n_tok"])
    return prefix_dedup_survivors(ds)


@query(
    "dedup_exact",
    "SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text",
)
def dedup_exact(sf_dir: str):
    """Exact dedup survivors: hash-partitioned keep-first (min doc_id)."""
    import ray.data as rd

    from raylog.functions.dedup import exact_dedup_survivors

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return exact_dedup_survivors(ds)


@query(
    "dedup_ngram_pairs",
    """
WITH docs AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS (SELECT DISTINCT doc_id,
              list_extract(w, i) || ' ' || list_extract(w, i+1) || ' ' || list_extract(w, i+2) AS g
       FROM docs, UNNEST(generate_series(1, len(w) - 2)) AS t(i)
       WHERE len(w) >= 3),
sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
          FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2)
SELECT doc_a, doc_b,
       CAST(FLOOR(1000 * (c * 1.0 / (x.n + y.n - c))) AS BIGINT) AS jacc_milli
FROM inter JOIN sz x ON doc_a = x.doc_id JOIN sz y ON doc_b = y.doc_id
WHERE c * 1.0 / (x.n + y.n - c) >= 0.3""",
)
def dedup_ngram_pairs(sf_dir: str):
    """Exact n-gram Jaccard near-dup pairs (J >= 0.3, word 3-grams) via a
    distributed inverted shingle index."""
    import ray.data as rd

    from raylog.functions.dedup import ngram_jaccard_pairs

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ngram_jaccard_pairs(ds, threshold=0.3)


_NGRAM_PAIRS_CTE = """
docs AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS (SELECT DISTINCT doc_id,
              list_extract(w, i) || ' ' || list_extract(w, i+1) || ' ' || list_extract(w, i+2) AS g
       FROM docs, UNNEST(generate_series(1, len(w) - 2)) AS t(i)
       WHERE len(w) >= 3),
sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
          FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2),
np AS (SELECT doc_a, doc_b FROM inter
       JOIN sz x ON doc_a = x.doc_id JOIN sz y ON doc_b = y.doc_id
       WHERE c * 1.0 / (x.n + y.n - c) >= 0.3),
edges AS (SELECT doc_a AS ea, doc_b AS eb FROM np
          UNION SELECT doc_b, doc_a FROM np),
reach(ra, rb) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT r.ra, e.eb FROM reach r JOIN edges e ON r.rb = e.ea
),
cc AS (SELECT ra AS doc_id, MIN(rb) AS cluster_id FROM reach GROUP BY ra)"""


@query(
    "dedup_cc_clusters",
    "WITH RECURSIVE " + _NGRAM_PAIRS_CTE + """
SELECT doc_id, cluster_id FROM cc""",
)
def dedup_cc_clusters(sf_dir: str):
    """Dedup cluster resolution: distributed connected components
    (iterative min-label propagation — join + min-aggregate per round)
    over the exact n-gram near-dup pair graph. cluster_id = min doc_id
    in the component; singletons label themselves."""
    import ray.data as rd

    from raylog.functions.cc import connected_components
    from raylog.functions.dedup import ngram_jaccard_pairs

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    pairs = ngram_jaccard_pairs(docs, threshold=0.3)
    return connected_components(docs.select_columns(["doc_id"]), pairs)


@query(
    "dedup_cc_corpus",
    "WITH RECURSIVE " + _NGRAM_PAIRS_CTE + """
SELECT d.doc_id, d.source, d.n_chars
FROM documents d JOIN cc ON d.doc_id = cc.doc_id
WHERE cc.doc_id = cc.cluster_id""",
)
def dedup_cc_corpus(sf_dir: str):
    """Curated corpus after near-dup clustering: keep the min-doc_id
    representative of every cluster (hash join back to the doc table)."""
    import ray.data as rd

    from raylog.functions.cc import connected_components, dedup_survivors
    from raylog.functions.dedup import ngram_jaccard_pairs

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text", "source", "n_chars"])
    pairs = ngram_jaccard_pairs(
        docs.select_columns(["doc_id", "text"]), threshold=0.3)
    clusters = connected_components(docs.select_columns(["doc_id"]), pairs)
    out = dedup_survivors(
        docs.select_columns(["doc_id", "source", "n_chars"]), clusters)
    return out.select_columns(["doc_id", "source", "n_chars"])


@query(
    "dedup_keep_best",
    "WITH RECURSIVE " + _NGRAM_PAIRS_CTE + """,
q AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
         CAST(len(list_filter(string_split(text, ' '),
                              w -> w IN ('the', 'a'))) AS BIGINT) AS stop_hits
  FROM documents
), s AS (
  SELECT doc_id,
         CAST(FLOOR(1000 * (0.5 * LEAST(n_words / 40.0, 1.0)
                            + 0.5 * (1.0 - stop_hits * 1.0 / n_words)))
              AS BIGINT) AS score_milli
  FROM q
), r AS (
  SELECT cc.cluster_id, cc.doc_id, s.score_milli,
         ROW_NUMBER() OVER (PARTITION BY cc.cluster_id
                            ORDER BY s.score_milli DESC, cc.doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY cc.cluster_id) AS n_members
  FROM cc JOIN s USING (doc_id)
)
SELECT cluster_id, doc_id, score_milli,
       CAST(n_members AS BIGINT) AS n_members
FROM r WHERE rn = 1""",
)
def dedup_keep_best(sf_dir: str):
    """Quality-aware dedup: per near-dup cluster keep the HIGHEST
    quality-scored member (min doc_id on ties) instead of the min-id one
    — the keep rule production curation uses (retain the best copy).
    Composition: ngram CC clusters ⋈ vectorized quality scores →
    argmax-per-group inside complete-cluster hash partitions."""
    import ray.data as rd

    from raylog.functions.cc import connected_components, keep_best_per_cluster
    from raylog.functions.dedup import ngram_jaccard_pairs
    from raylog.functions.text import quality_scores

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    pairs = ngram_jaccard_pairs(docs, threshold=0.3)
    clusters = connected_components(docs.select_columns(["doc_id"]), pairs)
    scored = docs.map_batches(
        quality_scores, batch_format="pyarrow", batch_size=None,
    ).map_batches(
        lambda b: b.select(["doc_id", "score_milli"]),
        batch_format="pyarrow", batch_size=None,
    )
    return keep_best_per_cluster(scored, clusters)


@query(
    "dedup_dup_mass_by_source",
    """
WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
wins AS (
  SELECT doc_id,
         array_to_string(w[CAST(i AS INT):CAST(i + 7 AS INT)], ' ') AS gram
  FROM words, LATERAL (
    SELECT unnest(generate_series(1, len(w) - 7)) AS i
  ) g
),
gd AS (SELECT gram, COUNT(DISTINCT doc_id) AS nd FROM wins GROUP BY 1),
cov AS (
  SELECT w.doc_id, COUNT(*) AS n_windows,
         SUM(CASE WHEN gd.nd >= 2 THEN 1 ELSE 0 END) AS dup_windows
  FROM wins w JOIN gd USING (gram) GROUP BY 1
)
SELECT d.source,
       CAST(SUM(cov.n_windows) AS BIGINT) AS total_windows,
       CAST(SUM(cov.dup_windows) AS BIGINT) AS dup_windows,
       CAST(FLOOR(1000.0 * SUM(cov.dup_windows) / SUM(cov.n_windows))
            AS BIGINT) AS dup_mass_milli
FROM cov JOIN documents d USING (doc_id)
GROUP BY 1""",
)
def dedup_dup_mass_by_source(sf_dir: str):
    """Corpus duplicate-text MASS per source — the headline statistic of
    Lee et al. 2021 ("Deduplicating Training Data..."): what fraction of
    all 8-word window occurrences are verbatim duplicates across docs,
    broken down by source so the dirtiest feed is visible. Composes the
    substring-coverage exchange (one gram-hash pass) with a doc_id hash
    join to the source column and a sources-bounded rollup."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate
    from raylog.functions.dedup import substring_duplicate_coverage

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text", "source"])
    cov = substring_duplicate_coverage(
        docs.select_columns(["doc_id", "text"]), n=8, min_docs=2)
    from raylog.functions.agg import seed_join_side
    cov = seed_join_side(cov, pa.table({
        "doc_id": pa.array([-(1 << 62)], pa.int64()),
        "n_windows": pa.array([0], pa.int64()),
        "dup_windows": pa.array([0], pa.int64()),
    }))  # dup-free corpus -> empty side kills the join (SCALE.md)
    j = cov.join(docs.select_columns(["doc_id", "source"]),
                 join_type="inner", num_partitions=8, on=("doc_id",))
    agg = grouped_aggregate(
        j, ["source"],
        [("n_windows", "sum", "total_windows"),
         ("dup_windows", "sum", "dup_windows")],
    ).to_pandas()
    if "total_windows" not in agg.columns:  # dup-free corpus
        z = pa.array([], pa.int64())
        return pa.table({"source": pa.array([], pa.string()),
                         "total_windows": z, "dup_windows": z,
                         "dup_mass_milli": z})
    tw = agg["total_windows"].to_numpy(dtype=np.int64)
    dw = agg["dup_windows"].to_numpy(dtype=np.int64)
    return pa.table({
        "source": pa.array(agg["source"], pa.string()),
        "total_windows": pa.array(tw),
        "dup_windows": pa.array(dw),
        "dup_mass_milli": pa.array(
            np.floor(1000.0 * dw / tw).astype(np.int64)),
    })


@query(
    "corpus_dedup_funnel",
    """
WITH RECURSIVE s1 AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text),
d2 AS (SELECT d.doc_id, d.text FROM documents d JOIN s1 USING (doc_id)),
docs AS (SELECT doc_id, string_split(text, ' ') AS w FROM d2),
sh AS (SELECT DISTINCT doc_id,
              list_extract(w, i) || ' ' || list_extract(w, i+1) || ' ' || list_extract(w, i+2) AS g
       FROM docs, UNNEST(generate_series(1, len(w) - 2)) AS t(i)
       WHERE len(w) >= 3),
sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
          FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2),
np AS (SELECT doc_a, doc_b FROM inter
       JOIN sz x ON doc_a = x.doc_id JOIN sz y ON doc_b = y.doc_id
       WHERE c * 1.0 / (x.n + y.n - c) >= 0.3),
edges AS (SELECT doc_a AS ea, doc_b AS eb FROM np
          UNION SELECT doc_b, doc_a FROM np),
reach(ra, rb) AS (
  SELECT doc_id, doc_id FROM d2
  UNION
  SELECT r.ra, e.eb FROM reach r JOIN edges e ON r.rb = e.ea
),
cc AS (SELECT ra AS doc_id, MIN(rb) AS cluster_id FROM reach GROUP BY ra),
c0 AS (SELECT COUNT(*) AS n FROM documents),
c1 AS (SELECT COUNT(*) AS n FROM s1),
c2 AS (SELECT COUNT(*) AS n FROM cc WHERE doc_id = cluster_id)
SELECT 'raw' AS stage, (SELECT n FROM c0) AS docs_remaining,
       CAST(0 AS BIGINT) AS docs_removed
UNION ALL
SELECT 'exact', (SELECT n FROM c1),
       (SELECT n FROM c0) - (SELECT n FROM c1)
UNION ALL
SELECT 'near_dup', (SELECT n FROM c2),
       (SELECT n FROM c1) - (SELECT n FROM c2)""",
)
def corpus_dedup_funnel(sf_dir: str):
    """Staged dedup accounting (the funnel table every curation run
    publishes): raw → exact survivors → near-dup CC survivors, with
    docs removed per stage. Each stage's corpus feeds the next (near-dup
    runs on exact survivors only — the production order, since exact
    dupes would saturate the shingle index for free). All three counts
    are distributed aggregates; only the 3-row report exists driver-side."""
    import pyarrow.compute as pc
    import ray.data as rd

    from raylog.functions.cc import connected_components
    from raylog.functions.dedup import exact_dedup_survivors, ngram_jaccard_pairs

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    n_raw = docs.count()
    sur1 = exact_dedup_survivors(docs)
    docs2 = docs.join(sur1.map_batches(
        lambda b: b.select(["doc_id"]),
        batch_format="pyarrow", batch_size=None,
    ), join_type="inner", num_partitions=8, on=("doc_id",))
    n_exact = docs2.count()
    pairs = ngram_jaccard_pairs(docs2.select_columns(["doc_id", "text"]),
                                threshold=0.3)
    clusters = connected_components(docs2.select_columns(["doc_id"]), pairs)
    n_near = clusters.map_batches(
        lambda b: b.filter(pc.equal(b["doc_id"], b["cluster_id"])).select(
            ["doc_id"]),
        batch_format="pyarrow", batch_size=None,
    ).count()
    return pa.table({
        "stage": pa.array(["raw", "exact", "near_dup"], pa.string()),
        "docs_remaining": pa.array([n_raw, n_exact, n_near], pa.int64()),
        "docs_removed": pa.array(
            [0, n_raw - n_exact, n_exact - n_near], pa.int64()),
    })


@query("dedup_minhash_pairs", None)  # rows-only: probabilistic banding
def dedup_minhash_pairs(sf_dir: str):
    """MinHash+LSH near-dup pairs (64 hashes, 16 bands), Jaccard-verified.
    Non-SQL (seeded permutations); recall vs the exact baseline asserted
    in pytest."""
    import ray.data as rd

    from raylog.functions.dedup import minhash_lsh_pairs

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return minhash_lsh_pairs(ds, threshold=0.3)


@query("dedup_simhash_pairs", None)  # rows-only: probabilistic banding
def dedup_simhash_pairs(sf_dir: str):
    """SimHash near-dup pairs (64-bit, 4x16 banding, Hamming <= 4).

    Banding guarantees recall only for distance <= 3 (pigeonhole over 4
    bands); beyond that candidates are probabilistic. The synthetic docs
    share a 30-word vocabulary, so distances are compressed vs natural
    corpora — the tight threshold keeps the pair set meaningful."""
    import ray.data as rd

    from raylog.functions.dedup import simhash_pairs

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return simhash_pairs(ds, max_hamming=4)


@query(
    "dedup_embed_pairs",
    """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       CAST(ROUND(1000 * list_cosine_similarity(a.v, b.v)) AS BIGINT) AS cos_milli
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.v, b.v) >= 0.4""",
)
def dedup_embed_pairs(sf_dir: str):
    """Embedding-cosine near-dup pairs (cos >= 0.4, float64 matmul vs a
    broadcast normalized corpus)."""
    import numpy as np
    import ray.data as rd

    import pyarrow.parquet as pq

    from raylog.functions.dedup import embedding_near_dup_pairs

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    # parquet metadata row count: no extra ds.count() pass for the
    # broadcast-vs-bucketed path choice
    n_rows = pq.read_metadata(f"{sf_dir}/embeddings.parquet").num_rows
    tbl = embedding_near_dup_pairs(ds, threshold=0.4, n_rows=n_rows)
    return tbl


@query(
    "corpus_curation",
    """
WITH q AS (
  SELECT doc_id, source, text,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
         CAST(len(list_filter(string_split(text, ' '),
                              w -> w IN ('the', 'a'))) AS BIGINT) AS stop_hits
  FROM documents
), scored AS (
  SELECT doc_id, source,
         CAST(FLOOR(1000 * (0.5 * LEAST(n_words / 40.0, 1.0)
                            + 0.5 * (1.0 - stop_hits * 1.0 / n_words))) AS BIGINT)
           AS score_milli
  FROM q
), survivors AS (
  SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text
)
SELECT s.doc_id, s.source, s.score_milli
FROM scored s JOIN survivors v USING (doc_id)
WHERE s.score_milli >= 900""",
)
def corpus_curation(sf_dir: str):
    """Composite curation pipeline (the training-data flagship): quality
    scoring (vectorized) → threshold filter → exact-dedup SEMI-JOIN
    (keep-first survivors via the hash-partitioned aggregate, joined
    back without any driver-side id set). The shape a 100 TB curation
    run uses: every stage streams, the only exchanges are the dedup key
    shuffle and the survivor hash join."""
    import ray.data as rd

    from raylog.functions.dedup import exact_dedup_survivors
    from raylog.functions.text import quality_scores

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "source", "text"])
    scored = ds.map_batches(quality_scores, batch_format="pyarrow",
                            batch_size=None)

    def keep(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        m = pc.greater_equal(b["score_milli"], pa.scalar(900, pa.int64()))
        return b.filter(m).select(["doc_id", "source", "score_milli"])

    scored = scored.map_batches(keep, batch_format="pyarrow", batch_size=None)
    from raylog.functions.agg import seed_join_side
    scored = seed_join_side(scored, pa.table({
        "doc_id": pa.array([-(1 << 62)], pa.int64()),
        "source": pa.array([""], pa.string()),
        "score_milli": pa.array([0], pa.int64()),
    }))  # nothing above the quality bar -> empty join side (SCALE.md)
    survivors = exact_dedup_survivors(ds.select_columns(["doc_id", "text"]))
    return scored.join(survivors, join_type="inner", num_partitions=8,
                       on=("doc_id",))


@query("dedup_embed_pairs_bucketed", None)  # rows-only: approximate scale path
def dedup_embed_pairs_bucketed(sf_dir: str):
    """Embedding near-dup SCALE path forced on (centroid buckets,
    exact-within-bucket, top-2 multi-assignment) — pairs are a subset of
    the brute-force result with identical cosines; recall asserted in
    pytest."""
    import ray.data as rd

    import pyarrow.parquet as pq

    from raylog.functions.dedup import embedding_near_dup_pairs

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    n_rows = pq.read_metadata(f"{sf_dir}/embeddings.parquet").num_rows
    return embedding_near_dup_pairs(ds, threshold=0.4, max_broadcast_rows=10,
                                    n_clusters=8, assign_top=2, n_rows=n_rows)


@query(
    "dedup_containment_pairs",
    """
WITH docs AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS (SELECT DISTINCT doc_id,
              list_extract(w, i) || ' ' || list_extract(w, i+1) || ' ' || list_extract(w, i+2) AS g
       FROM docs, UNNEST(generate_series(1, len(w) - 2)) AS t(i)
       WHERE len(w) >= 3),
sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
          FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2)
SELECT doc_a, doc_b,
       CAST(FLOOR(1000 * (c * 1.0 / LEAST(x.n, y.n))) AS BIGINT) AS cont_milli,
       CAST(FLOOR(1000 * (c * 1.0 / (x.n + y.n - c))) AS BIGINT) AS jacc_milli
FROM inter JOIN sz x ON doc_a = x.doc_id JOIN sz y ON doc_b = y.doc_id
WHERE c * 1.0 / LEAST(x.n, y.n) >= 0.25""",
)
def dedup_containment_pairs(sf_dir: str):
    """Asymmetric near-dup pairs by n-gram CONTAINMENT (|A∩B|/min —
    Broder's resemblance complement): catches a short doc embedded in a
    long one, which symmetric Jaccard scores near 0. Same inverted-index
    count-based plan as dedup_ngram_pairs; only the finish differs."""
    import ray.data as rd

    from raylog.functions.dedup import ngram_containment_pairs

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return ngram_containment_pairs(ds, threshold=0.25)


@query(
    "dedup_semantic_survivors",
    """
WITH RECURSIVE e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
                     FROM embeddings),
p AS (SELECT a.vec_id AS va, b.vec_id AS vb
      FROM e a JOIN e b ON a.vec_id < b.vec_id
      WHERE list_cosine_similarity(a.v, b.v) >= 0.4),
edges AS (SELECT va, vb FROM p UNION SELECT vb, va FROM p),
reach(ra, rb) AS (
  SELECT vec_id, vec_id FROM e
  UNION
  SELECT r.ra, g.vb FROM reach r JOIN edges g ON r.rb = g.va
),
cc AS (SELECT ra AS vec_id, MIN(rb) AS cluster_id FROM reach GROUP BY ra),
sz AS (SELECT cluster_id, COUNT(*) AS n_members FROM cc GROUP BY 1)
SELECT e.vec_id, e.label, sz.n_members
FROM e JOIN sz ON e.vec_id = sz.cluster_id""",
)
def dedup_semantic_survivors(sf_dir: str):
    """Semantic dedup (SemDeDup): connected components over the
    cosine>=0.4 embedding pair graph, keep the min-id representative per
    component with the component size. Scale path: the centroid-bucketed
    pair build (= cluster-then-dedup-within-cluster) + min-label
    propagation CC."""
    import ray.data as rd

    import pyarrow.parquet as pq

    from raylog.functions.dedup import semantic_dedup_survivors

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding", "label"])
    n_rows = pq.read_metadata(f"{sf_dir}/embeddings.parquet").num_rows
    out = semantic_dedup_survivors(ds, keep_cols=["label"], n_rows=n_rows)
    return out.select_columns(["vec_id", "label", "n_members"])


# --------------------------------------------------------------------------
# Training-data ops: similarity search + multimodal
# --------------------------------------------------------------------------

@query(
    "ann_cosine_topk",
    """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT * FROM e WHERE vec_id < 5),
s AS (SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
             list_cosine_similarity(q.v, e.v) AS cos
      FROM q JOIN e ON e.vec_id <> q.vec_id),
r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cos DESC, neighbor_id) AS rank
      FROM s)
SELECT query_id, rank, neighbor_id,
       CAST(ROUND(1000000 * cos) AS BIGINT) AS cos_micro
FROM r WHERE rank <= 10""",
)
def ann_cosine_topk(sf_dir: str):
    """Exact cosine top-10 for query vectors (vec_id < 5): per-batch
    partial top-k against a broadcast query matrix, merged globally."""
    import ray.data as rd

    from raylog.functions.similarity import ann_brute_topk

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return ann_brute_topk(ds, query_ids=[0, 1, 2, 3, 4], k=10)


@query(
    "ann_filtered_topk",
    """
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT * FROM e WHERE vec_id < 5),
s AS (SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
             list_cosine_similarity(q.v, e.v) AS cos
      FROM q JOIN e ON e.vec_id <> q.vec_id AND e.label = 1),
r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cos DESC, neighbor_id) AS rank
      FROM s)
SELECT query_id, rank, neighbor_id,
       CAST(ROUND(1000000 * cos) AS BIGINT) AS cos_micro
FROM r WHERE rank <= 10""",
)
def ann_filtered_topk(sf_dir: str):
    """Metadata-filtered vector search: exact cosine top-10 restricted
    to label=1 neighbors — the attribute predicate is pushed into the
    corpus scan (filter before matmul), queries come from the unfiltered
    table."""
    import pyarrow.compute as pc
    import ray.data as rd

    from raylog.functions.similarity import ann_brute_topk

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding", "label"])
    corpus = ds.map_batches(
        lambda b: b.filter(pc.equal(b["label"], 1)).select(
            ["vec_id", "embedding"]),
        batch_format="pyarrow", batch_size=None,
    )
    return ann_brute_topk(ds, query_ids=[0, 1, 2, 3, 4], k=10,
                          corpus_ds=corpus)


@query("ann_ivf_topk", None)  # rows-only: approximate (recall vs brute in pytest)
def ann_ivf_topk(sf_dir: str):
    """IVF approximate top-10 (16 lists, nprobe=4) — the 10^9-vector
    path: corpus physically partitioned by coarse-quantizer list (cached
    on disk), probes read only their list directories."""
    import ray.data as rd

    from raylog.functions.similarity import ann_ivf_topk as ivf

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return ivf(ds, query_ids=[0, 1, 2, 3, 4], k=10,
               index_dir=f"/tmp/raylog_ivf/{_src_tag(sf_dir, 'embeddings')}_c16")


@query("ann_pq_topk", None)  # rows-only: iterative codebook training
def ann_pq_topk(sf_dir: str):
    """PQ + ADC approximate top-10 (Jégou et al. 2011): vectors
    compress to m uint8 codes and every query scores the corpus from
    an [m, ks] inner-product table — the memory-bound scale path (m
    bytes per vector in the scan instead of d floats). ADC-exactness
    and recall-vs-brute asserted in pytest."""
    import ray.data as rd

    from raylog.functions.similarity import ann_pq_topk as pq

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    return pq(ds, query_ids=[0, 1, 2, 3, 4], k=10, m=32, ks=64)


@query("ann_ivfpq_topk", None)  # rows-only: iterative training
def ann_ivfpq_topk(sf_dir: str):
    """IVF × PQ probe (FAISS-IVFPQ shape): coarse lists partition the
    corpus on disk AND store only m uint8 residual codes per vector, so
    a probe's IO is (nprobe/n_clusters) × (m/8d) of the raw volume —
    the billion-vector production index. Recall + code-only-storage
    asserted in pytest."""
    import ray.data as rd

    from raylog.functions.similarity import ann_ivfpq_topk as ivfpq

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    return ivfpq(
        ds, query_ids=[0, 1, 2, 3, 4], k=10, n_clusters=8, m=32, ks=64,
        nprobe=4,
        index_dir=f"/tmp/raylog_ivfpq/{_src_tag(sf_dir, 'embeddings')}_c8")


@query("embed_kmeans", None)  # rows-only: iterative algorithm, no SQL analog
def embed_kmeans(sf_dir: str):
    """Distributed k-means cluster assignment over the embedding column
    — the coarse partitioner behind SemDeDup-style semantic curation
    (cluster → curate within cluster) and the IVF index.

    Seeded centroids are fitted on a bounded sample (driver-side matmul
    over ≤2048 rows), broadcast once via ``ray.put``; the corpus
    streams through one vectorized assign pass per batch (matmul +
    argmax — no per-row Python, no shuffle). Deterministic: same seed →
    same assignment (asserted in pytest, with cluster balance)."""
    import numpy as np
    import ray
    import ray.data as rd

    from raylog.functions.similarity import _kmeans, _to_matrix

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    sample = pa.concat_tables(list(
        ds.limit(2048).map_batches(
            lambda b: b.select(["vec_id", "embedding"]),
            batch_format="pyarrow", batch_size=None,
        ).iter_batches(batch_format="pyarrow", batch_size=None)))
    # block arrival order is nondeterministic — canonicalize by id so the
    # seeded centroid init (row-index based) is run-stable
    sample = sample.sort_by("vec_id")
    cents = _kmeans(_to_matrix(sample, "embedding"), n_clusters=8)
    cents_ref = ray.put(cents) if ray.is_initialized() else cents

    def assign(b: pa.Table) -> pa.Table:
        c = (ray.get(cents_ref) if ray.is_initialized() else cents_ref)
        m = _to_matrix(b, "embedding")
        sims = m @ c.T
        cl = sims.argmax(axis=1).astype(np.int32)
        return pa.table({
            "vec_id": b["vec_id"],
            "cluster": pa.array(cl),
            "cos_to_centroid_milli": pa.array(
                np.round(1000 * sims.max(axis=1)).astype(np.int64)),
        })

    return ds.map_batches(assign, batch_format="pyarrow", batch_size=None)


@query(
    "mm_media_features",
    """
WITH h AS (
  SELECT doc_id, md5(text) AS m,
         octet_length(encode(text)) AS n_bytes
  FROM documents
)
SELECT doc_id,
       'application/octet-stream' AS mime,
       CAST(n_bytes AS BIGINT) AS n_bytes,
       CAST(16 + CAST('0x' || substr(m, 1, 2) AS INT) % 240 AS INTEGER)
         AS height,
       CAST(16 + CAST('0x' || substr(m, 3, 2) AS INT) % 240 AS INTEGER)
         AS width,
       CAST((1000 * (CAST('0x' || substr(m, 1, 2) AS BIGINT)
                   + CAST('0x' || substr(m, 3, 2) AS BIGINT)
                   + CAST('0x' || substr(m, 5, 2) AS BIGINT)
                   + CAST('0x' || substr(m, 7, 2) AS BIGINT)
                   + CAST('0x' || substr(m, 9, 2) AS BIGINT)
                   + CAST('0x' || substr(m, 11, 2) AS BIGINT)
                   + CAST('0x' || substr(m, 13, 2) AS BIGINT)
                   + CAST('0x' || substr(m, 15, 2) AS BIGINT)))
            // 256 AS BIGINT) AS feat_milli_sum
FROM h""",
)
def mm_media_features(sf_dir: str):
    """Multimodal plumbing: binary payload -> actor-pool decode (fake
    kernel) -> fixed-dim feature vector; returns typed metadata + a
    feature checksum per row. SQL-oracled (VERDICT r3 #9): the fake
    kernels digest with md5 (DuckDB-recomputable) and features are
    digest bytes / 256 — exact in float32 — so floor(1000·Σfeatures)
    is pure integer arithmetic on both sides."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.multimodal import media_pipeline

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = media_pipeline(ds)

    def proj(b: pa.Table) -> pa.Table:
        feats = b["features"].to_pylist()
        # each feature is k/256 (exact in f32/f64), so 1000·Σ is an
        # exact f64 rational and floor matches SQL // exactly
        fsum = pa.array(
            [int(np.floor(1000 * sum(f))) for f in feats], pa.int64()
        )
        return pa.table({
            "doc_id": b["doc_id"],
            "mime": b["mime"],
            "n_bytes": b["n_bytes"],
            "height": b["height"],
            "width": b["width"],
            "feat_milli_sum": fsum,
        })

    return out.map_batches(proj, batch_format="pyarrow", batch_size=None)


@query(
    "mm_frame_sample",
    """
WITH d AS (
  SELECT doc_id, octet_length(encode(text)) AS L FROM documents
), s AS (
  SELECT doc_id, L, GREATEST(1, L // 4) AS step FROM d
), f AS (
  SELECT doc_id, L, step, i AS frame_idx
  FROM s, UNNEST(generate_series(0, 3)) AS t(i)
)
SELECT doc_id,
       CAST(frame_idx AS INTEGER) AS frame_idx,
       CAST(CASE WHEN L - frame_idx * step <= 0 THEN 1
                 ELSE LEAST(step, L - frame_idx * step) END AS BIGINT)
         AS frame_bytes
FROM f""",
)
def mm_frame_sample(sf_dir: str):
    """Multimodal video plumbing: payload → per-frame exploded rows
    (doc_id, frame_idx, frame bytes) via an actor-pool sampler with
    small-batch sizing (fake frame kernel; ffmpeg swap point)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from raylog.functions.multimodal import frame_sample_pipeline

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = frame_sample_pipeline(ds, n_frames=4)

    def proj(b: pa.Table) -> pa.Table:
        fr = b["frame"]
        fr = fr.combine_chunks() if isinstance(fr, pa.ChunkedArray) else fr
        return pa.table({
            "doc_id": b["doc_id"],
            "frame_idx": b["frame_idx"],
            "frame_bytes": pc.cast(pc.binary_length(fr), pa.int64()),
        })

    return out.map_batches(proj, batch_format="pyarrow", batch_size=None)


# --------------------------------------------------------------------------
# Decontamination (standalone n-gram leakage report)
# --------------------------------------------------------------------------

@query(
    "decontam_ngram_report",
    _P() + """
, g AS (
  SELECT DISTINCT doc_id, source = 'src0' AS is_eval,
         CAST(tokens[CAST(i AS INT)] % 128 AS BIGINT)
       + CAST(tokens[CAST(i AS INT) + 1] % 128 AS BIGINT) * 128
       + CAST(tokens[CAST(i AS INT) + 2] % 128 AS BIGINT) * 16384
       + CAST(tokens[CAST(i AS INT) + 3] % 128 AS BIGINT) * 2097152
       + CAST(tokens[CAST(i AS INT) + 4] % 128 AS BIGINT) * 268435456
       + CAST(tokens[CAST(i AS INT) + 5] % 128 AS BIGINT) * 34359738368
       + CAST(tokens[CAST(i AS INT) + 6] % 128 AS BIGINT) * 4398046511104
       + CAST(tokens[CAST(i AS INT) + 7] % 128 AS BIGINT) * 562949953421312
         AS gram
  FROM recs2, LATERAL (
    SELECT unnest(generate_series(1, CAST(n_tok AS INT) - 7)) AS i
  ) s
)
SELECT e.doc_id, CAST(COUNT(DISTINCT t.doc_id) AS BIGINT) AS n_contaminating
FROM g e JOIN g t ON e.gram = t.gram AND e.is_eval AND NOT t.is_eval
GROUP BY e.doc_id""",
)
def decontam_ngram_report_q(sf_dir: str):
    """Standalone n-gram decontamination report (the hygiene check the
    ``pretrain_prep`` composite applies, as an auditable per-doc
    table): treating source 'src0' as the eval slice, count for every
    contaminated eval doc how many DISTINCT train docs share at least
    one 8-token n-gram. Grams compared by VALUE (tokens mod 128 packed
    8-per-int64 — the oracle restates the pack exactly), so counts are
    exact, never hash-probabilistic. Exchange = per-doc-distinct gram
    postings + the distinct contamination edge set; the bipartite
    enumeration runs inside complete-gram partitions in pure index
    arithmetic (`functions/decontam.py`)."""
    import pyarrow.compute as pc

    from raylog.functions.decontam import decontam_ngram_report
    from raylog.pipelines import log_pipeline as LP

    ds = LP.records_ds(sf_dir).select_columns(["doc_id", "source", "tokens"])

    def flag(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": b["doc_id"],
            "is_eval": pc.equal(b["source"], "src0"),
            "tokens": b["tokens"],
        })

    flagged = ds.map_batches(flag, batch_format="pyarrow", batch_size=None)
    return decontam_ngram_report(flagged, n=8)


@query(
    "docs_ngram_novelty",
    """
WITH docs AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS (
  SELECT DISTINCT doc_id,
         array_to_string(w[CAST(i AS INT):CAST(i + 7 AS INT)], ' ') AS g
  FROM docs, LATERAL (
    SELECT unnest(generate_series(1, len(w) - 7)) AS i
  ) t
),
fm AS (SELECT g, MIN(doc_id) AS first_doc FROM sh GROUP BY 1)
SELECT s.doc_id, COUNT(*) AS n_grams,
       CAST(SUM(CASE WHEN fm.first_doc = s.doc_id THEN 1 ELSE 0 END)
            AS BIGINT) AS novel_grams,
       CAST(FLOOR(1000.0 * SUM(CASE WHEN fm.first_doc = s.doc_id
                                    THEN 1 ELSE 0 END) / COUNT(*))
            AS BIGINT) AS novelty_milli
FROM sh s JOIN fm USING (g)
GROUP BY 1""",
)
def docs_ngram_novelty(sf_dir: str):
    """Crawl-saturation novelty curve: per doc, the fraction of its
    DISTINCT 8-word grams appearing for the first time in corpus
    (crawl) order — no smaller doc_id contains them. Falling novelty
    tells a crawl operator that new data has stopped adding new
    content (the order-aware complement of the Lee et al. dup-mass
    statistic). One gram-hash exchange: per-gram min doc_id read off
    the lexsorted run starts inside complete-gram partitions, per-doc
    partials pre-aggregated before the combine
    (`functions/dedup.py:ngram_novelty`)."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.dedup import ngram_novelty

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    nov = ngram_novelty(docs, n=8)

    def finish(b: pa.Table) -> pa.Table:
        ng = np.asarray(b["n_grams"].combine_chunks(), dtype=np.int64)
        nv = np.asarray(b["novel_grams"].combine_chunks(), dtype=np.int64)
        return pa.table({
            "doc_id": b["doc_id"],
            "n_grams": b["n_grams"],
            "novel_grams": b["novel_grams"],
            "novelty_milli": pa.array(
                np.floor(1000.0 * nv / ng).astype(np.int64)),
        })

    return nov.map_batches(finish, batch_format="pyarrow", batch_size=None)


@query(
    "dedup_threshold_curve",
    """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
p AS (SELECT a.vec_id AS va, b.vec_id AS vb,
             CAST(ROUND(1000 * list_cosine_similarity(a.v, b.v))
                  AS BIGINT) AS cm
      FROM e a JOIN e b ON a.vec_id < b.vec_id
      WHERE list_cosine_similarity(a.v, b.v) >= 0.4),
th AS (SELECT unnest([400, 500, 600, 700, 800, 900]) AS t),
d AS (SELECT vec_id, MAX(cm) AS mc FROM (
        SELECT va AS vec_id, cm FROM p
        UNION ALL SELECT vb, cm FROM p) GROUP BY 1)
SELECT CAST(th.t AS BIGINT) AS threshold_milli,
       CAST((SELECT COUNT(*) FROM p WHERE cm >= th.t) AS BIGINT)
         AS n_pairs,
       CAST((SELECT COUNT(*) FROM d WHERE mc >= th.t) AS BIGINT)
         AS n_docs
FROM th""",
)
def dedup_threshold_curve(sf_dir: str):
    """Near-dup threshold SWEEP (curation planning): how many
    embedding-cosine pairs — and how many docs touched by at least one
    pair — survive at each candidate threshold, all from ONE pair
    build at the loosest setting. The table a curation run reads to
    pick its dedup aggressiveness before committing to a full pass
    (raising the threshold later never needs a recompute; every
    stricter curve point is a filter over the loose pair set).

    Exchange: the 0.4-threshold pair build (already the oracled
    `dedup_embed_pairs` kernel: broadcast matmul small-side, centroid
    cells at scale), then two pair-bounded aggregates — a cos_milli
    histogram (<= 601 cells) and a per-doc max-cos table folded to a
    second histogram. The sweep itself is arithmetic on the two
    histograms driver-side; the corpus is never re-read per threshold.
    """
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate, grouped_aggregate_ds
    from raylog.functions.dedup import embedding_near_dup_pairs

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    n_rows = pq.read_metadata(f"{sf_dir}/embeddings.parquet").num_rows
    pairs = embedding_near_dup_pairs(ds, threshold=0.4, n_rows=n_rows)
    if isinstance(pairs, pa.Table):
        # broadcast (small-side) regime returns the pair table directly
        pairs = rd.from_arrow(pairs)

    def cm_part(b: pa.Table) -> pa.Table:
        return pa.table({
            "cm": b["cos_milli"],
            "one": pa.array(np.ones(b.num_rows, dtype=np.int64)),
        })

    hist = grouped_aggregate(
        pairs.map_batches(cm_part, batch_format="pyarrow",
                          batch_size=None),
        ["cm"], [("one", "sum", "n")]).to_pandas()

    def endpoints(b: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc
        cm = b["cos_milli"].combine_chunks()
        return pa.table({
            "vec_id": pa.concat_arrays(
                [b["vec_a"].combine_chunks(),
                 b["vec_b"].combine_chunks()]),
            "cm": pa.concat_arrays([cm, cm]),
        })

    docmax = grouped_aggregate_ds(
        pairs.map_batches(endpoints, batch_format="pyarrow",
                          batch_size=None),
        ["vec_id"], [("cm", "max", "mc")])

    def mc_part(b: pa.Table) -> pa.Table:
        return pa.table({
            "mc": b["mc"],
            "one": pa.array(np.ones(b.num_rows, dtype=np.int64)),
        })

    mhist = grouped_aggregate(
        docmax.map_batches(mc_part, batch_format="pyarrow",
                           batch_size=None),
        ["mc"], [("one", "sum", "n")]).to_pandas()

    import numpy as _np
    cm_v = (hist["cm"].to_numpy(dtype=np.int64)
            if "cm" in hist.columns else _np.zeros(0, np.int64))
    cm_n = (hist["n"].to_numpy(dtype=np.int64)
            if "n" in hist.columns else _np.zeros(0, np.int64))
    mc_v = (mhist["mc"].to_numpy(dtype=np.int64)
            if "mc" in mhist.columns else _np.zeros(0, np.int64))
    mc_n = (mhist["n"].to_numpy(dtype=np.int64)
            if "n" in mhist.columns else _np.zeros(0, np.int64))
    ts = np.array([400, 500, 600, 700, 800, 900], dtype=np.int64)
    return pa.table({
        "threshold_milli": pa.array(ts),
        "n_pairs": pa.array(
            np.array([cm_n[cm_v >= t].sum() for t in ts],
                     dtype=np.int64)),
        "n_docs": pa.array(
            np.array([mc_n[mc_v >= t].sum() for t in ts],
                     dtype=np.int64)),
    })


@query(
    "dedup_canonical",
    """
WITH c AS (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(
              regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
              ' +', ' ', 'g'), '^ +| +$', '', 'g')) AS canon
  FROM documents
)
SELECT MIN(doc_id) AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_members
FROM c GROUP BY canon""",
)
def dedup_canonical(sf_dir: str):
    """Canonical-form exact dedup: case / punctuation / whitespace
    variants collapse to one survivor (re-crawls that differ only in
    casing or punctuation drift are invisible to byte-exact dedup but
    are NOT near-dups — they are the same document). Normalization is
    RE2 on both engines, op for op; the exchange carries only
    (128-bit canonical key, id) rows through the hash-partitioned
    combine — canonical strings never shuffle."""
    import ray.data as rd

    from raylog.functions.dedup import canonical_dedup_groups

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return canonical_dedup_groups(ds)


@query(
    "dedup_editdist_pairs",
    """
WITH d AS (
  SELECT doc_id, substr(text, 1, 16) AS pfx,
         CAST(length(text) AS BIGINT) AS len,
         substr(text, 1, 200) AS head
  FROM documents WHERE length(text) >= 16
), p AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         levenshtein(a.head, b.head) AS dist
  FROM d a JOIN d b
    ON a.pfx = b.pfx AND a.doc_id < b.doc_id
   AND abs(a.len - b.len) <= 4
)
SELECT doc_a, doc_b, CAST(dist AS BIGINT) AS dist
FROM p WHERE dist <= 8""",
)
def dedup_editdist_pairs(sf_dir: str):
    """Edit-distance near-dup pairs on a blocked candidate set (shared
    16-char prefix, ±4 length, Levenshtein ≤ 8 on the 200-char head):
    the character-level verify that catches single-typo / small-edit
    re-crawls which token-level Jaccard over-counts and byte-exact
    dedup misses entirely. Candidate enumeration is bounded by the
    blocking; the DP row is a vectorized min-plus scan."""
    import ray.data as rd

    from raylog.functions.dedup import editdist_pairs

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return editdist_pairs(ds)


@query(
    "dedup_reciprocal_nn",
    """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
s AS (
  SELECT a.vec_id AS qa, b.vec_id AS qb,
         list_cosine_similarity(a.v, b.v) AS cos
  FROM e a JOIN e b ON a.vec_id <> b.vec_id
),
nn AS (
  SELECT qa, qb, cos,
         ROW_NUMBER() OVER (PARTITION BY qa ORDER BY cos DESC, qb) AS rn
  FROM s
)
SELECT x.qa AS vec_a, x.qb AS vec_b,
       CAST(ROUND(1000 * x.cos) AS BIGINT) AS cos_milli
FROM nn x JOIN nn y ON x.qb = y.qa AND y.qb = x.qa
WHERE x.rn = 1 AND y.rn = 1 AND x.qa < x.qb""",
)
def dedup_reciprocal_nn(sf_dir: str):
    """Reciprocal-nearest-neighbor pairs: (a, b) where b is a's single
    closest embedding AND a is b's — the threshold-free merge rule
    (RNN clustering) that finds the genuinely mutual duplicates a
    fixed cosine cutoff either floods or misses.

    One streamed pass of per-batch float64 matmuls against the
    broadcast normalized corpus yields each vector's top-1 (ties by
    smallest neighbor id, matching the SQL ORDER BY); reciprocity is
    then a COUNT==2 on the canonical (min,max) pair key through the
    hash-partitioned aggregate — no self-join of the NN table, no
    driver-side pair set. Exact path only, bounded by the same ≤100k
    corpus broadcast as `dedup_embed_pairs`' exact branch; at larger
    corpora run pair DISCOVERY through that kernel's IVF-bucketed
    branch instead (top-1-specific bucketing is not implemented)."""
    import numpy as np
    import ray
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate_ds
    from raylog.functions.similarity import _to_matrix

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    corpus = pa.concat_tables(
        list(ds.iter_batches(batch_format="pyarrow", batch_size=None)))
    ids = corpus["vec_id"].to_numpy()
    mat = _to_matrix(corpus, "embedding")
    ref = ray.put((ids, mat)) if ray.is_initialized() else (ids, mat)

    def top1(batch: pa.Table) -> pa.Table:
        cids, cmat = ray.get(ref) if ray.is_initialized() else ref
        bids = np.asarray(batch["vec_id"].combine_chunks(),
                          dtype=np.int64)
        bmat = _to_matrix(batch, "embedding")
        sims = bmat @ cmat.T
        sims[np.equal.outer(bids, cids)] = -np.inf  # mask self
        best = sims.max(axis=1)
        # ties (cos equal) break to the SMALLEST neighbor id: scan each
        # row's argmax set — cids ascending makes first-match smallest
        order = np.argsort(cids, kind="mergesort")
        sims_sorted = sims[:, order]
        nb = cids[order][np.argmax(sims_sorted == best[:, None], axis=1)]
        a = np.minimum(bids, nb)
        b = np.maximum(bids, nb)
        return pa.table({
            "pair": pa.array(a * (1 << 32) + b),
            "cos_milli": pa.array(np.round(1000 * best).astype(np.int64)),
            "one": pa.array(np.ones(len(a), dtype=np.int64)),
        })

    nn = ds.map_batches(top1, batch_format="pyarrow", batch_size=None)
    g = grouped_aggregate_ds(nn, ["pair"],
                             [("one", "sum", "n"),
                              ("cos_milli", "min", "cos_milli")],
                             num_partitions=8)

    def reciprocal(b: pa.Table) -> pa.Table:
        n = np.asarray(b["n"].combine_chunks(), dtype=np.int64)
        k = np.asarray(b["pair"].combine_chunks(), dtype=np.int64)[n == 2]
        cm = np.asarray(b["cos_milli"].combine_chunks(),
                        dtype=np.int64)[n == 2]
        return pa.table({
            "vec_a": pa.array(k >> 32),
            "vec_b": pa.array(k & ((1 << 32) - 1)),
            "cos_milli": pa.array(cm),
        })

    return g.map_batches(reciprocal, batch_format="pyarrow",
                         batch_size=None)


# --------------------------------------------------------------------------
# Near-dup graph PageRank (iterative distributed SpMV)
# --------------------------------------------------------------------------

@query(
    "dedup_graph_pagerank",
    """
WITH docs AS (SELECT doc_id, string_split(text, ' ') AS w
              FROM documents),
sh AS (SELECT DISTINCT doc_id,
              list_extract(w, i) || ' ' || list_extract(w, i+1)
                || ' ' || list_extract(w, i+2) AS g
       FROM docs, UNNEST(generate_series(1, len(w) - 2)) AS t(i)
       WHERE len(w) >= 3),
sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
          FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
np AS (SELECT doc_a, doc_b FROM inter
       JOIN sz x ON doc_a = x.doc_id JOIN sz y ON doc_b = y.doc_id
       WHERE c * 1.0 / (x.n + y.n - c) >= 0.3),
e AS (SELECT doc_a AS u, doc_b AS v FROM np
      UNION SELECT doc_b, doc_a FROM np),
deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS d FROM e GROUP BY 1),
r0 AS (SELECT doc_id, CAST(1000000000 AS BIGINT) AS r FROM documents),
c1 AS (SELECT e.v AS doc_id, SUM(r0.r // deg.d) AS s
       FROM e JOIN deg USING (u) JOIN r0 ON r0.doc_id = e.u
       GROUP BY 1),
r1 AS (SELECT d0.doc_id,
              CAST((15000000000 + 85 * COALESCE(c1.s, 0)) // 100 AS BIGINT) AS r
       FROM (SELECT doc_id FROM documents) d0
       LEFT JOIN c1 USING (doc_id)),
c2 AS (SELECT e.v AS doc_id, SUM(r1.r // deg.d) AS s
       FROM e JOIN deg USING (u) JOIN r1 ON r1.doc_id = e.u
       GROUP BY 1),
r2 AS (SELECT d0.doc_id,
              CAST((15000000000 + 85 * COALESCE(c2.s, 0)) // 100 AS BIGINT) AS r
       FROM (SELECT doc_id FROM documents) d0
       LEFT JOIN c2 USING (doc_id)),
c3 AS (SELECT e.v AS doc_id, SUM(r2.r // deg.d) AS s
       FROM e JOIN deg USING (u) JOIN r2 ON r2.doc_id = e.u
       GROUP BY 1),
r3 AS (SELECT d0.doc_id,
              CAST((15000000000 + 85 * COALESCE(c3.s, 0)) // 100 AS BIGINT) AS r
       FROM (SELECT doc_id FROM documents) d0
       LEFT JOIN c3 USING (doc_id))
SELECT doc_id, pagerank_e9, degree, rank FROM (
  SELECT r3.doc_id, r3.r AS pagerank_e9,
         COALESCE(deg.d, 0) AS degree,
         ROW_NUMBER() OVER (ORDER BY r3.r DESC, r3.doc_id) AS rank
  FROM r3 LEFT JOIN deg ON r3.doc_id = deg.u
) WHERE rank <= 20""",
)
def dedup_graph_pagerank(sf_dir: str):
    """PageRank centrality on the exact near-dup graph (3 power
    iterations, damping 0.85) — hub documents in the duplication graph
    are the templates/boilerplate whose removal shrinks the most
    near-dup mass; top-20 with degree.

    The engine's first ITERATIVE distributed computation: each round is
    one SpMV expressed as co-partitioned join + combine — edges (with
    out-degree attached once) hash-join the rank vector on the source
    key, emit integer contributions r//deg, and a hash-partitioned
    combine reduces per destination; ranks never broadcast and the
    driver holds nothing node-sized. EVERY arithmetic step is integer
    (e9 fixed point, floor divisions restated term-for-term in the
    unrolled 3-level SQL oracle), so Ray and DuckDB agree bit-for-bit
    — no float drift across iterations. Dangling mass evaporates
    identically on both sides."""
    import numpy as np
    import ray.data as rd

    from raylog.functions import topk as tk
    from raylog.functions.agg import grouped_aggregate_ds
    from raylog.functions.dedup import ngram_jaccard_pairs

    E9 = 1_000_000_000

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    pairs = ngram_jaccard_pairs(docs, threshold=0.3)

    def bidir(b: pa.Table) -> pa.Table:
        a = np.asarray(b["doc_a"].combine_chunks()
                       if isinstance(b["doc_a"], pa.ChunkedArray)
                       else b["doc_a"], dtype=np.int64)
        c = np.asarray(b["doc_b"].combine_chunks()
                       if isinstance(b["doc_b"], pa.ChunkedArray)
                       else b["doc_b"], dtype=np.int64)
        return pa.table({
            "u": pa.array(np.concatenate([a, c])),
            "v": pa.array(np.concatenate([c, a])),
            "one": pa.array(np.ones(2 * len(a), dtype=np.int64)),
        })

    # Iterative algorithms MUST pin their loop-invariant inputs: the
    # lazy DAG would otherwise re-run the whole inverted-index pair
    # build once per consumer per iteration (observed: sf0.001 ran
    # past 5 min lazy vs seconds pinned). edges/deg are pairs-bounded
    # — far below the corpus — so materializing them is the classic
    # PageRank cache, not a full-dataset spill.
    edges = pairs.map_batches(bidir, batch_format="pyarrow",
                              batch_size=None).materialize()
    if edges.count() == 0:
        # edgeless corpus: every doc sits at the teleport floor after
        # one round and stays there; top-20 = 20 smallest doc_ids
        floor = 15 * E9 // 100
        ranks0 = rd.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id"]
        ).map_batches(
            lambda b: pa.table({
                "doc_id": b["doc_id"],
                "pagerank_e9": pa.array(
                    np.full(len(b), floor, dtype=np.int64)),
                "degree": pa.array(np.zeros(len(b), dtype=np.int64)),
            }), batch_format="pyarrow", batch_size=None)
        from raylog.functions import topk as _tk
        return _tk.topk(ranks0,
                        sort_cols=["pagerank_e9", "doc_id"],
                        descending=[True, False], k=20,
                        add_rank="rank")
    deg = grouped_aggregate_ds(edges, ["u"], [("one", "sum", "d")],
                               num_partitions=8)
    ewd = edges.drop_columns(["one"]).join(
        deg, join_type="inner", num_partitions=8,
        on=("u",)).materialize()

    node_ids = rd.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"])
    ranks = node_ids.map_batches(
        lambda b: pa.table({
            "doc_id": b["doc_id"],
            "r": pa.array(np.full(len(b), E9, dtype=np.int64)),
        }), batch_format="pyarrow", batch_size=None)

    for _ in range(3):
        j = ewd.join(ranks, join_type="inner", num_partitions=8,
                     on=("u",), right_on=("doc_id",))

        def contrib(b: pa.Table) -> pa.Table:
            r = np.asarray(b["r"].combine_chunks()
                           if isinstance(b["r"], pa.ChunkedArray)
                           else b["r"], dtype=np.int64)
            d = np.asarray(b["d"].combine_chunks()
                           if isinstance(b["d"], pa.ChunkedArray)
                           else b["d"], dtype=np.int64)
            return pa.table({
                "v": b["v"],
                "c": pa.array(r // d),
            })

        sums = grouped_aggregate_ds(
            j.map_batches(contrib, batch_format="pyarrow",
                          batch_size=None),
            ["v"], [("c", "sum", "s")], num_partitions=8)
        nj = node_ids.join(sums, join_type="left_outer",
                           num_partitions=8, on=("doc_id",),
                           right_on=("v",))

        def update(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            s = np.asarray(pc.fill_null(pc.cast(b["s"], pa.int64()), 0),
                           dtype=np.int64)
            return pa.table({
                "doc_id": b["doc_id"],
                "r": pa.array((15 * E9 + 85 * s) // 100),
            })

        # node-bounded; pinned so iteration k+1 reads a table, not a
        # k-deep join chain
        ranks = nj.map_batches(update, batch_format="pyarrow",
                               batch_size=None).materialize()

    final = ranks.join(deg, join_type="left_outer", num_partitions=8,
                       on=("doc_id",), right_on=("u",))

    def shape(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({
            "doc_id": b["doc_id"],
            "pagerank_e9": b["r"],
            "degree": pc.fill_null(pc.cast(b["d"], pa.int64()), 0),
        })

    return tk.topk(
        final.map_batches(shape, batch_format="pyarrow",
                          batch_size=None),
        sort_cols=["pagerank_e9", "doc_id"], descending=[True, False],
        k=20, add_rank="rank",
    )


# --------------------------------------------------------------------------
# Near-dup graph triangles / transitivity (degree-oriented enumeration)
# --------------------------------------------------------------------------

@query(
    "dedup_graph_triangles",
    """
WITH docs AS (SELECT doc_id, string_split(text, ' ') AS w
              FROM documents),
sh AS (SELECT DISTINCT doc_id,
              list_extract(w, i) || ' ' || list_extract(w, i+1)
                || ' ' || list_extract(w, i+2) AS g
       FROM docs, UNNEST(generate_series(1, len(w) - 2)) AS t(i)
       WHERE len(w) >= 3),
sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
          FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
np AS (SELECT doc_a, doc_b FROM inter
       JOIN sz x ON doc_a = x.doc_id JOIN sz y ON doc_b = y.doc_id
       WHERE c * 1.0 / (x.n + y.n - c) >= 0.3),
deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS d
        FROM (SELECT doc_a AS u FROM np
              UNION ALL SELECT doc_b FROM np) GROUP BY 1),
tri AS (SELECT COUNT(*) AS c
        FROM np e1
        JOIN np e2 ON e2.doc_a = e1.doc_a AND e2.doc_b > e1.doc_b
        JOIN np e3 ON e3.doc_a = e1.doc_b AND e3.doc_b = e2.doc_b),
w AS (SELECT CAST(COALESCE(SUM(d * (d - 1) // 2), 0) AS BIGINT) AS s
      FROM deg)
SELECT CAST(tri.c AS BIGINT) AS n_triangles,
       w.s AS n_wedges,
       CAST(CASE WHEN w.s > 0 THEN (3000000 * tri.c) // w.s
                 ELSE 0 END AS BIGINT) AS transitivity_e6,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM np) AS n_edges
FROM tri, w""",
)
def dedup_graph_triangles(sf_dir: str):
    """Exact triangle count and global transitivity (3·triangles /
    wedges) of the near-dup graph — the audit that validates the
    Jaccard threshold: a transitive-ish near-dup relation means CC
    clustering won't over-merge; low transitivity means chains of
    borderline pairs are gluing unrelated docs.

    Degree-oriented enumeration (the O(m^1.5) algorithm): every edge
    orients from its lower-(degree, id) endpoint, candidate wedges
    enumerate inside complete-source partitions of the ORIENTED
    adjacency (Σ out-deg² is m^1.5-bounded under this orientation —
    the id-only orientation would be quadratic on a star), and a hash
    semi-join against the oriented edge set confirms closures. Counts
    are orientation-invariant, so the a<b SQL restatement matches
    exactly."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import (grouped_aggregate,
                                      grouped_aggregate_ds,
                                      partitioned_group_apply)
    from raylog.functions.dedup import ngram_jaccard_pairs

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    pairs = ngram_jaccard_pairs(docs, threshold=0.3).select_columns(
        ["doc_a", "doc_b"]).materialize()

    def bidir(b: pa.Table) -> pa.Table:
        a = np.asarray(b["doc_a"].combine_chunks()
                       if isinstance(b["doc_a"], pa.ChunkedArray)
                       else b["doc_a"], dtype=np.int64)
        c = np.asarray(b["doc_b"].combine_chunks()
                       if isinstance(b["doc_b"], pa.ChunkedArray)
                       else b["doc_b"], dtype=np.int64)
        return pa.table({
            "u": pa.array(np.concatenate([a, c])),
            "v": pa.array(np.concatenate([c, a])),
            "one": pa.array(np.ones(2 * len(a), dtype=np.int64)),
        })

    edges = pairs.map_batches(bidir, batch_format="pyarrow",
                              batch_size=None)
    deg_t = grouped_aggregate(edges, ["u"], [("one", "sum", "d")])
    if len(deg_t) == 0 or "u" not in deg_t.column_names:
        # edgeless corpus: no wedges, no triangles
        z = pa.array([0], pa.int64())
        return pa.table({"n_triangles": z, "n_wedges": z,
                         "transitivity_e6": z, "n_edges": z})
    dk = np.asarray(deg_t["u"], dtype=np.int64)
    dv = np.asarray(deg_t["d"], dtype=np.int64)
    n_edges = int(dv.sum()) // 2
    n_wedges = int((dv * (dv - 1) // 2).sum())
    # degree rank lookup: orient by (deg, id). Node-bounded broadcast —
    # same bound as the PageRank rank vector; at node counts past a
    # worker heap this becomes two joins (deg attach per endpoint),
    # nothing else changes.
    order = np.argsort(dk)
    dk, dv = dk[order], dv[order]
    import ray
    init = ray.is_initialized()
    d_ref = ray.put((dk, dv)) if init else (dk, dv)

    def orient(b: pa.Table) -> pa.Table:
        ks, ds_ = ray.get(d_ref) if init else d_ref
        a = np.asarray(b["doc_a"].combine_chunks()
                       if isinstance(b["doc_a"], pa.ChunkedArray)
                       else b["doc_a"], dtype=np.int64)
        c = np.asarray(b["doc_b"].combine_chunks()
                       if isinstance(b["doc_b"], pa.ChunkedArray)
                       else b["doc_b"], dtype=np.int64)
        da = ds_[np.searchsorted(ks, a)]
        dc = ds_[np.searchsorted(ks, c)]
        # lower (deg, id) becomes src
        a_first = (da < dc) | ((da == dc) & (a < c))
        src = np.where(a_first, a, c)
        dst = np.where(a_first, c, a)
        return pa.table({"src": pa.array(src), "dst": pa.array(dst)})

    oe = pairs.map_batches(orient, batch_format="pyarrow",
                           batch_size=None).materialize()

    def wedge_pairs(t: pa.Table) -> pa.Table:
        ks, ds_ = ray.get(d_ref) if init else d_ref
        src = np.asarray(t["src"].combine_chunks()
                         if isinstance(t["src"], pa.ChunkedArray)
                         else t["src"], dtype=np.int64)
        dst = np.asarray(t["dst"].combine_chunks()
                         if isinstance(t["dst"], pa.ChunkedArray)
                         else t["dst"], dtype=np.int64)
        dd = ds_[np.searchsorted(ks, dst)]
        # canonical (deg, id) order within each src's neighbor list
        o = np.lexsort((dst, dd, src))
        src, dst, dd = src[o], dst[o], dd[o]
        starts = np.concatenate(
            [[0], np.flatnonzero(src[1:] != src[:-1]) + 1, [len(src)]])
        xs, ys = [], []
        for i in range(len(starts) - 1):
            s, e = starts[i], starts[i + 1]
            m = e - s
            if m < 2:
                continue
            iu, ju = np.triu_indices(m, k=1)
            xs.append(dst[s + iu])
            ys.append(dst[s + ju])
        if not xs:
            return pa.table({"src": pa.array([], pa.int64()),
                             "dst": pa.array([], pa.int64()),
                             "w": pa.array([], pa.int64())})
        x = np.concatenate(xs)
        y = np.concatenate(ys)
        return pa.table({"src": pa.array(x), "dst": pa.array(y),
                         "w": pa.array(np.ones(len(x), np.int64))})

    cand = partitioned_group_apply(oe, ["src"], wedge_pairs,
                                   num_partitions=8)
    # a wedge-free graph (disjoint edges) leaves cand fully empty and
    # Ray's join crashes on an empty side; unmatchable sentinel (real
    # ids are non-negative) vanishes in the inner join
    cand = rd.from_arrow(pa.table({
        "src": pa.array([-(1 << 62)], pa.int64()),
        "dst": pa.array([-(1 << 62)], pa.int64()),
        "w": pa.array([0], pa.int64()),
    })).union(cand)  # sentinel FIRST (schema source)
    closed = cand.join(oe, join_type="inner", num_partitions=8,
                       on=("src", "dst"))
    tri_t = grouped_aggregate(
        closed.map_batches(
            lambda b: pa.table({
                "g": pa.array(np.zeros(len(b), np.int64)),
                "w": b["w"]}),
            batch_format="pyarrow", batch_size=None),
        ["g"], [("w", "sum", "c")])
    n_tri = int(tri_t["c"][0].as_py()) if len(tri_t) else 0
    return pa.table({
        "n_triangles": pa.array([n_tri], pa.int64()),
        "n_wedges": pa.array([n_wedges], pa.int64()),
        "transitivity_e6": pa.array(
            [3_000_000 * n_tri // n_wedges if n_wedges else 0],
            pa.int64()),
        "n_edges": pa.array([n_edges], pa.int64()),
    })


# --------------------------------------------------------------------------
# Shingle document-frequency spectrum (corpus duplication profile)
# --------------------------------------------------------------------------

@query(
    "dedup_shingle_df_spectrum",
    """
WITH docs AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS (
  SELECT DISTINCT doc_id,
         list_extract(w, i) || ' ' || list_extract(w, i+1) || ' ' ||
         list_extract(w, i+2) AS g
  FROM docs, UNNEST(generate_series(1, len(w) - 2)) AS t(i)
  WHERE len(w) >= 3
  UNION
  SELECT DISTINCT doc_id, array_to_string(w, ' ') AS g
  FROM docs WHERE len(w) < 3
), df AS (
  SELECT g, COUNT(*) AS df FROM sh GROUP BY 1
)
SELECT CAST(df AS BIGINT) AS df, CAST(COUNT(*) AS BIGINT) AS n_shingles
FROM df GROUP BY 1""",
)
def dedup_shingle_df_spectrum(sf_dir: str):
    """Document-frequency spectrum of word 3-gram shingles — the
    corpus-duplication profile read BEFORE committing to a dedup pass
    (a heavy df>1 tail means near-dup mass; an all-df=1 spectrum means
    dedup will be a no-op). Short docs contribute their whole word
    sequence as one gram (the `Shingler` round-1 parity rule, mirrored
    in the SQL's UNION branch).

    One shingle pass (per-doc-distinct hashed grams), hash-partitioned
    df counts — the exact-answer exchange floor — then the
    df-bounded count-of-counts histogram. The driver sees only the
    spectrum."""
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate, grouped_aggregate_ds
    from raylog.functions.dedup import shingle_batch

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    sh = ds.map_batches(shingle_batch, batch_format="pyarrow",
                        batch_size=None)
    df = grouped_aggregate_ds(sh, ["shingle"], [("*", "count", "df")],
                              num_partitions=8)
    spec = grouped_aggregate(df, ["df"], [("*", "count", "n_shingles")])
    if "df" not in spec.column_names:
        return pa.table({"df": pa.array([], pa.int64()),
                         "n_shingles": pa.array([], pa.int64())})
    return pa.table({"df": spec["df"], "n_shingles": spec["n_shingles"]})


# --------------------------------------------------------------------------
# Train/test split leakage audit (eval hygiene)
# --------------------------------------------------------------------------

@query(
    "dedup_split_leakage",
    """
WITH docs AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS (SELECT DISTINCT doc_id,
              list_extract(w, i) || ' ' || list_extract(w, i+1) || ' ' || list_extract(w, i+2) AS g
       FROM docs, UNNEST(generate_series(1, len(w) - 2)) AS t(i)
       WHERE len(w) >= 3),
sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
          FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2),
np AS (SELECT doc_a, doc_b FROM inter
       JOIN sz x ON doc_a = x.doc_id JOIN sz y ON doc_b = y.doc_id
       WHERE c * 1.0 / (x.n + y.n - c) >= 0.3),
m AS (SELECT doc_a, doc_b,
             CAST(('0x' || substr(md5(CAST(doc_a AS VARCHAR)), 1, 8))
                  AS BIGINT) % 10 < 9 AS ta,
             CAST(('0x' || substr(md5(CAST(doc_b AS VARCHAR)), 1, 8))
                  AS BIGINT) % 10 < 9 AS tb
      FROM np)
SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(COALESCE(SUM(CASE WHEN ta <> tb THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS n_cross_pairs,
       CAST(COUNT(DISTINCT CASE WHEN ta AND NOT tb THEN doc_b
                                WHEN tb AND NOT ta THEN doc_a END)
            AS BIGINT) AS n_leaked_test_docs
FROM m""",
)
def dedup_split_leakage(sf_dir: str):
    """Train/test split leakage audit (eval hygiene — the check that
    benchmark decontamination actually held): assign a deterministic
    90/10 doc_id-hash split, then count exact n-gram near-dup pairs
    (J >= 0.3, the oracled inverted-index plan) that CROSS the split
    boundary, and the distinct test docs so leaked. Split membership
    derives from the id hash, so pair classification needs NO join
    back to the corpus; the sparse pair set is materialized once (it is
    orders below corpus size by construction) and the distinct-leaked
    count is a hash-partitioned distinct, never a driver set."""
    import hashlib

    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate_ds
    from raylog.functions.dedup import ngram_jaccard_pairs

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    pairs = ngram_jaccard_pairs(ds, threshold=0.3).materialize()

    def classify(b: pa.Table) -> pa.Table:
        def train(ids):
            return np.array([
                int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
                % 10 < 9 for i in ids], dtype=bool)

        a = b["doc_a"].to_pylist()
        bb = b["doc_b"].to_pylist()
        ta, tb = train(a), train(bb)
        cross = ta != tb
        leaked = [bb[i] if ta[i] else a[i]
                  for i in np.flatnonzero(cross)]
        return pa.table({
            "n_pairs": pa.array([len(a)], pa.int64()),
            "n_cross": pa.array([int(cross.sum())], pa.int64()),
            "leaked": pa.array([leaked], pa.list_(pa.int64())),
        })

    parts = pairs.map_batches(classify, batch_format="pyarrow",
                              batch_size=None)
    leaked_ids = parts.select_columns(["leaked"]).map_batches(
        lambda b: pa.table({"doc_id": b["leaked"].combine_chunks().flatten()}),
        batch_format="pyarrow", batch_size=None)
    n_leaked = grouped_aggregate_ds(
        leaked_ids, ["doc_id"], [("*", "count", "c")],
        num_partitions=4).count()
    tot = parts.select_columns(["n_pairs", "n_cross"]).to_pandas().sum()
    return pa.table({
        "n_pairs": pa.array([int(tot.n_pairs)], pa.int64()),
        "n_cross_pairs": pa.array([int(tot.n_cross)], pa.int64()),
        "n_leaked_test_docs": pa.array([int(n_leaked)], pa.int64()),
    })


@query(
    "embed_dim_truncation_agreement",
    """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT * FROM e WHERE vec_id < 20),
f AS (SELECT q.vec_id AS query_id, e.vec_id AS nid,
             ROW_NUMBER() OVER (PARTITION BY q.vec_id
                 ORDER BY list_cosine_similarity(q.v, e.v) DESC,
                          e.vec_id) AS r
      FROM q JOIN e ON e.vec_id <> q.vec_id),
h AS (SELECT q.vec_id AS query_id, e.vec_id AS nid,
             ROW_NUMBER() OVER (PARTITION BY q.vec_id
                 ORDER BY list_cosine_similarity(q.v[1:32], e.v[1:32]) DESC,
                          e.vec_id) AS r
      FROM q JOIN e ON e.vec_id <> q.vec_id)
SELECT f.query_id, f.nid AS top1_full, h.nid AS top1_half,
       CAST(CASE WHEN f.nid = h.nid THEN 1 ELSE 0 END AS BIGINT) AS agree
FROM f JOIN h ON f.query_id = h.query_id
WHERE f.r = 1 AND h.r = 1""",
)
def embed_dim_truncation_agreement(sf_dir: str):
    """Matryoshka-style dimension-truncation audit (the MRL question:
    can the index serve half-width vectors?): exact top-1 neighbor
    under full 64-dim cosine vs the first-32-dim prefix, per query
    vector (ids < 20), with the agreement flag. Both searches are the
    broadcast-query partial-top-k plan (`ann_brute_topk`); the prefix
    slice is a vectorized offsets rebuild — flatten, reshape, stride —
    never a per-row Python slice. Same corpus-bounded exchange as the
    oracled brute-force ANN; the two 20-row results join driver-side."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.similarity import ann_brute_topk

    q_ids = list(range(20))
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])

    def trunc(b: pa.Table) -> pa.Table:
        emb = b["embedding"].combine_chunks()
        n = len(b)
        flat = np.asarray(emb.flatten(), dtype=np.float32).reshape(n, -1)
        half = np.ascontiguousarray(flat[:, :32])
        return pa.table({
            "vec_id": b["vec_id"],
            "embedding": pa.ListArray.from_arrays(
                pa.array(np.arange(0, (n + 1) * 32, 32, dtype=np.int32)),
                pa.array(half.ravel())),
        })

    full = ann_brute_topk(ds, q_ids, k=1).to_pandas()
    half = ann_brute_topk(
        rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
        .map_batches(trunc, batch_format="pyarrow", batch_size=None),
        q_ids, k=1).to_pandas()
    m = full.merge(half, on="query_id", suffixes=("_f", "_h"))
    return pa.table({
        "query_id": pa.array(m.query_id.astype("int64")),
        "top1_full": pa.array(m.neighbor_id_f.astype("int64")),
        "top1_half": pa.array(m.neighbor_id_h.astype("int64")),
        "agree": pa.array(
            (m.neighbor_id_f == m.neighbor_id_h).astype("int64")),
    })


@query(
    "mm_image_ahash_dups",
    """
WITH img AS (
  SELECT doc_id, 8 + doc_id % 25 AS h, 8 + doc_id % 31 AS w
  FROM documents
), px AS (
  SELECT i.doc_id,
         (y.y * 8) // i.h AS by, (x.x * 8) // i.w AS bx,
         ((x.x * 8 + i.doc_id) % 256
          + (y.y * 8 + i.doc_id // 2) % 256
          + (x.x + y.y + i.doc_id) % 256) AS g
  FROM img i,
       LATERAL (SELECT unnest(generate_series(0, i.h - 1)) AS y) y,
       LATERAL (SELECT unnest(generate_series(0, i.w - 1)) AS x) x
), blk AS (
  SELECT doc_id, by, bx, SUM(g) AS s, COUNT(*) AS c
  FROM px GROUP BY 1, 2, 3
), tot AS (
  SELECT doc_id, SUM(s) AS ts, SUM(c) AS tc FROM blk GROUP BY 1
), hashes AS (
  SELECT b.doc_id,
         SUM(CASE WHEN b.by * 8 + b.bx >= 32 AND b.s * t.tc > t.ts * b.c
                  THEN CAST(1 AS BIGINT) << (b.by * 8 + b.bx - 32)
                  ELSE 0 END) AS hash_hi,
         SUM(CASE WHEN b.by * 8 + b.bx < 32 AND b.s * t.tc > t.ts * b.c
                  THEN CAST(1 AS BIGINT) << (b.by * 8 + b.bx)
                  ELSE 0 END) AS hash_lo
  FROM blk b JOIN tot t ON b.doc_id = t.doc_id
  GROUP BY 1
)
SELECT doc_id, CAST(hash_hi AS BIGINT) AS hash_hi,
       CAST(hash_lo AS BIGINT) AS hash_lo,
       CAST(COUNT(*) OVER (PARTITION BY hash_hi, hash_lo) AS BIGINT)
         AS group_size
FROM hashes""",
)
def mm_image_ahash_dups(sf_dir: str):
    """Image near-duplicate fingerprinting via perceptual average-hash
    (the pHash-family dedup every multimodal curation run does before
    CLIP-embedding dedup): REAL P6 decode in an actor pool, integer
    8×8 block-mean threshold hash (cross-multiplied — no float means),
    then per-fingerprint group sizes so downstream keeps one doc per
    bucket.

    Group sizes ride the established hash-partitioned distributed
    aggregate; the fingerprint table (2 int64 per image) joins back to
    itself by hash — exchange is fingerprint-sized, never pixels. The
    oracle regenerates the pixels with generate_series and restates
    the hash bit-for-bit (see ``mm_real_decode`` for the codec-parity
    precedent)."""
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate_ds
    from raylog.functions.multimodal import image_ahash_pipeline

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"])
    fp = image_ahash_pipeline(docs)
    sizes = grouped_aggregate_ds(
        fp, ["hash_hi", "hash_lo"], [("doc_id", "count", "group_size")],
        num_partitions=8)
    joined = fp.join(sizes, join_type="inner", num_partitions=8,
                     on=("hash_hi", "hash_lo"))
    return joined


@query(
    "dedup_groupaware_split",
    "WITH RECURSIVE " + _NGRAM_PAIRS_CTE + """,
f AS (SELECT doc_id, cluster_id, cluster_id % 5 AS fold FROM cc),
leak AS (
  SELECT COUNT(*) AS n FROM np
  JOIN f a ON np.doc_a = a.doc_id
  JOIN f b ON np.doc_b = b.doc_id
  WHERE a.fold <> b.fold)
SELECT f.fold, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT f.cluster_id) AS BIGINT) AS n_clusters,
       CAST((SELECT n FROM leak) AS BIGINT) AS n_leaked_pairs
FROM f GROUP BY 1""",
)
def dedup_groupaware_split(sf_dir: str):
    """Group-aware K-fold assignment (the FIX for the split-leakage
    problem `dedup_split_leakage` measures): folds are assigned to
    whole near-dup CLUSTERS (fold = cluster_id % 5), so every near-dup
    pair lands inside one fold by construction — the per-fold report
    carries the verified cross-fold leaked-pair count (0) alongside
    fold sizes, the eval-hygiene invariant GroupKFold guarantees.

    Reuses the exact n-gram pair graph + distributed CC; the leak
    audit is two sparse hash joins of the pair set against the
    cluster→fold map — pair-set-bounded, never corpus-bounded."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate
    from raylog.functions.cc import connected_components
    from raylog.functions.dedup import ngram_jaccard_pairs

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    pairs = ngram_jaccard_pairs(docs, threshold=0.3)
    clusters = connected_components(docs.select_columns(["doc_id"]),
                                    pairs)

    def addfold(b: pa.Table) -> pa.Table:
        c = np.asarray(b["cluster_id"].combine_chunks(), dtype=np.int64)
        return b.append_column("fold", pa.array(c % 5))

    withfold = clusters.map_batches(addfold, batch_format="pyarrow",
                                    batch_size=None)
    sizes = grouped_aggregate(
        withfold, ["fold"], [("*", "count", "n_docs")]).to_pandas()
    from raylog.functions.agg import grouped_aggregate_ds

    distinct_clusters = grouped_aggregate_ds(
        withfold, ["fold", "cluster_id"], [("*", "count", "_c")],
        num_partitions=8)
    nclus = grouped_aggregate(
        distinct_clusters, ["fold"],
        [("*", "count", "n_clusters")]).to_pandas()

    # leak audit: both pair endpoints through the cluster->fold map
    fold_side = withfold.select_columns(["doc_id", "fold"])
    ja = pairs.join(
        fold_side.map_batches(
            lambda b: b.rename_columns(["doc_a", "fold_a"]),
            batch_format="pyarrow", batch_size=None),
        join_type="inner", num_partitions=8, on=("doc_a",))
    jb = ja.join(
        fold_side.map_batches(
            lambda b: b.rename_columns(["doc_b", "fold_b"]),
            batch_format="pyarrow", batch_size=None),
        join_type="inner", num_partitions=8, on=("doc_b",))

    def leak_partial(b: pa.Table) -> pa.Table:
        fa = np.asarray(b["fold_a"].combine_chunks(), dtype=np.int64)
        fb = np.asarray(b["fold_b"].combine_chunks(), dtype=np.int64)
        return pa.table({"g": pa.array([0], pa.int64()),
                         "n": pa.array([int((fa != fb).sum())],
                                       pa.int64())})

    lk = grouped_aggregate(
        jb.map_batches(leak_partial, batch_format="pyarrow",
                       batch_size=None),
        ["g"], [("n", "sum", "n")])
    n_leak = int(lk["n"][0].as_py()) if lk.num_rows else 0

    m = sizes.merge(nclus, on="fold").sort_values("fold")
    return pa.table({
        "fold": pa.array(m["fold"].to_numpy(dtype=np.int64)),
        "n_docs": pa.array(m["n_docs"].to_numpy(dtype=np.int64)),
        "n_clusters": pa.array(m["n_clusters"].to_numpy(dtype=np.int64)),
        "n_leaked_pairs": pa.array(
            np.full(len(m), n_leak, dtype=np.int64)),
    })


@query(
    "embed_knn_label_consistency",
    """
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
           FROM embeddings),
s AS (SELECT a.vec_id, a.label AS la, b.label AS lb, b.vec_id AS nid,
             list_cosine_similarity(a.v, b.v) AS cos
      FROM e a JOIN e b ON a.vec_id <> b.vec_id),
r AS (SELECT vec_id, la, lb,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY cos DESC, nid) AS rn
      FROM s)
SELECT CAST(la AS BIGINT) AS label,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       CAST(SUM(CASE WHEN la = lb THEN 1 ELSE 0 END) AS BIGINT)
         AS n_consistent,
       CAST((1000 * SUM(CASE WHEN la = lb THEN 1 ELSE 0 END))
            // COUNT(*) AS BIGINT) AS consistency_permille
FROM r WHERE rn = 1 GROUP BY 1""",
)
def embed_knn_label_consistency(sf_dir: str):
    """Intrinsic embedding-quality eval: leave-one-out 1-NN label
    consistency — for every vector, does its nearest cosine neighbor
    share its label? The per-label consistency rate is the standard
    "is this space organized by class" readout before anyone trains a
    probe. Ties break by neighbor id (matching the oracle's
    ROW_NUMBER).

    Same scale regime as the embedding near-dup family: the corpus
    matrix broadcasts once (`ray.put`, the ≤100k-vector regime; above
    that the blocked (ci,cj) centroid-cell plan in dedup.py applies)
    and each batch does ONE matmul against it — no pair
    materialization, labels-bounded output."""
    import numpy as np
    import ray.data as rd

    import ray
    from raylog.functions.agg import grouped_aggregate

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding", "label"])
    full = pa.concat_tables(ds.iter_batches(batch_format="pyarrow",
                                            batch_size=None))
    ids = np.asarray(full["vec_id"], dtype=np.int64)
    labels = np.asarray(full["label"], dtype=np.int64)
    col = full["embedding"].combine_chunks()
    flat = np.asarray(col.flatten(), dtype=np.float64)
    dim = len(flat) // len(ids)
    M = flat.reshape(-1, dim)
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    ref = ray.put((ids, labels, M))

    def nn_partial(b: pa.Table) -> pa.Table:
        cids, clabels, cm = ray.get(ref)
        v = np.asarray(b["embedding"].combine_chunks().flatten(),
                       dtype=np.float64).reshape(-1, dim)
        v = v / np.linalg.norm(v, axis=1, keepdims=True)
        bid = np.asarray(b["vec_id"].combine_chunks(), dtype=np.int64)
        bl = np.asarray(b["label"].combine_chunks(), dtype=np.int64)
        sims = v @ cm.T
        sims[bid[:, None] == cids[None, :]] = -np.inf  # self
        best = sims.max(axis=1, keepdims=True)
        cand = np.where(sims == best, cids[None, :],
                        np.iinfo(np.int64).max)
        nn = cand.min(axis=1)
        nn_label = clabels[np.searchsorted(cids, nn)] \
            if np.all(np.diff(cids) > 0) else \
            clabels[np.array([int(np.flatnonzero(cids == x)[0])
                              for x in nn])]
        return pa.table({
            "label": pa.array(bl),
            "ok": pa.array((nn_label == bl).astype(np.int64)),
        })

    a = grouped_aggregate(
        ds.map_batches(nn_partial, batch_format="pyarrow",
                       batch_size=None),
        ["label"], [("*", "count", "n_vecs"),
                    ("ok", "sum", "n_consistent")]).to_pandas()
    a = a.sort_values("label")
    n = a["n_vecs"].to_numpy(dtype=np.int64)
    c = a["n_consistent"].to_numpy(dtype=np.int64)
    return pa.table({
        "label": pa.array(a["label"].to_numpy(dtype=np.int64)),
        "n_vecs": pa.array(n),
        "n_consistent": pa.array(c),
        "consistency_permille": pa.array(1000 * c // n, pa.int64()),
    })


@query(
    "dedup_method_agreement",
    "WITH RECURSIVE " + _NGRAM_PAIRS_CTE + """,
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
emb AS (
  SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
  FROM e a JOIN e b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.v, b.v) >= 0.4
), s AS (
  SELECT (SELECT COUNT(*) FROM np) AS n_ngram,
         (SELECT COUNT(*) FROM emb) AS n_embed,
         (SELECT COUNT(*) FROM np
          JOIN emb USING (doc_a, doc_b)) AS n_both
)
SELECT CAST(n_ngram AS BIGINT) AS n_ngram_pairs,
       CAST(n_embed AS BIGINT) AS n_embed_pairs,
       CAST(n_both AS BIGINT) AS n_both,
       CAST(CASE WHEN n_ngram + n_embed - n_both = 0 THEN 0
            ELSE (1000 * n_both) // (n_ngram + n_embed - n_both)
            END AS BIGINT) AS agreement_permille
FROM s""",
)
def dedup_method_agreement(sf_dir: str):
    """Cross-method dedup agreement audit: how much do the LEXICAL
    near-dup pair set (exact n-gram Jaccard ≥ 0.3 on documents) and
    the SEMANTIC one (embedding cosine ≥ 0.4 on the aligned vectors)
    overlap? Reported as pair-set Jaccard — the calibration question
    every dedup pipeline owner asks before trusting one method's
    threshold ("is semantic finding anything lexical misses?").

    Both pair sets come from their existing scale-safe kernels; the
    intersection is ONE sparse hash join of the two pair sets
    (pair-bounded, never corpus-bounded) and the output is a single
    row of counts."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate
    from raylog.functions.dedup import (embedding_near_dup_pairs,
                                        ngram_jaccard_pairs)

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    ng = ngram_jaccard_pairs(docs, threshold=0.3)
    emb_ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                             columns=["vec_id", "embedding"])
    n_rows = pq.read_metadata(f"{sf_dir}/embeddings.parquet").num_rows
    em = embedding_near_dup_pairs(emb_ds, threshold=0.4, n_rows=n_rows)

    def count_rows(ds_or_tbl) -> int:
        if isinstance(ds_or_tbl, pa.Table):
            return ds_or_tbl.num_rows
        return ds_or_tbl.count()

    n_ngram = count_rows(ng)
    n_embed = count_rows(em)

    def as_pairs_ds(x, a, b):
        if isinstance(x, pa.Table):
            x = rd.from_arrow(x)
        return x.map_batches(
            lambda t: pa.table({
                "doc_a": pa.compute.cast(
                    t[a].combine_chunks()
                    if isinstance(t[a], pa.ChunkedArray) else t[a],
                    pa.int64()),
                "doc_b": pa.compute.cast(
                    t[b].combine_chunks()
                    if isinstance(t[b], pa.ChunkedArray) else t[b],
                    pa.int64()),
            }), batch_format="pyarrow", batch_size=None)

    ng_cols = ng.column_names if isinstance(ng, pa.Table) else ng.schema().names
    em_cols = em.column_names if isinstance(em, pa.Table) else em.schema().names
    ngp = as_pairs_ds(ng, ng_cols[0], ng_cols[1])
    emp = as_pairs_ds(em, em_cols[0], em_cols[1])
    j = ngp.join(emp.map_batches(
        lambda t: t.append_column("_m", pa.array(
            np.ones(t.num_rows, dtype=np.int64))),
        batch_format="pyarrow", batch_size=None),
        join_type="inner", num_partitions=8, on=("doc_a", "doc_b"))
    n_both = j.count()
    union = n_ngram + n_embed - n_both
    return pa.table({
        "n_ngram_pairs": pa.array([n_ngram], pa.int64()),
        "n_embed_pairs": pa.array([n_embed], pa.int64()),
        "n_both": pa.array([n_both], pa.int64()),
        "agreement_permille": pa.array(
            [0 if union == 0 else 1000 * n_both // union], pa.int64()),
    })
