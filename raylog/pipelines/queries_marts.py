"""Analytics-mart report shapes: TPC-H-style joins, attribution,
retention-adjacent windows, and embedding health audits.

Domain module of the driver-facing query registry — registration
happens on import via :func:`raylog.pipelines.qbase.query`; the public
surface stays ``raylog.pipelines.queries.QUERIES/ORACLES``.

Every float-derived output is quantized to exact integers with the SAME
double expression on both engines (``floor(x * 10^k + 0.5)`` per row
BEFORE any sum), so distributed integer sums are bit-exact in any
order — the established fixed-point discipline from
``lineitem_discount_revenue``.
"""

from __future__ import annotations

import pyarrow as pa

from raylog.pipelines.qbase import query

# Unmatchable join key: Ray's hash-shuffle join crashes when one side
# is ENTIRELY empty (its aggregators drop schema'd empty blocks — see
# the degenerate-input tests). Appending one sentinel-keyed row keeps
# the side non-empty; all real keys are non-negative ids, so the
# sentinel can never match and vanishes in inner joins.
_JOIN_SENTINEL = -(1 << 62)


# --------------------------------------------------------------------------
# TPC-H Q14 shape: promotion revenue share per ship-month
# --------------------------------------------------------------------------

@query(
    "lineitem_promo_share",
    """
WITH r AS (
  SELECT strftime(l_shipdate, '%Y-%m') AS month,
         CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000 + 0.5)
              AS BIGINT) AS rev,
         CASE WHEN p.p_type = 'PROMO' THEN 1 ELSE 0 END AS is_promo
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
), m AS (
  SELECT month, SUM(rev * is_promo) AS promo_e4, SUM(rev) AS total_e4
  FROM r GROUP BY 1
)
SELECT month, CAST(promo_e4 AS BIGINT) AS promo_e4,
       CAST(total_e4 AS BIGINT) AS total_e4,
       (1000 * CAST(promo_e4 AS BIGINT)) // CAST(total_e4 AS BIGINT)
         AS promo_share_milli
FROM m""",
)
def lineitem_promo_share(sf_dir: str):
    """Promotion revenue share per ship-month (TPC-H Q14 shape): what
    fraction of monthly revenue came from PROMO-type parts.

    The part side is a dimension — its partkey→is_promo bitmap is
    broadcast once via ``ray.put`` and probed inside ``map_batches``
    (never a shuffle join; reference analog: the k8s metadata lookup in
    filter_kubernetes is the same broadcast-dim pattern,
    fluent-bit.conf:83-90). Revenue is quantized to 1e-4 fixed point
    per row before summation, so per-(month) integer partials combine
    bit-exactly. Exchange: months-bounded partial rows only."""
    import numpy as np
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate

    part = rd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_type"]).to_pandas()
    pk = part["p_partkey"].to_numpy(dtype=np.int64)
    promo = np.zeros(int(pk.max()) + 1 if len(pk) else 1, dtype=bool)
    promo[pk[part["p_type"].to_numpy() == "PROMO"]] = True
    ref = ray.put(promo) if ray.is_initialized() else promo

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_extendedprice",
                                  "l_discount", "l_shipdate"])

    def partial(b: pa.Table) -> pa.Table:
        promo_ = ray.get(ref) if ray.is_initialized() else ref
        price = np.asarray(b["l_extendedprice"].combine_chunks(),
                           dtype=np.float64)
        disc = np.asarray(b["l_discount"].combine_chunks(),
                          dtype=np.float64)
        rev = np.floor(price * (1 - disc) * 10000 + 0.5).astype(np.int64)
        partk = np.asarray(b["l_partkey"].combine_chunks(), dtype=np.int64)
        is_promo = promo_[partk]
        month = pc.strftime(b["l_shipdate"], format="%Y-%m")
        return pa.table({
            "month": month,
            "p": pa.array(np.where(is_promo, rev, 0)),
            "t": pa.array(rev),
        })

    m = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        ["month"], [("p", "sum", "promo_e4"), ("t", "sum", "total_e4")])
    p = np.asarray(m["promo_e4"], dtype=np.int64)
    t = np.asarray(m["total_e4"], dtype=np.int64)
    return pa.table({
        "month": m["month"],
        "promo_e4": m["promo_e4"],
        "total_e4": m["total_e4"],
        "promo_share_milli": pa.array(1000 * p // t, pa.int64()),
    })


# --------------------------------------------------------------------------
# Per-source lexical diversity (type-token ratio)
# --------------------------------------------------------------------------

@query(
    "docs_lexical_diversity",
    """
WITH words AS (SELECT source, unnest(string_split(text, ' ')) AS w
               FROM documents),
sw AS (SELECT source, w, COUNT(*) AS c FROM words GROUP BY 1, 2)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_types,
       CAST(SUM(c) AS BIGINT) AS n_words,
       (1000 * CAST(COUNT(*) AS BIGINT)) // CAST(SUM(c) AS BIGINT)
         AS ttr_milli
FROM sw GROUP BY 1""",
)
def docs_lexical_diversity(sf_dir: str):
    """Per-source lexical diversity: type-token ratio (distinct words /
    total words) — the corpus-quality signal that separates boilerplate
    mills (low TTR) from organic prose.

    The corpus streams ONCE through a per-batch (source, word) count
    kernel (dictionary-encode + packed unique, the corpus_source_kl
    kernel); the only exchange is the hash-partitioned
    vocab×sources-bounded count combine, and the finish is a
    sources-bounded aggregate over it. No corpus shuffle, no
    whole-vocab driver set."""
    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate, grouped_aggregate_ds

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["source", "text"])

    def wcounts(b: pa.Table) -> pa.Table:
        split = pc.split_pattern(b["text"].combine_chunks(), " ")
        lens = np.asarray(pc.list_value_length(split), dtype=np.int64)
        flat = split.flatten().dictionary_encode()
        codes = np.asarray(flat.indices, dtype=np.int64)
        enc = b["source"].combine_chunks().dictionary_encode()
        src = np.asarray(enc.indices, dtype=np.int64)
        tok_src = np.repeat(src, lens)
        nv = len(flat.dictionary)
        packed = tok_src * nv + codes
        up, cnt = np.unique(packed, return_counts=True)
        return pa.table({
            "source": enc.dictionary.take(pa.array(up // nv)),
            "w": flat.dictionary.take(pa.array(up % nv)),
            "c": pa.array(cnt.astype(np.int64)),
        })

    sw = grouped_aggregate_ds(
        ds.map_batches(wcounts, batch_format="pyarrow", batch_size=None),
        ["source", "w"], [("c", "sum", "c")])
    out = grouped_aggregate(sw, ["source"],
                            [("*", "count", "n_types"),
                             ("c", "sum", "n_words")])
    ty = np.asarray(out["n_types"], dtype=np.int64)
    wd = np.asarray(out["n_words"], dtype=np.int64)
    return pa.table({
        "source": out["source"],
        "n_types": out["n_types"],
        "n_words": out["n_words"],
        "ttr_milli": pa.array(1000 * ty // wd, pa.int64()),
    })


# --------------------------------------------------------------------------
# TPC-H Q10 shape: top customers by returned-item revenue
# --------------------------------------------------------------------------

@query(
    "orders_top_returners",
    """
WITH lr AS (
  SELECT l_orderkey,
         SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000 + 0.5)
                  AS BIGINT)) AS rev
  FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1
), cr AS (
  SELECT o.o_custkey AS c_custkey, CAST(SUM(rev) AS BIGINT) AS revenue_e4
  FROM lr JOIN orders o ON lr.l_orderkey = o.o_orderkey GROUP BY 1
), rk AS (
  SELECT c_custkey, revenue_e4,
         ROW_NUMBER() OVER (ORDER BY revenue_e4 DESC, c_custkey) AS rnk
  FROM cr
)
SELECT CAST(rk.rnk AS BIGINT) AS rnk, rk.c_custkey, c.c_name,
       rk.revenue_e4
FROM rk JOIN customer c USING (c_custkey) WHERE rk.rnk <= 20""",
)
def orders_top_returners(sf_dir: str):
    """Top-20 customers by revenue lost to returns (TPC-H Q10 shape):
    the churn-risk report.

    Physical plan: the fact side shrinks FIRST — returned lineitems
    pre-aggregate to one row per orderkey (hash-partitioned combine)
    before any join, so the join exchange is key-bounded on both
    sides; then one hash join against orders' (orderkey, custkey)
    projection, a custkey-bounded combine, and a partial top-k merge.
    The customer-name dimension attaches driver-side to the final 20
    rows only — never shipped through the shuffle."""
    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate_ds
    from raylog.functions.topk import topk

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_extendedprice",
                                  "l_discount", "l_returnflag"])

    def returned(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b["l_returnflag"], pa.scalar("R")))
        price = np.asarray(b["l_extendedprice"].combine_chunks(),
                           dtype=np.float64)
        disc = np.asarray(b["l_discount"].combine_chunks(),
                          dtype=np.float64)
        rev = np.floor(price * (1 - disc) * 10000 + 0.5).astype(np.int64)
        return pa.table({
            "l_orderkey": b["l_orderkey"],
            "rev": pa.array(rev),
        })

    lr = grouped_aggregate_ds(
        li.map_batches(returned, batch_format="pyarrow", batch_size=None),
        ["l_orderkey"], [("rev", "sum", "rev")], num_partitions=8)
    from raylog.functions.agg import seed_join_side
    lr = seed_join_side(lr, pa.table({
        "l_orderkey": pa.array([_JOIN_SENTINEL], pa.int64()),
        "rev": pa.array([0], pa.int64()),
    }))  # no 'R' rows at all -> empty side kills the join (SCALE.md)
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])
    j = lr.join(orders, join_type="inner", num_partitions=8,
                on=("l_orderkey",), right_on=("o_orderkey",))
    cr = grouped_aggregate_ds(j, ["o_custkey"],
                              [("rev", "sum", "revenue_e4")],
                              num_partitions=8)
    # partial top-k merge: every block emits ≤20 rows, the driver never
    # sees the custkey-cardinality table
    top20 = topk(cr, sort_cols=["revenue_e4", "o_custkey"],
                 descending=[True, False], k=20)
    if "o_custkey" not in top20.column_names:  # no returned items
        z = pa.array([], pa.int64())
        return pa.table({"rnk": z, "c_custkey": z,
                         "c_name": pa.array([], pa.string()),
                         "revenue_e4": z})
    ck = np.asarray(top20["o_custkey"], dtype=np.int64)
    rev = np.asarray(top20["revenue_e4"], dtype=np.int64)
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_name"]).to_pandas()
    names = dict(zip(cust["c_custkey"].astype(np.int64),
                     cust["c_name"]))
    return pa.table({
        "rnk": pa.array(np.arange(1, len(ck) + 1), pa.int64()),
        "c_custkey": pa.array(ck, pa.int64()),
        "c_name": pa.array([names[k] for k in ck], pa.string()),
        "revenue_e4": pa.array(rev, pa.int64()),
    })


# --------------------------------------------------------------------------
# First-touch attribution over the event stream
# --------------------------------------------------------------------------

@query(
    "events_first_touch",
    """
WITH f AS (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events
), a AS (
  SELECT event_type, COUNT(*) AS n_users FROM f WHERE rn = 1 GROUP BY 1
), t AS (SELECT SUM(n_users) AS tot FROM a)
SELECT a.event_type, CAST(a.n_users AS BIGINT) AS n_users,
       (1000 * CAST(a.n_users AS BIGINT)) // CAST(t.tot AS BIGINT)
         AS share_milli
FROM a CROSS JOIN t""",
)
def events_first_touch(sf_dir: str):
    """First-touch attribution: each user's very first event (by
    arrival time, event_id tie-break) credits its event type — the
    acquisition-channel report.

    ``argmax_per_key`` keeps one whole min-row per user with the
    standard two-level shape: each batch reduces itself to ≤ one row
    per user, the user-compressed partials hash-partition, and
    reducers pick the global first per complete user group. The
    attribution counts and shares finish on the types-bounded
    table."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import argmax_per_key, grouped_aggregate

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id",
                                  "event_type"])
    firsts = argmax_per_key(ds, ["user_id"], ["ts", "event_id"],
                            [False, False], num_partitions=8)
    a = grouped_aggregate(firsts, ["event_type"],
                          [("*", "count", "n_users")])
    n = np.asarray(a["n_users"], dtype=np.int64)
    tot = int(n.sum())
    return pa.table({
        "event_type": a["event_type"],
        "n_users": a["n_users"],
        "share_milli": pa.array(1000 * n // tot, pa.int64()),
    })


# --------------------------------------------------------------------------
# Longest consecutive-day activity streak per user → histogram
# --------------------------------------------------------------------------

@query(
    "events_user_streaks",
    """
WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
g AS (
  SELECT user_id,
         (day - DATE '1970-01-01')
           - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS grp
  FROM ud
), runs AS (
  SELECT user_id, COUNT(*) AS len FROM g GROUP BY user_id, grp
), mx AS (
  SELECT user_id, MAX(len) AS max_streak FROM runs GROUP BY 1
)
SELECT CAST(max_streak AS BIGINT) AS max_streak,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM mx GROUP BY 1""",
)
def events_user_streaks(sf_dir: str):
    """Longest consecutive-day activity streak per user, reported as a
    streak-length histogram (the engagement 'streaks' metric).

    Classic gaps-and-islands, distributed: distinct (user, epoch-day)
    pairs come from ONE hash-partitioned count aggregate (days-bounded
    per user); streak runs are then a vectorized segmented scan per
    complete-user partition — day[i]−i is constant within a run, so a
    single diff/cumsum pass finds every run with zero per-group Python
    calls. The histogram finish is streak-lengths-bounded."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import (grouped_aggregate,
                                      grouped_aggregate_ds,
                                      partitioned_group_apply)

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])

    def days(b: pa.Table) -> pa.Table:
        t = np.asarray(b["ts"].combine_chunks()).astype(
            "datetime64[us]").astype(np.int64)
        return pa.table({
            "user_id": b["user_id"],
            "day": pa.array(t // 86_400_000_000),
        })

    ud = grouped_aggregate_ds(
        ds.map_batches(days, batch_format="pyarrow", batch_size=None),
        ["user_id", "day"], [("*", "count", "c")], num_partitions=8)

    def streaks(part: pa.Table) -> pa.Table:
        uid = np.asarray(part["user_id"].combine_chunks(), dtype=np.int64)
        day = np.asarray(part["day"].combine_chunks(), dtype=np.int64)
        order = np.lexsort((day, uid))
        uid, day = uid[order], day[order]
        # run id: changes where the user changes or the day gap != 1
        brk = np.ones(len(uid), dtype=bool)
        if len(uid) > 1:
            brk[1:] = (uid[1:] != uid[:-1]) | (day[1:] != day[:-1] + 1)
        run = np.cumsum(brk) - 1
        run_len = np.bincount(run)
        run_uid = uid[brk]
        # max run per user within this complete-user partition
        uu, inv = np.unique(run_uid, return_inverse=True)
        mx = np.zeros(len(uu), dtype=np.int64)
        np.maximum.at(mx, inv, run_len)
        return pa.table({
            "user_id": pa.array(uu),
            "max_streak": pa.array(mx),
        })

    per_user = partitioned_group_apply(ud, ["user_id"], streaks,
                                       num_partitions=8)
    return grouped_aggregate(per_user, ["max_streak"],
                             [("*", "count", "n_users")])


# --------------------------------------------------------------------------
# Trailing-7-day distinct active users per day
# --------------------------------------------------------------------------

@query(
    "events_trailing_actives",
    """
WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
days AS (SELECT DISTINCT day FROM ud)
SELECT strftime(days.day, '%Y-%m-%d') AS day,
       CAST(COUNT(DISTINCT ud.user_id) AS BIGINT) AS actives_7d
FROM days JOIN ud ON ud.day BETWEEN days.day - 6 AND days.day
GROUP BY 1""",
)
def events_trailing_actives(sf_dir: str):
    """Trailing-7-day distinct active users per day (the WAU curve) —
    the sliding-window COUNT DISTINCT that naive engines answer with a
    7× self-join over raw events.

    Here: distinct (user, day) pairs from one hash-partitioned
    aggregate; per complete-user partition each active day expands to
    the ≤7 window-days it covers and duplicates collapse IN the
    partition (interval union per user, vectorized), so a user counts
    once per window-day no matter how many events they fired; the
    finish is a (user-compressed) per-day sum. Exchange is bounded by
    users × active-days × 7 coverage rows — never events × 7."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import (grouped_aggregate,
                                      grouped_aggregate_ds,
                                      partitioned_group_apply)

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])

    def days(b: pa.Table) -> pa.Table:
        t = np.asarray(b["ts"].combine_chunks()).astype(
            "datetime64[us]").astype(np.int64)
        return pa.table({
            "user_id": b["user_id"],
            "day": pa.array(t // 86_400_000_000),
        })

    ud = grouped_aggregate_ds(
        ds.map_batches(days, batch_format="pyarrow", batch_size=None),
        ["user_id", "day"], [("*", "count", "c")], num_partitions=8)

    def coverage(part: pa.Table) -> pa.Table:
        uid = np.asarray(part["user_id"].combine_chunks(), dtype=np.int64)
        day = np.asarray(part["day"].combine_chunks(), dtype=np.int64)
        # every active day covers window-days [day, day+6]; dedupe the
        # (user, covered-day) pairs inside the complete-user partition
        cov_day = (day[:, None] + np.arange(7, dtype=np.int64)).ravel()
        cov_uid = np.repeat(uid, 7)
        packed = np.unique(cov_uid * (1 << 24) + cov_day)
        return pa.table({
            "day": pa.array(packed & ((1 << 24) - 1)),
            "n": pa.array(np.ones(len(packed), dtype=np.int64)),
        })

    cov = partitioned_group_apply(ud, ["user_id"], coverage,
                                  num_partitions=8)
    per_day = grouped_aggregate(cov, ["day"], [("n", "sum", "actives_7d")])
    # the SQL reports only observed days (a window anchored at a day
    # with no activity at all is not a row); observed days are bounded
    obs = grouped_aggregate(ud, ["day"], [("*", "count", "c")])
    obs_days = set(np.asarray(obs["day"], dtype=np.int64).tolist())
    d = np.asarray(per_day["day"], dtype=np.int64)
    keep = np.array([x in obs_days for x in d.tolist()], dtype=bool)
    d = d[keep]
    n = np.asarray(per_day["actives_7d"], dtype=np.int64)[keep]
    day_str = (d.astype("datetime64[D]")).astype(str)
    return pa.table({
        "day": pa.array(day_str.tolist(), pa.string()),
        "actives_7d": pa.array(n),
    })


# --------------------------------------------------------------------------
# Embedding norm audit (zero / exploding vector health check)
# --------------------------------------------------------------------------

@query(
    "embed_norm_audit",
    """
WITH s AS (
  SELECT CAST(label AS BIGINT) AS label,
         CAST(list_sum(list_transform(embedding,
              x -> CAST(FLOOR(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
                              * 1000000 + 0.5) AS BIGINT))) AS BIGINT)
           AS ssq
  FROM embeddings
)
SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
       CAST(SUM(ssq) AS BIGINT) AS sum_ssq_e6,
       CAST(MIN(ssq) AS BIGINT) AS min_ssq_e6,
       CAST(MAX(ssq) AS BIGINT) AS max_ssq_e6
FROM s GROUP BY 1""",
)
def embed_norm_audit(sf_dir: str):
    """Per-label embedding-norm audit: squared-L2 statistics that
    surface zero vectors (failed encodes) and exploding norms
    (un-normalized mixes) before they poison an ANN index or a cosine
    near-dup pass.

    Per-element squares quantize to exact 1e-6 fixed point BEFORE the
    row sum (float32→double is exact, the double product and floor are
    the identical op on both engines), so every aggregate is an
    order-independent integer. One corpus pass, labels-bounded
    partials, zero shuffle."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["label", "embedding"])

    def partial(b: pa.Table) -> pa.Table:
        col = b["embedding"]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        dim = len(col[0]) if len(col) else 0
        mat = np.asarray(col.flatten(), dtype=np.float64).reshape(-1, dim)
        q = np.floor(mat * mat * 1_000_000 + 0.5).astype(np.int64)
        ssq = q.sum(axis=1)
        labels = np.asarray(b["label"].combine_chunks(), dtype=np.int64)
        return pa.table({
            "label": pa.array(labels),
            "ssq": pa.array(ssq),
        })

    rows = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        ["label"], [("*", "count", "n_vecs"), ("ssq", "sum", "sum_ssq_e6"),
                    ("ssq", "min", "min_ssq_e6"),
                    ("ssq", "max", "max_ssq_e6")])
    return rows


# --------------------------------------------------------------------------
# Year-over-year revenue growth
# --------------------------------------------------------------------------

@query(
    "orders_yoy_growth",
    """
WITH y AS (
  SELECT CAST(strftime(o_orderdate, '%Y') AS BIGINT) AS year,
         SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
           AS revenue_cents
  FROM orders GROUP BY 1
)
SELECT year, CAST(revenue_cents AS BIGINT) AS revenue_cents,
       (1000 * CAST(revenue_cents AS BIGINT))
         // CAST(LAG(revenue_cents) OVER (ORDER BY year) AS BIGINT)
         AS yoy_milli
FROM y""",
)
def orders_yoy_growth(sf_dir: str):
    """Year-over-year revenue growth: yearly revenue (exact integer
    cents) and the YoY ratio in permille against the previous year
    (NULL for the first year, matching LAG semantics).

    One years-bounded count/sum aggregate is the only corpus pass; the
    LAG finish runs driver-side on the tiny series."""
    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderdate", "o_totalprice"])

    def partial(b: pa.Table) -> pa.Table:
        price = np.asarray(b["o_totalprice"].combine_chunks(),
                           dtype=np.float64)
        cents = np.floor(price * 100 + 0.5).astype(np.int64)
        yr = pc.cast(pc.strftime(b["o_orderdate"], format="%Y"),
                     pa.int64())
        return pa.table({"year": yr, "cents": pa.array(cents)})

    y = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        ["year"], [("cents", "sum", "revenue_cents")])
    yr = np.asarray(y["year"], dtype=np.int64)
    rev = np.asarray(y["revenue_cents"], dtype=np.int64)
    order = np.argsort(yr)
    yr, rev = yr[order], rev[order]
    yoy = [None] + [int(1000 * rev[i] // rev[i - 1])
                    for i in range(1, len(rev))]
    return pa.table({
        "year": pa.array(yr),
        "revenue_cents": pa.array(rev),
        "yoy_milli": pa.array(yoy, pa.int64()),
    })


# --------------------------------------------------------------------------
# TPC-H Q12 shape: shipping-delay bands per order priority
# --------------------------------------------------------------------------

@query(
    "lineitem_ship_delay",
    """
WITH d AS (
  SELECT o.o_orderpriority,
         (CAST(l.l_shipdate AS DATE) - CAST(o.o_orderdate AS DATE))
           AS delay
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
)
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CASE WHEN delay < 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_early,
       CAST(SUM(CASE WHEN delay BETWEEN 0 AND 7 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_fast,
       CAST(SUM(CASE WHEN delay BETWEEN 8 AND 30 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_normal,
       CAST(SUM(CASE WHEN delay > 30 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_late,
       CAST(MIN(delay) AS BIGINT) AS min_delay,
       CAST(MAX(delay) AS BIGINT) AS max_delay
FROM d GROUP BY 1""",
)
def lineitem_ship_delay(sf_dir: str):
    """Shipping-delay audit per order priority (TPC-H Q12 shape):
    order-date → ship-date lag classified into early/fast/normal/late
    bands, plus the min/max day extremes.

    The lineitem fact first compresses to (orderkey, ship-epoch-day)
    COUNTS (orders have few distinct ship days each), so the hash join
    against orders' (orderkey, orderdate, priority) projection
    exchanges key-bounded rows on both sides; band classification and
    the priority-bounded aggregate finish after the join. Day
    arithmetic is integer epoch-day subtraction on both engines — no
    division anywhere, so negative lags are exact."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate, grouped_aggregate_ds

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_shipdate"])

    def lday(b: pa.Table) -> pa.Table:
        t = np.asarray(b["l_shipdate"].combine_chunks()).astype(
            "datetime64[D]").astype(np.int64)
        return pa.table({
            "l_orderkey": b["l_orderkey"],
            "ship_day": pa.array(t),
        })

    lc = grouped_aggregate_ds(
        li.map_batches(lday, batch_format="pyarrow", batch_size=None),
        ["l_orderkey", "ship_day"], [("*", "count", "n")],
        num_partitions=8)
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderdate",
                                      "o_orderpriority"])

    def oday(b: pa.Table) -> pa.Table:
        t = np.asarray(b["o_orderdate"].combine_chunks()).astype(
            "datetime64[D]").astype(np.int64)
        return pa.table({
            "o_orderkey": b["o_orderkey"],
            "o_orderpriority": b["o_orderpriority"],
            "order_day": pa.array(t),
        })

    od = orders.map_batches(oday, batch_format="pyarrow", batch_size=None)
    j = lc.join(od, join_type="inner", num_partitions=8,
                on=("l_orderkey",), right_on=("o_orderkey",))

    def bands(b: pa.Table) -> pa.Table:
        delay = (np.asarray(b["ship_day"].combine_chunks(), np.int64)
                 - np.asarray(b["order_day"].combine_chunks(), np.int64))
        n = np.asarray(b["n"].combine_chunks(), dtype=np.int64)
        big = np.where(delay < 0, np.int64(10**9), delay)  # min sentinel
        return pa.table({
            "o_orderpriority": b["o_orderpriority"],
            "n": pa.array(n),
            "early": pa.array(np.where(delay < 0, n, 0)),
            "fast": pa.array(np.where((delay >= 0) & (delay <= 7), n, 0)),
            "normal": pa.array(np.where((delay >= 8) & (delay <= 30),
                                        n, 0)),
            "late": pa.array(np.where(delay > 30, n, 0)),
            "dmin": pa.array(delay),
            "dmax": pa.array(delay),
        })

    out = grouped_aggregate(
        j.map_batches(bands, batch_format="pyarrow", batch_size=None),
        ["o_orderpriority"],
        [("n", "sum", "n_items"), ("early", "sum", "n_early"),
         ("fast", "sum", "n_fast"), ("normal", "sum", "n_normal"),
         ("late", "sum", "n_late"), ("dmin", "min", "min_delay"),
         ("dmax", "max", "max_delay")])
    return out


# --------------------------------------------------------------------------
# Coleman-Liau readability proxy per source (integer-exact)
# --------------------------------------------------------------------------

@query(
    "docs_readability",
    """
WITH m AS (
  SELECT source,
         CAST(length(replace(text, ' ', '')) AS BIGINT) AS letters,
         GREATEST(CAST(length(text) AS BIGINT)
                  - CAST(length(replace(text, '.', '')) AS BIGINT),
                  1) AS sents,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS words
  FROM documents
), s AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         SUM(letters) AS letters, SUM(sents) AS sents,
         SUM(words) AS words
  FROM m GROUP BY 1
)
SELECT source, n_docs,
       CAST(GREATEST(588 * letters - 2960 * sents, 0) // words - 1580
            AS BIGINT) AS cli_centi
FROM s""",
)
def docs_readability(sf_dir: str):
    """Coleman-Liau readability index per source (×100, integer): the
    curation signal that flags sources whose prose complexity is
    anomalous (too low = spam fragments, too high = OCR noise). CLI
    needs only letters-per-word and sentences-per-word, so it is exact
    in integer arithmetic — no syllable model.

    Letters / sentence-dots / words are vectorized Arrow kernels
    (utf8_length + substring counts), partials are sources-bounded
    sums, and the single division happens once on the aggregate (the
    clamp keeps the numerator non-negative — DuckDB `//` truncates
    toward zero while numpy floors, so negatives must never reach the
    division). Map-only over the corpus; zero shuffle."""
    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["source", "text"])

    def metrics(b: pa.Table) -> pa.Table:
        txt = b["text"].combine_chunks()
        total = np.asarray(pc.utf8_length(txt), dtype=np.int64)
        spaces = np.asarray(pc.count_substring(txt, " "), dtype=np.int64)
        dots = np.asarray(pc.count_substring(txt, "."), dtype=np.int64)
        return pa.table({
            "source": b["source"],
            "letters": pa.array(total - spaces),
            "sents": pa.array(np.maximum(dots, 1)),
            "words": pa.array(spaces + 1),
        })

    s = grouped_aggregate(
        ds.map_batches(metrics, batch_format="pyarrow", batch_size=None),
        ["source"], [("*", "count", "n_docs"), ("letters", "sum", "l"),
                     ("sents", "sum", "s"), ("words", "sum", "w")])
    letters = np.asarray(s["l"], dtype=np.int64)
    sents = np.asarray(s["s"], dtype=np.int64)
    words = np.asarray(s["w"], dtype=np.int64)
    cli = np.maximum(588 * letters - 2960 * sents, 0) // words - 1580
    return pa.table({
        "source": s["source"],
        "n_docs": s["n_docs"],
        "cli_centi": pa.array(cli, pa.int64()),
    })


# --------------------------------------------------------------------------
# Embedding cluster-quality audit (integer-exact cohesion + separation)
# --------------------------------------------------------------------------

@query(
    "embed_cluster_quality",
    """
WITH e AS (
  SELECT CAST(label AS BIGINT) AS label,
         unnest(list_transform(embedding,
                x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000 + 0.5)
                          AS BIGINT))) AS xq,
         unnest(generate_series(1, len(embedding))) AS d
  FROM embeddings
), sd AS (
  SELECT label, d, SUM(xq) AS s, SUM(xq * xq) AS q FROM e GROUP BY 1, 2
), n AS (
  SELECT CAST(label AS BIGINT) AS label, CAST(COUNT(*) AS BIGINT) AS n
  FROM embeddings GROUP BY 1
), coh AS (
  SELECT sd.label, n.n,
         CAST((CAST(n.n AS HUGEINT) * SUM(sd.q) - SUM(CAST(sd.s AS HUGEINT) * sd.s))
              // (CAST(n.n AS HUGEINT) * n.n * 1000) AS BIGINT)
           AS cohesion_milli
  FROM sd JOIN n USING (label) GROUP BY 1, 2
), sep AS (
  SELECT a.label AS la, b.label AS lb,
         CAST((1000 * SUM((CAST(sa.s AS HUGEINT) * b.n - CAST(sb.s AS HUGEINT) * a.n)
                          * (CAST(sa.s AS HUGEINT) * b.n - CAST(sb.s AS HUGEINT) * a.n)))
              // (CAST(a.n AS HUGEINT) * a.n * b.n * b.n * 1000000)
              AS BIGINT) AS sep_milli
  FROM sd sa JOIN sd sb ON sa.d = sb.d AND sa.label <> sb.label
       JOIN n a ON a.label = sa.label JOIN n b ON b.label = sb.label
  GROUP BY 1, 2, a.n, b.n
), nearest AS (
  SELECT la AS label, lb AS nearest_label, sep_milli,
         ROW_NUMBER() OVER (PARTITION BY la ORDER BY sep_milli, lb)
           AS rn
  FROM sep
)
SELECT coh.label, coh.n AS n_vecs, coh.cohesion_milli,
       nearest.nearest_label, nearest.sep_milli
FROM coh JOIN nearest USING (label) WHERE nearest.rn = 1""",
)
def embed_cluster_quality(sf_dir: str):
    """Cluster-quality audit over the labeled embedding table: per
    label the within-cluster cohesion (trace of the cluster variance)
    and the squared distance to the NEAREST other centroid — the
    Davies-Bouldin ingredients that tell you which labels are
    collapsing into each other before you trust them as dedup buckets
    or classifier targets.

    Everything reduces to three integer moments per (label, dim) —
    n, Σx, Σx² over 1e-3-quantized components — gathered in ONE corpus
    pass with labels×dims-bounded partials. Cohesion and pairwise
    centroid separations are exact integer rationals of those moments
    (n·ΣQ − ΣS² and (S_i·n_j − S_j·n_i)² — Python arbitrary-precision
    on the driver, HUGEINT in the oracle), quantized to identical
    milli integers on both engines. No per-vector distance pass, no
    pairwise vector work: labels² × dims arithmetic only."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["label", "embedding"])

    def partial(b: pa.Table) -> pa.Table:
        col = b["embedding"]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        dim = len(col[0]) if len(col) else 0
        mat = np.asarray(col.flatten(), dtype=np.float64).reshape(-1, dim)
        q = np.floor(mat * 1000 + 0.5).astype(np.int64)
        labels = np.asarray(b["label"].combine_chunks(), dtype=np.int64)
        uk = np.unique(labels)
        rows = []
        for lb in uk:  # few labels; per-label reduction is vectorized
            sub = q[labels == lb]
            rows.append((lb, len(sub), sub.sum(axis=0),
                         int((sub.astype(object) ** 2).sum())
                         if len(sub) > 100_000 else int((sub * sub).sum())))
        return pa.table({
            "label": pa.array([r[0] for r in rows], pa.int64()),
            "n": pa.array([r[1] for r in rows], pa.int64()),
            "s": pa.array([r[2].tolist() for r in rows],
                          pa.list_(pa.int64())),
            "q": pa.array([r[3] for r in rows], pa.int64()),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None)
    tbls = list(parts.iter_batches(batch_format="pyarrow",
                                   batch_size=None))
    merged = pa.concat_tables([t for t in tbls if t.num_rows],
                              promote_options="default")
    lab = np.asarray(merged["label"], dtype=np.int64)
    nn = np.asarray(merged["n"], dtype=np.int64)
    qq = np.asarray(merged["q"], dtype=np.int64)
    sv = merged["s"].combine_chunks()
    dim = len(sv[0])
    smat = np.asarray(sv.flatten(), dtype=np.int64).reshape(-1, dim)
    labels = np.unique(lab)
    # exact integer moments per label (Python ints from here on)
    N, S, Q = {}, {}, {}
    for lb in labels:
        m = lab == lb
        N[lb] = int(nn[m].sum())
        S[lb] = [int(x) for x in smat[m].sum(axis=0)]
        Q[lb] = int(qq[m].sum())
    out = []
    for lb in labels:
        n, s, qsum = N[lb], S[lb], Q[lb]
        coh = (n * qsum - sum(x * x for x in s)) // (n * n * 1000)
        best = None
        for ot in labels:
            if ot == lb:
                continue
            no, so = N[ot], S[ot]
            num = 1000 * sum((si * no - oi * n) ** 2
                             for si, oi in zip(s, so))
            sep = num // (n * n * no * no * 1_000_000)
            if best is None or (sep, ot) < best:
                best = (sep, ot)
        if best is None:  # single label: no other centroid to compare
            continue
        out.append((int(lb), n, coh, int(best[1]), best[0]))
    return pa.table({
        "label": pa.array([r[0] for r in out], pa.int64()),
        "n_vecs": pa.array([r[1] for r in out], pa.int64()),
        "cohesion_milli": pa.array([r[2] for r in out], pa.int64()),
        "nearest_label": pa.array([r[3] for r in out], pa.int64()),
        "sep_milli": pa.array([r[4] for r in out], pa.int64()),
    })


# --------------------------------------------------------------------------
# Sequence-level token diversity (distinct/len TTR deciles)
# --------------------------------------------------------------------------

@query(
    "tokens_unique_rate",
    None,  # composed below with the recs2 prefix
)
def tokens_unique_rate(sf_dir: str):
    """Sequence-level token diversity: distinct-token / length ratio
    per sequence, histogrammed by decile — the cheap screen for
    degenerate sequences (decile 0-2 ≈ heavy repetition) that runs
    before the expensive trigram/repetition kernels.

    The per-row distinct count is one vectorized pass over the flat
    token buffer (row-id-packed unique + bincount — no per-row Python,
    no hashing of list objects); the histogram finish is 11 rows. Map
    only; zero shuffle."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate
    from raylog.pipelines import log_pipeline as LP

    ds = LP.records_ds(sf_dir).select_columns(["tokens", "n_tok"])

    def rate(b: pa.Table) -> pa.Table:
        col = b["tokens"]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        n_tok = np.asarray(b["n_tok"].combine_chunks(), dtype=np.int64)
        flat = np.asarray(col.flatten(), dtype=np.int64)
        rid = np.repeat(np.arange(len(n_tok), dtype=np.int64), n_tok)
        packed = np.unique(rid * (1 << 32) + flat)
        distinct = np.bincount((packed >> 32).astype(np.int64),
                               minlength=len(n_tok))
        dec = np.where(n_tok > 0, 10 * distinct // np.maximum(n_tok, 1),
                       0)
        return pa.table({
            "decile": pa.array(dec.astype(np.int64)),
            "one": pa.array(np.ones(len(dec), dtype=np.int64)),
            "ntk": pa.array(n_tok),
        })

    return grouped_aggregate(
        ds.map_batches(rate, batch_format="pyarrow", batch_size=None),
        ["decile"], [("one", "sum", "n_seqs"), ("ntk", "sum", "sum_tok")])


from raylog.pipelines.qbase import ORACLES as _OR
from raylog import records as _R

_OR["tokens_unique_rate"] = _R.oracle_prefix() + """
SELECT (10 * CAST(len(list_distinct(tokens)) AS BIGINT)) // n_tok
         AS decile,
       CAST(COUNT(*) AS BIGINT) AS n_seqs,
       CAST(SUM(n_tok) AS BIGINT) AS sum_tok
FROM recs2 WHERE n_tok > 0 GROUP BY 1"""


# --------------------------------------------------------------------------
# TPC-H Q7 shape: trade volume between nation pairs
# --------------------------------------------------------------------------

@query(
    "nation_trade_volume",
    """
WITH rev AS (
  SELECT l_orderkey, l_suppkey,
         CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000 + 0.5)
              AS BIGINT) AS rev
  FROM lineitem
), j AS (
  SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation, rev
  FROM rev
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation nc ON c_nationkey = nc.n_nationkey
  JOIN nation ns ON s_nationkey = ns.n_nationkey
)
SELECT supp_nation, cust_nation, CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(rev) AS BIGINT) AS revenue_e4
FROM j GROUP BY 1, 2""",
)
def nation_trade_volume(sf_dir: str):
    """Trade volume between (supplier nation, customer nation) pairs
    (TPC-H Q7 shape) — the five-table star flattened to ONE fact
    exchange.

    Supplier⋈nation and customer⋈nation are dimension chains: both
    collapse driver-side to key→nation-key lookup arrays and
    broadcast once via ``ray.put`` (the repo's Q5 convention). The
    lineitem fact pre-aggregates BEFORE the one unavoidable hash join
    against orders' (orderkey, custkey) projection — and the supplier
    nation rides PACKED INSIDE the integer group key
    (orderkey·32 + natkey; nation cardinality 25 < 32, orderkey <
    2^58 — holds to TPC-H SF ~10^7), so the whole exchange is a
    single-int64-key combine with no string payload. Names attach to
    the final nations²-bounded table only."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate, grouped_aggregate_ds

    nat = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    nname = dict(zip(nat["n_nationkey"].astype(np.int64), nat["n_name"]))
    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"]).to_pandas()
    sk = supp["s_suppkey"].to_numpy(np.int64)
    s_nat = np.zeros(int(sk.max()) + 1, dtype=np.int64)
    s_nat[sk] = supp["s_nationkey"].to_numpy(np.int64)
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"]).to_pandas()
    ck = cust["c_custkey"].to_numpy(np.int64)
    c_nat = np.zeros(int(ck.max()) + 1, dtype=np.int64)
    c_nat[ck] = cust["c_nationkey"].to_numpy(np.int64)
    s_ref = ray.put(s_nat) if ray.is_initialized() else s_nat
    c_ref = ray.put(c_nat) if ray.is_initialized() else c_nat

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_suppkey",
                                  "l_extendedprice", "l_discount"])

    def partial(b: pa.Table) -> pa.Table:
        s_nat_ = ray.get(s_ref) if ray.is_initialized() else s_ref
        price = np.asarray(b["l_extendedprice"].combine_chunks(),
                           dtype=np.float64)
        disc = np.asarray(b["l_discount"].combine_chunks(),
                          dtype=np.float64)
        rev = np.floor(price * (1 - disc) * 10000 + 0.5).astype(np.int64)
        sup = np.asarray(b["l_suppkey"].combine_chunks(), dtype=np.int64)
        okey = np.asarray(b["l_orderkey"].combine_chunks(), dtype=np.int64)
        return pa.table({
            "l_orderkey": pa.array(okey * 32 + s_nat_[sup]),
            "rev": pa.array(rev),
            "one": pa.array(np.ones(len(rev), dtype=np.int64)),
        })

    per_ord = grouped_aggregate_ds(
        li.map_batches(partial, batch_format="pyarrow", batch_size=None),
        ["l_orderkey"],
        [("rev", "sum", "rev"), ("one", "sum", "n")], num_partitions=8)

    def unpack(b: pa.Table) -> pa.Table:
        k = np.asarray(b["l_orderkey"].combine_chunks(), dtype=np.int64)
        return pa.table({
            "l_orderkey": pa.array(k // 32),
            "snat": pa.array(k % 32),
            "rev": b["rev"],
            "n": b["n"],
        })

    per_ord = per_ord.map_batches(unpack, batch_format="pyarrow",
                                  batch_size=None)
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])
    j = per_ord.join(orders, join_type="inner", num_partitions=8,
                     on=("l_orderkey",), right_on=("o_orderkey",))

    def attach_cust(b: pa.Table) -> pa.Table:
        c_nat_ = ray.get(c_ref) if ray.is_initialized() else c_ref
        cust_ = np.asarray(b["o_custkey"].combine_chunks(), dtype=np.int64)
        return pa.table({
            "snat": b["snat"],
            "cnat": pa.array(c_nat_[cust_]),
            "rev": b["rev"],
            "n": b["n"],
        })

    out = grouped_aggregate(
        j.map_batches(attach_cust, batch_format="pyarrow",
                      batch_size=None),
        ["snat", "cnat"],
        [("n", "sum", "n_items"), ("rev", "sum", "revenue_e4")])
    sn = np.asarray(out["snat"], dtype=np.int64)
    cn = np.asarray(out["cnat"], dtype=np.int64)
    return pa.table({
        "supp_nation": pa.array([nname[k] for k in sn], pa.string()),
        "cust_nation": pa.array([nname[k] for k in cn], pa.string()),
        "n_items": out["n_items"],
        "revenue_e4": out["revenue_e4"],
    })


# --------------------------------------------------------------------------
# Winsorized mean (robust KPI) per event type
# --------------------------------------------------------------------------

@query(
    "events_value_winsorized",
    """
WITH v AS (
  SELECT event_type, CAST(FLOOR(value * 10000 + 0.5) AS BIGINT) AS v
  FROM events
), f AS (
  SELECT event_type, quantile_disc(v, 0.05) AS lo,
         quantile_disc(v, 0.95) AS hi
  FROM v GROUP BY 1
)
SELECT v.event_type, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(f.lo AS BIGINT) AS lo_e4, CAST(f.hi AS BIGINT) AS hi_e4,
       CAST(SUM(LEAST(GREATEST(v.v, f.lo), f.hi)) // COUNT(*) AS BIGINT)
         AS wins_mean_e4
FROM v JOIN f USING (event_type) GROUP BY 1, f.lo, f.hi""",
)
def events_value_winsorized(sf_dir: str):
    """Winsorized mean of the event value per type — the robust KPI
    that a handful of fat-finger outliers cannot move (clamp at the
    exact p05/p95, then average).

    Pass 1 computes EXACT per-type 5/95 fences through the distributed
    count-histogram quantile kernel (values pre-quantized to 1e-4
    integers, so the quantile is a real element and the later sum is
    order-independent); the fences broadcast; pass 2 is a map-only
    clamp + per-type integer sum. No sort of the raw stream."""
    import numpy as np
    import ray
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate
    from raylog.functions.quantile import grouped_quantiles

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])

    def quant(b: pa.Table) -> pa.Table:
        v = np.asarray(b["value"].combine_chunks(), dtype=np.float64)
        return pa.table({
            "event_type": b["event_type"],
            "v": pa.array(np.floor(v * 10000 + 0.5).astype(np.int64)),
        })

    vds = ds.map_batches(quant, batch_format="pyarrow", batch_size=None)
    q = grouped_quantiles(vds, key="event_type", value="v",
                          ps=[0.05, 0.95], out_names=["lo", "hi"],
                          num_partitions=8)
    fences = {r["event_type"]: (int(r["lo"]), int(r["hi"]))
              for r in q.to_pandas().to_dict("records")}
    ref = ray.put(fences) if ray.is_initialized() else fences

    def clamp(b: pa.Table) -> pa.Table:
        fences_ = ray.get(ref) if ray.is_initialized() else ref
        enc = b["event_type"].combine_chunks().dictionary_encode()
        # per-dictionary (not per-row) fence lookup, then one gather
        dlo = np.array([fences_[t][0] for t in enc.dictionary.to_pylist()],
                       dtype=np.int64)
        dhi = np.array([fences_[t][1] for t in enc.dictionary.to_pylist()],
                       dtype=np.int64)
        idx = np.asarray(enc.indices, dtype=np.int64)
        v = np.asarray(b["v"].combine_chunks(), dtype=np.int64)
        lo, hi = dlo[idx], dhi[idx]
        return pa.table({
            "event_type": b["event_type"],
            "w": pa.array(np.clip(v, lo, hi)),
            "lo": pa.array(lo),
            "hi": pa.array(hi),
        })

    agg = grouped_aggregate(
        vds.map_batches(clamp, batch_format="pyarrow", batch_size=None),
        ["event_type"], [("*", "count", "n"), ("w", "sum", "wsum"),
                         ("lo", "min", "lo_e4"), ("hi", "min", "hi_e4")])
    n = np.asarray(agg["n"], dtype=np.int64)
    ws = np.asarray(agg["wsum"], dtype=np.int64)
    return pa.table({
        "event_type": agg["event_type"],
        "n": agg["n"],
        "lo_e4": agg["lo_e4"],
        "hi_e4": agg["hi_e4"],
        "wins_mean_e4": pa.array(ws // n, pa.int64()),
    })


# --------------------------------------------------------------------------
# A/B holdout lift audit (deterministic hash split)
# --------------------------------------------------------------------------

@query(
    "events_ab_lift",
    """
WITH u AS (
  SELECT user_id % 2 AS variant,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           AS conv
  FROM events GROUP BY user_id
)
SELECT CAST(variant AS BIGINT) AS variant,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(conv) AS BIGINT) AS n_converted,
       (1000 * CAST(SUM(conv) AS BIGINT)) // CAST(COUNT(*) AS BIGINT)
         AS cvr_milli
FROM u GROUP BY 1""",
)
def events_ab_lift(sf_dir: str):
    """A/B holdout audit: users deterministically split by id parity,
    per-variant conversion (≥1 purchase event) counts and rate — the
    sanity check that a rollout's treatment and control cohorts are
    balanced and the conversion delta is real.

    Per-user conversion is ONE hash-partitioned max aggregate (user
    cardinality-bounded, batch-compressed partials); variants reduce
    that to two rows. Integer permille throughout — no float."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate, grouped_aggregate_ds

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type"])

    def conv(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        is_p = pc.equal(b["event_type"].combine_chunks(),
                        pa.scalar("purchase"))
        return pa.table({
            "user_id": b["user_id"],
            "conv": pc.cast(is_p, pa.int64()),
        })

    per_user = grouped_aggregate_ds(
        ds.map_batches(conv, batch_format="pyarrow", batch_size=None),
        ["user_id"], [("conv", "max", "conv")], num_partitions=8)

    def variant(b: pa.Table) -> pa.Table:
        uid = np.asarray(b["user_id"].combine_chunks(), dtype=np.int64)
        return pa.table({
            "variant": pa.array(uid % 2),
            "conv": b["conv"],
        })

    a = grouped_aggregate(
        per_user.map_batches(variant, batch_format="pyarrow",
                             batch_size=None),
        ["variant"], [("*", "count", "n_users"),
                      ("conv", "sum", "n_converted")])
    n = np.asarray(a["n_users"], dtype=np.int64)
    c = np.asarray(a["n_converted"], dtype=np.int64)
    return pa.table({
        "variant": a["variant"],
        "n_users": a["n_users"],
        "n_converted": a["n_converted"],
        "cvr_milli": pa.array(1000 * c // n, pa.int64()),
    })


# --------------------------------------------------------------------------
# Weekday × hour traffic heatmap
# --------------------------------------------------------------------------

@query(
    "events_hour_heatmap",
    """
WITH c AS (
  SELECT CAST(dayofweek(ts) AS BIGINT) AS weekday,
         CAST(hour(ts) AS BIGINT) AS hour, COUNT(*) AS n
  FROM events GROUP BY 1, 2
), t AS (SELECT SUM(n) AS tot FROM c)
SELECT weekday, hour, CAST(n AS BIGINT) AS n,
       (100000 * CAST(n AS BIGINT)) // CAST(t.tot AS BIGINT)
         AS share_e5
FROM c CROSS JOIN t""",
)
def events_hour_heatmap(sf_dir: str):
    """Weekday × hour traffic heatmap (the capacity-planning grid):
    event counts per (day-of-week, hour-of-day) cell plus each cell's
    share in 1e-5 units. One pass, 7×24-bounded partials; day-of-week
    from epoch-day arithmetic ((days+4) % 7 matches DuckDB's
    Sunday=0 dayofweek for the post-1970 domain)."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])

    def cells(b: pa.Table) -> pa.Table:
        t = np.asarray(b["ts"].combine_chunks()).astype(
            "datetime64[us]").astype(np.int64)
        day = t // 86_400_000_000
        hour = (t % 86_400_000_000) // 3_600_000_000
        weekday = (day + 4) % 7  # 1970-01-01 was a Thursday; Sunday=0
        return pa.table({
            "weekday": pa.array(weekday),
            "hour": pa.array(hour),
        })

    c = grouped_aggregate(
        ds.map_batches(cells, batch_format="pyarrow", batch_size=None),
        ["weekday", "hour"], [("*", "count", "n")])
    n = np.asarray(c["n"], dtype=np.int64)
    tot = int(n.sum())
    return pa.table({
        "weekday": c["weekday"],
        "hour": c["hour"],
        "n": c["n"],
        "share_e5": pa.array(100000 * n // tot, pa.int64()),
    })


# --------------------------------------------------------------------------
# Near-dup pair-graph degree histogram
# --------------------------------------------------------------------------

@query(
    "dedup_pair_degree_hist",
    """
WITH docs AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
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
deg AS (
  SELECT d, COUNT(*) AS degree FROM (
    SELECT doc_a AS d FROM np UNION ALL SELECT doc_b FROM np
  ) GROUP BY 1
)
SELECT CAST(degree AS BIGINT) AS degree,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM deg GROUP BY 1""",
)
def dedup_pair_degree_hist(sf_dir: str):
    """Degree histogram of the near-dup pair graph (J ≥ 0.3 word
    3-grams): how many docs have 1, 2, … near-duplicates. The shape
    diagnostic that separates pairwise re-crawls (degree 1-2) from
    template explosions (one hub with degree 10⁴ — the case where CC
    clustering and keep-one dedup behave very differently).

    Rides the oracled ``ngram_jaccard_pairs`` kernel unchanged; the
    finish is a per-doc degree count (hash-partitioned, pair-bounded)
    folded into a degrees-bounded histogram."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate, grouped_aggregate_ds
    from raylog.functions.dedup import ngram_jaccard_pairs

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    pairs = ngram_jaccard_pairs(ds, threshold=0.3)

    def endpoints(b: pa.Table) -> pa.Table:
        a = np.asarray(b["doc_a"].combine_chunks(), dtype=np.int64)
        bb = np.asarray(b["doc_b"].combine_chunks(), dtype=np.int64)
        return pa.table({
            "d": pa.array(np.concatenate([a, bb])),
            "one": pa.array(np.ones(2 * len(a), dtype=np.int64)),
        })

    deg = grouped_aggregate_ds(
        pairs.map_batches(endpoints, batch_format="pyarrow",
                          batch_size=None),
        ["d"], [("one", "sum", "degree")], num_partitions=8)
    return grouped_aggregate(deg, ["degree"], [("*", "count", "n_docs")])


# --------------------------------------------------------------------------
# TPC-H Q3 shape: top unshipped orders by accrued revenue
# --------------------------------------------------------------------------

@query(
    "orders_q3_unshipped",
    """
WITH r AS (
  SELECT l.l_orderkey,
         SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 10000
                        + 0.5) AS BIGINT)) AS revenue_e4
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE c.c_mktsegment = 'BUILDING'
    AND o.o_orderdate < DATE '1997-01-01'
    AND l.l_shipdate > DATE '1997-01-01'
  GROUP BY 1
), rk AS (
  SELECT l_orderkey, CAST(revenue_e4 AS BIGINT) AS revenue_e4,
         ROW_NUMBER() OVER (ORDER BY revenue_e4 DESC, l_orderkey) AS rnk
  FROM r
)
SELECT CAST(rnk AS BIGINT) AS rnk, l_orderkey, revenue_e4
FROM rk WHERE rnk <= 10""",
)
def orders_q3_unshipped(sf_dir: str):
    """Top-10 unshipped orders by accrued revenue for one market
    segment (TPC-H Q3 shape) — the classic selective-filter star.

    Physical plan: the BUILDING custkey set is a broadcast bitmap (dim
    chain, Q5 convention); orders filter (segment ∧ date) BEFORE
    shipping only qualifying orderkeys into the hash join; lineitem
    prunes to three columns at the read and pre-aggregates per
    orderkey AFTER its own shipdate filter. The only exchange is the
    qualifying-orderkey join + a partial top-k merge — the driver sees
    10 rows."""
    import numpy as np
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate_ds
    from raylog.functions.topk import topk

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_mktsegment"]).to_pandas()
    ck = cust["c_custkey"].to_numpy(np.int64)
    bld = np.zeros(int(ck.max()) + 1, dtype=bool)
    bld[ck[cust["c_mktsegment"].to_numpy() == "BUILDING"]] = True
    ref = ray.put(bld) if ray.is_initialized() else bld
    cutoff = np.datetime64("1997-01-01").astype("datetime64[us]")

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey",
                                      "o_orderdate"])

    def qual_orders(b: pa.Table) -> pa.Table:
        bld_ = ray.get(ref) if ray.is_initialized() else ref
        cd = np.asarray(b["o_orderdate"].combine_chunks()).astype(
            "datetime64[us]")
        cu = np.asarray(b["o_custkey"].combine_chunks(), dtype=np.int64)
        keep = (cd < cutoff) & bld_[cu]
        return pa.table({"o_orderkey": b["o_orderkey"]}).filter(
            pa.array(keep))

    qo = orders.map_batches(qual_orders, batch_format="pyarrow",
                            batch_size=None)
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_extendedprice",
                                  "l_discount", "l_shipdate"])

    def unshipped(b: pa.Table) -> pa.Table:
        sd = np.asarray(b["l_shipdate"].combine_chunks()).astype(
            "datetime64[us]")
        keep = sd > cutoff
        b = b.filter(pa.array(keep))
        price = np.asarray(b["l_extendedprice"].combine_chunks(),
                           dtype=np.float64)
        disc = np.asarray(b["l_discount"].combine_chunks(),
                          dtype=np.float64)
        rev = np.floor(price * (1 - disc) * 10000 + 0.5).astype(np.int64)
        return pa.table({
            "l_orderkey": b["l_orderkey"],
            "rev": pa.array(rev),
        })

    lr = grouped_aggregate_ds(
        li.map_batches(unshipped, batch_format="pyarrow",
                       batch_size=None),
        ["l_orderkey"], [("rev", "sum", "revenue_e4")], num_partitions=8)
    from raylog.functions.agg import seed_join_side
    lr = seed_join_side(lr, pa.table({
        "l_orderkey": pa.array([_JOIN_SENTINEL], pa.int64()),
        "revenue_e4": pa.array([0], pa.int64()),
    }))  # both sides are filtered and can be empty (SCALE.md hazard)
    qo = seed_join_side(qo, pa.table({
        "o_orderkey": pa.array([_JOIN_SENTINEL - 1], pa.int64()),
    }))
    j = lr.join(qo, join_type="inner", num_partitions=8,
                on=("l_orderkey",), right_on=("o_orderkey",))
    top = topk(j, sort_cols=["revenue_e4", "l_orderkey"],
               descending=[True, False], k=10)
    return pa.table({
        "rnk": pa.array(np.arange(1, top.num_rows + 1), pa.int64()),
        "l_orderkey": top["l_orderkey"],
        "revenue_e4": top["revenue_e4"],
    })


# --------------------------------------------------------------------------
# Cross-source quantile normalization (score calibration)
# --------------------------------------------------------------------------

@query(
    "docs_quantile_normalize",
    """
WITH d AS (SELECT doc_id, source, n_chars AS score FROM documents),
r AS (
  SELECT doc_id, source, score,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY score, doc_id) AS rk,
         COUNT(*) OVER (PARTITION BY source) AS ns,
         COUNT(*) OVER () AS n
  FROM d
),
g AS (
  SELECT score, SUM(COUNT(*)) OVER (ORDER BY score) AS cum
  FROM d GROUP BY score
)
SELECT r.doc_id, r.source, CAST(r.score AS BIGINT) AS score,
       CAST((SELECT MIN(g.score) FROM g
             WHERE g.cum >= ((r.rk * r.n + r.ns - 1) // r.ns))
            AS BIGINT) AS norm_score
FROM r""",
)
def docs_quantile_normalize(sf_dir: str):
    """Cross-source quantile normalization of the per-doc quality score
    (here: n_chars): each doc's within-source rank maps onto the GLOBAL
    score distribution, so a '90th-percentile doc of source A' and a
    '90th-percentile doc of source B' get the SAME calibrated value —
    the standard fix before mixing heterogeneous sources with one
    quality threshold.

    Pass A: one (score, count) global histogram (bounded by distinct
    lengths), cum-summed and broadcast. Pass B: complete-source
    partitions rank their docs with one vectorized sort, compute the
    exact ceil-rank target in integer arithmetic (positive operands
    only — DuckDB truncating `//` == numpy floor there), and read the
    calibrated value off the broadcast CDF with one searchsorted. No
    global sort, no per-row Python."""
    import numpy as np
    import ray
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate, partitioned_group_apply

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "source", "n_chars"])

    g = grouped_aggregate(ds, ["n_chars"], [("*", "count", "c")])
    sc = np.asarray(g["n_chars"], dtype=np.int64)
    cnt = np.asarray(g["c"], dtype=np.int64)
    order = np.argsort(sc)
    scores, cum = sc[order], np.cumsum(cnt[order])
    n_total = int(cum[-1]) if len(cum) else 0
    ref = (ray.put((scores, cum)) if ray.is_initialized()
           else (scores, cum))

    def normalize(part: pa.Table) -> pa.Table:
        scores_, cum_ = ray.get(ref) if ray.is_initialized() else ref
        src = part["source"].to_pandas().to_numpy()
        did = np.asarray(part["doc_id"].combine_chunks(), dtype=np.int64)
        val = np.asarray(part["n_chars"].combine_chunks(), dtype=np.int64)
        order = np.lexsort((did, val, src))
        src, did, val = src[order], did[order], val[order]
        brk = np.ones(len(src), dtype=bool)
        if len(src) > 1:
            brk[1:] = src[1:] != src[:-1]
        seg = np.cumsum(brk) - 1
        seg_start = np.flatnonzero(brk)
        sizes = np.diff(np.append(seg_start, len(src)))
        rk = np.arange(len(src), dtype=np.int64) - seg_start[seg] + 1
        ns = sizes[seg]
        k = (rk * n_total + ns - 1) // ns
        norm = scores_[np.searchsorted(cum_, k, side="left")]
        return pa.table({
            "doc_id": pa.array(did),
            "source": pa.array(src.tolist(), pa.string()),
            "score": pa.array(val),
            "norm_score": pa.array(norm),
        })

    return partitioned_group_apply(ds, ["source"], normalize,
                                   num_partitions=8)


# --------------------------------------------------------------------------
# Customer-cohort lifetime revenue matrix
# --------------------------------------------------------------------------

@query(
    "orders_cohort_ltv",
    """
WITH f AS (
  SELECT o_custkey,
         MIN(CAST(strftime(o_orderdate, '%Y') AS BIGINT)) AS cohort_year
  FROM orders GROUP BY 1
)
SELECT f.cohort_year,
       CAST(strftime(o.o_orderdate, '%Y') AS BIGINT) - f.cohort_year
         AS year_offset,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT))
            AS BIGINT) AS revenue_cents
FROM orders o JOIN f ON o.o_custkey = f.o_custkey
GROUP BY 1, 2""",
)
def orders_cohort_ltv(sf_dir: str):
    """Cohort lifetime-value matrix: customers grouped by
    first-purchase year, revenue accrued at each year offset — the
    revenue companion of `events_cohort_retention` (does a 1996
    cohort keep spending in 1999?).

    Per-customer cohort year is ONE hash-partitioned min; the matrix
    is a native hash join of orders against that custkey-bounded
    table followed by a cohorts×offsets-bounded combine. Revenue is
    exact integer cents."""
    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate, grouped_aggregate_ds

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_orderdate",
                                      "o_totalprice"])

    def oyear(b: pa.Table) -> pa.Table:
        price = np.asarray(b["o_totalprice"].combine_chunks(),
                           dtype=np.float64)
        return pa.table({
            "o_custkey": b["o_custkey"],
            "year": pc.cast(pc.strftime(b["o_orderdate"], format="%Y"),
                            pa.int64()),
            "cents": pa.array(np.floor(price * 100 + 0.5).astype(np.int64)),
        })

    oy = orders.map_batches(oyear, batch_format="pyarrow",
                            batch_size=None)
    first = grouped_aggregate_ds(oy.select_columns(["o_custkey", "year"]),
                                 ["o_custkey"],
                                 [("year", "min", "cohort_year")],
                                 num_partitions=8)
    j = oy.join(first, join_type="inner", num_partitions=8,
                on=("o_custkey",))

    def cells(b: pa.Table) -> pa.Table:
        yr = np.asarray(b["year"].combine_chunks(), dtype=np.int64)
        cy = np.asarray(b["cohort_year"].combine_chunks(), dtype=np.int64)
        return pa.table({
            "cohort_year": pa.array(cy),
            "year_offset": pa.array(yr - cy),
            "cents": b["cents"],
        })

    return grouped_aggregate(
        j.map_batches(cells, batch_format="pyarrow", batch_size=None),
        ["cohort_year", "year_offset"],
        [("*", "count", "n_orders"), ("cents", "sum", "revenue_cents")])


# --------------------------------------------------------------------------
# Returns rate by part brand
# --------------------------------------------------------------------------

@query(
    "lineitem_returns_by_brand",
    """
SELECT p.p_brand,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_returned,
       (1000 * CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
                    AS BIGINT)) // CAST(COUNT(*) AS BIGINT)
         AS return_rate_milli
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY 1""",
)
def lineitem_returns_by_brand(sf_dir: str):
    """Return rate per part brand — the supplier-quality report that
    flags brands whose items come back. partkey→brand is the broadcast
    dimension (Q14 convention); the corpus pass emits brands-bounded
    (count, returned) partials; one permille division on the tiny
    aggregate."""
    import numpy as np
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate

    part = rd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_brand"]).to_pandas()
    pk = part["p_partkey"].to_numpy(dtype=np.int64)
    brands = np.empty(int(pk.max()) + 1 if len(pk) else 1, dtype=object)
    brands[pk] = part["p_brand"].to_numpy()
    ref = ray.put(brands) if ray.is_initialized() else brands

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_returnflag"])

    def partial(b: pa.Table) -> pa.Table:
        brands_ = ray.get(ref) if ray.is_initialized() else ref
        partk = np.asarray(b["l_partkey"].combine_chunks(), dtype=np.int64)
        ret = pc.cast(pc.equal(b["l_returnflag"].combine_chunks(),
                               pa.scalar("R")), pa.int64())
        return pa.table({
            "p_brand": pa.array(brands_[partk].tolist(), pa.string()),
            "ret": ret,
            "one": pa.array(np.ones(len(partk), dtype=np.int64)),
        })

    a = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        ["p_brand"], [("one", "sum", "n_items"),
                      ("ret", "sum", "n_returned")])
    n = np.asarray(a["n_items"], dtype=np.int64)
    r = np.asarray(a["n_returned"], dtype=np.int64)
    return pa.table({
        "p_brand": a["p_brand"],
        "n_items": a["n_items"],
        "n_returned": a["n_returned"],
        "return_rate_milli": pa.array(1000 * r // n, pa.int64()),
    })


# --------------------------------------------------------------------------
# Pairwise source Jensen-Shannon divergence matrix
# --------------------------------------------------------------------------

@query(
    "corpus_source_js_matrix",
    """
WITH words AS (SELECT source, unnest(string_split(text, ' ')) AS w
               FROM documents),
sw AS (SELECT source, w, COUNT(*) AS c FROM words GROUP BY 1, 2),
st AS (SELECT source, SUM(c) AS n FROM sw GROUP BY 1),
p AS (SELECT sw.source, sw.w, sw.c * 1.0 / st.n AS p
      FROM sw JOIN st USING (source)),
shared AS (
  SELECT a.source AS source_a, b.source AS source_b,
         SUM((a.p / 2) * ln(2 * a.p / (a.p + b.p))
             + (b.p / 2) * ln(2 * b.p / (a.p + b.p))) AS js_shared,
         SUM(a.p) AS mass_a, SUM(b.p) AS mass_b
  FROM p a JOIN p b ON a.w = b.w AND a.source < b.source
  GROUP BY 1, 2
),
allpairs AS (
  SELECT a.source AS source_a, b.source AS source_b
  FROM st a JOIN st b ON a.source < b.source
)
SELECT ap.source_a, ap.source_b,
       CAST(FLOOR(10000 * (COALESCE(s.js_shared, 0)
            + ((1 - COALESCE(s.mass_a, 0))
               + (1 - COALESCE(s.mass_b, 0))) / 2 * ln(2)))
            AS BIGINT) AS js_e4
FROM allpairs ap LEFT JOIN shared s USING (source_a, source_b)""",
)
def corpus_source_js_matrix(sf_dir: str):
    """Pairwise Jensen-Shannon divergence between every two sources'
    word distributions — the symmetric, bounded mixture-diagnostics
    matrix (`corpus_source_kl` measures each source against the global
    mix; this measures sources against EACH OTHER, the input to
    source-clustering / redundancy pruning decisions).

    Identity that makes it one exchange: JS(i,j) splits into shared-
    vocabulary terms plus ln2/2 × the one-sided probability masses, so
    the kernel never materializes per-pair union vocabularies. The
    (source, word) count table (vocab×sources-bounded) hash-partitions
    BY WORD; inside complete-word partitions each word's ≤sources probs
    expand to its pair contributions via one vectorized triangular
    outer product; the finish sums sources²/2 cells. The corpus
    streams once; nothing vocab-sized reaches the driver except the
    sources-bounded totals."""
    import numpy as np
    import ray
    import ray.data as rd

    from raylog.functions.agg import (grouped_aggregate,
                                      grouped_aggregate_ds,
                                      partitioned_group_apply)

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["source", "text"])

    def wcounts(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        split = pc.split_pattern(b["text"].combine_chunks(), " ")
        lens = np.asarray(pc.list_value_length(split), dtype=np.int64)
        flat = split.flatten().dictionary_encode()
        codes = np.asarray(flat.indices, dtype=np.int64)
        enc = b["source"].combine_chunks().dictionary_encode()
        src = np.asarray(enc.indices, dtype=np.int64)
        tok_src = np.repeat(src, lens)
        nv = len(flat.dictionary)
        packed = tok_src * nv + codes
        up, cnt = np.unique(packed, return_counts=True)
        return pa.table({
            "source": enc.dictionary.take(pa.array(up // nv)),
            "w": flat.dictionary.take(pa.array(up % nv)),
            "c": pa.array(cnt.astype(np.int64)),
        })

    sw = grouped_aggregate_ds(
        ds.map_batches(wcounts, batch_format="pyarrow", batch_size=None),
        ["source", "w"], [("c", "sum", "c")])
    st = grouped_aggregate(sw, ["source"], [("c", "sum", "n")])
    sources = np.asarray(st["source"]).astype("U")
    order = np.argsort(sources)
    sources = sources[order]
    totals = np.asarray(st["n"], dtype=np.float64)[order]
    ref = (ray.put((sources, totals)) if ray.is_initialized()
           else (sources, totals))

    def pair_terms(part: pa.Table) -> pa.Table:
        sources_, totals_ = ray.get(ref) if ray.is_initialized() else ref
        w = np.asarray(part["w"].combine_chunks()).astype("U")
        src = np.asarray(part["source"].combine_chunks()).astype("U")
        c = np.asarray(part["c"].combine_chunks(), dtype=np.float64)
        si = np.searchsorted(sources_, src)
        p = c / totals_[si]
        order = np.lexsort((si, w))
        w, si, p = w[order], si[order], p[order]
        brk = np.ones(len(w), dtype=bool)
        if len(w) > 1:
            brk[1:] = w[1:] != w[:-1]
        starts = np.flatnonzero(brk)
        ends = np.append(starts[1:], len(w))
        ns = len(sources_)
        js = np.zeros((ns, ns))
        mass = np.zeros((ns, ns))
        for s, e in zip(starts, ends):  # ≤sources probs per word
            ii, pp = si[s:e], p[s:e]
            if e - s < 2:
                continue
            pi = pp[:, None]
            pj = pp[None, :]
            m = pi + pj
            term = (pi / 2) * np.log(2 * pi / m) \
                + (pj / 2) * np.log(2 * pj / m)
            js[np.ix_(ii, ii)] += term
            mass[np.ix_(ii, ii)] += pi + 0 * pj
        iu, ju = np.triu_indices(ns, k=1)
        rows = pa.table({
            "ia": pa.array(iu.astype(np.int64)),
            "jb": pa.array(ju.astype(np.int64)),
            "js": pa.array(js[iu, ju]),
            "ma": pa.array(mass[iu, ju]),
            "mb": pa.array(mass[ju, iu]),
        })
        return rows

    cells = partitioned_group_apply(sw, ["w"], pair_terms,
                                    num_partitions=8)
    agg = grouped_aggregate(cells, ["ia", "jb"],
                            [("js", "sum", "js"), ("ma", "sum", "ma"),
                             ("mb", "sum", "mb")])
    if "ia" not in agg.column_names:  # fewer than two sources
        z = pa.array([], pa.int64())
        return pa.table({"source_a": pa.array([], pa.string()),
                         "source_b": pa.array([], pa.string()),
                         "js_e4": z})
    ia = np.asarray(agg["ia"], dtype=np.int64)
    jb = np.asarray(agg["jb"], dtype=np.int64)
    js = np.asarray(agg["js"], dtype=np.float64)
    ma = np.asarray(agg["ma"], dtype=np.float64)
    mb = np.asarray(agg["mb"], dtype=np.float64)
    val = np.floor(10000 * (js + ((1 - ma) + (1 - mb)) / 2
                            * np.log(2))).astype(np.int64)
    return pa.table({
        "source_a": pa.array(sources[ia].tolist(), pa.string()),
        "source_b": pa.array(sources[jb].tolist(), pa.string()),
        "js_e4": pa.array(val),
    })


# --------------------------------------------------------------------------
# Basket-size (lineitems per order) distribution
# --------------------------------------------------------------------------

@query(
    "lineitem_basket_hist",
    """
WITH b AS (SELECT l_orderkey, COUNT(*) AS n_items
           FROM lineitem GROUP BY 1)
SELECT CAST(n_items AS BIGINT) AS n_items,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM b GROUP BY 1""",
)
def lineitem_basket_hist(sf_dir: str):
    """Basket-size distribution: lineitems per order, histogrammed —
    the order-complexity profile (sibling of the Q13 customer
    distribution, one level down the hierarchy). One hash-partitioned
    per-order count, one tiny histogram combine."""
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate, grouped_aggregate_ds

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey"])
    per = grouped_aggregate_ds(li, ["l_orderkey"],
                               [("l_orderkey", "count", "n_items")],
                               num_partitions=8)
    return grouped_aggregate(per, ["n_items"],
                             [("*", "count", "n_orders")])


# --------------------------------------------------------------------------
# Last-touch attribution (7-day lookback before each purchase)
# --------------------------------------------------------------------------

@query(
    "events_last_touch",
    """
WITH p AS (
  SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'
), credit AS (
  SELECT p.event_id,
         (SELECT e.event_type FROM events e
          WHERE e.user_id = p.user_id
            AND e.event_type <> 'purchase'
            AND e.ts <= p.ts
            AND e.ts >= p.ts - INTERVAL 7 DAY
          ORDER BY e.ts DESC, e.event_id DESC LIMIT 1) AS channel
  FROM p
), a AS (
  SELECT COALESCE(channel, '(none)') AS channel,
         COUNT(*) AS n_purchases
  FROM credit GROUP BY 1
), t AS (SELECT SUM(n_purchases) AS tot FROM a)
SELECT a.channel, CAST(a.n_purchases AS BIGINT) AS n_purchases,
       (1000 * CAST(a.n_purchases AS BIGINT)) // CAST(t.tot AS BIGINT)
         AS share_milli
FROM a CROSS JOIN t""",
)
def events_last_touch(sf_dir: str):
    """Last-touch attribution: each purchase credits the user's most
    recent non-purchase event within the 7 days before it (ties by
    event_id) — the marketing-channel report; purchases with no
    qualifying touch fall in '(none)'.

    Per complete-user partition, one sort of the user's events and one
    searchsorted from each purchase into the user's non-purchase
    timeline resolves every credit vectorized — no per-purchase
    subquery, no events×events join; the finish is types-bounded."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate, partitioned_group_apply

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id",
                                  "event_type"])
    WINDOW_US = 7 * 86_400_000_000

    def credits(part: pa.Table) -> pa.Table:
        uid = np.asarray(part["user_id"].combine_chunks(), dtype=np.int64)
        ts = np.asarray(part["ts"].combine_chunks()).astype(
            "datetime64[us]").astype(np.int64)
        eid = np.asarray(part["event_id"].combine_chunks(), dtype=np.int64)
        et = np.asarray(part["event_type"].combine_chunks()).astype("U")
        # one timeline sort: (user, ts, non-purchase-first, event_id) —
        # at equal ts the SQL's `e.ts <= p.ts` still admits the touch,
        # so non-purchases must order BEFORE the purchase they credit;
        # ascending event_id puts the SQL's DESC-limit pick last
        isp0 = (np.asarray(part["event_type"].combine_chunks())
                .astype("U") == "purchase")
        order = np.lexsort((eid, isp0, ts, uid))
        uid, ts, eid, et = uid[order], ts[order], eid[order], et[order]
        isp = et == "purchase"
        # non-purchase timeline per user, positions in the sorted stream
        np_idx = np.flatnonzero(~isp)
        p_idx = np.flatnonzero(isp)
        if len(p_idx) == 0:
            return pa.table({"channel": pa.array([], pa.string()),
                             "one": pa.array([], pa.int64())})
        # for each purchase: the latest non-purchase with position <
        # its own position+1 AND same user AND ts within the window.
        # positions are timeline-ordered, so searchsorted on np_idx
        # finds the latest candidate; user/window checks finish it.
        cand = np.searchsorted(np_idx, p_idx) - 1
        channel = np.full(len(p_idx), "(none)", dtype=object)
        valid = cand >= 0
        ci = np_idx[np.clip(cand, 0, None)]
        ok = (valid & (uid[ci] == uid[p_idx])
              & (ts[ci] >= ts[p_idx] - WINDOW_US))
        channel[ok] = et[ci[ok]]
        # a candidate from an earlier user's block fails the uid check
        return pa.table({
            "channel": pa.array(channel.tolist(), pa.string()),
            "one": pa.array(np.ones(len(p_idx), dtype=np.int64)),
        })

    c = partitioned_group_apply(ds, ["user_id"], credits,
                                num_partitions=8)
    a = grouped_aggregate(c, ["channel"], [("one", "sum", "n_purchases")])
    if "n_purchases" not in a.column_names:  # no purchases at all
        z = pa.array([], pa.int64())
        return pa.table({"channel": pa.array([], pa.string()),
                         "n_purchases": z, "share_milli": z})
    n = np.asarray(a["n_purchases"], dtype=np.int64)
    tot = int(n.sum())
    return pa.table({
        "channel": a["channel"],
        "n_purchases": a["n_purchases"],
        "share_milli": pa.array(1000 * n // tot, pa.int64()),
    })


# --------------------------------------------------------------------------
# Embedding-space label-noise audit (top-1 neighbor label agreement)
# --------------------------------------------------------------------------

@query(
    "embed_nn_label_agreement",
    """
WITH e AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
                  embedding::DOUBLE[] AS v FROM embeddings),
nn AS (
  SELECT a.vec_id, a.label,
         b.label AS nb_label,
         ROW_NUMBER() OVER (PARTITION BY a.vec_id
                            ORDER BY list_cosine_similarity(a.v, b.v)
                                     DESC, b.vec_id) AS rn
  FROM e a JOIN e b ON a.vec_id <> b.vec_id
)
SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
       CAST(SUM(CASE WHEN nb_label = label THEN 1 ELSE 0 END) AS BIGINT)
         AS n_agree,
       (1000 * CAST(SUM(CASE WHEN nb_label = label THEN 1 ELSE 0 END)
                    AS BIGINT)) // CAST(COUNT(*) AS BIGINT)
         AS agree_milli
FROM nn WHERE rn = 1 GROUP BY label""",
)
def embed_nn_label_agreement(sf_dir: str):
    """Embedding-space label-noise audit: for each vector, does its
    single nearest neighbor carry the SAME label? Per-label agreement
    permille — low agreement means the label is not linearly separable
    in this embedding (mislabeled data or a collapsed encoder), the
    go/no-go check before trusting labels as dedup buckets or
    classifier targets.

    Same streamed broadcast-matmul top-1 as `dedup_reciprocal_nn`
    (ties to the smallest neighbor id, matching the SQL); the finish
    is a labels-bounded aggregate. Exact path only — the ≤100k corpus
    broadcast bound and the at-scale alternative are documented on
    that query."""
    import numpy as np
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate
    from raylog.functions.similarity import _to_matrix

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "label", "embedding"])
    corpus = pa.concat_tables(
        list(ds.iter_batches(batch_format="pyarrow", batch_size=None)))
    ids = corpus["vec_id"].to_numpy()
    labels = np.asarray(corpus["label"], dtype=np.int64)
    mat = _to_matrix(corpus, "embedding")
    ref = (ray.put((ids, labels, mat)) if ray.is_initialized()
           else (ids, labels, mat))

    def agree(batch: pa.Table) -> pa.Table:
        cids, clab, cmat = ray.get(ref) if ray.is_initialized() else ref
        bids = np.asarray(batch["vec_id"].combine_chunks(),
                          dtype=np.int64)
        blab = np.asarray(batch["label"].combine_chunks(), dtype=np.int64)
        bmat = _to_matrix(batch, "embedding")
        sims = bmat @ cmat.T
        sims[np.equal.outer(bids, cids)] = -np.inf
        best = sims.max(axis=1)
        order = np.argsort(cids, kind="mergesort")
        ss = sims[:, order]
        nb = order[np.argmax(ss == best[:, None], axis=1)]
        return pa.table({
            "label": pa.array(blab),
            "agree": pa.array((clab[nb] == blab).astype(np.int64)),
            "one": pa.array(np.ones(len(bids), dtype=np.int64)),
        })

    a = grouped_aggregate(
        ds.map_batches(agree, batch_format="pyarrow", batch_size=None),
        ["label"], [("one", "sum", "n_vecs"), ("agree", "sum", "n_agree")])
    n = np.asarray(a["n_vecs"], dtype=np.int64)
    g = np.asarray(a["n_agree"], dtype=np.int64)
    return pa.table({
        "label": a["label"],
        "n_vecs": a["n_vecs"],
        "n_agree": a["n_agree"],
        "agree_milli": pa.array(1000 * g // n, pa.int64()),
    })


# --------------------------------------------------------------------------
# TPC-H Q4 shape: orders with late lineitems, per priority
# --------------------------------------------------------------------------

@query(
    "orders_q4_lateness",
    """
WITH late AS (
  SELECT DISTINCT l.l_orderkey
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
), a AS (
  SELECT o.o_orderpriority,
         COUNT(*) AS n_orders,
         SUM(CASE WHEN late.l_orderkey IS NOT NULL THEN 1 ELSE 0 END)
           AS n_late
  FROM orders o LEFT JOIN late ON o.o_orderkey = late.l_orderkey
  GROUP BY 1
)
SELECT o_orderpriority, CAST(n_orders AS BIGINT) AS n_orders,
       CAST(n_late AS BIGINT) AS n_late,
       (1000 * CAST(n_late AS BIGINT)) // CAST(n_orders AS BIGINT)
         AS late_rate_milli
FROM a""",
)
def orders_q4_lateness(sf_dir: str):
    """Late-order rate per priority (TPC-H Q4 shape — an EXISTS
    semi-join aggregate): an order is late when ANY of its lineitems
    shipped more than 60 days after the order date.

    The lineitem fact compresses to per-orderkey MAX(ship-day) — the
    EXISTS collapses to one comparison per order — before the single
    hash join against orders; the finish is priorities-bounded. No
    DISTINCT materialization, no row-level semi-join."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate, grouped_aggregate_ds

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_shipdate"])

    def lday(b: pa.Table) -> pa.Table:
        t = np.asarray(b["l_shipdate"].combine_chunks()).astype(
            "datetime64[D]").astype(np.int64)
        return pa.table({
            "l_orderkey": b["l_orderkey"],
            "ship_day": pa.array(t),
        })

    mx = grouped_aggregate_ds(
        li.map_batches(lday, batch_format="pyarrow", batch_size=None),
        ["l_orderkey"], [("ship_day", "max", "max_ship")],
        num_partitions=8)
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderdate",
                                      "o_orderpriority"])

    def oday(b: pa.Table) -> pa.Table:
        t = np.asarray(b["o_orderdate"].combine_chunks()).astype(
            "datetime64[D]").astype(np.int64)
        return pa.table({
            "o_orderkey": b["o_orderkey"],
            "o_orderpriority": b["o_orderpriority"],
            "order_day": pa.array(t),
        })

    od = orders.map_batches(oday, batch_format="pyarrow", batch_size=None)
    j = od.join(mx, join_type="left_outer", num_partitions=8,
                on=("o_orderkey",), right_on=("l_orderkey",))

    def flags(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ms = pc.fill_null(pc.cast(b["max_ship"], pa.int64()),
                          -(10**9))
        late = (np.asarray(ms, dtype=np.int64)
                > np.asarray(b["order_day"].combine_chunks(),
                             dtype=np.int64) + 60)
        return pa.table({
            "o_orderpriority": b["o_orderpriority"],
            "late": pa.array(late.astype(np.int64)),
            "one": pa.array(np.ones(len(late), dtype=np.int64)),
        })

    a = grouped_aggregate(
        j.map_batches(flags, batch_format="pyarrow", batch_size=None),
        ["o_orderpriority"], [("one", "sum", "n_orders"),
                              ("late", "sum", "n_late")])
    n = np.asarray(a["n_orders"], dtype=np.int64)
    l = np.asarray(a["n_late"], dtype=np.int64)
    return pa.table({
        "o_orderpriority": a["o_orderpriority"],
        "n_orders": a["n_orders"],
        "n_late": a["n_late"],
        "late_rate_milli": pa.array(1000 * l // n, pa.int64()),
    })


# --------------------------------------------------------------------------
# Hapax legomena rate per source
# --------------------------------------------------------------------------

@query(
    "docs_hapax_rate",
    """
WITH words AS (SELECT source, unnest(string_split(text, ' ')) AS w
               FROM documents),
sw AS (SELECT source, w, COUNT(*) AS c FROM words GROUP BY 1, 2)
SELECT source,
       CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
       CAST(COUNT(*) AS BIGINT) AS n_types,
       (1000 * CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT))
         // CAST(COUNT(*) AS BIGINT) AS hapax_milli
FROM sw GROUP BY 1""",
)
def docs_hapax_rate(sf_dir: str):
    """Hapax legomena rate per source: the fraction of word types that
    occur exactly once — abnormally HIGH hapax rates flag OCR noise /
    mojibake (every garble is unique), abnormally LOW ones flag
    template mills. Rides the same (source, word) hash-partitioned
    count as the KL/TTR audits; the finish marks c==1 rows in one
    vectorized pass over the vocab-bounded table."""
    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate, grouped_aggregate_ds

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["source", "text"])

    def wcounts(b: pa.Table) -> pa.Table:
        split = pc.split_pattern(b["text"].combine_chunks(), " ")
        lens = np.asarray(pc.list_value_length(split), dtype=np.int64)
        flat = split.flatten().dictionary_encode()
        codes = np.asarray(flat.indices, dtype=np.int64)
        enc = b["source"].combine_chunks().dictionary_encode()
        src = np.asarray(enc.indices, dtype=np.int64)
        tok_src = np.repeat(src, lens)
        nv = len(flat.dictionary)
        packed = tok_src * nv + codes
        up, cnt = np.unique(packed, return_counts=True)
        return pa.table({
            "source": enc.dictionary.take(pa.array(up // nv)),
            "w": flat.dictionary.take(pa.array(up % nv)),
            "c": pa.array(cnt.astype(np.int64)),
        })

    sw = grouped_aggregate_ds(
        ds.map_batches(wcounts, batch_format="pyarrow", batch_size=None),
        ["source", "w"], [("c", "sum", "c")])

    def mark(b: pa.Table) -> pa.Table:
        c = np.asarray(b["c"].combine_chunks(), dtype=np.int64)
        return pa.table({
            "source": b["source"],
            "hap": pa.array((c == 1).astype(np.int64)),
            "one": pa.array(np.ones(len(c), dtype=np.int64)),
        })

    a = grouped_aggregate(
        sw.map_batches(mark, batch_format="pyarrow", batch_size=None),
        ["source"], [("hap", "sum", "n_hapax"), ("one", "sum", "n_types")])
    h = np.asarray(a["n_hapax"], dtype=np.int64)
    t = np.asarray(a["n_types"], dtype=np.int64)
    return pa.table({
        "source": a["source"],
        "n_hapax": a["n_hapax"],
        "n_types": a["n_types"],
        "hapax_milli": pa.array(1000 * h // t, pa.int64()),
    })


# --------------------------------------------------------------------------
# DAU / trailing-WAU stickiness ratio
# --------------------------------------------------------------------------

@query(
    "events_dau_wau_stickiness",
    """
WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
dau AS (SELECT day, COUNT(*) AS dau FROM ud GROUP BY 1),
days AS (SELECT DISTINCT day FROM ud),
wau AS (
  SELECT days.day, COUNT(DISTINCT ud.user_id) AS wau
  FROM days JOIN ud ON ud.day BETWEEN days.day - 6 AND days.day
  GROUP BY 1
)
SELECT strftime(dau.day, '%Y-%m-%d') AS day,
       CAST(dau.dau AS BIGINT) AS dau, CAST(wau.wau AS BIGINT) AS wau,
       (1000 * CAST(dau.dau AS BIGINT)) // CAST(wau.wau AS BIGINT)
         AS stickiness_milli
FROM dau JOIN wau ON dau.day = wau.day""",
)
def events_dau_wau_stickiness(sf_dir: str):
    """DAU / trailing-7-day-WAU stickiness per day — the growth KPI
    (how much of the weekly audience shows up daily). DAU and WAU both
    derive from ONE distinct (user, day) aggregate: DAU is its per-day
    count; WAU rides the interval-coverage kernel from
    `events_trailing_actives` (each active day covers its ≤7
    window-days inside the complete-user partition — no 7× self-join);
    the permille ratio joins two days-bounded tables driver-side."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import (grouped_aggregate,
                                      grouped_aggregate_ds,
                                      partitioned_group_apply)

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])

    def days(b: pa.Table) -> pa.Table:
        t = np.asarray(b["ts"].combine_chunks()).astype(
            "datetime64[us]").astype(np.int64)
        return pa.table({
            "user_id": b["user_id"],
            "day": pa.array(t // 86_400_000_000),
        })

    ud = grouped_aggregate_ds(
        ds.map_batches(days, batch_format="pyarrow", batch_size=None),
        ["user_id", "day"], [("*", "count", "c")], num_partitions=8)

    dau_t = grouped_aggregate(ud, ["day"], [("*", "count", "dau")])

    def coverage(part: pa.Table) -> pa.Table:
        uid = np.asarray(part["user_id"].combine_chunks(), dtype=np.int64)
        day = np.asarray(part["day"].combine_chunks(), dtype=np.int64)
        cov_day = (day[:, None] + np.arange(7, dtype=np.int64)).ravel()
        cov_uid = np.repeat(uid, 7)
        packed = np.unique(cov_uid * (1 << 24) + cov_day)
        return pa.table({
            "day": pa.array(packed & ((1 << 24) - 1)),
            "n": pa.array(np.ones(len(packed), dtype=np.int64)),
        })

    cov = partitioned_group_apply(ud, ["user_id"], coverage,
                                  num_partitions=8)
    wau_t = grouped_aggregate(cov, ["day"], [("n", "sum", "wau")])
    dau = dict(zip(np.asarray(dau_t["day"], dtype=np.int64).tolist(),
                   np.asarray(dau_t["dau"], dtype=np.int64).tolist()))
    wau = dict(zip(np.asarray(wau_t["day"], dtype=np.int64).tolist(),
                   np.asarray(wau_t["wau"], dtype=np.int64).tolist()))
    obs = sorted(dau)
    day_str = np.array(obs, dtype=np.int64).astype(
        "datetime64[D]").astype(str)
    return pa.table({
        "day": pa.array(day_str.tolist(), pa.string()),
        "dau": pa.array([dau[d] for d in obs], pa.int64()),
        "wau": pa.array([wau[d] for d in obs], pa.int64()),
        "stickiness_milli": pa.array(
            [1000 * dau[d] // wau[d] for d in obs], pa.int64()),
    })


# --------------------------------------------------------------------------
# Cumulative revenue curve by month
# --------------------------------------------------------------------------

@query(
    "orders_revenue_cumulative",
    """
WITH m AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS month,
         SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
           AS revenue_cents
  FROM orders GROUP BY 1
)
SELECT month, CAST(revenue_cents AS BIGINT) AS revenue_cents,
       CAST(SUM(revenue_cents) OVER (ORDER BY month) AS BIGINT)
         AS cum_cents
FROM m""",
)
def orders_revenue_cumulative(sf_dir: str):
    """Monthly revenue plus the running (cumulative) total — the
    revenue-to-date curve. One months-bounded integer-cents aggregate;
    the window cumsum runs driver-side on the tiny sorted series
    (exact: integer addition in month order on both engines)."""
    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderdate", "o_totalprice"])

    def partial(b: pa.Table) -> pa.Table:
        price = np.asarray(b["o_totalprice"].combine_chunks(),
                           dtype=np.float64)
        return pa.table({
            "month": pc.strftime(b["o_orderdate"], format="%Y-%m"),
            "cents": pa.array(np.floor(price * 100 + 0.5).astype(np.int64)),
        })

    m = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        ["month"], [("cents", "sum", "revenue_cents")])
    mo = np.asarray(m["month"]).astype("U")
    rev = np.asarray(m["revenue_cents"], dtype=np.int64)
    order = np.argsort(mo)
    mo, rev = mo[order], rev[order]
    return pa.table({
        "month": pa.array(mo.tolist(), pa.string()),
        "revenue_cents": pa.array(rev),
        "cum_cents": pa.array(np.cumsum(rev)),
    })


# --------------------------------------------------------------------------
# Crawl-stationarity audit: JS(first half, second half) per source
# --------------------------------------------------------------------------

@query(
    "corpus_source_halves_js",
    """
WITH med AS (SELECT source, quantile_disc(doc_id, 0.5) AS m
             FROM documents GROUP BY 1),
words AS (
  SELECT d.source,
         CASE WHEN d.doc_id <= med.m THEN 0 ELSE 1 END AS half,
         unnest(string_split(d.text, ' ')) AS w
  FROM documents d JOIN med USING (source)
),
sw AS (SELECT source, half, w, COUNT(*) AS c FROM words GROUP BY 1, 2, 3),
st AS (SELECT source, half, SUM(c) AS n FROM sw GROUP BY 1, 2),
p AS (SELECT sw.source, sw.half, sw.w, sw.c * 1.0 / st.n AS p
      FROM sw JOIN st USING (source, half)),
shared AS (
  SELECT a.source,
         SUM((a.p / 2) * ln(2 * a.p / (a.p + b.p))
             + (b.p / 2) * ln(2 * b.p / (a.p + b.p))) AS js_shared,
         SUM(a.p) AS mass_a, SUM(b.p) AS mass_b
  FROM p a JOIN p b ON a.w = b.w AND a.source = b.source
       AND a.half = 0 AND b.half = 1
  GROUP BY 1
),
srcs AS (SELECT DISTINCT source FROM documents)
SELECT srcs.source,
       CAST(FLOOR(10000 * (COALESCE(s.js_shared, 0)
            + ((1 - COALESCE(s.mass_a, 0))
               + (1 - COALESCE(s.mass_b, 0))) / 2 * ln(2)))
            AS BIGINT) AS js_e4
FROM srcs LEFT JOIN shared s USING (source)""",
)
def corpus_source_halves_js(sf_dir: str):
    """Crawl-stationarity audit: Jensen-Shannon divergence between each
    source's FIRST-half and SECOND-half word distributions (halves by
    each source's OWN exact doc_id median — crawl order within the
    source). A drifting source (topic shift, template change, encoding
    break mid-crawl) shows a high half-vs-half JS while stationary
    sources sit near zero — the per-source temporal complement of
    `corpus_source_js_matrix`.

    Same one-exchange identity as the pair matrix: shared-vocab terms
    plus ln2/2 × one-sided masses. One (source, half, word)
    hash-partitioned count; complete-(source,word) partitions emit the
    per-source partial terms; sources-bounded finish. Per-source
    medians come from the distributed quantile kernel (hash-
    partitioned histogram, complete-source finish) and broadcast as a
    sources-bounded dict — the driver never holds the doc_id table."""
    import numpy as np
    import ray
    import ray.data as rd

    from raylog.functions.agg import (grouped_aggregate,
                                      grouped_aggregate_ds,
                                      partitioned_group_apply)
    from raylog.functions.quantile import grouped_quantiles

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "source", "text"])

    q = grouped_quantiles(ds.select_columns(["source", "doc_id"]),
                          key="source", value="doc_id", ps=[0.5],
                          out_names=["m"], num_partitions=8)
    med = {r.source: int(r.m) for r in q.to_pandas().itertuples()}

    def wcounts(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        split = pc.split_pattern(b["text"].combine_chunks(), " ")
        lens = np.asarray(pc.list_value_length(split), dtype=np.int64)
        flat = split.flatten().dictionary_encode()
        codes = np.asarray(flat.indices, dtype=np.int64)
        enc = b["source"].combine_chunks().dictionary_encode()
        src = np.asarray(enc.indices, dtype=np.int64)
        msrc = np.array([med[s] for s in enc.dictionary.to_pylist()],
                        dtype=np.int64)[src]
        half = (np.asarray(b["doc_id"].combine_chunks(),
                           dtype=np.int64) > msrc).astype(np.int64)
        tok_key = np.repeat(src * 2 + half, lens)
        nv = len(flat.dictionary)
        packed = tok_key * nv + codes
        up, cnt = np.unique(packed, return_counts=True)
        key = up // nv
        return pa.table({
            "source": enc.dictionary.take(pa.array(key // 2)),
            "half": pa.array(key % 2),
            "w": flat.dictionary.take(pa.array(up % nv)),
            "c": pa.array(cnt.astype(np.int64)),
        })

    sw = grouped_aggregate_ds(
        ds.map_batches(wcounts, batch_format="pyarrow", batch_size=None),
        ["source", "half", "w"], [("c", "sum", "c")])
    st = grouped_aggregate(sw, ["source", "half"], [("c", "sum", "n")])
    stp = st.to_pandas()
    totals = {(r.source, int(r.half)): float(r.n)
              for r in stp.itertuples()}
    sources = sorted({r.source for r in stp.itertuples()})
    ref = ray.put(totals) if ray.is_initialized() else totals

    def terms(part: pa.Table) -> pa.Table:
        totals_ = ray.get(ref) if ray.is_initialized() else ref
        src = np.asarray(part["source"].combine_chunks()).astype("U")
        half = np.asarray(part["half"].combine_chunks(), dtype=np.int64)
        w = np.asarray(part["w"].combine_chunks()).astype("U")
        c = np.asarray(part["c"].combine_chunks(), dtype=np.float64)
        n = np.array([totals_[(s, int(hh))]
                      for s, hh in zip(src, half)])
        p = c / n
        # pair up the two halves of each (source, word): sort and scan
        order = np.lexsort((half, w, src))
        src, half, w, p = src[order], half[order], w[order], p[order]
        both = np.zeros(len(src), dtype=bool)
        if len(src) > 1:
            nxt = (src[:-1] == src[1:]) & (w[:-1] == w[1:])
            both[:-1] = nxt
        i = np.flatnonzero(both)          # half-0 rows with a half-1 twin
        pi, pj = p[i], p[i + 1]
        m = pi + pj
        js = (pi / 2) * np.log(2 * pi / m) + (pj / 2) * np.log(2 * pj / m)
        out_src, out_js, out_ma, out_mb = [], [], [], []
        # per-source partial sums within the partition (few sources)
        for s in np.unique(src):
            sel = src[i] == s
            out_src.append(s)
            out_js.append(js[sel].sum())
            out_ma.append(pi[sel].sum())
            out_mb.append(pj[sel].sum())
        return pa.table({
            "source": pa.array(out_src, pa.string()),
            "js": pa.array(out_js, pa.float64()),
            "ma": pa.array(out_ma, pa.float64()),
            "mb": pa.array(out_mb, pa.float64()),
        })

    cells = partitioned_group_apply(sw, ["source", "w"], terms,
                                    num_partitions=8)
    agg = grouped_aggregate(cells, ["source"],
                            [("js", "sum", "js"), ("ma", "sum", "ma"),
                             ("mb", "sum", "mb")])
    got = {r.source: (r.js, r.ma, r.mb)
           for r in agg.to_pandas().itertuples()}
    vals = []
    for s in sources:
        js, ma, mb = got.get(s, (0.0, 0.0, 0.0))
        vals.append(int(np.floor(10000 * (js + ((1 - ma) + (1 - mb)) / 2
                                          * np.log(2)))))
    return pa.table({
        "source": pa.array(sources, pa.string()),
        "js_e4": pa.array(vals, pa.int64()),
    })


# --------------------------------------------------------------------------
# Exact mode (most frequent value) per group
# --------------------------------------------------------------------------

@query(
    "lineitem_quantity_mode",
    """
WITH c AS (
  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS qty,
         COUNT(*) AS n
  FROM lineitem GROUP BY 1, 2
), rk AS (
  SELECT l_returnflag, qty, n,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag
                            ORDER BY n DESC, qty) AS rn
  FROM c
)
SELECT l_returnflag, CAST(qty AS BIGINT) AS mode_qty,
       CAST(n AS BIGINT) AS mode_count
FROM rk WHERE rn = 1""",
)
def lineitem_quantity_mode(sf_dir: str):
    """Exact MODE per group: the most frequent order quantity per
    return flag (ties to the smallest value — deterministic on both
    engines). The distributed mode is the (group, value) count
    aggregate — bounded by flags × distinct quantities — followed by
    one argmax scan per group on the tiny table; no sort of the fact
    stream."""
    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_returnflag", "l_quantity"])

    def cells(b: pa.Table) -> pa.Table:
        return pa.table({
            "l_returnflag": b["l_returnflag"],
            "qty": pc.cast(b["l_quantity"], pa.int64()),
        })

    c = grouped_aggregate(
        ds.map_batches(cells, batch_format="pyarrow", batch_size=None),
        ["l_returnflag", "qty"], [("*", "count", "n")])
    flag = np.asarray(c["l_returnflag"]).astype("U")
    qty = np.asarray(c["qty"], dtype=np.int64)
    n = np.asarray(c["n"], dtype=np.int64)
    # argmax per flag with (count desc, qty asc) tie rule
    order = np.lexsort((qty, -n, flag))
    flag, qty, n = flag[order], qty[order], n[order]
    first = np.ones(len(flag), dtype=bool)
    if len(flag) > 1:
        first[1:] = flag[1:] != flag[:-1]
    return pa.table({
        "l_returnflag": pa.array(flag[first].tolist(), pa.string()),
        "mode_qty": pa.array(qty[first]),
        "mode_count": pa.array(n[first]),
    })


# --------------------------------------------------------------------------
# New-vs-returning daily user mix
# --------------------------------------------------------------------------

@query(
    "events_new_vs_returning",
    """
WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
f AS (SELECT user_id, MIN(day) AS first_day FROM ud GROUP BY 1)
SELECT strftime(ud.day, '%Y-%m-%d') AS day,
       CAST(SUM(CASE WHEN ud.day = f.first_day THEN 1 ELSE 0 END)
            AS BIGINT) AS n_new,
       CAST(SUM(CASE WHEN ud.day > f.first_day THEN 1 ELSE 0 END)
            AS BIGINT) AS n_returning
FROM ud JOIN f USING (user_id)
GROUP BY 1""",
)
def events_new_vs_returning(sf_dir: str):
    """New-vs-returning daily active mix: each day's actives split into
    first-ever-seen users and returners — the acquisition-vs-retention
    read of the DAU curve.

    One distinct (user, day) aggregate; each complete-user partition
    knows the user's min day locally, so the new/returning flag needs
    NO join — a segmented min per user inside the partition classifies
    every row; the finish is days-bounded."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import (grouped_aggregate,
                                      grouped_aggregate_ds,
                                      partitioned_group_apply)

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])

    def days(b: pa.Table) -> pa.Table:
        t = np.asarray(b["ts"].combine_chunks()).astype(
            "datetime64[us]").astype(np.int64)
        return pa.table({
            "user_id": b["user_id"],
            "day": pa.array(t // 86_400_000_000),
        })

    ud = grouped_aggregate_ds(
        ds.map_batches(days, batch_format="pyarrow", batch_size=None),
        ["user_id", "day"], [("*", "count", "c")], num_partitions=8)

    def classify(part: pa.Table) -> pa.Table:
        uid = np.asarray(part["user_id"].combine_chunks(), dtype=np.int64)
        day = np.asarray(part["day"].combine_chunks(), dtype=np.int64)
        order = np.lexsort((day, uid))
        uid, day = uid[order], day[order]
        brk = np.ones(len(uid), dtype=bool)
        if len(uid) > 1:
            brk[1:] = uid[1:] != uid[:-1]
        seg_start = np.flatnonzero(brk)
        seg = np.cumsum(brk) - 1
        is_new = np.zeros(len(uid), dtype=np.int64)
        is_new[seg_start] = 1  # sorted: first row per user = min day
        return pa.table({
            "day": pa.array(day),
            "new": pa.array(is_new),
            "ret": pa.array(1 - is_new),
        })

    c = partitioned_group_apply(ud, ["user_id"], classify,
                                num_partitions=8)
    a = grouped_aggregate(c, ["day"], [("new", "sum", "n_new"),
                                       ("ret", "sum", "n_returning")])
    d = np.asarray(a["day"], dtype=np.int64)
    order = np.argsort(d)
    day_str = d[order].astype("datetime64[D]").astype(str)
    return pa.table({
        "day": pa.array(day_str.tolist(), pa.string()),
        "n_new": pa.array(np.asarray(a["n_new"], dtype=np.int64)[order]),
        "n_returning": pa.array(
            np.asarray(a["n_returning"], dtype=np.int64)[order]),
    })


# --------------------------------------------------------------------------
# Per-source character-class composition profile
# --------------------------------------------------------------------------

@query(
    "docs_char_class_profile",
    """
WITH m AS (
  SELECT source, CAST(length(text) AS BIGINT) AS total,
         CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT)
           AS digits,
         CAST(length(regexp_replace(text, '[^A-Z]', '', 'g')) AS BIGINT)
           AS uppers,
         CAST(length(regexp_replace(text, '[^ ]', '', 'g')) AS BIGINT)
           AS spaces
  FROM documents
), s AS (
  SELECT source, SUM(total) AS total, SUM(digits) AS digits,
         SUM(uppers) AS uppers, SUM(spaces) AS spaces
  FROM m GROUP BY 1
)
SELECT source, CAST(total AS BIGINT) AS n_chars,
       (10000 * CAST(digits AS BIGINT)) // CAST(total AS BIGINT)
         AS digit_e4,
       (10000 * CAST(uppers AS BIGINT)) // CAST(total AS BIGINT)
         AS upper_e4,
       (10000 * CAST(spaces AS BIGINT)) // CAST(total AS BIGINT)
         AS space_e4
FROM s""",
)
def docs_char_class_profile(sf_dir: str):
    """Character-class composition per source: digit / uppercase /
    whitespace shares in 1e-4 units — the cheap structural screen that
    separates prose (low digit, moderate space) from tables, code
    dumps and shouting spam before any tokenization runs.

    Class counts are one segmented bincount over the flat UTF-8
    buffer per batch (the `char_entropy` kernel shape — zero per-row
    Python, zero regex at runtime; the oracle's regexp_replace chain
    restates the same classes); partials are sources-bounded."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["source", "text"])

    def classes(b: pa.Table) -> pa.Table:
        txt = b["text"].combine_chunks()
        # flat byte buffer + per-doc offsets (ASCII fixture; multi-byte
        # UTF-8 would need codepoint classes — documented bound)
        buf = np.frombuffer(txt.buffers()[2] or b"", dtype=np.uint8)
        offs = np.frombuffer(txt.buffers()[1], dtype=np.int32)[
            txt.offset:txt.offset + len(txt) + 1]
        doc = np.repeat(np.arange(len(txt), dtype=np.int64),
                        np.diff(offs))
        seg = buf[offs[0]:offs[-1]]
        is_digit = (seg >= 48) & (seg <= 57)
        is_upper = (seg >= 65) & (seg <= 90)
        is_space = seg == 32
        n = len(txt)
        return pa.table({
            "source": b["source"],
            "total": pa.array(np.diff(offs).astype(np.int64)),
            "digits": pa.array(np.bincount(doc, weights=is_digit,
                                           minlength=n).astype(np.int64)),
            "uppers": pa.array(np.bincount(doc, weights=is_upper,
                                           minlength=n).astype(np.int64)),
            "spaces": pa.array(np.bincount(doc, weights=is_space,
                                           minlength=n).astype(np.int64)),
        })

    s = grouped_aggregate(
        ds.map_batches(classes, batch_format="pyarrow", batch_size=None),
        ["source"], [("total", "sum", "n_chars"),
                     ("digits", "sum", "d"), ("uppers", "sum", "u"),
                     ("spaces", "sum", "sp")])
    t = np.asarray(s["n_chars"], dtype=np.int64)
    return pa.table({
        "source": s["source"],
        "n_chars": s["n_chars"],
        "digit_e4": pa.array(
            10000 * np.asarray(s["d"], dtype=np.int64) // t, pa.int64()),
        "upper_e4": pa.array(
            10000 * np.asarray(s["u"], dtype=np.int64) // t, pa.int64()),
        "space_e4": pa.array(
            10000 * np.asarray(s["sp"], dtype=np.int64) // t, pa.int64()),
    })


# --------------------------------------------------------------------------
# Max same-token run length per sequence → histogram
# --------------------------------------------------------------------------

@query(
    "tokens_max_run_hist",
    None,  # composed below with the recs2 prefix
)
def tokens_max_run_hist(sf_dir: str):
    """Histogram of each sequence's LONGEST same-token run — the
    degenerate-repetition screen one level below the trigram filter
    (catches 'aaaaaa…' loops that n-gram fractions dilute on long
    docs).

    One vectorized gaps-and-islands scan over the flat token buffer:
    run breaks where the token changes or the row changes, run lengths
    by bincount, per-row max via `np.maximum.at`; the finish is a
    run-lengths-bounded histogram. Map-only; zero exchange."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate
    from raylog.pipelines import log_pipeline as LP

    ds = LP.records_ds(sf_dir).select_columns(["tokens", "n_tok"])

    def maxrun(b: pa.Table) -> pa.Table:
        col = b["tokens"]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        n_tok = np.asarray(b["n_tok"].combine_chunks(), dtype=np.int64)
        flat = np.asarray(col.flatten(), dtype=np.int64)
        rid = np.repeat(np.arange(len(n_tok), dtype=np.int64), n_tok)
        brk = np.ones(len(flat), dtype=bool)
        if len(flat) > 1:
            brk[1:] = (flat[1:] != flat[:-1]) | (rid[1:] != rid[:-1])
        run = np.cumsum(brk) - 1
        run_len = np.bincount(run)
        run_row = rid[brk]
        mx = np.zeros(len(n_tok), dtype=np.int64)
        np.maximum.at(mx, run_row, run_len)
        keep = n_tok > 0
        return pa.table({
            "max_run": pa.array(mx[keep]),
            "one": pa.array(np.ones(int(keep.sum()), dtype=np.int64)),
        })

    return grouped_aggregate(
        ds.map_batches(maxrun, batch_format="pyarrow", batch_size=None),
        ["max_run"], [("one", "sum", "n_seqs")])


from raylog.pipelines.qbase import ORACLES as _OR2
from raylog import records as _R2

_OR2["tokens_max_run_hist"] = _R2.oracle_prefix() + """
, pos AS (
  SELECT doc_id, i, tokens[CAST(i AS INT)] AS tok
  FROM recs2, UNNEST(generate_series(1, CAST(n_tok AS INT))) t(i)
  WHERE n_tok > 0
), rl AS (
  SELECT doc_id, COUNT(*) AS len FROM (
    SELECT doc_id, tok,
           i - ROW_NUMBER() OVER (PARTITION BY doc_id, tok ORDER BY i)
             AS grp
    FROM pos
  ) GROUP BY doc_id, tok, grp
), mx AS (SELECT doc_id, MAX(len) AS max_run FROM rl GROUP BY 1)
SELECT CAST(max_run AS BIGINT) AS max_run,
       CAST(COUNT(*) AS BIGINT) AS n_seqs
FROM mx GROUP BY 1"""


# --------------------------------------------------------------------------
# User lifespan (first→last active day) histogram
# --------------------------------------------------------------------------

@query(
    "events_user_lifespan_hist",
    """
WITH s AS (
  SELECT user_id,
         CAST(MAX(CAST(ts AS DATE)) - MIN(CAST(ts AS DATE)) AS BIGINT)
           AS lifespan_days
  FROM events GROUP BY 1
)
SELECT lifespan_days, CAST(COUNT(*) AS BIGINT) AS n_users
FROM s GROUP BY 1""",
)
def events_user_lifespan_hist(sf_dir: str):
    """User lifespan histogram: days between each user's first and last
    activity — the churn-risk distribution (a mass at 0 days = one-shot
    users). One hash-partitioned (min, max) aggregate per user, one
    lifespans-bounded histogram; epoch-day arithmetic matches the SQL
    date subtraction exactly."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate, grouped_aggregate_ds

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])

    def days(b: pa.Table) -> pa.Table:
        t = np.asarray(b["ts"].combine_chunks()).astype(
            "datetime64[us]").astype(np.int64)
        return pa.table({
            "user_id": b["user_id"],
            "day": pa.array(t // 86_400_000_000),
        })

    span = grouped_aggregate_ds(
        ds.map_batches(days, batch_format="pyarrow", batch_size=None),
        ["user_id"], [("day", "min", "lo"), ("day", "max", "hi")],
        num_partitions=8)

    def diff(b: pa.Table) -> pa.Table:
        lo = np.asarray(b["lo"].combine_chunks(), dtype=np.int64)
        hi = np.asarray(b["hi"].combine_chunks(), dtype=np.int64)
        return pa.table({
            "lifespan_days": pa.array(hi - lo),
            "one": pa.array(np.ones(len(lo), dtype=np.int64)),
        })

    return grouped_aggregate(
        span.map_batches(diff, batch_format="pyarrow", batch_size=None),
        ["lifespan_days"], [("one", "sum", "n_users")])


# --------------------------------------------------------------------------
# CUBE aggregate (all grouping sets from one finest pass)
# --------------------------------------------------------------------------

@query(
    "orders_cube",
    """
WITH c AS (
  SELECT o_orderpriority,
         CAST(strftime(o_orderdate, '%Y') AS BIGINT) AS year,
         COUNT(*) AS n_orders,
         SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
           AS revenue_cents
  FROM orders GROUP BY CUBE (o_orderpriority, year)
)
SELECT COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
       COALESCE(year, -1) AS year,
       CAST(n_orders AS BIGINT) AS n_orders,
       CAST(revenue_cents AS BIGINT) AS revenue_cents
FROM c""",
)
def orders_cube(sf_dir: str):
    """CUBE over (priority, year): all four grouping sets — the OLAP
    subtotal lattice — derived from ONE finest-level distributed
    aggregate. The corpus is scanned once; every coarser set is
    integer re-aggregation of the priorities×years-bounded cells
    ('ALL' / -1 stand in for the CUBE's NULL grouping keys so the
    value compare is null-free)."""
    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderpriority", "o_orderdate",
                                  "o_totalprice"])

    def cells(b: pa.Table) -> pa.Table:
        price = np.asarray(b["o_totalprice"].combine_chunks(),
                           dtype=np.float64)
        return pa.table({
            "o_orderpriority": b["o_orderpriority"],
            "year": pc.cast(pc.strftime(b["o_orderdate"], format="%Y"),
                            pa.int64()),
            "cents": pa.array(np.floor(price * 100 + 0.5).astype(np.int64)),
        })

    fin = grouped_aggregate(
        ds.map_batches(cells, batch_format="pyarrow", batch_size=None),
        ["o_orderpriority", "year"],
        [("*", "count", "n"), ("cents", "sum", "rev")]).to_pandas()
    rows = []
    for pr, yr, n, rv in zip(fin["o_orderpriority"], fin["year"],
                             fin["n"], fin["rev"]):
        rows.append((pr, int(yr), int(n), int(rv)))
    out = {}
    for pr, yr, n, rv in rows:
        for key in ((pr, yr), (pr, -1), ("ALL", yr), ("ALL", -1)):
            a = out.setdefault(key, [0, 0])
            a[0] += n
            a[1] += rv
    keys = sorted(out)
    return pa.table({
        "o_orderpriority": pa.array([k[0] for k in keys], pa.string()),
        "year": pa.array([k[1] for k in keys], pa.int64()),
        "n_orders": pa.array([out[k][0] for k in keys], pa.int64()),
        "revenue_cents": pa.array([out[k][1] for k in keys], pa.int64()),
    })


# --------------------------------------------------------------------------
# Rolling 7-point median of the daily series
# --------------------------------------------------------------------------

@query(
    "events_rolling_median_7d",
    """
WITH c AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT event_type, day, CAST(n AS BIGINT) AS n,
       CAST(FLOOR(1000 * median(n) OVER (
             PARTITION BY event_type ORDER BY day
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS BIGINT)
         AS med7_milli
FROM c""",
)
def events_rolling_median_7d(sf_dir: str):
    """Rolling 7-point median of the per-type daily count series — the
    outlier-immune smoother ops dashboards pair with the EWMA (one
    1000× spike day moves the mean for a week, the median not at
    all). One (type, day) count pass; the order-statistics window runs
    on the cells-bounded series (median of ≤7 ints is integer or
    half-integer — exact in milli on both engines)."""
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

    c = grouped_aggregate(
        ds.map_batches(day, batch_format="pyarrow", batch_size=None),
        ["event_type", "day"], [("*", "count", "n")]).to_pandas()
    c = c.sort_values(["event_type", "day"])
    out_et, out_day, out_n, out_med = [], [], [], []
    for et, g in c.groupby("event_type", sort=True):
        n = g["n"].to_numpy(dtype=np.int64)
        for i in range(len(n)):
            w = n[max(0, i - 6):i + 1]
            out_et.append(et)
            out_day.append(g["day"].iloc[i])
            out_n.append(int(n[i]))
            out_med.append(int(np.floor(1000 * np.median(w))))
    return pa.table({
        "event_type": pa.array(out_et, pa.string()),
        "day": pa.array(out_day, pa.string()),
        "n": pa.array(out_n, pa.int64()),
        "med7_milli": pa.array(out_med, pa.int64()),
    })


# --------------------------------------------------------------------------
# Token-weighted median document length (weighted quantile)
# --------------------------------------------------------------------------

@query(
    "tokens_weighted_median_len",
    None,  # composed below with the recs2 prefix
)
def tokens_weighted_median_len(sf_dir: str):
    """Token-WEIGHTED median sequence length: the length of the
    sequence holding the median TOKEN (plus the plain median for
    contrast). Packing and window planning budget by token mass, and
    on a long-tailed corpus the two medians diverge wildly — doc-count
    medians say 'most docs are short', the weighted median says where
    the training tokens actually live.

    One (n_tok, count, token-mass) histogram — bounded by distinct
    lengths — then both quantiles read off the broadcast cumulative
    sums. The rank rule is ceil(half of total) on both engines."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate
    from raylog.pipelines import log_pipeline as LP

    ds = LP.records_ds(sf_dir).select_columns(["n_tok"])

    def cells(b: pa.Table) -> pa.Table:
        n = np.asarray(b["n_tok"].combine_chunks(), dtype=np.int64)
        return pa.table({
            "n_tok": pa.array(n),
            "one": pa.array(np.ones(len(n), dtype=np.int64)),
            "mass": pa.array(n),
        })

    h = grouped_aggregate(
        ds.map_batches(cells, batch_format="pyarrow", batch_size=None),
        ["n_tok"], [("one", "sum", "docs"), ("mass", "sum", "mass")])
    ln = np.asarray(h["n_tok"], dtype=np.int64)
    docs = np.asarray(h["docs"], dtype=np.int64)
    mass = np.asarray(h["mass"], dtype=np.int64)
    order = np.argsort(ln)
    ln, docs, mass = ln[order], docs[order], mass[order]
    cd, cm = np.cumsum(docs), np.cumsum(mass)

    def q(cum, target):
        return int(ln[np.searchsorted(cum, target, side="left")])

    n_docs, n_mass = int(cd[-1]), int(cm[-1])
    return pa.table({
        "median_len": pa.array([q(cd, (n_docs + 1) // 2)], pa.int64()),
        "weighted_median_len": pa.array(
            [q(cm, (n_mass + 1) // 2)], pa.int64()),
        "n_docs": pa.array([n_docs], pa.int64()),
        "total_tokens": pa.array([n_mass], pa.int64()),
    })


from raylog.pipelines.qbase import ORACLES as _OR3
from raylog import records as _R3

_OR3["tokens_weighted_median_len"] = _R3.oracle_prefix() + """
, h AS (
  SELECT n_tok, COUNT(*) AS docs, SUM(n_tok) AS mass FROM recs2
  GROUP BY 1
), c AS (
  SELECT n_tok,
         SUM(docs) OVER (ORDER BY n_tok) AS cd,
         SUM(mass) OVER (ORDER BY n_tok) AS cm
  FROM h
), t AS (SELECT SUM(docs) AS nd, SUM(mass) AS nm FROM h)
SELECT
  CAST((SELECT MIN(n_tok) FROM c, t WHERE c.cd >= (t.nd + 1) // 2)
       AS BIGINT) AS median_len,
  CAST((SELECT MIN(n_tok) FROM c, t WHERE c.cm >= (t.nm + 1) // 2)
       AS BIGINT) AS weighted_median_len,
  CAST(t.nd AS BIGINT) AS n_docs,
  CAST(t.nm AS BIGINT) AS total_tokens
FROM t"""


# --------------------------------------------------------------------------
# Event-type composition by user-activity decile
# --------------------------------------------------------------------------

@query(
    "events_type_share_by_user_decile",
    """
WITH uc AS (
  SELECT user_id, event_type, COUNT(*) AS n FROM events GROUP BY 1, 2
), ut AS (
  SELECT user_id, SUM(n) AS total FROM uc GROUP BY 1
), th AS (
  SELECT quantile_disc(total, 0.5) AS t_lo,
         quantile_disc(total, 0.9) AS t_hi
  FROM ut
), cls AS (
  SELECT ut.user_id,
         CASE WHEN ut.total > th.t_hi THEN 'heavy'
              WHEN ut.total > th.t_lo THEN 'mid'
              ELSE 'light' END AS band
  FROM ut CROSS JOIN th
), m AS (
  SELECT cls.band, uc.event_type, SUM(uc.n) AS n
  FROM uc JOIN cls USING (user_id) GROUP BY 1, 2
), bt AS (SELECT band, SUM(n) AS tot FROM m GROUP BY 1)
SELECT m.band, m.event_type, CAST(m.n AS BIGINT) AS n,
       (1000 * CAST(m.n AS BIGINT)) // CAST(bt.tot AS BIGINT)
         AS share_milli
FROM m JOIN bt USING (band)""",
)
def events_type_share_by_user_decile(sf_dir: str):
    """Event-type mix by user-activity band (light / mid / heavy at the
    exact p50/p90 activity cuts): do power users DO different things,
    or just more of the same — the segmentation behind every
    engagement-loop decision.

    One (user, type) count aggregate is the only corpus pass; per-user
    totals, the exact quantile cuts (distributed histogram kernel) and
    the band classification all derive from that users×types-bounded
    table — the classification happens INSIDE complete-user partitions
    against broadcast thresholds, so no join back to the corpus."""
    import numpy as np
    import ray
    import ray.data as rd

    from raylog.functions.agg import (grouped_aggregate,
                                      grouped_aggregate_ds,
                                      partitioned_group_apply)
    from raylog.functions.quantile import grouped_quantiles

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type"])
    uc = grouped_aggregate_ds(ds, ["user_id", "event_type"],
                              [("user_id", "count", "n")],
                              num_partitions=8)
    ut = grouped_aggregate_ds(uc, ["user_id"], [("n", "sum", "total")],
                              num_partitions=8)

    def addk(b: pa.Table) -> pa.Table:
        return b.append_column("k", pa.array(np.zeros(b.num_rows,
                                                      dtype=np.int64)))

    q = grouped_quantiles(
        ut.map_batches(addk, batch_format="pyarrow", batch_size=None),
        key="k", value="total", ps=[0.5, 0.9],
        out_names=["t_lo", "t_hi"], num_partitions=2).to_pandas()
    t_lo, t_hi = int(q["t_lo"].iloc[0]), int(q["t_hi"].iloc[0])
    ref = (ray.put((t_lo, t_hi)) if ray.is_initialized()
           else (t_lo, t_hi))

    def classify(part: pa.Table) -> pa.Table:
        lo, hi = ray.get(ref) if ray.is_initialized() else ref
        uid = np.asarray(part["user_id"].combine_chunks(), dtype=np.int64)
        et = np.asarray(part["event_type"].combine_chunks()).astype("U")
        n = np.asarray(part["n"].combine_chunks(), dtype=np.int64)
        order = np.argsort(uid, kind="mergesort")
        uid, et, n = uid[order], et[order], n[order]
        brk = np.ones(len(uid), dtype=bool)
        if len(uid) > 1:
            brk[1:] = uid[1:] != uid[:-1]
        seg = np.cumsum(brk) - 1
        totals = np.bincount(seg, weights=n).astype(np.int64)[seg]
        band = np.where(totals > hi, "heavy",
                        np.where(totals > lo, "mid", "light"))
        return pa.table({
            "band": pa.array(band.tolist(), pa.string()),
            "event_type": pa.array(et.tolist(), pa.string()),
            "n": pa.array(n),
        })

    m = partitioned_group_apply(uc, ["user_id"], classify,
                                num_partitions=8)
    agg = grouped_aggregate(m, ["band", "event_type"],
                            [("n", "sum", "n")]).to_pandas()
    bt = agg.groupby("band")["n"].sum().to_dict()
    agg = agg.sort_values(["band", "event_type"])
    return pa.table({
        "band": pa.array(agg["band"].tolist(), pa.string()),
        "event_type": pa.array(agg["event_type"].tolist(), pa.string()),
        "n": pa.array(agg["n"].astype(np.int64).to_numpy()),
        "share_milli": pa.array(
            [1000 * int(n) // int(bt[b])
             for b, n in zip(agg["band"], agg["n"])], pa.int64()),
    })


# --------------------------------------------------------------------------
# Distinct-user overlap (Jaccard) between event-type pairs
# --------------------------------------------------------------------------

@query(
    "events_type_user_overlap",
    """
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
tc AS (SELECT event_type, COUNT(*) AS n FROM ut GROUP BY 1),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         COUNT(*) AS n_both
  FROM ut a JOIN ut b ON a.user_id = b.user_id
       AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT p.type_a, p.type_b, CAST(p.n_both AS BIGINT) AS n_both,
       (1000 * CAST(p.n_both AS BIGINT))
         // CAST(x.n + y.n - p.n_both AS BIGINT) AS jaccard_milli
FROM pairs p JOIN tc x ON p.type_a = x.event_type
     JOIN tc y ON p.type_b = y.event_type""",
)
def events_type_user_overlap(sf_dir: str):
    """Feature co-usage matrix: distinct-user Jaccard overlap between
    every pair of event types (do clickers also purchase?) — the
    product-analytics artifact behind cross-sell and funnel-order
    decisions.

    One distinct (user, type) aggregate; pair intersections expand
    INSIDE complete-user partitions (≤ types²/2 rows per user, the
    basket-pair kernel shape), so the exchange is pair-compressed
    partials; per-type distinct counts ride the same table; the
    Jaccard finish is types²-bounded."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import (grouped_aggregate,
                                      grouped_aggregate_ds,
                                      partitioned_group_apply)

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type"])
    ut = grouped_aggregate_ds(ds, ["user_id", "event_type"],
                              [("user_id", "count", "c")],
                              num_partitions=8)

    def pairs(part: pa.Table) -> pa.Table:
        uid = np.asarray(part["user_id"].combine_chunks(), dtype=np.int64)
        et = np.asarray(part["event_type"].combine_chunks()).astype("U")
        order = np.lexsort((et, uid))
        uid, et = uid[order], et[order]
        brk = np.ones(len(uid), dtype=bool)
        if len(uid) > 1:
            brk[1:] = uid[1:] != uid[:-1]
        starts = np.flatnonzero(brk)
        ends = np.append(starts[1:], len(uid))
        out_a, out_b = [], []
        for s, e in zip(starts, ends):  # ≤types entries per user
            k = e - s
            if k < 2:
                continue
            iu, ju = np.triu_indices(k, 1)
            out_a.append(et[s:e][iu])
            out_b.append(et[s:e][ju])
        if not out_a:
            return pa.table({"type_a": pa.array([], pa.string()),
                             "type_b": pa.array([], pa.string()),
                             "one": pa.array([], pa.int64())})
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        return pa.table({
            "type_a": pa.array(a.tolist(), pa.string()),
            "type_b": pa.array(b.tolist(), pa.string()),
            "one": pa.array(np.ones(len(a), dtype=np.int64)),
        })

    inter = grouped_aggregate(
        partitioned_group_apply(ut, ["user_id"], pairs,
                                num_partitions=8),
        ["type_a", "type_b"], [("one", "sum", "n_both")])
    tc = grouped_aggregate(ut, ["event_type"], [("*", "count", "n")])
    counts = dict(zip(np.asarray(tc["event_type"]).astype("U").tolist(),
                      np.asarray(tc["n"], dtype=np.int64).tolist()))
    if "type_a" not in inter.column_names:  # no user spans 2 types
        z = pa.array([], pa.int64())
        e = pa.array([], pa.string())
        return pa.table({"type_a": e, "type_b": e, "n_both": z,
                         "jaccard_milli": z})
    ta = np.asarray(inter["type_a"]).astype("U")
    tb = np.asarray(inter["type_b"]).astype("U")
    nb = np.asarray(inter["n_both"], dtype=np.int64)
    jac = [1000 * int(n) // (counts[a] + counts[b] - int(n))
           for a, b, n in zip(ta, tb, nb)]
    return pa.table({
        "type_a": pa.array(ta.tolist(), pa.string()),
        "type_b": pa.array(tb.tolist(), pa.string()),
        "n_both": pa.array(nb),
        "jaccard_milli": pa.array(jac, pa.int64()),
    })


# --------------------------------------------------------------------------
# Character-bigram conditional entropy per source (mojibake detector)
# --------------------------------------------------------------------------

@query(
    "docs_char_bigram_entropy",
    """
WITH pairs AS (
  SELECT source, substr(text, CAST(i AS INT), 1) AS a,
         substr(text, CAST(i AS INT) + 1, 1) AS b
  FROM documents, UNNEST(generate_series(1, length(text) - 1)) t(i)
  WHERE length(text) >= 2
), c AS (
  SELECT source, a, b, COUNT(*) AS n FROM pairs GROUP BY 1, 2, 3
), t AS (SELECT source, SUM(n) AS tot FROM c GROUP BY 1),
am AS (SELECT source, a, SUM(n) AS na FROM c GROUP BY 1, 2)
SELECT c.source,
       CAST(FLOOR(1000 * SUM((c.n * 1.0 / t.tot)
            * ln((am.na * 1.0) / c.n)) / ln(2)) AS BIGINT)
         AS h_cond_millibits,
       CAST(t.tot AS BIGINT) AS n_bigrams
FROM c JOIN t USING (source) JOIN am USING (source, a)
GROUP BY 1, t.tot""",
)
def docs_char_bigram_entropy(sf_dir: str):
    """Character-level conditional entropy H(next char | char) per
    source, in millibits — natural text sits in a narrow band (~3-4
    bits); mojibake / base64 blobs shoot high, template mills sit
    low. The encoding-health companion to `docs_char_entropy`.

    Per batch, ONE vectorized pass over the flat byte buffer builds
    (source, a·256+b) pair counts with doc boundaries masked (no
    per-row Python, no string ops); the exchange is the
    sources×256²-bounded count combine and the entropy finish runs on
    that bounded table. ASCII-fixture bound documented (byte == char
    for the synthetic corpus, like `docs_char_class_profile`)."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate, grouped_aggregate_ds

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["source", "text"])

    def pair_counts(b: pa.Table) -> pa.Table:
        txt = b["text"].combine_chunks()
        buf = np.frombuffer(txt.buffers()[2] or b"", dtype=np.uint8)
        offs = np.frombuffer(txt.buffers()[1], dtype=np.int32)[
            txt.offset:txt.offset + len(txt) + 1]
        lens = np.diff(offs).astype(np.int64)
        seg = buf[offs[0]:offs[-1]].astype(np.int64)
        doc = np.repeat(np.arange(len(txt), dtype=np.int64), lens)
        enc = b["source"].combine_chunks().dictionary_encode()
        src = np.asarray(enc.indices, dtype=np.int64)
        if len(seg) < 2:
            return pa.table({"source": pa.array([], pa.string()),
                             "ab": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        same_doc = doc[1:] == doc[:-1]
        pair = (seg[:-1] * 256 + seg[1:])[same_doc]
        psrc = src[doc[:-1][same_doc]]
        packed = psrc * 65536 + pair
        up, cnt = np.unique(packed, return_counts=True)
        return pa.table({
            "source": enc.dictionary.take(pa.array(up // 65536)),
            "ab": pa.array(up % 65536),
            "n": pa.array(cnt.astype(np.int64)),
        })

    c = grouped_aggregate_ds(
        ds.map_batches(pair_counts, batch_format="pyarrow",
                       batch_size=None),
        ["source", "ab"], [("n", "sum", "n")], num_partitions=8
    ).to_pandas()
    rows = []
    for s, g in c.groupby("source", sort=True):
        n = g["n"].to_numpy(dtype=np.float64)
        ab = g["ab"].to_numpy(dtype=np.int64)
        tot = n.sum()
        na = np.zeros(256)
        np.add.at(na, ab // 256, n)
        h = float(((n / tot) * np.log(na[ab // 256] / n)).sum()
                  / np.log(2))
        rows.append((s, int(np.floor(1000 * h)), int(tot)))
    return pa.table({
        "source": pa.array([r[0] for r in rows], pa.string()),
        "h_cond_millibits": pa.array([r[1] for r in rows], pa.int64()),
        "n_bigrams": pa.array([r[2] for r in rows], pa.int64()),
    })


# --------------------------------------------------------------------------
# Truncation-waste planning table (token mass kept at each max_len)
# --------------------------------------------------------------------------

@query(
    "tokens_truncation_waste",
    None,  # composed below with the recs2 prefix
)
def tokens_truncation_waste(sf_dir: str):
    """Token mass retained when truncating every sequence at max_len ∈
    {32, 64, 128, 256}: the one-table answer to 'what context length
    wastes the least data' asked before every packing run (the
    complement of `tokens_length_mass`, which buckets by doc length).

    One (n_tok, count) histogram — bounded by distinct lengths — and
    all four budget rows are integer arithmetic over the broadcast
    cumulative sums; the corpus streams once."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate
    from raylog.pipelines import log_pipeline as LP

    ds = LP.records_ds(sf_dir).select_columns(["n_tok"])

    def cells(b: pa.Table) -> pa.Table:
        n = np.asarray(b["n_tok"].combine_chunks(), dtype=np.int64)
        return pa.table({
            "n_tok": pa.array(n),
            "one": pa.array(np.ones(len(n), dtype=np.int64)),
        })

    h = grouped_aggregate(
        ds.map_batches(cells, batch_format="pyarrow", batch_size=None),
        ["n_tok"], [("one", "sum", "docs")])
    ln = np.asarray(h["n_tok"], dtype=np.int64)
    docs = np.asarray(h["docs"], dtype=np.int64)
    total = int((ln * docs).sum())
    rows = []
    for L in (32, 64, 128, 256):
        kept = int((np.minimum(ln, L) * docs).sum())
        n_trunc = int(docs[ln > L].sum())
        rows.append((L, kept, 10000 * kept // total, n_trunc))
    return pa.table({
        "max_len": pa.array([r[0] for r in rows], pa.int64()),
        "tokens_kept": pa.array([r[1] for r in rows], pa.int64()),
        "kept_share_e4": pa.array([r[2] for r in rows], pa.int64()),
        "n_truncated_docs": pa.array([r[3] for r in rows], pa.int64()),
    })


from raylog.pipelines.qbase import ORACLES as _OR4
from raylog import records as _R4

_OR4["tokens_truncation_waste"] = _R4.oracle_prefix() + """
, L AS (SELECT unnest([32, 64, 128, 256]) AS max_len),
t AS (SELECT SUM(n_tok) AS total FROM recs2)
SELECT CAST(L.max_len AS BIGINT) AS max_len,
       CAST(SUM(LEAST(n_tok, L.max_len)) AS BIGINT) AS tokens_kept,
       (10000 * CAST(SUM(LEAST(n_tok, L.max_len)) AS BIGINT))
         // CAST(t.total AS BIGINT) AS kept_share_e4,
       CAST(SUM(CASE WHEN n_tok > L.max_len THEN 1 ELSE 0 END)
            AS BIGINT) AS n_truncated_docs
FROM recs2 CROSS JOIN L CROSS JOIN t
GROUP BY 1, t.total"""


# --------------------------------------------------------------------------
# Intrinsic-dimension proxy of the embedding space (participation ratio)
# --------------------------------------------------------------------------

@query(
    "embed_intrinsic_dim",
    """
WITH w AS (
  SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
  FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS u(i)
), cov AS (
  SELECT a.i AS i, b.i AS j, COVAR_SAMP(a.x, b.x) AS cov
  FROM w a JOIN w b ON a.vec_id = b.vec_id
  GROUP BY 1, 2
)
SELECT POWER(SUM(CASE WHEN i = j THEN cov ELSE 0 END), 2)
         / SUM(cov * cov) AS participation_ratio,
       SUM(CASE WHEN i = j THEN cov ELSE 0 END) AS trace_var
FROM cov""",
)
def embed_intrinsic_dim(sf_dir: str):
    """Effective dimensionality of the embedding space: the
    participation ratio (tr C)² / ‖C‖²_F = (Σλ)²/Σλ² — equals d for an
    isotropic cloud, 1 for a collapsed (rank-1) encoder, WITHOUT any
    eigendecomposition (Frobenius norm = Σ cov², so the whole statistic
    is closed-form in the covariance entries). The one-number encoder
    health check run before trusting cosine geometry for dedup or ANN.

    Rides the oracled `embed_pca_cov` moment pass unchanged (one
    streaming pass, d²-bounded partials); the finish is arithmetic on
    the d×d matrix."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.pca import embedding_cov

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["embedding"])
    cov, _, _ = embedding_cov(ds)
    tr = float(np.trace(cov))
    fro2 = float((cov * cov).sum())
    if fro2 == 0.0:  # <2 vectors: covariance is the zero matrix
        return pa.table({
            "participation_ratio": pa.array([], pa.float64()),
            "trace_var": pa.array([], pa.float64()),
        })
    return pa.table({
        "participation_ratio": pa.array([tr * tr / fro2], pa.float64()),
        "trace_var": pa.array([tr], pa.float64()),
    })


# --------------------------------------------------------------------------
# Revenue-concentration HHI per market segment
# --------------------------------------------------------------------------

@query(
    "orders_hhi_by_segment",
    """
WITH cr AS (
  SELECT c.c_mktsegment, o.o_custkey,
         SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS rev
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
), s AS (
  SELECT c_mktsegment, SUM(rev) AS total,
         SUM(CAST(rev AS HUGEINT) * rev) AS sumsq,
         COUNT(*) AS n_cust
  FROM cr GROUP BY 1
)
SELECT c_mktsegment, CAST(n_cust AS BIGINT) AS n_customers,
       CAST(total AS BIGINT) AS revenue_cents,
       CAST((1000000 * sumsq) // (CAST(total AS HUGEINT) * total)
            AS BIGINT) AS hhi_e6
FROM s""",
)
def orders_hhi_by_segment(sf_dir: str):
    """Herfindahl–Hirschman revenue concentration per market segment:
    Σ (customer share)² in 1e-6 units — 1e6/n for perfectly even
    books, → 1e6 when one whale is the segment. The
    customer-concentration risk report.

    Per-(segment, customer) revenue is one hash-partitioned integer
    aggregate (segment rides the broadcast customer dim); the HHI
    finish is the exact integer rational 1e6·Σrev²/total² — Python
    bigints on the driver, HUGEINT in the oracle — over the
    custkey-bounded table, aggregated per segment with no float."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate, grouped_aggregate_ds

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_mktsegment"]).to_pandas()
    ck = cust["c_custkey"].to_numpy(np.int64)
    seg = np.empty(int(ck.max()) + 1, dtype=object)
    seg[ck] = cust["c_mktsegment"].to_numpy()
    ref = ray.put(seg) if ray.is_initialized() else seg

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_totalprice"])

    def cents(b: pa.Table) -> pa.Table:
        seg_ = ray.get(ref) if ray.is_initialized() else ref
        cu = np.asarray(b["o_custkey"].combine_chunks(), dtype=np.int64)
        price = np.asarray(b["o_totalprice"].combine_chunks(),
                           dtype=np.float64)
        return pa.table({
            "c_mktsegment": pa.array(seg_[cu].tolist(), pa.string()),
            "o_custkey": pa.array(cu),
            "rev": pa.array(np.floor(price * 100 + 0.5).astype(np.int64)),
        })

    cr = grouped_aggregate_ds(
        orders.map_batches(cents, batch_format="pyarrow",
                           batch_size=None),
        ["c_mktsegment", "o_custkey"], [("rev", "sum", "rev")],
        num_partitions=8)

    def sq(b: pa.Table) -> pa.Table:
        rev = np.asarray(b["rev"].combine_chunks(), dtype=np.int64)
        # rev² as DOUBLE would round past 2^53; ship two int64 halves
        hi = (rev.astype(object) * rev) >> 64
        lo = (rev.astype(object) * rev) & ((1 << 64) - 1)
        return pa.table({
            "c_mktsegment": b["c_mktsegment"],
            "rev": pa.array(rev),
            "sq_hi": pa.array([int(x) for x in hi], pa.int64()),
            "sq_lo_hi32": pa.array([int(x) >> 32 for x in lo], pa.int64()),
            "sq_lo_lo32": pa.array([int(x) & 0xFFFFFFFF for x in lo],
                                   pa.int64()),
            "one": pa.array(np.ones(len(rev), dtype=np.int64)),
        })

    s = grouped_aggregate(
        cr.map_batches(sq, batch_format="pyarrow", batch_size=None),
        ["c_mktsegment"],
        [("rev", "sum", "total"), ("sq_hi", "sum", "h"),
         ("sq_lo_hi32", "sum", "m"), ("sq_lo_lo32", "sum", "l"),
         ("one", "sum", "n_customers")])
    segs = np.asarray(s["c_mktsegment"]).astype("U")
    tot = np.asarray(s["total"], dtype=np.int64)
    h = np.asarray(s["h"], dtype=np.int64)
    m = np.asarray(s["m"], dtype=np.int64)
    l = np.asarray(s["l"], dtype=np.int64)
    n = np.asarray(s["n_customers"], dtype=np.int64)
    hhi = [int(1_000_000 * (int(hh) * (1 << 64) + (int(mm) << 32)
                            + int(ll)) // (int(t) * int(t)))
           for hh, mm, ll, t in zip(h, m, l, tot)]
    return pa.table({
        "c_mktsegment": pa.array(segs.tolist(), pa.string()),
        "n_customers": pa.array(n),
        "revenue_cents": pa.array(tot),
        "hhi_e6": pa.array(hhi, pa.int64()),
    })


# --------------------------------------------------------------------------
# Revenue-weighted Pareto: customers covering 80% of revenue
# --------------------------------------------------------------------------

@query(
    "orders_revenue_pareto",
    """
WITH cr AS (
  SELECT o_custkey,
         SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS rev
  FROM orders GROUP BY 1
), r AS (
  SELECT rev,
         SUM(rev) OVER (ORDER BY rev DESC, o_custkey) AS cum,
         ROW_NUMBER() OVER (ORDER BY rev DESC, o_custkey) AS rn
  FROM cr
), t AS (SELECT SUM(rev) AS total, COUNT(*) AS n FROM cr)
SELECT CAST(t.n AS BIGINT) AS n_customers,
       CAST(t.total AS BIGINT) AS revenue_cents,
       CAST((SELECT MIN(rn) FROM r
             WHERE CAST(cum AS HUGEINT) * 10 >= CAST(t.total AS HUGEINT) * 8)
            AS BIGINT) AS n_top80,
       (10000 * CAST((SELECT MIN(rn) FROM r
             WHERE CAST(cum AS HUGEINT) * 10 >= CAST(t.total AS HUGEINT) * 8)
            AS BIGINT)) // CAST(t.n AS BIGINT) AS top80_share_e4
FROM t""",
)
def orders_revenue_pareto(sf_dir: str):
    """Revenue-weighted Pareto: the SMALLEST number of customers whose
    (descending) revenue covers 80% of the book — the '80/20' as it
    actually falls out of the data, not the folklore number.

    Per-customer revenue is one hash-partitioned integer aggregate;
    the crossing is found on the (revenue_cents, count) HISTOGRAM —
    bounded by distinct revenue values — walking value blocks from the
    top with a closed-form partial-block crossing (the
    `events_pareto_users` tie-block rule, revenue-weighted): no
    customer-level sort anywhere, and the ≥80% comparison is exact
    integer cross-multiplication on both engines."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate, grouped_aggregate_ds

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_totalprice"])

    def cents(b: pa.Table) -> pa.Table:
        price = np.asarray(b["o_totalprice"].combine_chunks(),
                           dtype=np.float64)
        return pa.table({
            "o_custkey": b["o_custkey"],
            "rev": pa.array(np.floor(price * 100 + 0.5).astype(np.int64)),
        })

    cr = grouped_aggregate_ds(
        orders.map_batches(cents, batch_format="pyarrow",
                           batch_size=None),
        ["o_custkey"], [("rev", "sum", "rev")], num_partitions=8)
    hist = grouped_aggregate(cr, ["rev"], [("*", "count", "c")])
    rev = np.asarray(hist["rev"], dtype=np.int64)
    cnt = np.asarray(hist["c"], dtype=np.int64)
    order = np.argsort(-rev)
    rev, cnt = rev[order], cnt[order]
    total = int((rev * cnt).sum())
    n_cust = int(cnt.sum())
    # walk whole value blocks from the top, then cross inside a block
    cum = 0
    rank = 0
    n_top = n_cust
    for v, k in zip(rev.tolist(), cnt.tolist()):
        block = v * k
        if (cum + block) * 10 >= total * 8:
            # smallest j in 1..k with (cum + j*v)*10 >= total*8
            need = total * 8 - cum * 10
            j = -(-need // (v * 10)) if v > 0 else k
            n_top = rank + max(1, j)
            break
        cum += block
        rank += k
    return pa.table({
        "n_customers": pa.array([n_cust], pa.int64()),
        "revenue_cents": pa.array([total], pa.int64()),
        "n_top80": pa.array([n_top], pa.int64()),
        "top80_share_e4": pa.array([10000 * n_top // n_cust], pa.int64()),
    })


# --------------------------------------------------------------------------
# Token-unigram entropy per source (sequences table)
# --------------------------------------------------------------------------

@query(
    "tokens_unigram_entropy_by_source",
    None,  # composed below with the recs2 prefix
)
def tokens_unigram_entropy_by_source(sf_dir: str):
    """Shannon entropy of the token-unigram distribution per source, in
    millibits — the sequences-table sibling of `docs_char_entropy`:
    a source whose token entropy collapses is emitting templates or
    repeated padding regardless of what its text looks like.

    One (source, token) hash-partitioned count (vocab×sources
    bounded); the entropy finish is the integer-count restatement
    Σ c·log2(N/c) / N on that bounded table — same identity as
    `tokens_cond_entropy`, so both engines evaluate identical
    expressions."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate, grouped_aggregate_ds
    from raylog.pipelines import log_pipeline as LP

    ds = LP.records_ds(sf_dir).select_columns(["source", "tokens"])

    def tcounts(b: pa.Table) -> pa.Table:
        col = b["tokens"]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        import pyarrow.compute as pc

        lens = np.asarray(pc.list_value_length(col), dtype=np.int64)
        flat = np.asarray(col.flatten(), dtype=np.int64)
        enc = b["source"].combine_chunks().dictionary_encode()
        src = np.asarray(enc.indices, dtype=np.int64)
        tok_src = np.repeat(src, lens)
        packed = tok_src * (1 << 32) + flat
        up, cnt = np.unique(packed, return_counts=True)
        return pa.table({
            "source": enc.dictionary.take(pa.array(up >> 32)),
            "tok": pa.array(up & ((1 << 32) - 1)),
            "c": pa.array(cnt.astype(np.int64)),
        })

    sw = grouped_aggregate_ds(
        ds.map_batches(tcounts, batch_format="pyarrow", batch_size=None),
        ["source", "tok"], [("c", "sum", "c")], num_partitions=8
    ).to_pandas()
    rows = []
    for s, g in sw.groupby("source", sort=True):
        c = g["c"].to_numpy(dtype=np.float64)
        n = c.sum()
        h = float(((c / n) * np.log(n / c)).sum() / np.log(2))
        rows.append((s, int(np.floor(1000 * h)), int(n)))
    return pa.table({
        "source": pa.array([r[0] for r in rows], pa.string()),
        "h_millibits": pa.array([r[1] for r in rows], pa.int64()),
        "n_tokens": pa.array([r[2] for r in rows], pa.int64()),
    })


from raylog.pipelines.qbase import ORACLES as _OR5
from raylog import records as _R5

_OR5["tokens_unigram_entropy_by_source"] = _R5.oracle_prefix() + """
, tok AS (
  SELECT source, CAST(unnest(tokens) AS BIGINT) AS t FROM recs2
), c AS (
  SELECT source, t, COUNT(*) AS c FROM tok GROUP BY 1, 2
), n AS (SELECT source, SUM(c) AS n FROM c GROUP BY 1)
SELECT c.source,
       CAST(FLOOR(1000 * SUM((c.c * 1.0 / n.n) * ln(n.n * 1.0 / c.c))
            / ln(2)) AS BIGINT) AS h_millibits,
       CAST(n.n AS BIGINT) AS n_tokens
FROM c JOIN n USING (source)
GROUP BY 1, n.n"""


# --------------------------------------------------------------------------
# Price quantiles per brand (grouped quantile kernel × broadcast dim)
# --------------------------------------------------------------------------

@query(
    "lineitem_price_quantiles_by_brand",
    """
WITH b AS (
  SELECT p.p_brand,
         CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
)
SELECT p_brand,
       CAST(quantile_disc(cents, 0.5) AS BIGINT) AS p50_cents,
       CAST(quantile_disc(cents, 0.9) AS BIGINT) AS p90_cents,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM b GROUP BY 1""",
)
def lineitem_price_quantiles_by_brand(sf_dir: str):
    """Exact p50/p90 line price per brand: the pricing-dispersion
    report. The brand attaches map-side from the broadcast part dim
    (Q14 convention) and the quantiles ride the distributed
    count-histogram kernel — no per-brand sort, exchange bounded by
    brands × distinct prices."""
    import numpy as np
    import ray
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate
    from raylog.functions.quantile import grouped_quantiles

    import pyarrow.parquet as pq

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand"]).to_pandas()
    pk = part["p_partkey"].to_numpy(np.int64)
    brands = np.empty(int(pk.max()) + 1, dtype=object)
    brands[pk] = part["p_brand"].to_numpy()
    ref = ray.put(brands) if ray.is_initialized() else brands

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_extendedprice"])

    def cents(b: pa.Table) -> pa.Table:
        brands_ = ray.get(ref) if ray.is_initialized() else ref
        partk = np.asarray(b["l_partkey"].combine_chunks(), dtype=np.int64)
        price = np.asarray(b["l_extendedprice"].combine_chunks(),
                           dtype=np.float64)
        return pa.table({
            "p_brand": pa.array(brands_[partk].tolist(), pa.string()),
            "cents": pa.array(np.floor(price * 100 + 0.5).astype(np.int64)),
        })

    vds = li.map_batches(cents, batch_format="pyarrow", batch_size=None)
    q = grouped_quantiles(vds, key="p_brand", value="cents",
                          ps=[0.5, 0.9], out_names=["p50_cents",
                                                    "p90_cents"],
                          num_partitions=8).to_pandas()
    n = grouped_aggregate(vds, ["p_brand"],
                          [("*", "count", "n_items")]).to_pandas()
    m = q.merge(n, on="p_brand").sort_values("p_brand")
    return pa.table({
        "p_brand": pa.array(m["p_brand"].tolist(), pa.string()),
        "p50_cents": pa.array(m["p50_cents"].astype(np.int64).to_numpy()),
        "p90_cents": pa.array(m["p90_cents"].astype(np.int64).to_numpy()),
        "n_items": pa.array(m["n_items"].astype(np.int64).to_numpy()),
    })


# --------------------------------------------------------------------------
# Vocabulary-concentration Gini per source
# --------------------------------------------------------------------------

@query(
    "docs_vocab_gini",
    """
WITH words AS (SELECT source, unnest(string_split(text, ' ')) AS w
               FROM documents),
sw AS (SELECT source, w, COUNT(*) AS c FROM words GROUP BY 1, 2),
r AS (
  SELECT source, c,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY c, w) AS i
  FROM sw
), t AS (
  SELECT source, COUNT(*) AS k, SUM(c) AS s, SUM(i * c) AS sin
  FROM r GROUP BY 1
)
SELECT source,
       CAST(FLOOR(1e6 * (2.0 * sin / (k * s) - (k + 1.0) / k)) AS BIGINT)
         AS gini_micro,
       CAST(k AS BIGINT) AS n_types, CAST(s AS BIGINT) AS n_words
FROM t""",
)
def docs_vocab_gini(sf_dir: str):
    """Gini coefficient of the word-frequency distribution per source —
    vocabulary concentration as a single number (0 = every word used
    equally, →1 = a handful of tokens carry the text). The static
    complement of `tokens_zipf_slope`: template mills and keyword spam
    push it up, natural prose sits in a stable band.

    Rides the shared (source, word) hash-partitioned count; only the
    per-source COUNT-OF-COUNTS histogram (bounded by distinct
    frequency values) reaches the driver, where the tie-block rank
    arithmetic evaluates the sorted-rank Gini exactly — the
    `events_user_gini` kernel, per source. No word-level sort."""
    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate, grouped_aggregate_ds

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["source", "text"])

    def wcounts(b: pa.Table) -> pa.Table:
        split = pc.split_pattern(b["text"].combine_chunks(), " ")
        lens = np.asarray(pc.list_value_length(split), dtype=np.int64)
        flat = split.flatten().dictionary_encode()
        codes = np.asarray(flat.indices, dtype=np.int64)
        enc = b["source"].combine_chunks().dictionary_encode()
        src = np.asarray(enc.indices, dtype=np.int64)
        tok_src = np.repeat(src, lens)
        nv = len(flat.dictionary)
        packed = tok_src * nv + codes
        up, cnt = np.unique(packed, return_counts=True)
        return pa.table({
            "source": enc.dictionary.take(pa.array(up // nv)),
            "w": flat.dictionary.take(pa.array(up % nv)),
            "c": pa.array(cnt.astype(np.int64)),
        })

    sw = grouped_aggregate_ds(
        ds.map_batches(wcounts, batch_format="pyarrow", batch_size=None),
        ["source", "w"], [("c", "sum", "c")])
    hist = grouped_aggregate(sw, ["source", "c"],
                             [("*", "count", "m")]).to_pandas()
    rows = []
    for s, g in hist.groupby("source", sort=True):
        g = g.sort_values("c")
        n = g["c"].to_numpy(dtype=np.float64)
        m = g["m"].to_numpy(dtype=np.float64)
        k = m.sum()
        tot = (n * m).sum()
        c0 = np.concatenate([[0.0], np.cumsum(m)[:-1]])
        sin = (n * (m * c0 + m * (m + 1) / 2)).sum()
        gini = 2.0 * sin / (k * tot) - (k + 1.0) / k
        rows.append((s, int(np.floor(1e6 * gini)), int(k), int(tot)))
    return pa.table({
        "source": pa.array([r[0] for r in rows], pa.string()),
        "gini_micro": pa.array([r[1] for r in rows], pa.int64()),
        "n_types": pa.array([r[2] for r in rows], pa.int64()),
        "n_words": pa.array([r[3] for r in rows], pa.int64()),
    })


# --------------------------------------------------------------------------
# Validation-set OOV rate vs the training vocabulary
# --------------------------------------------------------------------------

@query(
    "tokens_split_oov",
    """
WITH a AS (
  SELECT text,
         CASE WHEN CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT)
                   % 100 < 80 THEN 'train' ELSE 'heldout' END AS split
  FROM documents
), words AS (
  SELECT split, unnest(string_split(text, ' ')) AS w FROM a
), tv AS (SELECT DISTINCT w FROM words WHERE split = 'train'),
hw AS (SELECT w, COUNT(*) AS c FROM words WHERE split = 'heldout'
       GROUP BY 1)
SELECT CAST(SUM(CASE WHEN tv.w IS NULL THEN hw.c ELSE 0 END) AS BIGINT)
         AS oov_tokens,
       CAST(SUM(hw.c) AS BIGINT) AS heldout_tokens,
       (100000 * CAST(SUM(CASE WHEN tv.w IS NULL THEN hw.c ELSE 0 END)
                      AS BIGINT)) // CAST(SUM(hw.c) AS BIGINT)
         AS oov_share_e5,
       CAST(SUM(CASE WHEN tv.w IS NULL AND hw.c > 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS oov_types
FROM hw LEFT JOIN tv USING (w)""",
)
def tokens_split_oov(sf_dir: str):
    """Held-out OOV rate against the TRAIN split's vocabulary (the same
    deterministic 80/20 content-hash rule as `sample_split_assign`):
    what fraction of held-out tokens a train-fitted vocab/tokenizer
    has never seen — the leakage-free generalization number every
    split report should carry.

    One corpus pass assigns splits AND emits (split, word) counts
    (vocab×2-bounded); the train vocab and the held-out counts are two
    slices of that ONE hash-partitioned aggregate, joined by word
    inside complete-word partitions — a membership check with zero
    extra corpus reads and no driver-side vocab set."""
    import hashlib

    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd

    from raylog.functions.agg import (grouped_aggregate,
                                      grouped_aggregate_ds,
                                      partitioned_group_apply)

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["text"])

    def wcounts(b: pa.Table) -> pa.Table:
        texts = b["text"].to_pylist()
        half = np.fromiter(
            (int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % 100 < 80
             for t in texts), dtype=np.int64, count=len(texts))
        split = pc.split_pattern(b["text"].combine_chunks(), " ")
        lens = np.asarray(pc.list_value_length(split), dtype=np.int64)
        flat = split.flatten().dictionary_encode()
        codes = np.asarray(flat.indices, dtype=np.int64)
        tok_half = np.repeat(half, lens)
        nv = len(flat.dictionary)
        packed = tok_half * nv + codes
        up, cnt = np.unique(packed, return_counts=True)
        return pa.table({
            "w": flat.dictionary.take(pa.array(up % nv)),
            "is_train": pa.array(up // nv),
            "c": pa.array(cnt.astype(np.int64)),
        })

    sw = grouped_aggregate_ds(
        ds.map_batches(wcounts, batch_format="pyarrow", batch_size=None),
        ["w", "is_train"], [("c", "sum", "c")], num_partitions=8)

    def membership(part: pa.Table) -> pa.Table:
        w = np.asarray(part["w"].combine_chunks()).astype("U")
        tr = np.asarray(part["is_train"].combine_chunks(), dtype=np.int64)
        c = np.asarray(part["c"].combine_chunks(), dtype=np.int64)
        order = np.lexsort((tr, w))
        w, tr, c = w[order], tr[order], c[order]
        # a held-out row is OOV iff no train row shares its word:
        # sorted by (word, is_train), a train twin is adjacent
        has_train_next = np.zeros(len(w), dtype=bool)
        if len(w) > 1:
            has_train_next[:-1] = (w[:-1] == w[1:]) & (tr[1:] == 1)
        held = tr == 0
        oov = held & ~has_train_next
        return pa.table({
            "oov_tokens": pa.array([int(c[oov].sum())], pa.int64()),
            "heldout_tokens": pa.array([int(c[held].sum())], pa.int64()),
            "oov_types": pa.array([int(oov.sum())], pa.int64()),
        })

    parts = partitioned_group_apply(sw, ["w"], membership,
                                    num_partitions=8).to_pandas()
    oov = int(parts["oov_tokens"].sum())
    held = int(parts["heldout_tokens"].sum())
    types = int(parts["oov_types"].sum())
    return pa.table({
        "oov_tokens": pa.array([oov], pa.int64()),
        "heldout_tokens": pa.array([held], pa.int64()),
        "oov_share_e5": pa.array(
            [100000 * oov // held if held else 0], pa.int64()),
        "oov_types": pa.array([types], pa.int64()),
    })


# --------------------------------------------------------------------------
# TPC-H Q18 shape: large-volume orders (HAVING on a high-cardinality group)
# --------------------------------------------------------------------------

@query(
    "orders_large_volume",
    """
WITH q AS (
  SELECT l_orderkey,
         CAST(SUM(CAST(FLOOR(l_quantity + 0.5) AS BIGINT)) AS BIGINT)
           AS total_qty
  FROM lineitem GROUP BY 1
  HAVING SUM(l_quantity) > 150
)
SELECT o.o_orderkey, c.c_custkey, c.c_name, q.total_qty,
       CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT) AS totalprice_e2
FROM q JOIN orders o ON q.l_orderkey = o.o_orderkey
       JOIN customer c ON o.o_custkey = c.c_custkey""",
)
def orders_large_volume(sf_dir: str):
    """Large-volume orders (TPC-H Q18 shape): orders whose total
    lineitem quantity exceeds a threshold, enriched with the customer.

    The HAVING sits on a HIGH-cardinality group (per orderkey), so the
    filter runs INSIDE the hash-partitioned reducers of the distributed
    combine — only qualifying orders (a few percent) ever reach the
    orders join, and the customer name attaches via the broadcast dim
    convention to that small survivor set. Quantities are quantized to
    int64 per row before the sum (integer-exact, order-independent)."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate_ds

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_quantity"])

    def qint(b: pa.Table) -> pa.Table:
        q = np.asarray(b["l_quantity"].combine_chunks(), dtype=np.float64)
        return pa.table({
            "l_orderkey": b["l_orderkey"],
            "q": pa.array(np.floor(q + 0.5).astype(np.int64)),
        })

    per_ord = grouped_aggregate_ds(
        li.map_batches(qint, batch_format="pyarrow", batch_size=None),
        ["l_orderkey"], [("q", "sum", "total_qty")], num_partitions=8)

    def keep(b: pa.Table) -> pa.Table:
        tq = np.asarray(b["total_qty"].combine_chunks()
                        if isinstance(b["total_qty"], pa.ChunkedArray)
                        else b["total_qty"], dtype=np.int64)
        return b.filter(pa.array(tq > 150))

    big = per_ord.map_batches(keep, batch_format="pyarrow",
                              batch_size=None)
    # Ray's hash-shuffle join crashes on a fully-empty side (its
    # aggregators drop schema'd empty blocks); an unmatchable sentinel
    # key keeps the side non-empty and vanishes in the inner join.
    big = rd.from_arrow(pa.table({
        "l_orderkey": pa.array([_JOIN_SENTINEL], pa.int64()),
        "total_qty": pa.array([0], pa.int64()),
    })).union(big)  # sentinel FIRST: the union's dataset-level schema
    # must come from the guaranteed-non-empty input (an all-empty
    # first input erases the schema the join plans against)
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey",
                                      "o_totalprice"])
    j = big.join(orders, join_type="inner", num_partitions=8,
                 on=("l_orderkey",), right_on=("o_orderkey",))

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_name"]).to_pandas()
    cname = dict(zip(cust["c_custkey"].astype(np.int64),
                     cust["c_name"]))
    c_ref = ray.put(cname) if ray.is_initialized() else cname

    def attach(b: pa.Table) -> pa.Table:
        cn = ray.get(c_ref) if ray.is_initialized() else c_ref
        ck = np.asarray(b["o_custkey"].combine_chunks()
                        if isinstance(b["o_custkey"], pa.ChunkedArray)
                        else b["o_custkey"], dtype=np.int64)
        price = np.asarray(b["o_totalprice"].combine_chunks()
                           if isinstance(b["o_totalprice"],
                                         pa.ChunkedArray)
                           else b["o_totalprice"], dtype=np.float64)
        return pa.table({
            "o_orderkey": b["l_orderkey"],
            "c_custkey": pa.array(ck),
            "c_name": pa.array([cn[k] for k in ck], pa.string()),
            "total_qty": b["total_qty"],
            "totalprice_e2": pa.array(
                np.floor(price * 100 + 0.5).astype(np.int64)),
        })

    return j.map_batches(attach, batch_format="pyarrow", batch_size=None)


# --------------------------------------------------------------------------
# TPC-H Q21 shape: suppliers who kept multi-supplier orders waiting
# --------------------------------------------------------------------------

@query(
    "suppliers_kept_waiting",
    """
WITH ls AS (
  SELECT l_orderkey, l_suppkey, MAX(l_shipdate) AS ms
  FROM lineitem GROUP BY 1, 2
), j AS (
  SELECT ls.l_orderkey, ls.l_suppkey,
         CASE WHEN ls.ms > o.o_orderdate + INTERVAL 60 DAY
              THEN 1 ELSE 0 END AS late
  FROM ls JOIN orders o ON ls.l_orderkey = o.o_orderkey
  WHERE o.o_orderstatus = 'F'
), per_ord AS (
  SELECT l_orderkey, COUNT(*) AS n_supp, SUM(late) AS n_late,
         MAX(CASE WHEN late = 1 THEN l_suppkey END) AS late_supp
  FROM j GROUP BY 1
)
SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM per_ord p JOIN supplier s ON p.late_supp = s.s_suppkey
WHERE p.n_supp >= 2 AND p.n_late = 1
GROUP BY 1""",
)
def suppliers_kept_waiting(sf_dir: str):
    """Suppliers who were the SOLE late supplier on a finished
    multi-supplier order (TPC-H Q21 shape; lateness = shipped more than
    60 days after the order date, the repo's Q4 convention since the
    fixture carries no commit/receipt dates).

    Q21's EXISTS / NOT-EXISTS pair compiles to ONE grouped pass: the
    fact first compresses to per-(order, supplier) MAX(ship-day) — far
    smaller than lineitem — then one hash join against the
    status-filtered orders projection marks each pair late/on-time, and
    a per-order combine carries (n_supp, n_late, argmax-late-supplier)
    so "some other supplier was also late" is just n_late = 1. The
    finish is supplier-bounded."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate, grouped_aggregate_ds

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_suppkey", "l_shipdate"])

    def lday(b: pa.Table) -> pa.Table:
        t = np.asarray(b["l_shipdate"].combine_chunks()).astype(
            "datetime64[D]").astype(np.int64)
        return pa.table({
            "l_orderkey": b["l_orderkey"],
            "l_suppkey": b["l_suppkey"],
            "ship_day": pa.array(t),
        })

    pairs = grouped_aggregate_ds(
        li.map_batches(lday, batch_format="pyarrow", batch_size=None),
        ["l_orderkey", "l_suppkey"], [("ship_day", "max", "max_ship")],
        num_partitions=8)

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderdate",
                                      "o_orderstatus"])

    def oday(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        b = b.filter(pc.equal(b["o_orderstatus"], "F"))
        t = np.asarray(b["o_orderdate"].combine_chunks()).astype(
            "datetime64[D]").astype(np.int64)
        return pa.table({
            "o_orderkey": b["o_orderkey"],
            "order_day": pa.array(t),
        })

    od = orders.map_batches(oday, batch_format="pyarrow",
                            batch_size=None)
    # sentinel rows: either side can be empty (no 'F' orders / empty
    # fact) and Ray's join crashes on a fully-empty side
    pairs = rd.from_arrow(pa.table({
        "l_orderkey": pa.array([_JOIN_SENTINEL], pa.int64()),
        "l_suppkey": pa.array([_JOIN_SENTINEL], pa.int64()),
        "max_ship": pa.array([0], pa.int64()),
    })).union(pairs)  # sentinel FIRST (schema source)
    od = rd.from_arrow(pa.table({
        "o_orderkey": pa.array([_JOIN_SENTINEL - 1], pa.int64()),
        "order_day": pa.array([0], pa.int64()),
    })).union(od)
    j = pairs.join(od, join_type="inner", num_partitions=8,
                   on=("l_orderkey",), right_on=("o_orderkey",))

    def flags(b: pa.Table) -> pa.Table:
        ms = np.asarray(b["max_ship"].combine_chunks()
                        if isinstance(b["max_ship"], pa.ChunkedArray)
                        else b["max_ship"], dtype=np.int64)
        od_ = np.asarray(b["order_day"].combine_chunks()
                         if isinstance(b["order_day"], pa.ChunkedArray)
                         else b["order_day"], dtype=np.int64)
        sup = np.asarray(b["l_suppkey"].combine_chunks()
                         if isinstance(b["l_suppkey"], pa.ChunkedArray)
                         else b["l_suppkey"], dtype=np.int64)
        late = (ms > od_ + 60).astype(np.int64)
        return pa.table({
            "l_orderkey": b["l_orderkey"],
            "one": pa.array(np.ones(len(late), dtype=np.int64)),
            "late": pa.array(late),
            # -1 sentinel < every suppkey: max() recovers the sole late
            # supplier exactly when n_late == 1 (the only rows kept)
            "lsupp": pa.array(np.where(late == 1, sup, -1)),
        })

    per_ord = grouped_aggregate_ds(
        j.map_batches(flags, batch_format="pyarrow", batch_size=None),
        ["l_orderkey"],
        [("one", "sum", "n_supp"), ("late", "sum", "n_late"),
         ("lsupp", "max", "late_supp")], num_partitions=8)

    def keep(b: pa.Table) -> pa.Table:
        ns = np.asarray(b["n_supp"].combine_chunks()
                        if isinstance(b["n_supp"], pa.ChunkedArray)
                        else b["n_supp"], dtype=np.int64)
        nl = np.asarray(b["n_late"].combine_chunks()
                        if isinstance(b["n_late"], pa.ChunkedArray)
                        else b["n_late"], dtype=np.int64)
        t = b.filter(pa.array((ns >= 2) & (nl == 1)))
        return pa.table({
            "late_supp": t["late_supp"],
            "one": pa.array(np.ones(len(t), dtype=np.int64)),
        })

    agg = grouped_aggregate(
        per_ord.map_batches(keep, batch_format="pyarrow",
                            batch_size=None),
        ["late_supp"], [("one", "sum", "numwait")])
    if "late_supp" not in agg.column_names:
        return pa.table({"s_name": pa.array([], pa.string()),
                         "numwait": pa.array([], pa.int64())})

    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_name"]).to_pandas()
    sname = dict(zip(supp["s_suppkey"].astype(np.int64), supp["s_name"]))
    sk = np.asarray(agg["late_supp"], dtype=np.int64)
    return pa.table({
        "s_name": pa.array([sname[k] for k in sk], pa.string()),
        "numwait": agg["numwait"],
    })


# --------------------------------------------------------------------------
# TPC-H Q8 shape: nation market share within a region, per year
# --------------------------------------------------------------------------

@query(
    "nation_market_share",
    """
WITH rev AS (
  SELECT l.l_orderkey,
         CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 10000 + 0.5)
              AS BIGINT) AS rev,
         CASE WHEN s.s_nationkey =
                   (SELECT n_nationkey FROM nation
                    WHERE n_name = 'NATION_2')
              THEN 1 ELSE 0 END AS is_t
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = 'ECONOMY'
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
), j AS (
  SELECT CAST(YEAR(o.o_orderdate) AS BIGINT) AS yr, rev, is_t
  FROM rev r JOIN orders o ON r.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region rg ON n.n_regionkey = rg.r_regionkey
  WHERE rg.r_name = 'ASIA'
)
SELECT yr, CAST(SUM(rev) AS BIGINT) AS revenue_e4,
       CAST(SUM(rev * is_t) AS BIGINT) AS nation_revenue_e4,
       (1000000 * CAST(SUM(rev * is_t) AS BIGINT))
         // CAST(SUM(rev) AS BIGINT) AS share_e6
FROM j GROUP BY 1""",
)
def nation_market_share(sf_dir: str):
    """NATION_2's share of ECONOMY-part revenue sold into ASIA per year
    (TPC-H Q8 shape): a six-table star where every table but the two
    facts is a broadcast dimension.

    The part-type predicate becomes a sorted-key membership bitmap
    applied INSIDE the lineitem scan (map-side semi-join — non-ECONOMY
    rows never leave the read task), the supplier nation collapses to a
    key-indexed lookup, and both revenue sums (total + target-nation)
    ride ONE per-orderkey combine so the single unavoidable hash join
    against orders carries two int64s per surviving order. Customer →
    nation → region folds to one custkey→in-ASIA bitmap driver-side;
    the finish is years-bounded."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate, grouped_aggregate_ds

    nat = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    reg = pq.read_table(f"{sf_dir}/region.parquet").to_pandas()
    asia_reg = int(reg.loc[reg["r_name"] == "ASIA", "r_regionkey"].iloc[0])
    asia_nats = set(nat.loc[nat["n_regionkey"] == asia_reg,
                            "n_nationkey"].astype(int))
    target_nat = int(nat.loc[nat["n_name"] == "NATION_2",
                             "n_nationkey"].iloc[0])

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_type"]).to_pandas()
    econ_keys = np.sort(part.loc[part["p_type"] == "ECONOMY",
                                 "p_partkey"].to_numpy(np.int64))
    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"]).to_pandas()
    sk = supp["s_suppkey"].to_numpy(np.int64)
    s_nat = np.zeros(int(sk.max()) + 1, dtype=np.int64)
    s_nat[sk] = supp["s_nationkey"].to_numpy(np.int64)
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"]).to_pandas()
    ck = cust["c_custkey"].to_numpy(np.int64)
    c_asia = np.zeros(int(ck.max()) + 1, dtype=bool)
    c_asia[ck] = cust["c_nationkey"].map(
        lambda n: int(n) in asia_nats).to_numpy()

    init = ray.is_initialized()
    e_ref = ray.put(econ_keys) if init else econ_keys
    s_ref = ray.put(s_nat) if init else s_nat
    c_ref = ray.put(c_asia) if init else c_asia

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey", "l_suppkey",
                                  "l_extendedprice", "l_discount"])

    def partial(b: pa.Table) -> pa.Table:
        ek = ray.get(e_ref) if init else e_ref
        sn = ray.get(s_ref) if init else s_ref
        pk = np.asarray(b["l_partkey"].combine_chunks(), dtype=np.int64)
        idx = np.searchsorted(ek, pk)
        idx[idx >= len(ek)] = 0
        keep = ek[idx] == pk if len(ek) else np.zeros(len(pk), bool)
        b = b.filter(pa.array(keep))
        price = np.asarray(b["l_extendedprice"].combine_chunks(),
                           dtype=np.float64)
        disc = np.asarray(b["l_discount"].combine_chunks(),
                          dtype=np.float64)
        rev = np.floor(price * (1 - disc) * 10000 + 0.5).astype(np.int64)
        sup = np.asarray(b["l_suppkey"].combine_chunks(), dtype=np.int64)
        is_t = (sn[sup] == target_nat).astype(np.int64)
        return pa.table({
            "l_orderkey": b["l_orderkey"],
            "rev": pa.array(rev),
            "rev_t": pa.array(rev * is_t),
        })

    per_ord = grouped_aggregate_ds(
        li.map_batches(partial, batch_format="pyarrow", batch_size=None),
        ["l_orderkey"],
        [("rev", "sum", "rev"), ("rev_t", "sum", "rev_t")],
        num_partitions=8)

    # sentinel keeps the survivor side non-empty (no ECONOMY rows ->
    # Ray join crash on a fully-empty side); vanishes in the inner join
    per_ord = rd.from_arrow(pa.table({
        "l_orderkey": pa.array([_JOIN_SENTINEL], pa.int64()),
        "rev": pa.array([0], pa.int64()),
        "rev_t": pa.array([0], pa.int64()),
    })).union(per_ord)  # sentinel FIRST (schema source)
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey",
                                      "o_orderdate"])
    j = per_ord.join(orders, join_type="inner", num_partitions=8,
                     on=("l_orderkey",), right_on=("o_orderkey",))

    def finishp(b: pa.Table) -> pa.Table:
        ca = ray.get(c_ref) if init else c_ref
        cu = np.asarray(b["o_custkey"].combine_chunks()
                        if isinstance(b["o_custkey"], pa.ChunkedArray)
                        else b["o_custkey"], dtype=np.int64)
        keep = ca[cu]
        b = b.filter(pa.array(keep))
        yr = np.asarray(b["o_orderdate"].combine_chunks()
                        if isinstance(b["o_orderdate"], pa.ChunkedArray)
                        else b["o_orderdate"]).astype(
            "datetime64[Y]").astype(np.int64) + 1970
        return pa.table({
            "yr": pa.array(yr),
            "rev": b["rev"],
            "rev_t": b["rev_t"],
        })

    a = grouped_aggregate(
        j.map_batches(finishp, batch_format="pyarrow", batch_size=None),
        ["yr"], [("rev", "sum", "revenue_e4"),
                 ("rev_t", "sum", "nation_revenue_e4")])
    if "yr" not in a.column_names:
        z = pa.array([], pa.int64())
        return pa.table({"yr": z, "revenue_e4": z,
                         "nation_revenue_e4": z, "share_e6": z})
    r = np.asarray(a["revenue_e4"], dtype=np.int64)
    rt = np.asarray(a["nation_revenue_e4"], dtype=np.int64)
    return pa.table({
        "yr": a["yr"],
        "revenue_e4": a["revenue_e4"],
        "nation_revenue_e4": a["nation_revenue_e4"],
        "share_e6": pa.array(1_000_000 * rt // r),
    })


# --------------------------------------------------------------------------
# TPC-H Q17 shape: small-quantity revenue vs the per-part average
# --------------------------------------------------------------------------

@query(
    "lineitem_small_qty_revenue",
    """
WITH pk AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#13'),
ag AS (
  SELECT l_partkey,
         CAST(SUM(CAST(FLOOR(l_quantity + 0.5) AS BIGINT)) AS BIGINT)
           AS sq,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM lineitem JOIN pk ON l_partkey = p_partkey GROUP BY 1
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT))
            AS BIGINT) AS revenue_e2
FROM lineitem l JOIN ag ON l.l_partkey = ag.l_partkey
WHERE 5 * CAST(FLOOR(l.l_quantity + 0.5) AS BIGINT) * ag.n < ag.sq""",
)
def lineitem_small_qty_revenue(sf_dir: str):
    """Revenue from Brand#13 lineitems whose quantity is below 20% of
    that part's average order quantity (TPC-H Q17 shape — the
    correlated scalar subquery).

    The correlation compiles to two passes with a broadcast between:
    pass 1 aggregates (sum_qty, n) per brand part — bounded by the
    brand's part count — and ships the pair as sorted key-aligned
    arrays via ``ray.put``; pass 2 re-scans lineitem with the same
    membership bitmap and keeps rows by the EXACT integer test
    5·qty·n < sum_qty (no float average, so the oracle comparison can
    never disagree on a boundary row). Nothing joins fact-to-fact."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand"]).to_pandas()
    bkeys = np.sort(part.loc[part["p_brand"] == "Brand#13",
                             "p_partkey"].to_numpy(np.int64))
    init = ray.is_initialized()
    b_ref = ray.put(bkeys) if init else bkeys

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_quantity",
                                  "l_extendedprice"])

    def member(b: pa.Table, keys: np.ndarray) -> pa.Table:
        pk = np.asarray(b["l_partkey"].combine_chunks(), dtype=np.int64)
        idx = np.searchsorted(keys, pk)
        idx[idx >= len(keys)] = 0
        keep = keys[idx] == pk if len(keys) else np.zeros(len(pk), bool)
        return b.filter(pa.array(keep))

    def qpart(b: pa.Table) -> pa.Table:
        bk = ray.get(b_ref) if init else b_ref
        b = member(b, bk)
        q = np.asarray(b["l_quantity"].combine_chunks(),
                       dtype=np.float64)
        return pa.table({
            "l_partkey": b["l_partkey"],
            "q": pa.array(np.floor(q + 0.5).astype(np.int64)),
            "one": pa.array(np.ones(len(b), dtype=np.int64)),
        })

    ag = grouped_aggregate(
        li.map_batches(qpart, batch_format="pyarrow", batch_size=None),
        ["l_partkey"], [("q", "sum", "sq"), ("one", "sum", "n")])
    if "l_partkey" not in ag.column_names:  # no brand rows at all
        return pa.table({
            "n_rows": pa.array([0], pa.int64()),
            "revenue_e2": pa.array([0], pa.int64()),
        })
    akeys = np.asarray(ag["l_partkey"], dtype=np.int64)
    order = np.argsort(akeys)
    akeys = akeys[order]
    asq = np.asarray(ag["sq"], dtype=np.int64)[order]
    an = np.asarray(ag["n"], dtype=np.int64)[order]
    a_ref = ray.put((akeys, asq, an)) if init else (akeys, asq, an)

    def small(b: pa.Table) -> pa.Table:
        ks, sq, n = ray.get(a_ref) if init else a_ref
        b = member(b, ks)
        pk = np.asarray(b["l_partkey"].combine_chunks(), dtype=np.int64)
        q = np.floor(np.asarray(b["l_quantity"].combine_chunks(),
                                dtype=np.float64) + 0.5).astype(np.int64)
        price = np.asarray(b["l_extendedprice"].combine_chunks(),
                           dtype=np.float64)
        pos = np.searchsorted(ks, pk)
        keep = 5 * q * n[pos] < sq[pos]
        pe2 = np.floor(price * 100 + 0.5).astype(np.int64)
        return pa.table({
            "n_rows": pa.array([int(keep.sum())], pa.int64()),
            "revenue_e2": pa.array([int(pe2[keep].sum())], pa.int64()),
        })

    parts = li.map_batches(small, batch_format="pyarrow",
                           batch_size=None).to_pandas()
    return pa.table({
        "n_rows": pa.array([int(parts["n_rows"].sum())], pa.int64()),
        "revenue_e2": pa.array([int(parts["revenue_e2"].sum())],
                               pa.int64()),
    })


# --------------------------------------------------------------------------
# TPC-H Q22 shape: sales opportunity (global-avg filter + anti-join)
# --------------------------------------------------------------------------

@query(
    "customers_sales_opportunity",
    """
WITH bal AS (
  SELECT c_custkey, c_nationkey,
         CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_e2
  FROM customer
), pos AS (
  SELECT CAST(SUM(bal_e2) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS n
  FROM bal WHERE bal_e2 > 0
), cand AS (
  SELECT c_custkey, c_nationkey, bal_e2
  FROM bal, pos WHERE bal_e2 * pos.n > pos.s
)
SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_cust,
       CAST(SUM(CASE WHEN o.o_custkey IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_inactive,
       CAST(SUM(bal_e2) AS BIGINT) AS sum_bal_e2
FROM cand LEFT JOIN (SELECT DISTINCT o_custkey FROM orders) o
  ON cand.c_custkey = o.o_custkey
GROUP BY 1""",
)
def customers_sales_opportunity(sf_dir: str):
    """Above-average-balance customers per nation, with how many of
    them have never ordered (TPC-H Q22 shape; the NOT-EXISTS kept as a
    reported flag rather than a filter so the result carries signal on
    fixtures where every rich customer is active).

    Two distinct sub-shapes compose: the global scalar (sum, n of
    positive balances) broadcasts into the candidate filter as the
    EXACT integer test bal·n > sum (no float average), and the NOT
    EXISTS compiles to orders → per-custkey distinct (custkey-bounded,
    built in the hash-partitioned combine) → LEFT join → null marker.
    The finish is nations-bounded."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate, grouped_aggregate_ds

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey",
                                  "c_acctbal"]).to_pandas()
    bal = np.floor(cust["c_acctbal"].to_numpy(np.float64) * 100
                   + 0.5).astype(np.int64)
    pos = bal[bal > 0]
    s, n = int(pos.sum()), len(pos)
    keep = bal * n > s
    cand = pa.table({
        "c_custkey": pa.array(cust["c_custkey"].to_numpy(np.int64)[keep]),
        "c_nationkey": pa.array(
            cust["c_nationkey"].to_numpy(np.int64)[keep]),
        "bal_e2": pa.array(bal[keep]),
    })

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey"])

    def ones(b: pa.Table) -> pa.Table:
        return pa.table({
            "o_custkey": b["o_custkey"],
            "one": pa.array(np.ones(len(b), dtype=np.int64)),
        })

    has_ord = grouped_aggregate_ds(
        orders.map_batches(ones, batch_format="pyarrow", batch_size=None),
        ["o_custkey"], [("one", "max", "has")], num_partitions=8)

    # sentinel rows on both sides (either can be empty; the cand
    # sentinel survives the LEFT join and is dropped inside flag())
    cand = pa.concat_tables([cand, pa.table({
        "c_custkey": pa.array([_JOIN_SENTINEL], pa.int64()),
        "c_nationkey": pa.array([0], pa.int64()),
        "bal_e2": pa.array([0], pa.int64()),
    })])
    has_sent = rd.from_arrow(pa.table({
        "o_custkey": pa.array([_JOIN_SENTINEL - 1], pa.int64()),
        "has": pa.array([1], pa.int64()),
    }))
    cand_ds = rd.from_arrow(cand)
    j = cand_ds.join(has_sent.union(has_ord), join_type="left_outer",
                     num_partitions=8,
                     on=("c_custkey",), right_on=("o_custkey",))

    def flag(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ck = np.asarray(b["c_custkey"].combine_chunks()
                        if isinstance(b["c_custkey"], pa.ChunkedArray)
                        else b["c_custkey"], dtype=np.int64)
        b = b.filter(pa.array(ck != _JOIN_SENTINEL))
        inactive = pc.cast(pc.is_null(b["has"]), pa.int64())
        return pa.table({
            "c_nationkey": b["c_nationkey"],
            "one": pa.array(np.ones(len(b), dtype=np.int64)),
            "inactive": inactive,
            "bal_e2": b["bal_e2"],
        })

    out = grouped_aggregate(
        j.map_batches(flag, batch_format="pyarrow", batch_size=None),
        ["c_nationkey"],
        [("one", "sum", "n_cust"), ("inactive", "sum", "n_inactive"),
         ("bal_e2", "sum", "sum_bal_e2")])
    if "c_nationkey" not in out.column_names:
        return pa.table({
            "c_nationkey": pa.array([], pa.int64()),
            "n_cust": pa.array([], pa.int64()),
            "n_inactive": pa.array([], pa.int64()),
            "sum_bal_e2": pa.array([], pa.int64()),
        })
    return out


# --------------------------------------------------------------------------
# TPC-H Q15 shape: top supplier(s) by windowed revenue, ties kept
# --------------------------------------------------------------------------

@query(
    "top_supplier_revenue",
    """
WITH r AS (
  SELECT l_suppkey,
         CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000
                             + 0.5) AS BIGINT)) AS BIGINT)
           AS total_revenue_e4
  FROM lineitem
  WHERE l_shipdate >= DATE '1996-01-01'
    AND l_shipdate < DATE '1996-04-01'
  GROUP BY 1
)
SELECT s.s_suppkey, s.s_name, r.total_revenue_e4
FROM r JOIN supplier s ON r.l_suppkey = s.s_suppkey
WHERE r.total_revenue_e4 = (SELECT MAX(total_revenue_e4) FROM r)""",
)
def top_supplier_revenue(sf_dir: str):
    """Supplier(s) with the maximum revenue in 1996-Q1 (TPC-H Q15
    shape): the view-vs-max pattern, ties ALL kept — the argmax runs
    against a scalar computed from the same supplier-bounded aggregate,
    not a second scan. Per-row e4 quantization keeps the tie comparison
    exact."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_suppkey", "l_extendedprice",
                                  "l_discount", "l_shipdate"])
    lo = np.datetime64("1996-01-01")
    hi = np.datetime64("1996-04-01")

    def partial(b: pa.Table) -> pa.Table:
        d = np.asarray(b["l_shipdate"].combine_chunks()).astype(
            "datetime64[D]")
        b = b.filter(pa.array((d >= lo) & (d < hi)))
        price = np.asarray(b["l_extendedprice"].combine_chunks(),
                           dtype=np.float64)
        disc = np.asarray(b["l_discount"].combine_chunks(),
                          dtype=np.float64)
        return pa.table({
            "l_suppkey": b["l_suppkey"],
            "rev": pa.array(np.floor(price * (1 - disc) * 10000
                                     + 0.5).astype(np.int64)),
        })

    agg = grouped_aggregate(
        li.map_batches(partial, batch_format="pyarrow", batch_size=None),
        ["l_suppkey"], [("rev", "sum", "total_revenue_e4")])
    if "l_suppkey" not in agg.column_names:
        return pa.table({
            "s_suppkey": pa.array([], pa.int64()),
            "s_name": pa.array([], pa.string()),
            "total_revenue_e4": pa.array([], pa.int64()),
        })
    rev = np.asarray(agg["total_revenue_e4"], dtype=np.int64)
    sk = np.asarray(agg["l_suppkey"], dtype=np.int64)
    top = rev == rev.max()
    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_name"]).to_pandas()
    sname = dict(zip(supp["s_suppkey"].astype(np.int64),
                     supp["s_name"]))
    return pa.table({
        "s_suppkey": pa.array(sk[top]),
        "s_name": pa.array([sname[k] for k in sk[top]], pa.string()),
        "total_revenue_e4": pa.array(rev[top]),
    })


# --------------------------------------------------------------------------
# TPC-H Q5 shape: local supplier volume (supplier nation == customer nation)
# --------------------------------------------------------------------------

@query(
    "orders_q5_local_volume",
    """
WITH ln AS (
  SELECT l_orderkey, s.s_nationkey AS snk,
         SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000 + 0.5)
                  AS BIGINT)) AS rev
  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY 1, 2
), oc AS (
  SELECT o_orderkey, c.c_nationkey AS cnk
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
)
SELECT n.n_name AS nation, CAST(SUM(ln.rev) AS BIGINT) AS revenue_e4
FROM ln JOIN oc ON ln.l_orderkey = oc.o_orderkey
JOIN nation n ON ln.snk = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE ln.snk = oc.cnk AND r.r_name = 'ASIA'
GROUP BY 1""",
)
def orders_q5_local_volume(sf_dir: str):
    """Revenue earned in ASIA where the supplying and ordering nations
    coincide (TPC-H Q5 shape) — the "local supplier volume" report.

    Physical plan: supplier→nationkey and customer→nationkey collapse to
    broadcast lookup arrays (dimension chains, Q7/Q8 convention — at true
    TPC-H scale customer would instead ride the same hash join the fact
    uses; the lookup keeps ONE data-sized exchange here). The fact side
    shrinks first: lineitem pre-aggregates to (orderkey, supp_nationkey)
    revenue partials via the hash-partitioned combine, THEN one native
    hash join against orders' (orderkey, custkey) projection, and the
    nation-equality + region filters run on the joined key-bounded rows.
    Exchange: orderkey-bounded partials + one orderkey hash join;
    finish is nations-bounded."""
    import numpy as np
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate, grouped_aggregate_ds, seed_join_side

    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"]).to_pandas()
    sk = supp["s_suppkey"].to_numpy(dtype=np.int64)
    snk = np.full(int(sk.max()) + 1 if len(sk) else 1, -1, dtype=np.int32)
    snk[sk] = supp["s_nationkey"].to_numpy(dtype=np.int32)

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"]).to_pandas()
    ck = cust["c_custkey"].to_numpy(dtype=np.int64)
    cnk = np.full(int(ck.max()) + 1 if len(ck) else 1, -1, dtype=np.int32)
    cnk[ck] = cust["c_nationkey"].to_numpy(dtype=np.int32)

    nat = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    reg = pq.read_table(f"{sf_dir}/region.parquet").to_pandas()
    asia = set(reg.loc[reg["r_name"] == "ASIA", "r_regionkey"].astype(int))
    nk_in_asia = np.zeros(int(nat["n_nationkey"].max()) + 1, dtype=bool)
    for _, r in nat.iterrows():
        if int(r["n_regionkey"]) in asia:
            nk_in_asia[int(r["n_nationkey"])] = True
    nname = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))

    snk_ref = ray.put(snk) if ray.is_initialized() else snk
    cnk_ref = ray.put(cnk) if ray.is_initialized() else cnk

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_suppkey",
                                  "l_extendedprice", "l_discount"])

    def partial(b: pa.Table) -> pa.Table:
        snk_ = ray.get(snk_ref) if ray.is_initialized() else snk_ref
        price = np.asarray(b["l_extendedprice"].combine_chunks(),
                           dtype=np.float64)
        disc = np.asarray(b["l_discount"].combine_chunks(), dtype=np.float64)
        rev = np.floor(price * (1 - disc) * 10000 + 0.5).astype(np.int64)
        suppk = np.asarray(b["l_suppkey"].combine_chunks(), dtype=np.int64)
        return pa.table({
            "l_orderkey": b["l_orderkey"],
            "snk": pa.array(snk_[suppk].astype(np.int64)),
            "rev": pa.array(rev),
        })

    ln = grouped_aggregate_ds(
        li.map_batches(partial, batch_format="pyarrow", batch_size=None),
        ["l_orderkey", "snk"], [("rev", "sum", "rev")], num_partitions=8)
    ln = seed_join_side(ln, pa.table({
        "l_orderkey": pa.array([_JOIN_SENTINEL], pa.int64()),
        "snk": pa.array([-1], pa.int64()),
        "rev": pa.array([0], pa.int64()),
    }))
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])
    j = ln.join(orders, join_type="inner", num_partitions=8,
                on=("l_orderkey",), right_on=("o_orderkey",))

    def local_asia(b: pa.Table) -> pa.Table:
        cnk_ = ray.get(cnk_ref) if ray.is_initialized() else cnk_ref
        snk_v = np.asarray(b["snk"].combine_chunks(), dtype=np.int64)
        custk = np.asarray(b["o_custkey"].combine_chunks(), dtype=np.int64)
        keep = (snk_v >= 0) & (cnk_[custk].astype(np.int64) == snk_v) \
            & nk_in_asia[np.clip(snk_v, 0, len(nk_in_asia) - 1)]
        return pa.table({
            "snk": pa.array(snk_v[keep]),
            "rev": pa.array(np.asarray(b["rev"].combine_chunks(),
                                       dtype=np.int64)[keep]),
        })

    agg = grouped_aggregate(
        j.map_batches(local_asia, batch_format="pyarrow", batch_size=None),
        ["snk"], [("rev", "sum", "revenue_e4")])
    if "snk" not in agg.column_names or agg.num_rows == 0:
        return pa.table({"nation": pa.array([], pa.string()),
                         "revenue_e4": pa.array([], pa.int64())})
    nk = np.asarray(agg["snk"], dtype=np.int64)
    return pa.table({
        "nation": pa.array([nname[int(k)] for k in nk], pa.string()),
        "revenue_e4": agg["revenue_e4"],
    })


# --------------------------------------------------------------------------
# TPC-H Q9 shape: product-line profit by supplier nation and year
# --------------------------------------------------------------------------

@query(
    "lineitem_q9_profit_by_nation",
    """
SELECT n.n_name AS nation,
       CAST(strftime(l.l_shipdate, '%Y') AS BIGINT) AS year,
       CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 10000
                           + 0.5) AS BIGINT)
                - CAST(l.l_quantity AS BIGINT)
                  * CAST(FLOOR(p.p_retailprice * 0.6 * 10000 + 0.5)
                         AS BIGINT)) AS BIGINT) AS profit_e4
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE p.p_name LIKE '%widget%'
GROUP BY 1, 2""",
)
def lineitem_q9_profit_by_nation(sf_dir: str):
    """Profit on 'widget' parts by supplier nation × ship year (TPC-H Q9
    shape, adapted: the fixture has no partsupp, so unit cost is the
    deterministic 0.6 × p_retailprice fixed-point stand-in).

    part (name-match bitmap + cost_e4 array) and supplier→nation chains
    are broadcast dimensions probed inside the ONE lineitem scan
    (map-side star join, Q8 convention); profit is quantized to exact
    1e-4 integers per row before summation so partials combine
    bit-exactly in any order. Exchange: (nations × years)-bounded
    partial rows only."""
    import numpy as np
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_name",
                                  "p_retailprice"]).to_pandas()
    pk = part["p_partkey"].to_numpy(dtype=np.int64)
    match = np.zeros(int(pk.max()) + 1 if len(pk) else 1, dtype=bool)
    cost = np.zeros(len(match), dtype=np.int64)
    is_w = part["p_name"].str.contains("widget", regex=False).to_numpy()
    match[pk[is_w]] = True
    cost[pk] = np.floor(
        part["p_retailprice"].to_numpy(dtype=np.float64) * 0.6 * 10000 + 0.5
    ).astype(np.int64)

    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"]).to_pandas()
    sk = supp["s_suppkey"].to_numpy(dtype=np.int64)
    snk = np.full(int(sk.max()) + 1 if len(sk) else 1, -1, dtype=np.int32)
    snk[sk] = supp["s_nationkey"].to_numpy(dtype=np.int32)
    nat = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    nname = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))

    refs = (ray.put(match), ray.put(cost), ray.put(snk)) \
        if ray.is_initialized() else (match, cost, snk)

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_suppkey", "l_quantity",
                                  "l_extendedprice", "l_discount",
                                  "l_shipdate"])

    def partial(b: pa.Table) -> pa.Table:
        match_, cost_, snk_ = (
            tuple(ray.get(r) for r in refs) if ray.is_initialized() else refs
        )
        partk = np.asarray(b["l_partkey"].combine_chunks(), dtype=np.int64)
        keep = match_[partk]
        b = b.filter(pa.array(keep))
        if b.num_rows == 0:
            return pa.table({"snk": pa.array([], pa.int64()),
                             "year": pa.array([], pa.int64()),
                             "profit": pa.array([], pa.int64())})
        partk = partk[keep]
        price = np.asarray(b["l_extendedprice"].combine_chunks(),
                           dtype=np.float64)
        disc = np.asarray(b["l_discount"].combine_chunks(), dtype=np.float64)
        qty = np.asarray(b["l_quantity"].combine_chunks(),
                         dtype=np.float64).astype(np.int64)
        rev = np.floor(price * (1 - disc) * 10000 + 0.5).astype(np.int64)
        profit = rev - qty * cost_[partk]
        suppk = np.asarray(b["l_suppkey"].combine_chunks(), dtype=np.int64)
        year = pc.cast(pc.strftime(b["l_shipdate"], format="%Y"), pa.int64())
        return pa.table({
            "snk": pa.array(snk_[suppk].astype(np.int64)),
            "year": year,
            "profit": pa.array(profit),
        })

    agg = grouped_aggregate(
        li.map_batches(partial, batch_format="pyarrow", batch_size=None),
        ["snk", "year"], [("profit", "sum", "profit_e4")])
    if "snk" not in agg.column_names or agg.num_rows == 0:
        return pa.table({"nation": pa.array([], pa.string()),
                         "year": pa.array([], pa.int64()),
                         "profit_e4": pa.array([], pa.int64())})
    nk = np.asarray(agg["snk"], dtype=np.int64)
    return pa.table({
        "nation": pa.array([nname[int(k)] for k in nk], pa.string()),
        "year": agg["year"],
        "profit_e4": agg["profit_e4"],
    })


# --------------------------------------------------------------------------
# TPC-H Q16 shape: supplier variety per (brand, type, size)
# --------------------------------------------------------------------------

@query(
    "part_q16_supplier_variety",
    """
SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size,
       CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#13' AND p.p_type <> 'PROMO'
  AND p.p_size IN (1, 4, 9, 14, 19, 24, 29, 34, 39, 44)
  AND l.l_suppkey NOT IN
      (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3""",
)
def part_q16_supplier_variety(sf_dir: str):
    """How many distinct suppliers ship each qualifying (brand, type,
    size) part family (TPC-H Q16 shape, adapted: lineitem stands in for
    partsupp; the NOT-IN "complaints" exclusion becomes the
    negative-acctbal supplier set).

    Both predicates collapse to broadcast bitmaps (partkey→group-id,
    suppkey→excluded). Each batch emits its DISTINCT (group, supplier)
    pairs via one np.unique on a packed uint64 key — so the exchange
    carries per-batch-distinct pairs, not raw lineitems — then the
    hash-partitioned distinct-combine dedups across batches and the
    groups-bounded COUNT finishes driver-side."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate, grouped_aggregate_ds

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand", "p_type",
                                  "p_size"]).to_pandas()
    sizes = {1, 4, 9, 14, 19, 24, 29, 34, 39, 44}
    ok = ((part["p_brand"] != "Brand#13") & (part["p_type"] != "PROMO")
          & part["p_size"].isin(sizes)).to_numpy()
    qual = part.loc[ok]
    # group = distinct (brand, type, size) combo — many partkeys share one
    kept = (qual[["p_brand", "p_type", "p_size"]]
            .drop_duplicates().reset_index(drop=True))
    combo_ix = {t: i for i, t in enumerate(
        zip(kept["p_brand"], kept["p_type"], kept["p_size"]))}
    pk = part["p_partkey"].to_numpy(dtype=np.int64)
    gid = np.full(int(pk.max()) + 1 if len(pk) else 1, -1, dtype=np.int32)
    gid[qual["p_partkey"].to_numpy(dtype=np.int64)] = np.fromiter(
        (combo_ix[t] for t in zip(qual["p_brand"], qual["p_type"],
                                  qual["p_size"])),
        dtype=np.int32, count=len(qual))

    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_acctbal"]).to_pandas()
    sk = supp["s_suppkey"].to_numpy(dtype=np.int64)
    bad = np.zeros(int(sk.max()) + 1 if len(sk) else 1, dtype=bool)
    bad[sk[supp["s_acctbal"].to_numpy() < 0]] = True

    refs = (ray.put(gid), ray.put(bad)) if ray.is_initialized() \
        else (gid, bad)

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_suppkey"])

    def pairs(b: pa.Table) -> pa.Table:
        gid_, bad_ = (tuple(ray.get(r) for r in refs)
                      if ray.is_initialized() else refs)
        partk = np.asarray(b["l_partkey"].combine_chunks(), dtype=np.int64)
        suppk = np.asarray(b["l_suppkey"].combine_chunks(), dtype=np.int64)
        g = gid_[partk].astype(np.int64)
        keep = (g >= 0) & ~bad_[suppk]
        # pack (group, supplier) into one uint64 for a single np.unique
        packed = np.unique((g[keep].astype(np.uint64) << np.uint64(32))
                           | suppk[keep].astype(np.uint64))
        return pa.table({
            "gid": pa.array((packed >> np.uint64(32)).astype(np.int64)),
            "suppkey": pa.array(
                (packed & np.uint64(0xFFFFFFFF)).astype(np.int64)),
        })

    distinct = grouped_aggregate_ds(
        li.map_batches(pairs, batch_format="pyarrow", batch_size=None),
        ["gid", "suppkey"], [("suppkey", "count", "c")], num_partitions=8)
    agg = grouped_aggregate(distinct, ["gid"],
                            [("suppkey", "count", "supplier_cnt")])
    if "gid" not in agg.column_names or agg.num_rows == 0:
        return pa.table({"p_brand": pa.array([], pa.string()),
                         "p_type": pa.array([], pa.string()),
                         "p_size": pa.array([], pa.int64()),
                         "supplier_cnt": pa.array([], pa.int64())})
    g = np.asarray(agg["gid"], dtype=np.int64)
    return pa.table({
        "p_brand": pa.array(kept["p_brand"].to_numpy()[g], pa.string()),
        "p_type": pa.array(kept["p_type"].to_numpy()[g], pa.string()),
        "p_size": pa.array(kept["p_size"].to_numpy(dtype=np.int64)[g]),
        "supplier_cnt": agg["supplier_cnt"],
    })


# --------------------------------------------------------------------------
# TPC-H Q19 shape: OR-of-ANDs band revenue
# --------------------------------------------------------------------------

@query(
    "lineitem_q19_band_revenue",
    """
SELECT CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 10000
                           + 0.5) AS BIGINT)) AS BIGINT) AS revenue_e4,
       CAST(COUNT(*) AS BIGINT) AS matched_rows
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#4'  AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#15' AND p.p_size BETWEEN 1 AND 25
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 35
       AND l.l_quantity BETWEEN 20 AND 30)""",
)
def lineitem_q19_band_revenue(sf_dir: str):
    """Discounted revenue under an OR-of-ANDs predicate spanning both a
    dimension (brand, size) and the fact (quantity) — TPC-H Q19's
    "disjunctive band" shape that defeats naive predicate pushdown.

    The dimension half of each disjunct collapses to a partkey→band-mask
    byte (bit i set = part satisfies disjunct i's brand+size clause),
    broadcast once; each batch then evaluates only the fact half and
    ANDs it bitwise — one vectorized pass, no join, no row expansion.
    Exchange: one (revenue, count) partial per block."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand",
                                  "p_size"]).to_pandas()
    pk = part["p_partkey"].to_numpy(dtype=np.int64)
    brand = part["p_brand"].to_numpy()
    size = part["p_size"].to_numpy(dtype=np.int64)
    bands = [("Brand#4", 1, 15, 1, 11), ("Brand#15", 1, 25, 10, 20),
             ("Brand#23", 1, 35, 20, 30)]
    mask = np.zeros(int(pk.max()) + 1 if len(pk) else 1, dtype=np.uint8)
    for i, (b_, lo, hi, _, _) in enumerate(bands):
        sel = (brand == b_) & (size >= lo) & (size <= hi)
        mask[pk[sel]] |= np.uint8(1 << i)
    qlo = np.array([b[3] for b in bands], dtype=np.int64)
    qhi = np.array([b[4] for b in bands], dtype=np.int64)
    ref = ray.put(mask) if ray.is_initialized() else mask

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_quantity",
                                  "l_extendedprice", "l_discount"])

    def partial(b: pa.Table) -> pa.Table:
        mask_ = ray.get(ref) if ray.is_initialized() else ref
        partk = np.asarray(b["l_partkey"].combine_chunks(), dtype=np.int64)
        m = mask_[partk]
        qty = np.asarray(b["l_quantity"].combine_chunks(),
                         dtype=np.float64).astype(np.int64)
        hit = np.zeros(len(qty), dtype=bool)
        for i in range(len(qlo)):
            hit |= ((m & np.uint8(1 << i)) != 0) \
                & (qty >= qlo[i]) & (qty <= qhi[i])
        price = np.asarray(b["l_extendedprice"].combine_chunks(),
                           dtype=np.float64)[hit]
        disc = np.asarray(b["l_discount"].combine_chunks(),
                          dtype=np.float64)[hit]
        rev = np.floor(price * (1 - disc) * 10000 + 0.5).astype(np.int64)
        return pa.table({
            "k": pa.array([0], pa.int64()),
            "rev": pa.array([int(rev.sum())], pa.int64()),
            "n": pa.array([int(hit.sum())], pa.int64()),
        })

    agg = grouped_aggregate(
        li.map_batches(partial, batch_format="pyarrow", batch_size=None),
        ["k"], [("rev", "sum", "revenue_e4"), ("n", "sum", "matched_rows")])
    return pa.table({
        "revenue_e4": agg["revenue_e4"],
        "matched_rows": agg["matched_rows"],
    })


# --------------------------------------------------------------------------
# TPC-H Q2 shape: cheapest-supplier argmin per part
# --------------------------------------------------------------------------

@query(
    "part_q2_min_supplier",
    """
WITH ps AS (
  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
), a AS (
  SELECT ps.l_partkey, s.s_nationkey,
         ROW_NUMBER() OVER (PARTITION BY ps.l_partkey
                            ORDER BY s.s_acctbal, ps.l_suppkey) AS rk
  FROM ps JOIN supplier s ON ps.l_suppkey = s.s_suppkey
)
SELECT n.n_name AS nation, CAST(COUNT(*) AS BIGINT) AS parts_won
FROM a JOIN nation n ON a.s_nationkey = n.n_nationkey
WHERE rk = 1 GROUP BY 1""",
)
def part_q2_min_supplier(sf_dir: str):
    """Which nation's suppliers win the "cheapest supplier per part"
    argmin (TPC-H Q2's correlated-min shape, adapted: lineitem's
    observed (part, supplier) pairs stand in for partsupp and acctbal
    for supplycost).

    The distributed argmin needs NO window function: acctbal quantizes
    to exact cents and packs with the supplier key into ONE int64
    ((cents + bias) << 24 | suppkey), so per-partkey MIN of that packed
    key IS the lexicographic (acctbal, suppkey) argmin — a plain
    hash-partitioned min-combine. Per-batch distinct pair compression
    bounds the exchange by observed pairs, and the winner decode +
    nation rollup run on key-bounded rows."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate, grouped_aggregate_ds

    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_acctbal",
                                  "s_nationkey"]).to_pandas()
    sk = supp["s_suppkey"].to_numpy(dtype=np.int64)
    cents = np.zeros(int(sk.max()) + 1 if len(sk) else 1, dtype=np.int64)
    cents[sk] = np.floor(
        supp["s_acctbal"].to_numpy(dtype=np.float64) * 100 + 0.5
    ).astype(np.int64)
    snk = np.full(len(cents), -1, dtype=np.int64)
    snk[sk] = supp["s_nationkey"].to_numpy(dtype=np.int64)
    nat = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    nname = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))
    ref = ray.put(cents) if ray.is_initialized() else cents

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_suppkey"])
    BIAS = 1 << 21  # acctbal cents ∈ [-82k, 996k] — bias keeps it ≥ 0

    def pairs(b: pa.Table) -> pa.Table:
        cents_ = ray.get(ref) if ray.is_initialized() else ref
        partk = np.asarray(b["l_partkey"].combine_chunks(), dtype=np.int64)
        suppk = np.asarray(b["l_suppkey"].combine_chunks(), dtype=np.int64)
        packed = np.unique((partk.astype(np.uint64) << np.uint64(24))
                           | suppk.astype(np.uint64))
        pk = (packed >> np.uint64(24)).astype(np.int64)
        sk_ = (packed & np.uint64(0xFFFFFF)).astype(np.int64)
        key = ((cents_[sk_] + BIAS) << 24) | sk_
        return pa.table({"l_partkey": pa.array(pk),
                         "key": pa.array(key)})

    win = grouped_aggregate_ds(
        li.map_batches(pairs, batch_format="pyarrow", batch_size=None),
        ["l_partkey"], [("key", "min", "key")], num_partitions=8)

    def decode(b: pa.Table) -> pa.Table:
        key = np.asarray(b["key"].combine_chunks(), dtype=np.int64)
        suppk = key & ((1 << 24) - 1)
        return pa.table({"snk": pa.array(snk[suppk]),
                         "one": pa.array(np.ones(len(key), np.int64))})

    agg = grouped_aggregate(
        win.map_batches(decode, batch_format="pyarrow", batch_size=None),
        ["snk"], [("one", "sum", "parts_won")])
    if "snk" not in agg.column_names or agg.num_rows == 0:
        return pa.table({"nation": pa.array([], pa.string()),
                         "parts_won": pa.array([], pa.int64())})
    nk = np.asarray(agg["snk"], dtype=np.int64)
    return pa.table({
        "nation": pa.array([nname[int(k)] for k in nk], pa.string()),
        "parts_won": agg["parts_won"],
    })


# --------------------------------------------------------------------------
# TPC-H Q20 shape: suppliers shipping an outsized share of a product line
# --------------------------------------------------------------------------

@query(
    "supplier_q20_excess",
    """
WITH w AS (
  SELECT l.l_suppkey, CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT)
           AS widget_qty
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE p.p_name LIKE '%widget%'
  GROUP BY 1
), t AS (
  SELECT CAST(SUM(widget_qty) AS BIGINT) AS total,
         CAST(COUNT(*) AS BIGINT) AS n FROM w
)
SELECT w.l_suppkey AS s_suppkey, s.s_name, w.widget_qty
FROM w JOIN supplier s ON w.l_suppkey = s.s_suppkey CROSS JOIN t
WHERE w.widget_qty * t.n > t.total""",
)
def supplier_q20_excess(sf_dir: str):
    """Suppliers shipping strictly more than the mean 'widget' volume —
    TPC-H Q20's semi-join-against-an-aggregate-threshold shape (no
    partsupp in the fixture: shipped quantity stands in for availqty).

    The part-name predicate is a broadcast bitmap inside the one
    lineitem pass; per-supplier quantities are a suppliers-bounded
    aggregate; the threshold test is restated integer-exact
    (qty·n > total — no float division anywhere); names attach
    driver-side to the qualifying handful."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_name"]).to_pandas()
    pk = part["p_partkey"].to_numpy(dtype=np.int64)
    match = np.zeros(int(pk.max()) + 1 if len(pk) else 1, dtype=bool)
    match[pk[part["p_name"].str.contains("widget", regex=False)
             .to_numpy()]] = True
    ref = ray.put(match) if ray.is_initialized() else match

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_suppkey", "l_quantity"])

    def partial(b: pa.Table) -> pa.Table:
        match_ = ray.get(ref) if ray.is_initialized() else ref
        partk = np.asarray(b["l_partkey"].combine_chunks(), dtype=np.int64)
        keep = match_[partk]
        suppk = np.asarray(b["l_suppkey"].combine_chunks(),
                           dtype=np.int64)[keep]
        qty = np.asarray(b["l_quantity"].combine_chunks(),
                         dtype=np.float64)[keep].astype(np.int64)
        return pa.table({"s_suppkey": pa.array(suppk),
                         "qty": pa.array(qty)})

    agg = grouped_aggregate(
        li.map_batches(partial, batch_format="pyarrow", batch_size=None),
        ["s_suppkey"], [("qty", "sum", "widget_qty")])
    if "s_suppkey" not in agg.column_names or agg.num_rows == 0:
        return pa.table({"s_suppkey": pa.array([], pa.int64()),
                         "s_name": pa.array([], pa.string()),
                         "widget_qty": pa.array([], pa.int64())})
    sk_ = np.asarray(agg["s_suppkey"], dtype=np.int64)
    qty = np.asarray(agg["widget_qty"], dtype=np.int64)
    total, n = int(qty.sum()), len(qty)
    keep = qty * n > total
    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_name"]).to_pandas()
    names = dict(zip(supp["s_suppkey"].astype(np.int64), supp["s_name"]))
    return pa.table({
        "s_suppkey": pa.array(sk_[keep]),
        "s_name": pa.array([names[k] for k in sk_[keep]], pa.string()),
        "widget_qty": pa.array(qty[keep]),
    })


# --------------------------------------------------------------------------
# TPC-H Q12 shape: shipmode vs order priority
# --------------------------------------------------------------------------

@query(
    "lineitem_q12_shipmode",
    """
WITH l AS (
  SELECT l_orderkey,
         (l_orderkey * 31 + l_linenumber) % 7 AS m,
         l_shipdate,
         l_shipdate + (l_partkey % 30) * INTERVAL 1 DAY AS commit_d,
         l_shipdate + (l_partkey % 30 + (l_suppkey % 10) - 2)
           * INTERVAL 1 DAY AS receipt_d
  FROM lineitem
), f AS (
  SELECT l_orderkey,
         CASE WHEN m = 3 THEN 'SHIP' ELSE 'MAIL' END AS shipmode
  FROM l
  WHERE m IN (3, 5)
    AND l_shipdate < commit_d
    AND commit_d < receipt_d
    AND receipt_d >= DATE '1997-01-01'
    AND receipt_d < DATE '1998-01-01'
)
SELECT shipmode,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM f JOIN orders o ON f.l_orderkey = o.o_orderkey
GROUP BY 1""",
)
def lineitem_q12_shipmode(sf_dir: str):
    """Late-shipment lines per ship mode split by order priority
    (TPC-H Q12 shape). The fixture lacks shipmode/commit/receipt
    columns, so they derive deterministically from integer keys with
    the SAME expressions restated in the oracle (the ``logfile_jsonl``
    derived-column convention): mode = (orderkey·31+linenumber) mod 7,
    commit = ship + partkey%30 days, receipt = commit + suppkey%10 − 2
    days.

    Plan: all four predicates evaluate INSIDE the lineitem scan (2/7
    mode selectivity × the receipt-year band — survivors are a small
    fraction of the fact), then ONE hash join of the survivors against
    orders carries a single shipmode byte per row; the finish is a
    modes×2 bounded aggregate. No date columns ever leave the read
    task — they fold to int day arithmetic per batch."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate, seed_join_side

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_linenumber",
                                  "l_partkey", "l_suppkey", "l_shipdate"])
    lo_day = np.datetime64("1997-01-01", "D").astype(np.int64)
    hi_day = np.datetime64("1998-01-01", "D").astype(np.int64)

    def survivors(b: pa.Table) -> pa.Table:
        ok = np.asarray(b["l_orderkey"].combine_chunks(), dtype=np.int64)
        ln = np.asarray(b["l_linenumber"].combine_chunks(), dtype=np.int64)
        pk = np.asarray(b["l_partkey"].combine_chunks(), dtype=np.int64)
        sk = np.asarray(b["l_suppkey"].combine_chunks(), dtype=np.int64)
        ship = np.asarray(b["l_shipdate"].combine_chunks()).astype(
            "datetime64[D]").astype(np.int64)
        m = (ok * 31 + ln) % 7
        commit = ship + pk % 30
        receipt = commit + sk % 10 - 2
        keep = (((m == 3) | (m == 5))
                & (ship < commit) & (commit < receipt)
                & (receipt >= lo_day) & (receipt < hi_day))
        return pa.table({
            "l_orderkey": pa.array(ok[keep]),
            "is_ship": pa.array((m[keep] == 3).astype(np.int64)),
        })

    f = li.map_batches(survivors, batch_format="pyarrow", batch_size=None)
    f = seed_join_side(f, pa.table({
        "l_orderkey": pa.array([_JOIN_SENTINEL], pa.int64()),
        "is_ship": pa.array([0], pa.int64()),
    }))
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderpriority"])
    j = f.join(orders, join_type="inner", num_partitions=8,
               on=("l_orderkey",), right_on=("o_orderkey",))

    def flags(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        pri = b["o_orderpriority"]
        high = pc.is_in(pri, value_set=pa.array(["1-URGENT", "2-HIGH"]))
        hi_ = np.asarray(high.combine_chunks()
                         if isinstance(high, pa.ChunkedArray) else high,
                         dtype=bool).astype(np.int64)
        return pa.table({
            "shipmode": pa.array(np.where(
                np.asarray(b["is_ship"].combine_chunks(),
                           dtype=np.int64) == 1, "SHIP", "MAIL")),
            "high": pa.array(hi_),
            "low": pa.array(1 - hi_),
        })

    a = grouped_aggregate(
        j.map_batches(flags, batch_format="pyarrow", batch_size=None),
        ["shipmode"],
        [("high", "sum", "high_line_count"),
         ("low", "sum", "low_line_count")])
    return a


# --------------------------------------------------------------------------
# Skyline / Pareto-frontier query (multi-objective dominance)


@query(
    "orders_skyline",
    """
WITH dmax AS (
  SELECT o_orderdate AS d, MAX(o_totalprice) AS mx
  FROM orders GROUP BY 1
), run AS (
  SELECT d, mx,
         MAX(mx) OVER (ORDER BY d
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev_mx
  FROM dmax
)
SELECT a.o_orderkey, a.o_orderdate, a.o_totalprice
FROM orders a JOIN run r ON a.o_orderdate = r.d
WHERE a.o_totalprice = r.mx AND (r.prev_mx IS NULL OR a.o_totalprice > r.prev_mx)""",
)
def orders_skyline(sf_dir: str):
    """Skyline (Pareto-frontier) query: orders not dominated on the
    (earlier order date, higher total price) objective pair — order B
    dominates A when B is no later AND no cheaper, strictly better on
    at least one. Classic multi-objective search result (the "best
    tradeoffs" set).

    The naive form is the quadratic NOT EXISTS self-join; here the
    frontier falls out of per-date MAX partials (exchange bounded by
    distinct dates, never rows), a driver-side running max over the
    tiny date axis, and one broadcast-filter scan that keeps rows
    matching a skyline (date, max-price) pair. At 100 TB the date axis
    stays ~10^4 entries regardless of row count."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderkey", "o_orderdate",
                                  "o_totalprice"])
    dmax = grouped_aggregate(ds, ["o_orderdate"],
                             [("o_totalprice", "max", "mx")]).to_pandas()
    dmax = dmax.sort_values("o_orderdate").reset_index(drop=True)
    mx = dmax["mx"].to_numpy()
    prev = np.concatenate([[-np.inf], np.maximum.accumulate(mx)[:-1]])
    sky = dmax[mx > prev]
    sky_d = (sky["o_orderdate"].to_numpy().astype("datetime64[us]")
             .astype(np.int64))
    sky_p = sky["mx"].to_numpy()  # already date-sorted

    def keep(b: pa.Table) -> pa.Table:
        d = (np.asarray(b["o_orderdate"].combine_chunks())
             .astype("datetime64[us]").astype(np.int64))
        p = np.asarray(b["o_totalprice"].combine_chunks())
        i = np.clip(np.searchsorted(sky_d, d), 0, max(len(sky_d) - 1, 0))
        mask = (sky_d[i] == d) & (sky_p[i] == p) if len(sky_d) else \
            np.zeros(len(d), dtype=bool)
        return b.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow", batch_size=None)


# --------------------------------------------------------------------------
# Optimizer statistics: exact join-size profile from per-key histograms


def _join_card_oracle(lt: str, lk: str, rt: str, rk: str) -> str:
    return f"""
SELECT '{lt}' AS left_table, '{rt}' AS right_table,
       (SELECT CAST(COUNT(DISTINCT {lk}) AS BIGINT) FROM {lt})
         AS n_keys_left,
       (SELECT CAST(COUNT(DISTINCT {rk}) AS BIGINT) FROM {rt})
         AS n_keys_right,
       CAST(COUNT(*) AS BIGINT) AS n_keys_both,
       CAST(COALESCE(SUM(cl * cr), 0) AS BIGINT) AS join_rows,
       CAST(COALESCE(MAX(cl * cr), 0) AS BIGINT) AS max_key_fanout
FROM (SELECT {lk} AS k, COUNT(*) AS cl FROM {lt} GROUP BY 1) l
JOIN (SELECT {rk} AS k, COUNT(*) AS cr FROM {rt} GROUP BY 1) r
  USING (k)"""


_JOIN_CARD_CANDIDATES = [
    ("orders", "o_orderkey", "lineitem", "l_orderkey"),
    ("customer", "c_custkey", "orders", "o_custkey"),
]


@query(
    "join_cardinality_profile",
    " UNION ALL ".join(_join_card_oracle(*c) for c in _JOIN_CARD_CANDIDATES),
)
def join_cardinality_profile(sf_dir: str):
    """Optimizer join-size statistics, computed EXACTLY from per-key
    count histograms without running the join: for each candidate
    equi-join, distinct keys per side, shared keys, the exact output
    cardinality Σ cl·cr, and the worst per-key fan-out max(cl·cr) —
    the numbers a cost-based planner needs to choose broadcast vs
    shuffle vs salting (the max-fanout row IS the skew alarm).

    Each side reduces to (key, count) via the hash-partitioned
    aggregate; the sides meet by UNIONING tagged partials and
    re-grouping by key (no join operator at all), then a constant-size
    fold. Exchange: distinct keys once per side — never the join's
    output rows, which is the point."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate, grouped_aggregate_ds

    rows = []
    for lt, lk, rt, rk in _JOIN_CARD_CANDIDATES:
        l = grouped_aggregate_ds(
            rd.read_parquet(f"{sf_dir}/{lt}.parquet", columns=[lk]),
            [lk], [("*", "count", "c")], num_partitions=8)
        r = grouped_aggregate_ds(
            rd.read_parquet(f"{sf_dir}/{rt}.parquet", columns=[rk]),
            [rk], [("*", "count", "c")], num_partitions=8)

        def tag(side):
            def f(b: pa.Table) -> pa.Table:
                c = np.asarray(b["c"].combine_chunks(), dtype=np.int64)
                z = np.zeros(len(c), dtype=np.int64)
                key = b[b.column_names[0]]
                return pa.table({
                    "k": pa.compute.cast(
                        key.combine_chunks()
                        if isinstance(key, pa.ChunkedArray) else key,
                        pa.int64()),
                    "cl": pa.array(c if side == "l" else z),
                    "cr": pa.array(z if side == "l" else c),
                })
            return f

        both = grouped_aggregate_ds(
            l.map_batches(tag("l"), batch_format="pyarrow",
                          batch_size=None).union(
                r.map_batches(tag("r"), batch_format="pyarrow",
                              batch_size=None)),
            ["k"], [("cl", "sum", "cl"), ("cr", "sum", "cr")],
            num_partitions=8)

        def fold(b: pa.Table) -> pa.Table:
            cl = np.asarray(b["cl"].combine_chunks(), dtype=np.int64)
            cr = np.asarray(b["cr"].combine_chunks(), dtype=np.int64)
            m = (cl > 0) & (cr > 0)
            prod = cl[m] * cr[m]
            return pa.table({
                "g": pa.array([0], pa.int64()),
                "nl": pa.array([int((cl > 0).sum())], pa.int64()),
                "nr": pa.array([int((cr > 0).sum())], pa.int64()),
                "nb": pa.array([int(m.sum())], pa.int64()),
                "jr": pa.array([int(prod.sum())], pa.int64()),
                "mf": pa.array([int(prod.max()) if len(prod) else 0],
                               pa.int64()),
            })

        a = grouped_aggregate(
            both.map_batches(fold, batch_format="pyarrow",
                             batch_size=None),
            ["g"], [("nl", "sum", "nl"), ("nr", "sum", "nr"),
                    ("nb", "sum", "nb"), ("jr", "sum", "jr"),
                    ("mf", "max", "mf")])
        rows.append((lt, rt, int(a["nl"][0].as_py()),
                     int(a["nr"][0].as_py()), int(a["nb"][0].as_py()),
                     int(a["jr"][0].as_py()), int(a["mf"][0].as_py())))
    return pa.table({
        "left_table": pa.array([r[0] for r in rows], pa.string()),
        "right_table": pa.array([r[1] for r in rows], pa.string()),
        "n_keys_left": pa.array([r[2] for r in rows], pa.int64()),
        "n_keys_right": pa.array([r[3] for r in rows], pa.int64()),
        "n_keys_both": pa.array([r[4] for r in rows], pa.int64()),
        "join_rows": pa.array([r[5] for r in rows], pa.int64()),
        "max_key_fanout": pa.array([r[6] for r in rows], pa.int64()),
    })


# --------------------------------------------------------------------------
# Embedding-health audits: isotropy + JL projection distortion


@query(
    "embed_isotropy",
    """
WITH q AS (
  SELECT vec_id, i,
         CAST(FLOOR(1e5 * CAST(list_extract(embedding, i) AS DOUBLE))
              AS HUGEINT) AS qv
  FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS u(i)
), s AS (SELECT i, SUM(qv) AS sd FROM q GROUP BY 1),
f AS (
  SELECT (SELECT SUM(sd * sd) FROM s)
           - (SELECT SUM(qv * qv) FROM q) AS num,
         (SELECT COUNT(*) FROM embeddings) AS n
)
SELECT CAST(n AS BIGINT) AS n_vecs,
       CAST((num + 2000000 * (n * (n - 1) * 10000))
            // (n * (n - 1) * 10000) - 2000000 AS BIGINT)
         AS avg_pair_dot_micro
FROM f""",
)
def embed_isotropy(sf_dir: str):
    """Embedding-cloud centering / isotropy audit: the average
    pairwise inner product across ALL n(n−1) vector pairs — ≈ ‖μ‖²,
    the classic anisotropy symptom ("all embeddings share a dominant
    direction", which wrecks cosine retrieval). Computed WITHOUT any
    pair enumeration: Σ_{i≠j}⟨v_i,v_j⟩ = ‖Σv‖² − Σ‖v‖², so one pass
    of per-dimension sums suffices. Coordinates quantize to 1e-5 ints
    (float32→double FLOOR is bit-identical both engines) and
    everything stays exact integer through the final shifted floor
    division — no float accumulation anywhere.

    Exchange: dims-bounded per-batch partials (64 ints + 2 scalars);
    at 100 TB still 64 ints."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])

    def partial(b: pa.Table) -> pa.Table:
        col = b["embedding"].combine_chunks()
        flat = np.asarray(col.flatten(), dtype=np.float64)
        offs = np.asarray(col.offsets, dtype=np.int64)
        dim = int(offs[1] - offs[0]) if len(offs) > 1 else 0
        q = np.floor(1e5 * flat).astype(np.int64).reshape(-1, dim)
        return pa.table({
            "d": pa.array(np.arange(1, dim + 1, dtype=np.int64)),
            "sd": pa.array(q.sum(axis=0)),
            "sq": pa.array((q * q).sum(axis=0)),
            "n": pa.array(np.full(dim, q.shape[0], dtype=np.int64)),
        })

    a = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        ["d"], [("sd", "sum", "sd"), ("sq", "sum", "sq"),
                ("n", "sum", "n")]).to_pandas()
    n = int(a["n"].iloc[0])
    num = (sum(int(v) ** 2 for v in a["sd"])
           - sum(int(v) for v in a["sq"]))
    den = n * (n - 1) * 10_000
    avg = (num + 2_000_000 * den) // den - 2_000_000
    return pa.table({
        "n_vecs": pa.array([n], pa.int64()),
        "avg_pair_dot_micro": pa.array([avg], pa.int64()),
    })


_JL_K = 16


def _jl_signs(dim: int) -> "np.ndarray":
    """±1 JL projection matrix, md5-derived (restatable in SQL)."""
    import hashlib

    import numpy as np

    s = np.empty((dim, _JL_K), dtype=np.int64)
    for d in range(1, dim + 1):
        for k in range(1, _JL_K + 1):
            par = int(hashlib.md5(f"{d}_{k}".encode()).hexdigest()[:2],
                      16) % 2
            s[d - 1, k - 1] = 1 - 2 * par
    return s


@query(
    "embed_jl_distortion",
    """
WITH q AS (
  SELECT vec_id, i,
         CAST(FLOOR(1e5 * CAST(list_extract(embedding, i) AS DOUBLE))
              AS HUGEINT) AS qv
  FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS u(i)
), sgn AS (
  SELECT di.i, v.k,
         1 - 2 * (CAST(('0x' || substr(md5(CAST(di.i AS VARCHAR) || '_'
                        || CAST(v.k AS VARCHAR)), 1, 2)) AS BIGINT) % 2)
           AS s
  FROM (SELECT DISTINCT i FROM q) di,
       UNNEST(generate_series(1, 16)) v(k)
), p AS (
  SELECT q.vec_id, sgn.k, SUM(q.qv * sgn.s) AS pv
  FROM q JOIN sgn USING (i) GROUP BY 1, 2
), od AS (
  SELECT a.vec_id // 2 AS pid,
         SUM((a.qv - b.qv) * (a.qv - b.qv)) AS d2
  FROM q a JOIN q b
    ON b.vec_id = a.vec_id + 1 AND a.i = b.i AND a.vec_id % 2 = 0
  GROUP BY 1
), pd AS (
  SELECT a.vec_id // 2 AS pid,
         SUM((a.pv - b.pv) * (a.pv - b.pv)) AS d2
  FROM p a JOIN p b
    ON b.vec_id = a.vec_id + 1 AND a.k = b.k AND a.vec_id % 2 = 0
  GROUP BY 1
), r AS (
  SELECT (1000000 * pd.d2) // (16 * od.d2) AS ratio
  FROM od JOIN pd USING (pid)
  WHERE od.d2 > 0
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(MIN(ratio) AS BIGINT) AS min_ratio_micro,
       CAST(MAX(ratio) AS BIGINT) AS max_ratio_micro,
       CAST(SUM(ratio) // COUNT(*) AS BIGINT) AS avg_ratio_micro
FROM r""",
)
def embed_jl_distortion(sf_dir: str):
    """Johnson–Lindenstrauss dimensionality-reduction audit: project
    64-dim embeddings to 16 dims with a deterministic ±1 sign matrix
    (md5-derived, so the ORACLE can rebuild it) and measure, for each
    disjoint (2i, 2i+1) vector pair, the squared-distance ratio
    ‖p_a−p_b‖²/K ÷ ‖q_a−q_b‖² — the distortion the JL lemma bounds.
    Quantized integer coordinates make projections, distances and the
    final ratio EXACT integer arithmetic end to end (the ratio is a
    single integer floor division).

    Projection is one int matmul per batch (map-only); pairs group by
    pid = vec_id//2 into complete-pair partitions — exchange is the
    narrow quantized rows once."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import partitioned_group_apply

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])

    def addpid(b: pa.Table) -> pa.Table:
        v = np.asarray(b["vec_id"].combine_chunks(), dtype=np.int64)
        return b.append_column("pid", pa.array(v // 2))

    withpid = ds.map_batches(addpid, batch_format="pyarrow",
                             batch_size=None)

    def pair_ratios(part: pa.Table) -> pa.Table:
        empty = pa.table({"pid": pa.array([], pa.int64()),
                          "ratio": pa.array([], pa.int64())})
        if part.num_rows == 0:
            return empty
        v = np.asarray(part["vec_id"].combine_chunks(), dtype=np.int64)
        col = part["embedding"].combine_chunks()
        flat = np.asarray(col.flatten(), dtype=np.float64)
        offs = np.asarray(col.offsets, dtype=np.int64)
        dim = int(offs[1] - offs[0])
        q = np.floor(1e5 * flat).astype(np.int64).reshape(-1, dim)
        order = np.argsort(v)
        v, q = v[order], q[order]
        # complete pairs: consecutive rows with ids (2m, 2m+1)
        a = np.flatnonzero((v % 2 == 0) & (np.roll(v, -1) == v + 1))
        a = a[a < len(v) - 1]
        if len(a) == 0:
            return empty
        sgn = _jl_signs(dim)
        dq = q[a] - q[a + 1]
        od2 = (dq * dq).sum(axis=1)
        dp = dq @ sgn
        pd2 = (dp * dp).sum(axis=1)
        keep = od2 > 0
        ratio = [int(1_000_000 * int(p)) // (16 * int(o))
                 for p, o in zip(pd2[keep], od2[keep])]
        return pa.table({
            "pid": pa.array((v[a][keep] // 2)),
            "ratio": pa.array(ratio, pa.int64()),
        })

    r = partitioned_group_apply(withpid, ["pid"], pair_ratios).to_pandas()
    ratio = [int(x) for x in r["ratio"]]
    return pa.table({
        "n_pairs": pa.array([len(ratio)], pa.int64()),
        "min_ratio_micro": pa.array([min(ratio)], pa.int64()),
        "max_ratio_micro": pa.array([max(ratio)], pa.int64()),
        "avg_ratio_micro": pa.array([sum(ratio) // len(ratio)],
                                    pa.int64()),
    })


def _advisor_oracle_one(lt: str, lk: str, rt: str, rk: str) -> str:
    return f"""
SELECT '{lt}' AS left_table, '{rt}' AS right_table,
       CAST(rl AS BIGINT) AS rows_left, CAST(rr AS BIGINT) AS rows_right,
       CAST(jr AS BIGINT) AS join_rows,
       CAST(mf AS BIGINT) AS max_key_fanout,
       CASE WHEN LEAST(rl, rr) <= 10000 THEN 'broadcast'
            WHEN nb > 0 AND mf * nb > 100 * jr THEN 'salted_shuffle'
            ELSE 'hash_shuffle' END AS decision
FROM (
  SELECT (SELECT COUNT(*) FROM {lt}) AS rl,
         (SELECT COUNT(*) FROM {rt}) AS rr,
         COUNT(*) AS nb,
         COALESCE(SUM(cl * cr), 0) AS jr,
         COALESCE(MAX(cl * cr), 0) AS mf
  FROM (SELECT {lk} AS k, COUNT(*) AS cl FROM {lt} GROUP BY 1) l
  JOIN (SELECT {rk} AS k, COUNT(*) AS cr FROM {rt} GROUP BY 1) r
    USING (k))"""


@query(
    "plan_join_advisor",
    " UNION ALL ".join(_advisor_oracle_one(*c)
                       for c in _JOIN_CARD_CANDIDATES),
)
def plan_join_advisor(sf_dir: str):
    """Cost-based physical-plan advisor built on the exact
    `join_cardinality_profile` statistics: per candidate equi-join,
    pick broadcast (a side fits in every task), salted shuffle (one
    key's fan-out dominates — mf·n_keys > 100× the average says the
    hot key would stall its reducer), or plain hash shuffle. This is
    the decision procedure `salted_join` / the broadcast-dim pattern
    implement; here it's a queryable report with the same exact
    integer inputs on both engines (rule thresholds restated in SQL).

    Exchange identical to the profile: per-side key histograms
    only."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate, grouped_aggregate_ds

    rows = []
    for lt, lk, rt, rk in _JOIN_CARD_CANDIDATES:
        l = grouped_aggregate_ds(
            rd.read_parquet(f"{sf_dir}/{lt}.parquet", columns=[lk]),
            [lk], [("*", "count", "c")], num_partitions=8)
        r = grouped_aggregate_ds(
            rd.read_parquet(f"{sf_dir}/{rt}.parquet", columns=[rk]),
            [rk], [("*", "count", "c")], num_partitions=8)

        def tag(side):
            def f(b: pa.Table) -> pa.Table:
                c = np.asarray(b["c"].combine_chunks(), dtype=np.int64)
                z = np.zeros(len(c), dtype=np.int64)
                key = b[b.column_names[0]]
                return pa.table({
                    "k": pa.compute.cast(
                        key.combine_chunks()
                        if isinstance(key, pa.ChunkedArray) else key,
                        pa.int64()),
                    "cl": pa.array(c if side == "l" else z),
                    "cr": pa.array(z if side == "l" else c),
                })
            return f

        both = grouped_aggregate_ds(
            l.map_batches(tag("l"), batch_format="pyarrow",
                          batch_size=None).union(
                r.map_batches(tag("r"), batch_format="pyarrow",
                              batch_size=None)),
            ["k"], [("cl", "sum", "cl"), ("cr", "sum", "cr")],
            num_partitions=8)

        def fold(b: pa.Table) -> pa.Table:
            cl = np.asarray(b["cl"].combine_chunks(), dtype=np.int64)
            cr = np.asarray(b["cr"].combine_chunks(), dtype=np.int64)
            m = (cl > 0) & (cr > 0)
            prod = cl[m] * cr[m]
            return pa.table({
                "g": pa.array([0], pa.int64()),
                "rl": pa.array([int(cl.sum())], pa.int64()),
                "rr": pa.array([int(cr.sum())], pa.int64()),
                "nb": pa.array([int(m.sum())], pa.int64()),
                "jr": pa.array([int(prod.sum())], pa.int64()),
                "mf": pa.array([int(prod.max()) if len(prod) else 0],
                               pa.int64()),
            })

        a = grouped_aggregate(
            both.map_batches(fold, batch_format="pyarrow",
                             batch_size=None),
            ["g"], [("rl", "sum", "rl"), ("rr", "sum", "rr"),
                    ("nb", "sum", "nb"), ("jr", "sum", "jr"),
                    ("mf", "max", "mf")])
        rl, rr = int(a["rl"][0].as_py()), int(a["rr"][0].as_py())
        nb, jr = int(a["nb"][0].as_py()), int(a["jr"][0].as_py())
        mf = int(a["mf"][0].as_py())
        if min(rl, rr) <= 10_000:
            dec = "broadcast"
        elif nb > 0 and mf * nb > 100 * jr:
            dec = "salted_shuffle"
        else:
            dec = "hash_shuffle"
        rows.append((lt, rt, rl, rr, jr, mf, dec))
    return pa.table({
        "left_table": pa.array([r[0] for r in rows], pa.string()),
        "right_table": pa.array([r[1] for r in rows], pa.string()),
        "rows_left": pa.array([r[2] for r in rows], pa.int64()),
        "rows_right": pa.array([r[3] for r in rows], pa.int64()),
        "join_rows": pa.array([r[4] for r in rows], pa.int64()),
        "max_key_fanout": pa.array([r[5] for r in rows], pa.int64()),
        "decision": pa.array([r[6] for r in rows], pa.string()),
    })


# --------------------------------------------------------------------------
# Iterative greedy set cover on the supplier→part bipartite graph


@query(
    "lineitem_greedy_setcover",
    """
WITH e AS (SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem),
r1 AS (SELECT s, COUNT(*) AS gain FROM e GROUP BY 1),
w1 AS (SELECT s, gain FROM r1 ORDER BY gain DESC, s LIMIT 1),
cov1 AS (SELECT DISTINCT p FROM e WHERE s = (SELECT s FROM w1)),
r2 AS (SELECT e.s, COUNT(*) AS gain FROM e
       WHERE e.p NOT IN (SELECT p FROM cov1)
         AND e.s <> (SELECT s FROM w1)
       GROUP BY e.s),
w2 AS (SELECT s, gain FROM r2 ORDER BY gain DESC, s LIMIT 1),
cov2 AS (SELECT p FROM cov1
         UNION SELECT p FROM e WHERE s = (SELECT s FROM w2)),
r3 AS (SELECT e.s, COUNT(*) AS gain FROM e
       WHERE e.p NOT IN (SELECT p FROM cov2)
         AND e.s NOT IN ((SELECT s FROM w1), (SELECT s FROM w2))
       GROUP BY e.s),
w3 AS (SELECT s, gain FROM r3 ORDER BY gain DESC, s LIMIT 1),
cov3 AS (SELECT p FROM cov2
         UNION SELECT p FROM e WHERE s = (SELECT s FROM w3))
SELECT CAST(1 AS BIGINT) AS round, CAST(s AS BIGINT) AS suppkey,
       CAST(gain AS BIGINT) AS gain,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM cov1) AS covered_parts
FROM w1
UNION ALL SELECT 2, s, gain, (SELECT COUNT(*) FROM cov2) FROM w2
UNION ALL SELECT 3, s, gain, (SELECT COUNT(*) FROM cov3) FROM w3""",
)
def lineitem_greedy_setcover(sf_dir: str):
    """Greedy set cover on the supplier→part bipartite graph (the
    (1−1/e)-approximation every coverage-maximization pipeline runs:
    "pick 3 suppliers covering the most distinct parts"). Three
    rounds; each round scores suppliers by UNCOVERED-part gain,
    deterministic tie-break (gain DESC, suppkey ASC), then folds the
    winner's parts into the covered set.

    Distributed shape per round: anti-filter edges against the
    broadcast covered set (a Bloom filter at 100 TB — here the exact
    set, bounded by parts), per-supplier gains via the
    hash-partitioned aggregate, ONE-row argmax via partial top-k;
    only the winner's part list (its degree) returns to the driver.
    Edges themselves come from a hash-partitioned distinct and are
    re-scanned per round — k scans, never k shuffles."""
    import numpy as np
    import ray.data as rd

    import ray
    from raylog.functions.agg import grouped_aggregate_ds
    from raylog.functions.topk import topk

    edges = grouped_aggregate_ds(
        rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                        columns=["l_suppkey", "l_partkey"]),
        ["l_suppkey", "l_partkey"], [("*", "count", "_c")],
        num_partitions=8).map_batches(
            lambda b: b.select(["l_suppkey", "l_partkey"]),
            batch_format="pyarrow", batch_size=None).materialize()

    covered: set = set()
    taken: set = set()
    out = []
    for rnd in range(1, 4):
        ref = ray.put((np.fromiter(covered, dtype=np.int64,
                                   count=len(covered)),
                       np.fromiter(taken, dtype=np.int64,
                                   count=len(taken))))

        def gain_partial(b: pa.Table) -> pa.Table:
            cov, tak = ray.get(ref)
            s = np.asarray(b["l_suppkey"].combine_chunks(),
                           dtype=np.int64)
            p = np.asarray(b["l_partkey"].combine_chunks(),
                           dtype=np.int64)
            keep = ~np.isin(p, cov) & ~np.isin(s, tak)
            return pa.table({"s": pa.array(s[keep]),
                             "one": pa.array(np.ones(int(keep.sum()),
                                                     dtype=np.int64))})

        gains = grouped_aggregate_ds(
            edges.map_batches(gain_partial, batch_format="pyarrow",
                              batch_size=None),
            ["s"], [("one", "sum", "gain")], num_partitions=8)
        win = topk(gains, sort_cols=["gain", "s"],
                   descending=[True, False], k=1).to_pandas()
        if win.empty:
            break
        ws, wg = int(win["s"][0]), int(win["gain"][0])

        def winner_parts(b: pa.Table, ws=ws) -> pa.Table:
            m = pa.compute.equal(b["l_suppkey"], ws)
            return b.filter(m).select(["l_partkey"])

        new_parts = [int(v) for t in
                     edges.map_batches(winner_parts,
                                       batch_format="pyarrow",
                                       batch_size=None)
                     .iter_batches(batch_format="pyarrow",
                                   batch_size=None)
                     for v in t["l_partkey"].to_pylist()]
        covered |= set(new_parts)
        taken.add(ws)
        out.append((rnd, ws, wg, len(covered)))
    return pa.table({
        "round": pa.array([r[0] for r in out], pa.int64()),
        "suppkey": pa.array([r[1] for r in out], pa.int64()),
        "gain": pa.array([r[2] for r in out], pa.int64()),
        "covered_parts": pa.array([r[3] for r in out], pa.int64()),
    })


@query(
    "orders_abc_classification",
    """
WITH r AS (
  SELECT o_custkey,
         SUM(CAST(FLOOR(o_totalprice * 10000 + 0.5) AS BIGINT)) AS rev
  FROM orders GROUP BY 1
), t AS (SELECT SUM(rev) AS tot FROM r),
c AS (
  SELECT rev,
         SUM(rev) OVER (ORDER BY rev DESC, o_custkey
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS cum
  FROM r
), cls AS (
  SELECT CASE WHEN 100 * cum <= 80 * (SELECT tot FROM t) THEN 'A'
              WHEN 100 * cum <= 95 * (SELECT tot FROM t) THEN 'B'
              ELSE 'C' END AS abc_class, rev
  FROM c
)
SELECT abc_class, CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(rev) AS BIGINT) AS revenue_e4,
       CAST((1000 * SUM(rev)) // (SELECT tot FROM t) AS BIGINT)
         AS share_permille
FROM cls GROUP BY 1""",
)
def orders_abc_classification(sf_dir: str):
    """ABC inventory/customer classification (the 80/95 cumulative-
    share rule): customers sorted by revenue (ties by custkey) are
    class A while the running total stays within 80% of corpus
    revenue, B to 95%, C after — exact integer Q6 fixed-point revenue
    and an integer cross-multiplied boundary test (100·cum ≤ 80·tot),
    so the class cut is bit-deterministic.

    Per-customer revenue via the hash-partitioned aggregate; the
    cumulative pass runs on the DESC-sorted per-customer table (the
    same compressed-axis driver regime as the AUC rank pass —
    customer-bounded, with value-bucketing as the documented fallback
    at 10^12-customer scale); output is 3 rows."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate_ds

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_custkey", "o_totalprice"])

    def q(b: pa.Table) -> pa.Table:
        v = np.asarray(b["o_totalprice"].combine_chunks(),
                       dtype=np.float64)
        return pa.table({
            "o_custkey": b["o_custkey"],
            "rev": pa.array(np.floor(v * 10000 + 0.5).astype(np.int64)),
        })

    per_cust = grouped_aggregate_ds(
        ds.map_batches(q, batch_format="pyarrow", batch_size=None),
        ["o_custkey"], [("rev", "sum", "rev")],
        num_partitions=8).to_pandas()
    per_cust = per_cust.sort_values(["rev", "o_custkey"],
                                    ascending=[False, True])
    rev = per_cust["rev"].to_numpy(dtype=np.int64)
    tot = int(rev.sum())
    cum = np.cumsum(rev)
    cls = np.where(100 * cum <= 80 * tot, "A",
                   np.where(100 * cum <= 95 * tot, "B", "C"))
    out = []
    for k in ["A", "B", "C"]:
        m = cls == k
        if not m.any():
            continue
        s = int(rev[m].sum())
        out.append((k, int(m.sum()), s, 1000 * s // tot))
    return pa.table({
        "abc_class": pa.array([r[0] for r in out], pa.string()),
        "n_customers": pa.array([r[1] for r in out], pa.int64()),
        "revenue_e4": pa.array([r[2] for r in out], pa.int64()),
        "share_permille": pa.array([r[3] for r in out], pa.int64()),
    })
