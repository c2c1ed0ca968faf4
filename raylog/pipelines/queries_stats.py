"""Statistical audits and reports over events/orders/docs.

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
from raylog.pipelines.queries_dedup import _NGRAM_PAIRS_CTE  # noqa: E501
from raylog.stages import route

@query(
    "events_burstiness",
    """
WITH c AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, COUNT(*) AS n
  FROM events GROUP BY 1, 2
), p AS (
  SELECT event_type, day, n,
         LAG(n) OVER (PARTITION BY event_type ORDER BY day) AS prev
  FROM c
), s AS (
  SELECT event_type,
         COUNT(*) AS k, AVG(CAST(n AS DOUBLE)) AS mu,
         VAR_SAMP(CAST(n AS DOUBLE)) AS v,
         CORR(CAST(n AS DOUBLE), CAST(prev AS DOUBLE)) AS ac1
  FROM p GROUP BY 1
)
SELECT event_type, CAST(k AS BIGINT) AS n_days,
       CAST(FLOOR(1000 * v / mu) AS BIGINT) AS fano_milli,
       CAST(FLOOR(1000 * ac1) AS BIGINT) AS autocorr_milli
FROM s""",
)
def events_burstiness(sf_dir: str):
    """Traffic burstiness + persistence per event type: Fano factor
    (variance/mean of daily counts — 1.0 = Poisson, higher = bursty)
    and lag-1 day-over-day autocorrelation (does a hot day predict the
    next). The only corpus pass is the (type, day) count aggregate;
    both statistics evaluate on that cells-bounded series driver-side,
    matching the SQL window restatement exactly (pairwise-complete
    CORR over consecutive days)."""
    import numpy as np
    import pandas as pd
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
    rows = []
    for et, g in c.groupby("event_type"):
        g = g.sort_values("day")
        n = g["n"].to_numpy().astype(np.float64)
        k = len(n)
        mu = n.mean()
        v = n.var(ddof=1) if k > 1 else float("nan")
        cur, prev = n[1:], n[:-1]
        if len(cur) > 1 and cur.std(ddof=0) > 0 and prev.std(ddof=0) > 0:
            ac1 = float(np.corrcoef(cur, prev)[0, 1])
        else:
            ac1 = float("nan")
        if not (np.isfinite(v) and mu > 0):
            continue  # <2 days: Fano/autocorr undefined, skip the type
        rows.append((et, k, int(np.floor(1000 * v / mu)),
                     int(np.floor(1000 * ac1)) if np.isfinite(ac1)
                     else 0))
    rows.sort()
    return pa.table({
        "event_type": pa.array([r[0] for r in rows], pa.string()),
        "n_days": pa.array([r[1] for r in rows], pa.int64()),
        "fano_milli": pa.array([r[2] for r in rows], pa.int64()),
        "autocorr_milli": pa.array([r[3] for r in rows], pa.int64()),
    })


@query(
    "events_markov_transitions",
    """
WITH o AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
  FROM events
), t AS (
  SELECT prev AS from_type, event_type AS to_type, COUNT(*) AS n
  FROM o WHERE prev IS NOT NULL GROUP BY 1, 2
), m AS (
  SELECT from_type, SUM(n) AS tot FROM t GROUP BY 1
)
SELECT t.from_type, t.to_type, t.n,
       CAST(FLOOR(1000.0 * t.n / m.tot) AS BIGINT) AS p_milli
FROM t JOIN m USING (from_type)""",
)
def events_markov_transitions(sf_dir: str):
    """First-order Markov transition matrix of user behavior (the
    next-event model behind session prediction / anomaly scoring):
    consecutive event-type pairs per user (arrival order), transition
    counts and row-normalized probabilities.

    One segmented-shift pass per complete-user partition produces the
    pair stream already types²-compressed per batch; the global
    combine and row normalization run on the types²-bounded matrix."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate, partitioned_group_apply

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_id", "ts",
                                  "event_type"])

    def pairs(part: pa.Table) -> pa.Table:
        def col(name):
            c = part[name]
            return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c

        uid = np.asarray(col("user_id"), dtype=np.int64)
        eid = np.asarray(col("event_id"), dtype=np.int64)
        t = np.asarray(col("ts")).astype("datetime64[us]").astype(np.int64)
        et = col("event_type").dictionary_encode()
        codes = np.asarray(et.indices, dtype=np.int64)
        n = len(uid)
        if n == 0:
            return pa.table({"from_type": pa.array([], pa.string()),
                             "to_type": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        order = np.lexsort((eid, t, uid))
        u_s, c_s = uid[order], codes[order]
        same = u_s[1:] == u_s[:-1]
        nv = len(et.dictionary)
        key = c_s[:-1][same] * nv + c_s[1:][same]
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table({
            "from_type": et.dictionary.take(pa.array(uk // nv)),
            "to_type": et.dictionary.take(pa.array(uk % nv)),
            "n": pa.array(cnt.astype(np.int64)),
        })

    pr = partitioned_group_apply(ds, ["user_id"], pairs)
    mat = grouped_aggregate(pr, ["from_type", "to_type"],
                            [("n", "sum", "n")]).to_pandas()
    if "from_type" not in mat.columns:  # no user has 2+ events
        z = pa.array([], pa.int64())
        return pa.table({"from_type": pa.array([], pa.string()),
                         "to_type": pa.array([], pa.string()),
                         "n": z, "p_milli": z})
    tot = mat.groupby("from_type")["n"].transform("sum").to_numpy()
    nn = mat["n"].to_numpy().astype(np.float64)
    return pa.table({
        "from_type": pa.array(mat["from_type"], pa.string()),
        "to_type": pa.array(mat["to_type"], pa.string()),
        "n": pa.array(mat["n"].to_numpy().astype(np.int64)),
        "p_milli": pa.array(np.floor(1000.0 * nn / tot).astype(np.int64)),
    })


@query(
    "events_forecast_baseline",
    """
WITH d AS (
  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
  FROM events GROUP BY 1, 2
), l AS (
  SELECT event_type, n,
         LAG(n, 7) OVER (PARTITION BY event_type ORDER BY day) AS p7,
         LAG(n, 1) OVER (PARTITION BY event_type ORDER BY day) AS p1
  FROM d
)
SELECT event_type,
       CAST(COUNT(*) FILTER (WHERE p7 IS NOT NULL) AS BIGINT) AS n_scored,
       CAST(FLOOR(1000.0 * SUM(ABS(n - p7)) FILTER (WHERE p7 IS NOT NULL)
                  / COUNT(*) FILTER (WHERE p7 IS NOT NULL)) AS BIGINT)
         AS snaive_mae_milli,
       CAST(FLOOR(1000.0 * SUM(ABS(n - p1)) FILTER (WHERE p1 IS NOT NULL)
                  / COUNT(*) FILTER (WHERE p1 IS NOT NULL)) AS BIGINT)
         AS naive_mae_milli
FROM l GROUP BY 1""",
)
def events_forecast_baseline(sf_dir: str):
    """Forecast-baseline error audit per event type: seasonal-naive
    (7-rows-back) vs naive-1 MAE over the daily count series — the
    MASE-style sanity floor every anomaly/forecast system is judged
    against (a 'model' that can't beat last-week's value is noise).
    Lag is defined over PRESENT days (row shift, both sides), so gaps
    don't create NULL comparisons.

    One dates×types-bounded daily-count aggregate (the corpus shuffles
    zero rows beyond it); the lag/MAE finish runs on that tiny series
    driver-side."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts"])

    def day_key(b: pa.Table) -> pa.Table:
        ts = np.asarray(b["ts"].combine_chunks()
                        if isinstance(b["ts"], pa.ChunkedArray)
                        else b["ts"]).astype("datetime64[us]")
        return pa.table({
            "event_type": b["event_type"],
            "day": pa.array(ts.astype("datetime64[D]").astype(np.int64)),
        })

    daily = grouped_aggregate(
        ds.map_batches(day_key, batch_format="pyarrow", batch_size=None),
        ["event_type", "day"], [("*", "count", "n")],
    ).to_pandas()

    rows = []
    for et, g in daily.groupby("event_type", sort=True):
        g = g.sort_values("day")
        n = g["n"].to_numpy(dtype=np.int64)
        out = {"event_type": et}
        for name, lag in (("snaive_mae_milli", 7), ("naive_mae_milli", 1)):
            if len(n) > lag:
                err = np.abs(n[lag:] - n[:-lag])
                out[name] = int(np.floor(1000.0 * err.sum() / len(err)))
            else:
                out[name] = None
        out["n_scored"] = max(0, len(n) - 7)
        rows.append(out)
    return pa.table({
        "event_type": pa.array([r["event_type"] for r in rows], pa.string()),
        "n_scored": pa.array([r["n_scored"] for r in rows], pa.int64()),
        "snaive_mae_milli": pa.array(
            [r["snaive_mae_milli"] for r in rows], pa.int64()),
        "naive_mae_milli": pa.array(
            [r["naive_mae_milli"] for r in rows], pa.int64()),
    })


@query(
    "events_top_paths",
    """
WITH o AS (
  SELECT user_id, event_type,
         LAG(event_type, 1) OVER w AS p1,
         LAG(event_type, 2) OVER w AS p2
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), t AS (
  SELECT p2 AS step1, p1 AS step2, event_type AS step3, COUNT(*) AS n
  FROM o WHERE p2 IS NOT NULL GROUP BY 1, 2, 3
), m AS (SELECT SUM(n) AS tot FROM t)
SELECT step1, step2, step3, n,
       CAST(FLOOR(1000.0 * n / m.tot) AS BIGINT) AS p_milli
FROM t, m""",
)
def events_top_paths(sf_dir: str):
    """3-step user-journey path mining (the sequential-pattern table
    behind funnel discovery): every consecutive event-type triple per
    user in arrival order, with counts and corpus share.

    Same shape as the Markov matrix one order up: a segmented
    double-shift per complete-user partition emits the triple stream
    already types³-compressed per batch; the global combine and the
    share normalization run on the types³-bounded table (exchange is
    independent of row count)."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate, partitioned_group_apply

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_id", "ts",
                                  "event_type"])

    def triples(part: pa.Table) -> pa.Table:
        def col(name):
            c = part[name]
            return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c

        uid = np.asarray(col("user_id"), dtype=np.int64)
        eid = np.asarray(col("event_id"), dtype=np.int64)
        t = np.asarray(col("ts")).astype("datetime64[us]").astype(np.int64)
        et = col("event_type").dictionary_encode()
        codes = np.asarray(et.indices, dtype=np.int64)
        n = len(uid)
        empty = pa.table({"step1": pa.array([], pa.string()),
                          "step2": pa.array([], pa.string()),
                          "step3": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64())})
        if n < 3:
            return empty
        order = np.lexsort((eid, t, uid))
        u_s, c_s = uid[order], codes[order]
        same3 = (u_s[2:] == u_s[1:-1]) & (u_s[1:-1] == u_s[:-2])
        if not same3.any():
            return empty
        nv = len(et.dictionary)
        key = (c_s[:-2][same3] * nv + c_s[1:-1][same3]) * nv + c_s[2:][same3]
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table({
            "step1": et.dictionary.take(pa.array(uk // (nv * nv))),
            "step2": et.dictionary.take(pa.array((uk // nv) % nv)),
            "step3": et.dictionary.take(pa.array(uk % nv)),
            "n": pa.array(cnt.astype(np.int64)),
        })

    pr = partitioned_group_apply(ds, ["user_id"], triples)
    mat = grouped_aggregate(pr, ["step1", "step2", "step3"],
                            [("n", "sum", "n")]).to_pandas()
    if "n" not in mat.columns:  # no user has 3+ events
        z = pa.array([], pa.int64())
        e = pa.array([], pa.string())
        return pa.table({"step1": e, "step2": e, "step3": e,
                         "n": z, "p_milli": z})
    nn = mat["n"].to_numpy().astype(np.int64)
    tot = float(nn.sum())
    return pa.table({
        "step1": pa.array(mat["step1"], pa.string()),
        "step2": pa.array(mat["step2"], pa.string()),
        "step3": pa.array(mat["step3"], pa.string()),
        "n": pa.array(nn),
        "p_milli": pa.array(np.floor(1000.0 * nn / tot).astype(np.int64)),
    })


@query(
    "basket_pair_lift",
    """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
nn AS (SELECT COUNT(DISTINCT l_orderkey) AS orders FROM lineitem),
ic AS (SELECT l_partkey, COUNT(*) AS c FROM li GROUP BY 1),
pc AS (SELECT a.l_partkey AS p1, b.l_partkey AS p2, COUNT(*) AS n
       FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
                          AND a.l_partkey < b.l_partkey
       GROUP BY 1, 2),
l AS (SELECT pc.p1, pc.p2, pc.n,
             pc.n * nn.orders * 1.0 / (x.c * y.c) AS lift
      FROM pc JOIN ic x ON pc.p1 = x.l_partkey
              JOIN ic y ON pc.p2 = y.l_partkey
      CROSS JOIN nn WHERE pc.n >= 2)
SELECT p1, p2, n, CAST(FLOOR(1000 * lift) AS BIGINT) AS lift_milli
FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY lift DESC, p1, p2) AS rn
      FROM l)
WHERE rn <= 20""",
)
def basket_pair_lift(sf_dir: str):
    """Association-rule mining (market-basket co-occurrence): top-20
    part pairs by lift = P(a,b)·N / (count(a)·count(b)) across orders,
    pair support ≥ 2 — the Apriori first pass.

    Baskets are tiny (≤ ~12 items), so pair expansion is quadratic
    only within a basket: complete-order partitions emit each basket's
    sorted-distinct pairs via repeat/arange arithmetic (no Python
    per-order loop); pair counts and item supports each flow through
    the hash-partitioned aggregate; lift evaluates on the
    support-filtered pair table and selection is partial top-k."""
    import numpy as np
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    from raylog.functions.agg import (grouped_aggregate,
                                      grouped_aggregate_ds,
                                      partitioned_group_apply)
    from raylog.functions.topk import topk

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])

    def pairs(part: pa.Table) -> pa.Table:
        ok = np.asarray(part["l_orderkey"].combine_chunks(), dtype=np.int64)
        pk = np.asarray(part["l_partkey"].combine_chunks(), dtype=np.int64)
        if len(ok) == 0:
            return pa.table({"p1": pa.array([], pa.int64()),
                             "p2": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        uniq = np.unique(np.stack([ok, pk], axis=1), axis=0)
        o_s, p_s = uniq[:, 0], uniq[:, 1]  # sorted by (order, part)
        starts = np.ones(len(o_s), dtype=bool)
        starts[1:] = o_s[1:] != o_s[:-1]
        m = np.diff(np.concatenate([np.flatnonzero(starts), [len(o_s)]]))
        base = np.concatenate([[0], np.cumsum(m)[:-1]])
        npairs = m * (m - 1) // 2
        tot = int(npairs.sum())
        if tot == 0:
            return pa.table({"p1": pa.array([], pa.int64()),
                             "p2": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        # enumerate (i, j) i<j within each basket via triangular index
        grp = np.repeat(np.arange(len(m)), npairs)
        local = np.arange(tot) - np.repeat(
            np.concatenate([[0], np.cumsum(npairs)[:-1]]), npairs)
        mm = m[grp].astype(np.float64)
        i = (np.floor((2 * mm - 1 - np.sqrt((2 * mm - 1) ** 2
                                            - 8 * local)) / 2)
             ).astype(np.int64)
        j = (local - (i * (2 * m[grp] - i - 1)) // 2 + i + 1).astype(
            np.int64)
        a = p_s[base[grp] + i]
        b = p_s[base[grp] + j]
        key = np.stack([a, b], axis=1)
        uk, cnt = np.unique(key, axis=0, return_counts=True)
        return pa.table({"p1": pa.array(uk[:, 0]),
                         "p2": pa.array(uk[:, 1]),
                         "n": pa.array(cnt.astype(np.int64))})

    pr = partitioned_group_apply(ds, ["l_orderkey"], pairs)
    pair_counts = grouped_aggregate_ds(pr, ["p1", "p2"],
                                       [("n", "sum", "n")])

    def order_items(b: pa.Table) -> pa.Table:
        ok = np.asarray(b["l_orderkey"].combine_chunks(), dtype=np.int64)
        pk = np.asarray(b["l_partkey"].combine_chunks(), dtype=np.int64)
        uniq = np.unique(np.stack([ok, pk], axis=1), axis=0)
        return pa.table({"l_orderkey": pa.array(uniq[:, 0]),
                         "l_partkey": pa.array(uniq[:, 1])})

    li = grouped_aggregate_ds(
        ds.map_batches(order_items, batch_format="pyarrow",
                       batch_size=None),
        ["l_orderkey", "l_partkey"], [("*", "count", "_c")])
    ic = grouped_aggregate(li, ["l_partkey"],
                           [("*", "count", "c")]).to_pandas()
    n_orders = float(grouped_aggregate(
        li, ["l_orderkey"], [("*", "count", "_c")]).num_rows)
    supp = dict(zip(ic["l_partkey"].astype(int), ic["c"].astype(float)))
    ref = ray.put(supp) if ray.is_initialized() else supp

    def lift(b: pa.Table) -> pa.Table:
        s = ray.get(ref) if ray.is_initialized() else ref
        n = np.asarray(b["n"].combine_chunks(), dtype=np.float64)
        keep = n >= 2
        b2 = b.filter(pa.array(keep))
        if b2.num_rows == 0:
            return pa.table({"p1": pa.array([], pa.int64()),
                             "p2": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "lift": pa.array([], pa.float64())})
        p1 = b2["p1"].to_pylist()
        p2 = b2["p2"].to_pylist()
        ca = np.array([s[x] for x in p1])
        cb = np.array([s[x] for x in p2])
        lv = n[keep] * n_orders / (ca * cb)
        return pa.table({"p1": b2["p1"], "p2": b2["p2"],
                         "n": pc.cast(b2["n"], pa.int64()),
                         "lift": pa.array(lv, pa.float64())})

    scored = pair_counts.map_batches(lift, batch_format="pyarrow",
                                     batch_size=None)
    best = topk(scored, sort_cols=["lift", "p1", "p2"],
                descending=[True, False, False], k=20)
    if "p1" not in best.column_names:  # no multi-item baskets at all
        z = pa.array([], pa.int64())
        return pa.table({"p1": z, "p2": z, "n": z, "lift_milli": z})
    return pa.table({
        "p1": best["p1"], "p2": best["p2"], "n": best["n"],
        "lift_milli": pc.cast(pc.floor(pc.multiply(best["lift"],
                                                   pa.scalar(1000.0))),
                              pa.int64()),
    })


@query(
    "events_time_weighted_avg",
    """
WITH o AS (
  SELECT user_id, value, epoch_us(ts) AS t,
         LEAD(epoch_us(ts)) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS nxt
  FROM events
), w AS (
  SELECT user_id, value, (nxt - t) AS dur FROM o WHERE nxt IS NOT NULL
)
SELECT user_id,
       CAST(FLOOR(1e6 * SUM(value * dur) / SUM(dur)) AS BIGINT)
         AS twa_micro,
       CAST(SUM(dur) AS BIGINT) AS span_us
FROM w GROUP BY 1""",
)
def events_time_weighted_avg(sf_dir: str):
    """Time-weighted average of a metric per entity (the TWAP /
    duration-weighted gauge every telemetry backend provides — a value
    holds until the next observation): segment-aware LEAD durations
    from one sorted pass per complete-user partition, then a plain
    weighted-sum aggregate. Exchange = per-user partials only."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import partitioned_group_apply

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_id", "ts", "value"])

    def twa(part: pa.Table) -> pa.Table:
        def col(name):
            c = part[name]
            return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c

        uid = np.asarray(col("user_id"), dtype=np.int64)
        eid = np.asarray(col("event_id"), dtype=np.int64)
        t = np.asarray(col("ts")).astype("datetime64[us]").astype(np.int64)
        v = np.asarray(col("value"), dtype=np.float64)
        n = len(uid)
        if n == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "twa_micro": pa.array([], pa.int64()),
                             "span_us": pa.array([], pa.int64())})
        order = np.lexsort((eid, t, uid))
        u_s, t_s, v_s = uid[order], t[order], v[order]
        same = np.zeros(n, dtype=bool)
        same[:-1] = u_s[1:] == u_s[:-1]
        dur = np.zeros(n, dtype=np.int64)
        dur[:-1] = t_s[1:] - t_s[:-1]
        dur[~same] = 0
        wsum = np.zeros(n, dtype=np.float64)
        np.multiply(v_s, dur, out=wsum)
        starts = np.ones(n, dtype=bool)
        starts[1:] = u_s[1:] != u_s[:-1]
        sid = np.cumsum(starts) - 1
        k = int(starts.sum())
        tot_w = np.bincount(sid, weights=wsum, minlength=k)
        tot_d = np.bincount(sid, weights=dur, minlength=k)
        users = u_s[np.flatnonzero(starts)]
        keep = tot_d > 0
        return pa.table({
            "user_id": pa.array(users[keep]),
            "twa_micro": pa.array(np.floor(
                1e6 * tot_w[keep] / tot_d[keep]).astype(np.int64)),
            "span_us": pa.array(tot_d[keep].astype(np.int64)),
        })

    return partitioned_group_apply(ds, ["user_id"], twa)


@query(
    "events_null_audit",
    """
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS null_user_id,
       CAST(SUM(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS null_event_type,
       CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS null_value,
       CAST(SUM(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS null_props
FROM events""",
)
def events_null_audit(sf_dir: str):
    """Data-quality null audit (the schema-health report an ingestion
    pipeline publishes per batch): per-column null counts in one
    streaming pass of constant-size partials — Arrow null bitmaps make
    each column's count a popcount, no value scan."""
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate

    COLS = ["user_id", "event_type", "value", "props"]
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=COLS)

    def partial(b: pa.Table) -> pa.Table:
        out = {"n_rows": pa.array([b.num_rows], pa.int64())}
        for c in COLS:
            out[f"null_{c}"] = pa.array([b[c].null_count], pa.int64())
        out["_k"] = pa.array([0], pa.int64())
        return pa.table(out)

    agg = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        ["_k"],
        [("n_rows", "sum", "n_rows")]
        + [(f"null_{c}", "sum", f"null_{c}") for c in COLS])
    return agg.drop_columns(["_k"])


@query(
    "ri_audit",
    """
SELECT
  (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
   WHERE NOT EXISTS (SELECT 1 FROM orders o
                     WHERE o.o_orderkey = l.l_orderkey))
    AS orphan_lineitems,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM orders o
   WHERE NOT EXISTS (SELECT 1 FROM customer c
                     WHERE c.c_custkey = o.o_custkey))
    AS orphan_orders,
  (SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) FROM orders)
    AS active_customers,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM customer) AS customers""",
)
def ri_audit(sf_dir: str):
    """Referential-integrity audit across the star schema (the
    ingestion health check: orphan facts, dangling foreign keys, dim
    coverage). Each orphan count is a Bloom-prefiltered anti-join —
    distinct keys of the small side broadcast as a sorted array, facts
    stream one searchsorted membership pass; counts are the only
    exchange."""
    import numpy as np
    import ray
    import ray.data as rd

    def keys_of(table: str, col: str) -> np.ndarray:
        ds = rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=[col])
        parts = [np.unique(np.asarray(b[col].combine_chunks(),
                                      dtype=np.int64))
                 for b in ds.iter_batches(batch_format="pyarrow",
                                          batch_size=None)]
        return np.unique(np.concatenate(parts)) if parts else \
            np.array([], dtype=np.int64)

    def orphan_count(table: str, col: str, ref_keys: np.ndarray) -> int:
        ref = ray.put(ref_keys) if ray.is_initialized() else ref_keys
        ds = rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=[col])

        def miss(b: pa.Table) -> pa.Table:
            ks = ray.get(ref) if ray.is_initialized() else ref
            x = np.asarray(b[col].combine_chunks(), dtype=np.int64)
            pos = np.clip(np.searchsorted(ks, x), 0, max(len(ks) - 1, 0))
            n_miss = int((ks[pos] != x).sum()) if len(ks) else len(x)
            return pa.table({"m": pa.array([n_miss], pa.int64())})

        return int(ds.map_batches(miss, batch_format="pyarrow",
                                  batch_size=None).sum("m"))

    okeys = keys_of("orders", "o_orderkey")
    ckeys = keys_of("customer", "c_custkey")
    ocust = keys_of("orders", "o_custkey")
    n_cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                             columns=["c_custkey"]).count()
    return pa.table({
        "orphan_lineitems": pa.array(
            [orphan_count("lineitem", "l_orderkey", okeys)], pa.int64()),
        "orphan_orders": pa.array(
            [orphan_count("orders", "o_custkey", ckeys)], pa.int64()),
        "active_customers": pa.array([len(ocust)], pa.int64()),
        "customers": pa.array([n_cust], pa.int64()),
    })


@query(
    "events_ewma_daily",
    """
WITH c AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, COUNT(*) AS n
  FROM events GROUP BY 1, 2
), r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS i
  FROM c
), e AS (
  SELECT a.event_type, a.day, a.n,
         SUM(b.n * CASE WHEN b.i = 1 THEN POWER(0.5, a.i - 1)
                        ELSE 0.5 * POWER(0.5, a.i - b.i) END) AS ew
  FROM r a JOIN r b ON a.event_type = b.event_type AND b.i <= a.i
  GROUP BY 1, 2, 3
)
SELECT event_type, day, n, CAST(FLOOR(1000 * ew) AS BIGINT) AS ewma_milli
FROM e""",
)
def events_ewma_daily(sf_dir: str):
    """EWMA-smoothed daily volume per type (the smoothed trend line
    behind every ops dashboard and its alert baseline). The corpus pass
    is the (type, day) count aggregate; the recursive smoothing runs on
    the cells-bounded series — inherently sequential per series, and
    the series is days-long, not data-long, so that is the right place
    for it. alpha = 0.5 deliberately: every EWMA value is then an exact
    binary fraction, so the recursion here and the POWER-sum window
    restatement in DuckDB agree bit-for-bit (a decimal alpha lands
    float noise exactly on FLOOR boundaries — measured)."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate
    import pyarrow.compute as pc

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
    out = []
    for et, g in c.groupby("event_type"):
        g = g.sort_values("day")
        x = g["n"].to_numpy().astype(np.float64)
        e = np.empty(len(x))
        e[0] = x[0]
        for i in range(1, len(x)):
            e[i] = 0.5 * x[i] + 0.5 * e[i - 1]
        for d, n, ew in zip(g["day"], g["n"], e):
            out.append((et, d, int(n), int(np.floor(1000 * ew))))
    out.sort()
    return pa.table({
        "event_type": pa.array([r[0] for r in out], pa.string()),
        "day": pa.array([r[1] for r in out], pa.string()),
        "n": pa.array([r[2] for r in out], pa.int64()),
        "ewma_milli": pa.array([r[3] for r in out], pa.int64()),
    })


@query(
    "orders_benford_audit",
    """
WITH d AS (
  SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR),
              1, 1) AS BIGINT) AS digit
  FROM orders WHERE o_totalprice >= 1
), c AS (
  SELECT digit, COUNT(*) AS n FROM d GROUP BY 1
), t AS (SELECT SUM(n) AS tot FROM c)
SELECT c.digit, c.n,
       CAST(FLOOR(1e6 * c.n / t.tot) AS BIGINT) AS observed_micro,
       CAST(FLOOR(1e6 * ln(1.0 + 1.0 / c.digit) / ln(10.0)) AS BIGINT)
         AS benford_micro
FROM c CROSS JOIN t""",
)
def orders_benford_audit(sf_dir: str):
    """Benford's-law leading-digit audit of order totals (the synthetic
    / fabricated-data forensic: natural multiplicative quantities
    follow P(d) = log10(1 + 1/d); uniform generators do not).
    Leading digit extracted vectorized from the integer part's decimal
    magnitude, digit counts are a 9-row aggregate, expectations join
    driver-side. One streaming pass."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_totalprice"])

    def digit(b: pa.Table) -> pa.Table:
        x = np.asarray(b["o_totalprice"].combine_chunks(),
                       dtype=np.float64)
        xi = x.astype(np.int64)
        lead = xi[xi >= 1]
        # exact integer strip (≤19 passes) — float log10 is off-by-one
        # ulp on exact powers of ten
        while (lead >= 10).any():
            big = lead >= 10
            lead[big] //= 10
        return pa.table({"digit": pa.array(lead.astype(np.int64))})

    c = grouped_aggregate(
        ds.map_batches(digit, batch_format="pyarrow", batch_size=None),
        ["digit"], [("*", "count", "n")]).to_pandas().sort_values("digit")
    tot = float(c["n"].sum())
    d = c["digit"].to_numpy().astype(np.float64)
    return pa.table({
        "digit": pa.array(c["digit"].to_numpy().astype(np.int64)),
        "n": pa.array(c["n"].to_numpy().astype(np.int64)),
        "observed_micro": pa.array(
            np.floor(1e6 * c["n"].to_numpy() / tot).astype(np.int64)),
        "benford_micro": pa.array(
            np.floor(1e6 * np.log(1.0 + 1.0 / d) / np.log(10.0))
            .astype(np.int64)),
    })


@query(
    "docs_ks_by_source",
    """
WITH c AS (SELECT source, n_chars AS v, COUNT(*) AS n
           FROM documents GROUP BY 1, 2),
vals AS (SELECT DISTINCT n_chars AS v FROM documents),
srcs AS (SELECT DISTINCT source FROM documents),
grid AS (SELECT s.source, va.v, COALESCE(c.n, 0) AS n
         FROM srcs s CROSS JOIN vals va
         LEFT JOIN c ON c.source = s.source AND c.v = va.v),
cum AS (SELECT source, v,
               SUM(n) OVER (PARTITION BY source ORDER BY v) AS cs,
               SUM(n) OVER (PARTITION BY source) AS ns
        FROM grid),
tot AS (SELECT v, SUM(n) OVER (ORDER BY v) AS ct, SUM(n) OVER () AS nt
        FROM (SELECT v, SUM(n) AS n FROM grid GROUP BY 1)),
d AS (SELECT cum.source,
             abs(cum.cs * 1.0 / cum.ns
                 - (tot.ct - cum.cs) * 1.0 / (tot.nt - cum.ns)) AS dv
      FROM cum JOIN tot USING (v))
SELECT source, CAST(FLOOR(1000 * MAX(dv)) AS BIGINT) AS ks_milli
FROM d GROUP BY 1""",
)
def docs_ks_by_source(sf_dir: str):
    """Two-sample Kolmogorov-Smirnov statistic per source (each
    source's length distribution vs the rest of the corpus — the
    distribution-shift audit behind "is this source sampled from the
    same population?"). The only corpus pass is the (source, value)
    count aggregate (sources × distinct-lengths bounded); empirical
    CDFs and the sup-norm evaluate on that grid with the SAME float
    expression as the SQL restatement (exact integer operands → the
    doubles agree bit-for-bit)."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["source", "n_chars"])
    c = grouped_aggregate(ds, ["source", "n_chars"],
                          [("*", "count", "n")]).to_pandas()
    piv = c.pivot_table(index="n_chars", columns="source", values="n",
                        fill_value=0, aggfunc="sum").sort_index()
    mat = piv.to_numpy().astype(np.int64)           # values × sources
    cs = np.cumsum(mat, axis=0).astype(np.float64)  # per-source cum
    ns = mat.sum(axis=0).astype(np.float64)
    ct = cs.sum(axis=1)                             # global cum (exact)
    nt = float(ns.sum())
    dv = np.abs(cs * 1.0 / ns - (ct[:, None] - cs) * 1.0 / (nt - ns))
    ks = dv.max(axis=0)
    return pa.table({
        "source": pa.array(list(piv.columns), pa.string()),
        "ks_milli": pa.array(np.floor(1000 * ks).astype(np.int64)),
    })


@query(
    "dedup_cluster_sizes",
    "WITH RECURSIVE " + _NGRAM_PAIRS_CTE + """
, sizes AS (
  SELECT cluster_id, COUNT(*) AS sz FROM cc GROUP BY 1
)
SELECT sz, COUNT(*) AS n_clusters FROM sizes GROUP BY 1""",
)
def dedup_cluster_sizes(sf_dir: str):
    """Duplication profile: near-dup cluster size histogram (how much
    of the corpus is duplicated, and in how large families — the
    summary a dedup report leads with). Cluster labels come from the
    distributed connected-components pass; sizes are a per-label count
    (high-cardinality-safe), the histogram is a count-of-counts — the
    same two-level shape as the Gini query."""
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate, grouped_aggregate_ds
    from raylog.functions.cc import connected_components
    from raylog.functions.dedup import ngram_jaccard_pairs

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    pairs = ngram_jaccard_pairs(docs, threshold=0.3)
    cc = connected_components(docs.select_columns(["doc_id"]), pairs)
    sizes = grouped_aggregate_ds(cc, ["cluster_id"],
                                 [("*", "count", "sz")])
    return grouped_aggregate(sizes, ["sz"], [("*", "count", "n_clusters")])


@query(
    "text_zipf_exponent",
    """
WITH words AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
wc AS (SELECT w, COUNT(*) AS c FROM words GROUP BY 1),
r AS (SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, w) AS rank FROM wc),
f AS (SELECT ln(CAST(rank AS DOUBLE)) AS x, ln(CAST(c AS DOUBLE)) AS y
      FROM r WHERE rank <= 1000)
SELECT CAST(COUNT(*) AS BIGINT) AS n_ranks,
       CAST(FLOOR(1e6 * REGR_SLOPE(y, x)) AS BIGINT) AS zipf_slope_micro,
       CAST(FLOOR(1e6 * REGR_R2(y, x)) AS BIGINT) AS r2_micro
FROM f""",
)
def text_zipf_exponent(sf_dir: str):
    """Zipf-law fit of the word frequency distribution (the canonical
    corpus-health statistic: natural language has rank-frequency slope
    ≈ -1; templated/synthetic text deviates): log-log least-squares
    over the top-1000 ranks, slope + R².

    Word counts flow through the hash-partitioned aggregate; ranking
    the top-1000 is a partial top-k; the regression is closed-form on
    1000 points driver-side. Same five-moment arithmetic as
    `events_user_trend`, restated exactly in SQL REGR_* form."""
    import numpy as np
    import ray.data as rd
    import pyarrow.compute as pc

    from raylog.functions.agg import grouped_aggregate_ds
    from raylog.functions.topk import topk

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def wcounts(b: pa.Table) -> pa.Table:
        split = pc.split_pattern(b["text"].combine_chunks(), " ")
        flat = split.flatten().dictionary_encode()
        codes = np.asarray(flat.indices, dtype=np.int64)
        uc, cnt = np.unique(codes, return_counts=True)
        return pa.table({"w": flat.dictionary.take(pa.array(uc)),
                         "c": pa.array(cnt, pa.int64())})

    wc = grouped_aggregate_ds(
        ds.map_batches(wcounts, batch_format="pyarrow", batch_size=None),
        ["w"], [("c", "sum", "c")])
    top = topk(wc, sort_cols=["c", "w"], descending=[True, False], k=1000)
    c = np.asarray(top["c"], dtype=np.float64)
    if len(c) < 2:  # OLS slope undefined on <2 rank points
        z = pa.array([], pa.int64())
        return pa.table({"n_ranks": z, "zipf_slope_micro": z,
                         "r2_micro": z})
    rank = np.arange(1, len(c) + 1, dtype=np.float64)
    x, y = np.log(rank), np.log(c)
    n = float(len(x))
    sx, sy, sxy, sxx, syy = x.sum(), y.sum(), (x * y).sum(), \
        (x * x).sum(), (y * y).sum()
    slope = (sxy - sx * sy / n) / (sxx - sx * sx / n)
    r2 = ((sxy - sx * sy / n) ** 2
          / ((sxx - sx * sx / n) * (syy - sy * sy / n)))
    return pa.table({
        "n_ranks": pa.array([int(n)], pa.int64()),
        "zipf_slope_micro": pa.array([int(np.floor(1e6 * slope))],
                                     pa.int64()),
        "r2_micro": pa.array([int(np.floor(1e6 * r2))], pa.int64()),
    })


@query(
    "events_entropy_rate",
    """
WITH o AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
  FROM events
), t AS (
  SELECT prev AS a, event_type AS b, COUNT(*) AS n
  FROM o WHERE prev IS NOT NULL GROUP BY 1, 2
), m AS (SELECT a, SUM(n) AS na FROM t GROUP BY 1),
tot AS (SELECT SUM(n) AS nn FROM t)
SELECT CAST(tot.nn AS BIGINT) AS n_transitions,
       CAST(FLOOR(1e6 * SUM((t.n * 1.0 / tot.nn)
            * -ln(t.n * 1.0 / m.na) / ln(2.0))) AS BIGINT)
         AS h_cond_micro
FROM t JOIN m USING (a) CROSS JOIN tot
GROUP BY tot.nn""",
)
def events_entropy_rate(sf_dir: str):
    """Behavioral predictability: the first-order entropy rate
    H(next | prev) in bits over the event-type Markov chain (low =
    deterministic habits, high = noise — the sessionization QA metric).
    Reuses the transition-pair machinery (segmented shift per
    complete-user partition, types²-bounded matrix); the entropy sum
    evaluates on that tiny matrix driver-side."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate, partitioned_group_apply

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_id", "ts",
                                  "event_type"])

    def pairs(part: pa.Table) -> pa.Table:
        def col(name):
            c = part[name]
            return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c

        uid = np.asarray(col("user_id"), dtype=np.int64)
        eid = np.asarray(col("event_id"), dtype=np.int64)
        t = np.asarray(col("ts")).astype("datetime64[us]").astype(np.int64)
        et = col("event_type").dictionary_encode()
        codes = np.asarray(et.indices, dtype=np.int64)
        n = len(uid)
        if n == 0:
            return pa.table({"a": pa.array([], pa.string()),
                             "b": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        order = np.lexsort((eid, t, uid))
        u_s, c_s = uid[order], codes[order]
        same = u_s[1:] == u_s[:-1]
        nv = len(et.dictionary)
        key = c_s[:-1][same] * nv + c_s[1:][same]
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table({
            "a": et.dictionary.take(pa.array(uk // nv)),
            "b": et.dictionary.take(pa.array(uk % nv)),
            "n": pa.array(cnt.astype(np.int64)),
        })

    pr = partitioned_group_apply(ds, ["user_id"], pairs)
    mat = grouped_aggregate(pr, ["a", "b"], [("n", "sum", "n")]).to_pandas()
    if "a" not in mat.columns:  # no user has 2+ events: no transitions
        return pa.table({
            "n_transitions": pa.array([0], pa.int64()),
            "h_cond_micro": pa.array([0], pa.int64()),
        })
    na = mat.groupby("a")["n"].transform("sum").to_numpy().astype(np.float64)
    nn = float(mat["n"].sum())
    p = mat["n"].to_numpy().astype(np.float64)
    h = ((p / nn) * -np.log(p / na) / np.log(2.0)).sum()
    return pa.table({
        "n_transitions": pa.array([int(nn)], pa.int64()),
        "h_cond_micro": pa.array([int(np.floor(1e6 * h))], pa.int64()),
    })


@query(
    "log_slo_report",
    _P() + """
SELECT source,
       COUNT(*) AS n_lines,
       CAST(SUM(CASE WHEN upper(level) = 'ERROR' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_errors,
       CAST(FLOOR(1e6 * SUM(CASE WHEN upper(level) = 'ERROR' THEN 1
                                 ELSE 0 END) * 1.0 / COUNT(*)) AS BIGINT)
         AS err_rate_micro,
       SUM(CASE WHEN upper(level) = 'ERROR' THEN 1 ELSE 0 END) * 1.0
         / COUNT(*) > 0.01 AS slo_violated
FROM recs2 GROUP BY source""",
)
def log_slo_report(sf_dir: str):
    """Per-source error-rate SLO report (the availability dashboard a
    log pipeline feeds: error fraction vs a 1% budget, violation
    flag). Level comes from the engine's own parse chain; counts are
    sources-bounded partial+tree aggregates — one streaming pass over
    the parsed stream."""
    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate
    from raylog.pipelines import log_pipeline as LP
    from raylog.stages import parse

    ds = LP.parsed_ds(LP.records_ds(sf_dir))
    ds = ds.map_batches(lambda b: parse.erda_info(b, key="log"),
                        batch_format="pyarrow")

    def flags(b: pa.Table) -> pa.Table:
        lvl = b["level"].combine_chunks()
        is_err = pc.equal(pc.utf8_upper(pc.fill_null(lvl, "")),
                          pa.scalar("ERROR"))
        return pa.table({
            "source": b["source"],
            "e": pc.cast(is_err, pa.int64()),
        })

    agg = grouped_aggregate(
        ds.map_batches(flags, batch_format="pyarrow", batch_size=None),
        ["source"], [("*", "count", "n_lines"), ("e", "sum", "n_errors")])
    n = np.asarray(agg["n_lines"], dtype=np.float64)
    e = np.asarray(agg["n_errors"], dtype=np.float64)
    return pa.table({
        "source": agg["source"],
        "n_lines": agg["n_lines"],
        "n_errors": agg["n_errors"],
        "err_rate_micro": pa.array(np.floor(1e6 * e / n).astype(np.int64)),
        "slo_violated": pa.array(e / n > 0.01),
    })


@query(
    "events_anomaly_robust",
    """
WITH c AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, COUNT(*) AS n
  FROM events GROUP BY 1, 2
), m AS (
  SELECT event_type, quantile_disc(n, 0.5) AS med FROM c GROUP BY 1
), a AS (
  SELECT c.event_type, c.day, c.n, m.med, abs(c.n - m.med) AS adev
  FROM c JOIN m USING (event_type)
), md AS (
  SELECT event_type, quantile_disc(adev, 0.5) AS mad FROM a GROUP BY 1
)
SELECT a.event_type, a.day, a.n,
       a.n - a.med > 3 * md.mad AS is_spike
FROM a JOIN md USING (event_type) WHERE md.mad > 0""",
)
def events_anomaly_robust(sf_dir: str):
    """Robust (median/MAD) daily-volume spike detection — the
    outlier-resistant twin of `events_anomaly`: a single extreme day
    inflates mean/std and hides itself, but not the median/MAD fences
    (spike = count > median + 3·MAD, all integer-exact arithmetic).
    The corpus pass is the (type, day) count aggregate; medians come
    from the cells-bounded series."""
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
    out = []
    for et, g in c.groupby("event_type"):
        n = np.sort(g["n"].to_numpy().astype(np.int64))
        med = int(n[(len(n) - 1) // 2])  # quantile_disc(0.5) rank rule
        adev = np.sort(np.abs(g["n"].to_numpy().astype(np.int64) - med))
        mad = int(adev[(len(adev) - 1) // 2])
        if mad <= 0:
            continue
        for d, cnt in zip(g["day"], g["n"]):
            out.append((et, d, int(cnt), int(cnt) - med > 3 * mad))
    out.sort()
    return pa.table({
        "event_type": pa.array([r[0] for r in out], pa.string()),
        "day": pa.array([r[1] for r in out], pa.string()),
        "n": pa.array([r[2] for r in out], pa.int64()),
        "is_spike": pa.array([r[3] for r in out], pa.bool_()),
    })


@query(
    "docs_histogram_by_source",
    """
WITH s AS (
  SELECT source, CAST(MIN(n_chars) AS DOUBLE) AS lo,
         CAST(MAX(n_chars) AS DOUBLE) AS hi
  FROM documents GROUP BY 1
)
SELECT d.source,
       LEAST(CAST(FLOOR((d.n_chars - s.lo) * 16.0 / (s.hi - s.lo + 1.0))
                  AS BIGINT), 15) AS bin,
       COUNT(*) AS n
FROM documents d JOIN s USING (source)
GROUP BY 1, 2""",
)
def docs_histogram_by_source(sf_dir: str):
    """Per-group fixed-bin histogram (the faceted distribution panel of
    a data-quality dashboard): each source gets 16 bins over its own
    [min, max]. Pass 1 is a sources-bounded min/max aggregate
    (broadcast); pass 2 emits (source, bin) count partials — exchange
    bounded by sources × 16, independent of rows (the grouped form of
    `docs_histogram`)."""
    import numpy as np
    import ray
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate

    NBINS = 16
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["source", "n_chars"])
    mm = grouped_aggregate(ds, ["source"],
                           [("n_chars", "min", "lo"),
                            ("n_chars", "max", "hi")]).to_pandas()
    lut = {r.source: (float(r.lo), float(r.hi)) for r in mm.itertuples()}
    ref = ray.put(lut) if ray.is_initialized() else lut

    def bins(b: pa.Table) -> pa.Table:
        m = ray.get(ref) if ray.is_initialized() else ref
        src = b["source"].to_pylist()
        x = np.asarray(b["n_chars"].combine_chunks(), dtype=np.float64)
        lo = np.array([m[s][0] for s in src])
        hi = np.array([m[s][1] for s in src])
        bn = np.minimum(np.floor((x - lo) * NBINS / (hi - lo + 1.0))
                        .astype(np.int64), NBINS - 1)
        return pa.table({"source": b["source"], "bin": pa.array(bn)})

    return grouped_aggregate(
        ds.map_batches(bins, batch_format="pyarrow", batch_size=None),
        ["source", "bin"], [("*", "count", "n")])


@query(
    "events_dod_returning",
    """
WITH a AS (
  SELECT DISTINCT user_id,
         CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) AS d
  FROM events
)
SELECT b.d AS day_epoch, COUNT(*) AS returning_users
FROM a b JOIN a p ON p.user_id = b.user_id AND p.d = b.d - 1
GROUP BY 1""",
)
def events_dod_returning(sf_dir: str):
    """Day-over-day returning users (the stickiness/churn series): for
    each day, how many active users were also active the previous day.

    No self-join: users hash-partition complete, each partition sorts
    its (user, day) pairs once and a segmented diff==1 test emits
    (day, 1) partials — the exchange is days-bounded counts. The same
    consecutive-pair trick as the Markov/watermark kernels."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate, partitioned_group_apply

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])

    def pairs(part: pa.Table) -> pa.Table:
        def col(name):
            c = part[name]
            return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c

        uid = np.asarray(col("user_id"), dtype=np.int64)
        t = np.asarray(col("ts")).astype("datetime64[us]").astype(np.int64)
        d = np.floor(t / 1e6 / 86400).astype(np.int64)
        if len(uid) == 0:
            return pa.table({"day_epoch": pa.array([], pa.int64())})
        uniq = np.unique(np.stack([uid, d], axis=1), axis=0)
        u_s, d_s = uniq[:, 0], uniq[:, 1]
        consec = (u_s[1:] == u_s[:-1]) & (d_s[1:] - d_s[:-1] == 1)
        return pa.table({"day_epoch": pa.array(d_s[1:][consec])})

    pr = partitioned_group_apply(ds, ["user_id"], pairs)
    return grouped_aggregate(pr, ["day_epoch"],
                             [("*", "count", "returning_users")])


@query(
    "events_changepoint",
    """
WITH c AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, COUNT(*) AS n
  FROM events GROUP BY 1, 2
), s AS (
  SELECT event_type, day, n,
         SUM(n) OVER (PARTITION BY event_type ORDER BY day) AS cum,
         SUM(n) OVER (PARTITION BY event_type) AS tot,
         COUNT(*) OVER (PARTITION BY event_type) AS k,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS i
  FROM c
), d AS (
  SELECT event_type, day,
         abs(cum - i * (tot * 1.0 / k)) AS cusum
  FROM s WHERE i < k
)
SELECT event_type, day AS change_day,
       CAST(FLOOR(1000 * cusum) AS BIGINT) AS cusum_milli
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                                   ORDER BY cusum DESC, day) AS rn
      FROM d)
WHERE rn = 1""",
)
def events_changepoint(sf_dir: str):
    """Changepoint detection per event type (the at-most-one-change
    CUSUM scan statistic: the day where the centered cumulative sum of
    daily counts peaks marks the most likely level shift). One
    (type, day) count pass; the scan statistic evaluates on the
    cells-bounded series with the identical float expression as the
    SQL window restatement."""
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
    out = []
    for et, g in c.groupby("event_type"):
        g = g.sort_values("day")
        n = g["n"].to_numpy().astype(np.int64)
        k = len(n)
        if k < 2:
            continue
        cum = np.cumsum(n).astype(np.float64)
        i = np.arange(1, k + 1, dtype=np.float64)
        tot = float(n.sum())
        cusum = np.abs(cum - i * (tot * 1.0 / k))
        cusum = cusum[:-1]  # i < k (the last point is always 0)
        best = int(np.argmax(cusum))  # first max = earliest day tie-break
        out.append((et, g["day"].iloc[best],
                    int(np.floor(1000 * cusum[best]))))
    out.sort()
    return pa.table({
        "event_type": pa.array([r[0] for r in out], pa.string()),
        "change_day": pa.array([r[1] for r in out], pa.string()),
        "cusum_milli": pa.array([r[2] for r in out], pa.int64()),
    })


@query(
    "events_pareto_users",
    """
WITH c AS (
  SELECT user_id, COUNT(*) AS n FROM events GROUP BY 1
), r AS (
  SELECT user_id, n,
         SUM(n) OVER (ORDER BY n DESC, user_id) AS cum,
         SUM(n) OVER () AS tot,
         ROW_NUMBER() OVER (ORDER BY n DESC, user_id) AS i,
         COUNT(*) OVER () AS k
  FROM c
)
SELECT CAST(MIN(i) AS BIGINT) AS users_for_80pct,
       CAST(MAX(k) AS BIGINT) AS n_users,
       CAST(FLOOR(1000.0 * MIN(i) / MAX(k)) AS BIGINT) AS frac_milli
FROM r WHERE cum * 1.0 / tot >= 0.8""",
)
def events_pareto_users(sf_dir: str):
    """Pareto 80/20 concentration: the smallest number of top users
    that account for 80% of all events (the "how head-heavy is this
    corpus" capacity-planning figure). Per-user counts hash-partition;
    only the count-of-counts histogram reaches the driver, and the
    cumulative-coverage threshold resolves on it exactly (heaviest
    users first = walking the histogram from the top; within a tie
    block the cumulative crosses 80% a computable number of users in)."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate, grouped_aggregate_ds

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    per_user = grouped_aggregate_ds(ds, ["user_id"],
                                    [("*", "count", "n")])
    hist = grouped_aggregate(per_user, ["n"],
                             [("*", "count", "m")]).to_pandas()
    hist = hist.sort_values("n", ascending=False)
    n = hist["n"].to_numpy().astype(np.float64)
    m = hist["m"].to_numpy().astype(np.int64)
    tot = float((n * m).sum())
    k = int(m.sum())
    users = 0
    cum = 0.0
    need = None
    for ni, mi in zip(n, m):
        # smallest j in this tie block with (cum + ni*j)/tot >= 0.8 —
        # closed form, but validated with the same float comparison the
        # SQL uses so boundary behavior is identical
        j = int(np.ceil((0.8 * tot - cum) / ni))
        j = max(j, 1)
        while j <= mi and not ((cum + ni * j) * 1.0 / tot >= 0.8):
            j += 1
        if j <= mi and (cum + ni * j) * 1.0 / tot >= 0.8:
            need = users + j
            break
        cum += ni * mi
        users += mi
    return pa.table({
        "users_for_80pct": pa.array([need], pa.int64()),
        "n_users": pa.array([k], pa.int64()),
        "frac_milli": pa.array([int(np.floor(1000.0 * need / k))],
                               pa.int64()),
    })


@query(
    "orders_rfm_segments",
    """
WITH base AS (
  SELECT o_custkey,
         CAST(FLOOR(epoch(o_orderdate) / 86400) AS BIGINT) AS od,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
), g AS (
  SELECT o_custkey, MAX(od) AS last_od, COUNT(*) AS f,
         CAST(SUM(cents) AS BIGINT) AS m_cents
  FROM base GROUP BY 1
), mx AS (SELECT MAX(od) AS d FROM base),
rfm AS (
  SELECT o_custkey, mx.d - last_od AS r, f, m_cents
  FROM g CROSS JOIN mx
), q AS (
  SELECT quantile_disc(r, 0.25) AS r1, quantile_disc(r, 0.5) AS r2,
         quantile_disc(r, 0.75) AS r3,
         quantile_disc(f, 0.25) AS f1, quantile_disc(f, 0.5) AS f2,
         quantile_disc(f, 0.75) AS f3,
         quantile_disc(m_cents, 0.25) AS m1,
         quantile_disc(m_cents, 0.5) AS m2,
         quantile_disc(m_cents, 0.75) AS m3
  FROM rfm
)
SELECT o_custkey, r, f, m_cents,
       1 + CASE WHEN r > q.r1 THEN 1 ELSE 0 END
         + CASE WHEN r > q.r2 THEN 1 ELSE 0 END
         + CASE WHEN r > q.r3 THEN 1 ELSE 0 END AS r_score,
       1 + CASE WHEN f > q.f1 THEN 1 ELSE 0 END
         + CASE WHEN f > q.f2 THEN 1 ELSE 0 END
         + CASE WHEN f > q.f3 THEN 1 ELSE 0 END AS f_score,
       1 + CASE WHEN m_cents > q.m1 THEN 1 ELSE 0 END
         + CASE WHEN m_cents > q.m2 THEN 1 ELSE 0 END
         + CASE WHEN m_cents > q.m3 THEN 1 ELSE 0 END AS m_score
FROM rfm CROSS JOIN q""",
)
def orders_rfm_segments(sf_dir: str):
    """RFM customer segmentation (recency / frequency / monetary
    quartile scores — the marketing-analytics classic): per-customer
    aggregates through the hash-partitioned combine (money as exact
    integer cents — per-row round-half-up BEFORE summing, so both
    engines sum identical integers), quartile thresholds from the
    exact distributed-quantile kernel, scores = strictly-greater
    threshold counts (integer-exact). At petabyte scale the monetary
    thresholds would come from a coarser-unit bounded histogram; the
    rest is cardinality-bounded as-is."""
    import numpy as np
    import ray
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate_ds
    from raylog.functions.quantile import grouped_quantiles

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_custkey", "o_orderdate",
                                  "o_totalprice"])

    def base(b: pa.Table) -> pa.Table:
        od = (np.asarray(b["o_orderdate"].combine_chunks())
              .astype("datetime64[us]").astype(np.int64))
        od = np.floor(od / 1e6 / 86400).astype(np.int64)
        cents = np.floor(np.asarray(b["o_totalprice"].combine_chunks(),
                                    dtype=np.float64) * 100 + 0.5
                         ).astype(np.int64)
        return pa.table({"o_custkey": b["o_custkey"],
                         "od": pa.array(od),
                         "cents": pa.array(cents)})

    bs = ds.map_batches(base, batch_format="pyarrow", batch_size=None)
    g = grouped_aggregate_ds(bs, ["o_custkey"],
                             [("od", "max", "last_od"),
                              ("*", "count", "f"),
                              ("cents", "sum", "m_cents")])
    d_max = int(bs.max("od"))

    def mk_rfm(b: pa.Table) -> pa.Table:
        last = np.asarray(b["last_od"].combine_chunks(), dtype=np.int64)
        return pa.table({
            "o_custkey": b["o_custkey"],
            "r": pa.array(d_max - last),
            "f": pa.array(np.asarray(b["f"].combine_chunks(),
                                     dtype=np.int64)),
            "m_cents": pa.array(np.asarray(b["m_cents"].combine_chunks(),
                                           dtype=np.int64)),
        })

    rfm = g.map_batches(mk_rfm, batch_format="pyarrow", batch_size=None)

    def one_key(b: pa.Table) -> pa.Table:
        return b.append_column("_k", pa.array([0] * b.num_rows,
                                              pa.int64()))

    keyed = rfm.map_batches(one_key, batch_format="pyarrow",
                            batch_size=None)
    qs = {}
    for colname in ["r", "f", "m_cents"]:
        qt = grouped_quantiles(keyed, key="_k", value=colname,
                               ps=[0.25, 0.5, 0.75],
                               out_names=["q1", "q2", "q3"]).to_pandas()
        qs[colname] = (int(qt["q1"][0]), int(qt["q2"][0]),
                       int(qt["q3"][0]))
    ref = ray.put(qs) if ray.is_initialized() else qs

    def score(b: pa.Table) -> pa.Table:
        q = ray.get(ref) if ray.is_initialized() else ref

        def sc(col):
            v = np.asarray(b[col].combine_chunks(), dtype=np.int64)
            t1, t2, t3 = q[col]
            return 1 + (v > t1).astype(np.int64) + (v > t2) + (v > t3)

        return pa.table({
            "o_custkey": b["o_custkey"], "r": b["r"], "f": b["f"],
            "m_cents": b["m_cents"],
            "r_score": pa.array(sc("r")),
            "f_score": pa.array(sc("f")),
            "m_score": pa.array(sc("m_cents")),
        })

    return rfm.map_batches(score, batch_format="pyarrow", batch_size=None)


@query(
    "events_bounce_rate",
    """
WITH e AS (
  SELECT user_id, event_id, epoch(ts) AS t FROM events
), d AS (
  SELECT *, CASE WHEN t - LAG(t) OVER (PARTITION BY user_id
                                       ORDER BY t, event_id) > 1800
                   OR LAG(t) OVER (PARTITION BY user_id
                                   ORDER BY t, event_id) IS NULL
            THEN 1 ELSE 0 END AS new_session
  FROM e
), s AS (
  SELECT user_id,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY t, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_no
  FROM d
), g AS (
  SELECT user_id, session_no, COUNT(*) AS n_events
  FROM s GROUP BY 1, 2
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bounces,
       CAST(FLOOR(1000.0 * SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
            / COUNT(*)) AS BIGINT) AS bounce_milli
FROM g""",
)
def events_bounce_rate(sf_dir: str):
    """Bounce rate (share of single-event sessions under the 30-min
    gap rule — the engagement KPI distilled from sessionization): the
    proven session-window kernel produces per-session event counts;
    the rate reduces over constant-size per-block partials — sessions
    never materialize on the driver."""
    import numpy as np
    import pyarrow.compute as pc

    sessions = QUERIES["events_sessionize"](sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        ne = t["n_events"].combine_chunks()
        nb = pc.sum(pc.cast(pc.equal(ne, pa.scalar(1)), pa.int64())).as_py()
        return pa.table({
            "n": pa.array([t.num_rows], pa.int64()),
            "b": pa.array([int(nb or 0)], pa.int64()),
        })

    parts = sessions.map_batches(partial, batch_format="pyarrow",
                                 batch_size=None)
    n = int(parts.sum("n"))
    b = int(parts.sum("b"))
    return pa.table({
        "n_sessions": pa.array([n], pa.int64()),
        "n_bounces": pa.array([b], pa.int64()),
        "bounce_milli": pa.array([int(np.floor(1000.0 * b / n))],
                                 pa.int64()),
    })


@query(
    "events_rolling_7d",
    """
WITH c AS (
  SELECT event_type, CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) AS d,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT a.event_type, a.d AS day_epoch, a.n,
       CAST(SUM(b.n) AS BIGINT) AS sum_7d
FROM c a JOIN c b ON a.event_type = b.event_type
                 AND b.d BETWEEN a.d - 6 AND a.d
GROUP BY 1, 2, 3""",
)
def events_rolling_7d(sf_dir: str):
    """Rolling 7-day window sum per type (the RANGE-frame windowed
    aggregate — trailing weekly volume behind every rate dashboard):
    one (type, day) count pass; the rolling sum evaluates on the
    cells-bounded series via a vectorized two-pointer pass over the
    sorted day axis (exact gaps respected — a missing day contributes
    nothing, matching the RANGE frame, not a ROWS frame)."""
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
    out = []
    for et, g in c.groupby("event_type"):
        g = g.sort_values("d")
        d = g["d"].to_numpy().astype(np.int64)
        n = g["n"].to_numpy().astype(np.int64)
        cum = np.concatenate([[0], np.cumsum(n)])
        lo = np.searchsorted(d, d - 6, side="left")
        s7 = cum[np.arange(1, len(d) + 1)] - cum[lo]
        for di, ni, si in zip(d, n, s7):
            out.append((et, int(di), int(ni), int(si)))
    out.sort()
    return pa.table({
        "event_type": pa.array([r[0] for r in out], pa.string()),
        "day_epoch": pa.array([r[1] for r in out], pa.int64()),
        "n": pa.array([r[2] for r in out], pa.int64()),
        "sum_7d": pa.array([r[3] for r in out], pa.int64()),
    })


@query(
    "events_weekday_ratio",
    """
WITH c AS (
  SELECT event_type, CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) AS d,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2
), t AS (
  SELECT event_type, ((d + 4) % 7) IN (5, 6) AS is_weekend, n FROM c
)
SELECT event_type,
       CAST(SUM(CASE WHEN is_weekend THEN 0 ELSE n END) AS BIGINT)
         AS weekday_events,
       CAST(SUM(CASE WHEN is_weekend THEN n ELSE 0 END) AS BIGINT)
         AS weekend_events,
       CAST(COUNT(CASE WHEN NOT is_weekend THEN 1 END) AS BIGINT)
         AS weekdays,
       CAST(COUNT(CASE WHEN is_weekend THEN 1 END) AS BIGINT) AS weekends,
       CAST(FLOOR(1000.0
            * (SUM(CASE WHEN is_weekend THEN 0 ELSE n END) * 1.0
               / COUNT(CASE WHEN NOT is_weekend THEN 1 END))
            / (SUM(CASE WHEN is_weekend THEN n ELSE 0 END) * 1.0
               / COUNT(CASE WHEN is_weekend THEN 1 END))) AS BIGINT)
         AS ratio_milli
FROM t GROUP BY 1""",
)
def events_weekday_ratio(sf_dir: str):
    """Weekday/weekend seasonality per type (mean weekday daily volume
    over mean weekend daily volume — the traffic-shape fingerprint
    separating business tools from consumer apps). Epoch day 0 =
    Thursday, so ``(d+4) % 7 ∈ {5,6}`` marks Sat/Sun. One cells-bounded
    count pass; ratios on the tiny table."""
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
    c["is_we"] = ((c["d"] + 4) % 7).isin([5, 6])
    rows = []
    for et, g in c.groupby("event_type"):
        wd = g[~g["is_we"]]
        we = g[g["is_we"]]
        if len(wd) == 0 or len(we) == 0 or we["n"].sum() == 0:
            continue
        r = ((wd["n"].sum() * 1.0 / len(wd))
             / (we["n"].sum() * 1.0 / len(we)))
        rows.append((et, int(wd["n"].sum()), int(we["n"].sum()),
                     len(wd), len(we), int(np.floor(1000.0 * r))))
    rows.sort()
    return pa.table({
        "event_type": pa.array([r[0] for r in rows], pa.string()),
        "weekday_events": pa.array([r[1] for r in rows], pa.int64()),
        "weekend_events": pa.array([r[2] for r in rows], pa.int64()),
        "weekdays": pa.array([r[3] for r in rows], pa.int64()),
        "weekends": pa.array([r[4] for r in rows], pa.int64()),
        "ratio_milli": pa.array([r[5] for r in rows], pa.int64()),
    })


@query(
    "events_type_comovement",
    """
WITH c AS (
  SELECT event_type, CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) AS d,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2
), days AS (SELECT DISTINCT d FROM c),
types AS (SELECT DISTINCT event_type FROM c),
grid AS (
  SELECT t.event_type, dy.d, COALESCE(c.n, 0) AS n
  FROM types t CROSS JOIN days dy
  LEFT JOIN c ON c.event_type = t.event_type AND c.d = dy.d
)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       CAST(FLOOR(1e6 * CORR(CAST(a.n AS DOUBLE), CAST(b.n AS DOUBLE)))
            AS BIGINT) AS corr_micro
FROM grid a JOIN grid b ON a.d = b.d AND a.event_type < b.event_type
GROUP BY 1, 2""",
)
def events_type_comovement(sf_dir: str):
    """Cross-series co-movement: pairwise Pearson correlation of the
    types' daily-volume series (which traffic streams rise and fall
    together — the dependency map behind incident blast-radius
    analysis). Zero-filled day grid (missing day = 0 volume), types² / 2
    pairs evaluated from the one cells-bounded count pass."""
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
    piv = c.pivot_table(index="d", columns="event_type", values="n",
                        fill_value=0, aggfunc="sum").sort_index()
    types = list(piv.columns)
    mat = piv.to_numpy().astype(np.float64)
    rows = []
    for i, ta in enumerate(types):
        for j, tb in enumerate(types):
            if ta < tb:
                r = float(np.corrcoef(mat[:, i], mat[:, j])[0, 1])
                rows.append((ta, tb, int(np.floor(1e6 * r))))
    rows.sort()
    return pa.table({
        "type_a": pa.array([r[0] for r in rows], pa.string()),
        "type_b": pa.array([r[1] for r in rows], pa.string()),
        "corr_micro": pa.array([r[2] for r in rows], pa.int64()),
    })


@query(
    "text_good_turing",
    """
WITH words AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
wc AS (SELECT w, COUNT(*) AS c FROM words GROUP BY 1),
f AS (SELECT c, COUNT(*) AS m FROM wc GROUP BY 1),
t AS (SELECT SUM(c * m) AS n_tokens, SUM(m) AS vocab FROM f),
h AS (SELECT COALESCE(MAX(CASE WHEN c = 1 THEN m END), 0) AS n1 FROM f)
SELECT CAST(t.n_tokens AS BIGINT) AS n_tokens,
       CAST(t.vocab AS BIGINT) AS vocab,
       CAST(h.n1 AS BIGINT) AS hapax,
       CAST(FLOOR(1e6 * h.n1 * 1.0 / t.vocab) AS BIGINT)
         AS hapax_rate_micro,
       CAST(FLOOR(1e6 * h.n1 * 1.0 / t.n_tokens) AS BIGINT)
         AS gt_unseen_micro
FROM t CROSS JOIN h""",
)
def text_good_turing(sf_dir: str):
    """Vocabulary saturation diagnostics: hapax-legomena rate (share of
    words seen exactly once) and the Good-Turing estimate of unseen
    mass (n1/N — the probability the next token is a brand-new word;
    high = the corpus hasn't covered its domain yet). Word counts via
    the hash-partitioned aggregate; only the count-of-counts frequency
    spectrum reaches the driver."""
    import numpy as np
    import ray.data as rd
    import pyarrow.compute as pc

    from raylog.functions.agg import grouped_aggregate, grouped_aggregate_ds

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def wcounts(b: pa.Table) -> pa.Table:
        split = pc.split_pattern(b["text"].combine_chunks(), " ")
        flat = split.flatten().dictionary_encode()
        codes = np.asarray(flat.indices, dtype=np.int64)
        uc, cnt = np.unique(codes, return_counts=True)
        return pa.table({"w": flat.dictionary.take(pa.array(uc)),
                         "c": pa.array(cnt, pa.int64())})

    wc = grouped_aggregate_ds(
        ds.map_batches(wcounts, batch_format="pyarrow", batch_size=None),
        ["w"], [("c", "sum", "c")])
    spec = grouped_aggregate(wc, ["c"], [("*", "count", "m")]).to_pandas()
    c = spec["c"].to_numpy().astype(np.int64)
    m = spec["m"].to_numpy().astype(np.int64)
    n_tokens = int((c * m).sum())
    vocab = int(m.sum())
    n1 = int(m[c == 1].sum()) if (c == 1).any() else 0
    return pa.table({
        "n_tokens": pa.array([n_tokens], pa.int64()),
        "vocab": pa.array([vocab], pa.int64()),
        "hapax": pa.array([n1], pa.int64()),
        "hapax_rate_micro": pa.array(
            [int(np.floor(1e6 * n1 * 1.0 / vocab))], pa.int64()),
        "gt_unseen_micro": pa.array(
            [int(np.floor(1e6 * n1 * 1.0 / n_tokens))], pa.int64()),
    })


@query(
    "orders_repeat_cadence",
    """
WITH o AS (
  SELECT o_custkey, CAST(FLOOR(epoch(o_orderdate) / 86400) AS BIGINT) AS d,
         o_orderkey
  FROM orders
), g AS (
  SELECT o_custkey, d,
         LAG(d) OVER (PARTITION BY o_custkey ORDER BY d, o_orderkey)
           AS prev
  FROM o
), gaps AS (
  SELECT d - prev AS gap_days FROM g WHERE prev IS NOT NULL
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_gaps,
       quantile_disc(gap_days, 0.25) AS p25,
       quantile_disc(gap_days, 0.5) AS p50,
       quantile_disc(gap_days, 0.75) AS p75
FROM gaps""",
)
def orders_repeat_cadence(sf_dir: str):
    """Repeat-purchase cadence (days between a customer's consecutive
    orders, quartiles — the reorder-cycle number inventory planning
    runs on): per-customer gaps from one segmented diff per
    complete-customer partition (order ties broken by orderkey, same
    rule both engines), day-granularity integers through the exact
    distributed-quantile kernel."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import partitioned_group_apply
    from raylog.functions.quantile import grouped_quantiles

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_custkey", "o_orderdate", "o_orderkey"])

    def gaps(part: pa.Table) -> pa.Table:
        def col(name):
            c = part[name]
            return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c

        ck = np.asarray(col("o_custkey"), dtype=np.int64)
        ok = np.asarray(col("o_orderkey"), dtype=np.int64)
        t = (np.asarray(col("o_orderdate"))
             .astype("datetime64[us]").astype(np.int64))
        d = np.floor(t / 1e6 / 86400).astype(np.int64)
        if len(ck) == 0:
            return pa.table({"gap_days": pa.array([], pa.int64()),
                             "_k": pa.array([], pa.int64())})
        order = np.lexsort((ok, d, ck))
        c_s, d_s = ck[order], d[order]
        same = c_s[1:] == c_s[:-1]
        gap = (d_s[1:] - d_s[:-1])[same]
        return pa.table({"gap_days": pa.array(gap),
                         "_k": pa.array(np.zeros(len(gap), np.int64))})

    gds = partitioned_group_apply(ds, ["o_custkey"], gaps)
    n_gaps = int(gds.count())
    if n_gaps == 0:  # no repeat customer anywhere
        z = pa.array([], pa.int64())
        return pa.table({"n_gaps": z, "p25": z, "p50": z, "p75": z})
    q = grouped_quantiles(gds, key="_k", value="gap_days",
                          ps=[0.25, 0.5, 0.75],
                          out_names=["p25", "p50", "p75"]).to_pandas()
    return pa.table({
        "n_gaps": pa.array([n_gaps], pa.int64()),
        "p25": pa.array([int(q["p25"][0])], pa.int64()),
        "p50": pa.array([int(q["p50"][0])], pa.int64()),
        "p75": pa.array([int(q["p75"][0])], pa.int64()),
    })


@query(
    "dedup_savings_report",
    """
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT text) AS BIGINT) AS n_distinct,
       CAST(SUM(length(text)) AS BIGINT) AS total_bytes,
       CAST(FLOOR(1000.0 * (COUNT(*) - COUNT(DISTINCT text))
            / COUNT(*)) AS BIGINT) AS dup_rate_milli
FROM documents""",
)
def dedup_savings_report(sf_dir: str):
    """Dedup savings headline (the one-line summary a curation run
    reports: corpus size, distinct contents, duplication rate): row and
    byte counts are streaming sums; the distinct count comes from the
    hash-partitioned exact-dedup survivor Dataset — counted, never
    collected."""
    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd

    from raylog.functions.dedup import exact_dedup_survivors

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def sizes(b: pa.Table) -> pa.Table:
        return pa.table({
            "n": pa.array([b.num_rows], pa.int64()),
            "bytes": pa.array(
                [int(pc.sum(pc.utf8_length(b["text"].combine_chunks()))
                     .as_py() or 0)], pa.int64()),
        })

    parts = ds.map_batches(sizes, batch_format="pyarrow", batch_size=None)
    n_docs = int(parts.sum("n"))
    total_bytes = int(parts.sum("bytes"))
    n_distinct = int(exact_dedup_survivors(ds).count())
    return pa.table({
        "n_docs": pa.array([n_docs], pa.int64()),
        "n_distinct": pa.array([n_distinct], pa.int64()),
        "total_bytes": pa.array([total_bytes], pa.int64()),
        "dup_rate_milli": pa.array(
            [int(np.floor(1000.0 * (n_docs - n_distinct) / n_docs))],
            pa.int64()),
    })


@query(
    "lineitem_discount_revenue",
    """
SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(FLOOR(l_extendedprice * l_discount * 10000 + 0.5)
                     AS BIGINT)) AS BIGINT) AS revenue_e4
FROM lineitem
WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""",
)
def lineitem_discount_revenue(sf_dir: str):
    """TPC-H Q6-shape forecast-revenue query (discount-band × quantity
    filter, one global sum): per-row products are quantized to exact
    1e-4 fixed-point integers BEFORE summing (identical double→int op
    on both engines), so the distributed integer sum is bit-exact in
    any order — no float-accumulation-order hazard. Predicates are
    vectorized Arrow filters; partials are one row per block."""
    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_extendedprice", "l_discount",
                                  "l_quantity"])

    def partial(b: pa.Table) -> pa.Table:
        disc = np.asarray(b["l_discount"].combine_chunks(),
                          dtype=np.float64)
        qty = np.asarray(b["l_quantity"].combine_chunks(),
                         dtype=np.float64)
        price = np.asarray(b["l_extendedprice"].combine_chunks(),
                           dtype=np.float64)
        keep = (disc >= 0.05) & (disc <= 0.07) & (qty < 24)
        rev = np.floor(price[keep] * disc[keep] * 10000 + 0.5
                       ).astype(np.int64)
        return pa.table({
            "n": pa.array([int(keep.sum())], pa.int64()),
            "r": pa.array([int(rev.sum())], pa.int64()),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None)
    return pa.table({
        "n_items": pa.array([int(parts.sum("n"))], pa.int64()),
        "revenue_e4": pa.array([int(parts.sum("r"))], pa.int64()),
    })


_FD_CANDIDATES = [
    ("o_orderkey", "o_custkey"),
    ("o_custkey", "o_orderpriority"),
    ("o_orderstatus", "o_orderpriority"),
    ("o_orderpriority", "o_orderstatus"),
]


def _fd_oracle_one(lhs: str, rhs: str) -> str:
    return f"""
SELECT '{lhs}' AS lhs, '{rhs}' AS rhs,
       CAST(COUNT(*) AS BIGINT) AS n_lhs_distinct,
       CAST(SUM(k) AS BIGINT) AS n_pairs_distinct,
       CAST(SUM(CASE WHEN k > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violating_lhs,
       CAST(MAX(k) AS BIGINT) AS max_rhs_per_lhs,
       CAST(CASE WHEN MAX(k) = 1 THEN 1 ELSE 0 END AS BIGINT) AS fd_holds
FROM (SELECT l, COUNT(*) AS k
      FROM (SELECT DISTINCT {lhs} AS l, {rhs} AS r FROM orders)
      GROUP BY 1)"""


@query(
    "profile_fd_audit",
    " UNION ALL ".join(_fd_oracle_one(l, r) for l, r in _FD_CANDIDATES),
)
def profile_fd_audit(sf_dir: str):
    """Data-profiling audit of candidate functional dependencies /
    key candidates (HyFD-style column-dependency discovery, bounded to
    a declared candidate set): for each lhs→rhs candidate, distinct lhs
    count, distinct (lhs,rhs) pair count, the number of lhs values with
    more than one rhs (violations), the worst fan-out, and whether the
    FD holds exactly. `o_orderkey→o_custkey` holding with
    n_lhs_distinct == row count doubles as a primary-key attestation.

    Per candidate: one hash-partitioned distinct over (lhs,rhs) — the
    only exchange, bounded by the distinct-pair count — then a
    cardinality-bounded per-lhs fan-out aggregate and a constant-size
    fold. The corpus never lands on the driver."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate, grouped_aggregate_ds

    rows = []
    for lhs, rhs in _FD_CANDIDATES:
        ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=[lhs, rhs])
        pairs = grouped_aggregate_ds(ds, [lhs, rhs], [("*", "count", "_n")],
                                     num_partitions=8)
        fanout = grouped_aggregate_ds(pairs, [lhs], [("_n", "count", "k")],
                                      num_partitions=8)

        def fold(b: pa.Table) -> pa.Table:
            k = np.asarray(b["k"].combine_chunks(), dtype=np.int64)
            return pa.table({
                "g": pa.array([0], pa.int64()),
                "nl": pa.array([len(k)], pa.int64()),
                "np_": pa.array([int(k.sum())], pa.int64()),
                "nv": pa.array([int((k > 1).sum())], pa.int64()),
                "mx": pa.array([int(k.max()) if len(k) else 0], pa.int64()),
            })

        a = grouped_aggregate(
            fanout.map_batches(fold, batch_format="pyarrow",
                               batch_size=None),
            ["g"], [("nl", "sum", "n_lhs_distinct"),
                    ("np_", "sum", "n_pairs_distinct"),
                    ("nv", "sum", "n_violating_lhs"),
                    ("mx", "max", "max_rhs_per_lhs")])
        mx = int(a["max_rhs_per_lhs"][0].as_py())
        rows.append((lhs, rhs,
                     int(a["n_lhs_distinct"][0].as_py()),
                     int(a["n_pairs_distinct"][0].as_py()),
                     int(a["n_violating_lhs"][0].as_py()),
                     mx, 1 if mx == 1 else 0))
    return pa.table({
        "lhs": pa.array([r[0] for r in rows], pa.string()),
        "rhs": pa.array([r[1] for r in rows], pa.string()),
        "n_lhs_distinct": pa.array([r[2] for r in rows], pa.int64()),
        "n_pairs_distinct": pa.array([r[3] for r in rows], pa.int64()),
        "n_violating_lhs": pa.array([r[4] for r in rows], pa.int64()),
        "max_rhs_per_lhs": pa.array([r[5] for r in rows], pa.int64()),
        "fd_holds": pa.array([r[6] for r in rows], pa.int64()),
    })


@query(
    "shard_rebalance_audit",
    """
WITH k AS (SELECT CAST(doc_id AS VARCHAR) AS s FROM documents),
h AS (SELECT s, CAST(('0x' || substr(md5(s), 1, 8)) AS BIGINT) AS hv
      FROM k),
w AS (SELECT k.s, t.sh,
        CAST(('0x' || substr(md5(k.s || '|' || CAST(t.sh AS VARCHAR)),
                             1, 15)) AS BIGINT) AS wt
      FROM k CROSS JOIN UNNEST(generate_series(0, 16)) t(sh)),
a AS (SELECT s,
        arg_max(sh, wt) FILTER (WHERE sh < 16) AS s16,
        arg_max(sh, wt) AS s17
      FROM w GROUP BY 1),
m AS (
  SELECT 'mod' AS strategy, COUNT(*) AS n,
         SUM(CASE WHEN hv % 16 <> hv % 17 THEN 1 ELSE 0 END) AS mv
  FROM h
  UNION ALL
  SELECT 'rendezvous', COUNT(*),
         SUM(CASE WHEN s16 <> s17 THEN 1 ELSE 0 END)
  FROM a)
SELECT strategy, CAST(n AS BIGINT) AS n_keys,
       CAST(mv AS BIGINT) AS n_moved,
       CAST((1000 * mv) // n AS BIGINT) AS moved_permille
FROM m""",
)
def shard_rebalance_audit(sf_dir: str):
    """Shard-placement audit for scaling a 16-shard layout to 17: what
    fraction of keys MOVE under naive modulo hashing (≈ 16/17 of them —
    the classic resharding catastrophe) vs rendezvous/HRW hashing
    (≈ 1/17, the consistent-hashing minimum). The operational question
    behind every stateful-store scale-out.

    Map-only: each batch computes its keys' placements under both
    layouts (one md5 for mod, 17 for HRW — same per-key budget class
    as the md5 fingerprint loop) and emits constant-size moved/total
    partials; the fold is two rows. Zero exchange at any corpus
    size."""
    import hashlib

    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id"])

    def partial(b: pa.Table) -> pa.Table:
        mm = mh = 0
        ids = b["doc_id"].to_pylist()
        for v in ids:
            s = str(v)
            h = int(hashlib.md5(s.encode()).hexdigest()[:8], 16)
            if h % 16 != h % 17:
                mm += 1
            wt = [int(hashlib.md5(f"{s}|{sh}".encode()).hexdigest()[:15],
                      16) for sh in range(17)]
            s16 = max(range(16), key=wt.__getitem__)
            s17 = max(range(17), key=wt.__getitem__)
            if s16 != s17:
                mh += 1
        return pa.table({
            "g": pa.array([0], pa.int64()),
            "n": pa.array([len(ids)], pa.int64()),
            "mm": pa.array([mm], pa.int64()),
            "mh": pa.array([mh], pa.int64()),
        })

    a = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        ["g"], [("n", "sum", "n"), ("mm", "sum", "mm"),
                ("mh", "sum", "mh")])
    n = int(a["n"][0].as_py())
    mm, mh = int(a["mm"][0].as_py()), int(a["mh"][0].as_py())
    return pa.table({
        "strategy": pa.array(["mod", "rendezvous"], pa.string()),
        "n_keys": pa.array([n, n], pa.int64()),
        "n_moved": pa.array([mm, mh], pa.int64()),
        "moved_permille": pa.array([1000 * mm // n, 1000 * mh // n],
                                   pa.int64()),
    })


@query(
    "events_theilsen_trend",
    """
WITH c AS (
  SELECT event_type, CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) AS d,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2
), p AS (
  SELECT a.event_type,
         (CAST(b.n AS DOUBLE) - CAST(a.n AS DOUBLE)) / (b.d - a.d) AS s
  FROM c a JOIN c b
    ON a.event_type = b.event_type AND b.d > a.d
), dc AS (SELECT event_type, COUNT(*) AS nd FROM c GROUP BY 1)
SELECT p.event_type,
       CAST(MAX(dc.nd) AS BIGINT) AS n_days,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(FLOOR(1e6 * quantile_disc(s, 0.5)) AS BIGINT) AS slope_micro
FROM p JOIN dc USING (event_type)
GROUP BY 1""",
)
def events_theilsen_trend(sf_dir: str):
    """Theil–Sen robust trend slope per event type on the daily-volume
    series: the median of all pairwise slopes (n_j−n_i)/(d_j−d_i) over
    observed days — breakdown point 29%, immune to the spike days that
    wreck a least-squares fit. Median convention: lower middle element
    (sorted[(m−1)//2]), matching DuckDB ``quantile_disc(0.5)``; both
    engines divide the same integer-valued doubles so the elements are
    bit-identical, quantized to micro-slope at the end.

    The (type, day) count table is the cells-bounded partial aggregate
    (the only exchange); the pairwise-slope median runs on that tiny
    axis — at 100 TB the day axis is still ~10³, so the O(days²) pair
    set per type stays ~10⁶ driver-side floats."""
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
    out = []
    for et, grp in c.groupby("event_type"):
        g = grp.sort_values("d")
        d = g["d"].to_numpy(dtype=np.int64)
        n = g["n"].to_numpy(dtype=np.float64)
        i, j = np.triu_indices(len(d), k=1)
        s = np.sort((n[j] - n[i]) / (d[j] - d[i]))
        if len(s) == 0:
            continue
        med = s[(len(s) - 1) // 2]
        out.append((et, len(d), len(s), int(np.floor(1e6 * med))))
    out.sort()
    return pa.table({
        "event_type": pa.array([r[0] for r in out], pa.string()),
        "n_days": pa.array([r[1] for r in out], pa.int64()),
        "n_pairs": pa.array([r[2] for r in out], pa.int64()),
        "slope_micro": pa.array([r[3] for r in out], pa.int64()),
    })


@query(
    "events_ols_by_type",
    """
WITH c AS (
  SELECT event_type, CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) AS d,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2
), s AS (
  SELECT event_type, COUNT(*) AS k, SUM(d) AS sx, SUM(n) AS sy,
         SUM(d * n) AS sxy, SUM(d * d) AS sxx
  FROM c GROUP BY 1
)
SELECT event_type, CAST(k AS BIGINT) AS n_days,
       CAST(FLOOR(1e6 * ((k * sxy - sx * sy) * 1.0
                         / (k * sxx - sx * sx))) AS BIGINT)
         AS slope_micro,
       CAST(FLOOR(1e6 * ((sy * sxx - sx * sxy) * 1.0
                         / (k * sxx - sx * sx))) AS BIGINT)
         AS intercept_micro
FROM s
WHERE k >= 2""",
)
def events_ols_by_type(sf_dir: str):
    """Distributed least-squares trend per event type via SUFFICIENT
    STATISTICS: the OLS slope/intercept of daily volume vs day fall
    out of five exact integer moments (k, Σx, Σy, Σxy, Σx²) — the
    textbook way to regress at any scale without ever materializing
    the series, and the complement to `events_theilsen_trend`'s robust
    estimate. All moments are exact int64 sums (order-independent);
    the single float division happens once per type at the end, with
    the same operand structure on both engines (exact-int → double →
    multiply by 1e6 → floor).

    Exchange: the (type, day) cells-bounded count aggregate only."""
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
    out = []
    for et, grp in c.groupby("event_type"):
        d = [int(v) for v in grp["d"]]
        n = [int(v) for v in grp["n"]]
        k = len(d)
        if k < 2:
            continue
        sx, sy = sum(d), sum(n)
        sxy = sum(x * y for x, y in zip(d, n))
        sxx = sum(x * x for x in d)
        den = k * sxx - sx * sx
        slope = (k * sxy - sx * sy) * 1.0 / den
        icept = (sy * sxx - sx * sxy) * 1.0 / den
        out.append((et, k, int(np.floor(1e6 * slope)),
                    int(np.floor(1e6 * icept))))
    out.sort()
    return pa.table({
        "event_type": pa.array([r[0] for r in out], pa.string()),
        "n_days": pa.array([r[1] for r in out], pa.int64()),
        "slope_micro": pa.array([r[2] for r in out], pa.int64()),
        "intercept_micro": pa.array([r[3] for r in out], pa.int64()),
    })


_PROFILE_COLS = ["event_id", "ts", "user_id", "event_type", "value",
                 "props"]


@query(
    "profile_column_stats",
    " UNION ALL ".join(
        f"""
SELECT '{c}' AS column_name,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null,
       CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct
FROM events""" for c in _PROFILE_COLS),
)
def profile_column_stats(sf_dir: str):
    """Column-completeness / cardinality profile of the events table
    (the first page of every data-profiling report, and the input to
    the FD audit's candidate generation): per column, row count, null
    count, and EXACT distinct count (nulls excluded, SQL semantics).

    Null/row counts are constant per-batch partials; each distinct
    count is one hash-partitioned distinct whose exchange is bounded
    by that column's cardinality — never more than one (column, value)
    row per distinct value, and the high-cardinality columns
    (event_id) shard across reducers instead of landing anywhere
    whole."""
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate, grouped_aggregate_ds

    out = []
    for col in _PROFILE_COLS:
        ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=[col])

        def partial(b: pa.Table, col=col) -> pa.Table:
            return pa.table({
                "g": pa.array([0], pa.int64()),
                "n": pa.array([b.num_rows], pa.int64()),
                "z": pa.array([b[col].null_count], pa.int64()),
            })

        a = grouped_aggregate(
            ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None),
            ["g"], [("n", "sum", "n"), ("z", "sum", "z")])
        nonnull = ds.map_batches(
            lambda b, col=col: b.filter(pa.compute.is_valid(b[col])),
            batch_format="pyarrow", batch_size=None)
        distinct = grouped_aggregate_ds(
            nonnull, [col], [("*", "count", "_c")], num_partitions=8)
        nd = distinct.count()
        out.append((col, int(a["n"][0].as_py()), int(a["z"][0].as_py()),
                    int(nd)))
    return pa.table({
        "column_name": pa.array([r[0] for r in out], pa.string()),
        "n_rows": pa.array([r[1] for r in out], pa.int64()),
        "n_null": pa.array([r[2] for r in out], pa.int64()),
        "n_distinct": pa.array([r[3] for r in out], pa.int64()),
    })


@query(
    "events_mutual_information",
    """
WITH e AS (
  SELECT event_type,
         CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) % 7 AS wd
  FROM events
), xy AS (SELECT event_type, wd, COUNT(*) AS nxy FROM e GROUP BY 1, 2),
x AS (SELECT event_type, SUM(nxy) AS nx FROM xy GROUP BY 1),
y AS (SELECT wd, SUM(nxy) AS ny FROM xy GROUP BY 1),
t AS (SELECT SUM(nxy) AS nn FROM xy)
SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(MAX(nn) AS BIGINT) AS n_total,
       CAST(SUM(CAST(FLOOR(
         (1e6 * (CAST(nxy AS DOUBLE) / nn))
         * ln(CAST(nxy AS DOUBLE) * nn / (nx * ny))) AS BIGINT))
         AS BIGINT) AS mi_micro
FROM xy JOIN x USING (event_type) JOIN y USING (wd) CROSS JOIN t""",
)
def events_mutual_information(sf_dir: str):
    """Mutual information between event type and weekday (the
    feature-relevance audit: does traffic mix depend on day-of-week?),
    in micro-nats. Each cell's contribution p(x,y)·ln(p(x,y)/(p(x)p(y)))
    is QUANTIZED to an integer micro-nat BEFORE summing, so the total
    is an integer sum — bit-identical in any order, immune to the
    float-accumulation drift a raw SUM of doubles would have across
    engines (same discipline as the fixed-point revenue queries).

    Exchange: the (type, weekday) cells-bounded count aggregate; the
    ≤ types×7 cell table finishes driver-side."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts"])

    def wd(b: pa.Table) -> pa.Table:
        t = (np.asarray(b["ts"].combine_chunks())
             .astype("datetime64[us]").astype(np.int64))
        return pa.table({
            "event_type": b["event_type"],
            "wd": pa.array((np.floor(t / 1e6 / 86400).astype(np.int64))
                           % 7),
        })

    xy = grouped_aggregate(
        ds.map_batches(wd, batch_format="pyarrow", batch_size=None),
        ["event_type", "wd"], [("*", "count", "nxy")]).to_pandas()
    nx = xy.groupby("event_type")["nxy"].sum().to_dict()
    ny = xy.groupby("wd")["nxy"].sum().to_dict()
    nn = int(xy["nxy"].sum())
    mi = 0
    for r in xy.itertuples(index=False):
        nxy = int(r.nxy)
        term = ((1e6 * (float(nxy) / float(nn)))
                * np.log(float(nxy) * float(nn)
                         / float(int(nx[r.event_type]) * int(ny[r.wd]))))
        mi += int(np.floor(term))
    return pa.table({
        "n_cells": pa.array([len(xy)], pa.int64()),
        "n_total": pa.array([nn], pa.int64()),
        "mi_micro": pa.array([mi], pa.int64()),
    })


def _clustering_oracle(col: str) -> str:
    return f"""
SELECT '{col}' AS column_name,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT {col}) AS BIGINT) AS n_distinct,
       CAST(SUM(CASE WHEN prev IS NULL
                     OR prev <> CAST({col} AS VARCHAR)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_runs,
       CAST((1000 * SUM(CASE WHEN prev IS NULL
                             OR prev <> CAST({col} AS VARCHAR)
                        THEN 1 ELSE 0 END)) // COUNT(*) AS BIGINT)
         AS runs_permille
FROM (
  SELECT {col},
         LAG(CAST({col} AS VARCHAR)) OVER (
           PARTITION BY CAST(FLOOR(epoch(ts) / 86400) AS BIGINT)
           ORDER BY ts, event_id) AS prev
  FROM events)"""


@query(
    "events_clustering_factor",
    " UNION ALL ".join(_clustering_oracle(c)
                       for c in ["event_type", "user_id"]),
)
def events_clustering_factor(sf_dir: str):
    """Index clustering factor (the Oracle-DBA statistic, and the
    dictionary/RLE-encoding benefit signal): for each candidate
    column, how many VALUE RUNS the column has when rows sit in their
    natural (day, ts, event_id) order — runs/rows near 0 means the
    column is physically clustered (RLE-friendly, low-cost index);
    near 1000 permille means every row starts a new run. Day
    boundaries reset runs so the metric is partition-stable by
    construction.

    Complete-day partitions (`partitioned_group_apply`), one lexsort
    + boundary count per partition per column; distinct counts ride
    the hash-partitioned aggregate. Exchange: the 4 narrow columns
    once."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import (grouped_aggregate,
                                      grouped_aggregate_ds,
                                      partitioned_group_apply)

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "user_id", "ts",
                                  "event_id"])

    def addday(b: pa.Table) -> pa.Table:
        t = (np.asarray(b["ts"].combine_chunks())
             .astype("datetime64[us]").astype(np.int64))
        return b.append_column(
            "d", pa.array(np.floor(t / 1e6 / 86400).astype(np.int64)))

    dd = ds.map_batches(addday, batch_format="pyarrow", batch_size=None)

    def runs(part: pa.Table) -> pa.Table:
        t = (np.asarray(part["ts"].combine_chunks())
             .astype("datetime64[us]").astype(np.int64))
        e = np.asarray(part["event_id"].combine_chunks(), dtype=np.int64)
        d = np.asarray(part["d"].combine_chunks(), dtype=np.int64)
        order = np.lexsort((e, t, d))
        newday = np.ones(len(d), dtype=bool)
        dd_ = d[order]
        if len(dd_) > 1:
            newday[1:] = dd_[1:] != dd_[:-1]
        out_c, out_n, out_r = [], [], []
        for col, dt in [("event_type", "U"), ("user_id", "i")]:
            v = part[col].combine_chunks().to_numpy(zero_copy_only=False)
            v = v[order]
            nr = np.ones(len(v), dtype=bool)
            if len(v) > 1:
                nr[1:] = v[1:] != v[:-1]
            out_c.append(col)
            out_n.append(len(v))
            out_r.append(int((nr | newday).sum()))
        return pa.table({
            "column_name": pa.array(out_c, pa.string()),
            "n": pa.array(out_n, pa.int64()),
            "r": pa.array(out_r, pa.int64()),
        })

    agg = grouped_aggregate(
        partitioned_group_apply(dd, ["d"], runs),
        ["column_name"], [("n", "sum", "n_rows"),
                          ("r", "sum", "n_runs")]).to_pandas()
    nd = {}
    for col in ["event_type", "user_id"]:
        nd[col] = grouped_aggregate_ds(
            ds.select_columns([col]), [col], [("*", "count", "_c")],
            num_partitions=8).count()
    agg = agg.sort_values("column_name")
    n = agg["n_rows"].to_numpy(dtype=np.int64)
    r = agg["n_runs"].to_numpy(dtype=np.int64)
    return pa.table({
        "column_name": pa.array(agg["column_name"], pa.string()),
        "n_rows": pa.array(n),
        "n_distinct": pa.array([nd[c] for c in agg["column_name"]],
                               pa.int64()),
        "n_runs": pa.array(r),
        "runs_permille": pa.array(1000 * r // n, pa.int64()),
    })


@query(
    "events_leadlag_correlation",
    """
WITH c AS (
  SELECT event_type, CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) AS d,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2
), span AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM c),
days AS (SELECT UNNEST(generate_series(lo, hi)) AS d FROM span),
types AS (SELECT DISTINCT event_type FROM c),
grid AS (
  SELECT t.event_type, dy.d, COALESCE(c.n, 0) AS n
  FROM types t CROSS JOIN days dy
  LEFT JOIN c ON c.event_type = t.event_type AND c.d = dy.d
), lags AS (SELECT UNNEST(generate_series(-3, 3)) AS lag),
xc AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, l.lag,
         CAST(FLOOR(1e6 * CORR(CAST(a.n AS DOUBLE),
                               CAST(b.n AS DOUBLE))) AS BIGINT)
           AS corr_micro
  FROM lags l
  JOIN grid a ON TRUE
  JOIN grid b ON b.event_type <> a.event_type
             AND b.d = a.d + l.lag
  WHERE a.event_type < b.event_type
  GROUP BY 1, 2, 3
), best AS (
  SELECT type_a, type_b, lag, corr_micro,
         ROW_NUMBER() OVER (PARTITION BY type_a, type_b
                            ORDER BY corr_micro DESC, ABS(lag), lag)
           AS rn
  FROM xc
)
SELECT type_a, type_b, CAST(lag AS BIGINT) AS best_lag, corr_micro
FROM best WHERE rn = 1""",
)
def events_leadlag_correlation(sf_dir: str):
    """Lead–lag discovery between traffic streams: for every type
    pair, the lag in [−3, 3] days that maximizes the Pearson
    correlation of the zero-filled daily-volume series (b shifted by
    lag against a) — "errors spike two days after deploys" style
    causal hints. Deterministic winner: corr quantized to micro BEFORE
    the argmax, ties broken by |lag| then lag, so both engines pick
    the same row even at float boundaries.

    The only exchange is the (type, day) cells-bounded count
    aggregate; the 7-lag × pairs sweep runs on the tiny grid
    driver-side (days stay ~10³ at any corpus size)."""
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
    lo, hi = int(c["d"].min()), int(c["d"].max())
    span = hi - lo + 1
    piv = c.pivot_table(index="d", columns="event_type", values="n",
                        fill_value=0, aggfunc="sum")
    piv = piv.reindex(range(lo, hi + 1), fill_value=0)
    types = sorted(piv.columns)
    mat = piv[types].to_numpy(dtype=np.float64)
    rows = []
    for i, ta in enumerate(types):
        for j, tb in enumerate(types):
            if ta >= tb:
                continue
            cand = []
            for lag in range(-3, 4):
                # overlap: a on days [max(lo,lo-lag)..], b on d+lag
                if lag >= 0:
                    av, bv = mat[:span - lag, i], mat[lag:, j]
                else:
                    av, bv = mat[-lag:, i], mat[:span + lag, j]
                r = float(np.corrcoef(av, bv)[0, 1])
                cand.append((int(np.floor(1e6 * r)), lag))
            best = max(cand, key=lambda t: (t[0], -abs(t[1]), -t[1]))
            rows.append((ta, tb, best[1], best[0]))
    rows.sort()
    return pa.table({
        "type_a": pa.array([r[0] for r in rows], pa.string()),
        "type_b": pa.array([r[1] for r in rows], pa.string()),
        "best_lag": pa.array([r[2] for r in rows], pa.int64()),
        "corr_micro": pa.array([r[3] for r in rows], pa.int64()),
    })


@query(
    "events_expectations_report",
    """
SELECT 'value_in_range' AS rule,
       CAST(COUNT(*) AS BIGINT) AS n_checked,
       CAST(SUM(CASE WHEN value < 0 OR value > 500 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_violations,
       CAST(CASE WHEN SUM(CASE WHEN value < 0 OR value > 500
                              THEN 1 ELSE 0 END) = 0
            THEN 1 ELSE 0 END AS BIGINT) AS passed
FROM events
UNION ALL
SELECT 'user_id_not_null', CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(CASE WHEN SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)
                 = 0 THEN 1 ELSE 0 END AS BIGINT)
FROM events
UNION ALL
SELECT 'event_type_in_set', CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN event_type NOT IN
                ('click','view','purchase','login','error')
                THEN 1 ELSE 0 END) AS BIGINT),
       CAST(CASE WHEN SUM(CASE WHEN event_type NOT IN
                ('click','view','purchase','login','error')
                THEN 1 ELSE 0 END) = 0 THEN 1 ELSE 0 END AS BIGINT)
FROM events
UNION ALL
SELECT 'event_id_unique', CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(*) - COUNT(DISTINCT event_id) AS BIGINT),
       CAST(CASE WHEN COUNT(*) = COUNT(DISTINCT event_id)
            THEN 1 ELSE 0 END AS BIGINT)
FROM events""",
)
def events_expectations_report(sf_dir: str):
    """Data-contract validation (Great-Expectations-style): a declared
    rule set — value range, non-null key, categorical domain, primary-
    key uniqueness — each reporting rows checked, violations, and a
    pass flag. The difference from `profile_column_stats`: this
    ASSERTS a contract rather than describing the data, which is the
    gate a production ingest pipeline runs before publishing a
    partition.

    Row rules are constant per-batch partials (map-only); the
    uniqueness rule rides one hash-partitioned distinct (exchange
    bounded by key cardinality). A failing rule costs the same as a
    passing one — no row-level materialization of violations."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate, grouped_aggregate_ds

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "event_type",
                                  "value"])
    TYPES = pa.array(["click", "view", "purchase", "login", "error"])

    def partial(b: pa.Table) -> pa.Table:
        v = np.asarray(b["value"].combine_chunks(), dtype=np.float64)
        bad_range = int(((v < 0) | (v > 500)).sum())
        null_user = b["user_id"].null_count
        et = b["event_type"].combine_chunks()
        bad_type = int(b.num_rows
                       - pa.compute.sum(
                           pa.compute.is_in(et, value_set=TYPES)
                           .cast(pa.int64())).as_py())
        return pa.table({
            "g": pa.array([0], pa.int64()),
            "n": pa.array([b.num_rows], pa.int64()),
            "vr": pa.array([bad_range], pa.int64()),
            "nu": pa.array([null_user], pa.int64()),
            "bt": pa.array([bad_type], pa.int64()),
        })

    a = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        ["g"], [("n", "sum", "n"), ("vr", "sum", "vr"),
                ("nu", "sum", "nu"), ("bt", "sum", "bt")])
    n = int(a["n"][0].as_py())
    vr, nu, bt = (int(a[c][0].as_py()) for c in ("vr", "nu", "bt"))
    n_distinct = grouped_aggregate_ds(
        ds.select_columns(["event_id"]), ["event_id"],
        [("*", "count", "_c")], num_partitions=8).count()
    dup = n - int(n_distinct)
    rules = [("value_in_range", n, vr), ("user_id_not_null", n, nu),
             ("event_type_in_set", n, bt), ("event_id_unique", n, dup)]
    return pa.table({
        "rule": pa.array([r[0] for r in rules], pa.string()),
        "n_checked": pa.array([r[1] for r in rules], pa.int64()),
        "n_violations": pa.array([r[2] for r in rules], pa.int64()),
        "passed": pa.array([1 if r[2] == 0 else 0 for r in rules],
                           pa.int64()),
    })


@query(
    "events_gap_sla_report",
    """
WITH g AS (
  SELECT event_type, ts,
         LAG(ts) OVER (PARTITION BY event_type
                       ORDER BY ts, event_id) AS prev
  FROM events
), s AS (
  SELECT event_type,
         COUNT(*) AS n_events,
         MAX(epoch_us(ts) - epoch_us(prev)) AS max_gap_us,
         SUM(CASE WHEN epoch_us(ts) - epoch_us(prev) > 3600000000
                  THEN epoch_us(ts) - epoch_us(prev) ELSE 0 END)
           AS outage_us,
         MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS span_us
  FROM g GROUP BY 1
)
SELECT event_type, CAST(n_events AS BIGINT) AS n_events,
       CAST(max_gap_us AS BIGINT) AS max_gap_us,
       CAST((1000 * outage_us) // span_us AS BIGINT)
         AS outage_permille
FROM s""",
)
def events_gap_sla_report(sf_dir: str):
    """Per-stream availability / SLA monitor: for each event type, the
    longest silent gap between consecutive events and the fraction of
    the stream's span spent in outage (gaps above the 1-hour SLA
    threshold) — the heartbeat audit for every ingestion source. Gap
    analysis needs GLOBAL time order per stream, so streams partition
    whole (`partitioned_group_apply` by type — the per-type lexsort is
    the honest cost; a hot stream costs its partition one sort pass,
    and at 100 TB the day-bucketed pre-split in SCALE.md's gap recipe
    bounds it).

    Exchange: (type, ts, event_id) narrow rows once; output is
    types-bounded."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import partitioned_group_apply

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts", "event_id"])
    SLA = 3_600_000_000

    def gaps(part: pa.Table) -> pa.Table:
        et = part["event_type"].combine_chunks().to_numpy(
            zero_copy_only=False)
        t = (np.asarray(part["ts"].combine_chunks())
             .astype("datetime64[us]").astype(np.int64))
        e = np.asarray(part["event_id"].combine_chunks(), dtype=np.int64)
        order = np.lexsort((e, t, et))
        et, t = et[order], t[order]
        same = np.zeros(len(t), dtype=bool)
        if len(t) > 1:
            same[1:] = et[1:] == et[:-1]
        gap = np.where(same, t - np.roll(t, 1), 0)
        types, idx = np.unique(et, return_inverse=True)
        k = len(types)
        n = np.bincount(idx, minlength=k)
        mx = np.zeros(k, dtype=np.int64)
        np.maximum.at(mx, idx[same], gap[same])
        out = np.zeros(k, dtype=np.int64)
        big = same & (gap > SLA)
        np.add.at(out, idx[big], gap[big])
        tmin = np.full(k, np.iinfo(np.int64).max)
        tmax = np.zeros(k, dtype=np.int64)
        np.minimum.at(tmin, idx, t)
        np.maximum.at(tmax, idx, t)
        return pa.table({
            "event_type": pa.array(types, pa.string()),
            "n_events": pa.array(n.astype(np.int64)),
            "max_gap_us": pa.array(mx),
            "outage_us": pa.array(out),
            "span_us": pa.array(tmax - tmin),
        })

    r = partitioned_group_apply(ds, ["event_type"], gaps).to_pandas()
    r = r.sort_values("event_type")
    return pa.table({
        "event_type": pa.array(r["event_type"], pa.string()),
        "n_events": pa.array(r["n_events"].to_numpy(dtype=np.int64)),
        "max_gap_us": pa.array(r["max_gap_us"].to_numpy(dtype=np.int64)),
        "outage_permille": pa.array(
            1000 * r["outage_us"].to_numpy(dtype=np.int64)
            // r["span_us"].to_numpy(dtype=np.int64), pa.int64()),
    })


@query(
    "events_gorilla_estimate",
    """
WITH o AS (
  SELECT event_type, epoch_us(ts) AS t,
         LAG(epoch_us(ts)) OVER (PARTITION BY event_type
                                 ORDER BY ts, event_id) AS p1,
         LAG(epoch_us(ts), 2) OVER (PARTITION BY event_type
                                    ORDER BY ts, event_id) AS p2
  FROM events
), d AS (
  SELECT event_type,
         (t - p1) - (p1 - p2) AS dod
  FROM o WHERE p2 IS NOT NULL
), b AS (
  SELECT event_type,
         CASE WHEN dod = 0 THEN 1
              WHEN dod BETWEEN -63 AND 64 THEN 9
              WHEN dod BETWEEN -255 AND 256 THEN 12
              WHEN dod BETWEEN -2047 AND 2048 THEN 16
              ELSE 36 END AS bits
  FROM d
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_deltas,
       CAST(SUM(bits) AS BIGINT) AS bits_est,
       CAST((1000 * (64 * COUNT(*) - SUM(bits))) // (64 * COUNT(*))
            AS BIGINT) AS saved_permille
FROM b GROUP BY 1""",
)
def events_gorilla_estimate(sf_dir: str):
    """Gorilla-style delta-of-delta timestamp-compression estimate per
    stream (the Facebook TSDB codec every metrics store uses): after
    the first two points, each timestamp costs 1 bit when the
    inter-arrival is steady (dod = 0) and a bucketed variable width
    otherwise; reports the estimated bits and the savings vs raw
    64-bit storage. Completes the storage-codec audit trio with
    `docs_prefix_compression` (strings) and
    `events_clustering_factor` (RLE/dictionary).

    Whole-stream partitions (one lexsort, two vectorized diffs,
    bucketed bincount); types-bounded output."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import partitioned_group_apply

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts", "event_id"])

    def bits(part: pa.Table) -> pa.Table:
        et = part["event_type"].combine_chunks().to_numpy(
            zero_copy_only=False)
        t = (np.asarray(part["ts"].combine_chunks())
             .astype("datetime64[us]").astype(np.int64))
        e = np.asarray(part["event_id"].combine_chunks(), dtype=np.int64)
        order = np.lexsort((e, t, et))
        et, t = et[order], t[order]
        same2 = np.zeros(len(t), dtype=bool)  # has 2 predecessors
        if len(t) > 2:
            same2[2:] = (et[2:] == et[1:-1]) & (et[1:-1] == et[:-2])
        idxs = np.flatnonzero(same2)
        dod = (t[idxs] - t[idxs - 1]) - (t[idxs - 1] - t[idxs - 2])
        w = np.full(len(dod), 36, dtype=np.int64)
        w[(dod >= -2047) & (dod <= 2048)] = 16
        w[(dod >= -255) & (dod <= 256)] = 12
        w[(dod >= -63) & (dod <= 64)] = 9
        w[dod == 0] = 1
        types, inv = np.unique(et[idxs], return_inverse=True)
        n = np.bincount(inv, minlength=len(types))
        s = np.bincount(inv, weights=w.astype(np.float64),
                        minlength=len(types)).astype(np.int64)
        return pa.table({
            "event_type": pa.array(types, pa.string()),
            "n_deltas": pa.array(n.astype(np.int64)),
            "bits_est": pa.array(s),
        })

    r = partitioned_group_apply(ds, ["event_type"], bits).to_pandas()
    r = r.sort_values("event_type")
    n = r["n_deltas"].to_numpy(dtype=np.int64)
    b = r["bits_est"].to_numpy(dtype=np.int64)
    return pa.table({
        "event_type": pa.array(r["event_type"], pa.string()),
        "n_deltas": pa.array(n),
        "bits_est": pa.array(b),
        "saved_permille": pa.array(1000 * (64 * n - b) // (64 * n),
                                   pa.int64()),
    })


@query(
    "docs_psi_drift",
    """
WITH ref AS (SELECT MIN(source) AS s FROM documents),
b AS (
  SELECT LEAST(CAST(FLOOR(n_chars / 100.0) AS BIGINT), 19) AS bin,
         CASE WHEN source = (SELECT s FROM ref) THEN 1 ELSE 0 END
           AS is_ref
  FROM documents
), bins AS (SELECT UNNEST(generate_series(0, 19)) AS bin),
c AS (
  SELECT bins.bin,
         COALESCE(SUM(CASE WHEN b.is_ref = 1 THEN 1 ELSE 0 END), 0)
           AS c1,
         COALESCE(SUM(CASE WHEN b.is_ref = 0 THEN 1 ELSE 0 END), 0)
           AS c2
  FROM bins LEFT JOIN b USING (bin) GROUP BY 1
), t AS (SELECT SUM(c1) AS n1, SUM(c2) AS n2 FROM c)
SELECT CAST(MAX(t.n1) AS BIGINT) AS n_ref,
       CAST(MAX(t.n2) AS BIGINT) AS n_other,
       CAST(SUM(CAST(FLOOR(1e6 * (
         (CAST(c.c1 + 1 AS DOUBLE) / (t.n1 + 20)
          - CAST(c.c2 + 1 AS DOUBLE) / (t.n2 + 20))
         * ln((CAST(c.c1 + 1 AS DOUBLE) / (t.n1 + 20))
              / (CAST(c.c2 + 1 AS DOUBLE) / (t.n2 + 20)))))
         AS BIGINT)) AS BIGINT) AS psi_micro
FROM c CROSS JOIN t""",
)
def docs_psi_drift(sf_dir: str):
    """Population Stability Index between the reference source (the
    lexicographically smallest) and the rest, over the length
    distribution — the scorecard-industry drift metric (rule of thumb:
    PSI < 0.1 stable, > 0.25 shifted), complementing the KS sup-norm
    with a mass-weighted divergence. 20 fixed 100-char bins, Laplace
    smoothing (+1 per bin) so empty bins stay finite; each bin's
    (p1−p2)·ln(p1/p2) contribution is quantized to integer micro-PSI
    BEFORE summing (the MI discipline — order-independent, engine-
    drift-immune).

    Exchange: one bins×2 bounded count aggregate."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["source", "n_chars"])
    srcs = grouped_aggregate(ds, ["source"], [("*", "count", "_c")])
    ref_src = min(srcs["source"].to_pylist())

    def binned(b: pa.Table) -> pa.Table:
        nc = np.asarray(b["n_chars"].combine_chunks(), dtype=np.int64)
        binv = np.minimum(np.floor(nc / 100.0).astype(np.int64), 19)
        is_ref = np.asarray(pa.compute.equal(b["source"], ref_src)) \
            .astype(np.int64)
        return pa.table({
            "bin": pa.array(binv),
            "c1": pa.array(is_ref),
            "c2": pa.array(1 - is_ref),
        })

    c = grouped_aggregate(
        ds.map_batches(binned, batch_format="pyarrow", batch_size=None),
        ["bin"], [("c1", "sum", "c1"), ("c2", "sum", "c2")]).to_pandas()
    full = {int(r.bin): (int(r.c1), int(r.c2))
            for r in c.itertuples(index=False)}
    n1 = sum(v[0] for v in full.values())
    n2 = sum(v[1] for v in full.values())
    psi = 0
    for bin_ in range(20):
        c1, c2 = full.get(bin_, (0, 0))
        p1 = float(c1 + 1) / (n1 + 20)
        p2 = float(c2 + 1) / (n2 + 20)
        psi += int(np.floor(1e6 * ((p1 - p2) * np.log(p1 / p2))))
    return pa.table({
        "n_ref": pa.array([n1], pa.int64()),
        "n_other": pa.array([n2], pa.int64()),
        "psi_micro": pa.array([psi], pa.int64()),
    })


@query(
    "events_change_decomposition",
    """
WITH bounds AS (
  SELECT MIN(CAST(FLOOR(epoch(ts) / 86400) AS BIGINT)) AS lo,
         MAX(CAST(FLOOR(epoch(ts) / 86400) AS BIGINT)) AS hi
  FROM events
), q AS (
  SELECT event_type,
         CASE WHEN CAST(FLOOR(epoch(ts) / 86400) AS BIGINT)
                   <= (SELECT (lo + hi) // 2 FROM bounds)
              THEN 0 ELSE 1 END AS period,
         CAST(FLOOR(value * 10000 + 0.5) AS BIGINT) AS v4
  FROM events
), p AS (
  SELECT event_type, period, COUNT(*) AS n, SUM(v4) AS s
  FROM q GROUP BY 1, 2
), w AS (
  SELECT COALESCE(a.event_type, b.event_type) AS event_type,
         COALESCE(a.n, 0) AS n0, COALESCE(a.s, 0) AS s0,
         COALESCE(b.n, 0) AS n1, COALESCE(b.s, 0) AS s1
  FROM (SELECT * FROM p WHERE period = 0) a
  FULL OUTER JOIN (SELECT * FROM p WHERE period = 1) b
    USING (event_type)
)
SELECT event_type,
       CAST(s1 - s0 AS BIGINT) AS total_delta_e4,
       CAST(CASE WHEN n0 = 0 THEN s1
            ELSE (n1 - n0) * (s0 // n0) END AS BIGINT)
         AS volume_effect_e4,
       CAST(CASE WHEN n0 = 0 THEN 0
            WHEN n1 = 0 THEN (s1 - s0) - (n1 - n0) * (s0 // n0)
            ELSE n1 * ((s1 // n1) - (s0 // n0))
                 - (s0 - n0 * (s0 // n0))
                 + (s1 - n1 * (s1 // n1)) END AS BIGINT)
         AS rate_effect_e4
FROM w""",
)
def events_change_decomposition(sf_dir: str):
    """Mix/rate contribution analysis ("why did the total change?"):
    the period-over-period delta of total value per segment,
    decomposed into a VOLUME effect ((n1−n0)·r0, more/fewer events at
    the old rate) and a RATE effect (n1·(r1−r0) plus the integer-
    division remainder corrections, so the two effects sum EXACTLY to
    the total delta in fixed-point units — no unexplained residual).
    Periods are the first vs second half of the corpus day span;
    values in Q6-discipline 1e-4 fixed point, rates as exact floor
    quotients.

    Exchange: one (type, period) cells-bounded aggregate."""
    import numpy as np
    import ray.data as rd

    from raylog.functions.agg import grouped_aggregate

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts", "value"])

    def day(b: pa.Table) -> pa.Table:
        t = (np.asarray(b["ts"].combine_chunks())
             .astype("datetime64[us]").astype(np.int64))
        v = np.asarray(b["value"].combine_chunks(), dtype=np.float64)
        return pa.table({
            "event_type": b["event_type"],
            "d": pa.array(np.floor(t / 1e6 / 86400).astype(np.int64)),
            "v4": pa.array(np.floor(v * 10000 + 0.5).astype(np.int64)),
        })

    dd = ds.map_batches(day, batch_format="pyarrow", batch_size=None)
    span = grouped_aggregate(
        dd.map_batches(
            lambda b: pa.table({
                "g": pa.array([0], pa.int64()),
                "lo": pa.array([int(np.asarray(b["d"]).min())
                                if b.num_rows else 2**62], pa.int64()),
                "hi": pa.array([int(np.asarray(b["d"]).max())
                                if b.num_rows else -2**62], pa.int64()),
            }),
            batch_format="pyarrow", batch_size=None),
        ["g"], [("lo", "min", "lo"), ("hi", "max", "hi")])
    mid = (int(span["lo"][0].as_py()) + int(span["hi"][0].as_py())) // 2

    def per(b: pa.Table) -> pa.Table:
        d = np.asarray(b["d"].combine_chunks(), dtype=np.int64)
        return pa.table({
            "event_type": b["event_type"],
            "period": pa.array((d > mid).astype(np.int64)),
            "v4": b["v4"],
        })

    p = grouped_aggregate(
        dd.map_batches(per, batch_format="pyarrow", batch_size=None),
        ["event_type", "period"],
        [("*", "count", "n"), ("v4", "sum", "s")]).to_pandas()
    rows = []
    for et, grp in p.groupby("event_type"):
        d0 = grp[grp["period"] == 0]
        d1 = grp[grp["period"] == 1]
        n0 = int(d0["n"].iloc[0]) if len(d0) else 0
        s0 = int(d0["s"].iloc[0]) if len(d0) else 0
        n1 = int(d1["n"].iloc[0]) if len(d1) else 0
        s1 = int(d1["s"].iloc[0]) if len(d1) else 0
        total = s1 - s0
        if n0 == 0:
            vol, rate = s1, 0
        elif n1 == 0:
            vol, rate = (n1 - n0) * (s0 // n0), -s0
            # keep exact additivity: fold the remainder into rate
            rate = total - vol
        else:
            r0, r1 = s0 // n0, s1 // n1
            vol = (n1 - n0) * r0
            rate = n1 * (r1 - r0) - (s0 - n0 * r0) + (s1 - n1 * r1)
        rows.append((et, total, vol, rate))
    rows.sort()
    return pa.table({
        "event_type": pa.array([r[0] for r in rows], pa.string()),
        "total_delta_e4": pa.array([r[1] for r in rows], pa.int64()),
        "volume_effect_e4": pa.array([r[2] for r in rows], pa.int64()),
        "rate_effect_e4": pa.array([r[3] for r in rows], pa.int64()),
    })
