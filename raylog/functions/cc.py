"""Distributed connected components → dedup cluster resolution.

The dedup family (exact / n-gram / MinHash / SimHash / embedding) emits
near-duplicate PAIRS; turning pairs into a curated corpus needs the
transitive closure — cluster ids — and a keep-one-representative rule.
This is iterative min-label propagation over the pair graph, expressed
entirely in Dataset operations:

    labels(v) ← v                                 (init)
    labels(v) ← min(labels(v), min_{(u,v)∈E} labels(u))   (iterate)

Each iteration is one hash-partitioned join (labels ⋈ symmetrized edges)
plus one hash-partitioned min-aggregate (`agg.grouped_aggregate_ds`) —
no driver-side graph, no per-node Python. Convergence is detected with a
tagged-minimum trick: old labels ride along as `old_lbl`, propagated
labels carry `old_lbl = +inf`, so after the min-aggregate a node changed
iff `lbl < old_lbl`; the changed-count is a constant-key partial-sum
aggregate (one int on the driver per iteration).

Iteration count is the cluster DIAMETER, not the graph size — duplicate
clusters are near-cliques (every member shares most shingles), so 2-4
rounds close them in practice; `max_iters` bounds pathological chains.
For adversarial long-chain graphs at extreme scale the published
alternating large-star/small-star algorithm (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) halves chain
length per round and can be substituted — same join+min building blocks.

Labels materialize once per iteration (O(#nodes) rows, distributed in
the object store — standard iterative-graph state, spill-safe); the
input corpus itself is never re-scanned after edge/node extraction.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from raylog.functions import agg

_INF = np.iinfo(np.int64).max


def _symmetrize(b: pa.Table, a_col: str, b_col: str) -> pa.Table:
    src = pa.concat_arrays(
        [b[a_col].combine_chunks(), b[b_col].combine_chunks()]
    )
    dst = pa.concat_arrays(
        [b[b_col].combine_chunks(), b[a_col].combine_chunks()]
    )
    return pa.table({"__src": pc.cast(src, pa.int64()),
                     "__dst": pc.cast(dst, pa.int64())})


def connected_components(
    nodes: rd.Dataset,
    edges: rd.Dataset,
    *,
    id_col: str = "doc_id",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    num_partitions: int = 16,
    max_iters: int = 30,
) -> rd.Dataset:
    """(id_col, cluster_id) for every node; cluster_id = min node id in
    the node's connected component (singletons: own id)."""
    edges_sym = edges.map_batches(
        lambda b: _symmetrize(b, a_col, b_col),
        batch_format="pyarrow", batch_size=None,
    ).materialize()

    def init(b: pa.Table) -> pa.Table:
        v = pc.cast(b[id_col], pa.int64())
        return pa.table({"node": v, "lbl": v})

    labels = nodes.map_batches(
        init, batch_format="pyarrow", batch_size=None
    ).materialize()

    def finish(lbls: rd.Dataset) -> rd.Dataset:
        return lbls.map_batches(
            lambda b: pa.table({id_col: b["node"], "cluster_id": b["lbl"]}),
            batch_format="pyarrow", batch_size=None,
        )

    if edges_sym.count() == 0:  # no pairs at all: every node is a singleton
        return finish(labels)

    converged = False
    for _ in range(max_iters):
        # propagate: neighbor labels arrive at __dst
        prop = edges_sym.join(
            labels, join_type="inner", num_partitions=num_partitions,
            on=("__src",), right_on=("node",),
        ).map_batches(
            lambda b: pa.table({
                "node": b["__dst"],
                "lbl": b["lbl"],
                "old_lbl": pa.nulls(b.num_rows, pa.int64()).fill_null(_INF),
            }),
            batch_format="pyarrow", batch_size=None,
        )
        tagged_old = labels.map_batches(
            lambda b: b.append_column("old_lbl", b["lbl"]),
            batch_format="pyarrow", batch_size=None,
        )
        new_labels = agg.grouped_aggregate_ds(
            tagged_old.union(prop), ["node"],
            [("lbl", "min", "lbl"), ("old_lbl", "min", "old_lbl")],
            num_partitions=num_partitions,
        ).materialize()

        changed = agg.grouped_aggregate(
            new_labels.map_batches(
                lambda b: pa.table({
                    "k": pa.nulls(b.num_rows, pa.int8()).fill_null(0),
                    "chg": pc.cast(pc.less(b["lbl"], b["old_lbl"]), pa.int64()),
                }),
                batch_format="pyarrow", batch_size=None,
            ),
            ["k"], [("chg", "sum", "chg")],
        )
        labels = new_labels.map_batches(
            lambda b: b.drop_columns(["old_lbl"]),
            batch_format="pyarrow", batch_size=None,
        ).materialize()
        if changed.num_rows == 0 or changed["chg"][0].as_py() == 0:
            converged = True
            break

    if not converged:
        # silent non-convergence would leak duplicate "representatives"
        # into a curated corpus — refuse instead
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} "
            "iterations (graph diameter exceeds max_iters); raise "
            "max_iters or use an alternating large-star/small-star pass "
            "for long-chain graphs"
        )
    return finish(labels)


def keep_best_per_cluster(
    scored: rd.Dataset,
    clusters: rd.Dataset,
    *,
    id_col: str = "doc_id",
    score_col: str = "score_milli",
    num_partitions: int = 16,
) -> rd.Dataset:
    """Quality-aware dedup keep rule: per cluster keep the HIGHEST-scored
    member (min id breaks ties), not the min-id one — what production
    curation actually retains (the best copy of each duplicated doc).

    ``scored`` holds (id_col, score_col); ``clusters`` is the
    :func:`connected_components` output. One hash join to attach
    cluster ids, then an argmax-per-group pass inside complete-cluster
    hash partitions (lexsort + segment-first — no per-group Python).
    Output: (cluster_id, id_col, score_col, n_members)."""
    from raylog.functions.agg import partitioned_group_apply

    joined = scored.join(
        clusters, join_type="inner", num_partitions=num_partitions,
        on=(id_col,),
    )

    def pick(part: pa.Table) -> pa.Table:
        def col(name):
            c = part[name]
            return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c

        cid = np.asarray(col("cluster_id"), dtype=np.int64)
        did = np.asarray(col(id_col), dtype=np.int64)
        sc = np.asarray(col(score_col), dtype=np.int64)
        if len(cid) == 0:
            return pa.table({
                "cluster_id": pa.array([], pa.int64()),
                id_col: pa.array([], pa.int64()),
                score_col: pa.array([], pa.int64()),
                "n_members": pa.array([], pa.int64()),
            })
        order = np.lexsort((did, -sc, cid))
        cid_s, did_s, sc_s = cid[order], did[order], sc[order]
        starts = np.ones(len(cid_s), dtype=bool)
        starts[1:] = cid_s[1:] != cid_s[:-1]
        first = np.flatnonzero(starts)
        sizes = np.diff(np.concatenate([first, [len(cid_s)]]))
        return pa.table({
            "cluster_id": pa.array(cid_s[first]),
            id_col: pa.array(did_s[first]),
            score_col: pa.array(sc_s[first]),
            "n_members": pa.array(sizes.astype(np.int64)),
        })

    return partitioned_group_apply(joined, ["cluster_id"], pick,
                                   num_partitions=num_partitions)


def dedup_survivors(
    docs: rd.Dataset,
    clusters: rd.Dataset,
    *,
    id_col: str = "doc_id",
    num_partitions: int = 16,
) -> rd.Dataset:
    """Keep one representative per cluster: rows whose id IS the cluster
    id (min-id rule), joined back to the doc table — the curated corpus."""
    reps = clusters.map_batches(
        lambda b: b.filter(pc.equal(b[id_col], b["cluster_id"])).select(
            ["cluster_id"]),
        batch_format="pyarrow", batch_size=None,
    )
    return docs.join(
        reps, join_type="inner", num_partitions=num_partitions,
        on=(id_col,), right_on=("cluster_id",),
    )
