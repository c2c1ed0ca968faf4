"""Distributed TF-IDF: per-document top terms without materializing a
doc×term matrix.

Shape: tf is complete per batch (a document is one row, so its term
counts never straddle batches — one Arrow ``group_by`` per batch); df is
a key-compressed distributed aggregate over the tf rows; the tf⋈df join
is the only all-to-all (hash-partitioned on term); the per-document
top-k runs inside hash partitions that hold whole documents
(`agg.partitioned_group_apply`) so the result stays a Dataset — no
driver table proportional to corpus size.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from raylog.functions.agg import grouped_aggregate_ds, partitioned_group_apply


def _tf_batch(b: pa.Table, id_col: str, text_col: str) -> pa.Table:
    split = pc.split_pattern(b[text_col], pattern=" ")
    if isinstance(split, pa.ChunkedArray):
        split = split.combine_chunks()
    lengths = np.asarray(pc.list_value_length(split), dtype=np.int64)
    ids = np.asarray(b[id_col].combine_chunks(), dtype=np.int64)
    flat = pa.table({
        id_col: pa.array(np.repeat(ids, lengths)),
        "term": split.flatten(),
    })
    g = flat.group_by([id_col, "term"]).aggregate([([], "count_all")])
    return g.rename_columns([id_col, "term", "tf"])


def tfidf_top_terms(
    ds: rd.Dataset,
    n_docs: int,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_partitions: int = 16,
) -> rd.Dataset:
    """Top-k terms per document by tf·ln(N/df), ties broken by term."""
    # tf feeds BOTH the df aggregate and the scoring join — materialize
    # once so the tokenize+count pass (the most expensive stage) does not
    # re-execute per consumer
    tf = ds.map_batches(
        lambda b: _tf_batch(b, id_col, text_col),
        batch_format="pyarrow", batch_size=None,
    ).materialize()
    df = grouped_aggregate_ds(
        tf.select_columns(["term"]), ["term"], [("*", "count", "df")],
        num_partitions=num_partitions,
    )
    scored = tf.join(
        df, join_type="inner", num_partitions=num_partitions,
        on=("term",), right_on=("term",),
    ).map_batches(
        lambda b: b.append_column(
            "score",
            pc.multiply(
                pc.cast(b["tf"], pa.float64()),
                pc.ln(pc.divide(float(n_docs),
                                pc.cast(b["df"], pa.float64()))),
            ),
        ).drop_columns(["df"]),
        batch_format="pyarrow", batch_size=None,
    )

    def head_k(part: pa.Table) -> pa.Table:
        pdf = part.to_pandas().sort_values(
            [id_col, "score", "term"], ascending=[True, False, True],
            kind="mergesort",
        )
        pdf["rank"] = pdf.groupby(id_col, sort=False).cumcount() + 1
        pdf = pdf[pdf["rank"] <= k]
        return pa.Table.from_pandas(pdf.reset_index(drop=True),
                                    preserve_index=False)

    return partitioned_group_apply(scored, [id_col], head_k,
                                   num_partitions=num_partitions)
