"""Distributed PCA over an embedding column.

The scale shape is the moment-matrix trick: PCA needs only the d×d
second-moment matrix, and that is a sum of per-batch outer products —
so the corpus streams once through ``map_batches`` emitting
(Σx, ΣxᵀX, n) partials (d²-bounded, independent of row count), the
driver reduces the tiny partials, and the eigendecomposition runs on a
d×d matrix locally. Projection is then a broadcast-components matmul
per batch — the same broadcast-small-side pattern as the ANN kernels.
Nothing row-count-sized ever moves; at 100 TB the only exchange is
``n_blocks × d²`` floats.

Reference analog: none (prompt-mandated training-data operator — the
dimensionality-reduction step in front of clustering / SemDeDup-style
embedding dedup)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd


def _raw_matrix(batch, vec_col: str) -> np.ndarray:
    """list<float> column → float64 matrix, zero-copy when rectangular
    (no row normalization — PCA wants raw coordinates)."""
    col = batch[vec_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.zeros((0, 0), dtype=np.float64)
    if col.null_count == 0:
        lens = np.asarray(pa.compute.list_value_length(col), dtype=np.int64)
        if (lens == lens[0]).all() and lens[0] > 0:
            flat = col.flatten().to_numpy(zero_copy_only=False)
            return flat.astype(np.float64, copy=False).reshape(n, int(lens[0]))
    return np.array(col.to_pylist(), dtype=np.float64)


def _moment_partial(batch: pa.Table, vec_col: str) -> pa.Table:
    m = _raw_matrix(batch, vec_col)
    if m.size == 0:
        return pa.table({"n": pa.array([], pa.int64()),
                         "sx": pa.array([], pa.list_(pa.float64())),
                         "sxx": pa.array([], pa.list_(pa.float64()))})
    sx = m.sum(axis=0)
    sxx = m.T @ m
    return pa.table({
        "n": pa.array([m.shape[0]], pa.int64()),
        "sx": pa.array([sx.tolist()], pa.list_(pa.float64())),
        "sxx": pa.array([sxx.ravel().tolist()], pa.list_(pa.float64())),
    })


def embedding_cov(ds: rd.Dataset, *, vec_col: str = "embedding"):
    """Sample covariance matrix (ddof=1) of the embedding column.

    Returns (cov [d,d], mean [d], n). One streaming pass; the driver
    reduce sees one d²-sized row per block."""
    parts = ds.map_batches(lambda b: _moment_partial(b, vec_col),
                           batch_format="pyarrow", batch_size=None)
    n_tot, sx_tot, sxx_tot = 0, None, None
    for t in parts.iter_batches(batch_format="pyarrow", batch_size=None):
        for r in range(t.num_rows):
            n = t["n"][r].as_py()
            sx = np.array(t["sx"][r].as_py())
            sxx = np.array(t["sxx"][r].as_py())
            n_tot += n
            sx_tot = sx if sx_tot is None else sx_tot + sx
            sxx_tot = sxx if sxx_tot is None else sxx_tot + sxx
    d = len(sx_tot)
    mean = sx_tot / n_tot
    # n_tot == 1: sample covariance undefined; return the zero matrix
    # (eigh stays finite, projections become mean-centering only)
    denom = max(n_tot - 1, 1)
    cov = (sxx_tot.reshape(d, d) - n_tot * np.outer(mean, mean)) / denom
    return cov, mean, n_tot


def pca_fit(ds: rd.Dataset, n_components: int, *,
            vec_col: str = "embedding"):
    """Top-p principal components (rows of the returned matrix), with a
    deterministic sign convention (largest-|coord| entry positive)."""
    cov, mean, _ = embedding_cov(ds, vec_col=vec_col)
    vals, vecs = np.linalg.eigh(cov)          # ascending
    order = np.argsort(vals)[::-1][:n_components]
    comps = vecs[:, order].T                   # [p, d]
    for i in range(comps.shape[0]):            # sign convention
        j = np.argmax(np.abs(comps[i]))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return comps, mean, vals[order]


class PCAProjector:
    """Actor-pool projection: components from the object store once."""

    def __init__(self, model_ref, vec_col: str = "embedding",
                 out_col: str = "pca"):
        comps, mean = (ray.get(model_ref)
                       if isinstance(model_ref, ray.ObjectRef) else model_ref)
        self.comps, self.mean = comps, mean
        self.vec_col, self.out_col = vec_col, out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _raw_matrix(batch, self.vec_col)
        proj = (m - self.mean) @ self.comps.T if m.size else np.zeros((0, 0))
        p = self.comps.shape[0]
        flat = pa.array(proj.ravel(), pa.float64())
        offs = pa.array(np.arange(len(m) + 1, dtype=np.int32) * p, pa.int32())
        return batch.append_column(
            self.out_col, pa.ListArray.from_arrays(offs, flat))


def pca_project(ds: rd.Dataset, n_components: int, *,
                vec_col: str = "embedding", out_col: str = "pca",
                concurrency: int = 2) -> rd.Dataset:
    comps, mean, _ = pca_fit(ds, n_components, vec_col=vec_col)
    ref = (ray.put((comps, mean)) if ray.is_initialized()
           else (comps, mean))
    return ds.map_batches(
        PCAProjector,
        fn_constructor_kwargs={"model_ref": ref, "vec_col": vec_col,
                               "out_col": out_col},
        concurrency=concurrency, batch_format="pyarrow", batch_size=None)
