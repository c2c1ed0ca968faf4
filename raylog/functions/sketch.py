"""Cardinality sketches — approximate distinct counts at 100 TB scale.

Exact distinct (``grouped_aggregate_ds``) shuffles every distinct key;
when only the COUNT is needed, a HyperLogLog sketch gets it in one
streaming pass with O(2^p) state: each batch folds its values into a
4 KB register array (a partial), partials merge by element-wise max —
associative, commutative, and tiny, so the exchange volume is
``blocks × 2^p bytes`` regardless of input size or key cardinality.

Standard HLL (Flajolet et al. 2007) with the linear-counting small-range
correction; p=12 → 4096 registers → ~1.6% standard error. Value hashing
is vectorized via polars' seeded xxhash (the same primitive the
partition-id path uses), with a blake2b per-unique-value fallback.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data as rd


def _hash64(col: pa.Array) -> np.ndarray:
    """Vectorized 64-bit value hash (polars xxhash; blake2b fallback)."""
    try:
        import polars as pl

        s = pl.from_arrow(col).cast(pl.Utf8).fill_null("\x00null")
        return s.hash(seed=29).to_numpy().astype(np.uint64)
    except Exception:  # pragma: no cover - polars present in image
        vals = col.to_pylist()
        return np.fromiter(
            (int.from_bytes(
                hashlib.blake2b(str(v).encode(), digest_size=8).digest(),
                "big") for v in vals),
            dtype=np.uint64, count=len(vals),
        )


def hll_partial(values: pa.Array, p: int = 12) -> np.ndarray:
    """Fold a value array into a fresh 2^p-register HLL (uint8)."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    h = _hash64(values)
    if len(h) == 0:
        return regs
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    w = h << np.uint64(p) >> np.uint64(p)  # low 64-p bits
    # rho = leading-zero count of w within 64-p bits, + 1.
    # w < 2^52 for p=12, so float64 log2 is exact.
    bits = np.zeros(len(w), dtype=np.int64)
    nz = w > 0
    bits[nz] = np.floor(np.log2(w[nz].astype(np.float64))).astype(np.int64) + 1
    rho = (64 - p) - bits + 1
    np.maximum.at(regs, idx, rho.astype(np.uint8))
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int(np.sum(regs == 0))
    if est <= 2.5 * m and zeros > 0:  # linear counting small-range
        est = m * np.log(m / zeros)
    return float(est)


def approx_distinct(ds: rd.Dataset, col: str, *, p: int = 12) -> pa.Table:
    """One-row table (approx_distinct: int64): streaming HLL merge.

    Per-batch partial = the packed register array (2^p bytes); the merge
    is element-wise max over the tiny partials — never a key shuffle.
    """
    def partial(batch: pa.Table) -> pa.Table:
        c = batch[col]
        c = c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
        regs = hll_partial(c, p)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    merged = np.zeros(1 << p, dtype=np.uint8)
    for t in partials.iter_batches(batch_format="pyarrow", batch_size=None):
        for blob in t["regs"].to_pylist():
            merged = np.maximum(merged, np.frombuffer(blob, dtype=np.uint8))
    return pa.table({
        "approx_distinct": pa.array([int(round(hll_estimate(merged)))],
                                    pa.int64())
    })
