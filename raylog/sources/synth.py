"""Deterministic synthesizer for the engine's input contract table.

Produces the pre-tokenized sequences table from BASELINE.json's input_hint:
``(doc_id: string, tokens: list<int32>, n_tok: int32, source: string)``
plus the ``raw`` CRI log line the parse stages chew on — seeded, pure
deterministic (seed + row index → row), no wall clock, no external data.

Source distribution is zipf-skewed with one hot source carrying ~30% of
rows (FIXTURES.md §F1) to exercise the skew-handling path; ~70% of rows
carry a parseable ``LEVEL [svc,request-id,...]`` section; ~30% don't.

Generation is numpy-vectorized and writes one parquet file per chunk so
reads parallelize; the cache key is (rows, seed), so bench runs reuse it.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from raylog.records import LEVELS

WORDS = np.array(
    "key agg row scan slow fast table value part hash merge batch spark line "
    "sort window group stream column order data small big customer query join "
    "filter vector the a".split(),
    dtype=object,
)


def synth_sources(n_sources: int = 200) -> list[str]:
    return [f"app-{i:04d}" for i in range(n_sources)]


def _source_probs(n_sources: int) -> np.ndarray:
    # one hot source ≈30%, the rest zipf-ish (1/rank)
    p = 1.0 / np.arange(1, n_sources + 1, dtype=np.float64)
    p[0] = 0.0
    p = p / p.sum() * 0.7
    p[0] = 0.3
    return p


def _chunk(seed: int, chunk_id: int, start: int, n: int, n_sources: int) -> pa.Table:
    rng = np.random.default_rng((seed, chunk_id))
    idx = np.arange(start, start + n, dtype=np.int64)
    sources = np.array(synth_sources(n_sources), dtype=object)
    src_i = rng.choice(n_sources, size=n, p=_source_probs(n_sources))
    source = sources[src_i]

    # tokens: 80% short (16..64), 20% long (128..512)
    short = rng.integers(16, 65, size=n)
    long_ = rng.integers(128, 513, size=n)
    n_tok = np.where(rng.random(n) < 0.8, short, long_).astype(np.int32)
    offsets = np.concatenate([[0], np.cumsum(n_tok, dtype=np.int64)])
    values = rng.integers(0, 50_000, size=int(offsets[-1]), dtype=np.int32)
    tokens = pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int32()), pa.array(values)
    )

    # content: 6..40 words from the pool
    n_words = rng.integers(6, 41, size=n)
    w_off = np.concatenate([[0], np.cumsum(n_words)])
    w_idx = rng.integers(0, len(WORDS), size=int(w_off[-1]))
    flat_words = WORDS[w_idx]
    text = np.array(
        [" ".join(flat_words[w_off[i]: w_off[i + 1]]) for i in range(n)],
        dtype=object,
    )

    parseable = (idx % 10) < 7
    lvl = np.asarray(LEVELS, dtype=object)[idx % len(LEVELS)]
    stream = np.where(idx % 4 == 0, "stderr", "stdout")
    frac = np.char.zfill((idx % 1_000_000_000).astype("U9"), 9)

    def _s(arr):
        return pa.array(list(arr), type=pa.string())

    hex8 = np.vectorize("{:08x}".format, otypes=[object])(idx)
    hex12 = np.vectorize("{:012x}".format, otypes=[object])(idx)
    svc_d = (idx % 7).astype("U1")
    head = pc.binary_join_element_wise(
        _s(lvl), _s([" [svc-"] * n), _s(svc_d), _s([","] * n), _s(hex8),
        _s(["-0000-4000-8000-"] * n), _s(hex12), _s([",k=v] - "] * n), "",
    )
    head = pc.if_else(pa.array(parseable), head, pa.scalar("", pa.string()))
    raw = pc.binary_join_element_wise(
        _s(["2024-01-02T03:04:05."] * n), _s(frac), _s(["Z "] * n),
        _s(stream), _s([" F "] * n), head, _s(text), "",
    )
    doc_id = pc.binary_join_element_wise(
        _s(source), _s(["-"] * n), _s(np.char.zfill(idx.astype("U12"), 12)), ""
    )
    return pa.table(
        {
            "doc_id": doc_id,
            "tokens": tokens,
            "n_tok": pa.array(n_tok),
            "source": _s(source),
            "raw": raw,
        }
    )


def synthesize_sequences(
    out_dir: str,
    rows: int,
    *,
    seed: int = 42,
    n_sources: int = 200,
    rows_per_file: int = 125_000,
    row_group_size: int = 15_625,
    force: bool = False,
) -> list[str]:
    """Write the sequences table to ``out_dir`` (cached); returns file list.

    Files are independent chunks (seeded per chunk) so synthesis can run
    per-file and readers parallelize across files.
    """
    os.makedirs(out_dir, exist_ok=True)
    done_flag = os.path.join(out_dir, "_SYNTH_DONE")
    n_files = max(1, (rows + rows_per_file - 1) // rows_per_file)
    paths = [os.path.join(out_dir, f"seq-{i:05d}.parquet") for i in range(n_files)]
    if os.path.exists(done_flag) and not force:
        return paths
    def _write(i: int, path: str, start: int, n: int) -> None:
        tbl = _chunk(seed, i, start, n, n_sources)
        # multiple row groups per file so parquet reads parallelize within
        # a file and Ray gets right-sized blocks without SplitBlocks
        pq.write_table(tbl, path, compression="zstd", row_group_size=row_group_size)

    jobs = []
    start = 0
    for i, path in enumerate(paths):
        n = min(rows_per_file, rows - start)
        jobs.append((i, path, start, n))
        start += n
    try:
        import ray

        parallel = ray.is_initialized()
    except ImportError:  # pragma: no cover
        parallel = False
    if parallel:
        remote_write = ray.remote(lambda *a: _write(*a))
        ray.get([remote_write.remote(*j) for j in jobs])
    else:
        for j in jobs:
            _write(*j)
    with open(done_flag, "w") as f:
        f.write(f"rows={rows} seed={seed} files={n_files}\n")
    return paths
