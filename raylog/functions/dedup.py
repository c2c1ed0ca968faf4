"""Deduplication operators for training-data pipelines.

Five dedup families over the ``documents`` / ``embeddings`` tables, each
expressed Ray-Data-first:

- exact: content hash → hash-partitioned keep-first (min doc_id)
- n-gram Jaccard: shingle inverted index → co-occurrence pair counts →
  exact Jaccard (the brute-force oracle-checkable baseline)
- MinHash + LSH: shingle → 64 minhashes → 16 bands × 4 rows → bucket
  groupby → candidate pairs → Jaccard verification (the scale path: cost
  is bounded by bucket collisions, not n²)
- SimHash: 64-bit signature, pigeonhole banding on 4×16-bit chunks →
  candidates → Hamming-distance verification
- embedding cosine near-dup: normalized matmul against a broadcast
  matrix (brute force at small n; at scale use the IVF path in
  similarity.py)

Shingle/word hashing uses blake2b (process-stable); minhash permutations
are the classic (a*x + b) mod p family with a seeded generator.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

MERSENNE_P = (1 << 61) - 1


def _stable_hash64(s: str) -> int:
    return int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "big")


def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    words = text.split(" ")
    if len(words) < k:
        grams = [" ".join(words)]
    else:
        grams = [" ".join(words[i: i + k]) for i in range(len(words) - k + 1)]
    return np.unique(np.fromiter((_stable_hash64(g) for g in set(grams)),
                                 dtype=np.uint64))


def add_content_hash(batch: pa.Table, text_col: str = "text") -> pa.Table:
    text = batch[text_col]
    text = text.combine_chunks() if isinstance(text, pa.ChunkedArray) else text
    h = pa.array([hashlib.md5(t.encode()).hexdigest() for t in text.to_pylist()])
    return batch.append_column("content_md5", h)


def exact_dedup_survivors(ds: rd.Dataset, id_col: str = "doc_id",
                          text_col: str = "text") -> pa.Table:
    """Keep-first exact dedup: min(id) per content hash (tree aggregate)."""
    from raylog.functions.agg import grouped_aggregate

    hashed = ds.map_batches(
        lambda b: add_content_hash(b, text_col).select(["content_md5", id_col]),
        batch_format="pyarrow", batch_size=None,
    )
    g = grouped_aggregate(hashed, ["content_md5"], [(id_col, "min", id_col)])
    return g.select([id_col])


def _shingle_rows(batch: pa.Table, id_col: str, text_col: str, k: int) -> pa.Table:
    ids, text = batch[id_col].to_pylist(), batch[text_col].to_pylist()
    out_id, out_sh = [], []
    for i, t in zip(ids, text):
        hs = _shingle_hashes(t, k)
        out_id.extend([i] * len(hs))
        out_sh.extend(hs.tolist())
    return pa.table({
        "doc_id": pa.array(out_id, pa.int64()),
        "shingle": pa.array(out_sh, pa.uint64()),
    })


def ngram_jaccard_pairs(
    ds: rd.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.3,
) -> pa.Table:
    """All pairs with word-k-gram Jaccard ≥ threshold (exact, via an
    inverted shingle index — the oracle-checkable baseline).

    Returns (doc_a, doc_b, jacc_milli). Pair generation is per-shingle
    (groupby shingle), so a stop-shingle shared by m docs costs m²/2 —
    acceptable for the exact baseline; the LSH variant is the scale path.
    """
    from raylog.functions.agg import grouped_aggregate

    shingles = ds.map_batches(
        lambda b: _shingle_rows(b, id_col, text_col, k),
        batch_format="pyarrow", batch_size=None,
    )
    sizes_tbl = grouped_aggregate(shingles, ["doc_id"], [("*", "count", "n")])
    sizes = dict(zip(sizes_tbl["doc_id"].to_pylist(), sizes_tbl["n"].to_pylist()))

    def pairs_per_shingle(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["doc_id"].to_numpy())
        if len(ids) < 2:
            return pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                                 "doc_b": pd.Series(dtype="int64")})
        a, b = np.triu_indices(len(ids), 1)
        return pd.DataFrame({"doc_a": ids[a], "doc_b": ids[b]})

    pair_rows = shingles.groupby("shingle").map_groups(
        pairs_per_shingle, batch_format="pandas"
    )
    inter = grouped_aggregate(pair_rows, ["doc_a", "doc_b"], [("*", "count", "c")])
    da = inter["doc_a"].to_numpy(); db = inter["doc_b"].to_numpy()
    c = inter["c"].to_numpy().astype(np.float64)
    na = np.fromiter((sizes[x] for x in da), dtype=np.float64, count=len(da))
    nb = np.fromiter((sizes[x] for x in db), dtype=np.float64, count=len(db))
    jacc = c / (na + nb - c)
    keep = jacc >= threshold
    return pa.table({
        "doc_a": pa.array(da[keep]),
        "doc_b": pa.array(db[keep]),
        "jacc_milli": pa.array(np.floor(1000 * jacc[keep]).astype(np.int64)),  # floor: rational, see text.py
    })


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def _minhash_params(num_hashes: int, seed: int = 13):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE_P, size=num_hashes, dtype=np.uint64)
    b = rng.integers(0, MERSENNE_P, size=num_hashes, dtype=np.uint64)
    return a, b


def _signature(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    # (a*x + b) mod p per permutation; min over shingles
    x = shingles.astype(np.object_)  # python ints: avoid uint64 overflow
    sig = np.empty(len(a), dtype=np.uint64)
    for i in range(len(a)):
        vals = (int(a[i]) * x + int(b[i])) % MERSENNE_P
        sig[i] = np.uint64(min(vals))
    return sig


class MinHashLSH:
    """Actor stage: text → (band_id, band_hash, doc_id) bucket rows.

    Permutation parameters built once per actor in ``__init__``.
    """

    def __init__(self, num_hashes: int = 64, bands: int = 16, k: int = 3,
                 id_col: str = "doc_id", text_col: str = "text"):
        assert num_hashes % bands == 0
        self.a, self.b = _minhash_params(num_hashes)
        self.bands = bands
        self.rows = num_hashes // bands
        self.k = k
        self.id_col, self.text_col = id_col, text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        texts = batch[self.text_col].to_pylist()
        out_id, out_band, out_bh = [], [], []
        for i, t in zip(ids, texts):
            sig = _signature(_shingle_hashes(t, self.k), self.a, self.b)
            for band in range(self.bands):
                chunk = sig[band * self.rows: (band + 1) * self.rows]
                bh = _stable_hash64(",".join(map(str, chunk.tolist())))
                out_id.append(i)
                out_band.append(band)
                out_bh.append(bh)
        return pa.table({
            "doc_id": pa.array(out_id, pa.int64()),
            "band": pa.array(out_band, pa.int32()),
            "band_hash": pa.array(out_bh, pa.uint64()),
        })


def minhash_lsh_pairs(
    ds: rd.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.3,
    num_hashes: int = 64,
    bands: int = 16,
    concurrency: int = 2,
) -> pa.Table:
    """Near-dup pairs via MinHash banding, verified with exact Jaccard.

    Candidates = pairs sharing any (band, band_hash) bucket; each
    candidate is then verified against the true shingle Jaccard (shingle
    sets recomputed per verification batch — at cluster scale this is a
    hash-join back to a shingle store instead).
    """
    buckets = ds.map_batches(
        MinHashLSH,
        fn_constructor_kwargs=dict(num_hashes=num_hashes, bands=bands, k=k,
                                   id_col=id_col, text_col=text_col),
        concurrency=concurrency, batch_format="pyarrow", batch_size=None,
    )

    def pairs_per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(g["doc_id"].to_numpy())
        if len(ids) < 2:
            return pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                                 "doc_b": pd.Series(dtype="int64")})
        a, b = np.triu_indices(len(ids), 1)
        return pd.DataFrame({"doc_a": ids[a], "doc_b": ids[b]})

    cand = buckets.groupby(["band", "band_hash"]).map_groups(
        pairs_per_bucket, batch_format="pandas"
    )
    cand_pairs = {
        (r["doc_a"], r["doc_b"])
        for t in cand.iter_batches(batch_format="pyarrow", batch_size=None)
        for r in t.to_pylist()
    }
    if not cand_pairs:
        return pa.table({"doc_a": pa.array([], pa.int64()),
                         "doc_b": pa.array([], pa.int64()),
                         "jacc_milli": pa.array([], pa.int64())})
    # verify: recompute shingle sets for docs involved
    needed = {d for p in cand_pairs for d in p}
    texts = {}
    for t in ds.map_batches(lambda b: b.select([id_col, text_col]),
                            batch_format="pyarrow", batch_size=None).iter_batches(
            batch_format="pyarrow", batch_size=None):
        for i, tx in zip(t[id_col].to_pylist(), t[text_col].to_pylist()):
            if i in needed:
                texts[i] = tx
    out_a, out_b, out_j = [], [], []
    sh_cache: dict[int, set] = {}

    def sh(d):
        if d not in sh_cache:
            sh_cache[d] = set(_shingle_hashes(texts[d], k).tolist())
        return sh_cache[d]

    for a_, b_ in sorted(cand_pairs):
        sa, sb = sh(a_), sh(b_)
        j = len(sa & sb) / len(sa | sb)
        if j >= threshold:
            out_a.append(a_)
            out_b.append(b_)
            out_j.append(int(np.floor(1000 * j)))
    return pa.table({"doc_a": pa.array(out_a, pa.int64()),
                     "doc_b": pa.array(out_b, pa.int64()),
                     "jacc_milli": pa.array(out_j, pa.int64())})


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def _simhash64(text: str) -> int:
    acc = np.zeros(64, dtype=np.int64)
    shifts = np.arange(64, dtype=np.uint64)
    one = np.uint64(1)
    for w in set(text.split(" ")):
        h = np.uint64(_stable_hash64(w))
        bits = (h >> shifts) & one
        acc += np.where(bits == one, 1, -1)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


class SimHash:
    """Actor stage: text → 64-bit simhash + 4×16-bit band keys."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col, self.text_col = id_col, text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        texts = batch[self.text_col].to_pylist()
        sigs = [_simhash64(t) for t in texts]
        out_id, out_band, out_key, out_sig = [], [], [], []
        for i, s in zip(ids, sigs):
            for band in range(4):
                out_id.append(i)
                out_band.append(band)
                out_key.append((s >> (16 * band)) & 0xFFFF)
                out_sig.append(s)
        return pa.table({
            "doc_id": pa.array(out_id, pa.int64()),
            "band": pa.array(out_band, pa.int32()),
            "key": pa.array(out_key, pa.int32()),
            "sig": pa.array(out_sig, pa.uint64()),
        })


def simhash_pairs(
    ds: rd.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 12,
    concurrency: int = 2,
) -> pa.Table:
    """Pairs with simhash Hamming distance ≤ max_hamming.

    Pigeonhole banding: any pair within distance ≤ 48/16-bit... more
    precisely, distance ≤ 3 is guaranteed caught by 4 bands; larger
    distances are caught probabilistically (documented recall trade).
    Candidates verified exactly via popcount.
    """
    sigs = ds.map_batches(
        SimHash, fn_constructor_kwargs=dict(id_col=id_col, text_col=text_col),
        concurrency=concurrency, batch_format="pyarrow", batch_size=None,
    )

    def pairs_per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        u = g.drop_duplicates("doc_id").sort_values("doc_id")
        ids = u["doc_id"].to_numpy()
        ss = u["sig"].to_numpy(dtype=np.uint64)
        if len(ids) < 2:
            return pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                                 "doc_b": pd.Series(dtype="int64"),
                                 "hamming": pd.Series(dtype="int64")})
        a, b = np.triu_indices(len(ids), 1)
        x = ss[a] ^ ss[b]
        ham = np.array([bin(int(v)).count("1") for v in x], dtype=np.int64)
        keep = ham <= max_hamming
        return pd.DataFrame({"doc_a": ids[a][keep], "doc_b": ids[b][keep],
                             "hamming": ham[keep]})

    cand = sigs.groupby(["band", "key"]).map_groups(
        pairs_per_bucket, batch_format="pandas"
    )
    rows = {}
    for t in cand.iter_batches(batch_format="pyarrow", batch_size=None):
        for r in t.to_pylist():
            rows[(r["doc_a"], r["doc_b"])] = r["hamming"]
    pairs = sorted(rows)
    return pa.table({
        "doc_a": pa.array([p[0] for p in pairs], pa.int64()),
        "doc_b": pa.array([p[1] for p in pairs], pa.int64()),
        "hamming": pa.array([rows[p] for p in pairs], pa.int64()),
    })


# ---------------------------------------------------------------------------
# Embedding cosine near-dup
# ---------------------------------------------------------------------------

def embedding_near_dup_pairs(
    ds: rd.Dataset,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
) -> pa.Table:
    """Pairs with cosine ≥ threshold: per-batch float64 matmul against the
    broadcast normalized corpus matrix (brute-force baseline; IVF path in
    similarity.py is the 10^9-vector plan)."""
    import ray

    corpus = pa.concat_tables(
        list(ds.map_batches(lambda b: b.select([id_col, vec_col]),
                            batch_format="pyarrow", batch_size=None)
             .iter_batches(batch_format="pyarrow", batch_size=None))
    )
    ids = corpus[id_col].to_numpy()
    mat = np.stack([np.asarray(v, dtype=np.float64) for v in corpus[vec_col].to_pylist()])
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    mat_ref = ray.put((ids, mat)) if ray.is_initialized() else (ids, mat)

    def batch_pairs(batch: pa.Table) -> pa.Table:
        cids, cmat = ray.get(mat_ref) if ray.is_initialized() else mat_ref
        bids = batch[id_col].to_numpy(zero_copy_only=False) if hasattr(batch[id_col], "to_numpy") else np.asarray(batch[id_col])
        bmat = np.stack([np.asarray(v, dtype=np.float64) for v in batch[vec_col].to_pylist()])
        bmat /= np.linalg.norm(bmat, axis=1, keepdims=True)
        sims = bmat @ cmat.T
        ai, bj = np.where(sims >= threshold)
        keep = bids[ai] < cids[bj]  # canonical a<b, excludes self
        return pa.table({
            "vec_a": pa.array(bids[ai][keep], pa.int64()),
            "vec_b": pa.array(cids[bj][keep], pa.int64()),
            "cos_milli": pa.array(np.round(1000 * sims[ai, bj][keep]).astype(np.int64)),
        })

    out = ds.map_batches(batch_pairs, batch_format="pyarrow", batch_size=None)
    tables = list(out.iter_batches(batch_format="pyarrow", batch_size=None))
    if not tables:
        return pa.table({"vec_a": pa.array([], pa.int64()),
                         "vec_b": pa.array([], pa.int64()),
                         "cos_milli": pa.array([], pa.int64())})
    return pa.concat_tables(tables)
