"""Online (streaming) dedup via a sharded shared mutable index.

The one shape the Dataset API genuinely cannot express (and the
documented escape hatch for it): cross-batch, cross-task MUTABLE state
with first-wins semantics — an append-only stream where every record
must be checked against (and inserted into) the set of all keys seen so
far, across the whole cluster, while the stream is still flowing. Batch
dedup (`functions/dedup.py`) restates this as a keyed aggregate; the
online form cannot wait for the end of the stream.

Design: ``num_shards`` singleton ``@ray.remote`` index actors, each
owning the hash-range partition ``key % num_shards`` of the seen-key
space. A normal ``map_batches`` stage hashes its batch, splits the keys
by owning shard, and issues one ``check_and_add`` round-trip per shard
(vectorized inside the actor); rows whose key was already present
anywhere upstream are dropped. Per-shard serialization makes first-wins
atomic without locks — an actor processes one request at a time.

Scale + semantics notes (the honest caveats):

- Memory: exact mode holds every distinct key once, sharded —
  ``distinct_keys × 8 B / num_shards`` per actor. For beyond-RAM streams
  use ``approximate=True``: a fixed-size per-shard Bloom filter (the
  `sketch.py` family) — false positives DROP a novel row at the
  documented rate, never the reverse.
- Determinism: the SURVIVOR SET (one representative per key) is exact
  and deterministic; WHICH physical row survives follows stream arrival
  order, which is racy under parallel ingestion — same contract as any
  streaming dedup (Flink/kafka-streams).
- Throughput: one actor round-trip per (batch, shard) pair; keys ship,
  payloads never do. Size ``num_shards`` to the hot-path core count.

Reference parity: the reference has no dedup at all — this exists for
the training-data mandate; the closest reference analog is the tail
offset DB (a shared mutable "seen" index for file positions,
conf/ds/docker-runtime.conf:5).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from raylog.functions.dedup import add_content_h128

__all__ = ["online_dedup", "DedupShard"]


@ray.remote(num_cpus=0.25)
class DedupShard:
    """Owns one hash-range partition of the seen-key space."""

    def __init__(self, approximate: bool = False,
                 bloom_bits: int = 1 << 23):
        self.approximate = approximate
        if approximate:
            self.bits = np.zeros(bloom_bits // 64, dtype=np.uint64)
            self.nbits = np.uint64(bloom_bits)
        else:
            self.seen: set[int] = set()

    def check_and_add(self, keys: np.ndarray) -> np.ndarray:
        """Vectorized first-wins membership: returns the novelty mask
        and inserts the novel keys, atomically (actor = serial)."""
        if self.approximate:
            k = keys.view(np.uint64)
            out = np.zeros(len(k), dtype=bool)
            # two derived probe positions per key (double hashing)
            h1 = k % self.nbits
            h2 = (k >> np.uint64(17) | np.uint64(1)) % self.nbits
            for i in range(len(k)):  # in-order: duplicates WITHIN the
                a, b = int(h1[i]), int(h2[i])  # batch must also dedup
                hit = (self.bits[a >> 6] >> np.uint64(a & 63)
                       & np.uint64(1)) and (
                    self.bits[b >> 6] >> np.uint64(b & 63) & np.uint64(1))
                if not hit:
                    out[i] = True
                    self.bits[a >> 6] |= np.uint64(1) << np.uint64(a & 63)
                    self.bits[b >> 6] |= np.uint64(1) << np.uint64(b & 63)
            return out
        seen = self.seen
        out = np.empty(len(keys), dtype=bool)
        for i, k in enumerate(keys.tolist()):
            if k in seen:
                out[i] = False
            else:
                seen.add(k)
                out[i] = True
        return out

    def size(self) -> int:
        # occupancy = POPCOUNT of the bit words, not their numeric sum
        # (ADVICE r2: sum of uint64 word values was astronomically wrong
        # once high bits set)
        return (int(np.unpackbits(self.bits.view(np.uint8)).sum())
                if self.approximate else len(self.seen))


class _OnlineDeduper:
    """map_batches stage: hash → shard split → one RPC per shard."""

    def __init__(self, shards, text_col: str):
        self.shards = shards
        self.n = len(shards)
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        hashed = add_content_h128(batch, self.text_col)
        keys = np.asarray(hashed["content_h1"].combine_chunks(),
                          dtype=np.int64)
        owner = keys.view(np.uint64) % np.uint64(self.n)
        mask = np.zeros(len(keys), dtype=bool)
        futs, idxs = [], []
        for s in range(self.n):
            sel = np.flatnonzero(owner == s)
            if len(sel):
                futs.append(self.shards[s].check_and_add.remote(keys[sel]))
                idxs.append(sel)
        for sel, novel in zip(idxs, ray.get(futs)):
            mask[sel] = novel
        return batch.filter(pa.array(mask))


def online_dedup(ds: rd.Dataset, text_col: str = "text",
                 num_shards: int = 8, concurrency: int = 4,
                 approximate: bool = False) -> tuple[rd.Dataset, list]:
    """First-seen-wins streaming dedup over ``ds``.

    Returns ``(deduped_dataset, shard_handles)`` — keep the handles
    alive for the duration of the stream (they ARE the index); call
    ``ray.get(h.size.remote())`` for occupancy stats, let them go out
    of scope to free the index.
    """
    shards = [DedupShard.remote(approximate=approximate)
              for _ in range(num_shards)]
    out = ds.map_batches(
        _OnlineDeduper,
        fn_constructor_args=(shards, text_col),
        concurrency=concurrency,
        batch_format="pyarrow",
        batch_size=None,
    )
    return out, shards
