"""Partition manifest — the engine's analog of the reference's tail offset DB.

The reference checkpoints tail offsets in SQLite WAL
(conf/ds/docker-runtime.conf:5,13-14) so a restart resumes at the last
committed file offset. The batch analog (SURVEY.md §4.3): output is laid
out one directory per input shard; a manifest records each completed
shard (input fragments, per-sink row counts, stage metrics, wall time).
Resume = skip shards present in the manifest; an incomplete shard
directory is deleted and idempotently rewritten.

Two storage backends behind one interface (round 5 — multi-node
readiness, see ``state/fsio.py``):

- **local POSIX** (default, ``filesystem=None`` + plain path): a
  JSON-lines file; entries append atomically (single write + flush +
  fsync of one line) only AFTER the shard's sink files are durable, so
  a crash can never record a half-written shard. Fastest, and the
  behavior every existing test pins.
- **pyarrow.fs** (``filesystem=`` injected, or a URI path): object
  stores have no atomic append, so each entry is its own small JSON
  object under ``<path>.d/`` committed via the shared
  write-then-finalize contract. Load lists the directory and skips
  anything unparseable — a torn entry (impossible on rename FSes,
  conceivable mid-PUT elsewhere) reads as "shard not done", which
  resume handles by redoing the shard idempotently.
"""

from __future__ import annotations

import json
import os

from raylog.state import fsio


class Manifest:
    def __init__(self, path: str, filesystem=None):
        self.path = path
        self._local = filesystem is None and "://" not in str(path)
        self._entries: dict[object, dict] = {}
        if self._local:
            self.fs = None
            if os.path.exists(path):
                with open(path) as f:
                    for line in f:
                        line = line.strip()
                        if not line:
                            continue
                        e = json.loads(line)
                        self._entries[e["shard_id"]] = e
        else:
            self.fs, self._fs_path = fsio.resolve_fs(path, filesystem)
            self._dir = self._fs_path + ".d"
            for p in fsio.list_committed(self.fs, self._dir,
                                         suffix=".json"):
                try:
                    e = json.loads(fsio.read_bytes(self.fs, p))
                except (ValueError, OSError):
                    continue  # torn entry == shard not done; redo it
                self._entries[e["shard_id"]] = e

    def done(self, shard_id) -> bool:
        return shard_id in self._entries

    def entry(self, shard_id) -> dict | None:
        return self._entries.get(shard_id)

    def entries(self) -> list[dict]:
        # shard ids may mix ints (numbered shards) and strings (file
        # names) — group by kind so sorted() never compares across
        return [self._entries[k] for k in
                sorted(self._entries, key=lambda k: (isinstance(k, str), k))]

    def mark_done(self, shard_id, info: dict) -> None:
        e = {"shard_id": shard_id, **info}
        if self._local:
            os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
            with open(self.path, "a") as f:
                f.write(json.dumps(e) + "\n")
                f.flush()
                os.fsync(f.fileno())
        else:
            import hashlib

            fsio.ensure_dir(self.fs, self._dir)
            # shard_id is the file identity → a retried mark replaces
            slug = hashlib.md5(str(shard_id).encode()).hexdigest()[:16]
            fsio.write_bytes_atomic(
                self.fs, (json.dumps(e) + "\n").encode(),
                fsio.join(self._dir, f"shard-{slug}.json"))
        self._entries[shard_id] = e
