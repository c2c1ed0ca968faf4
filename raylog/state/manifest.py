"""Partition manifest — the engine's analog of the reference's tail offset DB.

The reference checkpoints tail offsets in SQLite WAL
(conf/ds/docker-runtime.conf:5,13-14) so a restart resumes at the last
committed file offset. The batch analog (SURVEY.md §4.3): output is laid
out one directory per input shard; a JSON-lines manifest records each
completed shard (input fragments, per-sink row counts, stage metrics,
wall time). Resume = skip shards present in the manifest; an incomplete
shard directory is deleted and idempotently rewritten.

Entries are appended atomically (single write + flush of one line) only
AFTER the shard's sink files and aggregate partials are durable, so a
crash can never record a half-written shard.
"""

from __future__ import annotations

import json
import os


class Manifest:
    def __init__(self, path: str):
        self.path = path
        self._entries: dict[int, dict] = {}
        if os.path.exists(path):
            with open(path) as f:
                for line in f:
                    line = line.strip()
                    if not line:
                        continue
                    e = json.loads(line)
                    self._entries[e["shard_id"]] = e

    def done(self, shard_id: int) -> bool:
        return shard_id in self._entries

    def entry(self, shard_id: int) -> dict | None:
        return self._entries.get(shard_id)

    def entries(self) -> list[dict]:
        return [self._entries[k] for k in sorted(self._entries)]

    def mark_done(self, shard_id: int, info: dict) -> None:
        e = {"shard_id": shard_id, **info}
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        with open(self.path, "a") as f:
            f.write(json.dumps(e) + "\n")
            f.flush()
            os.fsync(f.fileno())
        self._entries[shard_id] = e
