"""Shared stage-metric counters.

``stage_metrics`` (log_pipeline.py) reports per-operator wall time from
``ds.stats()``; this module is the complement for SEMANTIC counters a
stage wants to surface — events the physical plan hides, like "how many
hot-fingerprint buckets did ``max_postings`` trim" (the signal that a
``shared`` count degraded from exact to lower-bound on a 100 TB run).

A single zero-CPU actor per counter group: map tasks call (and ack)
``add.remote`` only on the RARE event path (a capped bucket), so the
hot path stays free of actor round-trips; the driver reads the totals
once after the run. Callers must ``ray.get`` the add so the increment
is processed before the task completes — a fire-and-forget add can
still be in the actor's mailbox when the driver reads the totals.
"""

from __future__ import annotations

import ray


@ray.remote(num_cpus=0)
class CounterActor:
    """Named monotonically-increasing int counters."""

    def __init__(self):
        self._c: dict[str, int] = {}

    def add(self, name: str, value: int = 1) -> None:
        self._c[name] = self._c.get(name, 0) + int(value)

    def get(self) -> dict[str, int]:
        return dict(self._c)


def make_counters() -> "ray.actor.ActorHandle":
    """A fresh counter group (callers own the handle's lifetime)."""
    return CounterActor.remote()


def read_counters(handle) -> dict[str, int]:
    return ray.get(handle.get.remote())
