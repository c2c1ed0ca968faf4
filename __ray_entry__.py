"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB. Neither this module nor the raylog library calls ``ray.init()`` /
``ray.shutdown()``; only bench.py, CLI entry points and the test fixture
own a Ray session.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: full parse → enrich →
    route fan-out, consumed to the per-sink aggregate counts."""
    from raylog.pipelines import log_pipeline as LP

    routed = LP.full_pipeline("/root/testdata/sf0.001")
    return LP.sink_counts(routed)


def queries() -> dict[str, Callable[[str], Any]]:
    from raylog.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from raylog.pipelines.queries import ORACLES

    return dict(ORACLES)
