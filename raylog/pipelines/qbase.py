"""Driver-facing query registry: one entry per operator/pipeline.

Each query is a callable ``(sf_dir) -> ray.data.Dataset`` paired with an
ANSI-SQL oracle string DuckDB can run over the same parquet tables (views
``documents`` etc. pre-registered by the driver). Column names match
between the Ray result and the SQL exactly; list-typed payload columns are
checked through scalar proxies (``n_tok``, ``tok_sum``) here and through
true list equality in the pytest suite.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import pyarrow as pa

from raylog import records as R
from raylog.stages import route

QUERIES: dict[str, Callable[[str], Any]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, sql: str | None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn

    return deco


def _P() -> str:
    return R.oracle_prefix()


from raylog.pipelines.eci_pipeline import (  # noqa: E402
    ECI_CONST_TAGS as _ECI_TAGS,
)


def _src_tag(sf_dir: str, table: str = "documents") -> str:
    """Cache tag for fixtures derived from ``sf_dir``'s parquet: the
    full path plus the source file's (mtime_ns, size) fingerprint, so a
    regenerated fixture at the same path — or two sf dirs sharing a leaf
    name — never serves a stale derived file."""
    import os

    p = f"{sf_dir}/{table}.parquet"
    st = os.stat(p)
    base = sf_dir.strip("/").replace("/", "_")
    return f"{base}.{st.st_mtime_ns:x}_{st.st_size:x}"


def _tmp_name(path: str) -> str:
    """Per-process temp name so concurrent writers never interleave
    before the atomic ``os.replace``."""
    import os

    return f"{path}.tmp{os.getpid()}"


# --------------------------------------------------------------------------
