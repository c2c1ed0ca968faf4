"""Pipeline stages: pure Arrow-batch transforms + actor-pool stages.

Every stage is either a pure function ``(pa.Table) -> pa.Table`` (stateless,
runs as Ray tasks via ``map_batches(fn, batch_format="pyarrow")``) or a
callable class (stateful: compiled regexes / broadcast lookup tables built
once per actor in ``__init__``, applied per batch in ``__call__``).
"""

from raylog.stages.parse import (  # noqa: F401
    CRI_TIME_RE,
    ERDA_INFO_RE,
    cri_parse,
    erda_info,
    parse_cri_time_ns,
    truncate_content,
)
from raylog.stages.enrich import BroadcastEnricher, constant_tags  # noqa: F401
from raylog.stages.route import (  # noqa: F401
    SINKS,
    add_route_flags,
    pack_tags,
    project_logevent,
    sink_mask,
)
