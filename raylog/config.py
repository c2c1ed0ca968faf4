"""Config-driven pipeline assembly — the user-extension surface.

The reference's extension points are fluent-bit config stanzas ([FILTER]
chains selecting named parsers/plugins, SURVEY §2.9): a pipeline IS an
ordered list of declaratively-configured steps. The raylog analog: a
registry of named steps (pure Arrow-batch functions or actor classes) and
``build_pipeline(ds, steps)`` which applies a JSON/YAML-able list of
``{"step": name, ...params}`` stanzas in order.

Registering a custom step::

    @register_step("my_filter")
    def my_filter(batch: pa.Table, *, threshold: int = 0) -> pa.Table: ...

    build_pipeline(ds, [{"step": "cri_parse"}, {"step": "my_filter",
                        "threshold": 3}])

Actor-class steps declare ``STEP_KIND = "actor"`` and receive their params
in ``__init__`` (state built once per actor); per-stanza ``concurrency``
and ``batch_size`` control the pool.
"""

from __future__ import annotations

import functools
from collections.abc import Callable

import pyarrow as pa
import ray.data as rd

STEP_REGISTRY: dict[str, Callable | type] = {}


def register_step(name: str):
    def deco(obj):
        STEP_REGISTRY[name] = obj
        return obj

    return deco


def _register_builtins() -> None:
    from raylog.stages import enrich, parse, reshape, route

    STEP_REGISTRY.update(
        {
            "cri_parse": parse.cri_parse,        # P4
            "truncate": parse.truncate_content,  # P1
            "erda_info": parse.erda_info,        # P2
            "log_id": parse.log_id,              # P6
            "cpuset": parse.cpuset_container_id, # P7
            "enrich": enrich.BroadcastEnricher,  # E1/E2 (actor)
            "constant_tags": enrich.constant_tags,  # E3/E4
            "pack_tags": route.pack_tags,        # N9/N10 (canonical string)
            "pack_tags_map": route.pack_tags_map,    # N10 typed map
            "pack_labels_map": route.pack_labels_map,  # N9 typed map
            "route_flags": route.add_route_flags,  # T1/T2
            "merge_log": parse.merge_log,        # E1 Merge_Log
            "firstline_flags": parse.firstline_flags,  # P5 detector
            "lift": reshape.lift_struct,         # N1/N2
            "nest": reshape.nest_columns,        # N3/N5/N9/N10
            "remove_wildcard": reshape.drop_by_prefix,  # N4/N12
            "modify": reshape.apply_modify,      # N7/N8/N11
        }
    )
    # training-data batch kernels — config-driven curation chains
    from raylog.functions import multimodal, text

    STEP_REGISTRY.update(
        {
            "quality_scores": text.quality_scores,
            "lang_id": text.lang_id,
            "char_entropy": text.char_entropy,
            "token_counts": text.token_counts,
            "fingerprints": text.fingerprints,
            "chunk_texts": text.chunk_texts,
            "media_features": multimodal.MediaFeatures,  # actor
        }
    )


_register_builtins()
# actor-class steps
STEP_REGISTRY["enrich"].STEP_KIND = "actor"


def build_pipeline(ds: rd.Dataset, steps: list[dict]) -> rd.Dataset:
    """Apply an ordered list of step stanzas (the [FILTER]-chain analog)."""
    for stanza in steps:
        stanza = dict(stanza)
        name = stanza.pop("step")
        obj = STEP_REGISTRY[name]
        if getattr(obj, "STEP_KIND", "fn") == "actor" or isinstance(obj, type):
            concurrency = stanza.pop("concurrency", 2)
            batch_size = stanza.pop("batch_size", None)
            ds = ds.map_batches(
                obj,
                fn_constructor_kwargs=stanza,
                concurrency=concurrency,
                batch_format="pyarrow",
                batch_size=batch_size,
            )
        else:
            batch_size = stanza.pop("batch_size", None)
            fn = functools.partial(obj, **stanza) if stanza else obj
            ds = ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)
    return ds
