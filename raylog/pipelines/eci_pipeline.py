"""The ECI sidecar pipeline variant (conf/eci/fluent-bit.conf).

Reference chain (SURVEY §3.2): tail /stdlog/*/*.log with the path recorded
in ``__pri_log_path`` → truncate → multiline → P6 log-id (container name
from the path) → E2 Lua cpuset lookup → P7 cpuset → container id → P2
erda-info → E3 record_modifier constant env tags → reshape → T2 job
routing → sinks.

Ray shape: identical stage kernels as the DS pipeline plus the
path-derived enrichment chain; the cpuset side-file reads become one
broadcast lookup table (container name → cgroup path) resolved per batch.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from raylog.pipelines import log_pipeline as LP
from raylog.stages import enrich, parse, route

# E3 constant tags — the COMPLETE 20-key env-var record_modifier stamp
# set (conf/eci/fluent-bit.conf:77-99). The reference injects these from
# the ECI pod's environment, so they are constants for one pipeline
# instance; values here are the deterministic synthetic environment.
# Key names mirror the reference's `__tags_<name>` records with the
# repo's `eci_` column prefix (the `__tags_` lift happens in reshape).
ECI_CONST_TAGS = {
    "eci_terminus_define_tag": "eci-job-tag",
    "eci_terminus_key": "terminus-key-0",
    "eci_org_id": "1",
    "eci_org_name": "erda",
    "eci_project_id": "42",
    "eci_project_name": "proj-erda",
    "eci_application_id": "7",
    "eci_application_name": "app-erda",
    "eci_runtime_id": "13",
    "eci_runtime_name": "rt-master",
    "eci_service_name": "svc-api",
    "eci_workspace": "dev",
    "eci_component": "eci",
    "eci_terminus_log_key": "log-key-0",
    "eci_monitor_log_key": "mon-key-0",
    "eci_dice_cluster_name": "terminus-dev",
    "eci_msp_env_id": "msp-env-0",
    "eci_msp_log_attach": "true",
    "eci_pod_ip": "10.0.0.9",
    "eci_monitor_log_collector": "http://collector-eci/collect",
}
# backward-compatible alias kept by earlier rounds' queries
ECI_CONST_TAGS["eci_cluster_name"] = ECI_CONST_TAGS["eci_dice_cluster_name"]


def cpuset_dim(sources: list[str]) -> pa.Table:
    """container name → cgroup path lookup (the /erda/containers/<id>/cpuset
    side files, conf/eci/scripts/enrich-meta.lua). sid%20==19 sources are
    missing — the Lua ``-1`` (file absent) path."""
    rows = []
    for sid, src in enumerate(sorted(sources)):
        if sid % 20 == 19:
            continue
        rows.append(
            {
                "pri_id": src,
                "cpuset": f"/kubepods/besteffort/pod{sid}/{sid * 2654435761:016x}",
            }
        )
    return pa.Table.from_pylist(
        rows, schema=pa.schema([("pri_id", pa.string()), ("cpuset", pa.string())])
    )


def eci_pipeline(sf_dir: str, *, concurrency: int | tuple[int, int] = 2) -> rd.Dataset:
    """records (+ tail path) → P6 → E2 → P7 → P2 → E3 → T2 flags (lazy)."""
    ds = LP.records_ds(sf_dir)

    def add_path(b: pa.Table) -> pa.Table:
        path = pc.binary_join_element_wise(
            "/stdlog/", b["source"], "/0.log", ""
        )
        return b.append_column("log_path", path)

    ds = ds.map_batches(add_path, batch_format="pyarrow", batch_size=None)
    ds = LP.parsed_ds(ds)  # P4 + P1 (CRI split, truncate)
    ds = ds.map_batches(
        lambda b: parse.log_id(b, key="log_path"),
        batch_format="pyarrow", batch_size=None,
    )

    src = __import__("pyarrow.parquet", fromlist=["parquet"]).read_table(
        f"{sf_dir}/documents.parquet", columns=["source"]
    )
    sources = pc.unique(src["source"].combine_chunks()).to_pylist()
    dim = cpuset_dim(sources)
    dim_ref = ray.put(dim) if ray.is_initialized() else dim
    ds = ds.map_batches(
        enrich.BroadcastEnricher,
        fn_constructor_kwargs={"dim": dim_ref, "key": "pri_id"},
        concurrency=concurrency,
        batch_format="pyarrow",
        batch_size=None,
    )

    def post(b: pa.Table) -> pa.Table:
        b = parse.cpuset_container_id(b, key="cpuset")
        b = parse.erda_info(b, key="log")
        b = enrich.constant_tags(b, ECI_CONST_TAGS)
        return b

    return ds.map_batches(post, batch_format="pyarrow", batch_size=None)
