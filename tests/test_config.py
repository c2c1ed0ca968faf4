"""Config-driven pipeline assembly + export sink partitioning."""

import glob
import os

import pyarrow as pa
import ray

from raylog.config import STEP_REGISTRY, build_pipeline, register_step
from raylog.pipelines import log_pipeline as LP


def test_config_chain_equals_builtin_pipeline(sf_dir):
    dim = LP.dim_for(sf_dir)
    dim_ref = ray.put(dim)
    steps = [
        {"step": "cri_parse"},
        {"step": "truncate", "cap": 51200},
        {"step": "enrich", "dim": dim_ref, "key": "source", "concurrency": 1},
        {"step": "erda_info"},
        {"step": "pack_tags"},
        {"step": "route_flags"},
    ]
    via_config = build_pipeline(LP.records_ds(sf_dir), steps)
    cfg_counts = LP.sink_counts(via_config).to_pandas()
    builtin_counts = LP.sink_counts(LP.full_pipeline(sf_dir, concurrency=1)).to_pandas()
    key = lambda df: {
        (r.sink, r.source, r.level if r.level == r.level else None): r.cnt
        for r in df.itertuples()
    }
    assert key(cfg_counts) == key(builtin_counts)


def test_custom_step_registration(sf_dir):
    @register_step("upper_source")
    def upper_source(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        i = batch.column_names.index("source")
        return batch.set_column(i, "source", pc.utf8_upper(batch["source"].combine_chunks()))

    assert "upper_source" in STEP_REGISTRY
    out = build_pipeline(LP.records_ds(sf_dir), [{"step": "upper_source"}])
    srcs = out.take(3)
    assert all(r["source"].isupper() for r in srcs)


def test_fused_export_partitioned_by_collector(sf_dir, tmp_path):
    from raylog.pipelines.fused import run_fused
    from raylog.sources.synth import synth_sources, synthesize_sequences

    d = str(tmp_path / "seq")
    files = synthesize_sequences(d, 8_000, seed=3, rows_per_file=4_000,
                                 row_group_size=2_000)
    from raylog.records import build_dim_table

    dim = build_dim_table(synth_sources())
    out = str(tmp_path / "out")
    run_fused(files, dim, out, concurrency=2)
    coll_dirs = glob.glob(os.path.join(out, "export", "collector=*"))
    assert len(coll_dirs) >= 1  # one sub-sink per distinct collector URL
    # loose files must not exist directly under export/
    assert not glob.glob(os.path.join(out, "export", "*.parquet"))


def test_curation_chain_stanzas(ray_session):
    """Config-driven training-data curation: quality → langid via
    registry stanzas, pure declarative assembly."""
    import pyarrow as pa
    import ray.data as rd

    from raylog.config import build_pipeline

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["the quick brown fox jumps over the lazy dog",
                          "der die das und der die das und"]),
    }))
    out = build_pipeline(ds, [
        {"step": "quality_scores"},
        {"step": "lang_id"},
        {"step": "char_entropy"},
    ]).to_pandas().sort_values("doc_id")
    assert out["lang_pred"].tolist() == ["en", "de"]
    assert (out["score_milli"] > 0).all()
    assert (out["entropy_milli"] > 0).all()
