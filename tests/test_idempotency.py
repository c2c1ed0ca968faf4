"""Round-2 advice fixes: empty-string routing, idempotent sink writes,
resume lineage validation."""

import glob
import os

import pyarrow as pa
import pytest

from raylog.stages import route


def _batch(define_tag, collector):
    n = len(define_tag)
    return pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "source": pa.array(["s"] * n),
            "terminus_define_tag": pa.array(define_tag, pa.string()),
            "monitor_log_collector": pa.array(collector, pa.string()),
        }
    )


def test_empty_string_routes_like_absent():
    # reference rewrite_tag matches `.+` (non-empty): '' must not route to
    # job/export (conf/ds/fluent-bit.conf:183,190)
    b = _batch([None, "", "job-x"], ["", None, "http://c"])
    b = route.add_route_flags(b)
    assert b["in_job"].to_pylist() == [False, False, True]
    assert b["in_export"].to_pylist() == [False, False, True]
    assert b["in_container"].to_pylist() == [True, True, False]
    assert route.sink_mask(b, "job").to_pylist() == [False, False, True]
    assert route.sink_mask(b, "export").to_pylist() == [False, False, True]
    assert route.sink_mask(b, "container").to_pylist() == [True, True, False]


def test_sink_writer_retry_overwrites(tmp_path):
    """A re-processed batch replaces its file: no duplicate sink rows."""
    from raylog.sinks.writer import SinkWriter

    b = _batch([None, "job-x", None], [None, None, "http://c"])
    b = b.append_column("stream", pa.array(["stdout"] * 3))
    b = b.append_column("level", pa.array(["INFO"] * 3))
    b = b.append_column("request_id", pa.array([None] * 3, pa.string()))
    b = b.append_column("ts_ns", pa.array([1, 2, 3], pa.int64()))
    b = b.append_column("log", pa.array(["a", "b", "c"]))
    b = b.append_column("container_id", pa.array(["c1", "c2", "c3"]))

    w1 = SinkWriter(str(tmp_path))
    w1(b)
    first = sorted(glob.glob(str(tmp_path / "*" / "*.parquet")))
    # simulate a retried task on a fresh actor processing the same block
    w2 = SinkWriter(str(tmp_path))
    w2(b)
    second = sorted(glob.glob(str(tmp_path / "*" / "*.parquet")))
    assert first == second  # same deterministic names, replaced not duplicated
    assert not glob.glob(str(tmp_path / "*" / "*.tmp"))


def test_fused_retry_overwrites(tmp_path, ray_session):
    from raylog.pipelines.fused import run_fused
    from raylog.records import build_dim_table
    from raylog.sources.synth import synth_sources, synthesize_sequences

    files = synthesize_sequences(str(tmp_path / "seq"), 4_000, seed=3,
                                 rows_per_file=2_000, row_group_size=1_000)
    dim = build_dim_table(synth_sources())
    out = str(tmp_path / "out")
    a1 = run_fused(files, dim, out, concurrency=2)
    names1 = sorted(os.path.basename(p)
                    for p in glob.glob(os.path.join(out, "**", "*.parquet"),
                                       recursive=True))
    a2 = run_fused(files, dim, out, concurrency=2)  # full "retry" of every item
    names2 = sorted(os.path.basename(p)
                    for p in glob.glob(os.path.join(out, "**", "*.parquet"),
                                       recursive=True))
    assert names1 == names2
    assert a1.sort_by("source").equals(a2.sort_by("source")) or \
        a1.num_rows == a2.num_rows


def test_resume_lineage_mismatch_raises(tmp_path, ray_session):
    from raylog.pipelines.runner import run_resumable
    from raylog.records import build_dim_table
    from raylog.sources.synth import synth_sources, synthesize_sequences

    files = synthesize_sequences(str(tmp_path / "seq"), 4_000, seed=4,
                                 rows_per_file=1_000, row_group_size=500)
    dim = build_dim_table(synth_sources())
    out = str(tmp_path / "run")
    run_resumable(files, out, dim, n_shards=2, concurrency=2)
    # resuming with a different shard count re-maps files → must fail loudly
    with pytest.raises(ValueError, match="lineage mismatch"):
        run_resumable(files, out, dim, n_shards=4, concurrency=2)
    # resuming with the original assignment is a clean no-op
    run_resumable(files, out, dim, n_shards=2, concurrency=2)


def test_fused_survives_actor_crash(tmp_path, ray_session):
    """Fault injection: a worker process dies (os._exit) mid-row-group;
    Ray restarts the pool actor and retries the task; deterministic
    tmp+rename sink writes make the retry REPLACE any partial output —
    final counts equal the clean run, no duplicate or leftover files."""
    import glob
    import os

    import ray
    import ray.data as rd

    from raylog.pipelines import log_pipeline as LP
    from raylog.pipelines.fused import FusedSinkTask, run_fused
    from raylog.records import build_dim_table
    from raylog.sources.reader import _list_row_groups
    from raylog.sources.synth import synth_sources, synthesize_sequences

    files = synthesize_sequences(str(tmp_path / "seq"), 8_000, seed=5,
                                 rows_per_file=2_000, row_group_size=1_000)
    dim = build_dim_table(synth_sources())
    marker = str(tmp_path / "crashed_once")
    target = sorted(files)[0]

    class Crashing(FusedSinkTask):
        def __call__(self, batch):
            if (not os.path.exists(marker)
                    and batch["row_group"].to_pylist()[0] == 1
                    and batch["path"].to_pylist()[0] == target):
                open(marker, "w").close()
                os._exit(1)  # hard-kill the worker process mid-item
            yield from super().__call__(batch)

    out_dir = str(tmp_path / "out")
    dim_ref = ray.put(dim)
    partials = rd.from_items(_list_row_groups(files)).map_batches(
        Crashing, fn_constructor_kwargs={"dim": dim_ref, "out_dir": out_dir},
        concurrency=2, batch_size=1, batch_format="pyarrow",
    )
    agg = LP.aggregate_counts_table(partials)
    assert os.path.exists(marker), "the injected crash must have fired"

    ref = run_fused(files, dim, None, concurrency=2)
    got = {(r["sink"], r["source"], r["level"]): r["cnt"] for r in agg.to_pylist()}
    want = {(r["sink"], r["source"], r["level"]): r["cnt"] for r in ref.to_pylist()}
    assert got == want
    # every work item wrote exactly its deterministic files; no attempt
    # duplicates, no orphaned temp files
    assert not glob.glob(os.path.join(out_dir, "**", "*.tmp"), recursive=True)
    # per sink dir, one file per work item — the retried item did not
    # add a second file anywhere
    rels = [os.path.relpath(p, out_dir) for p in
            glob.glob(os.path.join(out_dir, "**", "*.parquet"), recursive=True)]
    assert len(rels) == len(set(rels))
    per_sink = {}
    for r in rels:
        per_sink.setdefault(os.path.dirname(r), []).append(os.path.basename(r))
    for sink, names in per_sink.items():
        assert len(names) == len(set(names)), sink
