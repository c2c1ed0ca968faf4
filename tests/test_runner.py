"""Checkpoint/resume semantics of the sharded runner (SURVEY §4.3)."""

import json
import os

import pytest

from raylog.pipelines import log_pipeline as LP
from raylog.pipelines.runner import run_resumable
from raylog.records import build_dim_table
from raylog.sources.synth import synth_sources, synthesize_sequences


@pytest.fixture(scope="module")
def synth_files(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("seq"))
    return synthesize_sequences(d, 12_000, seed=11, rows_per_file=3_000,
                                row_group_size=1_500)


@pytest.fixture(scope="module")
def dim():
    return build_dim_table(synth_sources())


def _counts_map(tbl):
    return {
        (r["sink"], r["source"], r["level"]): r["cnt"] for r in tbl.to_pylist()
    }


def test_crash_resume_no_double_count(synth_files, dim, tmp_path):
    out = str(tmp_path / "run")
    # simulate a crash: process only 2 of 4 shards, then "die"
    partial = run_resumable(synth_files, out, dim, n_shards=4,
                            concurrency=2, enrich_concurrency=1,
                            max_shards_this_run=2)
    manifest_path = os.path.join(out, "manifest.jsonl")
    lines = [json.loads(l) for l in open(manifest_path)]
    assert len(lines) == 2
    partial_total = sum(r["cnt"] for r in partial.to_pylist())

    # resume: only the remaining shards run; manifest grows to 4
    final = run_resumable(synth_files, out, dim, n_shards=4,
                          concurrency=2, enrich_concurrency=1)
    lines = [json.loads(l) for l in open(manifest_path)]
    assert len(lines) == 4
    assert sorted(e["shard_id"] for e in lines) == [0, 1, 2, 3]
    final_total = sum(r["cnt"] for r in final.to_pylist())
    assert final_total > partial_total

    # third run: everything done → pure no-op, identical result
    again = run_resumable(synth_files, out, dim, n_shards=4,
                          concurrency=2, enrich_concurrency=1)
    assert _counts_map(again) == _counts_map(final)
    assert len([json.loads(l) for l in open(manifest_path)]) == 4


def test_resume_matches_single_run(synth_files, dim, tmp_path):
    out1 = str(tmp_path / "a")
    out2 = str(tmp_path / "b")
    resumed = run_resumable(synth_files, out1, dim, n_shards=3, concurrency=2,
                            enrich_concurrency=1, max_shards_this_run=1)
    resumed = run_resumable(synth_files, out1, dim, n_shards=3, concurrency=2,
                            enrich_concurrency=1)
    oneshot = run_resumable(synth_files, out2, dim, n_shards=3, concurrency=2,
                            enrich_concurrency=1)
    assert _counts_map(resumed) == _counts_map(oneshot)
    # and equals the fused single-pass result
    from raylog.pipelines.fused import run_fused

    fused = run_fused(synth_files, dim, None, concurrency=2)
    assert _counts_map(oneshot) == _counts_map(fused)


def test_manifest_records_lineage_and_metrics(synth_files, dim, tmp_path):
    out = str(tmp_path / "m")
    run_resumable(synth_files, out, dim, n_shards=2, concurrency=2,
                  enrich_concurrency=1)
    entries = [json.loads(l) for l in open(os.path.join(out, "manifest.jsonl"))]
    for e in entries:
        assert e["input_files"], "lineage: input fragments recorded"
        assert e["routed_rows"] > 0
        assert e["wall_sec"] > 0 and e["rows_per_sec"] > 0
        assert set(e["sink_rows"]) <= {"container", "job", "export"}
    # per-shard sink dirs + aggregates exist
    for e in entries:
        sd = os.path.join(out, f"shard={e['shard_id']:05d}")
        assert os.path.exists(os.path.join(sd, "sink_counts.parquet"))


def test_follow_picks_up_new_files_and_resumes(synth_files, dim, tmp_path,
                                               ray_session):
    """Tail-analog follow mode: a first wave of files processes; files
    arriving later are picked up on the next tick without reprocessing
    the old ones; a restarted follower resumes from the manifest."""
    import shutil as _sh

    import pyarrow.parquet as _pq

    from raylog.pipelines.runner import run_follow

    watch = str(tmp_path / "watch")
    out = str(tmp_path / "fout")
    os.makedirs(watch)
    # wave 1: two files
    for f in synth_files[:2]:
        _sh.copy(f, watch)
    first = run_follow(watch, out, dim, poll_sec=0.01, max_ticks=1,
                       concurrency=2)
    man = os.path.join(out, "follow_manifest.jsonl")
    lines = [json.loads(l) for l in open(man)]
    assert len(lines) == 2
    first_total = sum(r["cnt"] for r in first.to_pylist())

    # wave 2: one more file appears; a fresh follower (restart) picks up
    # ONLY the new file
    _sh.copy(synth_files[2], watch)
    second = run_follow(watch, out, dim, poll_sec=0.01, max_ticks=1,
                        concurrency=2)
    lines = [json.loads(l) for l in open(man)]
    assert len(lines) == 3
    second_total = sum(r["cnt"] for r in second.to_pylist())
    assert second_total > first_total

    # equivalence: follow's cumulative counts == one-shot resumable run
    # over the same three files
    oneshot = run_resumable(sorted(
        os.path.join(watch, os.path.basename(f)) for f in synth_files[:3]),
        str(tmp_path / "oneshot"), dim, n_shards=3, concurrency=2)
    assert _counts_map(second) == _counts_map(oneshot)

    # idle stop: nothing new → no growth, identical counts
    third = run_follow(watch, out, dim, poll_sec=0.01, stop_after_idle=2,
                       concurrency=2)
    assert _counts_map(third) == _counts_map(second)
    assert len([json.loads(l) for l in open(man)]) == 3


def test_manifest_carries_stage_metrics(synth_files, dim, tmp_path,
                                        ray_session):
    """North-rule metrics: every committed shard records parsed
    per-operator throughput/latency entries, not an empty list."""
    out = str(tmp_path / "mrun")
    run_resumable(synth_files[:1], out, dim, n_shards=1, concurrency=2)
    lines = [json.loads(l) for l in open(os.path.join(out, "manifest.jsonl"))]
    assert lines and lines[0]["stages"], lines
    st = lines[0]["stages"][0]
    assert st["tasks"] >= 1 and st["wall_sec"] >= 0
    assert "operator" in st


def test_follow_batches_tiny_files(synth_files, dim, tmp_path, ray_session,
                                   monkeypatch):
    """Tiny-file amortization (VERDICT r3 #5): a wave of 100 tiny files
    executes <= max_runs_per_tick fused runs, the manifest still holds
    one line per FILE, a restarted follower picks up only new files,
    and the cumulative counts equal a one-shot run."""
    import pyarrow.parquet as _pq

    import raylog.pipelines.runner as runner_mod
    from raylog.pipelines.runner import run_follow

    # 100 tiny files sliced from one synth file
    src = _pq.read_table(synth_files[0])
    watch = str(tmp_path / "watch")
    os.makedirs(watch)
    n_files, per = 100, 30
    for i in range(n_files):
        _pq.write_table(src.slice(i * per, per),
                        os.path.join(watch, f"tiny-{i:03d}.parquet"))

    calls = []
    real = runner_mod.run_fused

    def counting(files, *a, **kw):
        calls.append(list(files))
        return real(files, *a, **kw)

    monkeypatch.setattr(runner_mod, "run_fused", counting)

    out = str(tmp_path / "fout")
    run_follow(watch, out, dim, poll_sec=0.01, max_ticks=1, concurrency=2,
               max_runs_per_tick=8)
    assert len(calls) <= 8
    assert sum(len(c) for c in calls) == n_files
    man = os.path.join(out, "follow_manifest.jsonl")
    lines = [json.loads(l) for l in open(man)]
    assert len(lines) == n_files  # resume granularity stays per file
    assert len({l["shard_id"] for l in lines}) == n_files

    # wave 2 on a fresh follower: only the 20 new files process
    for i in range(n_files, n_files + 20):
        _pq.write_table(src.slice((i - n_files) * per + 3000 - 600, per),
                        os.path.join(watch, f"tiny-{i:03d}.parquet"))
    calls.clear()
    total_tbl = run_follow(watch, out, dim, poll_sec=0.01, max_ticks=1,
                           concurrency=2, max_runs_per_tick=8)
    assert len(calls) <= 8
    assert sum(len(c) for c in calls) == 20
    lines = [json.loads(l) for l in open(man)]
    assert len(lines) == n_files + 20

    # equivalence vs one-shot over the same 120 files
    import glob as _glob
    oneshot = run_resumable(sorted(_glob.glob(os.path.join(watch, "*.parquet"))),
                            str(tmp_path / "oneshot"), dim, n_shards=4,
                            concurrency=2)
    assert _counts_map(total_tbl) == _counts_map(oneshot)


def test_follow_dim_refresh_mid_stream(synth_files, dim, tmp_path,
                                       ray_session):
    """TTL-cache analog (VERDICT r3 #6): with `dim` given as a callable
    and dim_refresh_sec=0 (reload every tick), a dim row changed between
    ticks shows up in the NEXT tick's routed records while earlier
    outputs keep the old tags; manifest lines record the dim epoch."""
    import glob as _glob
    import shutil as _sh

    import pyarrow as pa
    import pyarrow.parquet as _pq

    from raylog.pipelines.runner import run_follow

    watch = str(tmp_path / "watch")
    out = str(tmp_path / "fout")
    os.makedirs(watch)
    _sh.copy(synth_files[0], watch)  # wave 1, present from the start

    holder = {"cluster": "cluster-v1"}
    loads = []

    def dim_source():
        # load 1 = init, load 2 = tick-1 reload (both v1; wave 1 runs
        # under epoch 1). After load 2 the "k8s metadata" changes; the
        # tick-2 reload (load 3) returns v2 and wave 2 arrives in the
        # same tick, so its records must carry the new tag.
        loads.append(1)
        t = dim.to_pandas()
        t["cluster_name"] = holder["cluster"]
        tbl = pa.Table.from_pandas(t, preserve_index=False)
        if len(loads) == 2:
            holder["cluster"] = "cluster-v2"
        if len(loads) == 3:
            _sh.copy(synth_files[1], watch)
        return tbl

    run_follow(watch, out, dim_source, poll_sec=0.01, max_ticks=3,
               concurrency=2, dim_refresh_sec=0.0)

    man = os.path.join(out, "follow_manifest.jsonl")
    lines = [json.loads(l) for l in open(man)]
    assert len(lines) == 2
    by_key = {l["shard_id"]: l for l in lines}
    k1 = os.path.basename(synth_files[0])
    k2 = os.path.basename(synth_files[1])
    assert by_key[k1]["dim_epoch"] == 1
    assert by_key[k2]["dim_epoch"] == 2

    def tags_of(group):
        # sink files carry the typed tags map<string,string>
        vals = set()
        for p in _glob.glob(os.path.join(out, f"group={group}",
                                         "container", "*.parquet")):
            col = _pq.read_table(p, columns=["tags"])["tags"]
            for row in col.to_pylist():
                for k, v in (row or []):
                    if k == "cluster_name":
                        vals.add(v)
        return vals

    assert tags_of(by_key[k1]["group"]) == {"cluster-v1"}
    assert tags_of(by_key[k2]["group"]) == {"cluster-v2"}


def test_follow_sweeps_stale_group_dirs(synth_files, dim, tmp_path,
                                        ray_session):
    """A follower that died mid-group leaves an output dir with no
    manifest entry; a fresh follower must sweep it and reprocess the
    group's files exactly once (no double-count, no stale parts)."""
    import glob as _glob
    import shutil as _sh

    import pyarrow.parquet as _pq

    from raylog.pipelines.runner import run_follow

    watch = str(tmp_path / "watch")
    out = str(tmp_path / "fout")
    os.makedirs(watch)
    os.makedirs(out)
    for f in synth_files[:2]:
        _sh.copy(f, watch)

    # simulate the dead follower: a half-written group dir (stale sink
    # part + no manifest line)
    stale_dir = os.path.join(out, "group=deadbeef0000")
    os.makedirs(os.path.join(stale_dir, "container"))
    _pq.write_table(_pq.read_table(synth_files[0]).slice(0, 5),
                    os.path.join(stale_dir, "container",
                                 "part-stale.parquet"))

    total = run_follow(watch, out, dim, poll_sec=0.01, max_ticks=1,
                       concurrency=2)
    assert not os.path.exists(stale_dir)  # swept at start
    man = os.path.join(out, "follow_manifest.jsonl")
    lines = [json.loads(l) for l in open(man)]
    assert len(lines) == 2

    # every routed row is counted exactly once vs a one-shot run
    oneshot = run_resumable(sorted(
        os.path.join(watch, os.path.basename(f)) for f in synth_files[:2]),
        str(tmp_path / "oneshot"), dim, n_shards=2, concurrency=2)
    assert _counts_map(total) == _counts_map(oneshot)
