"""CLI surface tests (subprocess — own Ray instance, like a real user)."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, timeout=240):
    env = dict(os.environ, PYTHONPATH=REPO)
    out = subprocess.run(
        [sys.executable, "-m", "raylog", *args],
        capture_output=True, text=True, timeout=timeout, env=env, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


@pytest.mark.cli
def test_cli_synth_run_roundtrip(tmp_path):
    seq = str(tmp_path / "seq")
    r = _run(["synth", "--out", seq, "--rows", "8000", "--cpus", "2"])
    assert r["rows"] == 8000

    out = str(tmp_path / "out")
    r2 = _run(["run", "--input", f"{seq}/*.parquet", "--out", out,
               "--shards", "2", "--cpus", "4"])
    assert r2["routed_rows"] >= 8000  # container+job cover all; export adds
    assert os.path.exists(os.path.join(out, "manifest.jsonl"))

    # resume is a no-op second time (same totals)
    r3 = _run(["run", "--input", f"{seq}/*.parquet", "--out", out,
               "--shards", "2", "--cpus", "4"])
    assert r3["routed_rows"] == r2["routed_rows"]

    # fused produces the same totals
    r4 = _run(["run", "--input", f"{seq}/*.parquet", "--out",
               str(tmp_path / "out_fused"), "--fused", "--cpus", "2"])
    assert r4["routed_rows"] == r2["routed_rows"]


def test_cli_query_list_and_unknown():
    import subprocess
    import sys

    r = subprocess.run([sys.executable, "-m", "raylog", "query", "--list"],
                       capture_output=True, text=True, cwd="/root/repo",
                       timeout=120)
    assert r.returncode == 0
    names = r.stdout.split()
    assert "pretrain_prep" in names and len(names) >= 100
    r2 = subprocess.run([sys.executable, "-m", "raylog", "query", "nope"],
                        capture_output=True, text=True, cwd="/root/repo",
                        timeout=120)
    assert r2.returncode == 2


def test_cli_follow(tmp_path):
    """`raylog follow` drains a directory and stops on idle."""
    import glob as _glob
    import json
    import shutil
    import subprocess
    import sys

    from raylog.sources.synth import synthesize_sequences

    seq = str(tmp_path / "seq")
    files = synthesize_sequences(seq, 4000, seed=3, rows_per_file=2000)
    watch = str(tmp_path / "watch")
    os.makedirs(watch)
    for f in files:
        shutil.copy(f, watch)
    out = str(tmp_path / "fout")
    r = subprocess.run(
        [sys.executable, "-m", "raylog", "follow", "--input-dir", watch,
         "--out", out, "--poll-sec", "0.01", "--max-ticks", "1",
         "--cpus", "3"],
        capture_output=True, text=True, timeout=240,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    info = json.loads(r.stdout.strip().splitlines()[-1])
    assert info["routed_rows"] > 0
    assert 1 <= len(_glob.glob(os.path.join(out, "group=*"))) <= len(files)


def test_bench_scaling_smoke(tmp_path):
    """The driver runs `bench.py --scaling` every round; smoke the full
    path at tiny scale (1 trial, 2 vs 4 cpus) and check the contract:
    one JSON line with both throughputs and an efficiency field."""
    import json
    import subprocess
    import sys

    env = dict(os.environ,
               GRAFT_SF_DIR="/root/testdata/sf0.001",
               RAYLOG_SCALE_LO="2", RAYLOG_SCALE_HI="4",
               RAYLOG_SCALE_TRIALS="1")
    r = subprocess.run(
        [sys.executable, "bench.py", "--scaling"],
        capture_output=True, text=True, timeout=420, env=env,
        cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    info = json.loads(r.stdout.strip().splitlines()[-1])
    assert "scaling_efficiency" in info
    assert info["sec_2"] > 0 and info["sec_4"] > 0
    assert info["rows"] > 0
