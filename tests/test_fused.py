"""Fused single-pass execution must match the staged pipeline exactly."""

import glob
import os

import pyarrow.parquet as pq
import pytest

from raylog.pipelines import log_pipeline as LP
from raylog.pipelines.fused import run_fused
from raylog.records import build_dim_table
from raylog.sources.synth import synth_sources, synthesize_sequences


@pytest.fixture(scope="module")
def synth_files(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("seq"))
    return synthesize_sequences(d, 20_000, seed=7, rows_per_file=5_000,
                                row_group_size=2_500)


def _counts_key(df):
    return {
        (r.sink, r.source, None if r.level is None or r.level != r.level else r.level): r.cnt
        for r in df.itertuples()
    }


def test_fused_equals_staged(synth_files, tmp_path):
    dim = build_dim_table(synth_sources())
    from raylog.sources.reader import read_sequences

    staged = LP.sink_counts(
        LP.pipeline_from_records(read_sequences(synth_files), dim, concurrency=2)
    ).to_pandas()
    fused_agg = run_fused(synth_files, dim, str(tmp_path / "out"), concurrency=2)
    fused = fused_agg.to_pandas()
    assert _counts_key(staged) == _counts_key(fused)
    assert staged.cnt.sum() == 20_000 + fused[fused.sink == "export"].cnt.sum()


def test_fused_sink_files_roundtrip(synth_files, tmp_path):
    """Sink parquet rows: token payload bit-identical to the input."""
    dim = build_dim_table(synth_sources())
    out = str(tmp_path / "out")
    run_fused(synth_files, dim, out, concurrency=2)
    inp = pq.read_table(synth_files[0])
    in_tokens = {d: t for d, t in zip(inp["doc_id"].to_pylist(), inp["tokens"].to_pylist())}
    checked = 0
    for path in sorted(glob.glob(os.path.join(out, "container", "*.parquet"))):
        got = pq.read_table(path)
        for doc_id, tokens in zip(got["doc_id"].to_pylist(), got["tokens"].to_pylist()):
            if doc_id in in_tokens:
                assert tokens == in_tokens[doc_id]
                checked += 1
    assert checked > 0


def test_fused_no_sink_dir(synth_files):
    dim = build_dim_table(synth_sources())
    agg = run_fused(synth_files, dim, None, concurrency=2)
    assert agg.num_rows > 0
