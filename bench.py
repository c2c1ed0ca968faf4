#!/usr/bin/env python
"""Benchmark harness for the raylog engine.

Runs the headline pipelines over `$GRAFT_SF_DIR` (default
/root/testdata/sf0.1) and prints ONE JSON line:
``{"metric": ..., "value": <headline sec>, "unit": "sec",
"queries": {...}, "sf": ..., "num_cpus": N, "rows": R, "rows_per_sec": ...}``

The log-pipeline input is the synthesized pre-tokenized sequences table
(BASELINE.json input_hint shape) scaled off the sf's documents row count,
cached under /tmp. ``--scaling`` runs the same job in fresh processes at
N and 4N CPUs (default num_cpus=4 vs 16; override RAYLOG_SCALE_LO/HI)
and reports both throughputs + scaling efficiency (the sandbox stand-in
for N vs 4N nodes). ``--scaling-pairs`` reports both the 4→16 and the
8→32 pair (the latter saturates the 32-logical-CPU box — see the
inline caveat).
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NCPU = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
SEED = 42
HEADLINE_ONLY = os.environ.get("RAYLOG_BENCH_ONLY") in ("headline", "agg")
# "agg" = headline WITHOUT the sink write: the parse→route→aggregate
# consumer named by the north metric. The sink-writing headline is
# disk-bound when the sandbox throttles the virtio device (see
# disk_write_mb_s), at which point its scaling ratio measures the
# hypervisor's I/O ceiling, not the engine — the agg mode is the
# engine-scaling measurement; --scaling-sinks keeps the stricter unit.
AGG_ONLY = os.environ.get("RAYLOG_BENCH_ONLY") == "agg"


def fused_pool_size(ncpu: int) -> int:
    """Actor count for the fused stage: always leave >=1 CPU for the task
    stages (a pool reserving every CPU stalls them ~20 s until teardown);
    above ~16 actors this box is memory-bandwidth bound, so cap there."""
    if ncpu <= 8:
        return max(1, ncpu - 1)
    if ncpu <= 18:
        return ncpu - 2
    return 16


def bench_rows(sf_dir: str) -> int:
    import pyarrow.parquet as pq

    docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    return int(max(400_000, min(docs * 1600, 8_000_000)))



def _fresh_ray_session():
    """Restart the Ray session between heavy bench units.

    A long-lived session accumulates object-store spill and worker-heap
    residue from earlier units; measured on this box, the tail units run
    3-7x slower inside an aged session than in a fresh process for
    identical code (cc_dedup 59.5 s in-process vs 7.9-8.4 s fresh).
    The restart happens OUTSIDE every timed section, so each unit is
    measured against the same near-fresh substrate the --unit /--ab
    fresh-process quanta use."""
    import gc

    import ray
    import ray.data as rd

    ray.shutdown()
    gc.collect()
    ray.init(address="local", num_cpus=NCPU, include_dashboard=False,
             logging_level="ERROR")
    rd.DataContext.get_current().enable_progress_bars = False


def disk_write_mb_s(path: str = "/tmp/raylog_bench", mib: int = 128) -> float:
    """Environment control: sequential fdatasync write throughput of the
    bench output volume. The write-heavy units (sink fan-out, packed
    windows) are disk-bound when the hypervisor throttles the virtio
    device — measured on this box: the same commit's headline swings
    10.7 s ↔ 20+ s purely with host disk state (2026-08-19: 53 MB/s vs
    the >230 MB/s implied by earlier sessions). Reporting the control
    alongside every bench lets a reader separate engine changes from
    sandbox weather."""
    os.makedirs(path, exist_ok=True)
    f = os.path.join(path, f".disk_probe_{os.getpid()}")
    buf = b"\0" * (8 << 20)
    t0 = time.monotonic()
    fd = os.open(f, os.O_WRONLY | os.O_CREAT | os.O_TRUNC, 0o644)
    try:
        for _ in range(mib // 8):
            os.write(fd, buf)
        os.fdatasync(fd)
    finally:
        os.close(fd)
        os.unlink(f)
    return round(mib / (time.monotonic() - t0), 1)


def mem_copy_gb_s() -> float:
    """Environment control #2: single-stream memcpy bandwidth.

    2026-08-19 ~11:00 this sandbox's host began memory-bandwidth
    collapse: single-stream copy measured 0.2 GB/s (normal servers:
    10-20 GB/s; this box earlier the same day sustained the 749k
    rows/s headline, impossible below ~5 GB/s). Everything
    bandwidth-bound — shuffles, sink encode, even dd — degrades
    5-100x while cache-resident compute looks normal, so a bench
    regression without a code change reads exactly like this.
    Reported next to every bench so the two are distinguishable."""
    import numpy as np

    a = np.zeros(25_000_000, dtype=np.float64)  # 200 MB
    a[:] = 1.0  # fault pages in before timing
    t0 = time.monotonic()
    for _ in range(3):
        b = a.copy()
    del b
    return round(3 * 0.4 / (time.monotonic() - t0), 2)


_OUT_ROOT = None


def bench_out_root() -> tuple[str, float]:
    """Resolve the SINK device for bench output dirs, once per process.

    Returns (root, probed /tmp write MB/s). Default is the real disk
    (/tmp). When the sandbox's virtio device is throttled below
    150 MB/s (observed on this box 2026-08-19: 27-60 MB/s for hours,
    vs >230 MB/s in every earlier session — single-stream dd swings
    within minutes), sink writes stop measuring the engine and start
    measuring the hypervisor, so the bench substitutes tmpfs
    (/dev/shm) and RECORDS the substitution in its JSON
    (``sink_device``) — no silent incomparability in either
    direction. Override with RAYLOG_BENCH_OUT=<dir>.
    """
    global _OUT_ROOT
    if _OUT_ROOT is None:
        probed = disk_write_mb_s()
        forced = os.environ.get("RAYLOG_BENCH_OUT")
        if forced:
            root = forced
        elif probed < 150.0 and os.path.isdir("/dev/shm"):
            root = "/dev/shm/raylog_bench"
        else:
            root = "/tmp/raylog_bench"
        os.makedirs(root, exist_ok=True)
        _OUT_ROOT = (root, probed)
    return _OUT_ROOT


def run_bench() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NCPU,
        include_dashboard=False,
        logging_level="ERROR",
    )
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False

    from raylog.pipelines import log_pipeline as LP
    from raylog.records import build_dim_table
    from raylog.sinks.writer import run_to_sinks
    from raylog.sources.reader import read_sequences
    from raylog.sources.synth import synth_sources, synthesize_sequences

    rows = bench_rows(SF_DIR)
    cache = f"/tmp/raylog_bench/seq_r{rows}_s{SEED}"
    cold_synth = not os.path.exists(os.path.join(cache, "_SYNTH_DONE"))
    files = synthesize_sequences(cache, rows, seed=SEED)
    dim = build_dim_table(synth_sources())

    # warm the OS page cache so we measure compute + shuffle, not first read
    read_sequences(files).count()

    # fixed-size pools (autoscaling (min,max) pools ramp too slowly and
    # average ~2-4 actors); their sum must stay below NCPU so task stages
    # (read, combine) can schedule alongside. Ray fuses
    # [read->parse->enrich] into the first pool and [post->writer] into
    # the second, so an even split measures best (14/14 at 32 CPUs:
    # 15.7 s vs 23.5 s for the round-1 10/12 split).
    enrich_c = max(1, min(14, (NCPU * 4) // 9))
    write_c = max(1, min(14, (NCPU * 4) // 9))
    if enrich_c + write_c >= NCPU:  # leave headroom for task stages
        enrich_c = max(1, NCPU // 2 - 1)
        write_c = max(1, NCPU - 2 - enrich_c)
    queries: dict[str, float] = {}

    # q1 (headline, first so later runs' writeback doesn't throttle it):
    # fused single-pass execution — read → parse → enrich → route → sink
    # write inside one actor task; zero payload through the object store
    # (same semantics as the staged pipeline, asserted equal in tests)
    from raylog.pipelines.fused import run_fused

    # unique out dir per run; PREVIOUS runs' outputs are deleted AFTER the
    # timed section (a 2.4 GB rmtree right before timing stalls the run on
    # journal/discard work)
    _oroot, _probed = bench_out_root()
    stale = sorted(glob.glob(f"{_oroot}/out_fused_{NCPU}_*"))
    out_dir = f"{_oroot}/out_fused_{NCPU}_{os.getpid()}"
    # flush dirty pages (synthesis / previous runs) so the timed section
    # measures this pipeline, not leftover kernel writeback; drop + re-warm
    # the page cache only when the input was NOT just synthesized (a fresh
    # synth is hot and clean after sync — dropping it forces a pointless
    # multi-GB re-read whose churn bleeds into the timed run)
    os.sync()
    if not cold_synth:
        try:
            with open("/proc/sys/vm/drop_caches", "w") as f:
                f.write("3")
        except OSError:
            pass
        read_sequences(files).count()
    # untimed mini fused run: spins up worker processes + imports so the
    # timed run measures the pipeline, not interpreter cold-start
    run_fused(files[:1], dim, None, concurrency=fused_pool_size(NCPU))
    # best of 2 trials: page-cache/writeback state on this box swings a
    # single run by ~35% (measured 12.7-17.2 s for identical code);
    # dirty output of trial 1 is flushed before trial 2's timer starts.
    # (headline-only mode = one trial: --scaling already takes
    # best-of-N across fresh processes)
    headline = None
    for trial in range(1 if HEADLINE_ONLY else 2):
        tdir = None if AGG_ONLY else f"{out_dir}_t{trial}"
        os.sync()
        t0 = time.monotonic()
        agg = run_fused(files, dim, tdir, concurrency=fused_pool_size(NCPU))
        sec = round(time.monotonic() - t0, 3)
        queries[f"full_pipeline_sinks_t{trial}"] = sec
        if headline is None or sec < headline:
            headline = sec
        if trial == 0 and tdir:
            stale.append(tdir)  # cleaned after the next timed section
    queries["full_pipeline_sinks"] = headline
    routed_rows = sum(r["cnt"] for r in agg.to_pylist())
    for d in stale:
        shutil.rmtree(d, ignore_errors=True)

    # q2: staged variant, no sink write: parse → enrich → route → aggregate
    if HEADLINE_ONLY:
        ray.shutdown()
        return {
            "metric": "end-to-end parse→route→aggregate wall time (sequences table)",
            "value": headline,
            "unit": "sec",
            "queries": queries,
            "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
            "num_cpus": NCPU,
            "rows": rows,
            "routed_rows": int(routed_rows),
            "rows_per_sec": round(rows / headline, 1),
            "disk_write_mb_s": _probed,
            "mem_copy_gb_s": mem_copy_gb_s(),
            "sink_device": _oroot,
        }
    os.sync()  # don't charge q2 for the headline's sink writeback
    t0 = time.monotonic()
    routed = LP.pipeline_from_records(
        read_sequences(files), dim, concurrency=enrich_c
    )
    LP.sink_counts(routed).to_pandas()
    queries["parse_route_agg"] = round(time.monotonic() - t0, 3)

    # q3: staged full pipeline incl. single-pass parquet sink fan-out
    # (best of 2 — runs last, so it inherits the headline's writeback)
    stale = sorted(glob.glob(f"{_oroot}/out_{NCPU}_*"))
    out_dir = f"{_oroot}/out_{NCPU}_{os.getpid()}"
    best = None
    for trial in range(2):
        os.sync()
        t0 = time.monotonic()
        routed = LP.pipeline_from_records(
            read_sequences(files), dim, concurrency=enrich_c
        )
        run_to_sinks(routed, f"{out_dir}_t{trial}", concurrency=write_c)
        sec = round(time.monotonic() - t0, 3)
        if best is None or sec < best:
            best = sec
        if trial == 0:
            stale.append(f"{out_dir}_t0")
    queries["full_pipeline_sinks_staged"] = best
    for d in stale:
        shutil.rmtree(d, ignore_errors=True)

    # q4-q6: training-data ops over the sf's documents/embeddings tables
    # (informational: the distributed dedup/text/ANN paths, measured)
    import ray.data as _rd

    docs = lambda: _rd.read_parquet(  # noqa: E731
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    _fresh_ray_session()
    os.sync()  # never charge a unit for its predecessor's writeback
    t0 = time.monotonic()
    from raylog.functions.dedup import minhash_lsh_pairs

    n_pairs = len(minhash_lsh_pairs(docs(), threshold=0.3).to_pandas())
    queries["dedup_minhash_docs"] = round(time.monotonic() - t0, 3)

    os.sync()
    t0 = time.monotonic()
    from raylog.functions.text import fingerprints, lang_id, quality_scores

    docs().map_batches(quality_scores, batch_format="pyarrow", batch_size=None) \
        .map_batches(lang_id, batch_format="pyarrow", batch_size=None) \
        .map_batches(fingerprints, batch_format="pyarrow", batch_size=None) \
        .count()
    queries["text_analysis_docs"] = round(time.monotonic() - t0, 3)

    os.sync()
    t0 = time.monotonic()
    from raylog.functions.similarity import ann_ivf_topk

    emb = _rd.read_parquet(f"{SF_DIR}/embeddings.parquet",
                           columns=["vec_id", "embedding"])
    ann_ivf_topk(emb, query_ids=[0, 1, 2, 3, 4], k=10,
                 index_dir=f"/tmp/raylog_bench/ivf_{NCPU}")
    queries["ann_ivf_embeddings"] = round(time.monotonic() - t0, 3)

    # q7: token-payload analytics — vocab heavy hitters over the FULL
    # 4-8M-row tokens column; bigrams over a 1/16 subset (uniform 50k
    # vocab makes pairs near-unique — the exact-count worst case, see
    # functions/tokens.py — so full-volume bigrams are a shuffle stress
    # test, not a bench unit)
    _fresh_ray_session()
    os.sync()
    t0 = time.monotonic()
    from raylog.functions.tokens import bigram_top_terms, token_top_terms

    token_top_terms(
        read_sequences(files, columns=["tokens"], row_groups_per_task=8),
        k=50)
    queries["tokens_unigrams_seq"] = round(time.monotonic() - t0, 3)
    _fresh_ray_session()
    os.sync()
    t0 = time.monotonic()
    bigram_top_terms(
        read_sequences(files[: max(1, len(files) // 16)], columns=["tokens"]),
        k=50)
    queries["tokens_bigrams_16th"] = round(time.monotonic() - t0, 3)

    # q7b: the sketch scale path for the same bigram heavy hitters, at
    # FULL volume (count-min + exact candidate verification, two
    # streaming passes, no shuffle)
    _fresh_ray_session()
    os.sync()
    t0 = time.monotonic()
    from raylog.functions.sketch import cms_heavy_hitters
    from raylog.functions.tokens import bigram_keys_batch

    cms_heavy_hitters(
        read_sequences(files, columns=["tokens"],
                       row_groups_per_task=4).map_batches(
            bigram_keys_batch, batch_format="pyarrow", batch_size=None),
        "key", k=20)
    queries["tokens_bigrams_cms_full"] = round(time.monotonic() - t0, 3)

    # q8: dedup cluster resolution — n-gram pairs → connected components
    # → survivor corpus over the sf's documents table
    _fresh_ray_session()
    os.sync()
    t0 = time.monotonic()
    from raylog.functions.cc import connected_components, dedup_survivors
    from raylog.functions.dedup import ngram_jaccard_pairs

    d = docs()
    pairs = ngram_jaccard_pairs(d, threshold=0.3)
    clusters = connected_components(d.select_columns(["doc_id"]), pairs)
    dedup_survivors(d.select_columns(["doc_id"]), clusters).count()
    queries["cc_dedup_docs"] = round(time.monotonic() - t0, 3)

    # q9: materialized context windows over HALF the token stream —
    # the heaviest token-axis op (one shard exchange of every token;
    # half keeps the whole bench inside the per-round budget, same
    # convention as the bigrams 1/16 unit)
    _fresh_ray_session()
    os.sync()
    t0 = time.monotonic()
    from raylog.functions.packing import pack_windows

    pack_windows(
        read_sequences(files[: max(1, len(files) // 2)],
                       columns=["doc_id", "tokens"],
                       row_groups_per_task=4),
        max_tokens=2048, num_shards=64, num_partitions=32,
    ).count()
    queries["tokens_pack_windows_half"] = round(time.monotonic() - t0, 3)

    # q10: exact substring-dedup coverage over documents (gram-hash
    # exchange of every 8-word window)
    _fresh_ray_session()
    os.sync()
    t0 = time.monotonic()
    from raylog.functions.dedup import substring_duplicate_coverage

    substring_duplicate_coverage(docs(), n=8, min_docs=2).count()
    queries["substring_coverage_docs"] = round(time.monotonic() - t0, 3)

    # q11: token-budget mixture over the full sequences table (tiny
    # histogram aggregate + broadcast-verdict filter — two scans of
    # three narrow columns, no sort)
    _fresh_ray_session()
    os.sync()
    t0 = time.monotonic()
    from raylog.functions.mixture import mixture_by_token_budget

    seq = read_sequences(files, columns=["doc_id", "source", "n_tok"],
                         row_groups_per_task=4)
    import pyarrow.compute as _pc
    import pyarrow.parquet as _pq

    srcs = _pc.unique(
        _pq.read_table(files[0], columns=["source"])["source"]).to_pylist()
    targets = {s: 500_000 for s in srcs}
    mixture_by_token_budget(seq, targets=targets).count()
    queries["mixture_budget_seq"] = round(time.monotonic() - t0, 3)

    ray.shutdown()
    return {
        "metric": "end-to-end parse→route→aggregate wall time (sequences table)",
        "value": headline,
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
        "num_cpus": NCPU,
        "rows": rows,
        "routed_rows": int(routed_rows),
        "rows_per_sec": round(rows / headline, 1),
        "disk_write_mb_s": _probed,
        "mem_copy_gb_s": mem_copy_gb_s(),
        "sink_device": _oroot,
    }


# --------------------------------------------------------------------------
# Single-unit runners (fresh-process measurement quantum for --ab)
# --------------------------------------------------------------------------
# Each runs ONE bench unit end to end and prints {"unit", "sec"}. The
# functions resolve raylog from sys.path, so `--repo <path>` measures the
# same unit against a pinned checkout — the A/B mode interleaves the two.

def _unit_ctx():
    import ray

    ray.init(address="local", num_cpus=NCPU, include_dashboard=False,
             logging_level="ERROR")
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False
    from raylog.sources.reader import read_sequences
    from raylog.sources.synth import synthesize_sequences

    rows = bench_rows(SF_DIR)
    files = synthesize_sequences(f"/tmp/raylog_bench/seq_r{rows}_s{SEED}",
                                 rows, seed=SEED)
    read_sequences(files).count()  # warm page cache
    return files


def _docs():
    import ray.data as rd

    return rd.read_parquet(f"{SF_DIR}/documents.parquet",
                           columns=["doc_id", "text"])


def _u_cc_dedup():
    from raylog.functions.cc import connected_components, dedup_survivors
    from raylog.functions.dedup import ngram_jaccard_pairs

    d = _docs()
    pairs = ngram_jaccard_pairs(d, threshold=0.3)
    clusters = connected_components(d.select_columns(["doc_id"]), pairs)
    dedup_survivors(d.select_columns(["doc_id"]), clusters).count()


def _u_minhash():
    from raylog.functions.dedup import minhash_lsh_pairs

    minhash_lsh_pairs(_docs(), threshold=0.3).to_pandas()


def _u_text():
    from raylog.functions.text import fingerprints, lang_id, quality_scores

    _docs().map_batches(quality_scores, batch_format="pyarrow",
                        batch_size=None) \
        .map_batches(lang_id, batch_format="pyarrow", batch_size=None) \
        .map_batches(fingerprints, batch_format="pyarrow",
                     batch_size=None).count()


def _u_substring():
    from raylog.functions.dedup import substring_duplicate_coverage

    substring_duplicate_coverage(_docs(), n=8, min_docs=2).count()


def _seq_units(files):
    from raylog.sources.reader import read_sequences

    def cms():
        from raylog.functions.sketch import cms_heavy_hitters
        from raylog.functions.tokens import bigram_keys_batch

        cms_heavy_hitters(
            read_sequences(files, columns=["tokens"],
                           row_groups_per_task=4).map_batches(
                bigram_keys_batch, batch_format="pyarrow", batch_size=None),
            "key", k=20)

    def bigrams():
        from raylog.functions.tokens import bigram_top_terms

        bigram_top_terms(
            read_sequences(files[: max(1, len(files) // 16)],
                           columns=["tokens"]), k=50)

    def unigrams():
        from raylog.functions.tokens import token_top_terms

        token_top_terms(read_sequences(files, columns=["tokens"],
                                       row_groups_per_task=8), k=50)

    def windows():
        from raylog.functions.packing import pack_windows

        pack_windows(
            read_sequences(files[: max(1, len(files) // 2)],
                           columns=["doc_id", "tokens"],
                           row_groups_per_task=4),
            max_tokens=2048, num_shards=64, num_partitions=32).count()

    def headline():
        from raylog.pipelines.fused import run_fused
        from raylog.records import build_dim_table
        from raylog.sources.synth import synth_sources

        dim = build_dim_table(synth_sources())
        out = f"{bench_out_root()[0]}/out_ab_{os.getpid()}"
        run_fused(files, dim, out, concurrency=fused_pool_size(NCPU))
        shutil.rmtree(out, ignore_errors=True)

    def staged():
        from raylog.pipelines import log_pipeline as LP
        from raylog.records import build_dim_table
        from raylog.sinks.writer import run_to_sinks
        from raylog.sources.synth import synth_sources

        # mirrors the full bench's q3 pool split (even enrich/write)
        enrich_c = max(1, min(14, (NCPU * 4) // 9))
        write_c = max(1, min(14, (NCPU * 4) // 9))
        if enrich_c + write_c >= NCPU:
            enrich_c = max(1, NCPU // 2 - 1)
            write_c = max(1, NCPU - 2 - enrich_c)
        dim = build_dim_table(synth_sources())
        out = f"{bench_out_root()[0]}/out_staged_ab_{os.getpid()}"
        routed = LP.pipeline_from_records(
            read_sequences(files), dim, concurrency=enrich_c)
        run_to_sinks(routed, out, concurrency=write_c)
        shutil.rmtree(out, ignore_errors=True)

    return {"tokens_bigrams_cms_full": cms, "tokens_bigrams_16th": bigrams,
            "tokens_unigrams_seq": unigrams,
            "tokens_pack_windows_half": windows,
            "full_pipeline_sinks": headline,
            "full_pipeline_sinks_staged": staged}


DOC_UNITS = {
    "cc_dedup_docs": _u_cc_dedup,
    "dedup_minhash_docs": _u_minhash,
    "text_analysis_docs": _u_text,
    "substring_coverage_docs": _u_substring,
}
AB_DEFAULT_UNITS = ("full_pipeline_sinks", "cc_dedup_docs",
                    "tokens_bigrams_cms_full")


def run_unit(name: str) -> dict:
    import ray

    files = _unit_ctx()
    units = dict(DOC_UNITS)
    units.update(_seq_units(files))
    if name not in units:
        raise SystemExit(f"unknown unit {name!r}; known: {sorted(units)}")
    os.sync()
    t0 = time.monotonic()
    units[name]()
    sec = round(time.monotonic() - t0, 3)
    ray.shutdown()
    return {"unit": name, "sec": sec, "num_cpus": NCPU,
            "disk_write_mb_s": disk_write_mb_s(),
            "mem_copy_gb_s": mem_copy_gb_s()}


def run_ab(ref: str, units: list[str], trials: int = 2) -> dict:
    """Interleaved A/B vs a pinned commit — the ONLY publishable perf
    methodology on this box (VERDICT r3 'do this' #2: its ±35%
    page-cache band swallows cross-session absolutes; alternating
    fresh processes on the same box state makes the pair comparable).

    Creates a worktree of ``ref``, then per unit alternates
    HEAD → ref → HEAD → ref (fresh process each), reporting every pair
    plus best-of per side and the ratio. The ref side runs HEAD's
    bench.py with ``--repo`` pointing at the worktree, so the unit
    definitions stay constant and only the library code differs.
    """
    wt = f"/tmp/raylog_ab_{ref[:12]}"
    if not os.path.isdir(wt):
        subprocess.run(["git", "worktree", "add", wt, ref], check=True,
                       cwd=os.path.dirname(os.path.abspath(__file__)),
                       capture_output=True)

    def run(unit: str, repo: str | None) -> float:
        cmd = [sys.executable, os.path.abspath(__file__), "--unit", unit]
        if repo:
            cmd += ["--repo", repo]
        out = subprocess.run(cmd, capture_output=True, text=True,
                             check=True).stdout
        return json.loads(out.strip().splitlines()[-1])["sec"]

    report: dict[str, dict] = {}
    for unit in units:
        pairs = []
        for _ in range(trials):
            a = run(unit, None)   # HEAD
            b = run(unit, wt)     # pinned ref
            pairs.append([a, b])
        best_a = min(p[0] for p in pairs)
        best_b = min(p[1] for p in pairs)
        report[unit] = {
            "pairs_head_vs_ref": pairs,
            "best_head": best_a,
            "best_ref": best_b,
            "head_over_ref": round(best_a / best_b, 3),
        }
    return {"metric": f"interleaved A/B, HEAD vs {ref}",
            "num_cpus": NCPU, "units": report}


def run_scaling(lo: int | None = None, hi: int | None = None,
                mode: str = "headline") -> dict:
    """Same job, fresh processes, N vs 4N CPUs (default 4 → 16).

    ``mode="headline"`` (default, the published series) is the fused
    pipeline INCLUDING sink writes — all-CPU work (zstd parquet
    encode) that keeps every leg below this box's ~780k rows/s
    read-side throughput ceiling, so the ratio reflects engine
    scaling. Caveat measured 2026-08-19: when the sandbox throttles
    the virtio disk (see ``disk_write_mb_s``; observed swings
    27-168 MB/s within one hour), the sink write becomes an I/O floor
    shared by both legs and the ratio degrades through no engine
    change — read the control next to the number. ``mode="agg"``
    (--scaling-agg) removes the disk from the measurement entirely,
    but the lighter unit SATURATES the box ceiling by ~8 CPUs
    (measured 2/4/8/16/32 CPUs → 141.8k/390k/723k/778k/734k rows/s),
    so its 4→16 ratio reads the ceiling, not the engine; its honest
    pair is 2→8 (measured 1.28 — superlinear because the 2-CPU leg
    degenerates to a single fused actor).

    Two trials per level, best taken (buffered-writeback noise from the
    previous trial's 1.2 GB sink output otherwise leaks into the next
    measurement); os.sync() inside each bench process runs before its
    timer starts.
    """

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), RAYLOG_BENCH_ONLY=mode)
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo = lo if lo is not None else int(os.environ.get("RAYLOG_SCALE_LO", "4"))
    hi = hi if hi is not None else int(os.environ.get("RAYLOG_SCALE_HI", "16"))
    trials = int(os.environ.get("RAYLOG_SCALE_TRIALS", "3"))
    def settle():
        # flush + drop page cache so a trial never pays for the previous
        # trial's 1.2 GB of buffered sink output (each bench process
        # re-warms its own input read before timing)
        os.sync()
        try:
            with open("/proc/sys/vm/drop_caches", "w") as f:
                f.write("3")
        except OSError:
            pass
        time.sleep(2)

    best: dict[int, dict] = {}
    for ncpu in (lo, hi) * trials:
        settle()
        r = run(ncpu)
        if ncpu not in best or r["value"] < best[ncpu]["value"]:
            best[ncpu] = r
    r_lo, r_hi = best[lo], best[hi]
    t_lo, t_hi = r_lo["value"], r_hi["value"]
    eff = (t_lo / t_hi) / (hi / lo)
    unit_name = ("parse→route→aggregate (no sink write)" if mode == "agg"
                 else "fused pipeline incl. sink writes")
    return {
        "metric": f"scaling efficiency (num_cpus {lo} → {hi}, fresh processes, best of {trials})",
        "scaling_unit": unit_name,
        f"sec_{lo}": t_lo,
        f"sec_{hi}": t_hi,
        f"rows_per_sec_{lo}": r_lo["rows_per_sec"],
        f"rows_per_sec_{hi}": r_hi["rows_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "rows": r_hi["rows"],
        "n_lo": lo,
        "n_hi": hi,
        "disk_write_mb_s": r_hi.get("disk_write_mb_s"),
        "mem_copy_gb_s": r_hi.get("mem_copy_gb_s"),
        "sink_device": r_hi.get("sink_device"),
    }


if __name__ == "__main__":
    if "--repo" in sys.argv:
        # measure a pinned checkout with HEAD's unit definitions
        sys.path.insert(0, sys.argv[sys.argv.index("--repo") + 1])
    if "--scaling-pairs" in sys.argv:
        # VERDICT r4 item #8: two independent points of scaling
        # evidence. The 8→32 pair saturates the box (32 logical CPUs =
        # every core incl. SMT siblings; memory bandwidth shared), so
        # its efficiency reads LOW relative to what 8→32 dedicated
        # cores on four nodes would give — published with that caveat.
        print(json.dumps({
            "metric": "scaling efficiency, two pairs, fresh processes",
            "pairs": [run_scaling(4, 16), run_scaling(8, 32)],
        }))
    elif "--scaling-agg" in sys.argv:
        print(json.dumps(run_scaling(mode="agg")))
    elif "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--unit" in sys.argv:
        print(json.dumps(run_unit(sys.argv[sys.argv.index("--unit") + 1])))
    elif "--ab" in sys.argv:
        i = sys.argv.index("--ab")
        ref = sys.argv[i + 1]
        rest = [a for a in sys.argv[i + 2:] if not a.startswith("-")]
        print(json.dumps(run_ab(ref, rest or list(AB_DEFAULT_UNITS))))
    else:
        print(json.dumps(run_bench()))
