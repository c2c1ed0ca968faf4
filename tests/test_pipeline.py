"""End-to-end conformance: Ray pipeline vs the pure-Python row oracle.

Covers the FIXTURES.md §F5 routing cases, per-row token-array equality
through the sinks, and the per-sink aggregate counts.
"""

import pyarrow.parquet as pq
import pytest

from raylog import records as R
from raylog.pipelines import log_pipeline as LP
from tests import row_oracle


@pytest.fixture(scope="module")
def fixture(sf_dir):
    docs = pq.read_table(f"{sf_dir}/documents.parquet")
    recs = R.build_records_batch(docs).to_pylist()
    dim_tbl = LP.dim_for(sf_dir)
    dim = {r["source"]: r for r in dim_tbl.to_pylist()}
    oracle = {r["doc_id"]: row_oracle.process_record(r, dim) for r in recs}
    routed = LP.full_pipeline(sf_dir, concurrency=2)
    return {"oracle": oracle, "routed": routed, "dim": dim}


def test_routing_truth_table(fixture):
    df = fixture["routed"].to_pandas().set_index("doc_id")
    oracle = fixture["oracle"]
    assert len(df) == len(oracle)
    for doc_id, o in oracle.items():
        row = df.loc[doc_id]
        assert bool(row["in_container"]) == ("container" in o["sinks"]), doc_id
        assert bool(row["in_job"]) == ("job" in o["sinks"]), doc_id
        assert bool(row["in_export"]) == ("export" in o["sinks"]), doc_id


def test_all_route_cases_present(fixture):
    """The fixture must exercise every F5 routing case."""
    kinds = set()
    for o in fixture["oracle"].values():
        kinds.add(frozenset(o["sinks"]))
    assert frozenset(["container"]) in kinds
    assert frozenset(["job"]) in kinds or frozenset(["job", "export"]) in kinds
    assert frozenset(["container", "export"]) in kinds


def test_sink_rows_and_token_equality(fixture):
    oracle = fixture["oracle"]
    for sink in ("container", "job", "export"):
        got = LP.sink_dataset(fixture["routed"], sink).to_pandas()
        want_ids = sorted(d for d, o in oracle.items() if sink in o["sinks"])
        assert sorted(got["doc_id"]) == want_ids, sink
        by_id = got.set_index("doc_id")
        for d in want_ids:
            ev = oracle[d]["events"][sink]
            row = by_id.loc[d]
            assert list(row["tokens"]) == ev["tokens"], (sink, d)  # bit-identical payload
            assert row["id"] == ev["id"], (sink, d)
            assert row["source_out"] == ev["source_out"]
            assert row["content"] == ev["content"]
            assert (row["level"] == ev["level"]) or (
                ev["level"] is None and row["level"] is None
            )
            assert row["ts_ns"] == ev["ts_ns"]


def test_sink_counts_match_oracle(fixture):
    got = LP.sink_counts(fixture["routed"]).to_pandas()
    import collections

    want = collections.Counter()
    for o in fixture["oracle"].values():
        for sink in o["sinks"]:
            ev = o["events"][sink]
            want[(sink, ev["source"], ev["level"])] += 1
    got_map = {
        (r.sink, r.source, None if r.level != r.level or r.level is None else r.level): r.cnt
        for r in got.itertuples()
    }
    assert got_map == dict(want)


def test_enrichment_miss_rows_flow(fixture):
    """Sources absent from the dim table still reach the container sink."""
    dim_sources = set(fixture["dim"])
    df = fixture["routed"].to_pandas()
    missing = df[~df["source"].isin(dim_sources)]
    assert len(missing) > 0  # fixture must exercise the miss path
    assert missing["pod_name"].isna().all()
    assert missing["in_container"].all()
