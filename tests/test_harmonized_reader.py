"""Schema-evolution-tolerant reader: heterogeneous shards → one schema."""

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from raylog.sources.reader import read_harmonized

TARGET = pa.schema([
    ("doc_id", pa.int64()),
    ("text", pa.string()),
    ("lang", pa.string()),
    ("score", pa.float64()),
])


def _write_shards(tmp_path):
    # v1 shard: no `score`, narrow doc_id
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2], pa.int32()),
        "text": pa.array(["aa", "bb"]),
        "lang": pa.array(["en", "de"]),
    }), f"{tmp_path}/v1.parquet")
    # v2 shard: adds score, plus an extra column that must be dropped
    pq.write_table(pa.table({
        "doc_id": pa.array([3], pa.int64()),
        "text": pa.array(["cc"]),
        "lang": pa.array(["fr"]),
        "score": pa.array([0.5], pa.float64()),
        "debug_blob": pa.array(["x"]),
    }), f"{tmp_path}/v2.parquet")
    return [f"{tmp_path}/v1.parquet", f"{tmp_path}/v2.parquet"]


def test_harmonized_read(ray_session, tmp_path):
    files = _write_shards(tmp_path)
    ds = read_harmonized(files, TARGET)
    df = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(df.columns) == ["doc_id", "text", "lang", "score"]
    assert df["doc_id"].tolist() == [1, 2, 3]
    assert df["score"].isna().tolist() == [True, True, False]
    assert df["score"].iloc[2] == 0.5
    # dtype widened to the target
    tbl = pa.concat_tables(ds.iter_batches(batch_format="pyarrow",
                                           batch_size=None))
    assert tbl.schema.field("doc_id").type == pa.int64()


def test_harmonized_read_prunes_missing_gracefully(ray_session, tmp_path):
    files = _write_shards(tmp_path)
    # target with a column no shard has at all
    target = TARGET.append(pa.field("embedding", pa.list_(pa.float32())))
    ds = read_harmonized(files, target)
    tbl = pa.concat_tables(ds.iter_batches(batch_format="pyarrow",
                                           batch_size=None))
    assert tbl["embedding"].null_count == 3
    assert tbl.schema.field("embedding").type == pa.list_(pa.float32())


def test_read_sequences_skips_corrupt_file(ray_session, tmp_path):
    import numpy as np

    from raylog.sources.reader import read_sequences

    good = f"{tmp_path}/good.parquet"
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(100, dtype=np.int64)),
        "n": pa.array(np.ones(100, dtype=np.int64)),
    }), good)
    bad = f"{tmp_path}/bad.parquet"
    with open(bad, "wb") as f:
        f.write(b"PAR1 this is not a parquet file")
    # strict mode raises at plan time
    import pytest as _pytest

    with _pytest.raises(Exception):
        read_sequences([good, bad]).count()
    # skip mode reads everything readable
    assert read_sequences([good, bad], on_error="skip").count() == 100


def test_read_sequences_skips_truncated_row_group(ray_session, tmp_path):
    import numpy as np

    from raylog.sources.reader import read_sequences

    path = f"{tmp_path}/trunc.parquet"
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(1000, dtype=np.int64)),
    }), path, row_group_size=250)
    # truncate mid-body but keep the footer region invalid → data reads
    # fail while metadata may parse; emulate by corrupting data pages
    raw = bytearray(open(path, "rb").read())
    raw[100:200] = b"\x00" * 100  # stomp an early data page
    open(path, "wb").write(bytes(raw))
    ds = read_sequences([path], on_error="skip")
    # whatever row groups survive decode are returned; the run completes
    n = ds.count()
    assert 0 <= n <= 1000


def test_read_pruned_skips_row_groups(ray_session, tmp_path):
    import numpy as np

    from raylog.sources.reader import read_pruned

    # sorted column → row groups have disjoint [min,max]
    path = f"{tmp_path}/sorted.parquet"
    pq.write_table(pa.table({
        "k": pa.array(np.arange(10_000, dtype=np.int64)),
        "v": pa.array(np.arange(10_000, dtype=np.int64) * 2),
    }), path, row_group_size=1000)

    ds = read_pruned([path], columns=["v"], predicate=("k", 2500, 3499))
    stats = ds._raylog_pruning
    assert stats["row_groups_total"] == 10
    assert stats["row_groups_read"] == 2  # only rg2 and rg3 intersect
    df = ds.to_pandas()
    assert len(df) == 1000
    assert df["v"].min() == 5000 and df["v"].max() == 6998
    # one-sided range
    ds2 = read_pruned([path], columns=["v"], predicate=("k", 9000, None))
    assert ds2._raylog_pruning["row_groups_read"] == 1
    assert ds2.count() == 1000


def test_hive_partitioned_read_prunes_at_plan_time(tmp_path, ray_session):
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from raylog.sources.reader import read_hive_partitioned

    src = pq.read_table("/root/testdata/sf0.001/documents.parquet")
    df = src.to_pandas()
    root = tmp_path / "hive"
    for s, grp in df.groupby("source"):
        d = root / f"source={s}"
        d.mkdir(parents=True)
        pq.write_table(pa.Table.from_pandas(grp.drop(columns=["source"]),
                                            preserve_index=False),
                       str(d / "part0.parquet"))

    ds = read_hive_partitioned(str(root), columns=["doc_id", "n_chars"],
                               filters={"source": {"src3"}})
    stats = ds._raylog_pruning
    out = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)

    n_sources = df["source"].nunique()
    assert stats["files_total"] == n_sources
    assert stats["files_read"] == 1  # plan-time pruning, not row filter

    want = duckdb.sql(
        "SELECT doc_id, n_chars, source FROM df WHERE source='src3' "
        "ORDER BY doc_id").df()
    assert list(out["doc_id"]) == list(want["doc_id"])
    assert list(out["n_chars"]) == list(want["n_chars"])
    assert set(out["source"]) == {"src3"}

    # nothing-matches filter: typed-empty plan, zero files opened
    empty = read_hive_partitioned(str(root), filters={"source": {"nope"}})
    assert empty._raylog_pruning["files_read"] == 0
    assert len(empty.to_pandas()) == 0
