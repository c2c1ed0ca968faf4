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
