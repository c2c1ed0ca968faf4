"""Range-partitioned sorted export: global order, disjoint ranges."""

import glob

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from raylog.functions.sortexport import range_sorted_export


def test_sorted_export_global_order(tmp_path):
    rng = np.random.default_rng(6)
    keys = rng.integers(0, 1_000_000, size=50_000)
    tbl = pa.table({"k": pa.array(keys), "payload": pa.array(keys * 3 % 97)})
    out = str(tmp_path / "sorted")
    manifest = range_sorted_export(
        rd.from_arrow(tbl).repartition(8), out, key="k", num_ranges=8,
    ).to_pandas()

    files = sorted(glob.glob(f"{out}/range_*.parquet"))
    assert len(files) == len(manifest)
    assert manifest["rows"].sum() == 50_000
    # ranges disjoint and in file-name order
    assert (manifest["key_min"] <= manifest["key_max"]).all()
    assert (manifest["key_max"].to_numpy()[:-1]
            <= manifest["key_min"].to_numpy()[1:]).all()
    # concatenating files in name order reproduces the full sort
    got = np.concatenate([
        np.asarray(pq.read_table(f)["k"]) for f in files])
    assert (np.diff(got) >= 0).all()
    np.testing.assert_array_equal(np.sort(keys), got)


def test_sorted_export_skewed_keys(tmp_path):
    keys = np.concatenate([np.zeros(5000, dtype=np.int64),
                           np.arange(5000, dtype=np.int64)])
    out = str(tmp_path / "skew")
    manifest = range_sorted_export(
        rd.from_arrow(pa.table({"k": pa.array(keys)})).repartition(4),
        out, key="k", num_ranges=4,
    ).to_pandas()
    assert manifest["rows"].sum() == 10_000
    got = np.concatenate([
        np.asarray(pq.read_table(f)["k"])
        for f in sorted(glob.glob(f"{out}/range_*.parquet"))])
    np.testing.assert_array_equal(np.sort(keys), got)


def test_compact_parquet_dir(tmp_path):
    from raylog.functions.sortexport import compact_parquet_dir

    src = tmp_path / "small"
    src.mkdir()
    total = 0
    for i in range(17):
        n = 100 + i
        pq.write_table(pa.table({"x": pa.array(np.arange(total, total + n))}),
                       str(src / f"f_{i:03d}.parquet"))
        total += n
    man = compact_parquet_dir(str(src), str(tmp_path / "big"),
                              target_rows=500).to_pandas()
    assert man["rows"].sum() == total
    assert len(man) < 17  # actually compacted
    got = np.concatenate([
        np.asarray(pq.read_table(f)["x"])
        for f in sorted(glob.glob(str(tmp_path / "big" / "*.parquet")))])
    np.testing.assert_array_equal(got, np.arange(total))  # order preserved
