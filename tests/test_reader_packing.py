"""read_sequences(row_groups_per_task=N) must yield identical rows."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from raylog.sources.reader import read_sequences


def _write(tmp_path, n_files=3, rgs=4, rows_per_rg=100):
    files = []
    for f in range(n_files):
        t = pa.table({
            "doc_id": pa.array(np.arange(f * 10000, f * 10000 + rgs * rows_per_rg)),
            "n_tok": pa.array(np.arange(rgs * rows_per_rg) % 37),
        })
        p = str(tmp_path / f"part{f}.parquet")
        pq.write_table(t, p, row_group_size=rows_per_rg)
        files.append(p)
    return files


def test_packed_reader_same_rows(tmp_path):
    files = _write(tmp_path)
    base = read_sequences(files).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    for rgpt in (2, 3, 8):
        packed = read_sequences(files, row_groups_per_task=rgpt).to_pandas()
        packed = packed.sort_values("doc_id").reset_index(drop=True)
        assert packed.equals(base), rgpt
    pruned = read_sequences(files, columns=["doc_id"],
                            row_groups_per_task=2)
    assert pruned.schema().names == ["doc_id"]
    assert pruned.count() == len(base)
