"""Row-group-granular parquet reader for the sequences table.

``ray.data.read_parquet`` re-splits each file's stream into many small
blocks (SplitBlocks), which measured 5-7x slower than raw parquet reads on
this workload and shatters downstream task granularity. This reader keeps
the idiomatic Dataset shape but assigns work at parquet *row-group*
granularity — the same unit every distributed parquet scanner uses: a tiny
driver-side metadata pass lists (file, row_group) pairs, then a stateless
``map_batches`` stage reads its row group directly with
``pyarrow.parquet`` (column-pruned). One task ↔ one row group ↔ one
right-sized block; reads scale linearly with CPUs and files.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd


def _open_parquet(path: str, filesystem=None) -> pq.ParquetFile:
    """Open a parquet file locally or through an injected
    ``pyarrow.fs.FileSystem`` (multi-node shared storage)."""
    if filesystem is None:
        return pq.ParquetFile(path)
    return pq.ParquetFile(filesystem.open_input_file(path))


def _list_row_groups(files: list[str], on_error: str = "raise",
                     filesystem=None) -> list[dict]:
    items = []
    for path in sorted(files):
        try:
            md = _open_parquet(path, filesystem).metadata
        except Exception:
            if on_error == "skip":
                import logging

                logging.getLogger(__name__).warning(
                    "skipping unreadable parquet file %s", path)
                continue
            raise
        for rg in range(md.num_row_groups):
            items.append({"path": path, "row_group": rg})
    return items


def read_sequences(
    files: list[str],
    columns: list[str] | None = None,
    row_groups_per_task: int = 1,
    on_error: str = "raise",
    filesystem=None,
) -> rd.Dataset:
    """Dataset over (file, row_group) read tasks, column-pruned.

    ``row_groups_per_task > 1`` packs that many consecutive row groups of
    one file into a single block. Use it when a downstream stage emits
    output proportional to the number of BLOCKS (partial-count
    aggregates: ~vocab rows per block regardless of block size) — bigger
    blocks at the read is the correct coalescing knob here, because a
    downstream ``map_batches(batch_size=...)`` would FUSE with this
    reader and bundle the one-row (path, row_group) items, collapsing
    the whole read into a single task.

    ``on_error="skip"`` degrades gracefully on corrupt shards — an
    unreadable file or row group is logged and skipped instead of
    failing the run (a 100 TB corpus WILL contain a few bad objects;
    losing one row group beats losing the job). Default stays strict.
    """
    packed, cur = [], None
    for it in _list_row_groups(files, on_error=on_error,
                               filesystem=filesystem):
        if (cur is None or it["path"] != cur["path"]
                or len(cur["rgs"]) >= row_groups_per_task):
            cur = {"path": it["path"], "rgs": []}
            packed.append(cur)
        cur["rgs"].append(it["row_group"])

    def _read(batch: pa.Table):
        for path, rgs in zip(batch["path"].to_pylist(),
                             batch["rgs"].to_pylist()):
            try:
                f = _open_parquet(path, filesystem)
                tbl = f.read_row_groups(list(rgs), columns=columns)
            except Exception:
                if on_error == "skip":
                    import logging

                    logging.getLogger(__name__).warning(
                        "skipping unreadable row groups %s of %s", rgs, path)
                    continue
                raise
            yield tbl

    return rd.from_items(packed).map_batches(
        _read, batch_format="pyarrow", batch_size=1
    )


def read_harmonized(
    files: list[str],
    schema: pa.Schema,
    row_groups_per_task: int = 1,
) -> rd.Dataset:
    """Schema-evolution-tolerant reader over heterogeneous shards.

    Long-lived corpora accumulate shards written by different pipeline
    versions: columns added, dropped, or widened. Each row group is
    harmonized to ``schema`` as it is read — missing columns become
    typed nulls, extra columns are dropped, mismatched types are cast
    (error if not castable) — so every downstream stage sees ONE stable
    schema and Ray never unions mismatched block schemas mid-pipeline.
    Column pruning still applies: only ``schema``'s columns that exist
    in a file are read from storage.
    """
    packed, cur = [], None
    for it in _list_row_groups(files):
        if (cur is None or it["path"] != cur["path"]
                or len(cur["rgs"]) >= row_groups_per_task):
            cur = {"path": it["path"], "rgs": []}
            packed.append(cur)
        cur["rgs"].append(it["row_group"])

    names = schema.names

    def _read(batch: pa.Table):
        for path, rgs in zip(batch["path"].to_pylist(),
                             batch["rgs"].to_pylist()):
            f = pq.ParquetFile(path)
            have = [c for c in names if c in f.schema_arrow.names]
            tbl = f.read_row_groups(list(rgs), columns=have)
            cols = []
            for field in schema:
                if field.name in tbl.column_names:
                    col = tbl[field.name]
                    if col.type != field.type:
                        col = col.cast(field.type)
                    cols.append(col)
                else:
                    cols.append(pa.nulls(tbl.num_rows, field.type))
            yield pa.table(dict(zip(names, cols)))

    return rd.from_items(packed).map_batches(
        _read, batch_format="pyarrow", batch_size=1
    )


def read_pruned(
    files: list[str],
    columns: list[str] | None = None,
    predicate: tuple[str, object, object] | None = None,
    row_groups_per_task: int = 1,
) -> rd.Dataset:
    """Row-group-statistics predicate pushdown: ``predicate=(col, lo,
    hi)`` skips every row group whose [min, max] cannot intersect
    [lo, hi] — planned from footer metadata only, so a selective range
    over a sorted/clustered column reads a small fraction of the bytes
    (the "prune at the read" rule). Surviving row groups still get an
    exact row-level filter, so results are correct for any layout.
    ``lo``/``hi`` may be None for one-sided ranges.
    """
    col_name, lo, hi = predicate if predicate else (None, None, None)
    packed, cur, scanned, kept = [], None, 0, 0
    for path in sorted(files):
        pf = pq.ParquetFile(path)
        md = pf.metadata
        try:
            ci = md.schema.to_arrow_schema().get_field_index(col_name) \
                if col_name else -1
        except Exception:
            ci = -1
        for rg in range(md.num_row_groups):
            scanned += 1
            if col_name is not None and ci >= 0:
                st = md.row_group(rg).column(ci).statistics
                if st is not None and st.has_min_max:
                    if (hi is not None and st.min > hi) or \
                       (lo is not None and st.max < lo):
                        continue
            kept += 1
            if (cur is None or path != cur["path"]
                    or len(cur["rgs"]) >= row_groups_per_task):
                cur = {"path": path, "rgs": []}
                packed.append(cur)
            cur["rgs"].append(rg)

    read_cols = columns
    if columns is not None and col_name is not None and \
            col_name not in columns:
        read_cols = list(columns) + [col_name]

    def _read(batch: pa.Table):
        import pyarrow.compute as pc

        for path, rgs in zip(batch["path"].to_pylist(),
                             batch["rgs"].to_pylist()):
            tbl = pq.ParquetFile(path).read_row_groups(
                list(rgs), columns=read_cols)
            if col_name is not None:
                m = None
                if lo is not None:
                    m = pc.greater_equal(tbl[col_name], pa.scalar(lo))
                if hi is not None:
                    m2 = pc.less_equal(tbl[col_name], pa.scalar(hi))
                    m = m2 if m is None else pc.and_(m, m2)
                if m is not None:
                    tbl = tbl.filter(m)
                if columns is not None and col_name not in columns:
                    tbl = tbl.select(columns)
            yield tbl

    ds = rd.from_items(packed).map_batches(
        _read, batch_format="pyarrow", batch_size=1)
    # expose the plan-time pruning stats for tests/observability
    ds._raylog_pruning = {"row_groups_total": scanned,
                          "row_groups_read": kept}
    return ds


def read_hive_partitioned(
    root: str,
    columns: list[str] | None = None,
    filters: dict[str, set] | None = None,
) -> rd.Dataset:
    """Hive-layout (``key=value`` directory) dataset read with
    PARTITION pruning: a file whose path carries ``key=v`` for a
    filtered key with ``v`` outside the allowed set is skipped at plan
    time — zero bytes of it are opened. This is the directory-level
    complement of :func:`read_pruned`'s row-group-statistics pruning,
    and the read-side contract of the repo's partitioned/resumable
    sink convention (one directory per key → a key-filtered consumer
    touches only its partitions; at 100 TB this is the difference
    between a scan and a seek).

    Partition keys are attached to every batch as string columns
    (hive semantics); ``columns`` projects the FILE columns only.
    Plan-time stats are exposed as ``ds._raylog_pruning``.
    """
    import os

    want = {k: {str(x) for x in v} for k, v in (filters or {}).items()}
    files: list[tuple[str, dict[str, str]]] = []
    total = 0
    for dirpath, _, names in sorted(os.walk(root)):
        parts: dict[str, str] = {}
        rel = os.path.relpath(dirpath, root)
        for seg in rel.split(os.sep):
            if "=" in seg:
                k, _, v = seg.partition("=")
                parts[k] = v
        for nm in sorted(names):
            if not nm.endswith(".parquet"):
                continue
            total += 1
            if any(parts.get(k) not in vs for k, vs in want.items()):
                continue
            files.append((os.path.join(dirpath, nm), parts))

    def _read(batch: pa.Table):
        for path, keys in zip(batch["path"].to_pylist(),
                              batch["keys"].to_pylist()):
            tbl = pq.read_table(path, columns=columns)
            for k, v in keys.items():
                tbl = tbl.append_column(
                    k, pa.array([v] * tbl.num_rows, pa.string()))
            yield tbl

    items = [{"path": p, "keys": k} for p, k in files]
    if not items:
        # typed-empty plan: nothing matched the partition filter
        ds = rd.from_items([]).map_batches(lambda b: b)
    else:
        ds = rd.from_items(items).map_batches(
            _read, batch_format="pyarrow", batch_size=1)
    ds._raylog_pruning = {"files_total": total, "files_read": len(files)}
    return ds
