"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry at sf=0.01 and compares row-count, schema
(column names) and order-insensitive values against ``oracle_sql()`` via
DuckDB. Usage: ``python scripts/check_oracle.py [sf_dir] [query ...]``
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v
            )
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
    df = df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)
    return df


def compare(name: str, mine: pd.DataFrame, oracle: pd.DataFrame) -> bool:
    ok = True
    if sorted(mine.columns) != sorted(oracle.columns):
        print(f"  {name}: SCHEMA mismatch mine={sorted(mine.columns)} oracle={sorted(oracle.columns)}")
        return False
    if len(mine) != len(oracle):
        print(f"  {name}: ROWCOUNT mismatch mine={len(mine)} oracle={len(oracle)}")
        ok = False
    a, b = normalize(mine), normalize(oracle)
    # The driver's external gate hashes raw fetched values, which IS
    # dtype-sensitive (DuckDB HUGEINT window sums fetch as float64).
    # Surface int-vs-float drift as a failure so it never ships red.
    for c in a.columns:
        ka = a[c].dtype.kind
        kb = b[c].dtype.kind if c in b.columns else None
        if kb and {ka, kb} == {"i", "f"}:
            print(f"  {name}: DTYPE drift col={c} mine={a[c].dtype} oracle={b[c].dtype}")
            ok = False
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c], b[c]
            try:
                same = ((av.isna() & bv.isna()) | (av == bv)).all()
            except Exception:
                same = av.astype(str).equals(bv.astype(str))
            if not same:
                bad = (~((av.isna() & bv.isna()) | (av == bv))).idxmax()
                print(f"  {name}: VALUE mismatch col={c} row={bad} mine={a[c][bad]!r} oracle={b[c][bad]!r}")
                ok = False
    return ok


def main():
    args = [a for a in sys.argv[1:]]
    sf_dir = args.pop(0) if args and "/" in args[0] else "/root/testdata/sf0.01"
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as E

    qs, os_ = E.queries(), E.oracle_sql()
    names = args or list(qs)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"create view {t} as select * from '{sf_dir}/{t}.parquet'")
    n_ok = n_bad = n_weak = 0
    for name in names:
        res = qs[name](sf_dir)
        if hasattr(res, "to_pandas"):
            mine = res.to_pandas()
        else:
            mine = pd.DataFrame(res)
        if name not in os_:
            print(f"  {name}: (rows-only) {len(mine)} rows")
            n_weak += 1
            continue
        oracle = con.execute(os_[name]).fetchdf()
        if compare(name, mine, oracle):
            print(f"  {name}: OK ({len(mine)} rows)")
            n_ok += 1
        else:
            n_bad += 1
    print(f"== {n_ok} ok, {n_bad} bad, {n_weak} rows-only")
    ray.shutdown()
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
