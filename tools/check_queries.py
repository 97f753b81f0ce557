"""Mirror the grading driver: run every queries() entry at a given sf and
compare SQL-checked ones against oracle_sql() via DuckDB (row count, column
set, order-insensitive value comparison). Usage:

    python tools/check_queries.py [sf_dir] [name_filter]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        if str(df[c].dtype) in ("uint64", "int32", "uint32", "Int64", "UInt32"):
            df[c] = df[c].astype("int64")
        if str(df[c].dtype) == "float32":
            df[c] = df[c].astype("float64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = sys.argv[2] if len(sys.argv) > 2 else ""

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = []
    for name, fn in qs.items():
        if name_filter and name_filter not in name:
            continue
        t0 = time.perf_counter()
        try:
            raw = to_pandas(fn(sf_dir))
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            continue
        dt = time.perf_counter() - t0
        if name not in sqls:
            print(
                f"ok   {name}: rows-only, {len(raw)} rows, {dt:.2f}s, cols={sorted(raw.columns)}"
            )
            continue
        got = canon(raw)
        want = canon(con.sql(sqls[name]).df())
        status = "ok  "
        msgs = []
        if list(got.columns) != list(want.columns):
            status = "FAIL"
            msgs.append(f"cols {list(got.columns)} != {list(want.columns)}")
        elif len(got) != len(want):
            status = "FAIL"
            msgs.append(f"rows {len(got)} != {len(want)}")
        else:
            try:
                pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
            except AssertionError as e:
                status = "FAIL"
                msgs.append(str(e).split("\n")[0])
        if status == "FAIL":
            failures.append(name)
        print(f"{status} {name}: {len(got)} rows, {dt:.2f}s" + ("; " + "; ".join(msgs) if msgs else ""))

    print(f"\n{len(failures)} failures: {failures}")
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
