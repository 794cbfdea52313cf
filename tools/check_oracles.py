"""Local harness mimicking the driver's correctness compare: run each
``queries()`` entry and its ``oracle_sql()`` twin on the same sf dir,
compare row count, column names, and order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import warnings

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return (
        df.sort_values(list(df.columns)).reset_index(drop=True)
    )


def main() -> int:
    warnings.filterwarnings("ignore")
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=8, include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import importlib

    entry = importlib.import_module("__ray_entry__")
    queries = entry.queries()
    oracles = entry.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    # oracle corpus path is pinned to sf0.01 — rewrite for other sf dirs
    tag = sf_dir.rstrip("/").split("/")[-1]

    failures = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            mine = canon(to_pandas(fn(sf_dir)))
        except Exception as e:
            print(f"FAIL  {name}: ray query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"rows  {name}: {len(mine)} rows (rows-only check, no oracle)")
            continue
        sql = sql.replace("/sf0.01/", f"/{tag}/")
        try:
            theirs = canon(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL  {name}: oracle raised {type(e).__name__}: {e}")
            failures += 1
            continue
        ok_rows = len(mine) == len(theirs)
        ok_cols = list(mine.columns) == list(theirs.columns)
        ok_vals = False
        if ok_rows and ok_cols:
            try:
                pd.testing.assert_frame_equal(
                    mine, theirs, check_dtype=False, check_exact=False,
                    rtol=0, atol=1e-9,
                )
                ok_vals = True
            except AssertionError as e:
                msg = str(e).splitlines()[0]
        if ok_rows and ok_cols and ok_vals:
            print(f"OK    {name}: {len(mine)} rows")
        else:
            failures += 1
            print(
                f"FAIL  {name}: rows {len(mine)} vs {len(theirs)}; "
                f"cols {list(mine.columns)} vs {list(theirs.columns)}"
            )
            if ok_rows and ok_cols:
                print(f"      value mismatch: {msg}")
                merged = mine.compare(theirs) if mine.shape == theirs.shape else None
                if merged is not None and len(merged):
                    print(merged.head(5))
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
