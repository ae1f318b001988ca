"""Local mimic of the driver's correctness gate: run queries() vs oracle_sql()
at a given sf and compare row-count + schema + order-insensitive values.

Usage: python tools/check_queries.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


def to_pandas(obj):
    import pandas as pd
    import pyarrow as pa

    try:
        import ray.data as rd

        if isinstance(obj, rd.Dataset):
            return obj.to_pandas()
    except ImportError:
        pass
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    if isinstance(obj, pd.DataFrame):
        return obj
    raise TypeError(type(obj))


def canon(df):
    import pandas as pd

    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main():
    import duckdb
    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entry_mod

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    # local checker covers the FULL surface: the driver-facing 50 plus the
    # variants consolidated out of the driver's 50-entry window
    qs = {**entry_mod.queries(), **entry_mod.extra_queries()}
    oracles = entry_mod.all_oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = canon(to_pandas(fn(sf_dir)))
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: query raised {type(e).__name__}: {e}")
            continue
        dt = time.time() - t0
        if name not in oracles:
            # no SQL oracle — fall back to a committed golden fixture when
            # one exists for this sf (tools/make_golden.py, VERDICT r4 #5)
            import os

            golden = os.path.join(
                os.path.dirname(__file__), "..", "tests", "golden",
                f"{name}.{os.path.basename(sf_dir.rstrip('/'))}.parquet",
            )
            if os.path.exists(golden):
                import pyarrow.parquet as _pq

                want = canon(_pq.read_table(golden).to_pandas())
                if len(got) != len(want) or not got.equals(want):
                    failures.append(name)
                    print(f"FAIL  {name}: mismatch vs golden fixture")
                    continue
                print(f"OK    {name}: {len(got)} rows match GOLDEN [{dt:.1f}s]")
                continue
            print(f"ok*   {name}: {len(got)} rows (rows-only, no oracle) [{dt:.1f}s]")
            continue
        want = canon(con.execute(oracles[name]).fetchdf())
        if list(got.columns) != list(want.columns):
            failures.append(name)
            print(f"FAIL  {name}: columns {list(got.columns)} != {list(want.columns)}")
            continue
        if len(got) != len(want):
            failures.append(name)
            print(f"FAIL  {name}: rows {len(got)} != {len(want)}")
            continue
        eq = got.equals(want)
        if not eq:
            # numeric tolerance pass
            import numpy as np

            diffs = []
            for c in got.columns:
                a, b = got[c], want[c]
                if np.issubdtype(a.dtype, np.number) and np.issubdtype(b.dtype, np.number):
                    if not np.allclose(a, b, rtol=0, atol=1e-9, equal_nan=True):
                        diffs.append(c)
                elif not a.equals(b.astype(a.dtype) if a.dtype != b.dtype else b):
                    diffs.append(c)
            if diffs:
                failures.append(name)
                print(f"FAIL  {name}: value mismatch in columns {diffs}")
                for c in diffs[:2]:
                    neq = got[c] != want[c]
                    print(got.loc[neq, :].head(3))
                    print(want.loc[neq, :].head(3))
                continue
        print(f"OK    {name}: {len(got)} rows match oracle [{dt:.1f}s]")
    ray.shutdown()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all checks passed")


if __name__ == "__main__":
    main()
