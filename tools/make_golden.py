"""Generate committed golden fixtures for the no-SQL-oracle queries
(VERDICT r4 #5): doc_langid, dedup_minhash_docs, embedding_kmeans.

Each of these is fully deterministic (fixed n-gram profiles / deterministic
64-bit hashes / seeded k-means++ init), so a one-time capture pins the exact
output; tests/test_golden.py asserts equality on every run and
tools/check_queries.py hash-compares against the fixture instead of falling
back to a rows-only check.

Usage: python tools/make_golden.py  (regenerates tests/golden/*.parquet)
Re-run ONLY when an intentional semantic change lands, and say so in the
commit message — these files define the pinned answers.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")
QUERIES = ("doc_langid", "dedup_minhash_docs", "embedding_kmeans")
SF_DIRS = {"sf0.001": "/root/testdata/sf0.001", "sf0.01": "/root/testdata/sf0.01"}


def canon_table(obj):
    """Query result → column-sorted, row-sorted Arrow table (the same
    canonicalization the driver's value-hash uses)."""
    import pyarrow as pa

    import ray.data as rd

    if isinstance(obj, rd.Dataset):
        t = pa.concat_tables(obj.iter_batches(batch_format="pyarrow"))
    elif isinstance(obj, pa.Table):
        t = obj
    else:  # pandas
        t = pa.Table.from_pandas(obj, preserve_index=False)
    t = t.select(sorted(t.column_names))
    return t.sort_by([(c, "ascending") for c in t.column_names])


def main():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import pyarrow.parquet as pq

    import __ray_entry__ as entry_mod

    qs = entry_mod.queries()
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for sf_name, sf_dir in SF_DIRS.items():
        for q in QUERIES:
            t = canon_table(qs[q](sf_dir))
            path = os.path.join(GOLDEN_DIR, f"{q}.{sf_name}.parquet")
            pq.write_table(t, path, compression="zstd")
            print(f"wrote {path}: {t.num_rows} rows, {t.column_names}")
    ray.shutdown()


if __name__ == "__main__":
    main()
