"""Golden-fixture pins for the no-SQL-oracle queries (VERDICT r4 #5).

doc_langid / dedup_minhash_docs / embedding_kmeans have no SQL oracle
(n-gram profiles, LSH + connected components, iterative float k-means),
so their driver rows were previously rows-only.  Each is fully
deterministic, so a committed one-time capture (tools/make_golden.py)
pins the exact output; these tests assert bit-for-bit equality so any
unintentional semantic drift fails CI, and tools/check_queries.py
hash-compares the same fixtures in the driver-gate mimic.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
SF_DIR = "/root/testdata/sf0.001"


def _canon(obj):
    import sys

    sys.path.insert(0, "/root/repo")
    from tools.make_golden import canon_table

    return canon_table(obj)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize(
    "query", ["doc_langid", "dedup_minhash_docs", "embedding_kmeans"]
)
def test_golden_pin(query):
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entry_mod

    got = _canon(entry_mod.queries()[query](SF_DIR))
    want = pq.read_table(os.path.join(GOLDEN_DIR, f"{query}.sf0.001.parquet"))
    assert got.schema.names == want.schema.names
    assert got.num_rows == want.num_rows
    assert got.equals(want), f"{query} drifted from its committed golden"
