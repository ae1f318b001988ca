"""Persistent key-value cache (reference TsvKeyValueCache, utilities.py:154-200).

Parquet-backed instead of TSV, with the same contract: dict-like access,
appends buffered in memory, flushed every ``sync_every`` writes and on
``close()``/context exit.  At scale one cache instance lives per ACTOR
(actor-local memo) and flushes to a per-actor side file; merging the side
files is a tiny dedup job (groupby key → first).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq


class PersistentKVCache:
    def __init__(self, path: str, sync_every: int = 1000):
        self.path = path
        self.sync_every = sync_every
        self._data: dict[str, str] = {}
        self._dirty = 0
        if os.path.exists(path):
            t = pq.read_table(path)
            self._data = dict(zip(t["key"].to_pylist(), t["value"].to_pylist()))

    def __contains__(self, key: str) -> bool:
        return key in self._data

    def __getitem__(self, key: str) -> str:
        return self._data[key]

    def get(self, key: str, default=None):
        return self._data.get(key, default)

    def __setitem__(self, key: str, value: str):
        self._data[key] = value
        self._dirty += 1
        if self._dirty >= self.sync_every:
            self.flush()

    def __len__(self) -> int:
        return len(self._data)

    def flush(self):
        if not self._dirty and os.path.exists(self.path):
            return
        tmp = self.path + ".tmp"
        pq.write_table(
            pa.table(
                {
                    "key": pa.array(list(self._data.keys()), pa.string()),
                    "value": pa.array(list(self._data.values()), pa.string()),
                }
            ),
            tmp,
        )
        os.replace(tmp, self.path)
        self._dirty = 0

    def close(self):
        self.flush()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False
