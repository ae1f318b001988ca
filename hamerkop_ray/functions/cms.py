"""Count-Min Sketch (Cormode & Muthukrishnan 2005), vectorized with
numpy — approximate frequencies in fixed memory.

depth×width uint64 counter grid; probe rows are derived by double
hashing (same fixed-key SipHash pair as functions.bloom), so add and
estimate are pure numpy over whole columns.  Estimates are BIASED UP
(min over rows never undercounts); merge is elementwise sum, so
per-batch partials combine exactly like any commutative aggregate.
"""

from __future__ import annotations

import numpy as np

_DEF_DEPTH = 4
_DEF_WIDTH = 16384


class CountMinSketch:
    def __init__(self, depth: int = _DEF_DEPTH, width: int = _DEF_WIDTH):
        self.depth = int(depth)
        self.width = int(width)
        self.counts = np.zeros((self.depth, self.width), np.uint64)

    def _positions(self, values: np.ndarray) -> np.ndarray:
        from .bloom import _hash_pair

        h1, h2 = _hash_pair(values)
        i = np.arange(self.depth, dtype=np.uint64)[:, None]
        return ((h1[None, :] + i * h2[None, :])
                % np.uint64(self.width)).astype(np.int64)

    def add(self, values, weights=None) -> "CountMinSketch":
        v = np.asarray(values)
        if v.size == 0:
            return self
        pos = self._positions(v)
        w = (np.ones(v.size, np.uint64) if weights is None
             else np.asarray(weights).astype(np.uint64))
        for d in range(self.depth):
            np.add.at(self.counts[d], pos[d], w)
        return self

    def estimate(self, values) -> np.ndarray:
        v = np.asarray(values)
        if v.size == 0:
            return np.zeros(0, np.int64)
        pos = self._positions(v)
        ests = np.stack([self.counts[d][pos[d]] for d in range(self.depth)])
        return ests.min(axis=0).astype(np.int64)

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        assert (self.depth, self.width) == (other.depth, other.width)
        self.counts += other.counts
        return self
