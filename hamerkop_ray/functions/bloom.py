"""Bloom filter membership sketch, vectorized with numpy.

Double hashing (Kirsch & Mitzenmacher 2006): k probe positions are
derived as h1 + i*h2 from two independent 64-bit fixed-key SipHash
values, so build and probe are pure numpy over the whole column.  The
bit array is a numpy uint8 buffer — picklable, ray.put-broadcastable,
mergeable by OR.

Guarantees: no false negatives ever; false-positive rate ~(1-e^{-kn/m})^k.
The scale idiom this enables: broadcast a bloom of the small side's keys
and drop definite non-members per batch BEFORE any shuffle — an exact
anti/semi join then only processes the (tiny) maybe-set.
"""

from __future__ import annotations

import numpy as np


def _canon(values) -> np.ndarray:
    """Canonicalize input dtype BEFORE hashing: pd.util.hash_array hashes
    raw bytes, so the same logical keys arriving as int32 on build and
    int64 on probe (or as float64 via a nullable column's to_numpy) would
    hash differently — silent FALSE NEGATIVES, breaking the no-false-
    negative contract.  Integers → int64, floats/objects rejected only if
    they can't round-trip; nulls are rejected loudly."""
    v = np.asarray(values)
    if v.dtype == object:
        import pandas as pd

        if pd.isna(v).any():
            raise ValueError("BloomFilter keys must be non-null")
        if v.size and all(isinstance(x, (int, np.integer)) for x in v):
            v = v.astype(np.int64)  # else leave as object (e.g. strings)
    elif np.issubdtype(v.dtype, np.integer):
        v = v.astype(np.int64, copy=False)
    elif np.issubdtype(v.dtype, np.floating):
        if np.isnan(v).any():
            raise ValueError("BloomFilter keys must be non-null")
        as_int = v.astype(np.int64)
        if not (as_int == v).all():
            raise ValueError(
                "BloomFilter float keys must be integral (nullable int "
                "column surfaced as float?) — cast explicitly first"
            )
        v = as_int
    return v


def _hash_pair(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    import pandas as pd

    h1 = pd.util.hash_array(_canon(values), categorize=False)
    h2 = pd.util.hash_array(h1, categorize=False) | np.uint64(1)
    return h1, h2


def optimal_params(n_items: int, fpp: float = 0.01) -> tuple[int, int]:
    """(n_bits, k) sized for `n_items` at false-positive rate `fpp`."""
    n_items = max(n_items, 1)
    m = int(np.ceil(-n_items * np.log(fpp) / (np.log(2) ** 2)))
    k = max(1, int(round(m / n_items * np.log(2))))
    return m, k


class BloomFilter:
    def __init__(self, n_bits: int, k: int):
        self.n_bits = int(n_bits)
        self.k = int(k)
        self.bits = np.zeros((self.n_bits + 7) // 8, np.uint8)

    @classmethod
    def build(cls, values, n_items: int | None = None,
              fpp: float = 0.01) -> "BloomFilter":
        v = np.asarray(values)
        m, k = optimal_params(n_items if n_items is not None else len(v), fpp)
        f = cls(m, k)
        f.add(v)
        return f

    def _positions(self, values: np.ndarray) -> np.ndarray:
        h1, h2 = _hash_pair(values)
        i = np.arange(self.k, dtype=np.uint64)[:, None]
        return ((h1[None, :] + i * h2[None, :])
                % np.uint64(self.n_bits)).astype(np.int64)

    def add(self, values) -> "BloomFilter":
        v = np.asarray(values)
        if v.size:
            pos = self._positions(v).ravel()
            np.bitwise_or.at(self.bits, pos >> 3,
                             np.uint8(1) << (pos & 7).astype(np.uint8))
        return self

    def might_contain(self, values) -> np.ndarray:
        """Vectorized probe → bool array (False = DEFINITELY absent)."""
        v = np.asarray(values)
        if v.size == 0:
            return np.zeros(0, bool)
        pos = self._positions(v)
        hit = (self.bits[pos >> 3]
               & (np.uint8(1) << (pos & 7).astype(np.uint8))) != 0
        return hit.all(axis=0)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        assert (self.n_bits, self.k) == (other.n_bits, other.k)
        self.bits |= other.bits
        return self
