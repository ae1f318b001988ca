"""HyperLogLog distinct-count sketch (Flajolet, Fusy, Gandouet, Meunier
2007), vectorized with numpy.

Registers are a dense uint8 array of size 2**p (16 KiB at the default
p=14, ~0.8% standard error).  Hashing uses pandas.util.hash_array — a
fixed-key SipHash, deterministic across processes and partitionings, so
the merged sketch (elementwise register max) and hence the estimate are
EXACTLY reproducible no matter how the data is partitioned: the natural
fit for Ray's partial-aggregate pattern (per-batch registers stream
driver-ward or merge in a groupby; the raw column never shuffles).

Small-range correction is linear counting; no large-range correction is
needed with a 64-bit hash.
"""

from __future__ import annotations

import numpy as np

_DEF_P = 14


def _hash64(values: np.ndarray) -> np.ndarray:
    import pandas as pd

    return pd.util.hash_array(values, categorize=False).astype(np.uint64)


def _clz64(x: np.ndarray) -> np.ndarray:
    """Vectorized count-leading-zeros over uint64 (x == 0 → 64)."""
    n = np.zeros(x.shape, np.int64)
    zero = x == 0
    x = x.copy()
    for s in (32, 16, 8, 4, 2, 1):
        m = x < (np.uint64(1) << np.uint64(64 - s))
        n[m] += s
        x[m] <<= np.uint64(s)
    n[zero] = 64
    return n


def empty_registers(p: int = _DEF_P) -> np.ndarray:
    return np.zeros(1 << p, np.uint8)


def add_values(reg: np.ndarray, values, p: int = _DEF_P) -> np.ndarray:
    """Fold a value array into the register set (in place; returns reg)."""
    v = np.asarray(values)
    if v.size == 0:
        return reg
    h = _hash64(v)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    w = h << np.uint64(p)
    rank = np.minimum(_clz64(w) + 1, 64 - p + 1).astype(np.uint8)
    np.maximum.at(reg, idx, rank)
    return reg


def merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def estimate(reg: np.ndarray) -> int:
    m = float(len(reg))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    e = alpha * m * m / np.sum(np.exp2(-reg.astype(np.float64)))
    if e <= 2.5 * m:
        zeros = int(np.count_nonzero(reg == 0))
        if zeros:
            e = m * np.log(m / zeros)
    return int(round(e))
