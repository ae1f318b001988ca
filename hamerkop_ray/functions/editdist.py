"""Batched string-distance kernels: Levenshtein + Jaro-Winkler.

The reference computes editdistance.eval(x, y) in a Python quadruple loop
(resolver.py:306-322).  Here distances for a WHOLE batch of string pairs are
computed in one vectorized call: DuckDB's levenshtein()/jaro_winkler_similarity()
kernels over an Arrow table (zero-copy in, C++ loop inside), with a pure-python
fallback when duckdb is unavailable.  One connection per process, reused.
"""

from __future__ import annotations

import numpy as np

try:
    import duckdb

    _HAS_DUCKDB = True
except ImportError:  # pragma: no cover
    _HAS_DUCKDB = False

class _ConnHolder:
    """Process-local DuckDB connection holder.

    Connections are NOT picklable, and this module can be serialized BY
    VALUE (cloudpickle module registration in __ray_entry__) — a bare
    module-global connection would make every later task/actor shipment
    fail once any driver-side call opened one.  __reduce__ makes the holder
    serialize as an EMPTY holder, so each process lazily opens its own."""

    def __init__(self):
        self.conn = None

    def __reduce__(self):
        return (_ConnHolder, ())


_holder = _ConnHolder()


def _get_conn():
    if _holder.conn is None:
        conn = duckdb.connect(":memory:")
        # one worker = one core: duckdb defaults to a machine-wide thread
        # pool per connection, which oversubscribes the node when dozens of
        # map_batches actors each hold a connection
        conn.execute("SET threads TO 1")
        _holder.conn = conn
    return _holder.conn


def levenshtein_py(a: str, b: str) -> int:
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def deletion_neighborhood(s: str, k: int = 2, max_len: int = 64) -> list[str]:
    """FastSS deletion neighborhood (Bocek et al. 2007): every string
    obtainable from ``s`` by deleting ≤ k characters (including s itself).

    Guaranteed-recall blocking key set for edit distance ≤ k: if
    lev(s, t) ≤ k then D_k(s) ∩ D_k(t) ≠ ∅, so bucketing strings by their
    deletion variants (and verifying candidates exactly) finds EVERY pair —
    unlike LSH, no probabilistic misses.  |D_2(s)| ≈ len(s)²/2 (~170 keys
    for len 18), so at 100-TB scale this multiplies the narrow key shuffle,
    not the payload.  Strings longer than max_len fall back to {s} (exact
    block only) — callers should pre-normalize or raise max_len for long-
    name domains."""
    if len(s) > max_len:
        return [s]
    out = {s}
    frontier = {s}
    for _ in range(k):
        nxt = set()
        for v in frontier:
            for i in range(len(v)):
                nxt.add(v[:i] + v[i + 1:])
        out |= nxt
        frontier = nxt
    return sorted(out)


def levenshtein_batch(a: list[str], b: list[str]) -> np.ndarray:
    """Element-wise Levenshtein distance for two equal-length string lists."""
    if not a:
        return np.zeros(0, dtype=np.int64)
    if _HAS_DUCKDB:
        import pyarrow as pa

        tbl = pa.table({"a": pa.array(a, pa.string()), "b": pa.array(b, pa.string())})
        con = _get_conn()
        con.register("_lev_pairs", tbl)
        out = con.execute(
            "SELECT levenshtein(a, b) AS d FROM _lev_pairs"
        ).fetch_arrow_table()
        con.unregister("_lev_pairs")
        return out.column("d").to_numpy()
    return np.array([levenshtein_py(x, y) for x, y in zip(a, b)], dtype=np.int64)


def normalized_levenshtein_batch(a: list[str], b: list[str]) -> np.ndarray:
    """editdistance / max(len) — the reference's normalization
    (resolver.py:317, features.py:191-204)."""
    d = levenshtein_batch(a, b).astype(np.float64)
    denom = np.maximum(
        np.array([len(x) for x in a]), np.array([len(y) for y in b])
    ).astype(np.float64)
    denom[denom == 0] = 1.0
    return d / denom


def jaro_winkler_py(a: str, b: str) -> float:  # fallback; standard definition
    if a == b:
        return 1.0
    la, lb = len(a), len(b)
    if not la or not lb:
        return 0.0
    window = max(la, lb) // 2 - 1
    fa = [False] * la
    fb = [False] * lb
    matches = 0
    for i in range(la):
        lo, hi = max(0, i - window), min(lb, i + window + 1)
        for j in range(lo, hi):
            if not fb[j] and a[i] == b[j]:
                fa[i] = fb[j] = True
                matches += 1
                break
    if not matches:
        return 0.0
    t = 0
    k = 0
    for i in range(la):
        if fa[i]:
            while not fb[k]:
                k += 1
            if a[i] != b[k]:
                t += 1
            k += 1
    t //= 2
    jaro = (matches / la + matches / lb + (matches - t) / matches) / 3
    prefix = 0
    for i in range(min(4, la, lb)):
        if a[i] == b[i]:
            prefix += 1
        else:
            break
    return jaro + prefix * 0.1 * (1 - jaro)


def jaro_winkler_batch(a: list[str], b: list[str]) -> np.ndarray:
    """Element-wise Jaro-Winkler similarity in [0, 1]."""
    if not a:
        return np.zeros(0, dtype=np.float64)
    if _HAS_DUCKDB:
        import pyarrow as pa

        tbl = pa.table({"a": pa.array(a, pa.string()), "b": pa.array(b, pa.string())})
        con = _get_conn()
        con.register("_jw_pairs", tbl)
        out = con.execute(
            "SELECT jaro_winkler_similarity(a, b) AS s FROM _jw_pairs"
        ).fetch_arrow_table()
        con.unregister("_jw_pairs")
        return out.column("s").to_numpy()
    return np.array([jaro_winkler_py(x, y) for x, y in zip(a, b)], dtype=np.float64)
