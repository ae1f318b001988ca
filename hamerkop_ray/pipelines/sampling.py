"""Deterministic sampling operators — reproducible across engines, runs,
partitionings and cluster sizes (a training-data-pipeline staple: corpus
subsampling, eval-split carving, per-language balancing).

Determinism comes from hashing a stable key column with MD5 (not python
hash() — process-seeded — and not RNG state — partitioning-dependent), so
a DuckDB oracle reproduces the exact row set:

  hash_sample        keep rows whose md5(key) prefix, read as a hex
                     fraction, falls below `frac` — a pure per-batch
                     filter: embarrassingly parallel, no shuffle, no
                     coordination, stable under repartitioning.
  stratified_sample  EXACTLY n rows per group, chosen as the n smallest
                     (md5(key), key) per group — per-batch partial top-n
                     then one tiny merge over ≤ n×G×blocks candidate rows
                     (the same exact-combiner shape as text.top_tokens);
                     the full table never shuffles.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_HEX_DIGITS = 8
_HEX_SPACE = 16 ** _HEX_DIGITS


def _threshold_hex(frac: float) -> str:
    """The largest 8-hex-digit string strictly below which md5 prefixes are
    kept to sample ~frac of the key space.  Computed ONCE and injected into
    both the Ray filter and the SQL oracle, so float rounding cannot
    diverge between the two sides."""
    t = min(max(int(frac * _HEX_SPACE), 0), _HEX_SPACE)
    return format(t, f"0{_HEX_DIGITS}x")


def _md5_prefixes(keys) -> np.ndarray:
    return np.array(
        [hashlib.md5(str(k).encode()).hexdigest()[:_HEX_DIGITS] for k in keys],
        dtype=object,
    )


def hash_sample(ds, frac: float, key_col: str):
    """→ the input Dataset filtered to rows with
    md5(str(key))[:8] < threshold(frac).  Deterministic, partition-
    independent, zero-shuffle."""
    thr = _threshold_hex(frac)

    def keep(t: pa.Table) -> pa.Table:
        pref = _md5_prefixes(t[key_col].to_pylist())
        return t.filter(pa.array(pref < thr))

    return ds.map_batches(keep, batch_format="pyarrow")


def hash_sample_sql(table: str, key_col: str, frac: float,
                    select: str = "*") -> str:
    thr = _threshold_hex(frac)
    return (
        f"SELECT {select} FROM {table} "
        f"WHERE substr(md5(CAST({key_col} AS VARCHAR)), 1, {_HEX_DIGITS})"
        f" < '{thr}'"
    )


def stratified_sample(ds, n_per_group: int, group_col: str, key_col: str):
    """→ Dataset (group_col, key_col): EXACTLY min(n, group size) rows per
    group — the n smallest (md5(str(key)), key) of each group.

    Scale shape: each batch keeps at most n candidates per group it sees
    (vectorized lexsort + stable slice), then ONE merge task picks the
    global n per group from ≤ n × groups × blocks candidate rows — correct
    because a row in the global per-group top-n is necessarily in its
    batch's per-group top-n.  group_col must be coarse (the candidate set
    is n×G-bounded)."""
    import ray.data as rd

    def partial(t: pa.Table) -> pa.Table:
        groups = np.asarray(t[group_col].to_pylist(), dtype=object)
        keys = t[key_col].to_pylist()
        pref = _md5_prefixes(keys)
        keys_arr = np.asarray(keys, dtype=object)
        order = np.lexsort((keys_arr, pref, groups))
        g_sorted = groups[order]
        # rank within group on the (group, hash, key)-sorted order
        new_grp = np.concatenate(([True], g_sorted[1:] != g_sorted[:-1]))
        grp_id = np.cumsum(new_grp) - 1
        starts = np.flatnonzero(new_grp)
        rank = np.arange(len(order)) - starts[grp_id]
        keep = order[rank < n_per_group]
        return pa.table(
            {group_col: pa.array(groups[keep].tolist()),
             key_col: t[key_col].take(pa.array(keep, pa.int64())),
             "_h": pa.array(pref[keep].tolist(), pa.string())}
        )

    cand = pa.concat_tables(
        b for b in ds.map_batches(partial, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    )
    if cand.num_rows == 0:
        return rd.from_arrow(cand.drop_columns(["_h"]))
    groups = np.asarray(cand[group_col].to_pylist(), dtype=object)
    keys_arr = np.asarray(cand[key_col].to_pylist(), dtype=object)
    pref = np.asarray(cand["_h"].to_pylist(), dtype=object)
    order = np.lexsort((keys_arr, pref, groups))
    g_sorted = groups[order]
    new_grp = np.concatenate(([True], g_sorted[1:] != g_sorted[:-1]))
    grp_id = np.cumsum(new_grp) - 1
    starts = np.flatnonzero(new_grp)
    rank = np.arange(len(order)) - starts[grp_id]
    keep = order[rank < n_per_group]
    out = cand.take(pa.array(np.sort(keep), pa.int64())).drop_columns(["_h"])
    return rd.from_arrow(out)


def mixture_sample(ds, total: int, group_col: str, key_col: str):
    """→ Dataset (group_col, key_col): a temperature-balanced training
    mixture — per-group quotas n_g = total * isqrt(count_g) // Σ isqrt
    (the classic sqrt/temperature reweighting that upsamples small
    languages relative to proportional sampling), filled deterministically
    with each group's n_g smallest (md5(key), key) rows.

    All quota arithmetic is INTEGER (isqrt + floor-div), so a SQL oracle
    reproduces the exact row set with no float-sum order sensitivity.

    Scale shape: pass 1 is a group-cardinality groupby (tiny: one row per
    group); pass 2 reuses the stratified per-batch partial top-n + one
    n×G-bounded merge — the corpus never shuffles."""
    import math

    import ray.data as rd
    from ray.data.aggregate import Count

    counts = {
        r[group_col]: r["count()"]
        for b in ds.groupby(group_col).aggregate(Count())
        .iter_batches(batch_format="pyarrow")
        for r in b.to_pylist()
    }
    weights = {g: math.isqrt(int(c)) for g, c in counts.items()}
    s = sum(weights.values())
    if s == 0:
        return rd.from_items([])
    quota = {g: (total * w) // s for g, w in weights.items()}
    n_max = max(quota.values())

    def partial(t: pa.Table) -> pa.Table:
        groups = np.asarray(t[group_col].to_pylist(), dtype=object)
        keys = t[key_col].to_pylist()
        pref = _md5_prefixes(keys)
        keys_arr = np.asarray(keys, dtype=object)
        order = np.lexsort((keys_arr, pref, groups))
        g_sorted = groups[order]
        new_grp = np.concatenate(([True], g_sorted[1:] != g_sorted[:-1]))
        grp_id = np.cumsum(new_grp) - 1
        starts = np.flatnonzero(new_grp)
        rank = np.arange(len(order)) - starts[grp_id]
        # keep the max quota per group in the partial (superset of every
        # group's global top-n_g)
        keep = order[rank < n_max]
        return pa.table(
            {group_col: pa.array(groups[keep].tolist()),
             key_col: t[key_col].take(pa.array(keep, pa.int64())),
             "_h": pa.array(pref[keep].tolist(), pa.string())}
        )

    cand = pa.concat_tables(
        b for b in ds.map_batches(partial, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    )
    if cand.num_rows == 0:
        return rd.from_arrow(cand.drop_columns(["_h"]))
    groups = np.asarray(cand[group_col].to_pylist(), dtype=object)
    keys_arr = np.asarray(cand[key_col].to_pylist(), dtype=object)
    pref = np.asarray(cand["_h"].to_pylist(), dtype=object)
    order = np.lexsort((keys_arr, pref, groups))
    g_sorted = groups[order]
    new_grp = np.concatenate(([True], g_sorted[1:] != g_sorted[:-1]))
    grp_id = np.cumsum(new_grp) - 1
    starts = np.flatnonzero(new_grp)
    rank = np.arange(len(order)) - starts[grp_id]
    quotas = np.asarray([quota.get(g, 0) for g in g_sorted])
    keep = order[rank < quotas]
    out = cand.take(pa.array(np.sort(keep), pa.int64())).drop_columns(["_h"])
    return rd.from_arrow(out)


def mixture_sample_sql(table: str, group_col: str, key_col: str,
                       total: int) -> str:
    return f"""
WITH cnt AS (
    SELECT {group_col}, COUNT(*) AS c FROM {table} GROUP BY {group_col}
), w AS (
    SELECT {group_col}, CAST(floor(sqrt(c)) AS BIGINT) AS w FROM cnt
), tgt AS (
    SELECT {group_col},
           ({total} * w) // (SELECT SUM(w) FROM w) AS n_g
    FROM w
), ranked AS (
    SELECT {group_col}, {key_col},
           ROW_NUMBER() OVER (
               PARTITION BY {group_col}
               ORDER BY substr(md5(CAST({key_col} AS VARCHAR)), 1,
                               {_HEX_DIGITS}), {key_col}
           ) AS rn
    FROM {table}
)
SELECT r.{group_col}, r.{key_col}
FROM ranked r JOIN tgt USING ({group_col})
WHERE r.rn <= tgt.n_g
"""


def stratified_sample_sql(table: str, group_col: str, key_col: str,
                          n_per_group: int) -> str:
    return f"""
        SELECT {group_col}, {key_col} FROM (
            SELECT {group_col}, {key_col},
                   ROW_NUMBER() OVER (
                       PARTITION BY {group_col}
                       ORDER BY substr(md5(CAST({key_col} AS VARCHAR)), 1,
                                       {_HEX_DIGITS}), {key_col}
                   ) AS rn
            FROM {table}
        ) WHERE rn <= {n_per_group}
    """
