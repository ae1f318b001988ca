"""Temporal operators Ray Data lacks natively: as-of join and per-key
window functions (lag / row_number / running aggregate).

Both are expressed as ONE co-partitioning shuffle (narrow columns only)
followed by a vectorized per-group kernel — the composition-(a) pattern
from the brief (map_batches + groupby().map_groups + in-group numpy),
mirroring how the reference's per-document loops become batch dataflow
(cf. /root/reference/hamerkop/pipeline.py:117-165's sequential pass).

Partitioning assumption (documented, same as streaming.sessionize): all
rows of one key fit one group.  For web-scale hot keys, pre-split the key
by coarse time range and replicate the last right-side row of each range
into the next (boundary carry) — the standard distributed as-of refinement;
the group kernel is unchanged.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _ts_us(arr: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Normalize any timestamp unit (or integer epoch) to int64 microseconds."""
    t = arr.type
    if pa.types.is_timestamp(t):
        return pc.cast(pc.cast(arr, pa.timestamp("us")), pa.int64())
    return pc.cast(arr, pa.int64())


def asof_join(
    left,
    right,
    *,
    key: str,
    right_key: str | None = None,
    left_on: str,
    right_on: str,
    tie_col: str,
    left_cols: list[str],
    right_cols: list[str],
):
    """Backward as-of join: for every left row, the single right row with the
    same key and the greatest right_on ≤ left_on (ties on right_on broken by
    the greatest tie_col — fully deterministic).  Left rows with no earlier
    right row are dropped (inner as-of).

    → Dataset with columns: key, left_cols…, `left_on`_us, right_cols…,
    `right_on`_us (timestamps as int64 epoch-microseconds: unit-stable
    across engines).

    Scale shape: both sides project to narrow columns, union into one
    dataset (sides aligned by null-padding, an int8 side tag), and ONE
    hash-partitioned groupby co-locates each key's rows; the per-group
    kernel is a numpy searchsorted over the sorted right side — no
    quadratic work, no driver materialization.  Hot keys: pre-split by
    time range with boundary carry (module docstring).

    Column-type contract (v1): key / left_cols / tie_col are integral,
    right_cols are cast to float64 — the null-padded union needs concrete
    types for the absent side."""
    right_key = right_key or key

    lcols = [c for c in left_cols if c != key]
    rcols = [c for c in right_cols if c != right_key and c != tie_col]
    # schema for the aligned union: key, t, tie, side, then payloads
    lpay = {c: None for c in lcols}
    rpay = {c: None for c in rcols}

    def left_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = {
            "k": pc.cast(t[key], pa.int64()),
            "t": _ts_us(t[left_on]),
            "tie": pa.nulls(n, pa.int64()),
            "side": pa.array(np.ones(n, dtype=np.int8)),
        }
        for c in lcols:
            cols[f"l_{c}"] = t[c]
        for c in rcols:
            cols[f"r_{c}"] = pa.nulls(n, pa.float64())
        cols["r__tie"] = pa.nulls(n, pa.int64())
        cols["r__t"] = pa.nulls(n, pa.int64())
        return pa.table(cols)

    def right_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = {
            "k": pc.cast(t[right_key], pa.int64()),
            "t": _ts_us(t[right_on]),
            "tie": pc.cast(t[tie_col], pa.int64()),
            "side": pa.array(np.zeros(n, dtype=np.int8)),
        }
        for c in lcols:
            cols[f"l_{c}"] = pa.nulls(n, pa.int64())
        for c in rcols:
            cols[f"r_{c}"] = pc.cast(t[c], pa.float64())
        cols["r__tie"] = pc.cast(t[tie_col], pa.int64())
        cols["r__t"] = _ts_us(t[right_on])
        return pa.table(cols)

    lds = left.map_batches(left_rows, batch_format="pyarrow")
    rds = right.map_batches(right_rows, batch_format="pyarrow")
    both = lds.union(rds)

    empty_cols: dict[str, pd.Series] = {key: pd.Series([], dtype="int64")}
    for c in lcols:
        empty_cols[c] = pd.Series([], dtype="int64")
    empty_cols[f"{left_on}_us"] = pd.Series([], dtype="int64")
    for c in rcols:
        empty_cols[c] = pd.Series([], dtype="float64")
    empty_cols[tie_col] = pd.Series([], dtype="int64")
    empty_cols[f"{right_on}_us"] = pd.Series([], dtype="int64")
    _EMPTY = pd.DataFrame(empty_cols)

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        is_left = g["side"].to_numpy() == 1
        lg = g[is_left]
        rg = g[~is_left]
        if len(lg) == 0 or len(rg) == 0:
            return _EMPTY
        rg = rg.sort_values(["t", "tie"], kind="mergesort")
        rt = rg["t"].to_numpy(dtype=np.int64)
        lt = lg["t"].to_numpy(dtype=np.int64)
        idx = np.searchsorted(rt, lt, side="right") - 1
        hit = idx >= 0
        if not hit.any():
            return _EMPTY
        lg = lg[hit]
        take = idx[hit]
        # null-padded union columns surface as float64/object in the pandas
        # group frame; the selected rows are null-free, so cast back to the
        # contract dtypes explicitly
        out = {key: lg["k"].to_numpy(dtype=np.int64)}
        for c in lcols:
            out[c] = lg[f"l_{c}"].to_numpy(dtype=np.int64)
        out[f"{left_on}_us"] = lg["t"].to_numpy(dtype=np.int64)
        for c in rcols:
            out[c] = rg[f"r_{c}"].to_numpy(dtype=np.float64)[take]
        out[tie_col] = rg["r__tie"].to_numpy(dtype=np.int64)[take]
        out[f"{right_on}_us"] = rg["r__t"].to_numpy(dtype=np.int64)[take]
        return pd.DataFrame(out)

    return both.groupby("k").map_groups(per_key, batch_format="pandas")


EVENTS_ASOF_ORDERS_SQL = """
SELECT user_id, event_id, epoch_us(ts) AS ts_us,
       o_totalprice, o_orderkey, epoch_us(o_orderdate) AS o_orderdate_us
FROM (
    SELECT e.user_id, e.event_id, e.ts, o.o_totalprice, o.o_orderkey,
           o.o_orderdate,
           ROW_NUMBER() OVER (
               PARTITION BY e.event_id
               ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
           ) AS rn
    FROM events e
    JOIN orders o
      ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
)
WHERE rn = 1
"""


def range_join(
    left,
    right,
    *,
    key: str,
    right_key: str,
    left_on: str,
    right_on: str,
    left_id: str,
    right_id: str,
    lo_us: int,
    hi_us: int,
):
    """Equi-key + time-range join (the brief's 'range join' custom
    operator): every (left, right) pair with the same key and
    right_on ∈ [left_on + lo_us, left_on + hi_us] (inclusive both ends,
    microsecond epochs — matching SQL BETWEEN).

    → (key, left_id, `left_on`_us, right_id, `right_on`_us).

    Scale shape: same ONE narrow co-partitioning shuffle as asof_join
    (null-padded union of both sides, int8 side tag); the per-group
    kernel is two numpy searchsorteds over the time-sorted right side
    plus a vectorized interval expansion (repeat + offset arithmetic) —
    output-linear work, never quadratic in the group.  Window width
    bounds the fan-out; hot keys pre-split by time range with boundary
    carry as for asof_join."""

    def left_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {"k": pc.cast(t[key], pa.int64()),
             "t": _ts_us(t[left_on]),
             "rid": pa.nulls(n, pa.int64()),
             "side": pa.array(np.ones(n, dtype=np.int8)),
             "lid": pc.cast(t[left_id], pa.int64())}
        )

    def right_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {"k": pc.cast(t[right_key], pa.int64()),
             "t": _ts_us(t[right_on]),
             "rid": pc.cast(t[right_id], pa.int64()),
             "side": pa.array(np.zeros(n, dtype=np.int8)),
             "lid": pa.nulls(n, pa.int64())}
        )

    both = left.map_batches(left_rows, batch_format="pyarrow").union(
        right.map_batches(right_rows, batch_format="pyarrow"))

    _EMPTY = pd.DataFrame(
        {key: pd.Series([], dtype="int64"),
         left_id: pd.Series([], dtype="int64"),
         f"{left_on}_us": pd.Series([], dtype="int64"),
         right_id: pd.Series([], dtype="int64"),
         f"{right_on}_us": pd.Series([], dtype="int64")}
    )

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        is_left = g["side"].to_numpy() == 1
        lg = g[is_left]
        rg = g[~is_left]
        if len(lg) == 0 or len(rg) == 0:
            return _EMPTY
        rg = rg.sort_values(["t", "rid"], kind="mergesort")
        rt = rg["t"].to_numpy(dtype=np.int64)
        lt = lg["t"].to_numpy(dtype=np.int64)
        lo_idx = np.searchsorted(rt, lt + lo_us, side="left")
        hi_idx = np.searchsorted(rt, lt + hi_us, side="right")
        cnt = hi_idx - lo_idx
        keep = np.flatnonzero(cnt > 0)
        if len(keep) == 0:
            return _EMPTY
        kc = cnt[keep]
        l_rep = np.repeat(keep, kc)
        ends = np.cumsum(kc)
        pos = np.arange(ends[-1]) - np.repeat(ends - kc, kc)
        r_idx = np.repeat(lo_idx[keep], kc) + pos
        return pd.DataFrame(
            {key: lg["k"].to_numpy(dtype=np.int64)[l_rep],
             left_id: lg["lid"].to_numpy(dtype=np.int64)[l_rep],
             f"{left_on}_us": lt[l_rep],
             right_id: rg["rid"].to_numpy(dtype=np.int64)[r_idx],
             f"{right_on}_us": rt[r_idx]}
        )

    return both.groupby("k").map_groups(per_key, batch_format="pandas")


def window_lag_running(events):
    """Per-key window functions over the events log: for each user ordered by
    (ts, event_id) — seq = row_number, prev_value = lag(value) with 0.0 for
    the first row, running_value = running sum of value (both rounded to 4
    decimals; the running sum is a strictly sequential left fold, so the
    float result is order-deterministic).

    → (event_id, user_id, seq, prev_value, running_value).

    One narrow co-partitioning shuffle (user_id, ts, event_id, value), then
    a vectorized sort + shift + cumsum per group."""

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        v = g["value"].to_numpy(dtype=np.float64)
        prev = np.concatenate(([0.0], v[:-1]))
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(),
                "user_id": g["user_id"].to_numpy(),
                "seq": np.arange(1, len(g) + 1, dtype=np.int64),
                "prev_value": np.round(prev, 4),
                "running_value": np.round(np.cumsum(v), 4),
            }
        )

    return events.groupby("user_id").map_groups(per_user, batch_format="pandas")


WINDOW_LAG_RUNNING_SQL = """
SELECT event_id, user_id,
       ROW_NUMBER() OVER w AS seq,
       ROUND(COALESCE(LAG(value) OVER w, 0.0), 4) AS prev_value,
       ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING), 4) AS running_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def window_rank_moving(events, ma_window: int = 5):
    """Rank-family window functions + moving average per user, ordered by
    (ts, event_id): value_rank = RANK() by value descending within the
    user (ties share a rank, gaps after), ntile4 = NTILE(4) in time order,
    moving_avg = mean of the last `ma_window` values up to and including
    the current row (ROWS ma_window-1 PRECEDING), rounded to 4 decimals.

    → (event_id, user_id, value_rank, ntile4, moving_avg).

    Same scale shape as window_lag_running: ONE narrow co-partitioning
    shuffle, vectorized numpy per group (rank via double argsort on the
    (-value, ts, event_id) order; moving average via cumsum differences)."""

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        n = len(g)
        v = g["value"].to_numpy(dtype=np.float64)
        # RANK() OVER (ORDER BY value DESC): competition ranking with gaps
        order = np.lexsort((np.arange(n), -v))  # value desc, stable
        sorted_v = v[order]
        first_of_run = np.r_[True, sorted_v[1:] != sorted_v[:-1]]
        run_start_pos = np.maximum.accumulate(
            np.where(first_of_run, np.arange(n), 0))
        rank_sorted = run_start_pos + 1
        rank = np.empty(n, np.int64)
        rank[order] = rank_sorted
        # NTILE(4) over time order: first (n % 4) tiles get the extra row
        q, r = divmod(n, 4)
        sizes = np.full(4, q, np.int64)
        sizes[:r] += 1
        ntile = np.repeat(np.arange(1, 5, dtype=np.int64), sizes)[:n]
        # moving average over the trailing ma_window rows
        c = np.concatenate(([0.0], np.cumsum(v)))
        lo = np.maximum(0, np.arange(1, n + 1) - ma_window)
        ma = (c[1:] - c[lo]) / (np.arange(1, n + 1) - lo)
        return pd.DataFrame(
            {"event_id": g["event_id"].to_numpy(),
             "user_id": g["user_id"].to_numpy(),
             "value_rank": rank,
             "ntile4": ntile,
             "moving_avg": np.round(ma, 4)}
        )

    return events.groupby("user_id").map_groups(per_user, batch_format="pandas")


WINDOW_RANK_MOVING_SQL = """
SELECT event_id, user_id,
       RANK() OVER (PARTITION BY user_id ORDER BY value DESC) AS value_rank,
       NTILE(4) OVER w AS ntile4,
       ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS 4 PRECEDING), 4) AS moving_avg
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""
