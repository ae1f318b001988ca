"""Stream-shaped workloads over the events log (Ray guide: treat the input
as an ordered, partitioned log; windows = groupby(key).map_groups over the
sorted group).  Ray Data has no watermarks; semantics here are batch-exact
(the reference likewise has no streaming semantics, SURVEY.md §2.11).
"""

from __future__ import annotations

import pandas as pd


def sessionize(events, *, gap_minutes: int = 30):
    """→ (user_id, n_sessions, n_events, total_value): session = maximal run
    of a user's events with inter-arrival gaps ≤ gap_minutes.

    Partitioning assumption: all events of one user fit one group (holds for
    keyed user logs; for power users at web scale, pre-split by day first).
    """
    gap = pd.Timedelta(minutes=gap_minutes)

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts")
        new_session = g["ts"].diff().isna() | (g["ts"].diff() > gap)
        return pd.DataFrame(
            {
                "user_id": [g["user_id"].iloc[0]],
                "n_sessions": [int(new_session.sum())],
                "n_events": [len(g)],
                "total_value": [round(float(g["value"].sum()), 4)],
            }
        )

    return events.groupby("user_id").map_groups(per_user, batch_format="pandas")


SESSIONIZE_SQL = """
SELECT user_id,
       CAST(SUM(new_s) AS BIGINT) AS n_sessions,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 4) AS total_value
FROM (
    SELECT user_id, value,
           CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL 30 MINUTE
                THEN 1 ELSE 0 END AS new_s
    FROM (
        SELECT user_id, ts, value,
               LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
        FROM events
    )
)
GROUP BY user_id
"""


def sliding_window_counts(events, *, window_minutes: int = 60, slide_minutes: int = 30):
    """→ (event_type, window_start_epoch, n_events): sliding windows as
    per-row expansion into the ⌈window/slide⌉ windows each event falls in,
    then a grouped count — the standard batch expression of sliding windows."""
    n_windows = (window_minutes + slide_minutes - 1) // slide_minutes
    slide_us = slide_minutes * 60 * 1_000_000
    window_us = window_minutes * 60 * 1_000_000

    import pyarrow as pa
    import pyarrow.compute as pc

    def expand(t: pa.Table) -> pa.Table:
        import numpy as np

        # normalize to microseconds regardless of the column's timestamp unit
        us = pc.cast(
            pc.cast(t["ts"], pa.timestamp("us")), pa.int64()
        ).to_numpy(zero_copy_only=False)
        et = np.asarray(t["event_type"].to_numpy(zero_copy_only=False),
                        dtype=object)
        last = (us // slide_us) * slide_us
        types_parts, starts_parts = [], []
        for w in range(n_windows):  # n_windows = ⌈window/slide⌉, tiny
            start = last - w * slide_us
            keep = (start + window_us > us) & (us >= start)
            types_parts.append(et[keep])
            starts_parts.append(start[keep] // 1_000_000)
        return pa.table(
            {
                "event_type": pa.array(
                    np.concatenate(types_parts), pa.string()
                ),
                "window_start_epoch": pa.array(
                    np.concatenate(starts_parts), pa.int64()
                ),
            }
        )

    from ray.data.aggregate import Count

    return (
        events.map_batches(expand, batch_format="pyarrow")
        .groupby(["event_type", "window_start_epoch"])
        .aggregate(Count(alias_name="n_events"))
    )
