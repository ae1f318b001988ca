"""Stream-shaped ops: sessionization and sliding windows."""

import datetime

import pytest


def _events(rows):
    import ray.data as rd

    return rd.from_items(
        [
            {
                "user_id": u,
                "ts": datetime.datetime(2024, 1, 1) + datetime.timedelta(minutes=m),
                "value": float(v),
                "event_type": et,
            }
            for (u, m, v, et) in rows
        ]
    )


@pytest.mark.usefixtures("ray_session")
def test_sessionize_gap_splits():
    from hamerkop_ray.pipelines.streaming import sessionize

    ev = _events(
        [
            (1, 0, 1, "click"),
            (1, 10, 1, "click"),  # same session (gap 10m)
            (1, 50, 1, "click"),  # new session (gap 40m > 30m)
            (2, 0, 2, "view"),
        ]
    )
    out = {r["user_id"]: r for b in sessionize(ev, gap_minutes=30).iter_batches(batch_format="pyarrow")
           for r in b.to_pylist()}
    assert out[1]["n_sessions"] == 2 and out[1]["n_events"] == 3
    assert out[2]["n_sessions"] == 1
    assert out[1]["total_value"] == 3.0


@pytest.mark.usefixtures("ray_session")
def test_sliding_windows_cover_events():
    from hamerkop_ray.pipelines.streaming import sliding_window_counts

    ev = _events([(1, 0, 1, "click"), (1, 45, 1, "click")])
    out = [
        r
        for b in sliding_window_counts(ev, window_minutes=60, slide_minutes=30).iter_batches(
            batch_format="pyarrow"
        )
        for r in b.to_pylist()
    ]
    # every event appears in window_minutes/slide_minutes = 2 windows
    assert sum(r["n_events"] for r in out) == 4
    # the [00:00] window contains both events (0m and 45m)
    # arrow timestamps are naive-as-UTC; compute the epoch the same way
    base = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc).timestamp()
    by_start = {r["window_start_epoch"]: r["n_events"] for r in out}
    assert by_start[int(base)] == 2
