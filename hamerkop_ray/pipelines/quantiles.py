"""Exact distributed quantiles (k-th order statistics) by iterative
histogram refinement — no global sort, no full materialization.

The classic distributed selection algorithm (Blum et al. selection bounds;
the histogram-refinement form is the textbook external/parallel variant):

  pass 0   count / min / max — one narrow aggregate scan.
  pass i   ONE map_batches scan computes, for every still-unresolved
           quantile interval [lo, hi], a fixed-B-bin histogram of the
           column restricted to that interval.  Partials are (interval,
           bin, count) rows, streamed to the driver and summed into a
           B-array per interval (driver state = B × #quantiles ints —
           constant, not data-sized).  The bin containing the target rank
           becomes the next interval; ranks below it fold into a running
           `below` offset.
  final    all resolved intervals holding ≤ collect_threshold candidate
           values are collected in ONE filter scan; each quantile picks
           its exact order statistic from the sorted candidates.

Each pass shrinks the candidate range ~B×, so real data resolves in 1-2
passes; a mass point (millions of identical values) is caught by the
width-collapse rule (bin edges within one ulp ⇒ every candidate equals
lo ⇒ answer is lo) rather than looping.

The k convention matches DuckDB/Postgres quantile_disc: 0-based index
ceil(q·n)−1, verified empirically against DuckDB for the oracle compare.

Scale notes: every pass reads ONLY the target column (projection pushdown
at the read is the caller's job — see __ray_entry__'s usage); the shuffle
volume is zero (histogram partials stream driver-ward, bounded by
blocks × nonzero-bins); repeated scans re-execute the upstream pipeline,
so pass a re-readable source (a parquet read, not an exhausted iterator).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa


def _k_for(q: float, n: int) -> int:
    """0-based order-statistic index for quantile q of n values
    (DuckDB quantile_disc convention: ceil(q·n) − 1, clamped)."""
    return min(max(int(math.ceil(q * n)) - 1, 0), n - 1)


def exact_quantiles(
    ds,
    col: str,
    qs: list[float],
    *,
    bins: int = 4096,
    collect_threshold: int = 65536,
    max_passes: int = 12,
):
    """→ pyarrow Table (q float64, value float64): the exact quantile_disc
    values of `ds[col]` for each q — each value is an actual element of the
    column (the ceil(q·n)−1-th smallest)."""
    from ray.data.aggregate import Count, Max, Min

    stats = ds.aggregate(Count(col, alias_name="n"), Min(col), Max(col))
    n = int(stats["n"])
    if n == 0:
        return pa.table(
            {"q": pa.array([], pa.float64()), "value": pa.array([], pa.float64())}
        )
    vmin = float(stats[f"min({col})"])
    vmax = float(stats[f"max({col})"])

    # state per quantile: (lo, hi) candidate range (inclusive both ends),
    # below = count of values < lo, k = global target index, in_range =
    # candidate count inside [lo, hi] (n before the first pass)
    state = [
        {"q": q, "k": _k_for(q, n), "lo": vmin, "hi": vmax, "below": 0,
         "in_range": n, "value": None}
        for q in qs
    ]

    def _histogram_pass(intervals: list[tuple[int, float, float]]):
        """ONE scan: per interval (id, lo, hi) a B-bin histogram of values in
        [lo, hi].  Bins are the linspace(lo, hi, B+1) edges — bin j =
        [edges[j], edges[j+1]) with the last bin inclusive — binned by
        searchsorted on the SAME edges the driver refines with, so the bin
        boundaries and the next interval agree float-exactly (a mass point
        collapses its bin's edges onto itself and resolves via the lo==hi
        rule instead of looping)."""
        ivals = [
            (i, lo, hi, np.linspace(lo, hi, bins + 1)) for i, lo, hi in intervals
        ]

        def hist_batch(t: pa.Table) -> pa.Table:
            v = np.asarray(t[col].to_numpy(zero_copy_only=False),
                           dtype=np.float64)
            out_iv, out_bin, out_cnt = [], [], []
            for iid, lo, hi, edges in ivals:
                inr = v[(v >= lo) & (v <= hi)]
                if inr.size == 0:
                    continue
                idx = np.clip(
                    np.searchsorted(edges, inr, side="right") - 1, 0, bins - 1
                )
                counts = np.bincount(idx, minlength=bins)
                nz = np.flatnonzero(counts)
                out_iv.append(np.full(nz.size, iid, dtype=np.int64))
                out_bin.append(nz)
                out_cnt.append(counts[nz])
            if not out_iv:
                return pa.table(
                    {"iv": pa.array([], pa.int64()),
                     "bin": pa.array([], pa.int64()),
                     "cnt": pa.array([], pa.int64())}
                )
            return pa.table(
                {"iv": pa.array(np.concatenate(out_iv), pa.int64()),
                 "bin": pa.array(np.concatenate(out_bin), pa.int64()),
                 "cnt": pa.array(np.concatenate(out_cnt), pa.int64())}
            )

        acc = {iv[0]: np.zeros(bins, dtype=np.int64) for iv in ivals}
        partials = ds.map_batches(hist_batch, batch_format="pyarrow")
        for b in partials.iter_batches(batch_format="pyarrow"):
            iv = b["iv"].to_numpy()
            bn = b["bin"].to_numpy()
            ct = b["cnt"].to_numpy()
            for i in acc:
                m = iv == i
                if m.any():
                    np.add.at(acc[i], bn[m], ct[m])
        return acc

    for _ in range(max_passes):
        for s in state:
            # range collapsed to one float — that float IS the answer
            if s["value"] is None and s["lo"] == s["hi"]:
                s["value"] = s["lo"]
        open_ = [
            s for s in state
            if s["value"] is None and s["in_range"] > collect_threshold
        ]
        if not open_:
            break
        intervals = [(i, s["lo"], s["hi"]) for i, s in enumerate(state)
                     if s in open_]
        hists = _histogram_pass(intervals)
        for i, s in enumerate(state):
            if s not in open_:
                continue
            h = hists[i]
            cum = np.cumsum(h)
            # target rank within [lo, hi]
            r = s["k"] - s["below"]
            j = int(np.searchsorted(cum, r + 1))
            edges = np.linspace(s["lo"], s["hi"], bins + 1)
            s["below"] += int(cum[j - 1]) if j > 0 else 0
            s["in_range"] = int(h[j])
            s["lo"], s["hi"] = float(edges[j]), float(edges[j + 1])
    for s in state:
        if s["value"] is None and s["lo"] == s["hi"]:
            s["value"] = s["lo"]

    # final: collect candidates for all unresolved quantiles in ONE scan
    todo = [s for s in state if s["value"] is None]
    if todo:
        ranges = [(i, s["lo"], s["hi"]) for i, s in enumerate(state)
                  if s in todo]

        def collect_batch(t: pa.Table) -> pa.Table:
            v = np.asarray(t[col].to_numpy(zero_copy_only=False),
                           dtype=np.float64)
            out_iv, out_v = [], []
            for iid, lo, hi in ranges:
                inr = v[(v >= lo) & (v <= hi)]
                if inr.size:
                    out_iv.append(np.full(inr.size, iid, dtype=np.int64))
                    out_v.append(inr)
            if not out_iv:
                return pa.table(
                    {"iv": pa.array([], pa.int64()),
                     "v": pa.array([], pa.float64())}
                )
            return pa.table(
                {"iv": pa.array(np.concatenate(out_iv), pa.int64()),
                 "v": pa.array(np.concatenate(out_v), pa.float64())}
            )

        gathered: dict[int, list[np.ndarray]] = {i: [] for i, _, _ in ranges}
        for b in ds.map_batches(collect_batch, batch_format="pyarrow") \
                   .iter_batches(batch_format="pyarrow"):
            iv = b["iv"].to_numpy()
            vv = b["v"].to_numpy()
            for i in gathered:
                m = iv == i
                if m.any():
                    gathered[i].append(vv[m])
        for i, s in enumerate(state):
            if s not in todo:
                continue
            vals = (np.sort(np.concatenate(gathered[i]))
                    if gathered[i] else np.array([], dtype=np.float64))
            if vals.size == 0:
                s["value"] = s["lo"]  # defensive: can't happen with n > 0
                continue
            r = s["k"] - s["below"]
            if r < 0 or r >= vals.size:
                # numeric-edge fallback: clamp into the collected range
                r = min(max(r, 0), vals.size - 1)
            s["value"] = float(vals[r])

    return pa.table(
        {"q": pa.array([s["q"] for s in state], pa.float64()),
         "value": pa.array([s["value"] for s in state], pa.float64())}
    )


def quantiles_sql(table: str, col: str, qs: list[float]) -> str:
    # DuckDB requires the quantile parameter to be a constant — one
    # constant-q aggregate per requested quantile, unioned
    parts = [
        f"SELECT CAST({q!r} AS DOUBLE) AS q, "
        f"CAST(quantile_disc({col}, {q!r}) AS DOUBLE) AS value FROM {table}"
        for q in qs
    ]
    return "\nUNION ALL\n".join(parts)
