"""Sketch-based approximate aggregates — the cardinality side of the
100-TB toolbox, where exact COUNT(DISTINCT) would be a whole-column
shuffle.

hll_distinct          global distinct count: per-batch 16 KiB register
                      partials stream driver-ward (the raw column never
                      shuffles), merged by elementwise max.  ONE scan at
                      any scale; deterministic across partitionings
                      (fixed-key SipHash + max-merge are order- and
                      partition-independent).
HllDistinct           the same sketch as a Ray groupby AggregateFn for
                      per-group cardinalities (state = register bytes).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import hll


def _column_values(t: pa.Table, col: str) -> np.ndarray:
    arr = t[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return arr.to_numpy(zero_copy_only=False)


def hll_distinct(ds, col: str, p: int = 14) -> int:
    """EXACTLY-reproducible approximate distinct count of `col`."""

    def partial(t: pa.Table) -> pa.Table:
        reg = hll.empty_registers(p)
        if t.num_rows:
            hll.add_values(reg, _column_values(t, col), p)
        return pa.table({"reg": pa.array([reg.tobytes()], pa.binary())})

    reg = hll.empty_registers(p)
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for raw in b["reg"].to_pylist():
            reg = hll.merge(reg, np.frombuffer(raw, np.uint8))
    return hll.estimate(reg)


def HllDistinct(col: str, p: int = 14, alias_name: str | None = None):
    """Ray AggregateFn: per-group HLL distinct count of `col`."""
    from ray.data.aggregate import AggregateFn

    def accumulate(state: bytes, block: pa.Table) -> bytes:
        reg = np.frombuffer(state, np.uint8).copy()
        if block.num_rows:
            hll.add_values(reg, _column_values(block, col), p)
        return reg.tobytes()

    return AggregateFn(
        init=lambda k: hll.empty_registers(p).tobytes(),
        merge=lambda a, b: hll.merge(
            np.frombuffer(a, np.uint8), np.frombuffer(b, np.uint8)
        ).tobytes(),
        accumulate_block=accumulate,
        finalize=lambda s: hll.estimate(np.frombuffer(s, np.uint8)),
        name=alias_name or f"hll_distinct({col})",
    )
