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


def top_tokens_cms(docs, k: int = 25, depth: int = 4, width: int = 16384):
    """→ (tok, n_est): approximate corpus heavy hitters in ONE pass and
    FIXED memory — the scale alternative to text.top_tokens when even the
    vocabulary-bounded (tok, n) groupby is too wide (e.g. raw web
    shingles).  Per batch: a Count-Min partial (depth×width counters)
    plus that batch's exact top-k as heavy-hitter CANDIDATES; driver
    merges sketches by sum, unions candidates, and reports each
    candidate's CMS estimate.

    Approximate by design (a global heavy hitter spread thinly across
    batches can miss the candidate union; CMS estimates are biased up) —
    accuracy is unit-tested against the exact operator on skewed data.
    """
    import pyarrow.compute as pc

    from ..functions.cms import CountMinSketch
    from .text import _flat_tokens

    def partial(t: pa.Table) -> pa.Table:
        sk = CountMinSketch(depth, width)
        cand: list[str] = []
        if t.num_rows:
            _, toks = _flat_tokens(t["text"])
            g = pa.table({"tok": toks}).group_by("tok").aggregate(
                [([], "count_all")])
            vals = g["tok"].to_numpy(zero_copy_only=False)
            cnts = g["count_all"].to_numpy()
            sk.add(vals, cnts)
            if len(vals) > k:
                idx = pc.select_k_unstable(
                    g, k=k, sort_keys=[("count_all", "descending"),
                                       ("tok", "ascending")])
                cand = g.take(idx)["tok"].to_pylist()
            else:
                cand = list(vals)
        return pa.table(
            {"counts": pa.array([sk.counts.tobytes()], pa.binary()),
             "cand": pa.array([cand], pa.list_(pa.string()))}
        )

    merged = CountMinSketch(depth, width)
    cands: set[str] = set()
    for b in docs.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for raw, cl in zip(b["counts"].to_pylist(), b["cand"].to_pylist()):
            part = CountMinSketch(depth, width)
            part.counts = np.frombuffer(raw, np.uint64).reshape(depth, width)
            merged.merge(part)
            cands.update(cl)
    cand_arr = np.asarray(sorted(cands), dtype=object)
    est = merged.estimate(cand_arr) if len(cand_arr) else np.zeros(0, np.int64)
    order = np.lexsort((cand_arr, -est))[:k]
    import ray.data as rd

    return rd.from_arrow(
        pa.table({"tok": pa.array(cand_arr[order].tolist(), pa.string()),
                  "n_est": pa.array(est[order], pa.int64())})
    )


def key_skew_report(ds, col: str):
    """→ one row (n_rows, n_keys, max_key_frac, top10_frac, entropy_bits):
    the pre-shuffle skew diagnostic — run it on a key column BEFORE
    keying a groupby/join on it at scale; a high max_key_frac means the
    biggest reducer task gets that fraction of the table (salt it).

    Scale shape: per-batch (key, n) partials → ONE key-cardinality-
    bounded groupby → single-row summary.  Entropy/fractions rounded to
    6 decimals; entropy term order is fixed by summing over keys in
    ascending key order so the float result is engine-reproducible."""
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"k": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        g = (pa.table({"k": pc.cast(t[col], pa.string())})
             .group_by("k").aggregate([([], "count_all")]))
        return pa.table({"k": g["k"],
                         "n": pc.cast(g["count_all"], pa.int64())})

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("k").aggregate(Sum("n", alias_name="n"))
    )
    tbl = pa.concat_tables(
        b for b in counts.iter_batches(batch_format="pyarrow"))
    if tbl.num_rows == 0:
        n = np.zeros(0, np.int64)
    else:
        tbl = tbl.sort_by("k")
        n = tbl["n"].to_numpy().astype(np.float64)
    total = n.sum()
    if total == 0:
        row = {"n_rows": 0, "n_keys": 0, "max_key_frac": 0.0,
               "top10_frac": 0.0, "entropy_bits": 0.0}
    else:
        frac = n / total
        top10 = np.sort(n)[::-1][:10].sum() / total

        def _r6(x: float) -> float:
            # half-away like DuckDB ROUND (python round is half-even)
            return float(np.floor(x * 1e6 + 0.5) / 1e6)

        # entropy summed as int64 1e-12-unit terms: a plain double SUM is
        # summation-order-sensitive (numpy pairwise vs DuckDB sequential)
        # and can flip the 6th rounded decimal on large key sets; the
        # per-term pre-round also absorbs libm LOG2 last-ulp differences
        ent_units = np.floor(
            -(frac * np.log2(frac)) * 1e12 + 0.5
        ).astype(np.int64).sum()
        row = {"n_rows": int(total), "n_keys": int(len(n)),
               "max_key_frac": _r6(float(frac.max())),
               "top10_frac": _r6(float(top10)),
               "entropy_bits": _r6(float(ent_units) / 1e12)}
    return rd.from_arrow(pa.table(
        {"n_rows": pa.array([row["n_rows"]], pa.int64()),
         "n_keys": pa.array([row["n_keys"]], pa.int64()),
         "max_key_frac": pa.array([row["max_key_frac"]], pa.float64()),
         "top10_frac": pa.array([row["top10_frac"]], pa.float64()),
         "entropy_bits": pa.array([row["entropy_bits"]], pa.float64())}
    ))


def key_skew_report_sql(table: str, col: str) -> str:
    return f"""
WITH c AS (
    SELECT CAST({col} AS VARCHAR) AS k, CAST(COUNT(*) AS DOUBLE) AS n
    FROM {table} GROUP BY 1 ORDER BY k
), t AS (SELECT SUM(n) AS total FROM c)
SELECT CAST(t.total AS BIGINT) AS n_rows,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM c) AS n_keys,
       ROUND((SELECT MAX(n) FROM c) / t.total, 6) AS max_key_frac,
       ROUND((SELECT SUM(n) FROM (SELECT n FROM c ORDER BY n DESC LIMIT 10))
             / t.total, 6) AS top10_frac,
       ROUND((SELECT SUM(CAST(FLOOR(
                  -(n / t.total) * LOG2(n / t.total) * 1e12 + 0.5) AS BIGINT))
              FROM c) / 1e12, 6)
           AS entropy_bits
FROM t
"""


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
