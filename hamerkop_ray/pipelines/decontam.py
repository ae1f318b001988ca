"""Benchmark decontamination — the training-data staple of flagging
corpus documents that share word n-grams with an evaluation/benchmark
set (so eval data is not trained on).

Scale shape:
  pass 1  distinct n-grams of the EVAL set — per-batch distinct partials,
          driver-side union, broadcast via ray.put.  Benchmark sets are
          tiny relative to the corpus (thousands of docs vs billions), so
          the broadcast-set pattern is the right one; for a pathological
          eval set larger than worker heap, swap for a gram-partitioned
          anti-join.
  pass 2  per-batch n-gram construction (Arrow split/flatten + shifted
          joins) and membership probe (pc.is_in against the broadcast
          set), per-doc sums via numpy bincount — zero shuffle.

The contamination flag uses pure integer arithmetic
(10*n_contaminated >= 3*n_grams, i.e. frac >= 0.3) so Ray and any SQL
oracle agree bit-exactly with no float-rounding boundary.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _doc_ngrams(col, n: int):
    """(parent_indices, grams): word n-grams (space-joined consecutive
    whitespace tokens) of each string in `col`, all Arrow kernels."""
    from .text import _flat_tokens

    parents, toks = _flat_tokens(col)
    p = parents.to_numpy()
    m = len(p) - n + 1
    if m <= 0:
        return (np.empty(0, np.int64),
                pa.array([], pa.string()))
    valid = np.ones(m, bool)
    for j in range(1, n):
        valid &= p[j:m + j] == p[:m]
    mask = pa.array(valid)
    parts = [toks.slice(j, m).filter(mask) for j in range(n)]
    grams = pc.binary_join_element_wise(*parts, " ")
    return p[:m][valid], grams


def eval_ngrams(eval_docs, n: int = 3, text_col: str = "text") -> pa.Array:
    """Distinct word n-grams of the eval set, collected to the driver
    (benchmark-sized by assumption — see module docstring)."""

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"g": pa.array([], pa.string())})
        _, grams = _doc_ngrams(t[text_col], n)
        return pa.table({"g": pc.unique(grams)})

    parts = [
        b
        for b in eval_docs.map_batches(partial, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    ]
    if not parts:
        return pa.array([], pa.string())
    return pc.unique(pa.concat_tables(parts)["g"].combine_chunks())


def decontaminate(docs, eval_grams_ref, n: int = 3,
                  text_col: str = "text", id_col: str = "doc_id"):
    """→ (doc_id, n_grams, n_contaminated, contaminated_frac,
    is_contaminated) for every input document."""
    import ray

    class Probe:
        def __init__(self, eval_grams_ref, n):
            g = ray.get(eval_grams_ref)
            self.grams = g.combine_chunks() if isinstance(
                g, pa.ChunkedArray) else g
            self.n = n

        def __call__(self, t: pa.Table) -> pa.Table:
            nrows = t.num_rows
            tot = np.zeros(nrows, np.int64)
            cont = np.zeros(nrows, np.int64)
            if nrows:
                parents, grams = _doc_ngrams(t[text_col], self.n)
                if len(parents):
                    tot = np.bincount(parents, minlength=nrows
                                      ).astype(np.int64)
                    hit = pc.is_in(grams, value_set=self.grams)
                    hit_np = hit.to_numpy(zero_copy_only=False).astype(bool)
                    cont = np.bincount(
                        parents, weights=hit_np.astype(np.float64),
                        minlength=nrows).astype(np.int64)
            frac = np.zeros(nrows, np.float64)
            has = tot > 0
            frac[has] = cont[has] / tot[has]
            return pa.table(
                {id_col: pc.cast(t[id_col], pa.int64()),
                 "n_grams": pa.array(tot, pa.int64()),
                 "n_contaminated": pa.array(cont, pa.int64()),
                 "contaminated_frac": pa.array(np.round(frac, 6)),
                 "is_contaminated":
                     pa.array((cont * 10 >= tot * 3) & has)}
            )

    return docs.map_batches(
        Probe, fn_constructor_kwargs=dict(eval_grams_ref=eval_grams_ref, n=n),
        batch_format="pyarrow", concurrency=(1, 8),
    )


def decontaminate_sql(table: str = "documents", id_col: str = "doc_id",
                      text_col: str = "text", n: int = 3,
                      eval_pred: str = "TRUE") -> str:
    """DuckDB oracle: eval set = rows of `table` matching `eval_pred`."""
    joiner = " || ' ' || ".join(f"ts[i + {j}]" for j in range(n))
    return f"""
WITH toks AS (
    SELECT {id_col},
           LIST_FILTER(STRING_SPLIT_REGEX({text_col}, '\\s+'),
                       x -> x <> '') AS ts
    FROM {table}
), grams AS (
    SELECT {id_col},
           unnest(list_transform(range(1, len(ts) - {n - 2}),
                                 i -> {joiner})) AS g
    FROM toks
), evg AS (
    SELECT DISTINCT g FROM grams WHERE {eval_pred}
), stat AS (
    SELECT {id_col}, CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(CASE WHEN g IN (SELECT g FROM evg) THEN 1 ELSE 0 END)
                AS BIGINT) AS n_contaminated
    FROM grams GROUP BY {id_col}
)
SELECT d.{id_col},
       COALESCE(s.n_grams, 0) AS n_grams,
       COALESCE(s.n_contaminated, 0) AS n_contaminated,
       ROUND(COALESCE(s.n_contaminated / CAST(s.n_grams AS DOUBLE), 0.0), 6)
           AS contaminated_frac,
       COALESCE(s.n_contaminated * 10 >= s.n_grams * 3, FALSE)
           AS is_contaminated
FROM {table} d LEFT JOIN stat s USING ({id_col})
"""
