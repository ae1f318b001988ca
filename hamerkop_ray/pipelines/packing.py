"""Sequence chunking / packing — preparing a document corpus for
fixed-context training: split long docs into fixed-size token chunks,
and assign docs to fixed-capacity token bins (concatenate-then-split
packing).

doc_chunks   embarrassingly parallel: per-batch Arrow tokenization, run
             detection with numpy, chunk texts rebuilt ZERO-COPY via
             ListArray.from_arrays(offsets, tokens) + binary_join — no
             shuffle, no per-row Python.
doc_packing  needs a sequential order per language, so it pays ONE
             narrow (lang, doc_id, n_tokens) shuffle via
             groupby(lang).map_groups with a vectorized sort+cumsum per
             group.  Languages are coarse groups — at 100-TB scale,
             pre-shard the corpus (pack per (lang, shard) with shard =
             a stable doc_id range) to bound the per-group task; the
             semantics here follow the single-sequence-per-language
             definition the SQL oracle can express.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def doc_chunks(docs, chunk_tokens: int = 64):
    """→ (doc_id, chunk_id, n_tokens_chunk, chunk_text): consecutive
    `chunk_tokens`-sized windows of each doc's whitespace tokens, joined
    by a single space.  Docs with no tokens emit no chunks."""
    from .text import _flat_tokens

    empty = pa.table(
        {"doc_id": pa.array([], pa.int64()),
         "chunk_id": pa.array([], pa.int64()),
         "n_tokens_chunk": pa.array([], pa.int64()),
         "chunk_text": pa.array([], pa.string())}
    )

    def f(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        parents, toks = _flat_tokens(t["text"])
        p = parents.to_numpy()
        if len(p) == 0:
            return empty
        doc_change = np.r_[True, p[1:] != p[:-1]]
        starts_idx = np.flatnonzero(doc_change)
        counts = np.diff(np.r_[starts_idx, len(p)])
        pos = np.arange(len(p)) - np.repeat(starts_idx, counts)
        cid = pos // chunk_tokens
        new_run = np.r_[True, doc_change[1:] | (cid[1:] != cid[:-1])]
        offs = np.r_[np.flatnonzero(new_run), len(p)]
        lists = pa.ListArray.from_arrays(
            pa.array(offs, pa.int32()), toks)
        run_start = offs[:-1]
        return pa.table(
            {"doc_id": pc.cast(
                t["doc_id"].take(pa.array(p[run_start], pa.int64())),
                pa.int64()),
             "chunk_id": pa.array(cid[run_start], pa.int64()),
             "n_tokens_chunk": pa.array(np.diff(offs), pa.int64()),
             "chunk_text": pc.binary_join(lists, " ")}
        )

    return docs.map_batches(f, batch_format="pyarrow")


def doc_chunks_sql(chunk_tokens: int = 64) -> str:
    c = chunk_tokens
    return f"""
WITH toks AS (
    SELECT doc_id,
           LIST_FILTER(STRING_SPLIT_REGEX(text, '\\s+'), x -> x <> '') AS ts
    FROM documents
), idx AS (
    SELECT doc_id, ts,
           unnest(range(0, CAST(ceil(len(ts) / {c}.0) AS BIGINT)))
               AS chunk_id
    FROM toks
)
SELECT doc_id, chunk_id,
       CAST(LEAST(len(ts) - chunk_id * {c}, {c}) AS BIGINT)
           AS n_tokens_chunk,
       array_to_string(ts[(chunk_id * {c} + 1):((chunk_id + 1) * {c})], ' ')
           AS chunk_text
FROM idx
"""


def doc_packing(docs, capacity: int = 1024):
    """→ (doc_id, lang, n_tokens, start_offset, bin_id): concatenate each
    language's docs in doc_id order and split the token stream into
    `capacity`-token training bins; a doc's bin is where its first token
    lands (docs may straddle bins, as in real sequence packing).  Pure
    integer arithmetic — bit-exact vs the SQL window oracle."""
    from ..functions import textstats

    def per_lang(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id", kind="mergesort")
        n = textstats.whitespace_token_count(g["text"]).to_numpy()
        start = np.cumsum(n) - n
        return pd.DataFrame(
            {"doc_id": g["doc_id"].to_numpy(),
             "lang": g["lang"].to_numpy(),
             "n_tokens": n.astype(np.int64),
             "start_offset": start.astype(np.int64),
             "bin_id": (start // capacity).astype(np.int64)}
        )

    return docs.groupby("lang").map_groups(per_lang, batch_format="pandas")


def doc_packing_sql(capacity: int = 1024) -> str:
    return f"""
WITH t AS (
    SELECT doc_id, lang,
           LEN(LIST_FILTER(STRING_SPLIT_REGEX(text, '\\s+'), x -> x <> ''))
               AS n_tokens
    FROM documents
)
SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(SUM(n_tokens) OVER w - n_tokens AS BIGINT) AS start_offset,
       CAST((SUM(n_tokens) OVER w - n_tokens) // {capacity} AS BIGINT)
           AS bin_id
FROM t
WINDOW w AS (PARTITION BY lang ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
"""
