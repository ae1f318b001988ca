"""Text-analysis pipelines over a documents table (doc_id, text, ...).

Training-data-pipeline staples: token counting, quality scoring, language
id, document fingerprinting.  Each is a vectorized map_batches (language id
is an actor pool — profiles compile once per actor).
"""

from __future__ import annotations

import pandas as pd

from ..functions import textstats
from ..functions.langid import NgramLangDetector


def token_counts(docs):
    """(doc_id, n_tokens, n_tokens_regex) — whitespace + BPE-ish regex."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "n_tokens": textstats.whitespace_token_count(df["text"]),
                "n_tokens_regex": textstats.regex_token_count(df["text"]),
            }
        )

    return docs.map_batches(f, batch_format="pandas")


def quality(docs):
    """(doc_id, n_chars, n_tokens, ..., quality_score)."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        out = textstats.quality_features(df["text"])
        out.insert(0, "doc_id", df["doc_id"].values)
        return out

    return docs.map_batches(f, batch_format="pandas")


class LangIdStage:
    """Actor-pool stage: adds detected_lang (profiles built once per actor)."""

    def __init__(self):
        self.detector = NgramLangDetector()

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "detected_lang": df["text"].map(self.detector.detect_text),
            }
        )


def lang_id(docs, concurrency=4):
    return docs.map_batches(
        LangIdStage, batch_format="pandas", concurrency=concurrency, num_cpus=1
    )


def _flat_tokens(col):
    """(parent_indices, tokens) for a string column: whitespace-split
    (RE2 ``\\s+`` — same engine as the DuckDB oracles), flattened, empty
    tokens removed.  All Arrow C++ kernels, no per-row Python.

    `col` may be a ChunkedArray; chunks are combined first because
    ``list_parent_indices`` numbers parents per-chunk, not globally.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    lists = pc.split_pattern_regex(col, pattern=r"\s+")
    flat = pc.list_flatten(lists)
    parents = pc.list_parent_indices(lists)
    keep = pc.not_equal(flat, "")
    return parents.filter(keep), flat.filter(keep)


def top_tokens(docs, k: int = 25):
    """→ (tok, n): the k most frequent whitespace tokens across the corpus,
    EXACT, ties broken by token ascending (deterministic).

    Scale shape: per-batch Counter partials → ONE narrow (tok, n) groupby
    sum (vocabulary-sized, not corpus-sized) → per-batch top-k combiner
    (pyarrow select_k) → single tiny final merge.  No global sort, no
    whole-vocabulary driver materialization beyond k×blocks rows.  Unlike
    stages.joins.approx_topk this is exact: the combiner runs AFTER the
    global aggregate, where each token appears exactly once, so per-batch
    top-k candidates provably contain the global top-k."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"tok": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
        _, toks = _flat_tokens(t["text"])
        g = pa.table({"tok": toks}).group_by("tok").aggregate([([], "count_all")])
        return pa.table(
            {"tok": pc.cast(g["tok"], pa.string()),
             "n": pc.cast(g["count_all"], pa.int64())}
        )

    totals = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("tok")
        .aggregate(Sum("n", alias_name="n"))
    )

    sort_keys = [("n", "descending"), ("tok", "ascending")]

    def batch_topk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "tok" not in t.column_names:
            return pa.table(
                {"tok": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
        t = pa.table({"tok": pc.cast(t["tok"], pa.string()),
                      "n": pc.cast(t["n"], pa.int64())})
        if t.num_rows > k:
            t = t.take(pc.select_k_unstable(t, k=k, sort_keys=sort_keys))
        return t

    cand = pa.concat_tables(
        b for b in totals.map_batches(batch_topk, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    )
    # final deterministic top-k over ≤ k×blocks candidate rows
    order = sorted(
        zip(cand["tok"].to_pylist(), cand["n"].to_pylist()),
        key=lambda r: (-r[1], r[0]),
    )[:k]
    return rd.from_arrow(
        pa.table(
            {"tok": pa.array([r[0] for r in order], pa.string()),
             "n": pa.array(np.asarray([r[1] for r in order], dtype=np.int64),
                           pa.int64())}
        )
    )


TOP_TOKENS_SQL = """
SELECT tok, CAST(COUNT(*) AS BIGINT) AS n
FROM (
    SELECT unnest(LIST_FILTER(STRING_SPLIT_REGEX(text, '\\s+'),
                              x -> x <> '')) AS tok
    FROM documents
)
GROUP BY tok
ORDER BY n DESC, tok ASC
LIMIT 25
"""


def tfidf_top_terms(docs, k: int = 5, *, n_docs: int | None = None):
    """→ (doc_id, tok, tf, tfidf): each document's k highest-scoring
    whitespace tokens by tf·idf (idf = ln(N/df)), ties broken by token
    ascending; tfidf rounded to 6 decimals BEFORE ranking so the order is
    reproducible across engines (ln differs by ulps between libms).

    Scale shape (the classic two-pass distributed TF-IDF):
      pass 1  document frequencies — per-batch distinct-token partials →
              ONE vocab-bounded (tok, df) groupby → collected and
              broadcast via ray.put (the small-side pattern: a whitespace
              token vocabulary is corpus-sublinear; for web-scale
              vocabularies swap the broadcast for a tok-partitioned join).
      pass 2  per-doc tf × broadcast idf, per-doc top-k — embarrassingly
              parallel map_batches, no shuffle.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Sum

    if n_docs is None:
        n_docs = docs.count()

    empty = pa.table(
        {"doc_id": pa.array([], pa.int64()), "tok": pa.array([], pa.string()),
         "tf": pa.array([], pa.int64()), "tfidf": pa.array([], pa.float64())}
    )

    def df_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"tok": pa.array([], pa.string()), "df": pa.array([], pa.int64())}
            )
        parents, toks = _flat_tokens(t["text"])
        # distinct (doc, tok) pairs, then per-token doc counts — both C++
        pairs = pa.table({"i": parents, "tok": toks}).group_by(["i", "tok"])
        g = pairs.aggregate([]).group_by("tok").aggregate([([], "count_all")])
        return pa.table(
            {"tok": pc.cast(g["tok"], pa.string()),
             "df": pc.cast(g["count_all"], pa.int64())}
        )

    dfs = (
        docs.map_batches(df_partial, batch_format="pyarrow")
        .groupby("tok")
        .aggregate(Sum("df", alias_name="df"))
    )
    vocab = pa.concat_tables(
        b for b in dfs.iter_batches(batch_format="pyarrow")
    ).combine_chunks()
    idf_vals = np.log(float(n_docs) / vocab["df"].to_numpy().astype(np.float64))
    # broadcast once (Arrow buffers are zero-copy through the object store)
    vocab_ref = ray.put(
        pa.table({"tok": pc.cast(vocab["tok"], pa.string()),
                  "idf": pa.array(idf_vals, pa.float64())})
    )

    class TopTerms:
        def __init__(self, vocab_ref, k):
            v = ray.get(vocab_ref)
            self.tok = v["tok"].combine_chunks()
            self.idf = v["idf"].to_numpy()
            self.k = k

        def __call__(self, t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return empty
            parents, toks = _flat_tokens(t["text"])
            tf_tbl = (
                pa.table({"i": parents, "tok": toks})
                .group_by(["i", "tok"])
                .aggregate([([], "count_all")])
            )
            tf = pc.cast(tf_tbl["count_all"], pa.int64())
            # vectorized idf lookup; tokens absent from the broadcast vocab
            # (only possible with a caller-supplied corpus mismatch) score
            # as df=1 → idf=ln(N)
            pos = pc.index_in(tf_tbl["tok"], value_set=self.tok)
            missing = pc.is_null(pos).to_numpy(zero_copy_only=False)
            pos_np = (
                pc.fill_null(pos, 0).to_numpy(zero_copy_only=False).astype(np.int64)
            )
            idf = np.where(missing, np.log(float(n_docs)), self.idf[pos_np])
            score = pc.round(
                pc.multiply(pc.cast(tf, pa.float64()), pa.array(idf)), ndigits=6
            )
            tbl = pa.table(
                {"doc_id": pc.cast(t["doc_id"].take(tf_tbl["i"]), pa.int64()),
                 "tok": pc.cast(tf_tbl["tok"], pa.string()),
                 "tf": tf, "tfidf": score}
            ).sort_by(
                [("doc_id", "ascending"), ("tfidf", "descending"),
                 ("tok", "ascending")]
            )
            d = tbl["doc_id"].to_numpy()
            starts = np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
            counts = np.diff(np.r_[starts, len(d)])
            rank = np.arange(len(d)) - np.repeat(starts, counts)
            return tbl.filter(pa.array(rank < self.k))

    return docs.map_batches(
        TopTerms, fn_constructor_kwargs=dict(vocab_ref=vocab_ref, k=k),
        batch_format="pyarrow", concurrency=(1, 8),
    )


TFIDF_TOP_TERMS_SQL = """
WITH toks AS (
    SELECT doc_id,
           unnest(LIST_FILTER(STRING_SPLIT_REGEX(text, '\\s+'),
                              x -> x <> '')) AS tok
    FROM documents
), tf AS (
    SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
    FROM toks GROUP BY doc_id, tok
), df AS (
    SELECT tok, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY tok
), n AS (
    SELECT COUNT(*) AS nn FROM documents
), scored AS (
    SELECT tf.doc_id, tf.tok, tf.tf,
           ROUND(tf.tf * LN(CAST(n.nn AS DOUBLE) / df.df), 6) AS tfidf
    FROM tf JOIN df ON df.tok = tf.tok CROSS JOIN n
), ranked AS (
    SELECT doc_id, tok, tf, tfidf,
           ROW_NUMBER() OVER (PARTITION BY doc_id
                              ORDER BY tfidf DESC, tok) AS rn
    FROM scored
)
SELECT doc_id, tok, tf, tfidf FROM ranked WHERE rn <= 5
"""


def repetition_signals(docs):
    """→ (doc_id, n_lines, dup_line_frac, dup_line_char_frac, n_2grams,
    top_2gram_frac, dup_2gram_frac): the classic web-corpus repetition
    filters (duplicate-line and repeated-n-gram fractions, as popularized
    by the Gopher/C4 cleaning rules).  Fractions are rounded to 6 decimals
    for cross-engine stability; docs with no lines / no 2-grams score 0.0.

    Definitions (matching REPETITION_SQL exactly):
      lines          = text split on \\n, empty lines dropped
      dup_line_frac  = 1 - distinct_lines / total_lines
      dup_line_char_frac = 1 - chars(distinct lines) / chars(all lines)
      2-grams        = consecutive whitespace-token pairs joined by " "
      top_2gram_frac = occurrences of the most frequent 2-gram / total
      dup_2gram_frac = 1 - distinct_2grams / total_2grams

    Scale shape: pure per-batch map_batches — zero shuffle; every kernel
    is Arrow C++ (split/flatten/hash group_by) or numpy bincount.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    def f(t: pa.Table) -> pa.Table:
        n = t.num_rows
        out_ints = {"n_lines": np.zeros(n, np.int64),
                    "n_2grams": np.zeros(n, np.int64)}
        fr = {k: np.zeros(n, np.float64)
              for k in ("dup_line_frac", "dup_line_char_frac",
                        "top_2gram_frac", "dup_2gram_frac")}
        if n:
            col = t["text"]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            # ---- duplicate lines
            lines = pc.split_pattern(col, "\n")
            lp = pc.list_parent_indices(lines)
            lf = pc.list_flatten(lines)
            keep = pc.not_equal(lf, "")
            lp, lf = lp.filter(keep), lf.filter(keep)
            if len(lf):
                llen = pc.utf8_length(lf)
                g = (
                    pa.table({"i": lp, "line": lf, "len": llen})
                    .group_by(["i", "line"])
                    .aggregate([("len", "max"), ([], "count_all")])
                )
                lp_np = lp.to_numpy()
                gi = g["i"].to_numpy()
                tot = np.bincount(lp_np, minlength=n)
                dist = np.bincount(gi, minlength=n)
                tot_ch = np.bincount(
                    lp_np, weights=llen.to_numpy().astype(np.float64),
                    minlength=n)
                dist_ch = np.bincount(
                    gi, weights=g["len_max"].to_numpy().astype(np.float64),
                    minlength=n)
                has = tot > 0
                out_ints["n_lines"] = tot.astype(np.int64)
                fr["dup_line_frac"][has] = 1.0 - dist[has] / tot[has]
                hc = tot_ch > 0
                fr["dup_line_char_frac"][hc] = 1.0 - dist_ch[hc] / tot_ch[hc]
            # ---- repeated word 2-grams
            parents, toks = _flat_tokens(col)
            p_np = parents.to_numpy()
            if len(p_np) > 1:
                valid = pa.array(p_np[1:] == p_np[:-1])
                left = toks.slice(0, len(toks) - 1).filter(valid)
                right = toks.slice(1).filter(valid)
                gram = pc.binary_join_element_wise(left, right, " ")
                gp = p_np[:-1][p_np[1:] == p_np[:-1]]
                if len(gp):
                    gg = (
                        pa.table({"i": pa.array(gp), "g": gram})
                        .group_by(["i", "g"])
                        .aggregate([([], "count_all")])
                    )
                    cnts = gg["count_all"].to_numpy()
                    ggi = gg["i"].to_numpy()
                    tot2 = np.bincount(gp, minlength=n)
                    dist2 = np.bincount(ggi, minlength=n)
                    mx = np.zeros(n, np.float64)
                    np.maximum.at(mx, ggi, cnts.astype(np.float64))
                    h2 = tot2 > 0
                    out_ints["n_2grams"] = tot2.astype(np.int64)
                    fr["top_2gram_frac"][h2] = mx[h2] / tot2[h2]
                    fr["dup_2gram_frac"][h2] = 1.0 - dist2[h2] / tot2[h2]
        return pa.table(
            {"doc_id": pc.cast(t["doc_id"], pa.int64()),
             "n_lines": pa.array(out_ints["n_lines"], pa.int64()),
             "dup_line_frac": pa.array(np.round(fr["dup_line_frac"], 6)),
             "dup_line_char_frac":
                 pa.array(np.round(fr["dup_line_char_frac"], 6)),
             "n_2grams": pa.array(out_ints["n_2grams"], pa.int64()),
             "top_2gram_frac": pa.array(np.round(fr["top_2gram_frac"], 6)),
             "dup_2gram_frac": pa.array(np.round(fr["dup_2gram_frac"], 6))}
        )

    return docs.map_batches(f, batch_format="pyarrow")


REPETITION_SQL = """
WITH lines AS (
    SELECT doc_id, l FROM (
        SELECT doc_id, unnest(STRING_SPLIT(text, chr(10))) AS l
        FROM documents
    ) WHERE l <> ''
), lstat AS (
    SELECT doc_id, COUNT(*) AS tot, COUNT(DISTINCT l) AS dist,
           SUM(LENGTH(l)) AS tot_chars
    FROM lines GROUP BY doc_id
), ldist AS (
    SELECT doc_id, SUM(LENGTH(l)) AS dist_chars
    FROM (SELECT DISTINCT doc_id, l FROM lines) GROUP BY doc_id
), toks AS (
    SELECT doc_id,
           LIST_FILTER(STRING_SPLIT_REGEX(text, '\\s+'), x -> x <> '') AS ts
    FROM documents
), grams AS (
    SELECT doc_id,
           unnest(list_transform(range(1, len(ts)),
                                 i -> ts[i] || ' ' || ts[i + 1])) AS g
    FROM toks
), gcnt AS (
    SELECT doc_id, g, COUNT(*) AS c FROM grams GROUP BY doc_id, g
), gstat AS (
    SELECT doc_id, SUM(c) AS tot2, COUNT(*) AS dist2, MAX(c) AS mx
    FROM gcnt GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(ls.tot, 0) AS BIGINT) AS n_lines,
       ROUND(COALESCE(1.0 - ls.dist / CAST(ls.tot AS DOUBLE), 0.0), 6)
           AS dup_line_frac,
       ROUND(COALESCE(1.0 - ld.dist_chars / CAST(ls.tot_chars AS DOUBLE), 0.0),
             6) AS dup_line_char_frac,
       CAST(COALESCE(gs.tot2, 0) AS BIGINT) AS n_2grams,
       ROUND(COALESCE(gs.mx / CAST(gs.tot2 AS DOUBLE), 0.0), 6)
           AS top_2gram_frac,
       ROUND(COALESCE(1.0 - gs.dist2 / CAST(gs.tot2 AS DOUBLE), 0.0), 6)
           AS dup_2gram_frac
FROM documents d
LEFT JOIN lstat ls USING (doc_id)
LEFT JOIN ldist ld USING (doc_id)
LEFT JOIN gstat gs USING (doc_id)
"""


# PII scrub rules, applied IN ORDER (counts taken against the text as it
# stands when the rule runs — mirror the same order in any SQL oracle).
# RE2 syntax only (pyarrow and DuckDB both use RE2, so semantics match).
PII_RULES = (
    ("n_emails", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("n_ips", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("n_phones", r"\+\d{1,3}-\d{3}-\d{4}\b", "<PHONE>"),
)


def redact_pii(ds, text_col: str = "text", id_col: str = "doc_id"):
    """→ (id_col, text_redacted, n_emails, n_ips, n_phones): scrub emails,
    IPv4 addresses and phone numbers from a text column, counting each.

    The training-data staple: PII removal before corpus release.  Pure
    per-batch map_batches (zero shuffle); each rule is one RE2
    count + replace kernel pair over the whole batch.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    def f(t: pa.Table) -> pa.Table:
        col = t[text_col]
        out = {id_col: t[id_col]}
        counts = {}
        for name, pat, repl in PII_RULES:
            counts[name] = pc.cast(
                pc.count_substring_regex(col, pat), pa.int64())
            col = pc.replace_substring_regex(col, pat, repl)
        out["text_redacted"] = col
        out.update(counts)
        return pa.table(out)

    return ds.map_batches(f, batch_format="pyarrow")


def fingerprints(docs, window: int = 8, keep: int = 4):
    """(doc_id, fingerprint) — winnowing-style rolling-hash fingerprint."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "fingerprint": textstats.fingerprints(df["text"], window, keep),
            }
        )

    return docs.map_batches(f, batch_format="pandas")
