"""Driver contract: entry() smoke, queries() vs oracle_sql() via DuckDB.

Ray is initialised by the driver BEFORE importing this module — nothing here
(or in hamerkop_ray) calls ray.init()/ray.shutdown().

queries() covers SURVEY.md §2 operator families over the driver testdata:
relational (scan/filter/project/groupby/join/sort/topk), stream-shaped
windowed aggregates, text analysis (token counts, quality, language id,
fingerprints), deduplication (exact, MinHash-LSH, SimHash, n-gram Jaccard,
edit-distance pair mining), embedding similarity search (exact + IVF), and
the flagship entity-resolution pipeline over span-documents deterministically
derived from the testdata documents table (BASELINE.json input_hint shape).
Queries without an oracle_sql entry are non-SQL-expressible (noted inline).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

import pyarrow.parquet as pq

# importable regardless of the driver's working directory
_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from hamerkop_ray.pipelines import relational as rel


def _register_by_value():
    """Ray workers inherit the DRIVER's sys.path from before this module was
    imported — if the driver started Ray from another cwd, workers cannot
    import hamerkop_ray.  Register the whole package for cloudpickle
    by-value serialization so stage callables ship self-contained."""
    try:
        import importlib
        import pkgutil

        import hamerkop_ray
        from ray import cloudpickle

        for modinfo in pkgutil.walk_packages(
            hamerkop_ray.__path__, prefix="hamerkop_ray."
        ):
            try:
                importlib.import_module(modinfo.name)
            except Exception:
                continue
        for name, mod in list(sys.modules.items()):
            if name == "hamerkop_ray" or name.startswith("hamerkop_ray."):
                if mod is not None:
                    try:
                        cloudpickle.register_pickle_by_value(mod)
                    except Exception:
                        pass
    except Exception:
        pass  # best effort; irrelevant when workers share the repo cwd


_register_by_value()

_KB_CACHE: dict[tuple[int, int], Any] = {}


def _kb(n_entities: int = 400, seed: int = 42):
    key = (n_entities, seed)
    if key not in _KB_CACHE:
        from hamerkop_ray.synth import make_kb

        _KB_CACHE[key] = make_kb(n_entities, seed)
    return _KB_CACHE[key]


def _span_docs(sf_dir: str):
    """Deterministically derive the interleaved span-documents table
    (doc_id, spans) from the testdata documents table.

    TASK fn with a per-worker-process stage cache instead of an actor pool:
    Ray tasks reuse warm worker processes, so repeated query executions in
    one session skip the per-execution actor spawn ramp (the same pattern
    as flagship's task-pool path)."""
    import ray
    import ray.data as rd

    kb_ref = ray.put(_kb())
    base = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def synth_fn(batch, kb_ref=kb_ref):
        from hamerkop_ray.pipelines.flagship import _StageCache
        from hamerkop_ray.synth import SynthDocsFromText

        global _SYNTH_STAGE_CACHE
        try:
            cache = _SYNTH_STAGE_CACHE
        except NameError:
            cache = _SYNTH_STAGE_CACHE = _StageCache()
        key = getattr(kb_ref, "hex", lambda: str(id(kb_ref)))()
        st = cache.get(key)
        if st is None:
            st = SynthDocsFromText(kb_ref=kb_ref)
            cache.clear()
            cache[key] = st
        return st(batch)

    # small batch_size → many output blocks → downstream stages parallelize
    # (Ray dispatches map tasks per block; one fat block = one busy worker)
    return base.map_batches(
        synth_fn,
        batch_format="pyarrow",
        batch_size=128,
    )


def entry() -> Any:
    """Flagship ER pipeline on sf0.001: span-docs → chains → candidates →
    resolution → transitive clustering → per-mention output rows."""
    from hamerkop_ray.pipelines.flagship import run_flagship

    docs = _span_docs("/root/testdata/sf0.001")
    out = run_flagship(docs, _kb(), gen_config=None, concurrency=(2, 8))
    return out["mentions"]


# ---------------------------------------------------------------------------
# query callables
# ---------------------------------------------------------------------------


def _docs(sf_dir: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def _doc_stats(sf_dir: str):
    import pandas as pd

    from hamerkop_ray.functions import textstats

    def f(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "n_chars": df["text"].str.len().astype("int64"),
                "n_tokens": textstats.whitespace_token_count(df["text"]),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(f, batch_format="pandas")


def _doc_quality(sf_dir: str):
    import pandas as pd

    from hamerkop_ray.pipelines.text import quality

    float_cols = ["mean_token_len", "stopword_ratio", "punct_ratio",
                  "digit_ratio", "uniq_token_ratio", "quality_score"]

    def rnd(df: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        # round for the oracle's value-hash compare — HALF-AWAY like DuckDB's
        # ROUND (np.round is half-even: 0.5140625 → .514062 vs .514063)
        for c in float_cols:
            df[c] = np.floor(df[c].to_numpy() * 1e6 + 0.5) / 1e6
        return df

    return quality(_docs(sf_dir, ["doc_id", "text"])).map_batches(
        rnd, batch_format="pandas"
    )


def _doc_langid(sf_dir: str):
    from hamerkop_ray.pipelines.text import lang_id

    # elastic (1, N) pool per the stage convention — a FIXED pool can
    # deadlock at low CPU counts while the upstream read holds a CPU
    return lang_id(_docs(sf_dir, ["doc_id", "text"]), concurrency=(1, 4))


def _doc_fingerprints(sf_dir: str):
    from hamerkop_ray.pipelines.text import fingerprints

    return fingerprints(_docs(sf_dir, ["doc_id", "text"]))


def _dedup_exact(sf_dir: str):
    from hamerkop_ray.pipelines.dedup import exact_dedup

    return exact_dedup(_docs(sf_dir, ["doc_id", "text"]))


def _dedup_minhash(sf_dir: str):
    from hamerkop_ray.pipelines.dedup import minhash_dedup

    return minhash_dedup(_docs(sf_dir, ["doc_id", "text"]), threshold=0.8)


def _dedup_simhash(sf_dir: str):
    from hamerkop_ray.pipelines.dedup import simhash_dedup

    return simhash_dedup(_docs(sf_dir, ["doc_id", "text"]), max_hamming=6)


def _ngram_jaccard(sf_dir: str):
    from hamerkop_ray.pipelines.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_docs(sf_dir, ["doc_id", "text"]), threshold=0.7)


def _simhash_pairs_exact(sf_dir: str):
    from hamerkop_ray.pipelines.dedup import simhash_pairs_exact

    return simhash_pairs_exact(
        _docs(sf_dir, ["doc_id", "text"]), max_hamming=3, band_bits=16
    )


def _ngram_jaccard_exact(sf_dir: str):
    from hamerkop_ray.pipelines.dedup import ngram_jaccard_pairs_exact

    return ngram_jaccard_pairs_exact(
        _docs(sf_dir, ["doc_id", "text"]), threshold=0.7
    )


def _emb_neardup(sf_dir: str):
    import ray.data as rd

    from hamerkop_ray.pipelines.dedup import embedding_neardup_pairs

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    return embedding_neardup_pairs(emb, threshold=0.35)


_ANN_QUERY_IDS = [0, 1, 2, 3, 4]


def _ann_queries(sf_dir: str):
    """Fetch ONLY the query vectors: parquet row-group filter pushdown, not
    a whole-table driver materialization."""
    emb = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "in", _ANN_QUERY_IDS)],
    )
    rows = dict(zip(emb["vec_id"].to_pylist(), emb["embedding"].to_pylist()))
    ids = sorted(rows)
    return ids, [rows[i] for i in ids]


def _ann_topk(sf_dir: str):
    import pandas as pd
    import ray.data as rd

    from hamerkop_ray.pipelines.ann import brute_force_topk

    ids, vecs = _ann_queries(sf_dir)
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    out = brute_force_topk(emb, ids, vecs, k=8, concurrency=2).to_pandas()
    out["cosine"] = out["cosine"].round(4)
    return out


def _ann_ivf(sf_dir: str):
    import ray.data as rd

    from hamerkop_ray.pipelines.ann import ivf_topk, kmeans_lite
    import numpy as np

    ids, vecs = _ann_queries(sf_dir)
    # centroid training sample: a few rows from EVERY row group (a
    # first-batch-only sample is biased when the input is sorted/clustered),
    # still bounded driver state — ≤64 rows per row group
    pf = pq.ParquetFile(f"{sf_dir}/embeddings.parquet")
    chunks = []
    per_rg = max(1, 256 // max(1, pf.num_row_groups))
    for rg in range(pf.num_row_groups):
        t = pf.read_row_group(rg, columns=["embedding"])
        n = t.num_rows
        step = max(1, n // per_rg)
        take = list(range(0, n, step))[:per_rg]
        chunks.extend(t["embedding"].take(take).to_pylist())
    sample = np.stack([np.asarray(v) for v in chunks])
    cents = kmeans_lite(sample, n_clusters=8)
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    out = ivf_topk(emb, ids, vecs, k=8, centroids=cents, nprobe=3, concurrency=2).to_pandas()
    out["cosine"] = out["cosine"].round(4)
    return out


def _emb_norms(sf_dir: str):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    def f(df: pd.DataFrame) -> pd.DataFrame:
        norms = df["embedding"].map(
            lambda v: round(float(np.sqrt(np.sum(np.asarray(v, dtype=np.float64) ** 2))), 4)
        )
        return pd.DataFrame({"vec_id": df["vec_id"], "l2_norm": norms})

    return rd.read_parquet(f"{sf_dir}/embeddings.parquet").map_batches(
        f, batch_format="pandas"
    )


def _emb_centroid_stats(sf_dir: str):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for label, g in df.groupby("label"):
            m = np.stack([np.asarray(v, dtype=np.float64) for v in g["embedding"]])
            out.append(
                {
                    "label": int(label),
                    "n": len(g),
                    "s0": m[:, 0].sum(),
                    "s1": m[:, 1].sum(),
                    "s2": m[:, 2].sum(),
                    "s3": m[:, 3].sum(),
                }
            )
        return pd.DataFrame(out)

    from ray.data.aggregate import Sum

    parts = rd.read_parquet(f"{sf_dir}/embeddings.parquet").map_batches(
        partial, batch_format="pandas"
    )
    agg = parts.groupby("label").aggregate(
        Sum("n", alias_name="n_vectors"),
        Sum("s0", alias_name="s0"),
        Sum("s1", alias_name="s1"),
        Sum("s2", alias_name="s2"),
        Sum("s3", alias_name="s3"),
    )
    df = agg.to_pandas()
    for i in range(4):
        df[f"d{i}_mean"] = (df[f"s{i}"] / df["n_vectors"]).round(4)
    return df[["label", "n_vectors", "d0_mean", "d1_mean", "d2_mean", "d3_mean"]]


def _similar_customer_names(sf_dir: str):
    import pandas as pd
    import ray.data as rd

    from hamerkop_ray.functions.editdist import levenshtein_batch

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name", "c_nationkey"]
    )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("c_custkey")
        keys = g["c_custkey"].tolist()
        names = g["c_name"].tolist()
        ia, ib = [], []
        for i in range(len(keys)):
            for j in range(i + 1, len(keys)):
                ia.append(i)
                ib.append(j)
        if not ia:
            return pd.DataFrame({"custkey_a": [], "custkey_b": [], "dist": []})
        d = levenshtein_batch([names[i] for i in ia], [names[j] for j in ib])
        out = pd.DataFrame(
            {
                "custkey_a": [keys[i] for i in ia],
                "custkey_b": [keys[j] for j in ib],
                "dist": d,
            }
        )
        return out[out["dist"] <= 2]

    return cust.groupby("c_nationkey").map_groups(pairs, batch_format="pandas")


def _similar_customer_names_blocked(sf_dir: str):
    """Scale path for similarity pair mining: identical output to
    similar_customer_names, but candidates come from FastSS deletion-
    neighborhood blocking (guaranteed recall for lev ≤ 2) instead of the
    O(n²)-per-nation all-pairs self-join."""
    import ray.data as rd

    from hamerkop_ray.pipelines.dedup import edit_distance_pairs_blocked

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name", "c_nationkey"]
    )
    out = edit_distance_pairs_blocked(
        cust, id_col="c_custkey", name_col="c_name", group_col="c_nationkey", k=2
    )

    import pyarrow as pa

    def rename(t: pa.Table) -> pa.Table:
        return pa.table(
            {"custkey_a": t["id_a"], "custkey_b": t["id_b"], "dist": t["dist"]}
        )

    return out.map_batches(rename, batch_format="pyarrow")


def _er_resolved(sf_dir: str):
    from hamerkop_ray.pipelines.flagship import run_flagship

    docs = _span_docs(sf_dir)
    # task-pool fused path (use_actors=False): identical semantics to the
    # actor pool, but warm Ray workers reuse the cached stage across
    # executions — no per-run actor spawn ramp (the same path the scaling
    # protocol measures)
    return run_flagship(docs, _kb(), concurrency=(2, 16),
                        use_actors=False)["mentions"]


def _er_resolved_full(sf_dir: str):
    """Flagship with the FULL composite blocking stack (exact + translit +
    char-ngram-idf + Double Metaphone + MinHash-LSH bands)."""
    from hamerkop_ray.pipelines.flagship import FULL_GEN_CONFIG, run_flagship

    docs = _span_docs(sf_dir)
    return run_flagship(docs, _kb(), gen_config=FULL_GEN_CONFIG,
                        concurrency=(2, 8), use_actors=False)["mentions"]


def _er_resolved_partitioned(sf_dir: str):
    """Flagship through the PARTITIONED (shuffle-join) scale path — the
    plan run_flagship auto-selects when the KB exceeds the broadcast
    threshold (distributed exact blocking + per-chain-group resolution +
    hash-join cluster labels; no whole-KB driver object).  Forced here on
    the small synth KB so the path is exercised and timed every round."""
    from hamerkop_ray.pipelines.flagship import run_flagship

    docs = _span_docs(sf_dir)
    return run_flagship(docs, _kb(), partitioned=True)["mentions"]


def _er_chains(sf_dir: str):
    from hamerkop_ray.stages.chains import Stage1Chains

    return _span_docs(sf_dir).map_batches(
        Stage1Chains(), batch_format="pyarrow"
    ).select_columns(
        ["doc_id", "chain_id", "name", "entity_type", "lang", "doc_type", "n_mentions"]
    )


def _events_sliding_windows(sf_dir: str):
    import ray.data as rd

    from hamerkop_ray.pipelines.streaming import sliding_window_counts

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_type"])
    return sliding_window_counts(ev, window_minutes=60, slide_minutes=30)


def _events_sessions(sf_dir: str):
    import ray.data as rd

    from hamerkop_ray.pipelines.streaming import sessionize

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"])
    return sessionize(ev, gap_minutes=30)


def _events_asof_orders(sf_dir: str):
    import ray.data as rd

    from hamerkop_ray.pipelines.temporal import asof_join

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id"])
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )
    return asof_join(
        ev, orders,
        key="user_id", right_key="o_custkey",
        left_on="ts", right_on="o_orderdate", tie_col="o_orderkey",
        left_cols=["event_id"], right_cols=["o_totalprice"],
    )


_RANGE_JOIN_WINDOW_US = 10 * 60_000_000  # 10 minutes


def _events_range_follow(sf_dir: str):
    """Range join (self): for each event, the same user's events in the
    strictly-following 10 minutes — the 'what happened next' window."""
    import pyarrow as pa
    import ray.data as rd

    from hamerkop_ray.pipelines.temporal import range_join

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id"])

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(["event_b", "ts_b", "user_id"])

    ev_b = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"]
    ).map_batches(rename, batch_format="pyarrow")
    return range_join(
        ev, ev_b,
        key="user_id", right_key="user_id",
        left_on="ts", right_on="ts_b",
        left_id="event_id", right_id="event_b",
        lo_us=1, hi_us=_RANGE_JOIN_WINDOW_US,
    )


EVENTS_RANGE_FOLLOW_SQL = f"""
SELECT a.user_id, a.event_id, epoch_us(a.ts) AS ts_us,
       b.event_id AS event_b, epoch_us(b.ts) AS ts_b_us
FROM events a
JOIN events b ON b.user_id = a.user_id
 AND epoch_us(b.ts) BETWEEN epoch_us(a.ts) + 1
                        AND epoch_us(a.ts) + {_RANGE_JOIN_WINDOW_US}
"""


def _events_window_rank(sf_dir: str):
    import ray.data as rd

    from hamerkop_ray.pipelines.temporal import window_rank_moving

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id", "value"])
    return window_rank_moving(ev, ma_window=5)


def _events_window_running(sf_dir: str):
    import ray.data as rd

    from hamerkop_ray.pipelines.temporal import window_lag_running

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts", "value"])
    return window_lag_running(ev)


def _top_tokens(sf_dir: str):
    from hamerkop_ray.pipelines.text import top_tokens

    return top_tokens(_docs(sf_dir, columns=["text"]), k=25)


_QUANTILE_QS = [0.25, 0.5, 0.75, 0.9, 0.99]


def _order_price_quantiles(sf_dir: str):
    import ray.data as rd

    from hamerkop_ray.pipelines.quantiles import exact_quantiles

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_totalprice"])
    return exact_quantiles(orders, "o_totalprice", _QUANTILE_QS)


def _order_price_quantiles_by_priority(sf_dir: str):
    import ray.data as rd

    from hamerkop_ray.pipelines.quantiles import exact_quantiles

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderpriority", "o_totalprice"])
    return exact_quantiles(orders, "o_totalprice", _QUANTILE_QS,
                           group_col="o_orderpriority")


def _tfidf_top_terms(sf_dir: str):
    from hamerkop_ray.pipelines.text import tfidf_top_terms

    return tfidf_top_terms(_docs(sf_dir, columns=["doc_id", "text"]), k=5)


def _doc_repetition(sf_dir: str):
    from hamerkop_ray.pipelines.text import repetition_signals

    return repetition_signals(_docs(sf_dir, columns=["doc_id", "text"]))


def _pii_redaction(sf_dir: str):
    """Deterministic PII-bearing contact strings built from c_custkey
    (the slim test customer table has no phone column), then scrubbed by
    the generic redact_pii operator.  The construction is mirrored
    verbatim in PII_REDACTION_SQL."""
    import pandas as pd
    import ray.data as rd

    from hamerkop_ray.pipelines.text import redact_pii

    def build(df: pd.DataFrame) -> pd.DataFrame:
        k = df["c_custkey"].astype("int64")
        ks = k.astype(str)
        return pd.DataFrame(
            {
                "c_custkey": k,
                "text": (
                    "contact cust" + ks + " <user" + ks
                    + "@example.com> ip 10." + (k % 256).astype(str)
                    + ".0." + (k % 100).astype(str)
                    + " tel +1-555-" + (k % 10000).astype(str).str.zfill(4)
                    + " ok"
                ),
            }
        )

    contacts = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"]
    ).map_batches(build, batch_format="pandas")
    return redact_pii(contacts, text_col="text", id_col="c_custkey")


PII_REDACTION_SQL = """
WITH t AS (
    SELECT c_custkey,
           'contact cust' || CAST(c_custkey AS VARCHAR) || ' <user'
           || CAST(c_custkey AS VARCHAR) || '@example.com> ip 10.'
           || CAST(c_custkey % 256 AS VARCHAR) || '.0.'
           || CAST(c_custkey % 100 AS VARCHAR) || ' tel +1-555-'
           || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') || ' ok'
           AS text
    FROM customer
), s1 AS (
    SELECT c_custkey,
           CAST(LEN(regexp_extract_all(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT)
               AS n_emails,
           regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
               '<EMAIL>', 'g') AS t1
    FROM t
), s2 AS (
    SELECT c_custkey, n_emails,
           CAST(LEN(regexp_extract_all(t1,
               '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS BIGINT)
               AS n_ips,
           regexp_replace(t1,
               '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b',
               '<IP>', 'g') AS t2
    FROM s1
), s3 AS (
    SELECT c_custkey, n_emails, n_ips,
           CAST(LEN(regexp_extract_all(t2, '\\+\\d{1,3}-\\d{3}-\\d{4}\\b'))
                AS BIGINT) AS n_phones,
           regexp_replace(t2, '\\+\\d{1,3}-\\d{3}-\\d{4}\\b', '<PHONE>', 'g')
               AS text_redacted
    FROM s2
)
SELECT c_custkey, text_redacted, n_emails, n_ips, n_phones FROM s3
"""


def _events_user_skew(sf_dir: str):
    import ray.data as rd

    from hamerkop_ray.pipelines.sketches import key_skew_report

    return key_skew_report(
        rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"]),
        "user_id")


def _embedding_kmeans(sf_dir: str):
    """Distributed spherical k-means assignments over the embeddings
    table.  No SQL oracle (iterative float algorithm); differential-
    tested against the single-process reference on identical input."""
    import ray.data as rd

    from hamerkop_ray.pipelines.ann import kmeans_distributed

    embs = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                           columns=["vec_id", "embedding"])
    out, _ = kmeans_distributed(embs, n_clusters=8, iters=5)
    return out


def _top_tokens_cms(sf_dir: str):
    """One-pass fixed-memory heavy hitters via Count-Min + per-batch
    candidates.  No SQL oracle (approximate by design); accuracy vs the
    exact operator is unit-tested on skewed data."""
    from hamerkop_ray.pipelines.sketches import top_tokens_cms

    return top_tokens_cms(_docs(sf_dir, columns=["text"]), k=25)


def _events_distinct_ids_hll(sf_dir: str):
    """Approximate distinct event ids via the HLL sketch (p=14, ~0.8%
    error) — one scan, 16 KiB partials, raw column never shuffles.  No
    SQL oracle (approximate); accuracy and partition-independence are
    unit-tested in tests/test_sketches.py."""
    import pyarrow as pa
    import ray.data as rd

    from hamerkop_ray.pipelines.sketches import hll_distinct

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])
    est = hll_distinct(ds, "event_id")
    return rd.from_arrow(
        pa.table({"n_distinct_hll": pa.array([est], pa.int64())})
    )


def _events_distinct_users_by_type_hll(sf_dir: str):
    """Per-event-type approximate distinct users via the HLL AggregateFn."""
    import ray.data as rd

    from hamerkop_ray.pipelines.sketches import HllDistinct

    return (
        rd.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "user_id"]
        )
        .groupby("event_type")
        .aggregate(HllDistinct("user_id", alias_name="n_users_hll"))
    )


def _doc_chunks(sf_dir: str):
    from hamerkop_ray.pipelines.packing import doc_chunks

    return doc_chunks(_docs(sf_dir, ["doc_id", "text"]), chunk_tokens=64)


def _doc_packing(sf_dir: str):
    from hamerkop_ray.pipelines.packing import doc_packing

    return doc_packing(_docs(sf_dir, ["doc_id", "lang", "text"]),
                       capacity=1024)


_DECONTAM_EVAL_FRAC = 0.02


def _doc_decontaminate(sf_dir: str):
    """Flag documents sharing word 3-grams with a deterministic 2%
    'benchmark' carve of the corpus (md5-fraction keyed on doc_id, the
    same predicate the SQL oracle uses)."""
    import ray

    from hamerkop_ray.pipelines.decontam import decontaminate, eval_ngrams
    from hamerkop_ray.pipelines.sampling import hash_sample

    docs = _docs(sf_dir, ["doc_id", "text"])
    ev = hash_sample(_docs(sf_dir, ["doc_id", "text"]),
                     _DECONTAM_EVAL_FRAC, "doc_id")
    grams_ref = ray.put(eval_ngrams(ev, n=3))
    return decontaminate(docs, grams_ref, n=3)


def _doc_decontaminate_sql() -> str:
    from hamerkop_ray.pipelines.decontam import decontaminate_sql
    from hamerkop_ray.pipelines.sampling import _threshold_hex

    pred = (f"substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)"
            f" < '{_threshold_hex(_DECONTAM_EVAL_FRAC)}'")
    return decontaminate_sql("documents", "doc_id", "text", 3, pred)


def _doc_mixture_sample(sf_dir: str):
    from hamerkop_ray.pipelines.sampling import mixture_sample

    return mixture_sample(_docs(sf_dir, ["doc_id", "lang"]), total=100,
                          group_col="lang", key_col="doc_id")


def _doc_sample_10pct(sf_dir: str):
    from hamerkop_ray.pipelines.sampling import hash_sample

    docs = _docs(sf_dir, columns=["doc_id", "lang", "n_chars"])
    return hash_sample(docs, 0.1, "doc_id")


def _doc_sample_stratified(sf_dir: str):
    from hamerkop_ray.pipelines.sampling import stratified_sample

    docs = _docs(sf_dir, columns=["doc_id", "lang"])
    return stratified_sample(docs, 20, group_col="lang", key_col="doc_id")


def queries() -> dict[str, Callable[[str], Any]]:
    """EXACTLY 50 entries — the driver's correctness check records at most
    50 queries per round (round 3 returned 59 and the last 9 in dict order,
    including the flagship ER trio, were silently dropped from
    CORRECTNESS_r03).  Consolidated out (still benched in bench.py and
    covered by tests): variants sharing a byte-identical oracle with a kept
    scale-path twin (similar_customer_names → _blocked,
    customers_without_orders → _bloom, order_price_quantiles →
    _by_priority) and approximate operators whose exact twin is
    oracle-pinned (ann_topk_ivf → ann_topk_bruteforce, dedup_simhash_docs →
    simhash_pairs_exact, ngram_jaccard_pairs → ngram_jaccard_pairs_exact,
    top_tokens_cms → top_tokens, the two HLL queries →
    events_user_skew/distinct_event_types); see EXTRA_QUERIES below."""
    return {
        # flagship entity resolution (non-SQL-expressible record linkage)
        "er_resolved_mentions": _er_resolved,
        "er_resolved_full_blocking": _er_resolved_full,
        "er_chains": _er_chains,
        # relational
        "q1_pricing_summary": rel.q1_pricing_summary,
        "q3_top_revenue_orders": rel.q3_top_revenue_orders,
        "q5_revenue_by_nation": rel.q5_revenue_by_nation,
        "orders_by_priority": rel.orders_by_priority,
        "events_hourly": rel.events_hourly,
        "top_users_by_value": rel.top_users_by_value,
        "events_sessions": _events_sessions,
        "events_sliding_windows": _events_sliding_windows,
        "events_asof_orders": _events_asof_orders,
        "events_range_follow": _events_range_follow,
        "events_window_rank": _events_window_rank,
        "events_window_running": _events_window_running,
        "order_price_quantiles_by_priority": _order_price_quantiles_by_priority,
        "part_brand_stats": rel.part_brand_stats,
        "supplier_balance_by_nation": rel.supplier_balance_by_nation,
        "lineitem_filter_agg": rel.lineitem_filter_agg,
        "customer_order_counts": rel.customer_order_counts,
        "distinct_event_types": rel.distinct_event_types,
        "customers_without_orders_bloom":
            rel.customers_without_orders_bloom,
        "top3_orders_per_priority": rel.top3_orders_per_priority,
        "events_type_pivot": rel.events_type_pivot,
        "orders_rollup": rel.orders_rollup,
        # sampling (deterministic, hash-keyed)
        "doc_sample_10pct": _doc_sample_10pct,
        "doc_sample_stratified": _doc_sample_stratified,
        "doc_mixture_sample": _doc_mixture_sample,
        # text analysis
        "top_tokens": _top_tokens,
        "tfidf_top_terms": _tfidf_top_terms,
        "doc_stats": _doc_stats,
        "doc_quality": _doc_quality,
        "doc_langid": _doc_langid,  # no SQL oracle (ngram profiles)
        "doc_fingerprints": _doc_fingerprints,
        "doc_repetition": _doc_repetition,
        "pii_redaction": _pii_redaction,
        "doc_decontaminate": _doc_decontaminate,
        # sequence chunking / packing
        "doc_chunks": _doc_chunks,
        "doc_packing": _doc_packing,
        # sketches / diagnostics
        "events_user_skew": _events_user_skew,
        # dedup
        "dedup_exact_docs": _dedup_exact,
        "dedup_minhash_docs": _dedup_minhash,  # no SQL oracle (LSH + components)
        "simhash_pairs_exact": _simhash_pairs_exact,
        "ngram_jaccard_pairs_exact": _ngram_jaccard_exact,
        "similar_customer_names_blocked": _similar_customer_names_blocked,
        "embedding_neardup_pairs": _emb_neardup,
        # similarity search
        "ann_topk_bruteforce": _ann_topk,
        "embedding_kmeans": _embedding_kmeans,  # no SQL oracle (iterative)
        "embedding_norms": _emb_norms,
        "embedding_centroid_stats": _emb_centroid_stats,
    }


def extra_queries() -> dict[str, Callable[[str], Any]]:
    """Operator variants consolidated out of queries() to fit the driver's
    50-entry correctness window (see queries() docstring) — still first-class
    library operators, benched by bench.py and covered by tests/."""
    return {
        "order_price_quantiles": _order_price_quantiles,
        "customers_without_orders": rel.customers_without_orders,
        "similar_customer_names": _similar_customer_names,
        "events_distinct_ids_hll": _events_distinct_ids_hll,
        "events_distinct_users_by_type_hll":
            _events_distinct_users_by_type_hll,
        "top_tokens_cms": _top_tokens_cms,
        "dedup_simhash_docs": _dedup_simhash,
        "ngram_jaccard_pairs": _ngram_jaccard,
        "ann_topk_ivf": _ann_ivf,
        "er_resolved_partitioned": _er_resolved_partitioned,
    }


def oracle_sql() -> dict[str, str]:
    """Oracles for queries() keys only (driver contract).  Oracles for the
    consolidated-out extra_queries() remain in all_oracle_sql() for the
    local checker (tools/check_queries.py)."""
    keep = set(queries())
    return {k: v for k, v in all_oracle_sql().items() if k in keep}


def all_oracle_sql() -> dict[str, str]:
    return {
        "q1_pricing_summary": rel.Q1_SQL,
        "q3_top_revenue_orders": rel.Q3_SQL,
        "q5_revenue_by_nation": rel.Q5_SQL,
        "orders_by_priority": rel.ORDERS_BY_PRIORITY_SQL,
        "events_hourly": rel.EVENTS_HOURLY_SQL,
        "top_users_by_value": rel.TOP_USERS_SQL,
        "events_sessions": __import__("hamerkop_ray.pipelines.streaming", fromlist=["SESSIONIZE_SQL"]).SESSIONIZE_SQL,
        # sliding 60-min windows on a 30-min slide: each event belongs to
        # ⌈60/30⌉ = 2 slide-aligned windows; mirror the per-row expansion
        "events_sliding_windows": """
            WITH ev AS (
              SELECT event_type, epoch_us(ts) AS us FROM events
            ), ex AS (
              SELECT event_type,
                     (us // 1800000000) * 1800000000
                       - w.i * 1800000000 AS start_us
              FROM ev, (SELECT unnest(range(0, 2)) AS i) w
              WHERE (us // 1800000000) * 1800000000 - w.i * 1800000000
                      + 3600000000 > us
                AND us >= (us // 1800000000) * 1800000000 - w.i * 1800000000
            )
            SELECT event_type, start_us // 1000000 AS window_start_epoch,
                   COUNT(*) AS n_events
            FROM ex GROUP BY 1, 2
        """,
        "events_asof_orders": __import__(
            "hamerkop_ray.pipelines.temporal", fromlist=["EVENTS_ASOF_ORDERS_SQL"]
        ).EVENTS_ASOF_ORDERS_SQL,
        "events_range_follow": EVENTS_RANGE_FOLLOW_SQL,
        "events_window_rank": __import__(
            "hamerkop_ray.pipelines.temporal",
            fromlist=["WINDOW_RANK_MOVING_SQL"]
        ).WINDOW_RANK_MOVING_SQL,
        "events_window_running": __import__(
            "hamerkop_ray.pipelines.temporal", fromlist=["WINDOW_LAG_RUNNING_SQL"]
        ).WINDOW_LAG_RUNNING_SQL,
        "order_price_quantiles": __import__(
            "hamerkop_ray.pipelines.quantiles", fromlist=["quantiles_sql"]
        ).quantiles_sql("orders", "o_totalprice", _QUANTILE_QS),
        "order_price_quantiles_by_priority": __import__(
            "hamerkop_ray.pipelines.quantiles", fromlist=["quantiles_sql"]
        ).quantiles_sql("orders", "o_totalprice", _QUANTILE_QS,
                        group_col="o_orderpriority"),
        "top_tokens": __import__(
            "hamerkop_ray.pipelines.text", fromlist=["TOP_TOKENS_SQL"]
        ).TOP_TOKENS_SQL,
        "tfidf_top_terms": __import__(
            "hamerkop_ray.pipelines.text", fromlist=["TFIDF_TOP_TERMS_SQL"]
        ).TFIDF_TOP_TERMS_SQL,
        "doc_repetition": __import__(
            "hamerkop_ray.pipelines.text", fromlist=["REPETITION_SQL"]
        ).REPETITION_SQL,
        "pii_redaction": PII_REDACTION_SQL,
        "doc_decontaminate": _doc_decontaminate_sql(),
        "doc_chunks": __import__(
            "hamerkop_ray.pipelines.packing", fromlist=["doc_chunks_sql"]
        ).doc_chunks_sql(64),
        "doc_packing": __import__(
            "hamerkop_ray.pipelines.packing", fromlist=["doc_packing_sql"]
        ).doc_packing_sql(1024),
        "events_user_skew": __import__(
            "hamerkop_ray.pipelines.sketches", fromlist=["key_skew_report_sql"]
        ).key_skew_report_sql("events", "user_id"),
        "doc_sample_10pct": __import__(
            "hamerkop_ray.pipelines.sampling", fromlist=["hash_sample_sql"]
        ).hash_sample_sql("documents", "doc_id", 0.1,
                          select="doc_id, lang, n_chars"),
        "doc_sample_stratified": __import__(
            "hamerkop_ray.pipelines.sampling",
            fromlist=["stratified_sample_sql"]
        ).stratified_sample_sql("documents", "lang", "doc_id", 20),
        "doc_mixture_sample": __import__(
            "hamerkop_ray.pipelines.sampling",
            fromlist=["mixture_sample_sql"]
        ).mixture_sample_sql("documents", "lang", "doc_id", 100),
        "part_brand_stats": rel.PART_BRAND_SQL,
        "supplier_balance_by_nation": rel.SUPPLIER_BAL_SQL,
        "lineitem_filter_agg": rel.LINEITEM_FILTER_SQL,
        "customer_order_counts": rel.CUSTOMER_ORDER_COUNTS_SQL,
        "distinct_event_types": rel.DISTINCT_EVENT_TYPES_SQL,
        "customers_without_orders": rel.CUSTOMERS_WITHOUT_ORDERS_SQL,
        "customers_without_orders_bloom": rel.CUSTOMERS_WITHOUT_ORDERS_SQL,
        "top3_orders_per_priority": rel.TOP3_PER_PRIORITY_SQL,
        "events_type_pivot": rel.EVENTS_TYPE_PIVOT_SQL,
        "orders_rollup": rel.ORDERS_ROLLUP_SQL,
        "doc_stats": """
            SELECT doc_id, LENGTH(text) AS n_chars,
                   LEN(LIST_FILTER(STRING_SPLIT_REGEX(text, '\\s+'), x -> x <> '')) AS n_tokens
            FROM documents
        """,
        # mirrors functions/textstats.quality_features exactly (ASCII corpus:
        # RE2 [\w\s]/[0-9] == python re semantics); floats rounded to 6
        # decimals on BOTH sides for the value-hash compare
        "doc_quality": """
            WITH t AS (
              SELECT doc_id,
                     LENGTH(text) AS n_chars,
                     LIST_FILTER(STRING_SPLIT_REGEX(text, '\\s+'), x -> x <> '') AS toks,
                     LENGTH(REGEXP_REPLACE(text, '[\\w\\s]', '', 'g')) AS n_punct,
                     LENGTH(REGEXP_REPLACE(text, '[^0-9]', '', 'g')) AS n_digit
              FROM documents
            ), u AS (
              SELECT doc_id, n_chars,
                     LEN(toks) AS n_tokens,
                     COALESCE(LIST_AVG(LIST_TRANSFORM(toks, x -> LENGTH(x))), 0.0) AS mean_token_len,
                     CASE WHEN LEN(toks) = 0 THEN 0.0 ELSE
                       CAST(LEN(LIST_FILTER(toks, x -> LIST_CONTAINS(
                         ['the','a','an','and','or','of','to','in','is','are',
                          'was','were','be','been','it','this','that','with',
                          'for','on','as','at','by','from','not','but','they',
                          'their','there','what','which','when','who','how','all'],
                         LOWER(x)))) AS DOUBLE) / LEN(toks) END AS stopword_ratio,
                     CAST(n_punct AS DOUBLE) / GREATEST(n_chars, 1) AS punct_ratio,
                     CAST(n_digit AS DOUBLE) / GREATEST(n_chars, 1) AS digit_ratio,
                     CASE WHEN LEN(toks) = 0 THEN 0.0 ELSE
                       CAST(LEN(LIST_DISTINCT(toks)) AS DOUBLE) / LEN(toks)
                     END AS uniq_token_ratio
              FROM t
            )
            SELECT doc_id, n_chars, n_tokens,
                   ROUND(mean_token_len, 6) AS mean_token_len,
                   ROUND(stopword_ratio, 6) AS stopword_ratio,
                   ROUND(punct_ratio, 6) AS punct_ratio,
                   ROUND(digit_ratio, 6) AS digit_ratio,
                   ROUND(uniq_token_ratio, 6) AS uniq_token_ratio,
                   ROUND(LEAST(n_tokens, 256) / 256.0 * 0.25
                         + (1 - LEAST(punct_ratio, 1)) * 0.2
                         + (1 - LEAST(digit_ratio, 1)) * 0.15
                         + LEAST(stopword_ratio, 0.5) * 2 * 0.2
                         + uniq_token_ratio * 0.2, 6) AS quality_score
            FROM u
        """,
        # exact SimHash Hamming search: FNV-1a simhash reproduced bit-exactly
        # in SQL (same HUGEINT FNV as doc_fingerprints; per-occurrence ±1 bit
        # votes; acc > 0 sets the bit), then all-pairs XOR + bit_count — the
        # ground truth the pigeonhole-banded distributed join must equal
        "simhash_pairs_exact": """
            WITH norm AS (
              SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                     trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS s
              FROM documents
            ), toks AS (
              SELECT doc_id, unnest(
                CASE WHEN length(s) < 3 THEN
                       CASE WHEN s = '' THEN [] ELSE [s] END
                     ELSE list_transform(range(1, length(s) - 1),
                                         i -> substr(s, CAST(i AS INTEGER), 3))
                END) AS tok
              FROM norm
            ), hashed AS (
              SELECT doc_id,
                     list_reduce(
                       list_prepend(CAST(14695981039346656037 AS HUGEINT),
                         CAST(list_transform(range(1, length(tok) + 1), j ->
                           unicode(substr(tok, CAST(j AS INTEGER), 1))) AS HUGEINT[])),
                       (acc, c) -> (xor(acc, c % 256) * 1099511628211)
                                   % 18446744073709551616
                     ) AS h
              FROM toks
            ), bits AS (
              SELECT doc_id, b.i AS i,
                     SUM(CASE WHEN (h // (CAST(1 AS HUGEINT) << b.i)) % 2 = 1
                              THEN 1 ELSE -1 END) AS acc
              FROM hashed, (SELECT unnest(range(0, 64)) AS i) b
              GROUP BY doc_id, b.i
            ), sim AS (
              SELECT doc_id,
                     COALESCE(SUM(CASE WHEN acc > 0
                                       THEN CAST(1 AS HUGEINT) << i
                                       ELSE 0 END), 0) AS sh
              FROM bits GROUP BY doc_id
            ), signed AS (
              SELECT doc_id,
                     CAST(CASE WHEN sh >= CAST(1 AS HUGEINT) << 63
                               THEN sh - (CAST(1 AS HUGEINT) << 64)
                               ELSE sh END AS BIGINT) AS sb
              FROM sim
            )
            SELECT a.doc_id AS src, b.doc_id AS dst,
                   CAST(bit_count(xor(a.sb, b.sb)) AS BIGINT) AS hamming
            FROM signed a JOIN signed b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.sb, b.sb)) <= 3
        """,
        # exact n-gram Jaccard ssjoin: the SQL all-pairs self-join is the
        # ground truth the prefix-filtered distributed join must reproduce
        # exactly (same shingle normalization as functions/strings.shingles:
        # lowercase, \s+ -> ' ', strip; short strings become one whole-string
        # token; jaccard = o / (|a| + |b| - o) in float64 on both sides)
        "ngram_jaccard_pairs_exact": """
            WITH norm AS (
              SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                     trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS s
              FROM documents
            ), toks AS (
              SELECT doc_id, unnest(list_distinct(
                CASE WHEN length(s) < 3 THEN
                       CASE WHEN s = '' THEN [] ELSE [s] END
                     ELSE list_transform(range(1, length(s) - 1),
                                         i -> substr(s, CAST(i AS INTEGER), 3))
                END)) AS tok
              FROM norm
            ), sizes AS (
              SELECT doc_id, count(*) AS sz FROM toks GROUP BY doc_id
            ), inter AS (
              SELECT a.doc_id AS src, b.doc_id AS dst, count(*) AS o
              FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            )
            SELECT i.src, i.dst,
                   CAST(i.o AS DOUBLE) / (sa.sz + sb.sz - i.o) AS jaccard
            FROM inter i
            JOIN sizes sa ON sa.doc_id = i.src
            JOIN sizes sb ON sb.doc_id = i.dst
            WHERE CAST(i.o AS DOUBLE) / (sa.sz + sb.sz - i.o) >= 0.7
        """,
        # bit-exact FNV-1a winnowing fingerprint (textstats.rolling_fingerprint)
        # via list_reduce with HUGEINT arithmetic mod 2^64
        "doc_fingerprints": """
            WITH n AS (
              SELECT doc_id,
                     array_to_string(LIST_FILTER(STRING_SPLIT_REGEX(lower(text), '\\s+'), x -> x <> ''), ' ') AS norm0
              FROM documents
            ), p AS (
              SELECT doc_id, CASE WHEN LENGTH(norm0) < 8 THEN rpad(norm0, 8, ' ') ELSE norm0 END AS norm
              FROM n
            ), h AS (
              SELECT doc_id,
                     list_transform(range(1, LENGTH(norm) - 8 + 2), i ->
                       list_reduce(
                         list_prepend(CAST(14695981039346656037 AS HUGEINT),
                           CAST(list_transform(range(0, 8), j ->
                             unicode(substr(norm, CAST(i + j AS INT), 1))) AS HUGEINT[])),
                         (acc, c) -> (xor(acc, c % 256) * 1099511628211) % 18446744073709551616
                       )) AS hs
              FROM p
            )
            SELECT doc_id,
                   array_to_string(
                     list_transform(list_sort(list_distinct(hs))[1:4],
                       v -> lower(lpad(to_hex(CAST(v AS UBIGINT)), 16, '0'))), '-') AS fingerprint
            FROM h
        """,
        "dedup_exact_docs": "SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text",
        "similar_customer_names": """
            SELECT a.c_custkey AS custkey_a, b.c_custkey AS custkey_b,
                   LEVENSHTEIN(a.c_name, b.c_name) AS dist
            FROM customer a
            JOIN customer b
              ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
            WHERE LEVENSHTEIN(a.c_name, b.c_name) <= 2
        """,
        "similar_customer_names_blocked": """
            SELECT a.c_custkey AS custkey_a, b.c_custkey AS custkey_b,
                   LEVENSHTEIN(a.c_name, b.c_name) AS dist
            FROM customer a
            JOIN customer b
              ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
            WHERE LEVENSHTEIN(a.c_name, b.c_name) <= 2
        """,
        "embedding_neardup_pairs": """
            SELECT a.vec_id AS src, b.vec_id AS dst,
                   ROUND(LIST_COSINE_SIMILARITY(CAST(a.embedding AS DOUBLE[]),
                                                CAST(b.embedding AS DOUBLE[])), 4) AS cosine
            FROM embeddings a
            JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
            WHERE LIST_COSINE_SIMILARITY(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[])) >= 0.35
        """,
        "ann_topk_bruteforce": """
            WITH q AS (
                SELECT vec_id AS query_id, embedding AS qv FROM embeddings
                WHERE vec_id IN (0, 1, 2, 3, 4)
            ), scored AS (
                SELECT q.query_id, e.vec_id,
                       LIST_COSINE_SIMILARITY(CAST(q.qv AS DOUBLE[]),
                                              CAST(e.embedding AS DOUBLE[])) AS cos
                FROM q CROSS JOIN embeddings e
                WHERE e.vec_id <> q.query_id
            ), ranked AS (
                SELECT query_id, vec_id, cos,
                       ROW_NUMBER() OVER (PARTITION BY query_id
                                          ORDER BY cos DESC, vec_id) AS rn
                FROM scored
            )
            SELECT query_id, vec_id, ROUND(cos, 4) AS cosine
            FROM ranked WHERE rn <= 8
        """,
        "embedding_norms": """
            SELECT vec_id,
                   ROUND(SQRT(LIST_SUM(LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE) * x))), 4) AS l2_norm
            FROM embeddings
        """,
        "embedding_centroid_stats": """
            SELECT label, COUNT(*) AS n_vectors,
                   ROUND(AVG(CAST(embedding[1] AS DOUBLE)), 4) AS d0_mean,
                   ROUND(AVG(CAST(embedding[2] AS DOUBLE)), 4) AS d1_mean,
                   ROUND(AVG(CAST(embedding[3] AS DOUBLE)), 4) AS d2_mean,
                   ROUND(AVG(CAST(embedding[4] AS DOUBLE)), 4) AS d3_mean
            FROM embeddings GROUP BY label
        """,
    }
