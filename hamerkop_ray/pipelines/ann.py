"""Similarity search over an embedding column (list<float>).

  brute_force_topk — EXACT cosine top-k: the query matrix is broadcast
  (ray.put once, read per actor), each batch does one numpy matmul and emits
  its local top-k per query (bounded rows), a final small per-query groupby
  picks the global top-k.  The full corpus is never shuffled — only
  (n_queries × k) candidate rows per batch.

  ivf_topk — scale path: coarse quantization by nearest centroid; probe only
  the nprobe closest centroid buckets.  Approximate (recall < 1), returns the
  same schema.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1
    return m / n


class _BatchTopK:
    """Actor-pool stage holding the broadcast query matrix."""

    def __init__(self, queries_ref, k: int, id_col: str, vec_col: str):
        import ray

        q = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) else queries_ref
        self.qids = np.asarray(q[0])
        self.qmat = _normalize(np.asarray(q[1], dtype=np.float64))
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = np.asarray(t[self.id_col].to_pylist())
        vecs = np.stack(
            [np.asarray(v, dtype=np.float64) for v in t[self.vec_col].to_pylist()]
        )
        sims = self.qmat @ _normalize(vecs).T  # (nq, batch)
        k = min(self.k, sims.shape[1])
        idx = np.argpartition(-sims, kth=k - 1, axis=1)[:, :k]
        out_q, out_v, out_s = [], [], []
        for qi in range(sims.shape[0]):
            for j in idx[qi]:
                out_q.append(int(self.qids[qi]))
                out_v.append(int(ids[j]))
                out_s.append(float(sims[qi, j]))
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "cosine": pa.array(out_s, pa.float64()),
            }
        )


def brute_force_topk(
    embeddings,
    query_ids: list[int],
    query_vectors,
    k: int = 8,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
    concurrency=4,
):
    """→ Dataset (query_id, vec_id, cosine): exact top-k per query."""
    import ray

    qref = ray.put((list(query_ids), np.asarray(query_vectors, dtype=np.float64)))
    partials = embeddings.map_batches(
        _BatchTopK,
        fn_constructor_kwargs=dict(queries_ref=qref, k=k, id_col=id_col, vec_col=vec_col),
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        if exclude_self:
            g = g[g["vec_id"] != g["query_id"]]
        # deterministic order: similarity desc, then vec_id asc
        g = g.sort_values(["cosine", "vec_id"], ascending=[False, True]).head(k)
        return g

    return partials.groupby("query_id").map_groups(final_topk, batch_format="pandas")


def kmeans_lite(vectors: np.ndarray, n_clusters: int, iters: int = 10) -> np.ndarray:
    """Deterministic mini k-means (first-n init) for IVF coarse quantization."""
    v = _normalize(np.asarray(vectors, dtype=np.float64))
    centroids = v[:n_clusters].copy()
    for _ in range(iters):
        assign = np.argmax(v @ centroids.T, axis=1)
        for c in range(n_clusters):
            members = v[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
        centroids = _normalize(centroids)
    return centroids


def kmeans_distributed(
    embeddings,
    n_clusters: int = 8,
    iters: int = 5,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    concurrency=(1, 4),
):
    """Distributed spherical Lloyd's k-means — the iterative-algorithm
    pattern on Ray Data: each iteration is ONE streaming pass where every
    batch assigns rows to the broadcast centroids and emits a (k×d sum,
    k count) partial; the driver reduces k×d floats (centroid-sized, not
    corpus-sized), renormalizes, and re-broadcasts.  The vectors
    themselves never shuffle and never collect.

    Init is deterministic: the n_clusters vectors with the smallest ids,
    found with a per-batch top-k combiner (no global sort).  Returns
    (assignments Dataset (id_col, cluster), centroids ndarray).  Same
    cosine/argmax semantics as kmeans_lite (the IVF coarse quantizer) —
    differential-tested against it on identical input."""
    import ray

    import pyarrow.compute as pc

    # ---- deterministic init: k smallest ids, combiner-style
    def id_partial(t: pa.Table) -> pa.Table:
        if t.num_rows > n_clusters:
            idx = pc.select_k_unstable(
                t, k=n_clusters, sort_keys=[(id_col, "ascending")])
            t = t.take(idx)
        return t

    cand = pa.concat_tables(
        b for b in embeddings.map_batches(
            id_partial, batch_format="pyarrow"
        ).iter_batches(batch_format="pyarrow")
    )
    cand = cand.sort_by(id_col).slice(0, n_clusters)
    centroids = _normalize(np.stack(
        [np.asarray(v, dtype=np.float64) for v in cand[vec_col].to_pylist()]
    ))

    # per-iteration pass is a STATELESS task fn (not an actor pool): tasks
    # reuse warm Ray workers across iterations, so there is no per-iteration
    # actor-spawn ramp; the centroids ObjectRef resolves from the worker's
    # local object store (zero-copy numpy)
    def partial_pass(t: pa.Table, *, cents_ref) -> pa.Table:
        cents = ray.get(cents_ref)
        k, d = cents.shape
        sums = np.zeros((k, d), np.float64)
        counts = np.zeros(k, np.int64)
        if t.num_rows:
            vecs = _normalize(np.stack(
                [np.asarray(v, dtype=np.float64)
                 for v in t[vec_col].to_pylist()]))
            assign = np.argmax(vecs @ cents.T, axis=1)
            np.add.at(sums, assign, vecs)
            counts = np.bincount(assign, minlength=k).astype(np.int64)
        return pa.table(
            {"sums": pa.array([sums.tobytes()], pa.binary()),
             "counts": pa.array([counts.tobytes()], pa.binary())}
        )

    k, d = centroids.shape
    for _ in range(iters):
        cents_ref = ray.put(centroids)
        sums = np.zeros((k, d), np.float64)
        counts = np.zeros(k, np.int64)
        for b in embeddings.map_batches(
            partial_pass, fn_kwargs=dict(cents_ref=cents_ref),
            batch_format="pyarrow", num_cpus=1,
        ).iter_batches(batch_format="pyarrow"):
            for sraw, craw in zip(b["sums"].to_pylist(),
                                  b["counts"].to_pylist()):
                sums += np.frombuffer(sraw, np.float64).reshape(k, d)
                counts += np.frombuffer(craw, np.int64)
        nonempty = counts > 0
        centroids[nonempty] = sums[nonempty] / counts[nonempty, None]
        centroids = _normalize(centroids)

    cents_ref = ray.put(centroids)

    class Assign:
        def __init__(self):
            self.cents = ray.get(cents_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table(
                    {id_col: pa.array([], pa.int64()),
                     "cluster": pa.array([], pa.int64())})
            vecs = _normalize(np.stack(
                [np.asarray(v, dtype=np.float64)
                 for v in t[vec_col].to_pylist()]))
            assign = np.argmax(vecs @ self.cents.T, axis=1)
            return pa.table(
                {id_col: pc.cast(t[id_col], pa.int64()),
                 "cluster": pa.array(assign, pa.int64())}
            )

    out = embeddings.map_batches(
        Assign, batch_format="pyarrow", concurrency=concurrency, num_cpus=1)
    return out, centroids


def ivf_topk(
    embeddings,
    query_ids: list[int],
    query_vectors,
    k: int = 8,
    *,
    centroids: np.ndarray,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    concurrency=4,
):
    """IVF-style approximate top-k: rows whose nearest centroid is not among
    each query's nprobe closest lists are skipped inside the batch kernel."""
    import ray

    cents = _normalize(np.asarray(centroids, dtype=np.float64))
    qmat = _normalize(np.asarray(query_vectors, dtype=np.float64))
    probe_lists = np.argsort(-(qmat @ cents.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    qref = ray.put((list(query_ids), qmat, cents, probe_lists))

    class _IVFTopK:
        def __init__(self):
            qids, qm, cs, pl = ray.get(qref)
            self.qids, self.qmat, self.cents, self.probe = qids, qm, cs, pl
            self.k = k

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = np.asarray(t[id_col].to_pylist())
            vecs = _normalize(
                np.stack([np.asarray(v, dtype=np.float64) for v in t[vec_col].to_pylist()])
            )
            row_cent = np.argmax(vecs @ self.cents.T, axis=1)  # (batch,)
            out_q, out_v, out_s = [], [], []
            for qi, qid in enumerate(self.qids):
                mask = np.isin(row_cent, self.probe[qi])
                if not mask.any():
                    continue
                sims = vecs[mask] @ self.qmat[qi]
                sub_ids = ids[mask]
                kk = min(self.k, len(sims))
                idx = np.argpartition(-sims, kth=kk - 1)[:kk]
                for j in idx:
                    out_q.append(int(qid))
                    out_v.append(int(sub_ids[j]))
                    out_s.append(float(sims[j]))
            return pa.table(
                {
                    "query_id": pa.array(out_q, pa.int64()),
                    "vec_id": pa.array(out_v, pa.int64()),
                    "cosine": pa.array(out_s, pa.float64()),
                }
            )

    partials = embeddings.map_batches(
        _IVFTopK, batch_format="pyarrow", concurrency=concurrency, num_cpus=1
    )

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g[g["vec_id"] != g["query_id"]]
        return g.sort_values(["cosine", "vec_id"], ascending=[False, True]).head(k)

    return partials.groupby("query_id").map_groups(final_topk, batch_format="pandas")
