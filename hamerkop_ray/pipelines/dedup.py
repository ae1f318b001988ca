"""Deduplication pipelines: exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Shapes (see /opt/skills/guides/ray_guide.md dedup pattern and the MinHash/LSH
literature):
  exact     content-hash per batch → shuffle ONLY (hash, id) pairs (never the
            payload) → min-id winner per hash group.
  minhash   shingle→signature per batch → explode to (band_key, id) rows →
            groupby(band) → candidate pairs (bucket cap logged) → verify by
            signature-estimated Jaccard → connected components (stages.cluster
            star contraction) → (doc_id, cluster_id) assignment.
  simhash   64-bit simhash per batch → 4×16-bit band buckets → verify by
            Hamming distance ≤ k → components.
  ngram     same LSH bucketing, verified with EXACT character n-gram Jaccard
            (texts carried only inside small buckets).
  embedding cosine near-dup within coarse blocks (numpy matmul per block).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.minhash import MinHasher, exact_jaccard, hamming64, simhash
from ..stages.cluster import connected_components


def _text_hash(texts) -> list[str]:
    return [
        hashlib.blake2b(t.encode("utf-8"), digest_size=16).hexdigest() for t in texts
    ]


def exact_dedup(docs, text_col: str = "text", id_col: str = "doc_id"):
    """→ (doc_id,) winners: the minimum id per distinct text.  Only narrow
    (hash, id) pairs enter the shuffle."""
    from ray.data.aggregate import Min

    def hash_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {"h": pa.array(_text_hash(t[text_col].to_pylist())), id_col: t[id_col]}
        )

    winners = (
        docs.map_batches(hash_rows, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Min(id_col, alias_name=id_col))
    )
    return winners.drop_columns(["h"])


class _MinhashBands:
    def __init__(self, num_perm=64, shingle_n=3, bands=16, text_col="text", id_col="doc_id"):
        self.h = MinHasher(num_perm=num_perm, shingle_n=shingle_n, seed=1)
        self.bands = bands
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, keys, sigs = [], [], []
        for i, text in zip(t[self.id_col].to_pylist(), t[self.text_col].to_pylist()):
            sig = self.h.signature(text)
            sig_bytes = sig.tobytes()
            for key in self.h.band_keys(text, self.bands):
                ids.append(str(i))
                keys.append(key)
                sigs.append(sig_bytes)
        return pa.table(
            {
                "band": pa.array(keys, pa.string()),
                "id": pa.array(ids, pa.string()),
                "sig": pa.array(sigs, pa.binary()),
            }
        )


def minhash_dedup(
    docs,
    *,
    threshold: float = 0.8,
    num_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket: int = 512,
):
    """→ Dataset (node=id, label=cluster representative id) for near-dup
    groups (pairs verified at estimated Jaccard ≥ threshold).  Ids absent
    from the output are singletons."""

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        rows = g.drop_duplicates("id")
        if len(rows) > max_bucket:  # cap logged by caller; deterministic trim
            rows = rows.sort_values("id").head(max_bucket)
        ids = rows["id"].tolist()
        sigs = [np.frombuffer(b, dtype=np.uint64) for b in rows["sig"]]
        src, dst = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                est = float(np.mean(sigs[i] == sigs[j]))
                if est >= threshold:
                    a, b = sorted((ids[i], ids[j]))
                    src.append(a)
                    dst.append(b)
        return pd.DataFrame({"src": src, "dst": dst})

    bands_ds = docs.map_batches(
        _MinhashBands(num_perm, shingle_n, bands, text_col, id_col),
        batch_format="pyarrow",
    )
    edges = bands_ds.groupby("band").map_groups(bucket_pairs, batch_format="pandas")
    return connected_components(edges)


class _SimhashRows:
    def __init__(self, text_col="text", id_col="doc_id", band_bits=16):
        self.text_col = text_col
        self.id_col = id_col
        self.band_bits = band_bits

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, keys, hashes = [], [], []
        nbands = 64 // self.band_bits
        mask = (1 << self.band_bits) - 1
        for i, text in zip(t[self.id_col].to_pylist(), t[self.text_col].to_pylist()):
            h = simhash(text)
            for b in range(nbands):
                ids.append(str(i))
                keys.append(f"{b}:{(h >> (b * self.band_bits)) & mask:04x}")
                hashes.append(h)
        return pa.table(
            {
                "band": pa.array(keys, pa.string()),
                "id": pa.array(ids, pa.string()),
                "h": pa.array(hashes, pa.uint64()),
            }
        )


def simhash_dedup(docs, *, max_hamming: int = 6, text_col="text", id_col="doc_id",
                  max_bucket: int = 512):
    """SimHash near-dup: 4×16-bit bands (any k≤3-bit difference collides in
    ≥1 band) verified by full 64-bit Hamming distance ≤ max_hamming."""

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        rows = g.drop_duplicates("id")
        if len(rows) > max_bucket:
            rows = rows.sort_values("id").head(max_bucket)
        ids = rows["id"].tolist()
        hs = rows["h"].tolist()
        src, dst = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if hamming64(int(hs[i]), int(hs[j])) <= max_hamming:
                    a, b = sorted((ids[i], ids[j]))
                    src.append(a)
                    dst.append(b)
        return pd.DataFrame({"src": src, "dst": dst})

    rows = docs.map_batches(_SimhashRows(text_col, id_col), batch_format="pyarrow")
    edges = rows.groupby("band").map_groups(bucket_pairs, batch_format="pandas")
    return connected_components(edges)


def ngram_jaccard_pairs(
    docs,
    *,
    threshold: float = 0.7,
    shingle_n: int = 3,
    bands: int = 16,
    text_col="text",
    id_col="doc_id",
    max_bucket: int = 256,
):
    """→ Dataset (src, dst, jaccard): LSH-bucketed candidates, pre-filtered
    with a vectorized MinHash-signature estimate, then verified with EXACT
    n-gram Jaccard (shingle sets computed once per bucket member; texts ride
    only inside buckets)."""
    h = MinHasher(num_perm=64, shingle_n=shingle_n, seed=1)

    def band_rows(t: pa.Table) -> pa.Table:
        ids, keys, texts, sigs = [], [], [], []
        for i, text in zip(t[id_col].to_pylist(), t[text_col].to_pylist()):
            sig = h.signature(text).tobytes()
            for key in h.band_keys(text, bands):
                ids.append(str(i))
                keys.append(key)
                texts.append(text)
                sigs.append(sig)
        return pa.table(
            {"band": pa.array(keys), "id": pa.array(ids),
             "text": pa.array(texts), "sig": pa.array(sigs, pa.binary())}
        )

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        rows = g.drop_duplicates("id")
        if len(rows) > max_bucket:
            rows = rows.sort_values("id").head(max_bucket)
        ids = rows["id"].tolist()
        texts = rows["text"].tolist()
        sigs = np.stack([np.frombuffer(b, dtype=np.uint64) for b in rows["sig"]])
        # vectorized estimate over all pairs; exact verify only survivors
        est = (sigs[:, None, :] == sigs[None, :, :]).mean(axis=2)
        iu, ju = np.triu_indices(len(ids), k=1)
        cand = (est[iu, ju] >= threshold - 0.15).nonzero()[0]
        from ..functions.strings import shingles as _sh

        sets: dict[int, set] = {}

        def sset(i: int) -> set:
            if i not in sets:
                sets[i] = set(_sh(texts[i], shingle_n))
            return sets[i]

        src, dst, jac = [], [], []
        for k in cand:
            i, j = int(iu[k]), int(ju[k])
            si, sj = sset(i), sset(j)
            union = len(si | sj)
            jv = (len(si & sj) / union) if union else 1.0
            if jv >= threshold:
                a, b = sorted((ids[i], ids[j]))
                src.append(a)
                dst.append(b)
                jac.append(jv)
        return pd.DataFrame(
            {
                "src": pd.Series(src, dtype="object"),
                "dst": pd.Series(dst, dtype="object"),
                "jaccard": pd.Series(jac, dtype="float64"),
            }
        )

    pairs = (
        docs.map_batches(band_rows, batch_format="pyarrow")
        .groupby("band")
        .map_groups(verify, batch_format="pandas")
    )

    # duplicate (src, dst) rows can arrive from multiple shared bands → dedup
    from ray.data.aggregate import Max

    return pairs.groupby(["src", "dst"]).aggregate(Max("jaccard", alias_name="jaccard"))


def embedding_neardup_pairs(
    embeddings,
    *,
    threshold: float = 0.95,
    block_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Cosine near-dup pairs within coarse blocks (block_col) — numpy matmul
    per block.  For unblocked data pass a projection-bucket column."""

    def block_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].tolist()
        m = np.stack([np.asarray(v, dtype=np.float64) for v in g[vec_col]])
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1
        m = m / norms
        sims = m @ m.T
        src, dst, s = [], [], []
        n = len(ids)
        iu, ju = np.triu_indices(n, k=1)
        hits = sims[iu, ju] >= threshold
        for i, j, sim in zip(iu[hits], ju[hits], sims[iu, ju][hits]):
            a, b = sorted((int(ids[i]), int(ids[j])))
            src.append(a)
            dst.append(b)
            s.append(round(float(sim), 4))
        return pd.DataFrame(
            {
                "src": pd.Series(src, dtype="int64"),
                "dst": pd.Series(dst, dtype="int64"),
                "cosine": pd.Series(s, dtype="float64"),
            }
        )

    return embeddings.groupby(block_col).map_groups(block_pairs, batch_format="pandas")
