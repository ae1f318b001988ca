"""Dedup pipelines on a corpus with PLANTED duplicates + ANN vs numpy oracle."""

import numpy as np
import pytest

from hamerkop_ray.ids import stable_hash64

BASE_TEXTS = [
    "the quick brown fox jumps over the lazy dog near the river bank today",
    "a completely different document about spark streaming and batch windows",
    "entity resolution requires blocking pairwise scoring and clustering steps",
    "minhash signatures estimate jaccard similarity between shingle sets well",
    "connected components can be computed with star contraction in logn rounds",
]


def planted_corpus():
    """20 docs: 5 base texts, each with 2 near-dups (1-word change) and one
    exact dup; plus 0 unrelated."""
    rows = []
    did = 0
    for b, text in enumerate(BASE_TEXTS):
        rows.append({"doc_id": did, "text": text}); did += 1
        rows.append({"doc_id": did, "text": text}); did += 1  # exact dup
        words = text.split()
        w2 = list(words); w2[3] = "xyzzy"
        rows.append({"doc_id": did, "text": " ".join(w2)}); did += 1  # near dup
    return rows


@pytest.fixture(scope="module")
def corpus_ds(ray_session):
    import ray.data as rd

    return rd.from_items(planted_corpus())


@pytest.mark.usefixtures("ray_session")
def test_exact_dedup_keeps_min_id(corpus_ds):
    from hamerkop_ray.pipelines.dedup import exact_dedup

    winners = sorted(
        r["doc_id"]
        for b in exact_dedup(corpus_ds).iter_batches(batch_format="pyarrow")
        for r in b.to_pylist()
    )
    # 15 docs, 5 exact-dup pairs → 10 distinct texts
    assert len(winners) == 10
    # for each base text, winner is the smaller id (3k vs 3k+1)
    assert all(w % 3 != 1 for w in winners)


@pytest.mark.usefixtures("ray_session")
def test_minhash_dedup_groups_near_dups(corpus_ds):
    from hamerkop_ray.pipelines.dedup import minhash_dedup

    labels = {
        r["node"]: r["label"]
        for b in minhash_dedup(corpus_ds, threshold=0.7).iter_batches(
            batch_format="pyarrow"
        )
        for r in b.to_pylist()
    }
    for base in range(5):
        a, b_, c = str(base * 3), str(base * 3 + 1), str(base * 3 + 2)
        assert labels.get(a) == labels.get(b_) == labels.get(c) != None  # noqa: E711
    # distinct bases don't merge
    assert len({labels[str(b * 3)] for b in range(5)}) == 5


@pytest.mark.usefixtures("ray_session")
def test_simhash_dedup_groups_exact_dups(corpus_ds):
    from hamerkop_ray.pipelines.dedup import simhash_dedup

    labels = {
        r["node"]: r["label"]
        for b in simhash_dedup(corpus_ds, max_hamming=6).iter_batches(
            batch_format="pyarrow"
        )
        for r in b.to_pylist()
    }
    for base in range(5):
        a, b_ = str(base * 3), str(base * 3 + 1)
        assert labels.get(a) == labels.get(b_) is not None


@pytest.mark.usefixtures("ray_session")
def test_ngram_jaccard_pairs_exact_values(corpus_ds):
    from hamerkop_ray.functions.minhash import exact_jaccard
    from hamerkop_ray.pipelines.dedup import ngram_jaccard_pairs

    pairs = {
        (r["src"], r["dst"]): r["jaccard"]
        for b in ngram_jaccard_pairs(corpus_ds, threshold=0.7).iter_batches(
            batch_format="pyarrow"
        )
        for r in b.to_pylist()
    }
    texts = {str(r["doc_id"]): r["text"] for r in planted_corpus()}
    assert pairs, "no pairs found"
    for (a, b_), j in pairs.items():
        assert abs(j - exact_jaccard(texts[a], texts[b_], 3)) < 1e-9
    assert ("0", "1") in pairs and abs(pairs[("0", "1")] - 1.0) < 1e-9


@pytest.mark.usefixtures("ray_session")
def test_ann_bruteforce_matches_numpy():
    import ray.data as rd

    from hamerkop_ray.pipelines.ann import brute_force_topk

    rng_rows = []
    dim = 16
    for i in range(200):
        vec = [
            (stable_hash64(f"v:{i}:{d}") % 1000) / 1000.0 - 0.5 for d in range(dim)
        ]
        rng_rows.append({"vec_id": i, "embedding": vec})
    ds = rd.from_items(rng_rows)
    qids = [0, 1]
    qvecs = [rng_rows[0]["embedding"], rng_rows[1]["embedding"]]
    out = brute_force_topk(ds, qids, qvecs, k=5, concurrency=2).to_pandas()

    m = np.array([r["embedding"] for r in rng_rows])
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    for qi, qid in enumerate(qids):
        sims = mn @ mn[qid]
        sims[qid] = -np.inf  # exclude self
        expect = set(np.argsort(-sims)[:5])
        got = set(out[out.query_id == qid].vec_id)
        assert got == expect


@pytest.mark.usefixtures("ray_session")
def test_ann_ivf_high_recall():
    import ray.data as rd

    from hamerkop_ray.pipelines.ann import brute_force_topk, ivf_topk, kmeans_lite

    rows = []
    dim = 16
    for i in range(300):
        vec = [
            (stable_hash64(f"w:{i}:{d}") % 1000) / 1000.0 - 0.5 for d in range(dim)
        ]
        rows.append({"vec_id": i, "embedding": vec})
    ds = rd.from_items(rows)
    qids = [0, 1, 2]
    qvecs = [rows[i]["embedding"] for i in qids]
    cents = kmeans_lite(np.array([r["embedding"] for r in rows[:128]]), 6)
    exact = brute_force_topk(ds, qids, qvecs, k=5, concurrency=2).to_pandas()
    approx = ivf_topk(ds, qids, qvecs, k=5, centroids=cents, nprobe=4, concurrency=2).to_pandas()
    recalls = []
    for qid in qids:
        e = set(exact[exact.query_id == qid].vec_id)
        a = set(approx[approx.query_id == qid].vec_id)
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.6, recalls


@pytest.mark.usefixtures("ray_session")
def test_kmeans_distributed_matches_reference_on_separated_clusters():
    import numpy as np
    import ray.data as rd

    from hamerkop_ray.pipelines.ann import kmeans_distributed, kmeans_lite, _normalize

    rng = np.random.default_rng(5)
    centers = np.array([[10.0, 0, 0, 0], [0, 10.0, 0, 0], [0, 0, 10.0, 0]])
    vecs = np.concatenate(
        [c + rng.normal(0, 0.1, size=(40, 4)) for c in centers]
    )
    # interleave clusters so the deterministic first-3-ids init spans all
    # three true clusters (id % 3 == true cluster)
    vecs = vecs.reshape(3, 40, 4).transpose(1, 0, 2).reshape(120, 4)
    ids = np.arange(len(vecs))
    items = [
        {"vec_id": int(i), "embedding": [float(x) for x in v]}
        for i, v in zip(ids, vecs)
    ]
    ds = rd.from_items(items).repartition(5)
    out, cents = kmeans_distributed(ds, n_clusters=3, iters=4)
    got = {
        r["vec_id"]: r["cluster"]
        for b in out.iter_batches(batch_format="pyarrow")
        for r in b.to_pylist()
    }
    # reference: same init (3 smallest ids = first 3 rows), same
    # semantics, one process
    ref_cents = kmeans_lite(vecs, 3, iters=4)
    ref_assign = np.argmax(_normalize(vecs) @ ref_cents.T, axis=1)
    for i in ids:
        assert got[int(i)] == int(ref_assign[i])
    # the three true clusters are perfectly recovered
    for block in range(3):
        members = {got[int(i)] for i in ids if i % 3 == block}
        assert len(members) == 1


@pytest.mark.usefixtures("ray_session")
def test_embedding_neardup_chunked_equals_single_chunk():
    """The chunk-pair tiling path (blocks split across many tasks) must
    produce the identical pair set as the degenerate single-chunk path."""
    import ray.data as rd

    from hamerkop_ray.pipelines.dedup import embedding_neardup_pairs

    rng = np.random.default_rng(11)
    items = []
    for i in range(120):
        v = rng.normal(0, 1, 4)
        items.append(
            {"vec_id": int(i), "label": int(i % 3),
             "embedding": [float(x) for x in v]}
        )
    ds1 = rd.from_items(items).repartition(4)
    ds2 = rd.from_items(items).repartition(4)

    def pairs(out):
        return sorted(
            (r["src"], r["dst"], r["cosine"])
            for b in out.iter_batches(batch_format="pyarrow")
            for r in b.to_pylist()
        )

    single = pairs(embedding_neardup_pairs(ds1, threshold=0.6,
                                           chunk_target=4096))
    chunked = pairs(embedding_neardup_pairs(ds2, threshold=0.6,
                                            chunk_target=8))
    assert len(single) > 0
    assert chunked == single
