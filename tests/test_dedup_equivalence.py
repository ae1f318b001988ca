"""Equivalence: the distributed dedup implementations must emit EXACTLY the
rows of the reference semantics, replicated here driver-side (the corpus is
small): per-bucket id-sorted cap, in-bucket signature-estimate (minhash) or
estimate-prefilter + exact n-gram Jaccard (ngram), pairs deduped across
bands.  Bands default to functions.minhash.derive_bands(threshold) — the
replicas use the same derivation (VERDICT r2 #1/#2 'Done' criteria).
"""

import numpy as np
import pytest

from hamerkop_ray.functions.minhash import MinHasher, derive_bands
from hamerkop_ray.functions.strings import shingles


def _v1_minhash_edges(rows, threshold=0.8, bands=None, max_bucket=512):
    bands = bands or derive_bands(threshold)
    h = MinHasher(num_perm=64, shingle_n=3, seed=1)
    sigs = {str(r["doc_id"]): h.signature(r["text"]) for r in rows}
    buckets: dict[str, list[str]] = {}
    for r in rows:
        i = str(r["doc_id"])
        for key in h.band_keys(r["text"], bands):
            buckets.setdefault(key, []).append(i)
    edges = set()
    for ids in buckets.values():
        ids = sorted(set(ids))[:max_bucket]
        for a in range(len(ids)):
            for b in range(a + 1, len(ids)):
                est = float(np.mean(sigs[ids[a]] == sigs[ids[b]]))
                if est >= threshold:
                    edges.add((ids[a], ids[b]))
    return edges


def _v1_ngram_pairs(rows, threshold=0.7, bands=None, max_bucket=256, n=3):
    bands = bands or derive_bands(threshold)
    h = MinHasher(num_perm=64, shingle_n=n, seed=1)
    sigs = {str(r["doc_id"]): h.signature(r["text"]) for r in rows}
    texts = {str(r["doc_id"]): r["text"] for r in rows}
    buckets: dict[str, list[str]] = {}
    for r in rows:
        i = str(r["doc_id"])
        for key in h.band_keys(r["text"], bands):
            buckets.setdefault(key, []).append(i)
    out = {}
    for ids in buckets.values():
        ids = sorted(set(ids))[:max_bucket]
        for a in range(len(ids)):
            for b in range(a + 1, len(ids)):
                est = float(np.mean(sigs[ids[a]] == sigs[ids[b]]))
                if est < threshold - 0.15:
                    continue
                sa, sb = set(shingles(texts[ids[a]], n)), set(shingles(texts[ids[b]], n))
                union = len(sa | sb)
                jv = (len(sa & sb) / union) if union else 1.0
                if jv >= threshold:
                    out[(ids[a], ids[b])] = jv
    return out


def _union_find_labels(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in edges:
        rs, rd = find(s), find(d)
        if rs != rd:
            if rs < rd:
                parent[rd] = rs
            else:
                parent[rs] = rd
    return {n: find(n) for n in parent}


@pytest.fixture(scope="module")
def sf_docs(ray_session):
    import pyarrow.parquet as pq

    t = pq.read_table("/root/testdata/sf0.01/documents.parquet", columns=["doc_id", "text"])
    return t.to_pylist()


@pytest.mark.usefixtures("ray_session")
def test_minhash_restructure_equivalent(sf_docs):
    import ray.data as rd

    from hamerkop_ray.pipelines.dedup import minhash_dedup

    expect = _union_find_labels(sorted(_v1_minhash_edges(sf_docs)))
    got = {
        r["node"]: r["label"]
        for b in minhash_dedup(
            rd.from_items(sf_docs), threshold=0.8
        ).iter_batches(batch_format="pyarrow")
        for r in b.to_pylist()
    }
    assert got == expect


@pytest.mark.usefixtures("ray_session")
def test_ngram_restructure_equivalent(sf_docs):
    import ray.data as rd

    from hamerkop_ray.pipelines.dedup import ngram_jaccard_pairs

    expect = _v1_ngram_pairs(sf_docs)
    got = {
        (r["src"], r["dst"]): r["jaccard"]
        for b in ngram_jaccard_pairs(
            rd.from_items(sf_docs), threshold=0.7
        ).iter_batches(batch_format="pyarrow")
        for r in b.to_pylist()
    }
    assert set(got) == set(expect)
    for k in expect:
        assert abs(got[k] - expect[k]) < 1e-12


@pytest.mark.usefixtures("ray_session")
def test_blocked_editdist_pairs_equal_allpairs():
    """similar_customer_names_blocked (FastSS deletion-neighborhood blocking)
    must emit exactly the all-pairs self-join's rows (VERDICT r1 #9)."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entry_mod

    sf = "/root/testdata/sf0.001"
    q = {**entry_mod.queries(), **entry_mod.extra_queries()}
    allpairs = {
        (r["custkey_a"], r["custkey_b"], r["dist"])
        for b in q["similar_customer_names"](sf).iter_batches(batch_format="pyarrow")
        for r in b.to_pylist()
    }
    blocked = {
        (r["custkey_a"], r["custkey_b"], r["dist"])
        for b in q["similar_customer_names_blocked"](sf).iter_batches(
            batch_format="pyarrow"
        )
        for r in b.to_pylist()
    }
    assert blocked == allpairs
    assert len(allpairs) > 0


def _brute_jaccard_pairs(rows, threshold=0.7, n=3):
    """Ground truth for the EXACT ssjoin: all-pairs exact n-gram Jaccard."""
    import itertools

    sets = {str(r["doc_id"]): frozenset(shingles(r["text"], n)) for r in rows}
    out = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        sa, sb = sets[a], sets[b]
        if not sa or not sb:
            continue
        o = len(sa & sb)
        if not o:
            continue
        j = o / (len(sa) + len(sb) - o)
        if j >= threshold:
            out[(a, b)] = j
    return out


@pytest.mark.usefixtures("ray_session")
def test_exact_ssjoin_equals_bruteforce_sf(sf_docs):
    """Prefix-filtered exact ssjoin == all-pairs brute force on testdata."""
    import ray.data as rd

    from hamerkop_ray.pipelines.dedup import ngram_jaccard_pairs_exact

    expect = _brute_jaccard_pairs(sf_docs, threshold=0.7)
    got = {
        (r["src"], r["dst"]): r["jaccard"]
        for b in ngram_jaccard_pairs_exact(
            rd.from_items(sf_docs), threshold=0.7
        ).iter_batches(batch_format="pyarrow")
        for r in b.to_pylist()
    }
    assert set(got) == set(expect)
    for k in expect:
        assert abs(got[k] - expect[k]) < 1e-12


@pytest.mark.usefixtures("ray_session")
def test_exact_ssjoin_adversarial_corpus():
    """Guaranteed recall on a corpus built to stress the filters: identical
    docs, single-char mutations, empty/short strings, threshold-boundary
    sizes, and two different thresholds."""
    import random

    import ray.data as rd

    from hamerkop_ray.pipelines.dedup import ngram_jaccard_pairs_exact

    rng = random.Random(7)
    base = [
        "the quick brown fox jumps over the lazy dog",
        "pack my box with five dozen liquor jugs",
        "how vexingly quick daft zebras jump",
    ]
    rows = []
    k = 0
    for text in base:
        for _ in range(6):  # exact + near duplicates
            s = list(text)
            for _ in range(rng.randrange(0, 3)):
                s[rng.randrange(len(s))] = rng.choice("abcdefgh ")
            rows.append({"doc_id": k, "text": "".join(s)})
            k += 1
    for extra in ["", "ab", "abc", "the", "THE  Quick ", "zzzz"]:
        rows.append({"doc_id": k, "text": extra})
        k += 1
    for th in (0.5, 0.8):
        expect = _brute_jaccard_pairs(rows, threshold=th)
        got = {
            (r["src"], r["dst"]): r["jaccard"]
            for b in ngram_jaccard_pairs_exact(
                rd.from_items(rows), threshold=th, num_partitions=8
            ).iter_batches(batch_format="pyarrow")
            for r in b.to_pylist()
        }
        assert set(got) == set(expect), f"threshold {th}"
        for key in expect:
            assert abs(got[key] - expect[key]) < 1e-12


def _brute_hamming_pairs(rows, max_hamming=3):
    """Ground truth for the exact Hamming search: all-pairs FNV simhash."""
    import itertools

    from hamerkop_ray.functions.minhash import simhash_fnv

    sims = {
        str(r["doc_id"]): simhash_fnv(r["text"])
        for r in rows
        if shingles(r["text"], 3)
    }
    out = {}
    for a, b in itertools.combinations(sorted(sims), 2):
        h = bin(sims[a] ^ sims[b]).count("1")
        if h <= max_hamming:
            out[(a, b)] = h
    return out


@pytest.mark.usefixtures("ray_session")
def test_exact_simhash_pairs_equal_bruteforce(sf_docs):
    import ray.data as rd

    from hamerkop_ray.pipelines.dedup import simhash_pairs_exact

    for k, band_bits in ((3, 16), (6, 8)):
        expect = _brute_hamming_pairs(sf_docs, max_hamming=k)
        got = {
            (r["src"], r["dst"]): r["hamming"]
            for b in simhash_pairs_exact(
                rd.from_items(sf_docs), max_hamming=k, band_bits=band_bits
            ).iter_batches(batch_format="pyarrow")
            for r in b.to_pylist()
        }
        assert got == expect, f"k={k} band_bits={band_bits}"


@pytest.mark.usefixtures("ray_session")
def test_exact_simhash_rejects_too_few_bands():
    import ray.data as rd

    from hamerkop_ray.pipelines.dedup import simhash_pairs_exact

    with pytest.raises(ValueError):
        simhash_pairs_exact(
            rd.from_items([{"doc_id": 1, "text": "abc"}]),
            max_hamming=4, band_bits=16,
        )
