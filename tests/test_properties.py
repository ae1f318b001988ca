"""Property-based tests (hypothesis) for pure kernels and codecs."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from hamerkop_ray.functions.minhash import MinHasher, exact_jaccard
from hamerkop_ray.functions.phonetic import double_metaphone
from hamerkop_ray.functions.editdist import levenshtein_py
from hamerkop_ray.sources.conll import read_conll_text, to_conll_text
from hamerkop_ray.stages.parse import ParseDocuments
from hamerkop_ray.synth import synth_world

words = st.text(alphabet=string.ascii_letters, min_size=1, max_size=12)


@given(st.integers(min_value=0, max_value=10_000))
@settings(max_examples=15, deadline=None)
def test_synth_world_deterministic_and_parseable(seed):
    docs1, kb1, links1 = synth_world(n_docs=6, n_entities=20, seed=seed)
    docs2, kb2, links2 = synth_world(n_docs=6, n_entities=20, seed=seed)
    assert docs1.equals(docs2) and kb1.equals(kb2) and links1.equals(links2)
    parsed = ParseDocuments()(docs1)
    assert set(parsed["mention_id"].to_pylist()) == set(links1["mention_id"].to_pylist())


@given(st.integers(min_value=0, max_value=10_000))
@settings(max_examples=10, deadline=None)
def test_conll_roundtrip_property(seed):
    docs, _, _ = synth_world(n_docs=4, n_entities=15, seed=seed)
    back = read_conll_text(to_conll_text(docs))
    a = ParseDocuments()(docs).to_pylist()
    b = ParseDocuments()(back).to_pylist()
    assert a == b


@given(words, words)
@settings(max_examples=100, deadline=None)
def test_levenshtein_metric_properties(a, b):
    d = levenshtein_py(a, b)
    assert d == levenshtein_py(b, a)  # symmetry
    assert (d == 0) == (a == b)  # identity
    assert d <= max(len(a), len(b))  # upper bound


@given(words)
@settings(max_examples=50, deadline=None)
def test_metaphone_deterministic_and_ascii(w):
    p1 = double_metaphone(w)
    p2 = double_metaphone(w)
    assert p1 == p2
    assert all(c.isascii() for c in p1[0] + p1[1])
    # case-insensitive
    assert double_metaphone(w.upper()) == p1


@given(st.text(alphabet=string.ascii_lowercase + " ", min_size=10, max_size=80))
@settings(max_examples=25, deadline=None)
def test_minhash_identity_and_bounds(s):
    mh = MinHasher(num_perm=32, shingle_n=3, seed=1)
    sig = mh.signature(s)
    assert mh.jaccard_estimate(sig, sig) == 1.0
    assert 0.0 <= exact_jaccard(s, s[::-1], 3) <= 1.0


@given(st.lists(st.tuples(st.integers(0, 30), st.integers(0, 30)), min_size=1, max_size=60))
@settings(max_examples=50, deadline=None)
def test_driver_union_find_matches_oracle(pairs):
    import pyarrow as pa

    from hamerkop_ray.stages.cluster import _driver_union_find

    edges = [(f"n{a:02d}", f"n{b:02d}") for a, b in pairs if a != b]
    if not edges:
        return
    t = pa.table(
        {"src": [e[0] for e in edges], "dst": [e[1] for e in edges]}
    )
    out = _driver_union_find([t])
    labels = dict(zip(out["node"].to_pylist(), out["label"].to_pylist()))

    # oracle: naive repeated relabeling
    comp = {n: n for e in edges for n in e}
    changed = True
    while changed:
        changed = False
        for a, b in edges:
            m = min(comp[a], comp[b])
            if comp[a] != m or comp[b] != m:
                comp[a] = comp[b] = m
                changed = True
        # propagate through chains
        for n in comp:
            while comp[n] != comp[comp[n]]:
                comp[n] = comp[comp[n]]
                changed = True
    assert labels == comp


# --- exact-similarity kernels (Ray-free: emission + bucket verification
# run as plain functions over pandas partitions) ---------------------------

_doc_corpus = st.lists(
    st.text(alphabet="abcd ", min_size=0, max_size=24),
    min_size=2, max_size=24,
)


def _kernel_pairs_ssjoin(texts, threshold):
    import math
    from collections import Counter

    import pandas as pd
    import pyarrow as pa

    from hamerkop_ray.functions.strings import shingles
    from hamerkop_ray.pipelines.dedup import (
        _partition_bucket_exact_jaccard,
        _PrefixBitsetRows,
    )

    df_counts = Counter()
    for t in texts:
        df_counts.update(set(shingles(t, 3)))
    rank = {tok: i for i, tok in
            enumerate(sorted(df_counts, key=lambda k: (df_counts[k], k)))}
    emit = _PrefixBitsetRows(rank, threshold, 3, "text", "doc_id", 4)
    rows = emit(pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))
    if rows.num_rows == 0:
        return {}
    fn = _partition_bucket_exact_jaccard(threshold, "prop_test")
    out = {}
    pdf = rows.to_pandas()
    for _, g in pdf.groupby("pkey"):
        r = fn(g)
        for rec in r.itertuples(index=False):
            key = (rec.src, rec.dst)
            assert key not in out, f"pair {key} emitted twice"
            out[key] = rec.jaccard
    return out


@settings(max_examples=60, deadline=None)
@given(_doc_corpus, st.sampled_from([0.5, 0.7, 0.9]))
def test_exact_ssjoin_kernel_matches_bruteforce(texts, threshold):
    from hamerkop_ray.functions.strings import shingles

    sets = {str(i): frozenset(shingles(t, 3)) for i, t in enumerate(texts)}
    expect = {}
    keys = sorted(sets)
    for x in range(len(keys)):
        for y in range(x + 1, len(keys)):
            a, b = keys[x], keys[y]
            sa, sb = sets[a], sets[b]
            if not sa or not sb:
                continue
            o = len(sa & sb)
            if not o:
                continue
            j = o / (len(sa) + len(sb) - o)
            if j >= threshold:
                expect[(min(a, b), max(a, b))] = j
    got = _kernel_pairs_ssjoin(texts, threshold)
    assert set(got) == set(expect)
    for k, v in expect.items():
        assert abs(got[k] - v) < 1e-12


@settings(max_examples=40, deadline=None)
@given(_doc_corpus, st.sampled_from([(3, 16), (6, 8)]))
def test_exact_simhash_kernel_matches_bruteforce(texts, params):
    max_hamming, band_bits = params
    import pandas as pd
    import pyarrow as pa

    from hamerkop_ray.functions.minhash import simhash_fnv
    from hamerkop_ray.functions.strings import shingles
    from hamerkop_ray.pipelines.dedup import (
        _bucket_hamming_pairs,
        _SimhashFnvBandRows,
    )

    sims = {str(i): simhash_fnv(t) for i, t in enumerate(texts)
            if shingles(t, 3)}
    expect = {}
    keys = sorted(sims)
    for x in range(len(keys)):
        for y in range(x + 1, len(keys)):
            a, b = keys[x], keys[y]
            h = bin(sims[a] ^ sims[b]).count("1")
            if h <= max_hamming:
                expect[(min(a, b), max(a, b))] = h

    emit = _SimhashFnvBandRows(band_bits, "text", "doc_id", 4)
    rows = emit(pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))
    got = {}
    if rows.num_rows:
        fn = _bucket_hamming_pairs(max_hamming, band_bits, "prop_test")
        for _, g in rows.to_pandas().groupby("pkey"):
            r = fn(g)
            for rec in r.itertuples(index=False):
                key = (rec.src, rec.dst)
                assert key not in got, f"pair {key} emitted twice"
                got[key] = rec.hamming
    assert got == expect


@given(st.lists(st.text(alphabet=string.ascii_letters + " \t\n",
                        max_size=60), min_size=1, max_size=8))
@settings(max_examples=30, deadline=None)
def test_flat_tokens_matches_python_split(texts):
    import pyarrow as pa

    from hamerkop_ray.pipelines.text import _flat_tokens

    parents, toks = _flat_tokens(pa.array(texts, pa.string()))
    got = {}
    for p, t in zip(parents.to_pylist(), toks.to_pylist()):
        got.setdefault(p, []).append(t)
    for i, s in enumerate(texts):
        assert got.get(i, []) == s.split()


@given(st.lists(st.text(alphabet=string.ascii_letters + " ",
                        max_size=60), min_size=1, max_size=6),
       st.integers(min_value=1, max_value=4))
@settings(max_examples=30, deadline=None)
def test_doc_ngrams_counts_and_arity(texts, n):
    import numpy as np
    import pyarrow as pa

    from hamerkop_ray.pipelines.decontam import _doc_ngrams

    parents, grams = _doc_ngrams(pa.array(texts, pa.string()), n)
    counts = np.bincount(parents, minlength=len(texts)) if len(parents) \
        else np.zeros(len(texts), int)
    for i, s in enumerate(texts):
        ntok = len(s.split())
        assert counts[i] == max(0, ntok - n + 1)
    for g in grams.to_pylist():
        assert len(g.split(" ")) == n


@given(st.lists(st.integers(min_value=-10**9, max_value=10**9),
                min_size=1, max_size=300))
@settings(max_examples=20, deadline=None)
def test_bloom_never_false_negative_property(vals):
    import numpy as np

    from hamerkop_ray.functions.bloom import BloomFilter

    arr = np.asarray(vals, dtype=np.int64)
    f = BloomFilter.build(arr, fpp=0.05)
    assert f.might_contain(arr).all()


@given(
    st.lists(
        st.one_of(
            st.floats(min_value=-1e6, max_value=1e6,
                      allow_nan=False, allow_infinity=False),
            # exact half-boundary values: k + 0.5 / k + 0.05 / k + 0.00005,
            # the cases where half-even (pyarrow default) and half-away
            # (DuckDB ROUND) diverge — the round-3 events_type_pivot bug
            st.integers(min_value=-10_000, max_value=10_000).map(
                lambda k: k + 0.5),
            st.integers(min_value=-10_000, max_value=10_000).map(
                lambda k: (2 * k + 1) / 2 / 10**4),
        ),
        min_size=1, max_size=50,
    ),
    st.integers(min_value=0, max_value=4),
)
@settings(max_examples=40, deadline=None)
def test_half_away_round_matches_duckdb(values, ndigits):
    """pc.round(round_mode='half_towards_infinity') — the mode every
    _round_cols call site uses — must equal DuckDB ROUND bit-for-bit on
    arbitrary doubles INCLUDING exact .5 boundaries (VERDICT r3 #2/#9)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.compute as pc

    ours = pc.round(
        pa.array(values, pa.float64()), ndigits=ndigits,
        round_mode="half_towards_infinity",
    ).to_pylist()
    con = duckdb.connect()
    theirs = [
        con.execute(
            "SELECT ROUND(CAST(? AS DOUBLE), ?)", [v, ndigits]
        ).fetchone()[0]
        for v in values
    ]
    assert ours == theirs


@given(
    st.lists(
        st.one_of(
            st.floats(min_value=-1e5, max_value=1e5,
                      allow_nan=False, allow_infinity=False),
            st.integers(min_value=-10_000, max_value=10_000).map(
                lambda k: (2 * k + 1) / 2 / 10**4),
        ),
        min_size=1, max_size=50,
    )
)
@settings(max_examples=25, deadline=None)
def test_fixed_point_floor_units_match_duckdb(values):
    """The integer fixed-point scheme (floor(v·1e4 + 0.5) summed as int64)
    used by events_type_pivot must produce identical units in numpy and
    DuckDB — identical IEEE ops, so identical results on EVERY double."""
    import duckdb
    import numpy as np

    ours = np.floor(np.asarray(values, np.float64) * 1e4 + 0.5).astype(
        np.int64).tolist()
    con = duckdb.connect()
    theirs = [
        con.execute(
            "SELECT CAST(FLOOR(CAST(? AS DOUBLE) * 10000 + 0.5) AS BIGINT)",
            [v],
        ).fetchone()[0]
        for v in values
    ]
    assert ours == theirs
