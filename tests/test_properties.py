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
