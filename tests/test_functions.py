"""Scalar/vector kernels: strings, phonetics, minhash, edit distance, langid,
textstats.  Golden values mirror reference tests (tests/test_string.py etc.)."""

import numpy as np
import pytest

from hamerkop_ray.functions import strings, textstats
from hamerkop_ray.functions.editdist import (
    jaro_winkler_batch,
    jaro_winkler_py,
    levenshtein_batch,
    levenshtein_py,
    normalized_levenshtein_batch,
)
from hamerkop_ray.functions.langid import ISO1_TO_3, FixedLang, NgramLangDetector
from hamerkop_ray.functions.minhash import (
    MinHasher,
    exact_jaccard,
    hamming64,
    simhash,
)
from hamerkop_ray.functions.phonetic import double_metaphone, name_metaphone


# --- strings (reference string.py semantics) --------------------------------


def test_punct_removal():
    assert strings.remove_punct("a.b,c!") == "abc"
    assert strings.replace_punct("a.b") == "a b"
    assert strings.remove_unicode_punct("a«b»c") == "abc"
    assert strings.replace_unicode_punct("a«b»") == "a b"


def test_emoji_and_spacing():
    assert strings.remove_emojis("hi \U0001F600 there") == "hi  there"
    assert strings.single_space("a  b\t c") == "a b c"
    assert strings.remove_double_letter("aabbcc dd") == "abc d"


def test_ngrams_and_format():
    assert strings.ngrams("abcd", 2) == ["ab", "bc", "cd"]
    assert strings.ngrams("ab", 4) == []
    # kb.py:260-264 formatting: punct → space, lower, _-join, padding
    assert strings.ngram_format("New York") == "_new_york_"


def test_shingles():
    assert strings.shingles("ab", 3) == ["ab"]
    assert strings.shingles("Hello  World", 3)[:3] == ["hel", "ell", "llo"]


# --- edit distance ----------------------------------------------------------


def test_levenshtein_matches_python():
    pairs = [("kitten", "sitting"), ("", "abc"), ("same", "same"), ("ab", "ba")]
    a, b = zip(*pairs)
    batch = levenshtein_batch(list(a), list(b))
    assert list(batch) == [levenshtein_py(x, y) for x, y in pairs]


def test_normalized_levenshtein_reference_fraction():
    # reference features test: lev 3/10 (test_features.py:118-125 semantics)
    out = normalized_levenshtein_batch(["abcdefghij"], ["abcdefgxyz"])
    assert abs(out[0] - 0.3) < 1e-12


def test_jaro_winkler_agreement():
    pairs = [("martha", "marhta"), ("dwayne", "duane"), ("abc", "xyz")]
    a, b = zip(*pairs)
    batch = jaro_winkler_batch(list(a), list(b))
    for got, (x, y) in zip(batch, pairs):
        assert abs(got - jaro_winkler_py(x, y)) < 1e-9


# --- phonetics --------------------------------------------------------------


def test_double_metaphone_groups_variants():
    assert double_metaphone("Smith")[0] == double_metaphone("Smyth")[0]
    p1, s1 = double_metaphone("Katherine")
    p2, s2 = double_metaphone("Catherine")
    assert {p1, s1} & {p2, s2}  # share at least one code
    assert double_metaphone("") == ("", "")
    assert double_metaphone("123") == ("", "")


def test_name_metaphone_multi_token():
    p, s = name_metaphone("John Smith")
    assert "_" in p


# --- minhash / simhash ------------------------------------------------------


def test_minhash_estimates_jaccard():
    mh = MinHasher(num_perm=128, shingle_n=3, seed=1)
    a = "the quick brown fox jumps over the lazy dog"
    b = "the quick brown fox jumped over the lazy dog"
    est = mh.jaccard_estimate(mh.signature(a), mh.signature(b))
    exact = exact_jaccard(a, b, 3)
    assert abs(est - exact) < 0.15


def test_minhash_deterministic_across_instances():
    a = MinHasher(64, 3, 1).signature("hello world")
    b = MinHasher(64, 3, 1).signature("hello world")
    assert np.array_equal(a, b)


def test_minhash_batch_signatures_bit_identical():
    # the batched reduceat path must equal the per-doc path exactly —
    # dedup equivalence and band bucketing both depend on it
    mh = MinHasher(64, 3, 1)
    texts = ["the quick brown fox", "", "a", "the quick brown fox jumps",
             "x" * 500, "hello world " * 40]
    batch = mh.signatures(texts)
    per = np.stack([mh.signature(t) for t in texts])
    assert np.array_equal(batch, per)
    assert mh.band_keys_matrix(batch, 8) == [
        mh.band_keys_from_sig(s, 8) for s in per
    ]


def test_band_keys_collide_for_near_dups():
    mh = MinHasher(64, 3, 1)
    k1 = set(mh.band_keys("international business machines"))
    k2 = set(mh.band_keys("international business machine"))
    assert k1 & k2
    k3 = set(mh.band_keys("completely different text here"))
    assert not (k1 & k3)


def test_simhash_hamming():
    h1 = simhash("the quick brown fox jumps over the lazy dog")
    h2 = simhash("the quick brown fox jumps over the lazy cat")
    h3 = simhash("zzz qqq vvv www xxx yyy")
    assert hamming64(h1, h2) < hamming64(h1, h3)
    assert hamming64(h1, h1) == 0


# --- langid -----------------------------------------------------------------


def test_langid_scripts():
    d = NgramLangDetector()
    assert d.detect_text("这是一个中文句子和更多中文") == "zho"
    assert d.detect_text("هذا نص عربي طويل جدا هنا") == "ara"
    assert d.detect_text("это русский текст для теста") == "rus"


def test_langid_latin_profiles():
    d = NgramLangDetector()
    assert d.detect_text("the people with the dog and the fox would have that") == "eng"
    assert d.detect_text("der hund und die katze sind nicht auf der straße") == "deu"
    assert d.detect_text("le chien est dans la maison avec les enfants pour que") == "fra"


def test_fixed_lang():
    assert FixedLang("tir").detect("f", ["x"]) == "tir"
    assert ISO1_TO_3["en"] == "eng"


# --- textstats --------------------------------------------------------------


def test_token_counts():
    import pandas as pd

    s = pd.Series(["a b  c", "", "one"])
    assert list(textstats.whitespace_token_count(s)) == [3, 0, 1]
    s2 = pd.Series(["ab, cd! 12"])
    assert list(textstats.regex_token_count(s2)) == [5]  # ab , cd ! 12


def test_quality_features_shape():
    import pandas as pd

    df = textstats.quality_features(pd.Series(["the cat sat on the mat", ""]))
    assert df.loc[0, "n_tokens"] == 6
    assert 0 <= df.loc[0, "quality_score"] <= 1.001
    assert df.loc[1, "n_tokens"] == 0


def test_fingerprint_whitespace_insensitive():
    a = textstats.rolling_fingerprint("Hello   World Foo")
    b = textstats.rolling_fingerprint("hello world foo")
    assert a == b
    c = textstats.rolling_fingerprint("hello world bar")
    assert a != c
