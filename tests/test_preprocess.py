"""Preprocessor cascade semantics (reference preprocessor.py via SURVEY §2.3)."""

import pyarrow as pa

from hamerkop_ray.schemas import MENTIONS
from hamerkop_ray.stages import preprocess as pp


def mk(norms, types=None, doc_types=None):
    n = len(norms)
    types = types or ["PER"] * n
    doc_types = doc_types or ["newswire"] * n
    rows = []
    for i, (s, t, dt) in enumerate(zip(norms, types, doc_types)):
        rows.append(
            {
                "mention_id": f"M-{i}",
                "doc_id": "D_NW_1",
                "mention_idx": i,
                "surface": s,
                "norm": s,
                "translit": "",
                "translate": "",
                "entity_type": t,
                "char_start": i * 10 + 1,
                "char_stop": i * 10 + 5,
                "tok_start": i,
                "tok_stop": i + 1,
                "lang": "eng",
                "doc_type": dt,
            }
        )
    return pa.Table.from_pylist(rows, schema=MENTIONS)


def norms(t):
    return t.column("norm").to_pylist()


def test_type_validator_drops_unknown():
    t = mk(["a", "b", "c"], types=["PER", "DOG", "GPE"])
    out = pp.type_validator()(t)
    assert norms(out) == ["a", "c"]


def test_text_normalizer_smart_punct_and_emoji():
    t = mk(["‘Henry’", "café \U0001F600", "em—dash"])
    out = pp.text_normalizer()(t)
    assert norms(out) == ["'Henry'", "café ", "em-dash"]


def test_garbage_remover():
    t = mk(["ok", "www.spam.com", "see http://x", "https://y", ""])
    out = pp.garbage_remover()(t)
    assert norms(out) == ["ok"]


def test_too_long_mention_remover():
    # reference counts spaces: keep iff count(' ') < max_tokens
    # (preprocessor.py:239-241) so a 6-token mention survives max_tokens=6
    t = mk(["one two three four five six seven", "short name"])
    out = pp.too_long_mention_remover(6)(t)
    assert norms(out) == ["short name"]
    out2 = pp.too_long_mention_remover(2)(t)
    assert norms(out2) == ["short name"]


def test_blacklist_case_insensitive():
    t = mk(["Bad Name", "Good"])
    out = pp.blacklist(["bad name"])(t)
    assert norms(out) == ["Good"]


def test_fix_type():
    t = mk(["al-Qaeda"], types=["PER"])
    out = pp.fix_type({"al-qaeda": "ORG"})(t)
    assert out.column("entity_type").to_pylist() == ["ORG"]


def test_acronym_replacer_ci():
    t = mk(["un", "UN"])
    assert norms(pp.acronym_replacer({"UN": "United Nations"})(t)) == [
        "un",
        "United Nations",
    ]
    assert norms(pp.acronym_replacer({"UN": "United Nations"}, ci=True)(t)) == [
        "United Nations",
        "United Nations",
    ]


def test_name_stemmer():
    t = mk(["running Dogs"])
    out = pp.name_stemmer({"running": "run", "dogs": "dog"})(t)
    assert norms(out) == ["run dog"]


def test_name_projector_sets_only_when_different():
    t = mk(["Addis", "same"])
    out = pp.name_projector(lambda s, lang: {"Addis": "addis-x", "same": "same"}[s])(t)
    assert out.column("translit").to_pylist() == ["addis-x", ""]


def test_twitter_username_replacer_only_tweets():
    t = mk(["@nytimes", "@nytimes"], doc_types=["twitter", "blog"])
    out = pp.twitter_username_replacer({"nytimes": "New York Times"})(t)
    assert norms(out) == ["New York Times", "@nytimes"]


def test_twitter_username_strips_trailing_punct_and_emoji():
    t = mk(["@nytimes:"], doc_types=["twitter"])
    out = pp.twitter_username_replacer({"nytimes": "New York Times"})(t)
    assert norms(out) == ["New York Times"]


def test_twitter_hashtag():
    t = mk(["#NewYorkCity", "#lower", "plain"])
    out = pp.twitter_hashtag_processor()(t)
    assert norms(out) == ["New York City", "lower", "plain"]


def test_cascade_order_and_reporter():
    rep = pp.Reporter(enabled=True)
    t = mk(["‘x’", "www.spam.com", "ok"])
    out = pp.cascade([pp.text_normalizer(rep), pp.garbage_remover(rep)])(t)
    assert norms(out) == ["'x'", "ok"]
    assert rep.removals["GarbageRemover"] == 1
    assert rep.modifications["TextNormalizer"] == 1
