"""In-doc coref sieve semantics (reference coref.py via SURVEY §2.5)."""

from hamerkop_ray.stages import coref as cf


def m(norm, etype="PER", start=None, idx=0):
    start = start if start is not None else idx * 20 + 1
    return {
        "mention_id": f"M-D-{start}-{start + len(norm) - 1}",
        "mention_idx": idx,
        "surface": norm,
        "norm": norm,
        "translit": "",
        "translate": "",
        "entity_type": etype,
        "char_start": start,
        "char_stop": start + len(norm) - 1,
        "tok_start": idx,
        "tok_stop": idx + 1,
        "lang": "eng",
        "doc_type": "newswire",
    }


def clusters(chains):
    return {frozenset(x["char_start"] for x in c.mentions) for c in chains}


def mentions(*norm_type):
    return [m(s, t, idx=i) for i, (s, t) in enumerate(norm_type)]


def test_exact_match_case_insensitive():
    ms = mentions(("Henry", "PER"), ("henry", "PER"), ("Clark", "PER"))
    chains = cf.run_sieve(ms, [cf.ExactMatchStage()])
    assert clusters(chains) == {frozenset({1, 21}), frozenset({41})}


def test_exact_match_respects_type():
    ms = mentions(("Jordan", "PER"), ("Jordan", "GPE"))
    chains = cf.run_sieve(ms, [cf.ExactMatchStage()])
    assert len(chains) == 2


def test_acronym_merges_with_initials():
    ms = mentions(("United Nations Council", "ORG"), ("UNC", "ORG"))
    chains = cf.run_sieve(ms, [cf.AcronymStage(2)])
    assert clusters(chains) == {frozenset({1, 21})}


def test_acronym_rejects_cross_type():
    ms = mentions(("United Nations Council", "ORG"), ("UNC", "GPE"))
    chains = cf.run_sieve(ms, [cf.AcronymStage(2)])
    assert len(chains) == 2


def test_acronym_first_match_only():
    # acronym matches two chains; merges with the FIRST only (coref.py:314-317)
    ms = mentions(
        ("United Nations Council", "ORG"),
        ("Union of New Caledonia", "ORG"),
        ("UNC", "ORG"),
    )
    chains = cf.run_sieve(ms, [cf.AcronymStage(2)])
    assert clusters(chains) == {frozenset({1, 41}), frozenset({21})}


def test_acronym_min_length():
    ms = mentions(("United Nations", "ORG"), ("UN", "ORG"))
    assert len(cf.run_sieve(ms, [cf.AcronymStage(3)])) == 2
    assert len(cf.run_sieve(ms, [cf.AcronymStage(2)])) == 1


def test_single_token_last_name():
    ms = mentions(("Henry Clark", "PER"), ("Clark", "PER"), ("Lewis Clark", "PER"))
    chains = cf.run_sieve(ms, [cf.SingleTokenMatchStage(-1)])
    # aggressive: merges ALL chains sharing the last token (coref.py:344)
    assert clusters(chains) == {frozenset({1, 21, 41})}


def test_single_token_first_name_index():
    ms = mentions(("Henry Clark", "PER"), ("Henry", "PER"))
    assert len(cf.run_sieve(ms, [cf.SingleTokenMatchStage(0)])) == 1
    ms2 = mentions(("Henry Clark", "PER"), ("Clark", "PER"))
    assert len(cf.run_sieve(ms2, [cf.SingleTokenMatchStage(0)])) == 2


def test_type_specific_gate():
    ms = mentions(("Acme Corp", "ORG"), ("Acme", "ORG"))
    stage = cf.TypeSpecificStage(cf.SingleTokenMatchStage(0), "PER")
    assert len(cf.run_sieve(ms, [stage])) == 2
    stage_org = cf.TypeSpecificStage(cf.SingleTokenMatchStage(0), "ORG")
    assert len(cf.run_sieve(ms, [stage_org])) == 1


def test_language_specific_gate():
    ms = mentions(("Henry", "PER"), ("henry", "PER"))
    eng_only = cf.LanguageSpecificStage(cf.ExactMatchStage(), "eng")
    assert len(cf.run_sieve(ms, [eng_only])) == 1
    tir_only = cf.LanguageSpecificStage(cf.ExactMatchStage(), "tir")
    assert len(cf.run_sieve(ms, [tir_only])) == 2


def test_merged_chain_appended_last_and_name_longest():
    ms = mentions(("Henry", "PER"), ("Jones", "PER"), ("henry", "PER"))
    chains = cf.run_sieve(ms, [cf.ExactMatchStage()])
    # merged chain appended at end (coref.py:226-234)
    assert [c.name for c in chains] == ["Jones", "Henry"]


def test_default_sieve_composed():
    ms = mentions(
        ("Henry Clark", "PER"),
        ("henry clark", "PER"),
        ("Clark", "PER"),
        ("World Trade Organization", "ORG"),
        ("WTO", "ORG"),
    )
    chains = cf.run_sieve(ms)
    assert clusters(chains) == {frozenset({1, 21, 41}), frozenset({61, 81})}
