"""Differential test: stage 1 (parse → preprocess → coref) vs the reference.

Feeds the identical synthetic corpus to both engines — ours via the documents
table, the reference via generated CoNLL text (sources.conll.to_conll_text) —
and compares mention sets and chain partitions per document.
"""

import io

import pytest

from hamerkop_ray.sources.conll import read_conll_text, to_conll_text
from hamerkop_ray.stages.chains import Stage1Chains
from hamerkop_ray.stages.parse import ParseDocuments

from reference_shim import import_reference

hk = import_reference()


def run_reference_stage1(conll_text: str):
    """Reference pipeline: read_conll → DocumentPreparer → preprocess → coref.

    Mirrors Pipeline.run steps 1-3 (pipeline.py:117-128) with the canonical
    component wiring equivalent to our default_cascade / default_sieve.
    """
    from hamerkop.coref import (
        AcronymStage,
        CascadeCoref,
        ExactMatchStage,
        SingleTokenMatchStage,
        TypeSpecificStage,
    )
    from hamerkop.io import DocumentPreparer, read_conll
    from hamerkop.preprocessor import (
        CascadePreprocessor,
        GarbageRemover,
        TextNormalizer,
        TooLongMentionRemover,
        TwitterHashtagProcessor,
        TwitterUsernameReplacer,
        TypeValidator,
    )

    preparer = DocumentPreparer(hk.InProcessIncremental(), hk.FixedLang(hk.Lang.ENG))
    preprocessor = CascadePreprocessor(
        [
            TypeValidator(),
            TextNormalizer(),
            TwitterUsernameReplacer({}),
            TwitterHashtagProcessor(),
            GarbageRemover(),
            TooLongMentionRemover(6),
        ]
    )
    coref = CascadeCoref(
        [
            ExactMatchStage(),
            AcronymStage(2),
            TypeSpecificStage(SingleTokenMatchStage(-1), "PER"),
        ]
    )
    docs = []
    raw_mentions = []  # snapshot BEFORE preprocessing (removals/rewrites)
    for rows in read_conll(io.StringIO(conll_text)):
        doc = preparer.process(rows)
        if doc is None:
            continue
        raw_mentions.extend(
            (doc.doc_id, m.offsets[0], m.offsets[1], m.original_string, m.type,
             m.token_offsets)
            for m in doc.mentions
        )
        preprocessor.process(doc)
        coref.coref(doc)
        docs.append(doc)
    return docs, raw_mentions


@pytest.fixture(scope="module")
def corpus():
    from hamerkop_ray.synth import synth_world

    docs, kb, links = synth_world(n_docs=120, n_entities=120, seed=11)
    return docs


def test_mentions_match_reference(corpus):
    conll = to_conll_text(corpus)
    ref_docs, raw = run_reference_stage1(conll)
    ours = ParseDocuments()(corpus).to_pylist()

    ref_mentions = {(d, a, b, s, t) for (d, a, b, s, t, _) in raw}
    our_mentions = {
        (m["doc_id"], m["char_start"], m["char_stop"], m["surface"], m["entity_type"])
        for m in ours
    }
    assert our_mentions == ref_mentions


def test_token_offsets_match_reference(corpus):
    conll = to_conll_text(corpus)
    ref_docs, raw = run_reference_stage1(conll)
    ours = ParseDocuments()(corpus).to_pylist()
    ref = {(d, a): toks for (d, a, b, s, t, toks) in raw}
    for m in ours:
        key = (m["doc_id"], m["char_start"])
        assert ref[key] == (m["tok_start"], m["tok_stop"])


def test_chains_match_reference(corpus):
    conll = to_conll_text(corpus)
    ref_docs, _raw = run_reference_stage1(conll)
    ref_parts = {
        d.doc_id: {
            frozenset((m.offsets[0], m.offsets[1]) for m in chain.mentions)
            for chain in d.mention_chains
        }
        for d in ref_docs
    }

    chains = Stage1Chains()(corpus).to_pylist()
    our_parts: dict[str, set] = {}
    for c in chains:
        our_parts.setdefault(c["doc_id"], set()).add(
            frozenset((m["char_start"], m["char_stop"]) for m in c["mentions"])
        )
    assert our_parts == ref_parts


def test_chain_names_match_reference(corpus):
    conll = to_conll_text(corpus)
    ref_docs, _raw = run_reference_stage1(conll)
    ref_names = {
        (d.doc_id, frozenset(m.offsets[0] for m in chain.mentions)): chain.name
        for d in ref_docs
        for chain in d.mention_chains
    }
    chains = Stage1Chains()(corpus).to_pylist()
    for c in chains:
        key = (c["doc_id"], frozenset(m["char_start"] for m in c["mentions"]))
        # name = longest string; ties may resolve to a different equal-length
        # string, so compare length + membership
        assert len(ref_names[key]) == len(c["name"])
        assert c["name"] in [m["norm"] for m in c["mentions"]]


def test_conll_roundtrip(corpus):
    conll = to_conll_text(corpus)
    back = read_conll_text(conll)
    ours_direct = ParseDocuments()(corpus).to_pylist()
    ours_roundtrip = ParseDocuments()(back).to_pylist()
    strip = lambda rows: [
        {k: v for k, v in r.items()} for r in rows
    ]
    assert strip(ours_roundtrip) == strip(ours_direct)
