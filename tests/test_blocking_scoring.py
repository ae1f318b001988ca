"""Blocking + scoring stages against the synthetic world (no Ray needed —
stage callables are plain batch functions)."""

import pytest

from hamerkop_ray.stages.blocking import (
    CandidateGeneration,
    NameIndexData,
    TypeConflation,
    exact_find,
    lsh_find,
    metaphone_find,
    ngram_find,
)
from hamerkop_ray.stages.chains import Stage1Chains
from hamerkop_ray.stages.scoring import EntityResolution, RESOLVED_CHAINS


@pytest.fixture(scope="module")
def world():
    from hamerkop_ray.synth import synth_world

    docs, kb, links = synth_world(n_docs=80, n_entities=100, seed=3)
    chains = Stage1Chains()(docs)
    index = NameIndexData(kb)
    gt = {r["mention_id"]: r["kb_id"] for r in links.to_pylist()}
    return docs, kb, links, chains, index, gt


def test_exact_find_case_insensitive(world):
    docs, kb, links, chains, index, gt = world
    e = kb.to_pylist()[0]
    assert e["entity_id"] in exact_find(index, e["name"].upper(), e["entity_type"])
    assert exact_find(index, e["name"], "???") == []


def test_ngram_find_recovers_typos(world):
    docs, kb, links, chains, index, gt = world
    hits = 0
    total = 0
    for e in kb.to_pylist()[:40]:
        if len(e["name"]) < 8:
            continue
        total += 1
        typo = e["name"][:-1]  # drop last char
        if e["entity_id"] in ngram_find(index, typo, e["entity_type"]):
            hits += 1
    assert total > 5 and hits / total > 0.9


def test_metaphone_and_lsh_find(world):
    docs, kb, links, chains, index, gt = world
    e = next(x for x in kb.to_pylist() if len(x["name"]) > 10)
    assert e["entity_id"] in metaphone_find(index, e["name"], e["entity_type"])
    assert e["entity_id"] in lsh_find(index, e["name"], e["entity_type"])


def test_type_conflation():
    tc = TypeConflation(("GPE", "LOC"))
    assert tc.types_for("GPE") == ["GPE", "LOC"]
    assert tc.types_for("PER") == ["PER"]


def test_candidate_recall(world):
    """GT entity must be among generated candidates for nearly all linked
    chains (CandidatesScorer analog, candidates.py:15-75)."""
    docs, kb, links, chains, index, gt = world
    gen = CandidateGeneration(
        index,
        config=[("exact", "name"), ("ngram", "name"), ("metaphone", "name"), ("lsh", "name")],
    )
    cands = gen(chains).to_pylist()
    total = found = 0
    for c in cands:
        mention_gts = {gt[m["mention_id"]] for m in c["mentions"] if m["mention_id"] in gt}
        linked = {g for g in mention_gts if not g.startswith("NIL")}
        if not linked:
            continue
        total += 1
        cand_ids = {x["entity_id"] for x in c["candidates"]}
        if linked & cand_ids:
            found += 1
    assert total > 30
    assert found / total > 0.95, f"candidate recall {found}/{total}"


def test_cascade_mode_stops_early(world):
    docs, kb, links, chains, index, gt = world
    combine = CandidateGeneration(index, config=[("exact", "name"), ("ngram", "name")])
    cascade = CandidateGeneration(
        index, config=[("exact", "name"), ("ngram", "name")], mode="cascade", maximum=1
    )
    ccombine = combine(chains).to_pylist()
    ccascade = cascade(chains).to_pylist()
    for a, b in zip(ccombine, ccascade):
        if any(x["source"] == "exact:name" for x in a["candidates"]):
            # cascade stopped after exact filled the quota
            assert all(x["source"] == "exact:name" for x in b["candidates"])


def test_resolution_accuracy(world):
    """Resolved entity must equal GT for the vast majority of linked chains
    (ResolverScorer analog, resolver.py:18-137)."""
    docs, kb, links, chains, index, gt = world
    gen = CandidateGeneration(
        index,
        config=[("exact", "name"), ("ngram", "name"), ("metaphone", "name"), ("lsh", "name")],
    )
    res = EntityResolution(kb)
    resolved = res(gen(chains)).to_pylist()
    total = correct = 0
    nil_false_alarm = 0
    for c in resolved:
        mention_gts = {gt[m["mention_id"]] for m in c["mentions"] if m["mention_id"] in gt}
        linked = {g for g in mention_gts if not g.startswith("NIL")}
        if linked:
            total += 1
            if c["entity_id"] in linked:
                correct += 1
        elif c["entity_id"]:
            nil_false_alarm += 1
    assert total > 30
    assert correct / total > 0.9, f"resolution accuracy {correct}/{total}"
    assert nil_false_alarm <= 2, f"NIL chains wrongly linked: {nil_false_alarm}"


def test_resolved_schema(world):
    docs, kb, links, chains, index, gt = world
    gen = CandidateGeneration(index)
    out = EntityResolution(kb)(gen(chains))
    assert out.schema.equals(RESOLVED_CHAINS)
    assert out.num_rows == chains.num_rows
