"""FeatureRecorder: labeled (chain, candidate) feature rows vs ground truth."""

import pytest

from hamerkop_ray.stages.blocking import CandidateGeneration, NameIndexData
from hamerkop_ray.stages.chains import Stage1Chains
from hamerkop_ray.stages.scoring import FEATURE_NAMES, FeatureRecorder


@pytest.fixture(scope="module")
def world():
    from hamerkop_ray.synth import synth_world

    return synth_world(n_docs=50, n_entities=60, seed=4)


def test_feature_recorder_labels(world):
    docs, kb, links = world
    chains = Stage1Chains()(docs)
    cands = CandidateGeneration(NameIndexData(kb), config=[("exact", "name"), ("ngram", "name")])(chains)
    gt = {r["mention_id"]: r["kb_id"] for r in links.to_pylist()}

    out = FeatureRecorder(kb, gt)(cands).to_pylist()
    assert out, "no feature rows"
    assert all(f"f_{n}" in out[0] for n in FEATURE_NAMES)
    pos = [r for r in out if r["label"] == 1]
    neg = [r for r in out if r["label"] == 0]
    assert pos and neg
    # positives (GT entity) should have systematically higher exact-match
    import numpy as np

    assert np.mean([r["f_exact"] for r in pos]) > np.mean([r["f_exact"] for r in neg])
    # positives' normalized edit distance lower on average
    assert np.mean([r["f_lev_norm"] for r in pos]) < np.mean([r["f_lev_norm"] for r in neg])


def test_linear_resolver_from_recorded_features(world):
    """Train-by-hand weights on the recorded features and check the
    LinearResolver (SvmResolver analog) picks GT entities."""
    from hamerkop_ray.stages.scoring import EntityResolution, LinearResolver

    docs, kb, links = world
    chains = Stage1Chains()(docs)
    gen = CandidateGeneration(NameIndexData(kb), config=[("exact", "name"), ("ngram", "name")])
    cands = gen(chains)
    gt = {r["mention_id"]: r["kb_id"] for r in links.to_pylist()}

    # hand weights: exact match dominates, edit distance penalizes
    w = [0, 0, 0, 2.0, 0.5, 0.5, 0.2, -2.0]
    res = EntityResolution(kb, resolvers=[LinearResolver(w, bias=-0.5)])
    resolved = res(cands).to_pylist()
    total = correct = 0
    for c in resolved:
        gts = {gt[m["mention_id"]] for m in c["mentions"] if m["mention_id"] in gt}
        linked = {g for g in gts if not g.startswith("NIL")}
        if linked:
            total += 1
            correct += c["entity_id"] in linked
    assert total > 20 and correct / total > 0.8
