"""End-to-end differential: flagship pipeline vs the reference engine.

Runs the full reference pipeline (prepare → preprocess → coref → candidates →
resolve) and the Ray flagship on the identical synthetic corpus + KB, then
compares entity clusters with the BASELINE.json acceptance metric: pairwise
F1 ≥ 0.99 on labeled pairs at the same blocking key.

Cross-doc cluster rule (SURVEY.md §2.11): two mentions co-cluster iff their
chains resolve to the same KB id, or they share a within-doc chain; NIL
chains stay per-doc singletons.
"""

import io

import pytest

from hamerkop_ray.pipelines.evaluate import blocking_pairs, pairwise_f1
from hamerkop_ray.pipelines.flagship import flagship_table
from hamerkop_ray.sources.conll import to_conll_text

from reference_shim import import_reference

hk = import_reference()


def build_reference_kb(kb_table):
    from hamerkop.core import Entity

    entities = {}
    for row in kb_table.to_pylist():
        e = Entity(
            row["entity_id"],
            row["entity_type"],
            row["name"],
            row["origin"],
            urls=list(row["urls"]),
        )
        e.names = set(row["names"])
        entities[row["entity_id"]] = e

    class _Loader:
        def load(self):
            return entities

    return hk.MemoryKB(_Loader())


def run_reference_pipeline(conll_text: str, kb):
    from hamerkop.candidates import CombiningGenerator, IndexBasedGenerator
    from hamerkop.coref import (
        AcronymStage,
        CascadeCoref,
        ExactMatchStage,
        SingleTokenMatchStage,
        TypeSpecificStage,
    )
    from hamerkop.io import DocumentPreparer, read_conll
    from hamerkop.kb import ExactMatchMemoryNameIndex, NgramMemoryNameIndex
    from hamerkop.preprocessor import (
        CascadePreprocessor,
        GarbageRemover,
        TextNormalizer,
        TooLongMentionRemover,
        TwitterHashtagProcessor,
        TwitterUsernameReplacer,
        TypeValidator,
    )
    from hamerkop.resolver import (
        CascadeResolver,
        EditDistanceResolver,
        ExactNameResolver,
        WikipediaResolver,
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
    exact_idx = ExactMatchMemoryNameIndex(kb)
    ngram_idx = NgramMemoryNameIndex(kb, 4)
    cand_gen = CombiningGenerator(
        [IndexBasedGenerator(exact_idx, 25), IndexBasedGenerator(ngram_idx, 25)]
    )
    resolver = CascadeResolver(
        [ExactNameResolver(), WikipediaResolver(), EditDistanceResolver()]
    )

    assignment = {}  # our mention-id scheme → cluster id
    surfaces = {}
    types = {}
    for rows in read_conll(io.StringIO(conll_text)):
        doc = preparer.process(rows)
        if doc is None:
            continue
        preprocessor.process(doc)
        coref.coref(doc)
        cand_gen.process(doc)
        resolver.resolve(doc)
        for ci, chain in enumerate(doc.mention_chains):
            if chain.entity is not None:
                cluster = chain.entity.id
            else:
                cluster = f"NIL|{doc.doc_id}|{min(m.offsets[0] for m in chain.mentions)}"
            for m in chain.mentions:
                mid = f"M-{doc.doc_id}-{m.offsets[0]}-{m.offsets[1]}"
                assignment[mid] = cluster
                surfaces[mid] = m.original_string
                types[mid] = m.type
    return assignment, surfaces, types


@pytest.fixture(scope="module")
def world():
    from hamerkop_ray.synth import synth_world

    return synth_world(n_docs=150, n_entities=150, seed=23)


@pytest.mark.usefixtures("ray_session")
def test_pairwise_f1_vs_reference(world):
    docs, kb, links = world
    ref_kb = build_reference_kb(kb)
    ref_assign, surfaces, types = run_reference_pipeline(to_conll_text(docs), ref_kb)

    ours = flagship_table(docs, kb)
    our_assign = {
        r["mention_id"]: r["cluster_id"] for r in ours.to_pylist()
    }

    assert set(our_assign) == set(ref_assign)

    pairs = blocking_pairs(surfaces, types)
    result = pairwise_f1(our_assign, ref_assign, pairs)
    assert result["n_pairs"] > 200, result
    assert result["f1"] >= 0.99, result


@pytest.mark.usefixtures("ray_session")
def test_span_sequence_invariant(world):
    """Per-row span-sequence equality (BASELINE.json input_hint): the engine
    never rewrites the documents table; verify the pipeline's view of spans
    is byte-identical to the input."""
    import ray.data as rd

    docs, kb, links = world
    ds = rd.from_arrow(docs)
    out = ds.materialize()
    orig = {r["doc_id"]: r["spans"] for r in docs.to_pylist()}
    for batch in out.iter_batches(batch_format="pyarrow"):
        for row in batch.to_pylist():
            assert row["spans"] == orig[row["doc_id"]]
