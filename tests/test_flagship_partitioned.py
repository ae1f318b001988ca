"""Partitioned (shuffle-join) flagship path vs the broadcast path.

VERDICT r3 #5: the broadcast KB dict cannot survive the reference's real KB
scale (~10M entities io.py:511-513); run_flagship must switch to the
distributed join path above a KB-size threshold and produce the same
resolutions.
"""

import numpy as np
import pyarrow as pa
import pytest

from hamerkop_ray.schemas import DOCUMENTS, KB


def _collect(out):
    return sorted(
        (r["mention_id"], r["doc_id"], r["entity_id"], r["cluster_id"],
         r["method"])
        for b in out.iter_batches(batch_format="pyarrow")
        for r in b.to_pylist()
    )


@pytest.mark.usefixtures("ray_session")
def test_partitioned_equals_broadcast_small_world():
    """Auto-selected partitioned path (tiny threshold) == broadcast path
    with exact-only blocking, mention for mention including cluster ids."""
    import ray.data as rd

    from hamerkop_ray.pipelines.flagship import run_flagship
    from hamerkop_ray.synth import synth_world

    docs, kb, _links = synth_world(n_docs=60, n_entities=120, seed=7)

    broadcast = run_flagship(
        rd.from_arrow(docs), kb,
        gen_config=[("exact", "name")], partitioned=False,
    )["mentions"]
    part = run_flagship(
        rd.from_arrow(docs), kb,
        partitioned=None, kb_broadcast_limit_bytes=1,  # force auto-switch
    )["mentions"]

    got_b = _collect(broadcast)
    got_p = _collect(part)
    assert len(got_b) > 0
    assert got_p == got_b


def _fast_big_kb(n: int) -> pa.Table:
    """Vectorized ≥1M-entity synthetic KB (unique unambiguous names)."""
    ids_ = [f"E{i:07d}" for i in range(n)]
    names = [f"Vexacorp {i:07d} Holdings" for i in range(n)]
    return pa.table(
        {
            "entity_id": pa.array(ids_, pa.string()),
            "entity_type": pa.array(["ORG"] * n, pa.string()),
            "name": pa.array(names, pa.string()),
            "names": pa.array([[nm] for nm in names],
                              pa.list_(pa.string())),
            "origin": pa.array(["GEO"] * n, pa.string()),
            "urls": pa.array([[]] * n, pa.list_(pa.string())),
            "country": pa.array([""] * n, pa.string()),
            "latitude": pa.array(np.zeros(n), pa.float64()),
            "longitude": pa.array(np.zeros(n), pa.float64()),
            "population": pa.array(np.zeros(n, np.int64), pa.int64()),
        },
        schema=KB,
    )


def _docs_mentioning(names_types: list[list[tuple[str, str]]]) -> pa.Table:
    """One document per inner list; filler tokens around each mention."""
    doc_rows = []
    for di, mentions in enumerate(names_types):
        spans = []
        cursor = 0

        def tok(t):
            nonlocal cursor
            spans.append(
                {"kind": "token", "text": t, "media_ref": "",
                 "offset": cursor + 1})
            cursor += len(t) + 1

        for mi, (surface, etype) in enumerate(mentions):
            tok("alpha")
            tok(f"beta{mi}")
            spans.append(
                {"kind": f"mention/{etype}", "text": surface,
                 "media_ref": "", "offset": cursor + 1})
            cursor += len(surface) + 1
            tok("gamma")
        doc_rows.append({"doc_id": f"SYN_NW_{di:08d}", "spans": spans})
    return pa.Table.from_pylist(doc_rows, schema=DOCUMENTS)


@pytest.mark.usefixtures("ray_session")
def test_partitioned_million_entity_kb_matches_broadcast_subset():
    """e2e with a 1M-entity KB through the partitioned path; assignments
    must equal the broadcast path run on the mentioned-entity SUBSET of the
    same KB (exact blocking on unique names — no cross-talk from the other
    999k entities)."""
    import ray.data as rd

    from hamerkop_ray.pipelines.flagship import run_flagship

    kb = _fast_big_kb(1_000_000)
    assert kb.num_rows >= 1_000_000

    # 30 docs, 2 mentions each, drawn from a 60-entity slice
    rng = np.random.default_rng(3)
    ent_idx = rng.choice(600, size=(30, 2), replace=True)
    names = kb["name"].to_pylist()[:600]
    docs = _docs_mentioning(
        [[(names[i], "ORG"), (names[j], "ORG")] for i, j in ent_idx]
    )

    part = run_flagship(rd.from_arrow(docs), kb, partitioned=True)["mentions"]
    got_p = _collect(part)
    assert len(got_p) == 60

    sub_kb = kb.slice(0, 600)
    broadcast = run_flagship(
        rd.from_arrow(docs), sub_kb,
        gen_config=[("exact", "name")], partitioned=False,
    )["mentions"]
    got_b = _collect(broadcast)
    assert got_p == got_b
    # every planted mention resolved to its exact-name entity
    methods = {m for (_, _, eid, _, m) in got_p}
    assert methods == {"exact"}


@pytest.mark.usefixtures("ray_session")
def test_partitioned_empty_and_nil_only_edge_cases():
    """Zero-row and zero-candidate inputs must not poison the acero joins
    (Ray 2.49 empty-partition defect — round-4 regression guards)."""
    import ray.data as rd

    from hamerkop_ray.pipelines.flagship import run_flagship
    from hamerkop_ray.synth import make_kb

    kb = make_kb(50, 1)
    empty = rd.from_arrow(DOCUMENTS.empty_table())
    out = run_flagship(empty, kb, partitioned=True)["mentions"]
    assert sum(b.num_rows for b in out.iter_batches(batch_format="pyarrow")) == 0

    # one chain whose name matches nothing: all-NIL corpus, empty edge set
    doc = pa.Table.from_pylist(
        [{
            "doc_id": "X_NW_1",
            "spans": [
                {"kind": "token", "text": "hello", "media_ref": "",
                 "offset": 1},
                {"kind": "mention/PER", "text": "Zzyzx Qwortle",
                 "media_ref": "", "offset": 7},
            ],
        }],
        schema=DOCUMENTS,
    )
    out2 = run_flagship(rd.from_arrow(doc), kb, partitioned=True)["mentions"]
    rows = [
        r for b in out2.iter_batches(batch_format="pyarrow")
        for r in b.to_pylist()
    ]
    assert len(rows) == 1
    assert rows[0]["entity_id"] == ""          # NIL
    assert rows[0]["cluster_id"].startswith("X_NW_1")  # own singleton node


@pytest.mark.usefixtures("ray_session")
def test_partitioned_translit_probe_resolves_cyrillic_surface():
    """The distributed blocking join also probes the chain's TRANSLIT key
    (the shuffle twin of the broadcast ("exact","translit") generator):
    a Cyrillic surface must resolve to its Latin KB alias through the
    partitioned path."""
    import ray.data as rd

    from hamerkop_ray.functions.langid import NgramLangDetector
    from hamerkop_ray.functions.translit import RuleRomanizer
    from hamerkop_ray.pipelines.flagship import resolve_partitioned
    from hamerkop_ray.stages.chains import Stage1Chains
    from hamerkop_ray.stages.preprocess import (
        cascade,
        default_cascade,
        name_projector,
    )

    kb = pa.Table.from_pylist(
        [
            {"entity_id": "E1", "entity_type": "GPE", "name": "Minsk",
             "names": ["Minsk"], "origin": "GEO", "urls": [],
             "country": "", "latitude": 0.0, "longitude": 0.0,
             "population": 0},
            {"entity_id": "E2", "entity_type": "GPE", "name": "Pinsk",
             "names": ["Pinsk"], "origin": "GEO", "urls": [],
             "country": "", "latitude": 0.0, "longitude": 0.0,
             "population": 0},
        ],
        schema=KB,
    )
    doc = pa.Table.from_pylist(
        [{
            "doc_id": "D_NW_9",
            "spans": [
                {"kind": "mention/GPE", "text": "Минск", "media_ref": "",
                 "offset": 1},
            ],
        }],
        schema=DOCUMENTS,
    )
    pre = cascade(
        [default_cascade(), name_projector(RuleRomanizer().translate)])
    stage = Stage1Chains(preprocessor=pre, lang_detector=NgramLangDetector())
    chains = rd.from_arrow(doc).map_batches(stage, batch_format="pyarrow")
    resolved = resolve_partitioned(chains, kb)
    rows = [
        r for b in resolved.iter_batches(batch_format="pyarrow")
        for r in b.to_pylist()
    ]
    assert len(rows) == 1
    assert rows[0]["entity_id"] == "E1"
    # blocking retrieved E1 via the translit key; the cascade then assigns
    # through the distance resolver (ExactNameResolver reads norm strings
    # only — reference semantics), at distance 0 on the romanized form
    assert rows[0]["method"] == "editdist"
