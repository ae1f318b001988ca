"""Coverage extras: translators, KV cache, side inputs, GT-driven parse,
embedding resolver, in-country feature."""

import pyarrow as pa
import pytest

from hamerkop_ray.functions.translit import (
    AccentStripRomanizer,
    DictTranslator,
    MemoryCachedTranslator,
    PersistentCachedTranslator,
)
from hamerkop_ray.schemas import DOCUMENTS
from hamerkop_ray.stages.parse import ParseDocuments, ParseDocumentsWithGroundTruth
from hamerkop_ray.stages.scoring import (
    EmbeddingResolver,
    EntityResolution,
    HashNameEncoder,
    in_country_feature,
)
from hamerkop_ray.state.kvcache import PersistentKVCache


def test_dict_translator_ci():
    t = DictTranslator({"Addis Ababa": "አዲስ አበባ"})
    assert t.translate("addis ababa") == "አዲስ አበባ"
    assert t.translate("unknown") is None


def test_memory_cached_translator():
    calls = []

    class Counting:
        def translate(self, s, lang=None):
            calls.append(s)
            return s.upper()

    t = MemoryCachedTranslator(Counting())
    assert t.translate("ab") == "AB"
    assert t.translate("ab") == "AB"
    assert calls == ["ab"]


def test_persistent_cached_translator(tmp_path):
    cache = PersistentKVCache(str(tmp_path / "c.parquet"), sync_every=1)
    t = PersistentCachedTranslator(DictTranslator({"a": "A"}), cache)
    assert t.translate("a") == "A"
    cache.close()
    cache2 = PersistentKVCache(str(tmp_path / "c.parquet"))
    assert cache2["a"] == "A"


def test_kvcache_flush_and_reload(tmp_path):
    p = str(tmp_path / "kv.parquet")
    with PersistentKVCache(p, sync_every=2) as kv:
        kv["x"] = "1"
        kv["y"] = "2"  # triggers flush
        kv["z"] = "3"
    kv2 = PersistentKVCache(p)
    assert len(kv2) == 3 and kv2.get("z") == "3"


def test_accent_strip_romanizer():
    r = AccentStripRomanizer()
    assert r.translate("Café Zürich") == "Cafe Zurich"
    assert r.translate("plain ascii") is None  # nothing to project
    assert r.translate("Addis", lang="eng") is None
    assert r.translate("москва") is None  # non-Latin, lenient mode
    with pytest.raises(NotImplementedError):
        AccentStripRomanizer(strict=True).translate("москва")


def test_side_inputs(tmp_path):
    from hamerkop_ray.sources.side_inputs import load_set, load_tsv_dict

    d = tmp_path / "m.tsv"
    d.write_text("UN\tUnited Nations\nEU\tEuropean Union\n")
    assert load_tsv_dict(str(d))["UN"] == "United Nations"
    assert load_tsv_dict(str(d), lowercase_keys=True)["un"] == "United Nations"
    s = tmp_path / "s.txt"
    s.write_text("Alpha\n\nBeta\n")
    assert load_set(str(s), lowercase=True) == {"alpha", "beta"}


def _doc(doc_id, spans):
    return pa.Table.from_pylist(
        [{"doc_id": doc_id,
          "spans": [{"kind": k, "text": t, "media_ref": m, "offset": o}
                    for (k, t, m, o) in spans]}],
        schema=DOCUMENTS,
    )


def test_parse_with_ground_truth():
    # text: "hello Henry Smith world"
    doc = _doc(
        "D_NW_9",
        [
            ("token", "hello", "", 1),
            ("token", "Henry", "", 7),
            ("token", "Smith", "", 13),
            ("token", "world", "", 19),
        ],
    )
    gt = {"D_NW_9": {(7, 17): "PER"}}
    out = ParseDocumentsWithGroundTruth(gt)(doc).to_pylist()
    assert len(out) == 1
    m = out[0]
    assert m["surface"] == "Henry Smith" and m["entity_type"] == "PER"
    assert (m["tok_start"], m["tok_stop"]) == (1, 3)
    # docs absent from GT are dropped
    assert ParseDocumentsWithGroundTruth({})(doc).num_rows == 0


def test_gt_parse_matches_tagged_parse(small_world):
    docs, kb, links = small_world
    gt: dict = {}
    for r in links.to_pylist():
        gt.setdefault(r["doc_id"], {})[(r["char_start"], r["char_stop"])] = r["entity_type"]
    tagged = ParseDocuments()(docs).to_pylist()
    gt_driven = ParseDocumentsWithGroundTruth(gt)(docs).to_pylist()
    key = lambda m: (m["doc_id"], m["char_start"], m["char_stop"], m["surface"],
                     m["entity_type"], m["tok_start"], m["tok_stop"])
    assert sorted(map(key, tagged)) == sorted(map(key, gt_driven))


def test_in_country_feature():
    assert in_country_feature({"country": "FR"}, {"FR", "DE"}) == 1.0
    assert in_country_feature({"country": "US"}, {"FR"}) == 0.0


def test_hash_encoder_similarity_ordering():
    enc = HashNameEncoder()
    v = enc.encode_batch(["National United Council", "National Unted Council", "Zqx Wvb"])
    sim_near = float(v[0] @ v[1])
    sim_far = float(v[0] @ v[2])
    assert sim_near > 0.8 > sim_far


def test_embedding_resolver_selects_best(small_world):
    docs, kb, links = small_world
    from hamerkop_ray.stages.blocking import CandidateGeneration, NameIndexData
    from hamerkop_ray.stages.chains import Stage1Chains

    chains = Stage1Chains()(docs)
    cands = CandidateGeneration(NameIndexData(kb), config=[("exact", "name"), ("ngram", "name")])(chains)
    res = EntityResolution(kb, resolvers=[EmbeddingResolver(threshold=0.75)])
    resolved = res(cands).to_pylist()
    gt = {r["mention_id"]: r["kb_id"] for r in links.to_pylist()}
    total = correct = 0
    for c in resolved:
        gts = {gt[m["mention_id"]] for m in c["mentions"] if m["mention_id"] in gt}
        linked = {g for g in gts if not g.startswith("NIL")}
        if linked:
            total += 1
            correct += c["entity_id"] in linked
    assert total > 20 and correct / total > 0.75


def test_translit_path_end_to_end():
    """NameProjector (translit) feeding TranslitIndexBasedGenerator semantics:
    an accented mention resolves via its romanized form."""
    import pyarrow as pa

    from hamerkop_ray.functions.translit import AccentStripRomanizer
    from hamerkop_ray.schemas import DOCUMENTS, KB
    from hamerkop_ray.stages import preprocess as pp
    from hamerkop_ray.stages.blocking import CandidateGeneration, NameIndexData
    from hamerkop_ray.stages.chains import Stage1Chains

    kb = pa.Table.from_pylist(
        [{"entity_id": "E1", "entity_type": "GPE", "name": "Zurich City",
          "names": ["Zurich City"], "origin": "GEO", "urls": [], "country": "CH",
          "latitude": 0.0, "longitude": 0.0, "population": 1}],
        schema=KB,
    )
    docs = pa.Table.from_pylist(
        [{"doc_id": "D_NW_1",
          "spans": [{"kind": "token", "text": "in", "media_ref": "", "offset": 1},
                    {"kind": "mention/GPE", "text": "Zürich City", "media_ref": "", "offset": 4}]}],
        schema=DOCUMENTS,
    )
    rom = AccentStripRomanizer()
    cascade = pp.cascade([pp.default_cascade(), pp.name_projector(rom.translate, "translit")])
    # non-English doc language: the romanizer (like URoman, string.py:145-150)
    # skips English/pure-ASCII strings
    chains = Stage1Chains(preprocessor=cascade, default_lang="deu")(docs)
    assert chains.to_pylist()[0]["translit"] == "Zurich City"

    gen = CandidateGeneration(
        NameIndexData(kb), config=[("exact", "name"), ("exact", "translit")]
    )
    cands = gen(chains).to_pylist()[0]["candidates"]
    assert [c["entity_id"] for c in cands] == ["E1"]
    assert cands[0]["source"] == "exact:translit"
