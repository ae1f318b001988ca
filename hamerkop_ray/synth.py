"""Deterministic synthetic world: KB + interleaved span-documents + ground truth.

BASELINE.json tells us to build over a Lance/parquet table of exactly the
input_hint shape (doc_id, spans) and to synthesise it deterministically at
small scale — no external data.  Every decision here is a pure function of
(seed, doc_id, slot) via blake2b, so generation is order-free: any partition
layout, any parallelism, any retry produces identical rows.

The generated world exercises the reference's semantics (SURVEY.md §2 / §5):
  * coref structure: repeated mention strings (case-varied), ORG acronyms
    matching multi-token names (AcronymStage), single-token PER last names
    (SingleTokenMatchStage);
  * linking structure: KB aliases, typo'd surfaces within edit distance for
    EditDistanceResolver, wikipedia urls for WikipediaResolver;
  * NIL mentions (names absent from the KB) with NIL cluster ids;
  * Zipf-skewed hot surface forms (country-like GPEs) for salting tests;
  * interleaved media spans (identity-only) and garbage/emoji/twitter
    surfaces for the preprocessors.
"""

from __future__ import annotations

import pyarrow as pa

from . import ids
from .schemas import DOCUMENTS, KB, LINKS

# ---------------------------------------------------------------------------
# deterministic pseudo-randomness
# ---------------------------------------------------------------------------


def _h(key: str) -> int:
    return ids.stable_hash64(key)


def _rnd(key: str) -> float:
    """Uniform [0,1) derived from a string key."""
    return _h(key) / 2.0**64


def _pick(key: str, seq):
    return seq[_h(key) % len(seq)]


# ---------------------------------------------------------------------------
# name generation
# ---------------------------------------------------------------------------

_SYLLABLES = [
    "ka", "ro", "mi", "ta", "ne", "so", "la", "ve", "du", "po",
    "za", "li", "mo", "ren", "gas", "tur", "bel", "nor", "fin", "qua",
]
_FIRST_NAMES = [
    "Amara", "Bekele", "Chidi", "Darius", "Elena", "Farid", "Goran", "Hania",
    "Imran", "Jelena", "Kofi", "Leila", "Marek", "Nadia", "Omar", "Petra",
    "Quang", "Rania", "Stefan", "Tariq", "Uma", "Viktor", "Wanda", "Xenia",
    "Yusuf", "Zara", "Anton", "Bruno", "Clara", "Dmitri", "Esther", "Felix",
]
_ORG_WORDS = [
    "National", "United", "Federal", "Central", "Democratic", "Popular",
    "Industrial", "Agricultural", "Maritime", "Northern", "Southern", "Royal",
    "Continental", "Provincial", "Allied", "Eastern", "Western", "Regional",
]
_ORG_KINDS = ["Council", "Group", "Bank", "Party", "Union", "Institute",
              "Authority", "Federation", "Commission", "Alliance"]
_GPE_SUFFIX = ["ville", "burg", "stan", "land", "ia", "grad", "port", "field"]
_LOC_KINDS = ["Mount", "Lake", "River", "Valley", "Bay", "Plateau"]

# Hot GPE surface forms — Zipf head for skew/salting tests.
HOT_GPES = ["Freedonia", "Sylvania", "Osterlich", "Molvania", "Bandria"]

ENTITY_TYPES = ["PER", "ORG", "GPE", "LOC"]


def _syl_word(key: str, n_syl: int) -> str:
    w = "".join(_pick(f"{key}:syl{i}", _SYLLABLES) for i in range(n_syl))
    return w.capitalize()


def _entity_name(seed: int, idx: int, etype: str) -> str:
    key = f"{seed}:ent:{idx}"
    if etype == "PER":
        return f"{_pick(key + ':fn', _FIRST_NAMES)} {_syl_word(key + ':ln', 2 + _h(key + ':nl') % 2)}"
    if etype == "ORG":
        return (
            f"{_pick(key + ':w1', _ORG_WORDS)} {_pick(key + ':w2', _ORG_WORDS)} "
            f"{_pick(key + ':k', _ORG_KINDS)}"
        )
    if etype == "GPE":
        if idx < len(HOT_GPES):
            return HOT_GPES[idx]
        return _syl_word(key + ':g', 2 + _h(key + ':gl') % 2) + _pick(key + ':sfx', _GPE_SUFFIX)
    # LOC
    return f"{_pick(key + ':lk', _LOC_KINDS)} {_syl_word(key + ':lw', 2)}"


def _typo(s: str, key: str) -> str:
    """One deterministic character edit (edit distance 1)."""
    if len(s) < 4:
        return s
    i = 1 + _h(key) % (len(s) - 2)
    if _h(key + ":op") % 2:
        return s[:i] + s[i + 1 :]  # deletion
    return s[: i] + s[i + 1] + s[i] + s[i + 2 :]  # transposition


def _aliases(name: str, etype: str, key: str) -> list[str]:
    out = []
    toks = name.split()
    if etype == "ORG" and len(toks) >= 2:
        out.append("".join(t[0].upper() for t in toks))  # acronym
    if len(toks) >= 2 and _rnd(key + ":rev") < 0.3:
        out.append(" ".join(reversed(toks)))
    if _rnd(key + ":typo") < 0.4:
        out.append(_typo(name, key + ":typo:v"))
    if _rnd(key + ":low") < 0.2:
        out.append(name.lower())
    # dedup, drop accidental equality with canonical
    seen, uniq = {name}, []
    for a in out:
        if a not in seen:
            seen.add(a)
            uniq.append(a)
    return uniq


# ---------------------------------------------------------------------------
# KB
# ---------------------------------------------------------------------------


def make_kb(n_entities: int = 400, seed: int = 42) -> pa.Table:
    """Deterministic KB table (schemas.KB)."""
    rows = []
    for idx in range(n_entities):
        key = f"{seed}:ent:{idx}"
        etype = ENTITY_TYPES[_h(key + ":t") % 4] if idx >= len(HOT_GPES) else "GPE"
        name = _entity_name(seed, idx, etype)
        entity_id = f"E{idx:06d}"
        aliases = _aliases(name, etype, key)
        urls = []
        if _rnd(key + ":wiki") < 0.5:
            urls.append("http://en.wikipedia.org/wiki/" + name.replace(" ", "_"))
        origin = _pick(key + ":or", ["GEO", "WLL", "APB", "AUG-XXX"])
        if etype in ("GPE", "LOC"):
            origin = "GEO"
        rows.append(
            {
                "entity_id": entity_id,
                "entity_type": etype,
                "name": name,
                "names": [name] + aliases,
                "origin": origin,
                "urls": urls,
                "country": _pick(key + ":cc", ["FR", "DE", "ET", "LK", "IN", "US"]),
                "latitude": round(-90 + 180 * _rnd(key + ":lat"), 4),
                "longitude": round(-180 + 360 * _rnd(key + ":lon"), 4),
                "population": _h(key + ":pop") % 10_000_000,
            }
        )
    return pa.Table.from_pylist(rows, schema=KB)


# ---------------------------------------------------------------------------
# documents
# ---------------------------------------------------------------------------

_DOC_MARKERS = ["_NW_", "_WL_", "_SN_", "_DF_", "_RF_"]


def _zipf_entity(key: str, n_entities: int) -> int:
    """Zipf-ish pick: hot head (the HOT_GPES + first entities) gets ~35%."""
    r = _rnd(key)
    if r < 0.35:
        return _h(key + ":hot") % min(len(HOT_GPES) + 10, n_entities)
    return _h(key + ":tail") % n_entities


def _surface_variant(name: str, names: list[str], key: str) -> str:
    r = _rnd(key)
    if r < 0.55 or len(names) == 1:
        s = name
    elif r < 0.85:
        s = _pick(key + ":alias", names[1:])
    else:
        s = _typo(name, key + ":sftypo")
    if _rnd(key + ":case") < 0.12:
        s = s.lower()
    return s


def _adversarial_surface(surface: str, doc_marker: str, key: str) -> str:
    """Occasionally wrap surfaces in the junk forms the preprocessors handle
    (FIXTURES.md §1): smart quotes/emoji (TextNormalizer), twitter @user /
    #HashTag in _SN_ docs, url garbage (GarbageRemover), over-long mentions
    (TooLongMentionRemover)."""
    r = _rnd(key + ":adv")
    if r < 0.90:
        return surface
    if r < 0.925:
        return "‘" + surface + "’"  # smart quotes → ascii
    if r < 0.94:
        return surface + " \U0001F600"  # emoji stripped (note: adds a token)
    if r < 0.955 and doc_marker == "_SN_" and " " not in surface:
        return "#" + surface  # hashtag processing
    if r < 0.97:
        return "www." + surface.replace(" ", "").lower() + ".example"  # garbage
    if r < 0.985:
        return surface + " of the seven valley region annex"  # over-long
    return surface


def synth_documents(
    base_doc_ids: list[int],
    filler_texts: list[str],
    kb: pa.Table,
    seed: int = 42,
    nil_rate: float = 0.15,
) -> tuple[pa.Table, pa.Table]:
    """Build (documents, ground_truth_links) from base ids + filler texts.

    One output document per input id.  Deterministic per doc_id — callable
    from inside map_batches over arbitrary partitions of the base table.
    """
    ents = kb.to_pylist()
    n_ent = len(ents)
    doc_rows = []
    link_rows = []
    for base_id, filler in zip(base_doc_ids, filler_texts):
        marker = _DOC_MARKERS[_h(f"{seed}:dt:{base_id}") % len(_DOC_MARKERS)]
        doc_id = f"SYN{marker}{base_id:08d}"
        fill_toks = filler.split()
        if not fill_toks:
            fill_toks = ["lorem"]
        n_mentions = 3 + _h(f"{seed}:nm:{base_id}") % 5
        spans = []
        cursor = 0  # chars consumed so far ('-'.join semantics: +1 space each)

        def emit_token(tok):
            nonlocal cursor
            spans.append(("token", tok, "", cursor + 1))
            cursor += len(tok) + 1

        def emit_media(ref):
            spans.append(("media", "", ref, cursor + 1))

        def emit_mention(surface, etype):
            nonlocal cursor
            start = cursor + 1
            spans.append((f"mention/{etype}", surface, "", start))
            cursor += len(surface) + 1
            return start, start + len(surface) - 1

        fill_i = 0
        mentions_planned = []
        # choose mentions: entity-linked or NIL
        for m in range(n_mentions):
            mkey = f"{seed}:m:{base_id}:{m}"
            if _rnd(mkey + ":nil") < nil_rate:
                nil_idx = _h(mkey + ":nid") % max(20, len(base_doc_ids) // 4)
                surface = f"Zyx {_syl_word(mkey + ':nw', 2)}{nil_idx}"
                etype = _pick(mkey + ":nt", ENTITY_TYPES)
                surface = _adversarial_surface(surface, marker, mkey)
                mentions_planned.append((surface, etype, "", f"NIL{nil_idx:05d}"))
            else:
                ent = ents[_zipf_entity(mkey + ":e", n_ent)]
                surface = _surface_variant(ent["name"], ent["names"], mkey + ":v")
                surface = _adversarial_surface(surface, marker, mkey)
                mentions_planned.append((surface, ent["entity_type"], ent["entity_id"], ""))
            # coref: repeat some mentions (same entity, possibly case-varied)
            if _rnd(mkey + ":rep") < 0.25:
                s2, e2, eid2, nil2 = mentions_planned[-1]
                if _rnd(mkey + ":repcase") < 0.5:
                    s2 = s2.lower()
                mentions_planned.append((s2, e2, eid2, nil2))

        n_slots = len(mentions_planned)
        per_gap = max(1, len(fill_toks) // (n_slots + 1))
        for mi, (surface, etype, eid, nil_id) in enumerate(mentions_planned):
            for _ in range(per_gap):
                if fill_i < len(fill_toks):
                    emit_token(fill_toks[fill_i])
                    fill_i += 1
            if _rnd(f"{seed}:med:{base_id}:{mi}") < 0.12:
                emit_media(f"media://{base_id}/{mi}")
            start, stop = emit_mention(surface, etype)
            link_rows.append(
                {
                    "system_run_id": "synth",
                    "mention_id": ids.mention_id(doc_id, start, stop),
                    "mention_text": surface,
                    "doc_id": doc_id,
                    "char_start": start,
                    "char_stop": stop,
                    "kb_id": eid if eid else nil_id,
                    "entity_type": etype,
                    "mention_type": "NAM",
                    "confidence": 1.0,
                }
            )
        while fill_i < len(fill_toks):
            emit_token(fill_toks[fill_i])
            fill_i += 1

        doc_rows.append(
            {
                "doc_id": doc_id,
                "spans": [
                    {"kind": k, "text": t, "media_ref": mr, "offset": off}
                    for (k, t, mr, off) in spans
                ],
            }
        )
    docs = pa.Table.from_pylist(doc_rows, schema=DOCUMENTS)
    links = pa.Table.from_pylist(link_rows, schema=LINKS)
    return docs, links


class SynthDocsFromText:
    """map_batches callable: testdata documents (doc_id:int64, text) → span
    documents (schemas.DOCUMENTS).  Deterministic per row, so any partitioning
    of the base table yields identical output rows.  The KB table is shipped
    via ray.put and materialized once per actor."""

    def __init__(self, kb_ref, seed: int = 42, nil_rate: float = 0.15):
        try:
            import ray

            if isinstance(kb_ref, ray.ObjectRef):
                kb_ref = ray.get(kb_ref)
        except ImportError:
            pass
        self.kb = kb_ref
        self.seed = seed
        self.nil_rate = nil_rate

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_ = [int(x) for x in batch["doc_id"].to_pylist()]
        texts = batch["text"].to_pylist()
        docs, _links = synth_documents(ids_, texts, self.kb, self.seed, self.nil_rate)
        return docs


class SynthLinksFromText(SynthDocsFromText):
    """Same derivation, emitting the ground-truth links table instead."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_ = [int(x) for x in batch["doc_id"].to_pylist()]
        texts = batch["text"].to_pylist()
        _docs, links = synth_documents(ids_, texts, self.kb, self.seed, self.nil_rate)
        return links


def synth_world(n_docs: int = 200, n_entities: int = 400, seed: int = 42):
    """Self-contained world (no testdata dependency) for unit tests."""
    kb = make_kb(n_entities, seed)
    base_ids = list(range(n_docs))
    fillers = [
        " ".join(
            _pick(f"{seed}:fill:{i}:{j}", ["the", "quick", "brown", "fox", "jumps",
                                           "over", "lazy", "dog", "and", "runs",
                                           "far", "away", "home", "again", "now"])
            for j in range(10 + _h(f"{seed}:fl:{i}") % 30)
        )
        for i in base_ids
    ]
    docs, links = synth_documents(base_ids, fillers, kb, seed)
    return docs, kb, links
