"""Fused stage 1: documents(spans) → chains table, one map_batches, no shuffle.

parse (stages.parse) → preprocess (stages.preprocess, vectorized over the
batch mentions table) → in-doc coref sieve (stages.coref, per-doc) → chain
rollups.  Fusing keeps each document's mentions inside one task (the
reference's whole-document locality, pipeline.py:117-145) and emits one
complete row per chain, so all downstream stages are strictly per-row.
"""

from __future__ import annotations

import pyarrow as pa

from .. import ids
from ..schemas import CHAINS
from . import coref as coref_mod
from .parse import ParseDocuments
from .preprocess import Step, default_cascade

_MENTION_FIELDS = [
    "mention_id",
    "mention_idx",
    "surface",
    "norm",
    "translit",
    "translate",
    "entity_type",
    "char_start",
    "char_stop",
    "tok_start",
    "tok_stop",
]


def _first_longest(values: list[str]) -> str:
    """max(key=len) — first occurrence wins ties (matches python max)."""
    return max(values, key=len) if values else ""


def _dedup_keep_order(values: list[str]) -> list[str]:
    seen: set[str] = set()
    out = []
    for v in values:
        if v not in seen:
            seen.add(v)
            out.append(v)
    return out


def chain_rollup(doc_id: str, chain: coref_mod.Chain, lang: str, doc_type: str) -> dict:
    """MentionChain rollups (core.py:192-234): name = longest string, names =
    distinct strings, translit/translate = longest non-empty, all_strings =
    names ∪ translits ∪ translates, type = first mention's type."""
    norms = [m["norm"] for m in chain.mentions]
    translits = [m["translit"] for m in chain.mentions if m["translit"]]
    translates = [m["translate"] for m in chain.mentions if m["translate"]]
    return {
        "doc_id": doc_id,
        "chain_id": ids.chain_id(doc_id, min(m["char_start"] for m in chain.mentions)),
        "name": _first_longest(norms),
        "names": _dedup_keep_order(norms),
        "all_strings": _dedup_keep_order(norms + translits + translates),
        "translit": _first_longest(translits),
        "translate": _first_longest(translates),
        "entity_type": chain.type,
        "lang": lang,
        "doc_type": doc_type,
        "n_mentions": len(chain.mentions),
        "mentions": [{f: m[f] for f in _MENTION_FIELDS} for m in chain.mentions],
    }


class Stage1Chains:
    """documents → chains, for map_batches(batch_format="pyarrow").

    Stateless unless given a language detector (then run it as an actor pool
    so detector profiles load once per actor).
    """

    def __init__(
        self,
        preprocessor: Step | None = None,
        sieve_stages=None,
        lang_detector=None,
        default_lang: str = "eng",
    ):
        self.parse = ParseDocuments(lang_detector, default_lang)
        self.preprocessor = preprocessor if preprocessor is not None else default_cascade()
        self.sieve_stages = sieve_stages

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = self.chain_rows(batch)
        if not out:
            return CHAINS.empty_table()
        return pa.Table.from_pylist(out, schema=CHAINS)

    def chain_rows(self, batch: pa.Table) -> list[dict]:
        """Python-dict form of the output — used by the fused ER stage to
        skip intermediate Arrow round-trips."""
        mentions = self.parse(batch)
        mentions = self.preprocessor(mentions)
        if mentions.num_rows == 0:
            return []
        rows = mentions.to_pylist()
        # mentions arrive doc-contiguous (parse emits per doc, preprocess only
        # filters/rewrites rows) — group by run.
        out: list[dict] = []
        i = 0
        n = len(rows)
        while i < n:
            j = i
            doc_id = rows[i]["doc_id"]
            while j < n and rows[j]["doc_id"] == doc_id:
                j += 1
            doc_rows = rows[i:j]
            doc = {"lang": doc_rows[0]["lang"], "doc_type": doc_rows[0]["doc_type"]}
            chains = coref_mod.run_sieve(doc_rows, self.sieve_stages, doc)
            for ch in chains:
                out.append(chain_rollup(doc_id, ch, doc["lang"], doc["doc_type"]))
            i = j
        return out
