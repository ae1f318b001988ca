"""Stage 3 — within-document coreference: the sieve, per document row.

Reference: the "Stanford Sieve" CascadeCoref (coref.py:197-210) — every
mention starts as its own chain; ordered stages merge chains, highest
precision first.  Because a document is one row of the documents table and
mentions of a doc are produced together, the whole sieve is a per-row
computation inside map_batches — NO shuffle.  The order-sensitive stages
(AcronymStage first-match semantics, coref.py:308-321) are deliberately kept
as scalar per-doc logic for exact parity (SURVEY.md §7 hard part 1); documents
are small, so this is not a hot loop over the corpus, only over one doc's
chains.

Chain identity is content-derived: chain_id = "C-<doc>-<min char_start>"
(parallel/retry/partition-count independent; see ids.chain_id).
"""

from __future__ import annotations

from typing import Sequence


class Chain:
    """Lightweight MentionChain analog (core.py:178-240).  Mentions are dicts
    with the mentions-table columns."""

    __slots__ = ("mentions",)

    def __init__(self, mentions: list[dict]):
        self.mentions = mentions

    @property
    def name(self) -> str:
        """Longest mention string; first-seen wins ties (core.py:192-198)."""
        return max((m["norm"] for m in self.mentions), key=len)

    @property
    def type(self) -> str:
        return self.mentions[0]["entity_type"]

    def strings(self) -> list[str]:
        return [m["norm"] for m in self.mentions]


class SieveStage:
    def update(self, chains: list[Chain], doc: dict) -> list[Chain]:
        raise NotImplementedError


def _merge(chains: list[Chain], to_merge: list[Chain]) -> list[Chain]:
    """Merge semantics of CorefStage.merge (coref.py:226-234): dedup the merge
    set, concatenate mentions, drop merged chains, append the new chain last."""
    uniq: list[Chain] = []
    seen: set[int] = set()
    for c in to_merge:
        if id(c) not in seen:
            seen.add(id(c))
            uniq.append(c)
    merged = Chain([m for c in uniq for m in c.mentions])
    out = [c for c in chains if id(c) not in seen]
    out.append(merged)
    return out


class ExactMatchStage(SieveStage):
    """Chains sharing a case-insensitively equal mention string of the same
    type merge (coref.py:266-282)."""

    def update(self, chains, doc):
        groups: dict[tuple[str, str], list[Chain]] = {}
        order: list[tuple[str, str]] = []
        for chain in chains:
            seen_keys = set()
            for m in chain.mentions:
                key = (m["entity_type"], m["norm"].lower())
                if key in seen_keys:
                    continue
                seen_keys.add(key)
                if key not in groups:
                    groups[key] = []
                    order.append(key)
                groups[key].append(chain)
        for key in order:
            group = groups[key]
            # drop chains already merged away in an earlier group
            live = [c for c in group if any(c is x for x in chains)]
            if len(live) > 1:
                chains = _merge(chains, live)
        return chains


class AcronymStage(SieveStage):
    """All-caps mention (len >= min_length) merges with the FIRST same-type
    chain whose multi-token mention's initials equal it (coref.py:285-335).
    Single-merge constraint: a matched chain is consumed."""

    def __init__(self, min_length: int = 2):
        self.min_length = min_length

    def _acronym_of(self, chain: Chain) -> str | None:
        for m in chain.mentions:
            s = m["norm"]
            if len(s) >= self.min_length and s.upper() == s:
                return s
        return None

    @staticmethod
    def _initials_match(acronym: str, chain: Chain) -> bool:
        for m in chain.mentions:
            words = m["norm"].split()
            if words and acronym == "".join(w[0].upper() for w in words if w):
                return True
        return False

    def update(self, chains, doc):
        snapshot = list(chains)
        acronyms: list[tuple[Chain, str]] = []
        for chain in snapshot:
            a = self._acronym_of(chain)
            if a:
                acronyms.append((chain, a))
        for chain, acronym in acronyms:
            consumed = None
            for other in snapshot:
                if other is chain:
                    continue
                if chain.type == other.type and self._initials_match(acronym, other):
                    chains = _merge(chains, [chain, other])
                    consumed = other
                    break  # first potential match only (coref.py:314-317)
            if consumed is not None:
                snapshot = [c for c in snapshot if c is not consumed]
        return chains


class SingleTokenMatchStage(SieveStage):
    """A chain with a single-token name merges with ALL same-type chains whose
    multi-token mention has that token at ``index`` (first/last name,
    coref.py:338-382).  Aggressive by design (documented coref.py:344)."""

    def __init__(self, index: int):
        self.index = index

    @staticmethod
    def _single_token_name(chain: Chain) -> str | None:
        for m in chain.mentions:
            if " " not in m["norm"]:
                return m["norm"]
        return None

    def _matches(self, single_name: str, single_chain: Chain, chain: Chain) -> bool:
        if single_chain.type != chain.type:
            return False
        low = single_name.lower()
        for m in chain.mentions:
            s = m["norm"]
            if " " in s and s.split()[self.index].lower() == low:
                return True
        return False

    def update(self, chains, doc):
        singles: list[tuple[Chain, str]] = []
        for chain in chains:
            name = self._single_token_name(chain)
            if name:
                singles.append((chain, name))
        for single_chain, name in singles:
            matches = [c for c in chains if self._matches(name, single_chain, c)]
            if matches:
                matches.append(single_chain)
                chains = _merge(chains, matches)
        return chains


class TypeSpecificStage(SieveStage):
    """Run the wrapped stage only over chains of the given types
    (coref.py:250-263); other chains pass through untouched."""

    def __init__(self, stage: SieveStage, *types: str):
        self.stage = stage
        self.types = set(types)

    def update(self, chains, doc):
        inside = [c for c in chains if c.type in self.types]
        outside = [c for c in chains if c.type not in self.types]
        return self.stage.update(inside, doc) + outside


class LanguageSpecificStage(SieveStage):
    """Run the wrapped stage only for documents in given languages
    (coref.py:237-247)."""

    def __init__(self, stage: SieveStage, *langs: str):
        self.stage = stage
        self.langs = set(langs)

    def update(self, chains, doc):
        if doc.get("lang") in self.langs:
            return self.stage.update(chains, doc)
        return chains


def default_sieve() -> list[SieveStage]:
    """Canonical high-precision-first ordering (coref.py:197-204 guidance)."""
    return [
        ExactMatchStage(),
        AcronymStage(min_length=2),
        TypeSpecificStage(SingleTokenMatchStage(-1), "PER"),
    ]


def run_sieve(
    doc_mentions: list[dict],
    stages: Sequence[SieveStage] | None = None,
    doc: dict | None = None,
) -> list[Chain]:
    """Run the sieve over one document's mentions (dicts in doc order)."""
    if stages is None:
        stages = default_sieve()
    chains = [Chain([m]) for m in doc_mentions]
    doc = doc or (
        {"lang": doc_mentions[0]["lang"], "doc_type": doc_mentions[0]["doc_type"]}
        if doc_mentions
        else {}
    )
    for stage in stages:
        chains = stage.update(chains, doc)
    return chains
