"""Stage 4 — blocking / candidate generation.

The reference's NameIndex family (kb.py:132-305) is an in-process dict index
probed once per chain (candidates.py:78-222).  Here the same shape becomes:

  * NameIndexData — the index structures, built ONCE from the KB table and
    broadcast via ray.put; every CandidateGeneration actor materializes it in
    __init__ (once per actor, never per batch).  This is the "broadcast the
    small side" join strategy: the KB index is orders of magnitude smaller
    than the corpus (10M entities vs 10^12 documents), so probing inside
    map_batches avoids an all-to-all shuffle of the mention stream entirely.
    For KBs too big to broadcast, see stages.joins.partitioned_join (explicit
    hash-partitioned join with hot-key salting) — same semantics, shuffling
    the narrow probe table instead.

  * Generators — exact (ExactMatchMemoryNameIndex, kb.py:148-190), char-ngram
    idf (NgramMemoryNameIndex, kb.py:193-275), plus the scale-path composite
    keys the reference lacks (SURVEY.md §2.11): Double Metaphone and MinHash
    LSH bands over character 3-gram shingles.

  * CandidateGeneration — actor-pool map_batches over the chains table:
    chain row → ordered candidate list, combining generators with dedup by
    entity id (CombiningGenerator, candidates.py:102-118) or cascade cutoff
    (CascadeGenerator, candidates.py:121-141), with per-actor memoization by
    (lower(name), type) (CachingGenerator, candidates.py:144-166).
"""

from __future__ import annotations

import math
from collections import defaultdict

import pyarrow as pa

from ..functions import strings
from ..functions.minhash import MinHasher
from ..functions.phonetic import name_metaphone
from ..schemas import CANDIDATES, CHAINS

ENTITY_TYPES = ("PER", "ORG", "GPE", "LOC")


class NameIndexData:
    """All name-index structures for one KB, buildable from the KB arrow table.

    Plain dicts — one copy per actor (not per task), shipped via ray.put.
    """

    def __init__(
        self,
        kb: pa.Table,
        ngram_size: int = 4,
        num_perm: int = 64,
        bands: int = 16,
        build: tuple[str, ...] = ("exact", "ngram", "metaphone", "lsh"),
    ):
        self.ngram_size = ngram_size
        self.entities: dict[str, dict] = {}
        self.exact: dict[tuple[str, str], list[str]] = defaultdict(list)
        self.ngram: dict[tuple[str, str], list[tuple[str, int]]] = defaultdict(list)
        self.metaphone: dict[tuple[str, str], list[str]] = defaultdict(list)
        self.lsh: dict[tuple[str, str], list[str]] = defaultdict(list)
        self.num_unique_names = 0
        self.hasher = MinHasher(num_perm=num_perm, seed=1) if "lsh" in build else None
        self.bands = bands

        all_names: set[str] = set()
        rows = kb.to_pylist()
        for e in rows:
            self.entities[e["entity_id"]] = e
            etype = e["entity_type"]
            for idx, name in enumerate(e["names"]):
                all_names.add(name.lower())
                if "exact" in build:
                    self.exact[(etype, name.lower())].append(e["entity_id"])
                if "ngram" in build:
                    formatted = strings.ngram_format(name)
                    for g in strings.ngrams(formatted, ngram_size):
                        self.ngram[(etype, g)].append((e["entity_id"], idx))
                if "metaphone" in build:
                    p, q = name_metaphone(name)
                    if p:
                        self.metaphone[(etype, p)].append(e["entity_id"])
                    if q and q != p:
                        self.metaphone[(etype, q)].append(e["entity_id"])
                if "lsh" in build and self.hasher is not None:
                    for key in self.hasher.band_keys(name, self.bands):
                        self.lsh[(etype, key)].append(e["entity_id"])
        self.num_unique_names = len(all_names)


def _dedup(ids: list[str]) -> list[str]:
    seen: set[str] = set()
    out = []
    for x in ids:
        if x not in seen:
            seen.add(x)
            out.append(x)
    return out


# --- generators: (index, name, entity_type, limit) -> ordered entity ids ----


def exact_find(index: NameIndexData, name: str, etype: str, limit: int = 25) -> list[str]:
    """Case-insensitive exact lookup (kb.py:167-171).  The reference does not
    apply the limit to exact matches; we do not either."""
    return list(index.exact.get((etype, name.lower()), ()))


def ngram_find(index: NameIndexData, name: str, etype: str, limit: int = 25) -> list[str]:
    """Char-ngram idf scoring (kb.py:219-242): sum idf=log1p(N/df) per KB
    name, keep names with mass > max/2, order by mass desc, truncate, map to
    entities.  Deterministic tie-break: (mass desc, entity_id, name_idx)."""
    grams = strings.ngrams(strings.ngram_format(name), index.ngram_size)
    mass: dict[tuple[str, int], float] = defaultdict(float)
    for g in grams:
        postings = index.ngram.get((etype, g))
        if not postings:
            continue
        idf = math.log1p(index.num_unique_names / len(postings))
        for name_id in postings:
            mass[name_id] += idf
    if not mass:
        return []
    threshold = max(mass.values()) / 2
    top = [k for k, v in mass.items() if v > threshold]
    top.sort(key=lambda k: (-mass[k], k[0], k[1]))
    if limit:
        top = top[:limit]
    return _dedup([entity_id for entity_id, _ in top])


def metaphone_find(index: NameIndexData, name: str, etype: str, limit: int = 25) -> list[str]:
    p, q = name_metaphone(name)
    ids: list[str] = []
    if p:
        ids.extend(index.metaphone.get((etype, p), ()))
    if q and q != p:
        ids.extend(index.metaphone.get((etype, q), ()))
    return _dedup(ids)[:limit] if limit else _dedup(ids)


def lsh_find(index: NameIndexData, name: str, etype: str, limit: int = 25) -> list[str]:
    assert index.hasher is not None, "index built without lsh"
    ids: list[str] = []
    for key in index.hasher.band_keys(name, index.bands):
        ids.extend(index.lsh.get((etype, key), ()))
    out = _dedup(ids)
    return out[:limit] if limit else out


FINDERS = {
    "exact": exact_find,
    "ngram": ngram_find,
    "metaphone": metaphone_find,
    "lsh": lsh_find,
}

# which chain string each generator probes with (candidates.py:169-222)
PROBES = {
    "name": lambda c: c["name"],  # IndexBasedGenerator: best (longest) name
    "translit": lambda c: c["translit"],  # TranslitIndexBasedGenerator
    "translate": lambda c: c["translate"],  # TranslatedIndexBasedGenerator
}


class TypeConflation:
    """TypeIgnoringIndex (kb.py:278-305): probe every type in the conflated
    set and union results (dedup by id)."""

    def __init__(self, *type_sets: tuple[str, ...]):
        self.map: dict[str, set[str]] = {}
        for ts in type_sets:
            for t in ts:
                self.map.setdefault(t, set()).update(ts)

    def types_for(self, etype: str) -> list[str]:
        if etype in self.map:
            return sorted(self.map[etype])
        return [etype]


def kb_exact_index_table(kb: pa.Table) -> pa.Table:
    """Explode the KB into the exact-blocking index TABLE: one row per
    (entity_type, lower(name), entity_id) — the distributed-join counterpart
    of ExactMatchMemoryNameIndex (kb.py:173-182).  Write it to parquet once
    per KB version (the KB-prep job, SURVEY.md §3.2)."""
    keys, ids_out = [], []
    for e in kb.to_pylist():
        for name in e["names"]:
            keys.append(f"{e['entity_type']}\x1f{name.lower()}")
            ids_out.append(e["entity_id"])
    return pa.table(
        {"block_key": pa.array(keys, pa.string()), "entity_id": pa.array(ids_out, pa.string())}
    )


def partitioned_exact_candidates(
    chains,
    kb_index,
    *,
    num_partitions: int = 16,
    hot_threshold: int | None = 1000,
    shards: int = 8,
    maximum: int = 25,
    probe_rows_hint: int | None = None,
    probe_cols: tuple[str, ...] = ("name",),
):
    """Exact-key blocking as a DISTRIBUTED hash join — the scale path when
    the KB index is too large to broadcast (SURVEY.md §4: index shipped as a
    table and joined, instead of resident per actor).

    chains: Dataset with (doc_id, chain_id, entity_type, name, ...).
    kb_index: Dataset of kb_exact_index_table rows.

    Probe side emits one narrow row per chain keyed by
    (entity_type, lower(name)); hot keys (Zipfian surface forms — country
    names) are salted via stages.joins.salted_inner_join so no single reducer
    receives a hot key's full volume.  Output: (doc_id, chain_id, entity_id)
    pair rows, deduped, capped at `maximum` per chain by ascending entity_id
    (deterministic; the broadcast path preserves KB order instead — callers
    needing byte-identical candidate ORDER should use the broadcast path).
    """
    import pandas as pd

    from .joins import salted_inner_join

    def probe_rows(t: pa.Table) -> pa.Table:
        pc_ = pa.compute
        parts = []
        for col in probe_cols:
            key = pc_.binary_join_element_wise(
                pc_.cast(t["entity_type"], pa.string()),
                pc_.utf8_lower(pc_.cast(t[col], pa.string())),
                "\x1f",
            )
            part = pa.table(
                {
                    "block_key": key,
                    "doc_id": t["doc_id"],
                    "chain_id": t["chain_id"],
                }
            )
            if col != "name":
                # secondary probes (translit/translate) only where non-empty
                part = part.filter(
                    pc_.not_equal(pc_.cast(t[col], pa.string()), ""))
            parts.append(part)
        return pa.concat_tables(parts) if len(parts) > 1 else parts[0]

    probe = chains.map_batches(probe_rows, batch_format="pyarrow")
    if hot_threshold is not None and (
        probe_rows_hint is None or probe_rows_hint > hot_threshold
    ):
        # the hot-key pre-pass will scan the probe side — sever it first so
        # probe_rows is computed ONCE (the pre-pass and the join both read
        # the severed blocks instead of re-deriving probes from chains), and
        # the exact row count replaces the caller's upper-bound hint
        from .joins import ds_from_refs, sever_refs

        p_refs, n_probe = sever_refs(probe)
        probe = ds_from_refs(p_refs)
        probe_rows_hint = n_probe
    joined = salted_inner_join(
        probe,
        kb_index,
        "block_key",
        num_partitions=num_partitions,
        hot_threshold=hot_threshold,
        shards=shards,
        left_rows_hint=probe_rows_hint,
    )

    # per-chain dedup + cap runs on HASH PARTITIONS of chains, not one Ray
    # group per chain: groupby((doc,chain)).map_groups creates one pandas
    # frame + python call per chain (~30k groups at sf0.1 — Ray's per-group
    # overhead dominated the round-4 bench at 167 s); a bounded number of
    # pkey groups each handles thousands of chains with C-speed pandas ops
    nparts = max(8, num_partitions * 2)

    def add_pkey(t: pa.Table) -> pa.Table:
        import numpy as np
        import pandas as pd

        key = pa.compute.binary_join_element_wise(
            pa.compute.cast(t["doc_id"], pa.string()),
            pa.compute.cast(t["chain_id"], pa.string()),
            "\x1f",
        )
        h = pd.util.hash_array(
            np.asarray(key.to_pandas(), dtype=object)) % np.uint64(nparts)
        return t.append_column("pkey", pa.array(h.astype("int64")))

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["doc_id", "chain_id", "entity_id"])
        g = g.sort_values(["doc_id", "chain_id", "entity_id"],
                          kind="mergesort")
        return g.groupby(["doc_id", "chain_id"], sort=False).head(maximum)[
            ["doc_id", "chain_id", "entity_id"]
        ]

    return joined.map_batches(add_pkey, batch_format="pyarrow").groupby(
        "pkey"
    ).map_groups(per_part, batch_format="pandas")


class CandidateGeneration:
    """Actor-pool stage: chains batch → candidates batch.

    config: ordered list of (finder, probe) names, e.g.
      [("exact", "name"), ("exact", "translit"), ("ngram", "name"),
       ("metaphone", "name"), ("lsh", "name")]
    mode: "combine" unions all generators (CombiningGenerator) |
          "cascade" stops once >= maximum collected (CascadeGenerator).
    """

    def __init__(
        self,
        index,  # NameIndexData | ray.ObjectRef | pa.Table
        config: list[tuple[str, str]] | None = None,
        mode: str = "combine",
        maximum: int = 25,
        conflate: TypeConflation | None = None,
    ):
        # materialize the broadcast index once per actor
        try:
            import ray

            if isinstance(index, ray.ObjectRef):
                index = ray.get(index)
        except ImportError:
            pass
        if isinstance(index, pa.Table):
            index = NameIndexData(index)
        self.index: NameIndexData = index
        self.config = config or [("exact", "name"), ("ngram", "name")]
        self.mode = mode
        self.maximum = maximum
        self.conflate = conflate
        self._cache: dict[tuple[str, str], list[tuple[str, int, str]]] = {}

    def _find(self, finder: str, name: str, etype: str) -> list[str]:
        fn = FINDERS[finder]
        if self.conflate:
            ids: list[str] = []
            for t in self.conflate.types_for(etype):
                ids.extend(fn(self.index, name, t, self.maximum))
            return _dedup(ids)
        return fn(self.index, name, etype, self.maximum)

    def _candidates_for(self, chain: dict) -> list[tuple[str, int, str]]:
        key = (chain["name"].lower(), chain["entity_type"])
        hit = self._cache.get(key)
        # the cache key ignores translit/translate (CachingGenerator keys by
        # name+type only, candidates.py:164-166) — acceptable because translit
        # probes are derived from the same chain strings in our synth worlds
        if hit is not None:
            return hit
        out: list[tuple[str, int, str]] = []
        seen: set[str] = set()
        rank = 0
        for finder, probe in self.config:
            name = PROBES[probe](chain)
            if not name:
                continue
            for eid in self._find(finder, name, chain["entity_type"]):
                if eid not in seen:
                    seen.add(eid)
                    out.append((eid, rank, f"{finder}:{probe}"))
                    rank += 1
            if self.mode == "cascade" and len(out) >= self.maximum:
                break
        self._cache[key] = out
        return out

    def add_candidates(self, chains: list[dict]) -> list[dict]:
        """In-place candidate assignment on python-dict chain rows (fused path)."""
        for c in chains:
            c["candidates"] = [
                {"entity_id": e, "rank": r, "source": s}
                for (e, r, s) in self._candidates_for(c)
            ]
        return chains

    def __call__(self, batch: pa.Table) -> pa.Table:
        chains = self.add_candidates(batch.to_pylist())
        if not chains:
            return CANDIDATES.empty_table()
        return pa.Table.from_pylist(chains, schema=CANDIDATES)
