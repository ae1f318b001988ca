"""Stage 5 — pairwise scoring + resolution: candidates → resolved chains.

Reference semantics (resolver.py:140-343): a cascade of resolvers runs per
chain; each may select the linked entity, prune the candidate list for later
resolvers, or pass.  Unresolved chains are NIL.

Dataflow shape: the candidates table is per-row complete (chain + its
candidate ids), so resolution is one actor-pool map_batches — the actor holds
the KB dict (broadcast once via ray.put, materialized per actor in __init__)
and, where configured, model weights.  Edit distances for the WHOLE batch are
computed in one vectorized call (functions.editdist) instead of the
reference's per-pair Python loop.

Pairwise features (features.py:58-204) are computed per (chain, candidate)
and exposed both to the rule resolvers and to the linear scorer
(SvmResolver analog — sklearn isn't vendored here, so the trained model is a
plain weight vector; decision_function = w·x + b, same argmax/all-negative
semantics, resolver.py:333-343).
"""

from __future__ import annotations

import urllib.parse

import numpy as np
import pyarrow as pa

from ..functions.editdist import jaro_winkler_batch, normalized_levenshtein_batch
from ..schemas import CANDIDATES, CHAINS

RESOLVED_CHAINS = CHAINS.append(pa.field("entity_id", pa.string())) \
                        .append(pa.field("score", pa.float64())) \
                        .append(pa.field("method", pa.string()))


def wikipedia_link(name: str) -> str:
    """resolver.py:299-303."""
    s = name.replace(" ", "_").replace("’", "'")
    return "http://en.wikipedia.org/wiki/" + urllib.parse.quote(s)


# ---------------------------------------------------------------------------
# pairwise features (features.py:69-204) — plain floats per (chain, entity)
# ---------------------------------------------------------------------------


def feature_vector(chain: dict, entity: dict, lev_norm: float) -> np.ndarray:
    """Ordered features; lev_norm precomputed by the batched kernel."""
    names_ci = {n.lower() for n in chain["all_strings"]}
    ent_names_ci = {n.lower() for n in entity["names"]}
    chain_name = chain["name"]

    # OriginFeature (features.py:69-82): 1 for GEO/AUG, 0 for APB/WLL
    origin = entity.get("origin", "")
    f_origin = 1.0 if (origin == "GEO" or origin.startswith("AUG")) else 0.0
    # NumberOfNamesFeature (features.py:110-116)
    f_nnames = 1.0 - 1.0 / (1 + len(entity["names"]))
    # NumberOfLinksFeature (features.py:119-125)
    f_nlinks = 1.0 - 1.0 / (1 + len(entity.get("urls", [])))
    # ExactMatchFeature (features.py:144-153)
    f_exact = 1.0 if names_ci & ent_names_ci else 0.0
    # WikipediaFeature (features.py:128-141)
    links = {wikipedia_link(s).lower() for s in chain["names"]}
    f_wiki = 1.0 if links & {u.lower() for u in entity.get("urls", [])} else 0.0
    # SharedTokensFeature (features.py:156-171): max over entity names of
    # |shared tokens| / |chain-name tokens|
    ctoks = set(chain_name.lower().split())
    f_shared = 0.0
    if ctoks:
        for n in entity["names"]:
            ntoks = set(n.lower().split())
            f_shared = max(f_shared, len(ctoks & ntoks) / len(ctoks))
    # LastNameFeature (features.py:174-188): multi-token names share last token
    f_last = 0.0
    cn = chain_name.lower().split()
    for n in entity["names"]:
        en = n.lower().split()
        if len(cn) > 1 and len(en) > 1 and cn[-1] == en[-1]:
            f_last = 1.0
            break
    # LevenshteinFeature (features.py:191-204): min normalized edit distance
    return np.array(
        [f_origin, f_nnames, f_nlinks, f_exact, f_wiki, f_shared, f_last, lev_norm]
    )


FEATURE_NAMES = [
    "origin", "n_names", "n_links", "exact", "wiki", "shared_tokens",
    "last_name", "lev_norm",
]


# ---------------------------------------------------------------------------
# resolvers — each: (chain, cands: list[dict], ctx) -> (entity|None, cands)
# ctx carries precomputed per-(chain,candidate) values keyed by entity_id
# ---------------------------------------------------------------------------


class ExactNameResolver:
    """CI name-set intersection (resolver.py:253-272): exactly one match →
    select; several → prune candidates to the matches; none → pass.
    Uses chain.names (norm strings only, not translit/translate)."""

    name = "exact"

    def __call__(self, chain, cands, ctx):
        names = {n.lower() for n in chain["names"]}
        matches = [e for e in cands if names & {n.lower() for n in e["names"]}]
        if len(matches) == 1:
            return matches[0], cands
        if matches:
            return None, matches
        return None, cands


class WikipediaResolver:
    """Wiki-url intersection (resolver.py:275-303); same 1/many/0 logic."""

    name = "wiki"

    def __call__(self, chain, cands, ctx):
        links = {wikipedia_link(s).lower() for s in chain["names"]}
        matches = [
            e for e in cands if links & {u.lower() for u in e.get("urls", [])}
        ]
        if len(matches) == 1:
            return matches[0], cands
        if matches:
            return None, matches
        return None, cands


class EditDistanceResolver:
    """Min normalized Levenshtein over chain strings × entity names; select
    the best candidate when distance < threshold (resolver.py:306-322)."""

    name = "editdist"

    def __init__(self, threshold: float = 0.1):
        self.threshold = threshold

    def __call__(self, chain, cands, ctx):
        lev = ctx["lev"]
        best, best_d = None, float("inf")
        for e in cands:
            d = lev.get(e["entity_id"], float("inf"))
            if d < best_d:
                best_d = d
                best = e
        if best is not None and best_d < self.threshold:
            return best, cands
        return None, cands


class JaroWinklerResolver:
    """Scale-path analog of EditDistanceResolver using Jaro-Winkler
    similarity (north_star's batched JW scorer; no reference counterpart)."""

    name = "jaro_winkler"

    def __init__(self, threshold: float = 0.94):
        self.threshold = threshold

    def __call__(self, chain, cands, ctx):
        jw = ctx["jw"]
        best, best_s = None, -1.0
        for e in cands:
            s = jw.get(e["entity_id"], -1.0)
            if s > best_s:
                best_s = s
                best = e
        if best is not None and best_s >= self.threshold:
            return best, cands
        return None, cands


class FirstResolver:
    """Pick candidates[0] (resolver.py:245-250) — candidate order is the
    generation rank carried from blocking."""

    name = "first"

    def __call__(self, chain, cands, ctx):
        return (cands[0], cands) if cands else (None, cands)


class LinearResolver:
    """SvmResolver analog (resolver.py:325-343): score = w·features + b per
    candidate; if all scores < 0 pass, else argmax."""

    name = "linear"

    def __init__(self, weights, bias: float = 0.0):
        self.w = np.asarray(weights, dtype=np.float64)
        self.b = float(bias)

    def __call__(self, chain, cands, ctx):
        if not cands:
            return None, cands
        feats = ctx["features"]
        scores = np.array(
            [float(self.w @ feats[e["entity_id"]] + self.b) for e in cands]
        )
        if (scores < 0).all():
            return None, cands
        return cands[int(np.argmax(scores))], cands


def in_country_feature(entity: dict, countries: set[str]) -> float:
    """InCountryFeature (features.py:85-107, unexported/untested in the
    reference): 1 when the entity's country is in the configured set."""
    return 1.0 if entity.get("country", "") in countries else 0.0


class HashNameEncoder:
    """Deterministic character-ngram hashing encoder: name → unit vector.

    Stand-in for a neural name encoder (none is vendored in this container).
    Near-identical strings share most ngrams → high cosine; the interface
    (encode_batch) and placement (actor __init__, batched calls) are exactly
    what a model-backed encoder needs, so swapping in a real model is a
    one-class change.
    """

    def __init__(self, dim: int = 64, ngram: int = 3):
        self.dim = dim
        self.ngram = ngram

    def encode_batch(self, names: list[str]) -> np.ndarray:
        from ..functions.strings import shingles
        from ..ids import stable_hash64

        out = np.zeros((len(names), self.dim), dtype=np.float64)
        for i, name in enumerate(names):
            for g in shingles(name, self.ngram):
                h = stable_hash64(g)
                out[i, h % self.dim] += 1.0 if (h >> 32) % 2 else -1.0
            n = np.linalg.norm(out[i])
            if n:
                out[i] /= n
        return out


class EmbeddingResolver:
    """Embedding-cosine scorer (north_star addition; no reference
    counterpart — SURVEY.md §2.11): encode the chain's best name and every
    candidate's names, select the candidate with max cosine ≥ threshold.

    The encoder is actor state — EntityResolution holds this resolver, and
    each pool actor builds the encoder once in __init__."""

    name = "embedding"

    def __init__(self, threshold: float = 0.7, encoder=None):
        self.threshold = threshold
        self.encoder = encoder or HashNameEncoder()

    def __call__(self, chain, cands, ctx):
        if not cands:
            return None, cands
        qv = self.encoder.encode_batch([chain["name"]])[0]
        best, best_s = None, -1.0
        for e in cands:
            evs = self.encoder.encode_batch(list(e["names"]))
            s = float(evs @ qv.T if evs.ndim == 1 else (evs @ qv).max())
            if s > best_s:
                best_s = s
                best = e
        if best is not None and best_s >= self.threshold:
            return best, cands
        return None, cands


class TypeSpecificResolver:
    """Gate on chain entity type (resolver.py:229-242)."""

    def __init__(self, inner, *types):
        self.inner = inner
        self.types = set(types)
        self.name = inner.name

    def __call__(self, chain, cands, ctx):
        if chain["entity_type"] in self.types:
            return self.inner(chain, cands, ctx)
        return None, cands


class LanguageSpecificResolver:
    """Gate on document language (resolver.py:216-226)."""

    def __init__(self, inner, *langs):
        self.inner = inner
        self.langs = set(langs)
        self.name = inner.name

    def __call__(self, chain, cands, ctx):
        if chain["lang"] in self.langs:
            return self.inner(chain, cands, ctx)
        return None, cands


def default_cascade() -> list:
    return [ExactNameResolver(), WikipediaResolver(), EditDistanceResolver(0.1)]


class FeatureRecorder:
    """Training-data dump (resolver.py:157-189, spec-by-intent — the
    reference has latent bugs there, SURVEY.md §2.7): one row per
    (chain, candidate) with the feature vector and a binary label from
    ground truth.  Run as map_batches over the candidates table with the GT
    link map broadcast; write the output with Dataset.write_parquet."""

    def __init__(self, kb, gt_ref):
        try:
            import ray

            if isinstance(kb, ray.ObjectRef):
                kb = ray.get(kb)
            if isinstance(gt_ref, ray.ObjectRef):
                gt_ref = ray.get(gt_ref)
        except ImportError:
            pass
        if isinstance(kb, pa.Table):
            kb = {e["entity_id"]: e for e in kb.to_pylist()}
        self.kb = kb
        self.gt: dict[str, str] = gt_ref  # mention_id -> kb_id

    def __call__(self, batch: pa.Table) -> pa.Table:
        res = EntityResolution(self.kb, resolvers=[])
        rows = batch.to_pylist()
        lev_min, _ = res._batch_distances(rows)
        out = {
            "doc_id": [], "chain_id": [], "entity_id": [], "label": [],
            **{f"f_{n}": [] for n in FEATURE_NAMES},
        }
        for ci, row in enumerate(rows):
            gts = {
                self.gt[m["mention_id"]]
                for m in row["mentions"]
                if m["mention_id"] in self.gt
            }
            linked = {g for g in gts if "NIL" not in g}
            if not gts:
                continue  # no ground truth for this chain (resolver.py:171)
            for cand in row["candidates"]:
                e = self.kb.get(cand["entity_id"])
                if e is None:
                    continue
                fv = feature_vector(row, e, lev_min[ci].get(e["entity_id"], 1.0))
                out["doc_id"].append(row["doc_id"])
                out["chain_id"].append(row["chain_id"])
                out["entity_id"].append(e["entity_id"])
                out["label"].append(int(e["entity_id"] in linked))
                for n, v in zip(FEATURE_NAMES, fv):
                    out[f"f_{n}"].append(float(v))
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"], pa.string()),
                "chain_id": pa.array(out["chain_id"], pa.string()),
                "entity_id": pa.array(out["entity_id"], pa.string()),
                "label": pa.array(out["label"], pa.int32()),
                **{
                    f"f_{n}": pa.array(out[f"f_{n}"], pa.float64())
                    for n in FEATURE_NAMES
                },
            }
        )


# ---------------------------------------------------------------------------
# the stage
# ---------------------------------------------------------------------------


class EntityResolution:
    """Actor-pool stage: candidates batch → resolved batch.

    __init__ materializes the broadcast KB dict once per actor; __call__
    computes batch-level vectorized distances, then runs the per-chain
    cascade (CascadeResolver semantics, resolver.py:192-213: resolved chains
    drop out; candidate pruning carries forward between resolvers).
    """

    def __init__(self, kb, resolvers: list | None = None, need_jw: bool = False):
        try:
            import ray

            if isinstance(kb, ray.ObjectRef):
                kb = ray.get(kb)
        except ImportError:
            pass
        if isinstance(kb, pa.Table):
            kb = {e["entity_id"]: e for e in kb.to_pylist()}
        self.kb: dict[str, dict] = kb
        self.resolvers = resolvers if resolvers is not None else default_cascade()
        self.need_features = any(isinstance(r, LinearResolver) or
                                 isinstance(getattr(r, "inner", None), LinearResolver)
                                 for r in self.resolvers)
        self.need_jw = need_jw or any(
            isinstance(r, JaroWinklerResolver)
            or isinstance(getattr(r, "inner", None), JaroWinklerResolver)
            for r in self.resolvers
        )

    def _batch_distances(self, rows: list[dict]):
        """One vectorized kernel call for every (chain-string, entity-name)
        pair in the batch; reduced to per-(chain, candidate) minima."""
        a: list[str] = []
        b: list[str] = []
        owner: list[tuple[int, str]] = []
        for ci, row in enumerate(rows):
            strings = {s.lower() for s in row["all_strings"]}
            for cand in row["candidates"]:
                e = self.kb.get(cand["entity_id"])
                if e is None:
                    continue
                for x in strings:
                    for y in {n.lower() for n in e["names"]}:
                        a.append(x)
                        b.append(y)
                        owner.append((ci, e["entity_id"]))
        lev = normalized_levenshtein_batch(a, b) if a else np.zeros(0)
        jw = jaro_winkler_batch(a, b) if (a and self.need_jw) else None
        lev_min: list[dict[str, float]] = [dict() for _ in rows]
        jw_max: list[dict[str, float]] = [dict() for _ in rows]
        for k, (ci, eid) in enumerate(owner):
            d = float(lev[k])
            cur = lev_min[ci].get(eid)
            if cur is None or d < cur:
                lev_min[ci][eid] = d
            if jw is not None:
                s = float(jw[k])
                curj = jw_max[ci].get(eid)
                if curj is None or s > curj:
                    jw_max[ci][eid] = s
        return lev_min, jw_max

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = self.resolve_rows(batch.to_pylist())
        if not out:
            return RESOLVED_CHAINS.empty_table()
        return pa.Table.from_pylist(out, schema=RESOLVED_CHAINS)

    # resolvers whose decisions read batch-computed distances/features
    _NEEDS_DISTANCES = ("editdist", "jaro_winkler", "linear")

    def _needs_distances(self, resolver) -> bool:
        name = getattr(resolver, "name", "")
        return name in self._NEEDS_DISTANCES

    def resolve_rows(self, rows: list[dict]) -> list[dict]:
        """Python-dict form (fused path): chain rows with 'candidates' →
        resolved chain rows.

        Two-phase cascade: set-based resolvers (exact/wiki — no distances)
        run first; ONLY chains still unresolved when the cascade reaches a
        distance-needing resolver enter the batched distance kernel, over
        their surviving (possibly pruned) candidates.  Most linked chains
        resolve exactly, so the expensive pairwise kernel sees a fraction of
        the batch.  Cascade order/semantics are unchanged (exact/wiki never
        read ctx distances)."""
        out: list[dict | None] = [None] * len(rows)
        pending: list[tuple[int, int, list[dict]]] = []  # (row_idx, stage_idx, cands)

        def finish(ci: int, row: dict, entity: str, method: str, lev_for_row: dict):
            rec = {k: row[k] for k in CHAINS.names}
            rec["entity_id"] = entity
            rec["score"] = 1.0 - lev_for_row.get(entity, 0.0) if entity else 0.0
            rec["method"] = method
            out[ci] = rec

        empty_ctx = {"lev": {}, "jw": {}}
        for ci, row in enumerate(rows):
            cands = [
                self.kb[c["entity_id"]]
                for c in row["candidates"]
                if c["entity_id"] in self.kb
            ]
            resolved_here = False
            for si, resolver in enumerate(self.resolvers):
                if self._needs_distances(resolver):
                    pending.append((ci, si, cands))
                    resolved_here = True  # deferred to phase 2
                    break
                picked, cands = resolver(row, cands, empty_ctx)
                if picked is not None:
                    finish(ci, row, picked["entity_id"], resolver.name, {})
                    resolved_here = True
                    break
            if not resolved_here:
                finish(ci, row, "", "", {})

        if pending:
            sub_rows = [rows[ci] for ci, _, _ in pending]
            sub_for_dist = [
                {**rows[ci], "candidates": [
                    {"entity_id": e["entity_id"]} for e in cands
                ]}
                for ci, _, cands in pending
            ]
            lev_min, jw_max = self._batch_distances(sub_for_dist)
            for pi, (ci, si, cands) in enumerate(pending):
                row = rows[ci]
                ctx = {"lev": lev_min[pi], "jw": jw_max[pi]}
                if self.need_features:
                    ctx["features"] = {
                        e["entity_id"]: feature_vector(
                            row, e, lev_min[pi].get(e["entity_id"], 1.0)
                        )
                        for e in cands
                    }
                entity, method = "", ""
                for resolver in self.resolvers[si:]:
                    picked, cands = resolver(row, cands, ctx)
                    if picked is not None:
                        entity = picked["entity_id"]
                        method = resolver.name
                        break
                finish(ci, row, entity, method, ctx["lev"])
        return [r for r in out if r is not None]
