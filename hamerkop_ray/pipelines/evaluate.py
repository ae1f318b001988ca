"""Evaluation: coref metrics (MUC, B³), pairwise cluster F1, scorer reports.

All scorer state in the reference is additive per-document sums
(coref.py:66-110), so every metric here is an exact parallel aggregate:
per-document partials → global sums.

The pairwise-F1 harness implements the BASELINE.json acceptance metric:
labeled mention pairs sampled *within the same blocking key* are compared for
cluster co-membership between a prediction and the reference/ground truth.
Blocking keys for pair sampling are MinHash LSH band keys of the mention
surface (plus entity type), which yields both positives and hard negatives
(similar-looking names of different entities).
"""

from __future__ import annotations

from collections import Counter, defaultdict

from ..functions.minhash import MinHasher

# ---------------------------------------------------------------------------
# MUC / B³ (reference coref.py:116-147 — published metric definitions:
# Vilain et al. 1995; Bagga & Baldwin 1998)
# ---------------------------------------------------------------------------


def muc(clusters: list[list[str]], mention_map: dict[str, object]) -> tuple[int, int]:
    """Returns (numerator, denominator) of MUC over one document
    (coref.py:116-129)."""
    tp = p = 0
    for c in clusters:
        p += len(c) - 1
        tp += len(c)
        linked = set()
        for m in c:
            if m in mention_map:
                linked.add(mention_map[m])
            else:
                tp -= 1
        tp -= len(linked)
    return tp, p


def b3(clusters: list[list[str]], mention_map: dict[str, object]) -> tuple[float, int]:
    """Returns (numerator, denominator) of B³ over one document
    (coref.py:131-147) — reference semantics preserved exactly, including
    skipping singleton clusters and 'len(cluster_id) != 1' quirk."""
    num = 0.0
    dem = 0
    for c in clusters:
        if len(c) == 1:
            continue
        gt_counts: Counter = Counter()
        correct = 0
        for m in c:
            if m in mention_map:
                gt_counts[mention_map[m]] += 1
        for c2, count in gt_counts.items():
            if len(c2) != 1:
                correct += count * count
        num += correct / len(c)
        dem += len(c)
    return num, dem


class AdditiveScorer:
    """CorefScorer analog (coref.py:51-114): accumulate per-doc partials of a
    metric in both directions; P/R/F1 from the sums.  Partials are additive,
    so shards can be scored independently and merged with ``merge``."""

    def __init__(self, metric=b3):
        self.metric = metric
        self.p_num = 0.0
        self.p_den = 0
        self.r_num = 0.0
        self.r_den = 0

    def update(self, predicted_clusters, gt_clusters):
        gt_map = _mention_map(gt_clusters)
        pred_map = _mention_map(predicted_clusters)
        pn, pd = self.metric(predicted_clusters, gt_map)
        rn, rd = self.metric(gt_clusters, pred_map)
        self.p_num += pn
        self.p_den += pd
        self.r_num += rn
        self.r_den += rd

    def merge(self, other: "AdditiveScorer"):
        self.p_num += other.p_num
        self.p_den += other.p_den
        self.r_num += other.r_num
        self.r_den += other.r_den

    @property
    def precision(self):
        return self.p_num / self.p_den if self.p_num else 0

    @property
    def recall(self):
        return self.r_num / self.r_den if self.r_num else 0

    @property
    def f1(self):
        p, r = self.precision, self.recall
        return 2 * p * r / (p + r) if (p + r) else 0


def _mention_map(clusters) -> dict[str, str]:
    out = {}
    for i, c in enumerate(clusters):
        cid = f"C{i + 1}"
        for m in c:
            out[m] = cid
    return out


def score_coref_distributed(chains_ds, gt_clusters_by_doc: dict, metric=b3):
    """Distributed CorefScorer: per-document metric partials computed inside
    map_batches (chains rows are per-doc complete), summed globally — exact
    because all scorer state is additive (coref.py:84-110 / SURVEY §2.5).

    chains_ds: Dataset of CHAINS rows.
    gt_clusters_by_doc: {doc_id: [[mention_id,...], ...]} ground truth.
    Returns an AdditiveScorer holding the global sums.
    """
    import pyarrow as pa

    def partials(t: pa.Table) -> pa.Table:
        by_doc: dict[str, list[list[str]]] = {}
        for r in t.to_pylist():
            by_doc.setdefault(r["doc_id"], []).append(
                [m["mention_id"] for m in r["mentions"]]
            )
        s = AdditiveScorer(metric=metric)
        for doc_id, pred in by_doc.items():
            gt = gt_clusters_by_doc.get(doc_id)
            if gt:
                s.update(pred, gt)
        return pa.table(
            {
                "p_num": pa.array([float(s.p_num)]),
                "p_den": pa.array([float(s.p_den)]),
                "r_num": pa.array([float(s.r_num)]),
                "r_den": pa.array([float(s.r_den)]),
            }
        )

    total = AdditiveScorer(metric=metric)
    for batch in chains_ds.map_batches(partials, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for r in batch.to_pylist():
            total.p_num += r["p_num"]
            total.p_den += r["p_den"]
            total.r_num += r["r_num"]
            total.r_den += r["r_den"]
    return total


def gt_clusters_from_links(links_rows: list[dict]) -> dict[str, list[list[str]]]:
    """GT links table → per-doc clusters of mention ids, keyed by kb_id /
    NIL cluster id (OutputReader→CorefScorer prep, coref.py:149-172)."""
    by_doc: dict[str, dict[str, list[str]]] = {}
    for r in links_rows:
        by_doc.setdefault(r["doc_id"], {}).setdefault(r["kb_id"], []).append(
            r["mention_id"]
        )
    return {d: list(clusters.values()) for d, clusters in by_doc.items()}


# ---------------------------------------------------------------------------
# pairwise cluster F1 at shared blocking keys (BASELINE.json metric)
# ---------------------------------------------------------------------------


def blocking_pairs(
    mention_surfaces: dict[str, str],
    mention_types: dict[str, str],
    *,
    bands: int = 16,
    max_bucket: int = 200,
) -> set[tuple[str, str]]:
    """All mention pairs sharing (entity_type, LSH band key of surface).
    Buckets larger than max_bucket are truncated deterministically (sorted
    ids) to bound the quadratic blow-up; dropped member counts go to the
    'blocking_pairs_members_dropped' counter (state.metrics)."""
    hasher = MinHasher(num_perm=64, seed=1)
    buckets: dict[tuple[str, str], list[str]] = defaultdict(list)
    sig_cache: dict[str, list[str]] = {}
    for mid, surface in mention_surfaces.items():
        keys = sig_cache.get(surface)
        if keys is None:
            keys = hasher.band_keys(surface, bands)
            sig_cache[surface] = keys
        et = mention_types.get(mid, "")
        for k in keys:
            buckets[(et, k)].append(mid)
    pairs: set[tuple[str, str]] = set()
    for members in buckets.values():
        uniq = sorted(set(members))
        if len(uniq) > max_bucket:
            from ..state import metrics

            metrics.incr("blocking_pairs_members_dropped", len(uniq) - max_bucket)
        members = uniq[:max_bucket]
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                pairs.add((members[i], members[j]))
    return pairs


def pairwise_f1(
    pred_assign: dict[str, str],
    gold_assign: dict[str, str],
    pairs: set[tuple[str, str]],
) -> dict:
    """P/R/F1 of cluster co-membership over the labeled pairs."""
    tp = fp = fn = tn = 0
    for a, b in pairs:
        if a not in pred_assign or b not in pred_assign:
            continue
        if a not in gold_assign or b not in gold_assign:
            continue
        same_pred = pred_assign[a] == pred_assign[b]
        same_gold = gold_assign[a] == gold_assign[b]
        if same_pred and same_gold:
            tp += 1
        elif same_pred:
            fp += 1
        elif same_gold:
            fn += 1
        else:
            tn += 1
    p = tp / (tp + fp) if tp + fp else 1.0
    r = tp / (tp + fn) if tp + fn else 1.0
    f1 = 2 * p * r / (p + r) if (p + r) else 0.0
    return {"precision": p, "recall": r, "f1": f1, "tp": tp, "fp": fp, "fn": fn, "tn": tn,
            "n_pairs": tp + fp + fn + tn}


def gold_assignment_from_links(links_rows: list[dict]) -> dict[str, str]:
    """Ground-truth cluster per mention: the kb_id link set, or the NIL
    cluster id (FIXTURES.md §4 labeled-pair derivation)."""
    return {r["mention_id"]: r["kb_id"] for r in links_rows}


def candidate_recall(
    cands_rows: list[dict], gt: dict[str, str], *, max_examples: int = 20
) -> dict:
    """CandidatesScorer analog (candidates.py:15-75): fraction of linked
    chains whose GT entity appears among candidates, by type.

    Mirrors CandidatesReport's full shape: per-type recall AND the missed
    mentions (`missing`: type → [(chain name, miss count), …] like
    candidates.py:20-27's `missing` Counter — the examples a user needs to
    debug recall), plus per-type GT counts."""
    total: Counter = Counter()
    found: Counter = Counter()
    missing: dict[str, Counter] = defaultdict(Counter)
    for c in cands_rows:
        gts = {gt[m["mention_id"]] for m in c["mentions"] if m["mention_id"] in gt}
        linked = {g for g in gts if not g.startswith("NIL")}
        if not linked:
            continue
        et = c["entity_type"]
        total[et] += 1
        if linked & {x["entity_id"] for x in c["candidates"]}:
            found[et] += 1
        else:
            missing[et][c["name"]] += 1
    out = {et: found[et] / total[et] for et in total}
    out["ALL"] = sum(found.values()) / sum(total.values()) if total else 1.0
    out["counts"] = {et: total[et] for et in total}
    out["missing"] = {
        et: missing[et].most_common(max_examples) for et in missing
    }
    return out


def resolution_report(
    resolved_rows: list[dict], gt: dict[str, str], *, max_examples: int = 20
) -> dict:
    """ResolverScorer analog (resolver.py:18-137): micro P/R/F1 of entity
    selection over linked chains + false-alarm count on NIL chains.

    Mirrors ResolverReport's full shape: per-type P/R/F1 ("by_type", like
    get_stats_by_type, resolver.py:71-92) and the error EXAMPLES a user
    debugs with — wrong-entity chain names per type (`wrong_entity`,
    resolver.py:31) and NIL-chain false-alarm names per type
    (`type_1_errors`, resolver.py:32)."""

    def _prf(tp, fp, fn):
        p = tp / (tp + fp) if tp + fp else 1.0
        r = tp / (tp + fn) if tp + fn else 1.0
        f1 = 2 * p * r / (p + r) if p + r else 0.0
        return p, r, f1

    tp_t: Counter = Counter()
    fp_t: Counter = Counter()
    fn_t: Counter = Counter()
    fa_t: Counter = Counter()
    wrong_entity: dict[str, Counter] = defaultdict(Counter)
    type_1_errors: dict[str, Counter] = defaultdict(Counter)
    for c in resolved_rows:
        gts = {gt[m["mention_id"]] for m in c["mentions"] if m["mention_id"] in gt}
        linked = {g for g in gts if not g.startswith("NIL")}
        et = c["entity_type"]
        if linked:
            if c["entity_id"] in linked:
                tp_t[et] += 1
            elif c["entity_id"]:
                fp_t[et] += 1
                fn_t[et] += 1
                wrong_entity[et][c["name"]] += 1
            else:
                fn_t[et] += 1
        elif c["entity_id"]:
            fa_t[et] += 1
            type_1_errors[et][c["name"]] += 1
    tp, fp, fn = sum(tp_t.values()), sum(fp_t.values()), sum(fn_t.values())
    p, r, f1 = _prf(tp, fp, fn)
    by_type = {}
    for et in sorted(set(tp_t) | set(fp_t) | set(fn_t) | set(fa_t)):
        tp_e, fp_e, fn_e = tp_t[et], fp_t[et], fn_t[et]
        p_e, r_e, f1_e = _prf(tp_e, fp_e, fn_e)
        by_type[et] = {
            "precision": p_e, "recall": r_e, "f1": f1_e,
            "n_linked": tp_e + fn_e, "false_alarms": fa_t[et],
        }
    return {
        "precision": p, "recall": r, "f1": f1,
        "false_alarms": sum(fa_t.values()),
        "by_type": by_type,
        "wrong_entity": {
            et: wrong_entity[et].most_common(max_examples) for et in wrong_entity
        },
        "type_1_errors": {
            et: type_1_errors[et].most_common(max_examples) for et in type_1_errors
        },
    }
