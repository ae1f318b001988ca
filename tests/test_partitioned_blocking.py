"""Partitioned (distributed-join) blocking vs broadcast-index blocking."""

import pytest

from hamerkop_ray.stages.blocking import (
    NameIndexData,
    exact_find,
    kb_exact_index_table,
    partitioned_exact_candidates,
)
from hamerkop_ray.stages.chains import Stage1Chains


@pytest.fixture(scope="module")
def world():
    from hamerkop_ray.synth import synth_world

    docs, kb, links = synth_world(n_docs=60, n_entities=80, seed=17)
    chains = Stage1Chains()(docs)
    return docs, kb, chains


def test_kb_exact_index_table(world):
    docs, kb, chains = world
    idx = kb_exact_index_table(kb)
    assert idx.num_rows >= kb.num_rows  # one row per name, names ⊇ canonical
    keys = idx["block_key"].to_pylist()
    assert all("\x1f" in k and k.split("\x1f")[1] == k.split("\x1f")[1].lower() for k in keys)


@pytest.mark.usefixtures("ray_session")
def test_partitioned_matches_broadcast(world):
    import ray.data as rd

    docs, kb, chains = world
    index = NameIndexData(kb, build=("exact",))
    # broadcast-path exact candidates, as sets per chain
    expected = {}
    for c in chains.to_pylist():
        ids = set(exact_find(index, c["name"], c["entity_type"]))
        if ids:
            expected[(c["doc_id"], c["chain_id"])] = ids

    pairs = partitioned_exact_candidates(
        rd.from_arrow(chains.select(["doc_id", "chain_id", "entity_type", "name"])),
        rd.from_arrow(kb_exact_index_table(kb)),
        num_partitions=4,
        hot_threshold=None,
    )
    got: dict = {}
    for b in pairs.iter_batches(batch_format="pyarrow"):
        for r in b.to_pylist():
            got.setdefault((r["doc_id"], r["chain_id"]), set()).add(r["entity_id"])
    assert got == expected


@pytest.mark.usefixtures("ray_session")
def test_partitioned_with_salting_matches(world):
    """Hot-key salting (threshold low enough to trigger on the Zipf-head
    country names) must not change results."""
    import ray.data as rd

    docs, kb, chains = world
    plain = partitioned_exact_candidates(
        rd.from_arrow(chains.select(["doc_id", "chain_id", "entity_type", "name"])),
        rd.from_arrow(kb_exact_index_table(kb)),
        num_partitions=4,
        hot_threshold=None,
    )
    salted = partitioned_exact_candidates(
        rd.from_arrow(chains.select(["doc_id", "chain_id", "entity_type", "name"])),
        rd.from_arrow(kb_exact_index_table(kb)),
        num_partitions=4,
        hot_threshold=5,
        shards=4,
    )

    def collect(ds):
        out = set()
        for b in ds.iter_batches(batch_format="pyarrow"):
            for r in b.to_pylist():
                out.add((r["doc_id"], r["chain_id"], r["entity_id"]))
        return out

    assert collect(plain) == collect(salted)
