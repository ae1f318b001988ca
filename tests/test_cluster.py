"""Connected components via min-label propagation vs a union-find oracle."""

import pytest

from hamerkop_ray.ids import stable_hash64


def uf_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb

    for s, d in edges:
        union(s, d)
    comp = {}
    for n in parent:
        comp.setdefault(find(n), set()).add(n)
    return {frozenset(v) for v in comp.values()}


def make_edges(n_nodes=200, n_edges=300, seed=5):
    edges = []
    for i in range(n_edges):
        a = stable_hash64(f"{seed}:e{i}:a") % n_nodes
        b = stable_hash64(f"{seed}:e{i}:b") % n_nodes
        edges.append((f"n{a:04d}", f"n{b:04d}"))
    return edges


@pytest.mark.usefixtures("ray_session")
def test_connected_components_matches_union_find():
    import ray.data as rd

    from hamerkop_ray.stages.cluster import connected_components

    edges = make_edges()
    ds = rd.from_items([{"src": s, "dst": d} for s, d in edges])
    # force the DISTRIBUTED star-contraction path (driver_threshold=0)
    labels = {r["node"]: r["label"] for b in
              connected_components(ds, driver_threshold=0).iter_batches(batch_format="pyarrow")
              for r in b.to_pylist()}

    expected = uf_components(edges)
    got = {}
    for node, label in labels.items():
        got.setdefault(label, set()).add(node)
    assert {frozenset(v) for v in got.values()} == expected
    # deterministic label choice: min node id of the component
    for label, nodes in got.items():
        assert label == min(nodes)


@pytest.mark.usefixtures("ray_session")
def test_connected_components_chain_graph():
    """A long path graph needs several propagation rounds (diameter)."""
    import ray.data as rd

    from hamerkop_ray.stages.cluster import connected_components

    edges = [(f"p{i:03d}", f"p{i+1:03d}") for i in range(40)]
    ds = rd.from_items([{"src": s, "dst": d} for s, d in edges])
    labels = {r["node"]: r["label"] for b in
              connected_components(ds, driver_threshold=0).iter_batches(batch_format="pyarrow")
              for r in b.to_pylist()}
    assert set(labels.values()) == {"p000"}
    assert len(labels) == 41


@pytest.mark.usefixtures("ray_session")
def test_driver_fast_path_matches_distributed():
    import ray.data as rd

    from hamerkop_ray.stages.cluster import connected_components

    edges = make_edges(n_nodes=80, n_edges=120, seed=8)
    ds = rd.from_items([{"src": s, "dst": d} for s, d in edges])
    fast = {r["node"]: r["label"] for b in
            connected_components(ds).iter_batches(batch_format="pyarrow")
            for r in b.to_pylist()}
    dist = {r["node"]: r["label"] for b in
            connected_components(ds, driver_threshold=0).iter_batches(batch_format="pyarrow")
            for r in b.to_pylist()}
    assert fast == dist


@pytest.mark.usefixtures("ray_session")
def test_flagship_aggregate_closure_equals_generic_cc():
    """The flagship's one-aggregate closure must equal the generic operator
    on its bipartite-star match graph."""
    import ray.data as rd

    from hamerkop_ray.pipelines.flagship import run_flagship
    from hamerkop_ray.stages.cluster import connected_components
    from hamerkop_ray.synth import synth_world

    docs, kb, links = synth_world(n_docs=40, n_entities=60, seed=13)
    out = run_flagship(rd.from_arrow(docs), kb)
    rows = [r for b in out["chains"].iter_batches(batch_format="pyarrow")
            for r in b.to_pylist()]
    edges = rd.from_items(
        [{"src": f"{r['doc_id']}\x1f{r['chain_id']}",
          "dst": f"E\x1f{r['entity_id']}"}
         for r in rows if r["entity_id"]]
    )
    labels = {l["node"]: l["label"]
              for b in connected_components(edges).iter_batches(batch_format="pyarrow")
              for l in b.to_pylist()}
    for r in rows:
        if r["entity_id"]:
            assert r["cluster_id"] == labels[f"E\x1f{r['entity_id']}"]
        else:
            assert r["cluster_id"] == f"{r['doc_id']}\x1f{r['chain_id']}"
