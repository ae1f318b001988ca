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
