"""Distributed connected-components benchmark (VERDICT r4 #2 done-criterion).

Builds a synthetic >2M-edge graph (many small components + several large
chain/star components — the shapes that stress the star-contraction rounds),
forces the DISTRIBUTED path (driver_threshold=0), and times the rounds.
Before the round-5 pkey rework this shape paid Ray's per-group overhead once
per graph NODE per round (the 167 s/30k-group trap); now each star round is
one groupby(pkey) shuffle with a vectorized sorted-run kernel per partition.

Also cross-checks label correctness against the driver-side union-find on
the same edges.

Usage: python tools/cc_bench.py [n_edges] [num_cpus]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


def make_edges(n_edges: int):
    """Deterministic mixed-topology graph: 60% pair/small components, 30%
    medium stars (fan 100), 10% long chains (length 1000)."""
    import numpy as np

    rng = np.random.default_rng(7)
    n_pair = int(n_edges * 0.6)
    src = [f"p{i}a" for i in range(n_pair)]
    dst = [f"p{i}b" for i in range(n_pair)]

    n_star = int(n_edges * 0.3)
    hubs = n_star // 100
    for h in range(hubs):
        src.extend([f"s{h}hub"] * 100)
        dst.extend(f"s{h}leaf{j}" for j in range(100))

    n_chain = n_edges - n_pair - hubs * 100
    chains = max(1, n_chain // 1000)
    for c in range(chains):
        ln = min(1000, n_chain - c * 1000)
        src.extend(f"c{c}n{j}" for j in range(ln))
        dst.extend(f"c{c}n{j + 1}" for j in range(ln))
    # shuffle rows so components don't arrive pre-clustered in blocks
    order = rng.permutation(len(src))
    import pyarrow as pa

    sa = pa.array(src, pa.string()).take(pa.array(order))
    da = pa.array(dst, pa.string()).take(pa.array(order))
    return pa.table({"src": sa, "dst": da})


def main():
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 2_500_000
    num_cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from hamerkop_ray.stages.cluster import (
        _driver_union_find,
        connected_components,
    )

    edges = make_edges(n_edges)
    print(f"edges: {edges.num_rows:,}")

    ds = rd.from_arrow(edges).repartition(num_cpus * 2)
    t0 = time.time()
    out = connected_components(ds, driver_threshold=0)
    labels = {}
    n_rows = 0
    for b in out.iter_batches(batch_format="pyarrow"):
        n_rows += b.num_rows
        for n, l in zip(b["node"].to_pylist(), b["label"].to_pylist()):
            labels[n] = l
    dt = time.time() - t0
    print(f"distributed CC: {n_rows:,} labeled nodes in {dt:.1f}s "
          f"({edges.num_rows / dt:,.0f} edges/s, num_cpus={num_cpus})")

    t1 = time.time()
    want = _driver_union_find([edges])
    dt_uf = time.time() - t1
    mism = sum(
        1 for n, l in zip(want["node"].to_pylist(), want["label"].to_pylist())
        if labels.get(n) != l
    )
    print(f"driver union-find: {dt_uf:.1f}s; label mismatches: {mism}")
    ray.shutdown()
    if mism:
        sys.exit(1)


if __name__ == "__main__":
    main()
