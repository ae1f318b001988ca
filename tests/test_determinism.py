"""Determinism across parallelism: identical output at different partition
counts / batch sizes (SURVEY.md §5 test-plan item d — required for retries
and resume to be exact)."""

import pytest

import ray.data as rd


def _collect(out):
    return sorted(
        (r["mention_id"], r["chain_id"], r["entity_id"], r["cluster_id"], r["method"])
        for b in out["mentions"].iter_batches(batch_format="pyarrow")
        for r in b.to_pylist()
    )


@pytest.mark.usefixtures("ray_session")
def test_flagship_invariant_to_partitioning(small_world):
    from hamerkop_ray.pipelines.flagship import run_flagship

    docs, kb, links = small_world
    base = rd.from_arrow(docs)

    a = _collect(run_flagship(base, kb, batch_size=8, concurrency=(1, 2)))
    b = _collect(run_flagship(base.repartition(7), kb, batch_size=64, concurrency=2))
    # staged path: two actor pools must fit the 4-CPU test session together
    # with the stateless task stage — keep each pool at one actor
    c = _collect(run_flagship(base.repartition(3), kb, batch_size=16, concurrency=1,
                              fused=False))
    assert a == b
    assert a == c  # fused and staged paths agree too


@pytest.mark.usefixtures("ray_session")
def test_minhash_dedup_invariant_to_partitioning():
    from hamerkop_ray.pipelines.dedup import minhash_dedup

    rows = []
    base = "the quick brown fox jumps over the lazy dog near the river bank"
    for i in range(30):
        text = base if i % 3 else base.replace("fox", f"fox{i}")
        rows.append({"doc_id": i, "text": text})
    a = {
        (r["node"], r["label"])
        for b in minhash_dedup(rd.from_items(rows), threshold=0.7).iter_batches(
            batch_format="pyarrow"
        )
        for r in b.to_pylist()
    }
    b2 = {
        (r["node"], r["label"])
        for b in minhash_dedup(
            rd.from_items(rows).repartition(5), threshold=0.7
        ).iter_batches(batch_format="pyarrow")
        for r in b.to_pylist()
    }
    assert a == b2
