"""Join/skew primitives: hot-key detection, salting, salted join correctness."""

import pytest


@pytest.fixture(scope="module")
def skewed(ray_session):
    import ray.data as rd

    # 'hotkey' appears 500×, cold keys once each
    rows = [{"k": "hotkey", "v": i} for i in range(500)]
    rows += [{"k": f"cold{i:03d}", "v": i} for i in range(50)]
    left = rd.from_items(rows)
    right = rd.from_items(
        [{"k": "hotkey", "w": "H"}] + [{"k": f"cold{i:03d}", "w": f"C{i}"} for i in range(50)]
    )
    return left, right


@pytest.mark.usefixtures("ray_session")
def test_hot_keys_detection(skewed):
    from hamerkop_ray.stages.joins import hot_keys

    left, right = skewed
    hot = hot_keys(left, "k", threshold=100)
    assert hot == {"hotkey"}
    assert hot_keys(left, "k", threshold=1000) == set()


@pytest.mark.usefixtures("ray_session")
def test_salt_and_replicate(skewed):
    from hamerkop_ray.stages.joins import replicate_hot, salt_column

    left, right = skewed
    salted = salt_column(left, "k", {"hotkey"}, shards=4)
    vals = [r["k_salted"] for b in salted.iter_batches(batch_format="pyarrow")
            for r in b.to_pylist()]
    hot_shards = {v for v in vals if v.startswith("hotkey#")}
    assert 1 < len(hot_shards) <= 4  # spread across shards
    assert all(not v.startswith("cold") or "#" not in v for v in vals)

    rep = replicate_hot(right, "k", {"hotkey"}, shards=4)
    rvals = [r["k_salted"] for b in rep.iter_batches(batch_format="pyarrow")
             for r in b.to_pylist()]
    assert sum(v.startswith("hotkey#") for v in rvals) == 4  # replicated ×4
    assert sum(v.startswith("cold") for v in rvals) == 50  # cold rows once


@pytest.mark.usefixtures("ray_session")
def test_salted_join_matches_plain_join(skewed):
    from hamerkop_ray.stages.joins import salted_inner_join

    left, right = skewed
    plain = salted_inner_join(left, right, "k", num_partitions=4, hot_threshold=None)
    salted = salted_inner_join(
        left, right, "k", num_partitions=4, hot_threshold=100, shards=4
    )

    def collect(ds):
        return sorted(
            (r["k"], r["v"], r["w"])
            for b in ds.iter_batches(batch_format="pyarrow")
            for r in b.to_pylist()
        )

    a, b = collect(plain), collect(salted)
    assert a == b
    assert len(a) == 550


@pytest.mark.usefixtures("ray_session")
def test_approx_topk(skewed):
    from hamerkop_ray.stages.joins import approx_topk

    left, right = skewed
    top = approx_topk(left, "k", 3)
    assert top[0] == ("hotkey", 500)


@pytest.mark.usefixtures("ray_session")
def test_broadcast_lookup(skewed):
    import ray

    from hamerkop_ray.stages.joins import BroadcastLookup

    left, right = skewed
    ref = ray.put({"hotkey": "HOT"})
    out = left.map_batches(
        BroadcastLookup,
        fn_constructor_kwargs=dict(mapping_ref=ref, key="k", out_col="tag", default="-"),
        batch_format="pyarrow",
        concurrency=2,
    )
    rows = [r for b in out.iter_batches(batch_format="pyarrow") for r in b.to_pylist()]
    assert sum(r["tag"] == "HOT" for r in rows) == 500
    assert sum(r["tag"] == "-" for r in rows) == 50


@pytest.mark.usefixtures("ray_session")
def test_hot_keys_capped_at_max_keys():
    """An adversarial distribution (a flood of distinct just-above-threshold
    keys) must not balloon the driver set: hot_keys keeps only the max_keys
    HOTTEST keys and drops the rest (VERDICT r4 #8)."""
    import pyarrow as pa
    import ray.data as rd

    from hamerkop_ray.stages.joins import hot_keys

    n = 200_000
    keys = [f"k{i:06d}" for i in range(n)] * 2  # every key count=2 > 1
    keys += ["verycold"]  # count=1, never hot
    keys += ["superhot"] * 10  # hottest key must survive the cap
    ds = rd.from_arrow(pa.table({"k": pa.array(keys, pa.string())}))
    hot = hot_keys(ds, "k", threshold=1, max_keys=1000)
    assert len(hot) == 1000
    assert "superhot" in hot  # eviction is coldest-first
    assert "verycold" not in hot
    # uncapped behavior is unchanged
    small = rd.from_arrow(
        pa.table({"k": pa.array(["a"] * 3 + ["b"], pa.string())})
    )
    assert hot_keys(small, "k", threshold=2) == {"a"}
