"""HyperLogLog sketch tests: accuracy vs exact, partition-independence,
and the groupby AggregateFn path."""
import numpy as np
import pytest

from hamerkop_ray.functions import hll


def test_hll_accuracy_and_determinism():
    rng = np.random.default_rng(7)
    vals = rng.integers(0, 20_000, size=100_000)
    exact = len(np.unique(vals))
    reg = hll.add_values(hll.empty_registers(), vals)
    est = hll.estimate(reg)
    assert abs(est - exact) / exact < 0.02
    # order/partition independence: fold in any split, same registers
    reg2 = hll.empty_registers()
    for chunk in np.array_split(vals[::-1], 13):
        hll.add_values(reg2, chunk)
    assert np.array_equal(reg, reg2)


def test_hll_merge_is_union():
    a_vals = np.arange(0, 5000)
    b_vals = np.arange(2500, 7500)
    a = hll.add_values(hll.empty_registers(), a_vals)
    b = hll.add_values(hll.empty_registers(), b_vals)
    merged = hll.merge(a, b)
    both = hll.add_values(hll.empty_registers(), np.arange(0, 7500))
    assert np.array_equal(merged, both)


def test_hll_small_range_linear_counting():
    reg = hll.add_values(hll.empty_registers(), np.arange(100))
    assert abs(hll.estimate(reg) - 100) <= 2


@pytest.mark.usefixtures("ray_session")
def test_hll_distinct_dataset_partition_independent():
    import ray.data as rd

    from hamerkop_ray.pipelines.sketches import hll_distinct

    items = [{"u": int(i % 777)} for i in range(20_000)]
    e1 = hll_distinct(rd.from_items(items).repartition(3), "u")
    e2 = hll_distinct(rd.from_items(items).repartition(17), "u")
    assert e1 == e2
    assert abs(e1 - 777) / 777 < 0.02


@pytest.mark.usefixtures("ray_session")
def test_hll_groupby_aggregate_matches_local():
    import ray.data as rd

    from hamerkop_ray.pipelines.sketches import HllDistinct

    items = [
        {"g": "a" if i % 3 else "b", "u": int(i % 211)} for i in range(5_000)
    ]
    out = (
        rd.from_items(items)
        .repartition(7)
        .groupby("g")
        .aggregate(HllDistinct("u", alias_name="nd"))
        .take_all()
    )
    got = {r["g"]: r["nd"] for r in out}
    # local single-process HLL per group must agree exactly
    for g in ("a", "b"):
        vals = np.array([r["u"] for r in items if r["g"] == g])
        reg = hll.add_values(hll.empty_registers(), vals)
        assert got[g] == hll.estimate(reg)


def test_bloom_no_false_negatives_and_fpp():
    import numpy as np

    from hamerkop_ray.functions.bloom import BloomFilter

    members = np.arange(0, 10_000)
    f = BloomFilter.build(members, fpp=0.01)
    assert f.might_contain(members).all()
    probe = np.arange(50_000, 150_000)
    fpp = f.might_contain(probe).mean()
    assert fpp < 0.03


def test_bloom_merge_is_union():
    import numpy as np

    from hamerkop_ray.functions.bloom import BloomFilter, optimal_params

    m, k = optimal_params(2000, 0.01)
    a = BloomFilter(m, k).add(np.arange(0, 1000))
    b = BloomFilter(m, k).add(np.arange(1000, 2000))
    both = BloomFilter(m, k).add(np.arange(0, 2000))
    assert np.array_equal(a.merge(b).bits, both.bits)


def test_cms_never_undercounts_and_is_tight_on_skew():
    import numpy as np

    from hamerkop_ray.functions.cms import CountMinSketch

    rng = np.random.default_rng(3)
    # zipf-ish: token i appears ~ 10000/i times
    toks = np.repeat(
        np.array([f"t{i}" for i in range(1, 200)], dtype=object),
        (10000 / np.arange(1, 200)).astype(int),
    )
    rng.shuffle(toks)
    sk = CountMinSketch().add(toks)
    uniq, exact = np.unique(toks, return_counts=True)
    est = sk.estimate(uniq)
    assert (est >= exact).all()          # CMS never undercounts
    # heavy hitters essentially exact at this load factor
    heavy = exact >= 1000
    assert (est[heavy] == exact[heavy]).all()


def test_cms_merge_is_sum():
    import numpy as np

    from hamerkop_ray.functions.cms import CountMinSketch

    a = CountMinSketch().add(np.array(["x", "y", "x"], dtype=object))
    b = CountMinSketch().add(np.array(["x", "z"], dtype=object))
    m = a.merge(b)
    assert m.estimate(np.array(["x"], dtype=object))[0] == 3


@pytest.mark.usefixtures("ray_session")
def test_top_tokens_cms_matches_exact_on_skewed_corpus():
    import ray.data as rd

    from hamerkop_ray.pipelines.sketches import top_tokens_cms

    # heavy tokens dominate every batch, so candidates are found and
    # CMS estimates are exact at this tiny load factor
    docs = rd.from_items(
        [{"text": ("alpha " * 50) + ("beta " * 20) + f"rare{i} x"}
         for i in range(200)]
    ).repartition(4)
    rows = [
        r
        for b in top_tokens_cms(docs, k=3).iter_batches(batch_format="pyarrow")
        for r in b.to_pylist()
    ]
    got = {r["tok"]: r["n_est"] for r in rows}
    assert got["alpha"] == 200 * 50
    assert got["beta"] == 200 * 20
    assert got["x"] == 200


@pytest.mark.usefixtures("ray_session")
def test_key_skew_report_hand_computed():
    import math

    import ray.data as rd

    from hamerkop_ray.pipelines.sketches import key_skew_report

    # 8 'a', 2 'b' -> max frac 0.8, entropy = -(0.8 lg 0.8 + 0.2 lg 0.2)
    items = [{"k": "a"}] * 8 + [{"k": "b"}] * 2
    rows = [
        r
        for b in key_skew_report(rd.from_items(items).repartition(3), "k")
        .iter_batches(batch_format="pyarrow")
        for r in b.to_pylist()
    ]
    (r,) = rows
    assert (r["n_rows"], r["n_keys"]) == (10, 2)
    assert r["max_key_frac"] == 0.8
    assert r["top10_frac"] == 1.0
    want = -(0.8 * math.log2(0.8) + 0.2 * math.log2(0.2))
    assert abs(r["entropy_bits"] - want) < 1e-6
