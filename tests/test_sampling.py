"""Deterministic sampling: hash fraction filter + stratified fixed-n."""

import hashlib

import numpy as np
import pytest


def _docs(n, langs=("en", "de", "fr")):
    import ray.data as rd

    return rd.from_items(
        [{"doc_id": i, "lang": langs[i % len(langs)]} for i in range(n)]
    ).repartition(5)


@pytest.mark.usefixtures("ray_session")
def test_hash_sample_matches_reference_filter():
    from hamerkop_ray.pipelines.sampling import _threshold_hex, hash_sample

    ds = _docs(2000)
    got = sorted(
        r["doc_id"]
        for b in hash_sample(ds, 0.2, "doc_id").iter_batches(
            batch_format="pyarrow")
        for r in b.to_pylist()
    )
    thr = _threshold_hex(0.2)
    want = [
        i for i in range(2000)
        if hashlib.md5(str(i).encode()).hexdigest()[:8] < thr
    ]
    assert got == want
    # roughly the requested fraction
    assert 0.15 < len(got) / 2000 < 0.25


@pytest.mark.usefixtures("ray_session")
def test_hash_sample_partition_independent():
    from hamerkop_ray.pipelines.sampling import hash_sample

    import ray.data as rd

    rows = [{"doc_id": i, "lang": "en"} for i in range(500)]
    a = rd.from_items(rows).repartition(2)
    b = rd.from_items(rows).repartition(13)
    ga = sorted(r["doc_id"] for bt in hash_sample(a, 0.3, "doc_id")
                .iter_batches(batch_format="pyarrow") for r in bt.to_pylist())
    gb = sorted(r["doc_id"] for bt in hash_sample(b, 0.3, "doc_id")
                .iter_batches(batch_format="pyarrow") for r in bt.to_pylist())
    assert ga == gb


@pytest.mark.usefixtures("ray_session")
def test_stratified_sample_exact_n_and_choice():
    from hamerkop_ray.pipelines.sampling import stratified_sample

    ds = _docs(900)
    rows = [
        (r["lang"], r["doc_id"])
        for b in stratified_sample(ds, 7, group_col="lang", key_col="doc_id")
        .iter_batches(batch_format="pyarrow")
        for r in b.to_pylist()
    ]
    by_lang: dict[str, list[int]] = {}
    for lang, i in rows:
        by_lang.setdefault(lang, []).append(i)
    assert set(by_lang) == {"en", "de", "fr"}
    for lang, ids in by_lang.items():
        assert len(ids) == 7
        # the chosen ids are exactly the 7 smallest (md5, id) of the group
        pool = [i for i in range(900) if ["en", "de", "fr"][i % 3] == lang]
        want = sorted(
            pool,
            key=lambda i: (hashlib.md5(str(i).encode()).hexdigest()[:8], i),
        )[:7]
        assert sorted(ids) == sorted(want), lang


@pytest.mark.usefixtures("ray_session")
def test_stratified_sample_small_group_kept_whole():
    from hamerkop_ray.pipelines.sampling import stratified_sample

    import ray.data as rd

    ds = rd.from_items(
        [{"doc_id": i, "lang": "xx" if i < 3 else "en"} for i in range(50)]
    ).repartition(4)
    rows = [
        (r["lang"], r["doc_id"])
        for b in stratified_sample(ds, 10, group_col="lang", key_col="doc_id")
        .iter_batches(batch_format="pyarrow")
        for r in b.to_pylist()
    ]
    xx = [i for lang, i in rows if lang == "xx"]
    assert sorted(xx) == [0, 1, 2]  # group smaller than n → kept whole
    assert len([1 for lang, _ in rows if lang == "en"]) == 10


@pytest.mark.usefixtures("ray_session")
def test_mixture_sample_quotas_and_determinism():
    import math

    import ray.data as rd

    from hamerkop_ray.pipelines.sampling import mixture_sample

    # groups of size 100, 400: isqrt weights 10, 20 -> quotas of total=30
    # are 10 and 20
    items = [{"g": "small", "k": i} for i in range(100)] + [
        {"g": "big", "k": 1000 + i} for i in range(400)
    ]
    out1 = sorted(
        (r["g"], r["k"])
        for b in mixture_sample(
            rd.from_items(items).repartition(5), 30, "g", "k"
        ).iter_batches(batch_format="pyarrow")
        for r in b.to_pylist()
    )
    from collections import Counter

    by_g = Counter(g for g, _ in out1)
    assert by_g == {"small": 10, "big": 20}
    # partition-independent
    out2 = sorted(
        (r["g"], r["k"])
        for b in mixture_sample(
            rd.from_items(items).repartition(11), 30, "g", "k"
        ).iter_batches(batch_format="pyarrow")
        for r in b.to_pylist()
    )
    assert out1 == out2
