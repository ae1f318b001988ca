"""Temporal operators (as-of join, per-key windows) and exact quantiles."""

import datetime

import numpy as np
import pytest


def _ds(rows, cols):
    import ray.data as rd

    return rd.from_items([dict(zip(cols, r)) for r in rows])


def _t(minutes):
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(minutes=minutes)


@pytest.mark.usefixtures("ray_session")
def test_asof_join_backward_with_ties():
    from hamerkop_ray.pipelines.temporal import asof_join

    left = _ds(
        [(10, _t(5), 1), (11, _t(100), 1), (12, _t(0), 2), (13, _t(50), 3)],
        ["event_id", "ts", "user_id"],
    )
    # user 1: orders at t=0 (keys 100, 101 — tie on date) and t=60
    # user 2: only a LATER order (t=10) → its event at t=0 has no match
    right = _ds(
        [
            (100, 1, _t(0), 5.0),
            (101, 1, _t(0), 6.0),
            (102, 1, _t(60), 7.0),
            (103, 2, _t(10), 8.0),
        ],
        ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )
    out = {
        r["event_id"]: r
        for b in asof_join(
            left, right,
            key="user_id", right_key="o_custkey",
            left_on="ts", right_on="o_orderdate", tie_col="o_orderkey",
            left_cols=["event_id"], right_cols=["o_totalprice"],
        ).iter_batches(batch_format="pyarrow")
        for r in b.to_pylist()
    }
    # tie at the same orderdate → max orderkey wins
    assert out[10]["o_orderkey"] == 101 and out[10]["o_totalprice"] == 6.0
    # later order at t=60 ≤ t=100 wins over the t=0 pair
    assert out[11]["o_orderkey"] == 102
    # event before user 2's first order: dropped (inner as-of)
    assert 12 not in out
    # user 3 has no orders at all: dropped
    assert 13 not in out


@pytest.mark.usefixtures("ray_session")
def test_asof_join_matches_bruteforce_random():
    from hamerkop_ray.pipelines.temporal import asof_join

    rng = np.random.default_rng(7)
    n_l, n_r = 300, 200
    lrows = [
        (i, _t(int(rng.integers(0, 500))), int(rng.integers(0, 10)))
        for i in range(n_l)
    ]
    rrows = [
        (1000 + j, int(rng.integers(0, 10)), _t(int(rng.integers(0, 500))),
         float(j))
        for j in range(n_r)
    ]
    out = {
        r["event_id"]: (r["o_orderkey"],)
        for b in asof_join(
            _ds(lrows, ["event_id", "ts", "user_id"]),
            _ds(rrows, ["o_orderkey", "o_custkey", "o_orderdate",
                        "o_totalprice"]),
            key="user_id", right_key="o_custkey",
            left_on="ts", right_on="o_orderdate", tie_col="o_orderkey",
            left_cols=["event_id"], right_cols=["o_totalprice"],
        ).iter_batches(batch_format="pyarrow")
        for r in b.to_pylist()
    }
    for eid, ts, uid in lrows:
        cands = [(od, ok) for ok, ck, od, _ in rrows if ck == uid and od <= ts]
        if not cands:
            assert eid not in out
        else:
            want = max(cands)[1]
            assert out[eid][0] == want, eid


@pytest.mark.usefixtures("ray_session")
def test_window_lag_running():
    from hamerkop_ray.pipelines.temporal import window_lag_running

    ev = _ds(
        [
            (1, 1, _t(0), 10.0),
            (2, 1, _t(5), 20.0),
            (3, 1, _t(5), 30.0),  # same ts as event 2 → event_id breaks the tie
            (4, 2, _t(0), 5.0),
        ],
        ["event_id", "user_id", "ts", "value"],
    )
    out = {
        r["event_id"]: r
        for b in window_lag_running(ev).iter_batches(batch_format="pyarrow")
        for r in b.to_pylist()
    }
    assert [out[i]["seq"] for i in (1, 2, 3)] == [1, 2, 3]
    assert out[1]["prev_value"] == 0.0
    assert out[2]["prev_value"] == 10.0
    assert out[3]["prev_value"] == 20.0
    assert out[3]["running_value"] == 60.0
    assert out[4]["seq"] == 1 and out[4]["running_value"] == 5.0


@pytest.mark.usefixtures("ray_session")
def test_exact_quantiles_matches_numpy_order_stats():
    import math

    import ray.data as rd

    from hamerkop_ray.pipelines.quantiles import exact_quantiles

    rng = np.random.default_rng(3)
    vals = np.concatenate(
        [rng.normal(100, 30, 5000), rng.uniform(-50, 0, 2000)]
    )
    ds = rd.from_items([{"x": float(v)} for v in vals]).repartition(8)
    qs = [0.1, 0.5, 0.9, 0.99]
    out = {
        r["q"]: r["value"]
        for r in exact_quantiles(ds, "x", qs, bins=64,
                                 collect_threshold=100).to_pylist()
    }
    sv = np.sort(vals)
    n = len(vals)
    for q in qs:
        k = min(max(int(math.ceil(q * n)) - 1, 0), n - 1)
        assert out[q] == sv[k], q


@pytest.mark.usefixtures("ray_session")
def test_exact_quantiles_grouped():
    import math

    import ray.data as rd

    from hamerkop_ray.pipelines.quantiles import exact_quantiles

    rng = np.random.default_rng(11)
    rows = [
        {"g": ["lo", "mid", "hi"][int(rng.integers(0, 3))],
         "x": float(rng.normal(100, 30))}
        for _ in range(3000)
    ]
    ds = rd.from_items(rows).repartition(6)
    qs = [0.25, 0.9]
    out = {
        (r["g"], r["q"]): r["value"]
        for r in exact_quantiles(ds, "x", qs, group_col="g", bins=32,
                                 collect_threshold=64).to_pylist()
    }
    for g in ("lo", "mid", "hi"):
        vals = np.sort([r["x"] for r in rows if r["g"] == g])
        for q in qs:
            k = min(max(int(math.ceil(q * len(vals))) - 1, 0), len(vals) - 1)
            assert out[(g, q)] == vals[k], (g, q)


@pytest.mark.usefixtures("ray_session")
def test_exact_quantiles_mass_point():
    """A massive duplicate value must resolve via the width-collapse rule,
    not loop or collect the whole mass."""
    import ray.data as rd

    from hamerkop_ray.pipelines.quantiles import exact_quantiles

    vals = np.concatenate([np.full(20000, 42.0), [1.0, 99.0]])
    ds = rd.from_items([{"x": float(v)} for v in vals]).repartition(4)
    out = {
        r["q"]: r["value"]
        for r in exact_quantiles(ds, "x", [0.5], bins=16,
                                 collect_threshold=50).to_pylist()
    }
    assert out[0.5] == 42.0


@pytest.mark.usefixtures("ray_session")
def test_top_tokens_exact_with_ties():
    import ray.data as rd

    from hamerkop_ray.pipelines.text import top_tokens

    docs = rd.from_items(
        [
            {"text": "a a a b b c"},
            {"text": "b  c\td"},   # runs of whitespace collapse
            {"text": "d z"},
        ]
    ).repartition(3)
    rows = [
        r for b in top_tokens(docs, k=3).iter_batches(batch_format="pyarrow")
        for r in b.to_pylist()
    ]
    got = [(r["tok"], r["n"]) for r in rows]
    # counts: a=3 b=3 c=2 d=2 z=1 → top-3 by (n desc, tok asc): a, b, c
    assert sorted(got) == [("a", 3), ("b", 3), ("c", 2)]


@pytest.mark.usefixtures("ray_session")
def test_tfidf_top_terms_hand_computed():
    import math

    import ray.data as rd

    from hamerkop_ray.pipelines.text import tfidf_top_terms

    # 3 docs; "x" appears in all (idf=0), "y" in one (idf=ln 3).
    docs = rd.from_items(
        [
            {"doc_id": 1, "text": "x x y"},
            {"doc_id": 2, "text": "x w"},
            {"doc_id": 3, "text": "x w"},
        ]
    ).repartition(3)
    rows = [
        r
        for b in tfidf_top_terms(docs, k=1).iter_batches(batch_format="pyarrow")
        for r in b.to_pylist()
    ]
    got = {r["doc_id"]: (r["tok"], r["tf"], r["tfidf"]) for r in rows}
    assert got[1] == ("y", 1, round(math.log(3.0), 6))
    ln32 = round(math.log(3.0 / 2.0), 6)
    assert got[2] == ("w", 1, ln32)
    assert got[3] == ("w", 1, ln32)


@pytest.mark.usefixtures("ray_session")
def test_repetition_signals_hand_computed():
    import ray.data as rd

    from hamerkop_ray.pipelines.text import repetition_signals

    docs = rd.from_items(
        [
            # 3 lines, "a b" duplicated; 2-grams of line-joined text
            {"doc_id": 1, "text": "a b\na b\nc d"},
            # no newline, tokens: x x x -> 2-grams: "x x","x x"
            {"doc_id": 2, "text": "x x x"},
            {"doc_id": 3, "text": ""},
        ]
    ).repartition(2)
    rows = [
        r
        for b in repetition_signals(docs).iter_batches(batch_format="pyarrow")
        for r in b.to_pylist()
    ]
    got = {r["doc_id"]: r for r in rows}
    d1 = got[1]
    # lines: ["a b","a b","c d"] -> 3 total, 2 distinct; chars 3+3+3 vs 3+3
    assert d1["n_lines"] == 3
    assert d1["dup_line_frac"] == round(1 - 2 / 3, 6)
    assert d1["dup_line_char_frac"] == round(1 - 6 / 9, 6)
    # tokens a b a b c d -> 2-grams: "a b","b a","a b","b c","c d" (5 total,
    # 4 distinct, top count 2)
    assert d1["n_2grams"] == 5
    assert d1["top_2gram_frac"] == round(2 / 5, 6)
    assert d1["dup_2gram_frac"] == round(1 - 4 / 5, 6)
    d2 = got[2]
    assert (d2["n_lines"], d2["dup_line_frac"]) == (1, 0.0)
    assert d2["n_2grams"] == 2
    assert d2["top_2gram_frac"] == 1.0
    assert d2["dup_2gram_frac"] == 0.5
    d3 = got[3]
    assert d3["n_lines"] == 0 and d3["n_2grams"] == 0
    assert d3["top_2gram_frac"] == 0.0


@pytest.mark.usefixtures("ray_session")
def test_redact_pii_hand_computed():
    import ray.data as rd

    from hamerkop_ray.pipelines.text import redact_pii

    ds = rd.from_items(
        [
            {"doc_id": 1,
             "text": "mail a.b@x.io and c@d.org, ip 192.168.0.1, "
                     "tel +1-555-0042 done"},
            {"doc_id": 2, "text": "nothing here"},
        ]
    )
    rows = {r["doc_id"]: r
            for b in redact_pii(ds).iter_batches(batch_format="pyarrow")
            for r in b.to_pylist()}
    r1 = rows[1]
    assert r1["n_emails"] == 2 and r1["n_ips"] == 1 and r1["n_phones"] == 1
    assert r1["text_redacted"] == (
        "mail <EMAIL> and <EMAIL>, ip <IP>, tel <PHONE> done")
    r2 = rows[2]
    assert (r2["n_emails"], r2["n_ips"], r2["n_phones"]) == (0, 0, 0)
    assert r2["text_redacted"] == "nothing here"


@pytest.mark.usefixtures("ray_session")
def test_decontaminate_hand_computed():
    import ray
    import ray.data as rd

    from hamerkop_ray.pipelines.decontam import decontaminate, eval_ngrams

    ev = rd.from_items([{"doc_id": 100, "text": "the quick brown fox jumps"}])
    grams_ref = ray.put(eval_ngrams(ev, n=3))
    docs = rd.from_items(
        [
            # 3-grams: "the quick brown","quick brown fox","brown fox ran"
            # -> 2 of 3 contaminated, 10*2 >= 3*3 -> flagged
            {"doc_id": 1, "text": "the quick brown fox ran"},
            {"doc_id": 2, "text": "completely clean text here now"},
            {"doc_id": 3, "text": "too short"},
        ]
    ).repartition(2)
    rows = {
        r["doc_id"]: r
        for b in decontaminate(docs, grams_ref, n=3)
        .iter_batches(batch_format="pyarrow")
        for r in b.to_pylist()
    }
    assert rows[1]["n_grams"] == 3 and rows[1]["n_contaminated"] == 2
    assert rows[1]["contaminated_frac"] == round(2 / 3, 6)
    assert rows[1]["is_contaminated"] is True
    assert rows[2]["n_grams"] == 3 and rows[2]["n_contaminated"] == 0
    assert rows[2]["is_contaminated"] is False
    assert rows[3]["n_grams"] == 0 and rows[3]["is_contaminated"] is False


@pytest.mark.usefixtures("ray_session")
def test_doc_chunks_hand_computed():
    import ray.data as rd

    from hamerkop_ray.pipelines.packing import doc_chunks

    docs = rd.from_items(
        [
            {"doc_id": 1, "text": "a b c d e"},   # chunks of 2: ab cd e
            {"doc_id": 2, "text": "x"},
            {"doc_id": 3, "text": ""},
        ]
    ).repartition(2)
    rows = sorted(
        (
            r
            for b in doc_chunks(docs, chunk_tokens=2)
            .iter_batches(batch_format="pyarrow")
            for r in b.to_pylist()
        ),
        key=lambda r: (r["doc_id"], r["chunk_id"]),
    )
    assert [(r["doc_id"], r["chunk_id"], r["n_tokens_chunk"], r["chunk_text"])
            for r in rows] == [
        (1, 0, 2, "a b"), (1, 1, 2, "c d"), (1, 2, 1, "e"), (2, 0, 1, "x")]


@pytest.mark.usefixtures("ray_session")
def test_doc_packing_hand_computed():
    import ray.data as rd

    from hamerkop_ray.pipelines.packing import doc_packing

    docs = rd.from_items(
        [
            {"doc_id": 1, "lang": "en", "text": "a b c"},      # 3 toks @ 0
            {"doc_id": 2, "lang": "en", "text": "d e"},        # 2 toks @ 3
            {"doc_id": 3, "lang": "en", "text": "f"},          # 1 tok  @ 5
            {"doc_id": 4, "lang": "fr", "text": "u v w x"},    # 4 toks @ 0
        ]
    ).repartition(3)
    rows = {
        r["doc_id"]: r
        for b in doc_packing(docs, capacity=4)
        .iter_batches(batch_format="pyarrow")
        for r in b.to_pylist()
    }
    assert (rows[1]["start_offset"], rows[1]["bin_id"]) == (0, 0)
    assert (rows[2]["start_offset"], rows[2]["bin_id"]) == (3, 0)
    assert (rows[3]["start_offset"], rows[3]["bin_id"]) == (5, 1)
    assert (rows[4]["start_offset"], rows[4]["bin_id"]) == (0, 0)


@pytest.mark.usefixtures("ray_session")
def test_range_join_brute_force_random():
    import numpy as np
    import ray.data as rd

    from hamerkop_ray.pipelines.temporal import range_join

    rng = np.random.default_rng(11)
    left = [
        {"k": int(rng.integers(0, 5)), "t": int(rng.integers(0, 1000)),
         "lid": i}
        for i in range(120)
    ]
    right = [
        {"k": int(rng.integers(0, 5)), "t": int(rng.integers(0, 1000)),
         "rid": 1000 + i}
        for i in range(80)
    ]
    lo, hi = -50, 30
    got = sorted(
        (r["lid"], r["rid"])
        for b in range_join(
            rd.from_items(left).repartition(3),
            rd.from_items(right).repartition(2),
            key="k", right_key="k", left_on="t", right_on="t",
            left_id="lid", right_id="rid", lo_us=lo, hi_us=hi,
        ).iter_batches(batch_format="pyarrow")
        for r in b.to_pylist()
    )
    want = sorted(
        (l["lid"], r["rid"])
        for l in left
        for r in right
        if l["k"] == r["k"] and l["t"] + lo <= r["t"] <= l["t"] + hi
    )
    assert got == want


@pytest.mark.usefixtures("ray_session")
def test_window_rank_moving_hand_computed():
    import ray.data as rd

    from hamerkop_ray.pipelines.temporal import window_rank_moving

    ev = rd.from_items(
        [
            {"event_id": 1, "ts": 10, "user_id": 7, "value": 5.0},
            {"event_id": 2, "ts": 20, "user_id": 7, "value": 9.0},
            {"event_id": 3, "ts": 30, "user_id": 7, "value": 5.0},
            {"event_id": 4, "ts": 40, "user_id": 7, "value": 1.0},
        ]
    ).repartition(2)
    rows = {
        r["event_id"]: r
        for b in window_rank_moving(ev, ma_window=2)
        .iter_batches(batch_format="pyarrow")
        for r in b.to_pylist()
    }
    # values 5,9,5,1 -> RANK desc: 9->1, 5->2 (both), 1->4
    assert [rows[i]["value_rank"] for i in (1, 2, 3, 4)] == [2, 1, 2, 4]
    # NTILE(4) of 4 rows in time order -> 1,2,3,4
    assert [rows[i]["ntile4"] for i in (1, 2, 3, 4)] == [1, 2, 3, 4]
    # moving avg over last 2: 5, 7, 7, 3
    assert [rows[i]["moving_avg"] for i in (1, 2, 3, 4)] == [5.0, 7.0, 7.0, 3.0]
