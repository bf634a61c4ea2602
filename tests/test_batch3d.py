"""Tests for association rules, debounce, sliding distinct, winsorize,
basket Jaccard, running-balance fold, phrase search."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def _ts(sec):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=sec)


def test_association_rules_counts_and_lift(spark):
    from smartdatapipeline_spark.operators.behavior import association_rules

    rows = [
        (1, "a"), (1, "b"),
        (2, "a"), (2, "b"),
        (3, "a"),
        (4, "c"),
    ]
    ev = spark.createDataFrame(
        [(u, t, _ts(0)) for u, t in rows], "user_id long, event_type string, ts timestamp"
    )
    got = {
        (r["item_a"], r["item_b"]): r for r in association_rules(ev).collect()
    }
    r = got[("a", "b")]
    assert r["n_both"] == 2 and r["n_a"] == 3 and r["n_b"] == 2
    assert r["conf_a_b"] == 2 / 3
    assert r["conf_b_a"] == 1.0
    assert r["lift"] == (2 * 4) / (3 * 2)  # P(ab)/(P(a)P(b)) with N=4
    assert ("a", "c") not in got  # never co-occur


def test_event_debounce_lag_semantics(spark):
    from smartdatapipeline_spark.operators.behavior import event_debounce

    # same user/type at t=0, 30, 90: keep 0 (first), drop 30 (<60 after 0),
    # keep 90 (60 after previous RAW event at 30)
    ev = spark.createDataFrame(
        [
            (1, 1, _ts(0), "x"),
            (2, 1, _ts(30), "x"),
            (3, 1, _ts(90), "x"),
            (4, 2, _ts(31), "x"),  # other user: independent, kept
        ],
        "event_id long, user_id long, ts timestamp, event_type string",
    )
    r = event_debounce(ev, min_gap_s=60).collect()[0]
    assert r["n_kept"] == 3 and r["n_dropped"] == 1


def test_sliding_distinct_users_window(spark):
    from smartdatapipeline_spark.operators.temporal import sliding_distinct_users

    def day(d, u):
        return (u, dt.datetime(2024, 1, d, 12))

    ev = spark.createDataFrame(
        [day(1, 1), day(1, 2), day(5, 2), day(9, 3)],
        "user_id long, ts timestamp",
    )
    got = {
        r["day"].isoformat(): r["n_active_users"]
        for r in sliding_distinct_users(ev, window_days=7).collect()
    }
    # spine only has active days 1, 5, 9
    assert got["2024-01-01"] == 2          # users 1,2 on day 1
    assert got["2024-01-05"] == 2          # users 1,2 (day1 within 7d) + 2
    assert got["2024-01-09"] == 2          # user 2 (day5) + user 3


def test_winsorized_stats_bounds_and_mass(spark):
    from smartdatapipeline_spark.functions.sketch import winsorized_stats

    vals = [float(v) for v in range(1, 101)]  # 1..100
    df = spark.createDataFrame([(v,) for v in vals], "value double")
    r = winsorized_stats(df, "value", 0.10, 0.90).collect()[0]
    # discrete quantiles of 1..100: 1-based rank max(1, ceil(q*n))
    assert r["lo_bound"] == 10.0 and r["hi_bound"] == 90.0
    assert r["n_clipped_lo"] == 9 and r["n_clipped_hi"] == 10
    want_sum = sum(max(10.0, min(90.0, v)) for v in vals)
    assert r["sum_winsorized"] == want_sum
    assert r["sum_raw"] == sum(vals)


def test_basket_jaccard_exact_pairs(spark):
    from smartdatapipeline_spark.functions.similarity import basket_jaccard_pairs

    baskets = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12), (2, 10), (2, 11), (3, 99)],
        "cust long, part long",
    )
    out = basket_jaccard_pairs(baskets, "cust", "part", top_k=10).collect()
    assert len(out) == 1  # only (1,2) share items
    r = out[0]
    assert (r["id_a"], r["id_b"]) == (1, 2)
    assert r["n_common"] == 2 and r["jaccard"] == 2 / 3


def test_basket_jaccard_block_guard_drops_mega_item(spark):
    from smartdatapipeline_spark.functions.similarity import basket_jaccard_pairs

    # item 1 shared by everyone (boilerplate) → guarded out; only the
    # genuine pair via item 7 survives
    rows = [(c, 1) for c in range(50)] + [(0, 7), (1, 7)]
    baskets = spark.createDataFrame(rows, "cust long, part long")
    out = basket_jaccard_pairs(
        baskets, "cust", "part", top_k=100, max_block_size=10
    ).collect()
    assert [(r["id_a"], r["id_b"]) for r in out] == [(0, 1)]


def test_running_balance_clamps(spark):
    from smartdatapipeline_spark.operators.temporal import running_balance

    # deltas in time order: +5, -8 (clamped to 0), +3, -1 → final 2, one clamp
    ev = spark.createDataFrame(
        [
            (1, 1, _ts(0), 5.0),
            (2, 1, _ts(10), -8.0),
            (3, 1, _ts(20), 3.0),
            (4, 1, _ts(30), -1.0),
        ],
        "event_id long, user_id long, ts timestamp, delta double",
    )
    r = running_balance(ev, "delta").collect()[0]
    assert r["n_events"] == 4
    assert r["final_balance"] == 2.0
    assert r["n_clamped"] == 1


def test_phrase_search_counts_occurrences(spark):
    from smartdatapipeline_spark.functions.retrieval import phrase_search

    docs = spark.createDataFrame(
        [
            (1, "data stream data stream x"),   # 2 hits
            (2, "stream data"),                 # wrong order: 0
            (3, "a data stream b"),             # 1 hit
            (4, ""),                            # empty
        ],
        "doc_id long, text string",
    )
    got = [(r["doc_id"], r["n_hits"]) for r in phrase_search(docs, "data stream").collect()]
    assert got == [(1, 2), (3, 1)]


def test_phrase_search_three_terms(spark):
    from smartdatapipeline_spark.functions.retrieval import phrase_search

    docs = spark.createDataFrame(
        [(1, "a b c a b"), (2, "a b x c")],
        "doc_id long, text string",
    )
    got = [(r["doc_id"], r["n_hits"]) for r in phrase_search(docs, "a b c").collect()]
    assert got == [(1, 1)]


def test_cumulative_users_growth_curve(spark):
    from smartdatapipeline_spark.operators.behavior import cumulative_users

    rows = [
        (1, dt.datetime(2024, 1, 1)),
        (1, dt.datetime(2024, 1, 3)),   # returning, not new
        (2, dt.datetime(2024, 1, 3)),
        (3, dt.datetime(2024, 1, 5)),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = [
        (r["day"].isoformat(), r["n_new_users"], r["cum_users"])
        for r in cumulative_users(ev).orderBy("day").collect()
    ]
    assert got == [
        ("2024-01-01", 1, 1),
        ("2024-01-03", 1, 2),
        ("2024-01-05", 1, 3),
    ]


def test_consistent_hash_sample_is_coherent_across_tables(spark):
    from smartdatapipeline_spark.functions.sampling import consistent_hash_sample

    t1 = spark.createDataFrame([(k,) for k in range(500)], "k long")
    t2 = spark.createDataFrame(
        [(k, k * 10) for k in range(500)], "k long, other long"
    )
    s1 = {r["k"] for r in consistent_hash_sample(t1, "k", pct=20).collect()}
    s2 = {r["k"] for r in consistent_hash_sample(t2, "k", pct=20).collect()}
    assert s1 == s2            # identical key decisions on both tables
    assert 0 < len(s1) < 500   # actually samples
    sub = {r["k"] for r in consistent_hash_sample(t1, "k", pct=10).collect()}
    assert sub <= s1           # nested: pct=10 ⊂ pct=20


def test_grouped_quantiles_match_sorted(spark):
    import math

    from smartdatapipeline_spark.functions.sketch import grouped_quantiles_exact

    import random

    rng = random.Random(7)
    data = [("g1", float(rng.randint(0, 999))) for _ in range(257)] + [
        ("g2", float(v)) for v in range(83)
    ]
    df = spark.createDataFrame(data, "g string, v double")
    got = {
        (r["series"], r["q"]): r["value"]
        for r in grouped_quantiles_exact(df, "v", "g").collect()
    }
    for g in ("g1", "g2"):
        s = sorted(v for k, v in data if k == g)
        n = len(s)
        for q in (0.5, 0.9, 0.99):
            assert got[(g, q)] == s[max(1, math.ceil(q * n)) - 1], (g, q)


def test_cap_rows_per_key_keeps_lowest_ranked(spark):
    from smartdatapipeline_spark.functions.sampling import cap_rows_per_key

    rows = [("s1", i) for i in range(10)] + [("s2", i) for i in range(3)]
    df = spark.createDataFrame(rows, "source string, doc_id long")
    out = cap_rows_per_key(df, "source", 5, ["doc_id"]).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r["doc_id"])
    assert sorted(by_src["s1"]) == [0, 1, 2, 3, 4]  # deterministic: lowest ids
    assert sorted(by_src["s2"]) == [0, 1, 2]        # under cap: untouched


def test_cluster_aware_split_colocates_exact_dups(spark):
    from smartdatapipeline_spark.functions.dedup import cluster_aware_split

    docs = spark.createDataFrame(
        [(i, f"unique text {i}") for i in range(50)]
        + [(100 + i, "same dup text") for i in range(5)],
        "doc_id long, text string",
    )
    out = cluster_aware_split(docs).collect()
    splits = {r["doc_id"]: r["split"] for r in out}
    dup_splits = {splits[100 + i] for i in range(5)}
    assert len(dup_splits) == 1  # all exact dups in ONE split
    reps = {r["doc_id"]: r["rep_id"] for r in out}
    assert all(reps[100 + i] == 100 for i in range(5))


def test_set_similarity_join_equals_bruteforce(spark):
    from smartdatapipeline_spark.functions.dedup import (
        ngram_jaccard_pairs,
        set_similarity_join,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "the quick brown fox leaps over the lazy dog"),
            (4, "completely different words entirely here now"),
            (5, "the quick brown fox jumps over the lazy dog"),  # exact dup
        ],
        "doc_id long, text string",
    )
    t = 0.5
    want = {
        (r["doc_a"], r["doc_b"], r["n_inter"], r["jaccard"])
        for r in ngram_jaccard_pairs(docs, threshold=t).collect()
        if r["jaccard"] >= t
    }
    got = {
        (r["doc_a"], r["doc_b"], r["n_inter"], r["jaccard"])
        for r in set_similarity_join(docs, threshold=t).collect()
    }
    assert got == want and len(got) >= 2  # prefix filter: zero recall loss
