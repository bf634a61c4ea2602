"""Round-3 scale operators: Misra-Gries heavy hitters, Z-order layout,
blocked fuzzy ER, co-occurrence recommender."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from smartdatapipeline_spark.functions.layout import (
    file_minmax_report,
    files_overlapping,
    zorder_key,
    zorder_write,
)
from smartdatapipeline_spark.functions.sketch import (
    heavy_hitters,
    merge_mg,
    misra_gries_partial,
)
from smartdatapipeline_spark.functions.dedup import fuzzy_name_pairs
from smartdatapipeline_spark.operators.behavior import cooccurrence_topk

SF = "/root/testdata/sf0.001"


def _skewed_keys(spark, n_hot=5, hot=500, tail=2000):
    """5 hot keys (500 hits each) + 2000 singletons, shuffled across
    partitions."""
    hot_rows = [(f"hot{i}",) for i in range(n_hot) for _ in range(hot)]
    tail_rows = [(f"tail{i}",) for i in range(tail)]
    return spark.createDataFrame(hot_rows + tail_rows, "key string").repartition(8)


def test_heavy_hitters_exact_vs_full_groupby(spark):
    df = _skewed_keys(spark)
    k = 20
    total = df.count()
    got = {r["key"]: r["n"] for r in heavy_hitters(df, "key", k=k).collect()}
    exact = {
        r["key"]: r["n"]
        for r in df.groupBy("key")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") * (k + 1) > total)
        .collect()
    }
    assert got == exact
    assert set(got) == {f"hot{i}" for i in range(5)}


def test_mg_candidates_are_superset_of_heavies(spark):
    df = _skewed_keys(spark, n_hot=3, hot=300, tail=5000)
    k = 10
    total = df.count()
    cands = {
        r["key"] for r in misra_gries_partial(df, "key", k=k).collect()
    }
    heavies = {
        r["key"]
        for r in df.groupBy("key")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") * (k + 1) > total)
        .collect()
    }
    assert heavies <= cands


def test_merge_mg_bounds_and_size(spark):
    df = _skewed_keys(spark)
    k = 12
    merged = merge_mg(misra_gries_partial(df, "key", k=k), "key", k=k)
    rows = merged.collect()
    assert len(rows) <= k
    exact = {
        r["key"]: r["n"]
        for r in df.groupBy("key").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n = sum(exact.values())
    for r in rows:
        # MG estimate is a lower bound with error <= n/(k+1)
        assert r["est"] <= exact[r["key"]]
        assert exact[r["key"]] - r["est"] <= n / (k + 1)


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet").select(
        "event_id", "user_id", "value"
    )
    zpath = str(tmp_path / "zorder")
    lpath = str(tmp_path / "linear")
    zorder_write(ev, zpath, ["user_id", "value"], bits=8, num_files=32)
    # linear layout: globally sorted by user_id only
    (
        ev.repartitionByRange(32, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(lpath)
    )
    zrep = file_minmax_report(spark, zpath, ["user_id", "value"])
    lrep = file_minmax_report(spark, lpath, ["user_id", "value"])
    assert sum(e["rows"] for e in zrep) == ev.count()
    # point-ish predicates on each dimension
    z_user = files_overlapping(zrep, "user_id", 3, 4)
    l_user = files_overlapping(lrep, "user_id", 3, 4)
    z_val = files_overlapping(zrep, "value", 10.0, 30.0)
    l_val = files_overlapping(lrep, "value", 10.0, 30.0)
    # user_id-sorted layout prunes user_id best, but reads EVERY file
    # for a value predicate; z-order must prune on BOTH dimensions and
    # win the worst case across dimensions.
    assert l_val == len(lrep)
    assert z_val < len(zrep)
    assert z_user < len(zrep)
    assert max(z_user, z_val) < max(l_user, l_val)


def test_zorder_key_matches_python_reference(spark):
    df = spark.createDataFrame(
        [(i, float(i % 7)) for i in range(64)], "a int, b double"
    )
    rows = zorder_key(df, ["a", "b"], bits=4).collect()
    amin, amax = 0, 63
    bmin, bmax = 0.0, 6.0

    def scale(x, lo, hi):
        return min(int((float(x) - lo) * 16.0 / (hi - lo)), 15)

    def interleave(sa, sb):
        z = 0
        for i in range(4):
            z |= ((sa >> i) & 1) << (2 * i)
            z |= ((sb >> i) & 1) << (2 * i + 1)
        return z

    for r in rows:
        assert r["_z"] == interleave(
            scale(r["a"], amin, amax), scale(r["b"], bmin, bmax)
        )


def test_fuzzy_pairs_block_guard_and_symmetry(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),
            (2, "alpha beta gamna"),   # distance 1 from id 1
            (3, "alpha zeta theta"),   # same block, far name
            (4, "omega one two"),      # different block
            (5, "omega one two"),      # exact duplicate of id 4
        ],
        "p_partkey long, p_name string",
    )
    pairs = fuzzy_name_pairs(df, max_distance=2, max_block_size=None).collect()
    got = {(r["id_a"], r["id_b"]): r["distance"] for r in pairs}
    assert got == {(1, 2): 1, (4, 5): 0}
    # block guard: alpha-block has 3 members -> capped at 2 drops it
    guarded = fuzzy_name_pairs(df, max_distance=2, max_block_size=2).collect()
    assert {(r["id_a"], r["id_b"]) for r in guarded} == {(4, 5)}


def test_cooccurrence_cap_bounds_power_users(spark):
    # one power user touching 50 items; cap at 5 -> pairs only among the
    # 5 earliest items
    rows = [
        (i, "2024-01-01T00:%02d:00" % i, 1, "e", 1.0, '{"k": %d}' % i)
        for i in range(50)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, "
        "value double, props string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = cooccurrence_topk(ev, topk=10, max_items_per_user=5).collect()
    items = {r["item"] for r in out} | {r["co_item"] for r in out}
    assert items == {0, 1, 2, 3, 4}
    # each item pairs with the other 4
    assert len(out) == 5 * 4


def test_event_transitions_probabilities(spark):
    rows = [
        (1, "2024-01-01T00:00:00", 1, "a", 0.0, "{}"),
        (2, "2024-01-01T00:01:00", 1, "b", 0.0, "{}"),
        (3, "2024-01-01T00:02:00", 1, "a", 0.0, "{}"),
        (4, "2024-01-01T00:03:00", 1, "c", 0.0, "{}"),
        (5, "2024-01-01T00:00:00", 2, "a", 0.0, "{}"),
        (6, "2024-01-01T00:01:00", 2, "b", 0.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, "
        "value double, props string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    from smartdatapipeline_spark.operators.behavior import event_transitions

    got = {(r["cur"], r["nxt"]): (r["n"], r["p"]) for r in event_transitions(ev).collect()}
    # chains: u1 a->b->a->c, u2 a->b
    assert got[("a", "b")] == (2, 2.0 / 3.0)
    assert got[("a", "c")] == (1, 1.0 / 3.0)
    assert got[("b", "a")] == (1, 1.0)
    # per-state probabilities sum to 1
    from collections import defaultdict

    sums = defaultdict(float)
    for (cur, _), (_, p) in got.items():
        sums[cur] += p
    for cur, s in sums.items():
        assert abs(s - 1.0) < 1e-12, (cur, s)


def test_snapshot_diff_all_change_classes(spark):
    from smartdatapipeline_spark.operators.quality import snapshot_diff

    old = spark.createDataFrame(
        [(1, 10, "x"), (2, 20, "y"), (3, 30, "z")], "k long, v long, s string"
    )
    new = spark.createDataFrame(
        [(1, 10, "x"), (2, 99, "y"), (4, 40, "w")], "k long, v long, s string"
    )
    got = {r["k"]: r["change_type"] for r in snapshot_diff(old, new, ["k"]).collect()}
    assert got == {1: "unchanged", 2: "updated", 3: "deleted", 4: "inserted"}


def test_snapshot_diff_null_vs_literal_disambiguation(spark):
    # NULL and the string "\\x00null" sentinel must not collide; and a
    # column-boundary shift ("ab","c") vs ("a","bc") must differ
    from smartdatapipeline_spark.operators.quality import snapshot_diff

    old = spark.createDataFrame([(1, "ab", "c")], "k long, a string, b string")
    new = spark.createDataFrame([(1, "a", "bc")], "k long, a string, b string")
    assert snapshot_diff(old, new, ["k"]).collect()[0]["change_type"] == "updated"
    old2 = spark.createDataFrame([(1, None, "c")], "k long, a string, b string")
    new2 = spark.createDataFrame([(1, "", "c")], "k long, a string, b string")
    assert snapshot_diff(old2, new2, ["k"]).collect()[0]["change_type"] == "updated"


def test_forecast_holt_matches_python_recursion(spark):
    import datetime as dt

    vals = [10.0, 12.0, 13.0, 15.0, 14.0, 18.0]
    rows = [
        (dt.date(2024, 1, 1) + dt.timedelta(days=i), "m", v)
        for i, v in enumerate(vals)
    ]
    series = spark.createDataFrame(
        rows, "metric_date date, metric string, value double"
    )
    from smartdatapipeline_spark.operators.forecast import forecast_holt

    out = {
        r["target_date"]: r["yhat"]
        for r in forecast_holt(series, horizon_days=3).collect()
    }
    l, b = vals[0], vals[1] - vals[0]
    for x in vals[1:]:
        ln = 0.5 * x + 0.5 * (l + b)
        b = 0.5 * (ln - l) + 0.5 * b
        l = ln
    for h in (1, 2, 3):
        assert out[dt.date(2024, 1, 6) + dt.timedelta(days=h)] == l + h * b


def test_forecast_holt_length_one_series(spark):
    import datetime as dt

    series = spark.createDataFrame(
        [(dt.date(2024, 1, 1), "m", 7.0)],
        "metric_date date, metric string, value double",
    )
    from smartdatapipeline_spark.operators.forecast import forecast_holt

    rows = forecast_holt(series, horizon_days=2).collect()
    assert [r["yhat"] for r in rows] == [7.0, 7.0]  # zero trend


def test_weighted_sample_determinism_and_bias(spark):
    from smartdatapipeline_spark.functions.sampling import weighted_sample

    df = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        # ids < 200 get weight 8, rest weight 1
        F.when(F.col("id") < 200, F.lit(8)).otherwise(F.lit(1)).alias("weight"),
    )
    s1 = sorted(r["doc_id"] for r in weighted_sample(df, k=200).collect())
    s2 = sorted(r["doc_id"] for r in weighted_sample(df, k=200).collect())
    assert s1 == s2 and len(s1) == 200
    # ~200 heavy ids with total weight 1600 vs 1800 light weight -> heavy
    # ids should be strongly over-represented relative to 10% population
    heavy = sum(1 for i in s1 if i < 200)
    assert heavy > 60  # expectation ~ 8x over-representation


def test_concurrency_profile_known_overlaps(spark):
    rows = [
        (1, "2024-01-01T10:00:00", 1, "a", 0.0, "{}"),
        (2, "2024-01-01T10:05:00", 2, "a", 0.0, "{}"),  # overlaps 1
        (3, "2024-01-01T10:14:00", 3, "a", 0.0, "{}"),  # overlaps 1+2
        (4, "2024-01-01T10:30:00", 4, "a", 0.0, "{}"),  # disjoint from 1-3
        (5, "2024-01-02T09:00:00", 5, "a", 0.0, "{}"),  # next day
        (6, "2024-01-01T10:00:00", 6, "b", 0.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, "
        "value double, props string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    from smartdatapipeline_spark.operators.temporal import concurrency_profile

    got = {
        (r["event_type"], str(r["day"])): r["peak_concurrency"]
        for r in concurrency_profile(ev, duration_minutes=15).collect()
    }
    assert got[("a", "2024-01-01")] == 3
    assert got[("a", "2024-01-02")] == 1
    assert got[("b", "2024-01-01")] == 1


def test_concurrency_half_open_touching_intervals(spark):
    # interval ending exactly when another starts must NOT count as
    # concurrent (ends sort before starts at the same instant)
    rows = [
        (1, "2024-01-01T10:00:00", 1, "a", 0.0, "{}"),
        (2, "2024-01-01T10:15:00", 2, "a", 0.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, "
        "value double, props string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    from smartdatapipeline_spark.operators.temporal import concurrency_profile

    got = concurrency_profile(ev, duration_minutes=15).collect()
    assert got[0]["peak_concurrency"] == 1


def test_exact_quantile_two_pass_vs_sorted(spark):
    from smartdatapipeline_spark.functions.sketch import exact_quantile_two_pass
    import math

    # skewed data with heavy ties — exercises bracket + below-count
    vals = [float(i % 97) for i in range(5000)] + [1000.0] * 13
    df = spark.createDataFrame([(v,) for v in vals], "value double").repartition(8)
    s = sorted(vals)
    n = len(s)
    for q in (0.0, 0.25, 0.5, 0.9, 0.99, 1.0):
        # discrete convention: 1-based rank max(1, ceil(q*n)) — matches
        # DuckDB quantile_disc at every n, not just when q*n is integral
        expect = s[max(1, math.ceil(q * n)) - 1]
        assert exact_quantile_two_pass(df, "value", q) == expect, q


def test_exact_quantile_empty_and_single(spark):
    from smartdatapipeline_spark.functions.sketch import exact_quantile_two_pass

    empty = spark.createDataFrame([], "value double")
    assert exact_quantile_two_pass(empty, "value", 0.5) is None
    one = spark.createDataFrame([(42.0,)], "value double")
    assert exact_quantile_two_pass(one, "value", 0.5) == 42.0
