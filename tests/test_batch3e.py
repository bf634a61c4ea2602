"""Tests for kpi rollup, BFS hops, table profiler, FK orphans,
event paths, time-weighted average."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def test_kpi_rollup_levels_cascade(spark):
    from smartdatapipeline_spark.operators.kpi import kpi_rollup

    rows = [
        (dt.datetime(2024, 1, 1, 5), "a", 1.0),
        (dt.datetime(2024, 1, 1, 6), "a", 2.0),
        (dt.datetime(2024, 1, 2, 5), "a", 4.0),
        (dt.datetime(2024, 1, 1, 5), "b", 8.0),
    ]
    ev = spark.createDataFrame(rows, "ts timestamp, event_type string, value double")
    out = kpi_rollup(ev).collect()
    by_gid = {}
    for r in out:
        by_gid.setdefault(r["gid"], []).append(r)
    assert len(by_gid[0]) == 3  # (a,d1) (a,d2) (b,d1)
    a_total = [r for r in by_gid[1] if r["metric"] == "a"][0]
    assert a_total["n_events"] == 3 and a_total["value_sum"] == 7.0
    grand = by_gid[3][0]
    assert grand["metric"] is None and grand["day"] is None
    assert grand["n_events"] == 4 and grand["value_sum"] == 15.0


def test_bfs_hops_min_distance(spark):
    from smartdatapipeline_spark.functions.graph import bfs_hops, symmetrize

    # path 1-2-3-4-5 plus shortcut 1-4
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (1, 4)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {
        r["node"]: r["hops"]
        for r in bfs_hops(symmetrize(edges), seeds, max_hops=4).collect()
    }
    assert got == {1: 0, 2: 1, 4: 1, 3: 2, 5: 2}


def test_bfs_hops_bounded_depth(spark):
    from smartdatapipeline_spark.functions.graph import bfs_hops

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {r["node"]: r["hops"] for r in bfs_hops(edges, seeds, max_hops=2).collect()}
    assert got == {1: 0, 2: 1, 3: 2}  # node 4 beyond the bound


def test_table_profile_stats(spark):
    from smartdatapipeline_spark.operators.quality import table_profile

    df = spark.createDataFrame(
        [(1, "x", 2.5), (2, "y", None), (3, "x", 7.5)],
        "k long, s string, v double",
    )
    got = {r["col_name"]: r for r in table_profile(df).collect()}
    assert got["k"]["n_rows"] == 3 and got["k"]["n_null"] == 0
    assert got["k"]["n_distinct"] == 3
    assert got["k"]["min_str"] == "1" and got["k"]["max_str"] == "3"
    assert got["s"]["n_distinct"] == 2
    assert got["v"]["n_null"] == 1 and got["v"]["n_distinct"] == 2
    assert got["v"]["min_str"] == "2.5" and got["v"]["max_str"] == "7.5"


def test_fk_orphans_counts(spark):
    from smartdatapipeline_spark.operators.quality import fk_orphans

    child = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 99), (4, None)], "id long, fk long"
    )
    parent = spark.createDataFrame([(10,), (20,)], "pk long")
    r = fk_orphans([(child, "fk", parent, "pk", "child.parent")]).collect()[0]
    assert r["relation"] == "child.parent"
    assert r["n_rows"] == 4
    assert r["n_orphans"] == 2  # 99 and NULL


def test_event_paths_trigram_counts(spark):
    from smartdatapipeline_spark.operators.behavior import event_paths

    def r(u, s, t):
        return (u, s, dt.datetime(2024, 1, 1, 0, 0, s), t)

    rows = [
        r(1, 0, "a"), r(1, 1, "b"), r(1, 2, "c"), r(1, 3, "a"),
        r(2, 0, "a"), r(2, 1, "b"), r(2, 2, "c"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, event_type string"
    )
    got = {row["path"]: row["n"] for row in event_paths(ev, depth=3).collect()}
    assert got == {"a>b>c": 2, "b>c>a": 1}


def test_time_weighted_avg_holds_values(spark):
    from smartdatapipeline_spark.operators.temporal import time_weighted_avg

    # one day, series m: value 10 held 60 s, then 20 held to midnight
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    ev = spark.createDataFrame(
        [
            (1, 1, t0, "m", 10.0),
            (2, 1, t0 + dt.timedelta(seconds=60), "m", 20.0),
        ],
        "event_id long, user_id long, ts timestamp, event_type string, value double",
    )
    r = time_weighted_avg(ev).collect()[0]
    assert r["n_events"] == 2
    assert r["total_s"] == 86400
    want = (10.0 * 60 + 20.0 * (86400 - 60)) / 86400
    assert r["twap"] == want


def test_quantize_embeddings_checksum_and_zero_vector(spark):
    from smartdatapipeline_spark.functions.similarity import quantize_embeddings

    emb = spark.createDataFrame(
        [(1, [1.0, -2.0, 0.5]), (2, [0.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    got = {r["vec_id"]: r for r in quantize_embeddings(emb).collect()}
    r = got[1]
    assert r["n_dims"] == 3 and r["max_abs"] == 2.0
    # scale 63.5 → q = [64, -127, 32]; checksum = 64*1 -127*2 + 32*3
    assert r["checksum"] == 64 * 1 - 127 * 2 + 32 * 3
    z = got[2]
    assert z["max_abs"] == 0.0 and z["checksum"] is None  # no ±inf garbage


def test_wow_change_joins_seven_days_back(spark):
    from smartdatapipeline_spark.operators.metrics import wow_change

    rows = [
        (dt.datetime(2024, 1, 1), "m", 10.0),
        (dt.datetime(2024, 1, 8), "m", 15.0),
        (dt.datetime(2024, 1, 9), "m", 1.0),   # no day-2 observation
    ]
    ev = spark.createDataFrame(rows, "ts timestamp, event_type string, value double")
    out = wow_change(ev).collect()
    assert len(out) == 1
    r = out[0]
    assert r["day"].isoformat() == "2024-01-08"
    assert r["value_sum"] == 15.0 and r["prev_week"] == 10.0
    assert r["pct_change"] == 0.5


def test_robust_outliers_flags_only_far_points(spark):
    from smartdatapipeline_spark.operators.anomaly import robust_outliers

    vals = [10.0, 11.0, 12.0, 13.0, 14.0, 1000.0]
    ev = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1), "m", v) for v in vals],
        "ts timestamp, event_type string, value double",
    )
    r = robust_outliers(ev).collect()[0]
    # n=6: median = rank ceil(3) = 3rd value = 12; deviations sorted
    # [0,1,1,2,2,988] → MAD = 3rd = 1; only 1000 exceeds med ± 3·MAD
    assert r["med"] == 12.0 and r["mad"] == 1.0
    assert r["n"] == 6 and r["n_outliers"] == 1


def test_ewma_daily_matches_python_recursion(spark):
    from smartdatapipeline_spark.operators.forecast import ewma_daily

    days = [(dt.datetime(2024, 1, 1 + i), "m", float(v)) for i, v in
            enumerate([10, 20, 5, 40, 15])]
    ev = spark.createDataFrame(days, "ts timestamp, event_type string, value double")
    r = ewma_daily(ev, alpha=0.25).collect()[0]
    s = 10.0
    for v in [20.0, 5.0, 40.0, 15.0]:
        s = 0.25 * v + 0.75 * s
    assert r["n_days"] == 5 and r["ewma"] == s  # bit-exact fold


def test_attribution_last_touch_window_and_direct(spark):
    from smartdatapipeline_spark.operators.behavior import attribution_last_touch

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def at(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    rows = [
        (1, 1, at(0), "view"),
        (2, 1, at(30), "purchase"),    # credited to view (30 min)
        (3, 2, at(0), "click"),
        (4, 2, at(90), "purchase"),    # click 90 min ago → direct (NULL)
        (5, 3, at(5), "purchase"),     # no prior touch → direct
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    got = {r["channel"]: r["n_conversions"]
           for r in attribution_last_touch(ev).collect()}
    assert got == {None: 2, "view": 1}


def test_rolling_correlation_perfect_and_inverse(spark):
    from smartdatapipeline_spark.operators.temporal import rolling_correlation

    # counts: view rises 1..5 per day, purchase = same → corr 1.0
    rows = []
    eid = 0
    for d in range(5):
        for _ in range(d + 1):
            for t in ("view", "purchase"):
                rows.append((eid, dt.datetime(2024, 1, 1 + d, 6), t))
                eid += 1
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string")
    out = rolling_correlation(ev, window_days=5).orderBy("day").collect()
    assert out[-1]["n_days"] == 5
    # same IEEE expression as the operator: num / (sqrt(dx)*sqrt(dy));
    # sqrt(50)*sqrt(50) is one ulp off 50, so "1.0" is 0.999...9
    import math

    num, dx = 50.0, 50.0
    assert out[-1]["corr"] == num / (math.sqrt(dx) * math.sqrt(dx))
    assert abs(out[-1]["corr"] - 1.0) < 1e-15
    assert out[0]["corr"] is None  # single-day window: zero variance


def test_bounce_rate_counts_single_event_sessions(spark):
    from smartdatapipeline_spark.operators.sessions import bounce_rate

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        (1, t0),                                   # u1 s1: bounce
        (1, t0 + dt.timedelta(hours=2)),           # u1 s2 (2 events)
        (1, t0 + dt.timedelta(hours=2, minutes=5)),
        (2, t0),                                   # u2 s1: bounce
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    r = bounce_rate(ev).collect()[0]
    assert r["n_sessions"] == 3 and r["n_bounces"] == 2
    assert r["bounce_rate"] == 2 / 3


def test_burn_rate_short_vs_long_window(spark):
    from smartdatapipeline_spark.operators.anomaly import burn_rate

    rows = []
    eid = 0
    # 7 quiet days: 10 events, 1 error each; day 8: 10 events, 5 errors
    for d in range(8):
        errs = 5 if d == 7 else 1
        for i in range(10):
            t = "error" if i < errs else "view"
            rows.append((eid, dt.datetime(2024, 1, 1 + d, 6), t))
            eid += 1
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string")
    out = {r["day"].isoformat(): r for r in burn_rate(ev).collect()}
    spike = out["2024-01-08"]
    assert spike["err_s"] == 5 and spike["n_s"] == 10
    assert spike["err_l"] == 11 and spike["n_l"] == 70   # days 2-8
    assert spike["burn_ratio"] == (5 / 10) / (11 / 70)
    quiet = out["2024-01-07"]
    assert quiet["burn_ratio"] == (1 / 10) / (7 / 70)    # = 1.0 baseline


def test_cep_pattern_guard_blocks_match(spark):
    from smartdatapipeline_spark.operators.behavior import cep_pattern

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def at(m):
        return t0 + dt.timedelta(minutes=m)

    rows = [
        (1, 1, at(0), "view"), (2, 1, at(5), "purchase"),        # match
        (3, 2, at(0), "view"), (4, 2, at(2), "error"),
        (5, 2, at(5), "purchase"),                               # guarded
        (6, 3, at(0), "view"), (7, 3, at(30), "purchase"),       # too late
        (8, 4, at(1), "purchase"),                               # no A
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    r = cep_pattern(ev, within_minutes=10).collect()[0]
    assert r["n_end_events"] == 4 and r["n_matched"] == 1
    assert r["match_rate"] == 0.25


def test_cohort_ltv_cumulative_curve(spark):
    from smartdatapipeline_spark.operators.behavior import cohort_ltv

    # one cohort (week of 2024-01-01): 2 users; week0 value 10, week1 value 4
    rows = [
        (1, dt.datetime(2024, 1, 2), 6.0),
        (2, dt.datetime(2024, 1, 3), 4.0),
        (1, dt.datetime(2024, 1, 9), 4.0),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = {r["week_offset"]: r for r in cohort_ltv(ev).collect()}
    assert out[0]["cohort_size"] == 2
    assert out[0]["week_value"] == 10.0 and out[0]["cum_value"] == 10.0
    assert out[1]["cum_value"] == 14.0
    assert out[1]["ltv_per_user"] == 7.0


def test_rfm_segments_quartiles(spark):
    from smartdatapipeline_spark.operators.behavior import rfm_segments

    rows = []
    eid = 0
    # 8 users: user u has u+1 events of value 10*(u+1), last on day u+1
    for u in range(8):
        for i in range(u + 1):
            rows.append((eid, u, dt.datetime(2024, 1, 1 + u), 10.0 * (u + 1)))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    got = {r["user_id"]: r for r in rfm_segments(ev).collect()}
    # user 7: most recent, most frequent, most valuable → 4-1-1? recency
    # tile 1 is MOST recent (asc order, recency 0 first) — user 7 has
    # recency 0 → r=1; top frequency/monetary → f=1, m=1
    assert got[7]["recency_days"] == 0
    assert got[7]["r"] == 1 and got[7]["f"] == 1 and got[7]["m"] == 1
    assert got[7]["segment"] == "1-1-1"
    # user 0: oldest, least frequent/valuable → bottom tile everywhere
    assert got[0]["r"] == 4 and got[0]["f"] == 4 and got[0]["m"] == 4
    assert got[0]["monetary"] == 10.0


def test_nation_share_sums_to_one_per_region(spark):
    import os as _os

    import __spark_entry__ as E

    out = E.q_nation_share(spark, "/root/testdata/sf0.001").collect()
    by_region = {}
    for r in out:
        by_region.setdefault(r["region"], []).append(r)
    for region, rows in by_region.items():
        assert abs(sum(r["region_share"] for r in rows) - 1.0) < 1e-12
        ranks = sorted(r["rank_in_region"] for r in rows)
        assert ranks == list(range(1, len(rows) + 1))


def test_weighted_median_vs_expansion(spark):
    from smartdatapipeline_spark.functions.sketch import weighted_median

    # weights expand to a multiset whose plain lower median must match
    rows = [("g", 10.0, 1), ("g", 20.0, 3), ("g", 30.0, 1)]
    # multiset: [10, 20, 20, 20, 30] → median 20
    df = spark.createDataFrame(rows, "g string, v double, w int")
    r = weighted_median(df, "v", "w", "g").collect()[0]
    assert r["total_w"] == 5 and r["wmedian"] == 20.0
    # heavy tail: one big weight dominates
    rows2 = [("h", 1.0, 1), ("h", 2.0, 1), ("h", 100.0, 10)]
    df2 = spark.createDataFrame(rows2, "g string, v double, w int")
    r2 = weighted_median(df2, "v", "w", "g").collect()[0]
    assert r2["wmedian"] == 100.0


def test_forward_fill_carries_last_observation(spark):
    from smartdatapipeline_spark.operators.temporal import forward_fill_daily

    rows = [
        (dt.datetime(2024, 1, 1), "m", 5.0),
        (dt.datetime(2024, 1, 4), "m", 9.0),   # 2-day gap before
    ]
    ev = spark.createDataFrame(rows, "ts timestamp, event_type string, value double")
    out = {r["day"].isoformat(): r for r in forward_fill_daily(ev).collect()}
    assert len(out) == 4
    assert out["2024-01-02"]["observed"] is None
    assert out["2024-01-02"]["value_filled"] == 5.0
    assert out["2024-01-02"]["is_imputed"] is True
    assert out["2024-01-03"]["value_filled"] == 5.0
    assert out["2024-01-04"]["value_filled"] == 9.0
    assert out["2024-01-04"]["is_imputed"] is False


def test_topn_with_other_collapses_tail(spark):
    from smartdatapipeline_spark.operators.reshape import topn_with_other

    rows = [(f"k{i}", float(100 - i)) for i in range(6) for _ in range(2)]
    df = spark.createDataFrame(rows, "key_col string, v double")
    out = {r["key"]: r for r in topn_with_other(df, "key_col", "v", n=3).collect()}
    assert set(out) == {"k0", "k1", "k2", "OTHER"}
    assert out["OTHER"]["n_keys"] == 3
    assert out["OTHER"]["measure"] == 2 * (97.0 + 96.0 + 95.0)
    assert out["k0"]["measure"] == 200.0


def test_double_charge_flags_close_repeats(spark):
    from smartdatapipeline_spark.operators.quality import double_charge_audit

    t0 = dt.datetime(2024, 1, 1)

    def at(s):
        return t0 + dt.timedelta(seconds=s)

    rows = [
        (1, 1, at(0), "pay", 9.99),
        (2, 1, at(60), "pay", 9.99),    # same amount, 60s later → suspect
        (3, 1, at(1000), "pay", 9.99),  # far later → clean
        (4, 1, at(70), "pay", 5.00),    # different amount → clean
        (5, 2, at(61), "pay", 9.99),    # different user → clean
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double"
    )
    r = double_charge_audit(ev).collect()[0]
    assert r["n_events"] == 5 and r["n_suspect"] == 1


def test_acf_daily_periodic_signal(spark):
    from smartdatapipeline_spark.operators.forecast import acf_daily

    # period-2 daily counts: 1,3,1,3,... → strong negative ACF at lag 1,
    # strong positive at lag 2
    rows = []
    eid = 0
    for d in range(14):
        for _ in range(1 if d % 2 == 0 else 3):
            rows.append((eid, dt.datetime(2024, 1, 1 + d, 6), "m"))
            eid += 1
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string")
    got = {r["lag"]: r for r in acf_daily(ev, max_lag=2).collect()}
    assert got[1]["n_pairs"] == 13 and got[2]["n_pairs"] == 12
    assert got[1]["acf"] < -0.9
    assert got[2]["acf"] > 0.9


def test_growth_accounting_decomposition(spark):
    from smartdatapipeline_spark.operators.behavior import growth_accounting

    def wk(n, u):  # user u active in week n (weeks start Mon 2024-01-01)
        return (u, dt.datetime(2024, 1, 1) + dt.timedelta(weeks=n, days=2))

    rows = [
        wk(0, 1), wk(0, 2),           # week 0: users 1,2 new
        wk(1, 1), wk(1, 3),           # week 1: 1 retained, 3 new, 2 churned
        wk(2, 2), wk(2, 3),           # week 2: 2 resurrected, 3 retained, 1 churned
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {r["week"].isoformat(): r for r in growth_accounting(ev).collect()}
    w1 = got["2024-01-08"]
    assert (w1["n_active"], w1["n_new"], w1["n_retained"],
            w1["n_resurrected"], w1["n_churned"]) == (2, 1, 1, 0, 1)
    w2 = got["2024-01-15"]
    assert (w2["n_active"], w2["n_new"], w2["n_retained"],
            w2["n_resurrected"], w2["n_churned"]) == (2, 0, 1, 1, 1)
    # identities hold everywhere
    for r in got.values():
        assert r["n_active"] == r["n_new"] + r["n_retained"] + r["n_resurrected"]


def test_max_drawdown_curve(spark):
    from smartdatapipeline_spark.operators.temporal import max_drawdown

    # daily sums: +10, +5, -12, +4 → cum 10,15,3,7; peak 10,15,15,15
    # → max drawdown 12
    vals = [10.0, 5.0, -12.0, 4.0]
    ev = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1 + i, 6), "m", v) for i, v in enumerate(vals)],
        "ts timestamp, event_type string, value double",
    )
    r = max_drawdown(ev).collect()[0]
    assert r["n_days"] == 4
    assert r["peak_value"] == 15.0
    assert r["max_drawdown"] == 12.0


def test_audience_overlap_set_algebra(spark):
    from smartdatapipeline_spark.operators.behavior import audience_overlap

    rows = [(1, "a"), (2, "a"), (3, "a"), (1, "b"), (2, "b"), (4, "c")]
    ev = spark.createDataFrame(
        [(u, t, dt.datetime(2024, 1, 1)) for u, t in rows],
        "user_id long, event_type string, ts timestamp",
    )
    got = {(r["type_a"], r["type_b"]): r for r in audience_overlap(ev).collect()}
    ab = got[("a", "b")]
    assert (ab["n_a"], ab["n_b"], ab["n_both"], ab["n_either"]) == (3, 2, 2, 3)
    assert ab["jaccard"] == 2 / 3
    assert ("a", "c") not in got


def test_daily_percentiles_rank_convention(spark):
    from smartdatapipeline_spark.operators.kpi import daily_value_percentiles

    vals = [float(v) for v in range(1, 21)]  # one day, 20 values
    ev = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1, 6), "m", v) for v in vals],
        "ts timestamp, event_type string, value double",
    )
    got = {r["q"]: r["value"] for r in daily_value_percentiles(ev).collect()}
    assert got[0.5] == 10.0     # ceil(0.5*20) = 10th
    assert got[0.95] == 19.0    # ceil(0.95*20) = 19th


def test_session_stats_means(spark):
    from smartdatapipeline_spark.operators.sessions import session_stats

    t0 = dt.datetime(2024, 1, 1, 10)
    rows = [
        (1, t0), (1, t0 + dt.timedelta(minutes=10)),   # 600 s, 2 events
        (2, t0),                                       # 0 s, 1 event
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    r = session_stats(ev).collect()[0]
    assert r["n_sessions"] == 2
    assert r["avg_duration_s"] == 300.0
    assert r["avg_events"] == 1.5


def test_seasonal_residual_outliers_flags_spike(spark):
    from smartdatapipeline_spark.operators.anomaly import (
        seasonal_residual_outliers,
    )

    rows = []
    eid = 0
    # 4 full weeks of a flat 5-events/day series, then one 50-event day
    for d in range(28):
        for _ in range(5):
            rows.append((eid, dt.datetime(2024, 1, 1 + d, 6), "m")); eid += 1
    for _ in range(50):
        rows.append((eid, dt.datetime(2024, 1, 29, 6), "m")); eid += 1
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string")
    r = seasonal_residual_outliers(ev).collect()[0]
    assert r["n_days"] == 29
    assert r["n_outliers"] == 1  # only the spike day beats 3 sigma


def test_theilsen_ignores_outlier_day(spark):
    from smartdatapipeline_spark.operators.forecast import theilsen_trend

    # clean slope 2/day with one wrecked day — Theil-Sen stays at 2
    vals = [2.0 * x for x in range(10)]
    vals[5] = 1000.0
    ev = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1 + i), "m", v) for i, v in enumerate(vals)],
        "ts timestamp, event_type string, value double",
    )
    r = theilsen_trend(ev).collect()[0]
    assert r["n_days"] == 10 and r["n_pairs"] == 45
    assert r["slope"] == 2.0  # the outlier's slopes sit in the tails


def test_attribution_linear_splits_credit(spark):
    from smartdatapipeline_spark.operators.behavior import attribution_linear

    t0 = dt.datetime(2024, 1, 1, 12)

    def at(m):
        return t0 + dt.timedelta(minutes=m)

    rows = [
        (1, 1, at(0), "view"),
        (2, 1, at(10), "click"),
        (3, 1, at(30), "purchase"),   # 1 view + 1 click → 0.5 each
        (4, 2, at(0), "view"),
        (5, 2, at(5), "view"),
        (6, 2, at(20), "purchase"),   # 2 views → view gets 1.0
        (7, 3, at(0), "purchase"),    # nothing before → direct
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    got = {r["channel"]: r for r in attribution_linear(ev).collect()}
    assert got["view"]["total_credit"] == 0.5 + 1.0
    assert got["click"]["total_credit"] == 0.5
    assert got[None]["n_touched_conversions"] == 1
    assert got[None]["total_credit"] == 1.0


def test_mix_shift_contributions_sum_to_one(spark):
    from smartdatapipeline_spark.operators.metrics import mix_shift

    def wk(n, m, v):
        return (dt.datetime(2024, 1, 1) + dt.timedelta(weeks=n, days=1), m, v)

    rows = [
        wk(0, "a", 10.0), wk(0, "b", 20.0),
        wk(1, "a", 16.0), wk(1, "b", 22.0),   # Δ total = +8 (a +6, b +2)
    ]
    ev = spark.createDataFrame(rows, "ts timestamp, event_type string, value double")
    out = {r["metric"]: r for r in mix_shift(ev).collect()}
    assert out["a"]["delta"] == 6.0 and out["b"]["delta"] == 2.0
    assert out["a"]["total_delta"] == 8.0
    assert out["a"]["contribution"] == 0.75
    assert out["a"]["contribution"] + out["b"]["contribution"] == 1.0


def test_benford_audit_digits_and_chi2(spark):
    from smartdatapipeline_spark.operators.quality import (
        BENFORD_P,
        benford_audit,
    )

    # values with known leading digits incl. sub-1 magnitudes
    vals = [1.5, 19.0, 0.02, 2.5, 300.0, 0.0, -45.0]  # digits 1,1,2,2,3,-,4
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = {r["digit"]: r for r in benford_audit(df, "v").collect()}
    assert {d: r["n"] for d, r in got.items()} == {1: 2, 2: 2, 3: 1, 4: 1}
    assert got[1]["share"] == 2 / 6
    assert got[1]["expected_share"] == BENFORD_P[1]
    # chi2 equals the digit-ordered python fold of the same terms
    tot = 6.0
    acc = 0.0
    for d, n in ((1, 2), (2, 2), (3, 1), (4, 1)):
        e = BENFORD_P[d] * tot
        acc += (n - e) * (n - e) / e
    assert got[1]["chi2"] == acc


def test_rfm_bounds_equals_ntile_on_distinct_metrics(spark):
    """r10 VERDICT #3: the billion-user threshold-scoring path must
    equal NTILE wherever boundary values are unique — with all-distinct
    per-user metrics that means EVERYWHERE, for every column."""
    from smartdatapipeline_spark.operators.behavior import rfm_segments

    rows = []
    eid = 0
    # 11 users (non-divisible by 4 → uneven tile sizes), all metrics
    # pairwise distinct: user u has u+1 events, distinct values, last
    # event on a distinct day
    for u in range(11):
        for i in range(u + 1):
            rows.append((eid, u, dt.datetime(2024, 1, 1 + u, i), 10.0 * (u + 1) + i))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    ntile = sorted(map(tuple, rfm_segments(ev, method="ntile").collect()))
    bounds = sorted(map(tuple, rfm_segments(ev, method="bounds").collect()))
    assert ntile == bounds


def test_rfm_bounds_ties_take_one_tile(spark):
    """Tied metric values land in ONE tile under bounds scoring
    (value-deterministic), where NTILE splits them by user-id
    tie-break."""
    from smartdatapipeline_spark.operators.behavior import rfm_segments

    # 8 users, ALL with identical frequency (1) and monetary (10.0),
    # distinct recency days
    rows = [(u, u, dt.datetime(2024, 1, 1 + u), 10.0) for u in range(8)]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    got = rfm_segments(ev, method="bounds").collect()
    assert len({r["f"] for r in got}) == 1
    assert len({r["m"] for r in got}) == 1
    # recency is distinct → still a full 4-tile spread
    assert sorted({r["r"] for r in got}) == [1, 2, 3, 4]
