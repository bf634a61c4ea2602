"""Golden-value tests for the daily KPI operator, mirroring the
reference's engine tests (tests/kpi_metrics_engine/test_kpi.py:36-68,
test_kpi_variants.py:66-85)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from smartdatapipeline_spark.operators import kpi as K


def _mk_events(spark, rows):
    return spark.createDataFrame(
        [Row(source_id=r[0], ts=r[1], metric=r[2], value=float(r[3]), rid=i)
         for i, r in enumerate(rows)]
    )


def test_kpi_golden_sum_avg_count(spark):
    """Reference golden: 3 rows 10/20/30 yesterday + 40 today ⇒
    yesterday sum=60 avg=20 count=3 (test_kpi.py:36-68)."""
    y = dt.datetime(2025, 1, 1, 10, 0)
    t = dt.datetime(2025, 1, 2, 9, 0)
    ev = _mk_events(
        spark,
        [(1, y, "m", 10), (1, y.replace(hour=11), "m", 20),
         (1, y.replace(hour=12), "m", 30), (1, t, "m", 40)],
    )
    out = {r["metric_date"]: r for r in K.run_daily_kpis(ev).collect()}
    assert out[dt.date(2025, 1, 1)]["value_sum"] == 60.0
    assert out[dt.date(2025, 1, 1)]["value_avg"] == 20.0
    assert out[dt.date(2025, 1, 1)]["value_count"] == 3
    assert out[dt.date(2025, 1, 2)]["value_sum"] == 40.0


def test_kpi_distinct_equals_count_for_unique_field(spark):
    """distinct(id) == count per day when ids are unique
    (test_kpi_variants.py:66-85)."""
    base = dt.datetime(2025, 3, 1)
    rows = [(1, base + dt.timedelta(minutes=i), "m", 1.0) for i in range(10)]
    ev = _mk_events(spark, rows)
    out = K.run_daily_kpis(ev, distinct_field="rid").collect()
    assert len(out) == 1
    assert out[0]["value_distinct"] == out[0]["value_count"] == 10


def test_half_open_window_excludes_next_day(spark):
    """end_date is an inclusive date ⇒ exclusive next-midnight ts bound
    (reference services/kpi.py:10-11,37-38)."""
    ev = _mk_events(
        spark,
        [(1, dt.datetime(2025, 1, 1, 23, 59, 59), "m", 1),
         (1, dt.datetime(2025, 1, 2, 0, 0, 0), "m", 1)],
    )
    out = K.run_daily_kpis(ev, start_date="2025-01-01", end_date="2025-01-01").collect()
    assert len(out) == 1 and out[0]["value_count"] == 1


def test_avg_is_sum_over_nullif_count(spark):
    ev = _mk_events(spark, [(1, dt.datetime(2025, 1, 1), "m", 7)])
    row = K.run_daily_kpis(ev).collect()[0]
    assert row["value_avg"] == row["value_sum"] / row["value_count"]


def test_metric_names_sorted(spark):
    ev = _mk_events(
        spark,
        [(1, dt.datetime(2025, 1, 1), "b", 1), (1, dt.datetime(2025, 1, 1), "a", 1),
         (1, dt.datetime(2025, 1, 2), "b", 2)],
    )
    names = [r["metric"] for r in K.metric_names(ev).collect()]
    assert names == ["a", "b"]


def test_approx_distinct_option_close_to_exact(spark):
    """A2 scale option: HLL++ approx distinct within rsd of the exact
    count (exact countDistinct stays the default — tests pin equality)."""
    ev = _mk_events(
        spark,
        [(1, dt.datetime(2025, 1, 1, h, m), "m", 1) for h in range(10) for m in range(30)],
    )
    exact = K.run_daily_kpis(ev, distinct_field="rid").collect()[0]["value_distinct"]
    approx = K.run_daily_kpis(ev, distinct_field="rid", approx_distinct=True).collect()[0][
        "value_distinct"
    ]
    assert exact == 300
    assert abs(approx - exact) / exact < 0.1


def test_approx_distinct_conformance_on_parquet(spark):
    """The A2 scale path (HLL++ via approx_count_distinct) must track
    the exact distinct within its documented error envelope on real
    data — pins that swapping exact→approx at 100 TB changes cost, not
    correctness class. Default rsd=0.05; assert 3x slack."""
    from smartdatapipeline_spark.operators.kpi import run_daily_kpis
    from smartdatapipeline_spark.session import read_events

    ev = read_events(spark, "/root/testdata/sf0.01").withColumnRenamed(
        "event_type", "metric"
    )
    exact = run_daily_kpis(ev, distinct_field="user_id", source_col=None)
    approx = run_daily_kpis(
        ev, distinct_field="user_id", source_col=None, approx_distinct=True
    )
    key = lambda r: (r["metric_date"], r["metric"])  # noqa: E731
    e = {key(r): r["value_distinct"] for r in exact.collect()}
    a = {key(r): r["value_distinct"] for r in approx.collect()}
    assert set(e) == set(a)
    for k, ve in e.items():
        assert abs(a[k] - ve) <= max(0.15 * ve, 2), (k, ve, a[k])


def test_hll_sketch_merge_equals_direct(spark):
    """Mergeable distinct sketches (hll_sketch_agg/hll_union_agg): the
    union of per-day sketches must estimate EXACTLY what one sketch
    over all rows estimates — same algorithm, same deterministic
    registers — which is the property that lets 1000 executors build
    daily sketches and a coordinator merge them at 100 TB."""
    from pyspark.sql import functions as F

    from smartdatapipeline_spark.session import read_events

    ev = read_events(spark, "/root/testdata/sf0.01").select(
        F.to_date("ts").alias("d"), "user_id"
    )
    direct = ev.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est")
    ).first()["est"]
    merged = (
        ev.groupBy("d")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .first()["est"]
    )
    assert merged == direct
    exact = ev.select("user_id").distinct().count()
    assert abs(direct - exact) <= max(0.05 * exact, 2)


def test_funnel_strict_ordering_and_horizon(spark):
    """A click BEFORE the first view doesn't advance the funnel; a
    purchase outside the 7-day horizon doesn't convert."""
    import datetime as dt

    from smartdatapipeline_spark.operators.behavior import funnel

    rows = [
        # u1: full ordered funnel inside horizon
        (1, "view", "2025-01-01T00:00:00"), (1, "click", "2025-01-02T00:00:00"),
        (1, "purchase", "2025-01-03T00:00:00"),
        # u2: click precedes the first view -> stuck at view
        (2, "click", "2025-01-01T00:00:00"), (2, "view", "2025-01-02T00:00:00"),
        # u3: purchase beyond view+7d -> converts click only
        (3, "view", "2025-01-01T00:00:00"), (3, "click", "2025-01-02T00:00:00"),
        (3, "purchase", "2025-01-20T00:00:00"),
    ]
    ev = spark.createDataFrame(
        [(u, t, dt.datetime.fromisoformat(s)) for u, t, s in rows],
        "user_id long, event_type string, ts timestamp",
    )
    out = {r["step"]: r for r in funnel(ev).collect()}
    assert out["view"]["n_users"] == 3
    assert out["click"]["n_users"] == 2  # u1, u3
    assert out["purchase"]["n_users"] == 1  # u1 only
    assert out["purchase"]["share"] == 1 / 3


def test_retention_cohorts_triangle(spark):
    import datetime as dt

    from smartdatapipeline_spark.operators.behavior import retention_cohorts

    rows = [
        (1, "2025-01-06T10:00:00"), (1, "2025-01-14T10:00:00"),  # w0, w1
        (2, "2025-01-07T10:00:00"),                               # w0 only
        (3, "2025-01-13T10:00:00"), (3, "2025-01-27T10:00:00"),  # next cohort, w0+w2
    ]
    ev = spark.createDataFrame(
        [(u, dt.datetime.fromisoformat(s)) for u, s in rows],
        "user_id long, ts timestamp",
    )
    out = {
        (r["cohort_week"].isoformat(), r["week_offset"]): (r["n_active"], r["cohort_size"], r["retention"])
        for r in retention_cohorts(ev).collect()
    }
    assert out[("2025-01-06", 0)] == (2, 2, 1.0)
    assert out[("2025-01-06", 1)] == (1, 2, 0.5)
    assert out[("2025-01-13", 0)] == (1, 1, 1.0)
    assert out[("2025-01-13", 2)] == (1, 1, 1.0)


def test_expectations_single_pass_and_thresholds(spark):
    from pyspark.sql import functions as F

    from smartdatapipeline_spark.operators import quality as Q

    df = spark.createDataFrame(
        [(1, 5.0, "ok"), (2, None, "ok"), (None, 50.0, "BAD"), (4, 7.0, "ok")],
        "id long, v double, tag string",
    )
    out = {r["check"]: r for r in Q.check_expectations(
        df,
        [
            Q.not_null("id"),
            Q.in_range("v", 0.0, 10.0),
            Q.matches("tag", "^[a-z]+$"),
            Q.Expectation("soft_null(v)", F.col("v").isNotNull(), 0.5),
        ],
    ).collect()}
    assert (out["not_null(id)"]["n_violations"], out["not_null(id)"]["passed"]) == (1, False)
    # NULL v counts as a violation of in_range; 50.0 out of range -> 2
    assert out["in_range(v,0.0,10.0)"]["n_violations"] == 2
    assert out["matches(tag)"]["n_violations"] == 1
    # soft threshold: 1/4 nulls <= 50% tolerated -> passes
    assert out["soft_null(v)"]["passed"] is True

    uniq = Q.check_unique(
        spark.createDataFrame([(1,), (1,), (2,)], "k long"), ["k"]
    ).collect()[0]
    assert (uniq["n_rows"], uniq["n_violations"], uniq["passed"]) == (3, 1, False)


def test_scd2_intervals_and_current_flag(spark):
    import datetime as dt

    from smartdatapipeline_spark.operators.quality import scd2_build

    upd = spark.createDataFrame(
        [(1, dt.datetime(2025, 1, 1), 10.0),
         (1, dt.datetime(2025, 2, 1), 20.0),
         (2, dt.datetime(2025, 1, 15), 5.0)],
        "source_id long, uts timestamp, v double",
    )
    out = sorted(
        scd2_build(upd).collect(), key=lambda r: (r["source_id"], r["uts"])
    )
    assert out[0]["effective_to"] == dt.datetime(2025, 2, 1)
    assert out[0]["is_current"] is False
    assert out[1]["effective_to"] is None and out[1]["is_current"] is True
    assert out[2]["is_current"] is True


def test_distribution_drift_metrics(spark):
    from smartdatapipeline_spark.operators.quality import distribution_drift

    base = spark.createDataFrame([("a",)] * 50 + [("b",)] * 50, "k string")
    # current: a shrank to 25%, b grew, c appeared
    cur = spark.createDataFrame(
        [("a",)] * 25 + [("b",)] * 60 + [("c",)] * 15, "k string"
    )
    out = {r["category"]: r for r in distribution_drift(base, cur, "k").collect()}
    assert out["c"]["n_baseline"] == 0 and out["c"]["p_current"] == 0.15
    # TV = (|.5-.25| + |.5-.6| + |0-.15|)/2 = 0.25
    assert abs(out["a"]["tv_distance"] - 0.25) < 1e-12
    # chi2 = (25-50)^2/50 + (60-50)^2/50 + c-term 0 (e=0) = 12.5+2
    assert abs(out["a"]["chi2"] - 14.5) < 1e-12
