"""Physical-plan regression gates: the properties PLANS.md audits,
pinned in CI for a representative query per family — a plan that loses
its pushdown/broadcast/scan discipline fails here instead of waiting
for the next manual audit. explain() only — nothing executes."""

from __future__ import annotations

import re

import pytest

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return E.queries()[name](spark, SF)._jdf.queryExecution().explainString(mode)


def _scans(plan: str) -> int:
    return len(re.findall(r"^\(\d+\) Scan ", plan, re.M))


def _shuffles(plan: str) -> int:
    return len(re.findall(r"^\(\d+\) Exchange", plan, re.M))


def test_kpi_daily_scan_discipline(spark):
    p = _plan(spark, "kpi_daily")
    assert _scans(p) == 1
    # column pruning: the events scan must not read the props payload
    m = re.search(r"ReadSchema: struct<([^>]*)>", p)
    assert m and "props" not in m.group(1)


def test_window_filter_pushdown(spark):
    p = _plan(spark, "kpi_daily_window")
    assert "PushedFilters: [" in p and "PushedFilters: []" not in p


def test_revenue_by_nation_broadcasts_dims(spark):
    p = _plan(spark, "revenue_by_nation")
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_top_customers_no_full_sort(spark):
    p = _plan(spark, "top_customers")
    assert "TakeOrderedAndProject" in p


def test_acf_daily_stays_single_derivation(spark):
    """Round-3 VERDICT #4 regression gate: 14 scans / 35 shuffles →
    must stay ≤2 / ≤6."""
    p = _plan(spark, "acf_daily")
    assert _scans(p) <= 2
    assert _shuffles(p) <= 6


def test_interval_overlap_no_nested_loop(spark):
    """The whole point of the bucket-explode formulation: the
    interval×interval join must be an equi-join, not a nested loop over
    the pair space (broadcast-NL of the tiny top-4 side is fine only if
    the join CONDITION is the bucket equi-key — assert no NL at all)."""
    p = _plan(spark, "interval_overlap")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_text_quality_scan_prunes_to_text(spark):
    p = _plan(spark, "text_quality")
    m = re.search(r"ReadSchema: struct<([^>]*)>", p)
    assert m is not None
    cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert "text" in cols
    assert "source" not in cols  # untouched columns never reach the scan


def test_bucketed_gold_join_has_no_exchange(spark, tmp_path):
    """S11 scale variant: bucketed gold ⋈ bucketed gold on the bucket
    key must plan WITHOUT a shuffle on either side (the bucketing IS
    the exchange, amortized at write time)."""
    from pyspark.sql import functions as F

    from smartdatapipeline_spark.sources.sinks import write_bucketed_gold
    from smartdatapipeline_spark.operators.kpi import run_daily_kpis
    from smartdatapipeline_spark.session import read_events

    gold = run_daily_kpis(
        read_events(spark, SF).select(
            "ts", F.col("event_type").alias("metric"), "value"
        ),
        metric_col="metric",
        source_col=None,
    )
    name = "t_plan_gold_bucketed"
    write_bucketed_gold(gold, name, buckets=4)
    try:
        t = spark.table(name)
        j = t.alias("a").join(t.alias("b"), ["metric"]).groupBy("metric").count()
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        p = j._jdf.queryExecution().explainString(mode)
        assert "Exchange hashpartitioning" not in p
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
