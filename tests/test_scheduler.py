"""Scheduler parity tests (SURVEY §2.8).

The reference registers exactly three cron jobs with logging-stub bodies
(backend/app/scheduler/setup.py:22-77, backend/app/scheduler/jobs.py:7-51);
the test mirrors backend/tests/scheduler/test_scheduler_registration.py:
registration contract + manual fire.
"""

from smartdatapipeline_spark.plans.scheduler import default_scheduler


def test_three_jobs_registered_with_reference_crons():
    s = default_scheduler()
    assert set(s.jobs) == {"nightly_kpis", "weekly_retrain", "daily_housekeeping"}
    assert s.jobs["nightly_kpis"].cron == "15 2 * * *"
    assert s.jobs["weekly_retrain"].cron == "30 3 * * 0"
    assert s.jobs["daily_housekeeping"].cron == "0 4 * * *"


def test_jobs_fire_wired_callables():
    calls = []
    s = default_scheduler(
        run_kpis=lambda: calls.append("kpi") or "kpi-result",
        run_forecast=lambda: calls.append("fc"),
    )
    assert s.run("nightly_kpis") == "kpi-result"
    s.run("weekly_retrain")
    s.run("daily_housekeeping")  # default stub: must not raise
    assert calls == ["kpi", "fc"]


def test_snapshot_maintenance_job_compacts_and_vacuums(spark, tmp_path):
    """The housekeeping slot wired to real work (r10 VERDICT #5): the
    snapshot_maintenance_job body compacts the table's live files to
    the target and vacuums unreferenced batches, contents unchanged;
    registered through the standard 3-job registry."""
    from smartdatapipeline_spark.plans.scheduler import (
        default_scheduler,
        snapshot_maintenance_job,
    )
    from smartdatapipeline_spark.sources import snapstore as SS

    root = str(tmp_path / "t")
    for i in range(6):
        SS.append(
            spark.createDataFrame(
                [(f"2024-01-{i + 1:02d}", i)], "d string, v long"
            ),
            root,
            "d",
        )
    before = sorted((r["d"], r["v"]) for r in SS.read_table(spark, root).collect())
    n_files_before = len(SS._snapshot(root)[1])
    assert n_files_before == 6

    s = default_scheduler(
        housekeeping=snapshot_maintenance_job(
            spark, [root], target_batches=1, keep_versions=1, grace_sec=0.0
        )
    )
    out = s.run("daily_housekeeping")
    assert out[root]["compacted_to_version"] == 7
    assert out[root]["vacuumed"] >= 6  # the six pre-compaction batches
    assert len(SS._snapshot(root)[1]) == 1
    after = sorted((r["d"], r["v"]) for r in SS.read_table(spark, root).collect())
    assert after == before


def test_nightly_kpis_job_runs_cdc_refresh(spark, tmp_path):
    """All three reference cron slots now carry real engine bodies:
    nightly_kpis = the CDC refresh — fired twice, the second run is a
    no-op because the commit log already records the consumed silver
    version."""
    import datetime as dt

    from pyspark.sql import functions as F

    from smartdatapipeline_spark.plans.scheduler import (
        cdc_refresh_job,
        default_scheduler,
    )
    from smartdatapipeline_spark.sources import snapstore as SS

    silver = str(tmp_path / "silver")
    gold = str(tmp_path / "gold")
    batch = spark.createDataFrame(
        [(dt.datetime(2025, 1, 1, 12), "m", 10.0, 1)],
        "ts timestamp, metric string, value double, source_id int",
    ).withColumn("event_date", F.to_date("ts"))
    SS.append(batch, silver, "event_date")

    s = default_scheduler(run_kpis=cdc_refresh_job(spark, silver, gold))
    out1 = s.run("nightly_kpis")
    assert out1["refreshed_days"] == 1 and out1["silver_version"] == 1
    rows = SS.read_table(spark, gold).collect()
    assert len(rows) == 1 and rows[0]["value_sum"] == 10.0
    out2 = s.run("nightly_kpis")
    assert out2["refreshed_days"] == 0  # nothing new — no-op
