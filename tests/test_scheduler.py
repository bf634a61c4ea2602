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
