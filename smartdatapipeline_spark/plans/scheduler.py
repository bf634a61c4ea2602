"""Scheduler parity layer (SURVEY §2.8).

The reference registers three APScheduler cron jobs whose bodies are
logging stubs (backend/app/scheduler/setup.py:22-77,
backend/app/scheduler/jobs.py:7-51):

- nightly KPI rollup, 02:15
- weekly forecast retrain, Sun 03:30
- daily housekeeping, 04:00

Parity is the registry + trigger wiring, not new computation: each job
maps to an engine entry point (A1 daily KPIs / M1 forecast). On a real
cluster these are submitted by any external scheduler (Airflow, cron,
Databricks jobs); this module keeps the same three-job contract and
runs them in-process for tests.
"""

from __future__ import annotations

import logging
from collections.abc import Callable
from dataclasses import dataclass, field

logger = logging.getLogger(__name__)


@dataclass
class Job:
    job_id: str
    cron: str  # standard 5-field cron expression
    fn: Callable[..., object]
    description: str = ""


@dataclass
class Scheduler:
    """Minimal job registry mirroring the reference's setup.py contract."""

    jobs: dict[str, Job] = field(default_factory=dict)

    def register(self, job_id: str, cron: str, fn: Callable[..., object], description: str = "") -> Job:
        job = Job(job_id, cron, fn, description)
        self.jobs[job_id] = job
        logger.info("scheduler.registered %s (%s)", job_id, cron)
        return job

    def run(self, job_id: str, *args, **kwargs):
        """Fire a job immediately (tests / external trigger integration)."""
        return self.jobs[job_id].fn(*args, **kwargs)


def snapshot_maintenance_job(
    spark,
    roots: list[str],
    target_batches: int = 4,
    keep_versions: int = 3,
    grace_sec: float = 86_400.0,
    log_keep_versions: int = 100,
    small_only_rows: int | None = None,
    zorder_by: tuple | None = None,
    purge_dv_above_positions: int = 100_000,
    purge_dv_above_covered_files: int = 16,
) -> Callable[[], dict]:
    """The nightly snapshot-table maintenance body the store's module
    docstring promises (sources/snapstore.py; r10 VERDICT #5): OPTIMIZE
    + VACUUM + LOG VACUUM per table. Compaction bounds the live-file
    count (the manifest ceiling measured in
    tools/snapstore_ceiling_probe.py — scan listing cost grows with
    files, so a per-batch append pattern needs this nightly —
    ``small_only_rows`` makes it PARTIAL bin-packing so the nightly
    rewrite costs O(new small files), not O(table), and combined with
    ``zorder_by`` (r13) it is the INCREMENTAL z-order pass — the day's
    small batches are re-clustered onto the recorded lattice while the
    big z-batches stay untouched, so a z-ordered production table gets
    O(day) nightly maintenance too); vacuum
    reclaims overwritten batches past time-travel retention and
    crashed-writer orphans; ``vacuum_log`` (r12) bounds the commit log
    itself so a year of micro-batches doesn't leave O(10⁵) commit
    files for every history walk. A compact losing a race to a
    concurrent writer raises ConcurrentWriteError — the right behavior
    for maintenance (retry next night / next run), so it is caught and
    reported, never fatal.

    DV-debt trigger (r14; r13 VERDICT #3): after the compact pass, the
    job reads ``dv_debt`` (a pure manifest read) and fires
    ``purge_deletion_vectors`` — the targeted REORG that rewrites ONLY
    DV-covered files — when live positions exceed
    ``purge_dv_above_positions`` (default 100k: the per-read anti-join
    side stays broadcast-small well under _DV_BROADCAST_MAX_POS) or
    covered files exceed ``purge_dv_above_covered_files`` (default 16:
    caps the purge at a bounded number of single-file rewrite jobs and
    bounds how many files every read must join against). Below both
    thresholds the debt rides to the next night — a partial compact may
    have already folded the small-file sidecars anyway."""
    from smartdatapipeline_spark.sources import snapstore as SS

    def run() -> dict:
        results: dict[str, dict] = {}
        for root in roots:
            entry: dict = {}
            try:
                entry["compacted_to_version"] = SS.compact(
                    spark, root, target_batches=target_batches,
                    small_only_rows=small_only_rows, zorder_by=zorder_by,
                )
            except SS.ConcurrentWriteError as exc:
                entry["compact_conflict"] = str(exc)
            debt = SS.dv_debt(root)
            entry["dv_debt"] = debt
            if (
                debt["positions"] > purge_dv_above_positions
                or debt["covered_files"] > purge_dv_above_covered_files
            ):
                try:
                    entry["dv_purged_to_version"] = SS.purge_deletion_vectors(
                        spark, root
                    )
                except SS.ConcurrentWriteError as exc:
                    entry["dv_purge_conflict"] = str(exc)
            entry["vacuumed"] = len(
                SS.vacuum(root, keep_versions=keep_versions, grace_sec=grace_sec)
            )
            entry["log_vacuumed"] = len(
                SS.vacuum_log(root, keep_versions=log_keep_versions)
            )
            results[root] = entry
        logger.info("job.snapshot_maintenance %s", results)
        return results

    return run


def cdc_refresh_job(spark, silver_root: str, gold_root: str) -> Callable[[], dict]:
    """The nightly-KPI job body, CDC-correct (r11): refresh gold from
    silver's change feed — only the day partitions new commits touched,
    via `operators/pipeline.refresh_gold_from_changes`. Idempotent (a
    re-fired job replays its keyed commit) and proportional to the
    night's ingest, not the table. With this, all three reference cron
    slots (backend/app/scheduler/setup.py:22-77) have real engine
    bodies: nightly KPIs = CDC refresh, housekeeping = snapshot
    maintenance, weekly retrain = the forecast entry point."""
    from smartdatapipeline_spark.operators.pipeline import (
        refresh_gold_from_changes,
    )

    def run() -> dict:
        out = refresh_gold_from_changes(spark, silver_root, gold_root)
        logger.info("job.nightly_kpis cdc_refresh %s", out)
        return out

    return run


def default_scheduler(run_kpis: Callable[..., object] | None = None,
                      run_forecast: Callable[..., object] | None = None,
                      housekeeping: Callable[..., object] | None = None) -> Scheduler:
    """The reference's three jobs (setup.py:22-77) wired to engine entry
    points; bodies default to logging stubs exactly like jobs.py:7-51."""
    s = Scheduler()
    s.register(
        "nightly_kpis",
        "15 2 * * *",
        run_kpis or (lambda: logger.info("job.nightly_kpis (stub)")),
        "nightly KPI rollup (A1)",
    )
    s.register(
        "weekly_retrain",
        "30 3 * * 0",
        run_forecast or (lambda: logger.info("job.weekly_retrain (stub)")),
        "weekly forecast retrain (M1)",
    )
    s.register(
        "daily_housekeeping",
        "0 4 * * *",
        housekeeping or (lambda: logger.info("job.daily_housekeeping (stub)")),
        "daily housekeeping",
    )
    return s
