"""LogStore seam + fault injection (r13; r12 VERDICT #3).

The commit protocol's object-store primitives (claim / list / read)
live behind ``snapstore.LogStore``; production uses the local-link
implementation. These tests swap in a fault-injecting double and drive
the optimistic-commit loop through failure modes the hardcoded
``os.link`` path could never exhibit:

- SPURIOUS claim failure (the S3 conditional-PUT ambiguity: the store
  says "lost" but nothing landed) — the loop must retry the same
  version and land exactly once.
- LOST RACE (a competitor's commit appears between snapshot and claim)
  — the loop must rescan conflicts against the interloper and either
  recompute (disjoint) or raise (overlapping).
- LIST-AFTER-WRITE LAG (a LIST that omits the newest committed object,
  the classic eventually-consistent object-store hazard) — a writer
  planning against the stale listing must not overwrite or skip a
  version once the lag clears.
"""
from __future__ import annotations

import json
import os
import time
import uuid

import pytest
from pyspark.sql import functions as F

from smartdatapipeline_spark.sources import snapstore as SS


def _frame(spark, rows):
    return spark.createDataFrame(
        [(i, d, float(v)) for i, d, v in rows], "id int, day string, value double"
    )


def _rows(df):
    return sorted(map(tuple, df.select("id", "day", "value").collect()))


class FaultyLogStore(SS.LogStore):
    """Wraps the real local store, injecting scripted faults."""

    def __init__(self):
        self.inner = SS.LocalLinkLogStore()
        self.spurious_failures = 0      # claim: say "lost" without writing
        self.lag_hide_newest = 0        # list: omit newest commit N times
        self.competitor_payload = None  # claim: land THIS first, then lose
        self.claims = 0

    def try_claim(self, log_dir, name, data):
        self.claims += 1
        if self.competitor_payload is not None:
            payload, self.competitor_payload = self.competitor_payload, None
            assert self.inner.try_claim(
                log_dir, name, json.dumps(payload).encode()
            )
            return False  # the competitor won this exact version
        if self.spurious_failures > 0:
            self.spurious_failures -= 1
            return False  # nothing landed — pure CAS ambiguity
        return self.inner.try_claim(log_dir, name, data)

    def list_names(self, log_dir):
        names = self.inner.list_names(log_dir)
        if self.lag_hide_newest > 0:
            self.lag_hide_newest -= 1
            commits = sorted(
                n for n in names
                if n.endswith(".json") and not n.startswith(".tmp-")
                and "checkpoint" not in n
            )
            if commits:
                names = [n for n in names if n != commits[-1]]
        return names

    def read(self, path):
        return self.inner.read(path)


@pytest.fixture()
def faulty():
    store = FaultyLogStore()
    prev = SS.set_log_store(store)
    yield store
    SS.set_log_store(prev)


def test_spurious_claim_failure_retries_same_version(spark, tmp_path, faulty):
    root = str(tmp_path / "t")
    SS.append(_frame(spark, [(1, "d1", 10)]), root, "day")
    faulty.spurious_failures = 3
    v = SS.append(_frame(spark, [(2, "d2", 20)]), root, "day")
    assert v == 2  # no version skipped, landed exactly once
    assert faulty.claims >= 4
    assert _rows(SS.read_table(spark, root)) == [(1, "d1", 10.0), (2, "d2", 20.0)]
    assert [h["version"] for h in SS.history(root)] == [1, 2]


def test_lost_race_disjoint_competitor_recomputes(spark, tmp_path, faulty):
    """A competitor append to a DIFFERENT partition lands in the claim
    window: the overwrite must lose the version race, rescan, and land
    at the next version with the competitor's file intact."""
    root = str(tmp_path / "t")
    SS.append(_frame(spark, [(1, "d1", 10), (2, "d2", 20)]), root, "day")
    # competitor: an append claiming nothing (disjoint partition d9)
    entry = SS._write_batch(_frame(spark, [(9, "d9", 90)]), root, "day")
    faulty.competitor_payload = {
        "version": 2, "kind": "append", "actions": [entry],
        "replaced": [], "idempotency_key": None,
        "writer": uuid.uuid4().hex, "ts": time.time(),
    }
    v = SS.overwrite_partitions(_frame(spark, [(1, "d1", 11)]), root, "day")
    assert v == 3  # competitor took v2
    assert _rows(SS.read_table(spark, root)) == [
        (1, "d1", 11.0), (2, "d2", 20.0), (9, "d9", 90.0)
    ]


def test_lost_race_overlapping_competitor_conflicts(spark, tmp_path, faulty):
    """A competitor overwriting the SAME partition in the claim window
    must surface as ConcurrentWriteError, never silent interleaving."""
    root = str(tmp_path / "t")
    SS.append(_frame(spark, [(1, "d1", 10)]), root, "day")
    entry = SS._write_batch(_frame(spark, [(1, "d1", 99)]), root, "day")
    faulty.competitor_payload = {
        "version": 2, "kind": "overwrite_partitions", "actions": [entry],
        "replaced": ["d1"], "idempotency_key": None,
        "writer": uuid.uuid4().hex, "ts": time.time(),
    }
    with pytest.raises(SS.ConcurrentWriteError):
        SS.overwrite_partitions(_frame(spark, [(1, "d1", 11)]), root, "day")


def test_list_after_write_lag_never_skips_or_overwrites(spark, tmp_path, faulty):
    """With the newest commit hidden from LIST for a few calls, a new
    writer plans against a stale version — its claims must keep failing
    (the name exists) until the lag clears, then land at the CORRECT
    next version."""
    root = str(tmp_path / "t")
    SS.append(_frame(spark, [(1, "d1", 10)]), root, "day")
    SS.append(_frame(spark, [(2, "d2", 20)]), root, "day")
    faulty.lag_hide_newest = 3  # next 3 LISTs omit v2
    v = SS.append(_frame(spark, [(3, "d3", 30)]), root, "day")
    assert v == 3
    assert [h["version"] for h in SS.history(root)] == [1, 2, 3]
    assert _rows(SS.read_table(spark, root)) == [
        (1, "d1", 10.0), (2, "d2", 20.0), (3, "d3", 30.0)
    ]


def test_full_op_sequence_under_spurious_faults(spark, tmp_path, faulty):
    """The representative store lifecycle (append → merge → overwrite →
    delete_where(dv) → compact), every commit preceded by a spurious
    claim failure, must produce exactly the fault-free state."""
    root = str(tmp_path / "t")

    def flaky(fn, *a, **k):
        faulty.spurious_failures = 1
        return fn(*a, **k)

    flaky(SS.append, _frame(spark, [(1, "d1", 1), (2, "d2", 2)]), root, "day",
          stats_cols=("id",))
    flaky(SS.merge, _frame(spark, [(2, "d2", 22), (3, "d3", 3)]), root,
          keys=["id"], when_matched="update", partition_col="day")
    flaky(SS.overwrite_partitions, _frame(spark, [(1, "d1", 11)]), root, "day")
    flaky(SS.delete_where, spark, root, "id = 3", mode="dv")
    flaky(SS.compact, spark, root)
    assert _rows(SS.read_table(spark, root)) == [(1, "d1", 11.0), (2, "d2", 22.0)]
    # every commit landed exactly once, versions contiguous
    hist = [h["version"] for h in SS.history(root)]
    assert hist == list(range(1, len(hist) + 1))


def test_claim_exhaustion_raises_cleanly(spark, tmp_path, faulty):
    root = str(tmp_path / "t")
    SS.append(_frame(spark, [(1, "d1", 10)]), root, "day")
    faulty.spurious_failures = 10_000
    with pytest.raises(SS.ConcurrentWriteError, match="gave up"):
        SS.append(_frame(spark, [(2, "d2", 20)]), root, "day")
    faulty.spurious_failures = 0
    # the table is untouched and writable afterwards
    assert SS.append(_frame(spark, [(2, "d2", 20)]), root, "day") == 2
