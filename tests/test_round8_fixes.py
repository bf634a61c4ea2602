"""Round-8 ADVICE regressions: positive swap-state detection in the
crash-consistent gold upsert, txid-scoped progress files, breaker
sentinel honored by lock acquirers, owner-verified heartbeat.

The two txn scenarios are the exact crash windows the round-7 advisor
simulated against the old code:

1. (high) crash BETWEEN renameat2(RENAME_EXCHANGE) and the progress
   append — the old `src exists ⇒ swap pending` inference re-exchanged
   the partition back to OLD data and then swept its NEW data.
2. (medium) `_txn.progress` orphaned by a crash between the journal
   remove and the progress remove — the fixed name let a LATER
   transaction's recovery treat same-named partitions as already
   swapped, keeping old data and sweeping the staged new data.
"""

import json
import os
import shutil
import time

import pytest

import smartdatapipeline_spark.sources.sinks as sinks
from smartdatapipeline_spark.sources.sinks import gold_writer_lock


def _gold_batch(spark, dates, batch):
    rows = [
        (d, m, batch, float(i))
        for i, d in enumerate(dates)
        for m in ("value_sum", "value_avg")
    ]
    return spark.createDataFrame(
        rows, "metric_date string, metric string, batch string, value double"
    )


def _stage_txn(spark, path, dates, batch, txid):
    """Hand-build a transaction up to 'journal fsync'd, zero swaps':
    staging written, every staged partition stamped with the marker,
    journal on disk — exactly the state `_txn_partition_overwrite`
    reaches the instant before its swap loop."""
    staging = os.path.join(path, f"_staging-{txid}")
    _gold_batch(spark, dates, batch).write.mode("overwrite").partitionBy(
        "metric_date"
    ).parquet(staging)
    parts = sorted(
        d
        for d in os.listdir(staging)
        if d.startswith("metric_date=") and os.path.isdir(os.path.join(staging, d))
    )
    marker = sinks._marker_name(txid)
    for p in parts:
        with open(os.path.join(staging, p, marker), "w") as f:
            f.write(txid)
    sinks._write_fsync(
        os.path.join(path, "_txn.json"),
        json.dumps(
            {
                "txid": txid,
                "staging": os.path.basename(staging),
                "partition_col": "metric_date",
                "partitions": parts,
            }
        ),
    )
    return staging, parts, marker


def _batches(spark, path):
    return {
        (str(r["metric_date"]), r["batch"])
        for r in spark.read.parquet(path).collect()
    }


def _clean(path):
    names = os.listdir(path)
    assert not any(
        n.startswith("_staging-")
        or n.startswith("_old-")
        or n.startswith("_txn")
        for n in names
    ), names


def test_txn_recovery_detects_committed_exchange(spark, tmp_path):
    """(high) After EXCHANGE, `src` still exists — holding OLD data.
    Recovery must SKIP that partition (marker is on the dst side), not
    re-exchange it back and sweep the new data."""
    if not sinks._HAVE_EXCHANGE:
        pytest.skip("renameat2(RENAME_EXCHANGE) unavailable")
    path = str(tmp_path / "gold")
    dates = ["2024-03-0%d" % i for i in range(1, 4)]
    sinks.overwrite_gold_partitions(_gold_batch(spark, dates, "A"), path)

    txid = "feedface00000000"
    staging, parts, marker = _stage_txn(spark, path, dates, "B", txid)
    # swap partition 0, then CRASH before the progress append
    sinks._exchange_dirs(
        os.path.join(staging, parts[0]), os.path.join(path, parts[0])
    )
    assert os.path.isdir(os.path.join(staging, parts[0]))  # old data — the trap

    sinks.recover_partition_txn(path)

    assert _batches(spark, path) == {(d, "B") for d in dates}
    _clean(path)
    for p in parts:
        assert marker not in os.listdir(os.path.join(path, p))


def test_txn_recovery_rolls_forward_unswapped(spark, tmp_path):
    """Crash immediately after the journal fsync (zero swaps): every
    partition's marker is on the staging side, so recovery swaps all."""
    path = str(tmp_path / "gold_fwd")
    dates = ["2024-04-0%d" % i for i in range(1, 4)]
    sinks.overwrite_gold_partitions(_gold_batch(spark, dates, "A"), path)
    _stage_txn(spark, path, dates, "B", "0123456789abcdef")

    sinks.recover_partition_txn(path)

    assert _batches(spark, path) == {(d, "B") for d in dates}
    _clean(path)


def test_txn_orphaned_progress_cannot_poison_next_txn(spark, tmp_path):
    """(medium) Orphaned progress files — legacy fixed-name AND a stale
    txid-scoped one — list every partition as done. A new journaled
    transaction that crashed before any swap must still roll fully
    forward, and recovery must sweep the orphans."""
    path = str(tmp_path / "gold_orphan")
    dates = ["2024-05-0%d" % i for i in range(1, 4)]
    sinks.overwrite_gold_partitions(_gold_batch(spark, dates, "A"), path)
    parts = sorted(d for d in os.listdir(path) if d.startswith("metric_date="))
    poison = "\n".join(parts) + "\n"
    for orphan in ("_txn.progress", "_txn.progress-00ddba11deadc0de"):
        with open(os.path.join(path, orphan), "w") as f:
            f.write(poison)

    _stage_txn(spark, path, dates, "B", "cafebabe12345678")
    sinks.recover_partition_txn(path)

    assert _batches(spark, path) == {(d, "B") for d in dates}
    _clean(path)  # also asserts both orphans were swept


def test_txn_recovery_with_complete_progress_is_noop(spark, tmp_path):
    """Crash between the journal remove and the progress remove after a
    FULL commit: recovery must touch nothing and clear the debris."""
    path = str(tmp_path / "gold_done")
    dates = ["2024-06-01", "2024-06-02"]
    sinks.overwrite_gold_partitions(_gold_batch(spark, dates, "A"), path)
    sinks.overwrite_gold_partitions(_gold_batch(spark, dates, "B"), path)
    # leave only the progress orphan behind (journal already removed)
    parts = sorted(d for d in os.listdir(path) if d.startswith("metric_date="))
    with open(os.path.join(path, "_txn.progress-aaaabbbbccccdddd"), "w") as f:
        f.write("\n".join(parts) + "\n")

    sinks.recover_partition_txn(path)

    assert _batches(spark, path) == {(d, "B") for d in dates}
    _clean(path)


# ---------------------------------------------- writer-lock sentinel


def test_writer_lock_waiter_honors_breaker_sentinel(tmp_path):
    """While a breaker holds the lock renamed aside (`.brk-*` present),
    no waiter may acquire — the old code makedirs'd into the free path
    and the breaker's rename-back then destroyed a live lock."""
    path = str(tmp_path / "tbl")
    brk = path + "._LOCK.brk-deadbeef"
    os.makedirs(brk)
    t0 = time.monotonic()
    with pytest.raises(TimeoutError):
        with gold_writer_lock(path, timeout_sec=1.0, breaker_grace_sec=60.0):
            pass
    assert time.monotonic() - t0 >= 1.0
    assert os.path.isdir(brk)  # a fresh sentinel is never swept


def test_writer_lock_sweeps_dead_breaker_sentinel(tmp_path):
    """A sentinel that outlives the grace window is debris of a breaker
    that died mid-verify; waiters sweep it and proceed."""
    path = str(tmp_path / "tbl2")
    brk = path + "._LOCK.brk-deadc0de"
    os.makedirs(brk)
    with gold_writer_lock(path, timeout_sec=10.0, breaker_grace_sec=0.2):
        assert not os.path.isdir(brk)
    assert not os.path.isdir(path + "._LOCK")


def test_heartbeat_never_freshens_foreign_lock(tmp_path):
    """If the lock is broken and RE-ACQUIRED while we hold it, our
    heartbeat must not freshen the successor's lock (it verifies the
    owner token before every utime), and release must not remove it."""
    path = str(tmp_path / "tbl3")
    lock_dir = path + "._LOCK"
    with gold_writer_lock(path, heartbeat_sec=0.05):
        shutil.rmtree(lock_dir)
        os.makedirs(lock_dir)
        with open(os.path.join(lock_dir, "owner"), "w") as f:
            f.write("successor-token")
        old = time.time() - 3600
        os.utime(lock_dir, (old, old))
        time.sleep(0.5)  # ≥ several heartbeat intervals
        assert time.time() - os.stat(lock_dir).st_mtime > 3000
    assert os.path.isdir(lock_dir)  # owner-token guard skipped removal
    with open(os.path.join(lock_dir, "owner")) as f:
        assert f.read() == "successor-token"
