"""Round-10 ADVICE fixes: chunked marker fsyncs (fd-bounded txn
stamping) and the semantic_decontaminate id-namespace contract (the
latter lives in test_round9_sketches.py next to its siblings)."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from smartdatapipeline_spark.sources import sinks


def test_marker_stamping_chunks_bound_open_fds(spark, tmp_path, monkeypatch):
    """A txn over more partitions than one fsync chunk must succeed
    with the chunk bound enforced — no EMFILE class failure, every
    marker stamped and stripped, data committed per-partition."""
    monkeypatch.setattr(sinks, "_MARKER_FSYNC_CHUNK", 3)
    path = str(tmp_path / "gold")
    os.makedirs(path)
    df = spark.range(100).select(
        (F.col("id") % 10).cast("string").alias("day"),
        F.col("id").alias("v"),
    )
    sinks._txn_partition_overwrite(df, path, "day")
    parts = sorted(d for d in os.listdir(path) if d.startswith("day="))
    assert len(parts) == 10
    # markers stripped, journal gone
    for p in parts:
        assert not any(
            n.startswith("_txnmark-") for n in os.listdir(os.path.join(path, p))
        )
    assert not os.path.exists(os.path.join(path, "_txn.json"))
    got = spark.read.parquet(path)
    assert got.count() == 100


def test_marker_stamping_failure_mid_chunk_leaks_no_fds(
    spark, tmp_path, monkeypatch
):
    """If an fsync fails mid-chunk inside _txn_partition_overwrite, the
    try/finally must close every already-opened marker handle (ADVICE
    r10: the round-9 code leaked all open fds on a mid-loop failure)."""
    import builtins

    import pytest

    path = str(tmp_path / "gold_fail")
    os.makedirs(path)
    df = spark.range(50).select(
        (F.col("id") % 5).cast("string").alias("day"),
        F.col("id").alias("v"),
    )

    opened = []
    real_open = builtins.open

    def tracking_open(file, *a, **kw):
        f = real_open(file, *a, **kw)
        if isinstance(file, str) and os.path.basename(file).startswith("_txnmark-"):
            opened.append(f)
        return f

    real_fsync = os.fsync
    fails = {"n": 0}

    def failing_fsync(fd):
        # fail the 3rd marker fsync (mid-chunk with the default 256)
        fails["n"] += 1
        if fails["n"] == 3:
            raise OSError(5, "injected fsync failure")
        return real_fsync(fd)

    monkeypatch.setattr(builtins, "open", tracking_open)
    monkeypatch.setattr(os, "fsync", failing_fsync)
    with pytest.raises(OSError, match="injected"):
        sinks._txn_partition_overwrite(df, path, "day")
    monkeypatch.undo()
    assert len(opened) == 5
    assert all(f.closed for f in opened)
