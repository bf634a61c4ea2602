"""Streaming SOURCE over the snapshot table (streaming/snapsource.py):
the change feed read as a structured stream must NET to exactly the
batch read of the final snapshot across a multi-commit history that
includes an overwrite with copy-on-write residue churn, a partition
delete, and a compaction."""

from __future__ import annotations

from pyspark.sql import functions as F

from smartdatapipeline_spark.sources import snapstore as SS
from smartdatapipeline_spark.streaming.snapsource import SnapshotChangeDataSource


def _df(spark, rows):
    return spark.createDataFrame(rows, "d string, k string, v long")


def _build_history(spark, root) -> None:
    """v1 append (2 days in ONE batch → the overwrite later must cut a
    residue), v2 append, v3 overwrite day-1 (residue carries day-2),
    v4 delete day-3, v5 compact (logically empty)."""
    SS.append(_df(spark, [("2024-01-01", "a", 1), ("2024-01-02", "b", 2)]), root, "d")
    SS.append(_df(spark, [("2024-01-03", "c", 3)]), root, "d")
    SS.overwrite_partitions(_df(spark, [("2024-01-01", "A", 10)]), root, "d")
    SS.delete_partitions(spark, root, "d", ["2024-01-03"])
    SS.compact(spark, root)
    assert SS.table_version(root) == 5


def _stream_all(spark, root):
    spark.dataSource.register(SnapshotChangeDataSource)
    q = (
        spark.readStream.format("snapshot_changes")
        .option("root", root)
        .load()
        .writeStream.format("memory")
        .queryName("snap_cdc")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table("snap_cdc")


def test_stream_nets_to_batch_read(spark, tmp_path):
    root = str(tmp_path / "t")
    _build_history(spark, root)
    feed = _stream_all(spark, root)
    # net the bag: +1 per insert, −1 per delete, per data row
    net = (
        feed.groupBy("d", "k", "v")
        .agg(
            F.sum(
                F.when(F.col("_change_type") == "insert", 1).otherwise(-1)
            ).alias("n")
        )
        .filter(F.col("n") != 0)
    )
    assert sorted((r["d"], r["k"], r["v"], r["n"]) for r in net.collect()) == [
        ("2024-01-01", "A", 10, 1),
        ("2024-01-02", "b", 2, 1),
    ]
    batch = sorted(
        (r["d"], r["k"], r["v"]) for r in SS.read_table(spark, root).collect()
    )
    assert batch == [("2024-01-01", "A", 10), ("2024-01-02", "b", 2)]


def test_stream_residue_and_compact_emit_nothing(spark, tmp_path):
    root = str(tmp_path / "t")
    _build_history(spark, root)
    rows = _stream_all(spark, root).collect()
    by_v = {}
    for r in rows:
        by_v.setdefault(r["_commit_version"], []).append(r)
    # v3 overwrote day-1 only: day-2's rows were MOVED to the residue —
    # they must not appear as changes at v3 in either direction
    v3 = by_v[3]
    assert all(r["d"] == "2024-01-01" for r in v3)
    assert sorted((r["_change_type"], r["k"]) for r in v3) == [
        ("delete", "a"),
        ("insert", "A"),
    ]
    # v4 deleted day-3 (pure delete, no phantom inserts from residue)
    assert sorted((r["_change_type"], r["d"]) for r in by_v[4]) == [
        ("delete", "2024-01-03")
    ]
    # v5 compact is logically empty
    assert 5 not in by_v


def test_stream_resumes_from_starting_version(spark, tmp_path):
    root = str(tmp_path / "t")
    _build_history(spark, root)
    spark.dataSource.register(SnapshotChangeDataSource)
    q = (
        spark.readStream.format("snapshot_changes")
        .option("root", root)
        .option("startingVersion", 2)
        .load()
        .writeStream.format("memory")
        .queryName("snap_cdc_tail")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    vs = {
        r["_commit_version"]
        for r in spark.table("snap_cdc_tail").select("_commit_version").collect()
    }
    assert vs == {3, 4}  # window (2, 5]; compact v5 emits nothing


def test_max_versions_per_batch_rate_limit(spark, tmp_path):
    """maxVersionsPerBatch caps one micro-batch's commit window (the
    Delta maxFilesPerTrigger analogue): a far-behind reader catches up
    in bounded steps. Unit-tests the reader's offset walk directly —
    trigger timing stays out of it."""
    from smartdatapipeline_spark.streaming.snapsource import (
        SnapshotChangeStreamReader,
    )

    root = str(tmp_path / "t")
    _build_history(spark, root)  # 5 commits
    r = SnapshotChangeStreamReader({"root": root, "maxversionsperbatch": "2"})
    start = r.initialOffset()
    assert start == {"version": 0}
    o1 = r.latestOffset()
    assert o1 == {"version": 2}
    parts1 = r.partitions(start, o1)
    assert {p.version for p in parts1} == {1, 2}
    r.commit(o1)
    o2 = r.latestOffset()
    assert o2 == {"version": 4}
    r.commit(o2)
    o3 = r.latestOffset()
    assert o3 == {"version": 5}  # caught up; never past the table head
    # unbounded reader goes straight to the head
    r2 = SnapshotChangeStreamReader({"root": root})
    assert r2.latestOffset() == {"version": 5}


def test_snapshot_to_snapshot_streaming_pipeline(spark, tmp_path):
    """BOTH ENDS (r10 VERDICT #4's composition): the upstream snapshot
    table is the STREAM SOURCE (its commit log is the offset axis) and
    a downstream snapshot table is the exactly-once SINK — one
    Structured Streaming query replicates upstream's net state through
    a filter, surviving a restart without duplicating commits."""
    from smartdatapipeline_spark.streaming.snapsink import snapshot_append_sink

    up = str(tmp_path / "up")
    down = str(tmp_path / "down")
    ckpt = str(tmp_path / "ckpt")
    SS.append(_df(spark, [("2024-01-01", "a", 1), ("2024-01-02", "b", 2)]), up, "d")
    SS.append(_df(spark, [("2024-01-03", "c", 3)]), up, "d")

    spark.dataSource.register(SnapshotChangeDataSource)

    def run_once():
        q = (
            spark.readStream.format("snapshot_changes")
            .option("root", up)
            .load()
            .filter(F.col("_change_type") == "insert")
            .select("d", "k", "v")
            .writeStream.foreachBatch(snapshot_append_sink(down, "repl-1", "d"))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    got1 = sorted((r["d"], r["k"], r["v"]) for r in SS.read_table(spark, down).collect())
    assert got1 == [("2024-01-01", "a", 1), ("2024-01-02", "b", 2), ("2024-01-03", "c", 3)]

    # more upstream commits, then RESTART from the checkpoint: only the
    # new window replays, and the sink's idempotency keys mean the
    # restart cannot double-apply anything
    SS.append(_df(spark, [("2024-01-04", "e", 4)]), up, "d")
    run_once()
    run_once()  # a second restart with nothing new is a no-op
    got2 = sorted((r["d"], r["k"], r["v"]) for r in SS.read_table(spark, down).collect())
    assert got2 == got1 + [("2024-01-04", "e", 4)]
    # downstream history: one append commit per non-empty micro-batch,
    # nothing duplicated
    kinds = [h["kind"] for h in SS.history(down)]
    assert kinds == ["append", "append"]


def test_available_now_with_rate_limit_drains_fully(spark, tmp_path):
    """PINNED contract (r11 VERDICT #4 / ADVICE): Spark 4 falls back to
    a SINGLE-batch drain for Python data sources under
    .trigger(availableNow=True), so maxversionsperbatch is inoperative
    there — the query must still drain the WHOLE backlog (one uncapped
    batch), never wedge or stop short. If a future Spark honors
    availableNow for Python sources, this test catches the semantics
    change."""
    import uuid as _uuid

    root = str(tmp_path / "t")
    _build_history(spark, root)  # 5 commits
    spark.dataSource.register(SnapshotChangeDataSource)
    qn = f"an_rate_{_uuid.uuid4().hex[:8]}"
    q = (
        spark.readStream.format("snapshot_changes")
        .option("root", root)
        .option("maxversionsperbatch", "1")
        .load()
        .writeStream.format("memory")
        .queryName(qn)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    vs = {r[0] for r in spark.table(qn).select("_commit_version").collect()}
    # full drain: every change-bearing commit present despite the cap
    assert vs == {1, 2, 3, 4}  # v5 is compact (logically empty)


def test_rate_limit_restart_does_not_wedge(spark, tmp_path):
    """A RESTARTED rate-limited reader (fresh object, engine supplies
    the checkpointed start via partitions(), initialOffset never
    called) must not cap latestOffset below the engine's start — the
    cap floor is learned from the engine, so the first post-restart
    batch proceeds and subsequent ones are bounded."""
    from smartdatapipeline_spark.streaming.snapsource import (
        SnapshotChangeStreamReader,
    )

    root = str(tmp_path / "t")
    _build_history(spark, root)  # 5 commits
    r = SnapshotChangeStreamReader({"root": root, "maxversionsperbatch": "1"})
    # restart flow: engine checkpoint says we're at v3; no initialOffset
    o = r.latestOffset()
    assert o == {"version": 5}  # uncapped until the floor is learned
    parts = r.partitions({"version": 3}, o)
    assert {p.version for p in parts} == {4}  # v5 is compact (empty)
    r.commit(o)
    # floor learned — further batches are bounded relative to it
    assert r.latestOffset() == {"version": 5}
