"""The LOG owns the schema (r14 wave 3 — the Delta read posture).

After an additive evolution:
- a DEFAULT ``read_table`` scans with the RECORDED schema (older
  batches read the evolved columns as NULL) instead of inheriting
  whichever file's footer the reader sampled;
- time travel reads with the schema AS OF that version;
- internal rewrite reads (merge update residues, delete_where
  survivors, compact) use a footer-union read, so a rewrite spanning
  mixed-vintage files can never silently drop the evolved columns'
  values;
- the streaming source declares the recorded schema and aligns every
  file's vintage to it executor-side (old files emit typed NULLs).
"""
from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from smartdatapipeline_spark.sources import snapstore as SS


def _narrow(spark, rows):
    return spark.createDataFrame(
        [(i, d, float(v)) for i, d, v in rows], "id int, day string, value double"
    )


def _wide(spark, rows):
    return spark.createDataFrame(
        [(i, d, float(v), r) for i, d, v, r in rows],
        "id int, day string, value double, region string",
    )


@pytest.fixture()
def evolved(spark, tmp_path):
    root = str(tmp_path / "t")
    SS.append(_narrow(spark, [(1, "d1", 10), (2, "d1", 20)]), root, "day")
    SS.append(
        _wide(spark, [(3, "d2", 30, "eu"), (4, "d2", 40, "us")]),
        root, "day", allow_new_columns=True,
    )
    return root


def test_default_read_uses_recorded_schema(spark, evolved):
    out = SS.read_table(spark, evolved)  # NO merge_schema
    assert out.columns == ["id", "day", "value", "region"]
    got = {r["id"]: r["region"] for r in out.collect()}
    assert got == {1: None, 2: None, 3: "eu", 4: "us"}


def test_time_travel_reads_schema_as_of_version(spark, evolved):
    v1 = SS.history(evolved)[0]["version"]
    old = SS.read_table(spark, evolved, version=v1)
    assert old.columns == ["id", "day", "value"]
    assert sorted(r["id"] for r in old.collect()) == [1, 2]


def test_pruned_empty_read_keeps_recorded_schema(spark, evolved):
    out = SS.read_table(spark, evolved, partition_values=["nope"])
    assert out.count() == 0
    assert out.columns == ["id", "day", "value", "region"]


def test_merge_update_mixed_vintage_preserves_evolved_values(spark, evolved):
    """The update hits BOTH vintages' files; the wide file's surviving
    row must keep its region value through the residue rewrite."""
    SS.merge(
        _wide(spark, [(1, "d1", 111, "jp"), (3, "d2", 333, "cn")]),
        evolved, keys=["id"], when_matched="update",
        allow_new_columns=True,
    )
    got = {r["id"]: (r["value"], r["region"]) for r in
           SS.read_table(spark, evolved).collect()}
    assert got[1] == (111.0, "jp") and got[3] == (333.0, "cn")
    assert got[2] == (20.0, None)
    assert got[4] == (40.0, "us")  # survivor of the wide file: kept


def test_delete_where_mixed_vintage_preserves_evolved_values(spark, evolved):
    SS.delete_where(spark, evolved, "id IN (1, 3)")
    got = {r["id"]: r["region"] for r in SS.read_table(spark, evolved).collect()}
    assert got == {2: None, 4: "us"}


def test_compact_mixed_vintage_preserves_evolved_values(spark, evolved):
    SS.compact(spark, evolved)
    got = {r["id"]: r["region"] for r in SS.read_table(spark, evolved).collect()}
    assert got == {1: None, 2: None, 3: "eu", 4: "us"}


def test_stream_declares_recorded_schema_and_aligns_vintages(spark, evolved, tmp_path):
    from smartdatapipeline_spark.streaming.snapsource import (
        SnapshotChangeDataSource,
    )

    spark.dataSource.register(SnapshotChangeDataSource)
    out = str(tmp_path / "out")
    q = (
        spark.readStream.format("snapshot_changes")
        .option("root", evolved)
        .option("startingVersion", 0)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert set(["id", "day", "value", "region"]) <= set(got.columns)
    rows = {r["id"]: r["region"] for r in got.collect()}
    assert rows == {1: None, 2: None, 3: "eu", 4: "us"}


def test_pre_r14_table_keeps_footer_read(spark, tmp_path):
    root = str(tmp_path / "t")
    SS.append(_narrow(spark, [(1, "d1", 1)]), root, "day")
    p = os.path.join(root, "_log", f"{SS.table_version(root):020d}.json")
    with open(p) as f:
        payload = json.load(f)
    del payload["schema"]
    os.unlink(p)
    with open(p, "w") as f:
        f.write(json.dumps(payload))
    assert SS.table_schema(root) is None
    out = SS.read_table(spark, root)
    assert sorted(r["id"] for r in out.collect()) == [1]
