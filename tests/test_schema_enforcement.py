"""Write-side schema enforcement + explicit additive evolution (r14,
r13 VERDICT #1 — the last missing table-format invariant a
multi-producer deployment hits weekly).

Contract (sources/snapstore.py `_resolve_write_schema`):
- every write op (append / overwrite_partitions / overwrite_table /
  merge) compares the incoming frame against the table's RECORDED
  schema and raises ``SchemaMismatchError`` naming the columns on a
  renamed column, a type change, or a missing column;
- NEW columns are gated behind ``allow_new_columns=True``; the
  evolution is recorded in the commit payload (``schema`` +
  ``schema_evolved``) and old batches read the new columns as NULL
  under ``read_table(merge_schema=True)``;
- ``overwrite_table(overwrite_schema=True)`` is the only op that may
  change existing columns (no old rows survive it);
- pre-r14 tables (no recorded schema) adopt the next write's schema.

Reference analog: the fixed Alembic-migrated ORM schema
(backend/migrations/versions/20251104_0001_week_11_baseline_schema_
reset.py) — schema change is deliberate, never a side effect of one
producer drifting.
"""
from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from smartdatapipeline_spark.sources import snapstore as SS


def _frame(spark, rows):
    return spark.createDataFrame(
        [(i, d, float(v)) for i, d, v in rows], "id int, day string, value double"
    )


def _ids(df):
    return sorted(r["id"] for r in df.collect())


@pytest.fixture()
def store(spark, tmp_path):
    root = str(tmp_path / "t")
    SS.append(_frame(spark, [(1, "d1", 10), (2, "d2", 20)]), root, "day")
    return root


def test_type_change_raises_named(spark, store):
    drifted = spark.createDataFrame(
        [(3, "d3", "not-a-double")], "id int, day string, value string"
    )
    with pytest.raises(SS.SchemaMismatchError, match="value.*double.*string"):
        SS.append(drifted, store, "day")
    # nothing landed
    assert _ids(SS.read_table(spark, store)) == [1, 2]


def test_missing_column_raises_named(spark, store):
    narrow = spark.createDataFrame([(3, "d3")], "id int, day string")
    with pytest.raises(SS.SchemaMismatchError, match="missing columns: value"):
        SS.append(narrow, store, "day")


def test_renamed_column_raises(spark, store):
    renamed = spark.createDataFrame(
        [(3, "d3", 3.0)], "id int, day string, amount double"
    )
    # a rename is a missing column + an unexpected new one
    with pytest.raises(SS.SchemaMismatchError, match="value"):
        SS.append(renamed, store, "day")


def test_column_order_is_irrelevant(spark, store):
    permuted = spark.createDataFrame(
        [("d3", 3.0, 3)], "day string, value double, id int"
    )
    SS.append(permuted, store, "day")
    got = SS.read_table(spark, store)
    assert _ids(got) == [1, 2, 3]
    assert {r["id"]: r["value"] for r in got.collect()}[3] == 3.0


def test_new_column_gated_then_evolves(spark, store):
    wide = spark.createDataFrame(
        [(3, "d3", 3.0, "eu")], "id int, day string, value double, region string"
    )
    with pytest.raises(SS.SchemaMismatchError, match="allow_new_columns"):
        SS.append(wide, store, "day")
    v = SS.append(wide, store, "day", allow_new_columns=True)
    # the evolution is recorded in the commit payload
    with open(os.path.join(store, "_log", f"{v:020d}.json")) as f:
        payload = json.load(f)
    assert payload["schema_evolved"] is True
    assert ["region", "string"] in payload["schema"]
    assert SS.table_schema(store) == [
        ["id", "int"], ["day", "string"], ["value", "double"],
        ["region", "string"],
    ]
    # old batches read the new column as NULL under merge_schema
    out = SS.read_table(spark, store, merge_schema=True)
    regions = {r["id"]: r["region"] for r in out.collect()}
    assert regions == {1: None, 2: None, 3: "eu"}
    # after evolution, an OLD-shape producer now fails loudly
    with pytest.raises(SS.SchemaMismatchError, match="missing columns: region"):
        SS.append(_frame(spark, [(4, "d4", 4)]), store, "day")


def test_merge_across_evolution(spark, store):
    wide = spark.createDataFrame(
        [(2, "d2", 99.0, "us"), (5, "d5", 5.0, "eu")],
        "id int, day string, value double, region string",
    )
    with pytest.raises(SS.SchemaMismatchError):
        SS.merge(wide, store, keys=["id"], when_matched="update")
    SS.merge(
        wide, store, keys=["id"], when_matched="update",
        allow_new_columns=True,
    )
    out = SS.read_table(spark, store, merge_schema=True)
    got = {r["id"]: (r["value"], r["region"]) for r in out.collect()}
    assert got[2] == (99.0, "us") and got[5] == (5.0, "eu")
    assert got[1] == (10.0, None)


def test_overwrite_partitions_enforced(spark, store):
    drifted = spark.createDataFrame(
        [(9, "d1", 9)], "id int, day string, value bigint"
    )
    with pytest.raises(SS.SchemaMismatchError, match="value"):
        SS.overwrite_partitions(drifted, store, "day")


def test_overwrite_table_overwrite_schema(spark, store):
    new_shape = spark.createDataFrame(
        [(1, "x")], "pk bigint, label string"
    )
    with pytest.raises(SS.SchemaMismatchError):
        SS.overwrite_table(new_shape, store)
    SS.overwrite_table(new_shape, store, overwrite_schema=True)
    assert SS.table_schema(store) == [["pk", "bigint"], ["label", "string"]]
    assert [tuple(r) for r in SS.read_table(spark, store).collect()] == [(1, "x")]
    # subsequent writes enforce the NEW schema
    with pytest.raises(SS.SchemaMismatchError):
        SS.append(_frame(spark, [(1, "d1", 1)]), store)
    SS.append(
        spark.createDataFrame([(2, "y")], "pk bigint, label string"), store
    )


def test_legacy_table_adopts_next_write_schema(spark, tmp_path):
    """A pre-r14 log (schema stamps stripped) reads fine and adopts the
    next write's schema; enforcement starts from there."""
    root = str(tmp_path / "t")
    SS.append(_frame(spark, [(1, "d1", 1)]), root, "day")
    # strip the schema stamp to simulate a pre-r14 log
    p = os.path.join(root, "_log", f"{SS.table_version(root):020d}.json")
    with open(p) as f:
        payload = json.load(f)
    del payload["schema"]
    os.unlink(p)
    with open(p, "w") as f:
        f.write(json.dumps(payload))
    assert SS.table_schema(root) is None
    SS.append(_frame(spark, [(2, "d2", 2)]), root, "day")  # adopts
    assert SS.table_schema(root) is not None
    with pytest.raises(SS.SchemaMismatchError):
        SS.append(
            spark.createDataFrame([(3, "d3")], "id int, day string"), root, "day"
        )


def test_schema_survives_checkpoint_and_log_vacuum(spark, store):
    """vacuum_log can truncate every schema-stamping commit; the
    checkpoint metadata keeps enforcement alive."""
    for i in range(3, 3 + SS._CHECKPOINT_INTERVAL):
        SS.delete_partitions(spark, store, "day", [f"nope-{i}"])  # no-op kinds
    # force stamping commits below a checkpoint, then vacuum the log
    for i in range(SS._CHECKPOINT_INTERVAL * 2):
        SS.append(_frame(spark, [(100 + i, f"x{i}", 1)]), store, "day")
    SS.vacuum_log(store, keep_versions=2)
    assert SS.table_schema(store) == [
        ["id", "int"], ["day", "string"], ["value", "double"]
    ]
    with pytest.raises(SS.SchemaMismatchError):
        SS.append(
            spark.createDataFrame([(3, "d3")], "id int, day string"), store, "day"
        )


def test_internal_rewrites_not_blocked_after_evolution(spark, store):
    """Residue rewrites (delete_where, compact) read mixed-vintage
    batches and are NOT schema-enforced — maintenance must keep working
    on an evolved table."""
    wide = spark.createDataFrame(
        [(3, "d1", 3.0, "eu")], "id int, day string, value double, region string"
    )
    SS.append(wide, store, "day", allow_new_columns=True)
    SS.delete_where(spark, store, "id = 3")
    assert _ids(SS.read_table(spark, store)) == [1, 2]
    SS.compact(spark, store)
    assert _ids(SS.read_table(spark, store)) == [1, 2]


def test_empty_frame_still_enforced(spark, store):
    empty = spark.createDataFrame([], "id int, day string, value string")
    with pytest.raises(SS.SchemaMismatchError):
        SS.append(empty, store, "day")
