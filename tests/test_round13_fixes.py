"""Round-13 fixes pinned by test:

- r12 ADVICE: merge(update) keeps unmatched NULL-partition target rows
  (the coalesce in the survivor filter).
- r12 ADVICE: resolve_commit_changes / table_changes raise
  NoSuchTableError for a to_version beyond the latest commit, matching
  _snapshot's contract.
- r12 ADVICE: resolve_as_of takes the LATEST qualifying version over
  the full retained list — no monotonicity assumption on commit times.
- r12 ADVICE: an empty CDC delete scope ([]) matches NOTHING instead
  of flipping to "every row in the removed files".
- r12 VERDICT #6: merge(validate_source_unique=True) raises on
  duplicate source keys with the offending keys named.
- r12 VERDICT #7: null-count manifest stats — IS NULL reads and
  delete_where scrubs skip files that provably hold zero nulls.
"""
from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from smartdatapipeline_spark.sources import snapstore as SS


def _frame(spark, rows):
    """rows: (id, day, value)."""
    return spark.createDataFrame(
        [(i, d, float(v)) for i, d, v in rows], "id int, day string, value double"
    )


def _rows(df):
    return sorted(
        map(tuple, df.select("id", "day", "value").collect()),
        key=lambda t: (t[0] is None, t),
    )


# ------------------------------------------ merge NULL-partition survivors


def test_merge_update_keeps_null_partition_survivor(spark, tmp_path):
    """A target file holding both an in-scope matched row and a row
    whose partition_col is NULL: the NULL row must SURVIVE the rewrite
    (in_scope is NULL for it; the old filter dropped it silently)."""
    root = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, "d1", 10.0), (2, None, 20.0)], "id int, day string, value double"
    )
    SS.append(base, root, "day", stats_cols=("id",))
    inc = _frame(spark, [(1, "d1", 99)])
    SS.merge(inc, root, keys=["id"], when_matched="update", partition_col="day")
    got = _rows(SS.read_table(spark, root))
    assert got == [(1, "d1", 99.0), (2, None, 20.0)]


# --------------------------------------------- to_version past the latest


def test_table_changes_rejects_future_to_version(spark, tmp_path):
    root = str(tmp_path / "t")
    SS.append(_frame(spark, [(1, "d1", 10)]), root, "day")
    SS.append(_frame(spark, [(2, "d2", 20)]), root, "day")
    assert SS.table_version(root) == 2
    with pytest.raises(SS.NoSuchTableError):
        SS.table_changes(spark, root, 1, 3)
    with pytest.raises(SS.NoSuchTableError):
        SS.resolve_commit_changes(root, 0, 99)
    # the exact latest version still resolves
    assert SS.table_changes(spark, root, 1, 2).count() == 1


# --------------------------------------------- as-of over non-monotone ts


def test_resolve_as_of_non_monotone_commit_times(spark, tmp_path):
    """Writer clock skew / mtime-fallback interleavings can make commit
    times non-monotone in version order; AS OF must return the LATEST
    version whose time qualifies, not stop at the first too-new one."""
    root = str(tmp_path / "t")
    SS.append(_frame(spark, [(1, "d1", 10)]), root, "day")
    SS.append(_frame(spark, [(2, "d1", 20)]), root, "day")
    SS.append(_frame(spark, [(3, "d1", 30)]), root, "day")
    log = os.path.join(root, "_log")

    def _set_ts(v, ts):
        p = os.path.join(log, f"{v:020d}.json")
        c = json.load(open(p))
        c["ts"] = ts
        json.dump(c, open(p, "w"))

    # v1 at t=100, v2 skewed FUTURE (t=200), v3 at t=110
    _set_ts(1, 100.0)
    _set_ts(2, 200.0)
    _set_ts(3, 110.0)
    # target 120: v1 (100) and v3 (110) qualify; old early-break stopped
    # at v2 and returned v1 — must be v3
    assert SS.resolve_as_of(root, 120.0) == 3
    assert SS.resolve_as_of(root, 105.0) == 1
    assert SS.resolve_as_of(root, 500.0) == 3
    with pytest.raises(SS.NoSuchTableError):
        SS.resolve_as_of(root, 50.0)


# --------------------------------------------------- empty delete scope


def test_cdc_empty_delete_scope_matches_nothing(spark, tmp_path):
    """A remove with filter_values=[] is a scope that matches NOTHING —
    the old group-key coercion (tuple(x or ()) or None) flipped it to
    'emit every row of the removed file'."""
    root = str(tmp_path / "t")
    SS.append(_frame(spark, [(1, "d1", 10), (2, "d2", 20)]), root, "day")
    SS.overwrite_partitions(_frame(spark, [(1, "d1", 11)]), root, "day")
    v = SS.table_version(root)
    # forge a commit whose remove carries an EMPTY replaced scope over
    # the residue file (exercises the grouping path directly)
    _, live, _ = SS._snapshot(root)
    target = live[0]
    payload = {
        "version": v + 1,
        "kind": "overwrite_partitions",
        "actions": [{"op": "remove", "path": target["path"]}],
        "replaced": [],
        "idempotency_key": None,
        "writer": "test",
        "ts": 1.0,
    }
    assert SS._try_claim(root, v + 1, payload)
    changes = SS.table_changes(spark, root, v, v + 1)
    assert changes.filter(F.col("_change_type") == "delete").count() == 0


# ------------------------------------------------ validate_source_unique


def test_merge_validate_source_unique_raises(spark, tmp_path):
    root = str(tmp_path / "t")
    SS.append(_frame(spark, [(1, "d1", 10)]), root, "day")
    dup = _frame(spark, [(2, "d1", 20), (2, "d1", 21), (3, "d1", 30)])
    with pytest.raises(ValueError, match=r"duplicate keys.*id=2"):
        SS.merge(
            dup, root, keys=["id"], when_matched="update",
            partition_col="day", validate_source_unique=True,
        )
    # nothing landed: the guard runs before any batch write/commit
    assert SS.table_version(root) == 1
    # unique source passes with the guard on; default stays unguarded
    ok = _frame(spark, [(2, "d1", 20)])
    SS.merge(ok, root, keys=["id"], when_matched="update",
             partition_col="day", validate_source_unique=True)
    assert _rows(SS.read_table(spark, root)) == [(1, "d1", 10.0), (2, "d1", 20.0)]
    SS.merge(dup, root, keys=["id"], when_matched="ignore", partition_col="day")


# ------------------------------------------------- null-count manifest stats


def test_write_batch_records_null_counts(spark, tmp_path):
    root = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "d1", 10.0), (2, "d1", None), (3, "d1", None)],
        "id int, day string, value double",
    )
    SS.append(df, root, "day", stats_cols=("value", "id"))
    _, live, _ = SS._snapshot(root)
    st = live[0]["stats"]
    assert st["value"]["nulls"] == 2 and st["id"]["nulls"] == 0
    assert st["value"]["min"] == 10.0


def test_is_null_read_prunes_zero_null_files(spark, tmp_path):
    root = str(tmp_path / "t")
    SS.append(_frame(spark, [(1, "d1", 10), (2, "d1", 20)]), root, "day",
              stats_cols=("value",))  # zero nulls
    SS.append(
        spark.createDataFrame([(3, "d2", None)], "id int, day string, value double"),
        root, "day", stats_cols=("value",),
    )
    got = SS.read_table(spark, root, where_null="value")
    assert [r["id"] for r in got.collect()] == [3]
    _, live, _ = SS._snapshot(root)
    nullable = {e["path"] for e in live if (e["stats"] or {}).get("value", {}).get("nulls")}
    read = {f for f in got.inputFiles()}
    # only the one nullable batch's files are ever listed to the scan
    assert all(any(f"/{p}/" in f for p in nullable) for f in read) and read


def test_is_null_pruning_survives_checkpoint(spark, tmp_path):
    """Null counts round-trip through the parquet checkpoint's stats
    JSON — pruning still bites after the manifest is checkpointed."""
    root = str(tmp_path / "t")
    SS.append(_frame(spark, [(1, "d1", 10)]), root, "day", stats_cols=("value",))
    SS.append(
        spark.createDataFrame([(2, "d2", None)], "id int, day string, value double"),
        root, "day", stats_cols=("value",),
    )
    for i in range(SS._CHECKPOINT_INTERVAL):
        SS.commit_marker(root, "noop", f"pad-{i}")
    _, cps = SS._list_log(root)
    assert cps, "expected a checkpoint to land"
    got = SS.read_table(spark, root, where_null="value")
    assert [r["id"] for r in got.collect()] == [2]
    _, live, _ = SS._snapshot(root)
    nullable = {e["path"] for e in live if (e["stats"] or {}).get("value", {}).get("nulls")}
    files = got.inputFiles()
    assert files and all(any(f"/{p}/" in f for p in nullable) for f in files)


def test_delete_where_prune_nulls_skips_clean_files(spark, tmp_path):
    root = str(tmp_path / "t")
    SS.append(_frame(spark, [(1, "d1", 10), (2, "d1", 20)]), root, "day",
              stats_cols=("value",))
    SS.append(
        spark.createDataFrame(
            [(3, "d2", None), (4, "d2", 40.0)], "id int, day string, value double"
        ),
        root, "day", stats_cols=("value",),
    )
    _, live_before, _ = SS._snapshot(root)
    clean = next(e for e in live_before if e["stats"]["value"]["nulls"] == 0)
    SS.delete_where(spark, root, "value IS NULL", prune_nulls="value")
    got = _rows(SS.read_table(spark, root))
    assert got == [(1, "d1", 10.0), (2, "d1", 20.0), (4, "d2", 40.0)]
    # the zero-null batch was never touched: still live under its path
    _, live_after, _ = SS._snapshot(root)
    assert clean["path"] in {e["path"] for e in live_after}


# ----------------------------------------------------------------- RESTORE


def test_restore_to_version_rolls_back(spark, tmp_path):
    """RESTORE lands one commit whose live set equals the target
    snapshot's — no data copied, history preserved, CDC nets to the
    rollback delta."""
    root = str(tmp_path / "t")
    SS.append(_frame(spark, [(1, "d1", 10), (2, "d2", 20)]), root, "day")
    good_v = SS.table_version(root)
    SS.overwrite_partitions(_frame(spark, [(1, "d1", 999)]), root, "day")
    SS.append(_frame(spark, [(9, "d9", 90)]), root, "day")
    v = SS.restore(root, version=good_v)
    assert v == SS.table_version(root) and v > good_v
    assert _rows(SS.read_table(spark, root)) == [(1, "d1", 10.0), (2, "d2", 20.0)]
    # history intact: the bad commits are still in the log
    kinds = [h["kind"] for h in SS.history(root)]
    assert kinds == ["append", "overwrite_partitions", "append", "restore"]
    # CDC across the restore nets to the final state from the pre-bad view
    import pyspark.sql.functions as F
    ch = SS.table_changes(spark, root, good_v, v)
    net = (
        ch.withColumn("_s", F.when(F.col("_change_type") == "insert", 1).otherwise(-1))
        .groupBy("id", "day", "value").agg(F.sum("_s").alias("s"))
        .filter(F.col("s") != 0)
    )
    assert net.count() == 0  # round-trip: nothing net-changed since good_v


def test_restore_as_of_and_idempotency(spark, tmp_path):
    root = str(tmp_path / "t")
    SS.append(_frame(spark, [(1, "d1", 10)]), root, "day")
    t_good = SS.history(root)[-1]["timestamp"]
    SS.overwrite_table(_frame(spark, [(2, "d2", 20)]), root, "day")
    v = SS.restore(root, as_of=t_good, idempotency_key="rb-1")
    assert _rows(SS.read_table(spark, root)) == [(1, "d1", 10.0)]
    assert SS.restore(root, as_of=t_good, idempotency_key="rb-1") == v
    with pytest.raises(ValueError, match="exactly one"):
        SS.restore(root, version=1, as_of=t_good)
    with pytest.raises(ValueError, match="exactly one"):
        SS.restore(root)


def test_restore_refuses_vacuumed_target(spark, tmp_path):
    import shutil

    root = str(tmp_path / "t")
    SS.append(_frame(spark, [(1, "d1", 10)]), root, "day")
    SS.overwrite_table(_frame(spark, [(2, "d2", 20)]), root, "day")
    _, old_live, _ = SS._snapshot(root, 1)
    shutil.rmtree(os.path.join(root, old_live[0]["path"]))
    with pytest.raises(SS.NoSuchTableError, match="vacuumed"):
        SS.restore(root, version=1)
    # current state untouched by the failed restore
    assert _rows(SS.read_table(spark, root)) == [(2, "d2", 20.0)]


def test_restore_reinstates_deletion_vectors(spark, tmp_path):
    """Restoring to a DV state re-adds the sidecar: reads re-apply it;
    restoring past the DV un-deletes."""
    root = str(tmp_path / "t")
    SS.append(_frame(spark, [(1, "d1", 10), (2, "d1", 20)]), root, "day")
    v_full = SS.table_version(root)
    SS.delete_where(spark, root, "id = 2", mode="dv")
    v_dv = SS.table_version(root)
    SS.restore(root, version=v_full)
    assert _rows(SS.read_table(spark, root)) == [(1, "d1", 10.0), (2, "d1", 20.0)]
    SS.restore(root, version=v_dv)
    assert _rows(SS.read_table(spark, root)) == [(1, "d1", 10.0)]
