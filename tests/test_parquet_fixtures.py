"""Operators exercised directly on the real /root/testdata parquet.

Round-1 lesson: every unit test built events via ``createDataFrame``
(TIMESTAMP columns), so the parquet scan's TIMESTAMP_NTZ type drift
(Spark 4 ``inferTimestampNTZ``) escaped 91 green tests and crashed the
driver (`unix_micros` requires TIMESTAMP). These tests pin the scan
boundary: real files, real types, at BOTH sf0.001 (nanos-as-long path)
and sf0.01 (NTZ-infer path, where the driver crash happened).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from smartdatapipeline_spark.operators.sessions import sessionize
from smartdatapipeline_spark.operators.temporal import asof_join, range_join_bucketed
from smartdatapipeline_spark.session import load_tables, read_events

SF_SMALL = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"


@pytest.mark.parametrize("sf_dir", [SF_SMALL, SF_MED])
def test_read_events_canonical_timestamp(spark, sf_dir):
    """ts must surface as TIMESTAMP (never TIMESTAMP_NTZ / bigint) so every
    downstream time function (unix_micros, watermarks, lag-gap math) works."""
    ev = read_events(spark, sf_dir)
    assert dict(ev.dtypes)["ts"] == "timestamp"


def test_load_tables_no_ntz_anywhere(spark):
    """No table may leak TIMESTAMP_NTZ past the scan boundary."""
    for name, df in load_tables(spark, SF_MED).items():
        ntz = [c for c, t in df.dtypes if t == "timestamp_ntz"]
        assert not ntz, f"{name} leaked TIMESTAMP_NTZ columns: {ntz}"


@pytest.mark.parametrize("sf_dir", [SF_SMALL, SF_MED])
def test_sessionize_on_parquet(spark, sf_dir):
    """The exact round-1 crash shape: sessionize straight off the parquet
    scan. Cross-check one user's session count against driver-side math."""
    ev = read_events(spark, sf_dir)
    sessions = sessionize(ev, gap_minutes=30)
    # pick the most active user and recompute their sessions in Python
    uid = (
        ev.groupBy("user_id").count().orderBy(F.desc("count"), "user_id").first()[0]
    )
    ts_list = sorted(
        r[0] for r in ev.filter(F.col("user_id") == uid).select("ts").collect()
    )
    gap = dt.timedelta(minutes=30)
    expected = sum(
        1
        for i, t in enumerate(ts_list)
        if i == 0 or (t - ts_list[i - 1]) > gap
    )
    got = sessions.filter(F.col("user_id") == uid).count()
    assert got == expected
    # session invariants over the whole table
    agg = sessions.agg(
        F.sum("n_events").alias("n"), F.count(F.lit(1)).alias("s")
    ).first()
    assert agg["n"] == ev.count()
    assert agg["s"] >= 1
    bad = sessions.filter(F.col("session_end") < F.col("session_start")).count()
    assert bad == 0


def test_asof_join_on_parquet(spark):
    """asof_join over the real events scan: each purchase gets the most
    recent view by the same user. Verified against a window-free
    DuckDB-style reference computed driver-side on one user."""
    ev = read_events(spark, SF_SMALL)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts"), F.col("value").alias("p_value")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("v_ts"), F.col("value").alias("v_value")
    )
    joined = asof_join(
        purchases, views, left_ts="p_ts", right_ts="v_ts", by=["user_id"]
    )
    row = joined.orderBy("user_id", "p_ts").first()
    assert row is not None
    # reference for that user: latest view <= the purchase ts
    uid, pts = row["user_id"], row["p_ts"]
    vts = [
        r[0]
        for r in views.filter(F.col("user_id") == uid).select("v_ts").collect()
        if r[0] <= pts
    ]
    assert row["v_ts"] == max(vts)
    # inclusive semantics: no forward matches anywhere
    assert joined.filter(F.col("v_ts") > F.col("p_ts")).count() == 0


def test_range_join_on_parquet(spark):
    """range_join_bucketed over real parquet: half-open day intervals."""
    ev = read_events(spark, SF_SMALL)
    intervals = spark.createDataFrame(
        [
            ("w1", dt.datetime(2024, 1, 3), dt.datetime(2024, 1, 5)),
            ("w2", dt.datetime(2024, 1, 5), dt.datetime(2024, 1, 6)),
        ],
        "tag string, start timestamp, end timestamp",
    )
    joined = range_join_bucketed(
        ev.select("ts", "event_id"), intervals, left_ts="ts", start="start", end="end"
    )
    expected = ev.filter(
        (
            (F.col("ts") >= "2024-01-03 00:00:00") & (F.col("ts") < "2024-01-05 00:00:00")
        )
        | ((F.col("ts") >= "2024-01-05 00:00:00") & (F.col("ts") < "2024-01-06 00:00:00"))
    ).count()
    assert joined.count() == expected
    # half-open: nothing at-or-after end
    assert joined.filter(F.col("ts") >= F.col("end")).count() == 0


def test_queries_survive_plain_driver_session(spark):
    """The driver imports __spark_entry__ with its OWN plain session —
    none of our factory configs. newSession() reproduces that (fresh
    session-conf state over the shared JVM): the round-1 sessionization
    crash only manifested in exactly this environment. Exercise one
    query per scan family (events NTZ/nanos path, lineitem NTZ path,
    documents, embeddings)."""
    import __spark_entry__ as E

    plain = spark.newSession()
    qs = E.queries()
    for name in ("sessionization", "kpi_daily", "market_share", "asof_checkpoint",
                 "dedup_exact", "cosine_topk"):
        n = qs[name](plain, SF_MED).limit(5).count()
        assert n >= 0, name
