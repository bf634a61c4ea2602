"""Structured Streaming ingest test: files arrive → silver dedup →
gold recompute, across two micro-batch rounds with duplicate rows."""

from __future__ import annotations

import datetime as dt
import os

from smartdatapipeline_spark.streaming.ingest import stream_csv_ingest


def test_stream_ingest_end_to_end(spark, tmp_path):
    inp = tmp_path / "in"
    inp.mkdir()
    silver = str(tmp_path / "silver")
    gold = str(tmp_path / "gold")
    ckpt = str(tmp_path / "ckpt")

    (inp / "f1.csv").write_text(
        "timestamp,value,metric\n"
        "2025-01-01T00:00:00Z,10,m\n"
        "2025-01-01T01:00:00Z,20,m\n"
        "bad-ts,99,m\n"
    )
    q = stream_csv_ingest(spark, str(inp), silver, gold, ckpt)
    q.awaitTermination(120)

    out = {r["metric_date"]: r for r in spark.read.parquet(gold).collect()}
    assert out[dt.date(2025, 1, 1)]["value_sum"] == 30.0
    assert out[dt.date(2025, 1, 1)]["value_count"] == 2  # bad row skipped

    # second file: one duplicate of an already-stored event + one new event
    (inp / "f2.csv").write_text(
        "timestamp,value,metric\n"
        "2025-01-01T00:00:00Z,10,m\n"
        "2025-01-01T02:00:00Z,5,m\n"
    )
    q2 = stream_csv_ingest(spark, str(inp), silver, gold, ckpt)
    q2.awaitTermination(120)

    out = {r["metric_date"]: r for r in spark.read.parquet(gold).collect()}
    # duplicate dropped by anti-join; only the new event added
    assert out[dt.date(2025, 1, 1)]["value_sum"] == 35.0
    assert out[dt.date(2025, 1, 1)]["value_count"] == 3
    assert spark.read.parquet(silver).count() == 3
