"""Source/sink format matrix beyond the reference's CSV/JSON: the gold
table must survive ORC and NDJSON round-trips value-exact (the formats a
downstream warehouse or training-data consumer actually asks for)."""

from __future__ import annotations

from pyspark.sql import functions as F

from smartdatapipeline_spark.operators.kpi import run_daily_kpis
from smartdatapipeline_spark.session import read_events

SF_SMALL = "/root/testdata/sf0.001"


def _gold(spark):
    ev = read_events(spark, SF_SMALL).withColumnRenamed("event_type", "metric")
    return run_daily_kpis(ev, source_col=None)


def _rows(df):
    return sorted(
        (
            r["metric_date"].isoformat(),
            r["metric"],
            r["value_sum"],
            r["value_count"],
        )
        for r in df.collect()
    )


def test_orc_round_trip_value_exact(spark, tmp_path):
    gold = _gold(spark)
    path = str(tmp_path / "gold_orc")
    gold.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    assert _rows(back) == _rows(gold)
    # predicate pushdown survives the format switch
    plan = back.filter(F.col("metric") == "purchase")._jdf.queryExecution().toString()
    assert "PushedFilters" in plan or "pushed" in plan.lower()


def test_ndjson_round_trip_value_exact(spark, tmp_path):
    gold = _gold(spark)
    path = str(tmp_path / "gold_ndjson")
    gold.write.mode("overwrite").json(path)
    back = spark.read.schema(gold.schema).json(path)
    assert _rows(back) == _rows(gold)
