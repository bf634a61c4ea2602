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


def test_compact_parquet_reduces_files_and_clusters_ranges(spark, tmp_path):
    """Compaction: 24 shredded files rewrite to the byte-sized count;
    range clustering yields disjoint per-file doc_id min/max (footer
    pruning works)."""
    import glob

    import pyarrow.parquet as pq

    from smartdatapipeline_spark.operators.maintenance import compact_parquet

    src, dest = str(tmp_path / "src"), str(tmp_path / "dest")
    df = spark.range(0, 10_000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 97).alias("v")
    )
    df.repartition(24).write.parquet(src)
    assert len(glob.glob(f"{src}/*.parquet")) == 24

    n = compact_parquet(spark, src, dest, target_mb=128, cluster_cols=("doc_id",))
    files = glob.glob(f"{dest}/*.parquet")
    assert len(files) == n  # tiny data -> 1 file at 128 MB target
    back = spark.read.parquet(dest)
    assert back.count() == 10_000
    assert back.agg(F.sum("doc_id")).first()[0] == sum(range(10_000))

    # force multi-file clustering and verify disjoint ranges
    dest2 = str(tmp_path / "dest2")
    df4 = spark.read.parquet(src).repartitionByRange(4, "doc_id").sortWithinPartitions("doc_id")
    df4.write.parquet(dest2)
    ranges = []
    for f in glob.glob(f"{dest2}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        col = md.row_group(0).column(0)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(0).statistics
            mins.append(st.min); maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    for (a_lo, a_hi), (b_lo, b_hi) in zip(ranges, ranges[1:]):
        assert a_hi < b_lo  # disjoint key ranges -> footer pruning


def test_orc_roundtrip_schema_and_values(spark, tmp_path):
    from smartdatapipeline_spark.sources.readers import read_orc
    from smartdatapipeline_spark.sources.sinks import write_orc

    df = spark.createDataFrame(
        [(1, "a", 1.5, [1, 2]), (2, None, -0.25, [])],
        "k long, s string, v double, arr array<int>",
    )
    write_orc(df, str(tmp_path / "orc_out"))
    back = read_orc(spark, str(tmp_path / "orc_out"))
    assert back.schema == df.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
