"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship daily-KPI query at sf0.001.
``queries()``   — one callable per implemented operator (SURVEY.md §2).
``oracle_sql()`` — DuckDB-equivalent SQL per query for the correctness gate.

Numeric discipline: every float aggregate is an exact DECIMAL sum cast to
double, and every ratio is double division of those deterministic doubles
(see smartdatapipeline_spark/functions/numeric.py) — bit-identical between
Spark and DuckDB with no rounding tricks.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from smartdatapipeline_spark.functions import crypto as CR
from smartdatapipeline_spark.functions import dedup as DD
from smartdatapipeline_spark.functions import multimodal as MM
from smartdatapipeline_spark.functions import similarity as SIM
from smartdatapipeline_spark.functions import numeric as N
from smartdatapipeline_spark.functions import text as TX
from smartdatapipeline_spark.operators import anomaly as A
from smartdatapipeline_spark.operators import forecast as FC
from smartdatapipeline_spark.operators import kpi as K
from smartdatapipeline_spark.operators import metrics as M
from smartdatapipeline_spark.session import read_events

SF0001 = "/root/testdata/sf0.001"


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet mapped to the silver clean_events shape
    (FIXTURES.md F3): event_type → metric, user_id → distinct field.

    Repartitioned off the single-row-group test file so the decimal
    partial aggregations run on every core (a real cluster gets this
    parallelism from scan splits; see _docs). HASH on user_id, not
    round-robin (r14, measured): keyless repartition pays a local sort
    of its input (sortBeforeRepartition — single-threaded here, the
    file is one scan task), while hash partitioning is sort-free,
    retry-deterministic, and user-grain consumers (sessionization,
    cooccurrence, growth, per-user windows) reuse the layout instead
    of paying a second exchange — user A/B at sf0.1: scan 0.65→0.45 s,
    user-grain agg 0.85→0.40 s. user_id is high-cardinality and
    near-uniform in this corpus (key_skew_report: no single user near
    the hot threshold), so the plain hash layout wins by measurement.

    Skew insurance (r15; guide §2.5): a production deployment with a
    bot user hot enough that ``skew.layout_salt(top1_share, N)`` fires
    sets ``SPARK_GRAFT_EVENTS_SALT`` to that salt — the layout then
    splits each user over up to ``salt`` partitions via a deterministic
    ts-derived secondary hash key (``skew.salted_layout``), bounding
    the largest task at ~top1_share/salt of the rows. Results are
    unchanged either way (partitioning is not observable); user-grain
    consumers pay one extra exchange, which is why the salt is opt-in
    rather than always-on — pinned by
    tests/test_round15_opt.py::test_salted_layout_bounds_hot_key."""
    from smartdatapipeline_spark.functions.skew import salted_layout

    df = read_events(spark, sf_dir)
    salt = int(os.environ.get("SPARK_GRAFT_EVENTS_SALT", "0"))
    return salted_layout(
        df, spark.sparkContext.defaultParallelism, "user_id", salt, "ts"
    )


# ---------------------------------------------------------------- queries

def q_kpi_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A2/A3: daily KPI group-by with exact distinct user count."""
    ev = _events(spark, sf_dir)
    return K.run_daily_kpis(
        ev, metric_col="event_type", distinct_field="user_id", source_col=None
    )


def q_kpi_daily_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5/P6: half-open UTC event-time window + metric filter, then A1."""
    ev = _events(spark, sf_dir)
    return K.run_daily_kpis(
        ev,
        start_date="2024-01-05",
        end_date="2024-01-20",
        metric_name="purchase",
        metric_col="event_type",
        source_col=None,
    )


def q_metric_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: distinct metric names sorted ascending."""
    return K.metric_names(_events(spark, sf_dir), metric_col="event_type")


def q_ingest_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6/A7: ingest stats (count, ts min/max, metrics seen)."""
    return K.ingest_stats(_events(spark, sf_dir), metric_col="event_type")


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-style pricing summary over lineitem — the relational
    aggregate stress query for bench (scan + filter + 2-key hash agg)."""
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    n = F.count(F.lit(1))
    # 2-decimal inputs ⇒ products exact at 4/6 decimals; decimal sums are
    # exact and order-independent (see functions/numeric.py)
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            N.dsum("l_quantity", scale=2).alias("sum_qty"),
            N.dsum("l_extendedprice", scale=2).alias("sum_base_price"),
            N.dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), scale=4).alias(
                "sum_disc_price"
            ),
            N.dsum(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax")),
                scale=6,
            ).alias("sum_charge"),
            (N.dsum("l_quantity", scale=2) / n).alias("avg_qty"),
            (N.dsum("l_extendedprice", scale=2) / n).alias("avg_price"),
            (N.dsum("l_discount", scale=2) / n).alias("avg_disc"),
            n.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def _gold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily gold series per metric: (metric_date, metric, value) where
    value = daily value_sum — the anomaly/forecast input shape (F4)."""
    ev = _events(spark, sf_dir)
    g = K.run_daily_kpis(ev, metric_col="event_type", source_col=None)
    return g.select("metric_date", "metric", F.col("value_sum").alias("value"))


#: DuckDB CTE mirroring _gold() — prefix for the window-function oracles
_GOLD_CTE = """
    WITH gold AS (
        SELECT CAST(ts AS DATE) AS metric_date,
               event_type AS metric,
               CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS value
        FROM events GROUP BY 1, 2
    )
"""

#: shared frame-stat projections (decimal-exact, mirrors anomaly._frame_stats)
def _stats_cte(preceding: int, following: str = "1 PRECEDING") -> str:
    return f"""
    , stats AS (
        SELECT metric, metric_date, value,
               (ROW_NUMBER() OVER (PARTITION BY metric ORDER BY metric_date) - 1) AS pos,
               COUNT(value) OVER f AS n,
               CAST(SUM(CAST(value AS DECIMAL(38,2))) OVER f AS DOUBLE) AS s,
               CAST(SUM(CAST(value * value AS DECIMAL(38,4))) OVER f AS DOUBLE) AS sq
        FROM gold
        WINDOW f AS (PARTITION BY metric ORDER BY metric_date
                     ROWS BETWEEN {preceding} PRECEDING AND {following})
    )
    """


def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1/J2 broadcast-join pattern at TPC-H shape: fact lineitem joins
    orders, then the small dims (customer/nation/region) broadcast —
    one shuffle for the fact-fact join, zero for the dims."""
    T = lambda n: spark.read.parquet(os.path.join(sf_dir, f"{n}.parquet"))  # noqa: E731
    li, orders = T("lineitem"), T("orders")
    cust, nation, region = T("customer"), T("nation"), T("region")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("_rev")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            N.dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), scale=4).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("line_count"),
            F.countDistinct("o_orderkey").alias("order_count"),
        )
        .orderBy("r_name", "n_name")
    )


def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W8 ordering+limit with deterministic tiebreak: top-10 customers by
    order revenue (orderBy + limit ⇒ Spark TakeOrderedAndProject — no
    full sort at scale)."""
    T = lambda n: spark.read.parquet(os.path.join(sf_dir, f"{n}.parquet"))  # noqa: E731
    orders, cust = T("orders"), T("customer")
    return (
        orders.groupBy("o_custkey")
        .agg(
            N.dsum("o_totalprice", scale=2).alias("total_spend"),
            F.count(F.lit(1)).alias("order_count"),
        )
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select("c_custkey", "c_name", "total_spend", "order_count")
        .orderBy(F.col("total_spend").desc(), F.col("c_custkey").asc())
        .limit(10)
    )


def q_topk_days_per_metric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window: top-3 days by value_sum per metric (row_number
    with deterministic tiebreak) — beyond the reference's surface, a
    standard analytics ability."""
    from pyspark.sql import Window

    g = _gold(spark, sf_dir)
    w = Window.partitionBy("metric").orderBy(
        F.col("value").desc(), F.col("metric_date").asc()
    )
    return (
        g.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("metric", "metric_date", "value", "rnk")
    )


def q_kpi_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping sets: ROLLUP(metric, metric_date) subtotals + grand
    total in one pass (partial aggregation handles every grouping set
    map-side)."""
    g = _gold(spark, sf_dir)
    return (
        g.rollup("metric", "metric_date")
        .agg(
            # grouping() must be evaluated inside the rollup aggregation
            F.grouping("metric").alias("g_metric"),
            F.grouping("metric_date").alias("g_date"),
            N.dsum("value", scale=4).alias("total"),
            F.count(F.lit(1)).alias("n_days"),
        )
        .select(
            # label subtotal keys explicitly: NULL date/metric rows are
            # the ROLLUP subtotals ('ALL'), and string keys keep the
            # value-hash comparison engine-neutral (NULL dates stringify
            # differently across frames)
            F.coalesce(F.col("metric"), F.lit("ALL")).alias("metric"),
            F.coalesce(F.col("metric_date").cast("string"), F.lit("ALL")).alias(
                "metric_date"
            ),
            "g_metric",
            "g_date",
            "total",
            "n_days",
        )
    )


def q_json_payload_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2/P9: semi-structured payload handling — parse the bronze-style
    JSON ``props`` column on demand (reference stores raw payloads as
    JSON and parses per use, db/types.py:15-34) and aggregate on the
    extracted field."""
    ev = _events(spark, sf_dir)
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        ev.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("k_sum"),
            F.countDistinct("k").alias("k_distinct"),
        )
        .withColumnRenamed("event_type", "metric")
    )


def q_payload_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encrypted-payload parity (reference db/types.py:15-34 EncryptedJSON,
    security/crypto.py:38-63): AES-GCM encrypt the raw props payload and
    decrypt it back, all JVM-side — n_roundtrip_ok counts decrypt∘encrypt
    = identity per metric, which the oracle pins to COUNT(*). GCM IVs are
    random (semantic security, like Fernet) so the oracle verifies the
    round-trip, not ciphertext bytes."""
    ev = _events(spark, sf_dir)
    rt = CR.decrypt_payload(CR.encrypt_payload("props", CR.TEST_KEY), CR.TEST_KEY).cast("string")
    return (
        ev.withColumn("rt", rt)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("rt").eqNullSafe(F.col("props")), 1).otherwise(0))
            .cast("bigint")
            .alias("n_roundtrip_ok"),
            F.sum(F.octet_length("props")).cast("bigint").alias("payload_bytes"),
        )
        .withColumnRenamed("event_type", "metric")
    )


def _sourced_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with a synthetic 3-way source dimension (user_id % 3) so the
    read path can exercise the source-name broadcast join (SURVEY J1)."""
    return _events(spark, sf_dir).withColumn(
        "source_id", (F.col("user_id") % 3).cast("int")
    )


_SOURCES_ROWS = [(0, "alpha"), (1, "beta"), (2, "gamma")]


def q_metrics_read_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5/P7/W8/J1: the metrics read path — gold slice fetched by
    (source_name via broadcast dim join, metric, inclusive date range),
    ordered desc with a deterministic limit, then output-normalized with
    the unified ``value`` column for agg=avg."""
    gold = K.run_daily_kpis(_sourced_events(spark, sf_dir), metric_col="event_type")
    sources = spark.createDataFrame(_SOURCES_ROWS, "id int, name string")
    out = M.fetch_metric_daily(
        gold,
        metric="purchase",
        source_name="beta",
        sources=sources,
        start_date="2024-01-03",
        end_date="2024-02-10",
        limit=20,
        descending=True,
    )
    return M.normalize_metric_rows(out, agg="avg")


def q_metrics_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9/P7: CSV-export projection — fixed header order
    (metric_date, source_id, metric, value, value_count, value_sum,
    value_avg) with ``value`` mirroring ``value_sum``; callers stream it
    with df.write.csv."""
    gold = K.run_daily_kpis(_sourced_events(spark, sf_dir), metric_col="event_type")
    return M.export_csv_frame(gold, metric="signup", start_date="2024-01-01", end_date="2024-01-31")


def q_value_fallback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8: unified-value coalesce chain value → value_sum → value_avg →
    value_count (reference routers/anomaly_iforest.py:67-72). The gold
    frame is sparsified so every fallback stage is exercised."""
    gold = K.run_daily_kpis(_events(spark, sf_dir), metric_col="event_type", source_col=None)
    staged = gold.select(
        "metric_date",
        "metric",
        # null out value_sum on even days, value_avg too on day%3==0
        F.when(F.dayofmonth("metric_date") % 2 == 1, F.col("value_sum")).alias("value_sum"),
        F.when(F.dayofmonth("metric_date") % 3 != 0, F.col("value_avg")).alias("value_avg"),
        F.col("value_count"),
    )
    return M.value_fallback(staged)


def q_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time tumbling-window KPIs (6h) — the Structured Streaming
    aggregation operator run in batch mode (same code path; a streaming
    caller adds a watermark to bound state)."""
    from smartdatapipeline_spark.streaming.windows import windowed_kpis

    ev = _events(spark, sf_dir).withColumnRenamed("event_type", "metric")
    return windowed_kpis(ev, window="6 hours")


def q_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30 min) per user — batch twin of the
    applyInPandasWithState streaming operator (identical semantics,
    pinned by tests/test_streaming.py)."""
    from smartdatapipeline_spark.operators.sessions import sessionize

    return sessionize(_events(spark, sf_dir), gap_minutes=30)


def q_rolling_zscore_strict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: strict prior-window z-score (window=7, pstdev, all-present gate)."""
    return A.rolling_zscore_strict(_gold(spark, sf_dir), window=7, z_thresh=3.0)


def q_rolling_zscore_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: public-API rolling z-score (window=7, ddof=1, flat-window 1e9)."""
    return A.rolling_zscore_api(_gold(spark, sf_dir), window=7, z_thresh=3.0)


def q_iforest_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: rolling 7-day mean/std(ddof=0)/diff feature block."""
    return A.iforest_features(_gold(spark, sf_dir))


def q_anomaly_iforest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M6: IsolationForest ladder — with sklearn absent (this container),
    the reference-specified rolling-z proxy is the live path."""
    return A.anomaly_iforest(_gold(spark, sf_dir))


def q_date_spine_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5: daily gap fill — sparsify gold (drop low-sum days) then re-index
    every calendar day per metric with 0.0 fills."""
    sparse = _gold(spark, sf_dir).filter(F.col("value") > 2500.0)
    return FC.fill_date_spine(sparse)


def q_forecast_naive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2: the naive-model ladder — the reference's documented
    SARIMAX-unavailable degradation: yhat = last value, bounds = 0.0
    (services/forecast.py:57-66). Called directly (the ``forecast``
    dispatcher now degrades to the from-scratch ARIMA instead — see
    ``forecast_arima`` for that path's oracle)."""
    return FC.forecast_naive(_gold(spark, sf_dir), horizon_days=7)


def q_forecast_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1 grouped-map path with REAL per-group numpy math: the drift
    model (yhat = last + h·slope, Gaussian drift CIs) runs inside the
    same ``applyInPandas`` plumbing the reference's SARIMAX slot uses
    (services/forecast.py:39-92), so the model-fit path is validated
    end-to-end against the SQL oracle — not just injected constants."""
    return FC.forecast_drift(_gold(spark, sf_dir), horizon_days=7)


def q_forecast_arima(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1: from-scratch numpy ARIMA(1,1,1), CSS lattice estimation —
    the reference SARIMAX slot (services/forecast.py:39-92) with real
    model math and no statsmodels; oracle = the identical recursion as a
    DuckDB list_reduce + recursive-CTE program (bit-exact)."""
    return FC.forecast_arima(_gold(spark, sf_dir), horizon_days=7)


def q_anomaly_iforest_numpy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M6 with real model math: from-scratch numpy isolation forest
    (200 trees, per-series crc32 seed) through the same applyInPandas
    shape as the sklearn path. Randomized-ensemble scores are not
    SQL-expressible — driver records the rows-only check; the math is
    pinned by tests/test_anomaly.py goldens."""
    return A.anomaly_iforest_numpy(_gold(spark, sf_dir))


def q_anomaly_iforest_4d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M7: the 4-D service-variant isolation forest (reference
    services/anomaly_iforest.py:25-47, n_estimators=100) over the W3
    feature block — from-scratch numpy forest when sklearn is absent.
    Randomized ensemble ⇒ rows-only driver check (like
    anomaly_iforest_numpy); the model math is pinned by golden tests."""
    return A.anomaly_iforest_4d(_gold(spark, sf_dir))


def q_forecast_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1: public contract — bounds widened to include yhat, 7 rows padded
    forward with zeros, UTC-midnight Z strings. Input trimmed to 4 rows
    per metric to exercise the pad path."""
    from pyspark.sql import Window

    fc = FC.forecast_naive(_gold(spark, sf_dir), horizon_days=7)
    w = Window.partitionBy("metric").orderBy("target_date")
    short = fc.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= 4)
    return FC.normalize_forecast_contract(short.drop("_rn"))


def q_strictly_future(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2: only target_date > last observed day, capped at 7 — fed a
    deliberately overlapping ±10-day candidate set."""
    gold = _gold(spark, sf_dir)
    cand = (
        gold.groupBy("metric")
        .agg(F.max("metric_date").alias("_last"), F.max_by("value", "metric_date").alias("_v"))
        .select(
            "metric",
            F.explode(
                F.sequence(F.date_add(F.col("_last"), -2), F.date_add(F.col("_last"), 10))
            ).alias("target_date"),
            F.col("_v").alias("yhat"),
            F.lit(0.0).alias("yhat_lower"),
            F.lit(0.0).alias("yhat_upper"),
        )
    )
    return FC.strictly_future(cand, gold)


def q_persistence_mape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4/M8: one-step persistence MAPE over the last 21 days per metric."""
    return FC.persistence_mape(_gold(spark, sf_dir), window_n=20)


def q_backtest_folds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6: rolling-origin backtest per-fold metrics (naive model)."""
    folds, _ = FC.rolling_backtest(_gold(spark, sf_dir), folds=3, horizon=7, window_n=14)
    return folds.select("metric", "fold_index", "mae", "rmse", "mape", "smape")


def q_backtest_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4: backtest aggregate + 0-100 composite score."""
    _, summary = FC.rolling_backtest(_gold(spark, sf_dir), folds=3, horizon=7, window_n=14)
    return summary


def q_reliability_folds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W7: reliability per-fold metrics (naive model, 1e-9 epsilons, bias)."""
    folds, _ = FC.reliability(_gold(spark, sf_dir), days=30, folds=3, horizon=7)
    return folds.select("metric", "fold_index", "mae", "rmse", "mape", "smape", "bias")


def q_reliability_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M5: reliability score = int(clamp(100 − mape/2 − instability))."""
    _, summary = FC.reliability(_gold(spark, sf_dir), days=30, folds=3, horizon=7)
    return summary


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Repartition the compact (doc_id, text) rows by doc_id before the
    # CPU-heavy per-doc operators (shingle/minhash/simhash hashing):
    # a single-row-group file otherwise pins the whole hash computation
    # to one scan task, and downstream groupBy(doc_id) reuses this
    # partitioning so the aggregation adds no second shuffle.
    df = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return df.repartition(spark.sparkContext.defaultParallelism, "doc_id")


def q_chunk_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-sequence chunking: 32-token windows, 8-token overlap —
    array expressions + posexplode, no shuffle."""
    return TX.chunk_tokens(_docs(spark, sf_dir), chunk_tokens_n=32, overlap=8)


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub: email/phone redaction with typed placeholders + match
    counts. Every 5th doc gets synthetic PII appended so the redaction
    path is exercised, not just the zero-match fast path."""
    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.lit(" contact: jane.doe@example.com or +1 555-123-4567"),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return TX.scrub_pii(d).select(
        "doc_id",
        F.md5(F.col("text")).alias("scrubbed_md5"),
        "n_email",
        "n_phone",
    )


def q_repetition_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals: duplicate word-3-gram fraction
    (per-row array math) + most-frequent-2-gram fraction (explode +
    two-level aggregation)."""
    return TX.repetition_features(_docs(spark, sf_dir))


def q_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: top-50 tokens by frequency (explode → count →
    TakeOrdered; deterministic tiebreak on token)."""
    d = _docs(spark, sf_dir).select(F.explode(TX.tokens(F.col("text"))).alias("token"))
    return (
        d.filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("token").asc())
        .limit(50)
    )


def q_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment by salted id hash —
    stable under appends and identical on any engine/cluster size."""
    from smartdatapipeline_spark.functions.sampling import hash_split

    d = _docs(spark, sf_dir).select("doc_id")
    return hash_split(d, weights={"train": 90, "val": 5, "test": 5})


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 20-per-language sample of the corpus (salted-hash
    rank within stratum) — reproducible balanced subsets."""
    from smartdatapipeline_spark.functions.sampling import stratified_sample

    d = _docs(spark, sf_dir).select("doc_id", "lang")
    return stratified_sample(d, "lang", 20)


def q_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc type-token ratio + Simpson repeat-probability index —
    the transcendental-free entropy stand-ins (exact integer ratios,
    bit-exact cross-engine). Docs with zero non-empty tokens are
    absent, mirrored by the oracle."""
    return TX.lexical_diversity(_docs(spark, sf_dir)).orderBy("doc_id")


def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-order 3-gram novelty: the fraction of each doc's distinct
    shingles first seen at that doc — diversity contribution / template
    detection, one shuffle on the gram."""
    return TX.ngram_novelty(_docs(spark, sf_dir)).orderBy("doc_id")


def q_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broder containment |A∩B|/|A| ≥ 0.5 — catches short docs
    quoted/aggregated inside long ones, which Jaccard-thresholded dedup
    structurally misses (the union term dilutes the score). Directed
    pairs; exact integer set algebra — functions/dedup.py
    containment_pairs. The final orderBy rides through propagate_caches
    so the cached shingle frame's ownership survives to bench.py's
    release (a bare .orderBy() returns a NEW DataFrame object without
    the _sdp_caches attribute — the round-4 leak hole)."""
    from smartdatapipeline_spark.cachetrack import propagate_caches

    raw = DD.containment_pairs(_docs(spark, sf_dir))
    return propagate_caches(raw, raw.orderBy("doc_a", "doc_b"))


def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023) in the repo's exact-
    rational form: hashed word-bigram features (4096 buckets), target
    distribution = English docs, raw = whole corpus; per-doc weight is
    the smoothed linear likelihood ratio. Every intermediate is an
    exact integer; the only doubles are four correctly-rounded casts +
    three IEEE ops, mirrored op-for-op by the oracle — bit-exact."""
    from smartdatapipeline_spark.cachetrack import propagate_caches
    from smartdatapipeline_spark.functions.sampling import importance_weights

    d = _docs(spark, sf_dir).select("doc_id", "text", "lang")
    raw = importance_weights(d, F.col("lang") == "en")
    return propagate_caches(raw, raw.orderBy("doc_id"))


def q_dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DSIR selection step: top-100 docs by importance weight
    (deterministic id tiebreak) — the keep-list a target-domain
    curation run actually ships."""
    from smartdatapipeline_spark.cachetrack import propagate_caches
    from smartdatapipeline_spark.functions.sampling import (
        importance_resample,
        importance_weights,
    )

    d = _docs(spark, sf_dir).select("doc_id", "text", "lang")
    raw = importance_weights(d, F.col("lang") == "en")
    return propagate_caches(raw, importance_resample(raw, 100))


def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-bin value histogram per metric (width_bucket over [0, 100],
    10 bins) — the distribution profile behind quality dashboards."""
    ev = _events(spark, sf_dir)
    return (
        ev.select(
            F.col("event_type").alias("metric"),
            F.width_bucket(F.col("value"), F.lit(0.0), F.lit(100.0), F.lit(10)).alias(
                "bucket"
            ),
        )
        .groupBy("metric", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_top_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anomaly triage: the 5 most severe points per metric by |z| from
    the API rolling z-score (W2 + ranking window)."""
    from pyspark.sql import Window

    z = A.rolling_zscore_api(_gold(spark, sf_dir), window=7, z_thresh=3.0)
    w = Window.partitionBy("metric").orderBy(
        F.abs(F.col("z")).desc(), F.col("metric_date").asc()
    )
    return (
        z.filter(F.col("z").isNotNull())
        .withColumn("sev_rank", F.row_number().over(w))
        .filter(F.col("sev_rank") <= 5)
        .select("metric", "metric_date", "value", "z", "is_outlier", "sev_rank")
    )


def q_crossmodal_consensus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal dedup consensus: full-outer join of text-side MinHash
    candidate pairs and embedding-side cosine near-dup pairs (vec_id ≡
    doc_id in the testdata) with an agreement class per pair — the
    signal fusion step a production dedup pipeline runs before deciding
    what to drop."""
    from smartdatapipeline_spark.cachetrack import propagate_caches

    _tp_raw = DD.minhash_candidate_pairs(_docs(spark, sf_dir))
    text_pairs = _tp_raw.select("doc_a", "doc_b", "est_jaccard")
    emb_pairs = SIM.embedding_near_dup_pairs(
        _emb(spark, sf_dir), threshold=0.25, nbits=8
    ).select(
        F.col("vec_a").alias("doc_a"),
        F.col("vec_b").alias("doc_b"),
        "cos_sim",
    )
    j = text_pairs.join(emb_pairs, ["doc_a", "doc_b"], "full_outer")
    agreement = (
        F.when(F.col("est_jaccard").isNotNull() & F.col("cos_sim").isNotNull(), "both")
        .when(F.col("est_jaccard").isNotNull(), "text_only")
        .otherwise("embedding_only")
    )
    out = j.select(
        "doc_a", "doc_b", "est_jaccard", "cos_sim", agreement.alias("agreement")
    )
    # the signature cache's ownership attribute does not survive the
    # .select above — re-attach it so bench's release frees it per rep
    return propagate_caches(_tp_raw, out)


def q_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster formation: SimHash radius-3 pairs → connected
    components (iterative min-label propagation) → (doc_id, cluster)
    where cluster = min reachable doc id — the dedup keep-list's
    representative assignment."""
    d = _docs(spark, sf_dir)
    pairs = DD.simhash_near_pairs(d, max_hamming=3)
    return DD.duplicate_clusters(pairs, d)


def q_text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text analysis: whitespace token count + BPE-ish piece estimate."""
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        TX.token_count(F.col("text")).alias("n_tokens"),
        TX.bpe_piece_count(F.col("text")).alias("n_pieces"),
    )


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: whole-document 60-bit md5 fingerprint +
    min-k-gram (winnowing-style) robust fingerprint."""
    d = _docs(spark, sf_dir).withColumn("_toks", TX.tokens(F.col("text")))
    return d.select(
        "doc_id",
        TX.fingerprint64(F.col("text")).alias("fp64"),
        TX.winnow_fingerprint(F.col("_toks"), k=5).alias("winnow_fp"),
    )


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: char/token ratios + composite 0-1 score."""
    return TX.quality_features(_docs(spark, sf_dir))


def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID via stopword profiles; deterministic
    first-profile-wins argmax."""
    d = _docs(spark, sf_dir).withColumn("_toks", TX.tokens(F.col("text")))
    return d.select(
        "doc_id",
        F.col("lang").alias("lang_true"),
        TX.predict_lang(F.col("_toks")).alias("lang_pred"),
    ).withColumn("correct", F.col("lang_true") == F.col("lang_pred"))


def q_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical training-data cleaning recipe as ONE pipeline:
    quality gate (composite ≥ 0.5) → language filter (predicted en) →
    exact-dedup representative selection (min doc_id per fingerprint).
    Each stage is the already-oracle-checked operator; this pins their
    composition."""
    from pyspark.sql import Window

    # Two feature branches, each sealed behind a trivial groupBy(doc_id):
    # predicate pushdown substitutes full expression trees into pushed
    # filter conditions (no cost guard), so filtering directly on the
    # projections re-evaluates predict_lang/quality once per predicate.
    # An aggregation is a pushdown BARRIER — non-key predicates stay
    # above it — and costs only a shuffle of 3 compact columns, after
    # which the doc_id join is co-partitioned for free.
    d = _docs(spark, sf_dir).withColumn("_toks", TX.tokens(F.col("text")))
    pred = (
        d.select(
            "doc_id",
            TX.predict_lang(F.col("_toks")).alias("lang_pred"),
            TX.fingerprint64(F.col("text")).alias("fingerprint"),
        )
        .groupBy("doc_id")
        .agg(F.first("lang_pred").alias("lang_pred"), F.first("fingerprint").alias("fingerprint"))
    )
    qf = (
        TX.quality_features(_docs(spark, sf_dir))
        .select("doc_id", "n_tokens", "quality")
        .groupBy("doc_id")
        .agg(F.first("n_tokens").alias("n_tokens"), F.first("quality").alias("quality"))
    )
    filt = (
        pred.join(qf, "doc_id")
        .filter((F.col("quality") >= 0.5) & (F.col("lang_pred") == "en"))
    )
    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    return (
        filt.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("doc_id", "lang_pred", "n_tokens", "quality", "fingerprint")
    )


def q_quality_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped distribution stats: exact continuous percentiles (p50/p90)
    of the quality score per true language — the corpus-health dashboard
    aggregate. Exact ``percentile`` (both engines interpolate identically
    on sorted doubles); at 100 TB swap to approx_percentile and drop the
    oracle."""
    qf = TX.quality_features(_docs(spark, sf_dir))
    langs = _docs(spark, sf_dir).select("doc_id", "lang")
    return (
        qf.join(langs, "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.expr("percentile(quality, 0.5)").alias("q50"),
            F.expr("percentile(quality, 0.9)").alias("q90"),
            F.min("quality").alias("q_min"),
            F.max("quality").alias("q_max"),
        )
        .orderBy("lang")
    )


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: binary column + Arrow-batched mapInPandas
    feature extraction (md5-derived deterministic features stand in for
    a model forward pass; real header decode is `image_decode` /
    `audio_decode`; real pixel decode is `png_pixel_decode` /
    `jpeg_pixel_decode` — codec-free since r6)."""
    d = MM.attach_blob(_docs(spark, sf_dir))
    return MM.extract_features(d)


def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-analog frame sampling: 4 evenly-spaced 16-byte windows per
    payload, hashed — pure binary column expressions."""
    d = MM.attach_blob(_docs(spark, sf_dir))
    return MM.sample_frames(d, n_frames=4, frame_bytes=16)


def _be_hex(col: F.Column, nbytes: int) -> F.Column:
    """Big-endian fixed-width hex of an int column (JVM-side)."""
    return F.lpad(F.hex(col), 2 * nbytes, "0")


def _le_hex(col: F.Column, nbytes: int) -> F.Column:
    """Little-endian fixed-width hex of an int column (JVM-side)."""
    return F.concat(
        *[
            F.lpad(F.hex(F.pmod(F.floor(col / F.lit(256 ** i)), 256)), 2, "0")
            for i in range(nbytes)
        ]
    )


def q_image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode end-to-end: Spark builds valid PNG/GIF/BMP/JPEG
    headers from doc_id with JVM binary expressions (unhex of hex
    concat), then the stdlib parser (functions/multimodal.py
    parse_image_header) decodes them inside Arrow-batched mapInPandas.
    The oracle recomputes (format, width, height) from doc_id directly —
    any decode bug breaks the match."""
    d = _docs(spark, sf_dir).select("doc_id")
    w = (F.pmod(F.col("doc_id"), 509) + 16).cast("long")
    h = (F.pmod(F.col("doc_id"), 253) + 16).cast("long")
    fmt = F.pmod(F.col("doc_id"), 4)
    png = F.concat(
        F.lit("89504E470D0A1A0A0000000D49484452"),
        _be_hex(w, 4), _be_hex(h, 4), F.lit("0806000000"),
    )
    gif = F.concat(F.lit("474946383961"), _le_hex(w, 2), _le_hex(h, 2), F.lit("00"))
    bmp = F.concat(
        F.lit("424D1A000000000000001A00000028000000"),
        _le_hex(w, 4), _le_hex(h, 4),
    )
    jpeg = F.concat(F.lit("FFD8FFC0001108"), _be_hex(h, 2), _be_hex(w, 2))
    blob = F.unhex(
        F.when(fmt == 0, png).when(fmt == 1, gif).when(fmt == 2, bmp).otherwise(jpeg)
    )
    return MM.decode_image_features(d.withColumn("blob", blob))


def q_png_pixel_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PNG PIXEL decode end-to-end (round 6 — the compressed-
    format gap closed, stdlib-only): an Arrow-batched encoder builds a
    valid 8-bit PNG per doc (width/height/color-type and every pixel
    byte are formulas of doc_id; scanline filters cycle 0..4 so
    None/Sub/Up/Average/Paeth ALL exercise), functions/multimodal.py
    ``decode_png_pixels`` inflates + reverse-filters it back, and the
    pixel summary (byte sum, first/last byte) is computed JVM-side from
    the decoded binary via hex/conv expressions. The oracle recomputes
    width/height/channels/sum/first/last from doc_id arithmetic alone —
    any defect in chunk walk, CRC, inflate, or any filter reversal
    breaks the bit-exact match."""
    import pandas as pd
    from pyspark.sql import types as PT

    d = _docs(spark, sf_dir).select("doc_id")
    enc_schema = PT.StructType(
        [d.schema["doc_id"], PT.StructField("blob", PT.BinaryType())]
    )

    def _enc(batches):
        from smartdatapipeline_spark.functions.multimodal import encode_png

        for pdf in batches:
            blobs = []
            for did in pdf["doc_id"]:
                did = int(did)
                w = did % 13 + 1
                h = did % 11 + 1
                ch = (1, 3, 2, 4)[did % 4]
                px = bytes(
                    (did * 31 + j * 7) % 256 for j in range(w * h * ch)
                )
                blobs.append(encode_png(w, h, ch, px))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "blob": blobs})

    dec = MM.decode_png_pixels(d.mapInPandas(_enc, schema=enc_schema))
    hexed = dec.withColumn("_hex", F.hex("pixels"))
    n = F.octet_length("pixels").cast("int")

    def byte_at(i):  # i: 0-based byte index (Column) → unsigned value
        return F.conv(F.col("_hex").substr(i * 2 + 1, F.lit(2)), 16, 10).cast(
            "long"
        )

    return hexed.select(
        "doc_id",
        "width",
        "height",
        "n_channels",
        F.aggregate(
            F.sequence(F.lit(0), n - 1),
            F.lit(0).cast("long"),
            lambda acc, i: acc + byte_at(i),
        ).alias("pixel_sum"),
        byte_at(F.lit(0)).alias("first_px"),
        byte_at(n - 1).alias("last_px"),
    )


def q_jpeg_pixel_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline-JPEG PIXEL decode end-to-end (round 6 — the LAST
    compressed-format gap closed, no codec library): an Arrow-batched
    from-scratch T.81 encoder builds a grayscale JPEG per doc whose 8×8
    blocks are each uniform (value a formula of doc_id and the block
    coordinates; every third doc also gets DRI/RSTn restart intervals
    so the restart path is exercised), functions/multimodal.py
    ``decode_jpeg_pixels`` Huffman-decodes + IDCTs it back, and the
    pixel summary is computed JVM-side from the decoded binary.

    Block-uniform gray content with all-ones quant tables round-trips
    BIT-EXACTLY (only the DC coefficient is nonzero and 8·(v−128)/8 is
    float-exact), so the DuckDB oracle recomputes every pixel from
    doc_id arithmetic alone — any defect in the marker walk, Huffman
    tables, zigzag, dequantize, IDCT, or restart handling breaks the
    match."""
    import pandas as pd
    from pyspark.sql import types as PT

    d = _docs(spark, sf_dir).select("doc_id")
    enc_schema = PT.StructType(
        [d.schema["doc_id"], PT.StructField("blob", PT.BinaryType())]
    )

    def _enc(batches):
        from smartdatapipeline_spark.functions.multimodal import encode_jpeg

        for pdf in batches:
            blobs = []
            for did in pdf["doc_id"]:
                did = int(did)
                w = did % 17 + 1
                h = did % 13 + 1
                px = bytes(
                    (did * 37 + (x // 8) * 11 + (y // 8) * 5) % 256
                    for y in range(h)
                    for x in range(w)
                )
                blobs.append(
                    encode_jpeg(
                        w, h, 1, px,
                        restart_interval=2 if did % 3 == 0 else 0,
                    )
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "blob": blobs})

    dec = MM.decode_jpeg_pixels(d.mapInPandas(_enc, schema=enc_schema))
    hexed = dec.withColumn("_hex", F.hex("pixels"))
    n = F.octet_length("pixels").cast("int")

    def byte_at(i):
        return F.conv(F.col("_hex").substr(i * 2 + 1, F.lit(2)), 16, 10).cast(
            "long"
        )

    return hexed.select(
        "doc_id",
        "width",
        "height",
        "n_channels",
        F.aggregate(
            F.sequence(F.lit(0), n - 1),
            F.lit(0).cast("long"),
            lambda acc, i: acc + byte_at(i),
        ).alias("pixel_sum"),
        byte_at(F.lit(0)).alias("first_px"),
        byte_at(n - 1).alias("last_px"),
    )


def q_audio_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL WAV decode end-to-end: Spark builds RIFF/WAVE headers from
    doc_id (channels/rate/sample-count formulas), the stdlib chunk
    walker (parse_wav_header) decodes them in mapInPandas, and the
    oracle recomputes every field from doc_id."""
    d = _docs(spark, sf_dir).select("doc_id")
    channels = (F.pmod(F.col("doc_id"), 2) + 1).cast("long")
    rate = ((F.pmod(F.col("doc_id"), 3) + 1) * 8000).cast("long")
    block = channels * 2  # 16-bit samples
    n_samples = (F.pmod(F.col("doc_id"), 1000) + 1).cast("long")
    data_size = n_samples * block
    blob = F.unhex(
        F.concat(
            F.lit("52494646"), _le_hex(data_size + 36, 4), F.lit("57415645"),
            F.lit("666D7420"), F.lit("10000000"), F.lit("0100"),
            _le_hex(channels, 2), _le_hex(rate, 4), _le_hex(rate * block, 4),
            _le_hex(block, 2), F.lit("1000"),
            F.lit("64617461"), _le_hex(data_size, 4),
        )
    )
    return MM.decode_audio_features(d.withColumn("blob", blob))


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content fingerprint. The corpus is self-unioned
    with shifted ids so every group genuinely has 2 members — exercising
    representative selection, not just hashing."""
    d = _docs(spark, sf_dir).select("doc_id", "text")
    doubled = d.unionByName(d.withColumn("doc_id", F.col("doc_id") + 100000))
    return DD.exact_dedup(doubled)


def q_minhash_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash LSH banding: (doc_id, band, bucket) long-form — the
    shuffle key space for candidate generation."""
    sig = DD.minhash_signature(_docs(spark, sf_dir))
    return DD.minhash_bands(sig, bands=4, rows=4)


def q_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash LSH candidate pairs with signature-estimated Jaccard."""
    return DD.minhash_candidate_pairs(_docs(spark, sf_dir))


def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard over shared-shingle candidate pairs."""
    return DD.ngram_jaccard_pairs(_docs(spark, sf_dir), threshold=0.05)


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit SimHash fingerprint per document."""
    return DD.simhash(_docs(spark, sf_dir))


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag train/val docs whose 3-gram
    shingles overlap the held-out test split (broadcast semi-join of the
    tiny eval shingle set against the corpus scan)."""
    from smartdatapipeline_spark.functions.sampling import hash_split

    d = _docs(spark, sf_dir)
    split = hash_split(d.select("doc_id", "text"), weights={"train": 90, "val": 5, "test": 5})
    eval_docs = split.filter(F.col("split") == "test").select("doc_id", "text")
    train_docs = split.filter(F.col("split") != "test").select("doc_id", "text")
    return DD.decontaminate(train_docs, eval_docs, min_overlap_frac=0.2)


def q_scrub_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPAN-level decontamination (PaLM-style 13-gram window removal):
    contaminated windows are masked out of the text, the rest survives —
    the surgical alternative to doc-level decontaminate. Pure column
    math; oracle replicates the mask algebra in DuckDB list ops."""
    from smartdatapipeline_spark.functions.sampling import hash_split

    d = _docs(spark, sf_dir)
    split = hash_split(
        d.select("doc_id", "text"), weights={"train": 90, "val": 5, "test": 5}
    )
    eval_docs = split.filter(F.col("split") == "test").select("doc_id", "text")
    train_docs = split.filter(F.col("split") != "test").select("doc_id", "text")
    return DD.scrub_contaminated_spans(train_docs, eval_docs, window=13, k=3)


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: concat-and-split layout of docs into 64-token
    context windows across 8 shards (per-shard prefix-sum window)."""
    return TX.pack_sequences(_docs(spark, sf_dir), ctx_len=64, n_shards=8)


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs via 15-bit block banding + Hamming filter."""
    # radius 3 = bands−1: the 4×15-bit pigeonhole banding has EXACT
    # recall at Hamming ≤ 3, and keeps the pair output near-dup-sized
    # (radius 20 on this corpus emits 2.3M pairs — 18% of all pairs).
    return DD.simhash_near_pairs(_docs(spark, sf_dir), max_hamming=3)


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Repartition: a single-row-group file otherwise leaves the whole
    # pairwise dot-product space on one scan task (see _docs).
    df = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return df.repartition(spark.sparkContext.defaultParallelism, "vec_id")


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 for every 50th vector as query —
    the exact baseline every ANN variant is measured against."""
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    return SIM.brute_force_topk(emb, queries, k=10)


def q_ann_bucketed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN: sign-LSH bucket (8 bits) + exact re-rank within bucket —
    the 100 TB path (corpus partitioned by bucket, per-query probe)."""
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    return SIM.ann_bucketed_topk(emb, queries, k=10, nbits=8)


def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: fixed-centroid coarse quantization (vec_id < 16),
    nprobe=1 cell probe, exact cosine re-rank — the trained-quantizer
    pipeline with a deterministic stand-in quantizer."""
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    return SIM.ivf_topk(emb, queries, k=10, n_centroids=16)


def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs within sign-LSH buckets."""
    return SIM.embedding_near_dup_pairs(_emb(spark, sf_dir), threshold=0.25, nbits=8)


# ------------------------------------------------- temporal joins / sketches

def q_ivf_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with TRAINED MLlib KMeans centroids (seeded) and MULTI-PROBE
    (r14; r13 VERDICT #6 — the FAISS ``nprobe`` recall lever): queries
    fan out to their 8 nearest of 16 cells, lifting recall@10 from 0.30
    (single-probe) to 0.90 at sf0.01 while still scanning only the
    probed cells' inverted lists — at production cell counts (|C|≈√N)
    P=8 probes a vanishing corpus fraction. Randomized-init training ⇒
    rows-only driver check; the recall floor (0.60) is enforced by the
    local property harness (p_ivf_kmeans_topk)."""
    emb = _emb(spark, sf_dir)
    # r14: train once per corpus snapshot (the model is 16 centroid
    # rows of driver state), probe everywhere — the same build/score
    # split as _PQ_CODEBOOKS / _BPE_MERGES / _QUALITY_COEF
    if sf_dir not in _KMEANS_CENTS:
        _KMEANS_CENTS[sf_dir] = [
            (r["cent_id"], r["_cv"], r["_cn"])
            for r in SIM.kmeans_centroids(emb, k=16, seed=42).collect()
        ]
    cents = spark.createDataFrame(
        _KMEANS_CENTS[sf_dir], "cent_id int, _cv array<double>, _cn double"
    )
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    return SIM.ivf_topk_with_centroids(emb, queries, cents, k=10, nprobe=8)


def q_minhash_lsh_mllib(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLlib MinHashLSH approxSimilarityJoin candidate pairs (seeded;
    MLlib's hash family isn't SQL-replicable ⇒ rows-only driver check;
    the from-scratch minhash_pairs stays the oracle-checked path)."""
    return DD.minhash_lsh_pairs_mllib(_docs(spark, sf_dir))


#: per-corpus coefficient memo — the production shape is build-once /
#: score-everywhere (functions/classify.build_quality_model); a repeated
#: query call must not refit a convex model whose inputs didn't change.
_QUALITY_COEF: dict[str, dict[str, float]] = {}

#: per-corpus trained IVF coarse quantizer (16 centroid rows) — train
#: once per snapshot, probe everywhere (r14; same memo pattern as
#: _PQ_CODEBOOKS)
_KMEANS_CENTS: dict[str, list] = {}


def _quality_model_for(spark: SparkSession, sf_dir: str) -> dict[str, float]:
    from smartdatapipeline_spark.functions import classify as CL

    if sf_dir not in _QUALITY_COEF:
        # r14: one featurization pass — labels and fit vectors from the
        # same quality_features projection (the former join-back +
        # per-side re-featurization tripled the tokenize work)
        _QUALITY_COEF[sf_dir] = CL.build_quality_model_extremes(
            _docs(spark, sf_dir), pos_min=0.62, neg_max=0.55
        )
    return _QUALITY_COEF[sf_dir]


def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-3-shape model-based quality filter (Brown et al. 2020 Appx
    A): LR trained on the corpus's own hand-score extremes (top vs
    bottom tercile — deterministic weak labels), scores every doc, and
    applies the hash-realized Pareto keep rule. Train/score are SPLIT
    (round-3 VERDICT #5): the fit runs once per corpus snapshot
    (memoized here; ``corpus/quality_model_build`` is the benched
    training step) and scoring replays the |FEATURES|+1 coefficients as
    pure column math. L-BFGS training ⇒ rows-only driver check;
    separation and MLlib-parity pinned by tests."""
    from smartdatapipeline_spark.functions import classify as CL

    coef = _quality_model_for(spark, sf_dir)
    return CL.pareto_keep(CL.score_quality_linear(_docs(spark, sf_dir), coef))


def q_asof_checkpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (beyond reference surface; SURVEY §2.3 notes their
    absence): attach to every event the most recent per-metric
    "checkpoint" at-or-before its timestamp. Checkpoints are the sparse
    set of above-average gold days, so match distance genuinely varies
    and early events drop (inner ASOF semantics). Oracle: DuckDB's
    native ASOF JOIN. One shuffle on (metric), no pair space —
    operators/temporal.py."""
    from pyspark.sql import Window

    from smartdatapipeline_spark.operators import temporal as T

    ev = _events(spark, sf_dir).select(
        "event_id", F.col("event_type").alias("metric"), "ts", "value"
    )
    g = _gold(spark, sf_dir)
    wm = Window.partitionBy("metric")
    ck = (
        g.withColumn(
            "_avg",
            F.sum(F.col("value").cast("decimal(38,4)")).over(wm).cast("double")
            / F.count(F.lit(1)).over(wm),
        )
        .filter(F.col("value") > F.col("_avg"))
        .select(
            "metric",
            F.col("metric_date").cast("timestamp").alias("ck_ts"),
            F.col("value").alias("ck_value"),
        )
    )
    out = T.asof_join(
        ev, ck, left_ts="ts", right_ts="ck_ts", by=["metric"],
        right_cols=["ck_value"], how="inner",
    )
    return out.select("metric", "event_id", "ts", "ck_ts", "ck_value")


def q_pit_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time enrichment — the SCD2 + as-of composition: each
    purchase picks up the dimension version (signup value) VALID AT its
    event time. Half-open SCD2 intervals make interval containment
    equivalent to a backward as-of on effective_from, which is one
    union-sort pass per key (operators/temporal.py), not an interval
    join. Oracle: DuckDB native ASOF JOIN."""
    from smartdatapipeline_spark.operators import temporal as T

    ev = _events(spark, sf_dir)
    dim = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id", F.col("ts").alias("uts"))
        .agg(F.max("value").alias("signup_value"))
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts", "value"
    )
    out = T.asof_join(
        purch, dim, left_ts="ts", right_ts="uts", by=["user_id"],
        right_cols=["signup_value"], how="inner",
    )
    return out.select("user_id", "event_id", "ts", "value", "uts", "signup_value")


def q_range_join_campaigns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval/range join (beyond reference surface): keyless
    [start, end) windows around the top-3 revenue days, joined to raw
    events via bucket-explode + equi-join instead of the
    BroadcastNestedLoopJoin a naive inequality join plans —
    operators/temporal.py."""
    from smartdatapipeline_spark.operators import temporal as T

    ev = _events(spark, sf_dir).select("event_id", "ts", "value")
    daily = (
        ev.groupBy(F.to_date("ts").alias("d"))
        .agg(N.dsum("value", scale=4).alias("total"))
    )
    camp = (
        daily.orderBy(F.col("total").desc(), F.col("d").asc())
        .limit(3)
        .select(
            F.col("d").alias("peak_day"),
            (F.col("d").cast("timestamp") - F.expr("INTERVAL 2 DAYS")).alias("start"),
            (F.col("d").cast("timestamp") + F.expr("INTERVAL 3 DAYS")).alias("end"),
        )
    )
    joined = T.range_join_bucketed(ev, camp, left_ts="ts", start="start", end="end")
    return (
        joined.groupBy("peak_day")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            N.dsum("value", scale=4).alias("value_sum"),
        )
    )


def q_kpi_monthly_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style rollup cascade: monthly KPIs re-aggregated FROM
    the daily gold partials (sum of sums, sum of counts, avg recomputed)
    — the continuous-aggregate pattern. The oracle aggregates straight
    from raw events at month grain, so a hash match proves the cascade
    is lossless (decimal partials are associative)."""
    ev = _events(spark, sf_dir)
    daily = K.run_daily_kpis(ev, metric_col="event_type", source_col=None)
    return (
        daily.groupBy(
            F.date_trunc("month", F.col("metric_date")).cast("date").alias("month"),
            "metric",
        )
        .agg(
            F.sum(F.col("value_sum").cast("decimal(38,4)")).cast("double").alias("value_sum"),
            F.sum("value_count").alias("value_count"),
        )
        .withColumn("value_avg", F.col("value_sum") / F.nullif(F.col("value_count"), F.lit(0)))
    )


def q_dist_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable moments sketch (novel-sketch extension): one-pass
    power sums per group → mean/var/std/skew/kurtosis, exact and
    parallelism-invariant — functions/sketch.py."""
    from smartdatapipeline_spark.functions import sketch as SK

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    sk = SK.moments_sketch(li, "l_quantity", by=["l_returnflag"], scale=2)
    return SK.moments_stats(sk, by=["l_returnflag"])


def q_order_priority_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left SEMI join (absent from the reference, SURVEY §2.3): orders
    having at least one near-full-quantity lineitem, counted per
    priority — the TPC-H Q4 shape (EXISTS ⇒ semi join, no fact-row
    duplication before the aggregate)."""
    T = lambda n: spark.read.parquet(os.path.join(sf_dir, f"{n}.parquet"))  # noqa: E731
    orders, li = T("orders"), T("lineitem")
    hits = li.filter(F.col("l_quantity") >= 48).select("l_orderkey")
    return (
        orders.join(hits, orders.o_orderkey == hits.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def q_cust_order_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left OUTER join + double aggregate (TPC-H Q13 shape): order count
    per customer including zero-order customers, then the distribution
    of those counts."""
    T = lambda n: spark.read.parquet(os.path.join(sf_dir, f"{n}.parquet"))  # noqa: E731
    cust, orders = T("customer"), T("orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


def q_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation over a dim join (TPC-H Q14 shape): PROMO
    revenue share for one shipment month — date predicate pushed to the
    lineitem scan, part broadcast, CASE inside the decimal sum."""
    T = lambda n: spark.read.parquet(os.path.join(sf_dir, f"{n}.parquet"))  # noqa: E731
    li, part = T("lineitem"), T("part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(F.lit(0.0))
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-09-01"))
            & (F.col("l_shipdate") < F.lit("1995-10-01"))
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            N.dsum(promo, scale=4).alias("promo_revenue"),
            N.dsum(rev, scale=4).alias("total_revenue"),
        )
        .withColumn(
            "promo_share",
            F.lit(100.0) * F.col("promo_revenue") / F.col("total_revenue"),
        )
    )


# --------------------------------------- retrieval / reshape / set ops

def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 keyword retrieval (rational-odds idf for cross-engine bit
    determinism — see functions/retrieval.py): top-10 docs for a
    3-term query, scored fully JVM-side from exploded postings."""
    from smartdatapipeline_spark.functions import retrieval as R

    return R.bm25_topk(_docs(spark, sf_dir), ["spark", "hash", "merge"], k=10)


def q_metrics_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot long→wide (operators/reshape.py): daily KPI sums, one
    column per metric, via conditional decimal aggregation — single
    shuffle, no value-discovery pass."""
    from smartdatapipeline_spark.operators import reshape as RS

    return RS.pivot_wide(
        _gold(spark, sf_dir),
        index=["metric_date"],
        on="metric",
        values=["click", "error", "purchase", "signup", "view"],
    )


def q_unpivot_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot wide→long over the pivoted frame — the oracle is the
    plain long-form aggregate, so a hash match proves the
    pivot→unpivot round trip is lossless."""
    from smartdatapipeline_spark.operators import reshape as RS

    wide = q_metrics_pivot(spark, sf_dir)
    return RS.unpivot_long(
        wide,
        index=["metric_date"],
        value_cols=["click", "error", "purchase", "signup", "view"],
        var_name="metric",
        value_name="value_sum",
    )


def q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar-subquery shape (TPC-H Q17): revenue from
    lineitems under 20% of their part's average quantity. The
    correlation is decorrelated by hand into a per-part aggregate +
    equi-join — the plan Catalyst produces for the subquery form, made
    explicit."""
    T = lambda n: spark.read.parquet(os.path.join(sf_dir, f"{n}.parquet"))  # noqa: E731
    li, part = T("lineitem"), T("part")
    pq = li.groupBy("l_partkey").agg(
        (N.dsum("l_quantity") / F.count(F.lit(1))).alias("avg_qty")
    )
    brand = part.filter(F.col("p_brand") == "Brand#19").select("p_partkey")
    return (
        li.join(F.broadcast(brand), li.l_partkey == brand.p_partkey)
        .join(pq, "l_partkey")
        .filter(F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty"))
        .agg((N.dsum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly"))
    )


def q_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING-over-join shape (TPC-H Q18): orders whose total quantity
    exceeds 300, with customer attribution — the aggregate runs first
    on (orderkey) so the join back to orders/customer touches only
    qualifying keys."""
    T = lambda n: spark.read.parquet(os.path.join(sf_dir, f"{n}.parquet"))  # noqa: E731
    li, orders, cust = T("lineitem"), T("orders"), T("customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(N.dsum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(20)
    )


def q_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE decile distribution (ranking-window family): per metric,
    10 equal-frequency buckets of the daily values with count and
    bounds. Total order (value, metric_date) makes bucket assignment
    deterministic."""
    from pyspark.sql import Window

    g = _gold(spark, sf_dir)
    w = Window.partitionBy("metric").orderBy(F.col("value").asc(), F.col("metric_date").asc())
    return (
        g.withColumn("decile", F.ntile(10).over(w))
        .groupBy("metric", "decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
    )


def q_user_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations (absent from the reference, SURVEY §2.8):
    high-value purchasers active in the first half of the month but
    not the second (EXCEPT) and in both halves (INTERSECT), as counts.
    Distinct sets are tiny after aggregation, so the set ops run on
    compact inputs."""
    ev = _events(spark, sf_dir)
    base = ev.filter((F.col("event_type") == "purchase") & (F.col("value") >= 150))
    h1 = base.filter(F.col("ts") < F.lit("2024-01-16").cast("timestamp")).select("user_id").distinct()
    h2 = base.filter(F.col("ts") >= F.lit("2024-01-16").cast("timestamp")).select("user_id").distinct()
    churned = h1.subtract(h2).agg(F.count(F.lit(1)).alias("churned_users"))
    retained = h1.intersect(h2).agg(F.count(F.lit(1)).alias("retained_users"))
    return churned.crossJoin(retained)


def q_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunctive-predicate shape (TPC-H Q19): revenue under an
    OR-of-ANDs condition mixing part and lineitem columns. The mixed
    disjunction can't push below the join, so the single-table
    envelopes each disjunct implies (qty ∈ [1,30]; brand ∈ {...},
    size ≤ 15) are applied explicitly pre-join — those DO reach the
    parquet scans, and the join then runs on the pruned inputs with
    the exact disjunction as a post-join filter."""
    T = lambda n: spark.read.parquet(os.path.join(sf_dir, f"{n}.parquet"))  # noqa: E731
    li, part = T("lineitem"), T("part")
    disj = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    li_env = li.filter(F.col("l_quantity").between(1, 30))
    part_env = part.filter(
        F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#3")
        & F.col("p_size").between(1, 15)
    )
    return (
        li_env.join(F.broadcast(part_env), li_env.l_partkey == part_env.p_partkey)
        .filter(disj)
        .agg(
            N.dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("line_count"),
        )
    )


def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-join-topk shape (TPC-H Q3): unshipped revenue by order for
    one market segment. Both date filters and the segment filter push
    to their scans; customer broadcasts; TakeOrderedAndProject caps
    the result without a global sort."""
    T = lambda n: spark.read.parquet(os.path.join(sf_dir, f"{n}.parquet"))  # noqa: E731
    cutoff = F.lit("1998-06-01").cast("timestamp")
    li = T("lineitem").filter(F.col("l_shipdate") > cutoff)
    orders = T("orders").filter(F.col("o_orderdate") < cutoff)
    cust = T("customer").filter(F.col("c_mktsegment") == "BUILDING")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(N.dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderdate").asc(), F.col("l_orderkey").asc())
        .limit(10)
    )


def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-max subquery shape (TPC-H Q15): supplier(s) with maximum
    revenue over a quarter. The revenue aggregate is computed once and
    reused for both the max and the final rows (no correlated rescan);
    the one-row max broadcasts. The equality join on the revenue double
    is deterministic because revenue is an exact decimal sum."""
    T = lambda n: spark.read.parquet(os.path.join(sf_dir, f"{n}.parquet"))  # noqa: E731
    li, supp = T("lineitem"), T("supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(N.dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("_mx"))
    return (
        rev.join(F.broadcast(mx), rev.total_revenue == mx._mx)
        .join(F.broadcast(supp), rev.l_suppkey == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


def q_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exists / not-exists chain (TPC-H Q21 shape, adapted to this
    schema: "late" = shipped > 90 days after order date): suppliers who
    were the sole late supplier on a multi-supplier finalized order.
    The classic formulation is a semi-join plus an anti-self-join on
    lineitem; here both exists-tests decorrelate into ONE per-order
    aggregate (distinct suppliers, distinct late suppliers) — a single
    shuffle of the fact table instead of two self-joins, the plan that
    survives at 100 TB."""
    T = lambda n: spark.read.parquet(os.path.join(sf_dir, f"{n}.parquet"))  # noqa: E731
    li, orders, supp = T("lineitem"), T("orders"), T("supplier")
    lo = li.join(
        orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey", "o_orderdate"),
        li.l_orderkey == F.col("o_orderkey"),
    ).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias("late"),
    )
    per_order = lo.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("late"), F.col("l_suppkey"))).alias("n_late"),
        F.max(F.when(F.col("late"), F.col("l_suppkey"))).alias("late_supp"),
    )
    return (
        per_order.filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
        .join(F.broadcast(supp), F.col("late_supp") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(10)
    )


def q_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join + scalar-avg subquery (TPC-H Q22 shape, keyed on
    market segment instead of the schema's missing phone column):
    above-average-balance customers in three segments with no order
    since 2000 (lapsed). The global average is one broadcast row; the
    no-recent-orders test is a left-anti join against the date-filtered
    orders (filter + single-column projection both push to the scan, so
    the anti build side is narrow)."""
    T = lambda n: spark.read.parquet(os.path.join(sf_dir, f"{n}.parquet"))  # noqa: E731
    segs = ["AUTOMOBILE", "BUILDING", "MACHINERY"]
    cust = T("customer").filter(F.col("c_mktsegment").isin(segs))
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        N.davg("c_acctbal").alias("_avg_bal")
    )
    recent = (
        T("orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            N.dsum("c_acctbal").alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


def q_bination_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bi-directional nation-pair volume (TPC-H Q7 shape): shipping
    revenue between two nations by year, in both directions. The
    nation filter is pushed into the two dimension lookups BEFORE the
    fact join — only customers/suppliers of the two nations survive to
    broadcast — and the pair disjunction runs post-join on two tiny
    string columns."""
    T = lambda n: spark.read.parquet(os.path.join(sf_dir, f"{n}.parquet"))  # noqa: E731
    n1, n2 = "NATION_3", "NATION_7"
    nat = T("nation").filter(F.col("n_name").isin(n1, n2))
    cn = (
        T("customer")
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    sn = (
        T("supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    li, orders = T("lineitem"), T("orders")
    return (
        li.join(orders.select("o_orderkey", "o_custkey"), li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(cn), F.col("o_custkey") == cn.c_custkey)
        .join(F.broadcast(sn), li.l_suppkey == sn.s_suppkey)
        .filter(
            ((F.col("supp_nation") == n1) & (F.col("cust_nation") == n2))
            | ((F.col("supp_nation") == n2) & (F.col("cust_nation") == n1))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(N.dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """National market share (TPC-H Q8 shape, no partsupp in this
    schema): NATION_3's share of PROMO-part revenue sold to EUROPE
    customers, by order year. Part/customer/supplier dims all shrink
    BEFORE broadcast; the ratio is decimal-sum / decimal-sum in double
    (cross-engine exact)."""
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    eur_nat = (
        _t(spark, sf_dir, "nation")
        .join(
            F.broadcast(_t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey")
    )
    cust = (
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(eur_nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey")
    )
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    li, orders = _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "orders")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders.select("o_orderkey", "o_custkey", "o_orderdate"), li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                N.dsum(F.when(F.col("supp_nation") == "NATION_3", vol))
                / N.dsum(vol)
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


def q_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-type profit (TPC-H Q9 shape; schema has no supplycost so
    profit = discounted revenue): per supplier nation × order year over
    parts named like '%gear%'. LIKE filter prunes the part dim before
    broadcast; one fact shuffle for the group-by."""
    part = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%gear%"))
        .select("p_partkey")
    )
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    li, orders = _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "orders")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders.select("o_orderkey", "o_orderdate"), li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(
            N.dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("profit")
        )
        .orderBy("nation", F.desc("o_year"))
    )


def q_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item revenue (TPC-H Q10 shape): top 20 customers by
    revenue lost to returns ('R' lineitems) for orders in 1996Q1.
    Date filter pushes to the orders scan; returnflag pushes to the
    lineitem scan; TakeOrderedAndProject caps the result."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    cust = _t(spark, sf_dir, "customer").join(
        F.broadcast(_t(spark, sf_dir, "nation")),
        F.col("c_nationkey") == F.col("n_nationkey"),
    )
    return (
        li.join(orders.select("o_orderkey", "o_custkey"), li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            N.dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


def q_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-shipment priority mix (TPC-H Q12 shape; no shipmode column,
    returnflag stands in): lineitems shipped > 90 days after the order
    date, counted per returnflag as high-priority (URGENT/HIGH) vs
    lower-priority orders — the classic CASE-sum over one fact join."""
    li, orders = _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(
            orders.select("o_orderkey", "o_orderdate", "o_orderpriority"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .filter(
            F.datediff(F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date"))
            > 90
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


def q_supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier variety per part class (TPC-H Q16 shape; lineitem is the
    part↔supplier bridge since this schema has no partsupp): distinct
    suppliers per (p_brand, p_size) for non-PROMO parts of size ≤ 8,
    excluding Brand#1. Exact countDistinct after a broadcast dim join."""
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_type") != "PROMO")
        & (F.col("p_size") <= 8)
        & (F.col("p_brand") != "Brand#1")
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_size")
    )


def q_top_volume_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Above-average volume suppliers (TPC-H Q20 shape, decorrelated):
    suppliers whose 1996 shipped quantity of 'small%'-named parts
    exceeds the all-supplier average of that same quantity — the
    correlated EXISTS+agg rewritten as one aggregate reused for both the
    per-supplier rows and the scalar threshold (no rescan)."""
    part = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    per_supp = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey")
        .agg(N.dsum("l_quantity", scale=2).alias("qty"))
    )
    avg_qty = per_supp.agg(
        (N.dsum("qty", scale=2) / F.count(F.lit(1))).alias("avg_qty")
    )
    supp = _t(spark, sf_dir, "supplier")
    return (
        per_supp.crossJoin(F.broadcast(avg_qty))
        .filter(F.col("qty") > F.col("avg_qty"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select("s_name", "s_acctbal", "qty")
        .orderBy("s_name")
    )


def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part minimum-cost supplier in a region (TPC-H Q2 shape,
    adapted: no partsupp table, so supply cost = exact unit price
    Σprice/Σqty over lineitem). The correlated min-cost subquery is
    decorrelated into one grouped aggregate + a broadcast per-part min;
    the cost-equality join is deterministic because both sides are the
    SAME exact-decimal-ratio double. Dims all broadcast; the only wide
    shuffle is the (part, supplier) aggregate over lineitem."""
    T = lambda n: spark.read.parquet(os.path.join(sf_dir, f"{n}.parquet"))  # noqa: E731
    li, part, supp, nat, reg = (
        T("lineitem"), T("part"), T("supplier"), T("nation"), T("region")
    )
    europe_supp = (
        supp.join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(
            F.broadcast(reg.filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    sized = part.filter(F.col("p_size") == 15).select("p_partkey", "p_name")
    cost = (
        li.join(F.broadcast(sized), li.l_partkey == sized.p_partkey)
        .join(F.broadcast(europe_supp), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(
            (N.dsum("l_extendedprice") / N.dsum("l_quantity", scale=2)).alias(
                "unit_cost"
            )
        )
    )
    min_cost = cost.groupBy("p_partkey").agg(F.min("unit_cost").alias("_mc"))
    return (
        cost.join(F.broadcast(min_cost), "p_partkey")
        .filter(F.col("unit_cost") == F.col("_mc"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "unit_cost"
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


def q_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Important-stock share (TPC-H Q11 shape, adapted: part value held
    by one nation's suppliers = Σ extendedprice·(1−discount) from
    lineitem). The scalar total broadcasts; HAVING value > 0.01% of it.
    One wide shuffle (part aggregate); threshold compare is exact-
    decimal-derived doubles on both sides."""
    T = lambda n: spark.read.parquet(os.path.join(sf_dir, f"{n}.parquet"))  # noqa: E731
    li, supp, nat = T("lineitem"), T("supplier"), T("nation")
    nation_supp = (
        supp.join(
            F.broadcast(nat.filter(F.col("n_name") == "NATION_7")),
            supp.s_nationkey == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    value = (
        li.join(F.broadcast(nation_supp), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(N.dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("value"))
    )
    total = value.agg(N.dsum("value").alias("_total"))
    return (
        value.crossJoin(F.broadcast(total))
        .filter(F.col("value") > F.col("_total") * 0.0001)
        .select("l_partkey", "value")
        .orderBy(F.desc("value"), "l_partkey")
    )


def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered first-occurrence funnel view→click→purchase
    within 7 days — one min-aggregate per step, exact-ratio shares,
    single declarative plan (no driver-side counts)."""
    from smartdatapipeline_spark.operators.behavior import funnel

    return funnel(_events(spark, sf_dir))


def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention triangle: cohort = Monday week of first event;
    exact integer counts and ratios."""
    from smartdatapipeline_spark.operators.behavior import retention_cohorts

    return retention_cohorts(_events(spark, sf_dir))


def q_discount_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure filtered scan-and-sum — the pushdown
    showcase (date + discount + quantity predicates all reach the
    parquet scan; zero joins, one partial-agg shuffle of one row)."""
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    f = li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return f.agg(
        N.dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def q_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative table contracts (Deequ shape) in ONE aggregation
    pass: null / range / regex checks as conditional counts plus a
    grouped key-uniqueness check — exact integer ratios."""
    from smartdatapipeline_spark.operators import quality as Q

    ev = _events(spark, sf_dir)
    checks = Q.check_expectations(
        ev,
        [
            Q.not_null("user_id"),
            Q.in_range("value", 0.0, 10000.0),
            Q.matches("event_type", "^[a-z]+$"),
        ],
    )
    uniq = Q.check_unique(ev, ["user_id", "ts", "event_type"])
    return checks.unionByName(uniq)


def q_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot drift monitoring: event-type mix of the first half of
    the time range vs the second — TV distance + chi², all log-free
    exact ratios with category-ordered summary folds."""
    from smartdatapipeline_spark.operators.quality import distribution_drift

    ev = _events(spark, sf_dir)
    cut = F.lit("2024-01-16").cast("timestamp")
    return distribution_drift(
        ev.filter(F.col("ts") < cut),
        ev.filter(F.col("ts") >= cut),
        key_col="event_type",
    )


def q_scd2_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 SCD from an update log (CDC compaction): signup events as
    per-user attribute updates → half-open validity intervals +
    is_current, one window over the key."""
    from smartdatapipeline_spark.operators.quality import scd2_build

    upd = (
        _events(spark, sf_dir)
        .filter(F.col("event_type") == "signup")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("value"))  # collapse same-instant updates
    )
    return scd2_build(upd, key_cols=("user_id",), ts_col="ts")


def q_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly scoring: Iglewicz–Hoaglin modified z-score
    (0.6745·(x−med)/MAD) per metric — median-based, so the outliers
    being scored don't drag the location/scale estimate like they do in
    W1/W2. Exact interpolated medians on both engines."""
    return A.anomaly_mad(_gold(spark, sf_dir))


def q_source_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus health: doc counts, contamination rate against
    the eval split, and mean quality — the dashboard a curation run
    reports per upstream domain. Mean quality is an ordered fold (by
    doc_id) so parallel summation order can't perturb the double."""
    from smartdatapipeline_spark.functions.sampling import hash_split

    d = _docs(spark, sf_dir)
    split = hash_split(
        d.select("doc_id", "text"), weights={"train": 90, "val": 5, "test": 5}
    )
    eval_docs = split.filter(F.col("split") == "test").select("doc_id", "text")
    train_docs = split.filter(F.col("split") != "test").select("doc_id", "text")
    cont = DD.decontaminate(train_docs, eval_docs, min_overlap_frac=0.2).select(
        "doc_id", "contaminated"
    )
    quality = TX.quality_features(d).select("doc_id", "quality")
    src = d.select("doc_id", "source")
    j = src.join(cont, "doc_id").join(quality, "doc_id")
    mean_q = F.aggregate(
        F.array_sort(
            F.collect_list(F.struct(F.col("doc_id").alias("o"), F.col("quality").alias("t")))
        ),
        F.lit(0.0),
        lambda acc, x: acc + x["t"],
    ) / F.count(F.lit(1)).cast("double")
    return (
        j.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("contaminated").cast("long")).alias("n_contaminated"),
            mean_q.alias("mean_quality"),
        )
        .orderBy("source")
    )


def q_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-flight skew diagnostic on the events user_id key: cardinality,
    hottest-key shares, Gini of the key-frequency distribution — exact
    integer rank-sums, one tiny window over |keys| rows."""
    from smartdatapipeline_spark.functions.skew import key_skew_report

    return key_skew_report(_events(spark, sf_dir), "user_id")


def q_cusum_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM level-shift detection (Page 1954) over the gold daily
    series: prefix folds of max(0, S+(±(x−μ)−k)) per metric. Output is
    signed-zero-normalized (+0.0) so both engines hash identically."""
    out = A.cusum_changepoints(_gold(spark, sf_dir), k=0.0, h=50.0)
    return out.select(
        "metric",
        "metric_date",
        "value",
        (F.col("cusum_pos") + F.lit(0.0)).alias("cusum_pos"),
        (F.col("cusum_neg") + F.lit(0.0)).alias("cusum_neg"),
        "is_changepoint",
    )


def q_forecast_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simple-exponential-smoothing baseline as a declarative ordered
    fold (α=0.5, binary-exact): the recursive level update runs inside
    one aggregation, no grouped-map Python."""
    return FC.forecast_ewma(_gold(spark, sf_dir), horizon_days=7)


def q_trimmed_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-metric aggregates: mean/count computed over values
    inside the exact [p05, p95] envelope (winsor bounds from the same
    interpolated percentiles both engines share) — the KPI variant that
    ignores tail glitches. Two passes over gold: tiny percentile agg
    broadcast back, then one filtered decimal-sum aggregate."""
    g = _gold(spark, sf_dir)
    bounds = g.groupBy("metric").agg(
        F.expr("percentile(value, 0.05)").alias("_lo"),
        F.expr("percentile(value, 0.95)").alias("_hi"),
    )
    j = g.join(F.broadcast(bounds), "metric")
    inside = (F.col("value") >= F.col("_lo")) & (F.col("value") <= F.col("_hi"))
    return (
        j.groupBy("metric")
        .agg(
            F.min("_lo").alias("p05"),
            F.min("_hi").alias("p95"),
            F.sum(inside.cast("long")).alias("n_kept"),
            F.count(F.lit(1)).alias("n_total"),
            (
                N.dsum(F.when(inside, F.col("value")))
                / F.sum(inside.cast("long"))
            ).alias("trimmed_mean"),
        )
        .orderBy("metric")
    )


def q_rolling_mad_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling robust z: modified z against the prior-window median/MAD
    (collect-sort frames; exact array-index medians on both engines)."""
    return A.rolling_mad_zscore(_gold(spark, sf_dir), window=14)


def q_forecast_snaive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast: ŷ(t+h) = y(t+h−7) — the weekly-pattern
    baseline; last observed week shifted one period forward."""
    return FC.forecast_seasonal_naive(_gold(spark, sf_dir), horizon_days=7)


def q_length_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-length histogram with cumulative corpus coverage — the
    context-length planning table (what share of tokens survive at
    L=·?): 32-token buckets, integer sums, cumulative share as a ratio
    of exact BIGINTs. One agg + one ordered window over ~30 buckets."""
    from pyspark.sql import Window

    d = _docs(spark, sf_dir).select(
        TX.token_count(F.col("text")).alias("n_tokens")
    )
    b = d.groupBy(
        ((F.col("n_tokens") / 32).cast("long") * 32).alias("bucket_start")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("bucket_tokens"),
    )
    w = Window.orderBy("bucket_start").rowsBetween(Window.unboundedPreceding, 0)
    tot = Window.orderBy("bucket_start").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return b.select(
        "bucket_start",
        "n_docs",
        "bucket_tokens",
        (
            F.sum("bucket_tokens").over(w).cast("double")
            / F.sum("bucket_tokens").over(tot).cast("double")
        ).alias("cum_token_share"),
    ).orderBy("bucket_start")


def q_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram LM counts with exact conditional probabilities
    (integer ratios, no log): top-50 bigrams by count."""
    return (
        TX.bigram_counts(_docs(spark, sf_dir))
        .orderBy(F.desc("n"), "w1", "w2")
        .limit(50)
    )


def q_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-shape LM quality filter (Wenzek et al. 2020), log-free:
    per-doc mean add-one-smoothed conditional bigram probability under
    the corpus bigram LM + unseen-bigram fraction. Every term is an
    exact integer ratio and the per-doc mean folds in position order —
    bit-exact cross-engine with no transcendental functions."""
    return TX.bigram_lm_score(_docs(spark, sf_dir))


def q_canonical_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-document selection: for every near-dup cluster
    (SimHash radius-3 connected components) keep the HIGHEST-quality
    member (doc-id tiebreak) — the keep-list decision an LLM-corpus
    dedup actually ships, not just the cluster labels."""
    d = _docs(spark, sf_dir)
    clusters = DD.duplicate_clusters(DD.simhash_near_pairs(d, max_hamming=3), d)
    quality = TX.quality_features(d).select("doc_id", "quality")
    return DD.canonical_from_clusters(clusters, quality)


def q_hybrid_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid lexical+dense retrieval fused with RRF (Cormack et al.
    2009): BM25 top-20 for a fixed term query and exact-cosine top-20
    for a fixed query vector, fused as Σ 1/(60+rank) — every term a
    reciprocal of an integer, so the fusion is bit-exact cross-engine
    with no score calibration."""
    from pyspark.sql import Window

    from smartdatapipeline_spark.functions import retrieval as RT

    bm25 = RT.bm25_topk(_docs(spark, sf_dir), ["spark", "hash", "merge"], k=20)
    # unpartitioned Window is safe ONLY because bm25 is already a top-k
    # (≤ 20 rows) frame — never hand a corpus-sized frame to a global
    # Window.orderBy (single-task sort). (VERDICT r2 nit #2.)
    wb = Window.orderBy(F.desc("score"), F.col("doc_id").asc())
    bm25_r = bm25.select("doc_id", F.row_number().over(wb).alias("rank"))
    emb = _emb(spark, sf_dir)
    dense = SIM.brute_force_topk(emb, emb.filter(F.col("vec_id") == 0), k=20)
    dense_r = dense.select(F.col("neighbor_id").alias("doc_id"), "rank")
    return RT.rrf_fuse([bm25_r, dense_r], k=60, topk=10)


def q_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cross-document substring-span dedup (Lee et al. 2022 shape
    as a hash-window pass): 16-token spans appearing in ≥ 2 distinct
    docs — the repeated boilerplate substring dedup removes."""
    return DD.duplicate_spans(_docs(spark, sf_dir), window=16, min_docs=2)


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic deduplication (public recipe: Abbas et
    al. 2023): embedding-cosine near-dup pairs within sign-LSH buckets
    (≥ 0.25 here to get non-trivial clusters on the synthetic vectors)
    → connected components → every vector labeled with its cluster
    representative; keep-list = is_representative. Composes the two
    oracle-proven primitives into the end-to-end dedup decision."""
    emb = _emb(spark, sf_dir)
    pairs = SIM.embedding_near_dup_pairs(emb, threshold=0.25, nbits=8)
    clusters = DD.duplicate_clusters(
        pairs, emb, id_col="vec_id", a_col="vec_a", b_col="vec_b"
    )
    return clusters.select(
        "vec_id",
        "cluster",
        (F.col("cluster") == F.col("vec_id")).alias("is_representative"),
    )


def q_clean_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style line-level boilerplate cleanup (Raffel et al. 2020
    §2.2), validated end-to-end like the decode queries: Spark reflows
    each doc's tokens into 8-word lines (every 3rd line gets terminal
    punctuation), then `clean_lines` must keep exactly the ≥5-word
    punctuated lines — the oracle reconstructs and filters the same
    lines in SQL."""
    d = _docs(spark, sf_dir)
    toks = TX.tokens(F.col("text"))
    n_lines = F.greatest(F.ceil(F.size(toks) / F.lit(8.0)).cast("int"), F.lit(1))
    lines = F.transform(
        F.sequence(F.lit(0), n_lines - 1),
        lambda i: F.concat(
            F.array_join(F.slice(toks, i * 8 + 1, 8), " "),
            F.when(i % 3 == 0, F.lit(".")).otherwise(F.lit("")),
        ),
    )
    lined = d.select("doc_id", F.array_join(lines, "\n").alias("text"))
    out = TX.clean_lines(lined, min_words=5, require_terminal_punct=True)
    return out.select(
        "doc_id",
        "lines_total",
        "lines_kept",
        F.length("clean_text").alias("clean_len"),
    )


def q_rare_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-relative rarity (log-free unigram-LM quality signal):
    fraction of each doc's tokens with corpus frequency < 3 — exact
    integer ratios, no log() whose last ulp is engine-dependent."""
    return TX.rare_token_fraction(_docs(spark, sf_dir), min_count=3)


def q_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture temperature reweighting over the documents
    `source` domains (T=2 ⇒ sqrt scaling, IEEE-exact cross-engine;
    denominator is an ordered fold in domain order)."""
    from smartdatapipeline_spark.functions import sampling as SP

    return SP.mixture_weights(_docs(spark, sf_dir), domain_col="source")



def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT heavy-hitter tokens (freq > total/(k+1)) found the 100 TB
    way: per-partition Misra-Gries sketches (<=k counters per executor,
    mergeable per Agarwal et al. PODS'12) yield a guaranteed candidate
    SUPERSET without shuffling the vocabulary; a broadcast semi-join
    recounts only candidates exactly. Integer threshold test, so the
    output is bit-exact vs a plain SQL HAVING."""
    from smartdatapipeline_spark.functions.sketch import heavy_hitters

    toks = (
        _docs(spark, sf_dir)
        .select(F.explode(TX.tokens(F.col("text"))).alias("token"))
        .filter(F.col("token") != "")
    )
    return heavy_hitters(toks, "token", k=100)


def q_zorder_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key over (user_id, value): min/max
    scale both dims to 8 bits and interleave — the layout key behind
    multi-dimensional file pruning (functions/layout.py; write path is
    zorder_write, pruning evidence in tests/PERF.md). Pure codegen
    shift/and arithmetic, oracle-checked bit-for-bit."""
    from smartdatapipeline_spark.functions.layout import zorder_key

    ev = _events(spark, sf_dir).select("event_id", "user_id", "value")
    return zorder_key(ev, ["user_id", "value"], bits=8).select(
        "event_id", F.col("_z").alias("zval")
    )


def q_fuzzy_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution candidate pairs on part names: block on the
    first normalized token (pair space = sum of block^2, co-partitioned
    self-join), verify with JVM-intrinsic levenshtein <= 3. Oracle mode
    (no block-size guard) for bit-exact SQL parity; production callers
    keep the default max_block_size guard."""
    part = spark.read.parquet(os.path.join(sf_dir, "part.parquet"))
    return DD.fuzzy_name_pairs(
        part, id_col="p_partkey", name_col="p_name",
        max_distance=3, max_block_size=None,
    )


def q_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item co-occurrence recommender over the events props payload:
    per-user distinct items capped at 20 (first-touch order) bound the
    pair fan-out, then distinct-user counts per pair and a per-item
    top-5 via partitioned windows — the collaborative-filtering counting
    step, power-user-safe."""
    from smartdatapipeline_spark.operators.behavior import cooccurrence_topk

    return cooccurrence_topk(
        _events(spark, sf_dir), topk=5, max_items_per_user=20
    )


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams:
    lead() in a user-partitioned window (shuffle key = user, state = one
    user's history), grouped counts, exact-ratio probabilities."""
    from smartdatapipeline_spark.operators.behavior import event_transitions

    return event_transitions(_events(spark, sf_dir))


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC between two activity snapshots (first vs second half of the
    time range): one co-partitioned full-outer join on the key,
    fingerprint comparison computed scan-side so wide payloads never
    shuffle twice. Exercises all four change classes."""
    from smartdatapipeline_spark.operators.quality import snapshot_diff

    ev = _events(spark, sf_dir)
    cut = F.lit("2024-01-16").cast("timestamp")
    old = (
        ev.filter(F.col("ts") < cut)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    new = (
        ev.filter(F.col("ts") >= cut)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return snapshot_diff(old, new, ["user_id"])


def q_forecast_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear-trend forecast (double exponential smoothing,
    α=β=0.5 binary-exact): the coupled level/trend recursion as one
    declarative ordered fold with a struct accumulator — no grouped-map
    Python, per-series state only."""
    return FC.forecast_holt(_gold(spark, sf_dir), horizon_days=7)


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weight-proportional sample (Efraimidis-Spirakis
    A-Res): integer weights realized as max-of-w salted md5 draws —
    same distribution as the u^(1/w) key, zero transcendentals, so the
    sample is bit-identical on any engine and stable under appends."""
    from smartdatapipeline_spark.functions.sampling import weighted_sample

    d = _docs(spark, sf_dir).select(
        "doc_id", (F.lit(1) + F.col("doc_id") % 5).alias("weight")
    )
    return weighted_sample(d, k=50)


def q_concurrency_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent 15-minute event intervals per (event_type, day):
    sweep-line +1/−1 deltas with a running sum inside a PARTITIONED
    window — interval-overlap analytics with per-group-day state."""
    from smartdatapipeline_spark.operators.temporal import concurrency_profile

    return concurrency_profile(_events(spark, sf_dir), duration_minutes=15)


def q_exact_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT global quantiles without a full sort: GK-sketch bracket
    (pass 1) + strict-below count and a sort of only the bracket slice
    (pass 2) — functions/sketch.py exact_quantile_two_pass. The oracle
    is DuckDB's quantile_disc (lower/discrete convention)."""
    import math

    from smartdatapipeline_spark.functions.sketch import values_at_ranks

    ev = _events(spark, sf_dir).select("value").cache()
    try:
        qs = (0.5, 0.9, 0.99)
        n = ev.count()
        ranks = [max(1, int(math.ceil(q * n))) for q in qs]
        # one GK bracket pass + one below/slice aggregate + one
        # TakeOrdered per rank (r11: replaces 3 independent two-pass
        # probes — same discrete-rank convention, half the jobs)
        vals = values_at_ranks(ev, "value", ranks, n)
    finally:
        ev.unpersist()
    rows = [(float(q), float(v)) for q, v in zip(qs, vals)]
    return spark.createDataFrame(rows, "q double, value double")


def q_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: per-user consecutive-day activity streaks via
    the anchor (day − row_number) trick — operators/behavior.py
    activity_streaks. All-integer output."""
    from smartdatapipeline_spark.operators.behavior import activity_streaks

    return activity_streaks(_events(spark, sf_dir))


def q_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-conversion (first view → first later purchase) summary —
    operators/behavior.py conversion_lag. Exact integer seconds; the
    median interpolates two exact integers (bit-stable)."""
    from smartdatapipeline_spark.operators.behavior import conversion_lag

    return conversion_lag(_events(spark, sf_dir))


def q_ols_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series closed-form OLS trend of daily value sums with
    all-decimal normal-equation sums — operators/forecast.py
    ols_trend."""
    return FC.ols_trend(_events(spark, sf_dir))


def q_seasonal_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonal indices per series (arithmetic weekday:
    datediff-from-a-Monday mod 7) — operators/temporal.py
    seasonal_profile."""
    from smartdatapipeline_spark.operators.temporal import seasonal_profile

    return seasonal_profile(_events(spark, sf_dir))


def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width 20-bucket histogram of event values: min/max scan +
    one grouped count, no sort — functions/sketch.py
    equi_width_histogram."""
    from smartdatapipeline_spark.functions.sketch import equi_width_histogram

    return equi_width_histogram(_events(spark, sf_dir), "value", 20)


def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank centrality over the customer↔supplier bipartite graph
    (distinct order-line pairs, symmetrized), 3 power iterations with
    the degree-adaptive fold (src_buckets="auto": a cheap max-in-degree
    probe on the cached edge frame picks the flat src-ordered fold when
    no hub exceeds 2^20 (1,048,576) in-edges — true for this bounded-degree graph at
    every test SF, max ≈ 680 at sf0.1 — and the two-level (dst,
    src-bucket) fold otherwise, so power-law hub insurance is free when
    not needed) — functions/graph.py pagerank. Top 25 suppliers by
    rank. The oracle spells the flat fold this graph selects, so the
    match is bit-exact; graph_pagerank_hub pins the forced two-level
    mode against its own two-level oracle."""
    from smartdatapipeline_spark.functions.graph import pagerank, symmetrize

    T = lambda n: spark.read.parquet(os.path.join(sf_dir, f"{n}.parquet"))  # noqa: E731
    pairs = (
        T("orders")
        .join(T("lineitem"), F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    ranks = pagerank(
        symmetrize(pairs), iterations=3, src_buckets="auto", undirected=True
    )
    return (
        ranks.filter(F.col("node") % 2 == 1)
        .orderBy(F.col("rank").desc(), F.col("node").asc())
        .limit(25)
        .select(((F.col("node") - 1) / 2).cast("long").alias("s_suppkey"), "rank")
    )


def q_graph_pagerank_hub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forced two-level-fold PageRank (src_buckets=32) over the same
    bipartite graph — keeps the power-law hub path oracle-checked now
    that graph_pagerank's adaptive probe selects the flat fold on this
    bounded-degree graph. Top 25 suppliers; the oracle spells the
    identical (dst, src%32) two-level fold, so the match is bit-exact."""
    from smartdatapipeline_spark.functions.graph import pagerank, symmetrize

    T = lambda n: spark.read.parquet(os.path.join(sf_dir, f"{n}.parquet"))  # noqa: E731
    pairs = (
        T("orders")
        .join(T("lineitem"), F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    ranks = pagerank(symmetrize(pairs), iterations=3, src_buckets=32)
    return (
        ranks.filter(F.col("node") % 2 == 1)
        .orderBy(F.col("rank").desc(), F.col("node").asc())
        .limit(25)
        .select(((F.col("node") - 1) / 2).cast("long").alias("s_suppkey"), "rank")
    )


def q_bloom_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered exact semi-join: orders of BUILDING-segment
    customers, aggregated by priority — functions/bloom.py
    bloom_semi_join. Output is identical to the plain semi-join (the
    bloom bitmap only prunes the probe side pre-shuffle)."""
    from smartdatapipeline_spark.functions.bloom import bloom_semi_join

    T = lambda n: spark.read.parquet(os.path.join(sf_dir, f"{n}.parquet"))  # noqa: E731
    cust = T("customer").filter(F.col("c_mktsegment") == "BUILDING")
    kept = bloom_semi_join(T("orders"), cust, "o_custkey", "c_custkey")
    return kept.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        N.dsum("o_totalprice").alias("total_price"),
    )


def q_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise association rules (support / confidence / lift) over
    per-user event-type baskets — operators/behavior.py
    association_rules. Exact integer ratios."""
    from smartdatapipeline_spark.operators.behavior import association_rules

    return association_rules(_events(spark, sf_dir))


def q_event_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quiet-period throttle audit: events within 60 s of the previous
    same (user, type) event are dropped — operators/behavior.py
    event_debounce."""
    from smartdatapipeline_spark.operators.behavior import event_debounce

    return event_debounce(_events(spark, sf_dir), min_gap_s=60)


def q_sliding_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct active users per day (sliding-window
    COUNT DISTINCT — inexpressible as a window function) —
    operators/temporal.py sliding_distinct_users."""
    from smartdatapipeline_spark.operators.temporal import sliding_distinct_users

    return sliding_distinct_users(_events(spark, sf_dir), window_days=7)


def q_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization at the exact [p01, p99] quantiles (sort-free
    two-pass bounds) with clip-mass accounting — functions/sketch.py
    winsorized_stats."""
    from smartdatapipeline_spark.functions.sketch import winsorized_stats

    return winsorized_stats(_events(spark, sf_dir).select("value"), "value")


def q_copurchase_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 most-similar customer pairs by Jaccard over purchased
    part sets, item-blocked pair generation — functions/similarity.py
    basket_jaccard_pairs."""
    from smartdatapipeline_spark.functions.similarity import basket_jaccard_pairs

    T = lambda n: spark.read.parquet(os.path.join(sf_dir, f"{n}.parquet"))  # noqa: E731
    baskets = (
        T("orders")
        .join(T("lineitem"), F.col("o_orderkey") == F.col("l_orderkey"))
        .select(F.col("o_custkey").alias("cust"), F.col("l_partkey").alias("part"))
        .distinct()
    )
    return basket_jaccard_pairs(baskets, "cust", "part", top_k=20)


def q_running_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Floored running balance per user (credits minus error/click
    debits, clamped at 0) — the ordered-fold operator no window SUM can
    express — operators/temporal.py running_balance."""
    from smartdatapipeline_spark.operators.temporal import running_balance

    ev = _events(spark, sf_dir)
    delta = (
        F.when(F.col("event_type").isin("error", "click"), -F.col("value"))
        .otherwise(F.col("value"))
    )
    return running_balance(ev, delta)


def q_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase search ("data stream") via positional postings and
    adjacent-position joins — functions/retrieval.py phrase_search."""
    from smartdatapipeline_spark.functions.retrieval import phrase_search

    return phrase_search(_docs(spark, sf_dir), "data stream", top_k=20)


def q_kpi_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical KPI totals (leaf / per-metric / grand) in one
    ROLLUP pass — operators/kpi.py kpi_rollup; Expand node, single
    scan+shuffle."""
    return K.kpi_rollup(_events(spark, sf_dir))


def q_graph_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-hop reachability (≤3 hops) from every 10th supplier over the
    customer↔supplier graph — functions/graph.py bfs_hops frontier
    expansion."""
    from smartdatapipeline_spark.functions.graph import bfs_hops, symmetrize

    T = lambda n: spark.read.parquet(os.path.join(sf_dir, f"{n}.parquet"))  # noqa: E731
    pairs = (
        T("orders")
        .join(T("lineitem"), F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    seeds = (
        T("supplier")
        .filter(F.col("s_suppkey") % 10 == 0)
        .select((F.col("s_suppkey") * 2 + 1).alias("node"))
    )
    return bfs_hops(symmetrize(pairs), seeds, max_hops=3)


def q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-format column profiler over orders (nulls, exact distinct,
    native-typed min/max) — operators/quality.py table_profile; one
    aggregation pass."""
    from smartdatapipeline_spark.operators.quality import table_profile

    o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderpriority",
        F.col("o_orderdate").cast("date").alias("o_orderdate"),
    )
    return table_profile(o)


def q_fk_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: orphan counts for every lineitem/
    orders foreign key — operators/quality.py fk_orphans (left-anti
    joins, dims broadcast)."""
    from smartdatapipeline_spark.operators.quality import fk_orphans

    T = lambda n: spark.read.parquet(os.path.join(sf_dir, f"{n}.parquet"))  # noqa: E731
    li, od = T("lineitem"), T("orders")
    return fk_orphans(
        [
            (li, "l_orderkey", od, "o_orderkey", "lineitem.order"),
            (li, "l_partkey", T("part"), "p_partkey", "lineitem.part"),
            (li, "l_suppkey", T("supplier"), "s_suppkey", "lineitem.supplier"),
            (od, "o_custkey", T("customer"), "c_custkey", "orders.customer"),
        ]
    )


def q_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-15 3-step event sequences across user streams (sliding
    n-grams, one windowed shuffle) — operators/behavior.py
    event_paths."""
    from smartdatapipeline_spark.operators.behavior import event_paths

    return event_paths(_events(spark, sf_dir), depth=3, top_k=15)


def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (series, day) time-weighted average with hold-until-next
    semantics — operators/temporal.py time_weighted_avg; exact integer
    weights × decimal values."""
    from smartdatapipeline_spark.operators.temporal import time_weighted_avg

    return time_weighted_avg(_events(spark, sf_dir))


def q_cumulative_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users by day via the first-seen
    reformulation (expanding COUNT DISTINCT) — operators/behavior.py
    cumulative_users."""
    from smartdatapipeline_spark.operators.behavior import cumulative_users

    return cumulative_users(_events(spark, sf_dir))


def q_consistent_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coherent cross-table hash sampling (same salted-md5 bucket rule
    on events.user_id AND orders.o_custkey) — functions/sampling.py
    consistent_hash_sample. One summary row."""
    from smartdatapipeline_spark.functions.sampling import consistent_hash_sample

    ev = _events(spark, sf_dir)
    od = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    ev_s = consistent_hash_sample(ev, "user_id", pct=10)
    od_s = consistent_hash_sample(od, "o_custkey", pct=10)
    a = ev_s.agg(
        F.countDistinct("user_id").alias("n_users_sampled"),
        F.count(F.lit(1)).alias("n_events_sampled"),
    )
    b = od_s.agg(
        F.countDistinct("o_custkey").alias("n_custs_sampled"),
        F.count(F.lit(1)).alias("n_orders_sampled"),
    )
    return a.crossJoin(b)


def q_grouped_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-series q50/q90/q99 via in-partition rank windows —
    functions/sketch.py grouped_quantiles_exact."""
    from smartdatapipeline_spark.functions.sketch import grouped_quantiles_exact

    return grouped_quantiles_exact(_events(spark, sf_dir), "value", "event_type")


def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 vector quantization (scale + checksum per vector,
    zero shuffles) — functions/similarity.py quantize_embeddings."""
    from smartdatapipeline_spark.functions.similarity import quantize_embeddings

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return quantize_embeddings(emb)


def q_wow_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week change of daily value sums (date-arithmetic
    self-join on the day grain) — operators/metrics.py wow_change."""
    from smartdatapipeline_spark.operators.metrics import wow_change

    return wow_change(_events(spark, sf_dir))


def q_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD distribution-free outlier counts per series —
    operators/anomaly.py robust_outliers (exact grouped medians)."""
    from smartdatapipeline_spark.operators.anomaly import robust_outliers

    return robust_outliers(_events(spark, sf_dir))


def q_ewma_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series EWMA of daily sums (ordered fold — the recursion no
    window frame expresses) — operators/forecast.py ewma_daily."""
    return FC.ewma_daily(_events(spark, sf_dir), alpha=0.25)


def q_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch conversion attribution within a 60-minute window
    (running last-non-null over one user window) —
    operators/behavior.py attribution_last_touch."""
    from smartdatapipeline_spark.operators.behavior import attribution_last_touch

    return attribution_last_touch(_events(spark, sf_dir))


def q_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """14-day rolling Pearson correlation of view vs purchase daily
    counts from exact integer window sums — operators/temporal.py
    rolling_correlation."""
    from smartdatapipeline_spark.operators.temporal import rolling_correlation

    return rolling_correlation(_events(spark, sf_dir))


def q_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source fair-share document cap (≤50 docs per source, ranked
    by doc_id) — functions/sampling.py cap_rows_per_key. Output per
    source: before/after counts."""
    from smartdatapipeline_spark.functions.sampling import cap_rows_per_key

    d = _docs(spark, sf_dir).select("doc_id", "source")
    before = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_before"))
    after = (
        cap_rows_per_key(d, "source", 50, ["doc_id"])
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_after"))
    )
    return before.join(after, "source")


def q_cluster_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-aware split: split chosen by the exact-dup group rep's
    hash bucket, so identical docs never straddle train/eval —
    functions/dedup.py cluster_aware_split. Output per split:
    (n_docs, n_groups)."""
    from smartdatapipeline_spark.functions.dedup import cluster_aware_split

    out = cluster_aware_split(_docs(spark, sf_dir))
    return out.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("rep_id").alias("n_groups"),
    )


def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue by nation where the customer and the
    supplier share a nation, one region, one order year. All four dims
    (region→nation chain, customer, supplier) broadcast; the only
    fact-sized shuffle is the lineitem⋈orders equi join; the
    same-nation predicate prunes AFTER the broadcast lookups, JVM-side.
    Completes the TPC-H query-shape sweep (Q1-Q22)."""
    T = lambda n: spark.read.parquet(os.path.join(sf_dir, f"{n}.parquet"))  # noqa: E731
    nations = (
        T("nation")
        .join(
            F.broadcast(T("region").filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    cust = T("customer").select("c_custkey", F.col("c_nationkey").alias("_cn"))
    supp = T("supplier").select("s_suppkey", F.col("s_nationkey").alias("_sn"))
    orders = T("orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    return (
        T("lineitem")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("_cn") == F.col("_sn"))
        .join(F.broadcast(nations), F.col("_sn") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            N.dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    )


def q_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day session bounce rate (1-event gap-sessions share) —
    operators/sessions.py bounce_rate on top of sessionize."""
    from smartdatapipeline_spark.operators.sessions import bounce_rate

    return bounce_rate(_events(spark, sf_dir))


def q_burn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-window SLO burn rate (1-day vs 7-day trailing error
    share) — operators/anomaly.py burn_rate; exact integer window
    sums."""
    from smartdatapipeline_spark.operators.anomaly import burn_rate

    return burn_rate(_events(spark, sf_dir))


def q_cep_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CEP 'A then B within T unless C' via running last-event times in
    one user window — operators/behavior.py cep_pattern."""
    from smartdatapipeline_spark.operators.behavior import cep_pattern

    return cep_pattern(_events(spark, sf_dir))


def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV curve (per-week and cumulative value per cohort
    member; exact decimal cumulative) — operators/behavior.py
    cohort_ltv."""
    from smartdatapipeline_spark.operators.behavior import cohort_ltv

    return cohort_ltv(_events(spark, sf_dir))


def q_setjoin_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Jaccard≥0.7 all-pairs join via prefix filtering (SSJoin/
    All-Pairs) — candidates from rarest-first prefix tokens only, zero
    recall loss — functions/dedup.py set_similarity_join. Oracle is the
    brute-force shared-shingle join."""
    return DD.set_similarity_join(_docs(spark, sf_dir), threshold=0.7)


def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM quartile segmentation per user (deterministic NTILE
    tie-breaks, decimal-exact monetary) — operators/behavior.py
    rfm_segments."""
    from smartdatapipeline_spark.operators.behavior import rfm_segments

    return rfm_segments(_events(spark, sf_dir))


def q_rfm_segments_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation via the BILLION-USER scale path (r11; r10
    VERDICT #3): threshold scoring against the exact NTILE-boundary
    order statistics (bounded exact_quantile_two_pass probes — GK
    bracket + slice sort, no global sort anywhere), instead of three
    global NTILE window sorts. Tied metric values all take one tile
    (value-deterministic). The oracle mirrors the semantics exactly:
    boundary = value at the NTILE tile-end rank, tile = 1 + #bounds
    passed — operators/behavior.py rfm_segments(method='bounds')."""
    from smartdatapipeline_spark.operators.behavior import rfm_segments

    return rfm_segments(_events(spark, sf_dir), method="bounds")


def q_nation_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-parent: each nation's revenue share and rank within its
    region (ratio_to_report window over the dim-grain rollup); dims
    broadcast, one fact shuffle."""
    T = lambda n: spark.read.parquet(os.path.join(sf_dir, f"{n}.parquet"))  # noqa: E731
    from pyspark.sql.window import Window

    rev = (
        T("lineitem")
        .join(T("orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(T("customer")), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(T("nation")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(T("region")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            N.dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
    )
    wr = Window.partitionBy("region")
    wrank = Window.partitionBy("region").orderBy(
        F.col("revenue").desc(), F.col("nation").asc()
    )
    # the region-total window sums in DECIMAL (revenue doubles are
    # exact at 4 dp) — an unordered SUM(double) window would be
    # accumulation-order-nondeterministic
    region_total = (
        F.sum(F.col("revenue").cast("decimal(28,4)")).over(wr).cast("double")
    )
    return rev.select(
        "region",
        "nation",
        "revenue",
        (F.col("revenue") / region_total).alias("region_share"),
        F.row_number().over(wrank).alias("rank_in_region"),
    )


def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median extended price per return flag
    (cumulative-weight rank, exact integers) — functions/sketch.py
    weighted_median."""
    from smartdatapipeline_spark.functions.sketch import weighted_median

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    return weighted_median(li, "l_extendedprice", "l_quantity", "l_returnflag")


def q_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-spine forward-fill imputation per series (last observed
    daily sum carried over gaps) — operators/temporal.py
    forward_fill_daily."""
    from smartdatapipeline_spark.operators.temporal import forward_fill_daily

    return forward_fill_daily(_events(spark, sf_dir))


def q_topn_other(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 order priorities by decimal-exact total price, the rest
    collapsed into OTHER — operators/reshape.py topn_with_other."""
    from smartdatapipeline_spark.operators.reshape import topn_with_other

    od = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    return topn_with_other(od, "o_orderpriority", "o_totalprice", n=3)


def q_double_charge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-transaction audit: same (user, type, value) within
    300 s of the previous occurrence — operators/quality.py
    double_charge_audit."""
    from smartdatapipeline_spark.operators.quality import double_charge_audit

    return double_charge_audit(_events(spark, sf_dir))


def q_acf_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series autocorrelation at lags 1..7 over daily counts
    (date-arithmetic self-joins, exact integer sums) —
    operators/forecast.py acf_daily."""
    return FC.acf_daily(_events(spark, sf_dir), max_lag=7)


def q_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly new/retained/resurrected/churned user decomposition —
    operators/behavior.py growth_accounting."""
    from smartdatapipeline_spark.operators.behavior import growth_accounting

    return growth_accounting(_events(spark, sf_dir))


def q_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max drawdown of the cumulative daily value curve per series
    (decimal-exact running peak) — operators/temporal.py
    max_drawdown."""
    from smartdatapipeline_spark.operators.temporal import max_drawdown

    return max_drawdown(_events(spark, sf_dir))


def q_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise audience overlap (exact user-set intersection/Jaccard
    per event-type pair) — operators/behavior.py audience_overlap."""
    from smartdatapipeline_spark.operators.behavior import audience_overlap

    return audience_overlap(_events(spark, sf_dir))


def q_daily_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (series, day) exact p50/p95 of value (rank windows, ceil(q·n)
    convention) — operators/kpi.py daily_value_percentiles."""
    return K.daily_value_percentiles(_events(spark, sf_dir), qs=(0.5, 0.95))


def q_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day session count / mean duration / mean events from gap
    sessions — operators/sessions.py session_stats."""
    from smartdatapipeline_spark.operators.sessions import session_stats

    return session_stats(_events(spark, sf_dir))


def q_seasonal_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week-adjusted volume anomalies (residual vs seasonal
    expectation, day-ordered folds) — operators/anomaly.py
    seasonal_residual_outliers."""
    from smartdatapipeline_spark.operators.anomaly import (
        seasonal_residual_outliers,
    )

    return seasonal_residual_outliers(_events(spark, sf_dir))


def q_theilsen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend (median of day-grain pairwise slopes,
    disc-rank pick) — operators/forecast.py theilsen_trend."""
    return FC.theilsen_trend(_events(spark, sf_dir))


def q_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution via RANGE window frames (even
    credit across in-window channel touches) — operators/behavior.py
    attribution_linear."""
    from smartdatapipeline_spark.operators.behavior import attribution_linear

    return attribution_linear(_events(spark, sf_dir))


def q_mix_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WoW mix-shift decomposition (per-series contribution to the
    total change; shares sum to 1 exactly) — operators/metrics.py
    mix_shift."""
    from smartdatapipeline_spark.operators.metrics import mix_shift

    return mix_shift(_events(spark, sf_dir))


def q_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford leading-digit audit of order totals (decimal-string
    digit extraction, digit-ordered chi² fold) —
    operators/quality.py benford_audit."""
    from smartdatapipeline_spark.operators.quality import benford_audit

    od = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    return benford_audit(od, "o_totalprice")


def q_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval×interval OVERLAP join (campaign windows × per-metric
    burst windows) via two-sided bucket-explode + equi-join — no
    nested-loop pair space — operators/temporal.py
    interval_overlap_join."""
    from smartdatapipeline_spark.operators import temporal as T

    ev = _events(spark, sf_dir)
    # ONE events scan serves both interval sides (round 10, carried
    # bench obligation): the (metric, day) grid holds count AND the
    # exact decimal partial sum; daily totals FOLD the ~150-row grid
    # (decimal addition is associative, so fold == direct dsum
    # bit-exactly) instead of re-scanning events. Exchange reuse does
    # NOT fire here — column pruning specializes each consumer's
    # partial aggregate (sum-only vs count-only), so without a
    # materialization the scan runs once per side (4× through the
    # overlap join, measured). A ~150-row grid is the cheap side of
    # the funnel lesson (PERF lesson 14 boundary): checkpoint it.
    md_all = ev.groupBy(
        F.col("event_type").alias("metric"), F.to_date("ts").alias("d")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(28,4)")).alias("_dsum"),
    ).localCheckpoint(eager=True)
    daily = md_all.groupBy("d").agg(
        F.sum("_dsum").cast("double").alias("total")
    )
    promo = (
        daily.orderBy(F.col("total").desc(), F.col("d").asc())
        .limit(4)
        .select(
            F.col("d").alias("peak_day"),
            (F.col("d").cast("timestamp") - F.expr("INTERVAL 2 DAYS")).alias("a_start"),
            (F.col("d").cast("timestamp") + F.expr("INTERVAL 3 DAYS")).alias("a_end"),
        )
    )
    from pyspark.sql.window import Window

    md = md_all.select("metric", "d", "n")
    wm = Window.partitionBy("metric").orderBy(F.col("n").desc(), F.col("d").asc())
    burst = (
        md.withColumn("_rn", F.row_number().over(wm))
        .filter(F.col("_rn") == 1)
        .select(
            "metric",
            (F.col("d").cast("timestamp") - F.expr("INTERVAL 1 DAYS")).alias("b_start"),
            (F.col("d").cast("timestamp") + F.expr("INTERVAL 2 DAYS")).alias("b_end"),
        )
    )
    j = T.interval_overlap_join(
        promo, burst, left_start="a_start", left_end="a_end",
        right_start="b_start", right_end="b_end",
    )
    return j.select(
        "peak_day",
        "metric",
        "overlap_start",
        "overlap_end",
        (
            (
                F.unix_timestamp("overlap_end") - F.unix_timestamp("overlap_start")
            ).cast("double")
            / F.lit(3600.0)
        ).alias("overlap_hours"),
    )


def q_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact rolling 7-day median of daily sums per series (robust
    smoother; deterministic ROWS frame on the day grain) —
    operators/temporal.py rolling_median_daily."""
    from smartdatapipeline_spark.operators.temporal import rolling_median_daily

    return rolling_median_daily(_events(spark, sf_dir))


def q_forecast_hw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt–Winters ADDITIVE seasonal forecast (triple exponential
    smoothing, m=7, α/β/γ = 0.5/0.25/0.25 binary-exact): level/trend/
    seasonal-ring recursion as ONE declarative ordered fold —
    operators/forecast.py forecast_hw_seasonal."""
    return FC.forecast_hw_seasonal(_gold(spark, sf_dir), horizon_days=7)


def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts over the k-NN-sparsified co-supply
    graph (each supplier keeps its top-8 co-supply partners — bounded
    degree, so the wedge space stays linear even though raw co-supply
    is near-complete) — functions/graph.py triangle_count."""
    from pyspark.sql.window import Window

    from smartdatapipeline_spark.functions.graph import triangle_count

    from smartdatapipeline_spark.cachetrack import track_cache

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    # r14 opt (guide §2.4): ps feeds BOTH sides of the co-supply
    # self-join — uncached, the lineitem scan + distinct ran twice.
    # Bounded at |distinct (part, supplier)| rows; ownership rides the
    # returned frame via cachetrack (the triangle_count pattern).
    ps = (
        li.select(F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s"))
        .distinct()
        .cache()
    )
    a = ps.alias("a")
    b = ps.alias("b")
    co = (
        a.join(b, (F.col("a.p") == F.col("b.p")) & (F.col("a.s") < F.col("b.s")))
        .groupBy(F.col("a.s").alias("sa"), F.col("b.s").alias("sb"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # r14: both directions via one explode — the former self-union
    # evaluated the lineitem self-join + pair aggregation twice
    # (identical row multiset; the top-8 window below has a total
    # deterministic order, so row order was never observable)
    both = co.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("sa").alias("sa"), F.col("sb").alias("sb"),
                    F.col("c").alias("c"),
                ),
                F.struct(
                    F.col("sb").alias("sa"), F.col("sa").alias("sb"),
                    F.col("c").alias("c"),
                ),
            )
        ).alias("_e")
    ).select("_e.sa", "_e.sb", "_e.c")
    wk = Window.partitionBy("sa").orderBy(F.col("c").desc(), F.col("sb").asc())
    knn = (
        both.withColumn("_rn", F.row_number().over(wk))
        .filter(F.col("_rn") <= 8)
        .select(F.col("sa").alias("src"), F.col("sb").alias("dst"))
    )
    return track_cache(triangle_count(knn), ps)


def q_doc_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 keywords per doc by tf·idf-ratio (log-free idf — portable
    bit-exact ranking), deterministic tie-break —
    functions/retrieval.py doc_keywords."""
    from smartdatapipeline_spark.functions.retrieval import doc_keywords

    return doc_keywords(_docs(spark, sf_dir), k=3)


def q_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood ER candidates (Hernández–Stolfo sliding
    window, w=3): linear N·w pair space vs blocking's Σ|block|² —
    functions/dedup.py sorted_neighborhood_pairs."""
    pt = spark.read.parquet(os.path.join(sf_dir, "part.parquet"))
    return DD.sorted_neighborhood_pairs(pt, window=3, max_distance=10)


def q_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planner: per source, size-desc ordered
    cumulative fill into 64 KB bins (one window pass, no driver
    bin-packing) — functions/layout.py compaction_plan."""
    from smartdatapipeline_spark.functions.layout import compaction_plan

    files = _docs(spark, sf_dir).select(
        "doc_id", "source", F.col("n_chars").alias("n_bytes")
    )
    return compaction_plan(files, target_bytes=65536)


def q_late_arrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-orderness audit that SIZES A WATERMARK: lateness behind
    the running event-time max in arrival order. The synthetic arrival
    sequence adds a deterministic 0-119 s md5 jitter to event time
    (the fixture stream is perfectly ordered — jitter models network
    delay; same expression in the oracle) — operators/quality.py
    late_arrival_stats."""
    from smartdatapipeline_spark.operators.quality import late_arrival_stats

    ev = _events(spark, sf_dir).withColumn(
        "_arrival",
        F.unix_timestamp("ts")
        + F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 15), 16, 10)
        .cast("long")
        % 120,
    )
    return late_arrival_stats(ev, arrival_col="_arrival", tiebreak_col="event_id")


def q_skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto SKYLINE per brand — parts where no same-brand part is
    cheaper with at least-equal size (sort + running-max window pass;
    the oracle runs the O(n²) NOT EXISTS form) — operators/quality.py
    skyline_front."""
    from smartdatapipeline_spark.operators.quality import skyline_front

    pt = spark.read.parquet(os.path.join(sf_dir, "part.parquet")).select(
        "p_partkey", "p_brand", "p_retailprice", "p_size"
    )
    return skyline_front(
        pt, minimize="p_retailprice", maximize="p_size",
        id_col="p_partkey", by=("p_brand",),
    )


def q_revenue_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets: revenue by (nation, order-year) with all
    subtotal planes in ONE pass (grouping-sets expand at the partial
    agg — no re-scan per plane; gid disambiguates NULL keys from NULL
    totals)."""
    T = lambda n: spark.read.parquet(os.path.join(sf_dir, f"{n}.parquet"))  # noqa: E731
    j = (
        T("lineitem")
        .join(T("orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(T("customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(T("nation")), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("order_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("_rev"),
        )
    )
    return (
        j.cube("nation", "order_year")
        .agg(
            # grouping() is only resolvable INSIDE the cube aggregate
            (F.grouping("nation") * 2 + F.grouping("order_year"))
            .cast("int")
            .alias("gid"),
            N.dsum("_rev", precision=38, scale=4).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .select("nation", "order_year", "gid", "revenue", "n_lines")
    )


#: per-corpus PQ codebook memo — train once per snapshot (the model is
#: m·k rows of driver state), score everywhere; same build/probe split
#: as the quality classifier and the ANN indexes.
_PQ_CODEBOOKS: dict[str, list] = {}


def q_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (Jégou 2011): per-subspace k-means
    codebooks → m-byte codes → asymmetric-distance top-k via per-query
    LUT — the embedding-compression search path (dim·4 bytes → m bytes
    per vector; m=16 on the 64-dim corpus = 4-dim subspaces, the
    standard PQ shape — 16× compression at recall@10 ≈ 0.48 vs exact
    L2, property-floored at 0.35 by the correctness harness). Trained
    KMeans ⇒ property-bound driver check (recall floor, round-7) —
    functions/similarity.py pq_train/pq_encode/pq_adc_topk."""
    emb = _emb(spark, sf_dir)
    if sf_dir not in _PQ_CODEBOOKS:
        _PQ_CODEBOOKS[sf_dir] = [
            (r["sub"], r["cent_id"], r["_cv"])
            for r in SIM.pq_train(emb, m=16, k=16, seed=42).collect()
        ]
    cb = spark.createDataFrame(
        _PQ_CODEBOOKS[sf_dir], "sub int, cent_id int, _cv array<double>"
    )
    codes = SIM.pq_encode(emb, cb)
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    return SIM.pq_adc_topk(cb, codes, queries, k=10)


def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated equi-join (salting — the mitigation
    key_skew_report recommends): fact rows get a deterministic salt in
    [0,8), the dimension replicates 8× with every salt, and the join
    runs on (key, salt) so one hot key spreads over 8 reducers. Output
    is provably identical to the plain join — the oracle IS the plain
    join — operators/relational.py salted_join."""
    from smartdatapipeline_spark.operators.relational import salted_join

    T = lambda n: spark.read.parquet(os.path.join(sf_dir, f"{n}.parquet"))  # noqa: E731
    j = salted_join(
        T("orders"),
        T("customer").select("c_custkey", "c_mktsegment"),
        left_key="o_custkey",
        right_key="c_custkey",
        row_col="o_orderkey",
        n_salts=8,
    )
    return j.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        N.dsum("o_totalprice").alias("total_price"),
    )


def q_ann_truncation_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style truncation eval: exact top-10 under the FULL
    64-dim embedding vs under the first 32 dims only — per query, the
    overlap@10. The go/no-go measurement before shipping truncated
    embeddings (2× storage/compute cut at 100 TB) to production."""
    emb = _emb(spark, sf_dir)
    half = emb.select(
        "vec_id", F.slice(F.col("embedding"), 1, 32).alias("embedding")
    )
    qf = emb.filter(F.col("vec_id") % 50 == 0)
    qh = half.filter(F.col("vec_id") % 50 == 0)
    full_tk = SIM.brute_force_topk(emb, qf, k=10).select(
        "query_id", "neighbor_id"
    )
    half_tk = SIM.brute_force_topk(half, qh, k=10).select(
        "query_id", F.col("neighbor_id").alias("_nh")
    )
    # overlap via inner join on (query, neighbor)
    overlap = full_tk.join(
        half_tk.withColumnRenamed("_nh", "neighbor_id"),
        ["query_id", "neighbor_id"],
    )
    per_q = overlap.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_overlap"))
    all_q = full_tk.select("query_id").distinct()
    return all_q.join(per_q, "query_id", "left").select(
        "query_id",
        F.coalesce("n_overlap", F.lit(0)).alias("n_overlap"),
        (F.coalesce("n_overlap", F.lit(0)) / F.lit(10.0)).alias("recall_at_10"),
    )


def q_pseudonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic keyed pseudonymization with referential integrity:
    user_id → stable salted 60-bit token; grouping by token reproduces
    the per-user aggregate exactly (joins/group-bys survive PII
    stripping) — functions/crypto.py pseudonymize."""
    ev = _events(spark, sf_dir)
    return (
        ev.select(
            CR.pseudonymize(F.col("user_id")).alias("user_token"),
            "value",
        )
        .groupBy("user_token")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            N.dsum("value").alias("value_sum"),
        )
    )


def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity release audit over the (event_type, day) quasi-
    identifier pair: per-class sizes in one hash aggregation, summary
    verdict row — functions/crypto.py k_anonymity."""
    ev = _events(spark, sf_dir).withColumn("day", F.to_date("ts"))
    return CR.k_anonymity(ev, ("event_type", "day"), k=5)


def q_partition_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-entropy per-day content checksums (replication/migration
    verification at table scale: exchange one row per partition, not
    the data) — order-independent portable row-hash sum + exact decimal
    value fingerprint — operators/quality.py partition_checksums."""
    from smartdatapipeline_spark.operators.quality import partition_checksums

    return partition_checksums(
        _events(spark, sf_dir),
        F.to_date("ts"),
        ("event_id", "user_id", "event_type"),
        "value",
    )


def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training (Sennrich 2016 / SentencePiece shape):
    learn 6 merges from the corpus word vocabulary — per round one
    vocabulary-sized pair count + a 1-row argmax (the merge IS model
    state) + a two-pass literal merge rewrite, portable bit-exact to
    the unrolled SQL oracle — functions/bpe.py bpe_train."""
    from smartdatapipeline_spark.functions.bpe import bpe_train

    return bpe_train(_docs(spark, sf_dir), n_merges=6)


def q_bpe_merges_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production-budget BPE trainer (functions/bpe.py bpe_train_fast):
    one distributed word-count aggregation, then the classic
    incremental greedy trainer runs driver-side on the bounded
    vocabulary — 32k merges cost zero extra Spark jobs. Trained here at
    the oracle's 6-merge budget so the SAME unrolled SQL oracle proves
    it merge-for-merge bit-exact (the merge-equivalence property test
    covers it against bpe_train at depth 8)."""
    from smartdatapipeline_spark.functions.bpe import bpe_train_fast

    return bpe_train_fast(_docs(spark, sf_dir), n_merges=6)


def q_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Kendall trend test per event series (S statistic, Kendall
    τ_a, tie-corrected Var(S), continuity-corrected z) — the
    significance twin of theilsen_trend; day²-bounded pair space —
    operators/forecast.py mann_kendall."""
    return FC.mann_kendall(_events(spark, sf_dir))


def q_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic sign random projection (Achlioptas/JL) of the
    64-dim embeddings to 16 dims — the pre-ANN dimensionality cut.
    Sign matrix from portable md5-h60, fold in index order ⇒ the
    DuckDB oracle is bit-exact — functions/similarity.py
    random_projection. Long-form output (vec_id, j, proj)."""
    return SIM.random_projection(_emb(spark, sf_dir), out_dim=16, seed=7)


def q_pq_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ production search: ADC shortlist (50) from the m=16 codes,
    then exact-L2 re-rank of just those candidates — corpus-size-
    independent re-rank cost; recall@10 property-floored well above
    bare ADC — functions/similarity.py pq_rerank_topk."""
    emb = _emb(spark, sf_dir)
    if sf_dir not in _PQ_CODEBOOKS:
        _PQ_CODEBOOKS[sf_dir] = [
            (r["sub"], r["cent_id"], r["_cv"])
            for r in SIM.pq_train(emb, m=16, k=16, seed=42).collect()
        ]
    cb = spark.createDataFrame(
        _PQ_CODEBOOKS[sf_dir], "sub int, cent_id int, _cv array<double>"
    )
    codes = SIM.pq_encode(emb, cb)
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    return SIM.pq_rerank_topk(cb, codes, emb, queries, k=10, shortlist=50)


#: per-corpus trained merge list — train once (bpe_train_fast), encode
#: everywhere; same build/score split as the PQ codebooks and the
#: quality classifier.
_BPE_MERGES: dict[str, list] = {}


def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer APPLY step: encode the corpus under the trained merge
    list (functions/bpe.py bpe_apply — pure column expressions, the
    two-pass literal replace per merge, zero UDFs), aggregated per doc
    to (n_words, n_pieces, pieces_per_word). Completes the
    train→encode tokenizer story; merges train once per corpus snapshot
    (memoized, bpe_train_fast at the oracle's 6-merge budget so the
    unrolled-SQL oracle proves the END-TO-END encode bit-exact)."""
    from smartdatapipeline_spark.functions.bpe import bpe_apply, bpe_train_fast

    docs = _docs(spark, sf_dir)
    if sf_dir not in _BPE_MERGES:
        rows = bpe_train_fast(docs, n_merges=6).orderBy("round").collect()
        _BPE_MERGES[sf_dir] = [(r["left"], r["right"]) for r in rows]
    enc = bpe_apply(docs, _BPE_MERGES[sf_dir])
    return enc.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum("n_pieces").alias("n_pieces"),
        (
            F.sum("n_pieces").cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("pieces_per_word"),
    )


def q_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-grain linear interpolation over series gaps (between nearest
    observed neighbors; one-sided gaps stay NULL) — the trend-true
    repair next to forward_fill's step function. Two frame-bounded
    windows, no self-join — operators/temporal.py
    interpolate_linear_daily."""
    from smartdatapipeline_spark.operators.temporal import (
        interpolate_linear_daily,
    )

    return interpolate_linear_daily(_events(spark, sf_dir))


def q_debounce_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tolerance-window duplicate suppression (double-fire repair for
    at-least-once producers whose retries carry fresh timestamps):
    same-payload events chain into islands when < 60 s apart; first
    survives, n_suppressed counts the absorbed retries. Returns the
    suppression summary per payload key (bounded output) —
    operators/temporal.py debounce_exact_dedup."""
    from smartdatapipeline_spark.operators.temporal import (
        debounce_exact_dedup,
    )

    surv = debounce_exact_dedup(_events(spark, sf_dir), tolerance_sec=60)
    return (
        surv.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_survivors"),
            F.sum("n_suppressed").alias("n_suppressed"),
        )
        .orderBy("event_type")
    )


def q_fernet_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL Fernet wire format (reference security/crypto.py:38-63),
    pure column expressions — AES-128-CBC via aes_encrypt(iv=...),
    HMAC-SHA256 from two sha2() calls, urlsafe base64. Library interop
    PROVEN live both directions (tests/test_fernet.py:
    cryptography.Fernet decrypts our tokens; we decrypt its random-IV
    tokens; from-scratch FIPS-197 AES pins the bytes independently).
    Tokens are deterministic (SIV-style IV; exact bytes pinned by the
    from-scratch goldens), so decrypt∘encrypt = identity on every row
    is what the oracle pins — functions/crypto.py
    fernet_encrypt/fernet_decrypt."""
    key = CR.fernet_dev_key()
    ev = _events(spark, sf_dir)
    enc = ev.withColumn("tok", CR.fernet_encrypt("props", key, timestamp=0))
    rt = CR.fernet_decrypt("tok", key).cast("string")
    return (
        enc.withColumn("rt", rt)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("rt").eqNullSafe(F.col("props")), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_roundtrip_ok"),
        )
        .orderBy("event_type")
    )


def q_gif_pixel_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL GIF PIXEL decode end-to-end (round 7 — the last image-
    format gap closed; header-only GIF support becomes full LZW
    decode): an Arrow-batched encoder builds a GIF per doc (palette
    size, dims, and every pixel a formula of doc_id; every third doc
    INTERLACED so the 4-pass path exercises; palettes up to 64 colors
    force LZW code-width growth), functions/multimodal.py
    ``decode_gif_pixels`` LZW-decodes it back, and the pixel summary is
    computed JVM-side. The oracle recomputes everything from doc_id
    arithmetic alone — any defect in the block walk, color table, LZW
    width schedule, or deinterlace breaks the bit-exact match."""
    import pandas as pd
    from pyspark.sql import types as PT

    d = _docs(spark, sf_dir).select("doc_id")
    enc_schema = PT.StructType(
        [d.schema["doc_id"], PT.StructField("blob", PT.BinaryType())]
    )

    def _enc(batches):
        from smartdatapipeline_spark.functions.multimodal import encode_gif

        for pdf in batches:
            blobs = []
            for did in pdf["doc_id"]:
                did = int(did)
                w = did % 13 + 1
                h = did % 11 + 1
                ncol = did % 63 + 2
                rgb = b"".join(
                    bytes(
                        (
                            ((did * 31 + j * 7) % ncol * 41 + k) % 256
                            for k in range(3)
                        )
                    )
                    for j in range(w * h)
                )
                blobs.append(
                    encode_gif(w, h, rgb, interlace=(did % 3 == 0))
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "blob": blobs})

    dec = MM.decode_gif_pixels(d.mapInPandas(_enc, schema=enc_schema))
    hexed = dec.withColumn("_hex", F.hex("pixels"))
    n = F.octet_length("pixels").cast("int")

    def byte_at(i):
        return F.conv(F.col("_hex").substr(i * 2 + 1, F.lit(2)), 16, 10).cast(
            "long"
        )

    return hexed.select(
        "doc_id",
        "width",
        "height",
        "n_channels",
        F.aggregate(
            F.sequence(F.lit(0), n - 1),
            F.lit(0).cast("long"),
            lambda acc, i: acc + byte_at(i),
        ).alias("pixel_sum"),
        byte_at(F.lit(0)).alias("first_px"),
        byte_at(n - 1).alias("last_px"),
    )


def q_wav_sample_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL WAV PCM SAMPLE decode end-to-end (round 7 — the audio story
    past the header): an Arrow-batched encoder builds a 16-bit PCM WAV
    per doc (every sample a formula of doc_id; every second doc STEREO
    so the frame/block walk exercises), functions/multimodal.py
    ``decode_audio_samples`` parses it back and reduces to exact
    integer features (code sum/square-sum, peak, sign zero-crossings).
    The oracle recomputes every feature from doc_id arithmetic alone —
    any defect in the chunk walk, block math, scaling, or channel
    de-interleave breaks the bit-exact match."""
    import pandas as pd
    from pyspark.sql import types as PT

    d = _docs(spark, sf_dir).select("doc_id")
    enc_schema = PT.StructType(
        [d.schema["doc_id"], PT.StructField("blob", PT.BinaryType())]
    )

    def _enc(batches):
        import numpy as np

        from smartdatapipeline_spark.functions.multimodal import encode_wav

        for pdf in batches:
            blobs = []
            for did in pdf["doc_id"]:
                did = int(did)
                n = did % 50 + 10
                pcm = np.array(
                    [((did * 37 + j * 11) % 4001) - 2000 for j in range(n)],
                    dtype=np.float64,
                )
                blobs.append(
                    encode_wav(
                        pcm / 32768.0, 8000, 16, channels=did % 2 + 1
                    )
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "blob": blobs})

    return MM.decode_audio_samples(d.mapInPandas(_enc, schema=enc_schema))


# ── round 9: HLL / Count-Min / char_diversity (wiring the r8 family) ─
#
# The reference answers distinct counts only by exact COUNT(DISTINCT)
# rescans (backend/app/services/kpi.py:40-43,60-61). The HLL register
# family is the 100-TB path: per-day register partials merge by
# bucket-wise MAX (4 KB per group) instead of rescanning events. The
# registers are built from the portable md5-h60 hash, so DuckDB
# replicates them bit-for-bit and the oracle hash-compares the
# REGISTERS and the integer-exact raw-estimate arithmetic directly.


def q_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day HLL register tables over events.user_id (p=8, m=256):
    (day, bucket, rho) — the mergeable daily partial a 100-TB rollup
    stores instead of raw ids. Oracle rebuilds every register from the
    same md5 hash: bucket = top 8 bits of h60, rho = 53 − bit_length of
    the remaining 52 bits (base-2 string length, no floats)."""
    from smartdatapipeline_spark.functions import sketch as SK

    ev = _events(spark, sf_dir).filter(F.col("user_id").isNotNull())
    ev = ev.withColumn("day", F.to_date("ts"))
    return SK.hll_partial(ev, "user_id", by=["day"], p=8)


def q_hll_merge_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """merge(daily partials) ⇒ whole-range raw estimate, proven against
    an oracle that sketches the WHOLE range directly — the hash match
    is the algebraic identity merge(partial(day_i)) == partial(∪days)
    plus the integer-exact estimator arithmetic (z_num is Σ2^(K−rho)
    over the common denominator 2^K; raw_est is ONE double division by
    the Python-precomputed constant embedded identically in both
    engines)."""
    from smartdatapipeline_spark.functions import sketch as SK

    ev = _events(spark, sf_dir).filter(F.col("user_id").isNotNull())
    ev = ev.withColumn("day", F.to_date("ts"))
    daily = SK.hll_partial(ev, "user_id", by=["day"], p=8)
    merged = SK.hll_reaggregate(daily, drop=["day"], by=["day"])
    return SK.hll_raw_estimate(merged, p=8)


def q_hll_raw_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped raw HLL estimates per event_type over event_id — the
    large-range regime (≫ 2.5m, small_range = false), exercising the
    non-linear-counting branch with one register table per group."""
    from smartdatapipeline_spark.functions import sketch as SK

    ev = _events(spark, sf_dir).filter(F.col("event_id").isNotNull())
    reg = SK.hll_partial(ev, "event_id", by=["event_type"], p=8)
    return SK.hll_raw_estimate(reg, by=["event_type"], p=8)


def q_cms_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min counter grid (depth 4 × width 256) over
    events.event_type: (row, cell, n) — the mergeable frequency partial
    (map-side combine collapses each scan task to ≤ 1024 rows before
    the shuffle). Oracle rebuilds every cell from the salted md5
    row-hashes."""
    from smartdatapipeline_spark.functions import sketch as SK

    ev = _events(spark, sf_dir).filter(F.col("event_type").isNotNull())
    return SK.cms_partial(ev, "event_type", depth=4, width=256)


def q_cms_heavy_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-query the Count-Min sketch for every distinct event_type:
    est = min over the 4 addressed cells, guaranteed ≥ the true count
    and ≤ true + (e/256)·N w.h.p. The sketch side is broadcast (≤ 1024
    rows by construction) so the probe side never shuffles for the
    join."""
    from smartdatapipeline_spark.functions import sketch as SK

    ev = _events(spark, sf_dir).filter(F.col("event_type").isNotNull())
    cms = SK.cms_partial(ev, "event_type", depth=4, width=256)
    probes = ev.select("event_type").distinct()
    return SK.cms_lookup(cms, probes, "event_type", depth=4, width=256)


def q_kpi_monthly_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly distinct users per metric from DAILY register partials
    (operators/kpi.py distinct_rollup) — the A2 COUNT(DISTINCT)
    re-aggregation the reference answers by rescanning, done as a
    constant-size register fold. Oracle sketches each whole month
    directly: the hash match is the daily→month merge identity plus
    the integer-exact estimator."""
    ev = _events(spark, sf_dir)
    return K.distinct_rollup(
        ev, key_col="user_id", ts_col="ts", metric_col="event_type", period="month"
    )


def q_kmv_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bottom-k (KMV/Theta) distinct sketch per event_type: the 64
    smallest distinct user-hash order statistics — the mergeable
    distinct summary that, unlike HLL registers, also supports set
    INTERSECTION (functions/sketch.py kmv_partial). Oracle rebuilds the
    exact same order statistics with ROW_NUMBER over the distinct
    portable-md5 hashes."""
    from smartdatapipeline_spark.functions import sketch as SK

    ev = _events(spark, sf_dir)
    return SK.kmv_partial(ev, "user_id", by=["event_type"], k=64)


def q_kmv_distinct_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-user estimate per event_type from the bottom-k sketch:
    exact below k, else the unbiased (k−1)/U_(k) estimator as ONE
    double division of exact integers (cross-engine bit-stable)."""
    from smartdatapipeline_spark.functions import sketch as SK

    ev = _events(spark, sf_dir)
    sk = SK.kmv_partial(ev, "user_id", by=["event_type"], k=64)
    return SK.kmv_distinct(sk, by=["event_type"], k=64)


def q_kmv_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-audience intersection from sketches alone — "how many
    users did BOTH purchase and click" answered from two 64-row
    bottom-k summaries with NO rescan of either event stream (the set
    operation HLL registers cannot express). Exact integer semi-joins
    on the union sketch's membership; two IEEE-exact divisions."""
    from smartdatapipeline_spark.functions import sketch as SK

    ev = _events(spark, sf_dir)
    a = SK.kmv_partial(ev.filter(F.col("event_type") == "purchase"), "user_id", k=64)
    b = SK.kmv_partial(ev.filter(F.col("event_type") == "click"), "user_id", k=64)
    return SK.kmv_intersect(a, b, k=64)


def q_dyadic_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile summary (Cormode–Muthukrishnan dyadic CMS)
    over events.value in integer cents (floor(value·100), 16 dyadic
    levels, 4×2048 grid per level) — the bounded, SUM-mergeable
    structure any quantile is answered from without rescans
    (functions/sketch.py dyadic_cms_partial). Oracle rebuilds every
    counter cell from the same salted hashes."""
    from smartdatapipeline_spark.functions import sketch as SK

    ev = _events(spark, sf_dir).filter(F.col("value").isNotNull())
    cents = ev.select(F.floor(F.col("value") * 100).cast("long").alias("v"))
    return SK.dyadic_cms_partial(cents, "v", levels=16, depth=4, width=2048)


def q_dyadic_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-GROUP mergeable quantile sketches (round 10): one
    independent dyadic-CMS grid per event_type over events.value cents
    — the grouped analog of the reference's per-series distribution
    math (backend/app/services/anomaly.py consumes per-series
    distributions); per-(source,metric) quantiles are answered from
    these stored cells by dyadic_cms_quantiles_grouped without any
    rescan. Oracle rebuilds every (event_type, level, row, cell)
    counter from the same salted hashes — cell-level bit-exact."""
    from smartdatapipeline_spark.functions import sketch as SK

    ev = _events(spark, sf_dir).filter(F.col("value").isNotNull())
    cents = ev.select(
        F.col("event_type"),
        F.floor(F.col("value") * 100).cast("long").alias("v"),
    )
    return SK.dyadic_cms_partial(
        cents, "v", levels=16, depth=4, width=2048, by=["event_type"]
    )


def _tmp_store(kind: str, sf_dir: str) -> str:
    """Deterministic per-(kind, sf_dir) store path under the repo's
    gitignored .tmp_stores/ — the first invocation builds the store,
    later invocations (bench reps, re-checks) hit the incremental
    no-new-days path and measure the READ side, which is the point of
    the store architecture. The events parquet's (size, mtime) is part
    of the path so regenerated testdata can never serve stale
    sketches."""
    base = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    ev_path = os.path.join(sf_dir, "events.parquet")
    try:
        st = os.stat(ev_path)
        fp = f"{st.st_size}_{int(st.st_mtime)}"
    except OSError:
        fp = "nofp"
    root = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        ".tmp_stores")
    os.makedirs(root, exist_ok=True)
    return os.path.join(root, f"{kind}_{base}_{fp}")


def q_distinct_from_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERSISTED-store range read (round 10, VERDICT task #6): daily
    HLL register partials are upserted through the crash-consistent
    txn sink (first week, then the rest — exercising the incremental
    path), and the per-event_type distinct estimate for
    [2024-01-08, 2024-01-21] is answered from STORED registers alone
    with metric_date partition pruning — no events rescan. The oracle
    sketches the same date range directly from events; register
    max-fold makes the two bit-identical
    (operators/sketchstore.py distinct_from_store)."""
    from smartdatapipeline_spark.operators.sketchstore import (
        distinct_from_store,
        update_register_store,
    )

    ev = _events(spark, sf_dir)
    store = _tmp_store("hll", sf_dir)
    week1 = ev.filter(F.to_date("ts") <= F.lit("2024-01-07"))
    update_register_store(week1, store, metric_col="event_type")
    update_register_store(ev, store, metric_col="event_type")
    return distinct_from_store(
        spark, store, start="2024-01-08", end="2024-01-21",
        metric_col="event_type",
    )


def q_distinct_from_store_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME store read on the SNAPSHOT backend (r11; r10 VERDICT
    #6): daily HLL partials committed through the snapshot table
    (put-if-absent manifest commits, no locks/renames — object-store
    legal) instead of the POSIX txn sink; the range read prunes at the
    manifest level via per-batch metric_date min/max stats. Same
    incremental build, same oracle, bit-identical estimates — proving
    the two commit mechanisms are interchangeable behind ``backend=``
    (operators/sketchstore.py)."""
    from smartdatapipeline_spark.operators.sketchstore import (
        distinct_from_store,
        update_register_store,
    )

    ev = _events(spark, sf_dir)
    store = _tmp_store("hllsnap", sf_dir)
    week1 = ev.filter(F.to_date("ts") <= F.lit("2024-01-07"))
    update_register_store(
        week1, store, metric_col="event_type", backend="snapshot"
    )
    update_register_store(ev, store, metric_col="event_type", backend="snapshot")
    return distinct_from_store(
        spark, store, start="2024-01-08", end="2024-01-21",
        metric_col="event_type", backend="snapshot",
    )


def q_kmv_overlap_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience overlap FROM THE STORE (round 10, VERDICT task #4):
    daily bottom-k partials persisted per (day, event_type), then
    "how many users did BOTH purchase and click in [01-08, 01-21]"
    folds ≤ k stored rows per (day, type) — never rescanning events.
    Fold-of-daily-bottom-k == direct bottom-k of the range (a global
    k-smallest hash is its own day's k-smallest), so the oracle
    sketching the range directly is bit-identical
    (operators/sketchstore.py overlap_from_store)."""
    from smartdatapipeline_spark.operators.sketchstore import (
        overlap_from_store,
        update_kmv_store,
    )

    ev = _events(spark, sf_dir)
    store = _tmp_store("kmv", sf_dir)
    update_kmv_store(ev, store, metric_col="event_type")
    return overlap_from_store(
        spark, store, "purchase", "click",
        start="2024-01-08", end="2024-01-21", metric_col="event_type",
    )


def q_bloom_membership_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range membership FROM THE STORE (round 10): daily Bloom word
    tables persisted per (day, event_type); "was this user a purchaser
    in [01-08, 01-21]" OR-folds the range's stored words and probes —
    no false negatives, no events rescan. Daily-word bit_or ==
    direct words of the range (OR is associative over the same bits),
    so the word-table oracle is bit-identical
    (operators/sketchstore.py membership_from_store)."""
    from smartdatapipeline_spark.operators.sketchstore import (
        membership_from_store,
        update_bloom_store,
    )

    ev = _events(spark, sf_dir)
    store = _tmp_store("bloom", sf_dir)
    update_bloom_store(ev, store, metric_col="event_type")
    probes = ev.filter(F.col("user_id").isNotNull()).select("user_id").distinct()
    return membership_from_store(
        spark, store, probes, probe_col="user_id",
        start="2024-01-08", end="2024-01-21", metric="purchase",
        metric_col="event_type",
    )


def q_dyadic_range_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-quantile cells FROM THE STORE (round 10): per-day dyadic
    partials persisted through the txn sink; the folded cell grid for
    [2024-01-08, 2024-01-21] (the surface quantiles_from_store walks)
    comes from stored cells only — counting is additive, so
    fold-of-daily == direct sketch of the range and the oracle
    rebuilding every cell from date-filtered events is bit-identical
    (operators/sketchstore.py dyadic_cells_from_store)."""
    from smartdatapipeline_spark.operators.sketchstore import (
        dyadic_cells_from_store,
        update_dyadic_store,
    )

    ev = _events(spark, sf_dir).filter(F.col("value").isNotNull())
    store = _tmp_store("dyadic", sf_dir)
    update_dyadic_store(ev, store, levels=16, depth=4, width=2048)
    return dyadic_cells_from_store(
        spark, store, start="2024-01-08", end="2024-01-21"
    )


def q_dyadic_series_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-SERIES quantile grids from the store (round 10): daily
    dyadic partials keyed by (day, event_type); the folded per-series
    cell grids for [2024-01-08, 2024-01-21] are what
    quantiles_from_store(by_metric=True) walks — per-series
    distributions (the reference's anomaly input,
    backend/app/services/anomaly.py) served from stored cells with no
    events rescan. Counting is additive per series, so the oracle
    rebuilding every (event_type, level, row, cell) from date-filtered
    events is bit-identical
    (operators/sketchstore.py dyadic_cells_from_store)."""
    from smartdatapipeline_spark.operators.sketchstore import (
        dyadic_cells_from_store,
        update_dyadic_store,
    )

    ev = _events(spark, sf_dir).filter(F.col("value").isNotNull())
    store = _tmp_store("dyadicm", sf_dir)
    update_dyadic_store(
        ev, store, levels=16, depth=4, width=2048, metric_col="event_type"
    )
    return dyadic_cells_from_store(
        spark, store, start="2024-01-08", end="2024-01-21", by_metric=True
    )


def q_rolling_distinct_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct users for EVERY day of [01-08, 01-21],
    all from stored registers (round 10): each stored per-day register
    row explodes to the ≤7 output days it serves, bucket-max per day,
    one raw estimate per point — the rolling-actives dashboard series
    answered with zero events rescans (the reference recomputes exact
    COUNT(DISTINCT) per point, backend/app/services/kpi.py). The
    oracle sketches every trailing window directly — register max-fold
    makes each day bit-identical
    (operators/sketchstore.py rolling_distinct_from_store)."""
    from smartdatapipeline_spark.operators.sketchstore import (
        rolling_distinct_from_store,
        update_register_store,
    )

    ev = _events(spark, sf_dir)
    store = _tmp_store("hll", sf_dir)
    update_register_store(ev, store, metric_col="event_type")
    return rolling_distinct_from_store(
        spark, store, start="2024-01-08", end="2024-01-21",
        window_days=7, metric_col="event_type",
    )


def q_kmv_new_audience_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-vs-returning purchasers from the KMV store (round 10): how
    many of [01-08, 01-14]'s distinct purchasers were NOT active in
    [01-01, 01-07] — `kmv_difference` over two folded range sketches,
    ≤ k stored rows per day per side, no events rescan. Exact integer
    anti-join membership counts + the same IEEE-exact estimator
    divisions, so the oracle sketching both ranges directly is
    bit-identical (operators/sketchstore.py new_audience_from_store)."""
    from smartdatapipeline_spark.operators.sketchstore import (
        new_audience_from_store,
        update_kmv_store,
    )

    ev = _events(spark, sf_dir)
    store = _tmp_store("kmv", sf_dir)
    update_kmv_store(ev, store, metric_col="event_type")
    return new_audience_from_store(
        spark, store, "purchase",
        prev_start="2024-01-01", prev_end="2024-01-07",
        cur_start="2024-01-08", cur_end="2024-01-14",
        metric_col="event_type",
    )


def _ensure_snap_table(spark: SparkSession, sf_dir: str) -> str:
    """Build the snapshot-committed KPI table once per (sf_dir, data
    fingerprint): v1 appends the full-range daily KPIs; v2 OVERWRITES
    the [01-08, 01-14] partitions with a corrected recompute that
    scrubs value>100 outliers (the late-correction upsert flow the
    reference runs as ON CONFLICT, services/kpi.py:143-231 — here via
    the object-store-legal commit protocol). Idempotency keys make a
    crashed/retried build converge to the same two commits."""
    from smartdatapipeline_spark.sources import snapstore as SS

    root = _tmp_store("snap", sf_dir)
    if SS.table_version(root) >= 2:
        return root
    ev = _events(spark, sf_dir)
    sum_dec = F.sum(F.col("value").cast("decimal(28,4)")).cast("double")

    def kpis(df):
        return df.groupBy(
            F.to_date("ts").alias("metric_date"),
            F.col("event_type").alias("metric"),
        ).agg(sum_dec.alias("value_sum"), F.count(F.lit(1)).alias("value_count"))

    SS.append(kpis(ev), root, "metric_date", idempotency_key="snap-build-v1")
    week = ev.filter(
        F.to_date("ts").between("2024-01-08", "2024-01-14")
        & (F.col("value") <= 100)
    )
    SS.overwrite_partitions(
        kpis(week), root, "metric_date", idempotency_key="snap-build-v2"
    )
    return root


def q_snapshot_upsert_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-table partition upsert, LATEST snapshot (round 10; the
    object-store-safe upsert path of sources/snapstore.py — put-if-
    absent manifest commits, immutable data, copy-on-write residues —
    closing the round-9 "missing #3" Delta/Iceberg gap from public
    designs, Armbrust et al. VLDB 2020). v1 = full-range daily KPIs;
    v2 overwrote [01-08, 01-14] with an outlier-scrubbed recompute;
    this reads the live file set of v2. Oracle recomputes the same
    CASE-corrected aggregate from events directly."""
    from smartdatapipeline_spark.sources import snapstore as SS

    root = _ensure_snap_table(spark, sf_dir)
    return SS.read_table(spark, root)


def q_snapshot_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME TRAVEL to the pre-correction snapshot (round 10): version 1
    of the same table — the exact state before the outlier scrub, still
    readable because v1's files are immutable and retained (training-
    data reproducibility: read the corpus a model actually saw). The
    oracle is the UNcorrected aggregate — proving the old snapshot is
    bit-intact after the overwrite (sources/snapstore.py read_table)."""
    from smartdatapipeline_spark.sources import snapstore as SS

    root = _ensure_snap_table(spark, sf_dir)
    return SS.read_table(spark, root, version=1)


def q_snapshot_pruned_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MANIFEST-level partition pruning (round 10): the corrected-week
    read lists ONLY the manifest entries whose tracked partition values
    intersect [01-08, 01-14] — non-matching batch dirs never reach the
    scan plan (Iceberg-style file pruning ahead of parquet row groups).
    Oracle: the corrected week's aggregate from events."""
    from smartdatapipeline_spark.sources import snapstore as SS

    root = _ensure_snap_table(spark, sf_dir)
    days = [f"2024-01-{d:02d}" for d in range(8, 15)]
    return SS.read_table(
        spark, root, partition_values=days, partition_col="metric_date"
    )


def q_snapshot_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHANGE DATA FEED between snapshot versions (round 10; the
    public Delta CDF / Iceberg CDC-on-read shape,
    sources/snapstore.py table_changes): the v1→v2 logical delta of
    the KPI table — (day, metric) groups whose aggregates the
    outlier-scrub correction actually changed, as delete+insert row
    pairs; groups the scrub left identical cancel under bag-semantics
    exceptAll, as do rows merely moved by residue rewrites. Oracle:
    EXCEPT ALL between the two aggregates computed from events."""
    from smartdatapipeline_spark.sources import snapstore as SS

    root = _ensure_snap_table(spark, sf_dir)
    return SS.table_changes(spark, root, 1, 2)


def _ensure_cdc_tables(spark: SparkSession, sf_dir: str) -> str:
    """Build the CDC-refresh pair once per (sf_dir, data fingerprint):
    silver ingested in THREE day-slice appends, gold refreshed after
    each via ``refresh_gold_from_changes`` (operators/pipeline.py) —
    touched days from the CHANGE FEED, recompute over manifest-pruned
    day reads, never a silver rescan — then a correction DELETE of
    2024-01-15 from silver and a fourth refresh that must remove the
    day from gold. Every step is idempotency-keyed, so a crashed or
    re-run build converges to the same log."""
    from smartdatapipeline_spark.operators.pipeline import (
        last_refreshed_silver_version,
        refresh_gold_from_changes,
    )
    from smartdatapipeline_spark.sources import snapstore as SS

    silver = _tmp_store("cdcsilver2", sf_dir)
    gold = _tmp_store("cdcgold2", sf_dir)
    sv = SS.table_version(silver)
    if sv >= 3 and last_refreshed_silver_version(gold) == sv:
        return gold
    ev = (
        _events(spark, sf_dir)
        .select("ts", F.col("event_type").alias("metric"), "value", "user_id")
        .withColumn("event_date", F.to_date("ts"))
    )
    slices = [
        ("cdc-b1", ev.filter(F.col("event_date") <= "2024-01-10")),
        ("cdc-b2", ev.filter(F.col("event_date").between("2024-01-11", "2024-01-20"))),
        ("cdc-b3", ev.filter(F.col("event_date") > "2024-01-20")),
    ]
    for key, df in slices:
        SS.append(df, silver, "event_date", idempotency_key=key)
        refresh_gold_from_changes(spark, silver, gold)
    SS.delete_partitions(
        spark, silver, "event_date", ["2024-01-15"], idempotency_key="cdc-del-0115"
    )
    refresh_gold_from_changes(spark, silver, gold)
    return gold


def q_snapshot_stream_net(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING SOURCE over the snapshot table (r11; r10 VERDICT #4;
    streaming/snapsource.py): the silver table's commit log — 3 slice
    appends plus a correction that deleted 2024-01-15, with residue
    churn — is tailed as a Structured Stream via the Python Data
    Source API (offsets = log versions, one pyarrow file-read per
    partition, residue moves filtered out at the source). The feed is
    NETTED (+insert/−delete) and aggregated per (day, metric); the
    oracle aggregates events minus the deleted day directly, so
    equality proves the stream replays the table's whole history to
    its exact final state — phantom-row-free."""
    import uuid as _uuid

    from smartdatapipeline_spark.streaming.snapsource import (
        SnapshotChangeDataSource,
    )

    _ensure_cdc_tables(spark, sf_dir)
    silver = _tmp_store("cdcsilver2", sf_dir)
    spark.dataSource.register(SnapshotChangeDataSource)
    qn = f"snap_feed_{_uuid.uuid4().hex[:8]}"
    # APPEND-mode raw feed + batch-side aggregation (r14, measured):
    # moving the netting aggregate INSIDE the stream (complete-mode
    # memory sink) probed 3x SLOWER (3.7 -> 11.0 s median at sf0.1) —
    # a stateful streaming aggregation pays state-store open/commit on
    # every frozen shuffle partition for what availableNow drains in
    # ONE batch, while the raw memory sink + one batch aggregate is a
    # single cheap pass at this feed size.
    q = (
        spark.readStream.format("snapshot_changes")
        .option("root", silver)
        .load()
        .writeStream.format("memory")
        .queryName(qn)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    feed = spark.table(qn)
    sign = F.when(F.col("_change_type") == "insert", 1).otherwise(-1)
    return (
        feed.groupBy(F.col("event_date").alias("metric_date"), "metric")
        .agg(
            F.sum(sign).alias("n_rows"),
            F.sum(F.col("value").cast("decimal(28,4)") * sign)
            .cast("double")
            .alias("value_sum"),
        )
        .filter(F.col("n_rows") != 0)
    )


def q_snapshot_zorder_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE ZORDER + column-stats skipping (r11): raw events land
    in the snapshot table as three ingest-order appends (every batch
    spans the full value range — a value predicate skips nothing),
    then the nightly OPTIMIZE rewrites the table z-ordered on
    (value, user_id) into 8 tight-range batches
    (sources/snapstore.py compact(zorder_by=…) over
    functions/layout.py Morton keys). The benched read aggregates a
    narrow value band via ``column_range`` — batches whose recorded
    min/max cannot intersect are never listed to Spark. Oracle: the
    same aggregate from events directly."""
    from smartdatapipeline_spark.sources import snapstore as SS

    root = _tmp_store("zsnap", sf_dir)
    # build-once guard keyed on the OPTIMIZE commit itself (a version
    # floor broke when an ingest slice hashed empty and skipped its
    # append — r11 final-bench finding: the guard re-ran the whole
    # build, including 8 orphan batch writes, on every rep)
    if SS.find_commit_by_key(root, "z-optimize") is None:
        ev = _events(spark, sf_dir).select("ts", "event_type", "value", "user_id")
        for i, key in enumerate(("z-b1", "z-b2", "z-b3")):
            SS.append(
                ev.filter(F.crc32(F.col("event_type")) % 3 == i).withColumn(
                    "event_date", F.to_date("ts")
                ),
                root,
                "event_date",
                idempotency_key=key,
                stats_cols=("value", "user_id"),
            )
        SS.compact(
            spark, root, target_batches=8, zorder_by=("value", "user_id"),
            idempotency_key="z-optimize",
        )
    band = SS.read_table(spark, root, column_range=("value", 20.0, 40.0))
    sum_dec = F.sum(F.col("value").cast("decimal(28,4)")).cast("double")
    return (
        band.groupBy(F.col("event_type").alias("metric"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            sum_dec.alias("value_sum"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


def q_hll_store_cdc_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL MATERIALIZED VIEW beyond gold (r11): the HLL
    register store is maintained from the SAME silver change feed as
    the KPI table — ``refresh_register_store_from_changes`` recomputes
    only the touched days' partials and DELETES the day a correction
    emptied (2024-01-15 vanishes from the store), proving
    ``refresh_from_changes`` generalizes to any day-grain derived
    table. The read answers per-metric distinct-user estimates from
    stored registers alone; the oracle sketches events minus the
    deleted day directly — register max-fold makes them bit-identical
    (operators/sketchstore.py refresh_register_store_from_changes)."""
    from smartdatapipeline_spark.operators.sketchstore import (
        distinct_from_store,
        refresh_register_store_from_changes,
    )
    from smartdatapipeline_spark.operators.pipeline import (
        last_refreshed_silver_version,
    )
    from smartdatapipeline_spark.sources import snapstore as SS

    _ensure_cdc_tables(spark, sf_dir)
    silver = _tmp_store("cdcsilver2", sf_dir)
    store = _tmp_store("hllmv", sf_dir)
    if last_refreshed_silver_version(store) < SS.table_version(silver):
        refresh_register_store_from_changes(
            spark, silver, store, key_col="user_id", metric_col="metric", p=8
        )
    return distinct_from_store(
        spark, store, key_col="user_id", metric_col="metric",
        by_metric=True, backend="snapshot",
    )


def q_cdc_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-DRIVEN INCREMENTAL KPI REFRESH (r11 flagship; r10 VERDICT
    #1): the reference's "ingest then recompute affected KPIs" loop
    (backend/app/routers/ingest.py:183-189, services/kpi.py:252-324)
    done scale-correctly — gold is refreshed from silver's change feed
    (only files that entered/left the live set are read), recomputing
    ONLY the day partitions the changes touched via manifest-pruned
    reads, with idempotent commits keyed by the consumed silver
    version. The table here went through 3 slice ingests + a
    correction that DELETED 2024-01-15; the oracle recomputes daily
    KPIs from events minus that day — equality proves incremental ==
    full recompute including disappearing groups."""
    from smartdatapipeline_spark.sources import snapstore as SS

    gold = _ensure_cdc_tables(spark, sf_dir)
    return SS.read_table(spark, gold)


def q_snapshot_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level MERGE INTO, ``when_matched="ignore"`` (r12; r11
    VERDICT #1): the reference's ``ON CONFLICT (source_id, ts, metric)
    DO NOTHING`` write contract (backend/app/services/ingestion.py:
    214-227) at the STORAGE layer — sources/snapstore.py ``merge``.
    Base = events through 01-20; the incoming batch re-sends 01-15
    onward, so 01-15..01-20 are duplicate keys (dropped via an
    anti-join against a column-pruned read of only the key-range-
    intersecting files — no file is ever rewritten) and 01-21.. are
    genuine inserts. Final state must equal the full events table
    exactly: a broken dedup doubles the overlap week, a broken insert
    loses the tail."""
    from smartdatapipeline_spark.sources import snapstore as SS

    root = _tmp_store("mergesnap", sf_dir)
    if SS.find_commit_by_key(root, "mg-ignore") is None:
        ev = _events(spark, sf_dir).withColumn("event_date", F.to_date("ts"))
        SS.append(
            ev.filter(F.col("event_date") <= "2024-01-20"),
            root, "event_date",
            idempotency_key="mg-base", stats_cols=("event_id",),
        )
        SS.merge(
            ev.filter(F.col("event_date") >= "2024-01-15"),
            root, keys=["event_id"], when_matched="ignore",
            partition_col="event_date",
            idempotency_key="mg-ignore", stats_cols=("event_id",),
        )
    sum_dec = F.sum(F.col("value").cast("decimal(28,4)")).cast("double")
    return (
        SS.read_table(spark, root)
        .groupBy(
            F.col("event_date").alias("metric_date"),
            F.col("event_type").alias("metric"),
        )
        .agg(F.count(F.lit(1)).alias("n_rows"), sum_dec.alias("value_sum"))
    )


def q_snapshot_merge_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO, ``when_matched="update"`` (r12): a correction batch
    re-prices the 01-08..01-10 purchase rows at 2× value, keyed by
    event_id. Copy-on-write touches ONLY the ≤01-10 ingest batch —
    manifest partition pruning excludes the others, and an
    input_file_name probe confirms actual key hits before any rewrite
    (sources/snapstore.py merge). Oracle: the same CASE-corrected
    aggregate from events — matched rows replaced in place, zero rows
    duplicated or lost."""
    from smartdatapipeline_spark.sources import snapstore as SS

    root = _tmp_store("mergeupd2", sf_dir)
    if SS.find_commit_by_key(root, "mg-update") is None:
        ev = _events(spark, sf_dir).withColumn("event_date", F.to_date("ts"))
        # slice bounds must COVER the table at any scale: the 10x dir
        # spreads events far past January, so the tail slice is open
        for key, cond in (
            ("mu-b1", F.col("event_date") <= "2024-01-10"),
            ("mu-b2", F.col("event_date").between("2024-01-11", "2024-01-20")),
            ("mu-b3", F.col("event_date") > "2024-01-20"),
        ):
            SS.append(
                ev.filter(cond),
                root, "event_date",
                idempotency_key=key, stats_cols=("event_id",),
            )
        corrected = ev.filter(
            F.col("event_date").between("2024-01-08", "2024-01-10")
            & (F.col("event_type") == "purchase")
        ).withColumn("value", F.col("value") * 2)
        SS.merge(
            corrected, root, keys=["event_id"], when_matched="update",
            partition_col="event_date", idempotency_key="mg-update",
        )
    sum_dec = F.sum(F.col("value").cast("decimal(28,4)")).cast("double")
    return (
        SS.read_table(spark, root)
        .groupBy(
            F.col("event_date").alias("metric_date"),
            F.col("event_type").alias("metric"),
        )
        .agg(F.count(F.lit(1)).alias("n_rows"), sum_dec.alias("value_sum"))
    )


def q_snapshot_delete_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate DELETE WHERE — the takedown/GDPR path (r12; r11
    VERDICT #2): remove ONE user's rows from the snapshot table,
    row-level, not partition-level. Only files whose probe scan finds
    an actual match are rewritten (survivors move to a residue batch;
    sources/snapstore.py delete_where); the CDC feed emits the
    deletions. Oracle: events minus that user — NULL user_ids are
    KEPT (a NULL predicate evaluation keeps the row, SQL DELETE
    semantics)."""
    from smartdatapipeline_spark.sources import snapstore as SS

    root = _tmp_store("delsnap2", sf_dir)
    if SS.find_commit_by_key(root, "gdpr-user7") is None:
        ev = _events(spark, sf_dir).withColumn("event_date", F.to_date("ts"))
        for key, cond in (
            ("dw-b1", F.col("event_date") <= "2024-01-10"),
            ("dw-b2", F.col("event_date").between("2024-01-11", "2024-01-20")),
            ("dw-b3", F.col("event_date") > "2024-01-20"),
        ):
            SS.append(
                ev.filter(cond),
                root, "event_date",
                idempotency_key=key, stats_cols=("user_id",),
            )
        SS.delete_where(
            spark, root, "user_id = 7", prune=("user_id", 7, 7),
            idempotency_key="gdpr-user7",
        )
    sum_dec = F.sum(F.col("value").cast("decimal(28,4)")).cast("double")
    return (
        SS.read_table(spark, root)
        .groupBy(
            F.col("event_date").alias("metric_date"),
            F.col("event_type").alias("metric"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            sum_dec.alias("value_sum"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


def q_snapshot_delete_dv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DELETE WHERE via DELETION VECTORS (r13; r12 VERDICT #2): the
    same takedown as ``snapshot_delete_where`` — remove user 7's rows
    — but merge-on-read: the commit lands one tiny (_file, _pos)
    position sidecar and rewrites NOTHING (sources/snapstore.py
    delete_where(mode="dv"), the Delta deletion-vector / Iceberg
    position-delete trade); readers apply the sidecar as a position
    anti-join until the next OPTIMIZE folds it. Identical oracle to
    the copy-on-write path — the two physical strategies must be
    indistinguishable to a reader. Reference parity: row-targeted ORM
    deletes (takedown endpoints) at takedown frequency, where a 1-row
    delete must not pay a file rewrite."""
    from smartdatapipeline_spark.sources import snapstore as SS

    root = _tmp_store("delsnapdv", sf_dir)
    if SS.find_commit_by_key(root, "dv-user7") is None:
        ev = _events(spark, sf_dir).withColumn("event_date", F.to_date("ts"))
        for key, cond in (
            ("dvb-1", F.col("event_date") <= "2024-01-10"),
            ("dvb-2", F.col("event_date").between("2024-01-11", "2024-01-20")),
            ("dvb-3", F.col("event_date") > "2024-01-20"),
        ):
            SS.append(
                ev.filter(cond),
                root, "event_date",
                idempotency_key=key, stats_cols=("user_id",),
            )
        SS.delete_where(
            spark, root, "user_id = 7", prune=("user_id", 7, 7),
            idempotency_key="dv-user7", mode="dv",
        )
    # the read-side proof the sidecar landed instead of a rewrite:
    # every data batch is still live, plus exactly one DV entry
    _, live, _ = SS._snapshot(root)
    assert [e for e in live if SS._is_dv(e)], "expected a live DV sidecar"
    sum_dec = F.sum(F.col("value").cast("decimal(28,4)")).cast("double")
    return (
        SS.read_table(spark, root)
        .groupBy(
            F.col("event_date").alias("metric_date"),
            F.col("event_type").alias("metric"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            sum_dec.alias("value_sum"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


def q_snapshot_zorder_partial(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL z-order maintenance (r13; r12 VERDICT #1): a table
    fully z-ordered on (user_id, value) absorbs a day of small appends,
    then ``compact(zorder_by=…, small_only_rows=…)`` z-keys ONLY those
    small batches on the recorded lattice and splits them at the
    existing z-batches' extents — the big z-batches stay untouched
    byte-for-byte (sources/snapstore.py compact, functions/layout.py
    zorder_key_with_domain), so nightly maintenance on the z-ordered
    production table costs O(day's ingest). The read is a narrow
    user_id range through the stats-pruned path; oracle: the same
    range straight off events."""
    from smartdatapipeline_spark.sources import snapstore as SS

    root = _tmp_store("zpartial2", sf_dir)
    if SS.find_commit_by_key(root, "zp-day2") is None:
        ev = (
            _events(spark, sf_dir)
            .filter(F.col("user_id").isNotNull())
            .withColumn("event_date", F.to_date("ts"))
        )
        # scale-invariant base/day split on event_id (a DATE split
        # breaks at the salted 10× sweep, whose replicas shift ts):
        # 90% base in 2 appends → full ZORDER; 10% "day" ingest in 3
        # small appends → the incremental pass
        base = ev.filter(F.col("event_id") % 10 != 0)
        for key, m in (("zp-b1", 0), ("zp-b2", 1)):
            SS.append(
                base.filter(F.col("event_id") % 2 == m),
                root, "event_date", idempotency_key=key,
            )
        SS.compact(
            spark, root, target_batches=6, zorder_by=("user_id", "value"),
            idempotency_key="zp-full",
        )
        day2 = ev.filter(F.col("event_id") % 10 == 0)
        for key, m in (("zp-day0", 0), ("zp-day1", 1), ("zp-day2", 2)):
            SS.append(day2.filter((F.col("event_id") / 10).cast("long") % 3 == m),
                      root, "event_date", idempotency_key=key)
        # threshold strictly between the day batches and the anchors,
        # derived from the manifest so it holds at every sf
        _, live0, _ = SS._snapshot(root)
        anchor_min = min(
            e["rows"] for e in live0 if (e["stats"] or {}).get("__zorder__")
        )
        day_max = max(
            e["rows"] for e in live0 if not (e["stats"] or {}).get("__zorder__")
        )
        assert day_max < anchor_min, (day_max, anchor_min)
        SS.compact(
            spark, root, zorder_by=("user_id", "value"),
            small_only_rows=anchor_min - 1,
            idempotency_key="zp-partial",
        )
    sum_dec = F.sum(F.col("value").cast("decimal(28,4)")).cast("double")
    return (
        SS.read_table(spark, root, column_range=("user_id", 10, 19))
        .groupBy(F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_rows"), sum_dec.alias("value_sum"))
    )


def q_snapshot_multicol_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTI-COLUMN partitioning (r13; r12 VERDICT #4): an events table
    partitioned on (event_date, event_type) — the canonical lakehouse
    layout — with composite tracked values in the manifest
    (sources/snapstore.py _part_name/encode_partition_value). One
    (day, type) CELL is deleted (a per-source correction), which
    rewrites only intersecting batches; the read prunes to January
    21-25 purchases at the MANIFEST level. Oracle: the same slice
    minus the deleted cell, straight off events."""
    from smartdatapipeline_spark.sources import snapstore as SS

    root = _tmp_store("multicol", sf_dir)
    if SS.find_commit_by_key(root, "mc-del") is None:
        ev = _events(spark, sf_dir).withColumn("event_date", F.to_date("ts"))
        for key, m in (("mc-b1", 0), ("mc-b2", 1)):
            SS.append(
                ev.filter(F.col("event_id") % 2 == m),
                root, ["event_date", "event_type"], idempotency_key=key,
            )
        SS.delete_partitions(
            spark, root, ["event_date", "event_type"],
            [("2024-01-22", "purchase")], idempotency_key="mc-del",
        )
    cells = [(f"2024-01-{d}", "purchase") for d in range(21, 26)]
    got = SS.read_table(spark, root, partition_values=cells)
    sum_dec = F.sum(F.col("value").cast("decimal(28,4)")).cast("double")
    return got.groupBy(
        F.col("event_date").alias("metric_date"),
    ).agg(F.count(F.lit(1)).alias("n_rows"), sum_dec.alias("value_sum"))


def q_snapshot_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RESTORE TO VERSION (r13 — Delta RESTORE, the operational partner
    of time travel): a bad whole-table overwrite (every value zeroed)
    is rolled back by ONE manifest-only commit re-instating the good
    snapshot's live set (sources/snapstore.py restore — no data copied,
    history preserved for audit, racing writers conflict). The read is
    the restored table; oracle: the original aggregate, as if the bad
    write never happened."""
    from smartdatapipeline_spark.sources import snapstore as SS

    root = _tmp_store("restsnap", sf_dir)
    if SS.find_commit_by_key(root, "rb-good") is None:
        ev = _events(spark, sf_dir).withColumn("event_date", F.to_date("ts"))
        SS.append(ev, root, "event_date", idempotency_key="rb-base")
        good_v = SS.table_version(root)
        SS.overwrite_table(
            ev.withColumn("value", F.lit(0.0)),
            root, "event_date", idempotency_key="rb-bad",
        )
        SS.restore(root, version=good_v, idempotency_key="rb-good")
    kinds = [h["kind"] for h in SS.history(root)]
    assert kinds[-1] == "restore", kinds
    sum_dec = F.sum(F.col("value").cast("decimal(28,4)")).cast("double")
    return (
        SS.read_table(spark, root)
        .groupBy(F.col("event_type").alias("metric"))
        .agg(F.count(F.lit(1)).alias("n_rows"), sum_dec.alias("value_sum"))
    )


def q_snapshot_is_null_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-count manifest stats (r13; r12 VERDICT #7): the anonymous-
    traffic audit — ``read_table(where_null="user_id")`` — skips every
    batch whose recorded null count for user_id is zero at the MANIFEST
    level (sources/snapstore.py _stats_nulls_possible) and filters the
    rest to IS NULL rows. Oracle: the same audit straight off events."""
    from smartdatapipeline_spark.sources import snapstore as SS

    root = _tmp_store("nullscan", sf_dir)
    if SS.find_commit_by_key(root, "ns-b2") is None:
        ev = _events(spark, sf_dir).withColumn("event_date", F.to_date("ts"))
        # anonymize every 7th event (deterministic), landing the
        # anonymous rows in their own batch: one fully-populated batch
        # (null count 0 — prunes away) + one batch carrying the NULLs
        SS.append(
            ev.filter(F.col("event_id") % 7 != 0),
            root, "event_date", idempotency_key="ns-b1",
            stats_cols=("user_id",),
        )
        SS.append(
            ev.filter(F.col("event_id") % 7 == 0).withColumn(
                "user_id", F.lit(None).cast("long")
            ),
            root, "event_date", idempotency_key="ns-b2",
            stats_cols=("user_id",),
        )
    sum_dec = F.sum(F.col("value").cast("decimal(28,4)")).cast("double")
    return (
        SS.read_table(spark, root, where_null="user_id")
        .groupBy(F.col("event_type").alias("metric"))
        .agg(F.count(F.lit(1)).alias("n_rows"), sum_dec.alias("value_sum"))
    )


def q_snapshot_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-side schema ENFORCEMENT + explicit additive EVOLUTION
    (r14; r13 VERDICT #1): the base corpus lands under the recorded
    (event_id, event_date, event_type, value) schema; a drifted
    producer adding a ``channel`` column is REJECTED
    (SchemaMismatchError) until it passes ``allow_new_columns=True``,
    which records the evolved schema in the commit
    (sources/snapstore.py _resolve_write_schema). The read is
    ``merge_schema=True`` over both vintages — pre-evolution rows carry
    NULL channel. Oracle: the same split straight off events (the
    event_id % 3 split is scale-invariant; channel derives from
    event_id parity). Reference analog: deliberate Alembic migrations
    over a fixed ORM schema (backend/migrations/versions/)."""
    from smartdatapipeline_spark.sources import snapstore as SS

    root = _tmp_store("schemaevo", sf_dir)
    if SS.find_commit_by_key(root, "se-b2") is None:
        ev = _events(spark, sf_dir).withColumn("event_date", F.to_date("ts"))
        base_cols = ["event_id", "event_date", "event_type", "value"]
        SS.append(
            ev.filter(F.col("event_id") % 3 != 0).select(*base_cols),
            root, "event_date", idempotency_key="se-b1",
        )
        wide = ev.filter(F.col("event_id") % 3 == 0).select(
            *base_cols,
            F.when(F.col("event_id") % 2 == 0, F.lit("web"))
            .otherwise(F.lit("app"))
            .alias("channel"),
        )
        # the gate is ON: the drifted producer fails loudly first
        try:
            SS.append(wide, root, "event_date", idempotency_key="se-rejected")
            raise AssertionError("unflagged schema drift must raise")
        except SS.SchemaMismatchError:
            pass
        SS.append(
            wide, root, "event_date",
            idempotency_key="se-b2", allow_new_columns=True,
        )
    assert SS.table_schema(root)[-1] == ["channel", "string"]
    sum_dec = F.sum(F.col("value").cast("decimal(28,4)")).cast("double")
    return (
        SS.read_table(spark, root, merge_schema=True)
        .groupBy(
            F.coalesce(F.col("channel"), F.lit("pre-evolution")).alias("channel"),
            F.col("event_type").alias("metric"),
        )
        .agg(F.count(F.lit(1)).alias("n_rows"), sum_dec.alias("value_sum"))
    )


def q_snapshot_multirange_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANDed multi-predicate stats pruning (r14; r13 VERDICT #4):
    events land as four batches with pairwise-disjoint (user_id, value)
    stat boxes (the shape a (user_id, value) z-order produces), and the
    read passes BOTH ranges — ``read_table(column_ranges=[(user_id,
    10, 40), (value, 5, 30)])`` — so manifest pruning intersects on
    both dimensions and lists ONE quadrant to Spark where either single
    predicate keeps two (sources/snapstore.py _snapshot_for_read).
    Oracle: the same conjunctive filter straight off events."""
    from smartdatapipeline_spark.sources import snapstore as SS

    root = _tmp_store("multirange", sf_dir)
    if SS.find_commit_by_key(root, "mr-b4") is None:
        ev = (
            _events(spark, sf_dir)
            .filter(F.col("user_id").isNotNull() & F.col("value").isNotNull())
            .withColumn("event_date", F.to_date("ts"))
        )
        u_split, v_split = F.col("user_id") < 75, F.col("value") < 50.0
        for key, cond in (
            ("mr-b1", u_split & v_split),
            ("mr-b2", u_split & ~v_split),
            ("mr-b3", ~u_split & v_split),
            ("mr-b4", ~u_split & ~v_split),
        ):
            SS.append(
                ev.filter(cond), root, "event_date",
                idempotency_key=key, stats_cols=("user_id", "value"),
            )
    # proof the AND prunes harder than either predicate alone: the
    # quadrant layout makes these survivor counts exact at every sf
    both = SS._snapshot_for_read(
        root, None, None, [("user_id", 10, 40), ("value", 5.0, 30.0)]
    )[1]
    only_u = SS._snapshot_for_read(root, None, None, [("user_id", 10, 40)])[1]
    assert len(both) < len(only_u), (len(both), len(only_u))
    sum_dec = F.sum(F.col("value").cast("decimal(28,4)")).cast("double")
    return (
        SS.read_table(
            spark, root,
            column_ranges=[("user_id", 10, 40), ("value", 5.0, 30.0)],
        )
        .groupBy(F.col("event_type").alias("metric"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            sum_dec.alias("value_sum"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


def q_snapshot_check_constraint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHECK constraints at the storage layer (r14 — Delta ``ALTER
    TABLE … ADD CONSTRAINT`` semantics): the table declares
    ``value >= 0 AND event_type IS NOT NULL``; a poisoned producer
    batch (values negated) is REJECTED whole before anything commits
    (sources/snapstore.py — the violation count rides the write's
    existing stats aggregate, zero extra jobs), clean batches land.
    Oracle: the clean slices' aggregate — the poisoned batch must be
    invisible. Reference analog: the ORM's column constraints +
    row-validation gate (backend/app/services/ingestion.py:138-168)."""
    from smartdatapipeline_spark.sources import snapstore as SS

    root = _tmp_store("constraint", sf_dir)
    if SS.find_commit_by_key(root, "cc-b2") is None:
        ev = _events(spark, sf_dir).withColumn("event_date", F.to_date("ts"))
        SS.append(
            ev.filter(F.col("event_id") % 2 == 0),
            root, "event_date", idempotency_key="cc-b1",
        )
        SS.add_check_constraint(
            spark, root, "value_nonneg",
            "value >= 0 AND event_type IS NOT NULL",
            idempotency_key="cc-ddl",
        )
        poisoned = ev.filter(F.col("event_id") % 2 == 1).withColumn(
            "value", -F.abs(F.col("value")) - F.lit(1.0)
        )
        try:
            SS.append(poisoned, root, "event_date", idempotency_key="cc-bad")
            raise AssertionError("violating batch must be rejected")
        except SS.ConstraintViolationError:
            pass
        SS.append(
            ev.filter(F.col("event_id") % 2 == 1),
            root, "event_date", idempotency_key="cc-b2",
        )
    assert SS.table_constraints(root), "constraint must be recorded"
    sum_dec = F.sum(F.col("value").cast("decimal(28,4)")).cast("double")
    return (
        SS.read_table(spark, root)
        .groupBy(F.col("event_type").alias("metric"))
        .agg(F.count(F.lit(1)).alias("n_rows"), sum_dec.alias("value_sum"))
    )


def q_snapshot_analyze_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE stats backfill (r14 — ``ANALYZE TABLE … COMPUTE
    STATISTICS FOR COLUMNS``): the table was ingested WITHOUT
    stats_cols (the pre-discipline legacy shape — no manifest pruning
    possible), then ``analyze_table`` backfills per-batch
    min/max/null-count stats in one metadata commit with zero data
    movement (sources/snapstore.py analyze_table; the commit is
    CDC-transparent like compact). The read proves retroactive
    pruning: the user-range scan lists fewer batches than live
    (asserted) and matches the oracle straight off events."""
    from smartdatapipeline_spark.sources import snapstore as SS

    root = _tmp_store("analyze", sf_dir)
    if SS.find_commit_by_key(root, "az-done") is None:
        ev = (
            _events(spark, sf_dir)
            .filter(F.col("user_id").isNotNull())
            .withColumn("event_date", F.to_date("ts"))
        )
        # legacy slices split by user range — NO stats recorded
        for key, cond in (
            ("az-b1", F.col("user_id") < 75),
            ("az-b2", F.col("user_id") >= 75),
        ):
            SS.append(ev.filter(cond), root, "event_date", idempotency_key=key)
        SS.analyze_table(spark, root, ("user_id",), idempotency_key="az-done")
    pruned = SS._snapshot_for_read(root, None, None, [("user_id", 10, 40)])[1]
    total = SS._snapshot_for_read(root, None, None, None)[1]
    assert len(pruned) < len(total), (len(pruned), len(total))
    sum_dec = F.sum(F.col("value").cast("decimal(28,4)")).cast("double")
    return (
        SS.read_table(spark, root, column_range=("user_id", 10, 40))
        .groupBy(F.col("event_type").alias("metric"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            sum_dec.alias("value_sum"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


def q_snapshot_optimize_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-scoped OPTIMIZE (r14 — Delta ``OPTIMIZE tbl WHERE
    partition = …``): a month of per-day micro-batches, then
    maintenance compacts ONLY the busiest day's partition
    (``compact(partition_values=[…])``) — the other days' batches stay
    untouched byte-for-byte (asserted via the manifest), the scoped
    rewrite is logically empty for CDC, and the read is the full-table
    aggregate, bit-equal to events. The surgical form of nightly
    maintenance: cost follows the day, not the table."""
    from smartdatapipeline_spark.sources import snapstore as SS

    root = _tmp_store("optwhere", sf_dir)
    if SS.find_commit_by_key(root, "ow-opt") is None:
        ev = _events(spark, sf_dir).withColumn("event_date", F.to_date("ts"))
        days = sorted(
            r[0] for r in ev.select("event_date").distinct().collect()
        )
        split = days[len(days) // 2]  # scale-invariant date split
        early, late = F.col("event_date") <= F.lit(split), F.col(
            "event_date"
        ) > F.lit(split)
        # two batches per half: the scoped compact merges the early
        # pair; the late pair must stay untouched byte-for-byte
        for key, cond in (
            ("ow-b0", early & (F.col("event_id") % 2 == 0)),
            ("ow-b1", early & (F.col("event_id") % 2 == 1)),
            ("ow-b2", late & (F.col("event_id") % 2 == 0)),
            ("ow-b3", late & (F.col("event_id") % 2 == 1)),
        ):
            SS.append(ev.filter(cond), root, "event_date", idempotency_key=key)
        scope = [str(d) for d in days if d <= split]
        untouched = {
            e["path"]
            for e in SS._snapshot(root)[1]
            if e.get("values") and not (set(e["values"]) & set(scope))
        }
        assert len(untouched) == 2, untouched
        SS.compact(
            spark, root, partition_values=scope, idempotency_key="ow-opt"
        )
        after = {e["path"] for e in SS._snapshot(root)[1]}
        assert untouched <= after, "unscoped batches must be untouched"
        # the two early batches became one
        assert len(after) == len(untouched) + 1, after
    sum_dec = F.sum(F.col("value").cast("decimal(28,4)")).cast("double")
    return (
        SS.read_table(spark, root)
        .groupBy(F.col("event_date").alias("metric_date"))
        .agg(F.count(F.lit(1)).alias("n_rows"), sum_dec.alias("value_sum"))
    )


def q_snapshot_as_of_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``AS OF <timestamp>`` time travel (r12; r11 VERDICT #5): the
    same two-version KPI table as ``snapshot_time_travel``, but the
    pre-correction state is addressed by WALL-CLOCK TIME — a timestamp
    between the two commits' recorded times resolves to v1
    (sources/snapstore.py resolve_as_of; commit times ride the log
    payloads, mtime fallback for older logs). Oracle: the UNcorrected
    aggregate — the form users actually reach for when reproducing
    'the table as of last night'."""
    from smartdatapipeline_spark.sources import snapstore as SS

    root = _ensure_snap_table(spark, sf_dir)
    h = SS.history(root)
    t1, t2 = h[0]["timestamp"], h[1]["timestamp"]
    return SS.read_table(spark, root, as_of=(t1 + t2) / 2 if t2 > t1 else t1)


def q_snapshot_changes_compacted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COMPACT-TRANSPARENT batch CDC (r12; r11 VERDICT #3): the change
    window (v1, v3] SPANS a full-table compaction, and the feed must
    (a) still report exactly the logical delta — the post-compact
    append's rows — and (b) read ZERO compact-rewrite files: the
    window is resolved per commit (snapstore.resolve_commit_changes),
    compact commits are skipped as logically empty, so the old
    O(table) exceptAll across both file sets never happens. Oracle:
    the appended days' aggregate tagged 'insert'."""
    from smartdatapipeline_spark.sources import snapstore as SS

    root = _tmp_store("cdcspan2", sf_dir)
    if SS.find_commit_by_key(root, "span-b2") is None:
        ev = _events(spark, sf_dir)
        sum_dec = F.sum(F.col("value").cast("decimal(28,4)")).cast("double")

        def kpis(df):
            return df.groupBy(
                F.to_date("ts").alias("metric_date"),
                F.col("event_type").alias("metric"),
            ).agg(sum_dec.alias("value_sum"), F.count(F.lit(1)).alias("value_count"))

        # TWO base appends so the compact genuinely lands (one live
        # batch <= target_batches=1 is a no-op — r12 ADVICE: the old
        # single-append setup validated nothing); the window below then
        # truly spans a compact commit
        SS.append(
            kpis(ev.filter(F.to_date("ts") <= "2024-01-10")),
            root, "metric_date", idempotency_key="span-b1a",
        )
        SS.append(
            kpis(
                ev.filter(
                    (F.to_date("ts") > "2024-01-10")
                    & (F.to_date("ts") <= "2024-01-20")
                )
            ),
            root, "metric_date", idempotency_key="span-b1b",
        )
        SS.compact(spark, root, idempotency_key="span-opt")
        SS.append(
            kpis(ev.filter(F.to_date("ts") > "2024-01-20")),
            root, "metric_date", idempotency_key="span-b2",
        )
    kinds = {h["kind"] for h in SS.history(root)}
    assert "compact" in kinds, f"cdcspan2 setup never compacted: {kinds}"
    # window (2, latest]: strictly AFTER the base appends, spanning the
    # compact (v3) and the post-compact append (v4); to_version computed
    # from the log, never assumed (r12 ADVICE)
    return SS.table_changes(spark, root, 2, SS.table_version(root))


def q_semantic_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space decontamination: every 37th vector plays the
    eval set; corpus vectors with cosine ≥ 0.25 to ANY eval vector
    (within sign-LSH buckets — eval side broadcast, corpus never
    shuffles) are flagged. The semantic complement of the 8-gram
    `decontaminate` — functions/similarity.py semantic_decontaminate."""
    emb = _emb(spark, sf_dir)
    ev = emb.filter(F.col("vec_id") % 37 == 0)
    # eval drawn FROM the corpus ⇒ same id namespace: self-exclusion on
    return SIM.semantic_decontaminate(
        emb, ev, threshold=0.25, nbits=8, exclude_same_id=True
    )


def q_hll_rollup_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical distinct users — per (event_type, day), per
    event_type, grand total — from ONE events scan: leaf HLL registers
    cascade to coarser grains by bucket-max reaggregation
    (functions/sketch.py hll_rollup; gid convention of kpi_rollup).
    The oracle sketches every grain directly — the hash match is the
    cascade-exactness identity at all three levels."""
    from smartdatapipeline_spark.functions import sketch as SK

    ev = (
        _events(spark, sf_dir)
        .filter(F.col("user_id").isNotNull())
        .withColumn("day", F.to_date("ts"))
    )
    return SK.hll_rollup(ev, "user_id", dims=["event_type", "day"])


def q_bloom_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable Bloom word table over the purchase audience's user ids
    (m=4096 bits as 60-bit words, k=4 salted-md5 hash rounds) — the
    persisted membership sketch that OR-merges daily→monthly without
    rescans (functions/sketch.py bloom_partial). Oracle rebuilds every
    word's bit_or bit-for-bit."""
    from smartdatapipeline_spark.functions import sketch as SK

    ev = _events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    return SK.bloom_partial(ev, "user_id", m_bits=4096, n_hashes=4)


def q_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probe EVERY distinct user against the purchase Bloom filter:
    might_contain = all 4 addressed bits set — no false negatives by
    construction, false positives at the designed rate; the word table
    broadcasts (≤ 69 rows), the probe side never shuffles for the
    join."""
    from smartdatapipeline_spark.functions import sketch as SK

    ev = _events(spark, sf_dir)
    bloom = SK.bloom_partial(
        ev.filter(F.col("event_type") == "purchase"),
        "user_id",
        m_bits=4096,
        n_hashes=4,
    )
    probes = ev.filter(F.col("user_id").isNotNull()).select("user_id").distinct()
    return SK.bloom_contains(bloom, probes, "user_id", m_bits=4096, n_hashes=4)


def q_char_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-distribution quality signals over documents: Simpson
    diversity 1 − Σ(cᵢ/n)² (the log-free entropy stand-in — two
    IEEE-exact float ops over exact integer character counts),
    top-char fraction, distinct chars. Empty/NULL docs are explicit
    zero rows with NULL fractions (round-8 ADVICE), not phantom
    one-char docs — functions/text.py char_diversity."""
    return TX.char_diversity(_docs(spark, sf_dir))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "kpi_daily": q_kpi_daily,
        "kpi_daily_window": q_kpi_daily_window,
        "metric_names": q_metric_names,
        "metrics_read_norm": q_metrics_read_norm,
        "metrics_export": q_metrics_export,
        "value_fallback": q_value_fallback,
        "windowed_counts": q_windowed_counts,
        "sessionization": q_sessionization,
        "ingest_stats": q_ingest_stats,
        "pricing_summary": q_pricing_summary,
        "revenue_by_nation": q_revenue_by_nation,
        "top_customers": q_top_customers,
        "json_payload_extract": q_json_payload_extract,
        "topk_days_per_metric": q_topk_days_per_metric,
        "kpi_rollup": q_kpi_rollup,
        "rolling_zscore_strict": q_rolling_zscore_strict,
        "rolling_zscore_api": q_rolling_zscore_api,
        "iforest_features": q_iforest_features,
        "anomaly_iforest": q_anomaly_iforest,
        "date_spine_fill": q_date_spine_fill,
        "forecast_naive": q_forecast_naive,
        "forecast_contract": q_forecast_contract,
        "strictly_future": q_strictly_future,
        "persistence_mape": q_persistence_mape,
        "backtest_folds": q_backtest_folds,
        "backtest_summary": q_backtest_summary,
        "reliability_folds": q_reliability_folds,
        "reliability_summary": q_reliability_summary,
        "multimodal_features": q_multimodal_features,
        "frame_sample": q_frame_sample,
        "cosine_topk": q_cosine_topk,
        "ann_bucketed_topk": q_ann_bucketed_topk,
        "ivf_topk": q_ivf_topk,
        "embedding_near_dup": q_embedding_near_dup,
        "dedup_exact": q_dedup_exact,
        "minhash_bands": q_minhash_bands,
        "minhash_pairs": q_minhash_pairs,
        "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
        "simhash": q_simhash,
        "simhash_pairs": q_simhash_pairs,
        "decontaminate": q_decontaminate,
        "pack_sequences": q_pack_sequences,
        "stratified_sample": q_stratified_sample,
        "value_histogram": q_value_histogram,
        "top_anomalies": q_top_anomalies,
        "crossmodal_consensus": q_crossmodal_consensus,
        "dup_clusters": q_dup_clusters,
        "dataset_split": q_dataset_split,
        "dsir_weights": q_dsir_weights,
        "dsir_resample": q_dsir_resample,
        "lexical_diversity": q_lexical_diversity,
        "ngram_novelty": q_ngram_novelty,
        "containment_pairs": q_containment_pairs,
        "chunk_tokens": q_chunk_tokens,
        "pii_scrub": q_pii_scrub,
        "repetition_features": q_repetition_features,
        "vocab_topk": q_vocab_topk,
        "text_token_stats": q_text_token_stats,
        "doc_fingerprint": q_doc_fingerprint,
        "text_quality": q_text_quality,
        "text_langid": q_text_langid,
        "corpus_curation": q_corpus_curation,
        "quality_percentiles": q_quality_percentiles,
        "asof_checkpoint": q_asof_checkpoint,
        "range_join_campaigns": q_range_join_campaigns,
        "kpi_monthly_cascade": q_kpi_monthly_cascade,
        "dist_moments": q_dist_moments,
        "order_priority_semi": q_order_priority_semi,
        "cust_order_dist": q_cust_order_dist,
        "promo_share": q_promo_share,
        "bm25_search": q_bm25_search,
        "metrics_pivot": q_metrics_pivot,
        "unpivot_roundtrip": q_unpivot_roundtrip,
        "small_qty_revenue": q_small_qty_revenue,
        "big_orders": q_big_orders,
        "value_deciles": q_value_deciles,
        "user_churn": q_user_churn,
        "disjunctive_revenue": q_disjunctive_revenue,
        "shipping_priority": q_shipping_priority,
        "top_supplier": q_top_supplier,
        "waiting_suppliers": q_waiting_suppliers,
        "idle_customers": q_idle_customers,
        "bination_volume": q_bination_volume,
        # round-2 additions — appended so the driver-visible registry
        # order of pre-existing queries stays stable across rounds
        "payload_roundtrip": q_payload_roundtrip,
        "forecast_drift": q_forecast_drift,
        "image_decode": q_image_decode,
        "png_pixel_decode": q_png_pixel_decode,
        "jpeg_pixel_decode": q_jpeg_pixel_decode,
        "audio_decode": q_audio_decode,
        "anomaly_iforest_numpy": q_anomaly_iforest_numpy,
        "market_share": q_market_share,
        "product_profit": q_product_profit,
        "returned_revenue": q_returned_revenue,
        "late_shipment_priority": q_late_shipment_priority,
        "supplier_part_variety": q_supplier_part_variety,
        "top_volume_suppliers": q_top_volume_suppliers,
        "clean_lines": q_clean_lines,
        "rare_tokens": q_rare_tokens,
        "mixture_weights": q_mixture_weights,
        "semantic_dedup": q_semantic_dedup,
        "duplicate_spans": q_duplicate_spans,
        "hybrid_retrieval": q_hybrid_retrieval,
        "bigram_lm": q_bigram_lm,
        "canonical_docs": q_canonical_docs,
        "length_coverage": q_length_coverage,
        "anomaly_mad": q_anomaly_mad,
        "forecast_snaive": q_forecast_snaive,
        "rolling_mad_zscore": q_rolling_mad_zscore,
        "trimmed_stats": q_trimmed_stats,
        "forecast_ewma": q_forecast_ewma,
        "cusum_changepoints": q_cusum_changepoints,
        "key_skew_report": q_key_skew_report,
        "source_quality_report": q_source_quality_report,
        # round-3 additions (appended at the tail — registry order of
        # pre-existing queries stays stable across rounds)
        "forecast_arima": q_forecast_arima,
        "anomaly_iforest_4d": q_anomaly_iforest_4d,
        "min_cost_supplier": q_min_cost_supplier,
        "important_stock": q_important_stock,
        "bigram_lm_score": q_bigram_lm_score,
        "funnel": q_funnel,
        "retention_cohorts": q_retention_cohorts,
        "discount_revenue": q_discount_revenue,
        "expectations": q_expectations,
        "scd2_dimension": q_scd2_dimension,
        "ivf_kmeans_topk": q_ivf_kmeans_topk,
        "minhash_lsh_mllib": q_minhash_lsh_mllib,
        "quality_classifier": q_quality_classifier,
        "pit_enrichment": q_pit_enrichment,
        "scrub_spans": q_scrub_spans,
        "distribution_drift": q_distribution_drift,
        "heavy_hitters": q_heavy_hitters,
        "zorder_curve": q_zorder_curve,
        "fuzzy_part_pairs": q_fuzzy_part_pairs,
        "cooccurrence": q_cooccurrence,
        "event_transitions": q_event_transitions,
        "snapshot_diff": q_snapshot_diff,
        "forecast_holt": q_forecast_holt,
        "weighted_sample": q_weighted_sample,
        "concurrency_profile": q_concurrency_profile,
        "exact_quantiles": q_exact_quantiles,
        "activity_streaks": q_activity_streaks,
        "conversion_lag": q_conversion_lag,
        "ols_trend": q_ols_trend,
        "seasonal_dow": q_seasonal_dow,
        "value_histogram": q_value_histogram,
        "graph_pagerank": q_graph_pagerank,
        "graph_pagerank_hub": q_graph_pagerank_hub,
        "bloom_semi_join": q_bloom_semi_join,
        "association_rules": q_association_rules,
        "event_debounce": q_event_debounce,
        "sliding_active_users": q_sliding_active_users,
        "winsorized_stats": q_winsorized_stats,
        "copurchase_jaccard": q_copurchase_jaccard,
        "running_balance": q_running_balance,
        "phrase_search": q_phrase_search,
        "kpi_rollup": q_kpi_rollup,
        "graph_bfs": q_graph_bfs,
        "table_profile": q_table_profile,
        "fk_orphans": q_fk_orphans,
        "event_paths": q_event_paths,
        "time_weighted_avg": q_time_weighted_avg,
        "cumulative_users": q_cumulative_users,
        "consistent_sample": q_consistent_sample,
        "grouped_quantiles": q_grouped_quantiles,
        "embedding_quantize": q_embedding_quantize,
        "wow_change": q_wow_change,
        "robust_outliers": q_robust_outliers,
        "ewma_daily": q_ewma_daily,
        "attribution_last_touch": q_attribution_last_touch,
        "rolling_corr": q_rolling_corr,
        "source_cap": q_source_cap,
        "cluster_split": q_cluster_split,
        "local_supplier_volume": q_local_supplier_volume,
        "bounce_rate": q_bounce_rate,
        "burn_rate": q_burn_rate,
        "cep_pattern": q_cep_pattern,
        "cohort_ltv": q_cohort_ltv,
        "setjoin_prefix": q_setjoin_prefix,
        "rfm_segments": q_rfm_segments,
        "rfm_segments_bounds": q_rfm_segments_bounds,
        "nation_share": q_nation_share,
        "weighted_median": q_weighted_median,
        "forward_fill": q_forward_fill,
        "topn_other": q_topn_other,
        "double_charge": q_double_charge,
        "acf_daily": q_acf_daily,
        "growth_accounting": q_growth_accounting,
        "max_drawdown": q_max_drawdown,
        "audience_overlap": q_audience_overlap,
        "daily_percentiles": q_daily_percentiles,
        "session_stats": q_session_stats,
        "seasonal_outliers": q_seasonal_outliers,
        "theilsen_trend": q_theilsen_trend,
        "attribution_linear": q_attribution_linear,
        "mix_shift": q_mix_shift,
        "benford_audit": q_benford_audit,
        "interval_overlap": q_interval_overlap,
        "rolling_median": q_rolling_median,
        "forecast_hw": q_forecast_hw,
        "graph_triangles": q_graph_triangles,
        "doc_keywords": q_doc_keywords,
        "sorted_neighborhood": q_sorted_neighborhood,
        "compaction_plan": q_compaction_plan,
        "late_arrival": q_late_arrival,
        "skyline_parts": q_skyline_parts,
        "revenue_cube": q_revenue_cube,
        "bpe_merges": q_bpe_merges,
        "bpe_merges_fast": q_bpe_merges_fast,
        "pq_topk": q_pq_topk,
        "partition_checksums": q_partition_checksums,
        "pseudonymize": q_pseudonymize,
        "salted_join": q_salted_join,
        "ann_truncation_recall": q_ann_truncation_recall,
        "k_anonymity": q_k_anonymity,
        # round-7 additions
        "mann_kendall": q_mann_kendall,
        "random_projection": q_random_projection,
        "pq_rerank_topk": q_pq_rerank_topk,
        "bpe_encode": q_bpe_encode,
        "interpolate_linear": q_interpolate_linear,
        "debounce_dedup": q_debounce_dedup,
        "fernet_roundtrip": q_fernet_roundtrip,
        "gif_pixel_decode": q_gif_pixel_decode,
        "wav_sample_decode": q_wav_sample_decode,
        # round-9 additions: the r8 sketch family, wired
        "hll_registers": q_hll_registers,
        "hll_merge_distinct": q_hll_merge_distinct,
        "hll_raw_by_type": q_hll_raw_by_type,
        "cms_grid": q_cms_grid,
        "cms_heavy_lookup": q_cms_heavy_lookup,
        "char_diversity": q_char_diversity,
        "kpi_monthly_distinct": q_kpi_monthly_distinct,
        "kmv_sketch": q_kmv_sketch,
        "kmv_distinct_by_type": q_kmv_distinct_by_type,
        "kmv_audience_overlap": q_kmv_audience_overlap,
        "bloom_words": q_bloom_words,
        "bloom_membership": q_bloom_membership,
        "hll_rollup_distinct": q_hll_rollup_distinct,
        "semantic_decontaminate": q_semantic_decontaminate,
        "dyadic_sketch": q_dyadic_sketch,
        "dyadic_grouped": q_dyadic_grouped,
        "distinct_from_store": q_distinct_from_store,
        "distinct_from_store_snapshot": q_distinct_from_store_snapshot,
        "kmv_overlap_store": q_kmv_overlap_store,
        "bloom_membership_store": q_bloom_membership_store,
        "dyadic_range_store": q_dyadic_range_store,
        "rolling_distinct_store": q_rolling_distinct_store,
        "kmv_new_audience_store": q_kmv_new_audience_store,
        "dyadic_series_store": q_dyadic_series_store,
        "snapshot_upsert_read": q_snapshot_upsert_read,
        "snapshot_merge_upsert": q_snapshot_merge_upsert,
        "snapshot_merge_update": q_snapshot_merge_update,
        "snapshot_delete_where": q_snapshot_delete_where,
        "snapshot_delete_dv": q_snapshot_delete_dv,
        "snapshot_zorder_partial": q_snapshot_zorder_partial,
        "snapshot_multicol_partition": q_snapshot_multicol_partition,
        "snapshot_restore": q_snapshot_restore,
        "snapshot_schema_evolution": q_snapshot_schema_evolution,
        "snapshot_multirange_read": q_snapshot_multirange_read,
        "snapshot_check_constraint": q_snapshot_check_constraint,
        "snapshot_analyze_prune": q_snapshot_analyze_prune,
        "snapshot_optimize_where": q_snapshot_optimize_where,
        "snapshot_is_null_scan": q_snapshot_is_null_scan,
        "snapshot_as_of_read": q_snapshot_as_of_read,
        "snapshot_changes_compacted": q_snapshot_changes_compacted,
        "snapshot_time_travel": q_snapshot_time_travel,
        "snapshot_pruned_read": q_snapshot_pruned_read,
        "snapshot_changes": q_snapshot_changes,
        "cdc_incremental_refresh": q_cdc_incremental_refresh,
        "hll_store_cdc_refresh": q_hll_store_cdc_refresh,
        "snapshot_stream_net": q_snapshot_stream_net,
        "snapshot_zorder_read": q_snapshot_zorder_read,
    }


def oracle_sql() -> dict[str, str]:
    o = _oracle_sql_base()
    # canonical_docs composes two proven oracles: cluster labels
    # (dup_clusters, recursive CTE) × per-doc quality (text_quality) →
    # quality-argmax per cluster with doc-id tiebreak
    # source_quality_report composes decontaminate × text_quality ×
    # documents.source; mean quality folds in doc_id order both engines
    o["source_quality_report"] = f"""
        WITH cont AS (SELECT doc_id, contaminated FROM ({o["decontaminate"]}) c),
        q AS (SELECT doc_id, quality FROM ({o["text_quality"]}) t),
        j AS (SELECT d.source, d.doc_id, cont.contaminated, q.quality
              FROM documents d
              JOIN cont USING (doc_id) JOIN q USING (doc_id))
        SELECT source,
               COUNT(*) AS n_docs,
               CAST(SUM(CASE WHEN contaminated THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_contaminated,
               list_reduce(list_prepend(0.0, list(quality ORDER BY doc_id)),
                           (a, x) -> a + x) / CAST(COUNT(*) AS DOUBLE)
                   AS mean_quality
        FROM j GROUP BY source ORDER BY source
    """
    o["canonical_docs"] = f"""
        WITH clusters AS (SELECT * FROM ({o["dup_clusters"]}) c),
        q AS (SELECT doc_id, quality FROM ({o["text_quality"]}) t),
        j AS (SELECT clusters.cluster, clusters.doc_id, q.quality
              FROM clusters JOIN q USING (doc_id)),
        r AS (SELECT *,
                     ROW_NUMBER() OVER (PARTITION BY cluster
                         ORDER BY quality DESC, doc_id ASC) AS rn,
                     COUNT(*) OVER (PARTITION BY cluster) AS n_docs_in_cluster
              FROM j)
        SELECT cluster, doc_id AS canonical_doc, n_docs_in_cluster,
               quality AS canonical_quality
        FROM r WHERE rn = 1
    """
    # forecast_arima — the exact arima_css_fn program in SQL: CSS over the
    # (φ,θ) = (k/20, k/20) lattice via list_reduce (struct fields ordered
    # sse→eps→w because DuckDB evaluates them sequentially against the
    # updated accumulator), then the ψ-weight forecast recursion as a
    # recursive CTE. Same IEEE op sequence as the numpy fit ⇒ bit-exact.
    o["forecast_arima"] = _GOLD_CTE.replace("WITH", "WITH RECURSIVE", 1) + """
        , per AS (
            SELECT metric, MAX(metric_date) AS last_date,
                   arg_max(value, metric_date) AS last_val,
                   COUNT(*) AS n,
                   CAST(SUM(CAST(value AS DECIMAL(38,4))) AS DOUBLE) AS s
            FROM gold GROUP BY metric),
        c AS (
            SELECT metric, list(CAST(value AS DOUBLE) ORDER BY metric_date) AS vals,
                   CAST(COUNT(*) AS INTEGER) AS n,
                   arg_max(CAST(value AS DOUBLE), metric_date) AS last_val,
                   MAX(metric_date) AS last_date
            FROM gold GROUP BY metric
            HAVING COUNT(*) >= 14
               AND CAST(SUM(CAST(value AS DECIMAL(38,4))) AS DOUBLE) <> 0.0),
        wd AS (
            SELECT *, list_transform(range(2, n + 1), i -> vals[i] - vals[i-1]) AS warr,
                   n - 1 AS m
            FROM c),
        css AS (
            SELECT metric, m, last_val, last_date, warr[m] AS w_last,
                   CAST(p.k AS DOUBLE) / 20.0 AS phi,
                   CAST(q.k AS DOUBLE) / 20.0 AS theta,
                   p.k AS kphi, q.k AS ktheta,
                   list_reduce(
                     list_transform(warr, x -> {'sse': CAST(0.0 AS DOUBLE), 'eps': x, 'w': x}),
                     (a, x) -> {'sse': a.sse
                                  + ((x.w - (CAST(p.k AS DOUBLE) / 20.0) * a.w)
                                      - (CAST(q.k AS DOUBLE) / 20.0) * a.eps)
                                  * ((x.w - (CAST(p.k AS DOUBLE) / 20.0) * a.w)
                                      - (CAST(q.k AS DOUBLE) / 20.0) * a.eps),
                                'eps': (x.w - (CAST(p.k AS DOUBLE) / 20.0) * a.w)
                                      - (CAST(q.k AS DOUBLE) / 20.0) * a.eps,
                                'w': x.w}) AS st
            FROM wd CROSS JOIN generate_series(-19, 19) p(k)
                    CROSS JOIN generate_series(-19, 19) q(k)),
        best AS (
            SELECT metric, last_val, last_date, w_last, phi, theta,
                   st.eps AS eps_m, st.sse / CAST(m - 1 AS DOUBLE) AS sigma2
            FROM css
            QUALIFY ROW_NUMBER() OVER (PARTITION BY metric
                                       ORDER BY st.sse, kphi, ktheta) = 1),
        fc AS (
            SELECT metric, 1 AS h,
                   phi * w_last + theta * eps_m AS what,
                   phi * w_last + theta * eps_m AS cum,
                   CAST(1.0 AS DOUBLE) AS psi, CAST(1.0 AS DOUBLE) AS powp,
                   CAST(1.0 AS DOUBLE) AS vs,
                   phi, theta, sigma2, last_val, last_date
            FROM best
            UNION ALL
            SELECT metric, h + 1, phi * what, cum + phi * what,
                   psi + (phi + theta) * powp, phi * powp,
                   vs + (psi + (phi + theta) * powp) * (psi + (phi + theta) * powp),
                   phi, theta, sigma2, last_val, last_date
            FROM fc WHERE h < 7)
        SELECT metric,
               last_date + CAST(h AS INTEGER) AS target_date,
               last_val + cum AS yhat,
               (last_val + cum) - 1.96 * sqrt(sigma2 * vs) AS yhat_lower,
               (last_val + cum) + 1.96 * sqrt(sigma2 * vs) AS yhat_upper,
               'arima-css-0.1' AS model_version
        FROM fc
        UNION ALL
        SELECT metric,
               last_date + CAST(t.k AS INTEGER) AS target_date,
               CASE WHEN s = 0.0 THEN 0.0 ELSE last_val END AS yhat,
               CASE WHEN s = 0.0 THEN 0.0 ELSE last_val END AS yhat_lower,
               CASE WHEN s = 0.0 THEN 0.0 ELSE last_val END AS yhat_upper,
               'naive-0.1' AS model_version
        FROM per CROSS JOIN generate_series(1, 7) t(k)
        WHERE s = 0.0 OR n < 14
    """
    o["min_cost_supplier"] = """
        WITH es AS (
            SELECT s_suppkey, s_name, s_acctbal, n_name
            FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'EUROPE'),
        sized AS (SELECT p_partkey, p_name FROM part WHERE p_size = 15),
        cost AS (
            SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE)
                   / CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE)
                       AS unit_cost
            FROM lineitem
            JOIN sized ON l_partkey = p_partkey
            JOIN es ON l_suppkey = s_suppkey
            GROUP BY 1, 2, 3, 4, 5, 6),
        mc AS (SELECT p_partkey, MIN(unit_cost) AS _mc FROM cost GROUP BY 1)
        SELECT s_acctbal, s_name, n_name, p_partkey, p_name, unit_cost
        FROM cost JOIN mc USING (p_partkey)
        WHERE unit_cost = _mc
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        LIMIT 100
    """
    o["important_stock"] = """
        WITH ns AS (
            SELECT s_suppkey FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            WHERE n_name = 'NATION_7'),
        v AS (
            SELECT l_partkey,
                   CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                                 AS DECIMAL(28,4))) AS DOUBLE) AS value
            FROM lineitem JOIN ns ON l_suppkey = s_suppkey
            GROUP BY 1),
        t AS (SELECT CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS _total FROM v)
        SELECT l_partkey, value
        FROM v CROSS JOIN t
        WHERE value > _total * 0.0001
        ORDER BY value DESC, l_partkey
    """
    # bigram_lm_score — exact-integer-ratio LM scoring, position-ordered
    # fold for the mean (no log(): ln is not correctly-rounded-portable)
    o["bigram_lm_score"] = _TEXT_CTE + """
        , w AS (SELECT doc_id, toks FROM t WHERE len(toks) >= 2),
        corpus_bg AS (
            SELECT toks[i] AS w1, toks[i+1] AS w2
            FROM w, LATERAL unnest(range(1, len(toks))) AS u(i)
            WHERE toks[i] != '' AND toks[i+1] != ''),
        counts AS (SELECT w1, w2, COUNT(*) AS n FROM corpus_bg GROUP BY 1, 2),
        tots AS (SELECT w1, CAST(SUM(n) AS BIGINT) AS n_w1 FROM counts GROUP BY 1),
        vocab AS (SELECT COUNT(DISTINCT w2) AS v FROM counts),
        doc_bg AS (
            SELECT doc_id, i AS pos, toks[i] AS w1, toks[i+1] AS w2
            FROM w, LATERAL unnest(range(1, len(toks))) AS u(i)
            WHERE toks[i] != '' AND toks[i+1] != ''),
        scored AS (
            SELECT d.doc_id, d.pos,
                   CAST(COALESCE(c.n, 0) + 1 AS DOUBLE)
                   / CAST(COALESCE(tots.n_w1, 0) + vocab.v AS DOUBLE) AS p,
                   CASE WHEN c.n IS NULL THEN 1 ELSE 0 END AS oov
            FROM doc_bg d
            LEFT JOIN counts c ON d.w1 = c.w1 AND d.w2 = c.w2
            LEFT JOIN tots ON d.w1 = tots.w1
            CROSS JOIN vocab)
        SELECT doc_id,
               COUNT(*) AS n_bigrams,
               CAST(SUM(oov) AS BIGINT) AS n_oov,
               CAST(SUM(oov) AS DOUBLE) / COUNT(*) AS oov_frac,
               list_reduce(list_prepend(0.0, list(p ORDER BY pos)),
                           (a, x) -> a + x) / COUNT(*) AS mean_p
        FROM scored GROUP BY doc_id
    """
    o["funnel"] = """
        WITH t1 AS (
            SELECT user_id, MIN(ts) AS t1 FROM events
            WHERE event_type = 'view' GROUP BY 1),
        t2 AS (
            SELECT e.user_id, t1.t1, MIN(e.ts) AS tprev
            FROM events e JOIN t1 ON e.user_id = t1.user_id
            WHERE e.event_type = 'click' AND e.ts > t1.t1
              AND e.ts <= t1.t1 + INTERVAL 7 DAY
            GROUP BY 1, 2),
        t3 AS (
            SELECT e.user_id, t2.t1, MIN(e.ts) AS tprev
            FROM events e JOIN t2 ON e.user_id = t2.user_id
            WHERE e.event_type = 'purchase' AND e.ts > t2.tprev
              AND e.ts <= t2.t1 + INTERVAL 7 DAY
            GROUP BY 1, 2),
        per AS (
            SELECT 1 AS step_index, 'view' AS step, COUNT(*) AS n_users FROM t1
            UNION ALL
            SELECT 2, 'click', COUNT(*) FROM t2
            UNION ALL
            SELECT 3, 'purchase', COUNT(*) FROM t3)
        SELECT step_index, step, n_users,
               CAST(n_users AS DOUBLE)
               / (SELECT CAST(n_users AS DOUBLE) FROM per WHERE step_index = 1)
                   AS share
        FROM per
    """
    o["retention_cohorts"] = """
        WITH fs AS (
            SELECT user_id,
                   CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
            FROM events GROUP BY 1),
        sizes AS (SELECT cohort_week, COUNT(*) AS cohort_size FROM fs GROUP BY 1),
        act AS (
            SELECT DISTINCT user_id,
                   CAST(date_trunc('week', ts) AS DATE) AS aw
            FROM events),
        j AS (
            SELECT fs.cohort_week,
                   CAST((act.aw - fs.cohort_week) // 7 AS INT) AS week_offset
            FROM act JOIN fs USING (user_id)
            WHERE act.aw >= fs.cohort_week
              AND (act.aw - fs.cohort_week) // 7 <= 8),
        a AS (SELECT cohort_week, week_offset, COUNT(*) AS n_active
              FROM j GROUP BY 1, 2)
        SELECT a.cohort_week, a.week_offset, a.n_active, s.cohort_size,
               CAST(a.n_active AS DOUBLE) / CAST(s.cohort_size AS DOUBLE)
                   AS retention
        FROM a JOIN sizes s USING (cohort_week)
    """
    o["discount_revenue"] = """
        SELECT CAST(SUM(CAST(l_extendedprice * l_discount
                             AS DECIMAL(28,4))) AS DOUBLE) AS revenue,
               COUNT(*) AS n_rows
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24
    """
    o["expectations"] = """
        WITH base AS (
            SELECT COUNT(*) AS n,
                   CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS v0,
                   CAST(SUM(CASE WHEN value BETWEEN 0.0 AND 10000.0
                                 THEN 0 ELSE 1 END) AS BIGINT) AS v1,
                   CAST(SUM(CASE WHEN regexp_matches(event_type, '^[a-z]+$')
                                 THEN 0 ELSE 1 END) AS BIGINT) AS v2
            FROM events),
        per AS (
            SELECT 'not_null(user_id)' AS "check", n AS n_rows,
                   v0 AS n_violations FROM base
            UNION ALL
            SELECT 'in_range(value,0.0,10000.0)', n, v1 FROM base
            UNION ALL
            SELECT 'matches(event_type)', n, v2 FROM base),
        uniq AS (
            SELECT 'unique(user_id,ts,event_type)' AS "check",
                   CAST(SUM(c) AS BIGINT) AS n_rows,
                   CAST(SUM(c - 1) AS BIGINT) AS n_violations
            FROM (SELECT COUNT(*) AS c FROM events
                  GROUP BY user_id, ts, event_type) g),
        u AS (SELECT * FROM per UNION ALL SELECT * FROM uniq)
        SELECT "check", n_rows, n_violations,
               CAST(n_violations AS DOUBLE) / CAST(n_rows AS DOUBLE)
                   AS violation_frac,
               n_violations <= n_rows * 0.0 AS passed
        FROM u
    """
    # scrub_spans — the span-mask algebra in DuckDB list ops: positional
    # shingle hits → contaminated starts (all span_len shingles hit) →
    # covered-token mask → kept tokens rejoined. window=13, k=3 ⇒
    # span_len=11.
    o["scrub_spans"] = _TEXT_CTE + """
        , split AS (
            SELECT doc_id,
                   ('0x' || substr(md5('split-v1:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100
                       AS bucket
            FROM documents),
        ev_pos AS (
            SELECT array_to_string(list_slice(toks, i + 1, i + 3), ' ') AS s
            FROM t JOIN split USING (doc_id),
                 LATERAL unnest(generate_series(0, len(toks) - 3)) AS u(i)
            WHERE bucket >= 95 AND len(toks) >= 3),
        eval_sh AS (SELECT DISTINCT s FROM ev_pos WHERE s <> ''),
        pos_sh AS (
            SELECT doc_id, i AS pos,
                   array_to_string(list_slice(toks, i + 1, i + 3), ' ') AS s
            FROM t JOIN split USING (doc_id),
                 LATERAL unnest(generate_series(0, len(toks) - 3)) AS u(i)
            WHERE bucket < 95 AND len(toks) >= 3),
        hp AS (
            SELECT doc_id, list_sort(list(pos)) AS hitpos
            FROM pos_sh JOIN eval_sh USING (s)
            GROUP BY doc_id),
        base AS (
            SELECT t.doc_id, t.toks, COALESCE(hp.hitpos, []) AS hitpos
            FROM t JOIN split USING (doc_id)
            LEFT JOIN hp ON t.doc_id = hp.doc_id
            WHERE bucket < 95),
        m AS (
            SELECT doc_id, toks,
                   list_filter(generate_series(0, len(toks) - 13),
                       s -> len(list_filter(hitpos,
                                p -> p >= s AND p < s + 11)) = 11) AS starts
            FROM base),
        k AS (
            SELECT doc_id, toks, starts,
                   list_filter(generate_series(1, len(toks)),
                       idx -> len(list_filter(starts,
                                s -> idx - 1 >= s AND idx - 1 < s + 13)) = 0)
                       AS keep_idx
            FROM m)
        SELECT doc_id,
               -- array_to_string([]) is NULL in DuckDB; Spark's
               -- array_join([]) is '' — coalesce to match
               COALESCE(array_to_string(
                   list_transform(keep_idx, idx -> toks[idx]), ' '), '')
                   AS clean_text,
               len(toks) AS n_tokens,
               len(toks) - len(keep_idx) AS n_masked,
               CASE WHEN len(toks) > 0
                    THEN CAST(len(toks) - len(keep_idx) AS DOUBLE) / len(toks)
                    ELSE 0.0 END AS masked_frac
        FROM k
    """
    o["distribution_drift"] = """
        WITH b AS (
            SELECT event_type AS category, COUNT(*) AS n_baseline
            FROM events WHERE ts < TIMESTAMP '2024-01-16' GROUP BY 1),
        c AS (
            SELECT event_type AS category, COUNT(*) AS n_current
            FROM events WHERE ts >= TIMESTAMP '2024-01-16' GROUP BY 1),
        j AS (
            SELECT COALESCE(b.category, c.category) AS category,
                   COALESCE(n_baseline, 0) AS n_baseline,
                   COALESCE(n_current, 0) AS n_current
            FROM b FULL OUTER JOIN c USING (category)),
        tot AS (SELECT CAST(SUM(n_baseline) AS BIGINT) AS tb,
                       CAST(SUM(n_current) AS BIGINT) AS tc FROM j),
        terms AS (
            SELECT category, n_baseline, n_current,
                   n_baseline / CAST(tb AS DOUBLE) AS p_baseline,
                   n_current / CAST(tc AS DOUBLE) AS p_current,
                   ABS(n_baseline / CAST(tb AS DOUBLE)
                       - n_current / CAST(tc AS DOUBLE)) AS abs_diff,
                   CASE WHEN (n_baseline / CAST(tb AS DOUBLE)) * CAST(tc AS DOUBLE) > 0
                        THEN (n_current - (n_baseline / CAST(tb AS DOUBLE)) * CAST(tc AS DOUBLE))
                             * (n_current - (n_baseline / CAST(tb AS DOUBLE)) * CAST(tc AS DOUBLE))
                             / ((n_baseline / CAST(tb AS DOUBLE)) * CAST(tc AS DOUBLE))
                        ELSE 0.0 END AS chi_t
            FROM j CROSS JOIN tot),
        summ AS (
            SELECT list_reduce(list_prepend(0.0, list(abs_diff ORDER BY category)),
                               (a, x) -> a + x) / 2.0 AS tv_distance,
                   list_reduce(list_prepend(0.0, list(chi_t ORDER BY category)),
                               (a, x) -> a + x) AS chi2
            FROM terms)
        SELECT category, n_baseline, n_current, p_baseline, p_current,
               abs_diff, tv_distance, chi2
        FROM terms CROSS JOIN summ
    """
    o["pit_enrichment"] = """
        WITH dim AS (
            SELECT user_id, ts AS uts, MAX(value) AS signup_value
            FROM events WHERE event_type = 'signup'
            GROUP BY user_id, ts),
        p AS (
            SELECT user_id, event_id, ts, value
            FROM events WHERE event_type = 'purchase')
        SELECT p.user_id, p.event_id, p.ts, p.value, d.uts, d.signup_value
        FROM p ASOF JOIN dim d
          ON p.user_id = d.user_id AND p.ts >= d.uts
    """
    o["scd2_dimension"] = """
        WITH upd AS (
            SELECT user_id, ts, MAX(value) AS value
            FROM events WHERE event_type = 'signup'
            GROUP BY user_id, ts)
        SELECT user_id, ts, value,
               ts AS effective_from,
               LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   AS effective_to,
               LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                   AS is_current
        FROM upd
    """
    o["heavy_hitters"] = _TEXT_CTE + """
        , ex AS (SELECT unnest(toks) AS token FROM t),
        ex2 AS (SELECT token FROM ex WHERE token != ''),
        tot AS (SELECT COUNT(*) AS n_tot FROM ex2)
        SELECT token, COUNT(*) AS n
        FROM ex2, tot
        GROUP BY token, n_tot
        HAVING COUNT(*) * 101 > n_tot
    """
    o["zorder_curve"] = """
        WITH s AS (
            SELECT CAST(MIN(user_id) AS DOUBLE) AS amin,
                   CAST(MAX(user_id) AS DOUBLE) AS amax,
                   CAST(MIN(value) AS DOUBLE) AS bmin,
                   CAST(MAX(value) AS DOUBLE) AS bmax
            FROM events),
        sc AS (
            SELECT event_id,
                   CASE WHEN (amax - amin) <= 0 THEN 0
                        ELSE LEAST(CAST(FLOOR((CAST(user_id AS DOUBLE) - amin)
                                 * 256.0 / (amax - amin)) AS BIGINT), 255)
                   END AS sa,
                   CASE WHEN (bmax - bmin) <= 0 THEN 0
                        ELSE LEAST(CAST(FLOOR((CAST(value AS DOUBLE) - bmin)
                                 * 256.0 / (bmax - bmin)) AS BIGINT), 255)
                   END AS sb
            FROM events, s)
        SELECT event_id, ZTERMS AS zval FROM sc
    """.replace("ZTERMS", "(((sa >> 0) & 1) << 0) + (((sb >> 0) & 1) << 1) + (((sa >> 1) & 1) << 2) + (((sb >> 1) & 1) << 3) + (((sa >> 2) & 1) << 4) + (((sb >> 2) & 1) << 5) + (((sa >> 3) & 1) << 6) + (((sb >> 3) & 1) << 7) + (((sa >> 4) & 1) << 8) + (((sb >> 4) & 1) << 9) + (((sa >> 5) & 1) << 10) + (((sb >> 5) & 1) << 11) + (((sa >> 6) & 1) << 12) + (((sb >> 6) & 1) << 13) + (((sa >> 7) & 1) << 14) + (((sb >> 7) & 1) << 15)")
    o["fuzzy_part_pairs"] = """
        WITH k AS (
            SELECT p_partkey AS id, p_name AS name,
                   string_split(lower(trim(p_name)), ' ')[1] AS blk
            FROM part)
        SELECT a.id AS id_a, b.id AS id_b,
               levenshtein(a.name, b.name) AS distance
        FROM k a JOIN k b ON a.blk = b.blk AND a.id < b.id
        WHERE levenshtein(a.name, b.name) <= 3
    """
    o["cooccurrence"] = """
        WITH it AS (
            SELECT user_id AS u,
                   TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS item,
                   MIN(ts) AS first_ts
            FROM events
            GROUP BY u, item),
        capped AS (
            SELECT u, item FROM (
                SELECT u, item,
                       ROW_NUMBER() OVER (PARTITION BY u
                           ORDER BY first_ts ASC, item ASC) AS rk
                FROM it WHERE item IS NOT NULL)
            WHERE rk <= 20),
        pairs AS (
            SELECT a.item AS i, b.item AS j, COUNT(*) AS n_users
            FROM capped a JOIN capped b ON a.u = b.u AND a.item < b.item
            GROUP BY i, j),
        sym AS (
            SELECT i, j, n_users FROM pairs
            UNION ALL
            SELECT j AS i, i AS j, n_users FROM pairs)
        SELECT i AS item, j AS co_item, n_users, rank FROM (
            SELECT i, j, n_users,
                   ROW_NUMBER() OVER (PARTITION BY i
                       ORDER BY n_users DESC, j ASC) AS rank
            FROM sym)
        WHERE rank <= 5
    """

    o["event_transitions"] = """
        WITH chain AS (
            SELECT event_type AS cur,
                   LEAD(event_type) OVER (PARTITION BY user_id
                       ORDER BY ts ASC, event_type ASC) AS nxt
            FROM events),
        counts AS (
            SELECT cur, nxt, COUNT(*) AS n FROM chain
            WHERE nxt IS NOT NULL GROUP BY cur, nxt),
        tot AS (SELECT cur, SUM(n) AS t FROM counts GROUP BY cur)
        SELECT c.cur, c.nxt, c.n, c.n / CAST(t.t AS DOUBLE) AS p
        FROM counts c JOIN tot t ON c.cur = t.cur
    """
    o["snapshot_diff"] = """
        WITH o AS (
            SELECT user_id, md5(CAST(COUNT(*) AS VARCHAR)) AS old_fp
            FROM events WHERE ts < TIMESTAMP '2024-01-16'
            GROUP BY user_id),
        n AS (
            SELECT user_id, md5(CAST(COUNT(*) AS VARCHAR)) AS new_fp
            FROM events WHERE ts >= TIMESTAMP '2024-01-16'
            GROUP BY user_id)
        SELECT COALESCE(o.user_id, n.user_id) AS user_id, old_fp, new_fp,
               CASE WHEN old_fp IS NULL THEN 'inserted'
                    WHEN new_fp IS NULL THEN 'deleted'
                    WHEN old_fp != new_fp THEN 'updated'
                    ELSE 'unchanged' END AS change_type
        FROM o FULL OUTER JOIN n ON o.user_id = n.user_id
    """

    o["forecast_holt"] = _GOLD_CTE + """
        , per AS (
            SELECT metric, MAX(metric_date) AS last_date,
                   list(CAST(value AS DOUBLE) ORDER BY metric_date) AS v
            FROM gold GROUP BY metric),
        st AS (
            -- (level, trend) pair as a 2-element list: DuckDB 1.0's
            -- list_reduce miscompiles multi-field struct_pack lambdas
            -- (fields contaminate each other), list accumulators fold
            -- correctly
            SELECT metric, last_date,
                   list_reduce(
                       [[v[1], CASE WHEN len(v) >= 2
                               THEN v[2] - v[1] ELSE 0.0 END]]
                       || list_transform(v[2:], x -> [x, 0.0]),
                       (a, x) -> [0.5 * x[1] + 0.5 * (a[1] + a[2]),
                                  0.5 * ((0.5 * x[1] + 0.5 * (a[1] + a[2]))
                                         - a[1]) + 0.5 * a[2]]
                   ) AS s
            FROM per)
        SELECT metric,
               last_date + CAST(t.k AS INTEGER) AS target_date,
               s[1] + CAST(t.k AS DOUBLE) * s[2] AS yhat,
               s[1] + CAST(t.k AS DOUBLE) * s[2] AS yhat_lower,
               s[1] + CAST(t.k AS DOUBLE) * s[2] AS yhat_upper,
               'holt-0.1' AS model_version
        FROM st CROSS JOIN generate_series(1, 7) t(k)
    """
    o["weighted_sample"] = """
        WITH w AS (
            SELECT doc_id, 1 + doc_id % 5 AS wt FROM documents),
        d AS (
            SELECT doc_id,
                   ('0x' || substr(md5('wsample-v1:' || CAST(doc_id AS VARCHAR)
                        || ':' || CAST(j AS VARCHAR)), 1, 15))::BIGINT AS draw
            FROM (SELECT doc_id, unnest(range(1, wt + 1)) AS j FROM w)),
        keyed AS (
            SELECT doc_id, MAX(draw) AS sample_key FROM d GROUP BY doc_id)
        SELECT doc_id, sample_key FROM keyed
        ORDER BY sample_key DESC, doc_id ASC LIMIT 50
    """
    o["concurrency_profile"] = """
        WITH deltas AS (
            SELECT event_type, ts AS t, 1 AS d, CAST(ts AS DATE) AS day
            FROM events
            UNION ALL
            SELECT event_type, ts + INTERVAL 15 MINUTE, -1, CAST(ts AS DATE)
            FROM events),
        run AS (
            SELECT event_type, day,
                   SUM(d) OVER (PARTITION BY event_type, day
                       ORDER BY t ASC, d ASC
                       ROWS UNBOUNDED PRECEDING) AS open_n
            FROM deltas)
        SELECT event_type, day,
               CAST(MAX(open_n) AS BIGINT) AS peak_concurrency
        FROM run GROUP BY event_type, day
    """

    o["exact_quantiles"] = """
        SELECT CAST(0.5 AS DOUBLE) AS q,
               CAST(quantile_disc(value, 0.5) AS DOUBLE) AS value FROM events
        UNION ALL
        SELECT CAST(0.9 AS DOUBLE),
               CAST(quantile_disc(value, 0.9) AS DOUBLE) FROM events
        UNION ALL
        SELECT CAST(0.99 AS DOUBLE),
               CAST(quantile_disc(value, 0.99) AS DOUBLE) FROM events
    """

    o["activity_streaks"] = """
        WITH days AS (
            SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        anch AS (
            SELECT user_id, d,
                   d - CAST(ROW_NUMBER() OVER (
                       PARTITION BY user_id ORDER BY d) AS INTEGER) AS a
            FROM days),
        isl AS (
            SELECT user_id, a, COUNT(*) AS len FROM anch GROUP BY user_id, a)
        SELECT user_id,
               CAST(SUM(len) AS BIGINT) AS active_days,
               COUNT(*) AS n_streaks,
               CAST(MAX(len) AS BIGINT) AS longest_streak
        FROM isl GROUP BY user_id
    """

    o["conversion_lag"] = """
        WITH ff AS (
            SELECT user_id, MIN(ts) AS t0 FROM events
            WHERE event_type = 'view' GROUP BY user_id),
        conv AS (
            SELECT f.user_id, MIN(f.t0) AS t0, MIN(p.ts) AS t1
            FROM ff f JOIN events p
              ON p.user_id = f.user_id AND p.event_type = 'purchase'
                 AND p.ts > f.t0
            GROUP BY f.user_id),
        lagd AS (
            SELECT datediff('second', t0, t1) AS lag FROM conv),
        s AS (
            SELECT COUNT(*) AS n_converted,
                   CAST(MIN(lag) AS BIGINT) AS min_lag_s,
                   quantile_cont(lag, 0.5) AS median_lag_s,
                   CAST(SUM(lag) AS DOUBLE) / COUNT(*) AS avg_lag_s,
                   CAST(MAX(lag) AS BIGINT) AS max_lag_s
            FROM lagd)
        SELECT (SELECT COUNT(*) FROM ff) AS n_from,
               n_converted,
               n_converted / CAST((SELECT COUNT(*) FROM ff) AS DOUBLE)
                   AS conversion_rate,
               min_lag_s, median_lag_s, avg_lag_s, max_lag_s
        FROM s
    """

    o["ols_trend"] = """
        WITH daily AS (
            SELECT event_type AS metric, CAST(ts AS DATE) AS d,
                   SUM(CAST(value AS DECIMAL(14,4))) AS y
            FROM events GROUP BY 1, 2),
        f AS (SELECT metric, MIN(d) AS d0 FROM daily GROUP BY metric),
        xy AS (
            SELECT daily.metric,
                   CAST(datediff('day', d0, d) AS DECIMAL(6,0)) AS x,
                   CAST(y AS DECIMAL(20,4)) AS y
            FROM daily JOIN f ON daily.metric = f.metric),
        s AS (
            SELECT metric,
                   CAST(COUNT(*) AS DECIMAL(8,0)) AS n,
                   CAST(SUM(x) AS DECIMAL(12,0)) AS sx,
                   CAST(SUM(y) AS DECIMAL(20,4)) AS sy,
                   CAST(SUM(x*y) AS DECIMAL(26,4)) AS sxy,
                   CAST(SUM(x*x) AS DECIMAL(20,0)) AS sxx
            FROM xy GROUP BY metric)
        SELECT metric, CAST(n AS BIGINT) AS n_days,
               CAST(n*sxy - sx*sy AS DOUBLE)
                   / NULLIF(CAST(n*sxx - sx*sx AS DOUBLE), 0.0) AS slope,
               (CAST(sy AS DOUBLE)
                - (CAST(n*sxy - sx*sy AS DOUBLE)
                   / NULLIF(CAST(n*sxx - sx*sx AS DOUBLE), 0.0))
                  * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS intercept
        FROM s
    """

    o["seasonal_dow"] = """
        WITH daily AS (
            SELECT event_type AS series, CAST(ts AS DATE) AS d,
                   COUNT(*) AS n
            FROM events GROUP BY 1, 2),
        d2 AS (
            SELECT series, n,
                   datediff('day', DATE '1970-01-05', d) % 7 AS dow
            FROM daily),
        bd AS (
            SELECT series, dow, COUNT(*) AS n_days,
                   CAST(SUM(n) AS BIGINT) AS tot
            FROM d2 GROUP BY series, dow),
        ov AS (
            SELECT series,
                   CAST(SUM(n) AS DOUBLE) / COUNT(*) AS oavg
            FROM d2 GROUP BY series)
        SELECT bd.series, dow, n_days,
               CAST(tot AS DOUBLE) / n_days AS dow_avg,
               (CAST(tot AS DOUBLE) / n_days) / oavg AS seasonal_index
        FROM bd JOIN ov ON bd.series = ov.series
    """

    o["value_histogram"] = """
        WITH s AS (SELECT MIN(value) AS mn, MAX(value) AS mx FROM events),
        b AS (
            SELECT CAST(CASE WHEN mx = mn THEN 0
                        ELSE LEAST(FLOOR((value - mn)
                                 / ((mx - mn) / CAST(20 AS DOUBLE))), 19)
                        END AS INTEGER) AS bucket,
                   value, mn, mx
            FROM events, s)
        SELECT bucket,
               mn + bucket * ((mx - mn) / CAST(20 AS DOUBLE)) AS lo,
               mn + (bucket + 1) * ((mx - mn) / CAST(20 AS DOUBLE)) AS hi,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS sum_value
        FROM b GROUP BY bucket, mn, mx
    """

    # graph_pagerank now runs the degree-adaptive fold, and this graph's
    # max in-degree (≈680 at sf0.1) is under the 2^20 hub threshold, so
    # the selected mode is the FLAT src-ordered fold — one list per dst
    # ordered by src, folded left-to-right (list_reduce's first-element
    # seed == Spark's 0.0 seed because 0.0 + x == x for these
    # strictly-positive doubles): the identical double-addition
    # sequence, hence bit-exact across engines.
    pr_flat_iters = ""
    prev = "r0"
    for i in (1, 2, 3):
        pr_flat_iters += f"""
        c{i} AS (
            SELECT e.dst AS node,
                   list(r.rank / d.outdeg ORDER BY e.src) AS cs
            FROM edges e
            JOIN {prev} r ON r.node = e.src
            JOIN deg d ON d.src = e.src
            GROUP BY e.dst),
        r{i} AS (
            SELECT n.node,
                   0.15 + 0.85 * COALESCE(
                       list_reduce(c.cs, (a, x) -> a + x), 0.0) AS rank
            FROM nodes n LEFT JOIN c{i} c ON c.node = n.node),"""
        prev = f"r{i}"
    pr_graph_ctes = """
        WITH pairs AS (
            SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
            FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
        edges AS (
            SELECT 2*c AS src, 2*s + 1 AS dst FROM pairs
            UNION ALL
            SELECT 2*s + 1, 2*c FROM pairs),
        deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
        nodes AS (
            SELECT src AS node FROM edges
            UNION
            SELECT dst FROM edges),
        r0 AS (SELECT node, CAST(1.0 AS DOUBLE) AS rank FROM nodes),"""
    o["graph_pagerank"] = f"""
        {pr_graph_ctes}{pr_flat_iters}
        fin AS (SELECT node, rank FROM {prev} WHERE node % 2 = 1)
        SELECT CAST((node - 1) / 2 AS BIGINT) AS s_suppkey, rank
        FROM fin ORDER BY rank DESC, node ASC LIMIT 25
    """

    # two-level fold mirror of functions/graph.py pagerank(src_buckets=32)
    # — graph_pagerank_hub forces the power-law mode so it stays
    # oracle-checked: level 1 folds each (dst, src%32) bucket's
    # contributions in src order, level 2 folds the bucket partials in
    # bucket order — the identical double-addition sequence, bit-exact.
    pr_hub_iters = ""
    prev = "r0"
    for i in (1, 2, 3):
        pr_hub_iters += f"""
        c{i} AS (
            SELECT e.dst AS node, e.src % 32 AS bkt,
                   list(r.rank / d.outdeg ORDER BY e.src) AS cs
            FROM edges e
            JOIN {prev} r ON r.node = e.src
            JOIN deg d ON d.src = e.src
            GROUP BY e.dst, e.src % 32),
        p{i} AS (
            SELECT node,
                   list(list_reduce(cs, (a, x) -> a + x) ORDER BY bkt) AS ps
            FROM c{i} GROUP BY node),
        r{i} AS (
            SELECT n.node,
                   0.15 + 0.85 * COALESCE(
                       list_reduce(p.ps, (a, x) -> a + x), 0.0) AS rank
            FROM nodes n LEFT JOIN p{i} p ON p.node = n.node),"""
        prev = f"r{i}"
    o["graph_pagerank_hub"] = f"""
        {pr_graph_ctes}{pr_hub_iters}
        fin AS (SELECT node, rank FROM {prev} WHERE node % 2 = 1)
        SELECT CAST((node - 1) / 2 AS BIGINT) AS s_suppkey, rank
        FROM fin ORDER BY rank DESC, node ASC LIMIT 25
    """

    o["bloom_semi_join"] = """
        SELECT o_orderpriority, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE)
                   AS total_price
        FROM orders
        WHERE o_custkey IN (
            SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        GROUP BY o_orderpriority
    """

    o["association_rules"] = """
        WITH basket AS (
            SELECT DISTINCT user_id, event_type AS t FROM events),
        supp AS (SELECT t, COUNT(*) AS n_item FROM basket GROUP BY t),
        nu AS (SELECT COUNT(DISTINCT user_id) AS n_users FROM basket),
        pairs AS (
            SELECT a.t AS item_a, b.t AS item_b, COUNT(*) AS n_both
            FROM basket a JOIN basket b
              ON a.user_id = b.user_id AND a.t < b.t
            GROUP BY 1, 2)
        SELECT item_a, item_b, n_both,
               sa.n_item AS n_a, sb.n_item AS n_b,
               n_both / CAST(sa.n_item AS DOUBLE) AS conf_a_b,
               n_both / CAST(sb.n_item AS DOUBLE) AS conf_b_a,
               CAST(n_both * nu.n_users AS DOUBLE)
                   / CAST(sa.n_item * sb.n_item AS DOUBLE) AS lift
        FROM pairs
        CROSS JOIN nu
        JOIN supp sa ON sa.t = item_a
        JOIN supp sb ON sb.t = item_b
    """

    o["event_debounce"] = """
        WITH g AS (
            SELECT event_type,
                   datediff('second',
                       lag(ts) OVER (PARTITION BY user_id, event_type
                                     ORDER BY ts ASC, event_id ASC),
                       ts) AS gap
            FROM events)
        SELECT event_type,
               CAST(SUM(CASE WHEN gap IS NULL OR gap >= 60
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
               CAST(SUM(CASE WHEN gap IS NOT NULL AND gap < 60
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
        FROM g GROUP BY event_type
    """

    o["sliding_active_users"] = """
        WITH ud AS (
            SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        spine AS (SELECT DISTINCT d AS day FROM ud)
        SELECT day, COUNT(DISTINCT user_id) AS n_active_users,
               7 AS window_days
        FROM ud JOIN spine
          ON spine.day >= ud.d AND datediff('day', ud.d, spine.day) < 7
        GROUP BY day
    """

    o["winsorized_stats"] = """
        WITH q AS (
            SELECT quantile_disc(value, 0.01) AS lo,
                   quantile_disc(value, 0.99) AS hi
            FROM events)
        SELECT COUNT(*) AS n,
               MIN(lo) AS lo_bound,
               MIN(hi) AS hi_bound,
               CAST(SUM(CASE WHEN value < lo THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_clipped_lo,
               CAST(SUM(CASE WHEN value > hi THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_clipped_hi,
               CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS sum_raw,
               CAST(SUM(CAST(LEAST(GREATEST(value, lo), hi)
                        AS DECIMAL(28,4))) AS DOUBLE) AS sum_winsorized,
               CAST(SUM(CAST(LEAST(GREATEST(value, lo), hi)
                        AS DECIMAL(28,4))) AS DOUBLE) / COUNT(*)
                   AS mean_winsorized
        FROM events, q
    """

    o["copurchase_jaccard"] = """
        WITH basket AS (
            SELECT DISTINCT o.o_custkey AS id, l.l_partkey AS it
            FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
        sz AS (SELECT id, COUNT(*) AS s FROM basket GROUP BY id),
        inter AS (
            SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_common
            FROM basket a JOIN basket b
              ON a.it = b.it AND a.id < b.id
            GROUP BY 1, 2)
        SELECT id_a, id_b, n_common, sa.s AS size_a, sb.s AS size_b,
               n_common / CAST(sa.s + sb.s - n_common AS DOUBLE) AS jaccard
        FROM inter
        JOIN sz sa ON sa.id = id_a
        JOIN sz sb ON sb.id = id_b
        ORDER BY jaccard DESC, id_a ASC, id_b ASC LIMIT 20
    """

    o["running_balance"] = """
        WITH d AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN event_type IN ('error', 'click')
                        THEN -value ELSE value END AS delta
            FROM events),
        per AS (
            SELECT user_id, COUNT(*) AS n_events,
                   list_reduce(
                       [[CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)]]
                       || list([delta, CAST(0.0 AS DOUBLE)]
                               ORDER BY ts ASC, event_id ASC),
                       (a, x) -> [GREATEST(CAST(0.0 AS DOUBLE), a[1] + x[1]),
                                  a[2] + CASE WHEN a[1] + x[1] < 0.0
                                         THEN 1.0 ELSE 0.0 END]
                   ) AS acc
            FROM d GROUP BY user_id)
        SELECT user_id, n_events,
               acc[1] AS final_balance,
               CAST(acc[2] AS BIGINT) AS n_clamped
        FROM per
    """

    o["phrase_search"] = """
        WITH sp AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        tok AS (
            SELECT doc_id, l, unnest(generate_series(1, len(l))) AS i
            FROM sp),
        pos AS (
            SELECT doc_id, i, l[i] AS term FROM tok WHERE l[i] <> '')
        SELECT p0.doc_id AS doc_id, COUNT(*) AS n_hits
        FROM pos p0 JOIN pos p1
          ON p1.doc_id = p0.doc_id AND p1.i = p0.i + 1
        WHERE p0.term = 'data' AND p1.term = 'stream'
        GROUP BY p0.doc_id
        ORDER BY n_hits DESC, doc_id ASC LIMIT 20
    """

    o["kpi_rollup"] = """
        WITH e AS (
            SELECT event_type AS metric, CAST(ts AS DATE) AS day, value
            FROM events)
        SELECT metric, day,
               CAST(GROUPING(metric, day) AS BIGINT) AS gid,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS value_sum
        FROM e GROUP BY ROLLUP(metric, day)
    """

    _bfs_edges = """
        pairs AS (
            SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
            FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
        edges AS (
            SELECT 2*c AS src, 2*s + 1 AS dst FROM pairs
            UNION ALL
            SELECT 2*s + 1, 2*c FROM pairs),
        v0 AS (
            SELECT DISTINCT 2*s_suppkey + 1 AS node FROM supplier
            WHERE s_suppkey % 10 = 0),
        f1 AS (
            SELECT DISTINCT e.dst AS node FROM edges e
            JOIN v0 ON v0.node = e.src
            WHERE e.dst NOT IN (SELECT node FROM v0)),
        f2 AS (
            SELECT DISTINCT e.dst AS node FROM edges e
            JOIN f1 ON f1.node = e.src
            WHERE e.dst NOT IN (SELECT node FROM v0
                                UNION ALL SELECT node FROM f1)),
        f3 AS (
            SELECT DISTINCT e.dst AS node FROM edges e
            JOIN f2 ON f2.node = e.src
            WHERE e.dst NOT IN (SELECT node FROM v0
                                UNION ALL SELECT node FROM f1
                                UNION ALL SELECT node FROM f2))
    """
    o["graph_bfs"] = f"""
        WITH {_bfs_edges}
        SELECT node, 0 AS hops FROM v0
        UNION ALL SELECT node, 1 FROM f1
        UNION ALL SELECT node, 2 FROM f2
        UNION ALL SELECT node, 3 FROM f3
    """

    _prof_cols = [
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderpriority",
        "o_orderdate",
    ]
    _prof_rows = "\n        UNION ALL ".join(
        f"""SELECT '{c}' AS col_name, COUNT(*) AS n_rows,
               CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_null,
               COUNT(DISTINCT {c}) AS n_distinct,
               CAST(MIN({c}) AS VARCHAR) AS min_str,
               CAST(MAX({c}) AS VARCHAR) AS max_str FROM od"""
        for c in _prof_cols
    )
    o["table_profile"] = f"""
        WITH od AS (
            SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                   o_orderpriority, CAST(o_orderdate AS DATE) AS o_orderdate
            FROM orders)
        {_prof_rows}
    """

    o["fk_orphans"] = """
        SELECT 'lineitem.order' AS relation,
               (SELECT COUNT(*) FROM lineitem) AS n_rows,
               (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS (
                   SELECT 1 FROM orders o
                   WHERE o.o_orderkey = l.l_orderkey)) AS n_orphans
        UNION ALL
        SELECT 'lineitem.part',
               (SELECT COUNT(*) FROM lineitem),
               (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS (
                   SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey))
        UNION ALL
        SELECT 'lineitem.supplier',
               (SELECT COUNT(*) FROM lineitem),
               (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS (
                   SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey))
        UNION ALL
        SELECT 'orders.customer',
               (SELECT COUNT(*) FROM orders),
               (SELECT COUNT(*) FROM orders o WHERE NOT EXISTS (
                   SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
    """

    o["event_paths"] = """
        WITH c AS (
            SELECT event_type || '>' || lead(event_type, 1) OVER w
                       || '>' || lead(event_type, 2) OVER w AS path,
                   lead(event_type, 2) OVER w AS last2
            FROM events
            WINDOW w AS (PARTITION BY user_id
                         ORDER BY ts ASC, event_id ASC))
        SELECT path, COUNT(*) AS n FROM c WHERE last2 IS NOT NULL
        GROUP BY path ORDER BY n DESC, path ASC LIMIT 15
    """

    o["time_weighted_avg"] = """
        WITH b AS (
            SELECT event_type AS series, CAST(ts AS DATE) AS day,
                   datediff('second', TIMESTAMP '1970-01-01', ts) AS sec,
                   event_id AS id, CAST(value AS DECIMAL(18,4)) AS v
            FROM events),
        w AS (
            SELECT series, day, v,
                   COALESCE(
                       lead(sec) OVER (PARTITION BY series, day
                                       ORDER BY sec ASC, id ASC),
                       datediff('second', TIMESTAMP '1970-01-01',
                                CAST(day AS TIMESTAMP)) + 86400) - sec AS wt
            FROM b)
        SELECT series, day, COUNT(*) AS n_events,
               CAST(SUM(wt) AS BIGINT) AS total_s,
               CAST(SUM(v * CAST(wt AS DECIMAL(10,0))) AS DOUBLE)
                   / CAST(SUM(wt) AS DOUBLE) AS twap
        FROM w GROUP BY series, day
    """

    o["cumulative_users"] = """
        WITH firsts AS (
            SELECT user_id, MIN(CAST(ts AS DATE)) AS day
            FROM events GROUP BY user_id),
        news AS (
            SELECT day, COUNT(*) AS n_new FROM firsts GROUP BY day),
        spine AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events)
        SELECT s.day,
               CAST(COALESCE(n.n_new, 0) AS BIGINT) AS n_new_users,
               CAST(SUM(COALESCE(n.n_new, 0)) OVER (
                   ORDER BY s.day ASC
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
        FROM spine s LEFT JOIN news n ON n.day = s.day
    """

    o["consistent_sample"] = """
        WITH ev AS (
            SELECT user_id FROM events
            WHERE ('0x' || substr(md5('csample-v1:'
                      || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
                  % 100 < 10),
        od AS (
            SELECT o_custkey FROM orders
            WHERE ('0x' || substr(md5('csample-v1:'
                      || CAST(o_custkey AS VARCHAR)), 1, 15))::BIGINT
                  % 100 < 10)
        SELECT (SELECT COUNT(DISTINCT user_id) FROM ev) AS n_users_sampled,
               (SELECT COUNT(*) FROM ev) AS n_events_sampled,
               (SELECT COUNT(DISTINCT o_custkey) FROM od) AS n_custs_sampled,
               (SELECT COUNT(*) FROM od) AS n_orders_sampled
    """

    o["grouped_quantiles"] = """
        SELECT event_type AS series, CAST(0.5 AS DOUBLE) AS q,
               CAST(quantile_disc(value, 0.5) AS DOUBLE) AS value
        FROM events GROUP BY event_type
        UNION ALL
        SELECT event_type, CAST(0.9 AS DOUBLE),
               CAST(quantile_disc(value, 0.9) AS DOUBLE)
        FROM events GROUP BY event_type
        UNION ALL
        SELECT event_type, CAST(0.99 AS DOUBLE),
               CAST(quantile_disc(value, 0.99) AS DOUBLE)
        FROM events GROUP BY event_type
    """

    o["embedding_quantize"] = """
        WITH pos AS (
            SELECT vec_id, embedding AS e,
                   unnest(generate_series(1, len(embedding))) AS i
            FROM embeddings),
        v AS (SELECT vec_id, i, CAST(e[i] AS DOUBLE) AS x FROM pos),
        m AS (SELECT vec_id, MAX(ABS(x)) AS max_abs FROM v GROUP BY vec_id),
        q AS (
            SELECT v.vec_id, i, m.max_abs,
                   CAST(ROUND(x * (127.0 / NULLIF(m.max_abs, 0.0)))
                        AS BIGINT) AS qv
            FROM v JOIN m ON v.vec_id = m.vec_id)
        SELECT vec_id, COUNT(*) AS n_dims, MIN(max_abs) AS max_abs,
               CAST(SUM(qv * i) AS BIGINT) AS checksum
        FROM q GROUP BY vec_id
    """

    o["wow_change"] = """
        WITH daily AS (
            SELECT event_type AS metric, CAST(ts AS DATE) AS day,
                   CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE)
                       AS value_sum
            FROM events GROUP BY 1, 2)
        SELECT d.metric, d.day, d.value_sum,
               p.value_sum AS prev_week,
               (d.value_sum - p.value_sum)
                   / NULLIF(p.value_sum, 0.0) AS pct_change
        FROM daily d JOIN daily p
          ON p.metric = d.metric AND p.day + 7 = d.day
    """

    o["robust_outliers"] = """
        WITH med AS (
            SELECT event_type AS metric,
                   CAST(quantile_disc(value, 0.5) AS DOUBLE) AS med
            FROM events GROUP BY 1),
        dev AS (
            SELECT e.event_type AS metric, m.med,
                   ABS(value - m.med) AS d
            FROM events e JOIN med m ON m.metric = e.event_type),
        mad AS (
            SELECT metric,
                   CAST(quantile_disc(d, 0.5) AS DOUBLE) AS mad
            FROM dev GROUP BY metric)
        SELECT dev.metric, COUNT(*) AS n,
               MIN(dev.med) AS med, MIN(mad.mad) AS mad,
               CAST(SUM(CASE WHEN d > 3.0 * mad.mad THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_outliers
        FROM dev JOIN mad ON mad.metric = dev.metric
        GROUP BY dev.metric
    """

    o["ewma_daily"] = """
        WITH daily AS (
            SELECT event_type AS metric, CAST(ts AS DATE) AS d,
                   CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS y
            FROM events GROUP BY 1, 2),
        per AS (
            SELECT metric, MAX(d) AS last_date, COUNT(*) AS n_days,
                   list(y ORDER BY d) AS v
            FROM daily GROUP BY metric)
        SELECT metric, last_date, n_days,
               list_reduce(v, (a, x) -> 0.25 * x + 0.75 * a) AS ewma
        FROM per
    """

    o["attribution_last_touch"] = """
        WITH t AS (
            SELECT user_id, ts, event_type,
                   last_value(CASE WHEN event_type <> 'purchase'
                              THEN struct_pack(t := ts, c := event_type)
                              END IGNORE NULLS)
                     OVER (PARTITION BY user_id
                           ORDER BY ts ASC, event_id ASC
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING) AS touch
            FROM events)
        SELECT CASE WHEN touch IS NOT NULL
                     AND datediff('second', touch.t, ts) <= 3600
                    THEN touch.c END AS channel,
               COUNT(*) AS n_conversions
        FROM t WHERE event_type = 'purchase'
        GROUP BY 1
        ORDER BY n_conversions DESC, channel ASC NULLS FIRST
    """

    o["rolling_corr"] = """
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(SUM(CASE WHEN event_type = 'view'
                            THEN 1 ELSE 0 END) AS BIGINT) AS x,
                   CAST(SUM(CASE WHEN event_type = 'purchase'
                            THEN 1 ELSE 0 END) AS BIGINT) AS y
            FROM events GROUP BY 1),
        s AS (
            SELECT day,
                   COUNT(*) OVER w AS n,
                   SUM(x) OVER w AS sx, SUM(y) OVER w AS sy,
                   SUM(x*x) OVER w AS sxx, SUM(y*y) OVER w AS syy,
                   SUM(x*y) OVER w AS sxy
            FROM daily
            WINDOW w AS (ORDER BY day ASC
                         ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
        SELECT day, CAST(n AS BIGINT) AS n_days,
               CAST(n*sxy - sx*sy AS DOUBLE)
                   / NULLIF(sqrt(CAST(n*sxx - sx*sx AS DOUBLE))
                            * sqrt(CAST(n*syy - sy*sy AS DOUBLE)), 0.0)
                   AS corr
        FROM s
    """

    o["source_cap"] = """
        WITH ranked AS (
            SELECT source, doc_id,
                   ROW_NUMBER() OVER (PARTITION BY source
                                      ORDER BY doc_id ASC) AS rk
            FROM documents),
        before AS (SELECT source, COUNT(*) AS n_before FROM documents
                   GROUP BY source),
        aftr AS (SELECT source, COUNT(*) AS n_after FROM ranked
                 WHERE rk <= 50 GROUP BY source)
        SELECT b.source, b.n_before, a.n_after
        FROM before b JOIN aftr a ON a.source = b.source
    """

    _fp_expr = _H60.format(
        expr="TRIM(REGEXP_REPLACE(LOWER(text), '" + _NORM_RE + "', ' ', 'g'))"
    )
    o["cluster_split"] = f"""
        WITH fps AS (
            SELECT doc_id, {_fp_expr} AS fp FROM documents),
        reps AS (SELECT fp, MIN(doc_id) AS rep FROM fps GROUP BY fp),
        lab AS (
            SELECT f.doc_id, r.rep,
                   ('0x' || substr(md5('split-v1:'
                        || CAST(r.rep AS VARCHAR)), 1, 15))::BIGINT
                   % 100 AS b
            FROM fps f JOIN reps r ON r.fp = f.fp)
        SELECT CASE WHEN b < 98 THEN 'train'
                    WHEN b < 99 THEN 'val'
                    ELSE 'test' END AS split,
               COUNT(*) AS n_docs,
               COUNT(DISTINCT rep) AS n_groups
        FROM lab GROUP BY 1
    """

    o["local_supplier_volume"] = """
        SELECT n.n_name,
               CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                             AS DECIMAL(28,4))) AS DOUBLE) AS revenue
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
          AND c.c_nationkey = s.s_nationkey
          AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY n.n_name
        ORDER BY revenue DESC, n_name ASC
    """

    o["bounce_rate"] = """
        WITH flagged AS (
            SELECT user_id, ts,
                   CASE WHEN LAG(ts) OVER w IS NULL
                             OR epoch_us(ts) - epoch_us(LAG(ts) OVER w)
                                > 30 * 60 * 1000000
                        THEN 1 ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        tagged AS (
            SELECT user_id, ts,
                   CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS session_id
            FROM flagged),
        sess AS (
            SELECT user_id, session_id,
                   MIN(ts) AS session_start, COUNT(*) AS n_events
            FROM tagged GROUP BY user_id, session_id)
        SELECT CAST(session_start AS DATE) AS day,
               COUNT(*) AS n_sessions,
               CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_bounces,
               SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
                   / CAST(COUNT(*) AS DOUBLE) AS bounce_rate
        FROM sess GROUP BY 1
    """

    o["burn_rate"] = """
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n,
                   CAST(SUM(CASE WHEN event_type = 'error'
                            THEN 1 ELSE 0 END) AS BIGINT) AS err
            FROM events GROUP BY 1),
        s AS (
            SELECT day,
                   CAST(SUM(err) OVER ws AS BIGINT) AS err_s,
                   CAST(SUM(n) OVER ws AS BIGINT) AS n_s,
                   CAST(SUM(err) OVER wl AS BIGINT) AS err_l,
                   CAST(SUM(n) OVER wl AS BIGINT) AS n_l
            FROM daily
            WINDOW ws AS (ORDER BY day ASC
                          ROWS BETWEEN 0 PRECEDING AND CURRENT ROW),
                   wl AS (ORDER BY day ASC
                          ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
        SELECT day, err_s, n_s, err_l, n_l,
               err_s / CAST(n_s AS DOUBLE) AS short_share,
               err_l / CAST(n_l AS DOUBLE) AS long_share,
               (err_s / CAST(n_s AS DOUBLE))
                   / NULLIF(err_l / CAST(n_l AS DOUBLE), 0.0) AS burn_ratio
        FROM s
    """

    o["cep_pattern"] = """
        WITH t AS (
            SELECT user_id, ts, event_type, CAST(ts AS DATE) AS day,
                   MAX(CASE WHEN event_type = 'view' THEN ts END)
                       OVER wb AS a,
                   MAX(CASE WHEN event_type = 'error' THEN ts END)
                       OVER wb AS c
            FROM events
            WINDOW wb AS (PARTITION BY user_id
                          ORDER BY ts ASC, event_id ASC
                          ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING)),
        m AS (
            SELECT day,
                   CASE WHEN a IS NOT NULL
                             AND datediff('second', a, ts) <= 600
                             AND (c IS NULL OR c < a)
                        THEN 1 ELSE 0 END AS m
            FROM t WHERE event_type = 'purchase')
        SELECT day, COUNT(*) AS n_end_events,
               CAST(SUM(m) AS BIGINT) AS n_matched,
               SUM(m) / CAST(COUNT(*) AS DOUBLE) AS match_rate
        FROM m GROUP BY day
    """

    o["cohort_ltv"] = """
        WITH fs AS (
            SELECT user_id,
                   CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
            FROM events GROUP BY user_id),
        sizes AS (
            SELECT cohort_week, COUNT(*) AS cohort_size
            FROM fs GROUP BY cohort_week),
        cells AS (
            SELECT f.cohort_week,
                   CAST(datediff('day', f.cohort_week,
                        CAST(date_trunc('week', e.ts) AS DATE)) / 7
                        AS INTEGER) AS week_offset,
                   SUM(CAST(e.value AS DECIMAL(18,4))) AS wv
            FROM events e JOIN fs f ON f.user_id = e.user_id
            GROUP BY 1, 2
            HAVING week_offset >= 0 AND week_offset <= 8)
        SELECT c.cohort_week, c.week_offset, s.cohort_size,
               CAST(c.wv AS DOUBLE) AS week_value,
               CAST(SUM(c.wv) OVER (PARTITION BY c.cohort_week
                    ORDER BY c.week_offset ASC
                    ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum_value,
               CAST(SUM(c.wv) OVER (PARTITION BY c.cohort_week
                    ORDER BY c.week_offset ASC
                    ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                   / CAST(s.cohort_size AS DOUBLE) AS ltv_per_user
        FROM cells c JOIN sizes s ON s.cohort_week = c.cohort_week
    """

    o["setjoin_prefix"] = _TEXT_CTE + _SHINGLE_CTE + """
        , ex AS (SELECT doc_id, UNNEST(sh) AS s FROM g),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM ex GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   COUNT(*) AS n_inter
            FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2)
        SELECT i.doc_a, i.doc_b, i.n_inter,
               i.n_inter / CAST(na.n + nb.n - i.n_inter AS DOUBLE) AS jaccard
        FROM inter i
        JOIN sizes na ON na.doc_id = i.doc_a
        JOIN sizes nb ON nb.doc_id = i.doc_b
        WHERE i.n_inter / CAST(na.n + nb.n - i.n_inter AS DOUBLE) >= 0.7
    """

    o["rfm_segments"] = """
        WITH per AS (
            SELECT user_id, MAX(CAST(ts AS DATE)) AS last_d,
                   COUNT(*) AS frequency,
                   CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
                       AS monetary
            FROM events GROUP BY user_id),
        a AS (SELECT MAX(last_d) AS anchor FROM per),
        p2 AS (
            SELECT per.*, datediff('day', last_d, anchor) AS recency_days
            FROM per, a),
        s AS (
            SELECT user_id, recency_days, frequency, monetary,
                   NTILE(4) OVER (ORDER BY recency_days ASC, user_id ASC)
                       AS r,
                   NTILE(4) OVER (ORDER BY frequency DESC, user_id ASC)
                       AS f,
                   NTILE(4) OVER (ORDER BY monetary DESC, user_id ASC)
                       AS m
            FROM p2)
        SELECT user_id, recency_days, frequency, monetary, r, f, m,
               CAST(r AS VARCHAR) || '-' || CAST(f AS VARCHAR)
                   || '-' || CAST(m AS VARCHAR) AS segment
        FROM s
    """

    # bounds path: boundary b_i = the value at NTILE tile-end rank e_i
    # (ascending for recency; DESCENDING rank for frequency/monetary);
    # tile = 1 + #bounds passed. Value-at-rank via ROW_NUMBER — the
    # value at a rank is multiset-determined, so tie order is irrelevant.
    o["rfm_segments_bounds"] = """
        WITH per AS (
            SELECT user_id, MAX(CAST(ts AS DATE)) AS last_d,
                   COUNT(*) AS frequency,
                   CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
                       AS monetary
            FROM events GROUP BY user_id),
        a AS (SELECT MAX(last_d) AS anchor FROM per),
        p2 AS (
            SELECT per.*, datediff('day', last_d, anchor) AS recency_days
            FROM per, a),
        nn AS (SELECT COUNT(*) AS n FROM p2),
        e AS (
            SELECT i, i * (n // 4) + LEAST(i, n % 4) AS e
            FROM nn, (VALUES (1), (2), (3)) t(i)),
        rr AS (SELECT recency_days AS v,
                      ROW_NUMBER() OVER (ORDER BY recency_days ASC) AS rn
               FROM p2),
        fr AS (SELECT frequency AS v,
                      ROW_NUMBER() OVER (ORDER BY frequency DESC) AS rn
               FROM p2),
        mr AS (SELECT monetary AS v,
                      ROW_NUMBER() OVER (ORDER BY monetary DESC) AS rn
               FROM p2),
        b AS (
            SELECT
                MAX(CASE WHEN e.i = 1 THEN rr.v END) AS rb1,
                MAX(CASE WHEN e.i = 2 THEN rr.v END) AS rb2,
                MAX(CASE WHEN e.i = 3 THEN rr.v END) AS rb3,
                MAX(CASE WHEN e.i = 1 THEN fr.v END) AS fb1,
                MAX(CASE WHEN e.i = 2 THEN fr.v END) AS fb2,
                MAX(CASE WHEN e.i = 3 THEN fr.v END) AS fb3,
                MAX(CASE WHEN e.i = 1 THEN mr.v END) AS mb1,
                MAX(CASE WHEN e.i = 2 THEN mr.v END) AS mb2,
                MAX(CASE WHEN e.i = 3 THEN mr.v END) AS mb3
            FROM e
            JOIN rr ON rr.rn = e.e
            JOIN fr ON fr.rn = e.e
            JOIN mr ON mr.rn = e.e),
        s AS (
            SELECT user_id, recency_days, frequency, monetary,
                   1 + CAST(recency_days > rb1 AS INT)
                     + CAST(recency_days > rb2 AS INT)
                     + CAST(recency_days > rb3 AS INT) AS r,
                   1 + CAST(frequency < fb1 AS INT)
                     + CAST(frequency < fb2 AS INT)
                     + CAST(frequency < fb3 AS INT) AS f,
                   1 + CAST(monetary < mb1 AS INT)
                     + CAST(monetary < mb2 AS INT)
                     + CAST(monetary < mb3 AS INT) AS m
            FROM p2, b)
        SELECT user_id, recency_days, frequency, monetary, r, f, m,
               CAST(r AS VARCHAR) || '-' || CAST(f AS VARCHAR)
                   || '-' || CAST(m AS VARCHAR) AS segment
        FROM s
    """

    o["nation_share"] = """
        WITH rev AS (
            SELECT r.r_name AS region, n.n_name AS nation,
                   CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                            AS DECIMAL(28,4))) AS DOUBLE) AS revenue
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            GROUP BY 1, 2)
        SELECT region, nation, revenue,
               revenue / CAST(SUM(CAST(revenue AS DECIMAL(28,4)))
                   OVER (PARTITION BY region) AS DOUBLE) AS region_share,
               ROW_NUMBER() OVER (PARTITION BY region
                   ORDER BY revenue DESC, nation ASC) AS rank_in_region
        FROM rev
    """

    o["weighted_median"] = """
        WITH b AS (
            SELECT l_returnflag AS series, l_extendedprice AS v,
                   CAST(l_quantity AS BIGINT) AS w
            FROM lineitem),
        c AS (
            SELECT series, v, w,
                   SUM(w) OVER (PARTITION BY series
                       ORDER BY v ASC, w ASC
                       ROWS UNBOUNDED PRECEDING) AS cw,
                   SUM(w) OVER (PARTITION BY series) AS tot
            FROM b)
        SELECT series, CAST(MIN(tot) AS BIGINT) AS total_w,
               MIN(v) AS wmedian
        FROM c WHERE 2 * cw >= tot GROUP BY series
    """

    o["forward_fill"] = """
        WITH daily AS (
            SELECT event_type AS series, CAST(ts AS DATE) AS day,
                   CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE)
                       AS observed
            FROM events GROUP BY 1, 2),
        b AS (SELECT series, MIN(day) AS d0, MAX(day) AS d1
              FROM daily GROUP BY series),
        spine AS (
            SELECT series,
                   CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                        CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE)
                       AS day
            FROM b),
        j AS (
            SELECT s.series, s.day, d.observed
            FROM spine s LEFT JOIN daily d
              ON d.series = s.series AND d.day = s.day)
        SELECT series, day, observed,
               last_value(observed IGNORE NULLS) OVER (
                   PARTITION BY series ORDER BY day ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS value_filled,
               observed IS NULL AS is_imputed
        FROM j
    """

    o["topn_other"] = """
        WITH per AS (
            SELECT o_orderpriority AS key,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE)
                       AS m
            FROM orders GROUP BY 1),
        r AS (
            SELECT key, m,
                   ROW_NUMBER() OVER (ORDER BY m DESC, key ASC) AS rk
            FROM per),
        l AS (
            SELECT CASE WHEN rk <= 3 THEN key ELSE 'OTHER' END AS key,
                   CAST(m AS DECIMAL(28,4)) AS md
            FROM r)
        SELECT key, CAST(SUM(md) AS DOUBLE) AS measure,
               COUNT(*) AS n_keys
        FROM l GROUP BY key
    """

    o["double_charge"] = """
        WITH g AS (
            SELECT event_type,
                   CASE WHEN lag_gap IS NOT NULL AND lag_gap <= 300
                        THEN 1 ELSE 0 END AS sus
            FROM (
                SELECT event_type,
                       datediff('second',
                           lag(ts) OVER (
                               PARTITION BY user_id, event_type, value
                               ORDER BY ts ASC, event_id ASC),
                           ts) AS lag_gap
                FROM events))
        SELECT event_type, COUNT(*) AS n_events,
               CAST(SUM(sus) AS BIGINT) AS n_suspect,
               SUM(sus) / CAST(COUNT(*) AS DOUBLE) AS suspect_rate
        FROM g GROUP BY event_type
    """

    _acf_parts = []
    for _lag in range(1, 8):
        _acf_parts.append(f"""
        SELECT metric, {_lag} AS lag, CAST(n AS BIGINT) AS n_pairs,
               CAST(n*sxy - sx*sy AS DOUBLE)
                   / NULLIF(sqrt(CAST(n*sxx - sx*sx AS DOUBLE))
                            * sqrt(CAST(n*syy - sy*sy AS DOUBLE)), 0.0)
                   AS acf
        FROM (
            SELECT d1.metric, COUNT(*) AS n,
                   SUM(d1.x) AS sx, SUM(d2.x) AS sy,
                   SUM(d1.x*d1.x) AS sxx, SUM(d2.x*d2.x) AS syy,
                   SUM(d1.x*d2.x) AS sxy
            FROM daily d1 JOIN daily d2
              ON d2.metric = d1.metric AND d1.day = d2.day + {_lag}
            GROUP BY d1.metric)""")
    o["acf_daily"] = (
        """
        WITH daily AS (
            SELECT event_type AS metric, CAST(ts AS DATE) AS day,
                   COUNT(*) AS x
            FROM events GROUP BY 1, 2)
        """
        + "\n        UNION ALL".join(_acf_parts)
    )

    o["growth_accounting"] = """
        WITH uw AS (
            SELECT DISTINCT user_id AS u,
                   CAST(date_trunc('week', ts) AS DATE) AS week
            FROM events),
        f AS (SELECT u, MIN(week) AS fw FROM uw GROUP BY u),
        prev AS (SELECT u, week + 7 AS week, 1 AS was_prev FROM uw),
        cur AS (
            SELECT uw.u, uw.week, f.fw, p.was_prev
            FROM uw JOIN f ON f.u = uw.u
            LEFT JOIN prev p ON p.u = uw.u AND p.week = uw.week),
        act AS (
            SELECT week, COUNT(*) AS n_active,
                   CAST(SUM(CASE WHEN fw = week THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_new,
                   CAST(SUM(COALESCE(was_prev, 0)) AS BIGINT) AS n_retained,
                   CAST(SUM(CASE WHEN fw < week AND was_prev IS NULL
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected
            FROM cur GROUP BY week),
        ch AS (
            SELECT n.week, COUNT(*) AS n_churned
            FROM (SELECT u, week + 7 AS week FROM uw) n
            WHERE NOT EXISTS (
                SELECT 1 FROM uw w2 WHERE w2.u = n.u AND w2.week = n.week)
            GROUP BY n.week)
        SELECT a.week, n_active, n_new, n_retained, n_resurrected,
               CAST(COALESCE(c.n_churned, 0) AS BIGINT) AS n_churned
        FROM act a LEFT JOIN ch c ON c.week = a.week
    """

    o["max_drawdown"] = """
        WITH daily AS (
            SELECT event_type AS series, CAST(ts AS DATE) AS day,
                   SUM(CAST(value AS DECIMAL(18,4))) AS dv
            FROM events GROUP BY 1, 2),
        c AS (
            SELECT series, day,
                   SUM(dv) OVER (PARTITION BY series ORDER BY day ASC
                       ROWS UNBOUNDED PRECEDING) AS cum
            FROM daily),
        p AS (
            SELECT series, cum,
                   MAX(cum) OVER (PARTITION BY series ORDER BY day ASC
                       ROWS UNBOUNDED PRECEDING) AS peak
            FROM c)
        SELECT series, COUNT(*) AS n_days,
               CAST(MAX(cum) AS DOUBLE) AS final_value,
               CAST(MAX(peak) AS DOUBLE) AS peak_value,
               CAST(MAX(peak - cum) AS DOUBLE) AS max_drawdown
        FROM p GROUP BY series
    """

    o["audience_overlap"] = """
        WITH basket AS (
            SELECT DISTINCT user_id, event_type AS t FROM events),
        sizes AS (SELECT t, COUNT(*) AS n FROM basket GROUP BY t),
        inter AS (
            SELECT a.t AS type_a, b.t AS type_b, COUNT(*) AS n_both
            FROM basket a JOIN basket b
              ON a.user_id = b.user_id AND a.t < b.t
            GROUP BY 1, 2)
        SELECT type_a, type_b, sa.n AS n_a, sb.n AS n_b, n_both,
               sa.n + sb.n - n_both AS n_either,
               n_both / CAST(sa.n + sb.n - n_both AS DOUBLE) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.t = type_a
        JOIN sizes sb ON sb.t = type_b
    """

    o["daily_percentiles"] = """
        SELECT event_type AS series, CAST(ts AS DATE) AS day,
               CAST(0.5 AS DOUBLE) AS q,
               CAST(quantile_disc(value, 0.5) AS DOUBLE) AS value
        FROM events GROUP BY 1, 2
        UNION ALL
        SELECT event_type, CAST(ts AS DATE), CAST(0.95 AS DOUBLE),
               CAST(quantile_disc(value, 0.95) AS DOUBLE)
        FROM events GROUP BY 1, 2
    """

    o["session_stats"] = """
        WITH flagged AS (
            SELECT user_id, ts,
                   CASE WHEN LAG(ts) OVER w IS NULL
                             OR epoch_us(ts) - epoch_us(LAG(ts) OVER w)
                                > 30 * 60 * 1000000
                        THEN 1 ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        tagged AS (
            SELECT user_id, ts,
                   CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS session_id
            FROM flagged),
        sess AS (
            SELECT user_id, session_id,
                   MIN(ts) AS s0, MAX(ts) AS s1, COUNT(*) AS ne
            FROM tagged GROUP BY user_id, session_id)
        SELECT CAST(s0 AS DATE) AS day,
               COUNT(*) AS n_sessions,
               CAST(SUM(datediff('second', s0, s1)) AS DOUBLE) / COUNT(*)
                   AS avg_duration_s,
               CAST(SUM(ne) AS DOUBLE) / COUNT(*) AS avg_events
        FROM sess GROUP BY 1
    """

    o["seasonal_outliers"] = """
        WITH daily AS (
            SELECT event_type AS series, CAST(ts AS DATE) AS day,
                   COUNT(*) AS n
            FROM events GROUP BY 1, 2),
        d2 AS (
            SELECT series, day, n,
                   datediff('day', DATE '1970-01-05', day) % 7 AS dow
            FROM daily),
        da AS (
            SELECT series, dow,
                   CAST(SUM(n) AS DOUBLE) / COUNT(*) AS expd
            FROM d2 GROUP BY 1, 2),
        r AS (
            SELECT d2.series, d2.day,
                   CAST(n AS DOUBLE) - expd AS rr
            FROM d2 JOIN da ON da.series = d2.series AND da.dow = d2.dow),
        s AS (
            SELECT series, COUNT(*) AS n_days,
                   list_reduce([CAST(0.0 AS DOUBLE)]
                       || list(rr ORDER BY day), (a, x) -> a + x) AS sr,
                   list_reduce([CAST(0.0 AS DOUBLE)]
                       || list(rr * rr ORDER BY day), (a, x) -> a + x) AS srr,
                   list(rr ORDER BY day) AS rs
            FROM r GROUP BY series)
        SELECT series, n_days,
               CASE WHEN srr / CAST(n_days AS DOUBLE)
                         - (sr / CAST(n_days AS DOUBLE))
                           * (sr / CAST(n_days AS DOUBLE)) > 0
                    THEN sqrt(srr / CAST(n_days AS DOUBLE)
                         - (sr / CAST(n_days AS DOUBLE))
                           * (sr / CAST(n_days AS DOUBLE)))
               END AS resid_std,
               CAST(len(list_filter(rs, x -> ABS(x) >
                   3.0 * (CASE WHEN srr / CAST(n_days AS DOUBLE)
                               - (sr / CAST(n_days AS DOUBLE))
                                 * (sr / CAST(n_days AS DOUBLE)) > 0
                          THEN sqrt(srr / CAST(n_days AS DOUBLE)
                               - (sr / CAST(n_days AS DOUBLE))
                                 * (sr / CAST(n_days AS DOUBLE)))
                          END))) AS BIGINT) AS n_outliers
        FROM s
    """

    o["theilsen_trend"] = """
        WITH daily AS (
            SELECT event_type AS metric, CAST(ts AS DATE) AS d,
                   CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS y
            FROM events GROUP BY 1, 2),
        p AS (
            SELECT a.metric,
                   (b.y - a.y)
                       / CAST(datediff('day', a.d, b.d) AS DOUBLE) AS s
            FROM daily a JOIN daily b
              ON b.metric = a.metric AND a.d < b.d),
        m AS (
            SELECT metric, COUNT(*) AS n_pairs,
                   quantile_disc(s, 0.5) AS slope
            FROM p GROUP BY metric),
        dd AS (SELECT metric, COUNT(*) AS n_days FROM daily GROUP BY metric)
        SELECT m.metric, dd.n_days, m.n_pairs, m.slope
        FROM m JOIN dd ON dd.metric = m.metric
    """

    o["attribution_linear"] = """
        WITH base AS (
            SELECT user_id, event_type,
                   datediff('second', TIMESTAMP '1970-01-01', ts) AS sec
            FROM events),
        counted AS (
            SELECT user_id, event_type, sec,
                   COUNT(CASE WHEN event_type = 'click' THEN 1 END)
                       OVER w AS n_click,
                   COUNT(CASE WHEN event_type = 'error' THEN 1 END)
                       OVER w AS n_error,
                   COUNT(CASE WHEN event_type = 'signup' THEN 1 END)
                       OVER w AS n_signup,
                   COUNT(CASE WHEN event_type = 'view' THEN 1 END)
                       OVER w AS n_view
            FROM base
            WINDOW w AS (PARTITION BY user_id ORDER BY sec
                         RANGE BETWEEN 3600 PRECEDING AND 1 PRECEDING)),
        conv AS (
            SELECT *, n_click + n_error + n_signup + n_view AS tot
            FROM counted WHERE event_type = 'purchase'),
        u AS (
            SELECT 'click' AS channel,
                   CAST(n_click AS DOUBLE) / CAST(tot AS DOUBLE) AS credit,
                   sec, user_id FROM conv WHERE n_click > 0
            UNION ALL
            SELECT 'error', CAST(n_error AS DOUBLE) / CAST(tot AS DOUBLE),
                   sec, user_id FROM conv WHERE n_error > 0
            UNION ALL
            SELECT 'signup', CAST(n_signup AS DOUBLE) / CAST(tot AS DOUBLE),
                   sec, user_id FROM conv WHERE n_signup > 0
            UNION ALL
            SELECT 'view', CAST(n_view AS DOUBLE) / CAST(tot AS DOUBLE),
                   sec, user_id FROM conv WHERE n_view > 0
            UNION ALL
            SELECT NULL, CAST(1.0 AS DOUBLE), sec, user_id
            FROM conv WHERE tot = 0)
        SELECT channel, COUNT(*) AS n_touched_conversions,
               list_reduce([CAST(0.0 AS DOUBLE)]
                   || list(credit ORDER BY sec, user_id, credit),
                   (a, x) -> a + x) AS total_credit
        FROM u GROUP BY channel
    """

    o["mix_shift"] = """
        WITH weekly AS (
            SELECT event_type AS metric,
                   CAST(date_trunc('week', ts) AS DATE) AS week,
                   CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE)
                       AS value
            FROM events GROUP BY 1, 2),
        j AS (
            SELECT w.metric, w.week, w.value, p.value AS prev_value,
                   w.value - p.value AS delta
            FROM weekly w JOIN weekly p
              ON p.metric = w.metric AND p.week + 7 = w.week),
        t AS (
            SELECT week,
                   CAST(SUM(CAST(delta AS DECIMAL(28,4))) AS DOUBLE)
                       AS total_delta
            FROM j GROUP BY week)
        SELECT j.metric, j.week, j.value, j.prev_value, j.delta,
               t.total_delta,
               j.delta / NULLIF(t.total_delta, 0.0) AS contribution
        FROM j JOIN t ON t.week = j.week
    """

    from smartdatapipeline_spark.operators.quality import BENFORD_P

    _benford_case = "CASE digit " + " ".join(
        f"WHEN {d} THEN {p!r}" for d, p in BENFORD_P.items()
    ) + " END"
    o["benford_audit"] = f"""
        WITH base AS (
            SELECT CAST(NULLIF(regexp_extract(
                       CAST(CAST(ABS(o_totalprice) AS DECIMAL(18,4))
                            AS VARCHAR), '[1-9]', 0), '') AS INTEGER)
                       AS digit
            FROM orders WHERE ABS(o_totalprice) > 0),
        counts AS (
            SELECT digit, COUNT(*) AS n FROM base
            WHERE digit IS NOT NULL GROUP BY digit),
        t AS (SELECT SUM(n) AS tt FROM counts),
        wp AS (
            SELECT digit, n, CAST(tt AS DOUBLE) AS td,
                   {_benford_case} AS expected_share
            FROM counts, t),
        terms AS (
            SELECT digit, n, n / td AS share, expected_share,
                   (n - expected_share * td) * (n - expected_share * td)
                       / (expected_share * td) AS ct
            FROM wp),
        c AS (
            SELECT list_reduce([CAST(0.0 AS DOUBLE)]
                || list(ct ORDER BY digit), (a, x) -> a + x) AS chi2
            FROM terms)
        SELECT digit, n, share, expected_share,
               (SELECT chi2 FROM c) AS chi2
        FROM terms
    """

    # ---- round-4 wave -------------------------------------------------
    o["interval_overlap"] = """
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS d,
                   CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS total
            FROM events GROUP BY 1),
        promo AS (
            SELECT d AS peak_day,
                   CAST(d AS TIMESTAMP) - INTERVAL 2 DAY AS a_start,
                   CAST(d AS TIMESTAMP) + INTERVAL 3 DAY AS a_end
            FROM daily ORDER BY total DESC, d ASC LIMIT 4),
        md AS (
            SELECT event_type AS metric, CAST(ts AS DATE) AS d, COUNT(*) AS n
            FROM events GROUP BY 1, 2),
        burst AS (
            SELECT metric,
                   CAST(d AS TIMESTAMP) - INTERVAL 1 DAY AS b_start,
                   CAST(d AS TIMESTAMP) + INTERVAL 2 DAY AS b_end
            FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY metric
                      ORDER BY n DESC, d ASC) AS rn FROM md)
            WHERE rn = 1)
        SELECT p.peak_day, b.metric,
               GREATEST(a_start, b_start) AS overlap_start,
               LEAST(a_end, b_end) AS overlap_end,
               CAST(epoch(LEAST(a_end, b_end))
                    - epoch(GREATEST(a_start, b_start)) AS DOUBLE) / 3600.0
                   AS overlap_hours
        FROM promo p JOIN burst b ON a_start < b_end AND b_start < a_end
    """
    o["rolling_median"] = """
        WITH daily AS (
            SELECT event_type AS series, CAST(ts AS DATE) AS day,
                   CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS value_sum
            FROM events GROUP BY 1, 2)
        SELECT series, day, value_sum,
               COUNT(*) OVER w AS n_window,
               quantile_cont(value_sum, 0.5) OVER w AS rolling_median
        FROM daily
        WINDOW w AS (PARTITION BY series ORDER BY day
                     ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    """
    # HW fold: 9-slot list state [l, b, s1..s7] — ring rotates left per
    # step so slot 3 is always the NEXT observation's seasonal; lv is
    # textually inlined (DuckDB 1.0 list_reduce struct lambdas
    # miscompile — same workaround as forecast_holt)
    o["forecast_hw"] = _GOLD_CTE + """
        , per AS (
            SELECT metric, MAX(metric_date) AS last_date,
                   list(CAST(value AS DOUBLE) ORDER BY metric_date) AS v
            FROM gold GROUP BY metric),
        seed AS (
            SELECT metric, last_date, v,
                   CASE WHEN len(v) >= 14 THEN
                       list_reduce(list_prepend(0.0, v[1:7]), (a, x) -> a + x) / 7.0
                   ELSE v[1] END AS l0,
                   CASE WHEN len(v) >= 14 THEN
                       (list_reduce(list_prepend(0.0, v[8:14]), (a, x) -> a + x) / 7.0
                        - list_reduce(list_prepend(0.0, v[1:7]), (a, x) -> a + x) / 7.0)
                       / 7.0
                   ELSE 0.0 END AS b0
            FROM per),
        st0 AS (
            SELECT metric, last_date,
                   CASE WHEN len(v) >= 14
                        THEN [l0, b0] || list_transform(v[1:7], x -> x - l0)
                        ELSE [l0, b0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0] END AS s0,
                   CASE WHEN len(v) >= 14 THEN v[8:] ELSE v[2:] END AS fold
            FROM seed),
        st AS (
            SELECT metric, last_date,
                   list_reduce(
                       [s0] || list_transform(fold, x -> [x]),
                       (a, x) -> [
                           0.5 * (x[1] - a[3]) + 0.5 * (a[1] + a[2]),
                           0.25 * ((0.5 * (x[1] - a[3]) + 0.5 * (a[1] + a[2]))
                                   - a[1]) + 0.75 * a[2],
                           a[4], a[5], a[6], a[7], a[8], a[9],
                           0.25 * (x[1] - (0.5 * (x[1] - a[3])
                                           + 0.5 * (a[1] + a[2])))
                               + 0.75 * a[3]
                       ]
                   ) AS s
            FROM st0)
        SELECT metric,
               last_date + CAST(t.k AS INTEGER) AS target_date,
               s[1] + CAST(t.k AS DOUBLE) * s[2] + s[((t.k - 1) % 7) + 3] AS yhat,
               s[1] + CAST(t.k AS DOUBLE) * s[2] + s[((t.k - 1) % 7) + 3] AS yhat_lower,
               s[1] + CAST(t.k AS DOUBLE) * s[2] + s[((t.k - 1) % 7) + 3] AS yhat_upper,
               'hw-add-0.1' AS model_version
        FROM st CROSS JOIN generate_series(1, 7) t(k)
    """
    o["graph_triangles"] = """
        WITH ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem),
        co AS (
            SELECT a.s AS sa, b.s AS sb, COUNT(*) AS c
            FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s GROUP BY 1, 2),
        both_dir AS (
            SELECT sa, sb, c FROM co
            UNION ALL SELECT sb, sa, c FROM co),
        knn AS (
            SELECT sa, sb FROM (
                SELECT sa, sb, ROW_NUMBER() OVER (PARTITION BY sa
                    ORDER BY c DESC, sb ASC) AS rn FROM both_dir)
            WHERE rn <= 8),
        canon AS (
            SELECT DISTINCT LEAST(sa, sb) AS a, GREATEST(sa, sb) AS b FROM knn),
        tri AS (
            SELECT e1.a AS x, e1.b AS y, e2.b AS z
            FROM canon e1
            JOIN canon e2 ON e2.a = e1.b
            JOIN canon e3 ON e3.a = e1.a AND e3.b = e2.b)
        SELECT node, COUNT(*) AS n_triangles FROM (
            SELECT x AS node FROM tri
            UNION ALL SELECT y FROM tri
            UNION ALL SELECT z FROM tri)
        GROUP BY 1
    """
    o["doc_keywords"] = _TEXT_CTE + """
        , ex AS (SELECT doc_id, unnest(toks) AS term FROM t),
        post AS (
            SELECT doc_id, term, COUNT(*) AS tf FROM ex
            WHERE term != '' GROUP BY 1, 2),
        dfc AS (SELECT term, COUNT(*) AS df FROM post GROUP BY 1),
        nd AS (SELECT COUNT(DISTINCT doc_id) AS n FROM documents),
        scored AS (
            SELECT p.doc_id, p.term, p.tf, f.df,
                   CAST(p.tf AS DOUBLE)
                       * (CAST(nd.n AS DOUBLE) / CAST(f.df AS DOUBLE)) AS score
            FROM post p JOIN dfc f USING (term) CROSS JOIN nd)
        SELECT doc_id, term, tf, df, score, rank FROM (
            SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                ORDER BY score DESC, term ASC) AS INTEGER) AS rank
            FROM scored)
        WHERE rank <= 3
    """
    o["sorted_neighborhood"] = """
        WITH keyed AS (
            SELECT p_partkey AS id, p_name AS name,
                   LOWER(TRIM(p_name)) AS key,
                   SUBSTR(LOWER(TRIM(p_name)), 1, 1) AS part
            FROM part),
        ranked AS (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY part
                ORDER BY key ASC, id ASC) AS rn FROM keyed),
        pairs AS (
            SELECT LEAST(a.id, b.id) AS id_a, GREATEST(a.id, b.id) AS id_b,
                   levenshtein(a.name, b.name) AS distance
            FROM ranked a JOIN ranked b
              ON a.part = b.part AND b.rn BETWEEN a.rn + 1 AND a.rn + 3)
        SELECT id_a, id_b, MIN(distance) AS distance
        FROM pairs WHERE id_a < id_b AND distance <= 10
        GROUP BY 1, 2
    """
    o["compaction_plan"] = """
        WITH assigned AS (
            SELECT source, doc_id, n_chars AS n_bytes,
                   CAST(FLOOR(COALESCE(SUM(n_chars) OVER (PARTITION BY source
                       ORDER BY n_chars DESC, doc_id ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       / 65536) AS BIGINT) AS bin
            FROM documents)
        SELECT source, bin, COUNT(*) AS n_files,
               SUM(n_bytes) AS total_bytes,
               SUM(n_bytes) / COUNT(*) AS avg_file_bytes
        FROM assigned GROUP BY 1, 2
    """
    o["late_arrival"] = """
        WITH arr AS (
            -- FLOOR(epoch) = whole seconds: Spark's unix_timestamp
            -- truncates; DuckDB's epoch keeps the µs fraction
            SELECT event_type, event_id,
                   CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec,
                   CAST(FLOOR(epoch(ts)) AS BIGINT)
                       + ('0x' || substr(md5(CAST(event_id AS VARCHAR)),
                           1, 15))::BIGINT % 120 AS arrival
            FROM events),
        lat AS (
            SELECT event_type,
                   GREATEST(0, COALESCE(MAX(sec) OVER (
                       PARTITION BY event_type ORDER BY arrival ASC, event_id ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       sec) - sec) AS late_s
            FROM arr)
        SELECT event_type, COUNT(*) AS n_events,
               SUM(CASE WHEN late_s > 0 THEN 1 ELSE 0 END) AS n_late,
               SUM(CASE WHEN late_s > 0 THEN 1 ELSE 0 END)
                   / CAST(COUNT(*) AS DOUBLE) AS late_frac,
               MAX(late_s) AS max_lateness_s,
               CAST(SUM(CASE WHEN late_s > 0 THEN late_s ELSE 0 END) AS DOUBLE)
                   / NULLIF(CAST(SUM(CASE WHEN late_s > 0 THEN 1 ELSE 0 END)
                                 AS DOUBLE), 0.0) AS avg_lateness_s
        FROM lat GROUP BY 1
    """
    o["skyline_parts"] = """
        SELECT p_partkey, p_brand, p_retailprice, p_size FROM part p
        WHERE NOT EXISTS (
            SELECT 1 FROM part o WHERE o.p_brand = p.p_brand
              AND o.p_retailprice <= p.p_retailprice
              AND o.p_size >= p.p_size
              AND (o.p_retailprice < p.p_retailprice OR o.p_size > p.p_size))
    """
    # BPE: unrolled 6-round merge chain, generated — per round the SAME
    # pair count / argmax tie-break / two-pass literal replace as the
    # Spark trainer (functions/bpe.py); literal replace is engine-
    # portable where regex lookaround (absent in RE2) is not
    _bpe_rounds = 6
    _bpe = [_TEXT_CTE + """
        , wx AS (SELECT unnest(toks) AS word FROM t),
        vocab AS (SELECT word, COUNT(*) AS cnt FROM wx
                  WHERE word != '' GROUP BY 1),
        v0 AS (SELECT regexp_replace(word, '(.)', '\\1 ', 'g') || '</w>' AS seg,
                      cnt FROM vocab)"""]
    for r in range(1, _bpe_rounds + 1):
        _bpe.append(f"""
        , p{r} AS (
            SELECT t{r}.pr.a AS a, t{r}.pr.b AS b, SUM(v.cnt) AS n
            FROM (SELECT list_transform(
                      range(1, len(string_split(seg, ' '))),
                      i -> {{'a': string_split(seg, ' ')[i],
                            'b': string_split(seg, ' ')[i + 1]}}) AS prs,
                      cnt
                  FROM v{r - 1}) v, UNNEST(v.prs) AS t{r}(pr)
            GROUP BY 1, 2),
        b{r} AS (SELECT a, b, n FROM p{r}
                 ORDER BY n DESC, a ASC, b ASC LIMIT 1),
        v{r} AS (
            SELECT trim(replace(replace(' ' || seg || ' ',
                       ' ' || b{r}.a || ' ' || b{r}.b || ' ',
                       ' ' || b{r}.a || b{r}.b || ' '),
                       ' ' || b{r}.a || ' ' || b{r}.b || ' ',
                       ' ' || b{r}.a || b{r}.b || ' ')) AS seg, cnt
            FROM v{r - 1}, b{r})""")
    _bpe.append(
        "\n        "
        + "\n        UNION ALL ".join(
            f"""SELECT {r} AS "round", a AS "left", b AS "right",
                a || b AS merged, n AS pair_count FROM b{r}"""
            for r in range(1, _bpe_rounds + 1)
        )
    )
    o["bpe_merges"] = "".join(_bpe)
    # encode oracle: the same unrolled 6-round chain, but the per-word
    # segmentation rides through every round (s0..s6 keep the word
    # column) and the corpus re-joins it per doc occurrence at the end
    _enc = [_TEXT_CTE + """
        , wx AS (SELECT doc_id, unnest(toks) AS word FROM t),
        vocab AS (SELECT word, COUNT(*) AS cnt FROM wx
                  WHERE word != '' GROUP BY 1),
        s0 AS (SELECT word,
                      regexp_replace(word, '(.)', '\\1 ', 'g') || '</w>' AS seg,
                      cnt FROM vocab)"""]
    for r in range(1, _bpe_rounds + 1):
        _enc.append(f"""
        , q{r} AS (
            SELECT t{r}.pr.a AS a, t{r}.pr.b AS b, SUM(v.cnt) AS n
            FROM (SELECT list_transform(
                      range(1, len(string_split(seg, ' '))),
                      i -> {{'a': string_split(seg, ' ')[i],
                            'b': string_split(seg, ' ')[i + 1]}}) AS prs,
                      cnt
                  FROM s{r - 1}) v, UNNEST(v.prs) AS t{r}(pr)
            GROUP BY 1, 2),
        c{r} AS (SELECT a, b FROM q{r}
                 ORDER BY n DESC, a ASC, b ASC LIMIT 1),
        s{r} AS (
            SELECT word, trim(replace(replace(' ' || seg || ' ',
                       ' ' || c{r}.a || ' ' || c{r}.b || ' ',
                       ' ' || c{r}.a || c{r}.b || ' '),
                       ' ' || c{r}.a || ' ' || c{r}.b || ' ',
                       ' ' || c{r}.a || c{r}.b || ' ')) AS seg, cnt
            FROM s{r - 1}, c{r})""")
    _enc.append(f"""
        , enc AS (
            SELECT w.doc_id, s.seg
            FROM wx w JOIN s{_bpe_rounds} s USING (word)
            WHERE w.word != '')
        SELECT doc_id, COUNT(*) AS n_words,
               CAST(SUM(len(string_split(seg, ' '))) AS BIGINT) AS n_pieces,
               CAST(SUM(len(string_split(seg, ' '))) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE) AS pieces_per_word
        FROM enc GROUP BY doc_id""")
    o["bpe_encode"] = "".join(_enc)
    # the fast (driver-side incremental) trainer is defined to produce the
    # IDENTICAL merge table — same oracle, independently proven
    o["bpe_merges_fast"] = o["bpe_merges"]

    # salted_join's oracle IS the plain join — identical output proves
    # the salting is pure partitioning, zero semantic change
    o["salted_join"] = """
        SELECT c.c_mktsegment,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(28,4))) AS DOUBLE)
                   AS total_price
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1
    """
    o["ann_truncation_recall"] = _EMB_CTE + """
        , q AS (SELECT vec_id AS query_id, v AS qv, n AS qn FROM e
                WHERE vec_id % 50 = 0),
        full_scored AS (
            SELECT q.query_id, e.vec_id AS neighbor_id,
                   """ + _DOT.format(a="q.qv", b="e.v") + """ / (q.qn * e.n) AS cos_sim
            FROM e CROSS JOIN q WHERE e.vec_id != q.query_id),
        full_tk AS (
            SELECT query_id, neighbor_id FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
                FROM full_scored) WHERE rank <= 10),
        h AS (SELECT vec_id, v[1:32] AS v,
                     SQRT(list_reduce(list_transform(v[1:32],
                          x -> x::DOUBLE * x::DOUBLE), (x, y) -> x + y)) AS n
              FROM e),
        hq AS (SELECT vec_id AS query_id, v AS qv, n AS qn FROM h
               WHERE vec_id % 50 = 0),
        half_scored AS (
            SELECT hq.query_id, h.vec_id AS neighbor_id,
                   """ + _DOT.format(a="hq.qv", b="h.v") + """ / (hq.qn * h.n) AS cos_sim
            FROM h CROSS JOIN hq WHERE h.vec_id != hq.query_id),
        half_tk AS (
            SELECT query_id, neighbor_id FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
                FROM half_scored) WHERE rank <= 10),
        overlap AS (
            SELECT f.query_id, COUNT(*) AS n_overlap
            FROM full_tk f JOIN half_tk USING (query_id, neighbor_id)
            GROUP BY 1)
        SELECT q.query_id,
               COALESCE(o.n_overlap, 0) AS n_overlap,
               COALESCE(o.n_overlap, 0) / 10.0 AS recall_at_10
        FROM (SELECT DISTINCT query_id FROM full_tk) q
        LEFT JOIN overlap o USING (query_id)
    """
    o["pseudonymize"] = """
        SELECT ('0x' || substr(md5('pseud-v1:' || CAST(user_id AS VARCHAR)),
                    1, 15))::BIGINT AS user_token,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS value_sum
        FROM events GROUP BY 1
    """
    o["k_anonymity"] = """
        WITH classes AS (
            SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS c
            FROM events GROUP BY 1, 2)
        SELECT SUM(c) AS n_rows,
               COUNT(*) AS n_classes,
               MIN(c) AS min_class_size,
               SUM(CASE WHEN c < 5 THEN c ELSE 0 END) AS n_rows_below_k,
               SUM(CASE WHEN c < 5 THEN c ELSE 0 END)
                   / CAST(SUM(c) AS DOUBLE) AS frac_below_k,
               MIN(c) >= 5 AS k_anonymous
        FROM classes
    """
    # per-column hash, NULL → 0, position-weighted sum mod 2^31-1 —
    # mirrors operators/quality.py partition_checksums row encoding
    o["partition_checksums"] = """
        SELECT CAST(ts AS DATE) AS part, COUNT(*) AS n_rows,
               SUM((
                 1 * COALESCE(('0x' || substr(md5(CAST(event_id AS VARCHAR)),
                     1, 15))::BIGINT % 2147483647, 0)
               + 2 * COALESCE(('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                     1, 15))::BIGINT % 2147483647, 0)
               + 3 * COALESCE(('0x' || substr(md5(event_type),
                     1, 15))::BIGINT % 2147483647, 0)
               ) % 2147483647) AS id_checksum,
               CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS value_sum
        FROM events GROUP BY 1
    """

    o["revenue_cube"] = """
        WITH base AS (
            SELECT n.n_name AS nation,
                   CAST(YEAR(o.o_orderdate) AS INTEGER) AS order_year,
                   l.l_extendedprice * (1 - l.l_discount) AS rev
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey)
        SELECT nation, order_year,
               CAST(2 * GROUPING(nation) + GROUPING(order_year) AS INTEGER) AS gid,
               CAST(SUM(CAST(rev AS DECIMAL(38,4))) AS DOUBLE) AS revenue,
               COUNT(*) AS n_lines
        FROM base GROUP BY CUBE(nation, order_year)
    """

    # Mann–Kendall: S and tie counts are exact integers; tau/var/z are
    # single IEEE divisions/sqrt of those integers — bit-exact.
    o["mann_kendall"] = """
        WITH daily AS (
            SELECT event_type AS metric, CAST(ts AS DATE) AS d,
                   CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS y
            FROM events GROUP BY 1, 2),
        s AS (
            SELECT a.metric,
                   CAST(SUM(CAST(SIGN(b.y - a.y) AS BIGINT)) AS BIGINT) AS s_stat
            FROM daily a JOIN daily b
              ON b.metric = a.metric AND a.d < b.d
            GROUP BY a.metric),
        ties AS (
            SELECT metric,
                   SUM(t * (t - 1) * (2 * t + 5)) AS tie_term
            FROM (SELECT metric, y, COUNT(*) AS t FROM daily GROUP BY 1, 2) g
            GROUP BY metric),
        n AS (SELECT metric, COUNT(*) AS n_days FROM daily GROUP BY metric)
        SELECT n.metric, n.n_days,
               COALESCE(s.s_stat, 0) AS s_stat,
               CASE WHEN n.n_days > 1
                    THEN COALESCE(s.s_stat, 0)
                         / (n.n_days * (n.n_days - 1) / 2.0) END AS tau,
               CAST(n.n_days * (n.n_days - 1) * (2 * n.n_days + 5)
                    - ties.tie_term AS DOUBLE) / 18.0 AS var_s,
               CASE WHEN CAST(n.n_days * (n.n_days - 1) * (2 * n.n_days + 5)
                         - ties.tie_term AS DOUBLE) / 18.0 > 0.0
                    THEN CASE
                        WHEN COALESCE(s.s_stat, 0) > 0 THEN
                            (COALESCE(s.s_stat, 0) - 1)
                            / SQRT(CAST(n.n_days * (n.n_days - 1)
                                * (2 * n.n_days + 5) - ties.tie_term
                                AS DOUBLE) / 18.0)
                        WHEN COALESCE(s.s_stat, 0) < 0 THEN
                            (COALESCE(s.s_stat, 0) + 1)
                            / SQRT(CAST(n.n_days * (n.n_days - 1)
                                * (2 * n.n_days + 5) - ties.tie_term
                                AS DOUBLE) / 18.0)
                        ELSE 0.0 END
               END AS z
        FROM n LEFT JOIN s ON s.metric = n.metric
        JOIN ties ON ties.metric = n.metric
    """

    # Random projection: the sign matrix regenerates from the portable
    # md5-h60 of 'i:j:seed' (0-based i,j); terms fold in i order —
    # list_reduce's first-element seed == Spark's 0.0 seed (0.0+x == x).
    o["random_projection"] = f"""
        WITH sgn AS (
            SELECT i.range AS i, j.range AS j,
                   CASE WHEN {_H60.format(expr="(i.range || ':' || j.range || ':' || 7)")} % 2 = 0
                        THEN CAST(1.0 AS DOUBLE)
                        ELSE CAST(-1.0 AS DOUBLE) END AS s
            FROM range(64) i CROSS JOIN range(16) j),
        ex AS (
            SELECT e.vec_id, r.range AS i,
                   list_extract(e.embedding, r.range + 1) AS x
            FROM embeddings e CROSS JOIN range(64) r),
        terms AS (
            SELECT ex.vec_id, sgn.j,
                   list(ex.x * sgn.s ORDER BY ex.i) AS xs
            FROM ex JOIN sgn ON sgn.i = ex.i
            GROUP BY ex.vec_id, sgn.j)
        SELECT vec_id, CAST(j AS INTEGER) AS j,
               list_reduce(xs, (a, x) -> a + x) * (1.0 / SQRT(16.0)) AS proj
        FROM terms
    """

    o["interpolate_linear"] = """
        WITH daily AS (
            SELECT event_type AS series, CAST(ts AS DATE) AS day,
                   CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE)
                       AS observed
            FROM events GROUP BY 1, 2),
        b AS (SELECT series, MIN(day) AS d0, MAX(day) AS d1
              FROM daily GROUP BY series),
        spine AS (
            SELECT series,
                   CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                        CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE)
                       AS day
            FROM b),
        j AS (
            SELECT s.series, s.day, d.observed
            FROM spine s LEFT JOIN daily d
              ON d.series = s.series AND d.day = s.day),
        n AS (
            SELECT series, day, observed,
               last_value(observed IGNORE NULLS) OVER wb AS pv,
               last_value(CASE WHEN observed IS NOT NULL THEN day END
                   IGNORE NULLS) OVER wb AS pd,
               first_value(observed IGNORE NULLS) OVER wf AS nv,
               first_value(CASE WHEN observed IS NOT NULL THEN day END
                   IGNORE NULLS) OVER wf AS nd
            FROM j
            WINDOW wb AS (PARTITION BY series ORDER BY day ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wf AS (PARTITION BY series ORDER BY day ASC
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        SELECT series, day, observed,
               CASE WHEN observed IS NOT NULL THEN observed
                    ELSE pv + (nv - pv)
                         * (CAST(datediff('day', pd, day) AS DOUBLE)
                            / CAST(datediff('day', pd, nd) AS DOUBLE))
               END AS value_interp,
               observed IS NULL AS is_imputed
        FROM n
    """

    o["debounce_dedup"] = """
        WITH w AS (
            SELECT *,
                   epoch(ts) - lag(epoch(ts)) OVER (
                       PARTITION BY user_id, event_type, value
                       ORDER BY ts ASC, event_id ASC) AS gap
            FROM events),
        m AS (
            SELECT *,
                   SUM(CASE WHEN gap IS NULL OR gap > 60 THEN 1 ELSE 0 END)
                       OVER (PARTITION BY user_id, event_type, value
                             ORDER BY ts ASC, event_id ASC
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS island
            FROM w),
        isl AS (
            SELECT user_id, event_type, value, island,
                   COUNT(*) - 1 AS n_suppressed
            FROM m GROUP BY 1, 2, 3, 4)
        SELECT event_type,
               COUNT(*) AS n_survivors,
               CAST(SUM(n_suppressed) AS BIGINT) AS n_suppressed
        FROM isl GROUP BY event_type ORDER BY event_type
    """

    # Fernet tokens are not computable in DuckDB (no AES) — what the
    # oracle CAN pin is the roundtrip identity on every row; the token
    # BYTES are pinned by tests/test_fernet.py's from-scratch AES
    o["fernet_roundtrip"] = """
        SELECT event_type, COUNT(*) AS n,
               CAST(COUNT(*) AS BIGINT) AS n_roundtrip_ok
        FROM events GROUP BY event_type ORDER BY event_type
    """

    o["gif_pixel_decode"] = """
        WITH base AS (
            SELECT doc_id,
                   doc_id % 13 + 1 AS w,
                   doc_id % 11 + 1 AS h,
                   doc_id % 63 + 2 AS ncol
            FROM documents),
        px AS (
            SELECT doc_id, w, h,
                   ((doc_id * 31 + j.range * 7) % ncol * 41
                       + k.range) % 256 AS v,
                   j.range * 3 + k.range AS bytepos
            FROM base
            CROSS JOIN range(0, 143) j
            CROSS JOIN range(0, 3) k
            WHERE j.range < w * h),
        sums AS (
            SELECT doc_id, CAST(SUM(v) AS BIGINT) AS pixel_sum
            FROM px GROUP BY doc_id)
        SELECT b.doc_id,
               CAST(b.w AS INTEGER) AS width,
               CAST(b.h AS INTEGER) AS height,
               CAST(3 AS INTEGER) AS n_channels,
               s.pixel_sum,
               CAST((b.doc_id * 31) % b.ncol * 41 % 256 AS BIGINT)
                   AS first_px,
               CAST(((b.doc_id * 31 + (b.w * b.h - 1) * 7) % b.ncol * 41
                    + 2) % 256 AS BIGINT) AS last_px
        FROM base b JOIN sums s ON s.doc_id = b.doc_id
    """

    o["wav_sample_decode"] = """
        WITH base AS (
            SELECT doc_id, doc_id % 50 + 10 AS n FROM documents),
        px AS (
            SELECT doc_id, j.range AS j,
                   ((doc_id * 37 + j.range * 11) % 4001) - 2000 AS c
            FROM base CROSS JOIN range(0, 60) j
            WHERE j.range < n),
        sgn AS (
            SELECT doc_id,
                   list(CASE WHEN c > 0 THEN 1 ELSE -1 END ORDER BY j)
                       FILTER (c <> 0) AS sl
            FROM px GROUP BY doc_id)
        SELECT b.doc_id,
               CAST(b.doc_id % 2 + 1 AS INTEGER) AS channels,
               CAST(8000 AS INTEGER) AS sample_rate,
               CAST(b.n AS BIGINT) AS n_frames,
               CAST(SUM(p.c) AS BIGINT) AS code_sum,
               CAST(SUM(p.c * p.c) AS BIGINT) AS code_sq_sum,
               CAST(MAX(ABS(p.c)) AS BIGINT) AS peak_code,
               CAST(COALESCE(len(list_filter(range(1, len(MAX(g.sl))),
                    i -> MAX(g.sl)[i] <> MAX(g.sl)[i + 1])), 0) AS BIGINT)
                   AS zero_crossings
        FROM base b
        JOIN px p ON p.doc_id = b.doc_id
        JOIN sgn g ON g.doc_id = b.doc_id
        GROUP BY b.doc_id, b.n
    """

    # round 9 — HLL register family. The oracle rebuilds every register
    # from the same portable md5-h60 hash (bucket = top 8 of 60 bits,
    # rho = 53 − bit_length of the low 52 bits via DuckDB bin(), the
    # twin of Spark's conv(…,10,2) length), so the hash compare pins
    # the REGISTERS, the integer z_num = Σ2^(53−rho) (+2^53 per empty
    # bucket), and the single-division raw estimate with the identical
    # Python-precomputed double constant 4.2399330249068963e+20
    # (= α·m²·2^53, α = 0.7213/(1+1.079/256)).
    _HLL_REG = """
        SELECT {by} h >> 52 AS bucket,
               CAST(MAX(CASE WHEN (h & ((1::BIGINT << 52) - 1)) = 0 THEN 53
                        ELSE 53 - length(bin(h & ((1::BIGINT << 52) - 1)))
                        END) AS INT) AS rho
        FROM (
            SELECT {src_by}
                   ('0x' || substr(md5('hll-v1:' || CAST({key} AS VARCHAR)),
                                   1, 15))::BIGINT AS h
            FROM events WHERE {key} IS NOT NULL
        ) GROUP BY {by} bucket
    """
    _HLL_RAW = """
        SELECT {by}
               buckets_used,
               CAST(256 - buckets_used AS BIGINT) AS v_empty,
               CAST(z_present + (256 - buckets_used) * (1::BIGINT << 53)
                    AS BIGINT) AS z_num,
               4.2399330249068963e+20
                   / CAST(z_present + (256 - buckets_used)
                          * (1::BIGINT << 53) AS DOUBLE) AS raw_est,
               ((256 - buckets_used) > 0
                AND 4.2399330249068963e+20
                    / CAST(z_present + (256 - buckets_used)
                           * (1::BIGINT << 53) AS DOUBLE) <= 640.0)
                   AS small_range
        FROM (
            SELECT {by}
                   CAST(COUNT(*) AS BIGINT) AS buckets_used,
                   CAST(SUM(1::BIGINT << (53 - rho)) AS BIGINT) AS z_present
            FROM ({reg}) {groupby}
        )
    """
    o["hll_registers"] = _HLL_REG.format(
        by="day,",
        src_by="CAST(ts AS DATE) AS day,",
        key="user_id",
    )
    o["hll_merge_distinct"] = _HLL_RAW.format(
        by="",
        groupby="",
        reg=_HLL_REG.format(by="", src_by="", key="user_id"),
    )
    o["hll_raw_by_type"] = _HLL_RAW.format(
        by="event_type,",
        groupby="GROUP BY event_type",
        reg=_HLL_REG.format(
            by="event_type,", src_by="event_type,", key="event_id"
        ),
    )
    # monthly distinct from daily partials == direct whole-month sketch
    # (merge identity); period = first-of-month DATE on both engines
    o["kpi_monthly_distinct"] = _HLL_RAW.format(
        by="period, event_type,",
        groupby="GROUP BY period, event_type",
        reg=_HLL_REG.format(
            by="period, event_type,",
            src_by="CAST(date_trunc('month', CAST(ts AS DATE)) AS DATE)"
            " AS period, event_type,",
            key="user_id",
        ),
    )
    # round 9 — Count-Min grid + point lookup, cell-for-cell from the
    # salted per-row md5 hashes (cell = h60('cms-v1:row:key') % 256).
    _CMS = """
        SELECT r.row,
               (('0x' || substr(md5('cms-v1:' || CAST(r.row AS VARCHAR)
                                    || ':' || e.event_type), 1, 15))::BIGINT)
                   % 256 AS cell,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events e
        CROSS JOIN (SELECT UNNEST(generate_series(0, 3)) AS row) r
        WHERE e.event_type IS NOT NULL
        GROUP BY 1, 2
    """
    o["cms_grid"] = _CMS
    o["cms_heavy_lookup"] = f"""
        WITH cms AS ({_CMS}),
        probes AS (SELECT DISTINCT event_type FROM events
                   WHERE event_type IS NOT NULL),
        addressed AS (
            SELECT p.event_type, r.row,
                   (('0x' || substr(md5('cms-v1:' || CAST(r.row AS VARCHAR)
                                        || ':' || p.event_type),
                                    1, 15))::BIGINT) % 256 AS cell
            FROM probes p
            CROSS JOIN (SELECT UNNEST(generate_series(0, 3)) AS row) r
        )
        SELECT a.event_type, CAST(MIN(COALESCE(c.n, 0)) AS BIGINT) AS est
        FROM addressed a LEFT JOIN cms c USING (row, cell)
        GROUP BY a.event_type
    """
    # round 9 — KMV/bottom-k: exact order statistics of the distinct
    # salted-md5 hashes (ROW_NUMBER over DISTINCT h), so the sketch,
    # the (k−1)·2^60/h_k estimator (constant 7.263405479023136e+19 for
    # k=64, precomputed in Python and embedded identically in Spark),
    # and the intersection's integer membership counts all hash-match.
    _KMV_SK = """
        SELECT {by} pos, h FROM (
            SELECT {by} h,
                   ROW_NUMBER() OVER ({part} ORDER BY h) AS pos
            FROM (
                SELECT DISTINCT {by}
                       ('0x' || substr(md5('kmv-v1:'
                                           || CAST(user_id AS VARCHAR)),
                                       1, 15))::BIGINT AS h
                FROM events WHERE user_id IS NOT NULL {filt}
            )
        ) WHERE pos <= 64
    """
    o["kmv_sketch"] = _KMV_SK.format(
        by="event_type,", part="PARTITION BY event_type", filt=""
    )
    o["kmv_distinct_by_type"] = f"""
        SELECT event_type,
               n_vals,
               kth_h,
               CASE WHEN n_vals < 64 THEN CAST(n_vals AS DOUBLE)
                    ELSE 7.263405479023136e+19 / CAST(kth_h AS DOUBLE)
               END AS est,
               n_vals < 64 AS exact
        FROM (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_vals,
                   MAX(CASE WHEN pos = 64 THEN h END) AS kth_h
            FROM ({o["kmv_sketch"]})
            GROUP BY event_type
        )
    """
    _KMV_A = _KMV_SK.format(
        by="", part="", filt="AND event_type = 'purchase'"
    )
    _KMV_B = _KMV_SK.format(
        by="", part="", filt="AND event_type = 'click'"
    )
    def _kmv_ovl(sa_sql: str, sb_sql: str) -> str:
        return f"""
        WITH sa AS ({sa_sql}),
        sb AS ({sb_sql}),
        u AS (
            SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS pos
            FROM (SELECT DISTINCT h FROM (
                SELECT h FROM sa UNION ALL SELECT h FROM sb))
        ),
        s AS (SELECT pos, h FROM u WHERE pos <= 64),
        agg AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS union_n_vals,
                   MAX(CASE WHEN pos = 64 THEN h END) AS union_kth_h
            FROM s
        ),
        m AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_match FROM s
            WHERE h IN (SELECT h FROM sa) AND h IN (SELECT h FROM sb)
        )
        SELECT union_n_vals, union_kth_h,
               CASE WHEN union_n_vals < 64 THEN CAST(union_n_vals AS DOUBLE)
                    ELSE 7.263405479023136e+19 / CAST(union_kth_h AS DOUBLE)
               END AS union_est,
               n_match,
               CAST(n_match AS DOUBLE) / CAST(union_n_vals AS DOUBLE)
                   AS jaccard_est,
               (CAST(n_match AS DOUBLE) / CAST(union_n_vals AS DOUBLE))
               * (CASE WHEN union_n_vals < 64
                       THEN CAST(union_n_vals AS DOUBLE)
                       ELSE 7.263405479023136e+19
                            / CAST(union_kth_h AS DOUBLE) END) AS inter_est
        FROM agg, m
    """

    o["kmv_audience_overlap"] = _kmv_ovl(_KMV_A, _KMV_B)
    # round 10 — store range read: fold-of-daily-bottom-k == direct
    # bottom-k of the range, so the oracle sketches the date-filtered
    # events directly with the same estimator constants
    _STORE_RANGE = ("AND CAST(ts AS DATE) BETWEEN DATE '2024-01-08' "
                    "AND DATE '2024-01-21'")
    o["kmv_overlap_store"] = _kmv_ovl(
        _KMV_SK.format(
            by="", part="",
            filt=f"AND event_type = 'purchase' {_STORE_RANGE}",
        ),
        _KMV_SK.format(
            by="", part="",
            filt=f"AND event_type = 'click' {_STORE_RANGE}",
        ),
    )
    # round 10 — HLL store range read: register max-fold of stored
    # daily partials == direct registers of the date range
    o["distinct_from_store"] = _HLL_RAW.format(
        by="event_type,",
        groupby="GROUP BY event_type",
        reg=f"""
        SELECT event_type, h >> 52 AS bucket,
               CAST(MAX(CASE WHEN (h & ((1::BIGINT << 52) - 1)) = 0 THEN 53
                        ELSE 53 - length(bin(h & ((1::BIGINT << 52) - 1)))
                        END) AS INT) AS rho
        FROM (
            SELECT event_type,
                   ('0x' || substr(md5('hll-v1:' || CAST(user_id AS VARCHAR)),
                                   1, 15))::BIGINT AS h
            FROM events WHERE user_id IS NOT NULL {_STORE_RANGE}
        ) GROUP BY event_type, bucket
    """,
    )
    # r11 — identical answer through the snapshot-table backend
    o["distinct_from_store_snapshot"] = o["distinct_from_store"]
    # r11 — the store as a CDC-maintained materialized view of silver:
    # full-range read, minus the day the correction deleted
    o["hll_store_cdc_refresh"] = _HLL_RAW.format(
        by="metric,",
        groupby="GROUP BY metric",
        reg="""
        SELECT metric, h >> 52 AS bucket,
               CAST(MAX(CASE WHEN (h & ((1::BIGINT << 52) - 1)) = 0 THEN 53
                        ELSE 53 - length(bin(h & ((1::BIGINT << 52) - 1)))
                        END) AS INT) AS rho
        FROM (
            SELECT event_type AS metric,
                   ('0x' || substr(md5('hll-v1:' || CAST(user_id AS VARCHAR)),
                                   1, 15))::BIGINT AS h
            FROM events
            WHERE user_id IS NOT NULL
              AND CAST(ts AS DATE) <> DATE '2024-01-15'
        ) GROUP BY metric, bucket
    """,
    )
    # round 10 — rolling trailing-7-day distinct from the store: the
    # oracle sketches every window directly (register max-fold makes
    # the per-day points bit-identical); day spine via generate_series
    o["rolling_distinct_store"] = _HLL_RAW.format(
        by="day,",
        groupby="GROUP BY day",
        reg="""
        SELECT d.day, h >> 52 AS bucket,
               CAST(MAX(CASE WHEN (h & ((1::BIGINT << 52) - 1)) = 0 THEN 53
                        ELSE 53 - length(bin(h & ((1::BIGINT << 52) - 1)))
                        END) AS INT) AS rho
        FROM (SELECT CAST(UNNEST(generate_series(DATE '2024-01-08',
                     DATE '2024-01-21', INTERVAL 1 DAY)) AS DATE) AS day) d
        JOIN (
            SELECT CAST(ts AS DATE) AS ed,
                   ('0x' || substr(md5('hll-v1:' || CAST(user_id AS VARCHAR)),
                                   1, 15))::BIGINT AS h
            FROM events WHERE user_id IS NOT NULL
        ) e ON e.ed BETWEEN d.day - INTERVAL 6 DAY AND d.day
        GROUP BY d.day, bucket
    """,
    )
    # round 10 — new-audience difference from the KMV store: cur-range
    # sketch minus prev-range sketch, same estimator constants
    _KMV_CUR = _KMV_SK.format(
        by="", part="",
        filt=("AND event_type = 'purchase' AND CAST(ts AS DATE) "
              "BETWEEN DATE '2024-01-08' AND DATE '2024-01-14'"),
    )
    _KMV_PREV = _KMV_SK.format(
        by="", part="",
        filt=("AND event_type = 'purchase' AND CAST(ts AS DATE) "
              "BETWEEN DATE '2024-01-01' AND DATE '2024-01-07'"),
    )
    o["kmv_new_audience_store"] = f"""
        WITH sa AS ({_KMV_CUR}),
        sb AS ({_KMV_PREV}),
        u AS (
            SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS pos
            FROM (SELECT DISTINCT h FROM (
                SELECT h FROM sa UNION ALL SELECT h FROM sb))
        ),
        s AS (SELECT pos, h FROM u WHERE pos <= 64),
        agg AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS union_n_vals,
                   MAX(CASE WHEN pos = 64 THEN h END) AS union_kth_h
            FROM s
        ),
        m AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_only_a FROM s
            WHERE h IN (SELECT h FROM sa)
              AND h NOT IN (SELECT h FROM sb)
        )
        SELECT union_n_vals, union_kth_h,
               CASE WHEN union_n_vals < 64 THEN CAST(union_n_vals AS DOUBLE)
                    ELSE 7.263405479023136e+19 / CAST(union_kth_h AS DOUBLE)
               END AS union_est,
               n_only_a,
               CAST(n_only_a AS DOUBLE) / CAST(union_n_vals AS DOUBLE)
                   AS only_a_frac,
               (CAST(n_only_a AS DOUBLE) / CAST(union_n_vals AS DOUBLE))
               * (CASE WHEN union_n_vals < 64
                       THEN CAST(union_n_vals AS DOUBLE)
                       ELSE 7.263405479023136e+19
                            / CAST(union_kth_h AS DOUBLE) END) AS diff_est
        FROM agg, m
    """
    # round 10 — Bloom store range read: daily-word bit_or == direct
    # words of the range (same bits, associative OR); probes = every
    # distinct user, filter = purchases in the range
    o["bloom_membership_store"] = f"""
        WITH bloom AS (
            SELECT word, bit_or(mask) AS bits FROM (
                SELECT (h % 4096) // 60 AS word,
                       1::BIGINT << CAST((h % 4096) % 60 AS INT) AS mask
                FROM (
                    SELECT ('0x' || substr(md5('bloom-v1:'
                                || CAST(r.i AS VARCHAR) || ':'
                                || CAST(e.user_id AS VARCHAR)), 1, 15))::BIGINT
                               AS h
                    FROM events e
                    CROSS JOIN (SELECT UNNEST(generate_series(0, 3)) AS i) r
                    WHERE e.user_id IS NOT NULL
                      AND e.event_type = 'purchase' {_STORE_RANGE}
                )
            ) GROUP BY word
        ),
        probes AS (SELECT DISTINCT user_id FROM events
                   WHERE user_id IS NOT NULL),
        addr AS (
            SELECT user_id,
                   (h % 4096) // 60 AS word,
                   1::BIGINT << CAST((h % 4096) % 60 AS INT) AS mask
            FROM (
                SELECT p.user_id,
                       ('0x' || substr(md5('bloom-v1:'
                            || CAST(r.i AS VARCHAR) || ':'
                            || CAST(p.user_id AS VARCHAR)), 1, 15))::BIGINT
                           AS h
                FROM probes p
                CROSS JOIN (SELECT UNNEST(generate_series(0, 3)) AS i) r
            )
        )
        SELECT a.user_id,
               MIN(CASE WHEN (COALESCE(b.bits, 0) & a.mask) <> 0
                        THEN 1 ELSE 0 END) = 1 AS might_contain
        FROM addr a LEFT JOIN bloom b USING (word)
        GROUP BY a.user_id
    """
    # round 9 — dyadic-CMS quantile sketch: every counter cell from the
    # same salted md5 hashing (cell = h60('dcms-v1:level:row:key') %
    # 2048, key = clamped cents >> level); FLOOR (not CAST — DuckDB's
    # double→BIGINT cast rounds, Spark's truncates) keeps the integer
    # mapping identical.
    o["dyadic_sketch"] = """
        SELECT level, row,
               (('0x' || substr(md5('dcms-v1:' || CAST(level AS VARCHAR)
                    || ':' || CAST(row AS VARCHAR)
                    || ':' || CAST((v >> level) AS VARCHAR)),
                    1, 15))::BIGINT) % 2048 AS cell,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM (
            SELECT CASE WHEN v < 0 THEN 0
                        WHEN v > 65535 THEN 65535 ELSE v END AS v
            FROM (
                SELECT CAST(FLOOR(value * 100) AS BIGINT) AS v
                FROM events WHERE value IS NOT NULL
            )
        )
        CROSS JOIN (SELECT UNNEST(generate_series(0, 15)) AS level) l
        CROSS JOIN (SELECT UNNEST(generate_series(0, 3)) AS row) r
        GROUP BY 1, 2, 3
    """
    # round 10 — dyadic store range read: fold-of-daily-cells == direct
    # cells of the range (counting is additive)
    o["dyadic_range_store"] = f"""
        SELECT level, row,
               (('0x' || substr(md5('dcms-v1:' || CAST(level AS VARCHAR)
                    || ':' || CAST(row AS VARCHAR)
                    || ':' || CAST((v >> level) AS VARCHAR)),
                    1, 15))::BIGINT) % 2048 AS cell,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM (
            SELECT CASE WHEN v < 0 THEN 0
                        WHEN v > 65535 THEN 65535 ELSE v END AS v
            FROM (
                SELECT CAST(FLOOR(value * 100) AS BIGINT) AS v
                FROM events WHERE value IS NOT NULL {_STORE_RANGE}
            )
        )
        CROSS JOIN (SELECT UNNEST(generate_series(0, 15)) AS level) l
        CROSS JOIN (SELECT UNNEST(generate_series(0, 3)) AS row) r
        GROUP BY 1, 2, 3
    """
    # round 10 — per-series dyadic store range read: grouped cells of
    # the date range, rebuilt directly by the oracle
    o["dyadic_series_store"] = f"""
        SELECT event_type, level, row,
               (('0x' || substr(md5('dcms-v1:' || CAST(level AS VARCHAR)
                    || ':' || CAST(row AS VARCHAR)
                    || ':' || CAST((v >> level) AS VARCHAR)),
                    1, 15))::BIGINT) % 2048 AS cell,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM (
            SELECT event_type,
                   CASE WHEN v < 0 THEN 0
                        WHEN v > 65535 THEN 65535 ELSE v END AS v
            FROM (
                SELECT event_type, CAST(FLOOR(value * 100) AS BIGINT) AS v
                FROM events WHERE value IS NOT NULL {_STORE_RANGE}
            )
        )
        CROSS JOIN (SELECT UNNEST(generate_series(0, 15)) AS level) l
        CROSS JOIN (SELECT UNNEST(generate_series(0, 3)) AS row) r
        GROUP BY 1, 2, 3, 4
    """
    # round 10 — grouped dyadic-CMS: one grid per event_type, same
    # salted cell hashing as the global sketch
    o["dyadic_grouped"] = """
        SELECT event_type, level, row,
               (('0x' || substr(md5('dcms-v1:' || CAST(level AS VARCHAR)
                    || ':' || CAST(row AS VARCHAR)
                    || ':' || CAST((v >> level) AS VARCHAR)),
                    1, 15))::BIGINT) % 2048 AS cell,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM (
            SELECT event_type,
                   CASE WHEN v < 0 THEN 0
                        WHEN v > 65535 THEN 65535 ELSE v END AS v
            FROM (
                SELECT event_type, CAST(FLOOR(value * 100) AS BIGINT) AS v
                FROM events WHERE value IS NOT NULL
            )
        )
        CROSS JOIN (SELECT UNNEST(generate_series(0, 15)) AS level) l
        CROSS JOIN (SELECT UNNEST(generate_series(0, 3)) AS row) r
        GROUP BY 1, 2, 3, 4
    """
    # round 9 — semantic decontamination: same dot/norm fold order as
    # every cosine oracle; eval = vec_id % 37, bucketed join
    o["semantic_decontaminate"] = _EMB_CTE + """
        , ev AS (SELECT vec_id AS eid, v AS evv, n AS en, bucket FROM e
                 WHERE vec_id % 37 = 0),
        scored AS (
            SELECT e.vec_id,
                   """ + _DOT.format(a="e.v", b="ev.evv") + """
                       / (e.n * ev.en) AS cos_sim
            FROM e JOIN ev USING (bucket)
            WHERE e.vec_id != ev.eid),
        hits AS (
            SELECT vec_id, CAST(COUNT(*) AS BIGINT) AS n_eval_hits,
                   MAX(cos_sim) AS max_sim
            FROM scored WHERE cos_sim >= 0.25
            GROUP BY vec_id)
        SELECT e.vec_id,
               COALESCE(h.n_eval_hits, 0) AS n_eval_hits,
               h.max_sim,
               COALESCE(h.n_eval_hits, 0) > 0 AS contaminated
        FROM e LEFT JOIN hits h USING (vec_id)
    """
    # rollup cascade: every grain sketched DIRECTLY by the oracle — the
    # hash match proves the engine's register cascade (leaf → folded)
    # equals direct sketching at each level; gid per kpi_rollup (0
    # leaf, 1 day folded, 3 grand total)
    _HLL_RU_LEAF = _HLL_RAW.format(
        by="event_type, day,",
        groupby="GROUP BY event_type, day",
        reg=_HLL_REG.format(
            by="event_type, day,",
            src_by="event_type, CAST(ts AS DATE) AS day,",
            key="user_id",
        ),
    )
    _HLL_RU_TYPE = _HLL_RAW.format(
        by="event_type,",
        groupby="GROUP BY event_type",
        reg=_HLL_REG.format(
            by="event_type,", src_by="event_type,", key="user_id"
        ),
    )
    _HLL_RU_ALL = _HLL_RAW.format(
        by="",
        groupby="",
        reg=_HLL_REG.format(by="", src_by="", key="user_id"),
    )
    o["hll_rollup_distinct"] = f"""
        SELECT event_type, day, CAST(0 AS BIGINT) AS gid,
               buckets_used, v_empty, z_num, raw_est, small_range
        FROM ({_HLL_RU_LEAF})
        UNION ALL
        SELECT event_type, CAST(NULL AS DATE) AS day,
               CAST(1 AS BIGINT) AS gid,
               buckets_used, v_empty, z_num, raw_est, small_range
        FROM ({_HLL_RU_TYPE})
        UNION ALL
        SELECT CAST(NULL AS VARCHAR) AS event_type,
               CAST(NULL AS DATE) AS day, CAST(3 AS BIGINT) AS gid,
               buckets_used, v_empty, z_num, raw_est, small_range
        FROM ({_HLL_RU_ALL})
    """
    # round 9 — mergeable Bloom: 60-bit words (largest mask 1<<59 stays
    # positive in a signed BIGINT on both engines; DuckDB
    # overflow-checks 1<<63), bit position = h60('bloom-v1:i:key') % m,
    # word = pos // 60, bits = bit_or of masks — all exact integer ops.
    _BLOOM_WORDS = """
        SELECT word, bit_or(mask) AS bits FROM (
            SELECT (h % 4096) // 60 AS word,
                   1::BIGINT << CAST((h % 4096) % 60 AS INT) AS mask
            FROM (
                SELECT ('0x' || substr(md5('bloom-v1:'
                            || CAST(r.i AS VARCHAR) || ':'
                            || CAST(e.user_id AS VARCHAR)), 1, 15))::BIGINT
                           AS h
                FROM events e
                CROSS JOIN (SELECT UNNEST(generate_series(0, 3)) AS i) r
                WHERE e.user_id IS NOT NULL AND e.event_type = 'purchase'
            )
        ) GROUP BY word
    """
    o["bloom_words"] = _BLOOM_WORDS
    o["bloom_membership"] = f"""
        WITH bloom AS ({_BLOOM_WORDS}),
        probes AS (SELECT DISTINCT user_id FROM events
                   WHERE user_id IS NOT NULL),
        addr AS (
            SELECT user_id,
                   (h % 4096) // 60 AS word,
                   1::BIGINT << CAST((h % 4096) % 60 AS INT) AS mask
            FROM (
                SELECT p.user_id,
                       ('0x' || substr(md5('bloom-v1:'
                            || CAST(r.i AS VARCHAR) || ':'
                            || CAST(p.user_id AS VARCHAR)), 1, 15))::BIGINT
                           AS h
                FROM probes p
                CROSS JOIN (SELECT UNNEST(generate_series(0, 3)) AS i) r
            )
        )
        SELECT a.user_id,
               MIN(CASE WHEN (COALESCE(b.bits, 0) & a.mask) <> 0
                        THEN 1 ELSE 0 END) = 1 AS might_contain
        FROM addr a LEFT JOIN bloom b USING (word)
        GROUP BY a.user_id
    """
    # round 9 — char_diversity: exact per-(doc, char) integer counts,
    # then the same two IEEE float ops as Spark (one divide for the
    # top-char fraction; divide + subtract for Simpson). Empty/NULL
    # docs surface as explicit zero rows with NULL fractions.
    o["char_diversity"] = """
        WITH per AS (
            SELECT doc_id, c, CAST(COUNT(*) AS BIGINT) AS n
            FROM (
                SELECT doc_id, UNNEST(string_split(text, '')) AS c
                FROM documents WHERE text IS NOT NULL
            ) WHERE length(c) > 0
            GROUP BY doc_id, c
        ), agg AS (
            SELECT doc_id,
                   CAST(SUM(n) AS BIGINT) AS n_chars,
                   CAST(COUNT(*) AS BIGINT) AS distinct_chars,
                   MAX(n) AS mx,
                   CAST(SUM(n * n) AS BIGINT) AS sumsq
            FROM per GROUP BY doc_id
        )
        SELECT d.doc_id,
               COALESCE(a.n_chars, 0) AS n_chars,
               COALESCE(a.distinct_chars, 0) AS distinct_chars,
               CAST(a.mx AS DOUBLE) / CAST(a.n_chars AS DOUBLE)
                   AS top_char_fraction,
               1.0 - CAST(a.sumsq AS DOUBLE)
                   / CAST(a.n_chars * a.n_chars AS DOUBLE) AS simpson
        FROM documents d LEFT JOIN agg a USING (doc_id)
    """

    # round 10 — snapshot-committed table (sources/snapstore.py): the
    # store derives deterministically from events (v1 = full KPIs,
    # v2 = [01-08, 01-14] overwritten scrubbing value>100), so each
    # read path has an exact events-side SQL equivalent.
    _SNAP_AGG = """
        SELECT CAST(ts AS DATE) AS metric_date,
               event_type AS metric,
               CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS value_sum,
               COUNT(*) AS value_count
        FROM events
        {where}
        GROUP BY 1, 2
    """
    o["snapshot_upsert_read"] = _SNAP_AGG.format(
        where="""WHERE NOT (CAST(ts AS DATE) BETWEEN DATE '2024-01-08'
                                AND DATE '2024-01-14'
                            AND value > 100)"""
    )
    o["snapshot_time_travel"] = _SNAP_AGG.format(where="")
    o["snapshot_pruned_read"] = _SNAP_AGG.format(
        where="""WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-08'
                     AND DATE '2024-01-14'
                 AND value <= 100"""
    )
    # v1→v2 change feed: EXCEPT ALL between the uncorrected and
    # corrected week aggregates (groups the scrub left identical, and
    # residue-moved rows, cancel — matching table_changes semantics)
    o["snapshot_changes"] = """
        WITH orig AS (
            SELECT CAST(ts AS DATE) AS metric_date, event_type AS metric,
                   CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS value_sum,
                   COUNT(*) AS value_count
            FROM events
            WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-08' AND DATE '2024-01-14'
            GROUP BY 1, 2
        ), corr AS (
            SELECT CAST(ts AS DATE) AS metric_date, event_type AS metric,
                   CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS value_sum,
                   COUNT(*) AS value_count
            FROM events
            WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-08' AND DATE '2024-01-14'
              AND value <= 100
            GROUP BY 1, 2
        )
        SELECT *, 'insert' AS _change_type
        FROM (SELECT * FROM corr EXCEPT ALL SELECT * FROM orig)
        UNION ALL
        SELECT *, 'delete' AS _change_type
        FROM (SELECT * FROM orig EXCEPT ALL SELECT * FROM corr)
    """
    # z-ordered narrow-band read == the direct events aggregate
    o["snapshot_zorder_read"] = """
        SELECT event_type AS metric,
               COUNT(*) AS n_rows,
               CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS value_sum,
               COUNT(DISTINCT user_id) AS n_users
        FROM events
        WHERE value BETWEEN 20.0 AND 40.0
        GROUP BY 1
    """

    # merge(ignore): base(≤01-20) + re-sent(≥01-15) must equal events
    # EXACTLY — overlap deduped, tail inserted, nothing doubled or lost
    o["snapshot_merge_upsert"] = """
        SELECT CAST(ts AS DATE) AS metric_date,
               event_type AS metric,
               COUNT(*) AS n_rows,
               CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS value_sum
        FROM events
        GROUP BY 1, 2
    """
    # merge(update): the re-priced purchase rows replaced IN PLACE
    o["snapshot_merge_update"] = """
        SELECT CAST(ts AS DATE) AS metric_date,
               event_type AS metric,
               COUNT(*) AS n_rows,
               CAST(SUM(CAST(CASE
                   WHEN event_type = 'purchase'
                        AND CAST(ts AS DATE) BETWEEN DATE '2024-01-08'
                                                 AND DATE '2024-01-10'
                   THEN value * 2 ELSE value END AS DECIMAL(28,4))) AS DOUBLE)
                   AS value_sum
        FROM events
        GROUP BY 1, 2
    """
    # row-level DELETE WHERE user_id = 7: NULL user_ids are KEPT
    o["snapshot_delete_where"] = """
        SELECT CAST(ts AS DATE) AS metric_date,
               event_type AS metric,
               COUNT(*) AS n_rows,
               CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS value_sum,
               COUNT(DISTINCT user_id) AS n_users
        FROM events
        WHERE user_id IS DISTINCT FROM 7
        GROUP BY 1, 2
    """
    # AS OF a timestamp between the two commits ⇒ the v1 (uncorrected)
    # state, same oracle as version-addressed time travel
    # deletion-vector delete is reader-indistinguishable from the
    # copy-on-write delete: the exact same oracle
    o["snapshot_delete_dv"] = """
        SELECT CAST(ts AS DATE) AS metric_date,
               event_type AS metric,
               COUNT(*) AS n_rows,
               CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS value_sum,
               COUNT(DISTINCT user_id) AS n_users
        FROM events
        WHERE user_id IS DISTINCT FROM 7
        GROUP BY 1, 2
    """
    # incremental z-order is a logical no-op over the union of base +
    # day appends: the narrow user range straight off events
    o["snapshot_zorder_partial"] = """
        SELECT user_id,
               COUNT(*) AS n_rows,
               CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS value_sum
        FROM events
        WHERE user_id BETWEEN 10 AND 19
        GROUP BY 1
    """
    # composite-partition pruned read: Jan 21-25 purchases minus the
    # deleted (2024-01-22, purchase) cell
    o["snapshot_multicol_partition"] = """
        SELECT CAST(ts AS DATE) AS metric_date,
               COUNT(*) AS n_rows,
               CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS value_sum
        FROM events
        WHERE event_type = 'purchase'
          AND CAST(ts AS DATE) BETWEEN DATE '2024-01-21' AND DATE '2024-01-25'
          AND CAST(ts AS DATE) <> DATE '2024-01-22'
        GROUP BY 1
    """
    # the restore rolls the zeroing overwrite back: the original aggregate
    o["snapshot_restore"] = """
        SELECT event_type AS metric,
               COUNT(*) AS n_rows,
               CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS value_sum
        FROM events
        GROUP BY 1
    """
    # schema evolution is a logical union of the two vintages: channel
    # exists only for the evolved slice (event_id % 3 = 0), NULL —
    # read back as 'pre-evolution' — elsewhere
    o["snapshot_schema_evolution"] = """
        SELECT CASE
                 WHEN event_id % 3 = 0 THEN
                   CASE WHEN event_id % 2 = 0 THEN 'web' ELSE 'app' END
                 ELSE 'pre-evolution'
               END AS channel,
               event_type AS metric,
               COUNT(*) AS n_rows,
               CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS value_sum
        FROM events
        GROUP BY 1, 2
    """
    # ANDed stat ranges are a plain conjunctive filter logically
    o["snapshot_multirange_read"] = """
        SELECT event_type AS metric,
               COUNT(*) AS n_rows,
               CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS value_sum,
               COUNT(DISTINCT user_id) AS n_users
        FROM events
        WHERE user_id BETWEEN 10 AND 40
          AND value BETWEEN 5.0 AND 30.0
        GROUP BY 1
    """
    # the poisoned (negated) batch was rejected whole: the table holds
    # exactly the clean slices = all of events
    o["snapshot_check_constraint"] = """
        SELECT event_type AS metric,
               COUNT(*) AS n_rows,
               CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS value_sum
        FROM events
        GROUP BY 1
    """
    # analyze is metadata-only: the pruned range read equals the plain
    # conjunctive filter
    o["snapshot_analyze_prune"] = """
        SELECT event_type AS metric,
               COUNT(*) AS n_rows,
               CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS value_sum,
               COUNT(DISTINCT user_id) AS n_users
        FROM events
        WHERE user_id BETWEEN 10 AND 40
        GROUP BY 1
    """
    # the scoped compact is logically empty: full-table read == events
    o["snapshot_optimize_where"] = """
        SELECT CAST(ts AS DATE) AS metric_date,
               COUNT(*) AS n_rows,
               CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS value_sum
        FROM events
        GROUP BY 1
    """
    # the IS NULL audit: every 7th event was anonymized in the store
    o["snapshot_is_null_scan"] = """
        SELECT event_type AS metric,
               COUNT(*) AS n_rows,
               CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS value_sum
        FROM events
        WHERE event_id % 7 = 0
        GROUP BY 1
    """
    o["snapshot_as_of_read"] = _SNAP_AGG.format(where="")
    # window spanning a compaction: the feed is exactly the post-compact
    # append, tagged insert — the compact itself contributes nothing
    o["snapshot_changes_compacted"] = """
        SELECT CAST(ts AS DATE) AS metric_date,
               event_type AS metric,
               CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS value_sum,
               COUNT(*) AS value_count,
               'insert' AS _change_type
        FROM events
        WHERE CAST(ts AS DATE) > DATE '2024-01-20'
        GROUP BY 1, 2
    """

    # the netted streaming change feed == the final silver state
    o["snapshot_stream_net"] = """
        SELECT CAST(ts AS DATE) AS metric_date,
               event_type AS metric,
               COUNT(*) AS n_rows,
               CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS value_sum
        FROM events
        WHERE CAST(ts AS DATE) <> DATE '2024-01-15'
        GROUP BY 1, 2
    """

    # incremental CDC refresh == full recompute, including the day the
    # correction deleted (2024-01-15 must be ABSENT from gold)
    o["cdc_incremental_refresh"] = """
        SELECT CAST(ts AS DATE) AS metric_date,
               event_type AS metric,
               CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS value_sum,
               CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE)
                   / NULLIF(COUNT(*), 0) AS value_avg,
               COUNT(*) AS value_count
        FROM events
        WHERE CAST(ts AS DATE) <> DATE '2024-01-15'
        GROUP BY 1, 2
    """

    return o


def _oracle_sql_base() -> dict[str, str]:
    return {
        "kpi_daily": """
            SELECT CAST(ts AS DATE) AS metric_date,
                   event_type AS metric,
                   CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS value_sum,
                   CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE)
                       / NULLIF(COUNT(*), 0) AS value_avg,
                   COUNT(*) AS value_count,
                   COUNT(DISTINCT user_id) AS value_distinct
            FROM events
            GROUP BY 1, 2
        """,
        "kpi_daily_window": """
            SELECT CAST(ts AS DATE) AS metric_date,
                   event_type AS metric,
                   CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS value_sum,
                   CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE)
                       / NULLIF(COUNT(*), 0) AS value_avg,
                   COUNT(*) AS value_count
            FROM events
            WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
              AND ts < TIMESTAMP '2024-01-21 00:00:00'
              AND event_type = 'purchase'
            GROUP BY 1, 2
        """,
        "metric_names": """
            SELECT DISTINCT event_type AS metric FROM events ORDER BY metric
        """,
        "metrics_read_norm": """
            WITH gold AS (
                SELECT CAST(ts AS DATE) AS metric_date,
                       CAST(user_id % 3 AS INT) AS source_id,
                       event_type AS metric,
                       CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS value_sum,
                       COUNT(*) AS value_count
                FROM events GROUP BY 1, 2, 3
            )
            SELECT metric_date, source_id, metric, value_sum,
                   value_sum / NULLIF(value_count, 0) AS value_avg,
                   value_count,
                   value_sum / NULLIF(value_count, 0) AS value
            FROM gold
            WHERE metric = 'purchase' AND source_id = 1
              AND metric_date >= DATE '2024-01-03'
              AND metric_date <= DATE '2024-02-10'
            ORDER BY metric_date DESC
            LIMIT 20
        """,
        "metrics_export": """
            WITH gold AS (
                SELECT CAST(ts AS DATE) AS metric_date,
                       CAST(user_id % 3 AS INT) AS source_id,
                       event_type AS metric,
                       CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS value_sum,
                       COUNT(*) AS value_count
                FROM events GROUP BY 1, 2, 3
            )
            SELECT metric_date, source_id, metric,
                   value_sum AS value,
                   value_count, value_sum,
                   value_sum / NULLIF(value_count, 0) AS value_avg
            FROM gold
            WHERE metric = 'signup'
              AND metric_date >= DATE '2024-01-01'
              AND metric_date <= DATE '2024-01-31'
        """,
        "ingest_stats": """
            SELECT COUNT(*) AS ingested,
                   MIN(ts) AS min_ts,
                   MAX(ts) AS max_ts,
                   COUNT(DISTINCT event_type) AS metrics_seen,
                   MIN(event_type) AS first_metric
            FROM events
        """,
        "pricing_summary": """
            -- decimal→double goes via VARCHAR: DuckDB's direct cast
            -- double-rounds (int128→double, then ×10^-scale) and lands
            -- 1 ulp off the correctly-rounded value once the scaled
            -- significand exceeds 2^53 (sum_charge crosses at the 10×
            -- scale sweep: 2.8e16 units at scale 6). The string parse
            -- is correctly rounded, matching Spark's BigDecimal path.
            SELECT l_returnflag, l_linestatus,
                   CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS VARCHAR) AS DOUBLE) AS sum_qty,
                   CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
                   CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
                   CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS sum_charge,
                   CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_qty,
                   CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_price,
                   CAST(CAST(SUM(CAST(l_discount AS DECIMAL(28,2))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_disc,
                   COUNT(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "revenue_by_nation": """
            SELECT r.r_name, n.n_name,
                   CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                                 AS DECIMAL(38,4))) AS DOUBLE) AS revenue,
                   COUNT(*) AS line_count,
                   COUNT(DISTINCT o.o_orderkey) AS order_count
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            GROUP BY r.r_name, n.n_name
            ORDER BY r.r_name, n.n_name
        """,
        "top_customers": """
            WITH spend AS (
                SELECT o_custkey,
                       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS DOUBLE) AS total_spend,
                       COUNT(*) AS order_count
                FROM orders GROUP BY o_custkey)
            SELECT c.c_custkey, c.c_name, s.total_spend, s.order_count
            FROM spend s JOIN customer c ON s.o_custkey = c.c_custkey
            ORDER BY s.total_spend DESC, c.c_custkey ASC
            LIMIT 10
        """,
        "json_payload_extract": """
            SELECT event_type AS metric,
                   COUNT(*) AS n,
                   -- DuckDB SUM(BIGINT) surfaces HUGEINT; pin to BIGINT so
                   -- the driver's hash renderer sees the same type as Spark
                   CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
                   CAST(COUNT(DISTINCT CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_distinct
            FROM events GROUP BY event_type
        """,
        # round-trip identity is the invariant (GCM ciphertext is
        # IV-randomized): every row must decrypt back to its plaintext
        "payload_roundtrip": """
            SELECT event_type AS metric,
                   COUNT(*) AS n,
                   COUNT(*) AS n_roundtrip_ok,
                   CAST(SUM(octet_length(CAST(props AS BLOB))) AS BIGINT)
                       AS payload_bytes
            FROM events GROUP BY event_type
        """,
        "value_fallback": """
            WITH gold AS (
                SELECT CAST(ts AS DATE) AS metric_date,
                       event_type AS metric,
                       CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS vs,
                       COUNT(*) AS value_count
                FROM events GROUP BY 1, 2
            ),
            staged AS (
                SELECT metric_date, metric,
                       CASE WHEN date_part('day', metric_date) % 2 = 1 THEN vs END
                           AS value_sum,
                       CASE WHEN date_part('day', metric_date) % 3 != 0
                            THEN vs / NULLIF(value_count, 0) END AS value_avg,
                       value_count
                FROM gold
            )
            SELECT metric_date, metric, value_sum, value_avg, value_count,
                   COALESCE(value_sum, value_avg,
                            CAST(value_count AS DOUBLE)) AS value
            FROM staged
        """,
        "windowed_counts": """
            SELECT time_bucket(INTERVAL '6 hours', ts) AS window_start,
                   time_bucket(INTERVAL '6 hours', ts) + INTERVAL '6 hours' AS window_end,
                   event_type AS metric,
                   CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS value_sum,
                   CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE)
                       / NULLIF(COUNT(*), 0) AS value_avg,
                   COUNT(*) AS value_count
            FROM events
            GROUP BY 1, 2, 3
        """,
        "sessionization": """
            WITH flagged AS (
                SELECT user_id, ts,
                       CASE WHEN LAG(ts) OVER w IS NULL
                                 OR epoch_us(ts) - epoch_us(LAG(ts) OVER w)
                                    > 30 * 60 * 1000000
                            THEN 1 ELSE 0 END AS is_new
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ),
            tagged AS (
                SELECT user_id, ts,
                       -- DuckDB windowed SUM(INT) widens to HUGEINT (pandas
                       -- float64); pin to BIGINT to match Spark's hash input
                       CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                           AS BIGINT) AS session_id
                FROM flagged
            )
            SELECT user_id, session_id,
                   MIN(ts) AS session_start,
                   MAX(ts) AS session_end,
                   COUNT(*) AS n_events
            FROM tagged GROUP BY user_id, session_id
        """,
        "topk_days_per_metric": _GOLD_CTE + """
            , r AS (
                SELECT metric, metric_date, value,
                       ROW_NUMBER() OVER (PARTITION BY metric
                           ORDER BY value DESC, metric_date ASC) AS rnk
                FROM gold)
            SELECT metric, metric_date, value, rnk FROM r WHERE rnk <= 3
        """,
        "kpi_rollup": _GOLD_CTE + """
            SELECT COALESCE(metric, 'ALL') AS metric,
                   COALESCE(CAST(metric_date AS VARCHAR), 'ALL') AS metric_date,
                   GROUPING(metric) AS g_metric,
                   GROUPING(metric_date) AS g_date,
                   CAST(SUM(CAST(value AS DECIMAL(38,4))) AS DOUBLE) AS total,
                   COUNT(*) AS n_days
            FROM gold GROUP BY ROLLUP(metric, metric_date)
        """,
        "rolling_zscore_strict": _GOLD_CTE + _stats_cte(7) + """
            , derived AS (
                SELECT metric, metric_date, value, pos, n,
                       s / n AS mu,
                       CASE WHEN (sq - (s * s) / n) / n > 0
                            THEN SQRT((sq - (s * s) / n) / n) ELSE 0.0 END AS sigma
                FROM stats
            )
            SELECT metric, metric_date, value,
                   CASE WHEN pos >= 7 AND n = 7 AND sigma > 0
                        THEN (value - mu) / sigma END AS z,
                   COALESCE(ABS(CASE WHEN pos >= 7 AND n = 7 AND sigma > 0
                                     THEN (value - mu) / sigma END) >= 3.0,
                            FALSE) AS is_anomaly
            FROM derived
        """,
        "rolling_zscore_api": _GOLD_CTE + _stats_cte(7) + """
            , derived AS (
                SELECT metric, metric_date, value, n,
                       s / n AS mu,
                       CASE WHEN (sq - (s * s) / n) / (n - 1) > 0
                            THEN SQRT((sq - (s * s) / n) / (n - 1)) ELSE 0.0 END AS sigma
                FROM stats
            )
            SELECT metric, metric_date, value,
                   CASE WHEN value IS NOT NULL AND n >= 2 AND sigma = 0 AND value != mu THEN 1e9
                        WHEN value IS NOT NULL AND n >= 2 AND sigma = 0 THEN 0.0
                        WHEN value IS NOT NULL AND n >= 2 THEN (value - mu) / sigma
                   END AS z,
                   CASE WHEN value IS NOT NULL AND n >= 2 AND sigma = 0 THEN value != mu
                        WHEN value IS NOT NULL AND n >= 2
                             THEN ABS((value - mu) / sigma) >= 3.0
                        ELSE FALSE
                   END AS is_outlier
            FROM derived
        """,
        "iforest_features": _GOLD_CTE + _stats_cte(6, "CURRENT ROW") + """
            SELECT metric, metric_date, value,
                   s / n AS roll_mean_7,
                   CASE WHEN (sq - (s * s) / n) / n > 0
                        THEN SQRT((sq - (s * s) / n) / n) ELSE 0.0 END AS roll_std_7,
                   COALESCE(value - LAG(value, 1) OVER
                            (PARTITION BY metric ORDER BY metric_date), 0.0) AS diff_1
            FROM stats
        """,
        "anomaly_iforest": _GOLD_CTE + _stats_cte(7) + """
            , derived AS (
                SELECT metric, metric_date, value, n,
                       s / n AS mu,
                       CASE WHEN (sq - (s * s) / n) / n > 0
                            THEN SQRT((sq - (s * s) / n) / n) ELSE 0.0 END AS sd
                FROM stats
            )
            SELECT metric, metric_date, value,
                   CASE WHEN n >= 7 AND sd = 0 THEN 0.0
                        WHEN n >= 7 THEN (value - mu) / sd
                   END AS score,
                   CASE WHEN n >= 7 AND sd = 0 THEN value != mu
                        WHEN n >= 7 THEN ABS((value - mu) / sd) >= 3.0
                        ELSE FALSE
                   END AS is_outlier
            FROM derived
        """,
        "date_spine_fill": _GOLD_CTE + """
            , sparse AS (SELECT * FROM gold WHERE value > 2500.0),
            bounds AS (SELECT metric, MIN(metric_date) AS d0, MAX(metric_date) AS d1
                       FROM sparse GROUP BY metric),
            spine AS (SELECT b.metric, b.d0 + CAST(t.k AS INTEGER) AS metric_date
                      FROM bounds b CROSS JOIN generate_series(0, 1000) t(k)
                      WHERE b.d0 + CAST(t.k AS INTEGER) <= b.d1)
            SELECT sp.metric, sp.metric_date, COALESCE(g.value, 0.0) AS value
            FROM spine sp LEFT JOIN sparse g USING (metric, metric_date)
        """,
        "forecast_naive": _GOLD_CTE + """
            , per AS (
                SELECT metric, MAX(metric_date) AS last_date,
                       arg_max(value, metric_date) AS last_val,
                       COUNT(*) AS n,
                       CAST(SUM(CAST(value AS DECIMAL(38,4))) AS DOUBLE) AS s
                FROM gold GROUP BY metric)
            SELECT metric,
                   last_date + CAST(t.k AS INTEGER) AS target_date,
                   CASE WHEN s = 0.0 THEN 0.0 ELSE last_val END AS yhat,
                   CASE WHEN s = 0.0 THEN 0.0 WHEN n < 14 THEN last_val ELSE 0.0 END AS yhat_lower,
                   CASE WHEN s = 0.0 THEN 0.0 WHEN n < 14 THEN last_val ELSE 0.0 END AS yhat_upper,
                   'naive-0.1' AS model_version
            FROM per CROSS JOIN generate_series(1, 7) t(k)
        """,
        # drift model: σ over centi-quantized diffs (exact BIGINT sums both
        # engines) then the same double expression tree as drift_model_fn —
        # bit-identical floats with no summation-order dependence
        "forecast_drift": _GOLD_CTE + """
            , d AS (
                SELECT metric,
                       value - LAG(value) OVER (PARTITION BY metric
                                                ORDER BY metric_date) AS d
                FROM gold),
            m AS (
                SELECT metric, CAST(ROUND(d * 100.0) AS BIGINT) AS m
                FROM d WHERE d IS NOT NULL),
            ds AS (
                SELECT metric, COUNT(*) AS nd,
                       CAST(CAST(SUM(m) AS BIGINT) AS DOUBLE) AS sum_m,
                       CAST(CAST(SUM(m * m) AS BIGINT) AS DOUBLE) AS sum_m2
                FROM m GROUP BY metric),
            per AS (
                SELECT metric, MAX(metric_date) AS last_date,
                       arg_max(value, metric_date) AS last_val,
                       arg_min(value, metric_date) AS first_val,
                       COUNT(*) AS n,
                       CAST(SUM(CAST(value AS DECIMAL(38,4))) AS DOUBLE) AS s
                FROM gold GROUP BY metric),
            calc AS (
                SELECT per.*, ds.nd,
                       (last_val - first_val) / CAST(nd AS DOUBLE) AS slope,
                       CASE WHEN nd < 2 THEN 0.0
                            ELSE sqrt(GREATEST(
                                   (sum_m2 - sum_m * sum_m / CAST(nd AS DOUBLE))
                                     / CAST(nd - 1 AS DOUBLE), 0.0)) / 100.0
                       END AS sigma
                FROM per JOIN ds USING (metric))
            SELECT metric,
                   last_date + CAST(t.k AS INTEGER) AS target_date,
                   CASE WHEN s = 0.0 THEN 0.0
                        WHEN n < 14 THEN last_val
                        ELSE last_val + slope * CAST(t.k AS DOUBLE) END AS yhat,
                   CASE WHEN s = 0.0 THEN 0.0
                        WHEN n < 14 THEN last_val
                        ELSE (last_val + slope * CAST(t.k AS DOUBLE))
                             - 1.96 * (sigma * sqrt(CAST(t.k AS DOUBLE)
                                 * (1.0 + CAST(t.k AS DOUBLE) / CAST(nd AS DOUBLE))))
                   END AS yhat_lower,
                   CASE WHEN s = 0.0 THEN 0.0
                        WHEN n < 14 THEN last_val
                        ELSE (last_val + slope * CAST(t.k AS DOUBLE))
                             + 1.96 * (sigma * sqrt(CAST(t.k AS DOUBLE)
                                 * (1.0 + CAST(t.k AS DOUBLE) / CAST(nd AS DOUBLE))))
                   END AS yhat_upper,
                   CASE WHEN s = 0.0 OR n < 14 THEN 'naive-0.1'
                        ELSE 'drift-0.1' END AS model_version
            FROM calc CROSS JOIN generate_series(1, 7) t(k)
        """,
        "forecast_contract": _GOLD_CTE + """
            , per AS (
                SELECT metric, MAX(metric_date) AS last_date,
                       arg_max(value, metric_date) AS last_val,
                       COUNT(*) AS n,
                       CAST(SUM(CAST(value AS DECIMAL(38,4))) AS DOUBLE) AS s
                FROM gold GROUP BY metric),
            fc AS (
                SELECT metric, last_date + CAST(t.k AS INTEGER) AS target_date,
                       CASE WHEN s = 0.0 THEN 0.0 ELSE last_val END AS yhat,
                       CASE WHEN s = 0.0 THEN 0.0 WHEN n < 14 THEN last_val ELSE 0.0 END AS lo,
                       CASE WHEN s = 0.0 THEN 0.0 WHEN n < 14 THEN last_val ELSE 0.0 END AS hi
                FROM per CROSS JOIN generate_series(1, 4) t(k)),
            norm AS (
                SELECT metric, target_date, yhat,
                       LEAST(LEAST(lo, hi), yhat) AS yhat_lower,
                       GREATEST(GREATEST(lo, hi), yhat) AS yhat_upper
                FROM fc),
            pad AS (
                SELECT n.metric, MAX(n.target_date) + CAST(t.k AS INTEGER) AS target_date,
                       0.0 AS yhat, 0.0 AS yhat_lower, 0.0 AS yhat_upper
                FROM norm n CROSS JOIN generate_series(1, 3) t(k)
                GROUP BY n.metric, t.k),
            unioned AS (SELECT * FROM norm UNION ALL SELECT * FROM pad)
            SELECT metric,
                   strftime(target_date, '%Y-%m-%dT00:00:00Z') AS metric_date,
                   strftime(target_date, '%Y-%m-%d') AS date,
                   yhat, yhat_lower, yhat_upper
            FROM unioned
        """,
        "strictly_future": _GOLD_CTE + """
            , lastg AS (SELECT metric, MAX(metric_date) AS last_obs,
                               arg_max(value, metric_date) AS v
                        FROM gold GROUP BY metric)
            SELECT metric, last_obs + CAST(t.k AS INTEGER) AS target_date,
                   v AS yhat, 0.0 AS yhat_lower, 0.0 AS yhat_upper
            FROM lastg CROSS JOIN generate_series(-2, 10) t(k)
            WHERE t.k >= 1 AND t.k <= 7
        """,
        "persistence_mape": _GOLD_CTE + """
            , tail AS (
                SELECT metric, metric_date, value,
                       ROW_NUMBER() OVER (PARTITION BY metric ORDER BY metric_date DESC) AS rd
                FROM gold),
            s AS (
                SELECT metric, metric_date, value,
                       LAG(value) OVER (PARTITION BY metric ORDER BY metric_date) AS pred
                FROM tail WHERE rd <= 21),
            t AS (SELECT metric, metric_date,
                         ABS(value - pred) / GREATEST(ABS(value), 1e-6) AS term
                  FROM s WHERE pred IS NOT NULL)
            SELECT metric, 20 AS window_n,
                   COALESCE(list_reduce(list(term ORDER BY metric_date), (x, y) -> x + y)
                            / COUNT(*) * 100.0, 100.0) AS mape
            FROM t GROUP BY metric
        """,
        "backtest_folds": _GOLD_CTE + _BACKTEST_CTE + """
            SELECT metric, fold_index, mae, rmse, mape, smape FROM fold_m
        """,
        "backtest_summary": _GOLD_CTE + _BACKTEST_CTE + """
            , avgs AS (
                SELECT metric, COUNT(*) AS folds,
                       list_reduce(list(mae ORDER BY fold_index), (x,y) -> x+y) / COUNT(*) AS avg_mae,
                       list_reduce(list(rmse ORDER BY fold_index), (x,y) -> x+y) / COUNT(*) AS avg_rmse,
                       list_reduce(list(mape ORDER BY fold_index), (x,y) -> x+y) / COUNT(*) AS avg_mape,
                       list_reduce(list(smape ORDER BY fold_index), (x,y) -> x+y) / COUNT(*) AS avg_smape
                FROM fold_m GROUP BY metric)
            SELECT metric, folds, avg_mae, avg_rmse, avg_mape, avg_smape,
                   GREATEST(0.0, LEAST(100.0, 100.0 - (avg_mape + avg_smape) / 2.0)) AS score
            FROM avgs
        """,
        "reliability_folds": _GOLD_CTE + _RELIABILITY_CTE + """
            SELECT metric, fold_index, mae, rmse, mape, smape, bias FROM fold_m
        """,
        "multimodal_features": """
            SELECT doc_id,
                   octet_length(CAST(text AS BLOB)) AS n_bytes,
                   ('0x' || substr(md5(text), 1, 15))::BIGINT AS header_hash,
                   ('0x' || substr(md5(text), 1, 8))::BIGINT / 4294967296.0 AS feat_0,
                   ('0x' || substr(md5(text), 9, 8))::BIGINT / 4294967296.0 AS feat_1,
                   ('0x' || substr(md5(text), 17, 8))::BIGINT / 4294967296.0 AS feat_2,
                   ('0x' || substr(md5(text), 25, 8))::BIGINT / 4294967296.0 AS feat_3
            FROM documents
        """,
        "frame_sample": """
            WITH d AS (SELECT doc_id, text, octet_length(CAST(text AS BLOB)) AS n
                       FROM documents),
            frames AS (
                SELECT doc_id, text, n, CAST(t.k AS INTEGER) AS frame_idx,
                       CAST(FLOOR((t.k * GREATEST(n - 16, 0)) / 3.0) AS INTEGER) AS byte_offset
                FROM d CROSS JOIN generate_series(0, 3) t(k))
            SELECT doc_id, frame_idx, byte_offset,
                   ('0x' || substr(md5(substr(text, byte_offset + 1, 16)), 1, 15))::BIGINT
                       AS frame_hash
            FROM frames
        """,
        # decode oracles: recompute the expected header fields straight
        # from doc_id (the Spark side must CONSTRUCT the binary, then
        # PARSE it back — a bug in either direction breaks the match)
        "image_decode": """
            SELECT doc_id,
                   CASE doc_id % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'gif'
                        WHEN 2 THEN 'bmp' ELSE 'jpeg' END AS format,
                   CAST(doc_id % 509 + 16 AS INTEGER) AS width,
                   CAST(doc_id % 253 + 16 AS INTEGER) AS height
            FROM documents
        """,
        "png_pixel_decode": """
            WITH base AS (
                SELECT doc_id,
                       doc_id % 13 + 1 AS w,
                       doc_id % 11 + 1 AS h,
                       CASE doc_id % 4 WHEN 0 THEN 1 WHEN 1 THEN 3
                            WHEN 2 THEN 2 ELSE 4 END AS ch
                FROM documents),
            sized AS (SELECT *, w * h * ch AS n FROM base),
            series AS (SELECT range AS j FROM range(0, 572))
            SELECT s.doc_id,
                   CAST(s.w AS INTEGER) AS width,
                   CAST(s.h AS INTEGER) AS height,
                   CAST(s.ch AS INTEGER) AS n_channels,
                   CAST(SUM(CASE WHEN t.j < s.n
                            THEN (s.doc_id * 31 + t.j * 7) % 256
                            ELSE 0 END) AS BIGINT) AS pixel_sum,
                   CAST((s.doc_id * 31) % 256 AS BIGINT) AS first_px,
                   CAST((s.doc_id * 31 + (s.n - 1) * 7) % 256 AS BIGINT)
                       AS last_px
            FROM sized s CROSS JOIN series t
            GROUP BY s.doc_id, s.w, s.h, s.ch, s.n
        """,
        "jpeg_pixel_decode": """
            WITH base AS (
                SELECT doc_id,
                       doc_id % 17 + 1 AS w,
                       doc_id % 13 + 1 AS h
                FROM documents),
            series AS (SELECT range AS j FROM range(0, 221)),
            px AS (
                SELECT b.doc_id, b.w, b.h,
                       (b.doc_id * 37 + ((t.j % b.w) // 8) * 11
                        + ((t.j // b.w) // 8) * 5) % 256 AS v
                FROM base b JOIN series t ON t.j < b.w * b.h)
            SELECT doc_id,
                   CAST(w AS INTEGER) AS width,
                   CAST(h AS INTEGER) AS height,
                   CAST(1 AS INTEGER) AS n_channels,
                   CAST(SUM(v) AS BIGINT) AS pixel_sum,
                   CAST((doc_id * 37) % 256 AS BIGINT) AS first_px,
                   CAST((doc_id * 37 + ((w - 1) // 8) * 11
                        + ((h - 1) // 8) * 5) % 256 AS BIGINT) AS last_px
            FROM px GROUP BY doc_id, w, h
        """,
        "audio_decode": """
            SELECT doc_id,
                   CAST(doc_id % 2 + 1 AS INTEGER) AS channels,
                   CAST((doc_id % 3 + 1) * 8000 AS INTEGER) AS sample_rate,
                   CAST(16 AS INTEGER) AS bits,
                   CAST(doc_id % 1000 + 1 AS DOUBLE)
                       / CAST((doc_id % 3 + 1) * 8000 AS DOUBLE) AS duration_sec
            FROM documents
        """,
        "cosine_topk": _EMB_CTE + """
            , q AS (SELECT vec_id AS query_id, v AS qv, n AS qn FROM e
                    WHERE vec_id % 50 = 0),
            scored AS (
                SELECT q.query_id, e.vec_id AS neighbor_id,
                       """ + _DOT.format(a="q.qv", b="e.v") + """ / (q.qn * e.n) AS cos_sim
                FROM e CROSS JOIN q WHERE e.vec_id != q.query_id),
            ranked AS (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                          ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
                FROM scored)
            SELECT query_id, neighbor_id, rank, cos_sim FROM ranked WHERE rank <= 10
        """,
        "ann_bucketed_topk": _EMB_CTE + """
            , q AS (SELECT vec_id AS query_id, v AS qv, n AS qn, bucket FROM e
                    WHERE vec_id % 50 = 0),
            scored AS (
                SELECT q.query_id, e.vec_id AS neighbor_id, e.bucket,
                       """ + _DOT.format(a="q.qv", b="e.v") + """ / (q.qn * e.n) AS cos_sim
                FROM e JOIN q USING (bucket) WHERE e.vec_id != q.query_id),
            ranked AS (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                          ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
                FROM scored)
            SELECT query_id, neighbor_id, rank, cos_sim, bucket
            FROM ranked WHERE rank <= 10
        """,
        "ivf_topk": _EMB_CTE + """
            , cents AS (SELECT vec_id AS cent_id, v AS cv, n AS cn FROM e
                        WHERE vec_id < 16),
            assign AS (
                SELECT e.vec_id, e.v, e.n, c.cent_id,
                       ROW_NUMBER() OVER (PARTITION BY e.vec_id
                           ORDER BY """ + _DOT.format(a="e.v", b="c.cv") + """
                                    / (e.n * c.cn) DESC,
                                    c.cent_id ASC) AS rn
                FROM e CROSS JOIN cents c),
            cells AS (SELECT vec_id, v, n, cent_id AS cell FROM assign WHERE rn = 1),
            q AS (SELECT vec_id AS query_id, v AS qv, n AS qn, cell FROM cells
                  WHERE vec_id % 50 = 0),
            scored AS (
                SELECT q.query_id, c.vec_id AS neighbor_id, c.cell,
                       """ + _DOT.format(a="q.qv", b="c.v") + """ / (q.qn * c.n) AS cos_sim
                FROM cells c JOIN q USING (cell) WHERE c.vec_id != q.query_id),
            ranked AS (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                          ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
                FROM scored)
            SELECT query_id, neighbor_id, rank, cos_sim, cell
            FROM ranked WHERE rank <= 10
        """,
        "embedding_near_dup": _EMB_CTE + """
            , pairs AS (
                SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                       """ + _DOT.format(a="a.v", b="b.v") + """ / (a.n * b.n) AS cos_sim
                FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
            SELECT vec_a, vec_b, cos_sim FROM pairs WHERE cos_sim >= 0.25
        """,
        "dedup_exact": f"""
            WITH dd AS (
                SELECT doc_id, text FROM documents
                UNION ALL
                SELECT doc_id + 100000, text FROM documents),
            fps AS (
                SELECT doc_id,
                       {_H60.format(expr="TRIM(REGEXP_REPLACE(LOWER(text), '" + _NORM_RE + "', ' ', 'g'))")} AS fingerprint
                FROM dd)
            SELECT fingerprint, MIN(doc_id) AS rep_id, COUNT(*) AS n_docs
            FROM fps GROUP BY fingerprint
        """,
        "minhash_bands": _TEXT_CTE + _SHINGLE_CTE + _minhash_sig_cte()
        + _minhash_band_cte() + """
            SELECT doc_id, band, bucket FROM bb
        """,
        "minhash_pairs": _TEXT_CTE + _SHINGLE_CTE + _minhash_sig_cte()
        + _minhash_band_cte() + """
            , pairs AS (
                SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
                FROM bb l JOIN bb r
                  ON l.band = r.band AND l.bucket = r.bucket
                 AND l.doc_id < r.doc_id)
            SELECT p.doc_a, p.doc_b,
                   ("""
        + " + ".join(
            f"CASE WHEN a.m{i} = b.m{i} THEN 1 ELSE 0 END"
            for i in range(len(DD.MINHASH_PARAMS))
        )
        + """) / 16.0 AS est_jaccard
            FROM pairs p
            JOIN sig a ON a.doc_id = p.doc_a
            JOIN sig b ON b.doc_id = p.doc_b
        """,
        "ngram_jaccard_pairs": _TEXT_CTE + _SHINGLE_CTE + """
            , ex AS (SELECT doc_id, UNNEST(sh) AS s FROM g),
            sizes AS (SELECT doc_id, COUNT(*) AS n FROM ex GROUP BY doc_id),
            inter AS (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
                FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2)
            SELECT i.doc_a, i.doc_b, i.n_inter,
                   i.n_inter / CAST(na.n + nb.n - i.n_inter AS DOUBLE) AS jaccard
            FROM inter i
            JOIN sizes na ON na.doc_id = i.doc_a
            JOIN sizes nb ON nb.doc_id = i.doc_b
            WHERE i.n_inter / CAST(na.n + nb.n - i.n_inter AS DOUBLE) >= 0.05
        """,
        "containment_pairs": _TEXT_CTE + _SHINGLE_CTE + """
            , ex AS (SELECT doc_id, UNNEST(sh) AS s FROM g),
            freq AS (SELECT s, COUNT(*) AS dfreq FROM ex GROUP BY 1),
            kept AS (
                SELECT ex.doc_id, ex.s FROM ex JOIN freq USING (s)
                WHERE dfreq <= 1000),
            sizes AS (SELECT doc_id, COUNT(*) AS n FROM kept GROUP BY 1),
            inter AS (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                       COUNT(*) AS n_inter
                FROM kept a JOIN kept b
                  ON a.s = b.s AND a.doc_id != b.doc_id
                GROUP BY 1, 2)
            SELECT i.doc_a, i.doc_b, i.n_inter,
                   CAST(na.n AS BIGINT) AS n_a,
                   i.n_inter / CAST(na.n AS DOUBLE) AS containment
            FROM inter i JOIN sizes na ON na.doc_id = i.doc_a
            WHERE i.n_inter / CAST(na.n AS DOUBLE) >= 0.5
            ORDER BY i.doc_a, i.doc_b
        """,
        "decontaminate": _TEXT_CTE + _SHINGLE_CTE + """
            , split AS (
                SELECT doc_id,
                       ('0x' || substr(md5('split-v1:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100
                           AS bucket
                FROM documents),
            ex AS (SELECT doc_id, UNNEST(sh) AS s FROM g),
            eval_sh AS (
                SELECT DISTINCT s FROM ex JOIN split USING (doc_id)
                WHERE bucket >= 95 AND s <> ''),
            train AS (
                SELECT ex.doc_id, ex.s FROM ex JOIN split USING (doc_id)
                WHERE bucket < 95),
            agg AS (
                SELECT t.doc_id,
                       COUNT(CASE WHEN t.s <> '' THEN 1 END) AS n_shingles,
                       COUNT(CASE WHEN t.s <> '' AND e.s IS NOT NULL THEN 1 END)
                           AS n_overlap
                FROM train t LEFT JOIN eval_sh e ON t.s = e.s
                GROUP BY t.doc_id)
            SELECT doc_id, n_shingles, n_overlap,
                   CASE WHEN n_shingles > 0
                        THEN n_overlap / CAST(n_shingles AS DOUBLE)
                        ELSE 0.0 END AS overlap_frac,
                   (CASE WHEN n_shingles > 0
                         THEN n_overlap / CAST(n_shingles AS DOUBLE)
                         ELSE 0.0 END) >= 0.2 AS contaminated
            FROM agg
        """,
        "pack_sequences": _TEXT_CTE + """
            , n AS (
                SELECT doc_id,
                       CAST(CASE WHEN norm = '' THEN 0 ELSE len(toks) END AS BIGINT)
                           AS n_tokens,
                       CAST(doc_id % 8 AS BIGINT) AS shard
                FROM t),
            o AS (
                SELECT doc_id, shard, n_tokens,
                       CAST(COALESCE(SUM(n_tokens) OVER (
                           PARTITION BY shard ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                           AS BIGINT) AS offset_start
                FROM n)
            SELECT doc_id, shard, n_tokens, offset_start,
                   offset_start // 64 AS pack_id,
                   offset_start % 64 AS pack_offset,
                   (offset_start % 64) + n_tokens > 64 AS crosses_boundary
            FROM o
        """,
        "dataset_split": """
            WITH b AS (
                SELECT doc_id,
                       ('0x' || substr(md5('split-v1:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100
                           AS bucket
                FROM documents)
            SELECT doc_id, bucket,
                   CASE WHEN bucket < 90 THEN 'train'
                        WHEN bucket < 95 THEN 'val'
                        ELSE 'test' END AS split
            FROM b
        """,
        "dsir_weights": _DSIR_CTE + """
            SELECT doc_id, is_target, weight FROM w ORDER BY doc_id
        """,
        "lexical_diversity": _TEXT_CTE + """
            , tok AS (
                SELECT doc_id, unnest(toks) AS w FROM t),
            nz AS (SELECT doc_id, w FROM tok WHERE w != ''),
            per AS (SELECT doc_id, w, COUNT(*) AS c FROM nz GROUP BY 1, 2),
            agg AS (
                SELECT doc_id,
                       COUNT(*) AS n_types,
                       CAST(SUM(c) AS BIGINT) AS n_tokens,
                       CAST(SUM(c * (c - 1)) AS BIGINT) AS rep2
                FROM per GROUP BY 1)
            SELECT doc_id, n_types, n_tokens,
                   CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE)
                       AS type_token_ratio,
                   CASE WHEN n_tokens >= 2 THEN
                       CAST(rep2 AS DOUBLE)
                       / CAST(n_tokens * (n_tokens - 1) AS DOUBLE)
                   END AS simpson_index
            FROM agg ORDER BY doc_id
        """,
        "ngram_novelty": _TEXT_CTE + """
            , g AS (
                SELECT doc_id,
                       list_transform(
                           range(1, GREATEST(len(toks) - 2, 1) + 1),
                           i -> array_to_string(toks[i:i+2], ' ')) AS grams
                FROM t),
            dg AS (SELECT DISTINCT doc_id, unnest(grams) AS gr FROM g),
            first AS (SELECT gr, MIN(doc_id) AS first_doc FROM dg GROUP BY 1),
            per AS (
                SELECT dg.doc_id,
                       COUNT(*) AS n_grams,
                       CAST(SUM(CASE WHEN f.first_doc = dg.doc_id
                                THEN 1 ELSE 0 END) AS BIGINT) AS n_first
                FROM dg JOIN first f USING (gr) GROUP BY 1)
            SELECT d.doc_id, per.n_grams, per.n_first,
                   CAST(per.n_first AS DOUBLE) / CAST(per.n_grams AS DOUBLE)
                       AS novelty
            FROM d LEFT JOIN per ON d.doc_id = per.doc_id
            ORDER BY d.doc_id
        """,
        "dsir_resample": _DSIR_CTE + """
            SELECT doc_id, is_target, weight FROM w
            WHERE weight IS NOT NULL
            ORDER BY weight DESC, doc_id ASC LIMIT 100
        """,
        "chunk_tokens": _TEXT_CTE + """
            , base AS (
                SELECT doc_id, toks,
                       GREATEST(CAST(CEIL((len(toks) - 8) / 24.0) AS INT), 1)
                           AS n_chunks
                FROM t),
            ex AS (
                SELECT doc_id, toks,
                       unnest(range(n_chunks)) AS chunk_idx
                FROM base)
            SELECT doc_id,
                   CAST(chunk_idx AS INT) AS chunk_idx,
                   CAST(chunk_idx * 24 AS INT) AS chunk_start,
                   len(toks[chunk_idx * 24 + 1 : chunk_idx * 24 + 32]) AS n_tokens,
                   array_to_string(toks[chunk_idx * 24 + 1 : chunk_idx * 24 + 32], ' ')
                       AS chunk_text
            FROM ex
        """,
        "pii_scrub": r"""
            WITH d2 AS (
                SELECT doc_id,
                       text || CASE WHEN doc_id % 5 = 0
                               THEN ' contact: jane.doe@example.com or +1 555-123-4567'
                               ELSE '' END AS text
                FROM documents)
            SELECT doc_id,
                   md5(regexp_replace(
                        regexp_replace(text,
                            '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}',
                            '<EMAIL>', 'g'),
                        '\+?[0-9]{1,3}[-. ]?\(?[0-9]{3}\)?[-. ]?[0-9]{3}[-. ]?[0-9]{4}',
                        '<PHONE>', 'g')) AS scrubbed_md5,
                   len(regexp_extract_all(text,
                        '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}')) AS n_email,
                   len(regexp_extract_all(text,
                        '\+?[0-9]{1,3}[-. ]?\(?[0-9]{3}\)?[-. ]?[0-9]{3}[-. ]?[0-9]{4}')) AS n_phone
            FROM d2
        """,
        "repetition_features": _TEXT_CTE + """
            , g3 AS (
                SELECT doc_id,
                       CASE WHEN len(toks) >= 1 THEN
                           list_transform(range(1, GREATEST(len(toks) - 2, 1) + 1),
                               i -> array_to_string(toks[i:i+2], ' '))
                       ELSE [] END AS grams
                FROM t),
            g2 AS (
                SELECT doc_id,
                       CASE WHEN len(toks) >= 1 THEN
                           list_transform(range(1, GREATEST(len(toks) - 1, 1) + 1),
                               i -> array_to_string(toks[i:i+1], ' '))
                       ELSE [] END AS grams
                FROM t),
            row3 AS (
                SELECT doc_id, len(grams) AS n_3grams,
                       1.0 - len(list_distinct(grams))
                           / CAST(GREATEST(len(grams), 1) AS DOUBLE) AS dup_3gram_frac
                FROM g3),
            ex2 AS (SELECT doc_id, unnest(grams) AS g FROM g2),
            cnt2 AS (SELECT doc_id, g, COUNT(*) AS c FROM ex2 GROUP BY doc_id, g),
            top2 AS (SELECT doc_id, MAX(c) AS top_c, SUM(c) AS n_2grams
                     FROM cnt2 GROUP BY doc_id)
            SELECT r.doc_id, r.n_3grams, r.dup_3gram_frac,
                   CAST(COALESCE(t2.n_2grams, 0) AS BIGINT) AS n_2grams,
                   COALESCE(t2.top_c, 0)
                       / CAST(GREATEST(COALESCE(t2.n_2grams, 0), 1) AS DOUBLE)
                       AS top_2gram_frac
            FROM row3 r LEFT JOIN top2 t2 ON r.doc_id = t2.doc_id
        """,
        "vocab_topk": _TEXT_CTE + """
            , ex AS (SELECT unnest(toks) AS token FROM t)
            SELECT token, COUNT(*) AS n FROM ex
            WHERE token != ''
            GROUP BY token ORDER BY n DESC, token ASC LIMIT 50
        """,
        "stratified_sample": """
            WITH ranked AS (
                SELECT doc_id, lang,
                       ROW_NUMBER() OVER (PARTITION BY lang ORDER BY
                           ('0x' || substr(md5('sample-v1:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                               % 2147483647,
                           doc_id) AS sample_rank
                FROM documents)
            SELECT doc_id, lang, sample_rank FROM ranked WHERE sample_rank <= 20
        """,
        "value_histogram": """
            SELECT event_type AS metric,
                   CASE WHEN value < 0.0 THEN 0
                        WHEN value >= 100.0 THEN 11
                        ELSE CAST(FLOOR((value - 0.0) / 10.0) AS BIGINT) + 1
                   END AS bucket,
                   COUNT(*) AS n
            FROM events GROUP BY 1, 2
        """,
        "top_anomalies": _GOLD_CTE + _stats_cte(7) + """
            , derived AS (
                SELECT metric, metric_date, value, n,
                       s / n AS mu,
                       CASE WHEN (sq - (s * s) / n) / (n - 1) > 0
                            THEN SQRT((sq - (s * s) / n) / (n - 1)) ELSE 0.0 END AS sigma
                FROM stats
            ),
            zt AS (
                SELECT metric, metric_date, value,
                       CASE WHEN value IS NOT NULL AND n >= 2 AND sigma = 0 AND value != mu THEN 1e9
                            WHEN value IS NOT NULL AND n >= 2 AND sigma = 0 THEN 0.0
                            WHEN value IS NOT NULL AND n >= 2 THEN (value - mu) / sigma
                       END AS z,
                       CASE WHEN value IS NOT NULL AND n >= 2 AND sigma = 0 THEN value != mu
                            WHEN value IS NOT NULL AND n >= 2
                                 THEN ABS((value - mu) / sigma) >= 3.0
                            ELSE FALSE
                       END AS is_outlier
                FROM derived
            ),
            ranked AS (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY metric
                          ORDER BY ABS(z) DESC, metric_date ASC) AS sev_rank
                FROM zt WHERE z IS NOT NULL)
            SELECT metric, metric_date, value, z, is_outlier, sev_rank
            FROM ranked WHERE sev_rank <= 5
        """,
        "crossmodal_consensus": _TEXT_CTE + _SHINGLE_CTE + _minhash_sig_cte()
        + _minhash_band_cte()
        + _EMB_CTE.replace("WITH", ",", 1) + """
            , tpairs AS (
                SELECT p.doc_a, p.doc_b,
                       ("""
        + " + ".join(
            f"CASE WHEN a.m{i} = b.m{i} THEN 1 ELSE 0 END"
            for i in range(len(DD.MINHASH_PARAMS))
        )
        + """) / 16.0 AS est_jaccard
                FROM (SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
                      FROM bb l JOIN bb r
                        ON l.band = r.band AND l.bucket = r.bucket
                       AND l.doc_id < r.doc_id) p
                JOIN sig a ON a.doc_id = p.doc_a
                JOIN sig b ON b.doc_id = p.doc_b),
            epairs AS (
                SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
                       """ + _DOT.format(a="a.v", b="b.v") + """ / (a.n * b.n) AS cos_sim
                FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
                WHERE """ + _DOT.format(a="a.v", b="b.v") + """ / (a.n * b.n) >= 0.25)
            SELECT COALESCE(t.doc_a, x.doc_a) AS doc_a,
                   COALESCE(t.doc_b, x.doc_b) AS doc_b,
                   t.est_jaccard, x.cos_sim,
                   CASE WHEN t.doc_a IS NOT NULL AND x.doc_a IS NOT NULL THEN 'both'
                        WHEN t.doc_a IS NOT NULL THEN 'text_only'
                        ELSE 'embedding_only' END AS agreement
            FROM tpairs t FULL OUTER JOIN epairs x
              ON t.doc_a = x.doc_a AND t.doc_b = x.doc_b
        """,
        "dup_clusters": _TEXT_CTE.replace("WITH d AS", "WITH RECURSIVE d AS", 1)
        + _simhash_select() + """
            , blocks AS ("""
        + " UNION ALL ".join(
            f"SELECT doc_id, simhash, {b} AS band, (simhash >> {b * 15}) & 32767 AS block FROM sx"
            for b in range(4)
        )
        + """),
            sp AS (
                SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
                FROM blocks l JOIN blocks r
                  ON l.band = r.band AND l.block = r.block AND l.doc_id < r.doc_id
                WHERE bit_count(xor(l.simhash, r.simhash)) <= 3),
            edges AS (
                SELECT doc_a AS src, doc_b AS dst FROM sp
                UNION ALL
                SELECT doc_b AS src, doc_a AS dst FROM sp),
            reach AS (
                SELECT doc_id AS id, doc_id AS r FROM documents
                UNION
                SELECT e.src AS id, reach.r AS r
                FROM edges e JOIN reach ON reach.id = e.dst)
            SELECT id AS doc_id, MIN(r) AS cluster FROM reach GROUP BY id
        """,
        "simhash": _TEXT_CTE + _simhash_select() + """
            SELECT doc_id, simhash FROM sx
        """,
        "simhash_pairs": _TEXT_CTE + _simhash_select() + """
            , blocks AS ("""
        + " UNION ALL ".join(
            f"SELECT doc_id, simhash, {b} AS band, (simhash >> {b * 15}) & 32767 AS block FROM sx"
            for b in range(4)
        )
        + """)
            SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b,
                   bit_count(xor(l.simhash, r.simhash)) AS hamming
            FROM blocks l JOIN blocks r
              ON l.band = r.band AND l.block = r.block AND l.doc_id < r.doc_id
            WHERE bit_count(xor(l.simhash, r.simhash)) <= 3
        """,
        "text_token_stats": _TEXT_CTE + """
            SELECT doc_id,
                   CASE WHEN len(toks) = 1
                        THEN CASE WHEN toks[1] != '' THEN 1 ELSE 0 END
                        ELSE len(toks) END AS n_tokens,
                   list_reduce(list_transform(toks,
                        w -> CAST(CEIL(LENGTH(w) / 4.0) AS BIGINT)),
                        (a, b) -> a + b) AS n_pieces
            FROM t
        """,
        "doc_fingerprint": _TEXT_CTE + """
            SELECT doc_id,
                   ('0x' || substr(md5(norm), 1, 15))::BIGINT AS fp64,
                   list_min(list_transform(
                       generate_series(0, GREATEST(len(toks) - 5, 0)),
                       i -> ('0x' || substr(md5(array_to_string(
                                list_slice(toks, i + 1, i + 5), ' ')), 1, 15))::BIGINT
                   )) AS winnow_fp
            FROM t
        """,
        "text_quality": _TEXT_CTE + """
            , feats AS (
                SELECT doc_id,
                       LENGTH(text) AS n_chars,
                       len(toks) AS n_tokens,
                       LENGTH(REGEXP_REPLACE(LOWER(text), '[^a-z]+', '', 'g')) AS alpha,
                       LENGTH(REGEXP_REPLACE(text, '[^0-9]+', '', 'g')) AS digits,
                       LENGTH(REGEXP_REPLACE(text, '[^ ]+', '', 'g')) AS spaces,
                       len(list_filter(toks, x -> x = 'the'))
                       + len(list_filter(toks, x -> x = 'and'))
                       + len(list_filter(toks, x -> x = 'of'))
                       + len(list_filter(toks, x -> x = 'to'))
                       + len(list_filter(toks, x -> x = 'a'))
                       + len(list_filter(toks, x -> x = 'in'))
                       + len(list_filter(toks, x -> x = 'is')) AS stop_hits
                FROM t)
            SELECT doc_id, n_chars, n_tokens,
                   alpha / CAST(GREATEST(n_chars, 1) AS DOUBLE) AS alpha_ratio,
                   digits / CAST(GREATEST(n_chars, 1) AS DOUBLE) AS digit_ratio,
                   spaces / CAST(GREATEST(n_chars, 1) AS DOUBLE) AS space_ratio,
                   stop_hits / CAST(GREATEST(n_tokens, 1) AS DOUBLE) AS stop_ratio,
                   0.4 * (alpha / CAST(GREATEST(n_chars, 1) AS DOUBLE))
                   + 0.3 * LEAST(CAST(n_chars AS DOUBLE) / 500.0, 1.0)
                   + 0.3 * LEAST((stop_hits / CAST(GREATEST(n_tokens, 1) AS DOUBLE)) * 4.0, 1.0)
                       AS quality
            FROM feats
        """,
        "quality_percentiles": _TEXT_CTE + """
            , feats AS (
                SELECT doc_id, lang,
                       LENGTH(text) AS n_chars,
                       len(toks) AS n_tokens,
                       LENGTH(REGEXP_REPLACE(LOWER(text), '[^a-z]+', '', 'g')) AS alpha,
                       len(list_filter(toks, x -> x = 'the'))
                       + len(list_filter(toks, x -> x = 'and'))
                       + len(list_filter(toks, x -> x = 'of'))
                       + len(list_filter(toks, x -> x = 'to'))
                       + len(list_filter(toks, x -> x = 'a'))
                       + len(list_filter(toks, x -> x = 'in'))
                       + len(list_filter(toks, x -> x = 'is')) AS stop_hits
                FROM t),
            q AS (
                SELECT lang,
                       0.4 * (alpha / CAST(GREATEST(n_chars, 1) AS DOUBLE))
                       + 0.3 * LEAST(CAST(n_chars AS DOUBLE) / 500.0, 1.0)
                       + 0.3 * LEAST((stop_hits / CAST(GREATEST(n_tokens, 1) AS DOUBLE)) * 4.0, 1.0)
                           AS quality
                FROM feats)
            SELECT lang, COUNT(*) AS n_docs,
                   quantile_cont(quality, 0.5) AS q50,
                   quantile_cont(quality, 0.9) AS q90,
                   MIN(quality) AS q_min,
                   MAX(quality) AS q_max
            FROM q GROUP BY lang ORDER BY lang
        """,
        "corpus_curation": _TEXT_CTE + _LANG_SCORE_CTE + """
            , feats AS (
                SELECT doc_id,
                       LENGTH(text) AS n_chars,
                       len(toks) AS n_tokens,
                       LENGTH(REGEXP_REPLACE(LOWER(text), '[^a-z]+', '', 'g')) AS alpha,
                       len(list_filter(toks, x -> x = 'the'))
                       + len(list_filter(toks, x -> x = 'and'))
                       + len(list_filter(toks, x -> x = 'of'))
                       + len(list_filter(toks, x -> x = 'to'))
                       + len(list_filter(toks, x -> x = 'a'))
                       + len(list_filter(toks, x -> x = 'in'))
                       + len(list_filter(toks, x -> x = 'is')) AS stop_hits
                FROM t),
            q AS (
                SELECT doc_id, n_tokens,
                       0.4 * (alpha / CAST(GREATEST(n_chars, 1) AS DOUBLE))
                       + 0.3 * LEAST(CAST(n_chars AS DOUBLE) / 500.0, 1.0)
                       + 0.3 * LEAST((stop_hits / CAST(GREATEST(n_tokens, 1) AS DOUBLE)) * 4.0, 1.0)
                           AS quality
                FROM feats),
            pred AS (
                SELECT s.doc_id,
                       CASE WHEN mx > 0 THEN
                            CASE WHEN s_en = mx THEN 'en'
                                 WHEN s_de = mx THEN 'de'
                                 WHEN s_es = mx THEN 'es'
                                 WHEN s_fr = mx THEN 'fr'
                                 ELSE 'zh' END
                            ELSE 'und' END AS lang_pred,
                       ('0x' || substr(md5(d.norm), 1, 15))::BIGINT AS fingerprint
                FROM scored s JOIN d ON s.doc_id = d.doc_id),
            filt AS (
                SELECT p.doc_id, p.lang_pred, q.n_tokens, q.quality, p.fingerprint,
                       ROW_NUMBER() OVER (PARTITION BY p.fingerprint
                                          ORDER BY p.doc_id) AS rn
                FROM pred p JOIN q USING (doc_id)
                WHERE q.quality >= 0.5 AND p.lang_pred = 'en')
            SELECT doc_id, lang_pred, n_tokens, quality, fingerprint
            FROM filt WHERE rn = 1
        """,
        "text_langid": _TEXT_CTE + _LANG_SCORE_CTE + """
            SELECT doc_id, lang AS lang_true,
                   CASE WHEN mx > 0 THEN
                        CASE WHEN s_en = mx THEN 'en'
                             WHEN s_de = mx THEN 'de'
                             WHEN s_es = mx THEN 'es'
                             WHEN s_fr = mx THEN 'fr'
                             ELSE 'zh' END
                        ELSE 'und' END AS lang_pred,
                   lang = (CASE WHEN mx > 0 THEN
                        CASE WHEN s_en = mx THEN 'en'
                             WHEN s_de = mx THEN 'de'
                             WHEN s_es = mx THEN 'es'
                             WHEN s_fr = mx THEN 'fr'
                             ELSE 'zh' END
                        ELSE 'und' END) AS correct
            FROM scored
        """,
        "reliability_summary": _GOLD_CTE + _RELIABILITY_CTE + """
            , avgs AS (
                SELECT metric, COUNT(*) AS folds,
                       list_reduce(list(mape ORDER BY fold_index), (x,y) -> x+y) / COUNT(*) AS mape_agg,
                       list_reduce(list(rmse ORDER BY fold_index), (x,y) -> x+y) / COUNT(*) AS rmse_agg,
                       list_reduce(list(smape ORDER BY fold_index), (x,y) -> x+y) / COUNT(*) AS smape_agg,
                       CASE WHEN COUNT(*) >= 2 THEN (MAX(mape) - MIN(mape)) / 10.0
                            ELSE 0.0 END AS instability
                FROM fold_m GROUP BY metric)
            SELECT metric, folds, mape_agg, rmse_agg, smape_agg, instability,
                   CAST(FLOOR(GREATEST(0.0, LEAST(100.0,
                        100.0 - mape_agg / 2.0 - instability))) AS INTEGER) AS score
            FROM avgs
        """,
        # DuckDB's native ASOF JOIN is the oracle for our union+window
        # as-of implementation (operators/temporal.py)
        "asof_checkpoint": _GOLD_CTE + """
            , ck AS (
                SELECT metric,
                       CAST(metric_date AS TIMESTAMP) AS ck_ts,
                       value AS ck_value
                FROM (
                    SELECT metric, metric_date, value,
                           CAST(SUM(CAST(value AS DECIMAL(38,4)))
                                OVER (PARTITION BY metric) AS DOUBLE)
                               / COUNT(*) OVER (PARTITION BY metric) AS avg_v
                    FROM gold)
                WHERE value > avg_v)
            SELECT e.event_type AS metric, e.event_id, e.ts,
                   ck.ck_ts, ck.ck_value
            FROM events e
            ASOF JOIN ck
              ON e.event_type = ck.metric AND e.ts >= ck.ck_ts
        """,
        "range_join_campaigns": """
            WITH daily AS (
                SELECT CAST(ts AS DATE) AS d,
                       CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS total
                FROM events GROUP BY 1),
            camp AS (
                SELECT d AS peak_day,
                       CAST(d AS TIMESTAMP) - INTERVAL 2 DAY AS s,
                       CAST(d AS TIMESTAMP) + INTERVAL 3 DAY AS e
                FROM daily ORDER BY total DESC, d ASC LIMIT 3)
            SELECT c.peak_day,
                   COUNT(*) AS n_events,
                   CAST(SUM(CAST(ev.value AS DECIMAL(28,4))) AS DOUBLE) AS value_sum
            FROM events ev JOIN camp c
              ON ev.ts >= c.s AND ev.ts < c.e
            GROUP BY 1
        """,
        # oracle aggregates straight from raw events at month grain; the
        # Spark side cascades monthly FROM daily partials — a hash match
        # proves the rollup cascade is lossless
        "kpi_monthly_cascade": """
            SELECT CAST(date_trunc('month', CAST(ts AS DATE)) AS DATE) AS month,
                   event_type AS metric,
                   CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS value_sum,
                   COUNT(*) AS value_count,
                   CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE)
                       / NULLIF(COUNT(*), 0) AS value_avg
            FROM events GROUP BY 1, 2
        """,
        "dist_moments": """
            WITH sk AS (
                SELECT l_returnflag,
                       COUNT(*) AS n,
                       SUM(CAST(l_quantity AS DECIMAL(38,2))) AS s1,
                       SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,4))) AS s2,
                       SUM(CAST((l_quantity * l_quantity) * l_quantity AS DECIMAL(38,6))) AS s3,
                       SUM(CAST((l_quantity * l_quantity) * (l_quantity * l_quantity)
                                AS DECIMAL(38,8))) AS s4
                FROM lineitem GROUP BY 1),
            m AS (
                -- decimal -> double via VARCHAR: DuckDB's direct
                -- int128-decimal -> double cast is not correctly rounded
                -- (e.g. 25918681405.00000000 -> ...404.999996); string
                -- parse is, matching Spark's BigDecimal.doubleValue
                SELECT l_returnflag, n,
                       CAST(CAST(s1 AS VARCHAR) AS DOUBLE) / n AS mu,
                       CAST(CAST(s2 AS VARCHAR) AS DOUBLE) / n AS r2,
                       CAST(CAST(s3 AS VARCHAR) AS DOUBLE) / n AS r3,
                       CAST(CAST(s4 AS VARCHAR) AS DOUBLE) / n AS r4
                FROM sk),
            c AS (
                SELECT l_returnflag, n, mu,
                       r2 - mu * mu AS m2,
                       r3 - 3.0 * mu * r2 + 2.0 * mu * mu * mu AS m3,
                       r4 - 4.0 * mu * r3 + 6.0 * mu * mu * r2
                          - 3.0 * mu * mu * mu * mu AS m4
                FROM m)
            SELECT l_returnflag, n, mu AS mean,
                   m2 AS var_pop,
                   SQRT(m2) AS std_pop,
                   m3 / (m2 * SQRT(m2)) AS skewness,
                   m4 / (m2 * m2) - 3.0 AS kurtosis_excess
            FROM c
        """,
        "order_priority_semi": """
            SELECT o_orderpriority, COUNT(*) AS order_count
            FROM orders
            WHERE EXISTS (SELECT 1 FROM lineitem
                          WHERE l_orderkey = o_orderkey AND l_quantity >= 48)
            GROUP BY 1
        """,
        "cust_order_dist": """
            WITH per_cust AS (
                SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
                FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                GROUP BY 1)
            SELECT c_count, COUNT(*) AS custdist
            FROM per_cust GROUP BY 1
        """,
        "promo_share": """
            WITH j AS (
                SELECT CASE WHEN p.p_type LIKE 'PROMO%'
                            THEN l.l_extendedprice * (1 - l.l_discount)
                            ELSE 0.0 END AS promo_rev,
                       l.l_extendedprice * (1 - l.l_discount) AS rev
                FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
                WHERE l.l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
                  AND l.l_shipdate < TIMESTAMP '1995-10-01 00:00:00')
            SELECT CAST(SUM(CAST(promo_rev AS DECIMAL(28,4))) AS DOUBLE) AS promo_revenue,
                   CAST(SUM(CAST(rev AS DECIMAL(28,4))) AS DOUBLE) AS total_revenue,
                   100.0 * CAST(SUM(CAST(promo_rev AS DECIMAL(28,4))) AS DOUBLE)
                         / CAST(SUM(CAST(rev AS DECIMAL(28,4))) AS DOUBLE) AS promo_share
            FROM j
        """,
        # BM25 with rational-odds idf: identical expression trees to
        # functions/retrieval.py (ln() rounds differently across
        # engines, so the idf stays rational; term sums in decimal)
        "bm25_search": _BM25_SCORED + """
            SELECT doc_id, score FROM scored
            ORDER BY score DESC, doc_id ASC LIMIT 10
        """,
        "metrics_pivot": _GOLD_CTE + """
            SELECT metric_date,
                   CAST(SUM(CAST(CASE WHEN metric = 'click' THEN value END
                        AS DECIMAL(28,4))) AS DOUBLE) AS click,
                   CAST(SUM(CAST(CASE WHEN metric = 'error' THEN value END
                        AS DECIMAL(28,4))) AS DOUBLE) AS error,
                   CAST(SUM(CAST(CASE WHEN metric = 'purchase' THEN value END
                        AS DECIMAL(28,4))) AS DOUBLE) AS purchase,
                   CAST(SUM(CAST(CASE WHEN metric = 'signup' THEN value END
                        AS DECIMAL(28,4))) AS DOUBLE) AS signup,
                   CAST(SUM(CAST(CASE WHEN metric = 'view' THEN value END
                        AS DECIMAL(28,4))) AS DOUBLE) AS view
            FROM gold GROUP BY 1
        """,
        # oracle is the plain long-form daily aggregate: hash match
        # proves pivot -> unpivot is lossless end-to-end
        "unpivot_roundtrip": """
            SELECT CAST(ts AS DATE) AS metric_date,
                   event_type AS metric,
                   CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS value_sum
            FROM events GROUP BY 1, 2
        """,
        "small_qty_revenue": """
            WITH pq AS (
                SELECT l_partkey,
                       CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE)
                           / COUNT(*) AS avg_qty
                FROM lineitem GROUP BY 1)
            SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(28,4))) AS DOUBLE)
                       / 7.0 AS avg_yearly
            FROM lineitem l
            JOIN part p ON l.l_partkey = p.p_partkey
            JOIN pq ON l.l_partkey = pq.l_partkey
            WHERE p.p_brand = 'Brand#19'
              AND l.l_quantity < 0.2 * pq.avg_qty
        """,
        "big_orders": """
            WITH big AS (
                SELECT l_orderkey,
                       CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sum_qty
                FROM lineitem GROUP BY 1
                HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) > 300)
            SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
                   o.o_totalprice, big.sum_qty
            FROM big
            JOIN orders o ON big.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            ORDER BY o.o_totalprice DESC, o.o_orderkey ASC LIMIT 20
        """,
        "value_deciles": _GOLD_CTE + """
            , d AS (
                SELECT metric, value,
                       NTILE(10) OVER (PARTITION BY metric
                                       ORDER BY value ASC, metric_date ASC) AS decile
                FROM gold)
            SELECT metric, decile, COUNT(*) AS n,
                   MIN(value) AS lo, MAX(value) AS hi
            FROM d GROUP BY 1, 2
        """,
        "user_churn": """
            WITH h1 AS (
                SELECT DISTINCT user_id FROM events
                WHERE event_type = 'purchase' AND value >= 150
                  AND ts < TIMESTAMP '2024-01-16 00:00:00'),
            h2 AS (
                SELECT DISTINCT user_id FROM events
                WHERE event_type = 'purchase' AND value >= 150
                  AND ts >= TIMESTAMP '2024-01-16 00:00:00')
            SELECT
              (SELECT COUNT(*) FROM (SELECT * FROM h1 EXCEPT SELECT * FROM h2))
                  AS churned_users,
              (SELECT COUNT(*) FROM (SELECT * FROM h1 INTERSECT SELECT * FROM h2))
                  AS retained_users
        """,
        "disjunctive_revenue": """
            SELECT CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                          AS DECIMAL(28,4))) AS DOUBLE) AS revenue,
                   COUNT(*) AS line_count
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
                   AND l.l_quantity BETWEEN 1 AND 11)
               OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
                   AND l.l_quantity BETWEEN 10 AND 20)
               OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
                   AND l.l_quantity BETWEEN 20 AND 30)
        """,
        "shipping_priority": """
            SELECT l.l_orderkey, o.o_orderdate, o.o_orderpriority,
                   CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                                 AS DECIMAL(28,4))) AS DOUBLE) AS revenue
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            WHERE c.c_mktsegment = 'BUILDING'
              AND o.o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
              AND l.l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
            GROUP BY 1, 2, 3
            ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC LIMIT 10
        """,
        "top_supplier": """
            WITH rev AS (
                SELECT l_suppkey,
                       CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                                     AS DECIMAL(28,4))) AS DOUBLE) AS total_revenue
                FROM lineitem
                WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
                  AND l_shipdate <  TIMESTAMP '1998-04-01 00:00:00'
                GROUP BY 1)
            SELECT s.s_suppkey, s.s_name, rev.total_revenue
            FROM rev JOIN supplier s ON rev.l_suppkey = s.s_suppkey
            WHERE rev.total_revenue = (SELECT MAX(total_revenue) FROM rev)
            ORDER BY s.s_suppkey
        """,
        "waiting_suppliers": """
            WITH lo AS (
                SELECT l.l_orderkey, l.l_suppkey,
                       l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY AS late
                FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
                WHERE o.o_orderstatus = 'F'),
            po AS (
                SELECT l_orderkey,
                       COUNT(DISTINCT l_suppkey) AS n_supp,
                       COUNT(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late,
                       MAX(CASE WHEN late THEN l_suppkey END) AS late_supp
                FROM lo GROUP BY 1)
            SELECT s.s_name, COUNT(*) AS numwait
            FROM po JOIN supplier s ON po.late_supp = s.s_suppkey
            WHERE po.n_supp >= 2 AND po.n_late = 1
            GROUP BY 1 ORDER BY numwait DESC, s_name ASC LIMIT 10
        """,
        "idle_customers": """
            WITH seg AS (
                SELECT * FROM customer
                WHERE c_mktsegment IN ('AUTOMOBILE','BUILDING','MACHINERY')),
            ab AS (
                SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(28,4))) AS DOUBLE)
                           / COUNT(*) AS avg_bal
                FROM seg WHERE c_acctbal > 0)
            SELECT c_mktsegment, COUNT(*) AS numcust,
                   CAST(SUM(CAST(c_acctbal AS DECIMAL(28,4))) AS DOUBLE) AS totacctbal
            FROM seg, ab
            WHERE c_acctbal > ab.avg_bal
              AND NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = seg.c_custkey
                                AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
            GROUP BY 1 ORDER BY 1
        """,
        "bination_volume": """
            SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
                   EXTRACT(YEAR FROM l.l_shipdate) AS l_year,
                   CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                                 AS DECIMAL(28,4))) AS DOUBLE) AS revenue
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation nc ON c.c_nationkey = nc.n_nationkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation ns ON s.s_nationkey = ns.n_nationkey
            WHERE (ns.n_name = 'NATION_3' AND nc.n_name = 'NATION_7')
               OR (ns.n_name = 'NATION_7' AND nc.n_name = 'NATION_3')
            GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
        """,
        "market_share": """
            SELECT EXTRACT(YEAR FROM o.o_orderdate) AS o_year,
                   CAST(SUM(CASE WHEN ns.n_name = 'NATION_3'
                            THEN CAST(l.l_extendedprice * (1 - l.l_discount)
                                      AS DECIMAL(28,4)) END) AS DOUBLE)
                   / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                                   AS DECIMAL(28,4))) AS DOUBLE) AS mkt_share
            FROM lineitem l
            JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = 'PROMO'
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation nc ON c.c_nationkey = nc.n_nationkey
            JOIN region r ON nc.n_regionkey = r.r_regionkey AND r.r_name = 'EUROPE'
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation ns ON s.s_nationkey = ns.n_nationkey
            GROUP BY 1 ORDER BY 1
        """,
        "product_profit": """
            SELECT ns.n_name AS nation,
                   EXTRACT(YEAR FROM o.o_orderdate) AS o_year,
                   CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                                 AS DECIMAL(28,4))) AS DOUBLE) AS profit
            FROM lineitem l
            JOIN part p ON l.l_partkey = p.p_partkey AND p.p_name LIKE '%gear%'
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation ns ON s.s_nationkey = ns.n_nationkey
            GROUP BY 1, 2 ORDER BY 1, 2 DESC
        """,
        "returned_revenue": """
            SELECT c.c_custkey, c.c_name, c.c_acctbal, n.n_name,
                   CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                                 AS DECIMAL(28,4))) AS DOUBLE) AS revenue
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            WHERE l.l_returnflag = 'R'
              AND o.o_orderdate >= '1996-01-01' AND o.o_orderdate < '1996-04-01'
            GROUP BY 1, 2, 3, 4
            ORDER BY revenue DESC, c.c_custkey LIMIT 20
        """,
        "late_shipment_priority": """
            SELECT l.l_returnflag,
                   CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
                            THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
                   CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
                            THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE date_diff('day', CAST(o.o_orderdate AS DATE),
                            CAST(l.l_shipdate AS DATE)) > 90
            GROUP BY 1 ORDER BY 1
        """,
        "supplier_part_variety": """
            SELECT p.p_brand, p.p_size,
                   COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
            FROM lineitem l
            JOIN part p ON l.l_partkey = p.p_partkey
            WHERE p.p_type != 'PROMO' AND p.p_size <= 8
              AND p.p_brand != 'Brand#1'
            GROUP BY 1, 2
            ORDER BY supplier_cnt DESC, p.p_brand, p.p_size
        """,
        "top_volume_suppliers": """
            WITH per_supp AS (
                SELECT l.l_suppkey,
                       CAST(SUM(CAST(l.l_quantity AS DECIMAL(28,2))) AS DOUBLE)
                           AS qty
                FROM lineitem l
                JOIN part p ON l.l_partkey = p.p_partkey
                WHERE p.p_name LIKE 'small%'
                  AND l.l_shipdate >= '1996-01-01' AND l.l_shipdate < '1997-01-01'
                GROUP BY 1),
            thresh AS (
                SELECT CAST(SUM(CAST(qty AS DECIMAL(28,2))) AS DOUBLE)
                       / COUNT(*) AS avg_qty
                FROM per_supp)
            SELECT s.s_name, s.s_acctbal, ps.qty
            FROM per_supp ps, thresh t
            JOIN supplier s ON ps.l_suppkey = s.s_suppkey
            WHERE ps.qty > t.avg_qty
            ORDER BY s.s_name
        """,
        "clean_lines": _TEXT_CTE + """
            , lined AS (
                SELECT doc_id,
                       list_transform(
                           range(0, GREATEST(CAST(CEIL(len(toks) / 8.0) AS INT), 1)),
                           i -> array_to_string(toks[i*8+1 : i*8+8], ' ')
                                || CASE WHEN i % 3 = 0 THEN '.' ELSE '' END
                       ) AS lines
                FROM t),
            cleaned AS (
                SELECT doc_id, lines,
                       list_filter(lines,
                           l -> LENGTH(TRIM(l)) > 0
                                AND len(string_split_regex(TRIM(l), ' +')) >= 5
                                AND regexp_matches(TRIM(l), '[.!?"'']$')
                       ) AS kept
                FROM lined)
            SELECT doc_id,
                   CAST(len(lines) AS INTEGER) AS lines_total,
                   CAST(len(kept) AS INTEGER) AS lines_kept,
                   CAST(LENGTH(array_to_string(kept, chr(10))) AS INTEGER)
                       AS clean_len
            FROM cleaned
        """,
        "rare_tokens": _TEXT_CTE + """
            , ex AS (
                SELECT doc_id, unnest(toks) AS token FROM t),
            nz AS (SELECT * FROM ex WHERE token != ''),
            vocab AS (SELECT token, COUNT(*) AS tf FROM nz GROUP BY 1)
            SELECT nz.doc_id,
                   COUNT(*) AS n_tokens,
                   CAST(SUM(CASE WHEN v.tf < 3 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_rare,
                   CAST(SUM(CASE WHEN v.tf < 3 THEN 1 ELSE 0 END) AS DOUBLE)
                       / CAST(COUNT(*) AS DOUBLE) AS rare_frac
            FROM nz JOIN vocab v USING (token)
            GROUP BY 1
        """,
        "mixture_weights": """
            WITH per AS (
                SELECT source AS domain, COUNT(*) AS n_docs
                FROM documents GROUP BY 1),
            tot AS (
                SELECT CAST(SUM(n_docs) AS BIGINT) AS n_total,
                       list_reduce(
                           list(sqrt(CAST(n_docs AS DOUBLE)) ORDER BY domain),
                           (a, b) -> a + b) AS denom
                FROM per)
            SELECT domain, n_docs,
                   CAST(n_docs AS DOUBLE) / CAST(n_total AS DOUBLE) AS share,
                   sqrt(CAST(n_docs AS DOUBLE)) / denom AS weight
            FROM per, tot ORDER BY domain
        """,
        "semantic_dedup": _EMB_CTE.replace("WITH e AS", "WITH RECURSIVE e AS", 1)
        + """
            , sp AS (
                SELECT l.vec_id AS a, r.vec_id AS b
                FROM e l JOIN e r
                  ON l.bucket = r.bucket AND l.vec_id < r.vec_id
                WHERE """ + _DOT.format(a="l.v", b="r.v") + """
                      / (l.n * r.n) >= 0.25),
            edges AS (
                SELECT a AS src, b AS dst FROM sp
                UNION ALL
                SELECT b AS src, a AS dst FROM sp),
            reach AS (
                SELECT vec_id AS id, vec_id AS r FROM embeddings
                UNION
                SELECT e2.src AS id, reach.r AS r
                FROM edges e2 JOIN reach ON reach.id = e2.dst)
            SELECT id AS vec_id, MIN(r) AS cluster,
                   (MIN(r) = id) AS is_representative
            FROM reach GROUP BY id
        """,
        "duplicate_spans": _TEXT_CTE + """
            , w AS (
                SELECT doc_id, toks FROM t WHERE len(toks) >= 16),
            spans AS (
                SELECT doc_id, CAST(i AS BIGINT) AS pos,
                       ('0x' || substr(md5(
                            array_to_string(toks[i+1 : i+16], ' ')), 1, 15))::BIGINT
                           AS span_hash
                FROM w, LATERAL unnest(range(0, len(toks) - 16 + 1)) AS u(i)),
            agg AS (
                SELECT span_hash,
                       COUNT(DISTINCT doc_id) AS n_docs,
                       COUNT(*) AS n_occurrences,
                       MIN(doc_id * (1 << 20) + pos) AS rep
                FROM spans GROUP BY 1)
            SELECT span_hash, n_docs, n_occurrences,
                   CAST(rep // (1 << 20) AS BIGINT) AS rep_doc,
                   CAST(rep % (1 << 20) AS BIGINT) AS rep_pos
            FROM agg WHERE n_docs >= 2
        """,
        "hybrid_retrieval": _BM25_SCORED + """
            , b AS (
                SELECT doc_id,
                       ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC)
                           AS rank
                FROM scored QUALIFY rank <= 20),
            ev AS (
                SELECT vec_id, embedding AS v,
                       SQRT(list_reduce(list_transform(embedding,
                            x -> x::DOUBLE * x::DOUBLE), (x, y) -> x + y)) AS n
                FROM embeddings),
            qv AS (SELECT v AS q, n AS qn FROM ev WHERE vec_id = 0),
            sd AS (
                SELECT ev.vec_id AS doc_id,
                       """ + _DOT.format(a="qv.q", b="ev.v") + """
                           / (qv.qn * ev.n) AS cos
                FROM ev, qv WHERE ev.vec_id != 0),
            dn AS (
                SELECT doc_id,
                       ROW_NUMBER() OVER (ORDER BY cos DESC, doc_id ASC)
                           AS rank
                FROM sd QUALIFY rank <= 20)
            SELECT COALESCE(b.doc_id, dn.doc_id) AS doc_id,
                   b.rank AS rank_0, dn.rank AS rank_1,
                   COALESCE(1.0 / (60.0 + CAST(b.rank AS DOUBLE)), 0.0)
                   + COALESCE(1.0 / (60.0 + CAST(dn.rank AS DOUBLE)), 0.0)
                       AS rrf_score
            FROM b FULL OUTER JOIN dn ON b.doc_id = dn.doc_id
            ORDER BY rrf_score DESC, COALESCE(b.doc_id, dn.doc_id) ASC
            LIMIT 10
        """,
        "bigram_lm": _TEXT_CTE + """
            , w AS (SELECT toks FROM t WHERE len(toks) >= 2),
            bg AS (
                SELECT toks[i] AS w1, toks[i+1] AS w2
                FROM w, LATERAL unnest(range(1, len(toks))) AS u(i)
                WHERE toks[i] != '' AND toks[i+1] != ''),
            counts AS (SELECT w1, w2, COUNT(*) AS n FROM bg GROUP BY 1, 2),
            tots AS (SELECT w1, CAST(SUM(n) AS BIGINT) AS n_w1
                     FROM counts GROUP BY 1)
            SELECT c.w1, c.w2, c.n, tots.n_w1,
                   CAST(c.n AS DOUBLE) / CAST(tots.n_w1 AS DOUBLE) AS cond_p
            FROM counts c JOIN tots USING (w1)
            ORDER BY c.n DESC, c.w1, c.w2 LIMIT 50
        """,
        "length_coverage": _TEXT_CTE + """
            , n AS (
                SELECT CASE WHEN len(toks) = 1
                            THEN CASE WHEN toks[1] != '' THEN 1 ELSE 0 END
                            ELSE len(toks) END AS n_tokens
                FROM t),
            b AS (
                SELECT (n_tokens // 32) * 32 AS bucket_start,
                       COUNT(*) AS n_docs,
                       CAST(SUM(n_tokens) AS BIGINT) AS bucket_tokens
                FROM n GROUP BY 1)
            SELECT bucket_start, n_docs, bucket_tokens,
                   CAST(SUM(bucket_tokens) OVER (ORDER BY bucket_start
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS DOUBLE)
                   / CAST(SUM(bucket_tokens) OVER () AS DOUBLE)
                       AS cum_token_share
            FROM b ORDER BY bucket_start
        """,
        "anomaly_mad": _GOLD_CTE + """
            , med AS (
                SELECT metric, quantile_cont(value, 0.5) AS med
                FROM gold GROUP BY metric),
            wm AS (
                SELECT g.metric_date, g.metric, g.value, med.med
                FROM gold g JOIN med USING (metric)),
            mad AS (
                SELECT metric, quantile_cont(ABS(value - med), 0.5) AS mad
                FROM wm GROUP BY metric)
            SELECT wm.metric_date, wm.metric, wm.value,
                   CASE WHEN mad.mad > 0
                        THEN 0.6745 * (wm.value - wm.med) / mad.mad END AS mad_z,
                   CASE WHEN mad.mad > 0
                        THEN ABS(0.6745 * (wm.value - wm.med) / mad.mad) >= 3.5
                        ELSE wm.value != wm.med END AS is_outlier
            FROM wm JOIN mad USING (metric)
        """,
        "key_skew_report": """
            WITH counts AS (
                SELECT user_id AS k, COUNT(*) AS c
                FROM events GROUP BY 1),
            ranked AS (
                SELECT k, c,
                       ROW_NUMBER() OVER (ORDER BY c ASC, k ASC) AS i,
                       COUNT(*) OVER () AS n
                FROM counts)
            SELECT CAST(SUM(c) AS BIGINT) AS n_rows,
                   COUNT(*) AS n_keys,
                   CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS top1_share,
                   CAST(COALESCE(SUM(CASE WHEN i > n - 10 THEN c END), 0)
                        AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS top10_share,
                   2.0 * CAST(SUM(i * c) AS DOUBLE)
                       / (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(c) AS DOUBLE))
                   - CAST(COUNT(*) + 1 AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                       AS gini
            FROM ranked
        """,
        # CUSUM: prefix folds seeded by an explicit prepended 0.0 so the
        # DuckDB reduce matches Spark's aggregate(zero=0.0) exactly; the
        # negative branch is written (-1.0)*(x-mu) (not mu-x) to keep the
        # same IEEE expression tree; +0.0 normalizes signed zeros
        "cusum_changepoints": _GOLD_CTE + """
            , per AS (
                SELECT metric,
                       list(CAST(value AS DOUBLE) ORDER BY metric_date) AS vals,
                       list(metric_date ORDER BY metric_date) AS dates
                FROM gold GROUP BY metric),
            c AS (
                SELECT metric, dates, vals, len(vals) AS n,
                       list_reduce(list_prepend(0.0, vals), (a, x) -> a + x)
                           / CAST(len(vals) AS DOUBLE) AS mu
                FROM per),
            s AS (
                SELECT metric, dates, vals, mu,
                       list_transform(range(1, n + 1), i ->
                           list_reduce(list_prepend(0.0, vals[1:i]),
                               (a, x) -> GREATEST(0.0, a + (1.0 * (x - mu) - 0.0)))
                       ) AS sp,
                       list_transform(range(1, n + 1), i ->
                           list_reduce(list_prepend(0.0, vals[1:i]),
                               (a, x) -> GREATEST(0.0, a + (-1.0 * (x - mu) - 0.0)))
                       ) AS sn
                FROM c)
            SELECT metric,
                   unnest(dates) AS metric_date,
                   unnest(vals) AS value,
                   unnest(sp) + 0.0 AS cusum_pos,
                   unnest(sn) + 0.0 AS cusum_neg,
                   unnest(list_transform(range(1, len(vals) + 1),
                          i -> sp[i] > 50.0 OR sn[i] > 50.0)) AS is_changepoint
            FROM s
        """,
        # SES fold: DuckDB list_reduce seeds with the first element —
        # the Spark side mirrors that exactly (slice from 2, seed arr[1])
        "forecast_ewma": _GOLD_CTE + """
            , per AS (
                SELECT metric, MAX(metric_date) AS last_date,
                       list_reduce(list(CAST(value AS DOUBLE)
                                        ORDER BY metric_date),
                                   (a, x) -> 0.5 * x + 0.5 * a) AS level
                FROM gold GROUP BY metric)
            SELECT metric,
                   last_date + CAST(t.k AS INTEGER) AS target_date,
                   level AS yhat, level AS yhat_lower, level AS yhat_upper,
                   'ses-0.1' AS model_version
            FROM per CROSS JOIN generate_series(1, 7) t(k)
        """,
        "trimmed_stats": _GOLD_CTE + """
            , b AS (
                SELECT metric,
                       quantile_cont(value, 0.05) AS lo,
                       quantile_cont(value, 0.95) AS hi
                FROM gold GROUP BY metric)
            SELECT g.metric,
                   MIN(b.lo) AS p05,
                   MIN(b.hi) AS p95,
                   CAST(SUM(CASE WHEN g.value BETWEEN b.lo AND b.hi
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
                   COUNT(*) AS n_total,
                   CAST(SUM(CASE WHEN g.value BETWEEN b.lo AND b.hi
                            THEN CAST(g.value AS DECIMAL(28,4)) END) AS DOUBLE)
                   / SUM(CASE WHEN g.value BETWEEN b.lo AND b.hi
                         THEN 1 ELSE 0 END) AS trimmed_mean
            FROM gold g JOIN b USING (metric)
            GROUP BY g.metric ORDER BY g.metric
        """,
        "rolling_mad_zscore": _GOLD_CTE + """
            , fr AS (
                SELECT metric_date, metric, value,
                       list_sort(list(value) OVER (PARTITION BY metric
                           ORDER BY metric_date
                           ROWS BETWEEN 14 PRECEDING AND 1 PRECEDING)) AS arr
                FROM gold),
            m AS (
                SELECT *, len(arr) AS n,
                       CASE WHEN len(arr) = 0 THEN NULL
                            WHEN len(arr) % 2 = 1 THEN arr[len(arr) // 2 + 1]
                            ELSE (arr[len(arr) // 2] + arr[len(arr) // 2 + 1]) / 2.0
                       END AS med
                FROM fr),
            d AS (
                SELECT *, list_sort(list_transform(arr, x -> ABS(x - med))) AS devs
                FROM m),
            md AS (
                SELECT *, CASE WHEN n = 0 THEN NULL
                               WHEN n % 2 = 1 THEN devs[n // 2 + 1]
                               ELSE (devs[n // 2] + devs[n // 2 + 1]) / 2.0
                          END AS mad
                FROM d)
            SELECT metric_date, metric, value,
                   CASE WHEN n >= 5 AND mad > 0
                        THEN 0.6745 * (value - med) / mad END AS mad_z,
                   CASE WHEN n >= 5 AND mad > 0
                        THEN ABS(0.6745 * (value - med) / mad) >= 3.5
                        WHEN n >= 5 THEN value != med
                        ELSE FALSE END AS is_outlier
            FROM md
        """,
        "forecast_snaive": _GOLD_CTE + """
            , per AS (SELECT metric, MAX(metric_date) AS last_date
                      FROM gold GROUP BY metric)
            SELECT g.metric,
                   g.metric_date + 7 AS target_date,
                   CAST(g.value AS DOUBLE) AS yhat,
                   CAST(g.value AS DOUBLE) AS yhat_lower,
                   CAST(g.value AS DOUBLE) AS yhat_upper,
                   'snaive-0.1' AS model_version
            FROM gold g JOIN per USING (metric)
            WHERE g.metric_date > per.last_date - 7
              AND g.metric_date + 7 <= per.last_date + 7
        """,
    }


#: W6 backtest fold construction (naive model), shared by two oracles.
#: folds=3, horizon=7, window_n=14 ⇒ tail 35 rows per metric.
_BACKTEST_CTE = """
    , tail AS (
        SELECT metric, metric_date, value,
               ROW_NUMBER() OVER (PARTITION BY metric ORDER BY metric_date DESC) AS rd
        FROM gold),
    s AS (
        SELECT metric, metric_date, value,
               ROW_NUMBER() OVER (PARTITION BY metric ORDER BY metric_date) AS rn
        FROM tail WHERE rd <= 35),
    lens AS (SELECT metric, MAX(rn) AS len FROM s GROUP BY metric),
    spec AS (
        SELECT l.metric, l.len, f.fold_index, l.len - (f.fold_index + 1) * 7 AS fstart
        FROM lens l CROSS JOIN generate_series(0, 2) f(fold_index)
        WHERE l.len - (f.fold_index + 1) * 7 >= 8),
    pred AS (
        SELECT sp.metric, sp.fold_index, sp.fstart, s.value AS p
        FROM spec sp JOIN s ON s.metric = sp.metric AND s.rn = sp.fstart),
    test AS (
        SELECT pr.metric, pr.fold_index, pr.p, s.rn, s.value AS a
        FROM pred pr JOIN s ON s.metric = pr.metric
                            AND s.rn > pr.fstart AND s.rn <= pr.fstart + 7),
    fold_m AS (
        SELECT metric, fold_index,
               CAST(SUM(CAST(ABS(a - p) AS DECIMAL(38,4))) AS DOUBLE) / COUNT(*) AS mae,
               SQRT(CAST(SUM(CAST((a - p) * (a - p) AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*)) AS rmse,
               (list_reduce(list(ABS(a - p) / GREATEST(ABS(a), 1e-6) ORDER BY rn),
                            (x, y) -> x + y) / COUNT(*)) * 100.0 AS mape,
               100.0 * (list_reduce(list(ABS(a - p) /
                            (CASE WHEN ABS(a) + ABS(p) = 0.0 THEN 1.0 ELSE ABS(a) + ABS(p) END)
                        ORDER BY rn), (x, y) -> x + y) / COUNT(*)) AS smape
        FROM test GROUP BY metric, fold_index)
"""

#: W7 reliability fold construction: days=30, folds=3, horizon=7.
_RELIABILITY_CTE = """
    , tail AS (
        SELECT metric, metric_date, value,
               ROW_NUMBER() OVER (PARTITION BY metric ORDER BY metric_date DESC) AS rd
        FROM gold),
    s AS (
        SELECT metric, metric_date, value,
               ROW_NUMBER() OVER (PARTITION BY metric ORDER BY metric_date) AS rn
        FROM tail WHERE rd <= 30),
    lens AS (SELECT metric, MAX(rn) AS n,
                    LEAST(3, GREATEST(0, MAX(rn) - 8)) AS folds_eff
             FROM s GROUP BY metric),
    spec AS (
        SELECT l.metric, l.n, l.folds_eff, f.fold_index,
               l.n - (l.folds_eff - f.fold_index) * 7 AS train_end
        FROM lens l CROSS JOIN generate_series(0, 2) f(fold_index)
        WHERE l.folds_eff > 0 AND f.fold_index < l.folds_eff
          AND l.n - (l.folds_eff - f.fold_index) * 7 >= 1),
    pred AS (
        SELECT sp.metric, sp.fold_index, sp.train_end, s.value AS p
        FROM spec sp JOIN s ON s.metric = sp.metric AND s.rn = sp.train_end),
    test AS (
        SELECT pr.metric, pr.fold_index, pr.p, s.rn, s.value AS a
        FROM pred pr JOIN s ON s.metric = pr.metric
                            AND s.rn > pr.train_end AND s.rn <= pr.train_end + 7),
    fold_m AS (
        SELECT metric, fold_index,
               CAST(SUM(CAST(ABS(a - p) AS DECIMAL(38,4))) AS DOUBLE) / COUNT(*) AS mae,
               SQRT(CAST(SUM(CAST((a - p) * (a - p) AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*)) AS rmse,
               list_reduce(list(ABS(a - p) / (ABS(a) + 1e-9) ORDER BY rn),
                           (x, y) -> x + y) * 100.0 / COUNT(*) AS mape,
               list_reduce(list(2.0 * ABS(a - p) / (ABS(a) + ABS(p) + 1e-9) ORDER BY rn),
                           (x, y) -> x + y) * 100.0 / COUNT(*) AS smape,
               CAST(SUM(CAST(p - a AS DECIMAL(38,4))) AS DOUBLE) / COUNT(*) AS bias
        FROM test GROUP BY metric, fold_index)
"""


#: normalized text + token CTE mirroring functions/text.py (RE2 syntax for
#: the unicode ranges; Java regex uses \\uXXXX — same character classes)
_TEXT_CTE = """
    WITH d AS (
        SELECT doc_id, text, lang,
               TRIM(REGEXP_REPLACE(LOWER(text),
                    '[^a-z0-9\\x{00c0}-\\x{024f}\\x{4e00}-\\x{9fff}]+', ' ', 'g')) AS norm
        FROM documents),
    t AS (SELECT d.*, string_split(norm, ' ') AS toks FROM d)
"""

#: DSIR importance-weight pipeline (mirrors functions/sampling.py
#: importance_weights op-for-op: same md5 bucketing, same Laplace
#: smoothing, same (A/B)·(R/T) double-expression order; the VARCHAR
#: hop before each DOUBLE cast forces DuckDB's correctly-rounded
#: string parse — its direct int128→double cast is 1 ulp off past 2^53)
_DSIR_CTE = _TEXT_CTE + """
    , bg AS (
        SELECT doc_id, (lang = 'en') AS is_tgt,
               toks[i] || ' ' || toks[i+1] AS b
        FROM t, LATERAL unnest(range(1, len(toks))) AS u(i)
        WHERE len(toks) >= 2 AND toks[i] != '' AND toks[i+1] != ''),
    feat AS (
        SELECT doc_id, is_tgt,
               ('0x' || substr(md5('dsir-v1:' || b), 1, 15))::BIGINT % 4096
                   AS bk,
               COUNT(*) AS c
        FROM bg GROUP BY 1, 2, 3),
    buckets AS (
        SELECT bk, SUM(c) AS raw,
               SUM(CASE WHEN is_tgt THEN c ELSE 0 END) AS tgt
        FROM feat GROUP BY 1),
    tots AS (SELECT SUM(tgt) + 4096 AS tt, SUM(raw) + 4096 AS rr
             FROM buckets),
    scored AS (
        SELECT f.doc_id,
               SUM(f.c * (b.tgt + 1)) AS a,
               SUM(f.c * (b.raw + 1)) AS bb
        FROM feat f JOIN buckets b USING (bk) GROUP BY 1),
    w AS (
        SELECT d.doc_id, (d.lang = 'en') AS is_target,
               (CAST(CAST(s.a AS VARCHAR) AS DOUBLE)
                / CAST(CAST(s.bb AS VARCHAR) AS DOUBLE))
               * (CAST(CAST(t.rr AS VARCHAR) AS DOUBLE)
                  / CAST(CAST(t.tt AS VARCHAR) AS DOUBLE)) AS weight
        FROM d LEFT JOIN scored s ON d.doc_id = s.doc_id CROSS JOIN tots t)
"""


def _lang_score_cte() -> str:
    """per-language stopword-hit sums, generated from the SAME profile
    constant the Spark side uses (functions/text.py LANG_PROFILES)."""
    parts = []
    for lang, words in TX.LANG_PROFILES.items():
        hits = " + ".join(
            f"len(list_filter(toks, x -> x = '{w}'))" for w in words
        )
        parts.append(f"{hits} AS s_{lang}")
    langs = ", ".join(f"s_{lang}" for lang in TX.LANG_PROFILES)
    return f"""
    , raw_scores AS (SELECT doc_id, lang, {", ".join(parts)} FROM t),
    scored AS (SELECT *, GREATEST({langs}) AS mx FROM raw_scores)
    """


_LANG_SCORE_CTE = _lang_score_cte()

_NORM_RE = "[^a-z0-9\\x{00c0}-\\x{024f}\\x{4e00}-\\x{9fff}]+"

#: strict left-fold dot product (mirrors similarity.dot: float→double
#: widening then index-order accumulation)
#: BM25 posting/scoring CTEs (ends with CTE `scored`), shared by the
#: plain bm25_search oracle and the hybrid RRF fusion oracle
_BM25_SCORED = _TEXT_CTE + """
            , post AS (
                SELECT doc_id, token AS term, COUNT(*) AS tf
                FROM (SELECT doc_id, unnest(toks) AS token FROM t)
                WHERE token != '' GROUP BY 1, 2),
            dl AS (SELECT doc_id, SUM(tf) AS dl FROM post GROUP BY 1),
            stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM dl),
            hits AS (SELECT * FROM post
                     WHERE term IN ('spark', 'hash', 'merge')),
            dft AS (SELECT term, COUNT(*) AS df FROM hits GROUP BY 1),
            scored AS (
                SELECT h.doc_id,
                       CAST(SUM(CAST(
                           ((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
                              / (CAST(df AS DOUBLE) + 0.5) + 1.0)
                           * (CAST(h.tf AS DOUBLE) * 2.2
                              / (CAST(h.tf AS DOUBLE)
                                 + 1.2 * (0.25 + 0.75 * CAST(dl.dl AS DOUBLE)
                                          / (CAST(sum_dl AS DOUBLE)
                                             / CAST(n_docs AS DOUBLE)))))
                         AS DECIMAL(38,12))) AS DOUBLE) AS score
                FROM hits h
                JOIN dft USING (term)
                JOIN dl USING (doc_id), stats
                GROUP BY 1)
"""

_DOT = (
    "list_reduce(list_transform(list_zip({a}, {b}), "
    "s -> s[1]::DOUBLE * s[2]::DOUBLE), (x, y) -> x + y)"
)

#: embeddings with precomputed L2 norm and 8-bit sign-LSH bucket
_EMB_CTE = """
    WITH e AS (
        SELECT vec_id, embedding AS v,
               SQRT(list_reduce(list_transform(embedding,
                    x -> x::DOUBLE * x::DOUBLE), (x, y) -> x + y)) AS n,
               """ + " + ".join(
    f"CASE WHEN embedding[{i + 1}] > 0 THEN (1::BIGINT << {i}) ELSE 0::BIGINT END"
    for i in range(8)
) + """ AS bucket
        FROM embeddings)
"""
_H60 = "('0x' || substr(md5({expr}), 1, 15))::BIGINT"

#: 3-gram shingle-set CTE (appended to _TEXT_CTE)
_SHINGLE_CTE = """
    , g AS (
        SELECT doc_id, list_distinct(list_transform(
                   generate_series(0, GREATEST(len(toks) - 3, 0)),
                   i -> array_to_string(list_slice(toks, i + 1, i + 3), ' '))) AS sh
        FROM t)
"""


def _minhash_sig_cte() -> str:
    """MinHash signature CTE generated from the SAME hash family the
    Spark side uses (functions/dedup.py MINHASH_PARAMS, p = 2^31-1)."""
    h = _H60.format(expr="s")
    mins = ", ".join(
        f"list_min(list_transform(h, x -> ({a} * x + {b}) % 2147483647)) AS m{i}"
        for i, (a, b) in enumerate(DD.MINHASH_PARAMS)
    )
    return f"""
    , hs AS (SELECT doc_id, list_transform(sh, s -> {h} % 2147483647) AS h FROM g),
    sig AS (SELECT doc_id, {mins} FROM hs)
    """


def _minhash_band_cte(bands: int = 4, rows: int = 4) -> str:
    pieces = []
    for b in range(bands):
        cat = " || ',' || ".join(
            f"m{b * rows + r}::VARCHAR" for r in range(rows)
        )
        bucket = _H60.format(expr=f"({cat})")
        pieces.append(
            f"SELECT doc_id, {b} AS band, {bucket} AS bucket FROM sig"
        )
    return ", bb AS (" + " UNION ALL ".join(pieces) + ")"


def _simhash_select(src: str = "t") -> str:
    """60-bit simhash expression generated to mirror functions/dedup.simhash."""
    h = _H60.format(expr="x")
    terms = " + ".join(
        f"CASE WHEN list_reduce(list_transform(h, x2 -> CASE WHEN (x2 >> {j}) & 1 = 1 "
        f"THEN 1 ELSE -1 END), (a, b) -> a + b) > 0 THEN (1::BIGINT << {j}) "
        f"ELSE 0::BIGINT END"
        for j in range(60)
    )
    return f"""
    , hs2 AS (SELECT doc_id, list_transform(list_distinct(toks), x -> {h}) AS h
              FROM {src}),
    sx AS (SELECT doc_id, ({terms}) AS simhash FROM hs2)
    """


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_kpi_daily(spark, SF0001)


# --------------------------------------------------------------------------
# Property-bound oracles (round-7, verdict r6 task #8): the six
# randomized/trained queries admit no bit-exact SQL twin, but each
# satisfies a CHECKABLE property against an exact computation —
# tools/check_correctness.py runs these where oracle_sql() has no entry
# and records a `property_match` verdict instead of a bare row count.
# Floors are pinned ~25% below the measured sf0.01 value so legitimate
# seed/version drift passes while a broken model fails loudly.
# --------------------------------------------------------------------------


def _recall_vs(approx: DataFrame, exact: DataFrame) -> float:
    """|approx ∩ exact| / |exact| on (query_id, neighbor_id) pairs."""
    total = exact.count()
    if not total:
        return 0.0
    hit = approx.join(exact, ["query_id", "neighbor_id"]).count()
    return hit / total


def p_ivf_kmeans_topk(spark: SparkSession, sf_dir: str) -> dict:
    """IVF recall@10 against exact cosine top-k (brute_force_topk is the
    oracle-checked exact path). 8-cell multi-probe of 16 trained cells
    (r14 — nprobe lifted the measured recall to 0.90; the floor rises
    0.30 → 0.60 per the r13 VERDICT, still ~33% under measured so
    seed/version drift passes while a broken probe path fails)."""
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    approx = q_ivf_kmeans_topk(spark, sf_dir).select("query_id", "neighbor_id")
    exact = SIM.brute_force_topk(emb, queries, k=10).select(
        "query_id", "neighbor_id"
    )
    r = _recall_vs(approx, exact)
    floor = 0.60
    return {
        "ok": r >= floor,
        "metric": round(r, 4),
        "floor": floor,
        "property": "recall@10 vs exact cosine top-k",
    }


def p_pq_topk(spark: SparkSession, sf_dir: str) -> dict:
    """PQ-ADC recall@10 against exact squared-L2 top-k (ADC approximates
    L2 ranking, so L2 — not cosine — is its ground truth)."""
    from pyspark.sql import Window

    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    approx = q_pq_topk(spark, sf_dir).select("query_id", "neighbor_id")
    q = queries.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("_qv")
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("_cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "_d",
            F.aggregate(
                F.zip_with("_qv", "_cv", lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("_d").asc(), F.col("neighbor_id").asc()
    )
    exact = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("query_id", "neighbor_id")
    )
    r = _recall_vs(approx, exact)
    floor = 0.35
    return {
        "ok": r >= floor,
        "metric": round(r, 4),
        "floor": floor,
        "property": "recall@10 vs exact L2 top-k",
    }


def p_minhash_lsh_mllib(spark: SparkSession, sf_dir: str) -> dict:
    """Precision property: every MLlib-LSH pair must be a TRUE
    near-duplicate — exact shingle-set Jaccard ≥ floor (the join
    threshold is distance 0.5 ⇒ Jaccard ≥ 0.5 up to HashingTF
    collisions, which only INFLATE the hashed estimate; 0.45 allows
    that slack). Candidate-set containment is exactly what the
    from-scratch banded-LSH oracle pins; this bounds the MLlib route."""
    pairs = q_minhash_lsh_mllib(spark, sf_dir).select("doc_a", "doc_b")
    d = _docs(spark, sf_dir)
    sh = d.select(
        F.col("doc_id"),
        F.array_distinct(
            DD.shingles(DD.tokens(F.col("text")), 3)
        ).alias("_sh"),
    ).filter(F.size("_sh") > 0)
    floor = 0.45
    j = (
        pairs.join(sh.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .withColumnRenamed("_sh", "_sa")
        .join(sh.withColumnRenamed("doc_id", "doc_b"), "doc_b")
        .withColumn(
            "_jac",
            F.size(F.array_intersect("_sa", "_sh"))
            / F.size(F.array_union("_sa", "_sh")),
        )
    )
    n = j.count()
    bad = j.filter(F.col("_jac") < floor).count()
    return {
        "ok": bad == 0 and n > 0,
        "metric": round(1.0 - (bad / n if n else 1.0), 4),
        "floor": 1.0,
        "property": f"all pairs have exact shingle-Jaccard >= {floor}",
    }


def _iforest_property(df: DataFrame, contamination: float) -> dict:
    """Decision-consistency: per series, the outlier set must be a
    score-EXTREME set (min outlier score >= max inlier score, or the
    sign-flipped orientation for sklearn decision_function), and the
    flagged count must respect the contamination quantile TIE-AWARE:
    rows STRICTLY above the cut score are bounded by the quantile; the
    tie block AT the cut is flagged wholesale (quantile semantics on
    tied data — the 10× salted sweep repeats every daily KPI value
    once per replica, so ties of replica width are expected, and a
    fixed +1 allowance written for continuous scores misfires)."""
    stats = df.groupBy("metric").agg(
        F.min(F.when(F.col("is_outlier"), F.col("score"))).alias("_mino"),
        F.max(F.when(F.col("is_outlier"), F.col("score"))).alias("_maxo"),
        F.min(F.when(~F.col("is_outlier"), F.col("score"))).alias("_mini"),
        F.max(F.when(~F.col("is_outlier"), F.col("score"))).alias("_maxi"),
        F.sum(F.when(F.col("is_outlier"), 1).otherwise(0)).alias("_nout"),
        F.count(F.when(F.col("score").isNotNull(), 1)).alias("_n"),
    )
    strict = (
        df.join(F.broadcast(stats.select("metric", "_mino", "_maxo")), "metric")
        .groupBy("metric")
        .agg(
            # orientation-aware: strictly beyond the cut on whichever
            # side the outlier block sits
            F.sum(
                F.when(
                    F.col("is_outlier")
                    & (
                        (F.col("score") > F.col("_mino"))
                        & (F.col("score") <= F.col("_maxo"))
                    ),
                    1,
                ).otherwise(0)
            ).alias("_nstrict_hi"),
            F.sum(
                F.when(
                    F.col("is_outlier")
                    & (
                        (F.col("score") < F.col("_maxo"))
                        & (F.col("score") >= F.col("_mino"))
                    ),
                    1,
                ).otherwise(0)
            ).alias("_nstrict_lo"),
        )
    )
    stats = stats.join(strict, "metric", "left")
    extreme_ok = (
        F.col("_nout") == 0
    ) | (F.col("_mino") >= F.col("_maxi")) | (F.col("_maxo") <= F.col("_mini"))
    cap = F.ceil(F.lit(contamination) * F.col("_n")) + F.lit(1)
    count_ok = (F.col("_nout") <= cap) | (
        F.least(
            F.coalesce(F.col("_nstrict_hi"), F.lit(0)),
            F.coalesce(F.col("_nstrict_lo"), F.lit(0)),
        )
        <= cap
    )
    n_series = stats.count()
    bad = stats.filter(~(extreme_ok & count_ok)).count()
    return {
        "ok": bad == 0 and n_series > 0,
        "metric": round(1.0 - (bad / n_series if n_series else 1.0), 4),
        "floor": 1.0,
        "property": "outliers are the per-series score-extreme "
        f"top-{contamination} quantile set",
    }


def p_anomaly_iforest_numpy(spark: SparkSession, sf_dir: str) -> dict:
    return _iforest_property(q_anomaly_iforest_numpy(spark, sf_dir), 0.05)


def p_anomaly_iforest_4d(spark: SparkSession, sf_dir: str) -> dict:
    return _iforest_property(q_anomaly_iforest_4d(spark, sf_dir), 0.05)


def p_quality_classifier(spark: SparkSession, sf_dir: str) -> dict:
    """Separation: the trained model must score the hand-quality
    positive extreme above the negative extreme by a margin — the same
    weak labels it was fitted on (GPT-3's own sanity check shape)."""
    d = _docs(spark, sf_dir)
    q = TX.quality_features(d).select("doc_id", "quality")
    scored = q_quality_classifier(spark, sf_dir).select("doc_id", "quality_prob")
    row = (
        scored.join(q, "doc_id")
        .agg(
            F.avg(
                F.when(F.col("quality") >= 0.62, F.col("quality_prob"))
            ).alias("pos"),
            F.avg(
                F.when(F.col("quality") <= 0.55, F.col("quality_prob"))
            ).alias("neg"),
        )
        .first()
    )
    margin = float(row["pos"] - row["neg"])
    floor = 0.15
    return {
        "ok": margin >= floor,
        "metric": round(margin, 4),
        "floor": floor,
        "property": "mean score(pos extreme) - mean score(neg extreme)",
    }


def p_pq_rerank_topk(spark: SparkSession, sf_dir: str) -> dict:
    """Re-ranked PQ must recover most of the exact L2 top-k — the
    shortlist-then-rerank pattern's whole point. Floor well above the
    bare-ADC floor (0.35)."""
    from pyspark.sql import Window

    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    approx = q_pq_rerank_topk(spark, sf_dir).select("query_id", "neighbor_id")
    q = queries.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("_qv")
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("_cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "_d",
            F.aggregate(
                F.zip_with("_qv", "_cv", lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("_d").asc(), F.col("neighbor_id").asc()
    )
    exact = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("query_id", "neighbor_id")
    )
    r = _recall_vs(approx, exact)
    floor = 0.70
    return {
        "ok": r >= floor,
        "metric": round(r, 4),
        "floor": floor,
        "property": "recall@10 vs exact L2 top-k (rerank path)",
    }


def property_checks() -> dict[str, Callable[[SparkSession, str], dict]]:
    """One entry per rows-only query (every queries() key missing from
    oracle_sql()) — the correctness harness runs these and records a
    `property_match` verdict."""
    return {
        "ivf_kmeans_topk": p_ivf_kmeans_topk,
        "pq_topk": p_pq_topk,
        "minhash_lsh_mllib": p_minhash_lsh_mllib,
        "anomaly_iforest_numpy": p_anomaly_iforest_numpy,
        "anomaly_iforest_4d": p_anomaly_iforest_4d,
        "quality_classifier": p_quality_classifier,
        "pq_rerank_topk": p_pq_rerank_topk,
    }
