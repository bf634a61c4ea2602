"""Scaling probe: time representative operators at 1×/2×/4× the sf
data (self-union with shifted keys/dates and per-replica text/vector
perturbation, so key cardinality scales with volume) and report the
observed scaling exponent log2(t4/t1)/2 — ~1.0 means linear.

Usage: python tools/scale_probe.py [sf_dir]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from smartdatapipeline_spark.functions import dedup as DD
from smartdatapipeline_spark.functions import layout as LY
from smartdatapipeline_spark.functions import retrieval as RT
from smartdatapipeline_spark.functions import sketch as SK
from smartdatapipeline_spark.functions import bpe as BP
from smartdatapipeline_spark.operators import behavior as BH
from smartdatapipeline_spark.operators import forecast as FC
from smartdatapipeline_spark.operators import metrics as MT
from smartdatapipeline_spark.operators import quality as QL
from smartdatapipeline_spark.operators import temporal as TP
from smartdatapipeline_spark.functions import similarity as SIM
from smartdatapipeline_spark.operators.kpi import run_daily_kpis
from smartdatapipeline_spark.operators.sessions import sessionize
from smartdatapipeline_spark.session import get_spark, read_events


def scaled_events(spark, sf_dir, n):
    ev = read_events(spark, sf_dir)
    reps = [
        ev.withColumn("ts", F.col("ts") + F.expr(f"INTERVAL {32 * i} DAYS"))
        .withColumn("user_id", F.col("user_id") + 1_000_000 * i)
        for i in range(n)
    ]
    out = reps[0]
    for r in reps[1:]:
        out = out.unionByName(r)
    return out.repartition(spark.sparkContext.defaultParallelism)


def scaled_events_samedays(spark, sf_dir, n):
    """Volume scale-up with the DAY GRAIN HELD CONSTANT (user space
    scales, calendar doesn't) — the shape that isolates sketch-merge
    cost: per-day HLL register tables are ≤ days×m rows no matter how
    many events fed them, so the daily→range merge must be ~flat in n."""
    ev = read_events(spark, sf_dir)
    reps = [
        ev.withColumn("user_id", F.col("user_id") + 1_000_000 * i)
        for i in range(n)
    ]
    out = reps[0]
    for r in reps[1:]:
        out = out.unionByName(r)
    return out.repartition(spark.sparkContext.defaultParallelism)


_HLL_REG_CACHE: dict[int, str] = {}


def _hll_reg_path(spark, sf_dir, n) -> str:
    """Materialize (once per scale) the per-day HLL register table for
    the same-days scaled events — the PRE-EXISTING daily partials a
    100-TB rollup would read; building them is the `hll_build` probe's
    job, not the merge probe's."""
    import tempfile

    if n not in _HLL_REG_CACHE:
        path = os.path.join(
            tempfile.gettempdir(), f"sdp_scaleprobe_hllreg_{os.getpid()}_{n}"
        )
        ev = scaled_events_samedays(spark, sf_dir, n).filter(
            F.col("user_id").isNotNull()
        )
        SK.hll_partial(
            ev.withColumn("day", F.to_date("ts")), "user_id", by=["day"], p=8
        ).write.mode("overwrite").parquet(path)
        _HLL_REG_CACHE[n] = path
    return _HLL_REG_CACHE[n]


def _hll_merge_probe(spark, sf_dir, n):
    reg = spark.read.parquet(_hll_reg_path(spark, sf_dir, n))
    return SK.hll_raw_estimate(
        SK.hll_reaggregate(reg, drop=["day"], by=["day"]), p=8
    )


# first call at each scale materializes the registers (untimed warm
# pass); the timed pass reads only the constant-size register table
_hll_merge_probe.warm_each_scale = True


def scaled_docs(spark, sf_dir, n):
    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    reps = [
        d.withColumn("doc_id", F.col("doc_id") + 1_000_000 * i)
        .withColumn("text", F.concat(F.col("text"), F.lit(f" replica{i}")))
        for i in range(n)
    ]
    out = reps[0]
    for r in reps[1:]:
        out = out.unionByName(r)
    return out.repartition(spark.sparkContext.defaultParallelism, "doc_id")


def scaled_docs_salted(spark, sf_dir, n):
    """Replica texts perturbed by per-replica vowel+consonant rotation
    (20 distinct transforms, so near-dup family size stays ~constant as
    n grows). The plain ``scaled_docs`` keeps replicas near-identical —
    right for probing guard behavior (minhash mega-buckets), wrong for
    probing operator scaling on a healthy corpus: a corpus that is 97%
    one dup family makes ANY pairwise op look quadratic because the true
    OUTPUT is quadratic. This variant holds dup density constant."""
    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    v, c = "aeiou", "tnsr"
    reps = []
    for i in range(n):
        rv = v[i % 5 :] + v[: i % 5]
        rc = c[i % 4 :] + c[: i % 4]
        reps.append(
            d.withColumn("doc_id", F.col("doc_id") + 1_000_000 * i).withColumn(
                "text", F.translate(F.translate(F.col("text"), v, rv), c, rc)
            )
        )
    out = reps[0]
    for r in reps[1:]:
        out = out.unionByName(r)
    return out.repartition(spark.sparkContext.defaultParallelism, "doc_id")


def scaled_emb_rotated(spark, sf_dir, n):
    """Replica embeddings with per-replica direction noise (sin of
    index×replica) so replicas are NOT mutual cosine-dups — same
    rationale as ``scaled_docs_salted``: cosine is scale-invariant, so
    the plain multiplicative perturbation leaves every replica an exact
    near-dup of its original and the true pair OUTPUT quadratic."""
    e = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    reps = []
    for i in range(n):
        reps.append(
            e.withColumn("vec_id", F.col("vec_id") + 1_000_000 * i).withColumn(
                "embedding",
                F.transform(
                    F.col("embedding"),
                    lambda x, j: x
                    + 0.4 * F.sin(j.cast("double") * F.lit(1.0 + float(i))),
                ),
            )
        )
    out = reps[0]
    for r in reps[1:]:
        out = out.unionByName(r)
    return out.repartition(spark.sparkContext.defaultParallelism, "vec_id")


def scaled_emb(spark, sf_dir, n):
    e = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    reps = [
        e.withColumn("vec_id", F.col("vec_id") + 1_000_000 * i).withColumn(
            "embedding",
            F.transform(F.col("embedding"), lambda x: x * (1.0 + 0.001 * i)),
        )
        for i in range(n)
    ]
    out = reps[0]
    for r in reps[1:]:
        out = out.unionByName(r)
    return out.repartition(spark.sparkContext.defaultParallelism, "vec_id")


def scaled_parts(spark, sf_dir, n):
    """Replica parts with per-replica letter rotation on names — block
    keys differ per replica, so block COUNT scales with volume while
    block SIZE stays constant (the healthy-catalog shape; the
    same-name mega-block case is what the guard is for)."""
    p = spark.read.parquet(os.path.join(sf_dir, "part.parquet"))
    v, c = "aeiou", "tnsr"
    reps = []
    for i in range(n):
        rv = v[i % 5 :] + v[: i % 5]
        rc = c[i % 4 :] + c[: i % 4]
        reps.append(
            p.withColumn("p_partkey", F.col("p_partkey") + 1_000_000 * i)
            .withColumn(
                "p_name", F.translate(F.translate(F.col("p_name"), v, rv), c, rc)
            )
        )
    out = reps[0]
    for r in reps[1:]:
        out = out.unionByName(r)
    return out.repartition(spark.sparkContext.defaultParallelism)


def _canonical(spark, sf_dir, n):
    from smartdatapipeline_spark.functions import text as TX

    d = scaled_docs_salted(spark, sf_dir, n)
    clusters = DD.duplicate_clusters(DD.simhash_near_pairs(d, max_hamming=3), d)
    quality = TX.quality_features(d).select("doc_id", "quality")
    return DD.canonical_from_clusters(clusters, quality)


def _semantic(spark, sf_dir, n):
    import math as _m

    emb = scaled_emb_rotated(spark, sf_dir, n)
    nbits = 8 + max(0, round(_m.log2(n)))
    pairs = SIM.embedding_near_dup_pairs(emb, threshold=0.25, nbits=nbits)
    clusters = DD.duplicate_clusters(
        pairs, emb, id_col="vec_id", a_col="vec_a", b_col="vec_b"
    )
    return clusters.select(
        "vec_id", "cluster", (F.col("cluster") == F.col("vec_id")).alias("is_rep")
    )


def _hybrid(spark, sf_dir, n):
    from pyspark.sql import Window

    from smartdatapipeline_spark.functions import retrieval as RT

    bm25 = RT.bm25_topk(
        scaled_docs_salted(spark, sf_dir, n), ["spark", "hash", "merge"], k=20
    )
    wb = Window.orderBy(F.desc("score"), F.col("doc_id").asc())
    bm25_r = bm25.select("doc_id", F.row_number().over(wb).alias("rank"))
    emb = scaled_emb_rotated(spark, sf_dir, n)
    dense = SIM.brute_force_topk(emb, emb.filter(F.col("vec_id") == 0), k=20)
    dense_r = dense.select(F.col("neighbor_id").alias("doc_id"), "rank")
    return RT.rrf_fuse([bm25_r, dense_r], k=60, topk=10)


def _funnel(spark, sf_dir, n):
    from smartdatapipeline_spark.operators.behavior import funnel

    return funnel(scaled_events(spark, sf_dir, n))


def _retention(spark, sf_dir, n):
    from smartdatapipeline_spark.operators.behavior import retention_cohorts

    return retention_cohorts(scaled_events(spark, sf_dir, n), max_weeks=200)


def _scrub(spark, sf_dir, n):
    d = scaled_docs_salted(spark, sf_dir, n)
    ev = d.filter(F.col("doc_id") % 97 == 0)
    return DD.scrub_contaminated_spans(d, ev, window=13, k=3)


def _pagerank_probe(spark, sf_dir, n):
    from smartdatapipeline_spark.functions.graph import pagerank, symmetrize

    users = scaled_events(spark, sf_dir, n).select("user_id").distinct()
    # bounded-degree synthetic graph: 3 out-edges per node, targets
    # spread by multiplicative hashing over the scaled node space
    edges = users.select(
        F.col("user_id").alias("src"),
        F.explode(
            F.array(
                *[
                    F.pmod(
                        F.col("user_id") * (2654435761 + i) + i,
                        F.lit(1_000_000 * max(n, 1)),
                    )
                    for i in (1, 2, 3)
                ]
            )
        ).alias("dst"),
    )
    return pagerank(symmetrize(edges), iterations=3)


def _jaccard_probe(spark, sf_dir, n):
    ev = scaled_events(spark, sf_dir, n)
    baskets = ev.select(
        F.col("user_id").alias("cust"),
        F.pmod(F.xxhash64("event_id", "user_id"), F.lit(1000 * max(n, 1))).alias(
            "part"
        ),
    ).distinct()
    return SIM.basket_jaccard_pairs(baskets, "cust", "part", top_k=20)


_KMV_REG_CACHE: dict[int, str] = {}
_DY_REG_CACHE: dict[int, str] = {}


def _kmv_reg_path(spark, sf_dir, n) -> str:
    """Materialize (once per scale) per-day bottom-k partials — the
    stored daily sketches a KMV-store range read folds (round 10)."""
    import tempfile

    if n not in _KMV_REG_CACHE:
        path = os.path.join(
            tempfile.gettempdir(), f"sdp_scaleprobe_kmvreg_{os.getpid()}_{n}"
        )
        ev = scaled_events_samedays(spark, sf_dir, n).filter(
            F.col("user_id").isNotNull()
        )
        SK.kmv_partial(
            ev.withColumn("day", F.to_date("ts")), "user_id", by=["day"], k=64
        ).write.mode("overwrite").parquet(path)
        _KMV_REG_CACHE[n] = path
    return _KMV_REG_CACHE[n]


def _kmv_fold_probe(spark, sf_dir, n):
    reg = spark.read.parquet(_kmv_reg_path(spark, sf_dir, n))
    return SK.kmv_distinct(SK.kmv_fold(reg, k=64), k=64)


_kmv_fold_probe.warm_each_scale = True


def _dyadic_reg_path(spark, sf_dir, n) -> str:
    """Materialize per-day dyadic-CMS cell grids — the stored daily
    quantile partials a dyadic-store range read folds (round 10)."""
    import tempfile

    if n not in _DY_REG_CACHE:
        path = os.path.join(
            tempfile.gettempdir(), f"sdp_scaleprobe_dyreg_{os.getpid()}_{n}"
        )
        ev = (
            scaled_events_samedays(spark, sf_dir, n)
            .filter(F.col("value").isNotNull())
            .withColumn("day", F.to_date("ts"))
            .withColumn("_sv", F.floor(F.col("value") * 100).cast("long"))
        )
        SK.dyadic_cms_partial(
            ev, "_sv", levels=16, depth=4, width=2048, by=["day"]
        ).write.mode("overwrite").parquet(path)
        _DY_REG_CACHE[n] = path
    return _DY_REG_CACHE[n]


def _dyadic_fold_probe(spark, sf_dir, n):
    reg = spark.read.parquet(_dyadic_reg_path(spark, sf_dir, n))
    return reg.groupBy("level", "row", "cell").agg(F.sum("n").alias("n"))


_dyadic_fold_probe.warm_each_scale = True


def _bloom_probe(spark, sf_dir, n):
    from smartdatapipeline_spark.functions.bloom import bloom_semi_join

    ev = scaled_events(spark, sf_dir, n)
    small = ev.select("user_id").distinct().filter(F.col("user_id") % 37 == 0)
    return bloom_semi_join(ev, small, "user_id", "user_id").groupBy(
        "event_type"
    ).count()


def _overlap_probe(spark, sf_dir, n):
    """interval×interval overlap at scale: promo windows around the
    top-4·n revenue days × per-(scaled)metric burst windows — both
    interval sets grow with volume, co-bucketed pair work only."""
    from pyspark.sql.window import Window

    from smartdatapipeline_spark.operators import temporal as T

    ev = scaled_events(spark, sf_dir, n).select("ts", "event_type", "value")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).alias("total")
    )
    promo = (
        daily.orderBy(F.col("total").desc(), F.col("d").asc())
        .limit(4 * n)
        .select(
            F.col("d").alias("peak_day"),
            (F.col("d").cast("timestamp") - F.expr("INTERVAL 2 DAYS")).alias("a_start"),
            (F.col("d").cast("timestamp") + F.expr("INTERVAL 3 DAYS")).alias("a_end"),
        )
    )
    md = ev.groupBy(
        F.col("event_type").alias("metric"), F.to_date("ts").alias("d")
    ).agg(F.count(F.lit(1)).alias("nn"))
    wm = Window.partitionBy("metric").orderBy(F.col("nn").desc(), F.col("d").asc())
    burst = (
        md.withColumn("_rn", F.row_number().over(wm))
        .filter(F.col("_rn") <= 2)
        .select(
            "metric",
            (F.col("d").cast("timestamp") - F.expr("INTERVAL 1 DAYS")).alias("b_start"),
            (F.col("d").cast("timestamp") + F.expr("INTERVAL 2 DAYS")).alias("b_end"),
        )
    )
    return T.interval_overlap_join(
        promo, burst, "a_start", "a_end", "b_start", "b_end"
    )


def _quantile_probe(spark, sf_dir, n):
    from smartdatapipeline_spark.functions.sketch import exact_quantile_two_pass

    ev = scaled_events(spark, sf_dir, n).select("value")
    v = exact_quantile_two_pass(ev, "value", 0.99)
    return spark.range(1).select(F.lit(float(v)).alias("p99"))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def run(build, n):
        # time plan CONSTRUCTION + execution: iterative ops
        # (duplicate_clusters) execute eagerly via localCheckpoint during
        # construction, so timing only the final action would miss them
        t0 = time.perf_counter()
        build(n).write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    from smartdatapipeline_spark.functions import text as TX
    from smartdatapipeline_spark.operators.forecast import forecast_drift

    def drift_series(n):
        ev = scaled_events(spark, sf_dir, n)
        g = run_daily_kpis(ev, metric_col="event_type", source_col=None)
        return g.select(
            "metric_date", "metric", F.col("value_sum").alias("value")
        )

    def _hll_merge_op(n):
        return _hll_merge_probe(spark, sf_dir, n)

    _hll_merge_op.warm_each_scale = True

    def _kmv_fold_op(n):
        return _kmv_fold_probe(spark, sf_dir, n)

    _kmv_fold_op.warm_each_scale = True

    def _dyadic_fold_op(n):
        return _dyadic_fold_probe(spark, sf_dir, n)

    _dyadic_fold_op.warm_each_scale = True

    ops = {
        "kpi_daily": lambda n: run_daily_kpis(
            scaled_events(spark, sf_dir, n),
            metric_col="event_type",
            distinct_field="user_id",
            source_col=None,
        ),
        "sessionization": lambda n: sessionize(scaled_events(spark, sf_dir, n)),
        "minhash_pairs": lambda n: DD.minhash_candidate_pairs(
            scaled_docs(spark, sf_dir, n)
        ),
        "ann_bucketed_topk": lambda n: SIM.ann_bucketed_topk(
            scaled_emb(spark, sf_dir, n),
            spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).filter(
                F.col("vec_id") % 50 == 0
            ),
            k=10,
            nbits=8,
        ),
        # round-2 additions: scan-speed curation, corpus-bounded shuffle
        # pair, and the grouped-map model path (scales with series count —
        # user_id shifting multiplies metric×replica series via event_type)
        "clean_lines": lambda n: TX.clean_lines(scaled_docs(spark, sf_dir, n)),
        "rare_tokens": lambda n: TX.rare_token_fraction(
            scaled_docs(spark, sf_dir, n)
        ),
        "forecast_drift": lambda n: forecast_drift(drift_series(n)),
        # round-3 additions (VERDICT item 6): the five round-2 ops with
        # no published exponent. canonical_docs/semantic_dedup probe on
        # the salted/rotated corpora (constant dup density — see those
        # helpers); semantic_dedup scales LSH bits with volume
        # (nbits = 8 + log2(n)) the way a deployment holds bucket
        # occupancy constant, keeping the pair space O(corpus).
        "canonical_docs": lambda n: _canonical(spark, sf_dir, n),
        "semantic_dedup": lambda n: _semantic(spark, sf_dir, n),
        "duplicate_spans": lambda n: DD.duplicate_spans(
            scaled_docs_salted(spark, sf_dir, n), window=16, min_docs=2
        ),
        "hybrid_retrieval": lambda n: _hybrid(spark, sf_dir, n),
        "bigram_lm": lambda n: TX.bigram_counts(scaled_docs_salted(spark, sf_dir, n)),
        "funnel": lambda n: _funnel(spark, sf_dir, n),
        "retention_cohorts": lambda n: _retention(spark, sf_dir, n),
        # dedup_pipeline runs on the PATHOLOGICAL replica corpus
        # (near-identical replicas — the 99%-dup family that measured
        # exponent 1.09 on unguarded minhash at 128×) with the default
        # mega-bucket guard ON: the probe demonstrates the guard keeps
        # the production path sub-quadratic exactly where the unguarded
        # pair generator goes super-linear.
        "dedup_pipeline_guarded": lambda n: DD.dedup_pipeline(
            scaled_docs(spark, sf_dir, n)
        ),
        "bigram_lm_score": lambda n: TX.bigram_lm_score(
            scaled_docs_salted(spark, sf_dir, n)
        ),
        "scrub_spans": lambda n: _scrub(spark, sf_dir, n),
        # round-3 scale ops: MG sketch (scan + O(P*k) shuffle), Morton
        # key (pure scan), guarded blocked ER (block count scales, block
        # size constant), capped co-occurrence (users scale, per-user
        # item cap bounds the pair fan-out)
        "heavy_hitters": lambda n: SK.heavy_hitters(
            scaled_docs(spark, sf_dir, n)
            .select(F.explode(F.split(F.lower(F.col("text")), " ")).alias("token"))
            .filter(F.col("token") != ""),
            "token",
            k=100,
        ),
        "zorder_curve": lambda n: LY.zorder_key(
            scaled_events(spark, sf_dir, n).select("event_id", "user_id", "value"),
            ["user_id", "value"],
            bits=8,
        ),
        "fuzzy_pairs_guarded": lambda n: DD.fuzzy_name_pairs(
            scaled_parts(spark, sf_dir, n)
        ),
        "cooccurrence": lambda n: BH.cooccurrence_topk(
            scaled_events(spark, sf_dir, n)
        ),
        # round-3 batch: graph/similarity/window/bloom/fold additions.
        # pagerank probes on a synthetic bounded-degree graph over the
        # scaled user space (node count scales, degree constant — the
        # healthy shape; hub graphs need the two-level fold noted in
        # functions/graph.py). copurchase item space scales with volume
        # so block size stays constant (same rationale as scaled_parts).
        "graph_pagerank": lambda n: _pagerank_probe(spark, sf_dir, n),
        "copurchase_jaccard": lambda n: _jaccard_probe(spark, sf_dir, n),
        "sliding_active_users": lambda n: TP.sliding_distinct_users(
            scaled_events(spark, sf_dir, n)
        ),
        "bloom_semi_join": lambda n: _bloom_probe(spark, sf_dir, n),
        "phrase_search": lambda n: RT.phrase_search(
            scaled_docs_salted(spark, sf_dir, n), "data stream"
        ),
        "running_balance": lambda n: TP.running_balance(
            scaled_events(spark, sf_dir, n), F.col("value")
        ),
        "activity_streaks": lambda n: BH.activity_streaks(
            scaled_events(spark, sf_dir, n)
        ),
        "exact_quantile": lambda n: _quantile_probe(spark, sf_dir, n),
        # prefix-filtered exact set-similarity join: salted corpus keeps
        # dup density constant; candidates come from rare-prefix tokens
        # only, so volume growth adds blocks, not block size
        "setjoin_prefix": lambda n: DD.set_similarity_join(
            scaled_docs_salted(spark, sf_dir, n), threshold=0.7
        ),
        "cep_pattern": lambda n: BH.cep_pattern(scaled_events(spark, sf_dir, n)),
        "cohort_ltv": lambda n: BH.cohort_ltv(scaled_events(spark, sf_dir, n)),
        "time_weighted_avg": lambda n: TP.time_weighted_avg(
            scaled_events(spark, sf_dir, n)
        ),
        "attribution_linear": lambda n: BH.attribution_linear(
            scaled_events(spark, sf_dir, n)
        ),
        "audience_overlap": lambda n: BH.audience_overlap(
            scaled_events(spark, sf_dir, n)
        ),
        "growth_accounting": lambda n: BH.growth_accounting(
            scaled_events(spark, sf_dir, n)
        ),
        # round-4 (VERDICT #8): the round-3 late wave. theilsen's pair
        # space is day-grain² per series (bounded by calendar span, not
        # volume — user shifting grows the series count instead);
        # acf_daily post-fix is one explode-join-agg; benford/mix_shift
        # are scan + day-grain rollups.
        "theilsen_trend": lambda n: FC.theilsen_trend(
            scaled_events(spark, sf_dir, n)
        ),
        "acf_daily": lambda n: FC.acf_daily(scaled_events(spark, sf_dir, n)),
        "benford_audit": lambda n: QL.benford_audit(
            scaled_events(spark, sf_dir, n), "value"
        ),
        "mix_shift": lambda n: MT.mix_shift(scaled_events(spark, sf_dir, n)),
        # round-4 wave probes (preempting the per-wave exponent ask):
        # doc_keywords is postings-volume-bound; sorted_neighborhood is
        # the LINEAR N·w pair space by construction; rolling_median and
        # late_arrival are one-shuffle window ops; interval_overlap's
        # pair work is co-bucketed intervals only; bpe is bounded by the
        # VOCAB (replica salting grows it with volume); skyline is
        # sort + window; checksums are a pure hash aggregation.
        "doc_keywords": lambda n: RT.doc_keywords(
            scaled_docs_salted(spark, sf_dir, n)
        ),
        "sorted_neighborhood": lambda n: DD.sorted_neighborhood_pairs(
            scaled_parts(spark, sf_dir, n)
        ),
        "rolling_median": lambda n: TP.rolling_median_daily(
            scaled_events(spark, sf_dir, n)
        ),
        "late_arrival": lambda n: QL.late_arrival_stats(
            scaled_events(spark, sf_dir, n)
            .withColumn(
                "_arr",
                F.unix_timestamp("ts")
                + F.conv(
                    F.substring(F.md5(F.col("event_id").cast("string")), 1, 15),
                    16,
                    10,
                ).cast("long")
                % 120,
            ),
            arrival_col="_arr",
            tiebreak_col="event_id",
        ),
        "interval_overlap": lambda n: _overlap_probe(spark, sf_dir, n),
        "bpe_merges": lambda n: BP.bpe_train(
            scaled_docs_salted(spark, sf_dir, n), n_merges=3
        ),
        "skyline_parts": lambda n: QL.skyline_front(
            scaled_parts(spark, sf_dir, n),
            minimize="p_retailprice",
            maximize="p_size",
            id_col="p_partkey",
            by=("p_brand",),
        ),
        "partition_checksums": lambda n: QL.partition_checksums(
            scaled_events(spark, sf_dir, n),
            F.to_date("ts"),
            ("event_id", "user_id", "event_type"),
            "value",
        ),
        # round-9 (VERDICT #8): the wired sketch family. hll_build and
        # cms_build are scan-bound (exponent ≈1, map-side combine
        # collapses every task to ≤m / ≤depth·width rows pre-shuffle);
        # hll_merge reads PRE-MATERIALIZED daily registers whose size is
        # constant in event volume (same-days scaling) — the 100-TB
        # claim is exponent ≈0 for the daily→range merge stage.
        "hll_build": lambda n: SK.hll_partial(
            scaled_events(spark, sf_dir, n)
            .filter(F.col("user_id").isNotNull())
            .withColumn("day", F.to_date("ts")),
            "user_id",
            by=["day"],
            p=8,
        ),
        "hll_merge": _hll_merge_op,
        "kmv_fold": _kmv_fold_op,
        "dyadic_fold": _dyadic_fold_op,
        "cms_build": lambda n: SK.cms_partial(
            scaled_events(spark, sf_dir, n).filter(
                F.col("user_id").isNotNull()
            ),
            "user_id",
            depth=4,
            width=256,
        ),
        # round-9 late additions: KMV build (distinct shuffle + the
        # two-level bottom-k fold — the window runs over per-bucket
        # slices, never one task) and Bloom build (scan + one bit_or
        # groupBy over ≤ m/60 words — map-side combine collapses every
        # task to the word table)
        "kmv_build": lambda n: SK.kmv_partial(
            scaled_events(spark, sf_dir, n).filter(
                F.col("user_id").isNotNull()
            ),
            "user_id",
            k=64,
        ),
        "bloom_build": lambda n: SK.bloom_partial(
            scaled_events(spark, sf_dir, n).filter(
                F.col("user_id").isNotNull()
            ),
            "user_id",
            m_bits=1 << 20,
            n_hashes=4,
        ),
    }
    # scales far enough apart that real work dwarfs fixed per-query
    # overhead (~0.5-1s planning/scheduling at this sf); warm each op
    # untimed at 1x first so footer/codegen caches don't bill scale 2.
    only = set(sys.argv[2:])
    lo, hi = 2, int(os.environ.get("SPARK_GRAFT_PROBE_HI", "32"))
    results = {}
    for name, build in ops.items():
        if only and name not in only:
            continue
        run(build, 1)
        if getattr(build, "warm_each_scale", False):
            # probes over pre-materialized inputs: the first call at a
            # scale builds the input (not the thing being measured) —
            # burn it untimed so the timed pass measures only the op
            run(build, lo)
            run(build, hi)
        t_lo, t_hi = run(build, lo), run(build, hi)
        exponent = round(math.log(t_hi / t_lo) / math.log(hi / lo), 2)
        results[name] = {f"t{lo}": t_lo, f"t{hi}": t_hi, "exponent": exponent}
        print(json.dumps({"op": name, **results[name]}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
