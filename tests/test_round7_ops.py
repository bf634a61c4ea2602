"""Round-7 operators: Mann–Kendall trend test, deterministic sign
random projection (JL), and PQ shortlist-then-rerank search."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


# ----------------------------------------------------- Mann–Kendall


def _mk(spark, vals):
    import datetime as dt

    rows = [
        (dt.datetime(2024, 1, 1 + i, 12, 0), "m", float(v))
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "ts timestamp, event_type string, value double")
    from smartdatapipeline_spark.operators.forecast import mann_kendall

    return mann_kendall(df).collect()[0]


def test_mann_kendall_monotone_increasing(spark):
    r = _mk(spark, [1, 2, 3])
    assert r["n_days"] == 3 and r["s_stat"] == 3
    assert r["tau"] == 1.0
    assert r["var_s"] == 66.0 / 18.0
    assert r["z"] == 2.0 / math.sqrt(66.0 / 18.0)


def test_mann_kendall_tie_correction(spark):
    # [1, 1, 2]: S = 0+1+1 = 2; value 1 ties t=2 -> tie term 2*1*9 = 18
    r = _mk(spark, [1, 1, 2])
    assert r["s_stat"] == 2
    assert r["var_s"] == (66.0 - 18.0) / 18.0
    assert r["z"] == 1.0 / math.sqrt(48.0 / 18.0)


def test_mann_kendall_no_trend_and_degenerate(spark):
    r = _mk(spark, [5, 5, 5])  # all tied: S=0, var=0 -> z NULL
    assert r["s_stat"] == 0 and r["var_s"] == 0.0 and r["z"] is None
    r1 = _mk(spark, [7])  # single day: tau NULL, z NULL
    assert r1["n_days"] == 1 and r1["s_stat"] == 0
    assert r1["tau"] is None and r1["z"] is None


def test_mann_kendall_decreasing_symmetry(spark):
    up = _mk(spark, [1, 3, 2, 4, 5])
    dn = _mk(spark, [5, 3, 4, 2, 1])  # the reversed ORDER of values
    assert dn["s_stat"] == -up["s_stat"]
    assert dn["tau"] == -up["tau"]
    assert dn["z"] == -up["z"]


# ------------------------------------------------ random projection


def test_random_projection_deterministic_and_shaped(spark):
    from smartdatapipeline_spark.functions.similarity import random_projection

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = random_projection(emb, out_dim=8, seed=7)
    rows_a = {(r["vec_id"], r["j"]): r["proj"] for r in a.collect()}
    rows_b = {
        (r["vec_id"], r["j"]): r["proj"]
        for r in random_projection(emb.repartition(7), out_dim=8, seed=7).collect()
    }
    n = emb.count()
    assert len(rows_a) == n * 8
    assert rows_a == rows_b  # partitioning-independent, bit-exact


def test_random_projection_preserves_distances_approximately(spark):
    """JL sanity: projected pairwise squared-L2 is an UNBIASED estimate
    of the original (E[||Px-Py||^2] = ||x-y||^2 for +-1 sign matrices),
    so each pair's ratio stays within loose JL bounds and the mean
    ratio sits near 1. (Rank order is NOT preserved on near-isotropic
    random embeddings — their pairwise distances concentrate, so rank
    correlation would test the data, not the operator.)"""
    import numpy as np

    from smartdatapipeline_spark.functions.similarity import (
        projection_signs,
        random_projection,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    sample = emb.orderBy("vec_id").limit(20)
    vecs = {r["vec_id"]: np.array(r["embedding"]) for r in sample.collect()}
    proj = random_projection(sample, out_dim=16, seed=7)
    pv: dict[int, np.ndarray] = {}
    for r in proj.collect():
        pv.setdefault(r["vec_id"], np.zeros(16))[r["j"]] = r["proj"]

    ids = sorted(vecs)
    d_full, d_proj = [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            d_full.append(float(np.sum((vecs[ids[i]] - vecs[ids[j]]) ** 2)))
            d_proj.append(float(np.sum((pv[ids[i]] - pv[ids[j]]) ** 2)))
    ratios = np.array(d_proj) / np.array(d_full)
    assert float(ratios.min()) > 0.25 and float(ratios.max()) < 2.5, (
        ratios.min(),
        ratios.max(),
    )
    assert abs(float(ratios.mean()) - 1.0) < 0.2, ratios.mean()

    # and the sign matrix is the portable-hash one (oracle contract)
    import hashlib

    s = projection_signs(3, 2, seed=7)
    for j in range(2):
        for i in range(3):
            h = int(hashlib.md5(f"{i}:{j}:7".encode()).hexdigest()[:15], 16)
            assert s[j][i] == (1.0 if h % 2 == 0 else -1.0)


# ------------------------------------------------------- PQ re-rank


def test_pq_rerank_subset_of_shortlist_and_exact_order(spark):
    """Re-rank output must be drawn from the ADC shortlist and ordered
    by EXACT L2 within each query."""
    from smartdatapipeline_spark.functions import similarity as SIM

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cb = SIM.pq_train(emb, m=8, k=8, seed=42)
    codes = SIM.pq_encode(emb, cb)
    queries = emb.filter(F.col("vec_id") % 20 == 0)
    short = SIM.pq_adc_topk(cb, codes, queries, k=25)
    rer = SIM.pq_rerank_topk(cb, codes, emb, queries, k=5, shortlist=25)

    short_pairs = {
        (r["query_id"], r["neighbor_id"]) for r in short.collect()
    }
    got = rer.collect()
    assert {(r["query_id"], r["neighbor_id"]) for r in got} <= short_pairs

    by_q: dict[int, list] = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["l2_sq"]))
    for q, rows in by_q.items():
        rows.sort()
        assert [rk for rk, _ in rows] == list(range(1, len(rows) + 1))
        dists = [d for _, d in rows]
        assert dists == sorted(dists)  # exact-L2 ordered


def test_pq_rerank_beats_bare_adc_recall(spark):
    """The rerank path's recall@k vs exact L2 must be >= bare ADC's —
    the reason the pattern exists."""
    import numpy as np

    from smartdatapipeline_spark.functions import similarity as SIM

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cb = SIM.pq_train(emb, m=16, k=16, seed=42)  # the production config
    codes = SIM.pq_encode(emb, cb)
    queries = emb.filter(F.col("vec_id") % 20 == 0)

    vecs = {r["vec_id"]: np.array(r["embedding"]) for r in emb.collect()}
    exact: set[tuple[int, int]] = set()
    for qid in [r["vec_id"] for r in queries.collect()]:
        ds = sorted(
            (float(np.sum((vecs[qid] - v) ** 2)), nid)
            for nid, v in vecs.items()
            if nid != qid
        )[:5]
        exact |= {(qid, nid) for _, nid in ds}

    adc = {
        (r["query_id"], r["neighbor_id"])
        for r in SIM.pq_adc_topk(cb, codes, queries, k=5).collect()
    }
    rer = {
        (r["query_id"], r["neighbor_id"])
        for r in SIM.pq_rerank_topk(
            cb, codes, emb, queries, k=5, shortlist=25
        ).collect()
    }
    assert len(rer & exact) >= len(adc & exact)
    assert len(rer & exact) / len(exact) >= 0.5
