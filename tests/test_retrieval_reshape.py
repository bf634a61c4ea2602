"""Tests for BM25 retrieval and pivot/unpivot reshape operators."""

from __future__ import annotations

import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from smartdatapipeline_spark.functions import retrieval as R
from smartdatapipeline_spark.operators import reshape as RS


def _corpus(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=0, text="spark spark hash merge sort"),
            Row(doc_id=1, text="spark only once here today"),
            Row(doc_id=2, text="nothing relevant whatsoever"),
            Row(doc_id=3, text="hash hash hash hash"),
        ]
    )


def _bm25_py(corpus, terms, k1=1.2, b=0.75):
    toks = {d: t.split() for d, t in corpus.items()}
    dl = {d: len(t) for d, t in toks.items()}
    n = len(dl)
    avgdl = sum(dl.values()) / n
    scores = {}
    for term in terms:
        df = sum(1 for t in toks.values() if term in t)
        if df == 0:
            continue
        idf = (n - df + 0.5) / (df + 0.5) + 1.0
        for d, t in toks.items():
            tf = t.count(term)
            if tf:
                s = idf * (tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl[d] / avgdl)))
                scores[d] = scores.get(d, 0.0) + s
    return scores


def test_bm25_matches_python_reference(spark):
    corpus = {
        0: "spark spark hash merge sort",
        1: "spark only once here today",
        2: "nothing relevant whatsoever",
        3: "hash hash hash hash",
    }
    got = {
        r["doc_id"]: r["score"]
        for r in R.bm25_topk(_corpus(spark), ["spark", "hash", "merge"], k=10).collect()
    }
    exp = _bm25_py(corpus, ["spark", "hash", "merge"])
    assert set(got) == set(exp)  # doc 2 never appears
    for d in exp:
        assert math.isclose(got[d], exp[d], rel_tol=1e-9), (d, got[d], exp[d])
    # doc 0 holds all three terms incl. the rarest -> top score
    assert max(got, key=got.get) == 0


def test_bm25_topk_limit_and_tiebreak(spark):
    df = spark.createDataFrame([Row(doc_id=i, text="same words here") for i in range(5)])
    out = R.bm25_topk(df, ["same"], k=3).collect()
    assert [r["doc_id"] for r in out] == [0, 1, 2]  # equal scores, id asc


def test_postings_and_lengths_drop_empty_tokens(spark):
    df = spark.createDataFrame([Row(doc_id=7, text="  a b  a !! ")])
    post = {(r["doc_id"], r["term"]): r["tf"] for r in R.postings(df).collect()}
    assert post == {(7, "a"): 2, (7, "b"): 1}
    dl = R.doc_lengths(R.postings(df)).collect()
    assert (dl[0]["doc_id"], dl[0]["dl"]) == (7, 3)


# ----------------------------------------------------------------- reshape

def _long(spark):
    return spark.createDataFrame(
        [
            Row(d="2024-01-01", m="x", value=1.5),
            Row(d="2024-01-01", m="x", value=2.5),
            Row(d="2024-01-01", m="y", value=10.0),
            Row(d="2024-01-02", m="y", value=7.25),
        ]
    )


def test_pivot_wide_cells_and_null_gap(spark):
    wide = {
        r["d"]: r
        for r in RS.pivot_wide(
            _long(spark), index=["d"], on="m", values=["x", "y"]
        ).collect()
    }
    assert wide["2024-01-01"]["x"] == 4.0
    assert wide["2024-01-01"]["y"] == 10.0
    assert wide["2024-01-02"]["x"] is None  # no x rows that day
    assert wide["2024-01-02"]["y"] == 7.25


def test_unpivot_roundtrip_recovers_long_form(spark):
    wide = RS.pivot_wide(_long(spark), index=["d"], on="m", values=["x", "y"])
    back = RS.unpivot_long(
        wide, index=["d"], value_cols=["x", "y"], var_name="m", value_name="value"
    )
    got = sorted((r["d"], r["m"], r["value"]) for r in back.collect())
    exp = sorted(
        (r["d"], r["m"], r["v"])
        for r in _long(spark)
        .groupBy("d", "m")
        .agg(F.sum(F.col("value").cast("decimal(28,4)")).cast("double").alias("v"))
        .collect()
    )
    assert got == exp  # null cell dropped, everything else identical


def test_unpivot_keeps_nulls_when_asked(spark):
    wide = RS.pivot_wide(_long(spark), index=["d"], on="m", values=["x", "y"])
    back = RS.unpivot_long(
        wide, index=["d"], value_cols=["x", "y"], drop_nulls=False
    )
    assert back.count() == 4  # 2 days x 2 columns, null cell retained


def test_rrf_fuse_formula_and_missing_docs(spark):
    from smartdatapipeline_spark.functions.retrieval import rrf_fuse

    a = spark.createDataFrame([(1, 1), (2, 2)], "doc_id long, rank int")
    b = spark.createDataFrame([(2, 1), (3, 2)], "doc_id long, rank int")
    out = {r["doc_id"]: r for r in rrf_fuse([a, b], k=60).collect()}
    # doc 2 in both rankers: 1/62 + 1/61
    assert out[2]["rrf_score"] == 1.0 / 62 + 1.0 / 61
    # docs in one ranker only: single reciprocal, missing rank is NULL
    assert out[1]["rrf_score"] == 1.0 / 61 and out[1]["rank_1"] is None
    assert out[3]["rrf_score"] == 1.0 / 62 and out[3]["rank_0"] is None
    # fusion puts the doubly-ranked doc first
    top = rrf_fuse([a, b], k=60, topk=1).collect()
    assert top[0]["doc_id"] == 2
