"""DSIR-style importance resampling (functions/sampling.py
importance_weights / importance_resample): behavioral properties the
oracle can't see — direction of the weighting, featureless-doc
handling, partitioning invariance."""

from pyspark.sql import functions as F

from smartdatapipeline_spark.functions.sampling import (
    importance_resample,
    importance_weights,
)


def _corpus(spark):
    rows = [
        # target domain: English-looking bigram mass
        (1, "the cat sat on the mat", "en"),
        (2, "the dog sat on the rug", "en"),
        (3, "the cat and the dog", "en"),
        # raw-only: disjoint bigram mass
        (4, "zzz qqq zzz qqq zzz", "xx"),
        (5, "qqq zzz qqq zzz", "xx"),
        # raw doc that LOOKS like the target domain
        (6, "the cat sat on the rug", "xx"),
        # featureless (one token / empty)
        (7, "solo", "xx"),
        (8, "", "xx"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_targetlike_raw_doc_outweighs_offtarget(spark):
    w = {
        r["doc_id"]: r["weight"]
        for r in importance_weights(_corpus(spark), F.col("lang") == "en").collect()
    }
    # doc 6 shares every bigram with the target docs; docs 4/5 share none
    assert w[6] > w[4] and w[6] > w[5]
    # target docs themselves score at least as high as the off-target mass
    assert min(w[1], w[2], w[3]) > max(w[4], w[5])


def test_featureless_docs_get_null_weight(spark):
    rows = importance_weights(_corpus(spark), F.col("lang") == "en").collect()
    by_id = {r["doc_id"]: r for r in rows}
    assert len(rows) == 8  # every doc present, even featureless ones
    assert by_id[7]["weight"] is None and by_id[8]["weight"] is None
    assert by_id[7]["is_target"] is False


def test_resample_excludes_null_and_is_deterministic(spark):
    w = importance_weights(_corpus(spark), F.col("lang") == "en")
    top = importance_resample(w, 4).collect()
    ids = [r["doc_id"] for r in top]
    assert 7 not in ids and 8 not in ids
    assert len(ids) == 4
    # weights descend; ties broken by ascending id
    pairs = [(r["weight"], r["doc_id"]) for r in top]
    assert pairs == sorted(pairs, key=lambda p: (-p[0], p[1]))


def test_weights_invariant_to_partitioning(spark):
    d = _corpus(spark)
    a = {
        r["doc_id"]: r["weight"]
        for r in importance_weights(d.repartition(1), F.col("lang") == "en").collect()
    }
    b = {
        r["doc_id"]: r["weight"]
        for r in importance_weights(d.repartition(13), F.col("lang") == "en").collect()
    }
    assert a == b  # exact integer pipeline → bit-identical, not approx
