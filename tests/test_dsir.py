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


def test_lexical_diversity_pinned_values(spark):
    from smartdatapipeline_spark.functions.text import lexical_diversity

    d = spark.createDataFrame(
        [(1, "a a a a"), (2, "a b c d"), (3, "a a b b"), (4, ""), (5, "x")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in lexical_diversity(d).collect()}
    # doc 1: 1 type / 4 tokens; rep2 = 4*3 = 12; simpson = 12/(4*3) = 1
    assert got[1]["type_token_ratio"] == 0.25 and got[1]["simpson_index"] == 1.0
    # doc 2: all distinct -> simpson 0
    assert got[2]["type_token_ratio"] == 1.0 and got[2]["simpson_index"] == 0.0
    # doc 3: rep2 = 2*1 + 2*1 = 4; simpson = 4/12
    assert got[3]["simpson_index"] == 4 / 12
    # doc 4 (no tokens) absent; doc 5 single token -> simpson NULL
    assert 4 not in got and got[5]["simpson_index"] is None


def test_ngram_novelty_pinned_values(spark):
    from smartdatapipeline_spark.functions.text import ngram_novelty

    d = spark.createDataFrame(
        [
            (1, "a b c d"),      # grams: "a b c", "b c d" -> both first
            (2, "a b c d e"),    # "a b c","b c d" seen at 1; "c d e" new
            (3, "z z"),          # short doc: one partial shingle "z z"
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in ngram_novelty(d).collect()}
    assert got[1]["n_grams"] == 2 and got[1]["novelty"] == 1.0
    assert got[2]["n_grams"] == 3 and got[2]["n_first"] == 1
    assert got[2]["novelty"] == 1 / 3
    assert got[3]["n_grams"] == 1 and got[3]["novelty"] == 1.0


def test_containment_asymmetry(spark):
    """A short doc quoted inside a long one: containment(short in
    long) = 1.0 while Jaccard stays below a dedup threshold — the case
    this operator exists for."""
    from smartdatapipeline_spark.functions.dedup import (
        containment_pairs,
        ngram_jaccard_pairs,
    )

    short = "alpha beta gamma delta epsilon"
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(20))
    d = spark.createDataFrame(
        [(1, short), (2, filler + " " + short + " " + filler.upper())],
        "doc_id long, text string",
    )
    cp = {(r["doc_a"], r["doc_b"]): r for r in containment_pairs(d).collect()}
    assert cp[(1, 2)]["containment"] == 1.0  # all of doc 1's shingles in 2
    assert (2, 1) not in cp  # reverse direction below the 0.5 threshold
    jac = ngram_jaccard_pairs(d, threshold=0.0).collect()
    assert all(r["jaccard"] < 0.05 for r in jac)  # Jaccard never flags it


def test_containment_frequency_guard(spark):
    """Shingles present in more docs than the cap leave the join AND the
    denominator, so containment stays a fraction of participating
    shingles."""
    from smartdatapipeline_spark.functions.dedup import containment_pairs

    common = "the quick brown fox jumps"
    rows = [(i, common) for i in range(1, 6)]  # shingles in 5 docs
    rows.append((99, common + " unique tail here now"))
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = containment_pairs(d, max_shingle_freq=3).collect()
    # every shared shingle is over the cap -> no pairs at all
    assert out == []
