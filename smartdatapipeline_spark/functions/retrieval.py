"""Ranked retrieval over the documents table — TF/BM25 scoring.

Beyond the reference surface (it has no text search; SURVEY §2.8 notes
no user-facing UDF surface): keyword retrieval is a standard corpus
-analytics capability, implemented as pure DataFrame ops — explode to
postings, aggregate term/document statistics, score, top-k. Everything
stays JVM-side (no UDFs), so Catalyst keeps the postings build inside
whole-stage codegen and the query-term filter is pushed below the
posting aggregation.

## Scoring — BM25 with rational-odds idf

Per (doc, term): ``idf_r · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))``
with ``idf_r = (N − df + 0.5)/(df + 0.5) + 1`` — the *argument* of the
textbook Robertson–Spärck-Jones ``ln`` idf, used raw. Deliberate: JVM
``Math.log`` is only within-1-ulp (not correctly rounded), so a
log-idf score cannot hash-match a C-libm oracle bit-for-bit (measured:
~6% of idf inputs differ in the last ulp between Spark and DuckDB).
Rational arithmetic on exact integer stats (tf, dl, df, N) uses only
IEEE-correctly-rounded ops, so identical expression trees give
identical bits on every engine. Swap ``idf_r`` for
``F.log(idf_r)`` when textbook BM25 matters more than cross-engine
reproducibility — the ranking is term-wise monotone either way.

Per-doc term-score sums go through DECIMAL(38,12) (order-independent;
functions/numeric.py discipline).

## Scale

Postings are the big intermediate (~tokens ≈ corpus volume), but the
query-term ``isin`` filter collapses them before the only wide shuffle
(groupBy doc,term); df/avgdl are scalar/near-scalar aggregates
broadcast back. At 100 TB: one map-side-combined shuffle over rows
that contain query terms — no inverted index needed for ad-hoc
queries; for repeated querying, materialize `postings(term ⇒ doc, tf)`
bucketed by term once and reuse (the build is this same plan minus the
filter).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from smartdatapipeline_spark.functions import text as TX


def postings(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, term, tf) term frequencies, empty tokens dropped."""
    return (
        docs.select(F.col(id_col), F.explode(TX.tokens(F.col(text_col))).alias("term"))
        .filter(F.col("term") != "")
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def doc_lengths(post: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, dl) token counts per doc, from a postings frame."""
    return post.groupBy(id_col).agg(F.sum("tf").alias("dl"))


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k docs for a bag-of-terms query; ties broken by id asc.

    Output: (id_col, score double). Docs with no query term never
    appear (their score is 0 and they are filtered out before the
    aggregate — at scale this is what keeps the shuffle proportional
    to matching rows, not corpus rows). Corpus stats (N, avgdl) are
    computed over docs with ≥1 token.
    """
    # r14 opt (guide §2.4): ONE tokenize pass. The former plan derived
    # the postings subtree three times (dl, the stats agg through dl,
    # and the query-term hits) — per-doc term frequencies for the
    # (few) query terms are instead columns of one doc-grain aggregate,
    # so the corpus is exploded and shuffled exactly once. Scores are
    # bit-identical: same integer stats (tf, dl, df, N), the same
    # term-score expression per matching (doc, term), and the per-doc
    # DECIMAL(38,12) sum is exact, so replacing the SUM aggregate with
    # a fixed-order chain of decimal additions (terms with tf=0
    # contribute an exact 0) cannot change a value. Pinned by
    # tests/test_round14_opt4.py against the definitional shape.
    terms = list(dict.fromkeys(query_terms))
    toks = docs.select(
        F.col(id_col), F.explode(TX.tokens(F.col(text_col))).alias("term")
    ).filter(F.col("term") != "")
    per_doc = toks.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("dl"),
        *[
            F.sum((F.col("term") == F.lit(t)).cast("long")).alias(f"_tf{i}")
            for i, t in enumerate(terms)
        ],
    )
    if not terms:
        return per_doc.filter(F.lit(False)).select(
            F.col(id_col), F.lit(0.0).alias("score")
        )
    # doc-grain and narrow (|docs| × (2+|terms|) ints) but consumed
    # twice (stats + scoring) — cut the lineage so the corpus tokenize
    # runs once
    per_doc = per_doc.localCheckpoint()
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum((F.col(f"_tf{i}") > 0).cast("long")).alias(f"_df{i}")
            for i in range(len(terms))
        ],
    )

    n = F.col("n_docs").cast("double")
    avgdl = F.col("sum_dl").cast("double") / n
    dlen = F.col("dl").cast("double")
    per_term = []
    for i in range(len(terms)):
        tf = F.col(f"_tf{i}").cast("double")
        dfc = F.col(f"_df{i}").cast("double")
        idf_r = (n - dfc + F.lit(0.5)) / (dfc + F.lit(0.5)) + F.lit(1.0)
        term_score = idf_r * (
            tf * F.lit(k1 + 1.0)
            / (tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dlen / avgdl))
        )
        # NULL (dropped by array_compact) when the doc lacks the term —
        # the exploded multiset is exactly the former hits frame
        per_term.append(
            F.when(F.col(f"_tf{i}") > 0, term_score.cast("decimal(38,12)"))
        )
    scored = (
        per_doc.crossJoin(F.broadcast(stats))
        .select(
            F.col(id_col),
            F.explode(F.array_compact(F.array(*per_term))).alias("s"),
        )
        .groupBy(id_col)
        .agg(F.sum("s").cast("double").alias("score"))
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 60,
    id_col: str = "doc_id",
    rank_col: str = "rank",
    topk: int | None = None,
) -> DataFrame:
    """Reciprocal-rank fusion over N rankers (public formula, Cormack
    et al. 2009): score(d) = Σ_i 1/(k + rank_i(d)), documents missing
    from a ranker contribute 0. The standard way to fuse lexical (BM25)
    and dense (embedding) retrieval without score calibration — and,
    unlike score mixing, every term is 1/(integer) so the result is
    bit-identical on any engine with fixed addition order (the ranker
    list order, encoded in the expression tree).

    Full-outer joins on the id keep every candidate either ranker
    surfaced; each ranking is top-k sized, so the join space is
    O(N·topk) — never corpus-sized.

    Output: (id_col, rrf_score, rank_0..rank_{N-1}), sorted by score
    desc with id asc tiebreak, trimmed to ``topk`` when given.
    """
    out = None
    for i, r in enumerate(rankings):
        ri = r.select(F.col(id_col), F.col(rank_col).alias(f"rank_{i}"))
        out = ri if out is None else out.join(ri, id_col, "full_outer")
    score = None
    for i in range(len(rankings)):
        term = F.coalesce(
            F.lit(1.0) / (F.lit(float(k)) + F.col(f"rank_{i}").cast("double")),
            F.lit(0.0),
        )
        score = term if score is None else score + term
    fused = out.withColumn("rrf_score", score).orderBy(
        F.desc("rrf_score"), F.col(id_col).asc()
    )
    return fused.limit(topk) if topk else fused


def positional_postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, pos, term) positional postings via ``posexplode`` on the raw
    whitespace split (0-based positions; only relative offsets matter)."""
    return docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "term"),
    ).filter(F.col("term") != "")


def phrase_search(
    docs: DataFrame,
    phrase: str,
    top_k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact phrase match via positional postings: adjacent-position
    self-joins, one per phrase term past the first. Each join side is
    pruned to ONE term before joining (the filter collapses the
    postings frame to that term's rows — tiny vs the corpus), and all
    joins share the (doc, pos) key space. This is how positional
    inverted indexes answer phrase queries, expressed as DataFrame ops;
    for a repeated-query workload, materialize ``positional_postings``
    bucketed by term once and reuse.

    Output: (doc_id, n_hits) — occurrence count per matching doc —
    ordered (n_hits desc, doc_id asc), top_k rows.
    """
    terms = [t for t in phrase.split(" ") if t != ""]
    assert terms, "empty phrase"
    pp = positional_postings(docs, id_col, text_col)
    cur = (
        pp.filter(F.col("term") == terms[0])
        .select(F.col(id_col), F.col("pos").alias("_p0"))
    )
    for i, t in enumerate(terms[1:], start=1):
        nxt = pp.filter(F.col("term") == t).select(
            F.col(id_col), (F.col("pos") - i).alias("_p0")
        )
        cur = cur.join(nxt, [id_col, "_p0"])
    return (
        cur.groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
        .orderBy(F.col("n_hits").desc(), F.col(id_col).asc())
        .limit(top_k)
    )


def doc_keywords(
    docs: DataFrame,
    k: int = 3,
    min_df: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` keywords per document by tf·idf-RATIO score
    ``tf · (N/df)`` — tf-idf with the raw inverse-document-frequency
    ratio in place of its logarithm. Same ranking ORDER per document as
    log-idf (log is monotone and tf is a per-doc constant factor away),
    but every arithmetic op (int counts, one divide, one multiply) is
    IEEE-exact and correctly rounded on any engine — ln() is not
    portably bit-identical, which is why the repo keeps it out of
    oracle-checked scores (same discipline as ``bigram_lm_score``).

    Plan: one postings aggregation (doc-grain tf), one term-grain df
    aggregation joined back on term (hash-co-partitioned with the
    postings shuffle), then a per-doc top-k window with full
    deterministic tie-break (score desc, term asc). No UDFs.

    Output: (id_col, term, tf, df, score, rank), rank 1..k.
    """
    from pyspark.sql.window import Window

    post = postings(docs, id_col=id_col, text_col=text_col)
    df_counts = post.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.select(F.countDistinct(F.col(id_col)).alias("_n"))
    scored = (
        post.join(df_counts, "term")
        .filter(F.col("df") >= min_df)
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.col("tf").cast("double")
            * (F.col("_n").cast("double") / F.col("df").cast("double")),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "df", "score", "rank")
    )
