"""Byte-pair-encoding merge training over a corpus — the tokenizer-
learning step of a training-data pipeline (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units"; the
word-count formulation SentencePiece/HuggingFace trainers use).

Scale design: BPE learns from the WORD VOCABULARY (distinct words +
corpus counts), never the raw text — the fact-sized work is one
tokenize+count aggregation, and every merge round then runs on the
vocabulary frame (≤ a few million rows at web scale, cached once).
Per round: one pair-explode + weighted count (map-side combined), one
1-row argmax to the driver (the learned merge IS driver state, like
any model coefficient), one column rewrite of the segmentation. Round
count is the model's merge budget — fixed, not data-dependent.

Cross-engine determinism: pair counts are exact ints; the argmax
tie-break is total (count desc, left asc, right asc); and the merge
rewrite uses TWO passes of plain space-delimited string replace — a
left-to-right non-overlapping scan whose first pass consumes the
boundary space of an immediately-following occurrence ("a b a b"),
which the second pass then catches. Two passes reach the classic
greedy-scan fixpoint (property-tested against a reference scalar BPE
in tests), and literal replace behaves identically in Spark and DuckDB
— unlike regex lookaround, which RE2 (DuckDB) lacks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from smartdatapipeline_spark.functions.text import tokens

END = "</w>"  # word-end marker — never a corpus character (alnum-only)


def _initial_seg(word: Column) -> Column:
    """'low' → 'l o w </w>' (space-separated symbols)."""
    return F.concat(F.regexp_replace(word, "(.)", "$1 "), F.lit(END))


def _merge_once(seg: Column, left: str, right: str) -> Column:
    """Apply one learned merge to a segmentation string: two passes of
    literal ' left right ' → ' leftright ' on the space-padded string
    (see module docstring for why two passes == greedy scan)."""
    pat = F.lit(f" {left} {right} ")
    rep = F.lit(f" {left}{right} ")
    padded = F.concat(F.lit(" "), seg, F.lit(" "))
    return F.trim(F.replace(F.replace(padded, pat, rep), pat, rep))


def word_vocab(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, cnt) corpus word counts — the only fact-sized pass."""
    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def bpe_train(
    df: DataFrame,
    n_merges: int = 6,
    text_col: str = "text",
) -> DataFrame:
    """Learn ``n_merges`` BPE merges. Returns one row per round:
    (round, left, right, merged, pair_count) — the merge table that
    parameterizes ``bpe_apply``.

    The returned frame is a small driver-built table (the model);
    training state lives in the cached vocabulary frame, released
    before returning."""
    spark = df.sparkSession
    vocab = word_vocab(df, text_col).withColumn(
        "seg", _initial_seg(F.col("word"))
    ).select("seg", "cnt").cache()
    try:
        merges: list[tuple[int, str, str, str, int]] = []
        cur = vocab
        for r in range(1, n_merges + 1):
            syms = F.split(F.col("seg"), " ")
            # a fully-merged word (ONE symbol) contributes no pairs:
            # sequence(1, 0) would DESCEND and index out of bounds under
            # ANSI — guard with an explicit empty index array
            idx = F.when(
                F.size(syms) >= 2, F.sequence(F.lit(1), F.size(syms) - 1)
            ).otherwise(F.array().cast("array<int>"))
            pairs = (
                cur.select(
                    F.explode(
                        F.transform(
                            idx,
                            lambda i: F.struct(
                                F.element_at(syms, i).alias("a"),
                                F.element_at(syms, i + 1).alias("b"),
                            ),
                        )
                    ).alias("pr"),
                    "cnt",
                )
                .groupBy(F.col("pr.a").alias("a"), F.col("pr.b").alias("b"))
                .agg(F.sum("cnt").alias("n"))
            )
            best = (
                pairs.orderBy(
                    F.col("n").desc(), F.col("a").asc(), F.col("b").asc()
                )
                .limit(1)
                .collect()
            )
            if not best:
                break
            a, b, n = best[0]["a"], best[0]["b"], int(best[0]["n"])
            merges.append((r, a, b, a + b, n))
            cur = cur.select(_merge_once(F.col("seg"), a, b).alias("seg"), "cnt")
        return spark.createDataFrame(
            merges,
            "round int, left string, right string, merged string, pair_count bigint",
        )
    finally:
        vocab.unpersist()


def bpe_apply(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Encode a corpus under a learned merge list (ordered (left,
    right) pairs): per word, initial char segmentation then each merge
    in training order — pure column expressions, scan-speed.

    Output: (id_col, word, pieces array<string>, n_pieces)."""
    words = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("word")
    ).filter(F.col("word") != "")
    seg = _initial_seg(F.col("word"))
    for left, right in merges:
        seg = _merge_once(seg, left, right)
    return words.select(
        id_col,
        "word",
        F.split(seg, " ").alias("pieces"),
        F.size(F.split(seg, " ")).alias("n_pieces"),
    )
