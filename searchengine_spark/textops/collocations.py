"""Bigram collocation statistics (PMI) — phrase mining for training-data
pipelines.

The Church & Hanks 1990 association-ratio family: for adjacent token
pairs (w1, w2), PMI = ln( c(w1,w2) · N / (c(w1) · c(w2)) ) with N the
total token count — high-PMI, high-count bigrams are the multi-word
expressions a tokenizer/vocab-induction pass wants to know about. The
reference engine stores term statistics but exposes no co-occurrence
analytics; this is the standard extension over the same tokenization.

Spark shape: bigram extraction is a zero-exchange map (slice + zip on the
token arrays — no positional self-join), then ONE wide groupBy for pair
counts (map-side combinable) and one for unigram counts; the two
unigram-count joins land AFTER the ``min_count`` floor so their input is
the surviving bigram set, not the raw pair stream. Token arrays come
from the caller — pass the docs stage's STORED tokens
(``PackedIndex.doc_tokens()``) to avoid re-tokenizing an indexed corpus.

Cross-engine policy: counts are exact integers; PMI is ln of a ratio of
exact integers, rounded to 6 dp (the idf-contract precedent); output
ordering (pair_count desc, w1 asc, w2 asc) is unique per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bigram_collocations(
    tokens_df: DataFrame,
    tokens_col: str = "tokens",
    min_count: int = 5,
    k: int = 100,
) -> DataFrame:
    """-> (w1, w2, pair_count, pmi): the top-``k`` adjacent bigrams by
    (pair_count desc, w1 asc, w2 asc) among those with pair_count >=
    ``min_count``. ``tokens_df`` needs one array<string> column (any other
    columns are ignored); docs with < 2 tokens contribute no pairs but DO
    count toward the unigram totals."""
    t = F.col(tokens_col)
    toks = tokens_df.select(t.alias("tokens"))
    uni = (
        toks.select(F.explode("tokens").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n_tokens = uni.agg(F.sum("c")).collect()[0][0] or 0
    pairs = (
        toks.filter(F.size("tokens") >= 2)
        .select(
            F.explode(
                F.arrays_zip(
                    F.expr("slice(tokens, 1, size(tokens) - 1)"),
                    F.expr("slice(tokens, 2, size(tokens) - 1)"),
                )
            ).alias("p")
        )
        .select(F.col("p.0").alias("w1"), F.col("p.1").alias("w2"))
    )
    big = (
        pairs.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .filter(F.col("pair_count") >= min_count)
    )
    c1 = uni.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    c2 = uni.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    pmi = F.round(
        F.log(
            (F.col("pair_count").cast("double") * F.lit(float(n_tokens)))
            / (F.col("c1").cast("double") * F.col("c2").cast("double"))
        ),
        6,
    )
    return (
        big.join(c1, "w1")
        .join(c2, "w2")
        .select(
            "w1", "w2", F.col("pair_count").cast("long").alias("pair_count"),
            pmi.alias("pmi"),
        )
        .orderBy(F.desc("pair_count"), F.asc("w1"), F.asc("w2"))
        .limit(k)
    )
