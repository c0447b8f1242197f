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
counts (map-side combinable) and ONE for unigram counts, consumed through
a single melted join (the surviving bigrams unpivot to (side, w) rows) so
the unigram aggregate is computed once, not once per join side; the join
lands AFTER the ``min_count`` floor so its input is the surviving bigram
set, not the raw pair stream. Token arrays come
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
    # N = total token count: a shuffle-free scan (sum of array sizes),
    # NOT an eager materialization of the unigram aggregate — uni below
    # is then referenced exactly once in the returned plan.
    n_tokens = int(
        toks.agg(
            F.sum(
                F.when(F.col("tokens").isNull(), F.lit(0)).otherwise(
                    F.size("tokens")
                )
            )
        ).collect()[0][0]
        or 0
    )
    uni = (
        toks.select(F.explode("tokens").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
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
    # both unigram lookups through ONE join (melt the surviving bigrams
    # to (side, w) rows) so the corpus-scale uni aggregation runs once
    # per execution instead of once per join side
    melt = big.select(
        "w1", "w2", "pair_count",
        F.explode(
            F.array(
                F.struct(F.lit(1).alias("side"), F.col("w1").alias("w")),
                F.struct(F.lit(2).alias("side"), F.col("w2").alias("w")),
            )
        ).alias("m"),
    ).select(
        "w1", "w2", "pair_count",
        F.col("m.side").alias("side"), F.col("m.w").alias("w"),
    )
    cnt = (
        melt.join(uni, "w")
        .groupBy("w1", "w2", "pair_count")
        .agg(
            F.max(F.when(F.col("side") == 1, F.col("c"))).alias("c1"),
            F.max(F.when(F.col("side") == 2, F.col("c"))).alias("c2"),
        )
    )
    pmi = F.round(
        F.log(
            (F.col("pair_count").cast("double") * F.lit(float(n_tokens)))
            / (F.col("c1").cast("double") * F.col("c2").cast("double"))
        ),
        6,
    )
    return (
        cnt.select(
            "w1", "w2", F.col("pair_count").cast("long").alias("pair_count"),
            pmi.alias("pmi"),
        )
        .orderBy(F.desc("pair_count"), F.asc("w1"), F.asc("w2"))
        .limit(k)
    )
