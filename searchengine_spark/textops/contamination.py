"""Test-set decontamination: n-gram collision detection against a
reference corpus.

Standard LLM training-data hygiene (the n-gram overlap check popularized
by the GPT-3/PaLM appendices: a training doc is contaminated when it
shares an n-gram — typically n in [8, 13] — with an eval/benchmark set):
count, per training doc, how many of its distinct token n-grams also
occur anywhere in the reference corpus.

Scale shape: the reference side collapses to DISTINCT shingles (eval sets
are tiny next to the training corpus — default-broadcast), the training
side explodes distinct shingles per doc, and ONE map-side-combinable
groupBy(id) yields both counts. No shuffle touches the reference set; the
only wide exchange is keyed on the training doc id. Everything is native
Spark SQL (codegen), reusing dedup.shingles_col.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import shingles_col


def reference_shingles(
    ref: DataFrame, tokens_col: Column, n: int = 13
) -> DataFrame:
    """Distinct shingle set of the reference/eval corpus -> one-column
    ``shingle`` DataFrame (cache it when checking many training shards)."""
    return (
        ref.select(tokens_col.alias("_toks"))  # bind once: no CSE in HOFs
        .select(F.explode(shingles_col(F.col("_toks"), n)).alias("shingle"))
        .distinct()
    )


def ngram_contamination(
    docs: DataFrame,
    ref_shingles: DataFrame,
    tokens_col: Column,
    n: int = 13,
    id_col: str = "doc_id",
    broadcast_ref: bool = True,
) -> DataFrame:
    """-> (id, n_ngrams, n_contaminated): per training doc, its distinct
    n-gram count and how many of those occur in ``ref_shingles``
    (from :func:`reference_shingles`, same ``n``). Docs with fewer than
    ``n`` tokens yield (0, 0) rows — present, never silently dropped.
    Filter ``n_contaminated > 0`` (or a ratio threshold) downstream."""
    sh = docs.select(
        F.col(id_col).alias("id"), tokens_col.alias("_toks")
    ).select(  # bind once: no CSE in HOFs (see dedup._minhash_sigs)
        "id", F.explode(shingles_col(F.col("_toks"), n)).alias("shingle")
    )
    marked = ref_shingles.select("shingle").withColumn("_hit", F.lit(1))
    if broadcast_ref:
        marked = F.broadcast(marked)
    counts = (
        sh.join(marked, "shingle", "left")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_contaminated"),
        )
    )
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(counts, "id", "left")
        .select(
            "id",
            F.coalesce("n_ngrams", F.lit(0)).cast("long").alias("n_ngrams"),
            F.coalesce("n_contaminated", F.lit(0)).cast("long").alias("n_contaminated"),
        )
    )
