"""CCNet-style language-model perplexity filtering (Wenzek et al. 2020,
"CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
Data"): score every document by its cross-entropy under a language model
trained on a reference corpus, then bucket the corpus into head / middle
/ tail thirds by score — the classic pretraining-data quality gate.

Honest scope: CCNet uses a KenLM 5-gram; this is an add-one-smoothed
UNIGRAM model (no LM library in the container), which preserves every
pipeline property that matters at 100 TB — the training aggregation, the
score join, the percentile bucketing — and is a drop-in seam for a real
LM scorer (swap ``doc_cross_entropy`` for a Pandas-UDF scorer; the
bucket/filter stages are score-agnostic).

Cross-engine exactness (the repo's integer micro-unit protocol —
CLAUDE.md): a float cross-entropy is a SUM of doubles, and float sums
are summation-order-dependent, so Spark's partial aggregates and
DuckDB's serial sum would drift. Instead every per-term log-probability
is quantized ONCE — ``lp(t) = floor(1e6 * ln(count_t + 1))`` as BIGINT —
and everything downstream is exact integer arithmetic:

    ce_micro(doc) = (n_doc * floor(1e6 * ln(N + V + 1))
                     - SUM(tf_t * lp(t))) div n_doc

which is add-one smoothing ``p(t) = (count_t + 1) / (N + V + 1)``
(out-of-vocabulary terms get count 0 — ``lp = floor(1e6*ln(1)) = 0``,
the maximum penalty, with no special-casing) in micro-nats, truncated
integer division. BIGINT sums are order-independent and bit-identical in
Spark, DuckDB and Python; the single ``ln`` per DISTINCT vocabulary term
is the only float op and is floor-quantized immediately (same pattern as
``micro_col``, textops/similarity.py).

Bucketing is rank-exact, not quantile-approximate: docs rank by
``(ce_micro asc, id asc)`` via the docID stage's two-pass
range-partition + offset trick (never a single-task global window), and
``bucket = head if 3r < n else middle if 3r < 2n else tail`` — pure
integer arithmetic on the rank, so the thirds are reproducible across
engines and cluster sizes.

Scale shape: train = ONE map-side-combinable groupBy over the exploded
reference tokens; score = per-doc tf (one groupBy) joined to the
vocabulary-sized lp table on term (the index build's shuffle shape; AQE
broadcasts small LMs), then one groupBy(doc); bucket = the two-pass
rank. No reference counterpart.
"""

from __future__ import annotations

from typing import Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..tokenizer import TokenizerConfig, tokens_column

LN_SCALE = 1_000_000


def train_unigram_lm(
    docs: DataFrame, cfg: TokenizerConfig, text_col: str = "text"
) -> DataFrame:
    """(term, cnt): token counts over the reference corpus through the
    engine's tokenize chain — the unigram LM. One map-side-combinable
    groupBy; counts are exact BIGINTs."""
    toks = docs.select(tokens_column(F.col(text_col), cfg).alias("_se_toks"))
    return (
        toks.select(F.explode("_se_toks").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def lm_totals(lm: DataFrame) -> Tuple[int, int]:
    """(N total tokens, V vocabulary size) — one scalar agg collect."""
    row = lm.agg(
        F.coalesce(F.sum("cnt"), F.lit(0)).alias("n"),
        F.count(F.lit(1)).alias("v"),
    ).collect()[0]
    return int(row["n"]), int(row["v"])


def doc_cross_entropy(
    docs: DataFrame,
    lm: DataFrame,
    n_total: int,
    vocab: int,
    cfg: TokenizerConfig,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_tokens, ce_micro): per-doc add-one-smoothed unigram
    cross-entropy in integer micro-nats (see module docstring — exact
    BIGINT arithmetic after one floor-quantized ``ln`` per vocabulary
    term). Token multiplicity counts (an LM scores every token); docs
    that tokenize to nothing emit no row (they have no likelihood —
    filter them with the quality gates instead)."""
    if n_total < 0 or vocab < 0:
        raise ValueError(f"bad LM totals n={n_total} v={vocab}")
    denom = F.floor(
        F.log(F.lit(float(n_total + vocab + 1))) * F.lit(LN_SCALE)
    ).cast("long")
    lp = lm.select(
        "term",
        F.floor(F.log(F.col("cnt").cast("double") + F.lit(1.0))
                * F.lit(LN_SCALE)).cast("long").alias("_se_lp"),
    )
    toks = docs.select(
        F.col(id_col), tokens_column(F.col(text_col), cfg).alias("_se_toks")
    )
    tf = (
        toks.select(id_col, F.explode("_se_toks").alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).cast("long").alias("_se_tf"))
    )
    joined = tf.join(lp, "term", "left").na.fill({"_se_lp": 0})
    per_doc = joined.groupBy(id_col).agg(
        F.sum("_se_tf").cast("long").alias("n_tokens"),
        F.sum(F.col("_se_tf") * F.col("_se_lp")).cast("long").alias("_se_slp"),
    )
    return (
        per_doc.withColumn("_se_den", denom)
        .withColumn(
            "ce_micro",
            F.expr("(n_tokens * _se_den - _se_slp) div n_tokens").cast("long"),
        )
        .select(id_col, "n_tokens", "ce_micro")
    )


def perplexity_buckets(
    scored: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """+ ``bucket``: CCNet's head / middle / tail thirds by
    ``(ce_micro asc, id asc)`` global rank — head = most-fluent third.
    Rank-exact integer cuts (``3r < n`` / ``3r < 2n``), assigned with
    the two-pass range-partition + offset trick (no global window).
    Carries a load-bearing internal persist; release it after
    materializing with ``indexing.docids.unpersist_doc_ids``."""
    keys = [F.col("ce_micro"), F.col(id_col)]
    part = (
        scored.repartitionByRange(*keys)
        .sortWithinPartitions(*keys)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    counts = {r["_pid"]: r["cnt"] for r in
              part.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()}
    total = sum(counts.values())
    if not total:
        out = part.drop("_pid").withColumn("bucket", F.lit("head"))
        out._se_persisted = part  # type: ignore[attr-defined]
        return out
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    offset_map = F.create_map(
        *[F.lit(x) for pid, off in offsets.items() for x in (pid, off)]
    )
    local = F.monotonically_increasing_id().bitwiseAND(F.lit((1 << 33) - 1))
    r = (offset_map[F.col("_pid")] + local).cast("long")
    bucket = (
        F.when(r * 3 < total, "head")
        .when(r * 3 < 2 * total, "middle")
        .otherwise("tail")
    )
    out = part.withColumn("bucket", bucket).drop("_pid")
    out._se_persisted = part  # type: ignore[attr-defined]
    return out


def perplexity_filter(
    docs: DataFrame,
    lm_docs: DataFrame,
    cfg: TokenizerConfig,
    keep: Tuple[str, ...] = ("head", "middle"),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Convenience composition: train on ``lm_docs`` (the CCNet reference
    corpus — pass ``docs`` itself for self-perplexity), score + bucket
    ``docs``, keep only the named buckets. Returns the kept docs joined
    with (n_tokens, ce_micro, bucket)."""
    bad = [b for b in keep if b not in ("head", "middle", "tail")]
    if bad or not keep:
        raise ValueError(f"keep must name head/middle/tail buckets, got {keep}")
    lm = train_unigram_lm(lm_docs, cfg, text_col=text_col)
    n, v = lm_totals(lm)
    scored = doc_cross_entropy(docs, lm, n, v, cfg,
                               id_col=id_col, text_col=text_col)
    bucketed = perplexity_buckets(scored, id_col=id_col)
    kept = bucketed.filter(F.col("bucket").isin(*keep))
    return docs.join(kept, id_col)
