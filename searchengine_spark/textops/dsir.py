"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169): score raw-corpus documents by how target-like they
are under hashed n-gram bag-of-words models, the standard
pretraining-data selection recipe (select raw docs whose importance
weight log p_target(x) - log p_raw(x) is highest, optionally with
Gumbel-noise resampling — we emit the deterministic weights; a seeded
resample composes with dataset.py's md5-stable machinery downstream).

Features are the paper's: unigrams + bigrams, hashed into ``n_buckets``
buckets (multiplicity counts — bag-of-words). The hash is the repo's
cross-engine md5 pattern (first 4 hex digits of ``md5('ds|' ||
feature)`` as a 16-bit integer, mod n_buckets) so the DuckDB oracle
replays it verbatim.

Exactness (the ccnet-perplexity micro-nat protocol, CLAUDE.md): both
bucket models are add-one-smoothed; ``log p[b] = ln(cnt[b]+1) -
ln(N+B)`` splits into a per-bucket table term and a per-feature
constant, each floor-quantized ONCE to integer micro-nats, so a doc's
weight is pure BIGINT arithmetic afterwards:

    weight_micro(x) = Σ_b c_b(x)·(lpt[b] - lpr[b]) - n_feat(x)·(Ct - Cr)

with ``lp*[b] = floor(1e6·ln(cnt[b]+1))`` and ``C* = floor(1e6·
ln(N*+n_buckets))``. Summation-order-free, bit-identical in Spark,
DuckDB and Python. Buckets absent from a model contribute ln(1) = 0
through the same formula (left join + fill 0 — no special case).

Scale shape: the target model is eval-set-sized (collect/broadcast
class); the raw model is ONE map-side-combinable groupBy over the
corpus; scoring is one explode + one (id, bucket) groupBy + one
broadcast join of the B-row model tables + one (id) groupBy — the only
wide exchanges are keyed on doc id, corpus-partition-parallel at any
scale.
"""

from __future__ import annotations

from typing import Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..tokenizer import TokenizerConfig, tokens_column

LN_SCALE = 1_000_000
DSIR_SALT = "ds"
DEFAULT_BUCKETS = 4096


def _features(tokens: Column) -> Column:
    """Unigrams + space-joined bigrams, WITH multiplicity (bag-of-words
    counts — unlike dedup.shingles_col, which distincts)."""
    bigrams = F.when(
        F.size(tokens) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(tokens) - 2),
            lambda i: F.concat_ws(
                " ",
                F.element_at(tokens, (i + 1).cast("int")),
                F.element_at(tokens, (i + 2).cast("int")),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(tokens, bigrams)


def _bucket(feature: Column, n_buckets: int) -> Column:
    """16-bit md5 hash mod n_buckets — the oracle-replayable pattern."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("|", F.lit(DSIR_SALT), feature)), 1, 4
            ),
            16, 10,
        ).cast("long") % n_buckets
    )


def hashed_feature_counts(
    docs: DataFrame,
    cfg: TokenizerConfig,
    n_buckets: int = DEFAULT_BUCKETS,
    text_col: str = "text",
) -> DataFrame:
    """-> (bucket, cnt): the hashed bag-of-words model of a corpus —
    one map-side-combinable groupBy, at most ``n_buckets`` rows out."""
    if n_buckets < 2 or n_buckets > 65536:
        raise ValueError(
            f"n_buckets must be in [2, 65536] (16-bit hash space), "
            f"got {n_buckets}")
    toks = docs.select(tokens_column(F.col(text_col), cfg).alias("_t"))
    feats = toks.select(F.explode(_features(F.col("_t"))).alias("f"))
    return (
        feats.groupBy(_bucket(F.col("f"), n_buckets).alias("bucket"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def model_totals(counts: DataFrame) -> int:
    """Total feature count N of a (bucket, cnt) model."""
    row = counts.agg(F.coalesce(F.sum("cnt"), F.lit(0)).alias("n")).collect()
    return int(row[0]["n"])


def _lp(counts: DataFrame, out: str) -> DataFrame:
    return counts.select(
        "bucket",
        F.floor(F.log(F.col("cnt").cast("double") + F.lit(1.0))
                * F.lit(LN_SCALE)).cast("long").alias(out),
    )


def _const(n_total: int, n_buckets: int) -> int:
    import math

    return int(math.floor(math.log(n_total + n_buckets) * LN_SCALE))


def dsir_weights(
    docs: DataFrame,
    target_counts: DataFrame,
    raw_counts: DataFrame,
    cfg: TokenizerConfig,
    n_buckets: int = DEFAULT_BUCKETS,
    n_target: "int | None" = None,
    n_raw: "int | None" = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """-> (id, n_features, weight_micro): each doc's DSIR importance
    weight in integer micro-nats (module docstring formula). Docs whose
    feature stream is empty emit no row (no likelihood — like
    doc_cross_entropy). Rank weight_micro DESC (id asc ties) and keep
    the head fraction for the paper's deterministic top-k variant."""
    nt = model_totals(target_counts) if n_target is None else int(n_target)
    nr = model_totals(raw_counts) if n_raw is None else int(n_raw)
    if nt < 0 or nr < 0:
        raise ValueError(f"bad model totals target={nt} raw={nr}")
    c_diff = _const(nt, n_buckets) - _const(nr, n_buckets)
    lpt = _lp(target_counts, "_lpt")
    lpr = _lp(raw_counts, "_lpr")
    toks = docs.select(
        F.col(id_col).alias("id"),
        tokens_column(F.col(text_col), cfg).alias("_t"),
    )
    per_bucket = (
        toks.select("id", F.explode(_features(F.col("_t"))).alias("f"))
        .select("id", _bucket(F.col("f"), n_buckets).alias("bucket"))
        .groupBy("id", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    joined = (
        per_bucket.join(F.broadcast(lpt), "bucket", "left")
        .join(F.broadcast(lpr), "bucket", "left")
        .na.fill({"_lpt": 0, "_lpr": 0})
    )
    return (
        joined.groupBy("id")
        .agg(
            F.sum("c").cast("long").alias("n_features"),
            F.sum(F.col("c") * (F.col("_lpt") - F.col("_lpr")))
            .cast("long").alias("_s"),
        )
        .select(
            F.col("id").alias(id_col),
            "n_features",
            (F.col("_s") - F.col("n_features") * F.lit(c_diff))
            .cast("long").alias("weight_micro"),
        )
    )
