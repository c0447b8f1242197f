"""End-to-end corpus cleaning pipeline: the composition a pretraining
data job actually runs, assembled from the tested textops operators.

Stage order (each optional; the order is part of the contract — e.g.
PII redaction changes the text every later stage sees):

1. C4 line + page rules       (clean.c4_clean — zero-exchange map)
2. PII redaction              (scrub.redact_pii — map)
3. Gopher repetition filters  (quality.repetition_stats — 2 exchanges)
4. Quality-score floor        (quality.quality_score — map + join)
5. Language filter            (quality.lang_id — map + join)
5b. Perplexity filter         (perplexity.* — CCNet head/middle/tail
                               buckets; runs AFTER the language filter
                               because the LM is monolingual)
6. Exact dedup, keep-first    (window on md5(text) — 1 exchange)
7. Near-dup removal           (dedup.dedup_keeplist — the capped /
                               candidate-routed composition)
8. Eval-set decontamination   (contamination.ngram_contamination —
                               broadcast reference shingles)
9. Split assignment           (dataset.hash_split — map)

Feature stages (3/4/5/7/8) attach per-doc columns computed from the
same corpus, which is a join back on id: the helper rename-joins
(CLAUDE.md shared-parent rule) and every such join keys on the doc id,
so at scale one up-front repartition by id co-locates them. Each
enabled stage persists its output and counts it (the per-stage funnel
is the point of a cleaning job); the previous stage unpersists, so peak
storage is two stage snapshots.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..tokenizer import TokenizerConfig, tokens_column
from .clean import c4_clean
from .contamination import ngram_contamination, reference_shingles
from .dataset import hash_split
from .dedup import dedup_keeplist
from .quality import LANG_PROFILES, lang_id, quality_score, repetition_stats
from .scrub import redact_pii


@dataclass
class CleanConfig:
    url_col: Optional[str] = None  # enables the URL gate (stage 0)
    blocked_domains: Sequence[str] = ()
    blocked_url_substrings: Sequence[str] = ()
    allow_schemes: Sequence[str] = ("http", "https")
    c4: bool = False
    min_words: int = 3
    min_sentences: int = 5
    bad_words: Sequence[str] = ()
    pii: bool = False
    max_dup_line_frac: Optional[float] = None
    max_top_2gram_char_frac: Optional[float] = None
    max_dup_5gram_char_frac: Optional[float] = None
    min_quality: Optional[float] = None
    lang: Optional[str] = None
    ppl_keep: Optional[Sequence[str]] = None  # e.g. ("head", "middle")
    ppl_lm: Optional[DataFrame] = None  # reference corpus; None = self
    dedup: str = "none"  # none | exact | near
    jaccard_threshold: float = 0.5
    max_hamming: int = 3
    eval_corpus: Optional[DataFrame] = None
    max_contaminated: int = 0
    contamination_n: int = 13
    split: Optional[dict] = None  # {"train": 8, "val": 1, "test": 1}
    split_salt: str = ""
    tokenizer: TokenizerConfig = field(
        default_factory=lambda: TokenizerConfig(min_token_length=2)
    )


def _attach(docs: DataFrame, feat: DataFrame) -> DataFrame:
    """Left-join per-doc features (id, ...) back onto (doc_id, ...) —
    rename-join, never `on=` (shared-parent ambiguity). Feature columns
    land under a reserved ``_se_`` prefix so a passthrough doc column
    named e.g. 'quality' or 'pred_lang' never collides (the 'extra
    columns pass through untouched' promise); each stage filters on the
    prefixed name and re-selects the original doc columns."""
    f = feat.withColumnRenamed("id", "_fid")
    for c in f.columns:
        if c != "_fid":
            f = f.withColumnRenamed(c, f"_se_{c}")
    out = docs.join(f, docs["doc_id"] == F.col("_fid"), "left")
    return out.drop("_fid")


def clean_corpus(
    docs: DataFrame, cfg: CleanConfig
) -> tuple[DataFrame, dict]:
    """-> (cleaned docs (doc_id, text [, split]), per-stage funnel dict).
    ``docs`` needs (doc_id, text); extra columns pass through untouched
    until a text-rewriting stage (C4) re-selects."""
    stats: dict = {}
    cur = docs.persist()
    stats["input"] = cur.count()

    def step(name: str, nxt: DataFrame) -> DataFrame:
        nonlocal cur
        nxt = nxt.persist()
        stats[name] = nxt.count()
        cur.unpersist()
        cur = nxt
        return cur

    if cfg.url_col is not None:
        # the URL gate runs FIRST (the web-pipeline order: C4/RefinedWeb
        # drop by URL before ever tokenizing) — a row-local native
        # expression, zero exchange
        from .urlfilter import url_reason_expr

        if cfg.url_col not in cur.columns:
            raise ValueError(f"url_col {cfg.url_col!r} not in the frame")
        step("url_filter", cur.where(url_reason_expr(
            F.col(cfg.url_col), cfg.blocked_domains,
            cfg.blocked_url_substrings, cfg.allow_schemes).isNull()))

    if cfg.c4:
        cleaned = c4_clean(
            cur,
            min_words=cfg.min_words,
            min_sentences=cfg.min_sentences,
            bad_words=cfg.bad_words,
        ).select(F.col("id").alias("doc_id"), F.col("clean_text").alias("text"))
        step("c4", cleaned)

    if cfg.pii:
        step("pii_redact", redact_pii(cur))

    toks = tokens_column(F.col("text"), cfg.tokenizer)

    rep_limits = [
        ("dup_line_frac", cfg.max_dup_line_frac),
        ("top_2gram_char_frac", cfg.max_top_2gram_char_frac),
        ("dup_5gram_char_frac", cfg.max_dup_5gram_char_frac),
    ]
    if any(v is not None for _, v in rep_limits):
        rep = repetition_stats(cur, toks)
        out = _attach(cur, rep)
        for col, lim in rep_limits:
            if lim is not None:
                out = out.where(
                    F.coalesce(F.col(f"_se_{col}"), F.lit(0.0)) <= lim
                )
        step("repetition", out.select(*docs_cols(cur)))

    if cfg.min_quality is not None:
        # score with the TARGET language's stop-word profile (an English
        # list would cap every non-English doc's stop_ratio term at ~0
        # and silently gut e.g. a --lang de corpus before the lang stage)
        profile = LANG_PROFILES.get(cfg.lang or "en", LANG_PROFILES["en"])
        q = quality_score(cur, toks, stop_words=profile)
        out = _attach(cur, q.select("id", "quality")).where(
            F.col("_se_quality") >= cfg.min_quality
        )
        step("quality", out.select(*docs_cols(cur)))

    if cfg.lang is not None:
        lid = lang_id(cur, toks).select("id", "pred_lang")
        out = _attach(cur, lid).where(F.col("_se_pred_lang") == cfg.lang)
        step("lang", out.select(*docs_cols(cur)))

    if cfg.ppl_keep:
        # CCNet LM filter: bucket by cross-entropy, keep the named thirds.
        # Runs after the lang filter (the LM is monolingual); LM trains on
        # ppl_lm (the CCNet reference-corpus contract) or, absent one, on
        # the current survivors (self-perplexity). Docs that tokenize to
        # nothing have no likelihood -> NULL bucket -> dropped here.
        from ..indexing.docids import unpersist_doc_ids
        from .perplexity import (
            doc_cross_entropy,
            lm_totals,
            perplexity_buckets,
            train_unigram_lm,
        )

        lm_src = cfg.ppl_lm if cfg.ppl_lm is not None else cur
        lm = train_unigram_lm(lm_src, cfg.tokenizer)
        n, v = lm_totals(lm)
        bucketed = perplexity_buckets(
            doc_cross_entropy(cur, lm, n, v, cfg.tokenizer)
        )
        out = _attach(
            cur, bucketed.select(F.col("doc_id").alias("id"), "bucket")
        ).where(F.col("_se_bucket").isin(*cfg.ppl_keep))
        step("perplexity", out.select(*docs_cols(cur)))
        unpersist_doc_ids(bucketed)

    if cfg.dedup == "exact":
        w = Window.partitionBy(F.md5(F.col("text"))).orderBy("doc_id")
        out = (
            cur.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )
        step("dedup_exact", out)
    elif cfg.dedup == "near":
        keep = dedup_keeplist(
            cur,
            toks,
            jaccard_threshold=cfg.jaccard_threshold,
            max_hamming=cfg.max_hamming,
        )
        out = _attach(cur, keep).where(
            F.col("doc_id") == F.col("_se_canonical_id")
        )
        step("dedup_near", out.select(*docs_cols(cur)))

    if cfg.eval_corpus is not None:
        ref = reference_shingles(
            cfg.eval_corpus,
            tokens_column(F.col("text"), cfg.tokenizer),
            n=cfg.contamination_n,
        )
        cont = ngram_contamination(cur, ref, toks, n=cfg.contamination_n)
        out = _attach(cur, cont.select("id", "n_contaminated")).where(
            F.col("_se_n_contaminated") <= cfg.max_contaminated
        )
        step("decontamination", out.select(*docs_cols(cur)))

    if cfg.split:
        step("split", hash_split(cur, cfg.split, salt=cfg.split_salt))

    stats["output"] = stats[list(stats)[-1]]
    return cur, stats


def docs_cols(docs: DataFrame) -> list:
    return [F.col(c) for c in docs.columns]
