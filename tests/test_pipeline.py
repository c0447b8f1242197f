"""Corpus cleaning pipeline (textops/pipeline.py): stage composition,
funnel stats, and per-stage effects on a handcrafted corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from searchengine_spark.textops.pipeline import CleanConfig, clean_corpus

# varied content words keep the distinct-shingle set large (~30), so the
# one-token near-dup edit below lands at Jaccard ~0.9 — found by ANY
# reasonable LSH family, not by a lucky band collision of a borderline pair
_TOPICS = ["morning weather", "harbor traffic", "garden soil",
           "market prices", "violin practice", "mountain trails"]
GOOD = " ".join(
    f"Sentence number {i} talks about {t} in careful detail."
    for i, t in enumerate(_TOPICS)
)
# doc 4's prefix carries enough DISTINCT shingle mass to push its Jaccard
# vs GOOD below the 0.5 threshold: even when LSH proposes the pair, the
# exact-Jaccard verification rejects it (family-independent outcome)
_EMAIL_PREFIX = (
    "Contact me at bob@example.com today about renewing the library card.\n"
    "Our office moved beside the northern bakery last cold february week.\n"
    "Parking remains free for visiting members until the spring festival.\n"
)


def _corpus(spark):
    rows = [
        (1, GOOD),
        (2, GOOD),  # exact dup of 1
        (3, GOOD.replace("number 3", "number three")),  # near-dup of 1
        (4, _EMAIL_PREFIX + GOOD),
        (5, "var x = { a: 1 }\n" + GOOD),  # brace line (line filter drops it)
        (6, "der die das und ist nicht ein eine mit für.\n"
            "auf den dem von zu sich auch werden oder aber."),  # German
        (7, "Repeat me again and again and again.\n" * 12),  # repetitive
        (8, "Too short to survive. Only two sentences."),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_funnel_and_composition(spark):
    out, stats = clean_corpus(
        _corpus(spark),
        CleanConfig(
            c4=True,
            pii=True,
            max_dup_line_frac=0.5,
            lang="en",
            dedup="exact",
            split={"train": 8, "val": 1, "test": 1},
        ),
    )
    assert list(stats) == [
        "input", "c4", "pii_redact", "repetition", "lang", "dedup_exact",
        "split", "output",
    ]
    assert stats["input"] == 8
    # every stage can only shrink (split assigns, never drops)
    counts = [stats[k] for k in list(stats)[:-2]]
    assert counts == sorted(counts, reverse=True)
    assert stats["split"] == stats["dedup_exact"]
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(out.columns) == {"doc_id", "text", "split"}
    # 6 and 8 die at C4 (< 5 sentences), 7 at repetition (12 dup lines);
    # the LINE filter strips doc 5's brace line, making its cleaned text
    # an exact dup of doc 1's — so exact dedup folds {1,2,5} to 1
    assert set(rows) == {1, 3, 4}
    assert "<EMAIL>" in rows[4]["text"] and "bob@" not in rows[4]["text"]
    assert stats["c4"] == 6 and stats["repetition"] == 5
    assert stats["dedup_exact"] == 3


def test_near_dedup_folds_near_duplicates(spark):
    out, stats = clean_corpus(
        _corpus(spark), CleanConfig(dedup="near", jaccard_threshold=0.5)
    )
    kept = {r["doc_id"] for r in out.select("doc_id").collect()}
    # {1,2,3,5} form one near-dup component (5's raw text is GOOD plus
    # one extra line); min id 1 is the canonical keeper
    assert kept == {1, 4, 6, 7, 8}
    assert stats["dedup_near"] == 5


def test_decontamination_drops_eval_overlap(spark):
    ev = spark.createDataFrame([(100, GOOD)], "doc_id long, text string")
    out, stats = clean_corpus(
        _corpus(spark).where(F.col("doc_id").isin(1, 6)),
        CleanConfig(eval_corpus=ev),
    )
    kept = {r["doc_id"] for r in out.collect()}
    assert kept == {6}  # doc 1 shares 13-gram shingles with the eval set
    assert stats["decontamination"] == 1


def test_quality_floor_uses_target_language_profile(spark):
    """--lang de + a quality floor must score with the GERMAN stop-word
    profile: an English profile would cap every German doc's stop_ratio
    term at ~0 and gut the corpus before the lang stage runs."""
    out, stats = clean_corpus(
        _corpus(spark).where(F.col("doc_id").isin(1, 6)),
        CleanConfig(lang="de", min_quality=0.6),
    )
    kept = {r["doc_id"] for r in out.collect()}
    assert kept == {6}
    assert stats["quality"] >= 1  # the German doc survived its own floor


def test_noop_config_passes_through(spark):
    docs = _corpus(spark)
    out, stats = clean_corpus(docs, CleanConfig())
    assert stats == {"input": 8, "output": 8}
    assert out.count() == 8 and set(out.columns) == {"doc_id", "text"}


def test_passthrough_columns_never_collide_with_features(spark, stop_words):
    """Docs carrying columns named like pipeline features (quality,
    pred_lang, canonical_id, n_contaminated, dup_line_frac) must pass
    through untouched — the stage joins alias features to _se_* names."""
    from searchengine_spark.tokenizer import TokenizerConfig

    rows = [
        (i, f"the quick brown fox jumps over dog number {i} " * 3,
         0.99, "xx", 7, 7, 0.5)
        for i in range(8)
    ]
    docs = spark.createDataFrame(
        rows,
        "doc_id long, text string, quality double, pred_lang string, "
        "canonical_id long, n_contaminated long, dup_line_frac double",
    )
    cfg = CleanConfig(
        min_quality=0.0,
        lang="en",
        dedup="near",
        tokenizer=TokenizerConfig(min_token_length=2),
    )
    out, stats = clean_corpus(docs, cfg)
    got = out.collect()
    assert got, stats
    # passthrough values survive verbatim (never overwritten by features)
    assert all(r["quality"] == 0.99 and r["pred_lang"] == "xx" for r in got)


def test_perplexity_stage(spark):
    """--ppl-keep: the CCNet LM stage drops the worst third by
    cross-entropy (runs after the other filters); keep=('head','middle',
    'tail') is a no-op on the surviving set; a separate reference LM
    changes the scores but not the schema."""
    docs = _corpus(spark)
    base, _ = clean_corpus(docs, CleanConfig())
    n_base = base.count()

    kept, stats = clean_corpus(docs, CleanConfig(ppl_keep=("head", "middle")))
    assert stats["perplexity"] == kept.count()
    # rank-exact thirds: ceil(2n/3) survive
    assert stats["perplexity"] == n_base - n_base // 3

    allb, _ = clean_corpus(
        docs, CleanConfig(ppl_keep=("head", "middle", "tail")))
    assert allb.count() == n_base

    ref = spark.createDataFrame(
        [(100, "morning weather harbor traffic garden soil")],
        "doc_id long, text string",
    )
    reffed, stats2 = clean_corpus(
        docs, CleanConfig(ppl_keep=("head",), ppl_lm=ref))
    assert stats2["perplexity"] == reffed.count() > 0
    assert set(reffed.columns) == {"doc_id", "text"}
