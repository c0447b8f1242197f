"""C4-style heuristic cleaning filters (Raffel et al. 2020, §2.2 —
"Exploring the Limits of Transfer Learning with a Unified Text-to-Text
Transformer", the public C4 pipeline rules), re-expressed as native
Spark SQL expressions:

- line filter: keep lines that end in terminal punctuation (. ! ? ")
  AND contain at least ``min_words`` words AND do not mention the word
  "javascript" (case-insensitive). Pure map over higher-order array
  functions — ZERO exchanges, whole-stage codegen, linear in corpus
  bytes (plan-gated in tests/test_clean.py).
- document filter: drop pages containing a curly brace (code), the
  phrase "lorem ipsum", any configured bad word, or fewer than
  ``min_sentences`` sentences; ``reason`` is the FIRST failing rule in
  that fixed order (rule order changes the answer, so it is part of
  the contract). Also a pure map.
- three-sentence-span dedup: discard all but one occurrence of any
  span of ``span`` consecutive sentences occurring more than once
  corpus-wide. The kept (canonical) occurrence is the minimum
  (id, span_idx); the emitted rows are the removals. ONE exchange:
  a row_number window over the md5 of the span text.

Sentence segmentation is deliberately lookaround-free so Java regex
(Spark) and RE2 (the DuckDB oracle) agree byte-for-byte: whitespace is
collapsed to single spaces, then the text splits on ``[.!?]+`` and the
trimmed non-empty segments are the sentences.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

TERMINAL_PUNCT = (".", "!", "?", '"')
JAVASCRIPT_RE = r"\bjavascript\b"


def _words(line: Column) -> Column:
    return F.filter(F.split(line, r"\s+"), lambda w: w != F.lit(""))


def _keep_line(line: Column, min_words: int) -> Column:
    t = F.rtrim(line)
    return (
        F.right(t, F.lit(1)).isin(*TERMINAL_PUNCT)
        & (F.size(_words(line)) >= F.lit(min_words))
        & ~F.lower(line).rlike(JAVASCRIPT_RE)
    )


def sentences_col(text: Column) -> Column:
    """Array of sentences: whitespace-normalized text split on [.!?]+,
    trimmed, empties dropped. Identical semantics in Spark and RE2."""
    norm = F.regexp_replace(F.coalesce(text, F.lit("")), r"\s+", " ")
    segs = F.transform(F.split(norm, r"[.!?]+"), lambda s: F.trim(s))
    return F.filter(segs, lambda s: s != F.lit(""))


def c4_line_filter(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 3,
) -> DataFrame:
    """-> (id, clean_text, n_lines, n_lines_kept): the C4 line rules.
    clean_text is the kept lines re-joined with newlines."""
    lines = F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")
    kept = F.filter(lines, lambda l: _keep_line(l, min_words))
    return docs.select(
        F.col(id_col).alias("id"),
        F.array_join(kept, "\n").alias("clean_text"),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_lines_kept"),
    )


def _doc_reason(
    text: Column, min_sentences: int, bad_words: Sequence[str]
) -> Column:
    import re

    lt = F.lower(text)
    checks = [
        ("brace", text.contains("{") | text.contains("}")),
        ("lorem_ipsum", lt.contains("lorem ipsum")),
    ]
    # escape + lowercase the user-supplied words: regex metachars must be
    # literals (never a PatternSyntaxException in executors), empties must
    # not become a match-anything '||' alternation, and the pattern runs
    # against LOWERED text. Boundaries are explicit (^|\W)…(\W|$) classes
    # rather than \b: a \b after a word ENDING in a non-word char (c++)
    # never fires, and the class form stays in the Java-regex/RE2 common
    # subset (equivalent to \b for ordinary words, so the DuckDB oracle's
    # \b replica is unchanged)
    words = [re.escape(w.lower()) for w in bad_words if w]
    if words:
        pat = r"(^|\W)(" + "|".join(words) + r")(\W|$)"
        checks.append(("bad_word", lt.rlike(pat)))
    checks.append(
        ("few_sentences", F.size(sentences_col(text)) < F.lit(min_sentences))
    )
    reason = F.lit("")
    for name, cond in reversed(checks):  # first rule ends outermost
        reason = F.when(cond, F.lit(name)).otherwise(reason)
    return reason


def c4_doc_filter(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_sentences: int = 5,
    bad_words: Sequence[str] = (),
) -> DataFrame:
    """-> (id, keep, reason): the C4 page rules over ``text_col``.
    reason = first failing rule ('' when the page is kept)."""
    reason = _doc_reason(F.col(text_col), min_sentences, bad_words)
    return docs.select(
        F.col(id_col).alias("id"),
        (reason == F.lit("")).alias("keep"),
        reason.alias("reason"),
    )


def c4_clean(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 3,
    min_sentences: int = 5,
    bad_words: Sequence[str] = (),
) -> DataFrame:
    """Full C4 composition: line filter, then page rules evaluated on
    the CLEANED text. Inlines the page predicate instead of joining the
    two stages (a join of two views of the same parent is both a
    shuffle and an AMBIGUOUS_REFERENCE hazard) — the whole composition
    stays a zero-exchange map."""
    lf = c4_line_filter(docs, id_col, text_col, min_words)
    reason = _doc_reason(F.col("clean_text"), min_sentences, bad_words)
    return lf.where(reason == F.lit("")).select(
        "id", "clean_text", "n_lines", "n_lines_kept"
    )


def span_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span: int = 3,
) -> DataFrame:
    """C4's dedup unit: -> (id, span_idx, span_md5) for every
    NON-canonical occurrence of a ``span``-sentence span that occurs
    more than once corpus-wide (the rows a pipeline removes; the
    canonical keeper is the minimum (id, span_idx), expressed as
    row_number = 1 so the whole operator is ONE hash exchange on the
    span digest — no join back, no second shuffle)."""
    # bind the sentence array ONCE (CLAUDE.md bind-once rule): the span
    # lambda below slices it per index and interpreted HOFs get no CSE —
    # inlining sentences_col would re-run the whole segmentation per span
    pre = docs.select(
        F.col(id_col).alias("id"),
        sentences_col(F.col(text_col)).alias("_sents"),
    )
    sents = F.col("_sents")
    n = F.size(sents)
    idxs = F.when(n >= span, F.sequence(F.lit(0), n - span)).otherwise(
        F.array().cast("array<int>")  # sequence(a,b) DESCENDS when a > b
    )
    spans = F.transform(
        idxs,
        lambda i: F.struct(
            i.cast("long").alias("span_idx"),
            F.md5(F.array_join(F.slice(sents, i + 1, span), " ")).alias(
                "span_md5"
            ),
        ),
    )
    ex = pre.select("id", F.explode(spans).alias("s")).select(
        "id",
        F.col("s.span_idx").alias("span_idx"),
        F.col("s.span_md5").alias("span_md5"),
    )
    w = Window.partitionBy("span_md5").orderBy("id", "span_idx")
    return (
        ex.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") > 1)
        .select("id", "span_idx", "span_md5")
    )
