"""Text analysis: language-ID heuristic, quality scoring, token counting,
document fingerprinting (winnowing). All native Spark SQL expressions —
zero Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..tokenizer import PUNCT_CLASS

# Function-word profiles for the stop-word language heuristic (the
# McNamee "language ID by closed-class words" family; still lexical, not
# the full Cavnar–Trenkle trigram ranking — honest scope). ~28 words per
# language, every word >= 2 chars (survives the default tokenizer), drawn
# from the languages the vendored Snowball stemmers cover plus Dutch.
# Cross-language collisions (Romance articles, es/de 'es', nl/pt 'de') are
# expected: prediction is argmax over hit counts, not set membership.
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "for", "with", "on",
           "that", "it", "as", "are", "this", "was", "be", "at", "by",
           "not", "have", "from", "or", "an", "they", "you", "will",
           "all", "their"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "eine",
           "mit", "für", "auf", "den", "dem", "von", "zu", "sich",
           "auch", "werden", "oder", "aber", "wir", "ich", "im",
           "durch", "wenn", "noch", "nur", "bei"),
    "fr": ("le", "la", "les", "et", "est", "pour", "dans", "une", "que",
           "sur", "des", "du", "au", "avec", "ne", "pas", "ce", "qui",
           "plus", "mais", "nous", "vous", "ils", "elle", "je", "son",
           "ses", "aux"),
    "es": ("el", "los", "las", "es", "para", "en", "una", "que", "con",
           "del", "por", "se", "no", "como", "más", "pero", "sus", "ya",
           "este", "esta", "sin", "sobre", "también", "fue", "han",
           "entre", "cuando", "muy"),
    "pt": ("de", "os", "as", "um", "uma", "não", "com", "por", "para",
           "mais", "como", "mas", "foi", "ele", "ela", "seu", "sua",
           "ou", "quando", "muito", "já", "isso", "pelo", "pela", "são",
           "tem", "dos", "das"),
    "it": ("il", "lo", "la", "gli", "che", "di", "non", "per", "una",
           "sono", "del", "al", "si", "più", "anche", "come", "ma",
           "nel", "alla", "con", "della", "questo", "essere", "ha",
           "hanno", "sul", "dalla", "le"),
    "nl": ("de", "het", "een", "en", "van", "is", "dat", "niet", "op",
           "te", "zijn", "met", "voor", "aan", "er", "maar", "ook",
           "als", "dan", "bij", "uit", "naar", "over", "nog", "wel",
           "geen", "deze", "dit"),
}
LANG_ORDER = ("en", "de", "fr", "es", "pt", "it", "nl")  # tie precedence


def _hits(tokens: Column, words: tuple[str, ...]) -> Column:
    return F.size(F.filter(tokens, lambda t: t.isin(*words)))


def lang_id(docs: DataFrame, tokens_col: Column, id_col: str = "doc_id") -> DataFrame:
    """Stop-word-profile language ID -> (id, <lang>_hits..., pred_lang).
    Prediction = argmax hit count with fixed precedence (LANG_ORDER)."""
    # bind tokens once (see dedup._minhash_sigs): the 7 per-language
    # F.filter HOFs are interpreted — an inline tokenize expression would
    # re-evaluate per language
    pre = docs.select(F.col(id_col).alias("id"), tokens_col.alias("_toks"))
    cols = [F.col("id")]
    for lang in LANG_ORDER:
        cols.append(
            _hits(F.col("_toks"), LANG_PROFILES[lang]).cast("long").alias(f"{lang}_hits")
        )
    out = pre.select(*cols)
    pred = None
    for lang in reversed(LANG_ORDER):  # build nested whens; earlier langs win ties
        cond = None
        for other in LANG_ORDER:
            if other == lang:
                continue
            c = F.col(f"{lang}_hits") >= F.col(f"{other}_hits") if LANG_ORDER.index(
                other
            ) > LANG_ORDER.index(lang) else F.col(f"{lang}_hits") > F.col(f"{other}_hits")
            cond = c if cond is None else (cond & c)
        pred = F.when(cond, F.lit(lang)) if pred is None else F.when(cond, F.lit(lang)).otherwise(pred)
    return out.withColumn("pred_lang", pred)


def quality_score(
    docs: DataFrame,
    tokens_col: Column,
    stop_words: tuple[str, ...],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Heuristic quality features + score (rounded 4dp):
    n_tokens, mean token length, punctuation ratio, stop-word ratio,
    score = stop_ratio * 0.3 + (1 - punct_ratio) * 0.3
            + least(n_tokens/100, 1) * 0.4
    (Gopher/C4-style ratio filters; the exact weights are ours.)"""
    # bind tokens once (see dedup._minhash_sigs): size/aggregate/filter
    # below reference the array repeatedly and HOFs get no CSE
    docs = docs.select(
        F.col(id_col).alias(id_col), F.col(text_col).alias(text_col),
        tokens_col.alias("_toks"),
    )
    text = F.col(text_col)
    n_chars = F.length(text)
    n_punct = n_chars - F.length(F.regexp_replace(text, PUNCT_CLASS, ""))
    toks = F.col("_toks")
    n_tokens = F.size(toks)
    tok_chars = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
    )
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*stop_words)))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tokens > 0, n_stop / n_tokens).otherwise(F.lit(0.0))
    mean_tok_len = F.when(n_tokens > 0, tok_chars / n_tokens).otherwise(F.lit(0.0))
    score = (
        stop_ratio * 0.3
        + (F.lit(1.0) - punct_ratio) * 0.3
        + F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * 0.4
    )

    # truncate-to-4dp instead of round: round() disagrees across engines on
    # decimal ties (Spark rounds the exact binary value, DuckDB the shortest
    # decimal repr); floor of the same double is engine-independent
    def t4(c: Column) -> Column:
        return F.floor(c * 10000) / 10000

    return docs.select(
        F.col(id_col).alias("id"),
        n_tokens.cast("long").alias("n_tokens"),
        t4(mean_tok_len).alias("mean_tok_len"),
        t4(punct_ratio).alias("punct_ratio"),
        t4(stop_ratio).alias("stop_ratio"),
        t4(score).alias("quality"),
    )


def _word_ngrams(tokens: Column, n: int) -> Column:
    """Space-joined word n-grams (empty array when the doc is shorter)."""
    return F.when(
        F.size(tokens) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(tokens) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(tokens, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def repetition_stats(
    docs: DataFrame,
    tokens_col: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021, Table A1 family) —
    the signals a pretraining pipeline uses to drop boilerplate/spam. Exact
    definitions (ours, fixed for the cross-engine oracle; n-gram char mass
    = length of the space-joined n-gram × its count; 0-denominators -> 0):

      dup_line_frac       = 1 - distinct_lines / lines        ('\\n' lines)
      dup_line_char_frac  = Σ_{line cnt>1} (cnt-1)·len / Σ cnt·len
      top_2gram_char_frac = top 2-gram's char mass / all 2-gram char mass
                            (tie on count -> lexicographically smallest)
      dup_5gram_char_frac = Σ_{5-gram cnt>1} char mass / all 5-gram mass

    Fractions floor-truncated to 4dp (engine-independent; CLAUDE.md float
    policy). Shape at scale: ONE corpus scan (lines + both gram sizes
    tagged into a single explode), two map-side-combinable exchanges
    ((id, n, v) counts then the per-id rollup with conditional aggregates),
    no joins — every doc yields >= 1 line row ('' splits to ['']), so the
    rollup itself is the complete id spine."""

    def tag(n: int, arr: Column) -> Column:
        return F.transform(
            arr, lambda v: F.struct(F.lit(n).alias("n"), v.alias("v"))
        )

    lines = F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")
    # bind tokens ONCE: _word_ngrams slices the tokens column per position
    # inside an interpreted transform lambda (no CSE there) — an inline
    # tokenize expression would re-run per n-gram (see dedup._minhash_sigs)
    pre = docs.select(
        F.col(id_col).alias("id"), lines.alias("_lines"),
        tokens_col.alias("_toks"),
    )
    exploded = pre.select(
        "id",
        F.explode(
            F.concat(
                tag(0, F.col("_lines")),
                tag(2, _word_ngrams(F.col("_toks"), 2)),
                tag(5, _word_ngrams(F.col("_toks"), 5)),
            )
        ).alias("t"),
    ).select("id", F.col("t.n").alias("n"), F.col("t.v").alias("v"))

    cnt, n, ln = F.col("cnt"), F.col("n"), F.length("v")
    counts = exploded.groupBy("id", "n", "v").agg(F.count("*").alias("cnt"))

    def when_n(k: int, c: Column) -> Column:
        return F.when(n == k, c)

    rolled = counts.groupBy("id").agg(
        F.sum(when_n(0, cnt)).alias("n_lines"),
        F.count(when_n(0, F.lit(1))).alias("n_distinct_lines"),
        F.sum(when_n(0, cnt * ln)).alias("l_mass"),
        F.sum(F.coalesce(when_n(0, F.when(cnt > 1, (cnt - 1) * ln)), F.lit(0))).alias("l_dup"),
        # (count desc, gram asc) tie-break via min of (-cnt, gram)
        F.min(when_n(2, F.struct((-cnt).alias("nc"), F.col("v").alias("v")))).alias("top2"),
        F.sum(F.coalesce(when_n(2, cnt * ln), F.lit(0))).alias("g2_mass"),
        F.sum(F.coalesce(when_n(5, cnt * ln), F.lit(0))).alias("g5_mass"),
        F.sum(F.coalesce(when_n(5, F.when(cnt > 1, cnt * ln)), F.lit(0))).alias("g5_dup"),
    )

    def t4(c: Column) -> Column:
        return F.floor(c * 10000) / 10000

    def frac(num: Column, den: Column) -> Column:
        return t4(F.when(den > 0, num / den).otherwise(F.lit(0.0)))

    return rolled.select(
        "id",
        t4(F.lit(1.0) - F.col("n_distinct_lines") / F.col("n_lines")).alias(
            "dup_line_frac"
        ),
        frac(F.col("l_dup"), F.col("l_mass")).alias("dup_line_char_frac"),
        frac(
            (-F.col("top2.nc")) * F.length("top2.v"), F.col("g2_mass")
        ).alias("top_2gram_char_frac"),
        frac(F.col("g5_dup"), F.col("g5_mass")).alias("dup_5gram_char_frac"),
    )


# BPE-ish pre-tokenization pattern: letter runs | digit runs | single
# non-alnum-non-space (GPT-2-style pre-tokenizer, simplified to a portable
# RE2/Java-common subset)
BPE_ISH = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, ws_tokens, bpe_tokens): whitespace token count + BPE-ish regex
    token count — the cheap proxy for 'how many training tokens is this'."""
    text = F.col(text_col)
    return docs.select(
        F.col(id_col).alias("id"),
        F.regexp_count(text, F.lit(r"\S+")).cast("long").alias("ws_tokens"),
        F.regexp_count(text, F.lit(BPE_ISH)).cast("long").alias("bpe_tokens"),
    )


def doc_fingerprints(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    kgram: int = 5,
    window: int = 4,
) -> DataFrame:
    """Winnowing fingerprints (Schleimer et al. 2003): md5 of char k-grams,
    per-window lexicographic min, distinct -> (id, n_fp, min_fp).

    Entirely native: sequence/transform/slice/array_min higher-order
    functions, no UDF."""
    text = F.col(text_col)
    n = F.length(text)
    # NB sequence(1, 0) DESCENDS in Spark — guard short/empty texts explicitly
    grams = F.when(
        n >= kgram,
        F.transform(
            F.sequence(F.lit(1), n - (kgram - 1)),
            lambda i: F.md5(text.substr(i, F.lit(kgram))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # staged BINDING projections (CLAUDE.md bind-once rule): the window-min
    # lambda slices the gram array per position and interpreted HOFs get no
    # CSE — inlining ``grams`` would recompute ALL n md5s per window
    # (O(n^2) hashes/doc); same for ``fp`` referenced twice below
    step1 = docs.select(F.col(id_col).alias("id"), grams.alias("_grams"))
    gc = F.col("_grams")
    n_g = F.size(gc)
    mins = F.when(
        n_g >= window,
        F.transform(
            F.sequence(F.lit(1), n_g - (window - 1)),
            lambda j: F.array_min(F.slice(gc, j, window)),
        ),
    ).otherwise(gc)
    step2 = step1.select("id", F.array_distinct(mins).alias("_fp"))
    return step2.select(
        "id",
        F.size("_fp").cast("long").alias("n_fp"),
        F.array_min("_fp").alias("min_fp"),
    )
