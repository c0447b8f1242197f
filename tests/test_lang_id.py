"""Functional check of the widened language-ID profiles: real sentences in
each supported language must be classified correctly (the hash parity vs
DuckDB is the driver entry's job; this guards prediction QUALITY)."""

import pytest

from searchengine_spark.textops.quality import LANG_ORDER, LANG_PROFILES, lang_id
from searchengine_spark.tokenizer import TokenizerConfig, tokens_column

SENTENCES = {
    "en": "the cat sat on the mat and it was not happy with this at all",
    "de": "der hund ist nicht mit der katze durch den park gelaufen aber wir haben es gesehen",
    "fr": "le chat est dans la maison avec les enfants qui ne veulent pas dormir ce soir",
    "es": "el perro está en la casa con los niños pero no quiere comer más esta noche",
    "pt": "ele não foi com ela para a cidade mas os amigos já estavam muito cansados",
    "it": "il gatto non è nella casa ma sono sicuro che anche questo problema si può risolvere",
    "nl": "de hond is niet met de kat naar het park gegaan maar wij hebben er ook niets aan gedaan",
}


def test_profiles_well_formed():
    assert set(LANG_PROFILES) == set(LANG_ORDER)
    for lang, words in LANG_PROFILES.items():
        assert len(words) >= 25, lang
        assert len(set(words)) == len(words), f"dup in {lang}"
        # every profile word must survive the default tokenizer
        assert all(len(w) >= 2 and w == w.lower() for w in words), lang


def test_real_sentences_classified(spark):
    import pyspark.sql.functions as F

    cfg = TokenizerConfig(min_token_length=2)
    df = spark.createDataFrame(
        [(lang, text) for lang, text in SENTENCES.items()],
        "true_lang string, text string",
    )
    out = lang_id(df, tokens_column(F.col("text"), cfg), id_col="true_lang")
    got = {r["id"]: r["pred_lang"] for r in out.collect()}
    assert got == {lang: lang for lang in SENTENCES}


def test_repetition_stats_hand_computed(spark):
    """Crafted docs with known repetition structure (exact fractions in
    textops/quality.py definitions; oracle hash parity is the driver's job)."""
    import pyspark.sql.functions as F

    from searchengine_spark.textops.quality import repetition_stats
    from searchengine_spark.tokenizer import TokenizerConfig, tokens_column

    cfg = TokenizerConfig(min_token_length=2)
    docs = spark.createDataFrame(
        [
            # 3 lines, one duplicated: dup_line_frac = 1 - 2/3
            # dup_line_char_frac = (2-1)*5 / (2*5 + 4) = 5/14
            (0, "aa bb\naa bb\ncc d"),
            # "xy xy xy xy": 2-grams = [xy xy]x3 -> top frac = 1.0; <5 tokens -> g5 = 0
            (1, "xy xy xy xy"),
            # no repetition at all
            (2, "one two three four five six"),
            # 6 tokens "ab ab ab ab ab ab": 5-grams both identical -> dup frac 1.0
            (3, "ab ab ab ab ab ab"),
            (4, None),
        ],
        "doc_id long, text string",
    )
    out = {
        r["id"]: r.asDict()
        for r in repetition_stats(docs, tokens_column(F.col("text"), cfg)).collect()
    }
    import math

    assert math.isclose(out[0]["dup_line_frac"], math.floor((1 - 2 / 3) * 10000) / 10000)
    assert math.isclose(out[0]["dup_line_char_frac"], math.floor(5 / 14 * 10000) / 10000)
    assert out[1]["top_2gram_char_frac"] == 1.0
    assert out[1]["dup_5gram_char_frac"] == 0.0
    assert out[2]["dup_line_frac"] == 0.0
    assert out[2]["dup_5gram_char_frac"] == 0.0
    assert out[2]["top_2gram_char_frac"] < 0.3
    assert out[3]["dup_5gram_char_frac"] == 1.0
    assert out[4]["top_2gram_char_frac"] == 0.0  # NULL text -> all zeros
